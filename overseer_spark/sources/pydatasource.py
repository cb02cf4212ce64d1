"""Custom connector via the Spark 4 Python DataSource API.

The reference keeps its storage surface pluggable behind an adapter
registry (``src/overseer/api.clj:25-42`` — datomic/mysql/h2/sqlite map to
store constructors). The Spark-native analogue of "add a backend without
touching the engine" is a registered DataSource: this module implements a
deterministic synthetic-documents connector exercising the full custom-
source contract — schema declaration, partition planning, executor-side
partition reads, **filter pushdown into the source**, and a micro-batch
streaming reader.

Scale design: the source is range-sharded on ``doc_id``; supported filters
(=, <, <=, >, >= on doc_id) narrow the generated range BEFORE partition
planning, so pruned rows are never synthesized, never serialized, never
scanned — the Python-source equivalent of parquet predicate pushdown +
partition pruning. Unsupported filters are returned to Spark and applied
post-scan, which keeps correctness independent of pushdown coverage.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    DataSourceWriter,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA = "doc_id bigint, text string, lang string, n_tokens bigint"

_VOCAB = (
    "data spark table query join shuffle stream batch vector token "
    "model train corpus filter merge sort hash scan index cache"
).split()
_LANGS = ("en", "de", "fr", "es")


def make_doc(doc_id: int) -> tuple[int, str, str, int]:
    """Deterministic doc for an id — pure function, same on every executor."""
    h = doc_id * 2654435761 % 2**32  # Knuth multiplicative hash
    n_tokens = 5 + h % 20
    words = [
        _VOCAB[(h // (i + 1) + i * doc_id) % len(_VOCAB)] for i in range(n_tokens)
    ]
    return doc_id, " ".join(words), _LANGS[h % len(_LANGS)], n_tokens


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.lo, self.hi = 0, self.rows  # narrowed by pushFilters

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Narrow [lo, hi) from doc_id comparisons; yield back the rest."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("doc_id",) and isinstance(getattr(f, "value", None), int):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                else:
                    yield f
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = min(self.num_partitions, max(1, hi - lo))
        span = hi - lo
        bounds = [lo + span * i // n for i in range(n + 1)]
        return [_RangePartition(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _RangePartition):
        for doc_id in range(partition.lo, partition.hi):
            yield make_doc(doc_id)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: each trigger emits the next ``batch_rows`` ids.

    Offsets are plain dicts (JSON-serializable) so the checkpoint log can
    replay any [start, end) slice deterministically — the exactly-once
    replay contract a file/Kafka source provides.
    """

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("rows", 1000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return [make_doc(i) for i in range(lo, hi)], {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [make_doc(i) for i in range(start["next"], end["next"])]


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    # runtime-set here (not in session.py) so the source works under ANY
    # session, including a plain default-config one
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Python DataSource WRITER: a JSONL sink with a real commit protocol
# ---------------------------------------------------------------------------

class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str, rows: int):
        self.filename = filename
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Executor-side JSONL writer with task-temp + driver-commit atomics.

    Each task streams its partition to ``_tmp_<uuid>.jsonl`` and reports a
    commit message; the driver's ``commit`` renames every temp file to its
    final name and writes a ``_SUCCESS`` manifest (filename + row count
    per task), while ``abort`` removes the temps — so readers never
    observe a half-written dataset (the same temp-then-rename contract
    Spark's file committers use, expressed through the Python
    DataSourceWriter API)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"_tmp_{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages):
        import json
        import os

        manifest = []
        for i, m in enumerate(messages):
            final = f"part-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, m.filename),
                os.path.join(self.path, final),
            )
            manifest.append({"file": final, "rows": m.rows})
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": manifest}, f)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:  # writer-only source; schema comes from the df
        return "placeholder string"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
