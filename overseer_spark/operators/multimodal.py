"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design (SURVEY.md Phase 4): media travels as a ``binary`` column with a
struct of metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so each executor core streams record
batches without ever materializing the whole partition. The actual codecs
(PIL/libav/etc.) are NOT available in this container, so the decode step is
a clearly-marked seam: ``decode_media`` raises ``NotImplementedError`` for
real codecs and supports the deterministic ``"raw-utf8"`` fake codec used by
tests — the Spark-side plumbing (schema, batching, partitioning) is real.

At 100 TB: binary payloads dominate scan width, so metadata lives in its own
columns (parquet column pruning skips the bytes for metadata-only queries),
and media rows are repartitioned by size-bucket before decode so Arrow
batches stay memory-bounded.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video | text
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_REAL_CODECS = frozenset({"jpeg", "png", "webp", "wav", "mp3", "flac", "h264", "vp9"})


def with_binary_payload(
    df: DataFrame, text_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Attach a deterministic binary payload column (UTF-8 bytes of the text
    column) + metadata struct — the test stand-in for real media ingest."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("raw-utf8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def decode_media(payload: bytes, codec: str):
    """Decode one media payload. Real codecs are a deliberate stub — the
    container ships no image/audio libraries; plug PIL/soundfile/av here."""
    if codec == "raw-utf8":
        return payload  # identity "decode" for the deterministic fake codec
    if codec in _REAL_CODECS:
        raise NotImplementedError(
            f"codec {codec!r}: media libraries not available in this environment; "
            "install PIL/soundfile/av and implement decode here"
        )
    raise ValueError(f"unknown codec: {codec!r}")


def extract_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    mapInPandas streams pandas record-batches; per batch we decode (fake
    codec) and emit (id, n_bytes, digest). Output schema is fixed so the
    optimizer can prune upstream columns to (id, payload) only.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            raw = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": raw.map(len).astype("int64"),
                    "digest": raw.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    pruned = df.select(id_col, payload_col)
    return pruned.mapInPandas(batches, schema=f"{id_col} long, n_bytes long, digest string")


def extract_metadata_arrow(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """``mapInArrow`` twin of ``extract_metadata``: consumes/produces raw
    ``pyarrow.RecordBatch`` — no pandas materialization, no object-dtype
    copy of the binary column. For blob-heavy batches this is the
    lowest-overhead Python seam Spark offers (the bytes arrive as Arrow
    binary buffers, zero-copy from the JVM); pytest pins output parity
    with the pandas variant."""

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for rb in it:
            payload = rb.column(rb.schema.get_field_index(payload_col))
            digests = [
                hashlib.md5(v.as_py()).hexdigest() for v in payload
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index(id_col)),
                    pa.compute.binary_length(payload).cast(pa.int64()),
                    pa.array(digests, pa.string()),
                ],
                names=[id_col, "n_bytes", "digest"],
            )

    pruned = df.select(id_col, payload_col)
    return pruned.mapInArrow(
        batches, schema=f"{id_col} long, n_bytes long, digest string"
    )


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic frame sampling for the fake codec: split payload bytes
    into fixed 64-byte 'frames', keep every ``every_n``-th. Demonstrates the
    1→N mapInPandas expansion shape used for real video frame extraction."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                frames = [b[o : o + 64] for o in range(0, len(b), 64)]
                for j in range(0, len(frames), every_n):
                    out_ids.append(i)
                    out_idx.append(j)
                    out_frames.append(frames[j])
            yield pd.DataFrame(
                {id_col: out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, frame_idx int, frame binary"
    )
