"""Text-analysis operators for training-data pipelines.

Language ID (character n-gram profiles), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting (md5 + polynomial rolling hash).
All built-in-function Spark; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from overseer_spark.functions.textfns import char_ngrams, tokens
from overseer_spark.operators.util import spread

# Small English stopword list for ratio features (not language-specific
# correctness — a *deterministic quality feature*).
STOPWORDS = (
    "the a an and or of to in is are was for on with as by at this that it".split()
)

# Polynomial rolling-hash modulus (fits in signed 64-bit with 1e9-scale base).
_FP_MOD = (1 << 31) - 1


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword-unit estimate
    (≈ ceil(chars/4) per the common rule of thumb)."""
    df = spread(df, id_col)
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.ceil(F.length(text_col) / F.lit(4)).cast("long").alias("n_bpe_est"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features: mean word length, stopword ratio,
    alpha ratio, distinct-token ratio; plus a composite score.

    The composite mirrors common LLM-corpus filters (Gopher/C4-style
    length + repetition heuristics) expressed in closed form.
    """
    df = spread(df, id_col)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    mean_wlen = (F.length(text_col) - (n - 1)) / n  # chars minus separators
    score = (
        F.when((n >= 5) & (distinct_ratio > 0.2), F.lit(1.0)).otherwise(F.lit(0.0))
        * (F.lit(1.0) - n_stop / n * F.lit(0.5))
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(n_stop / n, 4).alias("stopword_ratio"),
        F.round(alpha_chars / F.length(text_col), 4).alias("alpha_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def language_profiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    top: int = 50,
) -> DataFrame:
    """Per-language character-trigram profile: the ``top`` most frequent
    n-grams per language with ranks (deterministic tie-break on the gram)."""
    grams = spread(df).select(
        F.col(lang_col).alias("lang"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.col("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("lang", "gram", "rank")
    )


def language_id(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    top: int = 50,
) -> DataFrame:
    """Rank-based n-gram language ID (Cavnar-Trenkle style): score each
    (doc, lang) by summed inverse rank of profile n-grams present in the
    doc; predict the argmax. Profiles broadcast; one shuffle on doc_id."""
    doc_grams = spread(df, id_col).select(
        F.col(id_col), F.explode(char_ngrams(F.col(text_col), n)).alias("gram")
    )
    scored = (
        doc_grams.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.lit(top + 1) - F.col("rank")).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.col("lang"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(F.col(id_col), F.col("lang").alias("pred_lang"), "score")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 hex (engine-portable) and a polynomial
    rolling hash over token crc32s (order-sensitive, Python-oracle-stable)."""
    df = spread(df, id_col)
    toks = tokens(F.col(text_col))
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + F.crc32(F.encode(t, "UTF-8"))) % F.lit(_FP_MOD),
    )
    return df.select(
        F.col(id_col),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("md5"),
        rolling.alias("rolling_hash"),
    )


def normalize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_punct: bool = False,
) -> DataFrame:
    """Canonical text normalization (the pass run before hashing/dedup so
    near-identical documents actually collide): lowercase, whitespace
    collapse + trim, optional punctuation strip. Pure projection — built-in
    string functions only, no shuffle, safe at any scale."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    if strip_punct:
        c = F.regexp_replace(c, r"[^\w\s]", "")
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)


def quality_filter(
    df: DataFrame,
    min_tokens: int = 5,
    min_distinct_ratio: float = 0.2,
    max_stopword_ratio: float = 0.9,
    min_alpha_ratio: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents passing Gopher/C4-style quality gates. Computes the
    feature columns once and filters — a single projection+filter over the
    corpus; thresholds are plan literals so Catalyst folds them."""
    feats = quality_score(df, text_col, id_col).select(
        id_col, "n_tokens", "distinct_ratio", "stopword_ratio", "alpha_ratio"
    )
    keep = feats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


# The 8 stopwords Gopher requires at least 2 of (Rae et al. 2021 §A1.1.2 —
# public paper; thresholds below are the published rule values).
GOPHER_REQUIRED_STOPWORDS = "the be to of and that have with".split()


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Named Gopher corpus-filter rules as per-document verdicts.

    Unlike ``quality_score`` (features) / ``quality_filter`` (a silent
    gate), this returns the full audit row: one boolean per published rule,
    the overall ``keep``, and the FIRST failing rule as ``reject_reason`` —
    what a corpus-curation dashboard actually needs. Rules (Rae et al.
    2021): word count in [50, 100k]; mean word length in [3, 10]; ≥80% of
    words contain an alphabetic character; ≥2 distinct required stopwords;
    symbol-to-word ratio (# and ellipsis) ≤ 0.1. Single projection, all
    built-in expressions — one corpus pass, no shuffle.
    """
    df = spread(df, id_col)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    mean_wlen = (F.length(text_col) - (n - 1)) / n
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n
    n_hash = F.length(text_col) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    n_ellipsis = (
        F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    sym_ratio = (n_hash + n_ellipsis) / n
    n_required = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
        )
    )
    r_wc = (n >= 50) & (n <= 100_000)
    r_mwl = (mean_wlen >= 3) & (mean_wlen <= 10)
    r_alpha = alpha_frac >= 0.8
    r_stop = n_required >= 2
    r_sym = sym_ratio <= 0.1
    reason = (
        F.when(~r_wc, F.lit("word_count"))
        .when(~r_mwl, F.lit("mean_word_len"))
        .when(~r_alpha, F.lit("alpha_words"))
        .when(~r_stop, F.lit("stopwords"))
        .when(~r_sym, F.lit("symbol_ratio"))
        .otherwise(F.lit("pass"))
    )
    return df.select(
        F.col(id_col),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        r_sym.alias("r_symbol_ratio"),
        (r_wc & r_mwl & r_alpha & r_stop & r_sym).alias("keep"),
        reason.alias("reject_reason"),
    )


def redact(
    df: DataFrame,
    patterns: dict[str, str] | None = None,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Scrub sensitive spans (PII pass): replace each regex with its tag,
    and count the replacements per pattern in ``n_redactions``.

    Pure projection — regexp_replace / regexp_extract_all are codegen'd,
    so a 100 TB scrub is a single scan. Patterns stay in the RE2-portable
    subset (no lookbehind) so the same pass is expressible on any engine.
    """
    if patterns is None:
        patterns = {
            "<EMAIL>": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "<NUM>": r"[0-9][0-9 .-]{6,}[0-9]",  # phone/account-shaped digit runs
        }
    c = F.col(text_col)
    n = F.lit(0)
    for tag, pat in sorted(patterns.items()):
        n = n + F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        c = F.regexp_replace(c, pat, tag)
    return df.withColumn(out_col, c).withColumn("n_redactions", n.cast("long"))


def chunk(
    df: DataFrame,
    size: int = 200,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the training-data chunking pass (context-window packing). Output:
    (id, chunk_id, chunk), chunk_id 0-based; stride = size - overlap.

    1→N expansion via sequence+transform+explode, all JVM-side; generated
    rows never leave the executor that scanned the document, so the op is
    shuffle-free and scales linearly with corpus bytes.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    c = F.col(text_col)
    # ceil((len - size) / stride) + 1 windows — the last window reaches the
    # end of the document; no trailing window fully inside the previous one
    hi = F.when(F.length(c) <= size, F.lit(0)).otherwise(
        F.ceil((F.length(c) - size) / F.lit(stride))
    ).cast("int")
    starts = F.sequence(F.lit(0), hi)
    chunks = F.transform(starts, lambda i: c.substr(i * stride + 1, F.lit(size)))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk"))
        .filter(F.length("chunk") > 0)
    )


def remove_repeated_spans(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact repeated-span removal (the span-level companion to document
    dedup, after Lee et al. 2021 "Deduplicating Training Data Makes
    Language Models Better"): any k-token span occurring in ≥ ``min_docs``
    distinct documents is kept ONLY in its canonical document (min id);
    every other document drops the tokens the span covers.

    Output: (id, text, n_tokens, n_removed) with the cleaned text.

    Plan shape at scale: spans are ``xxhash64``-keyed before the flag
    windows (8-byte shuffle keys); the ≥min_docs flag and the canonical
    keeper ride WINDOWS over the one exploded span table (a separate
    count aggregate joined back would re-derive the explode from a
    second corpus scan — the scan-audit principle); flagged start
    positions fold back to one array per document (id-keyed shuffle),
    and the token-drop rebuild is a single array-HOF projection —
    coverage test per token against the doc's flagged starts, no
    Python, no per-row joins.
    """
    from overseer_spark.functions.textfns import shingles, tokens
    from overseer_spark.operators.util import spread

    base = spread(df, id_col)
    toks = tokens(F.col(text_col))
    span_arr = shingles(toks, k=k)
    spans = base.select(
        F.col(id_col),
        F.posexplode(span_arr).alias("start", "s"),
    ).select(id_col, "start", F.xxhash64("s").alias("s"))
    w_s = Window.partitionBy("s")
    flagged = (
        spans.withColumn(
            "nd", F.size(F.collect_set(F.col(id_col)).over(w_s))
        )
        .withColumn("keeper", F.min(id_col).over(w_s))
        .filter((F.col("nd") >= min_docs) & (F.col(id_col) != F.col("keeper")))
        .groupBy(id_col)
        .agg(F.collect_set("start").alias("_starts"))
    )
    joined = base.join(flagged, id_col, "left").withColumn(
        "_starts", F.coalesce("_starts", F.array().cast("array<int>"))
    )
    toks_idx = F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i")))
    covered = lambda s: F.exists(  # noqa: E731 — local predicate
        F.col("_starts"), lambda st: (s["i"] >= st) & (s["i"] < st + F.lit(k))
    )
    kept = F.filter(toks_idx, lambda s: ~covered(s))
    n_tokens = F.size(toks)
    return joined.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(text_col),
        n_tokens.cast("long").alias("n_tokens"),
        (n_tokens - F.size(kept)).cast("long").alias("n_removed"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance of every document containing ≥1 query term.

    The inverted-index shape at scale: tokens are exploded ONCE and
    immediately semi-filtered to the query terms (a broadcast of |query|
    strings), so the per-term postings aggregation touches only matching
    occurrences — never the full token stream's shuffle. Corpus constants
    (N, avg doc length) and per-term document frequencies are
    dimension-sized aggregates joined back via broadcast. Scoring is then
    a single projection: idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf = ln((N − df + 0.5)/(df + 0.5) + 1).
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("_w"))
    lens = base.select(id_col, F.size("_w").alias("_dl"))
    consts = lens.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    q = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        base.select(F.col(id_col), F.explode("_w").alias("_term"))
        .filter(F.array_contains(q, F.col("_term")))
        .groupBy(id_col, "_term")
        .agg(F.count(F.lit(1)).alias("_f"))
        # document frequency as a WINDOW over the postings aggregate —
        # tf holds exactly one row per (doc, term), so the per-term row
        # count IS the distinct-doc count; a groupBy+join branch would
        # re-explode the corpus from a second scan (scan-audit principle)
        .withColumn("_nd", F.count(F.lit(1)).over(Window.partitionBy("_term")))
    )
    idf = F.log(
        (F.col("_n") - F.col("_nd") + 0.5) / (F.col("_nd") + 0.5) + 1.0
    )
    denom = F.col("_f") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    return (
        tf.join(lens, id_col)
        .crossJoin(F.broadcast(consts))
        .withColumn("_s", idf * F.col("_f") * (k1 + 1.0) / denom)
        .groupBy(id_col)
        .agg(F.sum("_s").alias("bm25"))
    )


def dup_span_stats(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    hashed: bool = False,
) -> DataFrame:
    """Per-group repeated-span profile: fraction of each group's k-token
    spans that occur in ≥2 documents corpus-wide (the span-dedup health
    stat; see catalog ``text_dup_span_stats``).

    ``hashed=True`` is the 100 TB path: spans become ``xxhash64`` int64
    keys BEFORE the count join, so the two shuffles carry 8-byte keys
    instead of k-token strings (which otherwise dominate shuffle bytes).
    64-bit collisions are negligible at corpus scale; the hashed and exact
    paths are asserted identical in tests/test_text.py.
    """
    from overseer_spark.functions.textfns import shingles, tokens
    from overseer_spark.operators.util import spread

    sh_expr = shingles(tokens(text_col), k=k)
    spans = spread(df, id_col).select(
        id_col, group_col, F.explode(sh_expr).alias("s")
    )
    if hashed:
        spans = spans.select(id_col, group_col, F.xxhash64("s").alias("s"))
    cnt = spans.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    dup = (F.col("nd") >= 2).cast("int")
    return (
        spans.join(cnt, "s")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(dup).cast("long").alias("dup_spans"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 4).alias("dup_rate"),
        )
        .orderBy(group_col)
    )


def heavy_hitters(
    df: DataFrame,
    k: int = 40,
    text_col: str = "text",
) -> DataFrame:
    """Exact heavy hitters (tokens with frequency > n/k) via a two-pass
    Misra-Gries plan — the scalable alternative to a full token group-by
    when the vocabulary is huge but the answer is small.

    Pass 1 runs a bounded Misra-Gries summary *per partition* inside
    ``mapInPandas`` (≤ k counters held in memory, one extra row carrying
    the partition's token total). Each Arrow batch is folded in via its
    vectorized ``value_counts`` and the merged counter is MG-compressed
    back to k entries (subtract the (k+1)-th largest count, drop ≤ 0) —
    the mergeable-summaries formulation (Agarwal et al., PODS'12), which
    keeps the undercount bound est ≥ f_i − n_i/k while avoiding a Python
    loop over individual tokens. So any token with global frequency >
    n/k must survive in at least one partition's summary, and the union
    of partial summaries is a guaranteed superset of the true heavy
    hitters.

    Pass 2 recounts ONLY the candidate tokens exactly (broadcast semi-join
    against the candidate set) and applies the threshold — so the output
    is exact and deterministic regardless of partitioning, while the
    shuffle carries at most ``k × num_partitions`` candidate rows plus the
    filtered token stream instead of the full vocabulary.

    At 100 TB: the full-vocab group-by shuffles |vocab| cells per
    partition; this plan shuffles ≤ k rows per partition in pass 1 and
    only candidate-matching tokens in pass 2. Mirrors the mergeable-
    summaries design of the reference's sketch family (SURVEY.md §2.C).
    """
    import pandas as pd  # noqa: PLC0415

    toks = df.select(F.explode(tokens(text_col)).alias("token"))

    def _mg(batches):
        counters = pd.Series(dtype="int64")
        n = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            n += int(vc.sum())
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                # MG compress: subtract the (k+1)-th largest from EVERY
                # counter, drop <= 0. The subtraction is what makes the
                # bound work: each round removes >= (k+1)*cut total mass,
                # so sum(cut) <= n/(k+1) and any element's cumulative loss
                # is <= n/(k+1) < n/k. (Dropping small entries WITHOUT
                # subtracting is unsound — large survivors would justify
                # unlimited drop rounds and a true heavy hitter arriving
                # in small increments could be discarded every round.)
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        out = {
            "token": list(counters.index) + [None],
            "est": [int(x) for x in counters.values] + [n],
        }
        yield pd.DataFrame(out)

    summary = toks.mapInPandas(_mg, "token string, est long")
    # Bounded: ≤ (k+1) rows per partition.  Candidates + exact total.
    parts = summary.select("token", "est")
    candidates = parts.where(F.col("token").isNotNull()).select("token").distinct()
    total = parts.where(F.col("token").isNull()).agg(F.sum("est").alias("n"))
    exact = (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("freq") * k > F.col("n"))
        .select("token", "freq")
        .orderBy(F.desc("freq"), "token")
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the cheap redundancy signal
    corpus filters use beside repetition ratios (machine-generated and
    template text compresses far better than natural prose; Gopher-class
    pipelines threshold on exactly this). Deterministic for a fixed
    zlib level; Arrow-batched pandas UDF (the one operator class where
    Python is the right tool — zlib IS the feature)."""
    from pyspark.sql.functions import pandas_udf

    def _ratio(texts):  # no hints: stringified annotations break inference
        import zlib

        import pandas as pd

        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            out.append(
                len(zlib.compress(raw, level)) / len(raw) if raw else 1.0
            )
        return pd.Series(out)

    ratio_udf = pandas_udf(_ratio, returnType="double")
    return df.select(
        id_col, F.round(ratio_udf(F.col(text_col)), 5).alias("compression_ratio")
    )


# Deterministic policy blocklist for the catalog entry / tests. Every
# pattern is border-free (no proper prefix == suffix), so occurrences of
# one pattern can never overlap each other and a greedy non-overlapping
# count (the oracle's REPLACE-length formula) equals the all-match count
# Aho–Corasick reports.
DEFAULT_BLOCKLIST = (
    "big table",
    "fast merge",
    "slow scan",
    "stream customer",
    "vector",
)


def _build_aho_corasick(patterns: tuple[str, ...]):
    """Standard Aho–Corasick automaton as flat lists: goto dicts, failure
    links, and per-node matched-pattern-id lists (outputs already merged
    through the failure chain, so matching never walks fail links)."""
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for pid, pat in enumerate(patterns):
        node = 0
        for ch in pat:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(pid)
    fail = [0] * len(goto)
    from collections import deque

    bfs = deque(goto[0].values())
    while bfs:
        node = bfs.popleft()
        for ch, nxt in goto[node].items():
            bfs.append(nxt)
            f = fail[node]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt] = out[nxt] + out[fail[nxt]]  # merge suffix outputs
    return goto, fail, out


def blocklist_matches(
    df: DataFrame,
    patterns: tuple[str, ...] = DEFAULT_BLOCKLIST,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-pattern blocklist scan (policy/NSFW-term filtering): ONE
    Aho–Corasick pass per document finds every occurrence of every
    pattern — O(bytes + matches) regardless of pattern count, where the
    per-pattern alternative (P LIKE scans or P regex passes) is
    O(P × bytes) and falls over at the thousands-of-patterns blocklists
    real corpus policy uses. The automaton is built once on the driver
    (tiny: nodes ≤ total pattern chars) and rides to executors inside
    the mapInPandas closure; each Arrow batch emits PARTIAL per-pattern
    (docs_hit, n_matches) rows, so the shuffle is O(partitions ×
    patterns) — document text never moves. Returns one row per pattern:
    (pattern, docs_hit, n_matches).
    """
    patterns = tuple(patterns)
    goto, fail, out = _build_aho_corasick(patterns)
    n_pat = len(patterns)

    def _scan(batches):
        import pandas as pd

        for pdf in batches:
            docs_hit = [0] * n_pat
            n_matches = [0] * n_pat
            for t in pdf[text_col]:
                if not t:
                    continue
                counts: dict[int, int] = {}
                node = 0
                for ch in t:
                    while node and ch not in goto[node]:
                        node = fail[node]
                    node = goto[node].get(ch, 0)
                    for pid in out[node]:
                        counts[pid] = counts.get(pid, 0) + 1
                for pid, c in counts.items():
                    docs_hit[pid] += 1
                    n_matches[pid] += c
            yield pd.DataFrame(
                {
                    "pattern": list(patterns),
                    "docs_hit": docs_hit,
                    "n_matches": n_matches,
                }
            )

    partials = df.select(id_col, text_col).mapInPandas(
        _scan, schema="pattern string, docs_hit long, n_matches long"
    )
    return (
        partials.groupBy("pattern")
        .agg(
            F.sum("docs_hit").cast("long").alias("docs_hit"),
            F.sum("n_matches").cast("long").alias("n_matches"),
        )
        .orderBy("pattern")
    )


def wrap_html(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_para: int = 12,
) -> DataFrame:
    """Deterministic HTML wrapping of document text — the test-data
    generator for the web-extraction path (the CommonCrawl-shaped step
    every pretraining pipeline runs).  Each document becomes a full
    page: head with <title>/<style>/<script>, a <nav> bar, an ad block,
    an <article> holding the text as ``words_per_para``-word
    <p> paragraphs (entity-escaped) with an id-keyed inline ad div
    BETWEEN paragraphs, and a <footer> with entity references — so
    extraction has real boilerplate, script/style payloads, and
    entity-decoding work to do.  Arrow-batched; spread-first so the
    per-doc Python work parallelizes off a narrow input."""

    def batches(it):
        import html as _html

        import pandas as pd

        for pdf in it:
            out_ids, out_html = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                words = (t or "").split()
                paras = [
                    " ".join(words[k : k + words_per_para])
                    for k in range(0, len(words), words_per_para)
                ]
                body = []
                for pi, para in enumerate(paras):
                    if pi == 1:
                        body.append(
                            f'<div class="ad">Buy now &amp; save {i % 7}0%!</div>'
                        )
                    body.append(f"<p>{_html.escape(para)}</p>")
                page = (
                    "<!DOCTYPE html><html><head>"
                    f"<title>Doc {i}</title>"
                    "<style>body{margin:0;font:14px sans-serif}</style>"
                    f"<script>var docId={i};track(docId&&1);</script>"
                    "</head><body>"
                    '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
                    f'<div class="ad">Sponsored &mdash; offer {i % 5}</div>'
                    f"<article><h1>Doc {i}</h1>" + "".join(body) + "</article>"
                    f"<footer>&copy; 2026 Example Corp &ndash; id {i}</footer>"
                    "</body></html>"
                )
                out_ids.append(i)
                out_html.append(page)
            yield pd.DataFrame({id_col: out_ids, "html": out_html})

    return spread(df.select(id_col, text_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, html string"
    )


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Main-content extraction from HTML — strip tags, drop script/style
    and boilerplate elements (nav, footer, class="ad"), decode entity
    references, and keep only <article> paragraph text (stdlib
    html.parser; no native libs).  Emits (id, extracted, n_paragraphs,
    *keep_cols).  ``keep_cols`` ride through the Arrow batch untouched so
    a caller needing record metadata beside the extraction (the WARC
    pipeline wants http_status/target_uri) gets it in the SAME pass — no
    self-join back onto the upstream, which would both shuffle and
    recompute the whole subtree once per branch.
    On wrap_html pages the round trip is LOSSLESS: ``extracted`` equals
    the original text column bit-for-bit, which is the catalog entry's
    DuckDB oracle — no tolerance, no similarity threshold.  Real pages
    obviously are not lossless; the operator's value there is the same
    boilerplate-dropping traversal, and the synthetic round trip proves
    the traversal loses nothing it should keep."""

    def batches(it):
        from html.parser import HTMLParser

        import pandas as pd

        class _Extract(HTMLParser):
            _VOID = {"br", "img", "hr", "meta", "link", "input"}

            def __init__(self):
                super().__init__(convert_charrefs=True)
                # stack of (tag, effect) for every open element, where
                # effect records what the OPEN actually did ("sup" /
                # "article" / "p" / None) — suppression is decided at
                # open time (class attrs are only visible there) and
                # unwound exactly by the matching close
                self.stack: list[tuple[str, str | None]] = []
                self.suppress = 0
                self.in_article = 0
                self.in_p = 0
                self.paras: list[str] = []

            def handle_starttag(self, tag, attrs):
                if tag in self._VOID:
                    return
                cls = dict(attrs).get("class") or ""
                if tag in ("script", "style", "nav", "footer") or (
                    "ad" in cls.split()
                ):
                    effect = "sup"
                    self.suppress += 1
                elif tag == "article":
                    effect = "article"
                    self.in_article += 1
                elif tag == "p" and self.in_article and not self.suppress:
                    effect = "p"
                    self.in_p += 1
                    self.paras.append("")
                else:
                    effect = None
                self.stack.append((tag, effect))

            def handle_endtag(self, tag):
                # pop to the nearest matching open tag (tolerates the
                # unclosed-tag soup real pages have)
                for k in range(len(self.stack) - 1, -1, -1):
                    if self.stack[k][0] == tag:
                        for _t, effect in reversed(self.stack[k:]):
                            if effect == "sup":
                                self.suppress -= 1
                            elif effect == "article":
                                self.in_article -= 1
                            elif effect == "p":
                                self.in_p -= 1
                        del self.stack[k:]
                        break

            def handle_data(self, data):
                if self.in_p and not self.suppress:
                    self.paras[-1] += data

        for pdf in it:
            out_ids, out_text, out_np = [], [], []
            for i, page in zip(pdf[id_col], pdf[html_col]):
                p = _Extract()
                p.feed(page or "")
                paras = [x.strip() for x in p.paras if x.strip()]
                out_ids.append(int(i))
                out_text.append(" ".join(paras))
                out_np.append(len(paras))
            cols = {id_col: out_ids, "extracted": out_text, "n_paragraphs": out_np}
            for k in keep_cols:
                cols[k] = list(pdf[k])
            yield pd.DataFrame(cols)

    in_schema = dict(zip(df.columns, [f.dataType.simpleString() for f in df.schema]))
    keep_schema = "".join(f", {k} {in_schema[k]}" for k in keep_cols)
    return df.select(id_col, html_col, *keep_cols).mapInPandas(
        batches,
        schema=(
            f"{id_col} long, extracted string, n_paragraphs int{keep_schema}"
        ),
    )


def wrap_markdown(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_para: int = 12,
) -> DataFrame:
    """Deterministic Markdown wrapping of document text — test-data
    generator for the markdown-extraction path (the #2 interchange
    format in real training corpora after HTML: GitHub, docs sites,
    wikis).  Each document becomes a page: title heading, a blockquote
    promo line, the text as ``words_per_para``-word paragraphs with
    deterministic inline decoration (first word bolded, third word
    emphasized, fifth word wrapped in a link), a fenced code block of
    non-content between the first two paragraphs, and a trailing nav
    list — so extraction has block-level AND inline-level work to do.
    Arrow-batched, spread-first."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            out_ids, out_md = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                words = (t or "").split()
                paras = []
                for k in range(0, len(words), words_per_para):
                    chunk = list(words[k : k + words_per_para])
                    if len(chunk) >= 1:
                        chunk[0] = f"**{chunk[0]}**"
                    if len(chunk) >= 3:
                        chunk[2] = f"_{chunk[2]}_"
                    if len(chunk) >= 5:
                        chunk[4] = f"[{chunk[4]}](https://example{i % 20}.com/)"
                    paras.append(" ".join(chunk))
                body = []
                for pi, para in enumerate(paras):
                    if pi == 1:
                        body.append(f"```python\nboilerplate({i})\n```")
                    body.append(para)
                page = "\n\n".join(
                    [
                        f"# Doc {i}",
                        f"> Sponsored — offer {i % 5}",
                        *body,
                        f"- [Home](/)\n- [About](/about?ref={i})",
                    ]
                )
                out_ids.append(i)
                out_md.append(page)
            yield pd.DataFrame({id_col: out_ids, "markdown": out_md})

    return spread(df.select(id_col, text_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, markdown string"
    )


def markdown_extract(
    df: DataFrame, md_col: str = "markdown", id_col: str = "doc_id"
) -> DataFrame:
    """Main-content extraction from Markdown: drop fenced code blocks,
    headings, blockquotes, and list items at the BLOCK level, then strip
    inline decoration — links keep their text, bold/emphasis markers
    unwrap — and reassemble paragraph text.  On wrap_markdown pages the
    round trip is LOSSLESS (the catalog entry's verbatim oracle); on
    real markdown the same traversal is the content/boilerplate split.
    Pure stdlib regex, Arrow-batched."""

    def batches(it):
        import re

        import pandas as pd

        link = re.compile(r"\[([^\]]*)\]\([^)]*\)")
        bold = re.compile(r"\*\*([^*]+)\*\*")
        em = re.compile(r"(?<![\w_])_([^_]+)_(?![\w_])")

        def extract(md: str) -> tuple[str, int]:
            paras = []
            in_fence = False
            for line in (md or "").splitlines():
                s = line.strip()
                if s.startswith("```"):
                    in_fence = not in_fence
                    continue
                if in_fence or not s:
                    continue
                if s.startswith(("#", ">", "- ", "* ")) or re.match(
                    r"^\d+\.\s", s
                ):
                    continue
                s = link.sub(r"\1", s)
                s = bold.sub(r"\1", s)
                s = em.sub(r"\1", s)
                paras.append(s)
            return " ".join(paras), len(paras)

        for pdf in it:
            out_ids, out_text, out_np = [], [], []
            for i, md in zip(pdf[id_col], pdf[md_col]):
                text, np_ = extract(md)
                out_ids.append(int(i))
                out_text.append(text)
                out_np.append(np_)
            yield pd.DataFrame(
                {id_col: out_ids, "extracted": out_text, "n_paragraphs": out_np}
            )

    return df.select(id_col, md_col).mapInPandas(
        batches, schema=f"{id_col} long, extracted string, n_paragraphs int"
    )


def chat_build(docs: DataFrame) -> DataFrame:
    """Deterministic conversation synthesis shared by chat_audit and
    chat_loss_masking (and their oracles): 8-token turn chunks with
    planted defects — doc_id%7 breaks role alternation, doc_id%11
    empties a turn, odd turn counts (every other doc) end on 'user'.
    Returns (doc_id, source, n, roles, contents)."""
    n = F.least(
        F.lit(4) + F.col("doc_id") % 2,
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.size(F.col("toks")) / F.lit(8.0)),
        ),
    )
    conv = docs.select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    ).select("doc_id", "source", "toks", n.alias("n"))
    roles = F.transform(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: F.when(
            (F.col("doc_id") % 7 == 0) & (i == 2), F.lit("user")
        )
        .when((i - 1) % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")),
    )
    contents = F.transform(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: F.when(
            (F.col("doc_id") % 11 == 0) & (i == 1), F.lit("")
        ).otherwise(
            F.array_join(
                F.slice(
                    F.col("toks"), ((i - 1) * 8 + 1).cast("int"), F.lit(8)
                ),
                " ",
            )
        ),
    )
    return conv.select(
        "doc_id", "source", "n", roles.alias("roles"),
        contents.alias("contents"),
    )


def chat_audit(docs: DataFrame) -> DataFrame:
    """Chat-format QA rollup shared by the batch and streaming entries
    (catalog: chat_format_audit / stream_chat_format_audit) — one
    definition, both engines, per the repo's batch/stream parity
    contract. Conversations come from :func:`chat_build` and are audited
    with array higher-order functions over the CONSTRUCTED arrays.
    Returns per-source violation counts.

    Engine-portability note (found by the arrayfunc fuzz family's
    motivating bug): Spark ``sequence(2, n)`` with n=1 yields the
    DESCENDING [2, 1], so the adjacency scan is guarded on n >= 2.
    """
    built = chat_build(docs)
    v_alt = (
        F.when(
            F.col("n") >= 2,
            F.exists(
                F.sequence(F.lit(2), F.col("n")),
                lambda i: F.element_at("roles", i.cast("int"))
                == F.element_at("roles", (i - 1).cast("int")),
            ),
        )
        .otherwise(F.lit(False))
        .cast("int")
    )
    v_empty = F.exists("contents", lambda c: c == "").cast("int")
    v_end = (
        F.element_at("roles", F.col("n").cast("int")) != "assistant"
    ).cast("int")
    audited = built.select(
        "source", v_alt.alias("v_alt"), v_empty.alias("v_empty"),
        v_end.alias("v_end"),
    )
    return audited.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("v_alt").cast("long").alias("alt_violations"),
        F.sum("v_empty").cast("long").alias("empty_violations"),
        F.sum("v_end").cast("long").alias("bad_ending"),
        F.sum(
            F.when(
                (F.col("v_alt") == 0)
                & (F.col("v_empty") == 0)
                & (F.col("v_end") == 0),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("clean"),
    )


def split_paragraphs(text_col) -> Column:
    """Real paragraph boundaries: split on blank lines (2+ newlines) and
    trim — RE2-safe regex so a DuckDB ``regexp_split_to_array(text,
    '\\n{2,}')`` oracle replays it exactly. Returns the array column;
    explode + filter empties downstream."""
    return F.transform(
        F.split(text_col, r"\n{2,}"), lambda p: F.trim(p)
    )


def split_sentences(text_col) -> Column:
    """Sentence boundaries: split AFTER terminal punctuation. RE2 has no
    lookbehind, so the engine-portable form first marks boundaries with a
    sentinel (replace '<punct><spaces>' with '<punct>\\x1f') then splits
    on the sentinel — DuckDB replays via the same two regexp calls."""
    marked = F.regexp_replace(text_col, r"([.!?])\s+", "$1\x1f")
    return F.transform(F.split(marked, "\x1f"), lambda s: F.trim(s))


def paragraph_dedup_stats(
    docs: DataFrame,
    boundary: str = "chunks",
    chunk_tokens: int = 8,
    min_chars: int = 20,
) -> DataFrame:
    """Paragraph-level duplication profile per source (the
    text_paragraph_dedup_stats catalog entry, factored so both boundary
    modes share one pipeline):

    - ``boundary="chunks"``: non-overlapping ``chunk_tokens``-token
      windows — the proxy the DRIVER fixtures need (their text carries no
      punctuation) and the hash-input bound at 100 TB.
    - ``boundary="paragraphs"``: REAL blank-line boundaries
      (split_paragraphs) — the semantics the operator exists for, used on
      corpora that have them (the punctuated 10x fixture; real crawls).

    Plan is identical in both modes: one scan → boundary-explode →
    (md5, source) partial-agg → hash-partitioned window → source rollup;
    16-byte hashes shuffle, text never does."""
    if boundary == "paragraphs":
        pieces = split_paragraphs(F.col("text"))
    elif boundary == "chunks":
        w = F.split(F.col("text"), " ")
        pieces = F.transform(
            F.sequence(
                F.lit(1).cast("long"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(F.size(w) / F.lit(float(chunk_tokens))),
                ),
            ),
            lambda i: F.array_join(
                F.slice(
                    w, ((i - 1) * chunk_tokens + 1).cast("int"),
                    F.lit(chunk_tokens),
                ),
                " ",
            ),
        )
    else:
        raise ValueError(f"unknown boundary mode: {boundary!r}")
    para = (
        docs.select("source", F.explode(pieces).alias("p"))
        .where(F.length("p") > min_chars)
        .select("source", F.md5("p").alias("h"))
    )
    g = para.groupBy("h", "source").agg(F.count(F.lit(1)).alias("n"))
    w2 = g.select(
        "h", "source", "n",
        F.sum("n").over(Window.partitionBy("h")).alias("total"),
    )
    rep = F.sum(F.when(F.col("total") >= 2, F.col("n")).otherwise(0))
    return (
        w2.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_paras"),
            rep.cast("long").alias("n_repeated"),
            F.round(rep.cast("double") / F.sum("n"), 4).alias("dup_ratio"),
            F.countDistinct(F.when(F.col("total") >= 2, F.col("h")))
            .cast("long")
            .alias("distinct_repeated"),
        )
        .orderBy("source")
    )


def chat_loss_masking(docs: DataFrame) -> DataFrame:
    """Loss-masking accounting over the synthesized conversations
    (:func:`chat_build`): in SFT, user turns are masked out of the loss
    and only assistant-turn tokens train — so the per-source fraction of
    TRAINABLE tokens is the number that decides whether a chat corpus is
    worth its storage. Per source: conversations, trainable (assistant)
    tokens, masked (user) tokens, trainable fraction (4dp), and
    conversations with ZERO trainable tokens (pure-user degenerates an
    ingest should drop). Token counts are exact slice sizes — BIGINT all
    the way to the final division. One scan, array HOFs in codegen, one
    partial-agg'd rollup: conversation bodies never shuffle."""
    built = chat_build(docs)
    turn_tok = lambda i: F.when(  # noqa: E731
        F.element_at("contents", i.cast("int")) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.element_at("contents", i.cast("int")), " ")))
    role_sum = lambda role: F.aggregate(  # noqa: E731
        F.filter(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.element_at("roles", i.cast("int")) == role,
        ),
        F.lit(0).cast("long"),
        lambda acc, i: acc + turn_tok(i),
    )
    per_conv = built.select(
        "source",
        role_sum("assistant").alias("trainable"),
        role_sum("user").alias("masked"),
    )
    return per_conv.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("trainable").cast("long").alias("trainable_tok"),
        F.sum("masked").cast("long").alias("masked_tok"),
        F.round(
            F.sum("trainable").cast("double")
            / (F.sum("trainable") + F.sum("masked")),
            4,
        ).alias("trainable_frac"),
        F.sum(F.when(F.col("trainable") == 0, 1).otherwise(0))
        .cast("long")
        .alias("zero_trainable_convs"),
    )


def quality_gate_counts(docs: DataFrame) -> DataFrame:
    """Per-source quality pass rate — the ingest QA rollup, shared by the
    batch and streaming catalog entries (batch/stream parity contract,
    like chat_audit). Streaming-safe by construction: pure per-row
    expressions + one aggregation, no repartition/window, so the same
    definition runs under readStream in complete mode. Gate: the
    composite quality score (quality_score's closed form) >= 0.97
    (the fixture scores sit in [0.89, 1.0], so 0.97 actually splits)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    q = F.round(
        F.when((n >= 5) & (distinct_ratio > 0.2), F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        * (F.lit(1.0) - n_stop / n * F.lit(0.5)),
        4,
    )
    return (
        docs.select("source", q.alias("q"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("q") >= 0.97, 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.round(
                F.sum(F.when(F.col("q") >= 0.97, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            ).alias("pass_frac"),
        )
    )
