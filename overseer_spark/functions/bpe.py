"""Byte-pair-encoding tokenizer: sample-trained, broadcast-applied.

The production shape for tokenization at corpus scale: BPE merge learning
is inherently sequential (each merge depends on the counts AFTER the
previous merge), so it runs driver-side on a bounded corpus sample —
exactly how real tokenizers are built (trained once on ~GBs, applied to
everything). Application is embarrassingly parallel: the learned merge
ranks broadcast to executors and an Arrow-batched ``mapInPandas`` encodes
documents with zero shuffle.

Pure-Python reference algorithm (Sennrich et al. 2016), no external deps;
greedy lowest-rank-first merging identical to the GPT-2 BPE application
rule, so the encoder is oracle-testable token by token.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"


def learn_bpe(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from sample texts (driver-side).

    Words are sequences of characters plus an end-of-word marker; each
    iteration merges the most frequent adjacent symbol pair (ties broken
    lexicographically for determinism).
    """
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(w) + (_END,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Counter = Counter()
        for sym, freq in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE application: repeatedly merge the lowest-rank pair."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def train_from_sample(
    df: DataFrame,
    n_merges: int = 200,
    sample_docs: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Deterministic bounded sample (md5-ordered ids — partitioning- and
    engine-independent) → driver-side merge learning."""
    sample = (
        df.select(id_col, text_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(sample_docs)
        .collect()
    )
    return learn_bpe([r[text_col] for r in sample], n_merges)


def encode_corpus(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, n_chars_per_token, tokens array) via broadcast ranks +
    Arrow-batched mapInPandas — no shuffle, Python cost amortized per batch."""
    import pandas as pd

    from overseer_spark.operators.util import spread

    spark = df.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )
    src = spread(df, id_col).select(id_col, text_col)

    def run(batches):
        ranks = ranks_bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for t in pdf[text_col]:
                toks: list[str] = []
                for w in t.split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = encode_word(w, ranks)
                    toks.extend(got)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_tokens": n_col, "tokens": toks_col}
            )

    return src.mapInPandas(
        run, schema=f"{id_col} long, n_tokens long, tokens array<string>"
    )
