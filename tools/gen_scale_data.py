"""Generate an sf1-equivalent (10x sf0.1) documents + embeddings dataset.

The driver ships sf0.1 as the largest scale; the scaling study
(SCALING.md "measured scale ratios") needs a 10x corpus with the SAME
statistical structure, so this bootstrap-resamples sf0.1:

- documents: resample source rows, mutate 15% of words (vocab drawn from
  the corpus's own frequency distribution) so resamples are NOT trivial
  duplicates; additionally 3% of rows are 5%-mutated copies of an earlier
  generated row — an explicit near-duplicate population whose size grows
  linearly with the corpus, matching how real crawl dup-rates behave.
- embeddings: resample vectors with N(0, 0.05*std) noise — cluster
  structure (what IVF/semantic-dedup cost depends on) is preserved.

Deterministic (seed 42). Usage:
    python tools/gen_scale_data.py [--mult 10] [--out .bench_sf1]
events and the TPC-H facts (lineitem+orders, orderkey-offset replicas
against unchanged dimensions) scale too; the remaining dimension tables
are symlinked from sf0.1 so catalog entries that read them still
resolve.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _punctuate(words: list[str], rng: np.random.Generator) -> str:
    """Assemble words into sentences (6-14 words, '.'-terminated) grouped
    into paragraphs (2-5 sentences) separated by ' \\n\\n ' — real
    boundary structure so paragraph/sentence-granularity operators have
    something to split on. The space-padded separator keeps single-space
    tokenization clean in both engines (the separator becomes its own
    token instead of fusing adjacent words)."""
    paras = []
    i = 0
    while i < len(words):
        sents = []
        for _ in range(int(rng.integers(2, 6))):
            if i >= len(words):
                break
            sl = int(rng.integers(6, 15))
            sents.append(" ".join(words[i : i + sl]) + ".")
            i += sl
        if sents:
            paras.append(" ".join(sents))
    return " \n\n ".join(paras)


def gen_documents(out_dir: str, mult: int, rng: np.random.Generator) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    n_src = len(texts)
    # corpus vocabulary with empirical frequencies
    from collections import Counter

    vocab_counts = Counter(w for s in texts for w in s.split())
    vocab = np.array(list(vocab_counts))
    vocab_p = np.array(list(vocab_counts.values()), dtype=np.float64)
    vocab_p /= vocab_p.sum()

    # fixed boilerplate paragraphs (crawl header/footer population): the
    # corpus-wide repeated-paragraph signal paragraph-dedup needs — each
    # appears on ~12% of docs verbatim, like real site chrome
    boiler = [
        " ".join(str(w) for w in rng.choice(vocab, size=int(rng.integers(8, 16)), p=vocab_p)) + "."
        for _ in range(20)
    ]

    n_out = n_src * mult
    out_text, out_lang, out_source = [], [], []
    for i in range(n_out):
        if out_text and rng.random() < 0.03:
            # explicit near-duplicate of an earlier generated doc (5%
            # mutated) — STRUCTURE-PRESERVING: mutate tokens inside the
            # existing sentence/paragraph frame so the pair still shares
            # most paragraphs byte-identically
            j = int(rng.integers(0, len(out_text)))
            toks = out_text[j].split(" ")
            base_lang, base_source = out_lang[j], out_source[j]
            mut_idx = [k for k, w in enumerate(toks) if w not in ("", "\n\n")]
            n_mut = max(1, int(len(mut_idx) * 0.05))
            pick = rng.integers(0, len(mut_idx), size=n_mut)
            repl = rng.choice(vocab, size=n_mut, p=vocab_p)
            for k, w in zip(pick, repl):
                pos = mut_idx[int(k)]
                dot = "." if toks[pos].endswith(".") else ""
                toks[pos] = str(w) + dot
            s = " ".join(toks)
        else:
            j = int(rng.integers(0, n_src))
            words = list(texts[j].split())
            base_lang, base_source = langs[j], sources[j]
            n_mut = max(1, int(len(words) * 0.15))
            idx = rng.integers(0, len(words), size=n_mut)
            repl = rng.choice(vocab, size=n_mut, p=vocab_p)
            for k, w in zip(idx, repl):
                words[int(k)] = str(w)
            s = _punctuate(words, rng)
            r = rng.random()
            if r < 0.12:  # planted verbatim boilerplate paragraph
                b = boiler[int(rng.integers(0, len(boiler)))]
                s = (b + " \n\n " + s) if rng.random() < 0.5 else (s + " \n\n " + b)
        out_text.append(s)
        out_lang.append(base_lang)
        out_source.append(base_source)

    out = pa.table(
        {
            "doc_id": pa.array(range(n_out), pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_source, pa.string()),
            "n_chars": pa.array([len(s) for s in out_text], pa.int64()),
        }
    )
    pq.write_table(out, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(out_dir: str, mult: int, rng: np.random.Generator) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(t.column("label").to_pylist())
    n_src, dim = vecs.shape
    n_out = n_src * mult
    pick = rng.integers(0, n_src, size=n_out)
    noise = rng.normal(0.0, 0.05 * vecs.std(), size=(n_out, dim)).astype(np.float32)
    out_vecs = vecs[pick] + noise
    out = pa.table(
        {
            "vec_id": pa.array(range(n_out), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in out_vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels[pick]),
        }
    )
    pq.write_table(out, os.path.join(out_dir, "embeddings.parquet"))


def gen_events(out_dir: str, mult: int, rng: np.random.Generator) -> None:
    """10× events = 10× the user population with the SAME per-user
    activity shape: each replica offsets user_id/event_id into a fresh
    range and jitters ts by a per-replica constant ± up to 5 min per
    row, so per-user history length (what window costs depend on) is
    preserved while users, sessions, and sweep-line points all grow
    linearly — how traffic actually scales."""
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = t.num_rows
    ev_id = np.array(t.column("event_id").to_pylist(), dtype=np.int64)
    ts = np.array(t.column("ts").cast(pa.int64()).to_pylist(), dtype=np.int64)
    uid = np.array(t.column("user_id").to_pylist(), dtype=np.int64)
    etype = t.column("event_type").to_pylist()
    value = t.column("value").to_pylist()
    props = t.column("props").to_pylist()
    max_uid = int(uid.max()) + 1
    parts = []
    ts_unit = t.schema.field("ts").type
    for r in range(mult):
        jitter = rng.integers(-300, 301, size=n).astype(np.int64)
        scale = 1_000_000_000 if pa.types.is_timestamp(ts_unit) and ts_unit.unit == "ns" else 1_000_000
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(ev_id + r * n),
                    "ts": pa.array(ts + jitter * scale).cast(ts_unit),
                    "user_id": pa.array(uid + r * max_uid),
                    "event_type": pa.array(etype),
                    "value": pa.array(value),
                    "props": pa.array(props),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "events.parquet"))


def gen_tpch_facts(out_dir: str, mult: int) -> None:
    """10× TPC-H fact tables: lineitem + orders replicated together with
    the ORDER KEY offset into fresh ranges per replica — the two tables
    stay referentially consistent — while part/supplier/customer keys
    are left UNCHANGED, so every dimension join still matches and
    per-part / per-customer fact volume grows 10× (how fact tables
    actually grow against slowly-changing dimensions). For the
    co-occurrence graph entries this is the REALISTIC hard case: pair
    support grows ~10×, far more part pairs clear the min-support
    filter, and hub degrees grow — exactly the regime the low-degree
    orientation exists for. Deterministic (pure replication, no rng),
    so adding this generator leaves every other table's draws
    byte-identical."""
    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    od = pq.read_table(os.path.join(SRC, "orders.parquet"))
    max_ok = (
        max(
            int(pa.compute.max(li.column("l_orderkey")).as_py()),
            int(pa.compute.max(od.column("o_orderkey")).as_py()),
        )
        + 1
    )
    li_parts, od_parts = [], []
    for r in range(mult):
        off = r * max_ok
        li_parts.append(
            li.set_column(
                li.schema.get_field_index("l_orderkey"),
                "l_orderkey",
                pa.compute.add(li.column("l_orderkey"), off),
            )
        )
        od_parts.append(
            od.set_column(
                od.schema.get_field_index("o_orderkey"),
                "o_orderkey",
                pa.compute.add(od.column("o_orderkey"), off),
            )
        )
    for name, parts in (("lineitem", li_parts), ("orders", od_parts)):
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.islink(dst):
            os.unlink(dst)  # replace the old sf0.1 symlink
        pq.write_table(pa.concat_tables(parts), dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=".bench_sf1")
    ap.add_argument(
        "--embeddings-only",
        action="store_true",
        help="generate only embeddings.parquet (the deep ANN ladder "
        "rungs — e.g. 100x for the graph-ANN recall eval, VERDICT r10 "
        "ask #1 — need a big vector corpus but none of the text/fact "
        "tables; at 100x those would be ~10 GB of parquet for nothing)",
    )
    ns = ap.parse_args()
    os.makedirs(ns.out, exist_ok=True)
    rng = np.random.default_rng(42)
    if ns.embeddings_only:
        # NOTE: draws differ from a full run at the same mult (the
        # documents generator consumes rng first there); an
        # embeddings-only fixture is its own corpus, not a subset
        gen_embeddings(ns.out, ns.mult, rng)
        print(f"wrote {ns.out}/embeddings.parquet at {ns.mult}x sf0.1")
        return
    gen_documents(ns.out, ns.mult, rng)
    gen_embeddings(ns.out, ns.mult, rng)
    gen_events(ns.out, ns.mult, rng)
    gen_tpch_facts(ns.out, ns.mult)
    for name in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        dst = os.path.join(ns.out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    print(f"wrote {ns.out} at {ns.mult}x sf0.1")


if __name__ == "__main__":
    main()
