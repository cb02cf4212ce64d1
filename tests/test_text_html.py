"""HTML wrap → extract round trip: the lossless invariant behind
text_html_extract, plus the traversal edge cases real pages throw —
entity references inside paragraphs, nested ad subtrees, tag soup."""

import pandas as pd

from tests.conftest import SF_SMOKE


def _roundtrip(spark, texts):
    from overseer_spark.operators.text import html_extract, wrap_html

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    )
    out = {r["doc_id"]: r for r in html_extract(wrap_html(df)).collect()}
    return out


def test_html_roundtrip_lossless(spark):
    texts = [
        "key agg row scan slow fast table value part hash join sort group "
        "limit filter window order data column spark batch stream",
        "a b",
        "solo",
        "x " * 29 + "x",  # exactly 30 words -> 3 paragraphs
    ]
    out = _roundtrip(spark, texts)
    for i, t in enumerate(texts):
        assert out[i]["extracted"] == t.strip()
    assert out[3]["n_paragraphs"] == 3
    assert out[1]["n_paragraphs"] == 1


def test_html_roundtrip_entities_survive(spark):
    # words containing &, <, > must escape on wrap and decode on extract
    texts = ["AT&T says 1<2 and 3>2 & more", "quote ' and \" chars"]
    out = _roundtrip(spark, texts)
    for i, t in enumerate(texts):
        assert out[i]["extracted"] == t


def test_html_extract_drops_boilerplate_and_nested_ads(spark):
    from overseer_spark.operators.text import html_extract

    page = (
        "<html><body><nav>MENU <p>nav para</p></nav>"
        '<article><h1>T</h1><p>keep one</p>'
        '<div class="ad">outer <div><p>inner ad para</p></div></div>'
        "<p>keep two</p></article>"
        "<footer><p>foot</p></footer></body></html>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "html": [page]})
    )
    r = html_extract(df).collect()[0]
    assert r["extracted"] == "keep one keep two"
    assert r["n_paragraphs"] == 2


def test_html_extract_tolerates_tag_soup(spark):
    from overseer_spark.operators.text import html_extract

    # unclosed p, stray close tags, void elements
    page = (
        "<article><p>alpha beta<br><p>gamma</p></article></div></p>"
        "<article><p>second article</p></article>"
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "html": [page]}))
    r = html_extract(df).collect()[0]
    assert "alpha beta" in r["extracted"]
    assert "gamma" in r["extracted"]
    assert "second article" in r["extracted"]


def test_html_extract_entry_matches_docs(spark):
    from overseer_spark.queries.catalog import CATALOG

    rows = CATALOG["text_html_extract"].fn(spark, SF_SMOKE).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where("doc_id % 4 = 2")
        .collect()
    }
    assert len(rows) == len(docs) > 0
    for r in rows:
        assert r["extracted"] == docs[r["doc_id"]]


def test_markdown_roundtrip_lossless(spark):
    from overseer_spark.operators.text import markdown_extract, wrap_markdown

    texts = [
        "key agg row scan slow fast table value part hash join sort group "
        "limit filter window order data column spark batch stream",
        "a b c d e",   # 5 words: bold + em + link all land
        "one",         # single word: bold only
        "x " * 29 + "x",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    )
    out = {r["doc_id"]: r for r in
           markdown_extract(wrap_markdown(df)).collect()}
    for i, t in enumerate(texts):
        assert out[i]["extracted"] == t.strip(), i
    assert out[3]["n_paragraphs"] == 3


def test_markdown_extract_block_and_inline_rules(spark):
    from overseer_spark.operators.text import markdown_extract

    md = "\n".join(
        [
            "# Title",
            "",
            "keep **bold** and _emph_ and [text](https://x/?a=1) here",
            "",
            "```",
            "code line skipped",
            "# not a heading, inside fence",
            "```",
            "",
            "> quoted boilerplate",
            "- item",
            "* item2",
            "3. numbered",
            "",
            "second para_with_snake_case stays",
        ]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "markdown": [md]})
    )
    r = markdown_extract(df).collect()[0]
    assert r["extracted"] == (
        "keep bold and emph and text here "
        "second para_with_snake_case stays"
    )
    assert r["n_paragraphs"] == 2
