"""WARC reader/writer: spec-shaped structure, the member-per-record
.warc.gz splitability property, framing corruption detection, and the
Spark explode stage."""

import zlib

import pandas as pd
import pytest

from overseer_spark.sources.warc import (
    _split_members,
    build_warc,
    parse_warc,
    read_warc_records,
)


def _pages(spark, ids, source="srcA"):
    from overseer_spark.operators.text import wrap_html

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ids, "text": [f"alpha beta gamma doc {i}" for i in ids]}
        )
    )
    return wrap_html(df).join(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": ids, "source": [source] * len(ids)})
        ),
        "doc_id",
    )


def test_warc_structure_and_roundtrip(spark):
    # "srcA" hashes odd -> plain; "srcB" hashes even? pick by probing
    for source in ("srcA", "srcB", "src0", "src1"):
        rows = build_warc(_pages(spark, [1, 2, 3], source)).collect()
        assert len(rows) == 1
        payload = bytes(rows[0]["payload"])
        assert rows[0]["n_records"] == 4  # warcinfo + 3 responses
        recs = parse_warc(payload)
        assert recs[0]["warc_type"] == "warcinfo"
        bodies = {r["record_id"]: r for r in recs if r["warc_type"] == "response"}
        assert len(bodies) == 3
        for i in (1, 2, 3):
            r = bodies[f"<urn:overseer:doc:{i}>"]
            assert r["http_status"] == 200
            assert "text/html" in r["content_type"]
            assert f"doc {i}" in r["body"]


def test_warc_gz_members_are_individually_decompressible(spark):
    # find a gz group: sum(name) even
    source = next(s for s in ("srcA", "srcB", "src0", "src1")
                  if sum(s.encode()) % 2 == 0)
    payload = bytes(
        build_warc(_pages(spark, [7, 8], source)).collect()[0]["payload"]
    )
    assert payload[:2] == b"\x1f\x8b"
    members = _split_members(payload)
    assert len(members) == 3  # warcinfo + 2 responses, one member each
    # the splitability property: each member parses standalone
    for m in members:
        recs = parse_warc(m)
        assert len(recs) == 1
    # and a reader seeking to the SECOND member's byte offset needs no
    # prefix decompression
    do = zlib.decompressobj(31)
    do.decompress(payload)
    second = payload[len(payload) - len(do.unused_data):]
    assert parse_warc(_split_members(second)[0])[0]["warc_type"] == "response"


def test_warc_framing_corruption_raises(spark):
    source = next(s for s in ("srcA", "srcB") if sum(s.encode()) % 2 == 1)
    payload = bytes(
        build_warc(_pages(spark, [5], source)).collect()[0]["payload"]
    )
    # shrink a Content-Length -> boundary CRLFs land in the wrong place
    bad = payload.replace(b"Content-Length: ", b"Content-Length: 1", 1)
    with pytest.raises(ValueError):
        parse_warc(bad)
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC")
    # truncated gzip member
    gz_source = next(s for s in ("srcA", "srcB") if sum(s.encode()) % 2 == 0)
    gzp = bytes(
        build_warc(_pages(spark, [5], gz_source)).collect()[0]["payload"]
    )
    with pytest.raises(ValueError):
        _split_members(gzp[: len(gzp) - 8])


def test_read_warc_records_explodes_responses_only(spark):
    warcs = build_warc(_pages(spark, [10, 11, 12]))
    recs = read_warc_records(warcs).collect()
    assert sorted(r["doc_id"] for r in recs) == [10, 11, 12]
    for r in recs:
        assert r["http_status"] == 200
        assert r["target_uri"].startswith("https://www.example")
        assert "<article>" in r["html"]


def test_warc_pipeline_entry_lossless(spark):
    from tests.conftest import SF_SMOKE

    from overseer_spark.queries.catalog import CATALOG

    rows = CATALOG["warc_extract_pipeline"].fn(spark, SF_SMOKE).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert len(rows) == len(docs) > 0
    for r in rows:
        assert r["extracted"] == docs[r["doc_id"]]
        assert r["http_status"] == 200
