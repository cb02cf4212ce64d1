"""Multimodal plumbing: Arrow-batched metadata extraction matches hashlib,
frame sampling expands 1→N with correct shapes, real codecs raise the
documented NotImplementedError at the decode seam."""

from __future__ import annotations

import hashlib

import pytest

from overseer_spark.operators import multimodal as MM
from overseer_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return MM.with_binary_payload(docs).cache()


def test_extract_metadata_matches_hashlib(spark, media):
    texts = {r["doc_id"]: r["text"] for r in media.select("doc_id", "text").limit(20).collect()}
    rows = {r["doc_id"]: r for r in MM.extract_metadata(media).collect()}
    for doc_id, text in texts.items():
        raw = text.encode("utf-8")
        assert rows[doc_id]["n_bytes"] == len(raw)
        assert rows[doc_id]["digest"] == hashlib.md5(raw).hexdigest()


def test_frame_sample_shapes(spark, media):
    out = MM.frame_sample(media, every_n=2).collect()
    assert out, "no frames produced"
    for r in out[:50]:
        assert r["frame_idx"] % 2 == 0
        assert len(r["frame"]) <= 64
    one = media.limit(1).collect()[0]
    n_frames = -(-len(one["payload"]) // 64)  # ceil
    expected = len(range(0, n_frames, 2))
    got = sum(1 for r in out if r["doc_id"] == one["doc_id"])
    assert got == expected


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(ValueError):
        MM.decode_media(b"", "tiff9000")
    assert MM.decode_media(b"abc", "raw-utf8") == b"abc"


def test_arrow_metadata_matches_pandas_seam(spark):
    """mapInArrow variant produces exactly the pandas-seam rows."""
    from overseer_spark.operators.multimodal import (
        extract_metadata,
        extract_metadata_arrow,
        with_binary_payload,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    b = with_binary_payload(docs)
    a = sorted(map(tuple, extract_metadata(b).collect()))
    c = sorted(map(tuple, extract_metadata_arrow(b).collect()))
    assert a == c and len(a) > 0
