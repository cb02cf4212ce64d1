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
    # jpeg decodes for real now; webp remains the native-library seam
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"RIFF....WEBP", "webp")
    with pytest.raises(ValueError):
        MM.decode_media(b"", "tiff9000")
    with pytest.raises(ValueError):
        MM.decode_media(b"not a jpeg", "jpeg")
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


# -- real codecs (functions/media_codecs.py) --------------------------------

def _synth_expected(i: int):
    """Independent numpy recomputation of synthesize_media's payload for
    one id — the oracle for the decode/feature path."""
    import numpy as np

    if i % 3 == 0:
        sr, freq = 8000, 200.0 + (i % 40) * 20.0
        t = np.arange(400, dtype=np.float64) / sr
        wave = (12000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        rms = float(np.sqrt(np.mean((wave.astype(np.float64) / 32768.0) ** 2)))
        return ("wav", "audio", None, None, 8000, 400, rms, None)
    if i % 3 == 1:
        r, c = np.mgrid[0:8, 0:8]
        px = np.stack(
            [
                (i * 7 + r * 16 + c) % 256,
                (i * 13 + r + c * 16) % 256,
                (i * 29 + r * 8 + c * 8) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        luma = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).mean()
        return ("bmp", "image", 8, 8, None, None, None, float(luma))
    r, c = np.mgrid[0:6, 0:10]
    px = np.stack(
        [(i + r * 25) % 256, (i * 3 + c * 25) % 256, np.full((6, 10), (i * 5) % 256)],
        axis=-1,
    ).astype(np.uint8)
    luma = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).mean()
    return ("ppm", "image", 10, 6, None, None, None, float(luma))


def test_wav_round_trip_and_decode_media():
    import numpy as np

    from overseer_spark.functions import media_codecs as MC

    wave = (9000 * np.sin(2 * np.pi * 330 * np.arange(800) / 16000)).astype(np.int16)
    payload = MC.encode_wav(wave, 16000)
    meta, samples = MM.decode_media(payload, "wav")  # decodes for REAL now
    assert meta == {
        "kind": "audio", "sample_rate": 16000, "n_channels": 1, "n_samples": 800,
    }
    assert np.array_equal(samples[:, 0], wave)
    stereo = np.stack([wave, -wave], axis=1)
    meta2, s2 = MC.decode_wav(MC.encode_wav(stereo, 44100))
    assert meta2["n_channels"] == 2 and np.array_equal(s2, stereo)


def test_image_round_trips_exact():
    import numpy as np

    from overseer_spark.functions import media_codecs as MC

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)  # odd width → BMP row pad
    for enc, dec in ((MC.encode_bmp, MC.decode_bmp), (MC.encode_ppm, MC.decode_ppm)):
        meta, out = dec(enc(px))
        assert (meta["width"], meta["height"]) == (7, 13)
        assert np.array_equal(out, px)
    gray = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    _, g = MC.decode_pgm(MC.encode_pgm(gray))
    assert np.array_equal(g, gray)


def test_media_features_matches_numpy_oracle(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    feats = MM.media_features(MM.synthesize_media(docs)).collect()
    assert len(feats) == 60
    for r in feats:
        codec, kind, w, h, sr, n, rms, luma = _synth_expected(r["doc_id"])
        assert (r["codec"], r["kind"]) == (codec, kind)
        assert (r["width"], r["height"]) == (w, h)
        assert (r["sample_rate"], r["n_samples"]) == (sr, n)
        if rms is None:
            assert r["rms"] is None
            assert abs(r["mean_luma"] - luma) < 1e-9
        else:
            assert abs(r["rms"] - rms) < 1e-9
            assert r["mean_luma"] is None


def test_decode_features_catalog_entry_oracle(spark):
    """The catalog entry's per-codec aggregates match an independent numpy
    recomputation over the same ids."""
    from collections import defaultdict

    from overseer_spark.queries.catalog import CATALOG

    docs = load_table(spark, SF_SMOKE, "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    agg = defaultdict(lambda: {"n": 0, "rms": [], "luma": [], "samples": 0})
    for i in ids:
        codec, kind, w, h, sr, n, rms, luma = _synth_expected(i)
        a = agg[codec]
        a["n"] += 1
        if rms is not None:
            a["rms"].append(rms)
            a["samples"] += n
        if luma is not None:
            a["luma"].append(luma)

    rows = {r["codec"]: r for r in
            CATALOG["multimodal_decode_features"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for codec, a in agg.items():
        r = rows[codec]
        assert r["n"] == a["n"]
        if a["rms"]:
            assert abs(r["avg_rms"] - round(sum(a["rms"]) / len(a["rms"]), 6)) < 2e-6
            assert r["total_samples"] == a["samples"]
        if a["luma"]:
            assert abs(r["avg_luma"] - round(sum(a["luma"]) / len(a["luma"]), 6)) < 2e-6


def test_audio_spectral_peak_recovers_construction_frequency(spark):
    """synthesize_media writes sine WAVs at 200 + (id%40)*20 Hz — exact FFT
    bin centers at sr=8000/n=400 — so the spectral peak must match them."""
    from pyspark.sql import functions as F

    from overseer_spark.operators.multimodal import (
        audio_spectral_features,
        synthesize_media,
    )

    ids = spark.range(0, 120, 1, 4).withColumnRenamed("id", "doc_id")
    media = synthesize_media(ids)
    rows = audio_spectral_features(media).collect()
    assert len(rows) == 40  # every third id is audio
    for r in rows:
        expect = 200.0 + (r["doc_id"] % 40) * 20.0
        assert r["dominant_hz"] == expect, (r["doc_id"], r["dominant_hz"])
        assert r["sample_rate"] == 8000
        # pure tone: centroid sits near the peak, bandwidth is small
        assert abs(r["spectral_centroid_hz"] - expect) < 25.0
        assert r["bandwidth_hz"] < 120.0


# ---------------------------------------------------------------------------
# perceptual average-hash
# ---------------------------------------------------------------------------

def _ref_ahash(px):
    """Independent numpy reference for the 8x8 average hash."""
    import numpy as np

    px = px.astype(np.float64)
    gray = (
        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        if px.ndim == 3
        else px
    )
    h, w = gray.shape
    ri = (np.arange(h) * 8) // h
    ci = (np.arange(w) * 8) // w
    cells = np.zeros((8, 8))
    counts = np.zeros((8, 8))
    np.add.at(cells, (ri[:, None], ci[None, :]), gray)
    np.add.at(counts, (ri[:, None], ci[None, :]), 1.0)
    cells /= np.maximum(counts, 1.0)
    bits = (cells >= cells.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return f"{val:016x}"


def test_image_ahash_matches_reference_and_flags_duplicates(spark):
    import numpy as np

    from overseer_spark.functions import media_codecs as MC
    from overseer_spark.operators.multimodal import image_ahash

    rng = np.random.RandomState(3)
    img_a = rng.randint(0, 256, (16, 12, 3)).astype(np.uint8)
    img_b = (img_a.astype(np.int32) * 2 % 256).astype(np.uint8)  # different
    rows = [
        (1, "bmp", MC.encode_bmp(img_a)),
        (2, "bmp", MC.encode_bmp(img_a)),  # exact duplicate payload
        (3, "ppm", MC.encode_ppm(img_b)),
        (4, "wav", b"RIFF0000WAVE"),  # non-image: NULL hash
    ]
    df = spark.createDataFrame(rows, "doc_id long, codec string, payload binary")
    got = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] == _ref_ahash(img_a)
    assert got[3] == _ref_ahash(img_b)
    assert got[1] == got[2]  # duplicates collide
    assert got[1] != got[3]
    assert got[4] is None


def test_image_ahash_brightness_invariance(spark):
    """aHash thresholds against the image's own mean, so uniform
    brightness scaling must not change the fingerprint."""
    import numpy as np

    from overseer_spark.functions import media_codecs as MC
    from overseer_spark.operators.multimodal import image_ahash

    base = (np.mgrid[0:10, 0:10][0] * 20 % 200).astype(np.uint8)
    px = np.stack([base, base, base], axis=-1)
    brighter = (px.astype(np.float64) * 1.2).clip(0, 255).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, "bmp", MC.encode_bmp(px)), (2, "bmp", MC.encode_bmp(brighter))],
        "doc_id long, codec string, payload binary",
    )
    got = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert got[1] == got[2]


def test_multimodal_image_ahash_catalog_entry(spark):
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_SMOKE

    rows = CATALOG["multimodal_image_ahash"].fn(spark, SF_SMOKE).collect()
    assert rows and all(r["codec"] in ("bmp", "ppm") for r in rows)
    assert all(len(r["ahash"]) == 16 for r in rows)
    # deterministic across runs
    again = CATALOG["multimodal_image_ahash"].fn(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_audio_fingerprint_groups_match_construction(spark):
    """synthesize_media keys the sine frequency by doc_id (200 + (id%40)*20
    for id%3==0), so two audio docs collide exactly when id%120 matches."""
    from collections import Counter

    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .where("doc_id % 3 = 0")
        .select("doc_id")
        .collect()
    ]
    groups = Counter(i % 120 for i in ids)
    want = sorted(
        (min(i for i in ids if i % 120 == g), c)
        for g, c in groups.items()
        if c >= 2
    )
    got = sorted(
        (r["canonical_id"], r["n_copies"])
        for r in CATALOG["multimodal_audio_fingerprint"].fn(spark, SF_SMOKE).collect()
    )
    assert got == want and got


def test_image_resize_roundtrips_valid_bmp(spark):
    """Thumbnails decode back as 8x8 BMPs whose pixels equal the
    block-mean of the source image (numpy reference)."""
    import numpy as np

    from overseer_spark.functions import media_codecs as MC
    from overseer_spark.operators.multimodal import image_resize

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 12, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, "bmp", MC.encode_bmp(img))], "doc_id long, codec string, payload binary"
    )
    rows = image_resize(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["out_w"], r["out_h"]) == (8, 8)
    meta, px = MC.decode_bmp(bytes(r["payload"]))
    assert px.shape == (8, 8, 3)
    # numpy reference block-mean
    h, w, _ = img.shape
    ri = (np.arange(h) * 8) // h
    ci = (np.arange(w) * 8) // w
    cells = np.zeros((8, 8, 3)); counts = np.zeros((8, 8, 1))
    np.add.at(cells, (ri[:, None], ci[None, :]), img.astype(np.float64))
    np.add.at(counts, (ri[:, None], ci[None, :]), 1.0)
    want = (cells / counts).round().clip(0, 255).astype(np.uint8)
    assert np.array_equal(px, want)


def test_multimodal_resize_catalog_entry(spark):
    from overseer_spark.queries.catalog import CATALOG
    from tests.conftest import SF_SMOKE

    rows = CATALOG["multimodal_resize_thumbnails"].fn(spark, SF_SMOKE).collect()
    assert rows and all(r["out_w"] == 8 and r["out_h"] == 8 for r in rows)
    assert all(r["in_codec"] in ("bmp", "ppm") for r in rows)


def test_audio_vad_recovers_synthesized_burst_structure(spark):
    """audio_vad over speech-shaped WAVs must find EXACTLY the bursts the
    synthesizer wrote: n_segments == 1 + id % 4, voiced time == bursts ×
    500 samples @ 8 kHz (62.5 ms each) — burst/silence spans are aligned
    to the 100-sample VAD frame, so the detector has no boundary slack."""
    from overseer_spark.operators.multimodal import audio_vad, synthesize_speechlike

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in audio_vad(synthesize_speechlike(docs)).collect()
    }
    assert len(rows) == 40
    for i, r in rows.items():
        n_bursts = 1 + i % 4
        assert r["n_segments"] == n_bursts, i
        assert r["voiced_ms"] == n_bursts * 62.5, i
        total_frames = (300 + n_bursts * 800) // 100
        assert abs(r["voiced_ratio"] - n_bursts * 5 / total_frames) < 1e-9


def test_scene_cuts_match_synthesis_formula(spark):
    """scene_cuts must emit keyframes at exactly [0, 6 + id % 6,
    14 + id % 8] with per-scene luma base, base+75, base+150."""
    from overseer_spark.operators.multimodal import (
        scene_cuts,
        synthesize_video_frames,
    )

    docs = spark.range(0, 48).withColumnRenamed("id", "doc_id")
    out = scene_cuts(synthesize_video_frames(docs)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 48
    for i, rs in by_doc.items():
        rs.sort(key=lambda r: r["keyframe_idx"])
        base = i * 31 % 100
        expected = [(0, float(base)), (6 + i % 6, float(base + 75)),
                    (14 + i % 8, float(base + 150))]
        assert [(r["keyframe_idx"], r["mean_luma"]) for r in rs] == expected, i


def test_vad_and_scene_catalog_entries_run(spark):
    from overseer_spark.queries.catalog import CATALOG

    vad = CATALOG["multimodal_audio_vad"].fn(spark, SF_SMOKE).collect()
    cuts = CATALOG["multimodal_scene_cuts"].fn(spark, SF_SMOKE).collect()
    assert len(vad) > 0 and len(cuts) > 0
    assert all(r["n_segments"] == 1 + r["doc_id"] % 4 for r in vad)
    # every odd doc contributes exactly 3 keyframes
    assert len(cuts) == 3 * len({r["doc_id"] for r in cuts})


def test_image_near_dup_finds_planted_brightness_copies(spark):
    """multimodal_image_near_dup: every brightness-scaled copy (id +
    1_000_000) must pair with its source within hamming ≤ 3, and
    reported hamming must equal a numpy recomputation on the hashes."""
    from overseer_spark.queries.catalog import CATALOG
    from overseer_spark.operators.multimodal import synthesize_media
    from overseer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    image_ids = {
        r["doc_id"]
        for r in docs.where("doc_id % 3 != 0").select("doc_id").collect()
    }
    pairs = CATALOG["multimodal_image_near_dup"].fn(spark, SF_SMOKE).collect()
    found = {(r["d1"], r["d2"]): r["hamming"] for r in pairs}
    missing = [
        i for i in image_ids if (i, i + 1_000_000) not in found
    ]
    assert not missing, f"planted copies not found: {missing[:5]}"
    # planted copies are brightness-invariant up to rounding: tiny hamming
    assert all(
        found[(i, i + 1_000_000)] <= 3 for i in image_ids
    )


def test_image_dedup_count_collapses_planted_copies(spark):
    """multimodal_image_dedup_count: with every image duplicated by a
    brightness copy, survivors are at most half the corpus, counts are
    internally consistent, and planted pairs land in one component."""
    from overseer_spark.queries.catalog import CATALOG

    r = CATALOG["multimodal_image_dedup_count"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_images"] > 0 and r["n_images"] % 2 == 0
    assert r["n_survivors"] + r["n_dropped"] == r["n_images"]
    # every image has at least its brightness twin → no singleton survivors
    assert r["n_survivors"] <= r["n_images"] // 2
    assert r["n_dup_clusters"] == r["n_survivors"]


def test_png_all_filter_types_decode():
    """decode_png must invert every spec filter (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth): filter a known image per the spec by hand,
    assemble the PNG manually, decode, and compare pixels."""
    import struct
    import zlib

    import numpy as np

    from overseer_spark.functions.media_codecs import decode_png

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, _ = px.shape
    stride = w * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    flat = px.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = y % 5  # cycle through every filter type
        line = flat[y]
        raw.append(ft)
        for x in range(stride):
            a = int(line[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = line[x] - a
            elif ft == 2:
                v = line[x] - b
            elif ft == 3:
                v = line[x] - (a + b) // 2
            else:
                v = line[x] - paeth(a, b, c)
            raw.append(int(v) % 256)
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    meta, back = decode_png(png)
    assert meta == {"kind": "image", "width": w, "height": h}
    assert (back == px).all()


def test_png_decode_entry_matches_synthesis_formula(spark):
    """multimodal_png_decode: every decoded PNG must report 12×10 and a
    mean luma equal to the closed form of the synthesis gradient."""
    from overseer_spark.queries.catalog import CATALOG

    rows = CATALOG["multimodal_png_decode"].fn(spark, SF_SMOKE).collect()
    assert rows, "no PNG payloads decoded"
    for r in rows:
        i = r["doc_id"]
        assert (r["codec"], r["width"], r["height"]) == ("png", 10, 12)
        expect = (
            0.299 * (i * 11 % 200 + 5.5)
            + 0.587 * (i * 23 % 200 + 5.5)
            + 0.114 * (i * 5 % 200)
        )
        assert abs(r["mean_luma"] - round(expect, 4)) < 1e-3, (i, r)


def test_gif_lzw_roundtrip_random_and_reset_paths():
    """encode_gif/decode_gif round-trip: random frames (KwKwK + code-size
    growth), a 40k-pixel random frame (forces the 4096-entry table RESET),
    and constant frames (maximal compression)."""
    import numpy as np

    from overseer_spark.functions.media_codecs import (
        decode_gif,
        encode_gif,
        sniff_codec,
    )

    rng = np.random.default_rng(5)
    small = rng.integers(0, 256, size=(7, 11, 13), dtype=np.uint8)
    big = rng.integers(0, 256, size=(1, 200, 200), dtype=np.uint8)
    const = np.full((5, 16, 16), 129, dtype=np.uint8)
    for frames in (small, big, const):
        payload = encode_gif(frames)
        assert sniff_codec(payload) == "gif"
        meta, back = decode_gif(payload)
        assert meta["n_frames"] == frames.shape[0]
        assert (back == frames).all()


def test_gif_scene_cuts_entry_matches_synthesis(spark):
    """multimodal_gif_scene_cuts: keyframes at exactly [0, 6+id%6,
    14+id%8] with scene luma base, base+75, base+150 — through a REAL
    GIF encode/decode cycle."""
    from overseer_spark.queries.catalog import CATALOG

    out = CATALOG["multimodal_gif_scene_cuts"].fn(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for i, rs in by_doc.items():
        rs.sort(key=lambda r: r["keyframe_idx"])
        base = float(i * 31 % 100)
        expected = [(0, base), (6 + i % 6, base + 75.0), (14 + i % 8, base + 150.0)]
        assert [(r["keyframe_idx"], r["mean_luma"]) for r in rs] == expected, i


# -- JPEG (baseline T.81) ---------------------------------------------------

def test_jpeg_gray_roundtrip_tolerance():
    """Lossy round trip: a DCT-smooth grayscale image must survive
    encode→decode within tight pixel tolerance at high quality."""
    import numpy as np

    from overseer_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:40, 0:56]
    img = ((np.sin(yy / 7.0) + np.cos(xx / 9.0)) * 60 + 128).clip(0, 255)
    img = img.astype(np.uint8)
    meta, out = decode_jpeg(encode_jpeg(img, quality=90))
    assert meta == {"kind": "image", "width": 56, "height": 40}
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 4 and np.sqrt((err.astype(float) ** 2).mean()) < 1.5


def test_jpeg_rgb_all_subsamplings_and_restart_markers():
    """4:4:4 / 4:2:2 / 4:2:0 each round-trip within tolerance; adding a
    restart interval must decode bit-identically to the same image
    without restarts (RSTn is pure resync, not a coding change)."""
    import numpy as np

    from overseer_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:48, 0:64]
    base = ((np.sin(yy / 5.0) * np.cos(xx / 6.0)) * 70 + 128).clip(0, 255)
    base = base.astype(np.uint8)
    rgb = np.stack([base, np.roll(base, 3, 1), 255 - base], -1)
    for sub, rmse_cap in (("444", 3.0), ("422", 5.5), ("420", 6.5)):
        payload = encode_jpeg(rgb, quality=90, subsample=sub)
        meta, out = decode_jpeg(payload)
        assert (meta["width"], meta["height"]) == (64, 48)
        rmse = float(np.sqrt(((out.astype(float) - rgb) ** 2).mean()))
        assert rmse < rmse_cap, (sub, rmse)
        for ri in (1, 3):
            _, o2 = decode_jpeg(
                encode_jpeg(rgb, quality=90, subsample=sub, restart_interval=ri)
            )
            assert np.array_equal(o2, out), (sub, ri)


def test_jpeg_quality_controls_size_and_error():
    """IJG quality scaling: higher quality → more bytes and lower error
    (monotone on a smooth fixture)."""
    import numpy as np

    from overseer_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:32, 0:32]
    img = ((yy * 3 + xx * 2) % 200 + 20).astype(np.uint8)
    sizes, errs = [], []
    for q in (20, 60, 95):
        p = encode_jpeg(img, quality=q)
        _, o = decode_jpeg(p)
        sizes.append(len(p))
        errs.append(float(np.sqrt(((o.astype(float) - img) ** 2).mean())))
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def test_jpeg_rejects_arithmetic_and_truncation():
    import numpy as np
    import pytest

    from overseer_spark.functions.media_codecs import (
        decode_jpeg,
        encode_jpeg,
        sniff_codec,
    )

    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    assert sniff_codec(bytes(payload)) == "jpeg"
    # flip SOF0 (FFC0) to SOF9 (arithmetic) → explicit NotImplementedError
    i = bytes(payload).find(b"\xff\xc0")
    payload[i + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # a baseline stream mislabeled SOF2: the sequential SOS header
    # (Ss=0, Se=63) is an invalid progressive band → rejected, not
    # misdecoded
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x11not a jpeg")


def test_jpeg_decode_entry_matches_synthesis_formula(spark):
    """multimodal_jpeg_decode: every decoded JPEG must report 16×16 and
    a mean luma within DCT-quantization tolerance of the synthesis
    closed form — the pixel-tolerance oracle a lossy codec owes."""
    from overseer_spark.queries.catalog import CATALOG

    rows = CATALOG["multimodal_jpeg_decode"].fn(spark, SF_SMOKE).collect()
    assert rows, "no JPEG payloads decoded"
    for r in rows:
        i = r["doc_id"]
        assert (r["codec"], r["width"], r["height"]) == ("jpeg", 16, 16)
        expect = (
            0.299 * (i * 11 % 200 + 7.5)
            + 0.587 * (i * 23 % 200)
            + 0.114 * (i * 5 % 200)
        )
        assert abs(r["mean_luma"] - expect) < 2.5, (i, r["mean_luma"], expect)


def test_jpeg_property_roundtrip_random_sizes():
    """Property sweep: random (non-multiple-of-MCU) sizes × subsamplings
    × restart intervals round-trip a smooth gradient within tolerance,
    and the decoder never returns a wrong shape."""
    import numpy as np

    from overseer_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    for _ in range(12):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((yy * 2 + xx * 3) % 180 + 30).astype(np.uint8)
        sub = ["444", "422", "420"][int(rng.integers(0, 3))]
        ri = int(rng.integers(0, 3))
        gray = bool(rng.integers(0, 2))
        img = base if gray else np.stack([base, 255 - base, base // 2], -1)
        meta, out = decode_jpeg(
            encode_jpeg(img, quality=92, subsample=sub, restart_interval=ri)
        )
        assert out.shape == img.shape, (h, w, sub, gray)
        assert (meta["width"], meta["height"]) == (w, h)
        rmse = float(np.sqrt(((out.astype(float) - img) ** 2).mean()))
        assert rmse < 14.0, (h, w, sub, ri, gray, rmse)


def test_jpeg_truncation_fuzz_raises_cleanly():
    """Truncating a valid payload at any marker-ish prefix must raise
    ValueError/NotImplementedError — never IndexError or a garbage
    array (the contract all codecs in media_codecs follow)."""
    import numpy as np
    import pytest

    from overseer_spark.functions.media_codecs import decode_jpeg, encode_jpeg

    img = (np.arange(256, dtype=np.uint8).reshape(16, 16))
    payload = encode_jpeg(img, quality=80)
    rng = np.random.default_rng(5)
    cuts = sorted(set(int(rng.integers(2, len(payload) - 1)) for _ in range(25)))
    for cut in cuts:
        trunc = payload[:cut]
        try:
            meta, out = decode_jpeg(trunc)
            # a cut inside the entropy segment can still decode (zero
            # padding past the end) — shape must then still be correct
            assert out.shape == img.shape
        except (ValueError, NotImplementedError):
            pass


def test_spread_by_payload_bytes_balances_partitions(spark):
    """Byte-aware repartition: partition count derives from total payload
    bytes / target, and the spread leaves every partition within a small
    factor of the mean bytes — row counts alone would NOT balance this
    fixture (one id-range carries 100x larger blobs)."""
    from pyspark.sql import functions as F

    from overseer_spark.operators.multimodal import spread_by_payload_bytes

    # 200 rows: ids < 20 carry 100 KB blobs, the rest 1 KB — heavy tail
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "CAST(repeat('x', CASE WHEN id < 20 THEN 102400 ELSE 1024 END)"
            " AS BINARY)"
        ).alias("payload"),
    )
    total = df.agg(F.sum(F.length("payload"))).collect()[0][0]
    target = 256 * 1024
    out = spread_by_payload_bytes(
        df, target_partition_bytes=target, min_partitions=4
    )
    n_parts = out.rdd.getNumPartitions()
    assert n_parts == max(4, -(-total // target))
    per_part = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum(F.length("payload")).alias("b"))
        .collect()
    )
    sizes = sorted(r["b"] for r in per_part)
    mean = total / n_parts
    # round-robin: no partition above ~3x the mean even with the heavy tail
    assert sizes[-1] <= 3 * mean, (sizes, mean)
