"""Progressive JPEG (SOF2) codec tests.

The load-bearing invariant: our progressive scan script transmits the
SAME quantized coefficients as the baseline scan (spectral selection +
successive approximation is a lossless reordering of the bit-planes), so
``decode(encode(progressive=True))`` must equal
``decode(encode(progressive=False))`` bit-for-bit — a far stricter oracle
than any pixel tolerance.  Closes the progressive leg of the compressed-
codec seam (reference delegates media handling to user functions; see
/root/reference/doc/guide/BasicGraphsHandlers.md — handlers are arbitrary
fns, so codec capability is part of the pipeline surface).
"""

import numpy as np
import pytest

from overseer_spark.functions.media_codecs import (
    decode_jpeg,
    encode_jpeg,
    sniff_codec,
)


def _images(seed: int = 0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:48, 0:48]
    return {
        "noise_rgb": rng.integers(0, 256, (24, 40, 3)).astype(np.uint8),
        "flat_rgb": np.full((16, 16, 3), 77, np.uint8),
        "gradient_rgb": ((yy[:32, :32] * 3 + xx[:32, :32] * 5) % 256)
        .astype(np.uint8)[..., None]
        .repeat(3, -1),
        "checker_gray": (((yy + xx)[:19, :31] % 2) * 255).astype(np.uint8),
        "noise_gray": rng.integers(0, 256, (17, 23)).astype(np.uint8),
        "smooth_rgb": np.stack(
            [
                (128 + 80 * np.sin(yy[:40, :24] / 5)).astype(np.uint8),
                (128 + 80 * np.cos(xx[:40, :24] / 7)).astype(np.uint8),
                np.full((40, 24), 50, np.uint8),
            ],
            axis=-1,
        ),
    }


@pytest.mark.parametrize("name", sorted(_images()))
def test_progressive_decode_bitexact_vs_baseline(name):
    img = _images()[name]
    subs = ["444"] if img.ndim == 2 else ["444", "422", "420"]
    for sub in subs:
        for quality in (5, 50, 95, 100):
            base = encode_jpeg(img, quality=quality, subsample=sub)
            prog = encode_jpeg(img, quality=quality, subsample=sub,
                               progressive=True)
            mb, ab = decode_jpeg(base)
            mp, ap = decode_jpeg(prog)
            assert mb == mp
            assert (ab == ap).all(), (name, sub, quality)


def test_progressive_restart_intervals_bitexact():
    img = _images()["gradient_rgb"]
    for ri in (1, 2, 3, 7):
        base = encode_jpeg(img, quality=85, subsample="420",
                           restart_interval=ri)
        prog = encode_jpeg(img, quality=85, subsample="420",
                           restart_interval=ri, progressive=True)
        assert b"\xff\xdd" in prog  # DRI present
        assert (decode_jpeg(base)[1] == decode_jpeg(prog)[1]).all(), ri


def test_progressive_marker_structure():
    img = _images()["smooth_rgb"]
    prog = encode_jpeg(img, progressive=True)
    base = encode_jpeg(img)
    assert sniff_codec(prog) == "jpeg"
    assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
    assert b"\xff\xc0" in base and b"\xff\xc2" not in base
    # the conventional color script: 10 scans; grayscale: 6
    assert prog.count(b"\xff\xda") == 10
    gray = encode_jpeg(_images()["noise_gray"], progressive=True)
    assert gray.count(b"\xff\xda") == 6
    meta, arr = decode_jpeg(prog)
    assert (meta["width"], meta["height"]) == (24, 40)
    assert arr.shape == (40, 24, 3)


def test_progressive_odd_sizes_and_subsampling_crop():
    """Non-MCU-multiple sizes: non-interleaved AC scans cover the
    component's own sample grid (T.81 A.2.2), not the MCU-padded one —
    the asymmetry the dims bookkeeping exists for."""
    rng = np.random.default_rng(11)
    for h, w in [(20, 20), (9, 33), (8, 8), (50, 18), (15, 16)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in ("444", "422", "420"):
            base = encode_jpeg(img, quality=80, subsample=sub)
            prog = encode_jpeg(img, quality=80, subsample=sub,
                               progressive=True)
            ab, ap = decode_jpeg(base)[1], decode_jpeg(prog)[1]
            assert ab.shape == (h, w, 3)
            assert (ab == ap).all(), (h, w, sub)


def test_progressive_random_property_sweep():
    """Seeded property sweep over random images, sizes, qualities,
    subsampling, and restart intervals — the EOB-run / ZRL / correction-
    bit paths all see traffic from pure noise at high quality."""
    rng = np.random.default_rng(42)
    for trial in range(25):
        h = int(rng.integers(8, 49))
        w = int(rng.integers(8, 49))
        gray = bool(rng.integers(0, 2))
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        sub = "444" if gray else ["444", "422", "420"][trial % 3]
        q = int(rng.integers(3, 101))
        ri = int(rng.integers(0, 4))
        base = encode_jpeg(img, quality=q, subsample=sub,
                           restart_interval=ri)
        prog = encode_jpeg(img, quality=q, subsample=sub,
                           restart_interval=ri, progressive=True)
        assert (decode_jpeg(base)[1] == decode_jpeg(prog)[1]).all(), (
            trial, h, w, gray, sub, q, ri,
        )


def test_progressive_partial_stream_rejected_cleanly():
    """Truncating mid-scan must fail loudly (missing EOI/SOF), never
    return garbage silently."""
    img = _images()["gradient_rgb"]
    prog = encode_jpeg(img, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(prog[:2])  # SOI only
    # headers but zero scans
    first_sos = prog.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(prog[:first_sos] + b"\xff\xd9")


def test_progressive_through_media_features(spark):
    """The Spark decode stage (mapInPandas sniff→decode→features) yields
    identical features for progressive and baseline payloads of the same
    image — codec mode is invisible downstream."""
    import pandas as pd

    from overseer_spark.operators.multimodal import media_features

    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        img = rng.integers(0, 220, (16, 16, 3)).astype(np.uint8)
        rows.append((2 * i, encode_jpeg(img, quality=90)))
        rows.append((2 * i + 1, encode_jpeg(img, quality=90,
                                            progressive=True)))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "payload": [r[1] for r in rows]})
    )
    out = {r["doc_id"]: r for r in media_features(df).collect()}
    assert len(out) == 12
    for i in range(6):
        b, p = out[2 * i], out[2 * i + 1]
        assert b["codec"] == p["codec"] == "jpeg"
        assert b["mean_luma"] == p["mean_luma"]
        assert (b["width"], b["height"]) == (p["width"], p["height"])
