"""MP4 (ISO BMFF) container tests: writer↔demuxer round trip, the
stsc/stsz/stco chunk walk on non-trivial layouts, co64 and uniform-size
variants the writer itself never emits (hand-built from the box
helpers), codec seams, and the Spark scene-cut pipeline's closed form.

MJPEG samples decode end-to-end through our own JPEG codec; flat frames
at quality 90 survive the lossy round trip exactly (DC-only blocks), so
equality assertions here are bit-exact, not tolerance-based.
"""

import struct

import numpy as np
import pytest

from overseer_spark.functions import media_codecs as MC


def _scene_frames(i: int, n: int = 24) -> np.ndarray:
    c1, c2 = 6 + i % 6, 14 + i % 8
    base = i * 31 % 100
    frames = np.empty((n, 16, 16), dtype=np.uint8)
    for f in range(n):
        scene = 0 if f < c1 else (1 if f < c2 else 2)
        frames[f, :, :] = base + 75 * scene
    return frames


def test_mp4_roundtrip_gray_exact():
    for n, cs in [(24, 5), (7, 5), (5, 5), (1, 5), (24, 4), (13, 1)]:
        frames = _scene_frames(3, n)
        p = MC.encode_mp4_mjpeg(frames, fps=12, chunk_size=cs)
        assert MC.sniff_codec(p) == "mp4"
        meta, out = MC.decode_mp4(p)
        assert (out == frames).all(), (n, cs)
        assert meta["codec"] == "jpeg"
        assert meta["n_frames"] == n
        assert (meta["width"], meta["height"]) == (16, 16)


def test_mp4_rgb_and_progressive_samples():
    rng = np.random.default_rng(3)
    fr = rng.integers(0, 200, (6, 24, 16, 3)).astype(np.uint8)
    prog = MC.encode_mp4_mjpeg(fr, progressive=True)
    base = MC.encode_mp4_mjpeg(fr, progressive=False)
    mp, op = MC.decode_mp4(prog)
    mb, ob = MC.decode_mp4(base)
    assert op.shape == (6, 24, 16, 3)
    assert (op == ob).all()
    assert mp["n_frames"] == mb["n_frames"] == 6
    # progressive samples really are SOF2 streams
    _, samples = MC.demux_mp4(prog)
    assert all(b"\xff\xc2" in s for s in samples)
    _, bsamples = MC.demux_mp4(base)
    assert all(b"\xff\xc0" in s for s in bsamples)


def test_mp4_demux_metadata_and_sample_boundaries():
    frames = _scene_frames(7, 13)
    p = MC.encode_mp4_mjpeg(frames, fps=10, chunk_size=5)
    meta, samples = MC.demux_mp4(p)
    assert meta["n_samples"] == 13
    assert meta["timescale"] == 1000
    assert meta["duration_s"] == pytest.approx(1.3)
    # every sample is a standalone JPEG, decodable on its own
    for f, s in zip(frames, samples):
        assert MC.sniff_codec(s) == "jpeg"
        _, px = MC.decode_jpeg(s)
        assert (px == f).all()


def _manual_mp4(samples, *, co64=False, uniform=False, width=16, height=16):
    """Single-chunk MJPEG container built from the box helpers — used to
    cover co64 and uniform-stsz read paths the writer never emits."""
    n = len(samples)
    ftyp = MC._mp4_box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41"
    )
    mdat = MC._mp4_box(b"mdat", b"".join(samples))
    off = len(ftyp) + 8
    vse = struct.pack(">6xH", 1) + struct.pack(">HH3I", 0, 0, 0, 0, 0)
    vse += struct.pack(">HH", width, height)
    vse += struct.pack(">IIIH", 0x480000, 0x480000, 0, 1) + bytes(32)
    vse += struct.pack(">Hh", 24, -1)
    stsd = MC._mp4_full(
        b"stsd", 0, 0, struct.pack(">I", 1) + MC._mp4_box(b"jpeg", vse)
    )
    stts = MC._mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, 100))
    stsc = MC._mp4_full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    if uniform:
        stsz = MC._mp4_full(b"stsz", 0, 0,
                            struct.pack(">II", len(samples[0]), n))
    else:
        stsz = MC._mp4_full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
    if co64:
        stco = MC._mp4_full(b"co64", 0, 0, struct.pack(">IQ", 1, off))
    else:
        stco = MC._mp4_full(b"stco", 0, 0, struct.pack(">II", 1, off))
    stbl = MC._mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = MC._mp4_full(b"vmhd", 0, 1, bytes(8))
    dref = MC._mp4_full(
        b"dref", 0, 0, struct.pack(">I", 1) + MC._mp4_full(b"url ", 0, 1, b"")
    )
    minf = MC._mp4_box(b"minf", vmhd + MC._mp4_box(b"dinf", dref) + stbl)
    mdhd = MC._mp4_full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, n * 100, 0x55C4, 0)
    )
    hdlr = MC._mp4_full(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + bytes(12) + b"V\x00"
    )
    mdia = MC._mp4_box(b"mdia", mdhd + hdlr + minf)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    tkhd = MC._mp4_full(
        b"tkhd", 0, 3,
        struct.pack(">IIIII", 0, 0, 1, 0, n * 100) + bytes(8)
        + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = MC._mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, n * 100)
        + struct.pack(">IH", 0x10000, 0x100) + bytes(10) + matrix
        + bytes(24) + struct.pack(">I", 2),
    )
    moov = MC._mp4_box(b"moov", mvhd + MC._mp4_box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def test_mp4_co64_and_uniform_stsz_read_paths():
    frames = _scene_frames(1, 4)
    samples = [MC.encode_jpeg(f, quality=90) for f in frames]
    p64 = _manual_mp4(samples, co64=True)
    meta, out = MC.decode_mp4(p64)
    assert (out == frames).all()
    # uniform sample_size: pad samples to equal length is NOT valid JPEG
    # concatenation-wise unless sizes already agree — flat frames of the
    # same value differ only in DC, so force equality via identical frames
    same = [samples[0]] * 4
    puni = _manual_mp4(same, uniform=True)
    meta, out = MC.decode_mp4(puni)
    assert meta["n_frames"] == 4
    assert (out == np.stack([frames[0]] * 4)).all()


def test_mp4_multirun_stsc_walk():
    # 13 samples, chunk_size 5 -> chunks of 5,5,3: stsc carries two runs
    frames = _scene_frames(9, 13)
    p = MC.encode_mp4_mjpeg(frames, chunk_size=5)
    _, samples = MC.demux_mp4(p)
    assert len(samples) == 13
    for f, s in zip(frames, samples):
        assert (MC.decode_jpeg(s)[1] == f).all()


def test_mp4_foreign_codec_seam_and_errors():
    frames = _scene_frames(2, 3)
    samples = [MC.encode_jpeg(f) for f in frames]
    p = _manual_mp4(samples)
    avc = bytearray(p)
    i = p.find(b"stsd")
    j = p.find(b"jpeg", i)
    avc[j : j + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        MC.decode_mp4(bytes(avc))
    with pytest.raises(ValueError):
        MC.demux_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError):
        MC.demux_mp4(p[: p.find(b"moov") - 4])  # moov gone
    # chunk offset pointing past EOF -> sample walk must fail loudly
    broken = bytearray(p)
    k = p.find(b"stco")
    struct.pack_into(">I", broken, k + 12, len(p) + 1000)
    with pytest.raises(ValueError, match="past end"):
        MC.demux_mp4(bytes(broken))


def test_mp4_through_media_features(spark):
    import pandas as pd

    from overseer_spark.operators.multimodal import media_features

    rows = [(i, MC.encode_mp4_mjpeg(_scene_frames(i))) for i in range(4)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "payload": [r[1] for r in rows]})
    )
    out = {r["doc_id"]: r for r in media_features(df).collect()}
    assert len(out) == 4
    for i in range(4):
        r = out[i]
        assert r["codec"] == "mp4" and r["kind"] == "video"
        assert r["n_samples"] == 24
        frames = _scene_frames(i)
        assert r["mean_luma"] == pytest.approx(frames.astype(float).mean())


def test_mp4_scene_cuts_closed_form(spark):
    # run the operator directly on a small id set (catalog parity is
    # covered by test_oracle_parity): cuts at 6+i%6 / 14+i%8, luma exact
    import pandas as pd

    from overseer_spark.operators.multimodal import (
        mp4_scene_cuts,
        synthesize_mp4_media,
    )

    ids = [1, 5, 9, 13]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    got = {}
    for r in mp4_scene_cuts(synthesize_mp4_media(df)).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["keyframe_idx"], r["mean_luma"])
        )
    for i in ids:
        base = i * 31 % 100
        want = [(0, float(base)), (6 + i % 6, float(base + 75)),
                (14 + i % 8, float(base + 150))]
        assert sorted(got[i]) == want, i
