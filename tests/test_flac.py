"""FLAC codec tests: lossless round trips (bit-exact assertions, never
tolerances), integrity enforcement (CRC-8/CRC-16/MD5), and hand-crafted
streams for the decoder-only paths the encoder never emits — LPC
subframes, multi-partition and escaped Rice residuals, wasted bits —
so "the decoder supports X" is backed by a stream that actually
contains X.
"""

import struct

import numpy as np
import pytest

from overseer_spark.functions import media_codecs as MC


def _sine(n=400, freq=440.0, sr=8000, amp=12000):
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def test_flac_mono_roundtrip_bitexact():
    rng = np.random.default_rng(1)
    cases = {
        "sine": _sine(),
        "const": np.full(1000, -123, np.int16),
        "noise": rng.integers(-32768, 32768, 5000).astype(np.int16),
        "ramp": (np.arange(-2048, 2048) * 15).astype(np.int16),
        "one_sample": np.array([7], np.int16),
        "fullscale": np.array([32767, -32768] * 600, np.int16),
    }
    for name, x in cases.items():
        for bsz in (4096, 256, 192):
            p = MC.encode_flac(x, 8000, block_size=bsz)
            assert MC.sniff_codec(p) == "flac"
            meta, out = MC.decode_flac(p)
            assert out.dtype == np.int16
            assert (out[:, 0] == x).all(), (name, bsz)
            assert meta["n_samples"] == len(x)
            assert meta["sample_rate"] == 8000


def test_flac_stereo_all_decorrelation_modes():
    rng = np.random.default_rng(2)
    st = np.stack(
        [_sine(3000, 300), rng.integers(-5000, 5000, 3000).astype(np.int16)],
        axis=1,
    )
    sizes = {}
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        p = MC.encode_flac(st, 8000, stereo_mode=mode)
        meta, out = MC.decode_flac(p)
        assert (out == st).all(), mode
        assert meta["n_channels"] == 2
        sizes[mode] = len(p)
    # correlated channels: decorrelated modes must not explode the size
    assert max(sizes.values()) < st.nbytes * 1.2


def test_flac_compresses_predictable_audio():
    x = _sine(8000, 220)
    p = MC.encode_flac(x, 8000)
    assert len(p) < x.nbytes * 0.75  # fixed-order prediction earns its keep


def test_flac_integrity_catches_corruption():
    x = np.random.default_rng(3).integers(-2000, 2000, 2000).astype(np.int16)
    p = MC.encode_flac(x, 8000)
    # flip one payload byte anywhere after the metadata: CRC must catch
    bad = bytearray(p)
    bad[len(p) // 2] ^= 0x40
    with pytest.raises(ValueError):
        MC.decode_flac(bytes(bad))
    # header byte: CRC-8 catches before the frame is even parsed
    sync = p.find(b"\xff\xf8", 4)
    bad2 = bytearray(p)
    bad2[sync + 2] ^= 0x01
    with pytest.raises(ValueError):
        MC.decode_flac(bytes(bad2))
    with pytest.raises(ValueError):
        MC.decode_flac(b"not flac at all")


def _hand_frame(subframe_bits, bs, nch=1, sr=8000, total=None, bps=16):
    """Assemble a syntactically complete one-frame FLAC stream whose
    subframe section is the given pre-encoded bit payload."""
    total = bs if total is None else total
    si = MC._MSBWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.align() + bytes(16)  # zero MD5 = "not recorded", skip check
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    hdr = MC._MSBWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)  # 16-bit blocksize at end
    hdr.write(0, 4)  # rate from streaminfo
    hdr.write(nch - 1, 4)
    hdr.write(0b100, 3)  # 16 bps
    hdr.write(0, 1)
    hdr_bytes = hdr.align() + MC._flac_utf8(0) + struct.pack(">H", bs - 1)
    hdr_bytes += bytes([MC._crc8(hdr_bytes)])
    frame = hdr_bytes + subframe_bits
    frame += struct.pack(">H", MC._crc16(frame))
    return bytes(out + frame)


def test_flac_decodes_lpc_subframe():
    """LPC with order 2, coefficients [2, -1] at shift 0 — equivalent to
    FIXED order 2, so the expected reconstruction has a closed form."""
    x = (np.arange(64) * 31 % 997 - 498).astype(np.int64)
    res = np.diff(np.diff(x))
    bw = MC._MSBWriter()
    bw.write(0, 1)
    bw.write(0b100000 | (2 - 1), 6)  # LPC, order 2
    bw.write(0, 1)  # no wasted bits
    for v in x[:2]:
        bw.write(int(v) & 0xFFFF, 16)
    bw.write(5 - 1, 4)  # precision 5
    bw.write(0, 5)  # shift 0
    bw.write(2 & 0x1F, 5)  # coef a1 = 2
    bw.write(-1 & 0x1F, 5)  # coef a2 = -1
    bw.write(0b00, 2)
    bw.write(0, 4)  # one partition
    param = MC._rice_param(res)
    bw.write(param, 4)
    MC._rice_encode(bw, res, param)
    p = _hand_frame(bw.align(), 64)
    _, out = MC.decode_flac(p)
    assert (out[:, 0] == x.astype(np.int16)).all()


def test_flac_decodes_multipartition_and_escaped_residuals():
    x = np.r_[np.zeros(48, np.int64), np.array([900, -900] * 8, np.int64)]
    res = np.diff(x)  # order-1 fixed; 63 residuals, partition order irrelevant
    bs = 64
    bw = MC._MSBWriter()
    bw.write(0, 1)
    bw.write(0b001000 | 1, 6)  # FIXED order 1
    bw.write(0, 1)
    bw.write(int(x[0]) & 0xFFFF, 16)
    bw.write(0b00, 2)
    bw.write(2, 4)  # partition order 2 -> 4 partitions of 16 (first 15)
    chunks = [res[:15], res[15:31], res[31:47], res[47:]]
    for ci, chunk in enumerate(chunks):
        if ci == 3:
            bw.write(0b1111, 4)  # escape: raw 13-bit residuals
            bw.write(13, 5)
            for v in chunk:
                bw.write(int(v) & 0x1FFF, 13)
        else:
            k = MC._rice_param(chunk)
            bw.write(k, 4)
            MC._rice_encode(bw, chunk, k)
    p = _hand_frame(bw.align(), bs)
    _, out = MC.decode_flac(p)
    assert (out[:, 0] == x.astype(np.int16)).all()


def test_flac_decodes_wasted_bits():
    """Samples share 3 trailing zero bits: subframe stores them shifted
    down with a wasted-bits marker; decoder must shift back up."""
    x = (np.arange(32, dtype=np.int64) * 8) - 128  # all multiples of 8
    shifted = x >> 3
    bw = MC._MSBWriter()
    bw.write(0, 1)
    bw.write(0b000001, 6)  # VERBATIM
    bw.write(1, 1)  # wasted-bits flag
    bw.write_unary(3 - 1)  # wasted = 3
    for v in shifted:
        bw.write(int(v) & 0x1FFF, 13)  # bps 16 - 3 wasted
    p = _hand_frame(bw.align(), 32)
    _, out = MC.decode_flac(p)
    assert (out[:, 0] == x.astype(np.int16)).all()


def test_flac_md5_verified_when_present():
    x = _sine(1000)
    p = MC.encode_flac(x, 8000)
    # find the MD5 inside STREAMINFO (bytes 8+4+18 .. +34) and corrupt it
    bad = bytearray(p)
    bad[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        MC.decode_flac(bytes(bad))


def test_flac_through_media_features(spark):
    import pandas as pd

    from overseer_spark.operators.multimodal import media_features

    rows = [(i, MC.encode_flac(_sine(freq=200.0 + (i % 40) * 20.0), 8000))
            for i in range(6)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "payload": [r[1] for r in rows]})
    )
    out = {r["doc_id"]: r for r in media_features(df).collect()}
    assert len(out) == 6
    for i in range(6):
        r = out[i]
        assert r["codec"] == "flac" and r["kind"] == "audio"
        assert r["sample_rate"] == 8000 and r["n_samples"] == 400
        wave = _sine(freq=200.0 + (i % 40) * 20.0).astype(np.float64) / 32768.0
        assert r["rms"] == pytest.approx(float(np.sqrt((wave**2).mean())))
