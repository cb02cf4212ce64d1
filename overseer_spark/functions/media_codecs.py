"""Real media codecs in pure Python/numpy: WAV (RIFF PCM), BMP, PPM/PGM.

These are complete, spec-faithful implementations of three genuinely
parseable formats — header + samples, no native libraries — so the
multimodal pipeline (operators/multimodal.py) decodes *real* payload
bytes, not a stand-in. Compressed codecs (jpeg/mp3/h264...) remain the
documented seam: they need native libs this environment does not ship.

Each decoder returns (metadata dict, numpy array):
- WAV  -> {kind: audio, sample_rate, n_channels, n_samples}, int16 [n, ch]
- BMP  -> {kind: image, width, height}, uint8 [h, w, 3] (RGB, top-down)
- PPM  -> {kind: image, width, height}, uint8 [h, w, 3]
- PGM  -> {kind: image, width, height}, uint8 [h, w]

Encoders are exact inverses, used to synthesize real payloads from the
test tables and by the round-trip property tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV — RIFF container, PCM16 (the canonical uncompressed audio format)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 WAV. ``samples``: int16 array, shape [n] or [n, channels]."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_channels = s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff_size = 4 + len(fmt) + len(data_hdr) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_hdr + data


def decode_wav(payload: bytes) -> tuple[dict, np.ndarray]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_info, data = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_format != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV is supported")
            fmt_info = (n_channels, sample_rate)
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    n_channels, sample_rate = fmt_info
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, n_channels)
    meta = {
        "kind": "audio",
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": samples.shape[0],
    }
    return meta, samples


# ---------------------------------------------------------------------------
# BMP — BITMAPINFOHEADER, uncompressed 24-bit BGR, bottom-up rows padded to 4
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an RGB uint8 array [h, w, 3]."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    offset = 14 + len(dib)
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    return header + dib + data


def decode_bmp(payload: bytes) -> tuple[dict, np.ndarray]:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if dib_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BITMAPINFOHEADER BMP")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_size, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1] if top_down else rows[::-1, :, ::-1]
    return {"kind": "image", "width": w, "height": h}, np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# PPM (P6) / PGM (P5) — netpbm binary formats
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse magic + dimensions + maxval, skipping '#' comments; returns
    (magic, width, height, maxval, data_offset)."""
    tokens, pos = [], 2
    magic = payload[:2]
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    return magic, tokens[0], tokens[1], tokens[2], pos + 1  # single ws after maxval


def decode_ppm(payload: bytes) -> tuple[dict, np.ndarray]:
    magic, w, h, maxval, off = _pnm_header(payload)
    if magic != b"P6" or maxval != 255:
        raise ValueError("not an 8-bit P6 PPM payload")
    px = np.frombuffer(payload, np.uint8, count=h * w * 3, offset=off).reshape(h, w, 3)
    return {"kind": "image", "width": w, "height": h}, px


def decode_pgm(payload: bytes) -> tuple[dict, np.ndarray]:
    magic, w, h, maxval, off = _pnm_header(payload)
    if magic != b"P5" or maxval != 255:
        raise ValueError("not an 8-bit P5 PGM payload")
    px = np.frombuffer(payload, np.uint8, count=h * w, offset=off).reshape(h, w)
    return {"kind": "image", "width": w, "height": h}, px


DECODERS = {"wav": decode_wav, "bmp": decode_bmp, "ppm": decode_ppm, "pgm": decode_pgm}


def sniff_codec(payload: bytes) -> str | None:
    """Identify a payload by magic bytes (None when unrecognized)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    return None
