"""Real media codecs in pure Python/numpy: WAV (RIFF PCM), BMP, PPM/PGM,
PNG (zlib inflate + all five spec filters), GIF (LZW, animation frames),
JPEG — baseline sequential (SOF0) and progressive (SOF2, spectral
selection + successive approximation), T.81 huffman + dequant + IDCT —
``decode_jpeg`` / ``encode_jpeg`` below — MP4 (ISO BMFF container
demux with the full stsc/stsz/stco sample walk; MJPEG tracks decode
end-to-end through the JPEG codec), and FLAC (lossless audio:
fixed/LPC prediction + Rice residuals, CRC-8/16 + MD5 verified).

These are complete, spec-faithful implementations — header + samples,
no native libraries — so the multimodal pipeline
(operators/multimodal.py) decodes *real* payload bytes, not a stand-in.
The remaining documented seam is narrower still: compressed sample
CODECS that need native libs this environment does not ship (H.264/AAC
inside MP4, MP3), plus JPEG's rare variants (arithmetic coding,
hierarchical, 12-bit) — each behind explicit NotImplementedError scope
guards naming the boundary.

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
# decode_png is appended below and registers itself (zlib is stdlib)


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
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] == b"fLaC":
        return "flac"
    return None


# ---------------------------------------------------------------------------
# PNG — the first COMPRESSED codec: zlib (stdlib) deflate/inflate + the
# spec's per-scanline filters. 8-bit RGB (color type 2), non-interlaced.
# This removes "compressed formats" from the documented seam for the one
# format whose compression layer ships with Python itself.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit RGB PNG. ``filter_type`` 0 (None) or 2 (Up) — both emitted
    spec-correctly so the decoder's unfiltering paths are exercised by
    round-trip tests, not just the trivial filter."""
    import zlib as _z

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_png expects [h, w, 3] RGB")
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.uint8)
    for row in px:
        if filter_type == 0:
            raw.append(0)
            raw.extend(row.tobytes())
        elif filter_type == 2:  # Up
            raw.append(2)
            raw.extend(((row.astype(np.int16) - prev) % 256).astype(np.uint8).tobytes())
        else:
            raise NotImplementedError("encoder emits filters 0 and 2")
        prev = row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[dict, np.ndarray]:
    """Decode 8-bit RGB/gray non-interlaced PNG: chunk walk, zlib
    inflate, full unfiltering (filters 0-4: None/Sub/Up/Average/Paeth)."""
    import zlib as _z

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = None
    color_type = bit_depth = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or color_type not in (0, 2):
                raise NotImplementedError("8-bit gray/RGB PNG only")
            if interlace != 0:
                raise NotImplementedError("no Adam7 interlacing")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = 3 if color_type == 2 else 1
    stride = w * ch
    raw = _z.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) % 256
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + (a + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pr) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, ch)
    if ch == 1:
        img = img[:, :, 0]
    meta = {"kind": "image", "width": int(w), "height": int(h)}
    return meta, img


DECODERS["png"] = decode_png


# ---------------------------------------------------------------------------
# GIF — animated GIF89a with REAL LZW compression (grayscale palette).
# The second compressed codec, and the first real VIDEO container: frame
# extraction / scene detection now run over an actual interchange format.
# Pure Python: LZW with dynamic code table, little-endian bit packing,
# 255-byte sub-blocks.
# ---------------------------------------------------------------------------


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices:
        wb = w + bytes([b])
        if wb in table:
            w = wb
        else:
            emit(table[w])
            table[wb] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
            elif next_code >= 4096:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                code_size = min_code_size + 1
            w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out)


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(frames: np.ndarray, delay_cs: int = 10) -> bytes:
    """Animated GIF89a from grayscale frames [n, h, w] uint8 (identity
    256-gray global palette, real LZW per frame, per-frame delay)."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 3:
        raise ValueError("encode_gif expects [n_frames, h, w] grayscale")
    n, h, w = fr.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT: 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    # content-hash memo: byte-identical frames (still scenes) LZW-encode
    # once — output stream is byte-for-byte what per-frame encoding emits
    memo: dict[bytes, bytes] = {}
    for f in fr:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([8])  # LZW min code size
        key = f.tobytes()
        enc = memo.get(key)
        if enc is None:
            enc = _gif_subblocks(_lzw_encode(key, 8))
            memo[key] = enc
        out += enc
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[dict, np.ndarray]:
    """Decode an animated GIF (grayscale-palette) to [n, h, w] uint8
    frames. Handles LZW, sub-blocks, extensions, and per-frame regions
    (frames must cover the full logical screen, as our encoder emits)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        size = 2 << (flags & 7)
        palette = np.frombuffer(
            payload, dtype=np.uint8, count=size * 3, offset=pos
        ).reshape(size, 3)
        pos += size * 3
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("truncated GIF")
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF")
            x0, y0, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if iflags & 0x80:  # local color table
                pos += (2 << (iflags & 7)) * 3
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF frames")
            if pos >= len(payload):
                raise ValueError("truncated GIF")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                if pos + 1 + ln > len(payload):
                    raise ValueError("truncated GIF")
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("truncated GIF")
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(data), mcs), dtype=np.uint8)
            if len(idx) != fw * fh:
                raise ValueError("GIF frame pixel-count mismatch")
            if (x0, y0, fw, fh) != (0, 0, w, h):
                raise NotImplementedError("partial-region GIF frames")
            frames.append(idx.reshape(fh, fw))
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no frames")
    arr = np.stack(frames)
    # gray palette (R==G==B) → indices map straight to luma; otherwise
    # map through the palette with a proper Rec.601 luma mix
    if palette is not None and not (
        (palette[:, 0] == palette[:, 1]) & (palette[:, 1] == palette[:, 2])
    ).all():
        rgb = palette[arr].astype(np.float64)
        arr = np.clip(
            0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2],
            0, 255,
        ).astype(np.uint8)
    elif palette is not None:
        arr = palette[arr][..., 0]
    meta = {
        "kind": "video",
        "width": int(w),
        "height": int(h),
        "n_frames": int(arr.shape[0]),
    }
    return meta, arr


DECODERS["gif"] = decode_gif


# ---------------------------------------------------------------------------
# JPEG — baseline sequential (SOF0) AND progressive (SOF2) DCT modes
# (ITU-T T.81), pure numpy. The most common real-world image format in
# the documented "compressed codecs" seam: Huffman entropy coding + 8x8
# DCT implemented from the public spec, no native libraries. Encoder
# emits JFIF (grayscale or YCbCr) with the Annex-K quantization +
# typical Huffman tables, as one baseline scan or the conventional
# progressive scan script (spectral selection + successive
# approximation); decoder handles both modes with 4:4:4 / 4:2:0 / 4:2:2
# sampling, restart intervals, byte stuffing, and multi-scan streams.
# Arithmetic coding, hierarchical mode, and 12-bit precision raise
# NotImplementedError explicitly.
# ---------------------------------------------------------------------------

# Annex K.1 base quantization tables (zigzag order NOT applied here —
# these are in natural row-major order).
_JPEG_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_JPEG_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 "typical" Huffman tables: (bits[1..16], huffval)
_JPEG_HUFF = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
                [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
                 0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
                 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
                 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
                 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
                 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
                 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
                 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
                 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
                 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
                 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
                 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
                 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
                 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
                 0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
                 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
                 0xF9, 0xFA]),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
                [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
                 0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
                 0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
                 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
                 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
                 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
                 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
                 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
                 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
                 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
                 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
                 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
                 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
                 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
                 0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
                 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
                 0xF9, 0xFA]),
}

# zigzag scan order (T.81 fig. 5): position k in the scan -> (row, col)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: forward F = T B T', inverse B = T' F T
_DCT_T = np.zeros((8, 8))
_DCT_T[0, :] = 1.0 / np.sqrt(8.0)
for _k in range(1, 8):
    for _n in range(8):
        _DCT_T[_k, _n] = 0.5 * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _jpeg_qt(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(tbl):
        return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)
    return s(_JPEG_QT_LUMA), s(_JPEG_QT_CHROMA)


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman code assignment (T.81 C.2): val -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn — marker bytes bypass stuffing."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n & 7)])


def _mag_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Huffman-encode one zigzag-order length-64 coefficient vector
    (sequential DC+AC); returns the block's DC for prediction."""
    dc = int(zz[0])
    diff = dc - pred_dc
    size = _mag_category(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _mag_category(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _enc_ac_first(bw: _BitWriter, zz: np.ndarray, ss: int, se: int,
                  al: int, ac_codes: dict) -> None:
    """Progressive AC first scan for one block (T.81 §G.1.2.2).  The AC
    point transform divides toward zero.  EOB runs are flushed per block
    (EOB0) so the Annex-K code set — which lacks the longer EOBn
    symbols — suffices; spec-valid, marginally less compact."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        v = (v >> al) if v >= 0 else -((-v) >> al)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _mag_category(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB0
        bw.write(code, ln)


def _enc_ac_refine(bw: _BitWriter, zz: np.ndarray, ss: int, se: int,
                   al: int, ac_codes: dict) -> None:
    """Progressive AC refinement for one block (T.81 §G.1.2.3, fig G.7):
    newly-significant coefficients (|v|>>Al == 1) emit (run,1)+sign;
    already-nonzero ones contribute correction bits, buffered and flushed
    after each emitted symbol so the decoder reads them in band order
    while advancing.  Pending ZRLs are emitted before buffering a
    correction bit, which keeps every buffered bit inside the symbol
    window the decoder replays.  EOB runs flushed per block (EOB0)."""
    absv = [0] * (se + 1 - ss)
    eob = ss - 1  # position of the last newly-significant coefficient
    for i, k in enumerate(range(ss, se + 1)):
        t = abs(int(zz[k])) >> al
        absv[i] = t
        if t == 1:
            eob = k
    run = 0
    corr: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:  # ZRLs not foldable into the EOB
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
            for b in corr:
                bw.write(b, 1)
            corr = []
        if t > 1:
            corr.append(t & 1)
            continue
        code, ln = ac_codes[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[k]) >= 0 else 0, 1)
        for b in corr:
            bw.write(b, 1)
        corr = []
        run = 0
    if run or corr:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
        for b in corr:
            bw.write(b, 1)


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """[H,W] float plane (already level-shifted) -> [H/8, W/8, 8, 8]
    quantized coefficients, vectorized over all blocks at once."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ij,abjk,lk->abil", _DCT_T, blocks, _DCT_T)
    return np.round(f / qt).astype(np.int64)


_JPEG_SAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """JFIF encoder: grayscale [h,w] or RGB [h,w,3] uint8.
    ``subsample``: luma sampling relative to chroma — "444" (none),
    "422" (horizontal 2:1), "420" (2:1 both; chroma is box-averaged).
    ``restart_interval``: emit DRI + an RSTn marker every N MCUs (0 =
    none) — the resync mechanism streaming decoders rely on. Annex-K
    tables scaled by ``quality`` (IJG formula); edges are replicated to
    MCU multiples (decoder crops back).  ``progressive``: emit SOF2 with
    the conventional spectral-selection + successive-approximation scan
    script (DC first at Al=1, split AC bands, then one refinement pass
    per bit-plane) instead of a single baseline SOF0 scan.  The quantized
    coefficients transmitted are identical either way, so both modes
    decode to the same pixels bit-for-bit."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg expects [h,w] gray or [h,w,3] RGB")
    if subsample not in _JPEG_SAMPLING:
        raise ValueError(f"subsample must be one of {sorted(_JPEG_SAMPLING)}")
    hs, vs = (1, 1) if gray else _JPEG_SAMPLING[subsample]
    h, w = px.shape[:2]
    mcu_w, mcu_h = 8 * hs, 8 * vs
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    pad = np.pad(px, [(0, ph - h), (0, pw - w)] + ([] if gray else [(0, 0)]),
                 mode="edge").astype(np.float64)
    qt_l, qt_c = _jpeg_qt(quality)
    if gray:
        planes, samps, comp_q = [pad], [(1, 1)], [qt_l]
    else:
        r, g, b = pad[..., 0], pad[..., 1], pad[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if (hs, vs) != (1, 1):  # box-average chroma down to its grid
            cb = cb.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
            cr = cr.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samps = [(hs, vs), (1, 1), (1, 1)]
        comp_q = [qt_l, qt_c, qt_c]
    coeffs = [_fdct_quant(p - 128.0, q) for p, q in zip(planes, comp_q)]
    # zigzag-order coefficient vectors per block, shared by both modes
    zcs = [c.reshape(c.shape[0], c.shape[1], 64)[:, :, _ZIGZAG] for c in coeffs]

    out = bytearray(b"\xff\xd8")                      # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)            # APP0
    for tid, qt in enumerate([qt_l] if gray else [qt_l, qt_c]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt.reshape(64)[_ZIGZAG])
    ncomp = 1 if gray else 3
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        chs, cvs = samps[ci]
        out += struct.pack("BBB", ci + 1, (chs << 4) | cvs, 0 if ci == 0 else 1)
    for (kind, tid), (bits, vals) in _JPEG_HUFF.items():
        if gray and tid == 1:
            continue
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (0x00 if kind == "dc" else 0x10) | tid
        ) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI

    dc_tabs = [_huff_codes(*_JPEG_HUFF[("dc", 0)]), _huff_codes(*_JPEG_HUFF[("dc", 1)])]
    ac_tabs = [_huff_codes(*_JPEG_HUFF[("ac", 0)]), _huff_codes(*_JPEG_HUFF[("ac", 1)])]
    mcus_y, mcus_x = ph // mcu_h, pw // mcu_w

    if not progressive:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        for ci in range(ncomp):
            out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
        out += b"\x00\x3f\x00"  # Ss/Se/Ah-Al
        bw = _BitWriter()
        preds = [0] * ncomp
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    bw.restart(mcu // restart_interval - 1)
                    preds = [0] * ncomp
                mcu += 1
                for ci in range(ncomp):
                    chs, cvs = samps[ci]
                    t = 0 if ci == 0 else 1
                    for by in range(cvs):
                        for bx in range(chs):
                            preds[ci] = _encode_block(
                                bw,
                                zcs[ci][my * cvs + by, mx * chs + bx],
                                preds[ci],
                                dc_tabs[t],
                                ac_tabs[t],
                            )
        out += bw.flush()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # --- progressive scan script (the conventional libjpeg shape) -----
    # Non-interleaved AC scans cover each component's own sample grid,
    # not the MCU-padded one (T.81 A.2.2) — mirrored by the decoder.
    bwn = [-(-(-(-w * samps[ci][0] // hs)) // 8) for ci in range(ncomp)]
    bhn = [-(-(-(-h * samps[ci][1] // vs)) // 8) for ci in range(ncomp)]
    if gray:
        script = [
            ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 0, 0, 1, 0), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 2, 1),
            ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
        ]

    def scan_units(comp_ids):
        if len(comp_ids) > 1:  # interleaved: MCU order, padded blocks too
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    unit = []
                    for ci in comp_ids:
                        chs, cvs = samps[ci]
                        for by in range(cvs):
                            for bx in range(chs):
                                unit.append((ci, my * cvs + by, mx * chs + bx))
                    yield unit
        else:
            ci = comp_ids[0]
            for by in range(bhn[ci]):
                for bx in range(bwn[ci]):
                    yield [(ci, by, bx)]

    for comp_ids, sss, sse, ah, al in script:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids),
                                         len(comp_ids))
        for ci in comp_ids:
            out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
        out += struct.pack("BBB", sss, sse, (ah << 4) | al)
        bw = _BitWriter()
        preds = {ci: 0 for ci in comp_ids}
        unit_i = 0
        for unit in scan_units(comp_ids):
            if restart_interval and unit_i and unit_i % restart_interval == 0:
                bw.restart(unit_i // restart_interval - 1)
                preds = {ci: 0 for ci in comp_ids}
            unit_i += 1
            for ci, by, bx in unit:
                zz = zcs[ci][by, bx]
                t = 0 if ci == 0 else 1
                if sss == 0 and ah == 0:  # DC first (point transform >> Al)
                    v = int(zz[0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    size = _mag_category(diff)
                    code, ln = dc_tabs[t][size]
                    bw.write(code, ln)
                    if size:
                        bw.write(diff if diff >= 0 else diff + (1 << size) - 1,
                                 size)
                elif sss == 0:  # DC refinement: one raw bit per block
                    bw.write((int(zz[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first(bw, zz, sss, sse, al, ac_tabs[t])
                else:
                    _enc_ac_refine(bw, zz, sss, sse, al, ac_tabs[t])
        out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    marker (0xFF xx, xx != 0) and exposes it for restart handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn: consumed by reset()
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def peek(self, n: int) -> int:
        """Look at the next ``n`` ≤ 24 bits without consuming (zero-padded
        past stream/marker end, like read_bit)."""
        if self.nbits < n:
            self._fill()
        return (self.acc >> (self.nbits - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def reset_at_restart(self) -> None:
        """Consume the next RSTn marker and byte-align (T.81 F.2.1.3.1).
        Any buffered bits are padding; if the marker has not been reached
        yet, scan forward past remaining pad bytes (skipping FF00 stuffed
        pairs) to find it."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None

    def scan_end(self) -> int:
        """Byte offset of the next non-RST marker after the entropy data
        (skipping stuffed FF00 pairs and any stray restart markers)."""
        p = self.pos
        while p + 1 < len(self.data):
            if self.data[p] == 0xFF and self.data[p + 1] != 0x00:
                if 0xD0 <= self.data[p + 1] <= 0xD7:
                    p += 2
                    continue
                return p
            p += 1
        return len(self.data)


_HUFF_LUT_BITS = 8


def _huff_decode_tables(bits: list, vals: list):
    """(mincode, maxcode, valptr, vals, lut) per T.81 F.2.2.3, plus an
    8-bit prefix lookup table: codes of ≤8 bits (the overwhelming
    majority of symbols in real streams) decode with ONE table index
    instead of bit-by-bit tree walking — the standard libjpeg-style
    fast path, worth ~2-3× on the Python decoder."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    lut: list[tuple[int, int] | None] = [None] * (1 << _HUFF_LUT_BITS)
    for ln in range(1, 17):
        if bits[ln - 1] == 0:
            maxcode[ln] = -1
        else:
            valptr[ln] = k
            mincode[ln] = code
            if ln <= _HUFF_LUT_BITS:
                for j in range(bits[ln - 1]):
                    lo = (code + j) << (_HUFF_LUT_BITS - ln)
                    entry = (vals[k + j], ln)
                    for idx in range(lo, lo + (1 << (_HUFF_LUT_BITS - ln))):
                        lut[idx] = entry
            code += bits[ln - 1]
            k += bits[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals, lut


def _huff_read(br: _BitReader, tab) -> int:
    mincode, maxcode, valptr, vals, lut = tab
    v = br.peek(16)
    e = lut[v >> (16 - _HUFF_LUT_BITS)]
    if e is not None:
        br.skip(e[1])
        return e[0]
    ln = _HUFF_LUT_BITS + 1
    while ln <= 16:
        code = v >> (16 - ln)
        if maxcode[ln] >= code >= mincode[ln]:
            br.skip(ln)
            return vals[valptr[ln] + code - mincode[ln]]
        ln += 1
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """Sign-extend a magnitude-category value (T.81 F.2.2.1)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_jpeg_scan(
    payload: bytes,
    pos: int,
    scan_comps: list[dict],
    huffs: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    progressive: bool,
    mcus_x: int,
    mcus_y: int,
) -> int:
    """Entropy-decode one scan into each component's zigzag-order ``coef``
    array and return the byte offset of the next marker.  Sequential scans
    carry DC+AC per block; progressive scans carry one band/bit-plane per
    T.81 §G.2 (DC first/refine when Ss=0, AC first/refine with EOB-run and
    in-band correction bits when Ss>0).  Restart markers reset both the DC
    predictors and the EOB run."""
    br = _BitReader(payload, pos)
    interleaved = len(scan_comps) > 1
    eobrun = 0
    for c in scan_comps:
        c["pred"] = 0

    def block_seq(c: dict, zz: list) -> None:
        size = _huff_read(br, huffs[("dc", c["td"])])
        diff = _extend(br.read_bits(size), size) if size else 0
        c["pred"] += diff
        zz[0] = c["pred"]
        k = 1
        ac_tab = huffs[("ac", c["ta"])]
        while k < 64:
            rs = _huff_read(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC index overflow")
            zz[k] = _extend(br.read_bits(s), s)
            k += 1

    def block_dc_first(c: dict, zz: list) -> None:
        size = _huff_read(br, huffs[("dc", c["td"])])
        diff = _extend(br.read_bits(size), size) if size else 0
        c["pred"] += diff
        zz[0] = c["pred"] << al

    def block_dc_refine(c: dict, zz: list) -> None:
        if br.read_bit():
            zz[0] |= 1 << al

    def block_ac_first(c: dict, zz: list) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        ac_tab = huffs[("ac", c["ta"])]
        k = ss
        while k <= se:
            rs = _huff_read(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << r) - 1  # EOBn: this block + 2^r-1(+bits) more
                if r:
                    eobrun += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            zz[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def block_ac_refine(c: dict, zz: list) -> None:
        # T.81 §G.2 / fig. G.7: newly-significant coefficients arrive as
        # ±1<<Al; coefficients already nonzero from earlier scans receive
        # one correction bit each, read in band order while advancing.
        nonlocal eobrun
        p1, m1 = 1 << al, -1 << al
        ac_tab = huffs[("ac", c["ta"])]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_read(br, ac_tab)
                r, s = rs >> 4, rs & 0x0F
                new_val = 0
                if s:
                    new_val = p1 if br.read_bit() else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break  # rest of band handled by the EOB-run logic
                # advance over r still-zero coefficients, appending a
                # correction bit to each already-nonzero one passed
                while k <= se:
                    if zz[k] != 0:
                        if br.read_bit() and not (zz[k] & p1):
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if new_val and k <= se:
                    zz[k] = new_val
                k += 1
        if eobrun > 0:
            while k <= se:  # correction bits only, to the end of the band
                if zz[k] != 0:
                    if br.read_bit() and not (zz[k] & p1):
                        zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1

    if not progressive:
        block = block_seq
    elif ss == 0:
        block = block_dc_first if ah == 0 else block_dc_refine
    else:
        block = block_ac_first if ah == 0 else block_ac_refine

    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        c0 = scan_comps[0]
        n_units = c0["bwn"] * c0["bhn"]
    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            br.reset_at_restart()
            eobrun = 0
            for c in scan_comps:
                c["pred"] = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for c in scan_comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block(c, c["coef"][my * c["v"] + by][mx * c["h"] + bx])
        else:
            by, bx = divmod(unit, c0["bwn"])
            block(c0, c0["coef"][by][bx])
    return br.scan_end()


def decode_jpeg(payload: bytes) -> tuple[dict, np.ndarray]:
    """JPEG decoder (ITU-T T.81): baseline sequential (SOF0/1) and
    progressive (SOF2, spectral selection + successive approximation),
    Huffman entropy coding, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
    intervals, multi-scan streams.  Returns (meta, uint8 array — [h,w]
    grayscale or [h,w,3] RGB).  Arithmetic-coded, hierarchical and
    12-bit variants raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[str, int], tuple] = {}
    comps: list[dict] = []
    h = w = 0
    mcus_x = mcus_y = 0
    restart_interval = 0
    progressive = False
    n_scans = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        if pos + 2 + seg_len > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                if bpos + 65 > len(body):
                    raise ValueError("truncated JPEG DQT")
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, bpos + 1)
                qts[tq] = tbl.reshape(8, 8)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                if bpos + 17 > len(body):
                    raise ValueError("truncated JPEG DHT")
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                if bpos + 17 + n > len(body):
                    raise ValueError("truncated JPEG DHT")
                vals = list(body[bpos + 17 : bpos + 17 + n])
                huffs[("dc" if tc == 0 else "ac", th)] = _huff_decode_tables(bits, vals)
                bpos += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if comps:
                raise ValueError("multiple JPEG SOF markers")
            progressive = marker == 0xC2
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision JPEG")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF")
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]  # blocks per row, MCU-padded
                c["bh"] = mcus_y * c["v"]
                # non-interleaved scan dims: blocks of the component's own
                # sample grid, NOT padded to MCU multiples (T.81 A.2.2)
                c["bwn"] = -(-(-(-w * c["h"] // hmax)) // 8)
                c["bhn"] = -(-(-(-h * c["v"] // vmax)) // 8)
                # zigzag-order coefficients as per-block PYTHON lists:
                # entropy decode touches coefficients one at a time, and
                # list get/set is ~3x cheaper than numpy scalar indexing;
                # converted to one ndarray after the last scan
                c["coef"] = [
                    [[0] * 64 for _ in range(c["bw"])]
                    for _ in range(c["bh"])
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            if not body or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS")
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tabs = body[1 + 2 * si], body[2 + 2 * si]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError("JPEG SOS references unknown component")
                comp["td"], comp["ta"] = tabs >> 4, tabs & 0x0F
                scan_comps.append(comp)
            sss, sse, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                sss, sse, ah, al = 0, 63, 0, 0
            elif sss > sse or sse > 63 or (sss == 0) != (sse == 0):
                raise ValueError("invalid JPEG progressive scan band")
            elif sss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be non-interleaved")
            for c in scan_comps:
                need_dc = not progressive or (sss == 0 and ah == 0)
                need_ac = not progressive or sss > 0
                if need_dc and ("dc", c["td"]) not in huffs:
                    raise ValueError("JPEG scan references missing Huffman table")
                if need_ac and ("ac", c["ta"]) not in huffs:
                    raise ValueError("JPEG scan references missing Huffman table")
            pos = _decode_jpeg_scan(
                payload, pos + 2 + seg_len, scan_comps, huffs,
                sss, sse, ah, al, restart_interval, progressive,
                mcus_x, mcus_y,
            )
            n_scans += 1
            continue
        pos += 2 + seg_len
    if not comps or n_scans == 0:
        raise ValueError("JPEG missing SOF/SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    planes = []
    for c in comps:
        if c["tq"] not in qts:
            raise ValueError("JPEG scan references missing quant table")
        zz_arr = np.array(c["coef"], dtype=np.int64)
        nat = np.zeros_like(zz_arr)
        nat[:, :, _ZIGZAG] = zz_arr
        deq = nat.reshape(c["bh"], c["bw"], 8, 8) * qts[c["tq"]]
        spatial = np.einsum("ji,abjk,kl->abil", _DCT_T, deq.astype(np.float64), _DCT_T)
        plane = spatial.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8) + 128.0
        # upsample to full resolution (nearest, per sampling factor)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return {"kind": "image", "width": int(w), "height": int(h)}, out
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"kind": "image", "width": int(w), "height": int(h)}, out


DECODERS["jpeg"] = decode_jpeg


# ---------------------------------------------------------------------------
# MP4 — ISO Base Media File Format container (ISO/IEC 14496-12), pure
# Python.  Real box-structured demux: ftyp/moov/trak/mdia/minf/stbl with
# the full stsc/stsz/stco sample-to-chunk walk (and co64), so per-sample
# payload extraction works on genuinely chunked files.  Sample DECODE is
# per-codec: MJPEG tracks (fourcc 'jpeg' — each sample a complete JPEG
# image) decode end-to-end through decode_jpeg; compressed codecs that
# need native libraries (avc1/H.264, hvc1, mp4a/AAC) raise
# NotImplementedError naming the boundary — the container layer itself
# is fully real either way (metadata, durations, sample table).
# ---------------------------------------------------------------------------

def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _mp4_full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _mp4_box(tag, struct.pack(">I", (version << 24) | flags) + body)


def _mp4_children(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in [start, end);
    handles 64-bit largesize (size==1) and to-end boxes (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        tag = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("invalid MP4 box size")
        yield tag, pos + hdr, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, tag: bytes):
    for t, b0, b1 in _mp4_children(data, start, end):
        if t == tag:
            return b0, b1
    return None


def encode_mp4_mjpeg(
    frames: np.ndarray,
    fps: int = 10,
    quality: int = 90,
    chunk_size: int = 5,
    progressive: bool = False,
) -> bytes:
    """MJPEG-in-MP4 writer: each frame ([n,h,w] gray or [n,h,w,3] RGB
    uint8) becomes one complete JPEG sample (fourcc 'jpeg', the classic
    QuickTime motion-JPEG layout) in an ISO BMFF container —
    ftyp + mdat + moov with a real sample table.  Samples are grouped
    ``chunk_size`` per chunk so stsc/stco carry more than the trivial
    single-chunk case and the reader's chunk walk is honestly
    exercised."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim not in (3, 4):
        raise ValueError("encode_mp4_mjpeg expects [n,h,w] or [n,h,w,3]")
    n, h, w = fr.shape[0], fr.shape[1], fr.shape[2]
    if n == 0:
        raise ValueError("encode_mp4_mjpeg needs at least one frame")
    # content-hash memo: byte-identical frames (still scenes, test
    # patterns, freeze frames) encode once and reuse the JPEG sample
    # bytes — the container still lists every sample individually, the
    # output stream is byte-for-byte what per-frame encoding produces
    memo: dict[bytes, bytes] = {}
    samples = []
    for i in range(n):
        key = fr[i].tobytes()
        enc = memo.get(key)
        if enc is None:
            enc = encode_jpeg(fr[i], quality=quality, progressive=progressive)
            memo[key] = enc
        samples.append(enc)
    timescale = 1000
    delta = max(1, timescale // max(1, fps))
    duration = n * delta

    ftyp = _mp4_box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2" + b"mp41"
    )
    mdat = _mp4_box(b"mdat", b"".join(samples))

    # sample table -----------------------------------------------------
    vse = struct.pack(">6xH", 1)                     # data_reference_index
    vse += struct.pack(">HH3I", 0, 0, 0, 0, 0)       # pre_defined/reserved
    vse += struct.pack(">HH", w, h)
    vse += struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)  # dpi, frames
    vse += bytes(32)                                 # compressorname
    vse += struct.pack(">Hh", 24, -1)                # depth, pre_defined
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1) + _mp4_box(b"jpeg", vse))
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    n_chunks = -(-n // chunk_size)
    stsc_entries = [(1, min(chunk_size, n), 1)]
    last = n - (n_chunks - 1) * chunk_size
    if n_chunks > 1 and last != chunk_size:
        stsc_entries.append((n_chunks, last, 1))
    stsc = _mp4_full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _mp4_full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    offsets, off = [], len(ftyp) + 8  # absolute offset of mdat payload
    si = 0
    for _ in range(n_chunks):
        offsets.append(off)
        for _ in range(min(chunk_size, n - si)):
            off += len(samples[si])
            si += 1
    stco = _mp4_full(
        b"stco", 0, 0,
        struct.pack(">I", n_chunks)
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)

    # media / track / movie headers ------------------------------------
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_full(b"dref", 0, 0,
                     struct.pack(">I", 1) + _mp4_full(b"url ", 0, 1, b""))
    minf = _mp4_box(b"minf", vmhd + _mp4_box(b"dinf", dref) + stbl)
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _mp4_full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + bytes(12) + b"VideoHandler\x00",
    )
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd = _mp4_full(
        b"tkhd", 0, 3,
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + bytes(8)
        + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _mp4_box(b"trak", tkhd + mdia)
    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100) + bytes(10) + matrix
        + bytes(24) + struct.pack(">I", 2),
    )
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def demux_mp4(payload: bytes) -> tuple[dict, list[bytes]]:
    """Parse the ISO BMFF structure and extract the first video track's
    raw sample payloads via the stsc/stsz/stco walk (chunk i takes its
    samples-per-chunk from the stsc run with the largest first_chunk
    ≤ i; samples are consecutive within a chunk).  Returns
    ({codec, width, height, n_samples, duration_s, timescale}, samples);
    no sample decoding happens here."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload")
    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    for tag, t0, t1 in _mp4_children(payload, *moov):
        if tag != b"trak":
            continue
        mdia = _mp4_find(payload, t0, t1, b"mdia")
        if mdia is None:
            continue
        hdlr = _mp4_find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _mp4_find(payload, t0, t1, b"tkhd")
        if tkhd is None:
            raise ValueError("MP4 video trak missing tkhd")
        ver = payload[tkhd[0]]
        # width/height are the last two 16.16 fixed-point fields
        w16, h16 = struct.unpack_from(">II", payload, tkhd[1] - 8)
        width, height = w16 >> 16, h16 >> 16
        mdhd = _mp4_find(payload, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("MP4 video trak missing mdhd")
        ver = payload[mdhd[0]]
        if ver == 1:
            timescale, duration = struct.unpack_from(">IQ", payload,
                                                     mdhd[0] + 20)
        else:
            timescale, duration = struct.unpack_from(">II", payload,
                                                     mdhd[0] + 12)
        minf = _mp4_find(payload, *mdia, b"minf")
        stbl = _mp4_find(payload, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("MP4 video trak missing stbl")
        stsd = _mp4_find(payload, *stbl, b"stsd")
        if stsd is None:
            raise ValueError("MP4 missing stsd")
        fourcc = next(_mp4_children(payload, stsd[0] + 8, stsd[1]))[0]
        codec = fourcc.decode("ascii", "replace").strip()
        stsz = _mp4_find(payload, *stbl, b"stsz")
        stsc = _mp4_find(payload, *stbl, b"stsc")
        stco = _mp4_find(payload, *stbl, b"stco")
        co64 = _mp4_find(payload, *stbl, b"co64")
        if stsz is None or stsc is None or (stco is None and co64 is None):
            raise ValueError("MP4 missing sample table boxes")
        uniform, n = struct.unpack_from(">II", payload, stsz[0] + 4)
        if uniform:
            sizes = [uniform] * n
        else:
            sizes = list(struct.unpack_from(f">{n}I", payload, stsz[0] + 12))
        n_ent = struct.unpack_from(">I", payload, stsc[0] + 4)[0]
        runs = [
            struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)[:2]
            for i in range(n_ent)
        ]
        if co64 is not None:
            n_ch = struct.unpack_from(">I", payload, co64[0] + 4)[0]
            offsets = struct.unpack_from(f">{n_ch}Q", payload, co64[0] + 8)
        else:
            n_ch = struct.unpack_from(">I", payload, stco[0] + 4)[0]
            offsets = struct.unpack_from(f">{n_ch}I", payload, stco[0] + 8)
        samples: list[bytes] = []
        ri = 0
        for ci, off in enumerate(offsets, start=1):
            while ri + 1 < len(runs) and runs[ri + 1][0] <= ci:
                ri += 1
            pos = off
            for _ in range(runs[ri][1]):
                if len(samples) >= n:
                    break
                size = sizes[len(samples)]
                if pos + size > len(payload):
                    raise ValueError("MP4 sample extends past end of file")
                samples.append(payload[pos : pos + size])
                pos += size
        if len(samples) != n:
            raise ValueError("MP4 sample count mismatch in chunk walk")
        meta = {
            "kind": "video",
            "codec": codec,
            "width": int(width),
            "height": int(height),
            "n_samples": int(n),
            "timescale": int(timescale),
            "duration_s": (duration / timescale) if timescale else 0.0,
        }
        return meta, samples
    raise ValueError("MP4 has no video track")


def decode_mp4(payload: bytes) -> tuple[dict, np.ndarray]:
    """Demux + per-sample decode.  MJPEG tracks (fourcc 'jpeg') decode
    fully via decode_jpeg and return [n,h,w] (gray) or [n,h,w,3] (RGB)
    frames; codecs that need native libraries raise NotImplementedError
    naming the boundary."""
    meta, samples = demux_mp4(payload)
    if meta["codec"] != "jpeg":
        raise NotImplementedError(
            f"MP4 sample codec '{meta['codec']}' requires native libraries "
            "(only MJPEG-in-MP4 decodes here)"
        )
    # content-hash memo mirroring the encoder's: byte-identical samples
    # (common in MJPEG — still scenes repeat the exact JPEG bytes)
    # decode once; identical bytes decode to identical pixels, so this
    # is pure caching, not a semantic shortcut
    memo: dict[bytes, np.ndarray] = {}
    frames = []
    for s in samples:
        f = memo.get(s)
        if f is None:
            f = decode_jpeg(s)[1]
            memo[s] = f
        frames.append(f)
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("MP4 MJPEG samples disagree on frame shape")
    meta = dict(meta)
    meta["n_frames"] = meta.pop("n_samples")
    return meta, np.stack(frames)


DECODERS["mp4"] = decode_mp4


# ---------------------------------------------------------------------------
# FLAC — Free Lossless Audio Codec (the format's public spec; also
# RFC 9639), pure Python.  The lossless COMPRESSED audio format training
# corpora actually ship: fixed/LPC linear prediction + Rice-coded
# residuals.  Encoder emits 16-bit mono/stereo with constant/verbatim/
# fixed(0-2) subframes, any stereo decorrelation mode, and single-
# partition Rice residuals; decoder additionally handles LPC subframes
# of any order, multi-partition and escaped Rice residuals, wasted bits,
# all four channel assignments, and verifies the frame CRC-8/CRC-16 and
# the STREAMINFO MD5 — so "decode succeeded" is an integrity statement,
# not a parse statement.  Losslessness makes every oracle exact.
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _MSBWriter:
    """MSB-first bit writer (no byte stuffing — that is JPEG-only)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> bytes:
        if self.nbits:
            self.write(0, 8 - self.nbits)
        return bytes(self.buf)


class _MSBReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= nbits
        v = (self.acc >> self.nbits) & ((1 << nbits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - (self.nbits + 7) // 8


def _flac_utf8(n: int) -> bytes:
    """UTF-8-style coded number (frame header, supports > U+10FFFF)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC)):
        if n < (1 << (5 * nbytes + 1)):
            out = [lead | (n >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("FLAC frame number too large")


def _flac_read_utf8(br: _MSBReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for mask, lead, nb in ((0xE0, 0xC0, 2), (0xF0, 0xE0, 3), (0xF8, 0xF0, 4),
                           (0xFC, 0xF8, 5), (0xFE, 0xFC, 6)):
        if b0 & mask == lead:
            n = b0 & (0xFF >> (nb + 1))
            nbytes = nb
            break
    else:
        raise ValueError("invalid FLAC UTF-8 frame number")
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


_FLAC_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _rice_encode(bw: _MSBWriter, res: np.ndarray, param: int) -> None:
    for v in res:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag fold
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _rice_param(res: np.ndarray) -> int:
    mean = float(np.abs(res).mean()) if len(res) else 0.0
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _encode_subframe(bw: _MSBWriter, x: np.ndarray, bps: int) -> None:
    """One subframe: constant if flat, else best of fixed orders 0-2 by
    sum-of-abs residual (verbatim fallback), single Rice partition."""
    bw.write(0, 1)  # zero pad bit
    if np.all(x == x[0]):
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best_order, best_cost, best_res = 0, None, None
    for order in range(0, 3):
        if order >= len(x):
            break
        res = np.asarray(x, dtype=np.int64)
        for _ in range(order):
            res = np.diff(res)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    # verbatim fallback if prediction inflates beyond raw
    if best_cost is not None and best_cost > (1 << (bps + 2)) * len(x):
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v) & ((1 << bps) - 1), bps)
        return
    order, res = best_order, best_res
    bw.write(0b001000 | order, 6)
    bw.write(0, 1)  # no wasted bits
    for v in x[:order]:  # warm-up samples
        bw.write(int(v) & ((1 << bps) - 1), bps)
    bw.write(0b00, 2)  # residual method: 4-bit Rice
    bw.write(0, 4)  # partition order 0
    param = _rice_param(res)
    bw.write(param, 4)
    _rice_encode(bw, res, param)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """FLAC encoder: int16 ``[n]`` mono or ``[n, 2]`` stereo.
    ``stereo_mode``: independent / left_side / right_side / mid_side
    (decorrelated difference channels carry bps+1 bits per spec).
    Emits fLaC magic + STREAMINFO (with the real MD5 of the unencoded
    audio) + fixed-blocksize frames with CRC-8'd headers and CRC-16'd
    frames.  Lossless: decode_flac returns the input bit-for-bit."""
    import hashlib

    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("encode_flac expects [n] mono or [n,2] stereo int16")
    n, nch = x.shape
    if n == 0:
        raise ValueError("encode_flac needs at least one sample")
    if nch == 1:
        stereo_mode = "independent"
    bps = 16
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    si = _MSBWriter()
    si.write(min(block_size, n) if n >= block_size else n, 16)  # min blocksize
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.align() + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block

    frame_no = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        bs = blk.shape[0]
        hdr = _MSBWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize
        hdr.write(0b0111, 4)  # blocksize: 16-bit at end of header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        if stereo_mode == "independent":
            hdr.write(nch - 1, 4)
        else:
            hdr.write({"left_side": 0b1000, "right_side": 0b1001,
                       "mid_side": 0b1010}[stereo_mode], 4)
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        hdr_bytes = hdr.align() + _flac_utf8(frame_no) + struct.pack(
            ">H", bs - 1
        )
        hdr_bytes += bytes([_crc8(hdr_bytes)])

        bw = _MSBWriter()
        ch = blk.astype(np.int64)
        if stereo_mode == "independent":
            subs = [(ch[:, c], bps) for c in range(nch)]
        elif stereo_mode == "left_side":
            subs = [(ch[:, 0], bps), (ch[:, 0] - ch[:, 1], bps + 1)]
        elif stereo_mode == "right_side":
            subs = [(ch[:, 0] - ch[:, 1], bps + 1), (ch[:, 1], bps)]
        else:  # mid_side
            subs = [((ch[:, 0] + ch[:, 1]) >> 1, bps),
                    (ch[:, 0] - ch[:, 1], bps + 1)]
        for sub, sub_bps in subs:
            _encode_subframe(bw, sub, sub_bps)
        frame = hdr_bytes + bw.align()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)


_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_FLAC_RATES = {4: 8000, 5: 16000, 6: 22050, 7: 24000, 8: 32000,
               9: 44100, 10: 48000, 11: 96000, 1: 88200, 2: 176400, 3: 192000}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _decode_subframe(br: _MSBReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("FLAC subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted
    if t == 0b000000:  # CONSTANT
        out = np.full(bs, br.read_signed(bps), dtype=np.int64)
    elif t == 0b000001:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 0b001000 <= t <= 0b001100:  # FIXED 0-4
        order = t & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        coefs = _FLAC_FIXED_COEFS[order]
        for i in range(order, bs):
            out[i] = res[i - order] + sum(
                c * out[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif t & 0b100000:  # LPC
        order = (t & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            acc = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {t:#08b}")
    return out << wasted


def _read_residual(br: _MSBReader, bs: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts or (bs >> porder) <= order:
        raise ValueError("invalid FLAC partition order")
    res: list[int] = []
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            res.extend(br.read_signed(raw) if raw else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << param) | (br.read(param) if param else 0)
                res.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return res


def decode_flac(payload: bytes) -> tuple[dict, np.ndarray]:
    """FLAC decoder (subset: 8/16/20/24-bit PCM, any channel assignment,
    constant/verbatim/fixed/LPC subframes, multi-partition + escaped
    Rice residuals, wasted bits).  Verifies every frame's CRC-8/CRC-16
    and the stream MD5 when STREAMINFO carries one — corruption raises,
    it never returns plausible garbage.  Returns the same (meta, int16
    [n, ch]) shape as decode_wav so downstream features are
    codec-agnostic."""
    import hashlib

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if hdr & 0x7F == 0:
            streaminfo = body
        pos += 4 + size
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    si = _MSBReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    nch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5 = streaminfo[18:34]
    if bps not in (8, 16, 20, 24):
        raise NotImplementedError(f"FLAC {bps}-bit depth not supported")

    chans: list[np.ndarray] = [np.empty(0, dtype=np.int64) for _ in range(nch)]
    got = 0
    while got < total:
        frame_start = pos
        br = _MSBReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _flac_read_utf8(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _FLAC_BLOCKSIZES:
            bs = _FLAC_BLOCKSIZES[bs_code]
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        fbps = _FLAC_BPS.get(bps_code, bps) if bps_code else bps
        hdr_end = br.byte_pos()
        if _crc8(payload[frame_start:hdr_end]) != payload[hdr_end]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        br = _MSBReader(payload, hdr_end + 1)

        if ch_code <= 7:
            subs = [_decode_subframe(br, bs, fbps) for _ in range(ch_code + 1)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(br, bs, fbps)
            side = _decode_subframe(br, bs, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(br, bs, fbps + 1)
            right = _decode_subframe(br, bs, fbps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(br, bs, fbps)
            side = _decode_subframe(br, bs, fbps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        if len(subs) != nch:
            raise ValueError("FLAC frame channel count mismatch")
        br.align()
        crc_pos = br.byte_pos()
        want = struct.unpack_from(">H", payload, crc_pos)[0]
        if _crc16(payload[frame_start:crc_pos]) != want:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = crc_pos + 2
        for c in range(nch):
            chans[c] = np.concatenate([chans[c], subs[c]])
        got += bs

    arr = np.stack(chans, axis=1)[:total]
    if bps == 16:
        out = arr.astype(np.int16)
        if md5 != bytes(16) and hashlib.md5(
            out.astype("<i2").tobytes()
        ).digest() != md5:
            raise ValueError("FLAC stream MD5 mismatch")
    else:
        out = arr.astype(np.int32)
    meta = {
        "kind": "audio",
        "sample_rate": int(sample_rate),
        "n_channels": int(nch),
        "n_samples": int(total),
        "bits_per_sample": int(bps),
    }
    return meta, out


DECODERS["flac"] = decode_flac
