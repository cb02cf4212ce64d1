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
    for f in fr:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([8])  # LZW min code size
        out += _gif_subblocks(_lzw_encode(f.tobytes(), 8))
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
