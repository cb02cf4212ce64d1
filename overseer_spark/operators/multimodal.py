"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design (SURVEY.md Phase 4): media travels as a ``binary`` column with a
struct of metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so each executor core streams record
batches without ever materializing the whole partition. WAV (RIFF
PCM16), BMP, PPM/PGM, PNG (zlib + spec filters), animated GIF (LZW) and
baseline JPEG (Huffman + DCT, ITU-T T.81) all decode for REAL via the
pure-numpy codecs in functions/media_codecs.py (``media_features`` sniffs
magic bytes, decodes, and extracts rms/luma features). The remaining
compressed codecs (webp/mp3/h264...) need native libraries this container
does not ship and stay a clearly-marked ``NotImplementedError`` seam in
``decode_media``.

At 100 TB: binary payloads dominate scan width, so metadata lives in its own
columns (parquet column pruning skips the bytes for metadata-only queries),
and ``spread_by_payload_bytes`` repartitions media rows by TOTAL PAYLOAD
BYTES (not row count) before decode so the Arrow transfer and pandas
batches stay memory-bounded whatever the blob-size distribution.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video | text
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

# png (zlib is stdlib) and jpeg (baseline T.81 — Huffman + DCT in pure
# numpy, functions/media_codecs.py) decode for REAL now; the remaining
# seam is codecs whose compression needs native libraries
_COMPRESSED_CODECS = frozenset({"webp", "mp3", "flac", "h264", "vp9"})


def with_binary_payload(
    df: DataFrame, text_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Attach a deterministic binary payload column (UTF-8 bytes of the text
    column) + metadata struct — the test stand-in for real media ingest."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("raw-utf8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def decode_media(payload: bytes, codec: str):
    """Decode one media payload.

    WAV / BMP / PPM / PGM / PNG / GIF / baseline JPEG decode for real,
    in pure numpy (functions/media_codecs.py): audio -> (meta, int16
    samples), still images -> (meta, uint8 pixel array), GIF -> (meta,
    [n,h,w] frames). The remaining compressed codecs are a deliberate
    seam — they need native libraries this container does not ship;
    plug PIL/soundfile/av here."""
    from overseer_spark.functions import media_codecs as MC

    if codec == "raw-utf8":
        return payload  # identity "decode" for the deterministic fake codec
    if codec in MC.DECODERS:
        return MC.DECODERS[codec](bytes(payload))
    if codec in _COMPRESSED_CODECS:
        raise NotImplementedError(
            f"codec {codec!r}: media libraries not available in this environment; "
            "install PIL/soundfile/av and implement decode here"
        )
    raise ValueError(f"unknown codec: {codec!r}")


def extract_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    mapInPandas streams pandas record-batches; per batch we decode (fake
    codec) and emit (id, n_bytes, digest). Output schema is fixed so the
    optimizer can prune upstream columns to (id, payload) only.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            raw = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": raw.map(len).astype("int64"),
                    "digest": raw.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    pruned = df.select(id_col, payload_col)
    return pruned.mapInPandas(batches, schema=f"{id_col} long, n_bytes long, digest string")


def extract_metadata_arrow(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """``mapInArrow`` twin of ``extract_metadata``: consumes/produces raw
    ``pyarrow.RecordBatch`` — no pandas materialization, no object-dtype
    copy of the binary column. For blob-heavy batches this is the
    lowest-overhead Python seam Spark offers (the bytes arrive as Arrow
    binary buffers, zero-copy from the JVM); pytest pins output parity
    with the pandas variant."""

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        for rb in it:
            payload = rb.column(rb.schema.get_field_index(payload_col))
            digests = [
                hashlib.md5(v.as_py()).hexdigest() for v in payload
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index(id_col)),
                    pa.compute.binary_length(payload).cast(pa.int64()),
                    pa.array(digests, pa.string()),
                ],
                names=[id_col, "n_bytes", "digest"],
            )

    pruned = df.select(id_col, payload_col)
    return pruned.mapInArrow(
        batches, schema=f"{id_col} long, n_bytes long, digest string"
    )


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic frame sampling for the fake codec: split payload bytes
    into fixed 64-byte 'frames', keep every ``every_n``-th. Demonstrates the
    1→N mapInPandas expansion shape used for real video frame extraction."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                frames = [b[o : o + 64] for o in range(0, len(b), 64)]
                for j in range(0, len(frames), every_n):
                    out_ids.append(i)
                    out_idx.append(j)
                    out_frames.append(frames[j])
            yield pd.DataFrame(
                {id_col: out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build REAL media payloads deterministically from an id column:
    ids are assigned round-robin to wav / bmp / ppm and encoded with the
    pure-numpy codecs (functions/media_codecs.py). This is the test-data
    generator for the real decode path — every byte string is a valid
    file another tool could open. Arrow-batched; only ``id_col`` is read
    upstream, so the scan prunes to one column."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads, codecs = [], []
            for i in ids:
                i = int(i)
                if i % 3 == 0:  # audio: short sine, id-keyed frequency
                    sr = 8000
                    freq = 200.0 + (i % 40) * 20.0
                    t = np.arange(400, dtype=np.float64) / sr
                    wave = (12000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                    payloads.append(MC.encode_wav(wave, sr))
                    codecs.append("wav")
                elif i % 3 == 1:  # image: 8x8 RGB id-keyed gradient
                    r, c = np.mgrid[0:8, 0:8]
                    px = np.stack(
                        [
                            (i * 7 + r * 16 + c) % 256,
                            (i * 13 + r + c * 16) % 256,
                            (i * 29 + r * 8 + c * 8) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    payloads.append(MC.encode_bmp(px))
                    codecs.append("bmp")
                else:  # image: 6x10 RGB ramp
                    r, c = np.mgrid[0:6, 0:10]
                    px = np.stack(
                        [
                            (i + r * 25) % 256,
                            (i * 3 + c * 25) % 256,
                            np.full((6, 10), (i * 5) % 256),
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    payloads.append(MC.encode_ppm(px))
                    codecs.append("ppm")
            yield pd.DataFrame(
                {id_col: ids, "codec": codecs, "payload": payloads}
            )

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, codec string, payload binary"
    )


def media_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode real payloads and extract per-item features, Arrow-batched.

    Audio -> (sample_rate, n_samples, rms of normalized amplitude);
    image -> (width, height, mean_luma via BT.601). The codec is sniffed
    from magic bytes — the operator never trusts a codec column. This is
    the real decode/feature stage the round-1 stub stood in for; the
    Spark seam (mapInPandas, pruned input, fixed output schema) is
    unchanged, so swapping in native codecs later touches only the
    per-payload function."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            out = {
                id_col: [], "codec": [], "kind": [], "width": [], "height": [],
                "sample_rate": [], "n_samples": [], "rms": [], "mean_luma": [],
            }
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                codec = MC.sniff_codec(b)
                if codec is None:
                    continue  # unrecognized payloads are filtered, not fatal
                meta, arr = MC.DECODERS[codec](b)
                out[id_col].append(int(i))
                out["codec"].append(codec)
                out["kind"].append(meta["kind"])
                if meta["kind"] == "audio":
                    norm = arr.astype(np.float64) / 32768.0
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(meta["sample_rate"])
                    out["n_samples"].append(meta["n_samples"])
                    out["rms"].append(float(np.sqrt(np.mean(norm**2))))
                    out["mean_luma"].append(None)
                elif meta["kind"] == "video":
                    # animated GIF: frames are already luma indices
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["sample_rate"].append(None)
                    out["n_samples"].append(meta["n_frames"])
                    out["rms"].append(None)
                    out["mean_luma"].append(float(arr.astype(np.float64).mean()))
                else:
                    px = arr.astype(np.float64)
                    luma = (
                        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
                        if px.ndim == 3
                        else px
                    )
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["rms"].append(None)
                    out["mean_luma"].append(float(luma.mean()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        schema=(
            f"{id_col} long, codec string, kind string, width int, height int, "
            "sample_rate int, n_samples long, rms double, mean_luma double"
        ),
    )


def audio_spectral_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Real DSP over decoded WAV payloads: dominant frequency (FFT peak),
    spectral centroid, and bandwidth per clip — the audio analog of the
    image luma features, Arrow-batched with the same pruned-input seam.
    Non-audio payloads are filtered out, not fatal. The synthesize_media
    fixtures are id-keyed sines landing exactly on FFT bin centers, so
    tests assert the recovered peak equals the construction frequency."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            out = {
                id_col: [], "sample_rate": [], "dominant_hz": [],
                "spectral_centroid_hz": [], "bandwidth_hz": [],
            }
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if MC.sniff_codec(b) != "wav":
                    continue
                meta, arr = MC.decode_wav(b)
                x = arr.astype(np.float64) / 32768.0
                if x.ndim == 2:  # (n_samples, n_channels) → mono mixdown
                    x = x.mean(axis=1)
                mag = np.abs(np.fft.rfft(x))
                mag[0] = 0.0  # ignore DC
                freqs = np.fft.rfftfreq(len(x), d=1.0 / meta["sample_rate"])
                peak = int(np.argmax(mag))
                power = mag.sum()
                centroid = float((freqs * mag).sum() / power) if power else 0.0
                bw = (
                    float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / power))
                    if power
                    else 0.0
                )
                out[id_col].append(int(i))
                out["sample_rate"].append(meta["sample_rate"])
                out["dominant_hz"].append(float(freqs[peak]))
                out["spectral_centroid_hz"].append(round(centroid, 3))
                out["bandwidth_hz"].append(round(bw, 3))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        schema=(
            f"{id_col} long, sample_rate int, dominant_hz double, "
            "spectral_centroid_hz double, bandwidth_hz double"
        ),
    )


def image_ahash(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec_col: str = "codec",
) -> DataFrame:
    """64-bit average hash (aHash) of decoded image payloads.

    Decode (pure-numpy bmp/ppm/pgm codecs) → luma grayscale → 8×8 mean
    downsample → one bit per cell (above/below the global mean), packed
    MSB-first into a signed int64 and emitted as a 16-hex-char string.
    The perceptual fingerprint is invariant to uniform brightness scaling
    and tolerant to resizing — Hamming distance on the 64-bit keys is the
    image near-dup metric, and the SimHash pigeonhole blocking
    (operators/dedup.py) applies unchanged, so candidate generation
    shuffles 8-byte hashes instead of pixels. Non-image codecs pass
    through with a NULL hash."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            out_hash = []
            for codec, payload in zip(pdf[codec_col], pdf[payload_col]):
                if codec not in ("bmp", "ppm", "pgm", "png"):
                    out_hash.append(None)
                    continue
                _, px = getattr(MC, f"decode_{codec}")(bytes(payload))
                px = px.astype(np.float64)
                gray = (
                    0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
                    if px.ndim == 3
                    else px
                )
                h, w = gray.shape
                # 8x8 block-mean downsample on an even grid (edge blocks
                # absorb the remainder), then sign-vs-mean bits
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
                # wrap to signed 64-bit so it round-trips through LongType
                if val >= 1 << 63:
                    val -= 1 << 64
                out_hash.append(f"{val & 0xFFFFFFFFFFFFFFFF:016x}")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    codec_col: pdf[codec_col],
                    "ahash": out_hash,
                }
            )

    return media.mapInPandas(
        batches, schema=f"{id_col} long, {codec_col} string, ahash string"
    )


def image_resize(
    media: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec_col: str = "codec",
) -> DataFrame:
    """REAL image resize: decode (pure-numpy bmp/ppm/pgm) → block-mean
    downsample to (out_h, out_w) → re-encode as BMP. The thumbnail
    pipeline stage: output payloads are valid BMP files any tool opens,
    emitted with their dimensions and byte size so downstream stages can
    verify without decoding. Arrow-batched mapInPandas; non-image codecs
    drop out (filtered, not fatal). At 100 TB the decode+resize runs
    where the bytes live — only thumbnails (fixed small size) ever
    shuffle."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            out = {id_col: [], "in_codec": [], "out_w": [], "out_h": [],
                   "out_bytes": [], "payload": []}
            for i, codec, b in zip(pdf[id_col], pdf[codec_col], pdf[payload_col]):
                if codec not in ("bmp", "ppm", "pgm"):
                    continue
                _, px = getattr(MC, f"decode_{codec}")(bytes(b))
                px = px.astype(np.float64)
                if px.ndim == 2:
                    px = np.stack([px, px, px], axis=-1)
                h, w, _c = px.shape
                ri = (np.arange(h) * out_h) // h
                ci = (np.arange(w) * out_w) // w
                cells = np.zeros((out_h, out_w, 3))
                counts = np.zeros((out_h, out_w, 1))
                np.add.at(cells, (ri[:, None], ci[None, :]), px)
                np.add.at(counts, (ri[:, None], ci[None, :]), 1.0)
                thumb = (cells / np.maximum(counts, 1.0)).round().clip(0, 255)
                payload = MC.encode_bmp(thumb.astype(np.uint8))
                out[id_col].append(int(i))
                out["in_codec"].append(codec)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["out_bytes"].append(len(payload))
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        schema=(
            f"{id_col} long, in_codec string, out_w int, out_h int, "
            "out_bytes long, payload binary"
        ),
    )


def synthesize_speechlike(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Speech-shaped WAV payloads for VAD testing: each id gets
    ``1 + id % 4`` voiced tone bursts (500 samples @ 8 kHz, id-keyed
    pitch) separated by exact-zero silence gaps (300 samples), with
    leading/trailing silence. Every payload is a valid WAV any tool can
    open; the burst count is recoverable from the id, which is the
    oracle ``audio_vad`` is tested against. Arrow-batched, scans only
    the id column."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                n_bursts = 1 + i % 4
                freq = 180.0 + (i % 50) * 15.0
                sr = 8000
                parts = [np.zeros(300, dtype=np.int16)]
                tone_t = np.arange(500, dtype=np.float64) / sr
                tone = (11000 * np.sin(2 * np.pi * freq * tone_t)).astype(
                    np.int16
                )
                for _ in range(n_bursts):
                    parts.append(tone)
                    parts.append(np.zeros(300, dtype=np.int16))
                payloads.append(MC.encode_wav(np.concatenate(parts), sr))
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def audio_vad(
    df: DataFrame,
    frame_len: int = 100,
    rms_threshold: float = 500.0,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Energy-based voice-activity detection over WAV payloads — the
    silence-trim / segmentation step an audio training pipeline runs
    before transcription: decode, frame into ``frame_len``-sample
    windows, RMS per frame, threshold, and merge consecutive voiced
    frames into segments. Emits per-document segment count, voiced
    fraction, and voiced milliseconds. Pure-numpy decode inside an
    Arrow-batched mapInPandas — the payload bytes never shuffle and the
    output is one narrow row per document."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            ids, n_seg, voiced_ms, ratio = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                meta, samples = MC.decode_wav(bytes(b))
                sr = meta["sample_rate"]
                n = len(samples) // frame_len * frame_len
                frames = samples[:n].astype(np.float64).reshape(
                    -1, frame_len
                )
                rms = np.sqrt((frames * frames).mean(axis=1))
                voiced = rms > rms_threshold
                # segment = maximal run of voiced frames
                starts = int(
                    (voiced & ~np.concatenate(([False], voiced[:-1]))).sum()
                )
                ids.append(int(i))
                n_seg.append(starts)
                voiced_ms.append(
                    float(voiced.sum() * frame_len * 1000.0 / sr)
                )
                ratio.append(
                    float(voiced.mean()) if len(voiced) else 0.0
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_segments": n_seg,
                    "voiced_ms": voiced_ms,
                    "voiced_ratio": ratio,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        schema=(
            f"{id_col} long, n_segments int, voiced_ms double, "
            "voiced_ratio double"
        ),
    )


def synthesize_video_frames(
    df: DataFrame, n_frames: int = 24, id_col: str = "doc_id"
) -> DataFrame:
    """Raw-frame 'video' payloads with id-keyed hard cuts: ``n_frames``
    8×8 grayscale frames (64 bytes each, concatenated), three scenes
    with boundaries at ``6 + id % 6`` and ``14 + id % 8`` and per-scene
    luma ``(id * 31) % 100 + 75 * scene`` — so consecutive-frame deltas
    are exactly 0 within a scene and exactly 75 at a cut. The cut
    positions are recoverable from the id; that is the oracle
    ``scene_cuts`` is tested against."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                c1, c2 = 6 + i % 6, 14 + i % 8
                base = i * 31 % 100
                frames = np.empty((n_frames, 64), dtype=np.uint8)
                for f in range(n_frames):
                    scene = 0 if f < c1 else (1 if f < c2 else 2)
                    frames[f, :] = base + 75 * scene
                payloads.append(frames.tobytes())
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def scene_cuts(
    df: DataFrame,
    frame_bytes: int = 64,
    threshold: float = 30.0,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Shot-boundary detection over raw-frame video payloads — the
    keyframe-selection step a video training pipeline runs instead of
    decoding every frame: mean absolute pixel delta between consecutive
    frames, a cut wherever the delta exceeds ``threshold``, frame 0
    always a keyframe. Emits one row per keyframe (doc_id, frame index,
    mean luma) so downstream feature extraction touches only keyframes
    — a 10-100× decode reduction on real footage. Same Arrow-batched
    1→N expansion shape as frame_sample; payloads never shuffle."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out_ids, out_idx, out_luma = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = len(arr) // frame_bytes
                frames = arr[: n * frame_bytes].reshape(n, frame_bytes)
                fl = frames.astype(np.float64)
                deltas = np.abs(fl[1:] - fl[:-1]).mean(axis=1)
                keyframes = [0] + [
                    j + 1 for j in range(n - 1) if deltas[j] > threshold
                ]
                for k in keyframes:
                    out_ids.append(int(i))
                    out_idx.append(int(k))
                    out_luma.append(float(fl[k].mean()))
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    "keyframe_idx": out_idx,
                    "mean_luma": out_luma,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, keyframe_idx int, mean_luma double"
    )


def perturb_brightness(
    media: DataFrame,
    factor: float = 1.2,
    id_offset: int = 1_000_000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec_col: str = "codec",
) -> DataFrame:
    """Brightness-scaled copies of image payloads under offset ids — the
    planted near-duplicate population for perceptual-dedup tests (aHash
    is invariant to uniform brightness scaling, so each copy hashes
    identically to its source). Non-image codecs are dropped. Decode →
    scale+clip → re-encode with the pure-numpy codecs, Arrow-batched."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            ids, codecs, payloads = [], [], []
            for i, codec, payload in zip(
                pdf[id_col], pdf[codec_col], pdf[payload_col]
            ):
                if codec not in ("bmp", "ppm"):
                    continue
                _, px = getattr(MC, f"decode_{codec}")(bytes(payload))
                scaled = np.clip(
                    px.astype(np.float64) * factor, 0, 255
                ).astype(np.uint8)
                enc = getattr(MC, f"encode_{codec}")(scaled)
                ids.append(int(i) + id_offset)
                codecs.append(codec)
                payloads.append(enc)
            yield pd.DataFrame(
                {id_col: ids, codec_col: codecs, payload_col: payloads}
            )

    return media.select(id_col, codec_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, {codec_col} string, {payload_col} binary"
    )


def synthesize_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PNG payloads (zlib-compressed, spec-correct CRCs) built
    deterministically from the id: 12×10 RGB with id-keyed channel bases
    plus a row gradient (so the Up filter actually has work to do), even
    ids encoded with filter 0 (None), odd with filter 2 (Up). Channel
    bases stay < 212, so per-channel means are closed-form — the oracle
    tests/test_multimodal.py checks decoded features against:
    mean_luma = 0.299(R₀+5.5) + 0.587(G₀+5.5) + 0.114·B₀."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                y = np.arange(12)[:, None, None]
                px = np.concatenate(
                    [
                        np.broadcast_to(i * 11 % 200 + y, (12, 10, 1)),
                        np.broadcast_to(i * 23 % 200 + y, (12, 10, 1)),
                        np.broadcast_to(
                            np.full((1, 1, 1), i * 5 % 200), (12, 10, 1)
                        ),
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(MC.encode_png(px, filter_type=(i % 2) * 2))
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def synthesize_gif_media(
    df: DataFrame, n_frames: int = 24, id_col: str = "doc_id"
) -> DataFrame:
    """REAL animated-GIF payloads (LZW-compressed, GIF89a) with the same
    id-keyed 3-scene structure as synthesize_video_frames — cuts at
    ``6 + id % 6`` and ``14 + id % 8``, per-scene luma ``(id*31)%100 +
    75·scene`` — so shot-boundary detection over a genuine interchange
    format has a closed-form oracle. 8×8 grayscale frames."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                c1, c2 = 6 + i % 6, 14 + i % 8
                base = i * 31 % 100
                frames = np.empty((n_frames, 8, 8), dtype=np.uint8)
                for f in range(n_frames):
                    scene = 0 if f < c1 else (1 if f < c2 else 2)
                    frames[f, :, :] = base + 75 * scene
                payloads.append(MC.encode_gif(frames))
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def gif_scene_cuts(
    df: DataFrame,
    threshold: float = 30.0,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Shot-boundary detection over REAL animated GIFs: decode (LZW),
    mean absolute luma delta between consecutive frames, keyframe rows
    at frame 0 and every cut — the raw-frame scene_cuts operator's
    semantics on an actual container format. Payload bytes never
    shuffle; output is keyframe rows only."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            out_ids, out_idx, out_luma = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                _, frames = MC.decode_gif(bytes(b))
                fl = frames.reshape(frames.shape[0], -1).astype(np.float64)
                deltas = np.abs(fl[1:] - fl[:-1]).mean(axis=1)
                keyframes = [0] + [
                    j + 1 for j in range(len(deltas)) if deltas[j] > threshold
                ]
                for k in keyframes:
                    out_ids.append(int(i))
                    out_idx.append(int(k))
                    out_luma.append(float(fl[k].mean()))
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    "keyframe_idx": out_idx,
                    "mean_luma": out_luma,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, keyframe_idx int, mean_luma double"
    )


def synthesize_flac_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL FLAC payloads (fixed-prediction + Rice residuals,
    functions/media_codecs.py) from the SAME sine synthesis as the wav
    fixtures — frequency ``200 + (id%40)*20`` Hz, 400 samples at 8 kHz,
    amplitude 12000 — so the wav formula-replay LUT is the oracle
    verbatim: FLAC is lossless, decode must return the identical int16
    samples.  Block size cycles 4096/256/192 by id so single-frame,
    multi-frame and tiny-tail framing all see traffic."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        sizes = [4096, 256, 192]
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                freq = 200.0 + (i % 40) * 20.0
                t = np.arange(400, dtype=np.float64) / 8000.0
                wave = (12000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                payloads.append(
                    MC.encode_flac(wave, 8000, block_size=sizes[i % 3])
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def synthesize_mp4_media(
    df: DataFrame, n_frames: int = 24, id_col: str = "doc_id"
) -> DataFrame:
    """REAL MP4 payloads (ISO BMFF container with MJPEG samples —
    functions/media_codecs.py: ftyp/moov/trak/stbl sample table, each
    frame a complete JPEG) with the same id-keyed 3-scene structure as
    synthesize_gif_media — cuts at ``6 + id % 6`` and ``14 + id % 8``,
    per-scene luma ``(id*31)%100 + 75·scene`` — so shot-boundary
    detection over a real video container has a closed-form oracle.
    16×16 grayscale frames at JPEG quality 90: flat frames round-trip
    the lossy codec EXACTLY (DC-only blocks), so the oracle needs no
    tolerance.  Every 3rd id uses progressive (SOF2) samples, every 4th
    a different chunking — the demux walk and both JPEG modes all see
    traffic."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                c1, c2 = 6 + i % 6, 14 + i % 8
                base = i * 31 % 100
                frames = np.empty((n_frames, 16, 16), dtype=np.uint8)
                for f in range(n_frames):
                    scene = 0 if f < c1 else (1 if f < c2 else 2)
                    frames[f, :, :] = base + 75 * scene
                payloads.append(
                    MC.encode_mp4_mjpeg(
                        frames,
                        fps=10,
                        quality=90,
                        chunk_size=7 if i % 4 == 0 else 5,
                        progressive=i % 3 == 0,
                    )
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def mp4_scene_cuts(
    df: DataFrame,
    threshold: float = 30.0,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Shot-boundary detection over REAL MP4 video: demux the ISO BMFF
    sample table (stsc/stsz/stco chunk walk), decode each MJPEG sample,
    mean absolute luma delta between consecutive frames, keyframe rows
    at frame 0 and every cut — gif_scene_cuts' semantics on the format
    production video actually ships in.  Payload bytes never shuffle;
    output is keyframe rows only."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        for pdf in it:
            out_ids, out_idx, out_luma = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                _, frames = MC.decode_mp4(bytes(b))
                fl = frames.reshape(frames.shape[0], -1).astype(np.float64)
                deltas = np.abs(fl[1:] - fl[:-1]).mean(axis=1)
                keyframes = [0] + [
                    j + 1 for j in range(len(deltas)) if deltas[j] > threshold
                ]
                for k in keyframes:
                    out_ids.append(int(i))
                    out_idx.append(int(k))
                    out_luma.append(float(fl[k].mean()))
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    "keyframe_idx": out_idx,
                    "mean_luma": out_luma,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, keyframe_idx int, mean_luma double"
    )


def synthesize_jpeg_media(
    df: DataFrame, id_col: str = "doc_id", progressive: bool = False
) -> DataFrame:
    """REAL JPEG payloads (Huffman + DCT, ITU-T T.81 —
    functions/media_codecs.py) built deterministically from the id:
    16×16 RGB with id-keyed channel bases plus a row gradient, cycling
    subsampling by id (444 / 422 / 420) and adding a restart interval
    on every 5th id, so the decoder's interleaved-MCU, chroma-upsample
    and RST-resync paths all see traffic. Channel bases stay < 224 and
    the image is DCT-smooth, so the decoded mean_luma has a closed-form
    oracle within quantization tolerance:
    mean_luma ≈ 0.299(R₀+7.5) + 0.587·G₀ + 0.114·B₀ (±2.5).
    ``progressive=True`` emits SOF2 multi-scan payloads instead — same
    quantized coefficients, so decode output is bit-identical to the
    baseline payloads' (the invariant tests/test_jpeg_progressive.py
    pins)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from overseer_spark.functions import media_codecs as MC

        subs = ["444", "422", "420"]
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                y = np.arange(16)[:, None]
                px = np.stack(
                    [
                        np.broadcast_to(i * 11 % 200 + y, (16, 16)),
                        np.broadcast_to(np.full((1, 1), i * 23 % 200), (16, 16)),
                        np.broadcast_to(np.full((1, 1), i * 5 % 200), (16, 16)),
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(
                    MC.encode_jpeg(
                        px,
                        quality=90,
                        subsample=subs[i % 3],
                        restart_interval=2 if i % 5 == 0 else 0,
                        progressive=progressive,
                    )
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    from overseer_spark.operators.util import spread

    # spread the narrow id input first: synthesis + every downstream
    # mapInPandas stage inherit its partitioning, and a single-split
    # source would otherwise serialize all per-payload Python work
    return spread(df.select(id_col), id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def spread_by_payload_bytes(
    df: DataFrame,
    payload_col: str = "payload",
    target_partition_bytes: int = 256 * 1024 * 1024,
    min_partitions: int | None = None,
) -> DataFrame:
    """Byte-aware repartition before a decode stage: blob columns make
    ROW counts meaningless — 10k rows of 10 MB video is 100 GB in one
    task while 10k thumbnails is 40 MB — so partition count must come
    from ``sum(length(payload))``, not from row counts or input splits
    (a decode stage often follows a shuffle, where
    ``spark.sql.files.maxPartitionBytes`` no longer applies).

    One cheap aggregate (sum of lengths — column stats only, payload
    bytes never move for the measurement), then a round-robin
    repartition to ``ceil(total / target)`` partitions: every partition
    carries ≈ target bytes in expectation, so the Arrow transfer and the
    pandas batch stay memory-bounded regardless of blob-size drift. The
    floor is the session's default parallelism so small corpora still
    use every core. Single blobs larger than the target cannot be split
    (one row is the atom) — cap payload size at ingest."""
    spark = df.sparkSession
    row = df.agg(
        F.sum(F.length(F.col(payload_col))).alias("b"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    total = int(row["b"] or 0)
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    n_parts = max(min_partitions, -(-total // target_partition_bytes))
    return df.repartition(n_parts)
