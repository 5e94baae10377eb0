"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas transforms.

The Spark-side contract is real and tested — schema, partitioning, UDF
signatures, batch shapes. Pixel decode is REAL for the netpbm family
(P4 bitmap / P5 graymap / P6 pixmap — genuine image formats with a
pure-numpy wire format, no codec library required): `decode_netpbm`
parses the header (incl. comments) and `decode_image_pixels` runs it
Arrow-batched over the binary column, with nearest-neighbor resize and
histogram feature extraction as numpy post-stages. Audio decode is REAL
for RIFF/WAVE PCM16 (`decode_wav`), and video decode is REAL for
concatenated-PNM streams (`decode_pnm_video` — multi-image netpbm, the
layout `pnmsplit` reads). Formats that DO need an external codec
(JPEG/PNG/ffmpeg-compressed audio+video) remain gated behind the PIL
import probe: absent in this container, `decode_image_pixels` raises
for them with a clear message rather than faking pixels — swapping in
the codec changes only the decode body, never the distributed plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), False),
    T.StructField("mime", T.StringType(), True),
])

META_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("content_md5", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

try:  # real codec gate — absent in this container by design
    from PIL import Image  # noqa: F401

    _HAS_CODEC = True
except ImportError:
    _HAS_CODEC = False


def text_as_assets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo feed: treat utf-8 text bytes as opaque binary assets. In
    production this is `spark.read.format('binaryFile')` or a parquet
    table with a binary column."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_dims(digest: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded image dimensions."""
    return 16 + int(digest[:4], 16) % 2048, 16 + int(digest[4:8], 16) % 2048


def decode_image_meta(assets: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary content. The pandas
    iterator shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) is
    the real production plumbing; only the decode body is stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["content"].map(lambda b: hashlib.md5(b).hexdigest())
            dims = digests.map(_fake_dims)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "byte_len": pdf["content"].map(len).astype("int64"),
                "content_md5": digests,
                "width": dims.map(lambda t: t[0]).astype("int32"),
                "height": dims.map(lambda t: t[1]).astype("int32"),
            })

    return assets.mapInPandas(run, schema=META_SCHEMA)


# ---------------------------------------------------------------------------
# netpbm decode — a REAL image wire format, parsed with numpy alone
# ---------------------------------------------------------------------------

NETPBM_MIMES = {
    "image/x-portable-bitmap": "P4",
    "image/x-portable-graymap": "P5",
    "image/x-portable-pixmap": "P6",
}


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 array as a binary PPM (P6)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _decode_netpbm_at(data: bytes, base: int) -> tuple[int, int, int, np.ndarray, int]:
    """Parse one binary netpbm image starting at byte offset `base`;
    returns (width, height, channels, pixels, end_offset). The explicit
    end offset is what lets a concatenated-PNM stream (the multi-image
    format `pnmsplit` reads — our raw-video container) be walked
    image-by-image. Raises ValueError on malformed input."""
    if len(data) - base < 2 or data[base:base + 1] != b"P" or data[base + 1:base + 2] not in b"456":
        raise ValueError(f"not a binary netpbm image at offset {base}: {data[base:base + 8]!r}")
    magic = data[base:base + 2].decode()

    # header tokenizer: whitespace-separated ints, '#' comments to EOL
    pos = base + 2
    tokens: list[int] = []
    need = 2 if magic == "P4" else 3  # P4 has no maxval
    while len(tokens) < need:
        if pos >= len(data):
            raise ValueError("truncated netpbm header")
        c = data[pos:pos + 1]
        if c == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated netpbm comment")
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end:end + 1].isspace():
                end += 1
            tok = data[pos:end]
            if not tok.isdigit():
                raise ValueError(f"bad netpbm header token {tok!r}")
            tokens.append(int(tok))
            pos = end
    pos += 1  # single whitespace after the last header token
    w, h = tokens[0], tokens[1]
    if magic != "P4" and tokens[2] != 255:
        raise ValueError(f"only maxval 255 supported, got {tokens[2]}")

    if magic == "P4":  # 1 bit/pixel, rows padded to whole bytes
        row_bytes = (w + 7) // 8
        n = h * row_bytes
        if len(data) - pos < n:
            raise ValueError(f"truncated pixel data: want {n}, have {len(data) - pos}")
        raw = np.frombuffer(data, np.uint8, count=n, offset=pos)
        bits = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w]
        # PBM: 1 = black; normalize to intensity (0/255, white=255)
        return w, h, 1, ((1 - bits) * 255).astype(np.uint8)[..., None], pos + n
    channels = 1 if magic == "P5" else 3
    n = w * h * channels
    if len(data) - pos < n:
        raise ValueError(f"truncated pixel data: want {n}, have {len(data) - pos}")
    px = np.frombuffer(data, np.uint8, count=n, offset=pos)
    return w, h, channels, px.reshape(h, w, channels), pos + n


def decode_netpbm(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Parse a binary netpbm image (P4/P5/P6, comments allowed) into
    (width, height, channels, pixels[h, w, c] uint8). Raises ValueError
    on malformed input — never fabricates pixels."""
    w, h, c, px, _ = _decode_netpbm_at(data, 0)
    return w, h, c, px


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (the standard
    thumbnail/normalize step before feature extraction)."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return pixels[rows][:, cols]


PIXEL_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("channels", T.IntegerType(), False),
    T.StructField("n_pixels", T.LongType(), False),
    T.StructField("mean_intensity", T.DoubleType(), False),
    T.StructField("min_px", T.IntegerType(), False),
    T.StructField("max_px", T.IntegerType(), False),
    T.StructField("histogram", T.ArrayType(T.LongType()), False),
])


def decode_image_pixels(assets: DataFrame, hist_bins: int = 8) -> DataFrame:
    """REAL pixel decode over the binary column, Arrow-batched: netpbm
    natively via numpy; other formats via PIL when present, else a clear
    NotImplementedError (no fabricated pixels). Emits per-asset decoded
    stats + a channel-agnostic intensity histogram (the feature-extract
    stage of a training-data pipeline)."""
    if hist_bins & (hist_bins - 1) or not 0 < hist_bins <= 256:
        raise ValueError(f"hist_bins must be a power of two <= 256: {hist_bins}")

    def decode_one(content: bytes, mime: str) -> tuple:
        if content[:2] in (b"P4", b"P5", b"P6"):
            w, h, c, px = decode_netpbm(content)
        elif _HAS_CODEC:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(content))
            arr = np.asarray(img, dtype=np.uint8)
            h, w = arr.shape[:2]
            c = 1 if arr.ndim == 2 else arr.shape[2]
            px = arr.reshape(h, w, c)
        else:
            raise NotImplementedError(
                f"no decoder for mime {mime!r} (netpbm decodes natively; "
                "other formats need PIL, absent in this container)"
            )
        flat = px.astype(np.int64).ravel()
        hist = np.bincount(flat >> (8 - hist_bins.bit_length() + 1), minlength=hist_bins)
        return (w, h, c, w * h, float(flat.mean()), int(flat.min()),
                int(flat.max()), hist.tolist())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_one(b, m) for b, m in zip(pdf["content"], pdf["mime"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": np.array([d[0] for d in decoded], np.int32),
                "height": np.array([d[1] for d in decoded], np.int32),
                "channels": np.array([d[2] for d in decoded], np.int32),
                "n_pixels": np.array([d[3] for d in decoded], np.int64),
                "mean_intensity": [round(d[4], 6) for d in decoded],
                "min_px": np.array([d[5] for d in decoded], np.int32),
                "max_px": np.array([d[6] for d in decoded], np.int32),
                "histogram": [d[7] for d in decoded],
            })

    return assets.mapInPandas(run, schema=PIXEL_SCHEMA)


def synth_ppm_assets(
    df: DataFrame, id_col: str, text_col: str, width: int = 4, height: int = 4
) -> DataFrame:
    """Deterministic REAL image corpus: for each row, a binary PPM whose
    pixel bytes are the md5 digest of the text, cycled to fill w*h*3.
    The images are genuine PPM files (any viewer opens them); the
    construction is reproducible from the text alone, which is what lets
    the DuckDB oracle compute the expected decoded stats independently."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height * 3
        for pdf in batches:
            contents = []
            for text in pdf[text_col]:
                digest = hashlib.md5(text.encode("utf-8")).digest()
                reps = -(-n // len(digest))  # ceil
                px = np.frombuffer((digest * reps)[:n], np.uint8)
                contents.append(encode_ppm(px.reshape(height, width, 3)))
            yield pd.DataFrame({
                "asset_id": pdf[id_col].astype("int64"),
                "content": contents,
                "mime": "image/x-portable-pixmap",
            })

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=ASSET_SCHEMA
    )


# ---------------------------------------------------------------------------
# WAV / PCM16 audio — a REAL audio wire format, parsed with the stdlib +
# numpy alone (RIFF chunks; like netpbm for images, no codec needed)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), False),
    T.StructField("n_channels", T.IntegerType(), False),
    T.StructField("n_samples", T.LongType(), False),
    T.StructField("duration_s", T.DoubleType(), False),
    T.StructField("peak", T.IntegerType(), False),
    T.StructField("rms", T.DoubleType(), False),
])


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Serialize int16 samples as a canonical RIFF/WAVE PCM file.
    1-D is mono; 2-D (n_frames, n_channels) is interleaved frame-major —
    the standard WAV channel layout."""
    import struct

    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError(
            f"expected 1-D or 2-D int16, got {samples.shape} {samples.dtype}"
        )
    n_ch = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.astype("<i2").reshape(-1).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse RIFF/WAVE PCM16: walks chunks (so extra LIST/INFO chunks are
    tolerated), returns (rate, n_channels, samples int16)."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, sz = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, pos)
        elif cid == b"data":
            raw = data[pos:pos + sz]
        pos += sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported: format={audio_format} bits={bits}")
    samples = np.frombuffer(raw, dtype="<i2")
    return rate, n_ch, samples


def round_away(x: float, ndigits: int = 6) -> float:
    """Half-away-from-zero rounding, matching SQL/DuckDB ROUND().
    Python's builtin round() is banker's (half-to-even), which would
    diverge from the oracle on an exact tie at the last kept digit."""
    import math

    scale = 10.0 ** ndigits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def synth_wav_assets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_samples: int = 800,
    rate: int = 8000,
) -> DataFrame:
    """Deterministic REAL audio corpus: the text's md5 digest read as 8
    little-endian int16 samples, cycled to `n_samples`, wrapped in a
    genuine WAV container. n_samples is a multiple of 8, so per-file
    stats over all samples equal stats over the 8 digest values — which
    is what lets the DuckDB oracle recompute them from md5(text) alone."""
    if n_samples % 8 != 0:
        raise ValueError("n_samples must be a multiple of 8 (digest cycle)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for text in pdf[text_col]:
                digest = hashlib.md5(text.encode("utf-8")).digest()
                base = np.frombuffer(digest, dtype="<i2")
                samples = np.tile(base, n_samples // 8)
                contents.append(encode_wav(samples, rate))
            yield pd.DataFrame({
                "asset_id": pdf[id_col].astype("int64"),
                "content": contents,
                "mime": "audio/wav",
            })

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=ASSET_SCHEMA
    )


def synth_stereo_wav_assets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_frames: int = 800,
    rate: int = 8000,
) -> DataFrame:
    """Deterministic REAL stereo corpus: channel 0 is md5(text) read as
    8 LE int16s cycled to `n_frames`, channel 1 is md5(text + ':R')
    likewise; the two are interleaved frame-major into a genuine 2-channel
    WAV. Each deinterleaved channel is its digest cycled, so the DuckDB
    oracle recomputes per-channel windows from the two md5s alone."""
    if n_frames % 8 != 0:
        raise ValueError("n_frames must be a multiple of 8 (digest cycle)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for text in pdf[text_col]:
                chans = []
                for suffix in ("", ":R"):
                    digest = hashlib.md5(
                        (text + suffix).encode("utf-8")
                    ).digest()
                    base = np.frombuffer(digest, dtype="<i2")
                    chans.append(np.tile(base, n_frames // 8))
                contents.append(encode_wav(np.stack(chans, axis=1), rate))
            yield pd.DataFrame({
                "asset_id": pdf[id_col].astype("int64"),
                "content": contents,
                "mime": "audio/wav",
            })

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=ASSET_SCHEMA
    )


def audio_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched WAV decode + feature extraction: duration, peak
    (max |sample|), RMS — the audio analog of decode_image_pixels, with
    the same production plumbing (mapInPandas over the binary column).
    Integer sums stay exact in float64, so rms is engine-reproducible."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                rate, n_ch, s = decode_wav(bytes(content))
                x = s.astype(np.float64)
                rows.append((
                    int(asset_id), int(rate), int(n_ch), len(s),
                    len(s) / rate / n_ch,
                    int(np.max(np.abs(x))) if len(s) else 0,
                    round_away(float(np.sqrt(np.mean(x * x)))) if len(s) else 0.0,
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_channels", "n_samples",
                    "duration_s", "peak", "rms",
                ],
            )

    return assets.mapInPandas(run, schema=AUDIO_SCHEMA)


SPECTRAL_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("channel", T.IntegerType(), False),
    T.StructField("window_no", T.IntegerType(), False),
    T.StructField("rms", T.DoubleType(), False),
    T.StructField("zero_crossings", T.IntegerType(), False),
    T.StructField("e_dc", T.LongType(), False),
    T.StructField("e_quarter", T.LongType(), False),
    T.StructField("e_nyquist", T.LongType(), False),
])


def audio_spectral_features(assets: DataFrame, window: int = 100) -> DataFrame:
    """Windowed spectral analysis over decoded WAV samples — real
    per-window array math in the Arrow path: for each `window`-sample
    frame, RMS, zero-crossing count, and the DFT-bin energies at
    m = 0 (DC), W/4 (quarter band) and W/2 (Nyquist). Those three bins
    have integer basis vectors (cos/sin at phase 0, pi/2, pi), so the
    energies are computed as EXACT integer pattern dot products — they
    equal |np.fft.rfft(frame)[m]|^2 (asserted in tests) while staying
    engine-reproducible to the bit, which is what lets the DuckDB oracle
    recompute them with integer SQL. Trailing samples short of a full
    window are dropped (standard frame analysis).

    Multi-channel streams are DEINTERLEAVED (frame-major WAV layout):
    each channel's samples are windowed independently and rows carry a
    `channel` column — never windowed across interleaved channels, which
    would mix them (the r4 advice bug class; mono was the r5 floor,
    per-channel is the production behavior). A data chunk whose sample
    count isn't a multiple of n_channels is malformed and raises."""
    if window % 4 != 0:
        raise ValueError(f"window must be a multiple of 4: {window}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                _, n_ch, s = decode_wav(bytes(content))
                if n_ch < 1 or len(s) % n_ch:
                    raise ValueError(
                        f"malformed WAV for asset {asset_id}: {len(s)} "
                        f"samples not divisible by {n_ch} channels"
                    )
                for ch in range(n_ch):
                    x = s[ch::n_ch].astype(np.int64)
                    for k in range(len(x) // window):
                        w = x[k * window:(k + 1) * window]
                        re_q = int(w[0::4].sum() - w[2::4].sum())
                        im_q = int(w[1::4].sum() - w[3::4].sum())
                        nyq = int(w[0::2].sum() - w[1::2].sum())
                        rows.append((
                            int(asset_id), ch, k,
                            round_away(float(np.sqrt((w * w).mean()))),
                            int((w[:-1] * w[1:] < 0).sum()),
                            int(w.sum()) ** 2,
                            re_q * re_q + im_q * im_q,
                            nyq * nyq,
                        ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "channel", "window_no", "rms",
                    "zero_crossings", "e_dc", "e_quarter", "e_nyquist",
                ],
            )

    return assets.mapInPandas(run, schema=SPECTRAL_SCHEMA)


# ---------------------------------------------------------------------------
# raw video — a concatenated-PNM stream (the multi-image netpbm format:
# frames back-to-back, each self-describing; `pnmsplit` reads the same
# layout). REAL decode: frame offsets come from walking the headers.
# ---------------------------------------------------------------------------

VIDEO_MIME = "video/x-portable-anymap-stream"

FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("frame_no", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("channels", T.IntegerType(), False),
    T.StructField("mean_intensity", T.DoubleType(), False),
    T.StructField("min_px", T.IntegerType(), False),
    T.StructField("max_px", T.IntegerType(), False),
])


def encode_pnm_video(frames: list[np.ndarray]) -> bytes:
    """Serialize (h, w, 3) uint8 frames as a concatenated-PNM stream."""
    if not frames:
        raise ValueError("a video needs at least one frame")
    return b"".join(encode_ppm(f) for f in frames)


def decode_pnm_video(data: bytes) -> list[tuple[int, int, int, np.ndarray]]:
    """Walk a concatenated-PNM stream into its frames
    [(width, height, channels, pixels), ...]. Every byte must belong to
    a well-formed frame — truncation or trailing garbage raises
    ValueError rather than yielding a partial read."""
    if not data:
        raise ValueError("empty video stream")
    frames, pos = [], 0
    while pos < len(data):
        w, h, c, px, pos = _decode_netpbm_at(data, pos)
        frames.append((w, h, c, px))
    return frames


def synth_pnm_video_assets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_frames: int = 6,
    width: int = 4,
    height: int = 4,
) -> DataFrame:
    """Deterministic REAL video corpus: frame k's pixel bytes are the
    md5 digest of '{text}:{k}' cycled to w*h*3, each frame a genuine P6
    image, the stream their concatenation. Reproducible from the text
    alone, so the DuckDB oracle recomputes per-frame stats from
    md5(text || ':' || k) independently."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height * 3
        for pdf in batches:
            contents = []
            for text in pdf[text_col]:
                frames = []
                for k in range(n_frames):
                    digest = hashlib.md5(f"{text}:{k}".encode("utf-8")).digest()
                    reps = -(-n // len(digest))  # ceil
                    px = np.frombuffer((digest * reps)[:n], np.uint8)
                    frames.append(px.reshape(height, width, 3).copy())
                contents.append(encode_pnm_video(frames))
            yield pd.DataFrame({
                "asset_id": pdf[id_col].astype("int64"),
                "content": contents,
                "mime": VIDEO_MIME,
            })

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=ASSET_SCHEMA
    )


def video_frame_features(assets: DataFrame, sample_every: int = 2) -> DataFrame:
    """REAL video frame sampling + per-frame feature extraction,
    Arrow-batched: decode the concatenated-PNM stream, keep frames
    0, sample_every, 2*sample_every, ... (the stride sampling a
    training pipeline uses to bound frames per clip), and emit one row
    per sampled frame with decoded pixel stats. PNM headers are
    self-describing, so finding offsets is the sequential header walk —
    linear in container bytes, the same asymptotics as any demuxer's
    packet scan; the parallelism axis is assets, which is what
    mapInPandas partitions."""
    if sample_every < 1:
        raise ValueError(f"sample_every must be >= 1: {sample_every}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                frames = decode_pnm_video(bytes(content))
                for k in range(0, len(frames), sample_every):
                    w, h, c, px = frames[k]
                    flat = px.astype(np.int64).ravel()
                    rows.append((
                        int(asset_id), k, len(frames), w, h, c,
                        round(float(flat.mean()), 6),
                        int(flat.min()), int(flat.max()),
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_no", "n_frames", "width", "height",
                    "channels", "mean_intensity", "min_px", "max_px",
                ],
            )

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)
