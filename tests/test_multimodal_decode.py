"""Real netpbm pixel decode: exact encode->decode roundtrip, header
edge cases, resize/histogram feature stages, and the Arrow-batched
Spark path over synthesized genuine PPM binaries."""

from __future__ import annotations

import numpy as np
import pytest

from mbrainz_importer_spark.operators.multimodal import (
    decode_image_pixels,
    decode_netpbm,
    encode_ppm,
    resize_nearest,
    synth_ppm_assets,
)


def test_ppm_roundtrip_exact():
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    w, h, c, out = decode_netpbm(encode_ppm(px))
    assert (w, h, c) == (7, 5, 3)
    assert np.array_equal(out, px)


def test_pgm_and_comments():
    # P5 graymap with a header comment — real files from scanners have these
    data = b"P5\n# scanner frobnitz\n3 2\n255\n" + bytes(range(6))
    w, h, c, px = decode_netpbm(data)
    assert (w, h, c) == (3, 2, 1)
    assert px.ravel().tolist() == [0, 1, 2, 3, 4, 5]


def test_pbm_bitmap_rows_padded():
    # P4: 10 px wide -> 2 bytes/row; 1 bits are BLACK (intensity 0)
    data = b"P4\n10 2\n" + bytes([0b10000000, 0b01000000, 0xFF, 0xC0])
    w, h, c, px = decode_netpbm(data)
    assert (w, h, c) == (10, 2, 1)
    row0 = px[0, :, 0].tolist()
    assert row0[0] == 0 and row0[9] == 0 and set(row0[1:9]) == {255}
    assert px[1, :, 0].tolist() == [0] * 10


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="not a binary netpbm"):
        decode_netpbm(b"JFIF....")
    with pytest.raises(ValueError, match="truncated netpbm header"):
        decode_netpbm(b"P6\n4 4")
    with pytest.raises(ValueError, match="truncated pixel data"):
        decode_netpbm(b"P6\n4 4\n255\nxx")
    with pytest.raises(ValueError, match="maxval"):
        decode_netpbm(b"P5\n1 1\n65535\n\x00\x00")


def test_resize_nearest():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    small = resize_nearest(px, 2, 2)
    assert small[:, :, 0].tolist() == [[0, 2], [8, 10]]
    big = resize_nearest(px, 8, 8)
    assert big.shape == (8, 8, 1)
    assert big[0, 0, 0] == 0 and big[7, 7, 0] == 15


def test_spark_decode_path(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark decode")], "doc_id long, text string"
    )
    assets = synth_ppm_assets(docs, "doc_id", "text", width=4, height=4)
    raw = {r["asset_id"]: bytes(r["content"]) for r in assets.collect()}
    # the synthesized binaries are REAL ppm files
    assert all(v.startswith(b"P6\n4 4\n255\n") for v in raw.values())

    out = {r["asset_id"]: r for r in decode_image_pixels(assets).collect()}
    import hashlib
    for aid, text in [(1, "hello world"), (2, "spark decode")]:
        digest = hashlib.md5(text.encode()).digest()
        row = out[aid]
        assert (row["width"], row["height"], row["channels"]) == (4, 4, 3)
        assert row["n_pixels"] == 16
        assert row["min_px"] == min(digest) and row["max_px"] == max(digest)
        expect_mean = round(sum(digest) / 16, 6)
        assert row["mean_intensity"] == expect_mean
        assert sum(row["histogram"]) == 48  # every pixel byte lands in a bin


def test_non_decodable_mime_raises(spark):
    assets = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n..."), "image/png")],
        "asset_id long, content binary, mime string",
    )
    with pytest.raises(Exception, match="no decoder for mime|PythonException"):
        decode_image_pixels(assets).collect()


# -- WAV / PCM16 audio ------------------------------------------------------

def test_wav_roundtrip_and_features(spark):
    import numpy as np
    from mbrainz_importer_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    samples = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int16)
    rate, n_ch, back = decode_wav(encode_wav(samples, rate=16000))
    assert rate == 16000 and n_ch == 1
    assert np.array_equal(back, samples)

    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples, rate=16000)), "audio/wav")],
        "asset_id long, content binary, mime string",
    )
    row = audio_features(df).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["n_samples"] == 6
    assert row["peak"] == 32768
    assert abs(row["duration_s"] - 6 / 16000) < 1e-12
    expect_rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    assert abs(row["rms"] - round(expect_rms, 6)) < 1e-9


def test_wav_decode_rejects_garbage():
    import numpy as np
    import pytest
    from mbrainz_importer_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="expected 1-D or 2-D int16"):
        encode_wav(np.zeros((2, 2, 2), dtype=np.int16))
    with pytest.raises(ValueError, match="expected 1-D or 2-D int16"):
        encode_wav(np.zeros(4, dtype=np.int32))


def test_wav_tolerates_extra_chunks():
    import numpy as np
    import struct
    from mbrainz_importer_spark.operators.multimodal import decode_wav, encode_wav

    samples = np.arange(4, dtype=np.int16)
    wav = encode_wav(samples, rate=8000)
    # splice a LIST chunk between fmt and data (odd size -> word padding)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    spliced = wav[:fmt_end] + extra + wav[fmt_end:]
    rate, n_ch, back = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(back, samples)


def test_spectral_pattern_sums_are_fft_bins(spark):
    """The integer pattern dot products ARE |rfft(frame)[m]|^2 for
    m = 0, W/4, W/2 — the claim in audio_spectral_features' docstring."""
    import hashlib

    import numpy as np

    from mbrainz_importer_spark.operators import multimodal as M

    docs = spark.createDataFrame([(5, "spectral check")], "doc_id long, text string")
    assets = M.synth_wav_assets(docs, "doc_id", "text", n_samples=800, rate=8000)
    rows = {r["window_no"]: r for r in M.audio_spectral_features(assets, window=100).collect()}
    assert sorted(rows) == list(range(8))

    digest = hashlib.md5(b"spectral check").digest()
    samples = np.tile(np.frombuffer(digest, dtype="<i2"), 100).astype(np.int64)
    for k, r in rows.items():
        w = samples[k * 100:(k + 1) * 100]
        spec = np.abs(np.fft.rfft(w)) ** 2
        assert abs(r["e_dc"] - spec[0]) < 0.5
        assert abs(r["e_quarter"] - spec[25]) < 0.5
        assert abs(r["e_nyquist"] - spec[50]) < 0.5
        assert abs(r["rms"] - round(float(np.sqrt((w * w).mean())), 6)) < 1e-9
        assert r["zero_crossings"] == int((w[:-1] * w[1:] < 0).sum())


def test_spectral_window_validation(spark):
    import pytest

    from mbrainz_importer_spark.operators import multimodal as M

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assets = M.synth_wav_assets(docs, "doc_id", "text")
    with pytest.raises(ValueError, match="multiple of 4"):
        M.audio_spectral_features(assets, window=30)


def test_spectral_stereo_deinterleaves_per_channel(spark):
    """Interleaved stereo windows PER CHANNEL (never across channels —
    the round-4 advice bug class): each channel's rows equal the mono
    analysis of that channel's deinterleaved samples."""
    import numpy as np

    from mbrainz_importer_spark.operators import multimodal as M

    rng = np.random.default_rng(7)
    frames = rng.integers(-3000, 3000, size=(200, 2), dtype=np.int64)
    wav = M.encode_wav(frames.astype(np.int16), rate=8000)
    assets = spark.createDataFrame(
        [(1, bytearray(wav), "audio/wav")], M.ASSET_SCHEMA
    )
    rows = M.audio_spectral_features(assets, window=100).collect()
    assert sorted((r["channel"], r["window_no"]) for r in rows) == [
        (0, 0), (0, 1), (1, 0), (1, 1),
    ]
    for r in rows:
        w = frames[r["window_no"] * 100:(r["window_no"] + 1) * 100, r["channel"]]
        assert r["e_dc"] == int(w.sum()) ** 2
        assert r["zero_crossings"] == int((w[:-1] * w[1:] < 0).sum())
        assert abs(r["rms"] - M.round_away(float(np.sqrt((w * w).mean())))) < 1e-12


def test_spectral_rejects_malformed_interleave(spark):
    """A data chunk whose sample count isn't divisible by n_channels is
    malformed — raise, don't window a ragged deinterleave."""
    import struct

    import numpy as np
    import pytest

    from mbrainz_importer_spark.operators import multimodal as M

    samples = np.arange(201, dtype=np.int16)  # odd count, 2 channels
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 2, 8000, 8000 * 4, 4, 16,
        b"data", len(data),
    )
    assets = spark.createDataFrame(
        [(1, bytearray(hdr + data), "audio/wav")], M.ASSET_SCHEMA
    )
    with pytest.raises(Exception, match="not divisible"):
        M.audio_spectral_features(assets, window=100).collect()


def test_round_away_matches_sql_round():
    """round_away is half-away-from-zero (SQL ROUND), not banker's."""
    from mbrainz_importer_spark.operators.multimodal import round_away

    assert round_away(0.0000005) == 0.000001      # builtin round gives 0.0
    assert round_away(-0.0000005) == -0.000001
    assert round_away(1.2345675) == 1.234568
    assert round_away(2.5, 0) == 3.0
    assert round_away(-2.5, 0) == -3.0
    assert round_away(1.23, 6) == 1.23
