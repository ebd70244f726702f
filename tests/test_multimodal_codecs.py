"""The real-decoder extension path (VERDICT r10 #4): the pure-stdlib
PPM/WAV codecs in ``functions/codecs.py``, registered via
``register_decoder`` and driven through ``extract_features(fake=False)``
— proving the one formerly-documentation-only integration point by
execution. Expected values are recomputed with numpy using the same
arithmetic (integer-exact counts, one float64 mean), so comparisons are
exact, not approximate."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import types as T

from datapipeline_gcp_spark.functions import codecs, multimodal


# ---------------------------------------------------------------------------
# Codec units: deterministic round-trips + malformed-input contracts
# ---------------------------------------------------------------------------


def _ppm_pixels(h: int, w: int) -> np.ndarray:
    return (np.arange(h * w * 3, dtype=np.int64) * 7 % 256).astype(
        np.uint8
    ).reshape(h, w, 3)


def test_ppm_roundtrip_is_identity():
    img = _ppm_pixels(5, 9)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _ppm_pixels(2, 3)
    raw = b"P6 # a comment\n# another\n 3\t2 # dims\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_ppm(raw), img)


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n2 2\n255\n" + b"\x00" * 12,  # wrong magic (PGM)
        b"P6\n2 2\n65535\n" + b"\x00" * 24,  # 2-byte samples unsupported
        b"P6\n2 2\n255\n\x00\x01",  # truncated raster
        b"P6\n2",  # truncated header
        b"",  # empty
    ],
)
def test_ppm_malformed_raises_valueerror(payload):
    with pytest.raises(ValueError):
        codecs.decode_ppm(payload)


def test_wav_roundtrip_is_identity():
    samples = (
        (np.arange(400, dtype=np.int64) * 523 % 65536) - 32768
    ).astype(np.int16).reshape(-1, 2)
    got = codecs.decode_wav(codecs.encode_wav(samples))
    assert got.dtype == np.int16 and np.array_equal(got, samples)


def test_wav_malformed_raises_valueerror():
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFgarbage-not-a-wav")


# ---------------------------------------------------------------------------
# The fake=False path through extract_features (Arrow-batched worker,
# by-value-pickled codecs — no package install on workers)
# ---------------------------------------------------------------------------


def _assets_df(spark, rows):
    return spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)


@pytest.fixture()
def registered_codecs():
    multimodal.register_decoder("image", codecs.decode_ppm)
    multimodal.register_decoder("audio", codecs.decode_wav)
    yield
    multimodal._DECODERS.pop("image", None)
    multimodal._DECODERS.pop("audio", None)


def _expected(buf: np.ndarray) -> dict:
    info = np.iinfo(buf.dtype)
    flat = buf.reshape(-1)
    hist = np.histogram(flat, bins=8, range=(info.min, info.max + 1))[0]
    return {
        "byte_len": flat.size,
        "mean_byte": float(flat.astype(np.float64).mean()),
        "max_byte": int(flat.max()),
        "feature": (hist / flat.size).tolist(),
    }


def test_extract_features_decodes_real_payloads(spark, registered_codecs):
    img1, img2 = _ppm_pixels(4, 6), _ppm_pixels(3, 3)
    wav = ((np.arange(300, dtype=np.int64) * 911 % 65536) - 32768).astype(
        np.int16
    )
    rows = [
        (1, "image", bytearray(codecs.encode_ppm(img1)), ("s", 1, None)),
        (2, "image", bytearray(codecs.encode_ppm(img2)), ("s", 2, None)),
        (3, "audio", bytearray(codecs.encode_wav(wav)), ("s", 3, None)),
        (4, "image", None, ("s", 4, None)),  # absent object: skipped
    ]
    got = {
        r.asset_id: r
        for r in multimodal.extract_features(
            _assets_df(spark, rows), fake=False
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    for aid, buf in ((1, img1), (2, img2), (3, wav)):
        want = _expected(buf)
        assert got[aid].byte_len == want["byte_len"], aid
        assert got[aid].mean_byte == want["mean_byte"], aid
        assert got[aid].max_byte == want["max_byte"], aid
        assert got[aid].feature == want["feature"], aid
    # decoded samples, not payload bytes: the PPM header is NOT counted
    assert got[1].byte_len == 4 * 6 * 3 < len(codecs.encode_ppm(img1))
    # int16 domain histogram really used the int16 range
    assert got[3].max_byte > 255 or got[3].mean_byte < 0


def test_fake_false_without_decoder_raises(spark, registered_codecs):
    rows = [(9, "video", bytearray(b"\x00" * 64), ("s", 9, None))]
    with pytest.raises(Exception, match="no real decoder registered"):
        multimodal.extract_features(
            _assets_df(spark, rows), fake=False
        ).collect()


def test_fake_false_with_empty_registry_raises(spark):
    assert "image" not in multimodal._DECODERS
    with pytest.raises(NotImplementedError, match="register_decoder"):
        multimodal.extract_features(
            _assets_df(spark, []), fake=False
        )


def test_decode_payload_routes_through_registry(registered_codecs):
    img = _ppm_pixels(2, 2)
    out = multimodal.decode_payload(
        "image", codecs.encode_ppm(img), fake=False
    )
    assert np.array_equal(out, img)
    with pytest.raises(NotImplementedError):
        multimodal.decode_payload("video", b"x", fake=False)


# ---------------------------------------------------------------------------
# ADVICE r11 hardening: float-returning decoders (soundfile-style) and
# malformed-WAV frame geometry
# ---------------------------------------------------------------------------


def test_wav_truncated_midframe_raises_descriptive_valueerror():
    """A stereo int16 payload chopped mid-frame must raise the same
    descriptive ValueError as header-parse failures, not a bare numpy
    reshape error."""
    samples = (
        (np.arange(64, dtype=np.int64) * 37 % 65536) - 32768
    ).astype(np.int16).reshape(-1, 2)
    raw = codecs.encode_wav(samples)
    with pytest.raises(ValueError, match="not a PCM WAV"):
        codecs.decode_wav(raw[:-3])  # 3 bytes short: not frame-aligned


def test_wav_zero_channels_raises_valueerror():
    """A handcrafted fmt chunk reporting 0 channels must surface as the
    documented ValueError (whether the stdlib wave module or our guard
    catches it first)."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 0, 16_000, 0, 0, 16)  # nchannels=0
    data = b"\x00\x00" * 8
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        codecs.decode_wav(raw)


def test_extract_features_float_decoder(spark):
    """ADVICE r11 (medium): a float-returning decoder (soundfile yields
    float64 by default) must not crash on np.iinfo — the histogram bins
    over the observed min/max instead."""
    arr = np.linspace(-1.0, 1.0, 400, dtype=np.float64)

    def decode_float(payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.float64)

    multimodal.register_decoder("fsig", decode_float)
    try:
        rows = [(1, "fsig", bytearray(arr.tobytes()), ("s", 1, None))]
        got = multimodal.extract_features(
            _assets_df(spark, rows), fake=False
        ).collect()
    finally:
        multimodal._DECODERS.pop("fsig", None)
    assert len(got) == 1
    r = got[0]
    assert r.byte_len == 400
    assert abs(r.mean_byte - float(arr.mean())) < 1e-12
    # ADVICE r12: max_byte is NULL for float decoders — int(max) of
    # audio in [-1, 1] truncated to a meaningless 0
    assert r.max_byte is None
    # observed-range histogram: linspace is uniform → 8 equal bins
    assert len(r.feature) == 8
    assert abs(sum(r.feature) - 1.0) < 1e-12
    assert all(abs(f - 0.125) < 0.01 for f in r.feature)


def test_extract_features_constant_float_buffer(spark):
    """Degenerate constant float buffer: observed range has zero width —
    the epsilon widening must keep histogram() finite (all mass in the
    first bin), not divide by zero."""

    def decode_const(payload: bytes) -> np.ndarray:
        return np.full(16, 0.5, dtype=np.float32)

    multimodal.register_decoder("fconst", decode_const)
    try:
        rows = [(1, "fconst", bytearray(b"\x01"), ("s", 1, None))]
        got = multimodal.extract_features(
            _assets_df(spark, rows), fake=False
        ).collect()
    finally:
        multimodal._DECODERS.pop("fconst", None)
    assert got[0].feature[0] == 1.0 and sum(got[0].feature) == 1.0


def test_extract_features_nonnumeric_decoder_raises(spark):
    """A decoder returning a non-numeric dtype must raise the documented
    ValueError naming the dtype, not a confusing downstream error."""

    def decode_str(payload: bytes) -> np.ndarray:
        return np.array(["a", "b"])

    multimodal.register_decoder("sstr", decode_str)
    try:
        rows = [(1, "sstr", bytearray(b"\x01"), ("s", 1, None))]
        with pytest.raises(Exception, match="unsupported\\s+dtype"):
            multimodal.extract_features(
                _assets_df(spark, rows), fake=False
            ).collect()
    finally:
        multimodal._DECODERS.pop("sstr", None)


def test_extract_features_nonfinite_float_samples_survive(spark):
    """Code-review r12: a corrupt asset decoding to NaN/inf samples must
    not kill the query — finite samples are binned, an all-non-finite
    buffer degrades to NULL stats like an empty one."""

    def decode_mixed(payload: bytes) -> np.ndarray:
        return np.array([0.0, 1.0, np.nan, np.inf, 0.5], dtype=np.float64)

    def decode_allbad(payload: bytes) -> np.ndarray:
        return np.array([np.nan, np.inf, -np.inf], dtype=np.float64)

    multimodal.register_decoder("fmix", decode_mixed)
    multimodal.register_decoder("fbad", decode_allbad)
    try:
        rows = [
            (1, "fmix", bytearray(b"\x01"), ("s", 1, None)),
            (2, "fbad", bytearray(b"\x02"), ("s", 2, None)),
        ]
        got = {
            r.asset_id: r
            for r in multimodal.extract_features(
                _assets_df(spark, rows), fake=False
            ).collect()
        }
    finally:
        multimodal._DECODERS.pop("fmix", None)
        multimodal._DECODERS.pop("fbad", None)
    # ADVICE r12 convention: byte_len counts every DECODED sample
    # (including the non-finite ones the stats exclude); the stats
    # cover the finite subset; max_byte is NULL for float decoders
    assert got[1].byte_len == 5
    assert abs(got[1].mean_byte - (0.0 + 1.0 + 0.5) / 3) < 1e-12
    assert got[1].max_byte is None
    assert abs(sum(got[1].feature) - 1.0) < 1e-12
    assert got[2].byte_len == 3 and got[2].mean_byte is None
    assert got[2].max_byte is None
    assert got[2].feature is None
