"""Property tests for the stdlib media codecs (hypothesis): encode →
decode must round-trip dimensions and exact pixel/sample moments for
ARBITRARY payload bytes, not just the fixtures the unit tests pin.
Pure-Python — no SparkSession, so hypothesis example counts are cheap."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from nchu_bigdata_spark.operators import multimodal
from nchu_bigdata_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_bmp,
    encode_wav,
)


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=2048),
    width=st.integers(min_value=1, max_value=32),
)
def test_bmp_roundtrip_property(data, width):
    blob = encode_bmp(data, width=width)
    feats = decode_image(blob)
    src = data or b"\x00"  # encoder substitutes one black pixel byte
    row_px = width * 3
    n_rows = max(1, len(src) // row_px)
    need = n_rows * row_px
    px = (src * (need // len(src) + 1))[:need]
    ref = np.frombuffer(px, dtype=np.uint8)
    assert feats["width"] == width
    assert feats["height"] == n_rows
    assert feats["n_samples"] == n_rows * width
    # exact contract: the decoder's moments ARE _int_moments of the
    # tiled bytes (bit-for-bit — this is what the closed-form DuckDB
    # oracle replays); numpy's two-pass moments agree to float noise.
    mean, std = multimodal._int_moments(ref)
    assert feats["feat_mean"] == mean
    assert feats["feat_std"] == std
    assert feats["feat_mean"] == pytest.approx(ref.astype(np.float64).mean())
    assert feats["feat_std"] == pytest.approx(
        ref.astype(np.float64).std(), abs=1e-9
    )


@settings(max_examples=200, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_wav_roundtrip_property(data):
    blob = encode_wav(data)
    feats = decode_audio(blob)
    src = data or b"\x80"  # encoder substitutes one centered sample
    ref = (np.frombuffer(src, dtype=np.uint8).astype(np.int64) - 128) << 8
    assert feats["sample_rate"] == 8000
    assert feats["n_samples"] == len(src)
    mean, std = multimodal._int_moments(ref)
    assert feats["feat_mean"] == mean
    assert feats["feat_std"] == std
    assert feats["feat_mean"] == pytest.approx(ref.astype(np.float64).mean())
    assert feats["feat_std"] == pytest.approx(
        ref.astype(np.float64).std(), abs=1e-6
    )


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=1, max_size=512))
def test_bmp_is_parseable_container(data):
    """The emitted blob is a structurally valid BMP: magic, declared
    file size == actual, pixel offset in range."""
    import struct

    blob = encode_bmp(data)
    assert blob[:2] == b"BM"
    file_sz, _, _, px_off = struct.unpack_from("<IHHI", blob, 2)
    assert file_sz == len(blob)
    assert 54 <= px_off < len(blob)
