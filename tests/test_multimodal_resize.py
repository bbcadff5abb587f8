"""Pixel/sample-level exactness of the resize codecs.

The multimodal_resize oracle hash-checks the STRUCTURE (dims, byte
sizes, rates) in closed form; these tests pin the content: nearest-
neighbor keeps exactly every 2nd pixel/sample, round-tripped through
real containers.
"""

from __future__ import annotations

import numpy as np

from nchu_bigdata_spark.operators.multimodal import (
    _bmp_pixels,
    _wav_pcm,
    encode_bmp,
    resize_audio,
    resize_image,
)


def test_bmp_resize_keeps_every_second_pixel():
    rng = np.random.default_rng(20260813)
    px = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    blob = encode_bmp(px.tobytes(), width=4)
    assert (_bmp_pixels(blob) == px).all()  # encode/decode round-trip
    small = _bmp_pixels(resize_image(blob))
    assert small.shape == (3, 2, 3)
    assert (small == px[::2, ::2]).all()


def test_bmp_resize_odd_dims_and_single_row():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    small = _bmp_pixels(resize_image(encode_bmp(px.tobytes(), width=3)))
    assert small.shape == (3, 2, 3)
    assert (small == px[::2, ::2]).all()
    one = rng.integers(0, 256, size=(1, 3, 3), dtype=np.uint8)
    tiny = _bmp_pixels(resize_image(encode_bmp(one.tobytes(), width=3)))
    assert tiny.shape == (1, 2, 3)
    assert (tiny == one[:, ::2]).all()


def test_bmp_resize_arbitrary_shapes_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=12),
        w=st.integers(min_value=1, max_value=9),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def prop(h, w, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        small = _bmp_pixels(resize_image(encode_bmp(px.tobytes(), width=w)))
        assert small.shape == ((h + 1) // 2, (w + 1) // 2, 3)
        assert (small == px[::2, ::2]).all()

    prop()


def test_wav_resize_arbitrary_lengths_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nchu_bigdata_spark.operators.multimodal import _encode_wav_pcm

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=500),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def prop(n, seed):
        samples = (
            np.random.default_rng(seed)
            .integers(-(2**15), 2**15, size=n)
            .astype(np.int16)
        )
        pcm, sr, _ = _wav_pcm(resize_audio(_encode_wav_pcm(samples, 8000)))
        assert sr == 4000
        assert (pcm == samples[::2]).all()

    prop()


def test_wav_resize_decimates_and_halves_rate():
    from nchu_bigdata_spark.operators.multimodal import _encode_wav_pcm

    samples = np.arange(-5000, 5000, 997, dtype=np.int16)
    blob = _encode_wav_pcm(samples, 8000)
    pcm, sr, n_ch = _wav_pcm(resize_audio(blob))
    assert (sr, n_ch) == (4000, 1)
    assert (pcm == samples[::2]).all()
