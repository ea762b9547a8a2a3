"""The stdlib GIF codec must round-trip multi-frame grayscale
animations through real LZW (variable-width codes, dictionary clears),
skip extensions per spec, and reject what it does not support."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grpc_map_reduce_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _frame(w: int, h: int, seed: int) -> bytes:
    return bytes((seed * 31 + 7 * i + (i * i) % 97) & 0xFF for i in range(w * h))


def test_multi_frame_round_trip():
    w, h = 11, 6
    frames = [_frame(w, h, s) for s in range(4)]
    assert decode_gif(encode_gif(w, h, frames)) == (w, h, frames)


def test_dictionary_clear_path():
    # >4096 dict entries forces a mid-stream CLEAR + reset
    w = h = 200
    fr = bytes((i * 7 + (i >> 3)) & 0xFF for i in range(w * h))
    assert decode_gif(encode_gif(w, h, [fr]))[2] == [fr]


def test_extension_blocks_skipped():
    w, h = 4, 4
    fr = _frame(w, h, 1)
    gif = bytearray(encode_gif(w, h, [fr]))
    # splice a graphic-control extension before the image descriptor
    img_at = gif.index(0x2C, 13 + 768)
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    gif[img_at:img_at] = ext
    assert decode_gif(bytes(gif))[2] == [fr]


def test_rejects_bad_input():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    w, h = 4, 4
    gif = bytearray(encode_gif(w, h, [_frame(w, h, 2)]))
    img_at = gif.index(0x2C, 13 + 768)
    gif[img_at + 9] |= 0x40  # interlace flag
    with pytest.raises(ValueError, match="interlace"):
        decode_gif(bytes(gif))
    with pytest.raises(ValueError, match="frame size"):
        encode_gif(4, 4, [b"short"])
    with pytest.raises(ValueError, match="at least one"):
        encode_gif(4, 4, [])


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=2000))
def test_lzw_round_trip_property(data):
    assert _lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 12),
    nf=st.integers(1, 4),
    seed=st.integers(0, 1000),
)
def test_gif_round_trip_property(w, h, nf, seed):
    frames = [_frame(w, h, seed + i) for i in range(nf)]
    assert decode_gif(encode_gif(w, h, frames)) == (w, h, frames)
