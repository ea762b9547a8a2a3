"""The stdlib PNG codec must round-trip every supported color type
through every scanline filter, reject what it does not support with a
named error, and survive a pure-pixel cross-check (decode output ==
the bytes that went in, no engine in between)."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from grpc_map_reduce_spark.functions.png import (
    CHANNELS,
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)


def _pixels(w: int, h: int, ch: int) -> bytes:
    """Deterministic non-trivial pixel pattern (md5-mixed so every
    filter predictor sees varied gradients)."""
    raw = bytearray()
    seed = hashlib.md5(f"{w}x{h}x{ch}".encode()).digest()
    for i in range(w * h * ch):
        raw.append((seed[i % 16] + 31 * i + (i * i) % 251) & 0xFF)
    return bytes(raw)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_round_trip_all_filters(channels: int, filter_type: int):
    w, h = 13, 7  # odd sizes catch stride bugs
    pix = _pixels(w, h, channels)
    png = encode_png(w, h, channels, pix, filter_type=filter_type)
    rw, rh, rch, rpix = decode_png(png)
    assert (rw, rh, rch) == (w, h, channels)
    assert rpix == pix


def test_single_row_and_single_column():
    for w, h in [(1, 9), (9, 1), (1, 1)]:
        pix = _pixels(w, h, 3)
        for ft in range(5):
            assert decode_png(encode_png(w, h, 3, pix, ft))[3] == pix


def test_mixed_filters_per_row_decode():
    """Hand-build an IDAT whose rows use different filters — decoders
    must dispatch per row, not per image."""
    w, h, ch = 5, 5, 1
    pix = _pixels(w, h, ch)
    # take filtered scanlines from per-filter encodes, splice together
    rows = []
    for y in range(h):
        ft = y % 5
        png = encode_png(w, h, ch, pix, filter_type=ft)
        # extract the raw filtered stream of that encode
        pos, idat = 8, b""
        while pos < len(png):
            (ln,) = struct.unpack(">I", png[pos:pos + 4])
            if png[pos + 4:pos + 8] == b"IDAT":
                idat += png[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = w * ch
        rows.append(raw[y * (stride + 1):(y + 1) * (stride + 1)])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    spliced = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(spliced)[3] == pix


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda p: b"JUNK" + p[4:], "signature"),
        (lambda p: p[:40], "truncated"),
    ],
)
def test_rejects_bad_input(mutate, msg):
    png = encode_png(4, 4, 1, _pixels(4, 4, 1))
    with pytest.raises(ValueError, match=msg):
        decode_png(mutate(png))


def test_rejects_unsupported_depth_and_interlace():
    png = bytearray(encode_png(4, 4, 1, _pixels(4, 4, 1)))
    # IHDR body starts at byte 16; depth is body[8], interlace body[12]
    bad_depth = bytearray(png)
    bad_depth[16 + 8] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad_depth))
    bad_il = bytearray(png)
    bad_il[16 + 12] = 1
    with pytest.raises(ValueError, match="interlac"):
        decode_png(bytes(bad_il))


def test_channels_map_is_spec():
    assert CHANNELS == {0: 1, 2: 3, 4: 2, 6: 4}


# property: ANY image round-trips through ANY filter
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ch=st.sampled_from([1, 2, 3, 4]),
    ft=st.integers(0, 4),
    data=st.data(),
)
def test_round_trip_property(w, h, ch, ft, data):
    pix = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch,
                           max_size=w * h * ch))
    )
    assert decode_png(encode_png(w, h, ch, pix, ft)) == (w, h, ch, pix)


def test_fast_unfilter_matches_reference_all_filters():
    """Round 9: the numpy Sub/Up rows and the inlined Average/Paeth
    rows must reconstruct exactly what a straightforward per-byte
    reference unfilter does, for every filter type, channel count,
    and awkward width — including rows whose reconstruction chains
    through a previous row of a DIFFERENT filter type."""
    import random
    import struct
    import zlib

    from grpc_map_reduce_spark.functions.png import (
        CHANNELS,
        PNG_SIGNATURE,
        _chunk,
        _paeth,
        decode_png,
    )

    def reference_unfilter(raw, height, stride, ch):
        out = bytearray(stride * height)
        prev_start = -1
        for y in range(height):
            fbyte = raw[y * (stride + 1)]
            line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
            start = y * stride
            for x in range(stride):
                a = out[start + x - ch] if x >= ch else 0
                b = out[prev_start + x] if y else 0
                c = out[prev_start + x - ch] if (y and x >= ch) else 0
                if fbyte == 0:
                    pred = 0
                elif fbyte == 1:
                    pred = a
                elif fbyte == 2:
                    pred = b
                elif fbyte == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                out[start + x] = (line[x] + pred) & 0xFF
            prev_start = start
        return bytes(out)

    rng = random.Random(99)
    color_of = {v: k for k, v in CHANNELS.items()}
    for ch in (1, 2, 3, 4):
        for w, h in ((1, 1), (3, 7), (16, 16), (33, 5)):
            stride = w * ch
            # per-row RANDOM filter bytes — the mixed-filter case the
            # per-filter roundtrip tests never produce
            raw = bytearray()
            for _ in range(h):
                raw.append(rng.randrange(5))
                raw += bytes(rng.randrange(256) for _ in range(stride))
            want = reference_unfilter(raw, h, stride, ch)
            ihdr = struct.pack(">IIBBBBB", w, h, 8, color_of[ch], 0, 0, 0)
            blob = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + _chunk(b"IEND", b""))
            got_w, got_h, got_ch, got = decode_png(blob)
            assert (got_w, got_h, got_ch) == (w, h, ch)
            assert got == want, (ch, w, h)
