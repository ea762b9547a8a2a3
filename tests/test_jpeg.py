"""Gates for the pure-stdlib baseline-JPEG codec (functions/jpeg.py).

The keystone is the HAND-CONSTRUCTED stream test: a minimal JPEG is
assembled byte by byte from the T.81 spec (markers, a trivial Huffman
table, one DC-only block) with the expected pixels derived
analytically — so the decoder is checked against the SPEC, not
against our own encoder.  The encoder is then checked through the
decoder (exactness of the integer pipeline makes the round trip
bit-deterministic), plus scope-rejection and quarantine classes.
"""

from __future__ import annotations

import math
import random
import struct

import pytest

from grpc_map_reduce_spark.functions.jpeg import (
    BASIS_INT,
    DCT_SCALE,
    QUANT_LUMA,
    _dequant_idct,
    _fdct_quant,
    decode_jpeg,
    encode_jpeg,
)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _handmade_dc_only_jpeg(dc: int, quant0: int) -> bytes:
    """Assemble a minimal 8x8 grayscale baseline JPEG from the spec:
    flat quant table, a 2-entry DC Huffman table (cat 0 -> code 0,
    cat 6 -> code 10), a 1-entry AC table (EOB -> 0), and one block
    whose only nonzero coefficient is the DC value ``dc`` (category
    6, so dc must be in [32, 63])."""
    assert 32 <= dc <= 63
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all coefficients quantized by quant0
    out += _seg(0xDB, bytes([0]) + bytes([quant0] * 64))
    # SOF0: 8-bit, 8x8, 1 component, sampling 1x1, quant table 0
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DHT DC table 0: two codes — length-1 code 0 -> category 0,
    # length-2 code 10 -> category 6
    bits = [0] * 16
    bits[0] = 1  # one 1-bit code
    bits[1] = 1  # one 2-bit code
    out += _seg(0xC4, bytes([0x00]) + bytes(bits) + bytes([0, 6]))
    # DHT AC table 0: one 1-bit code -> EOB (0x00)
    bits = [0] * 16
    bits[0] = 1
    out += _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes([0x00]))
    # SOS: 1 component, DC table 0 / AC table 0, full spectral range
    out += _seg(0xDA, bytes([1, 1, 0x00, 0x00, 0x3F, 0x00]))
    # Entropy data: DC category 6 (code '10'), then 6 bits of dc
    # (positive -> raw), then AC EOB (code '0'); pad with 1s.
    bitstr = "10" + format(dc, "06b") + "0"
    bitstr += "1" * (-len(bitstr) % 8)
    out += int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")
    out += b"\xff\xd9"
    return bytes(out)


def test_decoder_against_handmade_spec_stream():
    """Spec-level reference: a DC-only block must decode to the flat
    level round(dc*q0/8) + 128 — analytically, F[0][0]=dc*q0 and
    IDCT(F00-only) = F00/8 at every pixel; the fixed-point basis
    reproduces that within its documented rounding."""
    for dc, q0 in ((40, 16), (63, 3), (32, 1)):
        w, h, c, pix = decode_jpeg(_handmade_dc_only_jpeg(dc, q0))
        assert (w, h, c) == (8, 8, 1)
        expected = min(255, round(dc * q0 / 8) + 128)
        vals = set(pix)
        assert len(vals) == 1, f"DC-only block must be flat, got {vals}"
        got = vals.pop()
        assert abs(got - expected) <= 1, (dc, q0, got, expected)


def test_roundtrip_is_exactly_the_integer_pipeline():
    """decode(encode(p)) must equal IDCTint(quant/dequant(DCTint(p)))
    EXACTLY — the Huffman layer is lossless, so any deviation means a
    bitstream bug."""
    random.seed(11)
    pix = [random.randrange(256) for _ in range(64)]
    _, _, _, out = decode_jpeg(encode_jpeg(8, 8, 1, bytes(pix)))
    expected = bytes(_dequant_idct(_fdct_quant(pix, QUANT_LUMA), QUANT_LUMA))
    assert out == expected


def test_multiblock_and_odd_dims_roundtrip():
    random.seed(5)
    for w, h in ((16, 24), (13, 10), (8, 9)):
        pix = bytes(random.randrange(256) for _ in range(w * h))
        rw, rh, rc, out = decode_jpeg(encode_jpeg(w, h, 1, pix))
        assert (rw, rh, rc) == (w, h, 1) and len(out) == w * h


def test_smooth_image_high_psnr():
    """Lossy, but must be GOOD lossy on compressible content: a
    gradient should round-trip above 40 dB."""
    w = h = 16
    pix = bytes(((x + y) * 255 // 30) % 256 for y in range(h) for x in range(w))
    _, _, _, out = decode_jpeg(encode_jpeg(w, h, 1, pix))
    mse = sum((a - b) ** 2 for a, b in zip(pix, out)) / len(pix)
    assert mse == 0 or 10 * math.log10(255 ** 2 / mse) > 40


def test_rgb_roundtrip_and_color_accuracy():
    """4:4:4 color: a flat-color image must round-trip each channel
    within the YCbCr transform's rounding (a few levels)."""
    w = h = 8
    rgb = (200, 60, 120)
    pix = bytes(rgb[i % 3] for i in range(w * h * 3))
    rw, rh, rc, out = decode_jpeg(encode_jpeg(w, h, 3, pix))
    assert (rw, rh, rc) == (w, h, 3)
    for ch in range(3):
        got = out[ch::3]
        assert all(abs(g - rgb[ch]) <= 3 for g in got), (ch, set(got))


def test_420_subsampled_roundtrip():
    """4:2:0 — the dominant real-world layout: flat color must
    round-trip within a couple of levels at every MCU-alignment
    shape, and restart framing must not change the pixels."""
    for w, h in ((16, 16), (24, 16), (13, 11), (8, 8)):
        rgb = (180, 90, 40)
        pix = bytes(rgb[i % 3] for i in range(w * h * 3))
        rw, rh, rc, out = decode_jpeg(
            encode_jpeg(w, h, 3, pix, subsample=True)
        )
        assert (rw, rh, rc) == (w, h, 3)
        assert max(abs(a - b) for a, b in zip(pix, out)) <= 3
    w, h = 32, 24
    pix = bytes(
        v for y in range(h) for x in range(w)
        for v in (min(255, 8 * x), min(255, 10 * y), min(255, 4 * (x + y)))
    )
    plain = decode_jpeg(encode_jpeg(w, h, 3, pix, subsample=True))[3]
    rst = decode_jpeg(
        encode_jpeg(w, h, 3, pix, subsample=True, restart_interval=2)
    )[3]
    assert plain == rst
    mse = sum((a - b) ** 2 for a, b in zip(pix, plain)) / len(pix)
    assert 10 * math.log10(255 ** 2 / mse) > 30


def test_restart_markers_roundtrip_identically():
    random.seed(2)
    pix = bytes(random.randrange(256) for _ in range(32 * 32))
    plain = decode_jpeg(encode_jpeg(32, 32, 1, pix))
    with_rst = decode_jpeg(encode_jpeg(32, 32, 1, pix, restart_interval=3))
    assert plain == with_rst


def test_handmade_progressive_stream():
    """Successive approximation validated analytically: a hand-built
    SOF2 stream with three scans — DC first at Al=1 (coding dc>>1),
    a DC refinement carrying the low bit, and an AC band scan that is
    one EOB — must reconstruct the same flat DC-only block as the
    sequential spec stream."""
    dc, q0 = 40, 16
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([q0] * 64))
    out += _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table: single 1-bit code '0' -> category 5
    bits = [0] * 16
    bits[0] = 1
    out += _seg(0xC4, bytes([0x00]) + bytes(bits) + bytes([5]))
    # AC table: single 1-bit code '0' -> EOB (0x00)
    out += _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes([0x00]))

    def scan(ss, se, ah, al, bitstr):
        seg = _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        bitstr += "1" * (-len(bitstr) % 8)
        return seg + int(bitstr, 2).to_bytes(len(bitstr) // 8, "big")

    # scan 1: DC first, Al=1 -> huff(cat5)='0' then 5 bits of dc>>1=20
    out += scan(0, 0, 0, 1, "0" + format(dc >> 1, "05b"))
    # scan 2: DC refinement, Ah=1 Al=0 -> the low bit of dc (0)
    out += scan(0, 0, 1, 0, "0")
    # scan 3: AC band 1..63 -> one EOB ('0')
    out += scan(1, 63, 0, 0, "0")
    out += b"\xff\xd9"
    w, h, c, pix = decode_jpeg(bytes(out))
    assert (w, h, c) == (8, 8, 1)
    expected = min(255, round(dc * q0 / 8) + 128)
    vals = set(pix)
    assert len(vals) == 1 and abs(vals.pop() - expected) <= 1


def test_scope_rejections_are_valueerrors():
    """Everything outside the documented scope must raise ValueError
    (the quarantine class), never a wrong decode or a crash."""
    good = encode_jpeg(8, 8, 1, bytes(64))
    # bad SOI
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"XXXX" + good[4:])
    # lossless frame marker
    with pytest.raises(ValueError, match="unsupported frame marker"):
        decode_jpeg(good[:2] + b"\xff\xc3" + good[4:])
    # 16-bit quant table: flip Pq in the DQT segment
    dqt_at = good.index(b"\xff\xdb") + 4
    bad = good[:dqt_at] + bytes([0x10]) + good[dqt_at + 1:]
    with pytest.raises(ValueError, match="16-bit quant"):
        decode_jpeg(bad)
    # invalid sampling factor (3 is not a power of two per scope)
    sof_at = good.index(b"\xff\xc0")
    samp_at = sof_at + 4 + 6 + 1  # marker+len, then prec/h/w/nc, cid
    bad = good[:samp_at] + bytes([0x33]) + good[samp_at + 1:]
    with pytest.raises(ValueError, match="out of range"):
        decode_jpeg(bad)
    # truncated entropy segment
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4])


def test_decodes_real_world_jpegs_from_spark_distro():
    """Independent-encoder validation: the Spark distribution ships
    real photographs (mllib sample data) encoded by real-world JPEG
    encoders — baseline 4:2:0, exactly the files a 100 TB multimodal
    corpus is made of.  Our decoder must parse every one to a
    plausible image (correct buffer geometry, non-degenerate pixel
    distribution, chroma decoded somewhere in the corpus)."""
    import glob
    import statistics

    paths = sorted(glob.glob(
        "/opt/spark-*/data/mllib/images/origin/kittens/*.jpg"
    ))
    if not paths:
        pytest.skip("Spark distro sample images not present")
    decoded = colorful = 0
    for p in paths:
        data = open(p, "rb").read()
        w, h, c, pix = decode_jpeg(data)
        assert c == 3 and len(pix) == w * h * c and w > 50 and h > 50
        sample = pix[::max(1, len(pix) // 3000)]
        assert statistics.pstdev(sample) > 10, f"{p}: degenerate decode"
        # chroma actually decoded: some pixel somewhere differs across
        # channels (checked corpus-wide — one photo may open on a
        # gray background)
        colorful += any(
            pix[i] != pix[i + 1] or pix[i + 1] != pix[i + 2]
            for i in range(0, len(pix) - 3, 999)
        )
        decoded += 1
    assert decoded >= 3, "expected several baseline sample photos"
    assert colorful >= 1, "no photo decoded any chroma"


def test_progressive_decode_cross_validates_against_sequential():
    """The distro's multi-channel dir carries the SAME photograph
    twice: chr30.4.184.jpg (sequential, color) and grayscale.jpg
    (PROGRESSIVE, grayscale).  Decoding both through completely
    different scan architectures and comparing the sequential
    decode's luma against the progressive decode is an
    independent-encoder end-to-end check of the successive-
    approximation path (measured: mean |diff| ~3 levels, max 15 —
    chroma subsampling + separate quantization account for it)."""
    import glob

    base = glob.glob("/opt/spark-*/data/mllib/images/origin/multi-channel")
    if not base:
        pytest.skip("Spark distro sample images not present")
    seq = open(base[0] + "/chr30.4.184.jpg", "rb").read()
    prog = open(base[0] + "/grayscale.jpg", "rb").read()
    w1, h1, c1, color = decode_jpeg(seq)
    w2, h2, c2, gray = decode_jpeg(prog)
    assert (w1, h1, c1) == (300, 215, 3)
    assert (w2, h2, c2) == (300, 215, 1)
    diffs = [
        abs(round(0.299 * color[3 * i] + 0.587 * color[3 * i + 1]
                  + 0.114 * color[3 * i + 2]) - gray[i])
        for i in range(w1 * h1)
    ]
    assert sum(diffs) / len(diffs) < 6.0
    assert max(diffs) <= 32
    # and the progressive color pair decodes too
    stripes = glob.glob("/usr/share/doc/nodejs/*white-stripe.jpg")
    for p in stripes:
        w, h, c, pix = decode_jpeg(open(p, "rb").read())
        assert c == 3 and len(pix) == w * h * 3


def test_basis_integers_are_the_documented_scale():
    """The oracle embeds BASIS_INT verbatim — pin its invariants so a
    drive-by 'cleanup' can't silently change the contract."""
    assert len(BASIS_INT) == 64
    assert DCT_SCALE == 1 << 26
    # u=0 row: alpha(0)/2 * 2^13 = 2^13 / (2*sqrt(2)) ~ 2896
    assert all(v == 2896 for v in BASIS_INT[:8])
    # every row's energy ~ (2^13/2)^2 * 8 / 2 within rounding
    for u in range(1, 8):
        row = BASIS_INT[u * 8:(u + 1) * 8]
        assert abs(sum(v * v for v in row) - 4 * 4096 * 4096) < 3e5


def test_numpy_finish_is_bit_identical_to_stdlib():
    """The numpy fast path (_finish_np: batched int64 IDCT + indexed
    upsample + vectorized color convert) is an EXACT twin of the
    stdlib loops, not an approximation — decode real libjpeg photos
    (sequential + progressive) and synthetic round trips through both
    paths and require byte equality."""
    import glob

    import grpc_map_reduce_spark.functions.jpeg as J

    def both(data):
        a = J.decode_jpeg(data)
        saved, J._np = J._np, None
        try:
            b = J.decode_jpeg(data)
        finally:
            J._np = saved
        return a, b

    if J._np is None:
        pytest.skip("numpy unavailable — only the stdlib path exists")

    checked = 0
    for p in sorted(glob.glob(
        "/opt/spark-*/data/mllib/images/origin/**/*.jpg", recursive=True
    )):
        a, b = both(open(p, "rb").read())
        assert a == b, p
        checked += 1

    for (w, h, c, sub) in ((8, 8, 1, False), (16, 8, 3, False),
                           (24, 16, 3, True), (13, 9, 3, True)):
        pix = bytes((i * 31) % 256 for i in range(w * h * c))
        a, b = both(encode_jpeg(w, h, c, pix, subsample=sub))
        assert a == b, (w, h, c, sub)
        checked += 1
    assert checked >= 4

    # the ENCODER's numpy path (color transform, chroma downsample,
    # batched forward DCT) must emit byte-identical files too
    for (w, h, c, sub, rst) in ((16, 8, 3, False, 0), (24, 16, 3, True, 0),
                                (13, 9, 3, True, 0), (32, 32, 3, True, 3),
                                (7, 5, 1, False, 0)):
        pix = bytes((i * 31 + i // 7) % 256 for i in range(w * h * c))
        enc_np = J.encode_jpeg(w, h, c, pix, restart_interval=rst,
                               subsample=sub)
        saved, J._np = J._np, None
        try:
            enc_py = J.encode_jpeg(w, h, c, pix, restart_interval=rst,
                                   subsample=sub)
        finally:
            J._np = saved
        assert enc_np == enc_py, (w, h, c, sub, rst)


# ---------------------------------------------------------------------------
# Round-9 entropy-decode fast path: LUT lookahead + inlined sequential
# block + acc trim.  Three gates: symbol-level LUT-vs-walk equivalence,
# block-level fast-vs-reference byte equality, and golden md5s of the
# real-photo decodes recorded from the PRE-round-9 decoder.


def test_huff_lut_matches_walk_on_random_streams():
    """Symbol-for-symbol: the 8-bit-lookahead decode and the bit-by-bit
    reference walk must consume identical bits and emit identical
    symbols over random entropy data, for every Annex K table."""
    import random as _r

    from grpc_map_reduce_spark.functions import jpeg as J

    tables = [
        (J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        (J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
        (J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        (J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ]
    _r.seed(9)
    for bits, vals in tables:
        codes = J._canonical_codes(bits, vals)
        by_len = [dict() for _ in range(17)]
        for v, (code, lng) in codes.items():
            by_len[lng][code] = v
        lut = J._HuffLUT(by_len)
        # random bytes with stuffed 0xFF00 pairs sprinkled in
        raw = bytearray()
        for _ in range(4000):
            b = _r.randrange(256)
            raw.append(b)
            if b == 0xFF:
                raw.append(0x00)
        data = bytes(raw)
        # NOTE: the fast reader PREFETCHES whole bytes (its pos/nbits
        # run ahead transiently), so the invariant is the SYMBOL
        # stream, not reader internals — any bit-consumption
        # divergence desynchronizes every subsequent symbol.
        def drain(decode, table):
            r = J._BitReader(data, 0)
            out = []
            try:
                while True:
                    out.append(decode(r, table))
            except ValueError:
                pass
            return out

        fast_syms = drain(J._huff_decode, lut)
        slow_syms = drain(J._huff_decode_walk, by_len)
        assert fast_syms == slow_syms
        # sparse DC tables terminate early on random data (an invalid
        # 16-bit pattern raises) — a few hundred symbols still covers
        # every code length
        assert len(fast_syms) > 200


def _decode_forcing_reference_block(data):
    from grpc_map_reduce_spark.functions import jpeg as J

    orig = J._sequential_block
    J._sequential_block = J._sequential_block_ref
    try:
        return J.decode_jpeg(data)
    finally:
        J._sequential_block = orig


def test_fast_sequential_block_is_bit_exact():
    """End-to-end: decoding through the inlined fast block must be
    byte-identical to the reference block on real photos (independent
    encoders, 4:2:0, restart-free) AND on our own encoder's output
    with restart markers (exercises the marker-boundary delegation)."""
    import glob
    import random as _r

    paths = sorted(glob.glob(
        "/opt/spark-*/data/mllib/images/origin/kittens/*.jpg"
    ))
    corpora = [open(p, "rb").read() for p in paths]
    _r.seed(7)
    noisy = bytes(_r.randrange(256) for _ in range(40 * 24))
    corpora.append(encode_jpeg(40, 24, 1, noisy))
    corpora.append(encode_jpeg(40, 24, 1, noisy, restart_interval=2))
    corpora.append(encode_jpeg(24, 40, 3, bytes(
        _r.randrange(256) for _ in range(24 * 40 * 3)), subsample=True))
    assert len(corpora) >= 5
    for blob in corpora:
        assert decode_jpeg(blob) == _decode_forcing_reference_block(blob)


def test_real_photo_decode_golden_md5():
    """Pixel-level regression pin: md5 of every distro photo's decode,
    recorded from the round-8 decoder (pre-LUT, pre-inline, pre-trim).
    Any entropy-decode change that alters ONE pixel anywhere fails."""
    import glob
    import hashlib

    want = {
        "29.5.a_b_EGDP022204.jpg": "728ee8022b2642077991a8cd02f10527",
        "54893.jpg": "81b60d1aeac9ae24ff8927e9704e3340",
        "DP153539.jpg": "e9720b4768ee7abe36f6161c50b72c02",
        "DP802813.jpg": "296408615f803dc1745b22bcbf730707",
        "chr30.4.184.jpg": "6b0f368cf827c1c7c91b7c1b6ca918f3",
        "grayscale.jpg": "f3f442cde19ad1ddac713012a7f8f221",
    }
    paths = [p for pat in ("kittens", "multi-channel") for p in sorted(
        glob.glob(f"/opt/spark-*/data/mllib/images/origin/{pat}/*.jpg"))]
    if not paths:
        pytest.skip("Spark distro sample images not present")
    checked = 0
    for p in paths:
        name = p.rsplit("/", 1)[-1]
        if name not in want:
            continue
        _, _, _, pix = decode_jpeg(open(p, "rb").read())
        assert hashlib.md5(pix).hexdigest() == want[name], name
        checked += 1
    assert checked >= 5

