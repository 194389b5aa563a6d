"""Tests for the from-scratch VP8L (lossless WebP) codec (ops/webp.py)."""

import struct

import numpy as np
import pytest

from pdf_extractor_ray.ops.webp import (
    _LsbWriter,
    _write_simple1,
    decode_webp,
    encode_webp_gray,
)


def _riff(body: bytes) -> bytes:
    body = b"\x2f" + body
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: _LsbWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _write_two_symbol_green(bw: _LsbWriter, sym_a: int, sym_b: int) -> None:
    """Normal green code with two symbols at length 1 (needed when a
    symbol is >= 256 — simple codes carry 8-bit symbols only). CLC
    {1:'0', 17:'10', 18:'11'}."""
    assert sym_a < sym_b
    bw.write(0, 1)  # not simple
    bw.write(11 - 4, 4)  # covers CLC order up to symbol 8... uses 17,18,1
    clc = {17: 2, 18: 2, 1: 1}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8]
    for s in order:
        bw.write(clc.get(s, 0), 3)
    bw.write(0, 1)  # no max-symbol shortcut

    def zeros(n: int) -> None:
        while n > 0:
            take = min(n, 138)
            if take < 11:
                bw.write_code(0b10, 2)  # 17: 3 + bits(3)
                assert take >= 3
                bw.write(take - 3, 3)
            else:
                bw.write_code(0b11, 2)  # 18: 11 + bits(7)
                bw.write(take - 11, 7)
            n -= take

    zeros(sym_a)
    bw.write_code(0b0, 1)  # length-1 for sym_a
    zeros(sym_b - sym_a - 1)
    bw.write_code(0b0, 1)  # length-1 for sym_b
    zeros(280 - sym_b - 1)


class TestRoundTrip:
    def test_gray_round_trip(self):
        rng = np.random.default_rng(0)
        for shape in ((1, 1), (7, 5), (23, 31)):
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            assert np.array_equal(decode_webp(encode_webp_gray(img)), img)

    def test_media_dispatch(self):
        from pdf_extractor_ray.ops.multimodal import decode_image

        img = np.full((6, 6), 123, np.uint8)
        assert np.array_equal(decode_image(encode_webp_gray(img)), img)


class TestHandBuiltStreams:
    """Feature paths the fixture encoder does not emit, assembled by hand
    from the spec so the decoder is validated independently."""

    def test_lz77_backward_reference(self):
        # 4x1 image: literal green=65, then backref length 3, distance 1
        # (dist_code 121 = direct distance 1). Greens {65, 258} at len 1;
        # 258-256=2 -> length prefix 2 -> value 3.
        bw = _LsbWriter()
        _header(bw, 4, 1)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta codes
        _write_two_symbol_green(bw, 65, 258)
        _write_simple1(bw, 10)   # red
        _write_simple1(bw, 20)   # blue
        _write_simple1(bw, 255)  # alpha
        _write_simple1(bw, 13)   # distance prefix symbol 13
        # pixels: green '0'(sym 65) [r/b/a cost 0 bits], then '1'(sym 258)
        # + distance extra bits: value 121 = 96 + rb + 1 -> rb = 24 (5 bits)
        bw.write_code(0, 1)
        bw.write_code(1, 1)
        bw.write(24, 5)
        out = decode_webp(_riff(bw.finish()))
        # every pixel = (a=255, r=10, g=65, b=20) -> luma
        expect = (10 * 299 + 65 * 587 + 20 * 114) // 1000
        assert out.shape == (1, 4)
        assert (out == expect).all()

    def test_color_cache(self):
        # 3x1: literal pixel, then two cache hits on its slot (cache_bits=1)
        argb = (255 << 24) | (10 << 16) | (65 << 8) | 20
        slot = (0x1E35A7BD * argb & 0xFFFFFFFF) >> 31
        cache_sym = 280 + slot
        bw = _LsbWriter()
        _header(bw, 3, 1)
        bw.write(0, 1)  # no transforms
        bw.write(1, 1)  # color cache present
        bw.write(1, 4)  # cache_bits = 1
        bw.write(0, 1)  # no meta codes
        _write_two_symbol_green(bw, 65, cache_sym)
        _write_simple1(bw, 10)
        _write_simple1(bw, 20)
        _write_simple1(bw, 255)
        _write_simple1(bw, 0)
        bw.write_code(0, 1)  # literal
        bw.write_code(1, 1)  # cache hit
        bw.write_code(1, 1)  # cache hit
        out = decode_webp(_riff(bw.finish()))
        expect = (10 * 299 + 65 * 587 + 20 * 114) // 1000
        assert (out == expect).all() and out.shape == (1, 3)

    def test_palette_with_pixel_packing(self):
        # 8x1 image, 4-entry palette -> xbits=2 (4 pixels per packed green
        # byte), packed width 2. Palette entries are DELTA coded.
        # Palette (argb): e0 = gray 0, e1 = gray 60, e2 = gray 120, e3 = 180.
        def gray(v):
            return (255 << 24) | (v << 16) | (v << 8) | v

        entries = [gray(0), gray(60), gray(120), gray(180)]
        deltas = [entries[0]]
        for prev, cur in zip(entries, entries[1:]):
            d = 0
            for sh in (0, 8, 16, 24):
                d |= (((cur >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)

        bw = _LsbWriter()
        _header(bw, 8, 1)
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(4 - 1, 8)  # palette size 4
        # palette sub-image (4x1): literals with full channel codes would
        # need 4 distinct symbols -> use simple 2-symbol codes per channel.
        # Delta entries: d0 = ARGB(255,0,0,0); d1..d3 = ARGB(0,60,60,60).
        # green code: symbols {0, 60}; red/blue same; alpha {255, 0}.
        def two(bwx, a, b):
            bwx.write(1, 1)  # simple
            bwx.write(1, 1)  # two symbols
            bwx.write(1, 1)  # 8-bit first
            bwx.write(a, 8)
            bwx.write(b, 8)

        bw.write(0, 1)  # sub-image: no color cache
        two(bw, 0, 60)    # green
        two(bw, 0, 60)    # red
        two(bw, 0, 60)    # blue
        two(bw, 255, 0)   # alpha
        _write_simple1(bw, 0)  # distance
        # simple 2-symbol canonical: code 0 = smaller SYMBOL INDEX order?
        # lengths {a:1, b:1} -> canonical by symbol: a->0, b->1.
        # d0: g=0('0'), r=0('0'), b=0('0'), alpha=255('0')
        for _ in range(4):
            bw.write_code(0, 1)
        # d1..d3: g=60('1'), r=60('1'), b=60('1'), alpha=0('1')
        for _ in range(3):
            for _ in range(4):
                bw.write_code(1, 1)
        # main image (packed width 2, height 1): green bytes hold 4 2-bit
        # indices each. indices: 0,1,2,3, 3,2,1,0 -> bytes 0b11100100=228,
        # 0b00011011=27.
        bw.write(0, 1)  # no more transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta codes
        two(bw, 27, 228)  # green code for packed bytes
        _write_simple1(bw, 0)    # red
        _write_simple1(bw, 0)    # blue
        _write_simple1(bw, 255)  # alpha
        _write_simple1(bw, 0)    # distance
        bw.write_code(1, 1)  # 228 (symbol order: 27->0, 228->1)
        bw.write_code(0, 1)  # 27
        out = decode_webp(_riff(bw.finish()))
        assert out.shape == (1, 8)
        assert out.tolist() == [[0, 60, 120, 180, 180, 120, 60, 0]]


class TestContainment:
    def test_not_webp(self):
        with pytest.raises(ValueError):
            decode_webp(b"RIFFxxxxNOPE")

    def test_lossy_declared(self):
        data = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        with pytest.raises(NotImplementedError):
            decode_webp(data)

    def test_truncated(self):
        img = np.full((16, 16), 99, np.uint8)
        full = encode_webp_gray(img)
        with pytest.raises(ValueError):
            decode_webp(full[:40])

    def test_near_distance_declared(self):
        # same as the LZ77 test but dist_code 120 (rb=23) -> declared gap
        bw = _LsbWriter()
        _header(bw, 4, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        _write_two_symbol_green(bw, 65, 258)
        _write_simple1(bw, 10)
        _write_simple1(bw, 20)
        _write_simple1(bw, 255)
        _write_simple1(bw, 13)
        bw.write_code(0, 1)
        bw.write_code(1, 1)
        bw.write(23, 5)
        with pytest.raises(NotImplementedError):
            decode_webp(_riff(bw.finish()))


class TestVp8HeaderCensus:
    """Round 5: lossy-VP8 uncompressed frame-header census (RFC 6386
    §9.1) — the header layer parses for real; the bool-coded pixel
    layer stays typed-unsupported."""

    def test_roundtrip_fields(self):
        from pdf_extractor_ray.ops.webp import (
            encode_vp8_header_webp,
            parse_vp8_header,
        )

        p = encode_vp8_header_webp(
            320, 240, partition0=1234, version=2, xscale=1, yscale=3,
            filler=b"z" * 33,
        )
        c = parse_vp8_header(p)
        assert c == {
            "keyframe": True, "version": 2, "show_frame": 1,
            "partition0_bytes": 1234, "chunk_bytes": 10 + 33,
            "width": 320, "height": 240, "xscale": 1, "yscale": 3,
        }

    def test_bad_start_code_raises(self):
        from pdf_extractor_ray.ops.webp import (
            encode_vp8_header_webp,
            parse_vp8_header,
        )

        p = bytearray(encode_vp8_header_webp(8, 8))
        p[12 + 8 + 3] ^= 0xFF  # the 0x9D of the keyframe start code
        with pytest.raises(ValueError, match="start code"):
            parse_vp8_header(bytes(p))

    def test_lossless_payload_has_no_vp8_chunk(self):
        import numpy as np

        from pdf_extractor_ray.ops.webp import (
            encode_webp_gray,
            parse_vp8_header,
        )

        with pytest.raises(ValueError, match="no VP8 chunk"):
            parse_vp8_header(encode_webp_gray(np.zeros((4, 4), np.uint8)))

    def test_pixel_decode_still_typed_unsupported(self):
        from pdf_extractor_ray.ops.webp import (
            decode_webp,
            encode_vp8_header_webp,
        )

        with pytest.raises(NotImplementedError, match="lossy VP8"):
            decode_webp(encode_vp8_header_webp(8, 8))
