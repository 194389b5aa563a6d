"""Tests for the from-scratch baseline JPEG codec (ops/jpeg.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_ray.ops.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_progressive_gray,
)
from pdf_extractor_ray.ops.multimodal import decode_image


class TestRoundTrip:
    def test_constant_blocks_exact_with_quant8(self):
        """Constant 8x8 blocks survive the real DCT path EXACTLY at flat
        quant 8 (DC=(v-128)*8 quantizes losslessly) — the property the
        media_features oracle relies on."""
        img = np.zeros((16, 16), np.uint8)
        for b, (by, bx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (b * 87 + 3) % 256
        assert np.array_equal(decode_jpeg(encode_jpeg_gray(img, 8)), img)

    def test_arbitrary_content_quant1_bounded_error(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg_gray(img, 1))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_non_multiple_of_8_dims(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg_gray(img, 1))
        assert dec.shape == (13, 21)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_color_420_interleave(self):
        """3-component 4:2:0 frame (neutral chroma): the decoder must walk
        the full MCU/sampling-factor interleave and still recover the luma."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(24, 33), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg_gray(img, 1, color=True))
        assert dec.shape == (24, 33)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_decode_image_dispatch(self):
        img = np.full((8, 8), 77, np.uint8)
        assert np.array_equal(decode_image(encode_jpeg_gray(img, 8)), img)

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(4, 24),
        w=st.integers(4, 24),
        seed=st.integers(0, 10_000),
    )
    def test_roundtrip_property(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg_gray(img, 1))
        assert dec.shape == (h, w)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def _seg(marker: int, body: bytes) -> bytes:
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _headers(h: int, w: int, dri: int | None = None) -> bytes:
    """Minimal grayscale baseline headers with flat quant 1 and the
    STANDARD Annex-K luminance tables — written by hand, independent of the
    encoder under test."""
    import struct

    from pdf_extractor_ray.ops.jpeg import _STD_AC_LUM, _STD_DC_LUM

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_STD_DC_LUM[0]) + bytes(_STD_DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(_STD_AC_LUM[0]) + bytes(_STD_AC_LUM[1]))
    if dri is not None:
        out += _seg(0xDD, struct.pack(">H", dri))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return bytes(out)


class TestHandBuiltBitstream:
    """Bitstreams assembled by hand from the public spec — they validate
    the DECODER's Huffman/EXTEND/padding/restart conventions independently
    of the sibling encoder (a symmetrical encoder+decoder bug would pass
    round-trip tests but fail these)."""

    def test_dc_only_block(self):
        # One 8x8 block, constant 128: DC diff 0 -> DC code '00' (category
        # 0), EOB '1010'; padded with 1s -> 0b00101011 = 0x2B.
        data = _headers(8, 8) + bytes([0x2B]) + b"\xff\xd9"
        out = decode_jpeg(data)
        assert np.array_equal(out, np.full((8, 8), 128, np.uint8))

    def test_restart_marker_resets_predictor(self):
        # Two MCUs, DRI=1, RST0 between them. Block 1: constant 128 (DC
        # diff 0 -> 0x2B as above). Block 2 after restart: predictor reset,
        # constant 140 -> DC = (140-128)*8 = 96, category 7, DC code
        # '11110' + 7 value bits '1100000', EOB '1010' -> 0xF6 0x0A.
        data = (
            _headers(8, 16, dri=1)
            + bytes([0x2B])
            + b"\xff\xd0"
            + bytes([0xF6, 0x0A])
            + b"\xff\xd9"
        )
        out = decode_jpeg(data)
        assert np.array_equal(out[:, :8], np.full((8, 8), 128, np.uint8))
        assert np.array_equal(out[:, 8:], np.full((8, 8), 140, np.uint8))

    def test_ac_coefficient(self):
        # One block: DC diff 0 ('00'), then AC symbol 0x04 (run 0, size 4,
        # code '1011') + 4 value bits '1111' (coefficient +15 at zigzag
        # index 1 = natural (0,1)), EOB '1010' -> bits
        # 00 1011 1111 1010 + pad '11' = 0x2F 0xEB.
        data = _headers(8, 8) + bytes([0x2F, 0xEB]) + b"\xff\xd9"
        out = decode_jpeg(data).astype(float)
        # natural (0,1) = column half-cosine on top of the flat 128:
        # columns vary, rows constant
        assert (out.std(axis=0) < 1e-9).all()
        assert out[0, 0] > 128 > out[0, 7]


class TestContainment:
    def test_not_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"plainly not a jpeg")

    def test_truncated_entropy(self):
        img = np.full((16, 16), 50, np.uint8)
        full = encode_jpeg_gray(img, 1)
        with pytest.raises(ValueError):
            decode_jpeg(full[:60])

    def test_arithmetic_coding_declared_unsupported(self):
        import struct

        data = bytearray(b"\xff\xd8")
        data += _seg(0xDB, bytes([0]) + bytes([1] * 64))
        data += _seg(  # SOF9: extended sequential, arithmetic coding
            0xC9, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        )
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))

    def test_progressive_missing_scan_data(self):
        import struct

        data = bytearray(b"\xff\xd8")
        data += _seg(0xDB, bytes([0]) + bytes([1] * 64))
        data += _seg(
            0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        )
        data += b"\xff\xd9"
        with pytest.raises(ValueError):
            decode_jpeg(bytes(data))


class TestProgressive:
    """Round 4: SOF2 progressive decoding (T.81 Annex G) must reproduce
    the baseline encoder's pixels exactly — same quantized coefficients,
    different scan schedule (DC first/refine, spectral-selection AC first
    with EOB runs, two successive-approximation AC refinement passes)."""

    def test_matches_baseline_gray(self):
        rng = np.random.default_rng(7)
        for shape in ((8, 8), (16, 16), (17, 23), (33, 9)):
            for q in (8, 1, 3):
                img = rng.integers(0, 256, shape).astype(np.uint8)
                base = decode_jpeg(encode_jpeg_gray(img, quant_value=q))
                prog = decode_jpeg(
                    encode_jpeg_progressive_gray(img, quant_value=q)
                )
                assert np.array_equal(base, prog), (shape, q)

    def test_matches_baseline_color_interleaved_dc(self):
        """4:2:0 color: the interleaved DC scans must walk MCU order while
        the AC scans walk the component's own non-interleaved grid."""
        rng = np.random.default_rng(9)
        for shape in ((16, 16), (24, 40), (15, 130)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            base = decode_jpeg(encode_jpeg_gray(img, quant_value=1, color=True))
            prog = decode_jpeg(
                encode_jpeg_progressive_gray(img, quant_value=1, color=True)
            )
            assert np.array_equal(base, prog), shape

    def test_constant_blocks_exact_roundtrip(self):
        """Flat quant 8 + constant blocks: the media_features oracle's
        exactness property must hold through the progressive path too."""
        img = np.zeros((16, 16), np.uint8)
        for b, (by, bx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 40 + b * 17
        out = decode_jpeg(encode_jpeg_progressive_gray(img, quant_value=8))
        assert np.array_equal(out, img)

    def test_decode_image_dispatch(self):
        from pdf_extractor_ray.ops.multimodal import decode_image

        img = (np.add.outer(np.arange(16), np.arange(16)) * 3 % 256).astype(
            np.uint8
        )
        payload = encode_jpeg_progressive_gray(img, quant_value=1)
        out = decode_image(payload)
        base = decode_jpeg(encode_jpeg_gray(img, quant_value=1))
        assert np.array_equal(out, base)

    def test_media_stage_contains_corrupt_jpeg(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.multimodal import media_pipeline

        img = np.full((16, 16), 90, np.uint8)
        good = encode_jpeg_gray(img, 8)
        rows = [
            {"media_id": 1, "payload": good},
            {"media_id": 2, "payload": good[:50]},
        ]
        import pyarrow as pa

        tbl = pa.concat_tables(
            media_pipeline(rd.from_items(rows)).iter_batches(batch_format="pyarrow")
        )
        err = dict(zip(tbl["media_id"].to_pylist(), tbl["decode_error"].to_pylist()))
        assert err[1] is None
        assert err[2] is not None


class TestGif:
    def test_round_trip(self):
        from pdf_extractor_ray.ops.jpeg import decode_gif, encode_gif_gray

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(23, 31), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif_gray(img)), img)

    def test_interlaced(self):
        from pdf_extractor_ray.ops.jpeg import decode_gif, encode_gif_gray

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(17, 9), dtype=np.uint8)
        assert np.array_equal(
            decode_gif(encode_gif_gray(img, interlaced=True)), img
        )

    def test_table_reset(self):
        # >3837 new sequences forces the 12-bit LZW table reset path
        from pdf_extractor_ray.ops.jpeg import decode_gif, encode_gif_gray

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(90, 90), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif_gray(img)), img)

    def test_decode_image_dispatch_and_containment(self):
        from pdf_extractor_ray.ops.jpeg import encode_gif_gray

        img = np.full((8, 8), 42, np.uint8)
        assert np.array_equal(decode_image(encode_gif_gray(img)), img)
        with pytest.raises(ValueError):
            decode_image(encode_gif_gray(img)[:20])


class TestTiff:
    def test_round_trip_all_compressions(self):
        from pdf_extractor_ray.ops.jpeg import decode_tiff, encode_tiff_gray

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(37, 29), dtype=np.uint8)
        for comp in (1, 5, 32773):
            for pred in (1, 2):
                got = decode_tiff(
                    encode_tiff_gray(img, compression=comp, predictor=pred)
                )
                assert np.array_equal(got, img), (comp, pred)

    def test_dispatch_and_containment(self):
        from pdf_extractor_ray.ops.jpeg import encode_tiff_gray

        img = np.full((9, 9), 13, np.uint8)
        assert np.array_equal(decode_image(encode_tiff_gray(img)), img)
        with pytest.raises(ValueError):
            decode_image(encode_tiff_gray(img)[:30])

    def test_declared_unsupported_forms(self):
        import struct

        from pdf_extractor_ray.ops.jpeg import decode_tiff, encode_tiff_gray

        img = np.full((8, 8), 5, np.uint8)
        good = bytearray(encode_tiff_gray(img))
        # flip bits/sample to 16 in the IFD (tag 258, 3rd entry value)
        idx = good.find(struct.pack("<HHII", 258, 3, 1, 8))
        assert idx > 0
        good[idx : idx + 12] = struct.pack("<HHII", 258, 3, 1, 16)
        with pytest.raises(NotImplementedError):
            decode_tiff(bytes(good))


class TestExif:
    """APP1 Exif parse/build roundtrip + hostile/absent structures."""

    def test_roundtrip_all_fields(self):
        import numpy as np

        from pdf_extractor_ray.ops.jpeg import (
            build_exif_app1,
            encode_jpeg_gray,
            parse_exif,
        )

        jpg = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
        app1 = build_exif_app1(
            orientation=6,
            make="CamCo",
            model="X1",
            datetime="2024:01:02 03:04:05",
            pixel_x=1600,
            pixel_y=1200,
            iso=200,
        )
        got = parse_exif(jpg[:2] + app1 + jpg[2:])
        assert got == {
            "orientation": 6,
            "make": "CamCo",
            "model": "X1",
            "datetime": "2024:01:02 03:04:05",
            "pixel_x": 1600,
            "pixel_y": 1200,
            "iso": 200,
            "has_exif": True,
        }

    def test_partial_fields_and_no_exif(self):
        import numpy as np

        from pdf_extractor_ray.ops.jpeg import (
            build_exif_app1,
            encode_jpeg_gray,
            parse_exif,
        )

        jpg = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
        assert parse_exif(jpg)["has_exif"] is False
        app1 = build_exif_app1(orientation=1)
        got = parse_exif(jpg[:2] + app1 + jpg[2:])
        assert got["orientation"] == 1 and got["make"] is None
        assert got["has_exif"] is True

    def test_bare_tiff_and_hostile_bytes(self):
        import numpy as np

        from pdf_extractor_ray.ops.jpeg import encode_tiff_gray, parse_exif

        tiff = encode_tiff_gray(np.zeros((4, 4), np.uint8))
        got = parse_exif(tiff)
        assert got["has_exif"] is True and got["orientation"] is None
        for hostile in (b"", b"\xff\xd8", b"II*\x00", b"II*\x00" + b"\xff" * 6,
                        b"garbage not an image at all"):
            out = parse_exif(hostile)
            assert out["has_exif"] is False

    def test_truncated_app1_survives(self):
        import numpy as np

        from pdf_extractor_ray.ops.jpeg import (
            build_exif_app1,
            encode_jpeg_gray,
            parse_exif,
        )

        jpg = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
        app1 = build_exif_app1(orientation=3, make="T", pixel_x=9)
        doc = jpg[:2] + app1 + jpg[2:]
        for cut in (12, 20, len(app1) // 2):
            out = parse_exif(doc[: 2 + cut])
            assert isinstance(out, dict)  # never raises
