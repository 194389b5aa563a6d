"""MP3 framing layer (ops/mp3.py): synthesis↔parse roundtrip, CRC and
bit-reservoir validation, tag/VBR-header handling, LSF layouts, typed
declared-unsupported variants."""

import os

import pytest

from pdf_extractor_ray.ops.mp3 import (
    Mp3Error,
    Mp3Unsupported,
    _crc16_mpeg,
    _parse_side_info,
    decode_mp3,
    encode_mp3,
    frame_length,
    parse_mp3,
)


def _anc(k, n):
    return bytes((7 * k + t) % 256 for t in range(n))


class TestRoundtrip:
    def test_census_fields_exact(self):
        p = encode_mp3(
            [1, 5, 9, 14, 7], paddings=[0, 1, 0, 1, 0], crc=True,
            anc_fill=_anc, id3v2_payload=b"x" * 33, id3v1=True,
            xing={"frames": 5, "bytes": 999},
        )
        c = parse_mp3(p)
        assert c["n_frames"] == 5
        assert c["frame_bytes"] == sum(
            frame_length(k, 44100, pad)
            for k, pad in zip((32, 64, 128, 320, 96), (0, 1, 0, 1, 0))
        )
        # ancillary = frame - header(4) - crc(2) - sideinfo(17), silent
        assert c["anc_bytes"] == c["frame_bytes"] - 5 * 23
        assert c["duration_ms"] == 5 * 1152 * 1000 // 44100
        assert (c["kbps_min"], c["kbps_max"]) == (32, 320)
        assert c["n_padded"] == 2
        assert (c["n_crc"], c["crc_ok"]) == (6, True)  # + the Xing frame
        assert c["id3v2_bytes"] == 43
        assert c["has_id3v1"] and c["is_vbr"]
        assert c["xing"] == {
            "tag": "Xing", "vbr": True, "frames": 5, "bytes": 999,
        }

    def test_cbr_stream_not_vbr(self):
        c = parse_mp3(encode_mp3([9, 9, 9, 9]))
        assert not c["is_vbr"] and c["xing"] is None
        assert c["kbps_min"] == c["kbps_max"] == 128

    def test_info_tag_is_cbr_header(self):
        c = parse_mp3(
            encode_mp3([9, 9], xing={"frames": 2, "bytes": 0, "tag": b"Info"})
        )
        assert c["xing"]["tag"] == "Info" and not c["xing"]["vbr"]
        assert not c["is_vbr"]

    def test_junk_prefix_resync(self):
        c = parse_mp3(b"\x01\x02\x00" + encode_mp3([9, 9]))
        assert c["junk_bytes"] == 3 and c["n_frames"] == 2

    def test_truncated_tail_frame_counts_as_junk(self):
        p = encode_mp3([9, 9])
        c = parse_mp3(p[:-50])  # second frame loses its last 50 bytes
        assert c["n_frames"] == 1
        assert c["junk_bytes"] == frame_length(128, 44100, 0) - 50

    def test_frame_length_arithmetic(self):
        assert frame_length(128, 44100, 0) == 417
        assert frame_length(128, 44100, 1) == 418
        assert frame_length(320, 48000, 0) == 960


class TestValidation:
    def test_crc_corruption_detected(self):
        p = bytearray(encode_mp3([9, 9], crc=True))
        p[5] ^= 0xFF  # stored CRC word itself (side info stays valid)
        assert parse_mp3(bytes(p))["crc_ok"] is False

    def test_reservoir_underflow_raises(self):
        # main_data_begin=100 in the FIRST frame: reservoir is empty.
        p = bytearray(encode_mp3([9]))
        p[4] = 100 >> 1  # top 8 of the 9-bit main_data_begin
        with pytest.raises(Mp3Error, match="reservoir"):
            parse_mp3(bytes(p))

    def test_samplerate_change_raises(self):
        a = encode_mp3([9], sr_index=0)
        b = encode_mp3([9], sr_index=1)
        with pytest.raises(Mp3Error, match="sampling frequency"):
            parse_mp3(a + b)

    def test_reserved_bitrate_raises(self):
        p = bytearray(encode_mp3([9]))
        p[2] = (p[2] & 0x0F) | (15 << 4)
        with pytest.raises(Mp3Error, match="bitrate"):
            parse_mp3(bytes(p))


class TestDeclaredUnsupported:
    def test_free_format_typed(self):
        p = bytearray(encode_mp3([9]))
        p[2] = p[2] & 0x0F  # bitrate index 0
        with pytest.raises(Mp3Unsupported, match="free-format"):
            parse_mp3(bytes(p))

    def test_layer2_typed(self):
        p = bytearray(encode_mp3([9]))
        p[1] = (p[1] & ~0x06) | (0b10 << 1)  # layer II
        with pytest.raises(Mp3Unsupported, match="Layer I/II"):
            parse_mp3(bytes(p))

    def test_reserved_version_raises(self):
        p = bytearray(encode_mp3([9]))
        p[1] = (p[1] & ~0x18) | (0b01 << 3)
        with pytest.raises(Mp3Error, match="version"):
            parse_mp3(bytes(p))

    def test_spectral_decode_typed(self):
        with pytest.raises(Mp3Unsupported, match="spectral"):
            decode_mp3(encode_mp3([9]))


class TestSideInfo:
    def test_mpeg1_mono_layout_bits(self):
        # silent side info: everything zero except global_gain=210
        from pdf_extractor_ray.ops.mp3 import _build_side_info

        side = _build_side_info(True)
        assert len(side) == 17
        info = _parse_side_info(side, mono=True)
        assert info["main_data_begin"] == 0
        assert len(info["granules"]) == 2
        for g in info["granules"]:
            assert g["part2_3_length"] == 0
            assert g["global_gain"] == 210
            assert g["window_switching"] == 0

    def test_lsf_layout_lengths(self):
        # LSF layouts: 9 B mono / 17 B stereo, single granule, 9-bit
        # scalefac_compress — parse a crafted all-zero buffer.
        mono = _parse_side_info(b"\x00" * 9, mono=True, lsf=True)
        assert len(mono["granules"]) == 1
        stereo = _parse_side_info(b"\x00" * 17, mono=False, lsf=True)
        assert len(stereo["granules"]) == 2  # one granule x two channels

    def test_crc16_known_property(self):
        # poly 0x8005 init 0xFFFF: empty input keeps the init value
        assert _crc16_mpeg(b"") == 0xFFFF
        assert _crc16_mpeg(b"\x00") != 0xFFFF


REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


@pytest.mark.skipif(not os.path.exists(REAL_MP3), reason="no real mp3 on host")
class TestRealWorldFile:
    def test_genuine_mpeg2_stream_parses_byte_exactly(self):
        raw = open(REAL_MP3, "rb").read()
        c = parse_mp3(raw)
        # MPEG-2 22.05 kHz 64 kbps CBR; framing must account for every
        # byte: frames + ID3v2 == file size, zero junk.
        assert c["samplerate"] == 22050
        assert c["kbps_min"] == c["kbps_max"] == 64
        assert not c["is_vbr"]
        assert c["junk_bytes"] == 0
        assert c["id3v2_bytes"] + c["frame_bytes"] == len(raw)
        assert c["duration_ms"] == c["n_frames"] * 576 * 1000 // 22050
