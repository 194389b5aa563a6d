"""Tests for the from-scratch FLAC codec: encode→decode round-trips
(lossless — bit-exact), hand-assembled bitstream vectors that validate the
decoder INDEPENDENT of the encoder (LPC, wasted bits, partitioned and
escaped residuals — paths the fixture encoder never writes), stereo
decorrelation, hostile inputs, and the decode_audio dispatch."""

import numpy as np
import pytest

from pdf_extractor_ray.ops.flac import (
    FlacError,
    _BitReader,
    _BitWriter,
    _crc8,
    _read_residual,
    _subframe,
    decode_flac,
    encode_flac,
)


class TestRoundTrip:
    def test_mono_mixed_content(self):
        rng = np.random.default_rng(7)
        sig = np.concatenate(
            [
                np.full(500, 123, np.int16),
                (np.arange(5000) % 997 - 498).astype(np.int16),
                rng.integers(-3000, 3000, 4000).astype(np.int16),
            ]
        )
        enc = encode_flac(sig, rate=22050, blocksize=4096)
        dec, rate = decode_flac(enc)
        assert rate == 22050
        assert np.array_equal(dec[:, 0], sig.astype(np.int32))
        # it must actually compress this (rice coding does real work)
        assert len(enc) < sig.nbytes

    @pytest.mark.parametrize("mid_side", [False, True])
    def test_stereo(self, mid_side):
        rng = np.random.default_rng(3)
        left = rng.integers(-2000, 2000, 3000).astype(np.int16)
        st = np.stack([left, (left // 2 + 7).astype(np.int16)], axis=1)
        dec, _ = decode_flac(encode_flac(st, blocksize=1000, mid_side=mid_side))
        assert np.array_equal(dec, st.astype(np.int32))

    def test_extremes_and_odd_blocksize(self):
        ext = np.array([32767, -32768, 0, -1, 1] * 777, np.int16)
        dec, _ = decode_flac(encode_flac(ext, blocksize=1000))
        assert np.array_equal(dec[:, 0], ext.astype(np.int32))

    def test_empty_like_short(self):
        sig = np.array([5], np.int16)
        dec, _ = decode_flac(encode_flac(sig))
        assert dec.tolist() == [[5]]


def _stream(frame_payload: bytes, n_samples: int, channels: int = 1) -> bytes:
    """Wrap hand-built frame bytes in a minimal fLaC container."""
    info = _BitWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(16000, 20)
    info.write(channels - 1, 3)
    info.write(15, 5)  # bps 16
    info.write(n_samples, 36)
    body = info.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body + frame_payload


def _frame_header(blocksize: int, chan_code: int) -> bytes:
    h = _BitWriter()
    h.write(0x3FFE, 14)
    h.write(0, 2)
    h.write(7, 4)  # 16-bit blocksize-1 follows
    h.write(0, 4)  # rate from streaminfo
    h.write(chan_code, 4)
    h.write(4, 3)  # 16 bps
    h.write(0, 1)
    h.write(0, 8)  # frame number 0
    h.write(blocksize - 1, 16)
    h.align()
    header = h.bytes()
    return header + bytes([_crc8(header)])


class TestHandBuiltVectors:
    """Decoder validation independent of the encoder: the bits are laid
    down by hand per the spec and the expected samples computed by hand."""

    def test_lpc_subframe(self):
        # order-1 LPC: coef=2 (3-bit precision), shift=1 → pred = x[i-1];
        # warmup 100, residuals (5, -3, 0) → samples 100,105,102,102
        w = _BitWriter()
        w.write(0, 1)  # padding
        w.write(32 + 0, 6)  # LPC, order = 0+1 = 1
        w.write(0, 1)  # no wasted bits
        w.write(100, 16)  # warmup
        w.write(2, 4)  # precision-1 = 2 → 3 bits
        w.write(1, 5)  # shift 1
        w.write(2, 3)  # coefficient 2
        w.write(0, 2)  # residual method 0
        w.write(0, 4)  # partition order 0
        w.write(2, 4)  # rice param 2
        for v in (5, -3, 0):  # zigzag: 10, 5, 0
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            w.write_unary(u >> 2)
            w.write(u & 3, 2)
        w.align()
        body = w.bytes()
        frame = _frame_header(4, 0) + body + b"\x00\x00"
        dec, _ = decode_flac(_stream(frame, 4))
        assert dec[:, 0].tolist() == [100, 105, 102, 102]

    def test_wasted_bits(self):
        # CONSTANT subframe, 1 wasted bit: stored value 21 in 15 bits,
        # decoded sample = 21 << 1 = 42
        w = _BitWriter()
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(1, 1)  # wasted flag
        w.write(1, 1)  # unary 0 → wasted = 1
        w.write(21, 15)
        w.align()
        frame = _frame_header(3, 0) + w.bytes() + b"\x00\x00"
        dec, _ = decode_flac(_stream(frame, 3))
        assert dec[:, 0].tolist() == [42, 42, 42]

    def test_partitioned_and_escaped_residual(self):
        # order-0 FIXED (residual = signal), blocksize 8, partition order
        # 1 → two partitions of 4; first rice param 1, second escaped to
        # 6-bit raw
        w = _BitWriter()
        w.write(0, 1)
        w.write(8, 6)  # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)  # method 0
        w.write(1, 4)  # partition order 1
        w.write(1, 4)  # partition 1: rice param 1
        for v in (1, -1, 2, 0):
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            w.write_unary(u >> 1)
            w.write(u & 1, 1)
        w.write(15, 4)  # partition 2: escape
        w.write(6, 5)  # 6-bit raw
        for v in (-30, 31, -32, 17):
            w.write(v & 0x3F, 6)
        w.align()
        frame = _frame_header(8, 0) + w.bytes() + b"\x00\x00"
        dec, _ = decode_flac(_stream(frame, 8))
        assert dec[:, 0].tolist() == [1, -1, 2, 0, -30, 31, -32, 17]

    def test_rice2_method(self):
        # method 1 → 5-bit rice parameters
        w = _BitWriter()
        w.write(0, 1)
        w.write(8, 6)
        w.write(0, 1)
        w.write(1, 2)  # method 1 (RICE2)
        w.write(0, 4)
        w.write(3, 5)  # param 3
        for v in (4, -7):
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            w.write_unary(u >> 3)
            w.write(u & 7, 3)
        w.align()
        frame = _frame_header(2, 0) + w.bytes() + b"\x00\x00"
        dec, _ = decode_flac(_stream(frame, 2))
        assert dec[:, 0].tolist() == [4, -7]

    def test_left_side_and_right_side(self):
        # left/side: left=(10,20), side=(3,-4) → right=(7,24)
        for code, expect in ((8, [[10, 7], [20, 24]]), (9, [[13, 10], [16, 20]])):
            w = _BitWriter()
            if code == 8:
                payloads = [(10, 20, 16), (3, -4, 17)]
            else:  # right/side: side first, then right=(10,20), side=(3,-4)
                payloads = [(3, -4, 17), (10, 20, 16)]
            for a, b, bits in payloads:
                w.write(0, 1)
                w.write(1, 6)  # VERBATIM
                w.write(0, 1)
                w.write(a & ((1 << bits) - 1), bits)
                w.write(b & ((1 << bits) - 1), bits)
            w.align()
            frame = _frame_header(2, code) + w.bytes() + b"\x00\x00"
            dec, _ = decode_flac(_stream(frame, 2, channels=2))
            assert dec.tolist() == expect, code


class TestHostile:
    def test_not_flac(self):
        with pytest.raises(FlacError, match="not a FLAC"):
            decode_flac(b"RIFFxxxxWAVE")

    def test_truncated(self):
        enc = encode_flac(np.arange(2000, dtype=np.int16))
        with pytest.raises(FlacError):
            decode_flac(enc[: len(enc) // 2])

    def test_header_crc_mismatch(self):
        enc = bytearray(encode_flac(np.arange(500, dtype=np.int16) % 100))
        # find the frame sync (first 0xFF 0xF8 after metadata) and corrupt
        # a header byte without breaking the sync
        i = enc.index(b"\xff\xf8")
        enc[i + 4] ^= 0x01  # frame-number byte → CRC-8 must catch it
        with pytest.raises(FlacError):
            decode_flac(bytes(enc))

    def test_garbage_after_metadata(self):
        good = encode_flac(np.arange(100, dtype=np.int16))
        meta_end = good.index(b"\xff\xf8")
        with pytest.raises(FlacError):
            decode_flac(good[:meta_end] + b"\x00\x00\x00\x00")


class TestDispatch:
    def test_decode_audio_flac_and_wav_agree(self):
        from pdf_extractor_ray.ops.multimodal import decode_audio, encode_wav

        sig = ((np.arange(4000) * 37) % 2048 - 1024).astype(np.int16)
        from_wav, r1 = decode_audio(encode_wav(sig, rate=8000))
        from_flac, r2 = decode_audio(encode_flac(sig, rate=8000))
        assert r1 == r2 == 8000
        assert np.array_equal(from_wav, from_flac)

    def test_audio_features_over_flac(self):
        from pdf_extractor_ray.ops.multimodal import audio_features

        sig = ((np.arange(3200) * 13) % 1024 - 512).astype(np.int16)
        feats = audio_features(encode_flac(sig))
        assert len(feats) == 8 and all(np.isfinite(feats))
