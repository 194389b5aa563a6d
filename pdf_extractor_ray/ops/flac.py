"""From-scratch FLAC codec (stdlib + numpy only).

Decoder for the real-corpus audio format (per the public FLAC format
spec, https://xiph.org/flac/format.html — implemented from the spec, no
reference code):

* ``fLaC`` magic + metadata blocks; STREAMINFO parsed (sample rate,
  channels, bits/sample, total samples), other blocks skipped
* frame headers: 14-bit sync, blocking strategy, all block-size /
  sample-rate / sample-size codes, UTF-8-coded frame number, CRC-8
  (verified — mismatch is a typed :class:`FlacError`)
* subframes: CONSTANT, VERBATIM, FIXED orders 0–4 (reconstructed as
  k-fold cumulative sums — vectorized), LPC any order (integer
  predictor with shift; per-sample loop — the one sequential part)
* Rice residuals: both 4-bit (method 0) and 5-bit (method 1) parameter
  widths, any partition order, escape-to-raw partitions
* wasted-bits-per-sample (unary-coded shift)
* stereo decorrelation: independent, left/side, right/side, mid/side

Declared unsupported (typed ``FlacError``): sample sizes other than
8/12/16/20/24/32, variable blocking with 64-bit sample numbers beyond
2^36 (practically irrelevant), and CRC-16 verification is best-effort
(computed on encode; decode trusts the header CRC-8 — frame-body
corruption surfaces as a malformed-bitstream error instead).

The encoder exists to build REAL fixtures: mono/stereo int16 PCM into
fixed-blocksize frames, per-frame best FIXED predictor (orders 0–2) with
genuine Rice-coded residuals (partition order 0), optional mid/side for
stereo — so the decoder's Rice/prediction/decorrelation paths are
exercised by every fixture, and encode→decode round-trips bit-exactly
(FLAC is lossless), which is what the ``audio_features`` SQL oracle
relies on.

The reference repo has no audio path at all; this exists for the
engine's multimodal columns (SURVEY §2, multimodal)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["FlacError", "decode_flac", "encode_flac"]


class FlacError(ValueError):
    """Typed malformed-/unsupported-FLAC error (contained per row by the
    media stages, like PdfError in the PDF path)."""


# ---------------------------------------------------------------------------
# bit I/O


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos
        self.bit = 0

    def read(self, n: int) -> int:
        """Read ``n`` bits MSB-first as an unsigned int."""
        out = 0
        data, pos, bit = self.data, self.pos, self.bit
        while n > 0:
            if pos >= len(data):
                raise FlacError("truncated FLAC bitstream")
            avail = 8 - bit
            take = avail if avail < n else n
            cur = data[pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            bit += take
            n -= take
            if bit == 8:
                bit = 0
                pos += 1
        self.pos, self.bit = pos, bit
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit."""
        count = 0
        data, pos, bit = self.data, self.pos, self.bit
        while True:
            if pos >= len(data):
                raise FlacError("truncated FLAC bitstream")
            cur = data[pos]
            # scan remaining bits of this byte
            rem = cur & ((1 << (8 - bit)) - 1)
            if rem == 0:
                count += 8 - bit
                pos += 1
                bit = 0
                continue
            top = rem.bit_length()  # highest set bit position + 1
            zeros = (8 - bit) - top
            count += zeros
            bit += zeros + 1
            if bit == 8:
                bit = 0
                pos += 1
            self.pos, self.bit = pos, bit
            return count

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (FLAC uses CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0)

_CRC8_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# decoder

_BLOCKSIZE_CODES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# k-th difference coefficients of the FIXED predictors (order 0-4)
_FIXED_ORDERS = 5


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0 or n_extra > 6:
        raise FlacError("malformed UTF-8 frame number")
    val = first & (mask - 1)
    for _ in range(n_extra):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise FlacError("malformed UTF-8 frame number")
        val = (val << 6) | (b & 0x3F)
    return val


def _read_residual(r: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise FlacError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise FlacError("partition order does not divide block size")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(n_parts):
        n = blocksize // n_parts - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            raw_bits = r.read(5)
            for i in range(n):
                out[idx] = r.read_signed(raw_bits) if raw_bits else 0
                idx += 1
        else:
            for i in range(n):
                q = r.unary()
                u = (q << param) | r.read(param)
                out[idx] = (u >> 1) ^ -(u & 1)  # zigzag
                idx += 1
    return out


def _fixed_restore(residual: np.ndarray, warmup: list[int], order: int) -> np.ndarray:
    """Reconstruct a FIXED subframe: the residual is the order-th finite
    difference of the signal, so restoration is ``order`` cumulative sums,
    each seeded with the first element of the next-lower difference level
    (computable from the warmup samples alone) — fully vectorized."""
    if order == 0:
        return residual.astype(np.int64)
    w = np.asarray(warmup, dtype=np.int64)
    cur = residual.astype(np.int64)
    for k in range(order, 0, -1):
        first = w[0] if k == 1 else np.diff(w, n=k - 1)[0]
        cur = np.cumsum(np.concatenate(([first], cur)))
    return cur


def _subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise FlacError("subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        out = np.full(blocksize, r.read_signed(bps), dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= sf_type <= 12:  # FIXED
        order = sf_type - 8
        warmup = [r.read_signed(bps) for _ in range(order)]
        residual = _read_residual(r, blocksize, order)
        out = _fixed_restore(residual, warmup, order)
    elif sf_type >= 32:  # LPC
        order = sf_type - 31
        warmup = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision code 15")
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        residual = _read_residual(r, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warmup
        o = out  # python ints in a loop — LPC is the sequential part
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(o[i - 1 - j])
            o[i] = (pred >> shift) + residual[i - order]
    else:
        raise FlacError(f"reserved subframe type {sf_type}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC payload → ``(samples, rate)`` where samples is an
    ``(n, channels)`` int32 array."""
    if payload[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    sr = channels = bps = None
    total = 0
    while True:
        if pos + 4 > len(payload):
            raise FlacError("truncated metadata")
        head = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if head & 0x7F == 0:  # STREAMINFO
            if length < 34:
                raise FlacError("short STREAMINFO")
            r = _BitReader(body)
            r.read(16)  # min blocksize
            r.read(16)  # max blocksize
            r.read(24)
            r.read(24)
            sr = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
        pos += 4 + length
        if head & 0x80:
            break
    if sr is None:
        raise FlacError("missing STREAMINFO")
    if bps not in _SAMPLE_SIZE_CODES.values():
        raise FlacError(f"unsupported bits/sample {bps}")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    n_decoded = 0
    while pos < len(payload) and (total == 0 or n_decoded < total):
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise FlacError("lost frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise FlacError("reserved block size code 0")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise FlacError("invalid sample rate code 15")
        frame_bps = _SAMPLE_SIZE_CODES.get(ss_code, bps) if ss_code else bps
        r.align()
        header_bytes = payload[pos : r.pos]
        crc = r.read(8)
        if _crc8(header_bytes) != crc:
            raise FlacError("frame header CRC-8 mismatch")

        if chan_code <= 7:
            n_ch = chan_code + 1
            if n_ch != channels:
                raise FlacError("frame/stream channel count mismatch")
            subs = [_subframe(r, blocksize, frame_bps) for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            # the difference (side) channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _subframe(r, blocksize, frame_bps)
                side = _subframe(r, blocksize, frame_bps + 1)
                subs = [left, left - side]
            elif chan_code == 9:  # right/side
                side = _subframe(r, blocksize, frame_bps + 1)
                right = _subframe(r, blocksize, frame_bps)
                subs = [right + side, right]
            else:  # mid/side
                mid = _subframe(r, blocksize, frame_bps)
                side = _subframe(r, blocksize, frame_bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise FlacError(f"reserved channel assignment {chan_code}")
        r.align()
        r.read(16)  # frame CRC-16 (not verified — see module docstring)
        for c in range(channels):
            chans[c].append(subs[c])
        n_decoded += blocksize
        pos = r.pos

    if not chans[0]:
        return np.zeros((0, channels), dtype=np.int32), sr
    out = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        out = out[:total]
    return out.astype(np.int32), sr


# ---------------------------------------------------------------------------
# encoder (fixture builder)


def _best_fixed_order(block: np.ndarray, max_order: int = 2) -> int:
    best, best_cost = 0, None
    for order in range(max_order + 1):
        res = np.diff(block, n=order)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(residual: np.ndarray) -> int:
    if len(residual) == 0:
        return 0
    mean = max(1.0, float(np.abs(residual).mean()))
    return min(14, max(0, int(np.ceil(np.log2(mean))) + 1))


def _write_residual(w: _BitWriter, residual: np.ndarray) -> None:
    w.write(0, 2)  # method 0: 4-bit rice params
    w.write(0, 4)  # partition order 0
    param = _rice_param(residual)
    w.write(param, 4)
    for v in residual:
        v = int(v)
        u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _write_subframe(w: _BitWriter, block: np.ndarray, bps: int) -> None:
    w.write(0, 1)  # padding
    if len(block) and np.all(block == block[0]):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(block[0]) if len(block) else 0, bps)
        return
    order = _best_fixed_order(block)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    for v in block[:order]:
        w.write(int(v), bps)
    _write_residual(w, np.diff(block, n=order))


def encode_flac(
    samples: np.ndarray,
    rate: int = 16_000,
    blocksize: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """Encode int16 PCM (shape ``(n,)`` mono or ``(n, 2)`` stereo) as a
    real FLAC stream: fixed-blocksize frames, best FIXED predictor per
    frame with Rice-coded residuals, optional mid/side stereo."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if channels not in (1, 2):
        raise FlacError("encoder supports 1 or 2 channels")
    bps = 16

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(blocksize, 16)
    info.write(blocksize, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for frame_no, start in enumerate(range(0, n, blocksize)):
        block = samples[start : start + blocksize]
        bsz = len(block)
        h = _BitWriter()
        h.write(0x3FFE, 14)
        h.write(0, 1)
        h.write(0, 1)  # fixed blocking
        h.write(7, 4)  # 16-bit blocksize - 1 at end
        h.write(0, 4)  # sample rate from STREAMINFO
        use_ms = mid_side and channels == 2
        h.write(10 if use_ms else channels - 1, 4)
        h.write(4, 3)  # 16 bits/sample
        h.write(0, 1)
        # UTF-8 frame number
        fn = frame_no
        if fn < 0x80:
            h.write(fn, 8)
        elif fn < 0x800:
            h.write(0xC0 | (fn >> 6), 8)
            h.write(0x80 | (fn & 0x3F), 8)
        else:
            h.write(0xE0 | (fn >> 12), 8)
            h.write(0x80 | ((fn >> 6) & 0x3F), 8)
            h.write(0x80 | (fn & 0x3F), 8)
        h.write(bsz - 1, 16)
        h.align()
        header = h.bytes()
        frame = bytearray(header)
        frame.append(_crc8(header))

        w = _BitWriter()
        if use_ms:
            left = block[:, 0]
            right = block[:, 1]
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(w, mid, bps)
            _write_subframe(w, side, bps + 1)
        else:
            for c in range(channels):
                _write_subframe(w, block[:, c], bps)
        w.align()
        frame += w.bytes()
        frame += _crc16(bytes(frame)).to_bytes(2, "big")
        out += frame
    return bytes(out)
