"""From-scratch baseline JPEG codec (pure Python + numpy, stdlib only).

Decoder: baseline sequential DCT (SOF0), 8-bit samples, grayscale or
3-component YCbCr with arbitrary h/v sampling factors (4:4:4, 4:2:2,
4:2:0), restart markers, 0xFF00 byte unstuffing. Output is the LUMA (Y)
plane as an (H, W) uint8 array — chroma blocks are entropy-decoded (the
bitstream is serial, they cannot be skipped) but not IDCT'd, since every
downstream feature kernel in this engine consumes grayscale. Construction
follows the public JPEG spec (ITU-T T.81): canonical Huffman from DHT
BITS/HUFFVAL, zigzag order, type-II DCT basis.

Progressive (SOF2, round 4): multi-scan decoding per ITU-T T.81 Annex G —
DC first/refinement scans (interleaved or single-component), AC
first/refinement scans with EOB-run decoding and the G.1.2.3 correction-
bit algorithm. Single-component scans of non-luma components are SKIPPED
by scanning to the next marker (entropy segments are marker-delimited),
so chroma costs nothing; interleaved DC scans entropy-decode chroma to
advance the serial bitstream, as in baseline.

Declared unsupported (typed ``NotImplementedError``): arithmetic coding,
lossless/hierarchical SOFs, 12-bit precision, 16-bit quant tables, CMYK
(4 components). Corrupt payloads raise ``ValueError`` — the media stage's
per-row containment turns either into a ``decode_error`` row.

Encoder: fixture-grade baseline encoder (grayscale, optional 4:2:0 color
wrapping with neutral chroma) with a configurable flat quantization table.
With a flat quant value of 8, a constant 8×8 block round-trips EXACTLY
(DC = (v-128)*8 quantizes losslessly and the DC-only IDCT is constant),
which is what gives Q ``media_features`` an exact SQL oracle over real
JPEG bytes.

Performance shape: Huffman decoding is inherently bit-serial, so the
per-image loop is Python; corpus-scale parallelism comes from the
actor-pool ``map_batches`` stage it runs in (one image per iteration,
images per batch × actors in flight). The IDCT is a vectorized numpy
matmul over all of an image's Y blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

# Type-II orthonormal DCT basis: row k, column n.
_DCT_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_T[_k, _n] = 0.5 * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_DCT_T[0, :] = 1.0 / np.sqrt(8.0)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Standard Huffman tables (JPEG Annex K) — (BITS counts per code length
# 1..16, HUFFVAL symbol list).
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical Huffman assignment (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — the decoder-side view of the same codes."""
    return {
        (length, code): sym for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> bytes:
        if self._n:
            self._acc = (self._acc << (8 - self._n)) | ((1 << (8 - self._n)) - 1)
            self.out.append(self._acc)
            if self._acc == 0xFF:
                self.out.append(0x00)
            self._acc = 0
            self._n = 0
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise ValueError("marker inside entropy data")
            else:
                self.pos += 1
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int | None:
        """Byte-align and consume an RSTn marker if present; returns the
        marker byte (0xD0..0xD7) or None."""
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            marker = self.data[self.pos + 1]
            self.pos += 2
            return marker
        return None

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` raw bits to a signed coefficient."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W) uint8 LUMA plane. See module docstring.

    Typed-error contract (round-5 mutation fuzz): corrupt streams that
    slip past the targeted marker checks (truncated segments, Huffman
    table indices off the end) raise ``ValueError``, never a raw
    IndexError — per-document containment keys on the typed error."""
    try:
        return _decode_jpeg_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, TypeError, struct.error) as exc:
        raise ValueError(
            f"corrupt JPEG stream ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables unsupported")
                quant[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], np.uint8
                ).astype(np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("12-bit precision unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError("CMYK/4-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # SOF2 progressive (Huffman)
            return _decode_progressive_jpeg(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/hierarchical/arithmetic JPEG unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + c * 2 : 3 + c * 2]
                scan_comps.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            pos += 2 + seg_len
            break
        pos += 2 + seg_len

    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        if sc["cs"] not in by_id:
            raise ValueError("scan references unknown component")
        by_id[sc["cs"]]["td"] = sc["td"]
        by_id[sc["cs"]]["ta"] = sc["ta"]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)

    y_comp = comps[0]
    yq = quant.get(y_comp["tq"])
    if yq is None:
        raise ValueError("missing quantization table")
    y_blocks_x = mcus_x * y_comp["h"]
    y_blocks_y = mcus_y * y_comp["v"]
    y_coeffs = np.zeros((y_blocks_y * y_blocks_x, 64), dtype=np.int32)

    reader = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if reader.align_to_marker() is None:
                    raise ValueError("expected restart marker")
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dct = dc_tables.get(c.get("td"))
                act = ac_tables.get(c.get("ta"))
                if dct is None or act is None:
                    raise ValueError("missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        # DC
                        s = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(s), s)
                        pred[c["id"]] += diff
                        coeffs = None
                        if c is y_comp:
                            bi = (my * c["v"] + by) * y_blocks_x + (mx * c["h"] + bx)
                            coeffs = y_coeffs[bi]
                            coeffs[0] = pred[c["id"]]
                        # AC (must be entropy-decoded even for chroma to
                        # advance the serial bitstream)
                        k = 1
                        while k < 64:
                            sym = reader.decode_symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient overrun")
                            val = _extend(reader.read_bits(size), size)
                            if coeffs is not None:
                                coeffs[k] = val
                            k += 1
            mcu_count += 1

    return _reconstruct_luma(
        y_coeffs, yq, y_blocks_x, y_blocks_y, frame, y_comp, hmax, vmax
    )


def _reconstruct_luma(
    y_coeffs: np.ndarray,
    yq: np.ndarray,
    y_blocks_x: int,
    y_blocks_y: int,
    frame: dict,
    y_comp: dict,
    hmax: int,
    vmax: int,
) -> np.ndarray:
    """Vectorized dequant + dezigzag + IDCT over ALL Y blocks at once,
    then crop to the component's sample area (shared by the baseline and
    progressive paths)."""
    deq = (y_coeffs * yq[None, :]).astype(np.float64)
    mats = np.zeros((len(deq), 64))
    mats[:, _ZIGZAG] = deq
    mats = mats.reshape(-1, 8, 8)
    spatial = np.einsum("ki,nkl,lj->nij", _DCT_T, mats, _DCT_T)
    px = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)

    out = np.zeros((y_blocks_y * 8, y_blocks_x * 8), dtype=np.uint8)
    for by in range(y_blocks_y):
        for bx in range(y_blocks_x):
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px[by * y_blocks_x + bx]
    # Y is subsampled relative to the frame when hmax/vmax > Y's factors.
    ys = frame["h"] * y_comp["v"] // vmax
    xs = frame["w"] * y_comp["h"] // hmax
    return out[:ys, :xs]


def _skip_entropy(payload: bytes, pos: int) -> int:
    """Advance past an entropy-coded segment: the next 0xFF followed by a
    byte that is neither 0x00 stuffing nor an RSTn marker ends it."""
    while pos < len(payload):
        nxt = payload.find(b"\xff", pos)
        if nxt < 0 or nxt + 1 >= len(payload):
            return len(payload)
        b = payload[nxt + 1]
        if b == 0x00 or 0xD0 <= b <= 0xD7:
            pos = nxt + 2
            continue
        return nxt
    return pos


def _decode_progressive_jpeg(payload: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2) → (H, W) uint8 LUMA plane.

    T.81 Annex G successive-approximation / spectral-selection decoding:
    every scan accumulates into the Y coefficient array (zigzag order,
    same layout as the baseline path); the shared dequant/IDCT tail runs
    once at EOI. Non-luma single-component scans are skipped at marker
    granularity (no entropy decode at all); interleaved DC scans decode
    chroma symbols to advance the bitstream but store nothing."""
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    y_coeffs = None
    saw_scan = False

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        if pos + 4 > len(payload):
            raise ValueError("JPEG truncated in marker segment")
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables unsupported")
                quant[tq] = np.frombuffer(seg[p + 1 : p + 65], np.uint8).astype(
                    np.int32
                )
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC2:  # SOF2
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("12-bit precision unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError("CMYK/4-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("multiple/conflicting SOF markers")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if y_coeffs is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                y_comp = frame["comps"][0]
                mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
                y_blocks_x = mcus_x * y_comp["h"]
                y_blocks_y = mcus_y * y_comp["v"]
                y_coeffs = np.zeros((y_blocks_y * y_blocks_x, 64), dtype=np.int32)
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + c * 2 : 3 + c * 2]
                scan_comps.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            ss, se, ahal = seg[1 + ns * 2 : 4 + ns * 2]
            ah, al = ahal >> 4, ahal & 0xF
            pos += 2 + seg_len
            pos = _decode_progressive_scan(
                payload,
                pos,
                frame,
                scan_comps,
                ss,
                se,
                ah,
                al,
                dc_tables,
                ac_tables,
                restart_interval,
                y_coeffs,
                y_blocks_x,
                mcus_x,
                mcus_y,
                hmax,
                vmax,
            )
            saw_scan = True
            continue
        pos += 2 + seg_len

    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    yq = quant.get(frame["comps"][0]["tq"])
    if yq is None:
        raise ValueError("missing quantization table")
    return _reconstruct_luma(
        y_coeffs, yq, y_blocks_x, y_blocks_y, frame, y_comp, hmax, vmax
    )


def _decode_progressive_scan(
    payload: bytes,
    pos: int,
    frame: dict,
    scan_comps: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_tables: dict,
    ac_tables: dict,
    restart_interval: int,
    y_coeffs: np.ndarray,
    y_blocks_x: int,
    mcus_x: int,
    mcus_y: int,
    hmax: int,
    vmax: int,
) -> int:
    """Decode ONE progressive scan's entropy data; returns the position of
    the next marker. The Y component's coefficients accumulate into
    ``y_coeffs`` (zigzag order); other components either advance the
    bitstream (interleaved DC) or are skipped wholesale."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    y_id = comps[0]["id"]
    for sc in scan_comps:
        if sc["cs"] not in by_id:
            raise ValueError("scan references unknown component")

    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("interleaved AC scan is invalid in progressive JPEG")
    if len(scan_comps) == 1 and scan_comps[0]["cs"] != y_id:
        return _skip_entropy(payload, pos)  # chroma-only scan: not needed

    reader = _BitReader(payload, pos)
    eobrun = 0
    preds = {sc["cs"]: 0 for sc in scan_comps}

    def dc_first(coef, comp_id, dct):
        s = reader.decode_symbol(dct)
        preds[comp_id] += _extend(reader.read_bits(s), s)
        if coef is not None:
            coef[0] = preds[comp_id] << al

    def dc_refine(coef):
        bit = reader.read_bit()
        if coef is not None and bit:
            coef[0] |= 1 << al

    p1 = 1 << al
    m1 = -(1 << al)

    def ac_first(coef, act):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = reader.decode_symbol(act)
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:  # EOBn
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += reader.read_bits(run)
                    return
                k += 16  # ZRL
                continue
            k += run
            if k > se:
                raise ValueError("AC coefficient overrun")
            coef[k] = _extend(reader.read_bits(size), size) << al
            k += 1

    def ac_refine(coef, act):
        # T.81 G.1.2.3 correction-bit decoding (the classic serial form).
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = reader.decode_symbol(act)
                run, size = sym >> 4, sym & 0xF
                newval = 0
                if size == 0:
                    if run != 15:  # EOBn — the tail loop below finishes
                        # this block's correction bits and consumes one
                        # run unit (unlike ac_first's immediate return).
                        eobrun = 1 << run
                        if run:
                            eobrun += reader.read_bits(run)
                        break
                    # ZRL: skip 16 zero-history positions
                else:
                    if size != 1:
                        raise ValueError("invalid AC refinement symbol")
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    c = int(coef[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            coef[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if newval and k <= se:
                    coef[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                c = int(coef[k])
                if c != 0 and reader.read_bit() and (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1

    def restart():
        nonlocal eobrun
        if reader.align_to_marker() is None:
            raise ValueError("expected restart marker")
        for cid in preds:
            preds[cid] = 0
        eobrun = 0

    if len(scan_comps) > 1:  # interleaved: DC scans only (ss == 0)
        if ss != 0 or se != 0:
            raise ValueError("interleaved progressive scan must be DC-only")
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                for sc in scan_comps:
                    c = by_id[sc["cs"]]
                    keep = c["id"] == y_id
                    dct = dc_tables.get(sc["td"])
                    if ah == 0 and dct is None:
                        raise ValueError("missing Huffman table")
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = None
                            if keep:
                                bi = (my * c["v"] + by) * y_blocks_x + (
                                    mx * c["h"] + bx
                                )
                                coef = y_coeffs[bi]
                            if ah == 0:
                                dc_first(coef, c["id"], dct)
                            else:
                                dc_refine(coef)
                unit += 1
    else:  # single-component (Y) scan: non-interleaved block grid
        sc = scan_comps[0]
        c = by_id[sc["cs"]]
        comp_w = (frame["w"] * c["h"] + hmax - 1) // hmax
        comp_h = (frame["h"] * c["v"] + vmax - 1) // vmax
        bw = (comp_w + 7) // 8
        bh = (comp_h + 7) // 8
        dct = dc_tables.get(sc["td"])
        act = ac_tables.get(sc["ta"])
        if ss == 0 and ah == 0 and dct is None:
            raise ValueError("missing Huffman table")
        if ss > 0 and act is None:
            raise ValueError("missing Huffman table")
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                coef = y_coeffs[by * y_blocks_x + bx]
                if ss == 0:
                    if ah == 0:
                        dc_first(coef, c["id"], dct)
                    else:
                        dc_refine(coef)
                else:
                    if ah == 0:
                        ac_first(coef, act)
                    else:
                        ac_refine(coef, act)
                unit += 1

    return _skip_entropy(payload, reader.pos)


def _encode_block(
    writer: _BitWriter,
    coeffs: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Huffman-encode one quantized zigzag block; returns the new DC pred."""
    dc = int(coeffs[0])
    diff = dc - pred
    mag = abs(diff)
    size = int(mag).bit_length()
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_codes[run * 16 + size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return dc


def encode_jpeg_gray(
    img: np.ndarray, quant_value: int = 8, color: bool = False
) -> bytes:
    """Fixture-grade baseline JPEG encoder.

    ``img`` is (H, W) uint8. A FLAT quantization table of ``quant_value``
    is used (value 8 makes constant 8×8 blocks round-trip exactly; value 1
    bounds arbitrary-content round-trip error to DCT rounding).
    ``color=True`` wraps the gray image as a 3-component 4:2:0 YCbCr frame
    with neutral chroma (all-zero coefficient blocks) — same decoded luma,
    but it exercises the decoder's full MCU/sampling-factor interleave.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    qtab = np.full(64, int(quant_value), dtype=np.int32)
    dc_codes = _canonical_codes(*_STD_DC_LUM)
    ac_codes = _canonical_codes(*_STD_AC_LUM)

    def segment(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += segment(0xDB, bytes([0]) + bytes(qtab.tolist()))
    if color:
        comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
        out += segment(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([3]) + comps)
    else:
        out += segment(
            0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        )
    bits_dc, vals_dc = _STD_DC_LUM
    bits_ac, vals_ac = _STD_AC_LUM
    out += segment(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(vals_dc))
    out += segment(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(vals_ac))
    if color:
        sos_body = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    else:
        sos_body = bytes([1, 1, 0x00, 0, 63, 0])
    out += segment(0xDA, sos_body)

    # Pad to full MCUs by edge replication.
    unit = 16 if color else 8
    ph = (h + unit - 1) // unit * unit
    pw = (w + unit - 1) // unit * unit
    padded = np.zeros((ph, pw), dtype=np.uint8)
    padded[:h, :w] = img
    if ph > h:
        padded[h:, :w] = img[-1:, :]
    if pw > w:
        padded[:, w:] = padded[:, w - 1 : w]

    writer = _BitWriter()
    pred_y = 0
    pred_cb = 0
    pred_cr = 0
    zero_block = np.zeros(64, dtype=np.int32)
    mcus_y = ph // unit
    mcus_x = pw // unit
    yb_per = 4 if color else 1
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for b in range(yb_per):
                if color:
                    by, bx = divmod(b, 2)
                    y0 = my * 16 + by * 8
                    x0 = mx * 16 + bx * 8
                else:
                    y0, x0 = my * 8, mx * 8
                block = padded[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
                coef = _DCT_T @ block @ _DCT_T.T
                # FLAT quant table: quantize in natural order, then reorder
                # to the zigzag transmission order.
                nat = np.round(coef / float(quant_value)).astype(np.int32)
                zz = nat.reshape(64)[_ZIGZAG]
                pred_y = _encode_block(writer, zz, pred_y, dc_codes, ac_codes)
            if color:
                pred_cb = _encode_block(writer, zero_block, pred_cb, dc_codes, ac_codes)
                pred_cr = _encode_block(writer, zero_block, pred_cr, dc_codes, ac_codes)
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# Encoder-side AC table for progressive scans: all 256 symbols must be
# codable (EOBn symbols n<<4 are absent from the Annex K table), so use a
# trivial canonical table — 255 symbols at 9 bits + 0xFF at 10 (a BITS
# byte caps at 255).
_PROG_AC = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def encode_jpeg_progressive_gray(
    img: np.ndarray, quant_value: int = 8, color: bool = False
) -> bytes:
    """Fixture-grade progressive (SOF2) JPEG encoder.

    Same quantized coefficients as :func:`encode_jpeg_gray` (flat quant
    table; ``color=True`` wraps as 4:2:0 YCbCr with neutral chroma), sent
    over a T.81 Annex G scan script that exercises every progressive
    decode path: DC first at Al=1 + DC refinement (interleaved when
    color), AC first scans with spectral selection at Al=2 (EOB-run
    coding), and two AC refinement passes (correction bits, G.1.2.3).
    Decoding therefore reproduces the baseline encoder's pixels exactly.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    qtab = np.full(64, int(quant_value), dtype=np.int32)
    dc_codes = _canonical_codes(*_STD_DC_LUM)
    ac_codes = _canonical_codes(*_PROG_AC)

    def segment(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += segment(0xDB, bytes([0]) + bytes(qtab.tolist()))
    if color:
        comps = bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
        out += segment(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([3]) + comps)
    else:
        out += segment(
            0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        )
    bits_dc, vals_dc = _STD_DC_LUM
    bits_ac, vals_ac = _PROG_AC
    out += segment(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(vals_dc))
    out += segment(0xC4, bytes([0x11]) + bytes(bits_ac) + bytes(vals_ac))

    # Quantized zigzag coefficients for every Y block, MCU order (the same
    # transform the baseline encoder applies).
    unit = 16 if color else 8
    ph = (h + unit - 1) // unit * unit
    pw = (w + unit - 1) // unit * unit
    padded = np.zeros((ph, pw), dtype=np.uint8)
    padded[:h, :w] = img
    if ph > h:
        padded[h:, :w] = img[-1:, :]
    if pw > w:
        padded[:, w:] = padded[:, w - 1 : w]
    mcus_y = ph // unit
    mcus_x = pw // unit
    # Zigzag coefficient blocks over the full MCU-padded Y grid.
    grid: list[list[np.ndarray]] = []
    for by in range(ph // 8):
        row = []
        for bx in range(pw // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128.0
            coef = _DCT_T @ block @ _DCT_T.T
            nat = np.round(coef / float(quant_value)).astype(np.int64)
            row.append(nat.reshape(64)[_ZIGZAG])
        grid.append(row)
    # DC scans walk MCU order (interleaved when color: 2x2 Y sub-blocks);
    # AC scans are non-interleaved — row-major over the component's own
    # ceil(h/8) x ceil(w/8) grid, excluding MCU padding blocks.
    mcu_blocks: list[list[np.ndarray]] = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if color:
                mcu_blocks.append(
                    [grid[my * 2 + sy][mx * 2 + sx] for sy in (0, 1) for sx in (0, 1)]
                )
            else:
                mcu_blocks.append([grid[my][mx]])
    bh_ac = (h + 7) // 8
    bw_ac = (w + 7) // 8
    y_blocks = [grid[by][bx] for by in range(bh_ac) for bx in range(bw_ac)]

    def sos_header(comp_specs: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comp_specs)])
        for cs, td, ta in comp_specs:
            body += bytes([cs, (td << 4) | ta])
        return segment(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def write_bits(writer, v: int, size: int) -> None:
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)

    def dc_scan(ah: int, al: int) -> bytes:
        writer = _BitWriter()
        if ah == 0:
            preds = {1: 0, 2: 0, 3: 0}
            for blocks in mcu_blocks:
                for blk in blocks:
                    v = int(blk[0]) >> al
                    diff = v - preds[1]
                    preds[1] = v
                    size = abs(diff).bit_length()
                    code, length = dc_codes[size]
                    writer.write(code, length)
                    if size:
                        write_bits(writer, diff, size)
                if color:  # neutral chroma: zero diffs
                    for _cid in (2, 3):
                        code, length = dc_codes[0]
                        writer.write(code, length)
        else:
            for blocks in mcu_blocks:
                for blk in blocks:
                    writer.write((int(blk[0]) >> al) & 1, 1)
                if color:
                    writer.write(0, 1)
                    writer.write(0, 1)
        return writer.flush()

    def ac_first_scan(ss, se, al) -> bytes:
        writer = _BitWriter()
        state = {"eobrun": 0}

        def emit_eobrun():
            if state["eobrun"] > 0:
                n = state["eobrun"].bit_length() - 1
                code, length = ac_codes[n << 4]
                writer.write(code, length)
                if n:
                    writer.write(state["eobrun"] & ((1 << n) - 1), n)
                state["eobrun"] = 0

        for blk in y_blocks:
            r = 0
            wrote = False
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                emit_eobrun()
                while r > 15:
                    code, length = ac_codes[0xF0]
                    writer.write(code, length)
                    r -= 16
                size = t.bit_length()
                code, length = ac_codes[(r << 4) | size]
                writer.write(code, length)
                write_bits(writer, t if v >= 0 else -t, size)
                r = 0
                wrote = True
            if r > 0 or not wrote:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    emit_eobrun()
        emit_eobrun()
        return writer.flush()

    def ac_refine_scan(ss, se, ah, al) -> bytes:
        # jcphuff-style G.1.2.3 encoder: correction bits buffer per block
        # (br) and across EOB-run blocks (be).
        writer = _BitWriter()
        state = {"eobrun": 0, "be": []}

        def emit_eobrun():
            if state["eobrun"] > 0:
                n = state["eobrun"].bit_length() - 1
                code, length = ac_codes[n << 4]
                writer.write(code, length)
                if n:
                    writer.write(state["eobrun"] & ((1 << n) - 1), n)
                state["eobrun"] = 0
                for b in state["be"]:
                    writer.write(b, 1)
                state["be"] = []

        for blk in y_blocks:
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eob = ss - 1  # last newly-nonzero index
            for i, a in enumerate(absv):
                if a == 1:
                    eob = ss + i
            r = 0
            br: list[int] = []
            for i, k in enumerate(range(ss, se + 1)):
                temp = absv[i]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    emit_eobrun()
                    code, length = ac_codes[0xF0]
                    writer.write(code, length)
                    r -= 16
                    for b in br:
                        writer.write(b, 1)
                    br = []
                if temp > 1:  # history-nonzero: correction bit only
                    br.append(temp & 1)
                    continue
                emit_eobrun()
                code, length = ac_codes[(r << 4) | 1]
                writer.write(code, length)
                writer.write(1 if int(blk[k]) >= 0 else 0, 1)
                for b in br:
                    writer.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                state["eobrun"] += 1
                state["be"].extend(br)
                if state["eobrun"] == 0x7FFF:
                    emit_eobrun()
        emit_eobrun()
        return writer.flush()

    dc_specs = (
        [(1, 0, 0), (2, 0, 0), (3, 0, 0)] if color else [(1, 0, 0)]
    )
    out += sos_header(dc_specs, 0, 0, 0, 1)
    out += dc_scan(0, 1)
    out += sos_header(dc_specs, 0, 0, 1, 0)
    out += dc_scan(1, 0)
    out += sos_header([(1, 0, 1)], 1, 5, 0, 2)
    out += ac_first_scan(1, 5, 2)
    out += sos_header([(1, 0, 1)], 6, 63, 0, 2)
    out += ac_first_scan(6, 63, 2)
    out += sos_header([(1, 0, 1)], 1, 63, 2, 1)
    out += ac_refine_scan(1, 63, 2, 1)
    out += sos_header([(1, 0, 1)], 1, 63, 1, 0)
    out += ac_refine_scan(1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# GIF (87a/89a) — first frame, from scratch on the public spec
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes, clear/EOI at
    ``2^min_code_size`` / ``+1``, width grows AFTER the table fills (no
    early change — unlike the PDF/TIFF variant in functions.pdf_codec)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF LZW: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW: code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def decode_gif(payload: bytes) -> "np.ndarray":
    """GIF87a/89a first image frame → (H, W) uint8 grayscale (integer
    (299r+587g+114b)/1000 luma over the palette). Supports global and
    local color tables, interlaced frames, extension-block skipping.
    Animated GIFs decode their FIRST frame. Corrupt streams raise
    ``ValueError`` (typed-error contract, round-5 fuzz)."""
    try:
        return _decode_gif_impl(payload)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, TypeError, struct.error) as exc:
        raise ValueError(
            f"corrupt GIF ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_gif_impl(payload: bytes) -> "np.ndarray":
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[pos : pos + 7])
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError("GIF: bad block introducer")
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF: no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_gif_lzw_decode(bytes(data), min_code), np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF: pixel data truncated")
        idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:  # interlaced: 4-pass row order
            order = np.concatenate(
                [
                    np.arange(0, h, 8),
                    np.arange(4, h, 8),
                    np.arange(2, h, 4),
                    np.arange(1, h, 2),
                ]
            )
            deinterlaced = np.empty_like(idx)
            deinterlaced[order] = idx
            idx = deinterlaced
        rgb = table[np.clip(idx, 0, len(table) - 1)].astype(np.uint32)
        return (
            (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
        ).astype(np.uint8)
    raise ValueError("GIF: no image descriptor")


def encode_gif_gray(img: "np.ndarray", interlaced: bool = False) -> bytes:
    """Fixture-grade GIF89a encoder: 256-entry grayscale palette (index ==
    intensity), LSB-first LZW with the mandatory initial clear code."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += bytes(v for i in range(256) for v in (i, i, i))
    iflags = 0x40 if interlaced else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    rows = img
    if interlaced:
        order = np.concatenate(
            [
                np.arange(0, h, 8),
                np.arange(4, h, 8),
                np.arange(2, h, 4),
                np.arange(1, h, 2),
            ]
        )
        rows = img[order]
    pixels = rows.reshape(-1)
    min_code = 8
    clear, eoi = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    acc = 0
    nbits = 0
    body = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq = b""
    for px in pixels.tobytes():
        cand = seq + bytes([px])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        seq = bytes([px])
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        body.append(acc & 0xFF)
    out += bytes([min_code])
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (baseline 8-bit) — from scratch on the public TIFF 6.0 spec
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits: n in 0..127 = copy n+1 literals, 129..255 = repeat
    next byte 257-n times, 128 = no-op (NOT EOD — unlike PDF RunLength)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 128:
            continue
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        else:
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    return bytes(out)


def decode_tiff(payload: bytes) -> "np.ndarray":
    """Baseline TIFF → (H, W) uint8 grayscale luma.

    Supported: both byte orders, first IFD, 8 bits/sample, gray
    (photometric 0/1) and RGB (2), Compression 1 (none) / 5 (TIFF-LZW,
    via the shared PDF-variant decoder) / 32773 (PackBits), strip layout,
    Predictor 2 (horizontal differencing). Declared unsupported: tiles,
    16-bit, CCITT/JPEG-in-TIFF, planar configuration 2."""
    from ..functions.pdf_codec import _lzw_decode

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    try:
        return _decode_tiff_body(payload, bo)
    except (struct.error, IndexError, KeyError, TypeError) as exc:
        # truncated header/IFD or corrupt LZW/PackBits state (round-5
        # fuzz): typed-error contract, never a raw IndexError.
        raise ValueError(f"corrupt TIFF ({type(exc).__name__}: {exc})") from exc


def _decode_tiff_body(payload: bytes, bo: str) -> "np.ndarray":
    from ..functions.pdf_codec import _lzw_decode

    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4}
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        tag, typ = struct.unpack(bo + "HH", payload[off : off + 4])
        (count,) = struct.unpack(bo + "I", payload[off + 4 : off + 8])
        if typ not in type_size:
            continue
        # count is attacker-controlled up to 2^32: bound it by the bytes
        # that can actually exist (round-5 fuzz: building a 4-billion-
        # char struct format string was a multi-second spin per call).
        if count > len(payload):
            raise ValueError("TIFF: IFD value count exceeds file size")
        sz = type_size[typ] * count
        if sz <= 4:
            raw = payload[off + 8 : off + 8 + sz]
        else:
            (voff,) = struct.unpack(bo + "I", payload[off + 8 : off + 12])
            raw = payload[voff : voff + sz]
        if len(raw) != sz:
            raise ValueError("TIFF: IFD value truncated")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(bo + fmt * count, raw))

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing tag {tag}")
        return default

    w, h = one(256), one(257)
    if not (0 < w <= 1 << 15 and 0 < h <= 1 << 15 and w * h <= 1 << 26):
        raise ValueError(f"TIFF: implausible dimensions {w}x{h}")
    bps = tags.get(258, [8])
    if any(b != 8 for b in bps):
        raise NotImplementedError("TIFF: 8 bits/sample only")
    compression = one(259, 1)
    photometric = one(262, 1)
    spp = one(277, 1)
    predictor = one(317, 1)
    if one(284, 1) != 1:
        raise NotImplementedError("TIFF: planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("TIFF: tiled layout unsupported")
    if photometric not in (0, 1, 2):
        raise NotImplementedError("TIFF: palette/CMYK photometric unsupported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF: missing strip offsets/byte counts")
    rows_per_strip = one(278, h)

    raw = bytearray()
    for soff, scnt in zip(offsets, counts):
        chunk = payload[soff : soff + scnt]
        if len(chunk) != scnt:
            raise ValueError("TIFF: strip data truncated")
        if compression == 1:
            raw += chunk
        elif compression == 5:
            raw += _lzw_decode(chunk, early_change=1)
        elif compression == 32773:
            raw += _packbits_decode(chunk)
        else:
            raise NotImplementedError(f"TIFF: compression {compression} unsupported")
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("TIFF: pixel data truncated")
    px = np.frombuffer(bytes(raw[:need]), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        px = np.cumsum(px.astype(np.uint64), axis=1).astype(np.uint8)
    if photometric == 2:
        if spp < 3:
            raise ValueError("TIFF: RGB with <3 samples")
        r = px[:, :, 0].astype(np.uint32)
        g = px[:, :, 1].astype(np.uint32)
        b = px[:, :, 2].astype(np.uint32)
        return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
    gray = px[:, :, 0]
    if photometric == 0:  # WhiteIsZero
        gray = (255 - gray.astype(np.int16)).astype(np.uint8)
    return gray.copy()


def encode_tiff_gray(
    img: "np.ndarray",
    compression: int = 1,
    rows_per_strip: int = 8,
    predictor: int = 1,
) -> bytes:
    """Fixture-grade little-endian grayscale TIFF encoder (compression 1 =
    none, 5 = TIFF-LZW, 32773 = PackBits; optional Predictor 2)."""
    from ..functions.pdf_codec import _lzw_encode

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = img[r0 : r0 + rows_per_strip]
        if predictor == 2:
            rows = np.diff(
                rows.astype(np.int16), axis=1, prepend=np.zeros((len(rows), 1))
            ).astype(np.uint8)
        data = rows.tobytes()
        if compression == 5:
            data = _lzw_encode(data, early_change=1)
        elif compression == 32773:
            out = bytearray()
            for row in rows:
                rb = row.tobytes()
                i = 0
                while i < len(rb):
                    lit = rb[i : i + 128]
                    out.append(len(lit) - 1)
                    out += lit
                    i += len(lit)
            data = bytes(out)
        strips.append(data)

    n_strips = len(strips)
    header = bytearray(b"II*\x00")
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, compression), (262, 3, 1, 1),
        (273, 4, n_strips, None),  # offsets filled later
        (277, 3, 1, 1), (278, 3, 1, rows_per_strip),
        (279, 4, n_strips, None),  # counts filled later
        (284, 3, 1, 1), (317, 3, 1, predictor),
    ]
    ifd_off = 8
    ifd_size = 2 + len(entries) * 12 + 4
    arrays_off = ifd_off + ifd_size
    # external arrays: strip offsets + counts when n_strips > 1
    ext = bytearray()
    data_off = arrays_off + (8 * n_strips if n_strips > 1 else 0)
    offsets = []
    pos = data_off
    for sdata in strips:
        offsets.append(pos)
        pos += len(sdata)
    counts = [len(sd) for sd in strips]

    header += struct.pack("<I", ifd_off)
    ifd = bytearray(struct.pack("<H", len(entries)))
    for tag, typ, count, val in entries:
        if tag == 273:
            v = offsets[0] if n_strips == 1 else arrays_off
        elif tag == 279:
            v = counts[0] if n_strips == 1 else arrays_off + 4 * n_strips
        else:
            v = val
        ifd += struct.pack("<HHII", tag, typ, count, v)
    ifd += struct.pack("<I", 0)  # next IFD
    if n_strips > 1:
        ext += struct.pack("<" + "I" * n_strips, *offsets)
        ext += struct.pack("<" + "I" * n_strips, *counts)
    return bytes(header) + bytes(ifd) + bytes(ext) + b"".join(strips)


# ---------------------------------------------------------------------------
# EXIF metadata (APP1 TIFF IFDs) — image-curation metadata without decode
# ---------------------------------------------------------------------------

_EXIF_ASCII = {0x010F: "make", 0x0110: "model", 0x0132: "datetime"}
_EXIF_SHORT = {0x0112: "orientation"}
_EXIF_SUB = {0xA002: "pixel_x", 0xA003: "pixel_y", 0x8827: "iso"}


def _read_ifd_entries(payload: bytes, bo: str, ifd_off: int) -> dict[int, tuple]:
    """One IFD → {tag: (type, [values])}; ASCII kept as raw bytes,
    RATIONAL as (num, den) pairs. Truncated entries are skipped — EXIF in
    the wild is best-effort."""
    out: dict[int, tuple] = {}
    if ifd_off + 2 > len(payload):
        return out
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        if off + 12 > len(payload):
            break
        tag, typ = struct.unpack(bo + "HH", payload[off : off + 4])
        (count,) = struct.unpack(bo + "I", payload[off + 4 : off + 8])
        if typ not in type_size or count > 1 << 20:
            continue
        sz = type_size[typ] * count
        if sz <= 4:
            raw = payload[off + 8 : off + 8 + sz]
        else:
            (voff,) = struct.unpack(bo + "I", payload[off + 8 : off + 12])
            raw = payload[voff : voff + sz]
        if len(raw) != sz:
            continue
        if typ == 2:
            out[tag] = (typ, [raw])
        elif typ == 5:
            vals = struct.unpack(bo + "II" * count, raw)
            out[tag] = (typ, list(zip(vals[0::2], vals[1::2])))
        else:
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            out[tag] = (typ, list(struct.unpack(bo + fmt * count, raw)))
    return out


def parse_exif(payload: bytes) -> dict:
    """EXIF fields from a JPEG (APP1 ``Exif\\0\\0`` segment) or a bare
    TIFF blob: orientation, make, model, datetime, pixel_x, pixel_y, iso
    — ``None`` where absent, ``has_exif=False`` when no EXIF structure
    exists at all. Parses IFD0 + the Exif sub-IFD (tag 0x8769) with the
    engine's own TIFF IFD reader; never decodes pixels, so it is safe on
    any image the decoders reject."""
    tiff = None
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        tiff = payload
    elif payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
                tiff = payload[pos + 10 : pos + 2 + seg_len]
                break
            if marker == 0xDA:  # SOS: no APP segments past here
                break
            pos += 2 + seg_len
    out: dict = {k: None for k in ("orientation", "make", "model", "datetime",
                                   "pixel_x", "pixel_y", "iso")}
    out["has_exif"] = False
    if tiff is None or len(tiff) < 8:
        return out
    bo = "<" if tiff[:2] == b"II" else ">"
    try:
        (ifd_off,) = struct.unpack(bo + "I", tiff[4:8])
        ifd0 = _read_ifd_entries(tiff, bo, ifd_off)
    except struct.error:
        return out
    if not ifd0:
        return out
    out["has_exif"] = True
    for tag, name in _EXIF_ASCII.items():
        if tag in ifd0 and ifd0[tag][0] == 2:
            out[name] = ifd0[tag][1][0].split(b"\x00")[0].decode(
                "ascii", errors="replace"
            )
    for tag, name in _EXIF_SHORT.items():
        if tag in ifd0 and ifd0[tag][1]:
            out[name] = int(ifd0[tag][1][0])
    if 0x8769 in ifd0 and ifd0[0x8769][1]:
        sub = _read_ifd_entries(tiff, bo, int(ifd0[0x8769][1][0]))
        for tag, name in _EXIF_SUB.items():
            if tag in sub and sub[tag][1]:
                v = sub[tag][1][0]
                out[name] = int(v[0] // max(v[1], 1)) if sub[tag][0] == 5 else int(v)
    return out


def build_exif_app1(
    orientation: int | None = None,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    iso: int | None = None,
) -> bytes:
    """Fixture-grade APP1 segment (little-endian TIFF, IFD0 + Exif
    sub-IFD) — splice after a JPEG's SOI to plant EXIF."""
    def entries(pairs):  # [(tag, typ, values)] sorted by tag
        return sorted(pairs, key=lambda p: p[0])

    ifd0 = []
    if make is not None:
        ifd0.append((0x010F, 2, make.encode() + b"\x00"))
    if model is not None:
        ifd0.append((0x0110, 2, model.encode() + b"\x00"))
    if orientation is not None:
        ifd0.append((0x0112, 3, struct.pack("<H", orientation)))
    if datetime is not None:
        ifd0.append((0x0132, 2, datetime.encode() + b"\x00"))
    sub = []
    if iso is not None:
        sub.append((0x8827, 3, struct.pack("<H", iso)))
    if pixel_x is not None:
        sub.append((0xA002, 4, struct.pack("<I", pixel_x)))
    if pixel_y is not None:
        sub.append((0xA003, 4, struct.pack("<I", pixel_y)))

    def encode_ifd(items, base_off, extra_tail=b""):
        """items: [(tag, typ, raw_value_bytes)]; base_off = offset of this
        IFD within the TIFF blob. Returns (ifd_bytes, tail_bytes)."""
        n = len(items)
        tail_off = base_off + 2 + n * 12 + 4 + len(extra_tail)
        body = struct.pack("<H", n)
        tail = bytearray(extra_tail)
        counts = {2: lambda r: len(r), 3: lambda r: len(r) // 2, 4: lambda r: len(r) // 4}
        for tag, typ, raw in entries(items):
            count = counts[typ](raw)
            body += struct.pack("<HHI", tag, typ, count)
            if len(raw) <= 4:
                body += raw.ljust(4, b"\x00")
            else:
                body += struct.pack("<I", tail_off + len(tail) - len(extra_tail))
                tail += raw
        body += struct.pack("<I", 0)  # next IFD
        return body, bytes(tail)

    # layout: header(8) | IFD0 | ifd0-tail | subIFD | sub-tail
    # two-pass: first size IFD0 to learn where the sub IFD lands
    ifd0_items = list(ifd0)
    sub_ptr_entry = []
    if sub:
        sub_ptr_entry = [(0x8769, 4, struct.pack("<I", 0))]  # patched below
    body0, tail0 = encode_ifd(ifd0_items + sub_ptr_entry, 8)
    sub_off = 8 + len(body0) + len(tail0)
    if sub:
        body0, tail0 = encode_ifd(
            ifd0_items + [(0x8769, 4, struct.pack("<I", sub_off))], 8
        )
        body1, tail1 = encode_ifd(sub, sub_off)
    else:
        body1, tail1 = b"", b""
    tiff = b"II*\x00" + struct.pack("<I", 8) + body0 + tail0 + body1 + tail1
    seg = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
