"""MPEG-1 Audio Layer III (MP3) container/framing layer, from scratch.

MP3 is the largest real-crawl audio payload share; what a crawl-scale
training-data pipeline needs from it FIRST is the audit layer — is the
stream well-formed, how long is it, what bitrate/VBR shape, where do the
tags end — exactly the census this module computes. Implemented for
real, per ISO/IEC 11172-3's public framing rules:

- sync scan with resync (junk-byte tolerance, counted, like a crawl
  payload demands), ID3v2 prefix skip (syncsafe size), ID3v1 tail
  detection;
- full 32-bit header parse (version / layer / bitrate / samplerate /
  padding / channel-mode fields) and the Layer III frame-length
  arithmetic — ``144·bitrate // samplerate + padding`` for MPEG-1,
  ``72·bitrate // samplerate + padding`` for the MPEG-2/2.5 LSF
  variants (576-sample frames, their own bitrate/samplerate tables);
- CRC-16 verification when the protection bit is set (poly 0x8005,
  init 0xFFFF, over header bytes 2–3 + side info);
- full side-info parse for all four layouts (MPEG-1 17/32-byte,
  LSF 9/17-byte) — main_data_begin, scfsi, and all per-granule fields
  including the window-switching variant and LSF's 9-bit
  scalefac_compress / single-granule shape;
- bit-reservoir accounting: every frame's ``main_data_begin`` is
  checked against the bytes the reservoir can actually hold (≤ 511,
  bounded by preceding frames' main-data capacity) — the consistency
  property broken streams violate first;
- Xing/Info VBR-header detection at the channel-dependent offset
  (frame count / byte count / TOC flags).

DECLARED UNSUPPORTED (typed :class:`Mp3Unsupported`, tested): spectral
reconstruction to PCM — the Annex-B Huffman code tables are large
spec-published data tables; re-keying them from memory risks a silently
wrong decoder, which is worse than an honest refusal. Free-format
streams (bitrate index 0) and Layers I/II are likewise
typed-unsupported. The framing census above is the part of the format a
100-TB crawl audit consumes; PCM feature extraction stays on the
lossless codecs (:mod:`.flac`, :mod:`.adpcm`, :mod:`.g711`).

The synthesis side (:func:`encode_mp3`) emits structurally complete,
semantically SILENT streams (``part2_3_length = 0`` in every granule —
no main data, deterministic ancillary fill), giving the parser an exact
closed-form oracle over every census field (Q ``mp3_features``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class Mp3Error(ValueError):
    """Malformed MP3 stream (bad sync, reserved fields, CRC mismatch,
    reservoir underflow)."""


class Mp3Unsupported(NotImplementedError):
    """Declared-unsupported MP3 variant (free format, MPEG-2/2.5,
    Layer I/II, spectral decode)."""


# MPEG-1 Layer III bitrates (kbps) by bitrate_index 1..14; 0 = free format.
BITRATES_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
# MPEG-2/2.5 (LSF) Layer III bitrates.
BITRATES_KBPS_LSF = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
SAMPLERATES = (44100, 48000, 32000)       # MPEG-1 sampling_frequency 0..2
SAMPLERATES_MPEG2 = (22050, 24000, 16000)
SAMPLERATES_MPEG25 = (11025, 12000, 8000)
SAMPLES_PER_FRAME = 1152
SAMPLES_PER_FRAME_LSF = 576


def _crc16_mpeg(data: bytes) -> int:
    """CRC-16 as MPEG audio uses it: poly 0x8005, init 0xFFFF, MSB-first."""
    crc = 0xFFFF
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over a bytes object."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _parse_side_info(data: bytes, mono: bool, lsf: bool = False) -> dict:
    """Full Layer III side-info parse. MPEG-1: 17 B mono / 32 B stereo,
    9-bit main_data_begin, scfsi, 2 granules. LSF (MPEG-2/2.5): 9 B /
    17 B, 8-bit main_data_begin, no scfsi, 1 granule, 9-bit
    scalefac_compress, no preflag bit."""
    r = _BitReader(data)
    out: dict = {"main_data_begin": r.read(8 if lsf else 9)}
    n_ch = 1 if mono else 2
    if lsf:
        r.read(1 if mono else 2)  # private_bits
        out["scfsi"] = [0] * n_ch
    else:
        r.read(5 if mono else 3)  # private_bits
        out["scfsi"] = [r.read(4) for _ in range(n_ch)]
    granules = []
    for _g in range(1 if lsf else 2):
        for _ch in range(n_ch):
            gr: dict = {
                "part2_3_length": r.read(12),
                "big_values": r.read(9),
                "global_gain": r.read(8),
                "scalefac_compress": r.read(9 if lsf else 4),
                "window_switching": r.read(1),
            }
            if gr["window_switching"]:
                gr["block_type"] = r.read(2)
                gr["mixed_block_flag"] = r.read(1)
                gr["table_select"] = [r.read(5) for _ in range(2)]
                gr["subblock_gain"] = [r.read(3) for _ in range(3)]
            else:
                gr["table_select"] = [r.read(5) for _ in range(3)]
                gr["region0_count"] = r.read(4)
                gr["region1_count"] = r.read(3)
            if not lsf:
                gr["preflag"] = r.read(1)
            gr["scalefac_scale"] = r.read(1)
            gr["count1table_select"] = r.read(1)
            granules.append(gr)
    out["granules"] = granules
    return out


def _build_side_info(mono: bool, main_data_begin: int = 0) -> bytes:
    """Side info for a SILENT frame: part2_3_length = 0 everywhere."""
    w = _BitWriter()
    w.write(main_data_begin, 9)
    n_ch = 1 if mono else 2
    w.write(0, 5 if mono else 3)
    for _ in range(n_ch):
        w.write(0, 4)  # scfsi
    for _g in range(2):
        for _ch in range(n_ch):
            w.write(0, 12)  # part2_3_length
            w.write(0, 9)   # big_values
            w.write(210, 8)  # global_gain (conventional silence value)
            w.write(0, 4)   # scalefac_compress
            w.write(0, 1)   # window_switching
            w.write(0, 5)   # table_select[0]
            w.write(0, 5)   # table_select[1]
            w.write(0, 5)   # table_select[2]
            w.write(0, 4)   # region0_count
            w.write(0, 3)   # region1_count
            w.write(0, 1)   # preflag
            w.write(0, 1)   # scalefac_scale
            w.write(0, 1)   # count1table_select
    return w.bytes()


def frame_length(bitrate_kbps: int, samplerate: int, padding: int) -> int:
    """Layer III / MPEG-1 frame length in bytes (header included)."""
    return (144_000 * bitrate_kbps) // samplerate + padding


def _build_header(
    bitrate_index: int, sr_index: int, padding: int, crc: bool, mono: bool
) -> bytes:
    b0 = 0xFF
    # sync(3) | version=11 (MPEG1) | layer=01 (III) | protection
    b1 = 0xE0 | (0b11 << 3) | (0b01 << 1) | (0 if crc else 1)
    b2 = (bitrate_index << 4) | (sr_index << 2) | (padding << 1)
    b3 = (0b11 << 6) if mono else 0  # channel mode; rest zero
    return bytes((b0, b1, b2, b3))


def encode_mp3(
    bitrate_indices: list[int],
    paddings: list[int] | None = None,
    crc: bool = False,
    mono: bool = True,
    sr_index: int = 0,
    anc_fill=None,
    xing: dict | None = None,
    id3v2_payload: bytes | None = None,
    id3v1: bool = False,
) -> bytes:
    """Structurally complete, silent MPEG-1 Layer III stream: one frame
    per ``bitrate_indices`` entry; ``anc_fill(frame_idx, n) -> bytes``
    supplies the deterministic ancillary fill; ``xing`` (optional
    ``{"frames": n, "bytes": m, "tag": b"Xing"|b"Info"}``) prepends the
    VBR-header frame at 128 kbps; ID3v2/ID3v1 wrap the stream."""
    if paddings is None:
        paddings = [0] * len(bitrate_indices)
    out = bytearray()
    if id3v2_payload is not None:
        size = len(id3v2_payload)
        out += b"ID3" + bytes((4, 0, 0)) + bytes(
            ((size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F)
        ) + id3v2_payload
    sr = SAMPLERATES[sr_index]
    side = _build_side_info(mono)

    def one_frame(bidx: int, pad: int, k: int, body_mark: bytes | None):
        kbps = BITRATES_KBPS[bidx]
        total = frame_length(kbps, sr, pad)
        hdr = _build_header(bidx, sr_index, pad, crc, mono)
        parts = bytearray(hdr)
        if crc:
            parts += b"\x00\x00"  # patched below
        parts += side
        anc_len = total - len(parts)
        if body_mark is not None:
            marked = body_mark + b"\x00" * (anc_len - len(body_mark))
            parts += marked[:anc_len]
        elif anc_fill is not None:
            parts += anc_fill(k, anc_len)
        else:
            parts += b"\x00" * anc_len
        if crc:
            c = _crc16_mpeg(bytes(parts[2:4]) + side)
            parts[4] = c >> 8
            parts[5] = c & 0xFF
        return bytes(parts)

    if xing is not None:
        tag = xing.get("tag", b"Xing")
        body = tag + (0x3).to_bytes(4, "big")  # flags: frames | bytes
        body += int(xing["frames"]).to_bytes(4, "big")
        body += int(xing["bytes"]).to_bytes(4, "big")
        out += one_frame(9, 0, -1, body)
    for k, (bidx, pad) in enumerate(zip(bitrate_indices, paddings)):
        out += one_frame(bidx, pad, k, None)
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Stream census over a (possibly tagged, possibly dirty) MP3 blob.

    Returns framing facts a crawl audit consumes: frame count/bytes,
    duration, bitrate envelope, CRC and padding tallies, ancillary-byte
    count, reservoir validity, tag sizes, VBR-header fields. Raises
    :class:`Mp3Error` on malformed streams and :class:`Mp3Unsupported`
    on declared-unsupported variants (free format, MPEG-2/2.5, Layer
    I/II)."""
    pos = 0
    id3v2_bytes = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = (
            ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14)
            | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
        )
        id3v2_bytes = 10 + size
        pos = id3v2_bytes
    has_id3v1 = len(payload) >= 128 and payload[-128:-125] == b"TAG"
    end = len(payload) - (128 if has_id3v1 else 0)

    n_frames = 0
    frame_bytes = 0
    anc_bytes = 0
    junk_bytes = 0
    n_padded = 0
    n_crc = 0
    crc_ok = True
    kbps_seen: list[int] = []
    samplerate = None
    stream_spf = SAMPLES_PER_FRAME
    reservoir = 0
    xing_info: dict | None = None

    while pos + 4 <= end:
        b0, b1 = payload[pos], payload[pos + 1]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            junk_bytes += 1
            pos += 1
            continue
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version == 0b01:
            raise Mp3Error("reserved MPEG version id")
        if layer != 0b01:
            raise Mp3Unsupported(
                "Layer I/II is declared-unsupported (Layer III only)"
            )
        lsf = version != 0b11  # MPEG-2 (10) / MPEG-2.5 (00)
        crc_present = (b1 & 1) == 0
        b2, b3 = payload[pos + 2], payload[pos + 3]
        bidx = b2 >> 4
        if bidx == 0:
            raise Mp3Unsupported("free-format stream (bitrate index 0)")
        if bidx == 15:
            raise Mp3Error("reserved bitrate index 15")
        sr_idx = (b2 >> 2) & 0x3
        if sr_idx == 3:
            raise Mp3Error("reserved sampling-frequency index")
        if version == 0b11:
            sr = SAMPLERATES[sr_idx]
        elif version == 0b10:
            sr = SAMPLERATES_MPEG2[sr_idx]
        else:
            sr = SAMPLERATES_MPEG25[sr_idx]
        if samplerate is None:
            samplerate = sr
        elif sr != samplerate:
            raise Mp3Error("sampling frequency changes mid-stream")
        padding = (b2 >> 1) & 1
        mono = ((b3 >> 6) & 0x3) == 0b11
        kbps = (BITRATES_KBPS_LSF if lsf else BITRATES_KBPS)[bidx]
        total = (
            (72_000 * kbps) // sr + padding
            if lsf
            else frame_length(kbps, sr, padding)
        )
        if pos + total > end:
            junk_bytes += end - pos  # truncated tail frame
            break
        side_len = (9 if mono else 17) if lsf else (17 if mono else 32)
        off = pos + 4
        if crc_present:
            stored = (payload[off] << 8) | payload[off + 1]
            off += 2
            side = payload[off : off + side_len]
            if _crc16_mpeg(payload[pos + 2 : pos + 4] + side) != stored:
                crc_ok = False
            n_crc += 1
        side = payload[off : off + side_len]
        if len(side) < side_len:
            raise Mp3Error("truncated side info")
        stream_spf = SAMPLES_PER_FRAME_LSF if lsf else SAMPLES_PER_FRAME
        info = _parse_side_info(side, mono, lsf)
        if info["main_data_begin"] > min(reservoir, 511):
            raise Mp3Error(
                f"bit-reservoir underflow: main_data_begin="
                f"{info['main_data_begin']} > reservoir={min(reservoir, 511)}"
            )
        body = payload[off + side_len : pos + total]
        is_xing = False
        if n_frames == 0 and xing_info is None and body[:4] in (
            b"Xing", b"Info"
        ):
            flags = int.from_bytes(body[4:8], "big")
            p = 8
            xi = {"tag": body[:4].decode(), "vbr": body[:4] == b"Xing"}
            if flags & 1:
                xi["frames"] = int.from_bytes(body[p : p + 4], "big")
                p += 4
            if flags & 2:
                xi["bytes"] = int.from_bytes(body[p : p + 4], "big")
                p += 4
            xing_info = xi
            is_xing = True
        main_capacity = total - 4 - (2 if crc_present else 0) - side_len
        # part2_3 bits actually consumed from the reservoir + this frame:
        used_bits = sum(g["part2_3_length"] for g in info["granules"])
        reservoir = min(
            reservoir + main_capacity - (used_bits + 7) // 8, 511
        )
        if reservoir < 0:
            raise Mp3Error("main data overruns the stream")
        if not is_xing:
            n_frames += 1
            frame_bytes += total
            anc_bytes += main_capacity - (used_bits + 7) // 8
            n_padded += padding
            kbps_seen.append(kbps)
        pos += total

    duration_ms = (
        n_frames * stream_spf * 1000 // samplerate if samplerate else 0
    )
    return {
        "n_frames": n_frames,
        "frame_bytes": frame_bytes,
        "anc_bytes": anc_bytes,
        "junk_bytes": junk_bytes,
        "duration_ms": duration_ms,
        "samplerate": samplerate or 0,
        "kbps_min": min(kbps_seen) if kbps_seen else 0,
        "kbps_max": max(kbps_seen) if kbps_seen else 0,
        "n_padded": n_padded,
        "n_crc": n_crc,
        "crc_ok": crc_ok,
        "id3v2_bytes": id3v2_bytes,
        "has_id3v1": has_id3v1,
        "xing": xing_info,
        "is_vbr": bool(xing_info and xing_info.get("vbr"))
        or len(set(kbps_seen)) > 1,
    }


def decode_mp3(payload: bytes):
    """PCM reconstruction — declared unsupported (see module docstring:
    the Annex-B Huffman tables are spec data; a from-memory re-keying
    risks silent corruption). :func:`parse_mp3` is the supported
    surface."""
    raise Mp3Unsupported(
        "MP3 spectral decode to PCM is declared-unsupported; "
        "use parse_mp3 for the framing census"
    )


class Mp3CensusExtractor:
    """Actor-pool ``map_batches`` stage: per-payload framing census
    (same stage shape as the other media extractors — warm state in
    ``__init__``, payload dropped at the output)."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        cols: dict[str, list] = {
            k: []
            for k in (
                "media_id", "n_frames", "frame_bytes", "anc_bytes",
                "junk_bytes", "duration_ms", "kbps_min", "kbps_max",
                "n_padded", "n_crc", "crc_ok", "id3v2_bytes",
                "has_id3v1", "has_xing", "is_vbr",
            )
        }
        for mid, payload in zip(ids, batch["payload"].to_pylist()):
            c = parse_mp3(payload)
            cols["media_id"].append(mid)
            for k in (
                "n_frames", "frame_bytes", "anc_bytes", "junk_bytes",
                "duration_ms", "kbps_min", "kbps_max", "n_padded", "n_crc",
                "id3v2_bytes",
            ):
                cols[k].append(int(c[k]))
            cols["crc_ok"].append(int(c["crc_ok"]))
            cols["has_id3v1"].append(int(c["has_id3v1"]))
            cols["has_xing"].append(int(c["xing"] is not None))
            cols["is_vbr"].append(int(c["is_vbr"]))
        names = list(cols)
        return pa.Table.from_arrays(
            [
                pa.array(cols[n], pa.int64() if n != "media_id" else None)
                for n in names
            ],
            names=names,
        )


def mp3_pipeline(ds, batch_size: int = 64, concurrency=(1, 4)):
    """MP3 census pipeline: actor pool over binary payload rows."""
    return ds.map_batches(
        Mp3CensusExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
