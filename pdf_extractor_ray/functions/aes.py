"""AES-128/256 in CBC mode, from scratch (FIPS-197 — public spec).

Exists for the PDF standard security handler's AESV2 crypt filter
(ISO 32000 §7.6.2): each encrypted string/stream is ``IV ‖ CBC
ciphertext`` with PKCS#7 padding. Pure-Python table implementation —
fast enough for document decryption (a few blocks per object); a
production deployment would swap in ``cryptography``'s AES without
touching the handler logic.

Only what the handler needs is implemented: key expansion, one block
each way, CBC with PKCS#7.
"""

from __future__ import annotations

__all__ = [
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "aes_cbc_decrypt_nopad",
    "aes_cbc_encrypt_nopad",
    "aes_ecb_encrypt_block",
]

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D)


def _xt(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xt(a)
        b >>= 1
    return p


def _expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    w = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes(
                _SBOX[t[(j + 1) % 4]] ^ (_RCON[i // nk - 1] if j == 0 else 0)
                for j in range(4)
            )
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _sub_shift(state: bytes, sbox: bytes, inv: bool) -> bytes:
    out = bytearray(16)
    for c in range(4):
        for r in range(4):
            src_c = (c + r) % 4 if not inv else (c - r) % 4
            out[4 * c + r] = sbox[state[4 * src_c + r]]
    return bytes(out)


def _mix(state: bytes, inv: bool) -> bytes:
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    out = bytearray(16)
    for c in range(4):
        col = state[4 * c : 4 * c + 4]
        for r in range(4):
            out[4 * c + r] = (
                _gmul(col[0], m[(0 - r) % 4])
                ^ _gmul(col[1], m[(1 - r) % 4])
                ^ _gmul(col[2], m[(2 - r) % 4])
                ^ _gmul(col[3], m[(3 - r) % 4])
            )
    return bytes(out)


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


# T-tables (SubBytes ∘ ShiftRows ∘ MixColumns folded per input byte) —
# the classic fast software AES. Encrypt is the hot path: the R6
# handler's Hash-2B loop runs ~25k serial block encryptions per hash.
_T0 = [0] * 256
_T1 = [0] * 256
_T2 = [0] * 256
_T3 = [0] * 256
for _x in range(256):
    _s = _SBOX[_x]
    _s2, _s3 = _gmul(_s, 2), _gmul(_s, 3)
    _T0[_x] = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _T1[_x] = (_s3 << 24) | (_s2 << 16) | (_s << 8) | _s
    _T2[_x] = (_s << 24) | (_s3 << 16) | (_s2 << 8) | _s
    _T3[_x] = (_s << 24) | (_s << 16) | (_s3 << 8) | _s2


def _words(b: bytes) -> tuple[int, int, int, int]:
    return (
        int.from_bytes(b[0:4], "big"),
        int.from_bytes(b[4:8], "big"),
        int.from_bytes(b[8:12], "big"),
        int.from_bytes(b[12:16], "big"),
    )


def _encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    return _encrypt_block_w([_words(k) for k in rk], block)


def _encrypt_block_w(rkw: list[tuple], block: bytes) -> bytes:
    k = rkw[0]
    bw = _words(block)
    w0, w1, w2, w3 = bw[0] ^ k[0], bw[1] ^ k[1], bw[2] ^ k[2], bw[3] ^ k[3]
    for rnd in range(1, len(rkw) - 1):
        k = rkw[rnd]
        n0 = _T0[w0 >> 24] ^ _T1[(w1 >> 16) & 0xFF] ^ _T2[(w2 >> 8) & 0xFF] ^ _T3[w3 & 0xFF] ^ k[0]
        n1 = _T0[w1 >> 24] ^ _T1[(w2 >> 16) & 0xFF] ^ _T2[(w3 >> 8) & 0xFF] ^ _T3[w0 & 0xFF] ^ k[1]
        n2 = _T0[w2 >> 24] ^ _T1[(w3 >> 16) & 0xFF] ^ _T2[(w0 >> 8) & 0xFF] ^ _T3[w1 & 0xFF] ^ k[2]
        n3 = _T0[w3 >> 24] ^ _T1[(w0 >> 16) & 0xFF] ^ _T2[(w1 >> 8) & 0xFF] ^ _T3[w2 & 0xFF] ^ k[3]
        w0, w1, w2, w3 = n0, n1, n2, n3
    k = rkw[-1]
    sb = _SBOX
    o0 = ((sb[w0 >> 24] << 24) | (sb[(w1 >> 16) & 0xFF] << 16) | (sb[(w2 >> 8) & 0xFF] << 8) | sb[w3 & 0xFF]) ^ k[0]
    o1 = ((sb[w1 >> 24] << 24) | (sb[(w2 >> 16) & 0xFF] << 16) | (sb[(w3 >> 8) & 0xFF] << 8) | sb[w0 & 0xFF]) ^ k[1]
    o2 = ((sb[w2 >> 24] << 24) | (sb[(w3 >> 16) & 0xFF] << 16) | (sb[(w0 >> 8) & 0xFF] << 8) | sb[w1 & 0xFF]) ^ k[2]
    o3 = ((sb[w3 >> 24] << 24) | (sb[(w0 >> 16) & 0xFF] << 16) | (sb[(w1 >> 8) & 0xFF] << 8) | sb[w2 & 0xFF]) ^ k[3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def _decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = _xor(block, rk[-1])
    for rnd in range(len(rk) - 2, 0, -1):
        s = _mix(_xor(_sub_shift(s, _INV_SBOX, True), rk[rnd]), True)
    return _xor(_sub_shift(s, _INV_SBOX, True), rk[0])


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """IV ‖ CBC(PKCS#7-padded data) — the PDF AESV2 storage layout."""
    rkw = [_words(k) for k in _expand_key(key)]
    pad = 16 - len(data) % 16
    data += bytes([pad]) * pad
    out, prev = bytearray(iv), iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block_w(rkw, _xor(data[i : i + 16], prev))
        out += prev
    return bytes(out)


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC, no padding, IV not prepended (the V5 handler's Hash-2B
    inner step and /UE//OE key wrapping use exactly this shape). Round
    keys convert to words ONCE — this chain is the Hash-2B hot path."""
    if len(data) % 16:
        raise ValueError("nopad CBC needs a 16-multiple")
    rkw = [_words(k) for k in _expand_key(key)]
    out, prev = bytearray(), iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block_w(rkw, _xor(data[i : i + 16], prev))
        out += prev
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("nopad CBC needs a 16-multiple")
    rk = _expand_key(key)
    out = bytearray()
    for i in range(0, len(data), 16):
        out += _xor(_decrypt_block(rk, data[i : i + 16]), iv)
        iv = data[i : i + 16]
    return bytes(out)


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One ECB block (the /Perms entry)."""
    return _encrypt_block(_expand_key(key), block)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_cbc_encrypt`; tolerates malformed padding by
    returning the raw plaintext (containment beats an exception here —
    the caller's filters will reject garbage)."""
    if len(data) < 32 or len(data) % 16:
        return b""
    rk = _expand_key(key)
    iv, out = data[:16], bytearray()
    for i in range(16, len(data), 16):
        out += _xor(_decrypt_block(rk, data[i : i + 16]), iv)
        iv = data[i : i + 16]
    pad = out[-1]
    if 1 <= pad <= 16 and all(b == pad for b in out[-pad:]):
        return bytes(out[:-pad])
    return bytes(out)
