"""Punycode (RFC 3492) encode/decode, from scratch — the IDNA label codec.

Internationalized hostnames travel as ASCII ``xn--`` labels; decoding them
is a prerequisite for homoglyph spoof detection (ops/urls.py::
homoglyph_dedup) because "xn--pypal-4ve.com" IS "pаypаl.com". The
bootstring algorithm below follows the RFC's published parameters and
pseudocode (base 36, tmin 1, tmax 26, skew 38, damp 700, bias 72,
initial_n 128); no library involved. Invalid input raises the typed
``PunycodeError`` (containment at the stage boundary, like every codec
here).
"""

from __future__ import annotations

BASE = 36
TMIN, TMAX = 1, 26
SKEW, DAMP = 38, 700
INITIAL_BIAS = 72
INITIAL_N = 128


class PunycodeError(ValueError):
    """Typed decode/encode failure (overflow, bad digit, bad label)."""


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:
        delta //= BASE - TMIN
        k += BASE
    return k + (((BASE - TMIN + 1) * delta) // (delta + SKEW))


def _digit_value(ch: str) -> int:
    o = ord(ch)
    if 0x30 <= o <= 0x39:  # 0-9 -> 26..35
        return o - 0x30 + 26
    if 0x41 <= o <= 0x5A:  # A-Z -> 0..25
        return o - 0x41
    if 0x61 <= o <= 0x7A:  # a-z -> 0..25
        return o - 0x61
    raise PunycodeError(f"invalid punycode digit {ch!r}")


def punycode_decode(label: str) -> str:
    """Decode one bootstring label (WITHOUT the ``xn--`` prefix)."""
    n, i, bias = INITIAL_N, 0, INITIAL_BIAS
    pos = label.rfind("-")
    if pos > 0:
        output = [ord(c) for c in label[:pos]]
        if any(c >= 128 for c in output):
            raise PunycodeError("non-ASCII in basic portion")
        rest = label[pos + 1 :]
    else:
        output = []
        rest = label[1:] if pos == 0 else label
    j = 0
    while j < len(rest):
        oldi, w, k = i, 1, BASE
        while True:
            if j >= len(rest):
                raise PunycodeError("truncated variable-length integer")
            digit = _digit_value(rest[j])
            j += 1
            i += digit * w
            if i > 0x7FFFFFFF:
                raise PunycodeError("overflow")
            t = TMIN if k <= bias else (TMAX if k >= bias + TMAX else k - bias)
            if digit < t:
                break
            w *= BASE - t
            if w > 0x7FFFFFFF:
                raise PunycodeError("overflow")
            k += BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise PunycodeError("code point out of range")
        i %= len(output) + 1
        output.insert(i, n)
        i += 1
    return "".join(chr(c) for c in output)


def punycode_encode(label: str) -> str:
    """Encode one unicode label to its bootstring form (no prefix)."""
    cps = [ord(c) for c in label]
    basic = [c for c in cps if c < 128]
    output = [chr(c) for c in basic]
    h = b = len(basic)
    if b:
        output.append("-")
    n, delta, bias = INITIAL_N, 0, INITIAL_BIAS
    while h < len(cps):
        m = min(c for c in cps if c >= n)
        delta += (m - n) * (h + 1)
        if delta > 0x7FFFFFFF:
            raise PunycodeError("overflow")
        n = m
        for c in cps:
            if c < n:
                delta += 1
                if delta > 0x7FFFFFFF:
                    raise PunycodeError("overflow")
            elif c == n:
                q = delta
                k = BASE
                while True:
                    t = TMIN if k <= bias else (
                        TMAX if k >= bias + TMAX else k - bias
                    )
                    if q < t:
                        break
                    output.append(_encode_digit(t + (q - t) % (BASE - t)))
                    q = (q - t) // (BASE - t)
                    k += BASE
                output.append(_encode_digit(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(output)


def _encode_digit(d: int) -> str:
    return chr(d + 0x61) if d < 26 else chr(d - 26 + 0x30)


def idna_decode_host(host: str) -> str:
    """Decode every ``xn--`` label of a hostname; non-IDN labels pass
    through; a malformed IDN label raises PunycodeError."""
    out = []
    for lbl in (host or "").split("."):
        low = lbl.lower()
        if low.startswith("xn--"):
            out.append(punycode_decode(low[4:]))
        else:
            out.append(lbl)
    return ".".join(out)
