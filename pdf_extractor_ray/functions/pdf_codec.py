"""Minimal from-scratch PDF 1.x codec: a fixture WRITER that emits genuine
``%PDF-1.4`` documents and a READER that parses them back to per-character
layout records for the shared layout-analysis kernel.

This replaces the round-1 toy ``%PDF-GRAFT1`` decode as the PDF branch's
frontend (the reference's core competency is real PDFs —
reference: src/services/extraction_service.py:26-114 extracts text/tables
via pdfplumber; src/services/pdf_processor.py:105-221 walks the outline
tree). Everything here is built from the public PDF 1.7 spec (ISO 32000):

Reader support (documented subset):
- classic cross-reference tables (``xref`` sections + ``trailer`` dicts,
  ``/Prev`` chains for incremental updates), with a brute-force
  ``N 0 obj`` scan fallback when the xref is damaged
- PDF 1.5 cross-reference STREAMS (/Type /XRef: /W field widths, /Index
  subsections, type-2 entries) including PNG row predictors 0-4
  (ISO 32000 §7.5.8, §7.4.4.4), and compressed object streams
  (/Type /ObjStm, §7.5.7)
- object syntax: dictionaries, arrays, names, literal strings (nested
  parens, all escapes, octal), hex strings, numbers, booleans, null,
  indirect references, streams (``/Length`` direct or indirect)
- stream filters: ``/FlateDecode`` (stdlib zlib), ``/LZWDecode``
  (from-scratch, EarlyChange handled, spec example vector in tests) and
  ``/RunLengthDecode``; per-filter ``/DecodeParms`` chains
- page tree walking with attribute inheritance (``/Kids`` recursion)
- content-stream text operators: BT ET Tf TL Td TD Tm T* Tj TJ ' "
  (q/Q/cm and colour/path operators are skipped token-exactly)
- outline tree (``/Outlines`` → ``/First``/``/Next``, ``/Title``,
  ``/Dest`` or ``/A``→``/D`` page destinations)
- simple-font code→Unicode mapping: ``/ToUnicode`` CMaps (bfchar/bfrange)
  and ``/Encoding /Differences`` via a glyph-name list (AGL subset +
  ``uniXXXX``); unmapped codes read as their own codepoint
- composite (``/Subtype /Type0``, CID) fonts: Identity-H 2-byte show
  strings, 2-byte-source ``/ToUnicode`` CMaps; without a /ToUnicode the
  CID reads as its own codepoint (the Identity fallback — same behavior
  pdfminer exhibits on such files); non-identity encoding CMaps are read
  with the 2-byte codespace (their /ToUnicode is code-keyed, so text
  extraction stays correct)

Encryption (round 3; non-empty passwords round 4): the STANDARD
security handler (ISO 32000 §7.6.2–7.6.4) opens files across the classic
surface — RC4 (V 1–2, R 2–3, 40–128-bit) AND AES-128-CBC via the V4/R4
AESV2 crypt filter (from-scratch FIPS-197 AES in :mod:`.aes`, verified
against the appendix-C vectors). Key derivation Algorithm 2,
user-password verification Algorithms 4/5, per-object keys (+``sAlT``
for AES) over streams and strings; XRef streams and the /Encrypt dict
stay plain, object-stream members are covered by their container per
spec. The V5/R6 AES-256 handler (ISO 32000-2) is ALSO supported: Hash-2B
(SHA-256/384/512 hardening loop) password validation, /UE file-key
unwrap, whole-file AES-256-CBC key. Round 4: ``PdfDocument(data,
password=...)`` accepts NON-EMPTY passwords too — tried as the user
password first, then as the owner password (Algorithm 7 recovery of the
padded user password from /O for R2–R4; /O-hash validation + /OE
unwrap for R6). Wrong passwords and unknown handler versions raise a
typed ``PdfError``.

Inline images (``BI … ID … EI``, round 3) are skipped losslessly —
their raw sample bytes no longer derail the tokenizer, so surrounding
text extracts normally.

NOT supported (declared): 1-byte or mixed-width CID encoding CMaps,
vertical writing (Identity-V), DCT/CCITT/JBIG2 filters.
Payloads needing those fall through to the pipeline's error-containment
path like any other undecodable input.

Glyph metrics: the writer uses Courier (fixed 600/1000 advance), so the
reader's char-box reconstruction (0.6 × font size per glyph) is exact and
the records feed :func:`..functions.pdf_extract.records_to_markdown`
unchanged — the layout kernel itself is decoder-agnostic.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np

from .pdf_extract import LINE_H, PAGE_H, RECORD_DTYPE

# ---------------------------------------------------------------------------
# Standard security handler (ISO 32000 §7.6): RC4 + key derivation
# ---------------------------------------------------------------------------

# The spec's 32-byte password pad (ISO 32000 Table 22 / §7.6.3.3).
_PDF_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (public algorithm) — length-preserving, its own inverse."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = ch ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_key(owner: bytes, p: int, id0: bytes, rev: int, nbytes: int,
             user: bytes = b"", encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: file encryption key from the (padded) user password,
    /O, /P (32-bit LE; producers emit it signed or unsigned — the byte
    layout is identical, so normalize to unsigned) and the first file
    identifier.  R4+ with /EncryptMetadata false appends 0xFFFFFFFF to
    the MD5 input (Algorithm 2 step f)."""
    md5_in = (
        (user + _PDF_PAD)[:32]
        + owner
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
    )
    if rev >= 4 and not encrypt_metadata:
        md5_in += b"\xff\xff\xff\xff"
    md = hashlib.md5(md5_in).digest()
    if rev >= 3:
        for _ in range(50):
            md = hashlib.md5(md[:nbytes]).digest()
    return md[:nbytes]


def _std_user_check(key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the /U value proving a user password."""
    if rev == 2:
        return _rc4(key, _PDF_PAD)
    x = _rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x  # compare first 16 bytes against /U


import functools


@functools.lru_cache(maxsize=256)
def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (the R6 SHA-2 hardening loop): SHA-256
    seed, then ≥64 rounds of AES-128-CBC over (pwd‖K‖udata)×64 with the
    digest algorithm hopping between SHA-256/384/512 by E's byte sum.
    Pure function of its arguments — LRU-cached per worker, since the
    hardening loop is ~25k serial AES blocks (0.2 s) by design and real
    corpora re-open files with repeated (password, salt) pairs."""
    from .aes import aes_cbc_encrypt_nopad

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        k = {
            0: hashlib.sha256, 1: hashlib.sha384, 2: hashlib.sha512
        }[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _obj_rc4_key(base: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Per-object key (Algorithm 1): MD5(key + obj# LE3 + gen LE2
    [+ b'sAlT' for AESV2])."""
    md = hashlib.md5(
        base
        + num.to_bytes(3, "little")
        + gen.to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()
    return md[: min(len(base) + 5, 16)]

COURIER_ADVANCE = 0.6  # Courier glyph advance per unit font size
FONT_SIZE = 10.0
CHAR_W = COURIER_ADVANCE * FONT_SIZE  # 6.0 — same cell as the toy format


# ---------------------------------------------------------------------------
# Writer (fixture generator)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> bytes:
    out = []
    for ch in s:
        o = ord(ch)
        if ch in "()\\":
            out.append(b"\\" + ch.encode("latin-1"))
        elif 32 <= o < 127:
            out.append(ch.encode("latin-1"))
        elif o < 256:
            out.append(b"\\%03o" % o)
        else:  # non-latin1: writer fixtures are ASCII; replace defensively
            out.append(b"?")
    return b"".join(out)


def wrap_text_rows(
    text: str, chars_per_line: int = 80, lines_per_page: int = 40
) -> list[list[str | None]]:
    """Word-wrap ``text`` into pages of rows (None = blank separator row) —
    the same wrap contract as the toy writer, so real-PDF and toy payloads
    of the same text produce identical layout records."""
    rows: list[str | None] = []
    for para in text.split("\n\n"):
        words = para.split()
        if not words:
            continue
        if rows:
            rows.append(None)
        line = ""
        for word in words:
            if not line:
                line = word
            elif len(line) + 1 + len(word) <= chars_per_line:
                line += " " + word
            else:
                rows.append(line)
                line = word
        if line:
            rows.append(line)

    pages: list[list[str | None]] = []
    current: list[str | None] = []
    for row in rows:
        if len(current) >= lines_per_page:
            pages.append(current)
            current = []
        current.append(row)
    if current:
        pages.append(current)
    return pages


def _page_content(rows: list[str | None], style: str, cid: bool = False) -> bytes:
    """One page's content stream. ``style`` varies the operator mix so the
    reader's Td/TD/Tm/T*/TJ handling is all exercised by fixtures:
    ``tm``   — absolute ``1 0 0 1 x y Tm`` per line
    ``td``   — relative ``0 -dy Td`` line moves
    ``tstar``— ``TL`` + ``T*`` line advances and TJ-array shows

    ``cid=True`` writes show strings as HEX strings of big-endian 2-byte
    codes (``code = codepoint + 0x0100`` — the composite-font fixture the
    Identity-H + /ToUnicode reader path decodes)."""

    def sstr(text: str) -> bytes:
        if cid:
            return b"<%s>" % "".join("%04X" % (ord(c) + 0x0100) for c in text).encode()
        return b"(%s)" % _pdf_escape(text)

    out = [b"BT", b"/F1 10 Tf"]
    if style == "tstar":
        out.append(b"%g TL" % LINE_H)
    prev_y: float | None = None
    row_idx = 0
    for row in rows:
        if row is None:
            row_idx += 1
            continue
        y0 = PAGE_H - row_idx * LINE_H - LINE_H
        row_idx += 1
        if style == "tm":
            out.append(b"1 0 0 1 0 %g Tm" % y0)
        elif prev_y is None:
            out.append(b"0 %g Td" % y0)
        else:
            dy = prev_y - y0
            if style == "tstar" and dy == LINE_H:
                out.append(b"T*")
            else:
                out.append(b"0 %g Td" % -dy)
        prev_y = y0
        if style == "tstar" and "  " not in row and len(row) > 4:
            # split the line into a kerning-free TJ array (two halves)
            mid = len(row) // 2
            out.append(b"[%s %s] TJ" % (sstr(row[:mid]), sstr(row[mid:])))
        else:
            out.append(b"%s Tj" % sstr(row))
    out.append(b"ET")
    return b"\n".join(out)


def build_pdf(
    text: str,
    compress: bool | str = False,
    style: str = "tm",
    outline: list[tuple[str, int]] | None = None,
    chars_per_line: int = 80,
    lines_per_page: int = 40,
    xref_kind: str = "table",
    font_encoding: str = "builtin",
    encrypt: bool = False,
    encrypt_user_pw: bytes = b"",
    encrypt_rev: int = 2,
    encrypt_metadata: bool = True,
    encrypt_owner_pw: bytes | None = None,
) -> bytes:
    """Serialize ``text`` as a genuine single-font PDF.

    ``encrypt=True`` writes a standard-security-handler RC4-40 file
    (R2/V1, owner pw == user pw == ``encrypt_user_pw``); the default
    empty password is what the reader opens transparently.

    ``outline`` is a list of ``(title, page_index)`` bookmarks written as a
    flat top-level ``/Outlines`` tree (the shape the reference's outline
    splitter consumes, reference: src/services/pdf_processor.py:105-142).
    Round-trips byte-exactly through :func:`parse_pdf_records` +
    ``records_to_markdown`` for single-space word text. ``xref_kind``
    selects the cross-reference form: ``"table"`` (classic PDF 1.4),
    ``"stream"`` (PDF 1.5 xref stream with PNG up-predictor), or
    ``"objstm"`` (dict objects additionally packed into an /ObjStm).
    """
    pages = wrap_text_rows(text, chars_per_line, lines_per_page) or [[]]
    return _assemble_pdf(
        pages, outline, compress, style, xref_kind, font_encoding,
        encrypt, encrypt_user_pw, encrypt_rev, encrypt_metadata,
        encrypt_owner_pw,
    )


def build_sectioned_pdf(
    sections: list[tuple[str, str]],
    compress: bool = False,
    style: str = "tm",
    chars_per_line: int = 80,
    lines_per_page: int = 40,
    font_encoding: str = "builtin",
) -> bytes:
    """PDF whose ``/Outlines`` bookmarks delimit sections: each
    ``(title, text)`` section starts on a fresh page, with its outline entry
    pointing at that page — the structure the reference's outline splitter
    cuts documents by (reference: src/services/pdf_processor.py:105-221)."""
    pages: list[list[str | None]] = []
    outline: list[tuple[str, int]] = []
    for title, text in sections:
        outline.append((title, len(pages)))
        pages.extend(wrap_text_rows(text, chars_per_line, lines_per_page) or [[]])
    return _assemble_pdf(
        pages or [[]], outline, compress, style, font_encoding=font_encoding
    )


def build_two_column_pdf(
    left_text: str,
    right_text: str,
    chars_per_line: int = 38,
    compress: bool = False,
) -> bytes:
    """Single-page two-column real PDF (left column at x=0, right past the
    page-middle gutter) — the real-parser counterpart of the toy
    ``layout_text_two_column`` fixture; the layout kernel must read it in
    column-major order via gutter detection."""
    from .pdf_extract import CHAR_W as TOY_CHAR_W, PAGE_W

    def column_ops(text: str, x_off: float) -> list[bytes]:
        rows = (wrap_text_rows(text, chars_per_line, 10**9) or [[]])[0]
        ops: list[bytes] = []
        row_idx = 0
        for row in rows:
            if row is None:
                row_idx += 1
                continue
            y0 = PAGE_H - row_idx * LINE_H - LINE_H
            row_idx += 1
            ops.append(b"1 0 0 1 %g %g Tm" % (x_off, y0))
            ops.append(b"(%s) Tj" % _pdf_escape(row))
        return ops

    content = b"\n".join(
        [b"BT", b"/F1 10 Tf"]
        + column_ops(left_text, 0.0)
        + column_ops(right_text, PAGE_W / 2 + 2 * TOY_CHAR_W)
        + [b"ET"]
    )
    return _serialize_pdf([content], None, compress)


def build_table_pdf(
    headers: list[str],
    rows: list[list[str]],
    title: str | None = None,
    compress: bool = False,
    col_pad: int = 3,
) -> bytes:
    """Bank-statement-shaped real PDF: a character-grid table (columns
    left-aligned at fixed x offsets, ≥``col_pad`` char cells between
    columns) with an optional title paragraph above — the input shape the
    reference's pdfplumber ``extract_table`` path consumes
    (reference: src/services/extraction_service.py:26-114). The table-aware
    reader (``extract_pdf_pages_tables``) must recover headers/rows
    cell-exactly."""
    from .pdf_extract import CHAR_W as TOY_CHAR_W

    table_rows = [headers] + [list(r) for r in rows]
    n_cols = max(len(r) for r in table_rows)
    widths = [
        max((len(r[j]) if j < len(r) else 0) for r in table_rows)
        for j in range(n_cols)
    ]
    x_offsets = []
    x = 0
    for w in widths:
        x_offsets.append(x * TOY_CHAR_W)
        x += w + col_pad

    ops = [b"BT", b"/F1 10 Tf"]
    row_idx = 0
    if title:
        y0 = PAGE_H - row_idx * LINE_H - LINE_H
        ops.append(b"1 0 0 1 0 %g Tm" % y0)
        ops.append(b"(%s) Tj" % _pdf_escape(title))
        row_idx += 2  # blank separator row below the title
    for r in table_rows:
        y0 = PAGE_H - row_idx * LINE_H - LINE_H
        row_idx += 1
        for j, cell in enumerate(r):
            if not cell:
                continue
            ops.append(b"1 0 0 1 %g %g Tm" % (x_offsets[j], y0))
            ops.append(b"(%s) Tj" % _pdf_escape(cell))
    ops.append(b"ET")
    return _serialize_pdf([b"\n".join(ops)], None, compress)


def _assemble_pdf(
    pages: list[list[str | None]],
    outline: list[tuple[str, int]] | None,
    compress: bool,
    style: str,
    xref_kind: str = "table",
    font_encoding: str = "builtin",
    encrypt: bool = False,
    encrypt_user_pw: bytes = b"",
    encrypt_rev: int = 2,
    encrypt_metadata: bool = True,
    encrypt_owner_pw: bytes | None = None,
) -> bytes:
    if font_encoding in ("builtin", "cid"):
        # cid: the code shift (+0x0100) happens inside _page_content's
        # 2-byte hex writer; the /ToUnicode CMap declares the inverse.
        enc_pages = pages
    else:
        # shift-by-one custom encoding: code c shows character chr(c-1);
        # the font object declares the inverse via /Differences or a
        # /ToUnicode CMap (readers without font handling would extract
        # visibly garbled text — the point of the fixture).
        enc_pages = [
            [None if r is None else "".join(chr(ord(c) + 1) for c in r) for r in rows]
            for rows in pages
        ]
    return _serialize_pdf(
        [_page_content(rows, style, cid=font_encoding == "cid") for rows in enc_pages],
        outline,
        compress,
        xref_kind,
        font_encoding,
        encrypt,
        encrypt_user_pw,
        encrypt_rev,
        encrypt_metadata,
        encrypt_owner_pw,
    )


def _encrypt_strings(body: bytes, cipher) -> bytes:
    """Replace every literal string in a serialized object body with the
    hex form of its ciphertext (the reader's lexer does the inverse).
    Reuses the reader's escape-aware literal-string parser."""
    out = bytearray()
    i = 0
    while i < len(body):
        if body[i] == 0x28:  # '('
            lex = _Lexer(body, i)  # parser consumes the '(' itself
            raw = lex._read_literal_string()
            out += b"<" + cipher(raw).hex().encode() + b">"
            i = lex.pos
        else:
            out.append(body[i])
            i += 1
    return bytes(out)


def _encrypt_object_body(body: bytes, cipher) -> bytes:
    """Per-object encryption for the writer: cipher the stream payload
    (after filters — encryption applies to the stored bytes) and every
    dict string. AES grows the payload (IV + padding), so /Length is
    re-stamped; RC4 is length-preserving."""
    m = body.find(b"\nstream\n")
    if m == -1:
        return _encrypt_strings(body, cipher)
    head, rest = body[:m], body[m + len(b"\nstream\n") :]
    if not rest.endswith(b"\nendstream"):
        raise ValueError("malformed stream body")
    payload = cipher(rest[: -len(b"\nendstream")])
    head = re.sub(
        rb"/Length \d+", b"/Length %d" % len(payload), head, count=1
    )
    return (
        _encrypt_strings(head, cipher)
        + b"\nstream\n"
        + payload
        + b"\nendstream"
    )


def _classic_encrypt(objs: dict, rev: int, pw: bytes, id0: bytes,
                     encrypt_metadata: bool = True,
                     owner_pw: bytes | None = None) -> None:
    """Classic standard-handler encryption for the writer (R2/R3/R4):
    derives O/U, encrypts every object body in place, and appends the
    /Encrypt dict as a new object (its strings stay plain per spec).
    ``encrypt_metadata=False`` (R4 only) exercises the Algorithm 2
    0xFFFFFFFF key-derivation suffix common in real V4/AESV2 files.
    ``owner_pw`` defaults to the user password; a distinct value
    exercises the reader's Algorithm 7 owner-password recovery."""
    nbytes = 5 if rev == 2 else 16
    user_padded = (pw + _PDF_PAD)[:32]
    owner_padded = ((owner_pw if owner_pw is not None else pw) + _PDF_PAD)[:32]
    okey = hashlib.md5(owner_padded).digest()
    if rev >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
    okey = okey[:nbytes]
    if rev == 2:
        o_entry = _rc4(okey, user_padded)
    else:  # Algorithm 3 step f: 20 RC4 rounds with xored keys
        o_entry = user_padded
        for i in range(20):
            o_entry = _rc4(bytes(b ^ i for b in okey), o_entry)
    key = _std_key(o_entry, -1, id0, rev, nbytes, user=pw,
                   encrypt_metadata=encrypt_metadata)
    u_entry = _std_user_check(key, id0, rev)
    if rev >= 3:
        u_entry += b"\x00" * 16  # 16 bytes of arbitrary padding (spec)
    aes = rev >= 4

    def make_cipher(num: int):
        okey_obj = _obj_rc4_key(key, num, 0, aes=aes)
        if aes:
            from .aes import aes_cbc_encrypt

            iv = hashlib.md5(b"iv%d" % num).digest()  # deterministic
            return lambda data: aes_cbc_encrypt(okey_obj, iv, data)
        return lambda data: _rc4(okey_obj, data)

    for num in list(objs):
        objs[num] = _encrypt_object_body(objs[num], make_cipher(num))
    enc_num = max(objs) + 1
    if rev == 2:
        vr = b"/V 1 /R 2"
    elif rev == 3:
        vr = b"/V 2 /R 3 /Length 128"
    else:
        vr = (
            b"/V 4 /R 4 /Length 128 "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF"
        )
        if not encrypt_metadata:
            vr += b" /EncryptMetadata false"
    objs[enc_num] = (
        b"<< /Filter /Standard %s /P -1 /O <%s> /U <%s> >>"
        % (vr, o_entry.hex().encode(), u_entry.hex().encode())
    )


def _serialize_pdf(
    content_streams: list[bytes],
    outline: list[tuple[str, int]] | None,
    compress: bool,
    xref_kind: str = "table",
    font_encoding: str = "builtin",
    encrypt: bool = False,
    encrypt_user_pw: bytes = b"",
    encrypt_rev: int = 2,
    encrypt_metadata: bool = True,
    encrypt_owner_pw: bytes | None = None,
) -> bytes:
    n_pages = len(content_streams)

    # object numbering: 1 catalog, 2 pages-root, 3 font,
    # 4..3+n page objects, then content streams, then outline objects,
    # then (custom font encodings only) the /ToUnicode CMap stream, then
    # (cid only) the descendant CIDFontType2 dict
    first_page_obj = 4
    first_content_obj = first_page_obj + n_pages
    first_outline_obj = first_content_obj + n_pages
    n_outline = (1 + len(outline)) if outline else 0
    tounicode_obj = first_outline_obj + n_outline
    descendant_obj = tounicode_obj + 1

    objs: dict[int, bytes] = {}
    kids = " ".join(f"{first_page_obj + i} 0 R" for i in range(n_pages))
    catalog = f"<< /Type /Catalog /Pages 2 0 R"
    if outline:
        catalog += f" /Outlines {first_outline_obj} 0 R"
    catalog += " >>"
    objs[1] = catalog.encode()
    objs[2] = (
        f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] "
        f"/MediaBox [0 0 612 792] >>"
    ).encode()
    if font_encoding == "differences":
        names = " ".join("/uni%04X" % (c - 1) for c in range(33, 127))
        objs[3] = (
            "<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
            f"/Encoding << /Type /Encoding /Differences [33 {names}] >> >>"
        ).encode()
    elif font_encoding == "tounicode":
        objs[3] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
            b"/ToUnicode %d 0 R >>" % tounicode_obj
        )
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"1 beginbfrange <21> <7F> <0020> endbfrange\n"
            b"end"
        )
        objs[tounicode_obj] = (
            b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
        )
    elif font_encoding == "cid":
        # Composite font: Identity-H 2-byte codes, code = cp + 0x0100,
        # inverted by a 2-byte-source /ToUnicode bfrange.
        objs[3] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Courier "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (descendant_obj, tounicode_obj)
        )
        objs[descendant_obj] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Courier "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /CIDToGIDMap /Identity >>"
        )
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"1 beginbfrange <0120> <01FF> <0020> endbfrange\n"
            b"end"
        )
        objs[tounicode_obj] = (
            b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
        )
    else:
        objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"

    for i, content in enumerate(content_streams):
        objs[first_page_obj + i] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {first_content_obj + i} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode()
        if compress == "lzw":
            data = _lzw_encode(content)
            head = b"<< /Length %d /Filter /LZWDecode >>" % len(data)
        elif compress == "rle":
            data = _rle_encode(content)
            head = b"<< /Length %d /Filter /RunLengthDecode >>" % len(data)
        elif compress:
            data = zlib.compress(content)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = content
            head = b"<< /Length %d >>" % len(data)
        objs[first_content_obj + i] = head + b"\nstream\n" + data + b"\nendstream"

    if outline:
        root = first_outline_obj
        item_ids = [root + 1 + k for k in range(len(outline))]
        objs[root] = (
            f"<< /Type /Outlines /First {item_ids[0]} 0 R "
            f"/Last {item_ids[-1]} 0 R /Count {len(outline)} >>"
        ).encode()
        for k, (title, page_idx) in enumerate(outline):
            entry = [
                b"<< /Title (%s)" % _pdf_escape(title),
                b"/Parent %d 0 R" % root,
                b"/Dest [%d 0 R /XYZ 0 792 null]" % (first_page_obj + page_idx),
            ]
            if k > 0:
                entry.append(b"/Prev %d 0 R" % item_ids[k - 1])
            if k + 1 < len(item_ids):
                entry.append(b"/Next %d 0 R" % item_ids[k + 1])
            entry.append(b">>")
            objs[item_ids[k]] = b" ".join(entry)

    trailer_extra = b""
    if encrypt:
        if xref_kind != "table":
            raise ValueError("encrypt is supported with xref_kind='table'")
        # Standard security handler, owner pw == user pw: R2/V1 (RC4-40),
        # R3/V2 (RC4-128), R4/V4 (AESV2-128), or R6/V5 (AES-256).
        rev = int(encrypt_rev)
        id0 = hashlib.md5(b"pdf_extractor_ray deterministic file id").digest()
        if rev in (5, 6):
            from .aes import (
                aes_cbc_encrypt,
                aes_cbc_encrypt_nopad,
                aes_ecb_encrypt_block,
            )

            if rev == 6:
                hfn = _hash_2b
            else:  # R5: single plain SHA-256 (deprecated Adobe form)
                def hfn(pw_: bytes, salt: bytes, udata: bytes) -> bytes:
                    return hashlib.sha256(pw_ + salt + udata).digest()

            pw = encrypt_user_pw
            file_key = hashlib.sha256(b"pdf_extractor_ray v5 file key").digest()
            vs, ks = b"VALSALT!", b"KEYSALT!"
            u_entry = hfn(pw, vs, b"") + vs + ks
            ue_entry = aes_cbc_encrypt_nopad(
                hfn(pw, ks, b""), b"\x00" * 16, file_key
            )
            ovs, oks = b"OVALSLT!", b"OKEYSLT!"
            opw = encrypt_owner_pw if encrypt_owner_pw is not None else pw
            o_entry = hfn(opw, ovs, u_entry) + ovs + oks
            oe_entry = aes_cbc_encrypt_nopad(
                hfn(opw, oks, u_entry), b"\x00" * 16, file_key
            )
            perms = aes_ecb_encrypt_block(
                file_key,
                (-1).to_bytes(4, "little", signed=True)
                + b"\xff\xff\xff\xff" + b"Tadb" + b"pdfx",
            )

            def make_cipher_v5(num: int):
                iv = hashlib.md5(b"iv%d" % num).digest()
                return lambda data: aes_cbc_encrypt(file_key, iv, data)

            for num in list(objs):
                objs[num] = _encrypt_object_body(objs[num], make_cipher_v5(num))
            enc_num = max(objs) + 1
            objs[enc_num] = (
                b"<< /Filter /Standard /V 5 /R %d /Length 256 "
                b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                b"/StmF /StdCF /StrF /StdCF /P -1 "
                b"/U <%s> /UE <%s> /O <%s> /OE <%s> /Perms <%s> >>"
                % (
                    rev,
                    u_entry.hex().encode(),
                    ue_entry.hex().encode(),
                    o_entry.hex().encode(),
                    oe_entry.hex().encode(),
                    perms.hex().encode(),
                )
            )
            trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
                enc_num, id0.hex().encode(), id0.hex().encode(),
            )
            rev = None  # classic-handler block below is skipped
        if rev is not None:
            _classic_encrypt(objs, rev, encrypt_user_pw, id0,
                             encrypt_metadata=encrypt_metadata,
                             owner_pw=encrypt_owner_pw)
            enc_num = max(objs)
            trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
                enc_num, id0.hex().encode(), id0.hex().encode(),
            )

    if xref_kind == "table":
        # classic xref table (PDF 1.4)
        buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in sorted(objs):
            offsets[num] = len(buf)
            buf += b"%d 0 obj\n" % num
            buf += objs[num]
            buf += b"\nendobj\n"
        xref_pos = len(buf)
        n_objs = max(objs) + 1
        buf += b"xref\n0 %d\n" % n_objs
        buf += b"0000000000 65535 f \n"
        for num in range(1, n_objs):
            buf += b"%010d 00000 n \n" % offsets[num]
        buf += (
            b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_objs, trailer_extra, xref_pos)
        )
        return bytes(buf)

    # PDF 1.5 forms: optionally pack dict-only objects into an /ObjStm,
    # always finish with a cross-reference STREAM (+PNG up-predictor).
    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    in_objstm: dict[int, int] = {}  # obj num → index in the ObjStm
    objstm_num = max(objs) + 1
    xref_num = objstm_num + (1 if xref_kind == "objstm" else 0)

    if xref_kind == "objstm":
        packed = [num for num in sorted(objs) if b"\nstream\n" not in objs[num]]
        for idx, num in enumerate(packed):
            in_objstm[num] = idx
        header_parts, body_parts, off = [], [], 0
        for num in packed:
            body = objs[num] + b"\n"
            header_parts.append(b"%d %d" % (num, off))
            body_parts.append(body)
            off += len(body)
        header = b" ".join(header_parts) + b"\n"
        payload = zlib.compress(header + b"".join(body_parts))
        objs[objstm_num] = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            b"\nstream\n%s\nendstream" % (len(packed), len(header), len(payload), payload)
        )

    for num in sorted(objs):
        if num in in_objstm:
            continue
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num
        buf += objs[num]
        buf += b"\nendobj\n"

    # xref stream: W = [1 4 2]; rows for 0..xref_num
    xref_pos = len(buf)
    size = xref_num + 1
    rows = []
    for num in range(size):
        if num == 0:
            rows.append(b"\x00" + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big"))
        elif num in in_objstm:
            rows.append(
                b"\x02" + objstm_num.to_bytes(4, "big") + in_objstm[num].to_bytes(2, "big")
            )
        elif num == xref_num:
            rows.append(b"\x01" + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big"))
        else:
            rows.append(b"\x01" + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big"))
    # PNG "up" predictor (tag 2) row-wise, then deflate
    columns = 7
    pred = bytearray()
    prev = bytes(columns)
    for row in rows:
        pred.append(2)
        pred += bytes((row[i] - prev[i]) & 0xFF for i in range(columns))
        prev = row
    payload = zlib.compress(bytes(pred))
    buf += b"%d 0 obj\n" % xref_num
    buf += (
        b"<< /Type /XRef /Size %d /Root 1 0 R /W [1 4 2] /Index [0 %d] "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b"/Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (size, size, len(payload), payload)
    )
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(buf)


# ---------------------------------------------------------------------------
# Reader: lexer + object parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row predictors (ISO 32000 §7.4.4.4 via RFC 2083): each
    row is a tag byte + ``columns`` bytes; tags 0-4 = none/sub/up/avg/paeth
    (xref streams almost always use 2 = up)."""
    row_len = columns + 1
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data) - row_len + 1, row_len):
        tag = data[r]
        cur = bytearray(data[r + 1 : r + 1 + columns])
        if tag == 1:
            for i in range(1, columns):
                cur[i] = (cur[i] + cur[i - 1]) & 0xFF
        elif tag == 2:
            for i in range(columns):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif tag == 3:
            for i in range(columns):
                left = cur[i - 1] if i else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:
            for i in range(columns):
                a = cur[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[i] = (cur[i] + pred) & 0xFF
        out += cur
        prev = cur
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """LZWDecode (ISO 32000 §7.4.4 / TIFF variant): 9→12-bit MSB-first
    codes, clear=256, EOD=257, ``EarlyChange`` widens the code one entry
    early (the PDF default). Validated against the spec's published
    example vector in tests."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    bits = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (acc >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 257:  # EOD
                return bytes(out)
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                bits = 9
                prev = None
                continue
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise PdfError("LZW: bad first code")
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise PdfError("LZW: code out of range")
            out += entry
            prev = entry
            # EarlyChange=1 (the PDF default) widens one code early: the
            # decoder's table lags the encoder's by one entry, so the width
            # must grow as soon as next_code + early_change reaches 2^bits
            # (e.g. ec=1 switches 9→10 bits when next_code hits 511).
            if next_code + early_change >= (1 << bits) and bits < 12:
                bits += 1
    return bytes(out)


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Fixture-grade LZW encoder, symmetric with :func:`_lzw_decode`."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    bits = 9
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # clear
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code + early_change > (1 << bits) and bits < 12:
            bits += 1
        if next_code > 4095:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            bits = 9
        seq = bytes([byte])
    if seq:
        emit(table[seq])
    emit(257)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode (ISO 32000 §7.4.5): length byte 0-127 = copy n+1
    literal bytes; 129-255 = repeat next byte 257-n times; 128 = EOD."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 128:
            break
        if n < 128:
            chunk = data[pos : pos + n + 1]
            if len(chunk) != n + 1:
                raise PdfError("RunLength: truncated literal run")
            out += chunk
            pos += n + 1
        else:
            if pos >= len(data):
                raise PdfError("RunLength: truncated repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """Fixture-grade RunLength encoder (repeat runs ≥3, literals else)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    out.append(128)
    return bytes(out)


class _Name(str):
    """PDF name object (distinct from strings for dict keys)."""


class _Kw(bytes):
    """Bare keyword token (``obj``, ``R``, content-stream operators) —
    distinct from string objects, which are plain ``bytes``."""


class _Ref(tuple):
    """Indirect reference (num, gen)."""


class PdfError(ValueError):
    pass


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        data, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and data[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_bytes(self, k: int) -> bytes:
        self._skip_ws()
        return self.data[self.pos : self.pos + k]

    def read_token(self):
        """Next syntactic token: returns python object for atoms, or the
        marker strings ``dict_open/dict_close/arr_open/arr_close``."""
        self._skip_ws()
        data, n = self.data, len(self.data)
        if self.pos >= n:
            raise PdfError("unexpected EOF")
        c = data[self.pos]
        if data.startswith(b"<<", self.pos):
            self.pos += 2
            return "dict_open"
        if data.startswith(b">>", self.pos):
            self.pos += 2
            return "dict_close"
        if c == 0x5B:  # [
            self.pos += 1
            return "arr_open"
        if c == 0x5D:  # ]
            self.pos += 1
            return "arr_close"
        if c == 0x2F:  # /name
            self.pos += 1
            start = self.pos
            while self.pos < n and data[self.pos] not in _WS and data[self.pos] not in _DELIM:
                self.pos += 1
            raw = data[start : self.pos]
            # #xx hex escapes in names
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
            return _Name(raw.decode("latin-1"))
        if c == 0x28:  # ( literal string
            return self._read_literal_string()
        if c == 0x3C:  # < hex string
            end = data.index(b">", self.pos)
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data[self.pos + 1 : end])
            if len(hexs) % 2:
                hexs += b"0"
            self.pos = end + 1
            return bytes.fromhex(hexs.decode())
        # number / keyword
        start = self.pos
        while self.pos < n and data[self.pos] not in _WS and data[self.pos] not in _DELIM:
            self.pos += 1
        word = data[start : self.pos]
        if not word:
            raise PdfError(f"bad token at {start}")
        if word == b"true":
            return True
        if word == b"false":
            return False
        if word == b"null":
            return None
        try:
            if b"." in word or b"e" in word or b"E" in word:
                return float(word)
            return int(word)
        except ValueError:
            return _Kw(word)  # keyword (obj/R/content operators)

    def _read_literal_string(self) -> bytes:
        data, n = self.data, len(self.data)
        assert data[self.pos] == 0x28
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < n:
            c = data[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                e = data[self.pos]
                if e in b"nrtbf":
                    out += {b"n"[0]: b"\n", b"r"[0]: b"\r", b"t"[0]: b"\t",
                            b"b"[0]: b"\b", b"f"[0]: b"\f"}[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and 0x30 <= data[self.pos] <= 0x37:
                        oct_digits.append(data[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and data[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated string")

    _NOTOK = object()  # sentinel: PDF null parses to Python None

    def read_object(self, first_token=_NOTOK):
        """Full object (resolving composite syntax, detecting ``R`` refs)."""
        tok = self.read_token() if first_token is self._NOTOK else first_token
        if tok == "dict_open":
            d = {}
            while True:
                key = self.read_token()
                if key == "dict_close":
                    return d
                if not isinstance(key, _Name):
                    raise PdfError(f"dict key {key!r}")
                d[str(key)] = self.read_object()
        if tok == "arr_open":
            arr = []
            while True:
                t = self.read_token()
                if t == "arr_close":
                    return arr
                arr.append(self.read_object(t))
        if isinstance(tok, int):
            # possible "num gen R" reference — lookahead
            save = self.pos
            try:
                t2 = self.read_token()
                if isinstance(t2, int):
                    t3 = self.read_token()
                    if isinstance(t3, _Kw) and t3 == b"R":
                        return _Ref((tok, t2))
            except PdfError:
                pass
            self.pos = save
            return tok
        return tok


# ---------------------------------------------------------------------------
# Document model
# ---------------------------------------------------------------------------


class PdfDocument:
    """Parsed PDF: object map + resolver + page/outline walkers."""

    def __init__(self, data: bytes, password: bytes = b""):
        if not data.startswith(b"%PDF-"):
            # Crawl payloads often carry junk before the header (HTTP
            # fragments, BOMs); per the Adobe implementation note,
            # readers scan the first 1024 bytes and RE-BASE the file at
            # the header — xref offsets are relative to it.
            idx = data[:1024].find(b"%PDF-")
            if idx < 0:
                raise PdfError("missing %PDF header")
            data = data[idx:]
        self.data = data
        self._password = password
        self._cache: dict[int, object] = {}
        self.xref: dict[int, int] = {}
        self._in_objstm: dict[int, tuple[int, int]] = {}
        self.trailer: dict = {}
        self._enc_key: bytes | None = None
        self._enc_aes = False
        self._enc_v5 = False
        try:
            self._load_xref()
        except (PdfError, ValueError, IndexError, KeyError):
            self._scan_objects()
        if "Root" not in self.trailer:
            self._scan_objects()
            if "Root" not in self.trailer:
                raise PdfError("no document catalog")
        if "Encrypt" in self.trailer:
            self._setup_encryption()

    def _setup_encryption(self):
        """Standard security handler (RC4 V1–2 / AESV2 V4 / AES-256 V5):
        the constructor's ``password`` is tried as the USER password
        first (Algorithm 4/5 check, or Hash-2B for R6), then as the
        OWNER password (Algorithm 7 — recover the padded user password
        from /O; R6 validates against /O and unwraps /OE). Wrong or
        missing passwords raise a typed PdfError — per-row containment
        upstream turns that into an extract_error row."""
        pw = self._password
        enc = self.resolve(self.trailer["Encrypt"])
        if not isinstance(enc, dict) or str(enc.get("Filter")) != "Standard":
            raise PdfError("encrypted PDF: non-standard security handler")
        v, r = int(enc.get("V", 0) or 0), int(enc.get("R", 2) or 2)
        self._enc_aes = False
        self._enc_v5 = False
        _wrong = (
            "encrypted PDF: wrong password"
            if pw
            else "encrypted PDF: password required (non-empty)"
        )
        if v == 5 and r in (5, 6):
            # AES-256 handler (ISO 32000-2 §7.6.4.4.8): validate the
            # password via Hash 2.B, unwrap the file key from /UE (user)
            # or /OE (owner; the /O hashes bind the full 48-byte /U).
            # R5 (the deprecated Adobe ExtensionLevel-3 form, common in
            # 2008-2011 corpora) is identical except the hash is ONE
            # plain SHA-256 instead of the 2.B hardening loop.
            from .aes import aes_cbc_decrypt_nopad

            if r == 6:
                h = _hash_2b
            else:
                def h(pw_: bytes, salt: bytes, udata: bytes) -> bytes:
                    return hashlib.sha256(pw_ + salt + udata).digest()

            u, ue = enc.get("U"), enc.get("UE")
            if not isinstance(u, bytes) or len(u) < 48 or not isinstance(ue, bytes):
                raise PdfError("encrypted PDF: malformed /U or /UE")
            o, oe = enc.get("O"), enc.get("OE")
            if h(pw, u[32:40], b"") == u[:32]:
                ik = h(pw, u[40:48], b"")
                self._enc_key = aes_cbc_decrypt_nopad(ik, b"\x00" * 16, ue[:32])
            elif (
                isinstance(o, bytes)
                and len(o) >= 48
                and isinstance(oe, bytes)
                and h(pw, o[32:40], u[:48]) == o[:32]
            ):
                ik = h(pw, o[40:48], u[:48])
                self._enc_key = aes_cbc_decrypt_nopad(ik, b"\x00" * 16, oe[:32])
            else:
                raise PdfError(_wrong)
            self._enc_aes = True
            self._enc_v5 = True
            return
        if v == 4 and r == 4:
            # Crypt-filter form: only the AESV2 StdCF (the modern default)
            cf = self.resolve(enc.get("CF", {})) or {}
            stdcf = self.resolve(cf.get("StdCF", {})) or {}
            cfm = str(stdcf.get("CFM", ""))
            if cfm == "AESV2":
                self._enc_aes = True
            elif cfm != "V2":  # V2 = RC4 under the crypt-filter syntax
                raise PdfError(f"encrypted PDF: crypt filter {cfm} unsupported")
        elif v not in (1, 2) or r not in (2, 3):
            raise PdfError(f"encrypted PDF: V={v}/R={r} unsupported")
        o, u = enc.get("O"), enc.get("U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("encrypted PDF: malformed /O or /U")
        p = int(enc.get("P", -1))
        default_len = 128 if v == 4 else 40
        nbytes = int(enc.get("Length", default_len) or default_len) // 8
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0] if isinstance(ids, list) and ids else b""
        enc_meta = bool(self.resolve(enc.get("EncryptMetadata", True)))

        def try_user(user_pw: bytes) -> bytes | None:
            key = _std_key(o, p, id0, r, nbytes, user=user_pw,
                           encrypt_metadata=enc_meta)
            check = _std_user_check(key, id0, r)
            ok = (check if r == 2 else check[:16]) == (u if r == 2 else u[:16])
            return key if ok else None

        key = try_user(pw)
        if key is None:
            # Algorithm 7: treat pw as the OWNER password — recover the
            # padded user password from /O and re-run the user check.
            okey = hashlib.md5((pw + _PDF_PAD)[:32]).digest()
            if r >= 3:
                for _ in range(50):
                    okey = hashlib.md5(okey).digest()
            okey = okey[:nbytes]
            if r == 2:
                recovered = _rc4(okey, o)
            else:  # undo Algorithm 3 step f: rounds 19..0 with xored keys
                recovered = o
                for i in range(19, -1, -1):
                    recovered = _rc4(bytes(b ^ i for b in okey), recovered)
            key = try_user(recovered)
        if key is None:
            raise PdfError(_wrong)
        self._enc_key = key

    def _decrypt_bytes(self, num: int, gen: int, data: bytes) -> bytes:
        """One string/stream payload — RC4 or AES-CBC (IV-prefixed,
        PKCS#7) per the handler in force. V5 uses the FILE key directly
        (no per-object MD5 derivation, by design of the AES-256 handler);
        earlier revisions derive a per-object key."""
        if self._enc_v5:
            key = self._enc_key
        else:
            key = _obj_rc4_key(self._enc_key, num, gen, aes=self._enc_aes)
        if self._enc_aes:
            from .aes import aes_cbc_decrypt

            return aes_cbc_decrypt(key, data)
        return _rc4(key, data)

    def _decrypt_obj(self, num: int, gen: int, obj):
        """Decrypt every string (bytes) in an indirect object tree; the
        stream payload is handled separately in _read_object_at."""

        def walk(x):
            if isinstance(x, bytes):
                return self._decrypt_bytes(num, gen, x)
            if isinstance(x, dict):
                return {k: walk(v) for k, v in x.items()}
            if isinstance(x, list):
                return [walk(v) for v in x]
            return x

        return walk(obj)

    # -- xref ---------------------------------------------------------------
    def _load_xref(self):
        tail = self.data[-2048:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise PdfError("no startxref")
        pos = int(m[-1].group(1))
        seen = set()
        while pos and pos not in seen:
            seen.add(pos)
            lex = _Lexer(self.data, pos)
            tok = lex.read_token()
            if isinstance(tok, int):
                # PDF 1.5+ cross-reference STREAM ("N 0 obj << /Type /XRef …")
                pos = self._load_xref_stream(pos)
                continue
            if tok != b"xref":
                raise PdfError("unrecognized xref section")
            entry_re = re.compile(rb"(\d{10})\s+(\d{5})\s+([nf])\s*")
            while True:
                tok = lex.read_token()
                if tok == b"trailer":
                    break
                start = tok
                count = lex.read_token()
                if not isinstance(start, int) or not isinstance(count, int):
                    raise PdfError("bad xref subsection")
                lex._skip_ws()
                for i in range(count):
                    m = entry_re.match(self.data, lex.pos)
                    if not m:
                        raise PdfError("bad xref entry")
                    num = start + i
                    if m.group(3) == b"n" and num not in self.xref:
                        self.xref[num] = int(m.group(1))
                    lex.pos = m.end()
            trailer = lex.read_object()
            if not isinstance(trailer, dict):
                raise PdfError("bad trailer")
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            pos = trailer.get("Prev", 0)

    def _read_object_at(self, pos: int):
        """Read ``num gen obj <object> [stream]`` directly at a byte offset
        (used before/while the xref map exists). Returns (num, obj)."""
        lex = _Lexer(self.data, pos)
        num = lex.read_token()
        gen = lex.read_token()
        kw = lex.read_token()
        if not isinstance(num, int) or not isinstance(gen, int) or kw != b"obj":
            raise PdfError(f"no object at offset {pos}")
        obj = lex.read_object()
        lex._skip_ws()
        is_xref_stream = isinstance(obj, dict) and str(obj.get("Type")) == "XRef"
        if self._enc_key is not None and not is_xref_stream:
            # Strings in indirect objects are encrypted (spec §7.6.2);
            # XRef streams and the /Encrypt dict (cached plain during key
            # setup) are not.
            obj = self._decrypt_obj(num, gen, obj)
        if isinstance(obj, dict) and self.data.startswith(b"stream", lex.pos):
            p = lex.pos + len(b"stream")
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] == b"\n":
                p += 1
            length = obj.get("Length", 0)
            if isinstance(length, _Ref):
                length = self.resolve(length)
            raw = self.data[p : p + int(length)]
            if self._enc_key is not None and not is_xref_stream:
                # Stream payloads decrypt BEFORE filters (encryption is
                # applied to the stored, already-filtered bytes).
                raw = self._decrypt_bytes(num, gen, raw)
            filt = obj.get("Filter")
            filters = filt if isinstance(filt, list) else ([filt] if filt else [])
            parms_raw = obj.get("DecodeParms")
            parms_list = (
                parms_raw
                if isinstance(parms_raw, list)
                else [parms_raw] * len(filters)
            )
            for fi, f in enumerate(filters):
                fp = parms_list[fi] if fi < len(parms_list) else None
                fp = fp if isinstance(fp, dict) else {}
                name = str(f)
                if name == "FlateDecode":
                    raw = zlib.decompress(raw)
                elif name == "LZWDecode":
                    raw = _lzw_decode(raw, int(fp.get("EarlyChange", 1) or 0))
                elif name == "RunLengthDecode":
                    raw = _rle_decode(raw)
                else:
                    raise PdfError(f"unsupported filter {f}")
                if int(fp.get("Predictor", 1) or 1) >= 10:
                    raw = _png_unpredict(raw, int(fp.get("Columns", 1)))
            obj = dict(obj)
            obj["__stream__"] = raw
        return num, obj

    def _load_xref_stream(self, pos: int) -> int:
        """One cross-reference stream section (PDF 1.5, ISO 32000 §7.5.8):
        /W field widths, /Index subsections, type-1 offsets and type-2
        (object-stream, index) entries; trailer fields live in the same
        dict. Returns /Prev (0 = done)."""
        _, obj = self._read_object_at(pos)
        if not isinstance(obj, dict) or "__stream__" not in obj:
            raise PdfError("bad xref stream object")
        w = [int(x) for x in obj.get("W", [1, 1, 1])]
        size = int(obj.get("Size", 0))
        index = [int(x) for x in obj.get("Index", [0, size])]
        data = obj["__stream__"]
        row_len = sum(w)
        rownum = 0

        def field(row: bytes, k: int) -> int:
            lo = sum(w[:k])
            chunk = row[lo : lo + w[k]]
            return int.from_bytes(chunk, "big") if chunk else (1 if k == 0 else 0)

        for si in range(0, len(index), 2):
            start, count = index[si], index[si + 1]
            for i in range(count):
                row = data[rownum * row_len : (rownum + 1) * row_len]
                rownum += 1
                if len(row) < row_len:
                    break
                num = start + i
                typ = field(row, 0)
                if typ == 1 and num not in self.xref and num not in self._in_objstm:
                    self.xref[num] = field(row, 1)
                elif typ == 2 and num not in self.xref and num not in self._in_objstm:
                    self._in_objstm[num] = (field(row, 1), field(row, 2))
        for k, v in obj.items():
            if k not in ("__stream__",):
                self.trailer.setdefault(k, v)
        return int(obj.get("Prev", 0) or 0)

    def _scan_objects(self):
        """Damaged-xref fallback: brute-scan ``N G obj`` headers (last
        occurrence of each object number wins — incremental-update
        order), then unpack any scanned /ObjStm so its compressed
        objects (often the catalog itself in PDF 1.5 files) resolve
        without a usable xref stream (round 5)."""
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            self.xref[int(m.group(1))] = m.start()
        for num in list(self.xref):
            try:
                obj = self.get(num)
            except (PdfError, ValueError, IndexError, KeyError):
                continue
            if (
                isinstance(obj, dict)
                and obj.get("Type") == "ObjStm"
                and "__stream__" in obj
            ):
                try:
                    toks = obj["__stream__"][: int(obj.get("First", 0))].split()
                    for idx in range(min(int(obj.get("N", 0)), len(toks) // 2)):
                        onum = int(toks[2 * idx])
                        if onum not in self.xref and onum not in self._in_objstm:
                            self._in_objstm[onum] = (num, idx)
                except (ValueError, IndexError):
                    continue
        m = re.search(rb"trailer\s*<<", self.data)
        if m:
            lex = _Lexer(self.data, m.end() - 2)
            obj = lex.read_object()
            if isinstance(obj, dict):
                for k, v in obj.items():
                    self.trailer.setdefault(k, v)
        if "Root" not in self.trailer:
            # last resort: find the object whose dict is a /Catalog
            for num in list(self.xref) + list(self._in_objstm):
                try:
                    obj = self.get(num)
                except (PdfError, ValueError, IndexError, KeyError):
                    continue
                if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                    self.trailer["Root"] = _Ref((num, 0))
                    break

    # -- objects ------------------------------------------------------------
    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num in self._in_objstm:
            obj = self._get_from_objstm(*self._in_objstm[num])
            self._cache[num] = obj
            return obj
        off = self.xref.get(num)
        if off is None:
            return None
        n1, obj = self._read_object_at(off)
        if n1 != num:
            raise PdfError(f"object {num} not at offset {off}")
        self._cache[num] = obj
        return obj

    def _get_from_objstm(self, stm_num: int, idx: int):
        """Object ``idx`` of compressed object stream ``stm_num`` (PDF 1.5
        /ObjStm, ISO 32000 §7.5.7: ``/N`` pair-count, ``/First`` data
        offset, 'num off' header pairs)."""
        stm = self.get(stm_num)
        if not isinstance(stm, dict) or "__stream__" not in stm:
            raise PdfError(f"object stream {stm_num} missing")
        data = stm["__stream__"]
        n = int(stm.get("N", 0))
        first = int(stm.get("First", 0))
        header = _Lexer(data[:first])
        pairs = []
        for _ in range(n):
            onum = header.read_token()
            ooff = header.read_token()
            pairs.append((onum, ooff))
        if idx >= len(pairs):
            raise PdfError(f"objstm index {idx} out of range")
        _, off = pairs[idx]
        return _Lexer(data, first + int(off)).read_object()

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, _Ref):
            obj = self.get(obj[0])
            seen += 1
            if seen > 32:
                raise PdfError("reference loop")
        return obj

    # -- page tree ----------------------------------------------------------
    def pages(self) -> list[dict]:
        """Flattened page list with inherited attributes."""
        root = self.resolve(self.trailer["Root"])
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []
        inheritable = ("Resources", "MediaBox", "Rotate")

        def walk(node, inherited, depth=0):
            if node is None or depth > 64:
                return
            node = self.resolve(node)
            merged = dict(inherited)
            for k in inheritable:
                if k in node:
                    merged[k] = node[k]
            if str(node.get("Type", "")) == "Page" or (
                "Kids" not in node and "Contents" in node
            ):
                page = dict(node)
                for k, v in merged.items():
                    page.setdefault(k, v)
                out.append(page)
                return
            for kid in self.resolve(node.get("Kids", [])) or []:
                walk(kid, merged, depth + 1)

        walk(tree, {})
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, dict):
            return contents.get("__stream__", b"")
        parts = []
        for ref in contents:
            obj = self.resolve(ref)
            if isinstance(obj, dict):
                parts.append(obj.get("__stream__", b""))
        return b"\n".join(parts)

    def page_font_maps(self, page: dict) -> dict[str, tuple[int, dict[int, int]]]:
        """Per-font ``(code_bytes, code→codepoint map)`` for one page.

        ``code_bytes`` is 2 for composite (``/Subtype /Type0``) fonts —
        the Identity-H codespace, which covers essentially all real-world
        CID usage (non-identity encoding CMaps are read with the same
        2-byte codespace; their /ToUnicode is keyed by CODE, so extraction
        is still correct) — else 1. The map: /ToUnicode CMap wins, else
        /Encoding /Differences via the glyph-name list; unmapped codes
        fall through to identity (builtin encoding, or CID==codepoint for
        a Type0 font without /ToUnicode)."""
        res = self.resolve(page.get("Resources")) or {}
        fonts = self.resolve(res.get("Font")) if isinstance(res, dict) else None
        out: dict[str, tuple[int, dict[int, int]]] = {}
        if not isinstance(fonts, dict):
            return out
        for fname, fref in fonts.items():
            font = self.resolve(fref)
            if not isinstance(font, dict):
                continue
            width = 2 if str(font.get("Subtype", "")) == "Type0" else 1
            cmap: dict[int, int] = {}
            enc = self.resolve(font.get("Encoding"))
            if isinstance(enc, dict):
                diffs = self.resolve(enc.get("Differences")) or []
                code = 0
                for item in diffs:
                    if isinstance(item, (int, float)):
                        code = int(item)
                    else:
                        cp = _glyph_to_cp(str(item))
                        if cp is not None:
                            cmap[code] = cp
                        code += 1
            tu = self.resolve(font.get("ToUnicode"))
            if isinstance(tu, dict) and "__stream__" in tu:
                cmap.update(_parse_tounicode(tu["__stream__"]))
            if cmap or width == 2:
                out[str(fname)] = (width, cmap)
        return out

    # -- outline ------------------------------------------------------------
    def outline(self) -> list[tuple[str, int]]:
        """Flat top-level outline: ``[(title, page_index), ...]`` — the
        shape the reference's splitter walks
        (reference: src/services/pdf_processor.py:105-142).

        Bounded at 256 entries (a declared limit for hostile inputs — long
        real outlines past 256 bookmarks are truncated); a malformed
        ``/Next`` cycle terminates at the first revisited node reference
        instead of emitting duplicates up to the cap."""
        root = self.resolve(self.trailer["Root"])
        ol = self.resolve(root.get("Outlines"))
        if not isinstance(ol, dict):
            return []
        # page object number → page index (walk the tree by reference)
        page_index: dict[int, int] = {}

        def collect(node_ref, depth=0):
            if depth > 64:
                return
            node = self.resolve(node_ref)
            if node is None:
                return
            if str(node.get("Type", "")) == "Page" or (
                "Kids" not in node and "Contents" in node
            ):
                if isinstance(node_ref, _Ref):
                    page_index[node_ref[0]] = len(page_index)
                return
            for kid in self.resolve(node.get("Kids", [])) or []:
                collect(kid, depth + 1)

        collect(root.get("Pages"))

        out: list[tuple[str, int]] = []
        node = ol.get("First")
        hops = 0
        seen_refs: set = set()
        while node is not None and hops < 256:
            hops += 1
            if isinstance(node, _Ref):
                if node[0] in seen_refs:  # /Next self-loop / cycle
                    break
                seen_refs.add(node[0])
            item = self.resolve(node)
            if not isinstance(item, dict):
                break
            title_b = item.get("Title", b"")
            title = (
                title_b.decode("latin-1", "replace")
                if isinstance(title_b, (bytes, bytearray))
                else str(title_b)
            )
            dest = item.get("Dest")
            if dest is None:
                action = self.resolve(item.get("A"))
                if isinstance(action, dict):
                    dest = action.get("D")
            dest = self.resolve(dest) if not isinstance(dest, list) else dest
            idx = 0
            if isinstance(dest, list) and dest and isinstance(dest[0], _Ref):
                idx = page_index.get(dest[0][0], 0)
            elif isinstance(dest, list) and dest and isinstance(dest[0], int):
                idx = int(dest[0])
            out.append((title, idx))
            node = item.get("Next")
        return out


# ---------------------------------------------------------------------------
# Content-stream interpreter → layout records
# ---------------------------------------------------------------------------


# Adobe Glyph List subset: the names simple-font /Differences arrays use
# for ASCII text (letters map to themselves; uniXXXX handled generically).
_AGL = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26, "quotesingle": 0x27,
    "parenleft": 0x28, "parenright": 0x29, "asterisk": 0x2A, "plus": 0x2B,
    "comma": 0x2C, "hyphen": 0x2D, "period": 0x2E, "slash": 0x2F,
    "zero": 0x30, "one": 0x31, "two": 0x32, "three": 0x33, "four": 0x34,
    "five": 0x35, "six": 0x36, "seven": 0x37, "eight": 0x38, "nine": 0x39,
    "colon": 0x3A, "semicolon": 0x3B, "less": 0x3C, "equal": 0x3D,
    "greater": 0x3E, "question": 0x3F, "at": 0x40, "bracketleft": 0x5B,
    "backslash": 0x5C, "bracketright": 0x5D, "asciicircum": 0x5E,
    "underscore": 0x5F, "grave": 0x60, "braceleft": 0x7B, "bar": 0x7C,
    "braceright": 0x7D, "asciitilde": 0x7E,
}


def _glyph_to_cp(name: str) -> int | None:
    """Glyph name → Unicode codepoint: single-char names map to
    themselves, ``uniXXXX`` decodes hex, else the AGL subset above."""
    if len(name) == 1:
        return ord(name)
    if name.startswith("uni") and len(name) == 7:
        try:
            return int(name[3:], 16)
        except ValueError:
            return None
    return _AGL.get(name)


def _parse_tounicode(data: bytes) -> dict[int, int]:
    """code → codepoint map from a /ToUnicode CMap stream (bfchar +
    bfrange sections). Source codes may be 1-byte (simple fonts) or
    2-byte (composite/CID fonts — ``<0121>``-style); the code value is
    the integer either way, and the interpreter chooses how many bytes
    each show-string code consumes from the font's ``code_bytes``. A
    bfrange is capped at 2^16 codes (hostile-input bound)."""
    out: dict[int, int] = {}
    for block in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block):
            if dst:
                out[int(src, 16)] = int(dst[:4], 16)
    for block in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", block
        ):
            lo_i, hi_i, base = int(lo, 16), int(hi, 16), int(dst[:4], 16)
            for c in range(lo_i, min(hi_i, lo_i + 0xFFFF) + 1):
                out[c] = base + (c - lo_i)
    return out


def _interpret_text(
    content: bytes,
    page_idx: int,
    records: list,
    font_maps: dict | None = None,
) -> None:
    """Execute the text operators of one page's content stream, appending
    ``(page, x0, y0, x1, y1, cp)`` records (space glyphs advance the pen but
    emit no record — the layout kernel re-derives word gaps, exactly like
    the toy decoder). ``font_maps`` is ``{font_resource_name: (code_bytes,
    {code: cp})}`` from :meth:`PdfDocument.page_font_maps` — codes without
    a map entry read as their own codepoint (the builtin-encoding identity,
    or CID==codepoint for Identity-H without /ToUnicode); ``code_bytes=2``
    consumes show-string bytes in big-endian pairs (composite fonts)."""
    lex = _Lexer(content)
    stack: list = []
    size = 12.0
    leading = 0.0
    font_maps = font_maps or {}
    cur_map: dict = {}
    cur_width = 1
    # text matrix (a b c d e f); we use e,f (+ a,d scale) — fixtures are
    # unrotated, but the multiply below is the general one.
    tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    tlm = list(tm)
    in_text = False

    def show(s: bytes):
        nonlocal tm
        if not in_text:
            return
        w = COURIER_ADVANCE * size * tm[0]
        x = tm[4]
        y = tm[5]
        h = LINE_H
        if cur_width == 2:
            codes = [(s[i] << 8) | s[i + 1] for i in range(0, len(s) - 1, 2)]
            if len(s) % 2:  # malformed odd tail: tolerate as 1-byte code
                codes.append(s[-1])
        else:
            codes = list(s)
        for b in codes:
            cp = cur_map.get(b, b)
            if cp != 0x20:
                records.append((page_idx, x, y, x + w, y + h, cp))
            x += w
        tm[4] = x

    def next_line(tx: float, ty: float):
        nonlocal tm, tlm
        # Tlm = [1 0 0 1 tx ty] × Tlm
        tlm = [
            tlm[0], tlm[1], tlm[2], tlm[3],
            tx * tlm[0] + ty * tlm[2] + tlm[4],
            tx * tlm[1] + ty * tlm[3] + tlm[5],
        ]
        tm = list(tlm)

    n = len(content)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        try:
            tok = lex.read_token()
        except PdfError:
            break
        if tok in ("dict_open", "arr_open"):
            stack.append(lex.read_object(tok))
            continue
        if not isinstance(tok, _Kw):
            stack.append(tok)  # operand: number / string / name / bool
            continue
        op = bytes(tok)
        if op == b"BI":
            # Inline image (ISO 32000 §8.9.7): skip "BI <dict> ID <binary>
            # EI" entirely — the raw sample bytes would otherwise derail
            # the tokenizer (they may contain '(', '<', …). Find the ID
            # keyword lexically, then scan for whitespace-delimited EI.
            m = re.compile(rb"\bID[\x00\t\n\f\r ]").search(content, lex.pos)
            scan = m.end() if m else lex.pos
            m2 = re.compile(rb"[\x00\t\n\f\r ]EI\b").search(content, scan)
            lex.pos = m2.end() if m2 else n
            stack.clear()
            continue
        if op == b"BT":
            in_text = True
            tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
            tlm = list(tm)
        elif op == b"ET":
            in_text = False
        elif op == b"Tf" and len(stack) >= 2:
            size = float(stack[-1])
            cur_width, cur_map = font_maps.get(str(stack[-2]), (1, {}))
        elif op == b"TL" and stack:
            leading = float(stack[-1])
        elif op == b"Td" and len(stack) >= 2:
            next_line(float(stack[-2]), float(stack[-1]))
        elif op == b"TD" and len(stack) >= 2:
            leading = -float(stack[-1])
            next_line(float(stack[-2]), float(stack[-1]))
        elif op == b"Tm" and len(stack) >= 6:
            tlm = [float(v) for v in stack[-6:]]
            tm = list(tlm)
        elif op == b"T*":
            next_line(0.0, -leading)
        elif op == b"Tj" and stack:
            show(stack[-1] if isinstance(stack[-1], bytes) else b"")
        elif op == b"TJ" and stack:
            arr = stack[-1]
            if isinstance(arr, list):
                for el in arr:
                    if isinstance(el, (bytes, bytearray)):
                        show(bytes(el))
                    elif isinstance(el, (int, float)):
                        tm[4] -= float(el) / 1000.0 * size * tm[0]
        elif op == b"'" and stack:
            next_line(0.0, -leading)
            show(stack[-1] if isinstance(stack[-1], bytes) else b"")
        elif op == b'"' and len(stack) >= 3:
            next_line(0.0, -leading)
            show(stack[-1] if isinstance(stack[-1], bytes) else b"")
        # any other operator: ignore
        stack.clear()


_MALFORMED_EXC = (
    AttributeError, TypeError, IndexError, KeyError, ValueError,
    zlib.error, struct.error, RecursionError,
)


def parse_pdf_records(payload: bytes, password: bytes = b"") -> np.ndarray:
    """Real-PDF decode: parse structure, run the text interpreter over every
    page, return the layout RECORD array the shared kernel consumes.
    ``password`` opens standard-handler-encrypted files (user or owner).

    Typed-error contract (round-5 mutation fuzz): malformed structures
    that slip past the targeted checks — an object of the wrong type
    where the graph walk expects a dict, corrupt Flate data, truncated
    binary structs — surface as :class:`PdfError`, never a raw
    AttributeError/TypeError/zlib.error; a crawl extract stage keys its
    per-document containment on the typed error."""
    try:
        doc = PdfDocument(payload, password=password)
        records: list = []
        for idx, page in enumerate(doc.pages()):
            _interpret_text(
                doc.page_content(page), idx, records, doc.page_font_maps(page)
            )
        return np.array(records, dtype=RECORD_DTYPE)
    except PdfError:
        raise
    except _MALFORMED_EXC as exc:
        raise PdfError(
            f"malformed PDF structure ({type(exc).__name__}: {exc})"
        ) from exc


def parse_pdf_outline(payload: bytes) -> list[tuple[str, int]]:
    """Outline bookmarks ``[(title, page_index), ...]`` of a real PDF
    (same typed-error contract as :func:`parse_pdf_records`)."""
    try:
        return PdfDocument(payload).outline()
    except PdfError:
        raise
    except _MALFORMED_EXC as exc:
        raise PdfError(
            f"malformed PDF structure ({type(exc).__name__}: {exc})"
        ) from exc
