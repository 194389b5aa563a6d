"""Text normalization and number extraction.

Semantics mirrored from the reference's ContentNormalizer
(reference: src/services/validation/content_normalizer.py:14-121) and the
filename/bidi helpers (reference: src/services/pdf_input_handler.py:130-136,
src/services/workflows/default_handler.py:176-182,
src/services/extraction_service.py:50-57).
"""

from __future__ import annotations

import re

_CURRENCY_RE = re.compile(r"[₪$€£¥₹₪]")
# Optional minus; digits; optional thousands groups split by , . or space;
# optional decimal part; optional trailing percent
# (reference: content_normalizer.py:56).
_NUMBER_RE = re.compile(r"-?\d+(?:[,\.\s]\d{3})*(?:[,\.]\d+)?%?")
_HEBREW_RE = re.compile(r"[֐-׿]")
# Strip everything that is not a Unicode alphanumeric ([\W_] = non-word or
# underscore; \w minus underscore == str.isalnum for practical purposes) —
# a C-level replacement for a per-char isalnum scan.
_NON_ALNUM_RE = re.compile(r"[\W_]+", re.UNICODE)


def normalize_for_comparison(text: str) -> str:
    """Keep only Unicode alphanumerics, lowercased.

    Filters formatting/punctuation/whitespace so comparisons are content-only
    (reference: content_normalizer.py:14-28). Works for Hebrew/Arabic/CJK.
    """
    if not text:
        return ""
    return _NON_ALNUM_RE.sub("", text).lower()


def _disambiguate_separators(num: str) -> str:
    """Resolve US (1,234.56) vs European (1.234,56) separator conventions.

    Decision rules mirrored from reference: content_normalizer.py:65-107 —
    when both separators appear the last one is the decimal point; a single
    comma followed by <=2 digits is a European decimal; multiple periods are
    thousands separators with the last kept as decimal iff <=2 trailing digits.
    """
    periods = num.count(".")
    commas = num.count(",")
    if commas and periods:
        if num.rfind(",") > num.rfind("."):
            num = num.replace(".", "").replace(",", ".")
        else:
            num = num.replace(",", "")
    elif commas:
        after = num[num.rfind(",") + 1 :]
        if commas == 1 and len(after) <= 2 and after.isdigit():
            num = num.replace(",", ".")
        else:
            num = num.replace(",", "")
    elif periods > 1:
        parts = num.split(".")
        if len(parts[-1]) <= 2:
            num = "".join(parts[:-1]) + "." + parts[-1]
        else:
            num = num.replace(".", "")
    return num


def extract_numbers(text: str) -> list[str]:
    """Extract all numbers from text as normalized canonical strings.

    ``"1,234,567" -> "1234567"``, ``"1.234.567,89" -> "1234567.89"``,
    ``"15%" -> "15"``, ``"₪5,000" -> "5000"``, ``"-1,234" -> "-1234"``
    (reference: content_normalizer.py:30-121).
    """
    if not text:
        return []
    cleaned = _CURRENCY_RE.sub("", text)
    out: list[str] = []
    for match in _NUMBER_RE.findall(cleaned):
        num = _disambiguate_separators(match.rstrip("%")).replace(" ", "")
        try:
            float(num)
        except ValueError:
            continue
        out.append(num)
    return out


def fix_bidi_text(text: str) -> str:
    """Reverse Hebrew/RTL display-order text so it reads logically.

    The reference flips cell text containing Hebrew codepoints when the PDF
    layer stored it in visual order (reference: extraction_service.py:50-57).
    Deterministic: flips iff any Hebrew character is present.
    """
    if text and _HEBREW_RE.search(text):
        return text[::-1]
    return text


def sanitize_filename(filename: str) -> str:
    """Strip path components and control characters from a filename
    (reference: pdf_input_handler.py:130-136)."""
    name = filename.replace("\\", "/").split("/")[-1]
    return "".join(ch for ch in name if ch.isprintable() and ch not in '<>:"|?*')


def safe_filename(title: str, base: str, max_len: int = 50) -> str:
    """Build ``{title}_{base}.md``-style safe section filename: keep
    alnum/space/dash/underscore, spaces→underscores, truncate to ``max_len``
    (reference: default_handler.py:176-182)."""
    safe = "".join(c for c in title if c.isalnum() or c in (" ", "-", "_"))
    safe = safe.strip().replace(" ", "_")[:max_len]
    return f"{safe}_{base}.md" if safe else f"{base}.md"
