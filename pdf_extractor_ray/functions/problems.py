"""The fourteen extraction-quality problem detectors.

Semantics mirrored one-for-one from the reference's ProblemDetector
(reference: src/services/validation/problem_detector.py:33-523): each detector
is a pure predicate over a page's markdown. The registry + enable-list
mechanism mirrors reference: problem_detector.py:424-452 with the default
seven-detector enable set from reference: src/core/config.py:100.
"""

from __future__ import annotations

import re
from collections import Counter

from .normalize import extract_numbers

# 5+ consecutive mostly-empty table lines `| | |`
# (reference: problem_detector.py:33).
_EMPTY_TABLE_RE = re.compile(r"(\|\s*\|\s*\|.*\n){5,}")
_REPEATED_CHAR_RE = re.compile(r"(.)\1{9,}", re.DOTALL)
_ALLOWED_REPEATS = {" ", "-", "_", "=", "*", "\n"}
_COMMON_CHARS = set(" \n\t.,;:!?-()[]{}\"'/\\|")
_DIGITS_RE = re.compile(r"\d+")
_TABLE_REPEAT_RE = re.compile(r"\|\s*(\d+(?:[.,]\d+)?)\s*\|(?:\s*\1\s*\|){2,}")
_TEXT_REPEAT_RE = re.compile(r"\b(\d+(?:[.,]\d+)?)\s+(?:\1\s+){2,}")
_UNKNOWN_CHARS = ("□", "�", "☐", "▯", "▢", "▣")
_STANDALONE_Q_RE = re.compile(r"\s\?\s")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^\)]+)\)")
# Alphanumeric runs ([^\W_] == unicode letters+digits, no underscore) — a
# C-level replacement for per-char str.isalnum() scans (hot path: these
# detectors run on every extracted document).
_ALNUM_RUN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def count_alnum(text: str) -> int:
    """Number of alphanumeric characters (vectorized regex scan)."""
    return sum(map(len, _ALNUM_RUN_RE.findall(text)))

# Finance keywords, English + Hebrew (reference: problem_detector.py:240-250).
FINANCIAL_KEYWORDS = (
    "revenue", "expense", "balance", "asset", "liability", "equity",
    "income", "profit", "loss", "debit", "credit", "account",
    "total", "subtotal", "amount", "date", "transaction", "payment",
    "statement", "bank", "financial", "report", "summary",
    "הכנסות", "הוצאות", "יתרה", "חשבון", "סכום",
    'סה"כ', "זכות", "חובה", "תאריך", "עסקה",
    "תשלום", "דוח", "כספי", "מאזן", "רווח", "הפסד",
)


def detect_empty_tables(content: str) -> bool:
    """5+ consecutive mostly-empty `| | |` lines
    (reference: problem_detector.py:44-65)."""
    return bool(content) and bool(_EMPTY_TABLE_RE.search(content))


def detect_low_content_density(content: str) -> bool:
    """<100 alphanumeric characters (empty content counts as a problem)
    (reference: problem_detector.py:67-82)."""
    if not content:
        return True
    return count_alnum(content) < 100


def detect_missing_numbers(content: str) -> bool:
    """~5+ table rows (pipe count / 4) but zero extractable numbers
    (reference: problem_detector.py:84-107)."""
    if not content:
        return False
    table_rows = content.count("|") / 4
    return table_rows >= 5 and len(extract_numbers(content)) == 0


def detect_inconsistent_columns(content: str) -> bool:
    """>2 distinct column counts across table rows (OCR misalignment)
    (reference: problem_detector.py:109-134)."""
    if not content:
        return False
    table_lines = [ln.strip() for ln in content.split("\n") if ln.strip().startswith("|")]
    if len(table_lines) < 3:
        return False
    column_counts = {ln.count("|") - 1 for ln in table_lines}
    return len(column_counts) > 2


def detect_repeated_characters(content: str) -> bool:
    """Same character repeated 10+ times, excluding ``' -_=*\\n'``
    (reference: problem_detector.py:136-156)."""
    if not content:
        return False
    return any(m not in _ALLOWED_REPEATS for m in _REPEATED_CHAR_RE.findall(content))


def detect_garbled_text(content: str) -> bool:
    """special-char / alphanumeric ratio > 0.2 (common punctuation excluded);
    all-special content is garbled (reference: problem_detector.py:158-182)."""
    if not content:
        return False
    alnum = count_alnum(content)
    if alnum == 0:
        return True
    # special = everything that is neither alnum nor common punctuation;
    # counted with C-level str.count passes instead of a per-char scan
    # (alnum and the common set are disjoint, underscore counts as special).
    n_common = sum(content.count(c) for c in _COMMON_CHARS)
    special = len(content) - alnum - n_common
    return special / alnum > 0.2


def detect_header_only_tables(content: str) -> bool:
    """Table has a header separator but <=1 data rows after it
    (reference: problem_detector.py:184-211)."""
    if not content:
        return False
    lines = [ln.strip() for ln in content.split("\n") if ln.strip().startswith("|")]
    if len(lines) < 2:
        return False
    separator_indices = [i for i, ln in enumerate(lines) if "---" in ln]
    if not separator_indices:
        return False
    return len(lines) - separator_indices[0] - 1 <= 1


def detect_very_short_pages(content: str) -> bool:
    """<200 stripped characters (reference: problem_detector.py:213-228)."""
    if not content:
        return True
    return len(content.strip()) < 200


def detect_missing_keywords(content: str) -> bool:
    """No finance keyword (EN/HE) in a substantial (>=500 chars) page
    (reference: problem_detector.py:230-259)."""
    if not content or len(content) < 500:
        return False
    content_lower = content.lower()
    return not any(kw in content_lower for kw in FINANCIAL_KEYWORDS)


def detect_malformed_structure(content: str) -> bool:
    """A table separator line where <70% of parts are dash/space-only
    (reference: problem_detector.py:261-296)."""
    if not content:
        return False
    table_lines = [ln.strip() for ln in content.split("\n") if ln.strip().startswith("|")]
    if len(table_lines) < 2:
        return False
    for sep in (ln for ln in table_lines if "-" in ln):
        valid_parts = [
            set(p.strip()) <= {"-", " "} for p in sep.split("|") if p.strip()
        ]
        if valid_parts and sum(valid_parts) / len(valid_parts) < 0.7:
            return True
    return False


def detect_duplicate_content(content: str) -> bool:
    """A >50-char paragraph repeated 3+ times
    (reference: problem_detector.py:298-321)."""
    if not content:
        return False
    paragraphs = [p.strip() for p in content.split("\n\n") if p.strip()]
    if len(paragraphs) < 3:
        return False
    return any(
        count >= 3 and len(para) > 50 for para, count in Counter(paragraphs).items()
    )


def detect_repetitive_numbers(content: str) -> bool:
    """Same number repeated 3+ times in table cells or space-separated text
    (reference: problem_detector.py:323-355)."""
    if not content:
        return False
    return bool(_TABLE_REPEAT_RE.search(content)) or bool(_TEXT_REPEAT_RE.search(content))


def detect_unknown_characters(content: str) -> bool:
    """>5% unknown glyphs (□ � ☐ …) plus standalone question marks
    (reference: problem_detector.py:357-380)."""
    if not content:
        return False
    total = len(content)
    unknown = sum(content.count(ch) for ch in _UNKNOWN_CHARS)
    unknown += len(_STANDALONE_Q_RE.findall(content))
    return total > 0 and unknown / total > 0.05


def detect_markdown_images(content: str) -> bool:
    """Any markdown image reference ``![alt](path)``
    (reference: problem_detector.py:382-403)."""
    if not content:
        return False
    return bool(_IMAGE_RE.search(content))


PROBLEM_REGISTRY: dict[str, object] = {
    "empty_tables": detect_empty_tables,
    "low_content_density": detect_low_content_density,
    "missing_numbers": detect_missing_numbers,
    "inconsistent_columns": detect_inconsistent_columns,
    "repeated_characters": detect_repeated_characters,
    "garbled_text": detect_garbled_text,
    "header_only_tables": detect_header_only_tables,
    "very_short_pages": detect_very_short_pages,
    "missing_keywords": detect_missing_keywords,
    "malformed_structure": detect_malformed_structure,
    "duplicate_content": detect_duplicate_content,
    "unknown_characters": detect_unknown_characters,
    "repetitive_numbers": detect_repetitive_numbers,
    "markdown_images": detect_markdown_images,
}


def detect_all_problems(
    content: str, enabled: tuple[str, ...] | list[str]
) -> dict[str, bool]:
    """Run only the enabled detectors (skipping disabled ones is the
    reference's 46% speedup; reference: problem_detector.py:405-452)."""
    return {
        name: PROBLEM_REGISTRY[name](content)
        for name in enabled
        if name in PROBLEM_REGISTRY
    }


def has_any_problem(
    content: str, enabled: tuple[str, ...] | list[str]
) -> tuple[bool, list[str]]:
    """(has_problem, detected_names); empty content → ``['empty_content']``
    (reference: problem_detector.py:454-486)."""
    if not content:
        return True, ["empty_content"]
    detected = [name for name, hit in detect_all_problems(content, enabled).items() if hit]
    return bool(detected), detected
