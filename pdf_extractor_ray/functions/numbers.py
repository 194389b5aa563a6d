"""Number parsing and running-balance transaction classification.

Semantics mirrored from the reference's bank-statement classifier
(reference: scripts/classify_debit_credit.py:29-258). These power the
``classify_transactions`` pipeline operator and the balance-continuity rule
used by cross-page table merging (..functions.tables).
"""

from __future__ import annotations

import re

import pandas as pd

_NON_NUM_RE = re.compile(r"[^\d.,\-]")

BALANCE_KEYWORDS = ("balance", "יתרה", "saldo", "solde", "reste", 'ח"שב')
DEBIT_KEYWORDS = ("debit", "חובה", "withdrawal", "retrait", "expense")
CREDIT_KEYWORDS = ("credit", "זכות", "deposit", "dépôt", "income")


def parse_number(text: object) -> float | None:
    """Parse a human-formatted number to float, or None.

    ``"1,234.56"→1234.56``, ``"1.234,56"→1234.56``, ``"(123.45)"→-123.45``
    (parentheses = negative), ``"₪1,234"→1234.0``
    (reference: scripts/classify_debit_credit.py:29-77).
    """
    if not text or not isinstance(text, str):
        return None
    text = text.strip().replace("₪", "").replace("$", "").replace("€", "").strip()
    is_negative = text.startswith("(") and text.endswith(")")
    if is_negative:
        text = text[1:-1]
    cleaned = _NON_NUM_RE.sub("", text)
    if not cleaned:
        return None
    if "." in cleaned and "," in cleaned:
        if cleaned.rindex(".") > cleaned.rindex(","):
            cleaned = cleaned.replace(",", "")
        else:
            cleaned = cleaned.replace(".", "").replace(",", ".")
    elif "," in cleaned:
        # A single comma within the last 3 characters is a decimal comma;
        # otherwise commas are thousands separators.
        if cleaned.index(",") > len(cleaned) - 4:
            cleaned = cleaned.replace(",", ".")
        else:
            cleaned = cleaned.replace(",", "")
    try:
        value = float(cleaned)
    except ValueError:
        return None
    return -value if is_negative else value


def find_balance_column(df: pd.DataFrame) -> str | None:
    """Locate the running-balance column by keyword, else statistically:
    a column >70% numeric whose diffs are smooth (max diff < 100× mean diff)
    (reference: scripts/classify_debit_credit.py:81-111)."""
    for col in df.columns:
        col_str = str(col).lower()
        if any(kw in col_str for kw in BALANCE_KEYWORDS):
            return col
    for col in df.columns:
        values = df[col].apply(parse_number)
        if values.notna().sum() > len(df) * 0.7:
            diffs = values.diff().abs()
            avg_diff = diffs.mean()
            max_diff = diffs.max()
            if avg_diff and avg_diff > 0 and max_diff < avg_diff * 100:
                return col
    return None


def find_amount_columns(df: pd.DataFrame) -> dict[str, str | None]:
    """Locate debit/credit columns by keyword, else the first >50%-numeric
    non-balance column as a combined 'amount'
    (reference: scripts/classify_debit_credit.py:114-158)."""
    result: dict[str, str | None] = {"debit": None, "credit": None, "amount": None}
    for col in df.columns:
        col_str = str(col).lower()
        if result["debit"] is None and any(kw in col_str for kw in DEBIT_KEYWORDS):
            result["debit"] = col
        if result["credit"] is None and any(kw in col_str for kw in CREDIT_KEYWORDS):
            result["credit"] = col
    balance_col = find_balance_column(df)
    for col in df.columns:
        if col == balance_col:
            continue
        values = df[col].apply(parse_number)
        if values.notna().sum() > len(df) * 0.5:
            if result["amount"] is None:
                result["amount"] = col
    return result


def classify_transactions(df: pd.DataFrame) -> pd.DataFrame:
    """Classify each row DEBIT/CREDIT/UNCLEAR from the running balance.

    ``balance[n] ≈ balance[n-1] + amount[n]`` → CREDIT;
    ``≈ balance[n-1] - amount[n]`` → DEBIT; else UNCLEAR, with 1% tolerance
    on the balance delta (reference: scripts/classify_debit_credit.py:161-258).
    Adds ``transaction_type`` and ``classified_amount`` columns.
    """
    out = df.copy()
    out["transaction_type"] = ""
    out["classified_amount"] = None
    balance_col = find_balance_column(out)
    if not balance_col:
        return out
    amount_cols = find_amount_columns(out)
    balances = out[balance_col].apply(parse_number).tolist()

    types: list[str] = [""] * len(out)
    amounts: list[float | None] = [None] * len(out)
    for i in range(1, len(out)):
        prev_balance, curr_balance = balances[i - 1], balances[i]
        if prev_balance is None or curr_balance is None:
            continue
        amount = None
        if amount_cols["debit"] and amount_cols["credit"]:
            debit_val = parse_number(str(out.iloc[i][amount_cols["debit"]]))
            credit_val = parse_number(str(out.iloc[i][amount_cols["credit"]]))
            if debit_val and debit_val > 0:
                amount, types[i] = debit_val, "DEBIT"
            elif credit_val and credit_val > 0:
                amount, types[i] = credit_val, "CREDIT"
        elif amount_cols["amount"]:
            amount = parse_number(str(out.iloc[i][amount_cols["amount"]]))
            if amount is not None:
                diff = curr_balance - prev_balance
                tolerance = abs(diff) * 0.01
                if abs(diff - amount) < tolerance:
                    types[i] = "CREDIT"
                elif abs(diff + amount) < tolerance:
                    types[i] = "DEBIT"
                else:
                    types[i] = "UNCLEAR"
        amounts[i] = amount
    out["transaction_type"] = types
    out["classified_amount"] = amounts
    return out
