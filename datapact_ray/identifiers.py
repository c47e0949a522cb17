"""Identifier slugging and payload value formatting.

The reference derives payload keys from user-supplied names via
``make_sql_identifier`` (``/root/reference/datapact/sql_utils.py:157-167``)
and formats every payload number with Spark's ``FORMAT_NUMBER`` /
``FORMAT_STRING('%.2f%%', ...)``
(``/root/reference/datapact/templates/validation.sql.j2:332-335``).
Both behaviours are reproduced here because payload key names and formatted
strings are part of the output contract.
"""

from __future__ import annotations

import re


def make_identifier(value: str, prefix: str = "cte") -> str:
    """Lowercase identifier derived from free-form text.

    Same normalization rules as the reference's ``make_sql_identifier``
    (collapse whitespace to ``_``, replace non-word chars, collapse ``_``
    runs, strip, lowercase, prefix when empty or digit-leading), so payload
    keys like ``custom_sql_validation_<slug>`` match.
    """
    cleaned = re.sub(r"\s+", "_", value.strip())
    cleaned = re.sub(r"[^\w]", "_", cleaned)
    cleaned = re.sub(r"_+", "_", cleaned).strip("_").lower()
    if not cleaned:
        cleaned = prefix
    if cleaned[0].isdigit():
        cleaned = f"{prefix}_{cleaned}"
    return cleaned


def fmt_number(value: float | int | None, decimals: int = 0) -> str | None:
    """Comma-grouped fixed-decimal formatting, like Spark ``FORMAT_NUMBER``.

    ``FORMAT_NUMBER(x, 0)`` -> ``"1,234"``; ``FORMAT_NUMBER(x, 2)`` ->
    ``"1,234.57"``. ``None`` stays ``None`` (SQL NULL propagates through
    the struct field). Deviation note: Python banker's rounding vs Spark
    HALF_UP can differ on exact .5 ties of binary doubles — documented,
    immaterial for tolerance verdicts.
    """
    if value is None:
        return None
    return f"{value:,.{decimals}f}"


def fmt_percent(ratio: float | None) -> str | None:
    """``FORMAT_STRING('%.2f%%', ratio * 100)`` equivalent; input is a ratio."""
    if ratio is None:
        return None
    return f"{ratio * 100:.2f}%"
