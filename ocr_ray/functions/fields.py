"""Structured-field extraction — typed columns from free text.

The Ray-Data restatement of the reference's deterministic regex field
extractor (qc_head.py:612-1131, SURVEY.md §2 B7: ~60 field patterns
producing policy numbers, dates, money tables, contact fields).  For the
web corpus the field set is the web-scale analogue: first/max dollar
amount, emails, phones, ISO/US dates, outbound urls, checkbox marks —
each a single vectorized RE2 projection (``pc.extract_regex`` /
``count_substring_regex``), every pattern mirrored verbatim in the DuckDB
oracle.

Empty-value cleanup (E8, qc_head.py:844-854): empty extractions become
NULL, "$"/"$0.00" normalize to "$0".
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# patterns shared verbatim with the SQL oracle (RE2 both sides)
FIRST_DOLLAR_RE = r"\$\s*[0-9][0-9,]*(?:\.[0-9]{2})?"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
DATE_US_RE = r"[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}"
DATE_ISO_RE = r"[0-9]{4}-[0-9]{2}-[0-9]{2}"
URL_RE = r"https?://[^\s<>\"]+"
CHECKBOX_RE = r"\[[Xx✓√]\]"   # checkbox parse (cf. qc_head.py:834-841)


def _first_match(text, pattern: str):
    """First match of pattern, or NULL (extract_regex needs a named group)."""
    ex = pc.extract_regex(text, r"(?P<m>%s)" % pattern)
    return pc.struct_field(ex, "m")


def extract_fields(batch: pa.Table, text_col: str = "text",
                   key_col: str = "doc_id") -> pa.Table:
    """Vectorized typed projections over the text column."""
    text = pc.coalesce(batch[text_col], pa.scalar(""))
    first_dollar = _first_match(text, FIRST_DOLLAR_RE)
    # E8 cleanup: '$' / '$0.00' / '$ 0' → '$0'
    digits = pc.replace_substring_regex(
        pc.coalesce(first_dollar, pa.scalar("")), r"[^0-9]", "")
    zeroish = pc.replace_substring_regex(digits, r"0", "")
    first_dollar = pc.if_else(
        pc.and_(pc.is_valid(first_dollar), pc.equal(zeroish, "")),
        pa.scalar("$0"),
        first_dollar,
    )
    return pa.table(
        {
            key_col: batch[key_col],
            "first_dollar": first_dollar,
            "first_email": _first_match(text, EMAIL_RE),
            "first_phone": _first_match(text, PHONE_RE),
            "first_date_us": _first_match(text, DATE_US_RE),
            "first_date_iso": _first_match(text, DATE_ISO_RE),
            "first_url": _first_match(text, URL_RE),
            "n_dollars": pc.cast(pc.count_substring_regex(text, FIRST_DOLLAR_RE), pa.int64()),
            "n_emails": pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64()),
            "n_checkboxes": pc.cast(pc.count_substring_regex(text, CHECKBOX_RE), pa.int64()),
        }
    )
