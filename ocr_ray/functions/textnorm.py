"""Normalization / matching utilities (SURVEY.md §2 E4-E8, H3, D5).

Pure functions, deterministic, reference-pinned semantics:

* money normalization      encova_done/llm4nano.py:45-71
* name normalization       llm_pl_pol_cov.py:401-407
* fuzzy entity-name match  pl_cov_additional_interests.py:118-157
* keyword extraction       coverage_filter.py:12-55
* interval buffer+merge    policy_filter.py:154-178
* requested↔results match  llm_pl_pol_cov.py:409-446
"""

from __future__ import annotations

import re
from typing import Any, Optional

import pyarrow as pa
import pyarrow.compute as pc

_STOP_WORDS = frozenset(
    {
        "and", "or", "the", "of", "&", "#", "a", "an", "in", "on", "at",
        "to", "for", "with", "by", "from", "as", "is", "was", "are", "be",
    }
)
_ORDINAL_RE = re.compile(r"^\d+[a-z]*$")
_PAREN_RE = re.compile(r"\([^)]*\)")
_NON_WORD_RE = re.compile(r"[^\w\s]")

_ENTITY_SUFFIXES = (" LLC", " INC", " CORP", " L.L.C.", " I.N.C.", " CORP.")
_OCR_CONFUSIONS = (("G", "H"), ("H", "G"), ("O", "0"), ("0", "O"), ("I", "1"), ("1", "I"))


def normalize_money(value: Any) -> Optional[str]:
    """→ digits-only string | 'Included' | '%'-passthrough |
    inside/outside passthrough | None  (llm4nano.py:45-71)."""
    if value is None:
        return None
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, (int, float)):
        return str(int(value))
    if not isinstance(value, str):
        return None
    v = value.strip()
    if not v:
        return None
    if v.lower() == "included":
        return "Included"
    if v.endswith("%"):
        return v
    lv = v.lower()
    if "inside" in lv or "outside" in lv:
        return v
    digits = "".join(ch for ch in v if ch.isdigit())
    return digits or None


def money_equal(a: Any, b: Any) -> bool:
    """Formatting-insensitive money compare (llm4nano.py:74-75)."""
    return normalize_money(a) == normalize_money(b)


def normalize_money_array(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Vectorized ``normalize_money`` over a string column.

    Mirrors the scalar function for the common cases (digits extraction,
    'Included', '%', inside/outside passthrough); empty → null.
    """
    arr = pc.cast(arr, pa.string())
    trimmed = pc.utf8_trim_whitespace(pc.coalesce(arr, pa.scalar("")))
    lower = pc.utf8_lower(trimmed)
    digits = pc.replace_substring_regex(trimmed, r"[^0-9]", "")
    digits = pc.if_else(pc.equal(digits, ""), pa.nulls(len(trimmed), pa.string()), digits)
    out = digits
    out = pc.if_else(
        pc.or_(pc.match_substring(lower, "inside"), pc.match_substring(lower, "outside")),
        trimmed,
        out,
    )
    out = pc.if_else(pc.ends_with(trimmed, "%"), trimmed, out)
    out = pc.if_else(pc.equal(lower, "included"), pa.scalar("Included"), out)
    out = pc.if_else(pc.equal(trimmed, ""), pa.nulls(len(trimmed), pa.string()), out)
    return pc.if_else(pc.is_null(arr), pa.nulls(len(trimmed), pa.string()), out)


def normalize_name(s: Optional[str]) -> str:
    """Lowercase alnum-only fold for loose name matching
    (llm_pl_pol_cov.py:401-407)."""
    if not s:
        return ""
    return "".join(ch for ch in s.lower() if ch.isalnum())


def normalize_name_array(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Vectorized ``normalize_name``."""
    lower = pc.utf8_lower(pc.coalesce(pc.cast(arr, pa.string()), pa.scalar("")))
    return pc.replace_substring_regex(lower, r"[^\p{L}\p{N}]", "")


def is_name_variation(name1: str, name2: str) -> bool:
    """Fuzzy entity-name match: suffix strip, hamming ≤ 2 for len > 5,
    OCR-confusion variants for len > 8 (pl_cov_additional_interests.py:118-157)."""
    n1 = name1.upper()
    n2 = name2.upper()
    for suffix in _ENTITY_SUFFIXES:
        n1 = n1.replace(suffix, "")
        n2 = n2.replace(suffix, "")
    if len(n1) == len(n2):
        diff = sum(c1 != c2 for c1, c2 in zip(n1, n2))
        if diff <= 2 and len(n1) > 5:
            return True
    if len(n1) > 8 and len(n2) > 8:
        v1s = [n1] + [n1.replace(old, new) for old, new in _OCR_CONFUSIONS]
        v2s = [n2] + [n2.replace(old, new) for old, new in _OCR_CONFUSIONS]
        for v1 in v1s:
            for v2 in v2s:
                if v1 == v2:
                    return True
    return False


def extract_keywords(coverage_name: str) -> list[str]:
    """Meaningful keywords from a coverage-ish name: strip parens, stop
    words, numbers/ordinals, len<3 (coverage_filter.py:12-55)."""
    name = _PAREN_RE.sub("", coverage_name)
    clean = _NON_WORD_RE.sub(" ", name.lower())
    out: list[str] = []
    for word in clean.split():
        if word in _STOP_WORDS:
            continue
        if word.isdigit():
            continue
        if _ORDINAL_RE.match(word):
            continue
        if len(word) < 3:
            continue
        out.append(word)
    return out


def merge_page_ranges(
    pages: list[int], buffer: int, min_page: int, max_page: int
) -> list[tuple[int, int]]:
    """Add ±buffer, sort, merge overlapping/adjacent ranges
    (policy_filter.py:154-178; adjacency rule ``start <= prev_end + 1``)."""
    if not pages:
        return []
    ranges = sorted(
        (max(min_page, p - buffer), min(max_page, p + buffer)) for p in pages
    )
    merged: list[tuple[int, int]] = []
    for start, end in ranges:
        if merged and start <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], end))
        else:
            merged.append((start, end))
    return merged


def expand_neighbors(pages: list[int], radius: int, min_page: int, max_page: int,
                     max_pages: int | None = None) -> list[int]:
    """±radius set expansion then sorted cap at max_pages
    (policy_additional_interests.py:112-131)."""
    out: set[int] = set()
    for p in pages:
        for q in range(p - radius, p + radius + 1):
            if min_page <= q <= max_page:
                out.add(q)
    ordered = sorted(out)
    if max_pages is not None:
        ordered = ordered[:max_pages]
    return ordered


def filter_to_requested(
    validations: list[dict], requested: list[dict], name_field: str = "name",
    cert_name_field: str = "name",
) -> list[dict]:
    """Loose bidirectional containment match of result entries to requested
    items, with take-first-N fallback and cap (llm_pl_pol_cov.py:409-446)."""
    if not requested:
        return []
    requested_norms = [normalize_name((it or {}).get(name_field)) for it in requested]
    requested_norms = [x for x in requested_norms if x]
    if not requested_norms:
        return []
    filtered = []
    for v in validations or []:
        nm = normalize_name((v or {}).get(cert_name_field))
        if not nm:
            continue
        if any(r in nm or nm in r for r in requested_norms):
            filtered.append(v)
    if not filtered:
        return list((validations or [])[: len(requested)])
    return filtered[: len(requested)]


def block_at_position(spans: list[dict], pos: int) -> int:
    """char-pos → block index by binary search over sorted spans
    (qc_head.py:140-161 D3 analogue: position → page lookup).

    Returns the index of the span containing ``pos`` (by its start/end into
    extracted_text), or -1 when pos falls between/outside blocks.
    """
    import bisect

    if not spans:
        return -1
    starts = [s["start"] for s in spans]
    i = bisect.bisect_right(starts, pos) - 1
    if i >= 0 and spans[i]["start"] <= pos < spans[i]["end"]:
        return i
    return -1


def dedupe_preserve_order(values: list) -> list:
    """Keep-first in-list dedup (qc_head.py:962-965 J4: skip append if the
    text is already present)."""
    seen: set = set()
    out = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def levenshtein_many(a_list, b_list) -> "object":
    """Exact Levenshtein distance for MANY string pairs at once.

    The DP is vectorized ACROSS pairs: two nested loops over character
    positions (``max_len_a`` × ``max_len_b`` numpy steps, ~400 for short
    entity names), each step operating on all-pairs-length vectors — never
    a per-pair Python DP.  Pads use distinct sentinels so pad never equals
    pad.  Matches DuckDB ``levenshtein`` (unit edit costs)."""
    import numpy as np

    n = len(a_list)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    la = np.fromiter((len(s) for s in a_list), np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_list), np.int64, count=n)
    ma, mb = int(la.max()), int(lb.max())
    A = np.full((n, max(ma, 1)), -1, np.int64)
    B = np.full((n, max(mb, 1)), -2, np.int64)
    for i, s in enumerate(a_list):
        if s:
            A[i, : len(s)] = np.fromiter(map(ord, s), np.int64, count=len(s))
    for i, s in enumerate(b_list):
        if s:
            B[i, : len(s)] = np.fromiter(map(ord, s), np.int64, count=len(s))

    out[la == 0] = lb[la == 0]
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (n, 1))
    for i in range(1, ma + 1):
        cur = np.empty((n, mb + 1), dtype=np.int64)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, mb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost)
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur
    return out
