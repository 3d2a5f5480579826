"""H5 — deterministic postprocess patch rules after field extraction.

The reference patches predictable OCR/LLM extraction mistakes with three
deterministic rules (encova_done/llm4nano.py:221-278):

  1. building-as-construction-type move: a non-numeric ``building`` value
     ("Frame", "Non-Combustible") moves to ``construction`` and building
     becomes null;
  2. pumps/canopy fill: pumps/canopy values of null/"Included" are filled
     from the first "Class 1"/"Class 2" dollar amount found in the policy
     text (llm4nano.py:186-198);
  3. building←BPP dedup: when the policy shows NO explicit Building dollar
     line (llm4nano.py:201-218) and building equals the BPP amount, the
     building value is a copy of BPP and is nulled.

All pure functions; the Dataset operator applies them as a vectorizable
column-rewrite pass in relational.field_extraction_patched.
"""

from __future__ import annotations

import re
from typing import Optional

from ocr_ray.functions.textnorm import normalize_money

# pattern STRINGS are shared verbatim with the DuckDB oracles, so they are
# RE2-compatible (inline flags, no lookahead — RE2 has none)
CLASS_AMOUNT_PATTERNS = {
    1: r"(?is)Class\s*1[\s\S]{0,200}?\$\s*([0-9,]+)",
    2: r"(?is)Class\s*2[\s\S]{0,200}?\$\s*([0-9,]+)",
}
_CLASS_RE = {n: re.compile(p) for n, p in CLASS_AMOUNT_PATTERNS.items()}

# The reference excludes the "Building and Personal Property" FORM NAME via
# a lookahead (llm4nano.py:205-216); RE2 has no lookahead, so this
# restatement excludes it BY CONSTRUCTION: only whitespace may separate
# "Building" from its dollar amount, which the form name never satisfies.
BUILDING_LIMIT_PATTERNS = (
    r"(?im)^\s*\d+\s+\d+\s+Building\s*\$\s*[0-9,]+",       # table style
    r"(?im)^\s*Building\s*\$\s*[0-9,]+",                    # label style
    r"(?im)^\s*Building[\t ]+\$?[\t ]*[0-9][0-9,]*[\t ]*$",  # single-line
)
_BUILDING_LIMIT_RES = tuple(re.compile(p) for p in BUILDING_LIMIT_PATTERNS)


def extract_first_class_amount(policy_text: str, class_no: int) -> Optional[str]:
    """First "$ amount" within 200 chars after "Class <n>", normalized."""
    m = _CLASS_RE[class_no].search(policy_text or "")
    if not m:
        return None
    return normalize_money(m.group(1))


def has_explicit_building_limit(policy_text: str) -> bool:
    """True when the policy shows a distinct Building coverage line with a
    dollar limit (never the "Building and Personal Property" form name)."""
    t = policy_text or ""
    return any(p.search(t) for p in _BUILDING_LIMIT_RES)


def postprocess_location(loc: dict, policy_text: str) -> dict:
    """Apply the three patch rules to one location record; returns a new
    dict (never mutates the input)."""
    out = dict(loc)
    class1 = extract_first_class_amount(policy_text, 1)
    class2 = extract_first_class_amount(policy_text, 2)
    building_limit = has_explicit_building_limit(policy_text)

    # rule 1: non-numeric building value is a construction type
    bld = out.get("building")
    if isinstance(bld, str) and normalize_money(bld) is None and bld.strip():
        if out.get("construction") in (None, ""):
            out["construction"] = bld.strip()
        out["building"] = None

    # rule 2: pumps/canopy must be numeric — fill from Class 1/2 amounts
    if normalize_money(out.get("pumps")) in (None, "Included") and class1:
        out["pumps"] = class1
    if normalize_money(out.get("canopy")) in (None, "Included") and class2:
        out["canopy"] = class2

    # rule 3: building must not mirror BPP when no explicit Building line
    if not building_limit:
        bpp_n = normalize_money(out.get("business_personal_property"))
        bld_n = normalize_money(out.get("building"))
        if bpp_n and bld_n and bpp_n == bld_n:
            out["building"] = None

    return out
