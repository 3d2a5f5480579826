"""C5-C10 — per-coverage-family validation verdict rules.

The reference encodes family-specific certificate↔policy compare semantics
(llm_pl_pol_cov.py:716-780 "STRICT" rule blocks; pl_cov_crime_extensions.
py:33-111): plain money equality is only the default — Business Income
accepts "Actual Loss Sustained", Money & Securities accepts an
Inside/Outside split matching a single certificate number, Equipment
Breakdown/"Included" matches policy inclusion language.  Round 1 had one
generic token-overlap verdict (stages/qc.py); this module is the
family-keyed compare table, driven by functions.classify.classify_name.

Verdict taxonomy (H2): MATCH / MISMATCH / NOT_FOUND.
"""

from __future__ import annotations

import re
from typing import Optional

from ocr_ray.functions.classify import classify_name
from ocr_ray.functions.textnorm import normalize_money

_ALS_RE = re.compile(r"actual\s+loss\s+sustained|\bA\.?L\.?S\.?\b", re.IGNORECASE)
_INSIDE_RE = re.compile(r"inside\s*\$?\s*([0-9,]+)", re.IGNORECASE)
_OUTSIDE_RE = re.compile(r"outside\s*\$?\s*([0-9,]+)", re.IGNORECASE)
_DOLLAR_RE = re.compile(r"\$?\s*[0-9][0-9,]*")
_INCLUDED_RE = re.compile(r"\bincluded\b|\bcovered\b", re.IGNORECASE)


def _is_als(v: Optional[str]) -> bool:
    return bool(v) and bool(_ALS_RE.search(v))


def compare_family(cert_value: Optional[str], policy_value: Optional[str],
                   family: str) -> str:
    """Family-keyed certificate↔policy compare → MATCH/MISMATCH/NOT_FOUND.

    * any family: policy side empty → NOT_FOUND; formatting differences are
      never mismatches ("$1,320,000" == "1,320,000" == "$ 1,320,000");
    * business_income: cert "Actual Loss Sustained"/"A.L.S." MATCHes a
      policy indicating ALS, MISMATCHes a concrete dollar limit
      (llm_pl_pol_cov.py:736-752);
    * money_securities: a single cert number MATCHes an Inside/Outside
      split whose key limits equal that value; the split string itself
      passes through normalize_money untouched (llm_pl_pol_cov.py:757-768,
      pl_cov_crime_extensions.py:33-70);
    * "Included" certs MATCH policy inclusion language ("included" /
      "covered") or an explicit limit (llm_pl_pol_cov.py:769-772).
    """
    if policy_value is None or (isinstance(policy_value, str) and not policy_value.strip()):
        return "NOT_FOUND"
    if cert_value is None or (isinstance(cert_value, str) and not cert_value.strip()):
        return "NOT_FOUND"

    cn = normalize_money(cert_value)
    pn = normalize_money(policy_value)

    if family == "business_income":
        if _is_als(cert_value):
            if _is_als(policy_value):
                return "MATCH"
            if _DOLLAR_RE.search(policy_value or ""):
                return "MISMATCH"
            return "MATCH"  # no stated dollar limit → ALS form applies
        if _is_als(policy_value):
            return "MISMATCH"  # cert shows a limit, policy says ALS

    if family == "money_securities":
        mi, mo = _INSIDE_RE.search(policy_value or ""), _OUTSIDE_RE.search(policy_value or "")
        if (mi or mo) and cn is not None and cn not in ("Included",):
            limits = {normalize_money(m.group(1)) for m in (mi, mo) if m}
            return "MATCH" if limits == {cn} else "MISMATCH"

    if cn == "Included":
        if _INCLUDED_RE.search(policy_value or "") or (pn and pn.isdigit()):
            return "MATCH"
        return "MISMATCH"

    return "MATCH" if cn == pn else "MISMATCH"


def family_verdict(coverage_name: str, cert_value: Optional[str],
                   policy_value: Optional[str]) -> tuple[str, str]:
    """→ (family, verdict) for one coverage row."""
    fam = classify_name(coverage_name)
    return fam, compare_family(cert_value, policy_value, fam)
