"""G4 — nested-path certificate↔policy QC field compare.

The reference validates extracted certificate JSON against policy JSON on
a fixed table of dotted field paths (with numeric list indices for the
first property location), money-normalized equality, and two null
policies (encova_done/llm4nano.py:78-183 vs hartford_done/llm4nano.py:
78-200):

  * ``null-skip``       (encova):   skip a check when EITHER side is null
  * ``null-mismatch``   (hartford): one-sided null IS a mismatch; only
                                    both-null checks are skipped

Checks whose certificate path touches ``locations`` are dropped when the
certificate has no locations list (llm4nano.py:146-151).
"""

from __future__ import annotations

from typing import Any, Optional

from ocr_ray.functions.textnorm import normalize_money

# (field, cert_path, policy_path) — the 16-check table; "0" segments index
# lists (llm4nano.py:93-143, union of the encova and hartford variants)
FIELD_CHECKS: tuple[tuple[str, tuple[str, ...], tuple[str, ...]], ...] = (
    ("property.policy_number",
     ("property", "policy_number"), ("property", "policy_number")),
    ("property.effective_date",
     ("property", "effective_date"),
     ("property", "policy_period", "effective_date")),
    ("property.expiration_date",
     ("property", "expiration_date"),
     ("property", "policy_period", "expiration_date")),
    ("gl.policy_number",
     ("general_liability", "policy_number"),
     ("general_liability", "policy_number")),
    ("gl.effective_date",
     ("general_liability", "effective_date"),
     ("general_liability", "policy_period", "effective_date")),
    ("gl.expiration_date",
     ("general_liability", "expiration_date"),
     ("general_liability", "policy_period", "expiration_date")),
    ("gl.limits.each_occurrence",
     ("general_liability", "limits", "each_occurrence"),
     ("general_liability", "limits", "each_occurrence")),
    ("gl.limits.general_aggregate",
     ("general_liability", "limits", "general_aggregate"),
     ("general_liability", "limits", "general_aggregate")),
    ("gl.limits.products_completed_operations_aggregate",
     ("general_liability", "limits", "products_completed_operations_aggregate"),
     ("general_liability", "limits", "products_completed_operations_aggregate")),
    ("gl.limits.personal_advertising_injury",
     ("general_liability", "limits", "personal_advertising_injury"),
     ("general_liability", "limits", "personal_advertising_injury")),
    ("gl.limits.damage_to_rented_premises",
     ("general_liability", "limits", "damage_to_rented_premises"),
     ("general_liability", "limits", "damage_to_rented_premises")),
    ("gl.limits.medical_expense",
     ("general_liability", "limits", "medical_expense"),
     ("general_liability", "limits", "medical_expense")),
    ("property.locations[0].business_personal_property",
     ("property", "locations", "0", "business_personal_property"),
     ("property", "locations", "0", "business_personal_property")),
    ("policy.property.outdoor_signs_limit",
     ("property", "locations", "0", "outdoor_signs"),
     ("property", "outdoor_signs_limit")),
    ("policy.property.windstorm_or_hail",
     ("property", "locations", "0", "windstorm_or_hail"),
     ("property", "windstorm_or_hail")),
    ("policy.property.theft_sublimit",
     ("property", "locations", "0", "theft_sublimit"),
     ("property", "theft_sublimit")),
)


def resolve_path(root: Any, path: tuple[str, ...]) -> Any:
    """Dotted-path resolve with numeric segments indexing lists
    (llm4nano.py:115-143); missing/mistyped segments → None."""
    cur = root
    for k in path:
        if k.isdigit():
            if not isinstance(cur, list):
                return None
            idx = int(k)
            if idx >= len(cur):
                return None
            cur = cur[idx]
        else:
            if not isinstance(cur, dict):
                return None
            cur = cur.get(k)
    return cur


def qc_field_compare(certificate: dict, policy: dict,
                     null_policy: str = "skip") -> list[dict]:
    """Run every applicable field check; returns one row per CHECKED field:
    ``{"field", "cert_norm", "policy_norm", "verdict"}``.

    ``null_policy``: "skip" (encova — either-side null skips the check) or
    "mismatch" (hartford — one-sided null is a MISMATCH; both-null skips).
    """
    checks = list(FIELD_CHECKS)
    cert_prop = certificate.get("property", {}) if isinstance(certificate, dict) else {}
    locs = cert_prop.get("locations") if isinstance(cert_prop, dict) else None
    if not isinstance(locs, list) or len(locs) == 0:
        checks = [c for c in checks if "locations" not in c[1]]

    rows: list[dict] = []
    for field, cpath, ppath in checks:
        cv = resolve_path(certificate, cpath)
        pv = resolve_path(policy, ppath)
        if cv is None and pv is None:
            continue
        if cv is None or pv is None:
            if null_policy == "skip":
                continue
            rows.append({
                "field": field,
                "cert_norm": normalize_money(cv),
                "policy_norm": normalize_money(pv),
                "verdict": "MISMATCH",
            })
            continue
        cn, pn = normalize_money(cv), normalize_money(pv)
        rows.append({
            "field": field,
            "cert_norm": cn,
            "policy_norm": pn,
            "verdict": "MATCH" if cn == pn else "MISMATCH",
        })
    return rows


def qc_status(rows: list[dict]) -> str:
    """pass / needs_review roll-up (llm4nano.py:184-186)."""
    return "pass" if all(r["verdict"] == "MATCH" for r in rows) else "needs_review"
