"""Name classifiers — substring include/exclude rule tables (SURVEY.md §2 E1).

The reference classifies coverage names into families with include/exclude
substring predicates, e.g. building-but-not-pumps-canopy
(llm_pl_pol_cov.py:49-55), BPP-but-not-extension (llm_pl_pol_cov.py:73-99),
Money&Securities (llm_pl_pol_cov.py:104-121 with counterfeit/forgery
exclusions per the crime-extensions variant).  Here the rules are DATA — a
tuple of (family, include-predicates, exclude-predicates) evaluated in
order, first match wins — instead of 700 lines of per-family functions.

Predicates: ('contains', x) | ('equals', x) | ('prefix', x) |
('suffix', x) | ('contains_all', (x, y, ...)).  All matching is on the
lowercased stripped name; every predicate type maps 1:1 to a SQL LIKE /
equality clause so the classifier is oracle-verifiable.
"""

from __future__ import annotations

FAMILY_RULES: tuple[tuple[str, tuple, tuple], ...] = (
    (
        "building",
        (("contains", "building"),),
        # combined pumps+canopy labels are handled by their own validation
        (("contains_all", ("pump", "canopy")),),
    ),
    (
        "bpp",
        (
            ("contains", "business personal property"),
            ("equals", "bpp"),
            ("prefix", "bpp "),
            ("suffix", " bpp"),
        ),
        tuple(
            ("contains", kw)
            for kw in (
                "off premises", "off-premises", "away from premises",
                "in transit", "transit", "portable storage", "temporarily",
                "newly acquired", "newly constructed", "coverage extension",
                "extension",
            )
        ),
    ),
    (
        "money_securities",
        (("contains_all", ("money", "secur")),),
        (("contains", "counterfeit"), ("contains", "forgery")),
    ),
    (
        "business_income",
        (("contains", "business income"), ("contains", "loss of income")),
        (),
    ),
)


def _pred(n: str, p: tuple) -> bool:
    kind, val = p
    if kind == "contains":
        return val in n
    if kind == "equals":
        return n == val
    if kind == "prefix":
        return n.startswith(val)
    if kind == "suffix":
        return n.endswith(val)
    if kind == "contains_all":
        return all(v in n for v in val)
    raise ValueError(kind)


def classify_name(name: str) -> str:
    """First-match family of a coverage-ish name, or 'other'."""
    n = (name or "").strip().lower()
    for family, includes, excludes in FAMILY_RULES:
        if any(_pred(n, p) for p in includes) and not any(
            _pred(n, p) for p in excludes
        ):
            return family
    return "other"


def _pred_sql(col: str, p: tuple) -> str:
    kind, val = p
    if kind == "contains":
        return f"{col} LIKE '%{val}%'"
    if kind == "equals":
        return f"{col} = '{val}'"
    if kind == "prefix":
        return f"{col} LIKE '{val}%'"
    if kind == "suffix":
        return f"{col} LIKE '%{val}'"
    if kind == "contains_all":
        return "(" + " AND ".join(f"{col} LIKE '%{v}%'" for v in val) + ")"
    raise ValueError(kind)


def classify_case_sql(col: str) -> str:
    """The rule table rendered as a SQL CASE over ``col`` (lowercased,
    trimmed) — byte-for-byte the same semantics as classify_name."""
    arms = []
    for family, includes, excludes in FAMILY_RULES:
        inc = " OR ".join(_pred_sql(col, p) for p in includes)
        cond = f"({inc})"
        if excludes:
            exc = " OR ".join(_pred_sql(col, p) for p in excludes)
            cond += f" AND NOT ({exc})"
        arms.append(f"WHEN {cond} THEN '{family}'")
    return "CASE " + " ".join(arms) + " ELSE 'other' END"
