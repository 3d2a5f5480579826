"""Validation-operator queries (G4 / H5 / C5-C10) over derived records.

Each query derives deterministic certificate/policy structures from the
``documents`` table (the derived-column trick: testdata carries no
insurance fields, so the inputs are pure functions of doc_id — identical
in the Ray code and in the SQL oracle builders below), then runs the REAL
operator machinery: nested-path resolution (functions.qc_fields),
postprocess patch rules (functions.patch), family compare table
(functions.family_rules).

Every query has a `<name>_sql()` twin here that builds the DuckDB oracle
string; __ray_entry__ wires both.  Output columns coalesce nulls to ''
(oracle-parity rule: no nullable strings cross the hash compare).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from ocr_ray.functions.qc_fields import FIELD_CHECKS, qc_field_compare

# ---------------------------------------------------------------------------
# G4 — qc_field_compare
# ---------------------------------------------------------------------------

# value archetypes by (doc_id*31 + check_index) % 7
_ARCH_VALUES = (
    ("$1,320,000", "1,320,000"),      # 0: formatting-insensitive MATCH
    ("$250,000", "$300,000"),         # 1: MISMATCH
    (None, "$500"),                   # 2: cert-side null
    ("$500", None),                   # 3: policy-side null
    (None, None),                     # 4: both null (always skipped)
    ("Included", "Included"),         # 5: Included MATCH
    ("Inside $10,000 / Outside $10,000",
     "Inside $10,000 / Outside $10,000"),  # 6: passthrough MATCH
)


def _build_nested(doc_id: int) -> tuple[dict, dict, str]:
    """→ (certificate, policy, null_policy) for one doc — real nested
    dicts so resolve_path exercises dict walks AND the list index."""
    has_locations = doc_id % 5 != 0
    cert: dict = {}
    pol: dict = {}

    def insert(root: dict, path: tuple[str, ...], value) -> None:
        cur = root
        for i, seg in enumerate(path[:-1]):
            if seg.isdigit():
                # list segment: ensure enough elements
                idx = int(seg)
                assert isinstance(cur, list)
                while len(cur) <= idx:
                    cur.append({})
                cur = cur[idx]
            else:
                nxt_is_idx = path[i + 1].isdigit()
                if seg not in cur or cur[seg] is None:
                    cur[seg] = [] if nxt_is_idx else {}
                cur = cur[seg]
        cur[path[-1]] = value

    for ci, (field, cpath, ppath) in enumerate(FIELD_CHECKS):
        cv, pv = _ARCH_VALUES[(doc_id * 31 + ci) % len(_ARCH_VALUES)]
        if "locations" in cpath and not has_locations:
            continue  # the certificate simply has no location records
        if cv is not None:
            insert(cert, cpath, cv)
        if pv is not None:
            insert(pol, ppath, pv)
    if not has_locations:
        cert.setdefault("property", {})["locations"] = []
    return cert, pol, ("skip" if doc_id % 2 == 0 else "mismatch")


def qc_field_compare_query(sf_dir: str):
    """G4 query: one row per CHECKED (doc, field) with normalized values
    and MATCH/MISMATCH verdict; both null policies exercised (even doc_id
    → encova null-skip, odd → hartford null-mismatch)."""

    def f(t: pa.Table) -> pa.Table:
        ids, fields, cns, pns, verdicts, policies = [], [], [], [], [], []
        for did in t["doc_id"].to_pylist():
            cert, pol, np_ = _build_nested(did)
            for row in qc_field_compare(cert, pol, null_policy=np_):
                ids.append(did)
                fields.append(row["field"])
                cns.append(row["cert_norm"] or "")
                pns.append(row["policy_norm"] or "")
                verdicts.append(row["verdict"])
                policies.append(np_)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "field": pa.array(fields, pa.string()),
            "cert_norm": pa.array(cns, pa.string()),
            "policy_norm": pa.array(pns, pa.string()),
            "null_policy": pa.array(policies, pa.string()),
            "verdict": pa.array(verdicts, pa.string()),
        })

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(f, batch_format="pyarrow")


_NORM_SQL = """
    CASE
      WHEN {v} IS NULL OR trim({v}) = '' THEN NULL
      WHEN lower(trim({v})) = 'included' THEN 'Included'
      WHEN right(trim({v}), 1) = '%' THEN trim({v})
      WHEN lower(trim({v})) LIKE '%inside%' OR lower(trim({v})) LIKE '%outside%' THEN trim({v})
      ELSE nullif(regexp_replace(trim({v}), '[^0-9]', '', 'g'), '')
    END
"""


def qc_field_compare_sql() -> str:
    checks_rows = ", ".join(
        f"({ci}, '{field}', {str('locations' in cpath).upper()})"
        for ci, (field, cpath, _p) in enumerate(FIELD_CHECKS)
    )
    arch_rows = ", ".join(
        "({}, {}, {})".format(
            i,
            "NULL" if cv is None else f"'{cv}'",
            "NULL" if pv is None else f"'{pv}'",
        )
        for i, (cv, pv) in enumerate(_ARCH_VALUES)
    )
    cn = _NORM_SQL.format(v="a.cert_raw")
    pn = _NORM_SQL.format(v="a.pol_raw")
    return f"""
        WITH checks(ci, field, is_loc) AS (VALUES {checks_rows}),
        arch(ai, cert_raw, pol_raw) AS (VALUES {arch_rows}),
        base AS (
          SELECT d.doc_id, c.field, c.is_loc,
                 (d.doc_id % 2 = 0) AS null_skip,
                 (d.doc_id % 5 <> 0) AS has_loc,
                 a.cert_raw, a.pol_raw
          FROM documents d
          CROSS JOIN checks c
          JOIN arch a ON a.ai = (d.doc_id * 31 + c.ci) % {len(_ARCH_VALUES)}
        )
        SELECT doc_id, field,
               coalesce({cn}, '') AS cert_norm,
               coalesce({pn}, '') AS policy_norm,
               CASE WHEN null_skip THEN 'skip' ELSE 'mismatch' END AS null_policy,
               CASE
                 WHEN a.cert_raw IS NULL OR a.pol_raw IS NULL THEN 'MISMATCH'
                 WHEN {cn} IS NOT DISTINCT FROM {pn} THEN 'MATCH'
                 ELSE 'MISMATCH'
               END AS verdict
        FROM base a
        WHERE NOT (is_loc AND NOT has_loc)
          AND NOT (cert_raw IS NULL AND pol_raw IS NULL)
          AND NOT (null_skip AND (cert_raw IS NULL OR pol_raw IS NULL))
    """


# ---------------------------------------------------------------------------
# H5 — field_extraction_patched
# ---------------------------------------------------------------------------

_POLICY_SUFFIXES = (
    "\nClass 1 Pumps $ 12,500\nClass 2 Canopy $ 7,800\nBuilding $ 425,000",
    "\nClass 1 Pumps $ 12,500\nClass 2 Canopy $ 7,800",
    "\nBuilding and Personal Property Coverage Form $ 999,999",
    "",
)

_LOC_POOL = (
    {"building": "Frame", "construction": None, "pumps": None,
     "canopy": "Included", "business_personal_property": "$350,000"},
    {"building": "$350,000", "construction": None, "pumps": "Included",
     "canopy": None, "business_personal_property": "350,000"},
    {"building": "$425,000", "construction": None, "pumps": "$5,000",
     "canopy": "$6,000", "business_personal_property": "$100,000"},
    {"building": "", "construction": None, "pumps": None,
     "canopy": None, "business_personal_property": None},
    {"building": "Non-Combustible", "construction": "Masonry",
     "pumps": "Included", "canopy": "Included",
     "business_personal_property": "$200,000"},
)

_LOC_FIELDS = ("building", "construction", "pumps", "canopy",
               "business_personal_property")


def field_extraction_patched_query(sf_dir: str):
    """H5 query: derived location records patched by the three
    deterministic rules; emits before→after columns per doc."""
    from ocr_ray.functions.patch import postprocess_location

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        cols: dict[str, list] = {k: [] for k in _LOC_FIELDS}
        raw_building: list[str] = []
        for did, txt in zip(ids, texts):
            loc = dict(_LOC_POOL[did % len(_LOC_POOL)])
            ptext = (txt or "") + _POLICY_SUFFIXES[did % len(_POLICY_SUFFIXES)]
            patched = postprocess_location(loc, ptext)
            raw_building.append(loc["building"] or "")
            for k in _LOC_FIELDS:
                cols[k].append(patched.get(k) or "")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "building_before": pa.array(raw_building, pa.string()),
            **{k: pa.array(v, pa.string()) for k, v in cols.items()},
        })

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")


def field_extraction_patched_sql() -> str:
    from ocr_ray.functions.patch import (BUILDING_LIMIT_PATTERNS,
                                         CLASS_AMOUNT_PATTERNS)

    loc_rows = ", ".join(
        "({}, {})".format(
            i,
            ", ".join("NULL" if loc[k] is None else f"'{loc[k]}'"
                      for k in _LOC_FIELDS),
        )
        for i, loc in enumerate(_LOC_POOL)
    )
    sfx_rows = ", ".join(
        "({}, {})".format(i, "'" + s.replace("\n", "' || chr(10) || '") + "'")
        for i, s in enumerate(_POLICY_SUFFIXES)
    )
    bl = " OR ".join(
        f"regexp_matches(ptext, '{p}')" for p in BUILDING_LIMIT_PATTERNS
    )
    c1 = CLASS_AMOUNT_PATTERNS[1]
    c2 = CLASS_AMOUNT_PATTERNS[2]
    norm_b = _NORM_SQL.format(v="l.building")
    return f"""
        WITH locs(li, building, construction, pumps, canopy, bpp) AS (VALUES {loc_rows}),
        sfx(si, suffix) AS (VALUES {sfx_rows}),
        base AS (
          SELECT d.doc_id, l.*, coalesce(d.text, '') || s.suffix AS ptext
          FROM documents d
          JOIN locs l ON l.li = d.doc_id % {len(_LOC_POOL)}
          JOIN sfx s ON s.si = d.doc_id % {len(_POLICY_SUFFIXES)}
        ),
        derived AS (
          SELECT *,
            nullif(regexp_replace(coalesce(
              nullif(regexp_extract(ptext, '{c1}', 1), ''), ''),
              '[^0-9]', '', 'g'), '') AS class1,
            nullif(regexp_replace(coalesce(
              nullif(regexp_extract(ptext, '{c2}', 1), ''), ''),
              '[^0-9]', '', 'g'), '') AS class2,
            ({bl}) AS has_bl,
            {norm_b} AS b_norm
          FROM base l
        ),
        rule1 AS (
          SELECT *,
            CASE WHEN building IS NOT NULL AND trim(building) <> ''
                      AND b_norm IS NULL
                 THEN NULL ELSE building END AS building1,
            CASE WHEN building IS NOT NULL AND trim(building) <> ''
                      AND b_norm IS NULL
                      AND (construction IS NULL OR construction = '')
                 THEN trim(building) ELSE construction END AS construction1
          FROM derived
        ),
        rule2 AS (
          SELECT *,
            CASE WHEN ({_NORM_SQL.format(v="pumps")} IS NULL
                       OR {_NORM_SQL.format(v="pumps")} = 'Included')
                      AND class1 IS NOT NULL
                 THEN class1 ELSE pumps END AS pumps2,
            CASE WHEN ({_NORM_SQL.format(v="canopy")} IS NULL
                       OR {_NORM_SQL.format(v="canopy")} = 'Included')
                      AND class2 IS NOT NULL
                 THEN class2 ELSE canopy END AS canopy2
          FROM rule1
        ),
        rule3 AS (
          SELECT *,
            CASE WHEN NOT has_bl
                      AND {_NORM_SQL.format(v="bpp")} IS NOT NULL
                      AND {_NORM_SQL.format(v="building1")} IS NOT NULL
                      AND {_NORM_SQL.format(v="bpp")} = {_NORM_SQL.format(v="building1")}
                 THEN NULL ELSE building1 END AS building3
          FROM rule2
        )
        SELECT doc_id,
               coalesce(building, '') AS building_before,
               coalesce(building3, '') AS building,
               coalesce(construction1, '') AS construction,
               coalesce(pumps2, '') AS pumps,
               coalesce(canopy2, '') AS canopy,
               coalesce(bpp, '') AS business_personal_property
        FROM rule3
    """


# ---------------------------------------------------------------------------
# C5-C10 — qc_family_verdicts
# ---------------------------------------------------------------------------

_FAMILY_CASES = (
    ("$1,320,000", "1,320,000"),
    ("10,000", "Inside $10,000 / Outside $10,000"),
    ("Actual Loss Sustained", "Business Income Actual Loss Sustained form applies"),
    ("Actual Loss Sustained", "limit shown $50,000 per location"),
    ("Included", "coverage is included per form CP1030"),
    ("Included", "not shown in declarations"),
    ("", "$100"),
    ("$250,000", ""),
)


def qc_family_verdicts_query(sf_dir: str):
    """C5-C10 query: family-keyed certificate↔policy verdicts over derived
    coverage rows (name from the E1 pool, values exercising every rule)."""
    from ocr_ray.functions.family_rules import family_verdict
    from ocr_ray.pipelines.relational import _COVERAGE_NAME_POOL

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        names, certs, pols, fams, verdicts = [], [], [], [], []
        for did in ids:
            name = _COVERAGE_NAME_POOL[did % len(_COVERAGE_NAME_POOL)]
            cv, pv = _FAMILY_CASES[(did * 13) % len(_FAMILY_CASES)]
            fam, verdict = family_verdict(name, cv, pv)
            names.append(name)
            certs.append(cv)
            pols.append(pv)
            fams.append(fam)
            verdicts.append(verdict)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "coverage_name": pa.array(names, pa.string()),
            "cert_value": pa.array(certs, pa.string()),
            "policy_value": pa.array(pols, pa.string()),
            "family": pa.array(fams, pa.string()),
            "verdict": pa.array(verdicts, pa.string()),
        })

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(f, batch_format="pyarrow")


def qc_family_verdicts_sql() -> str:
    from ocr_ray.functions.classify import classify_case_sql
    from ocr_ray.pipelines.relational import _COVERAGE_NAME_POOL

    name_arms = " ".join(
        f"WHEN {i} THEN '{n}'" for i, n in enumerate(_COVERAGE_NAME_POOL)
    )
    case_rows = ", ".join(
        f"({i}, '{cv}', '{pv}')" for i, (cv, pv) in enumerate(_FAMILY_CASES)
    )
    cn = _NORM_SQL.format(v="cert_value")
    pn = _NORM_SQL.format(v="policy_value")
    als = r"(?i)actual\s+loss\s+sustained|\bA\.?L\.?S\.?\b"
    return f"""
        WITH cases(ai, cert_value, policy_value) AS (VALUES {case_rows}),
        s AS (
          SELECT d.doc_id,
                 CASE d.doc_id % {len(_COVERAGE_NAME_POOL)} {name_arms} END AS coverage_name,
                 c.cert_value, c.policy_value
          FROM documents d
          JOIN cases c ON c.ai = (d.doc_id * 13) % {len(_FAMILY_CASES)}
        ),
        n AS (
          SELECT *, lower(trim(coverage_name)) AS nm,
                 {cn} AS cert_n, {pn} AS pol_n,
                 regexp_matches(cert_value, '{als}') AS cert_als,
                 regexp_matches(policy_value, '{als}') AS pol_als,
                 nullif(regexp_replace(coalesce(nullif(regexp_extract(
                   policy_value, '(?i)inside\\s*\\$?\\s*([0-9,]+)', 1), ''), ''),
                   '[^0-9]', '', 'g'), '') AS inside_n,
                 nullif(regexp_replace(coalesce(nullif(regexp_extract(
                   policy_value, '(?i)outside\\s*\\$?\\s*([0-9,]+)', 1), ''), ''),
                   '[^0-9]', '', 'g'), '') AS outside_n
          FROM s
        ),
        fam AS (
          SELECT *, {classify_case_sql('nm')} AS family FROM n
        )
        SELECT doc_id, coverage_name, cert_value, policy_value, family,
          CASE
            WHEN policy_value IS NULL OR trim(policy_value) = '' THEN 'NOT_FOUND'
            WHEN cert_value IS NULL OR trim(cert_value) = '' THEN 'NOT_FOUND'
            WHEN family = 'business_income' AND cert_als AND pol_als THEN 'MATCH'
            WHEN family = 'business_income' AND cert_als
                 AND regexp_matches(policy_value, '\\$?\\s*[0-9][0-9,]*') THEN 'MISMATCH'
            WHEN family = 'business_income' AND cert_als THEN 'MATCH'
            WHEN family = 'business_income' AND pol_als THEN 'MISMATCH'
            WHEN family = 'money_securities'
                 AND (inside_n IS NOT NULL OR outside_n IS NOT NULL)
                 AND cert_n IS NOT NULL AND cert_n <> 'Included'
            THEN CASE WHEN coalesce(inside_n, cert_n) = cert_n
                       AND coalesce(outside_n, cert_n) = cert_n
                      THEN 'MATCH' ELSE 'MISMATCH' END
            WHEN cert_n = 'Included'
            THEN CASE WHEN regexp_matches(policy_value, '(?i)\\bincluded\\b|\\bcovered\\b')
                           OR regexp_matches(coalesce(pol_n, ''), '^[0-9]+$')
                      THEN 'MATCH' ELSE 'MISMATCH' END
            WHEN cert_n IS NOT DISTINCT FROM pol_n THEN 'MATCH'
            ELSE 'MISMATCH'
          END AS verdict
        FROM fam
    """
