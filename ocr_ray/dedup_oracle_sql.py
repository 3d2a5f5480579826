"""DuckDB oracle SQL for the simhash family and fuzzy entity matching.

The engine's simhash token hash IS DuckDB's ``md5_number_upper`` (the
first 8 digest bytes little-endian — pipelines/dedup.py simhash64), so the
whole simhash family is SQL-reproducible: signature, 16-bit chunk
bucketing, bucket-capped candidate pairs, hamming verify (bit_count over
xor) and keep-first connected components as a recursive CTE.

``entity_match`` replicates functions/textnorm.py is_name_variation —
suffix strip, hamming <= 2 for equal lengths > 5, and the 7x7
OCR-confusion variant cross-equality — as generated SQL.
"""

from __future__ import annotations

_SIMHASH_CTES = """
sw AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, w, count(*) AS cnt
  FROM sw, unnest(ws) AS t(w)
  GROUP BY doc_id, w
),
bits AS (
  SELECT doc_id, b.b,
    sum(CASE WHEN (md5_number_upper(w) >> b.b) & 1 = 1
             THEN cnt ELSE -cnt END) AS acc
  FROM tok, unnest(range(0, 64)) AS b(b)
  GROUP BY doc_id, b.b
),
shv AS (
  SELECT doc_id,
    bit_or(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS v
  FROM bits GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id, coalesce(s.v, 0::UBIGINT) AS v
  FROM documents d LEFT JOIN shv s ON s.doc_id = d.doc_id
)"""


def simhash_table_sql() -> str:
    return f"""
        WITH {_SIMHASH_CTES}
        SELECT doc_id, lower(lpad(to_hex(v), 16, '0')) AS simhash FROM sh
    """


def simhash_near_dup_sql(max_hamming: int = 3, max_bucket: int = 512) -> str:
    return f"""
        WITH RECURSIVE {_SIMHASH_CTES},
        chunks AS (
          SELECT doc_id, v, c.c, (v >> (16 * c.c)) & 65535 AS chunk
          FROM sh, unnest(range(0, 4)) AS c(c)
        ),
        bsize AS (
          SELECT c, chunk, count(*) AS n, min(doc_id) AS mn
          FROM chunks GROUP BY c, chunk
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM chunks a
          JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk
                        AND a.doc_id < b.doc_id
          JOIN bsize s ON s.c = a.c AND s.chunk = a.chunk
          WHERE (s.n <= {max_bucket} OR a.doc_id = s.mn)
            AND bit_count(xor(a.v, b.v)) <= {max_hamming}
        ),
        sym AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        lab(v, l) AS (
          SELECT a, least(a, min(b)) FROM sym GROUP BY a
          UNION
          SELECT s.a, l.l FROM sym s JOIN lab l ON l.v = s.b WHERE l.l < s.a
        )
        SELECT v AS doc_id, min(l) AS dup_of FROM lab GROUP BY v
    """


_SUFFIXES = (" LLC", " INC", " CORP", " L.L.C.", " I.N.C.", " CORP.")
_CONFUSIONS = (("G", "H"), ("H", "G"), ("O", "0"), ("0", "O"),
               ("I", "1"), ("1", "I"))


def _strip_sql(col: str) -> str:
    out = col
    for s in _SUFFIXES:
        out = f"replace({out}, '{s}', '')"
    return out


def entity_match_sql() -> str:
    # derived names exactly as __ray_entry__._q_entity_match builds them
    variants_a = ["sa"] + [f"replace(sa, '{o}', '{n}')" for o, n in _CONFUSIONS]
    variants_b = ["sb"] + [f"replace(sb, '{o}', '{n}')" for o, n in _CONFUSIONS]
    cross_eq = " OR ".join(f"{va} = {vb}" for va in variants_a for vb in variants_b)
    return f"""
        WITH base AS (
          SELECT doc_id,
            regexp_replace(upper(substr(coalesce(text, ''), 1, 16)),
                           '[^A-Z]', '', 'g') AS b
          FROM documents
        ),
        names AS (
          SELECT doc_id, b || ' HOLDINGS LLC' AS name_a,
            CASE doc_id % 3
              WHEN 0 THEN replace(b || ' HOLDINGS LLC', 'O', '0')
              WHEN 1 THEN b || ' HOLDINGS INC'
              ELSE 'ZZQ ' || reverse(b) || ' GROUP'
            END AS name_b
          FROM base
        ),
        stripped AS (
          SELECT doc_id, name_a, name_b,
                 {_strip_sql('upper(name_a)')} AS sa,
                 {_strip_sql('upper(name_b)')} AS sb
          FROM names
        )
        SELECT doc_id, name_a, name_b,
          ((length(sa) = length(sb) AND length(sa) > 5
            AND len(list_filter(range(1, length(sa) + 1),
                    i -> substr(sa, i, 1) <> substr(sb, i, 1))) <= 2)
           OR (length(sa) > 8 AND length(sb) > 8 AND ({cross_eq}))
          ) AS is_variation
        FROM stripped
    """
