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


def _minhash_band_parts() -> str:
    """Shared WITH-clause chain deriving ``shingles`` and ``bands`` from
    the documents table: word-3-gram shingles via md5_number_lower (==
    the engine's shingle hash), the 64 seeded (a,b) permutations as a
    VALUES table with HUGEINT mod-2^64 arithmetic (== numpy uint64
    wraparound), banding via md5 of the '-'-joined decimal minhash
    values.  Shared by :func:`minhash_near_dup_sql` and
    :func:`near_dup_incremental_sql`."""
    from ocr_ray.pipelines.dedup import _A, _B, _MERSENNE

    perm_rows = ", ".join(
        f"({k}, {int(a)}, {int(b)})" for k, (a, b) in enumerate(zip(_A, _B))
    )
    p = _MERSENNE
    return f"""
        mw AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                             w -> w <> '') AS ws
          FROM documents
        ),
        grams AS (
          SELECT doc_id, g FROM (
            SELECT doc_id,
              CASE WHEN len(ws) = 0 THEN []
                   WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                   ELSE list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
              END AS gs
            FROM mw
          ), unnest(gs) AS t(g)
        ),
        shingles AS (
          SELECT DISTINCT doc_id, md5_number_lower(g) AS h FROM grams
        ),
        perm(k, a, b) AS (VALUES {perm_rows}),
        sigs AS (
          SELECT s.doc_id, p.k,
            min((((p.a::HUGEINT * s.h::HUGEINT + p.b::HUGEINT)
                  % 18446744073709551616::HUGEINT) % {p})::UBIGINT) AS v
          FROM shingles s CROSS JOIN perm p
          GROUP BY s.doc_id, p.k
        ),
        sig_full AS (  -- empty docs: all-max sentinel signature
          SELECT d.doc_id, p.k, coalesce(s.v, {p}::UBIGINT) AS v
          FROM documents d CROSS JOIN perm p
          LEFT JOIN sigs s ON s.doc_id = d.doc_id AND s.k = p.k
        ),
        bands AS (
          SELECT doc_id, k // 4 AS band_id,
            substr(md5(string_agg(CAST(v AS VARCHAR), '-' ORDER BY k)), 1, 16)
              AS band_hash
          FROM sig_full GROUP BY doc_id, k // 4
        )"""


def minhash_near_dup_sql(threshold: float = 0.8, max_bucket: int = 512) -> str:
    """Full minhash+LSH near-dup re-derivation: the shared band chain
    (:func:`_minhash_band_parts`), bucket-capped candidates, exact
    shingle-set Jaccard verify, recursive-CTE keep-first connected
    components."""
    return f"""
        WITH RECURSIVE
        {_minhash_band_parts()},
        bsize AS (
          SELECT band_id, band_hash, count(*) AS n, min(doc_id) AS mn
          FROM bands GROUP BY band_id, band_hash
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
                       AND a.doc_id < b.doc_id
          JOIN bsize s ON s.band_id = a.band_id AND s.band_hash = a.band_hash
          WHERE s.n <= {max_bucket} OR a.doc_id = s.mn
        ),
        shl AS (
          SELECT doc_id, list_sort(list(h)) AS hs FROM shingles GROUP BY doc_id
        ),
        verified AS (
          SELECT c.id_a, c.id_b FROM cand c
          LEFT JOIN shl a ON a.doc_id = c.id_a
          LEFT JOIN shl b ON b.doc_id = c.id_b
          WHERE CASE
            WHEN a.hs IS NULL AND b.hs IS NULL THEN TRUE
            WHEN a.hs IS NULL OR b.hs IS NULL THEN FALSE
            ELSE len(list_intersect(a.hs, b.hs))::DOUBLE
                 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                 >= {threshold}
          END
        ),
        sym AS (
          SELECT id_a AS a, id_b AS b FROM verified
          UNION SELECT id_b, id_a FROM verified
        ),
        lab(v, l) AS (
          SELECT a, least(a, min(b)) FROM sym GROUP BY a
          UNION
          SELECT s.a, l.l FROM sym s JOIN lab l ON l.v = s.b WHERE l.l < s.a
        )
        SELECT v AS doc_id, min(l) AS dup_of FROM lab GROUP BY v
    """


def near_dup_incremental_sql(threshold: float = 0.8,
                             max_bucket: int = 512,
                             split_mod: int = 7,
                             delete_mod: tuple[int, int] | None = None) -> str:
    """near_dup_incremental re-derived in SQL: the shared band chain,
    docs split into NEW (doc_id % split_mod = 0) and OLD (the indexed
    corpus), band-equality candidates with the degenerate-bucket cap on
    the OLD side, exact shingle-set Jaccard verify, one stats row.
    ``delete_mod=(m, r)`` additionally drops the ``doc_id % m == r``
    slice from the OLD side (the tombstoned index delete — cap stats
    re-derive over the survivors)."""
    del_pred = (f" AND NOT (doc_id % {delete_mod[0]} = {delete_mod[1]})"
                if delete_mod else "")
    return f"""
        WITH {_minhash_band_parts()},
        nb AS MATERIALIZED (
          SELECT * FROM bands WHERE doc_id % {split_mod} = 0
        ),
        ob AS MATERIALIZED (
          SELECT * FROM bands WHERE doc_id % {split_mod} <> 0{del_pred}
        ),
        osize AS (
          SELECT band_id, band_hash, count(*) AS n, min(doc_id) AS mn
          FROM ob GROUP BY band_id, band_hash
        ),
        cand AS MATERIALIZED (
          SELECT DISTINCT n.doc_id AS id_a, o.doc_id AS id_b
          FROM nb n
          JOIN ob o ON o.band_id = n.band_id AND o.band_hash = n.band_hash
          JOIN osize s ON s.band_id = n.band_id AND s.band_hash = n.band_hash
          WHERE s.n <= {max_bucket} OR o.doc_id = s.mn
        ),
        shl AS MATERIALIZED (
          SELECT doc_id, list_sort(list(h)) AS hs FROM shingles GROUP BY doc_id
        ),
        verified AS MATERIALIZED (
          SELECT c.id_a, c.id_b FROM cand c
          LEFT JOIN shl a ON a.doc_id = c.id_a
          LEFT JOIN shl b ON b.doc_id = c.id_b
          WHERE CASE
            WHEN a.hs IS NULL AND b.hs IS NULL THEN TRUE
            WHEN a.hs IS NULL OR b.hs IS NULL THEN FALSE
            ELSE len(list_intersect(a.hs, b.hs))::DOUBLE
                 / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs)))
                 >= {threshold}
          END
        )
        SELECT
          CAST((SELECT count(*) FROM documents
                WHERE doc_id % {split_mod} = 0) AS BIGINT) AS n_new,
          CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
          CAST((SELECT count(*) FROM verified) AS BIGINT) AS n_dup_pairs,
          CAST((SELECT count(DISTINCT id_a) FROM verified) AS BIGINT)
            AS n_new_flagged
    """


def dup_span_stats_sql(k: int = 8, min_count: int = 2) -> str:
    """Duplicated-span coverage re-derived in SQL: md5_number_lower over
    every space-joined word k-window (position-preserving), corpus-wide
    occurrence counts (within-doc repeats included), and token coverage
    as the distinct token positions any duplicated window touches."""
    return f"""
        WITH mw AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                             w -> w <> '') AS ws
          FROM documents
        ),
        wins AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 md5_number_lower(array_to_string(ws[i.i:i.i + {k - 1}], ' ')) AS h
          FROM mw, unnest(range(1, len(ws) - {k} + 2)) AS i(i)
        ),
        hd AS MATERIALIZED (
          SELECT h FROM wins GROUP BY h HAVING count(*) >= {min_count}
        ),
        cov AS (
          SELECT DISTINCT w.doc_id, j.j
          FROM wins w JOIN hd ON hd.h = w.h,
               unnest(range(w.i, w.i + {k})) AS j(j)
        )
        SELECT m.doc_id,
               CAST(len(m.ws) AS BIGINT) AS n_tokens,
               coalesce(nw.n, 0) AS n_dup_windows,
               coalesce(cv.n, 0) AS n_covered_tokens
        FROM mw m
        LEFT JOIN (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n
                   FROM wins w JOIN hd ON hd.h = w.h
                   GROUP BY w.doc_id) nw ON nw.doc_id = m.doc_id
        LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                   FROM cov GROUP BY doc_id) cv ON cv.doc_id = m.doc_id
    """


def dup_span_filter_stats_sql(k: int = 8, min_count: int = 2) -> str:
    """Per-lang retention rollup of dup_span_stats: docs, total tokens,
    covered tokens and kept (= total - covered) tokens."""
    return f"""
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(s.n_covered_tokens) AS BIGINT) AS n_covered_tokens,
               CAST(sum(s.n_tokens - s.n_covered_tokens) AS BIGINT)
                 AS n_kept_tokens
        FROM ({dup_span_stats_sql(k, min_count)}) s
        JOIN documents d ON d.doc_id = s.doc_id
        GROUP BY d.lang
    """


def near_dup_filter_stats_sql(threshold: float = 0.8,
                              max_bucket: int = 512) -> str:
    """Survivor-corpus stats after fuzzy (minhash) dedup: the full
    minhash_near_dup_sql labeling as a derived table, keep docs that are
    unclustered or their cluster's min-id representative, then per-lang
    doc count + char sum.  SUM(BIGINT) is HUGEINT in DuckDB — cast back."""
    return f"""
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
        FROM documents d
        LEFT JOIN ({minhash_near_dup_sql(threshold, max_bucket)}) l
               ON l.doc_id = d.doc_id
        WHERE l.doc_id IS NULL OR l.dup_of = d.doc_id
        GROUP BY d.lang
    """


def ngram_jaccard_sql(threshold_pct: int = 80, max_postings: int = 256) -> str:
    """Exact n-gram Jaccard pairs re-derived in SQL: the same word-3-gram
    md5_number_lower shingles as the minhash oracle, doc-frequency capped
    inverted-index pair counting (df BETWEEN 2 AND max_postings — the
    engine's boilerplate-shingle drop), and the float-free integer
    cross-multiplication threshold shared*100 >= pct*(n_a+n_b-shared)."""
    return f"""
        WITH mw AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                             w -> w <> '') AS ws
          FROM documents
        ),
        grams AS (
          SELECT doc_id, g FROM (
            SELECT doc_id,
              CASE WHEN len(ws) = 0 THEN []
                   WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                   ELSE list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
              END AS gs
            FROM mw
          ), unnest(gs) AS t(g)
        ),
        shingles AS MATERIALIZED (
          SELECT DISTINCT doc_id, md5_number_lower(g) AS h FROM grams
        ),
        sz AS (
          SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
        ),
        df AS (
          SELECT h, count(*) AS c FROM shingles GROUP BY h
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
          FROM shingles a
          JOIN shingles b ON a.h = b.h AND a.doc_id < b.doc_id
          JOIN df ON df.h = a.h
          WHERE df.c BETWEEN 2 AND {max_postings}
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.id_a, p.id_b, p.shared, sa.n AS n_a, sb.n AS n_b
        FROM pairs p
        JOIN sz sa ON sa.doc_id = p.id_a
        JOIN sz sb ON sb.doc_id = p.id_b
        WHERE p.shared * 100 >= {threshold_pct} * (sa.n + sb.n - p.shared)
    """


def winnow_near_dup_sql(k: int = 16, window: int = 4, min_shared: int = 8,
                        max_fp_docs: int = 256) -> str:
    """Winnowing fingerprint near-copy pairs re-derived in SQL: the
    Rabin-Karp k-gram hash is computed directly per window position
    (sum of codepoint * 257^(k-1-j) mod 2^61-1 — exact integer math,
    identical to the engine's prefix-recurrence), window-4 sliding minima
    via a frame window function, dedup per doc, inverted-index pair
    counting with the degenerate-fingerprint drop and min_shared filter."""
    p = (1 << 61) - 1
    expr = " + ".join(
        f"unicode(substr(t, i.i + {j + 1}, 1))::HUGEINT * {pow(257, k - 1 - j, p)}"
        for j in range(k)
    )
    return f"""
        WITH dt AS (
          SELECT doc_id, lower(coalesce(text, '')) AS t,
                 length(coalesce(text, '')) AS n
          FROM documents
        ),
        wins AS (
          SELECT doc_id, i.i AS i, (({expr}) % {p})::UBIGINT AS h
          FROM dt, unnest(range(0, greatest(n - {k} + 1, 0))) AS i(i)
        ),
        stats AS (
          SELECT doc_id, count(*) AS nh FROM wins GROUP BY doc_id
        ),
        mins AS (
          SELECT w.doc_id, w.i,
            min(w.h) OVER (PARTITION BY w.doc_id ORDER BY w.i
                           ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m,
            s.nh
          FROM wins w JOIN stats s ON s.doc_id = w.doc_id
        ),
        fps AS (
          SELECT DISTINCT doc_id, m AS fp
          FROM mins WHERE nh > {window} AND i <= nh - {window}
          UNION
          SELECT w.doc_id, min(w.h) AS fp
          FROM wins w JOIN stats s ON s.doc_id = w.doc_id
          WHERE s.nh <= {window}
          GROUP BY w.doc_id
        ),
        fpsz AS (
          SELECT fp, count(*) AS c FROM fps GROUP BY fp
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM fps a
        JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        JOIN fpsz s ON s.fp = a.fp
        WHERE s.c BETWEEN 2 AND {max_fp_docs}
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= {min_shared}
    """


def knn_lsh_sql(k: int = 10, dim: int = 64) -> str:
    """knn_lsh re-derived in SQL: the 8 seeded hyperplanes are embedded as
    double literals (repr round-trips exactly), the sign-bit bucket is the
    same dot-product test, and the query's bucket filters the scan before
    the rounded-cosine top-k."""
    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.simsearch import _planes

    planes = _planes(dim, DEFAULT_CONFIG.lsh_index_bits)

    def dot(b: int) -> str:
        return " + ".join(f"e[{j + 1}] * {planes[b][j]!r}" for j in range(dim))

    bucket = " + ".join(
        f"(CASE WHEN ({dot(b)}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(planes.shape[0])
    )
    return f"""
        WITH v AS (
          SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
        ),
        b AS (
          SELECT vec_id, embedding, ({bucket}) AS bucket FROM v
        ),
        q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT b.vec_id,
               ROUND(list_cosine_similarity(
                 CAST(b.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), 6) AS sim
        FROM b, q WHERE b.bucket = q.qb
        ORDER BY sim DESC, b.vec_id
        LIMIT {k}
    """


def _kmeans_assign_parts(n_clusters: int, train_sample: int, n_iter: int,
                         dim: int) -> list[str]:
    """The deterministic k-means (init = first n_clusters sample vectors,
    assignment ties to lowest centroid id, centroids ROUNDed to 6 dp each
    update — simsearch._kmeans_lite) unrolled as one chained CTE pair per
    iteration over per-dimension rows, ending with ``assign_all``
    (vec_id → cid over the WHOLE table).  Shared by :func:`knn_ivf_sql`
    and :func:`semdedup_stats_sql`; join the returned parts with ','
    after a WITH and reference ``adim`` / ``cent{n_iter}`` /
    ``assign_all`` downstream."""
    parts = [f"""
        sv AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        sdim AS MATERIALIZED (
          SELECT vec_id, j.j AS j, e[j.j + 1] AS val
          FROM sv, unnest(range(0, {dim})) AS j(j)
          WHERE vec_id < {train_sample}
        ),
        adim AS MATERIALIZED (
          SELECT vec_id, j.j AS j, e[j.j + 1] AS val
          FROM sv, unnest(range(0, {dim})) AS j(j)
        ),
        cent0 AS MATERIALIZED (
          SELECT vec_id AS cid, j, ROUND(val, 6) AS val
          FROM sdim WHERE vec_id < {n_clusters}
        )"""]
    for i in range(n_iter):
        parts.append(f"""
        dist{i} AS MATERIALIZED (
          SELECT sd.vec_id, c.cid,
                 sum((sd.val - c.val) * (sd.val - c.val)) AS d
          FROM sdim sd JOIN cent{i} c ON c.j = sd.j
          GROUP BY sd.vec_id, c.cid
        ),
        a{i} AS MATERIALIZED (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM dist{i}
          ) WHERE rn = 1
        ),
        cent{i + 1} AS MATERIALIZED (
          SELECT c.cid, c.j, coalesce(ROUND(m.avg_v, 6), c.val) AS val
          FROM cent{i} c
          LEFT JOIN (
            SELECT a.cid, sd.j, AVG(sd.val) AS avg_v
            FROM a{i} a JOIN sdim sd ON sd.vec_id = a.vec_id
            GROUP BY a.cid, sd.j
          ) m ON m.cid = c.cid AND m.j = c.j
        )""")
    final = f"cent{n_iter}"
    parts.append(f"""
        assign_all AS (
          SELECT vec_id, cid FROM (
            SELECT ad.vec_id, c.cid,
                   row_number() OVER (PARTITION BY ad.vec_id
                                      ORDER BY sum((ad.val - c.val) * (ad.val - c.val)), c.cid) AS rn
            FROM adim ad JOIN {final} c ON c.j = ad.j
            GROUP BY ad.vec_id, c.cid
          ) WHERE rn = 1
        )""")
    return parts


def knn_ivf_sql(k: int = 10, n_clusters: int = 16, n_probe: int = 2,
                train_sample: int = 2048, n_iter: int = 10,
                dim: int = 64,
                delete_mod: tuple[int, int] | None = None) -> str:
    """knn_ivf re-derived in SQL: the shared k-means unroll
    (:func:`_kmeans_assign_parts`), then probe-cell selection and the
    cell-filtered cosine top-k.  ``delete_mod=(m, r)`` drops the
    ``vec_id % m == r`` slice from the candidate set (the tombstoned
    IVF delete: quantizer and cell assignment are computed on the FULL
    corpus, only retrieval excludes the deleted keys)."""
    parts = _kmeans_assign_parts(n_clusters, train_sample, n_iter, dim)
    final = f"cent{n_iter}"
    where = (f"WHERE e.vec_id % {delete_mod[0]} <> {delete_mod[1]}"
             if delete_mod else "")
    parts.append(f"""
        qdim AS (
          SELECT j, val FROM adim WHERE vec_id = 0
        ),
        probe AS (
          SELECT cid FROM (
            SELECT c.cid, sum((q.val - c.val) * (q.val - c.val)) AS d
            FROM {final} c JOIN qdim q ON q.j = c.j
            GROUP BY c.cid
          ) ORDER BY d, cid LIMIT {n_probe}
        )
        SELECT e.vec_id,
               ROUND(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]),
                 CAST(q.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings e
        JOIN assign_all a ON a.vec_id = e.vec_id
        JOIN probe p ON p.cid = a.cid,
        (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        {where}
        ORDER BY sim DESC, e.vec_id
        LIMIT {k}""")
    return "WITH " + ",".join(parts)


def semdedup_stats_sql(threshold: float = 0.35, n_clusters: int = 16,
                       train_sample: int = 2048, n_iter: int = 10,
                       dim: int = 64) -> str:
    """semdedup_stats re-derived in SQL: the shared k-means unroll assigns
    every vector a cluster (assign_all), in-cluster pairs with rounded
    cosine ≥ threshold feed the same recursive min-label component CTE as
    the near-dup oracles, and survivors are unpaired vectors plus each
    component's min-id representative, rolled up per cluster."""
    parts = _kmeans_assign_parts(n_clusters, train_sample, n_iter, dim)
    parts.append(f"""
        nv AS MATERIALIZED (
          SELECT a.vec_id, a.cid, CAST(e.embedding AS DOUBLE[]) AS ev
          FROM assign_all a JOIN embeddings e ON e.vec_id = a.vec_id
        ),
        cpairs AS MATERIALIZED (
          SELECT x.vec_id AS a, y.vec_id AS b
          FROM nv x JOIN nv y ON x.cid = y.cid AND x.vec_id < y.vec_id
          WHERE ROUND(list_cosine_similarity(x.ev, y.ev), 6) >= {threshold}
        ),
        sym AS (
          SELECT a, b FROM cpairs UNION SELECT b, a FROM cpairs
        ),
        lab(v, l) AS (
          SELECT a, least(a, min(b)) FROM sym GROUP BY a
          UNION
          SELECT s.a, l.l FROM sym s JOIN lab l ON l.v = s.b WHERE l.l < s.a
        ),
        dup AS (
          SELECT v AS vec_id, min(l) AS dup_of FROM lab GROUP BY v
        )
        SELECT CAST(a.cid AS BIGINT) AS cid,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(CASE WHEN d.vec_id IS NULL OR d.dup_of = a.vec_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
        FROM assign_all a LEFT JOIN dup d ON d.vec_id = a.vec_id
        GROUP BY a.cid""")
    return "WITH RECURSIVE " + ",".join(parts)


def _kmeans_int_parts(k: int, n_iter: int, dim: int) -> list[str]:
    """Full-corpus Lloyd's k-means unrolled in SQL
    (simsearch._lloyd): components scale to int64 micro-units up front,
    every iteration is one chained CTE triple (exact integer distances
    with HUGEINT squares / argmin ties to lowest cid / centroid =
    ROUND(sum/count) back to micro-units) — the embedding_top_component
    / bpe_merges unroll precedent.  Parts end at ``cent{n_iter}`` (the
    final centroids) and ``a{n_iter-1}`` (the last update's
    assignment); shared by :func:`kmeans_embeddings_sql` and
    :func:`kmeans_cluster_profile_sql`."""
    parts = [f"""
        sv AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        adim AS MATERIALIZED (
          SELECT vec_id, j.j AS j,
                 CAST(ROUND(e[j.j + 1] * 1000000.0) AS BIGINT) AS iv
          FROM sv, unnest(range(0, {dim})) AS j(j)
        ),
        cent0 AS MATERIALIZED (
          SELECT vec_id AS cid, j, iv AS cv FROM adim WHERE vec_id < {k}
        )"""]
    for i in range(n_iter):
        parts.append(f"""
        dist{i} AS MATERIALIZED (
          SELECT ad.vec_id, c.cid,
                 SUM(CAST(ad.iv - c.cv AS HUGEINT) * (ad.iv - c.cv)) AS d
          FROM adim ad JOIN cent{i} c ON c.j = ad.j
          GROUP BY ad.vec_id, c.cid
        ),
        a{i} AS MATERIALIZED (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM dist{i}
          ) WHERE rn = 1
        ),
        cent{i + 1} AS MATERIALIZED (
          SELECT c.cid, c.j,
                 coalesce(CAST(ROUND(CAST(m.s AS DOUBLE)
                                     / CAST(m.n AS DOUBLE)) AS BIGINT),
                          c.cv) AS cv
          FROM cent{i} c
          LEFT JOIN (
            SELECT a.cid, ad.j, SUM(ad.iv) AS s, COUNT(*) AS n
            FROM a{i} a JOIN adim ad ON ad.vec_id = a.vec_id
            GROUP BY a.cid, ad.j
          ) m ON m.cid = c.cid AND m.j = c.j
        )""")
    return parts


def kmeans_embeddings_sql(k: int = 8, n_iter: int = 3,
                          dim: int = 64) -> str:
    """Final centroids + member counts of the last update's assignment."""
    parts = _kmeans_int_parts(k, n_iter, dim)
    parts.append(f"""
        members AS (
          SELECT cid, COUNT(*) AS n FROM a{n_iter - 1} GROUP BY cid
        )
        SELECT CAST(c.cid AS BIGINT) AS cid,
               CAST(c.j + 1 AS BIGINT) AS pos,
               CAST(c.cv AS BIGINT) AS c_scaled,
               CAST(coalesce(m.n, 0) AS BIGINT) AS n_members
        FROM cent{n_iter} c LEFT JOIN members m ON m.cid = c.cid""")
    return "WITH " + ",".join(parts)


def kmeans_cluster_profile_sql(k: int = 8, n_iter: int = 3,
                               dim: int = 64) -> str:
    """Per-cluster label histogram under the FINAL centroids
    (simsearch.kmeans_cluster_profile): one more exact-integer argmin
    assignment with ``cent{n_iter}``, cross-tabulated against
    embeddings.label."""
    parts = _kmeans_int_parts(k, n_iter, dim)
    parts.append(f"""
        afin AS (
          SELECT vec_id, cid FROM (
            SELECT ad.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY ad.vec_id
                       ORDER BY SUM(CAST(ad.iv - c.cv AS HUGEINT)
                                    * (ad.iv - c.cv)), c.cid) AS rn
            FROM adim ad JOIN cent{n_iter} c ON c.j = ad.j
            GROUP BY ad.vec_id, c.cid
          ) WHERE rn = 1
        )
        SELECT CAST(a.cid AS BIGINT) AS cid,
               CAST(e.label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM afin a JOIN embeddings e ON e.vec_id = a.vec_id
        GROUP BY a.cid, e.label""")
    return "WITH " + ",".join(parts)


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


def knn_join_lsh_sql(k: int = 5, dim: int = 64) -> str:
    """knn_join_lsh re-derived in SQL: the same hyperplane-literal bucket
    expression as knn_lsh_sql, an equi-join on bucket (self excluded),
    rounded cosine, and a per-vector row_number top-k."""
    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.simsearch import _planes

    planes = _planes(dim, DEFAULT_CONFIG.lsh_index_bits)

    def dot(b: int) -> str:
        return " + ".join(f"e[{j + 1}] * {planes[b][j]!r}" for j in range(dim))

    bucket = " + ".join(
        f"(CASE WHEN ({dot(b)}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(planes.shape[0])
    )
    return f"""
        WITH v AS (
          SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
        ),
        b AS MATERIALIZED (
          SELECT vec_id, embedding, ({bucket}) AS bucket FROM v
        ),
        pairs AS (
          SELECT a.vec_id, n.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(n.embedding AS DOUBLE[])), 6) AS sim
          FROM b a JOIN b n ON n.bucket = a.bucket AND n.vec_id <> a.vec_id
        ),
        r AS (
          SELECT vec_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, neighbor_id) AS rk
          FROM pairs
        )
        SELECT vec_id, neighbor_id, sim, CAST(rk AS BIGINT) AS nn_rank
        FROM r WHERE rk <= {k}
    """


def kmeans_inertia_stats_sql(k: int = 8, n_iter: int = 3,
                             dim: int = 64) -> str:
    """kmeans_inertia_stats re-derived in SQL: the shared integer
    unroll, one more exact-distance assignment under ``cent{n_iter}``
    keeping each vector's min d (HUGEINT), per-vector ROUND(d/1e6) to
    milli²-units before the per-cluster sum."""
    parts = _kmeans_int_parts(k, n_iter, dim)
    parts.append(f"""
        dfin AS MATERIALIZED (
          SELECT ad.vec_id, c.cid,
                 SUM(CAST(ad.iv - c.cv AS HUGEINT) * (ad.iv - c.cv)) AS d
          FROM adim ad JOIN cent{n_iter} c ON c.j = ad.j
          GROUP BY ad.vec_id, c.cid
        ),
        amin AS (
          SELECT vec_id, cid, d FROM (
            SELECT vec_id, cid, d,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, cid) AS rn
            FROM dfin
          ) WHERE rn = 1
        )
        SELECT CAST(cid AS BIGINT) AS cid,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(CAST(ROUND(CAST(d AS DOUBLE) / 1000000.0)
                             AS BIGINT)) AS BIGINT) AS inertia_milli,
               CAST(MAX(d) AS BIGINT) AS max_d
        FROM amin GROUP BY cid""")
    return "WITH " + ",".join(parts)


def knn_label_eval_sql(k: int = 5, dim: int = 64) -> str:
    """knn_label_eval re-derived in SQL: the knn_join_lsh oracle as a
    subquery, neighbor labels joined on, per-vector majority vote
    (count DESC, label ASC) via row_number, confusion-matrix rollup
    against the true label."""
    knn = knn_join_lsh_sql(k=k, dim=dim)
    return f"""
        WITH knn AS MATERIALIZED ({knn}),
        votes AS (
          SELECT kn.vec_id, e.label, COUNT(*) AS c
          FROM knn kn JOIN embeddings e ON e.vec_id = kn.neighbor_id
          GROUP BY kn.vec_id, e.label
        ),
        pred AS (
          SELECT vec_id, label AS pred_label FROM (
            SELECT vec_id, label,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY c DESC, label) AS rn
            FROM votes
          ) WHERE rn = 1
        )
        SELECT CAST(t.label AS BIGINT) AS label,
               CAST(p.pred_label AS BIGINT) AS pred_label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM pred p JOIN embeddings t ON t.vec_id = p.vec_id
        GROUP BY t.label, p.pred_label
    """


def ann_recall_sql(k: int = 10, dim: int = 64) -> str:
    """ann_recall_at_k re-derived in SQL: the LSH top-k (knn_lsh_sql) and
    the exact cosine top-k are nested as CTE subqueries, then the set
    intersection and half-away-rounded recall basis points are computed
    over the two k-row sets."""
    lsh = knn_lsh_sql(k=k, dim=dim)
    return f"""
        WITH lshk AS MATERIALIZED ({lsh}),
        exactk AS MATERIALIZED (
          SELECT e.vec_id
          FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          ORDER BY ROUND(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[])), 6) DESC, e.vec_id
          LIMIT {k}
        ),
        common AS (
          SELECT count(*) AS c FROM lshk JOIN exactk USING (vec_id)
        )
        SELECT CAST({k} AS BIGINT) AS k,
               CAST((SELECT count(*) FROM exactk) AS BIGINT) AS n_exact,
               CAST((SELECT count(*) FROM lshk) AS BIGINT) AS n_approx,
               CAST((SELECT c FROM common) AS BIGINT) AS n_common,
               CAST(FLOOR(10000.0 * (SELECT c FROM common)
                          / (SELECT count(*) FROM exactk) + 0.5) AS BIGINT)
                 AS recall_bp
    """


def near_dup_agreement_sql() -> str:
    """label_set_agreement re-derived in SQL: the minhash flagged-doc set
    (minhash_near_dup_sql labels) vs the exact flagged set (distinct
    endpoints of ngram_jaccard_sql pairs), intersected, with half-away
    basis-point recall/precision.  Both sub-oracles nest as MATERIALIZED
    CTEs (each is referenced more than once — the exponential-inline
    sharp edge)."""
    return f"""
        WITH mh AS MATERIALIZED ({minhash_near_dup_sql()}),
        ex_pairs AS MATERIALIZED ({ngram_jaccard_sql()}),
        exn AS MATERIALIZED (
          SELECT DISTINCT v FROM (
            SELECT id_a AS v FROM ex_pairs UNION ALL SELECT id_b FROM ex_pairs)
        ),
        c AS (SELECT count(*) AS n FROM mh JOIN exn ON exn.v = mh.doc_id),
        t AS (
          SELECT CAST((SELECT count(*) FROM mh) AS BIGINT) AS n_lsh,
                 CAST((SELECT count(*) FROM exn) AS BIGINT) AS n_exact,
                 CAST((SELECT n FROM c) AS BIGINT) AS n_common
        )
        SELECT n_lsh, n_exact, n_common,
               CASE WHEN n_exact = 0 THEN 0
                    ELSE CAST(FLOOR(10000.0 * n_common / n_exact + 0.5) AS BIGINT)
               END AS recall_bp,
               CASE WHEN n_lsh = 0 THEN 0
                    ELSE CAST(FLOOR(10000.0 * n_common / n_lsh + 0.5) AS BIGINT)
               END AS precision_bp
        FROM t
    """


def bitext_margin_sql(k: int = 4, threshold_bp: int = 10_000,
                      dim: int = 64) -> str:
    """bitext_mining_margin re-derived in SQL: the same hyperplane-literal
    bucket as knn_lsh_sql, an even/odd label split joined on bucket, two
    row_number rankings (per-src over tgt candidates, per-tgt over src),
    a mutual rank-1 join, and the ALL-BIGINT margin arithmetic —
    floor(x+0.5) as (2N+D)//(2D) — bit-for-bit the Ray kernel's
    integers.  sr/tr/pairs are each referenced more than once →
    MATERIALIZED (the chained-CTE sharp edge); SUMs wrapped in
    CAST(... AS BIGINT) (HUGEINT sharp edge)."""
    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.simsearch import _planes

    planes = _planes(dim, DEFAULT_CONFIG.lsh_index_bits)

    def dot(b: int) -> str:
        return " + ".join(f"e[{j + 1}] * {planes[b][j]!r}" for j in range(dim))

    bucket = " + ".join(
        f"(CASE WHEN ({dot(b)}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(planes.shape[0])
    )
    return f"""
        WITH v AS (
          SELECT vec_id, label, embedding, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
        ),
        b AS MATERIALIZED (
          SELECT vec_id, label, embedding, ({bucket}) AS bucket FROM v
        ),
        pairs AS MATERIALIZED (
          SELECT s.vec_id AS sid, t.vec_id AS tid,
                 s.label AS sl, t.label AS tl,
                 CAST(ROUND(ROUND(list_cosine_similarity(
                     CAST(s.embedding AS DOUBLE[]),
                     CAST(t.embedding AS DOUBLE[])), 6) * 1000000.0)
                   AS BIGINT) AS sim_micro
          FROM b s JOIN b t ON t.bucket = s.bucket
          WHERE s.label % 2 = 0 AND t.label % 2 = 1
        ),
        sr AS MATERIALIZED (
          SELECT *, row_number() OVER (PARTITION BY sid
                    ORDER BY sim_micro DESC, tid) AS rk FROM pairs
        ),
        tr AS MATERIALIZED (
          SELECT *, row_number() OVER (PARTITION BY tid
                    ORDER BY sim_micro DESC, sid) AS rk FROM pairs
        ),
        sstat AS (SELECT sid, CAST(SUM(sim_micro) AS BIGINT) AS sumx,
                         COUNT(*) AS kx
                  FROM sr WHERE rk <= {k} GROUP BY sid),
        tstat AS (SELECT tid, CAST(SUM(sim_micro) AS BIGINT) AS sumy,
                         COUNT(*) AS ky
                  FROM tr WHERE rk <= {k} GROUP BY tid),
        scored AS (
          SELECT sb.sid, sb.tid, sb.sl, sb.tl, sb.sim_micro,
                 (2 * 20000 * st.kx * tt.ky * sb.sim_micro
                    + (st.sumx * tt.ky + tt.sumy * st.kx))
                   // (2 * (st.sumx * tt.ky + tt.sumy * st.kx)) AS m_bp
          FROM (SELECT * FROM sr WHERE rk = 1) sb
          JOIN (SELECT * FROM tr WHERE rk = 1) tb
            ON tb.sid = sb.sid AND tb.tid = sb.tid
          JOIN sstat st ON st.sid = sb.sid
          JOIN tstat tt ON tt.tid = sb.tid
          WHERE sb.sim_micro > 0
            AND (st.sumx * tt.ky + tt.sumy * st.kx) > 0
        )
        SELECT sid AS src_id, tid AS tgt_id,
               CAST(sl AS BIGINT) AS src_label,
               CAST(tl AS BIGINT) AS tgt_label,
               sim_micro, CAST(m_bp AS BIGINT) AS margin_bp
        FROM scored WHERE m_bp >= {threshold_bp}
    """


def dim_truncation_recall_sql(k: int = 10, trunc: int = 16) -> str:
    """ann_dim_truncation_recall re-derived in SQL: the exact cosine
    top-k at full dimension vs at the first ``trunc`` coordinates
    (DuckDB list slice, 1-based inclusive), intersected, with the
    half-away basis-point recall."""
    return f"""
        WITH exactk AS MATERIALIZED (
          SELECT e.vec_id
          FROM embeddings e,
               (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          ORDER BY ROUND(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[])), 6) DESC, e.vec_id
          LIMIT {k}
        ),
        trunck AS MATERIALIZED (
          SELECT e.vec_id
          FROM embeddings e,
               (SELECT embedding FROM embeddings WHERE vec_id = 0) q
          ORDER BY ROUND(list_cosine_similarity(
                     CAST(e.embedding[1:{trunc}] AS DOUBLE[]),
                     CAST(q.embedding[1:{trunc}] AS DOUBLE[])), 6)
                   DESC, e.vec_id
          LIMIT {k}
        ),
        common AS (SELECT count(*) AS c FROM exactk JOIN trunck USING (vec_id))
        SELECT CAST({k} AS BIGINT) AS k,
               CAST((SELECT count(*) FROM exactk) AS BIGINT) AS n_exact,
               CAST((SELECT count(*) FROM trunck) AS BIGINT) AS n_approx,
               CAST((SELECT c FROM common) AS BIGINT) AS n_common,
               CAST(FLOOR(10000.0 * (SELECT c FROM common)
                          / (SELECT count(*) FROM exactk) + 0.5) AS BIGINT)
                 AS recall_bp
    """


def near_dup_keep_best_stats_sql(threshold: float = 0.8,
                                 max_bucket: int = 512) -> str:
    """Survivor-corpus stats after fuzzy dedup with the QUALITY-based
    representative (near_dup_keep_best): per cluster keep the member
    with max n_chars (tie -> min doc_id) — rn = 1 under the window —
    plus every unclustered doc, then the per-lang rollup."""
    return f"""
        WITH lab AS MATERIALIZED ({minhash_near_dup_sql(threshold, max_bucket)}),
        rep AS MATERIALIZED (
          SELECT l.doc_id,
                 row_number() OVER (PARTITION BY l.dup_of
                                    ORDER BY d.n_chars DESC, l.doc_id) AS rn
          FROM lab l JOIN documents d ON d.doc_id = l.doc_id
        )
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
        FROM documents d
        LEFT JOIN rep r ON r.doc_id = d.doc_id
        WHERE r.doc_id IS NULL OR r.rn = 1
        GROUP BY d.lang
    """


def soft_dedup_commonness_sql(k: int = 8, top_k: int = 25) -> str:
    """SoftDedup commonness re-derived in SQL: the dup_span window CTEs
    (md5_number_lower over every space-joined word k-window), global
    occurrence counts joined back onto every window position, and the
    exact-integer half-away mean (2e6*sum + n) // (2n)."""
    return f"""
        WITH mw AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                             w -> w <> '') AS ws
          FROM documents
        ),
        wins AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 md5_number_lower(array_to_string(ws[i.i:i.i + {k - 1}], ' ')) AS h
          FROM mw, unnest(range(1, len(ws) - {k} + 2)) AS i(i)
        ),
        cnt AS MATERIALIZED (
          SELECT h, CAST(count(*) AS BIGINT) AS c FROM wins GROUP BY h
        ),
        per_doc AS (
          SELECT w.doc_id,
                 CAST(count(*) AS BIGINT) AS n_windows,
                 CAST(sum(c.c) AS BIGINT) AS dup_sum
          FROM wins w JOIN cnt c ON c.h = w.h
          GROUP BY w.doc_id
        )
        SELECT doc_id, n_windows, dup_sum,
               CAST((2 * 1000000 * dup_sum + n_windows)
                    // (2 * n_windows) AS BIGINT) AS commonness_e6
        FROM per_doc
        ORDER BY commonness_e6 DESC, doc_id LIMIT {top_k}
    """


def minhash_param_recall_sql(rows_list: tuple[int, ...] = (2, 4, 8, 16),
                             max_bucket: int = 512,
                             threshold_pct: int = 80,
                             max_postings: int = 256) -> str:
    """minhash_param_recall re-derived in SQL: one shared signature chain
    (seeded permutations as a VALUES table, HUGEINT mod-2^64 == numpy
    uint64 wraparound), one band layout + bucket-capped candidate set per
    rows-per-band config, the df-capped exact n-gram-Jaccard pair set as
    ground truth, and integer-bp recall/precision.  Every multiply-
    referenced CTE is AS MATERIALIZED (the chained-CTE inlining sharp
    edge)."""
    from ocr_ray.pipelines.dedup import _A, _B, _MERSENNE, _N_PERM

    perm_rows = ", ".join(
        f"({k}, {int(a)}, {int(b)})" for k, (a, b) in enumerate(zip(_A, _B))
    )
    p = _MERSENNE
    per_cfg = []
    selects = []
    for r in rows_list:
        per_cfg.append(f"""bands_{r} AS MATERIALIZED (
          SELECT doc_id, k // {r} AS band_id,
            substr(md5(string_agg(CAST(v AS VARCHAR), '-' ORDER BY k)), 1, 16)
              AS band_hash
          FROM sig_full GROUP BY doc_id, k // {r}
        ),
        bsz_{r} AS MATERIALIZED (
          SELECT band_id, band_hash, count(*) AS n, min(doc_id) AS mn
          FROM bands_{r} GROUP BY band_id, band_hash
        ),
        cand_{r} AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands_{r} a
          JOIN bands_{r} b ON a.band_id = b.band_id
                           AND a.band_hash = b.band_hash
                           AND a.doc_id < b.doc_id
          JOIN bsz_{r} s ON s.band_id = a.band_id
                         AND s.band_hash = a.band_hash
          WHERE s.n <= {max_bucket} OR a.doc_id = s.mn
        ),
        stat_{r} AS MATERIALIZED (
          SELECT (SELECT count(*) FROM cand_{r}) AS n_candidates,
                 (SELECT count(*) FROM cand_{r} c
                    JOIN exact e ON e.id_a = c.id_a AND e.id_b = c.id_b)
                   AS n_hit,
                 (SELECT count(*) FROM exact) AS n_exact
        )""")
        selects.append(f"""
            SELECT CAST({_N_PERM // r} AS BIGINT) AS bands,
                   CAST({r} AS BIGINT) AS rows_per_band,
                   CAST(n_candidates AS BIGINT) AS n_candidates,
                   CAST(n_hit AS BIGINT) AS n_hit,
                   CAST(n_exact AS BIGINT) AS n_exact,
                   CAST(CASE WHEN n_exact > 0
                        THEN (10000 * n_hit) // n_exact
                        ELSE 10000 END AS BIGINT) AS recall_bp,
                   CAST(CASE WHEN n_candidates > 0
                        THEN (10000 * n_hit) // n_candidates
                        ELSE 10000 END AS BIGINT) AS precision_bp
            FROM stat_{r}""")
    cfg_chain = ",\n        ".join(per_cfg)
    body = "\n            UNION ALL".join(selects)
    return f"""
        WITH mw AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                             w -> w <> '') AS ws
          FROM documents
        ),
        grams AS (
          SELECT doc_id, g FROM (
            SELECT doc_id,
              CASE WHEN len(ws) = 0 THEN []
                   WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                   ELSE list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
              END AS gs
            FROM mw
          ), unnest(gs) AS t(g)
        ),
        shingles AS MATERIALIZED (
          SELECT DISTINCT doc_id, md5_number_lower(g) AS h FROM grams
        ),
        perm(k, a, b) AS (VALUES {perm_rows}),
        sigs AS (
          SELECT s.doc_id, p.k,
            min((((p.a::HUGEINT * s.h::HUGEINT + p.b::HUGEINT)
                  % 18446744073709551616::HUGEINT) % {p})::UBIGINT) AS v
          FROM shingles s CROSS JOIN perm p
          GROUP BY s.doc_id, p.k
        ),
        sig_full AS MATERIALIZED (
          SELECT d.doc_id, p.k, coalesce(s.v, {p}::UBIGINT) AS v
          FROM documents d CROSS JOIN perm p
          LEFT JOIN sigs s ON s.doc_id = d.doc_id AND s.k = p.k
        ),
        sz AS (
          SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
        ),
        dfc AS (
          SELECT h, count(*) AS c FROM shingles GROUP BY h
        ),
        expairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
          FROM shingles a
          JOIN shingles b ON a.h = b.h AND a.doc_id < b.doc_id
          JOIN dfc ON dfc.h = a.h
          WHERE dfc.c BETWEEN 2 AND {max_postings}
          GROUP BY a.doc_id, b.doc_id
        ),
        exact AS MATERIALIZED (
          SELECT p.id_a, p.id_b
          FROM expairs p
          JOIN sz sa ON sa.doc_id = p.id_a
          JOIN sz sb ON sb.doc_id = p.id_b
          WHERE p.shared * 100 >= {threshold_pct} * (sa.n + sb.n - p.shared)
        ),
        {cfg_chain}
        {body}
    """


def simhash_hamming_histogram_sql(max_bucket: int = 512) -> str:
    """Hamming-distance histogram over ALL distinct simhash candidate
    pairs (shared 16-bit chunk, star-capped degenerate buckets) — the
    unfiltered sibling of simhash_near_dup_sql's pair CTE."""
    return f"""
        WITH {_SIMHASH_CTES},
        chunks AS (
          SELECT doc_id, v, c.c, (v >> (16 * c.c)) & 65535 AS chunk
          FROM sh, unnest(range(0, 4)) AS c(c)
        ),
        bsize AS (
          SELECT c, chunk, count(*) AS n, min(doc_id) AS mn
          FROM chunks GROUP BY c, chunk
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 bit_count(xor(a.v, b.v)) AS hamming
          FROM chunks a
          JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk
                        AND a.doc_id < b.doc_id
          JOIN bsize s ON s.c = a.c AND s.chunk = a.chunk
          WHERE (s.n <= {max_bucket} OR a.doc_id = s.mn)
        )
        SELECT CAST(hamming AS BIGINT) AS hamming,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY hamming
    """


def dup_ngram_coverage_sql() -> str:
    """Duplicate-text-fraction per lang re-derived in SQL: the same
    word-3-gram md5_number_lower distinct shingles as ngram_jaccard_sql,
    doc frequency over the whole corpus, per-doc duplicated-shingle
    counts, per-lang integer sums with floor-bp ratios (matching the
    engine's dup_shingles * 10000 // shingles arithmetic exactly)."""
    return """
        WITH mw AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                             w -> w <> '') AS ws
          FROM documents
        ),
        grams AS (
          SELECT doc_id, g FROM (
            SELECT doc_id,
              CASE WHEN len(ws) = 0 THEN []
                   WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                   ELSE list_transform(range(1, len(ws) - 1),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
              END AS gs
            FROM mw
          ), unnest(gs) AS t(g)
        ),
        shingles AS MATERIALIZED (
          SELECT DISTINCT doc_id, md5_number_lower(g) AS h FROM grams
        ),
        df AS (
          SELECT h, count(*) AS c FROM shingles GROUP BY h
        ),
        per AS (
          SELECT s.doc_id, count(*) AS n_sh,
                 SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS n_dup
          FROM shingles s JOIN df ON df.h = s.h
          GROUP BY s.doc_id
        )
        SELECT coalesce(d.lang, '') AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN per.n_dup > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs_dup,
               CAST(SUM(per.n_sh) AS BIGINT) AS shingles,
               CAST(SUM(per.n_dup) AS BIGINT) AS dup_shingles,
               CAST(SUM(per.n_dup) * 10000 // SUM(per.n_sh)
                    AS BIGINT) AS coverage_bp,
               CAST(SUM(CASE WHEN per.n_dup > 0 THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS docs_dup_bp
        FROM per JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """


def pq_adc_search_sql(m_sub: int = 4, k_cw: int = 16, n_iter: int = 2,
                      dim: int = 64, k: int = 10,
                      shortlist: int = 100) -> str:
    """PQ-ADC + exact-refine top-k re-derived in SQL
    (simsearch.pq_adc_search): per subspace, the _kmeans_int_parts
    unroll (micro-unit ints, HUGEINT exact distances, argmin ties to
    lowest cid, ROUND(sum/count) updates) trains the codebook; codes
    assign against the final centroids; the query's per-codeword
    distance table and the ADC sum are the same exact integer sums; the
    ADC top-`shortlist` re-ranks by exact int-L2; in_exact marks the
    exact top-k over the whole corpus."""
    sub = dim // m_sub
    parts = [f"""
        sv AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        adim AS MATERIALIZED (
          SELECT vec_id, j.j AS j,
                 CAST(ROUND(e[j.j + 1] * 1000000.0) AS BIGINT) AS iv
          FROM sv, unnest(range(0, {dim})) AS j(j)
        )"""]
    for m in range(m_sub):
        lo = m * sub
        parts.append(f"""
        s{m}d AS MATERIALIZED (
          SELECT vec_id, j - {lo} AS j, iv FROM adim
          WHERE j >= {lo} AND j < {lo + sub}
        ),
        c{m}_0 AS MATERIALIZED (
          SELECT vec_id AS cid, j, iv AS cv FROM s{m}d WHERE vec_id < {k_cw}
        )""")
        for i in range(n_iter):
            parts.append(f"""
        d{m}_{i} AS MATERIALIZED (
          SELECT ad.vec_id, c.cid,
                 SUM(CAST(ad.iv - c.cv AS HUGEINT) * (ad.iv - c.cv)) AS d
          FROM s{m}d ad JOIN c{m}_{i} c ON c.j = ad.j
          GROUP BY ad.vec_id, c.cid
        ),
        a{m}_{i} AS MATERIALIZED (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, cid) AS rn
            FROM d{m}_{i}
          ) WHERE rn = 1
        ),
        c{m}_{i + 1} AS MATERIALIZED (
          SELECT c.cid, c.j,
                 coalesce(CAST(ROUND(CAST(mm.s AS DOUBLE)
                                     / CAST(mm.n AS DOUBLE)) AS BIGINT),
                          c.cv) AS cv
          FROM c{m}_{i} c
          LEFT JOIN (
            SELECT a.cid, ad.j, SUM(ad.iv) AS s, COUNT(*) AS n
            FROM a{m}_{i} a JOIN s{m}d ad ON ad.vec_id = a.vec_id
            GROUP BY a.cid, ad.j
          ) mm ON mm.cid = c.cid AND mm.j = c.j
        )""")
        parts.append(f"""
        code{m} AS MATERIALIZED (
          SELECT vec_id, cid FROM (
            SELECT dd.vec_id, dd.cid,
                   row_number() OVER (PARTITION BY dd.vec_id
                                      ORDER BY dd.d, dd.cid) AS rn
            FROM (
              SELECT ad.vec_id, c.cid,
                     SUM(CAST(ad.iv - c.cv AS HUGEINT) * (ad.iv - c.cv)) AS d
              FROM s{m}d ad JOIN c{m}_{n_iter} c ON c.j = ad.j
              GROUP BY ad.vec_id, c.cid
            ) dd
          ) WHERE rn = 1
        ),
        dtq{m} AS (
          SELECT c.cid,
                 SUM(CAST(q.iv - c.cv AS HUGEINT) * (q.iv - c.cv)) AS d
          FROM c{m}_{n_iter} c
          JOIN s{m}d q ON q.j = c.j AND q.vec_id = 0
          GROUP BY c.cid
        )""")
    adc_sum = " + ".join(f"t{m}.d" for m in range(m_sub))
    joins = " ".join(
        f"JOIN code{m} k{m} ON k{m}.vec_id = v.vec_id "
        f"JOIN dtq{m} t{m} ON t{m}.cid = k{m}.cid"
        for m in range(m_sub))
    parts.append(f"""
        exd AS MATERIALIZED (
          SELECT ad.vec_id,
                 SUM(CAST(ad.iv - q.iv AS HUGEINT) * (ad.iv - q.iv)) AS d
          FROM adim ad JOIN adim q ON q.j = ad.j AND q.vec_id = 0
          GROUP BY ad.vec_id
        ),
        ex AS MATERIALIZED (
          SELECT vec_id FROM exd ORDER BY d, vec_id LIMIT {k}
        ),
        vids AS (SELECT DISTINCT vec_id FROM adim),
        adc AS MATERIALIZED (
          SELECT v.vec_id, CAST({adc_sum} AS BIGINT) AS adc_d
          FROM vids v {joins}
        ),
        short AS MATERIALIZED (
          SELECT a.vec_id, a.adc_d, CAST(exd.d AS BIGINT) AS exact_d
          FROM adc a JOIN exd ON exd.vec_id = a.vec_id
          ORDER BY a.adc_d, a.vec_id LIMIT {shortlist}
        )
        SELECT vec_id, adc_d, exact_d,
               CAST(CASE WHEN vec_id IN (SELECT vec_id FROM ex)
                    THEN 1 ELSE 0 END AS BIGINT) AS in_exact
        FROM short ORDER BY exact_d, vec_id LIMIT {k}""")
    return "WITH " + ",".join(parts)


def cdc_chunk_stats_sql(k: int = 16, divisor: int = 64) -> str:
    """Content-defined chunking dedup stats re-derived in SQL: the same
    per-position Rabin-Karp hash as winnow_near_dup_sql (raw text, not
    lowercased — CDC is content-level), a cut after every window with
    h %% divisor == 0, chunks rebuilt via lag() over the distinct cut
    positions (plus the end-of-text boundary), md5-keyed distinct-chunk
    dedup per lang, floor-bp savings."""
    p = (1 << 61) - 1
    expr = " + ".join(
        f"unicode(substr(t, i.i + {j + 1}, 1))::HUGEINT * {pow(257, k - 1 - j, p)}"
        for j in range(k)
    )
    return f"""
        WITH dt AS (
          SELECT doc_id, coalesce(lang, '') AS lang,
                 coalesce(text, '') AS t,
                 length(coalesce(text, '')) AS n
          FROM documents
        ),
        wins AS (
          SELECT doc_id, i.i AS i, (({expr}) % {p})::UBIGINT AS h
          FROM dt, unnest(range(0, greatest(n - {k} + 1, 0))) AS i(i)
        ),
        cuts AS (
          SELECT DISTINCT doc_id, cut FROM (
            SELECT doc_id, i + {k} AS cut FROM wins
            WHERE h % {divisor} = 0
            UNION ALL
            SELECT doc_id, n AS cut FROM dt
          )
        ),
        chunks AS MATERIALIZED (
          SELECT c.doc_id, dt.lang,
                 substr(dt.t, prev + 1, cut - prev) AS seg,
                 cut - prev AS len
          FROM (
            SELECT doc_id, cut,
                   lag(cut, 1, 0) OVER (PARTITION BY doc_id
                                        ORDER BY cut) AS prev
            FROM cuts
          ) c JOIN dt ON dt.doc_id = c.doc_id
          WHERE cut > prev
        ),
        hashed AS MATERIALIZED (
          SELECT lang, md5_number_lower(seg) AS h, len FROM chunks
        ),
        uniq AS (
          SELECT lang, h, any_value(len) AS len
          FROM hashed GROUP BY lang, h
        )
        SELECT t.lang,
               CAST(t.n_chunks AS BIGINT) AS n_chunks,
               CAST(u.n_unique_chunks AS BIGINT) AS n_unique_chunks,
               CAST(t.total_chars AS BIGINT) AS total_chars,
               CAST(u.unique_chars AS BIGINT) AS unique_chars,
               CAST((t.total_chars - u.unique_chars) * 10000
                    // t.total_chars AS BIGINT) AS savings_bp
        FROM (SELECT lang, count(*) AS n_chunks, SUM(len) AS total_chars
              FROM hashed GROUP BY lang) t
        JOIN (SELECT lang, count(*) AS n_unique_chunks,
                     SUM(len) AS unique_chars
              FROM uniq GROUP BY lang) u USING (lang)
    """
