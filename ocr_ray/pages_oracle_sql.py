"""DuckDB oracle SQL for the pages-corpus (extraction-family) queries.

The synthetic pages corpus is a PURE FUNCTION of the ``documents`` table
(sources/synth.py), and the test-corpus page shapes are fixed templates —
so the driver's oracle can regenerate every page (html payload, raw text
layer, url, timestamp) with SQL string construction and re-derive the
extraction result (gates → DOM-walk/charbox-parse → vote) with SQL
aggregation, INDEPENDENTLY of the Ray engine.

Scope note: this SQL replicates the extraction SPEC for the synthetic
corpus's page shapes (the general walker spec over arbitrary HTML is
pinned by the golden/property pytest suite, tests/test_golden.py).  Every
fragment mirrors a specific generator/engine rule:

  * page generation       sources/synth.py:51-111, 269-311
  * gate chain            functions/gates.py:139-188 (order: lang,
                          too_short, mostly_whitespace, nonprintable,
                          low_ascii_letters, weird_chars, markup_heavy)
  * DOM blocks kept       stages/html_extract.py:234-268 (h1 heading,
                          >=25-char paragraphs, table rows "a | b",
                          malformed tail block; nav/footer/linkfarm drop)
  * charbox parse         stages/pdf_layout.py (40-char slices →
                          whitespace-normalized lines; one block per
                          column; footer page number dropped)
  * vote                  stages/extract.py (clean corpus ⇒ engine 1 wins
                          on every candidate; pinned by the spec tests)
  * partition hash        pipelines/extract.py stable_part_id ==
                          md5_number_lower(url) % P
"""

from __future__ import annotations

from ocr_ray.sources.synth import _FOOTER, _LINKFARM, _NAV

_HEAD = (
    "<html><head><title>doc</title><script>var x=1;</script>"
    "<style>p{color:red}</style></head><body>"
)

_ALLOW = "('en','de','fr','es')"

_KEYWORDS = (
    "additional interest", "additional interests", "additional insured",
    "additional insureds", "mortgagee", "mortgage holder", "mortgage holders",
    "mortgagees", "loss payee", "loss payable", "lienholder", "lien holder",
    "secured party", "secured parties",
)
_DOLLAR_RE = r"\$\s*[0,]*([1-9](,?[0-9]){3,}|[2-9](,?[0-9]){2})"
_SKIP_PRED_T = " OR ".join(
    f"upper({{c}}) LIKE '%{p}%'"
    for p in ("EXAMPLE", "CALCULATION", "HOW TO", "SAMPLE", "ILLUSTRATION")
)


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def pages_cte(zipf_hosts: bool = False) -> str:
    """CTEs ending in ``pages(doc_id, url, warc_ts, html, rawtext, lang,
    is_pdf, two_col)`` — the derived corpus, one row per page row
    (including the doc_id%23 duplicate rows).  ``zipf_hosts`` switches
    the url host to the generator's skew knob (synth._zipf_host: host-k
    owns ~2^-(k+1) of the corpus; k = trailing zeros of doc_id+1 capped
    at 12 — the bit identity tz(x) = bit_count((x & -x) - 1))."""
    nav, footer, linkfarm, head = map(_lit, (_NAV, _FOOTER, _LINKFARM, _HEAD))
    host = ("'host-' || lpad(CAST(least(12, bit_count(((w.doc_id + 1) "
            "& -(w.doc_id + 1)) - 1)) AS VARCHAR), 2, '0')"
            if zipf_hosts else "w.source")
    return f"""
w0 AS (
  SELECT doc_id, coalesce(text, '') AS text, lang, source,
         list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
w AS (
  SELECT *,
    CASE WHEN len(ws) = 0 THEN 1
         ELSE CAST(ceil(len(ws) / 12.0) AS INT) END AS n_chunks,
    trim(array_to_string(list_transform(ws,
      (x, i) -> x || CASE WHEN (i - 1 + doc_id) % 11 = 0
                          THEN '  ' ELSE ' ' END), '')) AS rawtext,
    (doc_id % 10 = 0) AS is_pdf,
    (doc_id % 20 = 0) AS two_col,
    CAST(greatest(1, ceil(length(substr(coalesce(text, ''), 1, 400)) / 40.0))
         AS INT) AS n_slices
  FROM w0
),
para AS (  -- '<p>..</p>' run incl. the doc_id%7 table after chunk 1
  SELECT doc_id, string_agg(
    '<p>' || array_to_string(list_slice(ws, j*12 + 1, j*12 + 12), ' ') || '</p>'
    || CASE WHEN j = 1 AND doc_id % 7 = 0 THEN
         '<table>' || array_to_string(list_transform(range(0, 3),
           r -> '<tr><td>row ' || r || '</td><td>$'
                || ((doc_id % 9 + 1) * 100 + r) || '</td></tr>'), '')
         || '</table>'
       ELSE '' END,
    '' ORDER BY j) AS paras
  FROM w, unnest(range(0, n_chunks)) AS g(j)
  GROUP BY doc_id
),
charjson AS (  -- compact charbox JSON for pdf docs (synth.make_charbox)
  SELECT doc_id, '{{"pages":[{{"chars":[' || string_agg(cj, ',' ORDER BY li, ci)
         || ']}}]}}' AS payload
  FROM (
    SELECT w.doc_id, li.li, ci.ci,
      '{{"c":' || to_json(substr(substr(w.text, 1, 400), li.li*40 + ci.ci + 1, 1))
      || ',"h":10.0,"w":5.0,"x":'
      || printf('%.1f', CASE WHEN w.two_col AND li.li % 2 = 1
                             THEN 400.0 ELSE 72.0 END + ci.ci * 6.0)
      || ',"y":' || printf('%.1f', 720.0 - CASE WHEN w.two_col
                             THEN (li.li // 2) ELSE li.li END * 12.0)
      || '}}' AS cj
    FROM w,
      unnest(range(0, CAST(greatest(1, ceil(length(substr(w.text,1,400))/40.0)) AS INT))) AS li(li),
      unnest(range(0, 40)) AS ci(ci)
    WHERE w.is_pdf
      AND substr(substr(w.text, 1, 400), li.li*40 + ci.ci + 1, 1) NOT IN ('', ' ')
    UNION ALL
    SELECT w.doc_id, 1000000 AS li, ci.ci,
      '{{"c":' || to_json(substr(CAST(w.doc_id % 50 + 1 AS VARCHAR), ci.ci + 1, 1))
      || ',"h":10.0,"w":5.0,"x":' || printf('%.1f', 300.0 + ci.ci * 6.0)
      || ',"y":30.0}}' AS cj
    FROM w, unnest(range(0, 2)) AS ci(ci)
    WHERE w.is_pdf
      AND substr(CAST(w.doc_id % 50 + 1 AS VARCHAR), ci.ci + 1, 1) <> ''
  ) GROUP BY doc_id
),
page0 AS (
  SELECT w.doc_id,
    'https://' || {host} || '.example.org/doc/' || w.doc_id
      || CASE WHEN w.is_pdf THEN '.pdf' ELSE '' END AS url,
    TIMESTAMP '2024-01-01' + w.doc_id * INTERVAL 1 SECOND AS warc_ts,
    CASE WHEN w.is_pdf THEN cj.payload
         ELSE {head} || {nav} || '<main>'
              || '<h1>Document ' || w.doc_id || '</h1>' || p.paras
              || CASE WHEN w.doc_id % 13 = 0
                      THEN '<p>trailing < bracket <b>unclosed' ELSE '' END
              || '</main>' || {linkfarm} || {footer} || '</body></html>'
    END AS html,
    w.rawtext, w.lang, w.is_pdf, w.two_col, w.text
  FROM w
  JOIN para p ON p.doc_id = w.doc_id
  LEFT JOIN charjson cj ON cj.doc_id = w.doc_id
),
pages AS (
  SELECT * FROM page0
  UNION ALL
  SELECT doc_id, url, warc_ts + INTERVAL 1 HOUR AS warc_ts,
         html, rawtext, lang, is_pdf, two_col, text
  FROM page0 WHERE doc_id % 23 = 0
)"""


def gates_cte() -> str:
    """``gated`` — pages + reject_reason ('' = candidate).  Mirrors
    functions/gates.py pre_classify precedence exactly."""
    return f"""
gated AS (
  SELECT *,
    CASE
      WHEN lang NOT IN {_ALLOW} THEN 'lang'
      WHEN length(regexp_replace(rawtext, '^\\s+|\\s+$', '', 'g')) < 10
        THEN 'too_short'
      WHEN (length(substr(rawtext,1,500))
            - length(regexp_replace(substr(rawtext,1,500), '\\s', '', 'g'))
            ) * 100 > greatest(length(substr(rawtext,1,500)),1) * 90
        THEN 'mostly_whitespace'
      WHEN length(regexp_replace(substr(rawtext,1,500),
             '[^\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) * 100
           > greatest(length(substr(rawtext,1,500)),1) * 30
        THEN 'nonprintable'
      WHEN length(regexp_replace(substr(rawtext,1,500), '[^A-Za-z]', '', 'g')) * 100
           < greatest(length(substr(rawtext,1,500)),1) * 20
        THEN 'low_ascii_letters'
      WHEN length(regexp_replace(substr(rawtext,1,500),
             '[\\x01-\\x7F\\p{{L}}\\p{{N}}]', '', 'g')) * 100
           > greatest(length(substr(rawtext,1,500)),1) * 30
        THEN 'weird_chars'
      WHEN NOT is_pdf AND strlen(html) > 0
           AND length(rawtext) * 20 < strlen(html)
        THEN 'markup_heavy'
      ELSE ''
    END AS reject_reason
  FROM pages
)"""


def blocks_cte() -> str:
    """``qblocks(url, warc_ts, ord, btext, block_idx)`` — the kept
    main-content blocks of EVERY page (gate-independent: the engine output
    is a pure function of the page), in document order (html_extract keep
    rules / pdf_layout line assembly for the corpus shapes).  ``blocks``
    restricts to candidate pages (the gated extraction pipelines)."""
    return """
qdocblocks AS (
  -- h1 heading block (always kept; heading keep rule)
  SELECT url, warc_ts, 0 AS ord, 'Document ' || doc_id AS btext
  FROM gated WHERE NOT is_pdf
  UNION ALL
  -- paragraph chunks >= 25 chars (min_block_chars)
  SELECT g.url, g.warc_ts, (j + 1) * 100 AS ord,
         array_to_string(list_slice(w.ws, j*12 + 1, j*12 + 12), ' ') AS btext
  FROM gated g JOIN w ON w.doc_id = g.doc_id,
       unnest(range(0, w.n_chunks)) AS c(j)
  WHERE NOT g.is_pdf
    AND length(array_to_string(list_slice(w.ws, j*12 + 1, j*12 + 12), ' ')) >= 25
  UNION ALL
  -- table rows 'row r | $amt' after chunk 1 (doc_id%7, needs >=2 chunks)
  SELECT g.url, g.warc_ts, 201 + r AS ord,
         'row ' || r || ' | $' || ((g.doc_id % 9 + 1) * 100 + r) AS btext
  FROM gated g JOIN w ON w.doc_id = g.doc_id,
       unnest(range(0, 3)) AS t(r)
  WHERE NOT g.is_pdf AND g.doc_id % 7 = 0 AND w.n_chunks >= 2
  UNION ALL
  -- malformed tail block (doc_id%13): 'trailing < bracket unclosed'
  SELECT url, warc_ts, 1000000000 AS ord,
         'trailing < bracket unclosed' AS btext
  FROM gated WHERE NOT is_pdf AND doc_id % 13 = 0
  UNION ALL
  -- pdf single-column (or a 2-line "two-column" whose right line shares
  -- the left line's y, continuing the block): ONE block of
  -- whitespace-normalized 40-char slices in li order
  SELECT g.url, g.warc_ts, 0 AS ord, string_agg(s.ns, ' ' ORDER BY s.li) AS btext
  FROM gated g
  JOIN w ON w.doc_id = g.doc_id
  JOIN (
    SELECT w.doc_id, li.li,
           trim(regexp_replace(substr(substr(w.text,1,400), li.li*40 + 1, 40),
                               '\\s+', ' ', 'g')) AS ns
    FROM w, unnest(range(0, w.n_slices)) AS li(li)
    WHERE w.is_pdf
  ) s ON s.doc_id = g.doc_id
  WHERE g.is_pdf AND (NOT g.two_col OR w.n_slices <= 2) AND s.ns <> ''
  GROUP BY g.url, g.warc_ts
  UNION ALL
  -- pdf two-column with >= 3 lines: block per column (even then odd
  -- slices; the y of the first right-column line is above the last
  -- left-column line, starting a new block)
  SELECT g.url, g.warc_ts, (s.li % 2) AS ord,
         string_agg(s.ns, ' ' ORDER BY s.li) AS btext
  FROM gated g
  JOIN w ON w.doc_id = g.doc_id
  JOIN (
    SELECT w.doc_id, li.li,
           trim(regexp_replace(substr(substr(w.text,1,400), li.li*40 + 1, 40),
                               '\\s+', ' ', 'g')) AS ns
    FROM w, unnest(range(0, w.n_slices)) AS li(li)
    WHERE w.is_pdf
  ) s ON s.doc_id = g.doc_id
  WHERE g.is_pdf AND g.two_col AND w.n_slices >= 3 AND s.ns <> ''
  GROUP BY g.url, g.warc_ts, s.li % 2
),
qblocks AS (
  SELECT url, warc_ts, ord, btext,
         row_number() OVER (PARTITION BY url, warc_ts ORDER BY ord) - 1 AS block_idx
  FROM qdocblocks
),
blocks AS (
  SELECT b.* FROM qblocks b
  JOIN gated g ON g.url = b.url AND g.warc_ts = b.warc_ts
  WHERE g.reject_reason = ''
)"""


def extracted_cte() -> str:
    """``extracted`` — one row per page with the engine-output columns the
    Ray pipeline produces (clean-corpus vote: engine 1 wins for every
    candidate; rejected rows carry empty output)."""
    return """
exjoin AS (
  SELECT g.doc_id, g.url, g.warc_ts, g.lang, g.is_pdf, g.html, g.rawtext,
         g.reject_reason,
         b.ext, coalesce(b.nb, 0) AS n_blocks
  FROM gated g
  LEFT JOIN (
    SELECT url, warc_ts, string_agg(btext, chr(10) ORDER BY ord) AS ext,
           count(*) AS nb
    FROM blocks GROUP BY url, warc_ts
  ) b ON b.url = g.url AND b.warc_ts = g.warc_ts
),
extracted AS (
  SELECT doc_id, url, warc_ts, lang,
         CAST(md5_number_lower(url) % 16 AS INT) AS part_id,
         CASE WHEN reject_reason <> '' THEN '' ELSE coalesce(ext, '') END
           AS extracted_text,
         CASE WHEN reject_reason <> '' THEN 0 ELSE n_blocks END AS n_blocks,
         CASE WHEN reject_reason <> '' THEN 'none'
              WHEN is_pdf THEN 'pdf' ELSE 'dom' END AS engine,
         CASE WHEN reject_reason <> '' THEN 'rejected' ELSE 'ok' END
           AS parse_status,
         reject_reason,
         CAST(strlen(html) AS BIGINT) AS bytes_in,
         CAST(CASE WHEN reject_reason <> '' THEN 0
              ELSE strlen(coalesce(ext, '')) END AS BIGINT) AS bytes_out,
         rawtext, html, is_pdf
  FROM exjoin
)"""


def _with_pages(body: str, need_blocks: bool = True,
                zipf_hosts: bool = False) -> str:
    parts = [pages_cte(zipf_hosts=zipf_hosts), gates_cte()]
    if need_blocks:
        parts.append(blocks_cte())
        parts.append(extracted_cte())
    return "WITH " + ",".join(p.strip().lstrip() for p in parts) + body


def extract_pages_sql() -> str:
    return _with_pages("""
        SELECT url, lang, CAST(part_id AS INT) AS part_id,
               CAST(n_blocks AS INT) AS n_blocks, engine, parse_status,
               reject_reason, bytes_in, bytes_out
        FROM extracted
    """)


def extract_stats_sql() -> str:
    return _with_pages("""
        SELECT engine, parse_status, COUNT(*) AS n,
               CAST(SUM(bytes_in) AS BIGINT) AS bytes_in,
               CAST(SUM(bytes_out) AS BIGINT) AS bytes_out
        FROM extracted GROUP BY engine, parse_status
    """)


def incremental_extract_stats_sql() -> str:
    """Per-partition lineage stats of the extraction output.  The Ray
    side runs base-at-checkpoint + delta-merge; the incremental contract
    is that it lands exactly where a FULL run lands, so the oracle is
    simply the full extraction grouped by part_id."""
    return _with_pages("""
        SELECT CAST(part_id AS INT) AS part_id,
               CAST(COUNT(*) AS BIGINT) AS rows_in,
               CAST(SUM(CASE WHEN parse_status IN ('ok', 'fallback')
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_out,
               CAST(SUM(CASE WHEN parse_status = 'rejected'
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_rejected,
               CAST(SUM(CASE WHEN parse_status = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS parse_failures,
               CAST(SUM(bytes_in) AS BIGINT) AS bytes_in,
               CAST(SUM(bytes_out) AS BIGINT) AS bytes_out
        FROM extracted GROUP BY part_id
    """)


_MEDIA_HEXP_CTE = """
        WITH s AS (
          SELECT doc_id, coalesce(text, '') AS t, doc_id % 3 AS kind,
                 (doc_id % 640) + 1 AS w, (doc_id % 480) + 1 AS h,
                 (doc_id % 3) + 1 AS nf
          FROM documents
        ), p AS (
          SELECT doc_id, kind, w, h, nf,
            lower(CASE kind
              WHEN 0 THEN '89504e470d0a1a0a' || '0000000d' || '49484452' ||
                   printf('%08x', w) || printf('%08x', h) ||
                   '0802000000' || '00000000' || hex(encode(t))
              WHEN 1 THEN '474946383961' ||
                   printf('%02x%02x', w % 256, w // 256) ||
                   printf('%02x%02x', h % 256, h // 256) || '000000' ||
                   repeat('21f9040000000000', nf) || hex(encode(t)) || '3b'
              ELSE 'ffd8' || 'ffe000104a46494600010100000100010000' ||
                   'ffc00011' || '08' || printf('%04x', h) || printf('%04x', w) ||
                   '03012200021101031101' || hex(encode(t)) || 'ffd9'
            END) AS hexp
          FROM s
        )"""


def media_features_sql() -> str:
    # The derived media corpus (stages/multimodal.synth_media_payload) is
    # rebuilt HEX-FOR-HEX: real PNG/GIF/JPEG headers + the doc text as
    # body, so n_bytes and content_hash (md5 over the lowercase payload
    # hex — DuckDB md5 cannot take raw BLOBs) verify the actual bytes the
    # Ray-side header parser consumed, and dims/frames verify the parse.
    return _MEDIA_HEXP_CTE + """
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CAST(length(hexp) // 2 AS BIGINT) AS n_bytes,
               md5(hexp) AS content_hash,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(CASE WHEN kind = 1 THEN nf ELSE 1 END AS INT) AS n_frames,
               'ok' AS decode_status
        FROM p
    """


def training_corpus_sql() -> str:
    # pipelines/training_corpus.py: fingerprint → keep-first dedup →
    # quality gate; non-extracted rows get per-url salted fingerprints
    return _with_pages("""
        , scored AS (
          SELECT url, warc_ts,
            CASE WHEN parse_status IN ('ok', 'fallback')
                 THEN md5(extracted_text)
                 ELSE 'skip:' || url END AS fingerprint,
            parse_status IN ('ok', 'fallback') AS extracted_ok,
            CAST(length(extracted_text) AS BIGINT) AS n_chars,
            CAST(len(regexp_extract_all(extracted_text, '\\S+')) AS BIGINT) AS n_tokens,
            (length(extracted_text) >= 50
             AND len(regexp_extract_all(extracted_text, '\\S+')) >= 10
             AND len(regexp_extract_all(extracted_text,
                     '\\b(the|and|of|a|to)\\b')) >= 1) AS quality_ok
          FROM extracted
        )
        SELECT url, warc_ts, fingerprint, n_chars, n_tokens, quality_ok,
               (extracted_ok AND quality_ok AND row_number() OVER (
                  PARTITION BY fingerprint, (extracted_ok AND quality_ok)
                  ORDER BY url, warc_ts) = 1) AS kept
        FROM scored
    """)


def qc_rollup_sql() -> str:
    # stages/qc.py qc_pages_rollup: NO gate split (every row extracted),
    # token-set overlap extracted vs raw layer, recount statuses
    return _with_pages("""
        , qc AS (
          SELECT e.url, e.warc_ts,
            coalesce(b.ext, '') AS ext, e.rawtext
          FROM (SELECT url, warc_ts, rawtext FROM gated) e
          LEFT JOIN (
            SELECT url, warc_ts, string_agg(btext, chr(10) ORDER BY ord) AS ext
            FROM qblocks GROUP BY url, warc_ts
          ) b ON b.url = e.url AND b.warc_ts = e.warc_ts
        ),
        verdicts AS (
          SELECT CASE
            WHEN ext = '' OR rawtext = '' THEN 'NOT_FOUND'
            WHEN len(list_intersect(
                   list_distinct(list_filter(string_split_regex(lower(ext), '\\s+'), x -> x <> '')),
                   list_distinct(list_filter(string_split_regex(lower(rawtext), '\\s+'), x -> x <> ''))
                 )) * 100
                 // len(list_distinct(list_filter(string_split_regex(lower(ext), '\\s+'), x -> x <> '')))
                 >= 70
            THEN 'MATCH' ELSE 'MISMATCH' END AS qc_status
          FROM qc
        )
        SELECT qc_status, COUNT(*) AS n FROM verdicts GROUP BY qc_status
    """)


def filter_stats_sql() -> str:
    skip = _SKIP_PRED_T.format(c="btext")
    kw = " OR ".join(f"lower(btext) LIKE '%{k}%'" for k in _KEYWORDS)
    return _with_pages(f"""
        , marked AS (
          SELECT url, warc_ts, block_idx,
            (regexp_matches(btext, '{_DOLLAR_RE}') AND NOT ({skip})) AS is_d,
            ({kw}) AS is_k
          FROM blocks
        ),
        kept AS (
          SELECT url, warc_ts, block_idx, is_d, is_k,
            (coalesce(lag(is_d OR is_k) OVER wbl, false)
             OR (is_d OR is_k)
             OR coalesce(lead(is_d OR is_k) OVER wbl, false)) AS in_window
          FROM marked
          WINDOW wbl AS (PARTITION BY url, warc_ts ORDER BY block_idx)
        ),
        agg AS (
          SELECT url, warc_ts, COUNT(*) AS n_blocks,
            CAST(count(*) FILTER (WHERE is_d) AS BIGINT) AS n_dollar_blocks,
            CAST(count(*) FILTER (WHERE is_k) AS BIGINT) AS n_keyword_blocks,
            CAST(least(25, count(*) FILTER (WHERE in_window)) AS BIGINT) AS n_kept_blocks
          FROM kept GROUP BY url, warc_ts
        )
        SELECT e.url, CAST(coalesce(a.n_blocks, 0) AS BIGINT) AS n_blocks,
               coalesce(a.n_dollar_blocks, 0) AS n_dollar_blocks,
               coalesce(a.n_keyword_blocks, 0) AS n_keyword_blocks,
               coalesce(a.n_kept_blocks, 0) AS n_kept_blocks,
               CAST(CASE WHEN coalesce(a.n_blocks, 0) = 0 THEN 0
                    ELSE (a.n_blocks - a.n_kept_blocks) * 100 // a.n_blocks
               END AS BIGINT) AS reduction_pct
        FROM extracted e
        LEFT JOIN agg a ON a.url = e.url AND a.warc_ts = e.warc_ts
    """)


def section_windows_sql() -> str:
    words_pred = " OR ".join(
        f"lower(btext) LIKE '%{wd}%'" for wd in ("building", "coverage", "property")
    )
    return _with_pages(f"""
        , hits AS (
          SELECT url, warc_ts, min(block_idx) AS sec
          FROM blocks
          WHERE upper(btext) LIKE '%PROPERTY SECTION%' AND ({words_pred})
          GROUP BY url, warc_ts
        )
        SELECT e.url, (h.sec IS NOT NULL) AS has_section,
               CAST(coalesce(h.sec, -1) AS BIGINT) AS section_block_id
        FROM extracted e
        LEFT JOIN hits h ON h.url = e.url AND h.warc_ts = e.warc_ts
    """)


def heading_windows_sql(num_blocks: int = 4) -> str:
    return _with_pages(f"""
        , nb AS (
          SELECT url, warc_ts, COUNT(*) AS n FROM blocks GROUP BY url, warc_ts
        ),
        hits AS (
          SELECT url, warc_ts, min(block_idx) AS sec
          FROM blocks WHERE upper(btext) LIKE '%PROPERTY SECTION%'
          GROUP BY url, warc_ts
        ),
        win AS (
          SELECT b.url, b.warc_ts,
                 CAST(sum(length(b.btext)) AS BIGINT) AS wchars
          FROM blocks b JOIN hits h
            ON h.url = b.url AND h.warc_ts = b.warc_ts
          WHERE b.block_idx >= h.sec AND b.block_idx < h.sec + {num_blocks}
          GROUP BY b.url, b.warc_ts
        )
        SELECT e.url,
          CASE WHEN h.sec IS NULL THEN 'error' ELSE 'success' END AS status,
          CAST(coalesce(h.sec, -1) AS BIGINT) AS start_block,
          CAST(CASE WHEN h.sec IS NULL THEN -1
               ELSE least(nb.n, h.sec + {num_blocks}) - 1 END AS BIGINT) AS end_block,
          CAST({num_blocks} AS BIGINT) AS blocks_requested,
          CAST(CASE WHEN h.sec IS NULL THEN 0
               ELSE least(nb.n, h.sec + {num_blocks}) - h.sec END AS BIGINT)
            AS blocks_extracted,
          CASE WHEN h.sec IS NULL THEN ''
               WHEN least(nb.n, h.sec + {num_blocks}) - h.sec = {num_blocks} THEN ''
               ELSE 'requested {num_blocks} blocks but only '
                    || (least(nb.n, h.sec + {num_blocks}) - h.sec)
                    || ' available' END AS warning,
          coalesce(w.wchars, 0) AS window_chars
        FROM extracted e
        LEFT JOIN nb ON nb.url = e.url AND nb.warc_ts = e.warc_ts
        LEFT JOIN hits h ON h.url = e.url AND h.warc_ts = e.warc_ts
        LEFT JOIN win w ON w.url = e.url AND w.warc_ts = e.warc_ts
    """)


def declarations_head_sql(head_blocks: int = 8) -> str:
    skip = _SKIP_PRED_T.format(c="btext")
    return _with_pages(f"""
        , head AS (
          SELECT url, warc_ts,
            CAST(COUNT(*) AS BIGINT) AS n_head_blocks,
            bool_or(regexp_matches(btext, '{_DOLLAR_RE}') AND NOT ({skip}))
              AS head_has_dollar,
            CAST(sum(length(btext)) AS BIGINT) AS head_chars
          FROM blocks WHERE block_idx < {head_blocks}
          GROUP BY url, warc_ts
        )
        SELECT e.url, coalesce(h.n_head_blocks, 0) AS n_head_blocks,
               coalesce(h.head_has_dollar, false) AS head_has_dollar,
               coalesce(h.head_chars, 0) AS head_chars
        FROM extracted e
        LEFT JOIN head h ON h.url = e.url AND h.warc_ts = e.warc_ts
    """)


def dual_engine_compare_sql() -> str:
    # tagstrip chain == stages/tagstrip.py (same regex strings)
    strip = "html"
    for tag in ("script", "style", "noscript", "template"):
        strip = (f"regexp_replace({strip}, "
                 f"'(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>', ' ', 'g')")
    strip = f"regexp_replace({strip}, '(?s)<!--.*?-->', ' ', 'g')"
    strip = f"regexp_replace({strip}, '<[^>]*>', ' ', 'g')"
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "''"), ("&apos;", "''"), ("&nbsp;", " "),
                     ("&amp;", "&")):
        strip = f"replace({strip}, '{ent}', '{rep}')"
    strip = f"trim(regexp_replace({strip}, '\\s+', ' ', 'g'))"
    return _with_pages(f"""
        , dom AS (
          SELECT g.url, g.warc_ts,
            CASE WHEN g.is_pdf THEN '' ELSE coalesce(b.ext, '') END AS dom_text,
            {strip} AS striptext
          FROM gated g
          LEFT JOIN (
            SELECT url, warc_ts, string_agg(btext, chr(10) ORDER BY ord) AS ext
            FROM qblocks GROUP BY url, warc_ts
          ) b ON b.url = g.url AND b.warc_ts = g.warc_ts
        )
        SELECT url, CAST(length(dom_text) AS BIGINT) AS dom_len,
               CAST(length(striptext) AS BIGINT) AS strip_len,
               CAST(CASE WHEN dom_text = '' THEN 0 ELSE
                 len(list_intersect(
                   list_distinct(list_filter(string_split_regex(lower(dom_text), '\\s+'), x -> x <> '')),
                   list_distinct(list_filter(string_split_regex(lower(striptext), '\\s+'), x -> x <> ''))))
                 * 100 // len(list_distinct(list_filter(
                     string_split_regex(lower(dom_text), '\\s+'), x -> x <> '')))
               END AS BIGINT) AS token_agree_pct
        FROM dom
    """)


def dual_engine_bleu_sql() -> str:
    """Corpus BLEU components (clipped n-gram precision, n=1,2) of the
    tag-strip candidate against the DOM-walk reference, per lang.  The
    tagstrip chain is the dual_engine_compare one; clipped matches are
    per-doc SUM(least(cand_count, ref_count)) over the doc's distinct
    grams; precisions are floor basis points, matching the Ray side's
    integer arithmetic exactly."""
    strip = "html"
    for tag in ("script", "style", "noscript", "template"):
        strip = (f"regexp_replace({strip}, "
                 f"'(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>', ' ', 'g')")
    strip = f"regexp_replace({strip}, '(?s)<!--.*?-->', ' ', 'g')"
    strip = f"regexp_replace({strip}, '<[^>]*>', ' ', 'g')"
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "''"), ("&apos;", "''"), ("&nbsp;", " "),
                     ("&amp;", "&")):
        strip = f"replace({strip}, '{ent}', '{rep}')"
    strip = f"trim(regexp_replace({strip}, '\\s+', ' ', 'g'))"
    return _with_pages(f"""
        , dom AS (
          SELECT g.url, g.warc_ts, g.lang,
            CASE WHEN g.is_pdf THEN '' ELSE coalesce(b.ext, '') END AS dom_text,
            {strip} AS striptext
          FROM gated g
          LEFT JOIN (
            SELECT url, warc_ts, string_agg(btext, chr(10) ORDER BY ord) AS ext
            FROM qblocks GROUP BY url, warc_ts
          ) b ON b.url = g.url AND b.warc_ts = g.warc_ts
        ),
        db AS MATERIALIZED (
          SELECT url, warc_ts, lang, cand, ref,
            list_transform(range(1, len(cand)),
                           i -> cand[i] || ' ' || cand[i + 1]) AS candb,
            list_transform(range(1, len(ref)),
                           i -> ref[i] || ' ' || ref[i + 1]) AS refb
          FROM (
            SELECT url, warc_ts, lang,
              list_filter(string_split_regex(lower(striptext), '\\s+'),
                          x -> x <> '') AS cand,
              list_filter(string_split_regex(lower(dom_text), '\\s+'),
                          x -> x <> '') AS ref
            FROM dom WHERE dom_text <> ''
          )
        ),
        c1 AS (SELECT url, warc_ts, u.x AS gr, count(*) AS c
               FROM db, unnest(cand) AS u(x) GROUP BY ALL),
        r1 AS (SELECT url, warc_ts, u.x AS gr, count(*) AS c
               FROM db, unnest(ref) AS u(x) GROUP BY ALL),
        m1 AS (
          SELECT c1.url, c1.warc_ts,
                 SUM(least(c1.c, coalesce(r1.c, 0))) AS m
          FROM c1 LEFT JOIN r1 ON r1.url = c1.url
            AND r1.warc_ts = c1.warc_ts AND r1.gr = c1.gr
          GROUP BY c1.url, c1.warc_ts
        ),
        c2 AS (SELECT url, warc_ts, u.x AS gr, count(*) AS c
               FROM db, unnest(candb) AS u(x) GROUP BY ALL),
        r2 AS (SELECT url, warc_ts, u.x AS gr, count(*) AS c
               FROM db, unnest(refb) AS u(x) GROUP BY ALL),
        m2 AS (
          SELECT c2.url, c2.warc_ts,
                 SUM(least(c2.c, coalesce(r2.c, 0))) AS m
          FROM c2 LEFT JOIN r2 ON r2.url = c2.url
            AND r2.warc_ts = c2.warc_ts AND r2.gr = c2.gr
          GROUP BY c2.url, c2.warc_ts
        ),
        per AS (
          SELECT db.lang, len(db.cand) AS nc, len(db.ref) AS nr,
                 len(db.candb) AS ncb,
                 coalesce(m1.m, 0) AS m1v, coalesce(m2.m, 0) AS m2v
          FROM db
          LEFT JOIN m1 ON m1.url = db.url AND m1.warc_ts = db.warc_ts
          LEFT JOIN m2 ON m2.url = db.url AND m2.warc_ts = db.warc_ts
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nc) AS BIGINT) AS cand_tokens,
               CAST(SUM(nr) AS BIGINT) AS ref_tokens,
               CAST(SUM(m1v) AS BIGINT) AS match_1,
               CAST(SUM(ncb) AS BIGINT) AS cand_bigrams,
               CAST(SUM(m2v) AS BIGINT) AS match_2,
               CAST(CASE WHEN SUM(nc) = 0 THEN 0
                    ELSE SUM(m1v) * 10000 // SUM(nc) END AS BIGINT) AS p1_bp,
               CAST(CASE WHEN SUM(ncb) = 0 THEN 0
                    ELSE SUM(m2v) * 10000 // SUM(ncb) END AS BIGINT) AS p2_bp
        FROM per GROUP BY lang
    """)


def audio_features_sql() -> str:
    # The derived WAV corpus (stages/multimodal.synth_audio_payload) is
    # rebuilt HEX-FOR-HEX (RIFF/WAVE + PCM fmt chunk + the doc text as the
    # data chunk), so content_hash verifies the exact bytes the Ray-side
    # RIFF walker consumed and the rate/channels/bits/sample columns
    # verify the parse.  Little-endian fields via printf byte swizzles.
    le16 = "printf('%02x%02x', {v} % 256, ({v} // 256) % 256)"
    le32 = ("printf('%02x%02x%02x%02x', {v} % 256, ({v} // 256) % 256, "
            "({v} // 65536) % 256, ({v} // 16777216) % 256)")
    return f"""
        WITH s AS (
          SELECT doc_id, coalesce(text, '') AS t,
                 8000 * (doc_id % 4 + 1) AS sr,
                 doc_id % 2 + 1 AS ch,
                 (doc_id % 2 + 1) * 8 AS bits
          FROM documents
        ), d AS (
          SELECT doc_id, t, sr, ch, bits,
                 ch * bits // 8 AS blk,
                 sr * (ch * bits // 8) AS byr,
                 strlen(t) AS dsz
          FROM s
        ), p AS (
          SELECT doc_id, sr, ch, bits, blk, dsz,
            lower('52494646' || {le32.format(v='(36 + dsz)')} || '57415645'
              || '666d7420' || '10000000' || '0100'
              || {le16.format(v='ch')} || {le32.format(v='sr')}
              || {le32.format(v='byr')} || {le16.format(v='blk')}
              || {le16.format(v='bits')}
              || '64617461' || {le32.format(v='dsz')} || hex(encode(t))
            ) AS hexp
          FROM d
        )
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CAST(length(hexp) // 2 AS BIGINT) AS n_bytes,
               md5(hexp) AS content_hash,
               CAST(sr AS INT) AS sample_rate,
               CAST(ch AS INT) AS n_channels,
               CAST(bits AS INT) AS bits_per_sample,
               CAST(dsz // blk AS BIGINT) AS n_samples,
               CAST((dsz // blk) * 1000 // sr AS BIGINT) AS duration_ms,
               'ok' AS decode_status
        FROM p
    """


def video_features_sql() -> str:
    # The derived MP4 corpus (stages/multimodal.synth_video_payload) is
    # rebuilt HEX-FOR-HEX (ftyp + moov(mvhd v0 + empty traks) + mdat with
    # the doc text), so content_hash pins the exact bytes the box walker
    # consumed; big-endian fields via printf('%08x').
    return """
        WITH s AS (
          SELECT doc_id, coalesce(text, '') AS t,
                 600 * (doc_id % 3 + 1) AS ts,
                 (doc_id % 1000 + 1) * 600 AS dur,
                 doc_id % 3 + 1 AS tr
          FROM documents
        ), p AS (
          SELECT doc_id, ts, dur, tr,
            lower('00000010' || '66747970' || '69736f6d' || '00000200'
              || printf('%08x', 36 + 8 * tr) || '6d6f6f76'
              || '0000001c' || '6d766864'
              || '00000000' || '00000000' || '00000000'
              || printf('%08x', ts) || printf('%08x', dur)
              || repeat('000000087472616b', tr)
              || printf('%08x', 8 + strlen(t)) || '6d646174'
              || hex(encode(t))
            ) AS hexp
          FROM s
        )
        SELECT CAST(doc_id AS VARCHAR) AS media_id,
               CAST(length(hexp) // 2 AS BIGINT) AS n_bytes,
               md5(hexp) AS content_hash,
               CAST(ts AS INT) AS timescale,
               CAST(dur AS BIGINT) AS duration_ticks,
               CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
               CAST(tr AS INT) AS n_tracks,
               'ok' AS decode_status
        FROM p
    """


def span_audit_sql() -> str:
    # Recomputes the span-tiling arithmetic from the block reconstruction:
    # per page, n_spans = kept blocks, span_chars = sum of block text
    # lengths, text_chars = length of the '\n'-joined extraction, and
    # gapless iff span_chars + (n_spans - 1) separators == text_chars.
    # The Ray side checks the STRICTER positional tiling of the actual
    # span offsets; equality of the two only holds when offsets are right.
    return _with_pages("""
        , sc AS (
          SELECT url, warc_ts, CAST(SUM(length(btext)) AS BIGINT) AS span_chars
          FROM blocks GROUP BY url, warc_ts
        )
        SELECT e.url,
               CAST(e.n_blocks AS BIGINT) AS n_spans,
               CAST(coalesce(sc.span_chars, 0) AS BIGINT) AS span_chars,
               CAST(strlen(e.extracted_text) AS BIGINT) AS text_chars,
               CAST(CASE WHEN coalesce(sc.span_chars, 0)
                              + greatest(0, e.n_blocks - 1)
                              = strlen(e.extracted_text)
                    THEN 1 ELSE 0 END AS BIGINT) AS gapless
        FROM extracted e
        LEFT JOIN sc ON sc.url = e.url AND sc.warc_ts = e.warc_ts
    """)


def media_exact_dedup_sql() -> str:
    # Exact dedup over BINARY payloads (multimodal × dedup cross): the
    # derived media corpus with the doc_id % 23 re-crawl clone injected
    # (re-keyed media_id + 1e9), grouped by the md5-over-lowercase-hex
    # content hash — one row per distinct payload with the minimum
    # surviving key and the copy count.
    return _MEDIA_HEXP_CTE + """
        , corpus AS (
          SELECT doc_id AS media_id, hexp FROM p
          UNION ALL
          SELECT doc_id + 1000000000, hexp FROM p WHERE doc_id % 23 = 0
        )
        SELECT md5(hexp) AS content_hash,
               CAST(min(media_id) AS VARCHAR) AS keep_media_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM corpus GROUP BY 1
    """


def host_freshness_sql() -> str:
    # Per-host crawl rollup from the reconstructed extraction: the host of
    # 'https://{source}.example.org/doc/{id}[.pdf]' is everything between
    # '//' and the next '/'; latest capture as exact integer microseconds
    # since 2024-01-01 base epoch used by the generator.
    return _with_pages("""
        SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(count(*) FILTER (parse_status IN ('ok', 'fallback'))
                    AS BIGINT) AS n_extracted,
               CAST(max(epoch_us(warc_ts)) AS BIGINT) AS latest_ts_us
        FROM extracted
        GROUP BY 1
    """)


ROBOTS_RULES = (
    "https://src3.example.org/",
    "https://src7.example.org/doc/1",
    "https://src1.example.org/doc/",
    # deliberately OVERLAPS the previous rule (every src1 url matches
    # both): first-match-wins attribution is only testable with an
    # overlap — a last-match or order-free implementation would credit
    # this rule instead and diverge
    "https://src1.example.org/",
)


def robots_filter_sql() -> str:
    """Crawl-policy (robots-style) URL-prefix filter over the pages
    table: first-match-wins rule attribution, 'allowed' for the rest."""
    cases = "\n".join(
        f"              WHEN starts_with(url, {_lit(r)}) THEN {_lit(r)}"
        for r in ROBOTS_RULES)
    return _with_pages(f"""
        SELECT CASE
{cases}
              ELSE 'allowed' END AS rule,
               CAST(COUNT(*) AS BIGINT) AS n_pages
        FROM pages
        GROUP BY 1
    """, need_blocks=False)


def outlink_stats_sql() -> str:
    """Web-graph outlink extraction re-derived in SQL: the same
    ``href="…"`` regex over the string-reconstructed html payload
    (pages_cte builds the page byte-for-byte, hrefs included), the same
    absolute-vs-relative resolution CASE, grouped to (host, path) with
    n_pages as a distinct count over the page row key (url, warc_ts) —
    exact because each page row is unique on that pair."""
    return _with_pages("""
        , l0 AS (
          SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS phost,
                 url, warc_ts, u.href
          FROM pages,
               unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS u(href)
        ),
        l AS (
          SELECT CASE WHEN regexp_matches(href, '^https?://')
                      THEN regexp_extract(href, '^https?://([^/]+)', 1)
                      ELSE phost END AS host,
                 CASE WHEN regexp_matches(href, '^https?://')
                      THEN COALESCE(NULLIF(regexp_extract(
                             href, '^https?://[^/]+(/.*)$', 1), ''), '/')
                      ELSE href END AS path,
                 url, warc_ts
          FROM l0
        )
        SELECT host, path, CAST(COUNT(*) AS BIGINT) AS n_links,
               CAST(COUNT(DISTINCT url || '\x01' || CAST(warc_ts AS VARCHAR))
                    AS BIGINT) AS n_pages
        FROM l GROUP BY host, path
    """, need_blocks=False)


def anchor_text_stats_sql() -> str:
    """Anchor-text corpus re-derived in SQL: the same
    ``<a href="…">text</a>`` regex over the reconstructed html, grouped
    per verbatim anchor with an exact distinct-host count."""
    return _with_pages("""
        , la AS (
          SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
                 u.anchor
          FROM pages,
               unnest(regexp_extract_all(
                 html, '<a href="[^"]*">([^<]*)</a>', 1)) AS u(anchor)
        )
        SELECT anchor, CAST(COUNT(*) AS BIGINT) AS n_links,
               CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
        FROM la GROUP BY anchor
    """, need_blocks=False)


def url_template_stats_sql() -> str:
    """URL template mining re-derived in SQL: digit runs in the url PATH
    fold to 'N'; one row per (host, template) with page-row counts —
    COUNT(*) because re-crawl duplicate rows are separate frontier
    entries (the crawl-rule view of the corpus)."""
    return _with_pages("""
        SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
               regexp_replace(regexp_replace(url, '^[a-z]+://[^/]+', ''),
                              '[0-9]+', 'N', 'g') AS template,
               CAST(COUNT(*) AS BIGINT) AS n_pages
        FROM pages
        GROUP BY 1, 2
    """, need_blocks=False)


def zipf_host_rollup_sql() -> str:
    """Per-host frontier rollup over the ZIPF-SKEWED corpus variant
    (host-00 owns ~50% of all pages): page rows, pdf rows, and total
    payload bytes (strlen — bytes, matching the engine's len(html))."""
    return _with_pages("""
        SELECT regexp_extract(url, '^[a-z]+://([^.]+)\\.', 1) AS host,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(COUNT(*) FILTER (is_pdf) AS BIGINT) AS n_pdf,
               CAST(SUM(strlen(html)) AS BIGINT) AS bytes_in
        FROM pages
        GROUP BY 1
    """, need_blocks=False, zipf_hosts=True)


def zipf_partition_balance_sql(num_parts: int = 16) -> str:
    """Rows per url-hash partition over the ZIPF-SKEWED frontier — the
    north rule's 'repartition by url-hash to defuse host-level skew',
    verified: host-00 owns ~half the corpus, yet md5_number_lower(url)
    % P spreads it near-uniformly."""
    return _with_pages(f"""
        SELECT CAST(md5_number_lower(url) % {num_parts} AS INT) AS part_id,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(COUNT(DISTINCT regexp_extract(
                      url, '^[a-z]+://([^.]+)\\.', 1)) AS BIGINT) AS n_hosts
        FROM pages
        GROUP BY 1
    """, need_blocks=False, zipf_hosts=True)


def crawl_schedule_plan_sql() -> str:
    """Politeness-wave assignment over the ZIPF-SKEWED frontier: wave =
    0-based row_number per host ordered by (warc_ts, url); the per-host
    checksum Σ wave·(epoch_us mod 1000003) pins the complete assignment."""
    return _with_pages("""
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(MAX(wave) AS BIGINT) AS last_wave,
               CAST(SUM(wave * ts_mod) AS BIGINT) AS wave_ts_checksum
        FROM (
          SELECT regexp_extract(url, '^[a-z]+://([^.]+)\\.', 1) AS host,
                 row_number() OVER (
                   PARTITION BY regexp_extract(url, '^[a-z]+://([^.]+)\\.', 1)
                   ORDER BY warc_ts, url) - 1 AS wave,
                 CAST(epoch_us(warc_ts) % 1000003 AS BIGINT) AS ts_mod
          FROM pages
        ) GROUP BY host
    """, need_blocks=False, zipf_hosts=True)


def rendezvous_shard_plan_sql(n_shards: int = 16) -> str:
    """HRW shard plan re-derived in SQL: per distinct host, weight =
    md5_number_lower(host || '|' || s); assignment = row_number ORDER BY
    weight DESC, s (argmax ties to lowest s); movers = hosts whose
    argmax under n_shards+1 differs from the n_shards assignment."""
    return _with_pages(f"""
        , hosts AS (
          SELECT DISTINCT coalesce(regexp_extract(
                   url, '^[a-z]+://([^.]+)\\.', 1), '') AS h
          FROM pages
        ),
        hw AS MATERIALIZED (
          SELECT h, s.s AS s,
                 md5_number_lower(h || '|' || CAST(s.s AS VARCHAR)) AS wgt
          FROM hosts, unnest(range(0, {n_shards + 1})) AS s(s)
        ),
        a_old AS (
          SELECT h, s AS shard FROM (
            SELECT h, s, row_number() OVER (PARTITION BY h
                     ORDER BY wgt DESC, s) AS rn
            FROM hw WHERE s < {n_shards}
          ) WHERE rn = 1
        ),
        a_new AS (
          SELECT h, s AS shard FROM (
            SELECT h, s, row_number() OVER (PARTITION BY h
                     ORDER BY wgt DESC, s) AS rn
            FROM hw
          ) WHERE rn = 1
        )
        SELECT CAST(a_old.shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_hosts,
               CAST(COUNT(*) FILTER (a_old.shard <> a_new.shard)
                    AS BIGINT) AS n_moved
        FROM a_old JOIN a_new USING (h)
        GROUP BY a_old.shard
    """, need_blocks=False)
