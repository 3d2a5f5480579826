"""Deterministic synthetic page corpus (FIXTURES.md §1-§3).

Two generators, both pure functions of their inputs (fixed seed arithmetic,
no wall clock, no RNG state shared across rows — every row derives from its
index), so the same call always produces byte-identical tables:

* :func:`fixture_pages` — small table covering every heuristic branch of
  the engine (FIXTURES.md §2 families) for golden tests;
* :func:`pages_from_documents` — wraps the driver's ``documents.parquet``
  rows into Common-Crawl-style pages for entry()/bench (the documents table
  is the only allowed external input — TESTDATA.md).

The html payload embeds deterministic boilerplate (nav/footer/link-farm)
around the real content so the extractor has actual work to do, and a
deterministic subset of rows carries PDF-like char-box payloads instead.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_ray.schema import PAGES_SCHEMA

_EPOCH = _dt.datetime(2024, 1, 1)

# bump when the generated corpus changes byte-wise (cache directories under
# /tmp embed this so stale corpora from older generators are never reused)
CORPUS_VERSION = 2

_NAV = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>'
    '<li><a href="/contact">Contact</a></li></ul></nav>'
)
_FOOTER = (
    '<footer><p><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> '
    '<a href="/sitemap">Sitemap</a> © example</p></footer>'
)
_LINKFARM = (
    '<div class="links">'
    + "".join(f'<a href="/tag/{i}">tag {i}</a> ' for i in range(12))
    + "</div>"
)


def _chunk_words(text: str, k: int) -> list[str]:
    words = text.split()
    return [" ".join(words[i : i + k]) for i in range(0, len(words), k)] or [""]


def make_html(doc_id: int, text: str) -> bytes:
    """Deterministic HTML page around the document text."""
    paras = _chunk_words(text, 12)
    body = [f"<h1>Document {doc_id}</h1>"]
    for j, p in enumerate(paras):
        body.append(f"<p>{p}</p>")
        if j == 1 and doc_id % 7 == 0:
            rows = "".join(
                f"<tr><td>row {r}</td><td>${(doc_id % 9 + 1) * 100 + r}</td></tr>"
                for r in range(3)
            )
            body.append(f"<table>{rows}</table>")
    if doc_id % 13 == 0:  # malformed family: unclosed tags, stray '<'
        body.append("<p>trailing < bracket <b>unclosed")
    html = (
        "<html><head><title>doc</title><script>var x=1;</script>"
        "<style>p{color:red}</style></head><body>"
        + _NAV
        + "<main>"
        + "".join(body)
        + "</main>"
        + _LINKFARM
        + _FOOTER
        + "</body></html>"
    )
    return html.encode("utf-8")


def make_charbox(doc_id: int, text: str, two_column: bool = False) -> bytes:
    """Deterministic PDF-like char-box payload (FIXTURES.md §3)."""
    text = text[:400]
    lines = [text[i : i + 40] for i in range(0, len(text), 40)] or [""]
    chars = []
    for li, line in enumerate(lines):
        if two_column and li % 2 == 1:
            x0, y = 400.0, 720.0 - (li // 2) * 12.0
        elif two_column:
            x0, y = 72.0, 720.0 - (li // 2) * 12.0
        else:
            x0, y = 72.0, 720.0 - li * 12.0
        for ci, c in enumerate(line):
            if c == " ":
                continue
            chars.append({"c": c, "x": x0 + ci * 6.0, "y": y, "w": 5.0, "h": 10.0})
    # footer page number (stripped by the layout parser)
    for ci, c in enumerate(str(doc_id % 50 + 1)):
        chars.append({"c": c, "x": 300.0 + ci * 6.0, "y": 30.0, "w": 5.0, "h": 10.0})
    # compact separators + raw UTF-8: byte-for-byte reconstructible with
    # DuckDB string concat + to_json, so SQL oracles can rebuild payloads
    return json.dumps(
        {"pages": [{"chars": chars}]}, sort_keys=True,
        separators=(",", ":"), ensure_ascii=False,
    ).encode()


def _raw_text_layer(text: str, doc_id: int) -> str:
    """The input 'text' column: tag-stripped layer with whitespace artifacts
    (the second-OCR-engine analogue, FIXTURES.md §1)."""
    words = text.split()
    out = []
    for i, w in enumerate(words):
        out.append(w)
        out.append("  " if (i + doc_id) % 11 == 0 else " ")
    return "".join(out).strip()


def pages_from_documents(sf_dir: str, reps: int = 1) -> pa.Table:
    """documents.parquet → pages table (url, warc_ts, html, text, lang).

    ``reps`` replicates the corpus with distinct urls (?rep=N) to scale the
    benchmark load deterministically without external data.  One code path:
    the per-replica generator (shared with materialize_pages_distributed),
    concatenated — serial and distributed corpora are identical by
    construction."""
    return pa.concat_tables(
        [_single_rep_table(sf_dir, rep) for rep in range(reps)]
    ).combine_chunks()


def materialize_pages_parquet(sf_dir: str, out_dir: str, rows_per_file: int = 8192,
                              reps: int = 1) -> str:
    """Write the derived pages table to ``out_dir`` (cached by marker file).

    Multiple files so ray.data can parallelize the read.  Returns out_dir.
    """
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = pages_from_documents(sf_dir, reps=reps)
    nfiles = max(1, (len(table) + rows_per_file - 1) // rows_per_file)
    for i in range(nfiles):
        pq.write_table(
            table.slice(i * rows_per_file, rows_per_file),
            os.path.join(out_dir, f"pages-{i:05d}.parquet"),
        )
    with open(marker, "w") as f:
        f.write(f"rows={len(table)} files={nfiles}\n")
    return out_dir


# ---------------------------------------------------------------------------
# fixture families (FIXTURES.md §2) — one small deterministic table
# ---------------------------------------------------------------------------

def fixture_pages() -> pa.Table:
    """Every heuristic-branch family as rows; deterministic."""
    rows: list[tuple[str, int, bytes, str, str]] = []  # (url, sec, html, text, lang)

    def add(name: str, html: bytes, text: str, lang: str = "en") -> None:
        rows.append((f"https://fixtures.example.org/{name}", len(rows), html, text, lang))

    content = (
        "The quick brown fox jumps over the lazy dog near the river bank "
        "while the miller watches the turning wheel with patient eyes."
    )
    add("clean_article", make_html(1, content), content)
    add("boilerplate_heavy", (
        "<html><body>" + _NAV + _LINKFARM + _LINKFARM
        + "<p>tiny</p>" + _FOOTER + "</body></html>").encode(), "tiny")
    add("table_page", (
        "<html><body><main><p>" + content + "</p><table>"
        "<tr><th>coverage</th><th>limit</th></tr>"
        "<tr><td>Building</td><td>$1,320,000</td></tr>"
        "<tr><td>Contents</td><td>$250,000</td></tr>"
        "</table></main></body></html>").encode(), content)
    for amt in ("$199", "$200", "$201", "$1,320,000", "$0,250", "$,200"):
        add(f"dollar_{amt.replace('$','').replace(',','_')}",
            make_html(2, f"coverage limit listed at {amt} for the building {content}"),
            f"coverage limit listed at {amt} for the building {content}")
    add("skip_pattern",
        make_html(3, "EXAMPLE calculation page showing $5,000 " + content),
        "EXAMPLE calculation page showing $5,000 " + content)
    add("keyword_page",
        make_html(4, "the mortgage holder and loss payee are listed " + content),
        "the mortgage holder and loss payee are listed " + content)
    add("keyword_near_miss",
        make_html(5, "the mortgage rates and losses paid were high " + content),
        "the mortgage rates and losses paid were high " + content)
    # gibberish sub-branches (policy_extract.py:123-153)
    add("gib_short", make_html(6, "hi"), "hi")
    add("gib_whitespace", make_html(7, content), "a" + " " * 480 + "bcdefghij")
    add("gib_nonprintable", make_html(8, content), ("ab" + "\x01\x02\x03") * 100)
    add("gib_low_letters", make_html(9, content), ("12345 67890 " * 50))
    add("gib_weird", make_html(10, content), ("ab ♠♣♥♦☀☂ " * 60))
    add("wrong_lang", make_html(11, content), content, lang="zz")
    add("markup_heavy", ("<html><body>" + "<div class='x'></div>" * 400
                         + "<p>ok</p></body></html>").encode(), "ok tiny page")
    add("mixed_sections", make_html(12,
        "PROPERTY SECTION building coverage business personal property " + content),
        "PROPERTY SECTION building coverage business personal property " + content)
    add("malformed_html", b"<html><body><p>broken < page with <b>unclosed "
        b"and &badent; plus text that is long enough to keep going fine</body>",
        "broken page with unclosed and badent plus text that keeps going fine")
    add("huge_page", make_html(13, content * 400), content * 400)
    add("money_forms", make_html(14,
        'values 1,320,000 and $1,320,000 and Included and 1% and '
        'Inside $10,000 / Outside $10,000 and $0.00 ' + content),
        'values 1,320,000 and $1,320,000 and Included and 1% and '
        'Inside $10,000 / Outside $10,000 and $0.00 ' + content)
    add("pdf_single_col", make_charbox(21, content + " " + content), content, "en")
    add("pdf_two_col", make_charbox(22, content + " " + content, two_column=True), content, "en")
    add("pdf_bad_json", b'{"pages": [{"chars": [', content, "en")

    # duplicate url pair (keep-first dedup, FIXTURES.md §1)
    rows.append(("https://fixtures.example.org/clean_article", 9000,
                 make_html(1, content), content, "en"))

    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [_EPOCH + _dt.timedelta(seconds=r[1]) for r in rows], pa.timestamp("us")
            ),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "lang": pa.array([r[4] for r in rows], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def materialize_pages_distributed(sf_dir: str, out_dir: str,
                                  rows_per_file: int = 512, reps: int = 1) -> str:
    """Parallel corpus generation: one Ray task per replica, each writing
    its own shard files (cached by marker).  Requires an active Ray session
    (bench/CLI); content is byte-identical to the serial generator."""
    import ray

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def gen_rep(rep: int) -> int:
        table = _single_rep_table(sf_dir, rep)
        nfiles = max(1, (len(table) + rows_per_file - 1) // rows_per_file)
        for j in range(nfiles):
            pq.write_table(
                table.slice(j * rows_per_file, rows_per_file),
                os.path.join(out_dir, f"pages-{rep:04d}-{j:04d}.parquet"),
            )
        return len(table)

    totals = ray.get([gen_rep.remote(r) for r in range(reps)])
    with open(marker, "w") as f:
        f.write(f"rows={sum(totals)} reps={reps}\n")
    return out_dir


def _zipf_host(doc_id: int) -> str:
    """Deterministic Zipf-like host assignment (FIXTURES.md §1 skew knob):
    host k gets ~2^-(k+1) of the corpus — host-0 ~50%, host-1 ~25%, … — so
    a few hosts dominate, exercising skew handling downstream."""
    k = 0
    d = doc_id + 1
    while d % 2 == 0 and k < 12:
        d //= 2
        k += 1
    return f"host-{k:02d}"


def _single_rep_table(sf_dir: str, rep: int, zipf_hosts: bool = False) -> pa.Table:
    """One replica of the corpus — same rows the serial generator emits for
    this rep (factored so generation can fan out)."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()

    urls, tss, htmls, raws, out_langs = [], [], [], [], []
    suffix = "" if rep == 0 else f"?rep={rep}"
    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        host = _zipf_host(doc_id) if zipf_hosts else source
        url = f"https://{host}.example.org/doc/{doc_id}"
        ts = _EPOCH + _dt.timedelta(seconds=int(doc_id), days=rep)
        if doc_id % 10 == 0:
            url += ".pdf"
            html = make_charbox(doc_id, text, two_column=(doc_id % 20 == 0))
        else:
            html = make_html(doc_id, text)
        url += suffix
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        raws.append(_raw_text_layer(text, doc_id))
        out_langs.append(lang)
        if doc_id % 23 == 0:
            urls.append(url)
            tss.append(ts + _dt.timedelta(hours=1))
            htmls.append(html)
            raws.append(_raw_text_layer(text, doc_id))
            out_langs.append(lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(raws, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
