"""Unit tests for the HTML DOM walker, tag-strip engine and PDF layout
clusterer (SURVEY.md §7 M1-M3 semantics)."""

import json

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.stages.html_extract import extract_html, walk_blocks
from ocr_ray.stages.pdf_layout import parse_pdf_payload
from ocr_ray.stages.tagstrip import tagstrip

LONG = "this sentence is long enough to clear the minimum block length rule"


def test_dom_boilerplate_sections_dropped():
    html = (
        "<html><body><nav><p>" + LONG + " nav</p></nav>"
        "<p>" + LONG + "</p>"
        "<footer><p>" + LONG + " foot</p></footer></body></html>"
    )
    r = extract_html(html)
    assert r["extracted_text"] == LONG
    assert r["n_blocks"] == 1


def test_dom_link_density_strip():
    farm = "".join(f'<a href="/{i}">link number {i} here</a> ' for i in range(10))
    html = f"<body><div>{farm}</div><p>{LONG}</p></body>"
    r = extract_html(html)
    assert r["extracted_text"] == LONG


def test_dom_min_block_chars():
    html = "<body><p>tiny</p><p>" + LONG + "</p></body>"
    r = extract_html(html)
    assert r["extracted_text"] == LONG


def test_dom_headings_kept_and_kinds():
    html = "<body><h1>Title Here</h1><p>" + LONG + "</p><ul><li>" + LONG + "</li></ul></body>"
    r = extract_html(html)
    kinds = [s["kind"] for s in r["spans"]]
    assert kinds == ["heading", "text", "list"]
    assert r["extracted_text"].startswith("Title Here\n")


def test_dom_table_rows_pipe_joined():
    html = ("<body><table><tr><th>coverage</th><th>limit</th></tr>"
            "<tr><td>Building</td><td>$1,320,000</td></tr></table></body>")
    r = extract_html(html)
    assert r["extracted_text"] == "coverage | limit\nBuilding | $1,320,000"
    assert all(s["kind"] == "table" for s in r["spans"])


def test_dom_span_invariant():
    html = "<body><h1>Head One</h1><p>" + LONG + "</p></body>"
    r = extract_html(html)
    for s in r["spans"]:
        seg = r["extracted_text"][s["start"]:s["end"]]
        assert seg and seg == seg.strip()
    assert r["extracted_text"][r["spans"][0]["start"]:r["spans"][0]["end"]] == "Head One"


def test_dom_script_style_skipped():
    html = ("<body><script>var x = 'not content at all here';</script>"
            "<style>p { color: red }</style><p>" + LONG + "</p></body>")
    assert extract_html(html)["extracted_text"] == LONG


def test_dom_malformed_lenient():
    html = "<body><p>" + LONG + " with < stray bracket <b>unclosed"
    r = extract_html(html)
    assert LONG in r["extracted_text"]


def test_dom_whitespace_collapse_deterministic():
    html = "<body><p>a  b\t\tc\n\nd " + LONG + "</p></body>"
    assert extract_html(html)["extracted_text"] == "a b c d " + LONG


def test_tagstrip_engine():
    assert tagstrip("<p>a<br>b</p>") == "a b"
    assert tagstrip("<script>x=1</script><p>keep</p>") == "keep"
    assert tagstrip("a &amp; b &lt;c&gt; &amp;lt;") == 'a & b <c> &lt;'
    assert tagstrip("<!-- note -->text") == "text"
    assert tagstrip("  spaced\t\tout  ") == "spaced out"


def _charbox(lines, x0=72.0, y0=720.0, dy=12.0):
    chars = []
    for li, line in enumerate(lines):
        for ci, c in enumerate(line):
            if c != " ":
                chars.append({"c": c, "x": x0 + ci * 6.0, "y": y0 - li * dy, "w": 5.0, "h": 10.0})
    return chars


def test_pdf_single_column_reading_order():
    payload = json.dumps({"pages": [{"chars": _charbox(["hello world", "second line"])}]}).encode()
    r = parse_pdf_payload(payload)
    assert r["extracted_text"] == "hello world second line"


def test_pdf_block_gap_split():
    chars = _charbox(["block one"]) + _charbox(["block two"], y0=600.0)
    payload = json.dumps({"pages": [{"chars": chars}]}).encode()
    r = parse_pdf_payload(payload)
    assert r["extracted_text"] == "block one\nblock two"
    assert r["n_blocks"] == 2


def test_pdf_two_columns_left_first():
    left = _charbox(["left one", "left two"], x0=72.0)
    right = _charbox(["right one", "right two"], x0=400.0)
    payload = json.dumps({"pages": [{"chars": left + right}]}).encode()
    r = parse_pdf_payload(payload)
    assert r["extracted_text"] == "left one left two\nright one right two"


def test_pdf_footer_page_number_stripped():
    chars = _charbox(["real content line"]) + _charbox(["3"], x0=300.0, y0=30.0)
    payload = json.dumps({"pages": [{"chars": chars}]}).encode()
    r = parse_pdf_payload(payload)
    assert r["extracted_text"] == "real content line"


def test_pdf_out_of_order_chars_stable():
    chars = _charbox(["stable text"])
    payload1 = json.dumps({"pages": [{"chars": chars}]}).encode()
    payload2 = json.dumps({"pages": [{"chars": list(reversed(chars))}]}).encode()
    assert parse_pdf_payload(payload1)["extracted_text"] == parse_pdf_payload(payload2)["extracted_text"]


def test_pdf_word_spacing_gap():
    # gap > pdf_space_gap between glyph boxes inserts exactly one space
    chars = [
        {"c": "a", "x": 72.0, "y": 700.0, "w": 5.0, "h": 10.0},
        {"c": "b", "x": 78.0, "y": 700.0, "w": 5.0, "h": 10.0},   # gap 1.0 -> no space
        {"c": "c", "x": 95.0, "y": 700.0, "w": 5.0, "h": 10.0},   # gap 12 -> space
    ]
    payload = json.dumps({"pages": [{"chars": chars}]}).encode()
    assert parse_pdf_payload(payload)["extracted_text"] == "ab c"


def test_boilerplate_kind_marked_in_walk():
    html = "<body><nav><p>" + LONG + "</p></nav><p>" + LONG + "</p></body>"
    kinds = [k for k, *_ in walk_blocks(html)]
    assert "boilerplate" in kinds and "text" in kinds


def test_raw_offsets_cover_block_segments():
    html = "<body><h1>Head One</h1><p>" + LONG + " &amp; tail</p></body>"
    r = extract_html(html)
    s0 = r["spans"][0]
    assert html[s0["raw_start"]:s0["raw_end"]] == "Head One"
    s1 = r["spans"][1]
    raw_seg = html[s1["raw_start"]:s1["raw_end"]]
    assert raw_seg.startswith(LONG) and raw_seg.endswith("&amp; tail")


def test_self_closed_skip_tags_do_not_swallow_content():
    # '<svg/>' must not leave the walker in skip mode; a self-closed
    # '<script src=x/>' must not CDATA-fast-forward to EOF
    html = f'<p>{LONG} one</p><svg viewBox="0 0 1 1"/><p>{LONG} two</p>'
    assert "two" in extract_html(html)["extracted_text"]
    html2 = f'<p>{LONG} one</p><script src="x"/><p>{LONG} two</p>'
    assert "two" in extract_html(html2)["extracted_text"]
    # balanced skip tags still suppress their content
    html3 = f'<svg><circle r="1"/>hidden words</svg><p>{LONG}</p>'
    out = extract_html(html3)["extracted_text"]
    assert "hidden" not in out and LONG in out
