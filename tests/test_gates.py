"""Unit tests for the vectorized pre-classify gates — the reference's exact
edge cases (SURVEY.md §5 item 2)."""

import pyarrow as pa

from ocr_ray.config import DEFAULT_CONFIG
from ocr_ray.functions.gates import (
    dollar_page_mask,
    gibberish_mask,
    keyword_page_mask,
    pre_classify,
)


def _dollar(texts):
    return dollar_page_mask(pa.array(texts)).to_pylist()


def test_dollar_threshold_boundary():
    # $200 threshold is inclusive (policy_filter.py:114 amount >= min_amount)
    assert _dollar(["price $199 only"]) == [False]
    assert _dollar(["price $200 here"]) == [True]
    assert _dollar(["price $201 here"]) == [True]


def test_dollar_comma_and_zero_forms():
    assert _dollar(["limit $1,320,000"]) == [True]
    assert _dollar(["limit $0,250 odd"]) == [True]     # leading zero: 0250 -> 250
    assert _dollar(["limit $,200 odd"]) == [True]      # leading comma captured by [0-9,]+
    assert _dollar(["limit $0,150 odd"]) == [False]
    assert _dollar(["limit $ 5,000 spaced"]) == [True]  # \s* after $
    assert _dollar(["no dollars 5,000 here"]) == [False]


def test_dollar_skip_patterns():
    # pages with EXAMPLE/CALCULATION/HOW TO/SAMPLE/ILLUSTRATION are skipped
    # even with qualifying amounts (policy_filter.py:116-122, case-insensitive
    # via uppercased page text)
    assert _dollar(["EXAMPLE showing $5,000"]) == [False]
    assert _dollar(["an example showing $5,000"]) == [False]
    assert _dollar(["SAMPLE page $300"]) == [False]
    assert _dollar(["how to compute $300"]) == [False]
    assert _dollar(["the exam went well $300"]) == [True]  # not a skip word


def test_keyword_predicate():
    m = keyword_page_mask(pa.array([
        "the Mortgage Holder is listed",
        "a loss payee appears",
        "mortgage rates were high",   # near miss: no keyword
        "the LIENHOLDER name",
    ])).to_pylist()
    assert m == [True, True, False, True]


def test_gibberish_branches():
    texts = pa.array([
        "short",                                  # stripped len < 10
        "a" + " " * 480 + "bcdefghij",            # <10% non-whitespace
        ("ab" + "\x01\x02\x03") * 100,            # >30% control chars
        "12345 67890 " * 50,                      # <20% ascii letters
        "ab ♠♣♥♦☀☂ " * 60,  # >30% weird chars
        "a perfectly normal english sentence of reasonable length",
    ])
    g = gibberish_mask(texts)
    assert g["too_short"].to_pylist()[0] is True
    assert g["mostly_whitespace"].to_pylist()[1] is True
    assert g["nonprintable"].to_pylist()[2] is True
    assert g["low_ascii_letters"].to_pylist()[3] is True
    assert g["weird_chars"].to_pylist()[4] is True
    ok = [any(g[k].to_pylist()[5] for k in g)]
    assert ok == [False]


def test_pre_classify_reason_precedence_and_purity():
    t = pa.table({
        "url": ["a", "b", "c"],
        "warc_ts": pa.array([0, 1, 2], pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>", b"<p>y</p>", b"<p>z</p>"], pa.binary()),
        "text": ["a good long english text for the gate", "tiny", "good long english text again here"],
        "lang": ["en", "en", "zz"],
    })
    out = pre_classify(t, DEFAULT_CONFIG)
    assert out["is_candidate"].to_pylist() == [True, False, False]
    assert out["reject_reason"].to_pylist() == ["", "too_short", "lang"]
    # purity: re-running the gate on the same rows reproduces the decision
    out2 = pre_classify(t, DEFAULT_CONFIG)
    assert out["is_candidate"].to_pylist() == out2["is_candidate"].to_pylist()
    assert out["reject_reason"].to_pylist() == out2["reject_reason"].to_pylist()


def test_pdf_payload_exempt_from_markup_gate():
    t = pa.table({
        "url": ["p"],
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([b'{"pages": [{"chars": []}]}' + b" " * 4000], pa.binary()),
        "text": ["short but valid english sentence here"],
        "lang": ["en"],
    })
    out = pre_classify(t, DEFAULT_CONFIG)
    assert out["is_candidate"].to_pylist() == [True]
