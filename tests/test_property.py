"""Property-based tests (hypothesis): the extractor never crashes, spans
always hold their invariant, normalizers are idempotent, interval merge is
canonical — over adversarial random inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_ray.functions.textnorm import merge_page_ranges, normalize_money
from ocr_ray.stages.html_extract import extract_html
from ocr_ray.stages.tagstrip import tagstrip

html_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(html_text)
def test_extract_html_total_function(s):
    """Any unicode string parses without raising; spans slice exactly."""
    r = extract_html(s)
    txt = r["extracted_text"]
    assert isinstance(txt, str)
    for sp in r["spans"]:
        seg = txt[sp["start"]:sp["end"]]
        assert len(seg) == sp["end"] - sp["start"]
        assert seg == seg.strip()
    assert r["n_blocks"] == len(r["spans"])


@settings(max_examples=200, deadline=None)
@given(html_text)
def test_extract_html_deterministic(s):
    assert extract_html(s) == extract_html(s)


@settings(max_examples=200, deadline=None)
@given(html_text)
def test_tagstrip_total_and_tagfree(s):
    out = tagstrip(s)
    assert "  " not in out                      # whitespace collapsed
    assert out == out.strip()


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(), st.text(max_size=40),
                 # money amounts are non-negative by domain: the reference's
                 # digit-strip (llm4nano.py:69-70) discards signs, so
                 # idempotence only holds on the non-negative domain
                 st.integers(0, 10**9),
                 st.floats(allow_nan=False, allow_infinity=False,
                           min_value=0, max_value=1e12)))
def test_normalize_money_idempotent(v):
    once = normalize_money(v)
    assert normalize_money(once) == once        # fixpoint


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(1, 200), max_size=30),
       st.integers(0, 5))
def test_merge_page_ranges_canonical(pages, buffer):
    out = merge_page_ranges(pages, buffer, 1, 200)
    # sorted, disjoint, non-adjacent, within bounds
    for (s1, e1), (s2, e2) in zip(out, out[1:]):
        assert e1 + 1 < s2
    for s, e in out:
        assert 1 <= s <= e <= 200
    # every input page (buffered) is covered
    for p in pages:
        assert any(s <= p <= e for s, e in out)
    # idempotent under re-merge of covered pages
    covered = [p for s, e in out for p in range(s, e + 1)]
    assert merge_page_ranges(covered, 0, 1, 200) == out
