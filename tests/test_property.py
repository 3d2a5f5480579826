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


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(),
                 st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                         max_size=200)))
def test_repetition_columns_invariants(s):
    """Total function over arbitrary unicode (incl. None); counts obey
    distinct <= total, top <= total, and the flag matches its definition."""
    import pyarrow as pa

    from ocr_ray.functions.textstats import repetition_columns

    c = repetition_columns(pa.array([s], pa.string()))
    nl, ndl = c["n_lines"][0].as_py(), c["n_distinct_lines"][0].as_py()
    nw, ndw = c["n_words"][0].as_py(), c["n_distinct_words"][0].as_py()
    top, rep = c["top_word_n"][0].as_py(), c["repetitive"][0].as_py()
    assert 1 <= nl and 1 <= ndl <= nl          # splitting yields >= 1 line
    assert 0 <= ndw <= nw and 0 <= top <= nw
    assert rep == (1 if nw > 0 and top * 5 >= nw else 0)
    assert nw == len((s or "").lower().split())


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=30), min_size=0, max_size=8),
       st.lists(st.text(alphabet="ab ", max_size=30), min_size=0, max_size=8))
def test_contamination_subset_invariant(bench_texts, corpus_texts):
    """n_shared <= n_shingles always, and a doc whose text IS a bench doc
    with >= 1 shingle is always flagged."""
    from ocr_ray.pipelines.dedup import shingle_hashes
    import numpy as np

    bench = set()
    for t in bench_texts:
        bench.update(shingle_hashes(t).tolist())
    bs = np.array(sorted(bench), dtype=np.uint64)
    for t in corpus_texts:
        h = shingle_hashes(t)
        if h.size and bs.size:
            idx = np.searchsorted(bs, h)
            idx[idx == bs.size] = 0
            shared = int(np.count_nonzero(bs[idx] == h))
        else:
            shared = 0
        assert 0 <= shared <= h.size
        if t in bench_texts and h.size:
            assert shared == h.size


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_media_parsers_total_on_arbitrary_bytes(payload):
    """The three public header parsers are TOTAL functions of bytes:
    never raise, statuses stay in the enum, numeric fields stay
    non-negative — a web-scale corpus feeds them arbitrary garbage."""
    from ocr_ray.stages.multimodal import (parse_audio_header,
                                           parse_media_header,
                                           parse_video_header)

    w, h, f, s = parse_media_header(payload)
    assert s in ("ok", "empty", "unsupported", "corrupt")
    assert w >= 0 and h >= 0 and f >= 0
    r, c, b, n, s2 = parse_audio_header(payload)
    assert s2 in ("ok", "empty", "unsupported", "corrupt")
    assert r >= 0 and c >= 0 and b >= 0 and n >= 0
    ts, d, t, s3 = parse_video_header(payload)
    assert s3 in ("ok", "empty", "unsupported", "corrupt")
    assert ts >= 0 and d >= 0 and t >= 0


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=128), st.binary(max_size=64))
def test_media_parsers_total_on_corrupted_valid_payloads(body, junk):
    """Valid synthesized payloads with appended/truncated junk never
    crash any parser (the re-crawl-truncation case)."""
    from ocr_ray.stages.multimodal import (parse_audio_header,
                                           parse_media_header,
                                           parse_video_header,
                                           synth_audio_payload,
                                           synth_media_payload,
                                           synth_video_payload)

    payloads = [
        synth_media_payload(0, 3, 4, 1, body),
        synth_media_payload(1, 3, 4, 2, body),
        synth_media_payload(2, 3, 4, 1, body),
        synth_audio_payload(8000, 1, 8, body),
        synth_video_payload(600, 60, 1, body),
    ]
    for p in payloads:
        for mutant in (p + junk, p[: len(p) // 2], junk + p):
            parse_media_header(mutant)
            parse_audio_header(mutant)
            parse_video_header(mutant)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=1, max_size=40))
def test_skyline_sweep_equals_bruteforce(points):
    """The vectorized skyline sweep equals the O(n²) dominance
    definition on arbitrary (price, date) points including ties."""
    import pandas as pd

    from ocr_ray.pipelines.relational import _skyline_sweep

    df = pd.DataFrame({
        "o_orderkey": range(len(points)),
        "price_cents": [p for p, _ in points],
        "o_orderdate": [d for _, d in points],
    })
    got = set(_skyline_sweep(df)["o_orderkey"])
    want = {
        k for k, (p, d) in enumerate(points)
        if not any(p2 <= p and d2 >= d and (p2 < p or d2 > d)
                   for p2, d2 in points)
    }
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 60), st.integers(1, 10))
def test_ntile_kernel_matches_duckdb(n, k):
    """The vectorized NTILE kernel is bit-identical to DuckDB ntile(k)
    over a group of size n for every (n, k)."""
    import duckdb
    import numpy as np

    from ocr_ray.pipelines.relational import _ntile

    rn = np.arange(1, n + 1)
    got = _ntile(rn, np.full(n, n), k).tolist()
    want = [r[0] for r in duckdb.sql(
        f"SELECT ntile({k}) OVER (ORDER BY i) FROM range(1, {n + 1}) t(i)"
    ).fetchall()]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="ab c", max_size=8),
                          st.text(alphabet="ab c", max_size=8)),
                min_size=1, max_size=12))
def test_levenshtein_many_matches_duckdb(pairs):
    """The across-pairs vectorized DP equals DuckDB levenshtein on
    arbitrary short strings (including empties and spaces)."""
    import duckdb

    from ocr_ray.functions.textnorm import levenshtein_many

    got = levenshtein_many([a for a, _ in pairs],
                           [b for _, b in pairs]).tolist()
    con = duckdb.connect()
    want = [con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
            for a, b in pairs]
    assert got == want


@settings(max_examples=80, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=16),
       st.lists(st.tuples(st.text(alphabet="ab", min_size=1, max_size=2),
                          st.text(alphabet="ab", min_size=1, max_size=2)),
                max_size=4))
def test_bpe_apply_invariants(chars, merges):
    """Greedy BPE application preserves the concatenation, never grows
    the symbol count, and equals DuckDB's replace() over the chr(31)
    segment encoding round-for-round (the oracle's exact mechanism)."""
    import duckdb

    from ocr_ray.pipelines.relational import _bpe_apply

    syms = list(chars)
    out = _bpe_apply(syms, merges)
    assert "".join(out) == "".join(chars)
    assert 1 <= len(out) <= len(chars)

    con = duckdb.connect()
    seg = "\x1f" + "\x1f\x1f".join(chars) + "\x1f"
    for left, right in merges:
        seg = con.execute(
            "SELECT replace(?, ?, ?)",
            [seg, f"\x1f{left}\x1f\x1f{right}\x1f", f"\x1f{left}{right}\x1f"],
        ).fetchone()[0]
    sql_syms = seg[1:-1].split("\x1f\x1f") if len(seg) > 2 else []
    assert out == (sql_syms or [""] if chars == [""] else sql_syms)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abc \t\n", max_size=60),
       st.integers(min_value=1, max_value=5))
def test_window_hashes_positional(txt, k):
    """window_hashes is position-preserving: one hash per strict window,
    equal to hashing each joined window independently."""
    import hashlib

    from ocr_ray.pipelines.dedup import window_hashes

    words = txt.lower().split()
    got = window_hashes(txt, k)
    n = max(0, len(words) - k + 1)
    assert got.size == n
    for i in range(n):
        w = " ".join(words[i:i + k])
        want = int.from_bytes(
            hashlib.md5(w.encode()).digest()[8:16], "little")
        assert int(got[i]) == want
