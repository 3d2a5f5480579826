"""Unit tests for normalization/matching utilities against the reference's
pinned semantics (llm4nano.py:45-71, llm_pl_pol_cov.py:401-446,
pl_cov_additional_interests.py:118-157, policy_filter.py:154-178)."""

import pyarrow as pa

from ocr_ray.functions.textnorm import (
    expand_neighbors,
    extract_keywords,
    filter_to_requested,
    is_name_variation,
    merge_page_ranges,
    money_equal,
    normalize_money,
    normalize_money_array,
    normalize_name,
)


def test_normalize_money_forms():
    assert normalize_money("$1,320,000") == "1320000"
    assert normalize_money("1,320,000") == "1320000"
    assert normalize_money("Included") == "Included"
    assert normalize_money("included ") == "Included"
    assert normalize_money("1%") == "1%"
    assert normalize_money("Inside $10,000 / Outside $10,000") == "Inside $10,000 / Outside $10,000"
    assert normalize_money("$0.00") == "000"
    assert normalize_money(None) is None
    assert normalize_money("") is None
    assert normalize_money("N/A") is None       # no digits -> None
    assert normalize_money(1500) == "1500"
    assert normalize_money(1500.75) == "1500"


def test_money_equal_formatting_insensitive():
    assert money_equal("$1,320,000", "1,320,000")
    assert money_equal("$1,320,000", 1320000)
    assert not money_equal("$1,320,000", "$1,320,001")


def test_normalize_money_array_matches_scalar():
    vals = ["$1,320,000", "Included", "1%", "Inside $10,000 / Outside $10,000",
            "", None, "N/A", "$0.00", " included "]
    arr = normalize_money_array(pa.array(vals, pa.string())).to_pylist()
    assert arr == [normalize_money(v) for v in vals]


def test_normalize_name():
    assert normalize_name("Wind & Hail") == "windhail"
    assert normalize_name("Wind and Hail") == "windandhail"
    assert normalize_name(None) == ""
    assert normalize_name("A.B.C. Corp #2") == "abccorp2"


def test_fuzzy_entity_match():
    # 1-2 char diff for names > 5 chars
    assert is_name_variation("ACME HOLDINGS LLC", "ACME HOLDINHS INC")
    # OCR confusions for names > 8 chars
    assert is_name_variation("FIRST NATIONAL BANK 0F OHIO", "FIRST NATIONAL BANK OF OHIO")
    assert is_name_variation("GARTH GROUP HOLDING", "HARTH GROUP HOLDING")
    # different entities
    assert not is_name_variation("ACME LLC", "ZENITH LLC")
    # short names require exactness
    assert not is_name_variation("AB", "CD")


def test_extract_keywords():
    assert extract_keywords("Wind and Hail") == ["wind", "hail"]
    assert extract_keywords("Barns #1 & 2") == ["barns"]
    assert extract_keywords(
        "Wind & Hail Deductible (3% subject to $25,000 min)"
    ) == ["wind", "hail", "deductible"]
    assert extract_keywords("Business Income") == ["business", "income"]


def test_merge_page_ranges_adjacency():
    # adjacency rule: start <= prev_end + 1 merges (qc_head.py:300-302)
    assert merge_page_ranges([5], 1, 1, 100) == [(4, 6)]
    assert merge_page_ranges([5, 8], 1, 1, 100) == [(4, 9)]      # 7+1 >= 7 adjacency
    assert merge_page_ranges([5, 9], 1, 1, 100) == [(4, 6), (8, 10)]
    assert merge_page_ranges([1, 2, 3], 0, 1, 100) == [(1, 3)]
    assert merge_page_ranges([], 1, 1, 100) == []
    # clamped to document bounds
    assert merge_page_ranges([1, 100], 3, 1, 100) == [(1, 4), (97, 100)]


def test_expand_neighbors_cap():
    assert expand_neighbors([5], 1, 1, 100) == [4, 5, 6]
    assert expand_neighbors([1], 2, 1, 100) == [1, 2, 3]
    assert expand_neighbors(list(range(1, 40)), 1, 1, 100, max_pages=25) == list(range(1, 26))


def test_filter_to_requested_loose_containment():
    vals = [{"name": "Building Coverage", "status": "MATCH"},
            {"name": "Contents", "status": "MISMATCH"},
            {"name": "Unrelated Thing", "status": "MATCH"}]
    req = [{"name": "building"}, {"name": "contents limit"}]
    out = filter_to_requested(vals, req)
    assert [v["name"] for v in out] == ["Building Coverage", "Contents"]
    # fallback take-first-N when nothing matches
    out2 = filter_to_requested(vals, [{"name": "zzz"}])
    assert len(out2) == 1 and out2[0]["name"] == "Building Coverage"
    # no requested items -> empty
    assert filter_to_requested(vals, []) == []


def test_block_at_position():
    from ocr_ray.functions.textnorm import block_at_position

    spans = [{"start": 0, "end": 4}, {"start": 5, "end": 12}, {"start": 13, "end": 20}]
    assert block_at_position(spans, 0) == 0
    assert block_at_position(spans, 3) == 0
    assert block_at_position(spans, 4) == -1     # the separator char
    assert block_at_position(spans, 5) == 1
    assert block_at_position(spans, 19) == 2
    assert block_at_position(spans, 20) == -1
    assert block_at_position([], 0) == -1


def test_dedupe_preserve_order():
    from ocr_ray.functions.textnorm import dedupe_preserve_order

    assert dedupe_preserve_order(["a", "b", "a", "c", "b"]) == ["a", "b", "c"]
    assert dedupe_preserve_order([]) == []
