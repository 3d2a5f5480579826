"""Unit tests for the validation operators (G4 / H5 / C5-C10), pinned to
the reference's documented edge cases."""

from __future__ import annotations


# ---------------------------------------------------------------------------
# G4 — nested-path QC compare (llm4nano.py:78-183)
# ---------------------------------------------------------------------------

def test_resolve_path_nested_and_list_index():
    from ocr_ray.functions.qc_fields import resolve_path

    doc = {"property": {"locations": [{"theft_sublimit": "$5,000"}],
                        "policy_period": {"effective_date": "01/01/2024"}}}
    assert resolve_path(doc, ("property", "locations", "0", "theft_sublimit")) == "$5,000"
    assert resolve_path(doc, ("property", "locations", "1", "theft_sublimit")) is None
    assert resolve_path(doc, ("property", "policy_period", "effective_date")) == "01/01/2024"
    assert resolve_path(doc, ("missing", "path")) is None
    assert resolve_path({"property": "not-a-dict"}, ("property", "x")) is None


def test_qc_field_compare_null_policies():
    from ocr_ray.functions.qc_fields import qc_field_compare

    cert = {"property": {"policy_number": "ABC-1"},
            "general_liability": {"limits": {"each_occurrence": "$1,000,000"}}}
    pol = {"property": {"policy_number": "ABC-1"},
           "general_liability": {
               "limits": {"each_occurrence": "1,000,000",
                          "general_aggregate": "$2,000,000"}}}
    # encova: the one-sided general_aggregate check is skipped
    rows = qc_field_compare(cert, pol, null_policy="skip")
    assert {r["field"]: r["verdict"] for r in rows} == {
        "property.policy_number": "MATCH",
        "gl.limits.each_occurrence": "MATCH",   # $1,000,000 == 1,000,000
    }
    # hartford: one-sided null IS a mismatch
    rows = qc_field_compare(cert, pol, null_policy="mismatch")
    verdicts = {r["field"]: r["verdict"] for r in rows}
    assert verdicts["gl.limits.general_aggregate"] == "MISMATCH"


def test_qc_field_compare_drops_location_checks_without_locations():
    from ocr_ray.functions.qc_fields import qc_field_compare

    cert = {"property": {"locations": []}}
    pol = {"property": {"theft_sublimit": "$5,000"}}
    rows = qc_field_compare(cert, pol, null_policy="mismatch")
    assert all("locations" not in r["field"] or
               not r["field"].startswith("property.locations")
               for r in rows)
    # theft check's CERT path needs locations[0] → dropped entirely
    assert "policy.property.theft_sublimit" not in {r["field"] for r in rows}


# ---------------------------------------------------------------------------
# H5 — postprocess patch rules (llm4nano.py:221-278)
# ---------------------------------------------------------------------------

def test_patch_building_as_construction_type():
    from ocr_ray.functions.patch import postprocess_location

    out = postprocess_location(
        {"building": "Frame", "construction": None}, "")
    assert out["building"] is None
    assert out["construction"] == "Frame"
    # existing construction is never overwritten
    out = postprocess_location(
        {"building": "Non-Combustible", "construction": "Masonry"}, "")
    assert out["building"] is None
    assert out["construction"] == "Masonry"
    # numeric building is untouched
    out = postprocess_location({"building": "$350,000"}, "")
    assert out["building"] == "$350,000"


def test_patch_pumps_canopy_fill_from_class_amounts():
    from ocr_ray.functions.patch import (extract_first_class_amount,
                                         postprocess_location)

    text = "Declarations\nClass 1 Pumps $ 12,500\nClass 2 Canopy $ 7,800\n"
    assert extract_first_class_amount(text, 1) == "12500"
    assert extract_first_class_amount(text, 2) == "7800"
    assert extract_first_class_amount("no classes here", 1) is None
    out = postprocess_location(
        {"pumps": None, "canopy": "Included"}, text)
    assert out["pumps"] == "12500"
    assert out["canopy"] == "7800"
    # concrete amounts are never overwritten
    out = postprocess_location({"pumps": "$5,000", "canopy": "$6,000"}, text)
    assert out["pumps"] == "$5,000"
    assert out["canopy"] == "$6,000"


def test_patch_building_bpp_dedup():
    from ocr_ray.functions.patch import (has_explicit_building_limit,
                                         postprocess_location)

    explicit = "Schedule\nBuilding $ 425,000\n"
    form_name = "Building and Personal Property Coverage Form $ 999,999\n"
    assert has_explicit_building_limit(explicit)
    assert not has_explicit_building_limit(form_name)
    # no explicit line + building == BPP → building was a copy, null it
    out = postprocess_location(
        {"building": "$350,000", "business_personal_property": "350,000"},
        form_name)
    assert out["building"] is None
    # explicit line present → keep
    out = postprocess_location(
        {"building": "$350,000", "business_personal_property": "350,000"},
        explicit)
    assert out["building"] == "$350,000"


# ---------------------------------------------------------------------------
# C5-C10 — per-family verdict rules (llm_pl_pol_cov.py:716-780)
# ---------------------------------------------------------------------------

def test_family_money_formatting_insensitive():
    from ocr_ray.functions.family_rules import compare_family

    assert compare_family("$1,320,000", "1,320,000", "building") == "MATCH"
    assert compare_family("$ 10,000", "10,000", "money_securities") == "MATCH"
    assert compare_family("$250,000", "$300,000", "building") == "MISMATCH"
    assert compare_family("$100", "", "building") == "NOT_FOUND"
    assert compare_family(None, "$100", "building") == "NOT_FOUND"


def test_family_business_income_als_rules():
    from ocr_ray.functions.family_rules import compare_family

    assert compare_family("Actual Loss Sustained",
                          "BI Actual Loss Sustained applies",
                          "business_income") == "MATCH"
    assert compare_family("A.L.S.", "no dollar limit stated; ALS form",
                          "business_income") == "MATCH"
    assert compare_family("Actual Loss Sustained", "limit $50,000",
                          "business_income") == "MISMATCH"
    assert compare_family("$50,000", "Actual Loss Sustained",
                          "business_income") == "MISMATCH"


def test_family_money_securities_inside_outside():
    from ocr_ray.functions.family_rules import compare_family

    split = "Inside $10,000 / Outside $10,000"
    assert compare_family("10,000", split, "money_securities") == "MATCH"
    assert compare_family("$10,000", split, "money_securities") == "MATCH"
    assert compare_family("25,000", split, "money_securities") == "MISMATCH"
    # non-money_securities families do NOT apply the split rule
    assert compare_family("10,000", split, "building") == "MISMATCH"


def test_family_included_semantics():
    from ocr_ray.functions.family_rules import compare_family

    assert compare_family("Included", "coverage is included", "bpp") == "MATCH"
    assert compare_family("Included", "$25,000", "bpp") == "MATCH"
    assert compare_family("Included", "not shown", "bpp") == "MISMATCH"


# ---------------------------------------------------------------------------
# D4 / C8 — parameterized heading windows + declarations head restriction
# ---------------------------------------------------------------------------

def _mini_extracted_batch():
    """One fake extracted row with known blocks (spans into extracted_text)."""
    import pyarrow as pa

    blocks = [
        "intro block with enough text here",
        "PROPERTY SECTION building coverage starts",
        "limit detail $5,000 for the building",
        "more detail follows in this block",
    ]
    text = "\n".join(blocks)
    spans, pos = [], 0
    for b in blocks:
        spans.append({"start": pos, "end": pos + len(b), "kind": "text",
                      "raw_start": -1, "raw_end": -1})
        pos += len(b) + 1
    return pa.table({
        "url": ["https://x.example/1"],
        "extracted_text": [text],
        "spans": [spans],
    })


def test_heading_window_parameterized_and_short_doc():
    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.filter_blocks import heading_window_batch

    batch = _mini_extracted_batch()
    # num_blocks=2 fits: blocks 1..2
    out = heading_window_batch(DEFAULT_CONFIG, num_blocks=2)(batch)
    assert out["status"][0].as_py() == "success"
    assert out["start_block"][0].as_py() == 1
    assert out["end_block"][0].as_py() == 2
    assert out["warning"][0].as_py() == ""
    # num_blocks=9 is short: only 3 blocks from the heading onward
    out = heading_window_batch(DEFAULT_CONFIG, num_blocks=9)(batch)
    assert out["status"][0].as_py() == "success"
    assert out["blocks_extracted"][0].as_py() == 3
    assert "only 3 available" in out["warning"][0].as_py()
    # heading missing → error row, not an exception
    import pyarrow as pa
    no_heading = pa.table({
        "url": ["https://x.example/2"],
        "extracted_text": ["just a plain block of text"],
        "spans": [[{"start": 0, "end": 26, "kind": "text",
                    "raw_start": -1, "raw_end": -1}]],
    })
    out = heading_window_batch(DEFAULT_CONFIG, num_blocks=2)(no_heading)
    assert out["status"][0].as_py() == "error"
    assert out["blocks_extracted"][0].as_py() == 0


def test_declarations_head_restriction():
    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.filter_blocks import declarations_head_batch

    batch = _mini_extracted_batch()
    # head of 2 blocks excludes the $5,000 block → no dollar hit
    out = declarations_head_batch(DEFAULT_CONFIG, head_blocks=2)(batch)
    assert out["n_head_blocks"][0].as_py() == 2
    assert out["head_has_dollar"][0].as_py() is False
    # head of 3 includes it
    out = declarations_head_batch(DEFAULT_CONFIG, head_blocks=3)(batch)
    assert out["head_has_dollar"][0].as_py() is True
