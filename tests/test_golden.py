"""Golden extraction fixtures (SURVEY.md §5 item 1): the committed snapshot
of the oracle's output over the fixture families.  Any change to extraction
semantics must consciously regenerate this file
(scripts/make_golden.py)."""

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocr_ray.oracle import extract_single_process
from ocr_ray.sources.synth import fixture_pages

GOLDEN = "tests/golden/fixtures_extracted.parquet"


def test_oracle_matches_golden_snapshot():
    got = extract_single_process(fixture_pages())
    idx = pc.sort_indices(got, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")])
    got = got.take(idx).combine_chunks()
    want = pq.read_table(GOLDEN)
    assert got.schema.equals(want.schema)
    for col in want.column_names:
        assert got[col].to_pylist() == want[col].to_pylist(), col
