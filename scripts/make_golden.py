"""Regenerate the golden extraction snapshot after an intentional semantics
change.  Run from the repo root:  python scripts/make_golden.py"""

import sys

sys.path.insert(0, ".")

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocr_ray.oracle import extract_single_process
from ocr_ray.sources.synth import fixture_pages

t = extract_single_process(fixture_pages())
idx = pc.sort_indices(t, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")])
pq.write_table(t.take(idx).combine_chunks(), "tests/golden/fixtures_extracted.parquet")
print("golden regenerated:", t.num_rows, "rows")
