"""Single-process oracle — the spec the distributed pipeline must equal.

Runs the exact same gate + extractor code sequentially, one row per batch,
with no Ray involved.  The golden tests assert the Ray pipeline's output is
byte-identical per url to this oracle under arbitrary partitioning and
parallelism (FIXTURES.md §5 invariant 1, BASELINE.json north_rule
"byte-identical extracted text per url").
"""

from __future__ import annotations

import pyarrow as pa

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.gates import pre_classify
from ocr_ray.pipelines.extract import stable_part_id
from ocr_ray.stages.extract import Extractor


def extract_single_process(pages: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Row-at-a-time reference extraction of a pages table."""
    part = pa.array(
        stable_part_id(pages["url"].to_pylist(), cfg.num_output_partitions), pa.int32()
    )
    pages = pages.append_column("part_id", part)
    ex = Extractor(cfg)
    outs = []
    for i in range(len(pages)):
        row = pre_classify(pages.slice(i, 1), cfg)
        outs.append(ex(row))
    return pa.concat_tables(outs) if outs else ex(pre_classify(pages, cfg))
