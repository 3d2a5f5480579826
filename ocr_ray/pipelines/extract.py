"""The flagship extraction pipeline (SURVEY.md §3 "Ray-native restatement").

    read_parquet(pages)
      → map_batches(pre_classify)            # stateless, vectorized Arrow
      → map_batches(Extractor, concurrency)  # stateful actor pool, dual engine
      → groupby(part_id).map_groups(write)   # url-hash partitioned atomic
                                             # checkpoint + lineage manifest

The url-hash partition column is assigned in the vectorized gate stage
(crc32(url) % P — stable across runs/processes, unlike Python ``hash``); it
is both the skew-defusing repartition key and the checkpoint granularity —
the only wide operation on the hot path (SURVEY.md §7).

Nothing here calls ray.init(); callers own the session.
"""

from __future__ import annotations

import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.gates import pre_classify
from ocr_ray.stages.extract import Extractor
from ocr_ray.state import manifest as mf


def stable_part_id(urls: list[str], num_parts: int) -> list[int]:
    """Deterministic url-hash partition (crc32, not the salted ``hash``)."""
    return [zlib.crc32(u.encode("utf-8")) % num_parts for u in urls]


def _gate_stage(cfg: PipelineConfig, skip_parts: frozenset[int]):
    """Stateless map_batches fn: pre-classify + part_id + resume-skip."""

    def gate(batch: pa.Table) -> pa.Table:
        part = pa.array(
            stable_part_id(batch["url"].to_pylist(), cfg.num_output_partitions),
            pa.int32(),
        )
        batch = batch.append_column("part_id", part)
        if skip_parts:
            keep = pc.invert(
                pc.is_in(batch["part_id"], value_set=pa.array(sorted(skip_parts), pa.int32()))
            )
            batch = batch.filter(keep)
        return pre_classify(batch, cfg)

    return gate


def extraction_dataset(
    ds: "ray.data.Dataset",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    skip_parts: frozenset[int] = frozenset(),
) -> "ray.data.Dataset":
    """Lazy gates→extract pipeline over a pages dataset (no sink)."""
    ds = ds.map_batches(
        _gate_stage(cfg, skip_parts),
        batch_format="pyarrow",
        batch_size=cfg.batch_size_gates,
    )
    return ds.map_batches(
        Extractor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size_extract,
        concurrency=cfg.extract_concurrency,
    )


def _part_writer(out_dir: str):
    """map_groups fn: write one url-hash partition atomically + manifest."""

    def write_group(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        part_id = group["part_id"][0].as_py()
        # deterministic in-partition order (url, warc_ts) so the parquet
        # bytes are identical regardless of upstream task interleaving
        idx = pc.sort_indices(
            group, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
        )
        group = group.take(idx)
        status = group["parse_status"]
        n_out = pc.sum(
            pc.cast(pc.is_in(status, value_set=pa.array(["ok", "fallback"])), pa.int64())
        ).as_py() or 0
        n_rej = pc.sum(pc.cast(pc.equal(status, "rejected"), pa.int64())).as_py() or 0
        n_err = pc.sum(pc.cast(pc.equal(status, "error"), pa.int64())).as_py() or 0
        b_in = pc.sum(group["bytes_in"]).as_py() or 0
        b_out = pc.sum(group["bytes_out"]).as_py() or 0
        man = {
            "part_id": part_id,
            "rows_in": len(group),
            "rows_out": int(n_out),
            "rows_rejected": int(n_rej),
            "parse_failures": int(n_err),
            "bytes_in": int(b_in),
            "bytes_out": int(b_out),
            "bytes_stripped": int(b_in - b_out),
            "wall_ms": 0,  # patched below after the write
        }
        man["wall_ms"] = int((time.monotonic() - t0) * 1000)
        mf.write_partition(out_dir, part_id, group, man)
        return pa.table({k: [man[k]] for k in man})

    return write_group


def run_extraction(
    input_paths: "str | list[str] | ray.data.Dataset",
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
) -> dict:
    """End-to-end run with partition-granular checkpoint/resume.

    Returns the aggregated lineage summary (also derivable later via
    ``manifest.summarize(out_dir)``).
    """
    if isinstance(input_paths, ray.data.Dataset):
        ds = input_paths
    else:
        ds = ray.data.read_parquet(input_paths)
    done = frozenset(mf.completed_parts(out_dir)) if resume else frozenset()
    if len(done) >= cfg.num_output_partitions:
        return mf.summarize(out_dir)
    ex = extraction_dataset(ds, cfg, skip_parts=done)
    # the one wide op: co-locate each url-hash partition, write it atomically
    manifests = ex.groupby("part_id").map_groups(
        _part_writer(out_dir), batch_format="pyarrow"
    )
    manifests.materialize()  # manifests are tiny (one row per partition)
    return mf.summarize(out_dir)
