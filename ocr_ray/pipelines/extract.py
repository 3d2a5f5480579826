"""The flagship extraction pipeline (SURVEY.md §3 "Ray-native restatement").

    read_parquet(pages)
      → map_batches(pre_classify)            # stateless, vectorized Arrow
      → map_batches(Extractor, concurrency)  # stateful actor pool, dual engine
      → groupby(part_id).map_groups(write)   # url-hash partitioned atomic
                                             # checkpoint + lineage manifest

The url-hash partition column is assigned in the vectorized gate stage
(md5-lower-64(url) % P, see ``stable_part_id`` — stable across
runs/processes, unlike Python ``hash``); it is both the skew-defusing
repartition key and the checkpoint granularity — the only wide operation on
the hot path (SURVEY.md §7).

Nothing here calls ray.init(); callers own the session.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.gates import pre_classify
from ocr_ray.stages.extract import Extractor
from ocr_ray.state import manifest as mf


def stable_part_id(urls: list[str], num_parts: int) -> list[int]:
    """Deterministic url-hash partition (never the salted Python ``hash``).

    The hash is the lower 64 bits of md5 — bit-for-bit DuckDB's
    ``md5_number_lower`` (digest bytes 8..16, little-endian) so the SQL
    oracles can recompute partition ids, and a far better partitioner than
    crc32 at 10^12-url scale."""
    import hashlib

    return [
        int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[8:16], "little")
        % num_parts
        for u in urls
    ]


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
    concurrency = cfg.extract_concurrency
    if concurrency is None:
        # fixed-size pool: autoscaling from a small min ramps too slowly and
        # starves the stage on short runs; leave 2 CPUs for read/write stages
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, ncpu - 2)
    return ds.map_batches(
        Extractor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size_extract,
        concurrency=concurrency,
    )


_EXTRACTION_CACHE: dict[tuple, "ray.data.Dataset"] = {}
_EXTRACTION_CACHE_MAX = 4  # driver/test scale: a handful of sf dirs at most


def _pages_dir_fingerprint(pages_dir: str) -> str:
    """Cheap content fingerprint of a pages dir: sorted (name, size,
    mtime_ns) of its parquet files, md5'd — rewriting a file in place
    changes the key, so the cache can never serve stale blocks."""
    import glob as _glob
    import hashlib as _hashlib

    parts = []
    for f in sorted(_glob.glob(os.path.join(pages_dir, "*.parquet"))):
        st = os.stat(f)
        parts.append(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}")
    return _hashlib.md5("|".join(parts).encode()).hexdigest()


def extraction_dataset_cached(
    pages_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """Materialized gates→extract output for a pages dir, cached per
    (pages_dir fingerprint, cfg, Ray job).

    **Test/driver-scale path ONLY** — this MATERIALIZES the full
    extraction output in the object store, which is exactly what the
    production runners must never do; at corpus scale use the streaming
    `run_extraction_sharded` / `run_extraction_urlhash`, which write
    partitioned parquet with backpressure and never hold the corpus
    resident.

    Seven driver queries (extract_pages/stats, filter_stats,
    heading/section windows, declarations_head, training_corpus) consume
    the SAME extraction output; without the cache each re-runs the full
    actor-pool extraction (several seconds of pool spin-up + extract per
    query — the reason extraction-family queries timed out of the round-2
    driver correctness run).  The job id in the key makes a cache entry
    die with its Ray session (materialized blocks don't survive
    shutdown); the pages-dir FINGERPRINT (file names + sizes + mtimes) in
    the key means an in-place rewrite of the input can never serve stale
    blocks.  The cache is capped at `_EXTRACTION_CACHE_MAX` entries
    (FIFO eviction) so a long-lived driver doesn't accumulate
    materialized corpora.
    """
    key = (_pages_dir_fingerprint(pages_dir), pages_dir, repr(cfg),
           ray.get_runtime_context().get_job_id())
    ds = _EXTRACTION_CACHE.get(key)
    if ds is None:
        ds = extraction_dataset(ray.data.read_parquet(pages_dir), cfg).materialize()
        while len(_EXTRACTION_CACHE) >= _EXTRACTION_CACHE_MAX:
            _EXTRACTION_CACHE.pop(next(iter(_EXTRACTION_CACHE)))
        _EXTRACTION_CACHE[key] = ds
    return ds


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
    if not resume:
        mf.clear_output(out_dir)
    done = frozenset(mf.completed_parts(out_dir)) if resume else frozenset()
    if len(done) >= cfg.num_output_partitions:
        return mf.summarize(out_dir)
    ex = extraction_dataset(ds, cfg, skip_parts=done)
    # the one wide op: co-locate each url-hash partition, write it atomically
    manifests = ex.groupby("part_id").map_groups(
        _part_writer(out_dir), batch_format="pyarrow"
    )
    manifests.materialize()  # manifests are tiny (one row per partition)
    # partitions no url hashed into produce no group: write them empty so a
    # completed run is detectable (otherwise every resume re-extracts all)
    missing = set(range(cfg.num_output_partitions)) - mf.completed_parts(out_dir)
    if missing:
        empty = Extractor(cfg)(_gate_stage(cfg, frozenset())(_empty_pages_table()))
        for part in sorted(missing):
            mf.write_partition(out_dir, part, empty, {
                "part_id": part, "rows_in": 0, "rows_out": 0,
                "rows_rejected": 0, "parse_failures": 0, "bytes_in": 0,
                "bytes_out": 0, "bytes_stripped": 0, "wall_ms": 0,
            })
    return mf.summarize(out_dir)


def _merge_writer(out_dir: str):
    """map_groups fn: merge one partition's DELTA rows into its existing
    data (watermark-guarded), rewrite atomically, recompute the manifest."""
    import pyarrow.parquet as pq

    def merge_group(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        part_id = group["part_id"][0].as_py()
        data_path = mf.latest_partition_data(out_dir, part_id)
        if data_path is not None:
            # cast the parquet round-trip back to the extractor's arrow
            # schema: parquet renames list children to 'element' while
            # the live pipeline names them 'item' — same bytes on disk,
            # different embedded ARROW:schema unless realigned
            existing = pq.read_table(data_path, use_threads=False)
            group = group.select(existing.column_names)
            existing = existing.cast(group.schema)
            # idempotency watermark: a re-run (or crash-resumed delta)
            # re-presents rows the partition already holds — drop delta
            # rows at or below the existing max warc_ts (incremental
            # crawls are time-ordered: every genuinely-new row is newer)
            if len(existing):
                wm = pc.max(existing["warc_ts"])
                group = group.filter(pc.greater(group["warc_ts"], wm))
        else:
            existing = group.slice(0, 0)
        added = len(group)
        if added:
            merged = pa.concat_tables([existing, group])
            merged = merged.take(pc.sort_indices(
                merged,
                sort_keys=[("url", "ascending"), ("warc_ts", "ascending")],
            ))
            man = _partition_manifest(part_id, merged)
            man["wall_ms"] = int((time.monotonic() - t0) * 1000)
            mf.replace_partition(out_dir, part_id, merged, man)
        elif data_path is not None and not os.path.exists(
                os.path.join(mf.part_dir(out_dir, part_id),
                             "manifest.json")):
            # crash-window recovery: a previous delta renamed the live
            # dir aside but died before the new one renamed in — the
            # _old- fallback already holds the fully-merged rows (the
            # watermark filtered this delta to nothing), so republish it
            mf.replace_partition(out_dir, part_id, existing,
                                 _partition_manifest(part_id, existing))
        return pa.table({
            "part_id": pa.array([part_id], pa.int32()),
            "rows_added": pa.array([added], pa.int64()),
        })

    return merge_group


def run_extraction_incremental(
    input_paths: "str | list[str] | ray.data.Dataset",
    out_dir: str,
    since_ts,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """DELTA RUN over an existing url-hash-partitioned output — the
    incremental_event_counts pattern lifted to the flagship path: only
    pages with ``warc_ts > since_ts`` are scanned (the predicate is
    pushed into the parquet read, so row groups entirely at or below the
    checkpoint never leave storage), run through the SAME deterministic
    gates+extract stages, and merged into exactly the partitions they
    hash into.  Every other partition is never opened, let alone
    rewritten — at 100 TB, where yesterday's output covers 99.9% of the
    corpus, re-extracting only the new crawl is the whole point.

    Byte parity: extraction is a pure per-row function and merged
    partitions are (url, warc_ts)-sorted through the same parquet
    writer, so base-run-at-T + delta-run equals a full run over old+new
    input byte-for-byte (pinned by pytest).

    Idempotency / crash safety: each merge drops delta rows at or below
    the partition's existing max-warc_ts watermark and the rewrite is an
    atomic directory swap (manifest.replace_partition), so re-running a
    completed or interrupted delta converges without duplicate rows.
    Contract: delta rows are strictly newer than every already-merged
    row (time-ordered incremental crawls).

    Returns ``summarize(out_dir)`` plus ``parts_touched``/``rows_added``.
    """
    import pandas as pd
    import pyarrow.dataset as pads

    if isinstance(input_paths, ray.data.Dataset):
        ds = input_paths
    else:
        ds = ray.data.read_parquet(
            input_paths,
            filter=(pads.field("warc_ts") > pads.scalar(pd.Timestamp(since_ts))),
        )
    ex = extraction_dataset(ds, cfg)
    touched = ex.groupby("part_id").map_groups(
        _merge_writer(out_dir), batch_format="pyarrow"
    ).take_all()        # one tiny row per TOUCHED partition
    summary = mf.summarize(out_dir)
    summary["parts_touched"] = sorted(int(r["part_id"]) for r in touched)
    summary["rows_added"] = int(sum(r["rows_added"] for r in touched))
    return summary


# ---------------------------------------------------------------------------
# Shard-aligned (shuffle-free) checkpointed runner — the 100 TB path
# ---------------------------------------------------------------------------

class _ShardProcessor:
    """Actor: processes whole input shards (one parquet file → one output
    partition), writing each atomically with its manifest.

    This is the scale path prescribed by the design brief ("one output
    directory per input shard"): output partitioning is ALIGNED WITH INPUT
    SHARDS, so there is no all-to-all exchange anywhere — every byte moves
    storage → worker → storage exactly once, and resume skips whole shards.
    The url-hash groupby path (run_extraction) remains for downstream
    consumers that need url co-location.
    """

    def __init__(self, cfg: PipelineConfig, out_dir: str) -> None:
        self.cfg = cfg
        self.out_dir = out_dir
        self.extractor = Extractor(cfg)
        # a 1-CPU task must use 1 CPU: pyarrow's internal pools default to
        # the MACHINE's core count inside every worker, which silently
        # oversubscribes the node (and fakes scaling numbers)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)

    def _process_shard(self, shard_id: int, path: str) -> dict:
        import pyarrow.parquet as pq

        t0 = time.monotonic()
        cfg = self.cfg
        table = pq.read_table(path, use_threads=False)
        part = pa.array([shard_id] * len(table), pa.int32())
        table = table.append_column("part_id", part)
        outs = []
        bs = cfg.batch_size_extract
        for i in range(0, max(1, len(table)), bs):
            sub = table.slice(i, bs)
            if len(sub) == 0:
                continue
            outs.append(self.extractor(pre_classify(sub, cfg)))
        group = pa.concat_tables(outs) if outs else self.extractor(
            pre_classify(table.slice(0, 0), cfg))
        idx = pc.sort_indices(
            group, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
        )
        group = group.take(idx)
        status = group["parse_status"]
        n_out = pc.sum(pc.cast(
            pc.is_in(status, value_set=pa.array(["ok", "fallback"])), pa.int64()
        )).as_py() or 0
        n_rej = pc.sum(pc.cast(pc.equal(status, "rejected"), pa.int64())).as_py() or 0
        n_err = pc.sum(pc.cast(pc.equal(status, "error"), pa.int64())).as_py() or 0
        b_in = pc.sum(group["bytes_in"]).as_py() or 0
        b_out = pc.sum(group["bytes_out"]).as_py() or 0
        man = {
            "part_id": shard_id,
            "rows_in": len(group),
            "rows_out": int(n_out),
            "rows_rejected": int(n_rej),
            "parse_failures": int(n_err),
            "bytes_in": int(b_in),
            "bytes_out": int(b_out),
            "bytes_stripped": int(b_in - b_out),
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }
        mf.write_partition(self.out_dir, shard_id, group, man)
        return man


def run_extraction_sharded(
    input_dir: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
) -> dict:
    """Shuffle-free end-to-end run: shard-aligned partitions + manifests.

    Input shards (parquet files, sorted lexicographically) map 1:1 to
    output partitions; completed shards are skipped on resume.
    """
    import glob
    import os

    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not resume:
        mf.clear_output(out_dir)
    done = mf.completed_parts(out_dir) if resume else set()
    todo = [(i, f) for i, f in enumerate(files) if i not in done]
    if not todo:
        return mf.summarize(out_dir)

    # Raw Ray tasks, deliberately: the unit of work here is "process one
    # shard and write it atomically with its manifest" — a side-effecting
    # job the Dataset API can only wrap at ~2x measured overhead.  A
    # bounded sliding window keeps at most 4x cluster-CPU tasks in flight
    # so a 10^8-shard corpus never floods the scheduler.
    @ray.remote(num_cpus=1)
    def process_shard(shard_id: int, path: str) -> dict:
        return _ShardProcessor(cfg, out_dir)._process_shard(shard_id, path)

    failed = _bounded_submit(process_shard, todo)
    summary = mf.summarize(out_dir)
    if failed:
        summary["failed_shards"] = sorted(failed)
    return summary


def _bounded_submit(task_remote, items: list[tuple], window: int | None = None
                    ) -> list:
    """Submit ``task_remote.remote(*item)`` over a bounded sliding window
    (at most ~4x cluster-CPU tasks in flight — a 10^8-item list never
    floods the scheduler).  Failed items are recorded, not fatal; returns
    their first elements (ids) sorted.  Drains every finished ref per wait
    call (one wait per completion caps the driver at ~100 tasks/s)."""
    if window is None:
        window = max(8, int(ray.cluster_resources().get("CPU", 8)) * 4)
    pending: dict = {}
    failed: list = []
    it = iter(items)
    exhausted = False
    while pending or not exhausted:
        while not exhausted and len(pending) < window:
            try:
                item = next(it)
            except StopIteration:
                exhausted = True
                break
            pending[task_remote.remote(*item)] = item[0]
        if pending:
            ready, _ = ray.wait(
                list(pending), num_returns=len(pending), timeout=0.05
            )
            for ref in ready:
                item_id = pending.pop(ref)
                try:
                    ray.get(ref)
                except ray.exceptions.RayError:
                    # fails after Ray's retries (corrupt file, OOM) are
                    # recorded, not fatal: no marker/manifest is written,
                    # so the next resume retries exactly this item
                    failed.append(item_id)
    return sorted(failed)


# ---------------------------------------------------------------------------
# url-hash partitioned runner via an EXPLICIT two-phase exchange
# ---------------------------------------------------------------------------

def run_extraction_urlhash(
    input_dir: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    merge_rows_in_memory: int = 1 << 18,
) -> dict:
    """Url-hash co-located output without Ray's sort shuffle: a manual
    two-phase external exchange (the "partitioning/shuffle handled
    explicitly" path).

    Phase 1 — map: one task per input shard runs gates+extract and splits
    its output rows by ``crc32(url) % P``, writing one chunk file per
    (part, shard) atomically, then a per-shard done-marker.

    Phase 2 — merge: one task per partition concatenates its chunk files,
    sorts by (url, warc_ts) (order independent of chunk arrival), and
    writes the final atomic partition + manifest.

    Resume: finished partitions skip both phases; phase-1 markers skip
    re-extraction of finished shards.  Chunk writes are tmp+rename so a
    crashed shard re-runs cleanly (identical deterministic bytes replace).

    Failure surface: a phase-1 shard that fails after Ray's retries could
    have contributed rows to ANY partition, so phase 2 is skipped entirely,
    ``_chunks/`` is kept (done-markers make the resume retry exactly the
    failed shards) and the summary carries ``failed_shards`` — a run is
    complete only when the summary has neither ``failed_shards`` nor
    ``failed_partitions``.  A phase-2 failure leaves its partition without
    a manifest (recoverable), is reported as ``failed_partitions``, and
    keeps ``_chunks/`` so the retry does not redo phase 1.
    """
    import glob
    import os

    chunks_dir = os.path.join(out_dir, "_chunks")
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not resume:
        mf.clear_output(out_dir)  # incl. stale _chunks and phase-1 markers
    done_parts = mf.completed_parts(out_dir) if resume else set()
    if len(done_parts) >= cfg.num_output_partitions:
        return mf.summarize(out_dir)
    os.makedirs(chunks_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def phase1(shard_id: int, path: str) -> None:
        import pyarrow.parquet as pq

        marker = os.path.join(chunks_dir, f"_shard-{shard_id:05d}.done")
        if os.path.exists(marker):
            return
        table = pq.read_table(path, use_threads=False)
        ex = Extractor(cfg)
        outs = []
        bs = cfg.batch_size_extract
        for i in range(0, max(1, len(table)), bs):
            sub = table.slice(i, bs)
            if len(sub):
                outs.append(ex(_gate_stage(cfg, frozenset())(sub)))
        out = pa.concat_tables(outs) if outs else None
        if out is not None:
            for part in pc.unique(out["part_id"]).to_pylist():
                if part in done_parts:
                    continue
                rows = out.filter(pc.equal(out["part_id"], part))
                pdir = os.path.join(chunks_dir, f"part={part:05d}")
                os.makedirs(pdir, exist_ok=True)
                tmp = os.path.join(pdir, f".tmp-shard-{shard_id:05d}.parquet")
                pq.write_table(rows, tmp)
                os.rename(tmp, os.path.join(pdir, f"shard-{shard_id:05d}.parquet"))
        with open(marker, "w") as f:
            f.write("done\n")

    failed_shards = _bounded_submit(phase1, list(enumerate(files)))
    if failed_shards:
        # a failed shard's rows could belong to ANY partition: merging now
        # would finalize partitions with silently-missing rows.  Keep
        # _chunks/ (markers skip the finished shards on resume) and report.
        summary = mf.summarize(out_dir)
        summary["failed_shards"] = failed_shards
        return summary

    # above merge_rows_in_memory rows a partition merges as a RANGED
    # STREAM (sorted key ranges written row-group-at-a-time) instead of
    # one in-memory concat+sort — bounds the phase-2 worker's memory by
    # range size, not partition size
    @ray.remote(num_cpus=1)
    def phase2(part: int) -> None:
        import pyarrow.parquet as pq

        pdir = os.path.join(chunks_dir, f"part={part:05d}")
        chunk_files = sorted(glob.glob(os.path.join(pdir, "shard-*.parquet")))
        total_rows = sum(pq.read_metadata(f).num_rows for f in chunk_files)
        if total_rows > merge_rows_in_memory:
            _merge_partition_streamed(out_dir, part, chunk_files,
                                      merge_rows_in_memory)
            return
        if chunk_files:
            group = pa.concat_tables([pq.read_table(f, use_threads=False)
                                      for f in chunk_files])
        else:  # no url hashed here: an empty partition with correct schema
            group = Extractor(cfg)(_gate_stage(cfg, frozenset())(_empty_pages_table()))
        idx = pc.sort_indices(
            group, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
        )
        group = group.take(idx)
        mf.write_partition(out_dir, part, group,
                           _partition_manifest(part, group))

    todo_parts = [(p,) for p in range(cfg.num_output_partitions)
                  if p not in done_parts]
    failed_parts = _bounded_submit(phase2, todo_parts)

    summary = mf.summarize(out_dir)
    if failed_parts:
        # failed partitions have no manifest → resume retries just their
        # merges; keep _chunks/ so that retry does not redo phase 1
        summary["failed_partitions"] = failed_parts
        return summary
    import shutil as _sh
    _sh.rmtree(chunks_dir, ignore_errors=True)
    return summary


def _empty_pages_table() -> pa.Table:
    from ocr_ray.schema import PAGES_SCHEMA

    return pa.table({f.name: pa.array([], f.type) for f in PAGES_SCHEMA})


def _partition_manifest(part_id: int, group: pa.Table, wall_ms: int = 0) -> dict:
    """Standard per-partition lineage manifest from an output table."""
    status = group["parse_status"]
    n_out = pc.sum(pc.cast(
        pc.is_in(status, value_set=pa.array(["ok", "fallback"])), pa.int64()
    )).as_py() or 0
    n_rej = pc.sum(pc.cast(pc.equal(status, "rejected"), pa.int64())).as_py() or 0
    n_err = pc.sum(pc.cast(pc.equal(status, "error"), pa.int64())).as_py() or 0
    b_in = pc.sum(group["bytes_in"]).as_py() or 0
    b_out = pc.sum(group["bytes_out"]).as_py() or 0
    return {
        "part_id": part_id, "rows_in": len(group), "rows_out": int(n_out),
        "rows_rejected": int(n_rej), "parse_failures": int(n_err),
        "bytes_in": int(b_in), "bytes_out": int(b_out),
        "bytes_stripped": int(b_in - b_out), "wall_ms": wall_ms,
    }


def _merge_partition_streamed(out_dir: str, part: int,
                              chunk_files: list[str], range_rows: int) -> None:
    """Phase-2 external merge with bounded memory: plan (url, warc_ts)
    ranges from the key columns only (cheap), then stream one sorted range
    at a time into a multi-row-group partition file.

    Memory high-water = one range (~range_rows rows) + the key index;
    trade-off: every chunk is decoded once per range (no random access in
    parquet).  The in-memory path remains byte-identical to round 1 for
    partitions under the threshold."""
    import pyarrow.parquet as pq

    from ocr_ray.state.manifest import StreamedPartitionWriter

    keys = pa.concat_tables([
        pq.read_table(f, columns=["url", "warc_ts"], use_threads=False)
        for f in chunk_files
    ])
    idx = pc.sort_indices(
        keys, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
    )
    s_url = keys["url"].take(idx)
    s_ts = keys["warc_ts"].take(idx)
    n = len(keys)
    bounds: list[tuple] = []  # range-open keys: range i is [bounds[i-1], bounds[i])
    pos = range_rows
    while pos < n:
        b = (s_url[pos].as_py(), s_ts[pos].as_py())
        if not bounds or b != bounds[-1]:  # giant duplicate-key runs
            bounds.append(b)
        pos += range_rows

    schema = pq.read_schema(chunk_files[0])
    writer = StreamedPartitionWriter(out_dir, part, schema)
    totals = {"rows_in": 0, "rows_out": 0, "rows_rejected": 0,
              "parse_failures": 0, "bytes_in": 0, "bytes_out": 0}
    try:
        for i in range(len(bounds) + 1):
            lo = bounds[i - 1] if i > 0 else None
            hi = bounds[i] if i < len(bounds) else None
            parts = []
            for f in chunk_files:
                t = pq.read_table(f, use_threads=False)
                mask = None
                if lo is not None:
                    ge = pc.or_(
                        pc.greater(t["url"], lo[0]),
                        pc.and_(pc.equal(t["url"], lo[0]),
                                pc.greater_equal(t["warc_ts"], pa.scalar(lo[1], t["warc_ts"].type))),
                    )
                    mask = ge
                if hi is not None:
                    lt = pc.or_(
                        pc.less(t["url"], hi[0]),
                        pc.and_(pc.equal(t["url"], hi[0]),
                                pc.less(t["warc_ts"], pa.scalar(hi[1], t["warc_ts"].type))),
                    )
                    mask = lt if mask is None else pc.and_(mask, lt)
                parts.append(t.filter(mask) if mask is not None else t)
            g = pa.concat_tables(parts)
            g = g.take(pc.sort_indices(
                g, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
            ))
            if len(g) == 0:
                continue
            writer.write(g)
            m = _partition_manifest(part, g)
            for k in totals:
                totals[k] += m[k]
    except Exception:
        writer.abort()
        raise
    writer.finalize({
        "part_id": part, **totals,
        "bytes_stripped": totals["bytes_in"] - totals["bytes_out"],
        "wall_ms": 0,
    })


# ---------------------------------------------------------------------------
# Compaction — the small-files maintenance job (lakehouse rewrite shape)
# ---------------------------------------------------------------------------

_MERGE_SUM_KEYS = ("rows_in", "rows_out", "rows_rejected", "parse_failures",
                   "bytes_in", "bytes_out", "bytes_stripped")


def compact_output(src_dir: str, dst_dir: str,
                   target_bytes: int = 64 << 20,
                   resume: bool = True) -> dict:
    """Rewrite a partitioned extraction output into fewer, larger
    partitions (the Iceberg/Delta-style COMPACTION job a 10^12-doc
    pipeline must run after fine-grained checkpointed writes, or the
    object store drowns in small files).

    Consecutive source partitions are greedily grouped until a group's
    summed ``data.parquet`` bytes reaches ``target_bytes``; one bounded
    Ray task per group concatenates the sources IN PART-ID ORDER (rows
    inside each source partition are already (url, warc_ts)-sorted, so
    the rewrite is deterministic byte-for-byte) and writes
    ``dst_dir/part=<group_idx>`` via the same atomic tmp+rename
    discipline.  The merged manifest sums the source metrics and
    records ``source_parts`` lineage, so any compacted partition can be
    traced back to the exact input shards that produced it.

    The job is itself checkpointed: ``resume=True`` skips destination
    partitions whose manifest exists, so a killed compaction continues
    where it stopped.  Nothing corpus-sized touches the driver — the
    driver sees only (group, size) metadata and per-group manifests.
    """
    import pyarrow.parquet as pq

    from ocr_ray.state import manifest as _mf

    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("compact_output requires dst_dir != src_dir "
                         "(write_partition would no-op on every group)")
    src_ids = sorted(_mf.completed_parts(src_dir))
    if not src_ids:
        raise ValueError(f"no completed partitions under {src_dir}")

    groups: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for pid in src_ids:
        sz = os.path.getsize(
            os.path.join(_mf.part_dir(src_dir, pid), "data.parquet"))
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(pid)
        cur_bytes += sz
    if cur:
        groups.append(cur)

    done = _mf.completed_parts(dst_dir) if resume else set()
    if not resume:
        _mf.clear_output(dst_dir)
    else:
        # resume safety: an existing destination group is only skippable
        # when its recorded source_parts lineage matches the recomputed
        # grouping — a different target_bytes or a grown source would
        # otherwise duplicate/drop rows silently.  Stale groups beyond
        # the new grouping are equally a parameter mismatch.
        stale = [g for g in done if g >= len(groups)]
        if stale:
            raise ValueError(
                f"dst has partitions {sorted(stale)} beyond the recomputed "
                f"{len(groups)} groups — compaction parameters or source "
                "changed; re-run with resume=False")
        for gid in sorted(done):
            with open(os.path.join(_mf.part_dir(dst_dir, gid),
                                   "manifest.json")) as f:
                recorded = json.load(f).get("source_parts")
            if recorded != groups[gid]:
                raise ValueError(
                    f"dst part {gid} was built from {recorded} but the "
                    f"recomputed group is {groups[gid]} — compaction "
                    "parameters or source changed; re-run with resume=False")

    @ray.remote(num_cpus=1)
    def compact_group(gid: int, pids: list[int]) -> dict:
        pa.set_cpu_count(1)
        tables, mans = [], []
        for pid in pids:
            d = _mf.part_dir(src_dir, pid)
            tables.append(pq.read_table(
                os.path.join(d, "data.parquet"), use_threads=False))
            with open(os.path.join(d, "manifest.json")) as f:
                mans.append(json.load(f))
        merged = pa.concat_tables(tables)
        man = {"part_id": gid, "source_parts": pids,
               **{k: int(sum(m.get(k, 0) for m in mans))
                  for k in _MERGE_SUM_KEYS},
               "wall_ms": 0}
        _mf.write_partition(dst_dir, gid, merged, man)
        return man

    todo = [(gid, pids) for gid, pids in enumerate(groups) if gid not in done]
    failed = _bounded_submit(compact_group, todo)
    summary = {
        "src_partitions": len(src_ids),
        "dst_partitions": len(groups),
        "skipped": len(groups) - len(todo),
        "target_bytes": target_bytes,
    }
    if failed:
        summary["failed_groups"] = failed
    return summary
