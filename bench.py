"""Benchmark harness — prints ONE JSON line on stdout.

Headline: the flagship extraction pipeline (gates → dual-engine extract →
url-hash partitioned checkpoint write) over a deterministic pages corpus
derived from $GRAFT_SF_DIR/documents.parquet (replicated GRAFT_BENCH_REPS
times with distinct urls — default 24).  Also times a representative query
per operator family.

Env:
  GRAFT_SF_DIR      input scale dir     (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS    ray.init num_cpus   (default 32)
  GRAFT_BENCH_REPS  corpus replication  (default 24)

``bench.py --scaling`` runs the plain bench twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus scaling efficiency (the in-sandbox evidence for the N→4N cluster
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("GRAFT_BENCH_REPS", "24"))
# shard (task) granularity: rows per input parquet file — one shard is one
# raw-task unit of work in run_extraction_sharded
ROWS_PER_FILE = int(os.environ.get("GRAFT_ROWS_PER_FILE", "512"))


def _scaling() -> None:
    """Two N→4N pairs, fresh process per level, same input.

    (8, 32) uses the WHOLE machine at the high level, so it conflates
    framework scaling with hardware frequency/memory throttling under full
    load (measured ~1.26x per-core slowdown at 32-way on this box — real
    clusters don't throttle across nodes).  (4, 16) leaves headroom at both
    levels and is the cleaner analogue of adding nodes.  Both are reported.
    """
    out = {}
    # a larger corpus for the scaling measurement so fixed per-run overhead
    # (session + pipeline setup, ~1s) doesn't dominate the high-cpu wall time
    reps = os.environ.get("GRAFT_BENCH_REPS", "96")
    n_rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "3"))
    levels = (4, 8, 16, 32)
    best: dict = {}
    # levels are INTERLEAVED round-robin (4,8,16,32, 4,8,16,32, ...) so the
    # min-of-N per level samples the same host-noise windows for every
    # level — this VM's neighbors swing throughput ±40% on minute scales,
    # and measuring levels back-to-back would attribute a noisy window to
    # one level only
    for _ in range(n_rounds):
        for ncpu in levels:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_REPS=reps,
                       GRAFT_SKIP_QUERIES="1")  # headline only
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               check=True)
            res = json.loads(r.stdout.strip().splitlines()[-1])
            if ncpu not in best or res["value"] < best[ncpu]["value"]:
                best[ncpu] = res
    for ncpu in levels:
        out[f"sec_{ncpu}"] = best[ncpu]["value"]
        out[f"docs_per_sec_{ncpu}"] = best[ncpu]["docs_per_sec"]
        out[f"mb_per_sec_{ncpu}"] = best[ncpu]["mb_per_sec"]
    # efficiency: fraction of the ideal 4x speedup achieved at each pair
    out["scaling_efficiency"] = round((out["sec_8"] / out["sec_32"]) / 4, 3)
    out["scaling_efficiency_4_16"] = round((out["sec_4"] / out["sec_16"]) / 4, 3)
    out["sf_dir"] = SF_DIR
    print(json.dumps(out))


def main() -> None:
    if "--scaling" in sys.argv:
        _scaling()
        return

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from ocr_ray.pipelines.extract import run_extraction_sharded
    from ocr_ray.sources.synth import materialize_pages_distributed
    import __ray_entry__ as entrymod

    from ocr_ray.sources.synth import CORPUS_VERSION

    tag = os.path.basename(os.path.normpath(SF_DIR))
    rpf = "" if ROWS_PER_FILE == 512 else f"_f{ROWS_PER_FILE}"
    pages_dir = materialize_pages_distributed(
        SF_DIR, f"/tmp/ocr_ray_bench_v{CORPUS_VERSION}_{tag}_r{REPS}{rpf}",
        rows_per_file=ROWS_PER_FILE, reps=REPS
    )
    # warm-up (untimed): page cache + Ray worker pool + one full pipeline
    # execution, so the timed run measures compute + I/O, not process spawn
    rd.read_parquet(pages_dir).count()
    out_dir = f"/tmp/ocr_ray_bench_out_{tag}_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    run_extraction_sharded(pages_dir, out_dir, resume=False)

    # min of two timed runs: the host VM's throughput swings on minute
    # scales (BASELINE.md variance note) — the floor is the stable signal
    headline = None
    for _ in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        summary = run_extraction_sharded(pages_dir, out_dir, resume=False)
        dt = time.monotonic() - t0
        headline = dt if headline is None else min(headline, dt)

    queries = {}
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        q = entrymod.queries()
        for name in ("q1_pricing_summary", "dedup_first_event", "event_counts",
                     "exact_dedup", "minhash_near_dup", "simhash_near_dup",
                     "winnow_near_dup", "ngram_jaccard_near_dup", "line_dedup",
                     "knn_cosine", "gate_verdicts", "token_counts",
                     "chunk_documents", "part_pair_counts", "top_bigrams_pmi",
                     "crawl_delta", "pagerank_two_iter", "reassemble_chunks",
                     "bloom_semi_join_revenue", "pack_context_windows",
                     "heavy_hitter_terms", "bigram_lm_scores",
                     "near_dup_filter_stats", "bpe_merges",
                     "dup_span_stats", "semdedup_stats",
                     "near_dup_agreement", "kmeans_embeddings",
                     "dsir_select_stats", "outlink_stats",
                     "bitext_mining_margin", "cms_freq_estimates",
                     "record_event_stats", "scd2_doc_history",
                     "standing_query_matches", "bm25_search_deleted",
                     "cdc_chunk_stats", "pq_adc_search",
                     "late_event_stats", "rake_keyphrases",
                     "dup_ngram_coverage", "langid_rank_profile",
                     "dbscan_core_points", "map_at_k",
                     "kleinberg_burst_viterbi", "bom_cost_rollup",
                     "link_prediction_scores"):
            t0 = time.monotonic()
            res = q[name](SF_DIR)
            if hasattr(res, "to_pandas"):
                res.to_pandas()
            queries[name] = round(time.monotonic() - t0, 3)

    ray.shutdown()

    docs = summary["rows_in"]
    mb = summary["bytes_in"] / 1e6
    print(json.dumps({
        "metric": "end_to_end_extraction_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": docs,
        "docs_per_sec": round(docs / headline, 1),
        "mb_per_sec": round(mb / headline, 2),
        "reps": REPS,
    }))


if __name__ == "__main__":
    main()
