"""Pipeline-level invariants (FIXTURES.md §5): byte-identical output vs the
single-process oracle under arbitrary partitioning, resume correctness, and
full row accounting."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ocr_ray.config import PipelineConfig
from ocr_ray.oracle import extract_single_process
from ocr_ray.pipelines.extract import extraction_dataset, run_extraction
from ocr_ray.sources.synth import fixture_pages, pages_from_documents
from ocr_ray.state.manifest import completed_parts, load_manifests


def _sorted(t: pa.Table) -> pa.Table:
    idx = pc.sort_indices(t, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")])
    return t.take(idx).combine_chunks()


def _read_out(out_dir: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    return _sorted(pa.concat_tables([pq.read_table(f) for f in files]))


@pytest.fixture(scope="module")
def oracle_fixture():
    return _sorted(extract_single_process(fixture_pages()))


def test_pipeline_equals_oracle_on_fixtures(ray_session, oracle_fixture, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("out_fixtures"))
    ds = rd.from_arrow(fixture_pages()).repartition(5)
    run_extraction(ds, out, resume=False)
    got = _read_out(out)
    want = oracle_fixture
    assert got.num_rows == want.num_rows
    for col in ("url", "extracted_text", "spans", "n_blocks", "engine",
                "parse_status", "reject_reason", "part_id"):
        assert got[col].to_pylist() == want[col].to_pylist(), col


def test_partitioning_invariance(ray_session, tmp_path_factory):
    """Same bytes regardless of input block layout (1 block vs many)."""
    import ray.data as rd

    t = fixture_pages()
    outs = []
    for nparts in (1, 7):
        out = str(tmp_path_factory.mktemp(f"out_inv{nparts}"))
        run_extraction(rd.from_arrow(t).repartition(nparts), out, resume=False)
        outs.append(_read_out(out))
    assert outs[0].equals(outs[1])


def test_resume_skips_done_and_completes(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("out_resume"))
    ds = rd.from_arrow(fixture_pages())
    run_extraction(ds, out, resume=False)
    full = _read_out(out)
    done_before = completed_parts(out)
    # knock out two partitions, rerun with resume
    victims = sorted(done_before)[:2]
    for pid in victims:
        shutil.rmtree(os.path.join(out, f"part={pid:05d}"))
    summary = run_extraction(rd.from_arrow(fixture_pages()), out, resume=True)
    assert completed_parts(out) == done_before
    assert _read_out(out).equals(full)
    assert summary["rows_in"] == full.num_rows


def test_row_accounting_and_manifest_consistency(ray_session, tmp_path_factory):
    """output ∪ rejects covers every input row exactly once; manifest
    parse_failures == count of parse_status='error' rows (FIXTURES.md §5.2)."""
    import ray.data as rd

    t = pages_from_documents("/root/testdata/sf0.001")
    out = str(tmp_path_factory.mktemp("out_acct"))
    summary = run_extraction(rd.from_arrow(t), out, resume=False)
    got = _read_out(out)
    assert got.num_rows == t.num_rows == summary["rows_in"]
    # key (url, warc_ts) appears exactly once
    keys = list(zip(got["url"].to_pylist(), got["warc_ts"].to_pylist()))
    assert len(set(keys)) == len(keys)
    manifests = load_manifests(out)
    n_err = sum(m["parse_failures"] for m in manifests)
    assert n_err == got.filter(pc.equal(got["parse_status"], "error")).num_rows
    # gate purity: re-running the gate on input rows reproduces verdicts
    from ocr_ray.functions.gates import pre_classify
    re_gate = pre_classify(_sorted(t))
    rejected = pc.equal(got["parse_status"], "rejected").to_pylist()
    assert [not c for c in re_gate["is_candidate"].to_pylist()] == rejected


def test_documents_corpus_matches_oracle(ray_session, tmp_path_factory):
    """The sf0.001-derived corpus: distributed == single-process, bytewise."""
    import ray.data as rd

    t = pages_from_documents("/root/testdata/sf0.001")
    want = _sorted(extract_single_process(t))
    out = str(tmp_path_factory.mktemp("out_docs"))
    run_extraction(rd.from_arrow(t).repartition(9), out, resume=False)
    got = _read_out(out)
    assert got["extracted_text"].to_pylist() == want["extracted_text"].to_pylist()
    assert got["spans"].to_pylist() == want["spans"].to_pylist()


def test_span_offsets_roundtrip(ray_session):
    """decoded[start:end] reproduces each block's text (FIXTURES.md §5.3)."""
    t = extract_single_process(fixture_pages())
    for i in range(t.num_rows):
        txt = t["extracted_text"][i].as_py()
        for s in t["spans"][i].as_py():
            seg = txt[s["start"]:s["end"]]
            assert len(seg) == s["end"] - s["start"]
            assert seg == seg.strip()


def test_custom_config_partitions(ray_session, tmp_path_factory):
    import ray.data as rd

    cfg = PipelineConfig(num_output_partitions=4)
    out = str(tmp_path_factory.mktemp("out_cfg"))
    run_extraction(rd.from_arrow(fixture_pages()), out, cfg=cfg, resume=False)
    assert completed_parts(out) == {0, 1, 2, 3}


def test_sharded_corrupt_shard_recorded_not_fatal(ray_session, tmp_path_factory):
    """A corrupt input shard fails after retries but the run completes,
    reports the shard, and leaves it resumable."""
    import shutil

    from ocr_ray.pipelines.extract import run_extraction_sharded
    from ocr_ray.sources.synth import materialize_pages_parquet
    from ocr_ray.state.manifest import completed_parts

    src = materialize_pages_parquet(
        "/root/testdata/sf0.001", "/tmp/pages_corrupt_t", rows_per_file=128)
    work = str(tmp_path_factory.mktemp("corrupt_in"))
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(work, f))
    files = sorted(f for f in os.listdir(work) if f.endswith(".parquet"))
    with open(os.path.join(work, files[1]), "wb") as fh:
        fh.write(b"not a parquet file at all")

    out = str(tmp_path_factory.mktemp("corrupt_out"))
    summary = run_extraction_sharded(work, out, resume=False)
    assert summary.get("failed_shards") == [1]
    assert 1 not in completed_parts(out)
    assert summary["partitions"] == len(files) - 1
    # repair the shard; resume completes just the missing partition
    shutil.copy(os.path.join(src, files[1]), os.path.join(work, files[1]))
    summary2 = run_extraction_sharded(work, out, resume=True)
    assert "failed_shards" not in summary2
    assert summary2["partitions"] == len(files)


def test_concurrent_partition_write_race(ray_session, tmp_path_factory):
    """Two writers racing on the same partition: exactly one rename wins,
    the loser discards, data stays consistent (task-retry idempotency)."""
    import pyarrow as pa

    from ocr_ray.state.manifest import completed_parts, write_partition

    out = str(tmp_path_factory.mktemp("race"))
    t1 = pa.table({"a": [1, 2, 3]})
    t2 = pa.table({"a": [1, 2, 3]})
    r1 = write_partition(out, 7, t1, {"part_id": 7, "rows_in": 3})
    r2 = write_partition(out, 7, t2, {"part_id": 7, "rows_in": 999})
    assert r1 is True and r2 is False
    assert completed_parts(out) == {7}
    import json
    with open(os.path.join(out, "part=00007", "manifest.json")) as f:
        assert json.load(f)["rows_in"] == 3  # first writer's manifest survives
    # no orphan tmp dirs left behind
    assert not [d for d in os.listdir(out) if d.startswith("_tmp-")]


def test_urlhash_two_phase_equals_groupby(ray_session, tmp_path_factory):
    """The explicit two-phase exchange produces byte-identical partitions
    to the Dataset groupby path, and resumes."""
    from ocr_ray.pipelines.extract import run_extraction, run_extraction_urlhash
    from ocr_ray.sources.synth import materialize_pages_parquet

    src = materialize_pages_parquet(
        "/root/testdata/sf0.001", "/tmp/pages_uh_t", rows_per_file=128)
    a = str(tmp_path_factory.mktemp("uh_groupby"))
    b = str(tmp_path_factory.mktemp("uh_twophase"))
    run_extraction(src, a, resume=False)
    run_extraction_urlhash(src, b, resume=False)
    assert _read_out(a).equals(_read_out(b))
    # resume: knock out one partition, rerun
    shutil.rmtree(os.path.join(b, "part=00005"))
    run_extraction_urlhash(src, b, resume=True)
    assert _read_out(a).equals(_read_out(b))


def test_incremental_delta_equals_full_and_touches_only_new(
        ray_session, tmp_path_factory):
    """Base run at checkpoint T + delta run over the same input equals a
    full run byte-for-byte, the delta opens/rewrites ONLY the partitions
    new rows hash into, and re-running the delta is a no-op."""
    import pandas as pd
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.extract import (run_extraction,
                                           run_extraction_incremental,
                                           stable_part_id)
    from ocr_ray.sources.synth import materialize_pages_parquet

    src = materialize_pages_parquet(
        "/root/testdata/sf0.001", "/tmp/pages_incr_t", rows_per_file=128)
    keys = pads.dataset(src).to_table(columns=["url", "warc_ts"])
    ts = sorted(keys["warc_ts"].to_pylist())
    mid = pd.Timestamp(ts[-9])                   # small delta tail: some
    new_urls = [u for u, t in zip(keys["url"].to_pylist(),
                                  keys["warc_ts"].to_pylist())
                if pd.Timestamp(t) > mid]        # parts get no new rows
    expect_touched = sorted(set(stable_part_id(new_urls, 16)))
    assert 0 < len(expect_touched) < 16, "split must leave untouched parts"

    full = str(tmp_path_factory.mktemp("incr_full"))
    run_extraction(src, full, resume=False)

    incr = str(tmp_path_factory.mktemp("incr_delta"))
    base = rd.read_parquet(
        src, filter=(pads.field("warc_ts") <= pads.scalar(mid)))
    run_extraction(base, incr, resume=False)
    before = {p: os.stat(os.path.join(incr, p, "data.parquet")).st_mtime_ns
              for p in os.listdir(incr) if p.startswith("part=")}
    summary = run_extraction_incremental(src, incr, mid)
    assert summary["parts_touched"] == expect_touched
    assert summary["rows_added"] == len(new_urls)
    # untouched partitions were not rewritten (same inode mtime)
    for p, m in before.items():
        pid = int(p.split("=")[1])
        if pid not in expect_touched:
            assert os.stat(
                os.path.join(incr, p, "data.parquet")).st_mtime_ns == m
    # byte parity with the full run, per partition
    for p in sorted(os.listdir(full)):
        if not p.startswith("part="):
            continue
        a = open(os.path.join(full, p, "data.parquet"), "rb").read()
        b = open(os.path.join(incr, p, "data.parquet"), "rb").read()
        assert a == b, f"{p} differs from full run"
        ma = json.load(open(os.path.join(full, p, "manifest.json")))
        mb = json.load(open(os.path.join(incr, p, "manifest.json")))
        ma.pop("wall_ms"), mb.pop("wall_ms")
        assert ma == mb
    # idempotency: re-running the delta adds nothing and rewrites nothing
    after = {p: os.stat(os.path.join(incr, p, "data.parquet")).st_mtime_ns
             for p in os.listdir(incr) if p.startswith("part=")}
    summary2 = run_extraction_incremental(src, incr, mid)
    assert summary2["rows_added"] == 0
    for p, m in after.items():
        assert os.stat(
            os.path.join(incr, p, "data.parquet")).st_mtime_ns == m


def test_incremental_merge_recovers_from_swap_crash(ray_session,
                                                    tmp_path_factory):
    """replace_partition's crash window (old dir renamed aside, new dir
    not yet in place) must not lose base rows: latest_partition_data
    falls back to the _old- copy, so a re-run of the delta reproduces
    the fully-merged partition."""
    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.extract import (run_extraction,
                                           run_extraction_incremental)
    from ocr_ray.sources.synth import materialize_pages_parquet
    from ocr_ray.state.manifest import latest_partition_data

    src = materialize_pages_parquet(
        "/root/testdata/sf0.001", "/tmp/pages_incr_t", rows_per_file=128)
    keys = pads.dataset(src).to_table(columns=["warc_ts"])
    mid = pd.Timestamp(sorted(keys["warc_ts"].to_pylist())[-9])

    full = str(tmp_path_factory.mktemp("swap_full"))
    run_extraction(src, full, resume=False)
    incr = str(tmp_path_factory.mktemp("swap_delta"))
    base = rd.read_parquet(
        src, filter=(pads.field("warc_ts") <= pads.scalar(mid)))
    run_extraction(base, incr, resume=False)
    summary = run_extraction_incremental(src, incr, mid)
    victim = summary["parts_touched"][0]

    # simulate the crash window: the merged dir renamed aside, no live dir
    live = os.path.join(incr, f"part={victim:05d}")
    os.rename(live, os.path.join(incr, f"_old-{victim:05d}-deadbeef"))
    assert latest_partition_data(incr, victim) is not None

    # a resumed delta rebuilds the partition from the _old fallback;
    # the watermark sees the already-merged rows, so nothing duplicates
    summary2 = run_extraction_incremental(src, incr, mid)
    assert victim in summary2["parts_touched"] or os.path.isdir(live)
    a = open(os.path.join(full, f"part={victim:05d}", "data.parquet"),
             "rb").read()
    b = open(os.path.join(incr, f"part={victim:05d}", "data.parquet"),
             "rb").read()
    assert a == b


def test_urlhash_corrupt_shard_skips_merge_and_resumes(ray_session, tmp_path_factory):
    """A phase-1 shard failure must NOT let phase 2 finalize partitions
    with silently-missing rows: the run reports failed_shards, completes no
    partition, keeps _chunks/ for resume — and the repaired resume produces
    output byte-identical to a clean run."""
    import shutil

    from ocr_ray.pipelines.extract import run_extraction_urlhash
    from ocr_ray.sources.synth import materialize_pages_parquet
    from ocr_ray.state.manifest import completed_parts

    src = materialize_pages_parquet(
        "/root/testdata/sf0.001", "/tmp/pages_uh_t", rows_per_file=128)
    work = str(tmp_path_factory.mktemp("uh_corrupt_in"))
    for f in sorted(os.listdir(src)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(work, f))
    files = sorted(f for f in os.listdir(work) if f.endswith(".parquet"))
    with open(os.path.join(work, files[1]), "wb") as fh:
        fh.write(b"not a parquet file at all")

    out = str(tmp_path_factory.mktemp("uh_corrupt_out"))
    summary = run_extraction_urlhash(work, out, resume=False)
    assert summary.get("failed_shards") == [1]
    assert completed_parts(out) == set()          # phase 2 never ran
    assert os.path.isdir(os.path.join(out, "_chunks"))  # kept for resume

    # repair; the resume retries ONLY the failed shard (markers skip the
    # rest), merges, and matches a clean run bit-for-bit
    shutil.copy(os.path.join(src, files[1]), os.path.join(work, files[1]))
    summary2 = run_extraction_urlhash(work, out, resume=True)
    assert "failed_shards" not in summary2
    assert "failed_partitions" not in summary2
    assert not os.path.isdir(os.path.join(out, "_chunks"))

    clean = str(tmp_path_factory.mktemp("uh_clean_out"))
    run_extraction_urlhash(src, clean, resume=False)
    assert _read_out(out).equals(_read_out(clean))


def test_urlhash_partitioning_defuses_zipf_host_skew(ray_session, tmp_path_factory):
    """FIXTURES §1 skew knob: with a Zipf host distribution (host-00 ~50% of
    urls), crc32(url)-hash partitions stay balanced — host-level skew never
    reaches the workers."""
    import collections

    import pyarrow as pa

    from ocr_ray.pipelines.extract import stable_part_id
    from ocr_ray.sources.synth import _single_rep_table

    t = _single_rep_table("/root/testdata/sf0.001", 0, zipf_hosts=True)
    urls = t["url"].to_pylist()
    hosts = collections.Counter(u.split("/")[2] for u in urls)
    top_host_share = hosts.most_common(1)[0][1] / len(urls)
    assert top_host_share > 0.4          # the skew is real (host-00 ~50%)

    parts = collections.Counter(stable_part_id(urls, 16))
    shares = [parts[p] / len(urls) for p in range(16)]
    assert max(shares) < 0.12            # partitions stay near-uniform (1/16±)


def test_urlhash_streamed_merge_equals_in_memory(ray_session, tmp_path_factory):
    """Phase-2 ranged streaming merge (merge_rows_in_memory exceeded)
    produces the same ROWS in the same order as the in-memory path —
    multiple row groups, identical content."""
    from ocr_ray.pipelines.extract import run_extraction_urlhash
    from ocr_ray.sources.synth import materialize_pages_parquet

    src = materialize_pages_parquet(
        "/root/testdata/sf0.001", "/tmp/pages_uh_t", rows_per_file=128)
    a = str(tmp_path_factory.mktemp("uh_mem"))
    b = str(tmp_path_factory.mktemp("uh_stream"))
    run_extraction_urlhash(src, a, resume=False)
    # threshold of 8 rows forces the streamed path with several ranges
    sb = run_extraction_urlhash(src, b, resume=False, merge_rows_in_memory=8)
    sa = run_extraction_urlhash(src, a, resume=True)  # summary of a
    assert sa == sb                       # manifests aggregate identically
    ta, tb = _read_out(a), _read_out(b)
    assert ta.equals(tb)                  # same rows, same order


def test_urlhash_corrupt_chunk_reports_failed_partition_and_resumes(
        ray_session, tmp_path_factory):
    """Phase-2 failure surface: a partition whose chunk merge fails is
    reported as failed_partitions, gets no manifest, and _chunks/ is kept
    so the repaired resume re-merges WITHOUT redoing phase 1 — and the
    final output is byte-identical to a clean run."""
    from ocr_ray.pipelines.extract import run_extraction_urlhash
    from ocr_ray.sources.synth import materialize_pages_parquet
    from ocr_ray.state.manifest import completed_parts

    src = materialize_pages_parquet(
        "/root/testdata/sf0.001", "/tmp/pages_uh_t", rows_per_file=128)
    out = str(tmp_path_factory.mktemp("uh_chunk_out"))

    # pre-seed a corrupt chunk in partition 3: phase 1 writes its real
    # chunks alongside, phase 2's merge of part 3 then fails on it
    pdir = os.path.join(out, "_chunks", "part=00003")
    os.makedirs(pdir)
    with open(os.path.join(pdir, "shard-99999.parquet"), "wb") as fh:
        fh.write(b"garbage, not parquet")

    summary = run_extraction_urlhash(src, out, resume=True)
    assert summary.get("failed_partitions") == [3]
    assert "failed_shards" not in summary
    done = completed_parts(out)
    assert 3 not in done and len(done) == 15      # only part 3 failed
    assert os.path.isdir(os.path.join(out, "_chunks"))  # kept: no phase-1 redo

    # phase-1 markers must all exist — the resume below re-merges only
    markers = [f for f in os.listdir(os.path.join(out, "_chunks"))
               if f.startswith("_shard-") and f.endswith(".done")]
    n_shards = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert len(markers) == n_shards

    os.remove(os.path.join(pdir, "shard-99999.parquet"))   # repair
    summary2 = run_extraction_urlhash(src, out, resume=True)
    assert "failed_partitions" not in summary2
    assert "failed_shards" not in summary2
    assert completed_parts(out) == set(range(16))
    assert not os.path.isdir(os.path.join(out, "_chunks"))

    clean = str(tmp_path_factory.mktemp("uh_chunk_clean"))
    run_extraction_urlhash(src, clean, resume=False)
    assert _read_out(out).equals(_read_out(clean))


def test_compact_output_preserves_rows_and_lineage(ray_session, tmp_path_factory):
    """Compaction rewrite: fewer partitions, byte-identical row set,
    summed metrics, source_parts lineage covering every input exactly
    once, and a checkpointed (resumable) job."""
    import json

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.extract import compact_output, run_extraction_sharded
    from ocr_ray.sources.synth import materialize_pages_parquet
    from ocr_ray.state import manifest as mf

    base = tmp_path_factory.mktemp("compact")
    pages = materialize_pages_parquet(
        "/root/testdata/sf0.001", str(base / "pages"), rows_per_file=64)
    src = str(base / "out_src")
    run_extraction_sharded(pages, src, resume=False)
    src_ids = sorted(mf.completed_parts(src))
    assert len(src_ids) > 3

    dst = str(base / "out_dst")
    summary = compact_output(src, dst, target_bytes=1 << 20, resume=False)
    dst_ids = sorted(mf.completed_parts(dst))
    assert summary["dst_partitions"] == len(dst_ids)
    assert len(dst_ids) < len(src_ids)

    def read_all(d, ids):
        import pyarrow as pa
        ts = [pq.read_table(f"{d}/part={i:05d}/data.parquet") for i in ids]
        t = pa.concat_tables(ts)
        return t.take(pc.sort_indices(
            t, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]))

    assert read_all(src, src_ids).equals(read_all(dst, dst_ids))

    covered, rows = [], 0
    for i in dst_ids:
        with open(f"{dst}/part={i:05d}/manifest.json") as f:
            man = json.load(f)
        covered.extend(man["source_parts"])
        rows += man["rows_in"]
    assert sorted(covered) == src_ids
    assert rows == sum(
        json.load(open(f"{src}/part={i:05d}/manifest.json"))["rows_in"]
        for i in src_ids)

    # resumable: a second run skips every group
    summary2 = compact_output(src, dst, target_bytes=1 << 20, resume=True)
    assert summary2["skipped"] == summary2["dst_partitions"]


def test_compact_output_resume_mismatch_refuses(ray_session, tmp_path_factory):
    """Resuming a compaction with different parameters (or a changed
    source) must refuse instead of silently duplicating rows."""
    import pytest

    from ocr_ray.pipelines.extract import compact_output, run_extraction_sharded
    from ocr_ray.sources.synth import materialize_pages_parquet

    base = tmp_path_factory.mktemp("compact_resume")
    pages = materialize_pages_parquet(
        "/root/testdata/sf0.001", str(base / "pages"), rows_per_file=64)
    src = str(base / "src")
    run_extraction_sharded(pages, src, resume=False)
    dst = str(base / "dst")
    compact_output(src, dst, target_bytes=1 << 30, resume=False)  # 1 group
    # finer target on resume -> group 0's lineage no longer matches
    with pytest.raises(ValueError, match="re-run with resume=False"):
        compact_output(src, dst, target_bytes=1 << 10, resume=True)
    # self-compaction is rejected outright
    with pytest.raises(ValueError, match="dst_dir != src_dir"):
        compact_output(src, src)
