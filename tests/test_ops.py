"""Tests for the wider operator surface: QC verdicts, windows, dedup
kernels, similarity search, multimodal stub plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_ray.pipelines.dedup import (
    hamming64,
    jaccard,
    minhash_signature,
    simhash64,
)
from ocr_ray.stages.multimodal import MEDIA_FEATURES_SCHEMA, MediaFeatureExtractor
from ocr_ray.stages.qc import qc_verdict_batch


def test_qc_verdicts():
    t = pa.table({
        "extracted_text": ["the quick brown fox", "alpha beta gamma", "", "words here"],
        "text": ["the quick brown fox jumps", "unrelated totally different thing", "raw", ""],
    })
    out = qc_verdict_batch(t)
    assert out["qc_status"].to_pylist() == ["MATCH", "MISMATCH", "NOT_FOUND", "NOT_FOUND"]
    assert out["overlap_pct"].to_pylist()[0] == 100


def test_minhash_similarity_monotone():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a.replace("lazy", "sleepy")
    c = "completely different words entirely unrelated content " * 10
    sa, sb, sc = minhash_signature(a), minhash_signature(b), minhash_signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    # true jaccard(a,b) ≈ 0.5 (one word changed in a repeated sentence);
    # the 64-perm estimate should land near it and far above jaccard(a,c)=0
    assert abs(sim_ab - jaccard(a, b)) < 0.2
    assert sim_ab > 0.3 > sim_ac
    # deterministic across calls
    assert (minhash_signature(a) == sa).all()


def test_jaccard_kernel():
    assert jaccard("a b c d e", "a b c d e") == 1.0
    assert jaccard("a b c d e", "v w x y z") == 0.0
    assert jaccard("", "") == 1.0


def test_simhash_locality():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a + " extra"
    c = "totally different content with other words " * 5
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    assert hamming64(ha, hb) < hamming64(ha, hc)
    assert simhash64(a) == ha  # deterministic


def test_media_header_decode():
    """Real stdlib header parsing: PNG IHDR / GIF logical screen + frame
    count / JPEG SOF0, plus empty/unsupported/corrupt statuses."""
    from ocr_ray.stages.multimodal import parse_media_header, synth_media_payload

    body = "söme textual body ✓".encode()
    t = pa.table({
        "media_id": ["png", "gif", "jpg", "txt", "empty", "null", "trunc"],
        "media": pa.array([
            synth_media_payload(0, 641, 481, 1, body),
            synth_media_payload(1, 129, 300, 3, body),
            synth_media_payload(2, 700, 123, 1, body),
            b"payload-one",
            b"",
            None,
            b"\x89PNG\r\n\x1a\nshort",      # PNG magic, truncated IHDR
        ], pa.binary()),
    })
    out = MediaFeatureExtractor()(t)
    assert out.schema.equals(MEDIA_FEATURES_SCHEMA)
    assert out["decode_status"].to_pylist() == [
        "ok", "ok", "ok", "unsupported", "empty", "empty", "corrupt"]
    assert out["width"].to_pylist()[:3] == [641, 129, 700]
    assert out["height"].to_pylist()[:3] == [481, 300, 123]
    assert out["n_frames"].to_pylist()[:3] == [1, 3, 1]
    # deterministic
    assert out.equals(MediaFeatureExtractor()(t))
    # parser round-trips the generator for every kind
    for kind in (0, 1, 2):
        w, h, f, s = parse_media_header(synth_media_payload(kind, 11, 22, 2, b"x"))
        assert (w, h, s) == (11, 22, "ok")
        assert f == (2 if kind == 1 else 1)


def test_media_real_codec_gated():
    """Pixel-level transcode (resize) is the one remaining declared stub."""
    from ocr_ray.stages.multimodal import MediaResizeStage

    t = pa.table({"media_id": ["a"], "media": pa.array([b"x"], pa.binary())})
    with pytest.raises(NotImplementedError):
        MediaResizeStage(use_real_codec=True)(t)


def test_session_window_logic(ray_session):
    from ocr_ray.pipelines.windows import session_windows

    out = session_windows("/root/testdata/sf0.001").to_pandas()
    assert (out["n_events"] >= 1).all()
    # sessions of one user are disjoint and ordered
    one = out[out["user_id"] == out["user_id"].iloc[0]].sort_values("session_id")
    assert one["session_start"].is_monotonic_increasing


def test_knn_contains_query_itself(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import knn_cosine

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    q = t["embedding"][t["vec_id"].to_pylist().index(0)].as_py()
    top = knn_cosine(ds, q, k=5)
    assert top["vec_id"].to_pylist()[0] == 0
    assert top["sim"].to_pylist()[0] == 1.0


def test_filter_blocks_stats(ray_session):
    from ocr_ray.pipelines.filter_blocks import filter_stats
    from ocr_ray.sources.synth import materialize_pages_parquet

    p = materialize_pages_parquet("/root/testdata/sf0.001", "/tmp/pages_ops_t", rows_per_file=256)
    out = filter_stats(p).to_pandas()
    assert len(out) == 522
    hit = out[out["n_dollar_blocks"] > 0]
    assert len(hit) > 0            # table rows with $ amounts exist (doc_id%7)
    assert (out["n_kept_blocks"] <= out["n_blocks"]).all()
    assert (out["reduction_pct"] >= 0).all()


def test_field_extraction_kernel():
    import pyarrow as pa

    from ocr_ray.functions.fields import extract_fields

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "reach me at jo.doe@corp.io or (555) 123-4567 by 12/31/2024 for $1,234.56",
            "checklist [X] then [x] see https://a.example/x?q=1 on 2024-02-29",
            "nothing here but $0.00 and $",
        ],
    })
    out = extract_fields(t)
    assert out["first_email"].to_pylist() == ["jo.doe@corp.io", None, None]
    assert out["first_phone"].to_pylist()[0] == "(555) 123-4567"
    assert out["first_date_us"].to_pylist()[0] == "12/31/2024"
    assert out["first_date_iso"].to_pylist()[1] == "2024-02-29"
    assert out["first_url"].to_pylist()[1] == "https://a.example/x?q=1"
    assert out["first_dollar"].to_pylist() == ["$1,234.56", None, "$0"]  # E8 cleanup
    assert out["n_checkboxes"].to_pylist() == [0, 2, 0]


def test_coverage_classifier_rules():
    from ocr_ray.functions.classify import classify_name

    assert classify_name("Building #1") == "building"
    assert classify_name("Building incl Pumps and Canopy") == "other"   # combined label excluded
    assert classify_name("Business Personal Property") == "bpp"
    assert classify_name("BPP") == "bpp"
    assert classify_name("BPP Off Premises Extension") == "other"        # extension excluded
    assert classify_name("Money & Securities") == "money_securities"
    assert classify_name("Money and Securities - Counterfeit") == "other"
    assert classify_name("Business Income with Extra Expense") == "business_income"
    assert classify_name("Wind & Hail Deductible") == "other"
    assert classify_name(None) == "other"


def test_winnow_fingerprint_properties():
    from ocr_ray.functions.textstats import winnow_fingerprint

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "PREFIX then " + a + " plus a suffix"
    c = "completely different content with nothing shared at all whatsoever"
    fa, fb, fc = set(winnow_fingerprint(a)), set(winnow_fingerprint(b)), set(winnow_fingerprint(c))
    assert len(fa & fb) >= len(fa) // 2    # shared substring → shared prints
    assert not (fa & fc)
    assert winnow_fingerprint("") == []
    assert winnow_fingerprint("short") == []             # below k
    assert winnow_fingerprint(a) == winnow_fingerprint(a)  # deterministic


def test_winnow_near_dup_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import winnow_near_dup

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [base, "intro " + base + " outro",
                 "unrelated words entirely different from everything else here",
                 "another totally distinct document with its own content set"],
    })
    out = winnow_near_dup(rd.from_arrow(t)).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_ngram_jaccard_near_dup(ray_session):
    """Exact-Jaccard pairs: identical docs hit jaccard=1, a near-identical
    pair passes the 80% cutoff with exact shared/size accounting, and
    unrelated docs never pair."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import ngram_jaccard_near_dup, shingle_hashes

    base = ("the quick brown fox jumps over the lazy dog near the river bank "
            "today while the sun sets slowly behind the distant hills")
    near = base + " tonight"          # one extra word → one extra shingle
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [base, near, base,
                 "unrelated words entirely different from everything else here"],
    })
    out = ngram_jaccard_near_dup(rd.from_arrow(t)).to_pandas()
    got = {(a, b): (s, na, nb) for a, b, s, na, nb in
           zip(out["id_a"], out["id_b"], out["shared"], out["n_a"], out["n_b"])}
    n_base = len(shingle_hashes(base))
    assert got[(1, 3)] == (n_base, n_base, n_base)        # exact dup: J = 1
    assert (1, 2) in got and (2, 3) in got                # near dup passes 0.8
    s, na, nb = got[(1, 2)]
    assert s == n_base and nb == n_base + 1               # exact accounting
    assert all(4 not in p for p in got)                   # unrelated never pairs


def test_label_set_agreement(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import label_set_agreement

    labels = pa.table({"doc_id": pa.array([1, 2, 5, 9], pa.int64()),
                       "dup_of": pa.array([1, 1, 5, 5], pa.int64())})
    # a labeling against itself is perfect
    perfect = label_set_agreement(labels, labels)
    assert perfect.column_names == [
        "n_lsh", "n_exact", "n_common", "recall_bp", "precision_bp"]
    assert perfect.to_pydict() == {"n_lsh": [4], "n_exact": [4],
                                   "n_common": [4], "recall_bp": [10000],
                                   "precision_bp": [10000]}
    # partial overlap, Dataset input path
    approx = pa.table({"doc_id": pa.array([1, 2, 7], pa.int64()),
                       "dup_of": pa.array([1, 1, 7], pa.int64())})
    got = label_set_agreement(rd.from_arrow(approx).repartition(3), labels)
    assert got.to_pydict() == {"n_lsh": [3], "n_exact": [4], "n_common": [2],
                               "recall_bp": [5000], "precision_bp": [6667]}
    # empty sides
    empty = labels.slice(0, 0)
    z = label_set_agreement(empty, labels)
    assert z["recall_bp"][0].as_py() == 0 and z["n_lsh"][0].as_py() == 0
    z2 = label_set_agreement(labels, empty)
    assert z2["n_exact"][0].as_py() == 0 and z2["recall_bp"][0].as_py() == 0


def test_near_dup_incremental_index_probe(ray_session, tmp_path):
    """A new-crawl slice probed against the persisted band index flags
    exactly the planted near-copies of indexed docs, the layout is
    genuinely hive-partitioned, and the stats are partition-invariant."""
    import glob
    import os

    import ray.data as rd

    from ocr_ray.pipelines.dedup import build_minhash_index, near_dup_incremental

    base = ("the quick brown fox jumps over the lazy dog near the river bank "
            "today while the sun sets slowly behind the distant hills")
    old_rows = {i: f"unique old document number {i} about topic {i % 5} "
                   f"with extra filler words {i}" for i in range(100, 140)}
    old_rows[150] = base
    old_rows[151] = base + " tonight"
    new_rows = {
        200: base,                         # near-copy of 150/151 -> flagged
        201: "fresh new content about deep sea exploration vessels",
        202: "another brand new page on mountain weather patterns",
    }

    def tbl(rows):
        return pa.table({
            "doc_id": pa.array(sorted(rows), pa.int64()),
            "text": pa.array([rows[k] for k in sorted(rows)], pa.string()),
        })

    idx = str(tmp_path / "minhash")
    build_minhash_index(rd.from_arrow(tbl(old_rows)), idx)
    assert len(glob.glob(os.path.join(idx, "bucket=*"))) > 5  # real layout

    all_docs = {**old_rows, **new_rows}

    def run(n_parts):
        got = near_dup_incremental(
            idx,
            rd.from_arrow(tbl(new_rows)).repartition(n_parts),
            rd.from_arrow(tbl(all_docs)),
        ).to_pandas()
        return got

    a = run(2)
    assert int(a["n_new"][0]) == 3
    assert int(a["n_new_flagged"][0]) == 1           # only the near-copy
    assert int(a["n_dup_pairs"][0]) == 2             # vs 150 AND 151
    assert int(a["n_candidates"][0]) >= 2
    assert a.equals(run(1))

    # all-fresh slice: candidates may fire on band collisions but nothing
    # verifies; the stats row still comes back well-formed
    fresh = near_dup_incremental(
        idx, rd.from_arrow(tbl({300: "entirely novel text about glacier "
                                     "cave acoustics measurement rigs"})),
        rd.from_arrow(tbl({**old_rows,
                           300: "entirely novel text about glacier "
                                "cave acoustics measurement rigs"})),
    ).to_pandas()
    assert int(fresh["n_new"][0]) == 1
    assert int(fresh["n_dup_pairs"][0]) == 0
    assert int(fresh["n_new_flagged"][0]) == 0

    # forced DISTRIBUTED verify path (fuse threshold 0): the join-based
    # verify must return the same stats as the fused tail even when the
    # sparse joins emit empty blocks
    import dataclasses

    from ocr_ray.config import DEFAULT_CONFIG

    cfg0 = dataclasses.replace(DEFAULT_CONFIG, fuse_pairs_threshold=0)
    dist = near_dup_incremental(
        idx, rd.from_arrow(tbl(new_rows)), rd.from_arrow(tbl(all_docs)),
        cfg=cfg0).to_pandas()
    assert dist.equals(a)

    # continuous ingestion: after update_minhash_index ingests batch 2,
    # a batch-3 near-copy of a BATCH-2 doc is flagged; existing index
    # files are never rewritten (append-only)
    from ocr_ray.pipelines.dedup import update_minhash_index

    before = set(glob.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    update_minhash_index(idx, rd.from_arrow(tbl(new_rows)))
    after = set(glob.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    assert before < after                      # strictly appended
    all3 = {**all_docs, 400: new_rows[201] + " update"}
    b3 = near_dup_incremental(
        idx, rd.from_arrow(tbl({400: all3[400]})),
        rd.from_arrow(tbl(all3))).to_pandas()
    assert int(b3["n_new_flagged"][0]) == 1    # matched the ingested 201


def test_near_dup_filter_partition_invariance(ray_session):
    """near_dup_filter keeps exactly one representative (the min doc_id)
    per fuzzy-dup cluster plus every unclustered doc, and the survivor set
    is IDENTICAL across input partitionings (the representative is a pure
    function of the pair graph, never of block boundaries)."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import near_dup_filter

    base = ("the quick brown fox jumps over the lazy dog near the river bank "
            "today while the sun sets slowly behind the distant hills")
    other = ("completely different second cluster text about winter storms "
             "rolling across the northern coast flooding the harbor roads")
    rows = {
        1: base, 2: base + " tonight", 9: base,        # cluster → keep 1
        5: other, 7: other,                            # cluster → keep 5
        3: "unique alpha document", 4: "unique beta document",
        6: "unique gamma document", 8: "unique delta document",
    }
    t = pa.table({
        "doc_id": pa.array(list(rows), pa.int64()),
        "text": pa.array(list(rows.values()), pa.string()),
    })
    expected = {1, 3, 4, 5, 6, 8}
    got = {}
    for n_parts in (1, 7):
        surv = near_dup_filter(rd.from_arrow(t).repartition(n_parts))
        got[n_parts] = set(surv.to_pandas()["doc_id"])
    assert got[1] == expected
    assert got[7] == expected

    # precomputed-labels path (pa.Table labels, e.g. from jaccard pairs + CC)
    labels = pa.table({
        "doc_id": pa.array([1, 2, 9, 5, 7], pa.int64()),
        "dup_of": pa.array([1, 1, 1, 5, 5], pa.int64()),
    })
    surv = near_dup_filter(rd.from_arrow(t), labels=labels)
    assert set(surv.to_pandas()["doc_id"]) == expected


def test_dup_span_stats_hand_computed(ray_session):
    """ExactSubstr-style duplicated-span coverage on a constructed corpus:
    a shared 8-token span is detected in both docs (full + partial window
    accounting), unique text is untouched, and within-doc repetition
    counts toward the duplication threshold."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import dup_span_stats, window_hashes

    span = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    docs = {
        1: span + " one two three four",        # span at 0..7, 12 tokens
        2: "x y " + span,                       # span at 2..9, 10 tokens
        3: "totally unique words nowhere else repeated at all count ten",
        4: ("rep rep rep rep rep rep rep rep rep"),  # 9 tokens, within-doc
    }
    t = pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })
    out = (dup_span_stats(rd.from_arrow(t).repartition(3))
           .to_pandas().set_index("doc_id"))
    # docs 1+2 share exactly ONE duplicated window (the span itself);
    # its 8 tokens are covered in each
    assert out.loc[1, "n_dup_windows"] == 1
    assert out.loc[1, "n_covered_tokens"] == 8
    assert out.loc[1, "n_tokens"] == 12
    assert out.loc[2, "n_dup_windows"] == 1
    assert out.loc[2, "n_covered_tokens"] == 8
    # unique doc: nothing flagged
    assert out.loc[3, "n_dup_windows"] == 0
    assert out.loc[3, "n_covered_tokens"] == 0
    # within-doc repetition: "rep"x9 has two identical 8-windows → both
    # flagged, covering all 9 tokens
    assert out.loc[4, "n_dup_windows"] == 2
    assert out.loc[4, "n_covered_tokens"] == 9
    # position-preserving hash helper: strict windows only
    assert window_hashes("a b c", 8).size == 0
    assert window_hashes(span, 8).size == 1


def test_connected_components_distributed(ray_session):
    """Chain, star and singleton-pair graphs all label every member with
    the component minimum (keep-first), computed without any driver-side
    union-find (pipelines.graph)."""
    import pyarrow as pa

    from ocr_ray.pipelines.graph import connected_components

    pairs = pa.table({
        "id_a": [1, 2, 3, 50, 50, 50, 90],
        "id_b": [2, 3, 4, 51, 52, 53, 91],
    })
    expected = {
        (1, 1), (2, 1), (3, 1), (4, 1),          # chain: diameter > 1
        (50, 50), (51, 50), (52, 50), (53, 50),  # star
        (90, 90), (91, 90),                      # single pair
    }
    # single-task union-find path (default: pair set fits one worker)
    got = {(r["doc_id"], r["dup_of"])
           for r in connected_components(pairs).take_all()}
    assert got == expected
    # label-propagation path (forced: pretend the graph is too big)
    got = {(r["doc_id"], r["dup_of"])
           for r in connected_components(pairs, small_graph_edges=0).take_all()}
    assert got == expected
    empty = connected_components(pa.table({
        "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
    }))
    assert empty.num_rows == 0


def test_near_dup_path_has_no_driver_materialization():
    """The near-dup family must never collect corpus-sized intermediates
    on the driver (VERDICT r1 #1): no to_pandas()/take_all() in dedup.py
    or the label-propagation loop of graph.py."""
    import pathlib

    import ocr_ray.pipelines.dedup as dedup
    import ocr_ray.pipelines.graph as graph

    src_dedup = pathlib.Path(dedup.__file__).read_text()
    assert ".to_pandas()" not in src_dedup
    # take_all appears once: near_dup_incremental's touched-bucket rows
    # (a groupby("bucket").count() of <= n_buckets rows, never the corpus)
    assert src_dedup.count(".take_all()") == 1
    src_graph = pathlib.Path(graph.__file__).read_text()
    for line in src_graph.splitlines():
        if line.lstrip().startswith("#") or '"' in line or "``" in line:
            continue
        # worker-side per-batch frames (t.to_pandas inside map_batches
        # callbacks) are fine; Dataset-level collection is not
        assert ".to_pandas()" not in line or "t.to_pandas()" in line, line
    # take_all appears once: per-block partial SUMS (one scalar per block)
    assert src_graph.count(".take_all()") == 1


def test_filter_blocks_adjacent_hits_merge(ray_session):
    """FIXTURES 'adjacent_hits': hit blocks at distances 1-3 apart merge
    through the ±buffer into one kept window (policy_filter.py adjacency)."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.filter_blocks import filter_stats_batch
    from ocr_ray.stages.extract import Extractor
    from ocr_ray.functions.gates import pre_classify

    filler = "plain filler content long enough to form its own block here"
    # blocks: [filler, $hit, filler, $hit, filler x4] — hits 2 apart merge
    # via buffer 1 (adjacency start <= prev_end+1)
    paras = [filler, "price is $5,000 today " + filler, filler,
             "cost was $9,999 then " + filler] + [filler] * 4
    html = "<body>" + "".join(f"<p>{p}</p>" for p in paras) + "</body>"
    pages = pa.table({
        "url": ["https://x/adj"],
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([html.encode()], pa.binary()),
        "text": [" ".join(paras)],
        "lang": ["en"],
    })
    batch = Extractor()(pre_classify(pages).append_column(
        "part_id", pa.array([0], pa.int32())))
    out = filter_stats_batch(DEFAULT_CONFIG)(batch)
    assert out["n_blocks"].to_pylist() == [8]
    assert out["n_dollar_blocks"].to_pylist() == [2]
    # blocks 1 and 3 buffered ±1 → [0..4] merged window = 5 kept blocks
    assert out["n_kept_blocks"].to_pylist() == [5]
    assert out["reduction_pct"].to_pylist() == [(8 - 5) * 100 // 8]


def test_bloom_filter_properties():
    from ocr_ray.functions.bloom import BloomFilter

    bf = BloomFilter.for_capacity(1000, fp_rate=0.01)
    keys = [f"key-{i}".encode() for i in range(1000)]
    bf.add_many(keys)
    # no false negatives, ever
    assert all(k in bf for k in keys)
    # false positives bounded (loose bound: < 5% at 1% design rate)
    others = [f"other-{i}".encode() for i in range(2000)]
    fp = sum(1 for k in others if k in bf)
    assert fp < 100
    # deterministic bytes
    bf2 = BloomFilter.for_capacity(1000, fp_rate=0.01)
    bf2.add_many(keys)
    assert (bf.bits == bf2.bits).all()


def test_driver_contract_consistency():
    """Every oracle key has a query; names are unique; module import does
    not require an active Ray session."""
    import __ray_entry__ as e

    qs = e.queries()
    sq = e.oracle_sql()
    # full two-way parity: every query is oracle-checked and no oracle is
    # orphaned (the round-2+ invariant — additions may not drift)
    assert set(sq) == set(qs)
    assert len(qs) >= 74


def test_duplicate_blocks_preserved_in_page():
    """FIXTURES 'dup_blocks': identical repeated blocks within one page are
    all kept (in-page dedup is NOT extraction's job — corpus-level dedup
    operators handle repetition)."""
    from ocr_ray.stages.html_extract import extract_html

    para = "a repeated paragraph long enough to clear the block minimum rule"
    html = "<body>" + f"<p>{para}</p>" * 3 + "</body>"
    r = extract_html(html)
    assert r["n_blocks"] == 3
    assert r["extracted_text"].count(para) == 3


def test_media_resize_and_frame_sample_plumbing():
    import pyarrow as pa

    from ocr_ray.stages.multimodal import (
        FrameSampleStage, MediaResizeStage, synth_media_payload,
    )

    t = pa.table({
        "media_id": ["a", "b"],
        "media": pa.array([
            synth_media_payload(1, 320, 240, 4, b"x" * 1000),  # animated GIF
            synth_media_payload(0, 32, 16, 1, b"y" * 10),      # small PNG
        ], pa.binary()),
    })
    resized = MediaResizeStage(target_w=64, target_h=64)(t)
    assert resized.column_names == ["media_id", "media", "width", "height"]
    assert resized["width"].to_pylist() == [64, 32]     # clamp vs keep
    assert resized["height"].to_pylist() == [64, 16]
    # the big GIF shrinks by area ratio; the small PNG is untouched
    assert len(resized["media"][0].as_py()) < len(t["media"][0].as_py())
    assert resized["media"][1].as_py() == t["media"][1].as_py()
    # deterministic
    again = MediaResizeStage(target_w=64, target_h=64)(t)
    assert resized.equals(again)

    frames = FrameSampleStage(stride=1)(t)
    assert frames.column_names == ["media_id", "frame_idx", "frame_hash"]
    a_frames = [i for m, i in zip(frames["media_id"].to_pylist(),
                                  frames["frame_idx"].to_pylist()) if m == "a"]
    assert a_frames == [0, 1, 2, 3]               # 1→N explosion, all frames
    b_frames = [i for m, i in zip(frames["media_id"].to_pylist(),
                                  frames["frame_idx"].to_pylist()) if m == "b"]
    assert b_frames == [0]                        # still image → one frame


def test_knn_ivf_finds_query_and_recall(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import knn_cosine, knn_ivf

    path = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(path)
    q = t["embedding"][t["vec_id"].to_pylist().index(0)].as_py()
    ds = rd.read_parquet(path)
    approx = knn_ivf(ds, q, k=10)
    exact = knn_cosine(rd.read_parquet(path), q, k=10)
    assert approx["vec_id"].to_pylist()[0] == 0        # finds the query itself
    overlap = set(approx["vec_id"].to_pylist()) & set(exact["vec_id"].to_pylist())
    assert len(overlap) >= 3                           # reasonable recall@10
    # deterministic
    again = knn_ivf(rd.read_parquet(path), q, k=10)
    assert approx.equals(again)

def test_ann_recall_at_k(ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import ann_recall_at_k, knn_cosine, knn_lsh

    path = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(path)
    q = t["embedding"][t["vec_id"].to_pylist().index(0)].as_py()
    exact = knn_cosine(rd.read_parquet(path), q, k=10)
    approx = knn_lsh(rd.read_parquet(path), q, k=10)
    row = ann_recall_at_k(exact, approx, k=10)
    assert row.num_rows == 1
    assert row.column_names == ["k", "n_exact", "n_approx", "n_common", "recall_bp"]
    r = {c: row[c][0].as_py() for c in row.column_names}
    assert r["n_exact"] == 10 and 0 <= r["n_common"] <= 10
    assert r["recall_bp"] == round(10000 * r["n_common"] / r["n_exact"])
    # exact vs itself is perfect recall
    perfect = ann_recall_at_k(exact, exact, k=10)
    assert perfect["recall_bp"][0].as_py() == 10000
    # disjoint sets → zero recall
    other = pa.table({"vec_id": pa.array([10**9], pa.int64())})
    assert ann_recall_at_k(exact, other, k=10)["recall_bp"][0].as_py() == 0


def test_knn_label_eval(ray_session):
    """Confusion matrix over the LSH kNN vote: predictions exist for
    exactly the vectors with an in-bucket neighbor, diagonal dominates
    on the labeled testdata, and the vote is partition-invariant."""
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import knn_label_eval

    path = "/root/testdata/sf0.001/embeddings.parquet"

    def run(n_parts):
        ds = rd.read_parquet(path, columns=["vec_id", "embedding", "label"])
        return (knn_label_eval(ds.repartition(n_parts), k=5)
                .to_pandas().sort_values(["label", "pred_label"])
                .reset_index(drop=True))

    a = run(6)
    assert a["n_vecs"].sum() <= 500          # singleton buckets excluded
    assert a["n_vecs"].sum() > 400           # but most vectors predicted
    diag = a[a["label"] == a["pred_label"]]["n_vecs"].sum()
    assert diag > 0
    assert a.equals(run(2))


def test_semdedup_stats(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import semdedup_stats

    path = "/root/testdata/sf0.001/embeddings.parquet"

    def run(n_parts, threshold=0.35):
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        out = semdedup_stats(ds.repartition(n_parts), threshold=threshold)
        return out.to_pandas().sort_values("cid").reset_index(drop=True)

    a = run(7)
    assert a["n_vecs"].sum() == 500                       # every vector assigned
    assert (a["n_survivors"] <= a["n_vecs"]).all()
    assert (a["n_survivors"] >= 1).all()
    # representative choice is partition-invariant
    b = run(2)
    assert a.equals(b)
    # threshold above max cosine → nothing deduped
    c = run(3, threshold=1.5)
    assert (c["n_survivors"] == c["n_vecs"]).all()


def test_kmeans_embeddings(ray_session):
    """Distributed full-corpus Lloyd's == single-process numpy reference,
    invariant to block geometry (exact integer arithmetic everywhere)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import _r0, kmeans_embeddings

    path = "/root/testdata/sf0.001/embeddings.parquet"
    k, n_iter = 8, 3

    def run(n_parts):
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        return kmeans_embeddings(ds.repartition(n_parts), k=k, n_iter=n_iter)

    a = run(7)
    assert a.column_names == ["cid", "pos", "c_scaled", "n_members"]
    assert a.num_rows == k * 64
    # partition-invariant
    assert a.equals(run(2))

    # single-process reference (same integer semantics, no Ray)
    t = pq.read_table(path).sort_by("vec_id")
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    iv = _r0(mat * 1_000_000)
    cents = iv[:k].copy()
    counts = np.zeros(k, np.int64)
    for _ in range(n_iter):
        d = ((iv * iv).sum(1)[:, None] - 2 * (iv @ cents.T)
             + (cents * cents).sum(1)[None, :])
        assign = d.argmin(1)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        for c in range(k):
            if counts[c]:
                cents[c] = _r0(iv[assign == c].sum(0) / counts[c])
    got = a.to_pandas()
    want_c = cents.ravel()
    assert (got.sort_values(["cid", "pos"])["c_scaled"].to_numpy() == want_c).all()
    assert got.groupby("cid")["n_members"].first().to_numpy().tolist() == counts.tolist()
    assert counts.sum() == 500                      # every vector assigned


def test_kmeans_inertia_stats(ray_session):
    """Cohesion stats: counts cover the corpus, max_d bounds the mean
    member distance implied by the inertia, partition-invariant."""
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import kmeans_inertia_stats

    path = "/root/testdata/sf0.001/embeddings.parquet"

    def run(n_parts):
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        return (kmeans_inertia_stats(ds.repartition(n_parts), k=8, n_iter=3)
                .to_pandas().sort_values("cid").reset_index(drop=True))

    a = run(5)
    assert a["n_members"].sum() == 500
    # per-cluster mean distance (milli^2 units) can't exceed max_d
    mean_milli = a["inertia_milli"] / a["n_members"]
    assert (mean_milli * 1_000_000 <= a["max_d"] + 500_000).all()
    assert (a["max_d"] > 0).all()
    assert a.equals(run(3))


def test_kmeans_cluster_profile(ray_session):
    """Label cross-tab under the final centroids: every vector appears
    exactly once, labels stay within the corpus label set, and the
    cross-tab is partition-invariant."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import kmeans_cluster_profile

    path = "/root/testdata/sf0.001/embeddings.parquet"

    def run(n_parts):
        ds = rd.read_parquet(path, columns=["vec_id", "embedding", "label"])
        return (kmeans_cluster_profile(ds.repartition(n_parts), k=8, n_iter=3)
                .to_pandas().sort_values(["cid", "label"])
                .reset_index(drop=True))

    a = run(5)
    assert a["n_vecs"].sum() == 500
    labels = set(pq.read_table(path, columns=["label"])["label"].to_pylist())
    assert set(a["label"]) <= labels
    assert set(a["cid"]) <= set(range(8))
    assert a.equals(run(2))


def test_ann_indexed_layout_equals_scan_path(ray_session, tmp_path_factory):
    """Partition-pruned index layouts return EXACTLY the scan-path result,
    and a query touches only its probe partitions."""
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import (
        build_ivf_index, build_lsh_index, knn_ivf, knn_ivf_indexed,
        knn_lsh, knn_lsh_indexed, lsh_bucket,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(path)
    q = t["embedding"][t["vec_id"].to_pylist().index(0)].as_py()

    lsh_dir = str(tmp_path_factory.mktemp("ann") / "lsh")
    build_lsh_index(rd.read_parquet(path), lsh_dir)
    got = knn_lsh_indexed(lsh_dir, q, k=10)
    want = knn_lsh(rd.read_parquet(path), q, k=10)
    assert got.equals(want)
    # every corpus row landed in exactly one bucket partition
    n_indexed = sum(pq.read_table(f).num_rows
                    for f in glob.glob(os.path.join(lsh_dir, "bucket=*", "*.parquet")))
    assert n_indexed == t.num_rows
    # the probe partition is a strict subset of the corpus bytes
    qb = int(lsh_bucket(np.asarray(q, np.float64).reshape(1, -1))[0])
    probe_rows = sum(pq.read_table(f).num_rows
                     for f in glob.glob(os.path.join(lsh_dir, f"bucket={qb}", "*.parquet")))
    assert 0 < probe_rows < t.num_rows

    ivf_dir = str(tmp_path_factory.mktemp("ann") / "ivf")
    build_ivf_index(rd.read_parquet(path), ivf_dir)
    got = knn_ivf_indexed(ivf_dir, q, k=10)
    want = knn_ivf(rd.read_parquet(path), q, k=10)
    assert got.equals(want)


def test_pair_bucket_skew_proof():
    """Adversarial id distributions (every id ≡ 0 mod 8) spread across
    buckets — the splitmix64 pair hash has no low-bit structure, unlike
    the round-3 low-3-bit bucketing which collapsed them onto bucket 0."""
    from ocr_ray.pipelines.dedup import pair_bucket

    ids = np.arange(0, 8 * 512, 8, dtype=np.int64)   # 512 pairs, ids ≡ 0 (mod 8)
    t = pa.table({"id_a": ids, "id_b": ids + 8})
    b = pair_bucket(t, 64)["pbucket"].to_numpy(zero_copy_only=False)
    counts = np.bincount(b, minlength=64)
    assert (counts > 0).sum() >= 48                  # most buckets populated
    assert counts.max() <= 4 * len(ids) // 64        # none grossly hot
    # deterministic across calls (shuffle keys must be stable)
    b2 = pair_bucket(t, 64)["pbucket"].to_numpy(zero_copy_only=False)
    assert (b == b2).all()


def test_knn_lsh_multiprobe_recall(ray_session, tmp_path_factory):
    """Multi-probe LSH: n_probe=1 stays byte-identical to the scan path
    (the oracle contract) and hamming-1 multi-probe recall vs the exact
    top-k is >= single-probe recall while still reading a strict subset
    of the index partitions."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import (
        build_lsh_index, knn_cosine, knn_lsh, knn_lsh_indexed,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(path)
    q = t["embedding"][t["vec_id"].to_pylist().index(0)].as_py()

    lsh_dir = str(tmp_path_factory.mktemp("annmp") / "lsh")
    build_lsh_index(rd.read_parquet(path), lsh_dir)

    single = knn_lsh_indexed(lsh_dir, q, k=10, n_probe=1)
    assert single.equals(knn_lsh(rd.read_parquet(path), q, k=10))

    multi = knn_lsh_indexed(lsh_dir, q, k=10, n_probe=9)
    exact = knn_cosine(rd.read_parquet(path), q, k=10)
    exact_ids = set(exact["vec_id"].to_pylist())
    r1 = len(set(single["vec_id"].to_pylist()) & exact_ids) / len(exact_ids)
    r9 = len(set(multi["vec_id"].to_pylist()) & exact_ids) / len(exact_ids)
    assert r9 >= r1
    # multi-probe is deterministic
    assert multi.equals(knn_lsh_indexed(lsh_dir, q, k=10, n_probe=9))


def test_media_header_edge_cases():
    """Public-parser hardening: JPEG fill bytes / standalone markers, and
    GIF GCE-pattern coincidences in header or body bytes (ADVICE r3)."""
    from ocr_ray.stages.multimodal import parse_media_header, synth_media_payload

    # JPEG: 0xFF fill bytes and length-less standalone markers (TEM, RST1)
    jpeg = (b"\xff\xd8"
            + b"\xff\xff\xff\x01"            # fill, fill, TEM (standalone)
            + b"\xff\xd1"                     # RST1 (standalone)
            + b"\xff\xe0\x00\x04\x00\x00"     # APP0, len 4
            + b"\xff\xc0\x00\x11\x08" + (99).to_bytes(2, "big")
            + (77).to_bytes(2, "big") + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
            + b"\xff\xd9")
    assert parse_media_header(jpeg) == (77, 99, 1, "ok")
    # malformed: a segment length < 2 must not loop or crash
    assert parse_media_header(b"\xff\xd8\xff\xe0\x00\x01xx")[3] == "corrupt"

    # GIF: w=63777 makes the header bytes contain 21 f9, and h=...04 would
    # complete the GCE pattern under a raw byte scan; the structured walk
    # counts only real GCE blocks
    gif = synth_media_payload(1, 63777, 260, 2, b"body")
    assert parse_media_header(gif) == (63777, 260, 2, "ok")

    # GIF: a NON-UTF-8 body where the literal GCE pattern appears but is
    # NOT valid block structure (walk stops at the 'x') must not inflate
    # the frame count — a raw byte scan would count 4 extra
    gif2 = synth_media_payload(1, 10, 10, 3,
                               b"x" + b"\x21\xf9\x04\x00\x00\x00\x00\x00" * 4)
    assert parse_media_header(gif2)[2] == 3

    # GIF with a global color table before the GCE blocks parses too
    hdr = b"GIF89a" + (5).to_bytes(2, "little") + (6).to_bytes(2, "little")
    gct = bytes([0x80]) + b"\x00\x00" + b"\x00" * (3 * 2)  # packed: GCT, 2 entries
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert parse_media_header(hdr + gct + gce * 2 + b"\x3b") == (5, 6, 2, "ok")


def test_boilerplate_line_removal(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.dedup import boilerplate_line_removal

    # 8 docs share the footer line; each doc has one unique line.
    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array(
            [f"unique line {i}\ncopyright footer 2026" for i in range(8)],
            pa.string()),
    })
    out = (
        boilerplate_line_removal(rd.from_arrow(docs), min_docs=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["kept_text"].tolist() == [f"unique line {i}" for i in range(8)]
    assert (out["n_lines"] == 2).all() and (out["n_removed"] == 1).all()

    # below the frequency threshold nothing is removed
    out2 = (
        boilerplate_line_removal(rd.from_arrow(docs), min_docs=9)
        .to_pandas()
    )
    assert (out2["n_removed"] == 0).all()


def test_top_terms_matches_local_count(ray_session):
    import collections

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import top_terms

    sf = "/root/testdata/sf0.001"
    got = top_terms(sf, k=10).to_pandas()
    c = collections.Counter()
    for txt in pq.read_table(f"{sf}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist():
        c.update((txt or "").lower().split())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["token"], got["n"])) == want


def test_doc_length_quantiles_semantics(ray_session):
    import math

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import doc_length_quantiles

    sf = "/root/testdata/sf0.001"
    got = doc_length_quantiles(sf).to_pandas().set_index("q")["value"]
    vals = sorted(
        pq.read_table(f"{sf}/documents.parquet", columns=["n_chars"])[
            "n_chars"
        ].to_pylist()
    )
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        # quantile_disc: 1-based rank ceil(q*n)
        assert got[q] == vals[max(1, math.ceil(q * len(vals))) - 1]


def test_hopping_windows_double_count(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.windows import hopping_hour_counts

    sf = "/root/testdata/sf0.001"
    got = hopping_hour_counts(sf).to_pandas()
    n_events = pq.read_metadata(f"{sf}/events.parquet").num_rows
    # size 1h / hop 30min: every event lands in exactly two windows
    assert int(got["n"].sum()) == 2 * n_events
    assert str(got["window_start"].dtype).startswith("datetime64")
    # window starts align to the 30-minute grid
    assert (got["window_start"].dt.minute % 30 == 0).all()
    assert (got["window_start"].dt.second == 0).all()


def test_domain_cap_per_source(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import domain_cap

    sf = "/root/testdata/sf0.001"
    got = (domain_cap(sf, k=7).to_pandas()
           .sort_values(["source", "doc_id"]).reset_index(drop=True))
    df = pq.read_table(f"{sf}/documents.parquet",
                       columns=["doc_id", "source", "lang", "n_chars"]).to_pandas()
    want = (df.sort_values(["source", "doc_id"])
              .groupby("source", as_index=False).head(7)
              .sort_values(["source", "doc_id"]).reset_index(drop=True))
    assert got[["doc_id", "source"]].equals(want[["doc_id", "source"]])
    assert (got.groupby("source").size() <= 7).all()


def test_repetition_columns_semantics():
    from ocr_ray.functions.textstats import repetition_columns

    cols = repetition_columns(pa.array([
        "a\nb\na",              # duplicate line, words a b a
        "x y z",                # no repetition
        "go go go go stop",     # dominant token (4/5 >= 20%)
        "",                     # empty: one (empty) line, zero words
        None,                   # null text behaves as empty
    ]))
    assert cols["n_lines"].to_pylist() == [3, 1, 1, 1, 1]
    assert cols["n_distinct_lines"].to_pylist() == [2, 1, 1, 1, 1]
    assert cols["n_words"].to_pylist() == [3, 3, 5, 0, 0]
    assert cols["n_distinct_words"].to_pylist() == [2, 3, 2, 0, 0]
    assert cols["top_word_n"].to_pylist() == [2, 1, 4, 0, 0]
    # repetitive: top*5 >= n_words AND n_words > 0
    assert cols["repetitive"].to_pylist() == [1, 1, 1, 0, 0]


def test_benchmark_contamination(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.dedup import benchmark_contamination

    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["the quick brown fox jumps"], pa.string()),
    }))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "sentence with the quick brown fox inside it",  # shares 2 shingles
            "a completely different document entirely",     # clean
            "",                                             # zero shingles
        ], pa.string()),
    }))
    got = (benchmark_contamination(corpus, bench)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # bench shingles: {the quick brown, quick brown fox, brown fox jumps}
    assert got["n_shared"].tolist() == [2, 0, 0]
    assert got["contaminated"].tolist() == [1, 0, 0]
    assert got["n_shingles"].tolist()[1] == 3  # 5 words -> 3 shingles
    assert got["n_shingles"].tolist()[2] == 0


def test_keep_best_per_url(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import keep_best_per_url

    sf = "/root/testdata/sf0.001"
    got = (keep_best_per_url(sf).to_pandas()
           .sort_values("canon_url").reset_index(drop=True))
    df = pq.read_table(f"{sf}/documents.parquet",
                       columns=["doc_id", "n_chars"]).to_pandas()
    df["canon_url"] = [
        f"https://example.org/Path{d // 3}" + ("" if d % 3 == 1 else "?id=7")
        for d in df["doc_id"]
    ]
    want = (df.sort_values(["canon_url", "n_chars", "doc_id"],
                           ascending=[True, False, True])
              .groupby("canon_url", as_index=False).head(1)
              .sort_values("canon_url").reset_index(drop=True))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # exactly one row per canonical url, and urls collapse 3 -> 2 variants
    assert got["canon_url"].is_unique
    n_docs = len(df)
    assert len(got) == len(df["canon_url"].unique()) < n_docs


def test_stratified_sample_rates(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import _STRATA_PCT, stratified_sample

    sf = "/root/testdata/sf0.001"
    got = stratified_sample(sf).to_pandas()
    df = pq.read_table(f"{sf}/documents.parquet",
                       columns=["doc_id", "lang"]).to_pandas()
    want_ids = {
        int(d) for d, lang in zip(df["doc_id"], df["lang"])
        if int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:16], "little")
        % 100 < _STRATA_PCT.get(lang, 0)
    }
    assert set(got["doc_id"]) == want_ids
    # the en stratum must be sampled at a strictly higher rate than zh
    rates = (got.groupby("lang").size() / df.groupby("lang").size()).dropna()
    assert rates["en"] > rates["zh"]


def test_tfidf_top_docs_scores(ray_session):
    import collections

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import _TFIDF_QUERY_TERMS, tfidf_top_docs

    sf = "/root/testdata/sf0.001"
    got = tfidf_top_docs(sf, k=15).to_pandas()
    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
    toks = [(int(d), collections.Counter((t or "").lower().split()))
            for d, t in zip(texts["doc_id"], texts["text"])]
    n = len(toks)
    idf = {}
    for term in _TFIDF_QUERY_TERMS:
        df_t = sum(1 for _, c in toks if c[term] > 0)
        idf[term] = (n * 1000) // df_t if df_t else 0
    want = sorted(
        ((d, sum(c[t] * idf[t] for t in _TFIDF_QUERY_TERMS)) for d, c in toks),
        key=lambda x: (-x[1], x[0]))[:15]
    assert list(zip(got["doc_id"], got["score"])) == want


def test_range_join_cell_boundaries(ray_session, tmp_path):
    import pandas as pd

    from ocr_ray.pipelines.windows import range_join_purchase_clicks

    t0 = pd.Timestamp("2026-01-01 10:00:00")
    h = pd.Timedelta(hours=1)
    rows = [
        # purchase at 10:00 (cell boundary)
        (0, t0, 1, "purchase"),
        (1, t0, 1, "click"),                 # same instant: gap 0, kept
        (2, t0 - h, 1, "click"),             # exactly 1h before: kept
        (3, t0 - h - pd.Timedelta(microseconds=1), 1, "click"),  # just outside
        (4, t0 - pd.Timedelta(minutes=30), 1, "click"),          # prev cell, in window
        (5, t0 - pd.Timedelta(minutes=30), 2, "click"),          # other user
        (6, t0 + pd.Timedelta(minutes=1), 1, "click"),           # after: excluded
    ]
    df = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    got = (range_join_purchase_clicks(sf).to_pandas()
           .sort_values("click_id").reset_index(drop=True))
    assert got["click_id"].tolist() == [1, 2, 4]
    assert got["gap_us"].tolist() == [0, 3600_000_000, 1800_000_000]
    assert (got["purchase_id"] == 0).all() and (got["user_id"] == 1).all()


def test_approx_distinct_users_kmv(ray_session, tmp_path):
    import hashlib

    import pandas as pd

    from ocr_ray.pipelines.relational import approx_distinct_users

    # type 'small' has 40 distinct users (< k: exact branch); type 'big'
    # has 2000 distinct users (>= k: KMV estimator branch)
    df = pd.DataFrame({
        "event_type": ["small"] * 80 + ["big"] * 2000,
        "user_id": [i % 40 for i in range(80)] + list(range(100, 2100)),
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    got = (approx_distinct_users(sf, k=256).to_pandas()
           .set_index("event_type")["approx_distinct"])
    assert got["small"] == 40  # exact below k
    # recompute the KMV estimate locally: 256th smallest distinct hash
    hs = sorted({
        int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:16], "little")
        for u in range(100, 2100)
    })
    want = (255 << 64) // hs[255]
    assert got["big"] == want
    assert abs(got["big"] / 2000 - 1) < 0.2  # within ~3 sigma of 1/sqrt(k-2)


def test_top_terms_per_lang(ray_session):
    import collections

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import top_terms_per_lang

    sf = "/root/testdata/sf0.001"
    got = top_terms_per_lang(sf, k=3).to_pandas()
    df = pq.read_table(f"{sf}/documents.parquet",
                       columns=["lang", "text"]).to_pandas()
    c: collections.Counter = collections.Counter()
    for lang, txt in zip(df["lang"], df["text"]):
        for tok in (txt or "").lower().split():
            c[(lang, tok)] += 1
    want = []
    for lang in sorted(df["lang"].unique()):
        rows = sorted(((t, n) for (lg, t), n in c.items() if lg == lang),
                      key=lambda x: (-x[1], x[0]))[:3]
        want += [(lang, t, n) for t, n in rows]
    assert list(zip(got["lang"], got["token"], got["n"])) == want


def test_term_index_pruned_lookup(ray_session, tmp_path):
    import collections
    import glob
    import os

    import ray.data as rd

    from ocr_ray.pipelines.textsearch import build_term_index, term_search_indexed

    docs = pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "text": pa.array(
            [f"alpha beta{' gamma' * (i % 4)} delta{i}" for i in range(60)],
            pa.string()),
    })
    idx = str(tmp_path / "terms")
    build_term_index(rd.from_arrow(docs), idx)
    # the layout is genuinely partitioned: many bucket dirs on disk
    assert len(glob.glob(os.path.join(idx, "bucket=*"))) > 10
    got = (term_search_indexed(idx, "GAMMA")  # case-insensitive
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = {
        i: collections.Counter(t.lower().split())["gamma"]
        for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if "gamma" in t
    }
    assert dict(zip(got["doc_id"], got["tf"])) == want
    # a term absent from the corpus returns zero rows without error
    assert term_search_indexed(idx, "zeta").count() == 0


def test_bool_search_indexed_and(ray_session, tmp_path):
    """AND = postings intersection: only docs containing EVERY query term
    survive, sum_tf is the exact combined term frequency, a missing term
    short-circuits to empty, and dup/case query terms are normalized."""
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import bool_search_indexed, build_term_index

    docs = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array(
            [("alpha beta" + " gamma" * (i % 3) if i % 2 == 0
              else "alpha delta") for i in range(40)],
            pa.string()),
    })
    idx = str(tmp_path / "terms")
    build_term_index(rd.from_arrow(docs), idx)

    got = (bool_search_indexed(idx, ["ALPHA", "gamma", "alpha"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # docs with gamma: even i with i % 3 != 0 -> tf = 1 (alpha) + i%3 (gamma)
    want = {i: 1 + i % 3 for i in range(40) if i % 2 == 0 and i % 3}
    assert dict(zip(got["doc_id"], got["sum_tf"])) == want
    # every doc has alpha -> single-term query returns all docs
    assert bool_search_indexed(idx, ["alpha"]).count() == 40
    # one absent term kills the AND
    assert bool_search_indexed(idx, ["alpha", "zeta"]).count() == 0


def test_mixture_epoch_plan_apportionment(ray_session):
    """Largest-remainder plan: draws sum EXACTLY to the budget, each
    lang's draws are within 1 of its exact quota, and the plan is
    partition-independent (pure function of the lang counts)."""
    from ocr_ray.pipelines.relational import mixture_epoch_plan

    got = (mixture_epoch_plan("/root/testdata/sf0.001", budget=10_000)
           .to_pandas().sort_values("lang").reset_index(drop=True))
    assert int(got["draws"].sum()) == 10_000
    pm = got["pow_micro"].to_numpy(np.float64)
    exact = 10_000 * pm / pm.sum()
    assert (np.abs(got["draws"].to_numpy(np.float64) - exact) < 1.0).all()
    again = (mixture_epoch_plan("/root/testdata/sf0.001", budget=10_000)
             .to_pandas().sort_values("lang").reset_index(drop=True))
    assert got.equals(again)


def test_knn_join_lsh_matches_local(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import (
        _normalized,
        _to_matrix,
        knn_join_lsh,
        lsh_bucket,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    got = (knn_join_lsh(rd.read_parquet(f"{sf}/embeddings.parquet",
                                        columns=["vec_id", "embedding"]), k=3)
           .to_pandas().sort_values(["vec_id", "nn_rank"]).reset_index(drop=True))
    # local recompute: per-bucket rounded-cosine top-3 excluding self
    mat = _to_matrix(t["embedding"])
    ids = t["vec_id"].to_numpy()
    buckets = lsh_bucket(mat)
    want = []
    for b in sorted(set(buckets.tolist())):
        m = buckets == b
        bids, bm = ids[m], _normalized(mat[m])
        sims = np.round(bm @ bm.T, 6)
        for i in range(len(bids)):
            row = sims[i].copy()
            row[i] = -np.inf
            order = np.lexsort((bids, -row))[: min(3, len(bids) - 1)]
            for r, j in enumerate(order, 1):
                want.append((bids[i], bids[j], row[j], r))
    want.sort(key=lambda x: (x[0], x[3]))   # (vec_id, nn_rank) like `got`
    assert [tuple(x) for x in got[["vec_id", "neighbor_id", "sim", "nn_rank"]]
            .itertuples(index=False)] == want
    assert (got["vec_id"] != got["neighbor_id"]).all()


def test_doc_length_quantiles_by_lang(ray_session):
    import math

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import doc_length_quantiles_by_lang

    sf = "/root/testdata/sf0.001"
    got = (doc_length_quantiles_by_lang(sf).to_pandas()
           .set_index(["lang", "q"])["value"])
    df = pq.read_table(f"{sf}/documents.parquet",
                       columns=["lang", "n_chars"]).to_pandas()
    for lang, g in df.groupby("lang"):
        vals = sorted(g["n_chars"])
        for q in (0.25, 0.5, 0.75, 0.9, 0.99):
            assert got[(lang, q)] == vals[max(1, math.ceil(q * len(vals))) - 1]


def test_throttle_dedup_events(ray_session, tmp_path):
    import pandas as pd

    from ocr_ray.pipelines.windows import throttle_dedup_events

    t0 = pd.Timestamp("2026-01-01 09:00:00")
    m = pd.Timedelta(minutes=1)
    h = pd.Timedelta(hours=1)
    rows = [
        (0, t0, 1, "click"),          # first of key: kept
        (1, t0 + m, 1, "click"),      # 1 min later: dropped
        (2, t0 + h + m, 1, "click"),  # exactly 1h after PREVIOUS (lag): kept
        (3, t0 + m, 1, "view"),       # different type: kept
        (4, t0 + m, 2, "click"),      # different user: kept
    ]
    df = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
    })
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)
    got = throttle_dedup_events(str(tmp_path)).to_pandas()
    assert sorted(got["event_id"]) == [0, 2, 3, 4]


def test_running_user_spend_monotone(ray_session):
    from ocr_ray.pipelines.windows import running_user_spend

    got = running_user_spend("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 1000                      # one row per event
    assert got["event_id"].is_unique
    # positive values -> per-user running total is strictly increasing in
    # event order; final value equals the user's total
    import duckdb

    ora = duckdb.sql("""
        SELECT user_id, CAST(sum(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) t
        FROM '/root/testdata/sf0.001/events.parquet' GROUP BY user_id
    """).df().set_index("user_id")["t"]
    finals = got.groupby("user_id")["cum_value_cents"].max()
    assert (finals == ora.loc[finals.index]).all()


def test_hourly_event_pivot_row_conservation(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.windows import hourly_event_pivot

    sf = "/root/testdata/sf0.001"
    got = hourly_event_pivot(sf).to_pandas()
    n_events = pq.read_metadata(f"{sf}/events.parquet").num_rows
    type_cols = [c for c in got.columns if c.startswith("n_") and c != "n_total"]
    # every event counted exactly once, and the typed columns partition it
    assert int(got["n_total"].sum()) == n_events
    assert (got[type_cols].sum(axis=1) == got["n_total"]).all()
    assert str(got["window_start"].dtype) == "datetime64[us]"


def test_hourly_distinct_users(ray_session):
    import duckdb

    from ocr_ray.pipelines.windows import hourly_distinct_users

    got = (hourly_distinct_users("/root/testdata/sf0.001").to_pandas()
           .sort_values("window_start").reset_index(drop=True))
    want = duckdb.sql("""
        SELECT date_trunc('hour', ts) AS window_start,
               count(DISTINCT user_id) AS n
        FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1 ORDER BY 1
    """).df()
    assert got["n_users"].tolist() == want["n"].tolist()
    assert str(got["window_start"].dtype) == "datetime64[us]"


def test_chunk_documents_spans(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import chunk_documents

    sf = "/root/testdata/sf0.001"
    got = chunk_documents(sf).to_pandas()
    texts = dict(zip(*[
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])[c].to_pylist()
        for c in ("doc_id", "text")]))
    # every chunk is exactly the declared slice of its source document
    for r in got.sample(min(200, len(got)), random_state=7).itertuples():
        assert r.chunk_text == texts[r.doc_id][r.char_start: r.char_start + 120]
        assert r.char_start == r.chunk_idx * 100
    # chunk-count formula: ceil(len / stride) per non-empty doc
    n_per = got.groupby("doc_id").size()
    for d, txt in texts.items():
        want = -(-len(txt) // 100) if txt else 0
        assert n_per.get(d, 0) == want


def test_part_pair_counts_local(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import part_pair_counts

    sf = "/root/testdata/sf0.001"
    got = part_pair_counts(sf, k=50).to_pandas()
    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    d = li.drop_duplicates()
    m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
    m = m[m["l_partkey_a"] < m["l_partkey_b"]]
    c = m.groupby(["l_partkey_a", "l_partkey_b"]).size().reset_index(name="n")
    c = c.sort_values(["n", "l_partkey_a", "l_partkey_b"],
                      ascending=[False, True, True]).head(50)
    assert got[["part_a", "part_b", "n_orders"]].values.tolist() == \
        c.values.tolist()


def test_price_quantity_corr_exact(ray_session):
    import math

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import price_quantity_corr

    sf = "/root/testdata/sf0.001"
    got = price_quantity_corr(sf).to_pandas().set_index("l_returnflag")
    li = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"]).to_pandas()
    for flag, g in li.groupby("l_returnflag"):
        q = [int(np.floor(x + 0.5)) for x in g["l_quantity"]]
        p = [int(np.floor(x + 0.5)) for x in g["l_extendedprice"]]
        n = len(q)
        a = n * sum(qi * pi for qi, pi in zip(q, p)) - sum(q) * sum(p)
        b = n * sum(x * x for x in q) - sum(q) ** 2
        c = n * sum(x * x for x in p) - sum(p) ** 2
        want = float(np.round(float(a) / math.sqrt(float(b) * float(c)), 6))
        assert got.loc[flag, "corr_qty_price"] == want
        assert got.loc[flag, "n_rows"] == n


def test_orders_above_cust_avg_membership(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import orders_above_cust_avg

    sf = "/root/testdata/sf0.001"
    got = orders_above_cust_avg(sf).to_pandas()
    o = pq.read_table(f"{sf}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_totalprice"]).to_pandas()
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    s = o.groupby("o_custkey")["cents"]
    want = set(o.loc[o["cents"] * s.transform("size") > s.transform("sum"),
                     "o_orderkey"])
    assert set(got["o_orderkey"]) == want and len(got) == len(want)


def test_rollup_levels_consistent(ray_session):
    from ocr_ray.pipelines.relational import rollup_customer_balance

    got = rollup_customer_balance("/root/testdata/sf0.001").to_pandas()
    fine = got[(got["n_name"] != "ALL")]
    reg = got[(got["n_name"] == "ALL") & (got["r_name"] != "ALL")]
    tot = got[(got["r_name"] == "ALL")]
    assert len(tot) == 1
    assert tot["n_customers"].iloc[0] == fine["n_customers"].sum()
    for r in reg.itertuples():
        sub = fine[fine["r_name"] == r.r_name]
        assert r.n_customers == sub["n_customers"].sum()
        assert r.bal_cents == sub["bal_cents"].sum()


def test_click_hours_no_purchase_membership(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import click_hours_no_purchase

    sf = "/root/testdata/sf0.001"
    got = click_hours_no_purchase(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    ev["h"] = ev["ts"].dt.floor("h")
    clicks = set(map(tuple, ev[ev["event_type"] == "click"][["user_id", "h"]].values))
    buys = set(map(tuple, ev[ev["event_type"] == "purchase"][["user_id", "h"]].values))
    want = clicks - buys
    assert set(map(tuple, got[["user_id", "window_start"]].values)) == want
    assert len(got) == len(want)  # distinct rows


def test_top_bigrams_pmi_local(ray_session):
    import collections
    import math

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import top_bigrams_pmi

    sf = "/root/testdata/sf0.001"
    got = top_bigrams_pmi(sf, k=10).to_pandas()
    c = collections.Counter()
    for txt in pq.read_table(f"{sf}/documents.parquet",
                             columns=["text"])["text"].to_pylist():
        toks = (txt or "").lower().split()
        c.update(zip(toks, toks[1:]))
    total = sum(c.values())
    na = collections.Counter()
    nb = collections.Counter()
    for (a, b), n in c.items():
        na[a] += n
        nb[b] += n
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [((r.tok_a, r.tok_b), r.n) for r in got.itertuples()] == want
    for r in got.itertuples():
        pmi = math.log(float(r.n) * float(total)
                       / (float(na[r.tok_a]) * float(nb[r.tok_b])))
        assert r.pmi == float(np.round(pmi, 6))


def test_modal_priority_and_histogram(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import modal_priority_per_month, price_histogram

    sf = "/root/testdata/sf0.001"
    o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")

    hist = price_histogram(sf).to_pandas().set_index("bin").sort_index()
    o["bin"] = o["cents"] // 50000
    want = o.groupby("bin")["cents"].agg(["size", "sum"])
    assert (hist["n_orders"] == want["size"]).all()
    assert (hist["sum_cents"] == want["sum"]).all()
    assert hist["n_orders"].sum() == len(o)

    got = modal_priority_per_month(sf).to_pandas()
    o["month"] = o["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    cnt = o.groupby(["month", "o_orderpriority"]).size().reset_index(name="n")
    cnt = cnt.sort_values(["month", "n", "o_orderpriority"],
                          ascending=[True, False, True])
    want_mode = cnt.groupby("month").head(1)
    assert list(got.sort_values("month")["o_orderpriority"]) == \
        list(want_mode["o_orderpriority"])


def test_event_value_outliers_threshold(ray_session):
    import math

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import event_value_outliers

    sf = "/root/testdata/sf0.001"
    got = event_value_outliers(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "event_type", "value"]).to_pandas()
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    want = set()
    for et, g in ev.groupby("event_type"):
        n, sv = len(g), int(g["c"].sum())
        svv = int((g["c"].astype(object) ** 2).sum())
        thr = float(sv) / n + 3.0 * math.sqrt(
            (float(n) * float(svv) - float(sv) * float(sv)) / (float(n) * float(n)))
        want |= set(g.loc[g["c"].astype(float) > thr, "event_id"])
    assert set(got["event_id"]) == want


def test_weekly_retention_membership(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import weekly_retention

    sf = "/root/testdata/sf0.001"
    got = weekly_retention(sf).to_pandas().set_index("week_idx").sort_index()
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["w"] = (ev["ts"].dt.normalize()
               - pd.Timestamp("2020-01-01")).dt.days // 7
    uw = ev[["user_id", "w"]].drop_duplicates()
    pairs = set(map(tuple, uw.values))
    for w, g in uw.groupby("w"):
        assert got.loc[w, "n_active"] == len(g)
        assert got.loc[w, "n_retained"] == sum(
            (u, w + 1) in pairs for u in g["user_id"])


def test_embedding_centroids_exact(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import embedding_centroids

    sf = "/root/testdata/sf0.001"
    got = embedding_centroids(sf).to_pandas()
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["label", "embedding"])
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64) * 1_000_000
    ints = np.copysign(np.floor(np.abs(mat) + 0.5), mat).astype(np.int64)
    labels = np.asarray(t["label"].to_pylist())
    assert len(got) == len(np.unique(labels)) * mat.shape[1]
    for lab in np.unique(labels):
        want = ints[labels == lab].sum(axis=0)
        sub = got[got["label"] == lab].sort_values("pos")
        assert (sub["sum_scaled"].values == want).all()
        assert (sub["n"] == (labels == lab).sum()).all()


def test_event_transition_counts_local(ray_session):
    import collections

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import event_transition_counts

    sf = "/root/testdata/sf0.001"
    got = event_transition_counts(sf).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"]).to_pandas()
    c = collections.Counter()
    for _, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        c.update(zip(seq, seq[1:]))
    want = {k: v for k, v in c.items()}
    assert {(r.prev_type, r.next_type): r.n for r in got.itertuples()} == want
    # row conservation: transitions = events - users
    assert got["n"].sum() == len(ev) - ev["user_id"].nunique()


def test_event_funnel_local(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import event_funnel

    sf = "/root/testdata/sf0.001"
    got = (event_funnel(sf).to_pandas()
           .set_index("stage_idx").sort_index())
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["user_id", "ts", "event_type"]).to_pandas()
    t1 = (ev[ev["event_type"] == "view"]
          .groupby("user_id")["ts"].min())
    c = ev[ev["event_type"] == "click"].join(
        t1.rename("t1"), on="user_id", how="inner")
    t2 = c[c["ts"] > c["t1"]].groupby("user_id")["ts"].min()
    p = ev[ev["event_type"] == "purchase"].join(
        t2.rename("t2"), on="user_id", how="inner")
    n3 = p.loc[p["ts"] > p["t2"], "user_id"].nunique()
    assert list(got["stage"]) == ["view", "click", "purchase"]
    assert list(got["n_users"]) == [len(t1), len(t2), n3]
    # funnel is monotone non-increasing
    assert got["n_users"].is_monotonic_decreasing or (
        got["n_users"].diff().dropna() <= 0).all()


def test_cube_status_priority_levels(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import cube_status_priority

    sf = "/root/testdata/sf0.001"
    got = cube_status_priority(sf).to_pandas()
    o = pq.read_table(
        f"{sf}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    ).to_pandas()
    o["cents"] = np.copysign(
        np.floor(np.abs(o["o_totalprice"] * 100) + 0.5),
        o["o_totalprice"]).astype("int64")
    fin = o.groupby(["o_orderstatus", "o_orderpriority"]).agg(
        n=("cents", "size"), s=("cents", "sum"))
    n_status = o["o_orderstatus"].nunique()
    n_prio = o["o_orderpriority"].nunique()
    assert len(got) == len(fin) + n_status + n_prio + 1
    grand = got[(got["o_orderstatus"] == "ALL")
                & (got["o_orderpriority"] == "ALL")]
    assert int(grand["n_orders"].iloc[0]) == len(o)
    assert int(grand["revenue_cents"].iloc[0]) == int(o["cents"].sum())
    for (st, pr), row in fin.iterrows():
        m = got[(got["o_orderstatus"] == st) & (got["o_orderpriority"] == pr)]
        assert int(m["n_orders"].iloc[0]) == row["n"]
        assert int(m["revenue_cents"].iloc[0]) == row["s"]


def test_order_price_quartiles_semantics(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import order_price_quartiles

    sf = "/root/testdata/sf0.001"
    got = order_price_quartiles(sf).to_pandas()
    o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    assert len(got) == len(o)
    # per customer: quartile sizes differ by at most 1, tile 1 is the
    # most expensive orders, and earlier tiles are never smaller
    for ck, g in got.groupby("o_custkey"):
        sizes = g.groupby("quartile").size()
        k = min(4, len(g))
        assert set(sizes.index) == set(range(1, k + 1))
        assert sizes.max() - sizes.min() <= 1
        assert (sizes.sort_index().diff().dropna() <= 0).all()
        ordered = g.sort_values(
            ["price_cents", "o_orderkey"], ascending=[False, True])
        assert (np.diff(ordered["quartile"].to_numpy()) >= 0).all()


def test_partition_checksums_order_independent(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import partition_checksums

    sf = "/root/testdata/sf0.001"
    got = (partition_checksums(sf).to_pandas()
           .set_index("partition_id").sort_index())
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"]).to_pandas()
    d["pid"] = d["doc_id"] % 16
    d["h"] = [
        int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
        for s in d["text"]]
    for pid, g in d.groupby("pid"):
        assert got.loc[pid, "n_docs"] == len(g)
        assert got.loc[pid, "total_chars"] == g["n_chars"].sum()
        want = np.bitwise_xor.reduce(g["h"].to_numpy().astype(np.uint64))
        assert np.uint64(got.loc[pid, "checksum"]) == want


def test_reassemble_chunks_roundtrip(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import reassemble_chunks

    sf = "/root/testdata/sf0.001"
    got = (reassemble_chunks(sf).to_pandas()
           .set_index("doc_id")["text"].to_dict())
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    want = {r.doc_id: r.text for r in d.itertuples() if (r.text or "") != ""}
    assert got == want


def test_props_key_stats_local(ray_session):
    import json

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import props_key_stats

    sf = "/root/testdata/sf0.001"
    got = (props_key_stats(sf).to_pandas()
           .set_index("event_type").sort_index())
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "props"]).to_pandas()
    ev["k"] = [json.loads(p)["k"] for p in ev["props"]]
    want = ev.groupby("event_type")["k"].agg(["sum", "size"])
    assert (got["sum_k"] == want["sum"]).all()
    assert (got["n"] == want["size"]).all()


def test_dup_cluster_sizes_injected(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import dup_cluster_sizes

    sf = "/root/testdata/sf0.001"
    got = (dup_cluster_sizes(sf).to_pandas()
           .set_index("cluster_size")["n_clusters"].to_dict())
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    n = len(d)
    n_dup = int((d["doc_id"] % 23 == 0).sum())
    # all base texts are unique, so injected copies form exactly the
    # 2-clusters and everything else stays a singleton
    assert got == {1: n - n_dup, 2: n_dup}


def test_click_purchase_intersect_local(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import click_purchase_intersect

    sf = "/root/testdata/sf0.001"
    got = set(click_purchase_intersect(sf).to_pandas()["user_id"])
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    clickers = set(ev.loc[ev["event_type"] == "click", "user_id"])
    buyers = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    assert got == (clickers & buyers)


def test_moving_sum_user_spend_frame(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import moving_sum_user_spend

    sf = "/root/testdata/sf0.001"
    got = (moving_sum_user_spend(sf).to_pandas()
           .set_index("event_id").sort_index())
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"]).to_pandas()
    ev["cents"] = np.copysign(
        np.floor(np.abs(ev["value"] * 100) + 0.5), ev["value"]).astype("int64")
    assert len(got) == len(ev)
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        c = g["cents"].tolist()
        for i, eid in enumerate(g["event_id"]):
            lo = max(0, i - 2)
            assert got.loc[eid, "win_sum_cents"] == sum(c[lo:i + 1])
            assert got.loc[eid, "win_n"] == i + 1 - lo


def test_event_value_minmax_bounds(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import event_value_minmax

    sf = "/root/testdata/sf0.001"
    got = event_value_minmax(sf).to_pandas()
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "event_type", "value"]).to_pandas()
    assert len(got) == len(ev)
    assert got["scaled_ppm"].between(0, 1_000_000).all()
    # each type's min maps to 0 and max to 1e6
    for ty, g in got.groupby("event_type"):
        lo = g.loc[g["value_cents"].idxmin()]
        hi = g.loc[g["value_cents"].idxmax()]
        assert lo["scaled_ppm"] == 0
        assert hi["scaled_ppm"] == 1_000_000


def test_doc_length_quantiles_cont_interpolation(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import doc_length_quantiles_cont

    sf = "/root/testdata/sf0.001"
    got = (doc_length_quantiles_cont(sf).to_pandas()
           .set_index("q")["value"].to_dict())
    v = np.sort(pq.read_table(f"{sf}/documents.parquet",
                              columns=["n_chars"])["n_chars"].to_numpy())
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        pos = q * (len(v) - 1)
        lo = int(np.floor(pos))
        want = v[lo] + (pos - lo) * (v[min(lo + 1, len(v) - 1)] - v[lo])
        assert abs(got[q] - want) < 1e-6


def test_user_event_paths_first_k(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import user_event_paths

    sf = "/root/testdata/sf0.001"
    got = (user_event_paths(sf).to_pandas()
           .set_index("user_id"))
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"]).to_pandas()
    for uid, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()[:8]
        assert got.loc[uid, "path"] == ">".join(seq)
        assert got.loc[uid, "n_events"] == len(seq)


def test_crawl_delta_statuses(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import crawl_delta

    sf = "/root/testdata/sf0.001"
    got = crawl_delta(sf).to_pandas().set_index("doc_id")["status"]
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id"]).to_pandas()
    ids = d["doc_id"].to_numpy()
    for i in ids:
        if i % 19 == 0:
            assert got.loc[i] == "removed"
        elif i % 17 == 0:
            assert got.loc[i] == "changed"
        else:
            assert got.loc[i] == "unchanged"
        if i % 13 == 0:
            assert got.loc[i + 2_000_000_000] == "added"
    n_added = int((ids % 13 == 0).sum())
    assert len(got) == len(ids) + n_added


def test_pagerank_two_iter_exact(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import pagerank_two_iter

    sf = "/root/testdata/sf0.001"
    got = (pagerank_two_iter(sf).to_pandas()
           .set_index("doc_id")["rank_scaled"].to_dict())
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    n = len(ids)
    r = {int(i): 1_000_000 for i in ids}
    for _ in range(2):
        contrib = {int(i): 0 for i in ids}
        for i in ids:
            c = r[int(i)] // 2
            contrib[int((i * 2 + 1) % n)] += c
            contrib[int((i * 3 + 2) % n)] += c
        r = {i: 150_000 + (85 * contrib[i]) // 100 for i in r}
    assert got == r
    # probability mass is conserved up to integer-floor loss
    assert 0 <= n * 1_000_000 - sum(r.values()) < n * 3


def test_triangle_counts_local(ray_session):
    import itertools

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import triangle_counts

    sf = "/root/testdata/sf0.001"
    got = (triangle_counts(sf).to_pandas()
           .set_index("doc_id")["n_triangles"].to_dict())
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    n = len(ids)
    edges = set()
    for u in ids:
        for m, c in ((2, 1), (3, 2), (5, 3)):
            v = (m * u + c) % n
            if u != v:
                edges.add((min(u, v), max(u, v)))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for w, ns in adj.items():
        for a, b in itertools.combinations(sorted(ns), 2):
            if (min(a, b), max(a, b)) in edges:
                want[w] = want.get(w, 0) + 1
    assert got == want
    # every triangle contributes exactly three apex counts
    assert sum(want.values()) % 3 == 0


def test_audio_header_decode():
    """RIFF/WAVE chunk walk: round trip, edge statuses, word alignment."""
    from ocr_ray.stages.multimodal import (parse_audio_header,
                                           synth_audio_payload)

    for sr, ch, bits, body in ((8000, 1, 8, b"abc"), (44100, 2, 16, b"x" * 17),
                               (32000, 2, 16, b"")):
        r, c, b, s, st = parse_audio_header(
            synth_audio_payload(sr, ch, bits, body))
        blk = ch * bits // 8
        assert (r, c, b, s, st) == (sr, ch, bits, len(body) // blk, "ok")
    assert parse_audio_header(b"")[4] == "empty"
    assert parse_audio_header(b"OggS0123456789")[4] == "unsupported"
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00WAVE")[4] == "corrupt"
    # odd-size chunk before fmt must be skipped with its pad byte
    p = synth_audio_payload(16000, 1, 8, b"abcde")
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    padded = p[:12] + extra + p[12:]
    r, c, b, s, st = parse_audio_header(padded)
    assert (r, s, st) == (16000, 5, "ok")


def test_audio_features_stage(ray_session):
    import hashlib

    import ray.data as rd

    from ocr_ray.stages.multimodal import audio_features, synth_audio_payload

    payloads = [synth_audio_payload(8000, 1, 8, b"hello"), None, b"junk"]
    ds = rd.from_items([
        {"media_id": str(i), "media": p} for i, p in enumerate(payloads)
    ])
    got = audio_features(ds).to_pandas().set_index("media_id")
    assert got.loc["0", "decode_status"] == "ok"
    assert got.loc["0", "n_samples"] == 5
    assert got.loc["0", "duration_ms"] == 5 * 1000 // 8000
    assert got.loc["0", "content_hash"] == hashlib.md5(
        payloads[0].hex().encode()).hexdigest()
    assert got.loc["1", "decode_status"] == "empty"
    assert got.loc["1", "n_bytes"] == 0
    assert got.loc["2", "decode_status"] == "unsupported"


def test_video_header_decode():
    """ISO-BMFF box walk: round trip, edge statuses, malformed boxes."""
    from ocr_ray.stages.multimodal import (parse_video_header,
                                           synth_video_payload)

    for ts, dur, tr in ((600, 0, 0), (1200, 600600, 3)):
        assert parse_video_header(
            synth_video_payload(ts, dur, tr, b"zz")) == (ts, dur, tr, "ok")
    assert parse_video_header(b"")[3] == "empty"
    assert parse_video_header(b"RIFF1234WAVE")[3] == "unsupported"
    # box size overrunning the payload is corrupt, not a crash
    p = synth_video_payload(600, 60, 1, b"abc")
    assert parse_video_header(p[:-2])[3] == "corrupt"
    # moov present but no mvhd
    no_mvhd = (p[:16]
               + (16).to_bytes(4, "big") + b"moov"
               + (8).to_bytes(4, "big") + b"trak")
    assert parse_video_header(no_mvhd)[3] == "corrupt"


def test_video_features_stage(ray_session):
    import hashlib

    import ray.data as rd

    from ocr_ray.stages.multimodal import synth_video_payload, video_features

    payloads = [synth_video_payload(600, 1500, 2, b"v"), None]
    ds = rd.from_items([
        {"media_id": str(i), "media": p} for i, p in enumerate(payloads)
    ])
    got = video_features(ds).to_pandas().set_index("media_id")
    assert got.loc["0", "decode_status"] == "ok"
    assert got.loc["0", "timescale"] == 600
    assert got.loc["0", "duration_ms"] == 1500 * 1000 // 600
    assert got.loc["0", "n_tracks"] == 2
    assert got.loc["0", "content_hash"] == hashlib.md5(
        payloads[0].hex().encode()).hexdigest()
    assert got.loc["1", "decode_status"] == "empty"


def test_tree_depths_pointer_doubling(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import tree_depths

    sf = "/root/testdata/sf0.001"
    got = (tree_depths(sf).to_pandas()
           .set_index("doc_id")["depth"].to_dict())
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    want = {0: 0}
    for s in sorted(ids):
        if s == 0:
            continue
        path, v = [], s
        while v not in want:
            path.append(v)
            v = (v * 2654435761 % 2**32) % v
        base = want[v]
        for u in reversed(path):
            base += 1
            want[u] = base
    assert got == want
    assert max(got.values()) >= 3  # non-degenerate tree


def test_skyline_orders_dominance(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import skyline_orders

    sf = "/root/testdata/sf0.001"
    got = skyline_orders(sf).to_pandas()
    o = pq.read_table(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"]).to_pandas()
    o["cents"] = np.copysign(
        np.floor(np.abs(o["o_totalprice"] * 100) + 0.5),
        o["o_totalprice"]).astype("int64")
    pts = list(zip(o["cents"], o["o_orderdate"], o["o_orderkey"]))

    def dominated(p, d):
        return any(
            (p2 <= p and d2 >= d and (p2 < p or d2 > d))
            for p2, d2, _ in pts)

    want = {k for p, d, k in pts if not dominated(p, d)}
    assert set(got["o_orderkey"]) == want
    assert len(got) == len(want)
    # no kept row dominates another kept row
    kept = list(zip(got["price_cents"], got["o_orderdate"]))
    for i, (p, d) in enumerate(kept):
        for j, (p2, d2) in enumerate(kept):
            if i != j:
                assert not (p2 <= p and d2 >= d and (p2 < p or d2 > d))


def test_conversion_pattern_users_local(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import conversion_pattern_users

    sf = "/root/testdata/sf0.001"
    got = set(conversion_pattern_users(sf).to_pandas()["user_id"])
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"]).to_pandas()
    want = set()
    for uid, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        if any(seq[i:i + 3] == ["view", "click", "purchase"]
               for i in range(len(seq) - 2)):
            want.add(uid)
    assert got == want


def test_token_entropy_local(ray_session):
    import collections
    import math

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import token_entropy

    sf = "/root/testdata/sf0.001"
    got = token_entropy(sf).to_pandas().set_index("doc_id")
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    for r in d.itertuples():
        toks = (r.text or "").split()
        assert got.loc[r.doc_id, "n_tokens"] == len(toks)
        if not toks:
            assert got.loc[r.doc_id, "entropy"] == 0.0
            continue
        n = len(toks)
        s = sum(c * math.log(c) for c in collections.Counter(toks).values())
        assert abs(got.loc[r.doc_id, "entropy"]
                   - (math.log(n) - s / n)) < 2e-6
        # entropy bounded by ln(n) (+ half an ulp of the 6-dp rounding)
        assert 0.0 <= got.loc[r.doc_id, "entropy"] <= math.log(n) + 5e-7


def test_revenue_share_by_priority_ppm(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import revenue_share_by_priority

    sf = "/root/testdata/sf0.001"
    got = (revenue_share_by_priority(sf).to_pandas()
           .set_index("o_orderpriority"))
    o = pq.read_table(f"{sf}/orders.parquet",
                      columns=["o_orderpriority", "o_totalprice"]).to_pandas()
    o["cents"] = np.copysign(
        np.floor(np.abs(o["o_totalprice"] * 100) + 0.5),
        o["o_totalprice"]).astype("int64")
    g = o.groupby("o_orderpriority")["cents"].agg(["size", "sum"])
    total = int(g["sum"].sum())
    for pr, row in g.iterrows():
        assert got.loc[pr, "n_orders"] == row["size"]
        assert got.loc[pr, "revenue_cents"] == row["sum"]
        assert got.loc[pr, "share_ppm"] == row["sum"] * 1_000_000 // total
    # floor shares never exceed one million in total
    assert got["share_ppm"].sum() <= 1_000_000


def test_span_audit_all_gapless(ray_session):
    import __ray_entry__ as e

    got = e.queries()["span_audit"]("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 500
    # every page's spans tile its extracted text exactly
    assert (got["gapless"] == 1).all()
    # arithmetic identity: span chars + separators == text chars
    sep = np.maximum(0, got["n_spans"].to_numpy() - 1)
    assert (got["span_chars"].to_numpy() + sep
            == got["text_chars"].to_numpy()).all()
    # rejected pages carry no spans and no text
    empty = got[got["n_spans"] == 0]
    assert (empty["text_chars"] == 0).all()


def test_doc_length_quantiles_cont_by_lang_interpolation(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import doc_length_quantiles_cont_by_lang

    sf = "/root/testdata/sf0.001"
    got = (doc_length_quantiles_cont_by_lang(sf).to_pandas()
           .set_index(["lang", "q"])["value"].to_dict())
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["lang", "n_chars"]).to_pandas()
    for lang, g in d.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy())
        for q in (0.25, 0.5, 0.75, 0.9, 0.99):
            pos = q * (len(v) - 1)
            lo = int(np.floor(pos))
            want = v[lo] + (pos - lo) * (v[min(lo + 1, len(v) - 1)] - v[lo])
            assert abs(got[(lang, q)] - want) < 1e-6


def test_text_format_roundtrips(ray_session):
    """JSONL and CSV derivations re-read to the exact parquet row set,
    including a value with embedded comma/quote via the CSV writer."""
    import csv as _csv
    import io

    import pyarrow.parquet as pq

    from ocr_ray.sources.text_formats import (read_documents_csv,
                                              read_documents_jsonl)

    sf = "/root/testdata/sf0.001"
    base = (pq.read_table(f"{sf}/documents.parquet").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    for reader in (read_documents_jsonl, read_documents_csv):
        got = (reader(sf).to_pandas()[base.columns.tolist()]
               .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(base), reader.__name__
    # the CSV writer escapes commas/quotes per RFC 4180
    buf = io.StringIO()
    _csv.writer(buf, quoting=_csv.QUOTE_MINIMAL,
                lineterminator="\n").writerow(['a,"b', "c"])
    assert buf.getvalue() == '"a,""b",c\n'


def test_jsonl_export_roundtrip_rows(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.sources.text_formats import read_exported_jsonl

    sf = "/root/testdata/sf0.001"
    base = (pq.read_table(f"{sf}/documents.parquet").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    got = (read_exported_jsonl(sf).to_pandas()[base.columns.tolist()]
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(base)


def test_media_exact_dedup_clones(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = e.queries()["media_exact_dedup"](sf).to_pandas()
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    n_dup = int((ids % 23 == 0).sum())
    assert len(got) == len(ids)                     # one row per distinct payload
    assert (got["n_copies"] == 2).sum() == n_dup    # clones collapse
    assert (got["n_copies"] == 1).sum() == len(ids) - n_dup
    # keep-first always picks the original id, never the 1e9-offset clone
    assert (got["keep_media_id"].astype("int64") < 1_000_000_000).all()


def test_embedding_norms_exact(ray_session):
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import embedding_norms

    sf = "/root/testdata/sf0.001"
    got = (embedding_norms(sf).to_pandas()
           .set_index("vec_id").sort_index())
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64) * 1e6
    scaled = np.abs(np.copysign(np.floor(np.abs(mat) + 0.5), mat)).astype("int64")
    vids = t["vec_id"].to_numpy()
    assert (got.loc[vids, "l1_e6"].to_numpy() == scaled.sum(axis=1)).all()
    assert (got.loc[vids, "linf_e6"].to_numpy() == scaled.max(axis=1)).all()
    # unit vectors: L1 in [1, sqrt(dim)] * 1e6, Linf <= 1e6
    dim = mat.shape[1]
    assert (got["l1_e6"] >= 1_000_000).all()
    assert (got["l1_e6"] <= int(np.sqrt(dim) * 1e6) + dim).all()
    assert (got["linf_e6"] <= 1_000_000).all()


def test_host_freshness_rollup(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["host_freshness"]("/root/testdata/sf0.001")
           .to_pandas().set_index("host"))
    assert len(got) > 1
    assert got.index.str.endswith(".example.org").all()
    assert (got["n_extracted"] <= got["n_pages"]).all()
    # the corpus totals 522 page rows (500 + 22 re-crawl dups)
    assert got["n_pages"].sum() == 522
    # latest capture per host is within the generator's time range
    base = pd.Timestamp("2024-01-01").value // 1000
    assert (got["latest_ts_us"] >= base).all()


def test_fk_integrity_audit_detects_orphans(ray_session, tmp_path_factory):
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import fk_integrity_audit

    sf = "/root/testdata/sf0.001"
    # clean corpus: no orphans anywhere
    clean = (fk_integrity_audit(sf).to_pandas()
             .set_index("fk_edge")["n_orphans"])
    assert (clean == 0).all()

    # corrupt copy: drop half the orders -> their lineitems dangle
    broken = tmp_path_factory.mktemp("fk_broken")
    for t in ("lineitem", "orders", "customer", "nation"):
        shutil.copy(f"{sf}/{t}.parquet", broken / f"{t}.parquet")
    o = pq.read_table(f"{sf}/orders.parquet")
    keep = o.filter(
        pc.equal(pc.bit_wise_and(o["o_orderkey"], 1), 0))
    pq.write_table(keep, broken / "orders.parquet")
    li = pq.read_table(f"{sf}/lineitem.parquet", columns=["l_orderkey"])
    expected = int(pc.sum(pc.cast(pc.equal(
        pc.bit_wise_and(li["l_orderkey"], 1), 1), pa.int64())).as_py())
    got = (fk_integrity_audit(str(broken)).to_pandas()
           .set_index("fk_edge")["n_orphans"])
    assert got["lineitem_orders"] == expected > 0
    assert got["orders_customer"] == 0
    assert got["customer_nation"] == 0


def test_pk_uniqueness_audit_detects_dups(ray_session, tmp_path_factory):
    import shutil

    import pyarrow as pa_
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import pk_uniqueness_audit

    sf = "/root/testdata/sf0.001"
    clean = (pk_uniqueness_audit(sf).to_pandas()
             .set_index("key_col"))
    assert (clean["n_dup_surplus"] == 0).all()
    assert (clean["n_rows"] == clean["n_distinct"]).all()

    # corrupt copy: duplicate the first 10 orders -> surplus of 10
    broken = tmp_path_factory.mktemp("pk_broken")
    for t in ("documents", "events", "orders", "customer", "part",
              "supplier"):
        shutil.copy(f"{sf}/{t}.parquet", broken / f"{t}.parquet")
    o = pq.read_table(f"{sf}/orders.parquet")
    pq.write_table(pa_.concat_tables([o, o.slice(0, 10)]),
                   broken / "orders.parquet")
    got = (pk_uniqueness_audit(str(broken)).to_pandas()
           .set_index("key_col"))
    assert got.loc["orders.o_orderkey", "n_dup_surplus"] == 10
    assert got.loc["documents.doc_id", "n_dup_surplus"] == 0


def test_query_partition_invariance(ray_session):
    """Shuffle-heavy representatives return IDENTICAL results when the
    input block layout changes (override_num_blocks 1 vs many) — the
    query-family analogue of the extraction byte-determinism invariant.
    Catches any operator whose result depends on batch boundaries
    (wrong partial aggregation, per-batch state leaks, order effects)."""
    import ray.data as rd

    import __ray_entry__ as e
    from ocr_ray.pipelines import relational as rel

    sf = "/root/testdata/sf0.001"
    qs = e.queries()
    names = ["dedup_first_event", "minhash_near_dup", "event_funnel",
             "crawl_delta", "pagerank_two_iter", "partition_checksums",
             "tree_depths", "dup_cluster_sizes", "fk_integrity_audit",
             # round-4 late additions: packing (shard greedy), heavy
             # hitters (batch-local candidates must not leak into the
             # output), bloom semi join (OR-folded partial filters),
             # histogram winsorize, star join
             "pack_context_windows", "heavy_hitter_terms",
             "bloom_semi_join_revenue", "winsorized_revenue_by_priority",
             "revenue_by_region",
             # batch-boundary-sensitive by construction: global stats
             # from per-batch partials must not leak layout
             "bm25_search", "nb_lang_confusion", "bigram_lm_scores",
             "bpe_merge_candidates", "pack_sequences",
             "linear_attribution"]

    def canon(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        cols = sorted(df.columns)
        return (df[cols].sort_values(cols).reset_index(drop=True))

    orig = rd.read_parquet

    def patched(paths, *a, **kw):
        kw.setdefault("override_num_blocks", 7)
        return orig(paths, *a, **kw)

    base = {n: canon(qs[n](sf)) for n in names}
    rel.rd.read_parquet = patched
    try:
        for n in names:
            again = canon(qs[n](sf))
            assert again.equals(base[n]), n
    finally:
        rel.rd.read_parquet = orig


def test_moving_median_user_spend_frame(ray_session):
    import statistics

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import moving_median_user_spend

    sf = "/root/testdata/sf0.001"
    got = (moving_median_user_spend(sf).to_pandas()
           .set_index("event_id").sort_index())
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"]).to_pandas()
    ev["cents"] = np.copysign(
        np.floor(np.abs(ev["value"] * 100) + 0.5), ev["value"]).astype("int64")
    assert len(got) == len(ev)
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        c = g["cents"].tolist()
        for i, eid in enumerate(g["event_id"]):
            want = statistics.median(c[max(0, i - 2):i + 1])
            assert got.loc[eid, "win_median_cents"] == want


def test_bucketed_join_equals_shuffle_join(ray_session):
    """The storage-partitioned join returns exactly what the shuffle
    join returns — co-location paid at write time changes nothing in
    the result set."""
    from ocr_ray.pipelines.relational import (bucketed_join_revenue,
                                              hash_join_revenue)

    sf = "/root/testdata/sf0.001"
    a = (bucketed_join_revenue(sf).to_pandas()
         .sort_values("o_orderpriority").reset_index(drop=True))
    b = (hash_join_revenue(sf).to_pandas()
         [["o_orderpriority", "revenue_e4", "n_items"]]
         .sort_values("o_orderpriority").reset_index(drop=True))
    b["n_items"] = b["n_items"].astype("int64")
    assert a.equals(b)


def test_csv_read_path_handles_tricky_values(ray_session, tmp_path_factory):
    """The REAL distributed CSV read path (same reader + parse options as
    read_documents_csv) parses embedded commas, quotes and quoted
    newlines — not just the writer in isolation."""
    import csv as _csv

    import pyarrow.csv as pacsv
    import ray.data as rd

    d = tmp_path_factory.mktemp("tricky_csv")
    rows = [
        (0, 'plain', 'en'),
        (1, 'a,comma and "quotes"', 'de'),
        (2, 'line1\nline2', 'fr'),
        (3, '', 'es'),
    ]
    with open(d / "docs-00000.csv", "w", encoding="utf-8", newline="") as f:
        w = _csv.writer(f, quoting=_csv.QUOTE_MINIMAL, lineterminator="\n")
        w.writerow(["doc_id", "text", "lang"])
        w.writerows(rows)
    got = (rd.read_csv(
        str(d), file_extensions=["csv"],
        parse_options=pacsv.ParseOptions(newlines_in_values=True))
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 4
    assert got.loc[1, "text"] == 'a,comma and "quotes"'
    assert got.loc[2, "text"] == "line1\nline2"
    # arrow CSV inference reads an empty field as null — the documented
    # '' vs null drift; ingestion stats only touch lang/n_chars so the
    # production queries are unaffected, but the drift is pinned here
    assert got.loc[3, "text"] is None or got.loc[3, "text"] == ""


def test_bloom_u64_no_false_negatives():
    from ocr_ray.functions.bloom import BloomFilter

    keys = np.arange(0, 5000, 3, dtype=np.int64)
    bf = BloomFilter.for_capacity(len(keys), 0.01)
    bf.add_many_u64(keys)
    assert bf.contains_many_u64(keys).all()          # no false negatives
    probe = np.arange(10000, 30000, dtype=np.int64)  # disjoint key range
    fp = bf.contains_many_u64(probe).mean()
    assert fp < 0.05                                 # fp rate near target
    # distributed build: two partial filters OR-fold to the full one
    a, b = (BloomFilter(bf.n_bits, bf.n_hashes) for _ in range(2))
    a.add_many_u64(keys[: len(keys) // 2])
    b.add_many_u64(keys[len(keys) // 2:])
    a.union_inplace(b.bits)
    assert bytes(a.bits) == bytes(bf.bits)


def test_bloom_semi_join_exact(ray_session):
    """Bloom pruning + verify returns EXACTLY the semi join (false
    positives removed, false negatives impossible)."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import bloom_semi_join_revenue

    sf = "/root/testdata/sf0.001"
    got = (bloom_semi_join_revenue(sf).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                            "o_orderkey"])
    sel = li[li["l_orderkey"].isin(urgent)].copy()
    rev = sel["l_extendedprice"] * (1.0 - sel["l_discount"]) * 10000.0
    sel["revenue_e4"] = np.copysign(np.floor(np.abs(rev) + 0.5),
                                    rev).astype("int64")
    want = (sel.groupby("l_returnflag", as_index=False)
            .agg(revenue_e4=("revenue_e4", "sum"),
                 n_items=("revenue_e4", "size"))
            .sort_values("l_returnflag").reset_index(drop=True))
    assert got["revenue_e4"].tolist() == want["revenue_e4"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()


def test_dataset_split_counts_partition(ray_session):
    """Splits are a disjoint cover: per-lang counts sum to the corpus and
    the train share is ~90%."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import dataset_split_counts

    sf = "/root/testdata/sf0.001"
    got = dataset_split_counts(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    assert int(got["n_docs"].sum()) == len(docs)
    per_lang = got.groupby("lang")["n_docs"].sum()
    want_lang = docs.groupby("lang").size()
    assert per_lang.to_dict() == want_lang.to_dict()
    share = got.loc[got["split"] == "train", "n_docs"].sum() / len(docs)
    assert 0.8 < share < 1.0


def test_pack_context_windows_greedy(ray_session):
    """Assignment matches the sequential greedy recurrence per shard; no
    multi-doc bin exceeds the cap and consecutive bins cannot merge."""
    from ocr_ray.pipelines.relational import pack_context_windows

    cap = 256
    got = (pack_context_windows("/root/testdata/sf0.001", cap_tokens=cap)
           .to_pandas())
    assert len(got) == len(got["doc_id"].unique())
    for _, g in got.groupby("shard"):
        g = g.sort_values("doc_id")
        # replay the recurrence; occupancy (not token count) decides
        # whether a bin can be closed — a bin opened by a zero-token doc
        # is still occupied
        bin_idx, bin_tok, bin_docs = 0, 0, 0
        for _, row in g.iterrows():
            n = int(row["n_tokens"])
            if bin_docs and bin_tok + n > cap:
                bin_idx, bin_tok, bin_docs = bin_idx + 1, n, 1
            else:
                bin_tok += n
                bin_docs += 1
            assert int(row["bin_idx"]) == bin_idx
        fills = g.groupby("bin_idx")["n_tokens"].agg(["sum", "size"])
        multi = fills[fills["size"] > 1]
        assert (multi["sum"] <= cap).all()
        # greedy is maximal: bin b+1's first doc never fits in bin b
        firsts = g.drop_duplicates("bin_idx", keep="first")
        for b in range(len(fills) - 1):
            nxt = int(firsts.iloc[b + 1]["n_tokens"])
            assert int(fills.iloc[b]["sum"]) + nxt > cap


def test_heavy_hitter_terms_exact(ray_session):
    """The candidate-then-recount heavy-hitter path returns EXACTLY the
    terms with n·k > N (no approximation survives to the output)."""
    import collections

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import heavy_hitter_terms

    k = 200
    got = heavy_hitter_terms("/root/testdata/sf0.001", k=k).to_pandas()
    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    c = collections.Counter()
    for t in texts:
        c.update((t or "").lower().split())
    total = sum(c.values())
    want = {t: n for t, n in c.items() if n * k > total}
    assert dict(zip(got["term"], got["n"])) == want
    # output is ordered count desc, term asc
    assert got.equals(got.sort_values(["n", "term"],
                                      ascending=[False, True])
                      .reset_index(drop=True))


def test_name_edit_near_dup_bruteforce(ray_session):
    """Blocked vectorized pairs equal the brute-force blocked join."""
    import pyarrow.parquet as pq

    from ocr_ray.functions.textnorm import levenshtein_many
    from ocr_ray.pipelines.relational import name_edit_near_dup

    got = name_edit_near_dup("/root/testdata/sf0.001").to_pandas()
    names = sorted(set(pq.read_table(
        "/root/testdata/sf0.001/part.parquet",
        columns=["p_name"])["p_name"].to_pylist()))
    want = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if a.split(" ")[-1] != b.split(" ")[-1]:
                continue
            d = int(levenshtein_many([a], [b])[0])
            if d <= 3:
                want.add((a, b, d))
    assert set(zip(got["name_a"], got["name_b"], got["dist"])) == want
    assert len(got) == len(want)


def test_zorder_range_prunes_and_stays_exact(ray_session, tmp_path_factory):
    """The Z-order layout reads a strict subset of partitions for a 2-D
    range yet returns exactly the full-scan answer, for several ranges."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.relational import (build_zorder_layout,
                                              zorder_range_revenue)

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("zorder"))
    build_zorder_layout(rd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"]), out)
    n_cells = len(glob.glob(f"{out}/z=*"))
    assert n_cells > 50          # the corpus spreads across many cells

    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    cents = np.copysign(np.floor(np.abs(orders["o_totalprice"] * 100) + 0.5),
                        orders["o_totalprice"]).astype("int64")
    us = orders["o_orderdate"].astype("int64")

    def want(plo, phi, dlo, dhi):
        lo = np.datetime64(dlo).astype("datetime64[us]").astype(np.int64)
        hi = np.datetime64(dhi).astype("datetime64[us]").astype(np.int64)
        m = (cents >= plo) & (cents < phi) & (us >= lo) & (us < hi)
        return int(m.sum()), int(cents[m].sum())

    for plo, phi, dlo, dhi in [
            (10_000_000, 20_000_000, "1997-01-01", "1998-01-01"),
            (0, 5_000_000, "1995-01-01", "1995-07-01"),
            (45_000_000, 60_000_000, "2000-06-15", "2001-09-01")]:
        got = zorder_range_revenue(out, plo, phi, dlo, dhi).to_pandas()
        wn, wr = want(plo, phi, dlo, dhi)
        assert (int(got["n_orders"][0]), int(got["revenue_cents"][0])) \
            == (wn, wr)

    # pruning is real: the default range touches well under half the cells
    from ocr_ray.pipelines.relational import _morton4, _Z_DATE_WIDTH, \
        _Z_EPOCH_DAYS, _Z_PRICE_WIDTH
    pb = range(10_000_000 // _Z_PRICE_WIDTH,
               (20_000_000 - 1) // _Z_PRICE_WIDTH + 1)
    days = np.datetime64("1997-01-01").astype("datetime64[D]").astype(int)
    dlo_b = (days - _Z_EPOCH_DAYS) // _Z_DATE_WIDTH
    days_hi = np.datetime64("1998-01-01").astype("datetime64[D]").astype(int)
    dhi_b = (days_hi - 1 - _Z_EPOCH_DAYS) // _Z_DATE_WIDTH
    cells = {int(_morton4(np.array([p]), np.array([d]))[0])
             for p in pb for d in range(int(dlo_b), int(dhi_b) + 1)}
    assert len(cells) < n_cells / 2


def test_revenue_by_region_bruteforce(ray_session):
    """The star join (broadcast dims + fact-fact hash join) equals the
    brute-force pandas 4-table join."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import revenue_by_region

    sf = "/root/testdata/sf0.001"
    got = (revenue_by_region(sf).to_pandas()
           .sort_values("r_name").reset_index(drop=True))
    t = {n: pq.read_table(f"{sf}/{n}.parquet").to_pandas()
         for n in ("lineitem", "orders", "customer", "nation", "region")}
    m = (t["lineitem"].merge(t["orders"], left_on="l_orderkey",
                             right_on="o_orderkey")
         .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
         .merge(t["nation"], left_on="c_nationkey", right_on="n_nationkey")
         .merge(t["region"], left_on="n_regionkey", right_on="r_regionkey"))
    rev = m["l_extendedprice"] * (1.0 - m["l_discount"]) * 10000.0
    m["revenue_e4"] = np.copysign(np.floor(np.abs(rev) + 0.5),
                                  rev).astype("int64")
    want = (m.groupby("r_name", as_index=False)
            .agg(revenue_e4=("revenue_e4", "sum"),
                 n_items=("revenue_e4", "size"))
            .sort_values("r_name").reset_index(drop=True))
    assert got["r_name"].tolist() == want["r_name"].tolist()
    assert got["revenue_e4"].tolist() == want["revenue_e4"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()


def test_winsorized_revenue_bounds_and_sum(ray_session):
    """Winsorize bounds are the DuckDB quantile_disc order statistics and
    the clipped sum matches a direct recompute."""
    import math

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import winsorized_revenue_by_priority

    sf = "/root/testdata/sf0.001"
    got = (winsorized_revenue_by_priority(sf).to_pandas()
           .set_index("o_orderpriority"))
    o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    o["cents"] = np.copysign(
        np.floor(np.abs(o["o_totalprice"] * 100) + 0.5),
        o["o_totalprice"]).astype("int64")
    for prio, g in o.groupby("o_orderpriority"):
        v = np.sort(g["cents"].to_numpy())
        n = len(v)
        lo = int(v[math.ceil(0.05 * n) - 1])
        hi = int(v[math.ceil(0.95 * n) - 1])
        assert int(got.loc[prio, "lo_cents"]) == lo
        assert int(got.loc[prio, "hi_cents"]) == hi
        assert int(got.loc[prio, "n_orders"]) == n
        assert (int(got.loc[prio, "winsorized_sum_cents"])
                == int(np.clip(v, lo, hi).sum()))


def test_price_size_slope_exact(ray_session):
    """Grouped OLS moments reproduce the closed-form slope/intercept."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import price_size_slope_by_brand

    sf = "/root/testdata/sf0.001"
    got = (price_size_slope_by_brand(sf).to_pandas()
           .set_index("p_brand"))
    p = pq.read_table(f"{sf}/part.parquet").to_pandas()
    p["y"] = np.copysign(np.floor(np.abs(p["p_retailprice"]) + 0.5),
                         p["p_retailprice"]).astype("int64")
    for brand, g in p.groupby("p_brand"):
        x = g["p_size"].to_numpy(dtype=np.int64)
        y = g["y"].to_numpy()
        n = len(g)
        a = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        b = n * int((x * x).sum()) - int(x.sum()) ** 2
        slope = float(a) / float(b)
        intercept = (float(y.sum()) - slope * float(x.sum())) / float(n)
        assert got.loc[brand, "slope"] == float(np.round(slope, 6))
        assert got.loc[brand, "intercept"] == float(np.round(intercept, 6))
        assert int(got.loc[brand, "n_parts"]) == n


def test_phrase_search_positional(ray_session, tmp_path_factory):
    """Positional-index phrase counts equal brute-force token adjacency."""
    import collections

    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import (build_positional_index,
                                              phrase_search_indexed)

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path_factory.mktemp("posidx"))
    build_positional_index(rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]), idx)
    got = phrase_search_indexed(idx, "table hash").to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    want = collections.Counter()
    for did, txt in zip(docs["doc_id"], docs["text"]):
        toks = (txt or "").lower().split()
        want[did] = sum(1 for a, b in zip(toks, toks[1:])
                        if a == "table" and b == "hash")
    want = {k: v for k, v in want.items() if v}
    assert dict(zip(got["doc_id"], got["n_occ"])) == want
    assert len(want) > 0                       # the phrase actually occurs


def test_incremental_event_counts_matches_full(ray_session,
                                               tmp_path_factory):
    """Snapshot + delta merge equals the full recompute, and the snapshot
    really excludes the delta rows."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import (build_event_count_snapshot,
                                              incremental_event_counts)

    sf = "/root/testdata/sf0.001"
    snap = str(tmp_path_factory.mktemp("evsnap"))
    build_event_count_snapshot(sf, snap)
    got = (incremental_event_counts(snap, sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    ev["cents"] = np.copysign(np.floor(np.abs(ev["value"] * 100) + 0.5),
                              ev["value"]).astype("int64")
    want = (ev.groupby("event_type", as_index=False)
            .agg(sum_value_cents=("cents", "sum"), n_events=("cents", "size"))
            .sort_values("event_type").reset_index(drop=True))
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["sum_value_cents"].tolist() == want["sum_value_cents"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    base = pq.read_table(f"{snap}/base_agg.parquet").to_pandas()
    n_delta = (ev["ts"] >= pd.Timestamp("2024-01-22")).sum()
    assert int(base["n_events"].sum()) == len(ev) - int(n_delta)
    assert n_delta > 0


def test_schema_evolution_read_aligns_generations(ray_session,
                                                  tmp_path_factory):
    """v1 files (no priority column) roll up as 'legacy'; totals across
    both generations cover every order exactly once."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import (build_evolved_layout,
                                              schema_evolution_read)

    sf = "/root/testdata/sf0.001"
    lay = str(tmp_path_factory.mktemp("sevol"))
    build_evolved_layout(sf, lay)
    # the two generations really have different physical schemas
    s1 = pq.ParquetFile(f"{lay}/v1/data.parquet").schema_arrow.names
    s2 = pq.ParquetFile(f"{lay}/v2/data.parquet").schema_arrow.names
    assert "o_orderpriority" not in s1 and "o_orderpriority" in s2

    got = schema_evolution_read(lay).to_pandas()
    o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    o["cents"] = np.copysign(np.floor(np.abs(o["o_totalprice"] * 100) + 0.5),
                             o["o_totalprice"]).astype("int64")
    o["prio"] = np.where(o["o_orderkey"] % 2 == 0, "legacy",
                         o["o_orderpriority"])
    want = (o.groupby("prio", as_index=False)
            .agg(sum_cents=("cents", "sum"), n_orders=("cents", "size")))
    gm = dict(zip(got["o_orderpriority"], zip(got["sum_cents"],
                                              got["n_orders"])))
    wm = dict(zip(want["prio"], zip(want["sum_cents"], want["n_orders"])))
    assert {k: (int(a), int(b)) for k, (a, b) in gm.items()} \
        == {k: (int(a), int(b)) for k, (a, b) in wm.items()}
    assert int(got["n_orders"].sum()) == len(o)


def test_range_partition_plan_balances(ray_session):
    """Equi-depth planning: 16 buckets, every order counted once, and no
    bucket deviates more than ±1 row from perfect balance on the
    effectively-continuous price column."""
    from ocr_ray.pipelines.relational import range_partition_plan

    got = range_partition_plan("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    n = pq.ParquetFile(
        "/root/testdata/sf0.001/orders.parquet").metadata.num_rows
    assert int(got["n_orders"].sum()) == n
    assert sorted(got["bucket"]) == list(range(16))
    per = n / 16
    assert (got["n_orders"] - per).abs().max() <= 1


def test_bigram_lm_scores_local_recompute(ray_session):
    """Distributed bigram-LM scores equal a single-process recompute with
    the same integer micro-nat rounding."""
    import collections
    import re

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import bigram_lm_scores

    sf = "/root/testdata/sf0.001"
    got = bigram_lm_scores(sf).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ws = re.compile(r"[ \t\n\f\r]+")

    def bigrams(txt):
        toks = [x for x in ws.split((txt or "").lower()) if x]
        return list(zip(toks, toks[1:]))

    cab = collections.Counter()
    ca = collections.Counter()
    for txt in docs["text"]:
        for a, b in bigrams(txt):
            cab[(a, b)] += 1
            ca[a] += 1
    n_docs_scored = 0
    for did, txt in zip(docs["doc_id"], docs["text"]):
        bg = bigrams(txt)
        if not bg:
            assert did not in got.index
            continue
        n_docs_scored += 1
        score = 0
        for a, b in bg:
            x = 1e6 * np.log(cab[(a, b)] / ca[a])
            score += int(np.copysign(np.floor(abs(x) + 0.5), x))
        assert int(got.loc[did, "score_unats"]) == score
        assert int(got.loc[did, "n_bigrams"]) == len(bg)
    assert n_docs_scored == len(got)


def test_zipf_hot_salting_flattens_and_preserves(ray_session,
                                                 tmp_path_factory):
    """VERDICT r4 item 2: on a 50%-'the' Zipf-skewed corpus the
    heavy-hitter salt drops the max-bucket instance share ~n_salts×,
    non-hot keys keep the exact legacy bucket, and both bigram_lm_scores
    and nb_lang_confusion stay bit-identical to a local recompute."""
    import collections
    import re
    import zlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.relational import (_hot_salted_buckets,
                                              bigram_lm_scores,
                                              nb_lang_confusion)

    # mechanism: bucket histogram of a 50%-hot key stream
    n_b = DEFAULT_CONFIG.near_dup_coarse_buckets
    n_s = DEFAULT_CONFIG.term_hot_salts
    keys = ["the"] * 4000 + [f"w{i}" for i in range(4000)]
    salts = list(range(8000))
    cold = np.bincount(_hot_salted_buckets(keys, salts, frozenset(),
                                           n_b, n_s), minlength=n_b)
    hotb = np.bincount(_hot_salted_buckets(keys, salts, frozenset({"the"}),
                                           n_b, n_s), minlength=n_b)
    assert cold.max() >= 4000                     # one bucket owns "the"
    assert hotb.max() <= cold.max() / (n_s / 2)   # spread ~n_salts ways
    legacy = [zlib.crc32(k.encode()) % n_b for k in keys[4000:]]
    assert list(_hot_salted_buckets(keys[4000:], salts[4000:],
                                    frozenset({"the"}), n_b, n_s)) == legacy

    # end-to-end on a skewed corpus (hot detection certainly fires)
    d = tmp_path_factory.mktemp("zipf_docs")
    rows = []
    for i in range(120):
        lang = ["en", "fr"][i % 2]
        toks = []
        for j in range(6):
            toks += ["the", f"{lang}tok{j}{i % 7}"]
        rows.append((i, " ".join(toks), lang))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    ws = re.compile(r"[ \t\n\f\r]+")

    def toks_of(s):
        return [x for x in ws.split((s or "").lower()) if x]

    def r6(x):
        return int(np.copysign(np.floor(abs(x) + 0.5), x))

    # bigram LM vs local recompute
    got = bigram_lm_scores(str(d)).to_pandas().set_index("doc_id")
    cab: collections.Counter = collections.Counter()
    ca: collections.Counter = collections.Counter()
    for _, txt, _l in rows:
        t = toks_of(txt)
        for a, b in zip(t, t[1:]):
            cab[(a, b)] += 1
            ca[a] += 1
    for did, txt, _l in rows:
        t = toks_of(txt)
        want = sum(r6(1e6 * np.log(cab[(a, b)] / ca[a]))
                   for a, b in zip(t, t[1:]))
        assert int(got.loc[did, "score_unats"]) == want

    # naive-bayes confusion vs local recompute
    gotnb = nb_lang_confusion(str(d)).to_pandas()
    cnt: collections.Counter = collections.Counter()
    t_l: collections.Counter = collections.Counter()
    n_l: collections.Counter = collections.Counter()
    vocab = set()
    for _, txt, lang in rows:
        n_l[lang] += 1
        for tk in toks_of(txt):
            cnt[(lang, tk)] += 1
            t_l[lang] += 1
            vocab.add(tk)
    V, classes, n_tot = len(vocab), sorted(t_l), sum(n_l.values())
    priors = {l: r6(1e6 * np.log(n_l[l] / n_tot)) for l in classes}
    conf: collections.Counter = collections.Counter()
    for _, txt, lang in rows:
        c = collections.Counter(toks_of(txt))
        best = None
        for l in classes:
            s = priors[l] + sum(
                r6(1e6 * np.log((cnt[(l, tk)] + 1) / (t_l[l] + V))) * m
                for tk, m in c.items())
            if best is None or s > best[1]:
                best = (l, s)
        conf[(lang, best[0])] += 1
    gotmap = {(a, b): int(n) for a, b, n in
              zip(gotnb["lang"], gotnb["pred_lang"], gotnb["n_docs"])}
    assert gotmap == dict(conf)


def test_bpe_merges_iterated(ray_session, tmp_path_factory):
    """Iterated BPE: round 1 pins to bpe_merge_candidates' top row, the
    distributed path equals the fused single-task path, and a
    hand-computable corpus yields the known greedy merge sequence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import (_bpe_apply,
                                              bpe_merge_candidates,
                                              bpe_merges)

    # greedy left-to-right application semantics
    assert _bpe_apply(list("aaaa"), [("a", "a")]) == ["aa", "aa"]
    assert _bpe_apply(list("aaa"), [("a", "a")]) == ["aa", "a"]
    assert _bpe_apply(list("abab"), [("a", "b"), ("ab", "ab")]) == ["abab"]

    sf = "/root/testdata/sf0.001"
    got = bpe_merges(sf, n_rounds=3).to_pandas().sort_values("round")
    cand = bpe_merge_candidates(sf, k=1).to_pandas()
    assert got.iloc[0]["left_sym"] + got.iloc[0]["right_sym"] == \
        cand.iloc[0]["pair"]
    assert int(got.iloc[0]["n"]) == int(cand.iloc[0]["n"])
    assert list(got["round"]) == [1, 2, 3]

    # distributed rounds (fused tail disabled) produce identical merges
    dist = bpe_merges(sf, n_rounds=3, fuse_vocab_rows=0)
    dist = (dist.to_pandas() if hasattr(dist, "to_pandas") else dist)
    pd_got = got.reset_index(drop=True)
    pd_dist = dist.sort_values("round").reset_index(drop=True)
    assert pd_got.equals(pd_dist)

    # hand-computable corpus: "abab abab ab" → merges (a,b), (ab,ab)
    d = tmp_path_factory.mktemp("bpe_docs")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["abab abab", "ab cd"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
        "n_chars": pa.array([9, 5], pa.int64()),
    }), str(d / "documents.parquet"))
    tiny = bpe_merges(str(d), n_rounds=2).to_pandas().sort_values("round")
    assert list(tiny["merged"]) == ["ab", "abab"]
    # round 1: 'ab' pairs = 2+2 in "abab" docs... counted per word:
    # "abab"x2 → (a,b)x2 each, "ab" → 1, "cd" → 0 ⇒ n=5; round 2: "abab"
    # words re-segment to [ab, ab] ⇒ (ab,ab) n=2
    assert list(tiny["n"]) == [5, 2]

    # apply side: abab/abab/ab/cd → 1 symbol each after 3 merge rounds
    # (round 3 learns (c,d) — the only pair left)
    from ocr_ray.pipelines.relational import bpe_tokenize_stats

    st = bpe_tokenize_stats(str(d), n_rounds=3).to_pandas()
    assert len(st) == 1 and st.iloc[0]["lang"] == "en"
    assert int(st.iloc[0]["n_words"]) == 4
    assert int(st.iloc[0]["n_symbols_before"]) == 12
    assert int(st.iloc[0]["n_symbols_after"]) == 4


def test_dsir_weights_local_recompute(ray_session, tmp_path_factory):
    """DSIR hashed-feature importance weights equal a local recompute
    with the same md5 buckets, Laplace smoothing and per-side integer
    micro-nat rounding — and target-domain docs score above non-target
    docs on a vocabulary-separated corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.relational import _md5_mod, dsir_weights

    d = tmp_path_factory.mktemp("dsir_docs")
    rows = []
    for i in range(60):
        lang = ["en", "fr"][i % 2]
        toks = [f"{lang}word{j}{i % 5}" for j in range(10)]
        rows.append((i, " ".join(toks), lang))
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), str(d / "documents.parquet"))

    B = DEFAULT_CONFIG.dsir_buckets
    ct = np.zeros(B, np.int64)
    cr = np.zeros(B, np.int64)
    for _, txt, lang in rows:
        b = _md5_mod(txt.split(), B)
        cnt = np.bincount(b, minlength=B)
        cr += cnt
        if lang == "en":
            ct += cnt

    def r6(x):
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    term = (r6(1e6 * np.log((ct + 1.0) / (float(ct.sum()) + B)))
            - r6(1e6 * np.log((cr + 1.0) / (float(cr.sum()) + B))))
    got = dsir_weights(str(d)).to_pandas().set_index("doc_id")
    for did, txt, lang in rows:
        b = _md5_mod(txt.split(), B)
        want = int(np.bincount(b, minlength=B) @ term)
        assert int(got.loc[did, "weight_unats"]) == want
        assert int(got.loc[did, "n_tokens"]) == 10
    mean_en = got.loc[[r[0] for r in rows if r[2] == "en"],
                      "weight_unats"].mean()
    mean_fr = got.loc[[r[0] for r in rows if r[2] == "fr"],
                      "weight_unats"].mean()
    assert mean_en > mean_fr        # target domain ranks above non-target


def test_dsir_select_stats_top_quota(ray_session):
    """Per-lang selection keeps exactly min(quota, n_lang) docs, the
    selected weight range matches a driver-side recompute from
    dsir_weights, and the result is partition-invariant."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.relational import dsir_select_stats, dsir_weights

    sf = "/root/testdata/sf0.001"
    quota = 20
    got = (dsir_select_stats(sf, quota=quota).to_pandas()
           .sort_values("lang").reset_index(drop=True))

    w = dsir_weights(sf).to_pandas()
    langs = pq.read_table(os.path.join(sf, "documents.parquet"),
                          columns=["doc_id", "lang"]).to_pandas()
    full = w.merge(langs, on="doc_id")
    want = (full.sort_values(["weight_unats", "doc_id"],
                             ascending=[False, True])
            .groupby("lang").head(quota)
            .groupby("lang")
            .agg(n_selected=("doc_id", "size"),
                 sum_tokens=("n_tokens", "sum"),
                 min_weight_unats=("weight_unats", "min"),
                 max_weight_unats=("weight_unats", "max"))
            .reset_index())
    for col in ("n_selected", "sum_tokens",
                "min_weight_unats", "max_weight_unats"):
        assert got[col].tolist() == want[col].tolist(), col
    assert (got["n_selected"] == quota).all()   # every lang has > quota docs


def test_lang_mixture_weights(ray_session):
    """alpha-temperature mixture: weights sum to ~1e6, tail languages are
    upweighted relative to their raw share, and the closed form matches a
    driver-side recompute."""
    import numpy as np

    from ocr_ray.pipelines.relational import lang_mixture_weights

    got = (lang_mixture_weights("/root/testdata/sf0.001").to_pandas()
           .sort_values("lang").reset_index(drop=True))
    n = got["n_docs"].to_numpy(np.float64)
    p = n / n.sum()
    pow_micro = np.floor(1e6 * p ** 0.3 + 0.5).astype(np.int64)
    w_micro = np.floor(1e6 * pow_micro / float(pow_micro.sum()) + 0.5
                       ).astype(np.int64)
    assert got["pow_micro"].tolist() == pow_micro.tolist()
    assert got["w_micro"].tolist() == w_micro.tolist()
    assert abs(got["w_micro"].sum() - 1_000_000) <= len(got)  # rounding slack
    # temperature flattens the mix: head lang loses share, tail gains
    share = got["w_micro"].to_numpy(np.float64) / 1e6
    head, tail = p.argmax(), p.argmin()
    assert share[head] < p[head] and share[tail] > p[tail]


def test_grouped_split_audit_no_source_straddle(ray_session):
    """Group split: doc totals cover the corpus, source counts cover the
    distinct sources exactly once (no source straddles two splits), and
    leaky-doc counts are bounded by the split's doc count."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import grouped_split_audit

    got = (grouped_split_audit("/root/testdata/sf0.001").to_pandas()
           .sort_values("split").reset_index(drop=True))
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["source"])
    assert got["n_docs"].sum() == t.num_rows
    assert got["n_sources"].sum() == len(set(t["source"].to_pylist()))
    assert (got["n_leaky_docs"] <= got["n_docs"]).all()
    assert (got["n_leaky_docs"] > 0).any()     # a doc-level split WOULD leak


def test_lm_quality_buckets_partitions_scored_docs(ray_session):
    """Per-lang terciles partition exactly the LM-scored docs (token-less
    docs excluded), every lang has all three buckets on the testdata, and
    the tercile boundaries put bucket sizes within ties of total/3."""
    from ocr_ray.pipelines.relational import (bigram_lm_scores,
                                              lm_quality_buckets)

    sf = "/root/testdata/sf0.001"
    got = lm_quality_buckets(sf).to_pandas()
    n_scored = len(bigram_lm_scores(sf).to_pandas())
    assert int(got["n_docs"].sum()) == n_scored
    per_lang = got.groupby("lang")["bucket"].nunique()
    assert (per_lang == 3).all()
    for lang, g in got.groupby("lang"):
        total = g["n_docs"].sum()
        assert g["n_docs"].min() >= 1
        # disc-quantile buckets deviate from total/3 only through ties
        assert g["n_docs"].max() <= total  # sanity; exactness is oracle-pinned


def test_heavy_hitter_terms_huge_k_empty(ray_session):
    """An impossible threshold (k=1 → n > N) returns a typed empty
    result, not a column-less crash."""
    from ocr_ray.pipelines.relational import heavy_hitter_terms

    got = heavy_hitter_terms("/root/testdata/sf0.001", k=1)
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(df) == 0


def test_price_size_slope_zero_variance_null(ray_session,
                                             tmp_path_factory):
    """A brand with zero size variance yields NULL slope/intercept (the
    oracle's double-division-by-zero semantics), not a crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import price_size_slope_by_brand

    d = tmp_path_factory.mktemp("uniform_brand")
    pq.write_table(pa.table({
        "p_partkey": pa.array([0, 1, 2], pa.int64()),
        "p_brand": pa.array(["B#1", "B#1", "B#2"], pa.string()),
        "p_type": pa.array(["t", "t", "t"], pa.string()),
        "p_size": pa.array([7, 7, 3], pa.int32()),
        "p_retailprice": pa.array([100.0, 200.0, 150.0], pa.float64()),
    }), str(d / "part.parquet"))
    got = price_size_slope_by_brand(str(d)).to_pandas().set_index("p_brand")
    assert np.isnan(got.loc["B#1", "slope"])      # uniform size → NULL
    assert np.isnan(got.loc["B#1", "intercept"])
    assert np.isnan(got.loc["B#2", "slope"])      # singleton → NULL too


def test_embedding_quantize_stats_checksum(ray_session):
    """Distributed two-pass quantization equals a local recompute,
    including the NULL path for a constant dimension."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import embedding_quantize_stats

    sf = "/root/testdata/sf0.001"
    got = embedding_quantize_stats(sf).to_pandas().set_index("dim")
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    m = np.stack([np.asarray(x, np.float64)
                  for x in t["embedding"].to_pylist()])
    lo = m.min(axis=0)
    hi = m.max(axis=0)
    x = (m - lo[None, :]) / (hi - lo)[None, :] * 255.0
    codes = np.copysign(np.floor(np.abs(x) + 0.5), x)
    for d in range(m.shape[1]):
        row = got.loc[d + 1]
        assert int(row["lo_e6"]) == int(np.copysign(
            np.floor(abs(lo[d] * 1e6) + 0.5), lo[d]))
        assert int(row["hi_e6"]) == int(np.copysign(
            np.floor(abs(hi[d] * 1e6) + 0.5), hi[d]))
        assert int(row["n_vecs"]) == m.shape[0]
        assert int(row["sum_codes"]) == int(codes[:, d].sum())
        assert 0 <= codes[:, d].min() and codes[:, d].max() <= 255


def test_pack_sequences_matches_assignment(ray_session):
    """Sequences are exactly the assignment op's bins with the docs'
    texts newline-joined in doc_id order."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import (pack_context_windows,
                                              pack_sequences)

    sf = "/root/testdata/sf0.001"
    seqs = (pack_sequences(sf).to_pandas()
            .set_index(["shard", "bin_idx"]).sort_index())
    assign = pack_context_windows(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assign = assign.merge(docs, on="doc_id")
    for (shard, b), g in assign.groupby(["shard", "bin_idx"]):
        g = g.sort_values("doc_id")
        row = seqs.loc[(shard, b)]
        assert int(row["n_docs"]) == len(g)
        assert int(row["sum_tokens"]) == int(g["n_tokens"].sum())
        assert row["seq_text"] == "\n".join(x or "" for x in g["text"])
    assert len(seqs) == assign.groupby(["shard", "bin_idx"]).ngroups


def test_max_concurrent_sessions_sweep(ray_session):
    """Distributed day-bucketed sweepline equals a single-process global
    sweep over the same sessionization."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.windows import max_concurrent_sessions

    sf = "/root/testdata/sf0.001"
    got = max_concurrent_sessions(sf).to_pandas()
    ev = (pq.read_table(f"{sf}/events.parquet",
                        columns=["user_id", "event_id", "ts"]).to_pandas()
          .sort_values(["user_id", "ts", "event_id"]))
    new_user = ev["user_id"].ne(ev["user_id"].shift())
    brk = (ev["ts"].diff() > pd.Timedelta(minutes=30)) | new_user
    sess = (ev.assign(sid=brk.cumsum()).groupby("sid")
            .agg(st=("ts", "min"), en=("ts", "max")))
    bounds = sorted(
        [(t, 1) for t in sess["st"]] + [(t, -1) for t in sess["en"]],
        key=lambda x: (x[0], -x[1]))
    run, mx = 0, 0
    for _, d in bounds:
        run += d
        mx = max(mx, run)
    assert int(got["n_sessions"][0]) == len(sess)
    assert int(got["max_concurrent"][0]) == mx
    assert mx > 1                      # the corpus actually overlaps


def test_monthly_revenue_mom_deltas(ray_session):
    """MoM deltas telescope: sum of deltas equals last minus first month,
    and every row's delta is consistent with its own columns."""
    from ocr_ray.pipelines.relational import monthly_revenue_mom

    got = (monthly_revenue_mom("/root/testdata/sf0.001").to_pandas()
           .sort_values("month").reset_index(drop=True))
    assert (got["mom_delta_cents"]
            == got["revenue_cents"] - got["prev_revenue_cents"]).all()
    assert (got["prev_revenue_cents"].iloc[1:].to_numpy()
            == got["revenue_cents"].iloc[:-1].to_numpy()).all()
    assert int(got["mom_delta_cents"].sum()) == int(
        got["revenue_cents"].iloc[-1] - got["prev_revenue_cents"].iloc[0])


def test_bm25_search_local_recompute(ray_session):
    """Distributed BM25 equals a single-process recompute with the same
    per-term integer rounding and ranking."""
    import collections
    import re

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import bm25_search

    sf = "/root/testdata/sf0.001"
    got = bm25_search(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ws = re.compile(r"[ \t\n\f\r]+")
    terms = ["table", "hash", "join"]

    def toks(txt):
        return [x for x in ws.split((txt or "").lower()) if x]

    n_docs = len(docs)
    all_toks = [toks(t) for t in docs["text"]]
    sum_dl = sum(len(t) for t in all_toks)
    avgdl = float(sum_dl) / n_docs
    dfs = {q: sum(q in set(t) for t in all_toks) for q in terms}
    scores = {}
    for did, tk in zip(docs["doc_id"], all_toks):
        c = collections.Counter(tk)
        s = 0
        for q in terms:
            tf = c.get(q, 0)
            if not tf:
                continue
            idf = float(np.log((n_docs - dfs[q] + 0.5)
                               / (dfs[q] + 0.5) + 1.0))
            x = 1e6 * (idf * (float(tf) * 2.2)
                       / (float(tf) + 1.2 * (0.25 + 0.75 * float(len(tk))
                                             / avgdl)))
            s += int(np.copysign(np.floor(abs(x) + 0.5), x))
        if s:
            scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["doc_id"], got["score_e6"])) == want


def test_embedding_gram_matrix_exact(ray_session):
    """Distributed blob-folded Gram equals a local int64 matmul, and is
    symmetric by construction (upper triangle covers it)."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import embedding_gram_matrix

    sf = "/root/testdata/sf0.001"
    got = embedding_gram_matrix(sf).to_pandas()
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    m = np.stack([np.asarray(x, np.float64)
                  for x in t["embedding"].to_pylist()]) * 1e6
    mi = np.copysign(np.floor(np.abs(m) + 0.5), m).astype(np.int64)
    g = mi.T @ mi
    iu = np.triu_indices(g.shape[0])
    want = dict(zip(zip(iu[0] + 1, iu[1] + 1), g[iu]))
    assert dict(zip(zip(got["d1"], got["d2"]), got["gram_e12"])) == want
    assert (got["n_vecs"] == mi.shape[0]).all()
    diag = got[got["d1"] == got["d2"]]["gram_e12"]
    assert (diag > 0).all()            # unit-ish vectors: positive diag


def test_gram_fold_driver_bounded(ray_session):
    """The Gram fold's driver-bound partials are pre-folded worker-side:
    the driver receives <= driver_fold_buckets rows (VERDICT r4 nit 1),
    even when the input is forced into many more batches, and the folded
    total is unchanged."""
    import ray.data as rd

    from ocr_ray.config import DEFAULT_CONFIG
    from ocr_ray.pipelines.relational import (_gram_fold, _gram_folded_ds,
                                              _gram_partial, _prefold)

    sf = "/root/testdata/sf0.001"
    rows = _gram_folded_ds(sf).take_all()
    assert len(rows) <= DEFAULT_CONFIG.driver_fold_buckets

    # force ~200 one-row batches upstream: still <= 8 rows at the driver
    t = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["embedding"])
    many = t.map_batches(_gram_partial, batch_format="pyarrow", batch_size=5)
    folded = _prefold(many, __import__(
        "ocr_ray.pipelines.relational", fromlist=["_gram_add"])._gram_add,
        n_buckets=8)
    rows8 = folded.take_all()
    assert 1 <= len(rows8) <= 8
    dim = int(rows8[0]["dim"])
    total8 = np.zeros((dim, dim), np.int64)
    for r in rows8:
        total8 += np.frombuffer(r["gram"], np.int64).reshape(dim, dim)
    total, n_vecs = _gram_fold(sf)
    assert (total8 == total).all()
    assert sum(int(r["n_vecs"]) for r in rows8) == n_vecs


def test_embedding_top_component_direction(ray_session):
    """The exact-integer power iterate aligns with numpy's float top
    eigenvector of the same Gram matrix (|cosine| > 0.999)."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import embedding_top_component

    sf = "/root/testdata/sf0.001"
    got = (embedding_top_component(sf).to_pandas()
           .sort_values("dim")["component_e6"].to_numpy(np.float64))
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    m = np.stack([np.asarray(x, np.float64)
                  for x in t["embedding"].to_pylist()])
    gram = m.T @ m
    vals, vecs = np.linalg.eigh(gram)
    top = vecs[:, -1]
    cos = abs(got @ top) / (np.linalg.norm(got) * np.linalg.norm(top))
    assert cos > 0.999
    assert np.abs(got).max() == 1_000_000      # L-inf normalized


def test_embedding_pca_projection_exact(ray_session):
    """Projections are the exact integer dot products with the power
    iterate, and their variance dominates any single raw dimension's
    (it is the top principal direction)."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import (embedding_pca_projection,
                                              embedding_top_component)

    sf = "/root/testdata/sf0.001"
    comp = np.asarray(
        embedding_top_component(sf)["component_e6"].to_pylist(), np.int64)
    got = (embedding_pca_projection(sf).to_pandas()
           .set_index("vec_id").sort_index())
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = np.stack([np.asarray(x, np.float64)
                  for x in t["embedding"].to_pylist()]) * 1e6
    mi = np.copysign(np.floor(np.abs(m) + 0.5), m).astype(np.int64)
    want = mi @ comp
    ids = t["vec_id"].to_pylist()
    for vid, w in zip(ids, want):
        assert int(got.loc[vid, "proj_e12"]) == int(w)
    # top-direction property: projection variance >= every raw dim's
    unit = comp.astype(np.float64) / np.linalg.norm(comp)
    proj_var = ((mi.astype(np.float64) @ unit) ** 2).sum()
    dim_vars = (mi.astype(np.float64) ** 2).sum(axis=0)
    assert proj_var >= dim_vars.max() * 0.999


def test_langid_confusion_totals(ray_session):
    """Confusion matrix covers every document exactly once and the
    diagonal dominates (the heuristic mostly agrees with labels)."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import langid_confusion

    sf = "/root/testdata/sf0.001"
    got = langid_confusion(sf).to_pandas()
    n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    assert int(got["n_docs"].sum()) == n
    assert set(got["pred_lang"]) <= {"en", "de", "fr", "es", "und"}
    # the synth corpus text is English-ish under every label: en-labeled
    # docs must be predicted 'en' far more often than 'und'
    en = got[got["lang"] == "en"].set_index("pred_lang")["n_docs"]
    assert int(en.get("en", 0)) > int(en.get("und", 0))


def test_sentence_stats_local(ray_session):
    """Segmentation equals a local recompute; chars never exceed the
    doc length."""
    import re

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import sentence_stats

    sf = "/root/testdata/sf0.001"
    got = sentence_stats(sf).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    for did, txt in zip(docs["doc_id"], docs["text"]):
        segs = [s.strip(" \t\n\f\r")
                for s in re.split(r"[.!?]+", txt or "")]
        segs = [s for s in segs if s]
        assert int(got.loc[did, "n_sentences"]) == len(segs)
        assert int(got.loc[did, "sum_sentence_chars"]) \
            == sum(len(s) for s in segs)
        assert int(got.loc[did, "sum_sentence_chars"]) <= len(txt or "")


def test_bpe_merge_candidates_local(ray_session):
    """Top merge pairs equal a local recompute and are 2-char strings."""
    import collections

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import bpe_merge_candidates

    sf = "/root/testdata/sf0.001"
    got = bpe_merge_candidates(sf).to_pandas()
    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    import re

    ws = re.compile(r"[ \t\n\f\r]+")
    c = collections.Counter()
    for t in texts:
        for w in ws.split((t or "").lower()):
            c.update(w[i:i + 2] for i in range(len(w) - 1))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["pair"], got["n"])) == want
    assert all(len(p) == 2 for p in got["pair"])


def test_nb_lang_confusion_structure(ray_session):
    """NB confusion covers every doc with tokens exactly once; scores
    are a proper partition and training data biases predictions toward
    each label's own vocabulary (diagonal beats the uniform share)."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import nb_lang_confusion

    sf = "/root/testdata/sf0.001"
    got = nb_lang_confusion(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    n_with_tokens = sum(bool((t or "").split()) for t in docs["text"])
    assert int(got["n_docs"].sum()) == n_with_tokens
    labels = set(docs["lang"])
    assert set(got["lang"]) <= labels and set(got["pred_lang"]) <= labels
    diag = int(got[got["lang"] == got["pred_lang"]]["n_docs"].sum())
    assert diag > n_with_tokens / len(labels)   # beats random assignment


def test_robots_filter_first_match(ray_session):
    """Rule attribution is first-match-wins and covers every page."""
    import pyarrow.parquet as pq
    import __ray_entry__ as e
    from ocr_ray.pages_oracle_sql import ROBOTS_RULES

    sf = "/root/testdata/sf0.001"
    got = e.queries()["robots_filter_stats"](sf).to_pandas()
    pages = pq.read_table(e._pages_dir(sf), columns=["url"])
    urls = pages["url"].to_pylist()
    want = {}
    for u in urls:
        rule = next((r for r in ROBOTS_RULES if u.startswith(r)),
                    "allowed")
        want[rule] = want.get(rule, 0) + 1
    assert dict(zip(got["rule"], got["n_pages"])) == want
    assert int(got["n_pages"].sum()) == len(urls)
    # rules 3 and 4 OVERLAP (every src1 url matches both): first-match
    # attribution must credit rule 3 and leave rule 4 with zero hits
    assert want.get(ROBOTS_RULES[2], 0) > 0
    assert ROBOTS_RULES[3] not in want
    assert ROBOTS_RULES[3] not in set(got["rule"])


def test_linear_attribution_equal_split(ray_session):
    """Equal-split credits match a brute-force recompute, and total
    credit per purchase never exceeds its value in milli-cents."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.windows import linear_attribution

    sf = "/root/testdata/sf0.001"
    got = linear_attribution(sf).to_pandas().set_index("user_id")
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    ev["cents"] = np.copysign(np.floor(np.abs(ev["value"] * 100) + 0.5),
                              ev["value"]).astype("int64")
    ev["ts_us"] = ev["ts"].astype("int64")
    want = {}
    for uid, g in ev.groupby("user_id"):
        buys = g[g["event_type"] == "purchase"]
        clicks = g[g["event_type"] == "click"]["ts_us"].to_numpy()
        n_attr, credit = 0, 0
        for _, b in buys.iterrows():
            n = int(((clicks <= b["ts_us"])
                     & (clicks >= b["ts_us"] - 3_600_000_000)).sum())
            if n:
                n_attr += 1
                per = (int(b["cents"]) * 1000) // n
                credit += n * per
                assert n * per <= int(b["cents"]) * 1000
        if n_attr:
            want[uid] = (n_attr, credit)
    assert {u: (int(r["n_attributed_purchases"]),
                int(r["sum_credit_mcents"]))
            for u, r in got.iterrows()} == want


def test_outlink_stats_corpus(ray_session):
    import pyarrow.dataset as pads

    import __ray_entry__ as e

    got = e.queries()["outlink_stats"]("/root/testdata/sf0.001").to_pandas()
    # every html page carries the 18 boilerplate links (nav 3 + linkfarm
    # 12 + footer 3) exactly once; pdf payloads carry none
    pages = pads.dataset(
        e._pages_dir("/root/testdata/sf0.001")).to_table(columns=["url"])
    n_html = sum(not u.split("?")[0].endswith(".pdf")
                 for u in pages["url"].to_pylist())
    assert got["n_links"].sum() == 18 * n_html
    assert (got["n_links"] == got["n_pages"]).all()
    assert (got.groupby("host")["path"].nunique() == 18).all()
    assert set(got.loc[got["path"] == "/about", "host"]) == set(got["host"])


def test_outlink_stats_resolution_and_partition_invariance(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.graph import outlink_stats

    html = (b'<a href="/rel">x</a><a href="https://other.example.com/p/1">y'
            b'</a><a href="https://other.example.com">z</a><a href="/rel">x</a>')
    t = pa.table({
        "url": ["https://me.example.org/doc/1",
                "https://me.example.org/doc/2",
                "https://me.example.org/doc/3"],
        "html": [html, b"", b'<img href="/only">'],
    })
    got = (outlink_stats(rd.from_arrow(t)).to_pandas()
           .set_index(["host", "path"]).sort_index())
    # same-page repeats count once for n_pages, twice for n_links
    assert got.loc[("me.example.org", "/rel"), "n_links"] == 2
    assert got.loc[("me.example.org", "/rel"), "n_pages"] == 1
    # absolute hrefs keep their own host; bare absolute path folds to '/'
    assert got.loc[("other.example.com", "/p/1"), "n_links"] == 1
    assert got.loc[("other.example.com", "/"), "n_links"] == 1
    assert got.loc[("me.example.org", "/only"), "n_links"] == 1
    # partitioning must not change the answer (per-batch partials sum)
    got5 = (outlink_stats(rd.from_arrow(t).repartition(5)).to_pandas()
            .set_index(["host", "path"]).sort_index())
    pd.testing.assert_frame_equal(got, got5)


def test_bitext_margin_matching_properties(ray_session):
    import __ray_entry__ as e

    got = e.queries()["bitext_mining_margin"]("/root/testdata/sf0.001")
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    assert len(got) > 0
    # mutual rank-1 mining yields a MATCHING: no endpoint repeats
    assert got["src_id"].is_unique and got["tgt_id"].is_unique
    # side split is by label parity
    assert (got["src_label"] % 2 == 0).all()
    assert (got["tgt_label"] % 2 == 1).all()
    from ocr_ray.config import DEFAULT_CONFIG
    assert (got["margin_bp"] >= DEFAULT_CONFIG.bitext_margin_bp).all()
    assert (got["sim_micro"] > 0).all() and (got["sim_micro"] <= 1_000_000).all()


def test_bitext_margin_partition_invariance_and_arithmetic(ray_session):
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import (_normalized, _r0,
                                             bitext_margin_pairs)

    # two parallel pairs + one distractor, all in one LSH bucket by
    # construction (identical directions share a sign pattern)
    rng = np.random.default_rng(7)
    base = rng.normal(size=(2, 64))
    vecs = np.vstack([
        base[0], base[0] * 2.0 + rng.normal(size=64) * 1e-3,   # pair A
        base[1], base[1] * 0.5 + rng.normal(size=64) * 1e-3,   # pair B
    ]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1, 2, 3], pa.int32()),
    })
    got = (bitext_margin_pairs(rd.from_arrow(t), k=2, threshold_bp=0)
           .to_pandas().sort_values("src_id").reset_index(drop=True))
    got7 = (bitext_margin_pairs(rd.from_arrow(t).repartition(3), k=2,
                                threshold_bp=0)
            .to_pandas().sort_values("src_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got7)
    assert list(zip(got["src_id"], got["tgt_id"])) == [(0, 1), (2, 3)]
    # margin arithmetic replicated by hand for the (0, 1) pair
    nm = _normalized(vecs.astype(np.float64))
    from ocr_ray.pipelines.simsearch import lsh_bucket
    b = lsh_bucket(vecs.astype(np.float64))
    src = [i for i in (0, 2) if b[i] == b[0]]
    tgt = [j for j in (1, 3) if b[j] == b[0]]
    sim = _r0(np.round(nm[src] @ nm[tgt].T, 6) * 1e6)
    i, j = src.index(0), tgt.index(1)
    kx, ky = min(2, len(tgt)), min(2, len(src))
    sx = int(np.sort(sim[i])[::-1][:kx].sum())
    sy = int(np.sort(sim[:, j])[::-1][:ky].sum())
    d = sx * ky + sy * kx
    want = (2 * 20000 * kx * ky * int(sim[i, j]) + d) // (2 * d)
    assert int(got.loc[got["src_id"] == 0, "margin_bp"].iloc[0]) == want


def test_anchor_text_stats(ray_session):
    import ray.data as rd

    import __ray_entry__ as e
    from ocr_ray.pipelines.graph import anchor_text_stats

    got = (e.queries()["anchor_text_stats"]("/root/testdata/sf0.001")
           .to_pandas().set_index("anchor"))
    # the 18 boilerplate anchors, each linked from every html-bearing host
    assert set(got.index) == (
        {"Home", "About", "Contact", "Terms", "Privacy", "Sitemap"}
        | {f"tag {i}" for i in range(12)})
    assert got["n_hosts"].nunique() == 1           # same hosts everywhere
    assert (got["n_links"] == got["n_links"].iloc[0]).all()
    # distinct-host exactness across partitioning (host pairs shuffle)
    t = pa.table({
        "url": ["https://a.example.org/1", "https://a.example.org/2",
                "https://b.example.org/3"],
        "html": [b'<a href="/x">go</a>', b'<a href="/y">go</a>',
                 b'<a href="/z">go</a><a href="/w">stay</a>'],
    })
    for parts in (1, 5):
        out = (anchor_text_stats(rd.from_arrow(t).repartition(parts))
               .to_pandas().set_index("anchor"))
        assert int(out.loc["go", "n_links"]) == 3
        assert int(out.loc["go", "n_hosts"]) == 2
        assert int(out.loc["stay", "n_hosts"]) == 1


def test_cms_freq_estimates(ray_session):
    import __ray_entry__ as e
    from ocr_ray.pipelines.relational import _cms_cells, _concat_nonempty

    got = e.queries()["cms_freq_estimates"]("/root/testdata/sf0.001")
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    assert len(got) == 10
    # the CMS one-sided error guarantee: estimates never undercount
    assert (got["overcount"] >= 0).all()
    assert (got["n_est"] == got["n_exact"] + got["overcount"]).all()
    # every row of the sketch conserves the total token mass
    cells = _concat_nonempty(
        _cms_cells("/root/testdata/sf0.001", d=4, w=1024)).to_pandas()
    totals = cells.groupby("row")["c"].sum()
    assert totals.nunique() == 1 and len(totals) == 4


def test_url_template_stats(ray_session):
    import __ray_entry__ as e

    got = e.queries()["url_template_stats"]("/root/testdata/sf0.001").to_pandas()
    assert got["n_pages"].sum() == 522            # every frontier row counted
    assert set(got["template"]) == {"/doc/N", "/doc/N.pdf"}
    assert not got["template"].str.contains(r"[0-9]").any()


def test_record_event_stats_prefix_scan(ray_session):
    from ocr_ray.pipelines.windows import record_event_stats

    sf = "/root/testdata/sf0.001"
    got = (record_event_stats(sf).to_pandas()
           .set_index("event_type").sort_index())
    # local replication of the global scan
    import pyarrow.parquet as pq
    df = (pq.read_table(f"{sf}/events.parquet",
                        columns=["event_id", "event_type", "value"])
          .to_pandas().sort_values("event_id"))
    v = df["value"].to_numpy()
    prev = np.empty_like(v); prev[0] = -np.inf
    prev[1:] = np.maximum.accumulate(v)[:-1]
    df["rec"] = (v > prev) | np.isneginf(prev)
    want = (df.groupby("event_type").agg(
        n_events=("rec", "size"), n_records=("rec", "sum")).sort_index())
    assert got["n_events"].to_dict() == want["n_events"].to_dict()
    assert got["n_records"].to_dict() == want["n_records"].to_dict()
    assert got["n_records"].sum() >= 1          # non-degenerate
    # the boundary-carry must make the answer partition-count invariant
    got3 = (record_event_stats(sf, n_parts=3).to_pandas()
            .set_index("event_type").sort_index())
    pd.testing.assert_frame_equal(got, got3)


def test_update_ivf_index_equals_full_build(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import build_ivf_index, update_ivf_index

    src = "/root/testdata/sf0.001/embeddings.parquet"
    full_dir, upd_dir = str(tmp_path / "full"), str(tmp_path / "upd")
    all_ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
    build_ivf_index(all_ds, full_dir, train_sample=256)
    base = rd.read_parquet(src, columns=["vec_id", "embedding"],
                           filter=(pads.field("vec_id") < pads.scalar(256)))
    build_ivf_index(base, upd_dir, train_sample=256)
    pre_files = set(glob.glob(os.path.join(upd_dir, "cell=*", "*.parquet")))
    new = rd.read_parquet(src, columns=["vec_id", "embedding"],
                          filter=(pads.field("vec_id") >= pads.scalar(256)))
    update_ivf_index(upd_dir, new)
    # append-only: every pre-existing file is still there, untouched
    assert pre_files <= set(glob.glob(os.path.join(upd_dir, "cell=*", "*.parquet")))

    def content(d):
        t = pads.dataset(d, partitioning="hive").to_table(
            columns=["vec_id", "cell"])
        return sorted(zip(t["vec_id"].to_pylist(),
                          [int(c) for c in t["cell"].to_pylist()]))

    # frozen quantizer => append-only ingestion IS a full rebuild
    assert content(upd_dir) == content(full_dir)
    cf = pq.read_table(os.path.join(full_dir, "_centroids.parquet"))
    cu = pq.read_table(os.path.join(upd_dir, "_centroids.parquet"))
    assert cf.equals(cu)


def test_update_term_index_appends_searchable(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import (build_term_index,
                                              term_search_indexed,
                                              update_term_index)

    src = "/root/testdata/sf0.001/documents.parquet"
    idx = str(tmp_path / "terms")
    base = rd.read_parquet(src, columns=["doc_id", "text"],
                           filter=(pads.field("doc_id") < pads.scalar(256)))
    build_term_index(base, idx)
    pre = term_search_indexed(idx, "vector").to_pandas()
    pre_files = set(glob.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    assert (pre["doc_id"] < 256).all()
    new = rd.read_parquet(src, columns=["doc_id", "text"],
                          filter=(pads.field("doc_id") >= pads.scalar(256)))
    update_term_index(idx, new)
    # append-only files; the merged lookup covers both slices
    assert pre_files <= set(glob.glob(os.path.join(idx, "bucket=*", "*.parquet")))
    post = term_search_indexed(idx, "vector").to_pandas()
    assert set(pre["doc_id"]) <= set(post["doc_id"])
    assert (post["doc_id"] >= 256).any()


def test_delete_from_term_index_equals_rebuild(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import (build_term_index,
                                              delete_from_term_index,
                                              term_search_indexed)

    src = "/root/testdata/sf0.001/documents.parquet"
    full = str(tmp_path / "full")
    build_term_index(rd.read_parquet(src, columns=["doc_id", "text"]), full)
    pre = term_search_indexed(full, "vector").to_pandas()
    pre_files = set(glob.glob(os.path.join(full, "bucket=*", "*.parquet")))
    dead = rd.read_parquet(src, columns=["doc_id"],
                           filter=(pads.field("doc_id") >= pads.scalar(256)))
    delete_from_term_index(full, dead)
    # postings files untouched — delete is an append-only tombstone segment
    assert pre_files == set(glob.glob(os.path.join(full, "bucket=*",
                                                   "*.parquet")))
    assert glob.glob(os.path.join(full, "_tombstones", "*.parquet"))
    got = (term_search_indexed(full, "vector").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # indistinguishable from an index built without the deleted docs
    surv = str(tmp_path / "surv")
    build_term_index(
        rd.read_parquet(src, columns=["doc_id", "text"],
                        filter=(pads.field("doc_id") < pads.scalar(256))),
        surv)
    want = (term_search_indexed(surv, "vector").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(want)
    assert (got["doc_id"] < 256).all() and len(got) > 0
    # the full-index lookup still sees the (now-deleted) tail
    assert (pre["doc_id"] >= 256).any()


def test_delete_from_minhash_index_equals_rebuild(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import (build_minhash_index,
                                         delete_from_minhash_index,
                                         near_dup_incremental)

    src = "/root/testdata/sf0.001/documents.parquet"

    def slice_ds(pred):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(pred(ids)))

        return rd.read_parquet(src, columns=["doc_id", "text"]).map_batches(
            f, batch_format="pyarrow")

    docs = rd.read_parquet(src, columns=["doc_id", "text"])
    new_ds = slice_ds(lambda i: i % 7 == 0)

    full = str(tmp_path / "full")
    build_minhash_index(slice_ds(lambda i: i % 7 != 0), full)
    delete_from_minhash_index(
        full, slice_ds(lambda i: (i % 7 != 0) & (i % 3 == 1)))
    assert os.path.isdir(os.path.join(full, "_tombstones"))
    got = near_dup_incremental(full, new_ds, docs).to_pandas()

    surv = str(tmp_path / "surv")
    build_minhash_index(
        slice_ds(lambda i: (i % 7 != 0) & ~((i % 3 == 1))), surv)
    want = near_dup_incremental(surv, new_ds, docs).to_pandas()
    assert got.equals(want)
    assert int(got["n_new"].iloc[0]) > 0


def test_delete_from_bm25_index_equals_rebuild(ray_session, tmp_path):
    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import (bm25_search_indexed,
                                              build_bm25_index,
                                              delete_from_bm25_index)

    src = "/root/testdata/sf0.001/documents.parquet"
    full = str(tmp_path / "full")
    build_bm25_index(rd.read_parquet(src, columns=["doc_id", "text"]), full)
    dead = rd.read_parquet(src, columns=["doc_id"],
                           filter=(pads.field("doc_id") >= pads.scalar(300)))
    delete_from_bm25_index(full, dead)
    got = bm25_search_indexed(full, "table hash join", k=20).to_pandas()
    # score-identical to an index BUILT without the deleted docs:
    # n_docs/avgdl from the negative stats segment, idf from surviving df
    surv = str(tmp_path / "surv")
    build_bm25_index(
        rd.read_parquet(src, columns=["doc_id", "text"],
                        filter=(pads.field("doc_id") < pads.scalar(300))),
        surv)
    want = bm25_search_indexed(surv, "table hash join", k=20).to_pandas()
    assert got.equals(want) and len(got) == 20
    assert (got["doc_id"] < 300).all()
    # repeat delete of the same keys is a no-op (idempotent stats)
    delete_from_bm25_index(full, dead)
    again = bm25_search_indexed(full, "table hash join", k=20).to_pandas()
    assert again.equals(want)


def test_standing_query_matches(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import standing_query_matches

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["alpha beta gamma", "beta gamma", "alpha Beta", None],
    })
    qs = ["beta gamma", "alpha beta", "alpha beta gamma", "nomatch beta"]
    got = (standing_query_matches(rd.from_arrow(docs), qs).to_pandas()
           .sort_values("query_id").set_index("query_id"))
    assert list(got.index) == [0, 1, 2]      # zero-match query absent
    assert got.loc[0, "n_matches"] == 2      # docs 1, 2
    assert (got.loc[0, "min_doc_id"], got.loc[0, "max_doc_id"]) == (1, 2)
    assert got.loc[1, "n_matches"] == 2      # docs 1, 3 (case-folded)
    assert got.loc[2, "n_matches"] == 1      # doc 1 only
    # partition invariance of the partial-aggregate merge
    sharded = (standing_query_matches(
        rd.from_arrow(docs).repartition(4), qs).to_pandas()
        .sort_values("query_id").set_index("query_id"))
    assert sharded.equals(got)


def test_phrase_search_n_indexed(ray_session, tmp_path):
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import (build_positional_index,
                                              phrase_search_indexed,
                                              phrase_search_n_indexed)

    src = "/root/testdata/sf0.001/documents.parquet"
    idx = str(tmp_path / "pos")
    build_positional_index(rd.read_parquet(src, columns=["doc_id", "text"]),
                           idx)
    # 2-token parity with the pairwise implementation
    got2 = (phrase_search_n_indexed(idx, "table hash").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want2 = (phrase_search_indexed(idx, "table hash").to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert got2.equals(want2) and len(got2) > 0
    # REPEATED tokens (inexpressible in the pairwise side-tag scheme):
    # sf0.001 has exactly 4 docs with 'batch batch batch', 1 occ each
    got3 = phrase_search_n_indexed(idx, "batch batch batch").to_pandas()
    assert len(got3) == 4 and (got3["n_occ"] == 1).all()
    # a missing token short-circuits to an empty, schema-typed result
    miss = phrase_search_n_indexed(idx, "table zzznotoken").to_pandas()
    assert len(miss) == 0


def test_compact_term_index_applies_tombstones(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import (build_term_index,
                                              compact_term_index,
                                              delete_from_term_index,
                                              term_search_indexed,
                                              update_term_index)

    src = "/root/testdata/sf0.001/documents.parquet"
    idx = str(tmp_path / "terms")
    # two-segment build so compaction has files to merge
    build_term_index(
        rd.read_parquet(src, columns=["doc_id", "text"],
                        filter=(pads.field("doc_id") < pads.scalar(256))),
        idx)
    update_term_index(
        idx, rd.read_parquet(src, columns=["doc_id", "text"],
                             filter=(pads.field("doc_id")
                                     >= pads.scalar(256))))
    delete_from_term_index(
        idx, rd.read_parquet(src, columns=["doc_id"],
                             filter=(pads.field("doc_id")
                                     >= pads.scalar(400))))
    want = (term_search_indexed(idx, "vector").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    summary = compact_term_index(idx)
    assert summary["rows_dropped"] > 0
    assert summary["files_after"] <= summary["files_before"]
    # tombstones physically applied and cleared; one file per bucket
    assert not glob.glob(os.path.join(idx, "_tombstones", "*.parquet"))
    for d in glob.glob(os.path.join(idx, "bucket=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    got = (term_search_indexed(idx, "vector").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.equals(want)
    assert (got["doc_id"] < 400).all() and len(got) > 0


def test_delete_from_ivf_index_tombstones(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import (build_ivf_index,
                                             delete_from_ivf_index,
                                             knn_ivf_indexed)

    src = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.read_parquet(src, columns=["vec_id", "embedding"]),
                    idx)
    q = [0.0] * 64
    q[0] = 1.0
    pre = knn_ivf_indexed(idx, q, k=50).to_pandas()
    pre_files = set(glob.glob(os.path.join(idx, "cell=*", "*.parquet")))
    dead_ids = set(pre["vec_id"].iloc[:5])  # the pre-delete top-5
    delete_from_ivf_index(
        idx, rd.read_parquet(src, columns=["vec_id"],
                             filter=pads.field("vec_id").isin(
                                 [int(v) for v in dead_ids])))
    # cells and quantizer untouched — delete is a tombstone segment
    assert pre_files == set(glob.glob(os.path.join(idx, "cell=*",
                                                   "*.parquet")))
    assert os.path.exists(os.path.join(idx, "_centroids.parquet"))
    got = knn_ivf_indexed(idx, q, k=10).to_pandas()
    assert dead_ids.isdisjoint(set(got["vec_id"]))
    # survivors backfill: result == pre-delete ranking minus deleted keys
    want = pre[~pre["vec_id"].isin(dead_ids)].head(10)
    assert list(got["vec_id"]) == list(want["vec_id"])
    assert list(got["sim"]) == list(want["sim"])
    # compaction physically applies the tombstones, clears them, and is
    # invisible at the probe surface
    from ocr_ray.pipelines.simsearch import compact_ivf_index

    stats = compact_ivf_index(idx)
    assert stats["rows_dropped"] == len(dead_ids)
    assert not os.path.isdir(os.path.join(idx, "_tombstones"))
    after = knn_ivf_indexed(idx, q, k=10).to_pandas()
    assert after.equals(got)


def test_scd2_doc_history_versions(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["scd2_doc_history"]("/root/testdata/sf0.001")
           .to_pandas())
    n_docs = 500
    per_doc = got.groupby("doc_id").size()
    assert len(per_doc) == n_docs
    # expected versions: 1 + [17 | id] + [11 | id] (cumulative revisions)
    for did, n in ((0, 3), (1, 1), (17, 2), (11, 2), (187, 3)):
        assert per_doc.get(did, 0) == n, did
    # version 1 always spans from snap 0; current rows carry sentinel 3
    v1 = got[got["version"] == 1]
    assert (v1["valid_from"] == 0).all() and len(v1) == n_docs
    cur = got.sort_values(["doc_id", "version"]).groupby("doc_id").tail(1)
    assert (cur["valid_to"] == 3).all()
    # validity intervals chain: next valid_from == previous valid_to
    g = got.sort_values(["doc_id", "version"])
    nxt_from = g.groupby("doc_id")["valid_from"].shift(-1)
    inner = g[nxt_from.notna()]
    assert (inner["valid_to"].to_numpy()
            == nxt_from.dropna().to_numpy()).all()


def test_ann_dim_truncation_recall(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["ann_dim_truncation_recall"]("/root/testdata/sf0.001")
           .to_pandas().iloc[0])
    assert got["k"] == 10 and got["n_exact"] == 10 and got["n_approx"] == 10
    assert 0 <= got["n_common"] <= 10
    # vec 0 itself survives any coordinate truncation (self-cos == 1)
    assert got["n_common"] >= 1
    assert got["recall_bp"] == int(np.floor(10000 * got["n_common"] / 10 + 0.5))


def test_zipf_host_rollup_skew_shape(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["zipf_host_rollup"]("/root/testdata/sf0.001")
           .to_pandas().set_index("host").sort_index())
    assert got["n_pages"].sum() == 522
    # the generator's Zipf law: host-00 owns ~half, each next halves
    share0 = got.loc["host-00", "n_pages"] / got["n_pages"].sum()
    assert 0.45 < share0 < 0.55
    ordered = got.sort_index()["n_pages"].to_numpy()
    assert (ordered[:4] > ordered[1:5]).all()      # monotone head


def test_zipf_partition_balance(ray_session):
    import __ray_entry__ as e

    got = (e.queries()["zipf_partition_balance"]("/root/testdata/sf0.001")
           .to_pandas())
    assert got["n_pages"].sum() == 522 and len(got) == 16
    # url-hash sharding defuses the 50%-host skew: near-uniform parts
    assert got["n_pages"].max() / got["n_pages"].median() < 1.5
    # and every partition mixes several hosts
    assert (got["n_hosts"] >= 3).all()


def test_compact_ivf_index_content_neutral(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import (build_ivf_index,
                                             compact_ivf_index,
                                             update_ivf_index)

    src = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "ivf")
    base = rd.read_parquet(src, columns=["vec_id", "embedding"],
                           filter=(pads.field("vec_id") < pads.scalar(256)))
    build_ivf_index(base, idx, train_sample=256)
    new = rd.read_parquet(src, columns=["vec_id", "embedding"],
                          filter=(pads.field("vec_id") >= pads.scalar(256)))
    update_ivf_index(idx, new)

    def content(d):
        t = pads.dataset(d, partitioning="hive").to_table(
            columns=["vec_id", "cell"])
        return sorted(zip(t["vec_id"].to_pylist(),
                          [int(c) for c in t["cell"].to_pylist()]))

    before = content(idx)
    stats = compact_ivf_index(idx)
    assert content(idx) == before                      # content-neutral
    files = glob.glob(os.path.join(idx, "cell=*", "*.parquet"))
    assert stats["files_after"] == len(files)
    assert stats["files_after"] <= stats["cells"]      # one file per cell
    assert stats["files_before"] > stats["files_after"]
    # no swap debris left behind
    assert not glob.glob(os.path.join(idx, "_tmp-*"))
    assert not glob.glob(os.path.join(idx, "_old-*"))


def test_bottomk_quantile_estimates(ray_session):
    import __ray_entry__ as e

    got = e.queries()["bottomk_quantile_estimates"]("/root/testdata/sf0.001")
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    assert list(got["q"]) == [0.25, 0.5, 0.75, 0.9, 0.99]
    assert (got["abs_err"] == (got["est_value"] - got["exact_value"]).abs()).all()
    # estimates are monotone in q (order statistics of one sorted sample)
    assert got["est_value"].is_monotonic_increasing
    # a 64-doc uniform sample should land in the right ballpark
    assert (got["abs_err"] <= got["exact_value"].clip(lower=1)).all()


def test_cms_join_size_estimate(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    got = (e.queries()["cms_join_size_estimate"]("/root/testdata/sf0.001")
           .to_pandas().iloc[0])
    # local replication of the exact join size
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    clicks = df[df["event_type"] == "click"]["user_id"].value_counts()
    buys = df[df["event_type"] == "purchase"]["user_id"].value_counts()
    want = int((clicks * buys).dropna().sum())
    assert int(got["exact_size"]) == want
    assert int(got["n_clicks"]) == int((df["event_type"] == "click").sum())
    # CMS inner product never undercounts
    assert int(got["overcount"]) >= 0
    assert int(got["est_size"]) == int(got["exact_size"]) + int(got["overcount"])


def test_median_event_value_refined(ray_session):
    import math

    import pyarrow.parquet as pq

    import __ray_entry__ as e

    got = (e.queries()["median_event_value_refined"]("/root/testdata/sf0.001")
           .to_pandas().set_index("event_type"))
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for et, g in df.groupby("event_type"):
        vals = np.sort(g["value"].to_numpy())
        med = vals[max(1, math.ceil(0.5 * len(vals))) - 1]
        assert int(got.loc[et, "median_cents"]) == int(
            np.floor(abs(med) * 100 + 0.5) * np.sign(med))
        assert int(got.loc[et, "n_events"]) == len(vals)


def test_hits_scores(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    got = (e.queries()["hits_scores"]("/root/testdata/sf0.001")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    n = pq.read_metadata("/root/testdata/sf0.001/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    # local dense replication of the two HITS half-iterations
    a1 = np.zeros(n, dtype=np.int64)
    np.add.at(a1, (ids * 2 + 1) % n, 1_000_000)
    np.add.at(a1, (ids * 3 + 2) % n, 1_000_000)
    h1 = a1[(ids * 2 + 1) % n] + a1[(ids * 3 + 2) % n]
    a2 = np.zeros(n, dtype=np.int64)
    np.add.at(a2, (ids * 2 + 1) % n, h1)
    np.add.at(a2, (ids * 3 + 2) % n, h1)
    assert len(got) == n
    assert (got["doc_id"].to_numpy() == ids).all()
    assert (got["hub_scaled"].to_numpy() == h1).all()
    assert (got["auth_scaled"].to_numpy() == a2).all()


def test_corpus_log_odds(ray_session):
    import collections

    import pyarrow.parquet as pq

    import __ray_entry__ as e

    got = (e.queries()["corpus_log_odds"]("/root/testdata/sf0.001")
           .to_pandas().reset_index(drop=True))
    df = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["lang", "text"]).to_pandas()
    cnt: collections.Counter = collections.Counter()
    for lang, txt in zip(df["lang"], df["text"]):
        s = "en" if lang == "en" else "rest"
        for tok in (txt or "").lower().split():
            cnt[(s, tok)] += 1
    terms = sorted({t for _, t in cnt})
    y_en = np.array([cnt[("en", t)] for t in terms], dtype=np.float64)
    y_rest = np.array([cnt[("rest", t)] for t in terms], dtype=np.float64)
    n_en, n_rest, v = y_en.sum(), y_rest.sum(), len(terms)

    def r6(x):
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    lo_en = r6(1e6 * np.log((y_en + 1.0) / (n_en + v - y_en - 1.0)))
    lo_rest = r6(1e6 * np.log((y_rest + 1.0) / (n_rest + v - y_rest - 1.0)))
    keep = (y_en + y_rest) >= 5
    want = (pd.DataFrame({
        "term": np.array(terms, dtype=object)[keep],
        "y_en": y_en[keep].astype(np.int64),
        "y_rest": y_rest[keep].astype(np.int64),
        "lo_en_micro": lo_en[keep], "lo_rest_micro": lo_rest[keep],
        "delta_micro": (lo_en - lo_rest)[keep],
    }).sort_values(["delta_micro", "term"], ascending=[False, True])
      .head(25).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_near_dup_keep_best_quality_representative(ray_session):
    """near_dup_keep_best keeps the max-quality member (tie -> min id)
    per cluster, is partition-invariant, and accepts both label forms."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import near_dup_keep_best

    rows = {  # doc_id -> (text, n_chars quality)
        1: ("cluster one text", 10),
        2: ("cluster one text longer", 23),   # highest quality -> kept
        9: ("cluster one text", 10),
        5: ("cluster two text", 16),          # tie with 7 -> min id kept
        7: ("cluster two text", 16),
        3: ("unique alpha", 12), 4: ("unique beta", 11),
    }
    t = pa.table({
        "doc_id": pa.array(list(rows), pa.int64()),
        "text": pa.array([v[0] for v in rows.values()], pa.string()),
        "n_chars": pa.array([v[1] for v in rows.values()], pa.int64()),
    })
    labels = pa.table({
        "doc_id": pa.array([1, 2, 9, 5, 7], pa.int64()),
        "dup_of": pa.array([1, 1, 1, 5, 5], pa.int64()),
    })
    expected = {2, 5, 3, 4}
    for n_parts in (1, 5):
        surv = near_dup_keep_best(
            rd.from_arrow(t).repartition(n_parts), labels=labels)
        assert set(surv.to_pandas()["doc_id"]) == expected

    # Dataset-form labels (the minhash_near_dup output shape)
    surv = near_dup_keep_best(rd.from_arrow(t),
                              labels=rd.from_arrow(labels))
    assert set(surv.to_pandas()["doc_id"]) == expected


def test_soft_dedup_commonness_exact_values(ray_session):
    """A doc of entirely unique text scores exactly 1e6; a doc whose
    every window occurs twice corpus-wide scores exactly 2e6."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import soft_dedup_commonness

    dup = "alpha beta gamma delta epsilon zeta eta theta iota"   # 9 words
    uniq = "one two three four five six seven eight nine"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([dup, dup, uniq], pa.string()),
    })
    out = (soft_dedup_commonness(rd.from_arrow(t).repartition(3))
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "commonness_e6"] == 2_000_000
    assert out.loc[1, "commonness_e6"] == 2_000_000
    assert out.loc[2, "commonness_e6"] == 1_000_000
    assert out.loc[0, "n_windows"] == 2 and out.loc[0, "dup_sum"] == 4


def test_kcore_distributed_matches_fused(ray_session, tmp_path):
    """The 2-exchange message-round k-core path (fuse_nodes=0) returns
    the identical peel trajectory as the fused single-task path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import kcore_peel_counts

    sf = str(tmp_path)
    pq.write_table(pa.table({"doc_id": pa.array(range(137), pa.int64())}),
                   f"{sf}/documents.parquet")
    fused = kcore_peel_counts(sf, k=4, rounds=3).to_pandas()
    dist = kcore_peel_counts(sf, k=4, rounds=3, fuse_nodes=0).to_pandas()
    assert fused.values.tolist() == dist.values.tolist()


def test_hll_distinct_users(ray_session):
    import hashlib

    import pyarrow.parquet as pq

    import __ray_entry__ as e

    got = (e.queries()["hll_distinct_users"]("/root/testdata/sf0.001")
           .to_pandas().set_index("event_type"))
    df = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    # exact side really is exact
    want_nd = df.groupby("event_type")["user_id"].nunique()
    assert got["n_exact"].to_dict() == want_nd.to_dict()
    # recompute the registers + the integer-exact raw estimate locally
    for et, g in df.groupby("event_type"):
        regs = [0] * 256
        for u in g["user_id"].unique():
            h = int.from_bytes(
                hashlib.md5(str(u).encode()).digest()[8:16], "little")
            w = h >> 8
            rho = 57 if w == 0 else (w & -w).bit_length()
            if rho > regs[h % 256]:
                regs[h % 256] = rho
        s = sum(1 << (57 - r) for r in regs)
        want = (1846528 * 256 * 256 << 57) // (2570790 * s)
        assert int(got.loc[et, "hll_est"]) == want
        assert int(got.loc[et, "v_zero"]) == sum(1 for r in regs if r == 0)
    # the HLL accuracy promise (sigma ~ 1.04/sqrt(256) = 6.5%) holds
    big = got[got["n_exact"] >= 1000]
    if len(big):
        rel = (big["hll_est"] - big["n_exact"]).abs() / big["n_exact"]
        assert (rel < 0.25).all()


def test_pii_scrub_stats(ray_session, tmp_path):
    import re

    import pandas as pd

    from ocr_ray.pipelines.relational import _PII_PATTERNS, pii_scrub_stats

    n = 144
    df = pd.DataFrame({"doc_id": range(n), "text": ["lorem ipsum"] * n,
                       "lang": ["en"] * n})
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/documents.parquet", index=False)
    got = (pii_scrub_stats(sf).to_pandas().set_index("pii_type"))
    # local replication of the injected corpus + the scrub
    for name, pat in _PII_PATTERNS:
        rx = re.compile(pat)
        nm = nd = red = 0
        for i in range(n):
            t = "lorem ipsum"
            if i % 7 == 0:
                t += f" contact user{i}@example.com"
            if i % 11 == 0:
                t += f" call 555-{i % 10000:04d}"
            if i % 13 == 0:
                t += f" ref {i % 1000:03d}-{i % 100:02d}-{i % 10000:04d}"
            ms = rx.findall(t)
            nm += len(ms)
            nd += bool(ms)
            red += sum(len(m) for m in ms)
        assert int(got.loc[name, "n_matches"]) == nm
        assert int(got.loc[name, "n_docs"]) == nd
        assert int(got.loc[name, "chars_redacted"]) == red
    # every injected class fired (the corpus is non-degenerate)
    assert (got["n_matches"] > 0).all()


def test_oov_rate_by_lang(ray_session, tmp_path):
    import pandas as pd

    from ocr_ray.pipelines.relational import oov_rate_by_lang

    df = pd.DataFrame({
        "doc_id": range(4),
        "lang": ["en", "en", "de", "de"],
        "text": ["aa aa bb", "aa cc", "aa bb dd", "EE aa"],
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/documents.parquet", index=False)
    # vocab_size=2 -> counts: aa=5 bb=2 cc=1 dd=1 ee=1 -> vocab {aa, bb}
    got = (oov_rate_by_lang(sf, vocab_size=2).to_pandas()
           .set_index("lang"))
    assert int(got.loc["en", "n_tokens"]) == 5    # aa aa bb aa cc
    assert int(got.loc["en", "n_oov"]) == 1       # cc
    assert int(got.loc["en", "oov_bp"]) == 2000
    assert int(got.loc["de", "n_tokens"]) == 5    # aa bb dd ee(lower) aa
    assert int(got.loc["de", "n_oov"]) == 2       # dd, ee
    assert int(got.loc["de", "oov_bp"]) == 4000


def test_ewma_hourly_anomalies(ray_session, tmp_path):
    import pandas as pd

    from ocr_ray.pipelines.windows import ewma_hourly_anomalies

    # hourly counts 8, 8, 8, 100 (spike), 8 — built from per-event rows
    counts = [8, 8, 8, 100, 8]
    ts = []
    for h, n in enumerate(counts):
        ts += [pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h)] * n
    df = pd.DataFrame({"ts": pd.Series(ts).astype("datetime64[us]")})
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    got = (ewma_hourly_anomalies(sf).to_pandas()
           .sort_values("window_start").reset_index(drop=True))
    assert got["n"].tolist() == counts
    # replicate the integer recurrence
    e, ewma, flags = 0, [], []
    for t, n in enumerate(counts):
        if t == 0:
            e, f = n * 1_000_000, 0
        else:
            f = 1 if n * 10_000_000 > e * 15 else 0
            e = (7 * e + n * 1_000_000) // 8
        ewma.append(e)
        flags.append(f)
    assert got["ewma_micro"].tolist() == ewma
    assert got["is_anomaly"].tolist() == flags
    assert flags == [0, 0, 0, 1, 0]  # only the spike flags


def test_unicode_normalize_stats(ray_session, tmp_path):
    import pandas as pd

    from ocr_ray.pipelines.relational import unicode_normalize_stats

    n = 100  # doc_ids 0..99: %17 -> 6 docs, %19 -> 6 docs, doc 0 both
    df = pd.DataFrame({"doc_id": range(n), "text": ["plain ascii"] * n})
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/documents.parquet", index=False)
    got = unicode_normalize_stats(sf).to_pandas().iloc[0]
    assert int(got["n_docs"]) == n
    assert int(got["n_nfc_changed"]) == 6          # 0,17,34,51,68,85
    assert int(got["chars_delta_nfc"]) == 6        # one composition each
    assert int(got["n_zero_width"]) == 12          # 2 per %19 doc
    assert int(got["docs_with_zw"]) == 6           # 0,19,38,57,76,95


def test_global_row_id_stats_partition_invariant(ray_session, tmp_path):
    """The distributed zipWithIndex must assign id == dense 0-based
    rank(doc_id) regardless of file layout or bucket count; the
    sum/min/max checksums pin it exactly."""
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.relational import global_row_id_stats

    rng = np.random.default_rng(7)
    n = 1000
    # non-contiguous, shuffled doc_ids so rank != doc_id
    ids = np.sort(rng.choice(50_000, size=n, replace=False))
    langs = np.array(["en", "de", "fr"])[ids % 3]
    df = pd.DataFrame({"doc_id": ids, "lang": langs})
    perm = rng.permutation(n)

    def expected():
        rank = pd.Series(np.arange(n, dtype=np.int64), index=ids)
        g = pd.DataFrame({"lang": langs, "gid": np.arange(n)})
        return (g.groupby("lang")["gid"]
                 .agg(["count", "sum", "min", "max"]).sort_index())

    exp = expected()
    results = []
    for layout, nb in ((1, 64), (7, 64), (7, 5)):
        sf = str(tmp_path / f"l{layout}_b{nb}")
        import os
        os.makedirs(f"{sf}/documents.parquet")
        shuffled = df.iloc[perm].reset_index(drop=True)
        for i, part in enumerate(np.array_split(shuffled, layout)):
            part.to_parquet(f"{sf}/documents.parquet/part_{i}.parquet",
                            index=False)
        got = (global_row_id_stats(sf, n_buckets=nb).to_pandas()
               .set_index("lang").sort_index())
        results.append(got)
    for got in results:
        assert list(got["n_docs"]) == list(exp["count"])
        assert list(got["sum_global_id"]) == list(exp["sum"])
        assert list(got["min_global_id"]) == list(exp["min"])
        assert list(got["max_global_id"]) == list(exp["max"])


def test_table_profile(ray_session, tmp_path):
    """Profiler must count nulls, EXACT distincts, canonical min/max and
    string lengths correctly on a hand-checkable events table."""
    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.relational import table_profile

    n = 200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
              + pd.to_timedelta(np.arange(n) % 48, unit="h"),
        "user_id": (np.arange(n, dtype=np.int64) % 7) * 3,
        "event_type": np.array(["click", "view"])[np.arange(n) % 2],
        "value": (np.arange(n) % 25) / 4.0,       # 25 distinct cents values
        "props": [f'{{"k": {i % 10}}}' for i in range(n)],
    })
    sf = str(tmp_path)
    df.to_parquet(f"{sf}/events.parquet", index=False)
    got = table_profile(sf).to_pandas().set_index("col_name")

    assert (got["n_rows"] == n).all()
    assert int(got.loc["event_id", "n_distinct"]) == n
    assert int(got.loc["user_id", "n_distinct"]) == 7
    assert int(got.loc["user_id", "max_int"]) == 18
    assert int(got.loc["value_cents", "n_distinct"]) == 25
    assert int(got.loc["value_cents", "max_int"]) == 600
    assert int(got.loc["ts_us", "n_distinct"]) == 48
    # k in 0..9; k%5==0 (k=0,5) nulled -> 2/10 of rows null, 8 distinct
    assert int(got.loc["k_nullable", "n_null"]) == n // 10 * 2
    assert int(got.loc["k_nullable", "n_distinct"]) == 8
    assert int(got.loc["k_nullable", "min_int"]) == 1
    assert int(got.loc["k_nullable", "max_int"]) == 9
    assert int(got.loc["event_type", "n_distinct"]) == 2
    assert int(got.loc["event_type", "min_int"]) == 4   # "view"
    assert int(got.loc["event_type", "max_int"]) == 5   # "click"
    assert int(got.loc["event_type", "sum_len"]) == 100 * 5 + 100 * 4
    assert (got["n_null"].drop("k_nullable") == 0).all()


def test_decision_stump_train_known_split(ray_session, tmp_path):
    """On a corpus where 'en' docs are exactly the ones with < 8 digits,
    the exhaustive split search must rank the perfect digit stump first
    (threshold bucket 0 => digit count <= 7), identically across file
    layouts."""
    import os

    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.relational import decision_stump_train

    rng = np.random.default_rng(11)
    n = 600
    is_en = np.arange(n) % 3 != 0
    texts = [("word " * int(rng.integers(5, 40))
              + ("7" * (3 if en else 20)))
             for en, _ in zip(is_en, range(n))]
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": np.where(is_en, "en", "zh"),
    })

    results = []
    for layout in (1, 9):
        sf = str(tmp_path / f"l{layout}")
        os.makedirs(f"{sf}/documents.parquet")
        shuffled = df.sample(frac=1.0, random_state=layout)
        for i, part in enumerate(np.array_split(shuffled, layout)):
            part.to_parquet(f"{sf}/documents.parquet/p{i}.parquet",
                            index=False)
        results.append(decision_stump_train(sf).to_pandas())

    a, b = results
    pd.testing.assert_frame_equal(a, b)
    top = a.iloc[0]
    assert (top["feature"], top["threshold"]) == ("digit", 0)
    assert top["n_correct"] == n and top["accuracy_bp"] == 10000
    assert top["n_left"] == int(is_en.sum())


def test_psi_feature_drift_detects_shifted_source(ray_session, tmp_path):
    """A source whose length distribution is shifted far from the pool
    must score a larger psi_e9 than in-distribution sources; all PSI
    values are >= 0 and partition-invariant."""
    import os

    import numpy as np
    import pandas as pd

    from ocr_ray.pipelines.relational import psi_feature_drift

    rng = np.random.default_rng(5)
    n = 900
    src = np.where(np.arange(n) % 10 == 0, "c",
                   np.where(np.arange(n) % 2 == 0, "a", "b"))
    lens = np.where(src == "c",
                    rng.integers(3000, 3900, n),   # shifted slice
                    rng.integers(10, 500, n))      # pooled majority
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x" * int(k) for k in lens],
        "source": src,
    })

    results = []
    for layout in (1, 8):
        sf = str(tmp_path / f"l{layout}")
        os.makedirs(f"{sf}/documents.parquet")
        shuffled = df.sample(frac=1.0, random_state=layout)
        for i, part in enumerate(np.array_split(shuffled, layout)):
            part.to_parquet(f"{sf}/documents.parquet/p{i}.parquet",
                            index=False)
        results.append(psi_feature_drift(sf).to_pandas())

    a, b = results
    pd.testing.assert_frame_equal(a, b)
    assert (a["psi_e9"] >= 0).all()
    chars = a[a["feature"] == "chars"].set_index("source")["psi_e9"]
    assert chars["c"] > 10 * max(chars["a"], chars["b"])


def test_bm25_indexed_equals_full_scan(ray_session, tmp_path):
    """The partition-pruned BM25 path is pinned row-for-row (ids AND
    integer micro-unit scores) to the full-scan scorer, and a query
    whose terms have no postings returns an empty schema-typed result."""
    import ray.data as rd

    from ocr_ray.pipelines.relational import bm25_search
    from ocr_ray.pipelines.textsearch import (bm25_search_indexed,
                                              build_bm25_index)

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "bm25")
    build_bm25_index(
        rd.read_parquet(sf + "/documents.parquet",
                        columns=["doc_id", "text"]), idx)
    got = bm25_search_indexed(idx, "table hash join", k=20).to_pandas()
    want = bm25_search(sf, "table hash join", k=20).to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))

    miss = bm25_search_indexed(idx, "zzzznotaterm", k=5).to_pandas()
    assert len(miss) == 0


def test_score_auc_eval_exact(ray_session, tmp_path):
    """AUC on a hand-computable corpus (ties included) matches the
    sklearn-style rank formula exactly, and is invariant to the file's
    row order (partitioning / batch boundaries)."""
    import os

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import score_auc_eval

    # scores: pos {3, 5, 5}, neg {1, 3, 5, 7}
    # wins: 3>1; 5>1,5>3 (x2) -> 5 ; ties: (3,3), (5,5) x2 -> 3
    # num2 = 2*5 + 3 = 13 ; AUC = 13 / (2*3*4) = 0.5416666...
    scores = [3, 5, 5, 1, 3, 5, 7]
    langs = ["en", "en", "en", "fr", "de", "es", "zh"]
    results = []
    for order in (range(7), (3, 0, 4, 1, 5, 2, 6)):
        d = str(tmp_path / f"sf_{order[0]}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "n_chars": pa.array([scores[i] for i in order], pa.int64()),
            "lang": pa.array([langs[i] for i in order], pa.string()),
        }), os.path.join(d, "documents.parquet"), row_group_size=2)
        results.append(score_auc_eval(d, n_buckets=4).to_pandas())
    a, b = results
    pd.testing.assert_frame_equal(a, b)
    assert a.iloc[0].tolist() == [3, 4, 13, 541666667]


def test_ndcg_eval_perfect_ranking(ray_session, tmp_path):
    """When every document is identical, any ranking is ideal: DCG ==
    IDCG and ndcg_e9 == 1e9 exactly — also exercises the corpus-smaller-
    than-k path (5 docs, k=10)."""
    import os

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import ndcg_eval

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(["table hash join plan"] * 5, pa.string()),
    }), os.path.join(d, "documents.parquet"), row_group_size=2)
    out = ndcg_eval(d).to_pandas()
    assert out["dcg_e9"].iloc[0] == out["idcg_e9"].iloc[0] > 0
    assert out["ndcg_e9"].iloc[0] == 1_000_000_000


def test_crawl_schedule_plan_matches_pandas_reference(ray_session):
    """The salted grouped prefix-scan reproduces row_number() OVER
    (PARTITION BY host ORDER BY ts, url) exactly on the Zipf-skewed
    frontier (host-00 ~50% of rows), including the duplicate-ts rows."""
    import pyarrow.dataset as pads

    import __ray_entry__ as e

    got = (e._q_crawl_schedule_plan("/root/testdata/sf0.001")
           .to_pandas().sort_values("host").reset_index(drop=True))

    at = pads.dataset(e._zipf_pages_dir("/root/testdata/sf0.001")).to_table(
        columns=["url", "warc_ts"])
    t = pd.DataFrame({"url": at["url"].to_pandas(),
                      "ts_us": at["warc_ts"].cast(pa.int64()).to_pandas()})
    t["host"] = t["url"].str.extract(r"^[a-z]+://([^.]+)\.")
    t = t.sort_values(["host", "ts_us", "url"], kind="mergesort")
    t["wave"] = t.groupby("host").cumcount()
    t["chk"] = t["wave"] * (t["ts_us"] % 1000003)
    want = (t.groupby("host", as_index=False)
            .agg(n_pages=("wave", "size"), last_wave=("wave", "max"),
                 wave_ts_checksum=("chk", "sum"))
            .astype({"n_pages": "int64", "last_wave": "int64",
                     "wave_ts_checksum": "int64"})
            .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # the skew is real: the hot host owns ~half the corpus
    assert want["n_pages"].max() > 0.4 * want["n_pages"].sum()


def test_source_vocab_jaccard_exact(ray_session, tmp_path):
    """Hand-computable vocab sets, including a zero-overlap pair and
    batch-boundary invariance (row_group_size=1 forces per-doc blocks)."""
    import os

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import source_vocab_jaccard

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "b", "c"], pa.string()),
        "text": pa.array(["x y z", "y q", "y z w", "pp qq"], pa.string()),
    }), os.path.join(d, "documents.parquet"), row_group_size=1)
    out = (source_vocab_jaccard(d).to_pandas()
           .set_index(["src_a", "src_b"]))
    # a={x,y,z,q} b={y,z,w} c={pp,qq}
    ab = out.loc[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (4, 3, 2)
    assert ab["jaccard_e9"] == 400_000_000        # 2/5
    ac = out.loc[("a", "c")]
    assert ac["n_common"] == 0 and ac["jaccard_e9"] == 0


def test_mi_term_selection_properties(ray_session, tmp_path):
    """A perfectly class-separating term maxes MI; a term present in
    every document carries zero information; batch boundaries don't
    change anything (row_group_size=1)."""
    import os

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import mi_term_selection

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "text": pa.array(["aa common", "aa common", "bb common",
                          "bb common"], pa.string()),
        "lang": pa.array(["en", "en", "fr", "de"], pa.string()),
    }), os.path.join(d, "documents.parquet"), row_group_size=1)
    out = mi_term_selection(d, k=10).to_pandas().set_index("term")
    # aa <-> en perfectly: MI = ln 2 (two cells of 0.5·ln2, each
    # e9-rounded before the sum: 2 × 346573590)
    assert out.loc["aa", "mi_e9"] == 693147180
    assert out.loc["bb", "mi_e9"] == 693147180
    assert out.loc["common", "mi_e9"] == 0
    assert (out.loc["aa", ["n11", "n10"]].tolist() == [2, 0]
            and out.loc["bb", ["n11", "n10"]].tolist() == [0, 2])


def test_kwic_and_calibration(ray_session, tmp_path):
    """KWIC takes the FIRST occurrence and clamps the window at both
    edges; calibration bins are pure-integer and account every row."""
    import os

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import calibration_bins, kwic_snippets

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["vector at start only",
                          "a b c d vector e f g h vector",
                          "no match here"], pa.string()),
        "n_chars": pa.array([10, 250, 600], pa.int64()),
        "lang": pa.array(["en", "fr", "en"], pa.string()),
    }), os.path.join(d, "documents.parquet"))

    kw = kwic_snippets(d).to_pandas().set_index("doc_id")
    assert len(kw) == 2
    assert kw.loc[0, "pos"] == 0
    assert kw.loc[0, "snippet"] == "vector at start only"
    assert kw.loc[1, "pos"] == 4      # first occurrence, not the second
    assert kw.loc[1, "snippet"] == "b c d vector e f g"

    cb = calibration_bins(d).to_pandas().set_index("bin")
    assert int(cb["n"].sum()) == 3
    assert cb.loc[0, "sum_p_e9"] == 10 * 2_000_000
    assert cb.loc[9, "n_pos"] == 1 and cb.loc[9, "frac_pos_e9"] == 10**9
    assert cb.loc[5, "frac_pos_e9"] == 0


def test_update_bm25_index_equals_full_build(ray_session, tmp_path):
    """Append-only BM25 ingestion scores bit-identically to a full
    rebuild over the merged corpus (idf/avgdl from summed stats
    segments), and ingestion only ADDS files."""
    import glob
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from ocr_ray.pipelines.textsearch import (bm25_search_indexed,
                                              build_bm25_index,
                                              update_bm25_index)

    src = "/root/testdata/sf0.001/documents.parquet"
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    base = rd.read_parquet(src, columns=["doc_id", "text"],
                           filter=(pads.field("doc_id") < pads.scalar(256)))
    build_bm25_index(base, inc)
    pre_files = set(glob.glob(os.path.join(inc, "postings", "bucket=*",
                                           "*.parquet")))
    new = rd.read_parquet(src, columns=["doc_id", "text"],
                          filter=(pads.field("doc_id") >= pads.scalar(256)))
    update_bm25_index(inc, new)
    assert pre_files <= set(glob.glob(
        os.path.join(inc, "postings", "bucket=*", "*.parquet")))
    assert len(glob.glob(os.path.join(inc, "stats", "*.parquet"))) == 2

    build_bm25_index(rd.read_parquet(src, columns=["doc_id", "text"]), full)
    got = bm25_search_indexed(inc, "table hash join", k=20).to_pandas()
    want = bm25_search_indexed(full, "table hash join", k=20).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_prf_expanded_search_changes_ranking(ray_session):
    """PRF is deterministic across runs and the expanded query actually
    retrieves with more terms (scores differ from the base BM25 run
    unless expansion was empty)."""
    from ocr_ray.pipelines.relational import bm25_search, prf_expanded_search

    sf = "/root/testdata/sf0.001"
    a = prf_expanded_search(sf).to_pandas()
    b = prf_expanded_search(sf).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    base = bm25_search(sf, "table hash join", k=10).to_pandas()
    assert len(a) == 10
    assert not a["score_e6"].equals(base["score_e6"])


def test_simhash_hamming_histogram_consistent_with_near_dup(ray_session):
    """Pairs at hamming <= 3 in the histogram must equal the number of
    verified edges the near-dup op builds its components from (same
    candidate topology, same caps), and identical docs land at 0."""
    import ray.data as rd

    from ocr_ray.pipelines.dedup import simhash_hamming_histogram

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    h = simhash_hamming_histogram(ds).to_pandas()
    assert (h["hamming"] >= 0).all() and (h["hamming"] <= 64).all()
    assert h["n_pairs"].sum() > 0
    # duplicate texts exist in the corpus (doc_id % 23 dup rows in the
    # pages corpus come from identical underlying docs only at the page
    # layer; here assert determinism instead)
    h2 = simhash_hamming_histogram(ds).to_pandas()
    pd.testing.assert_frame_equal(
        h.sort_values("hamming").reset_index(drop=True),
        h2.sort_values("hamming").reset_index(drop=True))


def test_fd_audit_majority_and_ties(ray_session, tmp_path):
    """A held FD reports zero violations; ties pick the lexicographically
    smaller rhs; violation count is rows minus majority."""
    import os

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import fd_audit

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "source": pa.array(["s1"] * 3 + ["s2"] * 4 + ["s3"] * 2),
        "lang": pa.array(["en", "en", "en",          # held FD
                          "en", "en", "fr", "de",    # majority en
                          "fr", "en"]),              # tie -> en
    }), os.path.join(d, "documents.parquet"), row_group_size=2)
    out = fd_audit(d).to_pandas().set_index("lhs")
    assert out.loc["s1"].tolist() == [3, 1, "en", 3, 0]
    assert out.loc["s2"].tolist() == [4, 3, "en", 2, 2]
    assert out.loc["s3"].tolist() == [2, 2, "en", 1, 1]


def test_dual_engine_bleu_invariants(ray_session):
    """Corpus BLEU of strip-vs-DOM: every non-pdf page participates, the
    DOM reference's tokens are (near-)contained in the strip candidate
    (clipped unigram matches ~= ref_tokens), precision columns are the
    exact floor-bp of the integer sums, and boilerplate (nav / footer /
    linkfarm) keeps candidate precision well below 100%."""
    import __ray_entry__ as e

    got = (e.queries()["dual_engine_bleu"]("/root/testdata/sf0.001")
           .to_pandas().sort_values("lang").reset_index(drop=True))
    # 522 page rows - 53 pdf rows (doc_id%10 plus the %230 duplicates)
    assert got["n_docs"].sum() == 469
    assert (got["match_1"] <= got["cand_tokens"]).all()
    assert (got["match_1"] <= got["ref_tokens"]).all()
    assert (got["match_2"] <= got["cand_bigrams"]).all()
    # DOM text is assembled from the same visible content tagstrip keeps
    assert (got["match_1"] * 100 >= got["ref_tokens"] * 95).all()
    # boilerplate dilutes the candidate: precision sits in the mid band
    assert (got["p1_bp"] > 4000).all() and (got["p1_bp"] < 9000).all()
    assert (got["p1_bp"] == got["match_1"] * 10000 // got["cand_tokens"]).all()
    assert (got["p2_bp"] == got["match_2"] * 10000 // got["cand_bigrams"]).all()


def test_dup_ngram_coverage_exact_and_partition_invariant(ray_session):
    """Hand-computed duplicate-shingle coverage: doc 0 and doc 1 share
    their full 4-shingle set (exact dup), doc 2 overlaps them on 2 of its
    4 shingles, doc 3 is unique, doc 4 is a short (<3 words) whole-text
    gram unique to itself — and the result is invariant to input
    partitioning."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_ray.pipelines.dedup import dup_ngram_coverage

    common = "alpha beta gamma delta epsilon zeta"      # 4 shingles
    partial = "alpha beta gamma delta nine ten"         # shares 2 of 4
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([common, common, partial,
                          "one two three four five six", "hi there"],
                         pa.string()),
        "lang": pa.array(["en", "en", "en", "en", "fr"], pa.string()),
    })
    want = {
        # lang: (n_docs, n_docs_dup, shingles, dup_shingles)
        "en": (4, 3, 16, 10),   # docs 0,1 all-4 dup; doc 2 has 2 dup
        "fr": (1, 0, 1, 0),
    }
    for parts in (1, 5):
        out = (dup_ngram_coverage(rd.from_arrow(t).repartition(parts))
               .to_pandas().set_index("lang").sort_index())
        for lang, (nd, ndd, sh, du) in want.items():
            row = out.loc[lang]
            assert (row["n_docs"], row["n_docs_dup"],
                    row["shingles"], row["dup_shingles"]) == (nd, ndd, sh, du)
            assert row["coverage_bp"] == du * 10000 // sh
            assert row["docs_dup_bp"] == ndd * 10000 // nd


def test_late_event_stats_matches_reference_scan(ray_session, tmp_path):
    """Watermark late-data accounting equals a plain single-process replay
    (arrival = ts + md5 jitter, running-max watermark minus lateness), and
    is invariant to the range-partition width."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.windows import late_event_stats

    rng = np.random.RandomState(7)
    n = 500
    ts_us = (1_700_000_000_000_000
             + np.sort(rng.randint(0, 30 * 86400, n)) * 1_000_000)
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, n)]
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(np.zeros(n), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), tmp_path / "events.parquet")

    # independent replay
    delay = np.array([int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[8:16], "little") % 7200
        for i in range(n)], dtype=np.int64) * 1_000_000
    arr = ts_us + delay
    order = np.lexsort((np.arange(n), arr))
    v = ts_us[order]
    prev = np.empty(n, dtype=np.int64)
    prev[0] = -(1 << 62)
    if n > 1:
        prev[1:] = np.maximum.accumulate(v)[:-1]
    late = prev - 600_000_000 > v
    exp = (pd.DataFrame({"event_type": types[order],
                         "late": late.astype(np.int64),
                         "lag": np.where(late, prev - v, 0)})
           .groupby("event_type")
           .agg(n_events=("late", "size"), n_late=("late", "sum"),
                max_lag_us=("lag", "max")))
    assert exp["n_late"].sum() > 0  # the jitter model must produce lates

    for parts in (5, 64):
        got = (late_event_stats(str(tmp_path), n_parts=parts)
               .to_pandas().set_index("event_type").sort_index())
        assert got[["n_events", "n_late", "max_lag_us"]].equals(
            exp[["n_events", "n_late", "max_lag_us"]].sort_index())


def test_weighted_sample_topk_matches_replay_and_weights(ray_session, tmp_path):
    """A-ES weighted sample equals a single-process brute-force replay of
    the md5-uniform priority keys; zero-weight docs never appear; heavier
    docs are over-represented vs a uniform md5 sample on the same ids."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import weighted_sample_topk

    n = 2000
    rng = np.random.RandomState(3)
    # bimodal weights: 100 heavy docs (10000 chars) among 1-char docs
    w = np.ones(n, dtype=np.int64)
    heavy = rng.choice(n, 100, replace=False)
    w[heavy] = 10000
    w[rng.choice(np.setdiff1d(np.arange(n), heavy), 50, replace=False)] = 0
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array(w, pa.int64()),
    }), tmp_path / "documents.parquet")

    h = np.array([int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[8:16], "little")
        for i in range(n)], dtype=np.uint64)
    u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
    mag = np.trunc(-np.log(u) * 1e6 + 0.5).astype(np.int64)
    ok = w >= 1
    key = np.where(ok, mag * 1_000_000 // np.maximum(w, 1), np.int64(2**62))
    order = np.lexsort((np.arange(n), key))
    expect = [i for i in order if ok[i]][:25]

    got = weighted_sample_topk(str(tmp_path), k=25).to_pandas()
    assert got["doc_id"].tolist() == expect
    assert (got["n_chars"] >= 1).all()
    # weight-proportionality: heavy docs are 5% of the corpus but should
    # dominate the sample (each is 10000x likelier than a 1-char doc)
    assert (got["n_chars"] == 10000).sum() >= 20


def test_rake_keyphrases_hand_example(ray_session, tmp_path):
    """Textbook RAKE on two docs: word score = degree/freq over all
    candidate occurrences, phrase score = sum of member-word scores —
    hand-computed, and invariant to input file layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import rake_keyphrases

    docs = ["deep learning of deep systems",
            "deep learning and the systems"]
    for i, rows_per_file in enumerate((2, 1)):
        d = tmp_path / f"v{i}"
        part_dir = d / "documents.parquet"
        part_dir.mkdir(parents=True)
        for j in range(0, len(docs), rows_per_file):
            chunk = docs[j:j + rows_per_file]
            pq.write_table(pa.table({
                "doc_id": pa.array(range(j, j + len(chunk)), pa.int64()),
                "text": pa.array(chunk, pa.string()),
                "lang": pa.array(["en"] * len(chunk), pa.string()),
                "source": pa.array(["s"] * len(chunk), pa.string()),
                "n_chars": pa.array([len(c) for c in chunk], pa.int64()),
            }), part_dir / f"part{j}.parquet")
        # islands: "deep learning" x2, "deep systems", "systems"
        # deep: freq 3 degree 6 -> 2000; learning: 2/4 -> 2000;
        # systems: 2/3 -> 1500
        got = rake_keyphrases(str(d)).to_pandas()
        assert got["phrase"].tolist() == [
            "deep learning", "deep systems", "systems"]
        assert got["score_milli"].tolist() == [4000, 3500, 1500]
        assert got["n_occurrences"].tolist() == [2, 1, 1]


def test_pq_adc_search_refine_and_recall(ray_session):
    """PQ-ADC with exact re-rank: result is exact-distance ordered, the
    exact_d column matches an independent integer-L2 computation, the
    in_exact flags match the true exact top-10, and the shortlist-100
    refine recovers most of the exact neighbours."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import pq_adc_search

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    iv = np.copysign(np.floor(np.abs(mat * 1e6) + 0.5), mat).astype(np.int64)
    q = iv[int(np.where(vids == 0)[0][0])]
    d = ((iv - q[None, :]) ** 2).sum(1)
    exact10 = set(vids[np.lexsort((vids, d))[:10]])

    got = pq_adc_search(
        rd.read_parquet(sf + "/embeddings.parquet",
                        columns=["vec_id", "embedding"]),
        mat[int(np.where(vids == 0)[0][0])].tolist(), k=10).to_pandas()
    assert got["exact_d"].is_monotonic_increasing
    lookup = dict(zip(vids.tolist(), d.tolist()))
    assert got["exact_d"].tolist() == [lookup[v] for v in got["vec_id"]]
    assert got["in_exact"].tolist() == [
        1 if v in exact10 else 0 for v in got["vec_id"]]
    assert got["in_exact"].sum() >= 8  # shortlist-100 refine recall floor


def test_ols_price_model_exact_fit_and_lstsq_agreement(ray_session, tmp_path):
    """Normal-equations OLS: on an exactly-linear synthetic corpus the
    integer Cramer solve recovers the generating coefficients to the
    milli-unit; on noisy data it agrees with numpy lstsq."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import ols_price_model

    rng = np.random.RandomState(11)
    n = 4000
    qty = rng.randint(1, 51, n).astype(np.float64)
    disc = rng.randint(0, 11, n) / 100.0
    # exact linear: y_cents = 1250 + 300*qty + 7*disc_bp  (ints)
    y_cents = 1250 + 300 * qty + 7 * np.round(disc * 10000)
    for label, yc in (("exact", y_cents),
                      ("noisy", y_cents + rng.randint(-500, 501, n))):
        d = tmp_path / label
        d.mkdir()
        pq.write_table(pa.table({
            "l_quantity": pa.array(qty, pa.float64()),
            "l_discount": pa.array(disc, pa.float64()),
            "l_extendedprice": pa.array(yc / 100.0, pa.float64()),
        }), d / "lineitem.parquet")
        got = ols_price_model(str(d)).to_pandas().iloc[0]
        X = np.column_stack([np.ones(n), qty, np.round(disc * 10000)])
        beta = np.linalg.lstsq(X, yc, rcond=None)[0]
        assert got["n"] == n
        if label == "exact":
            assert got["intercept_milli"] == 1250_000
            assert got["qty_coef_milli"] == 300_000
            assert got["disc_coef_milli"] == 7_000
        else:
            assert abs(got["intercept_milli"] - beta[0] * 1000) <= 1
            assert abs(got["qty_coef_milli"] - beta[1] * 1000) <= 1
            assert abs(got["disc_coef_milli"] - beta[2] * 1000) <= 1


def test_rendezvous_shard_plan_minimal_disruption(ray_session):
    """HRW assignment matches an independent argmax replay per host, and
    the ring-growth movers are exactly the hosts whose 17-shard argmax is
    the NEW shard (consistent hashing's minimal-disruption property)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    got = (e._q_rendezvous_shard_plan("/root/testdata/sf0.001")
           .to_pandas().set_index("shard").sort_index())

    import glob
    import re
    files = glob.glob(e._pages_dir("/root/testdata/sf0.001") + "/*.parquet") \
        or [e._pages_dir("/root/testdata/sf0.001")]
    urls = []
    for f in files:
        urls.extend(pq.read_table(f, columns=["url"])["url"].to_pylist())
    hosts = sorted({(re.match(r"^[a-z]+://([^.]+)\.", u) or [None, ""])[1]
                    for u in urls})

    def md5u(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")

    n_hosts = np.zeros(16, dtype=np.int64)
    n_moved = np.zeros(16, dtype=np.int64)
    for h in hosts:
        w = [md5u(f"{h}|{s}") for s in range(17)]
        old = int(np.argmax(w[:16]))
        new = int(np.argmax(w))
        n_hosts[old] += 1
        if new != old:
            assert new == 16  # movers ONLY go to the added shard
            n_moved[old] += 1
    present = np.nonzero(n_hosts)[0]
    assert got.index.tolist() == present.tolist()
    assert got["n_hosts"].tolist() == n_hosts[present].tolist()
    assert got["n_moved"].tolist() == n_moved[present].tolist()


def test_cdc_chunk_stats_resync_and_replay(ray_session, tmp_path):
    """Content-defined chunking: an exact duplicate dedupes fully, a
    PREFIX-shifted copy still shares almost all chunks (boundary resync —
    the property fixed-size blocks lack), and the per-lang sums equal an
    independent single-process replay."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_ray.functions.textstats import rolling_hashes
    from ocr_ray.pipelines.dedup import cdc_chunk_stats

    rng = np.random.RandomState(5)
    base = "".join(chr(97 + c) + (" " if c % 7 == 0 else "")
                   for c in rng.randint(0, 26, 3000))
    docs = [("en", base), ("en", base), ("en", "INSERTED PREFIX " + base),
            ("fr", "tiny")]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[0] for d in docs], pa.string()),
    }), tmp_path / "documents.parquet")

    def replay(txt):
        h = rolling_hashes(txt, 16)
        cuts = ((np.nonzero(h % np.uint64(64) == 0)[0] + 16).tolist()
                if h.size else [])
        prev, segs = 0, []
        for c in cuts + [len(txt)]:
            if c <= prev:
                continue
            segs.append(txt[prev:c])
            prev = c
        return segs

    exp = {}
    for lang, txt in docs:
        for seg in replay(txt):
            key = (lang, hashlib.md5(seg.encode()).digest()[8:16])
            n, tot, uniq_len = exp.get(lang, (0, 0, {}))
            uniq_len[key] = len(seg)
            exp[lang] = (n + 1, tot + len(seg), uniq_len)

    got = (cdc_chunk_stats(
        rd.read_parquet(str(tmp_path / "documents.parquet")).repartition(3))
        .to_pandas().set_index("lang").sort_index())
    for lang, (n, tot, uniq_len) in exp.items():
        row = got.loc[lang]
        assert row["n_chunks"] == n
        assert row["total_chars"] == tot
        assert row["n_unique_chunks"] == len(uniq_len)
        assert row["unique_chars"] == sum(uniq_len.values())
    # three ~3000-char en docs, two identical + one prefix-shifted:
    # resync keeps unique_chars barely above one copy's length
    en = got.loc["en"]
    assert en["unique_chars"] < len(base) + 200
    assert en["savings_bp"] > 6000


def test_zipf_slope_fit_recovers_power_law(ray_session, tmp_path):
    """On a corpus whose token frequencies follow freq = C / rank
    exactly, the integer log-log fit recovers slope -1 (milli-units) and
    intercept ln(C) (micro-nats) to rounding."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import zipf_slope_fit

    n_terms, c = 100, 2000
    words = []
    for r in range(1, n_terms + 1):
        words.extend([f"w{r:04d}"] * (c // r))
    rng = np.random.RandomState(1)
    rng.shuffle(words)
    docs = [" ".join(words[i:i + 200]) for i in range(0, len(words), 200)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
    }), tmp_path / "documents.parquet")

    got = zipf_slope_fit(str(tmp_path), k=n_terms).to_pandas().iloc[0]
    assert got["n_terms"] == n_terms
    # freq = floor(2000/r): slope ~ -1000 milli, intercept ~ ln(2000)
    assert -1050 <= got["slope_milli"] <= -950
    assert abs(got["intercept_unats"] - 1e6 * np.log(c)) < 3e4


def test_span_corruption_plan_replay_and_ratio(ray_session, tmp_path):
    """T5 span-corruption plan equals an independent single-doc replay
    (union of clamped md5-driven spans, sentinel = maximal run), the
    mask ratio sits near the 15% * mean-len-3 expectation, and sentinels
    never exceed masked tokens."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import span_corruption_plan

    rng = np.random.RandomState(9)
    docs = [" ".join(f"t{j}" for j in range(rng.randint(50, 300)))
            for _ in range(40)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
    }), tmp_path / "documents.parquet")

    def md5u(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                              "little")

    tot = mask = sent = 0
    for did, txt in enumerate(docs):
        n = len(txt.split())
        m = np.zeros(n, dtype=bool)
        for i in range(n):
            if md5u(f"{did}:{i}") % 100 < 15:
                ln = 2 + md5u(f"{did}:{i}:L") % 3
                m[i:i + ln] = True
        tot += n
        mask += int(m.sum())
        sent += int(m[0]) + int((m[1:] & ~m[:-1]).sum())

    got = span_corruption_plan(str(tmp_path)).to_pandas().iloc[0]
    assert (got["n_docs"], got["total_tokens"], got["masked_tokens"],
            got["n_sentinels"]) == (len(docs), tot, mask, sent)
    assert got["mask_ratio_bp"] == mask * 10000 // tot
    assert 2500 < got["mask_ratio_bp"] < 5000  # ~15% starts x mean len 3
    assert got["n_sentinels"] <= got["masked_tokens"]


def test_langid_rank_profile_separable_corpus(ray_session, tmp_path):
    """Cavnar-Trenkle rank profiles: on a corpus with disjoint per-lang
    character inventories the classifier is perfect; self-training on
    the labels never invents a lang absent from the corpus."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import langid_rank_profile

    rng = np.random.RandomState(2)
    pools = {"aa": "abcdefg", "bb": "hijklmn", "cc": "opqrstu"}
    rows = []
    for lang, pool in pools.items():
        for _ in range(30):
            words = ["".join(rng.choice(list(pool), rng.randint(3, 8)))
                     for _ in range(rng.randint(20, 60))]
            rows.append((lang, " ".join(words)))
    rng.shuffle(rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[0] for r in rows], pa.string()),
    }), tmp_path / "documents.parquet")

    got = langid_rank_profile(str(tmp_path)).to_pandas()
    assert set(got["predicted"]) <= set(pools)
    assert (got["lang"] == got["predicted"]).all()   # fully separable
    assert got["n_docs"].sum() == len(rows)


def test_bloom_fpp_audit_replay(ray_session, tmp_path):
    """Bloom FP audit equals a single-process replay of the md5-family
    filter (members' bits, probe hits), members themselves never miss
    (no false negatives), and the observed FP count is within the
    occupancy-estimate ballpark."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import bloom_fpp_audit

    rng = np.random.RandomState(4)
    n_orders, n_cust = 3000, 800
    cust = np.arange(n_cust, dtype=np.int64)
    ok = np.array(["1-URGENT", "2-HIGH"])[rng.randint(0, 2, n_orders)]
    okeys = rng.randint(0, n_cust, n_orders).astype(np.int64)
    pq.write_table(pa.table({"o_custkey": pa.array(okeys),
                             "o_orderpriority": pa.array(ok)}),
                   tmp_path / "orders.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array(cust)}),
                   tmp_path / "customer.parquet")

    def md5u(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                              "little")

    members = sorted({int(k) for k, p in zip(okeys, ok) if p == "1-URGENT"})
    bits = np.zeros(16384, dtype=bool)
    for k in members:
        for j in range(4):
            bits[md5u(f"{k}:{j}") % 16384] = True
    for k in members:  # no false negatives by construction
        assert all(bits[md5u(f"{k}:{j}") % 16384] for j in range(4))
    fp = sum(1 for k in cust
             if all(bits[md5u(f"{int(k) + 1_000_000_000}:{j}") % 16384]
                    for j in range(4)))

    got = bloom_fpp_audit(str(tmp_path)).to_pandas().iloc[0]
    assert (got["n_members"], got["n_bits_set"],
            got["n_probes"], got["n_false_pos"]) == (
        len(members), int(bits.sum()), n_cust, fp)
    assert got["expected_fp_bp"] == (
        int(bits.sum()) ** 4 * 10000 // 16384 ** 4)


def test_lang_unigram_kl_properties(ray_session, tmp_path):
    """Smoothed unigram KL: non-negative everywhere, zero between langs
    with identical token distributions, large and asymmetric between
    disjoint-vocabulary langs, and partition-invariant."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import lang_unigram_kl

    same = "alpha beta gamma delta " * 20
    rows = [("a1", same), ("a2", same),
            ("zz", "omega psi chi phi " * 30)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[0] for r in rows], pa.string()),
    }), tmp_path / "documents.parquet")

    got = (lang_unigram_kl(str(tmp_path)).to_pandas()
           .set_index(["lang_a", "lang_b"]).sort_index())
    assert (got["kl_pico"] >= 0).all()
    assert got.loc[("a1", "a2"), "kl_pico"] == 0  # identical dists
    assert got.loc[("a2", "a1"), "kl_pico"] == 0
    assert got.loc[("a1", "zz"), "kl_pico"] > 10**11  # disjoint vocab
    assert got.loc[("zz", "a1"), "kl_pico"] > 10**11
    # asymmetry: zz has more tokens over fewer types than a1
    assert (got.loc[("a1", "zz"), "kl_pico"]
            != got.loc[("zz", "a1"), "kl_pico"])


def test_postings_varint_size_leb128_replay(ray_session, tmp_path):
    """The per-class varint accounting equals a pure-Python LEB128
    replay (sorted distinct doc_ids per term, gaps = first+1 then
    diffs), df classes are exact powers of two, and the result is
    invariant to input file partitioning."""
    import collections

    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import postings_varint_size

    rng = np.random.RandomState(7)
    vocab = [f"t{i:03d}" for i in range(40)]
    docs = []
    for d in range(300):
        # zipf-ish doc membership: term i appears in ~300/(i+1) docs
        words = [w for i, w in enumerate(vocab)
                 if rng.randint(0, i + 1) == 0]
        docs.append(" ".join(words * (1 + d % 3)))  # repeats: df dedup
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    def leb128_bytes(v: int) -> int:
        n = 1
        while v >= 128:
            v >>= 7
            n += 1
        return n

    postings: dict[str, list[int]] = collections.defaultdict(list)
    for did, txt in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        for tk in sorted(set(txt.split())):
            postings[tk].append(did)
    expect: dict[int, list[int]] = {}
    for tk, plist in postings.items():
        plist = sorted(set(plist))
        gaps = [plist[0] + 1] + [b - a for a, b in zip(plist, plist[1:])]
        vb = sum(leb128_bytes(g) for g in gaps)
        cls = len(plist).bit_length() - 1
        e = expect.setdefault(cls, [0, 0, 0])
        e[0] += 1
        e[1] += len(plist)
        e[2] += vb
    got = postings_varint_size(str(tmp_path)).to_pandas()
    assert sorted(got["df_log2"]) == sorted(expect)
    for _, row in got.iterrows():
        e = expect[row["df_log2"]]
        assert (row["n_terms"], row["n_postings"], row["varint_bytes"]) \
            == tuple(e)
        assert row["fixed_bytes"] == e[1] * 4
        assert row["compressed_bp"] == e[2] * 10000 // (e[1] * 4)

    # partition invariance: same rows from a 7-file directory layout
    ddir = tmp_path / "alt" / "documents.parquet"
    ddir.mkdir(parents=True)
    for i in range(7):
        pq.write_table(tbl.slice(i * 43, 43), ddir / f"part-{i}.parquet")
    got2 = postings_varint_size(str(tmp_path / "alt")).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("df_log2").reset_index(drop=True),
        got2.sort_values("df_log2").reset_index(drop=True))


def test_wand_maxscore_stats_hand_corpus(ray_session, tmp_path):
    """On a corpus with 15 low-weight-only docs and 12 high-weight
    docs, MaxScore marks exactly the rare heavy term essential and the
    15 light docs skippable; a brute-force replay agrees row for row."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import wand_maxscore_stats

    texts = (["table"] * 15) + (["dup dup"] * 12) + ["noise only"] * 5
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), tmp_path / "documents.parquet")

    got = wand_maxscore_stats(str(tmp_path)).to_pandas() \
        .set_index("term")
    # θ = 10th best score = 18 (twelve dup-docs at 2*9)
    assert (got["theta"] == 18).all()
    assert (got["n_matching"] == 27).all()
    # only 'dup' is essential; the 15 table-only docs are skippable
    assert got.loc["dup", "is_essential"] == 1
    assert got.loc["table", "is_essential"] == 0
    assert got.loc["hash", "is_essential"] == 0
    assert got.loc["join", "is_essential"] == 0
    assert (got["n_skippable"] == 15).all()
    assert got.loc["dup", "ub"] == 18
    assert got.loc["table", "ub"] == 1

    # brute-force replay: no skippable doc can reach θ
    terms = {"table": 1, "hash": 2, "join": 5, "dup": 9}
    ess = set(got.index[got["is_essential"] == 1])
    for txt in texts:
        toks = txt.split()
        score = sum(w * toks.count(t) for t, w in terms.items())
        if score > 0 and not any(t in ess for t in toks if t in terms):
            assert score < 18


def test_mmr_diverse_rerank_diversifies_and_replays(ray_session):
    """Two tight clusters: plain top-k would fill with the
    higher-relevance cluster; MMR must pull in the other cluster by
    rank 2. A pure-Python greedy replay over the same integer sim
    matrix reproduces the distributed result exactly."""
    import ray.data as rd

    from ocr_ray.pipelines.simsearch import mmr_diverse_rerank

    rng = np.random.RandomState(3)
    q = np.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
    rows = []
    # two tight clusters flanking the query symmetrically: both have
    # rel ~ .993 to q, intra-cluster sim ~ 1, cross-cluster sim ~ .976
    # — so after one pick from a cluster, MMR (7·rel − 3·maxsim) must
    # jump to the other cluster.
    a = np.array([1.0, 0.8, 0.0, 0.0])
    b = np.array([0.8, 1.0, 0.0, 0.0])
    for i in range(6):
        v = a + 0.002 * rng.standard_normal(4)
        rows.append((i, v / np.linalg.norm(v)))
    for i in range(6, 12):
        v = b + 0.002 * rng.standard_normal(4)
        rows.append((i, v / np.linalg.norm(v)))
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    got = mmr_diverse_rerank(ds, q.tolist(), k=6, m=12).to_pandas()

    # ranks 1 and 2 must come from DIFFERENT clusters
    assert (got.loc[0, "vec_id"] < 6) != (got.loc[1, "vec_id"] < 6)
    # both clusters represented in the top 6
    sel = set(got["vec_id"])
    assert sel & set(range(6)) and sel & set(range(6, 12))

    # pure-python greedy replay
    def ha(x):
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    mat = np.array([r[1] for r in rows], np.float64)
    mat32 = mat.astype(np.float32).astype(np.float64)
    qn = q / np.linalg.norm(q)
    rel = ha(1e6 * (mat32 @ qn) / np.linalg.norm(mat32, axis=1))
    norms = np.linalg.norm(mat32, axis=1)
    sims = ha(1e6 * (mat32 @ mat32.T) / (norms[:, None] * norms[None, :]))
    ids = np.arange(12)
    avail = np.ones(12, bool)
    maxsim = np.zeros(12, np.int64)
    expect = []
    for rank in range(1, 7):
        score = 7 * rel - 3 * maxsim
        cand = np.nonzero(avail)[0]
        pick = cand[np.lexsort((ids[cand], -score[cand]))[0]]
        expect.append((rank, int(ids[pick]), int(rel[pick]),
                       int(maxsim[pick]), int(score[pick])))
        avail[pick] = False
        maxsim = np.maximum(maxsim, sims[:, pick])
    assert [tuple(r) for r in got.itertuples(index=False)] == expect


def test_columnar_encoding_audit_partition_invariant(ray_session, tmp_path):
    """The exact run count must be invariant to how the contiguous
    doc_id range is split into parquet files/blocks, and must equal a
    pure-pandas replay of the ordered column."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import columnar_encoding_audit

    rng = np.random.RandomState(11)
    n = 311
    lang = np.repeat(
        [["en", "de", "fr"][i % 3] for i in range(40)],
        rng.randint(1, 17, 40))[:n]
    lang = np.concatenate([lang, np.array(["en"] * (n - len(lang)))])
    source = np.array([f"s{i % 7}" for i in np.cumsum(
        rng.randint(0, 2, n))])
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array(lang[:n], pa.string()),
        "source": pa.array(source, pa.string()),
    })

    def replay(col):
        v = tbl[col].to_numpy(zero_copy_only=False)
        runs = 1 + int((v[1:] != v[:-1]).sum())
        d = len(set(v))
        w = max(1, (d - 1).bit_length())
        dict_b = sum(len(s.encode()) for s in set(v))
        plain = sum(len(s.encode()) for s in v)
        return (col, n, d, runs, plain, dict_b, w,
                (n * w + 7) // 8 + dict_b,
                (runs * (w + 32) + 7) // 8 + dict_b)

    expect = [replay("lang"), replay("source")]

    results = []
    for splits in ([n], [100, 211], [37, 91, 60, 123]):
        d = tmp_path / f"sf_{len(splits)}"
        (d / "documents.parquet").mkdir(parents=True)
        off = 0
        for j, sz in enumerate(splits):
            pq.write_table(tbl.slice(off, sz),
                           d / "documents.parquet" / f"f{j:03d}.parquet")
            off += sz
        got = columnar_encoding_audit(str(d)).to_pandas()
        results.append([tuple(r) for r in got.itertuples(index=False)])

    assert results[0] == expect
    assert results[1] == expect
    assert results[2] == expect


def test_front_coding_audit_tie_straddle(ray_session, tmp_path):
    """Repeated sort keys straddling block boundaries must not change
    any front-coding sum — verified against a single-sequence replay."""
    import pyarrow.parquet as pq

    from ocr_ray.pipelines.relational import _leb_len, front_coding_audit

    names = (["alpha"] * 7 + ["alphabet"] * 5 + ["beta"] * 9
             + ["betamax", "gamma", "gamma", "gammaray"] + ["delta"] * 6)
    rng = np.random.RandomState(5)
    shuffled = list(names)
    rng.shuffle(shuffled)
    tbl = pa.table({"p_partkey": pa.array(range(len(shuffled)), pa.int64()),
                    "p_name": pa.array(shuffled, pa.string())})
    d = tmp_path / "sf"
    (d / "part.parquet").mkdir(parents=True)
    off = 0
    for j, sz in enumerate([5, 11, 9, 7]):
        pq.write_table(tbl.slice(off, sz),
                       d / "part.parquet" / f"f{j}.parquet")
        off += sz

    got = front_coding_audit(str(d)).to_pandas().iloc[0]

    srt = sorted(s.encode() for s in names)

    def lcp(a, b):
        i = 0
        while i < min(len(a), len(b)) and a[i] == b[i]:
            i += 1
        return i

    plain = sum(len(b) for b in srt)
    s_lcp = 0
    front = len(srt[0]) + _leb_len(0) + _leb_len(len(srt[0]))
    for i in range(1, len(srt)):
        p = lcp(srt[i - 1], srt[i])
        s_lcp += p
        rest = len(srt[i]) - p
        front += rest + _leb_len(p) + _leb_len(rest)
    assert int(got["n_strings"]) == len(srt)
    assert int(got["plain_bytes"]) == plain
    assert int(got["sum_lcp"]) == s_lcp
    assert int(got["front_coded_bytes"]) == front
