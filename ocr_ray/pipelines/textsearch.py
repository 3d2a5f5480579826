"""Partition-pruned full-text term index — the text sibling of the ANN
layouts (:func:`ocr_ray.pipelines.simsearch.build_lsh_index`).

Postings (token, doc_id, tf) are written hive-partitioned by a token-hash
bucket (``bucket=N/*.parquet``, ``write_parquet(partition_cols)``): the
LAYOUT is the index — no server component, and at corpus scale it lives
directly on object storage.  A term lookup computes the token's bucket
and reads ONLY that partition: bytes-read per query is ~1/n_buckets of
the corpus postings regardless of corpus size.  Raise
``PipelineConfig.term_index_buckets`` at scale so one partition is an
object-store-friendly chunk (the same guidance as ``lsh_index_bits``).
"""

from __future__ import annotations

import collections
import glob
import os
import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ocr_ray.config import DEFAULT_CONFIG


def build_term_index(ds, index_dir: str, text_col: str = "text",
                     key_col: str = "doc_id",
                     n_buckets: int | None = None) -> str:
    """One streaming pass: per-doc token Counters inside map_batches (the
    shuffle-free partial — postings rows, never token instances beyond
    one row per distinct (doc, token)), then the hive-partitioned write.
    Tokenization is lower().split(), the repo-wide convention."""
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets

    def postings(t: pa.Table) -> pa.Table:
        toks, ids, tfs = [], [], []
        for did, txt in zip(t[key_col].to_pylist(), t[text_col].to_pylist()):
            c = collections.Counter((txt or "").lower().split())
            for tok, n in c.items():
                toks.append(tok)
                ids.append(did)
                tfs.append(n)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            key_col: pa.array(ids, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(x.encode()) % n_buckets for x in toks], pa.int32()),
        })

    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"])
    return index_dir


def term_search_indexed(index_dir: str, term: str,
                        n_buckets: int | None = None,
                        key_col: str = "doc_id"):
    """Exact posting lookup over a :func:`build_term_index` layout: read
    ONLY the term's bucket partition (storage-level pruning — the other
    n_buckets - 1 partitions never leave disk), filter to the term
    vectorized.  Returns (key, tf) per matching document.

    Tombstone-aware: keys deleted via :func:`delete_from_term_index`
    are subtracted at query time (sorted-array searchsorted against the
    broadcast tombstone set) — zero cost on layouts with no deletes."""
    import ray

    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets
    t = term.lower()
    b = zlib.crc32(t.encode()) % n_buckets
    # read_parquet accepts ONE directory or a list of FILES — glob the
    # files for the probe dir (a list of directories fails)
    files = sorted(glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
    if not files:
        # the term's bucket has no postings at all (sparse corpus) — an
        # empty result WITH schema, never a read_parquet([]) crash
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64()),
                                       "tf": pa.array([], pa.int64())}))

    from ocr_ray.state.tombstones import read_tombstones

    dead = read_tombstones(index_dir, key_col)
    dead_ref = ray.put(dead) if dead is not None else None

    def pick(tab: pa.Table) -> pa.Table:
        import numpy as np

        sub = tab.filter(pc.equal(tab["token"], t))
        if dead_ref is not None and sub.num_rows:
            dd = ray.get(dead_ref)
            keys = sub[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(dd, keys)
            idx[idx == dd.size] = 0
            sub = sub.filter(pa.array(dd[idx] != keys))
        return sub.select([key_col, "tf"])

    return rd.read_parquet(files, columns=["token", key_col, "tf"]).map_batches(
        pick, batch_format="pyarrow")


def compact_term_index(index_dir: str, key_col: str = "doc_id") -> dict:
    """COMPACT a term/positional-index layout: rewrite each ``bucket=``
    partition's uuid-appended files as ONE parquet file sorted by
    (token, key) — the small-file reclamation every append-only index
    eventually needs — and PHYSICALLY APPLY the tombstone set
    (:func:`delete_from_term_index`) by dropping dead postings during
    the rewrite, then clear ``_tombstones/``.  The
    ``compact_ivf_index`` two-rename atomic swap per partition; the
    tombstone clear happens strictly AFTER every bucket is rewritten,
    so a crash at any point leaves a correct index (subtracting
    tombstones from already-cleaned postings is a no-op).

    Scale shape: one Ray task per bucket (buckets are independent,
    each reads only its own partition — cost proportional to the index,
    never the corpus) with the deleted-key set broadcast once via
    ``ray.put``.  Returns ``{"buckets", "files_before", "files_after",
    "rows_dropped"}``."""
    import shutil
    import uuid as _uuid

    import numpy as np
    import ray

    from ocr_ray.state.tombstones import TOMBSTONE_DIR, read_tombstones

    bucket_dirs = sorted(glob.glob(os.path.join(index_dir, "bucket=*")))
    files_before = sum(
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in bucket_dirs)
    dead = read_tombstones(index_dir, key_col)
    dead_ref = ray.put(dead if dead is not None
                       else np.zeros(0, np.int64))

    @ray.remote(num_cpus=1)
    def compact_bucket(bucket_dir: str) -> tuple:
        import pyarrow as pa_
        import pyarrow.compute as pc_
        import pyarrow.parquet as pq

        pa_.set_cpu_count(1)
        files = sorted(glob.glob(os.path.join(bucket_dir, "*.parquet")))
        dd = ray.get(dead_ref)
        if not files or (len(files) == 1 and not dd.size):
            return (len(files), 0)
        t = pa_.concat_tables([pq.read_table(f) for f in files])
        dropped = 0
        if dd.size and t.num_rows:
            keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(dd, keys)
            idx[idx == dd.size] = 0
            alive = dd[idx] != keys
            dropped = int(t.num_rows - alive.sum())
            t = t.filter(pa_.array(alive))
        t = t.take(pc_.sort_indices(
            t, sort_keys=[("token", "ascending"), (key_col, "ascending")]))
        parent = os.path.dirname(bucket_dir)
        base = os.path.basename(bucket_dir)
        tmp = os.path.join(parent, f"_tmp-{base}-{_uuid.uuid4().hex}")
        os.makedirs(tmp)
        pq.write_table(t.combine_chunks(),
                       os.path.join(tmp, "compact-0.parquet"))
        old = os.path.join(parent, f"_old-{base}-{_uuid.uuid4().hex}")
        os.rename(bucket_dir, old)
        os.rename(tmp, bucket_dir)
        shutil.rmtree(old, ignore_errors=True)
        return (1, dropped)

    res = ray.get([compact_bucket.remote(d) for d in bucket_dirs])
    # all buckets rewritten — the tombstones are applied, clear them
    ts_dir = os.path.join(index_dir, TOMBSTONE_DIR)
    if os.path.isdir(ts_dir):
        old = ts_dir + f"-old-{_uuid.uuid4().hex}"
        os.rename(ts_dir, old)
        shutil.rmtree(old, ignore_errors=True)
    return {"buckets": len(bucket_dirs), "files_before": files_before,
            "files_after": int(sum(r[0] for r in res)),
            "rows_dropped": int(sum(r[1] for r in res))}


def delete_from_term_index(index_dir: str, deleted_ds,
                           key_col: str = "doc_id") -> str:
    """DELETE documents from a term-index layout via append-only
    TOMBSTONES — the third index-maintenance verb beside append
    (:func:`update_term_index`) and rewrite (the ``compact_ivf_index``
    analogue); postings files are NOT touched and lookups subtract the
    set at query time (:func:`term_search_indexed`).  Semantics and the
    at-scale compaction story: :mod:`ocr_ray.state.tombstones`."""
    from ocr_ray.state.tombstones import append_tombstones

    return append_tombstones(index_dir, deleted_ds, key_col)


def build_positional_index(ds, index_dir: str, text_col: str = "text",
                           key_col: str = "doc_id",
                           n_buckets: int | None = None) -> str:
    """Positional sibling of :func:`build_term_index`: postings carry the
    full 0-based token-position list per (doc, token) — list<int32>
    columns write through ``write_parquet(partition_cols)`` unchanged —
    enabling phrase/adjacency queries the tf-only index cannot answer.
    Same one-streaming-pass, hive-bucketed, no-server stance."""
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets

    def postings(t: pa.Table) -> pa.Table:
        toks, ids, poss = [], [], []
        for did, txt in zip(t[key_col].to_pylist(), t[text_col].to_pylist()):
            by_tok: dict = {}
            for i, tok in enumerate((txt or "").lower().split()):
                by_tok.setdefault(tok, []).append(i)
            for tok, pos in by_tok.items():
                toks.append(tok)
                ids.append(did)
                poss.append(pos)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            key_col: pa.array(ids, pa.int64()),
            "positions": pa.array(poss, pa.list_(pa.int32())),
            "bucket": pa.array(
                [zlib.crc32(x.encode()) % n_buckets for x in toks],
                pa.int32()),
        })

    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"])
    return index_dir


def phrase_search_indexed(index_dir: str, phrase: str,
                          n_buckets: int | None = None,
                          key_col: str = "doc_id"):
    """Exact two-token PHRASE search over a :func:`build_positional_index`
    layout: read only the two terms' bucket partitions, co-partition both
    posting streams on a doc-hash bucket (two independent read lineages —
    union is safe per CLAUDE.md), and count adjacency matches
    (pos_a + 1 ∈ pos_b) vectorized inside each group.  Neither posting
    list is ever collected on the driver — a stop-word-frequent term's
    postings stream through the exchange like any other dataset.
    Returns (key, n_occ) for documents containing the phrase."""
    import numpy as np
    import pandas as pd

    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets
    t1, t2 = phrase.lower().split()
    assert t1 != t2, "overlapping identical-token phrases are ambiguous"

    def side_read(term: str, side: int):
        b = zlib.crc32(term.encode()) % n_buckets
        files = sorted(glob.glob(
            os.path.join(index_dir, f"bucket={b}", "*.parquet")))
        if not files:
            return rd.from_arrow(pa.table({
                key_col: pa.array([], pa.int64()),
                "positions": pa.array([], pa.list_(pa.int32())),
                "side": pa.array([], pa.int8()),
                "dbucket": pa.array([], pa.int32()),
            }))

        def pick(tab: pa.Table) -> pa.Table:
            sub = tab.filter(pc.equal(tab["token"], term))
            keys = sub[key_col]
            return pa.table({
                key_col: keys,
                "positions": sub["positions"],
                "side": pa.nulls(len(sub), pa.int8()).fill_null(side),
                "dbucket": pc.cast(
                    pc.bit_wise_and(pc.cast(keys, pa.int64()), 63),
                    pa.int32()),
            })

        return rd.read_parquet(
            files, columns=["token", key_col, "positions"]).map_batches(
            pick, batch_format="pyarrow")

    def adjacency(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0]
        b = g[g["side"] == 1].set_index(key_col)["positions"]
        ids, occs = [], []
        for did, pos_a in zip(a[key_col], a["positions"]):
            pos_b = b.get(did)
            if pos_b is None:
                continue
            n = int(np.isin(np.asarray(pos_a, np.int64) + 1,
                            np.asarray(pos_b, np.int64)).sum())
            if n:
                ids.append(did)
                occs.append(n)
        return pd.DataFrame({key_col: pd.array(ids, "int64"),
                             "n_occ": pd.array(occs, "int64")})

    return (side_read(t1, 0).union(side_read(t2, 1))
            .groupby("dbucket")
            .map_groups(adjacency, batch_format="pandas"))


def phrase_search_n_indexed(index_dir: str, phrase: str,
                            n_buckets: int | None = None,
                            key_col: str = "doc_id"):
    """ARBITRARY-LENGTH exact phrase search over a
    :func:`build_positional_index` layout — the n-token generalization
    of the 2-token :func:`phrase_search_indexed`, and it permits
    REPEATED tokens (``"batch batch batch"``), which the pairwise
    side-tag scheme cannot express.  Counts every start position ``p``
    with ``p + i`` in the position list of token ``i`` for all i
    (overlapping occurrences all count).

    Scale shape: ONE read over the distinct query tokens' bucket
    partitions (bytes ≈ |distinct buckets| / n_buckets of the postings
    — no union of lineages, no driver-side posting list), one
    vectorized is_in filter to the query vocabulary, one coarse 64-way
    doc-bucket groupby; the per-doc position intersection is a chain of
    np.isin over the query's k position lists (df-bounded work)."""
    import numpy as np
    import pandas as pd

    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets
    toks = phrase.lower().split()
    assert len(toks) >= 2, "phrase_search_n_indexed needs >= 2 tokens"
    distinct = sorted(set(toks))

    def _empty():
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64()),
                                       "n_occ": pa.array([], pa.int64())}))

    files: list[str] = []
    for b in sorted({zlib.crc32(t.encode()) % n_buckets for t in distinct}):
        probe = sorted(glob.glob(
            os.path.join(index_dir, f"bucket={b}", "*.parquet")))
        if not probe:
            return _empty()   # some token has no postings -> no match
        files.extend(probe)

    def pick(tab: pa.Table) -> pa.Table:
        sub = tab.filter(pc.is_in(tab["token"],
                                  pa.array(distinct, pa.string())))
        keys = sub[key_col]
        return pa.table({
            key_col: keys,
            "token": sub["token"],
            "positions": sub["positions"],
            "dbucket": pc.cast(
                pc.bit_wise_and(pc.cast(keys, pa.int64()), 63), pa.int32()),
        })

    def count_occ(g: pd.DataFrame) -> pd.DataFrame:
        ids, occs = [], []
        for did, grp in g.groupby(key_col, sort=True):
            pos = {t: np.asarray(p, np.int64)
                   for t, p in zip(grp["token"], grp["positions"])}
            if len(pos) < len(distinct):
                continue
            starts = pos[toks[0]]
            for i, t in enumerate(toks[1:], 1):
                if not starts.size:
                    break
                starts = starts[np.isin(starts + i, pos[t])]
            n = int(starts.size)
            if n:
                ids.append(did)
                occs.append(n)
        return pd.DataFrame({key_col: pd.array(ids, "int64"),
                             "n_occ": pd.array(occs, "int64")})

    return (rd.read_parquet(files, columns=["token", key_col, "positions"])
            .map_batches(pick, batch_format="pyarrow")
            .groupby("dbucket")
            .map_groups(count_occ, batch_format="pandas"))


def bool_search_indexed(index_dir: str, terms: list[str],
                        n_buckets: int | None = None,
                        key_col: str = "doc_id"):
    """Boolean-AND search over a :func:`build_term_index` layout: read
    ONLY the distinct bucket partitions of the query terms, filter each
    to the query vocabulary vectorized, then one groupby over the
    candidate postings keeps documents matching ALL terms — the postings
    INTERSECTION, expressed as count-distinct-terms == |query|.
    Returns (key, sum_tf) per matching document.

    Scale shape: bytes read ≈ |distinct query buckets| / n_buckets of
    the postings; the exchange carries only postings of the query terms
    (df-bounded, never the corpus).  A missing term short-circuits to a
    schema-typed empty dataset (AND can never match)."""
    from ray.data.aggregate import Count, Sum

    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets
    qs = sorted({t.lower() for t in terms})
    k = len(qs)
    assert k >= 1, "bool_search_indexed needs at least one term"

    def _empty():
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64()),
                                       "sum_tf": pa.array([], pa.int64())}))

    files: list[str] = []
    for b in sorted({zlib.crc32(t.encode()) % n_buckets for t in qs}):
        probe = sorted(glob.glob(
            os.path.join(index_dir, f"bucket={b}", "*.parquet")))
        if not probe:
            return _empty()     # some term's bucket is empty -> no AND hit
        files.extend(probe)

    def pick(tab: pa.Table) -> pa.Table:
        sub = tab.filter(pc.is_in(tab["token"], pa.array(qs, pa.string())))
        return sub.select([key_col, "tf"])

    def keep_full_match(tab: pa.Table) -> pa.Table:
        return (tab.filter(pc.equal(tab["n_terms"], k))
                .select([key_col, "sum_tf"]))

    return (
        rd.read_parquet(files, columns=["token", key_col, "tf"])
        .map_batches(pick, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Count(alias_name="n_terms"),
                   Sum("tf", alias_name="sum_tf"))
        .map_batches(keep_full_match, batch_format="pyarrow")
    )


def build_bm25_index(ds, index_dir: str, text_col: str = "text",
                     key_col: str = "doc_id",
                     n_buckets: int | None = None) -> str:
    """BM25-ready sibling of :func:`build_term_index`: each posting row
    additionally carries the DOCUMENT LENGTH (``dl`` — the Lucene-norms
    trick), so a query-time scorer needs NO doc-length join: everything
    per-candidate (tf, dl) is on the posting row it already reads.  A
    tiny ``stats.parquet`` (one row: n_docs, sum_dl) sits beside the
    hive-bucketed ``postings/`` layout; the scorer broadcasts it as two
    driver scalars.  Cost: +8 bytes/posting vs the tf-only index —
    bytes-read per query stays ~|query buckets|/n_buckets of the corpus
    postings.  Two build passes over the corpus (postings, then the
    n_docs/sum_dl fold); both stream.

    Stats live as append-only one-row SEGMENTS (``stats/*.parquet``)
    that the reader SUMS — so :func:`update_bm25_index` can ingest a
    new corpus slice by adding posting files + one stats segment
    without touching existing files (a concurrent reader sees either
    the old or the extended index, never a torn one)."""
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets

    def postings(t: pa.Table) -> pa.Table:
        toks, ids, tfs, dls = [], [], [], []
        for did, txt in zip(t[key_col].to_pylist(), t[text_col].to_pylist()):
            c = collections.Counter((txt or "").lower().split())
            dl = sum(c.values())
            for tok, n in c.items():
                toks.append(tok)
                ids.append(did)
                tfs.append(n)
                dls.append(dl)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            key_col: pa.array(ids, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(x.encode()) % n_buckets for x in toks],
                pa.int32()),
        })

    def stat_partial(t: pa.Table) -> pa.Table:
        sum_dl = sum(len((txt or "").lower().split())
                     for txt in t[text_col].to_pylist())
        return pa.table({"n_docs": pa.array([t.num_rows], pa.int64()),
                         "sum_dl": pa.array([sum_dl], pa.int64())})

    def stat_add(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        return pa.table({c: pa.array([int(pc.sum(t[c]).as_py() or 0)],
                                     pa.int64())
                         for c in t.column_names})

    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["bucket"])
    # n_docs counts EVERY document (empty-text docs too — the oracle's
    # COUNT(*) FROM documents), so it can't be derived from postings
    srows = (ds.map_batches(stat_partial, batch_format="pyarrow")
             .repartition(DEFAULT_CONFIG.driver_fold_buckets)
             .map_batches(stat_add, batch_format="pyarrow",
                          batch_size=None).take_all())
    _write_stats_segment(index_dir,
                         sum(r["n_docs"] for r in srows),
                         sum(r["sum_dl"] for r in srows))
    return index_dir


def _write_stats_segment(index_dir: str, n_docs: int, sum_dl: int) -> None:
    """Append one (n_docs, sum_dl) stats segment — uuid-named so
    concurrent ingests never collide; readers sum every segment."""
    import uuid

    import pyarrow.parquet as pq

    d = os.path.join(index_dir, "stats")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"n_docs": pa.array([n_docs], pa.int64()),
                  "sum_dl": pa.array([sum_dl], pa.int64())}),
        os.path.join(d, f"seg-{uuid.uuid4().hex}.parquet"))


def _read_stats(index_dir: str) -> tuple:
    """Sum every stats segment (exact ints — segment order irrelevant)."""
    import pyarrow.parquet as pq

    n_docs = sum_dl = 0
    for f in sorted(glob.glob(os.path.join(index_dir, "stats",
                                           "*.parquet"))):
        t = pq.read_table(f)
        n_docs += int(pc.sum(t["n_docs"]).as_py() or 0)
        sum_dl += int(pc.sum(t["sum_dl"]).as_py() or 0)
    return n_docs, sum_dl


def update_bm25_index(index_dir: str, new_ds, text_col: str = "text",
                      key_col: str = "doc_id",
                      n_buckets: int | None = None) -> str:
    """INGEST a new document slice into an existing
    :func:`build_bm25_index` layout — completing append-only continuous
    ingestion across all FOUR persisted index families (minhash bands,
    IVF cells, term postings, BM25 postings).  New posting files land
    inside the existing ``bucket=`` hive partitions (uuid names, old
    files untouched) and ONE new stats segment carries the slice's
    (n_docs, sum_dl); the scorer re-derives idf/avgdl from the summed
    segments, so an updated index scores IDENTICALLY to a full rebuild
    over the merged corpus.  ``n_buckets`` must match the build."""
    return build_bm25_index(new_ds, index_dir, text_col=text_col,
                            key_col=key_col, n_buckets=n_buckets)


def delete_from_bm25_index(index_dir: str, deleted_ds,
                           key_col: str = "doc_id") -> str:
    """DELETE documents from a BM25 layout — tombstones alone are NOT
    enough here: the scorer's idf/avgdl derive from the summed stats
    segments, so a delete must also CORRECT the collection statistics
    or every surviving score drifts.  Three steps, all append-only:

    1. the delete batch's keys (a SMALL side by contract — the corpus
       never deletes itself wholesale) are collected, deduped, and
       keys already tombstoned are dropped (repeat deletes are
       idempotent — the stats can never be double-corrected);
    2. one bounded pass over the index's own postings recovers the
       deleted docs' total token length (every posting row of a doc
       carries its ``dl``, so the per-doc length is any one row;
       empty-text docs have no postings and correctly contribute 0)
       and ONE NEGATIVE stats segment (-n_dead, -sum_dl_dead) is
       appended — readers sum segments, so n_docs/avgdl re-derive
       exactly as if the index had been built without the deleted
       docs;
    3. the tombstone segment is appended; :func:`bm25_search_indexed`
       drops dead candidate rows BEFORE computing per-term df, so idf
       self-corrects from the surviving postings.

    Cost: the stats-recovery pass reads the postings' (key, dl)
    columns once per delete batch — proportional to the index, never
    the corpus (batch deletes; at scale amortize by accumulating keys
    and deleting once per ingestion cycle)."""
    import numpy as np
    import ray

    from ocr_ray.state.tombstones import append_tombstones, read_tombstones

    rows = deleted_ds.select_columns([key_col]).take_all()
    keys = np.unique(np.asarray([r[key_col] for r in rows], np.int64))
    prior = read_tombstones(index_dir, key_col)
    if prior is not None:
        idx = np.searchsorted(prior, keys)
        idx[idx == prior.size] = 0
        keys = keys[prior[idx] != keys]
    if not keys.size:
        return index_dir
    keys_ref = ray.put(keys)

    def dead_dl(t: pa.Table) -> pa.Table:
        kk = ray.get(keys_ref)
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(kk, ids)
        pos[pos == kk.size] = 0
        m = kk[pos] == ids
        sub_ids = ids[m]
        sub_dl = t["dl"].to_numpy(zero_copy_only=False)[m]
        uniq, first = np.unique(sub_ids, return_index=True)
        return pa.table({key_col: pa.array(uniq, pa.int64()),
                         "dl": pa.array(sub_dl[first], pa.int64())})

    posting_files = sorted(glob.glob(
        os.path.join(index_dir, "postings", "bucket=*", "*.parquet")))
    sum_dl_dead = 0
    if posting_files:
        seen: dict = {}
        parts = (rd.read_parquet(posting_files, columns=[key_col, "dl"])
                 .map_batches(dead_dl, batch_format="pyarrow")
                 .take_all())
        for r in parts:
            seen[r[key_col]] = r["dl"]
        sum_dl_dead = int(sum(seen.values()))

    _write_stats_segment(index_dir, -int(keys.size), -sum_dl_dead)
    append_tombstones(
        index_dir,
        rd.from_arrow(pa.table({key_col: pa.array(keys, pa.int64())})),
        key_col)
    return index_dir


def bm25_search_indexed(index_dir: str, query: str, k: int = 20,
                        n_buckets: int | None = None,
                        key_col: str = "doc_id"):
    """BM25 (k1=1.2, b=0.75) top-k over a :func:`build_bm25_index`
    layout — the partition-pruned sibling of
    :func:`ocr_ray.pipelines.relational.bm25_search` (float expression
    shape matches it and the shared DuckDB oracle op-for-op; per-term
    contributions round to integer micro-units BEFORE the per-doc sum).

    Scale shape: reads ONLY the query terms' bucket partitions plus the
    tiny stats segments — never the corpus or the other buckets.  The
    candidate postings (df-bounded) are materialized once and reused for
    the df count and the scoring pass; the single exchange carries one
    (doc, score-contribution) row per candidate posting into a coarse
    64-way doc bucket where the per-doc sum and per-group top-k run
    vectorized, then a repartition(1) tail returns exactly k rows.
    Ordering: score_e6 desc, key asc."""
    import numpy as np
    import pandas as pd

    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.term_index_buckets
    K1, B = 1.2, 0.75
    qs = sorted({t for t in query.lower().split() if t})
    assert qs, "bm25_search_indexed needs at least one query term"

    def _empty():
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64()),
                                       "score_e6": pa.array([], pa.int64())}))

    files: list[str] = []
    for b in sorted({zlib.crc32(t.encode()) % n_buckets for t in qs}):
        files.extend(sorted(glob.glob(
            os.path.join(index_dir, "postings", f"bucket={b}", "*.parquet"))))
    if not files:
        return _empty()

    n_docs, sum_dl = _read_stats(index_dir)
    avgdl = float(sum_dl) / n_docs

    # tombstone-aware (delete_from_bm25_index): dead candidates drop
    # BEFORE the df count, so idf self-corrects from surviving postings
    # (n_docs/avgdl are already corrected by the negative stats segment)
    import ray

    from ocr_ray.state.tombstones import read_tombstones

    dead = read_tombstones(index_dir, key_col)
    dead_ref = ray.put(dead) if dead is not None else None

    def pick(tab: pa.Table) -> pa.Table:
        sub = tab.filter(pc.is_in(tab["token"], pa.array(qs, pa.string())))
        if dead_ref is not None and sub.num_rows:
            dd = ray.get(dead_ref)
            keys = sub[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            di = np.searchsorted(dd, keys)
            di[di == dd.size] = 0
            sub = sub.filter(pa.array(dd[di] != keys))
        return sub.select(["token", key_col, "tf", "dl"])

    cand = (rd.read_parquet(files, columns=["token", key_col, "tf", "dl"])
            .map_batches(pick, batch_format="pyarrow").materialize())
    if cand.count() == 0:
        return _empty()

    # per-term df: tiny aggregate (<= |query| rows reach the driver);
    # a (doc, term) posting row is unique, so a plain count IS the df
    from ray.data.aggregate import Count
    dfs = {r["token"]: r["count()"]
           for r in cand.groupby("token").aggregate(Count()).take_all()}
    idf = {t: float(np.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0))
           for t in qs if t in dfs}

    def contrib(tab: pa.Table) -> pa.Table:
        toks = np.asarray(tab["token"].to_pylist(), dtype=object)
        tfv = tab["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dlv = tab["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        idfv = np.select([toks == t for t in qs],
                         [idf.get(t, 0.0) for t in qs], default=0.0)
        x = 1e6 * (idfv * (tfv * (K1 + 1.0))
                   / (tfv + K1 * (1.0 - B + B * dlv / avgdl)))
        keys = tab[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: pa.array(keys, pa.int64()),
            "c": pa.array(np.copysign(np.floor(np.abs(x) + 0.5),
                                      x).astype(np.int64), pa.int64()),
            "dbucket": pa.array((keys & 63).astype(np.int32), pa.int32()),
        })

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(key_col, as_index=False)["c"].sum()
        agg = agg.rename(columns={"c": "score_e6"})
        agg = agg.sort_values(["score_e6", key_col],
                              ascending=[False, True]).head(k)
        return pd.DataFrame({
            key_col: agg[key_col].astype("int64"),
            "score_e6": agg["score_e6"].astype("int64")})

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("score_e6", "descending"),
                                            (key_col, "ascending")])[:k]
        return t.take(idx)

    return (cand.map_batches(contrib, batch_format="pyarrow")
            .groupby("dbucket")
            .map_groups(group_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def standing_query_matches(ds, queries: list[str], text_col: str = "text",
                           key_col: str = "doc_id"):
    """PERCOLATOR / reverse search (the alerting primitive): a fixed set
    of standing AND-term queries is matched against every document of
    the stream — per query, how many documents match and the min/max
    matching key.  ``query_id`` is the list index of the query; queries
    with zero matches are absent from the result (the oracle convention).

    Scale shape: the query set is the SMALL side — parsed once,
    broadcast via ``ray.put`` — and the corpus pass is one
    embarrassingly-parallel map_batches emitting per-batch PARTIALS
    (query_id, n, min, max), so the final exchange carries at most
    |queries| rows per batch into a tiny groupby.  No corpus shuffle at
    any scale.  At thousands of standing queries, invert the broadcast
    side (term → query postings, match via candidate counting) inside
    the same partial kernel; the exchange shape is unchanged."""
    import numpy as np
    import ray
    from ray.data.aggregate import Max, Min, Sum

    parsed = [frozenset(q.lower().split()) for q in queries]
    q_ref = ray.put(parsed)

    def partial(t: pa.Table) -> pa.Table:
        qs = ray.get(q_ref)
        counts = np.zeros(len(qs), np.int64)
        mins = np.full(len(qs), np.iinfo(np.int64).max)
        maxs = np.full(len(qs), np.iinfo(np.int64).min)
        for did, txt in zip(t[key_col].to_pylist(),
                            t[text_col].to_pylist()):
            toks = frozenset((txt or "").lower().split())
            for qi, terms in enumerate(qs):
                if terms <= toks:
                    counts[qi] += 1
                    if did < mins[qi]:
                        mins[qi] = did
                    if did > maxs[qi]:
                        maxs[qi] = did
        hit = np.flatnonzero(counts)
        return pa.table({
            "query_id": pa.array(hit.astype(np.int64), pa.int64()),
            "n": pa.array(counts[hit], pa.int64()),
            "mn": pa.array(mins[hit], pa.int64()),
            "mx": pa.array(maxs[hit], pa.int64()),
        })

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "n_matches": t["sum(n)"],
            "min_" + key_col: t["min(mn)"],
            "max_" + key_col: t["max(mx)"],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("query_id")
            .aggregate(Sum("n", alias_name="sum(n)"),
                       Min("mn", alias_name="min(mn)"),
                       Max("mx", alias_name="max(mx)"))
            .map_batches(finish, batch_format="pyarrow"))


def update_term_index(index_dir: str, new_ds, text_col: str = "text",
                      key_col: str = "doc_id",
                      n_buckets: int | None = None) -> str:
    """INGEST a new document slice's postings into an existing
    :func:`build_term_index` layout — the retrieval sibling of
    ``update_minhash_index`` / ``update_ivf_index``, completing
    append-only continuous ingestion across all three persisted index
    families.  Same one-pass postings kernel, same hive partitioning;
    Ray's write_parquet adds uuid-named files inside the existing
    ``bucket=`` partitions (old files untouched — a concurrent reader
    sees either the old or the extended index), and every lookup
    (term/phrase/bool) already reads ALL files of a probed bucket, so
    appended segments are immediately searchable.  ``n_buckets`` must
    match the build (the layout contract shared by the lookups)."""
    return build_term_index(new_ds, index_dir, text_col=text_col,
                            key_col=key_col, n_buckets=n_buckets)
