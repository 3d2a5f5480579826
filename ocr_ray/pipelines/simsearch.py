"""Similarity search over an embedding column (list<float>).

* :func:`knn_cosine` — brute-force cosine top-k: numpy matmul per batch
  against a broadcast query matrix (ray.put once, read per actor — never
  re-shipped per batch), per-batch partial top-k, tiny final reduce.
* :func:`knn_lsh`   — LSH-bucketed scale path: seeded random hyperplanes,
  sign-bit bucket, search only the query's bucket (approximate).

Float discipline: similarities are computed in float64 from the stored
float32 values and rounded to 6 decimals so results are stable across
summation orders / engines (the DuckDB oracle computes the same rounded
value with list_cosine_similarity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.config import DEFAULT_CONFIG


def _to_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix (zero-ish copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms


def _reduce_topk(partials, k: int, key_col: str) -> pa.Table:
    """Two-level top-k reduce: the per-batch k-row partials are merged by
    ONE ``repartition(1)`` task and only the final k rows reach the driver
    (a driver-side concat would hold k × n_batches rows at 10^6+ blocks)."""
    import pyarrow.compute as pc
    import ray

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("sim", "descending"), (key_col, "ascending")]
        )[:k]
        return t.take(idx)

    out = partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def knn_cosine(ds, query_vec, k: int = 10,
               vec_col: str = "embedding", key_col: str = "vec_id"):
    """Brute-force cosine top-k; returns a pyarrow Table
    (key_col, sim) with sim rounded to 6 dp, ordered by (-sim, key)."""
    import ray

    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        mat = _to_matrix(batch[vec_col])
        if mat.shape[0] == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sims = np.round(_cosine(mat, q), 6)
        ids = batch[key_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                key_col: pa.array(ids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return _reduce_topk(
        ds.map_batches(partial_topk, batch_format="pyarrow"), k, key_col
    )


_LSH_PLANES: dict[tuple[int, int], np.ndarray] = {}


def _planes(dim: int, n_bits: int) -> np.ndarray:
    if (dim, n_bits) not in _LSH_PLANES:
        _LSH_PLANES[(dim, n_bits)] = (
            np.random.RandomState(7).standard_normal((n_bits, dim))
        )
    return _LSH_PLANES[(dim, n_bits)]


def lsh_bucket(mat: np.ndarray, n_bits: int | None = None) -> np.ndarray:
    """Sign-bit bucket id per row (int32, ``n_bits`` hyperplane bits —
    default ``PipelineConfig.lsh_index_bits``).  Build and query sides
    must use the SAME n_bits for a given layout."""
    if n_bits is None:
        n_bits = DEFAULT_CONFIG.lsh_index_bits
    planes = _planes(mat.shape[1], n_bits)
    bits = (mat @ planes.T) > 0
    return (bits @ (1 << np.arange(n_bits))).astype(np.int32)


def knn_lsh(ds, query_vec, k: int = 10,
            vec_col: str = "embedding", key_col: str = "vec_id"):
    """Approximate top-k: filter to the query's LSH bucket inside
    map_batches (no shuffle at all), then brute-force within the bucket.
    This is the index-free single-shot path — every batch is still
    scanned; for repeated queries build the partitioned layout once with
    :func:`build_lsh_index` and query via :func:`knn_lsh_indexed`, which
    reads ONLY the probe partition (~1/2^bits of the bytes)."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(lsh_bucket(q.reshape(1, -1))[0])
    q_ref = ray.put(q)

    def bucket_topk(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[vec_col])
        if mat.shape[0] == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        mask = lsh_bucket(mat) == q_bucket
        if not mask.any():
            return pa.table({key_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sub = mat[mask]
        ids = batch[key_col].to_numpy(zero_copy_only=False)[mask]
        sims = np.round(_cosine(sub, ray.get(q_ref)), 6)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                key_col: pa.array(ids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return _reduce_topk(
        ds.map_batches(bucket_topk, batch_format="pyarrow"), k, key_col
    )


def _normalized(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def embedding_near_dup(ds, threshold: float = 0.35, n_blocks: int | None = None,
                       vec_col: str = "embedding", key_col: str = "vec_id"):
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥
    threshold, sim rounded to 6 dp) — block-partitioned distributed
    all-pairs (the classic distributed block nested-loop):

      every vector goes to block b = vec_id % n_blocks; each row is
      replicated to the n_blocks unordered block-pair groups it belongs to
      and a groupby((lo, hi)).map_groups computes the exact cross/within
      matmul per group.

    Unlike round 1 there is NO driver-side ``to_pandas`` of the corpus and
    NO full-matrix broadcast: the only data movement is the block-pair
    shuffle (n_blocks copies of each vector), and each task touches two
    blocks.  Compute stays O(N²) — inherent to EXACT all-pairs at a low
    threshold; use :func:`embedding_near_dup_lsh` for the sub-quadratic
    approximate path at high thresholds.  Scale n_blocks so a block pair
    fits a task's memory budget (rows/block ≈ N / n_blocks; default
    ``PipelineConfig.near_dup_blocks``).
    """
    import pandas as pd

    if n_blocks is None:
        n_blocks = DEFAULT_CONFIG.near_dup_blocks

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = batch[vec_col]
        blk = ids % n_blocks
        out_ids, out_vecs, out_blk, lo, hi = [], [], [], [], []
        for other in range(n_blocks):
            out_ids.append(ids)
            out_blk.append(blk)
            out_vecs.append(vecs)
            lo.append(np.minimum(blk, other))
            hi.append(np.maximum(blk, other))
        vec_all = pa.concat_arrays(
            [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
             for v in out_vecs]
        )
        return pa.table({
            key_col: pa.array(np.concatenate(out_ids), pa.int64()),
            "blk": pa.array(np.concatenate(out_blk), pa.int32()),
            vec_col: vec_all,
            "pair_lo": pa.array(np.concatenate(lo), pa.int32()),
            "pair_hi": pa.array(np.concatenate(hi), pa.int32()),
        })

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        lo = int(g["pair_lo"].iloc[0])
        hi = int(g["pair_hi"].iloc[0])
        g = g.drop_duplicates(subset=[key_col, "blk"])
        ga = g[g["blk"] == lo]
        ids_a = ga[key_col].to_numpy(dtype=np.int64)
        mat_a = _normalized(np.stack(ga[vec_col].to_numpy()).astype(np.float64))
        if lo == hi:
            sims = np.round(mat_a @ mat_a.T, 6)
            ii, jj = np.nonzero((sims >= threshold) &
                                (ids_a[:, None] < ids_a[None, :]))
            return pd.DataFrame({"id_a": ids_a[ii], "id_b": ids_a[jj],
                                 "sim": sims[ii, jj]})
        gb = g[g["blk"] == hi]
        ids_b = gb[key_col].to_numpy(dtype=np.int64)
        if len(ids_a) == 0 or len(ids_b) == 0:
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64),
                                 "sim": np.array([], np.float64)})
        mat_b = _normalized(np.stack(gb[vec_col].to_numpy()).astype(np.float64))
        sims = np.round(mat_a @ mat_b.T, 6)
        keep = sims >= threshold
        ii, jj = np.nonzero(keep)
        va, vb = ids_a[ii], ids_b[jj]
        return pd.DataFrame({"id_a": np.minimum(va, vb),
                             "id_b": np.maximum(va, vb),
                             "sim": sims[ii, jj]})

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .groupby(["pair_lo", "pair_hi"])
        .map_groups(block_pairs, batch_format="pandas")
    )


def embedding_near_dup_lsh(ds, threshold: float = 0.5,
                           n_tables: int | None = None,
                           n_bits: int | None = None,
                           vec_col: str = "embedding", key_col: str = "vec_id"):
    """Approximate near-dup pairs via multi-table sign-LSH bucketing:
    candidate pairs are generated INSIDE (table, bucket) groups, verified
    with exact cosine within the group, then deduplicated distributed.

    Sub-quadratic: a vector is compared only against its co-bucketed
    neighbours (n_tables × expected bucket size), so corpus-scale cost is
    ~N · n_tables · N/2^n_bits per table instead of N².  Recall for a pair
    at angle θ is 1-(1-(1-θ/π)^n_bits)^n_tables — at cosine ≥ 0.5 with 4
    bits × 32 tables it exceeds 0.999 (deterministic planes: a given
    corpus either finds a pair or never does, reproducibly).

    Oracle note: the SQL oracle asserts the EXACT all-pairs result, while
    this operator is approximate (per-pair miss probability ~1e-3 at the
    cosine-0.5 boundary, plus the MAX_BUCKET star-pairing truncation).  The
    check is therefore CORPUS-PINNED: it passes deterministically on the
    driver's testdata, but a different corpus could legitimately show a
    recall miss that is not a correctness regression.  (The driver-gate
    query is tolerance-aware instead: found ⊆ exact + a recall floor —
    see __ray_entry__._q_embedding_near_dup_lsh.)
    """
    import pandas as pd

    if n_tables is None:
        n_tables = DEFAULT_CONFIG.lsh_near_dup_tables
    if n_bits is None:
        n_bits = DEFAULT_CONFIG.lsh_near_dup_bits

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[vec_col])
        if mat.shape[0] == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "table_id": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int32()),
                             vec_col: batch[vec_col]})
        ids = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = batch[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        out_ids, out_t, out_b, out_v = [], [], [], []
        dim = mat.shape[1]
        for ti in range(n_tables):
            planes = np.random.RandomState(1000 + ti).standard_normal((n_bits, dim))
            bits = (mat @ planes.T) > 0
            bucket = (bits @ (1 << np.arange(n_bits))).astype(np.int32)
            out_ids.append(ids)
            out_t.append(np.full(len(ids), ti, np.int32))
            out_b.append(bucket)
            out_v.append(vecs)
        return pa.table({
            key_col: pa.array(np.concatenate(out_ids), pa.int64()),
            "table_id": pa.array(np.concatenate(out_t), pa.int32()),
            "bucket": pa.array(np.concatenate(out_b), pa.int32()),
            vec_col: pa.concat_arrays(out_v),
        })

    MAX_BUCKET = DEFAULT_CONFIG.lsh_near_dup_max_bucket
    # degenerate buckets pair against the bucket min

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[key_col]).sort_values(key_col)
        ids = g[key_col].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64),
                                 "sim": np.array([], np.float64)})
        mat = _normalized(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        if len(ids) > MAX_BUCKET:
            sims = np.round(mat[1:] @ mat[0], 6)
            keep = np.nonzero(sims >= threshold)[0]
            return pd.DataFrame({"id_a": np.full(len(keep), ids[0], np.int64),
                                 "id_b": ids[1:][keep],
                                 "sim": sims[keep]})
        sims = np.round(mat @ mat.T, 6)
        ii, jj = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj],
                             "sim": sims[ii, jj]})

    from ocr_ray.pipelines.dedup import dedupe_pairs

    return dedupe_pairs(
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["table_id", "bucket"])        # 32x16 coarse groups
        .map_groups(bucket_pairs, batch_format="pandas"),
        extra_cols=("sim",),                    # distributed pair dedup
    )


def knn_cosine_batch(ds, query_vecs, query_ids, k: int = 5,
                     vec_col: str = "embedding", key_col: str = "vec_id"):
    """Multi-query brute-force cosine top-k: ONE broadcast query matrix,
    one numpy matmul per batch for ALL queries, per-(query,batch) partial
    top-k, tiny final reduce.  Returns (query_id, vec_id, sim) rows —
    k per query, ordered by (-sim, vec_id) within each query."""
    import pandas as pd
    import ray

    q = np.asarray(query_vecs, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        mat = _to_matrix(batch[vec_col])
        if mat.shape[0] == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat / norms[:, None]) @ qmat.T, 6)   # (n, n_queries)
        ids = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids):
            order = np.lexsort((ids, -sims[:, j]))[:k]
            out_q.extend([qid] * len(order))
            out_v.extend(ids[order])
            out_s.extend(sims[order, j])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            key_col: pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final(t: pa.Table) -> pa.Table:
        # one repartition(1) task merges the (n_queries × k)-row partials;
        # the driver receives only the final n_queries × k rows
        df = t.to_pandas()
        top = (
            df.sort_values(["query_id", "sim", key_col],
                           ascending=[True, False, True])
            .groupby("query_id", as_index=False)
            .head(k)
        )
        return pa.table({
            "query_id": pa.array(top["query_id"].to_numpy(), pa.int64()),
            key_col: pa.array(top[key_col].to_numpy(), pa.int64()),
            "sim": pa.array(top["sim"].to_numpy(), pa.float64()),
        })

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def _kmeans_lite(sample: np.ndarray, n_clusters: int, n_iter: int = 10) -> np.ndarray:
    """Deterministic k-means for the IVF coarse quantizer — centroids are
    a pure function of the sample, and every step is SQL-reproducible:

    * init = the first n_clusters sample rows (the sample itself is the
      vec_id < train_sample prefix, so "first" is well-defined);
    * assignment = argmin squared L2, ties to the LOWEST centroid id;
    * each centroid update is ROUNDED to 6 decimals, so the DuckDB
      oracle's sequential AVG and numpy's pairwise mean agree exactly
      (their sub-1e-12 summation-order differences vanish in the round).
    """
    centroids = np.round(sample[: min(n_clusters, len(sample))].astype(np.float64), 6)
    for _ in range(n_iter):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = np.round(members.mean(axis=0), 6)
    return centroids


def knn_ivf(ds, query_vec, k: int = 10, n_clusters: int | None = None,
            n_probe: int = 2,
            vec_col: str = "embedding", key_col: str = "vec_id",
            train_sample: int | None = None):
    """IVF approximate top-k: a k-means coarse quantizer (trained on a
    driver-side sample, centroids broadcast once) assigns every vector to
    its nearest centroid; the query searches only its ``n_probe`` nearest
    cells.  This is the index-free single-shot path — cells are recomputed
    per batch; for repeated queries build the inverted-file layout once
    with :func:`build_ivf_index` and query via :func:`knn_ivf_indexed`,
    which reads ONLY the n_probe/n_clusters probe partitions."""
    import pyarrow.compute as pc_

    import ray

    if n_clusters is None:
        n_clusters = DEFAULT_CONFIG.ivf_clusters
    if train_sample is None:
        train_sample = DEFAULT_CONFIG.ivf_train_sample

    # the training sample is the vec_id < train_sample PREFIX in key
    # order — a well-defined, SQL-reproducible subset (ds.limit would
    # depend on block arrival order)
    sample_tbl = (
        ds.map_batches(
            lambda t: t.filter(pc_.less(t[key_col], train_sample)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(key_col)
    )
    sample = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    centroids = _kmeans_lite(sample, n_clusters)

    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe_cells = set(np.argsort(qd, kind="stable")[:n_probe].tolist())
    ref = ray.put((centroids, q))

    def cell_topk(batch: pa.Table) -> pa.Table:
        cents, qv = ray.get(ref)
        mat = _to_matrix(batch[vec_col])
        if mat.shape[0] == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cells = d.argmin(axis=1)
        mask = np.isin(cells, list(probe_cells))
        if not mask.any():
            return pa.table({key_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sub = mat[mask]
        ids = batch[key_col].to_numpy(zero_copy_only=False)[mask]
        sims = np.round(_cosine(sub, qv), 6)
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({
            key_col: pa.array(ids[order], pa.int64()),
            "sim": pa.array(sims[order], pa.float64()),
        })

    return _reduce_topk(
        ds.map_batches(cell_topk, batch_format="pyarrow"), k, key_col
    )


# ---------------------------------------------------------------------------
# Partition-pruned ANN layouts — the repeated-query / 100 TB path
# ---------------------------------------------------------------------------

def _empty_topk(key_col: str) -> pa.Table:
    return pa.table({key_col: pa.array([], pa.int64()),
                     "sim": pa.array([], pa.float64())})


def build_lsh_index(ds, index_dir: str, n_bits: int | None = None,
                    vec_col: str = "embedding", key_col: str = "vec_id") -> str:
    """Write the corpus hive-partitioned by sign-LSH bucket
    (``bucket=N/*.parquet``).  One full pass at build time; afterwards
    every :func:`knn_lsh_indexed` query reads ONLY its probe partitions —
    bytes-read per query drops to ~n_probe/2^n_bits of the scan path.
    ``n_bits`` defaults to ``PipelineConfig.lsh_index_bits``; at corpus
    scale raise it so a partition ≈ an object-store-friendly chunk.  At
    corpus scale this is exactly ``write_parquet(partition_cols)`` over
    object storage: the layout IS the index, no server component."""
    if n_bits is None:
        n_bits = DEFAULT_CONFIG.lsh_index_bits

    def add_bucket(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        b = lsh_bucket(mat, n_bits) if mat.shape[0] else np.zeros(0, np.int32)
        return t.select([key_col, vec_col]).append_column(
            "bucket", pa.array(b, pa.int32()))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"])
    return index_dir


def knn_lsh_indexed(index_dir: str, query_vec, k: int = 10, n_probe: int = 1,
                    n_bits: int | None = None,
                    vec_col: str = "embedding", key_col: str = "vec_id"):
    """Approximate top-k over a :func:`build_lsh_index` layout: read ONLY
    the probe partitions (storage-level pruning — the other partitions
    never leave disk), brute-force cosine within.

    Multi-probe: ``n_probe=1`` reads just the query's own bucket —
    identical to :func:`knn_lsh` over the same corpus.  ``n_probe>1``
    additionally probes the bucket's hamming-1 neighbors in bit order
    (up to 1 + n_bits buckets): a query landing near a hyperplane
    recovers neighbors that fell just across it, at n_probe/2^n_bits of
    the index bytes.  ``n_bits`` must match the build side."""
    import glob
    import os

    import ray.data as rd

    if n_bits is None:
        n_bits = DEFAULT_CONFIG.lsh_index_bits
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(lsh_bucket(q.reshape(1, -1), n_bits)[0])
    buckets = [q_bucket] + [q_bucket ^ (1 << i) for i in range(n_bits)]
    buckets = buckets[: max(1, n_probe)]
    # read_parquet accepts ONE directory or a list of FILES — glob the
    # files per probe dir (a list of directories fails)
    files = [
        f
        for b in buckets
        for f in sorted(glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
    ]
    if not files:
        return _empty_topk(key_col)
    ds = rd.read_parquet(files, columns=[key_col, vec_col])
    return knn_cosine(ds, query_vec, k=k, vec_col=vec_col, key_col=key_col)


def build_ivf_index(ds, index_dir: str, n_clusters: int | None = None,
                    train_sample: int | None = None,
                    vec_col: str = "embedding", key_col: str = "vec_id") -> str:
    """Write the inverted-file layout: deterministic k-means coarse
    quantizer (same ``_kmeans_lite`` as the scan path), every vector
    assigned to its nearest cell, rows hive-partitioned by ``cell=N``;
    centroids stored beside the data (``_centroids.parquet``, the
    underscore prefix keeps parquet dataset readers away from it).
    ``n_clusters``/``train_sample`` default to the PipelineConfig fields;
    at 100 TB raise n_clusters so a cell ≈ an object-store-friendly
    partition (16 cells of a 100 TB corpus would be ~6 TB each)."""
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq

    import ray

    if n_clusters is None:
        n_clusters = DEFAULT_CONFIG.ivf_clusters
    if train_sample is None:
        train_sample = DEFAULT_CONFIG.ivf_train_sample

    sample_tbl = (
        ds.map_batches(
            lambda t: t.filter(pc_.less(t[key_col], train_sample)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(key_col)
    )
    sample = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    centroids = _kmeans_lite(sample, n_clusters)
    cents_ref = ray.put(centroids)

    def add_cell(t: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        mat = _to_matrix(t[vec_col])
        if mat.shape[0]:
            d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cells = d.argmin(axis=1).astype(np.int32)
        else:
            cells = np.zeros(0, np.int32)
        return t.select([key_col, vec_col]).append_column(
            "cell", pa.array(cells, pa.int32()))

    ds.map_batches(add_cell, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"])
    pq.write_table(
        pa.table({
            "cell_id": pa.array(range(len(centroids)), pa.int32()),
            "centroid": pa.array([c.tolist() for c in centroids],
                                 pa.list_(pa.float64())),
        }),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    return index_dir


def knn_ivf_indexed(index_dir: str, query_vec, k: int = 10, n_probe: int = 2,
                    vec_col: str = "embedding", key_col: str = "vec_id"):
    """Approximate top-k over a :func:`build_ivf_index` layout: load the
    tiny centroid table, pick the n_probe nearest cells, read ONLY those
    partitions (n_probe/n_clusters of the bytes), brute-force cosine
    within.  Result is identical to :func:`knn_ivf` with the same
    quantizer parameters."""
    import os

    import pyarrow.parquet as pq

    import ray.data as rd

    cents_tbl = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    order = np.argsort(cents_tbl["cell_id"].to_numpy(zero_copy_only=False))
    centroids = np.stack(
        cents_tbl["centroid"].to_numpy(zero_copy_only=False)[order])
    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(qd, kind="stable")[:n_probe].tolist()
    import glob

    # read_parquet accepts ONE directory or a list of FILES; multiple
    # probe dirs therefore expand to their parquet files
    files = [
        f
        for c in probe
        for f in sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    ]
    if not files:
        return _empty_topk(key_col)
    ds = rd.read_parquet(files, columns=[key_col, vec_col])

    # tombstone-aware (delete_from_ivf_index): subtract deleted keys
    # from the probed cells before the cosine — zero cost when the
    # layout has no deletes
    from ocr_ray.state.tombstones import read_tombstones

    dead = read_tombstones(index_dir, key_col)
    if dead is not None:
        import ray

        dead_ref = ray.put(dead)

        def drop_dead(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return t
            dd = ray.get(dead_ref)
            keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(dd, keys)
            idx[idx == dd.size] = 0
            return t.filter(pa.array(dd[idx] != keys))

        ds = ds.map_batches(drop_dead, batch_format="pyarrow")
    return knn_cosine(ds, query_vec, k=k, vec_col=vec_col, key_col=key_col)


def delete_from_ivf_index(index_dir: str, deleted_ds,
                          key_col: str = "vec_id") -> str:
    """DELETE vectors from an IVF layout via append-only tombstones —
    the ANN sibling of
    :func:`~ocr_ray.pipelines.textsearch.delete_from_term_index`,
    completing the delete verb across both persisted index families.
    Cell partitions and the frozen quantizer (``_centroids.parquet``)
    are NOT touched; :func:`knn_ivf_indexed` subtracts the set inside
    the probed cells at query time, and the
    :func:`compact_ivf_index`-style partition rewrite is the at-scale
    reclamation path (:mod:`ocr_ray.state.tombstones`)."""
    from ocr_ray.state.tombstones import append_tombstones

    return append_tombstones(index_dir, deleted_ds, key_col)


def knn_join_lsh(ds, k: int = 5, n_bits: int | None = None,
                 vec_col: str = "embedding", key_col: str = "vec_id"):
    """Approximate kNN SELF-JOIN: for EVERY vector, its top-k most similar
    OTHER vectors within the same sign-LSH bucket — the retrieval
    pre-compute / near-dup-clustering primitive (one row per (vector,
    neighbor), ``nn_rank`` 1..k, ties broken by neighbor id).

    Scale shape: ONE shuffle, on a coarse 64-way bucket of the fine LSH
    bucket (fine buckets stay whole inside a coarse group, so per-group
    dispatch count is bounded by 64, never 2^n_bits); inside, one
    normalized matmul per fine bucket — total pair work is O(Σ b_i²),
    the LSH partitioning bound, the same story as
    :func:`embedding_near_dup_lsh`.  The per-row tie-broken top-k
    selection is a small lexsort per vector; the matmul dominates.
    Cross-bucket neighbors are missed (sign-LSH approximation — the
    exact same single-bucket semantics as :func:`knn_lsh`); raise
    ``n_bits`` at corpus scale so a bucket stays matmul-sized.
    """
    import pandas as pd

    if n_bits is None:
        n_bits = DEFAULT_CONFIG.lsh_index_bits
    n_coarse = DEFAULT_CONFIG.near_dup_coarse_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        b = lsh_bucket(mat, n_bits) if mat.shape[0] else np.zeros(0, np.int32)
        return pa.table({
            key_col: t[key_col],
            vec_col: t[vec_col],
            "fbucket": pa.array(b, pa.int32()),
            "cbucket": pa.array((b % n_coarse).astype(np.int32), pa.int32()),
        })

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_nb, out_sim, out_rk = [], [], [], []
        for _, grp in g.groupby("fbucket", sort=True):
            n = len(grp)
            if n < 2:
                continue
            ids = grp[key_col].to_numpy(dtype=np.int64)
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in grp[vec_col]])
            nm = _normalized(mat)
            sims = np.round(nm @ nm.T, 6)
            kk = min(k, n - 1)
            for i in range(n):
                row = sims[i].copy()
                row[i] = -np.inf          # exclude self
                order = np.lexsort((ids, -row))[:kk]
                out_id.extend([ids[i]] * kk)
                out_nb.extend(ids[order])
                out_sim.extend(row[order])
                out_rk.extend(range(1, kk + 1))
        return pd.DataFrame({
            key_col: np.array(out_id, dtype=np.int64),
            "neighbor_id": np.array(out_nb, dtype=np.int64),
            "sim": np.array(out_sim, dtype=np.float64),
            "nn_rank": np.array(out_rk, dtype=np.int64),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(join_group, batch_format="pandas")
    )


def kmeans_inertia_stats(ds, k: int = 8, n_iter: int = 3,
                         scale: int = 1_000_000,
                         vec_col: str = "embedding",
                         key_col: str = "vec_id"):
    """CLUSTER COHESION under the final Lloyd centroids: per cluster,
    member count, INERTIA (the k-means objective — sum of squared
    distances to the centroid) and the worst member distance.  Returns
    ``(cid, n_members, inertia_milli, max_d)`` — ``max_d`` is the exact
    integer squared distance in micro²-units; per-vector distances are
    half-away-rounded to milli²-units (÷10^6) BEFORE the sum so the
    per-cluster total stays int64-exact at any corpus size (2.6e14-max
    addends would overflow a raw sum).

    Scale shape: one more embarrassingly-parallel pass over the
    materialized scaled corpus (the :func:`kmeans_cluster_profile`
    shape); per-batch partials are ≤ k rows of (n, Σd_milli, max d),
    reduced by a k-key groupby."""
    import ray
    from ray.data.aggregate import Max, Sum

    scaled, cents, _, _kk, _dim = _lloyd(
        ds, k, n_iter, scale, vec_col, key_col)
    ref = ray.put(cents)

    def partials(t: pa.Table) -> pa.Table:
        cs = ray.get(ref)
        mat = _to_imatrix(t["iv"])
        cid_l, n_l, s_l, m_l = [], [], [], []
        if mat.shape[0]:
            d2 = ((mat * mat).sum(1)[:, None] - 2 * (mat @ cs.T)
                  + (cs * cs).sum(1)[None, :])
            a = d2.argmin(1)
            dmin = d2[np.arange(len(a)), a]
            dmilli = _r0(dmin / 1_000_000.0)
            for c in np.unique(a):
                sel = a == c
                cid_l.append(int(c))
                n_l.append(int(sel.sum()))
                s_l.append(int(dmilli[sel].sum()))
                m_l.append(int(dmin[sel].max()))
        return pa.table({
            "cid": pa.array(cid_l, pa.int64()),
            "n_members": pa.array(n_l, pa.int64()),
            "inertia_milli": pa.array(s_l, pa.int64()),
            "max_d": pa.array(m_l, pa.int64()),
        })

    return (
        scaled.map_batches(partials, batch_format="pyarrow")
        .groupby("cid")
        .aggregate(Sum("n_members", alias_name="n_members"),
                   Sum("inertia_milli", alias_name="inertia_milli"),
                   Max("max_d", alias_name="max_d"))
    )


def knn_label_eval(ds, k: int = 5, n_bits: int | None = None,
                   vec_col: str = "embedding", key_col: str = "vec_id",
                   label_col: str = "label"):
    """kNN LABEL PREDICTION eval (the classic embedding-quality probe —
    Fix & Hodges 1951 kNN, applied as a representation benchmark): every
    vector's label is predicted by MAJORITY VOTE over its ≤k most
    similar same-LSH-bucket neighbors (:func:`knn_join_lsh` semantics:
    rounded cosine, ties → lowest neighbor id; vote ties → lowest
    label), cross-tabulated against the true label.  Returns the
    confusion matrix ``(label, pred_label, n_vecs)``; singleton-bucket
    vectors have no neighbors and are excluded (the LSH approximation,
    documented in knn_join_lsh).

    Scale shape: identical to :func:`knn_join_lsh` — ONE coarse shuffle
    of the fine LSH buckets, per-fine-bucket matmul bounded by bucket
    sizes — except labels ride the exchange and only (label,
    pred_label) PAIR COUNTS leave each group (≤ |labels|² rows per
    group), reduced by a tiny groupby sum; the neighbor lists
    themselves never cross a boundary."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if n_bits is None:
        n_bits = DEFAULT_CONFIG.lsh_index_bits
    n_coarse = DEFAULT_CONFIG.near_dup_coarse_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        b = lsh_bucket(mat, n_bits) if mat.shape[0] else np.zeros(0, np.int32)
        return pa.table({
            key_col: t[key_col],
            vec_col: t[vec_col],
            label_col: t[label_col],
            "fbucket": pa.array(b, pa.int32()),
            "cbucket": pa.array((b % n_coarse).astype(np.int32), pa.int32()),
        })

    def vote_group(g: pd.DataFrame) -> pd.DataFrame:
        true_l, pred_l = [], []
        for _, grp in g.groupby("fbucket", sort=True):
            n = len(grp)
            if n < 2:
                continue
            ids = grp[key_col].to_numpy(dtype=np.int64)
            labels = grp[label_col].to_numpy(dtype=np.int64)
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in grp[vec_col]])
            nm = _normalized(mat)
            sims = np.round(nm @ nm.T, 6)
            kk = min(k, n - 1)
            for i in range(n):
                row = sims[i].copy()
                row[i] = -np.inf
                nb = labels[np.lexsort((ids, -row))[:kk]]
                vals, cnts = np.unique(nb, return_counts=True)
                # majority, ties -> lowest label (vals is sorted asc)
                true_l.append(labels[i])
                pred_l.append(vals[cnts.argmax()])
        out = (pd.DataFrame({"label": np.array(true_l, np.int64),
                             "pred_label": np.array(pred_l, np.int64)})
               .groupby(["label", "pred_label"], as_index=False).size()
               .rename(columns={"size": "n_vecs"}))
        out["n_vecs"] = out["n_vecs"].astype("int64")
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(vote_group, batch_format="pandas")
        .groupby(["label", "pred_label"])
        .aggregate(Sum("n_vecs", alias_name="n_vecs"))
    )


def ann_recall_at_k(exact: pa.Table, approx: pa.Table, k: int,
                    key_col: str = "vec_id") -> pa.Table:
    """Recall@k of an approximate top-k result against the exact one —
    the standard ANN quality metric (reference analogue: the dual-engine
    agreement vote, ``quality_check.py``-style compare of two extractors'
    outputs for the same doc).

    Both inputs are k-row tables already produced by the distributed
    pipelines (:func:`knn_cosine` exact, :func:`knn_lsh` /
    :func:`knn_lsh_indexed` approximate); only those ≤k-row sets are
    compared here, so the evaluation itself is O(k) on the driver — the
    100 TB cost lives entirely in the two upstream searches.

    Returns one row: ``(k, n_exact, n_approx, n_common, recall_bp)``
    with ``recall_bp`` = basis points of exact neighbors recovered,
    half-away-rounded to an integer (oracle parity convention).
    """
    exact_ids = set(exact[key_col].to_pylist())
    approx_ids = set(approx[key_col].to_pylist())
    n_common = len(exact_ids & approx_ids)
    n_exact = len(exact_ids)
    recall_bp = int(np.floor(10000.0 * n_common / n_exact + 0.5)) if n_exact else 0
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n_exact": pa.array([n_exact], pa.int64()),
        "n_approx": pa.array([len(approx_ids)], pa.int64()),
        "n_common": pa.array([n_common], pa.int64()),
        "recall_bp": pa.array([recall_bp], pa.int64()),
    })


def semdedup_stats(ds, threshold: float = 0.35, n_clusters: int | None = None,
                   train_sample: int | None = None,
                   vec_col: str = "embedding", key_col: str = "vec_id"):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    SEMANTIC dedup by k-means partitioning + an in-cluster cosine
    threshold — near-duplicates are only searched WITHIN a cluster, which
    is what makes semantic dedup tractable at corpus scale.  Per cluster,
    vectors whose rounded cosine ≥ ``threshold`` form components; the
    min-``vec_id`` member of each component survives (keep-first, the
    same representative rule as :func:`~ocr_ray.pipelines.dedup.near_dup_filter`).
    Returns one row per cluster: ``(cid, n_vecs, n_survivors)``.

    Scale shape: centroids are trained on the ``vec_id < train_sample``
    prefix (the same deterministic, SQL-reproducible :func:`_kmeans_lite`
    as the IVF path) and broadcast ONCE via ``ray.put``; assignment is a
    vectorized argmin ``map_batches``; the ONLY shuffle is
    ``groupby(cid)``, and pair work is confined to clusters —
    O(Σ b_i²) matmul like :func:`embedding_near_dup`'s block pairs,
    except SemDeDup *chooses* the partition so raising ``n_clusters``
    keeps every cluster matmul-sized (total pair work ≈ n²/k).
    Components cannot span clusters by construction, so the per-cluster
    min-label union-find is exact, and the representative choice is
    partition-invariant (a pure function of the assignment + pair graph).
    """
    import pandas as pd
    import pyarrow.compute as pc_

    import ray

    if n_clusters is None:
        n_clusters = DEFAULT_CONFIG.ivf_clusters
    if train_sample is None:
        train_sample = DEFAULT_CONFIG.ivf_train_sample

    sample_tbl = (
        ds.map_batches(
            lambda t: t.filter(pc_.less(t[key_col], train_sample)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(key_col)
    )
    sample = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    centroids = _kmeans_lite(sample, n_clusters)
    ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        mat = _to_matrix(batch[vec_col])
        if mat.shape[0] == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                vec_col: batch[vec_col],
                "cid": pa.array([], pa.int64()),
            })
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            key_col: batch[key_col],
            vec_col: batch[vec_col],
            "cid": pa.array(d.argmin(axis=1).astype(np.int64), pa.int64()),
        })

    def cluster_stats(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[key_col].to_numpy(dtype=np.int64)
        n = len(ids)
        survivors = n
        if n >= 2:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in g[vec_col]])
            nm = _normalized(mat)
            sims = np.round(nm @ nm.T, 6)
            ai, bi = np.where(np.triu(sims >= threshold, k=1))
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(ids[ai], ids[bi]):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            dropped = sum(1 for m in list(parent) if find(m) != m)
            survivors = n - dropped
        return pd.DataFrame({
            "cid": np.array([g["cid"].iloc[0]], dtype=np.int64),
            "n_vecs": np.array([n], dtype=np.int64),
            "n_survivors": np.array([survivors], dtype=np.int64),
        })

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cid")
        .map_groups(cluster_stats, batch_format="pandas")
    )


def _to_imatrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<int64> column → (n, d) int64 matrix (zero-copy flatten)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _int_list_column(ints: np.ndarray) -> pa.ListArray:
    """(n, d) int64 matrix → arrow list<int64> column (one offset array,
    no per-row Python lists)."""
    n, d = ints.shape if ints.size else (len(ints), 0)
    offsets = pa.array(np.arange(0, (n + 1) * d, max(d, 1), dtype=np.int32)
                       if d else np.zeros(n + 1, np.int32), pa.int32())
    return pa.ListArray.from_arrays(offsets, pa.array(ints.ravel(), pa.int64()))


def _r0(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero round to int64 (the DuckDB ROUND convention)."""
    return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)


def kmeans_embeddings(ds, k: int = 8, n_iter: int = 3,
                      scale: int = 1_000_000,
                      vec_col: str = "embedding", key_col: str = "vec_id"
                      ) -> pa.Table:
    """FULL-CORPUS distributed Lloyd's k-means (MacQueen 1967 / Lloyd
    1982 — public method; the clustering step under SemDeDup / IVF when
    the quantizer must be trained on EVERY vector, not a sample).
    Returns the final centroids as one row per (cid, pos):
    ``(cid, pos, c_scaled, n_members)`` — c_scaled in integer
    micro-units, n_members from the final assignment (0 for a cluster
    that lost all members; its centroid carries over unchanged).

    Integer-exact semantics (every step SQL-reproducible):

    * components scale to int64 micro-units (half-away) BEFORE any
      arithmetic, so distances are exact integer sums — summation order
      cannot perturb an argmin;
    * init = the vectors with ``key_col < k`` (well-defined prefix);
    * assignment = argmin exact squared L2, ties to the LOWEST cid;
    * centroid update = half-away-round(sum/count) back to micro-units
      (one float64 division of exact integers — the oracle's
      ``ROUND(CAST(s AS DOUBLE)/CAST(n AS DOUBLE))`` shape).

    Scale shape: the scaled corpus is materialized ONCE (the standard
    iterative-algorithm exception — n_iter passes re-read object-store
    blocks instead of re-decoding parquet; blocks spill under pressure).
    Each iteration broadcasts the k×dim centroid matrix via ``ray.put``
    and runs ONE embarrassingly-parallel pass emitting a fixed-size
    partial blob per batch (k×dim int64 sums + k counts — the
    _gram_partial discipline); `_prefold` caps the driver at
    driver_fold_buckets blobs, so driver bytes are O(k·dim), never
    O(corpus).  No shuffle anywhere.  At 100 TB prefer the sample-trained
    quantizer (:func:`build_ivf_index`) unless exact full-corpus Lloyd is
    required; this operator is the exact path.
    """
    scaled, cents, counts, kk, dim = _lloyd(
        ds, k, n_iter, scale, vec_col, key_col)
    return pa.table({
        "cid": pa.array(np.repeat(np.arange(kk, dtype=np.int64), dim)),
        "pos": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), kk)),
        "c_scaled": pa.array(cents.ravel(), pa.int64()),
        "n_members": pa.array(np.repeat(counts, dim), pa.int64()),
    })


def _assign_int(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Exact int64 argmin assignment: |x|^2 - 2 x.c + |c|^2, ties ->
    lowest cid via argmin-first-occurrence."""
    d2 = ((mat * mat).sum(1)[:, None] - 2 * (mat @ cents.T)
          + (cents * cents).sum(1)[None, :])
    return d2.argmin(1)


def _lloyd(ds, k: int, n_iter: int, scale: int,
           vec_col: str, key_col: str, extra_cols: tuple = ()):
    """Shared distributed-Lloyd core (see :func:`kmeans_embeddings` for
    the semantics/scale contract).  Returns ``(scaled, cents, counts,
    kk, dim)`` — the materialized micro-unit dataset (with
    ``extra_cols`` carried through for downstream passes), the final
    centroid matrix, and the member counts of the last update's
    assignment."""
    import pyarrow.compute as pc_
    import ray

    from ocr_ray.pipelines.relational import _prefold

    def to_scaled(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col]) * scale
        ints = _r0(mat) if mat.size else mat.astype(np.int64)
        cols = {key_col: t[key_col], "iv": _int_list_column(ints)}
        for c in extra_cols:
            cols[c] = t[c]
        return pa.table(cols)

    scaled = ds.map_batches(to_scaled, batch_format="pyarrow").materialize()

    init_tbl = (
        scaled.map_batches(
            lambda t: t.filter(pc_.less(t[key_col], k)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(key_col)
    )
    cents = np.stack([np.asarray(v, dtype=np.int64) for v in init_tbl["iv"]])
    kk, dim = cents.shape

    def blob_add(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        d = int(t["dim"][0].as_py())
        n_c = int(t["k"][0].as_py())
        s = np.zeros(n_c * d, np.int64)
        c = np.zeros(n_c, np.int64)
        for sb, cb in zip(t["sums"].to_pylist(), t["counts"].to_pylist()):
            s += np.frombuffer(sb, np.int64)
            c += np.frombuffer(cb, np.int64)
        return pa.table({
            "sums": pa.array([s.tobytes()], pa.binary()),
            "counts": pa.array([c.tobytes()], pa.binary()),
            "dim": pa.array([d], pa.int64()),
            "k": pa.array([n_c], pa.int64()),
        })

    counts = np.zeros(kk, np.int64)
    for _ in range(n_iter):
        cent_ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            cs = ray.get(cent_ref)
            mat = _to_imatrix(t["iv"])
            sums = np.zeros((kk, dim), np.int64)
            cnts = np.zeros(kk, np.int64)
            if mat.shape[0]:
                a = _assign_int(mat, cs)
                for c in np.unique(a):
                    sub = mat[a == c]
                    sums[c] = sub.sum(axis=0)
                    cnts[c] = sub.shape[0]
            return pa.table({
                "sums": pa.array([sums.tobytes()], pa.binary()),
                "counts": pa.array([cnts.tobytes()], pa.binary()),
                "dim": pa.array([dim], pa.int64()),
                "k": pa.array([kk], pa.int64()),
            })

        rows = _prefold(
            scaled.map_batches(partial, batch_format="pyarrow"),
            blob_add).take_all()
        sums = np.zeros((kk, dim), np.int64)
        counts = np.zeros(kk, np.int64)
        for r in rows:
            sums += np.frombuffer(r["sums"], np.int64).reshape(kk, dim)
            counts += np.frombuffer(r["counts"], np.int64)
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = _r0(sums[nz] / counts[nz, None])

    return scaled, cents, counts, kk, dim


def kmeans_cluster_profile(ds, k: int = 8, n_iter: int = 3,
                           scale: int = 1_000_000,
                           vec_col: str = "embedding",
                           key_col: str = "vec_id",
                           label_col: str = "label"):
    """CLUSTERING EVAL: run the same full-corpus Lloyd's as
    :func:`kmeans_embeddings`, then assign every vector under the FINAL
    centroids and cross-tabulate against a ground-truth ``label_col`` —
    the per-cluster label histogram that purity / NMI / majority-vote
    cluster naming are computed from.  Returns one row per present
    (cid, label): ``(cid, label, n_vecs)``.

    Scale shape: everything :func:`kmeans_embeddings` does, plus ONE
    more embarrassingly-parallel pass whose per-batch partial is a
    (cid, label) pair-count table (≤ k × |labels| rows per batch — the
    value-count discipline), reduced by a tiny groupby sum.  Labels
    ride the materialized scaled dataset, so the corpus is still read
    once."""
    import ray
    from ray.data.aggregate import Sum

    scaled, cents, _, _kk, _dim = _lloyd(
        ds, k, n_iter, scale, vec_col, key_col, extra_cols=(label_col,))
    ref = ray.put(cents)

    def pair_counts(t: pa.Table) -> pa.Table:
        import pandas as pd

        cs = ray.get(ref)
        mat = _to_imatrix(t["iv"])
        if not mat.shape[0]:
            return pa.table({"cid": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "cid": _assign_int(mat, cs).astype(np.int64),
            "label": t[label_col].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        out = df.groupby(["cid", "label"], as_index=False).size()
        return pa.table({
            "cid": pa.array(out["cid"].to_numpy(np.int64)),
            "label": pa.array(out["label"].to_numpy(np.int64)),
            "n_vecs": pa.array(out["size"].to_numpy(np.int64)),
        })

    return (
        scaled.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["cid", "label"])
        .aggregate(Sum("n_vecs", alias_name="n_vecs"))
    )


def bitext_margin_pairs(ds, k: int | None = None,
                        threshold_bp: int | None = None,
                        n_bits: int | None = None,
                        vec_col: str = "embedding", key_col: str = "vec_id",
                        label_col: str = "label"):
    """CROSS-LINGUAL BITEXT MINING by margin scoring (Artetxe & Schwenk
    2019 "Margin-based Parallel Corpus Mining", the CCMatrix / LASER
    alignment step — public method): the corpus splits into a SOURCE
    side (even ``label``) and a TARGET side (odd ``label``); within each
    fine LSH bucket every source×target candidate is scored, and a pair
    is MINED when the two vectors are MUTUAL rank-1 neighbors and the
    margin — cos(x,y) over the mean of the two sides' top-k candidate
    similarities — clears ``threshold_bp``.  Returns one row per mined
    pair: ``(src_id, tgt_id, src_label, tgt_label, sim_micro,
    margin_bp)``.

    Integer discipline (oracle parity): sims round to integer
    MICRO-units (round-half conventions as knn_join_lsh); the margin

        margin = sim / ((sum_x/k_x + sum_y/k_y) / 2)
               = 2·sim·k_x·k_y / (sum_x·k_y + sum_y·k_x)

    is evaluated ENTIRELY in int64 (numerator ≤ 2·10^4·16·10^6) with
    floor(·+0.5) half-away rounding to basis points, so Ray and DuckDB
    agree bit-for-bit.  k_x = min(k, candidates of x); the rank-1 pair
    itself is part of each side's normalizer (the published definition:
    y ∈ NN_k(x)).  Pairs need sim_micro > 0 and a positive normalizer.

    Scale shape: IDENTICAL to :func:`knn_join_lsh` — one coarse shuffle
    of fine LSH buckets (fine buckets stay whole inside ≤64 coarse
    groups), one normalized src×tgt matmul per fine bucket, pair work
    O(Σ s_i·t_i) bounded by bucket sizes; only mined-pair rows leave a
    group.  Cross-bucket pairs are missed (the documented sign-LSH
    approximation; raise n_bits at corpus scale so buckets stay
    matmul-sized — mining recall is the LSH recall).
    """
    import pandas as pd

    if k is None:
        k = DEFAULT_CONFIG.bitext_topk
    if threshold_bp is None:
        threshold_bp = DEFAULT_CONFIG.bitext_margin_bp
    if n_bits is None:
        n_bits = DEFAULT_CONFIG.lsh_index_bits
    n_coarse = DEFAULT_CONFIG.near_dup_coarse_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        mat = _to_matrix(t[vec_col])
        b = lsh_bucket(mat, n_bits) if mat.shape[0] else np.zeros(0, np.int32)
        return pa.table({
            key_col: t[key_col],
            label_col: t[label_col],
            vec_col: t[vec_col],
            "fbucket": pa.array(b, pa.int32()),
            "cbucket": pa.array((b % n_coarse).astype(np.int32), pa.int32()),
        })

    def mine_group(g: pd.DataFrame) -> pd.DataFrame:
        o_sid, o_tid, o_sl, o_tl, o_sim, o_m = [], [], [], [], [], []
        for _, grp in g.groupby("fbucket", sort=True):
            labels = grp[label_col].to_numpy(dtype=np.int64)
            src = grp[labels % 2 == 0]
            tgt = grp[labels % 2 == 1]
            ns, nt = len(src), len(tgt)
            if ns == 0 or nt == 0:
                continue
            sid = src[key_col].to_numpy(dtype=np.int64)
            tid = tgt[key_col].to_numpy(dtype=np.int64)
            sl = src[label_col].to_numpy(dtype=np.int64)
            tl = tgt[label_col].to_numpy(dtype=np.int64)
            ms = _normalized(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in src[vec_col]]))
            mt = _normalized(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in tgt[vec_col]]))
            sim = _r0(np.round(ms @ mt.T, 6) * 1e6)     # (ns, nt) int64
            kx, ky = min(k, nt), min(k, ns)
            # per-src top-kx candidate order: sim desc, tgt id asc
            s_ord = np.lexsort((np.broadcast_to(tid, (ns, nt)), -sim), axis=1)
            s_best = s_ord[:, 0]
            s_sum = np.take_along_axis(sim, s_ord[:, :kx], axis=1).sum(axis=1)
            # per-tgt over src (columns): sim desc, src id asc
            t_ord = np.lexsort(
                (np.broadcast_to(sid, (nt, ns)), -sim.T), axis=1)
            t_best = t_ord[:, 0]
            t_sum = np.take_along_axis(sim.T, t_ord[:, :ky], axis=1).sum(axis=1)
            for i in range(ns):
                j = int(s_best[i])
                if int(t_best[j]) != i:
                    continue                      # not mutual rank-1
                s = int(sim[i, j])
                d = int(s_sum[i]) * ky + int(t_sum[j]) * kx
                if s <= 0 or d <= 0:
                    continue
                m_bp = (2 * 20000 * kx * ky * s + d) // (2 * d)
                if m_bp >= threshold_bp:
                    o_sid.append(int(sid[i])); o_tid.append(int(tid[j]))
                    o_sl.append(int(sl[i])); o_tl.append(int(tl[j]))
                    o_sim.append(s); o_m.append(int(m_bp))
        return pd.DataFrame({
            "src_id": np.array(o_sid, dtype=np.int64),
            "tgt_id": np.array(o_tid, dtype=np.int64),
            "src_label": np.array(o_sl, dtype=np.int64),
            "tgt_label": np.array(o_tl, dtype=np.int64),
            "sim_micro": np.array(o_sim, dtype=np.int64),
            "margin_bp": np.array(o_m, dtype=np.int64),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(mine_group, batch_format="pandas")
    )


def update_ivf_index(index_dir: str, new_ds,
                     vec_col: str = "embedding",
                     key_col: str = "vec_id") -> str:
    """INGEST new vectors into an existing :func:`build_ivf_index` layout
    WITHOUT retraining the quantizer — the ANN sibling of
    ``update_minhash_index``, completing continuous ingestion on the
    similarity-search side: load the frozen ``_centroids`` sidecar once,
    assign each new vector to its nearest cell with the same exact
    argmin kernel as the build, and append uuid-named parquet files
    inside the same ``cell=`` partitions (Ray's write_parquet never
    touches existing files, so a concurrent reader sees either the old
    or the extended index).  One embarrassingly-parallel pass over the
    NEW slice only — the existing index is never read or shuffled.

    Because the quantizer is frozen, ``build(base) + update(rest)`` is
    CONTENT-equal to ``build(all)`` whenever the k-means training
    prefix lives inside the base slice — the equivalence the
    ``knn_ivf_updated`` oracle pins end-to-end (probe of the updated
    layout == the full-corpus IVF oracle)."""
    import os

    import pyarrow.parquet as pq

    import ray

    cents_tbl = pq.read_table(os.path.join(index_dir, "_centroids.parquet"))
    order = np.argsort(cents_tbl["cell_id"].to_numpy(zero_copy_only=False))
    centroids = np.stack(
        cents_tbl["centroid"].to_numpy(zero_copy_only=False)[order])
    cents_ref = ray.put(centroids)

    def add_cell(t: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        mat = _to_matrix(t[vec_col])
        if mat.shape[0]:
            d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cells = d.argmin(axis=1).astype(np.int32)
        else:
            cells = np.zeros(0, np.int32)
        return t.select([key_col, vec_col]).append_column(
            "cell", pa.array(cells, pa.int32()))

    new_ds.map_batches(add_cell, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"])
    return index_dir


def compact_ivf_index(index_dir: str, key_col: str = "vec_id") -> dict:
    """COMPACT an IVF layout after append-only ingestion — the
    maintenance op every uuid-file-appending index eventually needs
    (small-file proliferation is the classic lakehouse tax): each
    ``cell=`` partition's files are rewritten as ONE parquet file,
    sorted by ``key_col`` for byte determinism, via the same two-rename
    atomic swap as ``manifest.replace_partition`` (a crash between
    renames leaves the ``_old-`` copy; readers see the old or the new
    file set, never a mix).  Content is bit-equal before/after — the
    ``knn_ivf_compacted`` oracle pins it at the probe surface — EXCEPT
    rows tombstoned by :func:`delete_from_ivf_index`, which the rewrite
    physically drops before clearing ``_tombstones/`` (the clear
    happens strictly after every cell lands, so a crash at any point
    leaves a correct index — subtracting tombstones from
    already-cleaned cells is a no-op).

    Scale shape: one Ray task per cell (cells are independent), each
    reading only its own partition — compaction cost is proportional to
    the index, never the corpus, and cells compact in parallel; the
    deleted-key set is broadcast once via ``ray.put``.
    Returns ``{"cells", "files_before", "files_after",
    "rows_dropped"}``."""
    import glob as _glob
    import os
    import shutil
    import uuid as _uuid

    import ray

    from ocr_ray.state.tombstones import TOMBSTONE_DIR, read_tombstones

    cell_dirs = sorted(_glob.glob(os.path.join(index_dir, "cell=*")))
    files_before = sum(
        len(_glob.glob(os.path.join(d, "*.parquet"))) for d in cell_dirs)
    dead = read_tombstones(index_dir, key_col)
    dead_ref = ray.put(dead if dead is not None else np.zeros(0, np.int64))

    @ray.remote(num_cpus=1)
    def compact_cell(cell_dir: str) -> tuple:
        import pyarrow as pa_
        import pyarrow.parquet as pq

        pa_.set_cpu_count(1)
        files = sorted(_glob.glob(os.path.join(cell_dir, "*.parquet")))
        dd = ray.get(dead_ref)
        if not files or (len(files) <= 1 and not dd.size):
            return (len(files), 0)
        t = pa.concat_tables([pq.read_table(f) for f in files])
        dropped = 0
        if dd.size and t.num_rows:
            keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            di = np.searchsorted(dd, keys)
            di[di == dd.size] = 0
            alive = dd[di] != keys
            dropped = int(t.num_rows - alive.sum())
            t = t.filter(pa.array(alive))
        t = t.take(pa.compute.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        parent = os.path.dirname(cell_dir)
        base = os.path.basename(cell_dir)
        tmp = os.path.join(parent, f"_tmp-{base}-{_uuid.uuid4().hex}")
        os.makedirs(tmp)
        pq.write_table(t.combine_chunks(), os.path.join(tmp, "compact-0.parquet"))
        old = os.path.join(parent, f"_old-{base}-{_uuid.uuid4().hex}")
        os.rename(cell_dir, old)
        os.rename(tmp, cell_dir)
        shutil.rmtree(old, ignore_errors=True)
        return (1, dropped)

    res = ray.get([compact_cell.remote(d) for d in cell_dirs])
    # every cell rewritten — the tombstones are applied, clear them
    ts_dir = os.path.join(index_dir, TOMBSTONE_DIR)
    if os.path.isdir(ts_dir):
        old = ts_dir + f"-old-{_uuid.uuid4().hex}"
        os.rename(ts_dir, old)
        shutil.rmtree(old, ignore_errors=True)
    return {"cells": len(cell_dirs), "files_before": files_before,
            "files_after": int(sum(r[0] for r in res)),
            "rows_dropped": int(sum(r[1] for r in res))}


def pq_adc_search(ds, query_vec, k: int = 10, m_sub: int = 4,
                  k_cw: int = 16, n_iter: int = 2,
                  shortlist: int = 100, scale: int = 1_000_000):
    """PRODUCT-QUANTIZATION ADC SEARCH WITH EXACT RE-RANK (Jégou, Douze
    & Schmid 2011; the FAISS ``IndexRefine`` production shape): the
    embedding space splits into ``m_sub`` subspaces, each gets its own
    ``k_cw``-codeword codebook trained by the exact integer Lloyd core
    (:func:`_lloyd` — init = vec_id < k_cw prefix per subspace, ties to
    lowest cid); every vector encodes to m_sub one-byte codes;
    query-time Asymmetric Distance Computation sums per-subspace exact
    integer distances between the query sub-vector and each vector's
    codeword; the global ADC top-``shortlist`` candidates re-rank by
    EXACT integer L2 (computed batch-side for candidate rows only — the
    stored-vector refine step).  Returns the re-ranked top-k as
    ``(vec_id, adc_d, exact_d, in_exact)`` where ``in_exact`` marks
    membership in the exact top-k over the WHOLE corpus — the recall
    eval rides in the same result (raw ADC@10 recall is ~0.2 on the
    synthetic embeddings; the shortlist-100 refine recovers it).

    Integer discipline: micro-unit components (_r0 half-away), exact
    int64 distance sums everywhere — codebooks, codes, ADC table,
    refine and the exact baseline are all bit-reproducible by the
    unrolled-CTE oracle (the kmeans_embeddings precedent, per
    subspace).

    Scale shape: m_sub bounded Lloyd trainings (each a fixed-size-blob
    reduce; at 100 TB train the codebooks on a SAMPLE as
    build_ivf_index does — the unrolled oracle pins the exact-corpus
    path); one embarrassingly-parallel encode+ADC pass with the
    (m_sub × k_cw × sub) codebooks broadcast by value and per-batch
    local top-shortlist (exact refine distances computed only for
    those rows); the repartition(1) reduce holds `shortlist` rows.
    The exact baseline is the same bounded-top-k shape.  Encoded width
    is m_sub bytes/vector vs 4·dim — the 64× compression that makes
    corpus-in-RAM ANN possible at 10^12 vectors.
    """
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    dim = q.shape[0]
    sub = dim // m_sub
    q_iv = _r0(q * scale)

    def _float_list_column(mat: np.ndarray) -> pa.ListArray:
        n, d = mat.shape
        offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32),
                           pa.int32())
        return pa.ListArray.from_arrays(
            offsets, pa.array(mat.ravel(), pa.float64()))

    codebooks = []
    for m in range(m_sub):
        lo = m * sub

        def slicer(t: pa.Table, lo=lo) -> pa.Table:
            mat = _to_matrix(t["embedding"])[:, lo:lo + sub]
            return pa.table({"vec_id": t["vec_id"],
                             "embedding": _float_list_column(mat)})

        _, cents, _, _, _ = _lloyd(
            ds.map_batches(slicer, batch_format="pyarrow"),
            k_cw, n_iter, scale, "embedding", "vec_id")
        codebooks.append(cents)

    dts = np.stack([((q_iv[m * sub:(m + 1) * sub][None, :] - cb) ** 2).sum(1)
                    for m, cb in enumerate(codebooks)])  # (m_sub, k_cw)

    def exact_partial(t: pa.Table) -> pa.Table:
        iv = _r0(_to_matrix(t["embedding"]) * scale)
        d = ((iv - q_iv[None, :]) ** 2).sum(1)
        tab = pa.table({"vec_id": t["vec_id"],
                        "d": pa.array(d, pa.int64())})
        idx = pc.sort_indices(tab, sort_keys=[("d", "ascending"),
                                              ("vec_id", "ascending")])[:k]
        return tab.take(idx)

    def exact_final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("d", "ascending"),
                                            ("vec_id", "ascending")])[:k]
        return t.take(idx)

    exact_ids = frozenset(
        ds.map_batches(exact_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(exact_final, batch_format="pyarrow",
                     batch_size=None)
        .to_pandas()["vec_id"])

    def adc_partial(t: pa.Table) -> pa.Table:
        iv = _r0(_to_matrix(t["embedding"]) * scale)
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        adc = np.zeros(len(iv), dtype=np.int64)
        for m, cb in enumerate(codebooks):
            codes = _assign_int(iv[:, m * sub:(m + 1) * sub], cb)
            adc += dts[m][codes]
        keep = np.lexsort((vids, adc))[:shortlist]
        exact = ((iv[keep] - q_iv[None, :]) ** 2).sum(1)
        return pa.table({"vec_id": pa.array(vids[keep], pa.int64()),
                         "adc_d": pa.array(adc[keep], pa.int64()),
                         "exact_d": pa.array(exact, pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("adc_d", "ascending"),
                                            ("vec_id", "ascending")])[:shortlist]
        cand = t.take(idx)
        idx = pc.sort_indices(cand, sort_keys=[("exact_d", "ascending"),
                                               ("vec_id", "ascending")])[:k]
        out = cand.take(idx)
        flags = [1 if v in exact_ids else 0
                 for v in out["vec_id"].to_pylist()]
        return out.append_column("in_exact", pa.array(flags, pa.int64()))

    return (ds.map_batches(adc_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def mmr_diverse_rerank(ds, query_vec, k: int = 10, m: int = 50):
    """MAXIMAL MARGINAL RELEVANCE diversified re-rank (Carbonell &
    Goldstein, SIGIR'98) — the standard post-retrieval diversifier:
    select k results greedily maximizing ``λ·rel(d) − (1−λ)·max_{s∈S}
    sim(d, s)`` with λ = 0.7, so near-duplicate hits are pushed down in
    favor of novel ones.  Integer discipline: rel and pairwise cosine
    are rounded to MICRO-units (half-away, DuckDB ROUND parity) before
    any comparison, and the MMR score is the exact integer
    ``7·rel_micro − 3·maxsim_micro`` (λ ×10) — Ray == SQL bit for bit.
    Returns k rows ``(mmr_rank, vec_id, rel_micro, maxsim_micro,
    mmr_score)``.

    Scale shape: stage 1 is the knn_cosine distributed shortlist
    (per-batch top-m by (rel desc, vec_id), ONE repartition(1) merge —
    the driver sees exactly m rows WITH their vectors); stage 2 is the
    greedy k-step loop over the m×m integer sim matrix, pure driver
    arithmetic on m² ints (m=50 → 2500).  The corpus is scanned once,
    never shuffled.
    """
    import ray

    def _ha_i64(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    q = np.asarray(query_vec, dtype=np.float64)
    q_ref = ray.put(q)

    def partial_topm(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        mat = _to_matrix(batch["embedding"])
        if mat.shape[0] == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "rel_micro": pa.array([], pa.int64()),
                             "embedding": batch["embedding"][:0]})
        rel = _ha_i64(1e6 * _cosine(mat, qv))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -rel))[:m]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "rel_micro": pa.array(rel[order], pa.int64()),
            "embedding": pc.take(batch["embedding"],
                                 pa.array(order, pa.int64())),
        })

    def final_topm(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("rel_micro", "descending"),
                                            ("vec_id", "ascending")])[:m]
        return t.take(idx)

    short = pa.concat_tables(ray.get(
        ds.map_batches(partial_topm, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topm, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs()))
    n = short.num_rows
    ids = short["vec_id"].to_numpy(zero_copy_only=False)
    rel_u = short["rel_micro"].to_numpy(zero_copy_only=False)
    mat = _to_matrix(short["embedding"])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    # dot / (|a|·|b|), the list_cosine_similarity op order
    sims = _ha_i64(1e6 * ((mat @ mat.T)
                          / (norms[:, None] * norms[None, :])))

    avail = np.ones(n, dtype=bool)
    maxsim = np.zeros(n, dtype=np.int64)
    rows = {"mmr_rank": [], "vec_id": [], "rel_micro": [],
            "maxsim_micro": [], "mmr_score": []}
    for rank in range(1, min(k, n) + 1):
        score = 7 * rel_u - 3 * maxsim
        cand = np.nonzero(avail)[0]
        pick = cand[np.lexsort((ids[cand], -score[cand]))[0]]
        rows["mmr_rank"].append(rank)
        rows["vec_id"].append(int(ids[pick]))
        rows["rel_micro"].append(int(rel_u[pick]))
        rows["maxsim_micro"].append(int(maxsim[pick]))
        rows["mmr_score"].append(int(score[pick]))
        avail[pick] = False
        maxsim = np.maximum(maxsim, sims[:, pick])
    return pa.table({c: pa.array(v, pa.int64())
                     for c, v in rows.items()})
