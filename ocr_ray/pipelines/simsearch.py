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

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(["sim", key_col], ascending=[False, True]).head(k)
    return pa.table(
        {
            key_col: pa.array(partials[key_col].to_numpy(), pa.int64()),
            "sim": pa.array(partials["sim"].to_numpy(), pa.float64()),
        }
    )


_LSH_BITS = 8
_LSH_PLANES: dict[int, np.ndarray] = {}


def _planes(dim: int) -> np.ndarray:
    if dim not in _LSH_PLANES:
        _LSH_PLANES[dim] = np.random.RandomState(7).standard_normal((_LSH_BITS, dim))
    return _LSH_PLANES[dim]


def lsh_bucket(mat: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per row (uint16)."""
    planes = _planes(mat.shape[1])
    bits = (mat @ planes.T) > 0
    return (bits @ (1 << np.arange(_LSH_BITS))).astype(np.int32)


def knn_lsh(ds, query_vec, k: int = 10,
            vec_col: str = "embedding", key_col: str = "vec_id"):
    """Approximate top-k: filter to the query's LSH bucket inside
    map_batches (no shuffle at all), then brute-force within the bucket.
    At 100 TB the bucket column becomes the partition key so only one
    partition is read per query."""
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

    partials = ds.map_batches(bucket_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(["sim", key_col], ascending=[False, True]).head(k)
    return pa.table(
        {
            key_col: pa.array(partials[key_col].to_numpy(), pa.int64()),
            "sim": pa.array(partials["sim"].to_numpy(), pa.float64()),
        }
    )


def embedding_near_dup(ds, threshold: float = 0.35,
                       vec_col: str = "embedding", key_col: str = "vec_id"):
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥
    threshold, sim rounded to 6 dp).

    The full (normalized) matrix is broadcast once via ray.put and each
    batch matmuls against it — exact, SQL-verifiable.  At corpus scale the
    broadcast side is replaced by LSH-bucket co-partitioning (knn_lsh's
    bucket column as the groupby key); this exact path is the oracle-
    checkable baseline.
    """
    import ray

    full = ds.to_pandas()
    ids_all = full[key_col].to_numpy().astype(np.int64)
    mat_all = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat_all, axis=1)
    norms[norms == 0] = 1.0
    mat_all = mat_all / norms[:, None]
    ref = ray.put((ids_all, mat_all))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_a, mat = ray.get(ref)
        sub = _to_matrix(batch[vec_col])
        n = np.linalg.norm(sub, axis=1)
        n[n == 0] = 1.0
        sub = sub / n[:, None]
        ids_b = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = np.round(sub @ mat.T, 6)
        bi, ai = np.nonzero((sims >= threshold) & (ids_b[:, None] < ids_a[None, :]))
        return pa.table(
            {
                "id_a": pa.array(ids_b[bi], pa.int64()),
                "id_b": pa.array(ids_a[ai], pa.int64()),
                "sim": pa.array(sims[bi, ai], pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


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

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    top = (
        partials.sort_values(["query_id", "sim", key_col],
                             ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    return pa.table({
        "query_id": pa.array(top["query_id"].to_numpy(), pa.int64()),
        key_col: pa.array(top[key_col].to_numpy(), pa.int64()),
        "sim": pa.array(top["sim"].to_numpy(), pa.float64()),
    })


def _kmeans_lite(sample: np.ndarray, n_clusters: int, n_iter: int = 10) -> np.ndarray:
    """Deterministic k-means (fixed seed init, fixed iterations) for the
    IVF coarse quantizer — runs driver-side on a sample, centroids are a
    pure function of the sample."""
    rng = np.random.RandomState(11)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    centroids = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def knn_ivf(ds, query_vec, k: int = 10, n_clusters: int = 16, n_probe: int = 2,
            vec_col: str = "embedding", key_col: str = "vec_id",
            train_sample: int = 2048):
    """IVF approximate top-k: a k-means coarse quantizer (trained on a
    driver-side sample, centroids broadcast once) assigns every vector to
    its nearest centroid; the query searches only its ``n_probe`` nearest
    cells.  At corpus scale the cell id becomes the partition key so only
    n_probe partitions are read per query (the inverted-file layout)."""
    import ray

    sample_tbl = ds.limit(train_sample).to_pandas()
    sample = np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    centroids = _kmeans_lite(sample, n_clusters)

    q = np.asarray(query_vec, dtype=np.float64)
    qd = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe_cells = set(np.argsort(qd)[:n_probe].tolist())
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

    partials = ds.map_batches(cell_topk, batch_format="pyarrow").to_pandas()
    partials = partials.sort_values(["sim", key_col], ascending=[False, True]).head(k)
    return pa.table({
        key_col: pa.array(partials[key_col].to_numpy(), pa.int64()),
        "sim": pa.array(partials["sim"].to_numpy(), pa.float64()),
    })
