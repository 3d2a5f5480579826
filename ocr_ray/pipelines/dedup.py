"""Deduplication operators over a document corpus (training-data ops).

All are Ray-Data-native restatements of the reference's keep-first dedup
semantics (combine_extractions.py:45-53, SURVEY.md §2 J2) lifted to corpus
scale:

* exact dedup      — content-hash partition + per-group first
* MinHash + LSH    — shingle → minhash sig → band/bucket groupby → verify
* SimHash          — 64-bit weighted token hash + chunk-bucket candidates
* n-gram Jaccard   — exact verification kernel used by both near-dup paths

Shuffle story (100 TB): the wide ops are (a) groupbys on short hash keys
(content hash, (band, band_hash), simhash chunk) — never on raw text, (b) a
pair-key groupby for distributed pair dedup, (c) two co-partitioned hash
joins that attach texts to candidate pairs for exact verification, and (d)
the O(log d) label-propagation rounds of distributed connected components
(pipelines.graph).  Signatures are computed embarrassingly parallel inside
map_batches with partial aggregation before every shuffle; nothing
corpus-sized (pairs, texts, components) ever reaches the driver.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.config import DEFAULT_CONFIG, PipelineConfig
from ocr_ray.functions.textstats import md5_fingerprint

# MinHash parameters (fixed, seeded — deterministic across runs/processes)
_MERSENNE = (1 << 61) - 1
_N_PERM = 64
_N_BANDS = 16          # 16 bands x 4 rows: ~0.8 jaccard threshold knee
_ROWS_PER_BAND = _N_PERM // _N_BANDS
_SHINGLE_W = 3         # word 3-grams

_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.uint64)
_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.uint64)


def shingle_hashes(text: str, w: int = _SHINGLE_W) -> np.ndarray:
    """md5-lower-64 hashes of word w-grams (uint64, deduplicated).

    The hash is bit-for-bit DuckDB's ``md5_number_lower`` (digest bytes
    8..16 little-endian) so the SQL oracle recomputes identical shingle
    sets, signatures and Jaccard verdicts."""
    words = text.lower().split()
    if len(words) < w:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + w]) for i in range(len(words) - w + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[8:16], "little")
             for g in grams),
            dtype=np.uint64, count=len(grams),
        )
    )


def minhash_signature(text: str) -> np.ndarray:
    """64-perm MinHash signature (uint64); empty text → all-max sentinel."""
    h = shingle_hashes(text)
    if h.size == 0:
        return np.full(_N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    # (a*h + b) mod p for each permutation, vectorized: perms x shingles
    vals = (_A[:, None] * h[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def band_rows(doc_id: int, sig: np.ndarray) -> list[tuple[int, int, str]]:
    """Explode one signature into (band_id, doc_id, band_hash) rows.

    band_hash = md5 of the '-'-joined decimal minhash values — string
    form, so SQL recomputes it with concat_ws + md5."""
    out = []
    for b in range(_N_BANDS):
        chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
        key = "-".join(str(int(v)) for v in chunk)
        out.append((b, doc_id, hashlib.md5(key.encode()).hexdigest()[:16]))
    return out


def jaccard(text_a: str, text_b: str, w: int = _SHINGLE_W) -> float:
    """Exact n-gram Jaccard (the verification kernel)."""
    ha, hb = shingle_hashes(text_a, w), shingle_hashes(text_b, w)
    if ha.size == 0 and hb.size == 0:
        return 1.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = ha.size + hb.size - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (md5-derived token hashes)."""
    words = text.lower().split()
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for wd in set(words):
        hv = int.from_bytes(hashlib.md5(wd.encode("utf-8")).digest()[:8], "little")
        weight = words.count(wd)
        bits = np.unpackbits(
            np.frombuffer(hv.to_bytes(8, "little"), dtype=np.uint8), bitorder="little"
        ).astype(np.int64)
        acc += (bits * 2 - 1) * weight
    out = np.packbits((acc > 0).astype(np.uint8), bitorder="little").tobytes()
    return int.from_bytes(out, "little")


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Distributed pair helpers (shared by the near-dup family)
# ---------------------------------------------------------------------------

def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a full-avalanche integer mix (public-domain
    constants, Steele et al. 2014).  Vectorized; uint64 wrap-around is the
    intended modular arithmetic."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def pair_bucket(t: pa.Table, n_buckets: int) -> pa.Table:
    """Append a SKEW-PROOF shuffle bucket column ``pbucket`` for
    (id_a, id_b) pair rows: a splitmix64 mix of both ids, so adversarial
    id distributions (e.g. every id ≡ 0 mod 8) still spread uniformly —
    unlike low-bit bucketing, which collapses them onto one bucket."""
    a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = _mix64(a ^ _mix64(b + np.uint64(0x9E3779B97F4A7C15)))
    return t.append_column(
        "pbucket", pa.array((h % np.uint64(n_buckets)).astype(np.int32), pa.int32())
    )


def dedupe_pairs(pairs, extra_cols: tuple[str, ...] = (),
                 n_buckets: int | None = None):
    """Distinct (id_a, id_b) rows via a coarse-bucket groupby on a pair
    hash — the same pair surfaces from several bands/chunks/buckets.
    O(pairs) distributed, nothing reaches the driver, and the per-bucket
    dedup is one vectorized pandas call (never one map_groups dispatch
    per pair — Ray's per-group overhead is ~10-20ms).  The bucket is a
    splitmix64 pair hash (see :func:`pair_bucket`), immune to id-
    distribution skew."""
    import pandas as pd

    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.pair_dedup_buckets
    cols = ["id_a", "id_b", *extra_cols]

    def drop_dups(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"])[cols]

    return (
        pairs.map_batches(lambda t: pair_bucket(t, n_buckets),
                          batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(drop_dups, batch_format="pandas")
        # sort partitions holding no group emit SCHEMA-LESS empty blocks
        # that crash any later join (acero FieldRef); repartition coalesces
        # them away.  16 output blocks is plenty for the pair-set size.
        .repartition(16)
    )


FUSE_PAIRS = DEFAULT_CONFIG.fuse_pairs_threshold
# size-adaptive fusion threshold: below this, the
# verify+union-find tail of a near-dup run fits ONE worker task, and the
# multi-second fixed costs of the two hash joins + the CC execution never
# amortize — same trick as graph.connected_components's
# small_graph_edges, one level up.  Memory bound for the fused task:
# texts for <= 2*FUSE_PAIRS candidate docs (~2 GB at 50 KB/page web
# docs); above it the distributed joins keep per-task memory flat.


def _fused_verify_cc(pair_tbl: pa.Table, threshold: float, key_col: str,
                     text_col: str, *text_blocks: pa.Table) -> pa.Table:
    """One-task tail for small pair sets: dedup pairs, exact-Jaccard
    verify against the (small) candidate text set, then min-label
    union-find — byte-identical semantics to the distributed
    dedupe_pairs → verify_pairs_jaccard → connected_components chain."""
    texts: dict[int, str] = {}
    for blk in text_blocks:
        for did, txt in zip(blk[key_col].to_pylist(), blk[text_col].to_pylist()):
            texts[int(did)] = txt or ""

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    seen: set[tuple[int, int]] = set()
    for ia, ib in zip(pair_tbl["id_a"].to_pylist(), pair_tbl["id_b"].to_pylist()):
        key = (int(ia), int(ib))
        if key in seen:
            continue
        seen.add(key)
        if jaccard(texts.get(key[0], ""), texts.get(key[1], "")) >= threshold:
            ra, rb = find(key[0]), find(key[1])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    members = sorted(m for m in parent)
    return pa.table({
        key_col: pa.array(members, pa.int64()),
        "dup_of": pa.array([find(m) for m in members], pa.int64()),
    })


def verify_pairs_jaccard(pairs, ds, text_col: str = "text",
                         key_col: str = "doc_id", threshold: float = 0.8,
                         num_partitions: int | None = None):
    """Exact n-gram-Jaccard verification of candidate pairs.

    Texts are attached by TWO co-partitioned hash joins on doc_id (pairs ⋈
    docs on id_a, then on id_b) — the corpus is shuffled by its key, the
    pair set stays the small side, and no driver-side text dict exists
    (round-1's scale defect).  Returns the verified (id_a, id_b) Dataset.

    ``num_partitions`` defaults to min(16, cluster CPUs): each join
    spawns a pool of hash-shuffle aggregator actors per partition, and
    on a small cluster a 16-way pool starves the rest of the DAG into a
    resource deadlock (measured at num_cpus=4).  At corpus scale pass
    it explicitly so a partition ≈ one task's memory budget."""
    if num_partitions is None:
        import ray
        cpus = (int(ray.cluster_resources().get("CPU", 16))
                if ray.is_initialized() else 16)
        num_partitions = max(2, min(16, cpus))
    docs = ds.map_batches(
        lambda t: t.select([key_col, text_col]), batch_format="pyarrow"
    )
    with_a = pairs.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("id_a",), right_on=(key_col,),
    ).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b", "text_a"]),
        batch_format="pyarrow",
    # a sparse first join emits SCHEMA-LESS empty blocks that crash the
    # second join in acero (FieldRef id_b); repartition coalesces them
    # away (the dedupe_pairs convention, CLAUDE.md sharp edge)
    ).repartition(num_partitions)
    with_ab = with_a.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("id_b",), right_on=(key_col,),
    )

    def verify(t: pa.Table) -> pa.Table:
        keep = [
            i
            for i, (ta, tb) in enumerate(
                zip(t["text_a"].to_pylist(), t[text_col].to_pylist())
            )
            if jaccard(ta or "", tb or "") >= threshold
        ]
        sub = t.take(pa.array(keep, pa.int64()))
        return sub.select(["id_a", "id_b"])

    return with_ab.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id"):
    """Hash-partition on content hash + per-group first (min key).

    Returns one row per distinct content: (fingerprint, keep_<key>, n_copies).
    The shuffle key is the 32-hex md5, never the text (J2 at scale).
    """
    def add_fp(batch: pa.Table) -> pa.Table:
        fp = md5_fingerprint(batch[text_col])
        # coarse shuffle bucket from the hash prefix: the per-fingerprint
        # keep-first is a vectorized pandas groupby INSIDE each bucket
        # (one Ray group dispatch per bucket, not per distinct content)
        bucket = pc.utf8_slice_codeunits(fp, 0, 2)
        return pa.table(
            {
                "fingerprint": fp,
                key_col: batch[key_col],
                "bucket": bucket,
            }
        )

    def first_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("fingerprint", as_index=False).agg(
            **{"keep_" + key_col: (key_col, "min"),
               "n_copies": (key_col, "size")}
        )
        out["n_copies"] = out["n_copies"].astype(np.int64)
        return out

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_per_bucket, batch_format="pandas")
    )


def minhash_near_dup(ds, text_col: str = "text", key_col: str = "doc_id",
                     threshold: float = 0.8,
                     cfg: PipelineConfig = DEFAULT_CONFIG):
    """MinHash+LSH near-duplicate detection.

    map_batches (signatures, embarrassingly parallel)
      → explode to (band_id, band_hash, doc_id) rows   [16 rows/doc]
      → groupby (band_id, band_hash)                    [the only shuffle]
      → candidate pairs within buckets
      → distributed pair dedup (groupby on the pair key)
      → exact Jaccard verify (co-partitioned joins of texts onto pairs)
      → distributed connected components (pipelines.graph)

    Size-adaptive tail: when the candidate pair set is <= FUSE_PAIRS, the
    dedup+verify+CC steps fuse into ONE Ray task (``_fused_verify_cc``)
    fed by a broadcast-filtered candidate text scan — identical semantics,
    none of the shuffle/join fixed costs.

    Returns (doc_id, dup_of) rows: every doc that belongs to a verified
    near-dup pair, pointing at the smallest doc_id of its group (keep-first).
    """
    n_buckets = cfg.near_dup_coarse_buckets
    # shuffle key cardinality: few, fat groups — Ray's per-group overhead
    # dominates with one group per (band, hash); exact band hashes are
    # grouped with vectorized pandas INSIDE each bucket.  At corpus scale
    # raise this so a bucket ≈ one task's memory budget.

    def to_bands(batch: pa.Table) -> pa.Table:
        return _to_band_table(batch, text_col, key_col, n_buckets)

    MAX_BUCKET = cfg.near_dup_max_bucket
    # a degenerate bucket (boilerplate-identical docs) would emit O(k^2)
    # pairs; cap and pair against the bucket minimum instead — keep-first
    # semantics still links every member to one group

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a: list[int] = []
        b: list[int] = []
        for _, grp in g.groupby(["band_id", "band_hash"], sort=True):
            ids = sorted(grp[key_col].tolist())
            if len(ids) < 2:
                continue
            if len(ids) > MAX_BUCKET:
                head = ids[0]
                for j in ids[1:]:
                    a.append(head)
                    b.append(j)
            else:
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        a.append(ids[i])
                        b.append(ids[j])
        return pd.DataFrame({"id_a": np.array(a, dtype=np.int64),
                             "id_b": np.array(b, dtype=np.int64)})

    import ray

    raw_pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    ).materialize()
    n_raw = raw_pairs.count()   # upper bound: same pair fires from
    if n_raw == 0:              # several bands (<= 16 copies)
        return pa.table({key_col: pa.array([], pa.int64()),
                         "dup_of": pa.array([], pa.int64())})

    if n_raw <= cfg.fuse_pairs_threshold:
        # size-adaptive tail: the whole dedup+verify+CC fits one task —
        # skip the pair-dedup shuffle, the two verify joins and the CC
        # execution (each carries multi-second Ray fixed costs that only
        # amortize at corpus scale).  The driver holds only the pair ids
        # (<= FUSE_PAIRS rows of 2 ints); candidate texts go object-store
        # block ref → task, never through the driver.
        blocks = [t for t in ray.get(raw_pairs.to_arrow_refs())
                  if t.num_columns and t.num_rows]
        pair_tbl = pa.concat_tables(blocks)
        cand = pa.array(
            sorted(set(pair_tbl["id_a"].to_pylist())
                   | set(pair_tbl["id_b"].to_pylist())),
            pa.int64(),
        )
        cand_ref = ray.put(cand)

        def pick(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t[key_col], value_set=ray.get(cand_ref))
            return t.filter(keep).select([key_col, text_col])

        text_refs = ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs()
        task = ray.remote(num_cpus=1)(_fused_verify_cc)
        return ray.get(task.remote(pair_tbl, threshold, key_col, text_col,
                                   *text_refs))

    # distributed pair dedup (coarse-bucket groupby on a pair hash — still
    # O(pairs), no driver), then exact-Jaccard verify via co-partitioned
    # joins of texts onto pairs keyed by doc_id (text travels once per
    # pair side, never broadcast)
    pairs = dedupe_pairs(raw_pairs).materialize()
    verified = verify_pairs_jaccard(pairs, ds, text_col=text_col,
                                    key_col=key_col, threshold=threshold)

    # distributed connected components (keep-first: label = component min)
    from ocr_ray.pipelines.graph import connected_components

    return connected_components(verified, key_col=key_col, label_col="dup_of")


def simhash_table(ds, text_col: str = "text", key_col: str = "doc_id"):
    """(doc_id, simhash-hex) per row — per-batch stateless map."""
    def add_sh(batch: pa.Table) -> pa.Table:
        ids = batch[key_col]
        hs = [format(simhash64(t or ""), "016x") for t in batch[text_col].to_pylist()]
        return pa.table({key_col: ids, "simhash": pa.array(hs, pa.string())})

    return ds.map_batches(add_sh, batch_format="pyarrow")


def simhash_near_dup(ds, text_col: str = "text", key_col: str = "doc_id",
                     max_hamming: int = 3,
                     cfg: PipelineConfig = DEFAULT_CONFIG):
    """SimHash near-dup: bucket on each of four 16-bit chunks (a pair within
    hamming<=3 of 64 bits shares at least one exact 16-bit chunk), verify
    hamming distance within buckets.  Returns (doc_id, dup_of)."""
    n_buckets = cfg.near_dup_coarse_buckets
    # coarse shuffle key (like the minhash path): exact (chunk_id, chunk)
    # groups are formed INSIDE each bucket with vectorized pandas, never
    # one Ray map_groups dispatch per chunk value

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids, chunks, chunk_ids, sims = [], [], [], []
        for did, txt in zip(batch[key_col].to_pylist(), batch[text_col].to_pylist()):
            sh = simhash64(txt or "")
            for c in range(4):
                ids.append(did)
                chunk_ids.append(c)
                chunks.append((sh >> (16 * c)) & 0xFFFF)
                sims.append(sh)
        return pa.table({
            key_col: pa.array(ids, pa.int64()),
            "chunk_id": pa.array(chunk_ids, pa.int32()),
            "chunk": pa.array(chunks, pa.int32()),
            "sh": pa.array([format(s, "016x") for s in sims], pa.string()),
            "bucket": pa.array(
                [(c * 65536 + v) % n_buckets for c, v in zip(chunk_ids, chunks)],
                pa.int32(),
            ),
        })

    MAX_BUCKET = cfg.near_dup_max_bucket
    # a degenerate bucket (e.g. every empty doc has
    # simhash 0, so all four chunks collide) would emit O(k^2) pairs —
    # same star-pairing cap as the minhash path: members pair against the
    # bucket minimum only.  NOTE: this is an APPROXIMATION, not
    # semantics-preserving in general — two members within hamming<=3 of
    # each other but not both within 3 of the bucket minimum lose their
    # pair, so components can split vs the uncapped spec.  The SQL oracle
    # mirrors the cap exactly, so parity holds by construction.

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for _, grp in g.groupby(["chunk_id", "chunk"], sort=True):
            rows = grp.drop_duplicates(subset=[key_col]).sort_values(key_col)
            ids = rows[key_col].tolist()
            if len(ids) < 2:
                continue
            shs = [int(s, 16) for s in rows["sh"].tolist()]
            if len(ids) > MAX_BUCKET:
                h0 = shs[0]
                for j in range(1, len(ids)):
                    if hamming64(h0, shs[j]) <= max_hamming:
                        a.append(ids[0]); b.append(ids[j])
            else:
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        if hamming64(shs[i], shs[j]) <= max_hamming:
                            a.append(ids[i]); b.append(ids[j])
        return pd.DataFrame({"id_a": np.array(a, dtype=np.int64),
                             "id_b": np.array(b, dtype=np.int64)})

    pairs = (
        ds.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    ).materialize()
    # pairs are already hamming-verified inside the buckets.  Union-find
    # is idempotent under duplicate pairs, so below the single-task CC
    # threshold the pair-dedup shuffle is pure fixed cost — skip it and
    # let connected_components' repartition(1) path absorb the (<= 4x
    # duplicated) raw pairs; at scale dedupe first so the CC label
    # shuffles don't carry 4 copies of every edge.
    from ocr_ray.pipelines.graph import connected_components

    if pairs.count() > cfg.fuse_pairs_threshold:
        pairs = dedupe_pairs(pairs)
    return connected_components(pairs, key_col=key_col, label_col="dup_of")


def winnow_near_dup(ds, text_col: str = "text", key_col: str = "doc_id",
                    k: int = 16, min_shared: int = 8,
                    cfg: PipelineConfig = DEFAULT_CONFIG):
    """Rolling-hash (winnowing) near-copy detection: docs → fingerprint
    rows → groupby fingerprint (the inverted-index shuffle; short hash key,
    never text) → candidate pairs → keep pairs sharing >= min_shared
    fingerprints.  Returns (id_a, id_b, shared) pairs.
    """
    from ocr_ray.functions.textstats import winnow_fingerprint

    n_buckets = cfg.near_dup_coarse_buckets
    max_postings = cfg.winnow_max_postings

    def to_fps(batch: pa.Table) -> pa.Table:
        ids_out, fps = [], []
        for did, txt in zip(batch[key_col].to_pylist(), batch[text_col].to_pylist()):
            for fp in winnow_fingerprint(txt or "", k=k):
                ids_out.append(did)
                fps.append(fp)
        return pa.table({
            key_col: pa.array(ids_out, pa.int64()),
            "fp": pa.array(fps, pa.uint64()),
            "bucket": pa.array([f % n_buckets for f in fps], pa.int32()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # partial pre-aggregation: count shared fingerprints per pair
        # WITHIN the bucket so the pair-key shuffle carries one row per
        # (bucket, pair) instead of one per shared fingerprint
        a, b = [], []
        for _, grp in g.groupby("fp", sort=True):
            ids = sorted(set(grp[key_col].tolist()))
            if len(ids) < 2 or len(ids) > max_postings:
                continue   # drop degenerate fingerprints (boilerplate)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i]); b.append(ids[j])
        part = pd.DataFrame({"id_a": np.array(a, dtype=np.int64),
                             "id_b": np.array(b, dtype=np.int64)})
        if len(part) == 0:
            return part.assign(shared=np.array([], dtype=np.int64))
        out = part.groupby(["id_a", "id_b"], as_index=False).size()
        return out.rename(columns={"size": "shared"})

    # Distributed pair-count: NEVER a Ray hash/sort aggregate keyed on the
    # raw pair — with ~10^6 distinct pairs this Ray version's
    # groupby(keys).aggregate(Sum) measured 215 s at sf0.1 (vs ~5 s for
    # everything else).  Instead shuffle once on a coarse bucket of the
    # pair key (all rows of a pair land in one bucket, so the per-bucket
    # pandas sum IS the global sum) and apply the min_shared filter inside
    # the bucket, shrinking output before it leaves the task.  The bucket
    # is the skew-proof splitmix64 pair hash (see pair_bucket).
    def sum_filter(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["id_a", "id_b"], as_index=False)["shared"].sum()
        out["shared"] = out["shared"].astype(np.int64)
        return out[out["shared"] >= min_shared]

    return (
        ds.map_batches(to_fps, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(lambda t: pair_bucket(t, cfg.pair_dedup_buckets),
                     batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(sum_filter, batch_format="pandas")
    )


def ngram_jaccard_near_dup(ds, text_col: str = "text", key_col: str = "doc_id",
                           w: int = _SHINGLE_W,
                           threshold_pct: int | None = None,
                           cfg: PipelineConfig = DEFAULT_CONFIG):
    """EXACT n-gram Jaccard near-dup pairs — the deterministic sibling of
    :func:`minhash_near_dup` (same word-w-gram md5-lower-64 shingles, no
    signature approximation).  Returns (id_a, id_b, shared, n_a, n_b) for
    every pair whose distinct-shingle Jaccard >= threshold_pct/100.

    Key identity making this exact WITHOUT an O(N^2) all-pairs pass:
    jaccard(A, B) = shared / (|A| + |B| - shared), so an inverted index on
    shingle hashes (the same topology as winnow_near_dup's fingerprint
    index) yields `shared` per candidate pair, and each posting row
    carries its doc's distinct-shingle count so |A|, |B| ride along for
    free.  The threshold test is integer cross-multiplication
    (shared * 100 >= pct * union) — float-free, hash-stable vs the oracle.

    Scale shape (all shuffles on short int keys, never text):
      1. map_batches: doc → (doc_id, h, n) posting rows, bucket = h % B —
         every posting of a hash lands in ONE bucket, so per-bucket doc
         frequency IS global frequency;
      2. groupby(bucket): per-hash pairing with the degenerate-shingle
         drop (df > ngram_max_postings → boilerplate, skip — mirrored by
         the oracle), pair counts pre-aggregated inside the bucket;
      3. pair_bucket shuffle + per-bucket vectorized sum + the threshold
         filter pushed inside (never a Ray groupby(pair).aggregate —
         see winnow_near_dup's 215 s note).
    Reference semantics: the dedup family of SURVEY §2 J2/LLM-ops; exact
    counterpart to the verify kernel at :func:`jaccard`.
    """
    if threshold_pct is None:
        threshold_pct = cfg.ngram_jaccard_threshold_pct
    n_buckets = cfg.near_dup_coarse_buckets
    max_postings = cfg.ngram_max_postings

    def to_postings(batch: pa.Table) -> pa.Table:
        ids_out, hs, ns = [], [], []
        for did, txt in zip(batch[key_col].to_pylist(), batch[text_col].to_pylist()):
            h = shingle_hashes(txt or "", w)
            if h.size == 0:
                continue
            ids_out.extend([did] * h.size)
            hs.append(h)
            ns.extend([h.size] * h.size)
        hcat = np.concatenate(hs) if hs else np.zeros(0, dtype=np.uint64)
        return pa.table({
            key_col: pa.array(ids_out, pa.int64()),
            "h": pa.array(hcat, pa.uint64()),
            "n": pa.array(ns, pa.int64()),
            "bucket": pa.array(
                (hcat % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, na, nb = [], [], [], []
        for _, grp in g.groupby("h", sort=True):
            rows = sorted(zip(grp[key_col].tolist(), grp["n"].tolist()))
            if len(rows) < 2 or len(rows) > max_postings:
                continue
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    a.append(rows[i][0]); b.append(rows[j][0])
                    na.append(rows[i][1]); nb.append(rows[j][1])
        part = pd.DataFrame({"id_a": np.array(a, dtype=np.int64),
                             "id_b": np.array(b, dtype=np.int64),
                             "n_a": np.array(na, dtype=np.int64),
                             "n_b": np.array(nb, dtype=np.int64)})
        if len(part) == 0:
            return part.assign(shared=np.array([], dtype=np.int64))
        out = part.groupby(["id_a", "id_b", "n_a", "n_b"], as_index=False).size()
        return out.rename(columns={"size": "shared"})

    def sum_filter(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["id_a", "id_b", "n_a", "n_b"], as_index=False)["shared"].sum()
        out["shared"] = out["shared"].astype(np.int64)
        union = out["n_a"] + out["n_b"] - out["shared"]
        out = out[out["shared"] * 100 >= threshold_pct * union]
        return out[["id_a", "id_b", "shared", "n_a", "n_b"]]

    return (
        ds.map_batches(to_postings, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(lambda t: pair_bucket(t, cfg.pair_dedup_buckets),
                     batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(sum_filter, batch_format="pandas")
    )


def _drop_ids_ref(labels, key_col: str = "doc_id",
                  label_col: str = "dup_of",
                  include_representatives: bool = False):
    """ObjectRef → sorted int64 numpy array of NON-representative doc ids
    (``label != id``) from a (key, label) cluster labeling — or of ALL
    labeled ids when ``include_representatives`` (the flagged-doc set, for
    method-agreement evaluation).  Id-only blocks are reduced worker-side
    and merge-sorted in ONE Ray task — the driver never holds the id set;
    readers ``ray.get`` the ref zero-copy per node.
    """
    import ray

    if isinstance(labels, pa.Table):
        if include_representatives:
            kept = labels
        else:
            mask = pc.invert(pc.equal(labels[key_col], labels[label_col]))
            kept = labels.filter(mask)
        arr = kept[key_col].to_numpy(zero_copy_only=False)
        return ray.put(np.sort(arr.astype(np.int64)))

    def ids_only(t: pa.Table) -> pa.Table:
        if include_representatives:
            kept = t
        else:
            kept = t.filter(pc.invert(pc.equal(t[key_col], t[label_col])))
        return pa.table({key_col: pc.cast(kept[key_col], pa.int64())})

    refs = labels.map_batches(ids_only, batch_format="pyarrow").to_arrow_refs()

    @ray.remote(num_cpus=1)
    def merge(*blocks):
        parts = [b[key_col].to_numpy(zero_copy_only=False)
                 for b in blocks if b.num_columns and b.num_rows]
        if not parts:
            return np.zeros(0, np.int64)
        return np.sort(np.concatenate(parts).astype(np.int64))

    return merge.remote(*refs)


def near_dup_filter(ds, labels=None, text_col: str = "text",
                    key_col: str = "doc_id", threshold: float = 0.8,
                    cfg: PipelineConfig = DEFAULT_CONFIG):
    """The corpus that SURVIVES fuzzy dedup — keep ONE representative (the
    min doc_id, keep-first) per near-dup cluster and pass every unclustered
    doc through unchanged.  This is the reference's filter-then-keep step
    (policy_filter.py:180-212) applied to near-dup cluster labels instead
    of page predicates: ``labels`` (from :func:`minhash_near_dup` by
    default, or any (key, dup_of) labeling such as
    ``ngram_jaccard_near_dup`` pairs run through connected_components)
    mark cluster members; min-id per component is the survivor.

    Scale shape: the drop set is O(dup docs) 8-byte ids — merge-sorted in
    ONE worker task and broadcast by ObjectRef (fetched once per node,
    zero-copy numpy), then the corpus pass is an embarrassingly parallel
    ``np.searchsorted`` anti-filter: NO corpus-side shuffle, and the
    representative choice is partition-invariant because the label (= the
    component min id) is a pure function of the pair graph, never of block
    boundaries.  If the dup-id set ever outgrows a node's object store
    (>> 10^10 dup docs), swap the broadcast for a doc_id-bucket
    co-partitioned anti-join (the pair_bucket machinery above) — at
    realistic web dup rates the 8-byte ids stay orders of magnitude below
    the text payload that shuffle would move.
    """
    import ray

    if labels is None:
        labels = minhash_near_dup(ds, text_col=text_col, key_col=key_col,
                                  threshold=threshold, cfg=cfg)
    ref = _drop_ids_ref(labels, key_col=key_col)

    def keep(t: pa.Table) -> pa.Table:
        drop = ray.get(ref)
        if drop.size == 0:
            return t
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(drop, ids)
        pos[pos == drop.size] = 0
        return t.filter(pa.array(drop[pos] != ids))

    return ds.map_batches(keep, batch_format="pyarrow")


def window_hashes(text: str, k: int) -> np.ndarray:
    """md5-lower-64 of every STRICT word k-window, IN ORDER, one per start
    position (unlike :func:`shingle_hashes`: no dedup, no short-doc
    collapse — position i maps to hash i).  DuckDB twin:
    md5_number_lower over the space-joined window."""
    words = text.lower().split()
    n = len(words) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter(
        (int.from_bytes(
            hashlib.md5(" ".join(words[i:i + k]).encode()).digest()[8:16],
            "little") for i in range(n)),
        dtype=np.uint64, count=n)


def dup_span_stats(ds, text_col: str = "text", key_col: str = "doc_id",
                   k: int | None = None, min_count: int | None = None,
                   keep_cols: tuple = (),
                   cfg: PipelineConfig = DEFAULT_CONFIG):
    """EXACT DUPLICATED-SPAN detection — the word-window analogue of
    ExactSubstr training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public method): a
    k-token window occurring >= min_count times ANYWHERE in the corpus
    (across or within docs) is a duplicated span; per doc, report how
    much text such spans cover.  Returns (doc_id, n_tokens,
    n_dup_windows, n_covered_tokens) — the retention decision (strip
    spans / drop docs over a coverage ratio) composes downstream exactly
    like near_dup_filter.

    Scale shape: pass 1 counts window hashes with per-batch Counter
    partials through the coarse h%B bucket exchange (short uint64 keys,
    never text), keeps only hashes with global count >= min_count, and
    merge-sorts them in ONE worker task (the _drop_ids_ref discipline —
    the driver never holds the set); pass 2 is an embarrassingly
    parallel map: recompute the doc's ordered window hashes, mark
    duplicated starts by np.searchsorted membership, and cover each
    start's k tokens with a vectorized sliding-OR (cumulative-max over
    window starts).  The duplicated-window set is boilerplate-sized
    (bounded by repeated content, not the corpus); if it outgrew a
    node's object store, bucket it like the pair machinery above.
    """
    import ray

    if k is None:
        k = cfg.dup_span_window
    if min_count is None:
        min_count = cfg.dup_span_min_count
    n_buckets = cfg.near_dup_coarse_buckets

    def count_partial(t: pa.Table) -> pa.Table:
        c: dict = {}
        for txt in t[text_col].to_pylist():
            hs, cnts = np.unique(window_hashes(txt or "", k),
                                 return_counts=True)
            for h, m in zip(hs, cnts):
                c[int(h)] = c.get(int(h), 0) + int(m)
        keys = np.fromiter(c.keys(), dtype=np.uint64, count=len(c))
        return pa.table({
            "h": pa.array(keys, pa.uint64()),
            "m": pa.array(list(c.values()), pa.int64()),
            "bucket": pa.array(
                (keys % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    def dup_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("h", as_index=False)["m"].sum()
        s = s[s["m"] >= min_count]
        return pd.DataFrame({"h": s["h"].astype(np.uint64)})

    refs = (ds.map_batches(count_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dup_in_bucket, batch_format="pandas")
            .to_arrow_refs())

    @ray.remote(num_cpus=1)
    def merge(*blocks):
        parts = [b["h"].to_numpy() for b in blocks
                 if b.num_columns and b.num_rows]
        if not parts:
            return np.zeros(0, np.uint64)
        return np.sort(np.concatenate(parts))

    dup_ref = merge.remote(*refs)

    def coverage(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        ids, n_tok, n_win, n_cov = [], [], [], []
        for did, txt in zip(t[key_col].to_pylist(),
                            t[text_col].to_pylist()):
            words = (txt or "").lower().split()
            hs = window_hashes(txt or "", k)
            starts = np.zeros(hs.size, dtype=bool)
            if hs.size and dup.size:
                pos = np.searchsorted(dup, hs)
                pos[pos == dup.size] = 0
                starts = dup[pos] == hs
            covered = 0
            if starts.any():
                # token j is covered iff any duplicated window starts in
                # [j-k+1, j]: sliding OR via cumsum difference
                marks = np.zeros(len(words) + 1, np.int64)
                idx = np.nonzero(starts)[0]
                marks[idx] += 1
                marks[np.minimum(idx + k, len(words))] -= 1
                covered = int(np.count_nonzero(np.cumsum(marks[:-1]) > 0))
            ids.append(did)
            n_tok.append(len(words))
            n_win.append(int(starts.sum()))
            n_cov.append(covered)
        cols = {
            key_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_dup_windows": pa.array(n_win, pa.int64()),
            "n_covered_tokens": pa.array(n_cov, pa.int64()),
        }
        for c in keep_cols:   # rows are emitted 1:1 in input order
            cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(coverage, batch_format="pyarrow")


def line_hash64(line: str) -> int:
    """md5-lower-64 of a line (same convention as shingle_hashes)."""
    return int.from_bytes(hashlib.md5(line.encode("utf-8")).digest()[8:16], "little")


def boilerplate_line_removal(ds, text_col: str = "text", key_col: str = "doc_id",
                             min_docs: int | None = None,
                             cfg: PipelineConfig = DEFAULT_CONFIG):
    """CCNet/C4-style repeated-line (boilerplate) removal: a line that
    occurs in >= ``min_docs`` DISTINCT documents is stripped from every
    document.  Returns (key, kept_text, n_lines, n_removed) per doc.

    Two passes over the corpus:

      1. frequency: per-batch Counter over each doc's DISTINCT line
         hashes (partial pre-aggregation — the shuffle carries
         (line_hash, partial_doc_count), never line text), coarse-bucket
         groupby + vectorized pandas sum, filter >= min_docs inside the
         bucket;
      2. strip: the frequent-hash set is broadcast once via ray.put and
         each batch filters its lines locally (order-preserving).

    Scale assumption (the CCNet trade): the BOILERPLATE set (lines
    repeated across >= min_docs docs) fits in worker memory — it is
    bounded by corpus_lines/min_docs and in practice by the boilerplate
    vocabulary, orders of magnitude smaller than the corpus.  If it ever
    doesn't, replace the broadcast with a co-partitioned join on
    line_hash + a positional reassembly groupby (same two shuffles the
    near-dup verify path uses).
    """
    import collections

    import ray

    if min_docs is None:
        min_docs = DEFAULT_CONFIG.line_dedup_min_docs
    n_buckets = cfg.near_dup_coarse_buckets

    def line_partials(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t[text_col].to_pylist():
            for ln in set((txt or "").split("\n")):
                c[line_hash64(ln)] += 1
        hs = list(c.keys())
        return pa.table({
            "lh": pa.array(hs, pa.uint64()),
            "c": pa.array([c[h] for h in hs], pa.int64()),
            "bucket": pa.array([h % n_buckets for h in hs], pa.int32()),
        })

    def sum_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("lh", as_index=False)["c"].sum()
        return s[s["c"] >= min_docs][["lh"]]

    freq_blocks = ray.get(
        ds.map_batches(line_partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sum_filter, batch_format="pandas")
        .to_arrow_refs()
    )
    frequent = frozenset(
        int(v)
        for b in freq_blocks if b.num_columns and b.num_rows
        for v in b["lh"].to_pylist()
    )
    fs_ref = ray.put(frequent)

    def strip(t: pa.Table) -> pa.Table:
        fs = ray.get(fs_ref)
        keys = t[key_col].to_pylist()
        kept_texts, n_lines, n_removed = [], [], []
        for txt in t[text_col].to_pylist():
            lines = (txt or "").split("\n")
            kept = [ln for ln in lines if line_hash64(ln) not in fs]
            kept_texts.append("\n".join(kept))
            n_lines.append(len(lines))
            n_removed.append(len(lines) - len(kept))
        return pa.table({
            key_col: pa.array(keys, pa.int64()),
            "kept_text": pa.array(kept_texts, pa.string()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    return ds.map_batches(strip, batch_format="pyarrow")


def benchmark_contamination(ds, bench_ds, text_col: str = "text",
                            key_col: str = "doc_id", w: int | None = None):
    """Benchmark-contamination check (training-data hygiene): flag every
    corpus doc sharing at least one word w-gram shingle with a held-out
    evaluation set.  Returns (key, n_shingles, n_shared, contaminated 0/1)
    per corpus doc — the standard decontamination screen (e.g. GPT-3
    appendix C / PaLM §C public method: n-gram overlap with eval data).

    Scale shape: the EVAL side is benchmark-sized (MBs — orders of
    magnitude smaller than the corpus), so its distinct shingle-hash set
    is reduced distributed (per-batch np.unique partials), unioned once
    on the driver, and broadcast via ``ray.put`` as a SORTED uint64 array;
    the corpus pass is then one embarrassingly-parallel map_batches doing
    np.searchsorted membership counts — NO corpus-side shuffle at any
    scale.  Same md5-lower-64 shingles as :func:`shingle_hashes`, so the
    SQL oracle recomputes identical sets.
    """
    import ray

    if w is None:
        w = DEFAULT_CONFIG.contamination_shingle_w

    def bench_partial(t: pa.Table) -> pa.Table:
        hs = [shingle_hashes(txt or "", w) for txt in t[text_col].to_pylist()]
        cat = np.unique(np.concatenate(hs)) if hs else np.zeros(0, np.uint64)
        return pa.table({"h": pa.array(cat, pa.uint64())})

    blocks = ray.get(
        bench_ds.map_batches(bench_partial, batch_format="pyarrow").to_arrow_refs()
    )
    bench_set = np.unique(np.concatenate(
        [b["h"].to_numpy() for b in blocks if b.num_columns and b.num_rows]
        or [np.zeros(0, np.uint64)]
    ))
    ref = ray.put(bench_set)

    def scan(t: pa.Table) -> pa.Table:
        bs = ray.get(ref)
        n_sh, n_shared = [], []
        for txt in t[text_col].to_pylist():
            h = shingle_hashes(txt or "", w)
            n_sh.append(int(h.size))
            if h.size and bs.size:
                idx = np.searchsorted(bs, h)
                idx[idx == bs.size] = 0
                n_shared.append(int(np.count_nonzero(bs[idx] == h)))
            else:
                n_shared.append(0)
        shared = pa.array(n_shared, pa.int64())
        return pa.table({
            key_col: t[key_col],
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_shared": shared,
            "contaminated": pc.cast(pc.greater(shared, 0), pa.int64()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def label_set_agreement(labels_lsh, labels_exact, key_col: str = "doc_id"):
    """Method-agreement evaluator for near-dup dedup: how well an
    APPROXIMATE method's flagged-doc set (e.g. :func:`minhash_near_dup`)
    recovers the EXACT method's (e.g. :func:`ngram_jaccard_near_dup`
    pairs run through connected components) — the text-dedup twin of
    :func:`~ocr_ray.pipelines.simsearch.ann_recall_at_k`.

    Returns one row ``(n_lsh, n_exact, n_common, recall_bp,
    precision_bp)`` — recall/precision of the approximate flagged set
    against the exact one, in half-away-rounded basis points.

    Scale shape: the exact flagged-id set (O(dup docs) 8-byte ids) is
    merge-sorted in ONE worker task and broadcast by ObjectRef (the
    :func:`_drop_ids_ref` discipline — the driver never holds it); the
    approximate side streams through an embarrassingly parallel
    searchsorted-membership count whose per-batch partials reduce in one
    ``repartition(1)`` task, so exactly one 5-column row ever reaches
    the driver.
    """
    import ray

    exact_ref = _drop_ids_ref(labels_exact, key_col=key_col,
                              include_representatives=True)
    n_exact = int(ray.get(
        ray.remote(num_cpus=1)(lambda a: int(a.size)).remote(exact_ref)))

    def partial(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        exact = ray.get(exact_ref)
        if exact.size and ids.size:
            pos = np.searchsorted(exact, ids)
            pos[pos == exact.size] = 0
            common = int((exact[pos] == ids).sum())
        else:
            common = 0
        return pa.table({
            "n_lsh": pa.array([ids.size], pa.int64()),
            "n_common": pa.array([common], pa.int64()),
        })

    def final_row(n_lsh: int, n_common: int) -> pa.Table:
        recall = int(np.floor(10000.0 * n_common / n_exact + 0.5)) if n_exact else 0
        prec = int(np.floor(10000.0 * n_common / n_lsh + 0.5)) if n_lsh else 0
        return pa.table({
            "n_lsh": pa.array([n_lsh], pa.int64()),
            "n_exact": pa.array([n_exact], pa.int64()),
            "n_common": pa.array([n_common], pa.int64()),
            "recall_bp": pa.array([recall], pa.int64()),
            "precision_bp": pa.array([prec], pa.int64()),
        })

    if isinstance(labels_lsh, pa.Table):
        p = partial(labels_lsh)
        return final_row(int(p["n_lsh"][0].as_py()),
                         int(p["n_common"][0].as_py()))

    def final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        return final_row(
            int(pc_.sum(t["n_lsh"]).as_py() or 0),
            int(pc_.sum(t["n_common"]).as_py() or 0))

    parts = labels_lsh.map_batches(partial, batch_format="pyarrow")
    out = parts.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None)
    import ray as _ray

    blocks = [b for b in _ray.get(out.to_arrow_refs())
              if b.num_columns and b.num_rows]
    if not blocks:           # empty approximate side still yields one row
        return final_row(0, 0)
    return pa.concat_tables(blocks)


def _to_band_table(batch: pa.Table, text_col: str, key_col: str,
                   n_buckets: int) -> pa.Table:
    """Shared signature→band explode (the minhash_near_dup kernel shape):
    one (band_id, key, band_hash, bucket) row per band per doc, bucket =
    crc32(band_hash) % n_buckets — the routing key of the persisted
    band-index layout and of the incremental probe's exchange."""
    bands: list[tuple[int, int, str]] = []
    for did, txt in zip(batch[key_col].to_pylist(),
                        batch[text_col].to_pylist()):
        bands.extend(band_rows(did, minhash_signature(txt or "")))
    return pa.table({
        "band_id": pa.array([b[0] for b in bands], pa.int32()),
        key_col: pa.array([b[1] for b in bands], pa.int64()),
        "band_hash": pa.array([b[2] for b in bands], pa.string()),
        "bucket": pa.array(
            [zlib.crc32(b[2].encode()) % n_buckets for b in bands],
            pa.int32()),
    })


def build_minhash_index(ds, index_dir: str, text_col: str = "text",
                        key_col: str = "doc_id",
                        n_buckets: int | None = None) -> str:
    """Persist the corpus MinHash BAND INDEX hive-partitioned by band-hash
    bucket (``bucket=N/*.parquet``) — the dedup sibling of
    :func:`ocr_ray.pipelines.textsearch.build_term_index`: the LAYOUT is
    the index, no server component, and at corpus scale it lives directly
    on object storage.  One streaming pass (signatures are embarrassingly
    parallel; 16 short rows per doc — text never enters the index);
    afterwards an incremental crawl deduplicates against the WHOLE
    corpus by reading only the bucket partitions its own band hashes
    route to (:func:`near_dup_incremental`), never re-shuffling or even
    re-reading the old corpus."""
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    ds.map_batches(
        lambda t: _to_band_table(t, text_col, key_col, n_buckets),
        batch_format="pyarrow",
    ).write_parquet(index_dir, partition_cols=["bucket"])
    return index_dir


def update_minhash_index(index_dir: str, new_ds, text_col: str = "text",
                         key_col: str = "doc_id",
                         n_buckets: int | None = None) -> str:
    """INGEST a new slice's band rows into an existing
    :func:`build_minhash_index` layout — the write that completes the
    continuous-ingestion loop (probe with
    :func:`near_dup_incremental`, keep the survivors, then update so
    the NEXT batch dedups against them too).  Append-only: Ray's
    ``write_parquet`` adds uuid-named files inside the same
    ``bucket=`` partitions and never touches existing files, so a
    concurrent reader sees either the old or the extended index, and
    the update is one embarrassingly-parallel pass over the new slice
    only.  ``n_buckets`` must match the build (same contract as the
    term-index lookups)."""
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    new_ds.map_batches(
        lambda t: _to_band_table(t, text_col, key_col, n_buckets),
        batch_format="pyarrow",
    ).write_parquet(index_dir, partition_cols=["bucket"])
    return index_dir


def delete_from_minhash_index(index_dir: str, deleted_ds,
                              key_col: str = "doc_id") -> str:
    """DELETE documents from a minhash band layout via append-only
    tombstones — the dedup-family member of the delete verb (term /
    BM25 / IVF siblings), needed when indexed docs are retracted
    (takedowns, re-crawl replacements): their band rows must stop
    producing candidates.  Band partitions are untouched;
    :func:`near_dup_incremental` drops dead rows from the probed old
    side (cap stats re-derive over survivors), and a bucket-partition
    rewrite is the at-scale reclamation path
    (:mod:`ocr_ray.state.tombstones`)."""
    from ocr_ray.state.tombstones import append_tombstones

    return append_tombstones(index_dir, deleted_ds, key_col)


def near_dup_incremental(index_dir: str, new_ds, docs_ds,
                         text_col: str = "text", key_col: str = "doc_id",
                         threshold: float = 0.8,
                         cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """INCREMENTAL near-dup screen of a new crawl slice against a
    persisted :func:`build_minhash_index` layout — the step a continuous
    ingestion pipeline runs per batch of arrivals: no old-corpus shuffle,
    no old-corpus re-read beyond the probed partitions.  Returns one
    stats row ``(n_new, n_candidates, n_dup_pairs, n_new_flagged)``.

    Shape: new docs compute signatures (one embarrassingly parallel
    pass), their band rows route to crc32 buckets, and ONLY those bucket
    partitions of the index are read (bytes ≈ touched/n_buckets of the
    index).  Old and new band streams are two INDEPENDENT lineages (the
    union-safe shape, CLAUDE.md), co-partitioned by bucket; inside each
    bucket a vectorized pandas merge on (band_id, band_hash) emits
    (new, old) candidate pairs, with the degenerate-bucket cap of
    :func:`minhash_near_dup` applied to the OLD side (a band bucket with
    > max_bucket old members pairs each new doc only against the bucket
    minimum).  Pairs dedup through the splitmix64 pair exchange and
    verify with exact n-gram Jaccard via the co-partitioned text joins
    (:func:`verify_pairs_jaccard` — the verify set must include both
    sides' texts, so ``docs_ds`` is the combined corpus)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    n_buckets = cfg.near_dup_coarse_buckets
    max_bucket = cfg.near_dup_max_bucket

    def tag_new(t: pa.Table) -> pa.Table:
        bt = _to_band_table(t, text_col, key_col, n_buckets)
        return bt.append_column(
            "side", pa.nulls(bt.num_rows, pa.int8()).fill_null(0))

    new_bands = new_ds.map_batches(
        tag_new, batch_format="pyarrow").materialize()

    # distinct touched buckets (<= n_buckets small ints on the driver)
    touched = sorted({r["bucket"] for r in
                      new_bands.groupby("bucket").count().take_all()})
    import glob as _glob
    import os as _os
    files: list[str] = []
    for b in touched:
        files.extend(sorted(_glob.glob(
            _os.path.join(index_dir, f"bucket={b}", "*.parquet"))))
    n_new = new_ds.count()
    if not files:
        return pa.table({
            "n_new": pa.array([n_new], pa.int64()),
            "n_candidates": pa.array([0], pa.int64()),
            "n_dup_pairs": pa.array([0], pa.int64()),
            "n_new_flagged": pa.array([0], pa.int64()),
        })

    # tombstone-aware (delete_from_minhash_index): deleted docs' band
    # rows drop from the OLD side before candidate generation, so the
    # degenerate-bucket cap stats (size, min) also re-derive over the
    # surviving index — identical to an index built without them
    import ray

    from ocr_ray.state.tombstones import read_tombstones

    dead = read_tombstones(index_dir, key_col)
    dead_ref = ray.put(dead) if dead is not None else None

    def tag_old(t: pa.Table) -> pa.Table:
        # re-derive bucket (the partition column round-trips as its
        # value) and tag the side
        if dead_ref is not None and t.num_rows:
            dd = ray.get(dead_ref)
            keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            di = np.searchsorted(dd, keys)
            di[di == dd.size] = 0
            t = t.filter(pa.array(dd[di] != keys))
        return pa.table({
            "band_id": pc.cast(t["band_id"], pa.int32()),
            key_col: t[key_col],
            "band_hash": t["band_hash"],
            "bucket": pc.cast(t["bucket"], pa.int32()),
            "side": pa.nulls(t.num_rows, pa.int8()).fill_null(1),
        })

    old_bands = rd.read_parquet(files).map_batches(
        tag_old, batch_format="pyarrow")

    def cross_pairs(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["side"] == 0]
        old = g[g["side"] == 1]
        if new.empty or old.empty:
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64)})
        stats = (old.groupby(["band_id", "band_hash"])[key_col]
                 .agg(["size", "min"]).reset_index())
        m = (new.merge(old, on=["band_id", "band_hash"],
                       suffixes=("_n", "_o"))
             .merge(stats, on=["band_id", "band_hash"]))
        keep = (m["size"] <= max_bucket) | (
            m[f"{key_col}_o"] == m["min"])
        m = m[keep]
        out = (m[[f"{key_col}_n", f"{key_col}_o"]]
               .drop_duplicates()
               .rename(columns={f"{key_col}_n": "id_a",
                                f"{key_col}_o": "id_b"}))
        out["id_a"] = out["id_a"].astype(np.int64)
        out["id_b"] = out["id_b"].astype(np.int64)
        return out

    pairs = dedupe_pairs(
        new_bands.union(old_bands)
        .groupby("bucket")
        .map_groups(cross_pairs, batch_format="pandas")
    ).materialize()
    n_candidates = pairs.count()
    if n_candidates == 0:
        return pa.table({
            "n_new": pa.array([n_new], pa.int64()),
            "n_candidates": pa.array([0], pa.int64()),
            "n_dup_pairs": pa.array([0], pa.int64()),
            "n_new_flagged": pa.array([0], pa.int64()),
        })

    if n_candidates <= cfg.fuse_pairs_threshold:
        # size-adaptive tail (the minhash_near_dup pattern): below the
        # fuse threshold the verify fits ONE task — candidate texts go
        # object-store block ref → task via a broadcast-id filter, and
        # the two join executions' fixed costs are skipped entirely
        blocks = [t for t in ray.get(pairs.to_arrow_refs())
                  if t.num_columns and t.num_rows]
        pair_tbl = pa.concat_tables(blocks)
        cand = pa.array(
            sorted(set(pair_tbl["id_a"].to_pylist())
                   | set(pair_tbl["id_b"].to_pylist())), pa.int64())
        cand_ref = ray.put(cand)

        def pick(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t[key_col], value_set=ray.get(cand_ref))
            return t.filter(keep).select([key_col, text_col])

        text_refs = docs_ds.map_batches(
            pick, batch_format="pyarrow").to_arrow_refs()
        task = ray.remote(num_cpus=1)(_verify_pairs_task)
        ver_tbl = ray.get(task.remote(pair_tbl, threshold, key_col,
                                      text_col, *text_refs))
        n_dup_pairs = ver_tbl.num_rows
        n_flagged = len(set(ver_tbl["id_a"].to_pylist()))
    else:
        verified = verify_pairs_jaccard(
            pairs, docs_ds, text_col=text_col, key_col=key_col,
            threshold=threshold).materialize()
        n_dup_pairs = verified.count()
        n_flagged = (verified.groupby("id_a")
                     .aggregate(Count(alias_name="n")).count()
                     if n_dup_pairs else 0)
    return pa.table({
        "n_new": pa.array([n_new], pa.int64()),
        "n_candidates": pa.array([n_candidates], pa.int64()),
        "n_dup_pairs": pa.array([n_dup_pairs], pa.int64()),
        "n_new_flagged": pa.array([n_flagged], pa.int64()),
    })


def _verify_pairs_task(pair_tbl: pa.Table, threshold: float, key_col: str,
                       text_col: str, *text_blocks: pa.Table) -> pa.Table:
    """One-task exact-Jaccard verify of a small pair set (the
    _fused_verify_cc verify step without the union-find)."""
    texts: dict[int, str] = {}
    for blk in text_blocks:
        for did, txt in zip(blk[key_col].to_pylist(),
                            blk[text_col].to_pylist()):
            texts[int(did)] = txt or ""
    keep_a, keep_b = [], []
    for ia, ib in zip(pair_tbl["id_a"].to_pylist(),
                      pair_tbl["id_b"].to_pylist()):
        if jaccard(texts.get(int(ia), ""),
                   texts.get(int(ib), "")) >= threshold:
            keep_a.append(int(ia))
            keep_b.append(int(ib))
    return pa.table({"id_a": pa.array(keep_a, pa.int64()),
                     "id_b": pa.array(keep_b, pa.int64())})


def near_dup_keep_best(ds, labels=None, quality_col: str = "n_chars",
                       text_col: str = "text", key_col: str = "doc_id",
                       threshold: float = 0.8,
                       cfg: PipelineConfig = DEFAULT_CONFIG):
    """:func:`near_dup_filter` with a QUALITY-BASED representative: per
    near-dup cluster keep the member with the highest ``quality_col``
    (tie → min id) instead of keep-first — the retention rule real
    curation pipelines prefer (drop the truncated mirror, keep the full
    page; the reference's best-input-wins coalesce, llm_pl.py:484-500,
    applied to cluster members).

    Scale shape: everything cluster-sized stays worker-side.  The
    (member, cluster) labeling merge-sorts in ONE task (the
    _drop_ids_ref discipline — O(dup docs) 8-byte id pairs); a corpus
    map pass projects (id, quality) for MEMBERS ONLY (searchsorted
    membership, no shuffle — quality rows for non-dups never move); one
    worker task aligns qualities to the labeling and picks each
    cluster's argmax, returning the sorted drop set, which broadcasts by
    ObjectRef into the same embarrassingly parallel anti-filter as
    near_dup_filter.  The representative is a pure function of (pair
    graph, quality column) — partition-invariant.
    """
    import ray

    if labels is None:
        labels = minhash_near_dup(ds, text_col=text_col, key_col=key_col,
                                  threshold=threshold, cfg=cfg)

    if isinstance(labels, pa.Table):
        lab_blocks = [ray.put(labels)]
    else:
        lab_blocks = labels.map_batches(
            lambda t: pa.table({
                key_col: pc.cast(t[key_col], pa.int64()),
                "dup_of": pc.cast(t["dup_of"], pa.int64()),
            }), batch_format="pyarrow").to_arrow_refs()

    @ray.remote(num_cpus=1)
    def merge_labels(*blocks):
        ks, cs = [], []
        for b in blocks:
            if b.num_columns and b.num_rows:
                ks.append(b[key_col].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
                cs.append(b["dup_of"].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
        if not ks:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        k = np.concatenate(ks)
        c = np.concatenate(cs)
        order = np.argsort(k, kind="stable")   # member ids are unique
        return k[order], c[order]

    lab_ref = merge_labels.remote(*lab_blocks)

    def member_quality(t: pa.Table) -> pa.Table:
        members, _ = ray.get(lab_ref)
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if members.size == 0:
            mask = np.zeros(ids.size, bool)
        else:
            pos = np.searchsorted(members, ids)
            pos[pos == members.size] = 0
            mask = members[pos] == ids
        kept = t.filter(pa.array(mask))
        return pa.table({
            key_col: pc.cast(kept[key_col], pa.int64()),
            "q": pc.cast(kept[quality_col], pa.int64()),
        })

    q_refs = ds.map_batches(member_quality,
                            batch_format="pyarrow").to_arrow_refs()

    @ray.remote(num_cpus=1)
    def pick_drop(lab, *qblocks):
        members, clusters = lab
        if members.size == 0:
            return np.zeros(0, np.int64)
        qual = np.zeros(members.size, np.int64)
        for b in qblocks:
            if not (b.num_columns and b.num_rows):
                continue
            ids = b[key_col].to_numpy(zero_copy_only=False)
            q = b["q"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(members, ids)
            qual[pos] = q
        # cluster-major, quality desc, id asc: first row per cluster wins
        order = np.lexsort((members, -qual, clusters))
        c_sorted = clusters[order]
        rep = np.ones(c_sorted.size, bool)
        rep[1:] = c_sorted[1:] != c_sorted[:-1]
        return np.sort(members[order][~rep])

    drop_ref = pick_drop.remote(lab_ref, *q_refs)

    def keep(t: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        if drop.size == 0:
            return t
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(drop, ids)
        pos[pos == drop.size] = 0
        return t.filter(pa.array(drop[pos] != ids))

    return ds.map_batches(keep, batch_format="pyarrow")


def soft_dedup_commonness(ds, text_col: str = "text",
                          key_col: str = "doc_id", k: int | None = None,
                          top_k: int = 25,
                          cfg: PipelineConfig = DEFAULT_CONFIG):
    """SoftDeDup DOC COMMONNESS (He et al. 2024, "SoftDedup" — reweight
    common documents instead of dropping them): per doc, the mean global
    occurrence count of its word k-windows,

        commonness_e6 = round_half_away(1e6 · Σ_i c(h_i) / n_windows)

    where c(h) counts every occurrence of window-hash h corpus-wide
    (within-doc repeats included — the :func:`dup_span_stats` counting).
    A doc of entirely unique text scores exactly 1e6; boilerplate-heavy
    and mirrored docs score higher, and a training loader would weight
    each doc ∝ 1/commonness.  Returns the top-``top_k`` most common docs
    (doc_id, n_windows, dup_sum, commonness_e6), ordered commonness
    desc, id asc.  Docs shorter than k words have no windows and are
    excluded (both sides).

    Scale shape: pass 1 is dup_span_stats' count exchange (per-batch
    Counter partials, coarse h%B buckets, short uint64 keys) KEEPING the
    counts: only hashes with global count >= 2 survive the bucket filter
    — for a unique hash c(h) = 1, so Σc(h_i) = n_windows + Σ_{dup}(c−1)
    and the broadcast (hash, count) table is boilerplate-sized, exactly
    dup_span_stats' duplicated set with one extra int64 column.  Pass 2
    is an embarrassingly parallel searchsorted lookup + integer
    arithmetic with a per-batch partial top-k; one repartition(1) task
    folds the partials, so the driver receives exactly ``top_k`` rows.
    Integer discipline: (2·1e6·dup_sum + n) // (2n) half-away rounding —
    Ray == DuckDB bit-for-bit.
    """
    import ray

    if k is None:
        k = cfg.dup_span_window
    n_buckets = cfg.near_dup_coarse_buckets

    def count_partial(t: pa.Table) -> pa.Table:
        c: dict = {}
        for txt in t[text_col].to_pylist():
            hs, cnts = np.unique(window_hashes(txt or "", k),
                                 return_counts=True)
            for h, m in zip(hs, cnts):
                c[int(h)] = c.get(int(h), 0) + int(m)
        keys = np.fromiter(c.keys(), dtype=np.uint64, count=len(c))
        return pa.table({
            "h": pa.array(keys, pa.uint64()),
            "m": pa.array(list(c.values()), pa.int64()),
            "bucket": pa.array(
                (keys % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    def dup_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("h", as_index=False)["m"].sum()
        s = s[s["m"] >= 2]
        return pd.DataFrame({"h": s["h"].astype(np.uint64),
                             "m": s["m"].astype(np.int64)})

    refs = (ds.map_batches(count_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dup_in_bucket, batch_format="pandas")
            .to_arrow_refs())

    @ray.remote(num_cpus=1)
    def merge(*blocks):
        hs, ms = [], []
        for b in blocks:
            if b.num_columns and b.num_rows:
                hs.append(b["h"].to_numpy())
                ms.append(b["m"].to_numpy())
        if not hs:
            return np.zeros(0, np.uint64), np.zeros(0, np.int64)
        h = np.concatenate(hs)
        m = np.concatenate(ms)
        order = np.argsort(h, kind="stable")   # a hash lives in one bucket
        return h[order], m[order]

    cnt_ref = merge.remote(*refs)

    def score(t: pa.Table) -> pa.Table:
        dup_h, dup_m = ray.get(cnt_ref)
        ids, n_win, dup_sum = [], [], []
        for did, txt in zip(t[key_col].to_pylist(),
                            t[text_col].to_pylist()):
            hs = window_hashes(txt or "", k)
            if hs.size == 0:
                continue
            s = hs.size
            if dup_h.size:
                pos = np.searchsorted(dup_h, hs)
                pos[pos == dup_h.size] = 0
                hit = dup_h[pos] == hs
                s += int((dup_m[pos[hit]] - 1).sum())
            ids.append(did)
            n_win.append(int(hs.size))
            dup_sum.append(s)
        df = pd.DataFrame({
            key_col: pd.array(ids, "int64"),
            "n_windows": pd.array(n_win, "int64"),
            "dup_sum": pd.array(dup_sum, "int64"),
        })
        nw = df["n_windows"].to_numpy(np.int64)
        ds_ = df["dup_sum"].to_numpy(np.int64)
        df["commonness_e6"] = ((2 * 1_000_000 * ds_ + nw) // (2 * nw)
                               if len(df) else
                               pd.array([], "int64"))
        df = df.sort_values(["commonness_e6", key_col],
                            ascending=[False, True]).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("commonness_e6", "descending"),
                          (key_col, "ascending")])[:top_k]
        return t.take(idx)

    return (ds.map_batches(score, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def minhash_param_recall(ds, exact_pairs, rows_list: tuple[int, ...] = (2, 4, 8, 16),
                         cfg: PipelineConfig = DEFAULT_CONFIG):
    """LSH PARAMETER SWEEP — the tuning eval a dedup rollout runs before
    committing to a (bands x rows-per-band) config: all ``rows_list``
    band layouts are sliced from ONE shared 64-perm signature pass, and
    each config's candidate set is scored against the EXACT df-capped
    n-gram-Jaccard ground truth (``exact_pairs`` =
    :func:`ngram_jaccard_near_dup` output, an independent lineage so the
    union below never shares an upstream — the deadlock sharp edge).

    Output, one row per config, every column integer-exact and
    SQL-re-derivable (the seeded permutations are a VALUES table in the
    oracle): ``(bands, rows_per_band, n_candidates, n_hit, n_exact,
    recall_bp, precision_bp)`` — the realized S-curve: fewer rows per
    band => higher recall, lower precision.

    Scale shape: one signature map_batches (embarrassingly parallel,
    sigs never shuffled); band rows carry (cfg, band_id, 16-hex hash,
    id); the degenerate-bucket star cap bounds per-bucket pair output;
    pair streams from all configs and the exact set co-partition on ONE
    splitmix pair bucket where per-config dedup + intersection are
    vectorized pandas; the driver folds <= n_buckets x |configs| partial
    rows."""
    n_buckets = cfg.near_dup_coarse_buckets
    max_bucket = cfg.near_dup_max_bucket
    pair_buckets = cfg.pair_dedup_buckets

    def to_cfg_bands(batch: pa.Table) -> pa.Table:
        cfgs, bids, hashes, ids = [], [], [], []
        for did, txt in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
            sig = minhash_signature(txt or "")
            for r in rows_list:
                for b in range(_N_PERM // r):
                    key = "-".join(str(int(v)) for v in sig[b * r:(b + 1) * r])
                    cfgs.append(r)
                    bids.append(b)
                    hashes.append(hashlib.md5(key.encode()).hexdigest()[:16])
                    ids.append(did)
        return pa.table({
            "cfg": pa.array(cfgs, pa.int32()),
            "band_id": pa.array(bids, pa.int32()),
            "band_hash": pa.array(hashes, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(f"{c}-{h}".encode()) % n_buckets
                 for c, h in zip(cfgs, hashes)], pa.int32()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cs, a, b = [], [], []
        for (c, _bid, _h), grp in g.groupby(["cfg", "band_id", "band_hash"],
                                            sort=True):
            ids = sorted(grp["doc_id"].tolist())
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                for j in ids[1:]:
                    cs.append(c); a.append(ids[0]); b.append(j)
            else:
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        cs.append(c); a.append(ids[i]); b.append(ids[j])
        return (pd.DataFrame({"cfg": np.array(cs, dtype=np.int32),
                              "id_a": np.array(a, dtype=np.int64),
                              "id_b": np.array(b, dtype=np.int64)})
                .drop_duplicates())

    lsh_pairs = (
        ds.map_batches(to_cfg_bands, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(lambda t: pair_bucket(t.select(["cfg", "id_a", "id_b"]),
                                           pair_buckets),
                     batch_format="pyarrow")
    )
    exact_tagged = exact_pairs.map_batches(
        lambda t: pair_bucket(pa.table({
            "cfg": pa.array(np.full(t.num_rows, -1, np.int32), pa.int32()),
            "id_a": t["id_a"], "id_b": t["id_b"]}), pair_buckets),
        batch_format="pyarrow",
    # a sparse upstream emits schema-less empty blocks that poison the
    # union; repartition coalesces them away (CLAUDE.md sharp edge)
    ).repartition(8)

    def tally(g: pd.DataFrame) -> pd.DataFrame:
        ex = (g[g["cfg"] == -1][["id_a", "id_b"]]
              .drop_duplicates())
        rows = []
        for r in rows_list:
            sub = (g[g["cfg"] == r][["id_a", "id_b"]].drop_duplicates())
            hit = sub.merge(ex, on=["id_a", "id_b"])
            rows.append((r, len(sub), len(hit), len(ex)))
        return pd.DataFrame(rows, columns=["cfg", "n_cand", "n_hit", "n_ex"]
                            ).astype("int64")

    def finalize(t: pd.DataFrame) -> pa.Table:
        df = (t.groupby("cfg", as_index=False)
              [["n_cand", "n_hit", "n_ex"]].sum())
        out = pd.DataFrame({
            "bands": (_N_PERM // df["cfg"]).astype("int64"),
            "rows_per_band": df["cfg"].astype("int64"),
            "n_candidates": df["n_cand"].astype("int64"),
            "n_hit": df["n_hit"].astype("int64"),
            "n_exact": df["n_ex"].astype("int64"),
        })
        out["recall_bp"] = np.where(
            out["n_exact"] > 0, 10000 * out["n_hit"] // out["n_exact"],
            10000).astype("int64")
        out["precision_bp"] = np.where(
            out["n_candidates"] > 0,
            10000 * out["n_hit"] // out["n_candidates"], 10000
        ).astype("int64")
        return pa.Table.from_pandas(out.sort_values("rows_per_band"),
                                    preserve_index=False)

    return (
        lsh_pairs.union(exact_tagged)
        .groupby("pbucket")
        .map_groups(tally, batch_format="pandas")
        .repartition(1)
        .map_batches(finalize, batch_format="pandas", batch_size=None)
    )


def simhash_hamming_histogram(ds, text_col: str = "text",
                              key_col: str = "doc_id",
                              cfg: PipelineConfig = DEFAULT_CONFIG):
    """THRESHOLD-MARGIN DIAGNOSTIC for the simhash family: the histogram
    of hamming distances over ALL candidate pairs (pairs sharing at
    least one exact 16-bit chunk, star-capped in degenerate buckets
    exactly like :func:`simhash_near_dup`) — how a curation run picks
    ``max_hamming`` with evidence instead of folklore: a bimodal
    histogram separates near-dups from chunk-collision noise.

    Same topology as the near-dup op (chunk rows → coarse bucket →
    in-bucket vectorized pairing) except no hamming filter; the pair
    stream dedups through the splitmix64 pair-bucket exchange carrying
    (id_a, id_b, hamming), then per-batch histogram partials reduce over
    ≤ 65 keys.  Output ``(hamming, n_pairs)``."""
    import pandas as pd
    from ray.data.aggregate import Sum

    n_buckets = cfg.near_dup_coarse_buckets
    MAX_BUCKET = cfg.near_dup_max_bucket

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids, chunks, chunk_ids, sims = [], [], [], []
        for did, txt in zip(batch[key_col].to_pylist(),
                            batch[text_col].to_pylist()):
            sh = simhash64(txt or "")
            for c in range(4):
                ids.append(did)
                chunk_ids.append(c)
                chunks.append((sh >> (16 * c)) & 0xFFFF)
                sims.append(sh)
        return pa.table({
            key_col: pa.array(ids, pa.int64()),
            "chunk_id": pa.array(chunk_ids, pa.int32()),
            "chunk": pa.array(chunks, pa.int32()),
            "sh": pa.array([format(s, "016x") for s in sims], pa.string()),
            "bucket": pa.array(
                [(c * 65536 + v) % n_buckets
                 for c, v in zip(chunk_ids, chunks)], pa.int32()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, h = [], [], []
        for _, grp in g.groupby(["chunk_id", "chunk"], sort=True):
            rows = grp.drop_duplicates(subset=[key_col]).sort_values(key_col)
            ids = rows[key_col].tolist()
            if len(ids) < 2:
                continue
            shs = [int(s, 16) for s in rows["sh"].tolist()]
            if len(ids) > MAX_BUCKET:
                h0 = shs[0]
                for j in range(1, len(ids)):
                    a.append(ids[0])
                    b.append(ids[j])
                    h.append(hamming64(h0, shs[j]))
            else:
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        a.append(ids[i])
                        b.append(ids[j])
                        h.append(hamming64(shs[i], shs[j]))
        return pd.DataFrame({"id_a": np.array(a, dtype=np.int64),
                             "id_b": np.array(b, dtype=np.int64),
                             "hamming": np.array(h, dtype=np.int64)})

    pairs = (ds.map_batches(to_chunks, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_pairs, batch_format="pandas"))
    # a pair surfaces once per shared chunk (up to 4x) — ALWAYS dedup
    # before counting (the near-dup op may skip this; a histogram can't)
    distinct = dedupe_pairs(pairs, extra_cols=("hamming",))

    def hist_partial(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(t["hamming"].to_numpy(), return_counts=True)
        return pa.table({"hamming": pa.array(vals, pa.int64()),
                         "n_pairs": pa.array(counts.astype(np.int64),
                                             pa.int64())})

    return (distinct.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("hamming")
            .aggregate(Sum("n_pairs", alias_name="n_pairs")))


def dup_ngram_coverage(ds, text_col: str = "text", key_col: str = "doc_id",
                       lang_col: str = "lang", w: int = _SHINGLE_W,
                       cfg: PipelineConfig = DEFAULT_CONFIG):
    """DUPLICATE-TEXT FRACTION per lang — the corpus diagnostic of Lee et
    al.'s "Deduplicating Training Data Makes Language Models Better"
    (substring-dedup family): for every document, the share of its
    distinct word-w-gram shingles that occur in >= 2 documents, rolled up
    per lang as (docs, docs touched by duplication, total / duplicated
    shingles, floor-bp coverage).  This is the measurement a curation
    pipeline runs BEFORE choosing a dedup threshold; same shingle
    convention as :func:`minhash_near_dup` / :func:`ngram_jaccard_near_dup`
    (md5_number_lower word-3-grams) so the verdicts compose.

    Scale shape: postings (doc_id, lang, h) bucket by h %% B — every
    posting of a shingle lands in ONE bucket, so per-bucket doc frequency
    IS global df; the bucket kernel collapses postings to <= one partial
    row per (doc, bucket); a coarse doc_id %% B exchange folds per-doc
    totals and emits <= |langs| rows per group; the final groupby carries
    ~5 keys.  Text never crosses an exchange, no all-pairs work, no
    df cap needed (counting, not pairing).
    Reference semantics: dedup family of SURVEY §2 J2/LLM-ops.
    """
    from ray.data.aggregate import Sum

    n_buckets = cfg.near_dup_coarse_buckets

    def to_postings(batch: pa.Table) -> pa.Table:
        ids_out, langs_out, hs = [], [], []
        for did, lang, txt in zip(batch[key_col].to_pylist(),
                                  batch[lang_col].to_pylist(),
                                  batch[text_col].to_pylist()):
            h = shingle_hashes(txt or "", w)
            if h.size == 0:
                continue
            ids_out.extend([did] * h.size)
            langs_out.extend([lang or ""] * h.size)
            hs.append(h)
        hcat = np.concatenate(hs) if hs else np.zeros(0, dtype=np.uint64)
        return pa.table({
            key_col: pa.array(ids_out, pa.int64()),
            "lang": pa.array(langs_out, pa.string()),
            "h": pa.array(hcat, pa.uint64()),
            "bucket": pa.array(
                (hcat % np.uint64(n_buckets)).astype(np.int32), pa.int32()),
        })

    def bucket_doc_partials(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("h")["h"].transform("size")
        g = g.assign(dup=(df >= 2).astype(np.int64))
        out = g.groupby([key_col, "lang"], as_index=False).agg(
            n_sh=("h", "size"), n_dup=("dup", "sum"))
        out["n_sh"] = out["n_sh"].astype(np.int64)
        out["n_dup"] = out["n_dup"].astype(np.int64)
        out["dbucket"] = (out[key_col].to_numpy(np.int64)
                          % n_buckets).astype(np.int32)
        return out

    def lang_partials(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby([key_col, "lang"], as_index=False).agg(
            n_sh=("n_sh", "sum"), n_dup=("n_dup", "sum"))
        per["has"] = (per["n_dup"] > 0).astype(np.int64)
        out = per.groupby("lang", as_index=False).agg(
            n_docs=(key_col, "size"), n_docs_dup=("has", "sum"),
            shingles=("n_sh", "sum"), dup_shingles=("n_dup", "sum"))
        for c in ("n_docs", "n_docs_dup", "shingles", "dup_shingles"):
            out[c] = out[c].astype(np.int64)
        return out

    def finish(t: pa.Table) -> pa.Table:
        sh = t["shingles"].to_pylist()
        du = t["dup_shingles"].to_pylist()
        nd = t["n_docs"].to_pylist()
        ndd = t["n_docs_dup"].to_pylist()
        return t.append_column(
            "coverage_bp",
            pa.array([d * 10000 // s if s else 0
                      for d, s in zip(du, sh)], pa.int64()),
        ).append_column(
            "docs_dup_bp",
            pa.array([d * 10000 // n if n else 0
                      for d, n in zip(ndd, nd)], pa.int64()),
        )

    return (
        ds.map_batches(to_postings, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_doc_partials, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(lang_partials, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_docs_dup", alias_name="n_docs_dup"),
                   Sum("shingles", alias_name="shingles"),
                   Sum("dup_shingles", alias_name="dup_shingles"))
        .map_batches(finish, batch_format="pyarrow")
    )


def cdc_chunk_stats(ds, text_col: str = "text", lang_col: str = "lang",
                    k: int = 16, divisor: int = 64,
                    cfg: PipelineConfig = DEFAULT_CONFIG):
    """CONTENT-DEFINED CHUNKING dedup stats (the Rabin-fingerprint
    chunker of LBFS/restic/data-lake storage dedup): a chunk boundary
    falls after every k-char window whose Rabin-Karp rolling hash ≡ 0
    (mod ``divisor``) — boundaries move WITH content, so an insertion
    re-chunks only its neighbourhood (the property fixed-size blocks
    lack).  Per lang: chunk instances vs distinct chunks (md5-keyed) and
    the byte savings a content-addressed store would realize, as
    ``(lang, n_chunks, n_unique_chunks, total_chars, unique_chars,
    savings_bp)``.

    Same rolling hash as :func:`winnow_near_dup`
    (textstats.rolling_hashes — 61-bit Rabin-Karp the oracle recomputes
    per window position), same exchange topology as
    :func:`dup_ngram_coverage`: chunk postings (lang, h, len) bucket by
    h %% B so per-bucket distinct IS global distinct; each bucket emits
    ≤ |langs| partial rows; the final groupby carries ~5 keys.  Chunk
    TEXT never crosses an exchange — only (hash, len).
    """
    from ray.data.aggregate import Sum

    from ocr_ray.functions.textstats import rolling_hashes
    from ocr_ray.pipelines.relational import _md5_u64

    n_buckets = cfg.near_dup_coarse_buckets

    def to_chunks(t: pa.Table) -> pa.Table:
        langs, segs, lens = [], [], []
        for lang, txt in zip(t[lang_col].to_pylist(),
                             t[text_col].to_pylist()):
            txt = txt or ""
            if not txt:
                continue
            h = rolling_hashes(txt, k)
            cuts = ((np.nonzero(h % np.uint64(divisor) == 0)[0] + k)
                    .tolist() if h.size else [])
            prev = 0
            for c in cuts + [len(txt)]:
                if c <= prev:
                    continue
                seg = txt[prev:c]
                langs.append(lang or "")
                segs.append(seg)
                lens.append(len(seg))
                prev = c
        hs = _md5_u64(segs)
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "h": pa.array(hs, pa.uint64()),
            "len": pa.array(lens, pa.int64()),
            "bucket": pa.array((hs % np.uint64(n_buckets)).astype(np.int32),
                               pa.int32()),
        })

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("lang", as_index=False).agg(
            n_chunks=("len", "size"), total_chars=("len", "sum"))
        uniq = (g.drop_duplicates(subset=["lang", "h"])
                .groupby("lang", as_index=False)
                .agg(n_unique_chunks=("len", "size"),
                     unique_chars=("len", "sum")))
        out = tot.merge(uniq, on="lang")
        for c in ("n_chunks", "total_chars", "n_unique_chunks",
                  "unique_chars"):
            out[c] = out[c].astype(np.int64)
        return out

    def finish(t: pa.Table) -> pa.Table:
        tot = t["total_chars"].to_pylist()
        un = t["unique_chars"].to_pylist()
        return t.append_column(
            "savings_bp",
            pa.array([(a - b) * 10000 // a if a else 0
                      for a, b in zip(tot, un)], pa.int64()))

    return (
        ds.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_chunks", alias_name="n_chunks"),
                   Sum("n_unique_chunks", alias_name="n_unique_chunks"),
                   Sum("total_chars", alias_name="total_chars"),
                   Sum("unique_chars", alias_name="unique_chars"))
        .map_batches(finish, batch_format="pyarrow")
    )
