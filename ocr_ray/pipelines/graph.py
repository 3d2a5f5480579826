"""Distributed graph utilities — connected components over a pair Dataset.

The near-dup operators (dedup.py) emit candidate/verified pairs as a
Dataset; assigning every member of a dup cluster to the cluster's smallest
doc_id (keep-first semantics, combine_extractions.py:45-53 lifted to corpus
scale) is a connected-components problem.  Round 1 solved it with a
driver-side union-find over ``pairs.to_pandas()`` — O(corpus) driver state
at web-scale dup rates.  This module replaces it with a size-adaptive
worker-side solver:

* pair sets that fit ONE worker (<= small_graph_edges) run classic
  union-find in a single Ray task (repartition(1) + map_batches) — the
  driver never touches pair data, and there is exactly one execution;
* larger graphs run iterated min-label propagation + pointer jumping over
  Datasets (each round is a shuffle whose multi-second fixed cost only
  amortizes at that scale):

  L0(v)   = min(v, min of v's neighbors)           [groupby]
  L'(v)   = min over neighbors u of L(u)           [message groupby]
            (edges carry self-loops, so "neighbors" includes v itself)
  L''(v)  = L'(L'(v))                              [pointer jump groupby]
  stop when sum(L) is unchanged (labels are monotone non-increasing, so the
  total strictly decreases iff any label changed)

Pointer jumping halves the effective diameter each round ⇒ O(log d) rounds;
dup graphs built by band-bucket pairing are near-stars (d ≤ ~4), so the
loop typically runs 1-2 rounds.  Every intermediate is O(nodes-in-pairs),
partitioned on node id — nothing corpus-sized ever reaches the driver.

Implementation note: label attachment is message passing — a union of
(key=u, node=v) edge rows and (key=node, lbl) label rows grouped by key —
rather than a Dataset.join: this Ray version's hash-shuffle join operator
mis-binds key columns when an execution mixes joins and hash aggregates
(observed: "No match or multiple matches for FieldRef"), while the
sort-based groupby path is reliable.  The union is always between two
independently-materialized lineages (the shared-upstream deadlock noted in
CLAUDE.md does not apply).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _empty_labels(key_col: str, label_col: str) -> pa.Table:
    return pa.table({key_col: pa.array([], pa.int64()),
                     label_col: pa.array([], pa.int64())})


_NO_NODE = -1  # sentinel payload marking "label row" (node ids are >= 0)


def _cc_single_task(pairs, key_col: str, label_col: str):
    """Union-find over the whole (sub-worker-sized) pair set in ONE Ray
    task: repartition(1) co-locates every pair in a single block, the
    map_batches call runs path-compressed union-find there, and the result
    streams back as a normal Dataset.  The driver never holds pair data."""

    def uf(t: pa.Table) -> pa.Table:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for ia, ib in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
            ra, rb = find(int(ia)), find(int(ib))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = sorted((m, find(m)) for m in parent)
        return pa.table({
            key_col: pa.array([r[0] for r in rows], pa.int64()),
            label_col: pa.array([r[1] for r in rows], pa.int64()),
        })

    return (
        pairs.repartition(1)
        .map_batches(uf, batch_format="pyarrow", batch_size=None)
    )


def connected_components(pairs, key_col: str = "doc_id",
                         label_col: str = "dup_of", max_rounds: int = 32,
                         small_graph_edges: int | None = None):
    """(id_a, id_b) pair Dataset → Dataset(key_col, label_col): one row per
    node that appears in any pair, label = min node id of its component.

    Size-adaptive: a pair set that fits one worker's memory (<=
    ``small_graph_edges``) is solved by a classic union-find in a SINGLE
    RAY TASK (``repartition(1).map_batches`` — worker-side, never the
    driver); larger graphs run the label-propagation rounds, whose
    per-round shuffle fixed cost only amortizes at that scale.

    ``pairs`` may also be a pyarrow Table (tests); rows need not be unique.
    ``small_graph_edges`` defaults to PipelineConfig.cc_small_graph_edges.
    """
    import ray.data as rd

    from ocr_ray.config import DEFAULT_CONFIG

    if small_graph_edges is None:
        small_graph_edges = DEFAULT_CONFIG.cc_small_graph_edges

    if isinstance(pairs, pa.Table):
        if pairs.num_rows == 0:
            return _empty_labels(key_col, label_col)
        pairs = rd.from_arrow(pairs)

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return _empty_labels(key_col, label_col)
    if n_pairs <= small_graph_edges:
        return _cc_single_task(pairs, key_col, label_col)

    def symmetrize(t: pa.Table) -> pa.Table:
        # both directions plus a self-loop per endpoint, so one message
        # round computes min over (self ∪ neighbors)
        ia, ib = t["id_a"].combine_chunks(), t["id_b"].combine_chunks()
        key = pa.concat_arrays([ib, ia, ia, ib])   # message source u
        node = pa.concat_arrays([ia, ib, ia, ib])  # message target v
        return pa.table({"key": key.cast(pa.int64()), "node": node.cast(pa.int64())})

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # L0: per node, min over (self ∪ neighbors) — partial min inside the
    # batch before the shuffle; the global min is a HASH aggregate
    # (vectorized), never a per-node map_groups (Ray dispatches map_groups
    # once per GROUP at ~10-20ms each — O(nodes) groups is a scale killer)
    def partial_l0(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["lbl"] = df[["key", "node"]].min(axis=1)
        g = df.groupby("node", as_index=False)["lbl"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    def _min_per_node(ds):
        from ray.data.aggregate import Min

        return (
            ds.groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
            .map_batches(
                lambda t: pa.table({"node": t["node"], "lbl": t["lbl"]}),
                batch_format="pyarrow",
            )
        )

    labels = _min_per_node(
        edges.map_batches(partial_l0, batch_format="pyarrow")
    ).materialize()

    def _total(lab) -> int:
        # driver sees one partial sum per block, never the label rows
        parts = lab.map_batches(
            lambda t: pa.table(
                {"s": pa.array([pa.compute.sum(t["lbl"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        ).take_all()
        return sum(r["s"] for r in parts)

    N_BUCKETS = DEFAULT_CONFIG.cc_message_buckets  # POWER OF TWO (key & n-1)
    # coarse shuffle key for message delivery: the lookup inside each
    # bucket is a VECTORIZED pandas merge over every key in the bucket,
    # so per-group dispatch cost is O(buckets), not O(nodes)

    def as_messages(t: pa.Table) -> pa.Table:
        # label rows → (key=node, node=_NO_NODE, lbl)
        n = len(t)
        key = t["node"]
        return pa.table({
            "bucket": pa.compute.cast(
                pa.compute.bit_wise_and(key, N_BUCKETS - 1), pa.int32()),
            "key": key,
            "node": pa.array([_NO_NODE] * n, pa.int64()),
            "lbl": t["lbl"],
        })

    def edge_messages(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": pa.compute.cast(
                pa.compute.bit_wise_and(t["key"], N_BUCKETS - 1), pa.int32()),
            "key": t["key"],
            "node": t["node"],
            "lbl": pa.nulls(len(t), pa.int64()),
        })

    def deliver(g: pd.DataFrame) -> pd.DataFrame:
        # one coarse bucket of keys: label rows join onto edge rows by key
        # (vectorized merge), emitting (node, candidate lbl) messages
        labs = g.loc[g["node"] == _NO_NODE, ["key", "lbl"]]
        targets = g.loc[g["node"] != _NO_NODE, ["key", "node"]]
        m = targets.merge(labs, on="key", how="inner")
        if len(m) == 0:
            return pd.DataFrame({"node": np.array([], np.int64),
                                 "lbl": np.array([], np.int64)})
        out = m.groupby("node", as_index=False)["lbl"].min()
        out["lbl"] = out["lbl"].astype(np.int64)
        return out[["node", "lbl"]]

    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("OCR_RAY_CC_DEBUG"))
    total = _total(labels)
    for _round in range(max_rounds):
        _t0 = _time.monotonic()
        lab_msgs = labels.map_batches(as_messages, batch_format="pyarrow")
        e_msgs = edges.map_batches(edge_messages, batch_format="pyarrow")
        merged = _min_per_node(
            e_msgs.union(lab_msgs)
            .groupby("bucket")
            .map_groups(deliver, batch_format="pandas")
        ).materialize()
        new_total = _total(merged)
        if _dbg:
            print(f"[cc] round {_round} propagate total {total} -> {new_total} "
                  f"({_time.monotonic() - _t0:.2f}s)", flush=True)
        labels = merged
        if new_total == total:
            break  # propagate was a no-op → fixpoint (common case: L0 is
            # already correct for the star graphs bucket-min pairing builds)
        total = new_total
        # still converging: pointer jump L(v) ← L(L(v)) halves the
        # remaining diameter; node v queries the key L(v) (every label is
        # itself a node, so each query bucket has its label rows).
        # materialized: the union's other branch also reads `merged`, and
        # union over a shared live lineage deadlocks this Ray version's
        # streaming executor EVEN when the shared base is materialized
        jump_q = merged.map_batches(
            lambda t: pa.table({
                "bucket": pa.compute.cast(
                    pa.compute.bit_wise_and(t["lbl"], N_BUCKETS - 1), pa.int32()),
                "key": t["lbl"], "node": t["node"],
                "lbl": pa.nulls(len(t), pa.int64()),
            }),
            batch_format="pyarrow",
        ).materialize()
        jumped = (
            jump_q.union(merged.map_batches(as_messages, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(deliver, batch_format="pandas")
            .map_batches(lambda t: t.select(["node", "lbl"]), batch_format="pyarrow")
            .materialize()
        )
        labels = jumped
        total = _total(jumped)
        if _dbg:
            print(f"[cc] round {_round} jump total -> {total} "
                  f"({_time.monotonic() - _t0:.2f}s)", flush=True)

    return labels.map_batches(
        lambda t: pa.table({key_col: t["node"], label_col: t["lbl"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# web-graph edge extraction
# ---------------------------------------------------------------------------

_HREF_RE = None  # compiled lazily per process (bytes regex)
_ABS_RE = None


def outlink_stats(pages, n_buckets: int = 64):
    """WEB-GRAPH OUTLINK extraction over raw pages — the hyperlink-graph
    build step of a crawl pipeline (the CommonCrawl host-graph / WebGraph
    edge-count analogue; the reference's crawl corpus carries the same
    link-bearing html payloads its scripts iterate one file at a time,
    pdf_extractor.py:1-40).  Every ``href="…"`` attribute in the raw html
    payload is extracted with one compiled bytes regex; absolute http(s)
    hrefs keep their own host+path (path '' → '/'), anything else
    (site-relative, fragment, mailto) resolves to the PAGE's host with
    the raw href as path.  Returns one row per (host, path):

      ``(host, path, n_links, n_pages)`` — total occurrences, and the
      number of page rows linking there at least once.

    Scale shape: the standard two-level exact reduce (cf. top_terms) —
    a per-batch Counter partial means the shuffle carries (host, path)
    PARTIAL COUNT rows, never link instances; the coarse
    crc32(host|path) % n_buckets key bounds group dispatch at 64 while a
    (host, path) key lives entirely in ONE bucket, so per-bucket pandas
    sums are global sums and unbounded link-target cardinality never
    turns into per-key dispatch.  n_pages stays exact across batches
    because a page row lives in exactly one batch.
    """
    import collections
    import re
    import zlib

    import pyarrow.compute as pc

    global _HREF_RE, _ABS_RE
    if _HREF_RE is None:
        _HREF_RE = re.compile(rb'href="([^"]*)"')
        _ABS_RE = re.compile(r'^https?://([^/]+)(/.*)?$')
    href_re, abs_re = _HREF_RE, _ABS_RE

    def partial(t: pa.Table) -> pa.Table:
        links: collections.Counter = collections.Counter()
        pages_c: collections.Counter = collections.Counter()
        hosts = pc.fill_null(pc.struct_field(
            pc.extract_regex(t["url"], r"^[a-z]+://(?P<h>[^/]+)/"), "h"), "")
        for phost, payload in zip(hosts.to_pylist(), t["html"].to_pylist()):
            seen: collections.Counter = collections.Counter()
            for raw in href_re.findall(payload or b""):
                href = raw.decode("utf-8", "ignore")
                m = abs_re.match(href)
                if m:
                    seen[(m.group(1), m.group(2) or "/")] += 1
                else:
                    seen[(phost, href)] += 1
            links.update(seen)
            pages_c.update(seen.keys())
        keys = list(links.keys())
        return pa.table({
            "host": pa.array([k[0] for k in keys], pa.string()),
            "path": pa.array([k[1] for k in keys], pa.string()),
            "n_links": pa.array([links[k] for k in keys], pa.int64()),
            "n_pages": pa.array([pages_c[k] for k in keys], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32((k[0] + "\x01" + k[1]).encode()) % n_buckets
                 for k in keys], pa.int32()),
        })

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["host", "path"], as_index=False)[
            ["n_links", "n_pages"]].sum()
        out["n_links"] = out["n_links"].astype("int64")
        out["n_pages"] = out["n_pages"].astype("int64")
        return out

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_sum, batch_format="pandas")
    )


_ANCHOR_RE = None


def anchor_text_stats(pages, n_buckets: int = 64):
    """ANCHOR-TEXT corpus build over raw pages — the other half of the
    web-graph product (anchor text powers query-independent ranking and
    query expansion; built from the same link-bearing payloads as
    :func:`outlink_stats`).  Every ``<a href="…">text</a>`` occurrence
    contributes its inner text verbatim; returns one row per anchor:

      ``(anchor, n_links, n_hosts)`` — total occurrences and the number
      of DISTINCT linking hosts.

    Scale shape: the distinct-count dimension forces the partial rows to
    carry (anchor, host) pairs — still pre-counted per batch (the
    shuffle never sees link instances), bucketed by crc32(anchor) %
    n_buckets so an anchor lives entirely in ONE bucket and the
    per-bucket pandas nunique is the exact global distinct count.
    Partial-row cardinality is bounded by anchors×hosts actually
    co-occurring, not by link volume.
    """
    import collections
    import re
    import zlib

    import pyarrow.compute as pc

    global _ANCHOR_RE
    if _ANCHOR_RE is None:
        _ANCHOR_RE = re.compile(rb'<a href="[^"]*">([^<]*)</a>')
    anchor_re = _ANCHOR_RE

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        hosts = pc.fill_null(pc.struct_field(
            pc.extract_regex(t["url"], r"^[a-z]+://(?P<h>[^/]+)/"), "h"), "")
        for phost, payload in zip(hosts.to_pylist(), t["html"].to_pylist()):
            for raw in anchor_re.findall(payload or b""):
                c[(raw.decode("utf-8", "ignore"), phost)] += 1
        keys = list(c.keys())
        return pa.table({
            "anchor": pa.array([k[0] for k in keys], pa.string()),
            "host": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(k[0].encode()) % n_buckets for k in keys],
                pa.int32()),
        })

    def bucket_agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("anchor", as_index=False).agg(
            n_links=("n", "sum"), n_hosts=("host", "nunique"))
        out["n_links"] = out["n_links"].astype("int64")
        out["n_hosts"] = out["n_hosts"].astype("int64")
        return out

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_agg, batch_format="pandas")
    )
