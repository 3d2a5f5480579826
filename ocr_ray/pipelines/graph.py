"""Distributed graph utilities — connected components over a pair Dataset.

The near-dup operators (dedup.py) emit candidate/verified pairs as a
Dataset; assigning every member of a dup cluster to the cluster's smallest
doc_id (keep-first semantics, combine_extractions.py:45-53 lifted to corpus
scale) is a connected-components problem.  Round 1 solved it with a
driver-side union-find over ``pairs.to_pandas()`` — O(corpus) driver state
at web-scale dup rates.  This module replaces it with iterated min-label
propagation + pointer jumping over Datasets:

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


def connected_components(pairs, key_col: str = "doc_id",
                         label_col: str = "dup_of", max_rounds: int = 32):
    """(id_a, id_b) pair Dataset → Dataset(key_col, label_col): one row per
    node that appears in any pair, label = min node id of its component.

    ``pairs`` may also be a pyarrow Table (tests); rows need not be unique.
    """
    import ray.data as rd

    if isinstance(pairs, pa.Table):
        if pairs.num_rows == 0:
            return _empty_labels(key_col, label_col)
        pairs = rd.from_arrow(pairs)

    def symmetrize(t: pa.Table) -> pa.Table:
        # both directions plus a self-loop per endpoint, so one message
        # round computes min over (self ∪ neighbors)
        ia, ib = t["id_a"].combine_chunks(), t["id_b"].combine_chunks()
        key = pa.concat_arrays([ib, ia, ia, ib])   # message source u
        node = pa.concat_arrays([ia, ib, ia, ib])  # message target v
        return pa.table({"key": key.cast(pa.int64()), "node": node.cast(pa.int64())})

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return _empty_labels(key_col, label_col)

    # L0: per node, min over (self ∪ neighbors) — partial min inside the
    # batch before the sort-groupby so the shuffle carries few rows
    def partial_l0(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["lbl"] = df[["key", "node"]].min(axis=1)
        g = df.groupby("node", as_index=False)["lbl"].min()
        return pa.Table.from_pandas(g, preserve_index=False)

    def min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": g["node"].iloc[:1].to_numpy(),
            "lbl": np.array([g["lbl"].min()], dtype=np.int64),
        })

    labels = (
        edges.map_batches(partial_l0, batch_format="pyarrow")
        .groupby("node")
        .map_groups(min_per_node, batch_format="pandas")
        .map_batches(lambda t: t.select(["node", "lbl"]), batch_format="pyarrow")
        .materialize()
    )

    def _total(lab) -> int:
        # driver sees one partial sum per block, never the label rows
        parts = lab.map_batches(
            lambda t: pa.table(
                {"s": pa.array([pa.compute.sum(t["lbl"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        ).take_all()
        return sum(r["s"] for r in parts)

    def as_messages(t: pa.Table) -> pa.Table:
        # label rows → (key=node, node=_NO_NODE, lbl)
        n = len(t)
        return pa.table({
            "key": t["node"],
            "node": pa.array([_NO_NODE] * n, pa.int64()),
            "lbl": t["lbl"],
        })

    def edge_messages(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["key"],
            "node": t["node"],
            "lbl": pa.nulls(len(t), pa.int64()),
        })

    def deliver(g: pd.DataFrame) -> pd.DataFrame:
        # one group per key: the label row carries L(key); every edge row
        # (key → node) receives it as a candidate label for node
        lbl_rows = g[g["node"] == _NO_NODE]
        if len(lbl_rows) == 0:  # key never labeled (cannot happen, but safe)
            return pd.DataFrame({"node": [], "lbl": []}).astype(np.int64)
        l = int(lbl_rows["lbl"].min())
        targets = g.loc[g["node"] != _NO_NODE, "node"]
        return pd.DataFrame({
            "node": targets.to_numpy(dtype=np.int64),
            "lbl": np.full(len(targets), l, dtype=np.int64),
        })

    total = _total(labels)
    for _ in range(max_rounds):
        lab_msgs = labels.map_batches(as_messages, batch_format="pyarrow")
        e_msgs = edges.map_batches(edge_messages, batch_format="pyarrow")
        merged = (
            e_msgs.union(lab_msgs)
            .groupby("key")
            .map_groups(deliver, batch_format="pandas")
            .map_batches(partial_min_node, batch_format="pyarrow")
            .groupby("node")
            .map_groups(min_per_node, batch_format="pandas")
            .map_batches(lambda t: t.select(["node", "lbl"]), batch_format="pyarrow")
            .materialize()
        )
        # pointer jump L(v) ← L(L(v)): node v queries the key L(v); every
        # label is itself a node, so each query group has its label row
        jump_q = merged.map_batches(
            lambda t: pa.table({
                "key": t["lbl"], "node": t["node"],
                "lbl": pa.nulls(len(t), pa.int64()),
            }),
            batch_format="pyarrow",
        ).materialize()
        jumped = (
            jump_q.union(merged.map_batches(as_messages, batch_format="pyarrow"))
            .groupby("key")
            .map_groups(deliver, batch_format="pandas")
            .map_batches(lambda t: t.select(["node", "lbl"]), batch_format="pyarrow")
            .materialize()
        )
        new_total = _total(jumped)
        labels = jumped
        if new_total == total:
            break
        total = new_total

    return labels.map_batches(
        lambda t: pa.table({key_col: t["node"], label_col: t["lbl"]}),
        batch_format="pyarrow",
    )


def partial_min_node(t: pa.Table) -> pa.Table:
    """Per-batch partial min(lbl) per node — shrinks the second shuffle."""
    df = t.to_pandas()
    g = df.groupby("node", as_index=False)["lbl"].min()
    return pa.Table.from_pandas(g, preserve_index=False)
