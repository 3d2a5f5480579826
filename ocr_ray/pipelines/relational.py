"""Driver-contract query implementations over /root/testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
row set is verifiable against an ANSI-SQL oracle in DuckDB
(__ray_entry__.oracle_sql).  Conventions for exact value-hash parity:

* every double aggregate is integer-scaled (cents / 1e-4 units) BEFORE the
  sum so distributed summation order cannot perturb low bits;
* rounding uses half-away-from-zero to match DuckDB ``ROUND``;
* computed columns share names between Ray and SQL.

Scale discipline: ``columns=`` pushdown at every read; small sides are
broadcast via ``ray.put`` (never shuffled); aggregations pre-combine inside
``map_batches`` so the ``groupby`` only sees one row per key per batch.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ocr_ray.config import DEFAULT_CONFIG
from ocr_ray.functions import gates, textnorm, textstats


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _table_num_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet METADATA (no data read); accepts the same
    file-or-directory layouts as _read (see CLAUDE.md read_parquet note)."""
    import glob as _glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    files = [path] if os.path.isfile(path) else sorted(
        _glob.glob(os.path.join(path, "*.parquet")))
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _concat_nonempty(ds) -> pa.Table:
    """Driver-side collect that survives Ray's SCHEMA-LESS empty blocks
    (sort-based groupby / filtered reads emit them; see CLAUDE.md):
    drop zero-column tables before pa.concat_tables."""
    return pa.concat_tables(
        [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns])


def _cents(x, scale: int = 100):
    """double → integer units, half-away-from-zero like DuckDB ROUND
    (Arrow calls this round mode 'half_towards_infinity')."""
    return pc.cast(
        pc.round(pc.multiply(x, scale), round_mode="half_towards_infinity"), pa.int64()
    )



def _grouped_sum(ds, make_measures, keys: list[str], sum_cols: list[str],
                 count_col: str):
    """Pre-aggregate per batch then a tiny global groupby (the partial-
    aggregation pattern used by every roll-up query here).

    ``make_measures(batch) -> pa.Table`` emits key columns + integer measure
    columns; each batch is group-summed locally (one row per key per batch)
    before the shuffle, and ``count_col`` counts input rows.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        m = make_measures(t)
        df = m.to_pandas()
        agg = {c: (c, "sum") for c in sum_cols}
        agg[count_col] = ((sum_cols[0] if sum_cols else keys[0]), "size")
        g = df.groupby(keys, as_index=False).agg(**agg)
        g[count_col] = g[count_col].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys[0] if len(keys) == 1 else keys)
        .aggregate(*[Sum(c, alias_name=c) for c in sum_cols],
                   Sum(count_col, alias_name=count_col))
    )


# ---------------------------------------------------------------------------
# gates / classify / normalize over documents
# ---------------------------------------------------------------------------

def lang_gate_counts(sf_dir: str):
    """F-gate roll-up: candidate docs per allowed lang (lang, n_docs)."""
    allow = pa.array(DEFAULT_CONFIG.lang_allowlist)

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["lang"], value_set=allow),
            pc.greater_equal(t["n_chars"], DEFAULT_CONFIG.gate_min_text_length),
        )
        return t.filter(keep)

    ds = _read(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        gate, batch_format="pyarrow"
    )
    from ray.data.aggregate import Count

    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def gate_verdicts(sf_dir: str):
    """Full gibberish/lang gate verdict per document (E2 as data)."""

    def verdict(t: pa.Table) -> pa.Table:
        out = gates.pre_classify(t, DEFAULT_CONFIG)
        return out.select(["doc_id", "is_candidate", "reject_reason"])

    return _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        verdict, batch_format="pyarrow"
    )


def dollar_filter(sf_dir: str):
    """Dollar-amount predicate (F1) with deterministic derived amounts:
    text2 = text || ' costs $' || n_chars  → has_dollar per doc."""

    def f(t: pa.Table) -> pa.Table:
        text2 = pc.binary_join_element_wise(
            t["text"],
            pc.cast(t["n_chars"], pa.string()),
            " costs $",
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "has_dollar": gates.dollar_page_mask(text2, DEFAULT_CONFIG),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


def keyword_filter(sf_dir: str):
    """Keyword page predicate (F3) with deterministic injected keywords."""

    def f(t: pa.Table) -> pa.Table:
        # doc_id % 5 == 0 → append a keyword phrase (deterministic signal)
        m5 = pc.equal(pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 5), 5)), 0)
        suffix = pc.if_else(m5, pa.scalar(" the mortgage holder is listed"), pa.scalar(""))
        text3 = pc.binary_join_element_wise(t["text"], suffix, "")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "has_keyword": gates.keyword_page_mask(text3, DEFAULT_CONFIG),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


_MONEY_FORMS = ("$1,320,000", "Included", "1%", "Inside $10,000 / Outside $10,000",
                "", "N/A")


def money_normalize(sf_dir: str):
    """Money normalization (E4) over deterministic derived raw values:
    raw = _MONEY_FORMS[doc_id % 7], or '$'||n_chars for doc_id%7==6."""

    def f(t: pa.Table) -> pa.Table:
        mod = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 7), 7))
        raw = pc.binary_join_element_wise("$", pc.cast(t["n_chars"], pa.string()), "")
        for i in range(len(_MONEY_FORMS) - 1, -1, -1):
            raw = pc.if_else(pc.equal(mod, i), pa.scalar(_MONEY_FORMS[i]), raw)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "raw": raw,
                "norm": textnorm.normalize_money_array(raw),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


def quality_scores(sf_dir: str):
    def f(t: pa.Table) -> pa.Table:
        cols = textstats.quality_columns(t["text"])
        return pa.table({"doc_id": t["doc_id"], **cols})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def langid(sf_dir: str):
    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "pred_lang": textstats.langid_column(t["text"])}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def token_counts(sf_dir: str):
    def f(t: pa.Table) -> pa.Table:
        cols = textstats.token_count_columns(t["text"])
        return pa.table({"doc_id": t["doc_id"], **cols})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def fingerprints(sf_dir: str):
    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "fingerprint": textstats.md5_fingerprint(t["text"])}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def status_rollup(sf_dir: str):
    """H1/I2 analogue: MATCH/MISMATCH verdicts + groupby count."""

    def f(t: pa.Table) -> pa.Table:
        status = pc.if_else(
            pc.equal(pc.cast(pc.utf8_length(t["text"]), pa.int64()), t["n_chars"]),
            pa.scalar("MATCH"),
            pa.scalar("MISMATCH"),
        )
        return pa.table({"status": status})

    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "documents", ["text", "n_chars"])
        .map_batches(f, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Count(alias_name="n"))
    )


# ---------------------------------------------------------------------------
# events: keep-first dedup (J2), grouped counts (I2)
# ---------------------------------------------------------------------------

_EVENT_BUCKETS = 64  # coarse shuffle key over user_id: the exact per-key
# grouping happens VECTORIZED inside each bucket — never one Ray
# map_groups dispatch (~10-20ms) per distinct (user, ...) key, which at
# 10^8 users would be 10^8 dispatches (CLAUDE.md sharp edge)


def _bucket_by_user(t: pa.Table) -> pa.Table:
    return t.append_column(
        "ubucket",
        pc.cast(pc.bit_wise_and(t["user_id"], _EVENT_BUCKETS - 1), pa.int32()),
    )


def dedup_first_event(sf_dir: str):
    """Keep-first per (user_id, event_type) ordered by (ts, event_id).

    One coarse-bucket shuffle; inside each bucket a single global sort +
    ``drop_duplicates(keep='first')`` resolves EVERY key in the bucket in
    one vectorized pandas call."""

    def first_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).drop_duplicates(
            subset=["user_id", "event_type"], keep="first"
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "first_event_id": g["event_id"].to_numpy(),
                "first_ts": g["ts"].to_numpy(),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_type", "event_id", "ts"])
        .map_batches(_bucket_by_user, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(first_per_bucket, batch_format="pandas")
    )


def event_counts(sf_dir: str):
    """Grouped counts + integer-cent sums with per-batch pre-aggregation."""
    return _grouped_sum(
        _read(sf_dir, "events", ["event_type", "value"]),
        lambda t: pa.table({"event_type": t["event_type"],
                            "value_cents": _cents(t["value"])}),
        keys=["event_type"], sum_cols=["value_cents"], count_col="n",
    )


# ---------------------------------------------------------------------------
# TPC-H-ish: aggregate, top-k, broadcast joins
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape with integer-scaled measures and per-batch partials."""

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.cast(t["l_quantity"], pa.int64()),
            "sum_base_cents": _cents(t["l_extendedprice"]),
            "sum_disc_e4": _cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
                10000),
        })

    return _grouped_sum(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]),
        measures, keys=["l_returnflag", "l_linestatus"],
        sum_cols=["sum_qty", "sum_base_cents", "sum_disc_e4"], count_col="n",
    )


def topk_orders(sf_dir: str, k: int = 10):
    """Top-k (J5 global analogue) WITHOUT a global sort: every batch emits
    its own top-k (vectorized), then a two-level reduce — one
    ``repartition(1)`` task merges the k-row partials so the DRIVER only
    ever receives the final k rows (a full ``sort().limit()`` would
    shuffle the entire table for 10 rows; a driver-side concat would hold
    k × n_batches rows at 10^6+ blocks)."""

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )[:k]
        return t.take(idx)

    out = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(topk, batch_format="pyarrow")          # per-batch partial
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)  # final
    )
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def revenue_by_mktsegment(sf_dir: str):
    """Broadcast join (G2/G3 pattern): customer → segment shipped once via
    ray.put; orders aggregated per segment with per-batch partials."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    seg_map = dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist()))
    ref = ray.put(seg_map)

    def measures(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        segs = [m.get(ck) for ck in t["o_custkey"].to_pylist()]
        return pa.table({
            "c_mktsegment": pa.array(segs, pa.string()),
            "revenue_cents": _cents(t["o_totalprice"]),
        })

    return _grouped_sum(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        measures, keys=["c_mktsegment"], sum_cols=["revenue_cents"],
        count_col="n_orders",
    )


def customers_by_region(sf_dir: str):
    """Nested broadcast join chain (G4 analogue): nation→region dims
    broadcast, customer fact aggregated per region name."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nmap = {
        nk: rmap[rk]
        for nk, rk in zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    }
    ref = ray.put(nmap)

    def measures(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        names = [m.get(nk) for nk in t["c_nationkey"].to_pylist()]
        return pa.table({
            "r_name": pa.array(names, pa.string()),
            "acctbal_cents": _cents(t["c_acctbal"]),
        })

    return _grouped_sum(
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"]),
        measures, keys=["r_name"], sum_cols=["acctbal_cents"],
        count_col="n_customers",
    )


def rollup_customer_balance(sf_dir: str):
    """Hierarchical ROLLUP aggregate (``GROUP BY ROLLUP(r_name, n_name)``):
    per-nation, per-region-subtotal and grand-total customer counts and
    balance sums in one result, with the literal ``'ALL'`` as the
    rolled-up-level sentinel (both sides COALESCE, so the hash compare
    never depends on NULL formatting).

    Scale shape: only the FINEST level (region × nation, cardinality =
    #nations) is aggregated distributed — per-batch partials then a tiny
    groupby.  The coarser levels are pure re-aggregations of that finest
    result, so they are derived on the ~25-row table in a single
    ``repartition(1)`` task; no second pass over the fact table, no extra
    shuffle, regardless of corpus size.
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nmap = {
        nk: (nm, rmap[rk])
        for nk, nm, rk in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    }
    ref = ray.put(nmap)

    def measures(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        pairs = [m[nk] for nk in t["c_nationkey"].to_pylist()]
        return pa.table({
            "r_name": pa.array([p[1] for p in pairs], pa.string()),
            "n_name": pa.array([p[0] for p in pairs], pa.string()),
            "bal_cents": _cents(t["c_acctbal"]),
        })

    finest = _grouped_sum(
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"]),
        measures, keys=["r_name", "n_name"], sum_cols=["bal_cents"],
        count_col="n_customers",
    )

    def add_levels(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["r_name", "n_name", "n_customers", "bal_cents"]
        reg = df.groupby("r_name", as_index=False).agg(
            n_customers=("n_customers", "sum"), bal_cents=("bal_cents", "sum"))
        reg["n_name"] = "ALL"
        tot = pd.DataFrame({
            "r_name": ["ALL"], "n_name": ["ALL"],
            "n_customers": [df["n_customers"].sum()],
            "bal_cents": [df["bal_cents"].sum()],
        })
        out = pd.concat([df[cols], reg[cols], tot[cols]], ignore_index=True)
        out["n_customers"] = out["n_customers"].astype("int64")
        out["bal_cents"] = out["bal_cents"].astype("int64")
        return out

    return finest.repartition(1).map_batches(add_levels, batch_format="pandas")


def price_quantity_corr(sf_dir: str):
    """Algebraic Pearson correlation (quantity vs price, per return flag)
    from exact integer moments: each batch contributes int64 partial sums
    (n, Σq, Σp, Σq², Σp², Σqp) over half-away-rounded integer units, the
    groupby sums one row per key per batch, and the final ~3-row finalize
    does the float math in Python ints → float64 with the SAME expression
    shape as the SQL oracle (``a / sqrt(b·c)`` on exact integers cast to
    double) so both sides round identically at 6 dp.

    Scale shape: corr is algebraic — the moments are a constant-width
    combiner, so the shuffle moves one row per (key × batch) no matter the
    corpus size, and no float ever enters the distributed sum (summation
    order cannot perturb bits).  Prices are rounded to whole units (not
    cents) so Σp² stays far inside int64 at 10^9-row scale.
    """
    import math

    def measures(t: pa.Table) -> pa.Table:
        q = _cents(t["l_quantity"], 1)
        p = _cents(t["l_extendedprice"], 1)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "sq": q,
            "sp": p,
            "sqq": pc.multiply(q, q),
            "spp": pc.multiply(p, p),
            "sqp": pc.multiply(q, p),
        })

    moments = _grouped_sum(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]),
        measures, keys=["l_returnflag"],
        sum_cols=["sq", "sp", "sqq", "spp", "sqp"], count_col="n_rows",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in df.itertuples(index=False):
            n, sq, sp = int(r.n_rows), int(r.sq), int(r.sp)
            a = n * int(r.sqp) - sq * sp
            b = n * int(r.sqq) - sq * sq
            c = n * int(r.spp) - sp * sp
            corr = float(a) / math.sqrt(float(b) * float(c))
            out.append((r.l_returnflag, n, float(np.round(corr, 6))))
        res = pd.DataFrame(out, columns=["l_returnflag", "n_rows", "corr_qty_price"])
        res["n_rows"] = res["n_rows"].astype("int64")
        return res

    return moments.repartition(1).map_batches(finalize, batch_format="pandas")


def revenue_by_orderpriority(sf_dir: str):
    """Fact-to-fact join restated as broadcast map (lineitem × orders):
    the orders→priority map is broadcast (small at test scale; at corpus
    scale this becomes a co-partitioned hash join on l_orderkey)."""
    import pyarrow.parquet as pq

    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    omap = dict(zip(orders["o_orderkey"].to_pylist(), orders["o_orderpriority"].to_pylist()))
    ref = ray.put(omap)

    def measures(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        prio = [m.get(ok) for ok in t["l_orderkey"].to_pylist()]
        return pa.table({
            "o_orderpriority": pa.array(prio, pa.string()),
            "revenue_e4": _cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
                10000),
        })

    return _grouped_sum(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]),
        measures, keys=["o_orderpriority"], sum_cols=["revenue_e4"],
        count_col="n_items",
    )


_FIELD_SNIPPETS = (
    " contact bob@example.com or (555) 123-4567 on 12/31/2024",
    " see https://example.org/page?id=77 on 2024-01-15 [X] done",
    " price $1,234.56 marked",
    "",
)


def field_extraction(sf_dir: str):
    """Structured-field regex extractor (B7 analogue) over deterministic
    derived text: text4 = text || _FIELD_SNIPPETS[doc_id % 4]."""
    from ocr_ray.functions.fields import extract_fields

    def f(t: pa.Table) -> pa.Table:
        mod = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 4), 4))
        suffix = pa.nulls(len(t), pa.string())
        for i in range(3, -1, -1):
            suffix = pc.if_else(pc.equal(mod, i), pa.scalar(_FIELD_SNIPPETS[i]), suffix)
        text4 = pc.binary_join_element_wise(t["text"], suffix, "")
        return extract_fields(
            pa.table({"doc_id": t["doc_id"], "text": text4}))

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def dynamic_keyword_filter(sf_dir: str):
    """F4 analogue — keywords DERIVED from an upstream table (p_type words
    of small parts), broadcast once via ray.put, substring-matched against
    text5 = text || ' ' || lower(p_type of partkey doc_id % 200)."""
    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type", "p_size"])
    kws = sorted({
        w
        for ptype, size in zip(part["p_type"].to_pylist(), part["p_size"].to_pylist())
        if size > 40
        for w in ptype.lower().split()
    })
    # p_partkey is contiguous 0..N-1: a positional Arrow array indexed by
    # partkey turns the lookup into a vectorized take (no python dict)
    order = pc.sort_indices(part["p_partkey"])
    ptype_by_key = pc.utf8_lower(part["p_type"].combine_chunks().take(order))
    ref = ray.put((kws, ptype_by_key))

    def f(t: pa.Table) -> pa.Table:
        keywords, ptypes = ray.get(ref)
        # (doc_id % 200) → 0-based partkey → positional idx
        idx = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 200), 200))
        suffix = ptypes.take(pc.cast(idx, pa.int64()))
        t5 = pc.binary_join_element_wise(
            pc.utf8_lower(pc.coalesce(t["text"], pa.scalar(""))), suffix, " "
        )
        mask = pa.array([False] * len(t), pa.bool_()) if len(t) else pa.array([], pa.bool_())
        for kw in keywords:  # same vectorized shape as gates.keyword_page_mask
            mask = pc.or_(mask, pc.match_substring(t5, kw))
        return pa.table({
            "doc_id": t["doc_id"],
            "has_keyword": pc.cast(mask, pa.bool_()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def hash_join_revenue(sf_dir: str):
    """Large-large shuffle join via Dataset.join (hash-partitioned on the
    key — the non-broadcast path for when neither side fits in memory),
    then the usual integer-scaled rollup per o_orderpriority."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    return _grouped_sum(
        joined,
        lambda t: pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "revenue_e4": _cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])),
                10000),
        }),
        keys=["o_orderpriority"], sum_cols=["revenue_e4"], count_col="n_items",
    )


_COVERAGE_NAME_POOL = (
    "Building #1",
    "Building incl Pumps and Canopy",
    "Business Personal Property",
    "BPP",
    "BPP Off Premises Extension",
    "Money & Securities",
    "Money and Securities - Counterfeit",
    "Business Income with Extra Expense",
    "Wind & Hail Deductible",
    "Employee Dishonesty",
)


def coverage_classify(sf_dir: str):
    """E1 rule-table classifier over deterministic derived names:
    name = _COVERAGE_NAME_POOL[doc_id % 10]."""
    from ocr_ray.functions.classify import classify_name

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        names = [_COVERAGE_NAME_POOL[d % len(_COVERAGE_NAME_POOL)] for d in ids]
        return pa.table({
            "doc_id": t["doc_id"],
            "coverage_name": pa.array(names, pa.string()),
            "family": pa.array([classify_name(n) for n in names], pa.string()),
        })

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        f, batch_format="pyarrow"
    )


def _canonicalize_urls(u):
    """The E7 canonicalization kernel over an Arrow string array: strip
    fragment, lowercase scheme+host (path case preserved), strip one
    trailing slash.  Shared by url_canonicalize and keep_best_per_url so
    the two operators can never diverge."""
    s1 = pc.replace_substring_regex(u, r"#.*", "")
    schemehost = pc.struct_field(
        pc.extract_regex(s1, r"(?P<m>^[^/]*//[^/]*)"), "m")
    rest = pc.replace_substring_regex(s1, r"^[^/]*//[^/]*", "")
    s2 = pc.binary_join_element_wise(
        pc.utf8_lower(pc.coalesce(schemehost, pa.scalar(""))), rest, "")
    return pc.replace_substring_regex(s2, r"/$", "")


def url_canonicalize(sf_dir: str):
    """E7 analogue — canonical url derivation: strip fragment, lowercase
    scheme+host, strip one trailing slash; over deterministic derived urls."""

    def f(t: pa.Table) -> pa.Table:
        mod = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 3), 3))
        tail = pc.if_else(pc.equal(mod, 0), pa.scalar("?id=7#frag"),
               pc.if_else(pc.equal(mod, 1), pa.scalar("/"), pa.scalar("?id=7")))
        u = pc.binary_join_element_wise(
            pc.binary_join_element_wise(
                "HTTPS://Example.ORG/Path", pc.cast(t["doc_id"], pa.string()), ""),
            tail, "")
        return pa.table({
            "doc_id": t["doc_id"],
            "raw_url": u,
            "canon_url": _canonicalize_urls(u),
        })

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        f, batch_format="pyarrow"
    )


def suppliers_by_nation(sf_dir: str):
    """Supplier roll-up (completes table coverage): count + acctbal cents
    per nation name via broadcast dim join."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    ref = ray.put(nmap)

    def measures(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        names = [m.get(nk) for nk in t["s_nationkey"].to_pylist()]
        return pa.table({
            "n_name": pa.array(names, pa.string()),
            "acctbal_cents": _cents(t["s_acctbal"]),
        })

    return _grouped_sum(
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]),
        measures, keys=["n_name"], sum_cols=["acctbal_cents"],
        count_col="n_suppliers",
    )


def recent_lineitems(sf_dir: str):
    """Row-group predicate pushdown at the read (prune-at-the-read): the
    shipdate filter is a pyarrow dataset expression evaluated against
    parquet statistics BEFORE bytes leave storage."""
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_shipdate", "l_quantity"],
        filter=(pads.field("l_shipdate") >= pads.scalar(
            pd.Timestamp("1995-01-01"))),
    )
    return _grouped_sum(
        ds,
        lambda t: pa.table({
            "l_returnflag": t["l_returnflag"],
            "sum_qty": pc.cast(t["l_quantity"], pa.int64()),
        }),
        keys=["l_returnflag"], sum_cols=["sum_qty"], count_col="n",
    )


def orders_by_month(sf_dir: str):
    """Temporal groupby: orders + integer-cent revenue per calendar month."""
    def measures(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t["o_orderdate"], unit="month")
        return pa.table({
            "month": month,
            "revenue_cents": _cents(t["o_totalprice"]),
        })

    out = _grouped_sum(
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]),
        measures, keys=["month"], sum_cols=["revenue_cents"], count_col="n",
    )

    def fix_ts(t: pa.Table) -> pa.Table:
        i = t.column_names.index("month")
        return t.set_column(i, "month", t["month"].cast(pa.timestamp("us")))

    return out.map_batches(fix_ts, batch_format="pyarrow")


def entity_key_union(sf_dir: str):
    """Multi-source UNION + distributed DISTINCT: one id space built from
    three tables (customer keys, supplier keys, event user ids), each row
    tagged with how many sources contain the key and the lexicographically
    first origin — the id-reconciliation step of an entity-resolution
    pipeline.

    Three independent pruned reads are unioned (safe: no shared upstream,
    which is the documented deadlock case), then ONE shuffle on
    md5(key) % 64 carries batch-level pre-deduped (key, origin) pairs;
    per bucket a vectorized pandas pass collapses to one row per key.
    """

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def tag(col: str, origin: str):
        def f(t: pa.Table) -> pa.Table:
            keys = pc.unique(t[col])
            b = _md5_mod(keys.to_pylist(), n_buckets)
            return pa.table({
                "key": pc.cast(keys, pa.int64()),
                "origin": pa.array([origin] * len(keys), pa.string()),
                "bucket": pa.array(b.astype(np.int32), pa.int32()),
            })
        return f

    parts = [
        _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            tag("c_custkey", "customer"), batch_format="pyarrow"),
        _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
            tag("s_suppkey", "supplier"), batch_format="pyarrow"),
        _read(sf_dir, "events", ["user_id"]).map_batches(
            tag("user_id", "events"), batch_format="pyarrow"),
    ]

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["key", "origin"]].drop_duplicates()
        out = d.groupby("key", as_index=False).agg(
            n_sources=("origin", "nunique"), first_origin=("origin", "min"))
        out["key"] = out["key"].astype("int64")
        out["n_sources"] = out["n_sources"].astype("int64")
        return out

    return (
        parts[0].union(parts[1], parts[2])
        .groupby("bucket")
        .map_groups(collapse, batch_format="pandas")
    )


def part_attributes_long(sf_dir: str):
    """UNPIVOT (wide→long melt): the part table's numeric attributes
    (size, retail price cents) exploded into (p_partkey, attr, value)
    rows — the schema-normalization step before a generic feature store.
    Embarrassingly parallel: a per-batch column explode, no shuffle,
    output exactly 2× input rows."""

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = pc.cast(t["p_partkey"], pa.int64())
        a = pa.table({
            "p_partkey": keys,
            "attr": pa.array(["size"] * n, pa.string()),
            "value": pc.cast(t["p_size"], pa.int64()),
        })
        b = pa.table({
            "p_partkey": keys,
            "attr": pa.array(["price_cents"] * n, pa.string()),
            "value": _cents(t["p_retailprice"]),
        })
        return pa.concat_tables([a, b])

    return _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"]).map_batches(
        melt, batch_format="pyarrow"
    )


def sample_per_source(sf_dir: str, quota: int = 10):
    """Grouped quota sampling: the ``quota`` documents per source with the
    smallest md5(doc_id) — a deterministic, engine-independent "random"
    sample with an exact per-group size, the stratified-with-hard-quota
    variant of :func:`stratified_sample` (which keeps a RATE, not a
    count).

    Grouped top-k topology: per-batch vectorized head-k per source, then
    a ``repartition(1)`` merge of ≤ k × #sources × #batches partial rows
    — never a global sort; the driver only receives the final quota rows.
    """
    import hashlib

    def rank_key(t: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(str(d).encode()).hexdigest()
            for d in t["doc_id"].to_pylist()
        ]
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "h": pa.array(h, pa.string()),
        })

    def headk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"])
        return df.groupby("source", as_index=False).head(quota)

    out = (
        _read(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(rank_key, batch_format="pyarrow")
        .map_batches(headk, batch_format="pandas")
        .repartition(1)
        .map_batches(headk, batch_format="pandas", batch_size=None)
    )
    return out.select_columns(["doc_id", "source"])


def embedding_centroids(sf_dir: str, scale: int = 1_000_000):
    """Per-label embedding centroid as EXACT integer component sums
    (label, pos, sum_scaled, n): each float32 component is scaled to
    int64 micro-units (half-away, float64 math identical on both
    engines) BEFORE the distributed sum, so summation order cannot
    perturb the centroid — the mean is ``sum_scaled / n`` derivable
    downstream at any precision.

    Per-batch partials are one numpy matmul-free column sum per label
    (rows × dim → labels × dim), so the shuffle carries
    #labels × dim × #batches rows — constant width in the corpus size.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from ocr_ray.pipelines.simsearch import _to_matrix

        mat = _to_matrix(t["embedding"]) * scale
        ints = np.copysign(np.floor(np.abs(mat) + 0.5), mat).astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False)
        dim = ints.shape[1]
        out_l, out_p, out_s, out_n = [], [], [], []
        for lab in np.unique(labels):
            sub = ints[labels == lab]
            out_l.extend([int(lab)] * dim)
            out_p.extend(range(1, dim + 1))
            out_s.extend(sub.sum(axis=0).tolist())
            out_n.extend([sub.shape[0]] * dim)
        return pa.table({
            "label": pa.array(out_l, pa.int64()),
            "pos": pa.array(out_p, pa.int64()),
            "sum_scaled": pa.array(out_s, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
        })

    return (
        _read(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "pos"])
        .aggregate(Sum("sum_scaled", alias_name="sum_scaled"),
                   Sum("n", alias_name="n"))
    )


def event_transition_counts(sf_dir: str):
    """Event-sequence mining: global counts of (prev_type → next_type)
    transitions within each user's time-ordered event stream — the
    Markov-chain transition matrix of the clickstream.

    One shuffle on md5(user_id) % 64 (user streams co-located), one
    vectorized pandas pass per bucket: sort by (user, ts, event_id),
    shift, mask cross-user seams, pre-count the ≤ types² transition
    pairs; the global groupby then sums tiny partials.  Ordering ties on
    equal ts are broken by event_id on both engines.
    """

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def prep(t: pa.Table) -> pa.Table:
        b = _md5_mod(t["user_id"].to_pylist(), n_buckets)
        return t.append_column("bucket", pa.array(b.astype(np.int32), pa.int32()))

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "ts", "event_id"])
        prev = d["event_type"].shift()
        same = d["user_id"].eq(d["user_id"].shift())
        f = pd.DataFrame({"prev_type": prev[same], "next_type": d["event_type"][same]})
        out = f.groupby(["prev_type", "next_type"], as_index=False).size()
        out = out.rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["prev_type", "next_type"], as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(transitions, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def event_value_outliers(sf_dir: str):
    """Statistical outlier detection: events whose value exceeds their
    type's mean + 3σ (population σ) — the z-score gate of a telemetry /
    quality pipeline.

    Two bounded passes: (1) exact int64 moment partials (n, Σv, Σv²) per
    event_type (constant-width combiner, tiny groupby), (2) the per-type
    float threshold ``μ + 3σ`` is computed ONCE driver-side from the
    exact integers with the same expression shape as the SQL oracle,
    broadcast, and applied as a vectorized compare — floats never enter
    a distributed sum, so the row set is deterministic.
    """
    import math

    def measures(t: pa.Table) -> pa.Table:
        v = _cents(t["value"])
        return pa.table({
            "event_type": t["event_type"],
            "sv": v,
            "svv": pc.multiply(v, v),
        })

    mom = _grouped_sum(
        _read(sf_dir, "events", ["event_type", "value"]),
        measures, keys=["event_type"], sum_cols=["sv", "svv"], count_col="n",
    ).to_pandas()

    thr = {}
    for r in mom.itertuples(index=False):
        n, sv, svv = int(r.n), int(r.sv), int(r.svv)
        sig = math.sqrt((float(n) * float(svv) - float(sv) * float(sv))
                        / (float(n) * float(n)))
        thr[r.event_type] = float(sv) / float(n) + 3.0 * sig
    ref = ray.put(thr)

    def flag(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        v = _cents(t["value"])
        lim = pa.array([m[et] for et in t["event_type"].to_pylist()],
                       pa.float64())
        keep = pc.greater(pc.cast(v, pa.float64()), lim)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "value_cents": v,
        }).filter(keep)

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        flag, batch_format="pyarrow"
    )


def weekly_retention(sf_dir: str):
    """Cohort retention: per activity week, how many distinct users were
    active AND came back the following week (the week-over-week retention
    curve).  Week index = days-since-2020-01-01 // 7 (anchored, so both
    engines bucket identically with no locale week-start semantics).

    One shuffle on md5(user_id) % 64 carrying DISTINCT (user, week_idx)
    pairs pre-deduped per batch; inside a bucket the user's whole week
    set is co-located, so next-week membership is one vectorized
    self-merge; the second groupby only sums per-week partial counts
    (cardinality = #weeks).
    """

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    anchor = np.datetime64("2020-01-01")

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        wk = ((ts.astype("datetime64[D]") - anchor).astype("int64")) // 7
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "week_idx": wk,
        }).drop_duplicates()
        df["bucket"] = _md5_mod(df["user_id"], n_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_retention(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "week_idx"]].drop_duplicates()
        nxt = d.copy()
        nxt["week_idx"] = nxt["week_idx"] - 1
        nxt["ret"] = 1
        m = d.merge(nxt, on=["user_id", "week_idx"], how="left")
        m["ret"] = m["ret"].fillna(0).astype("int64")
        out = m.groupby("week_idx", as_index=False).agg(
            n_active=("user_id", "size"), n_retained=("ret", "sum"))
        out["n_active"] = out["n_active"].astype("int64")
        out["n_retained"] = out["n_retained"].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("week_idx", as_index=False)[["n_active", "n_retained"]].sum()
        out["n_active"] = out["n_active"].astype("int64")
        out["n_retained"] = out["n_retained"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_retention, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def modal_priority_per_month(sf_dir: str):
    """Grouped MODE (per-group argmax): the most frequent order priority
    per calendar month, ties broken by priority string ascending — the
    row_number-over-count shape in SQL.

    Distributed as count partials on the (month, priority) composite key
    (cardinality = months × 5, tiny at any corpus size) followed by one
    single-task argmax over the aggregated counts; the fact table is
    never shuffled, only pre-combined count rows.
    """

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(t["o_orderdate"], unit="month"),
            "o_orderpriority": t["o_orderpriority"],
        })

    counts = _grouped_sum(
        _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"]),
        measures, keys=["month", "o_orderpriority"], sum_cols=[],
        count_col="n_orders",
    )

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["month", "n_orders", "o_orderpriority"],
                            ascending=[True, False, True])
        out = df.groupby("month", as_index=False).head(1).copy()
        out["month"] = pd.to_datetime(out["month"]).astype("datetime64[us]")
        out["n_orders"] = out["n_orders"].astype("int64")
        return out[["month", "o_orderpriority", "n_orders"]]

    return counts.repartition(1).map_batches(argmax, batch_format="pandas")


def parts_by_brand(sf_dir: str):
    """Simple dimension roll-up: parts + retail cents per brand."""
    return _grouped_sum(
        _read(sf_dir, "part", ["p_brand", "p_retailprice"]),
        lambda t: pa.table({
            "p_brand": t["p_brand"],
            "retail_cents": _cents(t["p_retailprice"]),
        }),
        keys=["p_brand"], sum_cols=["retail_cents"], count_col="n_parts",
    )


def customers_with_orders(sf_dir: str):
    """Broadcast SEMI JOIN: customers having >= 1 order.  The distinct
    custkey set ships once via ray.put and filters inside map_batches — no
    shuffle (at 10^10 keys the set becomes a Bloom filter,
    functions.bloom.BloomFilter, same pattern)."""
    import pyarrow.parquet as pq

    keys = set(
        pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                      columns=["o_custkey"])["o_custkey"].to_pylist()
    )
    ref = ray.put(keys)

    def semi(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([k in ks for k in t["c_custkey"].to_pylist()])
        return t.filter(mask)

    return _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        semi, batch_format="pyarrow"
    )


def customers_without_orders(sf_dir: str):
    """Broadcast ANTI JOIN: customers with no RECENT order (>= 1998-01-01;
    unrestricted, every customer has some order — vacuous)."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    keys = set(
        pq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey"],
            filters=pads.field("o_orderdate") >= pads.scalar(
                pd.Timestamp("1998-01-01")),
        )["o_custkey"].to_pylist()
    )
    ref = ray.put(keys)

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([k not in ks for k in t["c_custkey"].to_pylist()])
        return t.filter(mask)

    return _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        anti, batch_format="pyarrow"
    )


def pii_redact(sf_dir: str):
    """PII scrub (training-data hygiene pass): emails then phone numbers
    replaced by typed placeholder tokens, with per-doc redaction counts.
    Fully vectorized RE2 over the same derived text as field_extraction
    (text4 = text || _FIELD_SNIPPETS[doc_id % 4]); patterns shared
    verbatim with the SQL oracle.  Phones are counted/redacted AFTER the
    email pass so the two patterns cannot overlap — the oracle mirrors
    the ordering."""
    from ocr_ray.functions.fields import EMAIL_RE, PHONE_RE

    def f(t: pa.Table) -> pa.Table:
        mod = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 4), 4))
        suffix = pa.nulls(len(t), pa.string())
        for i in range(3, -1, -1):
            suffix = pc.if_else(pc.equal(mod, i), pa.scalar(_FIELD_SNIPPETS[i]), suffix)
        text4 = pc.binary_join_element_wise(
            pc.coalesce(t["text"], pa.scalar("")), suffix, "")
        n_emails = pc.cast(pc.count_substring_regex(text4, EMAIL_RE), pa.int64())
        s1 = pc.replace_substring_regex(text4, EMAIL_RE, "[EMAIL]")
        n_phones = pc.cast(pc.count_substring_regex(s1, PHONE_RE), pa.int64())
        red = pc.replace_substring_regex(s1, PHONE_RE, "[PHONE]")
        return pa.table({
            "doc_id": t["doc_id"],
            "redacted": red,
            "n_emails": n_emails,
            "n_phones": n_phones,
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def hash_sample(sf_dir: str, pct: int = 10):
    """Deterministic corpus sampling: keep a doc iff
    md5-lower-64(str(doc_id)) % 100 < pct.  Stable across runs,
    partitioning, resume and engines (NEVER random()) — the standard way
    a training-data pipeline carves held-out / ablation subsets so every
    stage sees the same sample.  Same hash as the url partitioner
    (extract.stable_part_id), bit-for-bit DuckDB md5_number_lower."""

    def f(t: pa.Table) -> pa.Table:
        keep = pa.array(_md5_mod(t["doc_id"].to_pylist(), 100) < pct)
        return t.filter(keep)

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


def approx_distinct_users(sf_dir: str, k: int | None = None):
    """Approximate count-distinct via the KMV (k-minimum-values) sketch
    (Bar-Yossef et al. 2002, public method): per event_type, keep the k
    smallest DISTINCT md5-lower-64 hashes of user_id; estimate
    n ≈ (k-1) * 2^64 / h_(k) (exact count when fewer than k distinct).

    KMV over HyperLogLog here because the estimator is pure integer
    arithmetic — ((k-1) << 64) // h_k — so the DuckDB oracle reproduces
    the estimate BIT-EXACTLY (the repo-wide parity convention; HLL's
    harmonic mean is float).  Standard error ~ 1/sqrt(k-2) ≈ 6% at k=256.

    Scale shape: per-batch partials are <= k DISTINCT hashes per
    event_type per block (np.unique + head-k before anything moves);
    the repartition(1) merge sees <= k x types x blocks tiny int rows
    and the driver receives one row per event_type.  Sketches merge by
    union-then-truncate, so this extends to any partitioning.
    """

    if k is None:
        k = DEFAULT_CONFIG.kmv_sketch_k

    def partial(t: pa.Table) -> pa.Table:
        # dedup BEFORE hashing: one md5 per distinct (type, user) per
        # block, not one per event row (the hash loop dominates this stage)
        df = (pa.table({"event_type": t["event_type"],
                        "user_id": t["user_id"]}).to_pandas()
                .drop_duplicates())
        df["h"] = _md5_u64(df["user_id"])
        out = (df[["event_type", "h"]].drop_duplicates()
                 .sort_values(["event_type", "h"])
                 .groupby("event_type", as_index=False, sort=False).head(k))
        return pa.table({
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "h": pa.array(out["h"].tolist(), pa.uint64()),
        })

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        types, ests = [], []
        for et, g in df.groupby("event_type", sort=True):
            hs = np.unique(g["h"].to_numpy())[:k]
            nd = int(hs.size)
            if nd < k:
                est = nd
            else:
                est = ((k - 1) << 64) // int(hs[-1])
            types.append(et)
            ests.append(est)
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "approx_distinct": pa.array(ests, pa.int64()),
        })

    return (
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


_TFIDF_QUERY_TERMS = ("table", "hash", "vector", "stream")


def tfidf_top_docs(sf_dir: str, k: int = 25):
    """TF-IDF-style relevance top-k against a fixed query-term set — the
    classic two-pass corpus-statistics operator shape:

      pass 1 (global document frequency): per-batch partials (docs seen,
        docs containing each term) — a |terms|-row table per block, so
        the driver union is bounded by |terms| x blocks regardless of
        corpus size; never the corpus itself;
      pass 2 (score + bounded top-k): idf weights ride into the scoring
        closure (tiny — broadcast by value), per-batch local top-k, then
        the repartition(1) two-level reduce — the driver receives
        exactly k rows.

    IDF is INTEGER milli-units — idf = (N * 1000) // df — instead of a
    float log so distributed order cannot perturb bits and the DuckDB
    oracle reproduces the scores exactly (the repo-wide integer-parity
    convention; a log-scaled idf would be the one float in the engine).
    tf = whitespace-token equality count on lower(text), mirroring the
    SQL ``list_filter(ws, x -> x = term)``.
    """
    import collections

    terms = _TFIDF_QUERY_TERMS

    def df_partial(t: pa.Table) -> pa.Table:
        counts = dict.fromkeys(terms, 0)
        n = 0
        for txt in t["text"].to_pylist():
            n += 1
            toks = set((txt or "").lower().split())
            for term in terms:
                if term in toks:
                    counts[term] += 1
        return pa.table({
            "term": pa.array(list(terms), pa.string()),
            "df": pa.array([counts[x] for x in terms], pa.int64()),
            "n": pa.array([n] * len(terms), pa.int64()),
        })

    blocks = ray.get(
        _read(sf_dir, "documents", ["text"])
        .map_batches(df_partial, batch_format="pyarrow").to_arrow_refs()
    )
    df_tot: collections.Counter = collections.Counter()
    n_docs = 0
    for b in blocks:
        if not (b.num_columns and b.num_rows):
            continue
        for term, d, n in zip(b["term"].to_pylist(), b["df"].to_pylist(),
                              b["n"].to_pylist()):
            df_tot[term] += d
            if term == terms[0]:
                n_docs += n
    scale = DEFAULT_CONFIG.tfidf_scale
    idf = {term: (n_docs * scale) // df_tot[term] if df_tot[term] else 0
           for term in terms}

    def score_partial(t: pa.Table) -> pa.Table:
        scores = []
        for txt in t["text"].to_pylist():
            c = collections.Counter((txt or "").lower().split())
            scores.append(sum(c[term] * idf[term] for term in terms))
        tab = pa.table({"doc_id": t["doc_id"],
                        "score": pa.array(scores, pa.int64())})
        idx = pc.sort_indices(
            tab, sort_keys=[("score", "descending"), ("doc_id", "ascending")])[:k]
        return tab.take(idx)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("doc_id", "ascending")])[:k]
        return t.take(idx)

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(score_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


_STRATA_PCT = {"en": 50, "de": 20, "fr": 20, "es": 20, "zh": 5}


def stratified_sample(sf_dir: str):
    """Language-stratified deterministic sampling (training-mix shaping:
    downweight over-represented languages): keep a doc iff
    md5-lower-64(str(doc_id)) % 100 < pct[lang], with per-language rates
    _STRATA_PCT (unknown langs drop).  Same md5 convention as
    :func:`hash_sample` — stable across runs, partitioning, resume and
    engines; NEVER random().  Embarrassingly parallel; no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        h = _md5_mod(t["doc_id"].to_pylist(), 100)
        pcts = np.fromiter((_STRATA_PCT.get(lang, 0)
                            for lang in t["lang"].to_pylist()),
                           dtype=np.int64, count=t.num_rows)
        return t.filter(pa.array(h < pcts))

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


def price_histogram(sf_dir: str, bin_cents: int = 50_000):
    """Fixed-width binned distribution (histogram) of order totals:
    (bin, n_orders, sum_cents) with bin = price_cents // bin_cents.
    Binning is a pure vectorized column derivation, so this is the
    cheapest possible wide aggregate: per-batch partials collapse to one
    row per occupied bin per batch, and the groupby sees only ~#bins keys
    regardless of corpus size."""

    def measures(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        return pa.table({
            "bin": pc.cast(pc.divide(cents, bin_cents), pa.int64()),
            "sum_cents": cents,
        })

    return _grouped_sum(
        _read(sf_dir, "orders", ["o_totalprice"]),
        measures, keys=["bin"], sum_cols=["sum_cents"], count_col="n_orders",
    )


def click_hours_no_purchase(sf_dir: str):
    """Distributed set difference (``EXCEPT``): distinct (user_id, hour)
    cells with at least one ``click`` and NO ``purchase`` in the same
    hour — the unconverted-session funnel metric, and the
    two-filtered-sets-minus shape (vs :func:`customers_without_orders`,
    which is a cross-table anti-join on keys).

    ONE shuffle on md5(user_id) % 64 carrying only DISTINCT
    (user_id, hour, event_type) triples pre-deduped per batch (never
    event instances); inside each bucket one vectorized pandas pass
    decides membership — a user's full cell set is co-located, so the
    set difference is exact with no second pass.
    """

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        sub = pa.table({
            "user_id": t["user_id"],
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "event_type": t["event_type"],
        }).filter(pc.is_in(t["event_type"],
                           value_set=pa.array(["click", "purchase"])))
        df = sub.to_pandas().drop_duplicates()
        df["bucket"] = _md5_mod(df["user_id"], n_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_except(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "window_start", "event_type"]].drop_duplicates()
        key = ["user_id", "window_start"]
        clicks = d[d["event_type"] == "click"][key]
        buys = d[d["event_type"] == "purchase"][key]
        out = clicks.merge(buys, on=key, how="left", indicator=True)
        out = out[out["_merge"] == "left_only"][key].copy()
        out["user_id"] = out["user_id"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_except, batch_format="pandas")
    )


def orders_above_cust_avg(sf_dir: str):
    """Correlated-subquery shape (``WHERE price > AVG(price) OVER own
    customer``): orders strictly above their customer's average order
    price.

    ONE shuffle: orders are bucketed on md5(o_custkey) % 64 so a
    customer's rows are co-located, then a single vectorized pandas pass
    per bucket computes the per-customer (sum, count) with ``transform``
    and filters in place — the aggregate side and the probe side never
    separate, so there is no join.  The comparison is exact integer math
    (``price_cents · n > Σprice_cents``), never a float average, so the
    predicate is immune to summation order.
    """

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def prep(t: pa.Table) -> pa.Table:
        b = _md5_mod(t["o_custkey"].to_pylist(), n_buckets)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_cents": _cents(t["o_totalprice"]),
            "bucket": pa.array(b.astype(np.int32), pa.int32()),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("o_custkey")["price_cents"]
        keep = g["price_cents"] * s.transform("size") > s.transform("sum")
        return g.loc[keep, ["o_orderkey", "o_custkey", "price_cents"]]

    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def part_pair_counts(sf_dir: str, k: int = 100):
    """Market-basket co-occurrence (distributed self-join): the top-k part
    pairs that appear together in the most orders, ordered
    (n_orders desc, part_a, part_b) with a row_number-style deterministic
    tie cut mirrored in SQL.

    Two-shuffle topology, both on COARSE buckets (never raw keys):

      1. shuffle lineitem on md5(l_orderkey) % 64 so every line of an
         order lands in one bucket; inside the bucket one vectorized
         pandas pass dedups (order, part), self-merges per order into
         a < b pairs, and pre-counts pairs — the second shuffle carries
         (pair, partial_count), never pair instances;
      2. shuffle the partials on md5(part_a-part_b) % 64 — a pair lives
         entirely in one bucket, so a per-bucket vectorized sum + local
         top-k bounds the final ``repartition(1)`` merge to ≤ 64·k rows.

    Skew note: pair fan-out is quadratic in lines-per-order, which TPC-H
    caps at 7; a corpus with unbounded baskets needs a per-basket pair cap
    (sample or truncate) before step 1 — same discipline as the star-
    pairing cap in simhash_near_dup.
    """

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def bucket_by_order(t: pa.Table) -> pa.Table:
        b = _md5_mod(t["l_orderkey"].to_pylist(), n_buckets)
        return t.append_column("bucket", pa.array(b.astype(np.int32), pa.int32()))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        if m.empty:
            return pd.DataFrame({
                "part_a": pd.Series(dtype="int64"),
                "part_b": pd.Series(dtype="int64"),
                "n_orders": pd.Series(dtype="int64"),
                "pbucket": pd.Series(dtype="int32"),
            })
        c = (m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
              .size().rename(columns={
                  "l_partkey_a": "part_a", "l_partkey_b": "part_b",
                  "size": "n_orders"}))
        c["n_orders"] = c["n_orders"].astype("int64")
        c["pbucket"] = _md5_mod(
            [f"{a}-{b}" for a, b in zip(c["part_a"], c["part_b"])],
            n_buckets).astype(np.int32)
        return c

    def sum_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["part_a", "part_b"], as_index=False)["n_orders"].sum()
        s["n_orders"] = s["n_orders"].astype("int64")
        return s.sort_values(
            ["n_orders", "part_a", "part_b"], ascending=[False, True, True]
        ).head(k)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("n_orders", "descending"), ("part_a", "ascending"),
            ("part_b", "ascending")])[:k]
        return t.take(idx).select(["part_a", "part_b", "n_orders"])

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(bucket_by_order, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(sum_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def chunk_documents(sf_dir: str, chunk_chars: int = 120, overlap: int = 20):
    """Sliding-window document chunking (the LLM-pretraining "context
    packing" precursor): explode each document into fixed-width character
    windows with ``overlap`` chars of left context and explicit offsets
    (doc_id, chunk_idx, char_start, chunk_text), so downstream stages can
    embed / dedup / index chunks while still mapping every chunk back to
    its source span.

    Windows start every ``stride = chunk_chars - overlap`` characters while
    ``start < len(text)``; the last window may be short; empty/null docs
    emit no chunks.  Embarrassingly parallel — a pure per-batch explode,
    no shuffle; output rows ≈ input_chars / stride, so block sizes grow by
    a bounded factor and streaming backpressure handles the fan-out.

    The window-start arithmetic is numpy-vectorized; only the final
    substring extraction is a per-chunk C-level slice (strings with
    per-row offsets have no Arrow kernel).
    """
    stride = chunk_chars - overlap
    assert stride > 0, "overlap must be smaller than chunk_chars"

    def explode(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t["text"].to_pylist()]
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        lens = np.fromiter((len(x) for x in texts), dtype=np.int64,
                           count=len(texts))
        n_chunks = -(-lens // stride)  # ceil; 0 for empty docs
        rep_ids = np.repeat(ids, n_chunks)
        total = int(n_chunks.sum())
        # per-doc 0..n_chunks-1 counters without a Python loop
        ends = np.cumsum(n_chunks)
        idx = np.arange(total) - np.repeat(ends - n_chunks, n_chunks)
        starts = idx * stride
        rep_texts = np.repeat(np.arange(len(texts)), n_chunks)
        chunks = [texts[ti][s: s + chunk_chars]
                  for ti, s in zip(rep_texts, starts)]
        return pa.table({
            "doc_id": pa.array(rep_ids, pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "char_start": pa.array(starts, pa.int64()),
            "chunk_text": pa.array(chunks, pa.string()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )


def top_bigrams_pmi(sf_dir: str, k: int = 50):
    """Collocation mining: the top-k adjacent-token bigrams by count, each
    scored with pointwise mutual information
    ``pmi = ln(n·N / (n_first(a) · n_second(b)))`` — the classic
    new-terminology / multi-word-expression detector in a corpus pipeline.

    Candidate-then-rescore topology (two aggregations over ONE pass of
    the text):

      1. per-batch bigram Counter partials bucketed by crc32(pair) % 64
         are materialized ONCE (they are exactly what the shuffle would
         carry; the object store spills them if large);
      2. top-k candidates via the per-bucket-top-k + ``repartition(1)``
         bounded reduce (a pair lives in one bucket, so the union of
         per-bucket top-ks contains the global top-k);
      3. the PMI denominators are re-aggregated FROM THE SAME PARTIALS,
         filtered to the ≤2k winner tokens (broadcast set) — never a
         second text pass, never a vocabulary-sized table on the driver.

    All counts are exact integers; the single float expression
    (ln of a ratio of int-derived doubles) is written with the same
    shape in the SQL oracle so both sides round identically at 6 dp.
    Sequential re-executions of the materialized partials avoid the
    shared-upstream union deadlock documented in CLAUDE.md.
    """
    import collections
    import math
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            toks = (txt or "").lower().split()
            c.update(zip(toks, toks[1:]))
        pairs = list(c.keys())
        return pa.table({
            "tok_a": pa.array([p[0] for p in pairs], pa.string()),
            "tok_b": pa.array([p[1] for p in pairs], pa.string()),
            "n": pa.array([c[p] for p in pairs], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(f"{a} {b}".encode()) % n_buckets
                 for a, b in pairs], pa.int32()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["tok_a", "tok_b"], as_index=False)["n"].sum()
        s["n"] = s["n"].astype("int64")
        return s.sort_values(["n", "tok_a", "tok_b"],
                             ascending=[False, True, True]).head(k)

    parts = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )

    cand = (
        parts.groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda t: t.take(pc.sort_indices(t, sort_keys=[
                ("n", "descending"), ("tok_a", "ascending"),
                ("tok_b", "ascending")])[:k]).select(["tok_a", "tok_b", "n"]),
            batch_format="pyarrow", batch_size=None)
    )
    win = pa.concat_tables(ray.get(cand.to_arrow_refs()))

    from ray.data.aggregate import Sum
    total = parts.aggregate(Sum("n", alias_name="nn"))["nn"]

    def tok_sums(col: str, keep: set) -> dict:
        keep_arr = pa.array(sorted(keep))

        def f(t: pa.Table) -> pa.Table:
            sub = t.filter(pc.is_in(t[col], value_set=keep_arr))
            df = sub.to_pandas().groupby(col, as_index=False)["n"].sum()
            df["n"] = df["n"].astype("int64")
            return pa.Table.from_pandas(df, preserve_index=False)

        out = (parts.map_batches(f, batch_format="pyarrow")
               .repartition(1)
               .map_batches(f, batch_format="pyarrow", batch_size=None))
        tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
        return dict(zip(tbl[col].to_pylist(), tbl["n"].to_pylist()))

    na = tok_sums("tok_a", set(win["tok_a"].to_pylist()))
    nb = tok_sums("tok_b", set(win["tok_b"].to_pylist()))

    rows = []
    for a, b, n in zip(win["tok_a"].to_pylist(), win["tok_b"].to_pylist(),
                       win["n"].to_pylist()):
        pmi = math.log(
            float(n) * float(total) / (float(na[a]) * float(nb[b])))
        rows.append((a, b, int(n), float(np.round(pmi, 6))))
    return pa.table({
        "tok_a": pa.array([r[0] for r in rows], pa.string()),
        "tok_b": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
        "pmi": pa.array([r[3] for r in rows], pa.float64()),
    })


def top_terms(sf_dir: str, k: int = 20):
    """Global top-k tokens (heavy hitters) over the document corpus.

    Two-level EXACT reduce with the coarse-bucket discipline:

      map_batches: one collections.Counter pass per batch (partial
        pre-aggregation — the shuffle carries (token, count) partials,
        never token instances) with bucket = crc32(token) % 64;
      groupby(bucket): vectorized pandas sum per token + per-bucket
        top-k.  A token lives entirely in ONE bucket, so the global
        top-k is a subset of the union of per-bucket top-ks;
      repartition(1): final top-k over <= 64*k candidate rows — the
        driver receives exactly k rows.

    Ordering: count desc, token asc (deterministic, mirrored in SQL).
    Tokenization is lower().split() — whitespace runs, no empties.
    """
    import collections
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            c.update((txt or "").lower().split())
        toks = list(c.keys())
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([c[tk] for tk in toks], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(tk.encode()) % n_buckets for tk in toks], pa.int32()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["n"].sum()
        s["n"] = s["n"].astype("int64")
        return s.sort_values(["n", "token"], ascending=[False, True]).head(k)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("token", "ascending")])[:k]
        return t.take(idx).select(["token", "n"])

    return (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def top_terms_per_lang(sf_dir: str, k: int = 5):
    """GROUPED heavy hitters: top-k tokens per language — the group-wise
    sibling of :func:`top_terms` (per-domain/per-language vocabulary
    profiling in a corpus-curation pipeline).

    Same exact two-level topology, with the group key riding along:

      map_batches: one Counter pass per (lang) per batch (partials carry
        (lang, token, count), never token instances), bucket =
        crc32(token) % 64 — a token lives entirely in ONE bucket, so
        per-bucket (lang, token) sums are global sums;
      groupby(bucket): vectorized pandas sum + per-(bucket, lang) top-k —
        the global per-lang top-k is a subset of the union of per-bucket
        per-lang top-ks;
      repartition(1): final per-lang top-k over <= 64*k*langs candidate
        rows — the driver receives exactly k rows per language.

    Ordering: count desc, token asc within each lang (mirrored in SQL's
    row_number()).  Group cardinality (languages/domains) only affects
    the tiny candidate set, never the shuffle width.
    """
    import collections
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for tok in (txt or "").lower().split():
                c[(lang, tok)] += 1
        keys = list(c.keys())
        return pa.table({
            "lang": pa.array([x[0] for x in keys], pa.string()),
            "token": pa.array([x[1] for x in keys], pa.string()),
            "n": pa.array([c[x] for x in keys], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(x[1].encode()) % n_buckets for x in keys], pa.int32()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: a null-lang group must survive (pandas' default
        # silently discards NaN group keys — SQL keeps NULL as a group)
        s = g.groupby(["lang", "token"], as_index=False, dropna=False)["n"].sum()
        s["n"] = s["n"].astype("int64")
        return (s.sort_values(["lang", "n", "token"],
                              ascending=[True, False, True])
                  .groupby("lang", as_index=False, sort=False,
                           dropna=False).head(k))

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = (df.sort_values(["lang", "n", "token"],
                              ascending=[True, False, True])
                 .groupby("lang", as_index=False, sort=False,
                          dropna=False).head(k))
        return pa.Table.from_pandas(
            out[["lang", "token", "n"]], preserve_index=False)

    return (
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def doc_length_quantiles(sf_dir: str):
    """EXACT doc-length quantiles via a distributed value-count reduce.

    Row counts compress to DISTINCT-VALUE counts inside map_batches (doc
    lengths are a small bounded domain, so the partials are tiny no
    matter the corpus size); one repartition(1) task merges the count
    maps and walks the cumulative histogram.  quantile_disc semantics
    pinned to DuckDB: value = sorted[ceil(q*n)] (1-based).  For an
    unbounded value domain swap the exact map for fixed histogram
    buckets — same topology.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"v": t["n_chars"]}).to_pandas()
        g = df.groupby("v", as_index=False).size().rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("v", as_index=False)["c"].sum().sort_values("v")
        total = int(df["c"].sum())
        cum = df["c"].cumsum().to_numpy()
        vals = df["v"].to_numpy()
        import math

        out_v = []
        for q in _QUANTILES:
            rank = max(1, math.ceil(q * total))          # 1-based target rank
            out_v.append(int(vals[int(np.searchsorted(cum, rank))]))
        return pa.table({
            "q": pa.array(list(_QUANTILES), pa.float64()),
            "value": pa.array(out_v, pa.int64()),
        })

    return (
        _read(sf_dir, "documents", ["n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def order_price_rank(sf_dir: str):
    """RANKING window function: each order's rank by price within its
    customer (``rank() OVER (PARTITION BY o_custkey ORDER BY ...)``) —
    completes the window-function trio (running sum, lag/debounce, rank).

    One coarse 64-way shuffle on the customer key, then pandas
    ``rank(method='min')`` per bucket handles every customer vectorized.
    Price ties share a rank (gaps follow), broken deterministically in
    the ORDER only — rank itself is tie-stable, so cents-scaled price is
    compared, never raw doubles.
    """

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_cents": _cents(t["o_totalprice"]),
            "bucket": pc.cast(
                pc.bit_wise_and(t["o_custkey"], 63), pa.int32()),
        })

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(price_rank=(
            g.groupby("o_custkey")["price_cents"]
             .rank(method="min", ascending=False).astype("int64")))
        return g[["o_orderkey", "o_custkey", "price_cents", "price_rank"]]

    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def doc_length_quantiles_by_lang(sf_dir: str):
    """GROUPED exact quantiles: doc-length quantiles per language — the
    group-wise sibling of :func:`doc_length_quantiles` (per-stratum
    length profiling in a corpus-curation pipeline).

    Same value-count compression with the group key riding along:
    partials are (lang, value, count) rows — bounded by langs x value
    domain regardless of corpus size — merged by one repartition(1)
    task that walks each language's cumulative histogram.  quantile_disc
    semantics pinned to DuckDB (1-based rank ceil(q*n)).
    """
    import math

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"lang": t["lang"], "v": t["n_chars"]}).to_pandas()
        g = (df.groupby(["lang", "v"], as_index=False, dropna=False)
               .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
               .groupby(["lang", "v"], as_index=False, dropna=False)["c"].sum())
        langs, qs, vals_out = [], [], []
        for lang, g in df.groupby("lang", sort=True, dropna=False):
            g = g.sort_values("v")
            total = int(g["c"].sum())
            cum = g["c"].cumsum().to_numpy()
            vals = g["v"].to_numpy()
            for q in _QUANTILES:
                rank = max(1, math.ceil(q * total))
                langs.append(lang)
                qs.append(q)
                vals_out.append(int(vals[int(np.searchsorted(cum, rank))]))
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(vals_out, pa.int64()),
        })

    return (
        _read(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def domain_cap(sf_dir: str, k: int | None = None):
    """Per-domain document cap (web-corpus curation: no single domain may
    dominate the training mix): keep the k lowest-doc_id docs per source.

    The shuffle never carries more than k rows per (source, block):

      map_batches partial: per-batch per-source head-k (vectorized pandas
        sort + groupby head) — a hot domain with millions of rows sends
        <= k rows PER BLOCK into the exchange, not its full row count;
      groupby(bucket): bucket = crc32(source) % 64 (coarse — never group
        on the raw domain key, see CLAUDE.md map_groups note); all rows
        of a source land in ONE bucket so the same head-k inside is the
        global answer.

    Oracle: row_number() OVER (PARTITION BY source ORDER BY doc_id) <= k.
    """
    import zlib

    if k is None:
        k = DEFAULT_CONFIG.domain_cap_k
    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    cols = ["doc_id", "source", "lang", "n_chars"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.sort_values(["source", "doc_id"])
                 .groupby("source", as_index=False, sort=False).head(k))
        out = out.reset_index(drop=True)
        out["bucket"] = np.array(
            [zlib.crc32(s.encode()) % n_buckets for s in out["source"]],
            dtype=np.int32)
        return out

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["source", "doc_id"])
                .groupby("source", as_index=False, sort=False).head(k))
        return out[cols]

    return (
        _read(sf_dir, "documents", cols)
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(cap, batch_format="pandas")
    )


def keep_best_per_url(sf_dir: str):
    """Canonical-URL keep-best dedup (web-corpus curation: the same page
    crawled several times keeps only its best capture): derive raw urls —
    three case/fragment/slash variants share each page path (doc_id // 3)
    — apply the E7 canonicalization kernel (same regex chain as
    :func:`url_canonicalize`), then keep the single doc with the most
    content per canon_url (n_chars desc, doc_id asc tiebreak).

    Scale shape mirrors :func:`domain_cap`: per-batch partial keep-best
    first (<= 1 row per url per block enters the exchange), then a
    coarse-bucket groupby on crc32(canon_url) % 64 with the same
    vectorized keep-best inside — never a Ray groupby on the raw url key.
    """
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def derive(t: pa.Table) -> pa.Table:
        mod = pc.subtract(t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 3), 3))
        tail = pc.if_else(pc.equal(mod, 0), pa.scalar("?id=7#frag"),
               pc.if_else(pc.equal(mod, 1), pa.scalar("/"), pa.scalar("?id=7")))
        base = pc.binary_join_element_wise(
            "HTTPS://Example.ORG/Path",
            pc.cast(pc.divide(t["doc_id"], 3), pa.string()), "")
        u = pc.binary_join_element_wise(base, tail, "")
        return pa.table({"canon_url": _canonicalize_urls(u),
                         "doc_id": t["doc_id"],
                         "n_chars": t["n_chars"]})

    def best(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["canon_url", "n_chars", "doc_id"],
                               ascending=[True, False, True])
                  .groupby("canon_url", as_index=False, sort=False).head(1)
                  .reset_index(drop=True))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = best(df)
        out["bucket"] = np.array(
            [zlib.crc32(s.encode()) % n_buckets for s in out["canon_url"]],
            dtype=np.int32)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return best(g)[["canon_url", "doc_id", "n_chars"]]

    return (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(derive, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )


def repetition_stats(ds, text_col: str = "text", key_col: str = "doc_id"):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    per-doc line/word duplicate counts and the dominant-token flag — see
    :func:`ocr_ray.functions.textstats.repetition_columns`.
    Embarrassingly parallel map_batches; no shuffle at any scale.
    """

    def f(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t[key_col],
                         **textstats.repetition_columns(t[text_col])})

    return ds.map_batches(f, batch_format="pyarrow")


_FUNNEL_STAGES = ("view", "click", "purchase")


def event_funnel(sf_dir: str):
    """Ordered three-stage conversion funnel over the event stream
    (view → click → purchase): stage N counts users whose FIRST
    qualifying stage-N event happens strictly after their first
    qualifying stage-(N-1) event — the classic product-analytics funnel
    (reference analogue: the staged filter→extract→QC progression,
    e.g. copy_files_for_ocr.py → recognize_text.py → quality_check.py,
    where each stage only sees survivors of the previous one).

    Scale shape: one 64-way shuffle on a coarse user bucket (every
    event of a user lands in one bucket), a vectorized pandas pass per
    bucket computes each user's t1/t2/t3 chain and emits THREE partial
    rows per bucket; the final sum over ~192 rows runs in a single
    ``repartition(1)`` task.  Nothing user-level ever reaches the
    driver.
    """

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(_FUNNEL_STAGES))
        t = t.filter(keep)
        return pa.table({
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "ts": t["ts"],
            "bucket": pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32()),
        })

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = (g[g["event_type"] == "view"]
             .groupby("user_id")["ts"].min().rename("t1").reset_index())
        c = g[g["event_type"] == "click"].merge(v, on="user_id")
        c = (c[c["ts"] > c["t1"]]
             .groupby("user_id")["ts"].min().rename("t2").reset_index())
        p = g[g["event_type"] == "purchase"].merge(c, on="user_id")
        p = p[p["ts"] > p["t2"]]
        return pd.DataFrame({
            "stage_idx": pd.array([1, 2, 3], dtype="int64"),
            "stage": list(_FUNNEL_STAGES),
            "n_users": pd.array(
                [len(v), len(c), p["user_id"].nunique()], dtype="int64"),
        })

    def total(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["stage_idx", "stage"], as_index=False)["n_users"]
                 .sum())
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(total, batch_format="pandas", batch_size=None)
    )


def cube_status_priority(sf_dir: str):
    """Full CUBE aggregate (``GROUP BY CUBE(o_orderstatus,
    o_orderpriority)``): order counts and revenue at all four grouping
    sets, with the literal ``'ALL'`` as the rolled-up sentinel —
    completes the grouping-sets family next to ROLLUP
    (:func:`rollup_customer_balance`).

    Only the finest level (status × priority, ≤15 keys) is aggregated
    distributed (per-batch partials then a tiny groupby); the three
    coarser sets are derived from that ~15-row table in one
    ``repartition(1)`` task — no second pass over the fact table at
    any corpus size.
    """

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "revenue_cents": _cents(t["o_totalprice"]),
        })

    finest = _grouped_sum(
        _read(sf_dir, "orders",
              ["o_orderstatus", "o_orderpriority", "o_totalprice"]),
        measures, keys=["o_orderstatus", "o_orderpriority"],
        sum_cols=["revenue_cents"], count_col="n_orders",
    )

    def add_levels(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["o_orderstatus", "o_orderpriority", "n_orders",
                "revenue_cents"]
        agg = {"n_orders": ("n_orders", "sum"),
               "revenue_cents": ("revenue_cents", "sum")}
        by_status = df.groupby("o_orderstatus", as_index=False).agg(**agg)
        by_status["o_orderpriority"] = "ALL"
        by_prio = df.groupby("o_orderpriority", as_index=False).agg(**agg)
        by_prio["o_orderstatus"] = "ALL"
        tot = pd.DataFrame({
            "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
            "n_orders": [df["n_orders"].sum()],
            "revenue_cents": [df["revenue_cents"].sum()],
        })
        out = pd.concat(
            [df[cols], by_status[cols], by_prio[cols], tot[cols]],
            ignore_index=True)
        out["n_orders"] = out["n_orders"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out

    return finest.repartition(1).map_batches(add_levels, batch_format="pandas")


def _ntile(rn: "np.ndarray", n: "np.ndarray", k: int) -> "np.ndarray":
    """DuckDB NTILE(k) as a pure vectorized kernel: given 1-based row
    numbers ``rn`` within groups of size ``n``, the first ``n % k``
    buckets take ``ceil(n/k)`` rows, the rest ``floor(n/k)``."""
    big = n % k
    size_big = n // k + 1
    size_small = np.maximum(n // k, 1)
    return np.where(
        rn <= big * size_big,
        (rn + size_big - 1) // size_big,
        big + (rn - big * size_big + size_small - 1) // size_small,
    ).astype("int64")


def order_price_quartiles(sf_dir: str, n_tiles: int = 4):
    """NTILE window function: each order's price quartile within its
    customer (``ntile(4) OVER (PARTITION BY o_custkey ORDER BY
    price_cents DESC, o_orderkey)``) — the equal-height-bucket member
    of the window family (rank / running sum / lag / ntile).

    Same scale shape as :func:`order_price_rank`: one 64-way shuffle
    on the customer key, then per-bucket vectorized pandas.  DuckDB
    NTILE semantics are reproduced exactly: the first ``n % k`` buckets
    take ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — computed from
    the deterministic row number (price DESC, orderkey ASC tiebreak,
    so no double-order ambiguity).
    """

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "price_cents": _cents(t["o_totalprice"]),
            "bucket": pc.cast(
                pc.bit_wise_and(t["o_custkey"], 63), pa.int32()),
        })

    def tile_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "price_cents", "o_orderkey"],
            ascending=[True, False, True]).reset_index(drop=True)
        grp = g.groupby("o_custkey", sort=False)
        rn = grp.cumcount().to_numpy() + 1
        n = grp["o_orderkey"].transform("size").to_numpy()
        g["quartile"] = _ntile(rn, n, n_tiles)
        return g[["o_orderkey", "o_custkey", "price_cents", "quartile"]]

    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(tile_bucket, batch_format="pandas")
    )


def partition_checksums(sf_dir: str, n_partitions: int = 16):
    """Per-partition lineage manifest over the corpus: document count,
    byte mass and an ORDER-INDEPENDENT content checksum (bit-XOR of the
    md5-lower-64 of each text — the same hash convention as
    ``shingle_hashes``) for each of ``n_partitions`` doc_id partitions.

    This is the audit/lineage primitive the north rule asks for
    ("per-partition lineage manifests + extraction metrics"): two runs
    over the same corpus must produce identical checksums regardless of
    block boundaries, task order or parallelism, so a resume or a
    re-shard can be verified partition-by-partition without comparing
    payloads.

    Scale shape: XOR and SUM are commutative — each batch folds down to
    ≤ n_partitions partial rows inside ``map_batches``, and the final
    fold over (n_partitions × n_blocks) tiny rows runs in one
    ``repartition(1)`` task.  No shuffle of document payloads at any
    corpus size.
    """

    def partial(t: pa.Table) -> pa.Table:
        h = _md5_u64(t["text"].to_pylist())
        df = pd.DataFrame({
            "partition_id": (t["doc_id"].to_numpy() % n_partitions)
                .astype(np.int64),
            "h": h,
            "n_chars": t["n_chars"].to_numpy(),
        })
        g = df.groupby("partition_id")
        out = pd.DataFrame({
            "n_docs": g.size().astype("int64"),
            "total_chars": g["n_chars"].sum().astype("int64"),
            "checksum": g["h"].agg(
                lambda s: np.bitwise_xor.reduce(s.to_numpy())),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("partition_id")
        out = pd.DataFrame({
            "n_docs": g["n_docs"].sum().astype("int64"),
            "total_chars": g["total_chars"].sum().astype("int64"),
            "checksum": g["checksum"].agg(
                lambda s: np.bitwise_xor.reduce(
                    s.to_numpy().astype(np.uint64))),
        }).reset_index()
        return pa.table({
            "partition_id": pa.array(out["partition_id"], pa.int64()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            "total_chars": pa.array(out["total_chars"], pa.int64()),
            "checksum": pa.array(out["checksum"], pa.uint64()),
        })

    return (
        _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def reassemble_chunks(sf_dir: str, chunk_chars: int = 120, overlap: int = 20):
    """Round-trip inverse of :func:`chunk_documents` — ORDER-DEPENDENT
    grouped string aggregation (``string_agg(... ORDER BY chunk_idx)``):
    re-concatenate each document's sliding-window chunks, stripping the
    ``overlap`` chars of left context from every chunk after the first,
    and recover the original text exactly.

    This is the "context unpacking" audit for a chunked corpus: chunk →
    embed/dedup/filter → reassemble must be the identity on surviving
    docs, so a lossy chunker (wrong stride, dropped window, shuffled
    order) is caught by a value-hash compare against the raw corpus.

    Scale shape: one 64-way shuffle on the coarse doc bucket brings all
    chunks of a doc together; inside, a single vectorized sort + slice
    prepares the pieces and the per-doc join is the unavoidable string
    materialization.  Output is corpus-sized but streams block-by-block;
    nothing reaches the driver.  Empty/null docs emit no chunks, so the
    oracle restricts to docs with non-empty text.
    """

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket",
            pc.cast(pc.bit_wise_and(t["doc_id"], 63), pa.int32()))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "chunk_idx"])
        piece = g["chunk_text"].str.slice(overlap)
        piece[g["chunk_idx"].to_numpy() == 0] = g["chunk_text"]
        out = (pd.DataFrame({"doc_id": g["doc_id"], "piece": piece})
               .groupby("doc_id", sort=False)["piece"].agg("".join)
               .reset_index().rename(columns={"piece": "text"}))
        return out

    return (
        chunk_documents(sf_dir, chunk_chars, overlap)
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )


def props_key_stats(sf_dir: str):
    """Semi-structured field extraction (the WARC-metadata shape): pull
    the integer ``k`` out of the JSON ``props`` payload of every event
    with a VECTORIZED regex (``pc.extract_regex`` — no per-row json.loads)
    and roll up sum + count per event type.

    Embarrassingly parallel per-batch partials then a ≤5-key groupby —
    the _grouped_sum shape; the JSON column never crosses the exchange.
    """

    def measures(t: pa.Table) -> pa.Table:
        # anchored at the object start so a nested/string '"k":' can never
        # match; rows without a top-level integer k extract null and are
        # folded to 0 — identical to SQL SUM's skip-NULL semantics (the one
        # divergence, an all-null group, would be SQL NULL vs 0 here)
        v = pc.struct_field(
            pc.extract_regex(t["props"], r'^\{\s*"k":\s*(?P<v>-?\d+)'), "v")
        return pa.table({
            "event_type": t["event_type"],
            "sum_k": pc.fill_null(pc.cast(v, pa.int64()), 0),
        })

    return _grouped_sum(
        _read(sf_dir, "events", ["event_type", "props"]),
        measures, keys=["event_type"], sum_cols=["sum_k"], count_col="n",
    )


def dup_cluster_sizes(sf_dir: str):
    """Exact-duplicate CLUSTER-SIZE histogram — the dedup audit that says
    how much of the corpus is singletons vs 2-copy vs N-copy content
    (what a crawl re-fetch or mirror farm looks like in aggregate).

    The corpus has the deterministic ``doc_id % 23`` re-crawl duplicates
    injected (the same convention the synthetic pages corpus uses), so
    the histogram is non-degenerate and pins both levels of aggregation.

    Scale shape: two-level aggregation with NO fine-grained Ray key —
    (1) rows carry only (md5, bucket=first-2-hex); every copy of a
    content lands in one of 256 coarse buckets (hex-prefix granularity
    is 16 or 256; 256 keeps a 256-node cluster fully parallel at the
    group stage and the measured gate cost is <1 s), where a vectorized
    value_counts produces per-cluster sizes; (2) each bucket emits its
    ≤#distinct-sizes histogram rows and a final tiny groupby sums them.
    Payload text never crosses the exchange (J2 convention).
    """
    from ray.data.aggregate import Sum

    from ocr_ray.functions.textstats import md5_fingerprint

    def inject_and_fp(t: pa.Table) -> pa.Table:
        mod = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 23), 23))
        dups = t.filter(pc.equal(mod, 0))
        text = pa.concat_arrays([
            pc.coalesce(t["text"], pa.scalar("")).combine_chunks(),
            pc.coalesce(dups["text"], pa.scalar("")).combine_chunks(),
        ])
        fp = md5_fingerprint(text)
        return pa.table({
            "fingerprint": fp,
            "bucket": pc.utf8_slice_codeunits(fp, 0, 2),
        })

    def histogram_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g["fingerprint"].value_counts()
        hist = sizes.value_counts()
        return pd.DataFrame({
            "cluster_size": hist.index.astype("int64"),
            "n_clusters": hist.to_numpy().astype("int64"),
        })

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(inject_and_fp, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(histogram_per_bucket, batch_format="pandas")
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
    )


def click_purchase_intersect(sf_dir: str):
    """INTERSECT set operation: users who BOTH clicked and purchased —
    completes the set-op family (UNION: entity_key_union, EXCEPT:
    click_hours_no_purchase, INTERSECT: here).

    Scale shape: per-batch distinct (user, type) pre-dedup shrinks the
    exchange to at most 2 rows per user per block; inside the standing
    coarse user bucket one vectorized pandas pass finds users with both
    types.  Only user ids cross the wire.
    """
    both = pa.array(("click", "purchase"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=both))
        df = t.select(["user_id", "event_type"]).to_pandas()
        df = df.drop_duplicates()
        out = pa.Table.from_pandas(df, preserve_index=False)
        return _bucket_by_user(out)

    def intersect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        n = g.groupby("user_id", as_index=False)["event_type"].nunique()
        return n.loc[n["event_type"] == 2, ["user_id"]]

    return (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(intersect, batch_format="pandas")
    )


def _user_value_frame(sf_dir: str):
    """Shared prep of the rolling-window operators: (event_id, user_id,
    ts, value_cents) bucketed by the standing coarse user key — the
    ordering/bucketing semantics the oracles depend on, defined once."""

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts": t["ts"],
            "value_cents": _cents(t["value"]),
        })
        return _bucket_by_user(out)

    return _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]
                 ).map_batches(prep, batch_format="pyarrow")


def moving_sum_user_spend(sf_dir: str, window: int = 3):
    """Bounded sliding window frame (``ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW``): per user, per event, the integer-cent sum and row
    count of the last ``window`` events ordered by (ts, event_id) —
    the frame-bounded member of the window family next to the unbounded
    running sum (:func:`~ocr_ray.pipelines.windows.running_user_spend`).

    Same scale shape as every window operator here: one coarse 64-way
    user-bucket shuffle, then a single vectorized pandas
    ``groupby.rolling`` pass resolves every user in the bucket.  Sums
    are cents (ints) so the distributed result is bit-exact vs SQL.
    """

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        r = (g.groupby("user_id", sort=False)["value_cents"]
             .rolling(window, min_periods=1))
        g["win_sum_cents"] = r.sum().to_numpy().astype("int64")
        g["win_n"] = r.count().to_numpy().astype("int64")
        return g[["event_id", "user_id", "win_sum_cents", "win_n"]]

    return (_user_value_frame(sf_dir)
            .groupby("ubucket")
            .map_groups(roll, batch_format="pandas"))


def event_value_minmax(sf_dir: str):
    """Min-max feature scaling per event type (the ML-preprocessing
    normalization): each event's value rescaled to [0, 1e6] ppm within
    its type's observed range — the two-pass broadcast-statistics shape
    (sibling of the z-score gate :func:`event_value_outliers`, with
    Min/Max instead of moments).

    Pass 1 aggregates per-batch partial min/max into a ≤#types-row
    table; the tiny result is broadcast via ``ray.put`` and pass 2 is a
    stateless vectorized map — no row-level shuffle at any scale.  The
    only float op is the final ppm division, written with the oracle's
    exact operand shapes so the doubles are bit-identical.
    """
    from ray.data.aggregate import Max, Min

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "event_type": t["event_type"],
            "cents": _cents(t["value"]),
        }).to_pandas()
        g = df.groupby("event_type", as_index=False)["cents"].agg(
            mn="min", mx="max")
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
    )
    ref = ray.put({r.event_type: (int(r.mn), int(r.mx))
                   for r in stats.itertuples()})

    def scale(t: pa.Table) -> pa.Table:
        mm = ray.get(ref)
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        types = t["event_type"].to_pylist()
        mn = np.fromiter((mm[ty][0] for ty in types), dtype=np.int64,
                         count=len(types))
        mx = np.fromiter((mm[ty][1] for ty in types), dtype=np.int64,
                         count=len(types))
        span = mx - mn
        raw = (cents - mn) * 1000000.0 / np.where(span == 0, 1, span)
        ppm = np.copysign(np.floor(np.abs(raw) + 0.5), raw).astype(np.int64)
        ppm = np.where(span == 0, 0, ppm)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "value_cents": pa.array(cents, pa.int64()),
            "scaled_ppm": pa.array(ppm, pa.int64()),
        })

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]
                 ).map_batches(scale, batch_format="pyarrow")


def doc_length_quantiles_cont(sf_dir: str):
    """INTERPOLATED quantiles (``quantile_cont`` / percentile_cont): the
    continuous sibling of :func:`doc_length_quantiles` — linear
    interpolation between order statistics at position ``q·(n-1)``.

    Identical scale shape (value-count compression: partials bounded by
    the value domain, one repartition(1) final walk); the interpolation
    is one float expression written exactly as DuckDB evaluates it, then
    rounded to 6 dp on both sides.
    """
    import math

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"v": t["n_chars"]}).to_pandas()
        g = df.groupby("v", as_index=False).size().rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("v", as_index=False)["c"].sum().sort_values("v")
        total = int(df["c"].sum())
        cum = df["c"].cumsum().to_numpy()
        vals = df["v"].to_numpy()

        def order_stat(i: int) -> int:       # 0-based order statistic
            return int(vals[int(np.searchsorted(cum, i + 1))])

        qs, out = [], []
        for q in _QUANTILES:
            pos = q * (total - 1)
            lo = math.floor(pos)
            frac = pos - lo
            v_lo = order_stat(lo)
            v_hi = order_stat(min(lo + 1, total - 1))
            qs.append(q)
            out.append(float(np.round(v_lo + frac * (v_hi - v_lo), 6)))
        return pa.table({
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(out, pa.float64()),
        })

    return (
        _read(sf_dir, "documents", ["n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def user_event_paths(sf_dir: str, k: int = 8):
    """Per-user behavioral path: the '>'-joined sequence of the user's
    first ``k`` event types ordered by (ts, event_id) — ordered
    ``string_agg`` per entity (the path/journey primitive of product
    analytics; sibling of :func:`reassemble_chunks` with an entity key
    and a head-k truncation).

    Scale shape: per-batch head-k per user BEFORE the exchange (the
    global first-k of a user is a subset of the union of per-batch
    first-k's), so a hyperactive user ships at most k rows per block;
    then the standing coarse user bucket and one vectorized sort +
    groupby head(k) + join inside.
    """

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values(["user_id", "ts", "event_id"])
                .groupby("user_id", as_index=False, sort=False).head(k))
        df["ubucket"] = (df["user_id"].to_numpy() & (_EVENT_BUCKETS - 1)
                         ).astype(np.int32)
        return df

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["user_id", "ts", "event_id"])
               .groupby("user_id", as_index=False, sort=False).head(k))
        agg = g.groupby("user_id", sort=False).agg(
            path=("event_type", ">".join), n_events=("event_type", "size"))
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg.reset_index()

    return (
        _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
        .map_batches(prep, batch_format="pandas")
        .groupby("ubucket")
        .map_groups(paths, batch_format="pandas")
    )


def crawl_delta(sf_dir: str):
    """Snapshot diff (the incremental-crawl primitive): FULL OUTER join of
    two crawl snapshots by document key with a content-hash compare —
    every key classified added / removed / changed / unchanged.  The two
    snapshots are derived deterministically from the corpus (snapshot B
    drops ``doc_id % 19 == 0``, appends ``' v2'`` to the text of
    ``doc_id % 17 == 0``, and adds a re-keyed clone of ``doc_id % 13 ==
    0`` — the delete/update/insert trio).

    Scale shape: the exchange carries ONLY (doc_id, side, 32-hex md5) —
    never text; both sides ride one read and one coarse 64-way shuffle
    (union-with-side-tag + bucket groupby), and the per-bucket FULL
    OUTER merge + hash compare is one vectorized pandas pass.  This is
    how a 100 TB crawl refresh is reconciled without re-shipping
    payloads.
    """
    from ocr_ray.functions.textstats import md5_fingerprint

    def both_sides(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        text = pc.coalesce(t["text"], pa.scalar(""))
        fp_a = md5_fingerprint(text)
        # side A: every doc
        out_id = [ids]
        out_side = [pa.nulls(t.num_rows, pa.int32()).fill_null(0)]
        out_fp = [fp_a]
        # side B: doc_id%19 removed; %17 text gets ' v2'; %13 clone added
        mod19 = pc.subtract(ids, pc.multiply(pc.divide(ids, 19), 19))
        keep = pc.not_equal(mod19, 0)
        b_ids = ids.filter(keep)
        mod17 = pc.subtract(b_ids, pc.multiply(pc.divide(b_ids, 17), 17))
        b_text = pc.binary_join_element_wise(
            text.filter(keep),
            pc.if_else(pc.equal(mod17, 0), pa.scalar(" v2"), pa.scalar("")),
            "")
        out_id.append(b_ids)
        out_side.append(pa.nulls(len(b_ids), pa.int32()).fill_null(1))
        out_fp.append(md5_fingerprint(b_text))
        mod13 = pc.subtract(ids, pc.multiply(pc.divide(ids, 13), 13))
        added = pc.equal(mod13, 0)
        a_ids = pc.add(ids.filter(added), 2_000_000_000)
        out_id.append(a_ids)
        out_side.append(pa.nulls(len(a_ids), pa.int32()).fill_null(1))
        add_mask = (added.combine_chunks()
                    if isinstance(added, pa.ChunkedArray) else added)
        out_fp.append(fp_a.filter(add_mask))
        tbl = pa.table({
            "doc_id": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in out_id]),
            "side": pa.concat_arrays(out_side),
            "fp": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in out_fp]),
        })
        return tbl.append_column(
            "bucket", pc.cast(pc.bit_wise_and(tbl["doc_id"], 63), pa.int32()))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["doc_id", "fp"]]
        b = g[g["side"] == 1][["doc_id", "fp"]]
        m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
        status = np.where(
            m["fp_a"].isna(), "added",
            np.where(m["fp_b"].isna(), "removed",
                     np.where(m["fp_a"] != m["fp_b"], "changed",
                              "unchanged")))
        return pd.DataFrame({
            "doc_id": m["doc_id"].astype("int64"),
            "status": status,
        })

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(both_sides, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(diff, batch_format="pandas")
    )


def scd2_doc_history(sf_dir: str):
    """Slowly-changing-dimension TYPE-2 history (the warehouse-history
    sibling of :func:`crawl_delta`'s one-step diff): three deterministic
    crawl snapshots of the corpus (snap 1 appends ``' v2'`` to the text
    of ``doc_id % 17 == 0``, snap 2 further appends ``' v3'`` to
    ``doc_id % 11 == 0`` — cumulative revisions, no add/remove, which
    the delta op already covers) are collapsed into one validity row
    per distinct consecutive content version: ``(doc_id, valid_from,
    valid_to, version)`` with valid_to = next change's snapshot index
    and the 3 (= n_snaps) sentinel for the current version (the oracle
    parity convention bans nullable ints).

    Scale shape: ONE read and one coarse 64-way shuffle; the exchange
    carries only (doc_id, snap, 32-hex md5) — three short rows per doc,
    never text — and the per-bucket collapse (sort, per-doc shift
    compare, cumcount versioning, next-start lookahead) is one
    vectorized pandas pass.  This is how a 100 TB crawl's revision
    history is maintained without re-shipping payloads."""
    from ocr_ray.functions.textstats import md5_fingerprint

    def snaps(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        text = pc.coalesce(t["text"], pa.scalar(""))
        mod17 = pc.subtract(ids, pc.multiply(pc.divide(ids, 17), 17))
        t1 = pc.binary_join_element_wise(
            text,
            pc.if_else(pc.equal(mod17, 0), pa.scalar(" v2"), pa.scalar("")),
            "")
        mod11 = pc.subtract(ids, pc.multiply(pc.divide(ids, 11), 11))
        t2 = pc.binary_join_element_wise(
            t1,
            pc.if_else(pc.equal(mod11, 0), pa.scalar(" v3"), pa.scalar("")),
            "")
        n = t.num_rows
        out_ids, out_snap, out_fp = [], [], []
        for snap, txt in enumerate((text, t1, t2)):
            out_ids.append(ids.combine_chunks()
                           if isinstance(ids, pa.ChunkedArray) else ids)
            out_snap.append(pa.nulls(n, pa.int32()).fill_null(snap)
                            if n else pa.array([], pa.int32()))
            out_fp.append(md5_fingerprint(txt))
        tbl = pa.table({
            "doc_id": pa.concat_arrays(out_ids),
            "snap": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in out_snap]),
            "fp": pa.concat_arrays(out_fp),
        })
        return tbl.append_column(
            "bucket", pc.cast(pc.bit_wise_and(tbl["doc_id"], 63), pa.int32()))

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "snap"], kind="mergesort")
        prev = g.groupby("doc_id")["fp"].shift()
        starts = g[prev.isna() | (g["fp"] != prev)].copy()
        starts["version"] = starts.groupby("doc_id").cumcount() + 1
        nxt = starts.groupby("doc_id")["snap"].shift(-1)
        return pd.DataFrame({
            "doc_id": starts["doc_id"].astype("int64"),
            "valid_from": starts["snap"].astype("int64"),
            "valid_to": nxt.fillna(3).astype("int64"),
            "version": starts["version"].astype("int64"),
        })

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(snaps, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(collapse, batch_format="pandas")
    )


def pagerank_two_iter(sf_dir: str):
    """Two unrolled PageRank iterations over a derived doc→doc link graph
    (each doc links to ``(2·id+1) mod N`` and ``(3·id+2) mod N``) — the
    iterative-graph-algorithm family (sibling of the connected-components
    min-label propagation in ``pipelines/graph.py``), with EXACT INTEGER
    arithmetic so the distributed result is bit-stable: ranks are scaled
    by 1e6, the per-edge contribution is ``r // outdeg`` and the damping
    step is ``150000 + (85 · Σcontrib) // 100`` — integer sums commute,
    so block order and parallelism cannot perturb a single bit (the
    float formulation would not survive unordered addition).

    Scale shape per iteration: ONE coarse 64-way shuffle.  A single
    map_batches emits each node's carry-row plus its (pre-aggregated)
    out-edge contributions keyed by destination — node and edge rows
    ride the same pass, never a ``Dataset.union`` of a shared upstream
    (see CLAUDE.md deadlock note) — and the per-bucket combine is one
    vectorized pandas groupby + merge.  N comes from parquet METADATA
    (no data read).
    """
    n_docs = _table_num_rows(sf_dir, "documents")

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "r": pa.nulls(t.num_rows, pa.int64()).fill_null(1_000_000),
        })

    def expand(t: pa.Table) -> pa.Table:
        df = pa.table({"doc_id": t["doc_id"], "r": t["r"]}).to_pandas()
        ids = df["doc_id"].to_numpy()
        contrib = df["r"].to_numpy() // 2        # outdeg is 2 for every node
        e = pd.DataFrame({
            "key": np.concatenate([(ids * 2 + 1) % n_docs,
                                   (ids * 3 + 2) % n_docs]),
            "contrib": np.concatenate([contrib, contrib]),
        }).groupby("key", as_index=False)["contrib"].sum()
        # the node carry-row exists only so combine() sees every key; the
        # next rank derives from contributions alone, so the old rank is
        # NOT shipped through the exchange
        nodes = pd.DataFrame({
            "key": ids, "is_node": np.int8(1), "contrib": np.int64(0),
        })
        e["is_node"] = np.int8(0)
        out = pd.concat([nodes, e[["key", "is_node", "contrib"]]],
                        ignore_index=True)
        out["bucket"] = (out["key"].to_numpy() & 63).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = (g[g["is_node"] == 0]
             .groupby("key", as_index=False)["contrib"].sum())
        nodes = g.loc[g["is_node"] == 1, ["key"]]
        m = nodes.merge(c, on="key", how="left")
        s = m["contrib"].fillna(0).astype("int64")
        return pd.DataFrame({
            "doc_id": m["key"].astype("int64"),
            "r": (150_000 + (85 * s) // 100).astype("int64"),
        })

    ranks = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        seed, batch_format="pyarrow")
    for _ in range(2):
        ranks = (ranks.map_batches(expand, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(combine, batch_format="pandas"))
    return ranks.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "rank_scaled": t["r"]}),
        batch_format="pyarrow")


def triangle_counts(sf_dir: str):
    """Per-node TRIANGLE COUNTS over a derived undirected doc graph
    (edges ``u — (2u+1) mod N, (3u+2) mod N, (5u+3) mod N``) — the
    wedge-closing algorithm every distributed graph engine implements:

      1. adjacency build: one coarse shuffle of both edge directions
         keyed by node; per-bucket dedup, then WEDGES (neighbor pairs
         around an apex) via a vectorized self-merge — degree is
         bounded (≤ 6 here), so wedge fan-out is O(deg²) per node;
      2. wedge closing: a co-partitioned hash join of wedges against
         the distinct-edge set on a single synthesized int64 pair key
         (``a·2³² + b`` — ids stay below 2³²);
      3. per-apex counts via per-batch partials + one coarse bucket sum.

    Each triangle closes exactly three wedges (one per apex), so a
    node's count is the number of triangles containing it.  Both join
    inputs pass through ``repartition(16)`` after their bucket
    ``map_groups`` — the schema-less-empty-block workaround every join
    in this repo applies (see CLAUDE.md / dedupe_pairs).
    """
    n_docs = _table_num_rows(sf_dir, "documents")
    gens = ((2, 1), (3, 2), (5, 3))

    def _dests(ids: np.ndarray) -> list[np.ndarray]:
        return [(m * ids + c) % n_docs for m, c in gens]

    def directed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        ds_ = _dests(ids)
        u = np.concatenate([ids] * len(gens) + ds_)
        v = np.concatenate(ds_ + [ids] * len(gens))
        keep = u != v
        out = pd.DataFrame({"node": u[keep], "nbr": v[keep]}).drop_duplicates()
        out["bucket"] = (out["node"].to_numpy() & 63).astype(np.int32)
        return out

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["node", "nbr"])[["node", "nbr"]]
        m = g.merge(g, on="node")
        m = m[m["nbr_x"] < m["nbr_y"]]
        return pd.DataFrame({
            "pair_key": (m["nbr_x"].to_numpy().astype(np.int64) << 32)
                        + m["nbr_y"].to_numpy().astype(np.int64),
            "apex": m["node"].to_numpy().astype(np.int64),
        })

    def edge_keys(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        ds_ = _dests(ids)
        u = np.concatenate([ids] * len(gens))
        v = np.concatenate(ds_)
        keep = u != v
        a = np.minimum(u[keep], v[keep]).astype(np.int64)
        b = np.maximum(u[keep], v[keep]).astype(np.int64)
        out = pd.DataFrame({"pair_key": (a << 32) + b}).drop_duplicates()
        out["bucket"] = (out["pair_key"].to_numpy() & 63).astype(np.int32)
        return out

    def distinct_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["pair_key"])[["pair_key"]]

    wedge_ds = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(directed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
        .repartition(16)
    )
    edge_ds = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(edge_keys, batch_format="pandas")
        .groupby("bucket")
        .map_groups(distinct_edges, batch_format="pandas")
        .repartition(16)
    )
    matched = wedge_ds.join(edge_ds, join_type="inner", num_partitions=16,
                            on=("pair_key",))

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("apex", as_index=False).size()
               .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        g["bucket"] = (g["apex"].to_numpy() & 63).astype(np.int32)
        return g

    def final_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("apex", as_index=False)["n"].sum()
        return pd.DataFrame({
            "doc_id": out["apex"].astype("int64"),
            "n_triangles": out["n"].astype("int64"),
        })

    return (
        matched
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final_counts, batch_format="pandas")
    )


def tree_depths(sf_dir: str):
    """Recursive hierarchy traversal: each node's depth in a derived
    forest-free tree (``parent(v) = (v·2654435761 mod 2³²) mod v``, root
    0) via POINTER DOUBLING — the distributed answer to a recursive CTE
    (the oracle IS ``WITH RECURSIVE``), converging in ⌈log₂ depth⌉
    rounds instead of depth rounds (~6 rounds for the ~40-deep chains a
    10¹²-node corpus would produce; ids are assumed < 2³¹ so the hash
    product fits int64, the same bound the triangle pair key uses).

    Per round, ONE coarse shuffle and NO ``Dataset.join`` (and no
    shared-upstream union — see CLAUDE.md): a single map emits, per
    node, its directory row keyed by itself plus — only while the node
    is unsettled — a query row keyed by its current ancestor; the
    per-bucket combine is a vectorized merge that advances each query
    to its ancestor's ancestor and accumulates the jumped distance.
    Settled rows (ancestor = root) ride through keyed by their own id,
    so the late-round hot key is only ever the shrinking pending set.
    The state is materialized per round (bounded: 3 int64 columns) to
    keep lineage flat and make the early-exit pending count free.
    """
    import math

    n_docs = _table_num_rows(sf_dir, "documents")

    def seed(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        anc = np.where(
            ids > 0,
            (ids * 2654435761 % 2**32) % np.maximum(ids, 1), 0)
        return pa.table({
            "node": pa.array(ids, pa.int64()),
            "anc": pa.array(anc.astype(np.int64), pa.int64()),
            "d": pa.array((ids > 0).astype(np.int64), pa.int64()),
        })

    def emit(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        directory = pd.DataFrame({
            "key": df["node"], "kind": np.int8(0),
            "node": df["node"], "anc": df["anc"], "d": df["d"],
        })
        pend = df[df["anc"] != 0]
        queries = pd.DataFrame({
            "key": pend["anc"], "kind": np.int8(1),
            "node": pend["node"], "anc": pend["anc"], "d": pend["d"],
        })
        # settled nodes need no extra row: their directory row (key=node,
        # anc==0) already lands in their bucket and combine() re-emits it
        # as final state — late rounds shuffle N+P rows, not 2N+P
        out = pd.concat([directory, queries], ignore_index=True)
        out["bucket"] = (out["key"].to_numpy() & 63).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        directory = g[g["kind"] == 0][["node", "anc", "d"]].rename(
            columns={"node": "key", "anc": "anc2", "d": "d2"})
        q = g[g["kind"] == 1][["node", "anc", "d"]]
        m = q.merge(directory, left_on="anc", right_on="key", how="left")
        advanced = pd.DataFrame({
            "node": m["node"],
            "anc": m["anc2"].fillna(0).astype("int64"),
            "d": (m["d"] + m["d2"].fillna(0)).astype("int64"),
        })
        done = directory.loc[directory["anc2"] == 0].rename(
            columns={"key": "node", "anc2": "anc", "d2": "d"})
        return pd.concat([advanced, done[["node", "anc", "d"]]],
                         ignore_index=True)

    st = (_read(sf_dir, "documents", ["doc_id"])
          .map_batches(seed, batch_format="pyarrow")
          .materialize())
    max_rounds = max(1, math.ceil(math.log2(max(2, n_docs))))
    for _ in range(max_rounds):
        pending = st.map_batches(
            lambda t: pa.table({"n": pa.array(
                [int(pc.sum(pc.cast(pc.not_equal(t["anc"], 0),
                                    pa.int64())).as_py() or 0)],
                pa.int64())}),
            batch_format="pyarrow").sum("n")
        if not pending:
            break
        st = (st.map_batches(emit, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(combine, batch_format="pandas")
              .materialize())
    return st.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "depth": t["d"]}),
        batch_format="pyarrow")


def _skyline_sweep(df: pd.DataFrame) -> pd.DataFrame:
    """Pure 2-D skyline kernel (minimize price_cents, maximize
    o_orderdate): vectorized sweep — sort by (price asc, date desc),
    keep rows whose date equals their price-group max AND exceeds the
    running max date over all strictly cheaper groups.  Equal (price,
    date) rows dominate neither way and all survive."""
    df = df.sort_values(["price_cents", "o_orderdate"],
                        ascending=[True, False])
    grp_max = df.groupby("price_cents")["o_orderdate"].transform("max")
    firsts = df.drop_duplicates("price_cents", keep="first")
    lower = firsts["o_orderdate"].cummax().shift(1)
    lower_map = dict(zip(firsts["price_cents"], lower))
    best_lower = df["price_cents"].map(lower_map)
    keep = (df["o_orderdate"] == grp_max) & (
        best_lower.isna() | (df["o_orderdate"] > best_lower))
    return df.loc[keep, ["o_orderkey", "price_cents", "o_orderdate"]]


def skyline_orders(sf_dir: str):
    """SKYLINE (Pareto front) preference query: orders not dominated on
    (price ↓, order date ↑) — no other order is both no-more-expensive
    and no-older with at least one strict improvement.  The classic
    two-phase distributed skyline:

      phase 1 (per batch, vectorized): a local sweep — sort by
        (price asc, date desc), keep rows whose date exceeds the
        running max of all strictly-cheaper rows.  Safe pruning: any
        globally undominated row is locally undominated, so batch
        skylines are a superset of the answer and the exchange carries
        only those few candidate rows per block;
      phase 2 (one ``repartition(1)`` task): the identical exact sweep
        over the concatenated candidates (a 2-D skyline of random data
        is O(log n)-sized, so the final task is trivially small).

    Domination ties: equal (price, date) rows dominate neither way and
    all survive together.
    """

    def local(t: pa.Table) -> pa.Table:
        df = pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_cents": _cents(t["o_totalprice"]),
            "o_orderdate": t["o_orderdate"],
        }).to_pandas()
        return pa.Table.from_pandas(_skyline_sweep(df), preserve_index=False)

    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])
        .map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_skyline_sweep, batch_format="pandas",
                     batch_size=None)
    )


def conversion_pattern_users(sf_dir: str):
    """Sequence-pattern matching (MATCH_RECOGNIZE-lite): users whose
    event-type sequence, ordered by (ts, event_id), contains the
    consecutive pattern view → click → purchase — stricter than the
    funnel (:func:`event_funnel`), which allows gaps.

    Scale shape: the per-batch head-k trick does NOT apply (the pattern
    can straddle any position), so each user's full type sequence is
    assembled inside the standing coarse user bucket — one shuffle of
    (user, type, ts) triples — and the pattern test is a vectorized
    ``str.contains`` over the joined per-user path strings.  Output is
    the matching user ids only.
    """
    pattern = "view>click>purchase"

    def prep(t: pa.Table) -> pa.Table:
        return _bucket_by_user(t)

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        paths = g.groupby("user_id", sort=False)["event_type"].agg(">".join)
        hit = paths.index[paths.str.contains(pattern, regex=False)]
        return pd.DataFrame({"user_id": np.asarray(hit, dtype=np.int64)})

    return (
        _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(match, batch_format="pandas")
    )


def token_entropy(sf_dir: str):
    """Per-document Shannon token entropy (the vocabulary-diversity
    quality signal next to the repetition and stopword gates):
    ``H = ln(n) − Σ c·ln(c) / n`` over whitespace-token counts.

    Purely per-row — no shuffle at any scale; the only float math is a
    per-doc bounded sum of ``c·ln(c)`` terms, written with the oracle's
    exact expression shape and rounded to 6 dp on both sides (the
    pmi/corr convention).  Empty docs report n_tokens 0, entropy 0.
    """

    _ws = __import__("re").compile(r"[ \t\n\f\r]+")  # RE2's \s exactly

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        ents, counts = [], []
        for txt in t["text"].to_pylist():
            # split on the oracle's exact whitespace class: Python
            # str.split also breaks on \v/\x85/\xa0/U+2028, which
            # DuckDB's RE2 \s does not — structural parity, not
            # corpus-pinned parity
            toks = [x for x in _ws.split(txt or "") if x]
            n = len(toks)
            counts.append(n)
            if n == 0:
                ents.append(0.0)
                continue
            _, c = np.unique(np.asarray(toks, dtype=object),
                             return_counts=True)
            c = c.astype(np.float64)
            ents.append(float(np.round(
                np.log(float(n)) - float(np.sum(c * np.log(c))) / float(n),
                6)))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "entropy": pa.array(ents, pa.float64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def revenue_share_by_priority(sf_dir: str):
    """RATIO-TO-REPORT: each order priority's revenue as ppm of total
    revenue (`sum(x) OVER () `-style percent-of-total) — the report
    operator that pairs a grouped aggregate with its own grand total.

    Scale shape: ONE pass of per-batch partials feeds the ≤5-key
    groupby; the grand total is the sum of that tiny result, so both
    levels ride a single ``repartition(1)`` final task — no second scan
    and no broadcast round-trip.  The share is integer ppm computed as
    ``(revenue · 1e6) // total`` (floor), bit-stable at any block order.
    """

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "revenue_cents": _cents(t["o_totalprice"]),
        })

    grouped = _grouped_sum(
        _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]),
        measures, keys=["o_orderpriority"], sum_cols=["revenue_cents"],
        count_col="n_orders",
    )

    def share(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["revenue_cents"].sum())
        df = df.copy()
        # Python-int arithmetic (the task holds <= #priorities rows):
        # rev * 1e6 would wrap numpy int64 at ~$92B per group, while the
        # DuckDB oracle computes in HUGEINT — arbitrary precision keeps
        # the two sides identical at any scale
        df["share_ppm"] = pd.array(
            [int(r) * 1_000_000 // total for r in df["revenue_cents"]],
            dtype="int64")
        return df[["o_orderpriority", "n_orders", "revenue_cents",
                   "share_ppm"]]

    return grouped.repartition(1).map_batches(
        share, batch_format="pandas", batch_size=None)


def doc_length_quantiles_cont_by_lang(sf_dir: str):
    """GROUPED interpolated quantiles — completes the 2×2 quantile
    matrix (discrete/continuous × global/per-group).  Same value-count
    compression as :func:`doc_length_quantiles_by_lang` (partials
    bounded by langs × value domain), with the percentile_cont
    interpolation at ``q·(n−1)`` inside the single bounded final task,
    written in the oracle's exact float shape and rounded at 6 dp.
    """
    import math

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"lang": t["lang"], "v": t["n_chars"]}).to_pandas()
        g = (df.groupby(["lang", "v"], as_index=False, dropna=False)
               .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
               .groupby(["lang", "v"], as_index=False, dropna=False)["c"].sum())
        langs, qs, vals_out = [], [], []
        for lang, g in df.groupby("lang", sort=True, dropna=False):
            g = g.sort_values("v")
            total = int(g["c"].sum())
            cum = g["c"].cumsum().to_numpy()
            vals = g["v"].to_numpy()

            def order_stat(i: int) -> int:
                return int(vals[int(np.searchsorted(cum, i + 1))])

            for q in _QUANTILES:
                pos = q * (total - 1)
                lo = math.floor(pos)
                frac = pos - lo
                v_lo = order_stat(lo)
                v_hi = order_stat(min(lo + 1, total - 1))
                langs.append(lang)
                qs.append(q)
                vals_out.append(float(np.round(
                    v_lo + frac * (v_hi - v_lo), 6)))
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(vals_out, pa.float64()),
        })

    return (
        _read(sf_dir, "documents", ["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _lang_char_stats(ds):
    """(lang, n_docs, total_chars) rollup used by the source-format
    ingestion queries — per-batch partials then a tiny groupby."""
    return _grouped_sum(
        ds,
        lambda t: pa.table({
            "lang": t["lang"],
            "total_chars": pc.cast(t["n_chars"], pa.int64()),
        }),
        keys=["lang"], sum_cols=["total_chars"], count_col="n_docs",
    )


def jsonl_ingest_stats(sf_dir: str):
    """SOURCE FORMAT: line-delimited JSON ingestion (SURVEY §2 A beyond
    parquet — the reference's inter-stage JSON artifacts as a first-class
    distributed source).  The corpus is derived deterministically to
    sharded JSONL (content-fingerprint cached, atomic) and re-read with
    ``ray.data.read_json``; the oracle computes the same rollup from the
    parquet base table, so any serialization / schema-inference drift in
    the round trip breaks the value hash.
    """
    from ocr_ray.sources.text_formats import read_documents_jsonl

    return _lang_char_stats(read_documents_jsonl(sf_dir))


def csv_ingest_stats(sf_dir: str):
    """SOURCE FORMAT: RFC-4180 CSV ingestion via ``ray.data.read_csv``
    (quoted text column — commas/quotes in payloads exercise real
    escaping).  Same round-trip-vs-base-table oracle discipline as
    :func:`jsonl_ingest_stats`.
    """
    from ocr_ray.sources.text_formats import read_documents_csv

    return _lang_char_stats(read_documents_csv(sf_dir))


def jsonl_export_roundtrip_stats(sf_dir: str):
    """SINK FORMAT: distributed ``Dataset.write_json`` export (every
    worker writes its own shard — the A4-A6 writer family beyond
    parquet) re-ingested with ``read_json``; the oracle's rollup from
    the base table pins the full sink → source round trip.  File naming
    is worker-dependent, so only the (deterministic) rollup is
    hash-compared, never file bytes.
    """
    from ocr_ray.sources.text_formats import read_exported_jsonl

    return _lang_char_stats(read_exported_jsonl(sf_dir))


def embedding_norms(sf_dir: str):
    """Vector-math kernel over the embedding column: per-vector L1 and
    L∞ norms in exact scaled-integer units (components rounded to 1e-6
    first, so distributed evaluation is bit-stable — the L2 norm is
    degenerate on this unit-normalized corpus and would hide errors).

    Zero-copy vectorization: the ``list<float>`` column's flat values
    buffer reshapes to an (n, dim) matrix per batch — no per-row Python.
    Embarrassingly parallel; no shuffle at any scale.
    """

    def f(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        dim = len(flat) // max(1, t.num_rows)
        m = flat.reshape(t.num_rows, dim) * 1_000_000.0
        scaled = np.abs(np.copysign(np.floor(np.abs(m) + 0.5), m)
                        ).astype(np.int64)
        return pa.table({
            "vec_id": t["vec_id"],
            "l1_e6": pa.array(scaled.sum(axis=1), pa.int64()),
            "linf_e6": pa.array(scaled.max(axis=1), pa.int64()),
        })

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        f, batch_format="pyarrow")


def fk_integrity_audit(sf_dir: str):
    """DATA-QUALITY audit: orphan counts for the foreign-key edges of
    the relational graph (lineitem→orders, orders→customer,
    customer→nation) — the referential-integrity check a lakehouse runs
    after every load.

    Scale shape per edge: the side-tag anti-join template (crawl_delta)
    — child rows ship only (key, side) pre-deduped per batch; parent
    KEYS ride the same coarse 64-way bucket; one vectorized membership
    test per bucket emits a single orphan-count partial, folded in a
    bounded final task.  Neither table is broadcast, so both sides may
    be arbitrarily large.

    The edges run as separate sequential executions DELIBERATELY: a
    fused variant (6-way tagged union into one shuffle) measured 12.4 s
    vs 6.9 s at sf0.1 — multi-input union scheduling costs more than
    the per-execution fixed overhead it saves in this Ray version.
    """

    edges = (
        ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer_nation", "customer", "c_nationkey", "nation",
         "n_nationkey"),
    )

    def count_orphans(child, ckey, parent, pkey):
        def child_keys(t: pa.Table) -> pa.Table:
            k = t[ckey]
            tbl = pa.table({"key": k}).group_by("key").aggregate(
                [("key", "count")]).rename_columns(["key", "n"])
            return pa.table({
                "key": pc.cast(tbl["key"], pa.int64()),
                "n": pc.cast(tbl["n"], pa.int64()),
                "side": pa.nulls(tbl.num_rows, pa.int8()).fill_null(0),
                "bucket": pc.cast(pc.bit_wise_and(tbl["key"], 63),
                                  pa.int32()),
            })

        def parent_keys(t: pa.Table) -> pa.Table:
            k = pc.unique(t[pkey].combine_chunks()
                          if isinstance(t[pkey], pa.ChunkedArray)
                          else t[pkey])
            return pa.table({
                "key": pc.cast(k, pa.int64()),
                "n": pa.nulls(len(k), pa.int64()).fill_null(0),
                "side": pa.nulls(len(k), pa.int8()).fill_null(1),
                "bucket": pc.cast(pc.bit_wise_and(k, 63), pa.int32()),
            })

        def orphan_partial(g: pd.DataFrame) -> pd.DataFrame:
            parents = set(g.loc[g["side"] == 1, "key"])
            ch = g[g["side"] == 0]
            orphans = int(ch.loc[~ch["key"].isin(parents), "n"].sum())
            return pd.DataFrame({"n_orphans": pd.array([orphans], "int64")})

        # child and parent rows ride SEPARATE reads (no shared upstream)
        # into one union-free exchange: concat of two lineages via
        # from_items is not possible — instead the two map outputs are
        # unioned at the Ray level, safe because the upstreams are
        # independent read_parquet datasets (the deadlock is only over a
        # SHARED upstream; see CLAUDE.md).
        ds = _read(sf_dir, child, [ckey]).map_batches(
            child_keys, batch_format="pyarrow").union(
            _read(sf_dir, parent, [pkey]).map_batches(
                parent_keys, batch_format="pyarrow"))
        total = (ds.groupby("bucket")
                 .map_groups(orphan_partial, batch_format="pandas")
                 .sum("n_orphans"))
        return int(total or 0)

    rows = []
    for name, child, ckey, parent, pkey in edges:
        rows.append((name, count_orphans(child, ckey, parent, pkey)))
    return pa.table({
        "fk_edge": pa.array([r[0] for r in rows], pa.string()),
        "n_orphans": pa.array([r[1] for r in rows], pa.int64()),
    })


def pk_uniqueness_audit(sf_dir: str):
    """DATA-QUALITY audit #2: key-uniqueness check per table (the PK
    counterpart of :func:`fk_integrity_audit`) — row count, exact
    distinct-key count and the duplicate surplus for every keyed table.

    Scale shape per table: per-batch distinct pre-dedup (≤1 row per key
    per block crosses the wire), exact per-bucket nunique inside the
    coarse 64-way key bucket, then two tiny folds.  The pages corpus
    intentionally carries doc_id % 23 re-crawl rows, so `documents` is
    audited on doc_id (unique) while the derived events stream is
    audited on event_id — all clean tables report zero surplus and any
    loader bug shows up as a positive count.
    """
    tables = (
        ("documents", "doc_id"), ("events", "event_id"),
        ("orders", "o_orderkey"), ("customer", "c_custkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
    )

    def audit_one(table: str, key: str) -> tuple[int, int]:
        def prep(t: pa.Table) -> pa.Table:
            k = pc.unique(t[key].combine_chunks()
                          if isinstance(t[key], pa.ChunkedArray) else t[key])
            return pa.table({
                "key": pc.cast(k, pa.int64()),
                "bucket": pc.cast(pc.bit_wise_and(k, 63), pa.int32()),
                "n_rows_batch": pa.nulls(len(k), pa.int64()).fill_null(0),
            }).set_column(
                2, "n_rows_batch",
                pa.array([t.num_rows] + [0] * (len(k) - 1), pa.int64()))

        def distinct_partial(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n_distinct": pd.array([g["key"].nunique()], "int64"),
                "n_rows": pd.array([int(g["n_rows_batch"].sum())], "int64"),
            })

        res = (_read(sf_dir, table, [key])
               .map_batches(prep, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(distinct_partial, batch_format="pandas")
               .to_pandas())
        return int(res["n_rows"].sum()), int(res["n_distinct"].sum())

    names, rows_l, dist_l, dup_l = [], [], [], []
    for table, key in tables:
        n_rows, n_distinct = audit_one(table, key)
        names.append(f"{table}.{key}")
        rows_l.append(n_rows)
        dist_l.append(n_distinct)
        dup_l.append(n_rows - n_distinct)
    return pa.table({
        "key_col": pa.array(names, pa.string()),
        "n_rows": pa.array(rows_l, pa.int64()),
        "n_distinct": pa.array(dist_l, pa.int64()),
        "n_dup_surplus": pa.array(dup_l, pa.int64()),
    })


def moving_median_user_spend(sf_dir: str, window: int = 3):
    """ORDER-STATISTIC window frame: per user, the median of the last
    ``window`` integer-cent values ordered by (ts, event_id) — the
    non-algebraic member of the frame family (sum/count fold; median
    needs the actual window contents, which is why real engines treat
    it separately).

    Same one-shuffle coarse-user-bucket shape as
    :func:`moving_sum_user_spend`; medians of ≤ ``window`` integers are
    either integers or .5 halves — exactly representable doubles, so
    pandas ``rolling().median()`` and DuckDB ``median() OVER`` agree
    bit-for-bit.
    """

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        med = (g.groupby("user_id", sort=False)["value_cents"]
               .rolling(window, min_periods=1).median())
        g["win_median_cents"] = med.to_numpy().astype("float64")
        return g[["event_id", "user_id", "win_median_cents"]]

    return (_user_value_frame(sf_dir)
            .groupby("ubucket")
            .map_groups(roll, batch_format="pandas"))


def bucketed_join_revenue(sf_dir: str, n_buckets: int = 16,
                          cache_root: str = "/tmp/ocr_ray_bucketed"):
    """STORAGE-PARTITIONED JOIN (Spark-SPJ / Iceberg-bucketing analogue):
    both join sides are written ONCE as hive-bucketed layouts
    (``bucket=hash(key)%N``, content-fingerprint cached + atomic
    publish), and the join itself then runs as ONE independent Ray task
    per bucket reading only that bucket's file pair — ZERO shuffle at
    query time, because co-location was paid at write time.  This is
    the physical-layout dual of :func:`hash_join_revenue` (identical
    semantics and oracle; the Dataset.join there exchanges both sides
    every run).

    The per-bucket task joins vectorized (pandas merge) and emits the
    pre-aggregated per-priority partials; a tiny groupby folds ≤
    5·n_buckets rows.
    """
    import glob as _glob
    import uuid as _uuid

    import pyarrow.parquet as pq
    import ray as _ray

    from ocr_ray.sources.text_formats import _fingerprint, publish_atomic

    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"

    def _bucketize(table: str, key: str, columns: list[str]) -> str:
        src = os.path.join(sf_dir, f"{table}.parquet")
        # key, columns and bucket count are part of the layout identity:
        # a code change must never silently reuse a stale /tmp layout
        fp = _fingerprint(src, extra=f"{key}:{','.join(columns)}:b{n_buckets}")
        out = os.path.join(cache_root, f"{table}-{fp}")
        if os.path.exists(os.path.join(out, "_DONE")):
            return out
        tmp = f"{out}-tmp-{_uuid.uuid4().hex}"
        t = pq.read_table(src, columns=columns)
        b = pc.cast(pc.bit_wise_and(t[key], n_buckets - 1), pa.int32())
        t = t.append_column("bucket", b)
        import ray.data as _rd
        _rd.from_arrow(t).write_parquet(tmp, partition_cols=["bucket"])
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("ok\n")
        return publish_atomic(tmp, out)

    li_dir = _bucketize("lineitem", "l_orderkey",
                        ["l_orderkey", "l_extendedprice", "l_discount"])
    o_dir = _bucketize("orders", "o_orderkey",
                       ["o_orderkey", "o_orderpriority"])

    @_ray.remote(num_cpus=1)
    def join_bucket(b: int) -> "pa.Table":
        pa.set_cpu_count(1)
        li_files = sorted(_glob.glob(
            os.path.join(li_dir, f"bucket={b}", "*.parquet")))
        o_files = sorted(_glob.glob(
            os.path.join(o_dir, f"bucket={b}", "*.parquet")))
        if not li_files or not o_files:
            return pa.table({
                "o_orderpriority": pa.array([], pa.string()),
                "revenue_e4": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
            })
        li = pa.concat_tables([pq.read_table(f, use_threads=False)
                               for f in li_files]).to_pandas()
        o = pa.concat_tables([pq.read_table(f, use_threads=False)
                              for f in o_files]).to_pandas()
        m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        rev = m["l_extendedprice"] * (1.0 - m["l_discount"]) * 10000.0
        m["revenue_e4"] = np.copysign(
            np.floor(np.abs(rev) + 0.5), rev).astype("int64")
        g = m.groupby("o_orderpriority", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"), n_items=("revenue_e4", "size"))
        g["revenue_e4"] = g["revenue_e4"].astype("int64")
        g["n_items"] = g["n_items"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = pa.concat_tables(
        _ray.get([join_bucket.remote(b) for b in range(n_buckets)]))
    df = partials.to_pandas().groupby("o_orderpriority", as_index=False).agg(
        revenue_e4=("revenue_e4", "sum"), n_items=("n_items", "sum"))
    df["revenue_e4"] = df["revenue_e4"].astype("int64")
    df["n_items"] = df["n_items"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------------------------------
# round-4 additions: bloom semi join, split assignment, sequence packing
# ---------------------------------------------------------------------------

def _md5_u64(values) -> np.ndarray:
    """md5-lower-64(str(v)) as uint64 — the repo-wide deterministic hash
    (DuckDB twin: md5_number_lower(CAST(v AS VARCHAR))).  The ONE place
    the md5 loop lives; every oracle-reproducible bucket/sample/rank in
    this module derives from it (VERDICT r4 nit 3).  md5 (not a cheaper
    mix) is deliberate: DuckDB recomputes it bit-for-bit."""
    import hashlib

    vals = values if isinstance(values, list) else list(values)
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:16],
                        "little") for v in vals),
        dtype=np.uint64, count=len(vals))


def _md5_mod(values, mod: int) -> np.ndarray:
    """md5-lower-64(str(v)) % mod as int64 (bucket convention)."""
    return (_md5_u64(values) % np.uint64(mod)).astype(np.int64)


def bloom_semi_join_revenue(sf_dir: str, priority: str = "1-URGENT",
                            fp_rate: float = 0.01):
    """Bloom-pruned EXACT semi join: revenue of lineitems whose order has
    ``o_orderpriority = priority``, rolled up per l_returnflag.

    The scale topology the reference's in-memory key-set join cannot reach:

      1. **distributed bloom build** — each build-side batch emits a
         PARTIAL BloomFilter byte array (fixed size, set once on the
         driver from parquet metadata row counts); the driver folds them
         with a byte OR, so it holds a few-hundred-KB filter, never the
         key set, at any corpus size;
      2. **probe-side prune** — one vectorized ``contains_many_u64`` per
         lineitem batch drops ~(1 - selectivity - fp_rate) of the probe
         rows BEFORE the shuffle (false positives pass, false negatives
         impossible);
      3. **exact verify** — surviving candidates are pre-aggregated per
         (orderkey, returnflag) per batch and co-partitioned with the
         build keys on the 64-way coarse bucket (fk_integrity_audit's
         side-tag template; union of two INDEPENDENT read lineages is
         safe per CLAUDE.md), where one vectorized isin per bucket
         removes the bloom false positives.

    Result is therefore exactly the SQL semi join; the bloom only prunes
    shuffle volume.  Ref semantics: the reference's requested↔results
    containment joins (qc_head.py) re-expressed as a corpus-scale
    semi join."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.bloom import BloomFilter

    # filter sizing must be identical in every task: derive capacity from
    # parquet METADATA (no data read) on the driver.
    cap = max(64, _table_num_rows(sf_dir, "orders") // 4)
    proto = BloomFilter.for_capacity(cap, fp_rate)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    def partial_bloom(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, n_hashes)
        keep = pc.equal(t["o_orderpriority"], priority)
        keys = pc.cast(t.filter(keep)["o_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        bf.add_many_u64(keys)
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    bloom = BloomFilter(n_bits, n_hashes)
    for row in orders.map_batches(
            partial_bloom, batch_format="pyarrow").take_all():
        bloom.union_inplace(np.frombuffer(row["bits"], dtype=np.uint8))
    bloom_ref = ray.put(bloom)

    def prune(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        keys = pc.cast(t["l_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        t = t.filter(pa.array(bf.contains_many_u64(keys)))
        df = t.to_pandas()
        df["revenue_e4"] = _cents(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(1.0, t["l_discount"])), 10000).to_numpy()
        g = df.groupby(["l_orderkey", "l_returnflag"], as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"), n_items=("revenue_e4", "size"))
        return pa.table({
            "key": pa.array(g["l_orderkey"], pa.int64()),
            "l_returnflag": pa.array(g["l_returnflag"], pa.string()),
            "revenue_e4": pa.array(g["revenue_e4"], pa.int64()),
            "n_items": pa.array(g["n_items"], pa.int64()),
            "side": pa.nulls(len(g), pa.int8()).fill_null(0),
            "bucket": pa.array(
                np.bitwise_and(g["l_orderkey"].to_numpy(), 63), pa.int32()),
        })

    def build_keys(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderpriority"], priority)
        k = pc.unique(pc.cast(t.filter(keep)["o_orderkey"], pa.int64())
                      .combine_chunks())
        return pa.table({
            "key": k,
            # zero-filled so the unioned pandas columns stay int64 (nulls
            # would coerce them to float64 and poison the exact sums)
            "l_returnflag": pa.nulls(len(k), pa.string()).fill_null(""),
            "revenue_e4": pa.nulls(len(k), pa.int64()).fill_null(0),
            "n_items": pa.nulls(len(k), pa.int64()).fill_null(0),
            "side": pa.nulls(len(k), pa.int8()).fill_null(1),
            "bucket": pc.cast(pc.bit_wise_and(k, 63), pa.int32()),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        parents = set(g.loc[g["side"] == 1, "key"])
        cand = g[g["side"] == 0]
        kept = cand[cand["key"].isin(parents)]
        out = kept.groupby("l_returnflag", as_index=False).agg(
            revenue_e4=("revenue_e4", "sum"), n_items=("n_items", "sum"))
        out["revenue_e4"] = out["revenue_e4"].astype("int64")
        out["n_items"] = out["n_items"].astype("int64")
        return out

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])
    cand = li.map_batches(prune, batch_format="pyarrow")
    keys = _read(sf_dir, "orders",
                 ["o_orderkey", "o_orderpriority"]).map_batches(
        build_keys, batch_format="pyarrow")
    return (cand.union(keys)
            .groupby("bucket")
            .map_groups(verify, batch_format="pandas")
            .groupby("l_returnflag")
            .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                       Sum("n_items", alias_name="n_items")))


def dataset_split_counts(sf_dir: str):
    """Deterministic stratified train/val/test assignment (the LLM-corpus
    split step): doc → split by md5-lower-64(str(doc_id)) % 100
    (< 90 train, < 95 val, else test), rolled up to
    (lang, split, n_docs, sum_tokens).  Hash-based so the assignment is
    stable across runs, partitioning, resume and engines — a doc never
    migrates between train and eval when the corpus is re-sharded.
    Embarrassingly parallel; the groupby sees ≤ 3·n_langs keys."""
    from ocr_ray.functions import textstats

    def measures(t: pa.Table) -> pa.Table:
        h = _md5_mod(t["doc_id"].to_pylist(), 100)
        split = np.where(h < 90, "train", np.where(h < 95, "val", "test"))
        return pa.table({
            "lang": t["lang"],
            "split": pa.array(split, pa.string()),
            "sum_tokens": textstats.token_count_columns(
                t["text"])["n_ws_tokens"],
        })

    return _grouped_sum(
        _read(sf_dir, "documents", ["doc_id", "lang", "text"]),
        measures, keys=["lang", "split"], sum_cols=["sum_tokens"],
        count_col="n_docs",
    )


def pack_context_windows(sf_dir: str, cap_tokens: int = 256,
                         n_shards: int = 64):
    """Greedy token-budget sequence packing (the LLM-pretraining step that
    fills fixed-size context windows from variable-length documents):
    within each shard, scan docs in doc_id order and append to the current
    bin while ``bin_tokens + doc_tokens <= cap_tokens``; otherwise open a
    new bin (an oversized doc occupies a bin alone).  Output one row per
    doc: (doc_id, shard, bin_idx, n_tokens).

    Sharding by md5(doc_id) % n_shards makes packing embarrassingly
    parallel ACROSS shards while staying deterministic — the standard
    trade: global packing is inherently sequential, so production packers
    shard first and pack within shards.  The per-shard kernel is
    O(n_bins) numpy ``searchsorted`` steps over the token cumsum, not a
    per-row Python loop.  Shuffle is one 64-key coarse exchange carrying
    only (doc_id, shard, n_tokens) — the text never moves."""
    from ocr_ray.functions import textstats

    def prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "shard": pa.array(_md5_mod(ids, n_shards), pa.int64()),
            "n_tokens": textstats.token_count_columns(
                t["text"])["n_ws_tokens"],
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        toks = g["n_tokens"].to_numpy()
        s = np.cumsum(toks)
        bins = np.empty(len(g), np.int64)
        a, b_idx, base = 0, 0, 0
        while a < len(g):
            j = int(np.searchsorted(s, base + cap_tokens, side="right"))
            j = max(j, a + 1)                 # oversized doc: bin of one
            bins[a:j] = b_idx
            base = int(s[j - 1])
            a, b_idx = j, b_idx + 1
        g["bin_idx"] = bins
        return g[["doc_id", "shard", "bin_idx", "n_tokens"]]

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack, batch_format="pandas"))


def heavy_hitter_terms(sf_dir: str, k: int = 200):
    """EXACT frequent terms (count·k > N) via the two-phase heavy-hitter
    topology — the shuffle-avoiding alternative to :func:`top_terms`'s
    full-vocabulary aggregate:

      1. per-batch token Counter partials (term, n, bucket) materialized
         ONCE; a term is a CANDIDATE in a batch iff ``n·k > N_batch``.
         Averaging argument: if globally ``n·k > N`` then some batch has
         ``n_b·k > N_b``, so the candidate union is a guaranteed superset
         of the true heavy hitters (the Misra-Gries local-threshold bound:
         < k candidates per batch reach the driver, never the vocabulary);
      2. exact recount restricted to the broadcast candidate set over the
         SAME partials (no second text pass), final filter ``n·k > N``.

    Integer-only comparisons (``n*k > N``) — no float thresholds to
    disagree with the oracle.  Output (term, n), count desc / term asc."""
    import collections
    import zlib

    from ray.data.aggregate import Sum

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            c.update((txt or "").lower().split())
        toks = list(c.keys())
        n_batch = sum(c.values())
        return pa.table({
            "term": pa.array(toks, pa.string()),
            "n": pa.array([c[tk] for tk in toks], pa.int64()),
            "cand": pa.array([c[tk] * k > n_batch for tk in toks],
                             pa.bool_()),
            "bucket": pa.array(
                [zlib.crc32(tk.encode()) % n_buckets for tk in toks],
                pa.int32()),
        })

    parts = (_read(sf_dir, "documents", ["text"])
             .map_batches(partial, batch_format="pyarrow")
             .materialize())

    total = int(parts.aggregate(Sum("n", alias_name="nn"))["nn"])

    cand_rows = (parts.map_batches(
        lambda t: pa.table(
            {"term": pc.unique(t.filter(t["cand"])["term"].combine_chunks())}),
        batch_format="pyarrow").take_all())
    keep_arr = pa.array(sorted({r["term"] for r in cand_rows}), pa.string())

    def recount(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(t["term"], value_set=keep_arr))
        df = sub.to_pandas().groupby("term", as_index=False)["n"].sum()
        df["n"] = df["n"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if "term" not in t.column_names:   # no candidate anywhere (huge k):
            return empty                   # fully-filtered → column-less
        df = t.to_pandas().groupby("term", as_index=False)["n"].sum()
        df = df[df["n"] * k > total].sort_values(
            ["n", "term"], ascending=[False, True])
        df["n"] = df["n"].astype("int64")
        if not len(df):
            return empty
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)

    return (parts.map_batches(recount, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def name_edit_near_dup(sf_dir: str, max_dist: int = 3):
    """Dictionary-scale fuzzy entity dedup: Levenshtein pairs over the
    DISTINCT ``p_name`` vocabulary, blocked on the last name token.

    The two-level scale discipline for edit-distance joins: (a) dedupe to
    the vocabulary FIRST (per-batch ``unique`` partials, then in-bucket
    drop_duplicates — entity dictionaries are bounded even when the fact
    table is not), (b) block before comparing (last-token blocks; a pair
    can only match inside one block, mirrored exactly in the oracle's join
    predicate), (c) compare each block's pairs with the across-pairs
    vectorized DP (functions.textnorm.levenshtein_many), never a per-pair
    Python loop.  Output (name_a, name_b, dist) with name_a < name_b."""
    import zlib

    from ocr_ray.functions.textnorm import levenshtein_many

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def prep(t: pa.Table) -> pa.Table:
        # NULL names are excluded, matching the oracle (NULL comparisons
        # and levenshtein(NULL, x) yield NULL → no pair)
        names = [s for s in
                 pc.unique(t["p_name"].combine_chunks()).to_pylist()
                 if s is not None]
        toks = [s.split(" ")[-1] for s in names]
        return pa.table({
            "name": pa.array(names, pa.string()),
            "tok_l": pa.array(toks, pa.string()),
            "bucket": pa.array(
                [zlib.crc32(tk.encode()) % n_buckets for tk in toks],
                pa.int32()),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("name")
        outs = []
        for _, blk in g.groupby("tok_l"):
            names = np.asarray(sorted(blk["name"]), dtype=object)
            if len(names) < 2:
                continue
            ia, ib = np.triu_indices(len(names), 1)
            d = levenshtein_many(list(names[ia]), list(names[ib]))
            keep = d <= max_dist
            if keep.any():
                outs.append(pd.DataFrame({
                    "name_a": names[ia[keep]],
                    "name_b": names[ib[keep]],
                    "dist": d[keep].astype("int64"),
                }))
        if not outs:
            return pd.DataFrame({"name_a": pd.array([], "str"),
                                 "name_b": pd.array([], "str"),
                                 "dist": pd.array([], "int64")})
        return pd.concat(outs, ignore_index=True)

    return (_read(sf_dir, "part", ["p_name"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pandas"))


# -- Z-order clustered layout: multi-column pruning without an index server

_Z_EPOCH_DAYS = 9131          # 1995-01-01 in days-since-unix-epoch
_Z_PRICE_WIDTH = 3_200_000    # cents per price bin (16 bins cover $0-512k)
_Z_DATE_WIDTH = 152           # days per date bin (16 bins cover 1995-2001)


def _morton4(pbin: np.ndarray, dbin: np.ndarray) -> np.ndarray:
    """Interleave two 4-bit bin ids into an 8-bit Morton (Z-order) code."""
    z = np.zeros_like(pbin)
    for b in range(4):
        z |= (((pbin >> b) & 1) << (2 * b + 1)) | (((dbin >> b) & 1) << (2 * b))
    return z


def _zorder_bins(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
    us = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
    days = us // 86_400_000_000 - _Z_EPOCH_DAYS
    pbin = np.clip(cents // _Z_PRICE_WIDTH, 0, 15)
    dbin = np.clip(days // _Z_DATE_WIDTH, 0, 15)
    return pbin, dbin


def build_zorder_layout(ds, out_dir: str) -> None:
    """Cluster orders into a hive layout partitioned by the 8-bit Morton
    code of (price bin, date bin) — the Z-ORDER table layout: one write
    co-locates rows for BOTH filter dimensions, so later 2-D range scans
    read only the cells whose bin rectangle intersects the predicate
    (no index server, the directory layout IS the index; same stance as
    build_lsh_index / build_ivf_index in simsearch)."""

    def zmap(t: pa.Table) -> pa.Table:
        pbin, dbin = _zorder_bins(t)
        return t.append_column(
            "z", pa.array(_morton4(pbin, dbin), pa.int32()))

    ds.map_batches(zmap, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["z"])


def zorder_range_revenue(layout_dir: str,
                         price_lo_cents: int = 10_000_000,
                         price_hi_cents: int = 20_000_000,
                         date_lo: str = "1997-01-01",
                         date_hi: str = "1998-01-01"):
    """EXACT 2-D range aggregate over a :func:`build_zorder_layout` dir:
    enumerate the Morton cells whose (price, date) bin rectangle
    intersects the half-open query ranges, read ONLY those partitions
    (~(Δp·Δd)/256 of the bytes), then apply the exact residual filter
    inside each batch — pruning changes I/O, never the answer.
    Returns one row (n_orders, revenue_cents)."""
    import glob as _glob

    pb_lo, pb_hi = (int(np.clip(price_lo_cents // _Z_PRICE_WIDTH, 0, 15)),
                    int(np.clip((price_hi_cents - 1) // _Z_PRICE_WIDTH, 0, 15)))
    d_lo = (np.datetime64(date_lo).astype("datetime64[D]").astype(np.int64)
            - _Z_EPOCH_DAYS)
    d_hi = (np.datetime64(date_hi).astype("datetime64[D]").astype(np.int64)
            - 1 - _Z_EPOCH_DAYS)
    db_lo, db_hi = (int(np.clip(d_lo // _Z_DATE_WIDTH, 0, 15)),
                    int(np.clip(d_hi // _Z_DATE_WIDTH, 0, 15)))
    cells = sorted({int(_morton4(np.array([p]), np.array([d]))[0])
                    for p in range(pb_lo, pb_hi + 1)
                    for d in range(db_lo, db_hi + 1)})
    files = [f for c in cells for f in sorted(_glob.glob(
        os.path.join(layout_dir, f"z={c}", "*.parquet")))]

    lo_us = (np.datetime64(date_lo).astype("datetime64[us]")
             .astype(np.int64))
    hi_us = (np.datetime64(date_hi).astype("datetime64[us]")
             .astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        us = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(cents, price_lo_cents),
                    pc.less(cents, price_hi_cents)),
            pc.and_(pc.greater_equal(us, lo_us), pc.less(us, hi_us)))
        kept = cents.filter(keep)
        return pa.table({
            "n_orders": pa.array([len(kept)], pa.int64()),
            "revenue_cents": pa.array(
                [int(pc.sum(kept).as_py() or 0)], pa.int64()),
        })

    if not files:
        return pa.table({"n_orders": pa.array([0], pa.int64()),
                         "revenue_cents": pa.array([0], pa.int64())})
    from ray.data.aggregate import Sum

    agg = (rd.read_parquet(files, columns=["o_totalprice", "o_orderdate"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("revenue_cents", alias_name="revenue_cents")))
    return pa.table({
        "n_orders": pa.array([int(agg["n_orders"] or 0)], pa.int64()),
        "revenue_cents": pa.array([int(agg["revenue_cents"] or 0)],
                                  pa.int64()),
    })


def revenue_by_region(sf_dir: str):
    """TPC-H q5-shaped star join: revenue per region over the 4-hop chain
    lineitem→orders→customer→nation→region.

    Two join regimes composed deliberately: the DIMENSION chain
    (customer→nation→region) folds on the driver into one custkey→region
    dict broadcast via ``ray.put`` (dimension tables are the bounded side
    of a star schema; were customer to outgrow broadcast budget, the
    Dataset.join path of hash_join_revenue is the swap-in), while the
    FACT-FACT hop (lineitem⋈orders) is a hash-partitioned Dataset.join —
    never broadcast.  Aggregation is the usual integer partial rollup."""
    import pyarrow.parquet as pq

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    customer = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                             columns=["c_custkey", "c_nationkey"])
    rmap = dict(zip(region["r_regionkey"].to_pylist(),
                    region["r_name"].to_pylist()))
    nmap = {nk: rmap[rk] for nk, rk in zip(
        nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())}
    cmap = {ck: nmap[nk] for ck, nk in zip(
        customer["c_custkey"].to_pylist(),
        customer["c_nationkey"].to_pylist())}
    ref = ray.put(cmap)

    def enrich(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        # C-level mapping (pandas Series.map), never a per-row dict loop
        names = pd.Series(
            t["o_custkey"].to_numpy(zero_copy_only=False)).map(m)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "r_name": pa.array(names, pa.string(), from_pandas=True),
        })

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        enrich, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    return _grouped_sum(
        joined,
        lambda t: pa.table({
            "r_name": t["r_name"],
            "revenue_e4": _cents(
                pc.multiply(t["l_extendedprice"],
                            pc.subtract(1.0, t["l_discount"])), 10000),
        }),
        keys=["r_name"], sum_cols=["revenue_e4"], count_col="n_items",
    )


def winsorized_revenue_by_priority(sf_dir: str, q_lo: float = 0.05,
                                   q_hi: float = 0.95):
    """Robust (winsorized) revenue per priority: clip order totals at the
    exact per-group [p05, p95] order statistics, then sum — the
    outlier-insensitive aggregate a metrics pipeline uses when a few
    whale orders would otherwise dominate a mean.

    One pass: per-batch (priority, cents) VALUE-COUNT partials (the
    domain is the cents grid, bounded regardless of corpus rows — the
    same compression stance as the quantile family; swap for fixed
    histogram buckets if the domain were unbounded); the single bounded
    final task walks each group's cumulative histogram for the
    quantile_disc bounds (sorted[ceil(q·n)], 1-based — pinned to DuckDB)
    and computes the clipped sum from the SAME histogram, so no second
    data pass.  Integer outputs only."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"o_orderpriority": t["o_orderpriority"],
                       "v": _cents(t["o_totalprice"])}).to_pandas()
        g = (df.groupby(["o_orderpriority", "v"], as_index=False)
               .size().rename(columns={"size": "c"}))
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
               .groupby(["o_orderpriority", "v"], as_index=False)["c"].sum())
        rows = []
        for prio, g in df.groupby("o_orderpriority", sort=True):
            g = g.sort_values("v")
            vals = g["v"].to_numpy()
            cnts = g["c"].to_numpy()
            cum = np.cumsum(cnts)
            n = int(cum[-1])
            lo = int(vals[int(np.searchsorted(cum, math.ceil(q_lo * n)))])
            hi = int(vals[int(np.searchsorted(cum, math.ceil(q_hi * n)))])
            wsum = int((np.clip(vals, lo, hi) * cnts).sum())
            rows.append((prio, n, lo, hi, wsum))
        return pa.table({
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "n_orders": pa.array([r[1] for r in rows], pa.int64()),
            "lo_cents": pa.array([r[2] for r in rows], pa.int64()),
            "hi_cents": pa.array([r[3] for r in rows], pa.int64()),
            "winsorized_sum_cents": pa.array([r[4] for r in rows],
                                             pa.int64()),
        })

    return (_read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def price_size_slope_by_brand(sf_dir: str):
    """Per-group OLS regression (retail price in whole units vs part
    size) from exact integer moments — the grouped modeling primitive
    alongside :func:`price_quantity_corr`: each batch ships constant-width
    int64 partials (n, Σx, Σy, Σxx, Σxy); the ~brand-count finalize does
    slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²) and intercept = (Σy−slope·Σx)/n in
    float64 with the SAME expression shape as the SQL oracle, rounded at
    6 dp."""

    def measures(t: pa.Table) -> pa.Table:
        x = pc.cast(t["p_size"], pa.int64())
        y = _cents(t["p_retailprice"], 1)
        return pa.table({
            "p_brand": t["p_brand"],
            "sx": x,
            "sy": y,
            "sxx": pc.multiply(x, x),
            "sxy": pc.multiply(x, y),
        })

    moments = _grouped_sum(
        _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"]),
        measures, keys=["p_brand"],
        sum_cols=["sx", "sy", "sxx", "sxy"], count_col="n_parts",
    )

    def finalize(df: pd.DataFrame) -> pa.Table:
        brands, ns, slopes, intercepts = [], [], [], []
        for r in df.itertuples(index=False):
            n, sx, sy = int(r.n_parts), int(r.sx), int(r.sy)
            a = n * int(r.sxy) - sx * sy
            b = n * int(r.sxx) - sx * sx
            if b == 0:
                # zero size variance (singleton/uniform brand): the
                # oracle's DOUBLE division by zero yields NULL
                slope, intercept = None, None
            else:
                slope = float(np.round(float(a) / float(b), 6))
                intercept = float(np.round(
                    (float(sy) - (float(a) / float(b)) * float(sx))
                    / float(n), 6))
            brands.append(r.p_brand)
            ns.append(n)
            slopes.append(slope)
            intercepts.append(intercept)
        return pa.table({
            "p_brand": pa.array(brands, pa.string()),
            "n_parts": pa.array(ns, pa.int64()),
            "slope": pa.array(slopes, pa.float64()),
            "intercept": pa.array(intercepts, pa.float64()),
        })

    return moments.repartition(1).map_batches(finalize,
                                              batch_format="pandas")


def build_event_count_snapshot(sf_dir: str, out_dir: str,
                               split_ts: str = "2024-01-22") -> str:
    """Materialize the BASE aggregate (events strictly before split_ts →
    per-type n_events / sum_value_cents) to one tiny parquet — the
    'materialized view' side of incremental maintenance."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    from ray.data.aggregate import Sum

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "sum_value_cents": _cents(t["value"]),
        })

    base = _grouped_sum(
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
            filter=(pads.field("ts") < pads.scalar(pd.Timestamp(split_ts))),
        ),
        measures, keys=["event_type"], sum_cols=["sum_value_cents"],
        count_col="n_events",
    )
    os.makedirs(out_dir, exist_ok=True)
    try:
        tab = _concat_nonempty(base)
    except (pa.ArrowInvalid, ValueError):   # nothing precedes split_ts
        tab = pa.table({"event_type": pa.array([], pa.string()),
                        "sum_value_cents": pa.array([], pa.int64()),
                        "n_events": pa.array([], pa.int64())})
    pq.write_table(tab, os.path.join(out_dir, "base_agg.parquet"))
    return out_dir


def incremental_event_counts(snapshot_dir: str, sf_dir: str,
                             split_ts: str = "2024-01-22"):
    """INCREMENTAL VIEW MAINTENANCE: refresh a per-type event aggregate by
    merging the cached base snapshot with a scan of ONLY the delta
    (ts >= split_ts, pushed into the parquet read) — the base corpus is
    never rescanned, which is the whole point at 100 TB where yesterday's
    aggregate covers 99.9% of the rows.  Counts and integer-cent sums are
    commutative merges, so snapshot + delta equals the full recompute the
    oracle runs."""
    import pyarrow.dataset as pads

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "event_type": t["event_type"],
            "sum_value_cents": _cents(t["value"]),
        }).to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            sum_value_cents=("sum_value_cents", "sum"),
            n_events=("sum_value_cents", "size"))
        g["sum_value_cents"] = g["sum_value_cents"].astype("int64")
        g["n_events"] = g["n_events"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    # both branches are plain map lineages with the ONE groupby after the
    # union (fk_integrity_audit's proven shape; never a groupby inside a
    # union branch)
    # repartition drops the SCHEMA-LESS empty blocks the filtered read
    # emits (map_batches never sees them; they crash the union's concat —
    # see CLAUDE.md); the partials are tiny so the extra exchange is noise
    delta = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
        filter=(pads.field("ts") >= pads.scalar(pd.Timestamp(split_ts))),
    ).map_batches(partial, batch_format="pyarrow").repartition(4)
    base = rd.read_parquet(os.path.join(snapshot_dir, "base_agg.parquet"))
    return (base.union(delta)          # independent lineages — safe union
            .groupby("event_type")
            .aggregate(Sum("sum_value_cents", alias_name="sum_value_cents"),
                       Sum("n_events", alias_name="n_events")))


def build_evolved_layout(sf_dir: str, out_dir: str) -> str:
    """Materialize a two-generation lakehouse layout from orders: ``v1/``
    files carry the ORIGINAL schema (o_orderkey, o_totalprice; even keys),
    ``v2/`` files the EVOLVED schema with the later-added o_orderpriority
    column (odd keys) — the standard additive-column schema evolution a
    long-lived table accumulates."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    src = os.path.join(sf_dir, "orders.parquet")
    os.makedirs(os.path.join(out_dir, "v1"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "v2"), exist_ok=True)
    t = pq.read_table(src, columns=["o_orderkey", "o_totalprice",
                                    "o_orderpriority"])
    even = pc.equal(pc.bit_wise_and(t["o_orderkey"], 1), 0)
    pq.write_table(t.filter(even).select(["o_orderkey", "o_totalprice"]),
                   os.path.join(out_dir, "v1", "data.parquet"))
    pq.write_table(t.filter(pc.invert(even)),
                   os.path.join(out_dir, "v2", "data.parquet"))
    return out_dir


def schema_evolution_read(layout_dir: str):
    """Read a table across an ADDITIVE SCHEMA CHANGE: v1 files lack the
    o_orderpriority column, so each v1 batch is aligned to the evolved
    schema by appending the missing column ('legacy' fill — the explicit
    default a migration declares, never a silent null drop), then both
    generations stream through ONE union (independent read lineages) into
    the usual integer rollup per priority.  The per-file alignment is a
    constant-time metadata operation — no rewrite of the old files, which
    is the point of additive evolution at 100 TB."""
    from ray.data.aggregate import Sum

    def align_v1(t: pa.Table) -> pa.Table:
        return t.append_column(
            "o_orderpriority",
            pa.nulls(t.num_rows, pa.string()).fill_null("legacy"))

    def measures(t: pa.Table) -> pa.Table:
        df = pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "sum_cents": _cents(t["o_totalprice"]),
        }).to_pandas()
        g = df.groupby("o_orderpriority", as_index=False).agg(
            sum_cents=("sum_cents", "sum"), n_orders=("sum_cents", "size"))
        g["sum_cents"] = g["sum_cents"].astype("int64")
        g["n_orders"] = g["n_orders"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    v1 = (rd.read_parquet(os.path.join(layout_dir, "v1"))
          .map_batches(align_v1, batch_format="pyarrow")
          .map_batches(measures, batch_format="pyarrow"))
    v2 = (rd.read_parquet(os.path.join(layout_dir, "v2"))
          .map_batches(measures, batch_format="pyarrow"))
    return (v1.union(v2)
            .groupby("o_orderpriority")
            .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                       Sum("n_orders", alias_name="n_orders")))


def range_partition_plan(sf_dir: str, n_buckets: int = 16):
    """RANGE-PARTITIONER PLANNING — the step inside every distributed
    sort/range-shuffle: compute equi-depth boundaries (the 15 interior
    quantile_disc order statistics) and the resulting per-bucket row
    counts, proving the plan balances.  One pass of value-count partials
    (the quantile family's compression stance); the single bounded final
    task derives boundaries AND bucket counts from the same cumulative
    histogram — a row with cents == boundary goes to the LOWER bucket
    (count of boundaries strictly below, mirrored in the oracle's
    ``cents > b`` correlated count).  Output (bucket, n_orders)."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"v": _cents(t["o_totalprice"])}).to_pandas()
        g = df.groupby("v", as_index=False).size().rename(
            columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("v", as_index=False)["c"].sum()
        df = df.sort_values("v")
        vals = df["v"].to_numpy()
        cnts = df["c"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        bounds = np.array(
            [vals[int(np.searchsorted(cum, math.ceil(i / n_buckets * n)))]
             for i in range(1, n_buckets)], dtype=np.int64)
        bucket = np.searchsorted(bounds, vals, side="left")
        g = pd.DataFrame({"bucket": bucket, "c": cnts}).groupby(
            "bucket", as_index=False)["c"].sum()
        return pa.table({
            "bucket": pa.array(g["bucket"].astype("int64"), pa.int64()),
            "n_orders": pa.array(g["c"].astype("int64"), pa.int64()),
        })

    return (_read(sf_dir, "orders", ["o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def _hot_salted_buckets(keys, salts, hot, n_buckets: int,
                        n_salts: int) -> np.ndarray:
    """crc32(key) % n_buckets exchange buckets, except keys in ``hot``
    sub-bucket by ``salts[i] % n_salts`` — the Zipf-heavy-hitter salt
    (VERDICT r4 nit 2): on a real corpus one context token ("the") owns
    several percent of all instance rows, so one of 64 buckets runs hot;
    salting spreads its rows across n_salts buckets (~n_salts× flatter)
    while every non-hot key keeps the exact legacy bucket."""
    import zlib

    out = np.empty(len(keys), np.int32)
    for i, k in enumerate(keys):
        if k in hot:
            out[i] = zlib.crc32(
                f"{k}\x00{int(salts[i]) % n_salts}".encode()) % n_buckets
        else:
            out[i] = zlib.crc32(k.encode()) % n_buckets
    return out


def bigram_lm_scores(sf_dir: str):
    """Corpus-trained BIGRAM LANGUAGE-MODEL scoring (the deterministic
    analogue of the KenLM-perplexity quality filter every LLM data
    pipeline runs): per document, ``score = Σ ln P(w_i | w_{i-1})`` with
    ``P(b|a) = c(a,b) / c(a,·)`` counted over the whole corpus.

    Float discipline: every term is rounded to INTEGER micro-nats
    (half-away, the _cents convention) BEFORE any summation, so the
    distributed integer sums are order-independent and the oracle's SUM
    needs no float-order assumptions — the only float op per term is one
    division + one ln in the oracle's exact expression shape.

    Topology: model training and scoring share ONE exchange — both the
    per-(doc, bigram) instance rows and the per-batch count partials ride
    a crc32(first-token) bucket (ALL pairs sharing a context token
    co-locate, so c(a,b) and c(a,·) finalize in the same group); the
    bucket kernel joins instances to the finalized counts vectorized and
    emits per-doc integer partials; one small groupby folds docs across
    buckets.  Instance rows ≈ distinct bigrams per doc — inherent to LM
    scoring, and the text itself never crosses the exchange.

    Zipf flattening (VERDICT r4 nit 2): context tokens owning >= 1/
    term_hot_frac of the bigram stream are detected EXACTLY from the
    materialized count partials (a crc32(a) bucket holds every partial
    with context a, so per-bucket sums are global — no extra text pass),
    their exact global c(a,·) rides a tiny broadcast dict, and their
    instance + count rows sub-bucket by crc32(second-token) %
    term_hot_salts — c(a,b) still finalizes in one bucket (the salt is a
    pure function of b), while the hot token's row mass spreads ~salts×.
    Scores are bit-identical with salting on or off (same cab/ca ints).

    Tokens: the RE2-parity whitespace class (token_entropy's convention).
    Docs with no bigram emit nothing."""
    import collections
    import re
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    n_salts = DEFAULT_CONFIG.term_hot_salts
    hot_frac = DEFAULT_CONFIG.term_hot_frac
    _ws = re.compile(r"[ \t\n\f\r]+")

    def _doc_bigrams(txt: str):
        toks = [x for x in _ws.split((txt or "").lower()) if x]
        return zip(toks, toks[1:])

    def count_partials(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            c.update(_doc_bigrams(txt))
        pairs = list(c.keys())
        return pa.table({
            "doc_id": pa.array([-1] * len(pairs), pa.int64()),
            "ta": pa.array([p[0] for p in pairs], pa.string()),
            "tb": pa.array([p[1] for p in pairs], pa.string()),
            "m": pa.array([c[p] for p in pairs], pa.int64()),
            "side": pa.nulls(len(pairs), pa.int8()).fill_null(1),
            "bucket": pa.array(
                [zlib.crc32(p[0].encode()) % n_buckets for p in pairs],
                pa.int32()),
        })

    cnt_parts = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        count_partials, batch_format="pyarrow").materialize()

    # hot-context detection in two cheap MAP passes over the materialized
    # partials (no sort shuffle): pass A finds candidates by pigeonhole —
    # a token with global share >= 1/hot_frac has that share in at least
    # one block, so per-block-hot tokens are a superset of global-hot —
    # and pass B (skipped when no candidates) sums the exact global
    # c(a,·) for just the candidate set
    def cand_partial(t: pa.Table) -> pa.Table:
        df = (pa.table({"ta": t["ta"], "m": t["m"]}).to_pandas()
              .groupby("ta", as_index=False)["m"].sum())
        tot = int(df["m"].sum())
        cand = df[df["m"] * hot_frac >= tot]
        return pa.table({
            "ta": pa.array(list(cand["ta"]) + [""], pa.string()),
            "tot": pa.array([0] * len(cand) + [tot], pa.int64()),
        })

    crows = cnt_parts.map_batches(
        cand_partial, batch_format="pyarrow").take_all()
    total_bigrams = sum(r["tot"] for r in crows)
    cand_set = {r["ta"] for r in crows if r["ta"]}
    hot: dict = {}
    if cand_set:
        cset_ref = ray.put(pa.array(sorted(cand_set), pa.string()))

        def ca_partial(t: pa.Table) -> pa.Table:
            sub = t.filter(pc.is_in(t["ta"], value_set=ray.get(cset_ref)))
            df = (pa.table({"ta": sub["ta"], "m": sub["m"]}).to_pandas()
                  .groupby("ta", as_index=False)["m"].sum())
            return pa.table({"ta": pa.array(df["ta"], pa.string()),
                             "ca": pa.array(df["m"].astype("int64"),
                                            pa.int64())})

        ca_sum: dict = {}
        for r in cnt_parts.map_batches(
                ca_partial, batch_format="pyarrow").take_all():
            ca_sum[r["ta"]] = ca_sum.get(r["ta"], 0) + int(r["ca"])
        hot = {a: c for a, c in ca_sum.items()
               if c * hot_frac >= total_bigrams}
    hot_ref = ray.put(hot)

    def _buckets(tas, tbs, h) -> pa.Array:
        if not h:
            return pa.array(
                [zlib.crc32(a.encode()) % n_buckets for a in tas],
                pa.int32())
        salts = [zlib.crc32(b.encode()) for b in tbs]
        return pa.array(
            _hot_salted_buckets(tas, salts, h, n_buckets, n_salts),
            pa.int32())

    def instances(t: pa.Table) -> pa.Table:
        ids, tas, tbs, ms = [], [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            c = collections.Counter(_doc_bigrams(txt))
            for (a, b), m in c.items():
                ids.append(did)
                tas.append(a)
                tbs.append(b)
                ms.append(m)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "ta": pa.array(tas, pa.string()),
            "tb": pa.array(tbs, pa.string()),
            "m": pa.array(ms, pa.int64()),
            "side": pa.nulls(len(ids), pa.int8()).fill_null(0),
            "bucket": _buckets(tas, tbs, ray.get(hot_ref)),
        })

    def rebucket(t: pa.Table) -> pa.Table:
        h = ray.get(hot_ref)
        if not h:
            return t
        return t.set_column(
            t.schema.get_field_index("bucket"), "bucket",
            _buckets(t["ta"].to_pylist(), t["tb"].to_pylist(), h))

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = (g[g["side"] == 1].groupby(["ta", "tb"], as_index=False)
               ["m"].sum().rename(columns={"m": "cab"}))
        ca = (cnt.groupby("ta", as_index=False)["cab"].sum()
              .rename(columns={"cab": "ca"}))
        inst = (g[g["side"] == 0]
                .merge(cnt, on=["ta", "tb"]).merge(ca, on="ta"))
        h = ray.get(hot_ref)
        if h and len(inst):
            # a salt bucket sees only 1/n_salts of a hot token's pairs:
            # its in-bucket c(a,·) is partial — substitute the exact
            # global count from the broadcast dict
            mapped = inst["ta"].map(h)
            inst["ca"] = mapped.fillna(inst["ca"]).astype("int64")
        if not len(inst):
            return pd.DataFrame({"doc_id": pd.array([], "int64"),
                                 "n_bigrams": pd.array([], "int64"),
                                 "score_unats": pd.array([], "int64"),
                                 "dbucket": pd.array([], "int32")})
        x = 1e6 * np.log(inst["cab"].to_numpy(np.float64)
                         / inst["ca"].to_numpy(np.float64))
        term = np.copysign(np.floor(np.abs(x) + 0.5), x).astype("int64")
        inst = inst.assign(score=term * inst["m"].to_numpy())
        out = inst.groupby("doc_id", as_index=False).agg(
            n_bigrams=("m", "sum"), score_unats=("score", "sum"))
        out["n_bigrams"] = out["n_bigrams"].astype("int64")
        out["score_unats"] = out["score_unats"].astype("int64")
        # ride a coarse doc bucket into the final fold — a direct
        # groupby(doc_id).aggregate is the documented high-cardinality
        # pathology (measured 20s wall / 174s remote at sf0.1)
        out["dbucket"] = np.bitwise_and(
            out["doc_id"].to_numpy(np.int64), 63).astype("int32")
        return out

    def fold_docs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"), score_unats=("score_unats",
                                                         "sum"))
        out["n_bigrams"] = out["n_bigrams"].astype("int64")
        out["score_unats"] = out["score_unats"].astype("int64")
        return out

    inst_ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        instances, batch_format="pyarrow")
    cnt_ds = cnt_parts.map_batches(rebucket, batch_format="pyarrow")
    return (inst_ds.union(cnt_ds)
            .groupby("bucket")
            .map_groups(score_bucket, batch_format="pandas")
            .groupby("dbucket")
            .map_groups(fold_docs, batch_format="pandas"))


def _embedding_matrix(t: pa.Table) -> np.ndarray:
    """Zero-copy list<float> flat-buffer → (n, dim) float64 matrix (the
    shared reshape under the embedding-family kernels)."""
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(1, t.num_rows)
    return flat.reshape(t.num_rows, dim)


def embedding_quantize_stats(sf_dir: str):
    """SCALAR QUANTIZATION of the embedding column (the int8 compression
    step an ANN index applies before storage): per dimension, the global
    [lo, hi] range and the sum of the 0..255 codes
    ``round((v - lo)/(hi - lo)·255)`` — a value-level checksum that pins
    every code without shipping the quantized matrix anywhere.

    Two passes, both embarrassingly parallel over zero-copy flat-buffer
    reshapes (embedding_norms's pattern): (1) per-batch per-dim min/max
    partials fold to the global range on the driver (dim-sized, tiny);
    (2) the broadcast range quantizes each batch and per-dim code sums
    fold through one Sum aggregate.  Quantization is inherently
    two-pass — the range must be global before any code is defined.
    A constant dimension (hi == lo) yields NULL sum_codes on both sides
    (double 0/0 → NULL in the oracle).  Dims are 1-based to match
    generate_subscripts."""
    from ray.data.aggregate import Sum

    def minmax_partial(t: pa.Table) -> pa.Table:
        m = _embedding_matrix(t)
        return pa.table({
            "dim": pa.array(np.arange(1, m.shape[1] + 1), pa.int64()),
            "lo": pa.array(m.min(axis=0), pa.float64()),
            "hi": pa.array(m.max(axis=0), pa.float64()),
            "n_vecs": pa.array([m.shape[0]] * m.shape[1], pa.int64()),
        })

    ds = _read(sf_dir, "embeddings", ["embedding"])
    parts = _concat_nonempty(
        ds.map_batches(minmax_partial, batch_format="pyarrow"))
    df = parts.to_pandas().groupby("dim").agg(
        lo=("lo", "min"), hi=("hi", "max"), n_vecs=("n_vecs", "sum"))
    lo = df["lo"].to_numpy()
    hi = df["hi"].to_numpy()
    rng_ref = ray.put((lo, hi))

    def code_partial(t: pa.Table) -> pa.Table:
        lo_b, hi_b = ray.get(rng_ref)
        m = _embedding_matrix(t)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = (m - lo_b[None, :]) / (hi_b - lo_b)[None, :] * 255.0
        codes = np.copysign(np.floor(np.abs(x) + 0.5), x)
        sums = codes.sum(axis=0)         # NaN propagates for hi == lo
        return pa.table({
            "dim": pa.array(np.arange(1, m.shape[1] + 1), pa.int64()),
            "sum_codes": pa.array(
                [None if np.isnan(s) else int(s) for s in sums],
                pa.int64()),
        })

    agg = (ds.map_batches(code_partial, batch_format="pyarrow")
           .groupby("dim")
           .aggregate(Sum("sum_codes", alias_name="sum_codes")))
    sums = _concat_nonempty(agg).to_pandas().set_index("dim")["sum_codes"]

    dims = df.index.to_numpy()
    e6 = lambda a: np.copysign(np.floor(np.abs(a * 1e6) + 0.5), a)  # noqa: E731
    return pa.table({
        "dim": pa.array(dims, pa.int64()),
        "lo_e6": pa.array(e6(lo).astype("int64"), pa.int64()),
        "hi_e6": pa.array(e6(hi).astype("int64"), pa.int64()),
        "sum_codes": pa.array(
            [None if pd.isna(sums.get(d)) else int(sums.get(d))
             for d in dims], pa.int64()),
        "n_vecs": pa.array(df["n_vecs"].to_numpy(), pa.int64()),
    })


def pack_sequences(sf_dir: str, cap_tokens: int = 256, n_shards: int = 64):
    """Materialize the PACKED TRAINING SEQUENCES — the artifact a trainer
    actually consumes — by running :func:`pack_context_windows`'s greedy
    recurrence with the text carried through: one output row per bin
    (shard, bin_idx, n_docs, sum_tokens, seq_text) where seq_text is the
    bin's documents joined by newline in doc_id order.

    Unlike the assignment-only op, the text necessarily crosses the
    exchange here (a sequence is made of its documents' bytes); the
    shuffle is still one 64-key coarse exchange and each group's packing
    is the same O(n_bins) searchsorted kernel plus one vectorized
    string-join per bin."""
    from ocr_ray.functions import textstats

    def prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "shard": pa.array(_md5_mod(ids, n_shards), pa.int64()),
            "n_tokens": textstats.token_count_columns(
                t["text"])["n_ws_tokens"],
            "text": pc.coalesce(t["text"], pa.scalar("")),
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        toks = g["n_tokens"].to_numpy()
        s = np.cumsum(toks)
        bins = np.empty(len(g), np.int64)
        a, b_idx, base = 0, 0, 0
        while a < len(g):
            j = int(np.searchsorted(s, base + cap_tokens, side="right"))
            j = max(j, a + 1)
            bins[a:j] = b_idx
            base = int(s[j - 1])
            a, b_idx = j, b_idx + 1
        g["bin_idx"] = bins
        out = g.groupby("bin_idx", as_index=False).agg(
            shard=("shard", "first"),
            n_docs=("doc_id", "size"),
            sum_tokens=("n_tokens", "sum"),
            seq_text=("text", "\n".join))
        out["n_docs"] = out["n_docs"].astype("int64")
        out["sum_tokens"] = out["sum_tokens"].astype("int64")
        return out[["shard", "bin_idx", "n_docs", "sum_tokens", "seq_text"]]

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack, batch_format="pandas"))


def monthly_revenue_mom(sf_dir: str):
    """Month-over-month revenue delta — a WINDOW OVER AN AGGREGATE
    (LAG on the grouped series, not on raw rows): reuse orders_by_month's
    distributed rollup, then one bounded final task (the series is
    months-long regardless of corpus size) sorts and differences it.
    The first month has no predecessor and is dropped so every output
    column stays non-nullable (the repo's no-nullable-ints parity rule).
    Output (month, revenue_cents, prev_revenue_cents, mom_delta_cents)."""

    def mom(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("month").reset_index(drop=True)
        df["prev_revenue_cents"] = df["revenue_cents"].shift(1)
        df = df.iloc[1:]
        out = pa.table({
            "month": pa.array(df["month"], pa.timestamp("us")),
            "revenue_cents": pa.array(
                df["revenue_cents"].astype("int64"), pa.int64()),
            "prev_revenue_cents": pa.array(
                df["prev_revenue_cents"].astype("int64"), pa.int64()),
            "mom_delta_cents": pa.array(
                (df["revenue_cents"] - df["prev_revenue_cents"])
                .astype("int64"), pa.int64()),
        })
        return out

    return (orders_by_month(sf_dir)
            .repartition(1)
            .map_batches(mom, batch_format="pyarrow", batch_size=None))


def bm25_search(sf_dir: str, query: str = "table hash join", k: int = 20):
    """BM25 ranking (k1=1.2, b=0.75) of documents for a multi-term query
    — the standard lexical-retrieval scorer beside tfidf_top_docs'
    corpus-wide variant.

    Two bounded passes: (1) per-batch global-stat partials (doc count,
    token count, per-query-term document frequency — a doc lives in one
    batch, so batch dfs sum exactly) fold to driver scalars; (2) the
    broadcast stats score each batch vectorized, each TERM contribution
    rounded to integer micro-units BEFORE the per-doc sum (≤ |query|
    ints/doc — no float-order hazard), then the per-batch-top-k +
    repartition(1) bounded reduce returns exactly k rows.  Float
    expression shape matches the oracle op-for-op.  Ordering: score
    desc, doc_id asc."""
    import collections
    import re

    _ws = re.compile(r"[ \t\n\f\r]+")
    terms = query.lower().split()
    K1, B = 1.2, 0.75

    def _toks(txt: str) -> list:
        return [x for x in _ws.split((txt or "").lower()) if x]

    def stat_partial(t: pa.Table) -> pa.Table:
        n_docs, sum_dl = t.num_rows, 0
        dfs = [0] * len(terms)
        for txt in t["text"].to_pylist():
            toks = _toks(txt)
            sum_dl += len(toks)
            ts = set(toks)
            for i, q in enumerate(terms):
                dfs[i] += q in ts
        cols = {"n_docs": pa.array([n_docs], pa.int64()),
                "sum_dl": pa.array([sum_dl], pa.int64())}
        for i in range(len(terms)):
            cols[f"df_{i}"] = pa.array([dfs[i]], pa.int64())
        return pa.table(cols)

    def stat_add(t: pa.Table) -> pa.Table:
        # pre-fold a block of stat partials to one row (exact int sums)
        if t.num_rows <= 1:
            return t
        return pa.table({c: pa.array([int(pc.sum(t[c]).as_py() or 0)],
                                     pa.int64())
                         for c in t.column_names})

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    srows = _prefold(ds.map_batches(stat_partial, batch_format="pyarrow"),
                     stat_add).take_all()
    n_docs = sum(r["n_docs"] for r in srows)
    sum_dl = sum(r["sum_dl"] for r in srows)
    dfs = [sum(r[f"df_{i}"] for r in srows) for i in range(len(terms))]
    idf = [float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
           for df in dfs]
    avgdl = float(sum_dl) / n_docs

    def score_partial(t: pa.Table) -> pa.Table:
        ids, scores = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _toks(txt)
            c = collections.Counter(toks)
            s, matched = 0, False
            for i, q in enumerate(terms):
                tf = c.get(q, 0)
                if not tf:
                    continue
                matched = True
                x = 1e6 * (idf[i] * (float(tf) * (K1 + 1.0))
                           / (float(tf) + K1 * (1.0 - B
                                                + B * float(len(toks))
                                                / avgdl)))
                s += int(np.copysign(np.floor(abs(x) + 0.5), x))
            # emit every doc with a matched term, even a 0-rounded score
            # — the oracle's contrib CTE does (parity for extreme params)
            if matched:
                ids.append(did)
                scores.append(s)
        df = pd.DataFrame({"doc_id": pd.array(ids, "int64"),
                           "score_e6": pd.array(scores, "int64")})
        df = df.sort_values(["score_e6", "doc_id"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("score_e6", "descending"),
                                            ("doc_id", "ascending")])[:k]
        return t.take(idx)

    return (ds.map_batches(score_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def _gram_matrix_e6(t: pa.Table) -> np.ndarray:
    m = _embedding_matrix(t) * 1e6
    return np.copysign(np.floor(np.abs(m) + 0.5), m).astype(np.int64)


def _gram_partial(t: pa.Table) -> pa.Table:
    m = _gram_matrix_e6(t)
    g = m.T @ m
    return pa.table({
        "gram": pa.array([g.tobytes()], pa.binary()),
        "dim": pa.array([g.shape[0]], pa.int64()),
        "n_vecs": pa.array([m.shape[0]], pa.int64()),
    })


def _prefold(ds, fold, n_buckets: int | None = None):
    """Two-level bounded reduce for driver-bound partial rows: coalesce
    the one-short-row-per-batch partials into <= n_buckets blocks
    (repartition without shuffle — a split/merge, not an all-to-all) and
    run `fold` once per block (batch_size=None), so the driver receives
    at most n_buckets rows regardless of input batch count (VERDICT r4
    nit 1: at 100 TB one row per batch is O(10^6) rows held at once)."""
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.driver_fold_buckets
    return ds.repartition(n_buckets).map_batches(
        fold, batch_format="pyarrow", batch_size=None)


def _gram_add(t: pa.Table) -> pa.Table:
    """Elementwise-add a block of Gram blobs into one blob (exact int64)."""
    if t.num_rows <= 1:
        return t
    dim = int(t["dim"][0].as_py())
    tot = np.zeros(dim * dim, np.int64)
    for b in t["gram"].to_pylist():
        tot += np.frombuffer(b, np.int64)
    return pa.table({
        "gram": pa.array([tot.tobytes()], pa.binary()),
        "dim": pa.array([dim], pa.int64()),
        "n_vecs": pa.array([int(pc.sum(t["n_vecs"]).as_py())], pa.int64()),
    })


def _gram_folded_ds(sf_dir: str, n_buckets: int | None = None):
    """Dataset of <= n_buckets pre-folded Gram partial rows."""
    return _prefold(
        _read(sf_dir, "embeddings", ["embedding"]).map_batches(
            _gram_partial, batch_format="pyarrow"),
        _gram_add, n_buckets)


def _gram_fold(sf_dir: str) -> tuple:
    """Fold Gram blobs to one (dim, dim) int64 matrix + vector count on
    the driver.  Blobs arrive pre-folded per coarse bucket (worker-side
    elementwise add), so the driver holds <= driver_fold_buckets blobs,
    never one per batch."""
    rows = _gram_folded_ds(sf_dir).take_all()
    dim = int(rows[0]["dim"])
    total = np.zeros((dim, dim), np.int64)
    n_vecs = 0
    for r in rows:
        total += np.frombuffer(r["gram"], np.int64).reshape(dim, dim)
        n_vecs += int(r["n_vecs"])
    return total, n_vecs


def embedding_gram_matrix(sf_dir: str):
    """EXACT distributed Gram/covariance accumulation — the building
    block of big-data PCA/whitening: G = Xᵀ X over the e6-scaled INTEGER
    embedding matrix (components rounded to 1e-6 first, so the
    distributed sums are exact int64 arithmetic with no float-order
    hazard; |v| ≤ 1 keeps Σ v_i·v_j ≤ 1e12·n far inside int64).

    Per batch: one int64 matmul (mᵀ m, BLAS-shaped) emits the WHOLE
    dim×dim partial as a single fixed-width binary blob (dim²·8 bytes —
    constant per batch regardless of rows); the driver folds blobs by
    elementwise add, holding exactly one matrix.  Output: the upper
    triangle as rows (d1, d2, gram_e12, n_vecs), 1-based dims."""

    total, n_vecs = _gram_fold(sf_dir)
    dim = total.shape[0]
    iu = np.triu_indices(dim)
    return pa.table({
        "d1": pa.array(iu[0] + 1, pa.int64()),
        "d2": pa.array(iu[1] + 1, pa.int64()),
        "gram_e12": pa.array(total[iu], pa.int64()),
        "n_vecs": pa.array(np.full(len(iu[0]), n_vecs), pa.int64()),
    })


def embedding_top_component(sf_dir: str, n_iter: int = 64):
    """Distributed PCA TOP COMPONENT: power iteration on the exact
    integer Gram matrix, stabilized so every step is bit-deterministic
    on both engines:

      * the Gram fold is the :func:`embedding_gram_matrix` topology
        (constant bytes per batch, driver holds one matrix);
      * each iteration runs in EXACT integer arithmetic — Python bigints
        here, HUGEINT in the oracle — because the matvec products
        (|G| ≤ n·1e12 times |v| ≤ 1e6) overflow int64;
      * normalization is by the L∞ norm (max |w|), which is
        ORDER-INDEPENDENT — an L2 norm would need a float sum whose
        order SQL cannot pin; the iterate rescales to ≤ 1e6 integers
        via one double division + half-away round per component, the
        only float ops in the loop (identical inputs ⇒ identical
        doubles on both sides);
      * start vector all-1e6; the oracle unrolls the same n_iter steps
        as chained MATERIALIZED CTEs (the unrolled-k-means precedent).

    Output (dim, component_e6) — the eigenvector direction scaled to
    max-abs 1e6."""
    total, _ = _gram_fold(sf_dir)
    dim = total.shape[0]
    g = [[int(x) for x in row] for row in total]     # exact bigints
    import math

    v = [10**6] * dim
    for _ in range(n_iter):
        w = [sum(g[d][j] * v[j] for j in range(dim)) for d in range(dim)]
        mx = max(abs(x) for x in w)
        # pure-Python half-away round: the matvec bigints exceed int64,
        # so no numpy ufunc may touch them
        v = [(1 if x >= 0 else -1)
             * int(math.floor(abs(float(x) / float(mx) * 1e6) + 0.5))
             for x in w]
    return pa.table({
        "dim": pa.array(np.arange(1, dim + 1), pa.int64()),
        "component_e6": pa.array(v, pa.int64()),
    })


def embedding_pca_projection(sf_dir: str):
    """PCA PROJECTION — the third leg of the distributed-PCA story
    (Gram fold → power-iteration component → per-vector projection):
    every embedding's exact integer dot product with the e6-scaled top
    component, (vec_id, proj_e12).  The component is computed once on
    the driver (bounded) and broadcast; each batch is one int64
    matvec over the zero-copy flat-buffer reshape (magnitudes
    1e6·1e6·dim stay far inside int64)."""
    comp = np.asarray(
        embedding_top_component(sf_dir)["component_e6"].to_pylist(),
        dtype=np.int64)
    ref = ray.put(comp)

    def project(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _gram_matrix_e6(t)
        return pa.table({
            "vec_id": t["vec_id"],
            "proj_e12": pa.array(m @ c, pa.int64()),
        })

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow")


def langid_confusion(sf_dir: str):
    """Classifier-evaluation CONFUSION MATRIX: the langid heuristic's
    predictions cross-tabulated against the labeled lang column —
    (lang, pred_lang, n_docs).  One partial-grouped pass; the shuffle
    sees ≤ langs² keys."""
    from ocr_ray.functions import textstats

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "pred_lang": textstats.langid_column(t["text"]),
        })

    return _grouped_sum(
        _read(sf_dir, "documents", ["lang", "text"]),
        measures, keys=["lang", "pred_lang"], sum_cols=[],
        count_col="n_docs",
    )


def sentence_stats(sf_dir: str):
    """Sentence segmentation stats per document — the corpus-pipeline
    primitive under readability scoring and sentence-level dedup:
    sentences are the non-empty ``[.!?]+``-delimited segments after
    trimming the explicit whitespace set " \\t\\n\\f\\r" (spelled out so
    Python strip and DuckDB trim agree char-for-char).  Output
    (doc_id, n_sentences, sum_sentence_chars) — all integers,
    embarrassingly parallel."""
    import re

    splitter = re.compile(r"[.!?]+")
    ws = " \t\n\f\r"

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        ns, chars = [], []
        for txt in t["text"].to_pylist():
            segs = [s.strip(ws) for s in splitter.split(txt or "")]
            segs = [s for s in segs if s]
            ns.append(len(segs))
            chars.append(sum(len(s) for s in segs))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_sentences": pa.array(ns, pa.int64()),
            "sum_sentence_chars": pa.array(chars, pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def bpe_merge_candidates(sf_dir: str, k: int = 10):
    """FIRST BPE TRAINING ROUND — the tokenizer-building primitive: count
    every adjacent CHARACTER pair inside whitespace words across the
    corpus and return the top-k merge candidates (count desc, pair asc),
    exactly what a byte-pair-encoding trainer merges first.

    Same two-level exact reduce as top_terms: per-batch Counter partials
    bucketed by crc32(pair), per-bucket vectorized sum + top-k, bounded
    repartition(1) final — the pair vocabulary (≤ charset²) never
    reaches the driver unbounded.  Iterated merges (rounds 2+) would
    re-tokenize with the winning pair and repeat — the topology is
    identical per round."""
    import collections
    import re
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    _ws = re.compile(r"[ \t\n\f\r]+")      # RE2's \s exactly (not .split())

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            for w in _ws.split((txt or "").lower()):
                c.update(w[i:i + 2] for i in range(len(w) - 1))
        pairs = list(c.keys())
        return pa.table({
            "pair": pa.array(pairs, pa.string()),
            "n": pa.array([c[p] for p in pairs], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(p.encode()) % n_buckets for p in pairs],
                pa.int32()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", as_index=False)["n"].sum()
        s["n"] = s["n"].astype("int64")
        return s.sort_values(["n", "pair"],
                             ascending=[False, True]).head(k)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("pair", "ascending")])[:k]
        return t.take(idx).select(["pair", "n"])

    return (_read(sf_dir, "documents", ["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def _bpe_apply(syms: list, merges) -> list:
    """Apply BPE merges in training order, each greedy left-to-right
    non-overlapping (the standard BPE step; identical to the oracle's
    '|l||r|' → '|lr|' string replace over the segment encoding)."""
    for left, right in merges:
        out = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_merges(sf_dir: str, n_rounds: int = 3,
               fuse_vocab_rows: int | None = None):
    """ITERATED BPE TRAINER (VERDICT r4 item 4) — n_rounds of the
    byte-pair-encoding loop: count adjacent symbol pairs, merge the
    winner (n desc, left asc, right asc), re-segment, repeat.  Round 1
    equals :func:`bpe_merge_candidates`' top row by construction.
    Output: (round, left_sym, right_sym, merged, n).

    Scale shape: BPE trains on the WORD VOCABULARY, not the corpus — one
    corpus pass + one crc32(word) exchange builds the exact (word, freq)
    table, and every round after that touches only the vocab.  Per round
    the broadcast merge list (r-1 string pairs — tiny) re-segments each
    word inside map_batches, pair-count partials ride a crc32(pair)
    bucket, per-bucket top-1 candidates (a pair lives in ONE bucket, so
    bucket sums are global) reduce to the winner from <= n_buckets rows.
    Size-adaptive: a vocab at or below ``fuse_vocab_rows`` runs ALL
    rounds in one Ray task (repartition(1) + map_batches) — the same
    fused-tail discipline as minhash_near_dup, skipping n_rounds of
    shuffle fixed cost; the driver never holds the vocab on either path.

    Words containing U+001F are excluded (the oracle's segment encoding
    reserves it); it appears in no real text.  Reference semantics: the
    tokenizer-training primitive of SURVEY §2 LLM-ops."""
    import collections
    import re
    import zlib

    if fuse_vocab_rows is None:
        fuse_vocab_rows = DEFAULT_CONFIG.bpe_fuse_vocab_rows
    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    _ws = re.compile(r"[ \t\n\f\r]+")
    _SEP = "\x1f"

    def word_partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            for w in _ws.split((txt or "").lower()):
                if len(w) >= 2 and _SEP not in w:
                    c[w] += 1
        words = list(c.keys())
        return pa.table({
            "word": pa.array(words, pa.string()),
            "f": pa.array([c[w] for w in words], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(w.encode()) % n_buckets for w in words],
                pa.int32()),
        })

    def word_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word", as_index=False)["f"].sum()
        s["f"] = s["f"].astype("int64")
        return s[["word", "f"]]

    vocab = (_read(sf_dir, "documents", ["text"])
             .map_batches(word_partial, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(word_sum, batch_format="pandas")
             .materialize())

    out_schema = pa.schema([("round", pa.int64()),
                            ("left_sym", pa.string()),
                            ("right_sym", pa.string()),
                            ("merged", pa.string()),
                            ("n", pa.int64())])

    def _rows_table(rows) -> pa.Table:
        return pa.table({
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "left_sym": pa.array([r[1] for r in rows], pa.string()),
            "right_sym": pa.array([r[2] for r in rows], pa.string()),
            "merged": pa.array([r[3] for r in rows], pa.string()),
            "n": pa.array([r[4] for r in rows], pa.int64()),
        }, schema=out_schema)

    def _train_rounds(words, freqs, rounds):
        """All rounds over an in-memory vocab (the fused tail)."""
        merges, rows = [], []
        segs = [list(w) for w in words]
        for rnd in range(1, rounds + 1):
            c: collections.Counter = collections.Counter()
            for syms, f in zip(segs, freqs):
                for i in range(len(syms) - 1):
                    c[(syms[i], syms[i + 1])] += f
            if not c:
                break
            (left, right), n = min(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            rows.append((rnd, left, right, left + right, int(n)))
            merges.append((left, right))
            segs = [_bpe_apply(s, [(left, right)]) for s in segs]
        return rows

    if vocab.count() <= fuse_vocab_rows:
        def fused(t: pa.Table) -> pa.Table:
            return _rows_table(_train_rounds(
                t["word"].to_pylist(), t["f"].to_pylist(), n_rounds))

        return (vocab.repartition(1)
                .map_batches(fused, batch_format="pyarrow",
                             batch_size=None))

    # distributed rounds: vocab-sized map + pair-bucket reduce per round
    merges: list[tuple[str, str]] = []
    rows: list[tuple] = []
    for rnd in range(1, n_rounds + 1):
        merges_ref = ray.put(list(merges))

        def pair_partial(t: pa.Table, _mref=merges_ref) -> pa.Table:
            ms = ray.get(_mref)
            c: collections.Counter = collections.Counter()
            for w, f in zip(t["word"].to_pylist(), t["f"].to_pylist()):
                syms = _bpe_apply(list(w), ms)
                for i in range(len(syms) - 1):
                    c[(syms[i], syms[i + 1])] += f
            keys = list(c.keys())
            return pa.table({
                "l": pa.array([k[0] for k in keys], pa.string()),
                "r": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([c[k] for k in keys], pa.int64()),
                "bucket": pa.array(
                    [zlib.crc32((k[0] + _SEP + k[1]).encode()) % n_buckets
                     for k in keys], pa.int32()),
            })

        def bucket_top1(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby(["l", "r"], as_index=False)["n"].sum()
            s["n"] = s["n"].astype("int64")
            return s.sort_values(["n", "l", "r"],
                                 ascending=[False, True, True]).head(1)

        cands = (vocab.map_batches(pair_partial, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(bucket_top1, batch_format="pandas")
                 .take_all())           # <= n_buckets rows
        if not cands:
            break
        top = min(cands, key=lambda x: (-x["n"], x["l"], x["r"]))
        rows.append((rnd, top["l"], top["r"], top["l"] + top["r"],
                     int(top["n"])))
        merges.append((top["l"], top["r"]))
    return _rows_table(rows)


def dsir_weights(sf_dir: str, n_buckets: int | None = None,
                 target_lang: str | None = None):
    """DSIR IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public method): score
    every document by the log-likelihood ratio between a TARGET-domain
    unigram model and the RAW-corpus model over HASHED token features:
    ``weight = Σ_tokens [ln p_target(bucket(tok)) − ln p_raw(bucket(tok))]``
    with Laplace smoothing, bucket = md5-lower-64(token) % n_buckets.
    Target domain here: documents with ``lang = target_lang``.  Output
    (doc_id, n_tokens, weight_unats); docs with no tokens are excluded.

    Float discipline: each bucket's two ln terms round to integer
    micro-nats SEPARATELY (half-away) before any arithmetic, so per-doc
    weights are exact integer dot products c_doc·term — distributed
    order cannot perturb them and the oracle reproduces every value.

    Scale shape: the model is a FIXED-SIZE vector (n_buckets counts per
    side) — per-batch counts emit as one binary blob (the
    _gram_partial discipline), `_prefold` caps the driver at
    driver_fold_buckets blobs per side, and the term vector broadcasts
    via ray.put; scoring is one embarrassingly parallel bincount·term
    pass.  No shuffle anywhere."""
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.dsir_buckets
    if target_lang is None:
        target_lang = DEFAULT_CONFIG.dsir_target_lang
    _tok_buckets = _dsir_tok_buckets(n_buckets)
    term_ref = ray.put(_dsir_term(sf_dir, n_buckets, target_lang))

    def score(t: pa.Table) -> pa.Table:
        tm = ray.get(term_ref)
        ids, n_tok, w = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            b = _tok_buckets(txt)
            if b.size == 0:
                continue
            ids.append(did)
            n_tok.append(int(b.size))
            w.append(int(np.bincount(b, minlength=len(tm)) @ tm))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "weight_unats": pa.array(w, pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def _dsir_tok_buckets(n_buckets: int):
    """Tokenizer → hashed-feature buckets shared by the DSIR family:
    whitespace tokens, lowercased, md5-lower-64 % n_buckets."""
    import re

    _ws = re.compile(r"[ \t\n\f\r]+")

    def f(txt: str) -> np.ndarray:
        toks = [x for x in _ws.split((txt or "").lower()) if x]
        if not toks:
            return np.zeros(0, np.int64)
        return _md5_mod(toks, n_buckets)

    return f


def _dsir_term(sf_dir: str, n_buckets: int, target_lang: str) -> np.ndarray:
    """Build the DSIR log-likelihood-ratio term vector: two bounded
    count-blob folds (target side / raw side) over ONE pruned read each,
    ln terms rounded to integer micro-nats separately (half-away)."""
    _tok_buckets = _dsir_tok_buckets(n_buckets)

    def count_blob(which: str):
        def f(t: pa.Table) -> pa.Table:
            vec = np.zeros(n_buckets, np.int64)
            langs = (t["lang"].to_pylist() if "lang" in t.column_names
                     else [None] * t.num_rows)
            for lang, txt in zip(langs, t["text"].to_pylist()):
                if which == "target" and lang != target_lang:
                    continue
                b = _tok_buckets(txt)
                if b.size:
                    vec += np.bincount(b, minlength=n_buckets)
            return pa.table({
                "counts": pa.array([vec.tobytes()], pa.binary()),
                "dim": pa.array([n_buckets], pa.int64()),
                "n_vecs": pa.array([int(vec.sum())], pa.int64()),
            })
        return f

    def _fold(which: str) -> np.ndarray:
        rows = _prefold(
            _read(sf_dir, "documents", ["lang", "text"]).map_batches(
                count_blob(which), batch_format="pyarrow"),
            _dsir_blob_add).take_all()
        vec = np.zeros(n_buckets, np.int64)
        for r in rows:
            vec += np.frombuffer(r["counts"], np.int64)
        return vec

    ct, cr = _fold("target"), _fold("raw")

    def _r6(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    tt, tr = float(ct.sum()), float(cr.sum())
    return (_r6(1e6 * np.log((ct + 1.0) / (tt + n_buckets)))
            - _r6(1e6 * np.log((cr + 1.0) / (tr + n_buckets))))


def _dsir_blob_add(t: pa.Table) -> pa.Table:
    """Elementwise-add a block of count blobs (the _gram_add shape)."""
    if t.num_rows <= 1:
        return t
    dim = int(t["dim"][0].as_py())
    tot = np.zeros(dim, np.int64)
    for b in t["counts"].to_pylist():
        tot += np.frombuffer(b, np.int64)
    return pa.table({
        "counts": pa.array([tot.tobytes()], pa.binary()),
        "dim": pa.array([dim], pa.int64()),
        "n_vecs": pa.array([int(pc.sum(t["n_vecs"]).as_py())], pa.int64()),
    })


def lm_quality_buckets(sf_dir: str):
    """CCNet-STYLE QUALITY BUCKETS: per language, split documents into
    terciles of the bigram-LM average score (avg micro-nats per bigram
    — the public CCNet method buckets a corpus by per-doc LM perplexity
    into head/middle/tail for curriculum-weighted sampling).  Output
    (lang, bucket 0/1/2, n_docs), bucket 0 = lowest (worst) scores.

    Composition + scale shape: per-doc scores stream from
    :func:`bigram_lm_scores`, MATERIALIZED so the lang-attach union has
    a plain-map branch (the proven union shape: never a groupby inside
    a union branch — three int64 columns per doc, tiny next to text);
    lang attaches through one coarse doc-bucket side-tag exchange whose
    kernel also pre-compresses to (lang, avg_mu, count) value-count
    partials — bounded by langs × the quantized value RANGE, not the
    corpus — and one bounded task walks each language's cumulative
    histogram for the two quantile_disc boundaries
    (sorted[ceil(q·n)], the doc_length_quantiles convention) and the
    bucket counts.  avg_mu = half-away-round(1000·score/n) — one
    division, the oracle's exact float shape."""
    import math

    scores = bigram_lm_scores(sf_dir).materialize()

    def score_rows(t: pa.Table) -> pa.Table:
        s = t["score_unats"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = 1000.0 * s / n
        avg = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(t["doc_id"], 63), pa.int32()),
            "doc_id": t["doc_id"],
            "side": pa.nulls(t.num_rows, pa.int8()).fill_null(0),
            "lang": pa.nulls(t.num_rows, pa.string()).fill_null(""),
            "avg_mu": pa.array(avg, pa.int64()),
        })

    def lang_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(t["doc_id"], 63), pa.int32()),
            "doc_id": t["doc_id"],
            "side": pa.nulls(t.num_rows, pa.int8()).fill_null(1),
            "lang": t["lang"],
            "avg_mu": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
        })

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        sc = g[g["side"] == 0][["doc_id", "avg_mu"]]
        la = g[g["side"] == 1][["doc_id", "lang"]]
        m = sc.merge(la, on="doc_id", how="inner")
        out = (m.groupby(["lang", "avg_mu"], as_index=False)
                .size().rename(columns={"size": "c"}))
        out["c"] = out["c"].astype("int64")
        return out[["lang", "avg_mu", "c"]]

    def final(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
               .groupby(["lang", "avg_mu"], as_index=False)["c"].sum())
        langs, buckets, counts = [], [], []
        for lang, g in df.groupby("lang", sort=True):
            g = g.sort_values("avg_mu")
            total = int(g["c"].sum())
            cum = g["c"].cumsum().to_numpy()
            vals = g["avg_mu"].to_numpy()
            q1, q2 = (int(vals[int(np.searchsorted(
                cum, max(1, math.ceil(q * total))))])
                for q in (1.0 / 3, 2.0 / 3))
            b = np.where(vals <= q1, 0, np.where(vals <= q2, 1, 2))
            cs = g["c"].to_numpy()
            for bk in (0, 1, 2):
                n = int(cs[b == bk].sum())
                if n:
                    langs.append(lang)
                    buckets.append(bk)
                    counts.append(n)
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "bucket": pa.array(buckets, pa.int64()),
            "n_docs": pa.array(counts, pa.int64()),
        })

    sc_ds = scores.map_batches(score_rows, batch_format="pyarrow")
    lg_ds = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        lang_rows, batch_format="pyarrow")
    return (sc_ds.union(lg_ds)
            .groupby("bucket")
            .map_groups(attach, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def bpe_tokenize_stats(sf_dir: str, n_rounds: int = 3):
    """APPLY the learned BPE merges corpus-wide — the second half of the
    tokenizer loop (:func:`bpe_merges` trains, this tokenizes): per lang,
    (n_words, n_symbols_before, n_symbols_after) where before = one
    symbol per character and after = symbols once all n_rounds merges
    have been applied greedily in training order.

    Scale shape: the merge list is n_rounds string pairs — broadcast via
    ray.put; the apply pass is embarrassingly parallel map_batches with
    a per-batch DISTINCT-WORD memo (the same word re-segments once per
    batch, not once per occurrence), partial per-lang sums before the
    tiny groupby.  Words containing U+001F are excluded (the training
    chain's convention); words under 2 chars never merge."""
    import collections
    import re

    m = bpe_merges(sf_dir, n_rounds)
    mdf = (m.to_pandas() if hasattr(m, "to_pandas") else m).sort_values(
        "round")
    merges = list(zip(mdf["left_sym"], mdf["right_sym"]))
    merges_ref = ray.put(merges)
    _ws = re.compile(r"[ \t\n\f\r]+")
    _SEP = "\x1f"

    def partial(t: pa.Table) -> pa.Table:
        ms = ray.get(merges_ref)
        memo: dict = {}
        acc: dict = collections.defaultdict(lambda: [0, 0, 0])
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in _ws.split((txt or "").lower()):
                if not w or _SEP in w:
                    continue
                r = memo.get(w)
                if r is None:
                    r = (len(w),
                         1 if len(w) < 2 else len(_bpe_apply(list(w), ms)))
                    memo[w] = r
                a = acc[lang]
                a[0] += 1
                a[1] += r[0]
                a[2] += r[1]
        langs = sorted(acc)
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "n_words": pa.array([acc[x][0] for x in langs], pa.int64()),
            "n_symbols_before": pa.array([acc[x][1] for x in langs],
                                         pa.int64()),
            "n_symbols_after": pa.array([acc[x][2] for x in langs],
                                        pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (_read(sf_dir, "documents", ["lang", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_words", alias_name="n_words"),
                       Sum("n_symbols_before",
                           alias_name="n_symbols_before"),
                       Sum("n_symbols_after",
                           alias_name="n_symbols_after")))


def nb_lang_confusion(sf_dir: str):
    """SUPERVISED ML END-TO-END: train a multinomial Naive Bayes language
    classifier on the labeled corpus (Laplace-smoothed token likelihoods
    + class priors) and evaluate it on the same corpus as a confusion
    matrix (lang, pred_lang, n_docs).

    The model is NEVER broadcast (vocabulary-sized at corpus scale) —
    training partials and scoring instances co-partition on a
    crc32(term) bucket exactly like bigram_lm_scores, so each bucket
    finalizes its slice of the model and scores its instances in one
    vectorized kernel; per-(doc, class) integer partials fold on a
    coarse doc bucket where priors are added and the argmax (ties →
    class asc) is taken.  Every ln-term rounds to integer micro-nats
    BEFORE summation (the repo's float-order-proof discipline); the only
    broadcast pieces are the per-class token totals T_l, the vocabulary
    size V and the priors — a handful of scalars.  Docs with no tokens
    are excluded on both sides.

    Zipf flattening (VERDICT r4 nit 2): terms owning >= 1/term_hot_frac
    of the token stream are detected EXACTLY inside the same
    _bucket_stats pass (a crc32(term) bucket holds every partial of a
    term); a hot term's instance rows sub-bucket by doc_id %
    term_hot_salts while its per-(term, lang) model partials — a tiny
    |langs|-row slice — replicate into every salt bucket, so each salt
    finalizes the identical exact model slice and predictions are
    bit-identical with salting on or off."""
    import collections
    import re
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    n_salts = DEFAULT_CONFIG.term_hot_salts
    hot_frac = DEFAULT_CONFIG.term_hot_frac
    _ws = re.compile(r"[ \t\n\f\r]+")

    def _toks(txt: str) -> list:
        return [x for x in _ws.split((txt or "").lower()) if x]

    def count_partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for tok in _toks(txt):
                c[(lang, tok)] += 1
        keys = list(c.keys())
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "term": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(k[1].encode()) % n_buckets for k in keys],
                pa.int32()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    parts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .materialize()

    # global scalars in TWO tiny executions (not four): one per-bucket
    # pass over the materialized partials yields per-class token totals
    # AND the vocabulary size; doc counts come from a lang-only read
    # (the old groupby over ds shuffled every document body to count)
    from ray.data.aggregate import Sum

    def _bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        per_lang = g.groupby("lang", as_index=False)["n"].sum()
        # exact hot-term candidates in the SAME pass: the bucket holds
        # every partial of a term, so per-bucket term sums are global;
        # in-bucket share >= global share keeps every global heavy hitter
        per_term = g.groupby("term", as_index=False)["n"].sum()
        tot = int(per_term["n"].sum())
        cand = per_term[per_term["n"] * hot_frac >= tot]
        return pd.DataFrame({
            "lang": list(per_lang["lang"]) + [""] * (1 + len(cand)),
            "t": list(per_lang["n"].astype("int64")) + [0] * (1 + len(cand)),
            "v": ([0] * len(per_lang) + [int(g["term"].nunique())]
                  + [0] * len(cand)),
            "term": [""] * (len(per_lang) + 1) + list(cand["term"]),
            "cnt": ([0] * (len(per_lang) + 1)
                    + list(cand["n"].astype("int64"))),
        })

    sdf = _concat_nonempty(parts.groupby("bucket").map_groups(
        _bucket_stats, batch_format="pandas")).to_pandas()
    lang_rows = sdf[sdf["lang"] != ""].groupby("lang")["t"].sum()
    t_by_lang = {l: int(v) for l, v in lang_rows.items()}
    vocab = int(sdf["v"].sum())
    total_tokens = int(sum(t_by_lang.values()))
    cand = sdf[sdf["term"] != ""]
    hot = frozenset(tk for tk, c in zip(cand["term"], cand["cnt"])
                    if int(c) * hot_frac >= total_tokens)
    hot_ref = ray.put(hot)

    def _inst_buckets(terms, doc_ids, h) -> pa.Array:
        if not h:
            return pa.array(
                [zlib.crc32(x.encode()) % n_buckets for x in terms],
                pa.int32())
        return pa.array(
            _hot_salted_buckets(terms, doc_ids, h, n_buckets, n_salts),
            pa.int32())

    def _doc_counts(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t["lang"]}).to_pandas().groupby(
            "lang", as_index=False).size()
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "n_docs": pa.array(g["size"], pa.int64())})

    ndf = _concat_nonempty(
        _read(sf_dir, "documents", ["lang"]).map_batches(
            _doc_counts, batch_format="pyarrow")
        .groupby("lang").aggregate(Sum("n_docs", alias_name="n_docs"))
    ).to_pandas()
    n_by_lang = dict(zip(ndf["lang"], ndf["n_docs"].astype(int)))
    n_total = int(sum(n_by_lang.values()))
    classes = sorted(t_by_lang)
    priors = {
        l: int(np.copysign(np.floor(abs(
            1e6 * np.log(float(n_by_lang[l]) / n_total)) + 0.5),
            np.log(float(n_by_lang[l]) / n_total)))
        for l in classes}
    stats_ref = ray.put((classes, t_by_lang, vocab))

    def instances(t: pa.Table) -> pa.Table:
        ids, labels, terms, ms = [], [], [], []
        for did, lang, txt in zip(t["doc_id"].to_pylist(),
                                  t["lang"].to_pylist(),
                                  t["text"].to_pylist()):
            c = collections.Counter(_toks(txt))
            for tok, m in c.items():
                ids.append(did)
                labels.append(lang)
                terms.append(tok)
                ms.append(m)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(labels, pa.string()),
            "term": pa.array(terms, pa.string()),
            "n": pa.array(ms, pa.int64()),
            "bucket": _inst_buckets(terms, ids, ray.get(hot_ref)),
            "side": pa.nulls(len(ids), pa.int8()).fill_null(0),
        })

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cls, t_l, v = ray.get(stats_ref)
        model = (g[g["side"] == 1]
                 .groupby(["term", "lang"], as_index=False)["n"].sum())
        inst = g[g["side"] == 0]
        cols = {"doc_id": pd.array([], "int64"),
                "label": pd.array([], "str"),
                "dbucket": pd.array([], "int32")}
        for l in cls:
            cols[f"s_{l}"] = pd.array([], "int64")
        if not len(inst):
            return pd.DataFrame(cols)
        out = inst[["doc_id", "lang", "term", "n"]].rename(
            columns={"lang": "label", "n": "m"})
        # ONE unstack + ONE merge, then 5 vectorized column computations
        # (model is already summed per (term, lang); pivot_table's
        # aggfunc re-aggregation measured slower than plain merges)
        wide = (model.set_index(["term", "lang"])["n"]
                .unstack(fill_value=0))
        merged = out[["term"]].merge(wide, left_on="term",
                                     right_index=True, how="left")
        m_arr = out["m"].to_numpy()
        for l in cls:
            c = (merged[l].fillna(0).to_numpy(np.float64)
                 if l in merged.columns else np.zeros(len(out)))
            x = 1e6 * np.log((c + 1.0) / float(t_l[l] + v))
            term_sc = np.copysign(np.floor(np.abs(x) + 0.5),
                                  x).astype("int64")
            out[f"s_{l}"] = term_sc * m_arr
        agg = {f"s_{l}": (f"s_{l}", "sum") for l in cls}
        agg["label"] = ("label", "first")
        res = out.groupby("doc_id", as_index=False).agg(**agg)
        for l in cls:
            res[f"s_{l}"] = res[f"s_{l}"].astype("int64")
        res["dbucket"] = np.bitwise_and(
            res["doc_id"].to_numpy(np.int64), 63).astype("int32")
        return res[["doc_id", "label", "dbucket"]
                   + [f"s_{l}" for l in cls]]

    def fold_predict(g: pd.DataFrame) -> pd.DataFrame:
        cls, _, _ = ray.get(stats_ref)
        agg = {f"s_{l}": (f"s_{l}", "sum") for l in cls}
        agg["label"] = ("label", "first")
        res = g.groupby("doc_id", as_index=False).agg(**agg)
        scores = np.stack(
            [res[f"s_{l}"].to_numpy(np.int64) + priors[l] for l in cls],
            axis=1)
        # argmax with ties → class asc (classes sorted; np.argmax takes
        # the first maximum)
        pred = np.asarray(cls, dtype=object)[np.argmax(scores, axis=1)]
        out = (pd.DataFrame({"lang": res["label"], "pred_lang": pred})
               .groupby(["lang", "pred_lang"], as_index=False).size()
               .rename(columns={"size": "n_docs"}))
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    def model_rows(t: pa.Table) -> pa.Table:
        base = (t.append_column(
            "doc_id", pa.nulls(t.num_rows, pa.int64()).fill_null(-1))
            .append_column("side", pa.nulls(t.num_rows, pa.int8()).fill_null(1))
            .select(["doc_id", "lang", "term", "n", "bucket", "side"]))
        h = ray.get(hot_ref)
        if not h:
            return base
        # a hot term's model slice (|langs| partial rows per batch) is
        # replicated into EVERY salt bucket, so each salt finalizes the
        # identical exact c(term, lang) — the heavy instance mass is what
        # spreads, the count rows are cheap
        df = base.to_pandas()
        is_hot = df["term"].isin(h)
        reps = [df[~is_hot]]
        for s in range(n_salts):
            r = df[is_hot].copy()
            r["bucket"] = np.asarray(
                [zlib.crc32(f"{tk}\x00{s}".encode()) % n_buckets
                 for tk in r["term"]], np.int32)
            reps.append(r)
        out = pd.concat(reps, ignore_index=True)
        out["bucket"] = out["bucket"].astype("int32")
        return pa.Table.from_pandas(out, preserve_index=False)

    inst_ds = ds.map_batches(instances, batch_format="pyarrow")
    model_ds = parts.map_batches(model_rows, batch_format="pyarrow")
    return (inst_ds.union(model_ds)
            .groupby("bucket")
            .map_groups(score_bucket, batch_format="pandas")
            .groupby("dbucket")
            .map_groups(fold_predict, batch_format="pandas")
            .groupby(["lang", "pred_lang"])
            .aggregate(Sum("n_docs", alias_name="n_docs")))


def lang_mixture_weights(sf_dir: str, alpha: float = 0.3,
                         scale: int = 1_000_000):
    """TEMPERATURE-SCALED corpus mixture weights (the mC4 / XLM-R
    ``alpha``-sampling step — Conneau et al. 2020, arXiv:1911.02116,
    public method): per language, ``w_l ∝ p_l^alpha`` where
    ``p_l = n_l / N`` — upweights tail languages so a multilingual
    training mix is not dominated by the head language.  Output one row
    per language: ``(lang, n_docs, pow_micro, w_micro)``.

    Float discipline: each ``p_l^alpha`` term rounds to integer
    micro-units SEPARATELY (half-away) before the normalizing sum, so
    the denominator is an exact integer and summation order cannot
    perturb a weight (the dsir_weights discipline).

    Scale shape: per-batch value-counts → a |langs|-key groupby sum →
    the closed-form weights computed in ONE bounded task over the
    |langs|-row table.  The corpus is read once, one pruned column.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["lang"])
        return pa.table({
            "lang": vc.field("values"),
            "n_docs": pc.cast(vc.field("counts"), pa.int64()),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby("lang", as_index=False)["n_docs"].sum()
        n_total = float(df["n_docs"].sum())
        p = df["n_docs"].to_numpy(np.float64) / n_total
        pow_micro = np.copysign(
            np.floor(np.abs(scale * p ** alpha) + 0.5), 1.0).astype(np.int64)
        denom = float(pow_micro.sum())
        w_micro = np.floor(scale * pow_micro / denom + 0.5).astype(np.int64)
        return pd.DataFrame({
            "lang": df["lang"],
            "n_docs": df["n_docs"].astype("int64"),
            "pow_micro": pow_micro,
            "w_micro": w_micro,
        })

    return (
        _read(sf_dir, "documents", ["lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def dsir_select_stats(sf_dir: str, quota: int = 100,
                      n_buckets: int | None = None,
                      target_lang: str | None = None):
    """DSIR SELECTION (the resampling step of Xie et al. 2023, public
    method): per language, keep the ``quota`` documents with the highest
    importance weight (ties → lowest doc_id) and report survivor stats —
    ``(lang, n_selected, sum_tokens, min_weight_unats,
    max_weight_unats)``.  This is the step that turns
    :func:`dsir_weights` scores into an actual curated corpus slice.

    Scale shape: the term vector builds exactly as in
    :func:`dsir_weights` (bounded blob folds, broadcast once); scoring
    emits (lang, doc_id, n_tokens, weight) and each batch pre-truncates
    to its own per-lang top-``quota`` BEFORE the exchange, so the
    |langs|-group final merge sees ≤ quota × n_batches rows — never the
    corpus.  |langs| is small by construction (a language mix), so the
    per-group map_groups dispatch cost is bounded.
    """
    if n_buckets is None:
        n_buckets = DEFAULT_CONFIG.dsir_buckets
    if target_lang is None:
        target_lang = DEFAULT_CONFIG.dsir_target_lang
    _tok_buckets = _dsir_tok_buckets(n_buckets)
    term_ref = ray.put(_dsir_term(sf_dir, n_buckets, target_lang))

    def score(t: pa.Table) -> pd.DataFrame:
        tm = ray.get(term_ref)
        langs, ids, n_tok, w = [], [], [], []
        for lang, did, txt in zip(t["lang"].to_pylist(),
                                  t["doc_id"].to_pylist(),
                                  t["text"].to_pylist()):
            b = _tok_buckets(txt)
            if b.size == 0:
                continue
            langs.append(lang)
            ids.append(did)
            n_tok.append(int(b.size))
            w.append(int(np.bincount(b, minlength=len(tm)) @ tm))
        df = pd.DataFrame({
            "lang": pd.Series(langs, dtype="object"),
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_tokens": pd.Series(n_tok, dtype="int64"),
            "weight_unats": pd.Series(w, dtype="int64"),
        })
        # per-batch partial top-quota per lang: only candidate rows cross
        top = (df.sort_values(["weight_unats", "doc_id"],
                              ascending=[False, True])
               .groupby("lang", as_index=False).head(quota))
        # explicit arrow types: an all-token-less batch must still emit
        # string-typed lang, never a null-typed empty object column
        return pa.table({
            "lang": pa.array(top["lang"].tolist(), pa.string()),
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
            "n_tokens": pa.array(top["n_tokens"].to_numpy(np.int64)),
            "weight_unats": pa.array(top["weight_unats"].to_numpy(np.int64)),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        top = (g.sort_values(["weight_unats", "doc_id"],
                             ascending=[False, True]).head(quota))
        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "n_selected": np.array([len(top)], np.int64),
            "sum_tokens": np.array([top["n_tokens"].sum()], np.int64),
            "min_weight_unats": np.array(
                [top["weight_unats"].min()], np.int64),
            "max_weight_unats": np.array(
                [top["weight_unats"].max()], np.int64),
        })

    return (
        _read(sf_dir, "documents", ["lang", "doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def mixture_epoch_plan(sf_dir: str, budget: int = 10_000,
                       alpha: float = 0.3, scale: int = 1_000_000):
    """EPOCH SAMPLING PLAN: apportion an epoch's ``budget`` draws across
    languages proportionally to the alpha-temperature mixture weight
    (:func:`lang_mixture_weights`) using LARGEST-REMAINDER (Hamilton)
    apportionment — the deterministic integer step a data-loader runs to
    turn mixture weights into per-source sample counts.  Output one row
    per language: ``(lang, n_docs, pow_micro, draws)`` with
    ``Σ draws == budget`` exactly.

    Integer discipline: after the per-lang ``p^alpha`` terms round to
    micro-units (the one float step, dsir-style isolated), everything is
    exact integer arithmetic — ``base = budget·pm // Σpm``, remainders
    ranked ``(rem DESC, lang ASC)``, the first ``budget − Σbase`` ranks
    get +1 — so the plan is reproducible bit-for-bit on any engine.

    Scale shape: identical to :func:`lang_mixture_weights` — one pruned
    read, value-count partials, a |langs|-key groupby, one bounded final
    task."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["lang"])
        return pa.table({
            "lang": vc.field("values"),
            "n_docs": pc.cast(vc.field("counts"), pa.int64()),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.groupby("lang", as_index=False)["n_docs"].sum()
              .sort_values("lang").reset_index(drop=True))
        n_total = float(df["n_docs"].sum())
        p = df["n_docs"].to_numpy(np.float64) / n_total
        pm = np.floor(scale * p ** alpha + 0.5).astype(np.int64)
        sp = int(pm.sum())
        num = budget * pm.astype(object)        # exact python ints
        base = np.array([int(x) // sp for x in num], np.int64)
        rem = np.array([int(x) % sp for x in num], np.int64)
        extra = budget - int(base.sum())
        # rank by (rem desc, lang asc); df is lang-sorted so stable
        # mergesort on -rem preserves the lang tiebreak
        order = np.argsort(-rem, kind="stable")
        draws = base.copy()
        draws[order[:extra]] += 1
        return pd.DataFrame({
            "lang": df["lang"],
            "n_docs": df["n_docs"].astype("int64"),
            "pow_micro": pm,
            "draws": draws,
        })

    return (
        _read(sf_dir, "documents", ["lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def grouped_split_audit(sf_dir: str):
    """LEAKAGE-SAFE GROUP SPLIT (sklearn GroupShuffleSplit semantics, at
    corpus scale): assign train/val/test by hashing the document's
    SOURCE — md5-lower-64(source) % 100, < 90/95 boundaries, the
    :func:`dataset_split_counts` convention — so every doc of a source
    lands in ONE split and same-source near-duplicates can never
    straddle train and eval.  The audit column counts the docs a naive
    doc-id-level split would have placed in a DIFFERENT split than
    their source (``n_leaky_docs`` — the leakage a group split
    prevents).  Output per split: ``(split, n_sources, n_docs,
    sum_tokens, n_leaky_docs)``.

    Scale shape: one pruned read; per-batch pandas pre-agg to
    (split, source) partials, a #sources-key groupby sum (sources ≈
    hosts — bounded and hash-balanced), then a 3-key rollup counting
    distinct sources.  Text never crosses an exchange."""
    from ray.data.aggregate import Count, Sum

    from ocr_ray.functions import textstats

    def _split(h: np.ndarray) -> np.ndarray:
        return np.where(h < 90, "train", np.where(h < 95, "val", "test"))

    def partial(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()
        split = _split(_md5_mod(src, 100))
        doc_split = _split(_md5_mod(t["doc_id"].to_pylist(), 100))
        df = pd.DataFrame({
            "split": split,
            "source": src,
            "n_docs": np.ones(t.num_rows, np.int64),
            "sum_tokens": textstats.token_count_columns(
                t["text"])["n_ws_tokens"].to_numpy(),
            "n_leaky_docs": (doc_split != split).astype(np.int64),
        })
        out = df.groupby(["split", "source"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    per_source = (
        _read(sf_dir, "documents", ["doc_id", "source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_tokens", alias_name="sum_tokens"),
                   Sum("n_leaky_docs", alias_name="n_leaky_docs"))
    )
    return (
        per_source.groupby("split")
        .aggregate(Count(alias_name="n_sources"),
                   Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_tokens", alias_name="sum_tokens"),
                   Sum("n_leaky_docs", alias_name="n_leaky_docs"))
    )


def cms_freq_estimates(sf_dir: str, k: int = 10, d: int = 4, w: int = 1024):
    """COUNT-MIN SKETCH term-frequency estimation (Cormode & Muthukrishnan
    2005 — public method; the fixed-memory frequency sketch a streaming
    corpus profiler keeps when exact per-term counts don't fit): build a
    d×w CMS over every token of the corpus, then report, for the exact
    global top-``k`` tokens, the exact count next to the sketch estimate
    and its (always non-negative) overcount:

      ``(token, n_exact, n_est, overcount)``

    Hash family: ``md5_number_lower(token || '|' || row) % w`` — the
    repo-wide DuckDB-reproducible hash (:func:`_md5_u64`), so the oracle
    rebuilds the sketch CELL-FOR-CELL, not just statistically.

    Scale shape: the sketch is the whole point — per batch, one Counter
    pass then a LOCAL d×w fold, so the shuffle carries at most d·w
    partial cell rows per batch regardless of token volume, and the
    groupby sees exactly d·w keys (4096 — far under the high-cardinality
    groupby pathology).  The exact top-k side reuses the
    :func:`top_terms` two-level exchange.  Driver state is the folded
    d·w cell table plus k probe rows — fixed-size at any corpus scale
    (the CMS guarantee).
    """
    cms_tbl = _concat_nonempty(_cms_cells(sf_dir, d, w))
    cells = np.zeros((d, w), dtype=np.int64)
    cells[cms_tbl["row"].to_numpy(), cms_tbl["cell"].to_numpy()] = (
        cms_tbl["c"].to_numpy())

    top = _concat_nonempty(top_terms(sf_dir, k=k))
    toks = top["token"].to_pylist()
    n_exact = top["n"].to_numpy()
    est = np.zeros(len(toks), dtype=np.int64)
    for i, tok in enumerate(toks):
        h = (_md5_u64([f"{tok}|{r}" for r in range(d)])
             % np.uint64(w)).astype(np.int64)
        est[i] = cells[np.arange(d), h].min()
    return pa.table({
        "token": pa.array(toks, pa.string()),
        "n_exact": pa.array(n_exact, pa.int64()),
        "n_est": pa.array(est, pa.int64()),
        "overcount": pa.array(est - n_exact, pa.int64()),
    })


def _cms_cells(sf_dir: str, d: int, w: int):
    """The distributed CMS build: (row, cell, c) — d·w rows total."""
    import collections

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            c.update((txt or "").lower().split())
        local = np.zeros((d, w), dtype=np.int64)
        toks = list(c.keys())
        if toks:
            ns = np.fromiter((c[tk] for tk in toks), dtype=np.int64,
                             count=len(toks))
            for r in range(d):
                h = (_md5_u64([f"{tk}|{r}" for tk in toks])
                     % np.uint64(w)).astype(np.int64)
                np.add.at(local[r], h, ns)
        rows, cols = np.nonzero(local)
        return pa.table({
            "row": pa.array(rows.astype(np.int64), pa.int64()),
            "cell": pa.array(cols.astype(np.int64), pa.int64()),
            "c": pa.array(local[rows, cols], pa.int64()),
        })

    return (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "cell"])
        .aggregate(Sum("c", alias_name="c"))
    )


def bottomk_quantile_estimates(sf_dir: str, k: int = 64):
    """MERGEABLE BOTTOM-K HASH-SAMPLE quantile estimation (the KMV /
    bottom-k sampling sketch of Cohen & Kaplan 2007 applied to order
    statistics — public method; the third sketch family next to
    Count-Min and the KMV distinct counter): the k docs with the
    smallest ``md5-lower-64(doc_id)`` hashes form a deterministic,
    partition- and order-invariant uniform sample, and the sample's
    quantile_disc order statistics estimate the corpus quantiles with
    O(k) state.  Returns, per q in ``_QUANTILES``:

      ``(q, est_value, exact_value, abs_err)``

    Scale shape: per-batch PARTIAL bottom-k (one lexsort over the
    batch) means the exchange carries ≤ k rows per batch; one
    ``repartition(1)`` task keeps the global k minima (the sketch's
    mergeability).  The exact side is the doc_length_quantiles
    value-count reduce (tiny distinct-value partials).  Driver state:
    two bounded tables (k sample rows + |quantiles| exact rows)."""
    import math

    def sample_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        h = _md5_u64([str(i) for i in ids])
        order = np.lexsort((np.asarray(ids, dtype=np.int64), h))[:k]
        return pa.table({
            "h": pa.array(h[order], pa.uint64()),
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)[order],
                               pa.int64()),
            "n_chars": t["n_chars"].take(pa.array(order, pa.int64())),
        })

    def sample_final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["h", "doc_id"]).head(k)
        vals = np.sort(df["n_chars"].to_numpy(dtype=np.int64))
        n = len(vals)
        est = [int(vals[max(1, math.ceil(q * n)) - 1]) for q in _QUANTILES]
        return pa.table({
            "q": pa.array(list(_QUANTILES), pa.float64()),
            "est_value": pa.array(est, pa.int64()),
        })

    est_tbl = _concat_nonempty(
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(sample_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(sample_final, batch_format="pyarrow", batch_size=None))
    exact_tbl = _concat_nonempty(doc_length_quantiles(sf_dir))
    exact = dict(zip(exact_tbl["q"].to_pylist(),
                     exact_tbl["value"].to_pylist()))
    est = dict(zip(est_tbl["q"].to_pylist(), est_tbl["est_value"].to_pylist()))
    qs = list(_QUANTILES)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "est_value": pa.array([est[q] for q in qs], pa.int64()),
        "exact_value": pa.array([exact[q] for q in qs], pa.int64()),
        "abs_err": pa.array([abs(est[q] - exact[q]) for q in qs], pa.int64()),
    })


def cms_join_size_estimate(sf_dir: str, d: int = 4, w: int = 1024):
    """JOIN-SIZE ESTIMATION via the Count-Min INNER PRODUCT (Cormode &
    Muthukrishnan 2005 §4.2 — public method; the fixed-memory cardinality
    estimate a distributed planner consults before picking a join
    strategy): |clicks ⋈ purchases on user_id| = Σ_u c(u)·p(u) is
    estimated by min_i Σ_cell A_i[cell]·B_i[cell] over two d×w sketches —
    a ONE-SIDED overestimate (colliding keys only add non-negative cross
    terms).  Returns one row:

      ``(n_clicks, n_purchases, exact_size, est_size, overcount)``

    Hash family ``md5_number_lower(user_id || '|' || row) % w`` so the
    oracle rebuilds both sketches cell-for-cell; every quantity is int64.

    Scale shape: each sketch build carries ≤ d·w cell partials per batch
    (per-batch value_counts then a LOCAL fold — never key instances);
    the exact side co-partitions (user, side) COUNTS on a 64-way user
    bucket and emits ONE partial product-sum row per bucket.  Driver
    state: 2·d·w cells + ≤64 partial rows, fixed at any log size."""
    import collections

    from ray.data.aggregate import Sum

    sides = {"click": "A", "purchase": "B"}

    def cms_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"et": t["event_type"],
                       "uid": t["user_id"]}).to_pandas()
        out_side, out_row, out_cell, out_c = [], [], [], []
        for et, tag in sides.items():
            counts = df.loc[df["et"] == et, "uid"].value_counts()
            if not len(counts):
                continue
            uids = counts.index.to_numpy()
            ns = counts.to_numpy(dtype=np.int64)
            local = np.zeros((d, w), dtype=np.int64)
            for r in range(d):
                h = (_md5_u64([f"{u}|{r}" for u in uids])
                     % np.uint64(w)).astype(np.int64)
                np.add.at(local[r], h, ns)
            rows, cols = np.nonzero(local)
            out_side.extend([tag] * len(rows))
            out_row.extend(rows.tolist())
            out_cell.extend(cols.tolist())
            out_c.extend(local[rows, cols].tolist())
        return pa.table({
            "side": pa.array(out_side, pa.string()),
            "ri": pa.array(out_row, pa.int64()),
            "cell": pa.array(out_cell, pa.int64()),
            "c": pa.array(out_c, pa.int64()),
        })

    cells = _concat_nonempty(
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(cms_partial, batch_format="pyarrow")
        .groupby(["side", "ri", "cell"])
        .aggregate(Sum("c", alias_name="c"))).to_pandas()
    mats = {tag: np.zeros((d, w), dtype=np.int64) for tag in sides.values()}
    for tag, g in cells.groupby("side"):
        mats[tag][g["ri"].to_numpy(), g["cell"].to_numpy()] = g["c"].to_numpy()
    a, b = mats["A"], mats["B"]
    est = int(min(int((a[r] * b[r]).sum()) for r in range(d)))
    n_clicks = int(a[0].sum())
    n_purchases = int(b[0].sum())

    def exact_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"et": t["event_type"],
                       "uid": t["user_id"]}).to_pandas()
        df = df[df["et"].isin(list(sides))]
        g = df.groupby(["uid", "et"], as_index=False).size()
        g["n"] = g.pop("size").astype("int64")
        g["bucket"] = (g["uid"].to_numpy() % 64).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def bucket_product(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["uid", "et"])["n"].sum().unstack(fill_value=0)
        ca = s["click"].to_numpy() if "click" in s else np.zeros(len(s))
        cb = s["purchase"].to_numpy() if "purchase" in s else np.zeros(len(s))
        return pd.DataFrame({"x": np.array([int((ca * cb).sum())],
                                           dtype=np.int64)})

    exact_tbl = _concat_nonempty(
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(exact_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_product, batch_format="pandas"))
    exact = int(pc.sum(exact_tbl["x"]).as_py() or 0)
    return pa.table({
        "n_clicks": pa.array([n_clicks], pa.int64()),
        "n_purchases": pa.array([n_purchases], pa.int64()),
        "exact_size": pa.array([exact], pa.int64()),
        "est_size": pa.array([est], pa.int64()),
        "overcount": pa.array([est - exact], pa.int64()),
    })


def hits_scores(sf_dir: str):
    """HITS hubs-and-authorities (Kleinberg 1999 — public method; the
    link-analysis score pair every web-crawl ranking stack computes
    alongside PageRank) over the same derived doc→doc link graph as
    :func:`pagerank_two_iter` (u → (2u+1) mod N and (3u+2) mod N), with
    EXACT INTEGER arithmetic so the distributed result is bit-stable:

      h0(u)  = 1e6                       (scaled unit hub vector)
      a1(v)  = Σ_{u→v} h0(u)             (authority update)
      h1(u)  = a1((2u+1)%N) + a1((3u+2)%N)   (hub update = gather of a1
                                          at u's out-neighbors)
      a2(v)  = Σ_{u→v} h1(u)             (second authority update)

    Returns (doc_id, hub_scaled = h1, auth_scaled = a2).  Integer sums
    commute, so block order and parallelism cannot perturb a bit.

    Scale shape — FOUR coarse 64-way exchanges, nothing else:
      forward passes (a from h) reuse the pagerank topology: one
        map_batches emits each node's carry-row plus its out-edge
        contributions keyed by destination (node and edge rows ride the
        SAME pass — never a Dataset.union of a shared upstream, see
        CLAUDE.md), then one vectorized per-bucket combine;
      the backward GATHER (h from a) is a co-partitioned request/value
        join: one map_batches over the a-table emits each node's value
        row (key = doc_id) AND its two request rows (key = out-neighbor,
        src = u); the first bucket combine resolves requests to values
        vectorized (pandas merge), the second sums the two resolved
        values per src.  No Dataset.join, no driver-side gather — the
        request table is exactly 2 rows per node at any corpus size.
    N comes from parquet metadata (no data read)."""
    n_docs = _table_num_rows(sf_dir, "documents")

    def _forward(ds):
        """(doc_id, val) → (doc_id, carry=val, in_val=Σ incoming val)."""
        def expand(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            val = t["val"].to_numpy(zero_copy_only=False)
            key = np.concatenate(
                [ids, (ids * 2 + 1) % n_docs, (ids * 3 + 2) % n_docs])
            out = pd.DataFrame({
                "key": key,
                "is_node": np.concatenate(
                    [np.ones(len(ids), np.int8),
                     np.zeros(2 * len(ids), np.int8)]),
                "contrib": np.concatenate(
                    [np.zeros(len(ids), np.int64), val, val]),
                "carry": np.concatenate(
                    [val, np.zeros(2 * len(ids), np.int64)]),
            })
            # pre-aggregate edge contributions per (key, role) before the
            # exchange — the shuffle carries partials, never edge instances
            out = out.groupby(["key", "is_node"], as_index=False).agg(
                contrib=("contrib", "sum"), carry=("carry", "sum"))
            out["bucket"] = (out["key"].to_numpy() & 63).astype(np.int32)
            return pa.Table.from_pandas(out, preserve_index=False)

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            c = (g[g["is_node"] == 0]
                 .groupby("key", as_index=False)["contrib"].sum())
            nodes = g.loc[g["is_node"] == 1, ["key", "carry"]]
            m = nodes.merge(c, on="key", how="left")
            return pd.DataFrame({
                "doc_id": m["key"].astype("int64"),
                "carry": m["carry"].astype("int64"),
                "in_val": m["contrib"].fillna(0).astype("int64"),
            })

        return (ds.map_batches(expand, batch_format="pyarrow")
                .groupby("bucket").map_groups(combine, batch_format="pandas"))

    seed = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "val": pa.nulls(t.num_rows, pa.int64()).fill_null(1_000_000),
        }), batch_format="pyarrow")

    a1 = _forward(seed).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "a": t["in_val"]}),
        batch_format="pyarrow")

    # backward gather: h1(u) = a1(2u+1 % N) + a1(3u+2 % N)
    def gather_expand(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        out = pd.DataFrame({
            "key": np.concatenate(
                [ids, (ids * 2 + 1) % n_docs, (ids * 3 + 2) % n_docs]),
            "kind": np.concatenate(
                [np.zeros(len(ids), np.int8),
                 np.ones(2 * len(ids), np.int8)]),
            "val": np.concatenate([a, np.zeros(2 * len(ids), np.int64)]),
            "src": np.concatenate(
                [np.full(len(ids), -1, np.int64), ids, ids]),
        })
        out["bucket"] = (out["key"].to_numpy() & 63).astype(np.int32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        vals = g.loc[g["kind"] == 0, ["key", "val"]]
        req = g.loc[g["kind"] == 1, ["key", "src"]]
        m = req.merge(vals, on="key", how="left")
        out = pd.DataFrame({
            "src": m["src"].astype("int64"),
            "val": m["val"].fillna(0).astype("int64"),
        })
        out["bucket"] = (out["src"].to_numpy() & 63).astype(np.int32)
        return out

    def sum_per_src(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("src", as_index=False)["val"].sum()
        return pd.DataFrame({"doc_id": s["src"].astype("int64"),
                             "val": s["val"].astype("int64")})

    h1 = (a1.map_batches(gather_expand, batch_format="pyarrow")
          .groupby("bucket").map_groups(resolve, batch_format="pandas")
          .groupby("bucket").map_groups(sum_per_src, batch_format="pandas"))

    return _forward(h1).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "hub_scaled": t["carry"],
                            "auth_scaled": t["in_val"]}),
        batch_format="pyarrow")


def corpus_log_odds(sf_dir: str, k: int = 25, min_count: int = 5):
    """TERM LOG-ODDS between two corpus slices (Monroe, Colaresi &
    Quinn 2008, "Fightin' Words" — public method; the standard
    what-distinguishes-corpus-A-from-corpus-B diagnostic a curation
    pipeline runs when comparing a language/domain slice against the
    rest).  Slices: ``lang = 'en'`` vs everything else; add-one
    Dirichlet prior (α_w = 1, α_0 = V).  For each term w:

      lo_s(w)  = round(1e6 · ln((y_sw + 1) / (n_s + V − y_sw − 1)))
      delta(w) = lo_en(w) − lo_rest(w)      (integer micro-nats)

    Each ln term rounds to integer micro-nats SEPARATELY (half-away,
    the :func:`bigram_lm_scores` float discipline) so Ray == DuckDB
    bit-for-bit.  Terms with y_en + y_rest < min_count are dropped;
    returns the top-k by delta desc, term asc — the most
    en-distinctive vocabulary.  Tokenization is lower().split()
    (= :func:`top_terms`).

    Scale shape: per-batch Counter partials keyed (term, slice) with
    bucket = crc32(term) % 64 (a term lives entirely in ONE bucket);
    one vectorized per-bucket combine emits exact (term, y_en, y_rest)
    rows PLUS one per-bucket totals row (Σy_en, Σy_rest, vocab count) —
    the driver folds ≤ 64 totals rows into the three scalars (n_en,
    n_rest, V), broadcasts them into a vectorized scoring map_batches
    over the reduced term table, and a per-batch partial top-k +
    repartition(1) final top-k hands the driver exactly k rows.  The
    corpus-sized exchange carries (term, slice, count) partials only."""
    import collections
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            s = "en" if lang == "en" else "rest"
            for tok in (txt or "").lower().split():
                c[(s, tok)] += 1
        keys = list(c.keys())
        return pa.table({
            "s": pa.array([x[0] for x in keys], pa.string()),
            "term": pa.array([x[1] for x in keys], pa.string()),
            "n": pa.array([c[x] for x in keys], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(x[1].encode()) % n_buckets for x in keys],
                pa.int32()),
        })

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        p = (g.groupby(["term", "s"])["n"].sum().unstack(fill_value=0))
        y_en = (p["en"] if "en" in p else pd.Series(0, index=p.index))
        y_rest = (p["rest"] if "rest" in p else pd.Series(0, index=p.index))
        out = pd.DataFrame({
            "term": p.index.astype(str),
            "y_en": y_en.to_numpy(np.int64),
            "y_rest": y_rest.to_numpy(np.int64),
            "is_total": np.int8(0),
        })
        total = pd.DataFrame({
            "term": [""], "y_en": [out["y_en"].sum()],
            "y_rest": [out["y_rest"].sum()], "is_total": [np.int8(1)],
        })
        # vocab size rides in the totals row's term slot as a count
        total["v"] = np.int64(len(out))
        out["v"] = np.int64(0)
        return pd.concat([out, total], ignore_index=True)

    # vocabulary-sized after the reduce — safe (and cheap) to pin once so
    # the totals fold and the scoring pass don't re-run the tokenize pass
    counted = (_read(sf_dir, "documents", ["lang", "text"])
               .map_batches(partial, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(bucket_counts, batch_format="pandas")
               .materialize())

    # fold the ≤64 per-bucket totals rows into the three global scalars
    tot = _concat_nonempty(
        counted.map_batches(
            lambda t: t.filter(pc.equal(t["is_total"], 1)).select(
                ["y_en", "y_rest", "v"]),
            batch_format="pyarrow"))
    n_en = int(pc.sum(tot["y_en"]).as_py() or 0)
    n_rest = int(pc.sum(tot["y_rest"]).as_py() or 0)
    vocab = int(pc.sum(tot["v"]).as_py() or 0)

    def _r6(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[(df["is_total"] == 0)
                & (df["y_en"] + df["y_rest"] >= min_count)]
        if not len(df):
            return pa.table({
                "term": pa.array([], pa.string()),
                "y_en": pa.array([], pa.int64()),
                "y_rest": pa.array([], pa.int64()),
                "lo_en_micro": pa.array([], pa.int64()),
                "lo_rest_micro": pa.array([], pa.int64()),
                "delta_micro": pa.array([], pa.int64()),
            })
        ye = df["y_en"].to_numpy(np.float64)
        yr = df["y_rest"].to_numpy(np.float64)
        lo_en = _r6(1e6 * np.log((ye + 1.0) / (n_en + vocab - ye - 1.0)))
        lo_rest = _r6(1e6 * np.log((yr + 1.0) / (n_rest + vocab - yr - 1.0)))
        out = pd.DataFrame({
            "term": df["term"].astype(str),
            "y_en": df["y_en"].astype("int64"),
            "y_rest": df["y_rest"].astype("int64"),
            "lo_en_micro": lo_en, "lo_rest_micro": lo_rest,
            "delta_micro": lo_en - lo_rest,
        })
        # partial top-k per batch — the final reduce sees ≤ k per batch
        out = out.sort_values(["delta_micro", "term"],
                              ascending=[False, True]).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("delta_micro", "descending"),
                          ("term", "ascending")])[:k]
        return t.take(idx)

    return (counted.map_batches(score, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def kcore_peel_counts(sf_dir: str, k: int = 4, rounds: int = 6,
                      fuse_nodes: int | None = None):
    """k-CORE DEGREE PEEL (Seidman 1983, cores in social networks — the
    standard crawl-graph density screen: pages outside the k-core are
    link-sparse periphery a quality-focused crawl can deprioritize) over
    the derived doc→doc link graph shared with :func:`pagerank_two_iter`
    and :func:`hits_scores` (u → (2u+1) mod N and (3u+2) mod N), treated
    as a SIMPLE UNDIRECTED graph (self-loops dropped, parallel edges and
    duplicate directions collapse to one edge).  Each round removes every
    node whose surviving-neighbor count is < k; the result is the peel
    trajectory (round, n_surviving) for rounds 0..``rounds`` — a fixed
    round count (not peel-to-fixpoint) so the operator is deterministic
    whether or not the cascade has converged.

    Scale shape — size-adaptive like :func:`bpe_merges`: at or below
    ``kcore_fuse_nodes`` (node ids are 8 bytes; the edge set is <= 2N)
    the whole peel runs vectorized in ONE Ray task on the id vector.
    Above it, each round is TWO coarse 64-way exchanges with no
    Dataset.join and no driver-side graph state (the hits_scores
    request/value discipline): exchange 1 keys node-presence rows and
    out-edge request rows by the TARGET id — a request resolving against
    a present target emits both directions' neighbor-claim rows;
    exchange 2 keys claims by node and counts DISTINCT neighbors (exact:
    a node lives in one bucket), keeping count >= k.  The survivor id
    table (8 bytes/node) materializes per round — the iterative-
    algorithm exception (kmeans_embeddings precedent); counts come from
    dataset metadata, never a driver-side collect.
    """
    cfg = DEFAULT_CONFIG
    if fuse_nodes is None:
        fuse_nodes = cfg.kcore_fuse_nodes
    n_docs = _table_num_rows(sf_dir, "documents")

    def _out(counts: list) -> pa.Table:
        return pa.table({
            "round": pa.array(range(len(counts)), pa.int64()),
            "n_surviving": pa.array(counts, pa.int64()),
        })

    ids = _read(sf_dir, "documents", ["doc_id"])

    if n_docs <= fuse_nodes:
        # fused tail: one task holds the 8-byte id vector + derived edges
        def peel_all(t: pa.Table) -> pa.Table:
            u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            e = np.concatenate([
                np.stack([u, (2 * u + 1) % n_docs], 1),
                np.stack([u, (3 * u + 2) % n_docs], 1)])
            e = e[e[:, 0] != e[:, 1]]
            lo = np.minimum(e[:, 0], e[:, 1])
            hi = np.maximum(e[:, 0], e[:, 1])
            pair = np.unique(lo * np.int64(n_docs) + hi)
            a, b = pair // n_docs, pair % n_docs
            alive = np.zeros(n_docs, bool)
            alive[u] = True
            counts = [int(alive.sum())]
            for _ in range(rounds):
                m = alive[a] & alive[b]
                deg = (np.bincount(a[m], minlength=n_docs)
                       + np.bincount(b[m], minlength=n_docs))
                alive = deg >= k
                counts.append(int(alive.sum()))
            return _out(counts)

        return ids.repartition(1).map_batches(
            peel_all, batch_format="pyarrow", batch_size=None)

    n_b = 64
    counts = [n_docs]
    cur = ids
    for _ in range(rounds):
        def expand(t: pa.Table) -> pa.Table:
            u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            v1 = (2 * u + 1) % n_docs
            v2 = (3 * u + 2) % n_docs
            key = np.concatenate([u, v1, v2])
            src = np.concatenate([u, u, u])
            kind = np.concatenate([np.zeros(u.size, np.int8),
                                   np.ones(2 * u.size, np.int8)])
            keep = (kind == 0) | (key != src)     # drop self-loops
            out = pd.DataFrame({"key": key[keep], "src": src[keep],
                                "kind": kind[keep]})
            out["bucket"] = (out["key"].to_numpy() & (n_b - 1)).astype(np.int32)
            return pa.Table.from_pandas(out, preserve_index=False)

        def resolve(g: pd.DataFrame) -> pd.DataFrame:
            present = g.loc[g["kind"] == 0, ["key"]].drop_duplicates()
            req = g.loc[g["kind"] == 1, ["key", "src"]]
            hit = req.merge(present, on="key", how="inner")
            # both directions of each surviving edge claim a neighbor
            out = pd.DataFrame({
                "node": np.concatenate([hit["src"].to_numpy(np.int64),
                                        hit["key"].to_numpy(np.int64)]),
                "nb": np.concatenate([hit["key"].to_numpy(np.int64),
                                      hit["src"].to_numpy(np.int64)]),
            })
            out["bucket"] = (out["node"].to_numpy() & (n_b - 1)).astype(np.int32)
            return out

        def degree_keep(g: pd.DataFrame) -> pd.DataFrame:
            d = (g.drop_duplicates(["node", "nb"])
                 .groupby("node", as_index=False)["nb"].count())
            d = d[d["nb"] >= k]
            return pd.DataFrame({"doc_id": d["node"].astype("int64")})

        cur = (cur.map_batches(expand, batch_format="pyarrow")
               .groupby("bucket").map_groups(resolve, batch_format="pandas")
               .groupby("bucket").map_groups(degree_keep,
                                             batch_format="pandas")
               .materialize())
        counts.append(cur.count())

    return _out(counts)


def rrf_hybrid_search(sf_dir: str, query: str = "table hash join",
                      depth: int = 20, k: int = 10, rrf_k: int = 60):
    """HYBRID LEXICAL+SEMANTIC RETRIEVAL via Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher 2009 — the standard way production
    search stacks combine a BM25 list with an embedding-ANN list without
    score calibration): fuse the :func:`bm25_search` top-``depth`` and
    the :func:`ocr_ray.pipelines.simsearch.knn_cosine` top-``depth``
    (query = vec_id 0's embedding; doc_id and vec_id share the id
    space) by integer RRF credit 10^9 // (rrf_k + rank).  Ranks are
    dense 1-based positions under each list's own deterministic order
    (BM25: score_e6 desc, doc_id asc; kNN: 6-dp-rounded sim desc,
    vec_id asc — the rounding both sides already pin), so the fused
    scores are exact integer sums and bit-stable at any parallelism.
    Returns the top-``k`` by (rrf_e9 desc, doc_id asc) with each
    source's rank (0 = absent from that list).

    Scale shape: both inputs are the existing distributed searches whose
    bounded reduces hand the driver exactly ``depth`` rows each; fusion
    is O(depth) driver arithmetic — nothing corpus-sized moves.
    """
    from .simsearch import knn_cosine

    bm_blocks = ray.get(bm25_search(sf_dir, query, k=depth).to_arrow_refs())
    bm = pa.concat_tables([b for b in bm_blocks
                           if b.num_columns and b.num_rows])
    import pyarrow.parquet as pq

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = pq.read_table(emb_path, columns=["vec_id", "embedding"],
                         filters=[("vec_id", "==", 0)])["embedding"][0].as_py()
    kn = knn_cosine(
        rd.read_parquet(emb_path, columns=["vec_id", "embedding"]),
        qvec, k=depth)

    credit = {}
    bm_rank, kn_rank = {}, {}
    for r, did in enumerate(bm["doc_id"].to_pylist(), start=1):
        bm_rank[did] = r
        credit[did] = credit.get(did, 0) + 10**9 // (rrf_k + r)
    for r, did in enumerate(kn["vec_id"].to_pylist(), start=1):
        kn_rank[did] = r
        credit[did] = credit.get(did, 0) + 10**9 // (rrf_k + r)
    fused = sorted(credit.items(), key=lambda x: (-x[1], x[0]))[:k]
    return pa.table({
        "doc_id": pa.array([d for d, _ in fused], pa.int64()),
        "rrf_e9": pa.array([c for _, c in fused], pa.int64()),
        "bm25_rank": pa.array([bm_rank.get(d, 0) for d, _ in fused],
                              pa.int64()),
        "knn_rank": pa.array([kn_rank.get(d, 0) for d, _ in fused],
                             pa.int64()),
    })


def hll_distinct_users(sf_dir: str, p: int = 8):
    """HYPERLOGLOG count-distinct (Flajolet et al. 2007 — public method;
    the industry-standard fixed-memory cardinality sketch) per
    event_type over ``events.user_id``, INTEGER-EXACT so the DuckDB
    oracle reproduces the estimate bit-for-bit — the one thing the KMV
    docstring (:func:`approx_distinct_users`) said HLL couldn't do.
    The trick is twofold:

      * the harmonic-mean denominator Σ 2^-M_j is scaled by 2^57 into
        the integer S = Σ 2^(57-M_j) (≤ 2^65 — HUGEINT territory, and
        arbitrary-precision Python int here);
      * the bias constant alpha_256 = 0.7213/(1 + 1.079/256) is kept as
        the exact RATIONAL 1846528/2570790, so the raw estimate is one
        floor division: (1846528 · m² · 2^57) // (2570790 · S).

    Register assignment: h = md5-lower-64(user_id) (:func:`_md5_u64`,
    the repo-wide DuckDB twin of ``md5_number_lower``), register
    j = h % 256, payload w = h >> 8 (56 bits), rank
    rho = trailing-zero-count(w) + 1 (w = 0 → 57).  Trailing zeros
    (not HLL's textbook leading zeros) because both sides compute them
    branch-free from the SAME integers: numpy ``log2(w & -w)`` (exact —
    the operand is a power of two) and DuckDB
    ``bit_count((w & (-w)) - 1)``.  Returns per event_type:

      ``(event_type, n_exact, hll_est, v_zero)``

    with the RAW estimator only (no small/large-range correction —
    documented operator semantics; v_zero, the untouched-register
    count, is emitted so a consumer can apply linear counting).

    Scale shape: the register table is the whole point — per batch, a
    drop_duplicates + one vectorized hash pass emits ≤ types·256
    (event_type, j, rho) partial rows, and ``groupby().max()`` sees
    ≤ types·256 keys; sketches merge by register max, so the result is
    partition- and order-invariant.  The exact side co-partitions
    DISTINCT (user, type) pairs on the standing 64-way user bucket and
    ships per-bucket nunique counts only.  Driver state: two bounded
    tables (types·256 registers + types·64 partial counts)."""
    from ray.data.aggregate import Max, Sum

    m = 1 << p
    rmax = 64 - p + 1  # 57 at p=8

    def reg_partial(t: pa.Table) -> pa.Table:
        df = (pa.table({"event_type": t["event_type"],
                        "user_id": t["user_id"]}).to_pandas()
                .drop_duplicates())
        h = _md5_u64(df["user_id"])
        j = (h % np.uint64(m)).astype(np.int64)
        w = (h >> np.uint64(p)).astype(np.int64)
        lsb = (w & -w).astype(np.float64)
        with np.errstate(divide="ignore"):
            rho = np.where(w == 0, rmax,
                           np.log2(lsb).round().astype(np.int64) + 1)
        out = (pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                             "j": j, "rho": rho.astype(np.int64)})
                 .groupby(["event_type", "j"], as_index=False)["rho"].max())
        return pa.table({
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "j": pa.array(out["j"].to_numpy(), pa.int64()),
            "rho": pa.array(out["rho"].to_numpy(), pa.int64()),
        })

    regs = _concat_nonempty(
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(reg_partial, batch_format="pyarrow")
        .groupby(["event_type", "j"])
        .aggregate(Max("rho", alias_name="rho"))).to_pandas()

    def exact_partial(t: pa.Table) -> pa.Table:
        df = (pa.table({"event_type": t["event_type"],
                        "user_id": t["user_id"]}).to_pandas()
                .drop_duplicates())
        df["bucket"] = (df["user_id"].to_numpy() % 64).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_nd(g: pd.DataFrame) -> pd.DataFrame:
        nd = (g.drop_duplicates(["event_type", "user_id"])
                .groupby("event_type", as_index=False)["user_id"].count())
        return pd.DataFrame({"event_type": nd["event_type"],
                             "nd": nd["user_id"].astype("int64")})

    exact_tbl = _concat_nonempty(
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(exact_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_nd, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("nd", alias_name="n_exact"))).to_pandas()
    exact = dict(zip(exact_tbl["event_type"], exact_tbl["n_exact"]))

    types = sorted(exact)
    n_exact, ests, vzeros = [], [], []
    for et in types:
        g = regs[regs["event_type"] == et]
        mj = np.zeros(m, dtype=np.int64)
        mj[g["j"].to_numpy()] = g["rho"].to_numpy()
        s = int(sum(1 << (rmax - int(r)) for r in mj))
        est = (1846528 * m * m << rmax) // (2570790 * s)
        n_exact.append(int(exact[et]))
        ests.append(est)
        vzeros.append(int((mj == 0).sum()))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_exact": pa.array(n_exact, pa.int64()),
        "hll_est": pa.array(ests, pa.int64()),
        "v_zero": pa.array(vzeros, pa.int64()),
    })


_PII_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"),
    ("phone", r"\b555-[0-9][0-9][0-9][0-9]\b"),
    ("ssn", r"\b[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]\b"),
)


def pii_scrub_stats(sf_dir: str):
    """PII DETECTION/REDACTION audit (the scrub pass every public
    training-data pipeline runs — C4's and CCNet's published cleanup
    stage; reference analogue: the regex structured-field extractors,
    ``additional_step_2.py`` field regexes): count, per PII class, the
    matches, the documents touched, and the characters a redaction
    would remove.  Returns per class:

      ``(pii_type, n_matches, n_docs, chars_redacted)``

    The synthetic corpus contains no organic PII, so deterministic
    payloads are INJECTED before scanning (the dup_cluster_sizes /
    line_dedup oracle-injection convention): doc_id % 7 == 0 appends
    `` contact user<doc_id>@example.com``, % 11 == 0 appends
    `` call 555-<doc_id % 10000, 4 digits>``, % 13 == 0 appends
    `` ref <3>-<2>-<4 digits of doc_id padded>`` — so every class has
    non-trivial, overlapping-document coverage and the oracle rebuilds
    the exact same text in SQL.

    Patterns are the RE2∩Python-re common dialect (character classes
    and explicit repeats only — no lookaround, no {m,n} ambiguity), so
    ``Series.str.count`` here and ``regexp_extract_all`` in DuckDB see
    identical non-overlapping left-to-right matches.

    Scale shape: embarrassingly parallel — one vectorized
    str.count/str.contains/str.replace pass per batch emits |classes|
    partial rows; the groupby sums |classes| keys; the driver receives
    three rows.  Payload text never crosses the exchange."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = pd.Series(t["text"].to_pylist()).fillna("")
        add = pd.Series([""] * len(txt))
        m7 = ids % 7 == 0
        add[m7] = add[m7] + pd.Series(
            [f" contact user{i}@example.com" for i in ids[m7]],
            index=add.index[m7])
        m11 = ids % 11 == 0
        add[m11] = add[m11] + pd.Series(
            [f" call 555-{i % 10000:04d}" for i in ids[m11]],
            index=add.index[m11])
        m13 = ids % 13 == 0
        add[m13] = add[m13] + pd.Series(
            [f" ref {i % 1000:03d}-{i % 100:02d}-{i % 10000:04d}"
             for i in ids[m13]], index=add.index[m13])
        txt = txt + add
        names, n_match, n_doc, n_red = [], [], [], []
        for name, pat in _PII_PATTERNS:
            c = txt.str.count(pat)
            names.append(name)
            n_match.append(int(c.sum()))
            n_doc.append(int((c > 0).sum()))
            n_red.append(int((txt.str.len()
                              - txt.str.replace(pat, "", regex=True)
                                   .str.len()).sum()))
        return pa.table({
            "pii_type": pa.array(names, pa.string()),
            "n_matches": pa.array(n_match, pa.int64()),
            "n_docs": pa.array(n_doc, pa.int64()),
            "chars_redacted": pa.array(n_red, pa.int64()),
        })

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pii_type")
        .aggregate(Sum("n_matches", alias_name="n_matches"),
                   Sum("n_docs", alias_name="n_docs"),
                   Sum("chars_redacted", alias_name="chars_redacted"))
    )


def oov_rate_by_lang(sf_dir: str, vocab_size: int = 200):
    """TOKENIZER-COVERAGE evaluation: out-of-vocabulary rate per
    language against the corpus's own global top-``vocab_size``
    token vocabulary (the eval a tokenizer-training pipeline runs
    before committing to a vocab — SentencePiece's coverage report,
    public method).  Returns per lang:

      ``(lang, n_tokens, n_oov, oov_bp)``

    with oov_bp the integer basis points (n_oov · 10000) // n_tokens
    (the repo-wide integer-parity convention — no float rates).

    Scale shape: two bounded passes sharing the :func:`top_terms`
    machinery — pass 1's heavy-hitter reduce hands the driver exactly
    ``vocab_size`` rows (count desc, token asc tie-break, mirrored in
    SQL); the vocabulary rides into the pass-2 closure as a frozenset
    (tiny — broadcast by value), where one Counter pass per batch
    emits ≤ |langs| (lang, n_tokens, n_oov) partial rows; the final
    groupby sees |langs| keys.  Token instances never cross the wire."""
    from ray.data.aggregate import Sum

    vocab_tbl = _concat_nonempty(top_terms(sf_dir, k=vocab_size))
    vocab = frozenset(vocab_tbl["token"].to_pylist())

    def partial(t: pa.Table) -> pa.Table:
        langs, n_tok, n_oov = [], [], []
        agg: dict[str, list[int]] = {}
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            toks = (txt or "").lower().split()
            cur = agg.setdefault(lang or "", [0, 0])
            cur[0] += len(toks)
            cur[1] += sum(1 for tk in toks if tk not in vocab)
        for lang in agg:
            langs.append(lang)
            n_tok.append(agg[lang][0])
            n_oov.append(agg[lang][1])
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
        })

    def finalize(t: pa.Table) -> pa.Table:
        bp = ((t["n_oov"].to_numpy() * 10000)
              // np.maximum(t["n_tokens"].to_numpy(), 1))
        return t.append_column("oov_bp", pa.array(bp, pa.int64()))

    return (
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("n_oov", alias_name="n_oov"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def unicode_normalize_stats(sf_dir: str):
    """UNICODE NFC-NORMALIZATION audit (the cleanup pass every public
    text pipeline runs before tokenization — CCNet's and OSCAR's
    published normalization stage): how many documents change under
    NFC, how many code points composition saves, and how much
    zero-width junk a cleanup would strip.  Returns ONE row:

      ``(n_docs, n_nfc_changed, chars_delta_nfc, n_zero_width,
         docs_with_zw)``

    The synthetic corpus is ASCII (NFC-invariant), so deterministic
    non-ASCII payloads are INJECTED before scanning (the
    pii_scrub_stats convention): doc_id % 17 == 0 appends
    `` cafe<U+0301>`` (combining acute — NFC composes it, one code
    point shorter) and doc_id % 19 == 0 appends ``<U+200B>x<U+200B>``
    (two zero-width spaces).  Both sides rebuild the same text: here
    with the vectorized ``Series.str.normalize("NFC")``, the oracle
    with DuckDB ``nfc_normalize`` — both implement the same Unicode
    standard and ``length()`` counts code points on both sides.

    Scale shape: embarrassingly parallel — one vectorized normalize +
    count pass per batch emits a single 5-int partial row; the final
    fold sums ≤ #blocks tiny rows.  Text never crosses the exchange."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = pd.Series(t["text"].to_pylist()).fillna("")
        m17 = ids % 17 == 0
        txt[m17] = txt[m17] + " cafe\u0301"
        m19 = ids % 19 == 0
        txt[m19] = txt[m19] + "\u200bx\u200b"
        norm = txt.str.normalize("NFC")
        changed = norm != txt
        delta = (txt.str.len() - norm.str.len()).sum()
        zw = txt.str.count("\u200b")
        return pa.table({
            "n_docs": pa.array([len(txt)], pa.int64()),
            "n_nfc_changed": pa.array([int(changed.sum())], pa.int64()),
            "chars_delta_nfc": pa.array([int(delta)], pa.int64()),
            "n_zero_width": pa.array([int(zw.sum())], pa.int64()),
            "docs_with_zw": pa.array([int((zw > 0).sum())], pa.int64()),
        })

    cols = ["n_docs", "n_nfc_changed", "chars_delta_nfc",
            "n_zero_width", "docs_with_zw"]
    agg = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )
    return pa.table({c: pa.array([int(agg[c])], pa.int64()) for c in cols})


def global_row_id_stats(sf_dir: str, n_buckets: int = 64):
    """GLOBAL MONOTONIC ROW-ID assignment (the distributed zipWithIndex
    — the primitive behind "give every document a stable contiguous id
    before sharding", which Ray Data has no native operator for) via
    the classic two-pass RANGE-BUCKET PREFIX-SUM:

      pass 1: per-batch counts per range bucket of doc_id (min/max from
        a cheap aggregate; width = ceil(span / n_buckets)) — the driver
        folds n_buckets count rows into exclusive prefix OFFSETS;
      pass 2: one shuffle on the range bucket (rows carry (doc_id,
        lang, bucket) — ids only, never text); inside each bucket one
        vectorized argsort assigns id = offset[bucket] + local_rank,
        then per-(bucket, lang) partials reduce to per-lang stats.

    Assigned id == rank(doc_id) (0-based, dense over the corpus), BY
    CONSTRUCTION identical at any partitioning/parallelism — the ids
    themselves stay distributed; the query returns the per-lang audit:

      ``(lang, n_docs, sum_global_id, min_global_id, max_global_id)``

    (sum_global_id is the checksum that catches any off-by-one or
    overlap between buckets; it is Σ over ~N²/2 at corpus scale, so a
    10^12-doc run would need the int128 variant — documented bound).

    Scale shape: pass 1 ships n_buckets ints per batch; the pass-2
    exchange is the ONE shuffle and carries two ints per row; map_groups
    sees exactly n_buckets groups (the coarse-bucket discipline); the
    driver holds n_buckets offsets + |langs| result rows."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    mm = ds.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(mm["min(doc_id)"]), int(mm["max(doc_id)"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def count_partial(t: pa.Table) -> pa.Table:
        b = ((t["doc_id"].to_numpy() - lo) // width).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    counts = _concat_nonempty(
        ds.map_batches(count_partial, batch_format="pyarrow")
          .groupby("bucket").aggregate(Sum("c", alias_name="c"))).to_pandas()
    offs = np.zeros(n_buckets + 1, dtype=np.int64)
    offs[counts["bucket"].to_numpy() + 1] = counts["c"].to_numpy()
    offs = np.cumsum(offs)
    offsets = {int(b): int(offs[b]) for b in range(n_buckets + 1)}

    def tag(t: pa.Table) -> pa.Table:
        b = ((t["doc_id"].to_numpy() - lo) // width).astype(np.int32)
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "bucket": pa.array(b, pa.int32())})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        gid = np.empty(len(ids), dtype=np.int64)
        gid[order] = offsets[int(g["bucket"].iloc[0])] + np.arange(len(ids))
        out = pd.DataFrame({"lang": g["lang"].to_numpy(), "gid": gid})
        return (out.groupby("lang", as_index=False)
                   .agg(n_docs=("gid", "size"), sum_global_id=("gid", "sum"),
                        min_global_id=("gid", "min"),
                        max_global_id=("gid", "max"))
                   .astype({"n_docs": "int64", "sum_global_id": "int64"}))

    def finalize(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby("lang", as_index=False)
                .agg(n_docs=("n_docs", "sum"),
                     sum_global_id=("sum_global_id", "sum"),
                     min_global_id=("min_global_id", "min"),
                     max_global_id=("max_global_id", "max")))
        return pa.Table.from_pandas(
            df.astype({c: "int64" for c in df.columns if c != "lang"}),
            preserve_index=False)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(assign, batch_format="pandas")
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def table_profile(sf_dir: str, n_buckets: int = 64):
    """DATA-PROFILING operator (the Deequ/Great-Expectations analyzer a
    curation engine runs before trusting a new crawl drop): per column of
    ``events`` — plus a derived NULLABLE column ``k_nullable`` (props.k,
    nulled where k % 5 == 0, so the null path is exercised) — emit

      ``(col_name, n_rows, n_null, n_distinct, min_int, max_int, sum_len)``

    with numerics integer-canonical (doubles → cents, timestamps → epoch
    micros) and strings profiled by LENGTH (min/max/sum).  n_distinct is
    EXACT and distributed: per-batch ``np.unique`` pre-dedup, then one
    coarse-bucket exchange of (col, key) pairs — each distinct pair lands
    in exactly one md5 bucket, so per-bucket nunique sums are exact.

    Scale shape: pass 1 ships ≤7 partial rows per batch into a 7-key
    groupby; pass 2's exchange carries only per-batch-UNIQUE short keys
    (bounded by column cardinality × n_batches, the classic exact-distinct
    topology); the driver folds ≤ n_buckets×7 + 7 rows.  Two passes are
    two independent read lineages (no shared-upstream union)."""
    from ray.data.aggregate import Max, Min, Sum

    def derived(t: pa.Table) -> "pd.DataFrame":
        df = t.to_pandas()
        k = df["props"].str.extract(r'"k": (\d+)', expand=False).astype("int64")
        df["k_nullable"] = k.where(k % 5 != 0)
        df["value_cents"] = _cents(t["value"]).to_pandas()
        df["ts_us"] = t["ts"].cast(pa.int64()).to_pandas()
        return df

    INT_COLS = ("event_id", "user_id", "value_cents", "ts_us", "k_nullable")
    STR_COLS = ("event_type", "props")

    def stat_partial(t: pa.Table) -> pa.Table:
        df = derived(t)
        rows = []
        for c in INT_COLS:
            s = df[c]
            nn = s.dropna()
            rows.append((c, len(s), int(s.isna().sum()),
                         int(nn.min()) if len(nn) else None,
                         int(nn.max()) if len(nn) else None, 0))
        for c in STR_COLS:
            ln = df[c].str.len()
            rows.append((c, len(df), int(df[c].isna().sum()),
                         int(ln.min()), int(ln.max()), int(ln.sum())))
        out = pd.DataFrame(rows, columns=[
            "col_name", "n_rows", "n_null", "mn", "mx", "slen"])
        # None (all-null batch) must stay a nullable float, not object
        out["mn"] = out["mn"].astype("float64")
        out["mx"] = out["mx"].astype("float64")
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = _concat_nonempty(
        _read(sf_dir, "events")
        .map_batches(stat_partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("n_null", alias_name="n_null"),
                   Min("mn", alias_name="min_int"),
                   Max("mx", alias_name="max_int"),
                   Sum("slen", alias_name="sum_len"))).to_pandas()

    def distinct_partial(t: pa.Table) -> pa.Table:
        df = derived(t)
        cols, keys = [], []
        for c in INT_COLS + STR_COLS:
            u = df[c].dropna().astype(str).unique()
            cols.extend([c] * len(u))
            keys.extend(u.tolist())
        b = _md5_mod([f"{c}\x00{k}" for c, k in zip(cols, keys)], n_buckets)
        return pa.table({"col_name": pa.array(cols, pa.string()),
                         "key": pa.array(keys, pa.string()),
                         "bucket": pa.array(b, pa.int64())})

    def bucket_nunique(g: "pd.DataFrame") -> "pd.DataFrame":
        d = (g.drop_duplicates(["col_name", "key"])
              .groupby("col_name", as_index=False).size()
              .rename(columns={"size": "d"}))
        return d.astype({"d": "int64"})

    dcounts = _concat_nonempty(
        _read(sf_dir, "events")
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_nunique, batch_format="pandas")
        .repartition(1)).to_pandas()
    dist = dcounts.groupby("col_name", as_index=False)["d"].sum().rename(
        columns={"d": "n_distinct"})

    out = stats.merge(dist, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out[["col_name", "n_rows", "n_null", "n_distinct",
               "min_int", "max_int", "sum_len"]].sort_values("col_name")
    for c in ("n_rows", "n_null", "sum_len"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False).cast(pa.schema([
        ("col_name", pa.string()), ("n_rows", pa.int64()),
        ("n_null", pa.int64()), ("n_distinct", pa.int64()),
        ("min_int", pa.int64()), ("max_int", pa.int64()),
        ("sum_len", pa.int64())]))


# ---------------------------------------------------------------------------
# shallow text features shared by the stump trainer / PSI drift monitor
# ---------------------------------------------------------------------------

_SHALLOW_FEATS = (("chars", 256), ("digit", 8), ("upper", 8), ("nonascii", 4))


def _shallow_feature_values(txt) -> dict:
    """Per-doc integer text features, all RE2-counted so the DuckDB
    regexp_replace oracle counts the identical codepoints: total length,
    digit count, uppercase-ASCII count, non-ASCII codepoint count."""
    return {
        "chars": pc.utf8_length(txt).to_numpy(zero_copy_only=False)
            .astype(np.int64),
        "digit": pc.count_substring_regex(txt, pattern="[0-9]")
            .to_numpy(zero_copy_only=False).astype(np.int64),
        "upper": pc.count_substring_regex(txt, pattern="[A-Z]")
            .to_numpy(zero_copy_only=False).astype(np.int64),
        "nonascii": pc.count_substring_regex(txt, pattern=r"[^\x00-\x7F]")
            .to_numpy(zero_copy_only=False).astype(np.int64),
    }


def decision_stump_train(sf_dir: str, top_k: int = 10, n_bins: int = 64):
    """SUPERVISED ML — EXACT SPLIT SEARCH: train a decision stump (the
    1-level tree every boosting round fits) predicting ``lang == 'en'``
    from shallow text-count features, by exhaustive search over every
    (feature, threshold) candidate on quantized feature histograms.

    The search criterion is STUMP ACCURACY — the integer count of docs a
    majority-vote leaf pair classifies correctly — so the whole
    selection is integer arithmetic with zero float anywhere (unlike
    Gini, whose cross-feature comparison needs rational cross-products).
    Output: the ``top_k`` candidate splits ranked by
    (n_correct desc, feature, threshold) with their leaf counts and
    accuracy in basis points.

    Scale shape: ONE embarrassingly-parallel pass histograms each batch
    locally (``np.bincount`` per feature → ≤ |features|·n_bins rows per
    batch); the groupby sees only (feature, bucket) keys; the driver
    folds a ≤ 256-row table and sweeps all thresholds with cumulative
    sums.  Nothing corpus-sized moves: at 10^12 docs the exchange still
    carries ≤ 256 rows per input block.  Mirrors the reference's
    filter-threshold tuning loop (policy_filter.py dollar/keyword
    thresholds) as a principled trained gate."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        vals = _shallow_feature_values(txt)
        pos = pc.cast(pc.fill_null(pc.equal(t["lang"], "en"), False),
                      pa.int64()).to_numpy(zero_copy_only=False)
        feats, buckets, ns, nps = [], [], [], []
        for name, width in _SHALLOW_FEATS:
            b = np.minimum(vals[name] // width, n_bins - 1)
            n = np.bincount(b, minlength=n_bins)
            p = np.bincount(b, weights=pos, minlength=n_bins)
            occ = np.nonzero(n)[0]
            feats.extend([name] * len(occ))
            buckets.extend(occ.tolist())
            ns.extend(n[occ].tolist())
            nps.extend(p[occ].astype(np.int64).tolist())
        return pa.table({
            "feature": pa.array(feats, pa.string()),
            "bucket": pa.array(buckets, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "n_pos": pa.array(nps, pa.int64()),
        })

    hist = _concat_nonempty(
        _read(sf_dir, "documents", ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["feature", "bucket"])
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
    ).to_pandas()

    n_tot = int(hist[hist["feature"] == "chars"]["n"].sum())
    p_tot = int(hist[hist["feature"] == "chars"]["n_pos"].sum())
    rows = []
    for name, _w in _SHALLOW_FEATS:
        sub = hist[hist["feature"] == name]
        n = np.zeros(n_bins, dtype=np.int64)
        p = np.zeros(n_bins, dtype=np.int64)
        n[sub["bucket"].to_numpy()] = sub["n"].to_numpy()
        p[sub["bucket"].to_numpy()] = sub["n_pos"].to_numpy()
        cn, cp = np.cumsum(n), np.cumsum(p)
        for t in range(n_bins - 1):
            n_l, p_l = int(cn[t]), int(cp[t])
            n_r, p_r = n_tot - n_l, p_tot - p_l
            correct = max(p_l, n_l - p_l) + max(p_r, n_r - p_r)
            rows.append((name, t, n_l, n_r, correct))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    rows = rows[:top_k]
    return pa.table({
        "feature": pa.array([r[0] for r in rows], pa.string()),
        "threshold": pa.array([r[1] for r in rows], pa.int64()),
        "n_left": pa.array([r[2] for r in rows], pa.int64()),
        "n_right": pa.array([r[3] for r in rows], pa.int64()),
        "n_correct": pa.array([r[4] for r in rows], pa.int64()),
        "accuracy_bp": pa.array(
            [10000 * r[4] // n_tot for r in rows], pa.int64()),
        "rk": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
    })


def psi_feature_drift(sf_dir: str, n_bins: int = 16):
    """DATA-QUALITY DRIFT MONITOR: population stability index of each
    corpus slice (``source``) against the pooled corpus, per shallow
    text feature — the production check that a new crawl batch hasn't
    shifted the length/digit/non-ASCII distribution before it enters the
    training mix.

    PSI(f, s) = Σ_b (p_b − q_b) · ln(p_b / q_b) over ``n_bins``
    fixed-width buckets, add-1 smoothed on both sides.  Integer
    discipline: per bucket, the density gap rounds to 1e-9 units and the
    log-ratio to micro-nats SEPARATELY (half-away, ``math.log`` = libm =
    DuckDB ``ln``), the product sums exactly in int64 (each term ≥ 0 —
    rounding preserves the shared sign), and the reported ``psi_e9``
    floors the 1e-15-unit sum.  Output: (source, feature, n_docs,
    psi_e9), one row per slice × feature.

    Scale shape: one histogram pass (per-batch ``np.bincount`` per
    (source, feature) via a composite key), a groupby over ≤
    |sources|·|features|·n_bins keys, and a driver fold of that bounded
    table — the corpus never shuffles."""
    import math

    from ray.data.aggregate import Sum

    feats = tuple((f, w) for f, w in _SHALLOW_FEATS if f != "upper")

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        vals = _shallow_feature_values(txt)
        src = np.asarray(t["source"].to_pylist())
        order = np.argsort(src, kind="stable")
        s_sorted = src[order]
        bounds = np.flatnonzero(
            np.r_[True, s_sorted[1:] != s_sorted[:-1], True])
        srcs, fnames, buckets, ns = [], [], [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            idx = order[lo:hi]
            for name, width in feats:
                b = np.minimum(vals[name][idx] // width, n_bins - 1)
                n = np.bincount(b, minlength=n_bins)
                occ = np.nonzero(n)[0]
                srcs.extend([s_sorted[lo]] * len(occ))
                fnames.extend([name] * len(occ))
                buckets.extend(occ.tolist())
                ns.extend(n[occ].tolist())
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "feature": pa.array(fnames, pa.string()),
            "bucket": pa.array(buckets, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        })

    hist = _concat_nonempty(
        _read(sf_dir, "documents", ["text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "feature", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()

    def _half_away(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    pooled = hist.groupby(["feature", "bucket"])["n"].sum().to_dict()
    n_by_src = (hist[hist["feature"] == feats[0][0]]
                .groupby("source")["n"].sum().to_dict())
    n_all = int(sum(n_by_src.values()))
    per_sf = hist.groupby(["source", "feature", "bucket"])["n"].sum().to_dict()

    out_rows = []
    for s in sorted(n_by_src):
        n_s = int(n_by_src[s])
        for name, _w in feats:
            psi_e15 = 0
            for b in range(n_bins):
                cnt = int(per_sf.get((s, name, b), 0))
                call = int(pooled.get((name, b), 0))
                p = (cnt + 1.0) / (n_s + n_bins)
                q = (call + 1.0) / (n_all + n_bins)
                l_e6 = _half_away(1000000.0 * math.log(p / q))
                d_e9 = _half_away(1000000000.0 * (p - q))
                psi_e15 += d_e9 * l_e6
            out_rows.append((s, name, n_s, psi_e15 // 1_000_000))
    return pa.table({
        "source": pa.array([r[0] for r in out_rows], pa.string()),
        "feature": pa.array([r[1] for r in out_rows], pa.string()),
        "n_docs": pa.array([r[2] for r in out_rows], pa.int64()),
        "psi_e9": pa.array([r[3] for r in out_rows], pa.int64()),
    })


def score_auc_eval(sf_dir: str, pos_lang: str = "en", n_buckets: int = 64):
    """EXACT tie-aware ROC-AUC (the Mann-Whitney U form — the standard
    eval for every quality/classifier score a curation pipeline trains)
    of ``n_chars`` as a predictor of ``lang == pos_lang``, computed
    distributed and INTEGER-EXACT:

      AUC = (#(pos > neg) + 0.5 · #ties) / (n_pos · n_neg)
          = pair_num_x2 / (2 · n_pos · n_neg),
      pair_num_x2 = Σ_v pos_v · (2 · neg_below(v) + neg_v)

    over distinct score values v — all integers, no float until the one
    final division (reported half-away-rounded as ``auc_e9``).

    Topology (the global_row_id_stats range-bucket prefix-carry): a
    cheap min/max aggregate fixes score range buckets; per-batch
    np.unique partials ship (bucket, score, pos, neg) counts — bounded
    by per-batch score cardinality, never rows; ONE coarse exchange
    groups by range bucket where each group's in-bucket cumulative term
    and (n_pos, n_neg) totals compute vectorized; the repartition(1)
    tail (≤ n_buckets rows) applies the exclusive cross-bucket
    neg-below carries in score order.  Output one row:
    ``(n_pos, n_neg, pair_num_x2, auc_e9)``."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "documents", ["n_chars", "lang"])
    mm = ds.aggregate(Min("n_chars"), Max("n_chars"))
    lo, hi = int(mm["min(n_chars)"]), int(mm["max(n_chars)"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def partial(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy().astype(np.int64)
        p = pc.equal(t["lang"], pos_lang).to_numpy(zero_copy_only=False)
        key = v * 2 + p.astype(np.int64)      # (score, label) pair key
        u, c = np.unique(key, return_counts=True)
        uv, up = u >> 1, (u & 1).astype(bool)
        return pa.table({
            "bucket": pa.array((uv - lo) // width, pa.int64()),
            "v": pa.array(uv, pa.int64()),
            "pos": pa.array(np.where(up, c, 0).astype(np.int64), pa.int64()),
            "neg": pa.array(np.where(up, 0, c).astype(np.int64), pa.int64()),
        })

    def bucket_term(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby("v", as_index=False)[["pos", "neg"]].sum()
              .sort_values("v"))
        posv = m["pos"].to_numpy(np.int64)
        negv = m["neg"].to_numpy(np.int64)
        neg_below = np.concatenate(([0], np.cumsum(negv)[:-1]))
        t_local = int((posv * (2 * neg_below + negv)).sum())
        return pd.DataFrame({
            "bucket": pd.array([int(g["bucket"].iloc[0])], "int64"),
            "n_pos": pd.array([int(posv.sum())], "int64"),
            "n_neg": pd.array([int(negv.sum())], "int64"),
            "t_local": pd.array([t_local], "int64")})

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("bucket")
        n_pos = int(df["n_pos"].sum())
        n_neg = int(df["n_neg"].sum())
        neg_before = np.concatenate(
            ([0], np.cumsum(df["n_neg"].to_numpy(np.int64))[:-1]))
        # Python ints from here: pair_num_x2 · 1e9 exceeds int64 at scale
        num2 = int(df["t_local"].sum()) + 2 * int(
            (df["n_pos"].to_numpy(np.int64) * neg_before).sum())
        d = 2 * n_pos * n_neg
        auc_e9 = (2 * 10**9 * num2 + d) // (2 * d)
        return pa.table({"n_pos": pa.array([n_pos], pa.int64()),
                         "n_neg": pa.array([n_neg], pa.int64()),
                         "pair_num_x2": pa.array([num2], pa.int64()),
                         "auc_e9": pa.array([auc_e9], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_term, batch_format="pandas")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow", batch_size=None))


def ndcg_eval(sf_dir: str, query: str = "table hash join", k: int = 10):
    """NDCG@k of the BM25 ranking — the standard graded ranking-quality
    eval closing the retrieval loop (bm25_search produces the ranking,
    this scores it).  Graded relevance is deterministic: rel(doc) =
    number of DISTINCT query terms present (0..|query|).  Gains use the
    natural-log DCG variant (2^rel − 1)/ln(r + 1), each position's gain
    rounded half-away to integer e9-units BEFORE the sum (the repo's
    integer-parity convention — Ray and the oracle sum identical ints),
    and NDCG is the one final integer division.

    Topology: the ranking is the already-bounded bm25_search top-k (k
    rows to the driver — the 'pre-reduced bounded table' convention);
    ONE corpus pass then emits ≤ 2k short rows per batch — the ranked
    docs' relevance (kind 0) and the per-batch top-k relevance partial
    for the ideal ranking (kind 1) — into a repartition(1) tail that
    assembles DCG, IDCG and their ratio.  Output one row:
    ``(dcg_e9, idcg_e9, ndcg_e9)``."""
    import math

    terms = sorted({t for t in query.lower().split() if t})
    top = bm25_search(sf_dir, query, k=k).to_pandas()
    rank = {int(d): i + 1 for i, d in enumerate(top["doc_id"])}

    def _half_away(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    tset = set(terms)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        rels = np.fromiter(
            (len(tset & set((tx or "").lower().split()))
             for tx in t["text"].to_pylist()), np.int64, len(ids))
        out_id = [did for did in ids if did in rank]
        out_rel = [int(rels[i]) for i, did in enumerate(ids) if did in rank]
        out_kind = [0] * len(out_id)
        for rv in np.sort(rels)[::-1][:k]:
            out_id.append(-1)
            out_rel.append(int(rv))
            out_kind.append(1)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "rel": pa.array(out_rel, pa.int64()),
                         "kind": pa.array(out_kind, pa.int8())})

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ranked = df[df["kind"] == 0]
        relmap = dict(zip(ranked["doc_id"], ranked["rel"]))
        dcg = sum(_half_away(1e9 * (2.0 ** float(relmap[d]) - 1.0)
                             / float(np.log(r + 1.0)))
                  for d, r in rank.items())
        ideal = np.sort(df[df["kind"] == 1]["rel"].to_numpy(np.int64))[::-1][:k]
        idcg = sum(_half_away(1e9 * (2.0 ** float(rv) - 1.0)
                              / float(np.log(i + 2.0)))
                   for i, rv in enumerate(ideal))
        ndcg = (2 * 10**9 * dcg + idcg) // (2 * idcg)
        return pa.table({"dcg_e9": pa.array([dcg], pa.int64()),
                         "idcg_e9": pa.array([idcg], pa.int64()),
                         "ndcg_e9": pa.array([ndcg], pa.int64())})

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow", batch_size=None))


def source_vocab_jaccard(sf_dir: str, n_buckets: int = 64):
    """CORPUS-SLICE SIMILARITY: exact pairwise Jaccard between the
    distinct-token VOCABULARIES of the ``source`` slices — the
    slice-comparison a curation pipeline runs to judge how much two
    crawls / dumps overlap before mixing them (the set-similarity
    sibling of corpus_log_odds' frequency comparison).

    Exactness topology (the table_profile distinct discipline): each
    batch pre-dedups its (source, token) pairs, ONE coarse exchange on
    crc32(token) % n_buckets — a token lives in exactly ONE bucket, so
    the per-bucket pandas kernel sees every (source, token) pair of
    that token and its per-source-pair intersection / per-source vocab
    partials SUM globally; the repartition(1) tail folds ≤ n_buckets ×
    (|sources|² + |sources|) short rows into

      ``(src_a, src_b, n_a, n_b, n_common, jaccard_e9)``  (src_a < src_b)

    with jaccard_e9 the one half-away integer division of exact counts.
    The exchange carries per-batch-unique short (source, token) rows —
    bounded by vocabulary × batches, never token instances."""
    import zlib
    from itertools import combinations

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        pairs = set()
        for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for tok in set((txt or "").lower().split()):
                pairs.add((src, tok))
        srcs = [p[0] for p in pairs]
        toks = [p[1] for p in pairs]
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "token": pa.array(toks, pa.string()),
            "bucket": pa.array(
                [zlib.crc32(x.encode()) % n_buckets for x in toks],
                pa.int32()),
        })

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop_duplicates(["source", "token"])
        # vocab sizes per source in this bucket
        vocab = m.groupby("source").size()
        # token -> sorted source list; count each co-occurring pair once
        by_tok = m.groupby("token")["source"].agg(
            lambda s: tuple(sorted(set(s))))
        pair_counts: dict = {}
        for srcs in by_tok:
            for a, b in combinations(srcs, 2):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
        rows_a, rows_b, rows_n = [], [], []
        for s, n in vocab.items():
            rows_a.append(s)
            rows_b.append("")          # vocab-size partial row
            rows_n.append(int(n))
        for (a, b), n in pair_counts.items():
            rows_a.append(a)
            rows_b.append(b)
            rows_n.append(int(n))
        return pd.DataFrame({"src_a": pd.array(rows_a, "string").astype(str),
                             "src_b": pd.array(rows_b, "string").astype(str),
                             "n": pd.array(rows_n, "int64")})

    def finalize(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby(["src_a", "src_b"], as_index=False)
              ["n"].sum())
        vocab = dict(zip(df[df["src_b"] == ""]["src_a"],
                         df[df["src_b"] == ""]["n"]))
        inter = df[df["src_b"] != ""]
        a_l, b_l, na_l, nb_l, nc_l, j_l = [], [], [], [], [], []
        for a in sorted(vocab):
            for b in sorted(vocab):
                if a >= b:
                    continue
                common = int(inter[(inter["src_a"] == a)
                                   & (inter["src_b"] == b)]["n"].sum())
                na, nb = int(vocab[a]), int(vocab[b])
                union = na + nb - common
                a_l.append(a)
                b_l.append(b)
                na_l.append(na)
                nb_l.append(nb)
                nc_l.append(common)
                j_l.append((2 * 10**9 * common + union) // (2 * union))
        return pa.table({"src_a": pa.array(a_l, pa.string()),
                         "src_b": pa.array(b_l, pa.string()),
                         "n_a": pa.array(na_l, pa.int64()),
                         "n_b": pa.array(nb_l, pa.int64()),
                         "n_common": pa.array(nc_l, pa.int64()),
                         "jaccard_e9": pa.array(j_l, pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_counts, batch_format="pandas")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow", batch_size=None))


def mi_term_selection(sf_dir: str, pos_lang: str = "en", k: int = 25,
                      n_buckets: int = 64):
    """MUTUAL-INFORMATION term selection (Manning IR ch.13 — the
    feature-selection step before training a text classifier; the
    information-theoretic sibling of corpus_log_odds): for each term,
    MI between doc-level term PRESENCE and the ``lang == pos_lang``
    class over the 2×2 contingency table, each of the four cells
    rounded half-away to integer e9-units BEFORE the sum (zero cells
    contribute exactly 0 on both sides), top-k by (mi_e9 desc, term).

    Topology: a two-scalar class-count pass (N, N_pos) folds to the
    driver; per-batch Counter partials over per-doc DISTINCT tokens
    ship (term, n11, n10) rows into ONE crc32(term) coarse exchange — a
    term lives in one bucket, so per-bucket sums are global and the
    vectorized MI + per-bucket top-k make the repartition(1) tail fold
    ≤ n_buckets × k rows.  Output ``(term, n11, n10, mi_e9)``."""
    import collections
    import zlib

    ds = _read(sf_dir, "documents", ["text", "lang"])

    def class_partial(t: pa.Table) -> pa.Table:
        pos = int(pc.sum(pc.cast(pc.equal(t["lang"], pos_lang),
                                 pa.int64())).as_py() or 0)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "n1": pa.array([pos], pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        return pa.table({c: pa.array([int(pc.sum(t[c]).as_py() or 0)],
                                     pa.int64())
                         for c in t.column_names})

    srows = _prefold(ds.map_batches(class_partial, batch_format="pyarrow"),
                     fold).take_all()
    n = sum(r["n"] for r in srows)
    n1 = sum(r["n1"] for r in srows)

    def partial(t: pa.Table) -> pa.Table:
        c11: collections.Counter = collections.Counter()
        c10: collections.Counter = collections.Counter()
        for txt, lg in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
            toks = set((txt or "").lower().split())
            (c11 if lg == pos_lang else c10).update(toks)
        terms = sorted(set(c11) | set(c10))
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "n11": pa.array([c11.get(x, 0) for x in terms], pa.int64()),
            "n10": pa.array([c10.get(x, 0) for x in terms], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(x.encode()) % n_buckets for x in terms],
                pa.int32()),
        })

    n_f, n1_f, n0_f = float(n), float(n1), float(n - n1)

    def _cells(n11: np.ndarray, n10: np.ndarray) -> np.ndarray:
        row1 = (n11 + n10).astype(np.float64)
        row0 = n_f - row1
        mi = np.zeros(len(n11), np.int64)
        for cnt, row, col in (
                (n11.astype(np.float64), row1, n1_f),
                (n10.astype(np.float64), row1, n0_f),
                (n1_f - n11.astype(np.float64), row0, n1_f),
                (n0_f - n10.astype(np.float64), row0, n0_f)):
            with np.errstate(divide="ignore", invalid="ignore"):
                x = np.where(cnt > 0,
                             1e9 * ((cnt / n_f)
                                    * np.log((n_f * cnt)
                                             / np.where(row * col > 0,
                                                        row * col, 1.0))),
                             0.0)
            mi += np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
        return mi

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("term", as_index=False)[["n11", "n10"]].sum()
        m["mi_e9"] = _cells(m["n11"].to_numpy(np.int64),
                            m["n10"].to_numpy(np.int64))
        m = m.sort_values(["mi_e9", "term"],
                          ascending=[False, True]).head(k)
        return m[["term", "n11", "n10", "mi_e9"]].astype(
            {"n11": "int64", "n10": "int64", "mi_e9": "int64"})

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("mi_e9", "descending"),
                                            ("term", "ascending")])[:k]
        return t.take(idx)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def kwic_snippets(sf_dir: str, term: str = "vector", window: int = 3):
    """KEYWORD-IN-CONTEXT snippet generation — the search-result
    presentation step over a matched corpus (every hit of
    term_search_indexed needs the ±window tokens around its first
    occurrence).  Embarrassingly parallel single pass: per doc, the
    first occurrence index of ``term`` in the lower().split() token
    stream and the inclusive ±window token slice joined by single
    spaces.  Output ``(doc_id, pos, snippet)`` for matching docs only;
    ``pos`` is the 0-based token index."""
    t_lower = term.lower()

    def partial(t: pa.Table) -> pa.Table:
        ids, poss, snips = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (txt or "").lower().split()
            try:
                i = toks.index(t_lower)
            except ValueError:
                continue
            ids.append(did)
            poss.append(i)
            snips.append(" ".join(toks[max(0, i - window): i + window + 1]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "snippet": pa.array(snips, pa.string())})

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow"))


def calibration_bins(sf_dir: str, pos_lang: str = "en", cap: int = 500,
                     n_bins: int = 10):
    """RELIABILITY-DIAGRAM bins (the calibration eval beside
    score_auc_eval's ranking eval): treating p = min(n_chars, cap)/cap
    as a predicted probability of ``lang == pos_lang``, bucket docs
    into n_bins equal-width probability bins and report per bin the
    count, positives, Σ predicted (exactly 10^9·p per doc — an integer
    because 10^9/cap divides evenly at cap=500), and the observed
    positive fraction as one half-away integer division.

    Embarrassingly parallel per-batch pre-agg (≤ n_bins short rows per
    batch) into an n_bins-key groupby; a final vectorized map computes
    the fraction.  Output ``(bin, n, n_pos, sum_p_e9, frac_pos_e9)``."""
    from ray.data.aggregate import Sum

    scale = 10**9 // cap
    assert scale * cap == 10**9, "cap must divide 1e9 for exact sums"

    def partial(t: pa.Table) -> pa.Table:
        m = np.minimum(t["n_chars"].to_numpy().astype(np.int64), cap)
        pos = pc.equal(t["lang"], pos_lang).to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = np.minimum(n_bins - 1, (m * n_bins) // cap)
        df = (pd.DataFrame({"bin": b, "pos": pos, "p_e9": m * scale})
              .groupby("bin", as_index=False)
              .agg(n=("pos", "size"), n_pos=("pos", "sum"),
                   sum_p_e9=("p_e9", "sum")))
        return pa.Table.from_pandas(
            df.astype({c: "int64" for c in df.columns}),
            preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        npos = t["n_pos"].to_numpy()
        frac = (2 * 10**9 * npos + n) // (2 * n)
        return t.append_column("frac_pos_e9", pa.array(frac, pa.int64()))

    return (_read(sf_dir, "documents", ["n_chars", "lang"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_pos", alias_name="n_pos"),
                       Sum("sum_p_e9", alias_name="sum_p_e9"))
            .map_batches(final, batch_format="pyarrow"))


def prf_expanded_search(sf_dir: str, query: str = "table hash join",
                        k: int = 10, n_expand: int = 3):
    """PSEUDO-RELEVANCE-FEEDBACK query expansion (Rocchio/RM1-lite —
    the classic two-round retrieval loop): run BM25 top-k, mine the
    n_expand highest-total-tf terms from those feedback docs (original
    query terms excluded; ties break on the term), and re-run BM25 with
    the expanded term set.  Deterministic end to end.

    Scale shape: the feedback set is k rows (bounded driver take); the
    mining pass streams the corpus once but emits rows ONLY for the k
    feedback docs (per-batch Counter over their tokens — the take_all
    is bounded by the feedback vocabulary, not the corpus); both BM25
    rounds are the documented two-pass bm25_search.  Output
    ``(doc_id, score_e6)`` of the expanded query's top-k."""
    import collections

    fb = bm25_search(sf_dir, query, k=k).to_pandas()
    fb_ids = set(int(x) for x in fb["doc_id"])
    qterms = set(query.lower().split())

    def mine(t: pa.Table) -> pa.Table:
        ctr: collections.Counter = collections.Counter()
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did in fb_ids:
                ctr.update(w for w in (txt or "").lower().split()
                           if w not in qterms)
        terms = sorted(ctr)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "tf": pa.array([ctr[x] for x in terms],
                                        pa.int64())})

    rows = (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(mine, batch_format="pyarrow").to_pandas())
    tot = rows.groupby("term", as_index=False)["tf"].sum()
    tot = tot.sort_values(["tf", "term"], ascending=[False, True])
    expansion = list(tot["term"].head(n_expand))
    expanded_query = " ".join(sorted(qterms | set(expansion)))
    return bm25_search(sf_dir, expanded_query, k=k)


def fd_audit(sf_dir: str, lhs: str = "source", rhs: str = "lang",
             n_buckets: int = 64):
    """FUNCTIONAL-DEPENDENCY audit (the data-quality rule family beside
    pk_uniqueness_audit / fk_integrity_audit): does ``lhs → rhs`` hold
    on ``documents``, and where it doesn't, how badly?  Per lhs value:
    row count, distinct rhs count, the majority rhs (ties break on the
    smaller rhs string) and the violation count (rows outside the
    majority — the repair cost of enforcing the FD).

    Exactness topology: per-batch (lhs, rhs) pre-counts, ONE coarse
    crc32(lhs) exchange — an lhs value lives wholly in one bucket, so
    the per-bucket pandas kernel computes global totals / nunique /
    majority vectorized.  The exchange carries short partial-count
    rows bounded by |lhs×rhs| × batches, never data rows.  Output
    ``(lhs, n_rows, n_distinct_rhs, majority_rhs, n_majority,
    n_violations)``."""
    import zlib

    ds = _read(sf_dir, "documents", [lhs, rhs])

    def partial(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby([lhs, rhs], as_index=False).size())
        df["n"] = df.pop("size").astype("int64")
        df["bucket"] = np.asarray(
            [zlib.crc32(str(x).encode()) % n_buckets for x in df[lhs]],
            np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby([lhs, rhs], as_index=False)["n"].sum()
        m = m.sort_values(["n", rhs], ascending=[False, True])
        top = m.drop_duplicates(subset=[lhs], keep="first")
        tot = m.groupby(lhs, as_index=False).agg(
            n_rows=("n", "sum"), n_distinct_rhs=(rhs, "size"))
        out = tot.merge(top[[lhs, rhs, "n"]], on=lhs)
        out = out.rename(columns={lhs: "lhs", rhs: "majority_rhs",
                                  "n": "n_majority"})
        out["n_violations"] = out["n_rows"] - out["n_majority"]
        for c in ("n_rows", "n_distinct_rhs", "n_majority", "n_violations"):
            out[c] = out[c].astype("int64")
        return out[["lhs", "n_rows", "n_distinct_rhs", "majority_rhs",
                    "n_majority", "n_violations"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(audit, batch_format="pandas"))


def weighted_sample_topk(sf_dir: str, k: int = 25):
    """EFRAIMIDIS-SPIRAKIS WEIGHTED SAMPLING without replacement — the
    distributed one-pass weighted reservoir (A-ES): each doc gets
    priority ``u^(1/w)`` with ``u`` uniform and ``w = n_chars``; the k
    LARGEST priorities are exactly a weight-proportional sample without
    replacement (Efraimidis & Spirakis 2006).  The training-mix sampler
    for "sample documents proportional to length" — the byte-weighted
    sibling of :func:`hash_sample` / :func:`stratified_sample`.

    Determinism discipline: ``u = (md5_64(doc_id)+1) / 2^64`` (the
    repo-wide md5 convention — stable across runs, partitioning, resume
    and engines, NEVER random()); ranking by u^(1/w) == ranking by
    ln(u)/w, so the stored key is the POSITIVE magnitude
    ``key_e12 = round(−1e6·ln u) * 1e6 // w`` taken ASCENDING — one ln
    is the only float op, rounded to integer micro-nats before the
    integer divide (the bigram_lm convention; parity vs DuckDB verified
    on 10^5 md5 uniforms), and keeping the dividend positive sidesteps
    DuckDB's TRUNCATING ``//`` vs Python's floor division on negatives.

    Scale shape: embarrassingly parallel per-batch local top-k, then the
    repartition(1) bounded reduce — the driver sees exactly k rows at
    any corpus size (tfidf_top_docs' two-level reduce).  Zero-weight
    (n_chars = 0) docs are unsampleable and drop on both sides.
    """

    def score_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_chars"], 1))
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64()),
                             "key_e12": pa.array([], pa.int64())})
        h = _md5_u64(t["doc_id"].to_pylist())
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        mag = np.trunc(-np.log(u) * 1e6 + 0.5).astype(np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        tab = pa.table({"doc_id": t["doc_id"],
                        "lang": t["lang"],
                        "n_chars": t["n_chars"],
                        "key_e12": pa.array(mag * 1_000_000 // w, pa.int64())})
        idx = pc.sort_indices(
            tab, sort_keys=[("key_e12", "ascending"),
                            ("doc_id", "ascending")])[:k]
        return tab.take(idx)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("key_e12", "ascending"),
                          ("doc_id", "ascending")])[:k]
        return t.take(idx)

    return (
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(score_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def rake_keyphrases(sf_dir: str, k: int = 25, n_buckets: int = 64):
    """RAKE KEYPHRASE EXTRACTION (Rose et al. 2010) at corpus level —
    the multiword upgrade of the single-token keyword ops (E6 /
    heavy_hitter_terms): candidate phrases are maximal stopword-free
    token runs; word score = degree/freq over ALL candidate occurrences
    (degree = Σ length of the phrases a word occurs in, with
    multiplicity); phrase score = Σ member-word scores.  Returns the
    top-k distinct phrases as ``(phrase, n_occurrences, score_milli)``.

    Integer discipline: word score is milli-units ``degree * 1000 //
    freq`` (positive, so DuckDB's truncating ``//`` == floor), phrase
    score an int64 sum of those — float-free, bit-stable vs the oracle.

    Scale shape (the bigram_lm single-exchange co-partition template —
    three row kinds ride ONE crc32(word)-bucket exchange, CLAUDE.md's
    side-tag rule):
      side 1: per-batch word (freq, degree) partials — finalize in the
        bucket (all partials of a word co-locate);
      side 0: DISTINCT (phrase, word, multiplicity) instance rows — a
        static property of the phrase TEXT, deduped globally in the
        bucket, joined to the finalized word scores vectorized;
      side 2: per-batch (phrase, n) occurrence counts — pass through on
        a phrase-keyed bucket.
    The second exchange groups by crc32(phrase) %% B, sums contributions
    and occurrence counts per phrase, and emits its LOCAL top-k; a
    repartition(1) reduce hands the driver exactly k rows.  Text leaves
    a task only as candidate phrases (short word runs), never documents.
    """
    import collections
    import zlib

    from ocr_ray.functions.textstats import STOPWORDS_EN

    stops = frozenset(STOPWORDS_EN)

    def _phrases(txt: str):
        out, cur = [], []
        for tok in (txt or "").lower().split():
            if tok in stops:
                if cur:
                    out.append(cur)
                    cur = []
            else:
                cur.append(tok)
        if cur:
            out.append(cur)
        return out

    def partials(t: pa.Table) -> pa.Table:
        freq: collections.Counter = collections.Counter()
        deg: collections.Counter = collections.Counter()
        occ: collections.Counter = collections.Counter()
        pw: dict[tuple[str, str], int] = {}
        for txt in t["text"].to_pylist():
            for ph in _phrases(txt):
                text_ph = " ".join(ph)
                occ[text_ph] += 1
                n = len(ph)
                for w in ph:
                    freq[w] += 1
                    deg[w] += n
                if (text_ph, ph[0]) not in pw:
                    c = collections.Counter(ph)
                    for w, m in c.items():
                        pw[(text_ph, w)] = m
        side, word, phrase, m, fr, dg = [], [], [], [], [], []
        bucket = []
        for w in freq:
            side.append(1); word.append(w); phrase.append("")
            m.append(0); fr.append(freq[w]); dg.append(deg[w])
            bucket.append(zlib.crc32(w.encode()) % n_buckets)
        for (text_ph, w), mult in pw.items():
            side.append(0); word.append(w); phrase.append(text_ph)
            m.append(mult); fr.append(0); dg.append(0)
            bucket.append(zlib.crc32(w.encode()) % n_buckets)
        for text_ph, n in occ.items():
            side.append(2); word.append(""); phrase.append(text_ph)
            m.append(n); fr.append(0); dg.append(0)
            bucket.append(zlib.crc32(text_ph.encode()) % n_buckets)
        return pa.table({
            "side": pa.array(side, pa.int8()),
            "word": pa.array(word, pa.string()),
            "phrase": pa.array(phrase, pa.string()),
            "m": pa.array(m, pa.int64()),
            "freq": pa.array(fr, pa.int64()),
            "degree": pa.array(dg, pa.int64()),
            "bucket": pa.array(bucket, pa.int32()),
        })

    def word_bucket(g: pd.DataFrame) -> pd.DataFrame:
        stats = (g[g["side"] == 1].groupby("word", as_index=False)
                 [["freq", "degree"]].sum())
        stats["score"] = (stats["degree"] * 1000 // stats["freq"]).astype(np.int64)
        inst = (g[g["side"] == 0]
                .drop_duplicates(subset=["phrase", "word"])
                .merge(stats[["word", "score"]], on="word", how="inner"))
        contrib = pd.DataFrame({
            "phrase": inst["phrase"].to_numpy(),
            "kind": np.zeros(len(inst), dtype=np.int8),
            "val": (inst["m"] * inst["score"]).astype(np.int64).to_numpy()})
        thru = g[g["side"] == 2]
        out = pd.concat([contrib, pd.DataFrame({
            "phrase": thru["phrase"].to_numpy(),
            "kind": np.ones(len(thru), dtype=np.int8),
            "val": thru["m"].astype(np.int64).to_numpy()})],
            ignore_index=True)
        out["pbucket"] = np.fromiter(
            (zlib.crc32(p.encode()) % n_buckets for p in out["phrase"]),
            dtype=np.int32, count=len(out))
        return out

    def phrase_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.pivot_table(index="phrase", columns="kind", values="val",
                             aggfunc="sum", fill_value=0)
               .rename(columns={0: "score_milli", 1: "n_occurrences"})
               .reset_index())
        for c in ("score_milli", "n_occurrences"):
            if c not in agg.columns:
                agg[c] = np.int64(0)
            agg[c] = agg[c].astype(np.int64)
        agg = agg.sort_values(["score_milli", "phrase"],
                              ascending=[False, True]).head(k)
        return agg[["phrase", "n_occurrences", "score_milli"]]

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("score_milli", "descending"),
                          ("phrase", "ascending")])[:k]
        return t.take(idx)

    return (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(word_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(phrase_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _div_half_away(num: int, den: int) -> int:
    """Exact integer round-half-away-from-zero of num/den (Python
    bigints — no float, no overflow)."""
    if den == 0:
        return 0
    sign = -1 if (num < 0) != (den < 0) else 1
    num, den = abs(num), abs(den)
    return sign * ((2 * num + den) // (2 * den))


def ols_price_model(sf_dir: str):
    """DISTRIBUTED ORDINARY LEAST SQUARES by exact normal equations —
    the classic one-pass linear-model fit (Spark-MLlib's
    ``LinearRegression(solver=normal)`` shape): fit
    ``extendedprice_cents ~ quantity + discount_bp`` over lineitem.
    One embarrassingly-parallel pass emits NINE integer moment sums per
    batch (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y); the driver
    solves the 3×3 system by CRAMER'S RULE in arbitrary-precision
    Python ints and emits coefficients as half-away-rounded MILLI-units
    via exact integer division — zero floats end to end, so Ray ==
    DuckDB (which carries the same determinants in HUGEINT) bit for
    bit.  Returns one row ``(n, intercept_milli, qty_coef_milli,
    disc_coef_milli)``.

    Scale shape: the shuffle carries nine int64 partials per batch and
    nothing else; driver state is nine big-ints.  Determinant
    magnitudes stay inside HUGEINT through ~10^10 rows at these value
    ranges (the oracle's verification envelope); the Ray side is
    unbounded (Python ints).  Multicollinearity guard: a singular
    system returns zero coefficients on both sides.
    """
    from ray.data.aggregate import Sum

    def _ha(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        x1 = _ha(t["l_quantity"].to_numpy(zero_copy_only=False))
        x2 = _ha(t["l_discount"].to_numpy(zero_copy_only=False) * 10000)
        y = _ha(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100)
        return pa.table({
            "n": pa.array([len(x1)], pa.int64()),
            "s1": pa.array([int(x1.sum())], pa.int64()),
            "s2": pa.array([int(x2.sum())], pa.int64()),
            "s11": pa.array([int((x1 * x1).sum())], pa.int64()),
            "s12": pa.array([int((x1 * x2).sum())], pa.int64()),
            "s22": pa.array([int((x2 * x2).sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "s1y": pa.array([int((x1 * y).sum())], pa.int64()),
            "s2y": pa.array([int((x2 * y).sum())], pa.int64()),
        })

    agg = (_read(sf_dir, "lineitem",
                 ["l_quantity", "l_discount", "l_extendedprice"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(*[Sum(c, alias_name=c) for c in
                        ("n", "s1", "s2", "s11", "s12", "s22",
                         "sy", "s1y", "s2y")]))
    n, s1, s2 = int(agg["n"]), int(agg["s1"]), int(agg["s2"])
    s11, s12, s22 = int(agg["s11"]), int(agg["s12"]), int(agg["s22"])
    sy, s1y, s2y = int(agg["sy"]), int(agg["s1y"]), int(agg["s2y"])

    def det3(a, b, c, d, e, f, g, h, i):
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    det0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    det1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    det2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)

    return pa.table({
        "n": pa.array([n], pa.int64()),
        "intercept_milli": pa.array(
            [_div_half_away(det0 * 1000, det)], pa.int64()),
        "qty_coef_milli": pa.array(
            [_div_half_away(det1 * 1000, det)], pa.int64()),
        "disc_coef_milli": pa.array(
            [_div_half_away(det2 * 1000, det)], pa.int64()),
    })


def zipf_slope_fit(sf_dir: str, k: int = 500):
    """ZIPF'S-LAW FIT of the corpus vocabulary — the log-log linear fit
    ``ln(freq) ~ ln(rank)`` over the top-k tokens (slope ≈ −1 is
    Zipf's law; the diagnostic behind vocabulary sizing and the
    heavy-hitter salting decisions this repo documents).  Returns one
    row ``(n_terms, slope_milli, intercept_unats)``.

    Float discipline: the ONLY float op is one ln per point, rounded to
    integer micro-nats (the bigram_lm convention, numpy/DuckDB parity
    pinned on 10^5 values); the least-squares solve is exact integer
    Cramer over those ints (:func:`_div_half_away` — no float solve, so
    Ray == DuckDB bit for bit).

    Scale shape: :func:`top_terms`' two-level exact reduce (per-batch
    Counter partials, crc32-bucket exchange, per-bucket top-k,
    repartition(1) final top-k) hands the driver exactly k (token,
    freq) rows; the fit itself is driver-side big-int arithmetic on
    2k ints.
    """
    import collections
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for txt in t["text"].to_pylist():
            c.update((txt or "").lower().split())
        toks = list(c.keys())
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([c[tk] for tk in toks], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(tk.encode()) % n_buckets for tk in toks],
                pa.int32()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["n"].sum()
        s["n"] = s["n"].astype("int64")
        return s.sort_values(["n", "token"],
                             ascending=[False, True]).head(k)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("token", "ascending")])[:k]
        return t.take(idx).select(["token", "n"])

    top = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    freqs = top["n"].to_numpy()
    ranks = np.arange(1, len(freqs) + 1, dtype=np.float64)
    x = np.copysign(np.floor(np.abs(np.log(ranks) * 1e6) + 0.5),
                    1.0).astype(np.int64)
    y = np.copysign(np.floor(np.abs(np.log(freqs.astype(np.float64))
                                    * 1e6) + 0.5), 1.0).astype(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    return pa.table({
        "n_terms": pa.array([n], pa.int64()),
        "slope_milli": pa.array(
            [_div_half_away(num * 1000, den)], pa.int64()),
        "intercept_unats": pa.array(
            [_div_half_away(sy * den - num * sx, n * den)], pa.int64()),
    })


def span_corruption_plan(sf_dir: str, noise_pct: int = 15,
                         min_len: int = 2, len_mod: int = 3):
    """T5-STYLE SPAN-CORRUPTION PLANNING (Raffel et al. 2020 §3.1.4 —
    the masking math every denoising-objective pipeline runs before
    packing): each token position starts a candidate noise span with
    probability ``noise_pct``%% (md5-driven, NEVER random()); span
    length is ``min_len + md5 %% len_mod`` (2-4, mean 3); the masked set
    is the UNION of candidate spans clamped at the doc end, and each
    maximal masked run becomes one SENTINEL token.  Per lang:
    ``(n_docs, total_tokens, masked_tokens, n_sentinels,
    mask_ratio_bp)`` — the numbers that size the encoder/decoder
    sequence budget (inputs shrink by masked−sentinels, targets are
    masked+sentinels).

    Determinism: position i of doc d masks iff
    ``md5(d:i) %% 100 < noise_pct``; length = ``min_len +
    md5(d:i:L) %% len_mod`` — the hash_sample convention, stable across
    runs/partitioning/engines; sentinel runs counted vectorized
    (boolean diff).  Embarrassingly parallel per-batch partials; the
    only exchange carries ≤ |langs| rows per batch.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for did, lang, txt in zip(t["doc_id"].to_pylist(),
                                  t["lang"].to_pylist(),
                                  t["text"].to_pylist()):
            toks = (txt or "").lower().split()
            n = len(toks)
            if n == 0:
                continue
            h = _md5_u64([f"{did}:{i}" for i in range(n)])
            starts = np.nonzero(h % np.uint64(100) < noise_pct)[0]
            masked = np.zeros(n, dtype=bool)
            if starts.size:
                lens = (min_len
                        + _md5_u64([f"{did}:{i}:L" for i in starts])
                        % np.uint64(len_mod)).astype(np.int64)
                for i, ln in zip(starts, lens):
                    masked[i:i + ln] = True
            m = int(masked.sum())
            sent = int(masked[0]) + int(
                (masked[1:] & ~masked[:-1]).sum()) if n else 0
            a = acc.setdefault(lang or "", [0, 0, 0, 0])
            a[0] += 1
            a[1] += n
            a[2] += m
            a[3] += sent
        ks = sorted(acc)
        return pa.table({
            "lang": pa.array(ks, pa.string()),
            "n_docs": pa.array([acc[x][0] for x in ks], pa.int64()),
            "total_tokens": pa.array([acc[x][1] for x in ks], pa.int64()),
            "masked_tokens": pa.array([acc[x][2] for x in ks], pa.int64()),
            "n_sentinels": pa.array([acc[x][3] for x in ks], pa.int64()),
        })

    def finish(t: pa.Table) -> pa.Table:
        tot = t["total_tokens"].to_pylist()
        m = t["masked_tokens"].to_pylist()
        return t.append_column(
            "mask_ratio_bp",
            pa.array([a * 10000 // b if b else 0
                      for a, b in zip(m, tot)], pa.int64()))

    return (_read(sf_dir, "documents", ["doc_id", "text", "lang"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("total_tokens", alias_name="total_tokens"),
                       Sum("masked_tokens", alias_name="masked_tokens"),
                       Sum("n_sentinels", alias_name="n_sentinels"))
            .map_batches(finish, batch_format="pyarrow"))


def langid_rank_profile(sf_dir: str, profile_k: int = 200):
    """CAVNAR-TRENKLE N-GRAM RANK-PROFILE LANGUAGE ID (Cavnar &
    Trenkle 1994, "N-Gram-Based Text Categorization" — the classic
    langid textcat ships): per lang, the top-``profile_k`` char
    3-grams by frequency form a RANK profile; a document classifies to
    the lang minimizing the OUT-OF-PLACE distance — Σ over the doc's
    own top-``profile_k`` grams of |doc_rank − lang_rank|, with a
    ``profile_k`` penalty for grams absent from the lang profile.
    Returns the confusion matrix ``(lang, predicted, n_docs)`` against
    the stored labels — the evaluation a curation pipeline runs before
    trusting a langid gate (the rank-method sibling of
    :func:`langid_confusion`'s heuristic).

    Ordering discipline: all ranks are row_number over (count DESC,
    gram ASC); argmin ties break to the lexically first lang — both
    mirrored in SQL, so the matrix is bit-stable.

    Scale shape: training is :func:`top_terms`' two-level exact reduce
    per lang (per-batch (lang, gram) Counter partials, crc32(gram)
    bucket exchange — a gram's counts for ALL langs co-locate, per-lang
    top-k inside, bounded final reduce); the |langs|·profile_k profile
    table broadcasts by value into one embarrassingly-parallel classify
    pass emitting ≤ |langs|² partial rows per batch.  Docs shorter than
    3 chars have no profile and are excluded on both sides.
    """
    import collections
    import zlib

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def _grams(txt: str):
        t = (txt or "").lower()
        return [t[i:i + 3] for i in range(len(t) - 2)]

    def train_partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for g in _grams(txt):
                c[(lang or "", g)] += 1
        keys = list(c.keys())
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "gr": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(k[1].encode()) % n_buckets for k in keys],
                pa.int32()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["lang", "gr"], as_index=False)["n"].sum()
        s["n"] = s["n"].astype(np.int64)
        return (s.sort_values(["lang", "n", "gr"],
                              ascending=[True, False, True])
                .groupby("lang", as_index=False).head(profile_k))

    def final_profiles(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .sort_values(["lang", "n", "gr"],
                           ascending=[True, False, True])
              .groupby("lang", as_index=False).head(profile_k))
        df["rk"] = df.groupby("lang").cumcount() + 1
        return pa.Table.from_pandas(df[["lang", "gr", "rk"]],
                                    preserve_index=False)

    prof = (
        _read(sf_dir, "documents", ["text", "lang"])
        .map_batches(train_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final_profiles, batch_format="pyarrow",
                     batch_size=None)
        .to_pandas()
    )
    profiles: dict[str, dict[str, int]] = {}
    for lang, gr, rk in prof.itertuples(index=False):
        profiles.setdefault(lang, {})[gr] = int(rk)
    langs = sorted(profiles)

    from ray.data.aggregate import Sum

    def classify(t: pa.Table) -> pa.Table:
        conf: collections.Counter = collections.Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            gs = _grams(txt)
            if not gs:
                continue
            c = collections.Counter(gs)
            ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
            ranked = ranked[:profile_k]
            best, best_d = None, None
            for cand in langs:
                p = profiles[cand]
                d = 0
                for rk, (g, _) in enumerate(ranked, 1):
                    lr = p.get(g)
                    d += abs(rk - lr) if lr is not None else profile_k
                if best_d is None or d < best_d:
                    best, best_d = cand, d
            conf[(lang or "", best)] += 1
        keys = sorted(conf)
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "predicted": pa.array([k[1] for k in keys], pa.string()),
            "n_docs": pa.array([conf[k] for k in keys], pa.int64()),
        })

    return (_read(sf_dir, "documents", ["text", "lang"])
            .map_batches(classify, batch_format="pyarrow")
            .groupby(["lang", "predicted"])
            .aggregate(Sum("n_docs", alias_name="n_docs")))


def bloom_fpp_audit(sf_dir: str, priority: str = "1-URGENT",
                    n_bits: int = 16384, n_hashes: int = 4):
    """BLOOM-FILTER FALSE-POSITIVE AUDIT, bit-for-bit oracle-checked —
    the verification a pipeline runs before trusting a bloom-pruned
    semi join (:func:`bloom_semi_join_revenue` uses the filter; this
    op pins the FILTER ITSELF): members are the distinct custkeys
    holding a ``priority`` order, hashed into an ``n_bits`` bloom via
    the md5 family ``pos_j = md5(key:j) % n_bits`` (oracle-recomputable,
    unlike the splitmix64 hot path — functions/bloom.py documents the
    family split); probes are customer keys shifted OUTSIDE the key
    domain (+10^9), so every probe is a TRUE negative and every hit a
    false positive.  Returns one row ``(n_members, n_bits_set,
    n_probes, n_false_pos, fp_bp, expected_fp_bp)`` where expected =
    (bits_set/n_bits)^k in exact integer bp — observed should sit near
    it (the standard bloom occupancy estimate).

    Scale shape: the build emits one fixed-size bitmap partial per
    batch OR-folded on the driver (the bloom_semi_join discipline —
    driver holds KB, never keys); the member count is the coarse-bucket
    exact-distinct reduce; the probe pass broadcasts the bitmap via
    ray.put and emits one count per batch.
    """
    import ray
    from ray.data.aggregate import Sum

    nb = n_bits

    def _positions(keys: list) -> np.ndarray:
        return (_md5_u64([f"{k}:{j}" for k in keys
                          for j in range(n_hashes)])
                % np.uint64(nb)).astype(np.int64)

    def build_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], priority))
        keys = pc.unique(t["o_custkey"]).to_pylist()
        bits = np.zeros(nb, dtype=bool)
        if keys:
            bits[_positions(keys)] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    bits = np.zeros(nb, dtype=bool)
    for ref in orders.map_batches(build_partial,
                                  batch_format="pyarrow").to_arrow_refs():
        b = ray.get(ref)
        if b.num_columns and b.num_rows:
            for blob in b["bits"].to_pylist():
                bits |= np.unpackbits(
                    np.frombuffer(blob, np.uint8)).astype(bool)[:nb]
    n_bits_set = int(bits.sum())

    def distinct_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], priority))
        u = pc.unique(t["o_custkey"])
        return pa.table({
            "k": u,
            "bucket": pa.array(
                (u.to_numpy(zero_copy_only=False).astype(np.int64) % 64)
                .astype(np.int32), pa.int32()),
        })

    n_members = int(
        orders.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: pd.DataFrame(
            {"n": [g["k"].nunique()]}), batch_format="pandas")
        .aggregate(Sum("n"))["sum(n)"] or 0)

    bits_ref = ray.put(np.packbits(bits))

    def probe_partial(t: pa.Table) -> pa.Table:
        keys = [k + 1_000_000_000 for k in t["c_custkey"].to_pylist()]
        if not keys:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "fp": pa.array([0], pa.int64())})
        bm = np.unpackbits(ray.get(bits_ref)).astype(bool)[:nb]
        pos = _positions(keys).reshape(len(keys), n_hashes)
        hit = bm[pos].all(axis=1)
        return pa.table({"n": pa.array([len(keys)], pa.int64()),
                         "fp": pa.array([int(hit.sum())], pa.int64())})

    pr = (_read(sf_dir, "customer", ["c_custkey"])
          .map_batches(probe_partial, batch_format="pyarrow")
          .aggregate(Sum("n", alias_name="n"), Sum("fp", alias_name="fp")))
    n_probes, n_fp = int(pr["n"] or 0), int(pr["fp"] or 0)

    return pa.table({
        "n_members": pa.array([n_members], pa.int64()),
        "n_bits_set": pa.array([n_bits_set], pa.int64()),
        "n_probes": pa.array([n_probes], pa.int64()),
        "n_false_pos": pa.array([n_fp], pa.int64()),
        "fp_bp": pa.array([n_fp * 10000 // n_probes if n_probes else 0],
                          pa.int64()),
        "expected_fp_bp": pa.array(
            [n_bits_set ** n_hashes * 10000 // nb ** n_hashes], pa.int64()),
    })


def lang_unigram_kl(sf_dir: str):
    """PAIRWISE KL DIVERGENCE between per-lang unigram LMs — the
    distribution-shift measurement behind corpus mixing and domain
    adaptation (the directed sibling of :func:`psi_feature_drift` /
    :func:`corpus_log_odds`): ``KL(a‖b) = Σ_t p_a(t)·ln(p_a(t)/p_b(t))``
    over the UNION vocabulary with add-1 smoothing
    ``p_l(t) = (c_l(t)+1)/(T_l+V)``.  Returns all ordered pairs as
    ``(lang_a, lang_b, kl_pico)`` in integer pico-nats.

    Float discipline: the per-term contribution is ONE fixed-shape
    float expression — ``(1e12 · (c_a+1)/(T_a+V)) · ln(((c_a+1)(T_b+V))
    / ((c_b+1)(T_a+V)))`` with both ln operands exact int64 products
    (< 2^53, so the double division is the only rounding) — rounded
    half-away to an int BEFORE summation, so the distributed sum is
    order-independent and DuckDB reproduces it term for term.

    Scale shape: pass 1 reduces (T_l per lang, V) to a handful of
    driver ints (per-batch Counter partials, term-bucket distinct
    sums); pass 2 re-exchanges (lang, term, c) partials on the same
    crc32(term) bucket — every lang's count for a term co-locates, so
    the bucket kernel pivots terms × langs and emits 20 pair-partial
    rows; the final groupby carries |langs|² keys.  Term strings cross
    the exchange once, counts otherwise.
    """
    import collections
    import zlib

    from ray.data.aggregate import Sum

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def count_partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for tok in (txt or "").lower().split():
                c[(lang or "", tok)] += 1
        keys = list(c.keys())
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "term": pa.array([k[1] for k in keys], pa.string()),
            "c": pa.array([c[k] for k in keys], pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(k[1].encode()) % n_buckets for k in keys],
                pa.int32()),
        })

    def counts():
        return (_read(sf_dir, "documents", ["text", "lang"])
                .map_batches(count_partial, batch_format="pyarrow"))

    def totals_kernel(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("lang", as_index=False)["c"].sum()
        s["c"] = s["c"].astype(np.int64)
        s["v"] = np.int64(0)
        vrow = pd.DataFrame({"lang": ["\x00vocab"], "c": [np.int64(0)],
                             "v": [np.int64(g["term"].nunique())]})
        return pd.concat([s, vrow], ignore_index=True)

    tot = (counts().groupby("bucket")
           .map_groups(totals_kernel, batch_format="pandas")
           .groupby("lang")
           .aggregate(Sum("c", alias_name="c"), Sum("v", alias_name="v"))
           .to_pandas())
    t_l = {r["lang"]: int(r["c"]) for _, r in tot.iterrows()
           if r["lang"] != "\x00vocab"}
    v = int(tot["v"].sum())
    langs = sorted(t_l)

    def _ha(x: np.ndarray) -> np.ndarray:
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    def pair_kernel(g: pd.DataFrame) -> pd.DataFrame:
        mat = (g.groupby(["term", "lang"], as_index=False)["c"].sum()
               .pivot_table(index="term", columns="lang", values="c",
                            fill_value=0))
        out_a, out_b, out_v = [], [], []
        for a in langs:
            ca = (mat[a].to_numpy(dtype=np.int64)
                  if a in mat.columns else np.zeros(len(mat), np.int64))
            da = t_l[a] + v
            for b in langs:
                if a == b:
                    continue
                cb = (mat[b].to_numpy(dtype=np.int64)
                      if b in mat.columns else np.zeros(len(mat), np.int64))
                db = t_l[b] + v
                arg = ((ca + 1) * db).astype(np.float64) \
                    / ((cb + 1) * da).astype(np.float64)
                contrib = _ha((1e12 * ((ca + 1).astype(np.float64) / da))
                              * np.log(arg))
                out_a.append(a)
                out_b.append(b)
                out_v.append(int(contrib.sum()))
        return pd.DataFrame({"lang_a": out_a, "lang_b": out_b,
                             "kl_pico": np.array(out_v, dtype=np.int64)})

    return (counts().groupby("bucket")
            .map_groups(pair_kernel, batch_format="pandas")
            .groupby(["lang_a", "lang_b"])
            .aggregate(Sum("kl_pico", alias_name="kl_pico")))


def postings_varint_size(sf_dir: str, n_buckets: int = 64):
    """INVERTED-INDEX COMPRESSION ACCOUNTING — delta-gap + LEB128 varint
    size of every term's postings list (the d-gap encoding every
    production index uses: Lucene, and the textbook treatment in
    Witten/Moffat/Bell "Managing Gigabytes").  Postings are the sorted
    distinct doc_ids per whitespace token; gaps are ``first+1, then
    successive differences`` (so every gap ≥ 1); a gap of v costs
    ``ceil(bit_length(v)/7)`` bytes.  Rows, one per df magnitude class
    ``df_log2 = floor(log2(df))``::

        (df_log2, n_terms, n_postings, varint_bytes, fixed_bytes,
         compressed_bp)

    where fixed_bytes = 4·df (uncompressed int32 postings) and
    compressed_bp = varint_bytes·10000 // fixed_bytes — the number that
    says WHICH df classes pay for compression (rare terms barely
    compress, head terms approach 1 byte/posting as gaps shrink).

    Scale shape: the one exchange carries distinct (term, doc_id)
    pairs bucketed by crc32(term) — the same build cost as the
    term-index family (pipelines/textsearch.py); a term lives entirely
    in one bucket, so df, gaps and byte costs are all computed
    vectorized inside the bucket kernel (sort + run-boundary reduceat,
    no per-term Python), which emits ≤ ~40 partial rows per bucket.
    Integer discipline: df_log2 via exact power-of-two searchsorted
    (never float log2); the oracle mirrors it with length(bin(df))-1.
    """
    import zlib

    # LEB128 byte-count boundaries: gap < 2^(7k) costs k bytes.
    vbounds = np.array([1 << (7 * k) for k in range(1, 9)], np.int64)
    pow2 = np.array([1 << k for k in range(63)], np.int64)

    def pairs(t: pa.Table) -> pa.Table:
        terms: list[str] = []
        dids: list[int] = []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            for tk in set((txt or "").lower().split()):
                terms.append(tk)
                dids.append(did)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(dids, pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(tk.encode()) % n_buckets for tk in terms],
                pa.int32()),
        })

    def bucket_kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        term = g["term"].to_numpy()
        doc = g["doc_id"].to_numpy(np.int64)
        new = np.r_[True, term[1:] != term[:-1]]
        prev = np.r_[np.int64(-1), doc[:-1]]
        gap = np.where(new, doc + 1, doc - prev)
        vb = (np.searchsorted(vbounds, gap, side="right") + 1)
        starts = np.nonzero(new)[0]
        df = np.diff(np.r_[starts, len(doc)]).astype(np.int64)
        vbt = np.add.reduceat(vb.astype(np.int64), starts)
        cls = (np.searchsorted(pow2, df, side="right") - 1).astype(np.int64)
        out = (pd.DataFrame({"df_log2": cls, "df": df, "vb": vbt})
               .groupby("df_log2", as_index=False)
               .agg(n_terms=("df", "size"), n_postings=("df", "sum"),
                    varint_bytes=("vb", "sum")))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def final(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        out = (df_.groupby("df_log2", as_index=False)
               [["n_terms", "n_postings", "varint_bytes"]].sum()
               .sort_values("df_log2"))
        fixed = out["n_postings"].to_numpy(np.int64) * 4
        return pa.table({
            "df_log2": pa.array(out["df_log2"].to_numpy(np.int64)),
            "n_terms": pa.array(out["n_terms"].to_numpy(np.int64)),
            "n_postings": pa.array(out["n_postings"].to_numpy(np.int64)),
            "varint_bytes": pa.array(
                out["varint_bytes"].to_numpy(np.int64)),
            "fixed_bytes": pa.array(fixed),
            "compressed_bp": pa.array(
                out["varint_bytes"].to_numpy(np.int64) * 10000 // fixed),
        })

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_kernel, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def wand_maxscore_stats(sf_dir: str, k: int = 10):
    """WAND / MAXSCORE PRUNING AUDIT (Broder et al. CIKM'03; Turtle &
    Flood's MaxScore) — the index-traversal optimization every lexical
    search engine runs: with per-term score UPPER BOUNDS
    ``UB_t = max(w_t · tf_t)`` and the exact top-k threshold θ, terms
    whose cumulative UB (ascending) stays below θ are NON-ESSENTIAL,
    and a document containing only non-essential terms can be skipped
    without scoring.  Scoring is pure-integer ``Σ w_t·tf_t`` with fixed
    query weights, so Ray == DuckDB bit for bit.  One row per query
    term::

        (term, weight, ub, is_essential, theta, n_matching, n_skippable)

    n_skippable / n_matching is the fraction of candidate documents a
    MaxScore traversal never scores — the audit that justifies keeping
    UB metadata in the posting headers.

    Scale shape: pass 1 folds per-batch partials (n_matching, per-term
    UB maxima, a fixed-width local top-k score vector) through the bm25
    pre-fold pattern — the driver sees ONE row; pass 2 broadcasts
    (θ, essential set) and counts skippable docs via a Sum aggregate.
    No corpus shuffle; both passes are embarrassingly parallel.
    """
    import re

    from ray.data.aggregate import Sum

    terms = ["table", "hash", "join", "dup"]
    weights = [1, 2, 5, 9]
    nt = len(terms)
    _ws = re.compile(r"[ \t\n\f\r]+")

    def _scores(t: pa.Table):
        """Per-doc integer scores + per-term contributions for a batch."""
        contr = np.zeros((t.num_rows, nt), dtype=np.int64)
        for r, txt in enumerate(t["text"].to_pylist()):
            toks = [x for x in _ws.split((txt or "").lower()) if x]
            for i, q in enumerate(terms):
                c = toks.count(q)
                if c:
                    contr[r, i] = c * weights[i]
        return contr

    def partial(t: pa.Table) -> pa.Table:
        contr = _scores(t)
        score = contr.sum(axis=1)
        match = score > 0
        top = np.sort(score[match])[::-1][:k]
        top = np.r_[top, np.full(k - len(top), -1, np.int64)]
        cols = {"n_matching": pa.array([int(match.sum())], pa.int64())}
        for i in range(nt):
            cols[f"ub_{i}"] = pa.array([int(contr[:, i].max(initial=0))],
                                       pa.int64())
        for j in range(k):
            cols[f"top_{j}"] = pa.array([int(top[j])], pa.int64())
        return pa.table(cols)

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        allt = np.sort(np.concatenate(
            [t[f"top_{j}"].to_numpy() for j in range(k)]))[::-1][:k]
        cols = {"n_matching": pa.array(
            [int(pc.sum(t["n_matching"]).as_py() or 0)], pa.int64())}
        for i in range(nt):
            cols[f"ub_{i}"] = pa.array(
                [int(pc.max(t[f"ub_{i}"]).as_py() or 0)], pa.int64())
        for j in range(k):
            cols[f"top_{j}"] = pa.array([int(allt[j])], pa.int64())
        return pa.table(cols)

    stats = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(fold, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .to_pandas().iloc[0]
    )
    n_matching = int(stats["n_matching"])
    ubs = np.array([stats[f"ub_{i}"] for i in range(nt)], np.int64)
    tops = np.array([stats[f"top_{j}"] for j in range(k)], np.int64)
    tops = tops[tops >= 0]
    theta = int(tops[-1]) if len(tops) == k else 0

    order = sorted(range(nt), key=lambda i: (ubs[i], terms[i]))
    essential = np.ones(nt, dtype=bool)
    cum = 0
    for i in order:
        cum += int(ubs[i])
        if cum < theta:
            essential[i] = False

    ess_ref = ray.put(essential)

    def skip_partial(t: pa.Table) -> pa.Table:
        ess = ray.get(ess_ref)
        contr = _scores(t)
        match = contr.sum(axis=1) > 0
        has_ess = (contr[:, ess] > 0).any(axis=1) if ess.any() else \
            np.zeros(len(contr), dtype=bool)
        return pa.table({
            "g": pa.array([0], pa.int32()),
            "n_skip": pa.array([int((match & ~has_ess).sum())],
                               pa.int64()),
        })

    n_skippable = int(
        _read(sf_dir, "documents", ["text"])
        .map_batches(skip_partial, batch_format="pyarrow")
        .groupby("g").aggregate(Sum("n_skip", alias_name="n_skip"))
        .to_pandas()["n_skip"].iloc[0])

    return pa.table({
        "term": pa.array(terms, pa.string()),
        "weight": pa.array(weights, pa.int64()),
        "ub": pa.array(ubs),
        "is_essential": pa.array(essential.astype(np.int64)),
        "theta": pa.array([theta] * nt, pa.int64()),
        "n_matching": pa.array([n_matching] * nt, pa.int64()),
        "n_skippable": pa.array([n_skippable] * nt, pa.int64()),
    })


def ab_conversion_lift(sf_dir: str):
    """A/B experiment read-out: users are deterministically assigned to
    arm A/B by ``md5(user_id) % 2`` (the repo-wide oracle-reproducible
    hash, `_md5_u64`), a user CONVERTS if they emitted at least one
    ``purchase`` event with ``value > 90`` (every user has SOME purchase
    in the synthetic data, so the raw predicate is degenerate; the
    high-value variant separates the arms), and the query reports
    per-arm user / conversion
    counts, integer-micro conversion rates, the B−A lift, and the pooled
    two-proportion z-score (reference analogue: the verdict roll-up
    H4/I2 recomputation shape, ``qc/summary.py`` counts-from-rows).

    Scale shape: one shuffle on ``md5(user_id) % 64`` carrying per-batch
    pre-deduped (bucket, user, converted) rows; each bucket folds its
    users vectorized and emits ONE partial row (users/conversions per
    arm — arm is derivable from the bucket hash but is re-derived per
    user for clarity), so the final fold sees ≤ n_buckets rows.  Rates
    use exact integer half-up division ``(1e6·c + u//2) // u`` and the
    z-score is IEEE double math over exact integers with the same
    expression shape as the SQL oracle.
    """
    import math

    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        conv = pc.and_(pc.equal(t["event_type"], "purchase"),
                       pc.greater(t["value"], 90.0))
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "conv": conv.to_numpy(zero_copy_only=False).astype(np.int64),
        }).groupby("user_id", as_index=False)["conv"].max()
        df["bucket"] = _md5_mod(df["user_id"], n_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("user_id", as_index=False)["conv"].max()
        arm = (_md5_u64(d["user_id"]) % np.uint64(2)).astype(np.int64)
        a, b = (arm == 0), (arm == 1)
        return pd.DataFrame({
            "users_a": [np.int64(a.sum())],
            "conv_a": [np.int64(d["conv"][a].sum())],
            "users_b": [np.int64(b.sum())],
            "conv_b": [np.int64(d["conv"][b].sum())],
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        ua, ca = int(df["users_a"].sum()), int(df["conv_a"].sum())
        ub, cb = int(df["users_b"].sum()), int(df["conv_b"].sum())
        ra = (1_000_000 * ca + ua // 2) // ua
        rb = (1_000_000 * cb + ub // 2) // ub
        p = (ca + cb) / (ua + ub)
        z = (cb / ub - ca / ua) / math.sqrt(
            p * (1 - p) * (1.0 / ua + 1.0 / ub))
        return pd.DataFrame({
            "users_a": pd.array([ua], "int64"),
            "conv_a": pd.array([ca], "int64"),
            "users_b": pd.array([ub], "int64"),
            "conv_b": pd.array([cb], "int64"),
            "rate_a_micro": pd.array([ra], "int64"),
            "rate_b_micro": pd.array([rb], "int64"),
            "lift_micro": pd.array([rb - ra], "int64"),
            "z_score": [float(np.round(z, 6))],
        })

    return (
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def columnar_encoding_audit(sf_dir: str, cols: tuple = ("lang", "source"),
                            n_ranges: int = 16):
    """Columnar-encoding audit (the storage-engine planning step a
    web-scale corpus runs before choosing parquet encodings): for each
    low-cardinality string column, the EXACT doc_id-ordered run count,
    distinct-value count, plain vs dictionary vs RLE size estimates.

    The interesting distributed bit is the exact global run count: each
    contiguous batch slice folds to ONE row (internal_runs, first/last
    value, first doc_id) — runs merge associatively by concatenating
    ordered slices and subtracting junctions where ``prev.last ==
    next.first`` — so the shuffle carries one constant-width row per
    (col × slice), a coarse ``doc_id``-range groupby folds slices to one
    row per (col × range), and the driver merges ≤ |cols|·n_ranges rows.
    Nothing re-ships the column data, and no stage assumes a block count.

    Width model: dict code width = bit_length(n_distinct−1) (min 1),
    est_dict = ceil(n_rows·w / 8) + dict_bytes, est_rle = ceil(n_runs·(w
    + 32) / 8) + dict_bytes (32-bit run lengths).  Byte sizes are UTF-8
    octets (DuckDB ``strlen``).
    """
    n_rows_meta = _table_num_rows(sf_dir, "documents")
    rng = max(1, -(-n_rows_meta // n_ranges))

    def slice_partial(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(doc) == 0:
            return pa.table({
                "grp": pa.array([], pa.string()),
                "col": pa.array([], pa.string()),
                "first_doc": pa.array([], pa.int64()),
                "runs": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "nbytes": pa.array([], pa.int64()),
                "first_val": pa.array([], pa.string()),
                "last_val": pa.array([], pa.string()),
            })
        order = np.argsort(doc, kind="stable")
        doc = doc[order]
        rows = []
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(str)[order]
            nbytes = int(pc.sum(pc.binary_length(
                pc.cast(t[c], pa.binary()))).as_py() or 0)
            runs = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
            rows.append((f"{c}:{int(doc[0]) // rng:08d}", c,
                         int(doc[0]), runs, len(v), nbytes,
                         str(v[0]), str(v[-1])))
        return pa.table({
            "grp": pa.array([r[0] for r in rows], pa.string()),
            "col": pa.array([r[1] for r in rows], pa.string()),
            "first_doc": pa.array([r[2] for r in rows], pa.int64()),
            "runs": pa.array([r[3] for r in rows], pa.int64()),
            "n": pa.array([r[4] for r in rows], pa.int64()),
            "nbytes": pa.array([r[5] for r in rows], pa.int64()),
            "first_val": pa.array([r[6] for r in rows], pa.string()),
            "last_val": pa.array([r[7] for r in rows], pa.string()),
        })

    def merge_slices(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("first_doc", kind="stable")
        junc = int((df["first_val"].to_numpy()[1:]
                    == df["last_val"].to_numpy()[:-1]).sum())
        return pd.DataFrame({
            "col": [df["col"].iloc[0]],
            "first_doc": pd.array([int(df["first_doc"].iloc[0])], "int64"),
            "runs": pd.array([int(df["runs"].sum()) - junc], "int64"),
            "n": pd.array([int(df["n"].sum())], "int64"),
            "nbytes": pd.array([int(df["nbytes"].sum())], "int64"),
            "first_val": [df["first_val"].iloc[0]],
            "last_val": [df["last_val"].iloc[-1]],
        })

    range_rows = (
        _read(sf_dir, "documents", ["doc_id"] + list(cols))
        .map_batches(slice_partial, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(merge_slices, batch_format="pandas")
        .repartition(1)
    ).to_pandas()

    def dict_measures(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            parts.append(pa.table({
                "col": pa.array([c] * t.num_rows, pa.string()),
                "val": pc.cast(t[c], pa.string()),
            }))
        longt = pa.concat_tables(parts)
        df = longt.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Count

    distinct = (
        _read(sf_dir, "documents", list(cols))
        .map_batches(dict_measures, batch_format="pyarrow")
        .groupby(["col", "val"])
        .aggregate(Count(alias_name="n_occurrences"))
    ).to_pandas()

    out = []
    for c in sorted(cols):
        g = range_rows[range_rows["col"] == c].sort_values("first_doc")
        junc = int((g["first_val"].to_numpy()[1:]
                    == g["last_val"].to_numpy()[:-1]).sum())
        n_runs = int(g["runs"].sum()) - junc
        n = int(g["n"].sum())
        plain = int(g["nbytes"].sum())
        dvals = distinct[distinct["col"] == c]["val"]
        d = len(dvals)
        dict_bytes = int(sum(len(s.encode()) for s in dvals))
        w = max(1, (d - 1).bit_length())
        out.append((c, n, d, n_runs, plain, dict_bytes, w,
                    (n * w + 7) // 8 + dict_bytes,
                    (n_runs * (w + 32) + 7) // 8 + dict_bytes))
    return pa.table({
        "col": pa.array([r[0] for r in out], pa.string()),
        "n_rows": pa.array([r[1] for r in out], pa.int64()),
        "n_distinct": pa.array([r[2] for r in out], pa.int64()),
        "n_runs": pa.array([r[3] for r in out], pa.int64()),
        "plain_bytes": pa.array([r[4] for r in out], pa.int64()),
        "dict_bytes": pa.array([r[5] for r in out], pa.int64()),
        "width_bits": pa.array([r[6] for r in out], pa.int64()),
        "est_dict_bytes": pa.array([r[7] for r in out], pa.int64()),
        "est_rle_bytes": pa.array([r[8] for r in out], pa.int64()),
    })


def map_at_k(sf_dir: str, k: int = 10, stride: int = 25):
    """MAP@k retrieval eval over the embedding corpus: every vector with
    ``vec_id % stride == 0`` is a query, a candidate is RELEVANT if it
    shares the query's ``label``, the ranking is exact cosine (rounded
    6 dp, ties by vec_id — the knn_cosine convention), and average
    precision is EXACT integer arithmetic: with L = lcm(1..10) = 2520,
    ``ap_num = Σ_{i relevant} cum_i · (L // i)`` is an integer, so
    ``AP = ap_num / (L·m)`` with m = min(|same-label| − 1, k) needs one
    half-up integer division into micro units — both engines divide the
    same integers, no float enters the rank math.

    Topology: queries are ONE filtered scan (nq rows); per corpus batch
    each query's top-k is pre-reduced (≤ nq·k short rows per batch, the
    payload never re-ships), a ~nq-way groupby folds per-query, and the
    driver sees nq bounded rows.  Label totals ride a separate tiny
    count aggregate.
    """
    assert k <= 10, "L=2520 covers ranks 1..10"
    L = 2520
    from ocr_ray.pipelines.simsearch import _cosine, _to_matrix

    def pick_queries(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % stride == 0))

    qtbl = _concat_nonempty(
        _read(sf_dir, "embeddings").map_batches(
            pick_queries, batch_format="pyarrow"))
    qids = qtbl["vec_id"].to_numpy(zero_copy_only=False)
    qlabs = qtbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _to_matrix(qtbl["embedding"])

    lab_counts = _grouped_sum(
        _read(sf_dir, "embeddings", ["label"]),
        lambda t: pa.table({"label": t["label"]}),
        keys=["label"], sum_cols=[], count_col="c",
    ).to_pandas()
    lab_map = dict(zip(lab_counts["label"].astype(int),
                       lab_counts["c"].astype(int)))

    q_ref = ray.put((qids, qlabs, qmat))

    def partial(t: pa.Table) -> pa.Table:
        ids_, labs_, qm = ray.get(q_ref)
        mat = _to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        labs = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_id, out_lab, out_sim = [], [], [], []
        for j in range(len(ids_)):
            sims = np.round(_cosine(mat, qm[j]), 6)
            mask = ids != ids_[j]
            sid, slab, ssim = ids[mask], labs[mask], sims[mask]
            order = np.lexsort((sid, -ssim))[:k]
            out_q.extend([int(ids_[j])] * len(order))
            out_id.extend(sid[order].tolist())
            out_lab.extend(slab[order].tolist())
            out_sim.extend(ssim[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "label": pa.array(out_lab, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })

    qlab_ref = ray.put(dict(zip(qids.tolist(), qlabs.tolist())))

    def per_query(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["qid"].iloc[0])
        qlab = ray.get(qlab_ref)[qid]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        rel = (g["label"].to_numpy(np.int64) == qlab).astype(np.int64)
        cum = np.cumsum(rel)
        ranks = np.arange(1, len(rel) + 1)
        ap_num = int((rel * cum * (L // ranks)).sum())
        return pd.DataFrame({
            "query_id": pd.array([qid], "int64"),
            "ap_num": pd.array([ap_num], "int64"),
            "n_rel_at_k": pd.array([int(rel.sum())], "int64"),
        })

    per_q = (
        _read(sf_dir, "embeddings")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(per_query, batch_format="pandas")
        .repartition(1)
    ).to_pandas().sort_values("query_id")

    rows = []
    for r in per_q.itertuples(index=False):
        qlab = int(qlabs[np.nonzero(qids == r.query_id)[0][0]])
        m = min(lab_map[qlab] - 1, k)
        ap_micro = (1_000_000 * int(r.ap_num) + (L * m) // 2) // (L * m)
        rows.append((int(r.query_id), m, int(r.n_rel_at_k), ap_micro))
    nq = len(rows)
    map_micro = (sum(r[3] for r in rows) + nq // 2) // nq
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "m": pa.array([r[1] for r in rows], pa.int64()),
        "n_rel_at_k": pa.array([r[2] for r in rows], pa.int64()),
        "ap_micro": pa.array([r[3] for r in rows], pa.int64()),
        "map_micro": pa.array([map_micro] * nq, pa.int64()),
    })


def hourly_autocorr(sf_dir: str, max_lag: int = 3):
    """Lag-1..max_lag autocorrelation of the densified hourly event-count
    series — the seasonality probe a streaming pipeline runs before
    picking window sizes.  The series is hour-truncated counts densified
    to every hour between min and max (missing hours count 0), and the
    sample autocorrelation is computed on EXACT integers: with n hours,
    S = Σc, the centered terms scale by n (``n·c_t − S``), so

      ``r_k = Σ_{t<n−k} (n·c_t − S)(n·c_{t+k} − S) / Σ_t (n·c_t − S)²``

    is a ratio of exact int64 sums; the one float step is the final IEEE
    division (same expression shape both engines, rounded 6 dp).

    Topology: the only shuffle is the hour-count groupby (pre-combined
    per batch by `_grouped_sum`, cardinality = #hours); densify + lag
    products run on the bounded hourly series in one repartition(1)
    task.  Output one row per lag: (lag, n_hours, n_terms, r_autocorr).
    """

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({
            "hr": pc.floor_temporal(t["ts"], unit="hour"),
        })

    counts = _grouped_sum(
        _read(sf_dir, "events", ["ts"]), measures,
        keys=["hr"], sum_cols=[], count_col="c",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("hr")
        hrs = df["hr"].to_numpy("datetime64[us]")
        c_obs = df["c"].to_numpy(np.int64)
        full = np.arange(hrs[0], hrs[-1] + np.timedelta64(1, "h"),
                         np.timedelta64(1, "h"))
        c = np.zeros(len(full), np.int64)
        c[np.searchsorted(full, hrs)] = c_obs
        n = len(c)
        S = int(c.sum())
        d = (n * c - S).astype(object)  # python ints: no int64 overflow
        den = int(sum(x * x for x in d))
        out = []
        for lag in range(1, max_lag + 1):
            num = int(sum(d[t] * d[t + lag] for t in range(n - lag)))
            # float() each exact int FIRST (the SQL CAST-then-divide
            # shape) so both engines round the same two doubles
            r = float(np.round(float(num) / float(den), 6))
            out.append((lag, n, n - lag, r))
        res = pd.DataFrame(out, columns=["lag", "n_hours", "n_terms",
                                         "r_autocorr"])
        for col in ("lag", "n_hours", "n_terms"):
            res[col] = res[col].astype("int64")
        return res

    return counts.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None)


def dbscan_core_points(sf_dir: str, tau2_num: int = 9, tau2_den: int = 100,
                       min_pts: int = 5, n_blocks: int | None = None,
                       n_buckets: int = 64):
    """DBSCAN density audit over the embedding corpus: a point's
    eps-neighborhood is cosine similarity ≥ τ with τ² = tau2_num /
    tau2_den, a point is CORE when |N(p)| + 1 ≥ min_pts (itself
    included, standard DBSCAN), and the query rolls up per label:
    ``(label, n_points, n_core, sum_nbrs)``.

    The neighbor predicate is EXACT INTEGER: embeddings quantize to
    milli-units q = half-away(1000·v) (float32→float64→round, both
    engines bit-identical), and ``sim ≥ τ  ⇔  dot > 0 ∧ tau2_den·dot²
    ≥ tau2_num·‖a‖²·‖b‖²`` — no float ever enters the comparison, so
    the DuckDB oracle reproduces every neighbor decision from the same
    int64s.

    Topology = the block-partitioned all-pairs of
    :func:`ocr_ray.pipelines.simsearch.embedding_near_dup` (vec_id %
    n_blocks, unordered block-pair groups, per-group integer matmul),
    but groups emit per-point neighbor-COUNT partials, never pairs: the
    (b,b) group emits every point once (count ≥ 0, so isolated points
    are covered) and cross groups emit only nonzero partials; a coarse
    vec_id-bucket groupby folds per-point totals and per-label bucket
    rows, and the driver sums ≤ n_buckets·|labels| rows.
    """
    from ocr_ray.pipelines.simsearch import _to_matrix

    if n_blocks is None:
        n_blocks = DEFAULT_CONFIG.near_dup_blocks

    def quant(mat: np.ndarray) -> np.ndarray:
        x = mat * 1000.0
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    def replicate(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = t["embedding"]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        blk = ids % n_blocks
        out = {"vec_id": [], "label": [], "blk": [], "lo": [], "hi": []}
        vec_parts = []
        for other in range(n_blocks):
            out["vec_id"].append(ids)
            out["label"].append(labs)
            out["blk"].append(blk)
            vec_parts.append(vecs)
            out["lo"].append(np.minimum(blk, other))
            out["hi"].append(np.maximum(blk, other))
        return pa.table({
            "vec_id": pa.array(np.concatenate(out["vec_id"]), pa.int64()),
            "label": pa.array(np.concatenate(out["label"]), pa.int64()),
            "blk": pa.array(np.concatenate(out["blk"]), pa.int32()),
            "embedding": pa.concat_arrays(vec_parts),
            "lo": pa.array(np.concatenate(out["lo"]), pa.int32()),
            "hi": pa.array(np.concatenate(out["hi"]), pa.int32()),
        })

    def _pred(qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
        dot = qa @ qb.T
        na = (qa * qa).sum(1)
        nb = (qb * qb).sum(1)
        return (dot > 0) & (tau2_den * dot * dot
                            >= tau2_num * np.outer(na, nb))

    def block_counts(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = int(g["lo"].iloc[0]), int(g["hi"].iloc[0])
        g = g.drop_duplicates(subset=["vec_id", "blk"])
        ga = g[g["blk"] == lo]
        ids_a = ga["vec_id"].to_numpy(np.int64)
        lab_a = ga["label"].to_numpy(np.int64)
        qa = quant(np.stack(ga["embedding"].to_numpy()).astype(np.float64))
        if lo == hi:
            p = _pred(qa, qa)
            np.fill_diagonal(p, False)
            cnt = p.sum(1).astype(np.int64)
            return pd.DataFrame({"vec_id": ids_a, "label": lab_a,
                                 "nbrs": cnt})
        gb = g[g["blk"] == hi]
        ids_b = gb["vec_id"].to_numpy(np.int64)
        lab_b = gb["label"].to_numpy(np.int64)
        if len(ids_a) == 0 or len(ids_b) == 0:
            return pd.DataFrame({"vec_id": np.array([], np.int64),
                                 "label": np.array([], np.int64),
                                 "nbrs": np.array([], np.int64)})
        qb = quant(np.stack(gb["embedding"].to_numpy()).astype(np.float64))
        p = _pred(qa, qb)
        ca, cb = p.sum(1).astype(np.int64), p.sum(0).astype(np.int64)
        ka, kb = ca > 0, cb > 0
        return pd.DataFrame({
            "vec_id": np.concatenate([ids_a[ka], ids_b[kb]]),
            "label": np.concatenate([lab_a[ka], lab_b[kb]]),
            "nbrs": np.concatenate([ca[ka], cb[kb]]),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t["vec_id"].to_numpy(zero_copy_only=False)
             % n_buckets).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("vec_id", as_index=False).agg(
            label=("label", "first"), nbrs=("nbrs", "sum"))
        per["core"] = ((per["nbrs"] + 1) >= min_pts).astype("int64")
        out = per.groupby("label", as_index=False).agg(
            n_points=("vec_id", "size"), n_core=("core", "sum"),
            sum_nbrs=("nbrs", "sum"))
        for c in ("n_points", "n_core", "sum_nbrs"):
            out[c] = out[c].astype("int64")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("label", as_index=False)[
            ["n_points", "n_core", "sum_nbrs"]].sum()
        for c in ("n_points", "n_core", "sum_nbrs"):
            out[c] = out[c].astype("int64")
        return out.sort_values("label")

    return (
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .map_groups(block_counts, batch_format="pandas")
        # drop the sort-groupby's schema-less empty blocks before the
        # next groupby (CLAUDE.md dedupe_pairs precedent)
        .repartition(16)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def dirichlet_ql_search(sf_dir: str, query: str = "table hash join",
                        k: int = 20, mu: float = 2000.0):
    """Query-likelihood retrieval with Dirichlet smoothing (the language-
    modeling scorer beside bm25_search / tfidf_top_docs / wand): a doc
    with at least one query-term hit scores

      ``Σ_q 1e6 · ln((tf_q + μ·(cf_q / C)) / (|D| + μ))``

    over ALL query terms (tf = 0 terms contribute the background prob —
    the defining difference from tf-only scorers), each term's
    contribution half-away rounded to integer micro-nats BEFORE the sum
    (the bm25 float-parity convention: both engines sum identical ints).

    Same two-bounded-pass topology as bm25_search: (1) collection stats
    (total token count C, per-term collection frequency cf) as per-batch
    int partials `_prefold`-reduced to driver scalars; (2) broadcast
    scalars score every batch, per-batch top-k, one repartition(1)
    bounded reduce → exactly k rows (score desc, doc_id asc)."""
    import collections
    import re

    _ws = re.compile(r"[ \t\n\f\r]+")
    terms = query.lower().split()
    MU = float(mu)

    def _toks(txt: str) -> list:
        return [x for x in _ws.split((txt or "").lower()) if x]

    def stat_partial(t: pa.Table) -> pa.Table:
        sum_dl = 0
        cfs = [0] * len(terms)
        for txt in t["text"].to_pylist():
            toks = _toks(txt)
            sum_dl += len(toks)
            c = collections.Counter(toks)
            for i, q in enumerate(terms):
                cfs[i] += c.get(q, 0)
        cols = {"sum_dl": pa.array([sum_dl], pa.int64())}
        for i in range(len(terms)):
            cols[f"cf_{i}"] = pa.array([cfs[i]], pa.int64())
        return pa.table(cols)

    def stat_add(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        return pa.table({c: pa.array([int(pc.sum(t[c]).as_py() or 0)],
                                     pa.int64())
                         for c in t.column_names})

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    srows = _prefold(ds.map_batches(stat_partial, batch_format="pyarrow"),
                     stat_add).take_all()
    total = sum(r["sum_dl"] for r in srows)
    cfs = [sum(r[f"cf_{i}"] for r in srows) for i in range(len(terms))]
    # background mass per term, same expression shape as the oracle:
    # MU * (cf / C)
    bg = [MU * (float(cf) / float(total)) for cf in cfs]

    def score_partial(t: pa.Table) -> pa.Table:
        ids, scores = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _toks(txt)
            c = collections.Counter(toks)
            if not any(q in c for q in terms):
                continue
            dl = float(len(toks))
            s = 0
            for i, q in enumerate(terms):
                x = 1e6 * float(np.log((float(c.get(q, 0)) + bg[i])
                                       / (dl + MU)))
                s += int(np.copysign(np.floor(abs(x) + 0.5), x))
            ids.append(did)
            scores.append(s)
        df = pd.DataFrame({"doc_id": pd.array(ids, "int64"),
                           "score_e6": pd.array(scores, "int64")})
        df = df.sort_values(["score_e6", "doc_id"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("score_e6", "descending"),
                                            ("doc_id", "ascending")])[:k]
        return t.take(idx)

    return (ds.map_batches(score_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def bom_cost_rollup(sf_dir: str, k: int = 20, n_buckets: int = 64):
    """Bill-of-materials rollup over the derived part hierarchy
    (``parent(v) = (v·2654435761 mod 2³²) mod v``, root 0 — the
    tree_depths tree): every part's SUBTREE cost (sum of retail-price
    cents over itself and all descendants) and subtree size, top-k by
    cost.  The oracle is the ancestor-closure recursive CTE.

    The scale trick: parent() is a pure FUNCTION of the key, so each
    batch enumerates its rows' ENTIRE ancestor chains locally (a ~log-
    depth vectorized loop, no index lookup, no per-round shuffle —
    contrast tree_depths, whose pointer doubling exists because that
    query needs per-node DATA from the directory).  Each batch then
    pre-sums its (ancestor → cost, count) contributions, ONE coarse
    bucket exchange co-locates each ancestor's partials, the per-bucket
    pandas fold emits that bucket's top-k candidates only, and the
    repartition(1) tail keeps the global top-k.  Shuffle volume is
    per-batch-distinct ancestors × 3 ints — never the closure.
    """

    def chain_partial(t: pa.Table) -> pa.Table:
        ids = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cost = _cents(t["p_retailprice"], 100).to_numpy(
            zero_copy_only=False).astype(np.int64)
        anc_all, cost_all = [ids], [cost]
        cur, live_cost = ids, cost
        while True:
            live = cur > 0
            if not live.any():
                break
            cur = cur[live]
            live_cost = live_cost[live]
            cur = (cur * 2654435761 % 2**32) % cur
            anc_all.append(cur)
            cost_all.append(live_cost)
        df = pd.DataFrame({
            "anc": np.concatenate(anc_all),
            "c": np.concatenate(cost_all),
        }).groupby("anc", as_index=False).agg(
            c=("c", "sum"), n=("c", "size"))
        df["n"] = df["n"].astype("int64")
        df["bucket"] = (df["anc"] % n_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("anc", as_index=False).agg(
            subtree_cost_cents=("c", "sum"), n_desc=("n", "sum"))
        agg = agg.sort_values(["subtree_cost_cents", "anc"],
                              ascending=[False, True]).head(k)
        out = pd.DataFrame({
            "node": agg["anc"].astype("int64"),
            "n_desc": agg["n_desc"].astype("int64"),
            "subtree_cost_cents": agg["subtree_cost_cents"].astype("int64"),
        })
        return out

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("subtree_cost_cents", "descending"),
                          ("node", "ascending")])[:k]
        return t.take(idx)

    return (
        _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
        .map_batches(chain_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def link_prediction_scores(sf_dir: str, k: int = 20, n_buckets: int = 64):
    """Link prediction over the derived undirected doc graph (edges
    ``u — (2u+1) mod N, (3u+2) mod N, (5u+3) mod N`` — the
    triangle_counts graph): for every NON-adjacent pair with ≥1 common
    neighbor, the common-neighbor count and Adamic-Adar score
    ``Σ_w 1e6/ln(deg(w))`` (each apex term half-away rounded to micro
    BEFORE the sum — the repo's float-parity convention; a wedge apex
    always has deg ≥ 2 so ln never hits 0), top-k by (aa desc, u, v).

    Two coarse exchanges: (1) node-bucket adjacency build — both edge
    directions keyed by endpoint; per bucket a vectorized dedup +
    degree + self-merge wedge fan-out (deg ≤ 6 ⇒ ≤ 15 wedges/node)
    emits (a, b, apex_deg) rows keyed by the synthesized int64 pair key
    a·2³² + b; (2) pair-bucket fold — cn / aa per pair, EXISTING edges
    dropped by evaluating the pure edge function (no anti-join: ``b ∈
    out(a) ∨ a ∈ out(b)`` is O(1) arithmetic), per-bucket top-k; a
    repartition(1) tail keeps the global top-k.  No join operator, no
    broadcast adjacency, shuffles carry short int rows only.
    """
    n_docs = _table_num_rows(sf_dir, "documents")
    gens = ((2, 1), (3, 2), (5, 3))

    def edges_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = [(m * ids + c) % n_docs for m, c in gens]
        u = np.concatenate([ids] * len(gens) + dsts)
        v = np.concatenate(dsts + [ids] * len(gens))
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "node": pa.array(u, pa.int64()),
            "nbr": pa.array(v, pa.int64()),
            "bucket": pa.array((u % n_buckets).astype(np.int32), pa.int32()),
        })

    def wedge_fold(g: pd.DataFrame) -> pd.DataFrame:
        adj = g[["node", "nbr"]].drop_duplicates()
        deg = adj.groupby("node")["nbr"].size().rename("deg")
        adj = adj.merge(deg, left_on="node", right_index=True)
        w = adj.merge(adj, on="node", suffixes=("_x", "_y"))
        w = w[w["nbr_x"] < w["nbr_y"]]
        a = w["nbr_x"].to_numpy(np.int64)
        b = w["nbr_y"].to_numpy(np.int64)
        pk = a * (2 ** 32) + b
        return pd.DataFrame({
            "a": a, "b": b,
            "apex_deg": w["deg_x"].to_numpy(np.int64),
            "pbucket": (pk % n_buckets).astype(np.int32),
        })

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        x = 1e6 / np.log(g["apex_deg"].to_numpy(np.float64))
        g = g.assign(aa=np.floor(x + 0.5).astype(np.int64))
        agg = g.groupby(["a", "b"], as_index=False).agg(
            cn=("aa", "size"), aa_micro=("aa", "sum"))
        a = agg["a"].to_numpy(np.int64)
        b = agg["b"].to_numpy(np.int64)
        adjacent = np.zeros(len(a), bool)
        for m, c in gens:
            adjacent |= ((m * a + c) % n_docs) == b
            adjacent |= ((m * b + c) % n_docs) == a
        agg = agg[~adjacent]
        agg = agg.sort_values(["aa_micro", "a", "b"],
                              ascending=[False, True, True]).head(k)
        return pd.DataFrame({
            "u": agg["a"].astype("int64"),
            "v": agg["b"].astype("int64"),
            "cn": agg["cn"].astype("int64"),
            "aa_micro": agg["aa_micro"].astype("int64"),
        })

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("aa_micro", "descending"), ("u", "ascending"),
                          ("v", "ascending")])[:k]
        return t.take(idx)

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(edges_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedge_fold, batch_format="pandas")
        .repartition(16)
        .groupby("pbucket")
        .map_groups(pair_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def feature_hash_collision_audit(sf_dir: str,
                                 dims: tuple = (256, 1024, 4096),
                                 n_buckets: int = 64):
    """Hashing-trick audit: map the corpus VOCABULARY into D feature
    buckets via ``md5(term) % D`` (the oracle-reproducible hash) for
    each candidate dimensionality D and report, per D: vocab size,
    buckets used, buckets with collisions, max load, terms losing
    identity (bucket load ≥ 2), the exact integer collision rate in
    micro units, and the birthday-model expected bucket usage
    ``D·(1 − exp(V·ln(1 − 1/D)))`` (float, 6 dp, same expression shape
    both engines) — the pre-flight a fastText-style featurizer runs
    before fixing its hash dimension.

    Exactness topology: every D is a multiple of the coarse bucket
    count, so ``md5 % 64`` co-locates each FEATURE bucket's whole term
    set in exactly one coarse bucket — per-batch distinct terms ride
    ONE exchange, the per-coarse-bucket fold computes exact per-D load
    histogram partials (n_used / n_collision_buckets / max_load /
    n_collided_terms sum globally because feature buckets never span
    coarse buckets), and the driver folds ≤ 64·|dims| short rows.
    """
    import math

    for d in dims:
        assert d % n_buckets == 0, "feature buckets must nest in coarse"

    def term_partial(t: pa.Table) -> pa.Table:
        vocab = set()
        for txt in t["text"].to_pylist():
            vocab.update(x for x in (txt or "").lower().split() if x)
        terms = sorted(vocab)
        u = _md5_u64(terms)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "bucket": pa.array((u % np.uint64(n_buckets)).astype(np.int64),
                               pa.int64()),
        })

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        terms = g["term"].drop_duplicates().tolist()
        u = _md5_u64(terms)
        rows = []
        for d in dims:
            fb = u % np.uint64(d)
            _, loads = np.unique(fb, return_counts=True)
            rows.append((d, len(terms), len(loads),
                         int((loads >= 2).sum()), int(loads.max()),
                         int(loads[loads >= 2].sum())))
        return pd.DataFrame(rows, columns=[
            "dim", "n_terms", "n_used", "n_collision_buckets",
            "max_load", "n_collided_terms"]).astype("int64")

    parts = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(term_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
    ).to_pandas()

    out = []
    for d in sorted(dims):
        g = parts[parts["dim"] == d]
        v = int(g["n_terms"].sum())
        n_coll = int(g["n_collided_terms"].sum())
        expected = float(np.round(
            d * (1.0 - math.exp(v * math.log(1.0 - 1.0 / d))), 6))
        out.append((d, v, int(g["n_used"].sum()),
                    int(g["n_collision_buckets"].sum()),
                    int(g["max_load"].max()), n_coll,
                    (1_000_000 * n_coll + v // 2) // v, expected))
    return pa.table({
        "dim": pa.array([r[0] for r in out], pa.int64()),
        "n_terms": pa.array([r[1] for r in out], pa.int64()),
        "n_used": pa.array([r[2] for r in out], pa.int64()),
        "n_collision_buckets": pa.array([r[3] for r in out], pa.int64()),
        "max_load": pa.array([r[4] for r in out], pa.int64()),
        "n_collided_terms": pa.array([r[5] for r in out], pa.int64()),
        "collision_rate_micro": pa.array([r[6] for r in out], pa.int64()),
        "expected_used_6dp": pa.array([r[7] for r in out], pa.float64()),
    })


def pr_curve_points(sf_dir: str):
    """Precision-recall curve at 9 thresholds for the repo's standard
    deterministic classifier (score = min(n_chars, 500)/500, positive =
    lang = 'en' — the calibration_bins / score_auc_eval classifier), so
    the eval family (AUC, NDCG, MAP, calibration) gains its operating-
    point sweep.  The threshold compare is EXACT INTEGER (score ≥ k/10
    ⇔ min(n_chars,500) ≥ 50·k), confusion counts are per-batch int
    partials summed by one 9-key groupby, and precision / recall / F1
    are single half-up integer divisions into micro units (F1 directly
    as 2·tp / (2·tp + fp + fn) — no float chaining).
    """

    def partial(t: pa.Table) -> pa.Table:
        m = np.minimum(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
            500)
        pos = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        rows = []
        for k in range(1, 10):
            pred = m >= 50 * k
            rows.append((k, int((pos & pred).sum()),
                         int((~pos & pred).sum()),
                         int((pos & ~pred).sum())))
        df = pd.DataFrame(rows, columns=["k", "tp", "fp", "fn"])
        return pa.Table.from_pandas(df.astype("int64"),
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    counts = (
        _read(sf_dir, "documents", ["n_chars", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
                   Sum("fn", alias_name="fn"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("k")
        out = []
        for r in df.itertuples(index=False):
            tp, fp, fn = int(r.tp), int(r.fp), int(r.fn)
            prec = ((1_000_000 * tp + (tp + fp) // 2) // (tp + fp)
                    if tp + fp else 0)
            rec = ((1_000_000 * tp + (tp + fn) // 2) // (tp + fn)
                   if tp + fn else 0)
            f1 = ((2_000_000 * tp + (2 * tp + fp + fn) // 2)
                  // (2 * tp + fp + fn) if 2 * tp + fp + fn else 0)
            out.append((int(r.k) * 100_000, tp, fp, fn, prec, rec, f1))
        res = pd.DataFrame(out, columns=[
            "threshold_micro", "tp", "fp", "fn",
            "precision_micro", "recall_micro", "f1_micro"])
        return res.astype("int64")

    return counts.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None)


def kleinberg_burst_viterbi(sf_dir: str):
    """Kleinberg-style two-state burst detection over the densified
    hourly event-count series: state q0 emits at the base rate λ0 =
    S/n, state q1 at λ1 = 2·λ0, per-hour emission cost ``λ_s − c_t·ln
    λ_s`` (the Poisson NLL with the state-independent ln c! term
    dropped — it cancels in every comparison), entering a burst costs
    γ = ln n, leaving is free.  The Viterbi path marks each hour 0/1.

    Exactness: every emission cost and γ is half-away rounded to
    integer micro-nats FIRST; the DP is then pure int64 adds and mins
    (ties prefer staying low via ``≤``), so both engines walk identical
    tables — the oracle is a recursive CTE that carries the argmin
    path as a growing 0/1 string.  Topology: ONE hour-count exchange
    (per-batch pre-agg, cardinality = #hours), then the bounded-series
    DP in the repartition(1) tail (the hourly_autocorr shape).  Output
    per hour: (t, c, state) plus the run-level burst id (-1 outside
    bursts).
    """

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({"hr": pc.floor_temporal(t["ts"], unit="hour")})

    counts = _grouped_sum(
        _read(sf_dir, "events", ["ts"]), measures,
        keys=["hr"], sum_cols=[], count_col="c",
    )

    def _ha(x: float) -> int:
        return int(np.copysign(np.floor(abs(x) + 0.5), x))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("hr")
        hrs = df["hr"].to_numpy("datetime64[us]")
        c_obs = df["c"].to_numpy(np.int64)
        full = np.arange(hrs[0], hrs[-1] + np.timedelta64(1, "h"),
                         np.timedelta64(1, "h"))
        c = np.zeros(len(full), np.int64)
        c[np.searchsorted(full, hrs)] = c_obs
        n = len(c)
        S = int(c.sum())
        lam0 = float(S) / float(n)
        lam1 = 2.0 * (float(S) / float(n))
        import math
        cost0 = [_ha(1e6 * (lam0 - float(ci) * math.log(lam0)))
                 for ci in c]
        cost1 = [_ha(1e6 * (lam1 - float(ci) * math.log(lam1)))
                 for ci in c]
        gamma = _ha(1e6 * math.log(float(n)))
        # viterbi over exact ints; tie prefers low state (<=)
        d0, d1 = cost0[0], cost1[0] + gamma
        bp = []  # (from_for_0, from_for_1)
        for t in range(1, n):
            f0 = 0 if d0 <= d1 else 1
            nd0 = cost0[t] + (d0 if f0 == 0 else d1)
            f1 = 1 if d1 <= d0 + gamma else 0
            nd1 = cost1[t] + (d1 if f1 == 1 else d0 + gamma)
            bp.append((f0, f1))
            d0, d1 = nd0, nd1
        states = np.zeros(n, np.int64)
        s = 0 if d0 <= d1 else 1
        states[n - 1] = s
        for t in range(n - 2, -1, -1):
            s = bp[t][s]
            states[t] = s
        # burst run ids (-1 outside)
        burst_id = np.full(n, -1, np.int64)
        bid = -1
        for t in range(n):
            if states[t] == 1:
                if t == 0 or states[t - 1] == 0:
                    bid += 1
                burst_id[t] = bid
        return pd.DataFrame({
            "t": pd.array(range(1, n + 1), "int64"),
            "c": pd.array(c, "int64"),
            "state": pd.array(states, "int64"),
            "burst_id": pd.array(burst_id, "int64"),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None)


def join_cardinality_estimate(sf_dir: str, topk: int = 10,
                              n_buckets: int = 64):
    """Query-optimizer cardinality estimation audit for the skewed
    self-equi-join ``events ⋈ events ON user_id``: the exact join size
    Σ c_u², the uniform-histogram estimate N²/d, and the end-biased
    estimate (top-k heavy keys exact + uniform remainder) — the
    planner's classic error-vs-sketch-size trade-off, made auditable
    because every estimate here is integer arithmetic over exact
    distributed counts.

    One coarse exchange on ``md5(user_id) % 64`` carrying per-batch
    pre-aggregated (user, partial count) rows; each bucket owns its
    users outright, so per-bucket Σc, Σc², d and the bucket's top-k
    candidates are exact and SUM/merge globally (the global top-k is a
    subset of the union of bucket top-k's); the driver folds ≤
    64·(3 + k) short rows.  Estimates use half-up integer division;
    relative errors are ``(1e6·|est − actual| + actual//2) // actual``.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
        }).groupby("user_id", as_index=False).size()
        df["bucket"] = _md5_mod(df["user_id"], n_buckets).astype(np.int32)
        df["size"] = df["size"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("user_id", as_index=False)["size"].sum()
        c = per["size"].to_numpy(np.int64)
        top = per.sort_values(["size", "user_id"],
                              ascending=[False, True]).head(topk)
        summary = pd.DataFrame({
            "kind": [0], "user_id": [-1],
            "n": [int(c.sum())], "d": [len(c)],
            "sumsq": [int((c * c).sum())],
        })
        cand = pd.DataFrame({
            "kind": 1, "user_id": top["user_id"].astype("int64"),
            "n": top["size"].astype("int64"), "d": 0, "sumsq": 0,
        })
        out = pd.concat([summary, cand], ignore_index=True)
        for col in ("kind", "user_id", "n", "d", "sumsq"):
            out[col] = out[col].astype("int64")
        return out

    rows = (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
    ).to_pandas()

    summ = rows[rows["kind"] == 0]
    n = int(summ["n"].sum())
    d = int(summ["d"].sum())
    actual = int(summ["sumsq"].sum())
    cand = rows[rows["kind"] == 1].sort_values(
        ["n", "user_id"], ascending=[False, True]).head(topk)
    top_c = cand["n"].to_numpy(np.int64)
    est_uniform = (n * n + d // 2) // d
    n_rest = n - int(top_c.sum())
    d_rest = d - len(top_c)
    est_eb = int((top_c * top_c).sum()) + (
        (n_rest * n_rest + d_rest // 2) // d_rest if d_rest > 0 else 0)
    err_u = (1_000_000 * abs(est_uniform - actual) + actual // 2) // actual
    err_e = (1_000_000 * abs(est_eb - actual) + actual // 2) // actual
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_distinct": pa.array([d], pa.int64()),
        "actual_pairs": pa.array([actual], pa.int64()),
        "est_uniform": pa.array([est_uniform], pa.int64()),
        "est_endbiased": pa.array([est_eb], pa.int64()),
        "err_uniform_micro": pa.array([err_u], pa.int64()),
        "err_endbiased_micro": pa.array([err_e], pa.int64()),
    })


def medoid_per_label(sf_dir: str):
    """Exact squared-euclidean MEDOID per embedding label — the cluster
    exemplar selection step (kmeans gives centroids; a curation
    pipeline ships the nearest REAL document).  The trick that keeps it
    one-pass: with quantized integer vectors,

      ``Σ_b ‖a − b‖² = m·‖a‖² − 2·a·s + S2``

    (m = label size, s = Σ_b b the label's vector sum, S2 = Σ_b ‖b‖²),
    so the medoid argmin needs only per-label sufficient statistics —
    never a pairwise pass.  Vectors quantize to milli-units (the
    dbscan_core_points convention) so every distance sum is an exact
    int64 and the DuckDB oracle replays the same integers.

    Topology: pass 1 folds per-batch (label → m, s, S2) partials
    through `_prefold` (s is a dim-width int64 blob, constant per
    batch×label); the driver broadcasts the ≤|labels| stats; pass 2
    scores each batch vectorized and keeps a per-batch argmin per
    label; the repartition(1) tail picks the global argmin (ties by
    vec_id asc).  Output: (label, medoid_vec_id, sum_sqdist).
    """
    from ocr_ray.pipelines.simsearch import _to_matrix

    def quant(mat: np.ndarray) -> np.ndarray:
        x = mat * 1000.0
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    def stat_partial(t: pa.Table) -> pa.Table:
        q = quant(_to_matrix(t["embedding"]))
        labs = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = {"label": [], "m": [], "s2": [], "svec": []}
        for lab in np.unique(labs):
            sub = q[labs == lab]
            rows["label"].append(int(lab))
            rows["m"].append(sub.shape[0])
            rows["s2"].append(int((sub * sub).sum()))
            rows["svec"].append(sub.sum(axis=0).tobytes())
        return pa.table({
            "label": pa.array(rows["label"], pa.int64()),
            "m": pa.array(rows["m"], pa.int64()),
            "s2": pa.array(rows["s2"], pa.int64()),
            "svec": pa.array(rows["svec"], pa.binary()),
        })

    def stat_add(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = {"label": [], "m": [], "s2": [], "svec": []}
        for lab, g in df.groupby("label"):
            out["label"].append(int(lab))
            out["m"].append(int(g["m"].sum()))
            out["s2"].append(int(g["s2"].sum()))
            vecs = np.stack([np.frombuffer(b, np.int64)
                             for b in g["svec"]])
            out["svec"].append(vecs.sum(axis=0).tobytes())
        return pa.table({
            "label": pa.array(out["label"], pa.int64()),
            "m": pa.array(out["m"], pa.int64()),
            "s2": pa.array(out["s2"], pa.int64()),
            "svec": pa.array(out["svec"], pa.binary()),
        })

    stats = _prefold(
        _read(sf_dir, "embeddings", ["embedding", "label"])
        .map_batches(stat_partial, batch_format="pyarrow"),
        stat_add).to_pandas()
    # final driver fold of <= n_buckets x |labels| rows
    agg = {}
    for r in stats.itertuples(index=False):
        lab = int(r.label)
        if lab not in agg:
            agg[lab] = [0, 0, None]
        agg[lab][0] += int(r.m)
        agg[lab][1] += int(r.s2)
        v = np.frombuffer(r.svec, np.int64)
        agg[lab][2] = v if agg[lab][2] is None else agg[lab][2] + v
    stats_ref = ray.put({lab: (m, s2, sv.tobytes())
                         for lab, (m, s2, sv) in agg.items()})

    def score_partial(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        q = quant(_to_matrix(t["embedding"]))
        labs = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {"label": [], "medoid_vec_id": [], "sum_sqdist": []}
        for lab in np.unique(labs):
            m, s2, svb = st[int(lab)]
            s = np.frombuffer(svb, np.int64)
            mask = labs == lab
            sub, sid = q[mask], ids[mask]
            na2 = (sub * sub).sum(axis=1)
            cost = m * na2 - 2 * (sub @ s) + s2
            j = np.lexsort((sid, cost))[0]
            out["label"].append(int(lab))
            out["medoid_vec_id"].append(int(sid[j]))
            out["sum_sqdist"].append(int(cost[j]))
        return pa.table({
            "label": pa.array(out["label"], pa.int64()),
            "medoid_vec_id": pa.array(out["medoid_vec_id"], pa.int64()),
            "sum_sqdist": pa.array(out["sum_sqdist"], pa.int64()),
        })

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["label", "sum_sqdist", "medoid_vec_id"])
        keep = df.drop_duplicates("label", keep="first")
        return pa.Table.from_pandas(
            keep.sort_values("label").reset_index(drop=True),
            preserve_index=False)

    return (
        _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
        .map_batches(score_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def haar_wavelet_energy(sf_dir: str):
    """Unnormalized Haar wavelet decomposition of the densified hourly
    event-count series (zero-padded to the next power of two): per
    detail level the coefficient count and EXACT integer energy
    ``Σ (a[2i] − a[2i+1])²`` with ``a`` the previous level's pairwise
    sums — the multi-resolution seasonality screen beside
    hourly_autocorr's fixed-lag view (a spiky series loads the fine
    levels, a slowly-drifting one loads the coarse levels).  Level 0
    reports the final approximation coefficient's energy (the squared
    grand total).  All arithmetic is int64 sums/differences of counts —
    the oracle replays the identical pyramid through a single-row
    recursive CTE carrying the level array as a LIST.

    Topology: one hour-count exchange (per-batch pre-agg), then the
    bounded-series pyramid in the repartition(1) tail (the
    hourly_autocorr shape); log₂(n) levels of pure driver-free integer
    math inside the final task.
    """

    def measures(t: pa.Table) -> pa.Table:
        return pa.table({"hr": pc.floor_temporal(t["ts"], unit="hour")})

    counts = _grouped_sum(
        _read(sf_dir, "events", ["ts"]), measures,
        keys=["hr"], sum_cols=[], count_col="c",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("hr")
        hrs = df["hr"].to_numpy("datetime64[us]")
        c_obs = df["c"].to_numpy(np.int64)
        full = np.arange(hrs[0], hrs[-1] + np.timedelta64(1, "h"),
                         np.timedelta64(1, "h"))
        c = np.zeros(len(full), np.int64)
        c[np.searchsorted(full, hrs)] = c_obs
        n = len(c)
        n2 = 1 << max(0, (n - 1).bit_length()) if n > 1 else 1
        a = np.zeros(n2, np.int64)
        a[:n] = c
        rows = []
        lvl = 0
        while len(a) > 1:
            lvl += 1
            s = a[0::2] + a[1::2]
            d = a[0::2] - a[1::2]
            rows.append((lvl, len(d), int((d * d).sum())))
            a = s
        rows.append((0, 1, int(a[0]) ** 2))
        out = pd.DataFrame(rows, columns=["level", "n_coeffs", "energy"])
        return out.astype("int64").sort_values("level")

    return counts.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None)


def _leb_len(x: int) -> int:
    """LEB128 encoded byte length (the postings_varint_size model)."""
    return max(1, (int(x).bit_length() + 6) // 7)


def front_coding_audit(sf_dir: str):
    """Front-coding (incremental/prefix) compression audit of the
    SORTED ``p_name`` column — the dictionary-block layout every
    search-engine term dictionary and sorted-string-table uses: each
    entry after the first stores (LEB128 lcp, LEB128 suffix_len,
    suffix bytes).  Reports exact totals: n_strings, plain_bytes,
    Σ lcp, front-coded bytes, and the integer-micro savings ratio.

    This is the repo's ``Dataset.sort`` showcase: the global string
    sort range-partitions the column into ORDERED, DISJOINT blocks, so
    each block audits its interior pairs locally and emits one
    constant-width row (n, plain, Σlcp, front_bytes with the block's
    first entry provisionally stored FULL, plus the boundary strings);
    the driver merge re-encodes only the ≤ n_blocks boundary entries
    against their global predecessor (the columnar_encoding_audit
    ordered-slice-merge shape).  Equal keys may straddle blocks — the
    lcp of equal strings is total either way, so tie placement cannot
    change any sum.  ASCII byte semantics (strlen == char length) are
    asserted per batch.
    """

    def lcp(a: bytes, b: bytes) -> int:
        n = min(len(a), len(b))
        i = 0
        while i < n and a[i] == b[i]:
            i += 1
        return i

    def slice_partial(t: pa.Table) -> pa.Table:
        names = [s.encode() for s in t["p_name"].to_pylist()]
        assert all(len(b) == len(b.decode())
                   for b in names), "non-ascii p_name"
        n = len(names)
        if n == 0:
            return pa.table({
                "first": pa.array([], pa.string()),
                "last": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "plain": pa.array([], pa.int64()),
                "sum_lcp": pa.array([], pa.int64()),
                "front": pa.array([], pa.int64()),
            })
        plain = sum(len(b) for b in names)
        s_lcp, front = 0, len(names[0]) + _leb_len(0) + _leb_len(
            len(names[0]))
        for i in range(1, n):
            p = lcp(names[i - 1], names[i])
            s_lcp += p
            rest = len(names[i]) - p
            front += rest + _leb_len(p) + _leb_len(rest)
        return pa.table({
            "first": pa.array([names[0].decode()], pa.string()),
            "last": pa.array([names[-1].decode()], pa.string()),
            "n": pa.array([n], pa.int64()),
            "plain": pa.array([plain], pa.int64()),
            "sum_lcp": pa.array([s_lcp], pa.int64()),
            "front": pa.array([front], pa.int64()),
        })

    slices = (
        _read(sf_dir, "part", ["p_name"])
        .sort("p_name")
        .map_batches(slice_partial, batch_format="pyarrow")
        .repartition(1)
    ).to_pandas().sort_values(["first", "last"], kind="stable")

    n = int(slices["n"].sum())
    plain = int(slices["plain"].sum())
    s_lcp = int(slices["sum_lcp"].sum())
    front = int(slices["front"].sum())
    lasts = slices["last"].tolist()
    firsts = slices["first"].tolist()
    for i in range(1, len(firsts)):
        b = firsts[i].encode()
        p = lcp(lasts[i - 1].encode(), b)
        # re-encode the block-first entry as a continuation entry
        front -= len(b) + _leb_len(0) + _leb_len(len(b))
        front += (len(b) - p) + _leb_len(p) + _leb_len(len(b) - p)
        s_lcp += p
    saved = (1_000_000 * (plain - front) + plain // 2) // plain
    return pa.table({
        "n_strings": pa.array([n], pa.int64()),
        "plain_bytes": pa.array([plain], pa.int64()),
        "sum_lcp": pa.array([s_lcp], pa.int64()),
        "front_coded_bytes": pa.array([front], pa.int64()),
        "saved_micro": pa.array([saved], pa.int64()),
    })


# Poisson(1) CDF thresholds scaled to 2^64 (floor(CDF_k * 2^64)), hard-
# coded identically in the DuckDB oracle so the bootstrap weight of a
# (row, resample) pair is a pure integer compare — no float parity risk.
_POIS1_T = (
    6786177901268885504, 13572355802537771008, 16965444753172213760,
    18096474403383695360, 18379231815936565248, 18435783298447138816,
    18445208545532233728,
)


def poisson_bootstrap_ci(sf_dir: str, n_resamples: int = 16):
    """Poisson bootstrap of the mean order price — the streaming-
    friendly bootstrap (Poisson(1) weights instead of multinomial
    draws) a distributed pipeline uses because each row's weight is
    independent of every other row: w(row, b) = Poisson⁻¹CDF of the
    uniform ``md5(o_orderkey ∥ '_' ∥ b) / 2⁶⁴``, realized as pure
    integer threshold compares against hard-coded ``⌊CDF_k·2⁶⁴⌋``
    constants (`_POIS1_T`, weight capped at 7).  Per resample: the
    effective row count Σw and the half-up integer mean of w-weighted
    prices in cents; the CI columns are the 2nd-smallest / 2nd-largest
    of the 16 resample means (the deterministic inner ~87% interval).

    Topology: embarrassingly parallel — each batch folds its (b, Σw,
    Σw·x) partials locally, one 16-key groupby sums them, and the
    repartition(1) tail computes means + order-statistic CI.  Nothing
    row-sized crosses the exchange.
    """

    B = n_resamples

    def partial(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_pylist()
        x = _cents(t["o_totalprice"], 100).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = []
        for b in range(B):
            u = _md5_u64([f"{k}_{b}" for k in keys])
            w = np.full(len(u), 7, np.int64)
            for k in range(len(_POIS1_T) - 1, -1, -1):
                w[u < np.uint64(_POIS1_T[k])] = k
            rows.append((b, int(w.sum()), int((w * x).sum())))
        df = pd.DataFrame(rows, columns=["b", "sw", "swx"]).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    sums = (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("sw", alias_name="sw"), Sum("swx", alias_name="swx"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("b")
        means = []
        for r in df.itertuples(index=False):
            sw, swx = int(r.sw), int(r.swx)
            means.append((int(r.b), sw, (swx + sw // 2) // sw))
        srt = sorted(m[2] for m in means)
        lo, hi = srt[1], srt[-2]
        out = pd.DataFrame(means, columns=["b", "n_eff", "mean_cents"])
        out["ci_low_cents"] = lo
        out["ci_high_cents"] = hi
        return out.astype("int64")

    return sums.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None)


def isotonic_calibration(sf_dir: str):
    """Isotonic (PAV) calibration of the repo's standard synthetic
    classifier (score bin = ``least(9, min(n_chars,500)·10 // 500)``,
    positive = lang = 'en' — the calibration_bins binning): pool-
    adjacent-violators enforces a non-decreasing fitted rate over the
    10 bins.  Every pooling decision is an EXACT integer test — blocks
    (n_i, p_i), (n_j, p_j) violate iff ``p_i·n_j > p_j·n_i`` (cross-
    multiplied rationals, no float ever compares) — and the fitted
    rate is one half-up integer division per final block, so the
    DuckDB oracle replays the identical left-to-right stack algorithm
    through a list-carrying recursive CTE (push next bin, else merge
    the violating top two).

    Topology: one 10-key count exchange (per-batch partials), then the
    ≤10-block PAV stack in the repartition(1) tail.  Output per bin:
    (bin, n, n_pos, raw_rate_micro, iso_rate_micro).
    """

    def partial(t: pa.Table) -> pa.Table:
        m = np.minimum(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
            500)
        b = np.minimum(9, m * 10 // 500)
        pos = pc.equal(t["lang"], "en").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"bin": b, "pos": pos}).groupby(
            "bin", as_index=False).agg(n=("pos", "size"),
                                       n_pos=("pos", "sum"))
        return pa.Table.from_pandas(df.astype("int64"),
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    counts = (
        _read(sf_dir, "documents", ["n_chars", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bin")
        bins = df["bin"].to_numpy(np.int64)
        ns = df["n"].to_numpy(np.int64)
        ps = df["n_pos"].to_numpy(np.int64)
        # PAV stack: blocks of (start_idx, n, pos)
        stack: list = []
        for i in range(len(bins)):
            stack.append([i, int(ns[i]), int(ps[i])])
            while (len(stack) >= 2
                   and stack[-2][2] * stack[-1][1]
                       > stack[-1][2] * stack[-2][1]):
                s2 = stack.pop()
                stack[-1][1] += s2[1]
                stack[-1][2] += s2[2]
        iso = np.zeros(len(bins), np.int64)
        for j, (start, bn, bp) in enumerate(stack):
            end = stack[j + 1][0] if j + 1 < len(stack) else len(bins)
            iso[start:end] = (1_000_000 * bp + bn // 2) // bn
        raw = np.array([(1_000_000 * int(p) + int(n) // 2) // int(n)
                        for n, p in zip(ns, ps)], np.int64)
        return pd.DataFrame({
            "bin": pd.array(bins, "int64"),
            "n": pd.array(ns, "int64"),
            "n_pos": pd.array(ps, "int64"),
            "raw_rate_micro": pd.array(raw, "int64"),
            "iso_rate_micro": pd.array(iso, "int64"),
        })

    return counts.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None)


def cohort_triangle(sf_dir: str, max_age: int = 3):
    """The full cohort-retention TRIANGLE (weekly_retention generalizes
    from one lag to ages 0..max_age): users cohorted by their FIRST
    active week (anchored week index, days-since-2020-01-01 // 7), and
    for each (cohort_week, age) the count of cohort users active in
    cohort_week + age.

    One md5(user) % 64 exchange of per-batch-distinct (user, week)
    pairs — a user's whole week set lands in one bucket, so cohort =
    min(week) and the per-age membership are a vectorized in-bucket
    merge; the second groupby sums per-(cohort, age) partial counts
    (cardinality ≤ weeks × (max_age+1)).
    """
    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets
    anchor = np.datetime64("2020-01-01")

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        wk = ((ts.astype("datetime64[D]") - anchor).astype("int64")) // 7
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "week_idx": wk,
        }).drop_duplicates()
        df["bucket"] = _md5_mod(df["user_id"], n_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "week_idx"]].drop_duplicates()
        coh = d.groupby("user_id")["week_idx"].min().rename("cohort_week")
        d = d.merge(coh, left_on="user_id", right_index=True)
        d["age"] = d["week_idx"] - d["cohort_week"]
        d = d[d["age"] <= max_age]
        out = d.groupby(["cohort_week", "age"], as_index=False).agg(
            n_active=("user_id", "size"))
        return out.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_week", "age"], as_index=False)[
            "n_active"].sum()
        return out.astype("int64").sort_values(["cohort_week", "age"])

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def conversion_delay_quantiles(sf_dir: str):
    """Exact quantiles (disc, the doc_length_quantiles rank rule
    ``sorted[ceil(q·n)]``) of the per-user click→purchase delay: for
    each user with both a click and a LATER-or-equal purchase, delay =
    first purchase ts at-or-after the first click − first click ts, in
    whole seconds (µs floor-divided — timestamps are already whole
    seconds in the synthetic feed, so both engines see identical
    integers).

    One md5(user) % 64 exchange of per-batch pre-reduced (user,
    min_click, per-batch candidate purchases) rows — inside a bucket
    the user's first click and the min purchase ≥ it are exact; the
    delays then ride the value-count quantile reduce (tiny count maps,
    one repartition(1) walk).
    """
    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts": t["ts"].to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64),
            "et": t["event_type"].to_numpy(zero_copy_only=False),
        })
        df = df[np.isin(df["et"], ("click", "purchase"))]
        # per-batch reduce: keep min click per user; ALL purchase times
        # cannot be reduced below per-batch min-per-user-per-type safely
        # (the qualifying purchase must be >= the GLOBAL first click,
        # which a batch cannot know) — but a user's purchases BELOW the
        # batch's min click could still qualify globally, so keep the
        # per-(user, type) min only for clicks, and for purchases keep
        # the full per-batch distinct set reduced to at most one per
        # (user, ts).
        clicks = df[df["et"] == "click"].groupby(
            "user_id", as_index=False)["ts"].min()
        clicks["et"] = "click"
        purch = df[df["et"] == "purchase"][
            ["user_id", "ts"]].drop_duplicates()
        purch["et"] = "purchase"
        out = pd.concat([clicks, purch], ignore_index=True)
        out["bucket"] = _md5_mod(out["user_id"], n_buckets).astype(np.int32)
        out["ts"] = out["ts"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["et"] == "click"].groupby("user_id")["ts"].min()
        purch = g[g["et"] == "purchase"]
        m = purch.merge(clicks.rename("first_click"), left_on="user_id",
                        right_index=True)
        m = m[m["ts"] >= m["first_click"]]
        if not len(m):
            return pd.DataFrame({"v": pd.array([], "int64"),
                                 "c": pd.array([], "int64")})
        first_p = m.groupby("user_id", as_index=False).agg(
            ts=("ts", "min"), first_click=("first_click", "first"))
        delay_s = (first_p["ts"] - first_p["first_click"]) // 1_000_000
        out = pd.DataFrame({"v": delay_s}).groupby(
            "v", as_index=False).size().rename(columns={"size": "c"})
        return out.astype("int64")

    def final(t: pa.Table) -> pa.Table:
        import math
        df = t.to_pandas().groupby("v", as_index=False)["c"].sum()
        df = df.sort_values("v")
        total = int(df["c"].sum())
        cum = df["c"].cumsum().to_numpy()
        vals = df["v"].to_numpy()
        qs = (0.25, 0.5, 0.75, 0.9)
        out_v = [int(vals[int(np.searchsorted(
            cum, max(1, math.ceil(q * total))))]) for q in qs]
        return pa.table({
            "q": pa.array(list(qs), pa.float64()),
            "delay_s": pa.array(out_v, pa.int64()),
            "n_users": pa.array([total] * len(qs), pa.int64()),
        })

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def weekday_hour_profile(sf_dir: str):
    """Day-of-week × hour-of-day activity profile with an exact
    integer chi-square-vs-uniform load statistic: counts per (dow,
    hod) cell (dow 0 = Monday, the ISO convention both engines share
    via explicit arithmetic on days-since-2020-01-01 — an anchored
    Wednesday, so dow = (days + 2) mod 7), plus each cell's
    ``chi2_term_e6 = 1e6·(168·c − T)² // (168·T)`` (uniform expected
    load T/168), floor integer division over unbounded Python ints
    (the 1e6·dev² product overflows int64 at corpus scale — the SQL
    twin goes through HUGEINT) — no calendar/locale functions and no
    floats.

    Embarrassingly parallel: per-batch (dow, hod) partial counts, one
    168-key groupby, the tail adds the chi-square terms.
    """

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        days = (ts.astype("datetime64[D]")
                - np.datetime64("2020-01-01")).astype(np.int64)
        dow = (days + 2) % 7
        hod = (ts.astype("datetime64[h]").astype(np.int64)) % 24
        df = pd.DataFrame({"dow": dow, "hod": hod}).groupby(
            ["dow", "hod"], as_index=False).size().rename(
            columns={"size": "c"})
        return pa.Table.from_pandas(df.astype("int64"),
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    counts = (
        _read(sf_dir, "events", ["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "hod"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["c"].sum())
        terms = [(1_000_000 * (168 * int(ci) - total) ** 2)
                 // (168 * total) for ci in df["c"]]
        df = df.assign(chi2_term_e6=pd.array(terms, "int64"))
        return df.astype("int64").sort_values(["dow", "hod"])

    return counts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def _del1_keys(term: str) -> set:
    """SymSpell delete-1 closure: the term plus every single-character
    deletion (the index key set for max_edit_distance = 1)."""
    return {term} | {term[:i] + term[i + 1:] for i in range(len(term))}


def symspell_suggest(sf_dir: str, query: str = "sart", k: int = 5):
    """Spelling suggestion via the SymSpell delete-1 scheme: a vocab
    term is a candidate iff its delete-1 closure intersects the
    query's (which over-generates — e.g. transpositions share keys at
    distance 2 — so candidates are verified with the exact Levenshtein
    DP, pinned to DuckDB ``levenshtein`` by `levenshtein_many`), then
    ranked (distance asc, corpus frequency desc, term asc), top-k.

    Topology: the query's key closure is broadcast, so the whole
    operator is ONE corpus pass — each batch intersects its distinct
    terms' closures locally and emits only (candidate, batch_count)
    partials (a handful of rows), one tiny groupby sums exact corpus
    frequencies, and verification + ranking run on the bounded
    candidate table.  The persistent-index variant would hive-
    partition keys exactly like term_search_indexed; a one-shot query
    never needs it.
    """
    from ocr_ray.functions.textnorm import levenshtein_many

    qkeys = _del1_keys(query)
    qref = ray.put(qkeys)

    def partial(t: pa.Table) -> pa.Table:
        qk = ray.get(qref)
        counts: dict = {}
        for txt in t["text"].to_pylist():
            for tok in (txt or "").lower().split():
                counts[tok] = counts.get(tok, 0) + 1
        cand = {tok: c for tok, c in counts.items()
                if not qk.isdisjoint(_del1_keys(tok))}
        return pa.table({
            "term": pa.array(sorted(cand), pa.string()),
            "c": pa.array([cand[t_] for t_ in sorted(cand)], pa.int64()),
        })

    from ray.data.aggregate import Sum

    cands = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="freq"))
    ).to_pandas()

    if len(cands):
        dists = levenshtein_many([query] * len(cands),
                                 cands["term"].tolist())
        cands = cands.assign(distance=np.asarray(dists, dtype=np.int64))
        cands = cands[cands["distance"] <= 1]
    else:
        cands = pd.DataFrame({"term": [], "freq": [], "distance": []})
    cands = cands.sort_values(["distance", "freq", "term"],
                              ascending=[True, False, True]).head(k)
    return pa.table({
        "term": pa.array(cands["term"].tolist(), pa.string()),
        "freq": pa.array(cands["freq"].astype("int64").tolist(),
                         pa.int64()),
        "distance": pa.array(cands["distance"].astype("int64").tolist(),
                             pa.int64()),
    })


def prefix_autocomplete_topk(sf_dir: str, plen: int = 3, k: int = 3,
                             n_buckets: int = 64):
    """Query-autocomplete table: for every ``plen``-character prefix of
    the vocabulary, the top-k completions by exact corpus frequency
    (ties by term asc) with per-prefix rank — the precomputed structure
    a search box serves from.

    Two coarse exchanges, both on oracle-free Ray-only keys: (1) term
    totals — per-batch (term, count) partials to ``md5(term) % 64``
    buckets, exact totals per term; the bucket fold re-keys each term
    row by ``md5(prefix) % 64``; (2) per-prefix fold — a prefix's whole
    completion set is co-located, so the vectorized pandas head-k per
    prefix is exact, and only ≤ k rows per prefix reach the
    repartition(1) ordering tail.
    """

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for txt in t["text"].to_pylist():
            for tok in (txt or "").lower().split():
                if len(tok) >= plen:
                    counts[tok] = counts.get(tok, 0) + 1
        terms = sorted(counts)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "c": pa.array([counts[t_] for t_ in terms], pa.int64()),
            "bucket": pa.array(_md5_mod(terms, n_buckets), pa.int64()),
        })

    def term_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", as_index=False)["c"].sum()
        agg["prefix"] = agg["term"].str[:plen]
        agg["pbucket"] = _md5_mod(agg["prefix"], n_buckets)
        agg["c"] = agg["c"].astype("int64")
        return agg

    def prefix_fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["prefix", "c", "term"],
                          ascending=[True, False, True])
        g = g.groupby("prefix").head(k).copy()
        g["rank"] = g.groupby("prefix").cumcount() + 1
        out = g[["prefix", "rank", "term", "c"]].rename(
            columns={"c": "freq"})
        out["rank"] = out["rank"].astype("int64")
        out["freq"] = out["freq"].astype("int64")
        return out

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("prefix", "ascending"),
                                            ("rank", "ascending")])
        return t.take(idx)

    return (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(term_fold, batch_format="pandas")
        .repartition(16)
        .groupby("pbucket")
        .map_groups(prefix_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def crawl_makespan_plan(sf_dir: str, n_shards: int = 8):
    """Politeness-constrained crawl planning: hosts (= ``source``)
    shard by ``md5(host) % n_shards``; each host fetches its pages
    SEQUENTIALLY at its crawl delay ``100 + md5(host ∥ '_delay') % 400``
    ms (per-host politeness), hosts within a shard run in parallel —
    so a shard's MAKESPAN is its max host time while its WORK is the
    sum.  Reports per shard: n_hosts, n_pages, total_ms, makespan_ms,
    and the parallel efficiency ``(1e6·total + mk·h//2) // (mk·h)``
    (work / (makespan × hosts), half-up micro).

    One tiny exchange: per-batch (host, pages) partials → host-bucket
    fold computes per-host times and per-shard partial (sum, max, n) —
    a host lives in one bucket, so shard partials merge exactly; the
    driver folds ≤ buckets × shards short rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "host": t["source"].to_numpy(zero_copy_only=False),
        }).groupby("host", as_index=False).size()
        df["size"] = df["size"].astype("int64")
        df["bucket"] = _md5_mod(df["host"], 64).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("host", as_index=False)["size"].sum()
        hosts = per["host"].tolist()
        pages = per["size"].to_numpy(np.int64)
        shard = _md5_mod(hosts, n_shards)
        delay = 100 + (_md5_u64([h + "_delay" for h in hosts])
                       % np.uint64(400)).astype(np.int64)
        t_ms = pages * delay
        df = pd.DataFrame({"shard": shard, "pages": pages, "t": t_ms})
        out = df.groupby("shard", as_index=False).agg(
            n_hosts=("t", "size"), n_pages=("pages", "sum"),
            total_ms=("t", "sum"), makespan_ms=("t", "max"))
        return out.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("shard", as_index=False).agg(
            n_hosts=("n_hosts", "sum"), n_pages=("n_pages", "sum"),
            total_ms=("total_ms", "sum"), makespan_ms=("makespan_ms", "max"))
        eff = [(1_000_000 * int(r.total_ms)
                + (int(r.makespan_ms) * int(r.n_hosts)) // 2)
               // (int(r.makespan_ms) * int(r.n_hosts))
               for r in out.itertuples(index=False)]
        out["efficiency_micro"] = pd.array(eff, "int64")
        return out.astype("int64").sort_values("shard")

    return (
        _read(sf_dir, "documents", ["source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def decayed_event_counts(sf_dir: str, half_life_h: int = 24,
                         max_age_steps: int = 40):
    """Time-decayed event counts — the freshness-weighted popularity
    signal a ranking pipeline maintains — made EXACT: with the decay
    anchored at the corpus max hour T, an event aged ``a`` half-lives
    (whole ``half_life_h``-hour steps, capped at 40) weighs
    ``2^(40 − a)`` in fixed-point units of 2⁻⁴⁰ — a pure int64, so the
    per-type decayed totals are exact integer sums both engines
    reproduce (no float pow, no summation-order hazard).  Reports per
    event_type: n_events, decayed_q40 (the 2⁻⁴⁰-unit total) and
    decayed_milli = half-up (1000·decayed) >> 40.

    Two passes: the max-ts scalar (metadata-cheap aggregate), then
    per-batch (type, age-bucketed weight sums) partials into a 5-key
    groupby.  Everything before the exchange is vectorized arithmetic.
    """
    from ray.data.aggregate import Max, Sum

    mx = (_read(sf_dir, "events", ["ts"])
          .aggregate(Max("ts", alias_name="mx")))["mx"]
    t_ref = np.datetime64(mx, "us").astype("datetime64[h]").astype(
        np.int64)

    def partial(t: pa.Table) -> pa.Table:
        hr = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[h]").astype(np.int64)
        age = np.minimum((t_ref - hr) // half_life_h, max_age_steps)
        w = np.int64(1) << (max_age_steps - age)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "w": w,
        }).groupby("event_type", as_index=False).agg(
            decayed_q40=("w", "sum"), n_events=("w", "size"))
        return pa.Table.from_pandas(df.astype(
            {"decayed_q40": "int64", "n_events": "int64"}),
            preserve_index=False)

    sums = (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("decayed_q40", alias_name="decayed_q40"),
                   Sum("n_events", alias_name="n_events"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        milli = [(1000 * int(q) + (1 << 39)) >> 40
                 for q in df["decayed_q40"]]
        df = df.assign(decayed_milli=pd.array(milli, "int64"))
        df["decayed_q40"] = df["decayed_q40"].astype("int64")
        df["n_events"] = df["n_events"].astype("int64")
        return df.sort_values("event_type")

    return sums.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def ks_two_sample(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov distance between the
    ``value`` distributions of purchase vs click events: D =
    max |F₁ − F₂| over the union of observed values, computed on EXACT
    integers — at each union point ``|c₁·n₂ − c₂·n₁|`` (cumulative
    counts cross-multiplied) and one final half-up division by n₁·n₂
    into micro units.  No float CDF ever forms.

    Topology: per-batch (value, type) count-map partials (the
    doc_length_quantiles distinct-value discipline — swap for fixed
    histogram buckets at an unbounded domain), one value-keyed
    groupby, and the repartition(1) tail walks the sorted union once.
    Output one row: (n_click, n_purchase, d_num, d_den, ks_micro).
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "v": t["value"].to_numpy(zero_copy_only=False),
            "et": t["event_type"].to_numpy(zero_copy_only=False),
        })
        df = df[np.isin(df["et"], ("click", "purchase"))]
        g = df.groupby(["v", "et"], as_index=False).size()
        g["size"] = g["size"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    counts = (
        _read(sf_dir, "events", ["value", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["v", "et"])
        .aggregate(Sum("size", alias_name="c"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="v", columns="et", values="c",
                             aggfunc="sum", fill_value=0).sort_index()
        c1 = piv.get("click", pd.Series(0, index=piv.index)).to_numpy(
            np.int64).cumsum()
        c2 = piv.get("purchase", pd.Series(0, index=piv.index)).to_numpy(
            np.int64).cumsum()
        n1, n2 = int(c1[-1]), int(c2[-1])
        num = np.abs(c1 * n2 - c2 * n1)
        d_num = int(num.max())
        d_den = n1 * n2
        ks = (1_000_000 * d_num + d_den // 2) // d_den
        return pd.DataFrame({
            "n_click": pd.array([n1], "int64"),
            "n_purchase": pd.array([n2], "int64"),
            "d_num": pd.array([d_num], "int64"),
            "d_den": pd.array([d_den], "int64"),
            "ks_micro": pd.array([ks], "int64"),
        })

    return counts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


_BENFORD_E6 = (301029, 176091, 124938, 96910, 79181, 66946, 57991,
               51152, 45757)  # floor(1e6 * log10(1 + 1/d)), d = 1..9


def benford_digit_audit(sf_dir: str):
    """Benford first-digit audit of order totals (in cents): observed
    counts per leading digit vs the Benford expectation (hard-coded
    ``⌊1e6·log₁₀(1 + 1/d)⌋`` constants `_BENFORD_E6` — no runtime
    float), with the per-digit deviation ``observed_micro −
    benford_micro`` where observed_micro is a half-up integer share.
    Leading digit extraction is pure integer: divide by 10 until < 10.

    Embarrassingly parallel 9-key count partials + one groupby; the
    tail adds shares and deviations.
    """

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"], 100).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = np.abs(cents)
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        df = pd.DataFrame({"digit": d}).groupby(
            "digit", as_index=False).size().rename(columns={"size": "c"})
        return pa.Table.from_pandas(df.astype("int64"),
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    counts = (
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("c", alias_name="c"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["digit"] >= 1].sort_values("digit")
        total = int(df["c"].sum())
        obs = [(1_000_000 * int(c) + total // 2) // total
               for c in df["c"]]
        ben = [_BENFORD_E6[int(d) - 1] for d in df["digit"]]
        out = df.assign(
            observed_micro=pd.array(obs, "int64"),
            benford_micro=pd.array(ben, "int64"),
            deviation_micro=pd.array(
                [o - b for o, b in zip(obs, ben)], "int64"))
        return out.astype("int64")

    return counts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def bfs_hops(sf_dir: str, max_hops: int = 6, n_buckets: int = 64):
    """BFS hop histogram from doc 0 over the derived undirected graph
    (the triangle_counts / link_prediction edge set): per hop
    0..max_hops the number of nodes FIRST reached at that hop, plus
    the still-unreached count (hop = -1).

    Level-synchronous distributed BFS.  The symmetric adjacency is
    materialized ONCE (both orientations of every generator edge, one
    exchange); each round then co-partitions state with adjacency by
    ``union`` of two MATERIALIZED lineages (safe per CLAUDE.md — the
    deadlock is only over a shared live upstream) into one node-bucket
    groupby whose fold scatters (nbr, hop+1) candidates from the
    frontier, and a second bucket groupby folds min-dist per node —
    two coarse exchanges per round, state is 2 int64 columns, rounds
    bounded by max_hops.  No edge list is ever rebuilt or broadcast.
    The oracle is the (node, hop)-deduplicating recursive-CTE BFS.
    """
    import ray.data as rd

    n_docs = _table_num_rows(sf_dir, "documents")
    gens = ((2, 1), (3, 2), (5, 3))
    UNSEEN = np.int64(max_hops + 1)

    def adj_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs = [(m * ids + c) % n_docs for m, c in gens]
        u = np.concatenate([ids] * len(gens) + outs)
        v = np.concatenate(outs + [ids] * len(gens))
        keep = u != v
        u, v = u[keep], v[keep]
        return pa.table({
            "bucket": pa.array((u % n_buckets).astype(np.int32),
                               pa.int32()),
            "node": pa.array(u, pa.int64()),
            "nbr": pa.array(v, pa.int64()),
            "dist": pa.array(np.full(len(u), -1, np.int64), pa.int64()),
        })

    adj = (_read(sf_dir, "documents", ["doc_id"])
           .map_batches(adj_partial, batch_format="pyarrow")
           .materialize())

    def seed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dist = np.where(ids == 0, 0, UNSEEN).astype(np.int64)
        return pa.table({
            "bucket": pa.array((ids % n_buckets).astype(np.int32),
                               pa.int32()),
            "node": pa.array(ids, pa.int64()),
            "nbr": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
            "dist": pa.array(dist, pa.int64()),
        })

    state = (_read(sf_dir, "documents", ["doc_id"])
             .map_batches(seed, batch_format="pyarrow").materialize())

    for hop in range(max_hops):
        def scatter(g: pd.DataFrame, hop=hop) -> pd.DataFrame:
            st = g[g["nbr"] < 0]
            front = set(st.loc[st["dist"] == hop, "node"].tolist())
            out_n = st["node"].to_numpy(np.int64)
            out_d = st["dist"].to_numpy(np.int64)
            if front:
                ed = g[(g["nbr"] >= 0) & g["node"].isin(front)]
                cand = ed["nbr"].to_numpy(np.int64)
                out_n = np.concatenate([out_n, cand])
                out_d = np.concatenate(
                    [out_d, np.full(len(cand), hop + 1, np.int64)])
            return pd.DataFrame({
                "bucket": (out_n % n_buckets).astype(np.int32),
                "node": out_n, "dist": out_d})

        def fold(g: pd.DataFrame) -> pa.Table:
            out = g.groupby("node", as_index=False)["dist"].min()
            # return ARROW so the round's blocks match adj's block type
            # (union asserts homogeneous block types)
            return pa.table({
                "bucket": pa.array(
                    (out["node"] % n_buckets).to_numpy(np.int32),
                    pa.int32()),
                "node": pa.array(out["node"].to_numpy(np.int64),
                                 pa.int64()),
                "nbr": pa.array(np.full(len(out), -1, np.int64),
                                pa.int64()),
                "dist": pa.array(out["dist"].to_numpy(np.int64),
                                 pa.int64()),
            })

        state = (adj.union(state)
                 .groupby("bucket")
                 .map_groups(scatter, batch_format="pandas")
                 .repartition(16)
                 .groupby("bucket")
                 .map_groups(fold, batch_format="pandas")
                 .materialize())

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "dist": t["dist"].to_numpy(zero_copy_only=False),
        }).groupby("dist", as_index=False).size().rename(
            columns={"size": "c"})
        return pa.Table.from_pandas(df.astype("int64"),
                                    preserve_index=False)

    from ray.data.aggregate import Sum

    hist = (state.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("dist").aggregate(Sum("c", alias_name="n_nodes"))
            ).to_pandas()
    hop_v, n_v = [], []
    for h in range(max_hops + 1):
        g = hist[hist["dist"] == h]
        hop_v.append(h)
        n_v.append(int(g["n_nodes"].sum()) if len(g) else 0)
    un = hist[hist["dist"] == int(UNSEEN)]
    hop_v.append(-1)
    n_v.append(int(un["n_nodes"].sum()) if len(un) else 0)
    return pa.table({
        "hop": pa.array(hop_v, pa.int64()),
        "n_nodes": pa.array(n_v, pa.int64()),
    })


def posting_intersection_costs(sf_dir: str, n_terms: int = 6,
                               n_buckets: int = 64):
    """Boolean-AND query planning audit: for the top-``n_terms``
    vocabulary terms by document frequency, every pair's exact posting
    intersection size plus the two classic evaluation cost models —
    linear merge ``df_a + df_b`` and galloping search ``min_df · (1 +
    bit_length(max_df // min_df))`` (the integer log the planner
    compares before choosing) — and the posting Jaccard in micro
    units.  The pair with gallop < merge is where an engine switches
    algorithms; exposing both makes the crossover auditable.

    Pass 1 finds the top terms: per-batch distinct (term, df-partial)
    rows through one md5(term)-bucket exchange, per-bucket top-k
    candidates, bounded final top-k (ties df desc, term asc).  Pass 2
    broadcasts the ≤ n_terms term list and counts, per batch, each
    doc's term-presence BITMASK — pair co-occurrence is then a
    vectorized popcount-style partial summed by one 15-key groupby.
    Nothing larger than (pairs × batches) short rows is shuffled.
    """
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for txt in t["text"].to_pylist():
            for tok in set((txt or "").lower().split()):
                counts[tok] = counts.get(tok, 0) + 1
        terms = sorted(counts)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array([counts[x] for x in terms], pa.int64()),
            "bucket": pa.array(_md5_mod(terms, n_buckets), pa.int64()),
        })

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", as_index=False)["df"].sum()
        agg = agg.sort_values(["df", "term"],
                              ascending=[False, True]).head(n_terms)
        agg["df"] = agg["df"].astype("int64")
        return agg

    top = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .repartition(1)
    ).to_pandas().sort_values(["df", "term"],
                              ascending=[False, True]).head(n_terms)
    terms = top["term"].tolist()
    dfs = dict(zip(terms, top["df"].astype(int)))
    t_ref = ray.put(terms)

    def pair_partial(t: pa.Table) -> pa.Table:
        tl = ray.get(t_ref)
        idx = {x: i for i, x in enumerate(tl)}
        npairs = len(tl) * (len(tl) - 1) // 2
        acc = np.zeros(npairs, np.int64)
        pair_ix = {}
        k = 0
        for i in range(len(tl)):
            for j in range(i + 1, len(tl)):
                pair_ix[(i, j)] = k
                k += 1
        for txt in t["text"].to_pylist():
            present = sorted({idx[x] for x in (txt or "").lower().split()
                              if x in idx})
            for a in range(len(present)):
                for b in range(a + 1, len(present)):
                    acc[pair_ix[(present[a], present[b])]] += 1
        return pa.table({
            "pair": pa.array(np.arange(npairs), pa.int64()),
            "n_both": pa.array(acc, pa.int64()),
        })

    both = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n_both", alias_name="n_both"))
    ).to_pandas()
    both_m = dict(zip(both["pair"].astype(int), both["n_both"].astype(int)))

    rows = []
    k = 0
    for i in range(len(terms)):
        for j in range(i + 1, len(terms)):
            a, b = sorted((terms[i], terms[j]))
            da, db = dfs[a], dfs[b]
            nb = both_m.get(k, 0)
            lo, hi = min(da, db), max(da, db)
            merge = da + db
            gallop = lo * (1 + (hi // lo).bit_length())
            union = da + db - nb
            jac = (1_000_000 * nb + union // 2) // union if union else 0
            rows.append((a, b, da, db, nb, merge, gallop, jac))
            k += 1
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table({
        "term_a": pa.array([r[0] for r in rows], pa.string()),
        "term_b": pa.array([r[1] for r in rows], pa.string()),
        "df_a": pa.array([r[2] for r in rows], pa.int64()),
        "df_b": pa.array([r[3] for r in rows], pa.int64()),
        "n_both": pa.array([r[4] for r in rows], pa.int64()),
        "merge_cost": pa.array([r[5] for r in rows], pa.int64()),
        "gallop_cost": pa.array([r[6] for r in rows], pa.int64()),
        "jaccard_micro": pa.array([r[7] for r in rows], pa.int64()),
    })


def zonemap_pruning_audit(sf_dir: str, zone_keys: int = 512,
                          d_lo: str = "1997-01-01",
                          d_hi: str = "1997-06-30"):
    """Zone-map (min/max sketch) pruning audit for a shipdate range
    predicate over lineitem clustered by order key: zones are
    ``l_orderkey // zone_keys`` key blocks, each zone keeps only
    (n_rows, min_ship, max_ship), and the audit reports how many zones
    the predicate ``d_lo ≤ shipdate ≤ d_hi`` can SKIP outright
    (max < lo or min > hi), how many it must scan, the exact rows in
    each class, the true matching rows, and the scan fraction in micro
    units — the storage-layout question ("does clustering by order key
    help a date predicate?") answered with exact numbers.  Dates
    compare as integer epoch-days on both engines.

    Topology: per-batch (zone, n, min, max, n_match) pre-aggregates →
    one zone-keyed groupby (Min/Max/Sum aggregates — cardinality =
    #zones, the thing being built); zone classification is a
    vectorized map over zone rows emitting count partials, so the
    driver sees one row however many zones exist.
    """
    from ray.data.aggregate import Max, Min, Sum

    lo = int(np.datetime64(d_lo).astype("datetime64[D]").astype(np.int64))
    hi = int(np.datetime64(d_hi).astype("datetime64[D]").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "zone": ok // zone_keys, "sd": sd,
            "match": ((sd >= lo) & (sd <= hi)).astype(np.int64),
        }).groupby("zone", as_index=False).agg(
            n=("sd", "size"), mn=("sd", "min"), mx=("sd", "max"),
            n_match=("match", "sum"))
        return pa.Table.from_pandas(df.astype("int64"),
                                    preserve_index=False)

    zones = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("zone")
        .aggregate(Sum("n", alias_name="n"), Min("mn", alias_name="mn"),
                   Max("mx", alias_name="mx"),
                   Sum("n_match", alias_name="n_match"))
    )

    def classify(t: pa.Table) -> pa.Table:
        mn = t["mn"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        nm = t["n_match"].to_numpy(zero_copy_only=False)
        skip = (mx < lo) | (mn > hi)
        return pa.table({
            "g": pa.array([0], pa.int32()),
            "n_zones": pa.array([len(mn)], pa.int64()),
            "n_skippable": pa.array([int(skip.sum())], pa.int64()),
            "rows_total": pa.array([int(n.sum())], pa.int64()),
            "rows_skipped": pa.array([int(n[skip].sum())], pa.int64()),
            "rows_matching": pa.array([int(nm.sum())], pa.int64()),
        })

    agg = (zones.map_batches(classify, batch_format="pyarrow")
           .repartition(1)).to_pandas()
    n_zones = int(agg["n_zones"].sum())
    n_skip = int(agg["n_skippable"].sum())
    total = int(agg["rows_total"].sum())
    skipped = int(agg["rows_skipped"].sum())
    matching = int(agg["rows_matching"].sum())
    scanned = total - skipped
    frac = (1_000_000 * scanned + total // 2) // total
    return pa.table({
        "n_zones": pa.array([n_zones], pa.int64()),
        "n_skippable": pa.array([n_skip], pa.int64()),
        "n_scanned_zones": pa.array([n_zones - n_skip], pa.int64()),
        "rows_total": pa.array([total], pa.int64()),
        "rows_skipped": pa.array([skipped], pa.int64()),
        "rows_matching": pa.array([matching], pa.int64()),
        "scan_fraction_micro": pa.array([frac], pa.int64()),
    })


def gini_concentration(sf_dir: str):
    """Exact Gini coefficient and top-1% / top-10% revenue shares over
    per-customer order totals — the skew report that decides salting
    and partition budgets.  With sorted per-customer revenues x (tie
    order irrelevant: equal values contribute identically to the rank
    sum), ``G = (2A − (N+1)S) / (N·S)`` where ``A = Σ rankᵢ·xᵢ`` — all
    exact int64/Python ints, one half-up division into micro units;
    top-k% shares take the ceil(N/k) highest customers' exact sum.

    Topology: per-customer totals ride one md5(custkey)-bucket
    exchange (per-batch pre-agg); each bucket emits its VALUE-COUNT
    map partial (the doc_length_quantiles discipline — distinct
    revenue values with counts), and the repartition(1) tail walks the
    merged sorted counts once.  At an unbounded value domain the map
    swaps for fixed histogram buckets, same topology.
    """
    n_buckets = DEFAULT_CONFIG.near_dup_coarse_buckets

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cust": t["o_custkey"].to_numpy(zero_copy_only=False),
            "x": _cents(t["o_totalprice"], 100).to_numpy(
                zero_copy_only=False),
        }).groupby("cust", as_index=False)["x"].sum()
        df["bucket"] = _md5_mod(df["cust"], n_buckets).astype(np.int32)
        df["x"] = df["x"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("cust", as_index=False)["x"].sum()
        vc = per.groupby("x", as_index=False).size().rename(
            columns={"size": "c"})
        return vc.astype("int64")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby("x", as_index=False)["c"].sum().sort_values("x")
        vals = vc["x"].to_numpy(np.int64)
        cnts = vc["c"].to_numpy(np.int64)
        N = int(cnts.sum())
        S = int((vals.astype(object) * cnts.astype(object)).sum())
        # rank sum A over runs: run of c equal v starting at rank r
        # contributes v*(c*r + c*(c-1)//2)
        A, r = 0, 1
        for v, c in zip(vals.tolist(), cnts.tolist()):
            A += v * (c * r + c * (c - 1) // 2)
            r += c
        num = 2 * A - (N + 1) * S
        den = N * S
        gini = (1_000_000 * num + den // 2) // den

        def top_share(frac_den: int) -> int:
            m = -(-N // frac_den)  # ceil(N / frac_den)
            left, tot = m, 0
            for v, c in zip(vals.tolist()[::-1], cnts.tolist()[::-1]):
                take = min(left, c)
                tot += take * v
                left -= take
                if not left:
                    break
            return (1_000_000 * tot + S // 2) // S

        return pd.DataFrame({
            "n_customers": pd.array([N], "int64"),
            "sum_cents": pd.array([S], "int64"),
            "gini_micro": pd.array([gini], "int64"),
            "top1pct_share_micro": pd.array([top_share(100)], "int64"),
            "top10pct_share_micro": pd.array([top_share(10)], "int64"),
        })

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def jl_projection_audit(sf_dir: str, d_out: int = 16, n_pairs: int = 25):
    """Johnson-Lindenstrauss distance-preservation audit: project the
    milli-quantized embeddings through a DETERMINISTIC Rademacher ±1
    matrix (``sign(i,j) = +1 iff md5('jl_i_j') is even`` — the
    oracle-reproducible coin) down to d_out dims and compare, for
    n_pairs fixed pairs (2t, 2t+1), the exact integer squared
    distances: ``E[d²_proj] = d_out·d²_orig`` for Rademacher rows, so
    ``ratio_micro = (1e6·d²_proj) / (d_out·d²_orig)`` (half-up) sits
    near 1e6 when the projection preserves geometry.  Everything after
    quantization is int64 adds — both engines replay identical sums.

    Topology: the sign matrix (64×16 ints) broadcasts; one filtered
    scan projects ONLY the 2·n_pairs sampled vectors (each batch keeps
    its members, computes q and p locally, emits one short row per
    vector); the repartition(1) tail pairs them.  The audit cost is
    independent of corpus size.
    """
    from ocr_ray.pipelines.simsearch import _to_matrix

    max_id = 2 * n_pairs

    def quant(mat: np.ndarray) -> np.ndarray:
        x = mat * 1000.0
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    def signs(d_in: int) -> np.ndarray:
        keys = [f"jl_{i}_{j}" for i in range(d_in) for j in range(d_out)]
        u = _md5_u64(keys)
        s = np.where(u % np.uint64(2) == 0, 1, -1).astype(np.int64)
        return s.reshape(d_in, d_out)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids < max_id
        if not keep.any():
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "q": pa.array([], pa.binary()),
                "p": pa.array([], pa.binary()),
            })
        mat = _to_matrix(t["embedding"])[keep]
        q = quant(mat)
        p = q @ signs(q.shape[1])
        return pa.table({
            "vec_id": pa.array(ids[keep], pa.int64()),
            "q": pa.array([r.tobytes() for r in q], pa.binary()),
            "p": pa.array([r.tobytes() for r in p], pa.binary()),
        })

    rows = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
    ).to_pandas().sort_values("vec_id")

    by_id = {int(r.vec_id): (np.frombuffer(r.q, np.int64),
                             np.frombuffer(r.p, np.int64))
             for r in rows.itertuples(index=False)}
    out = []
    for t in range(n_pairs):
        a, b = 2 * t, 2 * t + 1
        if a not in by_id or b not in by_id:
            continue
        qa, pa_ = by_id[a]
        qb, pb = by_id[b]
        d2o = int(((qa - qb) ** 2).sum())
        d2p = int(((pa_ - pb) ** 2).sum())
        den = d_out * d2o
        ratio = (1_000_000 * d2p + den // 2) // den if den else 0
        out.append((a, b, d2o, d2p, ratio))
    return pa.table({
        "id_a": pa.array([r[0] for r in out], pa.int64()),
        "id_b": pa.array([r[1] for r in out], pa.int64()),
        "d2_orig": pa.array([r[2] for r in out], pa.int64()),
        "d2_proj": pa.array([r[3] for r in out], pa.int64()),
        "ratio_micro": pa.array([r[4] for r in out], pa.int64()),
    })


def k_anonymity_audit(sf_dir: str, k: int = 5):
    """k-anonymity audit over the quasi-identifier tuple (lang,
    source, n_chars // 100): equivalence-class size distribution and
    the fraction of rows in classes smaller than k — the
    re-identification risk screen a release pipeline runs before
    publishing.  Reports (n_rows, n_classes, n_unsafe_classes,
    rows_at_risk, risk_micro, min_class, max_class).

    Pure partial-aggregation: per-batch (qid-tuple, count) partials,
    one class-keyed groupby (cardinality = #classes), then a
    vectorized classify-and-sum map emits one row per block for the
    repartition(1) fold — the driver never sees per-class rows.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "source": t["source"].to_numpy(zero_copy_only=False),
            "nb": (t["n_chars"].to_numpy(zero_copy_only=False)
                   .astype(np.int64) // 100),
        }).groupby(["lang", "source", "nb"], as_index=False).size()
        df["size"] = df["size"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    classes = (
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source", "nb"])
        .aggregate(Sum("size", alias_name="c"))
    )

    def classify(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        unsafe = c < k
        return pa.table({
            "n_rows": pa.array([int(c.sum())], pa.int64()),
            "n_classes": pa.array([len(c)], pa.int64()),
            "n_unsafe_classes": pa.array([int(unsafe.sum())], pa.int64()),
            "rows_at_risk": pa.array([int(c[unsafe].sum())], pa.int64()),
            "min_class": pa.array([int(c.min()) if len(c) else 0],
                                  pa.int64()),
            "max_class": pa.array([int(c.max()) if len(c) else 0],
                                  pa.int64()),
        })

    agg = (classes.map_batches(classify, batch_format="pyarrow")
           .repartition(1)).to_pandas()
    n = int(agg["n_rows"].sum())
    risk = int(agg["rows_at_risk"].sum())
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_classes": pa.array([int(agg["n_classes"].sum())], pa.int64()),
        "n_unsafe_classes": pa.array(
            [int(agg["n_unsafe_classes"].sum())], pa.int64()),
        "rows_at_risk": pa.array([risk], pa.int64()),
        "risk_micro": pa.array([(1_000_000 * risk + n // 2) // n],
                               pa.int64()),
        "min_class": pa.array([int(agg["min_class"].min())], pa.int64()),
        "max_class": pa.array([int(agg["max_class"].max())], pa.int64()),
    })


def err_eval(sf_dir: str, query: str = "table hash join", k: int = 10):
    """Expected Reciprocal Rank of the BM25 ranking (the cascade-model
    eval beside ndcg_eval): with graded relevance g = #distinct query
    terms present (0..3 here) and stop probability R = (2^g − 1) /
    2^g_max = (2^g − 1)/8, ``ERR = Σ_r (1/r)·R_r·Π_{i<r}(1 − R_i)``.

    The rational trick that keeps BOTH engines exact: every R has
    denominator 8, so with S = lcm(1..k)·8^k each term
    ``(S // (r·8^r))·num(R_r)·Π num(1 − R_i)`` is an exact integer
    (Python unbounded ints / DuckDB HUGEINT), ERR_scaled sums them,
    and ERR_micro is one half-up division by S.  The oracle walks the
    same ranked list through a (rank, running product, accumulator)
    recursive CTE.  Output one row: (n_ranked, err_micro).

    Topology: the ranking is the bounded bm25_search top-k; ONE corpus
    pass computes the k ranked docs' grades (short rows); the cascade
    recursion runs on ≤ k rows in the repartition(1) tail.
    """
    import math

    terms = sorted({t for t in query.lower().split() if t})
    g_max = len(terms)
    top = bm25_search(sf_dir, query, k=k).to_pandas()
    rank = {int(d): i + 1 for i, d in enumerate(top["doc_id"])}
    rref = ray.put((rank, set(terms)))

    def grade_partial(t: pa.Table) -> pa.Table:
        rk, tset = ray.get(rref)
        ids, gr, rr = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            if did in rk:
                ids.append(did)
                gr.append(len(tset & set((txt or "").lower().split())))
                rr.append(rk[did])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "r": pa.array(rr, pa.int64()),
            "g": pa.array(gr, pa.int64()),
        })

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("r")
        denom_r = 1 << g_max  # 2^g_max
        L = math.lcm(*range(1, k + 1))
        S = L * denom_r ** k
        acc, pnum, pden = 0, 1, 1   # Π(1-R_i) = pnum / pden, pden=8^(r-1)
        for row in df.itertuples(index=False):
            r, g = int(row.r), int(row.g)
            rn = (1 << g) - 1
            # term = (1/r)·(rn/8)·(pnum/pden); S divisible by r·8·pden
            acc += (S // (r * denom_r * pden)) * rn * pnum
            pnum *= denom_r - rn
            pden *= denom_r
        err_micro = (1_000_000 * acc + S // 2) // S
        return pa.table({
            "n_ranked": pa.array([len(df)], pa.int64()),
            "err_micro": pa.array([err_micro], pa.int64()),
        })

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(grade_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def salt_plan_audit(sf_dir: str, n_parts: int = 16, hot_threshold: int = 80,
                    n_salts: int = 8, n_buckets: int = 64):
    """Hot-key salting plan audit — the skew mitigation this repo
    applies to its own exchanges, quantified on the events user_id
    distribution: partition loads under plain ``md5(key) % n_parts``,
    then under the salted plan where every key with count >
    hot_threshold splits round-robin into n_salts sub-keys
    (``md5(key ∥ '#' ∥ salt)``, sub-load ``c//s + (i < c mod s)``), and
    the max-load improvement in micro units.  Every load is an exact
    integer; the salted assignment is deterministic, so the DuckDB
    oracle rebuilds the identical plan.

    One md5(key)-bucket exchange of per-batch (key, count) partials;
    each bucket computes BOTH plans' per-partition load partials for
    its keys (a key's whole count lives in one bucket) and emits ≤
    2·n_parts short rows; the driver folds ≤ buckets·2·n_parts rows.
    Output per partition: (partition, load_plain, load_salted) plus
    the global (max_plain, max_salted, improvement_micro) repeated.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "key": t["user_id"].to_numpy(zero_copy_only=False),
        }).groupby("key", as_index=False).size()
        df["size"] = df["size"].astype("int64")
        df["bucket"] = _md5_mod(df["key"], n_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("key", as_index=False)["size"].sum()
        keys = per["key"].tolist()
        cnt = per["size"].to_numpy(np.int64)
        part = _md5_mod(keys, n_parts)
        plain = np.zeros(n_parts, np.int64)
        np.add.at(plain, part, cnt)
        salted = np.zeros(n_parts, np.int64)
        hot = cnt > hot_threshold
        np.add.at(salted, part[~hot], cnt[~hot])
        for k, c in zip(np.asarray(keys)[hot], cnt[hot]):
            subs = _md5_mod([f"{k}#{i}" for i in range(n_salts)], n_parts)
            for i, p in enumerate(subs):
                salted[p] += c // n_salts + (1 if i < c % n_salts else 0)
        return pd.DataFrame({
            "partition": pd.array(range(n_parts), "int64"),
            "load_plain": pd.array(plain, "int64"),
            "load_salted": pd.array(salted, "int64"),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("partition", as_index=False)[
            ["load_plain", "load_salted"]].sum()
        mp = int(out["load_plain"].max())
        ms = int(out["load_salted"].max())
        out = out.astype("int64").sort_values("partition")
        out["max_plain"] = mp
        out["max_salted"] = ms
        # improvement may be NEGATIVE (salting one medium key can raise
        # the max); half-away rounding with TRUNCATING division — the
        # DuckDB `//` semantics for negatives (Python's floors)
        q = 1_000_000 * (mp - ms) + (mp // 2 if ms <= mp else -(mp // 2))
        out["improvement_micro"] = q // mp if q >= 0 else -((-q) // mp)
        return out.astype("int64")

    return (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def l_diversity_audit(sf_dir: str, l_min: int = 2):
    """l-diversity companion to k_anonymity_audit: equivalence classes
    are (source, n_chars // 100) and the SENSITIVE attribute is lang —
    a class is unsafe when it carries fewer than l_min distinct
    sensitive values (every member's language is disclosed).  Reports
    (n_classes, n_unsafe_classes, rows_in_unsafe, disclosure_micro,
    min_diversity, max_diversity).

    Per-batch (class, lang) pre-dedup + count partials, one
    class+lang-keyed groupby, then a class-keyed fold (distinct langs
    per class sum exactly — a (class, lang) pair lives in one row) and
    one classify map; driver sees one row.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "nb": (t["n_chars"].to_numpy(zero_copy_only=False)
                   .astype(np.int64) // 100),
            "lang": t["lang"].to_numpy(zero_copy_only=False),
        }).groupby(["source", "nb", "lang"], as_index=False).size()
        df["size"] = df["size"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        _read(sf_dir, "documents", ["source", "n_chars", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "nb", "lang"])
        .aggregate(Sum("size", alias_name="c"))
    )

    def class_fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["source", "nb"]).agg(
            n=("c", "sum"), div=("lang", "nunique")).reset_index()
        unsafe = df["div"] < l_min
        return pa.table({
            "n_classes": pa.array([len(df)], pa.int64()),
            "n_unsafe_classes": pa.array([int(unsafe.sum())], pa.int64()),
            "rows_in_unsafe": pa.array([int(df["n"][unsafe].sum())],
                                       pa.int64()),
            "rows_total": pa.array([int(df["n"].sum())], pa.int64()),
            "min_diversity": pa.array([int(df["div"].min())], pa.int64()),
            "max_diversity": pa.array([int(df["div"].max())], pa.int64()),
        })

    agg = (pairs.repartition(1)
           .map_batches(class_fold, batch_format="pyarrow",
                        batch_size=None)).to_pandas()
    n_total = int(agg["rows_total"].sum())
    unsafe_rows = int(agg["rows_in_unsafe"].sum())
    return pa.table({
        "n_classes": pa.array([int(agg["n_classes"].sum())], pa.int64()),
        "n_unsafe_classes": pa.array(
            [int(agg["n_unsafe_classes"].sum())], pa.int64()),
        "rows_in_unsafe": pa.array([unsafe_rows], pa.int64()),
        "disclosure_micro": pa.array(
            [(1_000_000 * unsafe_rows + n_total // 2) // n_total],
            pa.int64()),
        "min_diversity": pa.array([int(agg["min_diversity"].min())],
                                  pa.int64()),
        "max_diversity": pa.array([int(agg["max_diversity"].max())],
                                  pa.int64()),
    })
