"""Stream-shaped operators over the events log (TESTDATA events table).

Ray Data has no event-time windowing; per the public guidance the input is
treated as a partitioned ordered log: tumbling windows become a vectorized
truncate + groupby; session windows and the as-of join shuffle on a COARSE
64-way bucket of user_id and resolve every user in the bucket with one
vectorized pandas pass (never one map_groups dispatch per user — Ray's
~10-20ms per-group cost is a scale killer at 10^8 keys).  Ordering
assumption: (ts, event_id) is a total order per key — stated here and used
identically in the SQL oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _cents(x):
    return pc.cast(
        pc.round(pc.multiply(x, 100), round_mode="half_towards_infinity"), pa.int64()
    )


def tumbling_hour_counts(sf_dir: str):
    """Tumbling 1-hour windows per event_type: n + value_cents.

    window_start = ts truncated to the hour (vectorized); aggregation is
    pre-combined per batch before the (event_type, window_start) groupby.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                "value_cents": _cents(t["value"]),
            }
        ).to_pandas()
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value_cents", "size"), value_cents=("value_cents", "sum")
        )
        g["n"] = g["n"].astype("int64")
        out = pa.Table.from_pandas(g, preserve_index=False)
        # pin timestamp[us] (pandas round-trips can downcast to [s])
        i = out.column_names.index("window_start")
        return out.set_column(
            i, "window_start", out["window_start"].cast(pa.timestamp("us"))
        )

    from ray.data.aggregate import Sum

    def fix_ts(t: pa.Table) -> pa.Table:
        # Ray's aggregate round-trips keys through pandas and can downcast
        # timestamp[us] to [s]; pin the contract type on the way out
        i = t.column_names.index("window_start")
        return t.set_column(i, "window_start", t["window_start"].cast(pa.timestamp("us")))

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .map_batches(fix_ts, batch_format="pyarrow")
    )


SESSION_GAP_MIN = 30
_USER_BUCKETS = 64  # coarse shuffle key; exact per-user work is vectorized
# inside each bucket (see module docstring)


def _bucket_by_user(t: pa.Table) -> pa.Table:
    return t.append_column(
        "ubucket",
        pc.cast(pc.bit_wise_and(t["user_id"], _USER_BUCKETS - 1), pa.int32()),
    )


def session_windows(sf_dir: str):
    """Session windows per user (gap > 30 min splits), sorted by
    (ts, event_id) within each user — n_events + value_cents + session_start
    per (user_id, session_id).

    One coarse-bucket shuffle; inside each bucket ONE sort + diff/cumsum
    pass sessionizes every user at once (a user-boundary row always opens a
    new session, and per-user session_ids rebase to 0 by subtracting the
    user's first global session id)."""

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = (g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)) | new_user
        sid = brk.cumsum()
        g = g.assign(
            session_id=(sid - sid.groupby(g["user_id"]).transform("min"))
            .astype("int64")
        )
        out = g.groupby(["user_id", "session_id"], as_index=False).agg(
            session_start=("ts", "min"),
            n_events=("event_id", "size"),
            value_cents=("value_cents", "sum"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    def prep(t: pa.Table) -> pa.Table:
        return _bucket_by_user(pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "value_cents": _cents(t["value"]),
            }
        ))

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


def asof_purchase_click(sf_dir: str):
    """As-of join: each 'purchase' event matched to the same user's most
    recent prior-or-equal 'click' (the classic event-attribution join).

    Ray Data has no asof join; the portable pattern is: co-partition both
    sides by a COARSE bucket of the key (one groupby), then ONE
    ``pd.merge_asof(..., by='user_id')`` per bucket matches every user in
    the bucket vectorized.  Ordering assumption: (ts, event_id) totally
    orders a user's events — the DuckDB ASOF JOIN oracle uses the same
    rule.
    """

    _EMPTY = {
        "user_id": pd.Series([], dtype="int64"),
        "purchase_id": pd.Series([], dtype="int64"),
        "purchase_ts": pd.Series([], dtype="datetime64[us]"),
        "click_id": pd.Series([], dtype="int64"),
    }

    def bucket_asof(g: pd.DataFrame) -> pd.DataFrame:
        # merge_asof needs both frames globally ts-sorted (the `by` match
        # happens within that order); (ts, event_id) keeps ties stable
        g = g.sort_values(["ts", "event_id"])
        buys = g.loc[g["event_type"] == "purchase",
                     ["user_id", "ts", "event_id"]].rename(
            columns={"event_id": "purchase_id"})
        clicks = g.loc[g["event_type"] == "click",
                       ["user_id", "ts", "event_id"]].rename(
            columns={"event_id": "click_id"})
        if len(buys) == 0:
            return pd.DataFrame(_EMPTY)
        merged = pd.merge_asof(
            buys, clicks, on="ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        return pd.DataFrame({
            "user_id": merged["user_id"].to_numpy(dtype=np.int64),
            "purchase_id": merged["purchase_id"].to_numpy(),
            "purchase_ts": merged["ts"].astype("datetime64[us]").to_numpy(),
            # no-match → -1 (nullable ints degrade to float64 through
            # pandas, breaking schema parity with the SQL oracle)
            "click_id": merged["click_id"].fillna(-1).astype("int64"),
        })

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id", "event_id", "event_type", "ts"])
        .map_batches(_bucket_by_user, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(bucket_asof, batch_format="pandas")
    )


def hopping_hour_counts(sf_dir: str):
    """HOPPING (sliding) windows: size 1 h, hop 30 min — every event
    belongs to exactly two windows, [floor30(ts)] and [floor30(ts)-30m].

    The 1→2 window explosion happens INSIDE map_batches (vectorized
    floor_temporal + concat, never per-row), counts are pre-combined per
    batch before the window_start groupby, exactly like
    :func:`tumbling_hour_counts`.  Window-key cardinality is time-span /
    hop (small), so the hash aggregate is safe at any corpus size.
    """

    def partial(t: pa.Table) -> pa.Table:
        w1 = pc.floor_temporal(t["ts"], multiple=30, unit="minute")
        w0 = pc.subtract(
            w1.cast(pa.int64()), pa.scalar(30 * 60 * 1_000_000, pa.int64())
        ).cast(pa.timestamp("us"))
        if isinstance(w1, pa.ChunkedArray):
            w1 = w1.combine_chunks()
        if isinstance(w0, pa.ChunkedArray):
            w0 = w0.combine_chunks()
        df = pa.table(
            {"window_start": pa.concat_arrays([w1.cast(pa.timestamp("us")), w0])}
        ).to_pandas()
        g = df.groupby("window_start", as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        out = pa.Table.from_pandas(g, preserve_index=False)
        i = out.column_names.index("window_start")
        return out.set_column(
            i, "window_start", out["window_start"].cast(pa.timestamp("us"))
        )

    from ray.data.aggregate import Sum

    def fix_ts(t: pa.Table) -> pa.Table:
        i = t.column_names.index("window_start")
        return t.set_column(
            i, "window_start", t["window_start"].cast(pa.timestamp("us")))

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(fix_ts, batch_format="pyarrow")
    )


from ocr_ray.config import DEFAULT_CONFIG


def range_join_purchase_clicks(sf_dir: str):
    """RANGE (interval) join: each 'purchase' event paired with ALL of the
    same user's 'click' events in the preceding hour
    (purchase.ts - 1h <= click.ts <= purchase.ts) — the event-attribution
    sibling of :func:`asof_purchase_click` that keeps every candidate
    instead of only the latest.

    Ray Data has no range join; the portable exact pattern is the
    GRID-BUCKETED range join: quantize ts to window-sized cells, emit each
    click under (user, cell) AND (user, cell+1), hash-join purchases to
    clicks on (user, cell) — a qualifying pair is co-located in exactly
    one key (same cell or adjacent), so no dedup pass is needed — then
    apply the exact interval predicate vectorized.  Everything inside the
    coarse user-bucket groupby is one sorted pandas merge; the shuffle is
    the same single 64-way co-partition every event operator here uses.

    Output (user_id, purchase_id, click_id, gap_us) with gap in exact
    integer microseconds (DuckDB epoch_us parity; date_diff('second')
    counts boundary crossings, not elapsed time, so seconds are NOT used).
    """

    # read the knob at CALL time (not import time) so config overrides
    # take effect like every other round-4 operator
    window_us = DEFAULT_CONFIG.range_join_window_us

    def bucket_range_join(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        g = g.assign(ts_us=ts_us, cell=ts_us // window_us)
        buys = g.loc[g["event_type"] == "purchase",
                     ["user_id", "event_id", "ts_us", "cell"]].rename(
            columns={"event_id": "purchase_id", "ts_us": "p_ts"})
        clicks = g.loc[g["event_type"] == "click",
                       ["user_id", "event_id", "ts_us", "cell"]].rename(
            columns={"event_id": "click_id", "ts_us": "c_ts"})
        shifted = clicks.assign(cell=clicks["cell"] + 1)
        cand = pd.concat([clicks, shifted], ignore_index=True)
        m = buys.merge(cand, on=["user_id", "cell"], how="inner")
        gap = m["p_ts"] - m["c_ts"]
        m = m.assign(gap=gap)[(gap >= 0) & (gap <= window_us)]
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy(dtype=np.int64),
            "purchase_id": m["purchase_id"].to_numpy(dtype=np.int64),
            "click_id": m["click_id"].to_numpy(dtype=np.int64),
            "gap_us": m["gap"].to_numpy(dtype=np.int64),
        })

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id", "event_id", "event_type", "ts"])
        .map_batches(_bucket_by_user, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(bucket_range_join, batch_format="pandas")
    )


def throttle_dedup_events(sf_dir: str):
    """Time-windowed event dedup (debounce): keep an event iff it is the
    first of its (user_id, event_type) or >= 1 window has elapsed since
    the PREVIOUS event of that key (lag semantics — each event compares
    to its immediate predecessor, the SQL ``lag()`` definition, so the
    oracle is a pure window function; a keep-chain throttle would need
    iteration).  The J2 keep-first family extended with event time.

    Same single coarse user-bucket shuffle as every event operator here;
    inside, ONE sort + vectorized diff pass handles every (user, type)
    chain at once — a key-boundary row is always kept, and within a key
    the int64-microsecond gap to the previous row decides.
    """
    window_us = DEFAULT_CONFIG.range_join_window_us

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        new_key = (g["user_id"].ne(g["user_id"].shift())
                   | g["event_type"].ne(g["event_type"].shift()))
        gap_us = g["ts"].astype("datetime64[us]").astype("int64").diff()
        keep = new_key | (gap_us >= window_us)
        out = g.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        out["ts"] = out["ts"].astype("datetime64[us]")
        return out

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["event_id", "user_id", "event_type", "ts"])
        .map_batches(_bucket_by_user, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(debounce, batch_format="pandas")
    )


def running_user_spend(sf_dir: str):
    """Running per-user aggregate (cumulative spend): for every event, the
    prefix sum of value over that user's events ordered by (ts, event_id)
    — the window-function family (``sum() OVER (PARTITION BY ... ROWS
    UNBOUNDED PRECEDING)``) restated as one coarse user-bucket shuffle +
    a vectorized per-bucket sort + grouped cumsum.  Values are
    integer-scaled to cents BEFORE summation (the repo-wide parity
    convention) so the running total is bit-exact vs the oracle.
    """

    def prep(t: pa.Table) -> pa.Table:
        return _bucket_by_user(pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts": t["ts"],
            "value_cents": _cents(t["value"]),
        }))

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = g.assign(
            cum_value_cents=g.groupby("user_id")["value_cents"]
            .cumsum().astype("int64"))
        return out[["event_id", "user_id", "cum_value_cents"]]

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id", "event_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(running, batch_format="pandas")
    )


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def hourly_event_pivot(sf_dir: str):
    """PIVOT (wide aggregate): one row per hour with one count column per
    event type (n_click, n_view, ...) plus n_total — the long→wide
    reshape every monitoring pipeline ends in.  The pivot happens INSIDE
    map_batches (vectorized boolean-sum partials per hour, one row per
    hour per batch), so the groupby only ever sees pre-pivoted partials —
    window-key cardinality is time-span / hour, safe at any corpus size.
    The type list is a fixed schema (unknown types count only toward
    n_total — a pivot needs a declared column set, same as SQL FILTER).
    """
    from ray.data.aggregate import Sum

    cols = [f"n_{et}" for et in _EVENT_TYPES]

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "event_type": t["event_type"],
        }).to_pandas()
        for et in _EVENT_TYPES:
            df[f"n_{et}"] = (df["event_type"] == et).astype("int64")
        df["n_total"] = np.int64(1)
        g = df.groupby("window_start", as_index=False)[cols + ["n_total"]].sum()
        out = pa.Table.from_pandas(g, preserve_index=False)
        i = out.column_names.index("window_start")
        return out.set_column(
            i, "window_start", out["window_start"].cast(pa.timestamp("us")))

    def fix_ts(t: pa.Table) -> pa.Table:
        i = t.column_names.index("window_start")
        return t.set_column(
            i, "window_start", t["window_start"].cast(pa.timestamp("us")))

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(*[Sum(c, alias_name=c) for c in cols + ["n_total"]])
        .map_batches(fix_ts, batch_format="pyarrow")
    )


def hourly_distinct_users(sf_dir: str):
    """EXACT distinct-user count per hour window — the windowed
    COUNT(DISTINCT) reduce (KMV's exact sibling; see
    relational.approx_distinct_users for the sketch when exactness can
    yield).

    Partials are DISTINCT (hour, user) pairs per batch (the dedup
    happens before anything moves), shuffled on a coarse 64-way bucket
    of the hour so the per-group pandas nunique is one vectorized pass —
    never one dispatch per hour window.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "window_start": pc.floor_temporal(t["ts"], unit="hour"),
            "user_id": t["user_id"],
        }).to_pandas().drop_duplicates()
        df["hbucket"] = (
            df["window_start"].astype("datetime64[us]").astype("int64")
            // 3_600_000_000 % _USER_BUCKETS
        ).astype("int32")
        out = pa.Table.from_pandas(df, preserve_index=False)
        i = out.column_names.index("window_start")
        return out.set_column(
            i, "window_start", out["window_start"].cast(pa.timestamp("us")))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("window_start", as_index=False)["user_id"]
                 .nunique().rename(columns={"user_id": "n_users"}))
        out["n_users"] = out["n_users"].astype("int64")
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        return out

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(count_bucket, batch_format="pandas")
    )


_DAY_US = 86_400_000_000


def max_concurrent_sessions(sf_dir: str):
    """Peak session concurrency across ALL users — the distributed
    SWEEPLINE / parallel-prefix problem (a global running +1/-1 count has
    a sequential dependency no per-row transform can express):

      1. sessionize per coarse user bucket (session_windows' kernel,
         keeping [start, end] microsecond bounds);
      2. EXPLODE each session to every DAY bucket it touches (fan-out
         bounded by session length — the 30-min gap rule keeps sessions
         short relative to a day);
      3. per day bucket the sweep is COMPLETE locally: carry_in = count
         of emitted sessions starting before the bucket (they cover its
         start instant), then one lexsorted +1/-1 prefix over in-bucket
         boundaries (+1 sorts before −1 at equal t: inclusive-end
         overlap, a session is active AT its end);
      4. a bounded final task folds per-bucket maxima.

    Returns one row (n_sessions, max_concurrent); the oracle runs the
    same boundary sweep as a single SQL window cumsum."""

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = (g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)) \
            | new_user
        sid = brk.cumsum()
        out = g.assign(sid=sid).groupby("sid", as_index=False).agg(
            st=("ts", "min"), en=("ts", "max"))
        st = out["st"].astype("int64").to_numpy()
        en = out["en"].astype("int64").to_numpy()
        d0 = st // _DAY_US
        nd = (en // _DAY_US - d0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(out)), nd)
        ends = np.cumsum(nd)
        offs = np.arange(int(nd.sum())) - np.repeat(ends - nd, nd)
        return pd.DataFrame({
            "day": pd.array(d0[rep] + offs, "int64"),
            "st_us": pd.array(st[rep], "int64"),
            "en_us": pd.array(en[rep], "int64"),
        })

    def sweep_day(g: pd.DataFrame) -> pd.DataFrame:
        day_start = int(g["day"].iloc[0]) * _DAY_US
        day_end = day_start + _DAY_US
        st = g["st_us"].to_numpy()
        en = g["en_us"].to_numpy()
        carry_in = int((st < day_start).sum())
        ts_list, ds_list = [], []
        in_start = st >= day_start
        ts_list.append(st[in_start])
        ds_list.append(np.ones(int(in_start.sum()), np.int64))
        in_end = en < day_end
        ts_list.append(en[in_end])
        ds_list.append(-np.ones(int(in_end.sum()), np.int64))
        t = np.concatenate(ts_list)
        d = np.concatenate(ds_list)
        order = np.lexsort((-d, t))        # +1 before −1 at equal t
        run = carry_in + np.cumsum(d[order])
        mx = max(carry_in, int(run.max()) if len(run) else 0)
        return pd.DataFrame({
            "n_sessions": pd.array([int(in_start.sum())], "int64"),
            "max_concurrent": pd.array([mx], "int64"),
        })

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_sessions": pa.array(
                [int(pc.sum(t["n_sessions"]).as_py() or 0)], pa.int64()),
            "max_concurrent": pa.array(
                [int(pc.max(t["max_concurrent"]).as_py() or 0)],
                pa.int64()),
        })

    def prep(t: pa.Table) -> pa.Table:
        return _bucket_by_user(pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts": t["ts"],
        }))

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id", "event_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(sessions_bucket, batch_format="pandas")
        .groupby("day")
        .map_groups(sweep_day, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def linear_attribution(sf_dir: str):
    """LINEAR (equal-split) MULTI-TOUCH ATTRIBUTION — the marketing
    sibling of the as-of (last-touch) join: every purchase's value is
    split equally across ALL of the same user's clicks in the preceding
    hour (window inclusive on both ends, matching
    range_join_purchase_clicks); credits are integer MILLI-cents via
    floor division, so the arithmetic is exact on both engines
    (values are positive; DuckDB // and Python // agree on floor).

    One coarse user-bucket exchange; inside each bucket a single pandas
    merge pairs purchases with clicks per user (per-user event counts
    are bounded, so the in-bucket cross product is too), the per-purchase
    click count and credit derive vectorized, and per-user integer
    partials feed one tiny final groupby.  Purchases with no click in
    window are unattributed and excluded (the oracle's inner join).
    Output (user_id, n_attributed_purchases, sum_credit_mcents)."""
    window_us = 3_600_000_000

    def bucket_attr(g: pd.DataFrame) -> pd.DataFrame:
        buys = g[g["event_type"] == "purchase"][
            ["user_id", "event_id", "ts_us", "cents"]].rename(
            columns={"event_id": "purchase_id", "ts_us": "p_ts"})
        clicks = g[g["event_type"] == "click"][
            ["user_id", "ts_us"]].rename(columns={"ts_us": "c_ts"})
        m = buys.merge(clicks, on="user_id")
        m = m[(m["c_ts"] <= m["p_ts"])
              & (m["c_ts"] >= m["p_ts"] - window_us)]
        if not len(m):
            return pd.DataFrame({
                "user_id": pd.array([], "int64"),
                "n_attributed_purchases": pd.array([], "int64"),
                "sum_credit_mcents": pd.array([], "int64")})
        per_p = m.groupby(["user_id", "purchase_id"], as_index=False).agg(
            n_clicks=("c_ts", "size"), cents=("cents", "first"))
        per_p["credit"] = (per_p["n_clicks"]
                           * ((per_p["cents"] * 1000) // per_p["n_clicks"]))
        out = per_p.groupby("user_id", as_index=False).agg(
            n_attributed_purchases=("purchase_id", "size"),
            sum_credit_mcents=("credit", "sum"))
        out["n_attributed_purchases"] = \
            out["n_attributed_purchases"].astype("int64")
        out["sum_credit_mcents"] = out["sum_credit_mcents"].astype("int64")
        return out

    def prep(t: pa.Table) -> pa.Table:
        return _bucket_by_user(pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "event_type": t["event_type"],
            "cents": _cents(t["value"]),
        }))

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id", "event_id", "ts",
                                 "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(bucket_attr, batch_format="pandas")
        # no final fold: a user lives in exactly ONE bucket, so the
        # per-bucket rollup is already the final answer
    )


def record_event_stats(sf_dir: str, n_parts: int = 64):
    """GLOBAL PREFIX-SCAN over the event log: per event_type, how many
    events set a new all-time high ``value`` at their arrival (arrival
    order = event_id; the first event overall is a record by
    definition) — the high-water-mark / record-breaking detector of a
    monitoring stream, and the canonical DISTRIBUTED PREFIX-SCAN shape
    Ray Data lacks natively.

    Topology (range-partition + boundary carry, two bounded exchanges):

      1. part = event_id·P // N (contiguous ranges from parquet row
         count metadata — no data pass); per-batch Max partials →
         ``groupby(part).aggregate(Max)`` → the driver folds exactly P
         rows into EXCLUSIVE prefix maxima (the carry-in per part) and
         broadcasts them via ray.put — driver state is P floats at any
         log size;
      2. ``groupby(part).map_groups``: sort the part by event_id,
         exclusive local cummax ∨ carry-in, strict ``>`` compare, then
         per-type partial counts — only (event_type, n, n_records)
         rows leave a group; a tiny |types|-key groupby sums them.

    Comparisons are raw float64 ``>`` on stored values (no arithmetic,
    no rounding) — bit-identical to the SQL window
    ``max(value) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.
    """
    import ray
    from ray.data.aggregate import Max, Sum

    from ocr_ray.pipelines.relational import _table_num_rows

    n = max(1, _table_num_rows(sf_dir, "events"))
    p = min(n_parts, n)

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(pc.divide(
            pc.multiply(t["event_id"], p), n), pa.int32())
        return t.append_column("part", part)

    src = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    ).map_batches(add_part, batch_format="pyarrow")

    maxes = (src.map_batches(
        lambda t: pa.Table.from_pandas(
            t.select(["part", "value"]).to_pandas()
            .groupby("part", as_index=False)["value"].max(),
            preserve_index=False),
        batch_format="pyarrow")
        .groupby("part").aggregate(Max("value", alias_name="value"))
        .to_pandas())
    carry = np.full(p, -np.inf)
    if len(maxes):
        m = np.full(p, -np.inf)
        m[maxes["part"].to_numpy()] = maxes["value"].to_numpy()
        carry[1:] = np.maximum.accumulate(m)[:-1]
    carry_ref = ray.put(carry)

    def scan_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        v = g["value"].to_numpy()
        prev = np.empty_like(v)
        prev[0] = -np.inf
        if len(v) > 1:
            prev[1:] = np.maximum.accumulate(v)[:-1]
        prev = np.maximum(prev, ray.get(carry_ref)[int(g["part"].iloc[0])])
        g = pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                          "rec": (v > prev) | np.isneginf(prev)})
        out = g.groupby("event_type", as_index=False).agg(
            n_events=("rec", "size"), n_records=("rec", "sum"))
        out["n_events"] = out["n_events"].astype("int64")
        out["n_records"] = out["n_records"].astype("int64")
        return out

    return (src.groupby("part").map_groups(scan_part, batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_records", alias_name="n_records")))


def median_event_value_refined(sf_dir: str, n_bins: int = 4096):
    """EXACT per-type median of an UNBOUNDED-DOMAIN double column by
    HISTOGRAM REFINEMENT — the two-pass distributed order-statistic
    pattern for columns where the value-count reduce
    (doc_length_quantiles) would not compress: pass 1 builds a fixed
    n_bins histogram per event_type (per-batch partials ≤ types×bins
    rows); the driver walks the cumulative histogram to the bin holding
    the rank-⌈n/2⌉ element (quantile_disc convention); pass 2 collects
    ONLY that bin's values per type (expected n/bins rows — pushed as a
    vectorized filter) and takes the exact in-bin order statistic.
    Returns ``(event_type, n_events, median_cents)``.

    Driver state: types×bins int partials + the candidate-bin values
    (E[n/bins] per type — at 10^12 rows raise n_bins or recurse one more
    refinement level, same topology).  Bin bounds come from a min/max
    partial pass, so three bounded passes total, each embarrassingly
    parallel."""
    import ray

    from ray.data.aggregate import Max, Min, Sum

    src = os.path.join(sf_dir, "events.parquet")

    bounds = (rd.read_parquet(src, columns=["event_type", "value"])
              .groupby("event_type")
              .aggregate(Min("value", alias_name="lo"),
                         Max("value", alias_name="hi"))
              .to_pandas().set_index("event_type"))
    lo = bounds["lo"].to_dict()
    hi = bounds["hi"].to_dict()
    b_ref = ray.put((lo, hi))

    def bin_of(types: np.ndarray, vals: np.ndarray) -> np.ndarray:
        l, h = ray.get(b_ref)
        lo_v = np.array([l[t] for t in types])
        hi_v = np.array([h[t] for t in types])
        span = np.maximum(hi_v - lo_v, 1e-12)
        return np.clip(((vals - lo_v) / span * n_bins).astype(np.int64),
                       0, n_bins - 1)

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"et": t["event_type"], "v": t["value"]}).to_pandas()
        df["bin"] = bin_of(df["et"].to_numpy(), df["v"].to_numpy())
        g = df.groupby(["et", "bin"], as_index=False).size()
        g["n"] = g.pop("size").astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (rd.read_parquet(src, columns=["event_type", "value"])
            .map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["et", "bin"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())

    import math
    target = {}
    for et, g in hist.groupby("et"):
        g = g.sort_values("bin")
        total = int(g["n"].sum())
        rank = max(1, math.ceil(0.5 * total))          # 1-based
        cum = g["n"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, rank))
        # rank WITHIN the candidate bin (1-based)
        target[et] = (int(g["bin"].iloc[i]), rank - (int(cum[i - 1]) if i else 0),
                      total)
    t_ref = ray.put({et: b for et, (b, _, _) in target.items()})

    def in_bin(t: pa.Table) -> pa.Table:
        df = pa.table({"et": t["event_type"], "v": t["value"]}).to_pandas()
        want = ray.get(t_ref)
        keep = bin_of(df["et"].to_numpy(), df["v"].to_numpy()) == np.array(
            [want[x] for x in df["et"]])
        return pa.Table.from_pandas(df[keep], preserve_index=False)

    cand = (rd.read_parquet(src, columns=["event_type", "value"])
            .map_batches(in_bin, batch_format="pyarrow").to_pandas())
    types, ns, meds = [], [], []
    for et in sorted(target):
        _, in_rank, total = target[et]
        vals = np.sort(cand.loc[cand["et"] == et, "v"].to_numpy())
        med = float(vals[in_rank - 1])
        types.append(et)
        ns.append(total)
        meds.append(int(np.copysign(np.floor(abs(med) * 100 + 0.5), med)))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_events": pa.array(ns, pa.int64()),
        "median_cents": pa.array(meds, pa.int64()),
    })


def ewma_hourly_anomalies(sf_dir: str):
    """EWMA RATE-ANOMALY detection over the hourly event-count series —
    the streaming traffic monitor a crawl scheduler runs (exponentially
    weighted moving average, Roberts 1959 / Hunter's EWMA control chart
    — public method), INTEGER-EXACT so the DuckDB oracle reproduces
    every smoothed value bit-for-bit:

      e_0 = n_0 · 10^6;  e_t = (7·e_{t-1} + n_t · 10^6) // 8
      anomaly_t (t ≥ 1)  ⇔  n_t · 10^7 > e_{t-1} · 15     (n_t > 1.5×EWMA)

    (alpha = 1/8 as an exact dyadic rational — one shift-and-divide,
    no float; the 1.5× threshold as a cross-multiplication).  Returns
    per hour: ``(window_start, n, ewma_micro, is_anomaly)``.

    Scale shape: the heavy part — counting events per hour — is the
    tumbling-window exchange (per-batch partial counts, groupby over
    #hours keys, bounded: a year of log is 8.8k rows at ANY event
    volume).  The recurrence is inherently sequential, so it folds on
    the driver over that bounded hourly table — O(#hours) integer ops
    on ≤ 10^4 rows, never the event log.  Oracle: linear recursive CTE
    over the same hourly counts."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {"window_start": pc.floor_temporal(t["ts"], unit="hour")}
        ).to_pandas()
        g = df.groupby("window_start", as_index=False).size()
        out = pa.table({
            "window_start": pa.Array.from_pandas(
                g["window_start"]).cast(pa.timestamp("us")),
            "n": pa.array(g["size"].to_numpy(), pa.int64()),
        })
        return out

    hourly = (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = sorted(
        ((r["window_start"], int(r["n"])) for r in hourly.take_all()),
        key=lambda x: x[0])
    ws = [r[0] for r in rows]
    ns = [r[1] for r in rows]
    ewma, flags = [], []
    e = 0
    for t, n in enumerate(ns):
        if t == 0:
            e = n * 1_000_000
            flags.append(0)
        else:
            flags.append(1 if n * 10_000_000 > e * 15 else 0)
            e = (7 * e + n * 1_000_000) // 8
        ewma.append(e)
    return pa.table({
        "window_start": pa.array(ws, pa.timestamp("us")),
        "n": pa.array(ns, pa.int64()),
        "ewma_micro": pa.array(ewma, pa.int64()),
        "is_anomaly": pa.array(flags, pa.int64()),
    })


def late_event_stats(sf_dir: str, lateness_s: int = 600,
                     max_delay_s: int = 7200, n_parts: int = 64):
    """WATERMARK / LATE-DATA ACCOUNTING — the bounded-out-of-orderness
    watermark of a streaming engine (Flink's
    ``BoundedOutOfOrdernessWatermarks`` semantics), replayed over the
    event log: each event ARRIVES at ``arr_us = ts + md5(event_id) %
    max_delay_s seconds`` (a deterministic network-delay model both
    engines reproduce bit-for-bit, the hash_sample convention); the
    watermark before an arrival is the running max EVENT time over
    earlier arrivals minus ``lateness_s``; an event is LATE if its event
    time is below that watermark.  Returns per event_type
    ``(n_events, n_late, max_lag_us)`` where lag is prev-max − ts.

    Topology = record_event_stats' distributed prefix-scan, keyed on the
    ARRIVAL order: range-partition on arr_us (bounds from one bounded
    min/max pass), per-part Max(ts) partials fold into P exclusive
    carry-in maxima on the driver (P ints at any log size, broadcast via
    ray.put), then one groupby(part) pass does the exclusive local
    cummax ∨ carry compare vectorized and emits ≤ |types| partial rows
    per part.  All arithmetic is int64 microseconds — no float anywhere,
    so Ray == DuckDB's window-function oracle exactly.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from ocr_ray.pipelines.relational import _md5_u64

    l_us = lateness_s * 1_000_000
    sent = -(1 << 62)
    src_path = os.path.join(sf_dir, "events.parquet")

    def add_arr(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        delay = (_md5_u64(t["event_id"].to_pylist())
                 % np.uint64(max_delay_s)).astype(np.int64) * 1_000_000
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "ts_us": ts_us,
            "arr_us": pc.add(ts_us, pa.array(delay, pa.int64())),
        })

    def base():
        return (rd.read_parquet(src_path,
                                columns=["event_id", "event_type", "ts"])
                .map_batches(add_arr, batch_format="pyarrow"))

    b = base().aggregate(Min("arr_us"), Max("arr_us"))
    lo = b.get("min(arr_us)")
    hi = b.get("max(arr_us)")
    if lo is None:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
            "max_lag_us": pa.array([], pa.int64())}))
    span = max(1, int(hi) - int(lo) + 1)
    p = n_parts

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(pc.divide(
            pc.multiply(pc.subtract(t["arr_us"], lo), p), span), pa.int32())
        return t.append_column("part", part)

    src = base().map_batches(add_part, batch_format="pyarrow")

    maxes = (src.map_batches(
        lambda t: pa.Table.from_pandas(
            t.select(["part", "ts_us"]).to_pandas()
            .groupby("part", as_index=False)["ts_us"].max(),
            preserve_index=False),
        batch_format="pyarrow")
        .groupby("part").aggregate(Max("ts_us", alias_name="ts_us"))
        .to_pandas())
    carry = np.full(p, sent, dtype=np.int64)
    if len(maxes):
        m = np.full(p, sent, dtype=np.int64)
        m[maxes["part"].to_numpy()] = maxes["ts_us"].to_numpy()
        carry[1:] = np.maximum.accumulate(m)[:-1]
    carry_ref = ray.put(carry)

    def scan_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["arr_us", "event_id"])
        v = g["ts_us"].to_numpy()
        prev = np.empty_like(v)
        prev[0] = sent
        if len(v) > 1:
            prev[1:] = np.maximum.accumulate(v)[:-1]
        prev = np.maximum(prev, ray.get(carry_ref)[int(g["part"].iloc[0])])
        late = prev - l_us > v
        out = pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            "late": late.astype(np.int64),
            "lag": np.where(late, prev - v, 0).astype(np.int64)})
        res = out.groupby("event_type", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_lag_us=("lag", "max"))
        res["n_events"] = res["n_events"].astype(np.int64)
        res["n_late"] = res["n_late"].astype(np.int64)
        res["max_lag_us"] = res["max_lag_us"].astype(np.int64)
        return res

    return (src.groupby("part").map_groups(scan_part, batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_late", alias_name="n_late"),
                       Max("max_lag_us", alias_name="max_lag_us")))
