"""Windowed / sessionized aggregates over the ``events`` table, and the
dynamic-graph delta pipeline driven by it.

The reference's streaming model is discrete timesteps of edge delta
batches (SURVEY.md §2.10); ``events`` plays the role of the timestamped
update stream here.  Windowing ops are the [north-rule] streaming-adjacent
operators a web-scale pipeline needs (tumbling windows, gap sessions,
grouped top-k).

All outputs are integer/exact-copy columns so the DuckDB oracles hash
identically (MIN/MAX of doubles are order-independent; COUNTs are ints).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes
TOPK_PER_USER = 3


def _events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    # strip_meta: pandas parquet metadata breaks schema hashing in Ray's
    # shuffle reduce (see common.strip_meta); every consumer here shuffles
    from ..common import strip_meta
    return strip_meta(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns))


def q_hour_window(sf_dir: str):
    """Tumbling 1h window per user: (user_id, hour, n_events, min_value,
    max_value)."""
    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "hour": pc.floor_temporal(t.column("ts"), unit="hour"),
            "value": t.column("value"),
        })

    from ..stages.exchange import grouped_exchange
    return grouped_exchange(ev, ["user_id", "hour"],
                            [("count", "", "n_events"),
                             ("min", "value", "min_value"),
                             ("max", "value", "max_value")],
                            pre=trunc)


def q_sessions(sf_dir: str):
    """Gap-based sessionization (30 min): (user_id, n_sessions).

    Hash exchange on user_id + ONE lexsort pass per partition over the
    partition's whole event set (stages/exchange
    .keyed_partition_exchange) — no per-user Python, unlike the former
    groupby(user_id).map_groups which paid a pandas call per user."""
    from ..stages.exchange import keyed_partition_exchange
    ev = _events(sf_dir, ["user_id", "ts", "event_id"])

    def count_sessions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # a hash partition can receive no key groups (small inputs /
            # default_partitions() > distinct users): _kpx_reduce then
            # calls fn on a zero-row typed table, and new[0] below would
            # raise — match the guards in pack_nbrs/emit_pairs_part
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        eid = t.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, u))
        us, tss = u[order], ts[order]
        n = len(us)
        same = us[1:] == us[:-1]
        # gap[i] = session break between sorted rows i and i+1 (same user)
        gap = (same & (np.diff(tss) > SESSION_GAP_US)).astype(np.int64)
        cg = np.concatenate([[0], np.cumsum(gap)])
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = ~same
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        # breaks within a user's segment [s, e) = gaps at s..e-2
        n_sessions = 1 + (cg[ends - 1] - cg[starts])
        return pa.table({
            "user_id": pa.array(us[starts], pa.int64()),
            "n_sessions": pa.array(n_sessions.astype(np.int64),
                                   pa.int64())})

    return keyed_partition_exchange(ev, ["user_id"], count_sessions)


def q_type_counts(sf_dir: str):
    return (_events(sf_dir, ["event_type"])
            .groupby("event_type").aggregate(Count(alias_name="n")))


def q_sliding_window(sf_dir: str):
    """Sliding 3h window (RANGE: 2 preceding hours + current) per
    event_type over hourly partials: (event_type, hour, n_events, n_3h,
    max_3h).

    Two-level design: the wide reduction is the tumbling hourly
    aggregate (one shuffle, bounded output = types x hours); the sliding
    frame is then a vectorized cumsum/searchsorted pass over each type's
    tiny hour series — sliding state never touches raw events."""
    ev = _events(sf_dir, ["event_type", "ts", "value"])

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "hour": pc.floor_temporal(t.column("ts"), unit="hour"),
            "value": t.column("value"),
        })

    hourly = (ev.map_batches(trunc, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["event_type", "hour"])
              .aggregate(Count(alias_name="n_events"),
                         Max("value", alias_name="max_3h_src")))

    def slide(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour")
        h = g["hour"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = g["n_events"].to_numpy().astype(np.int64)
        mx = g["max_3h_src"].to_numpy()
        start = np.searchsorted(h, h - 2 * 3_600_000_000, side="left")
        cn = np.concatenate([[0], np.cumsum(n)])
        idx = np.arange(len(h))
        # hours are already aggregated (tiny per type); the variable
        # RANGE-frame max is a short python pass over that small series
        mx3 = np.array([mx[s:i + 1].max() for i, s in zip(idx, start)],
                       np.float64) if len(h) else np.empty(0, np.float64)
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            # explicit us precision: pandas round-trips floor_temporal
            # output to datetime64[s], which the driver's value hasher
            # sees as a different Arrow type than the oracle's
            # timestamp[us] even though the instants are equal
            "hour": g["hour"].to_numpy().astype("datetime64[us]"),
            "n_events": n,
            "n_3h": (cn[idx + 1] - cn[start]).astype(np.int64),
            "max_3h": mx3})

    return hourly.groupby("event_type").map_groups(
        slide, batch_format="pandas")


def q_asof_last_order(sf_dir: str):
    """As-of join (backward): each event matched to the user's latest
    order at-or-before the event timestamp (ties -> max o_orderkey).
    The temporal-lookup operator Ray Data lacks natively; see
    stages/joins.asof_join for the exchange + merge design."""
    from ..common import strip_meta
    from ..stages.joins import asof_join

    ev = _events(sf_dir, ["event_id", "user_id", "ts"])
    orders = strip_meta(rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"]))
    out = asof_join(ev, orders,
                    left_by="user_id", right_by="o_custkey",
                    left_on="ts", right_on="o_orderdate",
                    right_values=["o_orderkey", "o_totalprice"],
                    right_tie="o_orderkey", how="inner")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "last_orderkey": t.column("o_orderkey"),
            "last_totalprice": t.column("o_totalprice")})

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_pairs_1h(sf_dir: str):
    """Range (band) join: pairs of same-user events at most 1 hour
    apart, each pair emitted once under the later event (ties on equal
    ts broken by event_id).  Exercises stages/joins.band_join — the
    interval-predicate join Ray Data lacks natively."""
    from ..stages.joins import band_join

    # materialize once: both join sides derive from the same blocks, so
    # the parquet scan does not run twice for the self-join
    ev = _events(sf_dir, ["event_id", "user_id", "ts"]).materialize()

    def as_b(t: pa.Table) -> pa.Table:
        return pa.table({"b_user_id": t.column("user_id"),
                         "b_event_id": t.column("event_id"),
                         "b_ts": t.column("ts")})

    pairs = band_join(
        ev, ev.map_batches(as_b, batch_format="pyarrow",
                           zero_copy_batch=True),
        left_by="user_id", right_by="b_user_id",
        left_on="ts", right_on="b_ts",
        lo=-3_600_000_000, hi=0,
        left_values=["event_id", "user_id", "ts"],
        right_values=["b_event_id", "b_ts"])

    def strictly_before(t: pa.Table) -> pa.Table:
        a_ts = t.column("ts").to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
        b_ts = t.column("b_ts").to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
        a_id = t.column("event_id").to_numpy()
        b_id = t.column("b_event_id").to_numpy()
        keep = (b_ts < a_ts) | ((b_ts == a_ts) & (b_id < a_id))
        return pa.table({"a_event_id": pa.array(a_id[keep], pa.int64()),
                         "b_event_id": pa.array(b_id[keep], pa.int64()),
                         "user_id": t.column("user_id")
                               .take(pa.array(np.flatnonzero(keep)))})

    return pairs.map_batches(strictly_before, batch_format="pyarrow",
                             zero_copy_batch=True)


def q_topk_per_user(sf_dir: str):
    """Grouped top-k: top events per user by (value desc, event_id asc).

    Per-block partial top-k + hash exchange (stages/exchange
    .grouped_topk) — the same shape as doc_top_quality, replacing the
    former groupby().map_groups which paid one pandas call per user
    (unbounded-cardinality per-group Python)."""
    from ..stages.exchange import grouped_topk
    ev = _events(sf_dir, ["user_id", "event_id", "value"])
    return grouped_topk(ev, by="user_id", value="value", tie="event_id",
                        k=TOPK_PER_USER)


FUNNEL_STEPS = ("view", "click", "purchase")


@ray.remote
def _funnel_reduce(steps: tuple, *parts) -> pa.Table:
    """Per-user ordered-funnel stage over one hash partition: step k's
    first completion is the MIN ts among its events strictly AFTER step
    k-1's first completion.  All-numpy segmented mins (unique-coded
    users, masked minimum.at per step) — no per-user Python."""
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "stage": pa.array([], pa.int64())})
    tbls = [p for p in parts if p is not None and p.num_rows]
    if not tbls:
        return empty
    tbl = pa.concat_tables(tbls)
    u = tbl.column("user_id").to_numpy()
    ts = tbl.column("ts").to_numpy().view(np.int64)
    users, codes = np.unique(u, return_inverse=True)
    inf = np.iinfo(np.int64).max
    prev_t = np.full(len(users), np.iinfo(np.int64).min, np.int64)
    stage = np.zeros(len(users), np.int64)
    for step in steps:
        m = pc.equal(tbl.column("event_type"),
                     step).to_numpy(zero_copy_only=False)
        m &= ts > prev_t[codes]          # prev_t=inf blocks dead chains
        t_k = np.full(len(users), inf, np.int64)
        np.minimum.at(t_k, codes[m], ts[m])
        stage += (t_k < inf).astype(np.int64)
        prev_t = t_k
    keep = stage >= 1
    return pa.table({"user_id": users[keep], "stage": stage[keep]})


def q_funnel(sf_dir: str):
    """Ordered conversion funnel (view -> click -> purchase): per user,
    how many steps were completed IN ORDER (strictly increasing ts;
    step k anchored at step k-1's first completion — the standard
    product-analytics funnel).  One hash exchange on user_id, then a
    vectorized per-partition reduce; rows cross the wire once.  Output
    (user_id, stage>=1) is integer-exact, value-checked by the chained
    conditional-min SQL below."""
    import ray

    from ..stages.joins import _nrows, _split_by_key
    ev = (_events(sf_dir, ["user_id", "ts", "event_type"])
          .materialize())
    blocks = ev.to_arrow_refs()
    from ..stages.exchange import default_partitions
    P = default_partitions()
    split = [_split_by_key.options(num_returns=P).remote(b, "user_id", P)
             for b in blocks]
    if P == 1:
        split = [[r] for r in split]
    outs = [_funnel_reduce.remote(FUNNEL_STEPS,
                                  *[s[p] for s in split])
            for p in range(P)]
    counts = ray.get([_nrows.remote(r) for r in outs])
    kept = [r for r, n in zip(outs, counts) if n]
    return rd.from_arrow_refs(kept if kept else outs[:1])


def q_hll_users(sf_dir: str):
    """HyperLogLog distinct-user registers per event_type — the
    [north-rule] "novel sketch" surface: one ``map_batches`` pass emits
    dense per-block partial registers (<= groups x 256 rows per block,
    independent of block size), one tiny groupby-max merges them.  Raw
    user ids never shuffle; the register table is integer-exact
    (splitmix64), value-checked by the mod-2^64 DuckDB mirror below.
    The cardinality estimator over these registers is
    functions/sketch.hll_estimate (accuracy-tested in
    tests/test_sketch.py)."""
    from ..functions.sketch import hll_partial_registers
    ev = _events(sf_dir, ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uids = t.column("user_id").to_numpy()
        regs = hll_partial_registers(uids, codes, len(enc.dictionary))
        gi, bi = np.nonzero(regs)
        return pa.table({
            "event_type": enc.dictionary.take(pa.array(gi, pa.int64())),
            "bucket": bi.astype(np.int64),
            "max_rho": regs[gi, bi],
        })

    return (ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "bucket"])
            .aggregate(Max("max_rho", alias_name="max_rho")))


def q_cms_users(sf_dir: str):
    """Count-min frequency-sketch registers over the event stream's
    user ids: per-block dense (4 x 1024) bincount registers + one
    groupby-sum merge — same mergeable-sketch shape as the HLL gate.
    Point lookups (min over depths, always >= truth) are
    functions/sketch.cms_query; the register table is value-checked
    exactly (each depth uses a disjoint 16-bit slice of one splitmix64
    hash, mirrored in SQL)."""
    from ray.data.aggregate import Sum

    from ..functions.sketch import cms_partial_registers
    ev = _events(sf_dir, ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uids = t.column("user_id").to_numpy()
        regs = cms_partial_registers(uids)
        di, wi = np.nonzero(regs)
        return pa.table({"depth": di.astype(np.int64),
                         "bucket": wi.astype(np.int64),
                         "cnt": regs[di, wi].astype(np.int64)})

    return (ev.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["depth", "bucket"])
            .aggregate(Sum("cnt", alias_name="cnt")))


# ---- mod-2^64 splitmix64 SQL mirror over events.user_id (the sketch
# oracles value-check the REGISTER TABLES bit-for-bit; same HUGEINT
# wraparound machinery as the doc fingerprint/split oracles in
# queries/registry.py) ----
_T64 = "18446744073709551616::HUGEINT"        # 2^64
_B32 = "4294967296::HUGEINT"                  # 2^32
_SM_GOLDEN = "11400714819323198485::HUGEINT"  # 0x9E3779B97F4A7C15
_SM_M1, _SM_M1_LO = "13787848793156543929::HUGEINT", "484763065::HUGEINT"
_SM_M2, _SM_M2_LO = "10723151780598845931::HUGEINT", "321982955::HUGEINT"


def _mulmod_sql(x: str, m: str, m_lo: str) -> str:
    return (f"CAST(((CAST({x} & 4294967295 AS HUGEINT) * {m}) % {_T64} "
            f"+ ((CAST({x} >> 32 AS HUGEINT) * {m_lo}) % {_B32}) * {_B32})"
            f" % {_T64} AS UBIGINT)")


def _splitmix_ctes(table: str, key: str, carry: str = "") -> str:
    """CTE chain computing h = splitmix64(key) (== text/ops._splitmix64
    bit-for-bit), carrying ``carry`` columns alongside."""
    c = (carry + ", ") if carry else ""
    return f"""
    s0 AS (SELECT {c}CAST((CAST({key} AS HUGEINT) + {_SM_GOLDEN})
                          % {_T64} AS UBIGINT) AS x FROM {table}),
    s1 AS (SELECT {c}xor(x, x >> 30) AS x FROM s0),
    s2 AS (SELECT {c}{_mulmod_sql('x', _SM_M1, _SM_M1_LO)} AS x FROM s1),
    s3 AS (SELECT {c}xor(x, x >> 27) AS x FROM s2),
    s4 AS (SELECT {c}{_mulmod_sql('x', _SM_M2, _SM_M2_LO)} AS x FROM s3),
    s5 AS (SELECT {c}xor(x, x >> 31) AS h FROM s4)"""


# HLL: bucket = top-8 hash bits; rho = 1-based first-set-bit position
# of the low-56-bit suffix (57 when zero).  bin() of a positive BIGINT
# is minimal-width, so length(bin(x)) == bit_length(x) exactly (no
# float log2).  2^56 - 1 = 72057594037927935.
_HLL_SQL = f"""
    WITH {_splitmix_ctes('events', 'user_id', 'event_type')},
    r AS (SELECT event_type,
                 CAST(h >> 56 AS BIGINT) AS bucket,
                 CAST(h & 72057594037927935::UBIGINT AS BIGINT) AS suffix
          FROM s5)
    SELECT event_type, bucket,
           CAST(MAX(CASE WHEN suffix = 0 THEN 57
                         ELSE 57 - length(bin(suffix)) END) AS BIGINT)
               AS max_rho
    FROM r GROUP BY event_type, bucket"""

# CMS: depth i keys on the i-th 16-bit slice of the same hash, mod 1024
_CMS_SQL = f"""
    WITH {_splitmix_ctes('events', 'user_id')},
    e AS (SELECT i, CAST(((h >> CAST(16 * i AS BIGINT)) & 65535) % 1024
                         AS BIGINT) AS bucket
          FROM s5, range(4) t(i))
    SELECT CAST(i AS BIGINT) AS depth, bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM e GROUP BY i, bucket"""


# ordered funnel: step k's first completion = min ts strictly after
# step k-1's (chained conditional mins — the q_funnel semantics exactly)
_FUNNEL_SQL = f"""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
           GROUP BY e.user_id)
    SELECT s1.user_id,
           CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS stage
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s2.user_id = s3.user_id"""


def q_retention(sf_dir: str):
    """Hour-over-hour cohort retention: for each hour h, the number of
    distinct active users and how many of them are also active in
    h+1 — the classic engagement/cohort diagnostic.

    Scale shape: hash exchange on user_id (each user's full hour set
    lands whole in one partition), one lexsort pass per partition over
    (user, hour) finds consecutive-hour pairs, partials pre-aggregated
    per hour, then a small grouped exchange on the hour sums them —
    raw events cross the wire once and nothing per-user runs in
    Python."""
    from ..stages.exchange import grouped_exchange, \
        keyed_partition_exchange
    ev = _events(sf_dir, ["user_id", "ts"])
    HOUR_US = 3_600_000_000

    def per_user(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "hour": pa.array([], pa.timestamp("us")),
            "n_active": pa.array([], pa.int64()),
            "n_retained": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy()
        h = (t.column("ts").to_numpy().astype("datetime64[us]")
             .astype(np.int64) // HOUR_US) * HOUR_US
        order = np.lexsort((h, u))
        us, hs = u[order], h[order]
        keep = np.empty(len(us), dtype=bool)
        keep[0] = True
        keep[1:] = (us[1:] != us[:-1]) | (hs[1:] != hs[:-1])
        us, hs = us[keep], hs[keep]              # distinct (user, hour)
        nxt = (us[1:] == us[:-1]) & (hs[1:] - hs[:-1] == HOUR_US)
        uh, inv = np.unique(hs, return_inverse=True)
        n_act = np.bincount(inv, minlength=len(uh)).astype(np.int64)
        n_ret = np.bincount(inv[:-1], weights=nxt,
                            minlength=len(uh)).astype(np.int64) \
            if len(us) > 1 else np.zeros(len(uh), np.int64)
        return pa.table({
            "hour": pa.array(uh.astype("datetime64[us]")),
            "n_active": pa.array(n_act, pa.int64()),
            "n_retained": pa.array(n_ret, pa.int64())})

    partials = keyed_partition_exchange(ev, ["user_id"], per_user)
    return grouped_exchange(partials, ["hour"],
                            [("sum", "n_active", "n_active"),
                             ("sum", "n_retained", "n_retained")])


_RETENTION_SQL = """
    WITH hu AS (
      SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour
      FROM events)
    SELECT a.hour, CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained
    FROM hu a LEFT JOIN hu b
      ON b.user_id = a.user_id
     AND b.hour = a.hour + INTERVAL 1 HOUR
    GROUP BY a.hour"""


EVENTS_SQL: dict[str, str] = {
    "ev_retention": _RETENTION_SQL,
    "ev_funnel": _FUNNEL_SQL,
    "ev_hll_users": _HLL_SQL,
    "ev_cms_users": _CMS_SQL,
    "ev_hour_window": """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)""",
    "ev_sessions": f"""
        WITH o AS (
          SELECT user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT user_id,
               CAST(SUM(CASE WHEN prev IS NULL
                             OR ts - prev > INTERVAL {SESSION_GAP_US}
                                MICROSECONDS
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM o GROUP BY user_id""",
    "ev_type_counts": """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type""",
    "ev_topk_per_user": f"""
        SELECT user_id, event_id, value FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id)
                <= {TOPK_PER_USER}""",
    "ev_sliding_window": """
        WITH h AS (
          SELECT event_type, date_trunc('hour', ts) AS hour,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 MAX(value) AS max_value
          FROM events GROUP BY 1, 2)
        SELECT event_type, hour, n_events,
               CAST(SUM(n_events) OVER w AS BIGINT) AS n_3h,
               MAX(max_value) OVER w AS max_3h
        FROM h
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     RANGE BETWEEN INTERVAL 2 HOURS PRECEDING
                           AND CURRENT ROW)""",
    "ev_pairs_1h": """
        SELECT a.event_id AS a_event_id, b.event_id AS b_event_id,
               a.user_id
        FROM events a JOIN events b
          ON b.user_id = a.user_id
         AND b.ts >= a.ts - INTERVAL 1 HOUR
         AND (b.ts < a.ts OR (b.ts = a.ts AND b.event_id < a.event_id))""",
    "ev_asof_last_order": """
        WITH j AS (
          SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
                 ROW_NUMBER() OVER (
                     PARTITION BY e.event_id
                     ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
          FROM events e JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        SELECT event_id, user_id, o_orderkey AS last_orderkey,
               o_totalprice AS last_totalprice
        FROM j WHERE rn = 1""",
}


# ------------------------------------------------ dynamic graph from events

N_TIMESTEPS = 3


def event_delta_refs(sf_dir: str, nmod: int) -> list[dict]:
    """Dataset-native :func:`event_deltas`: per-timestep {"add": [refs],
    "del": [refs]} of DIRECTED (src, dst) Arrow block refs — the blocks
    stay in the object store; only per-block row counts reach the driver
    (for the equal-rank timestep cut).  The M5 preprocess (self-loop
    drop + per-batch dedup) runs inside the engine's routed delta
    exchange (engine._route_delta_refs), matching the reference's
    once-through delta-file streaming (main_louvain.cpp:143-322)."""
    import ray

    ev_sorted = (_events(sf_dir, ["event_id", "user_id", "ts"])
                 .sort(["ts", "event_id"]).materialize())
    refs = ev_sorted.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    cut = np.linspace(0, int(offs[-1]), N_TIMESTEPS + 1).astype(np.int64)

    @ray.remote
    def project(tbl: pa.Table, off: int):
        """num_returns = 2*N_TIMESTEPS: (add_t, del_t) per timestep —
        the sorted blocks are rank-contiguous, so the global-rank
        timestep cut is a local position test."""
        eid = tbl.column("event_id").to_numpy()
        src = (tbl.column("user_id").to_numpy() % nmod).astype(np.int64)
        dst = (eid % nmod).astype(np.int64)
        is_del = (eid % 8) == 1
        pos = off + np.arange(len(eid), dtype=np.int64)
        outs = []
        for t in range(N_TIMESTEPS):
            m = (pos >= cut[t]) & (pos < cut[t + 1])
            for deleting in (False, True):
                mm = m & (is_del == deleting)
                outs.append(pa.table({"src": src[mm], "dst": dst[mm]}))
        return tuple(outs)

    nret = 2 * N_TIMESTEPS
    outs = [project.options(num_returns=nret).remote(r, int(offs[i]))
            for i, r in enumerate(refs)]
    return [{"add": [o[2 * t] for o in outs],
             "del": [o[2 * t + 1] for o in outs]}
            for t in range(N_TIMESTEPS)]


def event_deltas(sf_dir: str, nmod: int):
    """Derive per-timestep edge delta batches from ``events``:

    ts bucket = event rank by (ts, event_id) split into N_TIMESTEPS equal
    batches; op = del if event_type endswith '_del'-like (here: deterministic
    by event_id parity 1/8), src = user_id % nmod, dst = event_id % nmod.
    Self-loops dropped, per-batch dedup (the Preprocess.R contract,
    SURVEY.md §2.7 M5).

    Dataset pipeline: the rank order comes from a DISTRIBUTED
    ``sort(["ts","event_id"])`` (blocks stay range-ordered), the modulo
    projection runs worker-side (the ts column never leaves the
    workers), and only the per-batch (src, dst, is_del) int arrays —
    the payload the engine's delta API takes anyway — reach the
    driver."""
    import ray

    ev_sorted = (_events(sf_dir, ["event_id", "user_id", "ts"])
                 .sort(["ts", "event_id"]).materialize())
    refs = ev_sorted.to_arrow_refs()

    @ray.remote
    def project(tbl: pa.Table):
        eid = tbl.column("event_id").to_numpy()
        return ((tbl.column("user_id").to_numpy() % nmod).astype(np.int64),
                (eid % nmod).astype(np.int64), (eid % 8) == 1)

    parts = ray.get([project.remote(r) for r in refs])
    src = (np.concatenate([p[0] for p in parts]) if parts
           else np.empty(0, np.int64))
    dst = (np.concatenate([p[1] for p in parts]) if parts
           else np.empty(0, np.int64))
    is_del = (np.concatenate([p[2] for p in parts]) if parts
              else np.empty(0, bool))
    n = len(src)
    cut = np.linspace(0, n, N_TIMESTEPS + 1).astype(int)
    batches = []
    for t in range(N_TIMESTEPS):
        sl = slice(cut[t], cut[t + 1])
        s, d, dl = src[sl], dst[sl], is_del[sl]
        keep = s != d
        s, d, dl = s[keep], d[keep], dl[keep]
        key = s * nmod + d

        def dedup(ss, dd):
            kk = ss * nmod + dd
            _, idx = np.unique(kk, return_index=True)
            return ss[np.sort(idx)], dd[np.sort(idx)]

        a_s, a_d = dedup(s[~dl], d[~dl])
        d_s, d_d = dedup(s[dl], d[dl])
        batches.append({
            "add": (a_s, a_d, np.ones(len(a_s))),
            "del": (d_s, d_d, np.ones(len(d_s))),
        })
    return batches


def q_dynamic_louvain(sf_dir: str):
    """Dynamic timestep pipeline (M1/M2 delta application + L7/L8
    delta-screening + restricted Louvain): per-(ts, phase) summary rows.
    Rows-only check; oracle parity is covered by tests/test_dynamic.py."""
    from .graphs import NMOD, _build_engine

    # mutates the graph (delta application) -> owns a fresh engine; the
    # shared cache entry must stay pristine for the other queries
    eng = _build_engine(sf_dir, cache=False)
    try:
        eng.louvain()
        rows = []
        for t, deltas in enumerate(event_delta_refs(sf_dir, NMOD)):
            recs = eng.dynamic_step(t, deltas)
            rows.extend(recs)
        tbl = pa.table({
            "ts": pa.array([r["ts"] for r in rows], pa.int64()),
            "phase": pa.array([r["phase"] for r in rows], pa.string()),
            "r_size": pa.array([r["r_size"] for r in rows], pa.int64()),
            "n_nodes": pa.array([r["n_nodes"] for r in rows], pa.int64()),
            "modularity": pa.array([round(r["modularity"], 9)
                                    for r in rows], pa.float64()),
        })
    finally:
        eng.shutdown()
    return tbl
