"""General relational operators over the star-schema tables — the same
join/aggregate machinery the link-graph pipeline uses for url->id
resolution (J7), demonstrated on arbitrary keys.

Join strategy mirrors pipelines/ingest.resolve_edges: broadcast the
small side (ray.put once, map inside map_batches) when it fits, hash
shuffle join otherwise.  All outputs are integer/exact-copy or
integer-valued-double columns so the DuckDB oracles hash identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    # strip_meta: parquet written by pandas carries schema metadata that
    # breaks pa.Schema hashing inside Ray's shuffle-reduce schema dedup
    # (see common.strip_meta) — strip once at the read
    from ..common import strip_meta
    return strip_meta(
        rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns))


def q_orders_by_segment(sf_dir: str):
    """orders ⋈ customer (broadcast small side) -> per-segment order
    counts + max total price."""
    from ..common import gather_table
    tbl = gather_table(_read(sf_dir, "customer",
                             ["c_custkey", "c_mktsegment"]))
    keys = tbl.column("c_custkey").to_numpy()
    segs = np.asarray(tbl.column("c_mktsegment").to_pylist(), dtype=object)
    order = np.argsort(keys)
    side = ray.put((keys[order], segs[order]))

    def attach(t: pa.Table) -> pa.Table:
        k, s = ray.get(side)
        idx = np.searchsorted(k, t.column("o_custkey").to_numpy())
        return pa.table({
            "segment": pa.array(list(s[idx]), pa.string()),
            "o_totalprice": t.column("o_totalprice"),
        })

    return (_read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(attach, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("segment")
            .aggregate(Count(alias_name="n_orders"),
                       Max("o_totalprice", alias_name="max_price")))


def q_lineitem_nation_rollup(sf_dir: str):
    """lineitem ⋈ supplier ⋈ nation rollup: per-nation part counts and
    total quantity (integer-valued double — exact)."""
    # broadcast sides are tiny — read directly (a Ray Dataset round-trip
    # splits them into empty-tailed blocks whose schemas no longer concat)
    import pyarrow.parquet as pq
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    sk = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    order = np.argsort(sk)
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    nkey = nat.column("n_nationkey").to_numpy()
    norder = np.argsort(nkey)
    side = ray.put((sk[order], snat[order], nkey[norder], nname[norder]))

    def attach(t: pa.Table) -> pa.Table:
        sk_, snat_, nk_, nn_ = ray.get(side)
        nat_of_sup = snat_[np.searchsorted(sk_, t.column("l_suppkey").to_numpy())]
        names = nn_[np.searchsorted(nk_, nat_of_sup)]
        return pa.table({
            "nation": pa.array(list(names), pa.string()),
            "l_quantity": t.column("l_quantity"),
        })

    return (_read(sf_dir, "lineitem", ["l_suppkey", "l_quantity"])
            .map_batches(attach, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("nation")
            .aggregate(Count(alias_name="n_items"),
                       Sum("l_quantity", alias_name="sum_qty")))


def q_shuffle_join_orders(sf_dir: str):
    """orders ⋈ customer via Ray Data's hash-shuffle join (the
    large-by-large path, J7 analog): per-nation order counts."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    from ..pipelines.ingest import join_partitions
    joined = orders.join(cust, join_type="inner",
                         num_partitions=join_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))
    return (joined.groupby("c_nationkey")
            .aggregate(Count(alias_name="n_orders"))
            .rename_columns({"c_nationkey": "nationkey"})
            .map_batches(lambda t: t.set_column(
                t.schema.get_field_index("nationkey"), "nationkey",
                t.column("nationkey").cast(pa.int32())),
                batch_format="pyarrow"))


# pricing-summary cutoff: predicate pushed into the parquet read
_Q1_CUTOFF = "1998-09-01"
# Q3-shape knobs (shared by the query and its SQL oracle)
_Q3_SEGMENT, _Q3_DATE = "BUILDING", "1998-01-01"
Q3_TOPK = 10


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary: filter at the read (row-group
    pruning via parquet filter), map-side partial aggregation per block,
    then a tiny 6-group final groupby — the canonical wide-table scan.

    Money sums are floor-cent-quantized BEFORE summation (identical
    float64 expression tree on the SQL side) so the int64 sums are
    order-invariant and hash-exact."""
    import datetime

    import pyarrow.compute as pc

    cutoff = datetime.datetime.fromisoformat(_Q1_CUTOFF)
    from ..common import strip_meta
    ds = strip_meta(rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pa.scalar(cutoff))))

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less_equal(t.column("l_shipdate"),
                             pa.scalar(cutoff)).to_numpy(
                                 zero_copy_only=False)
        qty = t.column("l_quantity").to_numpy()[keep].astype(np.int64)
        ep = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        base_c = np.floor(ep * 100.0 + 0.5).astype(np.int64)
        disc_c = np.floor(ep * (1.0 - disc) * 100.0 + 0.5) \
            .astype(np.int64)
        flags = np.asarray(t.column("l_returnflag").to_pylist(),
                           dtype=object)[keep]
        stats = np.asarray(t.column("l_linestatus").to_pylist(),
                           dtype=object)[keep]
        key = np.char.add(flags.astype(str), stats.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        # exact int64 grouped sums (money at corpus scale exceeds the
        # float53 mantissa bincount weights would route through)
        sq = np.zeros(len(uk), np.int64)
        sb = np.zeros(len(uk), np.int64)
        sd = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, qty)
        np.add.at(sb, inv, base_c)
        np.add.at(sd, inv, disc_c)
        return pa.table({
            "l_returnflag": pa.array([k[0] for k in uk], pa.string()),
            "l_linestatus": pa.array([k[1] for k in uk], pa.string()),
            "n_items": pa.array(cnt, pa.int64()),
            "sum_qty": pa.array(sq, pa.int64()),
            "sum_base_cents": pa.array(sb, pa.int64()),
            "sum_disc_cents": pa.array(sd, pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("n_items", alias_name="n_items"),
                       Sum("sum_qty", alias_name="sum_qty"),
                       Sum("sum_base_cents", alias_name="sum_base_cents"),
                       Sum("sum_disc_cents", alias_name="sum_disc_cents")))


RELATIONAL_SQL: dict[str, str] = {
    "rel_top_revenue_orders": f"""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                              * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
          AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
          AND l.l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
        GROUP BY l.l_orderkey
        ORDER BY revenue_cents DESC, l.l_orderkey
        LIMIT {Q3_TOPK}""",
    "rel_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_disc_cents
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "rel_orders_by_segment": """
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MAX(o.o_totalprice) AS max_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""",
    "rel_lineitem_nation_rollup": """
        SELECT n.n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               SUM(l.l_quantity) AS sum_qty
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name""",
    "rel_shuffle_join_orders": """
        SELECT c.c_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey""",
}


def q_top_revenue_orders(sf_dir: str):
    """TPC-H-Q3-shape: top unshipped orders by revenue for one segment.

    Scale shape: both dimension filters broadcast (segment customers and
    date-filtered orders are small AFTER their predicates — read with
    column pruning, filtered before ray.put); the fact-table scan
    pre-aggregates revenue per l_orderkey inside grouped_exchange, and
    the top-k is a per-partition prune + tiny driver merge (never a
    global sort).  Money floor-cent-quantized like rel_pricing_summary."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.exchange import grouped_exchange

    cutoff = datetime.datetime.fromisoformat(_Q3_DATE)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    ck = cust.filter(pc.equal(cust.column("c_mktsegment"), _Q3_SEGMENT)) \
        .column("c_custkey").to_numpy()
    ck = np.sort(ck)
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey",
                                    "o_orderdate"])
    om = orders.filter(pc.less(orders.column("o_orderdate"),
                               pa.scalar(cutoff)))
    ok = om.column("o_custkey").to_numpy()
    pos = np.searchsorted(ck, ok)
    hit = (pos < len(ck))
    hit[hit] = ck[pos[hit]] == ok[hit]
    okeys = np.sort(om.column("o_orderkey").to_numpy()[hit])
    side = ray.put(okeys)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def pre(t: pa.Table) -> pa.Table:
        keys = ray.get(side)
        keep = pc.greater(t.column("l_shipdate"),
                          pa.scalar(cutoff)).to_numpy(zero_copy_only=False)
        lo = t.column("l_orderkey").to_numpy()
        p = np.searchsorted(keys, lo)
        pc_ = np.clip(p, 0, max(0, len(keys) - 1))
        keep &= (keys[pc_] == lo) if len(keys) else False
        ep = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        rev = np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": pa.array(lo[keep], pa.int64()),
            "revenue_cents": pa.array(rev, pa.int64())})

    def topk(t: pa.Table) -> pa.Table:
        rev = t.column("revenue_cents").to_numpy()
        key = t.column("l_orderkey").to_numpy()
        order = np.lexsort((key, -rev))[:Q3_TOPK]
        return t.take(pa.array(order))

    per_order = grouped_exchange(
        li, ["l_orderkey"], [("sum", "revenue_cents", "revenue_cents")],
        pre=pre, post=topk)
    from ..common import gather_table
    return topk(gather_table(per_order).combine_chunks())
