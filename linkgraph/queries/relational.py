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
    joined = orders.join(cust, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))
    return (joined.groupby("c_nationkey")
            .aggregate(Count(alias_name="n_orders"))
            .rename_columns({"c_nationkey": "nationkey"})
            .map_batches(lambda t: t.set_column(
                t.schema.get_field_index("nationkey"), "nationkey",
                t.column("nationkey").cast(pa.int32())),
                batch_format="pyarrow"))


RELATIONAL_SQL: dict[str, str] = {
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
