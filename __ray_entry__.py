"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the linkgraph library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship pipeline on /root/testdata/sf0.001 — build the
  lineitem-derived link graph, run PageRank + connected components +
  Louvain on the partitioned CSR shard actors, return one table of
  per-node results.
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 (see linkgraph/queries/registry.py).
- ``oracle_sql()``: DuckDB equivalents for the SQL-expressible subset.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    import pyarrow as pa

    from linkgraph.queries import graphs as g

    eng = g._build_engine(SF_SMOKE, n_parts=2, cache=False)
    try:
        eng.pagerank(tol=1e-10, max_iter=100)
        rank = eng.pagerank_result()
        eng.connected_components()
        comp = eng.cc_result()
        lv = eng.louvain()
        labels = eng.louvain_result()
    finally:
        eng.shutdown()
    tbl = pa.table({
        "node": rank.column("node"),
        "rank": rank.column("rank"),
        "comp": comp.column("comp"),
        "comm": labels.column("comm"),
    })
    return tbl


def queries() -> dict[str, Callable[[str], Any]]:
    from linkgraph.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from linkgraph.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
