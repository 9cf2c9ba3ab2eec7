"""Graph operators over a deterministic edge table derived from testdata.

The engine's primary input is the ``pages`` table (BASELINE.json
``input_hint``); for the driver's DuckDB-checked correctness gate the
same operators run over an edge table derived *identically* in Ray and
SQL from ``lineitem``:

    src = l_orderkey % NMOD,  dst = l_partkey % NMOD

Operators covered (SURVEY.md §2 ids in parens): E1 symmetrize, E2 clean
/ exact dedup (``graph.cpp:132-162``), E3 renumber (``graph.cpp:93-130``),
E4 add_selfloops (``graph_binary.cpp:151-183``), E6 max_weight
(``graph_binary.cpp:132-140``), E7 check_symmetry
(``graph_binary.cpp:217-240``), A1 degrees, A2 total_weight
(``graph_binary.cpp:124-127``), O4/O5 top-k, plus the north-rule
algorithms (PageRank / CC / LPA / triangles / Louvain) on the
partitioned-actor engine.

Scale notes: every step is a Dataset transform (map_batches over Arrow +
groupby shuffles with explicit keys); nothing materializes the edge table
on the driver except O(#partitions) scalars.  The graph algorithms load
the edge Dataset into degree-balanced CSR shard actors once
(``GraphEngine.from_dataset``) and then iterate actor-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

NMOD = 8192  # node-id modulus; graph is sparse at sf<=0.1 (<=600k rows)

TOPK = 20


# --------------------------------------------------------------------- build

def _num_blocks() -> int:
    """Block count scaled to cluster CPUs (fixed per-task overhead
    dominates at small data; at cluster scale this grows with the
    cluster)."""
    try:
        return max(4, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def base_pairs(sf_dir: str) -> rd.Dataset:
    """lineitem -> (src, dst) pairs; columns pruned at the read."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"],
                         override_num_blocks=_num_blocks())

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("l_orderkey").to_numpy() % NMOD,
            "dst": t.column("l_partkey").to_numpy() % NMOD,
        })

    return li.map_batches(to_pairs, batch_format="pyarrow",
                          zero_copy_batch=True)


# Derived edge/degree tables are shared by many registry queries; the
# shuffle that builds each one runs ONCE per process and the materialized
# blocks (object store) are reused — the "pick one partitioning and reuse
# it across stages" rule.  Values are identical to the lazy pipelines.
_DS_CACHE: dict[tuple, rd.Dataset] = {}


def _cached_ds(key: tuple, build) -> rd.Dataset:
    ds = _DS_CACHE.get(key)
    if ds is None:
        ds = _DS_CACHE[key] = build().materialize()
    return ds


def clear_dataset_cache():
    _DS_CACHE.clear()


def dedup_edges(sf_dir: str) -> rd.Dataset:
    """E2: directed edges with multiplicity weight (key = (src, dst)).

    Uses the explicit combine->hash-split->numpy-reduce exchange from
    the ingest pipeline: one pass over the pairs, no sort-based
    AllToAll (measured ~30x faster than the Dataset groupby at 17M
    rows)."""

    def build():
        from ..pipelines.ingest import _pair_count_exchange
        return _pair_count_exchange(base_pairs(sf_dir), mirror=False)

    return _cached_ds((sf_dir, "dedup"), build)


def sym_edges(sf_dir: str) -> rd.Dataset:
    """E1+E2: symmetric deduped edges, self-loops stored once.

    Single-shuffle formulation: mirror the RAW pairs (self-loops once)
    and count — for (s,d), count = mult(s->d) + mult(d->s), which equals
    the dedup-then-mirror-then-sum weight.  Halves the all-to-all
    exchanges vs the naive two-step (SURVEY.md 'minimize shuffles')."""

    def build():
        from ..pipelines.ingest import _pair_count_exchange
        return _pair_count_exchange(base_pairs(sf_dir), mirror=True)

    return _cached_ds((sf_dir, "sym"), build)


def degrees(sf_dir: str) -> rd.Dataset:
    """A1: per-node degree / weighted degree from the symmetric table."""

    def build():
        from ..pipelines.ingest import degree_table
        return degree_table(sym_edges(sf_dir))

    return _cached_ds((sf_dir, "deg"), build)


# ----------------------------------------------------------------- operators

def q_edges(sf_dir: str):
    return dedup_edges(sf_dir)


def q_sym_edges(sf_dir: str):
    return sym_edges(sf_dir)


def q_degrees(sf_dir: str):
    return degrees(sf_dir)


def q_total_weight(sf_dir: str):
    """A2: 2m — global edge-weight sum of the symmetric table."""
    tw = sym_edges(sf_dir).sum("w")
    return pa.table({"total_weight": pa.array([float(tw)], pa.float64())})


def q_max_weight(sf_dir: str):
    """E6: global max edge weight (max multiplicity)."""
    mw = dedup_edges(sf_dir).max("w")
    return pa.table({"max_weight": pa.array([float(mw)], pa.float64())})


def q_check_symmetry(sf_dir: str):
    """E7 on the *directed* edge table: rows with no reversed match.

    Join-free formulation: canonical key (min, max, w); an off-diagonal
    group of size 1 is exactly an unmatched row.  One groupby shuffle.
    """

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({"u": np.minimum(s, d), "v": np.maximum(s, d),
                         "w": t.column("w").to_numpy()})

    from ..stages.exchange import grouped_exchange
    grouped = grouped_exchange(dedup_edges(sf_dir), ["u", "v", "w"],
                               [("count", "", "c")], pre=canon)
    n = (grouped.filter(expr="c == 1 and u != v")).count()
    return pa.table({"n_asym": pa.array([int(n)], pa.int64())})


def q_nodes_dense(sf_dir: str):
    """E3 renumber: non-isolated nodes -> dense ids in sorted-id order.

    Two passes, no driver row materialization: sort unique ids, then
    per-block offsets (one int per block) -> per-block id assignment —
    same pattern as ``ingest.build_nodes`` (``graph.cpp:93-130``)."""
    nodes = degrees(sf_dir).select_columns(["node"])
    sorted_ds = nodes.sort("node").materialize()
    blocks = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(tbl: pa.Table) -> int:
        return tbl.num_rows

    counts = ray.get([_count.remote(b) for b in blocks])
    offsets = np.concatenate([[0], np.cumsum(counts)])

    @ray.remote
    def _assign(tbl: pa.Table, off: int) -> pa.Table:
        ids = pa.array(np.arange(off, off + tbl.num_rows, dtype=np.int64))
        return pa.table({"node": tbl.column("node"), "node_id": ids})

    return rd.from_arrow_refs([
        _assign.remote(b, int(off)) for b, off in zip(blocks, offsets[:-1])])


def q_add_selfloops(sf_dir: str):
    """E4: append a weight-1 self-loop for every node lacking one.

    Left-anti formulation in ONE groupby: per src, has_loop =
    max(src == dst); nodes with has_loop == 0 emit the new loop.  No
    driver-side node-set collection (the set is O(n_nodes) in general —
    VERDICT r1 #6), and the shuffle key is the same src key the
    symmetric table is already built on."""
    sym = sym_edges(sf_dir).materialize()

    def flag(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("src"),
            "is_loop": pc.cast(pc.equal(t.column("src"), t.column("dst")),
                               pa.int64()),
        })

    def make_loops(t: pa.Table) -> pa.Table:
        nodes = t.column("node").to_numpy()
        return pa.table({
            "src": nodes, "dst": nodes,
            "w": np.ones(len(nodes), dtype=np.float64)})

    from ..stages.exchange import grouped_exchange
    new_loops = (grouped_exchange(sym, ["node"],
                                  [("max", "is_loop", "has")], pre=flag)
                 .filter(expr="has == 0")
                 .map_batches(make_loops, batch_format="pyarrow"))
    return sym.union(new_loops)


def q_top_degree(sf_dir: str):
    """O5: top-k nodes by degree (tie-break: lower node id)."""
    return (degrees(sf_dir).select_columns(["node", "degree"])
            .sort(["degree", "node"], descending=[True, False])
            .limit(TOPK))


# ------------------------------------------------------------- SQL oracles

_BASE = f"""
WITH base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst FROM lineitem
), edges AS (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM base GROUP BY src, dst
), sym AS (
  SELECT src, dst, SUM(w) AS w FROM (
    SELECT src, dst, w FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM edges WHERE src <> dst
  ) GROUP BY src, dst
), deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree,
         SUM(w) AS wdegree
  FROM sym GROUP BY src
)
"""

# exact CC oracle: min-reachable-id propagation as a recursive CTE.  The
# monotone restriction (a label travels only toward larger node ids)
# keeps every (v, component_min) tuple — the component min is below every
# other member by definition — while pruning the quadratic flood of
# non-min labels.  Output = the engine's canonical min-member labeling,
# integer-exact, over ALL {NMOD} vertex slots (isolated -> comp = self).
_CC_SQL = f"""
WITH RECURSIVE cc_base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), cc_sym AS (
  SELECT src, dst FROM cc_base UNION SELECT dst, src FROM cc_base
), r(node, comp) AS (
    SELECT CAST(range AS BIGINT), CAST(range AS BIGINT)
    FROM range({NMOD})
    UNION
    SELECT e.dst, r.comp FROM r JOIN cc_sym e ON e.src = r.node
    WHERE r.comp < e.dst
)
SELECT node, MIN(comp) AS comp FROM r GROUP BY node"""

# exact LPA oracle: synchronous label propagation is integer-exact (edge
# weights are link multiplicities, sums stay < 2^53), so a fixed-20-
# iteration recursive CTE reproduces the engine bit-for-bit.  Per
# iteration: label(v) = argmax over SUM(w) of neighbor labels (self-loops
# excluded), tie -> LOWER label (shard_algos.lpa_apply's segment argmax);
# nodes with no non-self neighbors keep their label via a weight-0 keeper
# self-edge (loses to any real message since real sums are >= 1).  The
# argmax is a packed-key MAX: s * NMOD + (NMOD-1-label) maximizes s then
# minimizes label.  The engine's early break fires only at a true
# fixpoint, where further applies are idempotent -> state after the
# engine's <=20 applies == state after exactly 20 SQL iterations.
_LPA_SQL = f"""
WITH RECURSIVE lpa_base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), lpa_msg AS (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
    SELECT src, dst FROM lpa_base WHERE src <> dst
    UNION ALL
    SELECT dst, src FROM lpa_base WHERE src <> dst
  ) GROUP BY src, dst
  UNION ALL
  SELECT CAST(range AS BIGINT) AS src, CAST(range AS BIGINT) AS dst,
         0.0 AS w
  FROM range({NMOD})
), lab(node, label, iter) AS (
    SELECT CAST(range AS BIGINT), CAST(range AS BIGINT), 0
    FROM range({NMOD})
  UNION ALL
    SELECT node,
           {NMOD} - 1 - (MAX(CAST(s AS BIGINT) * {NMOD}
                             + ({NMOD} - 1 - label)) % {NMOD}) AS label,
           iter + 1
    FROM (
      SELECT e.dst AS node, l.label AS label, l.iter AS iter,
             CAST(SUM(e.w) AS BIGINT) AS s
      FROM lab l JOIN lpa_msg e ON e.src = l.node
      WHERE l.iter < 20
      GROUP BY e.dst, l.label, l.iter
    )
    GROUP BY node, iter
)
SELECT node, label FROM lab WHERE iter = 20"""

# exact-to-quantization PageRank oracle: a fixed-{PR_ITERS}-iteration
# power method as a recursive CTE on the directed deduped graph (the
# same edge set as `graph_edges`, unweighted: contrib = rank/outdeg over
# DISTINCT (src, dst)).  Engine semantics replicated term-for-term
# (shard_algos.pagerank_apply): rank' = (1-d)/n + d*(agg + dangling/n),
# dangling = sum of rank over zero-outdeg slots (scalar subquery on the
# working table — DuckDB allows the second recursive reference), keeper
# weight-0 self-edges keep all {NMOD} slots present every iteration.
# Both sides floor-quantize to 1e-8 BIGINT units; the two float paths
# agree to ~1e-15 absolute while the quantization step is 1e-8, so the
# boundary-flip probability is ~1e-8 per row — value-checked in practice
# (verified exact at sf0.001/0.01/0.1).
PR_ITERS = 15
PR_DAMPING = 0.85
HITS_ITERS = 12
KCORE_K = 5
KCORE_ITERS = 30
PPR_MOD = 101                       # seed set: node % PPR_MOD == 0
_PPR_NS = (NMOD - 1) // PPR_MOD + 1  # |seeds|
# teleport vector as a SQL expression (uniform over the seed set)
_PPR_P = f"(CASE WHEN node % {PPR_MOD} = 0 THEN 1.0 / {_PPR_NS} ELSE 0.0 END)"

_PR_SQL = f"""
WITH RECURSIVE pr_edges AS (
  SELECT DISTINCT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), pr_outd AS (
  SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS od
  FROM pr_edges GROUP BY src
), pr_msg AS (
  SELECT e.src, e.dst, 1.0 / o.od AS w
  FROM pr_edges e JOIN pr_outd o ON o.node = e.src
  UNION ALL
  SELECT CAST(range AS BIGINT), CAST(range AS BIGINT), 0.0
  FROM range({NMOD})
), pr_dang AS (
  SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})
  WHERE CAST(range AS BIGINT) NOT IN (SELECT src FROM pr_edges)
), r(iter, node, rank) AS (
    SELECT 0, CAST(range AS BIGINT), 1.0 / {NMOD} FROM range({NMOD})
  UNION ALL
    SELECT it, node,
           (1.0 - {PR_DAMPING}) / {NMOD}
           + {PR_DAMPING} * (agg + (SELECT COALESCE(SUM(r2.rank), 0.0)
                                    FROM r r2
                                    JOIN pr_dang dg ON dg.node = r2.node
                                    WHERE r2.iter = it - 1) / {NMOD})
    FROM (
      SELECT r.iter + 1 AS it, m.dst AS node, SUM(r.rank * m.w) AS agg
      FROM r JOIN pr_msg m ON m.src = r.node
      WHERE r.iter < {PR_ITERS}
      GROUP BY r.iter, m.dst
    )
)
SELECT node, CAST(FLOOR(rank * 100000000) AS BIGINT) AS rank_q8
FROM r WHERE iter = {PR_ITERS}"""

# personalized-PageRank oracle: _PR_SQL with the uniform teleport
# replaced by the seed-set vector (base rank, restart term, dangling
# redistribution).  Same zero-self-edge + fixed-iteration machinery.
_PPR_SQL = f"""
WITH RECURSIVE pr_edges AS (
  SELECT DISTINCT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), pr_outd AS (
  SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS od
  FROM pr_edges GROUP BY src
), pr_msg AS (
  SELECT e.src, e.dst, 1.0 / o.od AS w
  FROM pr_edges e JOIN pr_outd o ON o.node = e.src
  UNION ALL
  SELECT CAST(range AS BIGINT), CAST(range AS BIGINT), 0.0
  FROM range({NMOD})
), pr_dang AS (
  SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})
  WHERE CAST(range AS BIGINT) NOT IN (SELECT src FROM pr_edges)
), r(iter, node, rank) AS (
    SELECT 0, node, {_PPR_P}
    FROM (SELECT CAST(range AS BIGINT) AS node FROM range({NMOD}))
  UNION ALL
    SELECT it, node,
           (1.0 - {PR_DAMPING}) * {_PPR_P}
           + {PR_DAMPING} * (agg + (SELECT COALESCE(SUM(r2.rank), 0.0)
                                    FROM r r2
                                    JOIN pr_dang dg ON dg.node = r2.node
                                    WHERE r2.iter = it - 1) * {_PPR_P})
    FROM (
      SELECT r.iter + 1 AS it, m.dst AS node, SUM(r.rank * m.w) AS agg
      FROM r JOIN pr_msg m ON m.src = r.node
      WHERE r.iter < {PR_ITERS}
      GROUP BY r.iter, m.dst
    )
)
SELECT node, CAST(FLOOR(rank * 100000000) AS BIGINT) AS rank_q8
FROM r WHERE iter = {PR_ITERS}"""

# Warm-start (incremental) PageRank oracle: phase 1 replays the cold
# {PR_ITERS}-iteration power method on the original graph (identical to
# _PR_SQL's recursion); a deterministic addition batch (the screen-add
# delta rule over orders, applied with the engine's M1 semantics:
# deduped driver-side, then symmetric expansion APPENDED without dedup)
# mutates the edge multiset; phase 2 continues {WARM_ITERS} iterations
# on the mutated graph FROM the converged cold vector — exactly what
# engine.pagerank(warm=True) does after apply_delta_batch.  Appended
# duplicate rows are modeled by multiplicity-weighted messages
# (w = c/od, od = post-delta CSR row count — the engine's
# np.diff(indptr) outdegree).  Same 1e-8 floor-quantization contract as
# the PageRank gate (float paths agree to ~1e-15).
WARM_ITERS = 10
WARM_DELTA_MOD = 11   # == SCREEN_DELTA_MOD (same deterministic batch)

_PR_WARM_DELTA_PRED = (f"o_orderkey % {NMOD} <> o_custkey % {NMOD} "
                       f"AND ((o_orderkey % {NMOD}) * 31 "
                       f"+ (o_custkey % {NMOD})) % {WARM_DELTA_MOD} = 0")

_PR_WARM_SQL = f"""
WITH RECURSIVE pr_edges AS (
  SELECT DISTINCT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), pr_outd AS (
  SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS od
  FROM pr_edges GROUP BY src
), pr_msg AS (
  SELECT e.src, e.dst, 1.0 / o.od AS w
  FROM pr_edges e JOIN pr_outd o ON o.node = e.src
  UNION ALL
  SELECT CAST(range AS BIGINT), CAST(range AS BIGINT), 0.0
  FROM range({NMOD})
), pr_dang AS (
  SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})
  WHERE CAST(range AS BIGINT) NOT IN (SELECT src FROM pr_edges)
), r(iter, node, rank) AS (
    SELECT 0, CAST(range AS BIGINT), 1.0 / {NMOD} FROM range({NMOD})
  UNION ALL
    SELECT it, node,
           (1.0 - {PR_DAMPING}) / {NMOD}
           + {PR_DAMPING} * (agg + (SELECT COALESCE(SUM(r2.rank), 0.0)
                                    FROM r r2
                                    JOIN pr_dang dg ON dg.node = r2.node
                                    WHERE r2.iter = it - 1) / {NMOD})
    FROM (
      SELECT r.iter + 1 AS it, m.dst AS node, SUM(r.rank * m.w) AS agg
      FROM r JOIN pr_msg m ON m.src = r.node
      WHERE r.iter < {PR_ITERS}
      GROUP BY r.iter, m.dst
    )
), wdelta AS (
  SELECT DISTINCT o_orderkey % {NMOD} AS src, o_custkey % {NMOD} AS dst
  FROM orders WHERE {_PR_WARM_DELTA_PRED}
), wsym AS (
  SELECT src, dst FROM wdelta
  UNION ALL
  SELECT dst AS src, src AS dst FROM wdelta
), pmm AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS c FROM (
    SELECT src, dst FROM pr_edges
    UNION ALL
    SELECT src, dst FROM wsym
  ) GROUP BY src, dst
), pod AS (
  SELECT src, SUM(c) AS od FROM pmm GROUP BY src
), wmsg AS MATERIALIZED (
  SELECT m.src, m.dst, m.c / o.od AS w
  FROM pmm m JOIN pod o ON o.src = m.src
  UNION ALL
  SELECT CAST(range AS BIGINT), CAST(range AS BIGINT), 0.0
  FROM range({NMOD})
), wdang AS (
  SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})
  WHERE CAST(range AS BIGINT) NOT IN (SELECT src FROM pmm)
), rw(iter, node, rank) AS (
    SELECT {PR_ITERS}, node, rank FROM r WHERE iter = {PR_ITERS}
  UNION ALL
    SELECT it, node,
           (1.0 - {PR_DAMPING}) / {NMOD}
           + {PR_DAMPING} * (agg + (SELECT COALESCE(SUM(q.rank), 0.0)
                                    FROM rw q
                                    JOIN wdang dg ON dg.node = q.node
                                    WHERE q.iter = it - 1) / {NMOD})
    FROM (
      SELECT rw.iter + 1 AS it, m.dst AS node, SUM(rw.rank * m.w) AS agg
      FROM rw JOIN wmsg m ON m.src = rw.node
      WHERE rw.iter < {PR_ITERS + WARM_ITERS}
      GROUP BY rw.iter, m.dst
    )
)
SELECT node, CAST(FLOOR(rank * 100000000) AS BIGINT) AS rank_q8
FROM rw WHERE iter = {PR_ITERS + WARM_ITERS}"""

# HITS oracle: fixed-iteration recursive CTE carrying (hub, auth) per
# node.  Zero-weight self-edges keep every vertex slot present through
# the two grouped joins (the _PR_SQL trick); L1 normalizers are window
# sums over the full node set.  Engine parity: identical trajectory,
# floor-quantized at 1e-8 (float paths agree to ~1e-15).
_HITS_SQL = f"""
WITH RECURSIVE h_edges AS (
  SELECT DISTINCT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), h_msg AS (
  SELECT src, dst, 1.0 AS w FROM h_edges
  UNION ALL
  SELECT CAST(range AS BIGINT), CAST(range AS BIGINT), 0.0
  FROM range({NMOD})
), r(iter, node, hub, auth) AS (
    SELECT 0, CAST(range AS BIGINT), 1.0 / {NMOD}, 1.0 / {NMOD}
    FROM range({NMOD})
  UNION ALL
    SELECT it, node, hub, auth FROM (
      WITH t AS (
        SELECT r.iter + 1 AS it, m.dst AS node, SUM(r.hub * m.w) AS authraw
        FROM r JOIN h_msg m ON m.src = r.node
        WHERE r.iter < {HITS_ITERS}
        GROUP BY r.iter, m.dst
      ), a AS (
        SELECT it, node, authraw / SUM(authraw) OVER () AS auth FROM t
      ), h AS (
        SELECT a.it AS it, m2.src AS node, SUM(a.auth * m2.w) AS hubraw
        FROM a JOIN h_msg m2 ON m2.dst = a.node
        GROUP BY a.it, m2.src
      )
      SELECT h.it, h.node,
             h.hubraw / SUM(h.hubraw) OVER () AS hub, a2.auth
      FROM h JOIN a a2 ON a2.node = h.node
    )
)
SELECT node, CAST(FLOOR(auth * 100000000) AS BIGINT) AS auth_q8,
       CAST(FLOOR(hub * 100000000) AS BIGINT) AS hub_q8
FROM r WHERE iter = {HITS_ITERS}"""

# k-core oracle: fixed-round peeling.  The working table per recursion
# step is the alive set of the previous round; a node survives iff >= k
# of its non-self symmetric neighbors are alive.  Integer-exact.
_KCORE_SQL = f"""
WITH RECURSIVE kc_base AS (
  SELECT DISTINCT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), kc_sym AS (
  SELECT src, dst FROM kc_base UNION SELECT dst, src FROM kc_base
), kc_ns AS (
  SELECT src, dst FROM kc_sym WHERE src <> dst
), r(iter, node) AS (
    SELECT 0, src FROM (SELECT DISTINCT src FROM kc_ns)
  UNION ALL
    SELECT r.iter + 1, r.node
    FROM r
    WHERE r.iter < {KCORE_ITERS} AND r.node IN (
      SELECT e.src FROM kc_ns e
      JOIN r r2 ON r2.node = e.dst
      GROUP BY e.src HAVING COUNT(*) >= {KCORE_K})
)
SELECT node FROM r WHERE iter = {KCORE_ITERS}"""


# edge-embeddedness oracle: common-neighbor count per canonical edge via
# an intersection join (each triangle found once per edge; the sym table
# is deduped and self-loops are filtered, so COUNT(*) is exact).
_SUPPORT_SQL = f"""
WITH base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst FROM lineitem
), e0 AS (
  SELECT DISTINCT src, dst FROM base
), ns AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
  ) WHERE src <> dst
), ce AS (
  SELECT src AS u, dst AS v FROM ns WHERE src < dst
), inter AS (
  SELECT c.u, c.v, CAST(COUNT(*) AS BIGINT) AS n
  FROM ce c
  JOIN ns a ON a.src = c.u
  JOIN ns b ON b.src = c.v AND b.dst = a.dst
  GROUP BY c.u, c.v
)
SELECT ce.u, ce.v, COALESCE(i.n, 0) AS support
FROM ce LEFT JOIN inter i ON i.u = ce.u AND i.v = ce.v"""

# per-node triangle participation + simple degree: scatter the edge
# supports onto both endpoints (each triangle contributes +1 to both of
# a node's incident triangle edges, so SUM(n)/2 per node is exact).
_NODE_TRI_SQL = f"""
WITH base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst FROM lineitem
), e0 AS (
  SELECT DISTINCT src, dst FROM base
), ns AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
  ) WHERE src <> dst
), ce AS (
  SELECT src AS u, dst AS v FROM ns WHERE src < dst
), inter AS (
  SELECT c.u, c.v, CAST(COUNT(*) AS BIGINT) AS n
  FROM ce c
  JOIN ns a ON a.src = c.u
  JOIN ns b ON b.src = c.v AND b.dst = a.dst
  GROUP BY c.u, c.v
), pern AS (
  SELECT node, CAST(SUM(n) // 2 AS BIGINT) AS tri FROM (
    SELECT u AS node, n FROM inter UNION ALL SELECT v AS node, n FROM inter
  ) GROUP BY node
), degs AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ns GROUP BY src
)
SELECT g.node, COALESCE(p.tri, CAST(0 AS BIGINT)) AS tri,
       COALESCE(d.deg, CAST(0 AS BIGINT)) AS deg
FROM (SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})) g
LEFT JOIN pern p ON p.node = g.node
LEFT JOIN degs d ON d.node = g.node"""


BFS_ITERS = 64

# multi-source BFS hop distance from the deterministic seed set
# {v : v % PPR_MOD == 0} (TrustRank-style seed proximity).  Iteration-
# bounded UNION recursion (terminates on cyclic graphs); MIN(dist) per
# node == synchronous min-relaxation after BFS_ITERS rounds, which the
# engine's fixpoint early-stop reproduces exactly (same argument as the
# k-core gate).  Unreached -> -1 on both sides.
_BFS_SQL = f"""
WITH RECURSIVE b_base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst FROM lineitem
), b_sym AS (
  SELECT src, dst FROM b_base UNION SELECT dst, src FROM b_base
), r(node, dist) AS (
    SELECT CAST(range AS BIGINT), CAST(0 AS BIGINT) FROM range({NMOD})
    WHERE range % {PPR_MOD} = 0
    UNION
    SELECT e.dst, r.dist + 1 FROM r JOIN b_sym e ON e.src = r.node
    WHERE r.dist < {BFS_ITERS}
)
SELECT g.node, COALESCE(m.dist, CAST(-1 AS BIGINT)) AS dist
FROM (SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})) g
LEFT JOIN (SELECT node, MIN(dist) AS dist FROM r GROUP BY node) m
ON m.node = g.node"""


# k=3 (edges in triangle-connected cores): the largest k whose truss is
# non-empty at the driver's sf0.01 gate scale — k=4 peels to 0 rows
# there (support histogram maxes at 3), which would make the gate
# vacuous.  At sf0.1 the 3-truss holds >300k edges.
TRUSS_K = 3
TRUSS_ITERS = 8


def _truss_sql(k: int, iters: int) -> str:
    """Unrolled synchronous k-truss peel: t_{i+1} = edges of t_i whose
    support within t_i is >= k-2 (support via an intersection join on
    t_i's symmetric closure).  Unrolling sidesteps the single-recursive-
    reference limit; both sides cap at the same round count, and the
    engine's fixpoint early-stop is value-identical (monotone peel)."""
    parts = [f"""WITH t_base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst FROM lineitem
), e0 AS (
  SELECT DISTINCT src, dst FROM t_base
), t0 AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM (
    SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
  ) WHERE src < dst
)"""]
    for i in range(iters):
        parts.append(f""", s{i} AS MATERIALIZED (
  SELECT u, v FROM t{i} UNION ALL SELECT v AS u, u AS v FROM t{i}
), t{i + 1} AS MATERIALIZED (
  SELECT c.u, c.v FROM t{i} c
  JOIN s{i} a ON a.u = c.u
  JOIN s{i} b ON b.u = c.v AND b.v = a.v
  GROUP BY c.u, c.v
  HAVING COUNT(*) >= {k - 2}
)""")
    parts.append(f"\nSELECT u, v FROM t{iters}")
    return "".join(parts)


# degree-assortativity sufficient statistics over the directed view of
# the non-self symmetric edge list (deg = simple non-self degree).
_ASSORT_SQL = f"""
WITH base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst FROM lineitem
), e0 AS (
  SELECT DISTINCT src, dst FROM base
), ns AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
  ) WHERE src <> dst
), degs AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ns GROUP BY src
)
SELECT CAST(COUNT(*) AS BIGINT) AS m,
       CAST(SUM(du.deg) AS BIGINT) AS s_deg,
       CAST(SUM(du.deg * du.deg) AS BIGINT) AS s_degsq,
       CAST(SUM(du.deg * dv.deg) AS BIGINT) AS s_prod
FROM ns
JOIN degs du ON du.node = ns.src
JOIN degs dv ON dv.node = ns.dst"""


# link reciprocity: non-self directed edges whose reverse also exists.
_RECIP_SQL = f"""
WITH base AS (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst FROM lineitem
), e0 AS (
  SELECT DISTINCT src, dst FROM base WHERE src <> dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0 a
        JOIN e0 b ON a.src = b.dst AND a.dst = b.src) AS n_recip"""


# one-round Louvain oracle: replays the engine's first synchronous
# bucketed move round from the singleton partition in plain SQL — the
# driver-verifiable slice of the Louvain move kernel (computeGain /
# computeMove semantics, modularity_optimisation_mem.cu:99-205; bucket
# loop :365-420; constants modularity_optimisation.cuh:8-20).  The seven
# degree buckets apply sequentially (each sees the labels/tot/size state
# left by the previous bucket), so the SQL is a generated chain of seven
# identical stages.  Bit-exactness: all sums (e_vc, tot, M) are over
# integral multiplicity weights — exact in float64 regardless of order —
# and the gain expression is written with the same association as the
# numpy kernel (oracle/louvain.py _bucket_moves), so DuckDB computes the
# identical IEEE doubles and the comparisons/tie-breaks agree exactly.
def _louvain_round1_sql() -> str:
    chain, last = _round1_label_chain()
    return chain + f"\nSELECT node, comm FROM {last}"


def _round1_label_chain() -> tuple[str, str]:
    """The shared 7-stage label chain: WITH prologue + per-bucket move
    stages; returns (sql_text, final_label_cte_name).  Reused by the
    round-1 gate (final select) and the screening gate (more CTEs on
    top of the final labels)."""
    from ..oracle.louvain import BUCKET_BOUNDS
    # MATERIALIZED CTEs: the stage chain references sym/kv/lab_i many
    # times each; DuckDB's default per-reference inlining re-opens the
    # parquet for every expansion ("Too many open files" at 7 stages)
    sql = f"""
WITH lv_base AS MATERIALIZED (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), lv_edges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lv_base GROUP BY src, dst
), sym AS MATERIALIZED (
  SELECT src, dst, SUM(w) AS w FROM (
    SELECT src, dst, w FROM lv_edges
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM lv_edges WHERE src <> dst
  ) GROUP BY src, dst
), deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree,
         SUM(w) AS wdegree
  FROM sym GROUP BY src
), lvnodes AS (
  SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})
), kv AS MATERIALIZED (
  SELECT n.node, COALESCE(d.wdegree, 0.0) AS k,
         COALESCE(d.degree, 0) AS degree
  FROM lvnodes n LEFT JOIN deg d ON d.node = n.node
), mm AS MATERIALIZED (
  SELECT SUM(w) / 2 AS m2 FROM sym
), lab0 AS MATERIALIZED (
  SELECT node, node AS comm FROM lvnodes
)"""
    n_buckets = len(BUCKET_BOUNDS) - 1
    for i in range(n_buckets):
        lo, hi = BUCKET_BOUNDS[i], BUCKET_BOUNDS[i + 1]
        hi_pred = "" if i == n_buckets - 1 else f" AND b.degree <= {hi}"
        sql += f"""
, agg{i} AS MATERIALIZED (
  SELECT l.comm, SUM(kv.k) AS tot, CAST(COUNT(*) AS BIGINT) AS sz
  FROM lab{i} l JOIN kv ON kv.node = l.node GROUP BY l.comm
), mv{i} AS MATERIALIZED (
  SELECT e.src AS v, l2.comm AS c, SUM(e.w) AS e_vc
  FROM sym e
  JOIN kv b ON b.node = e.src AND b.degree > {lo}{hi_pred}
  JOIN lab{i} l2 ON l2.node = e.dst
  WHERE e.src <> e.dst
  GROUP BY e.src, l2.comm
), cand{i} AS (
  SELECT m.v, m.c, lc.comm AS cur,
         m.e_vc / mm.m2
           + kv.k * ((ac.tot - kv.k) - at.tot) / (2 * mm.m2 * mm.m2)
           AS gain
  FROM mv{i} m
  JOIN lab{i} lc ON lc.node = m.v
  JOIN agg{i} ac ON ac.comm = lc.comm
  JOIN agg{i} at ON at.comm = m.c
  JOIN kv ON kv.node = m.v
  CROSS JOIN mm
  WHERE m.c <> lc.comm
    AND (m.c < lc.comm OR at.sz > 1 OR ac.sz > 1)
), win{i} AS (
  SELECT v, c, cur, gain,
         ROW_NUMBER() OVER (PARTITION BY v
                            ORDER BY gain DESC, c ASC) AS rn
  FROM cand{i}
), acc{i} AS (
  SELECT w.v, w.c
  FROM win{i} w
  CROSS JOIN mm
  LEFT JOIN mv{i} own ON own.v = w.v AND own.c = w.cur
  WHERE w.rn = 1
    AND (w.gain > 0 OR (w.gain = 0 AND w.c < w.cur))
    AND w.gain - COALESCE(own.e_vc, 0) / mm.m2 > 0
), lab{i + 1} AS MATERIALIZED (
  SELECT l.node, COALESCE(a.c, l.comm) AS comm
  FROM lab{i} l LEFT JOIN acc{i} a ON a.v = l.node
)"""
    return sql, f"lab{n_buckets}"


# Delta-screening oracle (L10, nodeEval_add_gpu semantics,
# node_eval.cu:108-1057 via oracle/louvain.screen_add): starting from
# the deterministic round-1 labels, apply a deterministic addition
# batch (append-without-dedup, the M1 quirk — grouped sums reproduce
# the multi-edge CSR exactly), then compute the screened set R =
# marked sources ∪ their neighbors ∪ members of marked communities.
# Candidate communities per source = {own} ∪ {comms of new targets};
# gains use the modularity formula over the POST-mutation graph with
# the same bit-exact arithmetic argument as the round-1 gate (all
# sums integral).
SCREEN_DELTA_MOD = 11


def _screen_delta_pred(s: str, d: str) -> str:
    return (f"{s} <> {d} AND (({s}) * 31 + ({d})) % {SCREEN_DELTA_MOD} = 0")


def _screen_add_sql() -> str:
    chain, _ = _screen_add_chain()
    return chain + "\nSELECT node FROM rset"


def _screen_add_chain() -> tuple[str, str]:
    """Round-1 labels + post-mutation graph + screening CTEs; returns
    (sql_text, label_cte_name).  Final CTEs: post (grouped post-delta
    edges), kv2 (post weighted degrees), mm2 (post M), rset (the
    screened set).  Reused by graph_screen_add (select rset) and
    graph_dynamic_round1 (restricted move stages on top)."""
    chain, lab = _round1_label_chain()
    pred = _screen_delta_pred(f"o_orderkey % {NMOD}", f"o_custkey % {NMOD}")
    return chain + f"""
, sdelta AS MATERIALIZED (
  SELECT DISTINCT o_orderkey % {NMOD} AS src, o_custkey % {NMOD} AS dst
  FROM orders WHERE {pred}
), sdsym AS MATERIALIZED (
  SELECT src, dst FROM sdelta UNION ALL SELECT dst AS src, src AS dst
  FROM sdelta
), post AS MATERIALIZED (
  SELECT src, dst, SUM(w) AS w FROM (
    SELECT src, dst, w FROM sym
    UNION ALL
    SELECT src, dst, 1.0 AS w FROM sdsym
  ) GROUP BY src, dst
), kv2 AS MATERIALIZED (
  SELECT n.node, COALESCE(d.k, 0.0) AS k
  FROM lvnodes n LEFT JOIN (
    SELECT src AS node, SUM(w) AS k FROM post GROUP BY src) d
  ON d.node = n.node
), mm2 AS MATERIALIZED (
  SELECT SUM(w) / 2 AS m2 FROM post
), agg_s AS MATERIALIZED (
  SELECT l.comm, SUM(kv2.k) AS tot, CAST(COUNT(*) AS BIGINT) AS sz
  FROM {lab} l JOIN kv2 ON kv2.node = l.node GROUP BY l.comm
), cand_set AS MATERIALIZED (
  SELECT DISTINCT v, c FROM (
    SELECT d.src AS v, l.comm AS c
    FROM sdsym d JOIN {lab} l ON l.node = d.dst
    UNION ALL
    SELECT d.src AS v, l.comm AS c
    FROM sdsym d JOIN {lab} l ON l.node = d.src
  )
), mv_s AS MATERIALIZED (
  SELECT e.src AS v, l2.comm AS c, SUM(e.w) AS e_vc
  FROM post e
  JOIN {lab} l2 ON l2.node = e.dst
  JOIN cand_set cs ON cs.v = e.src AND cs.c = l2.comm
  WHERE e.src <> e.dst
  GROUP BY e.src, l2.comm
), scand AS (
  SELECT m.v, m.c, lc.comm AS cur,
         m.e_vc / mm2.m2
           + kv2.k * ((ac.tot - kv2.k) - at.tot)
             / (2 * mm2.m2 * mm2.m2) AS gain
  FROM mv_s m
  JOIN {lab} lc ON lc.node = m.v
  JOIN agg_s ac ON ac.comm = lc.comm
  JOIN agg_s at ON at.comm = m.c
  JOIN kv2 ON kv2.node = m.v
  CROSS JOIN mm2
  WHERE m.c <> lc.comm
    AND (m.c < lc.comm OR at.sz > 1 OR ac.sz > 1)
), swin AS (
  SELECT v, c, cur, gain,
         ROW_NUMBER() OVER (PARTITION BY v
                            ORDER BY gain DESC, c ASC) AS rn
  FROM scand
), smark AS MATERIALIZED (
  SELECT w.v, w.c
  FROM swin w
  CROSS JOIN mm2
  LEFT JOIN mv_s own ON own.v = w.v AND own.c = w.cur
  WHERE w.rn = 1
    AND (w.gain > 0 OR (w.gain = 0 AND w.c < w.cur))
    AND w.gain - COALESCE(own.e_vc, 0) / mm2.m2 > 0
), rset AS (
  SELECT v AS node FROM smark
  UNION
  SELECT e.dst AS node FROM post e JOIN smark s ON s.v = e.src
  UNION
  SELECT l.node FROM {lab} l
  JOIN (SELECT DISTINCT c FROM smark) mc ON mc.c = l.comm
)
""", lab


# Restricted first level (L3, optimiseModularityUsingVertexSubset,
# modularity_optimisation_mem.cu:439-592): after the addition batch and
# its screening, run ONE synchronous bucketed move round where only
# members of R may move (non-R labels frozen; aggregates still cover
# the whole graph).  Degrees for bucket classification come from the
# POST-mutation CSR row counts — appended delta rows are NOT deduped
# (the M1 quirk), so degree2 = sym row count + delta row count, while
# weights/gains use the grouped sums (identical by summation).
def _dynamic_round1_sql() -> str:
    from ..oracle.louvain import BUCKET_BOUNDS
    chain, lab = _screen_add_chain()
    sql = chain + f"""
, dkv AS MATERIALIZED (
  SELECT n.node,
         COALESCE(ds.c, 0) + COALESCE(dd.c, 0) AS degree
  FROM lvnodes n
  LEFT JOIN (SELECT src, CAST(COUNT(*) AS BIGINT) AS c FROM sym
             GROUP BY src) ds ON ds.src = n.node
  LEFT JOIN (SELECT src, CAST(COUNT(*) AS BIGINT) AS c FROM sdsym
             GROUP BY src) dd ON dd.src = n.node
), rlab0 AS MATERIALIZED (
  SELECT node, comm FROM {lab}
)"""
    n_buckets = len(BUCKET_BOUNDS) - 1
    for i in range(n_buckets):
        lo, hi = BUCKET_BOUNDS[i], BUCKET_BOUNDS[i + 1]
        hi_pred = "" if i == n_buckets - 1 else f" AND b.degree <= {hi}"
        sql += f"""
, ragg{i} AS MATERIALIZED (
  SELECT l.comm, SUM(kv2.k) AS tot, CAST(COUNT(*) AS BIGINT) AS sz
  FROM rlab{i} l JOIN kv2 ON kv2.node = l.node GROUP BY l.comm
), rmv{i} AS MATERIALIZED (
  SELECT e.src AS v, l2.comm AS c, SUM(e.w) AS e_vc
  FROM post e
  JOIN dkv b ON b.node = e.src AND b.degree > {lo}{hi_pred}
  JOIN rset r ON r.node = e.src
  JOIN rlab{i} l2 ON l2.node = e.dst
  WHERE e.src <> e.dst
  GROUP BY e.src, l2.comm
), rcand{i} AS (
  SELECT m.v, m.c, lc.comm AS cur,
         m.e_vc / mm2.m2
           + kv2.k * ((ac.tot - kv2.k) - at.tot)
             / (2 * mm2.m2 * mm2.m2) AS gain
  FROM rmv{i} m
  JOIN rlab{i} lc ON lc.node = m.v
  JOIN ragg{i} ac ON ac.comm = lc.comm
  JOIN ragg{i} at ON at.comm = m.c
  JOIN kv2 ON kv2.node = m.v
  CROSS JOIN mm2
  WHERE m.c <> lc.comm
    AND (m.c < lc.comm OR at.sz > 1 OR ac.sz > 1)
), rwin{i} AS (
  SELECT v, c, cur, gain,
         ROW_NUMBER() OVER (PARTITION BY v
                            ORDER BY gain DESC, c ASC) AS rn
  FROM rcand{i}
), racc{i} AS (
  SELECT w.v, w.c
  FROM rwin{i} w
  CROSS JOIN mm2
  LEFT JOIN rmv{i} own ON own.v = w.v AND own.c = w.cur
  WHERE w.rn = 1
    AND (w.gain > 0 OR (w.gain = 0 AND w.c < w.cur))
    AND w.gain - COALESCE(own.e_vc, 0) / mm2.m2 > 0
), rlab{i + 1} AS MATERIALIZED (
  SELECT l.node, COALESCE(a.c, l.comm) AS comm
  FROM rlab{i} l LEFT JOIN racc{i} a ON a.v = l.node
)"""
    return sql + f"\nSELECT node, comm FROM rlab{n_buckets}"


def q_dynamic_round1(sf_dir: str):
    """Restricted first-level gate (L3): the full dynamic-phase slice —
    deterministic round-1 labels, addition batch applied, screening R,
    then ONE move round restricted to R on the distributed kernel —
    value-checked against the generated SQL replay end-to-end."""
    import pyarrow.parquet as pq
    eng = _build_engine(sf_dir, cache=False)
    try:
        eng.louvain_round1()
        t = pq.read_table(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
        s = t.column("o_orderkey").to_numpy() % NMOD
        d = t.column("o_custkey").to_numpy() % NMOD
        keep = (s != d) & ((s * 31 + d) % SCREEN_DELTA_MOD == 0)
        pairs = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        d_src = pairs[:, 0].astype(np.int64)
        d_dst = pairs[:, 1].astype(np.int64)
        eng.apply_delta_batch(add_src=d_src, add_dst=d_dst)
        eng._rebuild_comm_aggs()
        eng._screen("add", d_src, d_dst)
        return eng.louvain_round_restricted()
    finally:
        eng.shutdown()


def q_screen_add(sf_dir: str):
    """Delta-screening gate: R after a deterministic addition batch
    against the round-1 labels, on the distributed screening kernel
    (engine._screen, GPU add semantics L10) — value-checked against
    the generated SQL replay.  Owns its engine (the delta mutates the
    CSR)."""
    import pyarrow.parquet as pq
    eng = _build_engine(sf_dir, cache=False)
    try:
        eng.louvain_round1()
        t = pq.read_table(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
        s = t.column("o_orderkey").to_numpy() % NMOD
        d = t.column("o_custkey").to_numpy() % NMOD
        keep = (s != d) & ((s * 31 + d) % SCREEN_DELTA_MOD == 0)
        pairs = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        d_src = pairs[:, 0].astype(np.int64)
        d_dst = pairs[:, 1].astype(np.int64)
        eng.apply_delta_batch(add_src=d_src, add_dst=d_dst)
        eng._rebuild_comm_aggs()
        eng._screen("add", d_src, d_dst)
        masks = ray.get([a.get_state.remote("R") for a in eng.actors])
        mask = np.concatenate(masks).astype(bool)
        return pa.table({"node": pa.array(np.flatnonzero(mask)
                                          .astype(np.int64), pa.int64())})
    finally:
        eng.shutdown()


# Deletion-screening oracle (L11, nodeEval_del_gpu semantics,
# node_eval.cu:1059-1348 via oracle/louvain.screen_del): a deleted
# edge whose endpoints share a community marks the source vertex and
# that community (both directions of the symmetric list); R = marked ∪
# their POST-deletion neighbors ∪ members of marked communities.  No
# gain arithmetic at all — pure set algebra, integer-exact.
SCREEN_DEL_MOD = 13


def _screen_del_sql() -> str:
    chain, lab = _round1_label_chain()
    return chain + f"""
, ddel AS MATERIALIZED (
  SELECT src, dst FROM sym
  WHERE src < dst AND (src * 31 + dst) % {SCREEN_DEL_MOD} = 0
), ddsym AS MATERIALIZED (
  SELECT src, dst FROM ddel UNION ALL SELECT dst AS src, src AS dst
  FROM ddel
), dpost AS MATERIALIZED (
  SELECT e.src, e.dst, e.w FROM sym e
  LEFT JOIN ddsym x ON x.src = e.src AND x.dst = e.dst
  WHERE x.src IS NULL
), dmark AS MATERIALIZED (
  SELECT d.src AS v, la.comm AS c
  FROM ddsym d
  JOIN {lab} la ON la.node = d.src
  JOIN {lab} lb ON lb.node = d.dst
  WHERE la.comm = lb.comm
), drset AS (
  SELECT v AS node FROM dmark
  UNION
  SELECT e.dst AS node FROM dpost e JOIN (SELECT DISTINCT v FROM dmark) m
    ON m.v = e.src
  UNION
  SELECT l.node FROM {lab} l
  JOIN (SELECT DISTINCT c FROM dmark) mc ON mc.c = l.comm
)
SELECT node FROM drset"""


def q_screen_del(sf_dir: str):
    """Deletion-screening gate: R after a deterministic deletion batch
    against the round-1 labels (engine._screen, GPU del semantics L11)
    — value-checked against the generated SQL replay.  Owns its engine
    (the delta mutates the CSR)."""
    eng = _build_engine(sf_dir, cache=False)
    try:
        eng.louvain_round1()
        from ..common import gather_table
        t = gather_table(sym_edges(sf_dir))
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = (s < d) & ((s * 31 + d) % SCREEN_DEL_MOD == 0)
        d_src = s[keep].astype(np.int64)
        d_dst = d[keep].astype(np.int64)
        eng.apply_delta_batch(del_src=d_src, del_dst=d_dst)
        eng._rebuild_comm_aggs()
        eng._screen("del", d_src, d_dst)
        masks = ray.get([a.get_state.remote("R") for a in eng.actors])
        mask = np.concatenate(masks).astype(bool)
        return pa.table({"node": pa.array(np.flatnonzero(mask)
                                          .astype(np.int64), pa.int64())})
    finally:
        eng.shutdown()


# Zahn–Condorcet one-round oracle: the generic-quality move kernel's
# driver-verifiable slice (gain = 2·e_{v→C} − wu·w_C·max_w,
# zahn.h:96-105, under oracle/qlouvain.py's deterministic synchronous
# semantics).  At level 0 node weights are 1 so w_C is the member
# count; every term (e sums, counts, the max multiplicity weight) is
# integral -> all float64 arithmetic is exact and the comparisons are
# bit-safe without any quantization.  Accept rule: strictly greater
# than max(stay-gain-after-removal, 0); tie -> lowest community id.
def _zahn_round1_sql() -> str:
    from ..oracle.louvain import BUCKET_BOUNDS
    sql = f"""
WITH lv_base AS MATERIALIZED (
  SELECT l_orderkey % {NMOD} AS src, l_partkey % {NMOD} AS dst
  FROM lineitem
), lv_edges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lv_base GROUP BY src, dst
), sym AS MATERIALIZED (
  SELECT src, dst, SUM(w) AS w FROM (
    SELECT src, dst, w FROM lv_edges
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM lv_edges WHERE src <> dst
  ) GROUP BY src, dst
), deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM sym GROUP BY src
), lvnodes AS (
  SELECT CAST(range AS BIGINT) AS node FROM range({NMOD})
), kv AS MATERIALIZED (
  SELECT n.node, COALESCE(d.degree, 0) AS degree
  FROM lvnodes n LEFT JOIN deg d ON d.node = n.node
), mm AS MATERIALIZED (
  SELECT MAX(w) AS mx FROM sym
), lab0 AS MATERIALIZED (
  SELECT node, node AS comm FROM lvnodes
)"""
    n_buckets = len(BUCKET_BOUNDS) - 1
    for i in range(n_buckets):
        lo, hi = BUCKET_BOUNDS[i], BUCKET_BOUNDS[i + 1]
        hi_pred = "" if i == n_buckets - 1 else f" AND b.degree <= {hi}"
        sql += f"""
, agg{i} AS MATERIALIZED (
  SELECT comm, CAST(COUNT(*) AS BIGINT) AS wc
  FROM lab{i} GROUP BY comm
), mv{i} AS MATERIALIZED (
  SELECT e.src AS v, l2.comm AS c, SUM(e.w) AS e_vc
  FROM sym e
  JOIN kv b ON b.node = e.src AND b.degree > {lo}{hi_pred}
  JOIN lab{i} l2 ON l2.node = e.dst
  WHERE e.src <> e.dst
  GROUP BY e.src, l2.comm
), cand{i} AS (
  SELECT m.v, m.c, lc.comm AS cur,
         2.0 * m.e_vc - at.wc * mm.mx AS gain,
         GREATEST(2.0 * COALESCE(own.e_vc, 0)
                  - (ac.wc - 1) * mm.mx, 0.0) AS thr
  FROM mv{i} m
  JOIN lab{i} lc ON lc.node = m.v
  JOIN agg{i} ac ON ac.comm = lc.comm
  JOIN agg{i} at ON at.comm = m.c
  LEFT JOIN mv{i} own ON own.v = m.v AND own.c = lc.comm
  CROSS JOIN mm
  WHERE m.c <> lc.comm
    AND (m.c < lc.comm OR at.wc > 1 OR ac.wc > 1)
), win{i} AS (
  SELECT v, c, gain, thr,
         ROW_NUMBER() OVER (PARTITION BY v
                            ORDER BY gain DESC, c ASC) AS rn
  FROM cand{i}
), acc{i} AS (
  SELECT v, c FROM win{i}
  WHERE rn = 1 AND gain > thr
), lab{i + 1} AS MATERIALIZED (
  SELECT l.node, COALESCE(a.c, l.comm) AS comm
  FROM lab{i} l LEFT JOIN acc{i} a ON a.v = l.node
)"""
    return sql + f"\nSELECT node, comm FROM lab{n_buckets}"


def q_zahn_round1(sf_dir: str):
    """One synchronous bucketed move round of the Zahn–Condorcet (q=1)
    variant kernel from singletons on the distributed generic-gain
    machinery — value-checked against the generated SQL replay.
    Labels snapshot/restored around the run (shared cached engine)."""
    eng = _build_engine(sf_dir)
    eng.push_labels()
    try:
        tbl = eng.louvain_quality_round1(1)
    finally:
        eng.pop_labels()
    return tbl


# Common-neighbors (link-prediction features): for a deterministic
# sample of existing undirected edges (u, v), the number of shared
# neighbors and the neighborhood-union size — the building blocks of
# Jaccard / Adamic-Adar link scores.  Scale shape: the pair sample is
# map-side filtered (never the full edge set on the driver); the
# involved nodes' adjacency lists are packed into sorted binary arrays
# by a keyed exchange and the pair intersections run as ONE vectorized
# lexsort pass per partition (the MinHash pair-verify machinery with
# threshold 0).  Integer-exact -> hash-checked against a SQL
# triangle-join oracle.
CN_PAIR_MOD = 17


def _cn_pair_rows(sf_dir: str):
    """(exploded pair rows joined to packed adjacency) — shared by the
    two link-prediction gates."""
    from ..pipelines.ingest import join_partitions
    pairs, packed = _cn_pairs_packed(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return pa.table({"a": np.concatenate([a, a]),
                         "b": np.concatenate([b, b]),
                         "node": np.concatenate([a, b])})

    return pairs.map_batches(explode, batch_format="pyarrow").join(
        packed, join_type="inner", num_partitions=join_partitions(),
        on=("node",))


def q_common_neighbors(sf_dir: str):
    from ..text.ops import _pair_verify_reduce, pair_verify_exchange
    rows = _cn_pair_rows(sf_dir).materialize()
    # fan-out sized to the candidate volume (shared helper with the
    # minhash verify) — never a hard-coded partition count
    outs = pair_verify_exchange(rows, _pair_verify_reduce, 0.0,
                                n_cand=rows.count() // 2)
    # reduce outputs are uniformly typed (empty included): concat handles
    # the all-empty pair sample without a ValueError
    t = pa.concat_tables(ray.get(outs))
    return pa.table({"u": t.column("a"), "v": t.column("b"),
                     "n_common": t.column("n_common"),
                     "n_union": t.column("n_union")})


# Resource-allocation link-prediction index (Zhou et al.): for the
# same pair sample, RA(u, v) = Σ_{{w ∈ N(u) ∩ N(v)}} 1/deg(w),
# floor-quantized PER TERM to 1e-8 units so the per-pair sum is an
# order-free int64 — bit-safe across numpy and DuckDB (one IEEE
# division + floor per term, no transcendental functions, unlike
# Adamic-Adar's 1/ln).
RA_Q = 100_000_000


@ray.remote
def _ra_reduce(nd_ref, *parts) -> pa.Table:
    """Per-pair quantized RA sums over one hash partition of exploded
    pair rows — the common-neighbor identities are the duplicate
    values of the packed-array intersection pass."""
    from ..text.ops import _binary_rows
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "ra_q8": pa.array([], pa.int64())})
    tbls = [t for t in parts if t is not None and t.num_rows]
    if not tbls:
        return empty
    t = pa.concat_tables(tbls)
    a = t.column("a").to_numpy()
    b = t.column("b").to_numpy()
    off, data = _binary_rows(t.column("sh"))
    ro = np.lexsort((b, a))
    a_s, b_s = a[ro], b[ro]
    new = np.empty(len(ro), dtype=bool)
    new[0] = True
    new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    pid = np.cumsum(new) - 1
    npairs = int(pid[-1]) + 1
    lens = (off[1:] - off[:-1])[ro]
    starts = off[:-1][ro]
    total = int(lens.sum())
    take = (np.repeat(starts, lens) + np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens))
    vals = data[take]
    pid_el = np.repeat(pid, lens)
    o2 = np.lexsort((vals, pid_el))
    v2, p2 = vals[o2], pid_el[o2]
    dup = np.zeros(len(v2), dtype=bool)
    if len(v2) > 1:
        dup[1:] = (v2[1:] == v2[:-1]) & (p2[1:] == p2[:-1])
    w_score = ray.get(nd_ref) if isinstance(nd_ref, ray.ObjectRef) \
        else nd_ref
    comm_w = v2[dup].view(np.int64)
    ra = np.zeros(npairs, np.int64)
    np.add.at(ra, p2[dup], w_score[comm_w])
    rows_per_pair = np.bincount(pid, minlength=npairs)
    firsts = np.flatnonzero(new)
    keep = rows_per_pair == 2
    return pa.table({
        "u": pa.array(a_s[firsts][keep], pa.int64()),
        "v": pa.array(b_s[firsts][keep], pa.int64()),
        "ra_q8": pa.array(ra[keep], pa.int64()),
    })


def _count_by_src(t: pa.Table) -> pa.Table:
    u, c = np.unique(t.column("src").to_numpy(), return_counts=True)
    return pa.table({"node": pa.array(u, pa.int64()),
                     "nd": pa.array(c.astype(np.int64), pa.int64())})


def _nonself_src(t: pa.Table) -> pa.Table:
    s = t.column("src").to_numpy()
    d = t.column("dst").to_numpy()
    return pa.table({"src": pa.array(s[s != d], pa.int64())})


def q_resource_alloc(sf_dir: str):
    """RA link-prediction scores for the deterministic pair sample —
    value-checked (integer-exact quantized terms) against the SQL
    triangle-join oracle."""
    import ray as _ray

    from ..common import gather_table
    from ..stages.exchange import keyed_partition_exchange
    # per-node quantized weight floor(RA_Q / nonself-degree), dense
    # over the node space (broadcast — NMOD entries)
    deg_t = gather_table(keyed_partition_exchange(
        sym_edges(sf_dir).map_batches(_nonself_src,
                                      batch_format="pyarrow"),
        ["src"], _count_by_src))
    w_score = np.zeros(NMOD, np.int64)
    nd_nodes = deg_t.column("node").to_numpy()
    nd_vals = deg_t.column("nd").to_numpy().astype(np.float64)
    w_score[nd_nodes] = np.floor(RA_Q / nd_vals).astype(np.int64)
    nd_ref = _ray.put(w_score)
    from ..text.ops import pair_verify_exchange
    rows = _cn_pair_rows(sf_dir).materialize()
    outs = pair_verify_exchange(rows, _ra_reduce, nd_ref,
                                n_cand=rows.count() // 2)
    return pa.concat_tables(ray.get(outs))


def _cn_pairs_packed(sf_dir: str):
    """Shared machinery for the link-prediction gates: (pair sample,
    packed sorted adjacency of involved nodes)."""
    import ray as _ray

    from ..common import gather_table
    from ..stages.exchange import keyed_partition_exchange
    sym = sym_edges(sf_dir)

    def pick_pairs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = (s < d) & ((s * 31 + d) % CN_PAIR_MOD == 0)
        return pa.table({"a": pa.array(s[keep], pa.int64()),
                         "b": pa.array(d[keep], pa.int64())})

    pairs = sym.map_batches(pick_pairs, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    pt = gather_table(pairs)
    nodeset = np.unique(np.concatenate([pt.column("a").to_numpy(),
                                        pt.column("b").to_numpy()]))
    ns_ref = _ray.put(nodeset)

    def only_involved(t: pa.Table) -> pa.Table:
        ns = _ray.get(ns_ref)
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        pos = np.searchsorted(ns, s)
        hit = (pos < len(ns)) & (ns[np.clip(pos, 0, len(ns) - 1)] == s)
        hit &= s != d
        return pa.table({"src": pa.array(s[hit], pa.int64()),
                         "dst": pa.array(d[hit], pa.int64())})

    inv = sym.map_batches(only_involved, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pack_nbrs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        n = len(s)
        if n == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.large_binary())})
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        offs = (np.concatenate([[0], np.cumsum(counts)]) * 8).astype(
            np.int64)
        sh = pa.Array.from_buffers(
            pa.large_binary(), len(starts),
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(d).tobytes())])
        return pa.table({"node": pa.array(s[starts], pa.int64()),
                         "sh": sh})

    packed = keyed_partition_exchange(inv, ["src"], pack_nbrs)
    return pairs, packed


_RA_SQL = _BASE + f"""
, prs AS (
  SELECT src AS u, dst AS v FROM sym
  WHERE src < dst AND (src * 31 + dst) % {CN_PAIR_MOD} = 0
), nb AS (
  SELECT src, dst FROM sym WHERE src <> dst
), nbdeg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS nd FROM nb GROUP BY src
), ra AS (
  SELECT p.u, p.v,
         CAST(SUM(CAST(FLOOR({RA_Q} / CAST(dw.nd AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS s
  FROM prs p
  JOIN nb x ON x.src = p.u
  JOIN nb y ON y.src = p.v AND y.dst = x.dst
  JOIN nbdeg dw ON dw.node = x.dst
  GROUP BY p.u, p.v
)
SELECT p.u, p.v, COALESCE(r.s, 0) AS ra_q8
FROM prs p LEFT JOIN ra r ON r.u = p.u AND r.v = p.v"""


_COMMON_NEIGHBORS_SQL = _BASE + f"""
, prs AS (
  SELECT src AS u, dst AS v FROM sym
  WHERE src < dst AND (src * 31 + dst) % {CN_PAIR_MOD} = 0
), nb AS (
  SELECT src, dst FROM sym WHERE src <> dst
), nbdeg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS nd FROM nb GROUP BY src
), cmn AS (
  SELECT p.u, p.v, CAST(COUNT(*) AS BIGINT) AS c
  FROM prs p
  JOIN nb x ON x.src = p.u
  JOIN nb y ON y.src = p.v AND y.dst = x.dst
  GROUP BY p.u, p.v
)
SELECT p.u, p.v, COALESCE(c.c, 0) AS n_common,
       du.nd + dv.nd - COALESCE(c.c, 0) AS n_union
FROM prs p
LEFT JOIN cmn c ON c.u = p.u AND c.v = p.v
JOIN nbdeg du ON du.node = p.u
JOIN nbdeg dv ON dv.node = p.v"""


# comm-sizes writer (S8, cluster{t}.txt analog, main_louvain.cpp:
# 1243-1271) over the DETERMINISTIC round-1 labels: a value-checked row
# for the canonical community-output machinery itself (the full-Louvain
# graph_comm_sizes stays rows-only because multi-level Louvain is not
# SQL-expressible).  Canonical id = min member node id.
def _comm_sizes_round1_sql() -> str:
    chain, lab = _round1_label_chain()
    return chain + f"""
SELECT MIN(node) AS comm, CAST(COUNT(*) AS BIGINT) AS size
FROM {lab} GROUP BY comm"""


def q_comm_sizes_round1(sf_dir: str):
    """S8 writer value-checked: canonical (comm = min member, size)
    table over the round-1 labels."""
    eng = _build_engine(sf_dir)
    eng.push_labels()
    try:
        eng.louvain_round1()
        return eng.comm_sizes(canonical=True)
    finally:
        eng.pop_labels()


def q_louvain_round1(sf_dir: str):
    """One synchronous bucketed Louvain move round from the singleton
    partition on the DISTRIBUTED kernel — value-checked against the
    generated SQL replay (_louvain_round1_sql).  Labels are snapshotted
    and restored around the run so the cached engine's installed
    Louvain result (graph_comm_sizes et al.) is untouched."""
    eng = _build_engine(sf_dir)
    eng.push_labels()
    try:
        tbl = eng.louvain_round1()
    finally:
        eng.pop_labels()
    return tbl


# L4 contraction gate: the hash-verified Louvain chain past round 1.
# From the deterministic round-1 labels, the contraction (A7 grouped
# edge-weight sums + dense renumber by ascending community label,
# louvain.cpp:260-333 / community_aggregation_mem.cu:376-633) is pure
# integer/grouped-sum arithmetic — SQL-expressible as three CTEs on top
# of the round-1 label chain.  Engine output = GraphEngine.contract_edges
# (the same partial+fixed-width-dedup machinery full louvain() uses).
def _contract_chain() -> tuple[str, str]:
    """Round-1 chain + contraction CTEs; returns (sql_text, label_cte).
    CTEs added: cmap (comm -> dense cid, ascending-label rank — exactly
    the engine's np.unique renumber) and cedges (grouped contracted
    edge weights; intra-community mass lands on the cid self-loop)."""
    chain, lab = _round1_label_chain()
    return chain + f"""
, cmap AS MATERIALIZED (
  SELECT comm, ROW_NUMBER() OVER (ORDER BY comm) - 1 AS cid
  FROM (SELECT DISTINCT comm FROM {lab})
), cedges AS MATERIALIZED (
  SELECT ca.cid AS src, cb.cid AS dst, SUM(e.w) AS w
  FROM sym e
  JOIN {lab} la ON la.node = e.src
  JOIN {lab} lb ON lb.node = e.dst
  JOIN cmap ca ON ca.comm = la.comm
  JOIN cmap cb ON cb.comm = lb.comm
  GROUP BY ca.cid, cb.cid
)""", lab


def _contract_round1_sql() -> str:
    chain, _ = _contract_chain()
    return chain + "\nSELECT src, dst, w FROM cedges"


def q_contract_round1(sf_dir: str):
    """Contraction gate (L4): round-1 labels -> contracted, densely
    renumbered, exactly deduped edge table on the distributed engine —
    value-checked against the generated SQL replay.  Weights are
    grouped sums of integral multiplicities (order-free exact)."""
    eng = _build_engine(sf_dir)
    eng.push_labels()
    try:
        eng.louvain_round1()
        refs, _ = eng.contract_edges()
        tbl = pa.concat_tables(ray.get(refs))
    finally:
        eng.pop_labels()
    return tbl


# Round-2 move gate: ONE synchronous bucketed move round from singletons
# ON THE CONTRACTED GRAPH — pins the post-contraction agg rebuild -> next
# argmax interaction the round-1 gate cannot see (the level loop,
# gpulouvain.cu:105-128).  The kernel is graph-agnostic, so the SQL is
# the identical 7-stage chain instantiated over cedges: k = CSR row sum
# (community self-loops counted once — the engine's uniform convention),
# degree = row count (self-loop row included), M' = SUM(w)/2 = M, and
# the move sums still exclude self-edges (e.src <> e.dst).  All sums
# remain over integral multiplicities -> bit-exact like round 1.
def _louvain_round2_sql() -> str:
    from ..oracle.louvain import BUCKET_BOUNDS
    chain, _ = _contract_chain()
    sql = chain + """
, ckv AS MATERIALIZED (
  SELECT m.cid AS node, COALESCE(d.k, 0.0) AS k,
         COALESCE(d.degree, 0) AS degree
  FROM cmap m LEFT JOIN (
    SELECT src AS node, SUM(w) AS k, CAST(COUNT(*) AS BIGINT) AS degree
    FROM cedges GROUP BY src) d ON d.node = m.cid
), cmm AS MATERIALIZED (
  SELECT SUM(w) / 2 AS m2 FROM cedges
), clab0 AS MATERIALIZED (
  SELECT cid AS node, cid AS comm FROM cmap
)"""
    n_buckets = len(BUCKET_BOUNDS) - 1
    for i in range(n_buckets):
        lo, hi = BUCKET_BOUNDS[i], BUCKET_BOUNDS[i + 1]
        hi_pred = "" if i == n_buckets - 1 else f" AND b.degree <= {hi}"
        sql += f"""
, cagg{i} AS MATERIALIZED (
  SELECT l.comm, SUM(ckv.k) AS tot, CAST(COUNT(*) AS BIGINT) AS sz
  FROM clab{i} l JOIN ckv ON ckv.node = l.node GROUP BY l.comm
), cmv{i} AS MATERIALIZED (
  SELECT e.src AS v, l2.comm AS c, SUM(e.w) AS e_vc
  FROM cedges e
  JOIN ckv b ON b.node = e.src AND b.degree > {lo}{hi_pred}
  JOIN clab{i} l2 ON l2.node = e.dst
  WHERE e.src <> e.dst
  GROUP BY e.src, l2.comm
), ccand{i} AS (
  SELECT m.v, m.c, lc.comm AS cur,
         m.e_vc / cmm.m2
           + ckv.k * ((ac.tot - ckv.k) - at.tot)
             / (2 * cmm.m2 * cmm.m2) AS gain
  FROM cmv{i} m
  JOIN clab{i} lc ON lc.node = m.v
  JOIN cagg{i} ac ON ac.comm = lc.comm
  JOIN cagg{i} at ON at.comm = m.c
  JOIN ckv ON ckv.node = m.v
  CROSS JOIN cmm
  WHERE m.c <> lc.comm
    AND (m.c < lc.comm OR at.sz > 1 OR ac.sz > 1)
), cwin{i} AS (
  SELECT v, c, cur, gain,
         ROW_NUMBER() OVER (PARTITION BY v
                            ORDER BY gain DESC, c ASC) AS rn
  FROM ccand{i}
), cacc{i} AS (
  SELECT w.v, w.c
  FROM cwin{i} w
  CROSS JOIN cmm
  LEFT JOIN cmv{i} own ON own.v = w.v AND own.c = w.cur
  WHERE w.rn = 1
    AND (w.gain > 0 OR (w.gain = 0 AND w.c < w.cur))
    AND w.gain - COALESCE(own.e_vc, 0) / cmm.m2 > 0
), clab{i + 1} AS MATERIALIZED (
  SELECT l.node, COALESCE(a.c, l.comm) AS comm
  FROM clab{i} l LEFT JOIN cacc{i} a ON a.v = l.node
)"""
    return sql + f"\nSELECT node, comm FROM clab{n_buckets}"


def q_louvain_round2(sf_dir: str):
    """Round-2 move gate: contraction of the round-1 labels fed into a
    CHILD distributed engine (exactly the full-Louvain recursion path,
    engine.louvain's large-contraction branch), then one synchronous
    bucketed move round from singletons on the contracted graph —
    value-checked against the generated SQL replay."""
    import ray.data as rd

    from ..state.engine import GraphEngine
    eng = _build_engine(sf_dir)
    eng.push_labels()
    try:
        eng.louvain_round1()
        refs, n_sub = eng.contract_edges()
    finally:
        eng.pop_labels()
    child = GraphEngine.from_dataset(
        rd.from_arrow_refs(refs), n_nodes=n_sub,
        n_parts=max(2, min(_default_parts(), n_sub // 256)),
        name="q_round2")
    try:
        return child.louvain_round1()
    finally:
        child.shutdown()


# Co-membership sample gate: the reference's fourth built tool
# (main_matrix.cpp:1-2, Makefile:244,269) writes Xij = 1 iff i and j
# share a community — O(n^2) output, useless at scale, so the Ray
# surface is the BOUNDED variant: the within-community indicator for
# the deterministic CN_PAIR_MOD pair sample over the round-1 labels
# (trivially SQL-checkable, closes the last reference entry point).
def _comembership_round1_sql() -> str:
    chain, lab = _round1_label_chain()
    return chain + f"""
, prs AS (
  SELECT src AS u, dst AS v FROM sym
  WHERE src < dst AND (src * 31 + dst) % {CN_PAIR_MOD} = 0
)
SELECT p.u, p.v,
       CAST(CASE WHEN la.comm = lb.comm THEN 1 ELSE 0 END AS BIGINT)
         AS same_comm
FROM prs p
JOIN {lab} la ON la.node = p.u
JOIN {lab} lb ON lb.node = p.v"""


def q_comembership_round1(sf_dir: str):
    """Co-membership indicator for the deterministic pair sample over
    the round-1 labels (the `matrix` tool's semantics, bounded).  The
    dense label vector is broadcast once (ray.put, n_nodes entries);
    the pair sample is map-side filtered from the edge Dataset."""
    import ray as _ray
    eng = _build_engine(sf_dir)
    eng.push_labels()
    try:
        lab_tbl = eng.louvain_round1()
    finally:
        eng.pop_labels()
    lab = np.zeros(NMOD, np.int64)
    lab[lab_tbl.column("node").to_numpy()] = \
        lab_tbl.column("comm").to_numpy()
    lab_ref = _ray.put(lab)

    def mark(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = (s < d) & ((s * 31 + d) % CN_PAIR_MOD == 0)
        s, d = s[keep], d[keep]
        L = _ray.get(lab_ref)
        return pa.table({
            "u": pa.array(s, pa.int64()),
            "v": pa.array(d, pa.int64()),
            "same_comm": pa.array((L[s] == L[d]).astype(np.int64),
                                  pa.int64())})

    return sym_edges(sf_dir).map_batches(mark, batch_format="pyarrow",
                                         zero_copy_batch=True)


GRAPH_SQL: dict[str, str] = {
    "graph_louvain_round1": _louvain_round1_sql(),
    "graph_contract_round1": _contract_round1_sql(),
    "graph_louvain_round2": _louvain_round2_sql(),
    "graph_comembership_round1": _comembership_round1_sql(),
    "graph_pagerank_warm": _PR_WARM_SQL,
    "graph_zahn_round1": _zahn_round1_sql(),
    "graph_screen_add": _screen_add_sql(),
    "graph_screen_del": _screen_del_sql(),
    "graph_dynamic_round1": _dynamic_round1_sql(),
    "graph_comm_sizes_round1": _comm_sizes_round1_sql(),
    "graph_common_neighbors": _COMMON_NEIGHBORS_SQL,
    "graph_resource_alloc": _RA_SQL,
    "graph_edge_support": _SUPPORT_SQL,
    "graph_node_triangles": _NODE_TRI_SQL,
    "graph_reciprocity": _RECIP_SQL,
    "graph_seed_bfs": _BFS_SQL,
    "graph_ktruss": _truss_sql(TRUSS_K, TRUSS_ITERS),
    "graph_assortativity": _ASSORT_SQL,
    "graph_pagerank": _PR_SQL,
    "graph_ppr": _PPR_SQL,
    "graph_hits": _HITS_SQL,
    "graph_kcore": _KCORE_SQL,
    "graph_top_pagerank": f"""
        WITH p AS ({_PR_SQL})
        SELECT node, rank_q8 FROM p
        ORDER BY rank_q8 DESC, node LIMIT 20""",
    "graph_degree_hist": _BASE + """
        SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree""",
    "graph_connected_components": _CC_SQL,
    "graph_label_propagation": _LPA_SQL,
    "graph_edges": _BASE + "SELECT src, dst, w FROM edges",
    "graph_sym_edges": _BASE + "SELECT src, dst, w FROM sym",
    "graph_degrees": _BASE + "SELECT node, degree, wdegree FROM deg",
    "graph_total_weight": _BASE + "SELECT SUM(w) AS total_weight FROM sym",
    "graph_max_weight": _BASE + "SELECT MAX(w) AS max_weight FROM edges",
    "graph_check_symmetry": _BASE + """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_asym
        FROM edges e LEFT JOIN edges r
          ON e.src = r.dst AND e.dst = r.src AND e.w = r.w
        WHERE r.src IS NULL AND e.src <> e.dst""",
    "graph_nodes_dense": _BASE + """
        SELECT node, ROW_NUMBER() OVER (ORDER BY node) - 1 AS node_id
        FROM deg""",
    "graph_add_selfloops": _BASE + """
        SELECT src, dst, w FROM sym
        UNION ALL
        SELECT node AS src, node AS dst, 1.0 AS w FROM deg
        WHERE node NOT IN (SELECT src FROM sym WHERE src = dst)""",
    "graph_top_degree": _BASE + f"""
        SELECT node, degree FROM deg
        ORDER BY degree DESC, node LIMIT {TOPK}""",
    "graph_triangles": _BASE + """
        , o AS (
          SELECT s.src AS u, s.dst AS v
          FROM sym s
          JOIN deg du ON du.node = s.src
          JOIN deg dv ON dv.node = s.dst
          WHERE s.src <> s.dst
            AND (du.degree < dv.degree
                 OR (du.degree = dv.degree AND s.src < s.dst))
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM o e1
        JOIN o e2 ON e2.u = e1.v
        JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v""",
}


# ------------------------------------------------- engine-backed algorithms

# The registry's engine queries all run over the SAME derived edge table,
# so the built engine (actor pool + CSR) is cached per (sf_dir, kind,
# n_parts) and shared: per-algorithm state arrays are independent
# (pagerank_init / cc_init / lpa_init / lv_init_labels each reset their
# own), so reuse is free.  Mutating pipelines (dynamic deltas) must pass
# ``cache=False`` and own their engine.  Small graphs opt in to the
# driver Louvain fast path (GraphEngine.louvain_driver_threshold).
_ENG_CACHE: dict[tuple, object] = {}
LOUVAIN_DRIVER_THRESHOLD = 2_000_000


def _default_parts() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
    except Exception:
        return 4


def _build_engine(sf_dir: str, n_parts: int | None = None, *,
                  kind: str = "sym", cache: bool = True):
    from ..state.engine import GraphEngine
    if n_parts is None:
        n_parts = _default_parts()
    key = (sf_dir, kind, n_parts)
    if cache and key in _ENG_CACHE:
        return _ENG_CACHE[key]
    ds = sym_edges(sf_dir) if kind == "sym" else dedup_edges(sf_dir)
    eng = GraphEngine.from_dataset(ds, n_nodes=NMOD, n_parts=n_parts,
                                   name=f"q_{kind}")
    eng.louvain_driver_threshold = LOUVAIN_DRIVER_THRESHOLD
    if cache:
        _ENG_CACHE[key] = eng
    return eng


def clear_engine_cache():
    for eng in _ENG_CACHE.values():
        eng.shutdown()
    _ENG_CACHE.clear()
    clear_dataset_cache()


def _louvain_engine(sf_dir: str):
    """Cached engine with the static Louvain result computed once (the
    summary query and the community-output queries share it)."""
    eng = _build_engine(sf_dir)
    if getattr(eng, "_q_louvain_res", None) is None:
        eng._q_louvain_res = eng.louvain()
    return eng


def q_pagerank(sf_dir: str):
    """North-rule PageRank on the *directed* deduped edge graph
    (unweighted CSR over distinct (src, dst)).  Fixed {PR_ITERS}
    iterations so the recursive-CTE SQL oracle (_PR_SQL) replays the
    exact same power method; ranks floor-quantized to 1e-8 BIGINT units
    so the gate is VALUE-checked despite float arithmetic (the two
    float paths agree to ~1e-15).  Convergence-mode PageRank (tol) is
    exercised by the headline bench and the engine/oracle tests."""
    eng = _build_engine(sf_dir, kind="dir")
    eng.pagerank(damping=PR_DAMPING, tol=0.0, max_iter=PR_ITERS)
    tbl = eng.pagerank_result()
    q8 = np.floor(tbl.column("rank").to_numpy() * 1e8).astype(np.int64)
    return pa.table({"node": tbl.column("node"),
                     "rank_q8": pa.array(q8, pa.int64())})


TOP_PR_K = 20


def q_pagerank_warm(sf_dir: str):
    """Warm-start incremental PageRank gate, end-to-end on the driver's
    signal: cold fixed-iteration PageRank, a deterministic addition
    batch applied through apply_delta_batch (M1 semantics: deduped
    batch, symmetric expansion, APPENDED without dedup against the
    existing rows), then pagerank(warm=True) continuing {WARM_ITERS}
    iterations from the converged vector with structure terms re-derived
    from the mutated CSR — value-checked against the two-phase
    recursive-CTE replay (_PR_WARM_SQL).  Owns its engine (the delta
    mutates the CSR)."""
    import pyarrow.parquet as pq
    eng = _build_engine(sf_dir, kind="dir", cache=False)
    try:
        eng.pagerank(damping=PR_DAMPING, tol=0.0, max_iter=PR_ITERS)
        t = pq.read_table(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
        s = t.column("o_orderkey").to_numpy() % NMOD
        d = t.column("o_custkey").to_numpy() % NMOD
        keep = (s != d) & ((s * 31 + d) % WARM_DELTA_MOD == 0)
        pairs = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
        eng.apply_delta_batch(add_src=pairs[:, 0].astype(np.int64),
                              add_dst=pairs[:, 1].astype(np.int64))
        eng.pagerank(damping=PR_DAMPING, tol=0.0, max_iter=WARM_ITERS,
                     warm=True)
        tbl = eng.pagerank_result()
    finally:
        eng.shutdown()
    q8 = np.floor(tbl.column("rank").to_numpy() * 1e8).astype(np.int64)
    return pa.table({"node": tbl.column("node"),
                     "rank_q8": pa.array(q8, pa.int64())})


def q_ppr(sf_dir: str):
    """Personalized PageRank: teleport restricted to the deterministic
    seed set {v : v % PPR_MOD == 0} (dangling mass redistributes to the
    seeds too).  Same fixed-iteration + floor-quantization contract as
    the PageRank gate; the seed mask is derived shard-locally from the
    id range — no broadcast."""
    eng = _build_engine(sf_dir, kind="dir")
    eng.pagerank(damping=PR_DAMPING, tol=0.0, max_iter=PR_ITERS,
                 ppr_mod=PPR_MOD)
    tbl = eng.pagerank_result()
    q8 = np.floor(tbl.column("rank").to_numpy() * 1e8).astype(np.int64)
    return pa.table({"node": tbl.column("node"),
                     "rank_q8": pa.array(q8, pa.int64())})


def q_hits(sf_dir: str):
    """Kleinberg HITS hubs/authorities on the directed deduped edge
    graph — the classic link-analysis companion to PageRank (north-rule
    §2.11 family).  Fixed {HITS_ITERS} iterations with L1 normalization
    per half-step so the recursive-CTE SQL oracle (_HITS_SQL) replays
    the exact trajectory; scores floor-quantized to 1e-8 BIGINT units
    (the two float paths agree to ~1e-15 — same argument as the
    PageRank gate)."""
    eng = _build_engine(sf_dir, kind="dir")
    eng.hits(max_iter=HITS_ITERS)
    tbl = eng.hits_result()
    aq = np.floor(tbl.column("auth").to_numpy() * 1e8).astype(np.int64)
    hq = np.floor(tbl.column("hub").to_numpy() * 1e8).astype(np.int64)
    return pa.table({"node": tbl.column("node"),
                     "auth_q8": pa.array(aq, pa.int64()),
                     "hub_q8": pa.array(hq, pa.int64())})


def q_kcore(sf_dir: str):
    """k-core membership (k={KCORE_K}) on the symmetric deduped graph:
    iteratively peel vertices with fewer than k alive non-self
    neighbors.  Integer-exact; the engine stops at the peeling fixpoint
    (identity thereafter), the SQL oracle always runs {KCORE_ITERS}
    rounds — both capped at the same count, so results are identical.
    The reference has no k-core, but the peel reuses the engine's CC
    message pattern (ghost-serve wave + local masked segmented count);
    a standard skew-safe degree-based decomposition primitive for link
    graphs."""
    eng = _build_engine(sf_dir, kind="sym")
    eng.kcore(KCORE_K, max_iter=KCORE_ITERS)
    tbl = eng.kcore_result()
    order = np.argsort(tbl.column("node").to_numpy())
    return tbl.take(pa.array(order))



def q_edge_support(sf_dir: str):
    """Edge embeddedness: for every non-self undirected edge (u < v),
    the number of common neighbors |N(u) ∩ N(v)| (= triangles through
    the edge) — the classic structural signal for community strength /
    spam-link detection.  One oriented wedge scan on the engine (the
    triangles() machinery) + one (v, w) contribution exchange;
    integer-exact vs the SQL intersection-join oracle."""
    eng = _build_engine(sf_dir, kind="sym")
    return eng.edge_support()


def q_node_triangles(sf_dir: str):
    """Per-node triangle participation (node, tri, deg) — the local
    clustering coefficient's inputs, integer-exact so the gate needs no
    quantization.  Reuses the cached per-edge supports (edge_support's
    wedge scan runs once per graph version) plus one aggregated
    (node, count) owner exchange."""
    eng = _build_engine(sf_dir, kind="sym")
    tbl = eng.node_triangles()
    order = np.argsort(tbl.column("node").to_numpy())
    return tbl.take(pa.array(order))


def q_ktruss(sf_dir: str):
    """k-truss ({TRUSS_K}-truss) edge membership — the standard
    cohesive-subgraph / spam-farm-core operator: iteratively peel edges
    supported by fewer than k-2 triangles, supports recomputed on the
    surviving subgraph each round.  Distributed peel reuses the
    edge_support wedge scan with an alive mask on both the scanning and
    serving side; integer-exact vs the unrolled intersection-join SQL
    (both sides capped at {TRUSS_ITERS} rounds; the engine's fixpoint
    early-stop is value-identical)."""
    eng = _build_engine(sf_dir, kind="sym")
    eng.ktruss(TRUSS_K, max_iter=TRUSS_ITERS)
    tbl = eng.ktruss_result()
    order = np.lexsort((tbl.column("v").to_numpy(),
                        tbl.column("u").to_numpy()))
    return tbl.take(pa.array(order))


def q_assortativity(sf_dir: str):
    """Degree-assortativity sufficient statistics (m, Σdeg, Σdeg²,
    Σdeg·deg_nbr) over the non-self symmetric edge list — the classic
    web-graph degree-mixing diagnostic (Pearson r derivable row-locally
    from the four integers, kept as exact BIGINTs so the gate needs no
    float quantization).  One ghost-degree exchange + shard-local
    integer sums; O(P) scalars to the driver."""
    eng = _build_engine(sf_dir, kind="sym")
    m, s_deg, s_degsq, s_prod = eng.assortativity_stats()
    return pa.table({
        "m": pa.array([m], pa.int64()),
        "s_deg": pa.array([s_deg], pa.int64()),
        "s_degsq": pa.array([s_degsq], pa.int64()),
        "s_prod": pa.array([s_prod], pa.int64()),
    })


def q_seed_bfs(sf_dir: str):
    """Hop distance from the deterministic seed set
    {v : v % PPR_MOD == 0} by synchronous multi-source BFS on the
    symmetric CSR (TrustRank-style seed proximity — distance from
    trusted pages is the classic link-spam demotion signal).  One
    ghost-serve wave + local segmented min per round, fixpoint
    early-stop; integer-exact vs the iteration-bounded recursive-CTE
    oracle.  Unreached nodes -> -1."""
    eng = _build_engine(sf_dir, kind="sym")
    eng.bfs(PPR_MOD, max_iter=BFS_ITERS)
    tbl = eng.bfs_result()
    order = np.argsort(tbl.column("node").to_numpy())
    return tbl.take(pa.array(order))


def q_reciprocity(sf_dir: str):
    """Link reciprocity on the directed deduped edge table: how many
    non-self directed edges have their reverse present — the classic
    web-graph link-exchange / spam-farm signal.  Join-free: canonical
    (min,max)-key grouped count (the check_symmetry machinery); a
    deduped off-diagonal group of size 2 is exactly a reciprocal pair.
    One exchange, integer-exact."""

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": np.minimum(s, d), "v": np.maximum(s, d)})

    from ..stages.exchange import grouped_exchange
    grouped = grouped_exchange(dedup_edges(sf_dir), ["u", "v"],
                               [("count", "", "c")], pre=canon)
    grouped = grouped.materialize()
    n_edges = int(grouped.sum("c"))
    n_recip = 2 * int(grouped.filter(expr="c == 2").count())
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_recip": pa.array([n_recip], pa.int64())})


def q_top_pagerank(sf_dir: str):
    """O5 north rule ("top PageRank pages"): top-k nodes by the
    value-checked fixed-iteration PageRank, deterministic tie-break
    (rank_q8 desc, node asc).  Reuses the cached engine; the top-k is a
    driver-side slice of the n_nodes-row rank table (tiny here; at
    corpus scale the same per-block-prune + merge as doc_top_quality
    applies)."""
    tbl = q_pagerank(sf_dir)
    q8 = tbl.column("rank_q8").to_numpy()
    node = tbl.column("node").to_numpy()
    order = np.lexsort((node, -q8))[:TOP_PR_K]
    return tbl.take(pa.array(order))


def q_degree_hist(sf_dir: str):
    """Degree-distribution histogram over the symmetric graph — the
    classic skew diagnostic, one grouped exchange on the integer
    degree."""
    from ..stages.exchange import grouped_exchange
    return grouped_exchange(degrees(sf_dir), ["degree"],
                            [("count", "degree", "n_nodes")])


def q_connected_components(sf_dir: str):
    eng = _build_engine(sf_dir)
    eng.connected_components()
    return eng.cc_result()


def q_label_propagation(sf_dir: str):
    """Synchronous LPA, 20 supersteps — integer-exact, value-checked
    against the fixed-iteration recursive-CTE SQL oracle (_LPA_SQL)."""
    eng = _build_engine(sf_dir)
    eng.label_propagation(max_iter=20)
    return eng.lpa_result()


def q_louvain(sf_dir: str):
    """Static Louvain summary (modularity trajectory is float/iterative —
    rows-only; exactness vs the oracle kernel is covered by tests/)."""
    eng = _louvain_engine(sf_dir)
    res = eng._q_louvain_res
    return pa.table({
        "n_comms": pa.array([int(res["n_comms"])], pa.int64()),
        "n_levels": pa.array([int(res["n_levels"])], pa.int64()),
        "modularity": pa.array([round(res["modularity"], 9)],
                               pa.float64()),
    })


def q_triangles(sf_dir: str):
    eng = _build_engine(sf_dir)
    n = eng.triangles()
    return pa.table({"n_triangles": pa.array([int(n)], pa.int64())})
