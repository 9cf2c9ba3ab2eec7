"""Deterministic synthetic edge-table generator (bench-scale stress).

Generates a directed edge Dataset entirely in parallel map_batches tasks
(pure function of (seed, edge index) — same input at any parallelism).
Used by the scaling benchmark where the pages fixture would be too slow
to reach compute-dominated graph sizes.

Degree model: 80% of edges stay within the source's planted block
(communities of ``block_size`` vertices — Louvain/LPA find real
structure and contraction actually shrinks the graph), 10% go to
``n_hubs`` global hub vertices (Zipf-ish by hub rank — real skew so
degree-balanced partitioning and hub handling are exercised), 10%
uniform random.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pages import splitmix64

_U64 = np.uint64


def edge_batch(seed: int, n_nodes: int, n_hubs: int, block_size: int,
               idx: np.ndarray) -> pa.Table:
    s = splitmix64(_U64(seed) ^ splitmix64(idx.astype(_U64) + _U64(11)))
    src = (splitmix64(s ^ _U64(0x51)) % _U64(n_nodes)).astype(np.int64)
    r = splitmix64(s ^ _U64(0x52))
    uniform_dst = (splitmix64(s ^ _U64(0x53)) % _U64(n_nodes)).astype(np.int64)
    # hub rank ~ floor(n_hubs * u^2): quadratic tilt toward rank 0
    u = (splitmix64(s ^ _U64(0x54)) >> _U64(11)).astype(np.float64) / float(1 << 53)
    hub_dst = np.minimum((u * u * n_hubs).astype(np.int64), n_hubs - 1)
    # within-block dst (planted community)
    block_start = (src // block_size) * block_size
    width = np.minimum(block_size, n_nodes - block_start)
    block_dst = block_start + (splitmix64(s ^ _U64(0x55))
                               % width.astype(_U64)).astype(np.int64)
    pick = (r % _U64(100)).astype(np.int64)
    dst = np.where(pick < 80, block_dst,
                   np.where(pick < 90, hub_dst, uniform_dst))
    keep = src != dst
    return pa.table({"src": src[keep], "dst": dst[keep]})


class EdgeBatchGenerator:
    def __init__(self, seed: int, n_nodes: int, n_hubs: int,
                 block_size: int):
        self.seed, self.n_nodes = seed, n_nodes
        self.n_hubs, self.block_size = n_hubs, block_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy()
        return edge_batch(self.seed, self.n_nodes, self.n_hubs,
                          self.block_size, idx)


def synthetic_edges_dataset(n_edges: int, n_nodes: int, *, seed: int = 42,
                            n_hubs: int = 1000, block_size: int = 1024,
                            parallelism: int = 64):
    """Directed (src, dst) Dataset with w=1 semantics (parallel edges
    possible — harmless for PageRank/CC)."""
    import ray.data as rd

    ds = rd.range(n_edges, override_num_blocks=parallelism)
    return ds.map_batches(
        EdgeBatchGenerator(seed, n_nodes, n_hubs, block_size),
        batch_format="pyarrow", batch_size=1 << 20, zero_copy_batch=True)
