"""In-memory CSR graph used by the oracle kernels and by the engine for
contracted (small) levels.

Conventions (pinned to the reference, /root/reference):
- The graph is undirected and stored symmetrically: every edge (u,v),
  u != v, appears as both (u,v) and (v,u); a self-loop (u,u) appears once
  (``graph.cpp:78-81``).
- ``k[v]`` (= ``vertexEdgesSum``) is the sum of weights of v's CSR row,
  self-loop counted once (``modularity_optimisation_mem.cu:26-43``).
- ``M = sum(k)/2`` (``utils.cu:110-131`` sets M = total_weight/2).
- Multi-edges are permitted (the reference's ``buildNewGraph_add`` does not
  dedup, ``main_louvain.cpp:136-142`` issue notes) — all kernels sum over
  CSR entries so duplicates behave like summed weights.
"""

from __future__ import annotations

import numpy as np


class CSRGraph:
    __slots__ = ("n", "indptr", "indices", "weights", "k", "M")

    def __init__(self, n: int, indptr: np.ndarray, indices: np.ndarray,
                 weights: np.ndarray):
        self.n = int(n)
        self.indptr = indptr
        self.indices = indices
        self.weights = weights
        self.k = np.add.reduceat(
            np.concatenate([weights, [0.0]]), indptr[:-1]
        ) if len(indices) else np.zeros(n)
        # reduceat quirk: rows with zero degree copy the next element; fix
        deg = np.diff(indptr)
        self.k = np.where(deg > 0, self.k, 0.0)
        self.M = float(self.k.sum()) / 2.0

    @property
    def degrees(self) -> np.ndarray:
        """CSR row lengths (number of stored entries, self-loop counts 1)."""
        return np.diff(self.indptr)

    @staticmethod
    def from_edges(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                   n: int | None = None) -> "CSRGraph":
        """Build from a symmetric edge list (both directions present,
        self-loops once). Rows sorted by (src, dst) — deterministic."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        w = np.asarray(w, dtype=np.float64)
        if n is None:
            n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
        if (len(w) == 0 or (w == np.floor(w)).all()) and n < 3_000_000_000:
            # integral weights: kernel sums are exact, so the order of
            # equal (src,dst) multi-edges is irrelevant — one unstable
            # composite-key sort instead of the stable lexsort
            order = np.argsort(src * np.int64(n) + dst)
        else:
            order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, src + 1, 1)
        np.cumsum(indptr, out=indptr)
        return CSRGraph(n, indptr, dst, w)

    def neighbors(self, v: int) -> tuple[np.ndarray, np.ndarray]:
        a, b = self.indptr[v], self.indptr[v + 1]
        return self.indices[a:b], self.weights[a:b]

    def to_edge_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        src = np.repeat(np.arange(self.n, dtype=np.int64), self.degrees)
        return src, self.indices.copy(), self.weights.copy()


def symmetrize(src: np.ndarray, dst: np.ndarray, w: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mirror non-self edges; self-loops kept single-sided (graph.cpp:78-81)."""
    nonself = src != dst
    return (np.concatenate([src, dst[nonself]]),
            np.concatenate([dst, src[nonself]]),
            np.concatenate([w, w[nonself]]))


def dedup_sum(src: np.ndarray, dst: np.ndarray, w: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collapse duplicate (src,dst) pairs summing weights (graph.cpp:132-162,
    WEIGHTED branch)."""
    if len(src) == 0:
        return src, dst, w
    n = int(max(src.max(), dst.max()) + 1)
    key = src * np.int64(n) + dst
    order = np.argsort(key, kind="stable")
    key_s, w_s = key[order], w[order]
    uniq, start = np.unique(key_s, return_index=True)
    sums = np.add.reduceat(w_s, start)
    return uniq // n, uniq % n, sums
