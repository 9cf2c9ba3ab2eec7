"""Algorithm supersteps on :class:`GraphShard` (the partition-local halves
of each distributed iteration).

Each superstep follows the same shape: vectorized local compute over the
shard's CSR -> pre-aggregated per-owner message arrays (combiner) ->
object-store exchange -> local apply.  The driver (state/engine.py) only
routes ObjectRefs.

Louvain semantics here are the reference's synchronous bucketed kernel —
identical formulas/tie-breaks as the oracle (linkgraph/oracle/louvain.py,
which cites the reference lines).  Grouped float sums sort by (vertex,
community) before reduceat, matching the oracle's order bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .partition import GraphShard, _grouped_sum, split_by_owner


class AlgoShard(GraphShard):

    # ================= PageRank (directed CSR) ==========================

    def pagerank_init(self, damping: float):
        self.state["rank"] = np.full(self.n_local, 1.0 / self.n_global)
        self._pr_damping = damping
        self._outdeg = np.diff(self.indptr).astype(np.float64)

    def pagerank_partials(self):
        """Per-owner (dst_ids, partial_sums) + local dangling mass.

        Returns P+1 values (use num_returns=P+1): P message tuples then a
        float.  Pre-aggregation by dst bounds exchange volume to
        O(unique boundary dsts) per partition pair — the combiner.
        """
        rank = self.state["rank"]
        contrib = rank / np.maximum(self._outdeg, 1.0)
        vals = np.repeat(contrib, np.diff(self.indptr))
        ids, sums = _grouped_sum(self.indices, vals)
        out = split_by_owner(ids, self.bounds, sums)
        dangling = float(rank[self._outdeg == 0].sum())
        return tuple(out) + (dangling,)

    def pagerank_apply(self, msgs, dangling_total: float) -> float:
        """Apply incoming messages; returns local L1 delta."""
        import ray
        msgs = ray.get(list(msgs)) if msgs and hasattr(msgs[0], "hex") else msgs
        agg = np.zeros(self.n_local)
        for ids, sums in msgs:
            if len(ids):
                agg[ids - self.lo] += sums
        n = self.n_global
        d = self._pr_damping
        new = (1.0 - d) / n + d * (agg + dangling_total / n)
        delta = float(np.abs(new - self.state["rank"]).sum())
        self.state["rank"] = new
        return delta

    def pagerank_result(self) -> pa.Table:
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "rank": self.state["rank"],
        })

    # ================= Connected components (symmetric CSR) =============

    def cc_init(self):
        self.state["comp"] = np.arange(self.lo, self.hi, dtype=np.int64)

    def cc_partials(self):
        """min(comp[src]) grouped by dst, per owner (num_returns=P)."""
        comp = self.state["comp"]
        vals = np.repeat(comp, np.diff(self.indptr))
        ids = self.indices
        if len(ids) == 0:
            empty = np.empty(0, np.int64)
            return tuple((empty, empty) for _ in range(self.P))
        order = np.argsort(ids, kind="stable")
        k, v = ids[order], vals[order]
        uk, start = np.unique(k, return_index=True)
        mins = np.minimum.reduceat(v, start)
        return tuple(split_by_owner(uk, self.bounds, mins))

    def cc_apply(self, msgs) -> int:
        import ray
        msgs = ray.get(list(msgs)) if msgs and hasattr(msgs[0], "hex") else msgs
        comp = self.state["comp"]
        new = comp.copy()
        for ids, mins in msgs:
            if len(ids):
                loc = ids - self.lo
                np.minimum.at(new, loc, mins)
        changed = int((new != comp).sum())
        self.state["comp"] = new
        return changed

    def cc_result(self) -> pa.Table:
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "comp": self.state["comp"],
        })

    # ================= Label propagation (symmetric CSR) ================

    def lpa_init(self):
        self.state["lpa"] = np.arange(self.lo, self.hi, dtype=np.int64)

    def lpa_partials(self):
        """(dst, src_label) weight sums per owner (num_returns=P).

        Self-loops ignored (oracle semantics)."""
        lab = self.state["lpa"]
        src_g = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                          np.diff(self.indptr))
        nonself = self.indices != src_g
        dst = self.indices[nonself]
        w = self.weights[nonself]
        l = np.repeat(lab, np.diff(self.indptr))[nonself]
        key = dst * np.int64(self.n_global) + l
        uk, sums = _grouped_sum(key, w)
        ids = uk // self.n_global
        labs = uk % self.n_global
        return tuple(split_by_owner(ids, self.bounds, labs, sums))

    def lpa_apply(self, msgs) -> int:
        import ray
        msgs = ray.get(list(msgs)) if msgs and hasattr(msgs[0], "hex") else msgs
        ids = np.concatenate([m[0] for m in msgs]) if msgs else np.empty(0, np.int64)
        labs = np.concatenate([m[1] for m in msgs]) if msgs else np.empty(0, np.int64)
        sums = np.concatenate([m[2] for m in msgs]) if msgs else np.empty(0)
        lab = self.state["lpa"]
        if len(ids) == 0:
            return 0
        key = (ids - self.lo) * np.int64(self.n_global) + labs
        uk, s = _grouped_sum(key, sums)
        gv = uk // self.n_global
        gl = uk % self.n_global
        # argmax, tie -> lower label (oracle order)
        ordc = np.lexsort((gl, -s, gv))
        v_s, l_s = gv[ordc], gl[ordc]
        first = np.empty(len(v_s), dtype=bool)
        first[0] = True
        first[1:] = v_s[1:] != v_s[:-1]
        new = lab.copy()
        new[v_s[first]] = l_s[first]
        changed = int((new != lab).sum())
        self.state["lpa"] = new
        return changed

    def lpa_result(self) -> pa.Table:
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "label": self.state["lpa"],
        })

    # ================= Triangle counting (oriented CSR) =================

    def tri_adjacency_requests(self):
        """Ghost oriented-adjacency requests: ids per owner (num_returns=P).

        The shard must hold the DEGREE-ORIENTED graph (engine builds it):
        edges point low (deg,id) -> high, so out-neighborhoods are small
        even at hub vertices (the skew mitigation for this op)."""
        return self.ghosts

    def tri_serve_adjacency(self, ids: np.ndarray):
        """CSR rows for requested local ids: (indptr_slice, concat_indices)."""
        ids = np.asarray(ids, dtype=np.int64) - self.lo
        counts = np.diff(self.indptr)[ids]
        out_idx = np.concatenate(
            [self.indices[self.indptr[v]:self.indptr[v + 1]] for v in ids]
        ) if len(ids) else np.empty(0, np.int64)
        return counts, out_idx

    def tri_count_local(self, ghost_adj) -> int:
        """Count wedges (u -> v -> w) with u local that close (u -> w)."""
        import ray
        ghost_adj = ray.get(list(ghost_adj)) if ghost_adj and hasattr(ghost_adj[0], "hex") else ghost_adj
        # adjacency lookup covering local + ghost vertices
        all_ids = [np.arange(self.lo, self.hi, dtype=np.int64)]
        all_counts = [np.diff(self.indptr)]
        all_concat = [self.indices]
        for g_ids, (counts, concat) in zip(self.ghosts, ghost_adj):
            if len(g_ids):
                all_ids.append(g_ids)
                all_counts.append(counts)
                all_concat.append(concat)
        ids = np.concatenate(all_ids)
        counts = np.concatenate(all_counts)
        offs = np.concatenate([[0], np.cumsum(counts)])
        flat = np.concatenate(all_concat) if sum(len(c) for c in all_concat) else np.empty(0, np.int64)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]

        deg = np.diff(self.indptr)
        u = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo, deg)
        v = self.indices
        # N+(v) for each edge (u,v)
        pos = order[np.searchsorted(sorted_ids, v)]
        v_counts = counts[pos]
        if v_counts.sum() == 0:
            return 0
        w_off = np.concatenate([[0], np.cumsum(v_counts)])
        take = (np.arange(w_off[-1], dtype=np.int64)
                - np.repeat(w_off[:-1], v_counts)
                + np.repeat(offs[pos], v_counts))
        wedge_w = flat[take]
        wedge_u = np.repeat(u, v_counts)
        # closure test against LOCAL oriented edges (u is local)
        local_keys = np.unique(u * np.int64(self.n_global) + v)
        closed = np.isin(wedge_u * np.int64(self.n_global) + wedge_w,
                         local_keys)
        return int(closed.sum())
