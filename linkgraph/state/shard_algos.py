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
import ray

from .partition import (GraphShard, _grouped_sum, _grouped_sum2, _pair_view,
                        composite_fits, split_by_owner)


def _resolve_refs(msgs):
    """ray.get messages when they arrive as ObjectRefs nested in a list."""
    msgs = list(msgs)
    if msgs and isinstance(msgs[0], ray.ObjectRef):
        return ray.get(msgs)
    return msgs


class AlgoShard(GraphShard):

    # ================= PageRank (directed CSR) ==========================

    def pagerank_init(self, damping: float, ppr_mod: int | None = None,
                      warm: bool = False):
        """``ppr_mod`` switches to personalized PageRank: the teleport
        vector is uniform over the deterministic seed set
        {v : v % ppr_mod == 0} (computable shard-locally — no broadcast)
        and dangling mass also redistributes to the seeds.

        ``warm`` keeps the existing rank vector as the starting point
        (incremental PageRank after a delta batch: the fixed point is
        start-independent at damping < 1, so a previous solution is
        just a close initial guess that converges in far fewer
        iterations) while the STRUCTURE terms — out-degrees, dangling
        bookkeeping, contribs — are recomputed from the mutated CSR;
        new nodes (grown node space) start at the uniform value."""
        if ppr_mod:
            ns = (self.n_global - 1) // ppr_mod + 1
            ids = np.arange(self.lo, self.hi, dtype=np.int64)
            self._pr_pvec = np.where(ids % ppr_mod == 0, 1.0 / ns, 0.0)
            self.state["rank"] = self._pr_pvec.copy()
        else:
            self._pr_pvec = None
            prev = self.state.get("rank") if warm else None
            if prev is not None and len(prev) == self.n_local:
                pass                        # keep the converged vector
            elif prev is not None:
                r = np.full(self.n_local, 1.0 / self.n_global)
                r[:len(prev)] = prev
                self.state["rank"] = r
            else:
                self.state["rank"] = np.full(self.n_local,
                                             1.0 / self.n_global)
        self._pr_damping = damping
        # out-degree comes from the full CSR (hub rows included — the
        # fragment copies are duplicates, not extra edges)
        self._outdeg = np.diff(self.indptr).astype(np.float64)
        self._frag_agg = None
        # contrib published as state so frag_serve("pr_contrib") works;
        # refreshed at the end of every apply
        self.state["pr_contrib"] = \
            self.state["rank"] / np.maximum(self._outdeg, 1.0)

    def pagerank_set_frag(self, vals):
        """Compute the LOCAL aggregate of fragment contributions:
        fragments live with owner(dst), so no message leaves this shard."""
        contrib_u = self._frag_src_values(vals)
        if len(self.frag_src_u) == 0:
            self._frag_agg = None
            return
        vals_e = np.repeat(contrib_u, self.frag_counts)
        fperm, fuk, fstarts = self._frag_groups
        sums = np.add.reduceat(vals_e[fperm], fstarts) if len(fstarts) \
            else np.empty(0)
        agg = np.zeros(self.n_local)
        agg[fuk - self.lo] = sums
        self._frag_agg = agg

    def pagerank_partials(self, frag_vals=None):
        """Per-owner (dst_ids, partial_sums, local_dangling) messages
        (num_returns=P).  The dangling scalar rides along in EVERY
        message so apply can total it without a driver-side barrier.
        Pre-aggregation by dst bounds exchange volume to O(unique
        boundary dsts) per partition pair — the combiner.
        """
        if frag_vals is not None:
            self.pagerank_set_frag(frag_vals)
        rank = self.state["rank"]
        contrib = rank / np.maximum(self._outdeg, 1.0)
        rowperm, uk, starts, cuts = self._msg_groups()
        vals = contrib[rowperm]
        sums = np.add.reduceat(vals, starts) if len(starts) \
            else np.empty(0, np.float64)
        dangling = float(rank[self._outdeg == 0].sum())
        out = []
        empty = (np.empty(0, np.int64), np.empty(0, np.float64), dangling)
        for p in range(self.P):
            chunk = (uk[cuts[p]:cuts[p + 1]], sums[cuts[p]:cuts[p + 1]],
                     dangling)
            if p == self.pid:
                # self-message stays in-actor: it is the largest chunk
                # (locality-partitioned graphs keep most edges local) and
                # round-tripping it through the object store dominated
                # per-iteration overhead
                self._self_msg = chunk
                out.append(empty)
            else:
                out.append(chunk)
        return tuple(out)

    def pagerank_apply(self, msgs) -> float:
        """Apply incoming messages; returns local L1 delta."""
        msgs = _resolve_refs(msgs)
        msgs = list(msgs)
        msgs[self.pid] = self._self_msg
        agg = np.zeros(self.n_local)
        dangling_total = 0.0
        for ids, sums, dang in msgs:
            dangling_total += dang
            if len(ids):
                agg[ids - self.lo] += sums
        if getattr(self, "_frag_agg", None) is not None:
            agg += self._frag_agg
        n = self.n_global
        d = self._pr_damping
        if getattr(self, "_pr_pvec", None) is not None:
            pv = self._pr_pvec
            new = (1.0 - d) * pv + d * (agg + dangling_total * pv)
        else:
            new = (1.0 - d) / n + d * (agg + dangling_total / n)
        delta = float(np.abs(new - self.state["rank"]).sum())
        self.state["rank"] = new
        self.state["pr_contrib"] = new / np.maximum(self._outdeg, 1.0)
        return delta

    def pagerank_result(self) -> pa.Table:
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "rank": self.state["rank"],
        })

    # ================= HITS hubs/authorities (directed CSR) =============
    #
    # Kleinberg's HITS with L1 normalization per half-step, the classic
    # link-analysis companion to PageRank (north-rule §2.11 family).
    # One iteration = two passes over the directed edges:
    #   auth_j = Σ_{(i,j)} hub_i   (same pre-aggregated dst-grouped
    #            message exchange as PageRank — the combiner bounds
    #            traffic to O(unique boundary dsts))
    #   hub_i  = Σ_{(i,j)} auth_j  (a LOCAL reduceat over the shard's
    #            full out-CSR using served ghost auth values — messages
    #            flow owner(dst)→owner(src) as one ghost-serve wave)
    # Both passes then divide by the global L1 sum (driver-reduced
    # scalar).  Hub-split graphs reuse the PageRank fragment path for
    # the auth pass; the hub pass needs no fragments because the owner
    # CSR retains hub rows (fragments are duplicates, not moves).

    def hits_init(self):
        v = np.full(self.n_local, 1.0 / self.n_global)
        self.state["hub"] = v.copy()
        self.state["auth"] = v.copy()
        self._hits_pos = None     # static: out-edge dst -> sorted-id slot
        self._hits_frag_agg = None

    def hits_set_frag(self, vals):
        """Local aggregate of fragment hub contributions (fragments live
        with owner(dst) — mirrors pagerank_set_frag)."""
        hub_u = self._frag_src_values(vals)
        if len(self.frag_src_u) == 0:
            self._hits_frag_agg = None
            return
        vals_e = np.repeat(hub_u, self.frag_counts)
        fperm, fuk, fstarts = self._frag_groups
        sums = np.add.reduceat(vals_e[fperm], fstarts) if len(fstarts) \
            else np.empty(0)
        agg = np.zeros(self.n_local)
        agg[fuk - self.lo] = sums
        self._hits_frag_agg = agg

    def hits_auth_partials(self, frag_vals=None):
        """Per-owner (dst_ids, partial hub sums) messages (num_returns=P)
        — PageRank's exchange shape without the out-degree division."""
        if frag_vals is not None:
            self.hits_set_frag(frag_vals)
        rowperm, uk, starts, cuts = self._msg_groups()
        vals = self.state["hub"][rowperm]
        sums = np.add.reduceat(vals, starts) if len(starts) \
            else np.empty(0, np.float64)
        out = []
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        for p in range(self.P):
            chunk = (uk[cuts[p]:cuts[p + 1]], sums[cuts[p]:cuts[p + 1]])
            if p == self.pid:
                self._hits_self = chunk     # self-message stays in-actor
                out.append(empty)
            else:
                out.append(chunk)
        return tuple(out)

    def hits_auth_apply(self, msgs) -> float:
        """Install raw (unnormalized) auth; returns the local L1 mass so
        the driver can reduce the global normalizer."""
        msgs = _resolve_refs(msgs)
        msgs = list(msgs)
        msgs[self.pid] = self._hits_self
        agg = np.zeros(self.n_local)
        for ids, sums in msgs:
            if len(ids):
                agg[ids - self.lo] += sums
        if self._hits_frag_agg is not None:
            agg += self._hits_frag_agg
        self.state["auth"] = agg
        return float(agg.sum())

    def hits_scale(self, name: str, s: float):
        if s > 0.0:
            self.state[name] = self.state[name] / s

    def _ghost_sorted_values(self, name: str, ghost_vals):
        """(sorted_ids, values) over local + ghost vertices; the sort
        permutation is static (ghost sets are static per graph version)
        and cached, so per-iteration cost is one concat + one gather."""
        ghost_vals = [ray.get(v) if isinstance(v, ray.ObjectRef) else v
                      for v in ghost_vals]
        cache = getattr(self, "_ghost_order_cache", None)
        if cache is None:
            ids = [np.arange(self.lo, self.hi, dtype=np.int64)]
            for g_ids in self.ghosts:
                if len(g_ids):
                    ids.append(g_ids)
            all_ids = np.concatenate(ids)
            order = np.argsort(all_ids, kind="stable")
            cache = self._ghost_order_cache = (all_ids[order], order)
        sorted_ids, order = cache
        vals = [self.state[name]]
        for g_ids, g_v in zip(self.ghosts, ghost_vals):
            if len(g_ids):
                vals.append(np.asarray(g_v))
        return sorted_ids, np.concatenate(vals)[order]

    def hits_hub_update(self, ghost_auth) -> float:
        """hub_i = Σ over the shard's out-edges of auth[dst] — one gather
        + one segmented sum over the full CSR; returns local L1 mass."""
        ids, av_all = self._ghost_sorted_values("auth", ghost_auth)
        if self._hits_pos is None:
            self._hits_pos = np.searchsorted(ids, self.indices)
            from ..common import collapse_hugepages
            collapse_hugepages(self._hits_pos)
        av = av_all[self._hits_pos]
        deg = np.diff(self.indptr)
        if len(av):
            sums = np.add.reduceat(np.concatenate([av, [0.0]]),
                                   self.indptr[:-1])
            hub = np.where(deg > 0, sums, 0.0)
        else:
            hub = np.zeros(self.n_local)
        self.state["hub"] = hub
        return float(hub.sum())

    def hits_result(self) -> pa.Table:
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "auth": self.state["auth"],
            "hub": self.state["hub"],
        })

    # ================= k-core peeling (symmetric CSR) ====================
    #
    # Iterative peel: drop vertices with < k alive non-self neighbors
    # until fixpoint.  Each round is ONE ghost-serve wave (alive flags of
    # remote neighbors) + a local masked segmented count — the same
    # message pattern as CC without the min-propagation.

    def kcore_init(self, k: int) -> int:
        self._kcore_k = int(k)
        # static: positions of out-edge dsts in the sorted ghost-id space
        # and the non-self edge mask (self-loops never count toward core
        # degree — matches the SQL oracle's src <> dst filter)
        rows = np.repeat(np.arange(self.n_local, dtype=np.int64),
                         np.diff(self.indptr))
        self._kcore_nonself = self.indices != (rows + self.lo)
        nonself_deg = np.add.reduceat(
            np.concatenate([self._kcore_nonself.astype(np.int64), [0]]),
            self.indptr[:-1]) if len(self.indices) \
            else np.zeros(self.n_local, np.int64)
        nonself_deg = np.where(np.diff(self.indptr) > 0, nonself_deg, 0)
        self.state["kcore_alive"] = (nonself_deg > 0).astype(np.int64)
        return int(self.state["kcore_alive"].sum())

    def kcore_round(self, ghost_alive) -> int:
        """One peel round; returns the number of locally dropped nodes."""
        ids, alive_all = self._ghost_sorted_values("kcore_alive",
                                                   ghost_alive)
        if getattr(self, "_kcore_pos", None) is None:
            self._kcore_pos = np.searchsorted(ids, self.indices)
        av = alive_all[self._kcore_pos] * self._kcore_nonself
        deg = np.diff(self.indptr)
        if len(av):
            cnt = np.add.reduceat(np.concatenate([av, [0]]),
                                  self.indptr[:-1])
            cnt = np.where(deg > 0, cnt, 0)
        else:
            cnt = np.zeros(self.n_local, np.int64)
        alive = self.state["kcore_alive"]
        new_alive = alive * (cnt >= self._kcore_k)
        dropped = int(alive.sum() - new_alive.sum())
        self.state["kcore_alive"] = new_alive
        return dropped

    def kcore_result(self) -> pa.Table:
        members = np.flatnonzero(self.state["kcore_alive"]) + self.lo
        return pa.table({"node": members.astype(np.int64)})

    # ================= Degree assortativity (symmetric CSR) =============

    def assort_local(self, ghost_deg):
        """Integer sufficient statistics for the degree-assortativity
        coefficient over local non-self sym edges: (m, Σdeg_u,
        Σdeg_u², Σdeg_u·deg_v).  Requires tri_publish_degree state;
        neighbor degrees come from one ghost-degree fetch (the
        tri_orient exchange)."""
        ids, degs = self._full_values("deg", _resolve_refs(ghost_deg))
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        dst = self.indices
        nonself = src != dst
        du = self.state["deg"][src[nonself] - self.lo]
        dv = self._lookup(ids, degs, dst[nonself])
        return (int(nonself.sum()), int(du.sum()),
                int((du * du).sum()), int((du * dv).sum()))

    # ================= Multi-source BFS distance (symmetric CSR) ========
    #
    # Hop distance from a deterministic seed set (TrustRank-style seed
    # proximity): synchronous min-relaxation, one ghost-serve wave of
    # neighbor distances + a local segmented min per round — the k-core
    # message pattern with min instead of count.

    BFS_INF = np.int64(1) << 62

    def bfs_init(self, seed_mod: int) -> int:
        ids = np.arange(self.lo, self.hi, dtype=np.int64)
        dist = np.full(self.n_local, self.BFS_INF, dtype=np.int64)
        dist[ids % seed_mod == 0] = 0
        self.state["bfs_dist"] = dist
        self._bfs_pos = None
        return int((dist == 0).sum())

    def bfs_round(self, ghost_dist) -> int:
        """One synchronous relaxation; returns #locally changed nodes."""
        ids, dist_all = self._ghost_sorted_values("bfs_dist", ghost_dist)
        if self._bfs_pos is None:
            self._bfs_pos = np.searchsorted(ids, self.indices)
        dv = dist_all[self._bfs_pos]
        deg = np.diff(self.indptr)
        if len(dv):
            mins = np.minimum.reduceat(
                np.concatenate([dv, [self.BFS_INF]]), self.indptr[:-1])
            cand = np.where(deg > 0, mins, self.BFS_INF) + 1
        else:
            cand = np.full(self.n_local, self.BFS_INF, dtype=np.int64)
        old = self.state["bfs_dist"]
        new = np.minimum(old, cand)
        changed = int((new != old).sum())
        self.state["bfs_dist"] = new
        return changed

    def bfs_result(self) -> pa.Table:
        dist = self.state["bfs_dist"]
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "dist": np.where(dist >= self.BFS_INF, np.int64(-1), dist),
        })

    # ================= Connected components (symmetric CSR) =============

    def cc_init(self):
        self.state["comp"] = np.arange(self.lo, self.hi, dtype=np.int64)
        self._frag_cc = None

    def cc_partials(self, frag_vals=None):
        """min(comp[src]) grouped by dst, per owner (num_returns=P)."""
        if frag_vals is not None:
            self.cc_set_frag(frag_vals)
        comp = self.state["comp"]
        if len(self.indices) == 0:
            empty = np.empty(0, np.int64)
            return tuple((empty, empty) for _ in range(self.P))
        rowperm, uk, starts, cuts = self._msg_groups()
        v = comp[rowperm]
        mins = np.minimum.reduceat(v, starts)
        out = []
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        for p in range(self.P):
            chunk = (uk[cuts[p]:cuts[p + 1]], mins[cuts[p]:cuts[p + 1]])
            if p == self.pid:
                self._self_cc = chunk
                out.append(empty)
            else:
                out.append(chunk)
        return tuple(out)

    def cc_set_frag(self, vals):
        """Local min over fragment edges: comp of hub srcs fetched
        (#hubs values), min-combined into local dsts."""
        comp_u = self._frag_src_values(vals).astype(np.int64) \
            if len(self.frag_src_u) else np.empty(0, np.int64)
        if len(self.frag_src_u) == 0:
            self._frag_cc = None
            return
        vals_e = np.repeat(comp_u, self.frag_counts)
        fperm, fuk, fstarts = self._frag_groups
        mins = np.minimum.reduceat(vals_e[fperm], fstarts) if len(fstarts) \
            else np.empty(0, np.int64)
        self._frag_cc = (fuk, mins)

    def cc_apply(self, msgs) -> int:
        msgs = _resolve_refs(msgs)
        if len(self.indices):
            msgs = list(msgs)
            msgs[self.pid] = self._self_cc
        comp = self.state["comp"]
        new = comp.copy()
        for ids, mins in msgs:
            if len(ids):
                loc = ids - self.lo
                np.minimum.at(new, loc, mins)
        if getattr(self, "_frag_cc", None) is not None:
            fuk, fmins = self._frag_cc
            np.minimum.at(new, fuk - self.lo, fmins)
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
        self._frag_lpa = None

    def lpa_partials(self, frag_vals=None):
        """(dst, src_label) weight sums per owner (num_returns=P).

        Self-loops ignored (oracle semantics)."""
        if frag_vals is not None:
            self.lpa_set_frag(frag_vals)
        lab = self.state["lpa"]
        row, dst, w = self._lpa_groups()
        if w is None:   # unweighted elision: no E-length ones array
            w = np.broadcast_to(np.float64(1.0), len(dst))
        l = lab[row]
        ids, labs, sums = _grouped_sum2(dst, l, w, self.n_global)
        chunks = split_by_owner(ids, self.bounds, labs, sums)
        empty = (np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty(0, np.float64))
        self._self_lpa = chunks[self.pid]
        chunks[self.pid] = empty
        return tuple(chunks)

    def lpa_set_frag(self, vals):
        """Local (dst, hub_label, w) sums over fragment edges."""
        lab_u = self._frag_src_values(vals).astype(np.int64) \
            if len(self.frag_src_u) else np.empty(0, np.int64)
        if len(self.frag_src_u) == 0:
            self._frag_lpa = None
            return
        fsrc_e = np.repeat(self.frag_src_u, self.frag_counts)
        lab_e = np.repeat(lab_u, self.frag_counts)
        nonself = self.frag_dst != fsrc_e
        self._frag_lpa = _grouped_sum2(self.frag_dst[nonself],
                                       lab_e[nonself],
                                       self.frag_w[nonself], self.n_global)

    def lpa_apply(self, msgs) -> int:
        msgs = _resolve_refs(msgs)
        msgs = list(msgs)
        if getattr(self, "_self_lpa", None) is not None:
            msgs[self.pid] = self._self_lpa
        if getattr(self, "_frag_lpa", None) is not None:
            msgs = msgs + [self._frag_lpa]
        ids = np.concatenate([m[0] for m in msgs]) if msgs else np.empty(0, np.int64)
        labs = np.concatenate([m[1] for m in msgs]) if msgs else np.empty(0, np.int64)
        sums = np.concatenate([m[2] for m in msgs]) if msgs else np.empty(0)
        lab = self.state["lpa"]
        if len(ids) == 0:
            return 0
        gv, gl, s = _grouped_sum2(ids - self.lo, labs, sums, self.n_global)
        # argmax, tie -> lower label (oracle order); uk is sorted so
        # (gv, gl) is (v asc, label asc) — segment argmax, no sort
        from .shard_louvain import _segment_argmax
        v_f, l_f, _ = _segment_argmax(gv, gl, s)
        new = lab.copy()
        new[v_f] = l_f
        changed = int((new != lab).sum())
        self.state["lpa"] = new
        return changed

    def lpa_result(self) -> pa.Table:
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "label": self.state["lpa"],
        })

    # ================= Triangle counting (oriented sub-CSR) =============
    #
    # Degree-orientation (low (deg,id) -> high) bounds oriented
    # out-degrees by ~sqrt(2m) — the hub/skew mitigation for this op
    # (SURVEY.md §2.11).  Built on top of the symmetric CSR via one
    # static ghost-degree exchange.

    def tri_publish_degree(self):
        """Expose simple-graph degree (self-loops excluded) as state."""
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        nonself = self.indices != src
        self.state["deg"] = np.bincount(
            (src[nonself] - self.lo), minlength=self.n_local).astype(np.int64)

    def tri_orient(self, ghost_deg_vals):
        """Build the local oriented edge set using fetched ghost degrees.
        Returns per-owner ghost-head id requests (num_returns=P)."""
        ghost_deg_vals = _resolve_refs(ghost_deg_vals)
        ids, degs = self._full_values("deg", ghost_deg_vals)
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        dst = self.indices
        nonself = src != dst
        src, dst = src[nonself], dst[nonself]
        deg_u = self.state["deg"][src - self.lo]
        deg_v = self._lookup(ids, degs, dst)
        fwd = (deg_u < deg_v) | ((deg_u == deg_v) & (src < dst))
        fs, fd = src[fwd], dst[fwd]
        order = np.lexsort((fd, fs))
        self._tri_src, self._tri_dst = fs[order], fd[order]
        heads = np.unique(self._tri_dst)
        remote = heads[(heads < self.lo) | (heads >= self.hi)]
        self._tri_ghosts = [g for g, in split_by_owner(remote, self.bounds)]
        return tuple(self._tri_ghosts)

    def tri_serve_adjacency(self, ids: np.ndarray, mask=None):
        """Oriented out-neighborhoods of requested local heads:
        (counts, concatenated_dsts).  With ``mask`` (bool per oriented
        local edge) only alive edges are served — the k-truss peel
        path."""
        from ..oracle.louvain import _ranges_concat
        ids = np.asarray(ids, dtype=np.int64)
        lo_pos = np.searchsorted(self._tri_src, ids, side="left")
        hi_pos = np.searchsorted(self._tri_src, ids, side="right")
        counts = hi_pos - lo_pos
        if not len(ids):
            return counts, np.empty(0, np.int64)
        take = _ranges_concat(lo_pos, counts)
        if mask is None:
            return counts, self._tri_dst[take]
        keep = mask[take]
        seg = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        counts = np.bincount(seg[keep], minlength=len(ids)).astype(np.int64)
        return counts, self._tri_dst[take[keep]]

    def tri_serve_adjacency_many(self, reqs) -> tuple:
        """Batched adjacency serve for all requesters (num_returns=P)."""
        reqs = _resolve_refs(list(reqs))
        return tuple(self.tri_serve_adjacency(r) for r in reqs)

    def _tri_merged_adj(self, ghost_adj, mask=None):
        """Merge local + fetched ghost oriented adjacencies into one
        lookup: (sorted_ids, sorted_pos, counts, offs, flat)."""
        ghost_adj = _resolve_refs(ghost_adj)
        local_heads = np.arange(self.lo, self.hi, dtype=np.int64)
        l_counts, l_concat = self.tri_serve_adjacency(local_heads, mask)
        all_ids = [local_heads]
        all_counts = [l_counts]
        all_concat = [l_concat]
        for g_ids, (counts, concat) in zip(self._tri_ghosts, ghost_adj):
            if len(g_ids):
                all_ids.append(np.asarray(g_ids))
                all_counts.append(counts)
                all_concat.append(concat)
        ids = np.concatenate(all_ids)
        counts = np.concatenate(all_counts)
        offs = np.concatenate([[0], np.cumsum(counts)])
        flat = (np.concatenate(all_concat)
                if sum(len(c) for c in all_concat) else np.empty(0, np.int64))
        order = np.argsort(ids, kind="stable")
        return ids[order], order, counts, offs, flat

    def tri_count_local(self, ghost_adj) -> int:
        """Count wedges (u -> v -> w), u local, closing as local (u -> w)."""
        sorted_ids, sorted_pos, counts, offs, flat = \
            self._tri_merged_adj(ghost_adj)

        u, v = self._tri_src, self._tri_dst
        if len(u) == 0:
            return 0
        pos = sorted_pos[np.searchsorted(sorted_ids, v)]
        v_counts = counts[pos]
        total_wedges = int(v_counts.sum())
        if total_wedges == 0:
            return 0
        # sorted by (u,v); pair-view fallback past the int64 key range
        use_pairs = not composite_fits(self.n_global, self.n_global)
        local_keys = (_pair_view(u, v) if use_pairs
                      else u * np.int64(self.n_global) + v)
        # expand wedges (u -> v -> w) in bounded chunks: the full wedge
        # set is E * avg_outdeg entries — chunking keeps peak memory flat
        # regardless of graph density
        CHUNK = 4_000_000
        cum = np.concatenate([[0], np.cumsum(v_counts)])
        n_closed = 0
        e_start = 0
        while e_start < len(u):
            e_end = int(np.searchsorted(cum, cum[e_start] + CHUNK,
                                        side="left"))
            e_end = max(e_end, e_start + 1)
            vc = v_counts[e_start:e_end]
            nw = int(vc.sum())
            if nw:
                w_off = np.concatenate([[0], np.cumsum(vc)])
                take = (np.arange(nw, dtype=np.int64)
                        - np.repeat(w_off[:-1], vc)
                        + np.repeat(offs[pos[e_start:e_end]], vc))
                wedge_w = flat[take]
                wedge_u = np.repeat(u[e_start:e_end], vc)
                q = (_pair_view(wedge_u, wedge_w) if use_pairs
                     else wedge_u * np.int64(self.n_global) + wedge_w)
                i = np.searchsorted(local_keys, q)
                i = np.minimum(i, len(local_keys) - 1)
                n_closed += int((local_keys[i] == q).sum())
            e_start = e_end
        return n_closed

    def tri_support_local(self, ghost_adj):
        """Per-edge triangle support (edge embeddedness = |N(u) ∩ N(v)|
        for each undirected edge): the tri_count wedge scan, but every
        closed wedge (u→v, v→w, u→w) scatters +1 onto all three edges.
        The two u-edges are local bincounts; the (v,w) contributions are
        aggregated and returned per owner(v) (num_returns=P) for
        tri_support_apply."""
        parts, keys, sup = self._support_scan(ghost_adj, None)
        self._tri_keys, self._tri_sup = keys, sup
        return parts

    def _support_scan(self, ghost_adj, mask):
        """Wedge-scatter support computation over the (optionally
        masked) oriented edge set.  Returns (per-owner (v, w, count)
        parts, sorted edge keys, support array) — both aligned with the
        mask-selected edge subset."""
        sorted_ids, sorted_pos, counts, offs, flat = \
            self._tri_merged_adj(ghost_adj, mask)
        u, v = self._tri_src, self._tri_dst
        if mask is not None:
            u, v = u[mask], v[mask]
        use_pairs = not composite_fits(self.n_global, self.n_global)
        local_keys = (_pair_view(u, v) if use_pairs
                      else u * np.int64(self.n_global) + v)
        self._tri_use_pairs = use_pairs
        sup = np.zeros(len(u), np.int64)
        rv_parts, rw_parts = [], []
        empty = (np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty(0, np.int64))
        if len(u):
            pos = sorted_pos[np.searchsorted(sorted_ids, v)]
            v_counts = counts[pos]
            CHUNK = 4_000_000
            cum = np.concatenate([[0], np.cumsum(v_counts)])
            e_start = 0
            while e_start < len(u):
                e_end = int(np.searchsorted(cum, cum[e_start] + CHUNK,
                                            side="left"))
                e_end = min(max(e_end, e_start + 1), len(u))
                vc = v_counts[e_start:e_end]
                nw = int(vc.sum())
                if nw:
                    w_off = np.concatenate([[0], np.cumsum(vc)])
                    take = (np.arange(nw, dtype=np.int64)
                            - np.repeat(w_off[:-1], vc)
                            + np.repeat(offs[pos[e_start:e_end]], vc))
                    wedge_w = flat[take]
                    wedge_u = np.repeat(u[e_start:e_end], vc)
                    q = (_pair_view(wedge_u, wedge_w) if use_pairs
                         else wedge_u * np.int64(self.n_global) + wedge_w)
                    i = np.searchsorted(local_keys, q)
                    i = np.minimum(i, len(local_keys) - 1)
                    closed = local_keys[i] == q
                    if closed.any():
                        # edge (u,v): wedge's source edge index
                        eidx = np.repeat(
                            np.arange(e_start, e_end, dtype=np.int64), vc)
                        sup += np.bincount(eidx[closed], minlength=len(u))
                        # edge (u,w): the closing local edge
                        sup += np.bincount(i[closed], minlength=len(u))
                        # edge (v,w): owned by owner(v)
                        rv_parts.append(
                            np.repeat(v[e_start:e_end], vc)[closed])
                        rw_parts.append(wedge_w[closed])
                e_start = e_end
        if not rv_parts:
            parts = (tuple(empty for _ in range(self.P)) if self.P > 1
                     else empty)
            return parts, local_keys, sup
        rv = np.concatenate(rv_parts)
        rw = np.concatenate(rw_parts)
        # aggregate duplicate (v,w) contributions before the exchange
        okey = np.lexsort((rw, rv))
        rv, rw = rv[okey], rw[okey]
        newg = np.empty(len(rv), dtype=bool)
        newg[0] = True
        newg[1:] = (rv[1:] != rv[:-1]) | (rw[1:] != rw[:-1])
        starts = np.flatnonzero(newg)
        cnts = np.diff(np.concatenate([starts, [len(rv)]]))
        out = split_by_owner(rv[starts], self.bounds, rw[starts], cnts)
        parts = tuple(out) if self.P > 1 else out[0]
        return parts, local_keys, sup

    def tri_support_apply(self, msgs):
        """Add incoming (v, w, count) contributions onto local oriented
        edges (every such edge exists here: it was served from this
        shard's adjacency)."""
        msgs = _resolve_refs(msgs)
        for vv, ww, cc in msgs:
            vv = np.asarray(vv, dtype=np.int64)
            if len(vv) == 0:
                continue
            ww = np.asarray(ww, dtype=np.int64)
            keys = (_pair_view(vv, ww) if self._tri_use_pairs
                    else vv * np.int64(self.n_global) + ww)
            pos = np.searchsorted(self._tri_keys, keys)
            self._tri_sup[pos] += np.asarray(cc, dtype=np.int64)

    def tri_node_local(self):
        """Scatter the per-edge supports onto endpoint nodes (the local
        clustering numerator): sum of incident-edge supports = 2 ×
        (triangles through the node).  The u endpoints are local (one
        bincount); v contributions are aggregated per owner and
        returned (num_returns=P) for tri_node_apply."""
        u, v = self._tri_src, self._tri_dst
        sup = self._tri_sup
        self._tri_node = (
            np.bincount(u - self.lo, weights=sup,
                        minlength=self.n_local).astype(np.int64)
            if len(u) else np.zeros(self.n_local, np.int64))
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        if len(v) == 0:
            out = [empty] * self.P
        else:
            order = np.argsort(v, kind="stable")
            vs, ss = v[order], sup[order]
            newg = np.empty(len(vs), dtype=bool)
            newg[0] = True
            newg[1:] = vs[1:] != vs[:-1]
            starts = np.flatnonzero(newg)
            out = split_by_owner(vs[starts], self.bounds,
                                 np.add.reduceat(ss, starts))
        return tuple(out) if self.P > 1 else out[0]

    def tri_node_apply(self, msgs):
        msgs = _resolve_refs(msgs)
        for vv, ss in msgs:
            vv = np.asarray(vv, dtype=np.int64)
            if len(vv):
                self._tri_node[vv - self.lo] += np.asarray(ss, np.int64)

    def tri_node_result(self) -> pa.Table:
        """(node, tri, deg): triangles through the node and its simple
        (non-self, distinct-neighbor) degree — clustering coefficient
        = 2*tri / (deg*(deg-1)) is derivable row-locally."""
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "tri": self._tri_node // 2,
            "deg": self.state["deg"],
        })

    def tri_support_result(self) -> pa.Table:
        """(u, v, support) with u < v — the oriented edges restored to
        canonical undirected order."""
        u, v = self._tri_src, self._tri_dst
        return pa.table({
            "u": np.minimum(u, v),
            "v": np.maximum(u, v),
            "support": self._tri_sup.astype(np.int64),
        })

    # ================= k-truss peeling (oriented sub-CSR) ================
    #
    # Synchronous edge peel: per round, recompute supports over the
    # alive edge subset (the _support_scan wedge scatter with the alive
    # mask applied on BOTH the scanning and the serving side), then drop
    # edges with support < k-2.  Monotone, so a fixpoint early-stop is
    # value-identical to running the oracle's fixed round count.

    def truss_init(self) -> int:
        self._truss_alive = np.ones(len(self._tri_src), dtype=bool)
        return int(len(self._tri_src))

    def truss_serve_adjacency_many(self, reqs) -> tuple:
        """Alive-filtered batched adjacency serve (num_returns=P)."""
        reqs = _resolve_refs(list(reqs))
        return tuple(self.tri_serve_adjacency(r, self._truss_alive)
                     for r in reqs)

    def truss_support_local(self, ghost_adj):
        parts, keys, sup = self._support_scan(ghost_adj,
                                              self._truss_alive)
        self._truss_keys, self._truss_sup = keys, sup
        return parts

    def truss_apply(self, msgs):
        msgs = _resolve_refs(msgs)
        for vv, ww, cc in msgs:
            vv = np.asarray(vv, dtype=np.int64)
            if len(vv) == 0:
                continue
            ww = np.asarray(ww, dtype=np.int64)
            keys = (_pair_view(vv, ww) if self._tri_use_pairs
                    else vv * np.int64(self.n_global) + ww)
            pos = np.searchsorted(self._truss_keys, keys)
            self._truss_sup[pos] += np.asarray(cc, dtype=np.int64)

    def truss_peel(self, k: int) -> int:
        """Drop alive edges with support < k-2; returns #dropped."""
        alive_idx = np.flatnonzero(self._truss_alive)
        drop = self._truss_sup < (k - 2)
        self._truss_alive[alive_idx[drop]] = False
        return int(drop.sum())

    def truss_result(self) -> pa.Table:
        u = self._tri_src[self._truss_alive]
        v = self._tri_dst[self._truss_alive]
        return pa.table({"u": np.minimum(u, v), "v": np.maximum(u, v)})
