"""Distributed Louvain + delta-screening supersteps (shard-local halves).

Implements the reference's synchronous bucketed kernel (oracle:
linkgraph/oracle/louvain.py with file:line citations) over the partitioned
CSR.  Per optimisation round, for each of the 7 degree buckets in order:

  1. ghost-label fetch   (labels of remote neighbors, static ghost sets)
  2. move computation    (needs tot/size of candidate communities -> a
                          dynamic fetch from the community owners; comm ids
                          live in the vertex id space so the same range
                          boundaries shard them)
  3. apply moves locally + send (comm, dtot, dsize) deltas to owners

Community aggregates tot/size are sharded per-owner (comm_state), exactly
mirroring the reference's communityWeight/communitySize device arrays
rebuilt per bucket (modularity_optimisation_mem.cu:387-411) — here updated
by deltas, which is numerically identical for the unweighted adds used.

Delta screening (add/del) reuses the same fetch machinery; semantics per
node_eval.cu (see oracle screen_add/screen_del docstrings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .partition import _grouped_sum, composite_fits, pair_isin, split_by_owner
from .shard_algos import AlgoShard

BUCKET_BOUNDS = [0, 4, 8, 16, 32, 84, 319, np.iinfo(np.int64).max]


def _resolve(msgs):
    msgs = list(msgs)
    if msgs and isinstance(msgs[0], ray.ObjectRef):
        return ray.get(msgs)
    return msgs


from ..oracle.louvain import _segment_argmax  # noqa: E402  (shared kernel)


class LouvainShard(AlgoShard):

    # ---------- lightweight per-shard step timers (ST5) --------------------

    def _tick(self, name: str, t0: float):
        import time
        prof = getattr(self, "_prof", None)
        if prof is None:
            prof = self._prof = {}
        prof[name] = prof.get(name, 0.0) + (time.time() - t0)

    def get_prof(self, reset: bool = True) -> dict:
        prof = dict(getattr(self, "_prof", {}))
        if reset:
            self._prof = {}
        return prof

    # ---------- state init -------------------------------------------------

    def lv_init_labels(self, labels: np.ndarray | None = None):
        """Install labels (init partition, L6) or singletons."""
        if labels is None:
            self.state["labels"] = np.arange(self.lo, self.hi, dtype=np.int64)
        else:
            self.state["labels"] = np.asarray(labels, dtype=np.int64).copy()
        self.comm_state["tot"] = np.zeros(self.n_local)
        self.comm_state["size"] = np.zeros(self.n_local, dtype=np.int64)

    def lv_agg_partials(self):
        """(comm, k_sum, count) per owner for rebuilding tot/size from
        labels (init_quality / init_partition_v semantics). num_returns=P."""
        lab = self.state["labels"]
        uk, ksum = _grouped_sum(lab, self.k)
        _, cnt = _grouped_sum(lab, np.ones(self.n_local))
        return tuple(split_by_owner(uk, self.bounds, ksum, cnt))

    def lv_agg_apply(self, msgs):
        msgs = _resolve(msgs)
        tot = np.zeros(self.n_local)
        size = np.zeros(self.n_local, dtype=np.int64)
        for ids, ksum, cnt in msgs:
            if len(ids):
                loc = ids - self.lo
                np.add.at(tot, loc, ksum)
                np.add.at(size, loc, cnt.astype(np.int64))
        self.comm_state["tot"] = tot
        self.comm_state["size"] = size

    # ---------- ghost labels ----------------------------------------------

    def lv_store_ghost_labels(self, ghost_vals):
        """FULL (re)build of the label cache (local + ghost values) plus
        the static position maps that make later syncs incremental."""
        ghost_vals = _resolve(ghost_vals)
        self._lv_ids, self._lv_labs = self._full_values("labels", ghost_vals)
        from ..common import collapse_hugepages
        collapse_hugepages(self._lv_ids, self._lv_labs)  # gathered every round
        self._lv_local_pos = np.searchsorted(
            self._lv_ids, np.arange(self.lo, self.hi, dtype=np.int64))
        self._lv_ghost_pos = [np.searchsorted(self._lv_ids, g)
                              for g in self.ghosts]
        self._lv_pending = []
        self._lv_cache_ready = True
        self._lv_cache_epoch = getattr(self, "_lv_cache_epoch", 0) + 1

    def store_label_sync_requests(self, reqs: list):
        """Static per-requester ghost id lists this shard owns (sorted) —
        lets lv_serve_changed ship ONLY moved labels each sync.  Items
        may be ObjectRefs (the engine forwards the owners' ghost-request
        outputs actor-to-actor; the id lists never touch the driver)."""
        reqs = _resolve(reqs)
        self._lbl_serve_reqs = [np.asarray(r, dtype=np.int64) for r in reqs]

    def lv_serve_changed(self) -> tuple:
        """Per-requester (ghost-list index, new label) of local vertices
        that moved since the last serve (num_returns=P).  The incremental
        half of the ghost exchange: traffic is O(#moves), not O(#ghosts)."""
        if self._lv_pending:
            movers = np.unique(np.concatenate(self._lv_pending))
        else:
            movers = np.empty(0, np.int64)
        self._lv_pending = []
        out = []
        labels = self.state["labels"]
        for r in self._lbl_serve_reqs:
            if len(movers) and len(r):
                # movers is sorted-unique: membership via searchsorted
                # (np.isin would re-sort movers once per requester)
                pos = np.minimum(np.searchsorted(movers, r),
                                 len(movers) - 1)
                idx = np.flatnonzero(movers[pos] == r)
                out.append((idx, labels[r[idx] - self.lo]))
            else:
                out.append((np.empty(0, np.int64), np.empty(0, np.int64)))
        return tuple(out)

    def lv_cache_apply(self, changed_vals):
        """Apply incoming incremental ghost-label updates."""
        changed_vals = _resolve(changed_vals)
        for j, (idx, vals) in enumerate(changed_vals):
            if len(idx):
                self._lv_labs[self._lv_ghost_pos[j][idx]] = vals

    def lv_cache_invalidate(self):
        self._lv_cache_ready = False
        self._lv_pending = []

    def _label_of(self, ids: np.ndarray) -> np.ndarray:
        return self._lookup(self._lv_ids, self._lv_labs, ids)

    def _labels_of_all_edges(self) -> np.ndarray:
        """Labels of every edge target — position cache keyed by the
        label-cache build epoch (q_terms/contraction run this per round)."""
        if len(self.indices) == 0:
            return np.empty(0, np.int64)
        epoch = getattr(self, "_lv_cache_epoch", 0)
        cached = getattr(self, "_all_col_pos", None)
        if cached is None or cached[0] != epoch:
            self._all_col_pos = (epoch,
                                 np.searchsorted(self._lv_ids, self.indices))
        return self._lv_labs[self._all_col_pos[1]]

    # ---------- hub-split fragments (skew mitigation for the move phase) --
    #
    # Hub vertices' e_{v->C} grouped sums are computed where the EDGES
    # live: each fragment holder groups its hub-src edges by the labels
    # of its LOCAL dst vertices (no ghost fetch needed) and ships the
    # per-owner (hub, comm, partial_e) triples; the owner merges them
    # into its move tournament.  Exact for integral weights (partial
    # sums are exact integers), so identical decisions to the unsplit
    # path — without the one-actor-per-hub-range straggler.

    def lv_frag_install_subset(self, r_vals=None):
        """Install the per-level R membership of this shard's fragment
        hub srcs (``r_vals``: per-owner chunks served by frag_serve("R");
        None = no subset, all hubs active)."""
        if r_vals is None:
            self._frag_src_R = np.ones(len(self.frag_src_u), dtype=bool)
        else:
            self._frag_src_R = self._frag_src_values(r_vals).astype(bool)

    def lv_frag_partials(self, bucket: int):
        """Per-owner (hub_id, comm, partial_e) triples for fragment hub
        srcs in ``bucket`` ∩ R (num_returns=P)."""
        empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
        sel = self.frag_src_bucket == bucket
        r = getattr(self, "_frag_src_R", None)
        if r is not None and len(r) == len(sel):
            sel &= r
        sel_idx = np.flatnonzero(sel)
        if len(sel_idx) == 0:
            return tuple(empty for _ in range(self.P))
        from ..oracle.louvain import _ranges_concat
        counts = self.frag_counts[sel_idx]
        take = _ranges_concat(self.frag_offsets[sel_idx], counts)
        v = np.repeat(self.frag_src_u[sel_idx], counts)
        u = self.frag_dst[take]
        w = self.frag_w[take]
        nonself = u != v
        v, u, w = v[nonself], u[nonself], w[nonself]
        lab = self.state["labels"][u - self.lo]   # dsts are local here
        mult = max(self.n_global, int(lab.max(initial=0)) + 1)
        if (len(w) == 0 or (w == np.floor(w)).all()) \
                and composite_fits(self.n_global, mult):
            key = v * np.int64(mult) + lab
            order = np.argsort(key)
        else:
            order = np.lexsort((lab, v))
        v, lab, w = v[order], lab[order], w[order]
        newgrp = np.empty(len(v), dtype=bool)
        newgrp[0] = True
        newgrp[1:] = (v[1:] != v[:-1]) | (lab[1:] != lab[:-1])
        starts = np.flatnonzero(newgrp)
        gv, gc = v[starts], lab[starts]
        e = np.add.reduceat(w, starts)
        return tuple(split_by_owner(gv, self.bounds, gc, e))

    # ---------- bucketed move phase ----------------------------------------

    def _bucket_slice(self, bucket: int, use_subset: bool,
                      exclude_hubs: bool = False):
        """Static per-bucket edge slice (sel_idx, rows, cols, w, col_pos)
        — cached per graph/R/label-cache version; rebuilding it every
        round was pure recompute of invariants.  ``exclude_hubs`` drops
        hub-src rows (their grouped sums arrive as fragment partials)."""
        key = (bucket, use_subset,
               getattr(self, "_r_epoch", 0) if use_subset else -1,
               getattr(self, "_lv_cache_epoch", 0), exclude_hubs)
        cache = getattr(self, "_lv_bucket_cache", None)
        if cache is None:
            cache = self._lv_bucket_cache = {}
        hit = cache.get(key)
        if hit is not None:
            return hit
        if len(cache) > 32:  # old epochs are dead weight
            cache.clear()
        lo_b, hi_b = BUCKET_BOUNDS[bucket], BUCKET_BOUNDS[bucket + 1]
        deg = np.diff(self.indptr)
        sel = (deg > lo_b) & (deg <= hi_b)
        if use_subset:
            sel &= self.state["R"].astype(bool)
        if exclude_hubs:
            sel &= ~self.hub_mask
        sel_idx = np.flatnonzero(sel)
        if len(sel_idx) == 0:
            out = (sel_idx, None, None, None, None, True)
            cache[key] = out
            return out
        # vectorized range-concat: edge positions of all selected vertices
        counts = deg[sel_idx]
        starts_e = self.indptr[sel_idx]
        total = int(counts.sum())
        take = (np.repeat(starts_e, counts)
                + np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
        rows = np.repeat(sel_idx, counts)                # local index
        cols = self.indices[take]                         # global ids
        w = self.weights[take]
        nonself = cols != rows + self.lo
        rows, cols, w = rows[nonself], cols[nonself], w[nonself]
        # positions of cols in the sorted label cache: O(E log n) once,
        # then label lookups are O(E) gathers per round
        col_pos = np.searchsorted(self._lv_ids, cols)
        # integral weights => grouped sums are exact integers, so the
        # per-round (row, comm) sort may be UNSTABLE (sum order is
        # irrelevant); float weights keep the oracle's stable order
        w_int = bool(len(w) == 0 or (w == np.floor(w)).all())
        from ..common import collapse_hugepages
        collapse_hugepages(rows, cols, w, col_pos)  # per-round order gathers
        out = (sel_idx, rows, cols, w, col_pos, w_int)
        cache[key] = out
        return out

    def lv_moves_phase1(self, bucket: int, use_subset: bool,
                        frag_msgs=None, sync_vals=None):
        """Compute e_{v->C} for bucket vertices; return per-owner comm-id
        request arrays (num_returns=P).  Intermediates stashed.

        ``frag_msgs`` (hub split active): per-frag-shard (hub, comm,
        partial_e) triples for LOCAL hubs; hub-src CSR rows are excluded
        from the local slice and the partials merged into the grouped
        sums instead — same totals, skew-balanced.

        ``sync_vals``: incremental ghost-label updates from the PREVIOUS
        bucket's moves (the lv_apply_serve outputs), applied here before
        the move sums — fusing the former standalone lv_cache_apply wave
        into phase1 shortens each bucket's critical path by one actor
        task (the per-bucket wave cadence was the dynamic-timestep
        scaling bottleneck, VERDICT r4 item 3)."""
        import time as _time
        if sync_vals is not None:
            self.lv_cache_apply(sync_vals)
        use_frags = frag_msgs is not None
        _t = _time.time()
        sel_idx, rows, cols, w, col_pos, w_int = self._bucket_slice(
            bucket, use_subset, exclude_hubs=use_frags)
        self._tick("p1.slice", _t)
        self._mv = None
        if use_frags:
            fm = _resolve(list(frag_msgs))
            f_gv = np.concatenate([m[0] for m in fm]) if fm \
                else np.empty(0, np.int64)
            f_gc = np.concatenate([m[1] for m in fm]) if fm \
                else np.empty(0, np.int64)
            f_e = np.concatenate([m[2] for m in fm]) if fm else np.empty(0)
        else:
            f_gv = f_gc = np.empty(0, np.int64)
            f_e = np.empty(0)
        if len(sel_idx) == 0 and len(f_gv) == 0:
            empty = np.empty(0, np.int64)
            return tuple(empty for _ in range(self.P))
        _t = _time.time()
        if len(sel_idx):
            ncomm = self._lv_labs[col_pos]
        else:
            rows = np.empty(0, np.int64)
            ncomm = np.empty(0, np.int64)
            w = np.empty(0)
        if len(f_gv):
            # append hub partial-sum entries as weighted pseudo-edges;
            # the grouped sum below merges them with any local entries
            rows = np.concatenate([rows, f_gv - self.lo])
            ncomm = np.concatenate([ncomm, f_gc])
            w = np.concatenate([w, f_e])
            w_int = w_int and bool((f_e == np.floor(f_e)).all())

        if w_int and composite_fits(self.n_local,
                                    max(self.n_global,
                                        int(ncomm.max(initial=0)) + 1)):
            # single composite key + unstable introsort (the stable
            # mergesort lexsort was the per-round hot spot; integral
            # weights make sum order irrelevant — sums are exact)
            self._tick("p1.gather", _t)
            _t = _time.time()
            mult = np.int64(max(self.n_global, int(ncomm.max(initial=0)) + 1))
            key = rows * mult + ncomm
            if len(key) < 2 or bool((key[1:] >= key[:-1]).all()):
                # already sorted — common in the FIRST round (singleton
                # labels make ncomm == cols, which the CSR stores sorted
                # per row): skip the sort and its three big gathers (the
                # heaviest allocations of the heaviest round)
                pass
            else:
                order = np.argsort(key)
                rows, ncomm, w = rows[order], ncomm[order], w[order]
                key = key[order]
            newgrp = np.empty(len(rows), dtype=bool)
            newgrp[0] = True
            newgrp[1:] = key[1:] != key[:-1]
        else:
            order = np.lexsort((ncomm, rows))
            rows, ncomm, w = rows[order], ncomm[order], w[order]
            newgrp = np.empty(len(rows), dtype=bool)
            newgrp[0] = True
            newgrp[1:] = (rows[1:] != rows[:-1]) | (ncomm[1:] != ncomm[:-1])
        self._tick("p1.sort", _t)
        _t = _time.time()
        starts = np.flatnonzero(newgrp)
        gv = rows[starts]                                 # local index
        gc = ncomm[starts]                                # global comm id
        e_vc = np.add.reduceat(w, starts) if len(starts) else np.empty(0)
        self._tick("p1.group", _t)
        _t = _time.time()
        cur = self.state["labels"][gv]
        need = self._sorted_unique_ids(gc, cur)
        self._mv = {"sel": sel_idx, "gv": gv, "gc": gc, "e": e_vc,
                    "need": need}
        out = tuple(ids for ids, in split_by_owner(need, self.bounds))
        self._tick("p1.need", _t)
        return out

    # comm-id spaces up to this size use the persistent-bitmap unique
    # (O(ids) scatter + O(n_global) scan beats the O(ids log ids) sort
    # np.unique does); beyond it — billion-vertex cluster scale, where a
    # per-shard bitmap would cost n_global bytes — fall back to np.unique
    NEED_BITMAP_MAX = 64_000_000

    def _sorted_unique_ids(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Sorted-unique of two id arrays (the per-bucket (tot,size)
        request set).  The bitmap is allocated once per shard and reset
        by writing back only the ids just extracted (O(result))."""
        if self.n_global > self.NEED_BITMAP_MAX:
            return np.unique(np.concatenate([a, b]))
        flag = getattr(self, "_need_flag", None)
        if flag is None or len(flag) < self.n_global:
            flag = self._need_flag = np.zeros(self.n_global, dtype=bool)
        flag[a] = True
        flag[b] = True
        need = np.flatnonzero(flag)
        flag[need] = False
        return need

    def lv_moves_phase2(self, comm_vals):
        """Finish gains with fetched (tot,size); apply moves; return
        per-owner (comm, dtot, dsize) delta messages (num_returns=P)."""
        import time as _time
        _t0 = _time.time()
        comm_vals = _resolve(comm_vals)
        self._tick("p2.resolve", _t0)
        _t0 = _time.time()
        empty = (np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64))
        if self._mv is None:
            self._n_moved = 0
            return tuple(empty for _ in range(self.P))
        mv = self._mv
        need = mv["need"]
        # (tot,size) lookup: ``need`` is sorted-unique and owner ranges
        # are contiguous ascending, so the per-owner chunks concatenate
        # back in sorted-id order — no re-sort needed
        sorted_ids = need
        sorted_tot = np.concatenate([v[0] for v in comm_vals]) \
            if comm_vals else np.empty(0)
        sorted_size = np.concatenate([v[1] for v in comm_vals]) \
            if comm_vals else np.empty(0)

        def tot_of(ids):
            i = np.searchsorted(sorted_ids, ids)
            return sorted_tot[i]

        def size_of(ids):
            i = np.searchsorted(sorted_ids, ids)
            return sorted_size[i].astype(np.int64)

        gv, gc, e_vc = mv["gv"], mv["gc"], mv["e"]
        labels = self.state["labels"]
        cur = labels[gv]
        own_mask = gc == cur
        e_cur = np.zeros(self.n_local)
        e_cur[gv[own_mask]] = e_vc[own_mask]

        cand = (~own_mask) & ((gc < cur) | (size_of(gc) > 1) | (size_of(cur) > 1))
        gv_c, gc_c, e_c = gv[cand], gc[cand], e_vc[cand]
        cur_c = labels[gv_c]
        kv = self.k[gv_c]
        M = self.M
        gain = e_c / M + kv * ((tot_of(cur_c) - kv) - tot_of(gc_c)) / (2 * M * M)

        best_new = np.full(self.n_local, -1, dtype=np.int64)
        best_gain = np.zeros(self.n_local)
        if len(gv_c):
            # (gv_c, gc_c) is sorted by (v, C ascending) — the winner per
            # vertex is the FIRST index attaining the segment max gain
            # (max gain, tie -> smallest C), identical to the oracle's
            # lexsort((C, -gain, v)) tournament without the sort
            v_f, c_f, g_f = _segment_argmax(gv_c, gc_c, gain)
            ok = (g_f > 0) | ((g_f == 0) & (c_f < labels[v_f]))
            v_f, c_f, g_f = v_f[ok], c_f[ok], g_f[ok]
            best_new[v_f] = c_f
            best_gain[v_f] = g_f
        movers = np.flatnonzero(best_new >= 0)
        accept = best_gain[movers] - e_cur[movers] / M > 0
        movers = movers[accept]
        self._mv = None
        if len(movers) == 0:
            self._n_moved = 0
            return tuple(empty for _ in range(self.P))
        old_c = labels[movers]
        new_c = best_new[movers]
        labels[movers] = new_c
        self._n_moved = len(movers)
        if getattr(self, "_lv_cache_ready", False):
            # keep own cache current; queue movers for the next
            # incremental ghost serve
            self._lv_labs[self._lv_local_pos[movers]] = new_c
            self._lv_pending.append(movers + self.lo)
        # community deltas
        dc = np.concatenate([old_c, new_c])
        dtot = np.concatenate([-self.k[movers], self.k[movers]])
        dsize = np.concatenate([-np.ones(len(movers), np.int64),
                                np.ones(len(movers), np.int64)])
        uk, t = _grouped_sum(dc, dtot)
        _, s = _grouped_sum(dc, dsize.astype(np.float64))
        out = tuple(split_by_owner(uk, self.bounds, t, s.astype(np.int64)))
        self._tick("p2.work", _t0)
        return out

    def lv_apply_comm_deltas(self, msgs) -> int:
        msgs = _resolve(msgs)
        for ids, dtot, dsize in msgs:
            if len(ids):
                loc = ids - self.lo
                np.add.at(self.comm_state["tot"], loc, dtot)
                np.add.at(self.comm_state["size"], loc, dsize)
        return int(getattr(self, "_n_moved", 0))

    def lv_apply_serve(self, msgs) -> tuple:
        """Fused [apply comm deltas; serve changed labels] — the tail of
        one bucket and the ghost sync the NEXT bucket's phase1 consumes,
        in a single actor task (num_returns = P + 1: the P per-requester
        changed-label chunks, then the moved count).  Identical state
        transitions to lv_apply_comm_deltas followed by
        lv_serve_changed (phase2 already queued this bucket's movers)."""
        moved = self.lv_apply_comm_deltas(msgs)
        return (*self.lv_serve_changed(), moved)

    def lv_serve_comm_aggs(self, ids) -> tuple[np.ndarray, np.ndarray]:
        ids = np.asarray(ids, dtype=np.int64) - self.lo
        return (self.comm_state["tot"][ids],
                self.comm_state["size"][ids].astype(np.int64))

    def lv_serve_comm_aggs_many(self, reqs) -> tuple:
        """Batched comm-agg serve for all requesters (num_returns=P)."""
        import time as _time
        _t0 = _time.time()
        reqs = _resolve(list(reqs))
        out = []
        for r in reqs:
            ids = np.asarray(r, dtype=np.int64) - self.lo
            out.append((self.comm_state["tot"][ids],
                        self.comm_state["size"][ids].astype(np.int64)))
        self._tick("serve_aggs", _t0)
        return tuple(out)

    def lv_bucket_counts(self, use_subset: bool) -> np.ndarray:
        """Vertices per degree bucket (restricted to R when screening) —
        lets the driver skip empty buckets entirely."""
        deg = np.diff(self.indptr)
        if use_subset:
            deg = deg[self.state["R"].astype(bool)]
        counts = np.empty(len(BUCKET_BOUNDS) - 1, dtype=np.int64)
        for b in range(len(counts)):
            lo_b, hi_b = BUCKET_BOUNDS[b], BUCKET_BOUNDS[b + 1]
            counts[b] = int(((deg > lo_b) & (deg <= hi_b)).sum())
        return counts

    # ---------- quality-variant kernel (-q 0..9, SURVEY §2.9) -------------
    #
    # Same exchange skeleton as the Modularity path (phase1 grouped
    # e_{v,C} sums + per-owner comm requests), but the gain comes from a
    # QualityFn and the comm owners additionally serve in[C]/w[C].
    # Aggregates are REBUILT per bucket (in[C] is not additive across
    # synchronous co-movers), matching the oracle kernel exactly
    # (linkgraph/oracle/qlouvain.py documents the semantics).

    def lv_publish_degcnt_selfw(self):
        """State for the E9/E10 reweightings: CSR row counts + self-loop
        weights (d(i), Aii in condora.cpp:58-120 / dp.cpp:70-127)."""
        self.state["degcnt"] = np.diff(self.indptr).astype(np.float64)
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        selfmask = self.indices == src
        selfw = np.zeros(self.n_local)
        np.add.at(selfw, src[selfmask] - self.lo, self.weights[selfmask])
        self.state["selfw"] = selfw

    def lv_max_weight_local(self) -> float:
        return float(self.weights.max(initial=0.0))

    def lv_add_selfloops_local(self) -> int:
        """E4 in-shard: weight-1 self-loop for local vertices lacking one
        (graph_binary.cpp:151-183); rebuilds the local CSR."""
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        has = np.zeros(self.n_local, dtype=bool)
        has[src[self.indices == src] - self.lo] = True
        missing = np.flatnonzero(~has) + self.lo
        self._build_csr(np.concatenate([src, missing]),
                        np.concatenate([self.indices, missing]),
                        np.concatenate([self.weights,
                                        np.ones(len(missing))]))
        return len(missing)

    def lv_reweight_local(self, mode: str, deg_vals,
                          selfw_vals=None) -> float:
        """E9 ('condora') / E10 ('dp') reweighting of the local CSR rows
        using fetched ghost degree counts (+ self-loop weights for E9).
        Returns the local share of sum_se / sum_sq."""
        deg_vals = _resolve(list(deg_vals))
        ids, degs = self._full_values("degcnt", deg_vals, dtype=np.float64)
        src_loc = np.repeat(np.arange(self.n_local, dtype=np.int64),
                            np.diff(self.indptr))
        d_u = self.state["degcnt"][src_loc]
        d_v = self._lookup(ids, degs, self.indices)
        w = self.weights
        if mode == "dp":
            new_w = 2.0 * w / (d_u + d_v)
            ret = float((new_w ** 2).sum())
        else:
            selfw_vals = _resolve(list(selfw_vals))
            ids2, selfs = self._full_values("selfw", selfw_vals,
                                            dtype=np.float64)
            s_u = self.state["selfw"][src_loc]
            s_v = self._lookup(ids2, selfs, self.indices)
            aux = 2.0 * w / (d_u + d_v)
            tmp = s_u / (2.0 * d_u) + s_v / (2.0 * d_v)
            new_w = 2.0 * aux - tmp
            ret = float((tmp - aux).sum())
        self.weights = new_w
        deg = np.diff(self.indptr)
        ksum = np.add.reduceat(np.concatenate([new_w, [0.0]]),
                               self.indptr[:-1]) if len(new_w) \
            else np.zeros(self.n_local)
        self.k = np.where(deg > 0, ksum, 0.0)
        self._lv_bucket_cache = {}
        return ret

    def lv_set_quality(self, q_id: int, alpha: float, kmin: int,
                       sum_se: float, sum_sq: float, max_w: float):
        from ..oracle.qlouvain import make_quality
        self._qfn = make_quality(q_id, alpha=alpha, kmin=kmin,
                                 sum_se=sum_se, sum_sq=sum_sq)
        self._qfn.fixed_max_w = max_w
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        selfmask = self.indices == src
        selfw = np.zeros(self.n_local)
        np.add.at(selfw, src[selfmask] - self.lo, self.weights[selfmask])
        self.state["selfw"] = selfw
        self.state["nw"] = np.ones(self.n_local)

    def lv_agg_partials_q(self):
        """(comm, ksum, cnt, nwsum) per owner (num_returns=P)."""
        lab = self.state["labels"]
        uk, ksum = _grouped_sum(lab, self.k)
        _, cnt = _grouped_sum(lab, np.ones(self.n_local))
        _, nwsum = _grouped_sum(lab, self.state["nw"])
        return tuple(split_by_owner(uk, self.bounds, ksum, cnt, nwsum))

    def lv_agg_apply_q(self, msgs):
        msgs = _resolve(msgs)
        tot = np.zeros(self.n_local)
        size = np.zeros(self.n_local, dtype=np.int64)
        w = np.zeros(self.n_local)
        for ids, ksum, cnt, nwsum in msgs:
            if len(ids):
                loc = ids - self.lo
                np.add.at(tot, loc, ksum)
                np.add.at(size, loc, cnt.astype(np.int64))
                np.add.at(w, loc, nwsum)
        self.comm_state["tot"] = tot
        self.comm_state["size"] = size
        self.comm_state["w"] = w

    def lv_in_partials(self):
        """(comm, in_partial) per owner — in[C] = Σ w over local CSR rows
        with both endpoint labels C (both directions stored => the
        2·dnc + self accumulator shape).  Requires fresh ghost labels."""
        src_lab = np.repeat(self.state["labels"], np.diff(self.indptr))
        dst_lab = self._labels_of_all_edges()
        own = src_lab == dst_lab
        uk, sums = _grouped_sum(src_lab[own], self.weights[own])
        return tuple(split_by_owner(uk, self.bounds, sums))

    def lv_in_apply(self, msgs):
        msgs = _resolve(msgs)
        in_ = np.zeros(self.n_local)
        for ids, sums in msgs:
            if len(ids):
                np.add.at(in_, ids - self.lo, sums)
        self.comm_state["in"] = in_

    def lv_kappa_partial(self) -> int:
        return int((self.comm_state["size"] > 0).sum())

    def lv_serve_comm_q_many(self, reqs) -> tuple:
        """(tot, size, in, w) of local comm slots for all requesters."""
        reqs = _resolve(list(reqs))
        out = []
        for r in reqs:
            ids = np.asarray(r, dtype=np.int64) - self.lo
            out.append((self.comm_state["tot"][ids],
                        self.comm_state["size"][ids].astype(np.int64),
                        self.comm_state["in"][ids],
                        self.comm_state["w"][ids]))
        return tuple(out)

    def lv_moves_phase2_q(self, comm_vals, n_w: float, kappa) -> int:
        """Variant-gain finish: the oracle's _bucket_moves_q rule on the
        fetched (tot, size, in, w); applies moves locally, returns the
        move count (comm aggregates are rebuilt next bucket, no deltas).

        ``kappa``: the global non-empty-community count — an int, or a
        list of per-shard partial refs summed here (the pipelined round
        chain passes refs so the driver never barriers mid-round)."""
        from ..functions.quality import QualityContext
        comm_vals = _resolve(comm_vals)
        if isinstance(kappa, (list, tuple)):
            kappa = int(sum(_resolve(list(kappa))))
        if self._mv is None:
            return 0
        mv = self._mv
        self._mv = None
        need = mv["need"]
        s_tot = np.concatenate([v[0] for v in comm_vals]) \
            if comm_vals else np.empty(0)
        s_size = np.concatenate([v[1] for v in comm_vals]) \
            if comm_vals else np.empty(0, np.int64)
        s_in = np.concatenate([v[2] for v in comm_vals]) \
            if comm_vals else np.empty(0)
        s_w = np.concatenate([v[3] for v in comm_vals]) \
            if comm_vals else np.empty(0)

        def look(arr, ids):
            return arr[np.searchsorted(need, ids)]

        gv, gc, e_vc = mv["gv"], mv["gc"], mv["e"]
        labels = self.state["labels"]
        cur = labels[gv]
        own_mask = gc == cur
        e_cur = np.zeros(self.n_local)
        e_cur[gv[own_mask]] = e_vc[own_mask]
        mx = self._qfn.fixed_max_w
        m2 = 2.0 * self.M
        nw = self.state["nw"]
        selfw = self.state["selfw"]
        verts = np.unique(gv)
        vcur = labels[verts]
        ctx_stay = QualityContext(
            dnc=e_cur[verts], degc=self.k[verts], wu=nw[verts],
            self_v=selfw[verts],
            in_c=look(s_in, vcur) - (2.0 * e_cur[verts] + selfw[verts]),
            tot_c=look(s_tot, vcur) - self.k[verts],
            w_c=look(s_w, vcur) - nw[verts],
            m2=m2, n=n_w, max_w=mx, kappa=kappa)
        thr = np.maximum(self._qfn.gain(ctx_stay), 0.0)
        cand = (~own_mask) & ((gc < cur)
                              | (look(s_size, gc).astype(np.int64) > 1)
                              | (look(s_size, cur).astype(np.int64) > 1))
        gv_c, gc_c, e_c = gv[cand], gc[cand], e_vc[cand]
        if len(gv_c) == 0:
            return 0
        ctx_cand = QualityContext(
            dnc=e_c, degc=self.k[gv_c], wu=nw[gv_c], self_v=selfw[gv_c],
            in_c=look(s_in, gc_c), tot_c=look(s_tot, gc_c),
            w_c=look(s_w, gc_c),
            m2=m2, n=n_w, max_w=mx, kappa=kappa)
        gains = self._qfn.gain(ctx_cand)
        v_f, c_f, g_f = _segment_argmax(gv_c, gc_c, gains)
        pos = np.searchsorted(verts, v_f)
        ok = g_f > thr[pos]
        movers, newc = v_f[ok], c_f[ok]
        labels[movers] = newc
        if getattr(self, "_lv_cache_ready", False):
            self._lv_labs[self._lv_local_pos[movers]] = newc
            self._lv_pending.append(movers + self.lo)
        return int(len(movers))

    def lv_q_terms_q(self, n_w: float) -> tuple[float, int]:
        """(local Σ comm_terms over non-empty slots, local kappa)."""
        terms, nz = self._qfn.comm_terms(
            self.comm_state["in"], self.comm_state["tot"],
            self.comm_state["w"], m2=2.0 * self.M, n=n_w,
            max_w=self._qfn.fixed_max_w)
        return float(terms[nz].sum()), int((self.comm_state["size"] > 0).sum())

    def lv_label_nw_sums(self) -> tuple[np.ndarray, np.ndarray]:
        """(distinct labels, node-weight sums) — contraction node weights."""
        return _grouped_sum(self.state["labels"], self.state["nw"])

    # ---------- modularity -------------------------------------------------

    def lv_q_terms(self) -> tuple[float, float]:
        """(local toOwn sum incl self-loops, sum of tot^2 over local comm
        slots).  Requires fresh ghost labels (lv_store_ghost_labels)."""
        src_lab = np.repeat(self.state["labels"], np.diff(self.indptr))
        dst_lab = self._labels_of_all_edges()
        own = src_lab == dst_lab
        to_own = float(self.weights[own].sum())
        tot_sq = float((self.comm_state["tot"] ** 2).sum())
        return to_own, tot_sq

    # ---------- contraction ------------------------------------------------

    def lv_contract_partial(self, n_buckets: int = 1):
        """Local (csrc, cdst, w) pre-aggregated (A7 combiner).  Requires
        fresh ghost labels.

        ``n_buckets`` > 1: the partial is split by ``csrc % n_buckets``
        (num_returns=n_buckets) so a FIXED-width reduce wave — one task
        per bucket, independent of P — can dedup the partials exactly.
        The deduped global row count is therefore parallelism-invariant,
        which is what makes the engine's driver-vs-distributed
        contraction branch P-invariant (r2 honesty note)."""
        csrc = np.repeat(self.state["labels"], np.diff(self.indptr))
        cdst = self._labels_of_all_edges()
        mult = max(self.n_global,
                   int(max(csrc.max(initial=0), cdst.max(initial=0))) + 1)
        if composite_fits(mult, mult):
            key = csrc * np.int64(mult) + cdst
            uk, sums = _grouped_sum(key, self.weights)
            cs, cd = uk // mult, uk % mult
        else:
            # billion-vertex guard: pair keys would overflow int64 —
            # stable lexsort on the (csrc, cdst) pair instead
            order = np.lexsort((cdst, csrc))
            cs, cd, ws = csrc[order], cdst[order], self.weights[order]
            if len(cs):
                newgrp = np.empty(len(cs), dtype=bool)
                newgrp[0] = True
                newgrp[1:] = (cs[1:] != cs[:-1]) | (cd[1:] != cd[:-1])
                starts = np.flatnonzero(newgrp)
                cs, cd = cs[starts], cd[starts]
                sums = np.add.reduceat(ws, starts)
            else:
                sums = ws
        if n_buckets == 1:
            return pa.table({"csrc": cs, "cdst": cd, "w": sums})
        b = cs % n_buckets
        order = np.argsort(b, kind="stable")
        bs = b[order]
        cuts = np.searchsorted(bs, np.arange(n_buckets + 1))
        return tuple(
            pa.table({"csrc": cs[order[cuts[k]:cuts[k + 1]]],
                      "cdst": cd[order[cuts[k]:cuts[k + 1]]],
                      "w": sums[order[cuts[k]:cuts[k + 1]]]})
            for k in range(n_buckets))

    def lv_label_counts(self) -> tuple[np.ndarray, np.ndarray]:
        """(distinct labels, member counts) over local vertices — the
        per-shard partial for community sizes (S8 combiner)."""
        return np.unique(self.state["labels"], return_counts=True)

    def lv_label_min_counts(self) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
        """(distinct labels, min member node id, member counts) — the
        canonical-renumbering partial: shards hold contiguous node
        ranges sorted ascending, so the first occurrence of each label
        is its local min member."""
        lab = self.state["labels"]
        uk, first, cnt = np.unique(lab, return_index=True,
                                   return_counts=True)
        return uk, first.astype(np.int64) + self.lo, cnt

    def lv_unique_labels(self) -> np.ndarray:
        """Distinct local label values (for the contraction renumber —
        ships #comms ids to the driver, not #vertices)."""
        return np.unique(self.state["labels"])

    def lv_compose_labels(self, mapping_ref):
        """labels <- mapping[labels] (J4: original->community composition).
        ``mapping_ref`` is a ray.put array indexed by current label id."""
        mapping = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        self.state["labels"] = mapping[self.state["labels"]]

    def lv_labels_push(self):
        """Stash a copy of the current labels (actor-side — never ships
        vertex-count arrays to the driver).  Used by callers that run a
        label-mutating job on a SHARED cached engine (the -q variant
        sweep) and must leave the installed partition untouched."""
        lab = self.state.get("labels")
        self._labels_stash = lab.copy() if lab is not None else None

    def lv_labels_pop(self) -> bool:
        st = getattr(self, "_labels_stash", None)
        self._labels_stash = None
        if st is None:
            return False
        self.state["labels"] = st
        return True

    def graph_push(self):
        """Stash the local CSR (indptr/indices/weights/k).  Quality
        variants q=4/7 mutate the graph in place (E4 selfloops + E9/E10
        reweighting); on a shared engine the mutation must be undone."""
        self._graph_stash = (self.indptr.copy(), self.indices.copy(),
                             self.weights.copy(), self.k.copy())

    def graph_pop(self) -> bool:
        st = getattr(self, "_graph_stash", None)
        self._graph_stash = None
        if st is None:
            return False
        self.indptr, self.indices, self.weights, self.k = st
        self._msg_cache = None
        self._lpa_cache = None
        self._lv_bucket_cache = {}
        self._all_col_pos = None
        remote = np.unique(self.indices[(self.indices < self.lo)
                                        | (self.indices >= self.hi)])
        self.ghosts = [ids for ids, in split_by_owner(remote, self.bounds)]
        return True

    def lv_labels_result(self) -> pa.Table:
        return pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "comm": self.state["labels"],
        })

    def lv_labels_head(self, k: int) -> pa.Table:
        """First k (node, comm) rows — bounded fetch for the S12 debug
        printer (never ships the whole shard's labels)."""
        k = min(k, self.n_local)
        return pa.table({
            "node": np.arange(self.lo, self.lo + k, dtype=np.int64),
            "comm": self.state["labels"][:k],
        })

    # ---------- delta application (M1/M2) ---------------------------------

    def apply_delta(self, add_tbl: pa.Table | None,
                    del_src: np.ndarray | None, del_dst: np.ndarray | None,
                    new_bounds: np.ndarray | None = None) -> int:
        """Apply a delta batch to the local CSR (rebuild local rows only).

        ``add_tbl``: (src,dst,w) rows with src owned here, both directions
        pre-symmetrized by the engine (append WITHOUT dedup — M1 quirk).
        ``del_src/del_dst``: directed pairs with src owned here (engine
        sends both directions).  One CSR entry removed per request;
        missing edges counted and skipped (count_notexist).  Returns the
        number of nonexistent deletion requests."""
        if new_bounds is not None:
            self.bounds = np.asarray(new_bounds, dtype=np.int64)
            self.lo = int(self.bounds[self.pid])
            self.hi = int(self.bounds[self.pid + 1])
            self.n_global = int(self.bounds[-1])
            grow = (self.hi - self.lo) - self.n_local
            if grow > 0:
                pad_ip = np.full(grow, self.indptr[-1], dtype=np.int64)
                self.indptr = np.concatenate([self.indptr, pad_ip])
                self.k = np.concatenate([self.k, np.zeros(grow)])
                for name, arr in list(self.state.items()):
                    pad = np.arange(self.n_local, self.hi - self.lo,
                                    dtype=arr.dtype) + self.lo \
                        if arr.dtype == np.int64 else np.zeros(grow)
                    self.state[name] = np.concatenate([arr, pad])
                for name, arr in list(self.comm_state.items()):
                    self.comm_state[name] = np.concatenate(
                        [arr, np.zeros(grow, dtype=arr.dtype)])
                self.n_local = self.hi - self.lo
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        dst, w = self.indices, self.weights
        keep = np.ones(len(src), dtype=bool)
        n_missing = 0
        if del_src is not None and len(del_src):
            if composite_fits(self.n_global, self.n_global):
                key = src * np.int64(self.n_global) + dst
                order = np.argsort(key, kind="stable")
                skey = key[order]

                def find_range(s, d):
                    kk = s * np.int64(self.n_global) + d
                    return (np.searchsorted(skey, kk, side="left"),
                            np.searchsorted(skey, kk, side="right"))
            else:
                # billion-vertex guard: two-level searchsorted on the
                # lexsorted (src, dst) pair instead of a composite key
                order = np.lexsort((dst, src))
                ssrc, sdst = src[order], dst[order]

                def find_range(s, d):
                    a = np.searchsorted(ssrc, s, side="left")
                    b = np.searchsorted(ssrc, s, side="right")
                    return (a + np.searchsorted(sdst[a:b], d, side="left"),
                            a + np.searchsorted(sdst[a:b], d, side="right"))
            for s, d in zip(del_src, del_dst):
                i0, i1 = find_range(s, d)
                hit = -1
                for i in range(i0, i1):
                    if keep[order[i]]:
                        hit = order[i]
                        break
                if hit >= 0:
                    keep[hit] = False
                else:
                    n_missing += 1
        # keep the unweighted elision through the rebuild: fancy-indexing
        # a stride-0 broadcast of ones would materialize E x 8 B of fresh
        # heap per timestep only for _build_csr to re-detect and discard
        elide = w.strides[0] == 0 and w.flat[0] == 1.0
        src, dst = src[keep], dst[keep]
        w = None if elide else w[keep]
        if add_tbl is not None and add_tbl.num_rows:
            aw = add_tbl.column("w").to_numpy()
            n_kept = len(src)
            src = np.concatenate([src, add_tbl.column("src").to_numpy()])
            dst = np.concatenate([dst, add_tbl.column("dst").to_numpy()])
            if elide and not bool((aw == 1.0).all()):
                w, elide = np.concatenate([np.ones(n_kept), aw]), False
            elif not elide:
                w = np.concatenate([w, aw])
        self._build_csr(src, dst, w)
        return n_missing

    def apply_delta_parts(self, new_bounds, n_add: int, *parts) -> int:
        """Dataset-native apply_delta: ``parts[:n_add]`` are routed
        addition tables (src, dst, w), the rest routed deletion tables
        (src, dst) — both directions already expanded and owner-routed
        by the engine's two-stage exchange (see engine._route_delta_refs).
        Concats locally and delegates to apply_delta."""
        add_tbls = [t for t in parts[:n_add] if t.num_rows]
        del_tbls = [t for t in parts[n_add:] if t.num_rows]
        add_tbl = pa.concat_tables(add_tbls) if add_tbls else None
        if add_tbl is not None and "w" not in add_tbl.column_names:
            add_tbl = add_tbl.append_column(
                "w", pa.array(np.ones(add_tbl.num_rows)))
        del_src = del_dst = None
        if del_tbls:
            dt = pa.concat_tables(del_tbls)
            del_src = dt.column("src").to_numpy()
            del_dst = dt.column("dst").to_numpy()
        return self.apply_delta(add_tbl, del_src, del_dst, new_bounds)

    def screen_begin_parts(self, mode: str, *parts: pa.Table):
        """screen_begin over routed per-owner delta tables (the same
        refs apply_delta_parts consumed — zero extra exchanges)."""
        tbls = [t for t in parts if t.num_rows]
        if tbls:
            tbl = pa.concat_tables(tbls)
            s = tbl.column("src").to_numpy()
            d = tbl.column("dst").to_numpy()
        else:
            s = d = np.empty(0, np.int64)
        return self.screen_begin(s, d, mode)

    def local_stats(self) -> dict:
        return {"pid": self.pid, "n_local": self.n_local,
                "n_edges": int(len(self.indices)),
                "k_sum": float(self.k.sum())}

    # ---------- new-node seeding (L12, main_louvain.cpp:1484-1498) --------

    def lv_seed_requests(self, n_old: int):
        """For local NEW nodes (gid >= n_old) with exactly one neighbor
        that is an OLD node: request that neighbor's label.  Returns
        per-owner neighbor-id request arrays (num_returns=P)."""
        gids = np.arange(self.lo, self.hi, dtype=np.int64)
        new_mask = gids >= n_old
        deg = np.diff(self.indptr)
        single = new_mask & (deg == 1)
        idx = np.flatnonzero(single)
        nbrs = self.indices[self.indptr[idx]] if len(idx) else np.empty(0, np.int64)
        old_nbr = nbrs < n_old
        self._seed = {"n_old": n_old, "inherit_loc": idx[old_nbr],
                      "inherit_nbr": nbrs[old_nbr]}
        need = np.unique(nbrs[old_nbr])
        self._seed["need"] = need
        return tuple(ids for ids, in split_by_owner(need, self.bounds))

    def lv_seed_apply(self, next_comm: int, nbr_label_vals) -> int:
        """Assign labels to local new nodes: inherit or fresh sequential
        comm ids in ascending node order.  Returns #fresh assigned."""
        nbr_label_vals = _resolve(nbr_label_vals)
        sd = self._seed
        s_ids = sd["need"]         # sorted-unique; owner chunks in order
        s_vals = np.concatenate([np.asarray(v) for v in nbr_label_vals]) \
            if nbr_label_vals else np.empty(0, np.int64)
        labels = self.state["labels"]
        inherit_map = dict(zip(sd["inherit_loc"].tolist(),
                               sd["inherit_nbr"].tolist()))
        gids = np.arange(self.lo, self.hi, dtype=np.int64)
        fresh = 0
        for loc in np.flatnonzero(gids >= sd["n_old"]):
            if loc in inherit_map:
                nbr = inherit_map[loc]
                labels[loc] = s_vals[np.searchsorted(s_ids, nbr)]
            else:
                labels[loc] = next_comm
                next_comm += 1
                fresh += 1
        self._seed = None
        return fresh

    def lv_max_label(self, upto: int | None = None) -> int:
        """Max label over local vertices with gid < upto (old nodes only —
        the reference's n_comm counter base, main_louvain.cpp:1480-1482)."""
        lab = self.state.get("labels")
        if lab is None or not len(lab):
            return -1
        if upto is not None:
            stop = max(0, min(self.n_local, upto - self.lo))
            lab = lab[:stop]
        return int(lab.max(initial=-1))

    # ---------- delta screening -------------------------------------------

    def screen_begin(self, d_src, d_dst, mode: str):
        """Stash the symmetric delta pairs whose src is local; return
        per-owner label requests for the dst endpoints + candidate-comm
        ghost needs (num_returns=P).  Ghost labels must be fetched first
        via lv_store_ghost_labels for the adjacency walk (add mode)."""
        d_src = np.asarray(d_src, dtype=np.int64)
        d_dst = np.asarray(d_dst, dtype=np.int64)
        self._sc = {"src": d_src, "dst": d_dst, "mode": mode}
        need = np.unique(d_dst)
        return tuple(ids for ids, in split_by_owner(need, self.bounds))

    def screen_mark(self, dst_label_vals):
        """Compute node marks; returns (marked_comm_ids, n_marked_local).

        add mode additionally needs tot/size -> two-phase like moves; to
        keep it simple we piggyback on the comm aggregates already held
        sharded: this phase returns per-owner comm requests instead, and
        the engine calls screen_mark2.  For del mode the comm aggregates
        are not needed and marking completes here."""
        dst_label_vals = _resolve(dst_label_vals)
        sc = self._sc
        # sorted-unique ids + contiguous owner ranges -> chunks concat in
        # sorted order (same property as lv_moves_phase2)
        s_ids = np.unique(sc["dst"])
        s_vals = np.concatenate([np.asarray(v) for v in dst_label_vals]) \
            if dst_label_vals else np.empty(0, np.int64)
        dst_lab = s_vals[np.searchsorted(s_ids, sc["dst"])] if len(sc["dst"]) else np.empty(0, np.int64)
        labels = self.state["labels"]
        node_eval = np.zeros(self.n_local, dtype=bool)
        if sc["mode"] == "del":
            src_lab = labels[sc["src"] - self.lo]
            same = src_lab == dst_lab
            node_eval[sc["src"][same] - self.lo] = True
            marked_comms = np.unique(src_lab[same])
            self.state["R"] = node_eval.astype(np.int8)
            self._sc = None
            return marked_comms, int(node_eval.sum()), tuple(
                np.empty(0, np.int64) for _ in range(self.P))
        # add mode: build candidate sets and e_{v->C}; request tot/size
        sc["dst_lab"] = dst_lab
        sources = np.unique(sc["src"])
        src_loc = sources - self.lo
        cand_v = np.concatenate([sc["src"], sc["src"]])
        cand_c = np.concatenate([dst_lab, labels[sc["src"] - self.lo]])

        deg = np.diff(self.indptr)
        if len(src_loc):
            counts = deg[src_loc]
            starts_e = self.indptr[src_loc]
            total = int(counts.sum())
            take = (np.repeat(starts_e, counts)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(counts) - counts, counts))
        else:
            take = np.empty(0, np.int64)
        rows = np.repeat(sources, deg[src_loc])
        cols = self.indices[take]
        w = self.weights[take]
        ncomm = self._label_of(cols) if len(cols) else np.empty(0, np.int64)
        c_card = max(self.n_global, int(ncomm.max(initial=0)) + 1,
                     int(cand_c.max(initial=0)) + 1)
        in_cand = pair_isin(rows, ncomm, cand_v, cand_c,
                            self.n_global, c_card)
        rows, cols, w, ncomm = rows[in_cand], cols[in_cand], w[in_cand], ncomm[in_cand]
        nonself = cols != rows
        rows, w, ncomm = rows[nonself], w[nonself], ncomm[nonself]
        order = np.lexsort((ncomm, rows))
        rows, ncomm, w = rows[order], ncomm[order], w[order]
        newgrp = np.empty(len(rows), dtype=bool)
        if len(rows):
            newgrp[0] = True
            newgrp[1:] = (rows[1:] != rows[:-1]) | (ncomm[1:] != ncomm[:-1])
        starts = np.flatnonzero(newgrp)
        gv = rows[starts]          # GLOBAL source id here
        gc = ncomm[starts]
        e_vc = np.add.reduceat(w, starts) if len(starts) else np.empty(0)
        cur = labels[gv - self.lo]
        need2 = self._sorted_unique_ids(gc, cur) if len(gv) \
            else np.empty(0, np.int64)
        self._sc.update({"gv": gv, "gc": gc, "e": e_vc, "need": need2})
        return np.empty(0, np.int64), 0, tuple(
            ids for ids, in split_by_owner(need2, self.bounds))

    def screen_mark2(self, comm_vals):
        """(add mode) finish gains; returns marked_comm_ids."""
        comm_vals = _resolve(comm_vals)
        sc = self._sc
        labels = self.state["labels"]
        node_eval = np.zeros(self.n_local, dtype=bool)
        marked: list[int] = []
        if len(sc.get("gv", [])):
            s_ids = sc["need"]     # sorted-unique; owner chunks in order
            s_tot = np.concatenate([v[0] for v in comm_vals])
            s_size = np.concatenate([v[1] for v in comm_vals])

            def tot_of(ids):
                return s_tot[np.searchsorted(s_ids, ids)]

            def size_of(ids):
                return s_size[np.searchsorted(s_ids, ids)].astype(np.int64)

            gv, gc, e_vc = sc["gv"], sc["gc"], sc["e"]
            cur = labels[gv - self.lo]
            own_mask = gc == cur
            e_cur = np.zeros(self.n_local)
            e_cur[(gv[own_mask] - self.lo)] = e_vc[own_mask]
            cand = (~own_mask) & ((gc < cur) | (size_of(gc) > 1) | (size_of(cur) > 1))
            gv_c, gc_c, e_c = gv[cand], gc[cand], e_vc[cand]
            cur_c = labels[gv_c - self.lo]
            kv = self.k[gv_c - self.lo]
            M = self.M
            gain = e_c / M + kv * ((tot_of(cur_c) - kv) - tot_of(gc_c)) / (2 * M * M)
            if len(gv_c):
                # (gv_c, gc_c) sorted by (v, C asc) — see lv_moves_phase2
                v_f, c_f, g_f = _segment_argmax(gv_c, gc_c, gain)
                ok = (g_f > 0) | ((g_f == 0) & (c_f < labels[v_f - self.lo]))
                v_f, c_f, g_f = v_f[ok], c_f[ok], g_f[ok]
                pos = g_f - e_cur[v_f - self.lo] / M > 0
                node_eval[v_f[pos] - self.lo] = True
                marked = c_f[pos].tolist()
        self.state["R"] = node_eval.astype(np.int8)
        self._sc = None
        return np.unique(np.asarray(marked, dtype=np.int64)), int(node_eval.sum())

    def screen_expand(self, marked_comms) -> tuple:
        """final R |= members of marked comms; neighbors of locally marked
        vertices -> per-owner mark messages (num_returns P as last items).

        Returns (n/a) tuple: first P entries are per-owner neighbor-id
        arrays, last entry is None placeholder."""
        marked_comms = np.asarray(marked_comms, dtype=np.int64)
        R = self.state["R"].astype(bool)
        marked_idx = np.flatnonzero(R)
        if len(marked_idx):
            deg = np.diff(self.indptr)
            counts = deg[marked_idx]
            starts_e = self.indptr[marked_idx]
            total = int(counts.sum())
            take = (np.repeat(starts_e, counts)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(counts) - counts, counts))
            nbr = np.unique(self.indices[take])
        else:
            nbr = np.empty(0, np.int64)
        final = R.copy()
        if len(marked_comms):
            final |= np.isin(self.state["labels"], marked_comms)
        self.state["R"] = final.astype(np.int8)
        return tuple(ids for ids, in split_by_owner(nbr, self.bounds))

    def screen_apply_marks(self, msgs) -> int:
        msgs = _resolve(msgs)
        self._r_epoch = getattr(self, "_r_epoch", 0) + 1
        R = self.state["R"].astype(bool)
        for ids in msgs:
            if len(ids):
                R[ids - self.lo] = True
        self.state["R"] = R.astype(np.int8)
        return int(R.sum())
