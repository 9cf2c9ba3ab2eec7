"""Synchronous bucketed Louvain + delta screening — the semantic oracle.

Pins the reference's GPU semantics exactly (which are deterministic, unlike
the RNG-ordered CPU path — SURVEY.md §2.6 O2):

- One optimisation *round* processes the seven degree buckets
  ``(0,4] (4,8] (8,16] (16,32] (32,84] (84,319] (319,inf)`` **sequentially**;
  within a bucket all vertices evaluate moves against the same snapshot of
  labels/community weights, then moves are applied and ``communityWeight``
  and ``communitySize`` are rebuilt before the next bucket
  (``modularity_optimisation_mem.cu:365-420``; constants
  ``modularity_optimisation.cuh:8-20``).  Degree-0 vertices fall in no
  bucket and never move.
- gain(v -> C) = e_{v->C}/M + k_v * ((tot[cur] - k_v) - tot[C]) / (2 M^2)
  (``computeGain``, ``modularity_optimisation_mem.cu:99-109``), with
  e_{v->C} excluding self-loops.
- Candidate filter: C != cur and (C < cur or size[C] > 1 or size[cur] > 1)
  — the singleton-swap guard (``:161-162``).
- Tie-break: strictly greater gain, or equal gain and lower community id
  (``:164``); bestGain starts at 0 with bestCommunity = cur.
- Accept iff bestGain - e_{v->cur}/M > 0 (``:199-203``).
- Round loop: while (Q_after - Q_before) >= min_gain (``:365-420``);
  "was anything changed" = any round with positive gain.
- Q = sum_v toOwn(v)/(2M) - sum_C tot[C]^2/(4M^2) where toOwn *includes*
  self-loops (``calculateToOwnCommunity`` has no self check,
  ``modularity_optimisation_mem.cu:594-632``).
- Level loop: optimise; if unchanged and not ``once_more`` stop; else
  contract and continue; ``once_more`` (force a second level) is set when
  starting from an init partition (``gpulouvain.cu:105-128``).
- Contraction: non-empty communities renumbered densely in ascending old-id
  order; new edge weights = grouped sums over (comm(u), comm(v)) keeping
  both directions, so the super-node self-loop holds the full intra-weight
  (``louvain.cpp:260-333``, ``community_aggregation_mem.cu:376-633``).

Delta screening (GPU variants, ``node_eval.cu``):
- add (``nodeEval_add_gpu`` :818-1057): per source of new edges, candidate
  communities = {own} ∪ {comms of new targets}; gains over the FULL
  adjacency restricted to candidates; positive best ⇒ mark source and best
  community; final R = marked ∪ their neighbors ∪ members of marked comms.
- del (``nodeEval_del_gpu`` :1243-1348): per deleted edge whose endpoints
  share a community ⇒ mark endpoint and that community; same final
  expansion.
"""

from __future__ import annotations

import numpy as np

from .graph import CSRGraph

BUCKET_BOUNDS = [0, 4, 8, 16, 32, 84, 319, np.iinfo(np.int64).max]
DEFAULT_MIN_GAIN = 1e-3  # reference -e default (main_louvain.cpp:80)


def _ranges_concat(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """concat([arange(s, s+c) for s, c in zip(starts, counts)]) without
    the Python loop."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    return (np.repeat(np.asarray(starts, dtype=np.int64), counts)
            + np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts))


def _segment_argmax(seg: np.ndarray, cand: np.ndarray, score: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-segment winner of (max score, tie -> first) over data sorted by
    (seg asc, cand asc).  Equivalent to the lexsort((cand, -score, seg))
    take-first tournament, in O(n) instead of a sort.  Returns
    (seg_winner, cand_winner, score_winner), one row per segment."""
    first = np.empty(len(seg), dtype=bool)
    first[0] = True
    first[1:] = seg[1:] != seg[:-1]
    starts = np.flatnonzero(first)
    seg_id = np.cumsum(first) - 1
    smax = np.maximum.reduceat(score, starts)
    is_max = score == smax[seg_id]
    idx = np.flatnonzero(is_max)
    # first max per segment: seg_id[idx] is sorted; take first occurrence
    keep = np.empty(len(idx), dtype=bool)
    keep[0] = True
    keep[1:] = seg_id[idx][1:] != seg_id[idx][:-1]
    win = idx[keep]
    return seg[win], cand[win], score[win]


# ---------------------------------------------------------------------------
# aggregates

def community_aggregates(g: CSRGraph, labels: np.ndarray, n_comm_slots: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """tot[C] = sum of k_v for members; size[C] = member count."""
    tot = np.bincount(labels, weights=g.k, minlength=n_comm_slots)
    size = np.bincount(labels, minlength=n_comm_slots)
    return tot, size


def modularity(g: CSRGraph, labels: np.ndarray, tot: np.ndarray) -> float:
    """Q per calculateModularity (self-loops included in toOwn)."""
    if g.M == 0:
        return 0.0
    src = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    own = labels[src] == labels[g.indices]
    to_own = float(g.weights[own].sum())
    return to_own / (2 * g.M) - float((tot.astype(np.float64) ** 2).sum()) / (4 * g.M * g.M)


# ---------------------------------------------------------------------------
# one bucket of synchronous moves (vectorized)

def _bucket_slice(g: CSRGraph, sel: np.ndarray):
    """Static per-bucket edge slice (rows, cols, w, w_integral) — the
    vertex sets and adjacency are invariant within a level, so one_level
    hoists this out of its round loop."""
    if len(sel) == 0:
        return None
    deg = g.degrees
    counts = deg[sel]
    rows = np.repeat(sel, counts)
    if len(sel) == g.n:
        take = np.arange(len(g.indices))
        rows = np.repeat(np.arange(g.n, dtype=np.int64), deg)
    else:
        starts_e = g.indptr[sel]
        total = int(counts.sum())
        take = (np.repeat(starts_e, counts)
                + np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
    cols = g.indices[take]
    w = g.weights[take]
    nonself = cols != rows
    rows, cols, w = rows[nonself], cols[nonself], w[nonself]
    w_int = bool(len(w) == 0 or (w == np.floor(w)).all())
    return rows, cols, w, w_int


def _bucket_moves(g: CSRGraph, sel: np.ndarray, labels: np.ndarray,
                  tot: np.ndarray, size: np.ndarray,
                  slc=None) -> tuple[np.ndarray, np.ndarray]:
    """Best-move computation for vertices ``sel`` against current state.

    Returns (vertices_that_move, their_new_labels).
    """
    if len(sel) == 0:
        return sel, sel
    if slc is None:
        slc = _bucket_slice(g, sel)
    rows, cols, w, w_int = slc
    ncomm = labels[cols]

    # e_{v->C}: grouped sums by (v, C).  Integral weights (every level of
    # an unweighted graph) make sums exact => order-free, so a single
    # composite-key unstable sort replaces the stable lexsort; the float
    # fallback keeps the deterministic sorted order.
    if w_int:
        mult = np.int64(max(g.n, int(ncomm.max(initial=0)) + 1))
        key = rows * mult + ncomm
        order = np.argsort(key)
        rows, ncomm, w = rows[order], ncomm[order], w[order]
        key = key[order]
        newgrp = np.empty(len(rows), dtype=bool)
        if len(rows):
            newgrp[0] = True
            newgrp[1:] = key[1:] != key[:-1]
    else:
        order = np.lexsort((ncomm, rows))
        rows, ncomm, w = rows[order], ncomm[order], w[order]
        newgrp = np.empty(len(rows), dtype=bool)
        if len(rows):
            newgrp[0] = True
            newgrp[1:] = (rows[1:] != rows[:-1]) | (ncomm[1:] != ncomm[:-1])
    starts = np.flatnonzero(newgrp)
    gv = rows[starts]
    gc = ncomm[starts]
    e_vc = np.add.reduceat(w, starts) if len(starts) else np.empty(0)

    cur = labels[gv]
    own_mask = gc == cur
    # e_{v->cur} per selected vertex (0 when no same-comm neighbor)
    e_cur = np.zeros(g.n, dtype=np.float64)
    e_cur[gv[own_mask]] = e_vc[own_mask]

    cand = (~own_mask) & ((gc < cur) | (size[gc] > 1) | (size[cur] > 1))
    gv_c, gc_c, e_c = gv[cand], gc[cand], e_vc[cand]
    cur_c = labels[gv_c]
    gain = e_c / g.M + g.k[gv_c] * ((tot[cur_c] - g.k[gv_c]) - tot[gc_c]) / (2 * g.M * g.M)

    # keep only positive-gain candidates (bestGain starts at 0 with best=cur;
    # gain == 0 ties resolve to cur only if C > cur... careful: reference
    # compares gain > bestGain(=0) OR (== and C < bestCommunity(=cur)).
    # So a 0-gain candidate with C < cur CAN become best — but then the
    # accept test bestGain - e_cur/M > 0 fails unless e_cur < 0 (never).
    # A negative-gain candidate can never win over the initial 0.  Hence
    # only candidates with gain > 0, or gain == 0 and C < cur, matter; and
    # 0-gain winners are rejected by the accept test when e_cur >= 0 which
    # always holds.  We keep the exact tournament for bit-parity.
    best_new = np.full(g.n, -1, dtype=np.int64)
    best_gain = np.zeros(g.n, dtype=np.float64)
    if len(gv_c):
        # tournament: (max gain, tie -> lowest C) per vertex, then beat
        # the initial (gain 0, C = cur) incumbent.  (gv_c, gc_c) is
        # sorted by (v, C asc), so the winner is the FIRST index hitting
        # the per-vertex max — identical to the reference's sequential
        # strictly-greater scan in C order, without a sort.
        v_f, c_f, g_f = _segment_argmax(gv_c, gc_c, gain)
        beats_incumbent = (g_f > 0) | ((g_f == 0) & (c_f < labels[v_f]))
        v_f, c_f, g_f = v_f[beats_incumbent], c_f[beats_incumbent], g_f[beats_incumbent]
        best_new[v_f] = c_f
        best_gain[v_f] = g_f

    movers = np.flatnonzero(best_new >= 0)
    accept = best_gain[movers] - e_cur[movers] / g.M > 0
    movers = movers[accept]
    return movers, best_new[movers]


def one_level(g: CSRGraph, labels: np.ndarray, min_gain: float,
              subset: np.ndarray | None = None) -> bool:
    """One optimisation level, mutating ``labels`` in place.

    ``subset`` (bool mask over vertices) restricts moves to the screened
    set R (optimiseModularityUsingVertexSubset); aggregates still cover
    the whole graph.  Returns True iff any round improved Q.
    """
    n_slots = max(g.n, int(labels.max(initial=0)) + 1)
    tot, size = community_aggregates(g, labels, n_slots)
    deg = g.degrees
    changed = False
    total_gain = min_gain
    # static per-bucket vertex sets + edge slices, hoisted out of the
    # round loop (they only depend on degrees and the subset mask)
    buckets = []
    for lo, hi in zip(BUCKET_BOUNDS[:-1], BUCKET_BOUNDS[1:]):
        sel = (deg > lo) & (deg <= hi)
        if subset is not None:
            sel &= subset
        sel_idx = np.flatnonzero(sel)
        if len(sel_idx):
            buckets.append((sel_idx, _bucket_slice(g, sel_idx)))
    # q_before of round r+1 == q_after of round r (no mutation between
    # the round-end and round-start computations) — compute once per round
    q_before = modularity(g, labels, tot)
    while total_gain >= min_gain:
        for sel_idx, slc in buckets:
            movers, newc = _bucket_moves(g, sel_idx, labels, tot, size,
                                         slc=slc)
            if len(movers):
                labels[movers] = newc
                tot = np.bincount(labels, weights=g.k, minlength=n_slots)
                size = np.bincount(labels, minlength=n_slots)
        q_after = modularity(g, labels, tot)
        total_gain = q_after - q_before
        changed = changed or (total_gain > 0)
        q_before = q_after
    return changed


# ---------------------------------------------------------------------------
# contraction

def contract(g: CSRGraph, labels: np.ndarray
             ) -> tuple[np.ndarray, CSRGraph]:
    """Dense-renumber non-empty communities (ascending old id) and build the
    contracted graph.  Returns (renumber_map_applied_labels, new_graph):
    element i of the first array is the new-graph node id of old vertex i.
    """
    uniq = np.unique(labels)
    remap = np.full(int(labels.max(initial=0)) + 1, -1, dtype=np.int64)
    remap[uniq] = np.arange(len(uniq), dtype=np.int64)
    new_labels = remap[labels]
    src, dst, w = g.to_edge_arrays()
    csrc, cdst = new_labels[src], new_labels[dst]
    n_new = len(uniq)
    key = csrc * np.int64(n_new) + cdst
    order = (np.argsort(key)
             if len(w) == 0 or (w == np.floor(w)).all()
             else np.argsort(key, kind="stable"))
    key_s, w_s = key[order], w[order]
    uk, start = np.unique(key_s, return_index=True)
    sums = np.add.reduceat(w_s, start) if len(start) else np.empty(0)
    ng = CSRGraph.from_edges(uk // n_new, uk % n_new, sums, n=n_new)
    return new_labels, ng


# ---------------------------------------------------------------------------
# level-loop driver

def louvain(g: CSRGraph, init_labels: np.ndarray | None = None,
            subset: np.ndarray | None = None,
            min_gain: float = DEFAULT_MIN_GAIN,
            max_levels: int = 100) -> dict:
    """Full Louvain: level loop per gpulouvain.cu:105-151.

    Returns dict with: ``labels`` (original vertex -> final community id in
    the final level's id space), ``levels`` (list of per-level dense
    renumber arrays), ``modularity`` (final Q), ``q_trajectory`` (Q after
    each level's optimisation).
    """
    once_more = init_labels is not None
    labels = (np.arange(g.n, dtype=np.int64) if init_labels is None
              else init_labels.astype(np.int64).copy())
    orig = np.arange(g.n, dtype=np.int64)  # original vertex -> current-level node
    cur_g = g
    q_traj: list[float] = []
    level_maps: list[np.ndarray] = []
    final_q = None
    for level in range(max_levels):
        sub = subset if level == 0 else None
        changed = one_level(cur_g, labels, min_gain, subset=sub)
        n_slots = max(cur_g.n, int(labels.max(initial=0)) + 1)
        tot, _ = community_aggregates(cur_g, labels, n_slots)
        final_q = modularity(cur_g, labels, tot)
        q_traj.append(final_q)
        if not changed and not once_more:
            break
        once_more = False
        new_labels, new_g = contract(cur_g, labels)
        level_maps.append(new_labels)
        # orig indexes old-level nodes; new_labels maps old-level node ->
        # new-level node id of its community (updateOriginalToCommunity, J4)
        orig = new_labels[orig]
        cur_g = new_g
        labels = np.arange(cur_g.n, dtype=np.int64)
    final_labels = labels[orig]
    return {
        "labels": final_labels,
        "levels": level_maps,
        "modularity": final_q,
        "q_trajectory": q_traj,
        "n_levels": len(level_maps),
    }


# ---------------------------------------------------------------------------
# delta screening (GPU semantics)

def screen_add(g: CSRGraph, labels: np.ndarray, add_src: np.ndarray,
               add_dst: np.ndarray) -> np.ndarray:
    """R mask after an addition batch (nodeEval_add_gpu semantics).

    ``g``/``labels`` are the post-mutation graph and the init partition;
    (add_src, add_dst) is the SYMMETRIC list of newly added edges (both
    directions), so each endpoint appears as a source with its new
    neighbors as targets.
    """
    n_slots = max(g.n, int(labels.max(initial=0)) + 1)
    tot, size = community_aggregates(g, labels, n_slots)
    node_eval = np.zeros(g.n, dtype=bool)
    comm_eval = np.zeros(n_slots, dtype=bool)
    if len(add_src):
        # candidate comm set per source: {own} ∪ {comms of new targets}
        cand_v = np.concatenate([add_src, add_src])
        cand_c = np.concatenate([labels[add_dst], labels[add_src]])
        cand_key = np.unique(cand_v * np.int64(n_slots) + cand_c)
        sources = np.unique(add_src)

        deg = g.degrees
        counts = deg[sources]
        rows = np.repeat(sources, counts)
        take = _ranges_concat(g.indptr[sources], counts)
        cols = g.indices[take]
        w = g.weights[take]
        ncomm = labels[cols]
        # restrict to neighbors whose community is in the candidate set
        in_cand = np.isin(rows * np.int64(n_slots) + ncomm, cand_key)
        rows, cols, w, ncomm = rows[in_cand], cols[in_cand], w[in_cand], ncomm[in_cand]
        nonself = cols != rows
        rows, w, ncomm = rows[nonself], w[nonself], ncomm[nonself]

        if len(w) == 0 or (w == np.floor(w)).all():
            mult = np.int64(max(n_slots, int(ncomm.max(initial=0)) + 1))
            key = rows * mult + ncomm
            order = np.argsort(key)
            rows, ncomm, w = rows[order], ncomm[order], w[order]
            key = key[order]
            newgrp = np.empty(len(rows), dtype=bool)
            if len(rows):
                newgrp[0] = True
                newgrp[1:] = key[1:] != key[:-1]
        else:
            order = np.lexsort((ncomm, rows))
            rows, ncomm, w = rows[order], ncomm[order], w[order]
            newgrp = np.empty(len(rows), dtype=bool)
            if len(rows):
                newgrp[0] = True
                newgrp[1:] = (rows[1:] != rows[:-1]) | (ncomm[1:] != ncomm[:-1])
        starts = np.flatnonzero(newgrp)
        gv, gc = rows[starts], ncomm[starts]
        e_vc = np.add.reduceat(w, starts) if len(starts) else np.empty(0)

        cur = labels[gv]
        own_mask = gc == cur
        e_cur = np.zeros(g.n, dtype=np.float64)
        e_cur[gv[own_mask]] = e_vc[own_mask]
        cand = (~own_mask) & ((gc < cur) | (size[gc] > 1) | (size[cur] > 1))
        gv_c, gc_c, e_c = gv[cand], gc[cand], e_vc[cand]
        cur_c = labels[gv_c]
        gain = e_c / g.M + g.k[gv_c] * ((tot[cur_c] - g.k[gv_c]) - tot[gc_c]) / (2 * g.M * g.M)
        if len(gv_c):
            v_f, c_f, g_f = _segment_argmax(gv_c, gc_c, gain)
            ok = (g_f > 0) | ((g_f == 0) & (c_f < labels[v_f]))
            v_f, c_f, g_f = v_f[ok], c_f[ok], g_f[ok]
            pos = g_f - e_cur[v_f] / g.M > 0
            node_eval[v_f[pos]] = True
            comm_eval[c_f[pos]] = True
    return _expand_marks(g, labels, node_eval, comm_eval)


def screen_del(g: CSRGraph, labels: np.ndarray, del_src: np.ndarray,
               del_dst: np.ndarray) -> np.ndarray:
    """R mask after a deletion batch (nodeEval_del_gpu semantics).

    (del_src, del_dst) is the SYMMETRIC list of deleted edges; any deleted
    edge whose endpoints share a community marks the source vertex and that
    community (node_eval.cu:1059-1110).
    """
    n_slots = max(g.n, int(labels.max(initial=0)) + 1)
    node_eval = np.zeros(g.n, dtype=bool)
    comm_eval = np.zeros(n_slots, dtype=bool)
    if len(del_src):
        same = labels[del_src] == labels[del_dst]
        node_eval[del_src[same]] = True
        comm_eval[labels[del_src[same]]] = True
    return _expand_marks(g, labels, node_eval, comm_eval)


def _expand_marks(g: CSRGraph, labels: np.ndarray, node_eval: np.ndarray,
                  comm_eval: np.ndarray) -> np.ndarray:
    """final R = marked ∪ neighbors(marked) ∪ members of marked comms
    (computeFinalNodeEval + computeNodeEval, node_eval.cu:438-561)."""
    final = node_eval.copy()
    marked = np.flatnonzero(node_eval)
    if len(marked):
        take = _ranges_concat(g.indptr[marked], g.degrees[marked])
        final[g.indices[take]] = True
    final |= comm_eval[labels]
    return final
