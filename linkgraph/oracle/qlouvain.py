"""Quality-variant Louvain oracle — the reference's ``-q 0..9`` surface
(``main_louvain.cpp:889-899``, dispatch ``init_quality``
``main_louvain.cpp:998-1059``) under the engine's deterministic
synchronous-bucketed semantics.

The reference CPU path evaluates, for each visited node AFTER removing it
from its community, ``qual->gain(node, C, e_{v->C}, k_v)`` over its
neighbor communities (cur first) and moves to the strictly-best
positive-gain community (``louvain.cpp:399-435``: ``best_increase``
starts at 0 with ``best_comm = cur``).  Its visit order is RNG-seeded —
unreproducible by design (SURVEY.md §2.6 O2) — so, exactly as the
round-1 engine does for Modularity, this kernel adopts the synchronous
bucketed sweep with a deterministic rule:

  - candidates = neighbor communities (snapshot accumulators), with the
    GPU singleton-swap guard (C < cur or size[C] > 1 or size[cur] > 1,
    ``modularity_optimisation_mem.cu:161-162``) for synchronous
    convergence;
  - score(C) = q.gain(...) with ``cur``'s accumulators adjusted for the
    node's removal (``in -= 2 e_cur + self``, ``tot -= k``, ``w -= wu``,
    the shared accumulator shape, e.g. ``modularity.h:74-94``);
  - move to argmax score (tie -> lower comm id) iff
    score > max(score(cur_after_removal), 0) — the reference's
    strictly-greater rule with ``best_increase = 0`` incumbent;
  - per-bucket aggregate rebuild (snapshot semantics), round loop while
    the global quality improves by >= min_gain;
  - ``kappa`` (DP/Shi-Malik) is the per-bucket snapshot count of
    non-empty communities (the sequential path updates it mid-pass —
    order-dependent, hence unreproducible; snapshot is our determinism
    trade, same spirit as O2).

Level-0 preprocessing per ``init_quality`` (nbc == 0 only):
q=4 -> E4 add_selfloops + E9 CondorA weighting (sum_se);
q=7 -> max_w of the ORIGINAL weights, then E10 DP weighting (sum_sq);
q in {1,2,3,9} -> max_w of the level-0 graph.  ``max_w`` is pinned
across contracted levels (fixed_max_w), matching the reference's
compute-once behavior.  Contraction carries node weights (super-node
weight = sum of member weights, ``louvain.cpp:276-301``).
"""

from __future__ import annotations

import numpy as np

from ..functions.quality import (QUALITY_FUNCTIONS, QualityContext,
                                 QualityFn, community_aggregates,
                                 condora_weighting, dp_weighting,
                                 selfloop_weights)
from .graph import CSRGraph
from .louvain import (BUCKET_BOUNDS, DEFAULT_MIN_GAIN, _bucket_slice,
                      _segment_argmax)


def add_selfloops(g: CSRGraph) -> CSRGraph:
    """E4 (graph_binary.cpp:151-183): weight-1 self-loop for every vertex
    lacking one."""
    src, dst, w = g.to_edge_arrays()
    has = np.zeros(g.n, dtype=bool)
    has[src[src == dst]] = True
    missing = np.flatnonzero(~has)
    return CSRGraph.from_edges(
        np.concatenate([src, missing]), np.concatenate([dst, missing]),
        np.concatenate([w, np.ones(len(missing))]), n=g.n)


def make_quality(q_id: int, *, alpha: float = 0.5, kmin: int = 1,
                 sum_se: float = 0.0, sum_sq: float = 0.0) -> QualityFn:
    """Instantiate a QualityFn with the reference's -c/-k defaults
    (alpha clamped to (0,1) -> 0.5, kmin < 1 -> 1)."""
    cls = QUALITY_FUNCTIONS[q_id]
    if q_id == 2:
        if alpha <= 0.0 or alpha >= 1.0:
            alpha = 0.5
        return cls(alpha)
    if q_id == 4:
        return cls(sum_se)
    if q_id == 7:
        return cls(sum_sq)
    if q_id == 8:
        return cls(max(1, int(kmin)))
    return cls()


def prepare_graph(g: CSRGraph, q_id: int, *, alpha: float = 0.5,
                  kmin: int = 1) -> tuple[CSRGraph, QualityFn]:
    """Level-0 init_quality: preprocessing + scalar capture."""
    sum_se = sum_sq = 0.0
    max_w = float(g.weights.max(initial=0.0))
    if q_id == 4:
        g = add_selfloops(g)
        g, sum_se = condora_weighting(g)
    elif q_id == 7:
        g, sum_sq = dp_weighting(g)
    q = make_quality(q_id, alpha=alpha, kmin=kmin, sum_se=sum_se,
                     sum_sq=sum_sq)
    q.fixed_max_w = max_w
    return g, q


def _bucket_moves_q(g: CSRGraph, sel: np.ndarray, labels: np.ndarray,
                    agg, q: QualityFn, nodes_w: np.ndarray,
                    selfw: np.ndarray, m2: float, n_w: float,
                    kappa: int, slc) -> tuple[np.ndarray, np.ndarray]:
    """Generic-quality analog of oracle/louvain._bucket_moves."""
    if len(sel) == 0 or slc is None:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    rows, cols, w, w_int = slc
    ncomm = labels[cols]
    if w_int:
        mult = np.int64(max(g.n, int(ncomm.max(initial=0)) + 1))
        key = rows * mult + ncomm
        order = np.argsort(key)
    else:
        order = np.lexsort((ncomm, rows))
    rows_s, ncomm_s, w_s = rows[order], ncomm[order], w[order]
    newgrp = np.empty(len(rows_s), dtype=bool)
    if len(rows_s):
        newgrp[0] = True
        newgrp[1:] = (rows_s[1:] != rows_s[:-1]) | \
            (ncomm_s[1:] != ncomm_s[:-1])
    starts = np.flatnonzero(newgrp)
    gv = rows_s[starts]
    gc = ncomm_s[starts]
    e_vc = np.add.reduceat(w_s, starts) if len(starts) else np.empty(0)

    cur = labels[gv]
    own_mask = gc == cur
    e_cur = np.zeros(g.n)
    e_cur[gv[own_mask]] = e_vc[own_mask]
    mx = q.fixed_max_w if q.fixed_max_w is not None \
        else float(g.weights.max(initial=0.0))

    # stay score: gain(v -> cur) with v's removal applied to cur's aggs
    verts = np.unique(gv)
    vcur = labels[verts]
    ctx_stay = QualityContext(
        dnc=e_cur[verts], degc=g.k[verts], wu=nodes_w[verts],
        self_v=selfw[verts],
        in_c=agg.in_[vcur] - (2.0 * e_cur[verts] + selfw[verts]),
        tot_c=agg.tot[vcur] - g.k[verts],
        w_c=agg.w[vcur] - nodes_w[verts],
        m2=m2, n=n_w, max_w=mx, kappa=kappa)
    thr = np.maximum(q.gain(ctx_stay), 0.0)

    cand = (~own_mask) & ((gc < cur) | (agg.size[gc] > 1)
                          | (agg.size[cur] > 1))
    gv_c, gc_c, e_c = gv[cand], gc[cand], e_vc[cand]
    if len(gv_c) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ctx_cand = QualityContext(
        dnc=e_c, degc=g.k[gv_c], wu=nodes_w[gv_c], self_v=selfw[gv_c],
        in_c=agg.in_[gc_c], tot_c=agg.tot[gc_c], w_c=agg.w[gc_c],
        m2=m2, n=n_w, max_w=mx, kappa=kappa)
    gains = q.gain(ctx_cand)
    v_f, c_f, g_f = _segment_argmax(gv_c, gc_c, gains)
    pos = np.searchsorted(verts, v_f)
    ok = g_f > thr[pos]
    return v_f[ok], c_f[ok]


def one_level_q(g: CSRGraph, labels: np.ndarray, q: QualityFn,
                nodes_w: np.ndarray, min_gain: float,
                subset: np.ndarray | None = None) -> bool:
    n_slots = max(g.n, int(labels.max(initial=0)) + 1)
    selfw = selfloop_weights(g)
    m2 = float(g.k.sum())
    n_w = float(nodes_w.sum())
    deg = g.degrees
    buckets = []
    for lo, hi in zip(BUCKET_BOUNDS[:-1], BUCKET_BOUNDS[1:]):
        sel = (deg > lo) & (deg <= hi)
        if subset is not None:
            sel &= subset
        sel_idx = np.flatnonzero(sel)
        if len(sel_idx):
            buckets.append((sel_idx, _bucket_slice(g, sel_idx)))
    changed = False
    total_gain = min_gain
    q_before = q.quality(g, labels, nodes_w)
    while total_gain >= min_gain:
        for sel_idx, slc in buckets:
            agg = community_aggregates(g, labels, nodes_w, n_slots)
            movers, newc = _bucket_moves_q(
                g, sel_idx, labels, agg, q, nodes_w, selfw, m2, n_w,
                agg.kappa, slc)
            if len(movers):
                labels[movers] = newc
        q_after = q.quality(g, labels, nodes_w)
        total_gain = q_after - q_before
        changed = changed or (total_gain > 0)
        q_before = q_after
    return changed


def contract_q(g: CSRGraph, labels: np.ndarray, nodes_w: np.ndarray
               ) -> tuple[np.ndarray, CSRGraph, np.ndarray]:
    """Contraction carrying node weights (louvain.cpp:260-333)."""
    from .louvain import contract
    new_labels, ng = contract(g, labels)
    new_w = np.bincount(new_labels, weights=nodes_w, minlength=ng.n)
    return new_labels, ng, new_w


def louvain_q(g: CSRGraph, q_id: int, *, alpha: float = 0.5,
              kmin: int = 1, min_gain: float = DEFAULT_MIN_GAIN,
              init_labels: np.ndarray | None = None,
              subset: np.ndarray | None = None,
              max_levels: int = 100) -> dict:
    """Full variant Louvain: preprocessing + level loop.  Returns the
    same dict shape as oracle.louvain plus ``q_id``/``graph`` (the
    possibly reweighted level-0 graph)."""
    g, q = prepare_graph(g, q_id, alpha=alpha, kmin=kmin)
    res = louvain_q_prepared(g, q, min_gain=min_gain,
                             init_labels=init_labels, subset=subset,
                             max_levels=max_levels)
    res["q_id"] = q_id
    res["graph"] = g
    return res


def louvain_q_prepared(g: CSRGraph, q: QualityFn, *,
                       nodes_w: np.ndarray | None = None,
                       min_gain: float = DEFAULT_MIN_GAIN,
                       init_labels: np.ndarray | None = None,
                       subset: np.ndarray | None = None,
                       max_levels: int = 100) -> dict:
    """Level loop on an already-prepared graph (deeper levels re-enter
    here from the distributed engine with nbc > 0 semantics: no
    preprocessing, max_w pinned in ``q``)."""
    once_more = init_labels is not None
    labels = (np.arange(g.n, dtype=np.int64) if init_labels is None
              else init_labels.astype(np.int64).copy())
    nodes_w = np.ones(g.n) if nodes_w is None else nodes_w.astype(np.float64)
    orig = np.arange(g.n, dtype=np.int64)
    cur_g = g
    q_traj: list[float] = []
    level_maps: list[np.ndarray] = []
    final_q = None
    for level in range(max_levels):
        sub = subset if level == 0 else None
        changed = one_level_q(cur_g, labels, q, nodes_w, min_gain,
                              subset=sub)
        final_q = q.quality(cur_g, labels, nodes_w)
        q_traj.append(final_q)
        if not changed and not once_more:
            break
        once_more = False
        new_labels, new_g, new_w = contract_q(cur_g, labels, nodes_w)
        level_maps.append(new_labels)
        orig = new_labels[orig]
        cur_g = new_g
        nodes_w = new_w
        labels = np.arange(cur_g.n, dtype=np.int64)
    return {
        "labels": labels[orig],
        "levels": level_maps,
        "modularity": final_q,     # generic quality value, keyed as the
        "quality": final_q,        # engine's result dict expects
        "q_trajectory": q_traj,
        "n_levels": len(level_maps),
    }
