"""Quality-function plugin surface (SURVEY.md §2.9) — the reference's
only user-extension point, re-expressed as vectorized NumPy kernels.

The reference dispatches on ``-q id`` over ten ``Quality`` subclasses
(``quality.h:56-84``, ``main_louvain.cpp:889-899, 998-1059``); each
defines ``gain(node, comm, dnc, degc)`` and a global ``quality()`` over
per-community accumulators ``in`` (intra-weight incl. self-loops),
``tot`` (weighted degrees), ``w`` (node weights) and ``kappa`` (count of
non-empty communities).  Formulas below are transcribed 1:1 from the
reference headers/sources (citations per class).  All kernels take whole
candidate ARRAYS, so the same code runs inside ``map_batches`` or a
shard actor; the accumulator columns are ordinary grouped sums (A4/A11)
at any scale.

``graph_weighting`` preprocessing (E9 CondorA ``condora.cpp:35-120``,
E10 DP ``dp.cpp:70-127``) is provided as vectorized edge-array
transforms.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..oracle.graph import CSRGraph


# --------------------------------------------------------------- aggregates

@dataclass
class QualityContext:
    """Per-candidate arrays + per-graph scalars a gain kernel may use.

    Arrays are aligned: entry i describes candidate move (v_i -> C_i).
    """
    dnc: np.ndarray         # e_{v->C} (self-loops excluded)
    degc: np.ndarray        # weighted degree k_v
    wu: np.ndarray          # node weight of v
    self_v: np.ndarray      # self-loop weight of v
    in_c: np.ndarray        # in[C]
    tot_c: np.ndarray       # tot[C]
    w_c: np.ndarray         # w[C]
    m2: float               # total_weight (= 2m)
    n: float                # sum of node weights
    max_w: float            # max edge weight (E6)
    kappa: int              # number of non-empty communities


@dataclass
class CommunityAggregates:
    in_: np.ndarray
    tot: np.ndarray
    w: np.ndarray
    size: np.ndarray

    @property
    def kappa(self) -> int:
        return int((self.size > 0).sum())


def community_aggregates(g: CSRGraph, labels: np.ndarray,
                         nodes_w: np.ndarray | None = None,
                         n_slots: int | None = None) -> CommunityAggregates:
    """in/tot/w/size per community — grouped sums (A4/A11/A6).

    ``in[C]`` counts both directions of every intra-community edge plus
    self-loops once, matching the reference accumulator shape
    ``in[comm] += 2*dnodecomm + selfloops`` (modularity.h:90)."""
    if nodes_w is None:
        nodes_w = np.ones(g.n)
    if n_slots is None:
        n_slots = max(g.n, int(labels.max(initial=0)) + 1)
    src = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    intra = labels[src] == labels[g.indices]
    in_ = np.bincount(labels[src[intra]], weights=g.weights[intra],
                      minlength=n_slots)
    tot = np.bincount(labels, weights=g.k, minlength=n_slots)
    w = np.bincount(labels, weights=nodes_w, minlength=n_slots)
    size = np.bincount(labels, minlength=n_slots)
    return CommunityAggregates(in_, tot, w, size)


def selfloop_weights(g: CSRGraph) -> np.ndarray:
    src = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    selfmask = src == g.indices
    return np.bincount(src[selfmask], weights=g.weights[selfmask],
                       minlength=g.n)


# ------------------------------------------------------------- the ten fns

class QualityFn:
    """Vectorized gain + global quality.  Subclasses transcribe one
    reference variant; the engine/oracle default is :class:`Modularity`
    (the only one the GPU path implements).

    Three surfaces so the same formulas run everywhere:

    - ``gain(ctx)``           — per-candidate move gains (arrays)
    - ``comm_terms(...)``     — per-community Q contributions + the
      non-empty mask; a distributed engine sums these per comm-owner
      shard (one float per shard crosses the wire)
    - ``finalize(s, ...)``    — global constants folded in

    ``fixed_max_w``: the reference computes ``max_w`` ONCE at level 0 and
    reuses it at contracted levels (``init_quality`` only calls
    ``max_weight()`` when ``nbc == 0``, main_louvain.cpp:998-1059); set
    this to pin it across levels.
    """

    id: int
    name: str
    fixed_max_w: float | None = None

    def gain(self, ctx: QualityContext) -> np.ndarray:
        raise NotImplementedError

    def comm_terms(self, in_: np.ndarray, tot: np.ndarray, w: np.ndarray,
                   *, m2: float, n: float, max_w: float
                   ) -> tuple[np.ndarray, np.ndarray]:
        """(per-community contributions, non-empty mask)."""
        raise NotImplementedError

    def finalize(self, s: float, *, m2: float, n: float, max_w: float,
                 kappa: int) -> float:
        raise NotImplementedError

    def quality(self, g: CSRGraph, labels: np.ndarray,
                nodes_w: np.ndarray | None = None) -> float:
        agg, _, m2, n, mx = self._ctxg(g, labels, nodes_w)
        terms, nz = self.comm_terms(agg.in_, agg.tot, agg.w,
                                    m2=m2, n=n, max_w=mx)
        return self.finalize(float(terms[nz].sum()), m2=m2, n=n, max_w=mx,
                             kappa=agg.kappa)

    # shared helpers -------------------------------------------------------
    def _ctxg(self, g, labels, nodes_w):
        agg = community_aggregates(g, labels, nodes_w)
        nw = np.ones(g.n) if nodes_w is None else nodes_w
        mx = (self.fixed_max_w if self.fixed_max_w is not None
              else float(g.weights.max(initial=0.0)))
        return agg, nw, float(g.k.sum()), float(nw.sum()), mx


class Modularity(QualityFn):
    """id 0, Newman–Girvan (modularity.h:96-114, modularity.cpp:71-91)."""
    id, name = 0, "Newman-Girvan Modularity"

    def gain(self, ctx):
        return ctx.dnc - ctx.tot_c * ctx.degc / ctx.m2

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        return in_ - tot ** 2 / m2, tot > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return s / m2


class Zahn(QualityFn):
    """id 1, Zahn–Condorcet (zahn.h:96-105, zahn.cpp:72-88)."""
    id, name = 1, "Zahn-Condorcet"

    def gain(self, ctx):
        return 2.0 * ctx.dnc - ctx.wu * ctx.w_c * ctx.max_w

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        return 2.0 * in_ - max_w * w ** 2, w > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return (s + n * n * max_w - m2) / (n * n * max_w)


class OwZad(QualityFn):
    """id 2, Owsiński–Zadrożny (owzad.h:99-107, owzad.cpp:73-89)."""
    id, name = 2, "Owsinski-Zadrozny"

    def __init__(self, alpha: float = 0.5):
        self.alpha = alpha

    def gain(self, ctx):
        return ctx.dnc - self.alpha * ctx.wu * ctx.w_c * ctx.max_w

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        return in_ - self.alpha * max_w * w ** 2, w > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return (s + self.alpha * (n * n * max_w - m2)) / (n * n * max_w)


class Goldberg(QualityFn):
    """id 3, Goldberg Density (goldberg.h:95-118, goldberg.cpp:69-86)."""
    id, name = 3, "Goldberg Density"

    def gain(self, ctx):
        empty = ctx.w_c == 0.0
        num = 2.0 * ctx.dnc + ctx.self_v
        with np.errstate(divide="ignore", invalid="ignore"):
            g_nonempty = (num + ctx.in_c) / (2.0 * (ctx.w_c + ctx.wu)) \
                - ctx.in_c / (2.0 * ctx.w_c)
        return np.where(empty, num / (2.0 * ctx.wu), g_nonempty)

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = in_ / (2.0 * w)
        return t, w > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return s / (n * max_w)


class CondorA(QualityFn):
    """id 4, A-weighted Condorcet (condora.h:95-99, condora.cpp:35-125);
    requires :func:`condora_weighting` + E4 self-loops first."""
    id, name = 4, "A-weighted Condorcet"

    def __init__(self, sum_se: float = 0.0):
        self.sum_se = sum_se

    def gain(self, ctx):
        return ctx.dnc.copy()

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        return in_, np.ones(len(in_), dtype=bool)

    def finalize(self, s, *, m2, n, max_w, kappa):
        return (s + self.sum_se) / (n * n)


class DevInd(QualityFn):
    """id 5, Deviation to Indetermination (devind.h:94-107,
    devind.cpp:72-95)."""
    id, name = 5, "Deviation to Indetermination"

    def gain(self, ctx):
        return ctx.dnc - (ctx.tot_c * ctx.wu + ctx.degc * ctx.w_c) / ctx.n \
            + ctx.m2 * ctx.wu * ctx.w_c / (ctx.n * ctx.n)

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        return (in_ - 2.0 * tot * w / n + w ** 2 * (m2 / (n * n))), w > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return s / m2


class DevUni(QualityFn):
    """id 6, Deviation to Uniformity (devuni.h:93-105, devuni.cpp:69-90)."""
    id, name = 6, "Deviation to Uniformity"

    def gain(self, ctx):
        return ctx.dnc - ctx.m2 * ctx.wu * ctx.w_c / (ctx.n * ctx.n)

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        return in_ - w ** 2 * (m2 / (n * n)), w > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return s / m2


class DP(QualityFn):
    """id 7, Profile Difference (dp.h:109-132, dp.cpp:55-130); requires
    :func:`dp_weighting` first (sum_sq = its return)."""
    id, name = 7, "Profile Difference"

    def __init__(self, sum_sq: float = 0.0):
        self.sum_sq = sum_sq

    def gain(self, ctx):
        empty = ctx.w_c == 0.0
        num = 2.0 * ctx.dnc + ctx.self_v
        with np.errstate(divide="ignore", invalid="ignore"):
            g_nonempty = (ctx.in_c + num) / (ctx.w_c + ctx.wu) \
                - ctx.in_c / ctx.w_c
        return np.where(empty, num / ctx.wu - 0.5, g_nonempty)

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = 2.0 * in_ / w
        return t, w > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return (s - self.sum_sq - kappa) / (n * n * max_w)


class ShiMalik(QualityFn):
    """id 8, Shi–Malik ratio-cut (shimalik.h:103-128,
    shimalik.cpp:71-88)."""
    id, name = 8, "Shi-Malik"

    def __init__(self, kmin: int = 2):
        self.kmin = kmin

    def gain(self, ctx):
        empty = ctx.tot_c == 0.0
        num = 2.0 * ctx.dnc + ctx.self_v
        with np.errstate(divide="ignore", invalid="ignore"):
            g_nonempty = (ctx.in_c + num) / (ctx.tot_c + ctx.degc) \
                - ctx.in_c / ctx.tot_c
        out = np.where(empty, num / ctx.degc - 1.0, g_nonempty)
        if ctx.kappa < self.kmin:
            return np.zeros_like(out)
        return out

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = in_ / tot
        return t, tot > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return (s - kappa) / n


class BalMod(QualityFn):
    """id 9, Balanced Modularity (balmod.h:100-120, balmod.cpp:71-90)."""
    id, name = 9, "Balanced Modularity"

    def gain(self, ctx):
        n, mx, m2 = ctx.n, ctx.max_w, ctx.m2
        g0 = 2.0 * ctx.dnc - ctx.degc * ctx.tot_c / m2 \
            - ctx.wu * ctx.w_c * mx
        g0 += ((n * ctx.wu * mx - ctx.degc) * (n * ctx.w_c * mx - ctx.tot_c)
               ) / (n * n * mx - m2)
        return g0

    def comm_terms(self, in_, tot, w, *, m2, n, max_w):
        t = (2.0 * in_ - tot ** 2 / m2 - max_w * w ** 2
             + (n * w * max_w - tot) ** 2 / (n * n * max_w - m2))
        return t, w > 0

    def finalize(self, s, *, m2, n, max_w, kappa):
        return s / (n * n * max_w)


QUALITY_FUNCTIONS: dict[int, type[QualityFn]] = {
    0: Modularity, 1: Zahn, 2: OwZad, 3: Goldberg, 4: CondorA,
    5: DevInd, 6: DevUni, 7: DP, 8: ShiMalik, 9: BalMod,
}


# --------------------------------------------- E9/E10 graph reweightings

def dp_weighting(g: CSRGraph) -> tuple[CSRGraph, float]:
    """E10 (dp.cpp:70-127): w'_uv = 2 w_uv / (deg(u)+deg(v)); returns
    (reweighted graph, sum of squared new weights)."""
    src = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    d_u = g.degrees[src].astype(np.float64)
    d_v = g.degrees[g.indices].astype(np.float64)
    new_w = 2.0 * g.weights / (d_u + d_v)
    ng = CSRGraph.from_edges(src, g.indices, new_w, n=g.n)
    return ng, float((new_w ** 2).sum())


def condora_weighting(g: CSRGraph) -> tuple[CSRGraph, float]:
    """E9 (condora.cpp:58-120): w'_uv = 4w/(d(u)+d(v)) − self(u)/2d(u)
    − self(v)/2d(v); returns (reweighted graph, Σ(tmp − aux))."""
    src = np.repeat(np.arange(g.n, dtype=np.int64), g.degrees)
    d_u = g.degrees[src].astype(np.float64)
    d_v = g.degrees[g.indices].astype(np.float64)
    self_w = selfloop_weights(g)
    aux = 2.0 * g.weights / (d_u + d_v)
    tmp = self_w[src] / (2.0 * d_u) + self_w[g.indices] / (2.0 * d_v)
    new_w = 2.0 * aux - tmp
    ng = CSRGraph.from_edges(src, g.indices, new_w, n=g.n)
    return ng, float((tmp - aux).sum())
