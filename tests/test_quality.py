"""Quality-function plugin tests — naive per-community Python loops
reimplement each reference formula independently and must match the
vectorized kernels (no Ray)."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.fixtures.toy import base_edge_array
from linkgraph.functions.quality import (
    QUALITY_FUNCTIONS,
    BalMod,
    CondorA,
    DP,
    DevInd,
    DevUni,
    Goldberg,
    Modularity,
    OwZad,
    QualityContext,
    ShiMalik,
    Zahn,
    community_aggregates,
    condora_weighting,
    dp_weighting,
    selfloop_weights,
)
from linkgraph.oracle.graph import CSRGraph


def _rand_graph(seed=7, n=40, p=0.15):
    rng = np.random.default_rng(seed)
    a = rng.random((n, n)) < p
    a |= a.T
    np.fill_diagonal(a, rng.random(n) < 0.1)
    src, dst = np.nonzero(a)
    w = np.round(rng.random(len(src)) * 3 + 0.5, 3)
    # symmetrize weights
    wmat = np.zeros((n, n))
    wmat[src, dst] = w
    wmat = np.maximum(wmat, wmat.T)
    src, dst = np.nonzero(wmat)
    return CSRGraph.from_edges(src, dst, wmat[src, dst], n=n), wmat


def _labels(g, seed=3, k=6):
    rng = np.random.default_rng(seed)
    return rng.integers(0, k, g.n).astype(np.int64)


def _naive_aggs(wmat, labels):
    n = len(wmat)
    comms = np.unique(labels)
    in_, tot, w, size = {}, {}, {}, {}
    deg = (wmat > 0).sum(axis=1)
    k = wmat.sum(axis=1)
    for c in comms:
        members = np.flatnonzero(labels == c)
        sub = wmat[np.ix_(members, members)]
        in_[c] = sub.sum()  # both directions + self once (diag counted once)
        tot[c] = k[members].sum()
        w[c] = float(len(members))
        size[c] = len(members)
    return in_, tot, w, size, k, deg


def test_aggregates_match_naive():
    g, wmat = _rand_graph()
    labels = _labels(g)
    agg = community_aggregates(g, labels)
    in_n, tot_n, w_n, _, _, _ = _naive_aggs(wmat, labels)
    for c in np.unique(labels):
        assert np.isclose(agg.in_[c], in_n[c])
        assert np.isclose(agg.tot[c], tot_n[c])
        assert np.isclose(agg.w[c], w_n[c])


NAIVE = {}


def naive_quality(fn, wmat, labels):
    in_, tot, w, size, k, deg = _naive_aggs(wmat, labels)
    m2 = k.sum()
    n = float(len(wmat))  # node weights all 1
    mx = wmat.max()
    comms = np.unique(labels)
    kappa = len(comms)
    if isinstance(fn, Modularity):
        return sum(in_[c] - tot[c] ** 2 / m2 for c in comms if tot[c] > 0) / m2
    if isinstance(fn, Zahn):
        q = sum(2 * in_[c] - mx * w[c] ** 2 for c in comms if w[c] > 0)
        return (q + n * n * mx - m2) / (n * n * mx)
    if isinstance(fn, OwZad):
        q = sum(in_[c] - fn.alpha * mx * w[c] ** 2 for c in comms if w[c] > 0)
        return (q + fn.alpha * (n * n * mx - m2)) / (n * n * mx)
    if isinstance(fn, Goldberg):
        return sum(in_[c] / (2 * w[c]) for c in comms if w[c] > 0) / (n * mx)
    if isinstance(fn, CondorA):
        return (sum(in_[c] for c in comms) + fn.sum_se) / (n * n)
    if isinstance(fn, DevInd):
        q = sum(in_[c] - 2 * tot[c] * w[c] / n for c in comms if w[c] > 0)
        q += sum(w[c] ** 2 for c in comms if w[c] > 0) * m2 / (n * n)
        return q / m2
    if isinstance(fn, DevUni):
        q = sum(in_[c] for c in comms if w[c] > 0)
        q -= sum(w[c] ** 2 for c in comms if w[c] > 0) * m2 / (n * n)
        return q / m2
    if isinstance(fn, DP):
        q = sum(2 * in_[c] / w[c] for c in comms if w[c] > 0)
        return (q - fn.sum_sq - kappa) / (n * n * mx)
    if isinstance(fn, ShiMalik):
        q = sum(in_[c] / tot[c] for c in comms if tot[c] > 0)
        return (q - kappa) / n
    if isinstance(fn, BalMod):
        q = sum(2 * in_[c] - tot[c] ** 2 / m2 - mx * w[c] ** 2
                + (n * w[c] * mx - tot[c]) ** 2 / (n * n * mx - m2)
                for c in comms if w[c] > 0)
        return q / (n * n * mx)
    raise AssertionError(fn)


@pytest.mark.parametrize("qid", sorted(QUALITY_FUNCTIONS))
def test_quality_matches_naive(qid):
    g, wmat = _rand_graph()
    labels = _labels(g)
    kwargs = {}
    if qid == 4:
        kwargs = {"sum_se": 1.234}
    if qid == 7:
        kwargs = {"sum_sq": 0.567}
    fn = QUALITY_FUNCTIONS[qid](**kwargs)
    got = fn.quality(g, labels)
    want = naive_quality(fn, wmat, labels)
    assert np.isclose(got, want, rtol=1e-12), (qid, got, want)


def test_gain_vectorized_matches_scalar_modularity():
    g, wmat = _rand_graph()
    labels = _labels(g)
    agg = community_aggregates(g, labels)
    m2 = float(g.k.sum())
    # candidate: vertex 0 -> community of vertex 1
    v, c = 0, int(labels[1])
    dnc = wmat[v][labels == c].sum() - (wmat[v, v] if labels[v] == c else 0)
    ctx = QualityContext(
        dnc=np.array([dnc]), degc=np.array([g.k[v]]),
        wu=np.array([1.0]), self_v=np.array([wmat[v, v]]),
        in_c=np.array([agg.in_[c]]), tot_c=np.array([agg.tot[c]]),
        w_c=np.array([agg.w[c]]), m2=m2, n=float(g.n),
        max_w=float(wmat.max()), kappa=agg.kappa)
    got = Modularity().gain(ctx)[0]
    want = dnc - agg.tot[c] * g.k[v] / m2
    assert np.isclose(got, want)


def test_dp_weighting():
    g, wmat = _rand_graph()
    ng, sum_sq = dp_weighting(g)
    # spot check one edge
    src = np.repeat(np.arange(g.n), g.degrees)
    u, v, w0 = src[0], g.indices[0], g.weights[0]
    expect = 2.0 * w0 / (g.degrees[u] + g.degrees[v])
    nsrc = np.repeat(np.arange(ng.n), ng.degrees)
    pos = np.flatnonzero((nsrc == u) & (ng.indices == v))[0]
    assert np.isclose(ng.weights[pos], expect)
    assert sum_sq > 0


def test_condora_weighting_runs():
    g, wmat = _rand_graph()
    ng, sum_se = condora_weighting(g)
    assert ng.n == g.n
    assert np.isfinite(sum_se)


def test_toy_example_modularity_consistency():
    src, dst, w = base_edge_array()
    g = CSRGraph.from_edges(src, dst, w)
    labels = np.arange(g.n, dtype=np.int64)
    # singleton partition: in = selfloops (none on toy), Q = -sum k^2/m2^2
    q = Modularity().quality(g, labels)
    m2 = g.k.sum()
    want = float(-(g.k ** 2).sum() / (m2 * m2))
    assert np.isclose(q, want)
