"""Oracle kernel sanity + property tests (FIXTURES.md F3/F4).

These pin the semantics every distributed implementation must match.
No Ray needed.
"""

import itertools

import numpy as np
import pytest

from linkgraph.fixtures import toy
from linkgraph.oracle.algos import (connected_components, label_propagation,
                                    pagerank, triangle_count)
from linkgraph.oracle.dynamic import (apply_add, apply_del, canonical_labels,
                                      dynamic_louvain)
from linkgraph.oracle.graph import CSRGraph, dedup_sum, symmetrize
from linkgraph.oracle.louvain import (community_aggregates, contract,
                                      louvain, modularity, one_level)


def er_graph(n, p, seed):
    rng = np.random.RandomState(seed)
    a = rng.rand(n, n) < p
    a = np.triu(a, 1)
    s, d = np.nonzero(a)
    src = np.concatenate([s, d]).astype(np.int64)
    dst = np.concatenate([d, s]).astype(np.int64)
    w = np.ones(len(src))
    return src, dst, w


def planted_graph(n, blocks, p_in, p_out, seed):
    rng = np.random.RandomState(seed)
    a = rng.rand(n, n)
    blk = np.arange(n) % blocks
    same = blk[:, None] == blk[None, :]
    adj = np.where(same, a < p_in, a < p_out)
    adj = np.triu(adj, 1)
    s, d = np.nonzero(adj)
    src = np.concatenate([s, d]).astype(np.int64)
    dst = np.concatenate([d, s]).astype(np.int64)
    return src, dst, np.ones(len(src))


class TestGraphOps:
    def test_symmetrize_selfloop_single(self):
        src, dst, w = symmetrize(np.array([0, 1]), np.array([1, 1]),
                                 np.array([2.0, 3.0]))
        pairs = sorted(zip(src.tolist(), dst.tolist(), w.tolist()))
        assert pairs == [(0, 1, 2.0), (1, 0, 2.0), (1, 1, 3.0)]

    def test_dedup_sums_weights(self):
        src, dst, w = dedup_sum(np.array([0, 0, 1]), np.array([1, 1, 0]),
                                np.array([1.0, 2.0, 4.0]))
        assert list(zip(src.tolist(), dst.tolist(), w.tolist())) == \
            [(0, 1, 3.0), (1, 0, 4.0)]

    def test_csr_total_weight(self):
        src, dst, w = toy.base_edge_array()
        g = CSRGraph.from_edges(src, dst, w, n=toy.N_BASE_NODES)
        assert g.M == 18.0  # 18 unweighted edges
        assert g.n == 14
        assert g.k[3] == 0 and g.k[9] == 0  # isolated


class TestPageRank:
    def test_sums_to_one_and_matches_dense(self):
        src, dst, _ = er_graph(60, 0.1, 1)
        # use as a directed graph
        n = 60
        r, _ = pagerank(n, src, dst)
        assert abs(r.sum() - 1.0) < 1e-9
        # dense oracle-of-the-oracle
        A = np.zeros((n, n))
        A[src, dst] = 1.0  # deduped already
        outdeg = A.sum(axis=1)
        P = np.divide(A, outdeg[:, None], out=np.zeros_like(A),
                      where=outdeg[:, None] > 0)
        v = np.full(n, 1.0 / n)
        for _ in range(500):
            dang = v[outdeg == 0].sum()
            v = (1 - 0.85) / n + 0.85 * (P.T @ v + dang / n)
        assert np.allclose(r, v, atol=1e-8)

    def test_dangling(self):
        # 0 -> 1, 1 dangling
        r, _ = pagerank(2, np.array([0]), np.array([1]))
        assert abs(r.sum() - 1.0) < 1e-9
        assert r[1] > r[0]


class TestComponents:
    def test_toy_components(self):
        src, dst, _ = toy.base_edge_array()
        comp = connected_components(toy.N_BASE_NODES, src, dst)
        # {0,1,2,4,5,6,7,8}, {10..13}, singletons 3, 9
        assert comp[0] == 0 and comp[8] == 0
        assert comp[10] == 10 and comp[13] == 10
        assert comp[3] == 3 and comp[9] == 9
        assert len(np.unique(comp)) == 4

    def test_random_vs_bruteforce(self):
        src, dst, _ = er_graph(40, 0.05, 7)
        comp = connected_components(40, src, dst)
        # brute force via repeated BFS
        adj = {i: set() for i in range(40)}
        for s, d in zip(src, dst):
            adj[s].add(d)
        seen, want = {}, {}
        for i in range(40):
            if i in seen:
                continue
            stack, grp = [i], []
            while stack:
                v = stack.pop()
                if v in seen:
                    continue
                seen[v] = True
                grp.append(v)
                stack.extend(adj[v])
            for v in grp:
                want[v] = min(grp)
        assert [want[i] for i in range(40)] == comp.tolist()


class TestLPA:
    def test_two_cliques(self):
        # two triangles joined by one edge -> each keeps a label
        edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
        e = np.array(edges)
        src, dst, w = symmetrize(e[:, 0], e[:, 1], np.ones(len(e)))
        labels, _ = label_propagation(6, src, dst, w)
        assert len(set(labels[:3].tolist())) == 1
        assert len(set(labels[3:].tolist())) == 1


class TestTriangles:
    def test_known_counts(self):
        # K4 has 4 triangles
        e = np.array(list(itertools.combinations(range(4), 2)))
        src, dst, _ = symmetrize(e[:, 0], e[:, 1], np.ones(len(e)))
        assert triangle_count(4, src, dst) == 4

    def test_toy(self):
        src, dst, _ = toy.base_edge_array()
        # brute force
        n = toy.N_BASE_NODES
        adj = np.zeros((n, n), dtype=np.int64)
        adj[src, dst] = 1
        want = int(np.einsum("ij,jk,ki->", adj, adj, adj)) // 6
        assert triangle_count(n, src, dst) == want

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_vs_bruteforce(self, seed):
        src, dst, _ = er_graph(30, 0.2, seed)
        adj = np.zeros((30, 30), dtype=np.int64)
        adj[src, dst] = 1
        want = int(np.einsum("ij,jk,ki->", adj, adj, adj)) // 6
        assert triangle_count(30, src, dst) == want


class TestLouvain:
    def test_modularity_nondecreasing_and_positive_on_planted(self):
        src, dst, w = planted_graph(90, 3, 0.5, 0.02, 5)
        g = CSRGraph.from_edges(src, dst, w, n=90)
        res = louvain(g)
        q = res["q_trajectory"]
        assert all(b >= a - 1e-12 for a, b in zip(q, q[1:]))
        assert res["modularity"] > 0.4
        # planted blocks recovered exactly
        labels = canonical_labels(res["labels"])
        want = canonical_labels(np.arange(90) % 3)
        assert labels.tolist() == want.tolist()

    def test_contraction_preserves_modularity(self):
        src, dst, w = planted_graph(60, 3, 0.6, 0.05, 9)
        g = CSRGraph.from_edges(src, dst, w, n=60)
        labels = np.arange(60)
        one_level(g, labels, 1e-3)
        n_slots = max(g.n, labels.max() + 1)
        tot, _ = community_aggregates(g, labels, n_slots)
        q1 = modularity(g, labels, tot)
        new_labels, ng = contract(g, labels)
        singleton = np.arange(ng.n)
        tot2, _ = community_aggregates(ng, singleton, ng.n)
        q2 = modularity(ng, singleton, tot2)
        assert abs(q1 - q2) < 1e-12
        assert abs(g.M - ng.M) < 1e-9

    def test_isolated_nodes_never_move(self):
        src, dst, w = toy.base_edge_array()
        g = CSRGraph.from_edges(src, dst, w, n=14)
        res = louvain(g)
        labels = res["labels"]
        c = canonical_labels(labels)
        assert c[3] == 3 and c[9] == 9  # isolated stay singleton

    def test_toy_structure(self):
        src, dst, w = toy.base_edge_array()
        g = CSRGraph.from_edges(src, dst, w, n=14)
        res = louvain(g)
        c = canonical_labels(res["labels"])
        # the 10-13 clique-ish block is one community
        assert len(set(c[[10, 11, 12, 13]].tolist())) == 1
        assert res["modularity"] > 0.3


class TestDeltas:
    def test_apply_del_removes_both_directions(self):
        src, dst, w = toy.base_edge_array()
        s2, d2, w2, ne = apply_del(src, dst, w, np.array([0]), np.array([1]))
        assert len(s2) == len(src) - 2
        assert ne == 0
        pairs = set(zip(s2.tolist(), d2.tolist()))
        assert (0, 1) not in pairs and (1, 0) not in pairs

    def test_apply_del_counts_missing(self):
        src, dst, w = toy.base_edge_array()
        _, _, _, ne = apply_del(src, dst, w, np.array([0]), np.array([13]))
        assert ne == 2  # both directions missing

    def test_apply_add_no_dedup(self):
        src, dst, w = toy.base_edge_array()
        s2, d2, w2 = apply_add(src, dst, w, np.array([0]), np.array([1]),
                               np.array([1.0]))
        assert len(s2) == len(src) + 2  # duplicate edge appended (M1 quirk)

    def test_dynamic_toy_runs(self):
        src, dst, w = toy.base_edge_array()
        deltas = [
            {"del": toy.delta_arrays(0, "del"), "add": toy.delta_arrays(0, "add")},
            {"del": toy.delta_arrays(1, "del"), "add": toy.delta_arrays(1, "add")},
        ]
        recs = dynamic_louvain(src, dst, w, deltas)
        assert recs[0]["phase"] == "init"
        assert recs[-1]["n_nodes"] == 17  # nodes 14,15,16 added
        # after ts0 add: 3-9 connected -> same community
        add0 = [r for r in recs if r["ts"] == 0 and r["phase"] == "add"][0]
        c = canonical_labels(add0["labels"])
        assert c[3] == c[9]
        assert c[14] == c[15]
        # modularity stays sane
        for r in recs:
            assert -0.5 <= r["modularity"] <= 1.0

    def test_full_screen_equals_full_recompute_quality(self):
        # R = all (nodToEval_b, L9) dynamic step should reach the same
        # quality as a static recompute with init partition
        src, dst, w = planted_graph(60, 3, 0.5, 0.05, 11)
        g = CSRGraph.from_edges(src, dst, w, n=60)
        res = louvain(g)
        full = louvain(g, init_labels=res["labels"],
                       subset=np.ones(60, dtype=bool))
        assert full["modularity"] >= res["modularity"] - 1e-9


class TestKernelHelpers:
    """The shared vectorized kernels behind the sort-free tournaments and
    message splits."""

    def test_segment_argmax_matches_lexsort_tournament(self):
        from linkgraph.oracle.louvain import _segment_argmax
        rng = np.random.default_rng(7)
        for trial in range(20):
            n = rng.integers(1, 400)
            seg = np.sort(rng.integers(0, 40, n))
            # cand ascending within each segment (the kernels' invariant)
            cand = rng.integers(0, 1000, n)
            order = np.lexsort((cand, seg))
            seg, cand = seg[order], cand[order]
            # force plenty of score ties
            score = rng.integers(0, 4, n).astype(np.float64)
            v, c, s = _segment_argmax(seg, cand, score)
            # reference: lexsort((cand, -score, seg)), first per segment
            ordc = np.lexsort((cand, -score, seg))
            v_s, c_s, s_s = seg[ordc], cand[ordc], score[ordc]
            first = np.empty(len(v_s), dtype=bool)
            first[0] = True
            first[1:] = v_s[1:] != v_s[:-1]
            assert np.array_equal(v, v_s[first])
            assert np.array_equal(c, c_s[first])
            assert np.array_equal(s, s_s[first])

    def test_ranges_concat(self):
        from linkgraph.oracle.louvain import _ranges_concat
        starts = np.array([5, 0, 7], dtype=np.int64)
        counts = np.array([3, 0, 2], dtype=np.int64)
        want = np.array([5, 6, 7, 7, 8], dtype=np.int64)
        assert np.array_equal(_ranges_concat(starts, counts), want)

    def test_split_by_owner_sorted_fast_path_matches_general(self):
        from linkgraph.state.partition import split_by_owner
        rng = np.random.default_rng(3)
        bounds = np.array([0, 10, 25, 60, 100], dtype=np.int64)
        ids_unsorted = rng.integers(0, 100, 57).astype(np.int64)
        vals = rng.random(57)
        general = split_by_owner(ids_unsorted, bounds, vals)
        order = np.argsort(ids_unsorted, kind="stable")
        fast = split_by_owner(ids_unsorted[order], bounds, vals[order])
        for (gi, gv), (fi, fv) in zip(general, fast):
            assert np.array_equal(np.sort(gi), np.sort(fi))
            assert np.allclose(np.sort(gv), np.sort(fv))

    def test_from_edges_integral_vs_float_paths_same_graph(self):
        rng = np.random.default_rng(5)
        src = rng.integers(0, 30, 200)
        dst = rng.integers(0, 30, 200)
        w_int = rng.integers(1, 4, 200).astype(np.float64)
        g1 = CSRGraph.from_edges(src, dst, w_int, n=30)       # unstable
        g2 = CSRGraph.from_edges(src, dst, w_int + 0.5, n=30)  # stable
        # same structure; k sums differ by exactly 0.5*degree
        assert np.array_equal(g1.indptr, g2.indptr)
        deg = np.diff(g1.indptr)
        assert np.allclose(g2.k - g1.k, 0.5 * deg)
        # grouped neighbor ids identical per row
        for v in range(30):
            a0, a1 = g1.indptr[v], g1.indptr[v + 1]
            assert np.array_equal(np.sort(g1.indices[a0:a1]),
                                  np.sort(g2.indices[a0:a1]))
