"""Distributed engine vs oracle parity (FIXTURES.md F4 gates):
PageRank allclose 1e-6 (actually exact-ish), CC/LPA/Louvain labels exact,
triangles exact, modularity trajectory parity."""

import numpy as np
import pytest

from linkgraph.fixtures import toy
from linkgraph.oracle import louvain as olv
from linkgraph.oracle.algos import (connected_components, label_propagation,
                                    pagerank, triangle_count)
from linkgraph.oracle.dynamic import canonical_labels
from linkgraph.oracle.graph import CSRGraph

from test_oracle import er_graph, planted_graph


@pytest.fixture(scope="module")
def engine_mod(ray_session):
    from linkgraph.state.engine import GraphEngine
    return GraphEngine


def directed_er(n, p, seed):
    rng = np.random.RandomState(seed)
    a = (rng.rand(n, n) < p) & ~np.eye(n, dtype=bool)
    s, d = np.nonzero(a)
    return s.astype(np.int64), d.astype(np.int64)


class TestPageRankEngine:
    @pytest.mark.parametrize("n_parts", [2, 4])
    def test_matches_oracle(self, engine_mod, n_parts):
        n = 300
        src, dst = directed_er(n, 0.02, 3)
        eng = engine_mod.from_arrays(src, dst, n=n, n_parts=n_parts,
                                     name=f"pr{n_parts}")
        out = eng.pagerank(tol=1e-12)
        tbl = eng.pagerank_result().to_pandas().sort_values("node")
        want, _ = pagerank(n, src, dst, tol=1e-12)
        assert np.allclose(tbl["rank"].to_numpy(), want, atol=1e-9)
        assert abs(tbl["rank"].sum() - 1.0) < 1e-9
        eng.shutdown()


class TestWarmPageRank:
    def test_incremental_after_delta(self, engine_mod):
        """Incremental PageRank: warm start from the previous rank
        vector after a delta batch — identical fixed point (structure
        terms re-derived from the mutated CSR), fewer iterations."""
        rng = np.random.RandomState(7)
        n = 2000
        src = rng.randint(0, n, 60000).astype(np.int64)
        dst = rng.randint(0, n, 60000).astype(np.int64)
        keep = src != dst
        eng = engine_mod.from_arrays(src[keep], dst[keep], n=n,
                                     n_parts=3, name="warm_pr")
        eng.pagerank(tol=1e-12)
        eng.apply_delta_batch(add_src=np.array([1, 2], np.int64),
                              add_dst=np.array([3, 4], np.int64),
                              add_w=np.ones(2))
        r_warm = eng.pagerank(tol=1e-12, warm=True)
        warm = (eng.pagerank_result().to_pandas().sort_values("node")
                ["rank"].to_numpy())
        r_cold = eng.pagerank(tol=1e-12)
        cold = (eng.pagerank_result().to_pandas().sort_values("node")
                ["rank"].to_numpy())
        assert np.allclose(warm, cold, atol=1e-10)
        assert abs(warm.sum() - 1.0) < 1e-9
        assert r_warm["iterations"] <= r_cold["iterations"]
        eng.shutdown()


class TestCCEngine:
    def test_matches_oracle(self, engine_mod):
        src, dst, w = er_graph(200, 0.008, 5)
        eng = engine_mod.from_arrays(src, dst, w, n=200, n_parts=3, name="cc")
        eng.connected_components()
        got = eng.cc_result().to_pandas().sort_values("node")["comp"].to_numpy()
        want = connected_components(200, src, dst)
        assert got.tolist() == want.tolist()
        eng.shutdown()

    def test_toy(self, engine_mod):
        src, dst, w = toy.base_edge_array()
        eng = engine_mod.from_arrays(src, dst, w, n=14, n_parts=2, name="cct")
        eng.connected_components()
        got = eng.cc_result().to_pandas().sort_values("node")["comp"].to_numpy()
        assert got.tolist() == connected_components(14, src, dst).tolist()
        eng.shutdown()


class TestLPAEngine:
    def test_matches_oracle(self, engine_mod):
        src, dst, w = planted_graph(120, 4, 0.4, 0.02, 8)
        eng = engine_mod.from_arrays(src, dst, w, n=120, n_parts=3, name="lpa")
        eng.label_propagation(max_iter=20)
        got = eng.lpa_result().to_pandas().sort_values("node")["label"].to_numpy()
        want, _ = label_propagation(120, src, dst, w, max_iter=20)
        assert got.tolist() == want.tolist()
        eng.shutdown()


class TestTrianglesEngine:
    @pytest.mark.parametrize("seed", [1, 4])
    def test_matches_oracle(self, engine_mod, seed):
        src, dst, w = er_graph(150, 0.05, seed)
        eng = engine_mod.from_arrays(src, dst, w, n=150, n_parts=3,
                                     name=f"tri{seed}")
        got = eng.triangles()
        want = triangle_count(150, src, dst)
        assert got == want
        eng.shutdown()


def oracle_round1(g) -> np.ndarray:
    """One synchronous bucketed move round from singletons — the exact
    first-round slice of olv.one_level (same kernels, same bucket
    order, same per-bucket aggregate rebuild)."""
    labels = np.arange(g.n, dtype=np.int64)
    tot, size = olv.community_aggregates(g, labels, g.n)
    deg = g.degrees
    for lo, hi in zip(olv.BUCKET_BOUNDS[:-1], olv.BUCKET_BOUNDS[1:]):
        sel = np.flatnonzero((deg > lo) & (deg <= hi))
        if not len(sel):
            continue
        movers, newc = olv._bucket_moves(g, sel, labels, tot, size)
        if len(movers):
            labels[movers] = newc
            tot = np.bincount(labels, weights=g.k, minlength=g.n)
            size = np.bincount(labels, minlength=g.n)
    return labels


class TestLouvainRound1:
    @pytest.mark.parametrize("n_parts,seed", [(2, 7), (3, 11), (4, 23)])
    def test_matches_oracle_exactly(self, engine_mod, n_parts, seed):
        src, dst, w = planted_graph(150, 5, 0.45, 0.02, seed)
        g = CSRGraph.from_edges(src, dst, w, n=150)
        want = oracle_round1(g)
        eng = engine_mod.from_arrays(src, dst, w, n=150, n_parts=n_parts,
                                     name=f"lvr1_{n_parts}_{seed}")
        got = (eng.louvain_round1().to_pandas().sort_values("node")
               ["comm"].to_numpy())
        assert got.tolist() == want.tolist()  # raw ids, bit-exact
        eng.shutdown()


def oracle_q_round1(g, q_id: int) -> np.ndarray:
    """First round of oracle/qlouvain.one_level_q from singletons."""
    from linkgraph.functions.quality import (community_aggregates,
                                             selfloop_weights)
    from linkgraph.oracle import qlouvain as qlv
    q = qlv.make_quality(q_id)
    q.fixed_max_w = float(g.weights.max(initial=0.0))
    nodes_w = np.ones(g.n)
    labels = np.arange(g.n, dtype=np.int64)
    selfw = selfloop_weights(g)
    m2 = float(g.k.sum())
    n_w = float(nodes_w.sum())
    deg = g.degrees
    for lo, hi in zip(olv.BUCKET_BOUNDS[:-1], olv.BUCKET_BOUNDS[1:]):
        sel = np.flatnonzero((deg > lo) & (deg <= hi))
        if not len(sel):
            continue
        agg = community_aggregates(g, labels, nodes_w, g.n)
        movers, newc = qlv._bucket_moves_q(
            g, sel, labels, agg, q, nodes_w, selfw, m2, n_w, agg.kappa,
            qlv._bucket_slice(g, sel))
        if len(movers):
            labels[movers] = newc
    return labels


class TestQualityRound1:
    @pytest.mark.parametrize("q_id,n_parts", [(1, 2), (1, 3), (5, 2)])
    def test_matches_oracle_exactly(self, engine_mod, q_id, n_parts):
        src, dst, w = planted_graph(150, 5, 0.45, 0.02, 13)
        g = CSRGraph.from_edges(src, dst, w, n=150)
        want = oracle_q_round1(g, q_id)
        eng = engine_mod.from_arrays(src, dst, w, n=150, n_parts=n_parts,
                                     name=f"qr1_{q_id}_{n_parts}")
        got = (eng.louvain_quality_round1(q_id).to_pandas()
               .sort_values("node")["comm"].to_numpy())
        assert got.tolist() == want.tolist()
        eng.shutdown()


class TestLouvainEngine:
    @pytest.mark.parametrize("n_parts", [2, 4])
    def test_planted_matches_oracle(self, engine_mod, n_parts):
        src, dst, w = planted_graph(150, 5, 0.45, 0.02, 7)
        g = CSRGraph.from_edges(src, dst, w, n=150)
        want = olv.louvain(g)
        eng = engine_mod.from_arrays(src, dst, w, n=150, n_parts=n_parts,
                                     name=f"lv{n_parts}")
        res = eng.louvain()
        assert abs(res["modularity"] - want["modularity"]) < 1e-9
        got = eng.louvain_result().to_pandas().sort_values("node")["comm"].to_numpy()
        assert canonical_labels(got).tolist() == \
            canonical_labels(want["labels"]).tolist()
        # Q trajectories agree level-by-level
        for a, b in zip(res["q_trajectory"], want["q_trajectory"]):
            assert abs(a - b) < 1e-9
        eng.shutdown()

    def test_toy_matches_oracle(self, engine_mod):
        src, dst, w = toy.base_edge_array()
        g = CSRGraph.from_edges(src, dst, w, n=14)
        want = olv.louvain(g)
        eng = engine_mod.from_arrays(src, dst, w, n=14, n_parts=2, name="lvt")
        res = eng.louvain()
        assert abs(res["modularity"] - want["modularity"]) < 1e-12
        got = eng.louvain_result().to_pandas().sort_values("node")["comm"].to_numpy()
        assert canonical_labels(got).tolist() == \
            canonical_labels(want["labels"]).tolist()
        eng.shutdown()

    @pytest.mark.parametrize("n_parts", [2, 3])
    def test_distributed_child_contraction(self, engine_mod, n_parts):
        """SMALL_CONTRACT_ROWS = 0 forces every contracted level through
        the distributed child engine; results must equal the oracle (and
        hence the driver-continuation path) at any parallelism — the
        invariant the P-invariant branch decision relies on."""
        src, dst, w = planted_graph(150, 5, 0.45, 0.02, 7)
        g = CSRGraph.from_edges(src, dst, w, n=150)
        want = olv.louvain(g)
        eng = engine_mod.from_arrays(src, dst, w, n=150, n_parts=n_parts,
                                     name=f"lvc{n_parts}")
        eng.SMALL_CONTRACT_ROWS = 0
        res = eng.louvain()
        assert abs(res["modularity"] - want["modularity"]) < 1e-9
        got = eng.louvain_result().to_pandas() \
            .sort_values("node")["comm"].to_numpy()
        assert canonical_labels(got).tolist() == \
            canonical_labels(want["labels"]).tolist()
        eng.shutdown()


class TestCheckpointResume:
    def test_pagerank_resume(self, engine_mod, tmp_path):
        n = 200
        src, dst = directed_er(n, 0.03, 11)
        eng = engine_mod.from_arrays(src, dst, n=n, n_parts=2, name="ck")
        eng.pagerank(tol=0.0, max_iter=5, checkpoint_every=5,
                     ckpt_dir=str(tmp_path))
        latest = eng.latest_checkpoint(str(tmp_path))
        assert latest is not None and latest[0] == 5
        # fresh engine resumes from the checkpoint and continues
        eng2 = engine_mod.from_arrays(src, dst, n=n, n_parts=2, name="ck")
        import ray
        ray.get([a.pagerank_init.remote(0.85) for a in eng2.actors])
        assert eng2.restore(str(tmp_path), 5, ["rank"])
        eng2.pagerank(tol=1e-12, max_iter=200, start_iter=5)
        got = eng2.pagerank_result().to_pandas().sort_values("node")["rank"].to_numpy()
        want, _ = pagerank(n, src, dst, tol=1e-12)
        assert np.allclose(got, want, atol=1e-9)
        eng.shutdown()
        eng2.shutdown()


class TestHubSplitLouvain:
    """The Louvain hub split (fragment partial e_{v,C} sums) must be
    indistinguishable from the unsplit path and from the oracle."""

    @staticmethod
    def hub_graph(n=1500, seed=9):
        rng = np.random.RandomState(seed)
        # planted blocks + 3 mega-hubs (degree >> HUB_DEGREE_FACTOR*avg)
        block = n // 5
        src, dst = [], []
        for _ in range(n * 5):
            u = rng.randint(0, n)
            v = ((u // block) * block + rng.randint(0, block)
                 if rng.rand() < 0.8 else rng.randint(0, n))
            if u != v:
                src.append(u)
                dst.append(v)
        for hub in (7, 400, 1100):
            tgts = rng.choice(n, 700, replace=False)
            for v in tgts:
                if v != hub:
                    src.append(hub)
                    dst.append(v)
        s = np.array(src + dst, dtype=np.int64)
        d = np.array(dst + src, dtype=np.int64)
        return s, d

    def test_split_matches_unsplit_and_oracle(self, engine_mod, ray_session):
        import pyarrow as pa
        import ray.data as rd

        s, d = self.hub_graph()
        n = 1500
        ds = rd.from_arrow(pa.table({"src": s, "dst": d})) \
            .repartition(8).materialize()

        eng_split = engine_mod.from_dataset(ds, n_nodes=n, n_parts=3,
                                            name="hub_on", split_hubs=True)
        assert eng_split.has_frags, "fixture must actually trigger the split"
        eng_plain = engine_mod.from_dataset(ds, n_nodes=n, n_parts=3,
                                            name="hub_off",
                                            split_hubs=False)
        res_s = eng_split.louvain()
        res_p = eng_plain.louvain()
        lab_s = eng_split.louvain_result().to_pandas() \
            .sort_values("node")["comm"].to_numpy()
        lab_p = eng_plain.louvain_result().to_pandas() \
            .sort_values("node")["comm"].to_numpy()

        g = CSRGraph.from_edges(s, d, np.ones(len(s)), n=n)
        want = olv.louvain(g)

        assert abs(res_s["modularity"] - want["modularity"]) < 1e-12
        assert abs(res_p["modularity"] - want["modularity"]) < 1e-12
        assert np.array_equal(lab_s, lab_p)
        assert np.array_equal(lab_s, want["labels"])

        # PageRank on the same split engine still matches the oracle
        eng_split.pagerank(tol=1e-12)
        pr = eng_split.pagerank_result().to_pandas() \
            .sort_values("node")["rank"].to_numpy()
        want_pr, _ = pagerank(n, s, d, tol=1e-12)
        assert np.allclose(pr, want_pr, atol=1e-9)
        eng_split.shutdown()
        eng_plain.shutdown()


def hits_oracle(n, src, dst, iters):
    """NumPy HITS with L1 normalization per half-step (distinct edges)."""
    import pandas as pd
    e = pd.DataFrame({"s": src, "d": dst}).drop_duplicates()
    s, d = e["s"].to_numpy(), e["d"].to_numpy()
    hub = np.full(n, 1.0 / n)
    for _ in range(iters):
        auth = np.bincount(d, weights=hub[s], minlength=n)
        auth /= auth.sum()
        hub = np.bincount(s, weights=auth[d], minlength=n)
        hub /= hub.sum()
    return auth, hub


class TestHITSEngine:
    @pytest.mark.parametrize("n_parts", [2, 4])
    def test_matches_oracle(self, engine_mod, n_parts):
        n = 300
        src, dst = directed_er(n, 0.02, 7)
        eng = engine_mod.from_arrays(src, dst, n=n, n_parts=n_parts,
                                     name=f"hits{n_parts}")
        eng.hits(max_iter=12)
        tbl = eng.hits_result().to_pandas().sort_values("node")
        auth, hub = hits_oracle(n, src, dst, 12)
        assert np.allclose(tbl["auth"].to_numpy(), auth, atol=1e-12)
        assert np.allclose(tbl["hub"].to_numpy(), hub, atol=1e-12)
        assert abs(tbl["auth"].sum() - 1.0) < 1e-9
        assert abs(tbl["hub"].sum() - 1.0) < 1e-9
        eng.shutdown()

    def test_hub_split_matches_unsplit(self, engine_mod, ray_session):
        import pyarrow as pa
        import ray.data as rd
        s, d = TestHubSplitLouvain.hub_graph()
        n = 1500
        ds = rd.from_arrow(pa.table({"src": s, "dst": d})) \
            .repartition(8).materialize()
        eng_split = engine_mod.from_dataset(ds, n_nodes=n, n_parts=3,
                                            name="hits_hub_on",
                                            split_hubs=True)
        assert eng_split.has_frags
        eng_plain = engine_mod.from_dataset(ds, n_nodes=n, n_parts=3,
                                            name="hits_hub_off",
                                            split_hubs=False)
        eng_split.hits(max_iter=8)
        eng_plain.hits(max_iter=8)
        ts = eng_split.hits_result().to_pandas().sort_values("node")
        tp = eng_plain.hits_result().to_pandas().sort_values("node")
        assert np.allclose(ts["auth"].to_numpy(), tp["auth"].to_numpy(),
                           atol=1e-13)
        assert np.allclose(ts["hub"].to_numpy(), tp["hub"].to_numpy(),
                           atol=1e-13)
        eng_split.shutdown()
        eng_plain.shutdown()


def kcore_oracle(n, src, dst, k, iters=100):
    """NumPy peel on the symmetric edge list (self-loops excluded)."""
    ns = src != dst
    s, d = src[ns], dst[ns]
    deg = np.bincount(s, minlength=n)
    alive = deg > 0
    for _ in range(iters):
        cnt = np.bincount(s, weights=alive[d].astype(float), minlength=n)
        new = alive & (cnt >= k)
        if (new == alive).all():
            break
        alive = new
    return np.flatnonzero(alive)


class TestKCoreEngine:
    @pytest.mark.parametrize("k", [2, 3, 5])
    def test_matches_oracle(self, engine_mod, k):
        n = 400
        src, dst, w = er_graph(n, 0.015, 11)
        eng = engine_mod.from_arrays(src, dst, w, n=n, n_parts=3,
                                     name=f"kcore{k}")
        eng.kcore(k)
        got = eng.kcore_result().to_pandas()["node"].to_numpy()
        want = kcore_oracle(n, src, dst, k)
        assert sorted(got.tolist()) == want.tolist()
        eng.shutdown()

    def test_self_loops_excluded(self, engine_mod):
        # triangle + a self-loop on an otherwise degree-1 node: the
        # self-loop must not keep node 3 alive at k=2
        src = np.array([0, 1, 1, 2, 2, 0, 0, 3, 3], dtype=np.int64)
        dst = np.array([1, 0, 2, 1, 0, 2, 3, 0, 3], dtype=np.int64)
        eng = engine_mod.from_arrays(src, dst, n=4, n_parts=2,
                                     name="kcore_self")
        eng.kcore(2)
        got = sorted(eng.kcore_result().to_pandas()["node"].tolist())
        assert got == [0, 1, 2]
        eng.shutdown()


class TestPersonalizedPageRank:
    def test_matches_numpy(self, engine_mod):
        n, mod, d, iters = 300, 7, 0.85, 15
        src, dst = directed_er(n, 0.02, 13)
        eng = engine_mod.from_arrays(src, dst, n=n, n_parts=3, name="ppr")
        eng.pagerank(damping=d, tol=0.0, max_iter=iters, ppr_mod=mod)
        got = eng.pagerank_result().to_pandas().sort_values("node")
        import pandas as pd
        e = pd.DataFrame({"s": src, "d": dst}).drop_duplicates()
        s, dd = e["s"].to_numpy(), e["d"].to_numpy()
        od = np.bincount(s, minlength=n).astype(float)
        ns = (n - 1) // mod + 1
        p = np.where(np.arange(n) % mod == 0, 1.0 / ns, 0.0)
        r = p.copy()
        for _ in range(iters):
            contrib = r / np.maximum(od, 1.0)
            agg = np.bincount(dd, weights=contrib[s], minlength=n)
            dang = r[od == 0].sum()
            r = (1.0 - d) * p + d * (agg + dang * p)
        assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
        # mass conserved; non-seed sources unreachable from seeds get 0
        assert abs(got["rank"].sum() - 1.0) < 1e-9
        eng.shutdown()


class TestEdgeSupport:
    @pytest.mark.parametrize("n_parts", [2, 3])
    def test_matches_naive(self, engine_mod, n_parts):
        n = 250
        src, dst, w = er_graph(n, 0.03, 17)
        eng = engine_mod.from_arrays(src, dst, w, n=n, n_parts=n_parts,
                                     name=f"sup{n_parts}")
        got = eng.edge_support().to_pandas() \
            .sort_values(["u", "v"]).reset_index(drop=True)
        # naive: adjacency sets, common-neighbor count per canonical edge
        adj = {i: set() for i in range(n)}
        for s, d in zip(src, dst):
            if s != d:
                adj[s].add(d)
        pairs = sorted({(min(s, d), max(s, d))
                        for s, d in zip(src, dst) if s != d})
        want = [(u, v, len(adj[u] & adj[v])) for u, v in pairs]
        assert list(map(tuple, got.to_records(index=False))) == want
        # each triangle contributes +1 to exactly three edges
        assert got["support"].sum() == 3 * eng.triangles()
        eng.shutdown()

    @pytest.mark.parametrize("n_parts", [2, 3])
    def test_node_triangles_matches_naive(self, engine_mod, n_parts):
        n = 250
        src, dst, w = er_graph(n, 0.03, 23)
        eng = engine_mod.from_arrays(src, dst, w, n=n, n_parts=n_parts,
                                     name=f"ntri{n_parts}")
        got = eng.node_triangles().to_pandas() \
            .sort_values("node").reset_index(drop=True)
        adj = {i: set() for i in range(n)}
        for s, d in zip(src, dst):
            if s != d:
                adj[s].add(d)
                adj[d].add(s)
        want_tri = [sum(len(adj[u] & adj[v]) for v in adj[u]) // 2
                    for u in range(n)]
        assert list(got["node"]) == list(range(n))
        assert list(got["tri"]) == want_tri
        assert list(got["deg"]) == [len(adj[u]) for u in range(n)]
        # every triangle counted at exactly three nodes
        assert got["tri"].sum() == 3 * eng.triangles()
        eng.shutdown()


class TestAssortativity:
    def test_matches_naive(self, engine_mod):
        n = 200
        src, dst, w = er_graph(n, 0.04, 53)
        eng = engine_mod.from_arrays(src, dst, w, n=n, n_parts=3,
                                     name="assort")
        m, s_deg, s_degsq, s_prod = eng.assortativity_stats()
        adj = {i: set() for i in range(n)}
        for s, d in zip(src, dst):
            if s != d:
                adj[s].add(d)
                adj[d].add(s)
        pairs = [(u, v) for u in range(n) for v in adj[u]]
        deg = {u: len(adj[u]) for u in range(n)}
        assert m == len(pairs)
        assert s_deg == sum(deg[u] for u, _ in pairs)
        assert s_degsq == sum(deg[u] ** 2 for u, _ in pairs)
        assert s_prod == sum(deg[u] * deg[v] for u, v in pairs)
        eng.shutdown()


class TestKTruss:
    @pytest.mark.parametrize("n_parts", [2, 3])
    def test_matches_naive(self, engine_mod, n_parts):
        n = 120
        src, dst, w = er_graph(n, 0.08, 41)   # dense enough for 4-truss
        eng = engine_mod.from_arrays(src, dst, w, n=n, n_parts=n_parts,
                                     name=f"tr{n_parts}")
        k, iters = 4, 8
        eng.ktruss(k, max_iter=iters)
        got = sorted(map(tuple, eng.ktruss_result().to_pandas()
                         .to_records(index=False)))
        # naive synchronous peel, same round cap
        edges = {(min(s, d), max(s, d))
                 for s, d in zip(src, dst) if s != d}
        for _ in range(iters):
            adj = {}
            for u, v in edges:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
            nxt = {(u, v) for u, v in edges
                   if len(adj[u] & adj[v]) >= k - 2}
            if nxt == edges:
                break
            edges = nxt
        assert got == sorted(edges)
        assert len(got) > 0   # fixture keeps a non-trivial truss
        eng.shutdown()


class TestSeedBFS:
    @pytest.mark.parametrize("n_parts", [2, 3])
    def test_matches_naive(self, engine_mod, n_parts):
        n = 300
        src, dst, w = er_graph(n, 0.008, 31)   # sparse: some unreachable
        eng = engine_mod.from_arrays(src, dst, w, n=n, n_parts=n_parts,
                                     name=f"bfs{n_parts}")
        seed_mod = 97
        eng.bfs(seed_mod, max_iter=64)
        got = eng.bfs_result().to_pandas() \
            .sort_values("node").reset_index(drop=True)
        # naive BFS from all seeds at once
        from collections import deque
        adj = {i: set() for i in range(n)}
        for s, d in zip(src, dst):
            adj[s].add(d)
            adj[d].add(s)
        dist = {i: 0 for i in range(0, n, seed_mod)}
        dq = deque(dist)
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        want = [dist.get(i, -1) for i in range(n)]
        assert list(got["dist"]) == want
        assert (got["dist"] == -1).any()   # fixture really exercises -1
        eng.shutdown()


class TestRouteModes:
    """Owner-side block routing (the default) is bit-identical to the
    legacy split-copy route wave (engine.from_dataset modes)."""

    def test_owner_route_bit_identical_to_split(self, engine_mod,
                                                ray_session, monkeypatch):
        import pyarrow as pa
        import ray
        import ray.data as rd

        rng = np.random.RandomState(5)
        n = 4000
        s = rng.randint(0, n, 60000).astype(np.int64)
        d = rng.randint(0, n, 60000).astype(np.int64)
        keep = s != d
        w = (rng.randint(1, 4, keep.sum())).astype(np.float64)
        ds = rd.from_arrow(pa.table({"src": s[keep], "dst": d[keep],
                                     "w": w})).repartition(7).materialize()

        tbls = {}
        for mode in ("split", "owner", "index"):
            monkeypatch.setenv("LINKGRAPH_ROUTE_MODE", mode)
            eng = engine_mod.from_dataset(ds, n_nodes=n, n_parts=3,
                                          name=f"rt_{mode}")
            tbls[mode] = pa.concat_tables(
                ray.get([a.edge_arrays.remote() for a in eng.actors]))
            eng.shutdown()
        assert tbls["owner"].equals(tbls["split"])
        assert tbls["index"].equals(tbls["split"])


def test_contract_edges_p_invariant(engine_mod):
    """L4 gate surface: contract_edges must yield the identical dense
    contracted edge table at any partition count (fixed-width dedup
    wave + ascending-label renumber are parallelism-invariant by
    design)."""
    import pyarrow as pa
    import ray

    n = 400
    src, dst = directed_er(n, 0.02, 7)
    tables = []
    for parts in (2, 4):
        eng = engine_mod.from_arrays(src, dst, n=n, n_parts=parts,
                                     name=f"ce{parts}")
        try:
            eng.louvain_round1()
            refs, n_sub = eng.contract_edges()
            t = pa.concat_tables(ray.get(refs)).to_pandas() \
                .sort_values(["src", "dst"]).reset_index(drop=True)
            tables.append((t, n_sub))
        finally:
            eng.shutdown()
    (t2, n2), (t4, n4) = tables
    assert n2 == n4
    assert t2.equals(t4)


def test_int64_chunks_rejects_misaligned_layouts():
    """Differently-chunked src/dst columns must fall back to the concat
    path (zipping would misalign rows under the C kernels, r5 review)."""
    import pyarrow as pa

    from linkgraph.state.partition import GraphShard

    s = pa.chunked_array([pa.array([1, 2, 3], pa.int64()),
                          pa.array([4], pa.int64())])
    d = pa.chunked_array([pa.array([1], pa.int64()),
                          pa.array([2, 3, 4], pa.int64())])
    t = pa.table({"src": s, "dst": d})
    assert GraphShard._int64_chunks([t]) is None
    # aligned layouts still take the zero-copy path
    t2 = pa.table({"src": pa.array([1, 2], pa.int64()),
                   "dst": pa.array([3, 4], pa.int64())})
    out = GraphShard._int64_chunks([t2])
    assert out is not None and len(out) == 1
