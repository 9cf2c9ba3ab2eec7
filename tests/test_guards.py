"""Round-2 advisor-fix regressions:

- int64 composite-key overflow guards (ADVICE: partition.py unstable
  composite sorts could silently mis-sort past ~3e9 vertices) — the
  lexsort / structured-dtype fallbacks must agree bit-for-bit with the
  composite paths on the same input.
- ``GraphEngine.install_hubs(hubs)`` without ``hub_degs`` must fetch the
  degrees from the owners (a None used to freeze every hub out of the
  Louvain move phase).
"""

import numpy as np

from linkgraph.state.partition import (_grouped_sum2, composite_fits,
                                       pair_isin)


class TestCompositeGuards:
    def test_composite_fits(self):
        assert composite_fits(1000, 1000)
        assert composite_fits(0, 2**62)
        assert not composite_fits(4, 2**62)
        assert not composite_fits(3_000_000_000, 3_100_000_000)

    def test_grouped_sum2_fallback_agrees(self):
        rng = np.random.RandomState(0)
        hi = rng.randint(0, 50, 1000).astype(np.int64)
        lo = rng.randint(0, 40, 1000).astype(np.int64)
        v = rng.rand(1000)
        a = _grouped_sum2(hi, lo, v, 40)
        b = _grouped_sum2(hi, lo, v, 2**62)   # forces the lexsort path
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])
        # both paths are stable sorts by (hi, lo) -> identical sum order
        assert np.array_equal(a[2], b[2])

    def test_pair_isin_fallback_agrees(self):
        rng = np.random.RandomState(1)
        a_hi = rng.randint(0, 30, 500).astype(np.int64)
        a_lo = rng.randint(0, 30, 500).astype(np.int64)
        b_hi = rng.randint(0, 30, 60).astype(np.int64)
        b_lo = rng.randint(0, 30, 60).astype(np.int64)
        fast = pair_isin(a_hi, a_lo, b_hi, b_lo, 30, 30)
        slow = pair_isin(a_hi, a_lo, b_hi, b_lo, 30, 2**62)
        assert np.array_equal(fast, slow)


class TestInstallHubsDegreeFetch:
    def test_install_without_degs_matches_oracle(self, ray_session):
        import pyarrow as pa
        import ray
        import ray.data as rd

        from linkgraph.oracle import louvain as olv
        from linkgraph.oracle.graph import CSRGraph
        from linkgraph.state.engine import GraphEngine
        from test_engine import TestHubSplitLouvain

        s, d = TestHubSplitLouvain.hub_graph()
        n = 1500
        ds = rd.from_arrow(pa.table({"src": s, "dst": d})) \
            .repartition(8).materialize()
        eng = GraphEngine.from_dataset(ds, n_nodes=n, n_parts=3,
                                       name="hub_nodeg", split_hubs=False)
        # mirror split_hubs_post, but install WITHOUT degrees (the
        # apply_deltas-comment re-split path)
        n_edges_tot = sum(st["n_edges"] for st in eng.stats)
        thr = max(256, int(eng.HUB_DEGREE_FACTOR * n_edges_tot
                           / max(1, eng.n)))
        frag_parts = [a.export_hub_fragments.options(num_returns=eng.P)
                      .remote(thr) for a in eng.actors]
        ray.get([a.ingest_fragments.remote(frag_parts[j][p])
                 for j in range(eng.P)
                 for p, a in enumerate(eng.actors)])
        found = ray.get([a.local_hubs.remote(thr) for a in eng.actors])
        ids = np.concatenate([f[0] for f in found])
        assert len(ids), "fixture must contain hubs"
        eng.install_hubs(ids)          # no hub_degs -> fetched from owners
        res = eng.louvain()
        g = CSRGraph.from_edges(s, d, np.ones(len(s)), n=n)
        want = olv.louvain(g)
        assert abs(res["modularity"] - want["modularity"]) < 1e-12
        lab = eng.louvain_result().to_pandas() \
            .sort_values("node")["comm"].to_numpy()
        assert np.array_equal(lab, want["labels"])
        eng.shutdown()


class TestSortedUniqueIds:
    """Bitmap sorted-unique (the per-bucket comm request set) must agree
    with np.unique in both the bitmap regime and the large-id fallback."""

    def _shard(self, n_global):
        from linkgraph.state.shard_louvain import LouvainShard
        s = LouvainShard.__new__(LouvainShard)
        s.n_global = n_global
        return s

    def test_bitmap_matches_np_unique(self):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 1000, 500)
        b = rng.integers(0, 1000, 300)
        s = self._shard(1000)
        got = s._sorted_unique_ids(a, b)
        np.testing.assert_array_equal(got, np.unique(np.concatenate([a, b])))
        # bitmap must be fully reset between calls
        got2 = s._sorted_unique_ids(b[:5], a[:3])
        np.testing.assert_array_equal(
            got2, np.unique(np.concatenate([b[:5], a[:3]])))

    def test_fallback_past_threshold(self):
        s = self._shard(10**10)  # forces the np.unique fallback
        a = np.array([5, 10**9, 5], dtype=np.int64)
        b = np.array([10**9 + 7], dtype=np.int64)
        got = s._sorted_unique_ids(a, b)
        np.testing.assert_array_equal(got, np.unique(np.concatenate([a, b])))
        assert not hasattr(s, "_need_flag")

    def test_empty_inputs(self):
        s = self._shard(100)
        e = np.empty(0, np.int64)
        assert len(s._sorted_unique_ids(e, e)) == 0
        np.testing.assert_array_equal(
            s._sorted_unique_ids(np.array([3, 3]), e), [3])


class TestUnweightedElision:
    """_build_csr stores all-1.0 weights as a stride-0 broadcast and
    switches back to a real array the moment real weights appear."""

    @staticmethod
    def _shard():
        from linkgraph.state.shard_louvain import LouvainShard
        import pyarrow as pa

        s = LouvainShard(0, [0, 6])
        s.ingest_edges(pa.table({
            "src": np.array([0, 0, 1, 2, 3], np.int64),
            "dst": np.array([1, 2, 0, 5, 4], np.int64)}))
        s.finalize_graph()
        return s

    def test_unweighted_broadcast_and_degrees(self):
        s = self._shard()
        assert s.weights.strides == (0,)          # one float64 backs E
        np.testing.assert_array_equal(s.weights, np.ones(5))
        np.testing.assert_array_equal(s.k, [2.0, 1.0, 1.0, 1.0, 0.0, 0.0])

    def test_weighted_delta_materializes(self):
        import pyarrow as pa

        s = self._shard()
        add = pa.table({"src": np.array([4], np.int64),
                        "dst": np.array([5], np.int64),
                        "w": np.array([2.5], np.float64)})
        missing = s.apply_delta(add, None, None)
        assert missing == 0
        assert s.weights.strides != (0,)          # real array again
        assert s.weights.sum() == 5 * 1.0 + 2.5
        np.testing.assert_array_equal(
            s.k, [2.0, 1.0, 1.0, 1.0, 2.5, 0.0])

    def test_all_ones_delta_stays_broadcast(self):
        import pyarrow as pa

        s = self._shard()
        add = pa.table({"src": np.array([4], np.int64),
                        "dst": np.array([5], np.int64),
                        "w": np.array([1.0], np.float64)})
        s.apply_delta(add, None, None)
        assert s.weights.strides == (0,)
        assert len(s.weights) == 6
