"""Dynamic (timestep) path: engine vs oracle parity on ToyExample and
random delta batches — labels exact (canonicalized), modularity equal,
R sets same size."""

import numpy as np
import pytest

from linkgraph.fixtures import toy
from linkgraph.oracle.dynamic import canonical_labels, dynamic_louvain

from test_oracle import planted_graph


def random_deltas(n, src, dst, n_ts, seed):
    """Seeded delta batches: delete existing undirected edges, add new
    ones (no dups, no self-loops — the Preprocess.R contract)."""
    rng = np.random.RandomState(seed)
    und = {(int(a), int(b)) for a, b in zip(src, dst) if a < b}
    deltas = []
    next_node = n
    for _ in range(n_ts):
        dels = []
        if und:
            k = min(len(und), rng.randint(1, 4))
            pick = rng.choice(len(und), size=k, replace=False)
            items = sorted(und)
            dels = [items[i] for i in pick]
            und -= set(dels)
        adds = []
        for _ in range(rng.randint(1, 4)):
            if rng.rand() < 0.3:
                a, b = next_node, rng.randint(0, n)
                next_node += 1
            else:
                a, b = rng.randint(0, n), rng.randint(0, n)
            if a == b:
                continue
            key = (min(a, b), max(a, b))
            if key in und:
                continue
            und.add(key)
            adds.append(key)
        def arr(pairs):
            if not pairs:
                return (np.empty(0, np.int64), np.empty(0, np.int64),
                        np.empty(0, np.float64))
            e = np.array(pairs, dtype=np.int64)
            return e[:, 0], e[:, 1], np.ones(len(e))
        deltas.append({"del": arr(dels), "add": arr(adds)})
    return deltas


def run_engine_dynamic(src, dst, w, n, deltas, n_parts=2):
    from linkgraph.state.engine import GraphEngine
    eng = GraphEngine.from_arrays(src, dst, w, n=n, n_parts=n_parts,
                                  name="dyn")
    eng.louvain()
    recs = []
    for ts, batch in enumerate(deltas):
        recs.extend(eng.dynamic_step(ts, batch))
    labels = eng.louvain_result().to_pandas().sort_values("node")["comm"].to_numpy()
    eng.shutdown()
    return recs, labels


class TestDynamicToy:
    def test_matches_oracle(self, ray_session):
        src, dst, w = toy.base_edge_array()
        deltas = [
            {"del": toy.delta_arrays(0, "del"), "add": toy.delta_arrays(0, "add")},
            {"del": toy.delta_arrays(1, "del"), "add": toy.delta_arrays(1, "add")},
        ]
        want = dynamic_louvain(src, dst, w, deltas)
        got_recs, got_labels = run_engine_dynamic(src, dst, w, 14, deltas)
        want_phases = [r for r in want if r["phase"] != "init"]
        assert len(got_recs) == len(want_phases)
        for g, o in zip(got_recs, want_phases):
            assert g["phase"] == o["phase"] and g["ts"] == o["ts"]
            assert g["r_size"] == o["r_size"], (g, o)
            assert abs(g["modularity"] - o["modularity"]) < 1e-9
        assert canonical_labels(got_labels).tolist() == \
            canonical_labels(want[-1]["labels"]).tolist()


class TestDynamicRandom:
    @pytest.mark.parametrize("seed", [3, 13])
    def test_matches_oracle(self, ray_session, seed):
        n = 80
        src, dst, w = planted_graph(n, 4, 0.35, 0.03, seed)
        und_src = src[src < dst]
        und_dst = dst[src < dst]
        deltas = random_deltas(n, und_src, und_dst, 3, seed)
        want = dynamic_louvain(src, dst, w, deltas)
        got_recs, got_labels = run_engine_dynamic(src, dst, w, n, deltas,
                                                  n_parts=3)
        want_phases = [r for r in want if r["phase"] != "init"]
        for g, o in zip(got_recs, want_phases):
            assert g["phase"] == o["phase"]
            assert g["r_size"] == o["r_size"], (g, o)
            assert abs(g["modularity"] - o["modularity"]) < 1e-9
        assert canonical_labels(got_labels).tolist() == \
            canonical_labels(want[-1]["labels"]).tolist()


class TestDynamicDatasetNative:
    """The Dataset-native delta path (refs routed by owner, M5 dedup in
    the exchange) must equal the legacy driver-array path exactly."""

    @pytest.mark.parametrize("seed", [13])
    def test_refs_path_matches_arrays(self, ray_session, seed):
        import pyarrow as pa
        import ray

        n = 80
        src, dst, w = planted_graph(n, 4, 0.35, 0.03, seed)
        und_src = src[src < dst]
        und_dst = dst[src < dst]
        deltas = random_deltas(n, und_src, und_dst, 3, seed)
        want = dynamic_louvain(src, dst, w, deltas)
        # refs form: each phase's DEDUPED (src,dst) pairs as table refs,
        # split across two blocks to exercise multi-block routing; add
        # duplicate + self-loop rows that the exchange's M5 preprocess
        # must strip
        ref_deltas = []
        for batch in deltas:
            rb = {}
            for phase in ("del", "add"):
                s, d, _ = batch[phase]
                s = np.concatenate([s, s[:1], s[:1]]) if len(s) else s
                d = np.concatenate([d, d[:1], s[:1]]) if len(d) else d
                half = len(s) // 2
                rb[phase] = [
                    ray.put(pa.table({"src": s[:half], "dst": d[:half]})),
                    ray.put(pa.table({"src": s[half:], "dst": d[half:]})),
                ]
            ref_deltas.append(rb)
        got_recs, got_labels = run_engine_dynamic(src, dst, w, n,
                                                  ref_deltas, n_parts=3)
        want_phases = [r for r in want if r["phase"] != "init"]
        assert len(got_recs) == len(want_phases)
        for g, o in zip(got_recs, want_phases):
            assert g["phase"] == o["phase"]
            assert g["r_size"] == o["r_size"], (g, o)
            assert abs(g["modularity"] - o["modularity"]) < 1e-9
        assert canonical_labels(got_labels).tolist() == \
            canonical_labels(want[-1]["labels"]).tolist()

    def test_apply_delta_dataset(self, ray_session):
        """apply_delta_dataset == apply_delta_batch on the same batch
        (including count_notexist and node growth)."""
        import pyarrow as pa
        import ray.data as rd

        from linkgraph.state.engine import GraphEngine

        n = 60
        src, dst, w = planted_graph(n, 3, 0.4, 0.05, 5)
        add_s = np.array([2, 7, 61, 3], dtype=np.int64)
        add_d = np.array([9, 61, 62, 2], dtype=np.int64)
        del_s = np.array([0, 1, 59], dtype=np.int64)
        del_d = np.array([1, 0, 58], dtype=np.int64)

        e1 = GraphEngine.from_arrays(src, dst, w, n=n, n_parts=2, name="da")
        m1 = e1.apply_delta_batch(del_src=del_s, del_dst=del_d)
        e1.apply_delta_batch(add_src=add_s, add_dst=add_d)
        edges1 = {(r["src"], r["dst"], r["w"])
                  for p in __import__("ray").get(
                      [a.edge_arrays.remote() for a in e1.actors])
                  for r in p.to_pylist()}
        n1, M1 = e1.n, e1.M
        e1.shutdown()

        e2 = GraphEngine.from_arrays(src, dst, w, n=n, n_parts=3, name="db")
        m2 = e2.apply_delta_dataset(
            del_ds=rd.from_arrow(pa.table({"src": del_s, "dst": del_d})))
        e2.apply_delta_dataset(
            add_ds=rd.from_arrow(pa.table({"src": add_s, "dst": add_d})))
        edges2 = {(r["src"], r["dst"], r["w"])
                  for p in __import__("ray").get(
                      [a.edge_arrays.remote() for a in e2.actors])
                  for r in p.to_pylist()}
        n2, M2 = e2.n, e2.M
        e2.shutdown()

        assert m1 == m2
        assert n1 == n2 == 63
        assert abs(M1 - M2) < 1e-12
        assert edges1 == edges2
