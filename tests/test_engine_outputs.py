"""Engine output surfaces: community sizes/members (S8), hierarchy
parquet (S6), and dynamic mode flags (L13)."""

from __future__ import annotations

import collections
import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from linkgraph.state.engine import GraphEngine


def planted_edges(n=120, k=4, seed=5):
    rng = np.random.default_rng(seed)
    src, dst = [], []
    block = n // k
    for _ in range(n * 6):
        u = rng.integers(0, n)
        if rng.random() < 0.85:
            v = (u // block) * block + rng.integers(0, block)
        else:
            v = rng.integers(0, n)
        if u != v:
            src.append(u)
            dst.append(v)
    s = np.array(src + dst)
    d = np.array(dst + src)
    return s, d, n


@pytest.fixture(scope="module")
def eng(ray_session):
    s, d, n = planted_edges()
    e = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name="outputs")
    yield e
    e.shutdown()


def test_hierarchy_and_comm_outputs(eng, tmp_path_factory):
    hdir = str(tmp_path_factory.mktemp("hier"))
    res = eng.louvain(hierarchy_dir=hdir)
    levels = sorted(glob.glob(os.path.join(hdir, "level-*")))
    assert len(levels) >= 1
    lvl0 = pq.read_table(levels[0] + "/part-00000.parquet") \
        if os.path.exists(levels[0] + "/part-00000.parquet") else None
    files0 = glob.glob(levels[0] + "/part-*.parquet")
    rows0 = sum(pq.read_table(f).num_rows for f in files0)
    assert rows0 == eng.n

    sizes = eng.comm_sizes()
    assert int(np.sum(sizes.column("size").to_numpy())) == eng.n
    # must agree with a direct groupby of the labels result
    labels = eng.louvain_result()
    want = collections.Counter(labels.column("comm").to_pylist())
    got = dict(zip(sizes.column("comm").to_pylist(),
                   sizes.column("size").to_pylist()))
    assert got == dict(want)
    assert len(got) == res["n_comms"]

    members = eng.comm_members().take_all()
    assert len(members) == eng.n
    keys = [(r["comm"], r["node"]) for r in members]
    assert keys == sorted(keys)

    # S7/J3: composing the hierarchy parquet must reproduce the final
    # labels exactly
    from linkgraph.pipelines.hierarchy import compose_hierarchy
    composed = {r["node"]: r["comm"]
                for r in compose_hierarchy(hdir).take_all()}
    final = {r["node"]: r["comm"]
             for r in labels.to_pylist()}
    assert composed == final


def test_dynamic_modes(ray_session):
    s, d, n = planted_edges(seed=11)
    results = {}
    for mode in ("delta", "full", "static"):
        e = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name=f"m_{mode}")
        e.louvain()
        recs = e.dynamic_step(0, {
            "del": (s[:5], d[:5], np.ones(5)),
            "add": (np.array([1, 2]), np.array([50, 80]), np.ones(2)),
        }, mode=mode)
        assert len(recs) == 2
        results[mode] = recs
        if mode in ("full", "static"):
            assert all(r["r_size"] == e.n for r in recs)
        e.shutdown()
    # all modes should land on a sane modularity for this planted graph
    for mode, recs in results.items():
        assert recs[-1]["modularity"] > 0.3, (mode, recs)


def test_dynamic_resume_from_checkpoint(ray_session, tmp_path):
    """North rule: jobs resume mid-algorithm. Kill the engine after the
    initial partitioning checkpoint; a fresh engine restores the labels
    and continues the timestep — results match the uninterrupted run."""
    s, d, n = planted_edges(seed=23)
    deltas = {"del": (s[:4], d[:4], np.ones(4)),
              "add": (np.array([3, 7]), np.array([60, 90]), np.ones(2))}
    ck = str(tmp_path / "ck")

    # uninterrupted reference run
    e1 = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name="dynres")
    e1.louvain()
    e1.checkpoint(ck, 0, ["labels"])
    recs_ref = e1.dynamic_step(0, deltas)
    labels_ref = e1.louvain_result().column("comm").to_numpy()
    e1.shutdown()

    # resumed run: fresh actors, restore the committed labels checkpoint
    e2 = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name="dynres")
    latest = e2.latest_checkpoint(ck)
    assert latest is not None and latest[0] == 0
    assert e2.restore(ck, 0, ["labels"], dtypes=[np.int64])
    e2._rebuild_comm_aggs()
    recs_res = e2.dynamic_step(0, deltas)
    labels_res = e2.louvain_result().column("comm").to_numpy()
    e2.shutdown()

    assert [r["modularity"] for r in recs_res] == \
        [r["modularity"] for r in recs_ref]
    assert [r["r_size"] for r in recs_res] == \
        [r["r_size"] for r in recs_ref]
    # exact same partition up to renumbering
    def canon(lbl):
        first = {}
        out = np.empty(len(lbl), np.int64)
        for i, c in enumerate(lbl):
            out[i] = first.setdefault(c, i)
        return out
    assert np.array_equal(canon(labels_ref), canon(labels_res))


def test_louvain_driver_fast_path_parity(ray_session, tmp_path):
    """Small-graph opt-in (louvain_driver_threshold): the driver oracle
    path must be indistinguishable from the distributed level-0 path —
    same modularity, same labels up to renumbering, same hierarchy
    shape, same dynamic-timestep records."""
    s, d, n = planted_edges(seed=31)
    deltas = {"del": (s[:4], d[:4], np.ones(4)),
              "add": (np.array([2, 9]), np.array([70, 95]), np.ones(2))}

    def canon(lbl):
        first = {}
        out = np.empty(len(lbl), np.int64)
        for i, c in enumerate(lbl):
            out[i] = first.setdefault(c, i)
        return out

    runs = {}
    for name, thr in (("dist", 0), ("driver", 10**9)):
        e = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name=f"fp_{name}")
        e.louvain_driver_threshold = thr
        hdir = str(tmp_path / f"h_{name}")
        res = e.louvain(hierarchy_dir=hdir)
        labels = e.louvain_result().column("comm").to_numpy()
        recs = e.dynamic_step(0, deltas)
        labels2 = e.louvain_result().column("comm").to_numpy()
        n_level_dirs = len(glob.glob(os.path.join(hdir, "level-*")))
        e.shutdown()
        runs[name] = (res, labels, recs, labels2, n_level_dirs)

    r_d, lab_d, recs_d, lab2_d, nl_d = runs["dist"]
    r_f, lab_f, recs_f, lab2_f, nl_f = runs["driver"]
    assert abs(r_d["modularity"] - r_f["modularity"]) < 1e-12
    assert r_d["n_comms"] == r_f["n_comms"]
    assert r_d["n_levels"] == r_f["n_levels"]
    assert nl_d == nl_f
    assert np.array_equal(canon(lab_d), canon(lab_f))
    assert [r["r_size"] for r in recs_d] == [r["r_size"] for r in recs_f]
    assert [round(r["modularity"], 12) for r in recs_d] == \
        [round(r["modularity"], 12) for r in recs_f]
    assert np.array_equal(canon(lab2_d), canon(lab2_f))


def test_display_printers(eng):
    """S12 debug printers (graph_binary.cpp:186-215, louvain.cpp:205-231):
    bounded adjacency / partition dumps in deterministic order."""
    import io

    s, d, n = planted_edges()
    # the CSR stores multi-edges unmerged (weights sum in the kernels),
    # so display prints the edge MULTISET in (src, dst) order
    edges = sorted(zip(s.tolist(), d.tolist()))

    buf = io.StringIO()
    n_printed = eng.display(limit=10, file=buf)
    assert n_printed == 10
    lines = buf.getvalue().strip().splitlines()
    # reconstruct the printed (src, dst) pairs and compare with the 10
    # globally-smallest (src, dst) edges
    got = []
    for line in lines:
        key, adj = line.split(":")
        for item in adj.split():
            got.append((int(key), int(item.split("(")[0])))
    assert got == edges[:10]

    buf = io.StringIO()
    eng.display(limit=5, reverse=True, file=buf)
    rev_lines = buf.getvalue().strip().splitlines()
    rev_edges = sorted((dd, ss) for ss, dd in zip(s.tolist(), d.tolist()))
    got_rev = []
    for line in rev_lines:
        key, adj = line.split(":")
        for item in adj.split():
            got_rev.append((int(key), int(item.split("(")[0])))
    assert got_rev == rev_edges[:5]

    eng.louvain()
    buf = io.StringIO()
    n_printed = eng.display_partition(limit=7, file=buf)
    assert n_printed == 7
    part_lines = buf.getvalue().strip().splitlines()
    assert [int(line.split()[0]) for line in part_lines] == list(range(7))


def test_dynamic_kill_resume(ray_session, tmp_path):
    """North rule (stretch): a shard dies MID-timestep — between the
    committed del-phase checkpoint of ts1 and its add phase.  A fresh
    engine replays the delta lineage up to the last _SUCCESS superstep
    (apply-only; the graph is a pure function of base edges + deltas),
    restores that superstep's labels, and finishes the timestep with
    final labels identical to the uninterrupted run."""
    import ray

    def canon(lbl):
        first = {}
        out = np.empty(len(lbl), np.int64)
        for i, c in enumerate(lbl):
            out[i] = first.setdefault(c, i)
        return out

    s, d, n = planted_edges(seed=37)
    ts0 = {"del": (s[:4], d[:4], np.ones(4)),
           "add": (np.array([2, 9, n]), np.array([70, 95, 3]), np.ones(3))}
    ts1_del = (s[4:8], d[4:8], np.ones(4))
    ts1_add = (np.array([5, n + 1]), np.array([80, 4]), np.ones(2))
    ck = str(tmp_path / "ck")

    # uninterrupted reference
    e1 = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name="dkr")
    e1.louvain()
    e1.dynamic_step(0, ts0)
    recs_ref = e1.dynamic_step(1, {"del": ts1_del, "add": ts1_add})
    labels_ref = e1.louvain_result().to_pandas() \
        .sort_values("node")["comm"].to_numpy()
    e1.shutdown()

    # interrupted run: per-phase checkpoints; shard 0 dies after ts1's
    # del phase committed, so the add phase fails mid-step
    e2 = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name="dkr")
    e2.louvain()
    e2.dynamic_step(0, ts0, ckpt_dir=ck)
    recs_del = e2.dynamic_step(1, {"del": ts1_del}, ckpt_dir=ck)
    ray.kill(e2.actors[0])
    with pytest.raises(ray.exceptions.RayActorError):
        e2.dynamic_step(1, {"add": ts1_add}, ckpt_dir=ck)
    e2.shutdown()

    # resume: fresh actors; lineage replay to the last _SUCCESS manifest
    e3 = GraphEngine.from_arrays(s, d, n=n, n_parts=2, name="dkr")
    latest = e3.latest_checkpoint(ck)
    assert latest is not None and latest[0] == 2  # ts1 del phase
    e3.apply_delta_batch(del_src=ts0["del"][0], del_dst=ts0["del"][1])
    e3.apply_delta_batch(add_src=ts0["add"][0], add_dst=ts0["add"][1])
    e3.apply_delta_batch(del_src=ts1_del[0], del_dst=ts1_del[1])
    assert e3.restore(ck, 2, ["labels"], dtypes=[np.int64])
    e3._rebuild_comm_aggs()
    recs_add = e3.dynamic_step(1, {"add": ts1_add}, ckpt_dir=ck)
    labels_res = e3.louvain_result().to_pandas() \
        .sort_values("node")["comm"].to_numpy()
    e3.shutdown()

    # the resumed del+add records must equal the reference timestep
    got = recs_del + recs_add
    assert [r["phase"] for r in got] == [r["phase"] for r in recs_ref]
    assert [r["r_size"] for r in got] == [r["r_size"] for r in recs_ref]
    assert [round(r["modularity"], 12) for r in got] == \
        [round(r["modularity"], 12) for r in recs_ref]
    assert np.array_equal(canon(labels_ref), canon(labels_res))


def test_comm_sizes_canonical_parallelism_invariant(ray_session):
    """comm_sizes(canonical=True) renumbers communities to min member
    node id — identical output at any partition count, and consistent
    with the label table."""
    s, d, n = planted_edges(seed=41)
    outs = {}
    for P in (2, 3):
        e = GraphEngine.from_arrays(s, d, n=n, n_parts=P, name=f"cs{P}")
        e.louvain()
        tbl = e.comm_sizes(canonical=True)
        lab = e.louvain_result().to_pandas().sort_values("node")
        e.shutdown()
        outs[P] = tbl.to_pandas()
        # cross-check against a driver-side canonicalization of labels
        import collections
        mins, cnts = {}, collections.Counter()
        for node, comm in zip(lab["node"], lab["comm"]):
            mins.setdefault(comm, node)
            cnts[comm] += 1
        want = sorted((mins[c], cnts[c]) for c in mins)
        got = list(zip(outs[P]["comm"], outs[P]["size"]))
        assert got == want
        assert outs[P]["size"].sum() == n
    assert outs[2].equals(outs[3])

