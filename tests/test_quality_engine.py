"""Quality-variant Louvain: distributed engine vs the variant oracle
(oracle/qlouvain.py pins the deterministic synchronous semantics of the
reference's -q 0..9 surface, main_louvain.cpp:889-899 / 998-1059).

Parity gate (VERDICT r1 missing #1/#2): per-variant trajectory to 1e-9
and labels exact up to renumbering; the E9/E10 reweight -> selfloops ->
louvain composition is exercised by q=4 / q=7.
"""

import numpy as np
import pytest

from linkgraph.oracle import qlouvain as qlv
from linkgraph.oracle.dynamic import canonical_labels
from linkgraph.oracle.graph import CSRGraph

from test_oracle import planted_graph


@pytest.fixture(scope="module")
def engine_mod(ray_session):
    from linkgraph.state.engine import GraphEngine
    return GraphEngine


def _fixture():
    return planted_graph(120, 4, 0.4, 0.02, 11)


@pytest.mark.parametrize("qid", range(10))
def test_engine_matches_variant_oracle(engine_mod, qid):
    src, dst, w = _fixture()
    g = CSRGraph.from_edges(src, dst, w, n=120)
    want = qlv.louvain_q(g, qid)
    eng = engine_mod.from_arrays(src, dst, w, n=120, n_parts=3,
                                 name=f"qv{qid}")
    res = eng.louvain_quality(qid)
    assert np.isclose(res["quality"], want["quality"], atol=1e-9), \
        (qid, res["quality"], want["quality"])
    assert len(res["q_trajectory"]) == len(want["q_trajectory"])
    for a, b in zip(res["q_trajectory"], want["q_trajectory"]):
        assert abs(a - b) < 1e-9, (qid, res["q_trajectory"],
                                   want["q_trajectory"])
    got = eng.louvain_result().to_pandas() \
        .sort_values("node")["comm"].to_numpy()
    assert canonical_labels(got).tolist() == \
        canonical_labels(want["labels"]).tolist(), qid
    eng.shutdown()


def test_driver_shortcut_matches_distributed(engine_mod):
    """louvain_driver_threshold path == distributed path (q=2 exercises
    the alpha knob, q=4 the reweighting composition)."""
    src, dst, w = _fixture()
    for qid, kw in ((2, {"alpha": 0.3}), (4, {})):
        eng_d = engine_mod.from_arrays(src, dst, w, n=120, n_parts=2,
                                       name=f"qd{qid}")
        eng_d.louvain_driver_threshold = 10_000_000
        res_d = eng_d.louvain_quality(qid, **kw)
        lab_d = eng_d.louvain_result().to_pandas() \
            .sort_values("node")["comm"].to_numpy()
        eng_d.shutdown()
        eng_x = engine_mod.from_arrays(src, dst, w, n=120, n_parts=2,
                                       name=f"qx{qid}")
        res_x = eng_x.louvain_quality(qid, **kw)
        lab_x = eng_x.louvain_result().to_pandas() \
            .sort_values("node")["comm"].to_numpy()
        eng_x.shutdown()
        assert np.isclose(res_d["quality"], res_x["quality"], atol=1e-9)
        assert canonical_labels(lab_d).tolist() == \
            canonical_labels(lab_x).tolist()


def test_quality_monotone_improves():
    """Each variant's own measure never falls below the singleton value."""
    src, dst, w = _fixture()
    g = CSRGraph.from_edges(src, dst, w, n=120)
    for qid in range(10):
        gp, q = qlv.prepare_graph(g, qid)
        singles = q.quality(gp, np.arange(gp.n, dtype=np.int64))
        res = qlv.louvain_q(g, qid)
        assert res["quality"] >= singles - 1e-12, (qid, res["quality"],
                                                  singles)


def test_shimalik_kmin_gate():
    """kappa < kmin zeroes every gain -> no move ever accepted."""
    src, dst, w = _fixture()
    g = CSRGraph.from_edges(src, dst, w, n=120)
    res = qlv.louvain_q(g, 8, kmin=10**9)
    assert res["n_levels"] == 0
    assert len(np.unique(res["labels"])) == g.n
