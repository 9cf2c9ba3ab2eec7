"""Phase attribution for the dynamic-timestep A/B pairing: replays the
bench's --lv-only job (static Louvain + one delta timestep on the
LV_EDGES stress graph) and prints the engine's per-phase metric records
for the DYNAMIC portion, so the scaling residue (driver sub_levels vs
distributed rounds vs delta routing/screening) is measurable per P.

Usage: python scripts/profile_dynamic.py [cpus] [lv_edges] [lv_nodes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000_000
    n_nodes = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from linkgraph.common import enable_shmmap
    enable_shmmap()
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from linkgraph.fixtures.edges import edge_batch, synthetic_edges_dataset
    from linkgraph.state.engine import GraphEngine

    P = max(2, cpus // 2)
    ds = synthetic_edges_dataset(n_edges, n_nodes,
                                 parallelism=max(64, cpus * 2))

    def mirror(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s])})

    sym = ds.map_batches(mirror, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    eng = GraphEngine.from_dataset(sym, n_nodes=n_nodes, n_parts=P,
                                   name="prof_dyn", warmup="louvain")
    t0 = time.time()
    eng.louvain()
    lv_secs = time.time() - t0

    delta_n = 100_000
    idx = np.arange(delta_n, dtype=np.int64)
    del_tbl = edge_batch(42, n_nodes, 1000, 1024, idx)
    add_tbl = edge_batch(43, n_nodes, 1000, 1024, idx)
    n_before = len(eng.metrics)
    t0 = time.time()
    recs = eng.dynamic_step(0, {
        "del": (del_tbl.column("src").to_numpy(),
                del_tbl.column("dst").to_numpy(),
                np.ones(del_tbl.num_rows)),
        "add": (add_tbl.column("src").to_numpy(),
                add_tbl.column("dst").to_numpy(),
                np.ones(add_tbl.num_rows)),
    })
    dyn_secs = time.time() - t0
    phases: dict[str, float] = {}
    rounds = 0.0
    nround = 0
    for m in eng.metrics[n_before:]:
        if m.get("kind") == "phase":
            phases[m["name"]] = round(phases.get(m["name"], 0.0)
                                      + m["secs"], 2)
        elif m.get("kind") == "round":
            rounds += m["secs"]
            nround += 1
    print(json.dumps({
        "cpus": cpus, "P": P, "louvain_secs": round(lv_secs, 2),
        "dynamic_secs": round(dyn_secs, 2),
        "dyn_round_secs": round(rounds, 2), "dyn_rounds": nround,
        "dyn_phases": phases,
        "accounted": round(rounds + sum(phases.values()), 2),
        "records": recs,
    }))
    eng.shutdown()
    ray.shutdown()


if __name__ == "__main__":
    main()
