"""Phase-timed replica of GraphEngine._one_level — finds where Louvain
round wall-time goes at high partition counts (round-2 scaling gap).

Inserts ray.get barriers between phases (slower than the pipelined
production loop, but attributes time per phase/bucket).

Usage: python scripts/profile_louvain.py [edges] [nodes] [cpus] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from linkgraph.fixtures.edges import synthetic_edges_dataset
    from linkgraph.state.engine import N_BUCKETS, GraphEngine

    P = max(2, cpus // 2)
    ds = synthetic_edges_dataset(n_edges, n_nodes,
                                 parallelism=max(64, cpus * 2))

    def mirror(b: pa.Table) -> pa.Table:
        s, d = b.column("src").to_numpy(), b.column("dst").to_numpy()
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s])})

    sym = ds.map_batches(mirror, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    t0 = time.time()
    eng = GraphEngine.from_dataset(sym, n_nodes=n_nodes, n_parts=P,
                                   name="prof")
    print(f"build {time.time() - t0:.1f}s  P={P}")

    ray.get([a.lv_init_labels.remote() for a in eng.actors])
    eng._invalidate_label_cache()
    eng._rebuild_comm_aggs()

    counts = np.sum(ray.get([a.lv_bucket_counts.remote(False)
                             for a in eng.actors]), axis=0)
    active = [b for b in range(N_BUCKETS) if counts[b] > 0]
    print("active buckets:", active,
          "counts:", [int(counts[b]) for b in active])

    if eng.has_frags:
        ray.get([a.lv_frag_install_subset.remote(None) for a in eng.actors])

    phases = {"sync": 0.0, "frag": 0.0, "phase1": 0.0, "exchange": 0.0,
              "phase2": 0.0, "apply": 0.0, "modularity": 0.0}
    per_shard_p1 = np.zeros(P)

    for rnd in range(n_rounds):
        t_round = time.time()
        t0 = time.time()
        q = eng._modularity()
        phases["modularity"] += time.time() - t0
        for k, bucket in enumerate(active):
            if k > 0 or rnd > 0:
                t0 = time.time()
                outs = [a.lv_serve_changed.options(num_returns=eng.P)
                        .remote() for a in eng.actors]
                ray.get([a.lv_cache_apply.remote(
                    [outs[j][i] for j in range(eng.P)])
                    for i, a in enumerate(eng.actors)])
                phases["sync"] += time.time() - t0
            if eng.has_frags:
                t0 = time.time()
                frag_outs = [a.lv_frag_partials.options(num_returns=eng.P)
                             .remote(bucket) for a in eng.actors]
                flat = [frag_outs[j][i] for j in range(eng.P)
                        for i in range(eng.P)]
                ray.wait(flat, num_returns=len(flat))
                phases["frag"] += time.time() - t0
                t0 = time.time()
                reqs = []
                for i, a in enumerate(eng.actors):
                    t1 = time.time()
                    r = a.lv_moves_phase1.options(num_returns=eng.P).remote(
                        bucket, False,
                        [frag_outs[j][i] for j in range(eng.P)])
                    reqs.append(r)
                ray.wait([r for rr in reqs for r in rr],
                         num_returns=eng.P * eng.P)
                phases["phase1"] += time.time() - t0
            else:
                t0 = time.time()
                reqs = [a.lv_moves_phase1.options(num_returns=eng.P)
                        .remote(bucket, False) for a in eng.actors]
                ray.wait([r for rr in reqs for r in rr],
                         num_returns=eng.P * eng.P)
                phases["phase1"] += time.time() - t0
            t0 = time.time()
            comm_vals = eng._exchange_comm_aggs(reqs)
            flat = [r for cv in comm_vals for r in cv]
            ray.wait(flat, num_returns=len(flat))
            phases["exchange"] += time.time() - t0
            t0 = time.time()
            deltas = [a.lv_moves_phase2.options(num_returns=eng.P)
                      .remote(comm_vals[i])
                      for i, a in enumerate(eng.actors)]
            ray.wait([d for dd in deltas for d in dd],
                     num_returns=eng.P * eng.P)
            phases["phase2"] += time.time() - t0
            t0 = time.time()
            ray.get([a.lv_apply_comm_deltas.remote(
                [deltas[i][j] for i in range(eng.P)])
                for j, a in enumerate(eng.actors)])
            phases["apply"] += time.time() - t0
        print(f"round {rnd}: {time.time() - t_round:7.2f}s  q={q:.6f}")

    total = sum(phases.values())
    print(f"\nper-phase over {n_rounds} rounds "
          f"({len(active)} buckets each):")
    for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<11} {v:8.2f}s  {100 * v / max(total, 1e-9):5.1f}%")

    eng.shutdown()
    ray.shutdown()


if __name__ == "__main__":
    main()
