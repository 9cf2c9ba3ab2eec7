"""Phase-timed replica of GraphEngine.from_dataset — finds where CSR
build wall-time goes (the round-1 scaling gap: efficiency 0.40).

Usage: python scripts/profile_build.py [edges] [nodes] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from linkgraph.fixtures.edges import synthetic_edges_dataset
    from linkgraph.state.engine import GraphEngine, _route_block

    P = max(2, cpus // 2)
    t0 = time.time()
    ds = synthetic_edges_dataset(n_edges, n_nodes,
                                 parallelism=max(64, cpus * 2)).materialize()
    print(f"gen           {time.time() - t0:8.2f}s")

    # ---- replicate from_dataset with phase timers ----
    cls = GraphEngine
    t0 = time.time()
    width = max(1, -(-n_nodes // 4096))
    nb = -(-n_nodes // width)
    block_refs = ds.to_arrow_refs()
    print(f"to_refs       {time.time() - t0:8.2f}s  ({len(block_refs)} blocks)")

    @ray.remote
    def _deg_block(tbl: pa.Table) -> np.ndarray:
        src = tbl.column("src").to_numpy()
        return np.bincount(src // width, minlength=nb).astype(np.float64)

    t0 = time.time()
    hist_parts = ray.get([_deg_block.remote(b) for b in block_refs])
    hist = np.sum(hist_parts, axis=0)
    thr = max(256.0, cls.HUB_DEGREE_FACTOR * hist.sum() / max(1, n_nodes))
    hist = np.minimum(hist, width * thr)
    print(f"histogram     {time.time() - t0:8.2f}s")

    t0 = time.time()
    from linkgraph.state.engine import degree_balanced_bounds
    bounds = degree_balanced_bounds(None, n_nodes, P, degree_hist=hist)
    eng = cls(bounds, name="prof")
    print(f"actors        {time.time() - t0:8.2f}s  (P={P})")

    t0 = time.time()
    bounds_ref = ray.put(eng.bounds)
    pending = []
    for blk in block_refs:
        parts = _route_block.options(num_returns=eng.P).remote(blk, bounds_ref)
        if eng.P == 1:
            parts = [parts]
        for a, pref in zip(eng.actors, parts):
            pending.append(a.ingest_edges.remote(pref))
    ray.get(pending)
    print(f"route+ingest  {time.time() - t0:8.2f}s")

    t0 = time.time()
    eng.finalize()
    print(f"finalize      {time.time() - t0:8.2f}s")

    t0 = time.time()
    n_hubs = eng.split_hubs_post()
    print(f"hub_split     {time.time() - t0:8.2f}s  ({n_hubs} hubs)")

    eng.shutdown()
    ray.shutdown()


if __name__ == "__main__":
    main()
