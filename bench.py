"""Benchmark harness — the driver's per-round feedback loop.

Default mode: run the headline graph pipeline + every registry query over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) at
``$RAY_GRAFT_CPUS`` CPUs (default 32); print ONE JSON line.

``--scaling``: run the flagship pages pipeline (generate pages fixture ->
extract links -> ingest -> PageRank + Louvain on the partitioned engine)
twice in FRESH processes at 8 and 32 CPUs on the SAME input parquet, and
report throughput at both plus scaling efficiency
(eff = (thr_hi / thr_lo) / (cpus_hi / cpus_lo)).  This is the sandbox
evidence for the north rule's two-cluster-size criterion (a real N vs 4N
node cluster is not available here).

``--pages-run --cpus N`` is the internal child mode used by --scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PAGES_DIR = "/tmp/linkgraph_bench_pages"
DEFAULT_BENCH_PAGES = 200_000


def _init_ray(num_cpus: int):
    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False


# --------------------------------------------------------------- sf bench

def run_sf_bench(sf_dir: str, num_cpus: int) -> dict:
    """Headline pipeline + per-query timings over the sf dir."""
    import ray

    _init_ray(num_cpus)
    from linkgraph.queries import QUERIES
    from linkgraph.queries import graphs as g

    timings: dict[str, float] = {}

    # headline: build graph once, PageRank + Louvain + throughput
    t0 = time.time()
    eng = g._build_engine(sf_dir, n_parts=max(2, num_cpus // 4))
    build_secs = time.time() - t0
    n_edges = sum(s["n_edges"] for s in eng.stats)
    pr = eng.pagerank(tol=1e-10, max_iter=100)
    t1 = time.time()
    lv = eng.louvain()
    lv_secs = time.time() - t1
    eng.shutdown()
    headline = {
        "n_edges": n_edges,
        "build_secs": round(build_secs, 3),
        "pagerank_iters": pr["iterations"],
        "pagerank_secs": round(pr["secs"], 3),
        "pagerank_edges_per_sec_iter": round(pr["edges_per_sec"], 1),
        "louvain_secs": round(lv_secs, 3),
        "louvain_modularity": round(lv["modularity"], 6),
    }

    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            res = fn(sf_dir)
            # consume lazily-built datasets
            import ray.data as rd
            if isinstance(res, rd.Dataset):
                for _ in res.iter_batches(batch_size=None,
                                          batch_format="pyarrow"):
                    pass
            timings[name] = round(time.time() - t0, 3)
        except Exception as ex:  # record, don't die
            timings[name] = -1.0
            print(f"# query {name} failed: {ex}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v > 0)
                  + headline["pagerank_secs"] + headline["louvain_secs"]
                  + headline["build_secs"], 3)
    ray.shutdown()
    return {
        "metric": ("total seconds: headline graph pipeline (build + "
                   "PageRank + Louvain) + all registry queries"),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "headline": headline,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }


# ------------------------------------------------------------ pages child

def run_pages_pipeline(num_cpus: int, n_pages: int) -> dict:
    """Flagship pipeline on the deterministic pages fixture; returns
    throughput stats.  Input parquet is generated once and shared."""
    import ray

    _init_ray(num_cpus)
    from linkgraph.fixtures.pages import bench_config, write_pages_parquet
    from linkgraph.pipelines.ingest import ingest
    from linkgraph.state.engine import GraphEngine

    cfg = bench_config(n_pages=n_pages)
    if not os.path.isdir(PAGES_DIR) or not os.listdir(PAGES_DIR):
        os.makedirs(PAGES_DIR, exist_ok=True)
        write_pages_parquet(cfg, PAGES_DIR, parallelism=max(32, num_cpus * 2))

    t0 = time.time()
    out = ingest(PAGES_DIR, concurrency=(1, num_cpus))
    n_nodes = out["nodes"].count()
    ingest_secs = time.time() - t0

    t1 = time.time()
    eng = GraphEngine.from_dataset(out["sym_edges"], n_nodes=n_nodes,
                                   n_parts=max(2, num_cpus // 2),
                                   name="bench")
    build_secs = time.time() - t1
    n_edges = sum(s["n_edges"] for s in eng.stats)

    pr = eng.pagerank(tol=1e-10, max_iter=60)
    t2 = time.time()
    lv = eng.louvain()
    lv_secs = time.time() - t2
    lv_rounds = sum(1 for m in eng.metrics
                    if m.get("algo") == "louvain" and m.get("kind") == "round")
    eng.shutdown()
    ray.shutdown()
    pipeline_secs = ingest_secs + build_secs + pr["secs"] + lv_secs
    return {
        "cpus": num_cpus,
        "n_pages": n_pages,
        "n_nodes": int(n_nodes),
        "n_edges": int(n_edges),
        "ingest_secs": round(ingest_secs, 3),
        "csr_build_secs": round(build_secs, 3),
        "pagerank_iters": pr["iterations"],
        "pagerank_secs": round(pr["secs"], 3),
        "pagerank_edges_per_sec_iter": round(pr["edges_per_sec"], 1),
        "louvain_secs": round(lv_secs, 3),
        "louvain_rounds": lv_rounds,
        "louvain_modularity": round(lv["modularity"], 6),
        "pipeline_secs": round(pipeline_secs, 3),
        "pipeline_pages_per_sec": round(n_pages / pipeline_secs, 1),
    }


def run_scaling(n_pages: int, lo: int = 8, hi: int = 32) -> dict:
    """Fresh-process runs at lo and hi CPUs on the same input."""
    results = {}
    for cpus in (lo, hi):
        cmd = [sys.executable, os.path.abspath(__file__), "--pages-run",
               "--cpus", str(cpus), "--pages", str(n_pages)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        if out.returncode != 0:
            raise RuntimeError(f"child failed at {cpus} cpus:\n{out.stderr[-2000:]}")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r_lo, r_hi = results[lo], results[hi]
    thr_lo = r_lo["pagerank_edges_per_sec_iter"]
    thr_hi = r_hi["pagerank_edges_per_sec_iter"]
    pipe_lo = r_lo["pipeline_pages_per_sec"]
    pipe_hi = r_hi["pipeline_pages_per_sec"]
    factor = hi / lo
    return {
        "metric": "scaling efficiency (PageRank edges/sec/iter), "
                  f"{lo} vs {hi} CPUs, same input",
        "value": round((thr_hi / thr_lo) / factor, 3),
        "unit": "efficiency",
        "pipeline_efficiency": round((pipe_hi / pipe_lo) / factor, 3),
        "lo": r_lo,
        "hi": r_hi,
        "sf": PAGES_DIR,
        "num_cpus": hi,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pages-run", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--pages", type=int, default=DEFAULT_BENCH_PAGES)
    args = ap.parse_args()

    if args.pages_run:
        print(json.dumps(run_pages_pipeline(args.cpus, args.pages)))
        return
    if args.scaling:
        print(json.dumps(run_scaling(args.pages)))
        return
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(json.dumps(run_sf_bench(sf_dir, args.cpus)))


if __name__ == "__main__":
    main()
