"""Phase-timed replica of pipelines.ingest.ingest — finds where the
pages-pipeline wall-time goes (round-1 scaling gap: 0.38-0.50).

Usage: python scripts/profile_ingest.py [n_pages] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from linkgraph.fixtures.pages import bench_config, write_pages_parquet
    from linkgraph.pipelines.ingest import (build_nodes, dedup_resolved,
                                            degree_table, extract_links,
                                            resolve_raw, sym_from_raw)

    pages_dir = f"/tmp/linkgraph_bench_pages_{n_pages}"
    if not os.path.isdir(pages_dir) or not os.listdir(pages_dir):
        os.makedirs(pages_dir, exist_ok=True)
        t0 = time.time()
        write_pages_parquet(bench_config(n_pages=n_pages), pages_dir,
                            parallelism=max(32, cpus * 2))
        print(f"fixture       {time.time() - t0:8.2f}s")

    t_all = time.time()
    t0 = time.time()
    import pyarrow as pa  # noqa: F401
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])
    links = extract_links(pages).materialize()
    print(f"extract       {time.time() - t0:8.2f}s  ({links.count()} links)")

    t0 = time.time()
    nodes = build_nodes(links).materialize()
    print(f"nodes         {time.time() - t0:8.2f}s  ({nodes.count()} nodes)")

    t0 = time.time()
    raw = resolve_raw(links, nodes).materialize()
    print(f"resolve_raw   {time.time() - t0:8.2f}s")

    t0 = time.time()
    edges = dedup_resolved(raw).materialize()
    print(f"dedup         {time.time() - t0:8.2f}s  ({edges.count()} edges)")

    t0 = time.time()
    sym = sym_from_raw(raw).materialize()
    print(f"sym           {time.time() - t0:8.2f}s  ({sym.count()} rows)")

    t0 = time.time()
    deg = degree_table(sym).materialize()
    print(f"degrees       {time.time() - t0:8.2f}s  ({deg.count()} rows)")
    print(f"TOTAL         {time.time() - t_all:8.2f}s")

    ray.shutdown()


if __name__ == "__main__":
    main()
