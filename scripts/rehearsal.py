"""End-to-end operational rehearsal: the pipeline a cluster user runs.

    pages parquet -> `linkgraph.cli ingest` -> edge/sym-edge parquet
    -> `linkgraph.cli pagerank` (checkpointed, KILLED mid-run, resumed
       with --resume from the newest committed step)
    -> `linkgraph.cli dynamic` (full Louvain + delta timesteps with
       per-timestep label checkpoints)
    -> metrics manifest (one JSON, every stage's walls + outputs)

Each stage is a separate ``python -m linkgraph.cli`` process with its
own Ray session — exactly the `ray job submit` shape from the CLI
docstring, not the bench harness.  Default size runs in minutes on the
sandbox; ``--pages 16000000`` reproduces the 100x-shape stress run
(~1.2B directed links before dedup).

    python scripts/rehearsal.py --pages 100000 --out /tmp/rehearsal

The kill is a real SIGKILL once the first PageRank checkpoint commits
(_SUCCESS present), so the resume leg proves the operational story:
a failed job re-submitted with --resume skips the finished supersteps.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run([sys.executable, "-m", "linkgraph.cli", *args],
                          cwd=REPO, capture_output=True, text=True, **kw)


def _last_json(out: str) -> dict:
    lines = [l for l in out.splitlines() if l.startswith(("{", "["))]
    return json.loads(lines[-1]) if lines else {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/linkgraph_rehearsal")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--pr-iters", type=int, default=20)
    ap.add_argument("--timesteps", type=int, default=3)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    manifest: dict = {"pages": args.pages, "stages": {}}
    cpu_args = (["--num-cpus", str(args.num_cpus)]
                if args.num_cpus else [])

    # ---- 0. deterministic pages fixture --------------------------------
    t0 = time.time()
    pages_dir = os.path.join(args.out, "pages")
    if not os.path.isdir(pages_dir) or not os.listdir(pages_dir):
        code = (
            "import ray; ray.init(address='local', include_dashboard=False"
            + (f", num_cpus={args.num_cpus}" if args.num_cpus else "")
            + ")\n"
            "from linkgraph.fixtures.pages import bench_config, "
            "write_pages_parquet\n"
            f"cfg = bench_config(n_pages={args.pages})\n"
            f"write_pages_parquet(cfg, {pages_dir!r})\n"
            "ray.shutdown()\n")
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
    manifest["stages"]["gen_pages"] = {"secs": round(time.time() - t0, 1)}

    # ---- 1. ingest ------------------------------------------------------
    graph_dir = os.path.join(args.out, "graph")
    t0 = time.time()
    r = _cli([*cpu_args, "ingest", "--pages", pages_dir,
              "--out", graph_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    ing = _last_json(r.stdout)
    manifest["stages"]["ingest"] = {"secs": round(time.time() - t0, 1),
                                    **ing}
    n_nodes = int(ing["nodes"])

    # ---- 2. pagerank with checkpoint, KILL, resume ----------------------
    ck = os.path.join(args.out, "ckpt_pr")
    rank_dir = os.path.join(args.out, "rank")
    pr_args = [*cpu_args, "pagerank", "--edges",
               f"{graph_dir}/edges",
               "--n-nodes", str(n_nodes), "--job-name", "pr",
               "--tol", "0", "--max-iter", str(args.pr_iters),
               "--checkpoint-every", "5", "--ckpt-dir", ck]
    t0 = time.time()
    proc = subprocess.Popen([sys.executable, "-m", "linkgraph.cli",
                             *pr_args], cwd=REPO,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    # wait for the first committed checkpoint, then SIGKILL the job
    step_base = os.path.join(ck, "pr")
    killed_at = None
    while proc.poll() is None:
        steps = [d for d in (os.listdir(step_base)
                             if os.path.isdir(step_base) else [])
                 if os.path.exists(os.path.join(step_base, d, "_SUCCESS"))]
        if steps:
            os.kill(proc.pid, signal.SIGKILL)
            killed_at = sorted(steps)[-1]
            break
        time.sleep(0.5)
    proc.wait()
    manifest["stages"]["pagerank_killed"] = {
        "secs": round(time.time() - t0, 1),
        "killed_after_step": killed_at}
    assert killed_at is not None, "job finished before the kill — " \
        "raise --pr-iters for a real mid-run kill"
    t0 = time.time()
    r = _cli([*pr_args, "--resume", "--out", rank_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    pr = _last_json(r.stdout)
    assert pr.get("start_iter", 0) > 0, f"resume did not skip work: {pr}"
    manifest["stages"]["pagerank_resumed"] = {
        "secs": round(time.time() - t0, 1), **pr}

    # ---- 3. deltas + dynamic Louvain (checkpointed timesteps) -----------
    deltas_path = os.path.join(args.out, "deltas.parquet")
    code = (
        "import numpy as np, pyarrow as pa, pyarrow.parquet as pq\n"
        "import ray; ray.init(address='local', include_dashboard=False)\n"
        "import ray.data as rd\n"
        f"sym = rd.read_parquet({graph_dir!r} + '/sym_edges')\n"
        "head = sym.take(30000)\n"
        "src = np.array([r['src'] for r in head], np.int64)\n"
        "dst = np.array([r['dst'] for r in head], np.int64)\n"
        "from linkgraph.fixtures.edges import edge_batch\n"
        "parts = []\n"
        f"T = {args.timesteps}\n"
        "per = len(src) // T\n"
        f"n_nodes = {n_nodes}\n"
        "for ts in range(T):\n"
        "    dels = slice(ts * per, ts * per + per // 2)\n"
        "    adds = edge_batch(100 + ts, n_nodes, 1000, 1024,\n"
        "                      np.arange(per // 2, dtype=np.int64))\n"
        "    parts.append(pa.table({\n"
        "        'ts': np.full(per // 2, ts, np.int64),\n"
        "        'op': ['del'] * (per // 2),\n"
        "        'src': src[dels][:per // 2],\n"
        "        'dst': dst[dels][:per // 2]}))\n"
        "    parts.append(pa.table({\n"
        "        'ts': np.full(adds.num_rows, ts, np.int64),\n"
        "        'op': ['add'] * adds.num_rows,\n"
        "        'src': adds.column('src'), 'dst': adds.column('dst')}))\n"
        f"pq.write_table(pa.concat_tables(parts), {deltas_path!r})\n"
        "ray.shutdown()\n")
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]

    ck_dyn = os.path.join(args.out, "ckpt_dyn")
    labels_dir = os.path.join(args.out, "labels")
    t0 = time.time()
    r = _cli([*cpu_args, "dynamic", "--edges",
              f"{graph_dir}/sym_edges",
              "--n-nodes", str(n_nodes), "--job-name", "dyn",
              "--deltas", deltas_path, "--ckpt-dir", ck_dyn,
              "--out", labels_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _last_json(r.stdout)
    manifest["stages"]["dynamic"] = {
        "secs": round(time.time() - t0, 1),
        "timesteps": recs if isinstance(recs, list) else [recs]}

    path = os.path.join(args.out, "manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest))
    print(f"# manifest: {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
