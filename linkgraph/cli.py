"""Job entry point — run pipelines via ``ray job submit`` (north rule):

    ray job submit -- python -m linkgraph.cli ingest \
        --pages /data/pages --out /data/graph
    ray job submit -- python -m linkgraph.cli pagerank \
        --edges /data/graph/edges --n-nodes 5000000 --out /data/rank \
        --ckpt-dir /data/ckpt --checkpoint-every 5
    ray job submit -- python -m linkgraph.cli louvain \
        --edges /data/graph/sym_edges --n-nodes 5000000 \
        --hierarchy-dir /data/hier --out /data/labels
    ray job submit -- python -m linkgraph.cli dynamic \
        --edges ... --deltas /data/deltas --out /data/labels

Owns the Ray session (guarded init — the driver/pytest own theirs)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init(num_cpus: int | None):
    import ray
    import ray.data as rd
    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(address="local", **kw)
    rd.DataContext.get_current().enable_progress_bars = False


def _build_engine(args, warmup: str = "base"):
    import ray.data as rd
    from .state.engine import GraphEngine
    edges = rd.read_parquet(args.edges)
    eng = GraphEngine.from_dataset(
        edges, n_nodes=args.n_nodes,
        n_parts=args.n_parts, name=args.job_name, warmup=warmup)
    eng.louvain_driver_threshold = getattr(args, "driver_threshold", 0)
    return eng


def cmd_ingest(args):
    from .pipelines.ingest import ingest
    out = ingest(args.pages, out_dir=args.out)
    print(json.dumps({"nodes": out["nodes"].count(),
                      "edges": out["edges"].count(),
                      "sym_edges": out["sym_edges"].count()}))


def cmd_pagerank(args):
    import ray
    import ray.data as rd
    eng = _build_engine(args)
    start_iter = 0
    if getattr(args, "resume", False) and args.ckpt_dir:
        # kill-resume: rebuild structure terms (pagerank_init), then
        # overwrite the rank vector from the newest _SUCCESS-committed
        # checkpoint and continue the iteration count from its superstep
        # (the test_pagerank_resume recipe, S5 partition/labels reader)
        latest = eng.latest_checkpoint(args.ckpt_dir)
        if latest is not None:
            start_iter = latest[0]
            ray.get([a.pagerank_init.remote(0.85) for a in eng.actors])
            if not eng.restore(args.ckpt_dir, start_iter, ["rank"]):
                start_iter = 0
    res = eng.pagerank(tol=args.tol, max_iter=args.max_iter,
                       checkpoint_every=args.checkpoint_every,
                       ckpt_dir=args.ckpt_dir, start_iter=start_iter)
    res["start_iter"] = start_iter
    # a resume landing exactly on the final checkpointed superstep runs
    # zero iterations and leaves delta = inf, which json.dumps would
    # print as bare Infinity (invalid JSON on the CLI stdout contract)
    import math
    if not math.isfinite(res.get("delta", 0.0)):
        res["delta"] = None
    if args.out:
        refs = [a.pagerank_result.remote() for a in eng.actors]
        rd.from_arrow_refs(refs).write_parquet(args.out)
    eng.shutdown()
    print(json.dumps(res))


def cmd_louvain(args):
    import ray.data as rd
    eng = _build_engine(args, warmup="louvain")
    if args.quality == 0:
        res = eng.louvain(hierarchy_dir=args.hierarchy_dir)
    else:
        # -q 1..9 (main_louvain.cpp:889-899): variant kernel; for q=4/7
        # the E9/E10 reweighting + E4 selfloops run in-shard first
        res = eng.louvain_quality(args.quality, alpha=args.alpha,
                                  kmin=args.kmin)
    if args.out:
        refs = [a.lv_labels_result.remote() for a in eng.actors]
        rd.from_arrow_refs(refs).write_parquet(args.out)
    eng.shutdown()
    print(json.dumps({k: res[k] for k in
                      ("modularity", "n_levels", "n_comms")}))


# Above this many delta rows cmd_dynamic stops materializing the file
# on the driver and streams each (ts, op) batch as a Ray Dataset into
# the engine's routed exchange (apply_delta_dataset path) — nothing
# O(#deltas) touches driver memory.
DRIVER_DELTA_ROWS = 5_000_000


def cmd_dynamic(args):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    eng = _build_engine(args, warmup="louvain")
    eng.louvain()
    records = []
    ds = rd.read_parquet(args.deltas)
    threshold = args.driver_delta_rows
    if ds.count() <= threshold:
        # small file: driver pandas keeps the convenience path (and the
        # O1 sort contract is explicit)
        deltas = pq.read_table(args.deltas).to_pandas() \
            .sort_values(["ts", "op", "src", "dst"])
        for ts, g in deltas.groupby("ts"):
            batch = {}
            for op in ("del", "add"):
                sel = g[g["op"] == op]
                batch[op] = (sel["src"].to_numpy(), sel["dst"].to_numpy(),
                             sel["w"].to_numpy() if "w" in sel else
                             np.ones(len(sel)))
            records.extend(eng.dynamic_step(int(ts), batch, mode=args.mode,
                                            ckpt_dir=args.ckpt_dir))
    else:
        # scale path: per-(ts, op) filtered Datasets feed the owner-
        # routed delta exchange (engine.apply_delta_dataset semantics);
        # the driver only ever sees the tiny distinct-ts list
        cols = [c for c in ("src", "dst", "w") if c in ds.schema().names]
        ts_rows = ds.groupby("ts").count().take_all()
        for ts in sorted(int(r["ts"]) for r in ts_rows):
            batch = {}
            for op in ("del", "add"):
                sel = (ds.filter(expr=f"ts == {ts} and op == '{op}'")
                       .select_columns(cols))
                batch[op] = sel
            records.extend(eng.dynamic_step(int(ts), batch, mode=args.mode,
                                            ckpt_dir=args.ckpt_dir))
    if args.out:
        import ray.data as rd
        refs = [a.lv_labels_result.remote() for a in eng.actors]
        rd.from_arrow_refs(refs).write_parquet(args.out)
    eng.shutdown()
    print(json.dumps(records))


def cmd_curate(args):
    """Training-data curation job: curate -> split -> pack, partitioned
    parquet outputs (each directory independently recomputable)."""
    import pyarrow as pa
    import ray.data as rd

    from .common import strip_meta, write_committed
    from .text.ops import curate, pack_docs, train_split_batch

    docs = strip_meta(rd.read_parquet(args.docs))
    kept = curate(docs, lang=args.lang,
                  min_score=args.min_score).materialize()
    n_docs, n_kept = docs.count(), kept.count()
    if args.out:
        # each directory is _SUCCESS-gated: a rerun after a mid-job
        # failure skips the committed outputs (resumable, like ingest)
        write_committed(lambda: kept, f"{args.out}/curated")
        write_committed(
            lambda: docs.map_batches(train_split_batch,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True),
            f"{args.out}/split")

        def _pack():
            # pack only the curated survivors: join the keep ids back
            # to the text, then the range-exchange prefix scan
            ids = kept.map_batches(
                lambda t: pa.table({"keep_id": t.column("doc_id")}),
                batch_format="pyarrow")
            from .pipelines.ingest import join_partitions
            surv = docs.select_columns(["doc_id", "text"]).join(
                ids, join_type="inner", num_partitions=join_partitions(),
                on=("doc_id",), right_on=("keep_id",))
            return pack_docs(surv, capacity=args.capacity)

        write_committed(_pack, f"{args.out}/pack")
    print(json.dumps({"docs": n_docs, "curated": n_kept}))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="linkgraph")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_ingest)

    def graph_args(p):
        p.add_argument("--edges", required=True)
        p.add_argument("--n-nodes", type=int, required=True)
        p.add_argument("--n-parts", type=int, default=8)
        p.add_argument("--job-name", default="job")
        p.add_argument("--out", default=None)
        p.add_argument("--ckpt-dir", default=None)
        # opt-in small-graph Louvain fast path (0 = always distributed);
        # see GraphEngine.louvain_driver_threshold
        p.add_argument("--driver-threshold", type=int, default=0)

    p = sub.add_parser("pagerank")
    graph_args(p)
    p.add_argument("--tol", type=float, default=1e-10)
    p.add_argument("--max-iter", type=int, default=200)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="continue from the newest committed checkpoint "
                        "in --ckpt-dir (kill-resume)")
    p.set_defaults(fn=cmd_pagerank)

    p = sub.add_parser("louvain")
    graph_args(p)
    p.add_argument("--hierarchy-dir", default=None)
    # the reference's -q / -c / -k knobs (main_louvain.cpp:889-948)
    p.add_argument("-q", "--quality", type=int, default=0,
                   choices=range(10),
                   help="quality function id 0..9 (0 = Modularity)")
    p.add_argument("-c", "--alpha", type=float, default=0.5,
                   help="Owsinski-Zadrozny alpha (q=2)")
    p.add_argument("-k", "--kmin", type=int, default=1,
                   help="Shi-Malik kappa_min (q=8)")
    p.set_defaults(fn=cmd_louvain)

    p = sub.add_parser("dynamic")
    graph_args(p)
    p.add_argument("--deltas", required=True)
    p.add_argument("--mode", choices=("delta", "full", "static"),
                   default="delta")
    p.add_argument("--driver-delta-rows", type=int,
                   default=DRIVER_DELTA_ROWS,
                   help="deltas files above this many rows stream as "
                        "Datasets through the routed exchange instead "
                        "of driver pandas")
    p.set_defaults(fn=cmd_dynamic)

    p = sub.add_parser("curate")
    p.add_argument("--docs", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--lang", default="en")
    p.add_argument("--min-score", type=float, default=0.5)
    p.add_argument("--capacity", type=int, default=256)
    p.set_defaults(fn=cmd_curate)

    args = ap.parse_args(argv)
    _init(args.num_cpus)
    t0 = time.time()
    args.fn(args)
    print(f"# done in {time.time() - t0:.1f}s", file=sys.stderr)
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
