"""S1 text edge reader + the ray-job CLI entry."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from linkgraph.fixtures.toy import base_edge_array
from linkgraph.sources.edge_text import parse_edge_lines, read_edge_text


def test_parse_edge_lines_unweighted_and_weighted():
    tbl = pa.table({"text": ["0 1", "  2   3  ", "", "4 5 2.5"]})
    out = parse_edge_lines(tbl)
    assert out.column("src").to_pylist() == [0, 2, 4]
    assert out.column("dst").to_pylist() == [1, 3, 5]
    assert out.column("w").to_pylist() == [1.0, 1.0, 2.5]


def test_read_edge_text_toy(tmp_path, ray_session):
    src, dst, w = base_edge_array()
    path = tmp_path / "toy.txt"
    path.write_text("".join(f"{s} {d}\n" for s, d in zip(src, dst)))
    ds = read_edge_text(str(path))
    got = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    order = np.lexsort((dst, src))
    assert got["src"].tolist() == src[order].tolist()
    assert got["dst"].tolist() == dst[order].tolist()


def test_read_mtx_reference_semantics(tmp_path, ray_session):
    """S10: comments skipped, header consumed structurally, ids taken
    0-indexed (the reference's commented-out decrement, utils.cu:36-37),
    non-self edges mirrored."""
    from linkgraph.sources.edge_text import mtx_header, read_mtx
    p = tmp_path / "g.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "% a comment\n"
                 "4 4 3\n"
                 "0 1 2.0\n"
                 "1 2 1.5\n"
                 "3 3 4.0\n")
    assert mtx_header(str(p)) == (4, 3)
    got = read_mtx(str(p)).to_pandas().sort_values(
        ["src", "dst"]).reset_index(drop=True)
    # mirrored non-self edges; self-loop (3,3) single-sided
    assert list(zip(got["src"], got["dst"], got["w"])) == [
        (0, 1, 2.0), (1, 0, 2.0), (1, 2, 1.5), (2, 1, 1.5), (3, 3, 4.0)]
    raw = read_mtx(str(p), symmetrize=False).to_pandas()
    assert len(raw) == 3


def test_cli_pagerank_job(tmp_path):
    """Drive the ray-job entry in a fresh process (owns its Ray session)."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 200, 3000)
    dst = rng.integers(0, 200, 3000)
    keep = src != dst
    pq.write_table(pa.table({"src": src[keep], "dst": dst[keep]}),
                   tmp_path / "edges.parquet")
    out = subprocess.run(
        [sys.executable, "-m", "linkgraph.cli", "--num-cpus", "4",
         "pagerank", "--edges", str(tmp_path / "edges.parquet"),
         "--n-nodes", "200", "--n-parts", "2",
         "--out", str(tmp_path / "rank"), "--max-iter", "50"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-1500:]
    res = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert res["iterations"] >= 1
    rank = pq.read_table(str(tmp_path / "rank"))
    assert rank.num_rows == 200
    assert abs(sum(rank.column("rank").to_pylist()) - 1.0) < 1e-6


def test_cli_curate_job(tmp_path):
    """Drive the curation job end-to-end in a fresh process: curated /
    split / pack parquet outputs over the sf0.001 documents table."""
    out = subprocess.run(
        [sys.executable, "-m", "linkgraph.cli", "--num-cpus", "4",
         "curate", "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--out", str(tmp_path / "cur"), "--min-score", "0.5"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-1500:]
    res = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert res["docs"] == 500 and 0 < res["curated"] < 500
    cur = pq.read_table(str(tmp_path / "cur" / "curated"))
    assert cur.num_rows == res["curated"]
    spl = pq.read_table(str(tmp_path / "cur" / "split"))
    assert spl.num_rows == 500
    pack = pq.read_table(str(tmp_path / "cur" / "pack")).to_pandas() \
        .sort_values("doc_id")
    assert len(pack) == res["curated"]
    # offsets are a valid exclusive prefix sum over the curated docs
    import numpy as np
    off = pack["start_offset"].to_numpy()
    tok = pack["n_tokens"].to_numpy()
    assert off[0] == 0
    assert (np.diff(off) == tok[:-1]).all()


def test_cli_dynamic_dataset_path_matches_driver(tmp_path):
    """cmd_dynamic's two delta routes — driver pandas (small files) and
    streamed Datasets through the routed exchange (--driver-delta-rows
    below the file size) — must produce identical per-phase records and
    final labels on the same input (M5-clean deltas: no dups, no
    self-loops)."""
    rng = np.random.default_rng(3)
    src = rng.integers(0, 100, 800)
    dst = rng.integers(0, 100, 800)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # symmetric deduped edge table with multiplicity weights
    import pandas as pd
    e = pd.DataFrame({"src": np.concatenate([src, dst]),
                      "dst": np.concatenate([dst, src])})
    e = e.groupby(["src", "dst"]).size().rename("w").reset_index()
    pq.write_table(pa.Table.from_pandas(e, preserve_index=False)
                   .set_column(2, "w", pa.array(e["w"], pa.float64())),
                   tmp_path / "edges.parquet")
    # two timesteps: delete a few existing edges, add a few new ones
    dels = e.head(6)[["src", "dst"]]
    adds = pd.DataFrame({"src": [101, 102, 103, 104],
                         "dst": [1, 2, 3, 104 + 1]})
    deltas = pd.DataFrame({
        "ts": [0] * 3 + [0] * 2 + [1] * 3 + [1] * 2,
        "op": ["del"] * 3 + ["add"] * 2 + ["del"] * 3 + ["add"] * 2,
        "src": np.concatenate([dels["src"].to_numpy()[:3],
                               adds["src"].to_numpy()[:2],
                               dels["src"].to_numpy()[3:6],
                               adds["src"].to_numpy()[2:]]),
        "dst": np.concatenate([dels["dst"].to_numpy()[:3],
                               adds["dst"].to_numpy()[:2],
                               dels["dst"].to_numpy()[3:6],
                               adds["dst"].to_numpy()[2:]]),
    })
    deltas["w"] = 1.0
    pq.write_table(pa.Table.from_pandas(deltas, preserve_index=False),
                   tmp_path / "deltas.parquet")

    def run(extra, out):
        r = subprocess.run(
            [sys.executable, "-m", "linkgraph.cli", "--num-cpus", "4",
             "dynamic", "--edges", str(tmp_path / "edges.parquet"),
             "--n-nodes", "100", "--n-parts", "2",
             "--deltas", str(tmp_path / "deltas.parquet"),
             "--out", str(tmp_path / out)] + extra,
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-1500:]
        return json.loads([l for l in r.stdout.splitlines()
                           if l.startswith("[")][-1])

    rec_drv = run([], "lab_drv")                       # pandas path
    rec_ds = run(["--driver-delta-rows", "0"], "lab_ds")  # dataset path
    assert len(rec_drv) == len(rec_ds) == 4            # 2 ts x 2 phases
    for a, b in zip(rec_drv, rec_ds):
        assert (a["ts"], a["phase"]) == (b["ts"], b["phase"])
        assert abs(a["modularity"] - b["modularity"]) < 1e-12
        assert a["r_size"] == b["r_size"]
        assert a["n_nodes"] == b["n_nodes"]
    la = pq.read_table(str(tmp_path / "lab_drv")).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    lb = pq.read_table(str(tmp_path / "lab_ds")).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert la.equals(lb)


def test_write_committed_resume(tmp_path, ray_session):
    """_SUCCESS-gated writes skip committed dirs and clear partial ones."""
    import pyarrow as pa
    import ray.data as rd
    from linkgraph.common import write_committed

    d = str(tmp_path / "out")
    calls = []

    def make():
        calls.append(1)
        return rd.from_arrow(pa.table({"x": [1, 2, 3]}))

    assert write_committed(make, d) is True
    assert write_committed(make, d) is False          # skip: committed
    assert len(calls) == 1                            # thunk not rebuilt
    # partial dir (no marker) is cleared and rewritten
    import os
    os.remove(os.path.join(d, "_SUCCESS"))
    assert write_committed(make, d) is True
    assert pq.read_table(d).num_rows == 3


def test_read_mtx_header_match_is_full_triple(tmp_path, ray_session):
    """A data row that happens to be ``V V w`` (1-indexed file with a
    self-loop at the last vertex) survives unless it matches the FULL
    header triple ``V V E`` (ADVICE r4: the src==dst==V-only match
    silently dropped such rows)."""
    from linkgraph.sources.edge_text import read_mtx
    p = tmp_path / "g.mtx"
    # 1-indexed-style file: ids go 1..4, self-loop "4 4 2.0" is data
    p.write_text("%%MatrixMarket matrix coordinate real general\n"
                 "4 4 3\n"
                 "1 2 1.0\n"
                 "4 4 2.0\n"
                 "2 3 1.0\n")
    raw = read_mtx(str(p), symmetrize=False).to_pandas().sort_values(
        ["src", "dst"]).reset_index(drop=True)
    assert list(zip(raw["src"], raw["dst"], raw["w"])) == [
        (1, 2, 1.0), (2, 3, 1.0), (4, 4, 2.0)]


def test_cli_pagerank_checkpoint_resume(tmp_path):
    """Kill-resume operational path: a checkpointed pagerank job rerun
    with --resume restores the newest committed step, skips the finished
    supersteps (start_iter > 0), and converges to the same fixed point
    as an uninterrupted run."""
    rng = np.random.default_rng(5)
    src = rng.integers(0, 300, 5000)
    dst = rng.integers(0, 300, 5000)
    keep = src != dst
    pq.write_table(pa.table({"src": src[keep], "dst": dst[keep]}),
                   tmp_path / "edges.parquet")
    base = [sys.executable, "-m", "linkgraph.cli", "--num-cpus", "4",
            "pagerank", "--edges", str(tmp_path / "edges.parquet"),
            "--n-nodes", "300", "--n-parts", "2", "--job-name", "pr",
            "--tol", "0", "--ckpt-dir", str(tmp_path / "ck"),
            "--checkpoint-every", "5"]
    # leg 1: run only 10 iters (simulates a job that died at iter 10 —
    # the checkpoint at step-10 is committed, the result is NOT written)
    out = subprocess.run([*base, "--max-iter", "10"],
                         capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-1500:]
    # leg 2: resume to 30 iters; must start from superstep 10
    out = subprocess.run(
        [*base, "--max-iter", "30", "--resume",
         "--out", str(tmp_path / "rank")],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-1500:]
    res = json.loads([l for l in out.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert res["start_iter"] == 10
    assert res["iterations"] == 30
    got = pq.read_table(str(tmp_path / "rank")).to_pandas() \
        .sort_values("node")["rank"].to_numpy()
    # uninterrupted reference run, same fixed 30 iterations
    out = subprocess.run(
        [*base[:-4], "--max-iter", "30",
         "--out", str(tmp_path / "rank_ref")],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-1500:]
    want = pq.read_table(str(tmp_path / "rank_ref")).to_pandas() \
        .sort_values("node")["rank"].to_numpy()
    np.testing.assert_allclose(got, want, atol=1e-12)
    # zero-iteration resume edge: landing exactly on the newest
    # checkpointed superstep must still print VALID JSON (delta was
    # float('inf') -> bare Infinity before the CLI sanitizer)
    out = subprocess.run(
        [*base, "--max-iter", "30", "--resume", "--tol", "1e-10"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-1500:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["start_iter"] == 30 and res["iterations"] == 30
    assert "Infinity" not in line
