"""Hierarchy composition (S7/J3): read the per-level ``(node, labels)``
parquet written by ``GraphEngine.louvain(hierarchy_dir=...)`` and compose
levels into final community membership.

The reference re-parses ``graph{t}.tree`` level blocks and iterates
``n2c[node] = levels[l][n2c[node]]`` (``find_NodCom``,
``main_louvain.cpp:352-416``; ``main_hierarchy.cpp:149-159``).  Levels
shrink geometrically, so every level above 0 is small: level 0 streams as
a Dataset; deeper levels are broadcast dense arrays (J3 broadcast join).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _level_dirs(hierarchy_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(hierarchy_dir, "level-*")))


def load_level_array(level_dir: str) -> np.ndarray:
    """One level as a dense node->comm array (levels above 0 are small)."""
    import pyarrow.parquet as pq
    tbls = [pq.read_table(f) for f in
            sorted(glob.glob(os.path.join(level_dir, "part-*.parquet")))]
    tbl = pa.concat_tables(tbls)
    node = tbl.column("node").to_numpy()
    lab = tbl.column("labels").to_numpy()
    out = np.full(int(node.max(initial=-1)) + 1, -1, dtype=np.int64)
    out[node] = lab
    return out


def compose_hierarchy(hierarchy_dir: str, upto_level: int | None = None
                      ) -> rd.Dataset:
    """labels(node, comm) Dataset: every original node's community in the
    deepest (or ``upto_level``-th) level's id space.

    Level 0 is read as a streaming Dataset; deeper levels are composed
    via one broadcast array (product of the small per-level maps)."""
    dirs = _level_dirs(hierarchy_dir)
    if upto_level is not None:
        dirs = dirs[:upto_level + 1]
    assert dirs, f"no level dirs under {hierarchy_dir}"
    base = rd.read_parquet(dirs[0])
    if len(dirs) == 1:
        return base.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "comm": t.column("labels")}),
            batch_format="pyarrow")
    # fold levels 1..L into one composed map, then broadcast
    composed = load_level_array(dirs[1])
    for d in dirs[2:]:
        nxt = load_level_array(d)
        composed = nxt[composed]
    map_ref = ray.put(composed)

    def apply(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        return pa.table({"node": t.column("node"),
                         "comm": m[t.column("labels").to_numpy()]})

    return base.map_batches(apply, batch_format="pyarrow")
