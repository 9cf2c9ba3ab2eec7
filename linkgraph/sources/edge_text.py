"""S1: raw text edge-list reader — parity with the reference converter's
input format (``graph.cpp:50-91``): whitespace rows ``src dst [w]``.

Ray-Data-native: ``read_text`` streams lines; parsing is a vectorized
``map_batches`` (pyarrow split + cast), no Python-per-row work.  The
output feeds the same ``symmetrize -> clean -> renumber`` pipeline as the
pages-derived links (pipelines/ingest.py), completing the ``convert``
preprocessing chain (main_convert.cpp:110-123) for text inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def parse_edge_lines(batch: pa.Table) -> pa.Table:
    """(text) -> (src:int64, dst:int64, w:float64); blank lines dropped,
    missing weight defaults to 1.0 (UNWEIGHTED semantics)."""
    lines = pc.utf8_trim_whitespace(batch.column("text"))
    keep = pc.greater(pc.utf8_length(lines), 0)
    lines = pc.filter(lines, keep)
    parts = pc.split_pattern_regex(lines, pattern=r"\s+")
    src = pc.list_element(parts, 0).cast(pa.int64())
    dst = pc.list_element(parts, 1).cast(pa.int64())
    lens = pc.list_value_length(parts)
    has_w = pc.greater_equal(lens, 3).to_numpy(zero_copy_only=False)
    if has_w.any():
        # third column only exists on some rows; element-wise guard
        w_np = np.ones(len(lines), dtype=np.float64)
        rows = np.flatnonzero(has_w)
        flat = parts.to_pylist()
        for i in rows:
            w_np[i] = float(flat[i][2])
        w = pa.array(w_np)
    else:
        w = pa.array(np.ones(len(lines), dtype=np.float64))
    return pa.table({"src": src, "dst": dst, "w": w})


def read_edge_text(path: str, **read_kwargs) -> rd.Dataset:
    """Edge-list text file(s) -> edges(src, dst, w) Dataset."""
    return rd.read_text(path, **read_kwargs).map_batches(
        parse_edge_lines, batch_format="pyarrow", zero_copy_batch=True)
