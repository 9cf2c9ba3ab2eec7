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
        # third column only exists on some rows: slice each list to its
        # [2, 3) window (empty for 2-column rows), flatten, cast — one
        # vectorized pass, no Python row loop
        w_np = np.ones(len(lines), dtype=np.float64)
        third = pc.list_flatten(pc.list_slice(parts, 2, 3)) \
            .cast(pa.float64()).to_numpy(zero_copy_only=False)
        w_np[has_w] = third
        w = pa.array(w_np)
    else:
        w = pa.array(np.ones(len(lines), dtype=np.float64))
    return pa.table({"src": src, "dst": dst, "w": w})


def read_edge_text(path: str, **read_kwargs) -> rd.Dataset:
    """Edge-list text file(s) -> edges(src, dst, w) Dataset."""
    return rd.read_text(path, **read_kwargs).map_batches(
        parse_edge_lines, batch_format="pyarrow", zero_copy_batch=True)


def mtx_header(path: str) -> tuple[int, int]:
    """(n_vertices, n_edges) from a MatrixMarket header — the first
    non-comment line ``V V E`` (utils.cu:16-20)."""
    with open(path) as f:
        for line in f:
            if not line.startswith("%"):
                v, _, e = line.split()[:3]
                return int(v), int(e)
    raise ValueError(f"{path}: no MatrixMarket size header found")


def read_mtx(path: str, *, symmetrize: bool = True,
             **read_kwargs) -> rd.Dataset:
    """S10: MatrixMarket reader with the REFERENCE's semantics
    (``/root/reference/src/gpu-louvain/utils.cu:11-66``), as a streaming
    Dataset: ``%`` comment lines skipped, the ``V V E`` size header
    consumed, data rows ``src dst [w]`` taken 0-INDEXED (the reference
    comments out the standard MTX ``v1--``/``v2--`` decrement —
    utils.cu:36-37 — so ids are used as written), and non-self edges
    mirrored (``symmetrize=True``, matching the reader's internal
    adjacency build; pass False for the raw directed rows).

    The header row is identified structurally: valid 0-indexed data rows
    have src,dst <= V-1, so the row matching the full header triple
    ``V V E`` is the header — no driver-side line counting, so the text
    read stays a distributed Dataset scan.  Matching all THREE header
    fields (not just ``src == dst == V``) means a data row ``V V w`` in
    a 1-indexed file is only mis-dropped in the measure-zero case
    w == E; the reference consumes the header positionally and reads
    such files with ids-as-written regardless (utils.cu:16-37).
    ``path`` must be a single file (one header per file; mtx_header's
    sequential open rejects globs).
    """
    n_nodes, n_edges = mtx_header(path)

    def parse(batch: pa.Table) -> pa.Table:
        lines = pc.utf8_trim_whitespace(batch.column("text"))
        keep = pc.and_(pc.greater(pc.utf8_length(lines), 0),
                       pc.invert(pc.starts_with(lines, pattern="%")))
        t = parse_edge_lines(pa.table({"text": pc.filter(lines, keep)}))
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        w = t.column("w").to_numpy()
        # drop the header: all three fields must match (V V E)
        data = ~((src == n_nodes) & (dst == n_nodes) & (w == n_edges))
        src, dst, w = src[data], dst[data], w[data]
        if symmetrize:
            nonself = src != dst
            src, dst, w = (np.concatenate([src, dst[nonself]]),
                           np.concatenate([dst, src[nonself]]),
                           np.concatenate([w, w[nonself]]))
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "w": pa.array(w, pa.float64())})

    return rd.read_text(path, **read_kwargs).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True)
