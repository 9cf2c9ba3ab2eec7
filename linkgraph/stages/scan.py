"""Distributed ordered prefix scan (exclusive running sum).

Ray Data has no scan primitive, yet corpus packing ("concatenate the
tokenized corpus, cut it into fixed-size training windows") is a
prefix-sum over the document order.  This is the classic three-wave
range-exchange scan:

    wave 1 (per input block, task):   strided sample of the order key
    driver:                           P-1 range boundaries from samples
    wave 2 (per input block, task):   split rows into the P key ranges
    wave 3 (per range, task):         concat + sort by key + local
                                      exclusive cumsum; emit the
                                      partition TOTAL as a side return
    driver:                           exclusive scan over the P totals
                                      (O(P) numbers, nothing row-sized)
    wave 4 (per range, task):         add the partition base, optional
                                      ``post`` projection

Rows cross the wire exactly once (wave 2 -> wave 3); the driver never
sees row data.  Output partitioning is by contiguous key range, so a
resumable writer can key output files on the range index.

The order key must be UNIQUE (checked per partition after the sort —
equal keys co-locate, so the per-partition check is global): with
duplicates the prefix of the tied rows would depend on block arrival
order.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .exchange import default_partitions


@ray.remote
def _scan_sample(tbl: pa.Table, order_col: str, k: int) -> np.ndarray:
    if tbl.num_rows == 0 or order_col not in tbl.column_names:
        return np.empty(0, np.int64)
    v = tbl.column(order_col).to_numpy()
    stride = max(1, len(v) // k)
    return np.sort(v[::stride].astype(np.int64))


@ray.remote
def _scan_split(tbl: pa.Table, order_col: str, bounds: np.ndarray, P: int):
    if tbl.num_rows == 0:
        return tuple(None for _ in range(P)) if P > 1 else None
    v = tbl.column(order_col).to_numpy()
    part = np.searchsorted(bounds, v, side="right")
    order = np.argsort(part, kind="stable")
    t = tbl.take(pa.array(order))
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    parts = tuple(t.slice(cuts[p], cuts[p + 1] - cuts[p])
                  for p in range(P))
    return parts if P > 1 else parts[0]


@ray.remote(num_returns=2)
def _scan_partial(order_col: str, value_col: str, *parts):
    tbls = [t for t in parts if t is not None and t.num_rows]
    if not tbls:
        typed = next((t for t in parts if t is not None), None)
        if typed is None:
            return None, 0
        return typed.select([order_col, value_col]), 0
    t = pa.concat_tables(tbls).combine_chunks()
    keys = t.column(order_col).to_numpy()
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise ValueError(
            f"ordered_prefix_scan: duplicate {order_col!r} values — "
            "the prefix of tied rows would be nondeterministic")
    vals = t.column(value_col).to_numpy()[order].astype(np.int64)
    within = np.concatenate([[0], np.cumsum(vals)[:-1]])
    out = pa.table({order_col: pa.array(keys),
                    value_col: pa.array(vals, pa.int64()),
                    "__within": pa.array(within, pa.int64())})
    return out, int(vals.sum())


@ray.remote
def _scan_finish(tbl, base: int, order_col: str, value_col: str,
                 out_col: str, post) -> pa.Table:
    if tbl is None:
        raise ValueError("ordered_prefix_scan: no typed input block")
    if tbl.num_rows == 0:
        out = pa.table({order_col: tbl.column(order_col),
                        value_col: pa.array([], pa.int64()),
                        out_col: pa.array([], pa.int64())})
    else:
        pre = tbl.column("__within").to_numpy() + np.int64(base)
        out = pa.table({order_col: tbl.column(order_col),
                        value_col: tbl.column(value_col),
                        out_col: pa.array(pre, pa.int64())})
    return post(out) if post is not None else out


def ordered_prefix_scan(
        ds: rd.Dataset, order_col: str, value_col: str, *,
        out_col: str = "prefix",
        post: Callable[[pa.Table], pa.Table] | None = None,
        num_partitions: int | None = None) -> rd.Dataset:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order.

    Returns a Dataset with columns (order_col, value_col:int64,
    out_col:int64) where ``out_col`` row i is the sum of ``value_col``
    over all rows with a smaller order key.  ``post`` runs on each
    output range partition (e.g. to derive packing bins from the
    offsets without an extra pass).
    """
    P = int(num_partitions or default_partitions())
    blocks = ds.materialize().to_arrow_refs()
    if not blocks:
        raise ValueError("ordered_prefix_scan on a dataset with no blocks")
    samples = ray.get([_scan_sample.remote(b, order_col, 4 * P)
                       for b in blocks])
    allv = np.sort(np.concatenate(samples)) if samples else \
        np.empty(0, np.int64)
    if len(allv) == 0:
        P = 1
        bounds = np.empty(0, np.int64)
    else:
        P = min(P, max(1, len(allv)))
        bounds = allv[np.linspace(0, len(allv) - 1, P + 1)
                      .astype(np.int64)][1:-1]
        bounds = np.unique(bounds)
        P = len(bounds) + 1
    split = [_scan_split.options(num_returns=P).remote(
        b, order_col, bounds, P) for b in blocks]
    if P == 1:
        split = [[r] for r in split]
    partials = [_scan_partial.remote(order_col, value_col,
                                     *[split[i][p]
                                       for i in range(len(split))])
                for p in range(P)]
    totals = ray.get([t for _, t in partials])
    bases = np.concatenate([[0], np.cumsum(totals[:-1])]).astype(np.int64)
    outs = [_scan_finish.remote(tbl, int(bases[p]), order_col, value_col,
                                out_col, post)
            for p, (tbl, _) in enumerate(partials)]
    counts = ray.get([_n_rows.remote(r) for r in outs])
    kept = [r for r, n in zip(outs, counts) if n]
    return rd.from_arrow_refs(kept if kept else outs[:1])


@ray.remote
def _n_rows(t: pa.Table) -> int:
    return t.num_rows
