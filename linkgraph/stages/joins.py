"""As-of and range (band) joins: temporal lookups Ray Data lacks
natively (its ``Dataset.join`` is equality-only).

Both are the composition the SURVEY §2.4 mapping prescribes: a
two-stage hash exchange on the equality (``by``) key — the same
splitmix64 partitioner as ``stages.exchange`` — followed by a
per-partition vectorized merge (``pandas.merge_asof`` backward search /
structured-dtype double-``searchsorted`` window probes).

Partitioning assumption (documented per the north rule): the whole
history of one ``by`` key must land in one partition, because a backward
search is a per-key scan.  Hash partitioning on ``by`` guarantees that;
a pathologically hot key bounds its partition's work by that key's own
history (mitigate upstream by pre-filtering the right side to the left's
key range, or range-splitting ``on`` with boundary replication).

Determinism: as-of ties on the right ``on`` key resolve to the largest
``right_tie`` value (rows sorted ascending by ``(on, tie)``;
``merge_asof`` picks the last qualifying row), so results are identical
at any parallelism.

Key contract (checked loudly): ``by`` columns are integers (splitmix64
hash partitioning + exact rank equality); ``on`` columns are integers or
timestamps (compared by their epoch-us ticks).  Hash string keys to
int64 upstream (see ``pipelines.ingest``'s fingerprint index for the
pattern); float keys are rejected rather than silently truncated.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .exchange import _key_hash, default_partitions

_U64 = np.uint64


def _to_int64(s: pd.Series, col: str) -> np.ndarray:
    """Order-preserving int64 view of an ``on`` column (timestamps
    compare as their epoch-us ticks).  Floats are rejected: truncation
    would silently move window boundaries."""
    v = s.to_numpy()
    if v.dtype.kind == "M":
        return v.astype("datetime64[us]").astype(np.int64)
    if v.dtype.kind not in "iu":
        raise TypeError(f"on-column {col!r} must be integer or timestamp, "
                        f"got {v.dtype}")
    return v.astype(np.int64)


def _int_keys(arr, col: str) -> np.ndarray:
    v = arr.to_numpy() if not isinstance(arr, np.ndarray) else arr
    if v.dtype.kind not in "iu":
        raise TypeError(f"by-column {col!r} must be integer (hash string "
                        f"keys to int64 upstream), got {v.dtype}")
    return v.astype(np.int64)


@ray.remote
def _split_by_key(tbl: pa.Table, by: str, P: int):
    """Hash-split one block into P row partitions on the ``by`` column."""
    if tbl.num_rows == 0:
        return None if P == 1 else tuple(None for _ in range(P))
    keys = _int_keys(tbl.column(by), by)
    if P == 1:
        return tbl
    part = (_key_hash([keys]) % _U64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    tbl = tbl.take(pa.array(order))
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    return tuple(tbl.slice(cuts[p], cuts[p + 1] - cuts[p])
                 for p in range(P))


@ray.remote
def _block_schema(t: pa.Table):
    return t.schema if t.num_columns else None


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


def _typed_schema(blocks, side: str) -> pa.Schema:
    """First non-degenerate block schema (Ray repartition can emit
    schema-less 0-column filler blocks — same guard as exchange.py)."""
    for s in ray.get([_block_schema.remote(b) for b in blocks]):
        if s is not None:
            return s
    raise ValueError(f"asof/band join: every {side} block is schema-less")


def _copartition(lblocks, rblocks, left_by: str, right_by: str, P: int,
                 reduce_remote, meta: dict) -> rd.Dataset:
    """Shared driver epilogue: hash-split both sides, one reduce task per
    partition, drop empty output partitions (Ray Data map operators skip
    zero-row blocks, which poisons schema-changing downstream maps)."""
    lsplit = [_split_by_key.options(num_returns=P).remote(b, left_by, P)
              for b in lblocks]
    rsplit = [_split_by_key.options(num_returns=P).remote(b, right_by, P)
              for b in rblocks]
    if P == 1:
        lsplit = [[r] for r in lsplit]
        rsplit = [[r] for r in rsplit]
    outs = [reduce_remote.remote(meta, len(lsplit),
                                 *[s[p] for s in lsplit],
                                 *[s[p] for s in rsplit])
            for p in range(P)]
    counts = ray.get([_nrows.remote(r) for r in outs])
    kept = [r for r, n in zip(outs, counts) if n]
    return rd.from_arrow_refs(kept if kept else outs[:1])


# --------------------------------------------------------------- as-of join

@ray.remote
def _asof_reduce(meta: dict, n_left: int, *parts) -> pa.Table:
    """Merge one co-partition: concat sides, sort, backward merge."""
    lby, lon = meta["left_by"], meta["left_on"]
    rby, ron = meta["right_by"], meta["right_on"]
    tie, rvals, how = meta["right_tie"], meta["right_values"], meta["how"]

    lt = [t for t in parts[:n_left] if t is not None and t.num_rows]
    rt = [t for t in parts[n_left:] if t is not None and t.num_rows]
    lcols = list(meta["left_schema"].names)
    out_schema = pa.schema(
        [meta["left_schema"].field(c) for c in lcols]
        + [meta["right_schema"].field(c) for c in rvals])

    def empty() -> pa.Table:
        return out_schema.empty_table()

    if not lt:
        return empty()
    left = pa.concat_tables(lt).to_pandas()
    if not rt:
        if how == "inner":
            return empty()
        for c in rvals:
            left[c] = pd.Series([None] * len(left),
                                dtype=object)
        return pa.Table.from_pandas(left[lcols + list(rvals)],
                                    schema=out_schema,
                                    preserve_index=False)
    right = pa.concat_tables(rt).to_pandas()

    left["__on"] = _to_int64(left[lon], lon)
    right["__on"] = _to_int64(right[ron], ron)
    # non-null match sentinel: a matched row whose FIRST right value is
    # null in the source data must not be mistaken for "no match"
    right["__m"] = np.int8(1)
    left = left.sort_values("__on", kind="stable")
    rsort = ["__on"] + ([tie] if tie else [])
    right = right.sort_values(rsort, kind="stable")
    right = right[[rby, "__on", "__m"] + [c for c in rvals if c != rby]]

    merged = pd.merge_asof(left, right, on="__on",
                           left_by=lby, right_by=rby,
                           direction="backward",
                           allow_exact_matches=True)
    if how == "inner":
        merged = merged[merged["__m"].notna()]
    cols: dict[str, pa.Array] = {
        c: pa.array(merged[c], out_schema.field(c).type, from_pandas=True)
        for c in lcols}
    for c in rvals:
        typ = out_schema.field(c).type
        v = merged[c]
        if pa.types.is_integer(typ) and v.dtype.kind == "f":
            # no-match float upcast: restore ints via explicit null mask
            mask = v.isna().to_numpy()
            arr = v.fillna(0).to_numpy().astype(typ.to_pandas_dtype())
            cols[c] = pa.array(arr, typ, mask=mask)
        else:
            cols[c] = pa.array(v, typ, from_pandas=True)
    return pa.table(cols).cast(out_schema)


def asof_join(left: rd.Dataset, right: rd.Dataset, *,
              left_by: str, right_by: str,
              left_on: str, right_on: str,
              right_values: Sequence[str],
              right_tie: str | None = None,
              how: str = "inner",
              num_partitions: int | None = None) -> rd.Dataset:
    """Backward as-of join of ``left`` to ``right``.

    For each left row, finds the right row with the same ``by`` key and
    the greatest ``on`` value <= the left's ``on`` value (ties broken by
    the greatest ``right_tie``).  Returns the left columns plus
    ``right_values`` (null / dropped per ``how`` when no match).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r}")
    rvals = [c for c in right_values]
    if right_by in rvals:
        raise ValueError("right_values must not contain right_by")
    P = int(num_partitions or default_partitions())

    lblocks = left.materialize().to_arrow_refs()
    rproj = list(dict.fromkeys([right_by, right_on] +
                               ([right_tie] if right_tie else []) + rvals))
    rblocks = right.select_columns(rproj).materialize().to_arrow_refs()
    if not lblocks or not rblocks:
        raise ValueError("asof_join on a dataset with no blocks")
    lschema = _typed_schema(lblocks, "left")
    rschema = _typed_schema(rblocks, "right")
    clash = set(lschema.names) & (set(rvals) | ({right_by} - {left_by}))
    if clash:
        raise ValueError(f"left/right column name clash: {sorted(clash)}; "
                         "rename before joining")
    # reserved scratch names: __on holds the int64 tick conversion and
    # __m the match sentinel inside the reduce — a real column of either
    # name would be silently overwritten / suffixed by merge_asof
    reserved = {"__on", "__m"} & (set(lschema.names) | set(rschema.names))
    if reserved:
        raise ValueError(f"column names {sorted(reserved)} are reserved "
                         "by asof_join; rename before joining")
    # by-key dtype widths must match or pd.merge_asof raises a cryptic
    # MergeError deep inside the reduce task — check loudly up front
    lbt = lschema.field(left_by).type
    rbt = rschema.field(right_by).type
    # an all-empty side materializes with null-typed columns — that is
    # the typed-empty contract, not a key-width mismatch
    if lbt != rbt and not (pa.types.is_null(lbt)
                           or pa.types.is_null(rbt)):
        raise ValueError(f"asof_join by-key dtypes differ: "
                         f"{left_by}={lbt} vs {right_by}={rbt}; "
                         "cast to a common type before joining")
    meta = {"left_by": left_by, "left_on": left_on,
            "right_by": right_by, "right_on": right_on,
            "right_tie": right_tie, "right_values": rvals, "how": how,
            "left_schema": lschema, "right_schema": rschema}
    return _copartition(lblocks, rblocks, left_by, right_by, P,
                        _asof_reduce, meta)


# --------------------------------------------------------------- band join

@ray.remote
def _band_reduce(meta: dict, n_left: int, *parts) -> pa.Table:
    """Merge one co-partition of a band join: every (left, right) pair
    with equal ``by`` keys and ``right_on`` within
    ``[left_on + lo, left_on + hi]`` (inclusive, signed offsets).

    Fully vectorized: both sides dense-rank their ``by`` keys jointly,
    the right side sorts once by (rank, on), and the per-left-row window
    becomes two structured-dtype ``searchsorted`` probes (numpy compares
    structured records field-lexicographically, so no composite-int
    overflow concerns); pairs are emitted with the repeat/arange gather."""
    lby, lon = meta["left_by"], meta["left_on"]
    rby, ron = meta["right_by"], meta["right_on"]
    lo, hi = meta["lo"], meta["hi"]
    lvals, rvals = meta["left_values"], meta["right_values"]
    out_schema = pa.schema(
        [meta["left_schema"].field(c) for c in lvals]
        + [meta["right_schema"].field(c) for c in rvals])

    lt = [t for t in parts[:n_left] if t is not None and t.num_rows]
    rt = [t for t in parts[n_left:] if t is not None and t.num_rows]
    if not lt or not rt:
        return out_schema.empty_table()
    left = pa.concat_tables(lt)
    right = pa.concat_tables(rt)

    lk = _int_keys(left.column(lby), lby)
    rk = _int_keys(right.column(rby), rby)
    lon_v = _to_int64(left.column(lon).to_pandas(), lon)
    ron_v = _to_int64(right.column(ron).to_pandas(), ron)

    keys = np.unique(np.concatenate([lk, rk]))
    lr = np.searchsorted(keys, lk)
    rr = np.searchsorted(keys, rk)
    rorder = np.lexsort((ron_v, rr))
    rr_s, ron_s = rr[rorder], ron_v[rorder]

    rec = np.dtype([("k", np.int64), ("t", np.int64)])
    hay = np.empty(len(rr_s), rec)
    hay["k"], hay["t"] = rr_s, ron_s

    def probe(on_q: np.ndarray, side: str) -> np.ndarray:
        q = np.empty(len(lr), rec)
        q["k"], q["t"] = lr, on_q
        return np.searchsorted(hay, q, side=side)

    lo_pos = probe(lon_v + np.int64(lo), "left")
    hi_pos = probe(lon_v + np.int64(hi), "right")
    counts = np.maximum(hi_pos - lo_pos, 0)
    total = int(counts.sum())
    li = np.repeat(np.arange(len(lr), dtype=np.int64), counts)
    cum = np.concatenate([[0], np.cumsum(counts)])[:-1]
    ri = rorder[np.arange(total, dtype=np.int64)
                - np.repeat(cum - lo_pos, counts)]

    cols = {c: left.column(c).take(pa.array(li)) for c in lvals}
    for c in rvals:
        cols[c] = right.column(c).take(pa.array(ri))
    return pa.table(cols).cast(out_schema)


def band_join(left: rd.Dataset, right: rd.Dataset, *,
              left_by: str, right_by: str,
              left_on: str, right_on: str,
              lo: int, hi: int,
              left_values: Sequence[str],
              right_values: Sequence[str],
              num_partitions: int | None = None) -> rd.Dataset:
    """Range (band) join: all pairs with equal ``by`` keys and
    ``right_on`` in ``[left_on + lo, left_on + hi]`` (inclusive; signed
    int offsets in the ``on`` column's native ticks — epoch-us for
    timestamps).

    Same partitioning contract as :func:`asof_join` (whole ``by``-key
    history co-located by hash); the per-partition kernel is two
    searchsorted probes over the right side sorted once, so the cost is
    output-bound, never the cross product.  Output columns =
    ``left_values`` + ``right_values`` (names must not clash)."""
    lvals, rvals = list(left_values), list(right_values)
    if set(lvals) & set(rvals):
        raise ValueError("left_values/right_values name clash")
    P = int(num_partitions or default_partitions())

    lproj = list(dict.fromkeys([left_by, left_on] + lvals))
    rproj = list(dict.fromkeys([right_by, right_on] + rvals))
    lblocks = left.select_columns(lproj).materialize().to_arrow_refs()
    rblocks = right.select_columns(rproj).materialize().to_arrow_refs()
    if not lblocks or not rblocks:
        raise ValueError("band_join on a dataset with no blocks")
    meta = {"left_by": left_by, "left_on": left_on,
            "right_by": right_by, "right_on": right_on,
            "lo": int(lo), "hi": int(hi),
            "left_values": lvals, "right_values": rvals,
            "left_schema": _typed_schema(lblocks, "left"),
            "right_schema": _typed_schema(rblocks, "right")}
    return _copartition(lblocks, rblocks, left_by, right_by, P,
                        _band_reduce, meta)
