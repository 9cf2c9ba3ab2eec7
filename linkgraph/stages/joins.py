"""As-of join: each left row matched to the single right row with the
largest ``on`` key at-or-before the left's, within the same ``by`` key.

Ray Data has no native as-of join (its ``Dataset.join`` is equality
only), so this is the composition the SURVEY §2.4 mapping prescribes for
temporal lookups: a two-stage hash exchange on the equality (``by``) key
— the same splitmix64 partitioner as ``stages.exchange`` — followed by a
per-partition vectorized backward merge (``pandas.merge_asof``, a C
merge over both sides sorted by the ``on`` key).

Partitioning assumption (documented per the north rule): the whole
history of one ``by`` key must land in one partition, because a backward
search is a per-key scan.  Hash partitioning on ``by`` guarantees that;
a pathologically hot key bounds its partition's work by that key's own
history (mitigate upstream by pre-filtering the right side to the left's
key range, or range-splitting ``on`` with boundary replication).

Determinism: ties on the right ``on`` key resolve to the largest
``right_tie`` value (rows sorted ascending by ``(on, tie)``;
``merge_asof`` picks the last qualifying row), so results are identical
at any parallelism.
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


def _to_int64(s: pd.Series) -> np.ndarray:
    """Order-preserving int64 view of an ``on`` column (timestamps
    compare as their epoch-us ticks)."""
    v = s.to_numpy()
    if v.dtype.kind == "M":
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


@ray.remote
def _asof_split(tbl: pa.Table, by: str, P: int):
    """Hash-split one block into P row partitions on the ``by`` column."""
    if tbl.num_rows == 0:
        return None if P == 1 else tuple(None for _ in range(P))
    if P == 1:
        return tbl
    part = (_key_hash([tbl.column(by).to_numpy()])
            % _U64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    tbl = tbl.take(pa.array(order))
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    return tuple(tbl.slice(cuts[p], cuts[p + 1] - cuts[p])
                 for p in range(P))


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

    left["__on"] = _to_int64(left[lon])
    right["__on"] = _to_int64(right[ron])
    left = left.sort_values("__on", kind="stable")
    rsort = ["__on"] + ([tie] if tie else [])
    right = right.sort_values(rsort, kind="stable")
    right = right[[rby, "__on"] + [c for c in rvals if c != rby]]

    merged = pd.merge_asof(left, right, on="__on",
                           left_by=lby, right_by=rby,
                           direction="backward",
                           allow_exact_matches=True)
    if how == "inner":
        merged = merged[merged[rvals[0]].notna()]
    cols: dict[str, pa.Array] = {
        c: pa.array(merged[c], out_schema.field(c).type, from_pandas=True)
        for c in lcols}
    for c in rvals:
        typ = out_schema.field(c).type
        v = merged[c]
        if pa.types.is_integer(typ) and v.dtype.kind == "f":
            # NaN-introduced float upcast: restore via explicit null mask
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

    @ray.remote
    def _schema(t: pa.Table) -> pa.Schema:
        return t.schema

    lschema, rschema = ray.get([_schema.remote(lblocks[0]),
                                _schema.remote(rblocks[0])])
    clash = set(lschema.names) & (set(rvals) | ({right_by} - {left_by}))
    if clash:
        raise ValueError(f"left/right column name clash: {sorted(clash)}; "
                         "rename before joining")
    meta = {"left_by": left_by, "left_on": left_on,
            "right_by": right_by, "right_on": right_on,
            "right_tie": right_tie, "right_values": rvals, "how": how,
            "left_schema": lschema, "right_schema": rschema}

    lsplit = [_asof_split.options(num_returns=P).remote(b, left_by, P)
              for b in lblocks]
    rsplit = [_asof_split.options(num_returns=P).remote(b, right_by, P)
              for b in rblocks]
    if P == 1:
        lsplit = [[r] for r in lsplit]
        rsplit = [[r] for r in rsplit]
    outs = [_asof_reduce.remote(meta, len(lsplit),
                                *[s[p] for s in lsplit],
                                *[s[p] for s in rsplit])
            for p in range(P)]

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in outs])
    kept = [r for r, n in zip(outs, counts) if n]
    return rd.from_arrow_refs(kept if kept else outs[:1])
