"""Similarity search over an embedding column (``list<float>``).

North-rule training-data operators: brute-force cosine top-k (baseline),
an IVF-bucketed variant (the 100 TB scale path), and embedding-cosine
near-duplicate pairs.

Pattern: the small side (query matrix / centroids) is broadcast once with
``ray.put``; each ``map_batches`` call does one numpy matmul against the
batch's stacked embedding matrix (zero Python-per-row work); global top-k
is a per-batch top-k (combiner) followed by a tiny groupby/sort of
#batches * k rows — never a full-corpus sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _stack(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy flatten."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values.to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _stack_raw(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Like :func:`_stack` but preserves the stored float32 values."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


def load_queries(embeddings: rd.Dataset, n_queries: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """First ``n_queries`` vec_ids as the query set (deterministic)."""
    q = (embeddings.filter(expr=f"vec_id < {n_queries}")
         .sort("vec_id").take_all())
    ids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q])
    return ids, mat


def ann_topk(embeddings: rd.Dataset, *, n_queries: int = 16, k: int = 10
             ) -> pa.Table:
    """Brute-force cosine top-k: (query_id, neighbor_id) membership pairs.

    Per-batch: one matmul vs the broadcast query matrix + per-batch top-k
    (the combiner); the global merge handles #batches * k rows only.
    Self-matches excluded.  Output is rank-free (set semantics) so the
    result is stable under float summation-order differences.
    """
    qids, qmat = load_queries(embeddings, n_queries)
    qn = _normalize(qmat)
    q_ref = ray.put((qids, qn))

    def batch_topk(batch: pa.Table) -> pa.Table:
        ids_q, qn_ = ray.get(q_ref)
        m = _normalize(_stack(batch))
        vids = batch.column("vec_id").to_numpy()
        sims = qn_ @ m.T                       # (Q, n)
        # exclude self
        self_mask = vids[None, :] == ids_q[:, None]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(ids_q, kk)
        return pa.table({
            "query_id": rows_q,
            "neighbor_id": vids[top].reshape(-1),
            "sim": np.take_along_axis(sims, top, axis=1).reshape(-1),
        })

    partials = embeddings.map_batches(batch_topk, batch_format="pyarrow",
                                      zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return g[["query_id", "neighbor_id"]].astype(
            {"query_id": "int64", "neighbor_id": "int64"})

    return (partials.groupby("query_id")
            .map_groups(merge, batch_format="pandas"))


def dim_topk(embeddings: rd.Dataset, *, dim: int = 0, k: int = 20
             ) -> rd.Dataset:
    """Top-k vectors by one raw embedding coordinate (O5 sort+limit over
    a projected list element; values are exact parquet copies so the
    check is float-noise-free).  Output: (vec_id, coord)."""

    def project(batch: pa.Table) -> pa.Table:
        m = _stack_raw(batch)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "coord": m[:, dim].astype(np.float64),
        })

    return (embeddings.map_batches(project, batch_format="pyarrow",
                                   zero_copy_batch=True)
            .sort(["coord", "vec_id"], descending=[True, False]).limit(k))


def embedding_near_dup(embeddings: rd.Dataset, *, threshold: float = 0.8
                       ) -> pa.Table:
    """Embedding-cosine near-dup pairs (a < b, cos >= threshold) — EXACT.

    Distributed blocked all-pairs: vectors are pre-normalized with
    map_batches, materialized as object-store blocks, and every unordered
    block pair (i <= j) is one Ray task doing a single matmul — no vector
    ever touches the driver (it routes ObjectRefs; only the matching
    pairs come back).  Exactness keeps the DuckDB oracle hash valid.
    O(B^2) tasks bounds this to corpora whose block count is modest; the
    100 TB path prunes candidates with the IVF bucketing in
    :func:`ivf_ann_topk` (approximate) before an exact rescore."""

    def norm_batch(batch: pa.Table) -> pa.Table:
        m = _normalize(_stack(batch))
        n, d = m.shape
        flat = np.ascontiguousarray(m).reshape(-1)
        off = (np.arange(n + 1, dtype=np.int64) * d)
        emb = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pa.array(flat, pa.float64()))
        return pa.table({"vec_id": batch.column("vec_id"), "nemb": emb})

    blocks = (embeddings.select_columns(["vec_id", "embedding"])
              .map_batches(norm_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
              .materialize().to_arrow_refs())

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ia = ta.column("vec_id").to_numpy()
        ib = tb.column("vec_id").to_numpy()
        ma = _stack(ta, "nemb")
        mb = _stack(tb, "nemb")
        if len(ia) == 0 or len(ib) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        sims = ma @ mb.T
        keep = sims >= threshold
        if same:
            keep &= ia[:, None] < ib[None, :]
        else:
            keep &= ia[:, None] != ib[None, :]
        ri, rj = np.nonzero(keep)
        a = np.minimum(ia[ri], ib[rj])
        b = np.maximum(ia[ri], ib[rj])
        return pa.table({"a": a, "b": b})

    refs = [block_pair.remote(blocks[i], blocks[j], i == j)
            for i in range(len(blocks)) for j in range(i, len(blocks))]
    tbl = pa.concat_tables(ray.get(refs)) if refs else \
        pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64())})
    return tbl.cast(pa.schema([("a", pa.int64()), ("b", pa.int64())]))


def ivf_ann_topk(embeddings: rd.Dataset, *, n_queries: int = 16,
                 k: int = 10, n_probe: int = 3) -> pa.Table:
    """IVF-bucketed ANN (the scale path): coarse centroids = per-``label``
    means (a deterministic stand-in for a trained k-means codebook);
    each query probes its ``n_probe`` closest centroids and only scans
    vectors assigned to those buckets.

    Output: (query_id, neighbor_id) — approximate (recall < 1 possible),
    rows-only checked; exactness of the baseline is checked via
    :func:`ann_topk`'s DuckDB oracle.
    """
    # centroids: tiny groupby (one row per label) computed via numpy means
    def label_sums(batch: pa.Table) -> pa.Table:
        m = _stack(batch)
        labels = batch.column("label").to_numpy()
        uniq = np.unique(labels)
        sums = np.stack([m[labels == u].sum(axis=0) for u in uniq])
        counts = np.array([(labels == u).sum() for u in uniq], np.int64)
        return pa.table({
            "label": uniq.astype(np.int64),
            "vsum": [row.tolist() for row in sums],
            "c": counts,
        })

    from ..common import gather_table
    parts = gather_table(
        embeddings.map_batches(label_sums, batch_format="pyarrow"))
    df = parts.to_pandas()
    cents, labels_order = [], []
    for lbl, g in df.groupby("label"):
        s = np.sum(np.stack([np.asarray(v) for v in g["vsum"]]), axis=0)
        cents.append(s / g["c"].sum())
        labels_order.append(lbl)
    cent_m = _normalize(np.stack(cents))
    labels_order = np.array(labels_order, dtype=np.int64)

    qids, qmat = load_queries(embeddings, n_queries)
    qn = _normalize(qmat)
    probe = np.argsort(-(qn @ cent_m.T), axis=1, kind="stable")[:, :n_probe]
    probe_labels = labels_order[probe]                     # (Q, n_probe)
    side = ray.put((qids, qn, probe_labels))

    def bucket_topk(batch: pa.Table) -> pa.Table:
        ids_q, qn_, probes = ray.get(side)
        m = _normalize(_stack(batch))
        vids = batch.column("vec_id").to_numpy()
        vlabels = batch.column("label").to_numpy().astype(np.int64)
        sims = qn_ @ m.T
        allowed = (vlabels[None, :, None] == probes[:, None, :]).any(axis=2)
        sims = np.where(allowed, sims, -np.inf)
        sims[vids[None, :] == ids_q[:, None]] = -np.inf
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": np.repeat(ids_q, kk),
            "neighbor_id": vids[top].reshape(-1),
            "sim": np.take_along_axis(sims, top, axis=1).reshape(-1),
        })

    partials = embeddings.map_batches(bucket_topk, batch_format="pyarrow",
                                      zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["sim"])]
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return g[["query_id", "neighbor_id"]].astype(
            {"query_id": "int64", "neighbor_id": "int64"})

    return (partials.groupby("query_id")
            .map_groups(merge, batch_format="pandas"))
