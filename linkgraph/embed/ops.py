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
        if batch.num_rows == 0:      # zero-row block: reshape(0,-1) raises
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
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


LSH_BITS = 8
_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def lsh_ann_topk(embeddings: rd.Dataset, *, n_queries: int = 16,
                 k: int = 10, bits: int = LSH_BITS) -> rd.Dataset:
    """Sign-LSH bucketed cosine top-k (the north rule's "LSH-bucketed
    variant"): bucket = sign bits of the first ``bits`` raw float32
    coordinates (projections onto the basis hyperplanes — deterministic,
    no trained state); each query ranks ONLY the vectors in its own
    bucket or a hamming<=1 neighbour bucket (multi-probe), by exact
    cosine.  The bucket rule is part of the OPERATOR SEMANTICS, so the
    same rule replays in SQL and the gate value-checks the output —
    recall vs exact ANN is the usual LSH trade, but the result itself
    is deterministic.  Scale: expected candidates per query ~=
    corpus * (bits+1) / 2^bits, and the bucket id is a ready-made
    partition key for a corpus-sized probe fan-out."""
    assert 1 <= bits <= 8, "hamming table covers 8-bit buckets"
    qids, qmat = load_queries(embeddings, n_queries)
    qn = _normalize(qmat)
    w = (1 << np.arange(bits, dtype=np.int64))
    qbuck = ((qmat[:, :bits] > 0) @ w).astype(np.int64)
    q_ref = ray.put((qids, qn, qbuck))

    def batch_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:      # zero-row block: reshape(0,-1) raises
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids_q, qn_, qb = ray.get(q_ref)
        raw = _stack_raw(batch)
        buck = ((raw[:, :bits] > 0) @ w).astype(np.int64)
        m = _normalize(_stack(batch))
        vids = batch.column("vec_id").to_numpy()
        sims = qn_ @ m.T                                   # (Q, n)
        ham = _POPCOUNT8[np.bitwise_xor(qb[:, None], buck[None, :])]
        sims[(ham > 1) | (vids[None, :] == ids_q[:, None])] = -np.inf
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        svals = np.take_along_axis(sims, top, axis=1).reshape(-1)
        rows_q = np.repeat(ids_q, kk)
        keep = svals > -np.inf                 # drop non-candidates
        return pa.table({
            "query_id": rows_q[keep],
            "neighbor_id": vids[top].reshape(-1)[keep],
            "sim": svals[keep],
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


# --------------------------------------------------------- IVF index (scale)
#
# The 100 TB similarity-search path: a coarse codebook trained with
# deterministic sampled k-means (NO reliance on fixture columns), the
# corpus repartitioned by nearest-centroid bucket ONCE (the "pick one
# partitioning and reuse it" rule), per-bucket/per-block radii recorded.
# Both consumers stay EXACT:
#   - ivf_ann_topk: two-phase bound-pruned top-k (scan the probed buckets,
#     then only buckets whose best-possible sim  q·c_b + r_b  can still
#     beat the current k-th best) — identical results to brute force, so
#     the same DuckDB oracle hash-checks it;
#   - embedding_near_dup: block pair (i,j) is scanned only when the
#     triangle inequality allows a qualifying pair
#     (||bc_i - bc_j|| <= br_i + br_j + sqrt(2-2t)) — no false negatives.
# On clustered corpora the radii are small and most block pairs / buckets
# prune away; worst case degrades to the exact brute-force scan.

DEFAULT_KCLUSTERS = 16
DEFAULT_KMEANS_SAMPLE = 2048
DEFAULT_KMEANS_ITERS = 10

_SM_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x.astype(_SM_U64) + _SM_U64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> _SM_U64(30))) * _SM_U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _SM_U64(27))) * _SM_U64(0x94D049BB133111EB)
    return x ^ (x >> _SM_U64(31))


def train_codebook(embeddings: rd.Dataset, *, k_clusters: int = DEFAULT_KCLUSTERS,
                   sample: int = DEFAULT_KMEANS_SAMPLE,
                   iters: int = DEFAULT_KMEANS_ITERS) -> np.ndarray:
    """Deterministic spherical k-means codebook: (k, d) normalized rows.

    The training sample is the ``sample`` vectors with the smallest
    ``splitmix64(vec_id)`` — a content-keyed uniform sample independent
    of block layout / parallelism (so the codebook, and everything built
    on it, is identical at any cluster size).  Each batch contributes a
    partial top-``sample``; the driver merges #blocks * sample candidate
    rows (tiny), then runs Lloyd iterations with argmax-dot assignment
    (tie -> lowest centroid index) on the normalized sample."""

    def partial(batch: pa.Table) -> pa.Table:
        vids = batch.column("vec_id").to_numpy()
        h = _splitmix64(vids.view(np.uint64)
                        if vids.dtype == np.int64 else vids.astype(np.uint64))
        kk = min(sample, len(vids))
        if kk == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": batch.column("embedding").slice(0, 0)})
        sel = np.argpartition(h, kk - 1)[:kk]
        sel.sort()
        return pa.table({
            "h": h[sel],
            "vec_id": vids[sel],
            "embedding": batch.column("embedding").take(pa.array(sel)),
        })

    from ..common import gather_table
    cand = gather_table(
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    h = cand.column("h").to_numpy()
    order = np.argsort(h, kind="stable")[:sample]
    m = _normalize(_stack(cand)[order])
    k = min(k_clusters, len(m))
    if k == 0:
        return np.zeros((1, 1))
    cents = m[:k].copy()                      # smallest-hash init
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


class IVFIndex:
    """Bucketed embedding layout + geometry needed for exact pruning."""

    def __init__(self, centroids, block_refs, block_meta, bucket_radius):
        self.centroids = centroids            # (K, d) normalized
        self.block_refs = block_refs          # arrow refs, sorted by bucket
        self.block_meta = block_meta          # per block: dict
        self.bucket_radius = bucket_radius    # (K,) max ||x - c_b||


_IVF_CACHE: dict[object, IVFIndex] = {}


@ray.remote
def _block_meta(tbl: pa.Table, cent_ref) -> dict:
    cents = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) \
        else cent_ref
    n = tbl.num_rows
    if n == 0:
        return {"n": 0}
    m = _stack(tbl, "nemb")
    b = tbl.column("bucket").to_numpy()
    d_cent = np.linalg.norm(m - cents[b], axis=1)
    uniq = np.unique(b)
    rmax = np.array([d_cent[b == u].max() for u in uniq])
    bc = m.mean(axis=0)
    br = float(np.linalg.norm(m - bc, axis=1).max())
    return {"n": n, "buckets": uniq, "bucket_rmax": rmax,
            "bcent": bc, "brad": br}


def build_ivf_index(embeddings: rd.Dataset, *, key=None,
                    k_clusters: int = DEFAULT_KCLUSTERS,
                    sample: int = DEFAULT_KMEANS_SAMPLE,
                    iters: int = DEFAULT_KMEANS_ITERS) -> IVFIndex:
    """Train the codebook, assign buckets, repartition by bucket (one
    distributed sort — reused by every IVF consumer via ``key``)."""
    if key is not None and key in _IVF_CACHE:
        return _IVF_CACHE[key]
    cents = train_codebook(embeddings, k_clusters=k_clusters,
                           sample=sample, iters=iters)
    cent_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(cent_ref)
        m = _normalize(_stack(batch))
        n, d = m.shape
        bucket = (np.argmax(m @ cents_.T, axis=1) if n else
                  np.empty(0, np.int64)).astype(np.int64)
        flat = np.ascontiguousarray(m).reshape(-1)
        off = np.arange(n + 1, dtype=np.int64) * d
        nemb = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pa.array(flat, pa.float64()))
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": bucket, "nemb": nemb})

    ds = (embeddings.select_columns(["vec_id", "embedding"])
          .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
          .sort("bucket").materialize())
    refs = [r for r in ds.to_arrow_refs()]
    metas = ray.get([_block_meta.remote(r, cent_ref) for r in refs])
    keep = [i for i, m in enumerate(metas) if m["n"] > 0]
    refs = [refs[i] for i in keep]
    metas = [metas[i] for i in keep]
    radius = np.zeros(len(cents))
    for m in metas:
        np.maximum.at(radius, m["buckets"], m["bucket_rmax"])
    idx = IVFIndex(cents, refs, metas, radius)
    if key is not None:
        _IVF_CACHE[key] = idx
    return idx


def clear_ivf_cache():
    _IVF_CACHE.clear()


@ray.remote
def _scan_block(tbl: pa.Table, side, qsel: np.ndarray,
                allowed_buckets: list, k: int) -> pa.Table:
    """Top-k partial for the selected queries over this block's rows in
    their allowed buckets.  ``allowed_buckets[i]``: sorted bucket ids
    query ``qsel[i]`` may scan here."""
    qids, qn = ray.get(side) if isinstance(side, ray.ObjectRef) else side
    vids = tbl.column("vec_id").to_numpy()
    vb = tbl.column("bucket").to_numpy()
    m = _stack(tbl, "nemb")
    qn_ = qn[qsel]
    ids_q = qids[qsel]
    sims = qn_ @ m.T                                    # (q, n)
    allowed = np.zeros_like(sims, dtype=bool)
    for i, ab in enumerate(allowed_buckets):
        allowed[i] = np.isin(vb, ab)
    sims = np.where(allowed, sims, -np.inf)
    sims[vids[None, :] == ids_q[:, None]] = -np.inf
    kk = min(k, sims.shape[1])
    top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    out_sim = np.take_along_axis(sims, top, axis=1).reshape(-1)
    fin = np.isfinite(out_sim)
    return pa.table({
        "query_id": np.repeat(ids_q, kk)[fin],
        "neighbor_id": vids[top].reshape(-1)[fin],
        "sim": out_sim[fin],
    })


def embedding_near_dup(embeddings: rd.Dataset, *, threshold: float = 0.8,
                       key=None) -> pa.Table:
    """Embedding-cosine near-dup pairs (a < b, cos >= threshold) — EXACT.

    Bucket-pruned: the IVF layout's per-block centroid/radius admit a
    block pair only when the triangle inequality allows a qualifying
    pair, ||bc_i - bc_j|| <= br_i + br_j + sqrt(2 - 2*threshold); every
    admissible pair is one matmul task.  No false negatives (the bound
    is sufficient), no false positives (each task tests the exact sims),
    so the DuckDB all-pairs oracle hash-checks the result.  On clustered
    corpora this kills the O(B^2) task grid the exact all-pairs scan
    needs; worst case (no cluster structure) it degrades to it."""
    idx = build_ivf_index(embeddings, key=key)
    eps = float(np.sqrt(max(0.0, 2.0 - 2.0 * threshold)))
    metas = idx.block_meta
    nb = len(metas)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if nb == 0:
        return empty
    bc = np.stack([m["bcent"] for m in metas])
    br = np.array([m["brad"] for m in metas])
    d2 = np.maximum(0.0, (bc ** 2).sum(1)[:, None]
                    + (bc ** 2).sum(1)[None, :] - 2.0 * (bc @ bc.T))
    admissible = np.sqrt(d2) <= br[:, None] + br[None, :] + eps

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ia = ta.column("vec_id").to_numpy()
        ib = tb.column("vec_id").to_numpy()
        if len(ia) == 0 or len(ib) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ma = _stack(ta, "nemb")
        mb = _stack(tb, "nemb")
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

    refs = [block_pair.remote(idx.block_refs[i], idx.block_refs[j], i == j)
            for i in range(nb) for j in range(i, nb) if admissible[i, j]]
    tbl = pa.concat_tables(ray.get(refs)) if refs else empty
    return tbl.cast(pa.schema([("a", pa.int64()), ("b", pa.int64())]))


def ivf_ann_topk(embeddings: rd.Dataset, *, n_queries: int = 16,
                 k: int = 10, n_probe: int = 3, key=None) -> pa.Table:
    """IVF ANN over the trained-codebook bucketed layout — EXACT top-k.

    Two-phase bound-pruned search:
      1. scan each query's ``n_probe`` closest buckets -> candidate
         top-k and its k-th best sim;
      2. for every other bucket b, the best possible sim of any member
         is bounded by q·c_b + r_b (Cauchy-Schwarz on x = c_b + (x-c_b),
         ||x||=1); scan only buckets whose bound can still reach the
         k-th best.  Exact by construction — identical output to the
         brute-force scan, value-hash-checked by the same SQL oracle.
    Blocks are bucket-sorted, so a probe touches only the blocks holding
    its buckets.  Recall is 1.0; the win at scale is reading the probed
    buckets' blocks instead of the corpus (phase 2 is empty when the
    corpus is genuinely clustered)."""
    idx = build_ivf_index(embeddings, key=key)
    qids, qmat = load_queries(embeddings, n_queries)
    qn = _normalize(qmat)
    Q = len(qids)
    K = len(idx.centroids)
    side = ray.put((qids, qn))
    qc = qn @ idx.centroids.T                            # (Q, K)
    order = np.argsort(-qc, axis=1, kind="stable")
    probes = order[:, :min(n_probe, K)]                  # (Q, n_probe)
    probe_mask = np.zeros((Q, K), dtype=bool)
    probe_mask[np.arange(Q)[:, None], probes] = True

    def launch(need_mask: np.ndarray) -> list:
        """One _scan_block task per block intersecting any needed
        (query, bucket); each task gets only the queries that need it."""
        out = []
        for ref, meta in zip(idx.block_refs, idx.block_meta):
            present = meta["buckets"]
            sub = need_mask[:, present]                  # (Q, nb_present)
            qsel = np.flatnonzero(sub.any(axis=1))
            if len(qsel) == 0:
                continue
            allowed = [present[sub[q]] for q in qsel]
            out.append(_scan_block.remote(ref, side, qsel, allowed, k))
        return out

    def merge_parts(tbls: list[pa.Table]) -> pd.DataFrame:
        parts = [t.to_pandas() for t in tbls if t.num_rows]
        if not parts:
            return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                 "sim": []})
        df = pd.concat(parts, ignore_index=True)
        df = df.sort_values(["sim", "neighbor_id"],
                            ascending=[False, True])
        return df.groupby("query_id", sort=False).head(k)

    cand = merge_parts(ray.get(launch(probe_mask)))
    # k-th best sim per query after phase 1 (queries with fewer than k
    # candidates keep -inf, forcing phase 2 to consider every bucket)
    kth = np.full(Q, -np.inf)
    pos = {int(q): i for i, q in enumerate(qids)}
    for q, g in cand.groupby("query_id"):
        if len(g) >= k:
            kth[pos[int(q)]] = g["sim"].min()
    ub = qc + idx.bucket_radius[None, :]                 # (Q, K)
    need2 = (~probe_mask) & (ub >= kth[:, None])
    parts2 = ray.get(launch(need2)) if need2.any() else []
    final = merge_parts([pa.Table.from_pandas(cand, preserve_index=False)]
                        + parts2) if parts2 else cand
    final = final[["query_id", "neighbor_id"]].astype(np.int64)
    return pa.Table.from_pandas(final.reset_index(drop=True),
                                preserve_index=False)
