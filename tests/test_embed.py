"""IVF index + exact pruned search: the trained-codebook layout must be
deterministic across block layouts/parallelism, and both consumers
(ivf_ann_topk, embedding_near_dup) must equal their brute-force
references exactly (the pruning bounds admit no false negatives)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.embed import ops as em


def _emb_table(n=300, d=16, seed=3, n_clusters=5, spread=0.25):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, d))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    which = rng.integers(0, n_clusters, n)
    m = cents[which] + spread * rng.normal(size=(n, d))
    return pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32).tolist() for row in m],
    })


def _ds(tbl, blocks):
    n = tbl.num_rows
    cuts = np.linspace(0, n, blocks + 1).astype(int)
    return rd.from_arrow([tbl.slice(int(a), int(b - a))
                          for a, b in zip(cuts[:-1], cuts[1:])])


def _brute_pairs(tbl, threshold):
    m = np.stack([np.asarray(e, np.float64) for e in
                  tbl.column("embedding").to_pylist()])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = m @ m.T
    iu, ju = np.triu_indices(len(m), k=1)
    keep = sims[iu, ju] >= threshold
    return set(zip(iu[keep].tolist(), ju[keep].tolist()))


@pytest.mark.usefixtures("ray_session")
def test_codebook_deterministic_across_layouts():
    tbl = _emb_table()
    c1 = em.train_codebook(_ds(tbl, 1), k_clusters=6, sample=128, iters=5)
    c2 = em.train_codebook(_ds(tbl, 7), k_clusters=6, sample=128, iters=5)
    assert np.array_equal(c1, c2)


@pytest.mark.usefixtures("ray_session")
def test_ivf_ann_equals_brute_force():
    tbl = _emb_table()
    ds = _ds(tbl, 5)
    exact = em.ann_topk(_ds(tbl, 5), n_queries=8, k=6).to_pandas()
    ivf = em.ivf_ann_topk(ds, n_queries=8, k=6, n_probe=2).to_pandas()
    key = ["query_id", "neighbor_id"]
    a = exact[key].sort_values(key).reset_index(drop=True)
    b = ivf[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_near_dup_equals_all_pairs_and_prunes():
    tbl = _emb_table(spread=0.15)
    want = _brute_pairs(tbl, 0.8)
    assert len(want) > 0, "fixture must contain near-dup pairs"
    got = em.embedding_near_dup(_ds(tbl, 6), threshold=0.8)
    got_set = set(zip(got.column("a").to_pylist(),
                      got.column("b").to_pylist()))
    assert got_set == want


@pytest.mark.usefixtures("ray_session")
def test_near_dup_handles_empty_blocks():
    tbl = _emb_table(n=10)
    # layout with deliberately empty slices (the r2 _stack crash)
    ds = rd.from_arrow([tbl.slice(0, 0), tbl, tbl.slice(0, 0)])
    got = em.embedding_near_dup(ds, threshold=0.99)
    assert got.num_rows >= 0  # must not raise


def test_lsh_ann_matches_bucket_brute_force(ray_session):
    """lsh_ann_topk == numpy replay of the deterministic bucket rule
    (sign bits of the first 8 raw coords, hamming<=1 probe, exact
    cosine ranking, ties by neighbor id)."""
    import ray.data as rd

    from linkgraph.embed.ops import lsh_ann_topk

    rng = np.random.default_rng(4)
    n, d, q, k = 300, 16, 6, 5
    m = rng.normal(size=(n, d)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float32()))}))
    got = lsh_ann_topk(ds, n_queries=q, k=k).to_pandas()
    got = {qq: sorted(g["neighbor_id"])
           for qq, g in got.groupby("query_id")}

    w = 1 << np.arange(8)
    buck = ((m[:, :8] > 0) @ w).astype(np.int64)
    md = m.astype(np.float64)
    md /= np.linalg.norm(md, axis=1, keepdims=True)
    pop = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(axis=1)
    for qq in range(q):
        cand = np.flatnonzero(
            (pop[np.bitwise_xor(buck[qq], buck)] <= 1)
            & (np.arange(n) != qq))
        sims = md[cand] @ md[qq]
        order = np.lexsort((cand, -sims))[:k]
        assert sorted(cand[order].tolist()) == got[qq]
