"""NumPy oracle kernels for PageRank, connected components, label
propagation and triangle counting (SURVEY.md §2.11).  The distributed
engine must match: PageRank allclose 1e-6, CC/LPA exact (after min-member
canonicalization), triangles exact.
"""

from __future__ import annotations

import numpy as np

PAGERANK_DAMPING = 0.85
PAGERANK_TOL = 1e-10  # L1; tight so engine-vs-oracle allclose(1e-6) is robust
PAGERANK_MAX_ITER = 200


def pagerank(n: int, src: np.ndarray, dst: np.ndarray,
             damping: float = PAGERANK_DAMPING, tol: float = PAGERANK_TOL,
             max_iter: int = PAGERANK_MAX_ITER) -> tuple[np.ndarray, int]:
    """Power iteration on the DIRECTED, deduped edge list.

    r_{t+1}(v) = (1-d)/n + d * (sum_{u->v} r_t(u)/outdeg(u) + dangling/n)
    where dangling = sum of r_t over zero-outdegree nodes.  Returns
    (ranks, n_iter).  Ranks sum to 1.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling_mask = outdeg == 0
    r = np.full(n, 1.0 / n, dtype=np.float64)
    it = 0
    for it in range(1, max_iter + 1):
        contrib = r / np.maximum(outdeg, 1.0)
        agg = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = float(r[dangling_mask].sum())
        r_new = (1.0 - damping) / n + damping * (agg + dangling / n)
        delta = float(np.abs(r_new - r).sum())
        r = r_new
        if delta < tol:
            break
    return r, it


def connected_components(n: int, src: np.ndarray, dst: np.ndarray,
                         max_iter: int = 10_000) -> np.ndarray:
    """Min-label propagation to fixpoint over the SYMMETRIC edge list.
    Component id = min member vertex id (canonical)."""
    comp = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        new = comp.copy()
        np.minimum.at(new, dst, comp[src])
        np.minimum.at(new, src, comp[dst])
        if np.array_equal(new, comp):
            break
        comp = new
    return comp


def label_propagation(n: int, src: np.ndarray, dst: np.ndarray,
                      w: np.ndarray, max_iter: int = 20) -> tuple[np.ndarray, int]:
    """Synchronous weighted LPA over the SYMMETRIC edge list.

    label(v) <- argmax_L sum of w(v,u) for neighbors u with label L,
    tie -> lower label; stop when no label changes or after max_iter.
    Deterministic by construction.  Self-loops ignored.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float64)
    nonself = src != dst
    src, dst, w = src[nonself], dst[nonself], w[nonself]
    labels = np.arange(n, dtype=np.int64)
    it = 0
    for it in range(1, max_iter + 1):
        lab = labels[dst]
        key = src * np.int64(n) + lab
        order = np.argsort(key, kind="stable")
        key_s, w_s = key[order], w[order]
        uk, start = np.unique(key_s, return_index=True)
        sums = np.add.reduceat(w_s, start) if len(start) else np.empty(0)
        gv, gl = uk // n, uk % n
        # argmax with tie -> lower label: sort by (v, -sum, label)
        ordc = np.lexsort((gl, -sums, gv))
        v_s, l_s = gv[ordc], gl[ordc]
        first = np.empty(len(v_s), dtype=bool)
        if len(v_s):
            first[0] = True
            first[1:] = v_s[1:] != v_s[:-1]
        new = labels.copy()
        new[v_s[first]] = l_s[first]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels, it


def triangle_count(n: int, src: np.ndarray, dst: np.ndarray) -> int:
    """Exact triangle count of the simple undirected graph.

    Input: symmetric edge list; self-loops and duplicates are dropped.
    Degree-orientation (orient low (deg,id) -> high) bounds the oriented
    out-degree, then wedge-closure counting.
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    nonself = src != dst
    src, dst = src[nonself], dst[nonself]
    key = np.unique(src * np.int64(n) + dst)
    src, dst = key // n, key % n
    deg = np.bincount(src, minlength=n)
    # orient: (deg[u], u) < (deg[v], v)
    forward = (deg[src] < deg[dst]) | ((deg[src] == deg[dst]) & (src < dst))
    fs, fd = src[forward], dst[forward]
    order = np.lexsort((fd, fs))
    fs, fd = fs[order], fd[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, fs + 1, 1)
    np.cumsum(indptr, out=indptr)
    fkey = fs * np.int64(n) + fd
    # wedges: for each oriented edge (u,v): pairs (u,w) for w in N+(v)
    odeg = np.diff(indptr)
    wedge_u = np.repeat(fs, odeg[fd])
    starts = indptr[fd]
    counts = odeg[fd]
    if counts.sum() == 0:
        return 0
    offs = np.concatenate([[0], np.cumsum(counts)])
    idx = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], counts) \
        + np.repeat(starts, counts)
    wedge_w = fd[idx]
    closed = np.isin(wedge_u * np.int64(n) + wedge_w, fkey)
    return int(closed.sum())
