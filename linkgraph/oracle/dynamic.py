"""Oracle driver for the dynamic (timestep) path.

Mirrors the reference driver loop (``main_louvain.cpp:1217-1611`` /
``main_louvain_gpu.cpp``): per timestep, a deletion phase then an addition
phase; each phase mutates the level-0 graph, installs the carried partition
``n2c``, computes the screened set R, and — iff R is non-empty — reruns
Louvain with the first level restricted to R and a forced second level
(``once_more``), updating ``n2c``.

Graph mutation semantics:
- deletions remove BOTH directions of each (s,d); nonexistent deletions are
  counted and skipped (``buildNewGraph_del``, ``main_louvain.cpp:423-667``,
  ``count_notexist``).  A multi-edge loses one copy per deletion request.
- additions append both directions WITHOUT duplicate checking (the
  reference quirk, ``main_louvain.cpp:136-142`` notes) and may grow the
  node space.
- new-node seeding (``main_louvain.cpp:1484-1498``): a new node with
  exactly one neighbor that is an OLD node inherits that neighbor's
  community; otherwise it gets a fresh community id from a counter starting
  at max(n2c)+1, assigned in ascending node order.
"""

from __future__ import annotations

import numpy as np

from .graph import CSRGraph
from .louvain import (DEFAULT_MIN_GAIN, community_aggregates, louvain,
                      modularity, screen_add, screen_del)


def apply_del(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
              del_src: np.ndarray, del_dst: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Remove one copy of each (s,d) AND (d,s) from the symmetric edge
    arrays.  Returns (src, dst, w, n_notexist)."""
    if len(del_src) == 0:
        return src, dst, w, 0
    n = int(max(src.max(initial=-1), dst.max(initial=-1),
                del_src.max(initial=-1), del_dst.max(initial=-1)) + 1)
    key = src * np.int64(n) + dst
    dkey = np.concatenate([del_src * np.int64(n) + del_dst,
                           del_dst * np.int64(n) + del_src])
    # also delete the mirrored direction for non-self edges; self-loop
    # deletions appear once in each concat half -> dedup to a single request
    self_mask = del_src == del_dst
    if self_mask.any():
        dkey = np.concatenate([
            del_src[~self_mask] * np.int64(n) + del_dst[~self_mask],
            del_dst[~self_mask] * np.int64(n) + del_src[~self_mask],
            del_src[self_mask] * np.int64(n) + del_dst[self_mask]])
    keep = np.ones(len(src), dtype=bool)
    n_notexist = 0
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    for k in dkey:
        lo = np.searchsorted(sorted_key, k, side="left")
        hit = -1
        while lo < len(sorted_key) and sorted_key[lo] == k:
            if keep[order[lo]]:
                hit = order[lo]
                break
            lo += 1
        if hit >= 0:
            keep[hit] = False
        else:
            n_notexist += 1
    return src[keep], dst[keep], w[keep], n_notexist


def apply_add(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
              add_src: np.ndarray, add_dst: np.ndarray, add_w: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Append both directions of the added edges (no dedup — M1 quirk)."""
    nonself = add_src != add_dst
    return (np.concatenate([src, add_src, add_dst[nonself]]),
            np.concatenate([dst, add_dst, add_src[nonself]]),
            np.concatenate([w, add_w, add_w[nonself]]))


def seed_new_nodes(g: CSRGraph, n2c: np.ndarray, n_old: int) -> np.ndarray:
    """Extend n2c over [n_old, g.n) per the reference seeding rule."""
    n2c = np.asarray(n2c, dtype=np.int64)
    out = np.empty(g.n, dtype=np.int64)
    out[:n_old] = n2c[:n_old]
    next_comm = int(n2c[:n_old].max(initial=-1)) + 1
    for v in range(n_old, g.n):
        nbrs, _ = g.neighbors(v)
        if len(nbrs) == 1 and nbrs[0] < n_old:
            out[v] = out[nbrs[0]]
        else:
            out[v] = next_comm
            next_comm += 1
    return out


def dynamic_louvain(base_src: np.ndarray, base_dst: np.ndarray,
                    base_w: np.ndarray, deltas: list[dict],
                    min_gain: float = DEFAULT_MIN_GAIN) -> list[dict]:
    """Run initial Louvain then the timestep loop.

    ``deltas``: list of {"del": (src,dst,w), "add": (src,dst,w)} with
    directed-as-written arrays (the driver symmetrizes).  Returns a list of
    per-phase records: {"ts", "phase", "labels", "modularity", "r_size",
    "r_frac", "n_nodes"} — one record for the initial partition (ts=-1)
    and one per applied phase.
    """
    src, dst, w = (np.asarray(base_src, np.int64), np.asarray(base_dst, np.int64),
                   np.asarray(base_w, np.float64))
    g = CSRGraph.from_edges(src, dst, w)
    res = louvain(g, min_gain=min_gain)
    n2c = res["labels"]
    records = [{"ts": -1, "phase": "init", "labels": n2c.copy(),
                "modularity": res["modularity"], "r_size": g.n,
                "r_frac": 1.0, "n_nodes": g.n}]

    for ts, batch in enumerate(deltas):
        for phase in ("del", "add"):
            d_src, d_dst, d_w = (np.asarray(a) for a in batch[phase])
            if phase == "del":
                if len(d_src) == 0:
                    continue
                src, dst, w, _ = apply_del(src, dst, w, d_src, d_dst)
                g = CSRGraph.from_edges(src, dst, w, n=g.n)
                labels0 = n2c.copy()
                sym_s = np.concatenate([d_src, d_dst])
                sym_d = np.concatenate([d_dst, d_src])
                R = screen_del(g, labels0, sym_s, sym_d)
            else:
                if len(d_src) == 0:
                    continue
                n_old = g.n
                src, dst, w = apply_add(src, dst, w, d_src, d_dst,
                                        d_w.astype(np.float64))
                n_new = int(max(n_old, src.max(initial=-1) + 1,
                                dst.max(initial=-1) + 1))
                g = CSRGraph.from_edges(src, dst, w, n=n_new)
                labels0 = seed_new_nodes(g, n2c, n_old)
                nonself = d_src != d_dst
                sym_s = np.concatenate([d_src, d_dst[nonself]])
                sym_d = np.concatenate([d_dst, d_src[nonself]])
                R = screen_add(g, labels0, sym_s, sym_d)

            if R.any():
                out = louvain(g, init_labels=labels0, subset=R,
                              min_gain=min_gain)
                n2c = out["labels"]
                q = out["modularity"]
            else:
                n2c = labels0
                n_slots = max(g.n, int(n2c.max(initial=0)) + 1)
                tot, _ = community_aggregates(g, n2c, n_slots)
                q = modularity(g, n2c, tot)
            records.append({"ts": ts, "phase": phase, "labels": n2c.copy(),
                            "modularity": q, "r_size": int(R.sum()),
                            "r_frac": float(R.sum()) / max(1, g.n),
                            "n_nodes": g.n})
    return records


def canonical_labels(labels: np.ndarray) -> np.ndarray:
    """Map each community label to its minimum member vertex id — the
    normalized form used for 'exact up to renumbering' comparisons."""
    labels = np.asarray(labels, dtype=np.int64)
    n_slots = int(labels.max(initial=0)) + 1
    rep = np.full(n_slots, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(rep, labels, np.arange(len(labels), dtype=np.int64))
    return rep[labels]
