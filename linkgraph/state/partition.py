"""Partitioned CSR shard actor — the engine's stateful core (ST1/ST2/ST3).

The reference holds ONE whole-graph CSR in process/device memory
(``main_louvain.cpp:1090-1092``, ``utils.cu:209-251``).  The engine shards
the vertex space into contiguous, degree-balanced id ranges; each shard is
a long-lived Ray actor holding

- the CSR rows of its local vertices (src in [lo, hi)),
- per-vertex algorithm state (ranks / labels / components),
- the shard of per-community aggregates ``tot``/``size`` for community ids
  that fall in its range (community ids live in the vertex id space, so
  the same boundaries shard them),
- its static ghost set: the remote vertex ids its edges reference,
  grouped by owning partition.

Every superstep is: local vectorized compute -> pre-aggregated per-owner
message arrays (the combiner) -> object-store exchange (the driver routes
ObjectRefs only; payloads never touch the driver) -> local apply.  This is
the ``(dst, contribution)`` groupby-shuffle + partition-local SpMV of the
north star, expressed at the actor level so that iteration N+1 reuses the
CSR built once (a per-iteration ``ray.data`` groupby would re-shuffle the
static graph every superstep).

Determinism: all grouped reductions sort by (vertex, key) before
``np.add.reduceat`` — same order as the oracle kernels, so float sums are
bit-identical to the oracle's on the same partition layout.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..oracle.graph import CSRGraph


_INT64_MAX = np.iinfo(np.int64).max


def composite_fits(hi_card: int, lo_card: int) -> bool:
    """True when ``hi * lo_card + lo`` composite keys (hi < hi_card,
    lo < lo_card) stay within int64.  Guards the unstable composite-key
    sorts against silent overflow mis-sorting for graphs approaching
    ~3e9 vertices (mirrors the oracle's guard, oracle/graph.py:53); the
    fallback at every call site is np.lexsort on the key pair."""
    if hi_card <= 0 or lo_card <= 0:
        return True
    return int(hi_card) <= _INT64_MAX // int(lo_card)


def _pair_view(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) int64 pairs as a structured array — sortable/comparable,
    so set membership works without a composite int64 key."""
    arr = np.empty(len(hi), dtype=[("h", "<i8"), ("l", "<i8")])
    arr["h"] = hi
    arr["l"] = lo
    return arr


def pair_isin(a_hi: np.ndarray, a_lo: np.ndarray,
              b_hi: np.ndarray, b_lo: np.ndarray,
              hi_card: int, lo_card: int) -> np.ndarray:
    """Elementwise membership of pairs (a_hi, a_lo) in {(b_hi, b_lo)}.
    Composite int64 key when it fits, structured-dtype np.isin otherwise
    (exact at any cardinality)."""
    if composite_fits(hi_card, lo_card):
        mult = np.int64(lo_card)
        return np.isin(a_hi * mult + a_lo, b_hi * mult + b_lo)
    return np.isin(_pair_view(a_hi, a_lo), _pair_view(b_hi, b_lo))


def dedup_pairs(hi: np.ndarray, lo: np.ndarray,
                *arrays: np.ndarray) -> tuple:
    """Distinct (hi, lo) pairs, keeping the FIRST occurrence's payload
    (the M5 preprocess contract: per-batch dedup of directed delta pairs,
    main_louvain.cpp:143-210).  Composite int64 key when it fits,
    structured-dtype unique otherwise."""
    if len(hi) == 0:
        return (hi, lo) + arrays
    card = int(max(hi.max(), lo.max())) + 1
    if composite_fits(card, card):
        key = hi * np.int64(card) + lo
    else:
        key = _pair_view(hi, lo)
    _, idx = np.unique(key, return_index=True)
    idx.sort()
    return (hi[idx], lo[idx]) + tuple(a[idx] for a in arrays)


def owner_of(ids: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Partition index owning each id (bounds = [b0..bP], b0=0, bP=n)."""
    return np.searchsorted(bounds, ids, side="right") - 1


def split_by_owner(ids: np.ndarray, bounds: np.ndarray,
                   *arrays: np.ndarray) -> list[tuple]:
    """Split (ids, *arrays) into per-owner tuples; owners are the P ranges.

    Sorted ids (the common case: grouped-sum outputs are key-sorted) hit
    a zero-copy fast path — owners are monotone over contiguous ranges,
    so the per-owner pieces are plain slices."""
    own = owner_of(ids, bounds)
    P = len(bounds) - 1
    if len(own) == 0 or bool((own[1:] >= own[:-1]).all()):
        cuts = np.searchsorted(own, np.arange(P + 1))
        return [(ids[cuts[p]:cuts[p + 1]],)
                + tuple(a[cuts[p]:cuts[p + 1]] for a in arrays)
                for p in range(P)]
    order = np.argsort(own, kind="stable")
    own_s = own[order]
    cuts = np.searchsorted(own_s, np.arange(P + 1))
    out = []
    for p in range(P):
        sl = order[cuts[p]:cuts[p + 1]]
        out.append((ids[sl],) + tuple(a[sl] for a in arrays))
    return out


def _grouped_sum(keys: np.ndarray, vals: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic grouped sum: sort by key, reduceat."""
    if len(keys) == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    k, v = keys[order], vals[order]
    uk, start = np.unique(k, return_index=True)
    return uk, np.add.reduceat(v, start)


def _grouped_sum2(hi: np.ndarray, lo: np.ndarray, vals: np.ndarray,
                  lo_card: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic grouped sum over (hi, lo) pair keys, output sorted by
    (hi, lo).  Composite int64 key when it fits (same stable sort order as
    _grouped_sum), np.lexsort fallback past the ~3e9-id overflow point."""
    if len(hi) == 0:
        return hi, lo, vals
    if composite_fits(int(hi.max()) + 1, lo_card):
        key = hi * np.int64(lo_card) + lo
        uk, sums = _grouped_sum(key, vals)
        return uk // lo_card, uk % lo_card, sums
    order = np.lexsort((lo, hi))
    h, l, v = hi[order], lo[order], vals[order]
    newgrp = np.empty(len(h), dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (h[1:] != h[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(newgrp)
    return h[starts], l[starts], np.add.reduceat(v, starts)


class GraphShard:
    """One partition of the graph + its vertex/community state.

    Instantiated as ``ray.remote(GraphShard)`` by the engine; kept plain so
    unit tests can drive it in-process.
    """

    def __init__(self, pid: int, bounds: list[int]):
        from ..common import tune_malloc
        tune_malloc()   # warm-heap reuse for per-iteration temporaries
        self.pid = pid
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.lo = int(self.bounds[pid])
        self.hi = int(self.bounds[pid + 1])
        self.P = len(bounds) - 1
        self.n_local = self.hi - self.lo
        self.n_global = int(self.bounds[-1])
        self._pending: list[pa.Table] = []
        self._frag_pending: list[pa.Table] = []
        self.hub_mask = np.zeros(self.n_local, dtype=bool)
        self._edge_keep: np.ndarray | None = None
        self.frag_src_u = np.empty(0, np.int64)
        self.frag_counts = np.empty(0, np.int64)
        self.frag_dst = np.empty(0, np.int64)
        self.frag_w = np.empty(0, np.float64)
        self.frag_offsets = np.zeros(1, np.int64)
        self.frag_src_bucket = np.empty(0, np.int64)
        self._hub_ids_sorted = np.empty(0, np.int64)
        self._hub_degs: np.ndarray | None = None
        self._frag_groups = (np.empty(0, np.int64), np.empty(0, np.int64),
                             np.empty(0, np.int64))
        # CSR over local vertices: indptr local-indexed, indices GLOBAL ids
        self.indptr: np.ndarray | None = None
        self.indices: np.ndarray | None = None
        self.weights: np.ndarray | None = None
        self.k: np.ndarray | None = None          # local weighted degrees
        self.state: dict[str, np.ndarray] = {}    # per-local-vertex arrays
        self.comm_state: dict[str, np.ndarray] = {}  # per-local-community-id
        self.ghosts: list[np.ndarray] = []        # per-owner ghost id arrays
        self.M: float = 0.0                       # global, set by engine

    # -- graph build --------------------------------------------------------

    def ingest_edges(self, tbl: pa.Table | None) -> int:
        if tbl is not None and tbl.num_rows:
            self._pending.append(tbl)
        return sum(t.num_rows for t in self._pending)

    def ingest_block_take(self, tbl: pa.Table | None,
                          idx: "np.ndarray | None") -> int:
        """Index-vector routing: gather this shard's rows of a whole
        block via the route task's precomputed row indices (ascending →
        near-sequential reads).  The gather writes E/P rows into the
        shard's prewarmed heap; nothing but the 4 B/row index vector
        ever hits fresh plasma (see engine._route_index_block)."""
        if tbl is None or idx is None or len(idx) == 0:
            return 0
        sub = tbl.take(pa.array(idx))
        self._pending.append(sub)
        return sub.num_rows

    def ingest_block_range(self, tbl: pa.Table | None) -> int:
        """Owner-side routing: keep this shard's rows (lo <= src < hi)
        of a WHOLE edge block.  Replaces the _route_block split-copy:
        the block ref is shipped to every shard zero-copy; each shard
        scans src sequentially (cheap mmap read) and writes ONLY its own
        rows — into its recycled, prewarmed heap instead of fresh cold
        plasma pages, which is the non-scaling cost on this host
        (BASELINE.md per-write study).  Row order within the block is
        preserved, so the CSR is bit-identical to the split path's
        (its stable argsort also kept arrival order per owner)."""
        if tbl is None or tbl.num_rows == 0:
            return 0
        import pyarrow.compute as pc
        src = tbl.column("src")
        mask = pc.and_(pc.greater_equal(src, self.lo),
                       pc.less(src, self.hi))
        sub = tbl.filter(mask)
        if sub.num_rows:
            self._pending.append(sub)
        return sub.num_rows

    # -- high-degree vertex splitting (north-rule skew mitigation) ----------
    #
    # Edges whose src is a HUB (global degree above the engine's split
    # threshold) are *additionally* routed by owner(dst) and stored here
    # as "fragments".  The message-pattern supersteps (PageRank, CC, LPA)
    # then EXCLUDE hub rows from the CSR message path (their fan-out to
    # ~every partition made the hub owner the per-iteration straggler) and
    # replace them with fragment contributions that aggregate LOCALLY —
    # the only cross-partition traffic left is fetching the hubs'
    # per-iteration state (#hubs values, tiny).  Louvain/dynamic keep the
    # full owner-routed CSR (hub rows included), so their semantics and
    # oracle parity are untouched.

    def ingest_fragments(self, tbl: pa.Table | None) -> int:
        if tbl is not None and tbl.num_rows:
            self._frag_pending.append(tbl)
        return sum(t.num_rows for t in self._frag_pending)

    def set_hubs(self, hub_ids: np.ndarray, hub_degs: np.ndarray | None = None):
        """Install the hub set: mask hub-src CSR rows out of the message
        path and index the ingested fragments (sorted by src, then dst).
        ``hub_degs`` (global out-degrees, aligned with ``hub_ids``) lets
        fragment holders bucket their hub srcs for the Louvain split."""
        hub_ids = np.asarray(hub_ids, dtype=np.int64)
        self._hub_ids_sorted = hub_ids  # engine sends them sorted
        self._hub_degs = (np.asarray(hub_degs, dtype=np.int64)
                          if hub_degs is not None else None)
        self.hub_mask = np.zeros(self.n_local, dtype=bool)
        local = hub_ids[(hub_ids >= self.lo) & (hub_ids < self.hi)]
        self.hub_mask[local - self.lo] = True
        keep = ~np.repeat(self.hub_mask, np.diff(self.indptr))
        self._edge_keep = None if keep.all() else keep
        self._msg_cache = None
        self._lpa_cache = None
        if self._frag_pending:
            tbl = pa.concat_tables(self._frag_pending)
            self._frag_pending = []
            fsrc = np.asarray(tbl.column("src").to_numpy(), dtype=np.int64)
            fdst = np.asarray(tbl.column("dst").to_numpy(), dtype=np.int64)
            fw = (np.asarray(tbl.column("w").to_numpy(), dtype=np.float64)
                  if "w" in tbl.column_names else np.ones(len(fsrc)))
            order = np.lexsort((fdst, fsrc))
            fsrc, fdst, fw = fsrc[order], fdst[order], fw[order]
            self.frag_src_u, counts = np.unique(fsrc, return_counts=True)
            self.frag_counts = counts
            self.frag_dst, self.frag_w = fdst, fw
            self.frag_offsets = np.concatenate(
                [[0], np.cumsum(counts)]).astype(np.int64)
            if self._hub_degs is not None and len(self.frag_src_u):
                pos = np.searchsorted(self._hub_ids_sorted,
                                      self.frag_src_u)
                # every ingested fragment src must be an installed hub;
                # a narrower re-split would silently mis-bucket (or
                # index past) — fail loud instead
                assert pos.max(initial=-1) < len(self._hub_ids_sorted) \
                    and bool((self._hub_ids_sorted[pos]
                              == self.frag_src_u).all()), \
                    "fragment srcs not in the installed hub set"
                degs = self._hub_degs[pos]
                from ..oracle.louvain import BUCKET_BOUNDS
                self.frag_src_bucket = (np.searchsorted(
                    np.asarray(BUCKET_BOUNDS), degs, side="left") - 1)
            else:
                self.frag_src_bucket = np.full(len(self.frag_src_u), -1,
                                               dtype=np.int64)
            # static local dst-grouping of fragment edges
            fperm = np.argsort(fdst, kind="stable")
            fk = fdst[fperm]
            fuk, fstarts = np.unique(fk, return_index=True)
            self._frag_groups = (fperm, fuk, fstarts)
        else:
            self.frag_src_u = np.empty(0, np.int64)
            self.frag_counts = np.empty(0, np.int64)
            self.frag_dst = np.empty(0, np.int64)
            self.frag_w = np.empty(0, np.float64)
            self.frag_offsets = np.zeros(1, np.int64)
            self.frag_src_bucket = np.empty(0, np.int64)
            self._frag_groups = (np.empty(0, np.int64),
                                 np.empty(0, np.int64),
                                 np.empty(0, np.int64))

    def csr_degrees_of(self, ids: np.ndarray) -> np.ndarray:
        """CSR degrees of the requested LOCAL vertices (global ids)."""
        loc = np.asarray(ids, dtype=np.int64) - self.lo
        return np.diff(self.indptr)[loc].astype(np.int64)

    def local_hubs(self, thr: int) -> tuple[np.ndarray, np.ndarray]:
        """(global ids, degrees) of local vertices with CSR degree > thr
        — the post-build hub detection (tiny result, scales to any n)."""
        deg = np.diff(self.indptr)
        loc = np.flatnonzero(deg > thr)
        return loc + self.lo, deg[loc]

    def export_hub_fragments(self, thr: int):
        """Hub-src CSR rows re-routed by owner(dst) — the targeted
        mini-shuffle feeding peers' ingest_fragments (num_returns=P)."""
        from ..oracle.louvain import _ranges_concat
        deg = np.diff(self.indptr)
        loc = np.flatnonzero(deg > thr)
        if len(loc) == 0:
            empty = pa.table({"src": pa.array([], pa.int64()),
                              "dst": pa.array([], pa.int64()),
                              "w": pa.array([], pa.float64())})
            return tuple(empty for _ in range(self.P)) if self.P > 1 \
                else empty
        take = _ranges_concat(self.indptr[loc], deg[loc])
        src = np.repeat(loc + self.lo, deg[loc])
        dst = self.indices[take]
        w = self.weights[take]
        parts = split_by_owner(dst, self.bounds, src, w)
        out = [pa.table({"src": s, "dst": d, "w": ww})
               for d, s, ww in parts]
        return tuple(out) if self.P > 1 else out[0]

    def get_frag_requests(self) -> list[np.ndarray]:
        """Per-owner hub-src id arrays whose state fragments need."""
        return [ids for ids, in split_by_owner(self.frag_src_u, self.bounds)]

    def store_frag_requests(self, reqs: list[np.ndarray]):
        """Install the STATIC per-requester hub-id lists this shard owns,
        so each iteration's frag exchange is one serve wave (no dynamic
        request shipping)."""
        self._frag_serve_reqs = [np.asarray(r, dtype=np.int64) - self.lo
                                 for r in reqs]

    def frag_serve(self, name: str) -> tuple:
        """Serve state[name] for every requester's stored hub ids
        (num_returns=P)."""
        arr = self.state[name]
        return tuple(arr[r] for r in self._frag_serve_reqs)

    def _frag_src_values(self, vals: list) -> np.ndarray:
        """Reassemble fetched per-owner value chunks into frag_src_u
        order (split_by_owner on sorted unique ids preserves order)."""
        import ray
        vals = [ray.get(v) if isinstance(v, ray.ObjectRef) else v
                for v in vals]
        out = np.concatenate([np.asarray(v) for v in vals]) \
            if vals else np.empty(0)
        return out  # frag_src_u is sorted -> owner chunks concat in order

    # prefault budgets per CSR edge.  BASE covers the message-path
    # algorithms (PageRank/CC/LPA: perm cache + per-iteration gathered
    # values) and is paid at build; the full budget covers a Louvain
    # round's transient allocations (bucket-slice arrays, sort
    # key/order, three gathers) and is topped up lazily before round 0
    # (engine._ensure_scratch) so PageRank-only engines never populate it
    BASE_WARMUP_BYTES_PER_EDGE = 24
    WARMUP_BYTES_PER_EDGE = 64
    WARMUP_CAP_BYTES = 2 << 30

    def warmup_scratch(self, bytes_per_edge: "int | None" = None) -> int:
        """Prefault per-round scratch, workload-aware and incremental.

        Build-time default is BASE_WARMUP_BYTES_PER_EDGE (covers the
        message-path algorithms: perm cache + per-iteration gathers);
        the Louvain entry points top up to WARMUP_BYTES_PER_EDGE before
        round 0 (engine._ensure_scratch).  Re-warming a smaller-or-equal
        budget is a no-op; a larger budget re-allocates the full size —
        the recycled heap supplies the already-warm portion, so only the
        delta pages are populated."""
        import os as _os
        _env = _os.environ.get("LINKGRAPH_WARMUP_BYTES_PER_EDGE")
        if _env is not None:
            bpe = int(_env)
        elif bytes_per_edge is not None:
            bpe = int(bytes_per_edge)
        else:
            bpe = self.BASE_WARMUP_BYTES_PER_EDGE
        n_edges = len(self.indices) if self.indices is not None else 0
        nbytes = min(n_edges * bpe, self.WARMUP_CAP_BYTES)
        if nbytes <= getattr(self, "_warmed_bytes", 0):
            return 0
        self._warmed_bytes = nbytes
        return self._warmup_scratch_impl(nbytes)

    def prewarm_scratch(self, n_edges_est: int,
                        bytes_per_edge: "int | None" = None) -> int:
        """Prefault the scratch budget from an edge-count ESTIMATE,
        before any edges arrive.  from_dataset fires this as the actor's
        first task so population overlaps the route+ingest wave (the
        routing histogram gives each shard's exact row count, so the
        estimate is tight).  finalize's warmup_scratch then no-ops (or
        populates only the shortfall), moving the dominant build-phase
        cost off the finalize critical path.  Same incremental-budget
        semantics as warmup_scratch.

        ``bytes_per_edge`` selects the workload budget: default BASE
        (message-path algorithms); Louvain-bound engines pass the full
        WARMUP_BYTES_PER_EDGE so the level-0 preamble's population also
        overlaps the route wave (engine.from_dataset(warmup="louvain"))."""
        import os as _os
        _env = _os.environ.get("LINKGRAPH_WARMUP_BYTES_PER_EDGE")
        bpe = int(_env) if _env is not None else \
            (int(bytes_per_edge) if bytes_per_edge is not None
             else self.BASE_WARMUP_BYTES_PER_EDGE)
        nbytes = min(max(0, int(n_edges_est)) * bpe, self.WARMUP_CAP_BYTES)
        if nbytes <= getattr(self, "_warmed_bytes", 0):
            return 0
        self._warmed_bytes = nbytes
        return self._warmup_scratch_impl(nbytes)

    def _warmup_scratch_impl(self, nbytes: int) -> int:
        """Prefault the per-round scratch working set with one SEQUENTIAL
        fill.  tune_malloc keeps freed large buffers on the heap, so the
        pages this faults in are exactly the pages every round's
        temporaries reuse.  Sequential write faults cost ~1 page-fault
        per 4 KB; the alternative — first-touching the same pages inside
        round 0's random gathers — measured ~35 s per actor at stress
        scale on this virtualized host (round-2 profile).  Runs inside
        the build wave, so it overlaps across actors and scales with P.
        Returns bytes prefaulted."""
        n = nbytes // 8
        if n <= 0:
            return 0
        from ..common import collapse_hugepages
        a = np.empty(n, np.float64)
        # ONE touch per 4 KB page, then collapse: userspace writes to
        # cold 4 KB-backed pages run at ~210 MB/s on this host (nested
        # page-table walks per access), while the kernel-side collapse
        # copy runs at full speed — the strided touch populates the same
        # pages with 1/512th of the slow writes.  Measured on a 16-actor
        # x 480 MB wave: full fill 64.6 s, stride+collapse 10-14 s.
        # Collapse must come AFTER the touch (MADV_COLLAPSE refuses
        # unpopulated ranges); the buffer then returns to the recycled
        # heap with 2 MB backing, so every round's temporaries inherit
        # huge pages — random gathers over them measure ~3.5-25x faster
        # than on 4 KB pages (common.collapse_hugepages)
        a[::512] = 0.0
        collapse_hugepages(a)
        del a
        return n * 8

    def finalize_graph(self) -> dict:
        """Build the local CSR from ingested rows. Returns local stats."""
        import time as _time
        from ..common import csr_kernels
        _t0 = _time.time()
        chunks = None
        lib = csr_kernels()
        if self._pending and lib is not None \
                and all("w" not in t.column_names for t in self._pending):
            chunks = self._int64_chunks(self._pending)
        if chunks is not None:
            # zero-materialization path: count + scatter straight from the
            # plasma-backed exchange chunks — no concat copies, no sort
            # temporaries; the only fresh heap is the adjacency itself
            self._pending = []
            _t1 = _time.time()
            self._reset_graph_caches()
            indptr, indices, _ = self._scatter_build(lib, chunks)
            self._install_csr(indptr, indices, None)
            _t2 = _time.time()
            self.warmup_scratch()
            return {
                "pid": self.pid, "n_local": self.n_local,
                "n_edges": int(len(self.indices)),
                "k_sum": float(self.k.sum()),
                "out_deg_nonzero": int((np.diff(self.indptr) > 0).sum()),
                "secs": {"concat": round(_t1 - _t0, 3),
                         "build_csr": round(_t2 - _t1, 3),
                         "warmup": round(_time.time() - _t2, 3)},
            }
        if self._pending:
            tbl = pa.concat_tables(self._pending)
            # np.asarray: no copy when parquet already stores int64/f64
            # (astype always copies — 3 extra O(E) passes at build time)
            src = np.asarray(tbl.column("src").to_numpy(), dtype=np.int64)
            dst = np.asarray(tbl.column("dst").to_numpy(), dtype=np.int64)
            # no ones() fill for unweighted inputs — _build_csr elides
            # every E-length weight array for w=None
            w = (np.asarray(tbl.column("w").to_numpy(), dtype=np.float64)
                 if "w" in tbl.column_names else None)
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
            w = None
        self._pending = []
        _t1 = _time.time()
        self._build_csr(src, dst, w)
        _t2 = _time.time()
        self.warmup_scratch()
        _t3 = _time.time()
        return {
            "pid": self.pid, "n_local": self.n_local,
            "n_edges": int(len(self.indices)),
            "k_sum": float(self.k.sum()),
            "out_deg_nonzero": int((np.diff(self.indptr) > 0).sum()),
            "secs": {"concat": round(_t1 - _t0, 3),
                     "build_csr": round(_t2 - _t1, 3),
                     "warmup": round(_t3 - _t2, 3)},
        }

    def _msg_groups(self):
        """Static grouping of ``self.indices`` (message destinations) —
        (perm, uk, starts, owner_cuts), computed once per graph version.

        Supersteps that aggregate messages by dst (PageRank sums, CC mins)
        reuse this instead of re-sorting the shard's edge list every
        iteration (the argsort was >80% of per-iteration time at scale).
        ``rowperm`` maps each dst-sorted edge slot to its SOURCE ROW, so
        per-iteration message values are ONE fused gather
        (``contrib[rowperm]``) instead of repeat-then-permute (two
        E-length passes).  The underlying permutation is the stable
        argsort of indices, so reduce order — and float sums — are
        bit-identical to the naive _grouped_sum path."""
        if getattr(self, "_msg_cache", None) is None:
            if self._edge_keep is not None:
                kept = np.flatnonzero(self._edge_keep)
                perm = kept[np.argsort(self.indices[kept], kind="stable")]
            else:
                perm = np.argsort(self.indices, kind="stable")
            k = self.indices[perm]
            uk, starts = np.unique(k, return_index=True)
            cuts = np.searchsorted(uk, self.bounds)
            rowperm = np.repeat(np.arange(self.n_local, dtype=np.int64),
                                np.diff(self.indptr))[perm]
            from ..common import collapse_hugepages
            collapse_hugepages(rowperm, uk, starts)  # per-iteration gathers
            self._msg_cache = (rowperm, uk, starts, cuts)
        return self._msg_cache

    def _lpa_groups(self):
        """Static LPA edge view — (row, dst, w_kept_or_None), computed
        once per graph version: non-self-loop kept edges, with ``row``
        the local source row of each (so per-iteration label values are
        one gather ``lab[row]``).  ``w`` stays None for unweighted
        graphs (callers substitute a stride-0 broadcast of ones)."""
        if getattr(self, "_lpa_cache", None) is None:
            src_g = np.repeat(
                np.arange(self.n_local, dtype=np.int64) + self.lo,
                np.diff(self.indptr))
            nonself = self.indices != src_g
            if self._edge_keep is not None:
                nonself &= self._edge_keep  # hub rows travel as fragments
            row = (src_g - self.lo)[nonself]
            dst = self.indices[nonself]
            w = (None if (len(self.weights) and self.weights.strides[0] == 0)
                 else self.weights[nonself])
            from ..common import collapse_hugepages
            if w is None:
                collapse_hugepages(row, dst)
            else:
                collapse_hugepages(row, dst, w)
            self._lpa_cache = (row, dst, w)
        return self._lpa_cache

    @staticmethod
    def _int64_chunks(tables) -> "list[tuple[np.ndarray, np.ndarray]] | None":
        """(src, dst) per Arrow chunk as zero-copy int64 views into the
        plasma-backed exchange blocks, or None when any chunk has nulls
        or a non-int64 dtype (callers fall back to the concat path)."""
        out = []
        try:
            for t in tables:
                sc, dc = t.column("src"), t.column("dst")
                if sc.null_count or dc.null_count:
                    return None
                if [len(c) for c in sc.chunks] != \
                        [len(c) for c in dc.chunks]:
                    # src/dst chunk layouts differ (independently-chunked
                    # columns): zipping would misalign rows and hand the
                    # C kernels mismatched lengths — use the concat path
                    return None
                for s_ch, d_ch in zip(sc.chunks, dc.chunks):
                    if len(s_ch) == 0:
                        continue
                    s = s_ch.to_numpy(zero_copy_only=True)
                    d = d_ch.to_numpy(zero_copy_only=True)
                    if s.dtype != np.int64 or d.dtype != np.int64:
                        return None
                    out.append((s, d))
        except Exception:
            return None
        return out

    def _scatter_build(self, lib, chunks, w_chunks=None):
        """Two-pass counting sort over (src, dst[, w]) chunks via the C
        kernels: read-only count pass -> indptr, then one scatter pass
        into the fresh adjacency (+ weights).  Within-node order is
        chunk-arrival order (deterministic: actor tasks run in submission
        order), which is value-identical for the integral-weight graphs
        this path is gated to — see csrkern.c and tests/test_csrkern.py.
        Returns (indptr, indices, w_out-or-None)."""
        import ctypes
        from ..common import collapse_hugepages
        p = ctypes.c_void_p
        indptr = np.zeros(self.n_local + 1, dtype=np.int64)
        counts_p = p(indptr.ctypes.data + 8)   # counts land in indptr[1:]
        bad = 0
        n_tot = 0
        for s, _ in chunks:
            bad += lib.csr_count(p(s.ctypes.data), len(s), self.lo,
                                 self.n_local, counts_p)
            n_tot += len(s)
        if bad:
            raise ValueError(f"shard {self.pid}: {bad} edges with src "
                             f"outside [{self.lo}, {self.hi})")
        np.cumsum(indptr, out=indptr)
        indices = np.empty(n_tot, dtype=np.int64)
        if n_tot:
            # the scatter writes RANDOMLY: pre-fault the pages with one
            # sequential touch per 4 KB page and collapse to 2 MB pages
            # first — random access to cold 4 KB pages costs ~1 us/element
            # on this host (measured 3.5 s -> 0.8 s on a 50M-edge scatter)
            indices[::512] = 0
            collapse_hugepages(indices)
        cursor = indptr[:-1].copy()
        if w_chunks is None:
            for s, d in chunks:
                lib.csr_scatter(p(s.ctypes.data), p(d.ctypes.data), len(s),
                                self.lo, p(cursor.ctypes.data),
                                p(indices.ctypes.data))
            return indptr, indices, None
        w_out = np.empty(n_tot, dtype=np.float64)
        w_out[::512] = 0.0
        collapse_hugepages(w_out)
        for (s, d), wv in zip(chunks, w_chunks):
            lib.csr_scatter_w(p(s.ctypes.data), p(d.ctypes.data),
                              p(wv.ctypes.data), len(s), self.lo,
                              p(cursor.ctypes.data), p(indices.ctypes.data),
                              p(w_out.ctypes.data))
        return indptr, indices, w_out

    def _reset_graph_caches(self):
        self._msg_cache = None
        self._lpa_cache = None
        self._lv_bucket_cache = {}
        # static ghost-order / edge-position caches (HITS, k-core)
        self._ghost_order_cache = None
        self._hits_pos = None
        self._kcore_pos = None
        # graph mutation invalidates the hub split (the engine re-splits
        # explicitly if wanted); fall back to unsplit message paths
        self.hub_mask = np.zeros(self.n_local, dtype=bool)
        self._edge_keep = None
        self.frag_src_u = np.empty(0, np.int64)
        self.frag_counts = np.empty(0, np.int64)
        self.frag_dst = np.empty(0, np.int64)
        self.frag_w = np.empty(0, np.float64)
        self.frag_offsets = np.zeros(1, np.int64)
        self.frag_src_bucket = np.empty(0, np.int64)
        self._frag_groups = (np.empty(0, np.int64), np.empty(0, np.int64),
                             np.empty(0, np.int64))

    def _install_csr(self, indptr: np.ndarray, indices: np.ndarray,
                     w: "np.ndarray | None"):
        """Common CSR epilogue: install arrays (``w=None`` -> stride-0
        broadcast ones, the unweighted elision), promote to huge pages,
        derive weighted degrees and the static ghost sets."""
        from ..common import collapse_hugepages
        unweighted = w is None
        if unweighted:
            w = np.broadcast_to(np.float64(1.0), len(indices))
        self.indptr, self.indices, self.weights = indptr, indices, w
        # deterministic huge-page promotion of the arrays every superstep
        # gathers from: 4 KB pages cost ~25x on random access here
        if unweighted:
            collapse_hugepages(indptr, indices)
        else:
            collapse_hugepages(indptr, indices, w)
        deg = np.diff(indptr)
        if unweighted:
            # weighted degree of all-1.0 weights IS the degree count;
            # integer counts < 2^53 are exact in float64, so this is
            # bit-identical to the reduceat sum of ones
            self.k = deg.astype(np.float64)
        elif len(indices):
            ksum = np.add.reduceat(np.concatenate([w, [0.0]]), indptr[:-1])
            self.k = np.where(deg > 0, ksum, 0.0)
        else:
            self.k = np.zeros(self.n_local)
        # static ghost sets: remote ids referenced by local edges.
        # Bitmap + flatnonzero (already sorted) when the node space is
        # small enough for a worker-side byte vector — np.unique's
        # mask-copy + sort was 5.9 s/shard at 50M edges; the bitmap pass
        # is ~0.3 s.  Billion-vertex graphs fall back to unique.
        if self.n_global <= 64_000_000:
            bm = np.zeros(self.n_global, dtype=bool)
            bm[indices] = True
            bm[self.lo:self.hi] = False
            remote = np.flatnonzero(bm)
        else:
            remote = np.unique(indices[(indices < self.lo)
                                       | (indices >= self.hi)])
        self.ghosts = [ids for ids, in split_by_owner(remote, self.bounds)]

    def _build_csr(self, src: np.ndarray, dst: np.ndarray,
                   w: np.ndarray | None):
        from ..common import collapse_hugepages, csr_kernels
        # Unweighted graphs (w absent or all exactly 1.0 — the common
        # case for level-0 web link graphs) skip every E-length weight
        # array: no ones() fill, no w gather, and the persistent
        # ``weights`` is a stride-0 broadcast view backed by ONE float64.
        # That removes ~3 E x 8 B first-touch page populations per build
        # plus E x 8 B of resident CSR bytes — population is the
        # documented non-scaling term of the build on this host.  All
        # kernel reads (gathers, sums, reduceat on gathered copies) are
        # value-identical because every weight IS 1.0.
        unweighted = w is None
        if not unweighted:
            w = np.asarray(w)
            unweighted = (len(w) == 0
                          or (w.strides[0] == 0 and w.flat[0] == 1.0)
                          or bool((w == 1.0).all()))
        integral = unweighted or bool((w == np.floor(w)).all())
        self._reset_graph_caches()
        lib = csr_kernels() if integral else None
        if lib is not None:
            # counting-sort scatter: no composite key, no argsort output,
            # no gathers — fresh heap is the adjacency (+ weights) only.
            # Integral weights make every downstream sum exact, so the
            # arrival multi-edge order is value-identical to sorted.
            src = np.ascontiguousarray(src, dtype=np.int64)
            dst = np.ascontiguousarray(dst, dtype=np.int64)
            wc = None if unweighted \
                else [np.ascontiguousarray(w, dtype=np.float64)]
            indptr, indices, w_out = self._scatter_build(
                lib, [(src, dst)], wc)
            self._install_csr(indptr, indices, w_out)
            return
        # numpy sort fallback (and the semantics oracle for the kernels)
        # — the sort below gathers these randomly; promote to 2 MB pages
        # first (populated by the exchange concat; ~3.5-25x cheaper
        # random access on this host)
        if unweighted:
            collapse_hugepages(src, dst)
        else:
            collapse_hugepages(src, dst, w)
        loc = src - self.lo
        if integral and composite_fits(self.n_local, self.n_global):
            # integral weights: kernel sums are exact, so multi-edge
            # order is irrelevant — unstable composite-key sort (the
            # stable lexsort dominated CSR build time at 100M edges)
            order = np.argsort(loc * np.int64(self.n_global) + dst)
        else:
            order = np.lexsort((dst, loc))
        loc, dst = loc[order], dst[order]
        if not unweighted:
            w = w[order]
        indptr = np.zeros(self.n_local + 1, dtype=np.int64)
        np.add.at(indptr, loc + 1, 1)
        np.cumsum(indptr, out=indptr)
        self._install_csr(indptr, dst, None if unweighted else w)

    def edge_arrays(self) -> pa.Table:
        """Local edges as (src,dst,w) with global ids (for rebuild/ckpt)."""
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        return pa.table({"src": src, "dst": self.indices, "w": self.weights})

    def edge_head(self, k: int, reverse: bool = False) -> pa.Table:
        """First k local edges as (src,dst,w) — src-major CSR order, or
        (dst,src) order with ``reverse`` (S12 display/display_reverse,
        graph_binary.cpp:186-215).  Debug path: worker-side sort is fine,
        only k rows ever leave the shard."""
        src = np.repeat(np.arange(self.n_local, dtype=np.int64) + self.lo,
                        np.diff(self.indptr))
        dst, w = self.indices, self.weights
        if reverse:
            order = np.lexsort((src, dst))[:k]
        else:
            # within-node adjacency order is arrival order on the scatter
            # build path, so the printed (src, dst) contract needs its own
            # sort — debug path, bounded output, worker-side sort is fine
            order = np.lexsort((dst, src))[:k]
        return pa.table({"src": src[order], "dst": dst[order],
                         "w": w[order]})

    def set_global(self, *, M: float | None = None, n_global: int | None = None):
        if M is not None:
            self.M = float(M)
        if n_global is not None:
            self.n_global = int(n_global)

    # -- generic state ------------------------------------------------------

    def init_state(self, name: str, value: float | np.ndarray,
                   kind: str = "vertex", dtype=np.float64):
        size = self.n_local
        if np.isscalar(value):
            arr = np.full(size, value, dtype=dtype)
        else:
            arr = np.asarray(value, dtype=dtype)
            assert len(arr) == size
        if kind == "vertex":
            self.state[name] = arr
        else:
            self.comm_state[name] = arr

    def init_state_iota(self, name: str):
        """state[name][v] = global vertex id (singleton labels)."""
        self.state[name] = np.arange(self.lo, self.hi, dtype=np.int64)

    def get_state(self, name: str) -> np.ndarray:
        return self.state[name]

    def get_ghost_requests(self) -> list[np.ndarray]:
        """Per-owner ghost id arrays (static until the graph changes)."""
        return self.ghosts

    def serve(self, name: str, ids: np.ndarray) -> np.ndarray:
        """Values of a vertex-state array for the requested (local) ids."""
        return self.state[name][np.asarray(ids, dtype=np.int64) - self.lo]

    def serve_many(self, name: str, reqs) -> tuple:
        """Batched serve: one call answers ALL requesters (num_returns=P).

        ``reqs`` may contain ObjectRefs (each requester's id array) —
        resolved here so the driver issues P calls per exchange instead of
        P^2 point-to-point calls (the P^2 pattern dominated wall time at
        P>=16)."""
        import ray
        reqs = [ray.get(r) if isinstance(r, ray.ObjectRef) else r
                for r in reqs]
        arr = self.state[name]
        return tuple(arr[np.asarray(r, dtype=np.int64) - self.lo]
                     for r in reqs)

    def serve_comm(self, names: list[str], ids: np.ndarray) -> list[np.ndarray]:
        ids = np.asarray(ids, dtype=np.int64) - self.lo
        return [self.comm_state[n][ids] for n in names]

    # -- ghost-value resolution helper --------------------------------------

    def _full_values(self, name: str, ghost_vals: list[np.ndarray],
                     dtype=np.int64) -> tuple[np.ndarray, np.ndarray]:
        """Return (ids, values) covering local vertices + ghosts, and a
        lookup: values for arbitrary ids via searchsorted on sorted ids."""
        ids = [np.arange(self.lo, self.hi, dtype=np.int64)]
        vals = [self.state[name]]
        for g_ids, g_vals in zip(self.ghosts, ghost_vals):
            if len(g_ids):
                ids.append(g_ids)
                vals.append(np.asarray(g_vals))
        all_ids = np.concatenate(ids)
        all_vals = np.concatenate(vals).astype(dtype)
        order = np.argsort(all_ids, kind="stable")
        return all_ids[order], all_vals[order]

    @staticmethod
    def _lookup(sorted_ids: np.ndarray, sorted_vals: np.ndarray,
                query: np.ndarray) -> np.ndarray:
        return sorted_vals[np.searchsorted(sorted_ids, query)]

    # -- checkpoint ---------------------------------------------------------

    def checkpoint(self, ckpt_dir: str, names: list[str]) -> dict:
        os.makedirs(ckpt_dir, exist_ok=True)
        cols = {"node": np.arange(self.lo, self.hi, dtype=np.int64)}
        for n in names:
            cols[n] = self.state[n]
        path = os.path.join(ckpt_dir, f"part-{self.pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, path)  # atomic publish
        return {"pid": self.pid, "path": path,
                "bytes": os.path.getsize(path), "rows": self.n_local}

    def checkpoint_mapped(self, ckpt_dir: str, mapping_ref) -> dict:
        """Write mapping[labels] as the 'labels' column (used by the
        hierarchy writer: level files store DENSE renumbered comm ids,
        like display_partition's .tree lines, louvain.cpp:236-257)."""
        import ray
        mapping = ray.get(mapping_ref) \
            if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        os.makedirs(ckpt_dir, exist_ok=True)
        tbl = pa.table({
            "node": np.arange(self.lo, self.hi, dtype=np.int64),
            "labels": mapping[self.state["labels"]],
        })
        path = os.path.join(ckpt_dir, f"part-{self.pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return {"pid": self.pid, "path": path}

    def restore(self, ckpt_dir: str, names: list[str],
                dtypes: list | None = None) -> bool:
        path = os.path.join(ckpt_dir, f"part-{self.pid:05d}.parquet")
        if not os.path.exists(path):
            return False
        tbl = pq.read_table(path)
        for i, n in enumerate(names):
            arr = tbl.column(n).to_numpy()
            if dtypes:
                arr = arr.astype(dtypes[i])
            self.state[n] = arr
        if "rank" in names and getattr(self, "_outdeg", None) is not None:
            # derived per-iteration state must follow the restored rank
            self.state["pr_contrib"] = \
                self.state["rank"] / np.maximum(self._outdeg, 1.0)
        return True
