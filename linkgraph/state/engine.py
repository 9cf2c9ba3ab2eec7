"""GraphEngine — driver for the partitioned-actor graph algorithms.

Owns the actor pool of :class:`LouvainShard` partitions and coordinates
supersteps.  The driver only routes ObjectRefs between actors (payloads
move through the object store directly); per-superstep scalars (deltas,
move counts, Q terms) are the only values materialized driver-side.

Partitioning: contiguous vertex-id ranges with **degree-balanced**
boundaries computed from a coarse degree histogram (the cluster-scale
analog of the reference's degree-bucket work assignment,
``modularity_optimisation_mem.cu:326-404`` — see SURVEY.md §4).  Skew
handling inside a shard is vectorized NumPy, so a hub vertex costs its
edges, not a straggler task.

Checkpointing (north rule): ``checkpoint_every`` supersteps, each shard
writes its vertex state to ``ckpt/{job}/{superstep}/part-{pid}.parquet``
atomically; the driver then writes ``manifest.json`` + ``_SUCCESS``.
``resume()`` loads the latest committed superstep and continues.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import ray

from ..oracle.graph import CSRGraph
from ..oracle import louvain as oracle_lv
from .partition import _grouped_sum2, dedup_pairs, split_by_owner
from .shard_louvain import LouvainShard

N_BUCKETS = len(oracle_lv.BUCKET_BOUNDS) - 1


def _split_table(tbl: pa.Table, own: np.ndarray, P: int) -> list[pa.Table]:
    order = np.argsort(own, kind="stable")
    own_s = own[order]
    cuts = np.searchsorted(own_s, np.arange(P + 1))
    idx = pa.array(order)
    return [tbl.take(idx[cuts[p]:cuts[p + 1]]) for p in range(P)]


@ray.remote
def _dedup_contract(remap: np.ndarray, n_sub: int, *chunks: pa.Table):
    """Concat one contraction hash-bucket's per-shard partials, remap to
    dense community ids, exact grouped-sum dedup.  num_returns=2:
    (edges table, deduped row count) — the table ref stays in the object
    store; only the count reaches the driver."""
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64()),
                      "w": pa.array([], pa.float64())})
    tbls = [c for c in chunks if c.num_rows]
    if not tbls:
        return empty, 0
    tbl = pa.concat_tables(tbls)
    src = remap[tbl.column("csrc").to_numpy()]
    dst = remap[tbl.column("cdst").to_numpy()]
    s, d, sums = _grouped_sum2(src, dst, tbl.column("w").to_numpy(), n_sub)
    return pa.table({"src": s, "dst": d, "w": sums}), int(len(s))


@ray.remote
def _route_block(tbl: pa.Table, bounds: np.ndarray):
    """Split an edge block by owning partition of src (num_returns=P)."""
    src = tbl.column("src").to_numpy()
    own = np.searchsorted(bounds, src, side="right") - 1
    P = len(bounds) - 1
    out = _split_table(tbl, own, P)
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _route_index_block(tbl: pa.Table, bounds: np.ndarray):
    """Index-vector routing (num_returns=P): per-owner ROW-INDEX arrays
    into this block, int32, ascending within each owner (stable argsort
    keeps arrival order — same row order as the split/owner modes, so
    the CSR stays bit-identical).  Writes 4 B/row to plasma instead of
    the split route's full 16+ B/row sliced copies; the data itself is
    gathered owner-side (ingest_block_take), E/P rows per shard."""
    src = tbl.column("src").to_numpy()
    own = np.searchsorted(bounds, src, side="right") - 1
    P = len(bounds) - 1
    # int32 indices halve plasma traffic; blocks are target_max_block_size
    # (<< 2^31 rows) by construction, but guard the cast anyway
    assert tbl.num_rows < 2**31, "block too large for int32 row indices"
    order = np.argsort(own, kind="stable").astype(np.int32)
    cuts = np.searchsorted(own[order], np.arange(P + 1))
    out = [order[cuts[p]:cuts[p + 1]] for p in range(P)]
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _route_delta_block(tbl: pa.Table, bounds: np.ndarray):
    """Stage 1 of the Dataset-native delta exchange (M1/M2 at scale,
    main_louvain.cpp:143-322): split one DIRECTED delta block by
    owner(src), clipped to the last partition for not-yet-allocated ids
    (new nodes always land in the last range).  num_returns = P+1; the
    last return is (max_id, n_rows) — the driver grows the node space
    from these tiny scalars instead of materializing the rows."""
    P = len(bounds) - 1
    s = tbl.column("src").to_numpy()
    d = tbl.column("dst").to_numpy()
    has_w = "w" in tbl.column_names
    mx = int(max(s.max(initial=-1), d.max(initial=-1)))
    own = np.minimum(np.searchsorted(bounds, s, side="right") - 1, P - 1)
    order = np.argsort(own, kind="stable")
    cuts = np.searchsorted(own[order], np.arange(P + 1))
    outs = []
    for p in range(P):
        sl = order[cuts[p]:cuts[p + 1]]
        cols = {"src": s[sl], "dst": d[sl]}
        if has_w:
            cols["w"] = tbl.column("w").to_numpy()[sl]
        outs.append(pa.table(cols))
    return (*outs, (mx, len(s)))


@ray.remote
def _dedup_sym_route(bounds: np.ndarray, dedup: bool, drop_self: bool,
                     *chunks: pa.Table):
    """Stage 2: one task per owner — concat the directed pairs routed
    here, optionally drop self-loops + dedup directed (src,dst) keeping
    the first occurrence (the M5 preprocess contract), then symmetrize:
    the as-written rows stay with this owner, the reversed copies are
    split by owner(dst).  Self-loops that survive ``drop_self=False``
    keep only their forward direction (apply_delta_batch semantics).
    num_returns = P+1; the last return is the post-dedup pair count."""
    P = len(bounds) - 1
    tbls = [c for c in chunks if c.num_rows]
    if not tbls:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        return (*[empty] * P, 0)
    tbl = pa.concat_tables(tbls)
    s = tbl.column("src").to_numpy()
    d = tbl.column("dst").to_numpy()
    has_w = "w" in tbl.column_names
    w = tbl.column("w").to_numpy() if has_w else np.ones(len(s))
    if drop_self:
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
    if dedup:
        s, d, w = dedup_pairs(s, d, w)
    n_pairs = len(s)
    nonself = s != d
    own_rev = np.minimum(
        np.searchsorted(bounds, d[nonself], side="right") - 1, P - 1)
    order = np.argsort(own_rev, kind="stable")
    cuts = np.searchsorted(own_rev[order], np.arange(P + 1))
    rs, rd, rw = d[nonself], s[nonself], w[nonself]
    my = int(np.searchsorted(bounds, s[0], side="right") - 1) \
        if len(s) else 0
    my = min(my, P - 1)
    outs = []
    for p in range(P):
        sl = order[cuts[p]:cuts[p + 1]]
        cols = {"src": rs[sl], "dst": rd[sl]}
        if has_w:
            cols["w"] = rw[sl]
        part = pa.table(cols)
        if p == my and n_pairs:
            fwd = {"src": s, "dst": d}
            if has_w:
                fwd["w"] = w
            part = pa.concat_tables([pa.table(fwd), part])
        outs.append(part)
    return (*outs, n_pairs)




def degree_balanced_bounds(src: "np.ndarray | None", n_nodes: int,
                           n_parts: int,
                           degree_hist: np.ndarray | None = None,
                           n_coarse: int = 4096) -> np.ndarray:
    """Range boundaries balancing total degree per partition.

    ``degree_hist``: per-coarse-bucket edge counts (bucket = id // width).
    If None and ``src`` given, computed locally (test path).  At cluster
    scale the histogram comes from a tiny Dataset groupby (one row per
    coarse bucket — engine.from_dataset does this).
    """
    width = max(1, -(-n_nodes // n_coarse))
    nb = -(-n_nodes // width)
    if degree_hist is None:
        degree_hist = np.bincount(src // width, minlength=nb).astype(np.float64)
    cum = np.concatenate([[0.0], np.cumsum(degree_hist + 1e-9)])
    targets = cum[-1] * np.arange(1, n_parts) / n_parts
    cut_buckets = np.searchsorted(cum, targets, side="left")
    bounds = np.concatenate([[0], np.minimum(cut_buckets * width, n_nodes),
                             [n_nodes]])
    # enforce strictly increasing (degenerate histograms)
    for i in range(1, len(bounds)):
        if bounds[i] <= bounds[i - 1]:
            bounds[i] = min(n_nodes, bounds[i - 1] + 1)
    bounds[-1] = n_nodes
    return np.maximum.accumulate(bounds).astype(np.int64)


class GraphEngine:
    # contraction outputs up to this many DEDUPED edges run their
    # remaining Louvain levels on the driver (oracle kernel); larger ones
    # recurse into a child engine (distributed levels).  The count is
    # parallelism-invariant (fixed-width dedup wave, see _dedup_contract)
    # so both parallelism levels take the same branch — required for the
    # "identical results at any cluster size" invariant.
    # With the shmmap shim the driver's oracle solve is allocation-cheap,
    # so mid-size contracted graphs (<= 2M deduped edges) run faster on
    # the driver than through a child engine's build+rounds; bigger ones
    # recurse distributed.  Still P-invariant (deduped count).
    SMALL_CONTRACT_ROWS = 2_000_000

    # fixed hash-bucket width of the contraction dedup wave (independent
    # of P by design) and the child engine's edges-per-partition target
    CONTRACT_BUCKETS = 32
    CHILD_EDGES_PER_PART = 150_000

    # ``louvain()`` gathers the graph to the driver and runs the oracle
    # kernel when total edges <= this threshold (0 = always distributed).
    # Opt-in (queries/pipelines set it): at a few million edges the graph
    # is "small side" — distributing its level-0 rounds is pure exchange
    # overhead, the cluster-scale analog of a broadcast join's build side.
    # Semantics are identical (the oracle IS the parity target); tests
    # leave it 0 so the distributed path stays exercised.
    louvain_driver_threshold = 0

    def __init__(self, bounds: np.ndarray, *, name: str = "graph"):
        from ..common import tune_malloc
        tune_malloc()   # driver also runs oracle kernels on contractions
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        assert self.P >= 2, "engine needs >= 2 partitions (exchange protocol)"
        self.n = int(self.bounds[-1])
        self.name = name
        Actor = ray.remote(LouvainShard)
        self.actors = [Actor.remote(p, self.bounds.tolist())
                       for p in range(self.P)]
        self.M = 0.0
        self.metrics: list[dict] = []
        self._ghost_reqs: list[list[ray.ObjectRef]] | None = None
        self._frag_reqs: list[list[ray.ObjectRef]] | None = None
        self.has_frags = False

    # ------------------------------------------------------------------ build

    @classmethod
    def from_arrays(cls, src, dst, w=None, *, n: int | None = None,
                    n_parts: int = 4, name: str = "graph") -> "GraphEngine":
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        w = np.ones(len(src)) if w is None else np.asarray(w, dtype=np.float64)
        if n is None:
            n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
        bounds = degree_balanced_bounds(src, n, n_parts)
        eng = cls(bounds, name=name)
        tbl = pa.table({"src": src, "dst": dst, "w": w})
        parts = split_by_owner(src, eng.bounds, dst, w)
        for a, (s, d, ww) in zip(eng.actors, parts):
            a.ingest_edges.remote(pa.table({"src": s, "dst": d, "w": ww}))
        eng.finalize()
        return eng

    # per-vertex out-degrees above this multiple of the average mark a
    # vertex as a hub -> its out-edges are split across partitions
    HUB_DEGREE_FACTOR = 32

    @classmethod
    def from_dataset(cls, edges_ds, *, n_nodes: int, n_parts: int = 4,
                     name: str = "graph",
                     split_hubs: bool = True,
                     warmup: str = "base") -> "GraphEngine":
        """Build from a Ray Data edge Dataset (src,dst[,w]) without moving
        rows through the driver: a COARSE per-block degree histogram
        (4096 buckets — O(1) per block regardless of n_nodes) drives the
        degree-balanced bounds, per-block routing tasks feed the shard
        actors, and hubs are detected POST-build from each shard's local
        CSR degrees (no n_nodes-length vector ever touches the driver, so
        this scales to billions of vertices).  Hub fragments are then
        exported owner→owner(dst) as a targeted mini-shuffle of only the
        hub edges (skew mitigation, see install_hubs)."""
        width = max(1, -(-n_nodes // 4096))
        nb = -(-n_nodes // width)
        _t0 = time.time()
        block_refs = edges_ds.to_arrow_refs()

        @ray.remote
        def _deg_block(tbl: pa.Table) -> np.ndarray:
            src = tbl.column("src").to_numpy()
            return np.bincount(src // width, minlength=nb).astype(np.float64)

        hist_parts = ray.get([_deg_block.remote(b) for b in block_refs])
        hist = np.sum(hist_parts, axis=0) if hist_parts else np.zeros(nb)
        hist_raw = hist  # uncapped: exact per-range row counts (prewarm)
        if split_hubs and hist.sum() > 0:
            # the hub split exports hub-src rows to their dst owners, so
            # the per-shard move/message work a range actually carries is
            # the CAPPED degree mass — balancing on raw degree gave the
            # hub-dense range a sliver of vertices and left it idle in
            # every non-hub degree bucket (the round-1 per-bucket skew:
            # 2 of 4 shards busy)
            thr = max(256.0, cls.HUB_DEGREE_FACTOR * hist.sum()
                      / max(1, n_nodes))
            hist = np.minimum(hist, width * thr)
        bounds = degree_balanced_bounds(None, n_nodes, n_parts,
                                        degree_hist=hist)
        _t1 = time.time()
        eng = cls(bounds, name=name)
        _t2 = time.time()
        bounds_ref = ray.put(eng.bounds)
        # Overlap per-shard scratch population with the route wave: the
        # UNCAPPED histogram gives each bound range's exact row count
        # (src-bucket mass, linear within boundary buckets), so every
        # actor prefaults its BASE scratch as its FIRST queued task while
        # the stateless _route_block tasks produce its blocks on other
        # CPUs.  finalize's warmup_scratch then only pays the shortfall.
        cum_raw = np.concatenate([[0.0], np.cumsum(hist_raw)])

        def _mass(x: int) -> float:
            b, r = divmod(int(x), width)
            m = cum_raw[min(b, nb)]
            if r and b < nb:
                m += hist_raw[b] * (r / width)
            return m

        if os.environ.get("LINKGRAPH_PREWARM", "1") != "0":
            # workload-aware budget: a Louvain-bound engine prefaults the
            # full level-0 scratch here so _ensure_scratch's population
            # also overlaps the route wave instead of serializing before
            # round 0 (measured 65 s of the 32-CPU stress preamble)
            from .partition import GraphShard
            wb = GraphShard.WARMUP_BYTES_PER_EDGE if warmup == "louvain" \
                else None
            for p, a in enumerate(eng.actors):
                est = _mass(eng.bounds[p + 1]) - _mass(eng.bounds[p])
                a.prewarm_scratch.remote(int(est), wb)
        pending = []
        route_mode = os.environ.get("LINKGRAPH_ROUTE_MODE", "owner")
        if route_mode not in ("split", "owner", "index"):
            raise ValueError(
                f"LINKGRAPH_ROUTE_MODE={route_mode!r}: expected one of "
                "'owner' (default), 'split', 'index'")
        if route_mode == "split":
            # legacy split-copy route: one stateless task per block
            # materializes P sliced copies into fresh plasma objects.
            # Kept for A/B — the cold plasma page-writes it does were the
            # anti-scaling term of the build (run-7/8: route_ingest 44 s
            # @P=4 -> 61-71 s @P=16 on identical input)
            for blk in block_refs:
                parts = _route_block.options(num_returns=eng.P).remote(
                    blk, bounds_ref)
                if eng.P == 1:
                    parts = [parts]
                for a, pref in zip(eng.actors, parts):
                    pending.append(a.ingest_edges.remote(pref))
        elif route_mode == "owner":
            # owner-side routing: every shard scans each block zero-copy
            # and keeps only its own src range — no routed copy through
            # cold plasma, but per-shard scan work is E regardless of P
            # (P x E aggregate reads become the constant term at
            # billion-edge inputs — run-10 study)
            for blk in block_refs:
                for a in eng.actors:
                    pending.append(a.ingest_block_range.remote(blk))
        else:
            # index-vector routing (LINKGRAPH_ROUTE_MODE=index): the
            # route task writes only int32 per-owner row indices
            # (4 B/row of plasma, no data copy); each shard gathers ITS
            # rows from the shared block (E/P rows, ascending indices ->
            # near-sequential reads).  Measured SLOWER than owner mode
            # on this box at 1.2B edges (the argsort dominates; see
            # BASELINE.md run-10 follow-up) — kept as the option a
            # network-attached cluster would prefer (it moves 4 B/row
            # instead of re-reading blocks P times).
            for blk in block_refs:
                parts = _route_index_block.options(
                    num_returns=eng.P).remote(blk, bounds_ref)
                if eng.P == 1:
                    parts = [parts]
                for a, iref in zip(eng.actors, parts):
                    pending.append(a.ingest_block_take.remote(blk, iref))
        ray.get(pending)
        _t3 = time.time()
        eng.finalize()
        _t4 = time.time()
        if split_hubs:
            eng.split_hubs_post()
        eng.metrics.append({
            "job": name, "algo": "build", "kind": "phase",
            "hist_secs": round(_t1 - _t0, 3),
            "actor_secs": round(_t2 - _t1, 3),
            "route_ingest_secs": round(_t3 - _t2, 3),
            "finalize_secs": round(_t4 - _t3, 3),
            "hub_secs": round(time.time() - _t4, 3)})
        return eng

    def split_hubs_post(self) -> int:
        """Detect hubs from shard-local CSR degrees and install the
        high-degree split: owners export their hub-src rows re-routed by
        owner(dst) (a mini-shuffle of ONLY the hub edges), peers ingest
        them as fragments, then install_hubs activates the split.
        Returns the number of hubs found."""
        n_edges_tot = sum(s["n_edges"] for s in self.stats)
        thr = max(256, int(self.HUB_DEGREE_FACTOR * n_edges_tot
                           / max(1, self.n)))
        found = ray.get([a.local_hubs.remote(thr) for a in self.actors])
        ids = np.concatenate([f[0] for f in found])
        degs = np.concatenate([f[1] for f in found])
        if len(ids) == 0:
            return 0
        order = np.argsort(ids)
        ids, degs = ids[order], degs[order]
        frag_parts = [a.export_hub_fragments.options(num_returns=self.P)
                      .remote(thr) for a in self.actors]
        if self.P == 1:
            frag_parts = [[fp] for fp in frag_parts]
        ray.get([a.ingest_fragments.remote(frag_parts[j][p])
                 for j in range(self.P)
                 for p, a in enumerate(self.actors)])
        self.install_hubs(ids, degs)
        return len(ids)

    def install_hubs(self, hubs: np.ndarray,
                     hub_degs: np.ndarray | None = None):
        """Activate the high-degree split on already-ingested fragments.
        The per-requester hub-id lists are pushed to the owners ONCE, so
        each iteration's frag exchange is a single frag_serve wave.
        ``hub_degs`` (global degrees aligned with ``hubs``) enables the
        Louvain hub split (fragment holders bucket their hub srcs by
        degree); when omitted the degrees are fetched from the owners —
        a None here used to leave every frag_src_bucket at -1, silently
        excluding hub vertices from Louvain moves."""
        hubs = np.asarray(hubs, dtype=np.int64)
        order = np.argsort(hubs, kind="stable")
        hubs = hubs[order]
        if hub_degs is not None:
            hub_degs = np.asarray(hub_degs, dtype=np.int64)[order]
        elif len(hubs):
            parts = split_by_owner(hubs, self.bounds)
            deg_parts = ray.get([self.actors[p].csr_degrees_of.remote(ids)
                                 for p, (ids,) in enumerate(parts)])
            hub_degs = np.concatenate(
                [np.asarray(d, dtype=np.int64) for d in deg_parts])
        hub_ref = ray.put(hubs)
        degs_ref = ray.put(hub_degs) if hub_degs is not None else None
        ray.get([a.set_hubs.remote(hub_ref, degs_ref)
                 for a in self.actors])
        reqs = ray.get([a.get_frag_requests.remote() for a in self.actors])
        ray.get([a.store_frag_requests.remote(
            [reqs[i][j] for i in range(self.P)])
            for j, a in enumerate(self.actors)])
        self.has_frags = True

    def _fetch_frag(self, state_name: str) -> list[list[ray.ObjectRef]]:
        """vals[i][j] = state values of actor i's fragment hub-srcs owned
        by actor j — one frag_serve wave (num_returns=P per owner)."""
        outs = [a.frag_serve.options(num_returns=self.P).remote(state_name)
                for a in self.actors]
        if self.P == 1:
            outs = [[o] for o in outs]
        return [[outs[j][i] for j in range(self.P)]
                for i in range(self.P)]

    def finalize(self):
        stats = ray.get([a.finalize_graph.remote() for a in self.actors])
        self.M = sum(s["k_sum"] for s in stats) / 2.0
        ray.get([a.set_global.remote(M=self.M) for a in self.actors])
        self._refresh_ghost_requests()
        self.stats = stats

    def _refresh_ghost_requests(self):
        self._ghost_reqs = [
            a.get_ghost_requests.options(num_returns=self.P).remote()
            for a in self.actors
        ]
        # push each requester's static ghost lists to the owners so label
        # syncs can ship only CHANGED values — forwarded as refs, an
        # owner-to-owner exchange; the O(#ghosts) id lists never touch
        # the driver (they grow with P × cut edges)
        ray.get([self.actors[j].store_label_sync_requests.remote(
            [self._ghost_reqs[i][j] for i in range(self.P)])
            for j in range(self.P)])
        self._lv_synced = False

    # ------------------------------------------------------------- exchanges

    def _fetch_ghost(self, state_name: str) -> list[list[ray.ObjectRef]]:
        """vals[i][j] = values of actor j's state for actor i's ghosts.

        Batched: ONE serve_many call per server actor (num_returns=P)
        instead of P^2 point-to-point calls — RPC count per exchange is
        O(P), payloads still move actor-to-actor via the object store."""
        outs = [self.actors[j].serve_many.options(num_returns=self.P)
                .remote(state_name,
                        [self._ghost_reqs[i][j] for i in range(self.P)])
                for j in range(self.P)]
        if self.P == 1:
            outs = [[o] for o in outs]
        return [[outs[j][i] for j in range(self.P)]
                for i in range(self.P)]

    def _exchange_comm_aggs(self, reqs) -> list[list[ray.ObjectRef]]:
        """comm_vals[i][j] = (tot, size) of actor j's comms for actor i's
        request reqs[i][j] — batched like _fetch_ghost."""
        outs = [self.actors[j].lv_serve_comm_aggs_many
                .options(num_returns=self.P)
                .remote([reqs[i][j] for i in range(self.P)])
                for j in range(self.P)]
        if self.P == 1:
            outs = [[o] for o in outs]
        return [[outs[j][i] for j in range(self.P)]
                for i in range(self.P)]

    def _store_ghost_labels(self):
        """Label-cache refresh: full rebuild on first use / after an
        invalidation, incremental (changed labels only) afterwards."""
        if not getattr(self, "_lv_synced", False):
            vals = self._fetch_ghost("labels")
            ray.get([a.lv_store_ghost_labels.remote(vals[i])
                     for i, a in enumerate(self.actors)])
            self._lv_synced = True
            return
        outs = [a.lv_serve_changed.options(num_returns=self.P).remote()
                for a in self.actors]
        ray.get([a.lv_cache_apply.remote(
            [outs[j][i] for j in range(self.P)])
            for i, a in enumerate(self.actors)])

    def _invalidate_label_cache(self):
        self._lv_synced = False
        ray.get([a.lv_cache_invalidate.remote() for a in self.actors])

    # -------------------------------------------------------------- PageRank

    def pagerank(self, damping: float = 0.85, tol: float = 1e-10,
                 max_iter: int = 200, checkpoint_every: int = 0,
                 ckpt_dir: str | None = None,
                 start_iter: int = 0, ppr_mod: int | None = None,
                 warm: bool = False) -> dict:
        """Distributed power iteration; returns {iterations, delta, secs,
        edges_per_sec}.  ``ppr_mod`` runs personalized PageRank over the
        deterministic seed set {v : v % ppr_mod == 0} (resume from
        checkpoint is not supported for PPR — the teleport vector is
        re-derived only at init).  ``warm`` = incremental PageRank:
        start from the previous rank vector (structure terms are still
        re-derived from the current — possibly delta-mutated — CSR);
        converges to the identical fixed point in far fewer iterations
        when the delta is small."""
        if warm and ppr_mod:
            raise ValueError("warm start is not supported for PPR")
        if start_iter == 0:
            ray.get([a.pagerank_init.remote(damping, ppr_mod, warm)
                     for a in self.actors])
        elif ppr_mod:
            raise ValueError("PPR resume from checkpoint is unsupported")
        n_edges = sum(s["n_edges"] for s in self.stats)
        t0 = time.time()
        if tol <= 0 and not (checkpoint_every and ckpt_dir):
            # fixed-iteration mode: every superstep wave is submitted up
            # front (per-actor queue order + refs carry the dependencies,
            # as in _one_level) and the driver blocks ONCE on all deltas
            delta_refs: list[list] = []
            for _ in range(start_iter, max_iter):
                if self.has_frags:
                    vals = self._fetch_frag("pr_contrib")
                    outs = [a.pagerank_partials.options(num_returns=self.P)
                            .remote(vals[i])
                            for i, a in enumerate(self.actors)]
                else:
                    outs = [a.pagerank_partials.options(num_returns=self.P)
                            .remote() for a in self.actors]
                delta_refs.append([
                    a.pagerank_apply.remote(
                        [outs[i][j] for i in range(self.P)])
                    for j, a in enumerate(self.actors)])
            flat = ray.get([r for refs in delta_refs for r in refs])
            secs = time.time() - t0
            n_it = max_iter - start_iter
            per_iter = [float(sum(flat[k * self.P:(k + 1) * self.P]))
                        for k in range(n_it)]
            for k, d in enumerate(per_iter):
                self.metrics.append({
                    "job": self.name, "algo": "pagerank",
                    "superstep": start_iter + k + 1, "delta": d,
                    "secs": secs / max(1, n_it), "edges": n_edges,
                    "edges_per_sec": n_edges * n_it / max(1e-9, secs),
                })
            return {"iterations": max_iter, "delta": per_iter[-1] if per_iter
                    else 0.0, "secs": secs,
                    "edges_per_sec": n_edges * max(1, n_it) / max(1e-9, secs)}
        it = start_iter
        delta = float("inf")
        while it < max_iter and delta >= tol:
            it += 1
            t_it = time.time()
            if self.has_frags:
                vals = self._fetch_frag("pr_contrib")
                outs = [a.pagerank_partials.options(num_returns=self.P)
                        .remote(vals[i]) for i, a in enumerate(self.actors)]
            else:
                outs = [a.pagerank_partials.options(num_returns=self.P)
                        .remote() for a in self.actors]
            deltas = ray.get([
                a.pagerank_apply.remote([outs[i][j] for i in range(self.P)])
                for j, a in enumerate(self.actors)])
            delta = float(sum(deltas))
            self.metrics.append({
                "job": self.name, "algo": "pagerank", "superstep": it,
                "delta": delta, "secs": time.time() - t_it,
                "edges": n_edges,
                "edges_per_sec": n_edges / max(1e-9, time.time() - t_it),
            })
            if checkpoint_every and ckpt_dir and it % checkpoint_every == 0:
                self.checkpoint(ckpt_dir, it, ["rank"],
                                extra={"delta": delta, "algo": "pagerank"})
        secs = time.time() - t0
        return {"iterations": it, "delta": delta, "secs": secs,
                "edges_per_sec": n_edges * max(1, it - start_iter) / max(1e-9, secs)}

    def pagerank_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.pagerank_result.remote() for a in self.actors]))

    # ------------------------------------------------------------- HITS

    def hits(self, max_iter: int = 12) -> dict:
        """Kleinberg HITS (L1-normalized per half-step) on the directed
        CSR.  Fixed iteration count so the recursive-CTE SQL oracle
        replays the identical trajectory (see queries/graphs._HITS_SQL).
        Per iteration: one dst-grouped message exchange (auth), one
        ghost-serve wave (hub), two driver-reduced scalars (the L1
        normalizers)."""
        ray.get([a.hits_init.remote() for a in self.actors])
        n_edges = sum(s["n_edges"] for s in self.stats)
        t0 = time.time()
        for it in range(max_iter):
            if self.has_frags:
                vals = self._fetch_frag("hub")
                outs = [a.hits_auth_partials.options(num_returns=self.P)
                        .remote(vals[i]) for i, a in enumerate(self.actors)]
            else:
                outs = [a.hits_auth_partials.options(num_returns=self.P)
                        .remote() for a in self.actors]
            sums = ray.get([
                a.hits_auth_apply.remote([outs[i][j] for i in range(self.P)])
                for j, a in enumerate(self.actors)])
            ray.get([a.hits_scale.remote("auth", float(sum(sums)))
                     for a in self.actors])
            gvals = self._fetch_ghost("auth")
            hsums = ray.get([a.hits_hub_update.remote(gvals[i])
                             for i, a in enumerate(self.actors)])
            ray.get([a.hits_scale.remote("hub", float(sum(hsums)))
                     for a in self.actors])
        secs = time.time() - t0
        self.metrics.append({
            "job": self.name, "algo": "hits", "superstep": max_iter,
            "secs": secs,
            "edges_per_sec": 2 * n_edges * max_iter / max(1e-9, secs)})
        return {"iterations": max_iter, "secs": secs}

    def hits_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.hits_result.remote() for a in self.actors]))

    # ----------------------------------------------------------- k-core

    def kcore(self, k: int, max_iter: int = 50) -> dict:
        """k-core membership by iterative peeling on the symmetric CSR.
        Stops at fixpoint (further rounds are identity, so an early stop
        is value-identical to running all ``max_iter`` rounds — the SQL
        oracle always runs the full count)."""
        alive0 = ray.get([a.kcore_init.remote(k) for a in self.actors])
        t0 = time.time()
        rounds = 0
        for _ in range(max_iter):
            gvals = self._fetch_ghost("kcore_alive")
            dropped = ray.get([a.kcore_round.remote(gvals[i])
                               for i, a in enumerate(self.actors)])
            rounds += 1
            if sum(dropped) == 0:
                break
        secs = time.time() - t0
        self.metrics.append({
            "job": self.name, "algo": "kcore", "superstep": rounds,
            "k": k, "secs": secs, "n_init": int(sum(alive0))})
        return {"rounds": rounds, "secs": secs}

    def kcore_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.kcore_result.remote() for a in self.actors]))

    # ------------------------------------------------- degree assortativity

    def assortativity_stats(self) -> tuple[int, int, int, int]:
        """Global integer sufficient statistics (m, Σdeg_u, Σdeg_u²,
        Σdeg_u·deg_v) over the directed view of the non-self sym edge
        list; Pearson r = (m·S_prod − S_deg²) / (m·S_degsq − S_deg²)
        is derivable driver-side from these four scalars."""
        ray.get([a.tri_publish_degree.remote() for a in self.actors])
        deg_vals = self._fetch_ghost("deg")
        parts = ray.get([a.assort_local.remote(deg_vals[i])
                         for i, a in enumerate(self.actors)])
        return tuple(int(sum(p[j] for p in parts)) for j in range(4))

    # ---------------------------------------------------- BFS seed distance

    def bfs(self, seed_mod: int, max_iter: int = 64) -> dict:
        """Multi-source BFS hop distance from {v : v % seed_mod == 0} on
        the symmetric CSR.  Early-stops at the fixpoint (min-relaxation
        is monotone + idempotent, so <=max_iter engine rounds ==
        exactly-max_iter oracle rounds); distances that would exceed
        max_iter stay unreachable on both sides."""
        n_seed = ray.get([a.bfs_init.remote(seed_mod)
                          for a in self.actors])
        t0 = time.time()
        rounds = 0
        for _ in range(max_iter):
            gvals = self._fetch_ghost("bfs_dist")
            changed = ray.get([a.bfs_round.remote(gvals[i])
                               for i, a in enumerate(self.actors)])
            rounds += 1
            if sum(changed) == 0:
                break
        secs = time.time() - t0
        self.metrics.append({
            "job": self.name, "algo": "bfs", "superstep": rounds,
            "seed_mod": seed_mod, "secs": secs,
            "n_seeds": int(sum(n_seed))})
        return {"rounds": rounds, "secs": secs}

    def bfs_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.bfs_result.remote() for a in self.actors]))

    # ------------------------------------------------- connected components

    # supersteps per driver barrier for the convergence-checked algorithms
    # (min-propagation / argmax-label updates are idempotent at the fixed
    # point, so overshooting a converged state by <block supersteps is a
    # no-op; the barrier count drops block-fold)
    SUPERSTEP_BLOCK = 4

    def connected_components(self, max_iter: int = 10_000) -> dict:
        ray.get([a.cc_init.remote() for a in self.actors])
        it = 0
        while it < max_iter:
            block_refs = []
            n_b = min(self.SUPERSTEP_BLOCK, max_iter - it)
            for _ in range(n_b):
                if self.has_frags:
                    vals = self._fetch_frag("comp")
                    outs = [a.cc_partials.options(num_returns=self.P)
                            .remote(vals[i])
                            for i, a in enumerate(self.actors)]
                else:
                    outs = [a.cc_partials.options(num_returns=self.P)
                            .remote() for a in self.actors]
                block_refs.append([
                    a.cc_apply.remote([outs[i][j] for i in range(self.P)])
                    for j, a in enumerate(self.actors)])
            flat = ray.get([r for refs in block_refs for r in refs])
            per_iter = [sum(flat[k * self.P:(k + 1) * self.P])
                        for k in range(n_b)]
            done = [k for k, c in enumerate(per_iter) if c == 0]
            if done:
                it += done[0] + 1
                break
            it += n_b
        return {"iterations": it}

    def cc_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.cc_result.remote() for a in self.actors]))

    # ------------------------------------------------------ label propagation

    def label_propagation(self, max_iter: int = 20) -> dict:
        ray.get([a.lpa_init.remote() for a in self.actors])
        it = 0
        while it < max_iter:
            block_refs = []
            n_b = min(self.SUPERSTEP_BLOCK, max_iter - it)
            for _ in range(n_b):
                if self.has_frags:
                    vals = self._fetch_frag("lpa")
                    outs = [a.lpa_partials.options(num_returns=self.P)
                            .remote(vals[i])
                            for i, a in enumerate(self.actors)]
                else:
                    outs = [a.lpa_partials.options(num_returns=self.P)
                            .remote() for a in self.actors]
                block_refs.append([
                    a.lpa_apply.remote([outs[i][j] for i in range(self.P)])
                    for j, a in enumerate(self.actors)])
            flat = ray.get([r for refs in block_refs for r in refs])
            per_iter = [sum(flat[k * self.P:(k + 1) * self.P])
                        for k in range(n_b)]
            done = [k for k, c in enumerate(per_iter) if c == 0]
            if done:
                it += done[0] + 1
                break
            it += n_b
        return {"iterations": it}

    def lpa_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.lpa_result.remote() for a in self.actors]))

    # ------------------------------------------------------------- triangles

    def triangles(self) -> int:
        # memoized per graph version: the oriented sub-CSR and count are
        # pure functions of the edge set (VERDICT r2 item 7)
        ver = getattr(self, "_graph_version", 0)
        cached = getattr(self, "_tri_count_cache", None)
        if cached is not None and cached[0] == ver:
            return cached[1]
        ray.get([a.tri_publish_degree.remote() for a in self.actors])
        deg_vals = self._fetch_ghost("deg")
        head_reqs = [a.tri_orient.options(num_returns=self.P).remote(deg_vals[i])
                     for i, a in enumerate(self.actors)]
        adj_outs = [self.actors[j].tri_serve_adjacency_many
                    .options(num_returns=self.P)
                    .remote([head_reqs[i][j] for i in range(self.P)])
                    for j in range(self.P)]
        adj = [[adj_outs[j][i] for j in range(self.P)]
               for i in range(self.P)]
        counts = ray.get([a.tri_count_local.remote(adj[i])
                          for i, a in enumerate(self.actors)])
        total = int(sum(counts))
        self._tri_count_cache = (ver, total)
        return total

    def edge_support(self) -> pa.Table:
        """Per-edge triangle support (edge embeddedness): (u, v, support)
        with u < v for every non-self undirected edge.  Same oriented
        wedge scan as triangles(); closed wedges scatter onto all three
        edges, with the remote (v, w) contributions exchanged once.
        Shard-resident supports are memoized per graph version (pure
        function of the edge set) so node_triangles / repeat calls skip
        the wedge scan."""
        ver = getattr(self, "_graph_version", 0)
        if getattr(self, "_sup_version", None) == ver:
            return pa.concat_tables(
                ray.get([a.tri_support_result.remote()
                         for a in self.actors]))
        ray.get([a.tri_publish_degree.remote() for a in self.actors])
        deg_vals = self._fetch_ghost("deg")
        head_reqs = [a.tri_orient.options(num_returns=self.P)
                     .remote(deg_vals[i])
                     for i, a in enumerate(self.actors)]
        if self.P == 1:
            head_reqs = [[r] for r in head_reqs]
        adj_outs = [self.actors[j].tri_serve_adjacency_many
                    .options(num_returns=self.P)
                    .remote([head_reqs[i][j] for i in range(self.P)])
                    for j in range(self.P)]
        if self.P == 1:
            adj_outs = [[o] for o in adj_outs]
        adj = [[adj_outs[j][i] for j in range(self.P)]
               for i in range(self.P)]
        msgs = [a.tri_support_local.options(num_returns=self.P)
                .remote(adj[i]) for i, a in enumerate(self.actors)]
        if self.P == 1:
            msgs = [[m] for m in msgs]
        ray.get([a.tri_support_apply.remote(
            [msgs[i][j] for i in range(self.P)])
            for j, a in enumerate(self.actors)])
        self._sup_version = ver
        return pa.concat_tables(
            ray.get([a.tri_support_result.remote() for a in self.actors]))

    def ktruss(self, k: int, max_iter: int = 6) -> dict:
        """k-truss edge peeling on the symmetric CSR: per round,
        recompute per-edge supports over the alive subset (the
        edge_support wedge scan, alive-masked on both the scanning and
        the serving side) and drop edges with support < k-2.  The peel
        is monotone, so a fixpoint early-stop matches the oracle's
        fixed-round unrolled SQL exactly; both sides cap at the same
        max_iter (mid-peel membership after N identical rounds is
        identical too)."""
        ray.get([a.tri_publish_degree.remote() for a in self.actors])
        deg_vals = self._fetch_ghost("deg")
        head_reqs = [a.tri_orient.options(num_returns=self.P)
                     .remote(deg_vals[i])
                     for i, a in enumerate(self.actors)]
        if self.P == 1:
            head_reqs = [[r] for r in head_reqs]
        n0 = sum(ray.get([a.truss_init.remote() for a in self.actors]))
        t0 = time.time()
        rounds = 0
        for _ in range(max_iter):
            adj_outs = [self.actors[j].truss_serve_adjacency_many
                        .options(num_returns=self.P)
                        .remote([head_reqs[i][j] for i in range(self.P)])
                        for j in range(self.P)]
            if self.P == 1:
                adj_outs = [[o] for o in adj_outs]
            adj = [[adj_outs[j][i] for j in range(self.P)]
                   for i in range(self.P)]
            msgs = [a.truss_support_local.options(num_returns=self.P)
                    .remote(adj[i]) for i, a in enumerate(self.actors)]
            if self.P == 1:
                msgs = [[m] for m in msgs]
            ray.get([a.truss_apply.remote(
                [msgs[i][j] for i in range(self.P)])
                for j, a in enumerate(self.actors)])
            dropped = ray.get([a.truss_peel.remote(k)
                               for a in self.actors])
            rounds += 1
            if sum(dropped) == 0:
                break
        secs = time.time() - t0
        self.metrics.append({
            "job": self.name, "algo": "ktruss", "superstep": rounds,
            "k": k, "secs": secs, "n_edges0": int(n0)})
        return {"rounds": rounds, "secs": secs}

    def ktruss_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.truss_result.remote() for a in self.actors]))

    def node_triangles(self) -> pa.Table:
        """Per-node triangle participation + simple degree
        (node, tri, deg) — the local-clustering-coefficient inputs.
        tri(x) = (sum of supports of edges incident to x) / 2: each
        triangle through x adds +1 support to both of its x-incident
        edges.  Reuses the shard-resident per-edge supports from
        edge_support(); one extra aggregated (v, count) owner
        exchange."""
        ver = getattr(self, "_graph_version", 0)
        if getattr(self, "_sup_version", None) != ver:
            self.edge_support()
        msgs = [a.tri_node_local.options(num_returns=self.P).remote()
                for a in self.actors]
        if self.P == 1:
            msgs = [[m] for m in msgs]
        ray.get([a.tri_node_apply.remote(
            [msgs[i][j] for i in range(self.P)])
            for j, a in enumerate(self.actors)])
        return pa.concat_tables(
            ray.get([a.tri_node_result.remote() for a in self.actors]))

    # --------------------------------------------------------------- Louvain

    def _rebuild_comm_aggs(self):
        outs = [a.lv_agg_partials.options(num_returns=self.P).remote()
                for a in self.actors]
        ray.get([a.lv_agg_apply.remote([outs[i][j] for i in range(self.P)])
                 for j, a in enumerate(self.actors)])

    def _modularity(self) -> float:
        self._store_ghost_labels()
        terms = ray.get([a.lv_q_terms.remote() for a in self.actors])
        to_own = sum(t[0] for t in terms)
        tot_sq = sum(t[1] for t in terms)
        if self.M == 0:
            return 0.0
        return to_own / (2 * self.M) - tot_sq / (4 * self.M * self.M)

    def _ensure_scratch(self, bytes_per_edge: "int | None" = None):
        """Top the actors' prefaulted scratch up to the Louvain budget
        (WARMUP_BYTES_PER_EDGE) before round 0.  Build-time warmup only
        covers the message-path BASE budget, so engines that never run
        Louvain (the PageRank stress job) never populate the difference;
        the shard-side call is a no-op when already covered."""
        from .partition import GraphShard
        bpe = bytes_per_edge or GraphShard.WARMUP_BYTES_PER_EDGE
        if getattr(self, "_scratch_bpe", 0) >= bpe:
            return
        ray.get([a.warmup_scratch.remote(bpe) for a in self.actors])
        self._scratch_bpe = bpe

    def _sweep_buckets(self, active_buckets, use_subset: bool) -> list:
        """ONE optimisation round: sweep the active degree buckets in
        order, pipelined as a single chain of actor calls (ghost-label
        sync between buckets resolves through ObjectRefs inside the
        actors — no driver barrier until the caller ray.gets the
        returned apply refs).  The first bucket's ghost cache must be
        fresh (callers refresh it via _modularity / _store_ghost_labels
        before the sweep).

        Per-bucket critical path is FOUR fused actor tasks —
        [cache-sync; phase1], comm-serve, phase2, [apply; serve-changed]
        — instead of the former six: the standalone serve/apply ghost
        waves are folded into their neighbours (lv_moves_phase1
        ``sync_vals`` / lv_apply_serve), identical state transitions in
        the same per-actor order, one-third fewer sequential task
        dequeues per bucket (the fixed per-wave latency that dominated
        the dynamic-timestep A/B pairing, VERDICT r4 item 3)."""
        apply_refs = []
        sync = None   # sync[j][i]: server j's changed-label chunk for i
        last = len(active_buckets) - 1
        for k, bucket in enumerate(active_buckets):
            if self.has_frags:
                frag_outs = [a.lv_frag_partials
                             .options(num_returns=self.P)
                             .remote(bucket) for a in self.actors]
                if self.P == 1:
                    frag_outs = [[o] for o in frag_outs]
                reqs = [a.lv_moves_phase1.options(num_returns=self.P)
                        .remote(bucket, use_subset,
                                [frag_outs[j][i] for j in range(self.P)],
                                [sync[j][i] for j in range(self.P)]
                                if sync is not None else None)
                        for i, a in enumerate(self.actors)]
            else:
                reqs = [a.lv_moves_phase1.options(num_returns=self.P)
                        .remote(bucket, use_subset, None,
                                [sync[j][i] for j in range(self.P)]
                                if sync is not None else None)
                        for i, a in enumerate(self.actors)]
            comm_vals = self._exchange_comm_aggs(reqs)
            deltas = [a.lv_moves_phase2.options(num_returns=self.P)
                      .remote(comm_vals[i])
                      for i, a in enumerate(self.actors)]
            if k == last:
                apply_refs.extend(
                    a.lv_apply_comm_deltas.remote(
                        [deltas[i][j] for i in range(self.P)])
                    for j, a in enumerate(self.actors))
            else:
                outs = [a.lv_apply_serve.options(num_returns=self.P + 1)
                        .remote([deltas[i][j] for i in range(self.P)])
                        for j, a in enumerate(self.actors)]
                apply_refs.extend(o[self.P] for o in outs)
                sync = outs
        return apply_refs

    def louvain_round1(self) -> pa.Table:
        """ONE synchronous bucketed move round from the singleton
        partition, always on the distributed kernel (never the
        driver-oracle fast path) — the driver-verifiable slice of the
        Louvain move semantics (computeMove/computeGain,
        modularity_optimisation_mem.cu:99-205, bucket loop :365-420).
        Returns the raw (node, comm) labels after the round; community
        ids stay in the original node-id space so a SQL oracle can
        reproduce them exactly."""
        ray.get([a.lv_init_labels.remote() for a in self.actors])
        self._invalidate_label_cache()
        self._rebuild_comm_aggs()
        self._ensure_scratch()
        self._store_ghost_labels()  # fresh ghost cache for bucket 0
        counts = np.sum(ray.get([a.lv_bucket_counts.remote(False)
                                 for a in self.actors]), axis=0)
        active_buckets = [b for b in range(N_BUCKETS) if counts[b] > 0]
        if self.has_frags:
            ray.get([a.lv_frag_install_subset.remote(None)
                     for a in self.actors])
        ray.get(self._sweep_buckets(active_buckets, False))
        return self.louvain_result()

    def louvain_round_restricted(self) -> pa.Table:
        """ONE synchronous bucketed move round restricted to the
        installed screened set R (L3, the restricted first level —
        optimiseModularityUsingVertexSubset,
        modularity_optimisation_mem.cu:439-592), against the currently
        installed labels: non-R labels stay frozen while aggregates
        cover the whole graph.  Returns the raw (node, comm) labels."""
        self._rebuild_comm_aggs()
        self._ensure_scratch()
        self._store_ghost_labels()
        counts = np.sum(ray.get([a.lv_bucket_counts.remote(True)
                                 for a in self.actors]), axis=0)
        active_buckets = [b for b in range(N_BUCKETS) if counts[b] > 0]
        if self.has_frags:
            r_vals = self._fetch_frag("R")
            ray.get([a.lv_frag_install_subset.remote(r_vals[i])
                     for i, a in enumerate(self.actors)])
        ray.get(self._sweep_buckets(active_buckets, True))
        return self.louvain_result()

    def contract_edges(self) -> tuple[list, int]:
        """L4 contraction from the CURRENTLY installed labels, as its own
        driver-verifiable surface (louvain.cpp:260-333,
        community_aggregation_mem.cu:376-633): per-shard (csrc, cdst, w)
        partials, dense renumber by ascending community label, exact
        fixed-width grouped-sum dedup — the same machinery the full
        ``louvain()`` runs between levels.  Returns (deduped contracted
        edge-table refs, n_sub); edge weights are grouped sums of
        integral multiplicities (order-free exact), so a SQL replay can
        hash-check the table (queries/graphs._contract_round1_sql)."""
        self._store_ghost_labels()
        KB = self.CONTRACT_BUCKETS
        part_refs = [a.lv_contract_partial.options(num_returns=KB)
                     .remote(KB) for a in self.actors]
        uniq_lbl = np.unique(np.concatenate(
            ray.get([a.lv_unique_labels.remote() for a in self.actors])))
        remap_arr = np.full(int(uniq_lbl.max(initial=0)) + 1, -1,
                            dtype=np.int64)
        remap_arr[uniq_lbl] = np.arange(len(uniq_lbl))
        n_sub = len(uniq_lbl)
        remap_ref = ray.put(remap_arr)
        outs = [_dedup_contract.options(num_returns=2).remote(
            remap_ref, n_sub, *[part_refs[i][k] for i in range(self.P)])
            for k in range(KB)]
        ray.get([o[1] for o in outs])   # surface dedup errors here
        return [o[0] for o in outs], n_sub

    def _one_level(self, min_gain: float, use_subset: bool) -> tuple[bool, float]:
        """Distributed level-0 one_level.  Returns (changed, final_q).

        A whole round (all active buckets) is submitted as ONE pipelined
        chain of actor calls with a single driver barrier at round end:
        each actor's task queue runs the four fused tasks
        [cache-sync; phase1], comm-serve, phase2, [apply; serve-changed]
        per bucket in submission order (see _sweep_buckets), and
        cross-actor dependencies resolve through ObjectRefs inside the
        actors.  At P partitions this cuts driver round-trips per round
        from ~2x#buckets to 1 — the barrier-latency term that dominated
        scaling once the per-bucket compute was vectorized down."""
        changed = False
        total_gain = min_gain
        _t0 = time.time()
        self._ensure_scratch()
        q_before = self._modularity()  # refreshes ghost labels (barrier)
        # skip globally-empty degree buckets (the common case at high
        # bucket ids)
        counts = np.sum(ray.get([a.lv_bucket_counts.remote(use_subset)
                                 for a in self.actors]), axis=0)
        self.metrics.append({"job": self.name, "algo": "louvain",
                             "kind": "phase", "name": "level_preamble",
                             "secs": time.time() - _t0})
        active_buckets = [b for b in range(N_BUCKETS) if counts[b] > 0]
        if self.has_frags:
            # Louvain hub split: fragment holders need the per-level R
            # membership of their hub srcs (static per level)
            if use_subset:
                r_vals = self._fetch_frag("R")
                ray.get([a.lv_frag_install_subset.remote(r_vals[i])
                         for i, a in enumerate(self.actors)])
            else:
                ray.get([a.lv_frag_install_subset.remote(None)
                         for a in self.actors])
        while total_gain >= min_gain:
            t_round = time.time()
            apply_refs = self._sweep_buckets(active_buckets, use_subset)
            moved_round = int(sum(ray.get(apply_refs)))
            q_after = self._modularity()  # syncs the last bucket's moves
            total_gain = q_after - q_before
            changed = changed or (total_gain > 0)
            self.metrics.append({
                "job": self.name, "algo": "louvain", "kind": "round",
                "moved": moved_round, "q": q_after,
                "gain": total_gain, "secs": time.time() - t_round,
            })
            q_before = q_after
        return changed, q_before

    def louvain(self, *, init: bool = False, use_subset: bool = False,
                min_gain: float = oracle_lv.DEFAULT_MIN_GAIN,
                hierarchy_dir: str | None = None, _level: int = 0) -> dict:
        """Full Louvain: distributed level 0, contracted levels on the
        driver with the oracle kernel (identical semantics — contracted
        graphs are orders of magnitude smaller; SURVEY.md §7.1 step 6).

        ``init``: labels already installed in actors (timestep path) —
        forces a second level (once_more, gpulouvain.cu:107-128).
        Otherwise initializes singleton labels.

        Final labels (dense ids in the final level's space) are composed
        back into each shard's ``labels`` state.
        """
        n_edges = sum(s["n_edges"] for s in self.stats)
        if (self.louvain_driver_threshold
                and n_edges <= self.louvain_driver_threshold
                and _level == 0):
            return self._louvain_driver(init=init, use_subset=use_subset,
                                        min_gain=min_gain,
                                        hierarchy_dir=hierarchy_dir)
        if not init:
            ray.get([a.lv_init_labels.remote() for a in self.actors])
            self._invalidate_label_cache()
        self._rebuild_comm_aggs()
        once_more = init
        changed, q0 = self._one_level(min_gain, use_subset)
        q_traj = [q0]
        if not changed and not once_more:
            # densify labels anyway for stable downstream ids
            final_map, n_comms = self._densify_labels()
            if hierarchy_dir is not None:
                lvl_dir = os.path.join(hierarchy_dir, f"level-{_level:03d}")
                ray.get([a.checkpoint.remote(lvl_dir, ["labels"])
                         for a in self.actors])
            return {"modularity": q0, "q_trajectory": q_traj, "n_levels": 0,
                    "n_comms": n_comms}
        # contract (A7): per-shard pre-aggregated (csrc,cdst,w) partials
        # are split by csrc into a FIXED number of hash buckets and
        # exactly deduped by one task per bucket.  The deduped edge count
        # — and therefore the driver-vs-distributed branch below — is
        # parallelism-invariant, and BOTH branches consume the same
        # deduped, densely-remapped edge tables.
        _t0 = time.time()
        self._store_ghost_labels()
        _t_g = time.time()
        KB = self.CONTRACT_BUCKETS
        part_refs = [a.lv_contract_partial.options(num_returns=KB)
                     .remote(KB) for a in self.actors]
        # include empty-degree communities (isolated vertices' labels);
        # per-shard uniques -> driver ships #comms ids, not #vertices
        uniq_lbl = np.unique(np.concatenate(
            ray.get([a.lv_unique_labels.remote() for a in self.actors])))
        _t_u = time.time()
        remap_arr = np.full(int(uniq_lbl.max(initial=0)) + 1, -1, dtype=np.int64)
        remap_arr[uniq_lbl] = np.arange(len(uniq_lbl))
        n_sub = len(uniq_lbl)
        remap_ref = ray.put(remap_arr)
        if hierarchy_dir is not None:
            # S6 hierarchy writer: per-level (node, dense comm) parquet,
            # one file per shard (the .tree analog, louvain.cpp:236-257)
            lvl_dir = os.path.join(hierarchy_dir, f"level-{_level:03d}")
            ray.get([a.checkpoint_mapped.remote(lvl_dir, remap_ref)
                     for a in self.actors])
        outs = [_dedup_contract.options(num_returns=2).remote(
            remap_ref, n_sub, *[part_refs[i][k] for i in range(self.P)])
            for k in range(KB)]
        tbl_refs = [o[0] for o in outs]
        n_contract = int(sum(ray.get([o[1] for o in outs])))
        self.metrics.append({"job": self.name, "algo": "louvain",
                             "kind": "phase", "name": "contract_partials",
                             "secs": time.time() - _t0,
                             "ghost_secs": round(_t_g - _t0, 3),
                             "uniq_secs": round(_t_u - _t_g, 3),
                             "dedup_secs": round(time.time() - _t_u, 3),
                             "n_contract": n_contract, "n_sub": n_sub})
        _t0 = time.time()
        if n_contract <= self.SMALL_CONTRACT_ROWS:
            # small contracted graph: remaining levels on the driver with
            # the oracle kernel (identical semantics).  once_more is
            # already consumed: reaching here means we contracted; the
            # oracle loop runs the next level's one_level unconditionally
            # and stops at the first no-change level — exactly the
            # reference's post-aggregation behavior (gpulouvain.cu:105-128).
            tbl = pa.concat_tables(ray.get(tbl_refs))
            cg = CSRGraph.from_edges(tbl.column("src").to_numpy(),
                                     tbl.column("dst").to_numpy(),
                                     tbl.column("w").to_numpy(), n=n_sub)
            sub_res = oracle_lv.louvain(cg, min_gain=min_gain)
            if hierarchy_dir is not None:
                for li, lmap in enumerate(sub_res["levels"]):
                    lvl_dir = os.path.join(
                        hierarchy_dir, f"level-{_level + 1 + li:03d}")
                    os.makedirs(lvl_dir, exist_ok=True)
                    pq_tbl = pa.table({
                        "node": np.arange(len(lmap), dtype=np.int64),
                        "labels": lmap.astype(np.int64)})
                    import pyarrow.parquet as _pq
                    _pq.write_table(pq_tbl, os.path.join(
                        lvl_dir, "part-00000.parquet"))
        else:
            # large contracted graph: recurse DISTRIBUTED into a child
            # engine fed straight from the deduped bucket tables.  The
            # child's partition count tracks the contracted edge mass so
            # dense contracted levels (the round-2 driver-solve residue:
            # 15-43s single-threaded at any P) parallelize with P.
            import ray.data as rd
            cds = rd.from_arrow_refs(tbl_refs)
            child = GraphEngine.from_dataset(
                cds, n_nodes=n_sub,
                n_parts=max(2, min(self.P,
                                   max(n_sub // 1000,
                                       n_contract
                                       // self.CHILD_EDGES_PER_PART))),
                name=f"{self.name}_l")
            try:
                sub = child.louvain(min_gain=min_gain,
                                    hierarchy_dir=hierarchy_dir,
                                    _level=_level + 1)
                child_labels = (child.louvain_result()
                                .column("comm").to_numpy())
            finally:
                child.shutdown()
            sub_res = {"labels": child_labels,
                       "modularity": sub["modularity"],
                       "q_trajectory": sub["q_trajectory"],
                       "n_levels": sub["n_levels"]}
        self.metrics.append({"job": self.name, "algo": "louvain",
                             "kind": "phase", "name": "sub_levels",
                             "secs": time.time() - _t0})
        _t0 = time.time()
        q_traj.extend(sub_res["q_trajectory"])
        # compose: label c (level-0 comm id) -> sub_res.labels[remap[c]]
        compose = np.full(len(remap_arr), -1, dtype=np.int64)
        compose[uniq_lbl] = sub_res["labels"][remap_arr[uniq_lbl]]
        map_ref = ray.put(compose)
        ray.get([a.lv_compose_labels.remote(map_ref) for a in self.actors])
        self._invalidate_label_cache()
        self._rebuild_comm_aggs()
        self.metrics.append({"job": self.name, "algo": "louvain",
                             "kind": "phase", "name": "compose",
                             "secs": time.time() - _t0})
        q_final = sub_res["modularity"]
        return {"modularity": q_final, "q_trajectory": q_traj,
                "n_levels": 1 + sub_res["n_levels"],
                "n_comms": int(sub_res["labels"].max()) + 1}

    # -------------------------------------------- quality-variant Louvain

    def _rebuild_comm_aggs_q(self):
        """tot/size/w by labels + in[C] (needs fresh ghost labels)."""
        outs = [a.lv_agg_partials_q.options(num_returns=self.P).remote()
                for a in self.actors]
        ray.get([a.lv_agg_apply_q.remote([outs[i][j] for i in range(self.P)])
                 for j, a in enumerate(self.actors)])
        in_outs = [a.lv_in_partials.options(num_returns=self.P).remote()
                   for a in self.actors]
        ray.get([a.lv_in_apply.remote([in_outs[i][j] for i in range(self.P)])
                 for j, a in enumerate(self.actors)])

    def _q_value_q(self, qfn, n_w: float) -> float:
        """Distributed quality: per-owner comm_terms sums + driver
        finalize (one float + one int per shard cross the wire)."""
        self._store_ghost_labels()
        self._rebuild_comm_aggs_q()
        parts = ray.get([a.lv_q_terms_q.remote(n_w) for a in self.actors])
        s = sum(p[0] for p in parts)
        kappa = sum(p[1] for p in parts)
        return qfn.finalize(s, m2=2.0 * self.M, n=n_w,
                            max_w=qfn.fixed_max_w, kappa=kappa)

    def louvain_quality(self, q_id: int, *, alpha: float = 0.5,
                        kmin: int = 1,
                        min_gain: float = oracle_lv.DEFAULT_MIN_GAIN) -> dict:
        """Static Louvain under quality variant ``-q q_id`` (the
        reference's only extension surface, main_louvain.cpp:889-899 /
        998-1059): distributed level 0 with the generic gain kernel,
        contracted levels on the driver via the variant oracle
        (oracle/qlouvain.py defines the deterministic synchronous
        semantics both sides implement).

        Level-0 preprocessing runs IN THE SHARDS: q=4 -> E4 selfloops +
        E9 CondorA reweighting, q=7 -> E10 DP reweighting (ghost degree
        counts fetched once); max_w is captured before weighting and
        pinned across levels, as init_quality does at nbc==0.
        """
        from ..oracle import qlouvain as qlv
        n_edges = sum(s["n_edges"] for s in self.stats)
        if (self.louvain_driver_threshold
                and n_edges <= self.louvain_driver_threshold):
            # small-graph opt-in (see louvain_driver_threshold): gather
            # the shard rows and run the variant oracle directly — the
            # shards stay PRISTINE (preprocessing happens on the
            # driver-side copy), so cached engines can serve this.  The
            # gathered CSR is version-cached (shared with _louvain_driver)
            # so a variant sweep gathers once, not once per q_id.
            ver = getattr(self, "_graph_version", 0)
            cached = getattr(self, "_gathered_csr", None)
            if cached is not None and cached[0] == ver \
                    and cached[1].n == self.n:
                g = cached[1]
            else:
                tbl = pa.concat_tables(
                    ray.get([a.edge_arrays.remote() for a in self.actors]))
                g = CSRGraph.from_edges(tbl.column("src").to_numpy(),
                                        tbl.column("dst").to_numpy(),
                                        tbl.column("w").to_numpy(), n=self.n)
                self._gathered_csr = (ver, g)
            res = qlv.louvain_q(g, q_id, alpha=alpha, kmin=kmin,
                                min_gain=min_gain)
            final = res["labels"]
            ray.get([a.lv_init_labels.remote(
                final[self.bounds[p]:self.bounds[p + 1]])
                for p, a in enumerate(self.actors)])
            self._invalidate_label_cache()
            self._rebuild_comm_aggs()
            return {"quality": res["quality"],
                    "modularity": res["quality"],
                    "q_trajectory": res["q_trajectory"],
                    "n_levels": res["n_levels"],
                    "n_comms": int(final.max(initial=-1)) + 1}
        # q=4/7 mutate the shard CSR in place (selfloops + reweighting);
        # snapshot so a shared/cached engine comes back pristine — the
        # compounding-mutation bug a sequential qid sweep hit otherwise
        mutating = q_id in (4, 7)
        if mutating:
            ray.get([a.graph_push.remote() for a in self.actors])
        try:
            return self._louvain_quality_dist(q_id, alpha=alpha, kmin=kmin,
                                              min_gain=min_gain)
        finally:
            if mutating:
                ray.get([a.graph_pop.remote() for a in self.actors])
                self._after_graph_mutation()
                self._rebuild_comm_aggs()

    def _sweep_buckets_q(self, active, n_w: float) -> list:
        """ONE quality-variant optimisation round (the generic-gain
        analog of _sweep_buckets): per bucket, incremental ghost sync +
        tot/size/w + in[C] rebuilds + kappa partials + phase1 / comm
        serve / phase2, pipelined through the actor queues.  Callers
        refresh the ghost cache (e.g. _q_value_q) before the sweep."""
        move_refs = []
        for k, bucket in enumerate(active):
            if k > 0:
                # incremental ghost-label sync of the previous
                # bucket's moves, pipelined (no driver barrier)
                souts = [a.lv_serve_changed.options(num_returns=self.P)
                         .remote() for a in self.actors]
                for i, a in enumerate(self.actors):
                    a.lv_cache_apply.remote(
                        [souts[j][i] for j in range(self.P)])
            # rebuild tot/size/w from post-previous-bucket labels
            aggs = [a.lv_agg_partials_q.options(num_returns=self.P)
                    .remote() for a in self.actors]
            for j, a in enumerate(self.actors):
                a.lv_agg_apply_q.remote(
                    [aggs[i][j] for i in range(self.P)])
            # in[C] rebuild (reads the just-synced label cache)
            ins = [a.lv_in_partials.options(num_returns=self.P)
                   .remote() for a in self.actors]
            for j, a in enumerate(self.actors):
                a.lv_in_apply.remote(
                    [ins[i][j] for i in range(self.P)])
            # kappa partial refs are summed INSIDE phase2 (resolved
            # actor-side; they queue after lv_agg_apply_q per actor)
            kappa_refs = [a.lv_kappa_partial.remote()
                          for a in self.actors]
            reqs = [a.lv_moves_phase1.options(num_returns=self.P)
                    .remote(bucket, False)
                    for a in self.actors]
            outs = [self.actors[j].lv_serve_comm_q_many
                    .options(num_returns=self.P)
                    .remote([reqs[i][j] for i in range(self.P)])
                    for j in range(self.P)]
            comm_vals = [[outs[j][i] for j in range(self.P)]
                         for i in range(self.P)]
            move_refs.extend(
                a.lv_moves_phase2_q.remote(comm_vals[i], n_w,
                                           kappa_refs)
                for i, a in enumerate(self.actors))
        return move_refs

    def louvain_quality_round1(self, q_id: int, *, alpha: float = 0.5,
                               kmin: int = 1) -> pa.Table:
        """ONE synchronous bucketed move round of the quality-variant
        kernel from the singleton partition (non-mutating variants only
        — q=4/7 reweight the CSR in place and need the full
        louvain_quality path).  The driver-verifiable slice of the
        generic-gain move machinery (quality.h:56-84 formulas with the
        deterministic synchronous semantics of oracle/qlouvain.py);
        labels stay in the original node-id space for SQL parity."""
        assert q_id not in (4, 7), "mutating variants have no round-1 gate"
        from ..oracle import qlouvain as qlv
        self._ensure_scratch()
        max_w = max(ray.get([a.lv_max_weight_local.remote()
                             for a in self.actors]))
        ray.get([a.lv_set_quality.remote(q_id, alpha, kmin, 0.0, 0.0,
                                         max_w) for a in self.actors])
        qfn = qlv.make_quality(q_id, alpha=alpha, kmin=kmin)
        qfn.fixed_max_w = max_w
        n_w = float(self.n)
        ray.get([a.lv_init_labels.remote() for a in self.actors])
        self._invalidate_label_cache()
        counts = np.sum(ray.get([a.lv_bucket_counts.remote(False)
                                 for a in self.actors]), axis=0)
        active = [b for b in range(N_BUCKETS) if counts[b] > 0]
        # fresh ghost cache + q-aggregate state for bucket 0 (the same
        # preamble _q_value_q performs before the full level-0 loop)
        self._store_ghost_labels()
        self._rebuild_comm_aggs_q()
        ray.get(self._sweep_buckets_q(active, n_w))
        return self.louvain_result()

    def _louvain_quality_dist(self, q_id: int, *, alpha: float, kmin: int,
                              min_gain: float) -> dict:
        """Distributed quality-variant Louvain body (see louvain_quality).

        Level-0 rounds are PIPELINED like _one_level: one whole round
        (incremental ghost sync + tot/size/w + in[C] rebuilds + kappa +
        phase1/serve/phase2 per bucket) is submitted as one chain of
        actor calls whose cross-actor dependencies resolve through
        ObjectRefs; the only driver barrier per round is the round-end
        quality evaluation.  Semantics identical to the unpipelined loop
        (aggregates are still rebuilt from post-previous-bucket labels —
        actor queue order guarantees it)."""
        from ..oracle import qlouvain as qlv
        self._ensure_scratch()
        # -- preprocessing (nbc == 0) ------------------------------------
        max_w = max(ray.get([a.lv_max_weight_local.remote()
                             for a in self.actors]))
        sum_se = sum_sq = 0.0
        if q_id == 4:
            ray.get([a.lv_add_selfloops_local.remote()
                     for a in self.actors])
            self._after_graph_mutation()
            ray.get([a.lv_publish_degcnt_selfw.remote()
                     for a in self.actors])
            deg_vals = self._fetch_ghost("degcnt")
            selfw_vals = self._fetch_ghost("selfw")
            sum_se = sum(ray.get([
                a.lv_reweight_local.remote("condora", deg_vals[i],
                                           selfw_vals[i])
                for i, a in enumerate(self.actors)]))
            self._after_weights_changed()
        elif q_id == 7:
            ray.get([a.lv_publish_degcnt_selfw.remote()
                     for a in self.actors])
            deg_vals = self._fetch_ghost("degcnt")
            sum_sq = sum(ray.get([
                a.lv_reweight_local.remote("dp", deg_vals[i])
                for i, a in enumerate(self.actors)]))
            self._after_weights_changed()
        ray.get([a.lv_set_quality.remote(q_id, alpha, kmin, sum_se,
                                         sum_sq, max_w)
                 for a in self.actors])
        qfn = qlv.make_quality(q_id, alpha=alpha, kmin=kmin,
                               sum_se=sum_se, sum_sq=sum_sq)
        qfn.fixed_max_w = max_w
        n_w = float(self.n)          # node weights all 1 at level 0
        ray.get([a.lv_init_labels.remote() for a in self.actors])
        self._invalidate_label_cache()
        # -- level-0 synchronous bucketed rounds -------------------------
        counts = np.sum(ray.get([a.lv_bucket_counts.remote(False)
                                 for a in self.actors]), axis=0)
        active = [b for b in range(N_BUCKETS) if counts[b] > 0]
        changed = False
        total_gain = min_gain
        q_before = self._q_value_q(qfn, n_w)  # full ghost sync (barrier)
        while total_gain >= min_gain:
            ray.get(self._sweep_buckets_q(active, n_w))
            q_after = self._q_value_q(qfn, n_w)  # syncs last bucket
            total_gain = q_after - q_before
            changed = changed or (total_gain > 0)
            q_before = q_after
        q_traj = [q_before]
        if not changed:
            final_map, n_comms = self._densify_labels()
            return {"quality": q_before, "modularity": q_before,
                    "q_trajectory": q_traj, "n_levels": 0,
                    "n_comms": n_comms}
        # -- contraction + driver continuation (variant levels shrink
        #    orders of magnitude; the oracle kernel is the parity target)
        self._store_ghost_labels()
        part_refs = [a.lv_contract_partial.remote() for a in self.actors]
        uniq_lbl = np.unique(np.concatenate(
            ray.get([a.lv_unique_labels.remote() for a in self.actors])))
        remap_arr = np.full(int(uniq_lbl.max(initial=0)) + 1, -1,
                            dtype=np.int64)
        remap_arr[uniq_lbl] = np.arange(len(uniq_lbl))
        tbl = pa.concat_tables(ray.get(part_refs))
        csrc = remap_arr[tbl.column("csrc").to_numpy()]
        cdst = remap_arr[tbl.column("cdst").to_numpy()]
        w = tbl.column("w").to_numpy()
        key = csrc * np.int64(len(uniq_lbl)) + cdst
        order = np.argsort(key, kind="stable")
        key_s, w_s = key[order], w[order]
        uk, start = np.unique(key_s, return_index=True)
        sums = np.add.reduceat(w_s, start) if len(start) else np.empty(0)
        cg = CSRGraph.from_edges(uk // len(uniq_lbl), uk % len(uniq_lbl),
                                 sums, n=len(uniq_lbl))
        nw_parts = ray.get([a.lv_label_nw_sums.remote()
                            for a in self.actors])
        nodes_w_c = np.zeros(len(uniq_lbl))
        for ids, s in nw_parts:
            if len(ids):
                np.add.at(nodes_w_c, remap_arr[ids], s)
        sub = qlv.louvain_q_prepared(cg, qfn, nodes_w=nodes_w_c,
                                     min_gain=min_gain)
        q_traj.extend(sub["q_trajectory"])
        compose = np.full(len(remap_arr), -1, dtype=np.int64)
        compose[uniq_lbl] = sub["labels"][remap_arr[uniq_lbl]]
        ray.get([a.lv_compose_labels.remote(ray.put(compose))
                 for a in self.actors])
        self._invalidate_label_cache()
        self._rebuild_comm_aggs()
        return {"quality": sub["quality"], "modularity": sub["quality"],
                "q_trajectory": q_traj,
                "n_levels": 1 + sub["n_levels"],
                "n_comms": int(sub["labels"].max(initial=-1)) + 1}

    def _after_graph_mutation(self):
        """Refresh stats/M/ghost machinery after an in-shard CSR rebuild
        (selfloop insertion).  Drops the hub split: shard-side fragment
        copies no longer match the mutated CSR."""
        self.has_frags = False
        # edge counts may have grown: let the next Louvain re-issue the
        # scratch wave (shard-side check is bytes-based and no-ops when
        # the warmed budget still covers the new size)
        self._scratch_bpe = 0
        stats = ray.get([a.local_stats.remote() for a in self.actors])
        self.stats = stats
        self.M = sum(s["k_sum"] for s in stats) / 2.0
        ray.get([a.set_global.remote(M=self.M) for a in self.actors])
        self._refresh_ghost_requests()

    def _after_weights_changed(self):
        """Refresh M after a weights-only transform (indices unchanged:
        ghost sets stay valid; hub-fragment weight copies do not)."""
        self.has_frags = False
        stats = ray.get([a.local_stats.remote() for a in self.actors])
        self.stats = stats
        self.M = sum(s["k_sum"] for s in stats) / 2.0
        ray.get([a.set_global.remote(M=self.M) for a in self.actors])

    def _louvain_driver(self, *, init: bool, use_subset: bool,
                        min_gain: float,
                        hierarchy_dir: str | None) -> dict:
        """Small-graph Louvain: gather the shard CSR rows (they ARE the
        whole graph) and run the oracle kernel on the driver — identical
        semantics/results, none of the per-bucket exchange waves.  Used
        when edges <= ``louvain_driver_threshold`` (broadcast-small-side
        reasoning; see class attribute docstring)."""
        t0 = time.time()
        ver = getattr(self, "_graph_version", 0)
        cached = getattr(self, "_gathered_csr", None)
        if cached is not None and cached[0] == ver and cached[1].n == self.n:
            g = cached[1]
        else:
            tbl = pa.concat_tables(
                ray.get([a.edge_arrays.remote() for a in self.actors]))
            g = CSRGraph.from_edges(tbl.column("src").to_numpy(),
                                    tbl.column("dst").to_numpy(),
                                    tbl.column("w").to_numpy(), n=self.n)
            self._gathered_csr = (ver, g)
        init_labels = None
        if init:
            init_labels = np.concatenate(
                ray.get([a.get_state.remote("labels") for a in self.actors]))
        subset = None
        if use_subset:
            subset = np.concatenate(
                ray.get([a.get_state.remote("R")
                         for a in self.actors])).astype(bool)
        res = oracle_lv.louvain(g, init_labels=init_labels, subset=subset,
                                min_gain=min_gain)
        final = res["labels"]
        if hierarchy_dir is not None:
            import pyarrow.parquet as _pq
            if res["n_levels"] == 0:
                lvl_dir = os.path.join(hierarchy_dir, "level-000")
                os.makedirs(lvl_dir, exist_ok=True)
                _pq.write_table(pa.table({
                    "node": np.arange(len(final), dtype=np.int64),
                    "labels": final.astype(np.int64)}),
                    os.path.join(lvl_dir, "part-00000.parquet"))
            for li, lmap in enumerate(res["levels"]):
                lvl_dir = os.path.join(hierarchy_dir, f"level-{li:03d}")
                os.makedirs(lvl_dir, exist_ok=True)
                _pq.write_table(pa.table({
                    "node": np.arange(len(lmap), dtype=np.int64),
                    "labels": lmap.astype(np.int64)}),
                    os.path.join(lvl_dir, "part-00000.parquet"))
        ray.get([a.lv_init_labels.remote(final[self.bounds[p]:
                                               self.bounds[p + 1]])
                 for p, a in enumerate(self.actors)])
        self._invalidate_label_cache()
        self._rebuild_comm_aggs()
        self.metrics.append({
            "job": self.name, "algo": "louvain", "kind": "driver_small",
            "edges": int(len(g.indices)), "q": res["modularity"],
            "secs": time.time() - t0,
        })
        return {"modularity": res["modularity"],
                "q_trajectory": res["q_trajectory"],
                "n_levels": res["n_levels"],
                "n_comms": int(final.max(initial=-1)) + 1}

    def _densify_labels(self) -> tuple[np.ndarray, int]:
        uniq_lbl = np.unique(np.concatenate(
            ray.get([a.get_state.remote("labels") for a in self.actors])))
        remap_arr = np.full(int(uniq_lbl.max(initial=0)) + 1, -1, dtype=np.int64)
        remap_arr[uniq_lbl] = np.arange(len(uniq_lbl))
        map_ref = ray.put(remap_arr)
        ray.get([a.lv_compose_labels.remote(map_ref) for a in self.actors])
        self._invalidate_label_cache()
        self._rebuild_comm_aggs()
        return remap_arr, len(uniq_lbl)

    def push_labels(self):
        """Actor-side snapshot of the installed labels (see
        lv_labels_push).  Pair with :meth:`pop_labels`."""
        ray.get([a.lv_labels_push.remote() for a in self.actors])

    def pop_labels(self):
        restored = ray.get([a.lv_labels_pop.remote() for a in self.actors])
        if any(restored):
            self._invalidate_label_cache()
            self._rebuild_comm_aggs()

    def louvain_result(self) -> pa.Table:
        return pa.concat_tables(
            ray.get([a.lv_labels_result.remote() for a in self.actors]))

    def comm_sizes(self, *, canonical: bool = False) -> pa.Table:
        """S8 ``cluster{t}.txt`` analog: (comm, size), sorted by comm.
        Per-shard unique+count partials (one row per local community)
        merged driver-side — ships #comms rows, not #vertices.

        ``canonical``: renumber each community to its MIN member node id
        — invariant under label renumbering and parallelism, so the
        output is value-comparable across runs (VERDICT r2 item 5)."""
        if canonical:
            parts = ray.get([a.lv_label_min_counts.remote()
                             for a in self.actors])
            ids = np.concatenate([p[0] for p in parts])
            mins = np.concatenate([p[1] for p in parts])
            cnt = np.concatenate([p[2] for p in parts])
            order = np.argsort(ids, kind="stable")
            uk, start = np.unique(ids[order], return_index=True)
            sums = (np.add.reduceat(cnt[order], start) if len(start)
                    else np.empty(0, np.int64))
            gmin = (np.minimum.reduceat(mins[order], start) if len(start)
                    else np.empty(0, np.int64))
            o2 = np.argsort(gmin)
            return pa.table({"comm": gmin[o2],
                             "size": sums[o2].astype(np.int64)})
        parts = ray.get([a.lv_label_counts.remote() for a in self.actors])
        ids = np.concatenate([p[0] for p in parts])
        cnt = np.concatenate([p[1] for p in parts])
        order = np.argsort(ids, kind="stable")
        uk, start = np.unique(ids[order], return_index=True)
        sums = np.add.reduceat(cnt[order], start) if len(start) \
            else np.empty(0, np.int64)
        return pa.table({"comm": uk, "size": sums.astype(np.int64)})

    def comm_members(self):
        """S8 ``comm{t}.txt`` analog: labels as a Ray Dataset sorted by
        (comm, node) — a distributed sort, never a driver materialize."""
        import ray.data as rd
        refs = [a.lv_labels_result.remote() for a in self.actors]
        return rd.from_arrow_refs(refs).sort(["comm", "node"])

    # --------------------------------------------------- S12 debug printers

    def display(self, limit: int = 20, *, reverse: bool = False,
                file=None) -> int:
        """S12 ``display``/``display_reverse`` (graph_binary.cpp:186-215):
        print up to ``limit`` edges as per-node adjacency lines
        ``src: dst(w) ...`` in global (src,dst) order — or grouped by dst
        with ``reverse``.  Bounded by design: at most ``limit`` rows are
        fetched from EACH shard and merged driver-side; the full edge set
        never touches the driver.  Returns the number of edges printed."""
        parts = ray.get([a.edge_head.remote(limit, reverse)
                         for a in self.actors])
        tbl = pa.concat_tables(parts)
        s = tbl.column("src").to_numpy()
        d = tbl.column("dst").to_numpy()
        w = tbl.column("w").to_numpy()
        order = (np.lexsort((s, d)) if reverse else np.lexsort((d, s)))
        order = order[:limit]
        s, d, w = s[order], d[order], w[order]
        key, other = (d, s) if reverse else (s, d)
        starts = np.flatnonzero(np.diff(key, prepend=key[0] - 1 if len(key)
                                        else 0))
        ends = np.append(starts[1:], len(key))
        for a, b in zip(starts, ends):
            adj = " ".join(f"{other[i]}({w[i]:g})" for i in range(a, b))
            print(f"{key[a]}: {adj}", file=file)
        return len(s)

    def display_partition(self, limit: int = 20, file=None) -> int:
        """S12 ``partition2graph`` analog (louvain.cpp:205-231): print up
        to ``limit`` ``node community`` lines in node order.  Shards hold
        contiguous node ranges, so the head of the mapping is the head of
        shard 0's labels (plus later shards if limit spans them)."""
        printed = 0
        for a in self.actors:
            if printed >= limit:
                break
            tbl = ray.get(a.lv_labels_head.remote(limit - printed))
            node = tbl.column("node").to_numpy()
            comm = tbl.column("comm").to_numpy()
            for i in range(len(node)):
                print(f"{node[i]} {comm[i]}", file=file)
            printed += len(node)
        return printed

    # ------------------------------------------------------------ checkpoint

    def checkpoint(self, ckpt_dir: str, superstep: int, names: list[str],
                   extra: dict | None = None) -> dict:
        t0 = time.time()
        step_dir = os.path.join(ckpt_dir, self.name, f"step-{superstep:06d}")
        infos = ray.get([a.checkpoint.remote(step_dir, names)
                         for a in self.actors])
        manifest = {
            "job": self.name, "superstep": superstep, "names": names,
            "bounds": self.bounds.tolist(), "M": self.M,
            "partitions": infos, "extra": extra or {},
            "wall_secs": time.time() - t0,
        }
        with open(os.path.join(step_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(step_dir, "_SUCCESS"), "w") as f:
            f.write("")
        return manifest

    def latest_checkpoint(self, ckpt_dir: str) -> tuple[int, dict] | None:
        base = os.path.join(ckpt_dir, self.name)
        if not os.path.isdir(base):
            return None
        steps = sorted(d for d in os.listdir(base)
                       if d.startswith("step-")
                       and os.path.exists(os.path.join(base, d, "_SUCCESS")))
        if not steps:
            return None
        latest = steps[-1]
        with open(os.path.join(base, latest, "manifest.json")) as f:
            manifest = json.load(f)
        return manifest["superstep"], manifest

    def restore(self, ckpt_dir: str, superstep: int, names: list[str],
                dtypes=None) -> bool:
        step_dir = os.path.join(ckpt_dir, self.name, f"step-{superstep:06d}")
        oks = ray.get([a.restore.remote(step_dir, names, dtypes)
                       for a in self.actors])
        self._invalidate_label_cache()
        return all(oks)

    # ------------------------------------------------------- dynamic updates

    def apply_delta_batch(self, *, add_src=None, add_dst=None, add_w=None,
                          del_src=None, del_dst=None) -> int:
        """Apply one phase's batch (M1/M2): symmetric expansion, routed to
        owning shards; affected shards rebuild their CSR rows locally.
        Grows the node space (last partition) when additions introduce new
        ids.  Returns count_notexist for deletions."""
        new_bounds = None
        if add_src is not None and len(add_src):
            add_src = np.asarray(add_src, np.int64)
            add_dst = np.asarray(add_dst, np.int64)
            add_w = (np.ones(len(add_src)) if add_w is None
                     else np.asarray(add_w, np.float64))
            max_id = int(max(add_src.max(), add_dst.max()))
            if max_id >= self.n:
                self.n = max_id + 1
                self.bounds = self.bounds.copy()
                self.bounds[-1] = self.n
                new_bounds = self.bounds
            nonself = add_src != add_dst
            s = np.concatenate([add_src, add_dst[nonself]])
            d = np.concatenate([add_dst, add_src[nonself]])
            w = np.concatenate([add_w, add_w[nonself]])
            add_parts = split_by_owner(s, self.bounds, d, w)
        else:
            add_parts = [None] * self.P
        if del_src is not None and len(del_src):
            del_src = np.asarray(del_src, np.int64)
            del_dst = np.asarray(del_dst, np.int64)
            nonself = del_src != del_dst
            s = np.concatenate([del_src, del_dst[nonself]])
            d = np.concatenate([del_dst, del_src[nonself]])
            del_parts = split_by_owner(s, self.bounds, d)
        else:
            del_parts = [None] * self.P
        calls = []
        for p, a in enumerate(self.actors):
            ap = add_parts[p]
            add_tbl = (pa.table({"src": ap[0], "dst": ap[1], "w": ap[2]})
                       if ap is not None and len(ap[0]) else None)
            dp = del_parts[p]
            ds_, dd_ = (dp if dp is not None else (None, None))
            calls.append(a.apply_delta.remote(
                add_tbl, ds_, dd_,
                new_bounds.tolist() if new_bounds is not None else None))
        missing = sum(ray.get(calls))
        self._after_delta_apply()
        return missing

    def _after_delta_apply(self):
        """Shared postlude of every delta application: bump the graph
        version, drop the hub split (shards fall back to the unsplit
        message path; re-split via install_hubs if desired), refresh
        stats / M / ghost requests."""
        self._graph_version = getattr(self, "_graph_version", 0) + 1
        self.has_frags = False
        self._frag_reqs = None
        self._scratch_bpe = 0   # edges may have grown: re-check warmup
        stats = ray.get([a.local_stats.remote() for a in self.actors])
        self.stats = stats
        self.M = sum(s_["k_sum"] for s_ in stats) / 2.0
        ray.get([a.set_global.remote(M=self.M) for a in self.actors])
        self._refresh_ghost_requests()

    # ---- Dataset-native delta path (M1/M2 at scale) -----------------------
    #
    # The reference streams each timestep's delta file once
    # (main_louvain.cpp:143-322, 423-667); at 100 TB a single timestep's
    # batch can be billions of rows, so nothing O(#deltas) may touch the
    # driver.  The exchange is two fixed-width task waves over object
    # refs: stage 1 routes directed blocks by owner(src); stage 2 (one
    # task per owner) dedups (M5), symmetrizes and re-routes the reversed
    # copies by owner(dst).  Only per-block (max_id, count) scalars reach
    # the driver; the routed per-owner tables feed BOTH the shard CSR
    # rebuild and the delta screening (same refs, zero extra copies).

    @staticmethod
    def _delta_refs(ds) -> list | None:
        """Normalize a delta argument to a list of Arrow block refs:
        accepts a ray.data.Dataset, a list of ObjectRefs, or None."""
        if ds is None:
            return None
        if isinstance(ds, list):
            return ds if ds else None
        if isinstance(ds, ray.ObjectRef):
            return [ds]
        # ray.data.Dataset
        refs = ds.materialize().to_arrow_refs()
        return refs if refs else None

    def _route_delta_refs(self, refs: list, *, dedup: bool,
                          drop_self: bool):
        """Run the two-stage exchange.  Returns (per_owner, max_id,
        n_pairs): per_owner[p] = the P stage-2 table refs destined for
        shard p; n_pairs = global post-dedup directed pair count."""
        P = self.P
        outs = [_route_delta_block.options(num_returns=P + 1)
                .remote(r, self.bounds) for r in refs]
        stats = ray.get([o[P] for o in outs])
        max_id = max((st[0] for st in stats), default=-1)
        if sum(st[1] for st in stats) == 0:
            return None, max_id, 0
        stage2 = [_dedup_sym_route.options(num_returns=P + 1)
                  .remote(self.bounds, dedup, drop_self,
                          *[outs[b][k] for b in range(len(refs))])
                  for k in range(P)]
        per_owner = [[stage2[k][p] for k in range(P)] for p in range(P)]
        n_pairs = int(sum(ray.get([stage2[k][P] for k in range(P)])))
        return per_owner, max_id, n_pairs

    def _apply_routed(self, add_parts, del_parts,
                      max_id: int | None) -> int:
        """Ship routed per-owner delta tables to the shards.  ``max_id``
        (from the stage-1 scalars) grows the node space before the
        apply.  Returns count_notexist."""
        new_bounds = None
        if max_id is not None and max_id >= self.n:
            self.n = max_id + 1
            self.bounds = self.bounds.copy()
            self.bounds[-1] = self.n
            new_bounds = self.bounds
        calls = []
        for p, a in enumerate(self.actors):
            adds = add_parts[p] if add_parts is not None else []
            dels = del_parts[p] if del_parts is not None else []
            calls.append(a.apply_delta_parts.remote(
                new_bounds.tolist() if new_bounds is not None else None,
                len(adds), *adds, *dels))
        missing = sum(ray.get(calls))
        self._after_delta_apply()
        return missing

    def apply_delta_dataset(self, add_ds=None, del_ds=None, *,
                            dedup: bool = False,
                            drop_self: bool = False) -> int:
        """Dataset-native apply_delta_batch: ``add_ds`` / ``del_ds`` are
        ray.data.Datasets (or lists of Arrow block refs) with columns
        (src, dst[, w]), directed-as-written.  Same semantics as
        apply_delta_batch — symmetric expansion, owner routing, node
        growth, append-without-dedup (the M1 quirk) unless ``dedup``.
        Returns count_notexist for deletions."""
        add_refs = self._delta_refs(add_ds)
        del_refs = self._delta_refs(del_ds)
        add_parts = del_parts = None
        max_id = None
        if add_refs:
            add_parts, mx, n_add = self._route_delta_refs(
                add_refs, dedup=dedup, drop_self=drop_self)
            if n_add:
                max_id = mx
        if del_refs:
            del_parts, _, n_del = self._route_delta_refs(
                del_refs, dedup=dedup, drop_self=drop_self)
        if add_parts is None and del_parts is None:
            return 0
        P = self.P
        empty = [[] for _ in range(P)]
        return self._apply_routed(add_parts or empty, del_parts or empty,
                                  max_id)

    def _seed_new_nodes(self, n_old: int):
        """L12 seeding for nodes in [n_old, n) — they live in the last
        partition; fresh comm ids start at global max(label)+1."""
        maxes = ray.get([a.lv_max_label.remote(n_old) for a in self.actors])
        next_comm = max(maxes) + 1
        last = self.actors[-1]
        reqs = last.lv_seed_requests.options(num_returns=self.P).remote(n_old)
        vals = [self.actors[j].serve.remote("labels", reqs[j])
                for j in range(self.P)]
        ray.get(last.lv_seed_apply.remote(next_comm, vals))
        self._invalidate_label_cache()

    def _screen(self, mode: str, d_src: np.ndarray, d_dst: np.ndarray) -> int:
        """Distributed delta screening (L7/L8 with GPU semantics L10/L11).
        Installs the R mask into shard state; returns |R|."""
        nonself = d_src != d_dst
        s = np.concatenate([d_src, d_dst[nonself]])
        d = np.concatenate([d_dst, d_src[nonself]])
        parts = split_by_owner(s, self.bounds, d)
        self._store_ghost_labels()  # for the add-mode adjacency walk
        reqs = [a.screen_begin.options(num_returns=self.P)
                .remote(parts[i][0], parts[i][1], mode)
                for i, a in enumerate(self.actors)]
        return self._screen_finish(mode, reqs)

    def _screen_routed(self, mode: str, per_owner) -> int:
        """_screen over the already-routed per-owner delta tables (the
        stage-2 refs from _route_delta_refs) — the same symmetric deduped
        pair set, with zero extra exchanges."""
        self._store_ghost_labels()
        reqs = [a.screen_begin_parts.options(num_returns=self.P)
                .remote(mode, *per_owner[i])
                for i, a in enumerate(self.actors)]
        return self._screen_finish(mode, reqs)

    def _screen_finish(self, mode: str, reqs) -> int:
        lab_outs = [self.actors[j].serve_many.options(num_returns=self.P)
                    .remote("labels", [reqs[i][j] for i in range(self.P)])
                    for j in range(self.P)]
        lab_vals = [[lab_outs[j][i] for j in range(self.P)]
                    for i in range(self.P)]
        marks = ray.get([a.screen_mark.remote(lab_vals[i])
                         for i, a in enumerate(self.actors)])
        marked_comms = [m[0] for m in marks]
        if mode == "add":
            # second phase: serve tot/size for candidate comm requests
            comm_reqs = [m[2] for m in marks]
            comm_vals = self._exchange_comm_aggs(comm_reqs)
            marks2 = ray.get([a.screen_mark2.remote(comm_vals[i])
                              for i, a in enumerate(self.actors)])
            marked_comms = [m[0] for m in marks2]
        union = (np.unique(np.concatenate(marked_comms))
                 if any(len(m) for m in marked_comms)
                 else np.empty(0, np.int64))
        nbr_reqs = [a.screen_expand.options(num_returns=self.P).remote(union)
                    for a in self.actors]
        counts = ray.get([
            a.screen_apply_marks.remote([nbr_reqs[i][j] for i in range(self.P)])
            for j, a in enumerate(self.actors)])
        return int(sum(counts))

    def dynamic_step(self, ts: int, deltas: dict, *,
                     min_gain: float = oracle_lv.DEFAULT_MIN_GAIN,
                     ckpt_dir: str | None = None,
                     mode: str = "delta") -> list[dict]:
        """One timestep: deletion phase then addition phase (the reference
        driver order, main_louvain.cpp:1221/1458).  ``deltas`` =
        {"del": (src,dst,w), "add": (src,dst,w)} directed-as-written.
        Requires labels installed (prior louvain() or restore).  Returns
        per-phase records mirroring the oracle's dynamic_louvain.

        ``mode`` (L13, main_louvain_gpu.cpp:946-954):
        - "delta":  delta screening; restricted first level (default)
        - "full":   incremental init partition, but re-evaluate ALL
                    vertices (the GPU -f flag)
        - "static": fresh static Louvain per phase, no init partition
                    (the GPU -s flag)"""
        assert mode in ("delta", "full", "static")
        records = []
        for phase in ("del", "add"):
            delta = deltas.get(phase)
            routed = None
            if delta is None:
                continue
            if isinstance(delta, tuple) and len(delta) == 3 \
                    and not isinstance(delta[0], ray.ObjectRef):
                # legacy driver-array form: (src, dst, w) numpy arrays
                d_src, d_dst, d_w = (np.asarray(x) for x in delta)
                if len(d_src) == 0:
                    continue
                t0 = time.time()
                if phase == "del":
                    self.apply_delta_batch(del_src=d_src, del_dst=d_dst)
                else:
                    n_old = self.n
                    self.apply_delta_batch(add_src=d_src, add_dst=d_dst,
                                           add_w=d_w)
                    self._seed_new_nodes(n_old)
            else:
                # Dataset-native form: a Dataset / list of Arrow block
                # refs of directed (src, dst[, w]) rows.  The M5
                # preprocess (self-loop drop + per-batch dedup) runs
                # inside the routed exchange.
                t0 = time.time()
                refs = self._delta_refs(delta)
                if not refs:
                    continue
                per_owner, max_id, n_pairs = self._route_delta_refs(
                    refs, dedup=True, drop_self=True)
                if per_owner is None or n_pairs == 0:
                    continue
                routed = per_owner
                if phase == "del":
                    self._apply_routed(None, per_owner, None)
                else:
                    n_old = self.n
                    self._apply_routed(per_owner, None, max_id)
                    self._seed_new_nodes(n_old)
            self._rebuild_comm_aggs()
            if mode == "static":
                r_size = self.n
                res = self.louvain(init=False, min_gain=min_gain)
                q = res["modularity"]
            elif mode == "full":
                r_size = self.n
                res = self.louvain(init=True, use_subset=False,
                                   min_gain=min_gain)
                q = res["modularity"]
            else:
                r_size = (self._screen_routed(phase, routed)
                          if routed is not None
                          else self._screen(phase, d_src, d_dst))
                if r_size > 0:
                    res = self.louvain(init=True, use_subset=True,
                                       min_gain=min_gain)
                    q = res["modularity"]
                else:
                    q = self._modularity()
            rec = {"ts": ts, "phase": phase, "modularity": q,
                   "r_size": r_size, "r_frac": r_size / max(1, self.n),
                   "n_nodes": self.n, "secs": time.time() - t0}
            records.append(rec)
            self.metrics.append({"job": self.name, "algo": "dynamic", **rec})
            if ckpt_dir:
                self.checkpoint(ckpt_dir, ts * 2 + (0 if phase == "del" else 1),
                                ["labels"], extra=rec)
        return records

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
