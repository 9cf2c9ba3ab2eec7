"""Ingestion pipeline: pages -> links -> nodes -> edges -> degrees.

Ray-Data-first equivalent of the reference's ``convert`` preprocessing
(``main_convert.cpp:110-123``: read -> symmetrize -> clean -> renumber ->
write), re-expressed as Dataset transforms:

    read_parquet(pages, columns=[url, html])       # prune at the read
      -> map_batches(_links_batch, cached parser)  # S13, html dropped here
      -> map_batches(normalize_links)              # E13
      -> groupby(src,dst).count                    # E2 exact dedup
      -> url -> dense node id                      # E3 renumber (sort rank)
      -> directed edges (PageRank/triangles)
      -> symmetrize + dedup                        # E1+E2 (Louvain family)
      -> degrees                                   # A1

Everything streams; nothing materializes the pages table.  The dense-id
ranking is a two-pass block-offset assignment over the *sorted unique
urls* (deterministic, no driver-side row materialization) — the Ray-Data
analog of ``convert -r`` (``graph.cpp:93-130``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.extract import LinkExtractor
from ..stages.normalize import normalize_links

# Hash-join partition cap for the large-large url->id joins (J7).  At
# 10^12 pages this should scale with cluster size; on the test box a small
# constant keeps task counts sane.  The EFFECTIVE count never exceeds the
# cluster CPUs: Ray Data's hash join reserves one aggregator actor per
# partition, and requesting 16 partitions on a 4-CPU session starves the
# probe side into a zero-progress backpressure stall (observed on the
# 16M-page ingest A/B at num_cpus=4).
DEFAULT_JOIN_PARTITIONS = 16


def join_partitions(requested: int | None = None) -> int:
    """Join partition count sized to the cluster: min(cap, CPUs).
    Explicit requests are clamped to the CPU count too — Ray Data
    reserves one aggregator actor per partition, so a request above
    the session's CPUs reproduces the documented zero-progress stall
    regardless of who asked."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    if requested is not None:
        return max(2, min(requested, cpus))
    return max(2, min(DEFAULT_JOIN_PARTITIONS, cpus))


_EXTRACTOR: LinkExtractor | None = None


def _links_batch(batch: pa.Table) -> pa.Table:
    """Task body with a per-process cached parser.  The extractor's
    state is two compiled regexes (microseconds to build), so a cached
    plain task beats an actor pool: pool spin-up was a fixed serial
    cost at the head of every ingest, and task pools scale elastically
    with the cluster (same reasoning as text/ops._band_rows_batch).
    Stages whose per-actor state is genuinely expensive (models,
    indexes) still belong in actor pools — see stages/multimodal.py."""
    global _EXTRACTOR
    if _EXTRACTOR is None:
        from ..common import tune_malloc
        tune_malloc()
        _EXTRACTOR = LinkExtractor()
    return _EXTRACTOR(batch)


def extract_links(pages: rd.Dataset, *, concurrency: int | tuple | None = None,
                  batch_size: int = 1024, normalize: bool = True) -> rd.Dataset:
    """pages -> links(src_url, dst_url).  Drops html immediately (the
    binary column never enters a shuffle).  ``concurrency`` is accepted
    for API compatibility but the task path scales elastically and
    ignores it."""
    del concurrency
    links = pages.map_batches(
        _links_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if normalize:
        links = links.map_batches(normalize_links, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return links


@ray.remote
def _url_sample(tbl: pa.Table, k: int) -> pa.Table:
    """Deterministic stride sample of a block's distinct urls (range-
    boundary estimation; no RNG so reruns route identically)."""
    import pyarrow.compute as pc
    if tbl.num_rows == 0 or "url" not in tbl.column_names:
        # Ray Data passes zero-row blocks through Project/rename
        # WITHOUT running the op, so an all-empty links union reaches
        # here with the pre-rename schema — treat as no urls
        return pa.table({"url": pa.array([], pa.string())})
    u = pc.unique(tbl.column("url"))
    n = len(u)
    if n <= k:
        return pa.table({"url": u})
    idx = np.linspace(0, n - 1, k).astype(np.int64)
    return pa.table({"url": u.take(pa.array(idx))})


@ray.remote
def _url_route(tbl: pa.Table, bounds) -> tuple:
    """Route a block's distinct urls to their range partition with
    Arrow-native comparisons: partition index = number of bounds <= url
    (== searchsorted side="right"), computed as len(bounds) vectorized
    ``pc.greater_equal`` passes — no per-row Python conversion (the old
    to_pylist + UCS-4 copy was the dominant routing cost at large url
    counts; Arrow UTF-8 byte order == code-point order, so the routing
    still agrees with the per-partition Arrow sort).  At very large P a
    bucketed two-level comparison would replace the linear pass."""
    import pyarrow.compute as pc
    P = len(bounds) + 1
    if tbl.num_rows == 0 or "url" not in tbl.column_names:
        empty = pa.table({"url": pa.array([], pa.string())})
        return tuple(empty for _ in range(P)) if P > 1 else empty
    u = pc.unique(tbl.column("url"))
    part = np.zeros(len(u), np.int64)
    for b in bounds:
        part += pc.greater_equal(u, pa.scalar(b))             .to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    arr = u.take(pa.array(order))
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    out = tuple(pa.table({"url": arr.slice(cuts[p], cuts[p + 1] - cuts[p])})
                for p in range(P))
    # num_returns=1 (empty-sample path): a bare table, not a 1-tuple —
    # the reduce task reads .num_rows on what it receives
    return out if P > 1 else out[0]


@ray.remote
def _url_reduce(*parts) -> pa.Table:
    """Distinct + sort one url range partition (Arrow C++ kernels)."""
    import pyarrow.compute as pc
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return pa.table({"url": pa.array([], pa.string())})
    arr = pc.unique(pa.concat_tables(tbls).column("url").combine_chunks())
    return pa.table({"url": arr.take(pc.array_sort_indices(arr))})


def build_nodes(links: rd.Dataset) -> rd.Dataset:
    """Distinct urls -> nodes(url, node_id) with dense ids in sorted url
    order.

    One range exchange instead of Ray Data's two string all-to-alls
    (sort-based groupby + sort): per-block distinct -> deterministic
    sample -> range boundaries -> route -> per-partition Arrow
    unique+sort (partitions are globally ordered by construction), then
    per-partition row counts -> cumulative offsets -> id assignment.
    Output ids are P-invariant (rank in the global sorted order) and no
    driver-side row materialization happens at any step."""
    urls = (links.select_columns(["src_url"]).rename_columns({"src_url": "url"})
            .union(links.select_columns(["dst_url"]).rename_columns({"dst_url": "url"})))
    blocks = urls.materialize().to_arrow_refs()
    if not blocks:
        return rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                       "node_id": pa.array([], pa.int64())}))
    try:
        P = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    except Exception:
        P = 8
    samples = ray.get([_url_sample.remote(b, 4 * P) for b in blocks])
    pool = np.sort(np.asarray(
        pa.concat_tables(samples).column("url").to_pylist(), dtype=str))
    if len(pool) == 0:
        P = 1
        bounds = []
    else:
        q = np.linspace(0, len(pool) - 1, P + 1)[1:-1].astype(np.int64)
        bounds = [str(x) for x in dict.fromkeys(pool[q])]  # distinct, ordered
        P = len(bounds) + 1
    routed = [_url_route.options(num_returns=P).remote(b, bounds)
              for b in blocks]
    if P == 1:
        routed = [[r] for r in routed]
    parts = [_url_reduce.remote(*[routed[i][p] for i in range(len(routed))])
             for p in range(P)]

    from ..stages.exchange import _count_rows
    counts = ray.get([_count_rows.remote(b) for b in parts])
    offsets = np.concatenate([[0], np.cumsum(counts)])

    @ray.remote
    def _assign(tbl: pa.Table, off: int) -> pa.Table:
        ids = pa.array(np.arange(off, off + tbl.num_rows, dtype=np.int64))
        return pa.table({"url": tbl.column("url"), "node_id": ids})

    out_refs = [_assign.remote(b, int(off))
                for b, off in zip(parts, offsets[:-1])]
    return rd.from_arrow_refs(out_refs)


@ray.remote
def _fp_hash_block(tbl: pa.Table, chunk: int = 16384):
    """Hash one nodes block's urls to 64-bit fingerprints.  Parallel
    per-block tasks, and CHUNKED inside the block: the vectorized hash
    allocates ~40x the text size in temporaries (a whole-table hash of
    1M urls touched ~1.8 GB of fresh pages, serialized by the host's
    first-touch population throttle at 100-200 MB/s).  Hashing 16k rows
    at a time bounds the temporaries to a few MB whose freed pages the
    next chunk reuses (malloc trim is disabled via tune_malloc)."""
    from ..common import tune_malloc
    from ..text.ops import _poly_hash_flat, _splitmix64, _str_bytes
    tune_malloc()
    col = tbl.column("url")
    n = len(col)
    out = np.empty(n, np.uint64)
    for s in range(0, n, chunk):
        sl = col.slice(s, min(chunk, n - s))
        out[s:s + len(sl)] = _splitmix64(_poly_hash_flat(*_str_bytes(sl)))
    return out, tbl.column("node_id").to_numpy()


@ray.remote(num_returns=2)
def _fp_merge(*parts):
    """Merge per-block fingerprints into the sorted broadcast index.
    Returns (collision_flag, index): the driver fetches only the flag;
    the (hash, id) arrays stay in plasma and are read zero-copy by every
    url_to_id task."""
    h = np.concatenate([p[0] for p in parts])
    ids = np.concatenate([p[1] for p in parts])
    order = np.argsort(h, kind="stable")
    hs, iss = h[order], ids[order]
    collision = bool(np.any(hs[1:] == hs[:-1]))
    return collision, (hs, iss)


# Broadcast-vs-shuffle switch for url->id resolution: the broadcast
# index costs 16 B/url in plasma (sorted fingerprint + id), so 50M urls
# = 800 MB — one zero-copy object per NODE of a real cluster, well
# under worker heaps.  Beyond it, the hash-shuffle join path (sized by
# join_partitions) takes over.  Measured at 100k urls / 4 CPUs:
# broadcast 0.48 s vs shuffle join 4.5 s on identical output.
BROADCAST_URLS = 50_000_000


def resolve_raw(links: rd.Dataset, nodes: rd.Dataset, *,
                num_partitions: int | None = None,
                broadcast_threshold: int = BROADCAST_URLS) -> rd.Dataset:
    """links(src_url,dst_url) -> raw per-link (src,dst) id rows (one row
    per link occurrence; E2 dedup happens downstream so the directed and
    symmetric tables can both derive from ONE resolution pass).

    Join strategy: if the nodes table is small enough, broadcast it once
    with ``ray.put`` and map urls inside ``map_batches`` (no shuffle);
    otherwise two hash-partitioned shuffle joins on url (J7).
    """
    n_nodes = nodes.count()
    if n_nodes <= broadcast_threshold:
        from ..text.ops import _poly_hash_flat, _splitmix64, _str_bytes
        # Broadcast sorted 64-bit url fingerprints + ids (16 B/url)
        # instead of the urls themselves: the UCS-4 string broadcast was
        # ~15x larger and each batch paid a to_pylist -> numpy-unicode
        # copy, which forced a 4-actor cap and made this stage scale
        # INVERSELY with CPUs (1M-page profile: 17.7s@32 vs 11.6s@8).
        # Fingerprints hash straight off the Arrow buffers.  Collisions
        # are checked once over the (distinct) node urls; on a hit we
        # fall back to exact string matching — at 5M urls the birthday
        # bound is ~7e-7, so the fallback is effectively test-only.
        # The index is built in TASKS, not on the driver: a cold driver
        # heap pays the host's first-touch page-population throttle
        # (measured 23.7 s for the 1M-url hash the warm worker pool does
        # in <1 s); only the 1-byte collision flag reaches the driver.
        hashed = [_fp_hash_block.remote(b)
                  for b in nodes.materialize().to_arrow_refs()]
        col_ref, map_ref = _fp_merge.remote(*hashed)
        collision = ray.get(col_ref)
        if not collision:
            def url_to_id(batch: pa.Table) -> pa.Table:
                hs, ids_s = ray.get(map_ref)  # zero-copy plasma views
                hsrc = _splitmix64(_poly_hash_flat(
                    *_str_bytes(batch.column("src_url"))))
                hdst = _splitmix64(_poly_hash_flat(
                    *_str_bytes(batch.column("dst_url"))))
                ps = np.minimum(np.searchsorted(hs, hsrc), len(hs) - 1)
                pd_ = np.minimum(np.searchsorted(hs, hdst), len(hs) - 1)
                # verified lookup: urls absent from nodes DROP the row
                # (the shuffle path's inner-join semantics) instead of
                # resolving to an arbitrary neighbouring id
                ok = (hs[ps] == hsrc) & (hs[pd_] == hdst)
                return pa.table({"src": pa.array(ids_s[ps][ok]),
                                 "dst": pa.array(ids_s[pd_][ok])})

            resolved = links.map_batches(url_to_id, batch_format="pyarrow",
                                         zero_copy_batch=True)
        else:
            # exact-string fallback (collision among node fingerprints)
            from ..common import gather_table
            nodes_tbl = gather_table(nodes)
            ids = nodes_tbl.column("node_id").to_numpy()
            urls_sorted = np.asarray(nodes_tbl.column("url").to_pylist(),
                                     dtype=str)
            sorder = np.argsort(urls_sorted)
            urls_sorted, sids = urls_sorted[sorder], ids[sorder]
            smap_ref = ray.put((urls_sorted, sids))

            def url_to_id_str(batch: pa.Table) -> pa.Table:
                urls, ids_s = ray.get(smap_ref)
                s = np.asarray(batch.column("src_url").to_pylist(), dtype=str)
                d = np.asarray(batch.column("dst_url").to_pylist(), dtype=str)
                ps = np.minimum(np.searchsorted(urls, s), len(urls) - 1)
                pd_ = np.minimum(np.searchsorted(urls, d), len(urls) - 1)
                ok = (urls[ps] == s) & (urls[pd_] == d)
                return pa.table({"src": pa.array(ids_s[ps][ok]),
                                 "dst": pa.array(ids_s[pd_][ok])})

            resolved = links.map_batches(url_to_id_str,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True,
                                         concurrency=4)
    else:
        P = join_partitions(num_partitions)
        resolved = (
            links.join(nodes, join_type="inner",
                       num_partitions=P,
                       on=("src_url",), right_on=("url",))
            .rename_columns({"node_id": "src"})
            .select_columns(["src", "dst_url"])
            .join(nodes, join_type="inner",
                  num_partitions=P,
                  on=("dst_url",), right_on=("url",))
            .rename_columns({"node_id": "dst"})
            .select_columns(["src", "dst"])
        )
    return resolved


def resolve_edges(links: rd.Dataset, nodes: rd.Dataset, **kw) -> rd.Dataset:
    """links -> deduped directed edges(src,dst,w) (E2 on top of
    resolve_raw; kept as the stable public surface)."""
    return dedup_resolved(resolve_raw(links, nodes, **kw))


def _mirror_pairs(batch: pa.Table) -> pa.Table:
    """Emit both directions of every non-self pair (self-loops once) —
    the pre-transform for the symmetric tables."""
    if batch.num_rows == 0:
        return batch.select(["src", "dst"])
    src = batch.column("src").to_numpy()
    dst = batch.column("dst").to_numpy()
    nonself = src != dst
    return pa.table({
        "src": np.concatenate([src, dst[nonself]]),
        "dst": np.concatenate([dst, src[nonself]]),
    })


def _count_to_w(t: pa.Table) -> pa.Table:
    return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                     "w": t.column("c").cast(pa.float64())})


def _pair_count_exchange(resolved: rd.Dataset, *, mirror: bool,
                         num_partitions: int | None = None) -> rd.Dataset:
    """(src, dst) multiplicity aggregation as an explicit two-stage
    hash exchange (combine -> split -> numpy reduce) — see
    ``stages.exchange``.  Replaces the Dataset groupby on this path:
    Ray Data's sort-based AllToAll Aggregate measured ~30x slower than
    the numpy reduce at 17M rows (1M-page profile: sym 79.5 s -> 1.5 s),
    while this exchange moves the same bytes once and reduces in C.
    Deterministic output partitioning (hash of the pair), resumable per
    partition."""
    from ..stages.exchange import grouped_exchange
    return grouped_exchange(resolved, ["src", "dst"],
                            [("count", "", "c")],
                            pre=_mirror_pairs if mirror else None,
                            post=_count_to_w,
                            num_partitions=num_partitions)


def dedup_resolved(resolved: rd.Dataset) -> rd.Dataset:
    """Raw per-link (src,dst) rows -> deduped directed edges with
    multiplicity weight (E2).  Combine + hash exchange + numpy reduce."""
    return _pair_count_exchange(resolved, mirror=False)


def sym_from_raw(resolved: rd.Dataset) -> rd.Dataset:
    """Raw per-link rows -> symmetric deduped edges in ONE shuffle:
    mirror the raw pairs (self-loops once) and count — count(s,d) =
    mult(s->d) + mult(d->s), identical to dedup-then-mirror-then-sum
    (the queries/graphs.sym_edges single-shuffle formulation)."""

    return _pair_count_exchange(resolved, mirror=True)


def _mirror_weighted(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch.select(["src", "dst", "w"])
    src = batch.column("src").to_numpy()
    dst = batch.column("dst").to_numpy()
    w = batch.column("w").to_numpy()
    nonself = src != dst
    return pa.table({
        "src": np.concatenate([src, dst[nonself]]),
        "dst": np.concatenate([dst, src[nonself]]),
        "w": np.concatenate([w, w[nonself]]),
    })


def symmetrize_edges(edges: rd.Dataset) -> rd.Dataset:
    """Directed edges -> symmetric (both directions, self-loops once),
    duplicate (src,dst) weights summed (E1 + E2, graph.cpp:78-81,132-162).
    One grouped exchange (stages.exchange), no Dataset groupby."""
    from ..stages.exchange import grouped_exchange
    return grouped_exchange(edges, ["src", "dst"], [("sum", "w", "w")],
                            pre=_mirror_weighted)


def _deg_rename(t: pa.Table) -> pa.Table:
    return t.rename_columns(["node", "degree", "wdegree"])


def degree_table(sym_edges: rd.Dataset) -> rd.Dataset:
    """degrees(node, degree, wdegree) from the symmetric edge table (A1).

    Grouped exchange, not a Dataset groupby: Ray Data's aggregate
    accumulates per group in Python, which measured 92.8 s for 1M
    groups over 8.5M rows where this exchange takes <1 s."""
    from ..stages.exchange import grouped_exchange
    return grouped_exchange(sym_edges, ["src"],
                            [("count", "", "degree"),
                             ("sum", "w", "wdegree")],
                            post=_deg_rename)


def ingest(pages_path: str, out_dir: str | None = None, *,
           concurrency: int | tuple = (1, 4)) -> dict:
    """Full ingestion.  Returns dict of Datasets: links, nodes, edges
    (directed), sym_edges, degrees.  If ``out_dir`` is given, the nodes /
    edges / sym_edges tables are persisted as parquet (resumable layout:
    one _SUCCESS-gated directory per table); links and degrees are cheap
    derivations and are NOT written — recompute them from the persisted
    tables on resume.
    """
    pages = rd.read_parquet(pages_path, columns=["url", "html"])
    # materialize links once: both build_nodes and resolve_edges consume
    # it — leaving it lazy re-runs the html parse per consumer
    links = extract_links(pages, concurrency=concurrency).materialize()
    nodes = build_nodes(links).materialize()
    # ONE url->id resolution pass feeds both edge tables; the symmetric
    # table goes mirror-raw -> single groupby (not via the directed
    # table), cutting a chained shuffle off the critical path
    raw = resolve_raw(links, nodes).materialize()
    edges = dedup_resolved(raw).materialize()
    sym = sym_from_raw(raw).materialize()
    degrees = degree_table(sym)
    out = {"links": links, "nodes": nodes, "edges": edges,
           "sym_edges": sym, "degrees": degrees}
    if out_dir:
        import os
        import shutil
        for name in ("nodes", "edges", "sym_edges"):
            d = f"{out_dir}/{name}"
            marker = os.path.join(d, "_SUCCESS")
            if os.path.exists(marker):
                continue  # resumable: this table already committed
            if os.path.isdir(d):
                shutil.rmtree(d)  # partial output from a failed run
            out[name].write_parquet(d)
            with open(marker, "w") as f:
                f.write("")
    return out
