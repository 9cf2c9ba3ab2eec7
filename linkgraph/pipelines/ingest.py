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
from ray.data.aggregate import Count, Sum

from ..stages.extract import LinkExtractor
from ..stages.normalize import normalize_links

# Hash-join partition count for the large-large url->id joins (J7).  At
# 10^12 pages this should scale with cluster size; on the test box a small
# constant keeps task counts sane.
DEFAULT_JOIN_PARTITIONS = 16


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


def build_nodes(links: rd.Dataset) -> rd.Dataset:
    """Distinct urls -> nodes(url, node_id) with dense ids in sorted url
    order.

    Two passes, no driver row materialization: (1) shuffle-dedup + sort;
    (2) per-block row counts -> driver-side cumulative offsets (one int
    per block) -> per-block id assignment.
    """
    def _block_uniq(batch: pa.Table) -> pa.Table:
        # map-side combine: distinct urls per block before the shuffle
        # (urls repeat once per in/out link — the dedup shuffle payload
        # drops from #link-endpoints to #distinct-per-block)
        import pyarrow.compute as pc
        return pa.table({"url": pc.unique(batch.column("url"))})

    urls = (links.select_columns(["src_url"]).rename_columns({"src_url": "url"})
            .union(links.select_columns(["dst_url"]).rename_columns({"dst_url": "url"}))
            .map_batches(_block_uniq, batch_format="pyarrow",
                         zero_copy_batch=True))
    uniq = urls.groupby("url").aggregate(Count(alias_name="_c")) \
               .select_columns(["url"])
    sorted_ds = uniq.sort("url").materialize()

    blocks = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(tbl: pa.Table) -> int:
        return tbl.num_rows

    counts = ray.get([_count.remote(b) for b in blocks])
    offsets = np.concatenate([[0], np.cumsum(counts)])

    @ray.remote
    def _assign(tbl: pa.Table, off: int) -> pa.Table:
        ids = pa.array(np.arange(off, off + tbl.num_rows, dtype=np.int64))
        return pa.table({"url": tbl.column("url"), "node_id": ids})

    out_refs = [_assign.remote(b, int(off))
                for b, off in zip(blocks, offsets[:-1])]
    return rd.from_arrow_refs(out_refs)


def resolve_raw(links: rd.Dataset, nodes: rd.Dataset, *,
                num_partitions: int = DEFAULT_JOIN_PARTITIONS,
                broadcast_threshold: int = 5_000_000) -> rd.Dataset:
    """links(src_url,dst_url) -> raw per-link (src,dst) id rows (one row
    per link occurrence; E2 dedup happens downstream so the directed and
    symmetric tables can both derive from ONE resolution pass).

    Join strategy: if the nodes table is small enough, broadcast it once
    with ``ray.put`` and map urls inside ``map_batches`` (no shuffle);
    otherwise two hash-partitioned shuffle joins on url (J7).
    """
    n_nodes = nodes.count()
    if n_nodes <= broadcast_threshold:
        from ..common import gather_table
        nodes_tbl = gather_table(nodes)
        # broadcast the sorted url->id map once; fixed-width numpy
        # unicode arrays make every searchsorted comparison a C memcmp
        # (object-dtype string compares ran the whole lookup in Python)
        urls_sorted = np.asarray(nodes_tbl.column("url").to_pylist(),
                                 dtype=str)
        ids_sorted = nodes_tbl.column("node_id").to_numpy()
        order = np.argsort(urls_sorted)
        urls_sorted, ids_sorted = urls_sorted[order], ids_sorted[order]
        map_ref = ray.put((urls_sorted, ids_sorted))

        class UrlToId:
            def __init__(self):
                self.urls, self.ids = ray.get(map_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                s = np.asarray(batch.column("src_url").to_pylist(),
                               dtype=str)
                d = np.asarray(batch.column("dst_url").to_pylist(),
                               dtype=str)
                si = self.ids[np.searchsorted(self.urls, s)]
                di = self.ids[np.searchsorted(self.urls, d)]
                return pa.table({"src": pa.array(si), "dst": pa.array(di)})

        resolved = links.map_batches(UrlToId, batch_format="pyarrow",
                                     zero_copy_batch=True, concurrency=(1, 4))
    else:
        resolved = (
            links.join(nodes, join_type="inner",
                       num_partitions=num_partitions,
                       on=("src_url",), right_on=("url",))
            .rename_columns({"node_id": "src"})
            .select_columns(["src", "dst_url"])
            .join(nodes, join_type="inner",
                  num_partitions=num_partitions,
                  on=("dst_url",), right_on=("url",))
            .rename_columns({"node_id": "dst"})
            .select_columns(["src", "dst"])
        )
    return resolved


def resolve_edges(links: rd.Dataset, nodes: rd.Dataset, **kw) -> rd.Dataset:
    """links -> deduped directed edges(src,dst,w) (E2 on top of
    resolve_raw; kept as the stable public surface)."""
    return dedup_resolved(resolve_raw(links, nodes, **kw))


def _combine_pair_counts(batch: pa.Table) -> pa.Table:
    """Per-block combiner: collapse duplicate (src,dst) rows to one row
    with a partial count BEFORE the all-to-all groupby — the classic
    map-side combine.  Shuffle volume drops from #links to #distinct
    pairs per block; the downstream Sum is associative, so the result is
    identical to counting raw rows."""
    src = batch.column("src").to_numpy()
    dst = batch.column("dst").to_numpy()
    if "c" in batch.column_names:
        c = batch.column("c").to_numpy()
    else:
        c = np.ones(len(src), np.int64)
    order = np.lexsort((dst, src))
    s, d, c = src[order], dst[order], c[order]
    new = np.empty(len(s), bool)
    new[:1] = True
    np.logical_or(s[1:] != s[:-1], d[1:] != d[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    sums = np.add.reduceat(c, starts) if len(starts) else \
        np.empty(0, np.int64)
    return pa.table({"src": s[starts], "dst": d[starts], "c": sums})


def dedup_resolved(resolved: rd.Dataset) -> rd.Dataset:
    """Raw per-link (src,dst) rows -> deduped directed edges with
    multiplicity weight (E2).  Map-side combine, then a Sum groupby."""
    return (resolved.map_batches(_combine_pair_counts,
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby(["src", "dst"])
            .aggregate(Sum("c", alias_name="w"))
            .map_batches(lambda t: t.set_column(
                t.schema.get_field_index("w"), "w",
                t.column("w").cast(pa.float64())),
                batch_format="pyarrow"))


def sym_from_raw(resolved: rd.Dataset) -> rd.Dataset:
    """Raw per-link rows -> symmetric deduped edges in ONE shuffle:
    mirror the raw pairs (self-loops once) and count — count(s,d) =
    mult(s->d) + mult(d->s), identical to dedup-then-mirror-then-sum
    (the queries/graphs.sym_edges single-shuffle formulation)."""

    def mirror_combine(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        nonself = src != dst
        return _combine_pair_counts(pa.table({
            "src": np.concatenate([src, dst[nonself]]),
            "dst": np.concatenate([dst, src[nonself]]),
        }))

    return (resolved.map_batches(mirror_combine, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby(["src", "dst"]).aggregate(Sum("c", alias_name="w"))
            .map_batches(lambda t: t.set_column(
                t.schema.get_field_index("w"), "w",
                t.column("w").cast(pa.float64())),
                batch_format="pyarrow"))


def symmetrize_edges(edges: rd.Dataset) -> rd.Dataset:
    """Directed edges -> symmetric (both directions, self-loops once),
    duplicate (src,dst) weights summed (E1 + E2, graph.cpp:78-81,132-162)."""

    def mirror(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        w = batch.column("w").to_numpy()
        nonself = src != dst
        return pa.table({
            "src": np.concatenate([src, dst[nonself]]),
            "dst": np.concatenate([dst, src[nonself]]),
            "w": np.concatenate([w, w[nonself]]),
        })

    return (edges.map_batches(mirror, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby(["src", "dst"]).aggregate(Sum("w", alias_name="w")))


def degree_table(sym_edges: rd.Dataset) -> rd.Dataset:
    """degrees(node, degree, wdegree) from the symmetric edge table (A1)."""
    return (sym_edges.groupby("src")
            .aggregate(Count(alias_name="degree"),
                       Sum("w", alias_name="wdegree"))
            .rename_columns({"src": "node"}))


def ingest(pages_path: str, out_dir: str | None = None, *,
           concurrency: int | tuple = (1, 4)) -> dict:
    """Full ingestion.  Returns dict of Datasets: links, nodes, edges
    (directed), sym_edges, degrees.  If ``out_dir`` is given, each table is
    also persisted as parquet (resumable layout: one directory per table).
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
        for name in ("nodes", "edges", "sym_edges"):
            out[name].write_parquet(f"{out_dir}/{name}")
    return out
