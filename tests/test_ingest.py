"""End-to-end ingestion tests on the tiny deterministic pages fixture:
extraction parity (byte-identical text per url), link recovery, dense-id
renumbering, symmetrize+dedup, degrees."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from linkgraph.fixtures.pages import (expected_links_table, make_pages_table,
                                      tiny_config)
from linkgraph.pipelines.ingest import (build_nodes, degree_table,
                                        extract_links, ingest, resolve_edges,
                                        symmetrize_edges)
from linkgraph.stages.extract import TextExtractor


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory, ray_session):
    cfg = tiny_config()
    path = tmp_path_factory.mktemp("pages") / "pages.parquet"
    pq.write_table(make_pages_table(cfg), path)
    return cfg, str(path)


def test_text_extraction_byte_identical(pages_path, ray_session):
    import ray.data as rd
    cfg, path = pages_path
    pages = rd.read_parquet(path)
    out = pages.map_batches(TextExtractor, batch_format="pyarrow",
                            batch_size=64, concurrency=2).to_pandas()
    assert len(out) == cfg.n_pages
    assert out["match"].all()


def test_links_match_planted_graph(pages_path, ray_session):
    import ray.data as rd
    cfg, path = pages_path
    pages = rd.read_parquet(path, columns=["url", "html"])
    links = extract_links(pages).to_pandas()
    got = sorted(map(tuple, links.values.tolist()))
    want_tbl = expected_links_table(cfg)
    want = sorted(zip(want_tbl.column("src_url").to_pylist(),
                      want_tbl.column("dst_url").to_pylist()))
    assert got == want


def test_full_ingest_graph_invariants(pages_path, ray_session):
    cfg, path = pages_path
    out = ingest(path)
    nodes = out["nodes"].to_pandas().sort_values("node_id")
    # dense ids, ranked by sorted url
    assert nodes["node_id"].tolist() == list(range(len(nodes)))
    assert nodes["url"].tolist() == sorted(nodes["url"].tolist())

    edges = out["edges"].to_pandas()
    n = len(nodes)
    assert edges["src"].between(0, n - 1).all()
    assert edges["dst"].between(0, n - 1).all()
    # directed edges are unique pairs
    assert not edges.duplicated(["src", "dst"]).any()

    sym = out["sym_edges"].to_pandas()
    key = set(zip(sym["src"], sym["dst"]))
    for s, d in list(key):
        if s != d:
            assert (d, s) in key
    # weights symmetric
    wmap = {(s, d): w for s, d, w in zip(sym["src"], sym["dst"], sym["w"])}
    for (s, d), w in wmap.items():
        assert wmap[(d, s) if s != d else (s, d)] == w

    deg = out["degrees"].to_pandas().set_index("node")
    for node in deg.index[:20]:
        assert deg.loc[node, "degree"] == (sym["src"] == node).sum()


def test_ingest_write_resumable(pages_path, ray_session, tmp_path):
    """Committed tables (_SUCCESS) are skipped on rerun; a partial
    directory (no marker) is cleared and rewritten."""
    cfg, path = pages_path
    out_dir = str(tmp_path / "out")
    ingest(path, out_dir=out_dir)
    for name in ("nodes", "edges", "sym_edges"):
        assert os.path.exists(os.path.join(out_dir, name, "_SUCCESS"))
    # stamp a committed table; a rerun must not touch it
    stamp = os.path.join(out_dir, "nodes", "_SUCCESS")
    with open(stamp, "w") as f:
        f.write("keep")
    # break an uncommitted table: drop its marker and plant a stale file
    os.remove(os.path.join(out_dir, "edges", "_SUCCESS"))
    stale = os.path.join(out_dir, "edges", "stale.bin")
    with open(stale, "w") as f:
        f.write("junk")
    ingest(path, out_dir=out_dir)
    with open(stamp) as f:
        assert f.read() == "keep"          # skipped: still our stamp
    assert not os.path.exists(stale)        # partial dir was cleared
    assert os.path.exists(os.path.join(out_dir, "edges", "_SUCCESS"))
    got = pq.read_table(os.path.join(out_dir, "edges"))
    assert got.num_rows > 0


def test_nodes_deterministic_across_runs(pages_path, ray_session):
    import ray.data as rd
    cfg, path = pages_path
    pages = rd.read_parquet(path, columns=["url", "html"])
    links = extract_links(pages)
    a = build_nodes(links).to_pandas().sort_values("node_id").reset_index(drop=True)
    b = build_nodes(links).to_pandas().sort_values("node_id").reset_index(drop=True)
    assert a.equals(b)


def test_shuffle_join_path_matches_broadcast(pages_path, ray_session):
    """resolve_edges' hash-shuffle join (the 100TB path) must agree with
    the broadcast-map path used for small node tables."""
    import ray.data as rd
    cfg, path = pages_path
    pages = rd.read_parquet(path, columns=["url", "html"])
    links = extract_links(pages).materialize()
    nodes = build_nodes(links).materialize()
    bcast = resolve_edges(links, nodes).to_pandas()
    shuf = resolve_edges(links, nodes, num_partitions=4,
                         broadcast_threshold=0).to_pandas()
    key = ["src", "dst"]
    a = bcast.sort_values(key).reset_index(drop=True)
    b = shuf.sort_values(key).reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_resolve_collision_fallback_matches_fingerprint(pages_path,
                                                        ray_session,
                                                        monkeypatch):
    """Forcing a fingerprint collision among node urls must route
    resolve through the exact-string fallback and produce identical
    edges.  Stub the index-builder task to report a collision (the
    fallback path never consults the fingerprint index)."""
    import sys

    import ray
    import ray.data as rd
    from linkgraph.pipelines.ingest import resolve_raw
    ing = sys.modules["linkgraph.pipelines.ingest"]
    cfg, path = pages_path
    pages = rd.read_parquet(path, columns=["url", "html"])
    links = extract_links(pages).materialize()
    nodes = build_nodes(links).materialize()
    fp = resolve_raw(links, nodes).to_pandas()

    class FakeMerge:
        @staticmethod
        def remote(*parts):
            return ray.put(True), ray.put(None)

    monkeypatch.setattr(ing, "_fp_merge", FakeMerge)
    fb = resolve_raw(links, nodes).to_pandas()
    key = ["src", "dst"]
    a = fp.sort_values(key).reset_index(drop=True)
    b = fb.sort_values(key).reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_build_nodes_empty_links_p1_path(ray_session):
    """Zero-link corpora hit the empty-sample P==1 route (num_returns=1):
    the route task must return a bare table, not a 1-tuple (r5 review)."""
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.pipelines.ingest import build_nodes

    links = rd.from_arrow(pa.table({
        "src_url": pa.array([], pa.string()),
        "dst_url": pa.array([], pa.string())}))
    nodes = build_nodes(links)
    assert nodes.count() == 0


def test_resolve_raw_drops_unknown_urls(ray_session):
    """Broadcast url->id resolution must DROP links whose url is absent
    from nodes (the shuffle path's inner-join semantics), never resolve
    them to a neighbouring id or raise (r5 review)."""
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.pipelines.ingest import resolve_raw

    nodes = rd.from_arrow(pa.table({
        "url": pa.array(["a.com", "b.com", "c.com"]),
        "node_id": pa.array([0, 1, 2], pa.int64())}))
    links = rd.from_arrow(pa.table({
        "src_url": pa.array(["a.com", "zz.com", "c.com", "b.com"]),
        "dst_url": pa.array(["b.com", "a.com", "missing.org", "a.com"]),
    }))
    out = resolve_raw(links, nodes).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(zip(out["src"], out["dst"])) == [(0, 1), (1, 0)]


def test_join_partitions_clamps_explicit_requests(ray_session):
    """An explicit num_partitions above the session CPUs must clamp —
    one aggregator actor per partition above CPUs stalls the join."""
    import ray

    from linkgraph.pipelines.ingest import join_partitions

    cpus = int(ray.cluster_resources().get("CPU"))
    assert join_partitions(1000) <= cpus
    assert join_partitions(2) == 2
