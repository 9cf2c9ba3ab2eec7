"""Parity tests for the C counting-sort CSR kernels (csrkern.c).

The numpy composite-argsort path is the semantics oracle: both builds
must produce identical indptr, identical per-node adjacency MULTISETS
(within-node order is arrival order on the scatter path, dst-ascending
on the sort path — value-identical under the integral-weight gate), and
identical weighted degrees.  Driven in-process (GraphShard is a plain
class), no Ray needed.
"""

import numpy as np
import pyarrow as pa
import pytest

from linkgraph.common import csr_kernels
from linkgraph.state.partition import GraphShard


def _mk_shard(bounds):
    return GraphShard(0, list(bounds))


def _rand_edges(seed, n_edges, lo, hi, n_global):
    rng = np.random.default_rng(seed)
    src = rng.integers(lo, hi, n_edges).astype(np.int64)
    dst = rng.integers(0, n_global, n_edges).astype(np.int64)
    return src, dst


def _assert_same_csr(a: GraphShard, b: GraphShard):
    assert np.array_equal(a.indptr, b.indptr)
    for v in range(a.n_local):
        s, e = a.indptr[v], a.indptr[v + 1]
        # multiset equality per node: (dst, w) pairs sorted
        ka = np.lexsort((a.weights[s:e], a.indices[s:e]))
        kb = np.lexsort((b.weights[s:e], b.indices[s:e]))
        assert np.array_equal(a.indices[s:e][ka], b.indices[s:e][kb])
        assert np.array_equal(a.weights[s:e][ka], b.weights[s:e][kb])
    assert np.array_equal(a.k, b.k)
    assert len(a.ghosts) == len(b.ghosts)
    for ga, gb in zip(a.ghosts, b.ghosts):
        assert np.array_equal(ga, gb)


@pytest.fixture(scope="module")
def lib():
    k = csr_kernels()
    if k is None:
        pytest.skip("no compiler: csr kernels unavailable")
    return k


def test_kernels_match_sort_path_unweighted(lib, monkeypatch):
    bounds = [10, 40, 100]
    src, dst = _rand_edges(7, 5000, 10, 40, 100)
    # duplicate some edges: multi-edge multiplicities must be preserved
    src = np.concatenate([src, src[:500]])
    dst = np.concatenate([dst, dst[:500]])

    fast = _mk_shard(bounds)
    fast._build_csr(src.copy(), dst.copy(), None)

    slow = _mk_shard(bounds)
    monkeypatch.setattr("linkgraph.common._CSRKERN", None)
    slow._build_csr(src.copy(), dst.copy(), None)

    _assert_same_csr(fast, slow)
    # sort path emits dst-ascending adjacency; scatter path need not —
    # but both must be grouped by node exactly
    assert fast.indptr[-1] == len(src)


def test_kernels_match_sort_path_integral_weights(lib, monkeypatch):
    bounds = [0, 25, 60]
    src, dst = _rand_edges(11, 3000, 0, 25, 60)
    w = np.random.default_rng(12).integers(1, 9, len(src)).astype(np.float64)

    fast = _mk_shard(bounds)
    fast._build_csr(src.copy(), dst.copy(), w.copy())

    slow = _mk_shard(bounds)
    monkeypatch.setattr("linkgraph.common._CSRKERN", None)
    slow._build_csr(src.copy(), dst.copy(), w.copy())

    _assert_same_csr(fast, slow)
    assert fast.weights.strides[0] != 0      # real (non-elided) weights


def test_float_weights_take_sort_path(lib):
    """Non-integral weights must NOT use the scatter path (float sum
    order matters): the build must produce the lexsort's dst-ascending,
    input-stable adjacency."""
    bounds = [0, 4, 8]
    src = np.array([0, 0, 0, 1], dtype=np.int64)
    dst = np.array([5, 2, 2, 3], dtype=np.int64)
    w = np.array([0.5, 1.25, 2.5, 1.0], dtype=np.float64)
    sh = _mk_shard(bounds)
    sh._build_csr(src, dst, w)
    assert np.array_equal(sh.indices[:3], [2, 2, 5])     # dst-ascending
    assert np.array_equal(sh.weights[:3], [1.25, 2.5, 0.5])  # input-stable


def test_chunked_finalize_matches_array_build(lib):
    """finalize_graph's zero-materialization chunk path == the array
    path on the same multiset of routed blocks."""
    bounds = [100, 150, 400]
    src, dst = _rand_edges(23, 4000, 100, 150, 400)

    chunked = _mk_shard(bounds)
    for cut in range(0, 4000, 700):       # multiple pending blocks
        chunked.ingest_edges(pa.table({"src": src[cut:cut + 700],
                                       "dst": dst[cut:cut + 700]}))
    stats_c = chunked.finalize_graph()

    arr = _mk_shard(bounds)
    arr._build_csr(src.copy(), dst.copy(), None)

    _assert_same_csr(chunked, arr)
    assert stats_c["n_edges"] == 4000
    # the chunk path preserves the unweighted elision
    assert chunked.weights.strides[0] == 0


def test_out_of_range_src_raises(lib):
    sh = _mk_shard([10, 20, 50])
    src = np.array([10, 9], dtype=np.int64)      # 9 < lo
    dst = np.array([1, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="outside"):
        sh._build_csr(src, dst, None)


def test_raw_kernels_counting_sort():
    """Direct kernel check against np.argsort on a tiny case."""
    lib = csr_kernels()
    if lib is None:
        pytest.skip("no compiler")
    import ctypes
    p = ctypes.c_void_p
    src = np.array([3, 1, 1, 2, 3, 1], dtype=np.int64)
    dst = np.array([9, 8, 7, 6, 5, 4], dtype=np.int64)
    counts = np.zeros(3, dtype=np.int64)
    bad = lib.csr_count(p(src.ctypes.data), 6, 1, 3, p(counts.ctypes.data))
    assert bad == 0
    assert counts.tolist() == [3, 1, 2]
    indptr = np.concatenate([[0], np.cumsum(counts)])
    cursor = indptr[:-1].copy()
    out = np.empty(6, dtype=np.int64)
    lib.csr_scatter(p(src.ctypes.data), p(dst.ctypes.data), 6, 1,
                    p(cursor.ctypes.data), p(out.ctypes.data))
    # arrival order within each node
    assert out.tolist() == [8, 7, 4, 6, 9, 5]


def test_warmup_lazy_and_incremental():
    """Build-time warmup covers the BASE budget; Louvain top-up warms the
    difference; a smaller-or-equal re-request is a no-op; growth after a
    rebuild re-warms."""
    sh = _mk_shard([0, 100, 200])
    src, dst = _rand_edges(3, 10_000, 0, 100, 200)
    sh._build_csr(src, dst, None)
    sh._warmed_bytes = 0                      # isolate from build warmup
    base = sh.warmup_scratch()
    assert base == 10_000 * sh.BASE_WARMUP_BYTES_PER_EDGE
    assert sh.warmup_scratch() == 0           # covered: no-op
    top = sh.warmup_scratch(sh.WARMUP_BYTES_PER_EDGE)
    assert top == 10_000 * sh.WARMUP_BYTES_PER_EDGE
    assert sh.warmup_scratch(sh.WARMUP_BYTES_PER_EDGE) == 0
    assert sh.warmup_scratch(32) == 0         # smaller budget: no-op
    # grow the graph: same budget now needs more bytes
    src2, dst2 = _rand_edges(4, 20_000, 0, 100, 200)
    sh._build_csr(src2, dst2, None)
    assert sh.warmup_scratch(sh.WARMUP_BYTES_PER_EDGE) \
        == 20_000 * sh.WARMUP_BYTES_PER_EDGE


def test_prewarm_louvain_budget_covers_ensure_scratch():
    """A Louvain-bound prewarm (from_dataset(warmup='louvain')) covers
    the level-0 top-up: _ensure_scratch's warmup_scratch is a no-op when
    the route-wave estimate was tight, and pays only the shortfall when
    it undershot."""
    sh = _mk_shard([0, 100, 200])
    src, dst = _rand_edges(5, 10_000, 0, 100, 200)
    sh._warmed_bytes = 0
    # exact estimate at the full Louvain budget
    assert sh.prewarm_scratch(10_000, sh.WARMUP_BYTES_PER_EDGE) \
        == 10_000 * sh.WARMUP_BYTES_PER_EDGE
    sh._build_csr(src, dst, None)
    assert sh.warmup_scratch(sh.WARMUP_BYTES_PER_EDGE) == 0
    # undershot estimate: top-up pays only the delta
    sh2 = _mk_shard([0, 100, 200])
    sh2._warmed_bytes = 0
    sh2.prewarm_scratch(8_000, sh2.WARMUP_BYTES_PER_EDGE)
    sh2._build_csr(src, dst, None)
    assert sh2.warmup_scratch(sh2.WARMUP_BYTES_PER_EDGE) \
        == 10_000 * sh2.WARMUP_BYTES_PER_EDGE
