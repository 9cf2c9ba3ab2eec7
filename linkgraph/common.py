"""Small shared Dataset utilities."""

from __future__ import annotations

_MALLOC_TUNED = False


def tune_malloc() -> bool:
    """Keep large allocations in the recycled heap (glibc mallopt).

    By default glibc serves >32MB allocations with fresh mmap regions
    and returns them on free, so every iteration's numpy temporaries
    are backed by never-touched pages.  On virtualized hosts (nested
    page tables, 4KB pages) the FIRST random-access traversal of such
    pages costs ~1us/element — measured 50-80x slower than the same
    gather on warm memory, which made every Louvain round pay tens of
    seconds for work that computes in 0.3s warm.  Raising
    M_MMAP_THRESHOLD / disabling trim keeps those buffers on the heap,
    so after a one-round warm-up every per-iteration temporary reuses
    warm pages.  Call once per worker process (shard actors, cached
    per-process task state).  No-op on non-glibc platforms."""
    global _MALLOC_TUNED
    if _MALLOC_TUNED:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = (libc.mallopt(M_TRIM_THRESHOLD, ctypes.c_int(2**31 - 1)) == 1
              and libc.mallopt(M_MMAP_THRESHOLD,
                               ctypes.c_int(2**31 - 1)) == 1)
        _MALLOC_TUNED = bool(ok)
        return _MALLOC_TUNED
    except Exception:
        return False


def ensure_shmmap() -> "str | None":
    """Compile (once) and return the shmmap LD_PRELOAD shim path.

    The shim backs every >=4MB allocation with MAP_SHARED anonymous
    memory: on this virtualized host private-anon first-touch faults run
    at ~7 MB/s while shared-anon faults run at ~1.4 GB/s (measured
    ~200x, see BASELINE.md).  Returns None when no compiler is available
    (the engine works unchanged, just pays the slow fault path)."""
    import os
    import subprocess

    base = os.path.join(os.path.dirname(__file__), "_native")
    src = os.path.join(base, "shmmap.c")
    so = os.path.join(base, "shmmap.so")
    if not os.path.exists(src):
        return None
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so, src,
                        "-ldl"], check=True, capture_output=True)
        return so
    except Exception:
        return None


def enable_shmmap() -> bool:
    """Export the shim into LD_PRELOAD so every process started from now
    on (Ray raylet -> workers/actors, bench child processes) loads it.
    Call BEFORE ray.init; the already-running process itself is not
    affected (preload only applies at exec).

    OPT-IN (LINKGRAPH_SHMMAP=1): shared-anon pages fault fast on this
    host but can NEVER become huge pages (shmem_enabled=never, and
    MADV_COLLAPSE returns EINVAL on them) — so every steady-state
    random gather pays 4 KB TLB walks forever.  Measured A/B on the
    240M-edge stress Louvain at P=16: 387.7 s with the shim vs 147.6 s
    without (late rounds 26–42 s vs ~3 s); the 10M-element gather
    microbench is 25.6 s on shmem vs 1.08 s on MADV_COLLAPSEd private
    anon.  The default path is private anon + collapse_hugepages on
    the long-lived arrays (see below).  Do NOT enable around
    fork-without-exec children (multiprocessing fork pools) —
    shared-anon heap pages are shared with such children."""
    import os

    if os.environ.get("LINKGRAPH_SHMMAP", "0") != "1":
        return False
    so = ensure_shmmap()
    if not so:
        return False
    cur = os.environ.get("LD_PRELOAD", "")
    if so not in cur.split(":"):
        os.environ["LD_PRELOAD"] = f"{so}:{cur}" if cur else so
    return True


_CSRKERN: "object" = False   # False = not tried yet; None = unavailable


def csr_kernels():
    """Compile (once per checkout) and load (once per process) the
    single-pass counting-sort CSR kernels (``_native/csrkern.c``).

    The kernels replace the argsort+gather CSR finalize for
    integral-weight graphs: fresh heap drops from ~40-56 B/edge to
    8-16 B/edge, which is the lever on this host where first-touch page
    population is the documented non-scaling term of the build
    (BASELINE.md).  Returns the configured ctypes lib or None (numpy
    sort fallback — also the semantics oracle for the kernels).
    Opt-out: ``LINKGRAPH_CSRKERN=0``."""
    global _CSRKERN
    if _CSRKERN is not False:
        return _CSRKERN
    import ctypes
    import os
    import subprocess
    import tempfile

    _CSRKERN = None
    if os.environ.get("LINKGRAPH_CSRKERN", "1") != "1":
        return None
    base = os.path.join(os.path.dirname(__file__), "_native")
    src = os.path.join(base, "csrkern.c")
    so = os.path.join(base, "csrkern.so")
    try:
        if not (os.path.exists(so)
                and os.path.getmtime(so) >= os.path.getmtime(src)):
            # compile to a temp name + atomic rename: many actor
            # processes may race here on first use
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=base)
            os.close(fd)
            subprocess.run(["gcc", "-O3", "-fPIC", "-shared", "-o", tmp,
                            src], check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        p = ctypes.c_void_p
        i64 = ctypes.c_int64
        lib.csr_count.argtypes = [p, i64, i64, i64, p]
        lib.csr_count.restype = i64
        lib.csr_scatter.argtypes = [p, p, i64, i64, p, p]
        lib.csr_scatter.restype = None
        lib.csr_scatter_w.argtypes = [p, p, p, i64, i64, p, p, p]
        lib.csr_scatter_w.restype = None
        _CSRKERN = lib
    except Exception:
        _CSRKERN = None
    return _CSRKERN


_MADV_HUGEPAGE = 14
_PAGE = 4096


def hint_hugepages(*arrays) -> None:
    """``madvise(MADV_HUGEPAGE)`` the pages backing big numpy arrays.

    On this host the FIRST random-access traversal of 4KB-backed fresh
    memory costs ~1 µs/element (nested page-table walks); with 2 MB
    pages the same cold gather is ~25× faster (measured 11.5 s → 0.42 s
    on a 10M-element gather).  BUT with ``defrag=madvise`` (this host)
    hinted faults take the DIRECT-compaction path, and 16 actors
    faulting concurrently showed build/round walls ~2× WORSE in one
    integrated run — so the hints are opt-in via
    ``LINKGRAPH_HUGEPAGES=1`` until a quieter host can A/B them; the
    warm-heap mallopt reuse (tune_malloc) already covers steady-state.
    Safe no-op on failure or small arrays."""
    import os
    if os.environ.get("LINKGRAPH_HUGEPAGES", "0") != "1":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        for a in arrays:
            if a is None or a.nbytes < (1 << 22):   # < 4 MB: not worth it
                continue
            addr = a.ctypes.data
            a0 = addr & ~(_PAGE - 1)
            libc.madvise(ctypes.c_void_p(a0),
                         ctypes.c_size_t(a.nbytes + (addr - a0)),
                         _MADV_HUGEPAGE)
    except Exception:
        pass


_MADV_COLLAPSE = 25


def collapse_hugepages(*arrays) -> int:
    """Synchronously collapse the pages backing big LONG-LIVED numpy
    arrays into 2 MB huge pages (``madvise(MADV_COLLAPSE)``, kernel
    6.1+).  Unlike MADV_HUGEPAGE this is a one-time deterministic
    operation on already-populated memory — no fault-time direct
    compaction on the hot path, and it works regardless of the sysfs
    ``enabled``/``defrag`` mode (private-anon only; shmem is refused
    when shmem_enabled=never).

    Measured on this host (virtualized, nested paging): a 10M-element
    random gather over a 1 GiB array takes ~1.1 s collapsed vs ~25 s on
    4 KB pages — the dominant per-round cost of every CSR/message
    kernel.  Call it once per graph version on the arrays every
    superstep gathers from (CSR indices/weights, message permutations).
    Opt-out: LINKGRAPH_COLLAPSE=0.  Safe no-op on failure, tiny arrays,
    or old kernels.  Returns the number of arrays collapsed."""
    import os
    if os.environ.get("LINKGRAPH_COLLAPSE", "1") != "1":
        return 0
    done = 0
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        for a in arrays:
            if a is None or getattr(a, "nbytes", 0) < (4 << 20):
                continue
            addr = a.ctypes.data
            end = addr + a.nbytes
            a0 = (addr + _PAGE - 1) & ~(_PAGE - 1)   # round in: madvise
            e0 = end & ~(_PAGE - 1)                  # needs aligned range
            if e0 - a0 < (4 << 20):
                continue
            if libc.madvise(ctypes.c_void_p(a0), ctypes.c_size_t(e0 - a0),
                            _MADV_COLLAPSE) == 0:
                done += 1
    except Exception:
        pass
    return done


def gather_table(ds):
    """Materialize a (small, broadcast-side) Dataset into ONE pyarrow
    Table on the driver.  Robust to what plain
    ``pa.concat_tables(ray.get(ds.to_arrow_refs()))`` is not: Ray splits
    small reads into many blocks whose empty tails can carry a different
    schema (and parquet blocks carry pandas metadata), which makes the
    naive concat raise ``Schema at index N was different``."""
    import pyarrow as pa
    import ray

    tbls = [t.replace_schema_metadata(None)
            for t in ray.get(ds.to_arrow_refs())]
    nonempty = [t for t in tbls if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty)
    return tbls[0] if tbls else pa.table({})


def strip_meta(ds):
    """Drop schema-level metadata from every block (zero-copy).

    ``pa.Schema.__hash__`` raises ``unhashable type: 'dict'`` when the
    schema carries metadata (parquet reads attach pandas metadata), which
    makes Ray's ``unify_schemas`` fall through its set-based dedup with a
    ``Failed to hash the schemas`` warning on every hash-shuffle join.
    Benign upstream behavior, but stripping the metadata before a join
    silences it and restores the early-exit fast path.  A single residual
    warning can still fire INSIDE a ReadParquet operator (Ray unifies the
    raw fragment schemas before any downstream op runs) — that one is
    upstream-only and harmless (the code falls through to a full unify).
    """
    return ds.map_batches(lambda t: t.replace_schema_metadata(None),
                          batch_format="pyarrow", zero_copy_batch=True)


def write_committed(make_ds, out_dir: str) -> bool:
    """Resumable parquet write: skip if ``out_dir/_SUCCESS`` exists,
    clear partial output from a failed run, write, then commit the
    marker.  ``make_ds`` is a thunk so a skipped write costs nothing
    (the dataset is never built).  Returns True if written."""
    import os
    import shutil

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return False
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    make_ds().write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("")
    return True
