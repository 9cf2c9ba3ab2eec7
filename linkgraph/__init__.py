"""linkgraph — a from-scratch Ray-Data-native link-graph analytics engine.

Capabilities mirror ``ManulGoyal/dynamic-community-detection-gpu``
(delta-screening dynamic Louvain; see /root/reference, studied for
behavior only) extended per the project north rule with PageRank,
connected components, label propagation and triangle counting over an
edge table derived from Common-Crawl-style web pages.

Layout
------
- ``fixtures/``  deterministic synthetic inputs (pages table, ToyExample
  replica, random graphs) — pure functions of (seed, scale).
- ``oracle/``    single-process NumPy reference kernels pinning the exact
  semantics (synchronous bucketed Louvain with the reference's tie-breaks,
  delta screening, PageRank/CC/LPA/triangles). The engine must match these.
- ``sources/``   parquet readers/writers + schemas for the canonical tables.
- ``stages/``    map_batches stages (link extraction, URL normalization,
  dedup family, text analysis, similarity search, multimodal stubs).
- ``pipelines/`` Ray Data pipelines (pages -> links -> nodes -> edges).
- ``state/``     partitioned CSR actors + the distributed graph engine.
- ``functions/`` quality-function plugin surface (Modularity et al.).
"""

__version__ = "0.1.0"

# Warm-heap malloc tuning, once per process at import (drivers, shard
# actors, and every Ray task worker that unpickles a linkgraph function
# re-imports this package).  See common.tune_malloc for the measured
# 50-80x first-touch cliff this avoids on virtualized hosts; idempotent,
# no-op off glibc.  Opt-out via LINKGRAPH_MALLOC_TUNE=0 for long-lived
# host processes that merely import the package (disabling trim means
# freed large buffers are never returned to the OS for the process
# lifetime — fine for workers/drivers, surprising for a notebook).  The
# measured-win call sites (GraphShard.__init__, cached task bodies,
# GraphEngine.__init__) still call tune_malloc() unconditionally.
import os as _os

if _os.environ.get("LINKGRAPH_MALLOC_TUNE", "1") != "0":
    from .common import tune_malloc as _tune_malloc

    _tune_malloc()
    del _tune_malloc
del _os
