"""Driver-facing query registry: every implemented operator/pipeline from
SURVEY.md §2 exposed as a ``name -> callable(sf_dir)`` entry plus (where
SQL-expressible) a DuckDB oracle string over the same parquet tables.

Modules:
- :mod:`graphs` — edge-table operators + the distributed graph algorithms
  over a deterministic graph derived from ``lineitem``.
- :mod:`text`   — training-data text ops over ``documents`` (dedup,
  token stats, quality, language id, fingerprints, MinHash/SimHash).
- :mod:`embed`  — similarity search over ``embeddings`` (brute-force
  cosine top-k, near-dup pairs, IVF scale path).
- :mod:`events` — windowed / sessionized aggregates over ``events`` and
  the dynamic-graph delta pipeline.
"""

from .registry import ORACLE_SQL, QUERIES  # noqa: F401
