"""Small shared Dataset utilities."""

from __future__ import annotations


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
