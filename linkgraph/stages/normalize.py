"""URL normalizer (E13, [north-rule]) — vectorized ``map_batches`` pure
function: lowercase scheme+host, strip fragment, drop trailing slash on
empty paths.  Deterministic; documented in FIXTURES.md.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_url_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized normalization with pyarrow.compute kernels.

    Steps: strip '#fragment'; lowercase the scheme://host prefix (the part
    before the first '/' after '://'); remove a single trailing '/'.
    """
    # strip fragment
    arr = pc.replace_substring_regex(arr, pattern=r"#.*$", replacement="")
    # lowercase scheme+authority: capture '<scheme>://<host>' and lowercase it.
    # pyarrow has no per-match callable; split once instead.
    split = pc.split_pattern(arr, "://", max_splits=1)
    scheme = pc.list_element(split, 0)
    rest = pc.list_element(split, 1)
    rest_split = pc.split_pattern(rest, "/", max_splits=1)
    host = pc.list_element(rest_split, 0)
    # path may be missing -> null; coalesce to ""
    path = pc.list_element(rest_split, 1)
    path = pc.coalesce(path, pa.scalar("", type=arr.type if isinstance(arr, pa.Array) else pa.string()))
    norm_prefix = pc.binary_join_element_wise(
        pc.utf8_lower(scheme), pc.utf8_lower(host), "://")
    joined = pc.binary_join_element_wise(norm_prefix, path, "/")
    # remove trailing slash (also covers the path-less case "host/")
    joined = pc.replace_substring_regex(joined, pattern=r"/$", replacement="")
    return joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined


def normalize_links(batch: pa.Table) -> pa.Table:
    """map_batches body for the links table."""
    return pa.table({
        "src_url": normalize_url_array(batch.column("src_url")),
        "dst_url": normalize_url_array(batch.column("dst_url")),
    })
