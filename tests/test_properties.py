"""Property-based tests (hypothesis) for the exchange primitives —
random keys / values / block splits / partition counts must always
agree with the pandas reference semantics.

Kept deliberately small (max_examples) so the suite stays fast; the
value is the input-shape coverage (duplicate keys, negative values,
NaN, single-row, all-one-group), not volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _ds_of(df: pd.DataFrame, blocks: int):
    import ray.data as rd
    return rd.from_pandas(df).repartition(blocks)


@st.composite
def _grouped_frames(draw):
    n = draw(st.integers(1, 300))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    nkeys = draw(st.integers(1, 12))
    df = pd.DataFrame({
        "k": rng.integers(-5, nkeys, n),
        "x": rng.integers(-1000, 1000, n),
    })
    return df, draw(st.integers(1, 5)), draw(st.integers(1, 7))


@given(_grouped_frames())
@settings(**_SETTINGS)
def test_grouped_exchange_matches_pandas_property(ray_session, data):
    from linkgraph.stages.exchange import grouped_exchange
    df, blocks, P = data
    out = grouped_exchange(_ds_of(df, blocks), ["k"],
                           [("count", "", "n"), ("sum", "x", "s"),
                            ("min", "x", "mn"), ("max", "x", "mx")],
                           num_partitions=P).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = (df.groupby("k", as_index=False)
           .agg(n=("x", "size"), s=("x", "sum"),
                mn=("x", "min"), mx=("x", "max"))
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


@st.composite
def _topk_frames(draw):
    n = draw(st.integers(1, 200))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    v = rng.integers(-50, 50, n).astype(np.float64)
    nan_at = rng.random(n) < draw(st.floats(0, 0.3))
    v[nan_at] = np.nan
    df = pd.DataFrame({
        "g": rng.integers(0, 8, n),
        "v": v,
        "tie": np.arange(n, dtype=np.int64),
    })
    return df, draw(st.integers(1, 4)), draw(st.integers(1, 4)), \
        draw(st.integers(1, 6))


@given(_topk_frames())
@settings(**_SETTINGS)
def test_grouped_topk_matches_pandas_property(ray_session, data):
    from linkgraph.stages.exchange import grouped_topk
    df, blocks, P, k = data
    out = grouped_topk(_ds_of(df, blocks), "g", "v", "tie", k,
                       num_partitions=P).to_pandas()
    exp = (df.sort_values(["g", "v", "tie"],
                          ascending=[True, False, True])
           .groupby("g").head(k))
    got = out.sort_values(["g", "tie"]).reset_index(drop=True)
    want = exp.sort_values(["g", "tie"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@st.composite
def _scan_frames(draw):
    n = draw(st.integers(1, 300))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    order = rng.permutation(n).astype(np.int64)     # unique order keys
    df = pd.DataFrame({"o": order,
                       "v": rng.integers(0, 100, n).astype(np.int64)})
    return df, draw(st.integers(1, 5)), draw(st.integers(1, 6))


@given(_scan_frames())
@settings(**_SETTINGS)
def test_ordered_prefix_scan_property(ray_session, data):
    from linkgraph.stages.scan import ordered_prefix_scan
    df, blocks, P = data
    out = ordered_prefix_scan(_ds_of(df, blocks), "o", "v",
                              num_partitions=P).to_pandas() \
        .sort_values("o").reset_index(drop=True)
    exp = df.sort_values("o").reset_index(drop=True)
    exp["prefix"] = exp["v"].cumsum().shift(fill_value=0)
    assert out["o"].tolist() == exp["o"].tolist()
    assert out["prefix"].tolist() == exp["prefix"].tolist()


@st.composite
def _kpx_frames(draw):
    n = draw(st.integers(1, 200))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    df = pd.DataFrame({"k": rng.integers(0, 9, n),
                       "x": rng.integers(0, 1000, n)})
    return df, draw(st.integers(1, 4)), draw(st.integers(1, 16))


@given(_kpx_frames())
@settings(**_SETTINGS)
def test_keyed_partition_exchange_groups_whole_property(ray_session, data):
    """Every key group must arrive WHOLE in exactly one partition (the
    contract per-partition reducers rely on), for any blocks/P."""
    from linkgraph.stages.exchange import keyed_partition_exchange
    df, blocks, P = data

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        k = t.column("k").to_numpy()
        x = t.column("x").to_numpy()
        uk, inv = np.unique(k, return_inverse=True)
        return pa.table({
            "k": pa.array(uk, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=x).astype(np.int64)),
        })

    out = keyed_partition_exchange(_ds_of(df, blocks), ["k"], fn,
                                   num_partitions=P).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = (df.groupby("k", as_index=False)
           .agg(n=("x", "size"), s=("x", "sum"))
           .sort_values("k").reset_index(drop=True))
    # if a group were split across partitions, it would appear twice
    assert out["k"].is_unique
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
