"""grouped_exchange must agree with a pandas groupby for every op."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from linkgraph.stages.exchange import grouped_exchange


def _make_ds(n=20_000, seed=7, blocks=9):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "a": rng.integers(0, 500, n),
        "b": rng.integers(0, 7, n),
        "x": rng.integers(-100, 100, n),
        "f": rng.choice([0.5, 1.0, 2.25], n),
    })
    return rd.from_pandas(df).repartition(blocks), df


@pytest.mark.parametrize("P", [1, 5])
def test_exchange_matches_pandas_all_ops(ray_session, P):
    ds, df = _make_ds()
    out = grouped_exchange(
        ds, ["a", "b"],
        [("count", "", "n"), ("sum", "x", "sx"),
         ("max", "x", "mx"), ("min", "f", "mf")],
        num_partitions=P,
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    exp = (df.groupby(["a", "b"], as_index=False)
           .agg(n=("x", "size"), sx=("x", "sum"),
                mx=("x", "max"), mf=("f", "min"))
           .sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_exchange_float_key_and_pre_post(ray_session):
    ds, df = _make_ds(seed=11)

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"f": t.column("f"),
                         "x": t.column("x")})

    def post(t: pa.Table) -> pa.Table:
        return t.rename_columns(["key", "total"])

    out = grouped_exchange(ds, ["f"], [("sum", "x", "sx")],
                           pre=pre, post=post, num_partitions=3)
    got = out.to_pandas().sort_values("key").reset_index(drop=True)
    exp = (df.groupby("f", as_index=False)["x"].sum()
           .rename(columns={"f": "key", "x": "total"})
           .sort_values("key").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_exchange_empty_blocks(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"a": [1, 1, 2], "x": [1.0, 2.0, 3.0]})
    ds = rd.from_pandas(df).repartition(8)  # most blocks empty
    out = grouped_exchange(ds, ["a"], [("count", "", "n"),
                                       ("sum", "x", "s")],
                           num_partitions=4).to_pandas()
    out = out.sort_values("a").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1]
    assert out["s"].tolist() == [3.0, 3.0]


def test_topk_desc_rank_uint64_and_nan(ray_session):
    """_topk_table's descending order must not negate the value column:
    uint64 would wrap and NaN would rank first (ADVICE r4) — the dense
    desc-rank key has neither failure mode and keeps tie-break intact."""
    import ray.data as rd

    from linkgraph.stages.exchange import _topk_table, grouped_topk

    t = pa.table({
        "g": pa.array([0, 0, 0, 0], pa.int64()),
        "v": pa.array([2**63 + 5, 1, 2**64 - 1, 0], pa.uint64()),
        "tie": pa.array([1, 2, 3, 4], pa.int64()),
    })
    got = _topk_table(t, "g", "v", "tie", 2)
    assert got.column("v").to_pylist() == [2**64 - 1, 2**63 + 5]

    tf = pa.table({
        "g": pa.array([0] * 5, pa.int64()),
        "v": pa.array([float("nan"), 3.0, 1.0, 3.0, 2.0], pa.float64()),
        "tie": pa.array([9, 7, 3, 2, 1], pa.int64()),
    })
    got = _topk_table(tf, "g", "v", "tie", 3)
    # NaN last; equal values broken by tie asc
    assert got.column("tie").to_pylist() == [2, 7, 1]

    big = pd.DataFrame({
        "g": np.repeat(np.arange(20), 50),
        "v": np.tile(np.arange(50, dtype=np.int64) - 25, 20),
        "tie": np.arange(1000, dtype=np.int64),
    })
    out = grouped_topk(rd.from_pandas(big).repartition(7),
                       "g", "v", "tie", 3).to_pandas()
    exp = (big.sort_values(["g", "v", "tie"],
                           ascending=[True, False, True])
           .groupby("g").head(3))
    assert len(out) == len(exp)
    m = out.sort_values(["g", "v", "tie"],
                        ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        m, exp.reset_index(drop=True), check_dtype=False)


def test_keyed_partition_exchange_empty_partition(ray_session):
    """A hash partition that receives no key groups must reach fn as a
    typed zero-row table without crashing the reducer (ADVICE r4:
    count_sessions IndexError)."""
    import ray.data as rd

    from linkgraph.queries.events import q_sessions  # noqa: F401  (guard lives there)
    from linkgraph.stages.exchange import keyed_partition_exchange

    df = pd.DataFrame({"k": [1, 1, 2], "x": [1.0, 2.0, 3.0]})

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        k = t.column("k").to_numpy()
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    out = keyed_partition_exchange(rd.from_pandas(df), ["k"], fn,
                                   num_partitions=16).to_pandas()
    assert sorted(out["k"]) == [1, 2]
