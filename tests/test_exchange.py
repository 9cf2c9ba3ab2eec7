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
