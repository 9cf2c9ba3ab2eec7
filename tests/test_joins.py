"""asof_join (stages/joins.py) vs a brute-force pandas oracle, plus the
sliding-window query's frame math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.stages.joins import asof_join


def _mkdata(seed: int, n_l: int = 2000, n_r: int = 1200, nk: int = 25):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "id": np.arange(n_l, dtype=np.int64),
        "k": rng.integers(0, nk, n_l).astype(np.int64),
        "t": rng.integers(0, 200, n_l).astype(np.int64)})
    right = pd.DataFrame({
        "rk": rng.integers(0, nk + 5, n_r).astype(np.int64),
        "rt": rng.integers(0, 200, n_r).astype(np.int64),  # dense: ties
        "tie": np.arange(n_r, dtype=np.int64),
        "val": rng.standard_normal(n_r)})
    return left, right


def _oracle(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Brute force: for each left row the (rt, tie)-max right row with
    rk == k and rt <= t."""
    j = left.merge(right, left_on="k", right_on="rk")
    j = j[j["rt"] <= j["t"]]
    j = j.sort_values(["id", "rt", "tie"]).groupby("id", as_index=False) \
         .last()
    return j[["id", "k", "t", "tie", "val"]].reset_index(drop=True)


@pytest.mark.parametrize("seed,parts", [(1, 1), (2, 4), (3, 9)])
def test_asof_inner_matches_oracle(ray_session, seed, parts):
    left, right = _mkdata(seed)
    out = asof_join(rd.from_pandas(left).repartition(5),
                    rd.from_pandas(right).repartition(3),
                    left_by="k", right_by="rk",
                    left_on="t", right_on="rt",
                    right_values=["tie", "val"], right_tie="tie",
                    how="inner", num_partitions=parts).to_pandas()
    got = (out[["id", "k", "t", "tie", "val"]]
           .sort_values("id").reset_index(drop=True))
    want = _oracle(left, right).astype(
        {c: np.int64 for c in ("id", "k", "t", "tie")})
    pd.testing.assert_frame_equal(got, want)


def test_asof_left_keeps_unmatched_as_null(ray_session):
    left, right = _mkdata(11)
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_by="k", right_by="rk",
                    left_on="t", right_on="rt",
                    right_values=["tie", "val"], right_tie="tie",
                    how="left", num_partitions=4).to_pandas()
    assert len(out) == len(left)
    matched = set(_oracle(left, right)["id"])
    nulls = set(out.loc[out["tie"].isna(), "id"])
    assert nulls == set(left["id"]) - matched


def test_asof_empty_right_inner_is_typed_empty(ray_session):
    left, _ = _mkdata(5, n_l=50)
    right = pd.DataFrame({"rk": pd.Series([], dtype=np.int64),
                          "rt": pd.Series([], dtype=np.int64),
                          "tie": pd.Series([], dtype=np.int64),
                          "val": pd.Series([], dtype=np.float64)})
    import ray

    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_by="k", right_by="rk",
                    left_on="t", right_on="rt",
                    right_values=["tie", "val"], right_tie="tie",
                    how="inner", num_partitions=3)
    # ray's to_pandas drops columns of an all-empty dataset; check the
    # emitted block: zero rows but the full output column set
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    assert sum(b.num_rows for b in blocks) == 0
    assert {"id", "k", "t", "tie", "val"} <= set(blocks[0].schema.names)


def test_asof_timestamp_on_key(ray_session):
    """Datetime on-keys compare by their epoch-us ticks."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    left = pd.DataFrame({
        "id": np.arange(4, dtype=np.int64),
        "k": np.zeros(4, np.int64),
        "t": base + np.array([0, 59, 60, 61]).astype("timedelta64[s]")})
    right = pd.DataFrame({
        "rk": np.zeros(2, np.int64),
        "rt": base + np.array([30, 60]).astype("timedelta64[s]"),
        "tie": np.array([10, 20], np.int64),
        "val": np.array([0.5, 0.7])})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_by="k", right_by="rk",
                    left_on="t", right_on="rt",
                    right_values=["tie", "val"], right_tie="tie",
                    how="inner", num_partitions=2).to_pandas()
    got = out.sort_values("id")["tie"].tolist()
    assert got == [10, 20, 20]  # t=0 has no match; 60/61 hit the 60s row


def test_asof_inner_keeps_matched_rows_with_null_value(ray_session):
    """A matched right row whose FIRST right value is null must survive
    an inner as-of join (match-ness comes from the sentinel, not from
    value null-ness)."""
    left = pd.DataFrame({"id": np.array([0], np.int64),
                         "k": np.array([1], np.int64),
                         "t": np.array([100], np.int64)})
    right = pd.DataFrame({"rk": np.array([1], np.int64),
                          "rt": np.array([50], np.int64),
                          "tie": np.array([7], np.int64),
                          "val": np.array([np.nan], np.float64)})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_by="k", right_by="rk",
                    left_on="t", right_on="rt",
                    right_values=["val", "tie"], right_tie="tie",
                    how="inner", num_partitions=2).to_pandas()
    assert len(out) == 1
    assert out["tie"].iloc[0] == 7 and bool(out["val"].isna().iloc[0])


def test_float_on_and_by_columns_rejected(ray_session):
    left, right = _mkdata(13, n_l=20, n_r=20)
    fleft = left.assign(t=left["t"].astype(np.float64))
    with pytest.raises(Exception, match="integer or timestamp"):
        asof_join(rd.from_pandas(fleft), rd.from_pandas(right),
                  left_by="k", right_by="rk", left_on="t", right_on="rt",
                  right_values=["tie"], right_tie="tie",
                  num_partitions=2).to_pandas()
    fkey = left.assign(k=left["k"].astype(np.float64))
    with pytest.raises(Exception, match="must be integer"):
        band_join(rd.from_pandas(fkey), rd.from_pandas(right),
                  left_by="k", right_by="rk", left_on="t", right_on="rt",
                  lo=-5, hi=5, left_values=["id"], right_values=["tie"],
                  num_partitions=2).to_pandas()


def test_asof_name_clash_rejected(ray_session):
    left, right = _mkdata(7, n_l=10, n_r=10)
    right = right.rename(columns={"val": "t"})  # clashes with left "t"
    with pytest.raises(ValueError, match="clash"):
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  left_by="k", right_by="rk", left_on="t", right_on="rt",
                  right_values=["t"], right_tie="tie")


from linkgraph.stages.joins import band_join


def _band_oracle(left, right, lo, hi):
    j = left.merge(right, left_on="k", right_on="rk")
    j = j[(j["rt"] >= j["t"] + lo) & (j["rt"] <= j["t"] + hi)]
    return (j[["id", "tie"]].sort_values(["id", "tie"])
            .reset_index(drop=True))


@pytest.mark.parametrize("seed,parts,lo,hi",
                         [(1, 1, -10, 0), (2, 4, -5, 5), (3, 8, 3, 40)])
def test_band_join_matches_oracle(ray_session, seed, parts, lo, hi):
    left, right = _mkdata(seed, n_l=800, n_r=500)
    out = band_join(rd.from_pandas(left).repartition(4),
                    rd.from_pandas(right).repartition(3),
                    left_by="k", right_by="rk",
                    left_on="t", right_on="rt", lo=lo, hi=hi,
                    left_values=["id"], right_values=["tie"],
                    num_partitions=parts).to_pandas()
    got = out.sort_values(["id", "tie"]).reset_index(drop=True)
    want = _band_oracle(left, right, lo, hi)
    pd.testing.assert_frame_equal(got, want)


def test_band_join_empty_window(ray_session):
    left, right = _mkdata(9, n_l=100, n_r=80)
    right["rt"] += 10_000  # every right on-value far above the band
    out = band_join(rd.from_pandas(left), rd.from_pandas(right),
                    left_by="k", right_by="rk",
                    left_on="t", right_on="rt", lo=-50, hi=50,
                    left_values=["id"], right_values=["tie"],
                    num_partitions=3).to_pandas()
    assert len(out) == 0


def test_sliding_window_matches_duckdb(ray_session):
    import duckdb

    from linkgraph.queries.events import EVENTS_SQL, q_sliding_window

    sf = "/root/testdata/sf0.001"
    got = (q_sliding_window(sf).to_pandas()
           .sort_values(["event_type", "hour"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf}/events.parquet')")
    want = (con.execute(EVENTS_SQL["ev_sliding_window"]).df()
            .sort_values(["event_type", "hour"]).reset_index(drop=True))
    got["hour"] = got["hour"].astype("datetime64[us]")
    want["hour"] = want["hour"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_asof_rejects_reserved_and_mismatched_keys(ray_session):
    """Reserved scratch names (__on/__m) and by-key dtype mismatches
    must fail loudly up front, not deep inside the reduce (r5 review)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    left = pd.DataFrame({"k": np.arange(4), "t": np.arange(4),
                         "__on": np.arange(4)})
    right = pd.DataFrame({"rk": np.arange(4), "rt": np.arange(4),
                          "val": np.arange(4.0)})
    with pytest.raises(ValueError, match="reserved"):
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  left_by="k", right_by="rk", left_on="t", right_on="rt",
                  right_values=["val"], num_partitions=2)
    left2 = pd.DataFrame({"k": np.arange(4, dtype=np.int32),
                          "t": np.arange(4)})
    with pytest.raises(ValueError, match="dtypes differ"):
        asof_join(rd.from_pandas(left2), rd.from_pandas(right),
                  left_by="k", right_by="rk", left_on="t", right_on="rt",
                  right_values=["val"], num_partitions=2)
