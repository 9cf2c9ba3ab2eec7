"""Parity tests for the round-5 events operators."""
import numpy as np
import pandas as pd
import pyarrow as pa


def test_retention_matches_pandas(ray_session):
    import ray.data as rd

    from linkgraph.queries.events import q_retention  # noqa: F401
    from linkgraph.queries import events as ev

    rng = np.random.default_rng(9)
    n = 5000
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 72 * 3600, n) * np.timedelta64(1_000_000, "us"))
    df = pd.DataFrame({"user_id": rng.integers(0, 40, n), "ts": ts})
    tmp = "/tmp/ret_events"
    import os
    import pyarrow.parquet as pq
    os.makedirs(tmp, exist_ok=True)
    tbl = pa.table({"user_id": pa.array(df.user_id, pa.int64()),
                    "ts": pa.array(df.ts, pa.timestamp("us")),
                    "event_id": pa.array(np.arange(n, dtype=np.int64)),
                    "event_type": pa.array(["x"] * n),
                    "value": pa.array(np.zeros(n))})
    pq.write_table(tbl, f"{tmp}/events.parquet")
    out = ev.q_retention(tmp).to_pandas().sort_values("hour") \
        .reset_index(drop=True)

    hu = df.assign(hour=df.ts.dt.floor("h"))[["user_id", "hour"]] \
        .drop_duplicates()
    nxt = hu.assign(hour=hu.hour - pd.Timedelta(hours=1))
    j = hu.merge(nxt, on=["user_id", "hour"], how="left", indicator=True)
    exp = (j.groupby("hour").agg(
        n_active=("user_id", "size"),
        n_retained=("_merge", lambda s: (s == "both").sum()))
        .reset_index().sort_values("hour").reset_index(drop=True))
    assert out["hour"].tolist() == exp["hour"].tolist()
    assert out["n_active"].tolist() == exp["n_active"].tolist()
    assert out["n_retained"].tolist() == exp["n_retained"].tolist()
