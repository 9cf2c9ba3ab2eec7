"""Driver-gate replica: every SQL-checked query in the registry must
match its DuckDB oracle exactly at sf0.001 (row count + columns +
order-insensitive values); rows-only queries must run and be non-trivially
shaped.  Mirrors scripts/check_oracle.py inside pytest.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# heavy engine queries are covered by their own oracle-kernel tests;
# keep the pytest gate fast by checking the SQL-checked set + a sample
# of rows-only ones.
ROWS_ONLY_SAMPLE = ["doc_minhash_pairs", "graph_comm_sizes"]


def _to_pandas(obj):
    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_sql_checked(ray_session, con, name):
    assert name in QUERIES, f"oracle {name} has no query"
    res = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    ora = _canon(con.sql(ORACLE_SQL[name]).df())
    assert list(res.columns) == list(ora.columns)
    assert len(res) == len(ora)
    pd.testing.assert_frame_equal(res, ora, check_dtype=False,
                                  check_exact=True)


@pytest.mark.parametrize("name", ROWS_ONLY_SAMPLE)
def test_rows_only_runs(ray_session, name):
    res = _to_pandas(QUERIES[name](SF_DIR))
    assert len(res) > 0
    assert len(res.columns) >= 2
