"""Local replica of the driver's correctness gate: run every
``queries()[name]`` and its ``oracle_sql()[name]`` side-by-side on an
sf dir and compare row-count + schema + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_arrow(obj):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(obj, rd.Dataset):
        from linkgraph.common import gather_table
        return gather_table(obj)
    if isinstance(obj, pa.Table):
        return obj
    return pa.Table.from_pandas(obj, preserve_index=False)


def type_mismatches(res_t, ora_t) -> list[str]:
    """Arrow-level column-type diffs engine vs oracle — the class of
    bug the driver's value hasher catches but a dtype-lax pandas
    compare hides (e.g. uncast SUM() -> decimal128 vs int64)."""
    res_types = {f.name: f.type for f in res_t.schema}
    ora_types = {f.name: f.type for f in ora_t.schema}
    out = []
    for name in sorted(set(res_types) & set(ora_types)):
        if res_types[name] != ora_types[name]:
            out.append(f"{name}: engine={res_types[name]} "
                       f"oracle={ora_types[name]}")
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_warn = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res_t = to_arrow(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        res = res_t.to_pandas()
        took = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(res)} rows, {took:.1f}s)")
            n_pass += 1
            continue
        try:
            ora_t = con.sql(oracles[name]).arrow()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            n_fail += 1
            continue
        ora = ora_t.to_pandas()
        for tm in type_mismatches(res_t, ora_t):
            print(f"WARN-TYPE {name}: {tm}")
            n_warn += 1
        a, b = canon(res), canon(ora)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(a)} rows, {took:.1f}s)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_warn} type warnings")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
