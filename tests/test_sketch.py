"""HLL / count-min sketch kernels: exactness of the register math,
merge associativity across block splits, and estimator accuracy."""

import numpy as np
import pyarrow as pa
import pytest

from linkgraph.functions.sketch import (CMS_D, CMS_W, HLL_B, _msb_pos,
                                        cms_buckets, cms_partial_registers,
                                        cms_query, hll_estimate,
                                        hll_partial_registers, hll_rho)
from linkgraph.text.ops import _splitmix64


def test_msb_pos_exact():
    xs = np.array([1, 2, 3, 255, 256, (1 << 52) - 1, 1 << 52,
                   (1 << 63) - 1, 1 << 63, (1 << 64) - 1],
                  dtype=np.uint64)
    got = _msb_pos(xs)
    want = np.array([int(x).bit_length() - 1 for x in xs])
    assert np.array_equal(got, want)


def test_hll_rho_matches_python_bitops():
    keys = np.arange(1000, dtype=np.int64) * 7919 + 3
    bucket, rho = hll_rho(keys)
    h = _splitmix64(keys.view(np.uint64))
    for i in (0, 1, 17, 500, 999):
        hi = int(h[i])
        assert bucket[i] == hi >> (64 - HLL_B)
        suffix = hi & ((1 << (64 - HLL_B)) - 1)
        want = (64 - HLL_B) + 1 if suffix == 0 \
            else (64 - HLL_B) - (suffix.bit_length() - 1)
        assert rho[i] == want


def test_hll_partial_merge_associative():
    """Registers from split blocks, max-merged, == one-pass registers."""
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 5000, size=20000).astype(np.int64)
    groups = rng.randint(0, 3, size=20000).astype(np.int64)
    whole = hll_partial_registers(keys, groups, 3)
    merged = np.zeros_like(whole)
    for lo in range(0, 20000, 1700):
        part = hll_partial_registers(keys[lo:lo + 1700],
                                     groups[lo:lo + 1700], 3)
        np.maximum(merged, part, out=merged)
    assert np.array_equal(whole, merged)


def test_hll_estimate_accuracy():
    """B=8 -> ~6.5% stderr; deterministic keys, assert within 20%."""
    for true_n in (300, 5000, 120000):
        keys = np.arange(true_n, dtype=np.int64) * 1000003 + 17
        regs = hll_partial_registers(keys, np.zeros(true_n, np.int64), 1)[0]
        nz = np.nonzero(regs)[0]
        est = hll_estimate(nz, regs[nz])
        assert abs(est - true_n) / true_n < 0.20, (true_n, est)


def test_cms_registers_and_query():
    rng = np.random.RandomState(11)
    # Zipf-ish stream: key k appears ~ 3000/(k+1) times
    keys = np.repeat(np.arange(50, dtype=np.int64),
                     (3000 / (np.arange(50) + 1)).astype(int))
    rng.shuffle(keys)
    whole = cms_partial_registers(keys)
    assert whole.sum() == len(keys) * CMS_D
    # merge across splits == one pass (sum-mergeable)
    merged = np.zeros_like(whole)
    for lo in range(0, len(keys), 997):
        merged += cms_partial_registers(keys[lo:lo + 997])
    assert np.array_equal(whole, merged)
    # point queries: never undercount; exact for the heavy hitters here
    di, wi = np.nonzero(whole)
    qk = np.arange(50, dtype=np.int64)
    est = cms_query(di, wi, whole[di, wi], qk)
    true = np.array([(keys == k).sum() for k in qk])
    assert (est >= true).all()
    assert est[0] == true[0]          # 3000-count head key: no collision
    assert (est - true).max() <= len(keys) // CMS_W + 64  # CMS bound-ish


def test_cms_buckets_slices_disjoint():
    keys = np.array([123456789], dtype=np.int64)
    h = int(_splitmix64(keys.view(np.uint64))[0])
    b = cms_buckets(keys)[0]
    for i in range(CMS_D):
        assert b[i] == ((h >> (16 * i)) & 0xFFFF) % CMS_W


@pytest.mark.usefixtures("ray_session")
def test_hll_gate_blocks_invariant(tmp_path):
    """The distributed gate result is identical at 1 block and 8 blocks
    (register merge is associative+commutative)."""
    import pyarrow.parquet as pq

    import ray.data as rd
    from linkgraph.queries.events import q_cms_users, q_hll_users

    rng = np.random.RandomState(3)
    n = 5000
    tbl = pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pa.array(np.arange(n, dtype=np.int64),
                       pa.timestamp("us")),
        "user_id": rng.randint(0, 700, n).astype(np.int64),
        "event_type": pa.array(np.array(["a", "b", "c"])[
            rng.randint(0, 3, n)]),
        "value": rng.rand(n),
        "props": pa.array([""] * n),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/events.parquet", row_group_size=650)

    hll = q_hll_users(sf).to_pandas().sort_values(
        ["event_type", "bucket"]).reset_index(drop=True)
    cms = q_cms_users(sf).to_pandas().sort_values(
        ["depth", "bucket"]).reset_index(drop=True)

    # oracle: single-pass registers straight off the table
    et = tbl.column("event_type").to_pandas().to_numpy()
    uids = tbl.column("user_id").to_numpy()
    rows = []
    for g in ("a", "b", "c"):
        regs = hll_partial_registers(uids[et == g],
                                     np.zeros((et == g).sum(), np.int64),
                                     1)[0]
        for bkt in np.nonzero(regs)[0]:
            rows.append((g, int(bkt), int(regs[bkt])))
    import pandas as pd
    want = pd.DataFrame(rows, columns=["event_type", "bucket", "max_rho"])
    pd.testing.assert_frame_equal(
        hll.astype({"bucket": np.int64, "max_rho": np.int64}), want)

    whole = cms_partial_registers(uids)
    di, wi = np.nonzero(whole)
    want2 = pd.DataFrame({"depth": di.astype(np.int64),
                          "bucket": wi.astype(np.int64),
                          "cnt": whole[di, wi].astype(np.int64)})
    pd.testing.assert_frame_equal(
        cms.astype({"depth": np.int64, "bucket": np.int64,
                    "cnt": np.int64}), want2)


@pytest.mark.usefixtures("ray_session")
def test_funnel_matches_bruteforce(tmp_path):
    """q_funnel == per-user brute-force chained conditional mins."""
    import pyarrow.parquet as pq

    from linkgraph.queries.events import FUNNEL_STEPS, q_funnel

    rng = np.random.RandomState(9)
    n = 4000
    types = np.array(["view", "click", "purchase", "error"])
    tbl = pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pa.array(rng.randint(0, 10_000_000, n).astype(np.int64),
                       pa.timestamp("us")),
        "user_id": rng.randint(0, 300, n).astype(np.int64),
        "event_type": pa.array(types[rng.randint(0, 4, n)]),
        "value": rng.rand(n),
        "props": pa.array([""] * n),
    })
    pq.write_table(tbl, f"{tmp_path}/events.parquet", row_group_size=777)

    got = q_funnel(str(tmp_path)).to_pandas().sort_values(
        "user_id").reset_index(drop=True)

    uid = tbl.column("user_id").to_numpy()
    ts = tbl.column("ts").to_numpy().view(np.int64)
    et = tbl.column("event_type").to_pandas().to_numpy()
    rows = []
    for u in np.unique(uid):
        m = uid == u
        prev, stage = -np.inf, 0
        for step in FUNNEL_STEPS:
            c = ts[m & (et == step)]
            c = c[c > prev]
            if len(c) == 0:
                break
            prev = c.min()
            stage += 1
        if stage:
            rows.append((int(u), stage))
    import pandas as pd
    want = pd.DataFrame(rows, columns=["user_id", "stage"])
    pd.testing.assert_frame_equal(
        got.astype({"user_id": np.int64, "stage": np.int64}), want)
    # ties in ts between consecutive steps must NOT count (strict >)
    assert (got["stage"] >= 1).all() and (got["stage"] <= 3).all()
