"""Mergeable sketch kernels: HyperLogLog cardinality registers and a
count-min frequency sketch.

[north rule] the "novel sketch" operator family for 100 TB streams:
each sketch is computed as per-block partial registers (dense numpy
max / bincount over the block — output O(groups x registers) rows
regardless of block size) merged by one tiny grouped reduction, the
canonical mergeable-sketch pattern (registers combine associatively, so
raw keys never cross the wire).  Register values are integer-exact
deterministic functions of the keys (splitmix64), so the register
TABLES themselves are value-checked against mod-2^64 DuckDB mirrors
(queries/sketches.py); the float estimators below are driver-side
functions of the registers, accuracy-tested in tests/test_sketch.py.
"""

from __future__ import annotations

import numpy as np

from ..text.ops import _splitmix64

HLL_B = 8        # 2^8 = 256 registers -> ~6.5% relative error
CMS_D = 4        # count-min depth: four disjoint 16-bit hash slices
CMS_W = 1024     # count-min width (<= 2^16 so the slices cover it)

_U64 = np.uint64


def _msb_pos(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) for uint64 x > 0, EXACT at full 64-bit width
    (float log2 drops bits above 2^53): six vectorized halvings."""
    x = x.copy()
    n = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        hi = x >> _U64(s)
        use = hi != 0
        n[use] += s
        x[use] = hi[use]
    return n


def _hash_keys(keys: np.ndarray) -> np.ndarray:
    return _splitmix64(np.ascontiguousarray(keys, np.int64).view(_U64))


def hll_rho(keys: np.ndarray, b: int = HLL_B
            ) -> tuple[np.ndarray, np.ndarray]:
    """Per-key HLL observation: bucket = top ``b`` hash bits, rho =
    1-based position of the first set bit of the remaining ``64-b``
    bits (``64-b+1`` when they are all zero)."""
    h = _hash_keys(keys)
    width = 64 - b
    bucket = (h >> _U64(width)).astype(np.int64)
    suffix = h & ((_U64(1) << _U64(width)) - _U64(1))
    rho = np.full(len(h), width + 1, np.int64)
    nz = suffix != 0
    rho[nz] = width - _msb_pos(suffix[nz])
    return bucket, rho


def hll_partial_registers(keys: np.ndarray, group_codes: np.ndarray,
                          n_groups: int, b: int = HLL_B) -> np.ndarray:
    """Dense (n_groups, 2^b) max-rho register block for one batch."""
    bucket, rho = hll_rho(keys, b)
    m = 1 << b
    regs = np.zeros(n_groups * m, np.int64)
    np.maximum.at(regs, group_codes * m + bucket, rho)
    return regs.reshape(n_groups, m)


def hll_estimate(bucket: np.ndarray, max_rho: np.ndarray,
                 b: int = HLL_B) -> float:
    """Standard bias-corrected HLL estimate from sparse registers
    (Flajolet et al. 2007 alpha_m, linear counting below 2.5m)."""
    m = 1 << b
    regs = np.zeros(m, np.float64)
    regs[np.asarray(bucket, np.int64)] = np.asarray(max_rho, np.float64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    if est <= 2.5 * m:
        zeros = int(np.sum(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def cms_buckets(keys: np.ndarray, d: int = CMS_D, w: int = CMS_W
                ) -> np.ndarray:
    """(n, d) count-min bucket matrix: depth ``i`` uses the i-th
    disjoint 16-bit slice of ONE splitmix64 hash, mod ``w`` — one hash
    evaluation per key, and a trivial exact SQL mirror."""
    # each depth consumes a disjoint 16-bit slice of one 64-bit hash:
    # d > 4 would shift by >= 64 (numpy UB -> correlated garbage rows)
    # and w > 2^16 can't be addressed by a 16-bit slice
    assert d * 16 <= 64, f"cms_buckets: d={d} needs {d * 16} hash bits > 64"
    assert w <= 2**16, f"cms_buckets: w={w} exceeds the 16-bit slice range"
    h = _hash_keys(keys)
    cols = [(((h >> _U64(16 * i)) & _U64(0xFFFF)).astype(np.int64) % w)
            for i in range(d)]
    return np.stack(cols, axis=1)


def cms_partial_registers(keys: np.ndarray, d: int = CMS_D,
                          w: int = CMS_W) -> np.ndarray:
    """Dense (d, w) count registers for one batch (one bincount)."""
    b = cms_buckets(keys, d, w)
    flat = (np.arange(d, dtype=np.int64)[None, :] * w + b).reshape(-1)
    return np.bincount(flat, minlength=d * w).reshape(d, w)


def cms_query(depth: np.ndarray, bucket: np.ndarray, cnt: np.ndarray,
              keys: np.ndarray, d: int = CMS_D, w: int = CMS_W
              ) -> np.ndarray:
    """Point frequency estimates (min over depths) — always >= truth."""
    regs = np.zeros((d, w), np.int64)
    regs[np.asarray(depth, np.int64), np.asarray(bucket, np.int64)] = \
        np.asarray(cnt, np.int64)
    b = cms_buckets(np.ascontiguousarray(keys, np.int64), d, w)
    return regs[np.arange(d)[None, :], b].min(axis=1)
