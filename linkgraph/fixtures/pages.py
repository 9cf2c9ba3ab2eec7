"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md F1).

Schema (BASELINE.json ``input_hint``):
    url:string, warc_ts:timestamp[us], html:binary, text:large_string,
    lang:string

Every column is a pure function of ``(seed, row_index)`` so that the
"byte-identical extracted text per url" invariant is checkable no matter
how rows are batched or which worker generates them.  The planted link
graph has Zipf out-degrees (skew is real), host-block communities (90% of
links stay within the page's host) and a sprinkling of hub pages with
degree >> mean, so Louvain/LPA find structure and high-degree handling is
exercised.

The generator is exposed two ways:
- :func:`make_pages_table` — build a ``pyarrow.Table`` in-process (tests).
- :class:`PageBatchGenerator` — a vectorized ``map_batches`` callable over
  a ``ray.data.range(n)`` dataset (bench-scale generation, parallel).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)

EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer; x is uint64 ndarray (wraps mod 2^64)."""
    x = (x + _GOLDEN) & _MASK
    x = ((x ^ (x >> _U64(30))) * _MIX1) & _MASK
    x = ((x ^ (x >> _U64(27))) * _MIX2) & _MASK
    return x ^ (x >> _U64(31))


# 256-word vocabulary built from syllables: deterministic, contains no
# '<', '>', '&' or quotes so html embedding / extraction is unambiguous.
_SYL = ["ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
        "na", "pe", "qi", "ro", "su", "ta"]
VOCAB = np.array([_SYL[i] + _SYL[j] + _SYL[(i * 5 + j * 3) % 16]
                  for i in range(16) for j in range(16)], dtype=object)
_VOCAB_N = _U64(len(VOCAB))


@dataclass(frozen=True)
class PagesConfig:
    n_pages: int
    n_hosts: int
    seed: int = 42
    zipf_cap: int = 30
    hub_every: int = 1000      # rows with row % hub_every == 7 are hubs
    hub_degree: int = 300
    min_words: int = 30
    word_mod: int = 271        # n_words = min_words + s % word_mod

    @property
    def pages_per_host(self) -> int:
        return max(1, self.n_pages // self.n_hosts)


def tiny_config(seed: int = 42) -> PagesConfig:
    return PagesConfig(n_pages=200, n_hosts=8, seed=seed, hub_every=50,
                       hub_degree=40)


def small_config(seed: int = 42) -> PagesConfig:
    return PagesConfig(n_pages=20_000, n_hosts=100, seed=seed)


def bench_config(n_pages: int = 500_000, seed: int = 42) -> PagesConfig:
    return PagesConfig(n_pages=n_pages, n_hosts=max(1, n_pages // 5_000),
                       seed=seed)


def _row_seed(cfg: PagesConfig, rows: np.ndarray) -> np.ndarray:
    return splitmix64(_U64(cfg.seed) ^ splitmix64(rows.astype(_U64) + _U64(1)))


def host_of(cfg: PagesConfig, rows: np.ndarray) -> np.ndarray:
    """Host index per row; pages are laid out host-major."""
    pph = cfg.pages_per_host
    return np.minimum(rows // pph, cfg.n_hosts - 1)


def url_of(cfg: PagesConfig, rows: np.ndarray) -> list[str]:
    pph = cfg.pages_per_host
    hosts = host_of(cfg, rows)
    k = rows - hosts * pph  # page index within host (host-major layout)
    return [f"https://site{h}.example/p/{kk}" for h, kk in zip(hosts, k)]


def out_links(cfg: PagesConfig, rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Planted out-links for each row.

    Returns (row_rep, dst_row): parallel arrays of source row index and
    destination row index; per-row the dst list is deduped, ascending and
    excludes self.  Pure function of (seed, row).
    """
    n = cfg.n_pages
    seeds = _row_seed(cfg, rows)
    # Zipf(s=2)-ish out-degree: P(d >= k) ~ 1/k, capped.
    u = (splitmix64(seeds ^ _U64(0x11)) >> _U64(11)).astype(np.float64) / float(1 << 53)
    deg = np.minimum(cfg.zipf_cap, np.maximum(1, (1.0 / np.maximum(u, 1e-12)).astype(np.int64)))
    hub = (rows % cfg.hub_every) == 7
    deg = np.where(hub, min(cfg.hub_degree, n - 1), deg)

    offsets = np.concatenate([[0], np.cumsum(deg)])
    total = int(offsets[-1])
    row_rep = np.repeat(rows, deg)
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], deg)
    seed_rep = np.repeat(seeds, deg)
    r1 = splitmix64(seed_rep ^ splitmix64(_U64(0xABCD) + j.astype(_U64) * _U64(2)))
    r2 = splitmix64(seed_rep ^ splitmix64(_U64(0xABCD) + j.astype(_U64) * _U64(2) + _U64(1)))

    pph = cfg.pages_per_host
    hosts = host_of(cfg, row_rep)
    host_start = hosts * pph
    host_size = np.where(hosts == cfg.n_hosts - 1, n - host_start, pph)
    within = (r1 % _U64(10)) < _U64(9)
    dst = np.where(within,
                   host_start + (r2 % host_size.astype(_U64)).astype(np.int64),
                   (r2 % _U64(n)).astype(np.int64))

    keep = dst != row_rep
    row_rep, dst = row_rep[keep], dst[keep]
    # dedup (row, dst) and sort dst ascending within row
    key = row_rep * np.int64(n) + dst
    key = np.unique(key)
    return key // n, key % n


def text_of(cfg: PagesConfig, rows: np.ndarray) -> list[str]:
    """Deterministic pseudo-sentence text per row (~200-2000 bytes)."""
    seeds = _row_seed(cfg, rows)
    n_words = cfg.min_words + (splitmix64(seeds ^ _U64(0x77)) % _U64(cfg.word_mod)).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_words)])
    total = int(offsets[-1])
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_words)
    seed_rep = np.repeat(seeds, n_words)
    wid = splitmix64(seed_rep ^ splitmix64(j.astype(_U64) + _U64(3))) % _VOCAB_N
    words = VOCAB[wid.astype(np.int64)]
    out = []
    for a, b in zip(offsets[:-1], offsets[1:]):
        out.append(" ".join(words[a:b]))
    return out


def lang_of(rows: np.ndarray) -> list[str]:
    """'en' for 95% of rows, round-robin de/fr/es otherwise (by row index)."""
    other = ["de", "fr", "es"]
    return ["en" if r % 20 != 13 else other[(r // 20) % 3] for r in rows]


def html_of(cfg: PagesConfig, rows: np.ndarray) -> list[bytes]:
    texts = text_of(cfg, rows)
    srcs, dsts = out_links(cfg, rows)
    # group dst urls per row
    dst_urls = url_of(cfg, dsts)
    bounds = np.searchsorted(srcs, np.concatenate([rows, [np.iinfo(np.int64).max]]))
    out = []
    for i, r in enumerate(rows):
        a, b = bounds[i], np.searchsorted(srcs, r, side="right")
        anchors = "".join(f'<a href="{u}">L</a>' for u in dst_urls[a:b])
        html = (f"<html><head><title>T{r}</title></head><body>"
                f"<p>{texts[i]}</p>{anchors}</body></html>")
        out.append(html.encode("utf-8"))
    return out


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])


def pages_batch(cfg: PagesConfig, rows: np.ndarray) -> pa.Table:
    """Build the pages rows for the given row indices (pure, vectorized)."""
    rows = np.asarray(rows, dtype=np.int64)
    return pa.table({
        "url": pa.array(url_of(cfg, rows), type=pa.string()),
        "warc_ts": pa.array(EPOCH_US + rows * 1_000_000, type=pa.timestamp("us")),
        "html": pa.array(html_of(cfg, rows), type=pa.binary()),
        "text": pa.array(text_of(cfg, rows), type=pa.large_string()),
        "lang": pa.array(lang_of(rows), type=pa.string()),
    }, schema=PAGES_SCHEMA)


def make_pages_table(cfg: PagesConfig) -> pa.Table:
    return pages_batch(cfg, np.arange(cfg.n_pages, dtype=np.int64))


class PageBatchGenerator:
    """Actor-pool ``map_batches`` callable over ``ray.data.range(n)``.

    Stateful so the (tiny) config is deserialized once per actor; each
    batch of row ids maps to the corresponding pages rows.
    """

    def __init__(self, cfg: PagesConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.column("id").to_numpy()
        return pages_batch(self.cfg, rows)


def write_pages_parquet(cfg: PagesConfig, out_dir: str, *, parallelism: int = 32) -> str:
    """Generate the pages table to ``out_dir`` as parquet via Ray Data.

    Used for bench-scale fixtures; small tables should use
    :func:`make_pages_table` + ``pq.write_table`` directly.
    """
    import ray.data as rd

    ds = rd.range(cfg.n_pages, override_num_blocks=parallelism)
    ds = ds.map_batches(PageBatchGenerator(cfg), batch_format="pyarrow",
                        batch_size=8192, zero_copy_batch=True)
    ds.write_parquet(out_dir)
    return out_dir


def expected_links_table(cfg: PagesConfig) -> pa.Table:
    """Ground-truth (src_url, dst_url) links — what extraction must yield."""
    rows = np.arange(cfg.n_pages, dtype=np.int64)
    srcs, dsts = out_links(cfg, rows)
    return pa.table({
        "src_url": pa.array(url_of(cfg, srcs), type=pa.string()),
        "dst_url": pa.array(url_of(cfg, dsts), type=pa.string()),
    })
