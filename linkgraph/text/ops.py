"""Training-data text operators over a ``documents``-shaped table
(doc_id:int64, text:string, lang:string, source:string, n_chars:int64).

These are the north-rule "large-scale training-data pipeline" operators:
exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard, token stats,
quality scoring, language id, content fingerprinting.  The reference has
no text stage (its ids are ints, SURVEY.md §2.9 note); semantics here are
pinned by the DuckDB oracles in queries/registry.py instead.

Scale contract: every ``map_batches`` body is vectorized (pyarrow.compute
/ numpy / pandas hashing); the only Python-per-row loop is the md5 digest
call (an inherent per-document cost).  Wide steps are groupby shuffles
keyed on content hashes (uniformly distributed — no skew).

Tokenization contract: ``text.split(' ')`` — single-space split, matching
DuckDB ``string_split(text, ' ')`` exactly (empty tokens preserved).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)

STOPWORDS = ("the", "a", "and", "of", "to")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN) & _MASK
    x = ((x ^ (x >> _U64(30))) * _MIX1) & _MASK
    x = ((x ^ (x >> _U64(27))) * _MIX2) & _MASK
    return x ^ (x >> _U64(31))


def _tokens(batch: pa.Table) -> tuple[pa.ChunkedArray, np.ndarray]:
    """Vectorized single-space split -> (list array, per-row lengths)."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    return toks, lens


def _flat_tokens(toks) -> np.ndarray:
    flat = pc.list_flatten(toks)
    return np.asarray(flat.to_pylist(), dtype=object)


def _row_starts(lens: np.ndarray) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)


def _per_row_sum(flags: np.ndarray, lens: np.ndarray) -> np.ndarray:
    out = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    if flags.size:
        sums = np.add.reduceat(flags.astype(np.int64), _row_starts(lens)[nz])
        out[nz] = sums
    return out


# ------------------------------------------------------------- token stats

class TokenStats:
    """map_batches body: (doc_id, n_tokens, n_chars)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, lens = _tokens(batch)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(lens, pa.int64()),
            "n_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
        })


def quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_stop, n_distinct) — integer quality signals
    (exact-checkable; ratio scores are derived downstream)."""
    toks, lens = _tokens(batch)
    flat = _flat_tokens(toks)
    n_stop = _per_row_sum(np.isin(flat, STOPWORDS), lens)
    # distinct tokens per row: factorize + unique (row, code) pairs
    codes, _ = pd.factorize(flat)
    rows = np.repeat(np.arange(len(lens)), lens)
    pair = rows.astype(np.int64) * np.int64(len(flat) + 1) + codes
    uniq_rows = rows[np.unique(pair, return_index=True)[1]]
    n_distinct = np.bincount(uniq_rows, minlength=len(lens)).astype(np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(lens, pa.int64()),
        "n_stop": pa.array(n_stop, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
    })


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, score) — composite heuristic quality score in [0, 1]:
    token-length band, stopword-ratio band, type-token ratio.  The
    integer signals behind it are SQL-checked via quality_batch; the
    score itself is a float heuristic (rows-only)."""
    q = quality_batch(batch)
    n_tok = q.column("n_tokens").to_numpy().astype(np.float64)
    n_stop = q.column("n_stop").to_numpy().astype(np.float64)
    n_dist = q.column("n_distinct").to_numpy().astype(np.float64)
    lt = np.clip(n_tok / 64.0, 0.0, 1.0)            # enough text
    sr = n_stop / np.maximum(n_tok, 1.0)
    stop_band = 1.0 - np.abs(sr - 0.08) / 0.5        # natural stop ratio
    ttr = n_dist / np.maximum(n_tok, 1.0)            # lexical diversity
    # length gates the rest: a one-token document scores ~0 no matter
    # how "diverse" it is
    score = np.clip(lt * (0.4 + 0.3 * np.clip(stop_band, 0, 1)
                          + 0.3 * np.clip(ttr * 2, 0, 1)), 0.0, 1.0)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "score": np.round(score, 6)})


# ------------------------------------------------------------- exact dedup

def md5_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, content_hash=md5(text)) — matches DuckDB ``md5(text)``."""
    texts = batch.column("text").to_pylist()
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "content_hash": pa.array(hashes, pa.string()),
    })


def exact_dedup(docs):
    """Hash-partitioned exact dedup: md5(text) -> keep MIN(doc_id).

    Returns (content_hash, keep_id, n_copies).  Key is the content hash,
    uniformly distributed -> no shuffle skew at 100 TB."""
    from ray.data.aggregate import Count, Min

    return (docs.map_batches(md5_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("content_hash")
            .aggregate(Min("doc_id", alias_name="keep_id"),
                       Count(alias_name="n_copies")))


# ------------------------------------------------------------ fingerprints

_FP_BASE = _U64(1099511628211)  # FNV prime as the rolling base


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint) — polynomial rolling hash of utf-8 bytes mod
    2^64 (vectorized: global powers table + per-row reduceat)."""
    texts = batch.column("text").to_pylist()
    bufs = [t.encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(_U64)
    maxlen = int(lens.max(initial=1))
    powers = np.empty(maxlen, dtype=_U64)
    powers[0] = _U64(1)
    if maxlen > 1:
        np.multiply.accumulate(np.full(maxlen - 1, _FP_BASE, dtype=_U64),
                               out=powers[1:])
    # exponent = distance from the row's last byte
    ends = np.cumsum(lens)
    idx = np.arange(len(flat), dtype=np.int64)
    row = np.repeat(np.arange(len(lens)), lens)
    exp = (ends[row] - 1 - idx) if len(flat) else idx
    contrib = flat * powers[exp] if len(flat) else flat
    out = np.zeros(len(lens), dtype=_U64)
    nz = lens > 0
    if len(flat):
        out[nz] = np.add.reduceat(contrib, _row_starts(lens)[nz])
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(out.view(np.int64), pa.int64())})


# ------------------------------------------------------------- language id

_LANG_PROFILES = {
    "en": ("the", "a", "and", "of", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "es": ("el", "los", "las", "y", "es", "un", "una"),
}
_LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break order


def langid_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, pred_lang) — stopword-profile heuristic with a CJK-ratio
    check for zh; deterministic tie-break by _LANG_ORDER."""
    toks, lens = _tokens(batch)
    flat = _flat_tokens(toks)
    scores = np.zeros((len(lens), len(_LANG_ORDER)), dtype=np.int64)
    for j, lang in enumerate(_LANG_ORDER):
        scores[:, j] = _per_row_sum(np.isin(flat, _LANG_PROFILES[lang]), lens)
    best = np.argmax(scores, axis=1)  # argmax keeps first max -> order wins
    preds = np.array(_LANG_ORDER, dtype=object)[best]
    # zh: any CJK char dominates
    texts = batch.column("text").to_pylist()
    cjk = np.array([any("一" <= c <= "鿿" for c in t[:200])
                    for t in texts])
    preds[cjk] = "zh"
    return pa.table({"doc_id": batch.column("doc_id"),
                     "pred_lang": pa.array(list(preds), pa.string())})


# ----------------------------------------------------------------- simhash

def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) — 64-bit SimHash over token hashes (deterministic
    siphash via pandas hash_array with fixed key)."""
    toks, lens = _tokens(batch)
    flat = _flat_tokens(toks)
    h = pd.util.hash_array(flat, hash_key="0123456789123456") \
        if len(flat) else np.empty(0, _U64)
    bits = ((h[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)) \
        .astype(np.int64) * 2 - 1
    out = np.zeros(len(lens), dtype=_U64)
    nz = lens > 0
    if len(flat):
        sums = np.add.reduceat(bits, _row_starts(lens)[nz], axis=0)
        bitvals = (sums > 0).astype(np.uint64)
        out[nz] = (bitvals << np.arange(64, dtype=_U64)[None, :]) \
            .sum(axis=1, dtype=np.uint64)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(out.view(np.int64), pa.int64())})


# ------------------------------------------------------------ MinHash + LSH

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16
DEFAULT_SHINGLE_K = 3


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Word k-shingles -> uint64 hashes (empty doc -> single 0 hash)."""
    words = text.split(" ")
    if len(words) < k:
        shingles = [" ".join(words)]
    else:
        shingles = [" ".join(words[i:i + k])
                    for i in range(len(words) - k + 1)]
    arr = np.array(shingles, dtype=object)
    return np.unique(pd.util.hash_array(arr, hash_key="0123456789123456"))


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature -> LSH band rows.

    Output: one row per (doc_id, band, band_hash).  Permutation seeds are
    built once per actor (``__init__``)."""

    def __init__(self, num_perm: int = DEFAULT_NUM_PERM,
                 bands: int = DEFAULT_BANDS, k: int = DEFAULT_SHINGLE_K):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands
        self.seeds = _splitmix64(np.arange(num_perm, dtype=_U64) + _U64(7))

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # h_i(x) = splitmix64(x ^ seed_i); min over shingles
        return np.array([_splitmix64(sh ^ s).min() for s in self.seeds],
                        dtype=_U64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) \
            if len(texts) else np.empty((0, self.num_perm), _U64)
        r = self.rows_per_band
        # band hash = splitmix64-combine of the band's signature rows
        band_hash = np.zeros((len(texts), self.bands), dtype=_U64)
        for b in range(self.bands):
            acc = _U64(b + 1)
            for j in range(r):
                acc = _splitmix64(sigs[:, b * r + j] ^ acc) \
                    if len(texts) else acc
            band_hash[:, b] = acc
        return pa.table({
            "doc_id": np.repeat(doc_ids, self.bands),
            "band": np.tile(np.arange(self.bands, dtype=np.int64),
                            len(texts)),
            "band_hash": band_hash.reshape(-1).view(np.int64),
        })


def minhash_signatures(docs, **kw):
    return docs.map_batches(MinHasher, batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=(1, 4),
                            fn_constructor_kwargs=kw)


def minhash_dup_pairs(docs, *, threshold: float = 0.7,
                      num_perm: int = DEFAULT_NUM_PERM,
                      bands: int = DEFAULT_BANDS,
                      k: int = DEFAULT_SHINGLE_K):
    """MinHash+LSH near-dup pairs, verified by exact shingle Jaccard.

    Pipeline: signatures -> band rows -> groupby (band, band_hash) ->
    candidate pairs (map_groups) -> pair dedup -> exact verification.
    Verification broadcasts the candidate doc texts (the candidate set is
    tiny relative to the corpus); at 100 TB this becomes a shuffle join of
    candidates back to ``documents`` on doc_id.
    Returns (a, b, jaccard) with jaccard rounded to 6 decimals.
    """
    import ray

    band_rows = minhash_signatures(docs, num_perm=num_perm, bands=bands, k=k)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    pairs = (band_rows.groupby(["band", "band_hash"])
             .map_groups(emit_pairs, batch_format="pandas")
             .groupby(["a", "b"]).count()
             .select_columns(["a", "b"]))

    # exact verification against the candidates' shingle sets
    cand = pairs.materialize()
    cand_ids = set()
    for row in cand.take_all():
        cand_ids.add(row["a"])
        cand_ids.add(row["b"])
    if not cand_ids:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    texts = {}
    for blk in ray.get(docs.to_arrow_refs()):
        ids = blk.column("doc_id").to_numpy()
        mask = np.isin(ids, list(cand_ids))
        for i in np.flatnonzero(mask):
            texts[int(ids[i])] = blk.column("text")[int(i)].as_py()
    texts_ref = ray.put(texts)

    def verify(t: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        jac = np.empty(len(a))
        for i in range(len(a)):
            sa = set(_shingle_hashes(tx[int(a[i])], k).tolist())
            sb = set(_shingle_hashes(tx[int(b[i])], k).tolist())
            jac[i] = len(sa & sb) / max(1, len(sa | sb))
        keep = jac >= threshold
        return pa.table({"a": a[keep], "b": b[keep],
                         "jaccard": np.round(jac[keep], 6)})

    return cand.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------- n-gram Jaccard

def token_jaccard_pairs(docs):
    """Within-source pairwise token-set overlap: (a, b, n_common, n_union)
    for a < b in the same ``source`` group — integer-exact (SQL-checked).

    Grouping by ``source`` bounds the quadratic blow-up to group size;
    at scale the grouping key would be an LSH bucket (see minhash)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [set(t.split(" ")) for t in g["text"]]
        a_out, b_out, nc, nu = [], [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
                nc.append(len(sets[i] & sets[j]))
                nu.append(len(sets[i] | sets[j]))
        return pd.DataFrame({
            "a": np.array(a_out, np.int64), "b": np.array(b_out, np.int64),
            "n_common": np.array(nc, np.int64),
            "n_union": np.array(nu, np.int64)})

    return (docs.select_columns(["doc_id", "source", "text"])
            .groupby("source").map_groups(pairs, batch_format="pandas"))
