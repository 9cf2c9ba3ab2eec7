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
import ray

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


def _flat_tokens(toks) -> pa.Array:
    """All rows' tokens as ONE flat Arrow array (stays off the Python
    heap; membership tests use pc.is_in, identity uses dictionary
    codes)."""
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat


def _token_in(flat: pa.Array, values: tuple[str, ...]) -> np.ndarray:
    """Vectorized membership: flat tokens in `values` -> bool ndarray."""
    return pc.is_in(flat, value_set=pa.array(values, pa.string())) \
        .to_numpy(zero_copy_only=False)


def _row_starts(lens: np.ndarray) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)


def _per_row_sum(flags: np.ndarray, lens: np.ndarray) -> np.ndarray:
    out = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    if flags.size:
        sums = np.add.reduceat(flags.astype(np.int64), _row_starts(lens)[nz])
        out[nz] = sums
    return out


# BPE-ish subword segmentation (GPT-2-style word/number/punct classes
# with leading-space absorption, simplified to RE2: no lookahead — RE2 is
# what BOTH pyarrow (pc.count_substring_regex) and DuckDB
# (regexp_extract_all) run, so the SQL oracle matches bit-exactly).
BPE_TOKEN_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+|[ \t\n\r]+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe) — non-overlapping BPE_TOKEN_PAT match count per
    doc; one vectorized RE2 pass in Arrow C++, no per-row Python."""
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe": pc.count_substring_regex(
            batch.column("text"), BPE_TOKEN_PAT).cast(pa.int64()),
    })


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
    n_stop = _per_row_sum(_token_in(flat, STOPWORDS), lens)
    # distinct tokens per row: Arrow dictionary codes (dense ids per
    # distinct token, computed in C++) + unique (row, code) pairs
    codes = flat.dictionary_encode().indices \
        .to_numpy(zero_copy_only=False).astype(np.int64)
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
    token-length band, stopword-ratio band, type-token ratio.  Pure
    double arithmetic over the SQL-checked integer signals, quantized
    with floor -> the DuckDB oracle reproduces it bit-exactly."""
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
    # quantize with floor (not round): round-half ties differ between
    # numpy (half-even) and SQL engines (half-away), floor is identical
    # IEEE ops everywhere -> the DuckDB oracle hash-matches
    return pa.table({"doc_id": batch.column("doc_id"),
                     "score": np.floor(score * 1e6) / 1e6})


# ------------------------------------------------------- repetition signals

def repetition_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, top_count, n_bigrams, n_distinct_bigrams) —
    Gopher-style repetition signals, integer-exact (SQL-checked):
    top-token fraction = top_count / n_tokens, duplicate-bigram fraction
    = 1 - n_distinct_bigrams / n_bigrams (both derived downstream; the
    gate checks the exact integers).

    Fully vectorized: tokens become Arrow dictionary codes; per-(row,
    token) counts come from ONE sort + run-length pass; bigrams are
    adjacent code pairs composited into a single int64 key (no Python
    loops, no per-doc dicts)."""
    toks, lens = _tokens(batch)
    flat = _flat_tokens(toks)
    n = len(lens)
    codes = flat.dictionary_encode().indices \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    ncodes = np.int64(int(codes.max(initial=-1)) + 2)
    top = np.zeros(n, np.int64)
    if len(codes):
        sp = np.sort(rows * ncodes + codes)
        newg = np.empty(len(sp), dtype=bool)
        newg[0] = True
        newg[1:] = sp[1:] != sp[:-1]
        starts = np.flatnonzero(newg)
        cnts = np.diff(np.concatenate([starts, [len(sp)]]))
        grow = sp[starts] // ncodes
        rnew = np.empty(len(grow), dtype=bool)
        rnew[0] = True
        rnew[1:] = grow[1:] != grow[:-1]
        rstarts = np.flatnonzero(rnew)
        top[grow[rstarts]] = np.maximum.reduceat(cnts, rstarts)
    # bigrams: adjacent positions within a row (drop each row's last slot)
    n_bi = np.maximum(lens - 1, 0)
    nd_bi = np.zeros(n, np.int64)
    if len(codes) > 1 and n_bi.sum() > 0:
        valid = np.ones(len(codes) - 1, dtype=bool)
        ends = _row_starts(lens) + lens - 1       # last slot per row
        ends = ends[lens > 0]
        valid[ends[ends < len(valid)]] = False
        b1 = codes[:-1][valid]
        b2 = codes[1:][valid]
        brow = rows[:-1][valid]
        # composite (row, c1, c2) key; ncodes^2 * n_rows must fit int64 —
        # holds for any sane batch (guarded by map_batches batch_size)
        key = (brow * ncodes + b1) * ncodes + b2
        uk = np.unique(key)
        nd_bi = np.bincount((uk // ncodes) // ncodes,
                            minlength=n).astype(np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(lens, pa.int64()),
        "top_count": pa.array(top, pa.int64()),
        "n_bigrams": pa.array(n_bi, pa.int64()),
        "n_distinct_bigrams": pa.array(nd_bi, pa.int64()),
    })


# ------------------------------------------------------ contamination check

CONTAM_MOD = 17  # deterministic "benchmark" subset: doc_id % 17 == 0


def benchmark_shingles(docs, k: int, mod: int = CONTAM_MOD) -> np.ndarray:
    """Sorted distinct shingle hashes of the benchmark subset.

    The benchmark side of a contamination check is an eval suite —
    inherently tiny next to the corpus — so its distinct-shingle set is
    gathered and broadcast (ray.put) like the url fingerprint index;
    the CORPUS side streams.  Per-block tasks hash + unique locally so
    only deduped uint64 arrays reach the driver."""
    import ray as _ray

    def block_hashes(t: pa.Table) -> pa.Table:
        sel = t.column("doc_id").to_numpy() % mod == 0
        texts = t.filter(pa.array(sel)).column("text").to_pylist()
        flat, _lens = _batch_shingle_hashes(texts, k)
        return pa.table({"h": np.unique(flat).view(np.int64)})

    bench = docs.map_batches(block_hashes, batch_format="pyarrow",
                             zero_copy_batch=True)
    parts = [_ray.get(r).column("h").to_numpy().view(_U64)
             for r in bench.to_arrow_refs()]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, _U64)


def contamination_batch(batch: pa.Table, bench_ref, k: int) -> pa.Table:
    """(doc_id, n_shingles, n_contam) — per doc: distinct k-word
    shingles and how many appear in the benchmark set (membership via
    searchsorted on the broadcast sorted hash array).  64-bit shingle
    hashes stand in for the strings (collision odds ~1e-8 at sf-scale;
    the SQL oracle joins the exact strings)."""
    import ray as _ray
    bench = _ray.get(bench_ref) if isinstance(bench_ref, _ray.ObjectRef) \
        else bench_ref
    texts = batch.column("text").to_pylist()
    flat, lens = _batch_shingle_hashes(texts, k)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # per-row distinct shingles (one lexsort over the batch)
    order = np.lexsort((flat, rows))
    h_s, r_s = flat[order], rows[order]
    if len(h_s):
        first = np.empty(len(h_s), dtype=bool)
        first[0] = True
        first[1:] = (h_s[1:] != h_s[:-1]) | (r_s[1:] != r_s[:-1])
        h_u, r_u = h_s[first], r_s[first]
    else:
        h_u, r_u = h_s, r_s
    n_sh = np.bincount(r_u, minlength=len(lens)).astype(np.int64)
    if len(bench) and len(h_u):
        pos = np.searchsorted(bench, h_u)
        pos[pos == len(bench)] = 0
        hit = (bench[pos] == h_u).astype(np.int64)
        n_con = np.bincount(r_u, weights=hit,
                            minlength=len(lens)).astype(np.int64)
    else:
        n_con = np.zeros(len(lens), np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_shingles": pa.array(n_sh, pa.int64()),
        "n_contam": pa.array(n_con, pa.int64()),
    })


# deterministic document sample for the dup-ngram stop-shingle guard:
# shingles seen in >= 2 sampled docs are provably duplicated and are
# counted map-side instead of entering the exchange.  At corpus scale
# raise the mod so the gathered sample stays driver-sized.
STOP_SAMPLE_MOD = 8


def dup_ngram_stats(docs, k: int = 3):
    """(doc_id, n_shingles, n_dup): per doc, distinct k-word shingles
    and how many of them occur in >= 2 documents CORPUS-WIDE — the
    Gopher / RefinedWeb duplicated-n-gram filter signal (docs dominated
    by shingles shared with other documents are boilerplate).

    Scale shape: two hash exchanges, nothing corpus-sized on the
    driver.  (1) per-block (doc_id, distinct shingle hash) rows are
    hash-partitioned on the SHINGLE so each shingle's full document
    set lands in one partition; the partition reducer counts documents
    per shingle and emits per-doc (n_shingles, n_dup) PARTIALS —
    already aggregated, O(docs-in-partition) rows.  (2) a grouped
    exchange on doc_id sums the partials.  64-bit shingle hashes stand
    in for the strings (the contamination_batch precedent: collision
    odds ~1e-9 at gate scale; the DuckDB oracle uses exact strings, so
    the green gate doubles as a collision check).

    Skew guard (the hot-shingle problem): a boilerplate shingle present
    in a large fraction of documents would route ALL its (h, doc) rows
    to one partition.  A sampled STOP-SHINGLE prefilter removes that
    exposure without changing a single output value: any shingle seen
    in >= 2 docs of a deterministic sample (doc_id % STOP_SAMPLE_MOD)
    is PROVABLY duplicated corpus-wide, so its per-doc contribution is
    counted map-side and its rows never enter the exchange; shingles
    below the sample's resolution (df ~< 1/sample size) still co-locate
    exactly.  Same shape as the minhash HOT_BUCKET_CLIQUE_CAP — the
    broadcast small side replaces the skewed shuffle."""
    from ..stages.exchange import grouped_exchange, keyed_partition_exchange

    def _doc_distinct(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        texts = t.column("text").to_pylist()
        flat, lens = _batch_shingle_hashes(texts, k)
        rows = np.repeat(t.column("doc_id").to_numpy(), lens)
        order = np.lexsort((flat, rows))
        h_s, r_s = flat[order], rows[order]
        if len(h_s):
            keep = np.empty(len(h_s), dtype=bool)
            keep[0] = True
            keep[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
            h_s, r_s = h_s[keep], r_s[keep]      # per-doc distinct
        return h_s, r_s

    # ---- sampled stop-shingle set (tiny, gathered + broadcast) ----
    def sample_pairs(t: pa.Table) -> pa.Table:
        sel = t.column("doc_id").to_numpy() % STOP_SAMPLE_MOD == 0
        sub = t.filter(pa.array(sel))
        if sub.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        h_s, r_s = _doc_distinct(sub)
        return pa.table({"h": pa.array(h_s.view(np.int64), pa.int64()),
                         "doc_id": pa.array(r_s, pa.int64())})

    import ray as _ray
    sp = [t for t in _ray.get(
        docs.map_batches(sample_pairs, batch_format="pyarrow",
                         zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    if sp:
        st_ = pa.concat_tables(sp)
        hh = st_.column("h").to_numpy()
        uh, inv = np.unique(hh, return_inverse=True)
        # >= 2 distinct docs in the sample (rows are per-doc distinct)
        stop = np.sort(uh[np.bincount(inv) >= 2])
    else:
        stop = np.empty(0, np.int64)
    stop_ref = _ray.put(stop)

    def explode(t: pa.Table) -> pa.Table:
        """ONE expensive pass (tokenize + hash + per-doc distinct):
        emits the exchange rows AND the map-side stop partials in a
        combined schema — nonstop shingles as (h, doc_id, stop_c=0),
        per-doc stop contributions as (h=0, doc_id, stop_c=count);
        each is in >= 2 docs by the sample witness, so for the stop
        rows n_dup == n_shingles == stop_c.  Two cheap column filters
        split the streams downstream without re-hashing the corpus."""
        h_s, r_s = _doc_distinct(t)
        stop_s = _ray.get(stop_ref)
        hi = h_s.view(np.int64)
        if len(stop_s) and len(hi):
            pos = np.minimum(np.searchsorted(stop_s, hi),
                             len(stop_s) - 1)
            is_stop = stop_s[pos] == hi
        else:
            is_stop = np.zeros(len(hi), dtype=bool)
        hk, rk = hi[~is_stop], r_s[~is_stop]
        ud, cnt = (np.unique(r_s[is_stop], return_counts=True)
                   if is_stop.any() else (np.empty(0, np.int64),
                                          np.empty(0, np.int64)))
        return pa.table({
            "h": pa.array(np.concatenate([hk, np.zeros(len(ud),
                                                       np.int64)]),
                          pa.int64()),
            "doc_id": pa.array(np.concatenate([rk, ud]), pa.int64()),
            "stop_c": pa.array(np.concatenate(
                [np.zeros(len(hk), np.int64),
                 cnt.astype(np.int64)]), pa.int64()),
        })

    combined = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    def only_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("stop_c"), 0))
        return t.select(["h", "doc_id"])

    def only_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("stop_c"), 0))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_shingles": t.column("stop_c"),
                         "n_dup": t.column("stop_c")})

    rows = combined.map_batches(only_rows, batch_format="pyarrow",
                                zero_copy_batch=True)
    map_side = combined.map_batches(only_partials,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)

    def per_shingle(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_shingles": pa.array([], pa.int64()),
                          "n_dup": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        h = t.column("h").to_numpy()
        d = t.column("doc_id").to_numpy()
        order = np.argsort(h, kind="stable")
        hs, ds = h[order], d[order]
        new = np.empty(len(hs), dtype=bool)
        new[0] = True
        new[1:] = hs[1:] != hs[:-1]
        gid = np.cumsum(new) - 1
        gsz = np.bincount(gid)                   # docs per shingle
        dup = gsz[gid] >= 2
        ud, inv = np.unique(ds, return_inverse=True)
        n_sh = np.bincount(inv, minlength=len(ud)).astype(np.int64)
        n_dup = np.bincount(inv, weights=dup,
                            minlength=len(ud)).astype(np.int64)
        return pa.table({"doc_id": pa.array(ud, pa.int64()),
                         "n_shingles": pa.array(n_sh, pa.int64()),
                         "n_dup": pa.array(n_dup, pa.int64())})

    partials = keyed_partition_exchange(rows, ["h"], per_shingle)
    return grouped_exchange(partials.union(map_side), ["doc_id"],
                            [("sum", "n_shingles", "n_shingles"),
                             ("sum", "n_dup", "n_dup")])


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


def _str_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string OR binary array -> (flat bytes, per-row byte
    lengths), zero-copy straight from the Arrow offsets/data buffers (no
    per-row Python encode); binary shares the string buffer layout."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        # silent null->empty-string hashing would diverge from the SQL
        # oracles (NULL md5/fingerprint is NULL there); fail loudly like
        # the old to_pylist path did
        raise ValueError("null text rows are not hashable; filter or "
                         "fill nulls before fingerprint/simhash")
    odt = (np.int64 if (pa.types.is_large_string(arr.type)
                        or pa.types.is_large_binary(arr.type))
           else np.int32)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    # an all-empty string column may carry no data buffer at all
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    return data[offs[0]: offs[-1]], np.diff(offs)


def _poly_hash_flat(data: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Polynomial rolling hash (Horner fold, base _FP_BASE, mod 2^64) of
    each row's slice of the flat uint8 array.  Vectorized: one global
    powers table + per-row reduceat.  Empty rows hash to 0."""
    out = np.zeros(len(lens), dtype=_U64)
    if not len(data):
        return out
    flat = data.astype(_U64)
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
    exp = ends[row] - 1 - idx
    contrib = flat * powers[exp]
    nz = lens > 0
    out[nz] = np.add.reduceat(contrib, _row_starts(lens)[nz])
    return out


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint) — polynomial rolling hash of utf-8 bytes mod
    2^64, read zero-copy from the Arrow string buffers.  Exactly the
    Horner fold ``fp = fp * base + byte`` the DuckDB oracle reproduces
    with a list_reduce over hex-decoded bytes."""
    out = _poly_hash_flat(*_str_bytes(batch.column("text")))
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
        scores[:, j] = _per_row_sum(_token_in(flat, _LANG_PROFILES[lang]),
                                    lens)
    best = np.argmax(scores, axis=1)  # argmax keeps first max -> order wins
    preds = np.array(_LANG_ORDER, dtype=object)[best]
    # zh: any CJK char in the first 200 chars dominates (vectorized
    # regex over the sliced column — no per-row Python scan)
    head = pc.utf8_slice_codeunits(batch.column("text"), 0, 200)
    cjk = pc.match_substring_regex(head, "[一-鿿]") \
        .to_numpy(zero_copy_only=False)
    preds[cjk] = "zh"
    return pa.table({"doc_id": batch.column("doc_id"),
                     "pred_lang": pa.array(list(preds), pa.string())})


# ----------------------------------------------------------------- simhash

def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) — 64-bit SimHash over token hashes.  Token hash
    = splitmix64(poly_hash(utf-8 bytes)) — an avalanche finalizer over
    the same Horner fold the fingerprint uses, so the DuckDB oracle can
    reproduce every bit (mod-2^64 arithmetic via HUGEINT)."""
    toks, lens = _tokens(batch)
    flat = _flat_tokens(toks)
    if len(flat):
        # hash each DISTINCT token once (dictionary codes gather the
        # per-occurrence values) — same values as hashing every token,
        # without round-tripping the whole column through Python
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(_poly_hash_flat(*_str_bytes(enc.dictionary)))[codes]
    else:
        h = np.empty(0, _U64)
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over uint64 (SWAR — numpy<2 has no
    bitwise_count)."""
    x = x.astype(_U64, copy=True)
    x -= (x >> _U64(1)) & _U64(0x5555555555555555)
    x = (x & _U64(0x3333333333333333)) \
        + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return ((x * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)


SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3


def simhash_dup_pairs(docs, *, max_hamming: int = SIMHASH_MAX_HAMMING,
                      bands: int = SIMHASH_BANDS):
    """SimHash near-dup pairs: (a, b, hamming) for a < b with
    hamming(simhash(a), simhash(b)) <= ``max_hamming``.

    Banded-Hamming LSH: the 64-bit SimHash splits into ``bands``
    disjoint 64/bands-bit bands; two hashes within Hamming distance
    ``max_hamming`` < ``bands`` MUST agree on at least one band
    (pigeonhole), so bucketing by (band, band value) finds EVERY
    qualifying pair — EXACT recall, unlike MinHash banding's
    probabilistic miss.  Each bucket verifies candidates with one
    vectorized XOR+popcount; a pair sharing several bands is emitted
    only from its FIRST matching band (locally decidable — both full
    hashes travel with the band row — so no dedup shuffle and no join
    back to the corpus).  Value-checked by a DuckDB self-join oracle on
    bit_count(xor(...)) (registry._SIMHASH_PAIRS_SQL).

    Scale: one pass over the corpus emits 4 small rows/doc (24 B each);
    the bucket groupby shuffles only those rows.  Hot buckets (shared
    band values, e.g. near-identical boilerplate) are found by a
    vectorized count prefilter and are the only groups that run Python
    group bodies — the same hot-key design as ``minhash_dup_pairs``.
    A degenerate corpus where one band value covers a large fraction of
    documents (all-empty texts) is quadratic in that bucket, exactly as
    in the reference LSH formulation."""
    import ray

    from ..stages.exchange import grouped_exchange

    assert 64 % bands == 0 and 0 <= max_hamming < bands
    width = 64 // bands
    mask = _U64((1 << width) - 1)

    def band_rows(t: pa.Table) -> pa.Table:
        t = simhash_batch(t)
        ids = t.column("doc_id").to_numpy()
        h = t.column("simhash").to_numpy().view(_U64)
        n = len(ids)
        vals = np.empty((n, bands), np.int64)
        for b in range(bands):
            vals[:, b] = ((h >> _U64(width * b)) & mask).astype(np.int64)
        # bkey = band * 2^width + band_value: one int64 key, unique
        # across bands (band values alone collide between bands)
        bkey = vals + (np.arange(bands, dtype=np.int64) << width)[None, :]
        return pa.table({
            "doc_id": np.repeat(ids, bands),
            "simhash": np.repeat(h.view(np.int64), bands),
            "bkey": bkey.reshape(-1),
        })

    # no batch_size: per-block tasks (a batch_size here coalesces the
    # read blocks into few tasks and serializes the bit-matrix compute)
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        band_rows, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    refs = rows.to_arrow_refs()

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    hot = grouped_exchange(
        rows, ["bkey"], [("count", "", "c")],
        post=lambda t: t.filter(pc.greater_equal(t.column("c"), 2)))
    hot_keys = np.unique(pa.concat_tables(
        ray.get(hot.to_arrow_refs())).column("bkey").to_numpy())
    if len(hot_keys) == 0:
        return empty
    hot_ref = ray.put(hot_keys)

    # pair exchange over the MATERIALIZED band rows: hot-filter in the
    # split task (only dup-cluster rows cross the wire), hash-partition
    # on bkey, vectorized per-partition pair emission — no Dataset Sort
    # over the full band-row table and no per-group Python bodies.
    P = min(16, max(4, len(refs)))
    split = [_simhash_pair_split.options(num_returns=P)
             .remote(r, hot_ref, P) for r in refs]
    if P == 1:
        split = [[r] for r in split]
    outs = ray.get([_simhash_pair_reduce.remote(
        width, int(mask), max_hamming, bands,
        *[split[i][p] for i in range(len(split))]) for p in range(P)])
    outs = [t for t in outs if t.num_rows] or [empty]
    import ray.data as rd
    return rd.from_arrow(pa.concat_tables(outs))


@ray.remote
def _simhash_pair_split(tbl: pa.Table, hot_keys: np.ndarray, P: int):
    from ..stages.exchange import _mix64
    bk = tbl.column("bkey").to_numpy()
    t = tbl.filter(pa.array(np.isin(bk, hot_keys)))
    if P == 1:
        return t
    part = (_mix64(t.column("bkey").to_numpy().astype(_U64))
            % _U64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    t = t.take(pa.array(order))
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    return tuple(t.slice(cuts[p], cuts[p + 1] - cuts[p])
                 for p in range(P))


@ray.remote
def _simhash_pair_reduce(width: int, mask: int, max_hamming: int,
                         bands: int, *parts: pa.Table) -> pa.Table:
    """Emit verified (a, b, hamming) pairs for every bkey segment of
    this partition — all-segment pair construction, XOR popcount and
    the first-matching-band filter run as single vector ops."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return empty
    t = pa.concat_tables(tbls)
    bk = t.column("bkey").to_numpy()
    ids = t.column("doc_id").to_numpy()
    order = np.lexsort((ids, bk))
    bk, ids = bk[order], ids[order]
    h = np.ascontiguousarray(
        t.column("simhash").to_numpy()[order]).view(_U64)
    n = len(bk)
    seg_starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
    seg_lens = np.diff(np.append(seg_starts, n))
    # all intra-segment (i < j) index pairs, fully vectorized
    row_reps = np.repeat(seg_lens, seg_lens) - 1 \
        - (np.arange(n) - np.repeat(seg_starts, seg_lens))
    ia = np.repeat(np.arange(n), row_reps)
    csum = np.cumsum(row_reps)
    total = int(csum[-1]) if n else 0
    if total == 0:
        return empty
    ib = ia + (np.arange(total) - np.repeat(csum - row_reps, row_reps)) + 1
    ham = _popcount64(h[ia] ^ h[ib])
    keep = ham <= max_hamming
    band = (bk[ia] >> width).astype(np.int64)
    umask = _U64(mask)
    for j in range(bands - 1):  # first-matching-band: emit exactly once
        sh = _U64(width * j)
        keep &= (band <= j) | (((h[ia] >> sh) & umask)
                               != ((h[ib] >> sh) & umask))
    return pa.table({"a": ids[ia][keep], "b": ids[ib][keep],
                     "hamming": ham[keep]})


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


def _batch_shingle_hashes(texts: list[str], k: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """All docs' shingle hashes concatenated -> (flat uint64, row lens).
    Duplicates within a doc are kept (min-reductions are unaffected);
    hashing is ONE pd.util.hash_array call over the whole batch."""
    sh_all: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = t.split(" ")
        if len(words) < k:
            n0 = len(sh_all)
            sh_all.append(" ".join(words))
            lens[i] = len(sh_all) - n0
        else:
            sh_all.extend(" ".join(words[j:j + k])
                          for j in range(len(words) - k + 1))
            lens[i] = len(words) - k + 1
    flat = pd.util.hash_array(np.array(sh_all, dtype=object),
                              hash_key="0123456789123456") \
        if sh_all else np.empty(0, _U64)
    return flat, lens


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature -> LSH band rows.

    Output: one row per (doc_id, band, band_hash).  Permutation seeds are
    built once per actor (``__init__``).  Signatures are ONE
    (batch_shingles x num_perm) matrix min per batch — no per-doc /
    per-permutation Python loops (the round-1 hot spot)."""

    def __init__(self, num_perm: int = DEFAULT_NUM_PERM,
                 bands: int = DEFAULT_BANDS, k: int = DEFAULT_SHINGLE_K):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands
        self.seeds = _splitmix64(np.arange(num_perm, dtype=_U64) + _U64(7))

    def signature(self, text: str) -> np.ndarray:
        """Single-doc signature (kept for unit tests / the exact-verify
        kernel); batch work goes through :meth:`signatures`."""
        return self.signatures([text])[0]

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 — h_i(x) = splitmix64(x ^ seed_i),
        min over each doc's shingles, vectorized across the batch."""
        if not texts:
            return np.empty((0, self.num_perm), _U64)
        flat, lens = _batch_shingle_hashes(texts, self.k)
        H = _splitmix64(flat[:, None] ^ self.seeds[None, :])
        return np.minimum.reduceat(H, _row_starts(lens), axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        sigs = self.signatures(texts)
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


_HASHER_CACHE: dict[tuple, MinHasher] = {}


def _band_rows_batch(batch: pa.Table, num_perm: int, bands: int,
                     k: int) -> pa.Table:
    """Task-friendly wrapper: hasher construction is trivial (64 seed
    splitmixes), so a cached per-process instance beats paying actor-pool
    startup for a stage whose state costs microseconds to build."""
    key = (num_perm, bands, k)
    h = _HASHER_CACHE.get(key)
    if h is None:
        from ..common import tune_malloc
        tune_malloc()
        h = _HASHER_CACHE[key] = MinHasher(num_perm, bands, k)
    return h(batch)


def minhash_signatures(docs, **kw):
    # batch_size bounds the (shingles x num_perm) scratch matrix
    # (~40 MB at 256 docs x ~2k shingles x 64 perms)
    kw = {"num_perm": DEFAULT_NUM_PERM, "bands": DEFAULT_BANDS,
          "k": DEFAULT_SHINGLE_K, **kw}
    return docs.map_batches(_band_rows_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=256,
                            fn_kwargs=kw)


def shingle_sets_batch(batch: pa.Table, k: int) -> pa.Table:
    """(doc_id, sh: large_binary) — per-doc sorted UNIQUE shingle hashes
    packed as raw uint64 bytes (acero joins reject list payload columns;
    binary is join-safe and decodes zero-copy with np.frombuffer).
    Per-row unique via one lexsort over the whole batch."""
    texts = batch.column("text").to_pylist()
    flat, lens = _batch_shingle_hashes(texts, k)
    rows = np.repeat(np.arange(len(lens)), lens)
    order = np.lexsort((flat, rows))
    h_s, r_s = flat[order], rows[order]
    if len(h_s):
        keep = np.empty(len(h_s), dtype=bool)
        keep[0] = True
        keep[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
        h_u, r_u = h_s[keep], r_s[keep]
    else:
        h_u = h_s
        r_u = r_s
    counts = np.bincount(r_u, minlength=len(lens))
    byte_offsets = (np.concatenate([[0], np.cumsum(counts)]) * 8) \
        .astype(np.int64)
    sh = pa.Array.from_buffers(
        pa.large_binary(), len(lens),
        [None, pa.py_buffer(byte_offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(h_u).tobytes())])
    return pa.table({"doc_id": batch.column("doc_id"), "sh": sh})


def _project_ab(t: pa.Table) -> pa.Table:
    return t.select(["a", "b"])


# LSH buckets larger than this emit star pairs (to the bucket-min
# doc_id) instead of the full clique — see emit_pairs in
# minhash_dup_pairs.  Gate-scale buckets are O(10); real boilerplate
# clusters can be O(1e6) where the clique is 1e12 pairs.
HOT_BUCKET_CLIQUE_CAP = 1024


def _binary_rows(col) -> tuple[np.ndarray, np.ndarray]:
    """(byte-offsets//8 as element offsets, uint64 element buffer) of a
    large_binary column holding packed uint64 shingle hashes — zero-copy
    views straight off the Arrow buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint64)
    assert (off % 8 == 0).all()
    return off // 8, data


def pair_verify_fanout(n_cand: int) -> int:
    """Exchange width for a pair-verify reduce wave, keyed on the GLOBAL
    candidate-pair count (never a hard-coded P): tiny pair sets verify
    in one task instead of paying a split/reduce fan-out, large sets
    scale to the cluster, and the choice is parallelism-invariant."""
    from ..stages.exchange import default_partitions
    return max(1, min(default_partitions(), n_cand // 1000))


def pair_verify_exchange(rows_ds, reduce_remote, *reduce_args,
                         n_cand: int) -> list:
    """The shared pair-key exchange: hash-split exploded pair rows so
    both rows of every candidate pair land in one partition, then run
    ``reduce_remote`` (a ray.remote function called as
    ``reduce_remote.remote(*reduce_args, *partition_tables)``) once per
    partition.  Fan-out sized to ``n_cand`` via pair_verify_fanout.
    Returns the P output-table refs (callers concat / wrap them).
    Single home for the num_returns / P==1-wrapping Ray quirks that
    were previously copy-pasted at every verify site."""
    P = pair_verify_fanout(n_cand)
    blocks = rows_ds.materialize().to_arrow_refs()
    split = [_pair_verify_split.options(num_returns=P).remote(blk, P)
             for blk in blocks]
    if P == 1:
        split = [[r] for r in split]
    return [reduce_remote.remote(
        *reduce_args, *[split[i][p] for i in range(len(split))])
        for p in range(P)]


@ray.remote
def _pair_verify_split(tbl: pa.Table, P: int):
    """Hash-split exploded pair rows (a, b, doc_id, sh) on the PAIR key
    so both rows of every candidate pair land in one partition."""
    if tbl.num_rows == 0:
        return tbl if P == 1 else tuple(tbl for _ in range(P))
    from ..stages.exchange import _key_hash
    part = (_key_hash([tbl.column("a").to_numpy(),
                       tbl.column("b").to_numpy()])
            % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    t = tbl.take(pa.array(order))
    if P == 1:
        return t
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    return tuple(t.slice(cuts[p], cuts[p + 1] - cuts[p])
                 for p in range(P))


@ray.remote
def _pair_verify_reduce(threshold: float, *parts) -> pa.Table:
    """Exact shingle-Jaccard verify for ONE hash partition of candidate
    pairs — a single vectorized pass over the partition's whole shingle
    mass (lexsort by (pair, hash); adjacent duplicates are the
    intersections), replacing the former one-pandas-call-per-pair
    map_groups (the round-3 'per-pair Python verify' scale flag)."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "n_union": pa.array([], pa.int64())})
    tbls = [t for t in parts if t.num_rows]
    if not tbls:
        return empty
    t = pa.concat_tables(tbls)
    a = t.column("a").to_numpy()
    b = t.column("b").to_numpy()
    off, data = _binary_rows(t.column("sh"))
    ro = np.lexsort((b, a))                    # same-pair rows adjacent
    a_s, b_s = a[ro], b[ro]
    new = np.empty(len(ro), dtype=bool)
    new[0] = True
    new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    pid = np.cumsum(new) - 1
    npairs = int(pid[-1]) + 1
    rows_per_pair = np.bincount(pid, minlength=npairs)
    # gather each row's shingles in pair order (one fancy index)
    lens = (off[1:] - off[:-1])[ro]
    starts = off[:-1][ro]
    total = int(lens.sum())
    take = (np.repeat(starts, lens) + np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens))
    vals = data[take]
    pid_el = np.repeat(pid, lens)
    o2 = np.lexsort((vals, pid_el))
    v2, p2 = vals[o2], pid_el[o2]
    dup = np.zeros(len(v2), dtype=bool)
    if len(v2) > 1:
        dup[1:] = (v2[1:] == v2[:-1]) & (p2[1:] == p2[:-1])
    inter = np.bincount(p2[dup], minlength=npairs)
    sizes = np.bincount(pid_el, minlength=npairs)  # |A| + |B| per pair
    union = sizes - inter
    firsts = np.flatnonzero(new)
    keep = (rows_per_pair == 2) & \
        (inter / np.maximum(1, union) >= threshold)
    return pa.table({
        "a": pa.array(a_s[firsts][keep], pa.int64()),
        "b": pa.array(b_s[firsts][keep], pa.int64()),
        "n_common": pa.array(inter[keep].astype(np.int64), pa.int64()),
        "n_union": pa.array(union[keep].astype(np.int64), pa.int64()),
    })


def minhash_dup_pairs(docs, *, threshold: float = 0.7,
                      num_perm: int = DEFAULT_NUM_PERM,
                      bands: int = DEFAULT_BANDS,
                      k: int = DEFAULT_SHINGLE_K):
    """MinHash+LSH near-dup pairs, verified by exact shingle Jaccard.

    Pipeline: signatures -> band rows -> groupby (band, band_hash) ->
    candidate pairs (map_groups) -> pair dedup -> hash-shuffle JOIN of
    the candidates back to ``documents`` on doc_id -> per-pair exact
    Jaccard in map_groups.  Fully distributed: no driver-side text dict,
    no corpus scan — the only driver value is the candidate row count.
    Returns (a, b, n_common, n_union) — INTEGER-exact shingle-set overlap
    (a DuckDB shingle-join oracle value-checks it; see
    queries/registry.py _MINHASH_SQL).  LSH candidate generation has no
    false positives after the exact verify; false negatives at the
    threshold are the banding miss probability (1 - s^r)^b — 2e-4 at
    s=0.8 with the default 16x4 banding, and zero on the driver fixtures
    (every qualifying pair is found; pinned by the value-checked gate).
    """
    import ray

    from ..stages.exchange import grouped_exchange

    band_rows = minhash_signatures(docs, num_perm=num_perm, bands=bands,
                                   k=k).materialize()

    # heavy-key prefilter: a vectorized count finds the buckets with
    # >= 2 docs (only real near-dup clusters); per-group Python work
    # then runs on THOSE groups only, not one call per (band, band_hash)
    # of the whole corpus (the round-1 latency hot spot).  The hot-key
    # set is broadcast (ray.put) — it is O(#dup clusters), tiny.
    # grouped_exchange, not Dataset groupby: #groups here is ~docs*bands
    # and Ray Data's aggregate accumulates per group in Python.
    hot = grouped_exchange(band_rows, ["band", "band_hash"],
                           [("count", "", "c")]).filter(expr="c >= 2")
    hot_keys = np.unique(pa.concat_tables(
        ray.get(hot.to_arrow_refs())).column("band_hash").to_numpy())
    if len(hot_keys) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    hot_ref = ray.put(hot_keys)

    def only_hot(t: pa.Table) -> pa.Table:
        mask = np.isin(t.column("band_hash").to_numpy(), ray.get(hot_ref))
        return t.filter(pa.array(mask))

    def emit_pairs_part(t: pa.Table) -> pa.Table:
        """ALL hot buckets of one hash partition in a single pass: one
        lexsort groups (band, band_hash); per-row partner counts turn
        variable-size group cliques into one repeat/arange enumeration
        (no per-bucket Python).  Buckets above HOT_BUCKET_CLIQUE_CAP
        emit the STAR to the bucket-min doc_id — the 100 TB guard: one
        boilerplate cluster (cookie banners, parked domains) can put
        1e5-1e6 docs in ONE bucket = 1e10+ clique pairs; the star is
        O(n) and preserves the connectivity the dedup keepmap's
        union-find needs (pair LISTS for such buckets are the star
        only, by documented contract — gate-scale buckets are far
        below the cap)."""
        bnd = t.column("band").to_numpy()
        h = t.column("band_hash").to_numpy()
        d = t.column("doc_id").to_numpy()
        order = np.lexsort((d, h, bnd))
        bnd, h, d = bnd[order], h[order], d[order]
        n = len(d)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if n < 2:
            return empty
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (bnd[1:] != bnd[:-1]) | (h[1:] != h[:-1])
        gid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n) - starts[gid]          # rank within bucket
        gsz = sizes[gid]
        # partner count per ROW: clique -> size-1-pos; star -> size-1
        # at pos 0 else 0.  Partners are always the CONTIGUOUS rows
        # after this one, so b = a + 1 + within for both shapes.
        cnt = np.where(gsz > HOT_BUCKET_CLIQUE_CAP,
                       np.where(pos == 0, gsz - 1, 0),
                       gsz - 1 - pos).astype(np.int64)
        total = int(cnt.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(cnt) - cnt, cnt))
        b_idx = a_idx + 1 + within
        return pa.table({"a": pa.array(d[a_idx], pa.int64()),
                         "b": pa.array(d[b_idx], pa.int64())})

    # projection happens in post (inside the reduce task): Ray Data's
    # Project operator passes zero-row blocks through UNprojected, which
    # poisons downstream joins with mixed schemas
    from ..stages.exchange import keyed_partition_exchange
    cand_pairs = keyed_partition_exchange(
        band_rows.map_batches(only_hot, batch_format="pyarrow",
                              zero_copy_batch=True),
        ["band", "band_hash"], emit_pairs_part)
    pairs = grouped_exchange(
        cand_pairs, ["a", "b"], [("count", "", "c")],
        post=_project_ab).materialize()  # candidates: tiny vs the corpus
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "n_union": pa.array([], pa.int64())})
    if pairs.count() == 0:
        return empty

    # distinct candidate doc ids (small side of the semi-join)
    need = grouped_exchange(pairs.map_batches(
        lambda t: pa.table({"doc_id": np.unique(np.concatenate(
            [t.column("a").to_numpy(), t.column("b").to_numpy()]))}),
        batch_format="pyarrow"),
        ["doc_id"], [("count", "", "c")],
        post=lambda t: t.select(["doc_id"]))

    # shingle sets for candidate docs only (semi-join prunes the corpus)
    from ..common import strip_meta
    from ..pipelines.ingest import join_partitions
    cand_docs = strip_meta(docs.select_columns(["doc_id", "text"])).join(
        need, join_type="inner", num_partitions=join_partitions(),
        on=("doc_id",))
    sh_sets = cand_docs.map_batches(shingle_sets_batch, batch_format="pyarrow",
                                    fn_kwargs={"k": k}, batch_size=256)

    # pairs -> two keyed rows each, join shingle sets on doc_id
    def explode(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return pa.table({
            "a": np.concatenate([a, a]),
            "b": np.concatenate([b, b]),
            "doc_id": np.concatenate([a, b]),
        })

    pair_rows = pairs.map_batches(explode, batch_format="pyarrow").join(
        sh_sets, join_type="inner", num_partitions=join_partitions(),
        on=("doc_id",))

    # exact verify: hash exchange on the pair key + ONE vectorized
    # intersect pass per partition (no per-pair Python — the former
    # groupby(["a","b"]).map_groups paid a pandas call per candidate
    # pair, the classic per-group-Python wall at millions of pairs)
    import ray.data as rd

    from ..stages.exchange import _count_rows
    # partition count tracks the candidate volume: tiny pair sets (the
    # gate scale) verify in ONE task instead of paying a P-way split +
    # reduce fan-out; the P choice is keyed on the global pair count,
    # so results stay parallelism-invariant
    outs = pair_verify_exchange(pair_rows, _pair_verify_reduce,
                                threshold, n_cand=pairs.count())
    counts = ray.get([_count_rows.remote(r) for r in outs])
    kept = [r for r, n in zip(outs, counts) if n]
    return rd.from_arrow_refs(kept if kept else outs[:1])


# -------------------------------------------------------- n-gram Jaccard

# Exact all-pairs runs only for groups up to this many docs (and a dense
# membership-matrix budget, below); larger groups route through a
# 2-permutation MinHash sub-bucket — the documented overflow path that
# removes the r3/r4 "quadratic per source group" scale flag.
TOKEN_JACCARD_GROUP_CAP = 2048
TOKEN_JACCARD_BUCKET_CAP = 256      # sub-bucket clique cap (star above)
_TJ_DENSE_BUDGET = 1 << 28          # max n_docs * vocab-CHUNK cells


def _clique_jaccard(ids, codes, rows, n):
    """Exact all-pairs token-set overlap for ONE clique of ``n`` docs
    (``ids`` ascending): distinct tokens become compact codes, docs rows
    of a 0/1 membership matrix, all intersections from ``B @ B.T``
    matmuls (float32 exact for counts < 2^24).  Vocabularies larger
    than the dense budget accumulate over COLUMN CHUNKS — bounded
    memory, identical exact counts — so every group up to
    TOKEN_JACCARD_GROUP_CAP stays on the exact path regardless of
    vocab size (the documented contract).  Returns (a, b, n_common,
    n_union) arrays."""
    uc, inv = np.unique(codes, return_inverse=True)
    ncodes = len(uc)
    chunk = max(1, min(ncodes, _TJ_DENSE_BUDGET // max(1, n)))
    common = np.zeros((n, n), np.int64)
    d = np.zeros(n, np.int64)
    for lo in range(0, ncodes, chunk):
        hi = lo + chunk
        sel = (inv >= lo) & (inv < hi)
        B = np.zeros((n, min(chunk, ncodes - lo)), np.float32)
        B[rows[sel], inv[sel] - lo] = 1.0    # duplicates collapse to 1
        d += B.sum(axis=1).astype(np.int64)
        common += (B @ B.T).astype(np.int64)
    iu, ju = np.triu_indices(n, k=1)
    nc = common[iu, ju]
    return ids[iu], ids[ju], nc, d[iu] + d[ju] - nc


def _star_jaccard(ids, codes, rows, n):
    """Exact (min-doc, other) overlaps for one oversized bucket — O(E)
    instead of the clique's O(n^2): each doc intersects only the bucket's
    min doc_id (``ids`` ascending so ids[0] is the hub), preserving the
    connectivity a downstream dedup union-find needs (the minhash
    HOT_BUCKET_CLIQUE_CAP contract)."""
    order = np.lexsort((codes, rows))
    cs, rs = codes[order], rows[order]
    keep = np.empty(len(cs), bool)
    keep[0] = True
    keep[1:] = (cs[1:] != cs[:-1]) | (rs[1:] != rs[:-1])
    cs, rs = cs[keep], rs[keep]          # per-doc distinct codes
    d = np.bincount(rs, minlength=n)
    hub = cs[rs == 0]                    # sorted distinct codes of doc 0
    pos = np.searchsorted(hub, cs)
    member = (pos < len(hub)) & (hub[np.minimum(pos, len(hub) - 1)] == cs)
    nc = np.bincount(rs[member], minlength=n)
    return (np.full(n - 1, ids[0]), ids[1:],
            nc[1:].astype(np.int64), (d[0] + d[1:] - nc[1:]).astype(np.int64))


def token_jaccard_pairs(docs):
    """Within-source pairwise token-set overlap: (a, b, n_common, n_union)
    for a < b in the same ``source`` group — integer-exact (SQL-checked)
    for groups up to TOKEN_JACCARD_GROUP_CAP docs (the gate scale).

    Scale contract (the r3/r4 quadratic flag, closed): groups larger
    than the cap are sub-keyed by a 2-permutation MinHash bucket over
    the token set (collision probability ~= J^2 — high-similarity pairs,
    the ones this operator exists to find, almost surely share a
    bucket), so one crawl host with 1e6 docs costs O(n * bucket) pairs,
    never the 1e12 clique.  Sub-buckets above TOKEN_JACCARD_BUCKET_CAP
    (boilerplate clusters) emit the STAR to the bucket-min doc — exact
    values, connectivity-preserving, O(bucket) output (the minhash
    hot-bucket contract).  Values emitted on every path are EXACT
    set-overlap counts; only recall is approximate above the cap.

    Vectorized: no per-pair Python set ops; the only Python loop is over
    sub-buckets (O(group/bucket_cap) iterations)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        n = len(ids)
        empty = pd.DataFrame({
            "a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
            "n_common": np.empty(0, np.int64),
            "n_union": np.empty(0, np.int64)})
        if n < 2:
            return empty
        toks = pc.split_pattern(pa.array(g["text"], pa.string()),
                                pattern=" ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = _flat_tokens(toks)
        codes = flat.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(n), lens)
        if n <= TOKEN_JACCARD_GROUP_CAP:
            a, b, nc, nu = _clique_jaccard(ids, codes, rows, n)
            return pd.DataFrame({"a": a, "b": b, "n_common": nc,
                                 "n_union": nu})
        # ---- overflow route: 2-perm MinHash sub-buckets ----
        h1 = _splitmix64(codes.astype(_U64))
        h2 = _splitmix64(h1 ^ _GOLDEN)
        starts = _row_starts(lens)[lens > 0]
        m1 = np.full(n, _MASK, _U64)
        m2 = np.full(n, _MASK, _U64)
        nz = lens > 0
        m1[nz] = np.minimum.reduceat(h1, starts)
        m2[nz] = np.minimum.reduceat(h2, starts)
        bucket = _splitmix64(m1 ^ _splitmix64(m2))
        doc_order = np.argsort(bucket, kind="stable")  # id-sorted within
        bsorted = bucket[doc_order]
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = bsorted[1:] != bsorted[:-1]
        bstarts = np.flatnonzero(new)
        bends = np.append(bstarts[1:], n)
        # element arrays reordered to the bucket-sorted doc order
        new_pos = np.empty(n, np.int64)
        new_pos[doc_order] = np.arange(n)
        el_rows = new_pos[rows]
        el_order = np.argsort(el_rows, kind="stable")
        codes_s, rows_s = codes[el_order], el_rows[el_order]
        el_cuts = np.concatenate([[0], np.cumsum(lens[doc_order])])
        ids_s = ids[doc_order]
        outs = []
        for bs, be in zip(bstarts, bends):
            bn = be - bs
            if bn < 2:
                continue
            sl = slice(el_cuts[bs], el_cuts[be])
            bc = codes_s[sl]
            br = rows_s[sl] - bs
            bi = ids_s[bs:be]
            fn = _star_jaccard if bn > TOKEN_JACCARD_BUCKET_CAP \
                else _clique_jaccard
            outs.append(fn(bi, bc, br, bn))
        if not outs:
            return empty
        return pd.DataFrame({
            "a": np.concatenate([o[0] for o in outs]),
            "b": np.concatenate([o[1] for o in outs]),
            "n_common": np.concatenate([o[2] for o in outs]),
            "n_union": np.concatenate([o[3] for o in outs])})

    return (docs.select_columns(["doc_id", "source", "text"])
            .groupby("source").map_groups(pairs, batch_format="pandas"))


# ------------------------------------------------------ near-dup keep map

# Above this many verified pairs the cluster labeling runs as the
# distributed min-label Dataset loop; below it, a driver union-find.
# P-invariant (keyed on the global pair count), like the engine's
# SMALL_CONTRACT_ROWS branch.  20M pairs ~ 320 MB of driver arrays.
DRIVER_UF_PAIRS = 20_000_000


def _uf_min_labels(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """Vectorized union-find -> (nodes sorted, min-member label per
    node).  Dense-codes the touched ids first; path-halving loop is
    O(E alpha) with numpy batch hops."""
    nodes = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(nodes, a)
    cb = np.searchsorted(nodes, b)
    parent = np.arange(len(nodes), dtype=np.int64)
    # iterate: point each endpoint's root at the min root; converges in
    # O(log n) sweeps because tree heights halve every pass
    while True:
        # full path compression by pointer doubling
        while True:
            gp = parent[parent]
            if np.array_equal(gp, parent):
                break
            parent = gp
        ra, rb = parent[ca], parent[cb]
        if np.array_equal(ra, rb):
            break
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        # scatter-min: np.minimum.at handles duplicate hi targets
        np.minimum.at(parent, hi, lo)
    return nodes, nodes[parent]


def near_dup_keepmap(docs, *, threshold: float = 0.5, max_iter: int = 32,
                     pairs=None, **minhash_kw):
    """Complete dedup decision table: (doc_id, keep_id) for EVERY doc,
    where keep_id = min doc_id of the doc's near-duplicate cluster
    (connected component of the MinHash-verified pair graph; singletons
    keep themselves).

    Scale shape: the verified pair set is O(#near-dups) << corpus by
    construction.  Below DRIVER_UF_PAIRS the components come from a
    vectorized driver union-find and the (node -> min-member) map is
    BROADCAST (ray.put) into a per-batch searchsorted lookup over
    ``documents`` — no shuffle join touches the corpus.  Above the
    threshold, a distributed min-label-propagation Dataset loop labels
    the pair graph first (rounds = cluster diameter; SUM(label) is the
    strictly-decreasing convergence witness), then the same broadcast
    would be replaced by a shuffle join — documented partitioning
    assumption: pair-graph components fit the loop's groupby."""
    import ray
    import ray.data as rd

    from ..stages.exchange import grouped_exchange

    if pairs is None:
        pairs = minhash_dup_pairs(docs, threshold=threshold, **minhash_kw)
    ids = docs.select_columns(["doc_id"])
    add_self = lambda t: t.append_column("keep_id", t.column("doc_id"))
    if isinstance(pairs, pa.Table):   # no candidate buckets at all
        return ids.map_batches(add_self, batch_format="pyarrow",
                               zero_copy_batch=True)
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ids.map_batches(add_self, batch_format="pyarrow",
                               zero_copy_batch=True)

    from ..common import gather_table
    if n_pairs <= DRIVER_UF_PAIRS:
        tbl = gather_table(pairs).combine_chunks()
        nodes, labels = _uf_min_labels(tbl.column("a").to_numpy(),
                                       tbl.column("b").to_numpy())
    else:
        # ---- distributed min-label propagation over the pair edges ----
        # join fan-out sized to the session (hash-shuffle aggregator
        # actors hold CPU slots; oversizing deadlocks small sessions)
        n_join = max(2, min(32, int(ray.cluster_resources()
                                    .get("CPU", 8)) // 2))

        def sym(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy()
            b = t.column("b").to_numpy()
            return pa.table({"src": np.concatenate([a, b]),
                             "dst": np.concatenate([b, a])})

        edges = pairs.map_batches(sym, batch_format="pyarrow") \
            .materialize()
        lab = grouped_exchange(edges.map_batches(
            lambda t: pa.table({"node": t.column("src"),
                                "label": t.column("src")}),
            batch_format="pyarrow"),
            ["node"], [("min", "label", "label")]).materialize()
        prev_sum = lab.sum("label")
        for _ in range(max_iter):
            msgs = (edges.join(
                lab.map_batches(lambda t: pa.table({
                    "src": t.column("node"), "label": t.column("label")}),
                    batch_format="pyarrow"),
                join_type="inner", num_partitions=n_join, on=("src",))
                .map_batches(lambda t: pa.table({
                    "node": t.column("dst"), "label": t.column("label")}),
                    batch_format="pyarrow"))
            lab = grouped_exchange(
                msgs.union(lab), ["node"],
                [("min", "label", "label")]).materialize()
            cur = lab.sum("label")
            if cur == prev_sum:     # labels only decrease -> fixpoint
                break
            prev_sum = cur
        t = gather_table(lab).combine_chunks()
        order = np.argsort(t.column("node").to_numpy())
        nodes = t.column("node").to_numpy()[order]
        labels = t.column("label").to_numpy()[order]

    map_ref = ray.put((nodes, labels))

    def fill(t: pa.Table) -> pa.Table:
        nd, lb = ray.get(map_ref)
        d = t.column("doc_id").to_numpy()
        pos = np.searchsorted(nd, d)
        pos_c = np.clip(pos, 0, len(nd) - 1)
        hit = nd[pos_c] == d
        keep = np.where(hit, lb[pos_c], d)
        return pa.table({"doc_id": d, "keep_id": keep})

    return ids.map_batches(fill, batch_format="pyarrow",
                           zero_copy_batch=True)


# --------------------------------------------- corpus packing / splitting

def pack_docs(docs, capacity: int = 256):
    """Sequence-packing metadata: concatenate the corpus in doc_id order
    and cut it into fixed ``capacity``-token training windows.

    Returns (doc_id, n_tokens, start_offset, bin_id, bin_pos) where
    ``start_offset`` is the exclusive prefix sum of token counts in
    doc_id order, ``bin_id = start_offset // capacity`` the window the
    document STARTS in and ``bin_pos`` its token offset inside that
    window (long documents straddle windows — the downstream tokenizer
    slices by offset).

    The wide step is :func:`stages.scan.ordered_prefix_scan` — a
    range-exchange scan whose driver traffic is O(P) partial totals;
    nothing row-sized leaves the workers.  SQL-equivalent:
    ``SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.
    """
    from ..stages.scan import ordered_prefix_scan

    cap = np.int64(capacity)

    def counts(batch: pa.Table) -> pa.Table:
        _, lens = _tokens(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(lens, pa.int64())})

    def bins(t: pa.Table) -> pa.Table:
        off = t.column("start_offset").to_numpy()
        return t.append_column(
            "bin_id", pa.array(off // cap, pa.int64())).append_column(
            "bin_pos", pa.array(off % cap, pa.int64()))

    return ordered_prefix_scan(
        docs.map_batches(counts, batch_format="pyarrow",
                         zero_copy_batch=True),
        "doc_id", "n_tokens", out_col="start_offset", post=bins)


SPLIT_BUCKETS = 1000
SPLIT_TRAIN, SPLIT_VAL = 900, 950   # 90 / 5 / 5


def train_split_batch(batch: pa.Table) -> pa.Table:
    """Deterministic train/val/test split: splitmix64(doc_id) % 1000
    against fixed thresholds — pure content-independent id hashing, so
    the assignment is stable under any repartitioning/reordering and
    needs no shuffle at all (embarrassingly parallel per batch)."""
    ids = batch.column("doc_id").to_numpy()
    bucket = (_splitmix64(ids.astype(_U64)) % _U64(SPLIT_BUCKETS)) \
        .astype(np.int64)
    split = np.where(bucket < SPLIT_TRAIN, "train",
                     np.where(bucket < SPLIT_VAL, "val", "test"))
    return pa.table({"doc_id": batch.column("doc_id"),
                     "bucket": pa.array(bucket, pa.int64()),
                     "split": pa.array(split, pa.string())})


# ------------------------------------------------------ curation pipeline

def curation_signals_batch(batch: pa.Table) -> pa.Table:
    """ONE fused per-row pass for the curation pipeline: (doc_id,
    h_hi, h_lo, pred_lang, score) — full 128-bit md5 as two int64 key
    columns (exact dedup identity, numeric so the grouped exchange can
    shuffle it), language id and quality score.  Row-local: no state,
    no shuffle, embarrassingly parallel."""
    lang = langid_batch(batch)
    score = quality_score_batch(batch)
    texts = batch.column("text").to_pylist()
    dig = np.frombuffer(
        b"".join(hashlib.md5(t.encode("utf-8")).digest() for t in texts),
        dtype=">u8").reshape(-1, 2) if texts else \
        np.empty((0, 2), dtype=">u8")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "h_hi": pa.array(dig[:, 0].astype(np.uint64).view(np.int64),
                         pa.int64()),
        "h_lo": pa.array(dig[:, 1].astype(np.uint64).view(np.int64),
                         pa.int64()),
        "pred_lang": lang.column("pred_lang"),
        "score": score.column("score"),
    })


def curate(docs, lang: str = "en", min_score: float = 0.5,
           num_join_partitions: int = 8):
    """Flagship training-data curation pipeline: keep documents that are
    (a) in ``lang``, (b) above the quality bar, and (c) the canonical
    (min doc_id) copy of their exact-duplicate cluster AMONG SURVIVORS.

    Shape at 100 TB: the cheap row-local filters run first (one fused
    pass, no shuffle), so only survivors enter the dedup exchange; the
    dedup groups on the full 128-bit md5 (two int64 key columns through
    the grouped exchange — no truncated-hash collisions at corpus
    scale); the keep table joins back by a hash-shuffle Dataset.join.

    Returns (doc_id, score, n_copies) sorted by the join partitioning.
    """
    sig = docs.map_batches(curation_signals_batch,
                           batch_format="pyarrow", zero_copy_batch=True)

    def survivors(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t.column("pred_lang"), lang),
                       pc.greater_equal(t.column("score"), min_score))
        return t.filter(keep).select(["doc_id", "h_hi", "h_lo", "score"])

    surv = sig.map_batches(survivors, batch_format="pyarrow",
                           zero_copy_batch=True)
    from ..stages.exchange import grouped_exchange
    keep = grouped_exchange(
        surv, ["h_hi", "h_lo"],
        [("min", "doc_id", "keep_id"), ("count", "doc_id", "n_copies")],
        post=lambda t: t.select(["keep_id", "n_copies"]))
    joined = surv.join(keep, join_type="inner",
                       num_partitions=num_join_partitions,
                       on=("doc_id",), right_on=("keep_id",))
    return joined.select_columns(["doc_id", "score", "n_copies"])


def stratified_sample(docs, k: int = 25):
    """Deterministic per-source quota sample ("data mixing"): the k
    docs with the smallest splitmix64(doc_id) per source.

    Hash-ranked, so the sample is a pure function of (doc_id, source) —
    stable under any repartitioning, resumable, no RNG state.  The
    map-side prune keeps at most k rows per source PER BLOCK before the
    shuffle, so the wide step moves O(k * sources * blocks) rows, never
    the corpus; the hash is a 64-bit bijection on unique ids, so there
    are no rank ties at any scale."""
    kk = int(k)

    def prune(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        h = _splitmix64(ids.astype(_U64))
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        # numeric exchange key: 64-bit hash of the source string —
        # placement only, the reduce groups by the exact string
        skey = _splitmix64(_poly_hash_flat(
            *_str_bytes(t.column("source")))).view(np.int64)
        order = np.lexsort((h, src.astype(str)))
        s_sorted = src[order]
        new = np.concatenate([[True], s_sorted[1:] != s_sorted[:-1]]) \
            if len(order) else np.empty(0, bool)
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        pos = np.arange(len(order)) - starts[grp] if len(order) else \
            np.empty(0, np.int64)
        keep = order[pos < kk]
        return pa.table({
            "source": pa.array(list(src[keep]), pa.string()),
            "doc_id": pa.array(ids[keep], pa.int64()),
            "rk": pa.array(h[keep].view(np.int64), pa.int64()),
            "skey": pa.array(skey[keep], pa.int64()),
        })

    pruned = docs.select_columns(["doc_id", "source"]).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True)

    def final_part(t: pa.Table) -> pa.Table:
        """All sources of one hash partition in a single lexsort pass
        (group by the exact string via dictionary codes — the skey
        exchange key only places rows)."""
        src = t.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        codes = src.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        u = t.column("rk").to_numpy().view(np.uint64)
        order = np.lexsort((u, codes))
        cs = codes[order]
        n = len(cs)
        if n == 0:
            return t.select(["source", "doc_id"])
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(new)
        pos = np.arange(n) - starts[np.cumsum(new) - 1]
        sel = order[pos < kk]
        return t.take(pa.array(np.sort(sel))).select(["source", "doc_id"])

    from ..stages.exchange import keyed_partition_exchange
    return keyed_partition_exchange(pruned, ["skey"], final_part)
