"""QUERIES / ORACLE_SQL — the driver-facing registry (__ray_entry__).

Every SURVEY.md §2 operator implemented so far has an entry; entries with
a DuckDB-expressible semantics also carry an oracle SQL string (column
names match exactly — the driver hash-compares values after sorting
columns by name).  Fixed-iteration algorithms are value-checked via
recursive-CTE oracles (CC, LPA integer-exact; PageRank floor-quantized
to 1e-8 — see graphs._PR_SQL).  The remaining rows-only entries
(Louvain and friends: data-dependent float optimization) have their
numeric parity pinned by the oracle-kernel tests in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import ray.data as rd

from . import events as ev
from . import graphs as g
from . import relational as rel
from ..text import ops as tx
from ..embed import ops as em

ANN_QUERIES = 16
ANN_K = 10
# calibrated to the synthetic embeddings table: >=1 qualifying pair at
# sf0.001/0.01/0.1 (7/14/144), so the hash-checked gate is never vacuous
NEAR_DUP_THRESHOLD = 0.45
NORM_TOPK = 20


from ..common import strip_meta


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return strip_meta(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=columns))


def _emb(sf_dir: str) -> rd.Dataset:
    return strip_meta(rd.read_parquet(f"{sf_dir}/embeddings.parquet"))


# ------------------------------------------------------------ text queries

def q_doc_tokens(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.TokenStats, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4))


def q_doc_bpe_tokens(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.bpe_token_count_batch, batch_format="pyarrow",
        zero_copy_batch=True)


def q_mm_frames(sf_dir: str):
    """Frame-sampling multimodal stage end-to-end (see FrameSampler):
    1 -> K row expansion with binary-window fingerprints, value-checked
    against the hex-substring SQL oracle."""
    import pyarrow as _pa

    from ..stages.multimodal import FrameSampler

    docs = _docs(sf_dir, ["doc_id", "text"])

    def to_media(t: "_pa.Table") -> "_pa.Table":
        return _pa.table({"id": t.column("doc_id"),
                          "media": t.column("text").cast(_pa.binary())})

    frames = (docs.map_batches(to_media, batch_format="pyarrow",
                               zero_copy_batch=True)
              .map_batches(FrameSampler, batch_format="pyarrow",
                           concurrency=(1, 4), batch_size=128))

    def project(t: "_pa.Table") -> "_pa.Table":
        return t.rename_columns(
            ["doc_id", "frame_idx", "f_len", "f_fingerprint"])

    return frames.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_doc_quality(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_quality_score(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.quality_score_batch, batch_format="pyarrow",
        zero_copy_batch=True)


def q_doc_dedup_exact(sf_dir: str):
    return tx.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_fingerprint(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_mm_media_features(sf_dir: str):
    """Multimodal binary-column stage end-to-end (documents' utf-8 bytes
    stand in for opaque media payloads; no media libs in this env): the
    actor-pool extractor decodes a deterministic fake feature per row;
    the gate value-checks the bytes that flowed through the pool
    (n_bytes + rolling-hash fingerprint).  The feature column is
    exercised but projected away (codec-internal, not SQL-expressible)."""
    import pyarrow as _pa

    from ..stages.multimodal import MediaFeatureExtractor

    docs = _docs(sf_dir, ["doc_id", "text"])

    def to_media(t: "_pa.Table") -> "_pa.Table":
        return _pa.table({"id": t.column("doc_id"),
                          "media": t.column("text").cast(_pa.binary())})

    feats = (docs.map_batches(to_media, batch_format="pyarrow",
                              zero_copy_batch=True)
             .map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          concurrency=(1, 4), batch_size=128))

    def project(t: "_pa.Table") -> "_pa.Table":
        return _pa.table({"doc_id": t.column("id"),
                          "n_bytes": t.column("n_bytes"),
                          "fingerprint": t.column("fingerprint")})

    return feats.map_batches(project, batch_format="pyarrow",
                             zero_copy_batch=True)


def q_doc_langid(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.langid_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_simhash(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.simhash_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_simhash_pairs(sf_dir: str):
    """Banded-Hamming SimHash near-dup pairs (exact recall at the
    hamming<=3 threshold; oracle: self-join on bit_count(xor))."""
    return tx.simhash_dup_pairs(_docs(sf_dir, ["doc_id", "text"]))


# doc_minhash_pairs and doc_dedup_near share the verified pair table;
# compute it once per process (same pattern as graphs._DS_CACHE)
_MH_PAIRS_CACHE: dict[str, object] = {}


def _minhash_pairs(sf_dir: str):
    r = _MH_PAIRS_CACHE.get(sf_dir)
    if r is None:
        r = tx.minhash_dup_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                 threshold=0.5)
        if isinstance(r, rd.Dataset):
            r = r.materialize()
        _MH_PAIRS_CACHE[sf_dir] = r
    return r


def q_doc_minhash_pairs(sf_dir: str):
    return _minhash_pairs(sf_dir)


def q_doc_token_jaccard(sf_dir: str):
    return tx.token_jaccard_pairs(_docs(sf_dir,
                                        ["doc_id", "source", "text"]))


def q_doc_dedup_near(sf_dir: str):
    """Near-dup dedup decision table: (doc_id, keep_id) for every doc —
    min doc_id of its MinHash-verified near-dup cluster (distributed
    min-label propagation over the pair graph; see
    text/ops.near_dup_keepmap)."""
    return tx.near_dup_keepmap(_docs(sf_dir, ["doc_id", "text"]),
                               threshold=0.5, pairs=_minhash_pairs(sf_dir))


PACK_CAPACITY = 256
CURATE_MIN_SCORE = 0.5


def q_doc_curation(sf_dir: str):
    """Flagship curation pipeline: language filter + quality bar + exact
    dedup among survivors, composed end-to-end (see text/ops.curate) —
    one fused row-local pass, one grouped exchange on the 128-bit md5,
    one hash join back."""
    return tx.curate(_docs(sf_dir, ["doc_id", "text"]),
                     lang="en", min_score=CURATE_MIN_SCORE)


def q_doc_pack(sf_dir: str):
    """Sequence-packing metadata (concat-and-chunk): exclusive prefix
    sum of token counts in doc_id order via the distributed range-
    exchange scan (stages/scan.ordered_prefix_scan) -> window id +
    offset per document."""
    return tx.pack_docs(_docs(sf_dir, ["doc_id", "text"]),
                        capacity=PACK_CAPACITY)


def q_doc_split(sf_dir: str):
    """Deterministic 90/5/5 train/val/test split by splitmix64(doc_id)
    — stable under repartitioning, no shuffle."""
    return _docs(sf_dir, ["doc_id"]).map_batches(
        tx.train_split_batch, batch_format="pyarrow",
        zero_copy_batch=True)


SAMPLE_PER_SOURCE = 25
TOP_QUALITY_K = 100


def q_doc_top_quality(sf_dir: str):
    """Global top-k by quality score (the 'select the best documents'
    reduction): per-block partial top-k inside map_batches, then one
    tiny driver merge of P*k rows — never a global sort.  Tie-break
    doc_id asc (scores are floor-quantized, ties are real)."""
    import numpy as _np
    import pyarrow as _pa

    from ..common import gather_table

    def topk(t: "_pa.Table") -> "_pa.Table":
        s = t.column("score").to_numpy()
        d = t.column("doc_id").to_numpy()
        order = _np.lexsort((d, -s))[:TOP_QUALITY_K]
        return t.take(_pa.array(order))

    scored = (_docs(sf_dir, ["doc_id", "text"])
              .map_batches(tx.quality_score_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
              .map_batches(topk, batch_format="pyarrow",
                           zero_copy_batch=True))
    return topk(gather_table(scored).combine_chunks())


def q_doc_sample(sf_dir: str):
    """Stratified deterministic quota sample per source (data mixing):
    hash-ranked, map-side pruned before the shuffle."""
    return tx.stratified_sample(_docs(sf_dir, ["doc_id", "source"]),
                                k=SAMPLE_PER_SOURCE)


def q_mm_resize(sf_dir: str):
    """Resize multimodal stage end-to-end (see stages.multimodal.Resizer):
    binary in -> strided-downsample binary out through an actor pool;
    output bytes pinned by length + rolling-hash fingerprint (the SQL-
    checkable half; the resized binary column itself is projected away
    like every payload before a shuffle)."""
    import pyarrow as _pa

    from ..stages.multimodal import Resizer

    docs = _docs(sf_dir, ["doc_id", "text"])

    def to_media(t: "_pa.Table") -> "_pa.Table":
        return _pa.table({"id": t.column("doc_id"),
                          "media": t.column("text").cast(_pa.binary())})

    resized = (docs.map_batches(to_media, batch_format="pyarrow",
                                zero_copy_batch=True)
               .map_batches(Resizer, batch_format="pyarrow",
                            concurrency=(1, 4), batch_size=128))

    def project(t: "_pa.Table") -> "_pa.Table":
        return _pa.table({"doc_id": t.column("id"),
                          "out_bytes": t.column("out_bytes"),
                          "out_fingerprint": t.column("out_fingerprint")})

    return resized.map_batches(project, batch_format="pyarrow",
                               zero_copy_batch=True)


# ------------------------------------------------------- embedding queries

def q_emb_ann(sf_dir: str):
    return em.ann_topk(_emb(sf_dir), n_queries=ANN_QUERIES, k=ANN_K)


def q_emb_ivf_ann(sf_dir: str):
    # exact bound-pruned IVF -> value-hash-checked against the SAME
    # brute-force SQL oracle as emb_ann (recall is 1.0 by construction)
    return em.ivf_ann_topk(_emb(sf_dir), n_queries=ANN_QUERIES, k=ANN_K,
                           key=("ivf", sf_dir))


def q_emb_near_dup(sf_dir: str):
    return em.embedding_near_dup(_emb(sf_dir),
                                 threshold=NEAR_DUP_THRESHOLD,
                                 key=("ivf", sf_dir))


def q_emb_dim_topk(sf_dir: str):
    return em.dim_topk(_emb(sf_dir), dim=0, k=NORM_TOPK)


_STOP_SQL = "['" + "', '".join(tx.STOPWORDS) + "']"


def _profile_sql(lang: str) -> str:
    words = "['" + "', '".join(tx._LANG_PROFILES[lang]) + "']"
    return (f"len(list_filter(toks, x -> list_contains({words}, x))) "
            f"AS {lang}")


# langid is pure integer counts + a deterministic tie-break order + a CJK
# regex — fully SQL-expressible, so it gets a value-hashed oracle.  The
# CASE chain encodes argmax-with-first-max-wins over (en, de, fr, es).
_LANGID_SQL = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             regexp_matches(substring(text, 1, 200), '[一-鿿]') AS cjk
      FROM documents),
    s AS (
      SELECT doc_id, cjk,
             {_profile_sql('en')}, {_profile_sql('de')},
             {_profile_sql('fr')}, {_profile_sql('es')}
      FROM t)
    SELECT doc_id,
           CASE WHEN cjk THEN 'zh'
                WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                WHEN de >= fr AND de >= es THEN 'de'
                WHEN fr >= es THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM s"""

# ---- mod-2^64 SQL arithmetic helpers (fingerprint / simhash oracles) ----
# DuckDB BIGINT/UBIGINT multiplication raises on overflow, so wraparound
# products run in HUGEINT (128-bit) split as x*m = lo(x)*m + (hi(x)*m
# mod 2^32)<<32 (each partial < 2^97, safely inside HUGEINT).
_T64 = "18446744073709551616::HUGEINT"       # 2^64
_B32 = "4294967296::HUGEINT"                 # 2^32
_SM_GOLDEN = "11400714819323198485::HUGEINT"  # 0x9E3779B97F4A7C15
_SM_M1, _SM_M1_LO = "13787848793156543929::HUGEINT", "484763065::HUGEINT"
_SM_M2, _SM_M2_LO = "10723151780598845931::HUGEINT", "321982955::HUGEINT"

# utf-8 bytes of a string as a HUGEINT list (via hex(encode(s)))
_BYTES_OF = (
    "list_transform(range(1, length({h}) // 2 + 1), "
    "i -> CAST(16 * (strpos('0123456789ABCDEF', "
    "substring({h}, 2*i-1, 1)) - 1) "
    "+ strpos('0123456789ABCDEF', substring({h}, 2*i, 1)) - 1 AS HUGEINT))")

# Horner fold fp = fp * FNV_PRIME + byte (mod 2^64) == text/ops.py
# _poly_hash_flat exactly (verified bit-identical at sf0.001/sf0.01)
_POLY_FOLD = (
    "CASE WHEN length({h}) = 0 THEN CAST(0 AS HUGEINT) "
    "ELSE list_reduce(" + _BYTES_OF +
    ", (acc, b) -> (acc * 1099511628211 + b) % " + _T64 + ") END")

_U64_TO_I64 = ("CAST(CASE WHEN {x} >= 9223372036854775808::HUGEINT "
               "THEN {x} - " + _T64 + " ELSE {x} END AS BIGINT)")


def _mulmod_sql(x: str, m: str, m_lo: str) -> str:
    return (f"CAST(((CAST({x} & 4294967295 AS HUGEINT) * {m}) % {_T64} "
            f"+ ((CAST({x} >> 32 AS HUGEINT) * {m_lo}) % {_B32}) * {_B32})"
            f" % {_T64} AS UBIGINT)")


_FINGERPRINT_SQL = f"""
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    f AS (SELECT doc_id, {_POLY_FOLD.format(h='hx')} AS fp FROM h)
    SELECT doc_id, {_U64_TO_I64.format(x='fp')} AS fingerprint FROM f"""

# multimodal stage: n_bytes + payload fingerprint pin the bytes that
# flowed through the actor pool (the feature vector is codec-internal)
_MM_SQL = f"""
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      CAST(octet_length(encode(text)) AS BIGINT)
                        AS n_bytes
               FROM documents),
    f AS (SELECT doc_id, n_bytes, {_POLY_FOLD.format(h='hx')} AS fp
          FROM h)
    SELECT doc_id, n_bytes, {_U64_TO_I64.format(x='fp')} AS fingerprint
    FROM f"""

# frame sampling: K=4 evenly spaced 64-byte windows per payload; byte
# windows are hex-string substrings in SQL, and the integer offset
# arithmetic ((j * max(n-64, 0)) // 3) is identical on both sides
_FRAMES_SQL = f"""
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      CAST(octet_length(encode(text)) AS BIGINT)
                        AS n_bytes
               FROM documents),
    fr AS (SELECT doc_id, n_bytes, hx,
                  CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS frame_idx
           FROM h),
    st AS (SELECT doc_id, frame_idx, hx, n_bytes,
                  (frame_idx * GREATEST(n_bytes - 64, 0)) // 3 AS fstart
           FROM fr),
    ln AS (SELECT doc_id, frame_idx, hx, fstart,
                  LEAST(64, GREATEST(n_bytes - fstart, 0)) AS f_len
           FROM st),
    sx AS (SELECT doc_id, frame_idx, f_len,
                  substring(hx, CAST(fstart * 2 + 1 AS BIGINT),
                            CAST(f_len * 2 AS BIGINT)) AS fhx
           FROM ln),
    f AS (SELECT doc_id, frame_idx, f_len,
                 {_POLY_FOLD.format(h='fhx')} AS fp FROM sx)
    SELECT doc_id, frame_idx, f_len,
           {_U64_TO_I64.format(x='fp')} AS f_fingerprint
    FROM f"""

# 64 majority-vote bit aggregates recombined into the signed simhash
_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
    f"THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)" for b in range(64))

_SIMHASH_SQL = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    hx AS (SELECT doc_id, hex(encode(tok)) AS hx FROM tok),
    ph AS (SELECT doc_id, {_POLY_FOLD.format(h='hx')} AS fp FROM hx),
    s0 AS (SELECT doc_id,
                  CAST((fp + {_SM_GOLDEN}) % {_T64} AS UBIGINT) AS x
           FROM ph),
    s1 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM s0),
    s2 AS (SELECT doc_id,
                  {_mulmod_sql('x', _SM_M1, _SM_M1_LO)} AS x FROM s1),
    s3 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM s2),
    s4 AS (SELECT doc_id,
                  {_mulmod_sql('x', _SM_M2, _SM_M2_LO)} AS x FROM s3),
    s5 AS (SELECT doc_id, xor(x, x >> 31) AS h FROM s4),
    agg AS (SELECT doc_id, {_SIMHASH_BITS} AS sh FROM s5 GROUP BY doc_id)
    SELECT doc_id, {_U64_TO_I64.format(x='sh')} AS simhash FROM agg"""

# score arithmetic mirrors text/ops.quality_score_batch term by term —
# same IEEE double expression tree, floor-quantized (no round-half ties)
_QUALITY_SCORE_SQL = f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
                  x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) AS n_stop,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               AS n_dist
      FROM documents),
    c AS (
      SELECT doc_id,
             LEAST(GREATEST(n_tok / 64.0, 0.0), 1.0) AS lt,
             1.0 - abs(n_stop / GREATEST(n_tok, 1.0) - 0.08) / 0.5
               AS stop_band,
             n_dist / GREATEST(n_tok, 1.0) AS ttr
      FROM s)
    SELECT doc_id,
           floor(LEAST(GREATEST(lt * (0.4
                  + 0.3 * LEAST(GREATEST(stop_band, 0.0), 1.0)
                  + 0.3 * LEAST(GREATEST(ttr * 2.0, 0.0), 1.0)),
                  0.0), 1.0) * 1e6) / 1e6 AS score
    FROM c"""

# exact shingle-set overlap oracle for the MinHash+LSH pipeline: 3-word
# shingles exactly as text/ops._batch_shingle_hashes builds them (docs
# shorter than k collapse to the whole text), intersections via a
# shingle self-join (no all-pairs cross product), jaccard >= 0.5 as the
# identical int/double division the Ray side evaluates.  Values are
# BIGINT counts -> hash-exact.
_MINHASH_THRESHOLD = 0.5
_PAIR_CTES = f"""
    w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        END)) AS s
      FROM w),
    cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    qpairs AS (
      SELECT i.a, i.b, i.n_common,
             ca.n + cb.n - i.n_common AS n_union
      FROM inter i
      JOIN cnt ca ON ca.doc_id = i.a
      JOIN cnt cb ON cb.doc_id = i.b
      WHERE i.n_common /
            CAST(GREATEST(ca.n + cb.n - i.n_common, 1) AS DOUBLE)
            >= {_MINHASH_THRESHOLD})"""
_MINHASH_SQL = ("WITH" + _PAIR_CTES
                + "\n    SELECT a, b, n_common, n_union FROM qpairs")

# near-dup keep map: connected components over the qualifying pair graph
# (min-member-id labels, the same monotone recursive CTE as the CC
# oracle), LEFT JOINed back so every doc appears (singletons keep
# themselves).  Integer-exact.
_NEAR_DEDUP_SQL = ("WITH RECURSIVE" + _PAIR_CTES + f""",
    nsym AS (
      SELECT a AS src, b AS dst FROM qpairs
      UNION
      SELECT b AS src, a AS dst FROM qpairs),
    r(node, lbl) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM nsym)
      UNION
        SELECT e.dst, r.lbl FROM r JOIN nsym e ON e.src = r.node
        WHERE r.lbl < e.dst
    ),
    m AS (SELECT node, MIN(lbl) AS keep_id FROM r GROUP BY node)
    SELECT d.doc_id, COALESCE(m.keep_id, d.doc_id) AS keep_id
    FROM documents d LEFT JOIN m ON m.node = d.doc_id""")

# exact hamming-ball self-join over the bit-reproduced simhash values;
# threshold mirrors text/ops.SIMHASH_MAX_HAMMING
_SIMHASH_PAIRS_SQL = f"""
    WITH sim AS ({_SIMHASH_SQL})
    SELECT s1.doc_id AS a, s2.doc_id AS b,
           CAST(bit_count(xor(s1.simhash, s2.simhash)) AS BIGINT)
             AS hamming
    FROM sim s1 JOIN sim s2 ON s1.doc_id < s2.doc_id
    WHERE bit_count(xor(s1.simhash, s2.simhash)) <= 3"""

# sequence packing: window SUM mirrors the distributed range-exchange
# scan exactly (integer token counts, exclusive frame)
_PACK_SQL = """
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT)
                        AS n_tokens
               FROM documents),
    s AS (SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS start_offset
          FROM t)
    SELECT doc_id, n_tokens, start_offset,
           start_offset // {cap} AS bin_id,
           start_offset % {cap} AS bin_pos
    FROM s"""

# the identical splitmix64 finalizer chain the Ray side runs
# (text/ops._splitmix64) on doc_id, in mod-2^64 HUGEINT SQL — shared by
# the split and stratified-sample oracles
_SPLITMIX_DOC_CTES = f"""
    s0 AS (SELECT doc_id,
           CAST((CAST(doc_id AS HUGEINT) + {_SM_GOLDEN}) % {_T64}
                AS UBIGINT) AS x
           FROM documents),
    s1 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM s0),
    s2 AS (SELECT doc_id,
                  {_mulmod_sql('x', _SM_M1, _SM_M1_LO)} AS x FROM s1),
    s3 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM s2),
    s4 AS (SELECT doc_id,
                  {_mulmod_sql('x', _SM_M2, _SM_M2_LO)} AS x FROM s3),
    s5 AS (SELECT doc_id, xor(x, x >> 31) AS h FROM s4)"""

_SPLIT_SQL = f"""
    WITH {_SPLITMIX_DOC_CTES},
    b AS (SELECT doc_id, CAST(h % 1000 AS BIGINT) AS bucket FROM s5)
    SELECT doc_id, bucket,
           CASE WHEN bucket < 900 THEN 'train'
                WHEN bucket < 950 THEN 'val'
                ELSE 'test' END AS split
    FROM b"""

# stratified per-source quota sample: the SAMPLE_PER_SOURCE docs with
# the smallest splitmix64(doc_id) per source (the hash is a 64-bit
# bijection on unique ids -> no ties, deterministic everywhere)
_SAMPLE_SQL = """
    WITH {cte}
    SELECT d.source, s5.doc_id
    FROM s5 JOIN documents d ON s5.doc_id = d.doc_id
    QUALIFY ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY s5.h)
            <= {k}"""

# resize stage: every F-th byte of the payload, Horner-folded — the
# strided byte list is built straight from the hex encoding
_RESIZE_F = 8
_STRIDED_BYTES = (
    "list_transform(range(0, CAST((n + {f} - 1) // {f} AS BIGINT)), "
    "j -> CAST(16 * (strpos('0123456789ABCDEF', "
    "substring(hx, CAST(2 * {f} * j + 1 AS BIGINT), 1)) - 1) "
    "+ strpos('0123456789ABCDEF', "
    "substring(hx, CAST(2 * {f} * j + 2 AS BIGINT), 1)) - 1 AS HUGEINT))"
).format(f=_RESIZE_F)
_RESIZE_SQL = f"""
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
                      CAST(octet_length(encode(text)) AS BIGINT) AS n
               FROM documents),
    b AS (SELECT doc_id,
                 (n + {_RESIZE_F - 1}) // {_RESIZE_F} AS out_bytes,
                 CASE WHEN n = 0 THEN CAST(0 AS HUGEINT)
                      ELSE list_reduce({_STRIDED_BYTES},
                           (acc, b) -> (acc * 1099511628211 + b)
                                       % {_T64})
                 END AS fp
          FROM h)
    SELECT doc_id, out_bytes,
           {_U64_TO_I64.format(x='fp')} AS out_fingerprint
    FROM b"""

# curation pipeline: filter-then-dedup semantics, min-doc_id canonical
# copy per exact-duplicate cluster among survivors
_CURATION_SQL = f"""
    WITH l AS ({{lang_sql}}), s AS ({{score_sql}}),
    surv AS (
      SELECT d.doc_id, md5(d.text) AS h, s.score
      FROM documents d
      JOIN l ON d.doc_id = l.doc_id
      JOIN s ON d.doc_id = s.doc_id
      WHERE l.pred_lang = 'en' AND s.score >= {CURATE_MIN_SCORE}),
    keep AS (
      SELECT MIN(doc_id) AS doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM surv GROUP BY h)
    SELECT k.doc_id, v.score, k.n_copies
    FROM keep k JOIN surv v ON k.doc_id = v.doc_id"""

def q_doc_dup_ngrams(sf_dir: str):
    """Duplicated-n-gram stats (Gopher/RefinedWeb boilerplate signal):
    per doc, distinct 3-word shingles and how many occur in >= 2 docs
    corpus-wide — two hash exchanges, per-shingle doc sets never leave
    their partition (see text/ops.dup_ngram_stats)."""
    return tx.dup_ngram_stats(_docs(sf_dir, ["doc_id", "text"]), k=3)


def q_emb_lsh_ann(sf_dir: str):
    """Sign-LSH bucketed ANN (the north rule's LSH-bucketed variant):
    deterministic multi-probe bucket rule replayed in SQL, exact cosine
    ranking within the probed buckets."""
    return em.lsh_ann_topk(_emb(sf_dir), n_queries=ANN_QUERIES, k=ANN_K)


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition signals (top-token count, duplicate
    bigrams) — integer-exact per doc, one vectorized pass."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tx.repetition_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=512)


def q_doc_contamination(sf_dir: str):
    """Benchmark-contamination check: per doc, how many of its distinct
    3-word shingles appear in the deterministic benchmark subset
    (doc_id % {tx.CONTAM_MOD} == 0).  The small benchmark shingle set is
    built once (per-block hash+unique tasks) and broadcast via ray.put;
    the corpus side streams — no shuffle."""
    import ray as _ray
    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = tx.benchmark_shingles(docs, tx.DEFAULT_SHINGLE_K)
    bench_ref = _ray.put(bench)
    return docs.map_batches(
        tx.contamination_batch, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=512,
        fn_kwargs={"bench_ref": bench_ref, "k": tx.DEFAULT_SHINGLE_K})


# repetition oracle: per-(doc, token) counts; bigrams via zipped unnest
# (token + 1-based position) and lead() within the doc — the plain
# window shape the other green oracles use.  EVERY output column is
# explicitly CAST to BIGINT so the Arrow schema (and the driver's
# value hash) matches the engine's int64 byte-for-byte: an uncast
# SUM() is HUGEINT -> decimal128 in Arrow and hash-mismatches even
# when values are equal (the round-3 doc_repetition red gate).
_REPETITION_SQL = """
WITH wp AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents),
g AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM wp GROUP BY doc_id, tok),
t AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(MAX(c) AS BIGINT) AS top_count
  FROM g GROUP BY doc_id),
bg AS (
  SELECT doc_id,
         tok || ' ' ||
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM wp),
b AS (
  SELECT doc_id, CAST(COUNT(bigram) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT bigram) AS BIGINT) AS n_distinct_bigrams
  FROM bg GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens, t.top_count, b.n_bigrams,
       b.n_distinct_bigrams
FROM t JOIN b ON b.doc_id = t.doc_id"""

# contamination oracle: exact string shingles (same 3-word CTE shape as
# the MinHash oracle), benchmark set = distinct shingles of the
# doc_id % CONTAM_MOD == 0 subset, membership via LEFT JOIN.
_CONTAM_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    END)) AS s
  FROM w),
bset AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {tx.CONTAM_MOD} = 0)
SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contam
FROM sh LEFT JOIN bset b ON b.s = sh.s
GROUP BY sh.doc_id"""

# duplicated-n-gram oracle: exact string shingles (same 3-word CTE as
# the MinHash / contamination oracles), corpus-wide doc counts per
# shingle, per-doc totals — integer-exact.  The engine counts 64-bit
# shingle hashes (contamination precedent), so a green gate is also a
# collision check.
_DUP_NGRAM_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    END)) AS s
  FROM w),
cnt AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS nd FROM sh GROUP BY s)
SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN cnt.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup
FROM sh JOIN cnt ON cnt.s = sh.s
GROUP BY sh.doc_id"""

TEXT_SQL: dict[str, str] = {
    "doc_dup_ngrams": _DUP_NGRAM_SQL,
    "doc_repetition": _REPETITION_SQL,
    "doc_contamination": _CONTAM_SQL,
    "doc_curation": _CURATION_SQL.format(lang_sql=_LANGID_SQL,
                                         score_sql=_QUALITY_SCORE_SQL),
    "doc_pack": _PACK_SQL.format(cap=PACK_CAPACITY),
    "doc_sample": _SAMPLE_SQL.format(cte=_SPLITMIX_DOC_CTES,
                                     k=SAMPLE_PER_SOURCE),
    "doc_top_quality": f"""
        WITH s AS ({_QUALITY_SCORE_SQL})
        SELECT doc_id, score FROM s
        ORDER BY score DESC, doc_id LIMIT {TOP_QUALITY_K}""",
    "doc_split": _SPLIT_SQL,
    "mm_resize": _RESIZE_SQL,
    "doc_minhash_pairs": _MINHASH_SQL,
    "doc_simhash_pairs": _SIMHASH_PAIRS_SQL,
    "doc_dedup_near": _NEAR_DEDUP_SQL,
    "doc_quality_score": _QUALITY_SCORE_SQL,
    "doc_fingerprint": _FINGERPRINT_SQL,
    "mm_media_features": _MM_SQL,
    "mm_frames": _FRAMES_SQL,
    "doc_simhash": _SIMHASH_SQL,
    "doc_tokens": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents""",
    "doc_bpe_tokens": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '{tx.BPE_TOKEN_PAT}')) AS BIGINT) AS n_bpe
        FROM documents""",
    "doc_quality": f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains({_STOP_SQL}, x))) AS BIGINT)
                 AS n_stop,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                 AS n_distinct
        FROM documents""",
    "doc_dedup_exact": """
        SELECT md5(text) AS content_hash,
               MIN(doc_id) AS keep_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)""",
    "doc_langid": _LANGID_SQL,
    "doc_token_jaccard": """
        WITH tok AS (
          SELECT doc_id, source,
                 list_distinct(string_split(text, ' ')) AS toks
          FROM documents)
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
                 AS n_common,
               CAST(len(list_distinct(list_concat(a.toks, b.toks)))
                    AS BIGINT) AS n_union
        FROM tok a JOIN tok b
          ON a.source = b.source AND a.doc_id < b.doc_id""",
}

_ANN_EXACT_SQL = f"""
        WITH q AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id < {ANN_QUERIES})
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
                         CAST(q.embedding AS DOUBLE[]),
                         CAST(e.embedding AS DOUBLE[])) DESC,
                     e.vec_id) <= {ANN_K}"""

# sign-LSH oracle: the SAME deterministic bucket rule (sign bits of the
# first 8 raw float32 coordinates), hamming<=1 multi-probe, exact
# cosine ranking within the probed set — the bucket rule is operator
# semantics, so the gate value-checks the LSH variant end-to-end.
_LSH_BUCKET_EXPR = " + ".join(
    f"(CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(8))
_LSH_ANN_SQL = f"""
        WITH b AS (
          SELECT vec_id, embedding,
                 CAST({_LSH_BUCKET_EXPR} AS BIGINT) AS bucket
          FROM embeddings),
        q AS (SELECT vec_id, embedding, bucket FROM b
              WHERE vec_id < {ANN_QUERIES})
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
        FROM q JOIN b e
          ON e.vec_id <> q.vec_id
         AND bit_count(xor(q.bucket, e.bucket)) <= 1
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(
                         CAST(q.embedding AS DOUBLE[]),
                         CAST(e.embedding AS DOUBLE[])) DESC,
                     e.vec_id) <= {ANN_K}"""

EMB_SQL: dict[str, str] = {
    "emb_lsh_ann": _LSH_ANN_SQL,
    "emb_ann": _ANN_EXACT_SQL,
    # the bound-pruned IVF search is exact top-k, so the brute-force
    # oracle checks it value-for-value (recall gate, VERDICT r2 item 5)
    "emb_ivf_ann": _ANN_EXACT_SQL,
    "emb_near_dup": f"""
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= {NEAR_DUP_THRESHOLD}""",
    "emb_dim_topk": f"""
        SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS coord
        FROM embeddings
        ORDER BY embedding[1] DESC, vec_id LIMIT {NORM_TOPK}""",
}


def q_graph_quality_louvain(sf_dir: str):
    """-q variant Louvain summaries (the reference's only extension
    surface, main_louvain.cpp:889-899/998-1059): one row per quality id,
    including the E9/E10 reweight -> E4 selfloops -> louvain composition
    (q=4, q=7).  Runs the driver path on the cached engine (shards stay
    pristine); rows-only — float parity is pinned by
    tests/test_quality_engine.py (engine == variant oracle, all ids)."""
    import pyarrow as _pa

    from . import graphs as _g
    eng = _g._build_engine(sf_dir)
    # each louvain_quality call installs ITS final labels into the shared
    # cached engine's shards; snapshot/restore so later queries that read
    # live shard labels (graph_comm_sizes) still see the modularity
    # Louvain partition they expect (ADVICE r2 #1)
    eng.push_labels()
    rows = []
    try:
        for qid in (1, 2, 4, 7, 9):
            res = eng.louvain_quality(qid)
            rows.append((qid, res["n_comms"], res["n_levels"],
                         round(res["quality"], 9)))
    finally:
        eng.pop_labels()
    return _pa.table({
        "q_id": _pa.array([r[0] for r in rows], _pa.int64()),
        "n_comms": _pa.array([r[1] for r in rows], _pa.int64()),
        "n_levels": _pa.array([r[2] for r in rows], _pa.int64()),
        "quality": _pa.array([r[3] for r in rows], _pa.float64()),
    })


def q_graph_comm_sizes(sf_dir: str):
    """S8 cluster-sizes output: Louvain communities of the lineitem graph
    with their member counts.  Community ids are canonicalized to the
    min member node id, so the output is identical across parallelism /
    label renumbering (rows-only gate — Louvain itself is not
    SQL-expressible; exactness is pinned by the oracle tests)."""
    from . import graphs as _g
    eng = _g._louvain_engine(sf_dir)   # shared engine + cached labels
    return eng.comm_sizes(canonical=True)


# ---------------------------------------------------------------- registry

QUERIES: dict[str, Callable[[str], Any]] = {
    # graph operators (SURVEY.md §2.2/2.5/2.6)
    "graph_edges": g.q_edges,
    "graph_sym_edges": g.q_sym_edges,
    "graph_degrees": g.q_degrees,
    "graph_total_weight": g.q_total_weight,
    "graph_max_weight": g.q_max_weight,
    "graph_check_symmetry": g.q_check_symmetry,
    "graph_nodes_dense": g.q_nodes_dense,
    "graph_add_selfloops": g.q_add_selfloops,
    "graph_top_degree": g.q_top_degree,
    "graph_degree_hist": g.q_degree_hist,
    "graph_triangles": g.q_triangles,
    # engine algorithms (SURVEY.md §2.8, §2.11)
    "graph_pagerank": g.q_pagerank,
    "graph_top_pagerank": g.q_top_pagerank,
    "graph_ppr": g.q_ppr,
    "graph_hits": g.q_hits,
    "graph_kcore": g.q_kcore,
    "graph_edge_support": g.q_edge_support,
    "graph_node_triangles": g.q_node_triangles,
    "graph_reciprocity": g.q_reciprocity,
    "graph_seed_bfs": g.q_seed_bfs,
    "graph_ktruss": g.q_ktruss,
    "graph_assortativity": g.q_assortativity,
    "graph_connected_components": g.q_connected_components,
    "graph_label_propagation": g.q_label_propagation,
    "graph_louvain": g.q_louvain,
    "graph_louvain_round1": g.q_louvain_round1,
    "graph_contract_round1": g.q_contract_round1,
    "graph_louvain_round2": g.q_louvain_round2,
    "graph_comembership_round1": g.q_comembership_round1,
    "graph_pagerank_warm": g.q_pagerank_warm,
    "graph_zahn_round1": g.q_zahn_round1,
    "graph_screen_add": g.q_screen_add,
    "graph_screen_del": g.q_screen_del,
    "graph_dynamic_round1": g.q_dynamic_round1,
    "graph_comm_sizes_round1": g.q_comm_sizes_round1,
    "graph_common_neighbors": g.q_common_neighbors,
    "graph_resource_alloc": g.q_resource_alloc,
    "graph_quality_louvain": q_graph_quality_louvain,
    "graph_dynamic_louvain": ev.q_dynamic_louvain,
    # text / training-data operators (north rule)
    "doc_tokens": q_doc_tokens,
    "doc_bpe_tokens": q_doc_bpe_tokens,
    "doc_quality": q_doc_quality,
    "doc_quality_score": q_doc_quality_score,
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_langid": q_doc_langid,
    "doc_simhash": q_doc_simhash,
    "doc_simhash_pairs": q_doc_simhash_pairs,
    "doc_minhash_pairs": q_doc_minhash_pairs,
    "doc_token_jaccard": q_doc_token_jaccard,
    "doc_repetition": q_doc_repetition,
    "doc_contamination": q_doc_contamination,
    "doc_dup_ngrams": q_doc_dup_ngrams,
    "doc_dedup_near": q_doc_dedup_near,
    "doc_pack": q_doc_pack,
    "doc_split": q_doc_split,
    "doc_curation": q_doc_curation,
    "doc_sample": q_doc_sample,
    "doc_top_quality": q_doc_top_quality,
    # multimodal binary-column stage (north rule)
    "mm_media_features": q_mm_media_features,
    "mm_frames": q_mm_frames,
    "mm_resize": q_mm_resize,
    # embeddings / similarity search (north rule)
    "emb_ann": q_emb_ann,
    "emb_ivf_ann": q_emb_ivf_ann,
    "emb_lsh_ann": q_emb_lsh_ann,
    "emb_near_dup": q_emb_near_dup,
    "emb_dim_topk": q_emb_dim_topk,
    # events: windows / sessions / grouped top-k + dynamic deltas
    "ev_hour_window": ev.q_hour_window,
    "ev_sessions": ev.q_sessions,
    "ev_retention": ev.q_retention,
    "ev_type_counts": ev.q_type_counts,
    "ev_topk_per_user": ev.q_topk_per_user,
    "ev_sliding_window": ev.q_sliding_window,
    "ev_asof_last_order": ev.q_asof_last_order,
    "ev_pairs_1h": ev.q_pairs_1h,
    "ev_funnel": ev.q_funnel,
    # mergeable sketches (north rule: "a novel sketch")
    "ev_hll_users": ev.q_hll_users,
    "ev_cms_users": ev.q_cms_users,
    # general relational joins/aggregates (J7 machinery on other keys)
    "rel_orders_by_segment": rel.q_orders_by_segment,
    "rel_lineitem_nation_rollup": rel.q_lineitem_nation_rollup,
    "rel_shuffle_join_orders": rel.q_shuffle_join_orders,
    "rel_pricing_summary": rel.q_pricing_summary,
    "rel_top_revenue_orders": rel.q_top_revenue_orders,
    # community outputs (S8) over the lineitem graph
    "graph_comm_sizes": q_graph_comm_sizes,
}

# The driver's correctness run caps at ~50 oracle comparisons per round.
# Round-5 rotation: (1) the four NEW gates (contraction + round-2 move —
# the hash-verified Louvain chain past round 1 — the warm-start
# PageRank, and the co-membership sample); (2) gates whose code changed
# this round (sessions reducer guard, top-k desc-rank, pair-verify
# sizing, token-jaccard overflow route); (3) the 27 gates whose last
# driver row is r3 (the r4 window never reached them); (4) the
# remaining slots re-check the round-1 kernel chain (its generated SQL
# is now REUSED by the new contraction/round-2 gates) and the highest-
# value r4 greens.  Everything beyond slot 50 has a green r4 row on
# unchanged code.
_CHECK_FIRST = [
    # (1) new gates
    "graph_contract_round1", "graph_louvain_round2",
    "graph_comembership_round1", "graph_pagerank_warm",
    "doc_dup_ngrams", "emb_lsh_ann", "ev_retention",
    # (2) changed code
    "ev_sessions", "ev_topk_per_user", "graph_common_neighbors",
    "graph_resource_alloc", "doc_token_jaccard",
    # (3) stale (r3-green, outside the r4 window)
    "doc_tokens", "doc_bpe_tokens", "doc_quality", "doc_quality_score",
    "doc_dedup_exact", "doc_fingerprint", "doc_langid", "doc_simhash",
    "doc_simhash_pairs", "doc_contamination", "doc_pack", "doc_split",
    "doc_curation", "doc_top_quality",
    "mm_media_features", "mm_frames", "mm_resize",
    "emb_ann",
    "graph_seed_bfs", "graph_ktruss", "graph_assortativity",
    "graph_connected_components", "graph_label_propagation",
    "graph_louvain", "graph_quality_louvain", "graph_dynamic_louvain",
    # (4) round-1 kernel chain re-checks + top r4 greens
    "graph_louvain_round1", "graph_zahn_round1", "graph_screen_add",
    "graph_screen_del", "graph_dynamic_round1",
    "graph_comm_sizes_round1", "graph_pagerank",
    "doc_minhash_pairs", "doc_dedup_near", "doc_sample",
    "doc_repetition", "graph_edges",
]
QUERIES = {**{k: QUERIES[k] for k in _CHECK_FIRST},
           **{k: v for k, v in QUERIES.items() if k not in _CHECK_FIRST}}

ORACLE_SQL: dict[str, str] = {
    **g.GRAPH_SQL,
    **TEXT_SQL,
    **EMB_SQL,
    **ev.EVENTS_SQL,
    **rel.RELATIONAL_SQL,
}
