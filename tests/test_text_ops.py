"""Unit tests for the text / multimodal operator batch bodies.

These drive the map_batches callables directly on small Arrow tables —
no Ray involved — pinning tokenization, hashing and near-dup semantics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from linkgraph.stages.multimodal import FEATURE_DIM, MediaFeatureExtractor, StubCodec
from linkgraph.text.ops import (
    MinHasher,
    TokenStats,
    _shingle_hashes,
    fingerprint_batch,
    langid_batch,
    md5_batch,
    quality_batch,
    simhash_batch,
)


def docs_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_stats_matches_python_split():
    texts = ["a b c", "", "hello", "x  y", " lead", "trail "]
    out = TokenStats()(docs_table(texts))
    got = out.column("n_tokens").to_pylist()
    want = [len(t.split(" ")) for t in texts]
    assert got == want
    assert out.column("n_chars").to_pylist() == [len(t) for t in texts]


def test_bpe_token_count_matches_re_and_duckdb():
    import re

    import duckdb

    from linkgraph.text.ops import BPE_TOKEN_PAT, bpe_token_count_batch

    texts = ["Hello, world! It's 2026...", "  foo\tbar  42x7 ", "",
             "naïve café №42", "a'b''c", "x" * 5000, "1 2 3\n\n4"]
    out = bpe_token_count_batch(docs_table(texts))
    got = out.column("n_bpe").to_pylist()
    # BPE_TOKEN_PAT is lookahead-free, so Python re == RE2 here
    want = [len(re.findall(BPE_TOKEN_PAT, t)) for t in texts]
    assert got == want
    con = duckdb.connect()
    for t, n in zip(texts, got):
        sql_n = con.execute(
            "select len(regexp_extract_all(?, ?))",
            [t, BPE_TOKEN_PAT]).fetchone()[0]
        assert sql_n == n


def test_quality_counts():
    texts = ["the cat and the hat", "a a a", "xyz"]
    out = quality_batch(docs_table(texts))
    assert out.column("n_stop").to_pylist() == [3, 3, 0]
    assert out.column("n_distinct").to_pylist() == [4, 1, 1]
    assert out.column("n_tokens").to_pylist() == [5, 3, 1]


def test_md5_matches_hashlib():
    texts = ["hello world", "", "ünïcode"]
    out = md5_batch(docs_table(texts))
    want = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    assert out.column("content_hash").to_pylist() == want


def test_fingerprint_deterministic_and_content_sensitive():
    t1 = fingerprint_batch(docs_table(["abc", "abd", "abc", ""]))
    fps = t1.column("fingerprint").to_pylist()
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]
    assert fps[3] == 0
    # batch-split invariance
    t2 = fingerprint_batch(docs_table(["abc"]))
    assert t2.column("fingerprint").to_pylist()[0] == fps[0]


def test_langid_profiles():
    texts = [
        "the cat is in the hat and a dog",
        "der hund ist nicht das problem und die katze",
        "le chat est un animal et la maison",
        "el perro es un animal y los gatos",
        "这 是 中文 文本 与 词",
    ]
    out = langid_batch(docs_table(texts))
    assert out.column("pred_lang").to_pylist() == \
        ["en", "de", "fr", "es", "zh"]


def test_simhash_similarity_property():
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different words entirely unrelated content here " * 5
    out = simhash_batch(docs_table([base, near, far]))
    h = [np.uint64(x) for x in
         np.array(out.column("simhash").to_pylist(), dtype=np.int64)
         .view(np.uint64)]

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(h[0], h[1]) < ham(h[0], h[2])
    # determinism across calls
    out2 = simhash_batch(docs_table([base]))
    assert out2.column("simhash").to_pylist()[0] == \
        out.column("simhash").to_pylist()[0]


def test_popcount64_matches_python():
    from linkgraph.text.ops import _popcount64
    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**63, size=257, dtype=np.int64).view(np.uint64)
    x[0] = np.uint64(0)
    x[1] = np.uint64(0xFFFFFFFFFFFFFFFF)
    got = _popcount64(x)
    want = [bin(int(v)).count("1") for v in x]
    assert got.tolist() == want


def test_simhash_dup_pairs_matches_bruteforce(ray_session):
    """Banded-Hamming pairs == exhaustive hamming ball (exact recall),
    each pair emitted exactly once, a < b."""
    import ray.data as rd

    from linkgraph.text.ops import simhash_dup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 5
    texts = [
        base,
        base.replace("lazy", "sleepy"),          # near 0
        base.replace("quick", "swift"),          # near 0/1
        base,                                    # identical to 0
        "completely different words entirely unrelated content " * 5,
        "",                                      # empty doc
        "",                                      # empty dup -> hamming 0
        "one more unrelated singleton document text body",
    ]
    ids = [3, 1, 4, 9, 5, 6, 7, 8]
    tbl = docs_table(texts, ids=ids)
    got = (simhash_dup_pairs(rd.from_arrow(tbl).repartition(3))
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))

    h = np.array(simhash_batch(tbl).column("simhash").to_pylist(),
                 dtype=np.int64).view(np.uint64)
    order = np.argsort(ids)
    hs, idss = h[order], np.array(ids)[order]
    want = []
    for i in range(len(idss)):
        for j in range(i + 1, len(idss)):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d <= 3:
                want.append((int(idss[i]), int(idss[j]), d))
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(want)
    assert len(want) >= 2          # fixture really exercises the path
    assert (got["a"] < got["b"]).all()
    assert not got.duplicated(["a", "b"]).any()


def test_simhash_dup_pairs_no_dups_is_empty(ray_session):
    import ray.data as rd

    from linkgraph.text.ops import simhash_dup_pairs

    texts = [f"totally unique document number {i} " +
             " ".join(f"tok{i}x{j}" for j in range(30)) for i in range(12)]
    got = simhash_dup_pairs(rd.from_arrow(docs_table(texts))).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["a", "b", "hamming"]


def test_minhash_signature_similarity():
    mh = MinHasher(num_perm=64, bands=16, k=3)
    base = "w" + " w".join(str(i) for i in range(100))
    near = base + " extra token"
    far = " ".join(f"z{i}" for i in range(100))
    s0, s1, s2 = (mh.signature(t) for t in (base, near, far))
    sim01 = (s0 == s1).mean()
    sim02 = (s0 == s2).mean()
    assert sim01 > 0.8
    assert sim02 < 0.2
    # band rows deterministic
    t = mh(docs_table([base, near, far]))
    assert t.num_rows == 3 * 16
    t2 = mh(docs_table([base]))
    assert t.slice(0, 16).column("band_hash").to_pylist() == \
        t2.column("band_hash").to_pylist()


def test_shingle_hashes_short_docs():
    assert len(_shingle_hashes("one two", 3)) == 1
    assert len(_shingle_hashes("", 3)) == 1


def test_stub_codec_deterministic():
    c = StubCodec()
    f1 = c.decode(b"payload-bytes")
    f2 = c.decode(b"payload-bytes")
    f3 = c.decode(b"other-bytes")
    assert np.array_equal(f1, f2)
    assert not np.array_equal(f1, f3)
    assert len(f1) == FEATURE_DIM
    with pytest.raises(NotImplementedError):
        StubCodec(deterministic=False).decode(b"x")


def test_frame_sampler_windows_and_fingerprints():
    from linkgraph.stages.multimodal import FrameSampler
    from linkgraph.text.ops import _poly_hash_flat

    payloads = [b"", b"short", b"x" * 64, b"y" * 65, bytes(range(200))]
    batch = pa.table({"id": pa.array(range(len(payloads)), pa.int64()),
                      "media": pa.array(payloads, pa.binary())})
    out = FrameSampler(n_frames=4, frame_len=64)(batch)
    assert out.num_rows == 4 * len(payloads)
    rows = out.to_pylist()
    for r in rows:
        p = payloads[r["id"]]
        start = (r["frame_idx"] * max(len(p) - 64, 0)) // 3
        frame = p[start:start + 64]
        assert r["f_len"] == len(frame)
        b = np.frombuffer(frame, np.uint8)
        want = _poly_hash_flat(b, np.array([len(b)]))[0]
        assert np.uint64(r["f_fingerprint"]) == want


def test_media_codec_factory():
    from linkgraph.stages.multimodal import StubCodec, make_codec
    assert isinstance(make_codec("stub"), StubCodec)
    with pytest.raises(ValueError):
        make_codec("ffmpeg")
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        # flag on: invalid-image payloads fall back to the stub
        # features, so the gate contract (n_bytes + input fingerprint,
        # feature projected away) is unchanged
        c = make_codec("pil")
        s = StubCodec()
        assert np.array_equal(c.decode(b"not an image"),
                              s.decode(b"not an image"))
    else:
        with pytest.raises(ImportError):
            make_codec("pil")


def test_media_feature_extractor_batch():
    tbl = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "media": pa.array([b"\x00" * 100, b"\xff" * 50], pa.binary()),
    })
    out = MediaFeatureExtractor()(tbl)
    assert out.column("n_bytes").to_pylist() == [100, 50]
    assert len(out.column("feature")[0].as_py()) == FEATURE_DIM


class TestGoldenVectors:
    """Fixed golden outputs for the deterministic integer hash operators
    (now ALSO value-checked by DuckDB oracles in queries/registry.py):
    any change to the hash kernels must be deliberate (VERDICT r1 #8)."""

    def _tbl(self):
        import pyarrow as pa
        return pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["the quick brown fox", "",
                              "hello world hello"]),
        })

    def test_fingerprint_golden(self):
        from linkgraph.text.ops import fingerprint_batch
        got = fingerprint_batch(self._tbl()).column("fingerprint").to_pylist()
        assert got == [6806449155203158131, 0, -3394546303758596830]

    def test_simhash_golden(self):
        from linkgraph.text.ops import simhash_batch
        got = simhash_batch(self._tbl()).column("simhash").to_pylist()
        # token hash = splitmix64(poly_hash(utf-8 bytes)) — changed from
        # pandas siphash in round 2 so the DuckDB oracle can reproduce it
        assert got == [-7728069894924568732, -2152535657050944081,
                       -510419953026857416]


class TestNearDupKeepmap:
    """near_dup_keepmap: driver union-find path vs distributed
    min-label-propagation path must produce the identical keep map."""

    def _docs_ds(self):
        import ray.data as rd
        words = [f"w{i}" for i in range(40)]
        mk = lambda lo, hi: " ".join(words[lo:hi])
        texts = [
            mk(0, 20),              # 0: cluster A
            mk(0, 19) + " zz",      # 1: ~0.9 jaccard with 0
            mk(1, 20),              # 2: chained to 0/1
            mk(25, 40),             # 3: cluster B
            mk(25, 40),             # 4: identical to 3
            "completely different text about nothing at all",   # 5
            "another singleton document with its own words",    # 6
        ]
        return rd.from_arrow(docs_table(texts, ids=[10, 11, 12, 20, 21,
                                                    30, 31]))

    def test_driver_vs_distributed_parity(self, ray_session, monkeypatch):
        from linkgraph.text import ops as tx
        ds = self._docs_ds()
        a = tx.near_dup_keepmap(ds, threshold=0.5).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        monkeypatch.setattr(tx, "DRIVER_UF_PAIRS", 0)
        b = tx.near_dup_keepmap(self._docs_ds(), threshold=0.5) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
        got = dict(zip(a["doc_id"], a["keep_id"]))
        # cluster A collapses to its min id; exact-dup pair ditto;
        # singletons keep themselves
        assert got[10] == got[11] == got[12] == 10
        assert got[20] == got[21] == 20
        assert got[30] == 30 and got[31] == 31
        assert len(a) == 7


class TestHotBucketCap:
    """A 1e4-doc identical-text cluster (the boilerplate scale-killer)
    must complete with O(n) STAR pairs — not the 5e7-pair clique — and
    produce the same keepmap (everyone collapses to the min doc_id)."""

    def test_identical_cluster_star_pairs(self, ray_session):
        import ray.data as rd
        from linkgraph.text import ops as tx
        n = 10_000
        assert n > tx.HOT_BUCKET_CLIQUE_CAP
        text = "the same boilerplate cookie banner text appears here"
        ids = np.arange(n, dtype=np.int64) + 100
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array([text] * n, pa.string())})).repartition(8)
        pairs_ds = tx.minhash_dup_pairs(docs, threshold=0.5).materialize()
        pairs = pairs_ds.to_pandas()
        assert len(pairs) == n - 1            # star, not clique
        assert (pairs["a"] == 100).all()      # hub = bucket-min doc_id
        assert (pairs["n_common"] == pairs["n_union"]).all()  # identical
        km = (tx.near_dup_keepmap(docs, threshold=0.5, pairs=pairs_ds)
              .to_pandas())
        assert len(km) == n
        assert (km["keep_id"] == 100).all()   # same keepmap as a clique


class TestCuration:
    def test_signals_fused_pass_matches_parts(self):
        from linkgraph.text.ops import (curation_signals_batch,
                                        langid_batch, md5_batch,
                                        quality_score_batch)
        t = docs_table(["the cat sat on the mat and then it left",
                        "der die das und ist der die das",
                        "", "the " * 80])
        sig = curation_signals_batch(t)
        assert sig.column("pred_lang").to_pylist() == \
            langid_batch(t).column("pred_lang").to_pylist()
        assert sig.column("score").to_pylist() == \
            quality_score_batch(t).column("score").to_pylist()
        # 128-bit md5 round-trips through the two int64 key columns
        for i, h in enumerate(md5_batch(t).column("content_hash")
                              .to_pylist()):
            hi = sig.column("h_hi")[i].as_py() & ((1 << 64) - 1)
            lo = sig.column("h_lo")[i].as_py() & ((1 << 64) - 1)
            assert f"{hi:016x}{lo:016x}" == h

    def test_curate_filter_then_dedup(self, ray_session):
        import ray.data as rd
        from linkgraph.text.ops import curate
        # doc 0/1 duplicates (keep 0); doc 2 duplicate text but filtered
        # out by lang -> does NOT claim canonical slot; doc 3 low quality
        good = ("the cat and the dog walked to a park of green trees "
                "while the sun set over a quiet hill far away " * 3)
        other = "der hund und die katze " * 12
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([5, 9, 1, 7], pa.int64()),
            "text": pa.array([good, good, other, "a b"], pa.string())}))
        df = curate(docs, lang="en", min_score=0.2,
                    num_join_partitions=2).to_pandas()
        assert list(df.sort_values("doc_id")["doc_id"]) == [5]
        assert int(df["n_copies"].iloc[0]) == 2


def test_repetition_matches_naive():
    from collections import Counter

    from linkgraph.text.ops import repetition_batch
    texts = ["a b a b a", "x", "", "q w e r t y", "z z z z",
             "a a b b a a", "one two one two", "x  y x  y"]
    out = repetition_batch(docs_table(texts)).to_pandas()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        bigrams = [f"{toks[j]} {toks[j+1]}" for j in range(len(toks) - 1)]
        row = out.iloc[i]
        assert row["n_tokens"] == len(toks)
        assert row["top_count"] == max(Counter(toks).values())
        assert row["n_bigrams"] == len(bigrams)
        assert row["n_distinct_bigrams"] == len(set(bigrams))


def test_contamination_matches_naive():
    from linkgraph.text.ops import (_batch_shingle_hashes,
                                    contamination_batch)
    texts = ["the cat sat on the mat", "the cat sat quietly",
             "dogs bark loudly at night", "the cat sat on the mat today",
             "short", "on the mat"]
    k = 3

    def shingles(t):
        ws = t.split(" ")
        if len(ws) < k:
            return {t}
        return {" ".join(ws[j:j + k]) for j in range(len(ws) - k + 1)}

    # benchmark = docs 0 and 3 (pretend mod selected them)
    bench_texts = [texts[0], texts[3]]
    bench_set = set().union(*(shingles(t) for t in bench_texts))
    flat, _ = _batch_shingle_hashes(sorted(bench_set), 10**9)
    bench_hashes = np.unique(flat)

    out = contamination_batch(docs_table(texts), bench_hashes,
                              k).to_pandas()
    for i, t in enumerate(texts):
        sh = shingles(t)
        assert out.iloc[i]["n_shingles"] == len(sh)
        assert out.iloc[i]["n_contam"] == len(sh & bench_set)


def test_token_jaccard_overflow_route(ray_session):
    """Groups above TOKEN_JACCARD_GROUP_CAP route through 2-perm MinHash
    sub-buckets: completes with O(n·bucket) pairs (never the clique),
    every emitted value is EXACT, and identical docs stay connected
    (the star contract for oversized buckets)."""
    import ray.data as rd

    from linkgraph.text import ops as tx

    rng = np.random.default_rng(3)
    n = 20_000
    pool = [" ".join(rng.choice([f"w{k}" for k in range(300)], size=15))
            for _ in range(50)]
    texts = [pool[i % 50] + f" x{i % 5}" for i in range(n)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(["host"] * n),
        "text": pa.array(texts)}))
    out = tx.token_jaccard_pairs(docs).to_pandas()
    assert 0 < len(out) < 5_000_000          # bounded, not the 2e8 clique
    sample = out.sample(100, random_state=0)
    for _, r in sample.iterrows():
        A = set(texts[int(r.a)].split(" "))
        B = set(texts[int(r.b)].split(" "))
        assert r.n_common == len(A & B)
        assert r.n_union == len(A | B)
    # identical docs (same template, same x suffix) share both minima ->
    # same bucket -> connected via clique or star
    twins = out[(out.a == 0) | (out.b == 0)]
    full = {250, 500, 750}                    # i % 50 == 0 and i % 5 == 0
    linked = set(twins.a.tolist()) | set(twins.b.tolist())
    assert full & linked


def test_dup_ngram_stats_matches_naive(ray_session):
    """dup_ngram_stats == naive per-doc distinct-shingle counts with
    corpus-wide >= 2-doc membership."""
    import ray.data as rd

    from linkgraph.text import ops as tx

    rng = np.random.default_rng(11)
    texts = [" ".join(rng.choice(["a", "b", "c", "d", "e"],
                                 size=rng.integers(1, 12)))
             for _ in range(60)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts)}))
    out = tx.dup_ngram_stats(docs, k=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    def shingles(t):
        w = t.split(" ")
        if len(w) < 3:
            return {t}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = [shingles(t) for t in texts]
    from collections import Counter
    cnt = Counter(s for ss in sets for s in ss)
    exp_n = [len(ss) for ss in sets]
    exp_d = [sum(1 for s in ss if cnt[s] >= 2) for ss in sets]
    assert out["n_shingles"].tolist() == exp_n
    assert out["n_dup"].tolist() == exp_d
