"""Distributed ordered prefix scan + the operators built on it
(sequence packing, train/val split, resize stage)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.stages.scan import ordered_prefix_scan
from linkgraph.stages.multimodal import Resizer
from linkgraph.text.ops import (SPLIT_BUCKETS, SPLIT_TRAIN, SPLIT_VAL,
                                _poly_hash_flat, _splitmix64, pack_docs,
                                train_split_batch)


def _scan_df(ds, **kw):
    df = ordered_prefix_scan(ds, "k", "v", **kw).to_pandas()
    return df.sort_values("k").reset_index(drop=True)


class TestOrderedPrefixScan:
    def test_matches_numpy_on_shuffled_blocks(self, ray_session):
        rng = np.random.default_rng(7)
        n = 5000
        keys = rng.permutation(n).astype(np.int64)
        vals = rng.integers(0, 100, n).astype(np.int64)
        ds = rd.from_arrow(pa.table({"k": keys, "v": vals})) \
            .repartition(13)
        df = _scan_df(ds, num_partitions=5)
        order = np.argsort(keys)
        expect = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
        assert (df["k"].to_numpy() == keys[order]).all()
        assert (df["prefix"].to_numpy() == expect).all()
        assert (df["v"].to_numpy() == vals[order]).all()

    def test_single_partition(self, ray_session):
        ds = rd.from_arrow(pa.table({"k": np.arange(10, dtype=np.int64),
                                     "v": np.ones(10, np.int64)}))
        df = _scan_df(ds, num_partitions=1)
        assert (df["prefix"].to_numpy() == np.arange(10)).all()

    def test_more_partitions_than_rows(self, ray_session):
        ds = rd.from_arrow(pa.table({"k": np.array([3, 1], np.int64),
                                     "v": np.array([5, 7], np.int64)}))
        df = _scan_df(ds, num_partitions=64)
        assert list(df["k"]) == [1, 3]
        assert list(df["prefix"]) == [0, 7]

    def test_duplicate_keys_raise(self, ray_session):
        ds = rd.from_arrow(pa.table({"k": np.array([1, 1, 2], np.int64),
                                     "v": np.ones(3, np.int64)}))
        with pytest.raises(Exception, match="duplicate"):
            ordered_prefix_scan(ds, "k", "v").to_pandas()

    def test_post_hook(self, ray_session):
        ds = rd.from_arrow(pa.table({"k": np.arange(6, dtype=np.int64),
                                     "v": np.full(6, 3, np.int64)}))

        def post(t: pa.Table) -> pa.Table:
            return t.append_column(
                "bin", pa.array(t.column("prefix").to_numpy() // 4,
                                pa.int64()))

        df = ordered_prefix_scan(ds, "k", "v", post=post,
                                 num_partitions=3).to_pandas()
        df = df.sort_values("k").reset_index(drop=True)
        assert list(df["bin"]) == [0, 0, 1, 2, 3, 3]


class TestPackSplit:
    def _docs(self):
        texts = ["a b c", "d", "e f", "", "g h i j", "k"]
        return rd.from_arrow(pa.table({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": pa.array(texts, pa.string())}))

    def test_pack_docs(self, ray_session):
        df = pack_docs(self._docs(), capacity=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # token counts of '' is 1 (string_split semantics)
        assert list(df["n_tokens"]) == [3, 1, 2, 1, 4, 1]
        assert list(df["start_offset"]) == [0, 3, 4, 6, 7, 11]
        assert list(df["bin_id"]) == [0, 0, 1, 1, 1, 2]
        assert list(df["bin_pos"]) == [0, 3, 0, 2, 3, 3]

    def test_split_deterministic_and_thresholded(self, ray_session):
        ids = np.arange(1000, dtype=np.int64)
        t = train_split_batch(pa.table({"doc_id": ids}))
        bucket = t.column("bucket").to_numpy()
        expect = (_splitmix64(ids.astype(np.uint64))
                  % np.uint64(SPLIT_BUCKETS)).astype(np.int64)
        assert (bucket == expect).all()
        split = np.asarray(t.column("split").to_pylist())
        assert ((split == "train") == (bucket < SPLIT_TRAIN)).all()
        assert ((split == "val") == ((bucket >= SPLIT_TRAIN)
                                     & (bucket < SPLIT_VAL))).all()
        # roughly 90/5/5 at n=1000
        assert 850 < (split == "train").sum() < 950


class TestResizer:
    def test_strided_bytes_and_fingerprint(self):
        payloads = [b"0123456789abcdefABC", b"", b"x" * 7, b"y" * 8,
                    bytes(range(256))]
        t = pa.table({"id": pa.array(range(len(payloads)), pa.int64()),
                      "media": pa.array(payloads, pa.binary())})
        out = Resizer(factor=8)(t)
        for i, p in enumerate(payloads):
            want = p[::8]
            got = out.column("media")[i].as_py()
            assert got == want, (i, got, want)
            assert out.column("out_bytes")[i].as_py() == len(want)
            arr = np.frombuffer(want, np.uint8)
            fp = int(_poly_hash_flat(arr,
                                     np.array([len(want)], np.int64))[0])
            if fp >= 1 << 63:
                fp -= 1 << 64
            assert out.column("out_fingerprint")[i].as_py() == fp

    def test_nondeterministic_codec_refused(self):
        with pytest.raises(NotImplementedError):
            Resizer(deterministic=False)


class TestStratifiedSample:
    def test_quota_and_determinism(self, ray_session):
        import ray.data as rd
        from linkgraph.text.ops import _splitmix64, stratified_sample
        n = 300
        ids = np.arange(n, dtype=np.int64)
        srcs = np.array(["s%d" % (i % 3) for i in range(n)], object)
        t = pa.table({"doc_id": ids,
                      "source": pa.array(list(srcs), pa.string())})
        # many small blocks -> the map-side prune must still yield the
        # global per-source top-k by hash
        ds = rd.from_arrow(t).repartition(11)
        df = stratified_sample(ds, k=7).to_pandas()
        assert len(df) == 21
        h = _splitmix64(ids.astype(np.uint64))
        for s in ("s0", "s1", "s2"):
            mask = srcs == s
            want = set(ids[mask][np.argsort(h[mask])][:7].tolist())
            got = set(df[df["source"] == s]["doc_id"].tolist())
            assert got == want, s

    def test_small_groups_kept_whole(self, ray_session):
        import ray.data as rd
        from linkgraph.text.ops import stratified_sample
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "source": pa.array(["a", "a", "b"], pa.string())})
        df = stratified_sample(rd.from_arrow(t), k=10).to_pandas()
        assert sorted(df["doc_id"]) == [1, 2, 3]
