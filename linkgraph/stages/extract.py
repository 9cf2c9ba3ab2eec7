"""Hyperlink / text extraction from the ``pages`` table (S13 / ST6).

The reference has no ingestion stage (it reads prepared edge lists,
``graph.cpp:50-91``); this stage exists per BASELINE.json ``input_hint``:
ingest Parquet pages ``(url, warc_ts, html, text, lang)`` and extract
hyperlinks + text from ``html`` with a stateful parser actor pool —
``map_batches(LinkExtractor, concurrency=N, batch_format="pyarrow",
zero_copy_batch=True)``.

Per-row invariant: extracted text must be byte-identical to the fixture
generator's ``text`` column per ``url``.

Scale notes (100 TB): rows are MBs because of ``html`` — the stage takes
small batches, drops ``html`` from its OUTPUT immediately (the binary
column never enters a shuffle), and the regexes are compiled once per
actor in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


class LinkExtractor:
    """Actor-pool stage: html -> one row per (src_url, dst_url) link.

    Emits the ``links`` table (FIXTURES.md F2).  Parser state (compiled
    regex) is built once per actor.
    """

    HREF = rb'<a\s[^>]*?href="([^"]*)"'

    def __init__(self):
        self.href = re.compile(self.HREF, re.IGNORECASE | re.DOTALL)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src_out: list[str] = []
        dst_out: list[str] = []
        for url, html in zip(urls, htmls):
            for m in self.href.findall(html):
                src_out.append(url)
                dst_out.append(m.decode("utf-8", "replace"))
        return pa.table({
            "src_url": pa.array(src_out, type=pa.string()),
            "dst_url": pa.array(dst_out, type=pa.string()),
        })


class TextExtractor:
    """Actor-pool stage: html -> extracted text, checked against the
    ``text`` column (the byte-identical invariant).

    Output schema: url:string, text:large_string, match:bool — ``match``
    is True iff extraction reproduced the stored text byte-for-byte.
    """

    PARA = rb"<p>(.*?)</p>"

    def __init__(self):
        self.para = re.compile(self.PARA, re.DOTALL)

    def extract(self, html: bytes) -> bytes:
        return b"".join(self.para.findall(html))

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        stored = batch.column("text").to_pylist()
        extracted = [self.extract(h) for h in htmls]
        match = np.array([e == s.encode("utf-8")
                          for e, s in zip(extracted, stored)], dtype=bool)
        return pa.table({
            "url": batch.column("url"),
            "text": pa.array([e.decode("utf-8", "replace") for e in extracted],
                             type=pa.large_string()),
            "match": pa.array(match),
        })
