#!/usr/bin/env python
"""r10 stress (verdict task #5): the WARC streaming record walk at real
archive sizes.

Builds a multi-hundred-MB synthetic crawl archive (plain WARC plus a
per-record-gzip twin), then asserts:

1. **Bounded memory**: iterating the whole archive through
   ``iter_warc_records_stream`` allocates a small constant (max record
   + one chunk), never the archive — tracemalloc peak must stay under
   1/8 of the archive size (in practice ~2-4 MB vs 100s of MB).
2. **Parse parity**: the streaming walk yields byte-identical
   (headers, body) sequences to the in-memory ``iter_warc_records``.
3. **Reader parity**: ``read_warc_documents`` (streaming default) and
   ``materialize=True`` produce identical document sets through Spark.

Usage: python scripts/stress_warc.py [n_records] (default 120000,
~380 MB plain archive; pass e.g. 8000 for a quick ~25 MB pass)
"""

from __future__ import annotations

import gzip
import hashlib
import json
import random
import shutil
import sys
import tempfile
import time
import tracemalloc
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _build_archive(dest: Path, n_records: int, gz: bool) -> int:
    """Write records INCREMENTALLY (the generator itself must not hold
    the archive either). Returns bytes written."""
    rng = random.Random(42)
    words = [f"tok{i:04d}" for i in range(1000)]
    with open(dest, "wb") as out:
        for i in range(n_records):
            uri = f"http://stress.example/p{i}"
            if i % 4 == 3:
                body = " ".join(rng.choices(words, k=380)).encode()
                rtype = b"conversion"
            else:
                paras = "".join(
                    "<p>" + " ".join(rng.choices(words, k=80)) + "</p>"
                    for _ in range(5)
                )
                html = (
                    "<html><body><nav><a href='/x'>nav</a></nav>"
                    + paras + "</body></html>"
                ).encode()
                body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
                rtype = b"response"
            rec = (
                b"WARC/1.0\r\nWARC-Type: " + rtype
                + b"\r\nWARC-Target-URI: " + uri.encode()
                + b"\r\nContent-Length: " + str(len(body)).encode()
                + b"\r\n\r\n" + body + b"\r\n\r\n"
            )
            out.write(gzip.compress(rec) if gz else rec)
    return dest.stat().st_size


# import BEFORE any tracemalloc window: module/package import cost
# (pyspark etc.) must not read as streaming-walk memory
from cdc_historical_warehouse_platform_spark.sources.raw_docs import (  # noqa: E402
    _STREAM_FLUSH_CHARS,
    _STREAM_FLUSH_DOCS,
    _warc_doc_batches,
    iter_warc_records,
    iter_warc_records_stream,
    read_warc_documents,
)


def _build_wet_archive(dest: Path, n_records: int) -> int:
    """WET-style archive: every record is a `conversion` whose text IS
    the payload (~170 KB each) — the pass-through shape where extracted
    output, not record parsing, is the memory hazard (r11, verdict
    task #4). Returns bytes written."""
    rng = random.Random(7)
    words = [f"tok{i:04d}" for i in range(1000)]
    with open(dest, "wb") as out:
        for i in range(n_records):
            body = " ".join(rng.choices(words, k=24_000)).encode()
            rec = (
                b"WARC/1.0\r\nWARC-Type: conversion"
                + b"\r\nWARC-Target-URI: http://wet.example/p" + str(i).encode()
                + b"\r\nContent-Length: " + str(len(body)).encode()
                + b"\r\n\r\n" + body + b"\r\n\r\n"
            )
            out.write(rec)
    return dest.stat().st_size


def _digest_stream(fh) -> tuple[str, int]:
    h = hashlib.md5()
    n = 0
    for headers, body in iter_warc_records_stream(fh):
        h.update(headers["warc-target-uri"].encode())
        h.update(headers["warc-type"].encode())
        h.update(body)
        n += 1
    return h.hexdigest(), n


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    work = Path(tempfile.mkdtemp(prefix="stress_warc_"))
    out: dict = {"n_records": n_records}
    try:
        plain = work / "big.warc"
        t0 = time.perf_counter()
        plain_bytes = _build_archive(plain, n_records, gz=False)
        gzf = work / "big.warc.gz"
        gz_bytes = _build_archive(gzf, max(n_records // 4, 1), gz=True)
        out["archive_mb"] = round(plain_bytes / 1e6, 1)
        out["gz_archive_mb"] = round(gz_bytes / 1e6, 1)
        out["gen_sec"] = round(time.perf_counter() - t0, 1)

        # 1) bounded memory: stream the PLAIN archive under tracemalloc
        tracemalloc.start()
        t0 = time.perf_counter()
        with open(plain, "rb") as fh:
            stream_digest, n_stream = _digest_stream(fh)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        out["stream_sec"] = round(time.perf_counter() - t0, 1)
        out["stream_peak_mb"] = round(peak / 1e6, 2)
        assert n_stream == n_records, (n_stream, n_records)
        # bounded constant (max record + ~2 chunks + transients), never
        # archive-proportional: a hard 32 MB ceiling at any size, and
        # < 1/4 of the archive even on quick passes
        assert peak < min(plain_bytes / 4, 32e6), (
            f"streaming peak {peak} not bounded below archive {plain_bytes}"
        )

        # gzip twin under tracemalloc too (member-boundary path)
        tracemalloc.start()
        with open(gzf, "rb") as fh:
            gz_digest, n_gz = _digest_stream(fh)
        _, gz_peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        out["gz_stream_peak_mb"] = round(gz_peak / 1e6, 2)

        # 1b) WET-heavy extraction (r11, verdict task #4): conversion
        # records are ~pass-through text, so the EXTRACTED OUTPUT is
        # the memory hazard — run the real bounded-flush doc-batch
        # generator (the exact unit the reader's mapInPandas closure
        # wraps) over a WET archive under tracemalloc and assert peak
        # stays under decompressed-size/4 AND a hard constant ceiling
        wet = work / "wet.warc"
        wet_records = max(n_records // 50, 200)
        wet_bytes = _build_wet_archive(wet, wet_records)
        out["wet_archive_mb"] = round(wet_bytes / 1e6, 1)
        tracemalloc.start()
        t0 = time.perf_counter()
        h = hashlib.md5()
        n_wet_docs = n_wet_batches = 0
        with open(wet, "rb") as fh:
            for pdf in _warc_doc_batches(
                fh, 10, 0.33, _STREAM_FLUSH_DOCS, _STREAM_FLUSH_CHARS
            ):
                for did, txt in zip(pdf["doc_id"], pdf["text"]):
                    h.update(str(did).encode())
                    h.update(hashlib.md5(txt.encode()).digest())
                n_wet_docs += len(pdf)
                n_wet_batches += 1
        _, wet_peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        out["wet_extract_sec"] = round(time.perf_counter() - t0, 1)
        out["wet_peak_mb"] = round(wet_peak / 1e6, 2)
        out["wet_docs"] = n_wet_docs
        out["wet_batches"] = n_wet_batches
        wet_digest = h.hexdigest()
        assert n_wet_docs == wet_records
        assert n_wet_batches >= 2, "WET case too small to exercise a flush"
        # constant ceiling (the flush buffer + batch-conversion
        # transients, ~60 MB at the default thresholds) at ANY size;
        # archive-proportional bound only once the archive dwarfs that
        # constant (the full-run shape: ~400 MB decompressed)
        assert wet_peak < 128e6 and wet_peak < max(wet_bytes / 4, 96e6), (
            f"WET extraction peak {wet_peak} not bounded below "
            f"archive {wet_bytes}"
        )
        # flush parity: pathological thresholds lose/duplicate nothing
        h = hashlib.md5()
        n2 = 0
        with open(wet, "rb") as fh:
            for pdf in _warc_doc_batches(fh, 10, 0.33, 7, 1 << 60):
                for did, txt in zip(pdf["doc_id"], pdf["text"]):
                    h.update(str(did).encode())
                    h.update(hashlib.md5(txt.encode()).digest())
                n2 += len(pdf)
        assert (h.hexdigest(), n2) == (wet_digest, n_wet_docs)
        wet.unlink()  # keep the Spark parity section's doc count as-is

        # 2) record-level parity vs the in-memory parser
        h = hashlib.md5()
        n_mem = 0
        for headers, body in iter_warc_records(plain.read_bytes()):
            h.update(headers["warc-target-uri"].encode())
            h.update(headers["warc-type"].encode())
            h.update(body)
            n_mem += 1
        assert (h.hexdigest(), n_mem) == (stream_digest, n_stream)
        h = hashlib.md5()
        for headers, body in iter_warc_records(gzf.read_bytes()):
            h.update(headers["warc-target-uri"].encode())
            h.update(headers["warc-type"].encode())
            h.update(body)
        assert h.hexdigest() == gz_digest

        # 3) Spark reader parity: streaming default == materialize=True
        from cdc_historical_warehouse_platform_spark.session import get_spark

        spark = get_spark(
            app_name="stress-warc",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        # absorb JVM/codegen warmup so the first timed reader doesn't
        # carry session-startup cost
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        def digest(df) -> tuple[int, str]:
            from pyspark.sql import functions as F

            row = df.select(
                F.count("*").alias("n"),
                F.md5(
                    F.concat_ws(
                        "|",
                        F.sort_array(
                            F.collect_list(
                                F.concat_ws(":", "doc_id", F.md5("text"))
                            )
                        ),
                    )
                ).alias("d"),
            ).collect()[0]
            return row["n"], row["d"]

        t0 = time.perf_counter()
        n_s, d_s = digest(read_warc_documents(spark, str(work)))
        out["spark_stream_sec"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        n_m, d_m = digest(read_warc_documents(spark, str(work), materialize=True))
        out["spark_materialize_sec"] = round(time.perf_counter() - t0, 1)
        assert (n_s, d_s) == (n_m, d_m), "streaming != materializing reader"
        out["spark_docs"] = n_s
        out["ok"] = True
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
