"""sources/raw_docs.py — raw text / JSONL / binary ingestion.

Pins stable re-ingestable ids, the documents-schema contract feeding
corpus_build, FAILFAST on malformed JSONL, and the binaryFile seam's
payload/meta shape matching the multimodal fakes.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
    read_binary_assets,
    read_jsonl_documents,
    read_text_documents,
)


def _write_txt(d, name, body):
    (d / name).write_text(body)


def test_text_ingest_one_doc_per_file_stable_ids(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    _write_txt(d, "a.txt", "hello world\nsecond line")
    _write_txt(d, "b.txt", "another   document")
    docs = read_text_documents(spark, str(d), source="crawl1")
    rows = {r["text"]: r for r in docs.collect()}
    assert set(rows) == {"hello world second line", "another document"}
    assert all(r["source"] == "crawl1" and r["n_chars"] == len(t) for t, r in rows.items())
    # re-ingesting yields identical ids (fingerprint-tier re-delivery contract)
    again = {r["text"]: r["doc_id"] for r in read_text_documents(spark, str(d)).collect()}
    assert {t: r["doc_id"] for t, r in rows.items()} == again
    assert all(0 <= i < 2**60 for i in again.values())


def test_text_ingest_feeds_corpus_build(spark, tmp_path):
    from cdc_historical_warehouse_platform_spark.pipeline.corpus_build import corpus_build

    d = tmp_path / "crawl"
    d.mkdir()
    for i in range(4):
        _write_txt(d, f"doc{i}.txt", f"the quick brown fox {i} " * 12)
    inp = tmp_path / "staged"
    inp.mkdir()
    read_text_documents(spark, str(d)).write.parquet(str(inp / "documents.parquet"))
    r = corpus_build(spark, str(inp), str(tmp_path / "c"))
    assert r["kept_rows"] >= 1  # quality+near-dup gates run on ingested docs


def test_jsonl_ingest_failfast_on_malformed(spark, tmp_path):
    good = tmp_path / "good.jsonl"
    good.write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s"})
            for i in range(3)
        )
    )
    docs = read_jsonl_documents(spark, str(good))
    assert docs.count() == 3
    assert docs.filter(F.col("n_chars") == 5).count() == 3

    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all')
    with pytest.raises(Exception):
        read_jsonl_documents(spark, str(bad)).collect()


def test_binary_assets_match_multimodal_shape(spark, tmp_path):
    d = tmp_path / "assets"
    d.mkdir()
    (d / "x.bin").write_bytes(b"\x00\x01\x02payload")
    (d / "y.bin").write_bytes(b"other")
    (d / "skip.txt").write_text("not matched")
    assets = read_binary_assets(spark, str(d), pattern="*.bin")
    rows = sorted(assets.collect(), key=lambda r: r["meta"]["n_bytes"])
    assert len(rows) == 2
    assert bytes(rows[0]["payload"]) == b"other"
    assert rows[1]["meta"]["n_bytes"] == 10
    import hashlib

    assert rows[1]["meta"]["checksum"] == hashlib.md5(b"\x00\x01\x02payload").hexdigest()
    # same column contract as the deterministic fakes → feature UDFs compose
    from cdc_historical_warehouse_platform_spark.operators.multimodal import extract_binary_features

    feats = extract_binary_features(
        assets.withColumnRenamed("asset_id", "doc_id")
    )
    assert feats.count() == 2


def test_read_html_documents_boilerplate_removed(spark, tmp_path):
    """r9 continuation: HTML crawl ingestion — boilerplate (nav/footer
    link farms) dropped, article prose kept, ids path-stable across
    re-ingestion, whitespace contract held, all-boilerplate pages
    yield empty text (left to the corpus quality gate)."""
    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        read_html_documents,
    )

    page = (
        "<html><body><nav><a href='/'>Home</a> <a href='/x'>Links</a></nav>"
        "<p>This paragraph carries the genuine article\ncontent with well "
        "over ten words of real prose to keep.</p>"
        "<footer><a href='/t'>Terms</a></footer></body></html>"
    )
    junk = "<html><body><nav><a href='/'>Home</a> <a href='/x'>More</a></nav></body></html>"
    (tmp_path / "a.html").write_text(page)
    (tmp_path / "b.htm").write_text(junk)

    docs = read_html_documents(spark, str(tmp_path)).orderBy("doc_id")
    rows = docs.collect()
    assert len(rows) == 2
    by_text = {bool(r["text"]): r for r in rows}
    kept = by_text[True]
    assert "genuine article content" in kept["text"]  # newline normalized
    assert "Home" not in kept["text"] and "Terms" not in kept["text"]
    assert kept["source"] == "web" and kept["n_chars"] == len(kept["text"])
    assert by_text[False]["text"] == ""  # all-boilerplate page

    # path-stable ids: re-ingesting yields identical ids
    again = {r["doc_id"] for r in read_html_documents(spark, str(tmp_path)).collect()}
    assert again == {r["doc_id"] for r in rows}


def _write_warc(records, gz=False):
    """Independent WARC writer: records = list of (type, uri, body
    bytes, http_content_type or None). Per-record gzip when gz."""
    import gzip

    out = []
    for rtype, uri, body, ctype in records:
        if ctype is not None:  # wrap as an HTTP response
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: "
                + ctype.encode()
                + b"\r\n\r\n"
                + body
            )
        hdr = (
            b"WARC/1.0\r\nWARC-Type: " + rtype.encode()
            + b"\r\nWARC-Target-URI: " + uri.encode()
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n"
        )
        rec = hdr + body + b"\r\n\r\n"
        out.append(gzip.compress(rec) if gz else rec)
    return b"".join(out)


_WARC_HTML = (
    b"<html><body><nav><a href='/'>Home</a></nav>"
    b"<p>Crawled article paragraph with easily more than ten genuine "
    b"words of body prose for the extractor to keep.</p>"
    b"<footer><a href='/t'>Terms</a></footer></body></html>"
)


def test_read_warc_documents(spark, tmp_path):
    """WARC ingestion: response records boilerplate-extract, WET-style
    conversion records pass through, request/warcinfo/non-HTML are
    skipped, per-record-gzip archives decode, ids are URI-stable and
    source is the host."""
    import hashlib

    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        iter_warc_records,
        read_warc_documents,
    )

    records = [
        ("warcinfo", "", b"software: test", None),
        ("request", "http://site.example/a", b"GET /a HTTP/1.1", None),
        ("response", "http://site.example/a", _WARC_HTML, "text/html; charset=utf-8"),
        ("response", "http://site.example/img", b"\x89PNG....", "image/png"),
        (
            "conversion",
            "http://other.example/b",
            b"plain  extracted\n wet text",
            None,
        ),
    ]
    (tmp_path / "seg.warc").write_bytes(_write_warc(records))
    (tmp_path / "seg2.warc.gz").write_bytes(
        _write_warc([("response", "http://gz.example/c", _WARC_HTML, "text/html")], gz=True)
    )

    docs = {r["source"]: r for r in read_warc_documents(spark, str(tmp_path)).collect()}
    assert set(docs) == {"site.example", "other.example", "gz.example"}
    art = docs["site.example"]
    assert "Crawled article paragraph" in art["text"]
    assert "Home" not in art["text"] and "Terms" not in art["text"]
    assert art["doc_id"] == int(
        hashlib.md5(b"http://site.example/a").hexdigest()[:15], 16
    )
    wet = docs["other.example"]
    assert wet["text"] == "plain extracted wet text"  # whitespace contract
    assert wet["n_chars"] == len(wet["text"])
    assert "Crawled article" in docs["gz.example"]["text"]

    # the record iterator round-trips headers/bodies exactly
    parsed = list(iter_warc_records((tmp_path / "seg.warc").read_bytes()))
    assert [h["warc-type"] for h, _ in parsed] == [
        "warcinfo", "request", "response", "response", "conversion",
    ]
    with __import__("pytest").raises(ValueError, match="WARC"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_read_csv_documents(spark, tmp_path):
    """r10: CSV document exports ingest — header + RFC-4180 quoting
    (multiline quoted text, doubled-quote escapes), producer ids when
    given, md5-of-text ids otherwise, lang column optional, null-text
    rows dropped, and the result feeds corpus_build unchanged."""
    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        read_csv_documents,
    )

    f = tmp_path / "docs.csv"
    f.write_text(
        'id,text,lang\n'
        '1,"first doc body",en\n'
        '2,"multi\nline ""quoted"" text",de\n'
        "3,,\n"  # null text: dropped
        '4,"tabs\tand  spaces   squash",\n'
    )
    docs = {r["doc_id"]: r for r in read_csv_documents(
        spark, str(f), id_col="id", lang_col="lang", source="export"
    ).collect()}
    assert set(docs) == {1, 2, 4}
    assert docs[1]["text"] == "first doc body" and docs[1]["lang"] == "en"
    assert docs[2]["text"] == 'multi line "quoted" text'  # whitespace contract
    assert docs[4]["text"] == "tabs and spaces squash" and docs[4]["lang"] is None
    assert all(r["source"] == "export" and r["n_chars"] == len(r["text"]) for r in docs.values())

    # md5-of-text ids when no id column: stable across re-ingestion
    a = {r["doc_id"] for r in read_csv_documents(spark, str(f)).collect()}
    b = {r["doc_id"] for r in read_csv_documents(spark, str(f)).collect()}
    assert a == b and len(a) == 3 and all(0 <= i < 2**60 for i in a)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="text column"):
        read_csv_documents(spark, str(f), text_col="nope").collect()
    with _pytest.raises(ValueError, match="id column"):
        read_csv_documents(spark, str(f), id_col="nope").collect()


def test_read_csv_documents_failfast_on_malformed_rows(spark, tmp_path):
    """r11 ADVICE fix: malformed CSV rows (column-count drift) must
    RAISE like the JSONL reader's FAILFAST contract — under PERMISSIVE
    they parsed to all-null and the isNotNull(text) filter silently
    discarded them (a silent-data-loss path for corrupt exports)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import CapturedException

    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        read_csv_documents,
    )

    f = tmp_path / "corrupt.csv"
    f.write_text(
        "id,text,lang\n"
        '1,"good row",en\n'
        "2,drifted,extra,columns,here\n"  # column-count drift
    )
    with _pytest.raises((CapturedException, Py4JJavaError)):
        read_csv_documents(spark, str(f), id_col="id").collect()


def test_warc_chunked_transfer_encoding_dechunked(spark, tmp_path):
    """r10 ADVICE fix: raw Common Crawl response records often carry
    Transfer-Encoding: chunked bodies verbatim — the hex chunk-size
    framing must be reassembled, never leak into corpus text."""
    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        _dechunk_http,
        read_warc_documents,
    )

    # unit: frames reassemble, trailers ignored, malformed degrades
    body = b"".join(
        b"%x\r\n%s\r\n" % (len(p), p) for p in (b"hello ", b"world")
    ) + b"0\r\nX-Trailer: t\r\n\r\n"
    assert _dechunk_http(body) == b"hello world"
    assert _dechunk_http(b"6;ext=1\r\nchunky\r\n0\r\n\r\n") == b"chunky"
    assert _dechunk_http(b"nothex\r\nrest") == b""

    # end-to-end: a chunked HTML response extracts clean prose
    html = _WARC_HTML
    mid = len(html) // 2
    chunked = (
        b"%x\r\n%s\r\n%x\r\n%s\r\n0\r\n\r\n"
        % (mid, html[:mid], len(html) - mid, html[mid:])
    )
    rec = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    hdr = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
        b"http://chunk.example/a\r\nContent-Length: "
        + str(len(rec)).encode() + b"\r\n\r\n"
    )
    (tmp_path / "chunked.warc").write_bytes(hdr + rec + b"\r\n\r\n")
    rows = read_warc_documents(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    text = rows[0]["text"]
    assert "Crawled article paragraph" in text
    # no hex framing tokens leaked around the chunk boundary
    assert "%x" % mid not in text.split("Crawled")[0]
    assert "\r" not in text and "0\r\n" not in text


def test_warc_streaming_walk_matches_materializing_reader(spark, tmp_path):
    """r10 (verdict task #5): the streaming record walk (paths-only
    listing + bounded-memory per-record iteration) parses identically
    to the whole-archive materializing reader, for plain AND
    per-record-gzip archives; the record iterator itself is pinned
    chunk-boundary-exact against the in-memory parser at pathological
    chunk sizes."""
    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        iter_warc_records,
        iter_warc_records_stream,
        read_warc_documents,
    )

    records = [
        ("warcinfo", "", b"software: test", None),
        ("response", "http://s.example/a", _WARC_HTML, "text/html"),
        ("response", "http://s.example/img", b"\x89PNG....", "image/png"),
        ("conversion", "http://o.example/b", b"wet  text body", None),
    ] * 3
    plain = _write_warc(records)
    gz = _write_warc(records, gz=True)
    (tmp_path / "seg.warc").write_bytes(plain)
    (tmp_path / "seg2.warc.gz").write_bytes(gz)

    # iterator parity at tiny chunk sizes (forces every boundary path:
    # header split across chunks, body split, gzip member boundaries)
    import io

    want = list(iter_warc_records(plain))
    for payload in (plain, gz):
        for cs in (7, 64, 1 << 20):
            got = list(iter_warc_records_stream(io.BytesIO(payload), chunk_size=cs))
            assert got == want, f"chunk_size={cs}"

    # reader parity: streaming (default) == materialize=True
    stream_rows = sorted(
        read_warc_documents(spark, str(tmp_path)).collect(),
        key=lambda r: (r["doc_id"], r["text"]),
    )
    mat_rows = sorted(
        read_warc_documents(spark, str(tmp_path), materialize=True).collect(),
        key=lambda r: (r["doc_id"], r["text"]),
    )
    assert stream_rows == mat_rows
    # (html response + wet conversion) × 3 repeats × 2 archives
    assert len(stream_rows) == 12

    # truncated archives raise loudly on both walks
    import pytest as _pytest

    broken = plain[: len(plain) - 10]
    with _pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records_stream(io.BytesIO(broken)))


def test_read_zip_documents(spark, tmp_path):
    """ZIP-archive ingestion: txt members pass through, html members
    boilerplate-extract, other members skip, ids are
    archive!member-stable."""
    import zipfile

    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        read_zip_documents,
    )

    z = tmp_path / "dump.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("a/plain.txt", "plain  text\n doc body")
        zf.writestr(
            "b/page.html",
            "<nav><a href='/'>Home</a></nav><p>Archived page paragraph with "
            "definitely more than ten words of genuine readable prose.</p>",
        )
        zf.writestr("c/skip.bin", b"\x00\x01")
    docs = {r["text"][:7]: r for r in read_zip_documents(spark, str(tmp_path)).collect()}
    assert len(docs) == 2
    plain = docs["plain t"]
    assert plain["text"] == "plain text doc body"  # whitespace contract
    page = next(r for r in docs.values() if "Archived page" in r["text"])
    assert "Home" not in page["text"]
    # ids are archive!member-derived and stable across re-ingestion
    again = {r["doc_id"] for r in read_zip_documents(spark, str(tmp_path)).collect()}
    assert again == {r["doc_id"] for r in docs.values()}

    # r10: the streaming walk (default — paths only, one member at a
    # time from the open handle) parses identically to materialize=True
    stream_rows = sorted(
        (r["doc_id"], r["text"]) for r in read_zip_documents(spark, str(tmp_path)).collect()
    )
    mat_rows = sorted(
        (r["doc_id"], r["text"])
        for r in read_zip_documents(spark, str(tmp_path), materialize=True).collect()
    )
    assert stream_rows == mat_rows


def test_streaming_walks_arrow_fs_and_bounded_flush_parity(spark, tmp_path):
    """r11 (verdict tasks #4/#6): (a) the pyarrow-filesystem branch —
    the object-store path (hdfs/s3/gs), exercised here over file://
    via use_arrow_fs=True — parses identically to the plain-open
    branch for BOTH streaming walks; (b) the bounded output flush
    (yield every N docs / M chars instead of once per archive) loses
    and duplicates nothing even at a pathological flush_docs=1."""
    import zipfile

    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        read_warc_documents,
        read_zip_documents,
    )

    records = [("response", "http://s.example/a", _WARC_HTML, "text/html")] + [
        ("conversion", f"http://o.example/w{i}", f"wet body {i} ".encode() * 30, None)
        for i in range(7)
    ]
    (tmp_path / "seg.warc.gz").write_bytes(_write_warc(records, gz=True))
    z = tmp_path / "dump.zip"
    with zipfile.ZipFile(z, "w") as zf:
        for i in range(9):
            zf.writestr(f"m{i}.txt", f"zip member body {i} " * 20)

    def rows(df):
        return sorted((r["doc_id"], r["text"], r["n_chars"]) for r in df.collect())

    warc_base = rows(read_warc_documents(spark, str(tmp_path)))
    assert len(warc_base) == 8
    assert warc_base == rows(
        read_warc_documents(spark, str(tmp_path), use_arrow_fs=True)
    )
    assert warc_base == rows(
        read_warc_documents(spark, str(tmp_path), flush_docs=1)
    )
    assert warc_base == rows(
        read_warc_documents(
            spark, str(tmp_path), use_arrow_fs=True, flush_docs=2, flush_chars=100
        )
    )

    zip_base = rows(read_zip_documents(spark, str(tmp_path)))
    assert len(zip_base) == 9
    assert zip_base == rows(
        read_zip_documents(spark, str(tmp_path), use_arrow_fs=True)
    )
    assert zip_base == rows(read_zip_documents(spark, str(tmp_path), flush_docs=1))
    assert zip_base == rows(
        read_zip_documents(
            spark, str(tmp_path), use_arrow_fs=True, flush_docs=3, flush_chars=50
        )
    )


def test_streaming_walks_over_loopback_s3_scheme(tmp_path):
    """r12 (verdict task #4): the pyarrow-fs branch of _open_stream is
    exercised over a GENUINELY non-local scheme — a loopback S3
    endpoint (minimal ListObjects-free emulation: HEAD + ranged GET)
    served over localhost HTTP, reached via
    s3://...?endpoint_override=. Proves the two streaming walks — the
    WARC record walk (forward reads) and the ZIP central-directory
    walk (tail seek + per-member range reads) — parse byte-identically
    to a local handle where they'll actually run, and that the reads
    arrive as RANGE requests (incremental object-store I/O), not a
    whole-object download."""
    import email.utils
    import io
    import threading
    import zipfile
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from cdc_historical_warehouse_platform_spark.sources.raw_docs import (
        _open_stream,
        iter_warc_records,
        iter_warc_records_stream,
    )

    warc_bytes = _write_warc(
        [("response", "http://s3.example/a", _WARC_HTML, "text/html")]
        + [
            (
                "conversion",
                f"http://s3.example/w{i}",
                f"wet body {i} ".encode() * 40,
                None,
            )
            for i in range(5)
        ],
        gz=True,
    )
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        for i in range(6):
            zf.writestr(f"m{i}.txt", f"zip member body {i} " * 25)
    zip_bytes = zbuf.getvalue()

    files = {"/bkt/seg.warc.gz": warc_bytes, "/bkt/dump.zip": zip_bytes}
    seen: list[tuple[str, str, str | None]] = []

    class _S3Stub(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _serve(self, send_body: bool):
            path = self.path.split("?")[0]
            seen.append((self.command, path, self.headers.get("Range")))
            body = files.get(path)
            if body is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                a, b = rng[6:].split("-")
                lo = int(a)
                hi = min(int(b) if b else len(body) - 1, len(body) - 1)
                part = body[lo : hi + 1]
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {lo}-{hi}/{len(body)}"
                )
            else:
                part = body
                self.send_response(200)
            self.send_header("Content-Length", str(len(part)))
            self.send_header("ETag", '"stub"')
            self.send_header(
                "Last-Modified", email.utils.formatdate(usegmt=True)
            )
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            if send_body:
                self.wfile.write(part)

        def do_GET(self):
            self._serve(True)

        def do_HEAD(self):
            self._serve(False)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _S3Stub)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def s3(key: str) -> str:
            return (
                f"s3://k:s@bkt/{key}?region=us-east-1&scheme=http"
                f"&endpoint_override=127.0.0.1:{port}"
            )

        # WARC record walk: stream over the s3 handle == local parse
        with _open_stream(s3("seg.warc.gz")) as fh:
            remote = [
                (dict(h), bytes(b)) for h, b in iter_warc_records_stream(fh)
            ]
        local = [(dict(h), bytes(b)) for h, b in iter_warc_records(warc_bytes)]
        assert remote == local and len(remote) == 6

        # ZIP central-directory walk: member list + contents identical
        with _open_stream(s3("dump.zip")) as fh, zipfile.ZipFile(fh) as zf:
            remote_members = {m: zf.read(m) for m in zf.namelist()}
        with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
            assert remote_members == {m: zf.read(m) for m in zf.namelist()}

        # the reads were incremental RANGE requests, not full downloads
        zip_gets = [r for r in seen if r[0] == "GET" and r[1] == "/bkt/dump.zip"]
        assert zip_gets and all(rng is not None for _, _, rng in zip_gets)
        assert any(r[0] == "HEAD" for r in seen)  # stat before open

        # an unknown object refuses with the documented guidance
        import pytest as _pytest

        with _pytest.raises(ValueError, match="materialize=True"):
            _open_stream(s3("missing.bin")).read()
    finally:
        srv.shutdown()
