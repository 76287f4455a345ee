"""WARC source: record grammar, multi-member gzip, dead-letters, and
pipeline hand-off."""

from __future__ import annotations

import gzip
import os

from quarrycore_spark.sources.warc import parse_warc_records, read_warc


def _record(rtype: str, url: str | None, date: str, block: bytes) -> bytes:
    headers = [f"WARC/1.0", f"WARC-Type: {rtype}", f"WARC-Date: {date}"]
    if url is not None:
        headers.append(f"WARC-Target-URI: {url}")
    headers.append(f"Content-Length: {len(block)}")
    return (
        "\r\n".join(headers).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"
    )


def _http(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )


def _make_warc(n: int) -> bytes:
    out = [_record("warcinfo", None, "2025-03-01T00:00:00Z", b"info: x")]
    for i in range(n):
        url = f"https://site{i % 3}.example.com/p{i}"
        date = f"2025-03-01T00:00:{i % 60:02d}Z"
        body = f"<html><body><p>page {i} body text</p></body></html>".encode()
        out.append(_record("request", url, date, b"GET /"))
        out.append(_record("response", url, date, _http(body)))
    return b"".join(out)


def test_parser_grammar_and_skips():
    recs = list(parse_warc_records(_make_warc(5)))
    pages = [r for r in recs if r.get("url") and "warc_error" not in r]
    assert len(pages) == 5  # warcinfo + requests skipped
    assert pages[2]["url"] == "https://site2.example.com/p2"
    assert b"page 2 body text" in pages[2]["html"]
    assert b"HTTP/1.1" not in pages[2]["html"]  # HTTP headers stripped
    assert pages[3]["warc_ts"].second == 3


def test_parser_dead_letters():
    good = _make_warc(2)
    bad_len = _record("response", "https://x.example.com/",
                      "2025-03-01T00:00:00Z", _http(b"<p>x</p>"))
    bad_len = bad_len.replace(b"Content-Length: ", b"Content-Length: nope", 1)
    bad_date = _record("response", "https://y.example.com/",
                       "not-a-date", _http(b"<p>y</p>"))
    recs = list(parse_warc_records(good + bad_len + bad_date))
    pages = [r for r in recs if r.get("url") and "warc_error" not in r]
    errs = [r for r in recs if "warc_error" in r]
    assert len(pages) == 2
    assert any("bad headers" in e["warc_error"] for e in errs)
    assert any("bad WARC-Date" in e["warc_error"] for e in errs)


def test_read_warc_plain_and_multimember_gzip(spark, tmp_path):
    raw = _make_warc(12)
    (tmp_path / "a.warc").write_bytes(raw)
    # Common-Crawl convention: each record its own gzip member.
    members = b"".join(
        gzip.compress(bytes(r) + b"")
        for r in [_make_warc(7)[i:i + 4096] for i in range(0, len(_make_warc(7)), 4096)]
    )
    (tmp_path / "b.warc.gz").write_bytes(members)
    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = df.collect()
    pages = [r for r in rows if r.url is not None and r.warc_error is None]
    assert len(pages) == 12 + 7
    assert all(r.warc_ts is not None for r in pages)
    assert all(b"body text" in bytes(r.html) for r in pages)


def test_warc_pages_flow_into_extraction(spark, tmp_path):
    from pyspark.sql import functions as F

    from quarrycore_spark.extraction.canonical import extract_pages

    (tmp_path / "c.warc").write_bytes(_make_warc(6))
    pages = (
        read_warc(spark, str(tmp_path / "c.warc"))
        .filter(F.col("url").isNotNull())
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("lang", F.lit("en"))
        .select("url", "warc_ts", "html", "text", "lang")
    )
    out = extract_pages(pages).collect()
    assert len(out) == 6
    for r in out:
        assert "body text" in r.extracted_text
        assert r.extract_error is None


def test_pipeline_cli_warc_mode(tmp_path):
    """The spark-submit surface: OUT_DIR --warc GLOB runs the full
    dedup pipeline over parsed WARC pages in a fresh process."""
    import json
    import os
    import subprocess
    import sys

    (tmp_path / "seg.warc").write_bytes(_make_warc(20))
    out_dir = tmp_path / "out"
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, "-m", "quarrycore_spark.plans.pipeline",
         str(out_dir), "--warc", str(tmp_path / "*.warc")],
        capture_output=True, text=True, timeout=240, env=env, cwd="/tmp",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout[proc.stdout.index("["):])
    summary = [m for m in metrics if m.get("stage") == "summary"][0]
    assert summary["total_docs"] == 20


def test_negative_content_length_terminates():
    """A negative Content-Length must dead-letter and advance — not
    re-find the same version line forever."""
    bad = _record("response", "https://z.example.com/",
                  "2025-03-01T00:00:00Z", _http(b"<p>z</p>"))
    bad = bad.replace(b"Content-Length: ", b"Content-Length: -", 1)
    recs = list(parse_warc_records(bad + _make_warc(1)))
    errs = [r for r in recs if "warc_error" in r]
    pages = [r for r in recs if r.get("url") and "warc_error" not in r]
    assert len(pages) == 1  # the good record after the bad one
    assert any("negative Content-Length" in e["warc_error"] for e in errs)


def test_write_warc_roundtrip(spark, tmp_path):
    """pages -> write_warc (per-record gzip members) -> read_warc must
    reproduce the exact (url, warc_ts, html) set."""
    from datetime import datetime

    from quarrycore_spark.sources.warc import write_warc

    rows = [
        (
            f"https://site{i % 3}.example.com/w{i}",
            datetime(2025, 4, 1, 12, 0, i % 60),
            f"<html><body>roundtrip {i}</body></html>".encode(),
        )
        for i in range(25)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(3)
    out_dir = str(tmp_path / "warcout")
    manifest = write_warc(pages, out_dir).collect()
    assert sum(m.n_records for m in manifest) == 25
    assert all(m.path.endswith(".warc.gz") for m in manifest)
    back = read_warc(spark, out_dir + "/*.warc.gz").collect()
    got = {(r.url, r.warc_ts, bytes(r.html)) for r in back
           if r.warc_error is None}
    assert got == set(rows)


def test_write_warc_idempotent_and_subsecond(spark, tmp_path):
    """Double materialization converges to the same files (deterministic
    names + atomic rename), and microsecond timestamps round-trip."""
    from datetime import datetime

    from quarrycore_spark.sources.warc import write_warc

    rows = [(
        "https://site0.example.com/us",
        datetime(2025, 4, 2, 3, 4, 5, 123456),
        b"<html><body>micro body text</body></html>",
    )]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).coalesce(1)
    out_dir = str(tmp_path / "idem")
    frame = write_warc(pages, out_dir)
    m1 = frame.collect()
    m2 = frame.collect()  # re-materialization must not duplicate shards
    assert [m.path for m in m1] == [m.path for m in m2]
    files = [f for f in os.listdir(out_dir) if not f.endswith(".inprogress")]
    assert files == ["part-00000.warc.gz"]
    back = read_warc(spark, out_dir + "/*.warc.gz").collect()
    assert len(back) == 1
    assert back[0].warc_ts == rows[0][1]  # microseconds preserved


def test_read_warc_truncated_gzip_dead_letters(spark, tmp_path):
    """A truncated gzip member dead-letters (EOFError path) instead of
    killing the task."""
    good = gzip.compress(_make_warc(2))
    (tmp_path / "t.warc.gz").write_bytes(good[: len(good) - 8])
    rows = read_warc(spark, str(tmp_path / "t.warc.gz")).collect()
    assert rows
    assert all(r.warc_error is not None or r.url is not None for r in rows)
    assert any(r.warc_error and "bad gzip" in r.warc_error for r in rows)
