"""WARC source: read Common-Crawl-style WARC files into the pipeline's
pages table, Spark-first.

The input_hint's corpus is "Common-Crawl-style web pages"; Common Crawl
ships them as WARC/1.0 files (ISO 28500 — a public, line-delimited
record format), one ~1 GB gzipped file per shard. This module is the
S1 ingestion path for that physical format: a stdlib-only WARC parser
(no warcio in this environment — the format is simple enough that the
dependency buys nothing) mapped over Spark's `binaryFile` source.

Record grammar (ISO 28500 §4): a version line ``WARC/1.0``, CRLF header
lines ``Name: value``, an empty line, ``Content-Length`` octets of
block, CRLF CRLF. ``response`` records carry an HTTP response as the
block; the page bytes are the HTTP body after its own header/body split.
Common Crawl gzips each record as its own member, so a `.warc.gz` is a
multi-member stream — stdlib ``gzip`` consumes those back-to-back.

Scale shape: ONE WARC FILE IS THE PARALLELISM UNIT. `binaryFile` gives
one row per file (path, bytes); `mapInPandas` parses each file inside
its task, so a 1000-file crawl segment fans out to 1000 independent
tasks with zero shuffle — exactly how a real cluster chews a crawl
(CC's own convention: files are sized ~1 GB so per-task memory is
bounded). Records stream out as (url, warc_ts, html); malformed records
dead-letter as rows with a non-NULL `warc_error` (url kept when known,
so the dead-letter is actionable) instead of killing the task (the
pipeline's S10 convention) — consumers select pages with
``warc_error IS NULL``.

Reference parity: the reference ingests live HTTP responses
(crawler/http_client.py) and never reads WARC; this is the batch-world
equivalent source for the same page payloads.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, warc_error string"
)


def _split_http_body(block: bytes) -> bytes:
    """HTTP response block -> body bytes (after the header/body split)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        # Some writers emit bare-LF HTTP headers; tolerate.
        sep = block.find(b"\n\n")
        return block[sep + 2:] if sep >= 0 else block
    return block[sep + 4:]


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, html} per response record, or {warc_error}.

    Pure-Python WARC/1.0 parser: version line, CRLF headers, empty line,
    Content-Length block, CRLF CRLF. Non-response records (warcinfo,
    request, metadata) are skipped silently; structurally broken records
    dead-letter and parsing resumes at the next version line.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # Seek the next version line (tolerates inter-record noise).
        head = data.find(b"WARC/", pos)
        if head < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", head)
        if hdr_end < 0:
            yield {"warc_error": "truncated header block"}
            return
        try:
            lines = data[head:hdr_end].decode("utf-8", errors="replace")
            headers: dict[str, str] = {}
            for line in lines.split("\r\n")[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            if length < 0:
                # A negative length would move `pos` BACKWARDS and re-find
                # the same version line forever.
                raise ValueError(f"negative Content-Length {length}")
        except (KeyError, ValueError) as e:
            yield {"warc_error": f"bad headers: {e}"}
            pos = hdr_end + 4
            continue
        block_start = hdr_end + 4
        block_end = block_start + length
        if block_end > n:
            yield {"warc_error": "truncated block"}
            return
        pos = block_end  # trailing CRLFs are skipped by the next seek
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
            ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
        except ValueError:
            yield {"warc_error": f"bad WARC-Date: {ts_raw!r}", "url": url}
            continue
        if not url:
            yield {"warc_error": "response record without WARC-Target-URI"}
            continue
        yield {
            "url": url,
            "warc_ts": ts,
            "html": _split_http_body(data[block_start:block_end]),
        }


def _maybe_gunzip(path: str, content: bytes) -> bytes:
    if path.endswith(".gz"):
        # Multi-member stream (CC gzips each record separately) —
        # GzipFile reads members back-to-back.
        with gzip.GzipFile(fileobj=io.BytesIO(content)) as f:
            return f.read()
    return content


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s)/glob → pages DataFrame (url, warc_ts, html,
    warc_error). Rows with non-NULL warc_error are dead-letters (S10),
    not pages — filter ``warc_error IS NULL`` before the pipeline."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import zlib

        for pdf in batches:
            out: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    raw = _maybe_gunzip(str(p), bytes(content))
                # gzip raises EOFError on a truncated member and
                # zlib.error on corrupt deflate data — neither is an
                # OSError, and an uncaught one would kill the task
                # instead of dead-lettering (the S10 contract).
                except (OSError, EOFError, zlib.error) as e:
                    out.append({"warc_error": f"bad gzip: {e}"})
                    continue
                out.extend(parse_warc_records(raw))
            pdf_out = pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "warc_error"]
            )
            # An all-dead-letter batch leaves warc_ts as float NaN, which
            # Arrow refuses to cast to timestamp — pin the dtype.
            pdf_out["warc_ts"] = pd.to_datetime(pdf_out["warc_ts"])
            yield pdf_out

    return files.select("path", "content").mapInPandas(gen, PAGES_SCHEMA)


def _render_record(url: str, ts, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping the page bytes in a minimal
    HTTP response (the reader's body split is the exact inverse).

    The 'Z' designator asserts UTC: `ts` is the session-local naive
    timestamp Arrow hands the worker, so the label is only truthful
    under a UTC session timezone — which session.py pins and the driver
    harness sets. Writing archives from a non-UTC session would stamp
    local wall time as UTC; keep the session at UTC (repo-wide rule).
    Sub-second precision is preserved so the reader round-trips exactly.
    """
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    date = ts.strftime("%Y-%m-%dT%H:%M:%S")
    if getattr(ts, "microsecond", 0):
        date += f".{ts.microsecond:06d}"
    date += "Z"
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\nContent-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def write_warc(df: DataFrame, out_dir: str, compress: bool = True) -> DataFrame:
    """pages(url, warc_ts, html) → one WARC file per partition under
    `out_dir` (Common Crawl's sharding convention mirrored on write:
    the file is the parallelism unit for any downstream reader).
    `compress=True` gzips EACH record as its own member — the CC layout
    that lets a reader seek to a record without decompressing the file.

    Returns a (path, n_records) DataFrame — an ACTION-bearing frame the
    caller must materialize (e.g. .collect()) to run the write, like
    every mapInPandas sink.

    Commit protocol: each task writes to a uuid-suffixed temp name and
    os.replace()s it onto the DETERMINISTIC final name
    ``part-{partition:05d}{ext}`` — a failed/retried or speculative
    task, or a second materialization of the returned frame, therefore
    overwrites the same file with identical content instead of
    accumulating partial/duplicate shards; orphaned ``*.inprogress``
    temps never match a ``*.warc*`` reader glob.

    Filesystem contract: `out_dir` must be a filesystem every executor
    can reach (shared mount or object store via a fuse/NFS path) — the
    same assumption every file-granular archive writer makes; in plain
    multi-node local-disk setups use Spark's own sinks instead.
    """
    import os
    import uuid

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def sink(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        os.makedirs(out_dir, exist_ok=True)  # executor-side, racy-safe
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = f"{final}.{uuid.uuid4().hex[:8]}.inprogress"
        n = 0
        with open(tmp, "wb") as f:
            for pdf in batches:
                for url, ts, html in zip(
                    pdf["url"], pdf["warc_ts"], pdf["html"]
                ):
                    rec = _render_record(str(url), ts, bytes(html))
                    f.write(gzip.compress(rec) if compress else rec)
                    n += 1
        if n == 0:
            os.remove(tmp)
            yield pd.DataFrame({"path": [], "n_records": []})
            return
        os.replace(tmp, final)  # atomic commit; retries converge here
        yield pd.DataFrame({"path": [final], "n_records": [n]})

    return df.select("url", "warc_ts", "html").mapInPandas(
        sink, "path string, n_records long"
    )
