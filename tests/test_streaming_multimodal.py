"""Streaming dedup + multimodal plumbing + exporter tests."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from quarrycore_spark.sources.corpus import generate_pages, pages_dataframe


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_pages") / "pages")
    rows = generate_pages(200, seed=7)
    pages_dataframe(spark, rows).write.mode("overwrite").parquet(path)
    return path, rows


def test_streaming_watermark_dedup(spark, pages_parquet, tmp_path):
    from quarrycore_spark.streaming.dedup_stream import streaming_exact_dedup

    path, rows = pages_parquet
    static = spark.read.parquet(path)
    stream = spark.readStream.schema(static.schema).parquet(path)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select count(*) n, count(distinct content_hash) d from dedup_out").collect()[0]
    expected_hashes = (
        static.selectExpr("sha2(lower(trim(regexp_replace(cast(html as string), '<[^>]+>|\\\\s+', ' '))), 256)")
    )
    # one row per distinct content hash, no duplicates in the output
    assert got["n"] == got["d"]
    assert got["n"] < len(rows)  # corpus contains dup groups


def test_foreach_batch_cross_batch_dedup(spark, pages_parquet, tmp_path):
    from quarrycore_spark.streaming.dedup_stream import ForeachBatchDedup

    path, rows = pages_parquet
    static = spark.read.parquet(path)
    halves = static.randomSplit([0.5, 0.5], seed=1)
    sink = ForeachBatchDedup(str(tmp_path / "state"), str(tmp_path / "out"))
    # drive two "micro-batches" directly (deterministic, no stream race)
    sink(halves[0], 0)
    sink(halves[1], 1)
    out = spark.read.parquet(str(tmp_path / "out" / "epoch=*"))
    n = out.count()
    d = out.select("content_hash").distinct().count()
    assert n == d, "a hash emitted twice across batches"
    # equals batch-mode exact dedup of the full corpus
    from quarrycore_spark.extraction.canonical import extract_pages

    full = extract_pages(static).select("content_hash").distinct().count()
    assert n == full
    # replay idempotence: rerunning epoch 1 (crash-after-state-write
    # scenario) must NOT anti-join against its own state — the epoch dir is
    # rewritten with the identical survivor set, never emptied
    before = sorted(
        r["content_hash"]
        for r in spark.read.parquet(str(tmp_path / "out" / "epoch=1")).collect()
    )
    sink(halves[1], 1)
    after = sorted(
        r["content_hash"]
        for r in spark.read.parquet(str(tmp_path / "out" / "epoch=1")).collect()
    )
    assert before == after and len(after) > 0


def test_multimodal_features_and_dedup(spark):
    from quarrycore_spark.multimodal.stubs import (
        exact_media_dedup,
        extract_media_features,
        real_decode,
    )

    data = [
        (1, "image", bytearray(b"PNG-fake-bytes-1"), ("image/png", 4, 4, None)),
        (2, "image", bytearray(b"PNG-fake-bytes-1"), ("image/png", 4, 4, None)),  # dup
        (3, "audio", bytearray(b"WAV-fake-bytes-2"), ("audio/wav", None, None, 1200)),
        (4, "video", None, ("video/mp4", 16, 16, 5000)),  # null payload
    ]
    media = spark.createDataFrame(
        data,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    feats = extract_media_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["sha256"] == by_id[2]["sha256"]
    assert by_id[1]["feature"] == by_id[2]["feature"]
    assert by_id[1]["sha256"] != by_id[3]["sha256"]
    assert len(by_id[1]["feature"]) == 16
    assert all(r["decode_error"] is None for r in feats)

    dedup = {r["sha256"]: r for r in exact_media_dedup(
        extract_media_features(media)).collect()}
    assert dedup[by_id[1]["sha256"]]["group_size"] == 2
    assert dedup[by_id[1]["sha256"]]["canonical_media_id"] == 1

    from quarrycore_spark.multimodal.codecs import UnsupportedMediaError

    with pytest.raises(UnsupportedMediaError):
        real_decode(b"x", "image/png")  # compressed formats need absent libs


def test_exporters(spark, tmp_path):
    from quarrycore_spark.sources.export import (
        export_jsonl,
        export_parquet,
        quality_top_n,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", i % 100) for i in range(500)],
        "doc_id long, text string, quality_scaled int",
    )
    jp = str(tmp_path / "jsonl")
    export_jsonl(df, jp)
    assert glob.glob(os.path.join(jp, "*.json.gz"))
    assert spark.read.json(jp).count() == 500

    pp = str(tmp_path / "parq")
    export_parquet(df, pp, shard_size=100)
    assert spark.read.parquet(pp).count() == 500

    top = quality_top_n(df, 10).collect()
    assert len(top) == 10 and all(r["quality_scaled"] == 99 for r in top[:5])


def test_real_decode_features_and_phash_pairs(spark):
    """Real-decode path: WAV/BMP/PPM payloads decode natively; the same
    image in two container formats gets the identical perceptual hash; a
    one-pixel near-dup pairs up via the banded dHash join; unsupported
    formats dead-letter."""
    import numpy as np

    from quarrycore_spark.multimodal.stubs import (
        extract_media_features,
        phash_near_dup_pairs,
    )
    from tests.test_codecs import make_bmp, make_ppm, make_wav, random_img

    img = random_img(7, 32, 32)
    near = img.copy()
    near[0, 0] = 255 - near[0, 0]
    rows = [
        (1, "image", bytearray(make_bmp(img)), ("image/bmp", 32, 32, None)),
        (2, "image", bytearray(make_ppm(img)), ("image/ppm", 32, 32, None)),
        (3, "image", bytearray(make_bmp(near)), ("image/bmp", 32, 32, None)),
        (4, "image", bytearray(make_bmp(random_img(8, 32, 32))), ("image/bmp", 32, 32, None)),
        (5, "audio", bytearray(make_wav()), ("audio/wav", None, None, 100)),
        (6, "image", bytearray(b"\x89PNG fake"), ("image/png", 8, 8, None)),
        (7, "video", bytearray(b"mp4 fake"), ("video/mp4", None, None, 5000)),
    ]
    from quarrycore_spark.multimodal.stubs import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             extract_media_features(media, use_fake=False).collect()}
    # identical pixels through two formats -> identical phash
    assert feats[1]["phash"] == feats[2]["phash"] is not None
    assert feats[1]["decode_error"] is None
    # audio decodes, has features, no phash
    assert feats[5]["decode_error"] is None and feats[5]["phash"] is None
    assert any(abs(x) > 0 for x in feats[5]["feature"])
    # unsupported formats dead-letter with the reason, job survives
    assert "UnsupportedMediaError" in feats[6]["decode_error"]
    assert "UnsupportedMediaError" in feats[7]["decode_error"]
    # banded perceptual join finds the exact-dup AND the one-pixel near-dup
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in phash_near_dup_pairs(
            extract_media_features(media, use_fake=False)
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 7
    assert (1, 4) not in pairs


def test_streaming_lsh_pairs_stateful_cross_batch(spark, tmp_path):
    """applyInPandasWithState LSH: a near-dup pair split across TWO
    micro-batches must surface via bucket state (the streaming analogue of
    the reference's Redis query-before-insert), and the emitted pairs must
    match the batch operator's verified pairs on the same corpus."""
    from quarrycore_spark.config import DEFAULT_CONFIG as CFG
    from quarrycore_spark.operators.lsh import verified_pairs
    from quarrycore_spark.operators.signatures import with_signatures
    from quarrycore_spark.streaming.dedup_stream import streaming_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the crawler "
        "fetches pages and the dedup engine builds minhash signatures "
        "over seven character shingles for near duplicate detection "
    ) * 3
    rows_b1 = [
        (1, base),
        (2, "completely different content about spark adaptive query execution "
            "and shuffle partition coalescing at terabyte scale " * 4),
    ]
    rows_b2 = [
        (3, base.replace("lazy", "idle")),  # near-dup of doc 1
        (4, "yet another unrelated page with its own words entirely " * 6),
    ]
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    # one file per micro-batch (maxFilesPerTrigger=1)
    spark.createDataFrame(rows_b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows_b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_lsh_pairs(stream, CFG)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_pairs_out")
        .option("checkpointLocation", str(tmp_path / "ck_lsh"))
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 2, "expected multiple micro-batches"

    got = {
        (r["a_id"], r["b_id"], r["agree_cnt"])
        for r in spark.sql("select * from lsh_pairs_out").collect()
    }
    static = spark.createDataFrame(rows_b1 + rows_b2, schema)
    want = {
        (r["a_id"], r["b_id"], r["agree_cnt"])
        for r in verified_pairs(with_signatures(static, CFG, family="poly"), CFG).collect()
    }
    assert (1, 3) in {(a, b) for a, b, _ in want}, "fixture must contain a near-dup pair"
    assert got == want
