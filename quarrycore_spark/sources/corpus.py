"""Deterministic synthetic `pages` corpus generator (FIXTURES.md).

Produces the Common-Crawl-style input table of BASELINE.json's input_hint:
    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
with the dup populations the reference's tests exercise
(tests/test_deduplication.py, tests/unit/test_canonical_html.py):
unique / exact-dup / canonicalization-equal / near-dup / borderline /
containment / word-shuffle (simhash) / degenerate, plus Zipf-skewed domains
with one hot domain (skew salting exercise).

Everything is seeded — same seed ⇒ byte-identical corpus — and the
generator returns the construction-time population tags so tests can
compute expected dup pairs independently of the engine under test.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass

_VOCAB = (
    "data table scan hash join sort merge key batch stream spark window "
    "filter group order page crawl text dedup shard block store fetch parse "
    "index query plan stage task node executor shuffle partition skew salt "
    "cluster label edge graph star union distinct count schema column row"
).split()

_DOMAINS = [f"site{i:02d}.example.com" for i in range(50)]
HOT_DOMAIN = "hot.example.com"

_HTML_TEMPLATE = (
    "<html><head><title>{title}</title>"
    "<script>var x = {seed}; track(x);</script>"
    "<style>.c{{color:red}}</style></head>"
    "<body><!-- comment {seed} --><nav>home about contact</nav>"
    "<h1>{title}</h1><p>{text}</p>"
    "<footer>copyright example</footer></body></html>"
)


@dataclass
class PageRow:
    url: str
    warc_ts: dt.datetime
    html: bytes
    text: str
    lang: str
    population: str  # construction tag, not part of the table schema
    group_id: int  # docs in the same dup group share it (-1 = none)


def _words(rng: random.Random, n: int) -> list[str]:
    return [rng.choice(_VOCAB) for _ in range(n)]


def _mk_html(title: str, text: str, seed: int, variant: int = 0) -> bytes:
    h = _HTML_TEMPLATE.format(title=title, text=text, seed=seed)
    if variant == 1:  # whitespace / entity variants — canonicalization-equal
        h = h.replace("<p>", "<p >\n  ").replace(" ", "  ", 3)
        h = h.replace("example", "ex&#97;mple", 1)  # entity-encoded, same text
    elif variant == 2:  # extra comments + attribute noise
        h = h.replace("<body>", '<body class="x"><!-- extra -->')
    return h.encode("utf-8")


def generate_pages(
    n: int = 500, seed: int = 42, hot_share: float = 0.3
) -> list[PageRow]:
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows: list[PageRow] = []
    group_id = 0
    ts_step = 0

    def next_ts() -> dt.datetime:
        nonlocal ts_step
        ts_step += rng.randrange(1, 300)
        return t0 + dt.timedelta(seconds=ts_step)

    def domain() -> str:
        return HOT_DOMAIN if rng.random() < hot_share else rng.choice(_DOMAINS)

    def lang() -> str:
        return "en" if rng.random() < 0.9 else rng.choice(["de", "es", "fr", "zh"])

    def emit(
        body: str, population: str, gid: int, variant: int = 0, title: str | None = None
    ) -> None:
        i = len(rows)
        title = title or " ".join(_words(rng, 3))
        # Ground-truth extraction output = h1(title) + main paragraph text,
        # whitespace-collapsed — the byte-identical contract column.
        text = f"{title} {body}".strip()
        rows.append(
            PageRow(
                url=f"https://{domain()}/{population[:4]}/page-{i}",
                warc_ts=next_ts(),
                html=_mk_html(title, body, seed=i, variant=variant),
                text=text,
                lang=lang(),
                population=population,
                group_id=gid,
            )
        )

    while len(rows) < n:
        r = rng.random()
        if r < 0.55:  # unique
            emit(" ".join(_words(rng, rng.randrange(50, 400))), "unique", -1)
        elif r < 0.70:  # exact-dup group (same content, distinct urls)
            text = " ".join(_words(rng, rng.randrange(50, 300)))
            title = " ".join(_words(rng, 3))
            gid = group_id = group_id + 1
            for _ in range(rng.randrange(2, 6)):
                emit(text, "exact", gid, title=title)
        elif r < 0.75:  # canonicalization-equal group
            text = " ".join(_words(rng, rng.randrange(50, 300)))
            title = " ".join(_words(rng, 3))
            gid = group_id = group_id + 1
            for v in range(rng.randrange(2, 4)):
                emit(text, "canon", gid, variant=v, title=title)
        elif r < 0.90:  # near-dup group: 1-7% token substitutions
            base = _words(rng, rng.randrange(150, 400))
            gid = group_id = group_id + 1
            emit(" ".join(base), "near", gid)
            for _ in range(rng.randrange(1, 4)):
                var = list(base)
                n_sub = max(1, int(len(var) * rng.uniform(0.01, 0.07)))
                for _ in range(n_sub):
                    var[rng.randrange(len(var))] = rng.choice(_VOCAB)
                emit(" ".join(var), "near", gid)
        elif r < 0.93:  # borderline: 20-35% substitutions — must NOT pair
            base = _words(rng, rng.randrange(150, 300))
            gid = group_id = group_id + 1
            emit(" ".join(base), "borderline", gid)
            var = list(base)
            for _ in range(int(len(var) * rng.uniform(0.20, 0.35))):
                var[rng.randrange(len(var))] = rng.choice(_VOCAB)
            emit(" ".join(var), "borderline", gid)
        elif r < 0.97:  # containment pair: B = A + 50-150% extra
            base = _words(rng, rng.randrange(100, 250))
            gid = group_id = group_id + 1
            emit(" ".join(base), "contain", gid)
            extra = _words(rng, int(len(base) * rng.uniform(0.5, 1.5)))
            emit(" ".join(base + extra), "contain", gid)
        elif r < 0.995:  # word-shuffled variant (simhash-band target)
            base = _words(rng, rng.randrange(150, 300))
            gid = group_id = group_id + 1
            emit(" ".join(base), "shuffle", gid)
            var = list(base)
            # swap a handful of adjacent words — high char overlap
            for _ in range(3):
                j = rng.randrange(len(var) - 1)
                var[j], var[j + 1] = var[j + 1], var[j]
            emit(" ".join(var), "shuffle", gid)
        else:  # degenerate
            emit(rng.choice(["", "tiny", "abc"]), "degenerate", -1)
    return rows[:n]


def pages_dataframe(spark, rows: list[PageRow]):
    """Construct the pages DataFrame with the explicit input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    data = [(r.url, r.warc_ts, r.html, r.text, r.lang) for r in rows]
    return spark.createDataFrame(data, schema)


def replicate_pages(spark, base, factor: int):
    """Scale a pages DataFrame by `factor` for throughput benchmarking:
    each replica gets distinct urls and per-row word-shuffled text (so
    replicas are NOT near-duplicates of each other and every doc costs the
    pipeline full extraction + signature work). Spark-side — scales to
    millions of rows in seconds, unlike the driver-side generator.

    Note: F.shuffle is non-deterministic per task attempt — fine for a
    throughput corpus, not for correctness fixtures (use generate_pages).
    """
    from pyspark.sql import functions as F

    reps = spark.range(factor).select(F.col("id").alias("rep"))
    shuffled = F.concat_ws(" ", F.shuffle(F.split(F.col("text"), " ")))
    return (
        base.crossJoin(reps)
        .select(
            F.concat_ws("-r", "url", "rep").alias("url"),
            "warc_ts",
            F.concat(
                F.lit(b"<html><head><title>t</title></head><body><p>"),
                F.encode(shuffled, "utf-8"),
                F.lit(b"</p></body></html>"),
            ).alias("html"),
            shuffled.alias("text"),
            "lang",
        )
    )


def write_pages(spark, path: str, n: int = 500, seed: int = 42, hot_share: float = 0.3):
    """Write the corpus as parquet partitioned the way the warm tier is in
    the reference (domain-derived partitioning, config.py:90-93)."""
    rows = generate_pages(n, seed, hot_share)
    df = pages_dataframe(spark, rows)
    df.write.mode("overwrite").parquet(path)
    return rows
