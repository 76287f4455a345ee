"""P14 page-metadata extraction: golden fixtures for every subsystem
(OG / Twitter / JSON-LD / standard meta / canonical / date cascade /
author cascade) plus the Spark operator round-trip and the synth-oracle
renderer's formula pinning."""

from __future__ import annotations

from datetime import datetime

from quarrycore_spark.extraction.metadata import (
    extract_authors,
    extract_publication_date,
    extract_structured_data,
    is_valid_author_name,
    page_metadata_row,
    parse_date_string,
    parse_json_ld,
    with_page_metadata,
)

FULL_PAGE = b"""<html><head>
<title> Fixture &amp; Title </title>
<meta property="og:title" content="OG Title"/>
<meta property="og:type" content="article">
<meta content="OG Desc" property="og:description">
<meta property="og:image" content="/img/pic.png">
<meta property="og:locale" content="en_US">
<meta name="twitter:card" content="summary_large_image">
<meta name="twitter:creator" content="@someone">
<meta name="description" content="Meta desc">
<meta name="keywords" content="a,b,c">
<meta name="robots" content="index,follow">
<meta property="article:published_time" content="2022-03-05T10:00:00Z">
<link rel="stylesheet" href="/x.css"><link rel="canonical" href="/canonical/path">
<script type="application/ld+json">
{"@type":"NewsArticle","headline":"Schema Headline",
 "author":{"@type":"Person","name":"John Smith"},
 "datePublished":"2021-07-09","dateModified":"2023-01-01",
 "publisher":{"name":"Pub Co"},"image":["http://ex.com/1.png"]}
</script>
<script>var fake='<meta property="og:title" content="FAKE">';</script>
<!-- <meta name="author" content="Commented Out"> -->
</head><body>
<time datetime="2020-01-02T03:04:05">Jan 2, 2020</time>
<div class="byline">Dana Writerly</div>
<a rel="author" href="/a">Rel Author</a>
</body></html>"""


class TestStructuredData:
    def test_opengraph(self):
        sd = extract_structured_data(FULL_PAGE, base_url="https://ex.com/p/1")
        assert sd["og_title"] == "OG Title"
        assert sd["og_type"] == "article"
        assert sd["og_description"] == "OG Desc"  # content-before-property order
        assert sd["og_image"] == "https://ex.com/img/pic.png"  # urljoin
        assert sd["og_locale"] == "en_US"

    def test_twitter(self):
        sd = extract_structured_data(FULL_PAGE)
        assert sd["twitter_card"] == "summary_large_image"
        assert sd["twitter_creator"] == "@someone"

    def test_json_ld_fields(self):
        sd = extract_structured_data(FULL_PAGE)
        assert sd["schema_type"] == "NewsArticle"
        assert sd["schema_title"] == "Schema Headline"
        assert sd["schema_author"] == "John Smith"  # nested Person.name
        assert sd["schema_date_published"] == "2021-07-09"
        assert sd["schema_publisher"] == "Pub Co"  # nested name
        assert sd["schema_image"] == "http://ex.com/1.png"  # list head

    def test_standard_meta_and_canonical(self):
        sd = extract_structured_data(FULL_PAGE, base_url="https://ex.com/p/1")
        assert sd["meta_title"] == "Fixture & Title"  # unescaped, squeezed
        assert sd["meta_description"] == "Meta desc"
        assert sd["meta_keywords"] == "a,b,c"
        assert sd["meta_robots"] == "index,follow"
        assert sd["canonical_url"] == "https://ex.com/canonical/path"

    def test_merge_priority_og_over_schema(self):
        # reference metadata_extractor.py:318-331
        sd = extract_structured_data(FULL_PAGE)
        assert sd["title"] == "OG Title"
        assert sd["description"] == "OG Desc"
        assert sd["featured_image"] == sd["og_image"]

    def test_merge_falls_to_schema_without_og(self):
        page = (
            b'<html><head><script type="application/ld+json">'
            b'{"@type":"Article","headline":"Only Schema"}</script>'
            b"</head></html>"
        )
        sd = extract_structured_data(page)
        assert sd["title"] == "Only Schema"
        assert "og_title" not in sd

    def test_script_and_comment_noise_ignored(self):
        noise = (
            b"<script>var x='<meta property=\"og:title\" content=\"EVIL\">';"
            b"</script><!-- <meta name=\"author\" content=\"Ghost\"> -->"
        )
        sd = extract_structured_data(noise)
        assert "og_title" not in sd
        assert "meta_author" not in sd

    def test_schema_title_last_present_key_wins(self):
        # reference extract_schema_fields iterates name -> headline -> title,
        # assigning unconditionally: the LAST present key wins
        page = (
            b'<html><script type="application/ld+json">'
            b'{"@type":"Article","name":"From Name","headline":"From Headline"}'
            b"</script></html>"
        )
        assert extract_structured_data(page)["schema_title"] == "From Headline"

    def test_invalid_json_ld_skipped(self):
        page = (
            b'<html><script type="application/ld+json">{not json}</script>'
            b'<script type="application/ld+json">{"@type":"Article"}</script>'
            b"</html>"
        )
        items = parse_json_ld(page.decode())
        assert len(items) == 1 and items[0]["@type"] == "Article"

    def test_json_ld_array_flattened(self):
        page = (
            b'<html><script type="application/ld+json">'
            b'[{"@type":"A"},{"@type":"B"}]</script></html>'
        )
        assert len(parse_json_ld(page.decode())) == 2


class TestMicrodata:
    PAGE = b"""<html><body>
    <div itemscope itemtype="https://schema.org/Product">
      <span itemprop="name">Widget 3000</span>
      <meta itemprop="sku" content="W3K-01">
      <img itemprop="image" src="/w.png">
      <a itemprop="url" href="/widget">details</a>
      <time itemprop="releaseDate" datetime="2021-04-01">April</time>
    </div>
    <div itemscope itemtype="https://schema.org/Review">
      <span itemprop="reviewBody">Solid.</span>
    </div>
    </body></html>"""

    def test_value_source_per_tag(self):
        from quarrycore_spark.extraction.metadata import parse_microdata

        md = parse_microdata(self.PAGE.decode())
        prod = md["https://schema.org/Product"]
        assert prod["name"] == "Widget 3000"  # span -> text
        assert prod["sku"] == "W3K-01"  # meta -> content
        assert prod["image"] == "/w.png"  # img -> src
        assert prod["url"] == "/widget"  # a -> href
        assert prod["releaseDate"] == "2021-04-01"  # time -> datetime
        assert md["https://schema.org/Review"]["reviewBody"] == "Solid."

    def test_surface_fields(self):
        sd = extract_structured_data(self.PAGE)
        assert sd["microdata_type"] == "https://schema.org/Product"
        assert sd["n_microdata_props"] == 6
        row = page_metadata_row("", self.PAGE)
        assert row["microdata_type"] == "https://schema.org/Product"
        assert row["n_microdata_props"] == 6

    def test_no_microdata(self):
        assert "microdata_type" not in extract_structured_data(b"<html></html>")
        assert page_metadata_row("", b"<html></html>")["n_microdata_props"] == 0


class TestDateCascade:
    def test_structured_beats_meta(self):
        got = extract_publication_date(FULL_PAGE, url="https://ex.com/2019/11/03/p/")
        assert got == ("2021-07-09", "structured_data", 95)

    def test_meta_beats_time(self):
        page = (
            b'<html><meta property="article:published_time" '
            b'content="2022-03-05T10:00:00Z">'
            b'<time datetime="2020-01-02T03:04:05">x</time></html>'
        )
        assert extract_publication_date(page) == ("2022-03-05", "meta_tags", 90)

    def test_nonarticle_meta_is_80(self):
        page = b'<html><meta name="DC.date.issued" content="2017-06-01"></html>'
        assert extract_publication_date(page) == ("2017-06-01", "meta_tags", 80)

    def test_time_element(self):
        page = b'<html><time datetime="2020-01-02T03:04:05">x</time></html>'
        assert extract_publication_date(page) == ("2020-01-02", "time_element", 85)

    def test_url_pattern_fallback(self):
        assert extract_publication_date(
            b"<html></html>", url="https://ex.com/2019/11/3/post/"
        ) == ("2019-11-03", "url_pattern", 75)

    def test_content_pattern_last_resort(self):
        page = b"<html><p>Published on 2016-09-14 by staff.</p></html>"
        got = extract_publication_date(page)
        assert got == ("2016-09-14", "content_pattern", 70)  # 60 + context boost

    def test_unreasonable_dates_filtered(self):
        # future and pre-1990 candidates must be skipped for the next-best
        page = (
            b'<html><meta property="article:published_time" content="2289-01-01">'
            b'<time datetime="1971-05-05T00:00:00">x</time>'
            b'<meta name="date" content="2012-12-12"></html>'
        )
        assert extract_publication_date(page) == ("2012-12-12", "meta_tags", 80)

    def test_none_when_nothing(self):
        assert extract_publication_date(b"<html><p>no dates here</p></html>") is None

    def test_parse_date_string_formats(self):
        assert parse_date_string("2021-07-09T01:02:03Z") == datetime(2021, 7, 9, 1, 2, 3)
        assert parse_date_string("2021-07-09T01:02:03.123+02:00") == datetime(
            2021, 7, 9, 1, 2, 3
        )
        assert parse_date_string("2021-07-09") == datetime(2021, 7, 9)
        assert parse_date_string("7/9/2021") == datetime(2021, 7, 9)  # US order
        assert parse_date_string("July 9, 2021") == datetime(2021, 7, 9)
        assert parse_date_string("9 Jul 2021") == datetime(2021, 7, 9)
        assert parse_date_string("not a date") is None


class TestAuthorCascade:
    def test_json_ld_beats_meta(self):
        page = (
            b'<html><meta name="author" content="Meta Person">'
            b'<script type="application/ld+json">'
            b'{"@type":"Article","author":{"name":"Lead Person"}}</script></html>'
        )
        authors = extract_authors(page)
        assert authors[0] == ("Lead Person", 90, "json_ld_schema")
        assert ("Meta Person", 70, "meta_tag") in authors

    def test_author_list_and_string_forms(self):
        page = (
            b'<html><script type="application/ld+json">'
            b'{"@type":"Article","author":["First Person",'
            b'{"name":"Second Person"}]}</script></html>'
        )
        names = [a[0] for a in extract_authors(page)]
        assert names == ["First Person", "Second Person"]

    def test_css_class_and_rel(self):
        page = (
            b'<html><body><div class="author-name">Casey Classname</div>'
            b'<a rel="author" href="/x">Riley Rel</a></body></html>'
        )
        authors = extract_authors(page)
        assert ("Casey Classname", 60, "css_selector") in authors
        assert ("Riley Rel", 60, "css_selector") in authors

    def test_byline_prefix_stripped(self):
        page = b'<html><div class="byline">By Dana Writerly</div></html>'
        assert extract_authors(page)[0][0] == "Dana Writerly"

    def test_dedup_keeps_highest_confidence(self):
        page = (
            b'<html><meta name="author" content="Same Person">'
            b'<script type="application/ld+json">'
            b'{"@type":"Article","author":"Same Person"}</script></html>'
        )
        authors = extract_authors(page)
        assert authors == [("Same Person", 90, "json_ld_schema")]

    def test_name_validation(self):
        assert not is_valid_author_name("12345")
        assert not is_valid_author_name("someone@example.com")
        assert not is_valid_author_name("https://example.com")
        assert not is_valid_author_name("admin")
        assert not is_valid_author_name("x")
        assert is_valid_author_name("Dana Writerly")

    def test_full_page_ranking(self):
        authors = extract_authors(FULL_PAGE)
        assert authors[0] == ("John Smith", 90, "json_ld_schema")
        names = [a[0] for a in authors]
        assert "Dana Writerly" in names and "Rel Author" in names
        assert "Commented Out" not in names  # comment noise


class TestRowAndOperator:
    def test_page_metadata_row(self):
        row = page_metadata_row("https://ex.com/2019/11/03/p", FULL_PAGE)
        assert row["title"] == "OG Title"
        assert row["published_date"] == "2021-07-09"
        assert row["date_confidence_pct"] == 95
        assert row["author"] == "John Smith"
        assert row["n_authors"] == 3
        assert row["canonical_url"] == "https://ex.com/canonical/path"

    def test_empty_page(self):
        row = page_metadata_row("", b"<html></html>")
        assert row["title"] is None
        assert row["published_date"] is None
        assert row["n_authors"] == 0

    def test_spark_operator(self, spark):
        from quarrycore_spark.plans.metaextract import page_url, render_page_html

        rows = [(page_url(i), render_page_html(i)) for i in range(24)]
        pages = spark.createDataFrame(rows, "url string, html binary")
        out = {r["url"]: r.asDict() for r in with_page_metadata(pages).collect()}
        assert len(out) == 24
        r7 = out[page_url(7)]  # OG yes, twitter yes, json-ld yes
        assert r7["title"] == "OG Title 7"
        assert r7["og_type"] == "article"
        assert r7["schema_author"] == "Alex Name7"
        assert r7["published_date"] == "2007-08-08"
        assert r7["date_method"] == "structured_data"
        r0 = out[page_url(0)]  # no OG (0%3==0), no json-ld, meta date, authors
        assert r0["title"] is None
        assert r0["date_method"] == "meta_tags"
        assert r0["author"] == "Meta Person 0"
        assert r0["n_authors"] == 2  # meta + css (0%8==0)
        r5 = out[page_url(5)]  # no json-ld (5%5), no meta date (5%6>=2),
        assert r5["date_method"] == "url_pattern"  # no time (5%7!=0)
        assert r5["published_date"] == "2021-06-06"
