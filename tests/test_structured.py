"""P18 golden fixtures: tables / code blocks / images / links extraction
(reference ExtractedContent lists, protocols.py:212-220)."""

from __future__ import annotations

from quarrycore_spark.extraction.structured import (
    extract_code_blocks,
    extract_images,
    extract_links,
    extract_tables,
)

_PAGE = b"""<html><head><title>t</title><script>var x="<a href='no'>";</script>
</head><body>
<a href="https://a.example/one">First &amp; main</a>
<a class="x" href='/rel'>rel link</a>
<a name="anchor-only">no href</a>
<img src="/img/pic.png" alt="A &quot;pic&quot;">
<img alt="no src here">
<img src='plain.jpg'>
<pre><code>def f():
    return 1</code></pre>
<code>inline_code()</code>
<table><tr><th>h1</th><th>h2</th></tr>
<tr><td>a</td><td><table><tr><td>nested</td></tr></table></td></tr></table>
</body></html>"""


def test_links():
    assert extract_links(_PAGE) == [
        {"href": "https://a.example/one", "text": "First & main"},
        {"href": "/rel", "text": "rel link"},
    ]


def test_images():
    assert extract_images(_PAGE) == [
        {"src": "/img/pic.png", "alt": 'A "pic"'},
        {"src": "plain.jpg", "alt": ""},
    ]


def test_code_blocks():
    # pre>code counts once; standalone <code> kept
    assert extract_code_blocks(_PAGE) == ["def f(): return 1", "inline_code()"]


def test_tables():
    tables = extract_tables(_PAGE)
    # nested table is flattened into the outer cell, not emitted separately
    assert len(tables) == 1
    outer = tables[0]
    assert outer[0] == ["h1", "h2"]
    assert outer[1][0] == "a"
    assert "nested" in outer[1][1]


def test_empty_and_junk():
    assert extract_links(b"") == []
    assert extract_tables(b"<table><tr></tr></table>") == []
    assert extract_code_blocks(b"<p>no code</p>") == []


def test_spark_structured_columns(spark):
    from quarrycore_spark.extraction.structured import with_structured_content

    df = spark.createDataFrame(
        [("u1", _PAGE), ("u2", b"<p>plain</p>")], "url string, html binary"
    )
    rows = {r["url"]: r for r in with_structured_content(df).collect()}
    assert rows["u1"]["links"][0]["href"] == "https://a.example/one"
    assert rows["u1"]["images"][0]["src"] == "/img/pic.png"
    assert rows["u1"]["code_blocks"] == ["def f(): return 1", "inline_code()"]
    assert rows["u1"]["tables"][0][0] == ["h1", "h2"]
    assert rows["u2"]["links"] == []
