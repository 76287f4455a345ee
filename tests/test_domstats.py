"""DOM-metrics operator: golden fixture + edge cases + Spark round-trip."""

from __future__ import annotations

from quarrycore_spark.extraction.domstats import dom_stats, with_dom_stats

PAGE = b"""<html><head><title>T</title><script>var x=1;</script></head>
<body>
<header><nav><a href="/home">Home</a><a href="https://ex.com/out">Out</a></nav></header>
<main>
  <h1>Main heading</h1>
  <h2>Sub</h2>
  <article>
    <p>First paragraph of body text.</p>
    <img src="/a.png" alt="pic">
    <img src="/b.png">
    <form><input type="text"><button>Go</button></form>
  </article>
</main>
<!-- a comment --><!-- another -->
<footer>fin</footer>
</body></html>"""


def test_counts():
    st = dom_stats(PAGE)
    assert st["n_h1"] == 1 and st["n_headings"] == 2
    # header nav main article footer = 5 semantic opens
    assert st["n_semantic"] == 5
    assert st["n_forms"] == 1 and st["n_inputs"] == 1 and st["n_buttons"] == 1
    assert st["n_imgs"] == 2 and st["n_imgs_with_alt"] == 1
    assert st["n_links"] == 2 and st["n_links_abs"] == 1
    assert st["n_comments"] == 2 and st["n_scripts"] == 1
    assert st["n_distinct_tags"] == 18


def test_depth_and_text():
    st = dom_stats(PAGE)
    # html>body>main>article>form>button is the deepest chain: depth 6
    assert st["max_depth"] == 6
    assert st["html_len"] == len(PAGE.decode())
    # tag-stripped squeezed text, script body counts as text (reference
    # regex-path parity: it only removes tags)
    assert st["vis_text_len"] > 0


def test_void_and_selfclose_do_not_push_depth():
    st = dom_stats(b"<div><br><img src='x'><hr/><span>t</span></div>")
    assert st["max_depth"] == 2  # div > span


def test_unmatched_close_ignored():
    st = dom_stats(b"<div></p><p>x</p></div>")
    assert st["max_depth"] == 2


def test_empty_page():
    st = dom_stats(b"")
    assert st["n_elements"] == 0 and st["max_depth"] == 0
    assert st["vis_text_len"] == 0


def test_spark_operator(spark):
    from quarrycore_spark.plans.domops import render_dom_page

    rows = [(str(i), render_dom_page(i)) for i in range(30)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {int(r["url"]): r.asDict() for r in with_dom_stats(pages).collect()}
    assert len(got) == 30
    for i in (0, 7, 13, 29):
        pure = dom_stats(render_dom_page(i))
        for k, v in pure.items():
            assert got[i][k] == v, (i, k)
