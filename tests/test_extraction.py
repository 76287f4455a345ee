"""Golden fixtures for the selector extraction tier — realistic
boilerplate-heavy pages where whole-body stripping is NOT enough and the
declared content region must win (the precision dimension of the
reference's trafilatura tier, cascade_extractor.py:479-499)."""

from __future__ import annotations

from quarrycore_spark.extraction.canonical import (
    cascade_extract,
    extract_main_text,
    extract_selector_text,
)

_BOILERPLATE_PAGE = b"""<html><head><title>Widget Review</title>
<script>analytics.track("pv");</script></head>
<body>
<header><div class="logo">MegaSite</div>
  <nav><a href="/">Home</a><a href="/news">News</a><a href="/shop">Shop</a></nav>
</header>
<div class="ad-banner">BUY NOW!!! limited offer click here</div>
<div class="sidebar"><h3>Trending</h3><ul><li>Ten weird tricks</li>
<li>Celebrity gossip roundup</li></ul></div>
<main>
  <h1>The Widget 3000 reviewed</h1>
  <p>The Widget 3000 improves on its predecessor in every measurable way.</p>
  <aside>Advertisement: widget polish, 50% off</aside>
  <p>Battery life doubled and the housing is now fully recyclable.</p>
</main>
<div class="related"><a href="/w2000">Widget 2000 review</a></div>
<footer>copyright megasite 2024 &middot; terms &middot; privacy</footer>
</body></html>"""


def test_selector_tier_main_only():
    text = extract_selector_text(_BOILERPLATE_PAGE)
    assert text == (
        "The Widget 3000 reviewed The Widget 3000 improves on its "
        "predecessor in every measurable way. Battery life doubled and "
        "the housing is now fully recyclable."
    )
    # the strict (whole-body) tier keeps the boilerplate — selector must win
    assert "BUY NOW" in extract_main_text(_BOILERPLATE_PAGE)
    assert "BUY NOW" not in text and "Trending" not in text
    assert "Advertisement" not in text  # aside inside main is chrome too


def test_selector_tier_article_and_role():
    art = (
        b"<body><nav>menu</nav><article><h2>Post</h2><p>Body text here.</p>"
        b"</article><footer>f</footer></body>"
    )
    assert extract_selector_text(art) == "Post Body text here."
    role = (
        b'<body><div class="wrap"><div role="main"><p>Only this.</p></div>'
        b"<div>elsewhere</div></div></body>"
    )
    assert extract_selector_text(role) == "Only this."


def test_selector_tier_content_class_nested_divs():
    page = (
        b'<body><div class="header">top</div>'
        b'<div id="content"><div class="inner"><p>Deep <b>text</b></p></div>'
        b"</div><div class=\"footer\">bottom</div></body>"
    )
    # the balanced-block walk must pair nested <div>s correctly
    assert extract_selector_text(page) == "Deep text"


def test_selector_tier_absent_falls_through():
    plain = b"<body><nav>chrome</nav><p>no declared region</p></body>"
    assert extract_selector_text(plain) == ""
    text, tier, _q, accepted = cascade_extract(plain, lang="en")
    assert accepted and tier == "strict"
    assert text == "no declared region"


def test_selector_multiple_articles_concatenated():
    page = (
        b"<body><article><p>First.</p></article>"
        b"<div>between</div><article><p>Second.</p></article></body>"
    )
    assert extract_selector_text(page) == "First. Second."


def test_cascade_prefers_selector_above_gate():
    filler = ("real content sentence with many words here. " * 20).encode()
    page = (
        b"<body><div class='ad'>ad ad ad</div><main><p>" + filler +
        b"</p></main></body>"
    )
    text, tier, q, accepted = cascade_extract(page, lang="en", threshold_scaled=60)
    assert accepted and tier == "selector" and q >= 60
    assert "ad ad ad" not in text
