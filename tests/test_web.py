"""Web operators: link extraction and HTML stripping semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.web import extract_links, strip_html


def _one(spark, html, col):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(col.alias("v")).first().v


def test_extract_links_both_quote_styles_in_order(spark):
    html = ('<p>x</p><a class="z" href="https://a.com/1">A</a>'
            "<a href='http://b.org/2'>B</a>"
            '<a href="https://c.net">C</a>')
    got = _one(spark, html, extract_links("html"))
    # double-quoted matches first (document order within each style)
    assert got == ["https://a.com/1", "https://c.net", "http://b.org/2"]


def test_extract_links_ignores_non_anchor_hrefs(spark):
    html = '<link href="style.css"><area href="x"><a href="https://y">y</a>'
    assert _one(spark, html, extract_links("html")) == ["https://y"]


def test_strip_html_visible_text(spark):
    html = ("<html><head><style>p {color:red}</style></head>"
            "<body><h1>T</h1><p>hello   world</p>"
            "<script>var x = 1;</script>"
            "&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b"
            "</body></html>")
    got = _one(spark, html, strip_html("html"))
    assert got == "T hello world & <tag> \"q\" 's' a b"


def test_strip_html_amp_decodes_last(spark):
    # browsers render '&amp;lt;' as the literal text '&lt;'
    assert _one(spark, "<b>&amp;lt;</b>", strip_html("html")) == "&lt;"


def test_strip_html_plain_text_unchanged(spark):
    assert _one(spark, "no markup here", strip_html("html")) \
        == "no markup here"


def test_strip_html_script_body_with_lt_fully_dropped(spark):
    # round-4 ADVICE: '<' inside a script/style body (comparisons in
    # JS, nested selectors in CSS) must not leak as visible text.
    html = ("<p>before</p><script>if (a<b) { f('<span>'); }</script>"
            "<style>a<b {x}</style><p>after</p>")
    assert _one(spark, html, strip_html("html")) == "before after"


def test_strip_html_unclosed_script_drops_to_end(spark):
    html = "<p>keep</p><script>var a = 1; if (a<2) go()"
    assert _one(spark, html, strip_html("html")) == "keep"


def test_strip_html_multiple_script_blocks_nongreedy(spark):
    # lazy quantifier: each block closes at ITS OWN </script>, the
    # visible text between blocks survives.
    html = ("<script>a<b</script><p>mid</p><script>c<d</script>end")
    assert _one(spark, html, strip_html("html")) == "mid end"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


def test_common_prefix_by_group_hand_cases(spark):
    from sync_cosmos_db_spark.operators.web import common_prefix_by_group

    df = spark.createDataFrame(
        [("a", "HEAD one"), ("a", "HEAD two"), ("a", "HEAD three"),
         ("b", "x"), ("b", "y"),
         ("c", "solo full text"),
         ("d", "pfx"), ("d", "pfx longer")],
        "src string, t string")
    out = {r.src: (r.n_docs, r.prefix_len, r.prefix) for r in
           common_prefix_by_group(df, "src", "t").collect()}
    assert out["a"] == (3, 5, "HEAD ")
    assert out["b"] == (2, 0, "")
    assert out["c"] == (1, 14, "solo full text")   # singleton: whole text
    assert out["d"] == (2, 3, "pfx")               # prefix-of-the-other
