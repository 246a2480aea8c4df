"""Markup-cleaning edge cases (operators/text.py::strip_markup).

The differential cert (text_clean, standalone oracle) proves recovery
over the fixture; these pin the hand-picked hazards: double-encoded
entities, word fusion across tags, and degenerate documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.text import strip_markup


def _clean(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "t string")
    return df.select(strip_markup(F.col("t")).alias("c")).first()["c"]


def test_tags_never_fuse_adjacent_words(spark):
    assert _clean(spark, "alpha<br/>beta") == "alpha beta"
    assert _clean(spark, "<ul><li>one</li><li>two</li></ul>") == "one two"


def test_double_encoded_amp_decodes_once(spark):
    """&amp;lt; is the TEXT '&lt;', not a '<' — decoding &amp; last
    guarantees single-level decoding."""
    assert _clean(spark, "x &amp;lt; y") == "x &lt; y"
    assert _clean(spark, "a &amp;amp; b") == "a &amp; b"


def test_entities_decode(spark):
    # &lt; -> <, &quot; -> ", &nbsp; -> space, &amp; -> & (last)
    assert _clean(spark, "1&lt;2") == "1<2"
    assert _clean(spark, "a&nbsp;b") == "a b"
    assert _clean(spark, "&quot;q&quot;") == '"q"'


def test_whitespace_collapses_and_trims(spark):
    assert _clean(spark, "  a\t\n  b  ") == "a b"
    assert _clean(spark, "<p>   </p>") == ""
    assert _clean(spark, "") == ""


def test_decoded_angle_brackets_are_not_restripped(spark):
    """Entity-encoded markup is CONTENT; decoding happens after tag
    stripping precisely so it cannot be re-interpreted as a tag."""
    assert _clean(spark, "&lt;script&gt;x&lt;/script&gt;") == "<script>x</script>"
