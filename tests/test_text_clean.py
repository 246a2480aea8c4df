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


def test_strip_markup_cross_engine_random(spark):
    """Seeded random markup-ish strings: Spark's strip_markup must equal
    a DuckDB evaluation of the same pipeline (the regex/replace dialect
    parity the oracle relies on, probed beyond the fixture corpus)."""
    import random

    import duckdb

    from data_ingestion_backend_spark.operators.text import (
        HTML_ENTITIES,
        TAG_REGEX,
    )

    rng = random.Random(20240814)
    atoms = [
        "word", "x", "1", "<b>", "</b>", "<div class='c'>", "<br/>",
        "&amp;", "&lt;", "&gt;", "&quot;", "&nbsp;", "&amp;lt;",
        " ", "  ", "\t", "\n", "<", ">", "&", "'", '"', "<not closed",
        "un>opened", "<>",
    ]
    cases = [
        "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, t string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", strip_markup(F.col("t")).alias("c")).collect()
    }

    expr = f"regexp_replace(t, '{TAG_REGEX}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{lit}')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(cases)))
    want = dict(con.execute(f"SELECT i, {expr} FROM c").fetchall())
    assert got == want
