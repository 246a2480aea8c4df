"""Text-analysis operators for LLM-data pipelines (SURVEY §2.10).

Everything here is pure Catalyst (split/array/hash built-ins — zero Python
UDFs), so the hot path stays in whole-stage codegen and scales linearly
with executors.  Each operator ships a dual-dialect DuckDB oracle.

Operators:
- token/char statistics (length, token count, distinct-token ratio)
- document fingerprinting (md5 over sorted token multiset — the classic
  "fingerprint clustering" canonical form)
- language identification (stopword voting against a built-in lexicon —
  an n-gram-free heuristic that is exactly expressible in both dialects)
- quality scoring (composite of emptiness / length / vocabulary-diversity
  / token-shape heuristics, the usual pre-training filter features)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.plans.localtable import local_df
from data_ingestion_backend_spark.operators.queries import _register
from data_ingestion_backend_spark.sources.fixtures import load_table

# tiny built-in stopword lexicon (public common words); deterministic and
# shared verbatim by the Spark plan and the DuckDB oracle text.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "pt": ("o", "a", "de", "que", "e", "em", "um"),
    "fr": ("le", "la", "de", "et", "un", "est", "les"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
}


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def quality_expr() -> F.Column:
    """The composite quality score over a ``text`` column — the SHARED
    expression builder for ``text_doc_stats`` (fixture cert) and the
    incremental corpus build's per-batch signal pass, so the two can
    never drift.  Four 0.25-weight components: non-blank; ≥5 tokens;
    diversity ≥0.3; mean token length in [2,12]."""
    t = _tokens()
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    tok_chars = F.length(F.regexp_replace(F.col("text"), " ", ""))
    return (
        F.when(F.length(F.trim(F.col("text"))) > 0, 0.25).otherwise(0.0)
        + F.when(n >= 5, 0.25).otherwise(0.0)
        + F.when(nd >= 0.3 * n, 0.25).otherwise(0.0)
        + F.when((tok_chars >= 2 * n) & (tok_chars <= 12 * n), 0.25).otherwise(0.0)
    )


# --------------------------------------------------------------------------
# PII detection / redaction (pre-training hygiene)
# --------------------------------------------------------------------------
# Patterns are deliberately restricted to syntax Java regex (Spark) and RE2
# (DuckDB) evaluate identically: character classes, bounded repetition, no
# lookaround/backreferences.  Order matters for redaction: URLs first (they
# embed dots and digits the narrower patterns could partially claim).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^ ]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
)


# GPT-2-style pre-tokenizer silhouette: contraction suffixes, space-glued
# letter runs, digit runs, punctuation runs.  ASCII classes only so Java
# regex (Spark) and RE2 (DuckDB) count identically (cross-engine probed);
# a real BPE vocab merges WITHIN these pieces, so this count upper-bounds
# and closely tracks true BPE token counts — the budget estimator used
# before committing a corpus to tokenization.
BPE_SPLIT_REGEX = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+|'"


def bpe_token_count(col: F.Column) -> F.Column:
    """Approximate BPE token count via the pre-tokenizer split (F2/§2.10
    token counting, the regex half; whitespace counting is `n_tokens`)."""
    return F.regexp_count(col, F.lit(BPE_SPLIT_REGEX)).cast("bigint")


def pii_counts(col: F.Column) -> dict[str, F.Column]:
    """Per-kind PII match counts (map-side projection, zero shuffle)."""
    return {
        f"n_pii_{kind}": F.regexp_count(col, F.lit(pat)).cast("bigint")
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(col: F.Column) -> F.Column:
    """Replace every PII match with its typed placeholder.

    The standard corpus-hygiene transform before pre-training: emails,
    phone numbers, bare IPs and URLs become ``<EMAIL>``/``<PHONE>``/
    ``<IP>``/``<URL>``.  Chained global ``regexp_replace`` — stays inside
    whole-stage codegen, no shuffle, composable with any downstream op.
    """
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def _pii_planted_spark() -> F.Column:
    """Fixture text carries no PII, so the cert PLANTS a deterministic
    specimen of each kind, derived from doc_id (the same technique the
    dedup fixtures use with planted near-dups): detection counts and the
    redacted-text hash then certify non-trivially against the oracle."""
    d = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), d, F.lit("@example.com"),
        F.lit(" tel 555-867-5309 ip 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" site https://ex.org/d/"), d,
    )


def _pii_planted_sql() -> str:
    return (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
        " || ' tel 555-867-5309 ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || ' site https://ex.org/d/' || CAST(doc_id AS VARCHAR)"
    )


def _pii_sql_cols() -> str:
    counts = ",\n              ".join(
        f"CAST(len(regexp_extract_all({_pii_planted_sql()}, '{pat}')) AS BIGINT)"
        f" AS n_pii_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    redacted = _pii_planted_sql()
    for _, pat, repl in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    return f"{counts},\n              md5({redacted}) AS redacted_hash"


@_register(
    "text_doc_stats",
    f"""SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              CAST(len(regexp_extract_all(text,
                '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 '']+|'''))
                AS BIGINT) AS n_tokens_bpe,
              CAST(length(text) AS BIGINT) AS n_chars_measured,
              CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
              round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' ')), 6) AS distinct_ratio,
              md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
                AS fingerprint,
              round(CAST(
                (CASE WHEN length(trim(text)) > 0 THEN 0.25 ELSE 0.0 END)
              + (CASE WHEN len(string_split(text, ' ')) >= 5 THEN 0.25 ELSE 0.0 END)
              + (CASE WHEN len(list_distinct(string_split(text, ' ')))
                        >= 0.3 * len(string_split(text, ' ')) THEN 0.25 ELSE 0.0 END)
              + (CASE WHEN length(replace(text, ' ', ''))
                        BETWEEN 2 * len(string_split(text, ' '))
                        AND 12 * len(string_split(text, ' ')) THEN 0.25 ELSE 0.0 END)
              AS DOUBLE), 2) AS quality,
              {_pii_sql_cols()}
       FROM documents ORDER BY doc_id""",
)
def text_doc_stats(
    spark: SparkSession, sf_dir: str, fan_scan: bool | None = None
) -> DataFrame:
    """Per-document text statistics, one pass: token counts +
    vocabulary-diversity ratio, the canonical-form fingerprint (md5 of the
    sorted token list — word-order-insensitive, the standard cheap
    near-dup key one step above exact hashing), and the composite quality
    score (four 0.25-weight components: non-blank; ≥5 tokens; diversity
    ≥0.3; mean token length in [2,12] — all integer/branch logic, exactly
    reproducible across engines).

    Consolidated from the former text_token_stats / text_fingerprint /
    text_quality triple: identical per-row projections over one scan, so
    one cert drives all three operators (and one scan replaces three).
    Also certifies PII detection (`pii_counts`) and redaction
    (`redact_pii`) — over a deterministically PII-planted twin of the
    text, since the fixtures ship no PII (see `_pii_planted_spark`); the
    md5 of the fully redacted string pins the redaction byte-for-byte
    across engines.
    """
    t = _tokens()
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    quality = quality_expr()
    planted = _pii_planted_spark()
    # fan_scan default None->True for the registry entry (measured 2x:
    # the regex battery dominates the single-split scan); composed
    # consumers (curate, datasheet) pass False - their downstream stages
    # regressed with a fanned stats arm (tools/fanab.py).
    return (
        load_table(spark, sf_dir, "documents", fan_scan=True if fan_scan is None else fan_scan)
        .select(
            "doc_id",
            n.cast("bigint").alias("n_tokens"),
            bpe_token_count(F.col("text")).alias("n_tokens_bpe"),
            F.length("text").cast("bigint").alias("n_chars_measured"),
            nd.cast("bigint").alias("n_distinct"),
            F.round(nd.cast("double") / n, 6).alias("distinct_ratio"),
            F.md5(F.concat_ws(" ", F.sort_array(t))).alias("fingerprint"),
            F.round(quality, 2).alias("quality"),
            *[c.alias(name) for name, c in pii_counts(planted).items()],
            F.md5(redact_pii(planted)).alias("redacted_hash"),
        )
        .orderBy("doc_id")
    )


def _stopword_values_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in sorted(STOPWORDS.items()) for w in ws
    )
    return f"(VALUES {rows}) sw(lang, word)"


@_register(
    "text_lang_id",
    f"""WITH tok AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
          FROM documents
        ),
        votes AS (
          SELECT t.doc_id, sw.lang, COUNT(*) AS hits
          FROM tok t JOIN {_stopword_values_sql()} ON t.word = sw.word
          GROUP BY t.doc_id, sw.lang
        ),
        best AS (
          SELECT doc_id, lang, hits,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY hits DESC, lang) AS rn
          FROM votes
        )
        SELECT d.doc_id,
               COALESCE(b.lang, 'und') AS lang_pred,
               CAST(COALESCE(b.hits, 0) AS BIGINT) AS stopword_hits
        FROM documents d
        LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
        ORDER BY d.doc_id""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword voting (broadcast lexicon join + argmax).

    Scale shape: explode → broadcast-hash-join against a ~100-row lexicon →
    ONE groupBy(doc_id) with a conditional count per language (map-side
    combined pivot; the language set is a compile-time constant) → flat
    argmax expression (hits desc, lang asc — mirrors the oracle's window
    tiebreak).  No shuffle of the raw text and no window exchange: one
    data shuffle total, vs groupBy(doc,lang) + window + re-join before.
    """
    return lang_pred_frame(load_table(spark, sf_dir, "documents"))


def _lang_votes(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, hits) argmax stopword vote for docs with ≥ 1
    lexicon hit — the aggregation core of :func:`lang_pred_frame`,
    exposed so composed consumers (the curate verdict, the datasheet)
    LEFT-join it onto their own doc frame (missing → 'und'/0 via
    :func:`lang_pred_cols`) instead of paying this frame's internal
    join-back plus a second outer join (r14, composed-pipeline
    constant)."""
    sw = local_df(
        docs.sparkSession,
        [(lang, w) for lang, ws in sorted(STOPWORDS.items()) for w in ws],
        "lang string, word string",
    )
    langs = sorted(STOPWORDS)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    votes = (
        tok.join(F.broadcast(sw), "word")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("lang") == lg, 1).otherwise(0))
                .cast("bigint")
                .alias(f"h_{lg}")
                for lg in langs
            ]
        )
    )
    best_hits = F.greatest(*[F.col(f"h_{lg}") for lg in langs])
    best_lang = F.lit("und")
    for lg in reversed(langs):  # first lang alphabetically wins ties
        best_lang = F.when(F.col(f"h_{lg}") == best_hits, lg).otherwise(best_lang)
    return votes.select(
        "doc_id",
        best_lang.alias("lang"),
        best_hits.alias("hits"),
    )


def lang_pred_cols() -> tuple[F.Column, F.Column]:
    """(lang_pred, stopword_hits) from the nullable `_lang_votes` columns
    after a left join — shared null semantics for every consumer."""
    return (
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang_pred"),
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("stopword_hits"),
    )


def lang_pred_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, stopword_hits) for any (doc_id, text) frame —
    the frame core of ``text_lang_id``, reused by the incremental corpus
    build to language-ID each arriving batch with the identical voting
    arithmetic the fixture cert pins."""
    return (
        docs.select("doc_id")
        .join(_lang_votes(docs), "doc_id", "left")
        .select("doc_id", *lang_pred_cols())
        .orderBy("doc_id")
    )




# --------------------------------------------------------------------------
# Markup cleaning (HTML strip / entity decode / whitespace normalize)
# --------------------------------------------------------------------------
# Web-crawl corpora arrive wrapped in markup; stripping it is the first
# map-only stage of every curation pipeline.  Patterns restricted (like
# the PII set above) to syntax Java regex and RE2 evaluate identically.
# The fixture text carries no HTML, so the cert WRAPS each document in a
# deterministic doc_id-derived specimen (tags, entities, ragged
# whitespace) — the same planting technique as the PII cert — and the
# cleaner must recover EXACTLY the original text (asserted by md5).

TAG_REGEX = r"<[^>]+>"
#: decode order matters only for &amp;, which must go LAST (so the
#: ampersands it produces are never re-interpreted as entity starts).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(col: F.Column) -> F.Column:
    """Markup → plain text: drop tags (replaced by a space so adjacent
    words never fuse), decode the common entities, collapse whitespace
    runs, trim.  Chained codegen string ops — map-only, no shuffle."""
    out = F.regexp_replace(col, TAG_REGEX, " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def _html_wrapped_spark() -> F.Column:
    return F.concat(
        F.lit('<div class="doc-'),
        F.col("doc_id").cast("string"),
        F.lit('">\n  <p>'),
        F.col("text"),
        F.lit("</p>&nbsp;&amp;&lt;b&gt;  <br/>\t</div>"),
    )


_HTML_WRAPPED_SQL = (
    "'<div class=\"doc-' || CAST(doc_id AS VARCHAR) || '\">' || chr(10) ||"
    " '  <p>' || text ||"
    " '</p>&nbsp;&amp;&lt;b&gt;  <br/>' || chr(9) || '</div>'"
)

# What cleaning the wrapper must recover: the document text (whitespace-
# collapsed, since collapsing is part of cleaning) followed by the
# decoded entity tail.  Computed by running the SAME collapse+trim on a
# minimal ' ' || text || ' &<b>' sandwich — equal to the cleaned wrapper
# for every text, including empty/whitespace-only documents (the
# surrounding markup contributes only whitespace, which collapses).


def _text_clean_oracle() -> str:
    cleaned = f"regexp_replace({_HTML_WRAPPED_SQL}, '{TAG_REGEX}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        cleaned = f"replace({cleaned}, '{ent}', '{lit}')"
    cleaned = f"trim(regexp_replace({cleaned}, '\\s+', ' ', 'g'))"
    expected = (
        "trim(regexp_replace(' ' || text || ' &<b>', '\\s+', ' ', 'g'))"
    )
    return f"""
SELECT doc_id,
       md5({cleaned}) AS clean_md5,
       CAST(len(regexp_extract_all({_HTML_WRAPPED_SQL}, '{TAG_REGEX}'))
            AS BIGINT) AS n_tags,
       CAST(length({cleaned}) AS BIGINT) AS len_clean,
       (md5({cleaned}) = md5({expected})) AS recovered
FROM documents ORDER BY doc_id"""


def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified markup cleaning: wrap each fixture doc in the planted
    HTML specimen, strip it, and prove exact recovery — clean_md5 must
    equal md5 of the whitespace-collapsed original text + decoded
    entity tail (``recovered`` is certified TRUE for every row on both
    engines)."""
    docs = load_table(spark, sf_dir, "documents")
    wrapped = _html_wrapped_spark()
    cleaned = strip_markup(wrapped)
    expected = F.trim(
        F.regexp_replace(
            F.concat(F.lit(" "), F.col("text"), F.lit(" &<b>")), r"\s+", " "
        )
    )
    return docs.select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        F.regexp_count(wrapped, F.lit(TAG_REGEX)).cast("bigint").alias("n_tags"),
        F.length(cleaned).cast("bigint").alias("len_clean"),
        (F.md5(cleaned) == F.md5(expected)).alias("recovered"),
    ).orderBy("doc_id")


from data_ingestion_backend_spark.operators.queries import (  # noqa: E402
    _register_standalone,
)

_register_standalone("text_clean", _text_clean_oracle())(text_clean)


# --------------------------------------------------------------------------
# Vocabulary induction: top-N terms with exact cumulative coverage
# --------------------------------------------------------------------------

VOCAB_TOPN = 50

_VOCAB_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
agg AS (
  SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM tok GROUP BY term
),
tot AS (SELECT SUM(tf) AS total FROM agg),
ranked AS (
  SELECT term, tf, df,
         ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rnk,
         SUM(tf) OVER (ORDER BY tf DESC, term
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM agg
)
SELECT rnk, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST((cum * 1000000) // total AS BIGINT) AS coverage_ppm
FROM ranked CROSS JOIN tot
WHERE rnk <= {VOCAB_TOPN}
ORDER BY rnk
"""


@_register_standalone("text_vocab_topn", _VOCAB_SQL)
def text_vocab_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-N terms by frequency with document
    frequency and EXACT cumulative token coverage in ppm — the
    profile read before fixing a tokenizer vocab size ("how many terms
    cover 95% of tokens") and the denominator check for the
    `bpe_token_count` budget estimator.

    Shapes: the one corpus-sized shuffle is the (term)-keyed aggregation
    (map-side combined); everything after runs on the AGGREGATED vocab
    table, which Heaps' law keeps sublinear in corpus size, so the
    unpartitioned ranking window is a small-table sort, not a fact
    funnel.  Coverage is pure integer arithmetic — cum·1e6 DIV total —
    so both engines produce the identical BIGINT (no float terminal at
    all; the long product caps at ~9e12 corpora tokens before overflow,
    far past any single vocab head's need).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    agg = tok.groupBy("term").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    tot = agg.agg(F.sum("tf").alias("total"))
    w = Window.orderBy(F.desc("tf"), F.asc("term"))
    ranked = agg.select(
        "term",
        "tf",
        "df",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("tf")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    ).filter(F.col("rnk") <= VOCAB_TOPN)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "term",
            "tf",
            "df",
            F.expr("CAST((cum * 1000000) div total AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# BPE merge learning (tokenizer training), vocabulary-state iterative
# --------------------------------------------------------------------------
#
# The missing half of the tokenizer surface: `bpe_token_count` BUDGETS
# with a fixed tokenizer; this LEARNS one.  Classic byte-pair-encoding
# training (Sennrich et al., ACL 2016 — public): start from characters,
# repeatedly merge the most frequent adjacent symbol pair, emit the
# merge list.  The scale discipline is the textbook one: the iterated
# state is the (distinct word, count, symbol array) VOCABULARY table —
# one corpus-sized groupBy up front, then every iteration runs on the
# vocab table, which Heaps' law keeps sublinear in corpus size.  Each
# iteration is (a) one bigram-count aggregation over the vocab (pair
# counts weighted by word count), (b) a 1-row argmax to the driver (a
# control-plane scalar — the merge decision IS the output), (c) a
# map-only array fold applying the merge greedy-left-to-right.
# Periodic localCheckpoint truncates the iterative lineage, same as
# connected components.  Determinism: argmax ties break lexicographically
# on (left, right), so re-runs and engines agree exactly.

BPE_MERGES = 10


def _apply_merge(symbols: F.Column, left, right) -> F.Column:
    """Greedy left-to-right merge of adjacent (left, right) inside a
    symbol array — the exact fold reference BPE uses ("aaa" + (a,a) →
    ["aa","a"]): an element joins the previous accumulator tail only
    when the tail equals `left` AND was not itself just produced by
    this merge at that position (the fold's tail check encodes that —
    a freshly-merged tail equals left||right, not left).

    ``left``/``right`` accept Python strings or Columns (the batched
    learner parameterizes the merge by a candidate-table column)."""
    l = left if isinstance(left, F.Column) else F.lit(left)
    r = right if isinstance(right, F.Column) else F.lit(right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l)
            & (s == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _word_vocab(docs: DataFrame) -> DataFrame:
    """(word, n, symbols) state the merge loop iterates on — the corpus
    is touched exactly once; everything after runs on this
    vocabulary-sized table."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("symbols", F.expr("transform(split(word, ''), s -> s)"))
        .localCheckpoint(eager=True)
    )


_PAIRS_EXPR = (
    "CASE WHEN size(symbols) >= 2 THEN "
    "transform(sequence(1, size(symbols) - 1),"
    " i -> struct(element_at(symbols, i) AS l,"
    "             element_at(symbols, i + 1) AS r)) "
    "ELSE array() END"
)


def bpe_learn_merges(
    docs: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[DataFrame, DataFrame]:
    """Learn the top-``n_merges`` BPE merges over ``docs.text``.

    Returns ``(merges, vocab)``: the ordered merge table
    (rank, left, right, merged, pair_count) and the final
    (word, n, symbols) vocabulary state.  Golden-tested against an
    independent pure-Python reference implementation on the fixture
    (`tests/test_text_bpe.py`) plus a determinism re-run — the
    differential-oracle discipline for an operator whose per-iteration
    argmax is not expressible as one SQL query.
    """
    spark = docs.sparkSession
    vocab = _word_vocab(docs)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = vocab.select("n", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        best = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] is None:
            break
        left, right, count = best[0]["p"]["l"], best[0]["p"]["r"], best[0]["c"]
        merges.append((rank, left, right, left + right, int(count)))
        vocab = vocab.select(
            "word", "n", _apply_merge(F.col("symbols"), left, right).alias("symbols")
        )
        if rank % 3 == 0:
            vocab = vocab.localCheckpoint(eager=True)  # truncate lineage
    merges_df = local_df(
        spark, merges, "rank int, left string, right string, merged string, pair_count bigint"
    )
    return merges_df, vocab


BPE_BATCH_K = 16


def _fold_merge_py(syms: list, left: str, right: str) -> list:
    """Pure-Python twin of :func:`_apply_merge`'s greedy left-to-right
    fold (same semantics as ``bpe_encode_arrow``'s inner loop): an
    element joins the accumulator tail only when the tail equals
    ``left`` and was not itself just produced by this merge."""
    out: list = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _sim_max_created_arrow(vocab: "DataFrame", cand_rows: list) -> "DataFrame":
    """(i, m) — for each candidate merge i, the EXACT max count over
    post-merge-i pairs touching its new symbol, in ONE Arrow stage.

    Replaces the r13 Catalyst form (vocab × candidates crossJoin, one
    interpreted `_apply_merge` aggregate fold per row, posexplode,
    two shuffled groupBys — measured as most of text_bpe_encode's
    driver gap: the fold expression tree is re-planned per round and
    interpreted per element).  Faithfulness (guide §4.2 + the
    `bpe_encode_arrow` substring argument): a merge (l, r) can only
    change a word that contains l||r as a SUBSTRING (adjacent symbols
    occupy contiguous character ranges), so unchanged words contribute
    their CURRENT pairs — counted only when the new symbol already
    exists among their symbols, exactly the crossJoin+filter semantics.
    Per-task partial sums are (i, pair)-keyed dicts; the tiny groupBy
    completes the cross-task sum before the per-candidate max
    (differential-pinned against the Catalyst twin in
    tests/test_text_bpe.py)."""
    import pandas as pd

    cand = [(int(i), l, r, l + r) for (i, l, r) in cand_rows]

    def gen(batches):
        acc: dict = {}
        for pdf in batches:
            for word, n, syms in zip(pdf["word"], pdf["n"], pdf["symbols"]):
                syms = list(syms)
                n = int(n)
                symset = None
                for i, l, r, s in cand:
                    if (l + r) in word:
                        ms = _fold_merge_py(syms, l, r)
                        for a, b in zip(ms, ms[1:]):
                            if a == s or b == s:
                                k = (i, a, b)
                                acc[k] = acc.get(k, 0) + n
                    else:
                        if symset is None:
                            symset = set(syms)
                        if s in symset:
                            for a, b in zip(syms, syms[1:]):
                                if a == s or b == s:
                                    k = (i, a, b)
                                    acc[k] = acc.get(k, 0) + n
        if acc:
            keys = list(acc)
            yield pd.DataFrame(
                {
                    "i": [k[0] for k in keys],
                    "l": [k[1] for k in keys],
                    "r": [k[2] for k in keys],
                    "c": [acc[k] for k in keys],
                }
            )

    out = vocab.mapInPandas(gen, "i int, l string, r string, c bigint")
    return (
        out.groupBy("i", "l", "r")
        .agg(F.sum("c").alias("c"))
        .groupBy("i")
        .agg(F.max("c").alias("m"))
    )


def _sim_max_created_catalyst(vocab: "DataFrame", cand: "DataFrame") -> "DataFrame":
    """The r13 Catalyst form of the solo-simulation maxima — kept as the
    differential twin for the Arrow stage (tests/test_text_bpe.py)."""
    return (
        vocab.crossJoin(F.broadcast(cand))
        .select(
            "i", "s", "n",
            _apply_merge(F.col("symbols"), F.col("l"), F.col("r")).alias(
                "symbols"
            ),
        )
        .select("i", "s", "n", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .filter((F.col("p.l") == F.col("s")) | (F.col("p.r") == F.col("s")))
        .groupBy("i", "p")
        .agg(F.sum("n").alias("c"))
        .groupBy("i")
        .agg(F.max("c").alias("m"))
    )


def _apply_merges_arrow(vocab: "DataFrame", accepted: list) -> "DataFrame":
    """Apply an ordered list of (left, right) merges to the vocabulary in
    ONE Arrow stage — bit-equal to chaining `_apply_merge` folds (same
    greedy pass per merge, in order), without the per-merge Catalyst
    expression tree the planner re-analyzes every round."""
    merges = [(l, r) for (l, r) in accepted]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()

            def apply_all(syms):
                syms = list(syms)
                for l, r in merges:
                    syms = _fold_merge_py(syms, l, r)
                return syms

            pdf["symbols"] = pdf["symbols"].map(apply_all)
            yield pdf

    return vocab.mapInPandas(gen, "word string, n bigint, symbols array<string>")


def bpe_learn_merges_batched(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    batch_k: int = BPE_BATCH_K,
    stats: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Learn BPE merges with MULTIPLE merges per driver round-trip,
    PROVABLY equal to the sequential greedy form (`bpe_learn_merges`).

    The sequential learner pays one driver round-trip (one Spark job)
    per merge — fine at 10 merges, ~30k sequential jobs at a production
    tokenizer's merge count.  This variant accepts a BATCH of merges per
    round, chosen so that sequential greedy would provably have picked
    exactly the same merges in the same order (fast-BPE's
    non-interacting-merge idea, with an exact guard instead of a
    heuristic):

    Take the ranked pair list p1 ≥ p2 ≥ … (count desc, then (l, r) asc —
    the sequential tiebreak).  Accept a PREFIX p1..pk where each pj
    (j ≥ 2) satisfies:

    1. **symbol-disjointness**: {lj, rj, lj||rj} is disjoint from every
       earlier accepted {li, ri, li||ri}.  Then applying earlier batch
       merges neither destroys nor creates (lj, rj) adjacencies (a
       destroyed/created adjacency would need a shared symbol), so pj's
       count is still exact when sequential greedy reaches step j; and
    2. **new-pair dominance**: count(pj) > max_{i<j} M_i, where M_i is
       the EXACT maximum count over pairs created by applying merge i
       (pairs touching the new symbol s_i = li||ri), measured by
       simulating merge i alone on the pre-round vocab.  Any pair in
       the combined post-batch state that involves batch symbols maps
       site-by-site onto a solo-simulation pair (a neighbor that later
       merged into s_j was r_j at solo-i time), so its count is ≤ some
       M_i — strictly below count(pj), hence sequential greedy cannot
       prefer it (strict >, so tiebreaks never arbitrate).

    The batch stops at the first candidate violating either condition
    (a SKIPPED candidate interacts with the batch, and its updated
    count could outrank later candidates — prefix-only keeps the proof
    airtight).  Each round costs 2 jobs (ranked top-k + the M_i
    simulation, all candidates in one pass via a broadcast candidate
    table); batch size adapts to the corpus — on redundant natural text
    the top pairs are usually symbol-disjoint with small M_i, so rounds
    absorb several merges (measured in tests/test_text_bpe.py).

    Equality with the sequential form is also verified empirically by
    differential test (fixture + pure-Python reference), and
    ``stats`` (if given) receives {"rounds", "jobs", "merges"} for the
    job-count claim.
    """
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    vocab = _word_vocab(docs)
    merges: list[tuple] = []
    rounds = jobs = 0
    rank_w = Window.orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
    while len(merges) < n_merges:
        # TWO collects per round: the ranked top-k pairs, then the
        # per-candidate solo-simulation maxima (Arrow stage) — merged
        # driver-side.  The global window ranks a vocabulary-sized pair
        # table (tiny relative to the corpus; the corpus was folded into
        # `vocab` once, up front).
        pairs = vocab.select("n", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        # orderBy+limit compiles to TakeOrderedAndProject (distributed
        # partial top-k, no global shuffle); the row_number window then
        # runs over just the k surviving rows
        topk = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
            .limit(batch_k)
            .withColumn("i", F.row_number().over(rank_w))
        )
        # NO word prefilter in the COUNTS: a pair type touching s_i may
        # combine newly created occurrences with PRE-EXISTING ones in
        # words the merge never touches (s_i can already exist as a
        # symbol) — sequential greedy compares against the TOTAL, so M_i
        # must too.  The Arrow stage honors exactly that (unchanged
        # words contribute their current pairs when they carry s_i);
        # r14: one vectorized pass replaces the crossJoin + interpreted
        # fold + two shuffled groupBys (differential twin kept in
        # `_sim_max_created_catalyst`).
        topk_rows = [r for r in topk.collect() if r["c"] is not None]
        rounds += 1
        jobs += 1
        if not topk_rows:
            break
        cand_rows = [(r["i"], r["p"]["l"], r["p"]["r"]) for r in topk_rows]
        sim = {
            r["i"]: int(r["m"])
            for r in _sim_max_created_arrow(vocab, cand_rows).collect()
        }
        top = [
            (r["i"], r["p"]["l"], r["p"]["r"], int(r["c"]))
            for r in sorted(topk_rows, key=lambda r: r["i"])
        ]

        accepted: list[tuple[str, str, int, int]] = []  # (l, r, c, M)
        touched: set[str] = set()
        for i, l, rr, c in top:
            if len(merges) + len(accepted) >= n_merges:
                break
            m_i = sim.get(i, 0)
            syms = {l, rr, l + rr}
            if accepted and (
                (syms & touched) or c <= max(a[3] for a in accepted)
            ):
                break
            accepted.append((l, rr, c, m_i))
            touched |= syms

        for l, rr, c, _m in accepted:
            merges.append((len(merges) + 1, l, rr, l + rr, c))
        # one Arrow stage applies the whole accepted batch in rank order
        # (bit-equal to the chained Catalyst folds — `_fold_merge_py` is
        # `_apply_merge`'s pinned twin); lazy checkpoint materializes
        # inside the NEXT round's job, still truncating lineage
        vocab = _apply_merges_arrow(
            vocab, [(l, rr) for l, rr, _c, _m in accepted]
        ).localCheckpoint(eager=False)
        if len(accepted) == 0:  # defensive: cannot happen (top non-empty)
            break
    if stats is not None:
        stats.update({"rounds": rounds, "jobs": jobs, "merges": len(merges)})
    merges_df = local_df(
        spark, merges, "rank int, left string, right string, merged string, pair_count bigint"
    )
    return merges_df, vocab


@_register_standalone("text_bpe_merges", None)  # rows-only by design:
# the per-iteration argmax is a driver-coordinated loop, not one SQL
# query; the cert is the pure-Python reference differential + the
# determinism re-run in tests/test_text_bpe.py
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BPE_MERGES} learned BPE merges over the documents fixture.

    r13 measured negative result: switching this entry to the batched
    learner read 4.9–6.7 s vs 2.1 s sequential on the same boot — at
    BPE_MERGES=10 the batch's M_i solo-simulation pass (vocab × top-k
    candidates) costs more than the 10 cheap argmax jobs it replaces.
    The batched form's win is the JOB COUNT at production merge counts
    (30k), which `text_bpe_encode` (its caller) and the 1000-merge
    job-count test continue to exercise; this entry stays sequential."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    merges, _ = bpe_learn_merges(docs)
    return merges.orderBy("rank")


# --- BPE corpus encoding (apply learned merges) -----------------------------
#
# Completes the tokenizer story: learning produced the ranked merge
# table; encoding applies it to every document.  The scale trick is the
# same one learning used — encode the WORD VOCABULARY, not the corpus:
# all merge folds run on the deduplicated (word → symbols) table, and a
# single hash join maps each corpus word occurrence to its token array.
# Encoding cost is O(|vocab| · merges); the corpus is touched twice
# (explode to positions, join back), never per-merge.


def bpe_encode(docs: DataFrame, merges_df: DataFrame) -> DataFrame:
    """Encode ``docs.text`` with an ordered merge table → (doc_id,
    n_tokens, tokens).  ``docs`` must have (doc_id, text); ``merges_df``
    is the (rank, left, right, ...) output of either learner.

    The merge list is a control-plane scalar table (the MODEL — ≤ vocab
    size by construction, 30k rows for a production tokenizer) and is
    collected driver-side to parameterize the vocabulary folds.
    """
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    words = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .filter(F.length("word") > 0)
    )
    vocab = (
        words.select("word")
        .distinct()
        .withColumn("symbols", F.expr("transform(split(word, ''), s -> s)"))
    )
    for i, (left, right) in enumerate(merges, start=1):
        vocab = vocab.select(
            "word", _apply_merge(F.col("symbols"), left, right).alias("symbols")
        )
        if i % 3 == 0:
            vocab = vocab.localCheckpoint(eager=True)  # truncate lineage
    return _assemble_tokens(words, vocab)


def _assemble_tokens(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Join the encoded (word, symbols) vocabulary back onto the corpus
    word occurrences and reassemble per-doc token arrays in position
    order — the shared tail of both encode forms."""
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "symbols"))
                ).getField("symbols")
            ).alias("tokens")
        )
        .select(
            "doc_id",
            F.size("tokens").cast("bigint").alias("n_tokens"),
            "tokens",
        )
        .orderBy("doc_id")
    )


def bpe_encode_arrow(docs: DataFrame, merges_df: DataFrame) -> DataFrame:
    """Production-scale BPE encode: same output as :func:`bpe_encode`,
    O(1) Spark jobs at ANY merge count.

    The fold form applies each merge as one Catalyst pass over the
    vocabulary — ~10k sequential vocabulary-sized jobs for a production
    30k-merge tokenizer.  Here every distinct word is greedy-encoded in
    ONE Arrow stage against a broadcast merge-rank table (the repo's
    sanctioned vectorized-pandas escape hatch, same rule as the GEMM
    stages).

    Bit-equality with the fold form is by construction, not heuristic:

    - two adjacent symbols always occupy contiguous character ranges,
      so a merge (l, r) can only ever fire inside a word that contains
      l||r as a SUBSTRING — enumerating the word's O(L²) substrings
      against a merged-string dict finds every merge that could apply;
    - the applicable ranks are then applied in rank order with the
      exact left-to-right non-overlapping pass `_apply_merge` encodes
      (tests pin fold ≡ arrow ≡ pure-Python on the fixture).

    Per-word cost is O(L² + applicable_merges · L) dict work —
    independent of the total merge count, so a 30k-merge tokenizer
    costs the same number of jobs as a 10-merge one (asserted by the
    1000-merge job-count test).
    """
    import pandas as pd

    merges = [
        (int(r["rank"]), r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    by_merged: dict[str, list[tuple[int, str, str]]] = {}
    for rank, left, right in merges:
        by_merged.setdefault(left + right, []).append((rank, left, right))
    # Longest merged symbol bounds the useful substring length: a window
    # longer than every dict key can never hit, so capping the inner loop
    # keeps one pathological unbroken token (URL / base64 blob) linear in
    # its length instead of quadratic, with identical output.
    max_merged_len = max((len(m) for m in by_merged), default=2)
    bc = docs.sparkSession.sparkContext.broadcast((by_merged, max_merged_len))

    def encode_batches(batches):
        table, cap = bc.value

        def encode_word(word: str) -> list[str]:
            L = len(word)
            cand: list[tuple[int, str, str]] = []
            seen: set[int] = set()
            for i in range(L - 1):
                for j in range(i + 2, min(L, i + cap) + 1):
                    hits = table.get(word[i:j])
                    if hits:
                        for entry in hits:
                            if entry[0] not in seen:
                                seen.add(entry[0])
                                cand.append(entry)
            cand.sort()
            syms = list(word)
            for _rank, left, right in cand:
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == left and s == right:
                        out[-1] = left + right
                    else:
                        out.append(s)
                syms = out
            return syms

        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "symbols": pdf["word"].map(encode_word),
                }
            )

    words = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .filter(F.length("word") > 0)
    )
    vocab = (
        words.select("word")
        .distinct()
        .mapInPandas(encode_batches, "word string, symbols array<string>")
    )
    return _assemble_tokens(words, vocab)


@_register_standalone("text_bpe_encode", None)  # rows-only by design:
# encoding applies the LEARNED merge table, whose training loop is not
# one SQL query; the cert is the pure-Python end-to-end differential in
# tests/test_text_bpe.py (learn + encode vs reference tokenizer)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded with the fixture-learned BPE merges (the
    production Arrow encode path; the fold form stays as its
    differential twin)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges, _ = bpe_learn_merges_batched(docs.select("text"))
    return bpe_encode_arrow(docs, merges)


# --- Bigram language-model surprisal (CCNet-style quality signal) ------------
#
# The standard pre-training quality filter scores each document by how
# "surprising" a corpus-level language model finds it (CCNet, Wenzek et
# al. LREC 2020, filters by KenLM perplexity).  This is the distributed,
# integer-exact form: a bigram model with add-one smoothing is trained on
# the corpus itself in one pass, and each document's mean per-bigram
# surprisal is reported in whole-bit quantization.
#
# Integer-exactness discipline: the per-bigram probability is the exact
# rational (c12+1)/(c1+V).  Its surprisal is quantized to WHOLE BITS as
# length(bin((c1+V) div (c12+1))) — floor(log2(den/num))+1, computed in
# pure BIGINT arithmetic that both engines evaluate identically (bin()
# and integer division probed cross-engine).  No ln()/log() float call
# anywhere, so the cert carries no last-ulp libm risk; a production
# deployment wanting fractional bits swaps the terminal for double
# log2() on the same counts (the counts themselves stay exact).

#: documents shorter than a bigram carry no signal and are excluded on
#: both engines.
_LM_MIN_TOKENS = 2


def bigram_grams_frame(docs: DataFrame) -> DataFrame:
    """Per-doc distinct-bigram table (doc_id, w1, w2, k) — the one
    corpus-sized pass; everything the LM needs derives from this."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _LM_MIN_TOKENS
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    return pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("k")
    )


def bigram_surprisal(docs: DataFrame, grams: DataFrame | None = None) -> DataFrame:
    """Per-document mean bigram surprisal under a corpus-trained add-one
    bigram LM → (doc_id, n_bigrams, sum_bits, surprisal_millibits).

    Plan shape (all codegen, zero Python):
      1. explode bigram positions → groupBy(doc_id, w1, w2) with COUNT —
         one shuffle with map-side combine; downstream stages see the
         per-doc DISTINCT bigram table (multiplicity k rides along), not
         raw positions.  FOUR plan arms consume that table (main, c12,
         c1, V) and Spark re-executes common subplans per consumer, so
         the registered wrapper persists it via the session memo — pass
         ``grams`` to reuse a cached build (plan pin:
         tests/test_plans.py asserts one parquet scan).
      2. model tables by aggregation, not window: c12 = groupBy(w1,w2),
         c1 = groupBy(w1).  Hot bigrams ("of the") make window partitions
         unbounded at 100 TB — partial aggregation bounds them map-side,
         and the join back is AQE-skew-splittable where a window is not.
      3. V (distinct left contexts) stays in-plan as a broadcast 1-row
         aggregate (no driver round-trip).
      4. join keys stay the word STRINGS: unlike the fuzzy join's hashed
         ids (collision merely creates a candidate that verification
         rejects), a fingerprint collision here would silently merge two
         bigrams' counts — exactness requires the real key.  Bigrams are
         two words; the shuffled k-compressed table is vocabulary-shaped,
         not corpus-shaped.
    """
    if grams is None:
        grams = bigram_grams_frame(docs)
    # r14 (guide §2.3/§2.4): the model tables derive from c12, not from
    # grams — c1 = Σ c12 per w1 and V = distinct w1 of c12 are the same
    # integers (c12 already sums every gram occurrence), but the
    # aggregations now run over the vocabulary-sized bigram table
    # instead of re-scanning the doc×bigram table twice.  `bits` is
    # likewise computed ONCE per bigram type on the model table (it
    # depends only on c1/c12/V), and grams joins the finished model a
    # single time on (w1, w2) — the r13 form shuffled the corpus-sized
    # grams twice (once per model join).  Plan check: the grams exchange
    # on (w1, w2) is byte-identical for the c12 aggregation and the
    # scored join, so ReuseExchange collapses them.
    c12 = grams.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vdf = c12.agg(F.count_distinct("w1").cast("bigint").alias("V"))
    model = (
        c12.join(c1, ["w1"])
        .crossJoin(F.broadcast(vdf))
        .withColumn(
            "bits",
            F.length(F.bin(F.expr("(c1 + V) div (c12 + 1)"))).cast("bigint"),
        )
        .select("w1", "w2", "bits")
    )
    scored = grams.join(model, ["w1", "w2"])
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("bits")).cast("bigint").alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_bits",
            F.expr("(1000 * sum_bits) div n_bigrams").alias("surprisal_millibits"),
        )
        .orderBy("doc_id")
    )


# the oracle mirrors every stage; bigram key = 'w1 w2' (words cannot
# contain the separator — they came from splitting on it).
_LM_SQL = f"""WITH grams0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS g
  FROM documents
  WHERE len(string_split(text, ' ')) >= {_LM_MIN_TOKENS}
),
grams AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS k FROM grams0 GROUP BY doc_id, g
),
c12 AS (SELECT g, SUM(k) AS c12 FROM grams GROUP BY g),
c1 AS (SELECT string_split(g, ' ')[1] AS w1, SUM(k) AS c1 FROM grams GROUP BY 1),
v AS (SELECT CAST(COUNT(DISTINCT string_split(g, ' ')[1]) AS BIGINT) AS V FROM grams),
scored AS (
  SELECT gr.doc_id, gr.k,
         CAST(length(bin((c1.c1 + v.V) // (c12.c12 + 1))) AS BIGINT) AS bits
  FROM grams gr
  JOIN c12 ON c12.g = gr.g
  JOIN c1 ON c1.w1 = string_split(gr.g, ' ')[1]
  CROSS JOIN v
)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_bigrams,
       CAST(SUM(k * bits) AS BIGINT) AS sum_bits,
       (1000 * CAST(SUM(k * bits) AS BIGINT)) // CAST(SUM(k) AS BIGINT)
         AS surprisal_millibits
FROM scored GROUP BY doc_id ORDER BY doc_id"""


@_register_standalone("text_lm_surprisal", _LM_SQL)
def text_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM surprisal per document (quality signal)."""
    from data_ingestion_backend_spark.operators.dedup import _session_persisted

    # fan_scan measured 1.15x on the drift-controlled interleaved A/B
    # (the 0.78x seen under contention did not hold): native split kept
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = _session_persisted(
        spark, sf_dir, "lm_bigram_grams", lambda: bigram_grams_frame(docs)
    )
    return bigram_surprisal(docs, grams=grams)


# --- Corpus diversity profiling (per-source n-gram type/token ratios) --------
#
# Curation dashboards track whether a source is template spam (few
# distinct n-grams repeated) or genuinely diverse — the distinct/total
# n-gram ratio ("self-repetition" inverse, the corpus-level cousin of
# prep_repetition's per-doc top-bigram fraction).  Integer-exact: ratios
# are reported in ppm via BIGINT division, so the cert has no float
# terminal at all.


def ngram_diversity(docs: DataFrame) -> DataFrame:
    """Per-source diversity profile → (source, n_tokens, distinct_tokens,
    ttr_ppm, n_trigrams, distinct_trigrams, trigram_diversity_ppm).

    Scale shape: ``source`` alone is low-cardinality (a hot groupBy key),
    so BOTH distinct counts run two-phase — groupBy(source, gram) first
    (uniform keys, map-side combine), then the vocabulary-sized re-agg
    per source.  No count_distinct over a skewed key anywhere.
    """
    toks = docs.select("source", F.split("text", " ").alias("t"))

    def profile(exploded: DataFrame, prefix: str) -> DataFrame:
        per_gram = exploded.groupBy("source", "g").agg(
            F.count("*").cast("bigint").alias("k")
        )
        return per_gram.groupBy("source").agg(
            F.sum("k").cast("bigint").alias(f"n_{prefix}"),
            F.count("*").cast("bigint").alias(f"distinct_{prefix}"),
        )

    uni = profile(
        toks.select("source", F.explode("t").alias("g")), "tokens"
    )
    tri = profile(
        toks.filter(F.size("t") >= 3).select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t)-3),"
                    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            ).alias("g"),
        ),
        "trigrams",
    )
    return (
        uni.join(tri, "source")
        .select(
            "source",
            "n_tokens",
            "distinct_tokens",
            F.expr("(1000000 * distinct_tokens) div n_tokens").alias("ttr_ppm"),
            "n_trigrams",
            "distinct_trigrams",
            F.expr("(1000000 * distinct_trigrams) div n_trigrams").alias(
                "trigram_diversity_ppm"
            ),
        )
        .orderBy("source")
    )


_DIVERSITY_SQL = """WITH toks AS (
  SELECT source, string_split(text, ' ') AS t FROM documents
),
uni AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_tokens
  FROM (SELECT source, unnest(t) AS g FROM toks)
  GROUP BY source
),
tri AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_trigrams,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_trigrams
  FROM (SELECT source,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM toks WHERE len(t) >= 3)
  GROUP BY source
)
SELECT uni.source, n_tokens, distinct_tokens,
       (1000000 * distinct_tokens) // n_tokens AS ttr_ppm,
       n_trigrams, distinct_trigrams,
       (1000000 * distinct_trigrams) // n_trigrams AS trigram_diversity_ppm
FROM uni JOIN tri ON tri.source = uni.source
ORDER BY uni.source"""


@_register_standalone("text_ngram_diversity", _DIVERSITY_SQL)
def text_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram diversity profile over the documents fixture."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return ngram_diversity(docs)
