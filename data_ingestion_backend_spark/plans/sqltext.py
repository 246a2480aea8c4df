"""Spark-dialect SQL text for every graded cert whose shared oracle text
is not engine-portable.

The SQL-text surface contract (``plans/catalog.py``): a user typing SQL
gets the same result as the DataFrame builder for every graded query.
Most oracle texts are written in the portable ANSI subset and run on
both engines verbatim; the rest diverge from Spark SQL only in dialect
(DuckDB ``list_*`` functions, ``unnest`` in SELECT position, ``//``,
``VARCHAR``, 1-based ``arr[i]``, ``ASOF JOIN`` sugar, ...).  This module
carries the Spark-dialect twin for each of those — the q27 pattern
(per-dialect text, same output) applied across the registry.

``spark_sql_text(name)`` returns the text to feed ``run_sql``: the
Spark twin when one exists, else the shared oracle text.
``NON_EXPRESSIBLE`` enumerates the graded certs that have no faithful
SQL-text form in Spark's dialect, with the reason — the test surface
(``tests/test_sql_surface.py``) asserts the partition is exhaustive.

Dialect-mapping notes (applied throughout):

- ``len``/``string_split``/``list_distinct``/``list_sort``/
  ``list_transform``/``array_to_string`` → ``size``/``split``/
  ``array_distinct``/``array_sort``/``transform``/``array_join``.
- ``unnest(...)`` in SELECT position → ``LATERAL VIEW explode(...)``
  (Spark's table-generator position).
- DuckDB ``range(a, b)`` (exclusive hi) → ``sequence(a, b - 1)``
  (inclusive hi); ``generate_series`` with INTERVAL → ``sequence``
  (both inclusive).
- 1-based ``arr[i]`` → ``element_at(arr, i)`` (Spark ``[]`` is 0-based).
- ``x // y`` → ``x div y`` (both truncate toward zero on integers).
- ``CAST(x AS VARCHAR)`` → ``CAST(x AS STRING)``.
- ``CAST('0x' || hex AS BIGINT)`` → ``CAST(conv(hex, 16, 10) AS BIGINT)``.
- ``regexp_extract_all(s, re)`` → ``regexp_extract_all(s, re, 0)``
  (Spark's default group is 1, DuckDB's is the full match).
- ``regexp_replace(s, re, r, 'g')`` → ``regexp_replace(s, re, r)``
  (Spark is global by default).
- ``date_diff('day', a, b)`` → ``datediff(b, a)``; ``date_diff('hour',
  a, b)`` → ``timestampdiff(HOUR, a, b)``.
- ``quantile_cont`` → ``percentile`` (both linear-interpolating).
- ``epoch_us(ts) // 1e6`` → ``unix_micros(ts) div 1000000``.
- ``list_cosine_similarity`` → the explicit ``aggregate(zip_with(...))``
  fold (exactly ``operators.dedup.cosine_expr``'s arithmetic, so the
  text plan reproduces the builder's floats bit-for-bit).
- ``ASOF LEFT JOIN`` → ``LEFT JOIN`` on the inequality + ``MAX()``
  group-back (the standard decomposition).
- ``LAST_VALUE(x IGNORE NULLS)`` (DuckDB argument position) →
  ``LAST_VALUE(x) IGNORE NULLS`` (Spark postfix position).
"""

from __future__ import annotations

from data_ingestion_backend_spark.operators.dedup import (
    BAND_ROWS,
    JACCARD_THRESHOLD,
    MINHASH_COEFFS,
    MINHASH_P,
    N_BANDS,
)

#: graded certs with NO faithful Spark SQL text, and why.  These remain
#: builder-certified (DuckDB differential) — the text surface simply has
#: no third form to offer.
NON_EXPRESSIBLE: dict[str, str] = {
    "dedup_clusters": (
        "the closure CTE is recursive-UNION-distinct over a cyclic "
        "symmetric edge list; Spark 4.1 rejects UNION inside WITH "
        "RECURSIVE (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) and UNION ALL "
        "never terminates on cycles — verified by running the dialect-"
        "mapped text this round"
    ),
    "media_metadata": "DuckDB encode()/decode() byte builtins differ in signature and semantics",
    "media_features": "same codec-builtin divergence as media_metadata",
    "prep_corpus_e2e": (
        "the composed-build oracle hoists the recursive minhash/CC "
        "closure CTE to its top level — the same recursive-UNION-"
        "distinct-over-cycles shape Spark 4.1 rejects (see "
        "dedup_clusters); the composition is builder-certified"
    ),
    "prep_corpus_datasheet": (
        "embeds the same recursive CC-closure CTE as prep_corpus_e2e"
    ),
}

# Spark-dialect twin of operators/dedup._SHINGLES_SQL (DuckDB list_*
# builtins → array_*/transform; 1-based [i] → element_at; exclusive
# range → inclusive sequence)
_SHINGLES_SPARK = """
  CASE WHEN size(split(lower(text), ' ')) >= 3
       THEN array_distinct(transform(
              sequence(1, size(split(lower(text), ' ')) - 2),
              i -> concat_ws(' ',
                   element_at(split(lower(text), ' '), i),
                   element_at(split(lower(text), ' '), i + 1),
                   element_at(split(lower(text), ' '), i + 2))))
       ELSE array(lower(text)) END
"""

# the PII suffix text_doc_stats appends to every document (kept identical
# to the oracle's so the regex counts align)
_PII_SUFFIX = (
    "' contact user' || CAST(doc_id AS STRING) || '@example.com' || "
    "' tel 555-867-5309 ip 10.0.0.' || CAST(doc_id % 256 AS STRING) || "
    "' site https://ex.org/d/' || CAST(doc_id AS STRING)"
)

# Spark-dialect twin of operators/dedup._minhash_ctes(): the same CTE
# chain (shingles → 16-min signature → banded keys → candidates → exact
# Jaccard) with the three dialect swaps — unnest → LATERAL VIEW explode,
# CAST('0x'||hex AS BIGINT) → conv(hex, 16, 10), and explicit
# CAST(mN AS STRING) inside the band concat (Spark concat_ws wants
# strings; DuckDB casts implicitly — both print BIGINTs identically).
# Built from the SAME coefficient/band constants the builder uses, so
# the twin can never drift from the DataFrame plan.
_MINHASH_HASH_SPARK = "CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)"


def _minhash_ctes_spark() -> str:
    mins = ",\n            ".join(
        f"min(({a} * {_MINHASH_HASH_SPARK} + {b}) % {MINHASH_P}) AS m{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {c} AS band_idx, md5(concat_ws(',', "
        + ", ".join(
            f"CAST(m{c * BAND_ROWS + r} AS STRING)" for r in range(BAND_ROWS)
        )
        + ")) AS band_key FROM sig"
        for c in range(N_BANDS)
    )
    return f"""
      sh AS (
        SELECT doc_id, s FROM documents
        LATERAL VIEW explode({_SHINGLES_SPARK}) x AS s
      ),
      sig AS (
        SELECT doc_id,
            {mins}
        FROM sh GROUP BY doc_id
      ),
      bands AS (
        {band_selects}
      ),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
      ),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        GROUP BY c.doc_a, c.doc_b
      ),
      pairs AS (
        SELECT i.doc_a, i.doc_b,
               round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {JACCARD_THRESHOLD}
      )"""


_MINHASH_LSH_SPARK = (
    f"WITH {_minhash_ctes_spark()} "
    "SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b"
)

_URL_RE = r"'https?://[^ ]+'"
_EMAIL_RE = r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'"
_PHONE_RE = r"'\\d{3}-\\d{3}-\\d{4}'"
_IPV4_RE = r"'\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}'"

_COS = (
    "round(aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
    " (acc, v) -> acc + v)"
    " / (sqrt(aggregate(transform({a}, x -> x * x), CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + x))"
    " * sqrt(aggregate(transform({b}, x -> x * x), CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + x))), 6)"
)


def _cos(a: str, b: str) -> str:
    return _COS.format(a=a, b=b)


_AD = "CAST({v} AS ARRAY<DOUBLE>)"


SPARK_TEXT: dict[str, str] = {
    "dedup_minhash_lsh": _MINHASH_LSH_SPARK,
    "q13_string_normalize": """
SELECT c_custkey, LOWER(TRIM(c_name)) AS norm_name,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       SUBSTR(c_name, 1, 8) AS prefix,
       MD5(CONCAT(LOWER(TRIM(c_name)), '|', CAST(c_nationkey AS STRING))) AS row_hash
FROM customer ORDER BY c_custkey
""",
    "q31_asof_join": """
WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click')
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
       MAX(c.ts) AS last_click_ts
FROM p LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
GROUP BY p.event_id, p.user_id, p.ts
ORDER BY purchase_id
""",
    "q35_percentiles": """
SELECT event_type,
       round(percentile(value, 0.25), 6) AS p25,
       round(percentile(value, 0.50), 6) AS p50,
       round(percentile(value, 0.75), 6) AS p75,
       round(percentile(value, 0.95), 6) AS p95
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "q36_sliding_range_count": """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch_s
         RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS BIGINT)
         AS n_prev_hour
FROM (SELECT event_id, user_id,
             CAST(unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 AS BIGINT)
               AS epoch_s
      FROM events)
ORDER BY event_id
""",
    "q39_retention": """
WITH e AS (
  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
),
cohort AS (
  SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id
)
SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day,
       CAST(datediff(e.d, c.cohort_day) AS BIGINT) AS day_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM e JOIN cohort c ON c.user_id = e.user_id
GROUP BY c.cohort_day, datediff(e.d, c.cohort_day)
ORDER BY cohort_day, day_offset
""",
    "q40_json_agg": """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "agg_grouping_sets": """
SELECT l_returnflag, l_linestatus, l_linenumber,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(grouping_id(l_returnflag, l_linestatus, l_linenumber) AS INT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())
ORDER BY gid, l_returnflag, l_linestatus, l_linenumber
""",
    "prep_domain_cap": """
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS src_rank,
       CAST(CASE WHEN rk <= 10 THEN 1 ELSE 0 END AS INT) AS kept
FROM r ORDER BY doc_id
""",
    "prep_pack_sequences": """
WITH sized AS (
  SELECT doc_id,
         doc_id % 8 AS shard,
         CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, shard, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
              PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            div 512 AS BIGINT) AS pack_id
FROM sized ORDER BY doc_id
""",
    "prep_split_sample": """
SELECT doc_id, source,
       CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)
         % 100 AS bucket,
       CASE WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)
                 % 100 < 98 THEN 'train'
            WHEN CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)
                 % 100 < 99 THEN 'val'
            ELSE 'test' END AS split,
       CAST(CASE WHEN CAST(conv(substr(md5(source || ':' || CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 1000 < 100
                 THEN 1 ELSE 0 END AS BIGINT) AS sampled
FROM documents ORDER BY doc_id
""",
    "prep_decontaminate": """
WITH grams AS (
  SELECT doc_id,
         CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)
           % 100 AS bucket,
         g
  FROM documents
  LATERAL VIEW explode(
    CASE WHEN size(split(text, ' ')) >= 8
         THEN array_distinct(transform(
                sequence(1, size(split(text, ' ')) - 7),
                i -> array_join(slice(split(text, ' '), i, 8), ' ')))
         ELSE CAST(array() AS ARRAY<STRING>) END) t AS g
),
train AS (SELECT doc_id, g FROM grams WHERE bucket < 98),
test  AS (SELECT doc_id, g FROM grams WHERE bucket >= 99)
SELECT t.doc_id,
       CAST(COUNT(DISTINCT x.doc_id) AS BIGINT) AS n_test_docs_hit
FROM train t JOIN test x ON x.g = t.g
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
    "prep_chunk_docs": """
SELECT doc_id,
       CAST(s / 150 AS INT) AS chunk_idx,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(length(substr(text, CAST(s AS INT) + 1, 200)) AS BIGINT) AS chunk_len,
       md5(substr(text, CAST(s AS INT) + 1, 200)) AS chunk_md5
FROM documents
LATERAL VIEW explode(sequence(0, greatest(length(text), 1) - 1, 150)) t AS s
ORDER BY doc_id, chunk_idx
""",
    "prep_doc_scores": """
WITH bg AS (
  SELECT doc_id, b
  FROM documents
  LATERAL VIEW explode(transform(
    sequence(1, greatest(size(split(text, ' ')), 2) - 1),
    i -> element_at(split(text, ' '), i) || ' ' ||
         element_at(split(text, ' '), i + 1))) t AS b
  WHERE size(split(text, ' ')) >= 2
),
per AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
rep AS (
  SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS n_bigrams
  FROM per GROUP BY doc_id
),
tok AS (
  SELECT DISTINCT doc_id, w
  FROM documents
  LATERAL VIEW explode(split(lower(text), ' ')) t AS w
),
nn AS (SELECT COUNT(*) AS n_docs FROM documents),
dfreq AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w),
idf AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
         round(AVG(ln((nn.n_docs + 1.0) / (f.df + 1.0))), 4) AS mean_idf
  FROM tok t CROSS JOIN nn JOIN dfreq f ON f.w = t.w
  GROUP BY t.doc_id
),
dec AS (
  SELECT doc_id, source,
         round(PERCENT_RANK() OVER w, 6) AS len_pctile,
         CAST(NTILE(10) OVER w AS BIGINT) AS decile,
         CASE WHEN PERCENT_RANK() OVER w BETWEEN 0.05 AND 0.95
              THEN 'keep' ELSE 'clip' END AS length_filter
  FROM documents
  WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
)
SELECT d.doc_id, dec.source,
       CAST(COALESCE(r.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       CAST(COALESCE(r.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(CASE WHEN r.n_bigrams > 0
                  THEN CAST(r.top_bigram_count AS DOUBLE) / r.n_bigrams
                  ELSE 0.0 END, 6) AS top_bigram_frac,
       i.n_distinct_tokens, i.mean_idf,
       dec.len_pctile, dec.decile, dec.length_filter
FROM documents d
LEFT JOIN rep r ON r.doc_id = d.doc_id
JOIN idf i ON i.doc_id = d.doc_id
JOIN dec ON dec.doc_id = d.doc_id
ORDER BY d.doc_id
""",
    "text_lang_id": """
WITH tok AS (
  SELECT doc_id, word
  FROM documents
  LATERAL VIEW explode(split(lower(text), ' ')) t AS word
),
votes AS (
  SELECT t.doc_id, sw.lang, COUNT(*) AS hits
  FROM tok t JOIN (VALUES ('de', 'der'), ('de', 'die'), ('de', 'das'), ('de', 'und'), ('de', 'ist'), ('de', 'ein'), ('de', 'zu'), ('en', 'the'), ('en', 'a'), ('en', 'and'), ('en', 'of'), ('en', 'to'), ('en', 'in'), ('en', 'is'), ('es', 'el'), ('es', 'la'), ('es', 'de'), ('es', 'que'), ('es', 'y'), ('es', 'en'), ('es', 'un'), ('fr', 'le'), ('fr', 'la'), ('fr', 'de'), ('fr', 'et'), ('fr', 'un'), ('fr', 'est'), ('fr', 'les'), ('pt', 'o'), ('pt', 'a'), ('pt', 'de'), ('pt', 'que'), ('pt', 'e'), ('pt', 'em'), ('pt', 'um')) sw(lang, word) ON t.word = sw.word
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
ORDER BY d.doc_id
""",
    "text_doc_stats": f"""
SELECT doc_id,
       CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(size(regexp_extract_all(text,
         '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 '']+|''', 0))
         AS BIGINT) AS n_tokens_bpe,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_distinct,
       round(CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
             / size(split(text, ' ')), 6) AS distinct_ratio,
       md5(array_join(array_sort(split(text, ' ')), ' ')) AS fingerprint,
       round(CAST(
         (CASE WHEN length(trim(text)) > 0 THEN 0.25 ELSE 0.0 END)
       + (CASE WHEN size(split(text, ' ')) >= 5 THEN 0.25 ELSE 0.0 END)
       + (CASE WHEN size(array_distinct(split(text, ' ')))
                 >= 0.3 * size(split(text, ' ')) THEN 0.25 ELSE 0.0 END)
       + (CASE WHEN length(replace(text, ' ', ''))
                 BETWEEN 2 * size(split(text, ' '))
                 AND 12 * size(split(text, ' ')) THEN 0.25 ELSE 0.0 END)
       AS DOUBLE), 2) AS quality,
       CAST(size(regexp_extract_all(text || {_PII_SUFFIX}, {_URL_RE}, 0)) AS BIGINT) AS n_pii_url,
       CAST(size(regexp_extract_all(text || {_PII_SUFFIX}, {_EMAIL_RE}, 0)) AS BIGINT) AS n_pii_email,
       CAST(size(regexp_extract_all(text || {_PII_SUFFIX}, {_PHONE_RE}, 0)) AS BIGINT) AS n_pii_phone,
       CAST(size(regexp_extract_all(text || {_PII_SUFFIX}, {_IPV4_RE}, 0)) AS BIGINT) AS n_pii_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         text || {_PII_SUFFIX},
         {_URL_RE}, '<URL>'), {_EMAIL_RE}, '<EMAIL>'),
         {_PHONE_RE}, '<PHONE>'), {_IPV4_RE}, '<IP>')) AS redacted_hash
FROM documents ORDER BY doc_id
""",
    "ts_gapfill_hourly": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM hourly GROUP BY 1
),
spine AS (
  SELECT b.event_type, hr
  FROM bounds b
  LATERAL VIEW explode(sequence(b.lo, b.hi, interval 1 hour)) t AS hr
),
j AS (
  SELECT s.event_type, s.hr, h.v
  FROM spine s LEFT JOIN hourly h USING (event_type, hr)
),
w AS (
  SELECT event_type, hr, v,
    LAST_VALUE(v) IGNORE NULLS OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN hr END) IGNORE NULLS OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
    FIRST_VALUE(v) IGNORE NULLS OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hr END) IGNORE NULLS OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM j
)
SELECT event_type, hr,
       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
       round(CASE
         WHEN v IS NOT NULL THEN CAST(ROUND(v, 4) AS DOUBLE)
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           CAST(pv AS DOUBLE)
           + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
             * CAST(timestampdiff(HOUR, pd, hr) AS DOUBLE)
             / CAST(timestampdiff(HOUR, pd, nd) AS DOUBLE)
         ELSE CAST(COALESCE(pv, nv) AS DOUBLE)
       END, 4) AS v_filled
FROM w
ORDER BY event_type, hr
""",
    "sim_centroids": """
SELECT label, i - 1 AS pos,
       round(AVG(CAST(element_at(embedding, i) AS DOUBLE)), 6) AS centroid,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM embeddings
LATERAL VIEW explode(sequence(1, 64)) t AS i
GROUP BY label, i
ORDER BY label, pos
""",
    "sim_multiquery_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS ARRAY<DOUBLE>) AS qe
  FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.query_id, e.vec_id,
         {_cos("CAST(e.embedding AS ARRAY<DOUBLE>)", "q.qe")} AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rn
  FROM scored) t
WHERE rn <= 5
ORDER BY query_id, cosine DESC, vec_id
""",
    "dedup_embedding_topk_pairs": f"""
WITH scored AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         {_cos("CAST(a.embedding AS ARRAY<DOUBLE>)", "CAST(b.embedding AS ARRAY<DOUBLE>)")} AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, cosine FROM (
  SELECT doc_a, doc_b, cosine,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_a, doc_b) AS rn
  FROM scored) t
WHERE rn <= 20
ORDER BY cosine DESC, doc_a, doc_b
""",
    "dedup_simhash_pairs": f"""
WITH tok AS (
  SELECT doc_id, t FROM documents
  LATERAL VIEW explode({_SHINGLES_SPARK}) x AS t
),
th AS (
  SELECT doc_id, CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) AS h
  FROM tok
),
votes AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1 ELSE -1 END) AS score
  FROM th LATERAL VIEW explode(sequence(0, 59)) x AS i
  GROUP BY doc_id, i
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN score > 0 THEN shiftleft(CAST(1 AS BIGINT), i)
                  ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, simhash, c,
         shiftrightunsigned(simhash, c * 15) & 32767 AS chunk
  FROM sig LATERAL VIEW explode(sequence(0, 3)) x AS c
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS ha, y.simhash AS hb
  FROM chunks x JOIN chunks y
    ON x.c = y.c AND x.chunk = y.chunk AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(ha ^ hb) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(ha ^ hb) <= 6
ORDER BY doc_a, doc_b
""",
    "dedup_ngram_jaccard": f"""
WITH sh AS (
  SELECT doc_id, s FROM documents
  LATERAL VIEW explode({_SHINGLES_SPARK}) x AS s
),
rare AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 5
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN rare r ON a.s = r.s
  JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5
ORDER BY i.doc_a, i.doc_b
""",
    "emb_quantize_int8": """
WITH s AS (
  SELECT vec_id, embedding,
         array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
  FROM embeddings
)
SELECT vec_id, CAST(pos AS INT) AS pos,
       CAST(CASE WHEN sc = 0 THEN 0
            ELSE floor(127.0 * CAST(x AS DOUBLE) / sc + 0.5)
            END AS INT) AS q,
       round(sc, 6) AS scale
FROM s
LATERAL VIEW posexplode(embedding) t AS pos, x
ORDER BY vec_id, pos
""",
}


def spark_sql_text(name: str) -> str | None:
    """The Spark SQL text for a graded cert: the dialect twin when one
    is needed, the shared oracle text otherwise, None if enumerated
    non-expressible."""
    from data_ingestion_backend_spark.registry import ORACLE

    if name in NON_EXPRESSIBLE:
        return None
    return SPARK_TEXT.get(name, ORACLE[name])
