"""Fuzzy (edit-distance) join via token-posting blocking with a hot-token guard.

The data-cleaning operator behind "are these two names the same thing":
record linkage, label normalization, near-identical product titles.
The reference's DUPLICATE_EMAIL taxonomy (``src/models/issue.py:12-17``)
is the exact-match version; this is its approximate sibling.

A naive fuzzy join is the quadratic trap — levenshtein over all pairs.
The scalable form is the dedup family's blocking discipline applied to
strings: explode each name into its tokens, posting-join on shared
tokens, verify the survivors with exact ``levenshtein``.  Candidate
cost is Σ_token df(token)² — which one stop-token ("inc", "of", "the")
turns quadratic on a real name corpus.  The guard (same discipline as
``dedup.NGRAM_MAX_DF``):

1. **df-prune the posting join**: tokens with document frequency above
   the cap are HOT and never join.  The cap is ``max_df`` when given
   (absolute — the production form, which bounds candidate cost to
   cap·Σdf = linear in the corpus), else the auto form
   ``greatest(16, ceil(0.25·|names|))`` — scale-invariant on curated
   vocabularies (the fixture's densest token sits at 12.5%) while still
   catching genuine stop-tokens, which run far denser than 25%.
2. **q-gram fallback for hot-token carriers**: every name containing at
   least one hot token ALSO blocks on the character 3-grams of its full
   string (df-capped identically).  Two names whose only shared tokens
   are hot ("acme inc" / "acmee inc") both carry the hot token, so both
   enter the fallback and meet through their rare q-grams ("acm",
   "cme"); the ubiquitous q-grams the stop-token itself contributes
   ("inc", " in") are df-pruned away, keeping the fallback bounded.

Completeness contract (documented, like the dedup family's): a true
pair is found when it shares an unedited RARE token, or when both names
carry a hot token and share a rare q-gram.  The only misses are pairs
built entirely of ubiquitous tokens AND ubiquitous q-grams — at which
point "name similarity" itself is ill-posed.  For threshold K=1 and
stop-token-free corpora the original pigeonhole proof applies unchanged
(one edit touches at most one token, so an unedited token is shared);
the planted stop-token golden (``tests/test_fuzzy.py``) differentials
the guarded result against the naive quadratic ground truth and pins
the candidate-count bound.

Both engines compute integer ``levenshtein`` — exact, hash-safe, no
float terminal anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.queries import _register_standalone
from data_ingestion_backend_spark.sources.fixtures import load_table

FUZZY_MAX_DIST = 2
#: auto hot-token cap: df > greatest(ABS floor, ceil(FRAC·|names|)).
#: The floor protects tiny corpora from over-pruning; the fraction makes
#: the cap scale-invariant (a token in a fixed share of names stays on
#: the same side of the cap at every SF).
FUZZY_MIN_DF_CAP = 16
FUZZY_MAX_DF_FRAC = 0.25
FUZZY_QGRAM = 3


def _char_qgrams(name_col: str, q: int = FUZZY_QGRAM):
    """Distinct character q-grams of the full string (whole-name salt for
    the fallback path; names shorter than q contribute themselves)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({name_col}) - {q - 1}, 1)),"
            f" i -> substring({name_col}, i, {q}))"
        )
    )


def _self_pairs(keyed: DataFrame) -> DataFrame:
    """All (id_a < id_b) pairs sharing a blocking key, from an
    (nid, key) frame.  Plain two-sided equi-join over 8-byte ids:
    posting lists are df-capped upstream, AQE splits any residual skew,
    and no wide collect_list row is ever built."""
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key")) & (F.col("a.nid") < F.col("b.nid")),
        )
        .select(F.col("a.nid").alias("id_a"), F.col("b.nid").alias("id_b"))
    )


def _hot_keys(df_frame: DataFrame, pop: DataFrame, max_df: int | None) -> DataFrame:
    """Keys whose document frequency exceeds the cap (absolute ``max_df``
    or the auto ``greatest(floor, ceil(frac·|pop|))`` form, computed as
    an in-plan broadcast scalar — no driver action)."""
    if max_df is not None:
        return df_frame.filter(F.col("df") > max_df).select("key")
    n = pop.agg(F.count(F.lit(1)).alias("n_names"))
    cap = F.greatest(
        F.lit(FUZZY_MIN_DF_CAP),
        F.ceil(F.lit(FUZZY_MAX_DF_FRAC) * F.col("n_names")),
    )
    return df_frame.crossJoin(F.broadcast(n)).filter(F.col("df") > cap).select("key")


def _fuzzy_candidates(
    names: DataFrame, col: str, max_df: int | None = None
) -> DataFrame:
    """Blocked candidate pairs: rare-token join ∪ q-gram fallback for
    hot-token carriers.  Exposed separately so tests can pin the
    candidate-count bound independently of the verify filter.

    Every posting join runs on ``nid = xxhash64(name)`` — shuffles move
    8-byte ids, not name strings; names rejoin only for the final verify
    (two bigint-keyed joins against the names-sized base).  A 64-bit
    collision maps two distinct names to one id, which can only DROP
    their mutual pair (same-id rows never satisfy ``id_a < id_b``) —
    expected collisions N²/2⁶⁵ sit far below one for any real name
    corpus (N=10⁸ → ~10⁻⁴), inside the operator's documented
    approximate-completeness contract.
    """
    base = (
        names.select(F.col(col).alias("name"))
        .distinct()
        .withColumn("nid", F.xxhash64("name"))
    )
    # distinct tokens PER NAME (array_distinct is map-side, no shuffle):
    # df is true document frequency — a token repeated inside one name
    # ("acme acme inc") counts once, so the hot cap means share-of-names.
    toks = base.select(
        "nid",
        F.explode(F.array_distinct(F.split(F.col("name"), " "))).alias("key"),
    )
    tok_df = toks.groupBy("key").agg(F.count(F.lit(1)).alias("df"))
    # hot tokens are FEW by construction (each exceeds the cap, so their
    # count is at most Σdf/cap) — broadcast both prune joins
    hot = _hot_keys(tok_df, base, max_df)
    rare_toks = toks.join(F.broadcast(hot), "key", "left_anti")
    cand_tok = _self_pairs(rare_toks)

    # fallback: names carrying ≥1 hot token block on whole-name q-grams,
    # themselves df-capped by the same rule (computed over the fallback
    # subset — the population actually joining)
    carriers = (
        toks.join(F.broadcast(hot), "key", "left_semi")
        .select("nid")
        .distinct()
        .join(base, "nid")
    )
    qg = carriers.select("nid", F.explode(_char_qgrams("name")).alias("key"))
    qg_df = qg.groupBy("key").agg(F.count(F.lit(1)).alias("df"))
    hot_qg = _hot_keys(qg_df, carriers, max_df)
    rare_qg = qg.join(F.broadcast(hot_qg), "key", "left_anti")
    cand_qg = _self_pairs(rare_qg)

    ids = cand_tok.unionByName(cand_qg).distinct()
    # names rejoin on bigint keys; canonical (name_a < name_b) order is
    # re-established here — id order and name order need not agree
    na = base.select(F.col("nid").alias("id_a"), F.col("name").alias("_na"))
    nb = base.select(F.col("nid").alias("id_b"), F.col("name").alias("_nb"))
    return (
        ids.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            F.least("_na", "_nb").alias("name_a"),
            F.greatest("_na", "_nb").alias("name_b"),
        )
    )


def fuzzy_self_join(
    names: DataFrame,
    col: str,
    max_dist: int = FUZZY_MAX_DIST,
    max_df: int | None = None,
) -> DataFrame:
    """All (a < b) pairs of ``names[col]`` within ``max_dist`` edits,
    candidates generated by the df-guarded posting join (module
    docstring: guard + completeness contract)."""
    cand = _fuzzy_candidates(names, col, max_df)
    d = F.levenshtein("name_a", "name_b")
    return (
        cand.withColumn("edit_dist", d.cast("bigint"))
        .filter(F.col("edit_dist") <= max_dist)
        .orderBy("name_a", "name_b")
    )


_FUZZY_ORACLE = f"""
WITH names AS (SELECT DISTINCT p_name FROM part),
toks AS (SELECT p_name AS name, unnest(string_split(p_name, ' ')) AS tok
         FROM names),
cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.name < b.name
)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


@_register_standalone("fuzzy_part_names", _FUZZY_ORACLE)
def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names (edit distance ≤ 2), token-blocked with
    the df guard live: the fixture vocabulary's densest token sits at
    12.5% of names — under the 25% auto cap — so no token is hot, the
    fallback set is empty, and the guarded plan provably produces the
    unguarded oracle's result (the planted stop-token golden covers the
    hot path the fixture cannot)."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    return fuzzy_self_join(names, "p_name")


# --------------------------------------------------------------------------
# Entity resolution end-to-end: block → match → cluster → canonicalize
# --------------------------------------------------------------------------

_ER_ORACLE = f"""
WITH RECURSIVE
names AS (SELECT p_name AS name, MIN(p_partkey) AS key FROM part GROUP BY p_name),
toks AS (SELECT name, key, unnest(string_split(name, ' ')) AS tok FROM names),
pairs AS (
  SELECT DISTINCT a.key AS ka, b.key AS kb
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
),
und AS (SELECT ka AS a, kb AS b FROM pairs UNION ALL SELECT kb, ka FROM pairs),
reach(id, lbl) AS (
  SELECT key, key FROM names
  UNION
  SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.id
)
SELECT n.name, MIN(r.lbl) AS entity_id, MIN(r.lbl) = n.key AS is_canonical
FROM names n JOIN reach r ON r.id = n.key
GROUP BY n.name, n.key
ORDER BY n.name
"""


@_register_standalone("er_canonical_parts", _ER_ORACLE)
def er_canonical_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution E2E: the pipeline that turns "rows that look
    alike" into "one canonical entity per cluster" — the full version of
    the reference's DUPLICATE_EMAIL keep/merge decision
    (``src/models/issue.py:12-17`` + the dedup merge the API implies).

    Stage shapes, each individually certified elsewhere and composed
    here into ONE DataFrame DAG:

    1. **block + match**: df-guarded token-posting join with exact
       ``levenshtein`` verify (:func:`fuzzy_self_join` — the
       ``fuzzy_part_names`` cert);
    2. **cluster**: distributed delta min-label propagation over the
       match pairs (:func:`dedup.connected_components` — the
       ``dedup_clusters`` cert), driver sees only the convergence
       counter;
    3. **canonicalize (survivorship)**: deterministic canonical key =
       MIN entity key per component — swap in any other survivorship
       rule (longest name, freshest record) as an ``F.min_by``
       aggregation without touching stages 1-2.

    Node ids are ``MIN(p_partkey)`` per distinct name: bigint keys keep
    the CC loop narrow (labels shuffle 16 bytes/row, not name strings).
    The DuckDB oracle reaches the same fixpoint via a recursive CTE over
    the UNGUARDED posting join — an independent evaluation of all three
    stages at once; one lost match pair or one wrong label anywhere
    hash-fails the cert.

    Scale: matching is the guarded posting join (linear with the
    absolute df cap), CC is O(component diameter) rounds over match
    pairs only (near-dup subgraph, not the corpus), canonicalization is
    one join — the standard production ER decomposition.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("key"))
    )
    pairs = fuzzy_self_join(names.select("p_name"), "p_name")
    ka = names.select(F.col("p_name").alias("name_a"), F.col("key").alias("doc_a"))
    kb = names.select(F.col("p_name").alias("name_b"), F.col("key").alias("doc_b"))
    key_pairs = pairs.join(ka, "name_a").join(kb, "name_b").select("doc_a", "doc_b")

    from data_ingestion_backend_spark.operators.dedup import connected_components

    labels = connected_components(key_pairs)
    return (
        names.join(labels, names.key == labels.doc_id, "left")
        .select(
            F.col("p_name").alias("name"),
            F.coalesce(F.col("lbl"), F.col("key")).alias("entity_id"),
            (F.coalesce(F.col("lbl"), F.col("key")) == F.col("key")).alias(
                "is_canonical"
            ),
        )
        .orderBy("name")
    )
