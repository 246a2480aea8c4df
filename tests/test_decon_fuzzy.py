"""Goldens for fuzzy (MinHash) train-vs-held-out decontamination.

The cross-engine oracle runs in the standalone differential gate; these
tests plant contamination on doc_ids with KNOWN md5 split buckets
(train: 0..5; held-out: 30, 40, 43 — bucket >= TRAIN_PCT) and pin the
cross-corpus-only contract: train x train and held x held duplicates are
never reported, however similar.
"""

from __future__ import annotations

from data_ingestion_backend_spark.operators.dedup import decontaminate_fuzzy_frame

_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
)
_OTHER = (
    "zinc copper iron nickel cobalt chromium tungsten silver platinum gold "
    "mercury cadmium bismuth arsenic antimony tellurium polonium radium"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        (r["doc_train"], r["doc_heldout"]): r["jaccard"]
        for r in decontaminate_fuzzy_frame(df).collect()
    }


def test_planted_cross_split_duplicate_flagged(spark):
    out = _run(
        spark,
        [
            (0, _BASE),       # train, contaminated
            (30, _BASE),      # held-out original
            (3, _OTHER),      # train, clean
        ],
    )
    assert out == {(0, 30): 1.0}


def test_within_split_duplicates_never_reported(spark):
    out = _run(
        spark,
        [
            (1, _BASE),   # train x train identical pair
            (2, _BASE),
            (40, _OTHER),  # held x held identical pair
            (43, _OTHER),
        ],
    )
    assert out == {}


def test_direction_is_train_to_heldout(spark):
    out = _run(spark, [(5, _OTHER), (43, _OTHER)])
    assert list(out) == [(5, 43)]  # train id first, regardless of id order
