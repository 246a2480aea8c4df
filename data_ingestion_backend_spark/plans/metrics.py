"""One-pass pipeline metrics via ``Dataset.observe``.

Every ingestion step wants counters — rows read, rows quarantined, bytes,
null rate — and the naive way is a second aggregation over the same
input: at 100 TB that doubles the scan bill for bookkeeping.  Spark's
observation API attaches aggregate expressions to a plan node and
collects them AS A SIDE EFFECT of whatever action already runs (the
write, the collect), so the metrics ride the existing scan for free.

The reference logs its per-job counters imperatively while looping rows
(``src/app/services/csv_validator.py`` accumulators + the job ledger
fields); this is the declarative, single-pass equivalent.

Constraints worth knowing (tested):
- metrics must be aggregates over the observed node's output; they see
  the rows AFTER upstream transformations and BEFORE downstream ones —
  observe where you want to measure;
- an Observation yields values only after an ACTION runs the plan, and
  binds to at most one action (re-observe for a second run);
- works for batch; streaming queries surface the same via
  ``StreamingQueryProgress.observedMetrics`` (same expression API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str | None = None, **metrics
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s plan.

    Returns the observed frame (use it EXACTLY like df) and the
    Observation handle; read ``obs.get`` after any action has executed
    the plan.  ``metrics``: name → aggregate Column.  ``name=None``
    lets Spark generate a unique observation name — required when the
    same logical step runs repeatedly in one session (reprocess loops),
    since observation names must be unique per active action.
    """
    obs = Observation(name) if name is not None else Observation()
    out = df.observe(obs, *[col.alias(k) for k, col in metrics.items()])
    return out, obs


def ingest_counters(df: DataFrame, name: str = "ingest") -> tuple[DataFrame, Observation]:
    """The standard intake counter set, riding the ingest scan: total
    rows, rows with a null/empty email (the reference's
    MISSING_REQUIRED_FIELD signal), and distinct-ish email cardinality
    (approx — exact distinct would force a shuffle into the pass)."""
    return observed(
        df,
        name,
        n_rows=F.count(F.lit(1)),
        n_missing_email=F.sum(
            (F.col("email").isNull() | (F.trim(F.col("email")) == "")).cast("long")
        ),
        approx_emails=F.approx_count_distinct("email"),
    )
