"""CSV intake: dialect sniffing, header normalization, file validation.

The reference validates uploads in a strict fail-fast order — extension →
non-empty → size cap → headers → content (reference
``src/app/services/csv_validator.py:339-354``, README ADR-003) — then the
worker parses rows.  Here the cheap checks run driver-side on a bounded
*head sample* of the file (never the whole file: a 1 TB CSV must not pass
through the driver), and the actual parse is a distributed
``spark.read.csv`` with the sniffed dialect.

Sniffing semantics (re-expressed from the reference's intake contract,
``csv_validator.py:180-265``):

- **encoding**: try a codec chain (utf-8 first, then common latin-ish
  fallbacks); first codec that decodes the head sample wins.  Note utf-8 is
  the only codec in the chain that can *fail*; latin-1 decodes any byte
  string, so it acts as the terminal fallback exactly like the reference's
  content fallback.
- **delimiter**: among ``; , \\t``, a candidate is *plausible* if it splits
  the header line into >1 cells and no resulting header cell still contains
  a rival delimiter; first plausible candidate wins, else comma.
- **headers**: case/space/underscore-insensitive synonym lookup mapping
  localized or variant spellings (``nome`` → ``first_name``…) onto the four
  canonical columns.  Extra columns are carried through the parse but
  dropped from staging (DictReader semantics).

Scale: sniffing reads ≤64 KB per file on the driver (one object-store
ranged GET); everything row-shaped happens in executors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.functions.scalars import norm_header, row_hash
from data_ingestion_backend_spark.models import CANONICAL_COLUMNS, HEADER_SYNONYMS

HEAD_SAMPLE_BYTES = 64 * 1024
ENCODING_CHAIN = ("utf-8", "latin-1", "cp1252", "iso-8859-1", "windows-1252")
DELIMITER_CANDIDATES = (";", ",", "\t")
REQUIRED_COLUMNS = frozenset(CANONICAL_COLUMNS)


class IntakeError(ValueError):
    """File-level rejection (the HTTP-400 analogue)."""


@dataclass(frozen=True)
class CsvDialect:
    encoding: str
    delimiter: str
    header_map: dict  # raw header name -> canonical column name
    raw_headers: tuple
    # True ⇔ the head sample shows a quoted field spanning physical lines,
    # i.e. the file actually needs RFC-4180 newline handling.  multiLine
    # reads make each file a SINGLE split (one task parses the whole file),
    # so it must be paid only when required; default True = safe.
    needs_multiline: bool = True


def _sniff_embedded_newlines(text: str, delimiter: str) -> bool:
    """Does any quoted field in the (complete lines of the) head sample
    contain an embedded newline?  Exact for the sampled region: parse with
    the stdlib csv reader — the same parser whose semantics the multiLine
    Spark read reproduces — and flag any field carrying a newline."""
    import csv as _csv
    import io

    # drop the final (possibly byte-truncated) line so we never judge a
    # half-read quoted field as spanning lines
    clipped = text[: text.rfind("\n") + 1] if "\n" in text else text
    try:
        for record in _csv.reader(io.StringIO(clipped), delimiter=delimiter):
            if any("\n" in field or "\r" in field for field in record):
                return True
    except _csv.Error:
        return True  # unparseable sample → take the safe single-split path
    return False


def _read_head(path: str, n: int = HEAD_SAMPLE_BYTES) -> bytes:
    with open(path, "rb") as f:
        return f.read(n)


def sniff_encoding(head: bytes) -> str:
    for codec in ENCODING_CHAIN:
        try:
            head.decode(codec)
            return codec
        except UnicodeDecodeError:
            continue
    return "latin-1"  # decodes anything; unreachable in practice


def sniff_delimiter(header_line: str) -> str:
    rivals = set(DELIMITER_CANDIDATES)
    for cand in DELIMITER_CANDIDATES:
        cells = header_line.split(cand)
        if len(cells) <= 1:
            continue
        others = rivals - {cand}
        if any(o in cell for cell in cells for o in others):
            continue  # implausible: a rival delimiter survives inside a cell
        return cand
    return ","


def map_headers(raw_headers: list[str]) -> dict:
    """Map raw header spellings to canonical columns (first match wins)."""
    out: dict[str, str] = {}
    claimed: set[str] = set()
    for raw in raw_headers:
        canon = HEADER_SYNONYMS.get(norm_header(raw))
        if canon and canon not in claimed:
            out[raw] = canon
            claimed.add(canon)
    return out


def sniff_dialect(path: str, max_bytes: int | None = None) -> CsvDialect:
    """File-level validation + dialect detection on a bounded head sample.

    Raises :class:`IntakeError` for upload-level rejects (wrong extension,
    empty file, oversized file, header-only file, missing required headers).

    ``max_bytes`` mirrors the reference's hard upload cap
    (``MAX_FILE_SIZE = 5*1024*1024``, csv_validator.py:15,45-47).  It
    defaults to None (no cap): the cap existed as single-process
    backpressure, which Spark's split-parallel reads make unnecessary —
    pass ``5 * 1024 * 1024`` to reproduce reference behavior exactly.
    """
    if not path.lower().endswith(".csv"):
        raise IntakeError(f"not a .csv file: {os.path.basename(path)}")
    if max_bytes is not None and os.path.getsize(path) > max_bytes:
        raise IntakeError(
            f"file exceeds size cap: {os.path.getsize(path)} > {max_bytes} bytes"
        )
    head = _read_head(path)
    if not head.strip():
        raise IntakeError("empty file")
    encoding = sniff_encoding(head)
    text = head.decode(encoding, errors="replace")
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        raise IntakeError("empty file")
    header_line = lines[0]
    delimiter = sniff_delimiter(header_line)
    raw_headers = [h.strip().strip('"') for h in header_line.split(delimiter)]
    header_map = map_headers(raw_headers)
    missing = REQUIRED_COLUMNS - set(header_map.values())
    if missing:
        raise IntakeError(f"missing required headers: {sorted(missing)}")
    if len(lines) < 2 and len(head) < HEAD_SAMPLE_BYTES:
        raise IntakeError("header-only file (no data rows)")
    return CsvDialect(
        encoding=encoding,
        delimiter=delimiter,
        header_map=header_map,
        raw_headers=tuple(raw_headers),
        needs_multiline=_sniff_embedded_newlines(text, delimiter),
    )


def _has_odd_quote_parity_line(spark: SparkSession, path: str) -> bool:
    """EXACT distributed check for quoted fields spanning physical lines.

    Under RFC-4180 quoting (doubled-quote escaping), a record contains an
    embedded newline iff some physical line carries an ODD number of
    ``\"`` characters.  The head-sample sniff can miss a first quoted
    newline past 64 KB; this scan closes that hole before committing to a
    split-parallel (line-based) parse.  Cost: one splittable pass over the
    raw text that short-circuits on the first offending line — no CSV
    parsing, no shuffle; a false positive (a stray quote in an unquoted
    field) merely falls back to the always-correct single-split read.
    """
    odd = spark.read.text(path).filter(
        F.expr("length(regexp_replace(value, '[^\"]', '')) % 2 = 1")
    )
    return bool(odd.take(1))


def read_csv(spark: SparkSession, path: str, dialect: CsvDialect | None = None) -> DataFrame:
    """Distributed CSV parse with the sniffed dialect → canonical columns.

    Output: ``line_no`` (1-based data-row order), the four canonical string
    columns (missing cells → NULL), and ``staging_row_hash``.

    ``line_no`` reconstructs file order from (split-id, row-in-split):
    Spark's CSV reader preserves row order within each split and numbers
    splits by file offset, so ``spark_partition_id`` ascending + position
    within the partition is exactly file order.  Numbering is assigned with
    per-partition windows plus a precomputed per-partition offset map — no
    global single-reducer sort, so a multi-GB file still parallelizes.
    """
    dialect = dialect or sniff_dialect(path)
    # Spark's CSV reader accepts a restricted charset list (and Java names):
    # utf-8 stays utf-8; every latin-ish fallback normalizes to ISO-8859-1 —
    # the same utf-8→latin-1 content fallback as the reference
    # (csv_validator.py:84-90).  Single-byte decode never fails, so a
    # PERMISSIVE read cannot drop rows on charset grounds.
    charset = "UTF-8" if dialect.encoding == "utf-8" else "ISO-8859-1"
    # escape='"': RFC-4180 semantics — quoted fields may contain the
    # delimiter and doubled quotes, exactly like the reference's stdlib
    # csv.reader (csv_validator.py:276-281).  multiLine (quoted fields
    # containing embedded NEWLINES) additionally forces each file to a
    # SINGLE split — one task parses the whole file — so it is paid only
    # when the head sample shows the file actually needs it; plain files
    # read split-parallel, which is what lets ingestion scale past the
    # reference's 5 MB ceiling to multi-GB uploads.
    multiline = dialect.needs_multiline
    if not multiline and _has_odd_quote_parity_line(spark, path):
        # the head sample missed a quoted newline deeper in the file —
        # a line-based parse would tear that record; take the safe path
        multiline = True
    raw = (
        spark.read.option("header", True)
        .option("sep", dialect.delimiter)
        .option("encoding", charset)
        .option("multiLine", multiline)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    # canonical projection: rename mapped headers, carry NULL for absent
    cols = []
    inverse = {v: k for k, v in dialect.header_map.items()}
    for canon in CANONICAL_COLUMNS:
        raw_name = inverse.get(canon)
        if raw_name is not None and raw_name in raw.columns:
            cols.append(F.col(f"`{raw_name}`").alias(canon))
        else:
            cols.append(F.lit(None).cast("string").alias(canon))
    projected = raw.select(*cols)
    return with_line_numbers(projected).withColumn(
        "staging_row_hash", row_hash("email", "first_name", "last_name", "company")
    )


def with_line_numbers(df: DataFrame, col_name: str = "line_no") -> DataFrame:
    """Assign a 1-based total-order row number without a global sort.

    The input is materialized ONCE (``localCheckpoint``), then (1) rows
    are counted per materialized partition (tiny result → driver) and
    (2) numbered as per-partition ``row_number`` + the partition's
    cumulative offset.  The checkpoint is what makes this sound: both
    actions read the SAME frozen partitioning, so the partition-id
    assignment cannot skew between the count pass and the numbering pass
    no matter how the upstream reader splits the file (split-parallel
    CSV, config changes, speculative re-reads).  The materialization is
    not wasted — ingest consumes the parsed rows several times right
    after (validation DAG + snapshot writes).  This is the scalable
    replacement for ``ROW_NUMBER() OVER (ORDER BY …)`` when the order
    wanted is "source order".
    """
    from pyspark.sql.window import Window

    tagged = df.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    counts = dict(
        tagged.groupBy("_pid").count().collect()
    )  # one row per partition: control-plane sized
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        offset_col = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
    else:  # empty input — numbering is vacuous
        offset_col = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    return (
        tagged.withColumn(
            col_name, (F.row_number().over(w) + offset_col).cast("long")
        )
        .drop("_pid")
    )
