"""Property-based tests (hypothesis) for driver-side intake robustness."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_backend_spark.functions.scalars import norm_header
from data_ingestion_backend_spark.sources.intake import (
    CsvDialect,
    IntakeError,
    map_headers,
    sniff_delimiter,
    sniff_dialect,
    sniff_encoding,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_sniff_dialect_total(tmp_path_factory, data):
    """Arbitrary bytes in a .csv file either sniff to a dialect or raise
    IntakeError — never any other exception (upload-level totality)."""
    p = tmp_path_factory.mktemp("fuzz") / "f.csv"
    p.write_bytes(data)
    try:
        d = sniff_dialect(str(p))
        assert isinstance(d, CsvDialect)
        assert d.delimiter in (";", ",", "\t")
    except IntakeError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_sniff_encoding_total(data):
    codec = sniff_encoding(data)
    data.decode(codec)  # the returned codec must actually decode the head


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=1, max_size=200))
def test_sniff_delimiter_total(header_line):
    assert sniff_delimiter(header_line) in (";", ",", "\t")


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_norm_header_idempotent(raw):
    once = norm_header(raw)
    assert norm_header(once) == once


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["E-Mail", "email", "Nome", "first_name", "LASTNAME", "empresa",
             "Company", "extra_col", "junk"]
        ),
        max_size=8,
    )
)
def test_map_headers_claims_each_canonical_once(headers):
    m = map_headers(headers)
    # no canonical column is claimed by two raw headers
    claimed = list(m.values())
    assert len(claimed) == len(set(claimed))
    # mapping only ever targets canonical names
    assert set(claimed) <= {"email", "first_name", "last_name", "company"}
