"""Timestamp coercion vectors from quickwit-datetime/src/date_time_parsing.rs
tests and doc_mapper/date_time_type.rs:401-454 (see FIXTURES.md F4)."""

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.functions.datetime import (
    MAX_TIMESTAMP_SECONDS,
    MIN_TIMESTAMP_SECONDS,
    coerce_timestamp_pandas,
)


def coerce_one(val, **kw):
    nanos, err = coerce_timestamp_pandas(pd.Series([val], dtype=object), **kw)
    return (None if nanos.isna().iat[0] else int(nanos.iat[0])), err.iat[0]


def test_rfc3339_string():
    nanos, err = coerce_one("2012-05-21T12:09:14-00:00", fast_precision="nanos")
    assert err is None
    assert nanos == 1337602154 * 10**9


def test_int_unit_inference():
    base = 1337602154
    for mult in (1, 10**3, 10**6, 10**9):
        nanos, err = coerce_one(base * mult + (123 if mult > 1 else 0), fast_precision="nanos")
        assert err is None
        # value interpreted in the inferred unit
        expected = (base * mult + (123 if mult > 1 else 0)) * (10**9 // mult)
        assert nanos == expected


def test_float_seconds():
    nanos, err = coerce_one(1337602154.0, fast_precision="nanos")
    assert err is None
    assert nanos == 1337602154 * 10**9


def test_precision_truncation():
    # date_time_type.rs:448-454: nanos input truncated at millis precision
    nanos, err = coerce_one(123456789100000001, fast_precision="millis")
    assert err is None
    assert nanos == 123456789100 * 10**6


def test_default_precision_seconds():
    nanos, err = coerce_one(1337602154123, fast_precision="seconds")
    assert err is None
    assert nanos == 1337602154 * 10**9


def test_out_of_range_errors():
    for bad in (MIN_TIMESTAMP_SECONDS - 1, MAX_TIMESTAMP_SECONDS * 10**9 + 10**15, 0, -5):
        nanos, err = coerce_one(bad)
        assert nanos is None
        assert "failed to parse" in err


def test_bad_string_errors():
    nanos, err = coerce_one("not a date")
    assert nanos is None
    assert "failed to parse datetime `not a date`" in err


def test_null_passthrough():
    nanos, err = coerce_timestamp_pandas(pd.Series([None], dtype=object))
    assert nanos.isna().iat[0] and err.iat[0] is None


def test_numeric_string_with_fraction():
    nanos, err = coerce_one("1337602154.5", fast_precision="nanos")
    assert err is None
    assert nanos == 1337602154 * 10**9 + 500_000_000


def test_numeric_string_millis():
    nanos, err = coerce_one("1337602154123", fast_precision="nanos")
    assert err is None
    assert nanos == 1337602154123 * 10**6


def test_strptime_format():
    nanos, err = coerce_one(
        "2012-05-21 12:09:14", input_formats=("strptime:%Y-%m-%d %H:%M:%S",),
        fast_precision="nanos",
    )
    assert err is None
    assert nanos == 1337602154 * 10**9


def test_rfc2822():
    nanos, err = coerce_one(
        "Mon, 21 May 2012 12:09:14 GMT", input_formats=("rfc2822",), fast_precision="nanos"
    )
    assert err is None
    assert nanos == 1337602154 * 10**9


def test_int_rejected_without_unix_timestamp_format():
    nanos, err = coerce_one(1337602154, input_formats=("rfc3339",))
    assert nanos is None and err is not None


def test_batch_mixed():
    s = pd.Series(
        ["2012-05-21T12:09:14Z", 1337602154, 1337602154123, "junk", None, 1337602154.25],
        dtype=object,
    )
    nanos, err = coerce_timestamp_pandas(s, fast_precision="nanos")
    assert int(nanos.iat[0]) == 1337602154 * 10**9
    assert int(nanos.iat[1]) == 1337602154 * 10**9
    assert int(nanos.iat[2]) == 1337602154123 * 10**6
    assert nanos.isna().iat[3] and err.iat[3] is not None
    assert nanos.isna().iat[4] and err.iat[4] is None
    assert int(nanos.iat[5]) == 1337602154 * 10**9 + 250_000_000


def test_out_of_int64_range_int_is_error_not_crash():
    """A doc with timestamp 10**20 must quarantine as a parse error, not
    OverflowError the whole task (ADVICE r1)."""
    import pandas as pd

    from quickwit_spark.functions.datetime import coerce_timestamp_pandas

    s = pd.Series([10**20, -(10**20), 1700000000, None], dtype=object)
    nanos, errors = coerce_timestamp_pandas(s)
    assert errors[0] is not None and "failed to parse datetime" in errors[0]
    assert errors[1] is not None
    assert errors[2] is None and nanos[2] == 1700000000 * 1_000_000_000
    assert errors[3] is None
