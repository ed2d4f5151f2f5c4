"""Timestamp coercion with Quickwit's exact semantics.

Behavior replicated from quickwit-datetime/src/date_time_parsing.rs and
quickwit-doc-mapper/src/doc_mapper/date_time_type.rs (studied for behavior):

- Supported input formats: ``iso8601 | rfc2822 | rfc3339 | strptime(...) |
  unix_timestamp``; defaults ``[rfc3339, unix_timestamp]``
  (date_time_type.rs:155-162).
- Integer unit inference (date_time_parsing.rs:161-183): a value in
  ``[72_057_595, 8_589_934_591]`` is seconds; the same bounds x10^3 → millis;
  x10^6 → micros; x10^9 → nanos; outside all ranges → error. The bounds are
  1972-04-13T23:59:55Z .. 2242-03-16T12:56:31Z.
- Floats are seconds with fractional nanos, range-checked on the float value
  (:74-96). JSON numbers are tried as i64 *before* f64 (date_time_type.rs).
- Numeric *strings* are accepted by the ``unix_timestamp`` format, including
  ``secs.frac`` with ≤9 sub-second digits (:117-140).
- ``fast_precision`` truncation: seconds (default) / millis / micros / nanos.

Two paths:

- :func:`coerce_timestamp_pandas` — full semantics, vectorized pandas/numpy,
  used inside the doc-mapper's parse UDF; returns (nanos, error) so rows with
  bad timestamps can be quarantined with Quickwit's error category.
- :func:`coerce_timestamp_int_col` — pure-Column (JVM codegen) fast path for
  int64 epoch columns: the range dispatch is plain arithmetic, so at scale it
  runs entirely inside WholeStageCodegen with no Python involved.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_TIMESTAMP_SECONDS = 72_057_595
MAX_TIMESTAMP_SECONDS = 8_589_934_591

_PRECISION_DIVISOR = {"seconds": 1_000_000_000, "millis": 1_000_000, "micros": 1_000, "nanos": 1}

DEFAULT_INPUT_FORMATS = ("rfc3339", "unix_timestamp")


def _infer_unit_nanos(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Range-dispatch int64 epoch values → (nanos, ok_mask)."""
    v = vals.astype(np.int64, copy=False)
    nanos = np.zeros_like(v)
    ok = np.zeros(v.shape, dtype=bool)
    for mult in (1, 1_000, 1_000_000, 1_000_000_000):
        lo, hi = MIN_TIMESTAMP_SECONDS * mult, MAX_TIMESTAMP_SECONDS * mult
        m = (~ok) & (v >= lo) & (v <= hi)
        nanos[m] = v[m] * (1_000_000_000 // mult)
        ok |= m
    return nanos, ok


def _truncate(nanos: np.ndarray, fast_precision: str) -> np.ndarray:
    div = _PRECISION_DIVISOR[fast_precision]
    if div == 1:
        return nanos
    return (nanos // div) * div


_TS_STR_RE = r"^[+-]?\d+(\.\d*)?$"


def _parse_numeric_strings(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """unix_timestamp format on strings (date_time_parsing.rs:117-140)."""
    n = len(s)
    nanos = np.zeros(n, dtype=np.int64)
    ok = np.zeros(n, dtype=bool)
    is_num = s.str.match(_TS_STR_RE).fillna(False).to_numpy()
    if not is_num.any():
        return nanos, ok
    for i in np.nonzero(is_num)[0]:
        txt = s.iat[i]
        if "." in txt:
            secs_str, frac = txt.split(".", 1)
            try:
                secs = int(secs_str)
            except ValueError:
                continue
            if not frac:
                sub_nanos, ok_i = _infer_unit_nanos(np.array([secs]))
                if ok_i[0]:
                    nanos[i], ok[i] = sub_nanos[0], True
                continue
            if not (MIN_TIMESTAMP_SECONDS <= secs <= MAX_TIMESTAMP_SECONDS):
                continue
            digits = frac[:9]
            try:
                sub = int(digits) * 10 ** (9 - len(digits))
            except ValueError:
                continue
            nanos[i] = secs * 1_000_000_000 + sub
            ok[i] = True
        else:
            try:
                v = int(txt)
            except ValueError:
                continue
            sub_nanos, ok_i = _infer_unit_nanos(np.array([v]))
            if ok_i[0]:
                nanos[i], ok[i] = sub_nanos[0], True
    return nanos, ok


def _parse_datetime_strings(s: pd.Series, fmt: str) -> tuple[np.ndarray, np.ndarray]:
    """One string format pass → (nanos, ok). Unmatched rows stay not-ok."""
    if fmt == "unix_timestamp":
        return _parse_numeric_strings(s)
    if fmt in ("rfc3339", "iso8601"):
        parsed = pd.to_datetime(s, format="ISO8601", errors="coerce", utc=True)
    elif fmt == "rfc2822":
        from email.utils import parsedate_to_datetime

        def try_2822(x):
            try:
                return parsedate_to_datetime(x)
            except (TypeError, ValueError):
                return pd.NaT

        parsed = pd.to_datetime(s.map(try_2822), errors="coerce", utc=True)
    elif fmt.startswith("strptime:"):
        parsed = pd.to_datetime(s, format=fmt[len("strptime:") :], errors="coerce", utc=True)
    else:
        raise ValueError(f"unknown datetime input format: {fmt}")
    ok = parsed.notna().to_numpy()
    nanos = np.zeros(len(s), dtype=np.int64)
    if ok.any():
        nanos[ok] = parsed[ok].astype("int64").to_numpy()
    return nanos, ok


def coerce_timestamp_pandas(
    s: pd.Series,
    input_formats: tuple[str, ...] = DEFAULT_INPUT_FORMATS,
    fast_precision: str = "seconds",
) -> tuple[pd.Series, pd.Series]:
    """Coerce a mixed series (ints / floats / strings) to epoch nanos.

    Returns ``(nanos: Int64 nullable, error: object)``; exactly one of the two
    is set per non-null input row. Nulls pass through as (NA, None) — the
    reference silently ignores JSON nulls.
    """
    n = len(s)
    nanos = np.zeros(n, dtype=np.int64)
    ok = np.zeros(n, dtype=bool)
    errors = np.full(n, None, dtype=object)

    isnull = s.isna().to_numpy()
    vals = s.to_numpy(dtype=object)

    # integer-typed inputs (i64 tried before f64, date_time_type.rs:102-113)
    is_int = np.fromiter(
        (isinstance(v, (int, np.integer)) and not isinstance(v, bool) for v in vals),
        dtype=bool, count=n,
    )
    is_float = np.fromiter((isinstance(v, (float, np.floating)) for v in vals), dtype=bool, count=n)
    is_float &= ~isnull
    is_str = np.fromiter((isinstance(v, str) for v in vals), dtype=bool, count=n)

    allow_ts = "unix_timestamp" in input_formats

    if is_int.any():
        # ints outside int64 can't be epoch values in any unit — route them to
        # the normal per-row error path instead of OverflowError-ing the task
        # (one bad doc must quarantine, not kill the job)
        in_i64 = np.fromiter(
            (
                is_int[i] and -(1 << 63) <= vals[i] < (1 << 63)
                for i in range(n)
            ),
            dtype=bool, count=n,
        )
        is_int = in_i64
    if is_int.any():
        iv = np.array([vals[i] for i in np.nonzero(is_int)[0]], dtype=np.int64)
        if allow_ts:
            sub_nanos, sub_ok = _infer_unit_nanos(iv)
        else:
            sub_nanos, sub_ok = np.zeros(len(iv), np.int64), np.zeros(len(iv), bool)
        idx = np.nonzero(is_int)[0]
        nanos[idx], ok[idx] = sub_nanos, sub_ok

    if is_float.any():
        idx = np.nonzero(is_float)[0]
        fv = np.array([vals[i] for i in idx], dtype=np.float64)
        if allow_ts:
            in_range = (fv >= MIN_TIMESTAMP_SECONDS) & (fv <= MAX_TIMESTAMP_SECONDS)
            # split secs/frac before scaling to keep f64 precision (the
            # reference uses Duration::try_from_secs_f64, exact to the nanos)
            secs = np.floor(fv)
            f_nanos = secs.astype(np.int64) * 1_000_000_000 + np.round(
                (fv - secs) * 1e9
            ).astype(np.int64)
            nanos[idx[in_range]] = f_nanos[in_range]
            ok[idx[in_range]] = True

    if is_str.any():
        idx = np.nonzero(is_str)[0]
        sv = pd.Series([str(vals[i]).strip() for i in idx])
        remaining = np.ones(len(idx), dtype=bool)
        for fmt in input_formats:
            if not remaining.any():
                break
            sub_nanos, sub_ok = _parse_datetime_strings(sv, fmt)
            newly = remaining & sub_ok
            nanos[idx[newly]] = sub_nanos[newly]
            ok[idx[newly]] = True
            remaining &= ~sub_ok

    bad = ~ok & ~isnull
    if bad.any():
        fmt_list = "`, `".join(input_formats)
        for i in np.nonzero(bad)[0]:
            errors[i] = (
                f"failed to parse datetime `{vals[i]}` using the following formats: `{fmt_list}`"
            )

    nanos = _truncate(nanos, fast_precision)
    out = pd.Series(nanos, dtype="Int64")
    out[~ok] = pd.NA
    return out, pd.Series(errors, dtype=object)


def coerce_timestamp_int_col(col: Column, fast_precision: str = "seconds") -> Column:
    """JVM-side range dispatch for an int64 epoch column → TimestampType.

    NULL when out of range (caller quarantines). Keeps the whole parse stage
    inside WholeStageCodegen for numeric-timestamp feeds — the common case in
    log pipelines at scale.
    """
    c = col.cast("long")
    micros = (
        F.when(c.between(MIN_TIMESTAMP_SECONDS, MAX_TIMESTAMP_SECONDS), c * 1_000_000)
        .when(c.between(MIN_TIMESTAMP_SECONDS * 1_000, MAX_TIMESTAMP_SECONDS * 1_000), c * 1_000)
        .when(c.between(MIN_TIMESTAMP_SECONDS * 1_000_000, MAX_TIMESTAMP_SECONDS * 1_000_000), c)
        .when(
            c.between(MIN_TIMESTAMP_SECONDS * 1_000_000_000, MAX_TIMESTAMP_SECONDS * 1_000_000_000),
            F.floor(c / 1_000),
        )
        .otherwise(F.lit(None).cast("long"))
    )
    div = {"seconds": 1_000_000, "millis": 1_000, "micros": 1, "nanos": 1}[fast_precision]
    if div > 1:
        micros = F.floor(micros / div) * div
    return F.timestamp_micros(micros.cast("long"))


# Query-bound coercion formats (quickwit-query/src/json_literal.rs:24-38):
# rfc3339, rfc2822, unit-inferred unix timestamp, then the common strptime
# forms — the SAME list and order the reference uses for range/term bounds.
QUERY_BOUND_FORMATS = (
    "rfc3339",
    "rfc2822",
    "unix_timestamp",
    "strptime:%Y-%m-%dT%H:%M:%S",
    "strptime:%Y-%m-%d %H:%M:%S.%f",
    "strptime:%Y-%m-%d %H:%M:%S",
    "strptime:%Y-%m-%d",
    "strptime:%Y/%m/%d",
)


def parse_query_datetime(value):
    """Coerce a query literal (range bound / term value) to a naive-UTC
    datetime with the reference's lenient format list. Raises ValueError on
    garbage — the same hard error the reference returns for unparsable
    bounds."""
    s = pd.Series([str(value)])
    nanos, errs = coerce_timestamp_pandas(
        s, input_formats=QUERY_BOUND_FORMATS, fast_precision="nanos"
    )
    if errs[0] is not None:
        raise ValueError(errs[0])
    return pd.Timestamp(int(nanos[0]), unit="ns", tz="UTC").tz_localize(None).to_pydatetime()
