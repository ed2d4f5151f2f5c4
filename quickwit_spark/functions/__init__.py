from quickwit_spark.functions.datetime import (
    MAX_TIMESTAMP_SECONDS,
    MIN_TIMESTAMP_SECONDS,
    coerce_timestamp_int_col,
    coerce_timestamp_pandas,
)

__all__ = [
    "MIN_TIMESTAMP_SECONDS",
    "MAX_TIMESTAMP_SECONDS",
    "coerce_timestamp_pandas",
    "coerce_timestamp_int_col",
]
