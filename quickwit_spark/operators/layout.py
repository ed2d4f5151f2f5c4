"""Data-layout optimization — Z-order (Morton-curve) clustering for
multi-dimension file pruning, the Iceberg/Delta table-maintenance step a
100 TB table needs so 2-D slice queries (time × tenant, service × level)
skip files instead of scanning everything.

Behavioral contract: the reference prunes splits by tag + time-range
metadata (`qw/quickwit-metastore/src/split_metadata.rs` time_range/tags —
our janitor.py split pruning); Z-order generalizes that to ANY pair of
dimensions at the FILE level: rows close in the Morton curve land in the
same files, so each file's per-column min/max bounding box is tight and a
2-D predicate intersects few boxes. (Public technique — Morton 1966,
standard in Iceberg `rewrite_data_files strategy => 'sort', sort_order =>
'zorder(...)'`.)

Everything is pure Column bit-arithmetic (shiftleft / shiftright / &) in
whole-stage codegen — engine-portable, restated bit-for-bit in the driver
gate's DuckDB oracle. The cluster write is ONE repartitionByRange shuffle
(range exchange samples the key distribution) + an in-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale ``col`` from [lo, hi] to an integer cell in [0, 2^bits-1];
    out-of-range values clamp to the edge cells (same rule restated in the
    oracle)."""
    cells = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(1 << bits))
    ).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cells))


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave of pre-quantized integer columns: bit j of
    dimension i lands at position j·d + i of the key. d·bits total key
    bits (d=2, bits=8 → 16-bit key) — an unrolled, branch-free codegen
    expression, no UDF."""
    d = len(cols)
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * d + i)
    return key


def cluster_by_zorder(
    df: DataFrame,
    quantized: list[Column],
    n_partitions: int,
    bits: int = 8,
) -> DataFrame:
    """Cluster rows along the Morton curve: ONE repartitionByRange on the
    key (equi-depth file sizes regardless of skew in any one dimension —
    the range exchange samples the key) + sortWithinPartitions so parquet
    row-group min/max stats are tight. Write the result with
    ``.write.parquet`` and a 2-D predicate prunes at both the file and
    row-group level."""
    keyed = df.withColumn("__zkey", zorder_key(quantized, bits))
    return (
        keyed.repartitionByRange(n_partitions, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def file_bounding_boxes(paths: list[str], dims: list[str]) -> list[dict]:
    """Per-file [min, max] of each dimension from parquet footer stats —
    the metadata a scan planner prunes with. Driver-side (|files| rows);
    used by tests to measure layout quality without scanning data."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        box = {"path": p}
        for d in dims:
            lo, hi = None, None
            ci = names[d]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            box[d] = (lo, hi)
        out.append(box)
    return out
