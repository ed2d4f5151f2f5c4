"""Mergeable probabilistic sketches: HyperLogLog distinct counts, KMV/theta
set-operation sketches, and Count-Min frequency estimation.

This is the sketch plane the reference manages as a first-class split
category — its metastore has a dedicated sketch-split lifecycle
(quickwit-metastore/src/metastore/postgres/metastore.rs:46-52:
StageSketchSplits / PublishSketchSplits / MarkSketchSplitsForDeletion) and a
dedicated merge policy for "Parquet (metrics/sketches) splits"
(quickwit-config/src/merge_policy_config.rs:136). The contract that layout
imposes is the one implemented here: every sketch is a SMALL TABLE OF
MERGEABLE PARTIALS, so sketch splits re-merge under the same compaction
plane as data splits and a dashboard reads |keys| x sketch-size rows
instead of re-scanning 10^12 raw rows. The exact rollup plane
(operators/rollup.py) covers cnt/sum/min/max/quantile; these sketches cover
the aggregates that have NO bounded exact partial — distinct counts
(HLL), set union/intersection/Jaccard across sinks (KMV), and per-item
frequencies / heavy hitters (Count-Min).

All hashing is engine-portable integer arithmetic (no xxhash), so every
estimator here is restatable verbatim in ANSI SQL and the DuckDB oracle
checks the sketch ARITHMETIC end-to-end, not just row counts. KMV and CMS
use the Lehmer streams from operators/corpus.py — their estimators need
only coarse-scale uniformity (order statistics / bucket counts), which the
prime-modulus lattice delivers to <1%. HLL does NOT: its rho tail needs the
hash to land in dyadic intervals [0, 2^-r) at exactly geometric rates, and
a multiplicative-congruential lattice visits those narrow intervals too
regularly (measured 20-80% estimate error across input patterns). HLL
therefore uses hll_mix — a 31-bit xorshift-multiply finalizer (the degski /
T. Mueller 32-bit construction restricted to 2^31) built from ops both
engines share (&, >>, xor, int64-safe multiply) — measured within +-7%
(= 1 sigma at m=256) on sequential / strided / string-hash inputs. Nothing
in this module uses a Python UDF: builds are one map-side-combined groupBy
over the raw scan, merges are groupBy over sketch rows, estimates are
Column arithmetic over |keys| x m rows.

Scale shape at 10^12 rows: hll_build's shuffle carries at most
|keys| x m register rows out of the map-side combine (m = 2^p, default
256); cms_build carries |keys| x depth x width counter rows; kmv_build is
the only one whose shuffle is data-dependent (a distinct over (keys, hash)
— identical to what any exact distinct would shuffle) but its OUTPUT is k
rows per key, so downstream set algebra never touches raw data again.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .corpus import _MIX_A1, _MIX_A2, _MIX_M1, _MIX_M2

# Hash space of the combined (k3, k2) value — injective for distinct inputs
# below M1*M2 (see corpus.py: (k3 mod M1, k2) determines k1, and (k1, k2) is
# injective), i.e. a collision-free 62-bit hash for int64 items.
KMV_SPACE = _MIX_M1 * _MIX_M2


def mix_cols(item: Column):
    """(k1, k2, k3) Lehmer-stream mix Columns for an int64 item Column —
    the Column-input twin of corpus.sample_mix_cols (which takes a column
    name). k3 is uniform-ish on [0, M1); (k3, k2) is collision-free below
    M1*M2 ≈ 4.6e18."""
    c = item.cast("long")
    k1 = (c % _MIX_M1 + 1) * _MIX_A1 % _MIX_M1
    k2 = (c % _MIX_M2 + 1) * _MIX_A2 % _MIX_M2
    k3 = ((F.lit(_MIX_M1 - 18) * k1 + k2) % _MIX_M1 + 1) * _MIX_A1 % _MIX_M1
    return k1, k2, k3


def portable_string_hash(col: Column) -> Column:
    """Full-string polynomial hash as a pure Column expression (long in
    [0, M1)): fold (acc*31 + codepoint) % M1 over every character via
    F.aggregate — stays in codegen, no UDF, and restates in DuckDB as
    list_reduce over string_split. Unlike classifier.hash_token_col (a
    fixed-prefix hash tuned for token buckets) this reads the WHOLE string,
    so ids sharing long prefixes ("conv_00001…") still spread uniformly."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(_MIX_M1),
    )


def portable_string_hash_sql(expr: str) -> str:
    """The DuckDB restatement of :func:`portable_string_hash`."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(a, b) -> (a * 31 + b) % {_MIX_M1})"
    )


# --- HyperLogLog ----------------------------------------------------------
#
# Flajolet et al. 2007 layout over the 31-bit hll_mix hash: the low p bits
# pick the register, the remaining q = 31 - p bits w contribute
# rho = (leading zeros of w within q bits) + 1. rho is computed with a
# fixed chain of integer comparisons against powers of two — deliberately
# NOT floor(log2(w)), so no engine's libm is in the loop and the DuckDB
# oracle reproduces registers bit-exactly.

HLL_DEFAULT_P = 8
HLL_MIX_C = 0x45D9F3B  # 73244475: odd multiplier of the degski 32-bit hash
_MASK31 = (1 << 31) - 1  # x & _MASK31 == x mod 2^31 for x >= 0


def hll_mix(item: Column) -> Column:
    """31-bit xorshift-multiply finalizer: fold the int64's high bits in,
    then three rounds of (h * C) mod 2^31 ; h ^= h >> 16. Every operand
    stays < 2^31, so products are < 2^62 — no int64 overflow in Spark
    (ANSI-safe) or DuckDB. Requires item >= 0 (all callers feed ids or
    [0, M1) string hashes)."""
    x = item.cast("long")
    h = x.bitwiseXOR(F.shiftright(x, 31)).bitwiseAND(F.lit(_MASK31))
    for _ in range(3):
        h = (h * F.lit(HLL_MIX_C)).bitwiseAND(F.lit(_MASK31))
        h = h.bitwiseXOR(F.shiftright(h, 16))
    return h


def hll_mix_sql(expr: str) -> str:
    """DuckDB restatement of :func:`hll_mix` (xor() function — DuckDB's ^
    is exponentiation)."""
    h = f"(xor(({expr})::BIGINT, (({expr})::BIGINT >> 31)) & {_MASK31})"
    for _ in range(3):
        t = f"((({h}) * {HLL_MIX_C}) & {_MASK31})"
        h = f"xor({t}, ({t}) >> 16)"
    return h


def _hll_q(p: int) -> int:
    # k3 < 2^31, so after dividing off the p register bits the value part
    # has q = 31 - p usable bits.
    return 31 - p


def _rho_col(w: Column, q: int) -> Column:
    expr = F.lit(q + 1)  # w == 0: all q bits are zero
    for r in range(q, 0, -1):
        # w >= 2^(q-r)  <=>  bit (q-r) or higher is set  <=>  rho <= r
        expr = F.when(w >= F.lit(1 << (q - r)), F.lit(r)).otherwise(expr)
    return expr


def rho_sql(expr: str, q: int) -> str:
    """DuckDB restatement of the rho comparison chain."""
    cases = " ".join(
        f"WHEN {expr} >= {1 << (q - r)} THEN {r}" for r in range(1, q + 1)
    )
    return f"(CASE {cases} ELSE {q + 1} END)"


def hll_build(
    df: DataFrame,
    keys: list[str],
    item: Column,
    p: int = HLL_DEFAULT_P,
) -> DataFrame:
    """ONE pass over raw data → HLL registers per key group:
    (keys..., reg, rho). The groupBy is map-side combined, so the shuffle
    carries at most |keys| x 2^p rows regardless of raw volume. Absent
    (key, reg) rows mean an empty register — the estimate accounts for
    them, so partials stay sparse."""
    q = _hll_q(p)
    m = 1 << p
    h = hll_mix(item)
    reg = (h % m).cast("int").alias("reg")
    rho = _rho_col(F.floor(h / m).cast("long"), q).alias("_rho")
    return (
        df.select(*keys, reg, rho)
        .groupBy(*keys, "reg")
        .agg(F.max("_rho").cast("int").alias("rho"))
    )


def hll_merge(sketch: DataFrame, keys: list[str]) -> DataFrame:
    """Re-merge registers across appends / to a key subset — max is the
    HLL merge operator, so this is exactly the sketch-split compaction the
    reference's sketch merge policy schedules."""
    return sketch.groupBy(*keys, "reg").agg(F.max("rho").cast("int").alias("rho"))


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    sketch: DataFrame, keys: list[str], p: int = HLL_DEFAULT_P
) -> DataFrame:
    """Registers → per-key estimate. Emits the exact-integer evidence
    (v_empty, s_scaled = sum 2^(q+1-rho) over present registers) alongside
    the rounded estimate, so cross-engine comparison is anchored on
    integers and only the final literal arithmetic is floating point.
    Small-range (linear counting) correction per the HLL paper; the 32-bit
    large-range correction is irrelevant here (31-bit hash space, estimates
    that large need a bigger p anyway)."""
    q = _hll_q(p)
    m = 1 << p
    alpha = _hll_alpha(m)
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("_n_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(q + 1) - F.col("rho")))
        .cast("long")
        .alias("s_scaled"),
    )
    v = (F.lit(m) - F.col("_n_regs")).cast("long")
    denom = v.cast("double") + F.col("s_scaled") / F.lit(float(1 << (q + 1)))
    e_raw = F.lit(alpha * m * m) / denom
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *keys,
        v.alias("v_empty"),
        F.col("s_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_estimate_sql(
    from_expr: str, keys: list[str], p: int = HLL_DEFAULT_P
) -> str:
    """DuckDB restatement of :func:`hll_estimate` over a register relation
    (columns keys..., reg, rho)."""
    q = _hll_q(p)
    m = 1 << p
    alpha = _hll_alpha(m)
    ks = ", ".join(keys)
    sel_keys = f"{ks}, " if keys else ""
    grp = f"GROUP BY {ks}" if keys else ""
    return f"""
        WITH regs AS ({from_expr}),
        a AS (
          SELECT {sel_keys}count(*)::BIGINT AS n_regs,
                 sum((2 ** ({q + 1} - rho))::BIGINT)::BIGINT AS s_scaled
          FROM regs {grp}
        )
        SELECT {sel_keys}({m} - n_regs)::BIGINT AS v_empty, s_scaled,
               round(CASE WHEN ({alpha!r}::DOUBLE) * {m * m} /
                          (({m} - n_regs)::DOUBLE + s_scaled / {float(1 << (q + 1))!r})
                          <= {2.5 * m!r} AND {m} - n_regs > 0
                     THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_regs)::DOUBLE)
                     ELSE ({alpha!r}::DOUBLE) * {m * m} /
                          (({m} - n_regs)::DOUBLE + s_scaled / {float(1 << (q + 1))!r})
                     END, 4) AS est_distinct
        FROM a
    """


def hll_register_sql(item_expr: str, p: int = HLL_DEFAULT_P) -> tuple[str, str]:
    """(reg_expr, rho_expr) DuckDB restatement of hll_build's per-row
    register math over an int64 item expression."""
    q = _hll_q(p)
    m = 1 << p
    h = hll_mix_sql(item_expr)
    return f"({h}) % {m}", rho_sql(f"(({h}) // {m})", q)


def _mix_k3_sql(item_expr: str) -> str:
    """DuckDB restatement of mix_cols(...)[2] (k3)."""
    k1 = f"(({item_expr}) % {_MIX_M1} + 1) * {_MIX_A1} % {_MIX_M1}"
    k2 = f"(({item_expr}) % {_MIX_M2} + 1) * {_MIX_A2} % {_MIX_M2}"
    return (
        f"(({_MIX_M1 - 18} * ({k1}) + ({k2})) % {_MIX_M1} + 1)"
        f" * {_MIX_A1} % {_MIX_M1}"
    )


def mix_hash_sql(item_expr: str) -> str:
    """DuckDB restatement of :func:`kmv_hash` (the 62-bit combined hash)."""
    k2 = f"(({item_expr}) % {_MIX_M2} + 1) * {_MIX_A2} % {_MIX_M2}"
    return f"(({_mix_k3_sql(item_expr)}) * {_MIX_M2} + ({k2}))"


# --- KMV (k-minimum-values / bottom-k theta sketch) -----------------------
#
# Beyer et al. 2007 / the theta-sketch family: keep the k smallest hash
# values of the distinct item set. Union = merge-and-recut; the kth
# smallest value estimates the distinct count as (k-1) * SPACE / h_(k);
# Jaccard is estimated on the union's bottom-k, giving intersection
# cardinality without ever intersecting the raw sets — the cross-sink
# "how many users appear in BOTH indexes" question at 10^12 scale.


def kmv_hash(item: Column) -> Column:
    """Collision-free (below M1*M2) 62-bit hash used by the KMV sketch."""
    _, k2, k3 = mix_cols(item)
    return (k3 * _MIX_M2 + k2).cast("long")


def kmv_build(df: DataFrame, keys: list[str], item: Column, k: int = 64) -> DataFrame:
    """Bottom-k distinct hashes per key group: (keys..., kmv_h). The
    distinct is the only data-sized shuffle (identical to exact
    count-distinct's); the rank cut bounds output to k rows per key."""
    from pyspark.sql import Window

    h = kmv_hash(item).alias("kmv_h")
    distinct = df.select(*keys, h).distinct()
    w = Window.partitionBy(*keys).orderBy("kmv_h")
    return (
        distinct.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_merge(a: DataFrame, b: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """Union two sketches and re-cut to bottom-k — the KMV merge operator
    (sketch rows only; raw data never re-read)."""
    from pyspark.sql import Window

    u = a.unionByName(b).distinct()
    w = Window.partitionBy(*keys).orderBy("kmv_h")
    return (
        u.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate(sketch: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """(keys..., n_vals, h_k, est_distinct). A sketch holding fewer than k
    hashes IS the whole distinct set (collision-free hash), so the estimate
    degrades to exact there."""
    agg = sketch.groupBy(*keys) if keys else sketch.groupBy()
    out = agg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vals"),
        F.max("kmv_h").alias("h_k"),
    )
    est = F.when(F.col("n_vals") < k, F.col("n_vals").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / F.col("h_k").cast("double")
    )
    return out.select(*keys, "n_vals", "h_k", F.round(est, 4).alias("est_distinct"))


def kmv_set_ops(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Single-row set algebra over two keyless sketches: union estimate,
    bottom-k Jaccard, intersection estimate (J x union). Sketch-sized
    compute — independent of raw cardinalities."""
    from pyspark.sql import Window

    ua = a.select("kmv_h", F.lit(1).alias("_in_a"), F.lit(0).alias("_in_b"))
    ub = b.select("kmv_h", F.lit(0).alias("_in_a"), F.lit(1).alias("_in_b"))
    u = (
        ua.unionByName(ub)
        .groupBy("kmv_h")
        .agg(F.max("_in_a").alias("in_a"), F.max("_in_b").alias("in_b"))
    )
    w = Window.orderBy("kmv_h")
    cut = u.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    agg = cut.agg(
        F.count(F.lit(1)).cast("long").alias("n_vals"),
        F.max("kmv_h").alias("h_k"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_vals") < k, F.col("n_vals").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / F.col("h_k").cast("double")
    )
    jacc = F.col("n_both") / F.col("n_vals")
    return agg.select(
        "n_vals",
        "h_k",
        "n_both",
        F.round(union_est, 4).alias("union_est"),
        F.round(jacc, 6).alias("jaccard_est"),
        F.round(jacc * union_est, 4).alias("intersect_est"),
    )


# --- Count-Min sketch -----------------------------------------------------
#
# Cormode & Muthukrishnan 2005: depth x width counter matrix, one pairwise-
# independent hash row each; point estimate = min over rows, always >= the
# true count. Entirely integer arithmetic — the oracle is bit-exact.

# Fixed per-row hash constants (a_j, b_j) for h_j(x) = ((a_j*x + b_j) % M1) % width.
_CMS_A = (48271, 16807, 69621, 40692, 10007, 65539)
_CMS_B = (12345, 67891, 24680, 13579, 86420, 97531)
CMS_MAX_DEPTH = len(_CMS_A)


def _cms_col(item: Column, j: int, width: int) -> Column:
    x = item.cast("long") % _MIX_M1
    return ((F.lit(_CMS_A[j]) * x + F.lit(_CMS_B[j])) % _MIX_M1 % width).cast("int")


def cms_col_sql(item_expr: str, j: int, width: int) -> str:
    """DuckDB restatement of one CMS row hash."""
    return (
        f"(({_CMS_A[j]} * (({item_expr}) % {_MIX_M1}) + {_CMS_B[j]})"
        f" % {_MIX_M1} % {width})"
    )


def cms_build(
    df: DataFrame,
    item: Column,
    depth: int = 4,
    width: int = 512,
    weight: Column | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """ONE pass over raw data → counters (keys..., d, col, cnt). Each row
    contributes `depth` (d, col) pairs via an inline array+posexplode (no
    Python); the groupBy map-side combines, so the shuffle is bounded by
    |keys| x depth x width counter rows."""
    if depth > CMS_MAX_DEPTH:
        raise ValueError(f"depth <= {CMS_MAX_DEPTH}")
    keys = keys or []
    w = (weight if weight is not None else F.lit(1)).cast("long")
    cols = F.array(*[_cms_col(item, j, width) for j in range(depth)])
    rows = df.select(*keys, F.posexplode(cols).alias("d", "col"), w.alias("_w"))
    return rows.groupBy(*keys, "d", "col").agg(F.sum("_w").alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Counter-wise sum — the CMS merge operator."""
    keys = keys or []
    return (
        a.unionByName(b)
        .groupBy(*keys, "d", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point estimates for a candidate item frame: each candidate expands
    to its depth (d, col) probes, joins the sketch (broadcast if small),
    min over rows. Missing counters count as 0. est_count >= true count
    always (CMS one-sided guarantee)."""
    if depth > CMS_MAX_DEPTH:
        raise ValueError(f"depth <= {CMS_MAX_DEPTH}")
    keys = keys or []
    cols = F.array(*[_cms_col(F.col(item_col), j, width) for j in range(depth)])
    probes = items.select(
        *keys, item_col, F.posexplode(cols).alias("d", "col")
    )
    joined = probes.join(sketch, [*keys, "d", "col"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(*keys, item_col).agg(
        F.min("cnt").cast("long").alias("est_count")
    )


__all__ = [
    "mix_cols",
    "portable_string_hash",
    "portable_string_hash_sql",
    "hll_mix",
    "hll_mix_sql",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "hll_estimate_sql",
    "hll_register_sql",
    "mix_hash_sql",
    "kmv_hash",
    "kmv_build",
    "kmv_merge",
    "kmv_estimate",
    "kmv_set_ops",
    "cms_build",
    "cms_merge",
    "cms_query",
    "cms_col_sql",
    "KMV_SPACE",
    "CMS_MAX_DEPTH",
    "HLL_DEFAULT_P",
]
