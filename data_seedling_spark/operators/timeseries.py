"""Time-series operators beyond windowed aggregation: value
reconstruction over densified grids.

Composes with the gap-fill pattern (sequence+explode dense grid, left
join facts): gap filling makes missing buckets EXPLICIT; interpolation
makes them USABLE for forecasting/monitoring consumers that cannot
tolerate nulls or zero-spikes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    out_col: str = "interp_value",
) -> DataFrame:
    """Linear interpolation of null gaps per series: for a missing
    point, draw the line between the nearest known values before and
    after it (in ``t_col`` order); leading/trailing gaps clamp to the
    nearest known value; known points pass through untouched.

    Declarative formulation — two frame-bounded windows per series
    (``last ignorenulls`` backward, ``first ignorenulls`` forward), no
    Python, no self-join. The interpolated double rounds to the 1e-6
    grid (engine-portable); at corpus scale each series' window state
    is one (value, t) pair, and series partition across executors.
    """
    v, t = F.col(value_col), F.col(t_col)
    w_prev = (
        W.partitionBy(key_col).orderBy(t_col).rowsBetween(W.unboundedPreceding, 0)
    )
    # The forward-looking neighbour is expressed as a DESCENDING
    # running frame, not ``rowsBetween(0, unboundedFollowing)``:
    # Spark's UnboundedFollowingWindowFunctionFrame re-scans from the
    # current row to the partition end FOR EVERY ROW — O(n²) per
    # series (measured: the hourly-grid interpolation went 0.04 s →
    # 4 s for 10× rows). ``last ignorenulls`` over the reversed
    # running frame is the identical value with the O(n) running
    # implementation both directions.
    w_next = (
        W.partitionBy(key_col)
        .orderBy(F.col(t_col).desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_prev)
    next_v = F.last(v, ignorenulls=True).over(w_next)
    next_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_next)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    # Interpolated doubles routinely land ON the half-ulp rounding
    # boundary (grid inputs × rational ratios), where engine round()
    # implementations legitimately disagree. floor(x·1e6 + 0.5)/1e6 is
    # the same three IEEE ops everywhere — deterministic half-up
    # (toward +inf) on any engine.
    rounded = F.floor(interp * 1e6 + F.lit(0.5)) / 1e6
    out = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(rounded)
    )
    return df.withColumn(out_col, out)
