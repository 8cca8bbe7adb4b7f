"""In-engine logistic-regression training (batch gradient descent).

The supervised sibling of the unsupervised trainers in
``operators.similarity`` (k-means, PQ codebooks): the quality
classifier every curation pipeline eventually needs — "train a small
model ON the corpus, INSIDE the engine, then score the corpus with a
pure projection" — without leaving the DataFrame layer.

Determinism contract (same as the Lloyd's trainer): every model
parameter lives on the 1e-6 decimal grid. Per-iteration gradients are
``round(avg(...), 6)`` and weight updates are ``round(w - lr*g, 6)``
computed IN the plan (Spark ``F.round`` semantics), so an engine
re-deriving the run (the DuckDB oracle, unrolled one CTE pair per
iteration) reproduces the weights bit-exactly: per-row doubles are
IEEE-identical, the avg is rounded far above ulp noise, and literal
weights round-trip exactly through ``repr``.

Scale: one aggregate scan per iteration (map-side partial avg — the
shuffle carries one partial row per partition, not data rows); the
driver holds only the weight vector between iterations, exactly like
MLlib's own GD loop. Scoring is a stateless projection: no shuffle,
no Python.

Reference scope: the reference engine has no in-engine trainer; this
extends its column-policy quality checks (SURVEY §2 P13/A5) with the
standard fastText/CCNet-style learned quality-filter stage used in
LLM corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _z(feature_cols: list[str], weights: list[float]) -> Column:
    """w0 + w1*x1 + ... as an explicit left-associated chain (the same
    evaluation order the SQL oracle writes out)."""
    acc: Column = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        acc = acc + F.lit(float(w)) * F.col(c)
    return acc


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iters: int = 3,
) -> list[float]:
    """Batch-GD fit; returns ``[w0, w1, ...]`` (intercept first), each
    on the 1e-6 grid. One aggregate job per iteration."""
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    ).persist()
    try:
        weights = [0.0] * (len(feature_cols) + 1)
        for _ in range(iters):
            err = _sigmoid(_z(feature_cols, weights)) - F.col("_y")
            grads = [F.round(F.avg(err), 6).alias("g0")] + [
                F.round(F.avg(err * F.col(c)), 6).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ]
            row = (
                feats.agg(*grads)
                .select(
                    *[
                        F.round(
                            F.lit(float(w)) - F.lit(float(lr)) * F.col(f"g{j}"), 6
                        ).alias(f"w{j}")
                        for j, w in enumerate(weights)
                    ]
                )
                .collect()[0]
            )
            weights = [row[f"w{j}"] for j in range(len(weights))]
        return weights
    finally:
        feats.unpersist()


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    threshold: float = 0.5,
) -> DataFrame:
    """Append ``p`` (round 6) and ``predicted`` (0/1) — a pure
    projection over literal weights; no shuffle, no Python."""
    p = F.round(_sigmoid(_z(feature_cols, weights)), 6)
    return df.withColumn("p", p).withColumn(
        "predicted", (F.col("p") >= F.lit(float(threshold))).cast("int")
    )


def logreg_log_loss(
    df: DataFrame, feature_cols: list[str], label_col: str, weights: list[float]
) -> float:
    """Mean negative log-likelihood (clamped), for train-monitoring and
    the loss-decrease property test."""
    p = _sigmoid(_z(feature_cols, weights))
    eps = 1e-12
    y = F.col(label_col).cast("double")
    ll = y * F.log(p + eps) + (1 - y) * F.log(1 - p + eps)
    return df.agg(F.avg(-ll).alias("loss")).collect()[0]["loss"]


def standardize(
    df: DataFrame, cols: list[str], digits: int = 4,
    stats_from: DataFrame | None = None,
) -> tuple[DataFrame, list[str]]:
    """Z-score each feature onto a ``10^-digits`` grid using
    round(avg, 6) / round(stddev_samp, 6) global stats — one tiny
    aggregate job, stats re-enter the plan as literals (the same
    collect-and-inject shape as the Lloyd's loop; GD without
    standardization crawls on unscaled features). ``stats_from``
    computes the stats on a DIFFERENT frame (the train split) while
    transforming ``df`` — the no-leakage hold-out contract: the eval
    rows never contribute to the scaling statistics."""
    stats = (stats_from if stats_from is not None else df).agg(
        *[F.round(F.avg(c), 6).alias(f"m_{c}") for c in cols],
        *[F.round(F.stddev_samp(c), 6).alias(f"s_{c}") for c in cols],
    ).collect()[0]
    out = df
    zcols = []
    for c in cols:
        zc = f"z_{c}"
        out = out.withColumn(
            zc,
            F.round(
                (F.col(c) - F.lit(float(stats[f"m_{c}"])))
                / F.lit(float(stats[f"s_{c}"])),
                digits,
            ),
        )
        zcols.append(zc)
    return out, zcols
