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


def _z_exprs(exprs: list[Column], weights: list[float]) -> Column:
    """``_z`` over arbitrary feature EXPRESSIONS (same left-associated
    chain, so the doubles match the column-based spelling exactly)."""
    acc: Column = F.lit(float(weights[0]))
    for w, e in zip(weights[1:], exprs):
        acc = acc + F.lit(float(w)) * e
    return acc


def logreg_fit_many(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    specs: list[tuple[object, Column | None, float]],
    iters: int,
    digits: int = 4,
) -> dict:
    """Train SEVERAL leak-proof GD models in one aggregate job per
    stage instead of one per model — the grid-search / k-fold shape
    (r14, guide §5: the per-model spelling pays one stats job + one
    job per iteration per model, all tiny scans of the same frame).

    ``specs`` is ``[(key, mask, lr), ...]``: each model trains on the
    rows where its ``mask`` holds (None = all rows), with its own
    learning rate. Per-model standardization statistics
    (``round(avg, 6)`` / ``round(stddev_samp, 6)``, the
    :func:`standardize` grid) and per-iteration gradients evaluate as
    CONDITIONAL aggregates — ``avg(when(mask, x))`` ignores the masked
    rows exactly like aggregating the filtered frame, so every model's
    weights are bit-identical to running ``standardize(stats_from=
    train)`` + :func:`logreg_fit` per model (same 1e-6 rounding, same
    left-associated dot product, same literal round-trips). Returns
    ``{key: (weights, {col: (mean, std)})}`` so callers rebuild the
    identical z-projection for scoring.
    """
    masked = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
        *[
            (F.lit(True) if mask is None else mask.cast("boolean")).alias(
                f"_m{i}"
            )
            for i, (_k, mask, _lr) in enumerate(specs)
        ],
    ).persist()
    try:
        stat_aggs = []
        for i in range(len(specs)):
            m = F.col(f"_m{i}")
            for c in feature_cols:
                x = F.when(m, F.col(c))
                stat_aggs.append(F.round(F.avg(x), 6).alias(f"m_{i}_{c}"))
                stat_aggs.append(
                    F.round(F.stddev_samp(x), 6).alias(f"s_{i}_{c}")
                )
        st = masked.agg(*stat_aggs).collect()[0]
        stats = [
            {
                c: (float(st[f"m_{i}_{c}"]), float(st[f"s_{i}_{c}"]))
                for c in feature_cols
            }
            for i in range(len(specs))
        ]
        zexprs = [
            [
                F.round(
                    (F.col(c) - F.lit(stats[i][c][0]))
                    / F.lit(stats[i][c][1]),
                    digits,
                )
                for c in feature_cols
            ]
            for i in range(len(specs))
        ]
        weights = [[0.0] * (len(feature_cols) + 1) for _ in specs]
        for _ in range(iters):
            grads, updates = [], []
            for i, (_k, _mask, lr) in enumerate(specs):
                m = F.col(f"_m{i}")
                err = _sigmoid(_z_exprs(zexprs[i], weights[i])) - F.col("_y")
                grads.append(
                    F.round(F.avg(F.when(m, err)), 6).alias(f"g{i}_0")
                )
                grads.extend(
                    F.round(F.avg(F.when(m, err * zexprs[i][j])), 6).alias(
                        f"g{i}_{j + 1}"
                    )
                    for j in range(len(feature_cols))
                )
                updates.extend(
                    F.round(
                        F.lit(float(w)) - F.lit(float(lr)) * F.col(f"g{i}_{j}"),
                        6,
                    ).alias(f"w{i}_{j}")
                    for j, w in enumerate(weights[i])
                )
            row = masked.agg(*grads).select(*updates).collect()[0]
            weights = [
                [row[f"w{i}_{j}"] for j in range(len(weights[i]))]
                for i in range(len(specs))
            ]
        return {
            k: (weights[i], stats[i])
            for i, (k, _mask, _lr) in enumerate(specs)
        }
    finally:
        masked.unpersist()


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


def apply_standardize(
    df: DataFrame, stats: dict, digits: int = 4
) -> tuple[DataFrame, list[str]]:
    """Rebuild :func:`standardize`'s z-projection from already-known
    ``{col: (mean, std)}`` stats (e.g. :func:`logreg_fit_many`'s
    return) — identical expressions, no stats job."""
    out = df
    zcols = []
    for c, (m, s) in stats.items():
        zc = f"z_{c}"
        out = out.withColumn(
            zc,
            F.round((F.col(c) - F.lit(float(m))) / F.lit(float(s)), digits),
        )
        zcols.append(zc)
    return out, zcols


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
