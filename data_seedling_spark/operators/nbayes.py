"""In-engine multinomial Naive Bayes (train + score, closed form).

Third member of the supervised/unsupervised trainer family (k-means
and PQ codebooks in ``operators.similarity``, batch-GD logistic
regression in ``operators.logreg``): the classic one-pass text
classifier — language ID, source attribution, topic routing — trained
ON the corpus INSIDE the engine with no iteration at all. Training is
two grouped counts (class-conditional token counts, class totals);
the model is a vocab×classes table small enough to broadcast; scoring
is one explode + one broadcast-ish join + one grouped decimal sum.

Determinism contract (hash-comparable against a DuckDB oracle):

- Smoothed log-likelihoods ``ln((c_tk + α)/(c_t + αV))`` and log
  priors are **rounded to the 1e-6 grid and cast to decimal** the
  moment they are computed. Per-value doubles are IEEE-identical in
  both engines and the rounding sits far above ulp noise.
- Per-document scores are ``Σ count_in_doc × log_cond`` summed **in
  exact decimal**, so the total is independent of Spark's partial-agg
  accumulation order vs DuckDB's scan order.
- The argmax class is tie-broken by class value ascending.

Scale: token-keyed shuffles only (the text never moves after the
explode); the model table is O(vocab × classes) rows; unseen
(class, token) pairs fall back to the per-class smoothing default via
``coalesce`` after a left join, so the score join never needs the
vocab×classes dense cross product. Vocabulary size enters the plan as
a 1-row broadcast aggregate — no driver-side action.

Reference scope: the reference engine ships no trainer; this extends
its curation surface (SURVEY §2 UD3 config-dispatch transforms) with
the standard fastText/CCNet-style learned corpus classifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG_GRID = "decimal(18,6)"
_SUM_GRID = "decimal(28,6)"


def _tokens(df: DataFrame, text_col: str, extra_cols: list[str]) -> DataFrame:
    return df.select(
        *extra_cols, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")


def nb_train(
    df: DataFrame, text_col: str, label_col: str, alpha: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB: returns ``(cond, priors)``.

    ``cond``: (label, tok, log_cond decimal) — smoothed per-class token
    log-likelihoods. ``priors``: (label, log_prior decimal, log_unseen
    decimal) where ``log_unseen`` is the smoothing floor a token never
    seen with that class scores (the coalesce default at scoring time).
    """
    toks = _tokens(df, text_col, [label_col])
    class_tok = toks.groupBy(label_col, "tok").agg(F.count("*").alias("_ctk"))
    class_tot = toks.groupBy(label_col).agg(F.count("*").alias("_ct"))
    vocab = toks.agg(F.countDistinct("tok").alias("_v"))
    n_docs = df.agg(F.count("*").alias("_n"))

    denom = F.col("_ct") + F.lit(alpha) * F.col("_v")
    cond = (
        class_tok.join(class_tot, label_col)
        .crossJoin(F.broadcast(vocab))
        .select(
            label_col,
            "tok",
            F.round(F.log((F.col("_ctk") + F.lit(alpha)) / denom), 6)
            .cast(_LOG_GRID)
            .alias("log_cond"),
        )
    )
    priors = (
        df.groupBy(label_col)
        .agg(F.count("*").alias("_nc"))
        .crossJoin(F.broadcast(n_docs))
        .join(class_tot, label_col)
        .crossJoin(F.broadcast(vocab))
        .select(
            label_col,
            F.round(F.log(F.col("_nc") / F.col("_n")), 6)
            .cast(_LOG_GRID)
            .alias("log_prior"),
            F.round(F.log(F.lit(alpha) / denom), 6)
            .cast(_LOG_GRID)
            .alias("log_unseen"),
        )
    )
    return cond, priors


def nb_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    cond: DataFrame,
    priors: DataFrame,
    label_col: str,
) -> DataFrame:
    """Score every document against every class and keep the argmax.

    Per-doc token counts fan out ×classes (a handful of rows per
    token), left-join the model, coalesce unseen pairs to the class
    smoothing floor, and sum in exact decimal. Output: (id, predicted,
    score) with score the winning class's posterior log-score as
    double.
    """
    doc_tok = (
        _tokens(df, text_col, [id_col])
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("_c"))
    )
    fan = doc_tok.join(F.broadcast(priors), how="cross").join(
        F.broadcast(cond), [label_col, "tok"], "left"
    )
    scored = (
        fan.select(
            id_col,
            label_col,
            "log_prior",
            (
                F.col("_c")
                * F.coalesce(F.col("log_cond"), F.col("log_unseen"))
            )
            .cast(_SUM_GRID)
            .alias("_term"),
        )
        .groupBy(id_col, label_col, "log_prior")
        .agg(F.sum("_term").alias("_s"))
        .select(
            id_col,
            label_col,
            (F.col("_s") + F.col("log_prior")).cast(_SUM_GRID).alias("_score"),
        )
    )
    # Argmax with (score DESC, label ASC) tie-break: max score per doc,
    # then min label among classes achieving it — exact decimal
    # equality, no float compare, no window over the full fan-out.
    top = scored.groupBy(id_col).agg(F.max("_score").alias("_score"))
    return (
        scored.join(top, [id_col, "_score"])
        .groupBy(id_col, "_score")
        .agg(F.min(label_col).alias("predicted"))
        .select(
            id_col,
            "predicted",
            F.col("_score").cast("double").alias("score"),
        )
    )
