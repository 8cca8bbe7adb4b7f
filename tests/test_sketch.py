"""KLL-twin sketch: weight conservation, determinism, rank-error
bound, and mergeability shape (tests/test_llm_ops.py is the model:
property floors asserted in pytest, hash equality left to the oracle
gate)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_seedling_spark.operators.sketch import (
    kll_compact_round,
    kll_quantiles,
    kll_sketch,
)


def _uniform_df(spark, n: int, seed: int = 7):
    rng = random.Random(seed)
    vals = list(range(n))
    rng.shuffle(vals)
    rows = [(float(v) * 3.0 + 100.0, i) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "x double, id long")


def test_sketch_conserves_total_weight(spark):
    n = 1000
    sk = kll_sketch(_uniform_df(spark, n), "x", "id", rounds=4, bucket_width=97.0)
    agg = sk.agg(F.sum("w").alias("tw"), F.count("*").alias("k")).collect()[0]
    assert agg["tw"] == n
    # ~n/2^4 survivors plus at most one straggler per level
    assert agg["k"] <= n // 16 + 4 + 1


def test_sketch_is_deterministic_and_order_independent(spark):
    df = _uniform_df(spark, 500)
    a = sorted(kll_sketch(df, "x", "id", rounds=3).collect())
    b = sorted(
        kll_sketch(df.orderBy(F.rand(seed=1)).repartition(7), "x", "id", rounds=3)
        .collect()
    )
    assert a == b


def test_sketch_rank_error_within_kll_bound(spark):
    """Level-l compaction perturbs a rank query by <= 2^l/2, so R
    rounds bound the error by sum_{l<R} 2^l/2 < 2^(R-1); add the 2^R
    survivor-weight granularity. R=5 over n=4096 -> bound 48."""
    n, rounds = 4096, 5
    df = _uniform_df(spark, n)
    sk = kll_sketch(df, "x", "id", rounds=rounds, bucket_width=256.0)
    probs = [0.1, 0.25, 0.5, 0.75, 0.9]
    out = {r["prob"]: r["est"] for r in kll_quantiles(sk, probs).collect()}
    bound = 2 ** rounds + 2 ** (rounds - 1)
    for p in probs:
        # values are 100 + 3*rank, so exact rank of the estimate is
        # recoverable in closed form
        est_rank = (out[p] - 100.0) / 3.0 + 1
        target = p * n
        assert abs(est_rank - target) <= bound, (p, est_rank, target)


def test_shard_merge_conserves_weight_and_bounds_error(spark):
    n = 2048
    df = _uniform_df(spark, n).withColumn("shard", F.col("id") % 2)
    cur = df.select(
        "shard", F.col("x").alias("v"), "id", F.lit(1).cast("long").alias("w")
    )
    for _ in range(4):
        cur = kll_compact_round(
            cur, "v", "id", "w", bucket_width=256.0, extra_part=("shard",)
        ).localCheckpoint()
    merged = cur.select("v", "id", "w")
    merged = kll_compact_round(merged, "v", "id", "w", bucket_width=256.0)
    assert merged.agg(F.sum("w")).collect()[0][0] == n
    out = {r["prob"]: r["est"] for r in kll_quantiles(merged, [0.5]).collect()}
    est_rank = (out[0.5] - 100.0) / 3.0 + 1
    # shard phase (4 rounds) + merge round: error < 2^4 + 2^5 granularity
    assert abs(est_rank - 0.5 * n) <= 2 ** 5 + 2 ** 4


def test_materialized_sketch_incremental_maintenance(spark, tmp_path):
    """Sketch-as-matview protocol: each refresh folds exactly the new
    source versions, weight stays conserved (= rows ingested so far),
    the applied-hi marker makes replays no-ops, and a delete in the
    feed raises (rank sketches have no delete inverse)."""
    import pytest

    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.operators.merge import CHANGE_TYPE, CT_DELETE
    from data_seedling_spark.operators.sketch import MaterializedSketch

    df = _uniform_df(spark, 900)
    src = VersionedTable(spark, str(tmp_path / "src"), write_partitions=2)
    ms = MaterializedSketch(
        spark,
        VersionedTable(spark, str(tmp_path / "sk"), write_partitions=1),
        value_col="x",
        id_col="id",
        inc_rounds=3,
        merge_rounds=2,
        bucket_width=97.0,
    )
    src.write(df.where(F.col("id") % 3 == 0), mode="overwrite")
    assert ms.refresh(src) == (0, 0)
    assert ms.table.read().agg(F.sum("w")).collect()[0][0] == 300

    src.write(df.where(F.col("id") % 3 == 1), mode="append")
    assert ms.refresh(src) == (1, 1)
    assert ms.table.read().agg(F.sum("w")).collect()[0][0] == 600
    # survivors shrink geometrically, not linearly with ingested rows
    assert ms.table.read().count() < 600 // 4

    lo, hi = ms.refresh(src)
    assert lo > hi  # replay no-op

    # quantile sanity on the maintained sketch: uniform 100..~2800,
    # p50 estimate within the KLL bound of the true median. 5 total
    # weight-doubling rounds (3 inc + 2 merge) bound rank error by
    # 2^(R-1) perturbation + 2^R representation granularity = 48
    # ranks; values are spaced 3.0 apart.
    est = {r["prob"]: r["est"] for r in ms.quantiles([0.5]).collect()}
    true_median = sorted(
        r["x"] for r in df.where(F.col("id") % 3 < 2).collect()
    )[300]
    assert abs(est[0.5] - true_median) <= 3.0 * (2 ** 4 + 2 ** 5)

    # insert-only guard: a delete in the feed must raise
    src.merge(
        df.where(F.col("id") % 9 == 0)
        .limit(5)
        .withColumn(CHANGE_TYPE, F.lit(CT_DELETE)),
        primary_keys=["id"],
    )
    with pytest.raises(ValueError, match="insert-only"):
        ms.refresh(src)


def test_weighted_sketch_conserves_weight_and_bounds_weighted_rank(spark):
    """Binary weight decomposition conserves total weight exactly, and
    the weighted-median estimate lands within the KLL rank bound of
    the true weighted median (weights = value in integer units, the
    revenue-weighted shape)."""
    from data_seedling_spark.operators.sketch import (
        kll_quantiles,
        kll_weighted_sketch,
    )

    n = 800
    df = _uniform_df(spark, n).withColumn(
        "wt", (F.col("x") * 10).cast("long")
    )
    rows = sorted((r["x"], r["wt"]) for r in df.collect())
    total = sum(w for _, w in rows)

    sk = kll_weighted_sketch(
        df, "x", "id", "wt", rounds=5, bucket_width=97.0, weight_mode="bits"
    )
    agg = sk.agg(F.sum("w").alias("tw"), F.count("*").alias("k")).collect()[0]
    assert agg["tw"] == total         # exact conservation through bits
    assert agg["k"] < n               # compacted below the row count

    est = {
        r["prob"]: (r["est"], r["total_weight"])
        for r in kll_quantiles(sk, [0.5]).collect()
    }
    assert est[0.5][1] == total
    # true weighted median: smallest x with cumulative weight >= total/2
    acc = 0
    for x, w in rows:
        acc += w
        if acc >= total / 2:
            true_med = x
            break
    # rank error in WEIGHT units: 5 rounds of compaction at growing
    # level weights; the heaviest levels hold ~x*10 <= 3e4-unit items,
    # so allow a generous weight-rank slack converted through the
    # local density (~total/n weight per value step of 3.0)
    slack_values = 64 * 3.0
    assert abs(est[0.5][0] - true_med) <= slack_values, (est, true_med)


def test_weighted_sketch_round_mode_unbiased_and_accurate(spark):
    """The default ``weight_mode="round"`` path (r12, VERDICT r11 #1):
    one item per row via stochastic power-of-two rounding. Total mass
    is no longer exact but the md5-coin rounding is unbiased, so the
    sketched total lands within a few percent of the true mass and the
    weighted-median estimate stays within the compaction + rounding
    slack of the true weighted median. Also deterministic: same input
    set -> same survivors (the coin is md5-of-id, not RNG)."""
    from data_seedling_spark.operators.sketch import (
        kll_quantiles,
        kll_weighted_sketch,
    )

    n = 800
    df = _uniform_df(spark, n).withColumn(
        "wt", (F.col("x") * 10).cast("long")
    )
    rows = sorted((r["x"], r["wt"]) for r in df.collect())
    total = sum(w for _, w in rows)

    sk = kll_weighted_sketch(df, "x", "id", "wt", rounds=5, bucket_width=97.0)
    agg = sk.agg(F.sum("w").alias("tw"), F.count("*").alias("k")).collect()[0]
    # unbiased rounding: per-row error is zero-mean and < w, so the
    # total concentrates — sd <= sqrt(n) * max_w / 2 ~ 3% here
    assert abs(agg["tw"] - total) / total < 0.10, (agg["tw"], total)
    assert agg["k"] < n               # compacted below the row count

    # deterministic replay: identical survivor set on a rebuild from a
    # shuffled/repartitioned copy of the same rows
    sk2 = kll_weighted_sketch(
        df.orderBy(F.rand(seed=3)).repartition(5), "x", "id", "wt",
        rounds=5, bucket_width=97.0,
    )
    assert sorted(sk.collect()) == sorted(sk2.collect())

    est = {
        r["prob"]: r["est"]
        for r in kll_quantiles(sk, [0.5]).collect()
    }
    acc = 0
    for x, w in rows:
        acc += w
        if acc >= total / 2:
            true_med = x
            break
    # compaction slack (as the bits-mode test) plus the stochastic
    # rounding's zero-mean rank perturbation (~sqrt(n)*avg_w weight
    # units through the local density ~w(x)/3 per value unit)
    assert abs(est[0.5] - true_med) <= 350.0, (est, true_med)


def test_decayed_weights_shift_quantiles_toward_recent(spark):
    """Time-decay as a weighted sketch: old rows carry LOW values at
    weight 1, recent rows HIGH values at weight 2^7 — the decayed
    median must land in the recent (high) half while the unweighted
    median stays at the global midpoint, and total weight is conserved
    through the power-of-two decomposition."""
    from data_seedling_spark.operators.sketch import kll_weighted_sketch

    n = 600
    # ids 0..n/2: "old" (value 0..900 step 3, weight 1);
    # ids n/2..n: "recent" (value 3000..3900, weight 128)
    rows = [
        (float(i * 3), i, 1 if i < n // 2 else 128)
        for i in range(n)
    ]
    rows = [
        (v if w == 1 else v + 2100.0, i, w) for (v, i, w) in rows
    ]
    df = spark.createDataFrame(rows, "x double, id long, wt long")

    sk = kll_weighted_sketch(df, "x", "id", "wt", rounds=4, bucket_width=97.0)
    total = (n // 2) * 1 + (n // 2) * 128
    agg = sk.agg(F.sum("w").alias("tw")).collect()[0]
    assert agg["tw"] == total

    est = {
        r["prob"]: r["est"] for r in kll_quantiles(sk, [0.5]).collect()
    }
    # weighted median sits deep in the recent band (values >= 2997);
    # allow KLL rank slack but it must clear the old/recent boundary
    assert est[0.5] > 2000.0, est


def test_theta_sketch_exact_when_unsaturated(spark):
    """Fewer than k distinct values → the sketch retains every hash
    and both the distinct estimate and the intersection estimate are
    EXACT, not approximate."""
    from pyspark.sql import Row

    from data_seedling_spark.operators.sketch import (
        theta_intersection_estimate,
        theta_sketch,
        theta_stats,
    )

    a = spark.createDataFrame([Row(v=f"x{i}") for i in range(20)])
    b = spark.createDataFrame([Row(v=f"x{i}") for i in range(10, 40)])
    sa, sb = theta_sketch(a, "v", k=64), theta_sketch(b, "v", k=64)
    assert theta_stats(sa, 64).collect()[0]["estimate"] == 20.0
    assert theta_stats(sb, 64).collect()[0]["estimate"] == 30.0
    inter = theta_intersection_estimate(sa, sb, 64).collect()[0]
    assert inter["matched"] == 10 and inter["estimate"] == 10.0


def test_theta_union_associative_and_estimates_within_band(spark):
    """Saturated sketches: merging shards in either order yields the
    identical sketch (mergeable-state contract); estimates reproduce
    the offline-derived md5 constants exactly (engine-portability —
    the md5 draw is FIXED, so values are pins, not samples; the 'b'
    prefix happens to be a measured ~3.2σ low draw); and the MEAN
    relative error across several prefixes sits well inside the KMV
    band ~1/sqrt(k-1) ≈ 12.5% at k=64."""
    from pyspark.sql import Row

    from data_seedling_spark.operators.sketch import (
        theta_sketch,
        theta_stats,
        theta_union,
    )

    a = spark.createDataFrame([Row(v=f"a{i}") for i in range(800)])
    b = spark.createDataFrame([Row(v=f"b{i}") for i in range(1200)])
    sa, sb = theta_sketch(a, "v"), theta_sketch(b, "v")
    ab = {r["h"] for r in theta_union(sa, sb).collect()}
    ba = {r["h"] for r in theta_union(sb, sa).collect()}
    assert ab == ba and len(ab) == 64
    # deterministic pins (same 52-bit md5-prefix KMV computed offline)
    assert theta_stats(sa).collect()[0]["estimate"] == 778.7454
    assert theta_stats(sb).collect()[0]["estimate"] == 724.3702
    errs = []
    for p in ("a", "b", "c", "d", "e", "f"):
        df = spark.createDataFrame([Row(v=f"{p}{i}") for i in range(1000)])
        est = theta_stats(theta_sketch(df, "v")).collect()[0]["estimate"]
        errs.append(abs(est - 1000) / 1000)
    assert sum(errs) / len(errs) < 0.125, errs


def test_theta_intersection_zero_overlap_yields_zero(spark):
    """Disjoint sets: matched = 0 row must survive the left join and
    estimate exactly 0.0 (the no-match groupBy edge case)."""
    from pyspark.sql import Row

    from data_seedling_spark.operators.sketch import (
        theta_intersection_estimate,
        theta_sketch,
    )

    a = spark.createDataFrame([Row(v=f"a{i}") for i in range(500)])
    b = spark.createDataFrame([Row(v=f"b{i}") for i in range(500)])
    r = theta_intersection_estimate(
        theta_sketch(a, "v"), theta_sketch(b, "v")
    ).collect()
    assert len(r) == 1 and r[0]["matched"] == 0 and r[0]["estimate"] == 0.0


def test_theta_sketch_plan_uses_take_ordered(spark):
    """The bounded top-k must compile to TakeOrderedAndProject —
    per-partition k-heaps merged on the driver — never a global
    sort."""
    from pyspark.sql import Row

    from data_seedling_spark.operators.sketch import theta_sketch

    df = spark.createDataFrame([Row(v=f"x{i}") for i in range(100)])
    plan = (
        theta_sketch(df, "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_materialized_theta_sketch_lossless_and_insert_only(spark, tmp_path):
    """Three incremental refreshes must land EXACTLY the one-shot
    full-corpus sketch (KMV merge is lossless), the replayed refresh
    must be a no-op, and a delete in the feed must raise (insert-only
    scope)."""
    import pytest
    from pyspark.sql import Row

    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.operators.sketch import (
        MaterializedThetaSketch,
        theta_sketch,
    )

    rows = [Row(k=i, v=f"c{i % 300}") for i in range(900)]
    df = spark.createDataFrame(rows)
    src = VersionedTable(spark, str(tmp_path / "src"), write_partitions=2)
    mts = MaterializedThetaSketch(
        spark,
        VersionedTable(spark, str(tmp_path / "sk"), write_partitions=1),
        key_col="v",
        k=64,
    )
    src.write(df.where(F.col("k") % 3 == 0), mode="overwrite")
    assert mts.refresh(src) == (0, 0)
    src.write(df.where(F.col("k") % 3 == 1), mode="append")
    assert mts.refresh(src) == (1, 1)
    src.write(df.where(F.col("k") % 3 == 2), mode="append")
    assert mts.refresh(src) == (2, 2)
    lo, hi = mts.refresh(src)
    assert lo > hi  # replay no-op
    maintained = sorted(r["h"] for r in mts.table.read().select("h").collect())
    oneshot = sorted(r["h"] for r in theta_sketch(df, "v", 64).collect())
    assert maintained == oneshot
    # delete in the feed → insert-only guard raises
    from data_seedling_spark.operators.merge import CHANGE_TYPE, CT_DELETE

    src.merge(
        df.where(F.col("k") % 9 == 0)
        .limit(5)
        .withColumn(CHANGE_TYPE, F.lit(CT_DELETE)),
        primary_keys=["k"],
    )
    with pytest.raises(ValueError, match="insert-only"):
        mts.refresh(src)


def test_materialized_count_min_linear_under_deletes_and_updates(spark, tmp_path):
    """Count-min is a LINEAR sketch: after inserts, a merge-delete,
    and an update (pre-image −1 / post-image +1), the maintained grid
    must equal the one-shot sketch of the surviving rows EXACTLY, and
    estimates must dominate true surviving counts (CM never
    under-counts)."""
    from pyspark.sql import Row

    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.operators.merge import (
        CHANGE_TYPE,
        CT_DELETE,
        CT_INSERT,
    )
    from data_seedling_spark.operators.sketch import MaterializedCountMin

    rows = [Row(k=i, cat=f"c{i % 7}") for i in range(700)]
    df = spark.createDataFrame(rows)
    src = VersionedTable(spark, str(tmp_path / "src"), write_partitions=2)
    mcm = MaterializedCountMin(
        spark,
        VersionedTable(spark, str(tmp_path / "cm"), write_partitions=1),
        key_col="cat",
        depth=4,
        width=64,
    )
    src.write(df, mode="overwrite")
    assert mcm.refresh(src) == (0, 0)
    # delete every 10th row
    src.merge(
        df.where(F.col("k") % 10 == 0).withColumn(CHANGE_TYPE, F.lit(CT_DELETE)),
        primary_keys=["k"],
    )
    assert mcm.refresh(src) == (1, 1)
    # "update" rows k%10==1 to category 'c_new', encoded as the
    # ledger-sanctioned mixed delete+insert feed (the S9 guard rejects
    # raw update images; Delta-CDF-style pre/post feeds exercise the
    # same +-1 sign mapping in MaterializedCountMin.refresh)
    pre = df.where(F.col("k") % 10 == 1).withColumn(
        CHANGE_TYPE, F.lit(CT_DELETE)
    )
    post = (
        df.where(F.col("k") % 10 == 1)
        .withColumn("cat", F.lit("c_new"))
        .withColumn(CHANGE_TYPE, F.lit(CT_INSERT))
    )
    src.merge(pre.unionByName(post), primary_keys=["k"])
    assert mcm.refresh(src) == (2, 2)
    lo, hi = mcm.refresh(src)
    assert lo > hi  # replay no-op

    # maintained grid == one-shot sketch of the ledger's surviving rows
    surv = src.read()
    oneshot = {
        (r["d"], r["bucket"]): r["c"]
        for r in mcm._bucketed(
            surv.withColumn("_one", F.lit(1)), F.col("_one")
        ).collect()
    }
    maintained = {
        (r["d"], r["bucket"]): r["c"]
        for r in mcm.table.read().select("d", "bucket", "c").collect()
    }
    assert maintained == oneshot
    est = {
        r["cat"]: r["cm_estimate"]
        for r in mcm.estimates(
            surv.select("cat").distinct(), "cat"
        ).collect()
    }
    truth = {
        r["cat"]: r["n"]
        for r in surv.groupBy("cat").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(truth) and "c_new" in truth
    for k in truth:
        assert est[k] >= truth[k], (k, est[k], truth[k])


def test_materialized_count_min_raises_on_unknown_change_type(spark, tmp_path):
    """A change type outside the four CDC kinds must raise, not map to
    a NULL sign that F.sum silently drops (r8 ADVICE: silent counter
    corruption)."""
    from pyspark.sql import Row

    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.operators.merge import CHANGE_TYPE
    from data_seedling_spark.operators.sketch import MaterializedCountMin

    class BogusSource:
        def latest_version(self):
            return 0

        def read_changes(self, lo, hi):
            return spark.createDataFrame(
                [Row(k=1, cat="a"), Row(k=2, cat="b")]
            ).withColumn(CHANGE_TYPE, F.lit("truncate"))

    mcm = MaterializedCountMin(
        spark,
        VersionedTable(spark, str(tmp_path / "cm"), write_partitions=1),
        key_col="cat",
        depth=2,
        width=16,
    )
    import pytest

    with pytest.raises(ValueError, match="unsupported change types.*truncate"):
        mcm.refresh(BogusSource())


def test_tdigest_quantiles_accuracy_and_weight_conservation(spark):
    """t-digest estimates must (a) conserve total weight exactly,
    (b) land within a tight relative band of the TRUE quantiles (the
    k1 scale guarantees per-cluster rank error <= ~n/delta in the
    middle, far tighter at the tails), and (c) interpolate — i.e. the
    median estimate need not be an observed value, unlike KLL's
    step estimator."""
    from data_seedling_spark.operators.sketch import (
        tdigest_centroids,
        tdigest_quantiles,
    )
    from data_seedling_spark.tables import load_table

    from conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    vals = sorted(r[0] for r in orders.select("o_totalprice").collect())
    n = len(vals)

    cent = tdigest_centroids(orders, "o_totalprice", delta=50)
    crows = cent.collect()
    assert sum(r["n_c"] for r in crows) == n  # weight conserved
    assert len(crows) <= 50
    # cluster means are monotone in cluster id (sorted construction)
    means = [r["mean"] for r in sorted(crows, key=lambda r: r["cluster"])]
    assert means == sorted(means)

    probs = [0.25, 0.5, 0.75, 0.95]
    est = {
        r["prob"]: r["est"]
        for r in tdigest_quantiles(cent, probs).collect()
    }
    for p in probs:
        true = vals[min(n - 1, max(0, round(p * n) - 1))]
        assert abs(est[p] - true) / true < 0.05, (p, est[p], true)


def test_materialized_tdigest_incremental_maintenance(spark, tmp_path):
    """Centroid-matview protocol (the t-digest twin of
    MaterializedSketch): each refresh folds exactly the new source
    versions, total centroid weight stays conserved (= rows ingested
    so far), stored state stays bounded by ~delta centroids, the
    applied-hi marker makes replays no-ops, quantiles track the true
    median, and a delete in the feed raises (centroids have no delete
    inverse)."""
    import pytest

    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.operators.merge import CHANGE_TYPE, CT_DELETE
    from data_seedling_spark.operators.sketch import MaterializedTDigest

    df = _uniform_df(spark, 900)
    src = VersionedTable(spark, str(tmp_path / "src"), write_partitions=2)
    md = MaterializedTDigest(
        spark,
        VersionedTable(spark, str(tmp_path / "td"), write_partitions=1),
        value_col="x",
        delta=30,
    )
    src.write(df.where(F.col("id") % 3 == 0), mode="overwrite")
    assert md.refresh(src) == (0, 0)
    assert md.table.read().agg(F.sum("n_c")).collect()[0][0] == 300

    src.write(df.where(F.col("id") % 3 == 1), mode="append")
    assert md.refresh(src) == (1, 1)
    assert md.table.read().agg(F.sum("n_c")).collect()[0][0] == 600
    # state stays centroid-bounded, not row-bounded
    assert md.table.read().count() <= 2 * 30

    lo, hi = md.refresh(src)
    assert lo > hi  # replay no-op

    # p50 of the maintained digest vs the true median of ingested rows:
    # uniform values spaced 3.0 apart, delta=30 → interior clusters
    # hold ~2/delta of the mass; one merge level doubles the blur.
    # A generous 10%-of-range accuracy floor catches protocol bugs
    # (wrong increment, double-fold) without overfitting the estimator.
    est = {r["prob"]: r["est"] for r in md.quantiles([0.5]).collect()}
    ingested = sorted(
        r["x"] for r in df.where(F.col("id") % 3 < 2).collect()
    )
    true_median = ingested[len(ingested) // 2]
    value_range = ingested[-1] - ingested[0]
    assert abs(est[0.5] - true_median) <= 0.1 * value_range

    # insert-only guard: a delete in the feed must raise
    src.merge(
        df.where(F.col("id") % 9 == 0)
        .limit(5)
        .withColumn(CHANGE_TYPE, F.lit(CT_DELETE)),
        primary_keys=["id"],
    )
    with pytest.raises(ValueError, match="insert-only"):
        md.refresh(src)
