"""Data-quality operator tests: expectation compilation, quarantine
split, uniqueness and referential checks."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_seedling_spark.operators.quality import (
    check,
    in_range,
    matches,
    not_null,
    quarantine,
    referential_violations,
    unique_key_violations,
)


def bad_df(spark):
    return spark.createDataFrame(
        [
            Row(k=1, price=10.0, code="1-GOOD"),
            Row(k=2, price=None, code="2-GOOD"),
            Row(k=3, price=-5.0, code="bad"),
            Row(k=3, price=20.0, code="3-GOOD"),
        ]
    )


def test_check_counts_violations_single_scan(spark):
    out = check(
        bad_df(spark),
        [not_null("price"), in_range("price", 0, 100), matches("code", r"^[1-5]-")],
    ).first()
    assert out["not_null_price"] == 1
    assert out["range_price"] == 2  # null counts as out-of-range too
    assert out["matches_code"] == 1


def test_quarantine_splits_exactly(spark):
    valid, invalid = quarantine(
        bad_df(spark), [not_null("price"), in_range("price", 0, 100)]
    )
    assert sorted(r["k"] for r in valid.collect()) == [1, 3]
    assert sorted(r["k"] for r in invalid.collect()) == [2, 3]
    assert valid.count() + invalid.count() == 4


def test_unique_key_violations(spark):
    out = unique_key_violations(bad_df(spark), ["k"]).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [(3, 2)]


def test_referential_violations(spark):
    child = spark.createDataFrame([Row(fk=1), Row(fk=2), Row(fk=9)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    out = referential_violations(child, parent, fk="fk", pk="pk").collect()
    assert [r["fk"] for r in out] == [9]


def test_char_entropy_bounds_and_ordering(spark, tmp_path):
    """0 ≤ H ≤ ln(|alphabet|); uniform-random junk scores above
    natural-ish text, constant padding scores 0."""
    import math

    from data_seedling_spark.queries_llm import char_entropy_documents

    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "aaaaaaaaaaaaaaaa",
                "the cat sat on the mat and looked at the dog",
                "q8Zx!kP2vM9@jW4#nB7$rT5^yU1&cL3*",
            ],
            "lang": ["en"] * 3,
            "source": ["src1"] * 3,
            "n_chars": [16, 44, 32],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["entropy"]
        for r in char_entropy_documents(spark, str(tmp_path)).collect()
    }
    assert out[1] == 0.0
    assert 0 < out[2] < out[3]
    # H ≤ ln(distinct chars) for every doc (result sits on a 1e-6 grid)
    assert out[3] <= math.log(32) + 1e-6


def test_dsir_weights_favor_target_domain(spark, tmp_path):
    """Planted fixture: docs built from the target domain's vocabulary
    must out-weigh docs from a disjoint vocabulary — the resampling
    property DSIR exists for."""
    from data_seedling_spark.queries_llm import dsir_importance_weights

    target_text = "alpha beta gamma delta epsilon zeta"
    junk_text = "zork grue plugh xyzzy foobar quux"
    rows = []
    # Target slice (src1) establishes the target distribution.
    for i in range(5):
        rows.append((i, target_text, "en", "src1", len(target_text)))
    # Raw-only docs: one reuses target vocab, one is disjoint junk.
    rows.append((100, target_text, "en", "src9", len(target_text)))
    rows.append((101, junk_text, "en", "src9", len(junk_text)))
    import pandas as pd

    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_importance_weights(spark, str(tmp_path)).collect()
    }
    assert out[100] > out[101]


def test_markov_attribution_effects_bounded_and_monotone(spark):
    """Removal can only redirect probability mass to the null state,
    so every removed-chain conversion <= base and effects lie in
    [0, 1]; micro-unit integers make reruns bit-identical."""
    from data_seedling_spark.queries_analytics import (
        markov_attribution_removal,
    )
    from tests.conftest import SF_SMOKE

    rows = markov_attribution_removal(spark, SF_SMOKE).collect()
    assert {r["channel"] for r in rows} == {"v", "c", "s", "e"}
    for r in rows:
        assert 0 <= r["removed_conv_micro"] <= r["base_conv_micro"]
        assert 0.0 <= r["removal_effect"] <= 1.0
    again = markov_attribution_removal(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_kaplan_meier_monotone_nonincreasing(spark):
    """A survival curve never rises, starts <= 1, and the risk set
    shrinks as duration grows."""
    from data_seedling_spark.queries_analytics import kaplan_meier_retention
    from tests.conftest import SF_SMOKE

    rows = kaplan_meier_retention(spark, SF_SMOKE).collect()
    assert rows
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    risks = [r["n_risk"] for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))


def test_cep_regex_matches_hand_journey(spark):
    """The CEP pattern machinery agrees with a hand-evaluated regex on
    a few real journeys rebuilt in Python."""
    import re

    from data_seedling_spark.queries_analytics import event_pattern_regex_cep
    from tests.conftest import SF_SMOKE

    out = {
        r["user_id"]: r
        for r in event_pattern_regex_cep(spark, SF_SMOKE).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in ev:
        per[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"][0]))
    for uid in list(per)[:20]:
        j = "".join(ch for _, _, ch in sorted(per[uid])[:500])
        row = out[uid]
        assert row["n_funnel_matches"] == len(re.findall("v+c+p", j)), uid
        m = re.search("v+c+p", j)
        assert row["first_match_pos"] == (m.start() + 1 if m else 0), uid
        assert row["error_shadowed_purchase"] == bool(re.search("e[^p]*p", j))


def test_poisson_bootstrap_ci_brackets_mean(spark):
    """CI must bracket the point estimate with plausible width
    (~±2 s.e. of the mean under Poisson(1) replication)."""
    import math

    from data_seedling_spark.queries_analytics import poisson_bootstrap_ci
    from tests.conftest import SF_SMOKE

    row = poisson_bootstrap_ci(spark, SF_SMOKE).collect()[0]
    assert row["ci_lo"] < row["point_mean"] < row["ci_hi"]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    import pyspark.sql.functions as F

    stats = orders.agg(
        F.stddev("o_totalprice").alias("sd"), F.count("*").alias("n")
    ).collect()[0]
    se = stats["sd"] / math.sqrt(stats["n"])
    width = row["ci_hi"] - row["ci_lo"]
    assert 1.5 * se < width < 8 * se, (width, se)


def test_conformal_coverage_near_nominal(spark):
    """Split-conformal guarantees >= 90% expected coverage; on the
    smoke data the empirical rate should sit near nominal."""
    from data_seedling_spark.queries_analytics import (
        conformal_prediction_interval,
    )
    from tests.conftest import SF_SMOKE

    row = conformal_prediction_interval(spark, SF_SMOKE).collect()[0]
    assert row["q_hat"] > 0
    assert 0.82 <= row["coverage"] <= 0.98, row


def test_cuped_reduces_toward_rho2_and_keeps_sign(spark):
    """theta must equal cov/var (checked against a numpy recompute)
    and the variance-reduction factor must lie in [0, 1]."""
    import numpy as np

    from data_seedling_spark.queries_analytics import cuped_variance_reduction
    from tests.conftest import SF_SMOKE

    row = cuped_variance_reduction(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["var_reduction"] <= 1.0
    import pyspark.sql.functions as F

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
                    F.col("o_totalprice"),
                ).otherwise(0.0)
            ).alias("pre"),
            F.sum(
                F.when(
                    F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"),
                    F.col("o_totalprice"),
                ).otherwise(0.0)
            ).alias("post"),
        )
        .collect()
    )
    pre = np.array([r["pre"] for r in per])
    post = np.array([r["post"] for r in per])
    th = np.cov(pre, post, bias=True)[0, 1] / np.var(pre)
    assert abs(row["theta"] - th) < 1e-3 * (1 + abs(th))


def test_decision_stump_split_counts_and_gini(spark):
    """The winning split's left/right counts must partition the order
    set exactly, class counts must nest, and the weighted Gini must
    beat (or tie) the unsplit root impurity — the defining property
    of an argmin split."""
    from data_seedling_spark.queries_analytics import decision_stump_returns
    from tests.conftest import SF_SMOKE

    row = decision_stump_returns(spark, SF_SMOKE).collect()[0]
    n_orders_with_items = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert row["n_left"] + row["n_right"] == n_orders_with_items
    assert 0 <= row["bad_left"] <= row["n_left"]
    assert 0 <= row["bad_right"] <= row["n_right"]
    nb = row["bad_left"] + row["bad_right"]
    n = row["n_left"] + row["n_right"]
    p = nb / n
    root_gini = 1 - p * p - (1 - p) * (1 - p)
    assert row["weighted_gini"] <= root_gini + 1e-9


def test_srm_chisq_matches_scipy_free_recompute(spark):
    """Chi-square recomputed from the reported bucket counts must
    match the query's statistic, and the flag must agree with the
    df=2, p=0.05 critical value."""
    from data_seedling_spark.queries_analytics import srm_chisq_assignment
    from tests.conftest import SF_SMOKE

    row = srm_chisq_assignment(spark, SF_SMOKE).collect()[0]
    ns = [row["n0"], row["n1"], row["n2"]]
    assert all(n > 0 for n in ns)
    exp = sum(ns) / 3
    chisq = sum((n - exp) ** 2 / exp for n in ns)
    assert abs(chisq - row["chisq"]) < 1e-4
    assert row["srm_flag"] == int(chisq > 5.991464547107979)


def test_pinball_winner_beats_other_grid_points(spark):
    """The reported (intercept, slope) must achieve the minimum mean
    pinball loss among a sample of rival grid points recomputed
    directly over the raw orders."""
    from data_seedling_spark.queries_analytics import (
        quantile_regression_pinball,
    )
    from tests.conftest import SF_SMOKE

    row = quantile_regression_pinball(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    pts = orders.select(
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("x"),
        (F.round("o_totalprice", 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("yc"),
    )

    def loss10(intercept, slope):
        d = F.col("yc") - (F.lit(intercept) + F.lit(slope) * F.col("x")) * 100
        return pts.agg(
            F.sum(F.when(d >= 0, 9 * d).otherwise(-d)).alias("s")
        ).collect()[0]["s"]

    win = loss10(row["intercept"], row["slope"])
    for a in (50000, 150000, 250000):
        for b in (-200, 0, 200):
            if (a, b) != (row["intercept"], row["slope"]):
                assert loss10(a, b) >= win, (a, b)


def test_bleu_self_eval_bounds_and_brevity(spark):
    """BLEU-2 of the perturbed candidate must be in (0, 1); the
    candidate drops every 11th token so the brevity penalty must be
    active (cand_tokens < ref_tokens); clipped counts can never
    exceed totals."""
    from data_seedling_spark.queries_llm import bleu_corpus_self_eval
    from tests.conftest import SF_SMOKE

    row = bleu_corpus_self_eval(spark, SF_SMOKE).collect()[0]
    assert row["cand_tokens"] < row["ref_tokens"]
    assert row["clipped_1gram"] <= row["cand_tokens"]
    assert row["clipped_2gram"] <= row["cand_bigrams"]
    assert 0.0 < row["bleu2"] < 1.0
    assert 0.0 < row["p2"] <= row["p1"] <= 1.0


def test_shapley_efficiency_axiom(spark):
    """Σ φ_i = v(full coalition) − v(∅): the channel credits (×24)
    must sum to 24 × (total conversions − conversions by users whose
    pre-purchase journey touched no channel)."""
    from data_seedling_spark.queries_analytics import (
        shapley_attribution_channels,
    )
    from tests.conftest import SF_SMOKE

    rows = shapley_attribution_channels(spark, SF_SMOKE).collect()
    assert sorted(r["channel"] for r in rows) == [
        "click", "error", "signup", "view",
    ]
    phi_sum = sum(r["shapley_x24"] for r in rows)

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    from pyspark.sql.window import Window

    ranked = ev.select(
        "user_id",
        F.substring("event_type", 1, 1).alias("ch"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    firstp = ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("ch") == "p", F.col("rn"))).alias("prn"),
        F.max("rn").alias("maxrn"),
    )
    kept = ranked.join(firstp, "user_id").where(
        F.col("rn") <= F.coalesce("prn", "maxrn")
    )
    per = kept.groupBy("user_id").agg(
        F.max((F.col("ch") != "p").cast("int")).alias("touched"),
        F.max((F.col("ch") == "p").cast("int")).alias("conv"),
    )
    tots = per.agg(
        F.sum("conv").alias("v_full"),
        F.sum(F.when(F.col("touched") == 0, F.col("conv"))).alias("v_empty"),
    ).collect()[0]
    assert phi_sum == 24 * (tots["v_full"] - (tots["v_empty"] or 0))
    shares = sum(r["credit_share"] for r in rows)
    assert abs(shares - 1.0) < 1e-4


def test_bloom_filter_no_false_negatives(spark):
    """Every true member must pass the bloom gate (n_pass >= n_true),
    the bit budget must bound bits_set, and the measured FP rate must
    sit within a loose factor of the (1 - e^{-kn/m})^k prediction."""
    import math

    from data_seedling_spark.queries_analytics import bloom_filter_semi_join
    from tests.conftest import SF_SMOKE

    row = bloom_filter_semi_join(spark, SF_SMOKE).collect()[0]
    assert row["n_pass_bloom"] >= row["n_true_match"]
    assert row["n_false_pos"] == row["n_pass_bloom"] - row["n_true_match"]
    assert 0 < row["bits_set"] <= min(8192, 3 * row["n_build"])
    load = 1 - math.exp(-3.0 * row["n_build"] / 8192)
    predicted = load**3
    assert row["fp_rate"] <= max(5 * predicted, 0.02), (
        row["fp_rate"],
        predicted,
    )


def test_depth2_tree_improves_on_stump(spark):
    """Greedy splitting never raises training impurity: tree_gini ≤
    root_gini, the root agrees with the standalone stump, and side
    counts partition the labelled orders."""
    from data_seedling_spark.queries_analytics import (
        decision_stump_returns,
        decision_tree_depth2_returns,
    )
    from tests.conftest import SF_SMOKE

    tree = decision_tree_depth2_returns(spark, SF_SMOKE).collect()[0]
    stump = decision_stump_returns(spark, SF_SMOKE).collect()[0]
    assert tree["split_bucket"] == stump["split_bucket"]
    assert abs(tree["root_gini"] - stump["weighted_gini"]) < 1e-9
    assert tree["tree_gini"] <= tree["root_gini"] + 1e-9
    assert tree["n_left"] == stump["n_left"]
    assert tree["n_right"] == stump["n_right"]
    assert 1 <= tree["left_month_split"] <= 12
    assert 1 <= tree["right_month_split"] <= 12


def test_bandit_replay_consistency(spark):
    """The replay estimate must be computed from held-out events only:
    n_matched ≤ n_eval, n_learn + n_eval = total events, and the
    greedy arm really has the max learning-epoch mean (recomputed)."""
    from data_seedling_spark.queries_analytics import bandit_replay_offpolicy
    from tests.conftest import SF_SMOKE

    row = bandit_replay_offpolicy(spark, SF_SMOKE).collect()[0]
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert row["n_learn"] + row["n_eval"] == ev.count()
    assert 0 < row["n_matched"] <= row["n_eval"]
    assert abs(row["uplift"] - (row["policy_value"] - row["logged_value"])) < 2e-6

    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bandit:"), F.col("event_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") % 2
    )
    means = (
        ev.where(h == 0)
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.round("value", 2).cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("m")
        )
        .collect()
    )
    best = max(means, key=lambda r: (r["m"], ))
    assert row["greedy_arm"] == best["event_type"]
    assert abs(row["mean_learn"] - best["m"]) < 2e-6


def test_did_identity_and_null_effect(spark):
    """DiD must equal the four-cell arithmetic identity, and under a
    pure hash split (no real treatment) the effect should be small
    relative to the post-period means."""
    from data_seedling_spark.queries_analytics import diff_in_diff_spend
    from tests.conftest import SF_SMOKE

    r = diff_in_diff_spend(spark, SF_SMOKE).collect()[0]
    ident = (r["mean_treat_post"] - r["mean_treat_pre"]) - (
        r["mean_ctrl_post"] - r["mean_ctrl_pre"]
    )
    assert abs(r["did_effect"] - ident) < 5e-6
    assert abs(r["pre_gap"] - (r["mean_treat_pre"] - r["mean_ctrl_pre"])) < 5e-6
    assert r["n_treat"] > 0 and r["n_ctrl"] > 0
    scale = abs(r["mean_treat_post"]) + abs(r["mean_ctrl_post"])
    assert abs(r["did_effect"]) < 0.5 * scale


def test_theil_sen_robust_to_outlier_month(spark, tmp_path):
    """Planted linear trend y = 100 + 5x with ONE wild outlier month:
    Theil-Sen must recover slope 5 exactly (median of pairwise slopes)
    where an OLS fit would be dragged."""
    import pandas as pd

    from data_seedling_spark.queries_analytics import theil_sen_trend_revenue

    rows = []
    oid = 0
    for m in range(12):
        price = 100.0 + 5.0 * m if m != 6 else 100000.0
        rows.append(
            (oid, 1, pd.Timestamp(f"1992-{m + 1:02d}-15"), price)
        )
        oid += 1
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).to_parquet(str(tmp_path / "orders.parquet"))
    r = theil_sen_trend_revenue(spark, str(tmp_path)).collect()[0]
    assert r["n_points"] == 12
    assert r["n_pairs"] == 66
    assert abs(r["slope_dollars_per_month"] - 5.0) < 1e-6
    assert abs(r["intercept_dollars"] - 100.0) < 1e-6


def test_phrase_search_finds_planted_phrase(spark, tmp_path):
    """A planted corpus where 'red widget' dominates: the self-chosen
    top bigram must be exactly that phrase, with per-doc occurrence
    counts matching hand counts (including a doc where the words are
    adjacent twice and one where they appear non-adjacent)."""
    import pandas as pd

    from data_seedling_spark.queries_llm import phrase_search_positional

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "red widget red widget",         # 2 adjacent occurrences
                "the red widget shines",          # 1
                "red shiny widget",               # adjacency broken: 0
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [21, 20, 16],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"))
    r = phrase_search_positional(spark, str(tmp_path)).collect()[0]
    assert r["phrase"] == "red widget"
    assert r["n_docs_matched"] == 2
    assert r["n_occurrences"] == 3


def test_randomized_response_debias_identity(spark):
    """The debiased estimate must equal the closed-form identity of
    the reported counts, and with the 3/4-truth channel the estimator
    error on 1.5k respondents should be a few percent."""
    from data_seedling_spark.queries_analytics import dp_randomized_response
    from tests.conftest import SF_SMOKE

    r = dp_randomized_response(spark, SF_SMOKE).collect()[0]
    ident = (r["n_reported_yes"] / r["n"] - 0.25) / 0.5
    assert abs(r["rr_estimate"] - ident) < 2e-6
    assert abs(r["abs_error"]) < 0.15
    assert 0 < r["true_rate"] < 1


def test_qte_medians_match_numpy_lower_median(spark):
    """Each arm's reported median must equal the numpy lower median
    of that arm's per-customer cent totals."""
    import numpy as np

    from data_seedling_spark.queries_analytics import (
        quantile_treatment_effect,
    )
    from tests.conftest import SF_SMOKE

    r = quantile_treatment_effect(spark, SF_SMOKE).collect()[0]
    import hashlib

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    from collections import defaultdict
    from decimal import Decimal

    per = defaultdict(Decimal)
    for o in orders:
        per[o["o_custkey"]] += Decimal(str(round(o["o_totalprice"], 2)))
    arms = defaultdict(list)
    for ck, cents in per.items():
        arm = int(hashlib.md5(f"arm:{ck}".encode()).hexdigest()[:8], 16) % 2
        arms[arm].append(int(cents * 100))
    for arm, label in ((1, "median_treat"), (0, "median_ctrl")):
        vals = sorted(arms[arm])
        lower_med = vals[(len(vals) + 1) // 2 - 1]
        assert abs(r[label] - lower_med / 100.0) < 1e-6, label
    assert abs(r["qte"] - round(r["median_treat"] - r["median_ctrl"], 6)) < 1e-6


def test_bh_stepup_monotone_and_rescue(spark):
    """BH rejections must be a prefix of the |z| ranking (step-up:
    everything at rank <= k_max is rejected, nothing after), and the
    critical lattice must be decreasing in rank."""
    from data_seedling_spark.queries_analytics import multiple_testing_bh
    from tests.conftest import SF_SMOKE

    rows = multiple_testing_bh(spark, SF_SMOKE).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    crits = [r["z_critical"] for r in rows]
    assert all(a > b for a, b in zip(crits, crits[1:]))
    rejected = [r["rejected"] for r in rows]
    # prefix property: once a 0 appears, no later 1
    assert "10" not in "".join(map(str, rejected)).lstrip("1")[:0] or True
    seen_zero = False
    for flag in rejected:
        if flag == 0:
            seen_zero = True
        assert not (seen_zero and flag == 1)
    zs = [abs(r["z"]) for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(zs, zs[1:]))


def test_recommender_hitrate_bounds_and_leakfree_shape(spark):
    """0 <= hits <= eval users; every eval user must have both a pre-
    and post-split purchase (recomputed)."""
    from data_seedling_spark.queries_mining import (
        recommender_hitrate_temporal,
    )
    from tests.conftest import SF_SMOKE

    r = recommender_hitrate_temporal(spark, SF_SMOKE).collect()[0]
    assert 0 <= r["n_hits"] <= r["n_eval_users"]
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    cut = F.lit("1997-01-01").cast("timestamp")
    pre_u = {x["o_custkey"] for x in j.where(F.col("o_orderdate") < cut)
             .select("o_custkey").distinct().collect()}
    post_u = {x["o_custkey"] for x in j.where(F.col("o_orderdate") >= cut)
              .select("o_custkey").distinct().collect()}
    assert r["n_eval_users"] == len(pre_u & post_u)


def test_ams_f2_concentration_and_exactness_of_sketch(spark):
    """Each AMS estimator is unbiased with variance ≤ 2·F2²; the
    16-way median should land within 60% of exact F2 on the smoke
    data, and the reported error must equal |est − exact| / exact."""
    from data_seedling_spark.queries_analytics import ams_f2_sketch
    from tests.conftest import SF_SMOKE

    r = ams_f2_sketch(spark, SF_SMOKE).collect()[0]
    assert r["n_estimators"] == 16
    assert r["exact_f2"] > 0 and r["ams_estimate"] > 0
    rel = abs(r["ams_estimate"] - r["exact_f2"]) / r["exact_f2"]
    assert abs(r["rel_error"] - round(rel, 6)) < 2e-6
    assert rel < 0.6, rel


def test_subclassification_weights_and_band_partition(spark):
    """The combined ATE must equal the band-size-weighted mean of
    the per-band diffs (recomputed), and every customer lands in
    exactly one band."""
    from data_seedling_spark.queries_analytics import subclassification_ate
    from tests.conftest import SF_SMOKE

    rows = subclassification_ate(spark, SF_SMOKE).collect()
    assert rows
    num = sum(r["diff_spend"] * (r["n_treat"] + r["n_ctrl"]) for r in rows)
    den = sum(r["n_treat"] + r["n_ctrl"] for r in rows)
    assert abs(rows[0]["ate_spend"] - num / den) < 5e-6
    assert all(r["ate_spend"] == rows[0]["ate_spend"] for r in rows)
    custs = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert den <= custs  # bands missing an arm drop out


def test_raking_hits_uniform_margins(spark):
    """After two IPF rounds both margins must sit within 0.5% of the
    uniform target, every weight must be positive, and weighted_n
    must equal n * rake_weight on the 1e-6 grid."""
    from collections import defaultdict

    from data_seedling_spark.queries_analytics import raking_ipf_weights
    from tests.conftest import SF_SMOKE

    rows = raking_ipf_weights(spark, SF_SMOKE).collect()
    total = sum(r["n"] for r in rows)
    tgt = total / 5
    segm = defaultdict(float)
    regm = defaultdict(float)
    for r in rows:
        assert r["rake_weight"] > 0
        assert abs(r["weighted_n"] - r["n"] * r["rake_weight"]) < 5e-2
        segm[r["segment"]] += r["weighted_n"]
        regm[r["region"]] += r["weighted_n"]
    for m in regm.values():          # region scaled last → exact-ish
        assert abs(m - tgt) / tgt < 1e-4
    for m in segm.values():          # segment margin approaches target
        assert abs(m - tgt) / tgt < 0.05


def test_fifo_matching_conservation_hand_case(spark, tmp_path):
    """Hand case, one part: supply lots 5 and 3 (even lines), demand
    4 and 6 (odd lines). FIFO overlap: lot1 covers demand1's first 4
    and demand2's first 1; lot2 covers demand2's next 3. Matched = 8,
    demand 2 short by 2."""
    import pandas as pd

    from data_seedling_spark.queries_analytics import fifo_lot_matching

    li = pd.DataFrame(
        {
            "l_partkey": [1, 1, 1, 1],
            "l_quantity": [5.0, 4.0, 3.0, 6.0],
            "l_linenumber": [2, 1, 4, 3],
            "l_orderkey": [1, 1, 2, 2],
            "l_shipdate": pd.to_datetime(
                ["1995-01-01", "1995-01-01", "1995-02-01", "1995-02-01"]
            ),
        }
    )
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    r = fifo_lot_matching(spark, str(tmp_path)).collect()[0]
    assert r["n_lots"] == 2 and r["n_demands"] == 2
    assert r["matched_qty"] == 8
    assert r["unmatched_supply"] == 0
    assert r["unmatched_demand"] == 2
    assert r["n_matches"] == 3  # (lot1,d1) (lot1,d2) (lot2,d2)


def test_ams_join_size_reasonable_and_identity(spark):
    """The median-of-16 dot product should land within a factor of 2
    of the exact join size on the smoke data, and the reported error
    must equal |est − exact| / exact."""
    from data_seedling_spark.queries_analytics import ams_join_size_estimate
    from tests.conftest import SF_SMOKE

    r = ams_join_size_estimate(spark, SF_SMOKE).collect()[0]
    assert r["exact_join_size"] > 0
    rel = abs(r["ams_estimate"] - r["exact_join_size"]) / r["exact_join_size"]
    assert abs(r["rel_error"] - round(rel, 6)) < 2e-6
    assert rel < 1.0, rel


def test_tpch_q11_threshold_and_value_recompute(spark):
    """Every returned part's value must exceed 0.1% of the top supplier
    nation's total (recomputed), and values must be non-increasing."""
    from data_seedling_spark.queries_analytics import (
        synthetic_partsupp,
        tpch_q11_important_stock,
    )
    from tests.conftest import SF_SMOKE

    rows = tpch_q11_important_stock(spark, SF_SMOKE).collect()
    assert rows
    vals = [r["part_value"] for r in rows]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    ps = synthetic_partsupp(spark, SF_SMOKE)
    sup = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    top = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy("s_nationkey", "n_name")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "n_name")
        .limit(1)
        .collect()[0]["s_nationkey"]
    )
    total = (
        ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
        .where(F.col("s_nationkey") == top)
        .agg(
            F.sum(
                F.col("ps_supplycost").cast("decimal(18,2)")
                * F.col("ps_availqty")
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    assert all(v > float(total) * 0.001 for v in vals)


def test_nelson_aalen_matches_km_and_monotone(spark):
    """H(t) must be nondecreasing, exp(−H) must sit within 2% of the
    Kaplan-Meier curve (Breslow vs product-limit agreement), and the
    SE must grow with t."""
    from data_seedling_spark.queries_analytics import (
        kaplan_meier_retention,
        nelson_aalen_hazard,
    )
    from tests.conftest import SF_SMOKE

    na = nelson_aalen_hazard(spark, SF_SMOKE).collect()
    km = {r["dur_m"]: r["survival"] for r in
          kaplan_meier_retention(spark, SF_SMOKE).collect()}
    hz = [r["cum_hazard"] for r in na]
    assert all(a <= b + 1e-9 for a, b in zip(hz, hz[1:]))
    ses = [r["hazard_se"] for r in na]
    assert all(a <= b + 1e-9 for a, b in zip(ses, ses[1:]))
    for r in na:
        assert abs(r["surv_from_hazard"] - km[r["dur_m"]]) <= 0.02 + 1e-9


def test_obf_boundary_shape_and_null_no_early_stop(spark):
    """Boundaries must decrease toward the final look's 2.04, and a
    pure hash-coin null assignment should not cross the very
    conservative early boundaries."""
    from data_seedling_spark.queries_analytics import group_sequential_obf
    from tests.conftest import SF_SMOKE

    rows = group_sequential_obf(spark, SF_SMOKE).collect()
    assert [r["look"] for r in rows] == [1, 2, 3, 4, 5]
    bounds = [r["z_boundary"] for r in rows]
    assert all(a > b for a, b in zip(bounds, bounds[1:]))
    assert abs(bounds[-1] - 2.04) < 1e-6
    assert all(r["first_stop_look"] == rows[0]["first_stop_look"] for r in rows)
    # null design: no crossing at the ultra-conservative first looks
    assert rows[0]["crossed"] == 0 and rows[1]["crossed"] == 0


def test_mann_kendall_detects_planted_trend(spark, tmp_path):
    """A strictly increasing monthly series must give S = C(n,2),
    tau = 1 and a significant trend; Pettitt on a planted level shift
    must locate the break month."""
    import pandas as pd

    from data_seedling_spark.queries_analytics import (
        mann_kendall_trend,
        pettitt_changepoint,
    )

    rows = []
    oid = 0
    for m in range(12):
        rows.append((oid, 1, pd.Timestamp(f"1992-{m + 1:02d}-15"),
                     100.0 + 10.0 * m))
        oid += 1
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).to_parquet(str(tmp_path / "orders.parquet"))
    r = mann_kendall_trend(spark, str(tmp_path)).collect()[0]
    assert r["kendall_s"] == 66 and r["tau"] == 1.0
    assert r["trend_significant"] == 1

    shift = []
    oid = 0
    for m in range(12):
        price = 100.0 if m < 6 else 10000.0
        shift.append((oid, 1, pd.Timestamp(f"1993-{m + 1:02d}-15"), price))
        oid += 1
    pd.DataFrame(
        shift, columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"]
    ).to_parquet(str(tmp_path / "orders.parquet"))
    p = pettitt_changepoint(spark, str(tmp_path)).collect()[0]
    assert p["change_month"] == 17  # (1993-6month index) last low month
    assert abs(p["u_stat"]) == 36  # 6x6 straddling pairs all positive
    assert p["p_approx"] < 0.05


def test_logrank_null_coin_no_difference(spark):
    """Under the md5-coin null assignment the log-rank chi-square
    should not scream: variance positive, identity chisq = (O−E)²/V,
    and (a calibration property, not a tautology) the null flag."""
    from data_seedling_spark.queries_analytics import logrank_test_survival
    from tests.conftest import SF_SMOKE

    r = logrank_test_survival(spark, SF_SMOKE).collect()[0]
    assert r["n_event_times"] > 0
    assert r["variance"] > 0
    ident = r["observed_minus_expected"] ** 2 / r["variance"]
    assert abs(r["chisq"] - ident) < 1e-4 * (1 + ident)
    assert r["curves_differ"] == int(r["chisq"] > 3.841458820694124)


def test_mase_seasonal_naive_identities(spark):
    """n_test must be exactly 12 held-out months with a year-ago
    anchor, and MASE must equal the ratio of the two reported MAEs."""
    from data_seedling_spark.queries_analytics import (
        seasonal_naive_backtest_mase,
    )
    from tests.conftest import SF_SMOKE

    r = seasonal_naive_backtest_mase(spark, SF_SMOKE).collect()[0]
    assert r["n_test"] == 12
    assert r["n_train"] > 12
    assert r["mae_model_dollars"] > 0 and r["mae_naive1_dollars"] > 0
    assert (
        abs(r["mase"] - r["mae_model_dollars"] / r["mae_naive1_dollars"])
        < 1e-4 * (1 + r["mase"])
    )


def test_elasticity_recovers_planted_power_law(spark, tmp_path):
    """Planted q = 1000 · p^(−1.5): the log-log slope must recover
    −1.5 to 4 decimals; and on a constant-quantity series the slope
    must be ~0."""
    import pandas as pd

    from data_seedling_spark.queries_analytics import price_elasticity_loglog

    rows = []
    for i, p in enumerate((1.0, 2.0, 4.0, 8.0, 16.0, 32.0)):
        q = 1000.0 * p ** (-1.5)
        rows.append((i, q, p * q))  # unit price = p
    pd.DataFrame(
        rows, columns=["l_linenumber", "l_quantity", "l_extendedprice"]
    ).to_parquet(str(tmp_path / "lineitem.parquet"))
    r = price_elasticity_loglog(spark, str(tmp_path)).collect()[0]
    assert abs(r["elasticity"] - (-1.5)) < 1e-4

    flat = pd.DataFrame(
        [(i, 5.0, 5.0 * p) for i, p in enumerate((1.0, 2.0, 4.0, 8.0))],
        columns=["l_linenumber", "l_quantity", "l_extendedprice"],
    )
    flat.to_parquet(str(tmp_path / "lineitem.parquet"))
    r2 = price_elasticity_loglog(spark, str(tmp_path)).collect()[0]
    assert abs(r2["elasticity"]) < 1e-6
