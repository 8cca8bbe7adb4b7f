"""Mining-query skew guards (power-user cap for basket self-joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_seedling_spark.queries_mining import cap_power_users


def _basket(spark, rows):
    return spark.createDataFrame(rows, "cust long, item long, c long")


def test_cap_drops_only_hot_customers(spark):
    rows = [(1, i, 1) for i in range(100)]  # hot customer: 100 items
    rows += [(2, 1, 2), (2, 2, 1), (3, 1, 1)]  # normal baskets
    out = cap_power_users(_basket(spark, rows), max_basket=10)
    got = {(r["cust"], r["item"]) for r in out.collect()}
    assert got == {(2, 1), (2, 2), (3, 1)}


def test_cap_bounds_pair_count_under_hot_key(spark):
    # One injected hot customer (200 items → 19,900 pairs uncapped)
    # among 20 normal 5-item customers (10 pairs each).
    rows = [(999, i, 1) for i in range(200)]
    for cust in range(20):
        rows += [(cust, cust * 10 + j, 1) for j in range(5)]
    basket = cap_power_users(_basket(spark, rows), max_basket=50)
    a, b = basket.alias("a"), basket.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cust") == F.col("b.cust")) & (F.col("a.item") < F.col("b.item")),
    ).count()
    # Capped: exactly the 20 normal customers' C(5,2)=10 pairs each.
    assert pairs == 200
    # And the bound holds structurally: no kept basket exceeds the cap.
    max_kept = (
        basket.groupBy("cust").agg(F.count("*").alias("k"))
        .agg(F.max("k").alias("m")).collect()[0]["m"]
    )
    assert max_kept <= 50


def test_copurchase_pairs_bounded_under_hot_basket(spark):
    """The shared lineitem⋈lineitem pair builder must drop a hot
    basket BEFORE the self-join: one injected 120-line order among
    normal 4-line orders, cap 50 → only the normal orders pair up,
    and the output carries (o, u, v) with multiplicity so callers can
    count support without re-joining."""
    from data_seedling_spark.queries_mining import copurchase_pairs

    rows = [(9999, i) for i in range(120)]  # hot order: C(120,2)=7140 pairs
    for o in range(10):
        rows += [(o, o * 10 + j) for j in range(4)]  # C(4,2)=6 pairs each
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    pairs = copurchase_pairs(li, max_basket=50)
    assert pairs.columns == ["o", "u", "v"]
    got = pairs.collect()
    assert len(got) == 60
    assert all(r["o"] != 9999 and r["u"] < r["v"] for r in got)


def test_copurchase_pairs_keeps_multiplicity(spark):
    """Duplicate (order, part) lines multiply pairs — the weighted
    callers (bellman_ford edge weights) rely on that."""
    from data_seedling_spark.queries_mining import copurchase_pairs

    li = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)], "l_orderkey long, l_partkey long"
    )
    got = [(r["u"], r["v"]) for r in copurchase_pairs(li).collect()]
    assert sorted(got) == [(10, 20), (10, 20)]


def test_cap_noop_when_under_threshold(spark):
    rows = [(1, 1, 3), (1, 2, 1), (2, 7, 2)]
    df = _basket(spark, rows)
    out = cap_power_users(df, max_basket=200)
    assert sorted(out.collect()) == sorted(df.collect())


def test_attribution_window_excludes_old_and_post_clicks(spark):
    """Only clicks strictly inside (purchase−24h, purchase) attribute;
    purchases with no qualifying click drop out."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # (event_id, ts, user_id, event_type)
        (1, base - dt.timedelta(hours=30), 7, "click"),   # too old
        (2, base - dt.timedelta(hours=2), 7, "click"),    # first qualifying
        (3, base - dt.timedelta(hours=1), 7, "click"),    # last qualifying
        (4, base + dt.timedelta(hours=1), 7, "click"),    # after purchase
        (5, base, 7, "purchase"),
        (6, base, 8, "purchase"),                          # no clicks at all
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    ).withColumn("value", F.lit(0.0)).withColumn("props", F.lit("{}"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for name in (
            "events",
        ):
            events.write.mode("overwrite").parquet(f"{d}/{name}.parquet")
        from data_seedling_spark.queries import registry

        out = {
            r["purchase_id"]: r
            for r in registry()["attribution_touchpoints"].fn(spark, d).collect()
        }
    assert set(out) == {5}
    r = out[5]
    assert r["n_touches"] == 2
    assert r["first_touch_id"] == 2 and r["last_touch_id"] == 3


def test_attribution_tied_timestamps_break_on_click_id(spark):
    """Regression for the r6 tie-break fix: two clicks at the SAME
    timestamp — min_by/max_by over struct(ts, click_id) must pick the
    smallest click_id as first touch and the largest as last touch
    (the oracle's deterministic ordering), never an arbitrary one."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 10, 12, 0, 0)
    tie = base - dt.timedelta(hours=3)
    rows = [
        (21, tie, 7, "click"),
        (20, tie, 7, "click"),   # same ts, lower id → first touch
        (22, tie, 7, "click"),   # same ts, highest id
        (30, base, 7, "purchase"),
    ]
    events = (
        spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit("{}"))
    )
    with tempfile.TemporaryDirectory() as d:
        events.write.mode("overwrite").parquet(f"{d}/events.parquet")
        from data_seedling_spark.queries import registry

        out = registry()["attribution_touchpoints"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_touches"] == 3
    assert r["first_touch_id"] == 20
    assert r["last_touch_id"] == 22


def test_als_sweep_ridge_solution_is_local_optimum(spark):
    """The ALS item update must satisfy its normal equations: for a
    sampled item, rebuilding (V'V+λI)w - V'r from the same rounded
    user factors must give ~0 gradient (validates the closed-form
    2x2 solve + regrid pipeline, independent of the SQL oracle)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_seedling_spark.queries_mining import als_factorization_sweep
    from tests.conftest import SF_SMOKE

    out = als_factorization_sweep(spark, SF_SMOKE)
    rows = out.limit(5).collect()
    assert rows and all(r["n_ratings"] >= 1 for r in rows)

    # reconstruct the user-factor frame exactly as the query does
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    ratings = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("u"),
            F.col("l_partkey").alias("p"),
            F.col("l_quantity").cast("long").alias("r"),
        )
    )
    lam = 0.25
    import collections

    per_user = collections.defaultdict(list)
    for rr in ratings.collect():
        per_user[rr["u"]].append((rr["p"], rr["r"]))
    ufac = {}
    for u, items in per_user.items():
        V = np.array([[1.0, ((p % 7) - 3) / 2.0] for p, _ in items])
        r = np.array([float(x) for _, x in items])
        x = np.linalg.solve(V.T @ V + lam * np.eye(2), V.T @ r)
        ufac[u] = np.round(x, 6)
    by_part = collections.defaultdict(list)
    for rr in ratings.collect():
        by_part[rr["p"]].append((ufac[rr["u"]], float(rr["r"])))
    for row in rows:
        U = np.array([u for u, _ in by_part[row["part_id"]]])
        r = np.array([x for _, x in by_part[row["part_id"]]])
        w = np.array([row["w1"], row["w2"]])
        grad = (U.T @ U + lam * np.eye(2)) @ w - U.T @ r
        # w and the user factors are rounded to the 1e-6 grid, so the
        # residual scales with the normal-equation magnitudes
        tol = 2e-6 * (np.abs(U.T @ U).sum() + np.abs(U.T @ r).sum() + 1)
        assert np.abs(grad).max() < tol, (row["part_id"], grad, tol)


def test_link_prediction_hand_graph(spark, tmp_path):
    """Path graph 1-2-3 built from two 2-line baskets: the only
    non-adjacent pair is (1,3) with one common neighbor (2) and
    Jaccard 1/(1+1-1) = 1.0; adjacent pairs must not appear."""
    import pandas as pd

    from data_seedling_spark.queries_mining import link_prediction_jaccard

    li = pd.DataFrame(
        {
            "l_orderkey": [10, 10, 20, 20],
            "l_partkey": [1, 2, 2, 3],
            "l_shipdate": pd.to_datetime(["1995-06-01"] * 4),
        }
    )
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    rows = link_prediction_jaccard(spark, str(tmp_path)).collect()
    assert [(r["part_a"], r["part_b"]) for r in rows] == [(1, 3)]
    r = rows[0]
    assert r["common_neighbors"] == 1
    assert r["deg_a"] == 1 and r["deg_b"] == 1
    assert r["jaccard"] == 1.0


def test_sequential_patterns_hand_journeys(spark, tmp_path):
    """Two hand journeys: user 1 = v,c,p and user 2 = v,p,c. Pattern
    v>c>p must be supported only by user 1; v>c by both; c>c by
    neither (needs two c's)."""
    import pandas as pd

    from data_seedling_spark.queries_mining import (
        sequential_patterns_prefixspan,
    )

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:0%d" % i for i in range(6)]
            ),
            "user_id": [1, 1, 1, 2, 2, 2],
            "event_type": [
                "view", "click", "purchase", "view", "purchase", "click",
            ],
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    ev.to_parquet(str(tmp_path / "events.parquet"))
    sup = {
        r["pattern"]: r["support"]
        for r in sequential_patterns_prefixspan(spark, str(tmp_path)).collect()
    }
    assert sup["v>c"] == 2
    assert sup["v>c>p"] == 1
    assert sup["v>p>c"] == 1
    assert "c>c" not in sup


def test_ktruss_peels_monotone_and_hand_graph(spark, tmp_path):
    """Peeling never adds edges (monotone round census); a 4-clique
    basket survives k=4 trussing while a star basket... cannot form
    one (a star has no triangles). Hand fixture: one order with 4
    parts (K4: every edge in 2 triangles -> survives), one order with
    2 parts (single edge, no triangle -> peeled in round 1)."""
    import pandas as pd

    from data_seedling_spark.queries_mining import ktruss_copurchase

    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 1, 2, 2],
            "l_partkey": [10, 11, 12, 13, 20, 21],
            "l_shipdate": pd.to_datetime(["1995-06-01"] * 6),
        }
    )
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    r = ktruss_copurchase(spark, str(tmp_path)).collect()[0]
    assert r["n_edges_initial"] == 7  # K4 (6 edges) + 1 lone edge
    assert r["n_after_round1"] == 6
    assert r["n_after_round2"] == 6
    assert r["n_after_round3"] == 6
    assert r["n_nodes_final"] == 4
    assert (
        r["n_edges_initial"]
        >= r["n_after_round1"]
        >= r["n_after_round2"]
        >= r["n_after_round3"]
    )


def test_apriori_prune_and_planted_triple(spark, tmp_path):
    """Planted fixture: parts (1,2,3) appear together in 6 baskets
    (clears every support gate), part 99 appears in ONE basket only
    (pruned at L1, so no pair or triple containing it survives).
    The census must reflect the funnel and the top triple must be
    (1,2,3) with support 6."""
    import pandas as pd

    from data_seedling_spark.queries_mining import apriori_triples_census

    rows = []
    for o in range(6):
        rows += [(o, 1), (o, 2), (o, 3)]
    rows += [(100, 99), (100, 1)]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).to_parquet(
        str(tmp_path / "lineitem.parquet")
    )
    r = apriori_triples_census(spark, str(tmp_path)).collect()[0]
    assert r["n_baskets"] == 7
    assert r["n_items"] == 4
    assert r["n_l1"] == 3          # 99 pruned (support 1 < 5)
    assert r["n_l2"] == 3          # (1,2) (1,3) (2,3)
    assert r["n_c3"] == 1 and r["n_l3"] == 1
    assert (r["top_a"], r["top_b"], r["top_c"]) == (1, 2, 3)
    assert r["top_support"] == 6


def test_hits_authority_prefers_hub_endorsement(spark, tmp_path):
    """Planted bipartite graph: part 10 is bought by three customers
    who buy EVERYTHING (strong hubs); part 20 is bought by three
    one-shot customers. Same degree — HITS must rank 10 above 20."""
    import pandas as pd

    from data_seedling_spark.queries_mining import hits_bipartite_copurchase

    rows = []
    oid = 0
    # hubs 1-3 buy parts 10, 30, 40, 50
    for c in (1, 2, 3):
        for p in (10, 30, 40, 50):
            rows.append((oid, c, p)); oid += 1
    # one-shot customers 7-9 buy only part 20
    for c in (7, 8, 9):
        rows.append((oid, c, 20)); oid += 1
    li = pd.DataFrame(
        [(i, p) for i, _, p in rows], columns=["l_orderkey", "l_partkey"]
    )
    od = pd.DataFrame(
        [(i, c) for i, c, _ in rows], columns=["o_orderkey", "o_custkey"]
    )
    li.to_parquet(str(tmp_path / "lineitem.parquet"))
    od.to_parquet(str(tmp_path / "orders.parquet"))
    out = hits_bipartite_copurchase(spark, str(tmp_path)).collect()
    score = {r["part"]: r["authority_micro"] for r in out}
    assert score[10] > score[20]
    assert score[10] == 1000000  # the max authority normalizes to 1e6
