"""Property-based tests (hypothesis) for engine invariants the oracle
comparison can't express: merge algebra, decimal-sum exactness, dedup
metrics, masking idempotency."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=25)


@given(target_keys=keys, insert_keys=keys, delete_keys=keys)
@slow
def test_change_feed_algebra(spark, target_keys, insert_keys, delete_keys):
    """apply_change_feed ≡ (target − deletes) ∪ (inserts − that) on key
    sets, for any feed."""
    from data_seedling_spark.operators.merge import (
        CHANGE_TYPE,
        CT_DELETE,
        CT_INSERT,
        apply_change_feed,
    )

    target_keys = sorted(set(target_keys))
    insert_keys = sorted(set(insert_keys))
    delete_keys = sorted(set(delete_keys) - set(insert_keys))
    target = spark.createDataFrame(
        [Row(k=k, v=f"t{k}") for k in target_keys], "k int, v string"
    )
    feed_rows = [Row(k=k, v=f"i{k}", ct=CT_INSERT) for k in insert_keys] + [
        Row(k=k, v=f"d{k}", ct=CT_DELETE) for k in delete_keys
    ]
    feed = spark.createDataFrame(feed_rows, "k int, v string, ct string").withColumnRenamed(
        "ct", CHANGE_TYPE
    )
    got = sorted(r["k"] for r in apply_change_feed(target, feed, ["k"]).collect())
    expected = sorted(
        (set(target_keys) - set(delete_keys)) | set(insert_keys)
    )
    assert got == expected


@given(
    values=st.lists(
        st.decimals(
            min_value=Decimal("-99999.99"),
            max_value=Decimal("99999.99"),
            places=2,
        ),
        min_size=1,
        max_size=40,
    )
)
@slow
def test_dec_sum_equals_exact_decimal_sum(spark, values):
    """dec_sum must equal the exact Decimal sum regardless of partition
    count / addition order (the determinism contract every money
    aggregate relies on)."""
    from data_seedling_spark.queries import dec_sum

    df = spark.createDataFrame(
        [Row(x=float(v)) for v in values], "x double"
    ).repartition(4)
    got = df.agg(dec_sum(F.col("x"), "s")).first()["s"]
    assert got == float(sum(values))


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab @.:/12-"),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@slow
def test_masking_is_idempotent(spark, texts):
    """Masking twice == masking once (placeholders contain no maskable
    patterns) — guards against rules that match their own output."""
    from data_seedling_spark.pipelines.pseudonymise import default_anonymiser
    import pandas as pd

    once = default_anonymiser(pd.Series(texts))
    twice = default_anonymiser(once)
    assert list(once) == list(twice)


@given(
    docs=st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=1, max_size=40),
        min_size=2,
        max_size=10,
    )
)
@slow
def test_jaccard_pairs_symmetric_and_bounded(spark, docs):
    """Exact n-gram Jaccard: scores in [0,1]; identical docs always
    reach threshold 1.0."""
    from data_seedling_spark.operators.dedup import ngram_jaccard_pairs

    # pad so every doc has ≥2 words: a doc with no n-gram shingles has
    # Jaccard 0 against everything by convention (both engines agree),
    # which would vacuously break the guaranteed-dup assertion below
    docs = [t + " zz" for t in docs]
    rows = [Row(doc_id=i, lang="x", text=t) for i, t in enumerate(docs)]
    rows.append(Row(doc_id=len(docs), lang="x", text=docs[0]))  # guaranteed dup
    df = spark.createDataFrame(rows)
    out = ngram_jaccard_pairs(df, "text", "doc_id", ["lang"], n=2, threshold=0.0)
    scores = [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out.collect()]
    assert all(0.0 <= s <= 1.0 for _, _, s in scores)
    dup_score = [s for a, b, s in scores if a == 0 and b == len(docs)]
    assert dup_score and dup_score[0] == 1.0


@given(
    n_rows=st.integers(min_value=20, max_value=120),
    frac=st.sampled_from([0.0, 0.1, 0.25, 0.5, 1.0]),
)
@slow
def test_stratified_hash_sample_properties(spark, n_rows, frac):
    """Stratified hash sampling invariants for any corpus/fraction:
    (1) deterministic — same input, same sample; (2) growth-stable —
    a row's keep/drop never changes when more rows arrive; (3) a
    fraction of 0 keeps nothing and 1.0 keeps the whole stratum."""
    from data_seedling_spark.operators.sampling import stratified_hash_sample

    df = spark.createDataFrame(
        [Row(k=i, s="a" if i % 3 else "b") for i in range(n_rows)],
        "k long, s string",
    )
    kept1 = {r["k"] for r in stratified_hash_sample(df, "k", "s", {"a": frac}).collect()}
    kept2 = {r["k"] for r in stratified_hash_sample(df, "k", "s", {"a": frac}).collect()}
    assert kept1 == kept2  # deterministic

    grown = spark.createDataFrame(
        [Row(k=i, s="a" if i % 3 else "b") for i in range(n_rows * 2)],
        "k long, s string",
    )
    kept_grown = {
        r["k"] for r in stratified_hash_sample(grown, "k", "s", {"a": frac}).collect()
    }
    assert kept1 == {k for k in kept_grown if k < n_rows}  # growth-stable

    a_keys = {i for i in range(n_rows) if i % 3}
    if frac == 0.0:
        assert kept1 == set()
    if frac == 1.0:
        assert kept1 == a_keys  # default 0 drops stratum b entirely


def test_interpolate_linear_gaps_and_edges(spark):
    """Interior gaps draw the straight line between neighbours;
    leading/trailing gaps clamp; known points pass through exactly."""
    from data_seedling_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [
            # series A: known at t=1 (2.0) and t=5 (10.0); edges null
            Row(k="A", t=0, v=None),
            Row(k="A", t=1, v=2.0),
            Row(k="A", t=2, v=None),
            Row(k="A", t=3, v=None),
            Row(k="A", t=4, v=None),
            Row(k="A", t=5, v=10.0),
            Row(k="A", t=6, v=None),
            # series B: single known point
            Row(k="B", t=0, v=None),
            Row(k="B", t=1, v=7.5),
        ],
        "k string, t int, v double",
    )
    out = {
        (r["k"], r["t"]): r["interp_value"]
        for r in interpolate_linear(df, "k", "t", "v").collect()
    }
    assert out[("A", 0)] == 2.0  # leading clamp
    assert out[("A", 1)] == 2.0  # pass-through
    assert out[("A", 2)] == 4.0
    assert out[("A", 3)] == 6.0
    assert out[("A", 4)] == 8.0
    assert out[("A", 5)] == 10.0
    assert out[("A", 6)] == 10.0  # trailing clamp
    assert out[("B", 0)] == 7.5 and out[("B", 1)] == 7.5


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A-ES sampling: deterministic across invocations, k rows out,
    and heavily-weighted rows are overrepresented vs uniform."""
    from data_seedling_spark.operators.sampling import weighted_sample

    # 500 light rows (w=1) + 100 heavy rows (w=50)
    df = spark.createDataFrame(
        [Row(k=i, w=50.0 if i < 100 else 1.0) for i in range(600)]
    )
    got1 = {r["k"] for r in weighted_sample(df, "k", F.col("w"), k=100).collect()}
    got2 = {r["k"] for r in weighted_sample(df, "k", F.col("w"), k=100).collect()}
    assert got1 == got2 and len(got1) == 100
    heavy = sum(1 for k in got1 if k < 100)
    # uniform would give ~17 heavy rows; weight-proportional gives far more
    assert heavy >= 50


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=30),
        min_size=1,
        max_size=8,
    )
)
@slow
def test_chunk_dedup_invariants(spark, docs):
    """For ANY corpus (docs as word-index lists): (1) kept+removed
    chunks == total chunks per doc; (2) removed chunks are exactly
    those whose text occurs in >= 2 distinct docs; (3) clean text is a
    subsequence of the original chunk sequence."""
    from data_seedling_spark.operators.dedup import chunk_dedup

    cw = 3
    rows = [
        Row(doc_id=i, text=" ".join(f"w{x}" for x in words))
        for i, words in enumerate(docs)
    ]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r for r in chunk_dedup(df, "text", "doc_id", chunk_words=cw).collect()}

    def chunks_of(words):
        toks = [f"w{x}" for x in words]
        return [" ".join(toks[i : i + cw]) for i in range(0, len(toks), cw)]

    from collections import defaultdict

    owners = defaultdict(set)
    for i, words in enumerate(docs):
        for c in chunks_of(words):
            owners[c].add(i)
    dup = {c for c, o in owners.items() if len(o) >= 2}
    for i, words in enumerate(docs):
        cs = chunks_of(words)
        expect_kept = [c for c in cs if c not in dup]
        assert out[i]["clean_text"] == " ".join(expect_kept)
        assert out[i]["n_removed_chunks"] == len(cs) - len(expect_kept)


@given(
    points=st.lists(st.integers(min_value=-50, max_value=150), min_size=0, max_size=40),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=120),
            st.integers(min_value=1, max_value=60),
        ),
        min_size=0,
        max_size=10,
    ),
)
@slow
def test_interval_join_equals_theta_for_any_inputs(spark, points, ivs):
    """Binned interval join == naive theta join for arbitrary points
    and intervals (incl. negatives, empty sides, bin-straddling
    spans), with no duplicate pairs."""
    from data_seedling_spark.operators.relational import interval_join

    pdf = spark.createDataFrame(
        [Row(pid=i, x=float(x)) for i, x in enumerate(points)], "pid int, x double"
    )
    idf = spark.createDataFrame(
        [Row(iid=i, lo=float(lo), hi=float(lo + span)) for i, (lo, span) in enumerate(ivs)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pdf, idf, "x", "lo", "hi", bin_width=16).collect()
    )
    expect = sorted(
        (i, j)
        for i, x in enumerate(points)
        for j, (lo, span) in enumerate(ivs)
        if lo <= x < lo + span
    )
    assert got == expect
    assert len(got) == len(set(got))


@slow
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # order value
            st.integers(min_value=0, max_value=50),        # tie-break id
        ),
        min_size=1,
        max_size=40,
    ),
    width=st.sampled_from([1, 7, 100, 10_000]),
)
def test_range_rank_equals_global_row_number(spark, vals, width):
    """range_rank's contract: for ANY data and ANY bucket width, the
    two-pass bucketed rank equals row_number() OVER (ORDER BY val, id)
    — monotone buckets mean ties never straddle buckets, so the
    partitioned windows + broadcast offsets reproduce the global sort
    exactly (what gini_revenue_concentration relies on)."""
    from pyspark.sql import Window as W

    from data_seedling_spark.operators.sampling import range_rank

    # duplicate (val, id) pairs would make row_number itself
    # nondeterministic — the contract is over unique sort keys
    rows = [Row(val=v, id=i) for v, i in sorted(set(vals))]
    df = spark.createDataFrame(rows, "val long, id long")
    got = {
        (r["val"], r["id"]): r["rank"]
        for r in range_rank(
            df, "val", tie_cols=("id",),
            bucket_expr=F.floor(F.col("val") / width),
        ).collect()
    }
    want = {
        (r["val"], r["id"]): r["rank"]
        for r in df.select(
            "val", "id",
            F.row_number().over(W.orderBy("val", "id")).alias("rank"),
        ).collect()
    }
    assert got == want


@slow
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # axis 1
            st.integers(min_value=-50, max_value=50),      # axis 2
        ),
        min_size=1,
        max_size=40,
    ),
    width=st.sampled_from([1, 7, 10_000]),
)
def test_range_rank_multi_equals_per_axis_global_row_number(
    spark, vals, width
):
    """range_rank_multi's contract (r12, the shared-offsets fusion of
    several range_rank axes — what rfm relies on): for ANY frame and
    ANY bucket width, every axis's rank equals its own global
    row_number() OVER (ORDER BY axis, id) — identical to composing
    nested range_rank calls, with all offsets frames derived from the
    shared base."""
    from pyspark.sql import Window as W

    from data_seedling_spark.operators.sampling import range_rank_multi

    rows = [
        Row(a=v, b=w, id=i)
        for i, (v, w) in enumerate(sorted(set(vals)))
    ]
    df = spark.createDataFrame(rows, "a long, b long, id long")
    got = {
        (r["a"], r["b"], r["id"]): (r["ra"], r["rb"])
        for r in range_rank_multi(
            df,
            [
                ("ra", "a", ("id",), F.floor(F.col("a") / width)),
                ("rb", "b", ("id",), F.col("b")),
            ],
        ).collect()
    }
    want = {
        (r["a"], r["b"], r["id"]): (r["ra"], r["rb"])
        for r in df.select(
            "a", "b", "id",
            F.row_number().over(W.orderBy("a", "id")).alias("ra"),
            F.row_number().over(W.orderBy("b", "id")).alias("rb"),
        ).collect()
    }
    assert got == want


@slow
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # order value
            st.integers(min_value=1, max_value=9),         # weight
        ),
        min_size=1,
        max_size=40,
    ),
    width=st.sampled_from([1, 7, 100, 10_000]),
    inclusive=st.booleans(),
)
def test_range_cumsum_equals_global_running_sum(spark, vals, width, inclusive):
    """range_cumsum's contract (r11, the running-sum twin of
    range_rank): for ANY unique-valued frame, ANY bucket width, and
    both frame kinds, the bucketed two-pass cumulative sum equals
    SUM(w) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING AND
    {CURRENT ROW | 1 PRECEDING}) — what the spearman midranks and the
    AUC/PR-AUC ROC accumulations rely on."""
    from pyspark.sql import Window as W

    from data_seedling_spark.operators.sampling import range_cumsum

    uniq = {}
    for v, w in vals:
        uniq.setdefault(v, w)  # order values must be unique
    rows = [Row(val=v, w=w) for v, w in sorted(uniq.items())]
    df = spark.createDataFrame(rows, "val long, w long")
    got = {
        r["val"]: r["_cumsum"]
        for r in range_cumsum(
            df, "val", "w",
            bucket_expr=F.floor(F.col("val") / width), inclusive=inclusive,
        ).collect()
    }
    hi = 0 if inclusive else -1
    win = W.orderBy("val").rowsBetween(W.unboundedPreceding, hi)
    want = {
        r["val"]: r["cs"]
        for r in df.select(
            "val",
            F.coalesce(F.sum("w").over(win), F.lit(0)).alias("cs"),
        ).collect()
    }
    assert got == want


def test_range_cumsum_multi_weight_equals_chained_singles(spark):
    """The list form (r12): two running sums over the same order
    column in one pass must equal two chained single-weight calls —
    same windows, shared bucket counts/offsets (what ks_test_drift
    and the PR-AUC accumulation rely on)."""
    from data_seedling_spark.operators.sampling import range_cumsum

    rows = [Row(val=v, a=v % 5 + 1, b=(v * 7) % 3 + 1) for v in range(40)]
    df = spark.createDataFrame(rows, "val long, a long, b long")
    bexpr = F.floor(F.col("val") / 7)
    fused = {
        r["val"]: (r["ca"], r["cb"])
        for r in range_cumsum(
            df, "val", ["a", "b"], bucket_expr=bexpr,
            out_col=["ca", "cb"], inclusive=True,
        ).collect()
    }
    chained = range_cumsum(
        df, "val", "a", bucket_expr=bexpr, out_col="ca", inclusive=True
    )
    chained = {
        r["val"]: (r["ca"], r["cb"])
        for r in range_cumsum(
            chained, "val", "b", bucket_expr=bexpr, out_col="cb",
            inclusive=True,
        ).collect()
    }
    assert fused == chained


@slow
@given(
    n_words=st.integers(min_value=1, max_value=120),
    chunk=st.integers(min_value=2, max_value=40),
    stride_frac=st.floats(min_value=0.25, max_value=1.0),
)
def test_chunk_overlap_invariants_any_geometry(spark, n_words, chunk, stride_frac):
    """For ANY (doc length, chunk size, stride<=chunk): chunks at
    stride offsets reconstruct the document exactly, every chunk is
    non-empty and <=chunk_size, overlap width is chunk-stride except
    possibly at the tail, and short docs emit exactly one chunk."""
    from data_seedling_spark.operators.textstats import chunk_with_overlap

    stride = max(1, int(chunk * stride_frac))
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_with_overlap(df, "text", "doc_id", chunk_size=chunk, stride=stride)
        .collect(),
        key=lambda r: r["chunk_id"],
    )
    assert rows[0]["chunk_id"] == 0
    rebuilt: list = []
    for r in rows:
        cw = r["chunk_text"].split(" ")
        assert 1 <= len(cw) == r["n_words"] <= chunk
        start = r["chunk_id"] * stride
        assert cw == words[start : start + chunk]
        rebuilt = rebuilt[:start] + cw
    assert rebuilt == words
    if n_words <= chunk:
        assert len(rows) == 1


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    f=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, f, seed):
    """Any uint8 RGB image, any scanline filter: encode→decode is the
    identity (the unfilter recurrences invert the filters exactly)."""
    import numpy as np

    from data_seedling_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_png_pixels(encode_png(img, filter_type=f)) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    wb=st.integers(min_value=1, max_value=4),
    hb=st.integers(min_value=1, max_value=4),
    q=st.sampled_from([1, 2, 4, 8]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_constant_block_roundtrip_property(wb, hb, q, seed):
    """Any constant-8x8-block gray image, any quant value dividing 8:
    JPEG encode→decode is the identity (DC-only blocks survive the
    float DCT and uniform quantization exactly)."""
    import numpy as np

    from data_seedling_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    blocks = np.random.default_rng(seed).integers(0, 256, (hb, wb))
    img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    assert np.array_equal(decode_jpeg_pixels(encode_jpeg(img, quant_value=q)), img)


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d"]),      # group
                st.integers(min_value=0, max_value=99),      # cents
                st.sampled_from(["insert", "delete"]),
            ),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=4,
    )
)
@slow
def test_matview_incremental_equals_recompute(spark, tmp_path_factory, batches):
    """IVM soundness for ANY change sequence: folding batches
    incrementally lands on exactly the aggregate a full recompute of
    the net row state gives — deletes only fire for live rows (the
    change feed is taken from the ledger, which enforces that), and
    decimal measures make ⊕/⊖ order-irrelevant."""
    from collections import Counter

    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.operators.matview import (
        COUNT_COL,
        MaterializedAggregate,
    )
    from data_seedling_spark.operators.merge import CHANGE_TYPE

    tmp = tmp_path_factory.mktemp("ivm_prop")
    src = VersionedTable(spark, str(tmp / "src"), write_partitions=1)
    view = MaterializedAggregate(
        spark,
        VersionedTable(spark, str(tmp / "gold"), write_partitions=1),
        group_keys=["grp"],
        sum_measures={"revenue": "amount"},
    )
    live: dict[int, tuple[str, int]] = {}   # rid -> (grp, cents)
    next_id = 0
    first = True
    for batch in batches:
        rows = []
        deleted_in_batch: set[int] = set()
        # deletes target rows live BEFORE this batch: a same-commit
        # insert+delete of one key is not a shape a real change feed
        # emits (and the merge's net-effect rule would keep the insert)
        live_before = set(live)
        for grp, cents, op in batch:
            if op == "insert":
                rows.append(Row(rid=next_id, grp=grp,
                                amount=cents / 1.0, ct="insert"))
                live[next_id] = (grp, cents)
                next_id += 1
            elif not first:
                victim = next(
                    (rid for rid in live_before
                     if live.get(rid) == (grp, cents)
                     and rid not in deleted_in_batch),
                    None,
                )
                if victim is not None:
                    # delete a REAL live row, pre-image carried (CDC shape)
                    rows.append(Row(rid=victim, grp=grp,
                                    amount=cents / 1.0, ct="delete"))
                    deleted_in_batch.add(victim)
                    del live[victim]
        if not rows:
            continue
        df = spark.createDataFrame(rows).withColumnRenamed("ct", CHANGE_TYPE)
        if first:
            src.write(df.where(F.col(CHANGE_TYPE) == "insert")
                      .drop(CHANGE_TYPE), mode="overwrite")
            first = False
        else:
            src.merge(df, primary_keys=["rid"])
        view.refresh(src)
    if first:
        return  # no non-empty batch generated
    expected: dict = {}
    for grp, cents in live.values():
        cnt, total = expected.get(grp, (0, Decimal("0.00")))
        expected[grp] = (cnt + 1, total + Decimal(cents))
    got = {
        r["grp"]: (r[COUNT_COL], r["revenue"])
        for r in view.table.read().collect()
    }
    assert got == {g: (c, t.quantize(Decimal("0.01"))) for g, (c, t) in expected.items()}
    # and the view equals a full recompute of the actual source snapshot
    recomputed = {
        r["grp"]: (r["c"], r["t"])
        for r in src.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.round("amount", 2).cast("decimal(18,2)"))
            .cast("decimal(18,2)").alias("t"),
        )
        .collect()
    }
    assert got == recomputed


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=3,
            max_size=10,
        ),
        min_size=2,
        max_size=8,
    ),
    num=st.sampled_from([3, 4]),
)
@slow
def test_prefix_filter_exactness_property(spark, docs, num):
    """PPJoin prefix filter ≡ brute-force all-pairs Jaccard at
    threshold num/5, for ANY corpus of token sequences."""
    from data_seedling_spark.operators.dedup import (
        jaccard,
        prefix_filter_jaccard_pairs,
        word_shingles,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_jaccard_pairs(
            df, "text", "doc_id", n=2, threshold_num=num, threshold_den=5
        ).collect()
    }
    sh = df.select("doc_id", word_shingles(F.col("text"), 2).alias("s")).where(
        F.size("s") > 0
    )
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jaccard(F.col("a.s"), F.col("b.s")), 4).alias("j"),
        )
        .where(F.col("j") >= num / 5)
        .collect()
    }
    assert got == brute


@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["red", "blue", "green", "ox", "cat"]),
                min_size=1,
                max_size=6,
            ),
            st.sampled_from(["A", "B"]),
        ),
        min_size=2,
        max_size=10,
    ).filter(lambda d: len({label for _, label in d}) == 2)
)
@slow
def test_naive_bayes_matches_python_reference(spark, docs):
    """nb_train/nb_score ≡ a from-scratch Python multinomial NB (on
    the same 1e-6 log grid) for ANY small labeled corpus — priors,
    smoothing, unseen floor, and the (score, label) argmax all agree."""
    import math
    from collections import Counter, defaultdict

    from data_seedling_spark.operators.nbayes import nb_score, nb_train

    rows = [(i, " ".join(words), lab) for i, (words, lab) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    cond, priors = nb_train(df, "text", "lang", alpha=1.0)
    got = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in nb_score(df, "text", "doc_id", cond, priors, "lang").collect()
    }

    # reference
    ctk = defaultdict(Counter)
    nl = Counter()
    for words, lab in docs:
        nl[lab] += 1
        ctk[lab].update(words)
    vocab = {w for words, _ in docs for w in words}
    n = len(docs)
    labels = sorted(nl)
    for i, (words, _) in enumerate(docs):
        best = None
        for lab in labels:
            tot = sum(ctk[lab].values())
            s = round(math.log(nl[lab] / n), 6)
            for w, c in Counter(words).items():
                p = (ctk[lab][w] + 1.0) / (tot + len(vocab))
                s += c * round(math.log(p), 6)
            s = round(s, 6)
            if best is None or s > best[1] or (s == best[1] and lab < best[0]):
                best = (lab, s)
        assert got[i][0] == best[0], (i, got[i], best)
        assert abs(got[i][1] - best[1]) < 1e-6, (i, got[i], best)
