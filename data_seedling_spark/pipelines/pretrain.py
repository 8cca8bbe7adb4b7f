"""The end-to-end pretraining-corpus pipeline: the engine's operators
composed the way a real 100 TB data-curation job runs them.

    raw documents
      → quality gate        (Gopher/C4 heuristics; textstats)
      → exact dedup         (content-hash groups; dedup)
      → temperature mix     (alpha-smoothed language rebalance; sampling)
      → train/val/test split(leak-proof hash split; sampling)
      → sharded packing     (token-budget bins per split shard; sampling)

Every stage is deterministic (pure functions of keys + corpus stats),
so the WHOLE composition is reproducible run-over-run and — the
engine's signature property — hash-verifiable against a relational
oracle end-to-end (`pretraining_corpus_pipeline` in queries_llm).

Scale posture: stages communicate only by narrow columns (ids, hashes,
counts); text is scanned twice (quality + dedup hash) and never
shuffled; the mixing/split decisions add zero shuffles; packing windows
are per-(split, shard), so parallelism is n_splits × n_shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.sampling import hash_bucket


def build_pretraining_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_words: int = 50,
    max_rep_ratio: float = 0.2,
    alpha: float = 0.5,
    train_pct: int = 90,
    validation_pct: int = 5,
    budget: int = 2048,
    n_shards: int = 4,
) -> DataFrame:
    """Run the full curation pipeline; returns one row per packed
    document replica: ``(doc_id, copy_num, lang, split, shard, bin_id,
    n_tokens)``.

    Implementation notes (each mirrors its standalone operator; they
    are inlined here so the composition stays ONE lazy plan end-to-end
    — no intermediate actions, checkpoints, or caches):

    - quality gate = word count + repeated-trigram ratio,
    - dedup keeps the min id per sha2(text) (WindowGroupLimit prunes),
    - temperature mixing computes corpus shares on the *surviving*
      corpus (a |langs|-row broadcast),
    - replica order key is ``doc_id * (max copies) + copy_num`` so the
      packing order is total and engine-portable,
    - packing = exclusive running token sum per (split, shard) window.
    """
    words = F.split(F.col(text_col), " ")
    # Repeated-trigram ratio over HASHED trigrams: per-word xxhash64
    # once (materialised column), then trigram hash = xxhash64 chain of
    # three consecutive word hashes via zip_with over shifted slices —
    # no n-gram strings ever materialise. Distinct-count equals the
    # string formulation unless xxhash64 collides within one document
    # (P ≈ grams²/2⁶⁵ ≈ 1e-14 per doc); measured 7.6× faster than
    # concat_ws trigram strings at sf0.1 (2.87 s → 0.38 s for this
    # stage). Beware element_at(expr, i) on a COMPUTED array: it
    # re-evaluates the whole array per access (measured 3× slower
    # than strings) — the hoisted column + zip_with form is what makes
    # hashing win.
    wh = F.col("_wh")
    n = F.size(wh)
    h12 = F.zip_with(
        F.slice(wh, 1, n - 2), F.slice(wh, 2, n - 2), lambda a, b: F.xxhash64(a, b)
    )
    grams = F.when(
        n >= 3,
        F.zip_with(h12, F.slice(wh, 3, n - 2), lambda a, b: F.xxhash64(a, b)),
    ).otherwise(F.array().cast("array<bigint>"))
    rep_ratio = (F.size(grams) - F.size(F.array_distinct(grams))).cast(
        "double"
    ) / F.greatest(F.size(grams), F.lit(1))
    quality = (
        df.withColumn("_wh", F.transform(words, lambda w: F.xxhash64(w)))
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.col(text_col),
            F.size(words).alias("n_tokens"),
            rep_ratio.alias("_rep"),
        )
        .where((F.col("n_tokens") >= min_words) & (F.col("_rep") <= max_rep_ratio))
        .drop("_rep")
    )

    dedup_w = W.partitionBy(F.sha2(F.col(text_col).cast("binary"), 256)).orderBy(
        id_col
    )
    deduped = (
        quality.withColumn("_rn", F.row_number().over(dedup_w))
        .where(F.col("_rn") == 1)
        .select(id_col, lang_col, "n_tokens")
    )

    counts = deduped.groupBy(lang_col).agg(F.count("*").alias("_c"))
    smoothed = counts.select(
        lang_col,
        F.col("_c"),
        F.round(F.pow(F.col("_c").cast("double"), F.lit(alpha)), 6).alias("_ca"),
    )
    totals = smoothed.agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_ca").cast("decimal(28,6)")).cast("double").alias("_za"),
    )
    weights = smoothed.join(F.broadcast(totals)).select(
        lang_col,
        F.round((F.col("_ca") / F.col("_za")) * F.col("_n") / F.col("_c"), 6).alias(
            "_w"
        ),
    )
    bucket = hash_bucket(F.col(id_col), 1000)
    n_copies = (
        F.floor(F.col("_w")).cast("int")
        + (bucket < F.round((F.col("_w") - F.floor(F.col("_w"))) * 1000)).cast("int")
    )
    mixed = (
        deduped.join(F.broadcast(weights), lang_col)
        .withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") >= 1)
        .withColumn("copy_num", F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .withColumn("copy_num", F.col("copy_num").cast("long"))
        .drop("_w", "_n_copies")
    )

    split_bucket = hash_bucket(F.col(id_col), 100)
    split = (
        F.when(split_bucket < train_pct, "train")
        .when(split_bucket < train_pct + validation_pct, "validation")
        .otherwise("test")
    )
    # total replica order key: copies are bounded by ceil(max weight)+1
    seq_id = F.col(id_col) * 8 + F.col("copy_num")
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(seq_id.cast("string")), 1, 8), 16, 10
        ).cast("bigint"),
        F.lit(n_shards),
    )
    with_keys = mixed.withColumn("split", split).withColumn("shard", shard)
    pack_w = (
        W.partitionBy("split", "shard")
        .orderBy(seq_id)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum("n_tokens").over(pack_w), F.lit(0))
    return with_keys.select(
        id_col,
        "copy_num",
        lang_col,
        "split",
        "shard",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(tokens_before / budget).cast("long").alias("bin_id"),
    )
