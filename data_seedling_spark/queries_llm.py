"""LLM-data-pipeline query registrations (SURVEY §7 Phase 4 / the
north-star additions): dedup, similarity search, text analysis,
multimodal columns — each oracle-checked where SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.similarity import oracle_arrow
from .queries import query
from .tables import load_table

_VOCAB_SQL = "('the','a','and','of','to')"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
    tags=("dedup-exact",),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: representative + multiplicity per distinct text,
    grouped on the 32-byte content hash so the document bodies never
    shuffle (operators.dedup.exact_dedup_groups)."""
    from .operators.dedup import exact_dedup_groups

    documents = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(documents, "text", "doc_id")


@query(
    "ngram_jaccard_dedup",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id, lang,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            FOR i IN range(1, greatest(len(w) - 1, 1))]) AS shingles
      FROM t
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8
    """,
    tags=("dedup-jaccard",),
)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (≥0.8) within language
    blocks — the oracle-checkable ground truth that minhash_lsh_near_dup
    approximates at scale."""
    from .operators.dedup import ngram_jaccard_pairs

    documents = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        documents, "text", "doc_id", block_cols=["lang"], n=3, threshold=0.8
    )


@query("minhash_lsh_near_dup", oracle=None, tags=("dedup-minhash-lsh",))
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(8 bands) near-dup pairs with exact-Jaccard
    verification — the linear-shuffle scale path. Signature minima are
    hash-function-specific, so the driver records rows-only; the pytest
    suite asserts recall of every exact-dup pair and zero false
    positives vs the blocked ground truth."""
    from .operators.dedup import minhash_lsh_pairs

    documents = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(documents, "text", "doc_id", threshold=0.8)


@query("simhash_documents", oracle=None, tags=("dedup-simhash",))
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (hex) per document; identical texts
    collide exactly, near-identical token multisets land within small
    Hamming distance (verified in tests)."""
    from .operators.dedup import simhash64

    documents = load_table(spark, sf_dir, "documents")
    return simhash64(documents, "text", "doc_id")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "similarity_topk_bruteforce",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(list_dot_product(qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
                   6) AS score
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rank FROM scored
    ) WHERE rank <= 5
    """,
    tags=("similarity-topk",),
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for queries vec_id<10: broadcast query set ⋈
    corpus, JVM fold for dot/norms, rank window. The correctness
    baseline for the LSH ANN variant."""
    from .operators.similarity import cosine_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    queries = embeddings.where(F.col("vec_id") < 10)
    return cosine_topk(queries, embeddings, k=5)


@query("ann_lsh_hyperplane", oracle=None, tags=("similarity-ann",))
def ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs top-3 via multi-table random-hyperplane
    LSH (8 tables × 8 sign bits; miss probability decays exponentially
    in table count). Rows-only check: bucket contents are hash-
    specific; tests assert recall floors against the brute-force twin
    (planted near-dups and natural top-k; measured curve in
    docs/SCALE.md §ann)."""
    from .operators.similarity import hyperplane_lsh_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    return hyperplane_lsh_topk(embeddings, k=3, n_planes=8, n_tables=8)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           len(w) AS n_words,
           len(list_distinct(w)) AS n_distinct_words,
           round(len(list_distinct(w))::DOUBLE / len(w), 4) AS type_token_ratio,
           round(len(list_filter(w, x -> x IN {_VOCAB_SQL}))::DOUBLE / len(w), 4)
             AS stopword_ratio,
           round(list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w), 4)
             AS mean_word_len
    FROM t
    """,
    tags=("text-quality",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality signals (C4/Gopher-style heuristic inputs), all
    JVM expressions."""
    from .operators.textstats import quality_scores

    documents = load_table(spark, sf_dir, "documents")
    return quality_scores(documents, "text", "doc_id")


@query(
    "language_id_documents",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    v AS (
      SELECT doc_id,
             len(list_filter(w, x -> x IN ('the','a','and','of','to'))) AS en_hits,
             len(list_filter(w, x -> x IN ('der','die','das','und','zu'))) AS de_hits,
             len(list_filter(w, x -> x IN ('el','la','los','y','de'))) AS es_hits,
             len(list_filter(w, x -> x IN ('le','la','les','et','de'))) AS fr_hits
      FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
                WHEN en_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'en'
                WHEN de_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'de'
                WHEN es_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           en_hits,
           greatest(en_hits, de_hits, es_hits, fr_hits) AS best_hits
    FROM v
    """,
    tags=("text-langid",),
)
def language_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-vote language ID heuristic with deterministic
    argmax tie order; a model-based classifier plugs in the same shape
    via mapInPandas."""
    from .operators.textstats import language_id

    documents = load_table(spark, sf_dir, "documents")
    return language_id(documents, "text", "doc_id")


@query(
    "token_count_documents",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS regex_tokens,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    tags=("text-tokens",),
)
def token_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting: whitespace tokens + BPE-ish regex tokens +
    bytes per document."""
    from .operators.textstats import token_counts

    documents = load_table(spark, sf_dir, "documents")
    return token_counts(documents, "text", "doc_id")


@query(
    "doc_fingerprints",
    oracle="""
    WITH t AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ), sh AS (
      SELECT doc_id, norm, string_split(norm, ' ') AS w FROM t
    )
    SELECT doc_id,
           sha256(norm) AS content_sha,
           list_min(list_transform(
             [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
              FOR i IN range(1, greatest(len(w) - 1, 1))],
             s -> sha256(s))) AS min_shingle_sha
    FROM sh
    """,
    tags=("text-fingerprint",),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalised content hash (exact-dup key) + min-shingle hash
    (edit-tolerant winnowing-style key)."""
    from .operators.textstats import fingerprints

    documents = load_table(spark, sf_dir, "documents")
    return fingerprints(documents, "text", "doc_id")


@query(
    "repetition_ratio_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id,
             [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
              FOR i IN range(1, greatest(len(w) - 1, 1))] AS grams
      FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS INT) AS n_ngrams,
           CAST(len(list_distinct(grams)) AS INT) AS n_distinct_ngrams,
           round((len(grams) - len(list_distinct(grams)))::DOUBLE
                 / greatest(len(grams), 1), 6) AS repetition_ratio
    FROM g
    """,
    tags=("text-quality", "gopher-filter"),
)
def repetition_ratio_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio (duplicate word-3-gram share) —
    the Gopher-style repetitious-text pre-training filter. One scan,
    JVM array expressions, no shuffle."""
    from .operators.textstats import repetition_ratio

    documents = load_table(spark, sf_dir, "documents")
    return repetition_ratio(documents, "text", "doc_id")


@query(
    "corpus_vocabulary",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS term_freq,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM tok WHERE token <> ''
    GROUP BY token
    """,
    tags=("text-corpus", "vocabulary"),
)
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary table (term_freq + doc_freq per lower-cased
    token): the tokenizer-training / stopword-discovery primitive.
    Token-keyed two-phase aggregate; map-side partials absorb hot
    stopword keys before the exchange."""
    from .operators.textstats import term_stats

    documents = load_table(spark, sf_dir, "documents")
    return term_stats(documents, "text", "doc_id")


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE token <> '' GROUP BY doc_id, token
    ), dfq AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df
      FROM tok WHERE token <> '' GROUP BY token
    ), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT doc_id, token, tfidf, term_rank FROM (
      SELECT tf.doc_id, tf.token,
             round(tf.tf::DOUBLE * n.n_docs / dfq.df, 6) AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY round(tf.tf::DOUBLE * n.n_docs / dfq.df, 6) DESC, tf.token
             ) AS term_rank
      FROM tf JOIN dfq USING (token), n
    ) WHERE term_rank <= 3
    """,
    tags=("text-corpus", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by deterministic tf-idf
    (score = tf × N / df; the log in classic idf is monotone so the
    ranking is identical, and one IEEE division keeps the score
    hash-comparable across engines). The doc-freq side is joined on
    the token key, not broadcast — vocabulary is unbounded at corpus
    scale."""
    from .operators.textstats import tfidf_top_terms as _tfidf

    documents = load_table(spark, sf_dir, "documents")
    return _tfidf(documents, "text", "doc_id", k=3)


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           'text/plain' AS mime,
           sha256(text) AS checksum
    FROM documents
    """,
    tags=("multimodal-meta",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata struct (byte length,
    mime, checksum), projected back out of the struct — the schema
    pattern for opaque image/audio/video columns."""
    from .operators.multimodal import attach_binary_payload

    documents = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(documents, "text")
    return with_payload.select(
        "doc_id",
        F.col("payload_meta.byte_len").alias("byte_len"),
        F.col("payload_meta.mime").alias("mime"),
        F.col("payload_meta.checksum").alias("checksum"),
    )


@query("multimodal_decode_stub", oracle=None, tags=("multimodal-decode",))
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode plumbing over binary payloads (stubbed
    decoder — media codecs absent in this container); returns decoded
    dimensions per document. Rows-only check; schema and batch shape
    are the real contract."""
    from .operators.multimodal import attach_binary_payload, decode_stub

    documents = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(documents, "text")
    decoded = decode_stub(with_payload)
    return decoded.select(
        "doc_id",
        F.col("decoded.width").alias("width"),
        F.col("decoded.height").alias("height"),
        F.col("decoded.ok").alias("decode_ok"),
    )


@query(
    "embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS score
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
    """,
    tags=("dedup-embedding",),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥0.4) inside label
    blocks — the small-data oracle twin of the dedup suite's embedding
    leg. The corpus-scale path is ``embedding_near_dup_ivf`` (blocks on
    quantizer cells whose count grows with the corpus)."""
    from .operators.similarity import embedding_near_dup_pairs

    embeddings = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        embeddings, block_col="label", threshold=0.4, arrow=oracle_arrow()
    )


@query(
    "embedding_near_dup_ivf",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), cells AS (
      SELECT v.vec_id, a.centroid_id, v.vv FROM v JOIN assigned a USING (vec_id)
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.vv, b.vv)
                 / (sqrt(list_dot_product(a.vv, a.vv))
                    * sqrt(list_dot_product(b.vv, b.vv))), 6) AS score
    FROM cells a JOIN cells b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.vv, b.vv)
                / (sqrt(list_dot_product(a.vv, a.vv))
                   * sqrt(list_dot_product(b.vv, b.vv))), 6) >= 0.4
    """,
    tags=("dedup-embedding", "similarity-ivf"),
)
def embedding_near_dup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale embedding near-dup: block on IVF quantizer cells
    (cell count ~ rows/stride, so mean block size is constant in corpus
    size) instead of a data-dependent label column. Deterministic
    stride quantizer keeps the approximate index oracle-checkable."""
    from .operators.similarity import embedding_near_dup_ivf as _near_dup_ivf

    embeddings = load_table(spark, sf_dir, "embeddings")
    return _near_dup_ivf(embeddings, threshold=0.4, arrow=oracle_arrow())


@query(
    "ivf_ann_topk",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), cells AS (
      SELECT v.vec_id, a.centroid_id, v.vv FROM v JOIN assigned a USING (vec_id)
    ), scored AS (
      SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             round(list_dot_product(q.vv, x.vv)
                   / (sqrt(list_dot_product(q.vv, q.vv))
                      * sqrt(list_dot_product(x.vv, x.vv))), 6) AS score
      FROM cells q JOIN cells x
        ON q.centroid_id = x.centroid_id AND x.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rank FROM scored
    ) WHERE rank <= 3
    """,
    tags=("similarity-ivf",),
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe=1): deterministic coarse quantizer (every 50th
    vector as a centroid; a k-means fit plugs in identically), search
    only the query's cell. Fully SQL-expressible, so unlike the
    hyperplane-LSH variant this approximate index is oracle-checked."""
    from .operators.similarity import ivf_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(embeddings, query_ids=range(10), k=3, arrow=oracle_arrow())


@query(
    "dedup_cluster_assignment",
    oracle="""
    WITH RECURSIVE edges AS (
      WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
      ), sh AS (
        SELECT doc_id, lang,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              FOR i IN range(1, greatest(len(w) - 1, 1))]) AS shingles
        FROM t
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8
    ), sym AS (
      SELECT doc_a AS a, doc_b AS b FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ), reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS doc_id,
           least(a, min(b)) AS cluster_id,
           CAST(a = least(a, min(b)) AS INT) AS is_canonical
    FROM reach GROUP BY a
    """,
    tags=("dedup-clusters", "iterative"),
)
def dedup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative connected components over the exact near-dup pair
    graph → duplicate clusters with a canonical (min-id) member per
    cluster. Spark side: min-label propagation with localCheckpoint
    per round and observe-based convergence (the DataFrame-native
    iterative-algorithm pattern); oracle: recursive-CTE transitive
    closure."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import dedup_clusters

    documents = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        documents, "text", "doc_id", block_cols=["lang"], n=3, threshold=0.8
    )
    return dedup_clusters(pairs)


@query(
    "udtf_token_spans",
    oracle="""
    SELECT doc_id, tok AS token, CAST(pos - 1 AS INT) AS position
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    )
    WHERE tok IN ('customer','supplier','part')
    """,
    tags=("UDTF",),
)
def udtf_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: one input document →
    0..n output rows (matched token + position). The generator-shaped
    escape hatch when a transform's cardinality varies per row and
    built-in ``explode`` can't express the row logic. ``useArrow=True``
    (Spark 4 Arrow-optimized UDTF, VERDICT r10 #6): rows move to
    Python in Arrow batches and the plan is ArrowEvalPythonUDTF — the
    registry's last row-at-a-time BatchEvalPython node is gone, so the
    plan-doctor pyRow column reads zero everywhere."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, position: int", useArrow=True)
    class TokenSpans:
        VOCAB = {"customer", "supplier", "part"}

        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                if tok in self.VOCAB:
                    yield tok, i

    spark.udtf.register("token_spans", TokenSpans)
    documents = load_table(spark, sf_dir, "documents")
    documents.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.token, s.position
        FROM _udtf_docs d, LATERAL token_spans(d.text) s
        """
    )


@query(
    "train_test_split_hash",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
               AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'validation'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM assigned GROUP BY 1, 2
    """,
    tags=("sampling", "split"),
)
def train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/validation/test assignment by key
    hash (reproducible across runs/cluster sizes; documents never
    migrate between splits as the corpus grows), rolled up per
    language."""
    from .operators.sampling import hash_split

    documents = load_table(spark, sf_dir, "documents")
    return (
        hash_split(documents, "doc_id", train_pct=90, validation_pct=5)
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "sequence_packing_bins",
    oracle="""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / 2048.0) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT bin_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY bin_id
    """,
    tags=("sampling", "packing"),
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order sequence packing into 2048-token bins (the
    batch-construction step of an LLM data loader), summarised per
    bin."""
    from .operators.sampling import pack_sequences

    documents = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        documents, "doc_id", F.size(F.split(F.col("text"), " ")), budget=2048
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens")
    )


@query(
    "split_contamination_check",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
                  THEN 'train' ELSE 'holdout' END AS split
      FROM documents
    ), assigned AS (
      SELECT doc_id, split,
             list_min(list_transform(
               [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                FOR i IN range(1, greatest(len(w) - 1, 1))],
               s -> sha256(s))) AS fp
      FROM sh
    )
    SELECT t.doc_id AS holdout_doc_id,
           CAST(COUNT(tr.doc_id) AS BIGINT) AS n_train_collisions
    FROM assigned t
    JOIN assigned tr ON t.fp = tr.fp AND tr.split = 'train'
    WHERE t.split = 'holdout'
    GROUP BY t.doc_id
    """,
    tags=("contamination", "dedup-exact", "split"),
)
def split_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/holdout contamination: holdout documents whose
    edit-tolerant fingerprint (min-shingle hash) also appears in the
    train split — the leakage audit every eval pipeline needs, catching
    near-dup contamination that exact hashes miss. Composition of the
    fingerprint and hash-split operators; equi-join on 64-byte hashes,
    so the document bodies never shuffle."""
    from .operators.sampling import hash_bucket
    from .operators.textstats import fingerprints

    documents = load_table(spark, sf_dir, "documents")
    fp = fingerprints(documents, "text", "doc_id").select(
        "doc_id", F.col("min_shingle_sha").alias("content_sha")
    )
    assigned = fp.withColumn(
        "split",
        F.when(hash_bucket(F.col("doc_id")) < 90, "train").otherwise("holdout"),
    )
    holdout = assigned.where(F.col("split") == "holdout")
    train = assigned.where(F.col("split") == "train")
    return (
        holdout.alias("t")
        .join(train.alias("tr"), F.col("t.content_sha") == F.col("tr.content_sha"))
        .groupBy(F.col("t.doc_id").alias("holdout_doc_id"))
        .agg(F.count("*").alias("n_train_collisions"))
    )


@query(
    "ngram_decontamination_check",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS w,
             len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
                          'g')), ' ')) AS n,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 90
                  THEN 'train' ELSE 'holdout' END AS split
      FROM documents
    ), occ AS (
      SELECT doc_id, split, n, u.key FROM (
        SELECT doc_id, split, n,
               unnest([{'key': md5(array_to_string(w[i : i + 12], ' '))}
                       FOR i IN range(1, n - 13 + 2)]) AS u
        FROM t WHERE n >= 13
      )
    ), tk AS (
      SELECT DISTINCT key FROM occ WHERE split = 'train'
    )
    SELECT h.doc_id AS holdout_doc_id,
           CAST(COUNT(DISTINCT h.key) AS BIGINT) AS n_contaminated_ngrams,
           CAST(MAX(h.n) - 13 + 1 AS BIGINT) AS n_ngrams,
           round(CAST(COUNT(DISTINCT h.key) AS DOUBLE)
                 / (MAX(h.n) - 13 + 1), 4) AS contaminated_frac
    FROM occ h JOIN tk USING (key)
    WHERE h.split = 'holdout'
    GROUP BY h.doc_id
    """,
    tags=("contamination", "dedup-substring", "split"),
)
def ngram_decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style n-gram decontamination (Brown et al. 2020 App. C /
    PaLM): a holdout document is contaminated where ANY of its 13-gram
    windows (stride 1, lowercased, whitespace-collapsed) also occurs
    in the train split — window-level overlap catches partial leakage
    that the document-level min-shingle fingerprint
    (``split_contamination_check``) and boundary-aligned chunk hashes
    both miss. Returns per contaminated holdout doc the count of
    distinct leaked 13-grams, its window total, and the contaminated
    fraction — the report an eval-decontamination pass acts on.
    Scale: the same linear sliding-window expansion as
    ``exact_substring_dedup`` (row-local md5s, parallelised via
    scale_out); train keys deduplicate BEFORE the join (one
    hash-keyed shuffle of 32-char keys, never text); per-doc
    aggregation is document-bounded."""
    from .operators.dedup import scale_out
    from .operators.sampling import hash_bucket

    L = 13
    documents = load_table(spark, sf_dir, "documents")
    # persist the tokenized base (r15): without the cache boundary,
    # Catalyst substitutes `_n` back to size(split(regexp_replace(..)))
    # in the >= L filter and pushes it BELOW the scale_out exchange —
    # the full regexp+split then runs single-threaded in the 1-task
    # scan stage, once per branch (two ~1.1 s 1-task jobs at sf0.1),
    # and again post-exchange. The cache pins the split at scale_out
    # parallelism and shares the one tokenize pass across the train
    # and holdout subtrees.
    base = (
        scale_out(documents.select("doc_id", "text"))
        .select(
            "doc_id",
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
            ).alias("_w"),
            F.when(hash_bucket(F.col("doc_id")) < 90, "train")
            .otherwise("holdout")
            .alias("split"),
        )
        .withColumn("_n", F.size("_w"))
        .persist()
    )
    occ = (
        base.where(F.col("_n") >= L)
        .select(
            "doc_id",
            "split",
            "_n",
            F.explode(F.sequence(F.lit(1), F.col("_n") - L + 1)).alias("pos"),
            "_w",
        )
        .select(
            "doc_id",
            "split",
            "_n",
            F.md5(F.array_join(F.slice("_w", F.col("pos"), L), " ")).alias(
                "key"
            ),
        )
    )
    # LEFT SEMI instead of distinct-train-keys + inner join: identical
    # rows (a holdout window either has >=1 train occurrence or not)
    # without materializing the distinct-key aggregate first.
    train_keys = occ.where(F.col("split") == "train").select("key")
    return (
        occ.where(F.col("split") == "holdout")
        .join(train_keys, "key", "left_semi")
        .groupBy(F.col("doc_id").alias("holdout_doc_id"))
        .agg(
            F.countDistinct("key").alias("n_contaminated_ngrams"),
            (F.max("_n") - L + 1).cast("long").alias("n_ngrams"),
            F.round(
                F.countDistinct("key").cast("double")
                / (F.max("_n") - L + 1),
                4,
            ).alias("contaminated_frac"),
        )
    )


def _km_assign_cte(name: str, cent: str) -> str:
    """DuckDB CTE: argmin-squared-L2 assignment of v against ``cent``
    — the dot-identity + round(,6) + centroid tie-break contract of
    ``operators.similarity.ivf_assign``."""
    return f"""
    {name} AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv)
                               + list_dot_product(cv, cv)
                               - 2 * list_dot_product(vv, cv), 6),
                          c.cid
               ) AS rn
        FROM v, {cent} c
      ) WHERE rn = 1
    )"""


def _km_update_cte(name: str, assign: str) -> str:
    """DuckDB CTE: element-wise centroid mean via parallel unnest of
    values and subscripts, rounded to the 1e-6 grid like the engine."""
    return f"""
    {name} AS (
      SELECT cid, list(val ORDER BY pos) AS cv FROM (
        SELECT cid, pos, round(avg(val), 6) AS val FROM (
          SELECT a.cid AS cid,
                 unnest(v.vv) AS val,
                 unnest(range(1, len(v.vv) + 1)) AS pos
          FROM v JOIN {assign} a USING (vec_id)
        ) GROUP BY cid, pos
      ) GROUP BY cid
    )"""


def _km_oracle(init_cte: str) -> str:
    """Full unrolled 2-iteration Lloyd oracle over a given init CTE
    chain (must define ``v`` and ``c0``)."""
    return f"""
    WITH {init_cte},{_km_assign_cte('a1', 'c0')},{_km_update_cte('c1', 'a1')},
    {_km_assign_cte('a2', 'c1')},{_km_update_cte('c2', 'a2')},
    {_km_assign_cte('a3', 'c2')}
    SELECT vec_id, cid AS centroid_id FROM a3
    """


_KM_INIT_ADAPTIVE = """st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), c0 AS (
      SELECT vec_id // st.s AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    )"""

_KM_INIT_STRIDE50 = """v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), c0 AS (
      SELECT vec_id // 50 AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id % 50 = 0
    )"""


@query(
    "kmeans_cluster_assignment",
    oracle=_km_oracle(_KM_INIT_ADAPTIVE),
    tags=("kmeans", "iterative", "similarity-ivf", "adaptive"),
)
def kmeans_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (2 update iterations, deterministic
    √N-stride init — the r8 scale default: a fixed stride makes
    k ∝ N and the assignment scan N²/stride, measured 21.6× at 10×
    data in SCALE.md) over the embeddings table — the
    iterative-algorithm pattern hash-verified end-to-end: the oracle
    derives the SAME init stride from COUNT(*) and unrolls both
    iterations as SQL CTEs, so it must land on identical
    assignments."""
    from .operators.similarity import kmeans_lloyd

    embeddings = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(embeddings, iters=2, arrow=oracle_arrow())


@query(
    "kmeans_cluster_assignment_stride50",
    oracle=_km_oracle(_KM_INIT_STRIDE50),
    tags=("kmeans", "iterative", "similarity-ivf", "pinned-stride"),
)
def kmeans_cluster_assignment_stride50(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The kmeans/PQ family's pinned-stride regression twin
    (init_stride=50, the pre-r8 default): keeps the fully-literal
    unrolled-CTE oracle — no COUNT(*)-derived index size anywhere —
    so a regression in the Lloyd assign/update contract itself can't
    hide behind the adaptive-sizing arithmetic. Small-SF only; the
    adaptive `kmeans_cluster_assignment` is the configuration that
    scales (SCALE.md)."""
    from .operators.similarity import kmeans_lloyd

    embeddings = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(embeddings, init_stride=50, iters=2, arrow=oracle_arrow())


@query(
    "sequence_packing_sharded",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
               AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, shard, n_tokens,
             CAST(floor(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / 2048.0) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT shard, bin_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY shard, bin_id
    """,
    tags=("sampling", "packing", "shard"),
)
def sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale variant of sequence packing: documents hash-shard
    deterministically (md5 bucket) and each shard packs independently
    under its own running-sum window — 8 parallel windows here, one
    per shard at 100 TB, instead of one global single-partition sort."""
    from .operators.sampling import pack_sequences

    documents = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        documents,
        "doc_id",
        F.size(F.split(F.col("text"), " ")),
        budget=2048,
        n_shards=8,
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens")
    )


@query(
    "stratified_sample_documents",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000
          < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 ELSE 100 END
    """,
    tags=("sampling", "stratified"),
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 50% of English, 25% of
    German, 10% of everything else, selected by key hash so the sample
    is stable under re-runs and corpus growth (idempotent-pipeline
    property `sampleBy` lacks). Exact-oracle-able because the decision
    is a pure function of (doc_id, lang)."""
    from .operators.sampling import stratified_hash_sample

    documents = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        documents.select("doc_id", "lang", "source"),
        key_col="doc_id",
        stratum_col="lang",
        fractions={"en": 0.5, "de": 0.25},
        default_fraction=0.1,
    )


@query(
    "document_curation_flags",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), q AS (
      SELECT doc_id,
             len(w) AS n_words,
             round(len(list_distinct(w))::DOUBLE / len(w), 4) AS ttr,
             round(len(list_filter(w, x -> x IN ('the','a','and','of','to')))::DOUBLE
                   / len(w), 4) AS stop_ratio
      FROM t
    ), g AS (
      SELECT doc_id,
             [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
              FOR i IN range(1, greatest(len(w) - 1, 1))] AS grams
      FROM t
    ), r AS (
      SELECT doc_id,
             round((len(grams) - len(list_distinct(grams)))::DOUBLE
                   / greatest(len(grams), 1), 6) AS rep_ratio
      FROM g
    )
    SELECT q.doc_id,
           CAST(q.n_words < 50 AS INT) AS flag_too_short,
           CAST(q.ttr < 0.30 AS INT) AS flag_low_diversity,
           CAST(q.stop_ratio < 0.01 AS INT) AS flag_no_stopwords,
           CAST(r.rep_ratio > 0.20 AS INT) AS flag_repetitious,
           CAST(q.n_words >= 50 AND q.ttr >= 0.30 AND q.stop_ratio >= 0.01
                AND r.rep_ratio <= 0.20 AS INT) AS keep
    FROM q JOIN r ON q.doc_id = r.doc_id
    """,
    tags=("text-quality", "curation", "c4-filter"),
)
def document_curation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style curation verdict per document: length, lexical
    diversity, stopword-presence and repetition gates with per-gate
    flags plus the final keep bit. Composes the quality and repetition
    operators on one scan each, joined on the PK — the shape of a real
    pre-training data filter stage."""
    from .operators.textstats import quality_scores, repetition_ratio

    documents = load_table(spark, sf_dir, "documents")
    q = quality_scores(documents, "text", "doc_id")
    r = repetition_ratio(documents, "text", "doc_id")
    keep = (
        (F.col("n_words") >= 50)
        & (F.col("type_token_ratio") >= 0.30)
        & (F.col("stopword_ratio") >= 0.01)
        & (F.col("repetition_ratio") <= 0.20)
    )
    return (
        q.join(r, "doc_id")
        .select(
            "doc_id",
            (F.col("n_words") < 50).cast("int").alias("flag_too_short"),
            (F.col("type_token_ratio") < 0.30).cast("int").alias("flag_low_diversity"),
            (F.col("stopword_ratio") < 0.01).cast("int").alias("flag_no_stopwords"),
            (F.col("repetition_ratio") > 0.20).cast("int").alias("flag_repetitious"),
            keep.cast("int").alias("keep"),
        )
    )


@query(
    "pii_scan_documents",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INT) AS n_urls,
           CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS INT) AS n_long_digit_runs,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+'))
                + len(regexp_extract_all(text, 'https?://[^ ]+'))
                + len(regexp_extract_all(text, '[0-9]{4,}')) > 0 AS INT) AS needs_scrub
    FROM documents
    """,
    tags=("text-pii", "curation"),
)
def pii_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/boilerplate scrub scan: per-document counts of email-like,
    URL-like and long-digit-run matches plus the routing flag — the
    cheap first pass that decides which documents enter the heavier
    anonymise transform (reference's Presidio domain, scan half)."""
    from .operators.textstats import pii_scan

    documents = load_table(spark, sf_dir, "documents")
    return pii_scan(documents, "text", "doc_id")


@query(
    "heavy_hitter_tokens",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), stats AS (
      SELECT token,
             CAST(COUNT(*) AS BIGINT) AS term_freq,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
      FROM tok WHERE token <> '' GROUP BY token
    )
    SELECT token, term_freq, doc_freq
    FROM stats
    ORDER BY term_freq DESC, token
    LIMIT 20
    """,
    tags=("text-corpus", "heavy-hitters"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top-20 tokens by total occurrences (the
    exact ground truth a sketch-based heavy-hitter pass approximates).
    TakeOrderedAndProject over the vocabulary aggregate — no global
    sort."""
    from .operators.textstats import term_stats

    documents = load_table(spark, sf_dir, "documents")
    return (
        term_stats(documents, "text", "doc_id")
        .orderBy(F.col("term_freq").desc(), "token")
        .limit(20)
    )


@query(
    "domain_mix_documents",
    oracle="""
    WITH c AS (
      SELECT doc_id, lang, source,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % 1000 AS b
      FROM documents
    ), n AS (
      SELECT doc_id, lang, source,
             CASE lang
               WHEN 'en' THEN 1 + CAST(b < 500 AS INT)
               WHEN 'de' THEN 2
               WHEN 'fr' THEN CAST(b < 500 AS INT)
               ELSE CAST(b < 250 AS INT)
             END AS n_copies
      FROM c
    )
    SELECT doc_id, lang, source,
           unnest(range(1, n_copies + 1)) AS copy_num
    FROM n WHERE n_copies >= 1
    """,
    tags=("sampling", "data-mixing"),
)
def domain_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain mixing for a pre-training run: upsample
    English 1.5x and German 2x, halve French, keep 25% of everything
    else — replication and downsampling both decided by key hash, so
    the mixture is exactly reproducible across runs and engines
    (operators.sampling.mix_domains). One scan, filter-then-explode,
    no shuffle."""
    from .operators.sampling import mix_domains

    documents = load_table(spark, sf_dir, "documents")
    return mix_domains(
        documents.select("doc_id", "lang", "source"),
        key_col="doc_id",
        domain_col="lang",
        weights={"en": 1.5, "de": 2.0, "fr": 0.5},
        default_weight=0.25,
    )


@query(
    "chunk_dedup_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), c AS (
      SELECT doc_id,
             [array_to_string(w[i*10+1 : i*10+10], ' ')
              FOR i IN range(0, greatest(CAST(ceil(len(w) / 10.0) AS INT), 1))]
               AS chunks
      FROM t
    ), e AS (
      SELECT doc_id, unnest(chunks) AS chunk,
             unnest(range(1, len(chunks) + 1)) AS pos
      FROM c
    ), d AS (
      SELECT chunk FROM e GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2
    ), k AS (
      SELECT e.doc_id, e.pos, e.chunk FROM e ANTI JOIN d USING (chunk)
    ), r AS (
      SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM k GROUP BY doc_id
    )
    SELECT c.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(len(c.chunks) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed_chunks
    FROM c LEFT JOIN r USING (doc_id)
    """,
    tags=("dedup-chunk", "c4"),
)
def chunk_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span removal (C4 / Lee et al. 2022 policy at 10-word
    chunk granularity): chunks occurring in 2+ distinct documents are
    removed from every document; survivors reassemble in order. Global
    chunk frequencies group on sha2 hashes so 32-byte keys shuffle,
    never the text (operators.dedup.chunk_dedup)."""
    from .operators.dedup import chunk_dedup

    documents = load_table(spark, sf_dir, "documents")
    return chunk_dedup(documents, "text", "doc_id", chunk_words=10, min_docs=2)


@query(
    "exact_substring_dedup_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), occ AS (
      SELECT doc_id, u.pos, u.key FROM (
        SELECT doc_id,
               unnest([{'pos': i,
                        'key': md5(array_to_string(w[i : i + 14], ' '))}
                       FOR i IN range(1, n - 15 + 2)]) AS u
        FROM t WHERE n >= 15
      )
    ), ranked AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rk,
             COUNT(*) OVER (PARTITION BY key) AS cnt
      FROM occ
    ), dup_occ AS (
      SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rk > 1
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - COALESCE(lag(pos) OVER
                    (PARTITION BY doc_id ORDER BY pos), -1000000000) > 15
                  THEN 1 ELSE 0 END AS b
      FROM dup_occ
    ), isl AS (
      SELECT doc_id, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM brk
    ), spans AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) + 15 - 1 AS e
      FROM isl GROUP BY doc_id, g
    ), sp AS (
      SELECT doc_id, list({'s': s, 'e': e}) AS spans
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CASE WHEN sp.spans IS NULL THEN t.text
                ELSE COALESCE(array_to_string(
                  [t.w[i] FOR i IN range(1, t.n + 1)
                   IF len(list_filter(sp.spans,
                          x -> i >= x.s AND i <= x.e)) = 0], ' '), '')
           END AS clean_text,
           CAST(CASE WHEN sp.spans IS NULL THEN 0
                ELSE len([i FOR i IN range(1, t.n + 1)
                          IF len(list_filter(sp.spans,
                                 x -> i >= x.s AND i <= x.e)) > 0])
                END AS BIGINT) AS n_removed_tokens
    FROM t LEFT JOIN sp USING (doc_id)
    """,
    tags=("dedup-substring", "exactsubstr"),
)
def exact_substring_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-SPAN removal at ANY token offset
    (Lee et al. 2022), fixed 15-token window granularity: sliding
    md5 window seeds → corpus-wide duplicate seeds → per-doc
    gaps-and-islands span merge → keeper-preserving removal (the
    globally-first occurrence of each seed survives, so exactly one
    copy of every duplicated region remains in the corpus). The
    boundary-robust sibling of ``chunk_dedup_documents`` (C4 chunks
    miss duplicates straddling fixed chunk boundaries; this catches
    every alignment). Whole pipeline is md5/min/integer arithmetic —
    hash-checked against the unrolled SQL oracle
    (operators.dedup.exact_substring_dedup)."""
    from .operators.dedup import exact_substring_dedup

    documents = load_table(spark, sf_dir, "documents")
    return exact_substring_dedup(documents, "text", "doc_id", span_words=15)


@query(
    "pq_ann_topk",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ), sp AS (
      SELECT j FROM range(0, 4) AS t(j)
    ), cb AS (
      SELECT sp.j AS subspace, vec_id // st.s AS code_id,
             ve[sp.j*16+1 : sp.j*16+16] AS c
      FROM v, sp, st WHERE vec_id % st.s = 0
    ), sv AS (
      SELECT vec_id, sp.j AS subspace, ve[sp.j*16+1 : sp.j*16+16] AS s
      FROM v, sp
    ), enc AS (
      SELECT vec_id, subspace, code_id AS code FROM (
        SELECT sv.vec_id, sv.subspace, cb.code_id,
               ROW_NUMBER() OVER (
                 PARTITION BY sv.vec_id, sv.subspace
                 ORDER BY round(list_dot_product(sv.s, sv.s)
                                + list_dot_product(cb.c, cb.c)
                                - 2 * list_dot_product(sv.s, cb.c), 6),
                          cb.code_id
               ) AS rn
        FROM sv JOIN cb ON sv.subspace = cb.subspace
      ) WHERE rn = 1
    ), lut AS (
      SELECT sv.vec_id AS query_id, sv.subspace, cb.code_id,
             round(list_dot_product(sv.s, sv.s) + list_dot_product(cb.c, cb.c)
                   - 2 * list_dot_product(sv.s, cb.c), 6) AS d
      FROM sv JOIN cb ON sv.subspace = cb.subspace
      WHERE sv.vec_id IN (7, 123, 321)
    ), approx AS (
      SELECT lut.query_id, enc.vec_id AS neighbor_id,
             CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) AS approx_dist
      FROM enc JOIN lut
        ON enc.subspace = lut.subspace AND enc.code = lut.code_id
      WHERE enc.vec_id <> lut.query_id
      GROUP BY lut.query_id, enc.vec_id
    )
    SELECT query_id, neighbor_id, approx_dist, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_dist, neighbor_id
      ) AS rank FROM approx
    ) WHERE rank <= 3
    """,
    tags=("similarity-pq",),
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jegou et al. 2011): corpus scanned as m=4 codes per vector,
    per-query LUT of exact-subvector-to-codeword distances, document
    distance = sum of table entries through decimal so the total is
    order-independent. Like IVF (and unlike LSH), the deterministic
    stride codebooks make this approximate index fully oracle-checked."""
    from .operators.similarity import pq_adc_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        embeddings, query_ids=(7, 123, 321), k=3, arrow=oracle_arrow()
    )


@query(
    "global_row_index_documents",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % 16 AS shard
      FROM documents
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY shard, doc_id) - 1 AS BIGINT)
             AS global_idx
    FROM s
    """,
    tags=("sampling", "indexing"),
)
def global_row_index_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0..N-1 row indexing without a global sort: hash-shard,
    count shards, rank within shards + broadcast offsets
    (operators.sampling.global_index — the DataFrame-native
    zipWithIndex). The oracle IS the global sort the distributed
    construction provably equals."""
    from .operators.sampling import global_index

    documents = load_table(spark, sf_dir, "documents")
    return global_index(documents.select("doc_id"), "doc_id", n_shards=16)


@query(
    "domain_quota_sample",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT) % 100,
                        doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 40
    """,
    tags=("sampling", "quota"),
)
def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (at most 40 docs per language), chosen by key
    hash so the kept subset is deterministic and engine-portable.
    Spark's WindowGroupLimit pushes the rank<=N filter map-side, so
    billion-row domains never sort on one reducer
    (operators.sampling.quota_sample)."""
    from .operators.sampling import quota_sample

    documents = load_table(spark, sf_dir, "documents")
    return quota_sample(
        documents.select("doc_id", "lang"), "doc_id", "lang", quota=40
    )


@query(
    "unigram_logprob_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
      ) WHERE token <> ''
    ), f AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY token
    ), tot AS (
      SELECT CAST(SUM(tf) AS BIGINT) AS total FROM f
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CAST(round(ln(tf / total), 6) AS DECIMAL(28,6)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_logprob
    FROM t JOIN f USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    tags=("text-quality", "perplexity-proxy"),
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (the perplexity-filter stand-in of a
    CCNet/Gopher curation stage): corpus-trained token frequencies, one
    shuffle join on the token, mean per-token log-prob through the
    decimal grid (operators.textstats.unigram_logprob)."""
    from .operators.textstats import unigram_logprob

    documents = load_table(spark, sf_dir, "documents")
    return unigram_logprob(documents, "text", "doc_id")


@query(
    "ivf_ann_topk_nprobe2",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c WHERE v.vec_id < 10
      ) WHERE rn <= 2
    ), cells AS (
      SELECT v.vec_id, a.centroid_id, v.vv FROM v JOIN assigned a USING (vec_id)
    ), scored AS (
      SELECT p.query_id, x.vec_id AS neighbor_id,
             round(list_dot_product(q.vv, x.vv)
                   / (sqrt(list_dot_product(q.vv, q.vv))
                      * sqrt(list_dot_product(x.vv, x.vv))), 6) AS score
      FROM probes p
      JOIN cells x ON x.centroid_id = p.centroid_id AND x.vec_id <> p.query_id
      JOIN v q ON q.vec_id = p.query_id
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rank FROM scored
    ) WHERE rank <= 3
    """,
    tags=("similarity-ivf", "nprobe"),
)
def ivf_ann_topk_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2: each query searches its two nearest
    quantizer cells, eliminating the cell-boundary miss mode of
    nprobe=1 at ~2x candidate cost — the standard IVF recall/cost
    knob, still fully oracle-checked (deterministic probes and
    distances)."""
    from .operators.similarity import ivf_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        embeddings, query_ids=range(10), k=3, nprobe=2, arrow=oracle_arrow()
    )


@query(
    "temperature_mix_documents",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
    ), s AS (
      SELECT lang, cnt, round(pow(CAST(cnt AS DOUBLE), 0.5), 6) AS ca FROM c
    ), t AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CAST(ca AS DECIMAL(28,6))) AS DOUBLE) AS za
      FROM s
    ), w AS (
      SELECT lang, round((ca / za) * n / cnt, 6) AS w FROM s CROSS JOIN t
    ), d AS (
      SELECT doc_id, d0.lang, w.w,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
               % 1000 AS b
      FROM documents d0 JOIN w ON d0.lang = w.lang
    ), nc AS (
      SELECT doc_id, lang,
             CAST(floor(w) AS INT)
               + CAST(b < round((w - floor(w)) * 1000) AS INT) AS n_copies
      FROM d
    )
    SELECT doc_id, lang, unnest(range(1, n_copies + 1)) AS copy_num
    FROM nc WHERE n_copies >= 1
    """,
    tags=("sampling", "data-mixing", "temperature"),
)
def temperature_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLM/mT5-style temperature sampling (alpha=0.5): domain shares
    smoothed by sqrt, renormalised, converted to deterministic per-row
    replication — head languages shrink, tail languages replicate. The
    whole weight computation stays in the plan (a |domains|-row
    broadcast), no driver round-trip
    (operators.sampling.temperature_mix)."""
    from .operators.sampling import temperature_mix

    documents = load_table(spark, sf_dir, "documents")
    return temperature_mix(
        documents.select("doc_id", "lang"), "doc_id", "lang", alpha=0.5
    )


@query(
    "weighted_sample_documents",
    oracle="""
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                % 1000000 + 0.5) / 1000000 AS uu
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             round(ln(uu) / n_chars, 6) AS es_key
      FROM u
      ORDER BY es_key DESC, doc_id
      LIMIT 100
    )
    """,
    tags=("sampling", "weighted"),
)
def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample (Efraimidis-Spirakis A-ES,
    k=100, weight = n_chars): longer documents proportionally likelier,
    selection a pure function of the ids — reproducible sampling the
    rand()-based equivalents cannot give
    (operators.sampling.weighted_sample)."""
    from .operators.sampling import weighted_sample

    documents = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        documents.select("doc_id", "lang", "n_chars"),
        "doc_id",
        F.col("n_chars"),
        k=100,
    )


@query(
    "pit_join_scd2_orders",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey, o_totalprice, 'insert' AS ct, 0 AS v
      FROM orders WHERE o_orderkey % 4 = 1
      UNION ALL
      SELECT o_orderkey, o_totalprice, 'insert', 1
      FROM orders WHERE o_orderkey % 4 = 2
      UNION ALL
      SELECT o_orderkey, o_totalprice, 'delete', 2
      FROM orders WHERE o_orderkey % 8 = 1
      UNION ALL
      SELECT o_orderkey, o_totalprice, 'insert', 2
      FROM orders WHERE o_orderkey % 4 = 3
    ), led AS (
      SELECT *,
             lead(v) OVER (PARTITION BY o_orderkey ORDER BY v, ct) AS vto
      FROM chg
    ), hist AS (
      SELECT o_orderkey, o_totalprice, v AS vfrom, vto
      FROM led WHERE ct = 'insert'
    )
    SELECT o_orderkey, o_totalprice,
           CAST(1 AS BIGINT) AS as_of_version
    FROM hist
    WHERE vfrom <= 1 AND (vto IS NULL OR vto > 1)
    """,
    tags=("scd2", "point-in-time", "warehouse"),
)
def pit_join_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time read off the SCD2 history: the rows valid AS OF
    version 1 — the consumer pattern type-2 history exists for
    (training-data reproducibility: 'join features exactly as they
    were'). A validity-range filter over the history, no time travel
    re-read."""
    from .operators.merge import CHANGE_TYPE, CT_DELETE, CT_INSERT
    from .operators.scd import scd2_from_changes

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    import tempfile

    from .operators.ledger import VersionedTable

    base = tempfile.mkdtemp(prefix="pit_scd2_")
    source = VersionedTable(spark, f"{base}/src", write_partitions=4)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        key = F.col("o_orderkey")
        source.write(orders.where(key % 4 == 1), mode="overwrite")
        source.write(orders.where(key % 4 == 2), mode="append")
        feed = (
            orders.where(key % 8 == 1)
            .withColumn(CHANGE_TYPE, F.lit(CT_DELETE))
            .unionByName(
                orders.where(key % 4 == 3).withColumn(CHANGE_TYPE, F.lit(CT_INSERT))
            )
        )
        source.merge(feed, primary_keys=["o_orderkey"])
        hist = scd2_from_changes(
            source.read_changes(0, source.latest_version()),
            ["o_orderkey"],
            ["o_totalprice"],
        )
        as_of = 1
        return hist.where(
            (F.col("valid_from_version") <= as_of)
            & (
                F.col("valid_to_version").isNull()
                | (F.col("valid_to_version") > as_of)
            )
        ).select(
            "o_orderkey", "o_totalprice", F.lit(as_of).cast("long").alias("as_of_version")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


@query(
    "feature_hash_documents",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT doc_id,
           CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 64 AS slot,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM tok WHERE token <> ''
    GROUP BY 1, 2
    """,
    tags=("feature-hashing", "vectorizer"),
)
def feature_hash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document vectors (Weinberger et al. 2009, dim=64):
    vocabulary-free fixed-width features. The dense assembly runs
    JVM-side (operators.textstats.feature_hash); the query re-explodes
    the vectors to (doc, slot, count) long form both because that is
    what the oracle can aggregate relationally AND because array cells
    crash the driver canonicalizer — so the round-trip through the
    dense vector is itself under test."""
    from .operators.textstats import feature_hash

    documents = load_table(spark, sf_dir, "documents")
    dense = feature_hash(documents, "text", "doc_id", dim=64)
    return (
        dense.select(
            "doc_id", F.posexplode("features").alias("slot", "n")
        )
        .where(F.col("n") > 0)
        .select("doc_id", F.col("slot").cast("bigint").alias("slot"), "n")
    )


@query(
    "bigram_conditional_probs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), big AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM t, unnest(range(1, greatest(len(w), 1))) AS r(i)
      WHERE i < len(w)
    ), pair AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM big GROUP BY 1, 2
    ), pre AS (
      SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_prefix FROM pair GROUP BY 1
    )
    SELECT p.w1, p.w2, p.n_pair,
           round(p.n_pair / r.n_prefix, 6) AS cond_prob
    FROM pair p JOIN pre r USING (w1)
    WHERE p.n_pair >= 20
    """,
    tags=("ngram-lm", "text-corpus"),
)
def bigram_conditional_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram next-token statistics: P(w2 | w1) for all bigrams seen
    >= 20 times — the corpus-analysis table behind n-gram LM scoring
    and repeated-phrase mining. One slide-by-one zip of each document's
    token array (JVM arrays_zip, no Python), two token-keyed
    aggregates, one exact-count division (single IEEE op, both
    engines)."""
    documents = load_table(spark, sf_dir, "documents")
    words = documents.select(F.split(F.col("text"), " ").alias("w"))
    bigrams = words.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
            )
        ).alias("b")
    ).select(F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
    pair = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    pre = pair.groupBy("w1").agg(F.sum("n_pair").alias("n_prefix"))
    return (
        pair.join(pre, "w1")
        .where(F.col("n_pair") >= 20)
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_prefix"), 6).alias("cond_prob"),
        )
    )


@query(
    "multimodal_decode_bmp",
    oracle="""
    SELECT doc_id,
           CAST(1 + n_chars % 8 AS INT) AS width,
           CAST(1 + n_chars % 5 AS INT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
    tags=("multimodal", "decode", "bmp"),
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-checked end-to-end: solid-colour BMPs
    are encoded per document (dims and RGB are pure functions of the
    row), shipped as binary payloads, decoded back by the pure-numpy
    BMP codec over mapInPandas — and the oracle predicts every decoded
    value in closed form. This retires the 'decode is a stub' caveat
    for the one codec that needs no external library; jpeg/png plug
    into the same batched seam (operators.multimodal.decode_images)."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import decode_images, encode_bmp

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def build(batches):
        for pdf in batches:
            pdf["payload"] = [
                encode_bmp(
                    np.full(
                        (1 + int(n) % 5, 1 + int(n) % 8, 3),
                        [int(i) % 256, (int(i) * 7) % 256, (int(i) * 13) % 256],
                        dtype=np.uint8,
                    )
                )
                for i, n in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pdf

    with_payload = docs.mapInPandas(build, "doc_id long, n_chars long, payload binary")
    dec = decode_images(with_payload)
    return dec.select(
        "doc_id",
        F.col("decoded.width").alias("width"),
        F.col("decoded.height").alias("height"),
        F.col("decoded.mean_r").alias("mean_r"),
        F.col("decoded.mean_g").alias("mean_g"),
        F.col("decoded.mean_b").alias("mean_b"),
    )


@query(
    "pretraining_corpus_pipeline",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id, lang, text, len(w) AS n_tokens,
             CASE WHEN len(w) >= 3
                  THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        FOR i IN range(1, len(w) - 1)]
                  ELSE [] END AS grams
      FROM base
    ), q AS (
      SELECT doc_id, lang, text, n_tokens FROM g
      WHERE n_tokens >= 50
        AND (len(grams) - len(list_distinct(grams)))::DOUBLE
              / greatest(len(grams), 1) <= 0.2
    ), d AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM q
      ) WHERE rn = 1
    ), c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY lang
    ), s AS (
      SELECT lang, cnt, round(pow(CAST(cnt AS DOUBLE), 0.5), 6) AS ca FROM c
    ), t AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CAST(ca AS DECIMAL(28,6))) AS DOUBLE) AS za FROM s
    ), wt AS (
      SELECT lang, round((ca / za) * n / cnt, 6) AS w FROM s CROSS JOIN t
    ), mix AS (
      SELECT d.doc_id, d.lang, d.n_tokens,
             CAST(floor(w) AS INT)
               + CAST((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                            AS BIGINT) % 1000)
                      < round((w - floor(w)) * 1000) AS INT) AS n_copies
      FROM d JOIN wt ON d.lang = wt.lang
    ), rep AS (
      SELECT doc_id, lang, n_tokens,
             unnest(range(1, n_copies + 1)) AS copy_num
      FROM mix WHERE n_copies >= 1
    ), keyed AS (
      SELECT doc_id, copy_num, lang, n_tokens,
             doc_id * 8 + copy_num AS seq_id,
             CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                            AS BIGINT) % 100 < 90 THEN 'train'
                  WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                            AS BIGINT) % 100 < 95 THEN 'validation'
                  ELSE 'test' END AS split,
             CAST('0x' || substr(md5(CAST(doc_id * 8 + copy_num AS VARCHAR)), 1, 8)
                  AS BIGINT) % 4 AS shard
      FROM rep
    )
    SELECT doc_id, copy_num, lang, split, shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(coalesce(SUM(n_tokens) OVER (
                 PARTITION BY split, shard ORDER BY seq_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 / 2048) AS BIGINT) AS bin_id
    FROM keyed
    """,
    tags=("llm-pipeline", "end-to-end", "showcase"),
)
def pretraining_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end curation pipeline, hash-verified as one
    composition: quality gate (length + repeated-trigram ratio) →
    exact dedup → temperature-smoothed language rebalance → leak-proof
    hash split → sharded token-budget packing. One lazy plan, no
    intermediate actions; every decision a pure function of keys and
    corpus stats, which is what makes a 7-stage pipeline
    oracle-checkable end-to-end (pipelines.pretrain)."""
    from .pipelines.pretrain import build_pretraining_corpus

    documents = load_table(spark, sf_dir, "documents")
    return build_pretraining_corpus(documents)


@query(
    "token_distribution_drift",
    oracle="""
    WITH tok AS (
      SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), t AS (
      SELECT half, token FROM tok WHERE token <> ''
    ), vocab AS (
      SELECT DISTINCT token FROM t
    ), c AS (
      SELECT v.token,
             CAST(coalesce(a.n, 0) AS BIGINT) AS c0,
             CAST(coalesce(b.n, 0) AS BIGINT) AS c1
      FROM vocab v
      LEFT JOIN (SELECT token, COUNT(*) AS n FROM t WHERE half = 0 GROUP BY token) a
        ON v.token = a.token
      LEFT JOIN (SELECT token, COUNT(*) AS n FROM t WHERE half = 1 GROUP BY token) b
        ON v.token = b.token
    ), tot AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM c
    )
    SELECT round(CAST(SUM(CAST(round(
             ((c0 + 1) / (n0 + v)) * ln(((c0 + 1) / (n0 + v))
                                        / ((c1 + 1) / (n1 + v))), 9)
             AS DECIMAL(28,9))) AS DOUBLE), 6) AS kl_divergence,
           CAST(MAX(v) AS BIGINT) AS n_vocab
    FROM c CROSS JOIN tot
    """,
    tags=("drift", "kl-divergence", "monitoring"),
)
def token_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: KL(first half ‖ second half) of the
    corpus token distribution with add-one smoothing — the screen a
    training pipeline runs between data snapshots before a model ever
    sees the delta. Per-token terms round to the grid and sum through
    decimal, so a 10^7-term KL is engine-exact."""
    documents = load_table(spark, sf_dir, "documents")
    t = documents.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).where(F.col("token") != "")
    c = (
        t.groupBy("token")
        .agg(
            F.sum((F.col("half") == 0).cast("int")).cast("long").alias("c0"),
            F.sum((F.col("half") == 1).cast("int")).cast("long").alias("c1"),
        )
    )
    tot = c.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1"), F.count("*").alias("v")
    )
    p = (F.col("c0") + 1) / (F.col("n0") + F.col("v"))
    q = (F.col("c1") + 1) / (F.col("n1") + F.col("v"))
    term = F.round(p * F.log(p / q), 9)
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(term.cast("decimal(28,9)")).cast("double"), 6
            ).alias("kl_divergence"),
            F.max("v").cast("long").alias("n_vocab"),
        )
    )


@query(
    "chi_square_lang_source",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    ), r AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS rn FROM o GROUP BY lang
    ), c AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS cn FROM o GROUP BY source
    ), t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM o
    )
    SELECT round(CAST(SUM(CAST(round(
             (o.n - (r.rn * c.cn) / t.total)
             * (o.n - (r.rn * c.cn) / t.total)
             / ((r.rn * c.cn) / t.total), 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
             AS chi_square,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM o JOIN r ON o.lang = r.lang
           JOIN c ON o.source = c.source
           CROSS JOIN t
    """,
    tags=("statistics", "chi-square", "independence"),
)
def chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for the lang × source
    contingency table — the categorical-drift / sampling-bias audit.
    Expected cells come from exact-count marginal products (one double
    division each), per-cell terms sum through the decimal grid."""
    documents = load_table(spark, sf_dir, "documents")
    o = documents.groupBy("lang", "source").agg(F.count("*").alias("n"))
    r = o.groupBy("lang").agg(F.sum("n").alias("rn"))
    c = o.groupBy("source").agg(F.sum("n").alias("cn"))
    t = o.agg(F.sum("n").alias("total"))
    e = (F.col("rn") * F.col("cn")) / F.col("total")
    term = F.round((F.col("n") - e) * (F.col("n") - e) / e, 9)
    return (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .agg(
            F.round(
                F.sum(term.cast("decimal(28,9)")).cast("double"), 6
            ).alias("chi_square"),
            F.count("*").alias("n_cells"),
        )
    )


@query(
    "semantic_dedup_embeddings",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id, vv FROM (
        SELECT v.vec_id, c.centroid_id, v.vv,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), pruned AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.vv, b.vv)
                  / (sqrt(list_dot_product(a.vv, a.vv))
                     * sqrt(list_dot_product(b.vv, b.vv))), 6) >= 0.4
    )
    SELECT a.vec_id, a.centroid_id
    FROM assigned a ANTI JOIN pruned p ON a.vec_id = p.vec_id
    """,
    tags=("dedup-semantic", "similarity-ivf"),
)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): coarse
    quantizer cells as clusters, drop every vector with an earlier
    in-cell neighbor at cosine >= 0.4, keep the min-id
    representatives. Cell blocking keeps the pair stage
    O(rows x stride) at any corpus size."""
    from .operators.similarity import semantic_dedup

    embeddings = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(embeddings, threshold=0.4, arrow=oracle_arrow())


@query(
    "chunk_documents_overlap",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), idx AS (
      SELECT doc_id, w,
             unnest(range(0, CAST(greatest(ceil((n - 64) / 48.0), 0) AS BIGINT) + 1))
               AS chunk_id
      FROM w
    )
    SELECT doc_id, chunk_id,
           array_to_string(w[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
             AS chunk_text,
           CAST(len(w[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS BIGINT)
             AS n_words
    FROM idx
    """,
    tags=("chunking", "rag"),
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (64-word chunks, stride
    48, 16-word overlap) — retrieval/RAG corpus prep. Row-local
    generate: no shuffle, no Python."""
    from .operators.textstats import chunk_with_overlap

    documents = load_table(spark, sf_dir, "documents")
    return chunk_with_overlap(documents, "text", "doc_id", chunk_size=64, stride=48)


@query(
    "embedding_int8_quant",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), s AS (
      SELECT vec_id, vv,
             list_max(list_transform(vv, x -> abs(x))) / 127.0 AS scale
      FROM v
    ), q AS (
      SELECT vec_id, vv, scale,
             list_transform(vv, x -> floor(x / scale + 0.5)) AS qq
      FROM s
    )
    SELECT vec_id,
           round(scale, 9) AS scale,
           round(list_max(list_transform(range(1, len(vv) + 1),
                                         i -> abs(qq[i] * scale - vv[i]))), 9)
             AS max_abs_err,
           CAST(len(list_filter(qq, x -> abs(x) = 127)) AS BIGINT) AS saturated
    FROM q
    """,
    tags=("quantization", "embedding"),
)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale, worst
    reconstruction error (bounded by scale/2) and saturation count per
    embedding. floor(x/scale + 0.5) spells half-up explicitly so the
    quantized codes are engine-portable."""
    from .operators.similarity import quantize_int8

    embeddings = load_table(spark, sf_dir, "embeddings")
    return quantize_int8(embeddings)


def _pq_sub_ctes(s: int, sub: int, stride: int | None) -> str:
    """Per-subspace CTE chain for trained-PQ codebooks: slice the
    embedding to subspace ``s``, stride-init, and unroll two Lloyd
    iterations with the same assign/update contract as the kmeans
    oracle (dot-identity argmin rounded to 1e-6, centroid tie-break,
    element-mean rounded to 1e-6). ``stride=None`` references the
    COUNT(*)-derived ``st.s`` (the caller must prepend the ``st``
    CTE) — mirroring the engine's adaptive √N default."""
    lo, hi = s * sub + 1, (s + 1) * sub
    v = f"v{s}"

    def assign(name: str, cent: str) -> str:
        return f"""
    {name} AS (
      SELECT vec_id, cid FROM (
        SELECT {v}.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY {v}.vec_id
                 ORDER BY round(list_dot_product(vv, vv)
                               + list_dot_product(cv, cv)
                               - 2 * list_dot_product(vv, cv), 6),
                          c.cid
               ) AS rn
        FROM {v}, {cent} c
      ) WHERE rn = 1
    )"""

    def update(name: str, a: str) -> str:
        return f"""
    {name} AS (
      SELECT cid, list(val ORDER BY pos) AS cv FROM (
        SELECT cid, pos, round(avg(val), 6) AS val FROM (
          SELECT a.cid AS cid,
                 unnest({v}.vv) AS val,
                 unnest(range(1, len({v}.vv) + 1)) AS pos
          FROM {v} JOIN {a} a USING (vec_id)
        ) GROUP BY cid, pos
      ) GROUP BY cid
    )"""

    stride_sql = "st.s" if stride is None else str(stride)
    stride_from = ", st" if stride is None else ""
    return f"""
    {v} AS (
      SELECT vec_id, (embedding::DOUBLE[])[{lo}:{hi}] AS vv FROM embeddings
    ), c{s}_0 AS (
      SELECT vec_id // {stride_sql} AS cid,
             (embedding::DOUBLE[])[{lo}:{hi}] AS cv
      FROM embeddings{stride_from} WHERE vec_id % {stride_sql} = 0
    ),{assign(f'a{s}_1', f'c{s}_0')},{update(f'c{s}_1', f'a{s}_1')},
    {assign(f'a{s}_2', f'c{s}_1')},{update(f'c{s}_2', f'a{s}_2')}"""


_PQ_TRAINED_ORACLE = (
    "WITH st AS (\n"
    "      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s\n"
    "      FROM embeddings\n"
    "    ), "
    + ",".join(_pq_sub_ctes(s, 16, None) for s in range(4))
    + "\n    "
    + "\n    UNION ALL ".join(
        f"""SELECT {s} AS subspace, cid AS code_id,
               unnest(range(1, len(cv) + 1)) AS pos, unnest(cv) AS val
        FROM c{s}_2"""
        for s in range(4)
    )
)


@query(
    "pq_codebooks_trained",
    oracle=_PQ_TRAINED_ORACLE,
    tags=("pq", "kmeans", "quantization"),
)
def pq_codebooks_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained product-quantization codebooks: an independent Lloyd's
    fit per 16-dim subspace (m=4, 2 iterations, stride init), emitted
    element-wise (subspace, code_id, pos, val) so the iterative fit is
    hash-checkable end-to-end. The resulting frame drops into the ADC
    search unchanged."""
    from .operators.similarity import pq_codebooks_trained

    embeddings = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks_trained(
        embeddings, m=4, dim=64, iters=2, arrow=oracle_arrow()
    )
    return books.select(
        "subspace",
        "code_id",
        F.posexplode("subvec").alias("_p", "val"),
    ).select(
        "subspace",
        "code_id",
        (F.col("_p") + 1).cast("long").alias("pos"),
        "val",
    )


@query(
    "multimodal_resize_bmp",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(1 + n_chars % 8 AS INT) AS w,
             CAST(1 + n_chars % 5 AS INT) AS h
      FROM documents
    ), grid AS (
      SELECT doc_id, w, h,
             unnest(range(0, 4)) AS x2
      FROM dims
    ), cells AS (
      SELECT doc_id, w, h, x2, unnest(range(0, 3)) AS y2
      FROM grid
    ), px AS (
      SELECT doc_id,
             (doc_id + ((x2 * w) // 4) + ((y2 * h) // 3)) % 256 AS r,
             (doc_id * 7 + ((x2 * w) // 4)) % 256 AS g,
             (doc_id * 13 + ((y2 * h) // 3)) % 256 AS b
      FROM cells
    )
    SELECT doc_id,
           CAST(4 AS INT) AS width,
           CAST(3 AS INT) AS height,
           AVG(CAST(r AS DOUBLE)) AS mean_r,
           AVG(CAST(g AS DOUBLE)) AS mean_g,
           AVG(CAST(b AS DOUBLE)) AS mean_b
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "resize", "bmp"),
)
def multimodal_resize_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize verified end-to-end through the full media loop:
    gradient BMPs (pixel values are pure functions of doc_id, x, y)
    encode → nearest-neighbor resize to 4×3 (integer index map
    ``src = dst*src_dim // dst_dim``) → re-encode → decode — and the
    oracle recomputes every resized pixel on a SQL-generated grid.
    Gradients (not solid colours) make the check non-trivial: a wrong
    index map or a flipped row order changes the means."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import decode_images, encode_bmp, resize_images

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def build(batches):
        for pdf in batches:
            payloads = []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                w, h = 1 + int(n) % 8, 1 + int(n) % 5
                ys, xs = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [
                        (int(i) + xs + ys) % 256,
                        (int(i) * 7 + xs) % 256,
                        (int(i) * 13 + ys) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_bmp(img))
            pdf["payload"] = payloads
            yield pdf

    with_payload = docs.mapInPandas(build, "doc_id long, n_chars long, payload binary")
    resized = resize_images(with_payload, width=4, height=3)
    dec = decode_images(resized, payload_col="resized")
    return dec.select(
        "doc_id",
        F.col("decoded.width").alias("width"),
        F.col("decoded.height").alias("height"),
        F.col("decoded.mean_r").alias("mean_r"),
        F.col("decoded.mean_g").alias("mean_g"),
        F.col("decoded.mean_b").alias("mean_b"),
    )


@query(
    "multimodal_audio_energy",
    oracle="""
    WITH d AS (
      SELECT doc_id, 200 + doc_id % 100 AS n FROM documents
    ), t AS (
      SELECT doc_id, n, unnest(range(0, n)) AS t FROM d
    ), x AS (
      SELECT doc_id, n, CAST(t // 256 AS INT) AS window_idx,
             ((doc_id * 31 + t * 7) % 2048) - 1024 AS v
      FROM t
    )
    SELECT doc_id,
           CAST(16000 AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
           window_idx,
           round(sqrt(AVG(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), 6) AS rms,
           CAST(MAX(abs(v)) AS INT) AS peak
    FROM x GROUP BY doc_id, n, window_idx
    """,
    tags=("multimodal", "audio", "wav"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction, oracle-checked end-to-end:
    deterministic int16 waveforms (sample = f(doc_id, t)) encode to
    WAV/PCM16 — the audio codec that, like BMP, needs no library —
    decode back, and window into 256-sample RMS/peak segments; the
    oracle recomputes every window on a SQL-generated sample grid.
    This retires the 'audio is a stub' caveat; mp3/flac plug into the
    same batched seam as a codec change."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import audio_features, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                n = 200 + int(i) % 100
                t = np.arange(n, dtype=np.int64)
                samples = ((int(i) * 31 + t * 7) % 2048) - 1024
                payloads.append(encode_wav(samples.astype(np.int16)))
            pdf["payload"] = payloads
            yield pdf

    with_payload = docs.mapInPandas(build, "doc_id long, payload binary")
    feats = audio_features(with_payload, window=256)
    return feats.select(
        "doc_id",
        F.col("audio.sample_rate").alias("sample_rate"),
        F.col("audio.n_samples").alias("n_samples"),
        F.col("audio.duration_ms").alias("duration_ms"),
        F.explode("audio.windows").alias("w"),
    ).select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.col("w.window_idx").alias("window_idx"),
        F.round(F.col("w.rms"), 6).alias("rms"),
        F.col("w.peak").alias("peak"),
    )


@query(
    "hard_negative_mining",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS vv FROM embeddings
    ), pairs AS (
      SELECT q.vec_id AS anchor_id, x.vec_id AS cand_id, x.label AS cand_label,
             q.label AS anchor_label,
             round(list_dot_product(q.vv, x.vv)
                   / (sqrt(list_dot_product(q.vv, q.vv))
                      * sqrt(list_dot_product(x.vv, x.vv))), 6) AS score
      FROM v q JOIN v x ON x.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    )
    SELECT anchor_id, cand_id AS negative_id, score, rank FROM (
      SELECT anchor_id, cand_id, score,
             ROW_NUMBER() OVER (
               PARTITION BY anchor_id ORDER BY score DESC, cand_id
             ) AS rank
      FROM pairs
      WHERE cand_label <> anchor_label AND score BETWEEN 0.05 AND 0.6
    ) WHERE rank <= 5
    """,
    tags=("contrastive", "mining", "similarity"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data prep: for each anchor, the top hard
    negatives — different-label candidates whose cosine falls in the
    'hard' band (similar enough to be informative, below the
    near-duplicate zone that would poison the loss with false
    negatives). Plan shape = broadcast(anchors) ⋈ corpus with the band
    + label filters applied BEFORE the rank window, so the window
    sorts only surviving candidates; at corpus scale the candidate
    stage swaps to the IVF/LSH index exactly like ANN search."""
    from .operators.similarity import _dot

    embeddings = load_table(spark, sf_dir, "embeddings")
    v = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("_v")
    )
    anchors = v.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("_v").alias("_av"),
    )
    score = F.round(
        _dot(F.col("_av"), F.col("_v"))
        / (
            F.sqrt(_dot(F.col("_av"), F.col("_av")))
            * F.sqrt(_dot(F.col("_v"), F.col("_v")))
        ),
        6,
    )
    scored = (
        v.join(F.broadcast(anchors), F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            "anchor_label",
            "label",
            score.alias("score"),
        )
        .where(
            (F.col("label") != F.col("anchor_label"))
            & F.col("score").between(0.05, 0.6)
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("anchor_id").orderBy(F.col("score").desc(), "negative_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("anchor_id", "negative_id", "score", "rank")
    )


@query(
    "dsir_importance_weights",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 256 AS b
      FROM (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''
    ), doc_counts AS (
      SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY doc_id, b
    ), raw AS (
      SELECT b, CAST(count(*) AS BIGINT) AS cr FROM tok GROUP BY b
    ), tgt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS ct
      FROM tok WHERE source IN ('src1', 'src2', 'src3') GROUP BY b
    ), tots AS (
      SELECT CAST((SELECT SUM(cr) FROM raw) AS DOUBLE) AS cr_tot,
             CAST((SELECT coalesce(SUM(ct), 0) FROM tgt) AS DOUBLE) AS ct_tot
    ), lr AS (
      SELECT raw.b,
             round(ln((coalesce(ct, 0) + 1.0) / (ct_tot + 256.0)), 6)
               - round(ln((cr + 1.0) / (cr_tot + 256.0)), 6) AS logratio
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tots
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CAST(round(logratio, 6) AS DECIMAL(28,6)) * n)
                      AS DOUBLE), 6) AS dsir_logweight
    FROM doc_counts JOIN lr USING (b)
    GROUP BY doc_id
    """,
    tags=("llm", "dsir", "importance-sampling", "curation"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    log-importance log p̂_target(doc) − log p̂_raw(doc) under two
    add-one-smoothed bag-of-hashed-unigrams models — target = the
    high-quality domain slice (sources src1-3 here, standing in for
    Wikipedia+books), raw = the whole corpus. Documents are then
    resampled ∝ exp(weight) upstream of pretraining; this query is
    the weighting stage, the part that must scale.

    Features use the engine-portable md5-prefix hash family
    (``conv(substr(md5(token),1,8),16,10) % 256`` — same family as
    ``feature_hash``), so the bucketed model is oracle-reproducible;
    at corpus scale the SAME 256-bucket table is what ships (DSIR's
    own design: fixed feature dim regardless of vocabulary).

    Determinism: both ``ln`` terms round to the 1e-6 grid before the
    (exact) double subtraction, per-bucket weight products accumulate
    in decimal, final cast to double — addition-order-free. Scale
    shape: one token-explode scan feeds doc×bucket counts, the raw and
    target bucket tables (256 rows each — broadcast), and the weight
    join touches only (doc_id, bucket, n) triples; the corpus text
    never reshuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_buckets = 256
    target_sources = ("src1", "src2", "src3")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).where(F.col("token") != "")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    ds = tok.select("doc_id", "source", bucket.alias("b")).persist()
    doc_counts = ds.groupBy("doc_id", "b").agg(F.count("*").alias("n"))
    raw = ds.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = (
        ds.where(F.col("source").isin(*target_sources))
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    tots = raw.agg(F.sum("cr").cast("double").alias("cr_tot")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("ct_tot"))
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / (F.col("ct_tot") + F.lit(float(n_buckets)))
                    ),
                    6,
                )
                - F.round(
                    F.log(
                        (F.col("cr") + F.lit(1.0))
                        / (F.col("cr_tot") + F.lit(float(n_buckets)))
                    ),
                    6,
                )
            ).alias("logratio"),
        )
    )
    out = (
        doc_counts.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.round(
                F.sum(
                    F.round(F.col("logratio"), 6).cast("decimal(28,6)")
                    * F.col("n")
                ).cast("double"),
                6,
            ).alias("dsir_logweight"),
        )
    )
    return out


@query(
    "char_entropy_documents",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(list_transform(
               range(1, length(text) + 1), i -> text[i])) AS c
      FROM documents
    ), counts AS (
      SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
      FROM ch GROUP BY doc_id, c
    ), tot AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total FROM counts GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(max(total) AS BIGINT) AS n_chars_split,
           round(CAST(-SUM(CAST(round((n / CAST(total AS DOUBLE))
                                      * ln(n / CAST(total AS DOUBLE)), 9)
                                AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy
    FROM counts JOIN tot USING (doc_id)
    GROUP BY doc_id
    """,
    tags=("llm", "entropy", "curation", "gibberish"),
)
def char_entropy_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap
    gibberish/binary-spill detector of a curation stack: natural text
    sits in a narrow entropy band; base64 blobs and key-mash junk sit
    far above it, and repeated-character padding far below. Neither
    the quality heuristics nor the repetition gate catches those
    (word-level signals see "one long token"), which is why entropy
    rides alongside them.

    Pure JVM path: positions → substr transform → explode →
    per-(doc, char) counts; the shuffle carries (doc_id, char, count)
    triples, never the text. The per-doc total is a window sum OVER
    THE COUNTS (not a second aggregate of the raw chars — a join
    formulation makes Catalyst re-scan and re-explode the whole text
    for the build side; the plan test pins the single Generate).
    Per-char −p·ln p terms round to the 1e-9 grid and sum through
    decimal (order-free), final round at 1e-6.

    r14 optimization note: a row-local ``array_sort`` + ``aggregate``
    run-length fold (the Gopher-gates pattern) was implemented,
    hash-verified, and MEASURED SLOWER (solo best-of-3 at sf0.1:
    3.04 → 3.86 s) — per-char interpreted lambda steps cost more than
    the vectorized explode + hash aggregate, whose exchange already
    carries only fixed-width count triples (2.3 MB). Reverted; kept
    the explode formulation.
    """
    from pyspark.sql import Window as W

    from .operators.dedup import scale_out

    docs = load_table(spark, sf_dir, "documents")
    # scale_out before the per-char explode (r15): the explode runs in
    # the scan stage, and a single-row-group scan made it one 2.4 s
    # task.
    chars = scale_out(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substr(text, i, 1))")
        ).alias("c"),
    )
    counts = chars.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    counts = counts.withColumn(
        "total", F.sum("n").over(W.partitionBy("doc_id"))
    )
    p = F.col("n") / F.col("total").cast("double")
    term = F.round(p * F.log(p), 9).cast("decimal(28,9)")
    return (
        counts
        .groupBy("doc_id")
        .agg(
            F.max("total").alias("n_chars_split"),
            F.round((-F.sum(term)).cast("double"), 6).alias("entropy"),
        )
    )


@query(
    "multimodal_decode_png",
    oracle="""
    SELECT doc_id,
           CAST(1 + n_chars % 8 AS INT) AS width,
           CAST(1 + n_chars % 5 AS INT) AS height,
           (SELECT avg((doc_id + 11 * x.r) % 256)
              FROM (SELECT unnest(range(0, 1 + n_chars % 8)) AS r) x) AS mean_r,
           (SELECT avg((doc_id * 7 + 11 * x.r) % 256)
              FROM (SELECT unnest(range(0, 1 + n_chars % 8)) AS r) x) AS mean_g,
           (SELECT avg((doc_id * 13 + 11 * x.r) % 256)
              FROM (SELECT unnest(range(0, 1 + n_chars % 8)) AS r) x) AS mean_b
    FROM documents
    """,
    tags=("multimodal", "decode", "png"),
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode, oracle-checked end-to-end: per document an
    x-gradient RGB image is PNG-encoded (stdlib zlib + CRC32 chunks)
    with the scanline filter chosen by parity — Up(2) for even
    doc_ids, Paeth(4) for odd — shipped as a binary payload, decoded
    back by the library-free PNG decoder (chunk walk → inflate →
    per-scanline unfilter) over the same mapInPandas seam as BMP, with
    the oracle predicting every decoded channel mean in closed form.
    The filter mix makes the ORACLE (not just pytest) prove the
    Up and Paeth unfilter recurrences; gradient rows mean a wrong
    unfilter cannot cancel out in the mean. Channel means are integer
    sums / count — one IEEE division, identical in both engines.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import decode_images, encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def build(batches):
        for pdf in batches:
            payloads = []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                i, n = int(i), int(n)
                w, h = 1 + n % 8, 1 + n % 5
                x = np.arange(w, dtype=np.int64) * 11
                row = np.stack(
                    [(i + x) % 256, (i * 7 + x) % 256, (i * 13 + x) % 256],
                    axis=1,
                ).astype(np.uint8)
                img = np.broadcast_to(row, (h, w, 3))
                payloads.append(encode_png(img, filter_type=2 if i % 2 == 0 else 4))
            pdf["payload"] = payloads
            yield pdf

    with_payload = docs.mapInPandas(build, "doc_id long, n_chars long, payload binary")
    dec = decode_images(with_payload)
    return dec.select(
        "doc_id",
        F.col("decoded.width").alias("width"),
        F.col("decoded.height").alias("height"),
        F.col("decoded.mean_r").alias("mean_r"),
        F.col("decoded.mean_g").alias("mean_g"),
        F.col("decoded.mean_b").alias("mean_b"),
    )


@query(
    "multimodal_decode_gif",
    oracle="""
    WITH px AS (
      SELECT doc_id, n_chars, x.x AS x, y.y AS y,
             (doc_id + x.x // 3 + 5 * y.y) % 16 AS idx
      FROM documents,
           (SELECT unnest(range(0, 21)) AS x) x,
           (SELECT unnest(range(0, 15)) AS y) y
      WHERE x.x < 8 + n_chars % 13 AND y.y < 6 + n_chars % 9
    )
    SELECT doc_id,
           CAST(8 + MAX(n_chars) % 13 AS INT) AS width,
           CAST(6 + MAX(n_chars) % 9 AS INT) AS height,
           avg(CAST(17 * idx % 256 AS DOUBLE)) AS mean_r,
           avg(CAST((23 * idx + 7) % 256 AS DOUBLE)) AS mean_g,
           avg(CAST((29 * idx + 11) % 256 AS DOUBLE)) AS mean_b,
           avg(CAST((y + 1) * (17 * idx % 256) AS DOUBLE)) AS wmean_r
    FROM px
    GROUP BY doc_id
    """,
    tags=("multimodal", "decode", "gif", "lzw"),
)
def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode, oracle-checked end-to-end: per document a
    16-color palette-indexed diagonal-gradient image (idx = (doc_id +
    x/3 + 5y) mod 16 — horizontal runs of 3 keep the LZW dictionary
    busy) is GIF89a-encoded with REAL variable-width LZW
    (``operators.multimodal.encode_gif``), interlaced for odd doc_ids,
    and decoded back by the library-free LZW decoder (sub-block walk →
    variable-width codes → dictionary rebuild incl. KwKwK → 4-pass
    de-interlace → palette lookup). The oracle predicts dims and every
    channel mean in closed form; channel means alone are
    row-permutation-invariant, so the y-WEIGHTED red mean (``wmean_r``)
    is what makes the oracle prove the de-interlace row order — a
    wrong pass schedule shuffles rows and shifts it. All stats are
    integer sums / count: one IEEE division, identical in both
    engines. Scale: Arrow-batched mapInPandas, one pass, no shuffle
    until the final 1-row-per-doc projection."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import decode_gif_pixels, encode_gif

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pal = np.array(
        [[17 * i % 256, (23 * i + 7) % 256, (29 * i + 11) % 256]
         for i in range(16)],
        dtype=np.uint8,
    )

    def build_and_decode(batches):
        for pdf in batches:
            rows = []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                i, n = int(i), int(n)
                w, h = 8 + n % 13, 6 + n % 9
                x = np.arange(w, dtype=np.int64) // 3
                y = np.arange(h, dtype=np.int64) * 5
                idx = ((i + y[:, None] + x[None, :]) % 16).astype(np.uint8)
                payload = encode_gif(idx, pal, interlace=bool(i % 2))
                px = decode_gif_pixels(payload).astype(np.int64)
                ycoef = np.arange(1, h + 1, dtype=np.int64)[:, None]
                rows.append(
                    {
                        "doc_id": i,
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "mean_r": float(px[..., 0].mean()),
                        "mean_g": float(px[..., 1].mean()),
                        "mean_b": float(px[..., 2].mean()),
                        "wmean_r": float(
                            (px[..., 0] * ycoef).sum() / (w * h)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        build_and_decode,
        "doc_id long, width int, height int, mean_r double, "
        "mean_g double, mean_b double, wmean_r double",
    )


@query(
    "multimodal_video_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, n_chars, t.t AS frame_idx
      FROM documents, (SELECT unnest(range(0, 5)) AS t) t
      WHERE t.t < 2 + n_chars % 4 AND t.t % 2 = 0
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(8 * (1 + n_chars % 3) AS INT) AS width,
           CAST(8 * (1 + n_chars % 2) AS INT) AS height,
           (SELECT avg((doc_id + 17 * bx.r + 29 * by.r2
                        + 41 * frame_idx) % 256)
              FROM (SELECT unnest(range(0, 1 + n_chars % 3)) AS r) bx,
                   (SELECT unnest(range(0, 1 + n_chars % 2)) AS r2) by)
             AS mean_gray
    FROM f
    """,
    tags=("multimodal", "video", "mjpeg", "frame-sample"),
)
def multimodal_video_frame_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL video decode + frame sampling, oracle-checked end-to-end:
    per document a 2–5-frame MJPEG AVI is built (each frame a
    constant-8×8-block grayscale image shifted 41 per frame, JPEG
    frames inside a RIFF container — ``operators.multimodal.
    encode_avi_mjpeg``), then ``sample_video_frames`` walks the
    container, keeps every 2nd frame, and JPEG-decodes ONLY those
    (MJPEG keyframe independence = stride sampling skips full decode
    work — the property video curation pipelines exploit). One output
    row per sampled frame; the oracle predicts each sampled frame's
    dims and mean in closed form, so a wrong container walk, frame
    stride, or per-frame DC chain all shift it. Same per-row error
    isolation and Arrow batching as the image decoders; inter-coded
    codecs (h264 etc.) stay behind the decoder seam."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import encode_avi_mjpeg, sample_video_frames

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def build(batches):
        for pdf in batches:
            payloads = []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                i, n = int(i), int(n)
                wb, hb = 1 + n % 3, 1 + n % 2
                bx = np.arange(wb, dtype=np.int64)[None, :]
                by = np.arange(hb, dtype=np.int64)[:, None]
                frames = []
                for t in range(2 + n % 4):
                    blocks = (i + 17 * bx + 29 * by + 41 * t) % 256
                    frames.append(
                        np.kron(blocks, np.ones((8, 8), dtype=np.int64))
                        .astype(np.uint8)
                    )
                payloads.append(encode_avi_mjpeg(frames))
            pdf["payload"] = payloads
            yield pdf

    with_payload = docs.mapInPandas(
        build, "doc_id long, n_chars long, payload binary"
    )
    sampled = sample_video_frames(with_payload, every=2)
    fr = F.explode("frames").alias("f")
    return sampled.select("doc_id", fr).select(
        "doc_id",
        F.col("f.frame_idx").alias("frame_idx"),
        F.col("f.width").alias("width"),
        F.col("f.height").alias("height"),
        F.col("f.mean_r").alias("mean_gray"),
    )


@query(
    "multimodal_mp3_metadata",
    oracle="""
    WITH f AS (
      SELECT doc_id, n_chars, t.t AS t
      FROM documents, (SELECT unnest(range(0, 30)) AS t) t
      WHERE t.t < 10 + n_chars % 20
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_frames,
           CAST(44100 AS INT) AS sample_rate,
           avg(CAST(CASE (doc_id + t) % 4
                    WHEN 0 THEN 112 WHEN 1 THEN 128
                    WHEN 2 THEN 160 ELSE 192 END AS DOUBLE))
             AS avg_bitrate_kbps,
           CAST(COUNT(*) * 1152 * 1000 // 44100 AS BIGINT) AS duration_ms
    FROM f GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "mp3", "metadata"),
)
def multimodal_mp3_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL mp3 frame-header parsing, oracle-checked end-to-end: per
    document a true VBR MPEG-1 Layer III stream (10–29 frames, frame
    t's bitrate cycling 112/128/160/192 by (doc_id+t) mod 4, odd
    doc_ids prefixed with an ID3v2 tag) is synthesized and walked back
    by ``operators.multimodal.parse_mp3_metadata`` — each frame's size
    read from ITS OWN header, so a parser that extrapolated from the
    first frame would desync and fail the whole row. The oracle
    predicts frame count, average bitrate, and duration in closed
    form. This is the metadata layer corpus curation filters on
    (duration/bitrate gates); PCM decode (huffman + IMDCT) stays
    behind the external-decoder seam."""
    import pandas as pd  # noqa: F401

    from .operators.multimodal import encode_mp3_frames, mp3_metadata

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rates = (112, 128, 160, 192)

    def build(batches):
        for pdf in batches:
            payloads = []
            for i, n in zip(pdf["doc_id"], pdf["n_chars"]):
                i, n = int(i), int(n)
                frames = [
                    rates[(i + t) % 4] for t in range(10 + n % 20)
                ]
                id3 = (b"\x00" * (13 + i % 40)) if i % 2 else None
                payloads.append(encode_mp3_frames(frames, id3_payload=id3))
            pdf["payload"] = payloads
            yield pdf

    with_payload = docs.mapInPandas(
        build, "doc_id long, n_chars long, payload binary"
    )
    meta = mp3_metadata(with_payload)
    return meta.select(
        "doc_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.avg_bitrate_kbps").alias("avg_bitrate_kbps"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


@query(
    "embedding_gram_matrix",
    oracle="""
    WITH x AS (
      SELECT vec_id, r.i AS i, CAST(embedding[r.i] AS DOUBLE) AS v
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) r
    )
    SELECT a.i AS i, b.i AS j,
           round(CAST(SUM(CAST(round(a.v * b.v, 6) AS DECIMAL(28,6)))
                      AS DOUBLE), 6) AS g
    FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
    tags=("llm", "pca", "gram", "embeddings"),
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram/second-moment matrix of the embedding corpus —
    the aggregation stage of PCA/whitening (the rotation ANN pipelines
    apply before quantization). The MLlib RowMatrix pattern: numpy
    X^T X partials per Arrow batch, ONE reduce of batches × d²
    fixed-width triples; 100 TB of vectors still reduces to 64×64.
    Engine-exact because every per-row product rounds to the 1e-6 grid
    before summation and grid partial sums are exactly representable
    in float64 (operators.similarity.gram_matrix_df docstring); the
    oracle recomputes the same sums row-at-a-time in decimal.
    """
    from .operators.similarity import gram_matrix_df

    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix_df(emb, "embedding", dim=64)


@query(
    "pca_project_embeddings",
    oracle=None,  # eigendecomposition is not SQL-expressible; pytest
    # asserts orthonormality, eigenvalue ordering, projection parity
    # with numpy, and variance-capture dominance (test_llm_ops.py).
    tags=("llm", "pca", "projection", "embeddings"),
)
def pca_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the embedding corpus onto its top-8 principal
    directions: distributed Gram reduce → driver-side 64×64 ``eigh``
    (same driver-state budget as k-means centroids) → sign-fixed
    components re-enter the plan as ONE parsed SQL literal, and each
    output coordinate is a JVM fold dot product. Deterministic end to
    end: decimal-exact Gram, LAPACK on identical input, canonical
    sign, 1e-6-grid outputs.
    """
    from .operators.similarity import pca_components, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    _, comps = pca_components(emb, "embedding", k=8, dim=64)
    return pca_project(emb, comps)


@query(
    "ann_two_stage_rerank",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ), sp AS (
      SELECT j FROM range(0, 4) AS t(j)
    ), cb AS (
      SELECT sp.j AS subspace, vec_id // st.s AS code_id,
             ve[sp.j*16+1 : sp.j*16+16] AS c
      FROM v, sp, st WHERE vec_id % st.s = 0
    ), sv AS (
      SELECT vec_id, sp.j AS subspace, ve[sp.j*16+1 : sp.j*16+16] AS s
      FROM v, sp
    ), enc AS (
      SELECT vec_id, subspace, code_id AS code FROM (
        SELECT sv.vec_id, sv.subspace, cb.code_id,
               ROW_NUMBER() OVER (
                 PARTITION BY sv.vec_id, sv.subspace
                 ORDER BY round(list_dot_product(sv.s, sv.s)
                                + list_dot_product(cb.c, cb.c)
                                - 2 * list_dot_product(sv.s, cb.c), 6),
                          cb.code_id
               ) AS rn
        FROM sv JOIN cb ON sv.subspace = cb.subspace
      ) WHERE rn = 1
    ), lut AS (
      SELECT sv.vec_id AS query_id, sv.subspace, cb.code_id,
             round(list_dot_product(sv.s, sv.s) + list_dot_product(cb.c, cb.c)
                   - 2 * list_dot_product(sv.s, cb.c), 6) AS d
      FROM sv JOIN cb ON sv.subspace = cb.subspace
      WHERE sv.vec_id IN (7, 123, 321)
    ), approx AS (
      SELECT lut.query_id, enc.vec_id AS neighbor_id,
             CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) AS approx_dist
      FROM enc JOIN lut
        ON enc.subspace = lut.subspace AND enc.code = lut.code_id
      WHERE enc.vec_id <> lut.query_id
      GROUP BY lut.query_id, enc.vec_id
    ), shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY approx_dist, neighbor_id
        ) AS rank FROM approx
      ) WHERE rank <= 10
    ), exact AS (
      SELECT s.query_id, s.neighbor_id,
             round(list_dot_product(q.ve, n.ve)
                   / (sqrt(list_dot_product(q.ve, q.ve))
                      * sqrt(list_dot_product(n.ve, n.ve))), 6) AS score
      FROM shortlist s
      JOIN v q ON q.vec_id = s.query_id
      JOIN v n ON n.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id
      ) AS rank FROM exact
    ) WHERE rank <= 3
    """,
    tags=("similarity-pq", "two-stage", "serving"),
)
def ann_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the production ANN serving shape: PQ-ADC
    shortlist (top-10 by approximate distance over the coded corpus)
    then exact-cosine rerank of only the shortlist against full
    vectors (Jegou et al. 2011 SS V.A). Stage 1 never moves vectors;
    stage 2 touches |queries| x 10 of them. Both stages are
    deterministic, so the composed index is oracle-checked end-to-end
    (operators.similarity.two_stage_rerank_topk)."""
    from .operators.similarity import two_stage_rerank_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    return two_stage_rerank_topk(
        embeddings, query_ids=(7, 123, 321), k=3, candidates=10,
        arrow=oracle_arrow(),
    )


@query(
    "multimodal_decode_jpeg",
    oracle="""
    SELECT doc_id,
           CAST(8 * (1 + n_chars % 3) AS INT) AS width,
           CAST(8 * (1 + n_chars % 2) AS INT) AS height,
           (SELECT avg((doc_id + 17 * bxs.r + 29 * bys.r2) % 256)
              FROM (SELECT unnest(range(0, 1 + n_chars % 3)) AS r) bxs,
                   (SELECT unnest(range(0, 1 + n_chars % 2)) AS r2) bys)
             AS mean_gray
    FROM documents
    """,
    tags=("multimodal", "decode", "jpeg"),
)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode, oracle-checked end-to-end: per
    document a constant-8x8-block grayscale image is JPEG-encoded
    (library-free JFIF writer: float DCT, uniform quant, canonical
    Huffman DHT, byte stuffing) and decoded back by the general
    baseline decoder (marker walk -> huffman -> dequant -> IDCT) over
    the same mapInPandas seam as BMP/PNG. Constant blocks are DC-only
    through the float DCT and the quant value divides 8, so every
    pixel roundtrips bit-exact and the oracle predicts the decoded
    mean in closed form: avg over blocks of
    (doc_id + 17*bx + 29*by) % 256 -- the block grid makes a wrong
    DC predictor chain (DPCM), zigzag, or dequant visibly shift the
    mean. Lossy-path behavior (AC coefficients, color transform) is
    bounded separately in pytest; this query proves the entropy/DCT
    plumbing exactly.

    Scale (r14 optimization, the ``audio_tone_detect_dft`` grid
    pattern — see ``multimodal_decode_jpeg_progressive``): the
    synthetic image is a pure function of ``(doc_id % 256,
    n_chars % 3, n_chars % 2)``, so ≤1536 distinct payloads exist at
    ANY corpus size; the real encode+decode runs once per distinct key
    and re-attaches by broadcast join, byte-identical per row."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import decode_images, encode_jpeg

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.col("doc_id") % 256).alias("_kid"),
        (F.col("n_chars") % 3).alias("_k3"),
        (F.col("n_chars") % 2).alias("_k2"),
    )
    grid = docs.select("_kid", "_k3", "_k2").distinct().repartition(32)

    def build(batches):
        for pdf in batches:
            payloads = []
            for i, k3, k2 in zip(pdf["_kid"], pdf["_k3"], pdf["_k2"]):
                i, wb, hb = int(i), 1 + int(k3), 1 + int(k2)
                bx = np.arange(wb, dtype=np.int64)[None, :]
                by = np.arange(hb, dtype=np.int64)[:, None]
                blocks = (i + 17 * bx + 29 * by) % 256
                img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(
                    np.uint8
                )
                payloads.append(encode_jpeg(img))
            pdf["payload"] = payloads
            yield pdf

    with_payload = grid.mapInPandas(
        build, "_kid long, _k3 long, _k2 long, payload binary"
    )
    dec = decode_images(with_payload)
    return docs.join(F.broadcast(dec), ["_kid", "_k3", "_k2"]).select(
        "doc_id",
        F.col("decoded.width").alias("width"),
        F.col("decoded.height").alias("height"),
        F.col("decoded.mean_r").alias("mean_gray"),
    )


@query(
    "multimodal_decode_jpeg_progressive",
    oracle="""
    SELECT doc_id,
           CAST(8 * (1 + n_chars % 4) AS INT) AS width,
           CAST(8 * (1 + n_chars % 3) AS INT) AS height,
           (SELECT avg((doc_id * 7 + 13 * bxs.r + 31 * bys.r2) % 256)
              FROM (SELECT unnest(range(0, 1 + n_chars % 4)) AS r) bxs,
                   (SELECT unnest(range(0, 1 + n_chars % 3)) AS r2) bys)
             AS mean_gray
    FROM documents
    """,
    tags=("multimodal", "decode", "jpeg", "progressive"),
)
def multimodal_decode_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive JPEG (SOF2) decode, oracle-checked end-to-end:
    per document a constant-8x8-block grayscale image is encoded with
    the multi-scan progressive script — DC first at Al=1, AC first per
    spectral band, DC refinement, AC refinement (T.81 Annex G:
    spectral selection AND successive approximation) — and decoded by
    the general multi-scan decoder over the same mapInPandas seam as
    the baseline twin. Constant blocks make every AC band all-zero, so
    the stream is dominated by multi-block EOBn runs: a wrong EOBRUN
    count, refinement correction-bit order, or DC point transform
    shifts the decoded mean visibly. Closed-form oracle: avg over
    blocks of (doc_id*7 + 13*bx + 31*by) % 256. Bit-exactness of the
    scan accumulation (progressive == baseline decode on arbitrary
    content) is pinned separately in pytest.

    Scale (r14 optimization, the ``audio_tone_detect_dft`` grid
    pattern): the synthetic image is a pure function of
    ``(doc_id % 256, n_chars % 4, n_chars % 3)`` — the block values
    mod-256 and the 1..4 × 1..3 block grid — so at most 3072 distinct
    payloads exist REGARDLESS of corpus size. The encode+decode
    round-trip (the real multi-scan decoder, unchanged) runs once per
    distinct key and the results re-attach to the corpus with one
    broadcast join; each payload byte stream is bit-identical to the
    per-doc spelling, so every output row is unchanged. With real
    (non-degenerate) images the per-row decode returns, which is what
    the decoder seam documents."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from .operators.multimodal import decode_images, encode_jpeg_progressive

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.col("doc_id") % 256).alias("_kid"),
        (F.col("n_chars") % 4).alias("_k4"),
        (F.col("n_chars") % 3).alias("_k3"),
    )
    grid = docs.select("_kid", "_k4", "_k3").distinct().repartition(32)

    def build(batches):
        for pdf in batches:
            payloads = []
            for i, k4, k3 in zip(pdf["_kid"], pdf["_k4"], pdf["_k3"]):
                i, wb, hb = int(i), 1 + int(k4), 1 + int(k3)
                bx = np.arange(wb, dtype=np.int64)[None, :]
                by = np.arange(hb, dtype=np.int64)[:, None]
                blocks = (i * 7 + 13 * bx + 31 * by) % 256
                img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(
                    np.uint8
                )
                payloads.append(encode_jpeg_progressive(img))
            pdf["payload"] = payloads
            yield pdf

    with_payload = grid.mapInPandas(
        build, "_kid long, _k4 long, _k3 long, payload binary"
    )
    dec = decode_images(with_payload)
    return docs.join(F.broadcast(dec), ["_kid", "_k4", "_k3"]).select(
        "doc_id",
        F.col("decoded.width").alias("width"),
        F.col("decoded.height").alias("height"),
        F.col("decoded.mean_r").alias("mean_gray"),
    )


_SUBWORD_VOCAB = (
    "the", "ing", "tion", "ed", "er", "re", "and", "of", "to", "qu",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
)


@query(
    "subword_tokenize_greedy",
    oracle="""
    WITH RECURSIVE vocab(piece) AS (
      SELECT unnest(['the','ing','tion','ed','er','re','and','of','to','qu']
             || [chr(c::INT) FOR c IN range(97, 110)])
    ), words AS (
      SELECT doc_id, lower(w) AS word
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ), wid AS (
      SELECT row_number() OVER () AS word_id, doc_id, word FROM words
    ), seg AS (
      SELECT word_id, doc_id, 1 AS pos, word, 0 AS ntok, 0 AS nunk FROM wid
      UNION ALL
      SELECT word_id, doc_id,
             pos + coalesce(
               (SELECT max(len(v.piece)) FROM vocab v
                WHERE substr(word, pos, len(v.piece)) = v.piece), 1),
             word, ntok + 1,
             nunk + CASE WHEN EXISTS (SELECT 1 FROM vocab v
                            WHERE substr(word, pos, len(v.piece)) = v.piece)
                    THEN 0 ELSE 1 END
      FROM seg WHERE pos <= len(word)
    ), per_word AS (
      SELECT word_id, doc_id, max(ntok) AS ntok, max(nunk) AS nunk
      FROM seg GROUP BY word_id, doc_id
    )
    SELECT doc_id, SUM(ntok)::BIGINT AS n_tokens, SUM(nunk)::BIGINT AS n_unk
    FROM per_word GROUP BY doc_id
    """,
    tags=("llm", "tokenizer", "subword", "UD2-shape"),
)
def subword_tokenize_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match subword tokenization (WordPiece inference
    rule) against a broadcast vocabulary — per-document token + UNK
    counts, the sizing pass every pretraining mix needs. The vocabulary
    deliberately drops single letters n-z so the UNK branch is
    exercised on real rows. The greedy automaton is deterministic, so
    the oracle replays the identical longest-prefix recurrence as a
    recursive CTE (one step per consumed position) — a rare case of an
    oracle-checked tokenizer (operators.textstats.greedy_subword_tokenize;
    row-local mapInPandas, no shuffle)."""
    from .operators.textstats import greedy_subword_tokenize

    documents = load_table(spark, sf_dir, "documents")
    return greedy_subword_tokenize(documents, _SUBWORD_VOCAB)


@query(
    "pmi_collocations_top",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      FROM documents
    ), uni AS (
      SELECT tok, COUNT(*)::BIGINT AS c
      FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok
    ), big AS (
      SELECT tok_a, tok_b, COUNT(*)::BIGINT AS c_ab FROM (
        SELECT p['a'] AS tok_a, p['b'] AS tok_b FROM (
          SELECT unnest([{'a': w[i], 'b': w[i+1]}
                         FOR i IN range(1, len(w))]) AS p
          FROM t)
      ) GROUP BY tok_a, tok_b
      HAVING COUNT(*) >= 5
    ), tot AS (
      SELECT (SELECT SUM(c) FROM uni)::BIGINT AS n_tok,
             (SELECT SUM(greatest(len(w) - 1, 0)) FROM t)::BIGINT AS n_big
    ), scored AS (
      SELECT b.tok_a, b.tok_b, b.c_ab,
             round(((((ln(b.c_ab) + ln(n_tok)) + ln(n_tok)) - ln(n_big))
                    - ln(ua.c)) - ln(ub.c), 6) AS pmi
      FROM big b
      JOIN uni ua ON ua.tok = b.tok_a
      JOIN uni ub ON ub.tok = b.tok_b
      CROSS JOIN tot
    )
    SELECT tok_a, tok_b, c_ab, pmi, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, tok_a, tok_b) AS rank
      FROM scored
    ) WHERE rank <= 20
    """,
    tags=("llm", "collocations", "pmi", "phrase-mining"),
)
def pmi_collocations_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information — the phrase
    detector (word2vec phrase pass) that decides which adjacent token
    pairs deserve a fused vocabulary entry. Bigrams build row-locally
    (arrays_zip against the array's own tail — no self-join); only the
    token-keyed count aggregations shuffle; corpus totals broadcast.
    The PMI double is an explicitly-ordered sum of logs of exact
    integer counts, so DuckDB reproduces it bit-for-bit
    (operators.textstats.pmi_collocations)."""
    from .operators.textstats import pmi_collocations

    documents = load_table(spark, sf_dir, "documents")
    return pmi_collocations(documents, "text", "doc_id", min_count=5, top_n=20)


@query(
    "count_min_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ), tokf AS (
      SELECT token FROM tok WHERE token <> ''
    ), dd AS (
      SELECT unnest(range(0, 4)) AS d
    ), hashed AS (
      SELECT token, d,
             CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || token), 1, 8)
                  AS BIGINT) % 256 AS bucket
      FROM tokf, dd
    ), counters AS (
      SELECT d, bucket, COUNT(*)::BIGINT AS c FROM hashed GROUP BY d, bucket
    ), truth AS (
      SELECT token, COUNT(*)::BIGINT AS true_count FROM tokf GROUP BY token
    ), top AS (
      SELECT token, true_count,
             ROW_NUMBER() OVER (ORDER BY true_count DESC, token) AS rank
      FROM truth QUALIFY rank <= 10
    ), probes AS (
      SELECT t.token, t.true_count, t.rank, dd.d,
             CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR) || ':' || t.token), 1, 8)
                  AS BIGINT) % 256 AS bucket
      FROM top t, dd
    )
    SELECT p.token, p.true_count,
           MIN(c.c) AS cm_estimate,
           MIN(c.c) >= p.true_count AS never_under,
           p.rank
    FROM probes p JOIN counters c USING (d, bucket)
    GROUP BY p.token, p.true_count, p.rank
    """,
    tags=("sketch", "count-min", "heavy-hitters", "mergeable"),
)
def count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream, read back against exact
    truth for the top-10 tokens (Cormode & Muthukrishnan 2005). The
    d x w counter grid is a plain (row, bucket) aggregate — mergeable
    by addition across shards/days, the 100 TB sketch pattern — and
    the md5-prefix bucket hashing (the engine's portable-hash
    convention) makes every counter and estimate DuckDB-reproducible:
    an oracle-checked sketch, not the usual rows-only check
    (operators.textstats.count_min_estimates)."""
    from .operators.textstats import count_min_estimates

    documents = load_table(spark, sf_dir, "documents")
    return count_min_estimates(documents, "text", "doc_id")


@query(
    "ivfpq_residual_topk",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, ve AS cv
      FROM v, st WHERE vec_id % st.s = 0
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(ve, ve) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(ve, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), res AS (
      SELECT v.vec_id, a.centroid_id,
             [round(v.ve[i] - c.cv[i], 6) FOR i IN range(1, 65)] AS rv
      FROM v JOIN assigned a USING (vec_id) JOIN c USING (centroid_id)
    ), sp AS (
      SELECT j FROM range(0, 4) AS t(j)
    ), cb AS (
      SELECT sp.j AS subspace, vec_id // st.s AS code_id,
             rv[sp.j*16+1 : sp.j*16+16] AS cbv
      FROM res, sp, st WHERE vec_id % st.s = 0
    ), sv AS (
      SELECT vec_id, centroid_id, sp.j AS subspace,
             rv[sp.j*16+1 : sp.j*16+16] AS s
      FROM res, sp
    ), enc AS (
      SELECT vec_id, centroid_id, subspace, code_id AS code FROM (
        SELECT sv.vec_id, sv.centroid_id, sv.subspace, cb.code_id,
               ROW_NUMBER() OVER (
                 PARTITION BY sv.vec_id, sv.subspace
                 ORDER BY round(list_dot_product(sv.s, sv.s)
                                + list_dot_product(cb.cbv, cb.cbv)
                                - 2 * list_dot_product(sv.s, cb.cbv), 6),
                          cb.code_id
               ) AS rn
        FROM sv JOIN cb ON sv.subspace = cb.subspace
      ) WHERE rn = 1
    ), lut AS (
      SELECT sv.vec_id AS query_id, sv.centroid_id AS qcell, sv.subspace,
             cb.code_id,
             round(list_dot_product(sv.s, sv.s) + list_dot_product(cb.cbv, cb.cbv)
                   - 2 * list_dot_product(sv.s, cb.cbv), 6) AS d
      FROM sv JOIN cb ON sv.subspace = cb.subspace
      WHERE sv.vec_id IN (7, 123, 321)
    ), approx AS (
      SELECT lut.query_id, enc.vec_id AS neighbor_id,
             CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) AS approx_dist
      FROM enc JOIN lut
        ON enc.subspace = lut.subspace AND enc.code = lut.code_id
       AND enc.centroid_id = lut.qcell
      WHERE enc.vec_id <> lut.query_id
      GROUP BY lut.query_id, enc.vec_id
    )
    SELECT query_id, neighbor_id, approx_dist, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_dist, neighbor_id
      ) AS rank FROM approx
    ) WHERE rank <= 3
    """,
    tags=("similarity-pq", "similarity-ivf", "ivfpq", "residual"),
)
def ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with residual encoding (Jegou et al. 2011 Sec IV) — the
    composition production ANN indexes (FAISS IVFPQ) ship: coarse IVF
    cells + PQ codes of the residual v - c(v), searched cell-local
    with a per-query residual LUT. Deterministic stride
    centroids/codebooks keep the full composition oracle-checked
    (operators.similarity.ivfpq_residual_topk)."""
    from .operators.similarity import ivfpq_residual_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    return ivfpq_residual_topk(
        embeddings, query_ids=(7, 123, 321), k=3, arrow=oracle_arrow()
    )


@query(
    "dedup_cluster_star",
    oracle="""
    WITH RECURSIVE edges AS (
      WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
      ), sh AS (
        SELECT doc_id, lang,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              FOR i IN range(1, greatest(len(w) - 1, 1))]) AS shingles
        FROM t
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8
    ), sym AS (
      SELECT doc_a AS a, doc_b AS b FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ), reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS doc_id,
           least(a, min(b)) AS cluster_id,
           CAST(a = least(a, min(b)) AS INT) AS is_canonical
    FROM reach GROUP BY a
    """,
    tags=("dedup-clusters", "iterative", "star-contraction"),
)
def dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same duplicate-cluster assignment as
    ``dedup_cluster_assignment`` computed by the alternating
    large-star/small-star contraction (Kiveris et al. 2014) instead of
    min-label propagation — O(log^2 n) rounds independent of graph
    diameter, the algorithm to reach for when the duplicate graph has
    long chains (operators.graph.connected_components_star). Identical
    output contract, so the SAME recursive-CTE oracle verifies both
    implementations."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import connected_components_star

    documents = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        documents, "text", "doc_id", block_cols=["lang"], n=3, threshold=0.8
    )
    cc = connected_components_star(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
    )


def _jl_sign_matrix(k: int = 8, dim: int = 64):
    """Deterministic Achlioptas ±1/√k projection matrix: the sign of
    entry (i, j) comes from the md5 parity of ``jl:i:j`` — the
    engine's portable-hash convention, so the SQL oracle rebuilds the
    IDENTICAL matrix and the projection is hash-exact (a seeded RNG
    would be library-specific)."""
    import hashlib
    import math

    inv = 1.0 / math.sqrt(float(k))
    return [
        [
            (inv if int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
             else -inv)
            for j in range(dim)
        ]
        for i in range(k)
    ]


@query(
    "jl_project_embeddings",
    oracle="""
    WITH ks AS (
      SELECT unnest(range(0, 8)) AS i
    ), mat AS (
      SELECT i,
             [CASE WHEN CAST('0x' || substr(md5('jl:' || i || ':' || j), 1, 1)
                        AS INT) % 2 = 0
                   THEN 1.0 ELSE -1.0 END / sqrt(8.0)
              FOR j IN range(0, 64)] AS m
      FROM ks
    )
    SELECT e.vec_id, CAST(mat.i AS INT) AS comp,
           round(list_dot_product(e.embedding::DOUBLE[], mat.m), 6) AS val
    FROM embeddings e, mat
    """,
    tags=("llm", "projection", "johnson-lindenstrauss", "embeddings"),
)
def jl_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 8 dims with
    Achlioptas +-1/sqrt(k) entries — the cheap distance-preserving
    reduction upstream of ANN/clustering when a trained PCA is
    overkill. The sign matrix derives from md5 parity (portable-hash
    convention), so unlike a seeded-RNG projection the whole operator
    is oracle-checked: DuckDB rebuilds the identical matrix and every
    projected coordinate hash-matches. Plan: the matrix enters as one
    parsed SQL literal, each coordinate is a sequential-fold dot, no
    shuffle, no Python (operators.similarity.pca_project reused as the
    literal-matrix projector)."""
    from .operators.similarity import pca_project

    embeddings = load_table(spark, sf_dir, "embeddings")
    projected = pca_project(
        embeddings, _jl_sign_matrix(), "vec_id", "embedding", out_col="_p"
    )
    return projected.select(
        "vec_id", F.posexplode("_p").alias("comp", "val")
    )


@query(
    "inverted_index_postings",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), postings AS (
      SELECT token,
             COUNT(*)::BIGINT AS doc_freq,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS posting_list
      FROM tok WHERE token <> '' GROUP BY token
    )
    SELECT token, doc_freq, posting_list
    FROM postings
    WHERE doc_freq >= 20
    """,
    tags=("ir", "inverted-index", "text-corpus"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token → sorted posting list of the
    documents containing it (the retrieval-side twin of tf-idf; BM25
    serving reads exactly this structure). One explode + distinct +
    token-keyed aggregate — the shuffle carries (token, doc_id) pairs
    with map-side dedup, never text. Posting lists serialize as
    ordered CSV strings so the oracle compare is format-stable;
    doc_freq >= 20 keeps the output the index's dense core (the long
    tail is the same plan, more rows)."""
    documents = load_table(spark, sf_dir, "documents")
    tok = (
        documents.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("doc_id"))), ","
            ).alias("posting_list"),
        )
        .where(F.col("doc_freq") >= 20)
    )


@query(
    "bm25_rank_documents",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), tokf AS (
      SELECT doc_id, token FROM tok WHERE token <> ''
    ), dl AS (
      SELECT doc_id, COUNT(*)::BIGINT AS dlen FROM tokf GROUP BY doc_id
    ), corpus AS (
      SELECT COUNT(*)::BIGINT AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, token, COUNT(*)::BIGINT AS tf
      FROM tokf WHERE token IN ('spark', 'query', 'join')
      GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*)::BIGINT AS dfreq FROM tf GROUP BY token
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             round(
               ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dlen / corpus.avgdl)),
               6) AS term_score
      FROM tf
      JOIN df USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN corpus
    ), totals AS (
      SELECT doc_id,
             CAST(SUM(CAST(term_score AS DECIMAL(28,6))) AS DOUBLE) AS bm25,
             COUNT(*)::BIGINT AS n_terms_hit
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, bm25, n_terms_hit, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM totals
    ) WHERE rank <= 10
    """,
    tags=("ir", "bm25", "ranking", "text-corpus"),
)
def bm25_rank_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (Robertson-Sparck Jones; k1=1.2, b=0.75) of the
    corpus against a fixed 3-term query — the lexical-retrieval
    scoring the inverted index serves. Per-term scores are
    grid-rounded then decimal-summed so the total is
    addition-order-independent; idf = ln(1 + (N-df+0.5)/(df+0.5))
    (the non-negative Lucene form). One token explode, query-term
    filter pushed into the scan side, corpus stats broadcast, final
    top-10 fully tie-broken."""
    from pyspark.sql import Window as W

    terms = ("spark", "query", "join")
    documents = load_table(spark, sf_dir, "documents")
    tokf = (
        documents.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .where(F.col("token") != "")
    ).persist()
    dl = tokf.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tokf.where(F.col("token").isin(list(terms)))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
    )
    term_score = F.round(
        idf
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + 1.2 * (1 - 0.75 + 0.75 * F.col("dlen") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", term_score.alias("term_score"))
    )
    totals = scored.groupBy("doc_id").agg(
        F.sum(F.col("term_score").cast("decimal(28,6)"))
        .cast("double")
        .alias("bm25"),
        F.count("*").alias("n_terms_hit"),
    )
    # Top-10 via sort+limit (TakeOrderedAndProject: per-partition
    # partial top-k, merged) — matching docs are corpus-sized, so the
    # previous partition-less rank window funneled them through one
    # task (r11). The rank window now runs over 10 rows.
    top = totals.orderBy(F.col("bm25").desc(), "doc_id").limit(10)
    w = W.partitionBy().orderBy(F.col("bm25").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w))


@query(
    "centroid_classify_embeddings",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ve FROM embeddings
    ), x AS (
      SELECT vec_id, label, r.i AS i, round(ve[r.i], 6) AS val
      FROM v, (SELECT unnest(range(1, 65)) AS i) r
    ), cent AS (
      SELECT label AS clabel, i,
             CAST(SUM(CAST(val AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS cv
      FROM x GROUP BY label, i
    ), cvec AS (
      SELECT clabel, list(cv ORDER BY i) AS c FROM cent GROUP BY clabel
    ), assigned AS (
      SELECT vec_id, label, clabel FROM (
        SELECT v.vec_id, v.label, cvec.clabel,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(ve, ve) + list_dot_product(c, c)
                                - 2 * list_dot_product(ve, c), 6),
                          cvec.clabel
               ) AS rn
        FROM v, cvec
      ) WHERE rn = 1
    )
    SELECT label AS true_label, clabel AS predicted_label,
           COUNT(*)::BIGINT AS n
    FROM assigned GROUP BY label, clabel
    """,
    tags=("llm", "embeddings", "classify", "centroid", "eval"),
)
def centroid_classify_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean classification confusion matrix — the
    standard embedding-quality probe (a good embedding space separates
    labels under the cheapest possible classifier). Per-label
    centroids are decimal-exact elementwise means kept as UNROUNDED
    deterministic doubles (a round-of-mean invites the small-
    denominator half-way rounding case seasonal decomposition hit);
    assignment is the broadcast-centroid rounded-distance argmin with
    the ivf_assign tie contract; output is the label x label count
    matrix. One explode + grouped mean, one scan for assignment — no
    vector ever shuffles."""
    from .operators.similarity import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("_v")
    )
    x = v.select(
        "label", F.posexplode(F.transform("_v", lambda e: F.round(e, 6))).alias(
            "i", "val"
        )
    )
    cent = (
        x.groupBy("label", "i")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy(F.col("label").alias("clabel"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "cv"))).alias("_pv"))
        .select(
            "clabel", F.transform("_pv", lambda s: s["cv"]).alias("_c")
        )
    )
    sq = (
        _dot(F.col("_v"), F.col("_v"))
        + _dot(F.col("_c"), F.col("_c"))
        - 2 * _dot(F.col("_v"), F.col("_c"))
    )
    scored = v.join(F.broadcast(cent)).select(
        "vec_id", "label", "clabel", F.round(sq, 6).alias("_d")
    )
    assigned = scored.groupBy("vec_id", "label").agg(
        F.min_by("clabel", F.struct("_d", "clabel")).alias("predicted_label")
    )
    return assigned.groupBy(
        F.col("label").alias("true_label"), "predicted_label"
    ).agg(F.count("*").alias("n"))


@query(
    "ann_recall_eval",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), cells AS (
      SELECT v.vec_id, a.centroid_id, v.vv FROM v JOIN assigned a USING (vec_id)
    ), approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.vv, x.vv)
                                / (sqrt(list_dot_product(q.vv, q.vv))
                                   * sqrt(list_dot_product(x.vv, x.vv))), 6) DESC,
                          x.vec_id
               ) AS rn
        FROM cells q JOIN cells x
          ON q.centroid_id = x.centroid_id AND x.vec_id <> q.vec_id
        WHERE q.vec_id < 20
      ) WHERE rn <= 5
    ), exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.vv, e.vv)
                                / (sqrt(list_dot_product(q.vv, q.vv))
                                   * sqrt(list_dot_product(e.vv, e.vv))), 6) DESC,
                          e.vec_id
               ) AS rn
        FROM v q JOIN v e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < 20
      ) WHERE rn <= 5
    ), hits AS (
      SELECT e.query_id, COUNT(*) AS n_hits
      FROM exact e JOIN approx a USING (query_id, neighbor_id)
      GROUP BY e.query_id
    ), base AS (
      SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id
    )
    SELECT b.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           b.n_exact,
           round(COALESCE(h.n_hits, 0)::DOUBLE / b.n_exact, 4) AS recall_at_k
    FROM base b LEFT JOIN hits h USING (query_id)
    """,
    tags=("similarity-eval",),
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: per-query recall@5 of the IVF index
    (nprobe=1) against brute-force exact cosine ground truth — the
    eval harness an embedding deployment runs before trading recall
    for cost. Both legs are existing operators; the comparison is one
    equi-join + two tiny grouped counts, so the eval itself adds no
    scale hazard on top of the search legs (ground truth on a sampled
    query set, the standard recall protocol at corpus scale)."""
    from .operators.similarity import cosine_topk, ivf_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    queries = embeddings.where(F.col("vec_id") < 20)
    exact = cosine_topk(queries, embeddings, k=5).select("query_id", "neighbor_id")
    approx = ivf_topk(
        embeddings, query_ids=range(20), k=5, arrow=oracle_arrow()
    ).select("query_id", "neighbor_id")
    # Single pass over the exact leg: left-join the approx hit marker,
    # then one grouped count/count(marker) — the brute-force ground
    # truth is the expensive side, so it must not be evaluated twice.
    marked = exact.join(
        approx.withColumn("_hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
    )
    return (
        marked.groupBy("query_id")
        .agg(
            F.count("_hit").alias("n_hits"),
            F.count(F.lit(1)).alias("n_exact"),
        )
        .select(
            "query_id",
            "n_hits",
            "n_exact",
            F.round(F.col("n_hits") / F.col("n_exact"), 4).alias("recall_at_k"),
        )
    )


@query(
    "cluster_top_terms_ctfidf",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), toks AS (
      SELECT a.centroid_id AS cluster_id,
             unnest(string_split(d.text, ' ')) AS token
      FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
    ), tf AS (
      SELECT cluster_id, token, COUNT(*) AS tf FROM toks
      GROUP BY cluster_id, token
    ), ct AS (
      SELECT cluster_id, COUNT(*) AS c_tokens FROM toks GROUP BY cluster_id
    ), tt AS (
      SELECT token, COUNT(*) AS t_total FROM toks GROUP BY token
    ), tot AS (
      SELECT COUNT(*) AS all_tokens,
             COUNT(DISTINCT cluster_id) AS n_clusters
      FROM toks
    ), scored AS (
      SELECT tf.cluster_id, tf.token,
             round((tf.tf / ct.c_tokens)
                   * ln(1.0 + (tot.all_tokens / tot.n_clusters) / tt.t_total),
                   6) AS ctfidf
      FROM tf
      JOIN ct USING (cluster_id)
      JOIN tt USING (token)
      CROSS JOIN tot
    )
    SELECT cluster_id, token, ctfidf, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cluster_id ORDER BY ctfidf DESC, token
      ) AS rank FROM scored
    ) WHERE rank <= 3
    """,
    tags=("clustering", "text-analysis"),
)
def cluster_top_terms_ctfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labeling via class-based TF-IDF (the BERTopic c-TF-IDF
    formulation, Grootendorst 2022): cluster documents by their
    embedding's IVF cell, then surface each cluster's 3 most
    distinctive tokens, score = (tf_t,c / tokens_c) ·
    ln(1 + (avg cluster size) / tf_t). All inputs are integer counts,
    so the single ln/divide chain is IEEE-deterministic and the
    approximate-clustering + labeling pipeline stays fully
    oracle-checked. Scale: token stats shuffle on (cluster, token)
    keys with map-side combine; the global totals frame is one row,
    broadcast; the rank window partitions by cluster."""
    from .operators.similarity import adaptive_stride, ivf_assign

    embeddings = load_table(spark, sf_dir, "embeddings")
    documents = load_table(spark, sf_dir, "documents")
    stride = adaptive_stride(embeddings)
    centroids = embeddings.where((F.col("vec_id") % stride) == 0).select(
        (F.col("vec_id") / stride).cast("long").alias("centroid_id"),
        "embedding",
    )
    assigned = ivf_assign(embeddings, centroids, arrow=oracle_arrow())
    toks = (
        documents.join(assigned, documents.doc_id == assigned.vec_id)
        .select(
            F.col("centroid_id").alias("cluster_id"),
            F.explode(F.split("text", " ")).alias("token"),
        )
    )
    # One explode + one (cluster, token) shuffle; every other statistic
    # derives from the tf aggregate (vocabulary-sized), so the exploded
    # token stream is scanned once and the repeated tf subtree hits
    # Spark's ReusedExchange. Identical integer counts → same oracle.
    tf = toks.groupBy("cluster_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    ct = tf.groupBy("cluster_id").agg(F.sum("tf").alias("c_tokens"))
    tt = tf.groupBy("token").agg(F.sum("tf").alias("t_total"))
    tot = ct.agg(
        F.sum("c_tokens").alias("all_tokens"),
        F.count(F.lit(1)).alias("n_clusters"),
    )
    scored = (
        tf.join(ct, "cluster_id")
        .join(tt, "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_id",
            "token",
            F.round(
                (F.col("tf") / F.col("c_tokens"))
                * F.log(
                    F.lit(1.0)
                    + (F.col("all_tokens") / F.col("n_clusters"))
                    / F.col("t_total")
                ),
                6,
            ).alias("ctfidf"),
        )
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("cluster_id").orderBy(F.col("ctfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
    )


def _logreg_oracle(nf: int = 4, lr: float = 2.0, iters: int = 5) -> str:
    """Unrolled batch-GD oracle: one (gradient, weight) CTE pair per
    iteration, generated so every iteration's text is structurally
    identical to the Spark loop in ``operators.logreg.logreg_fit``
    (explicit left-associated z-chain, round(avg, 6) gradients,
    round(w - lr*g, 6) updates)."""
    xs = [f"x{j + 1}" for j in range(nf)]
    zexpr = "w0 + " + " + ".join(f"w{j + 1}*{x}" for j, x in enumerate(xs))
    sig = f"1.0/(1.0+exp(-({zexpr})))"
    feat_cols = ",\n             ".join(
        f"list_extract(embedding::DOUBLE[], {i + 1}) AS f{i}" for i in range(nf)
    )
    stat_cols = ", ".join(
        f"round(avg(f{i}), 6) AS m{i}, round(stddev_samp(f{i}), 6) AS s{i}"
        for i in range(nf)
    )
    z_cols = ",\n             ".join(
        f"round((f{i} - m{i})/s{i}, 4) AS x{i + 1}" for i in range(nf)
    )
    parts = [
        f"""WITH e AS (
      SELECT vec_id, CAST(label = 3 AS INT) AS label_bin,
             {feat_cols}
      FROM embeddings
    ), s AS (
      SELECT {stat_cols} FROM e
    ), z AS (
      SELECT vec_id, label_bin, CAST(label_bin AS DOUBLE) AS y,
             {z_cols}
      FROM e CROSS JOIN s
    ), w0_ AS (
      SELECT {', '.join(f'0.0 AS w{j}' for j in range(nf + 1))}
    )"""
    ]
    for it in range(1, iters + 1):
        grads = [f"round(avg(({sig} - y)), 6) AS g0"] + [
            f"round(avg(({sig} - y) * {x}), 6) AS g{j + 1}"
            for j, x in enumerate(xs)
        ]
        ups = ", ".join(
            f"round(w{j} - {lr!r}*g{j}, 6) AS w{j}" for j in range(nf + 1)
        )
        parts.append(
            f", g{it}_ AS (\n      SELECT {', '.join(grads)} FROM z CROSS JOIN w{it - 1}_\n    )"
            f", w{it}_ AS (\n      SELECT {ups} FROM w{it - 1}_ CROSS JOIN g{it}_\n    )"
        )
    parts.append(
        f"""
    SELECT vec_id, label_bin, round({sig}, 6) AS p,
           CAST(round({sig}, 6) >= 0.5 AS INT) AS predicted
    FROM z CROSS JOIN w{iters}_"""
    )
    return "".join(parts)


@query(
    "logreg_classifier_train",
    oracle=_logreg_oracle(nf=4, lr=2.0, iters=5),
    tags=("model-training", "classifier"),
)
def logreg_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised in-engine model training: batch-gradient-descent
    logistic regression (one-vs-rest on embedding class 3) over
    z-score-standardized embedding coordinates — the learned
    quality-filter stage of a curation pipeline, trained and scored
    without leaving the DataFrame layer. The whole run (feature
    standardization stats, 5 GD iterations, final per-row scores) is
    bit-exactly reproduced by an unrolled CTE oracle, the same
    determinism contract as the k-means/PQ trainers. Scale: one
    partial-avg aggregate scan per iteration, weights driver-side
    (the MLlib GD topology); scoring is a stateless projection."""
    from .operators.logreg import logreg_fit, logreg_score, standardize

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(base, [f"f{i}" for i in range(4)])
    weights = logreg_fit(feats, zcols, "label_bin", lr=2.0, iters=5)
    return logreg_score(feats, zcols, weights).select(
        "vec_id", "label_bin", "p", "predicted"
    )


def _bpe_oracle(n_merges: int = 3) -> str:
    """Unrolled BPE-training oracle: per merge round, a (pair-count →
    deterministic argmax → left-to-right replace) CTE triple mirroring
    ``operators.textstats.bpe_train``."""
    parts = [
        r"""WITH w0 AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS freq,
             trim(regexp_replace(token, '(.)', '\1 ', 'g')) AS s
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY token
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f""", p{k} AS (
      SELECT pr, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT unnest([a[i] || ' ' || a[i+1] FOR i IN range(1, len(a))]) AS pr,
               freq
        FROM (SELECT string_split(s, ' ') AS a, freq FROM w{k - 1})
      ) GROUP BY pr
    ), b{k} AS (
      SELECT pr FROM p{k} ORDER BY cnt DESC, pr LIMIT 1
    ), w{k} AS (
      SELECT token, freq,
             trim(replace(' ' || s || ' ',
                          ' ' || (SELECT pr FROM b{k}) || ' ',
                          ' ' || replace((SELECT pr FROM b{k}), ' ', '') || ' ')) AS s
      FROM w{k - 1}
    )"""
        )
    parts.append(
        f"\n    SELECT token, freq, s AS segmented FROM w{n_merges}"
    )
    return "".join(parts)


@query(
    "bpe_train_merges",
    oracle=_bpe_oracle(3),
    tags=("tokenizer-training",),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction in-engine (Gage 1994 / Sennrich 2016):
    learn 3 merges over the corpus word-frequency table and return the
    segmented vocabulary — the training counterpart of
    ``subword_tokenize_greedy``. Merge application is single-pass
    left-to-right non-overlapping (Gage's original), which both
    engines' ``replace`` implement identically, so the whole
    data-dependent training trajectory (argmax per round: count desc,
    pair asc) is hash-checked against an unrolled CTE oracle."""
    from .operators.textstats import bpe_train

    documents = load_table(spark, sf_dir, "documents")
    _, words = bpe_train(documents, "text", n_merges=3)
    return words.select("token", "freq", F.col("segmented"))


@query(
    "minhash_md5_lsh_near_dup",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            FOR i IN range(1, greatest(len(w) - 1, 1))]) AS shingles
      FROM t
    ), shf AS (
      SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0
    ), sig AS (
      SELECT doc_id,
             [list_min([CAST(('0x' || substr(md5(CAST(p // 2 AS VARCHAR) || '|' || s),
                                      CASE WHEN p % 2 = 0 THEN 1 ELSE 17 END, 15))
                             AS BIGINT)
                        FOR s IN shingles])
              FOR p IN range(0, 16)] AS sg
      FROM shf
    ), bandrows AS (
      SELECT doc_id, b.b AS band,
             md5(array_to_string(sg[b.b*4 + 1 : b.b*4 + 4], ',')) AS bkey
      FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b
    ), salted AS (
      SELECT doc_id, band, bkey,
             CAST('0x' || substr(md5(CAST(band AS VARCHAR) || ':' || bkey
                                     || ':' || CAST(doc_id AS VARCHAR)),
                                 1, 8) AS BIGINT)
               % ((COUNT(*) OVER (PARTITION BY band, bkey) + 63) // 64) AS sub
      FROM bandrows
    ), cands AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM salted x JOIN salted y
        ON x.band = y.band AND x.bkey = y.bkey AND x.sub = y.sub
           AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 4)
             AS jaccard
    FROM cands
    JOIN shf a ON a.doc_id = doc_a
    JOIN shf b ON b.doc_id = doc_b
    WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8
    """,
    tags=("dedup-minhash", "oracle-twin"),
)
def minhash_md5_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with the engine-independent md5
    hash family (16 perms × 4 bands, exact-Jaccard verification at
    0.8): unlike the xxhash64 throughput path (rows-only checked), the
    full approximate pipeline here — signatures, band buckets, candidate
    generation, verification — hash-matches a DuckDB oracle, closing
    the auditability gap for the flagship near-dup operator (same md5
    twin pattern as the HLL and count-min sketches). r12: band buckets
    larger than 64 members are salt-split into ceil(m/64) md5-decided
    subgroups before the self-join (VERDICT r11 #2 — hot buckets grew
    quadratically with the corpus, 7.2×/decade at sf10); the oracle
    replays the split, and the recall trade is documented at
    ``operators.dedup.band_bucket_candidates``. r13: the subgroup salt
    is keyed by (band, bkey, id) rather than id alone, so a pair's
    survival draws are independent across its hot buckets (ADVICE
    r12)."""
    from .operators.dedup import minhash_md5_lsh_pairs

    documents = load_table(spark, sf_dir, "documents")
    return minhash_md5_lsh_pairs(
        documents, "text", "doc_id", num_perm=16, bands=4, threshold=0.8,
        bucket_cap=64,
    )


def _simhash_md5_oracle(bits: int = 60, n_chunks: int = 4, max_hamming: int = 3) -> str:
    """Generated SimHash oracle: 60 conditional bit-sums per document,
    signature assembly, pigeonhole chunk join, bit_count verification —
    the same stages as ``operators.dedup.simhash_md5_near_pairs``."""
    chunk_bits = bits // n_chunks
    mask = (1 << chunk_bits) - 1
    bsum = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN 1::BIGINT << {b} ELSE 0 END)" for b in range(bits)
    )
    chunks = ", ".join(
        f"((sig >> {c * chunk_bits}) & {mask})" for c in range(n_chunks)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    ), bs AS (
      SELECT doc_id,
             {bsum}
      FROM toks GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, CAST({sig} AS BIGINT) AS sig FROM bs
    ), chunks AS (
      SELECT doc_id, sig, c.c AS chunk,
             [{chunks}][c.c + 1] AS cval
      FROM sigs CROSS JOIN (SELECT unnest(range(0, {n_chunks})) AS c) c
    ), cands AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
      FROM chunks a JOIN chunks b
        ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM cands
    WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


@query(
    "simhash_md5_near_dup",
    oracle=_simhash_md5_oracle(),
    tags=("dedup-simhash", "oracle-twin"),
)
def simhash_md5_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (Hamming ≤ 3 over a 60-bit md5
    signature, pigeonhole 4×15-bit chunk blocking): the
    engine-independent twin of ``simhash_documents`` — signature
    construction, chunk candidate generation, and xor-popcount
    verification all hash-match the SQL oracle."""
    from .operators.dedup import simhash_md5_near_pairs

    documents = load_table(spark, sf_dir, "documents")
    return simhash_md5_near_pairs(documents, "text", "doc_id", max_hamming=3)


@query(
    "embedding_near_dup_lsh_md5",
    oracle="""
    WITH planes AS (
      SELECT t.t, p.p,
             [(CAST(('0x' || substr(md5(t.t || '_' || p.p || '_' || j), 1, 8))
                    AS BIGINT) % 2000001 - 1000000) / 1000000.0
              FOR j IN range(0, 64)] AS pv
      FROM (SELECT unnest(range(0, 4)) AS t) t
      CROSS JOIN (SELECT unnest(range(0, 8)) AS p) p
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), sigs AS (
      SELECT v.vec_id, pl.t AS tbl,
             CAST(SUM(CASE WHEN round(list_dot_product(v.vv, pl.pv), 6) > 0
                           THEN 1::BIGINT << pl.p ELSE 0 END) AS BIGINT) AS sig
      FROM v CROSS JOIN planes pl
      GROUP BY v.vec_id, pl.t
    ), cands AS (
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM sigs x JOIN sigs y
        ON x.tbl = y.tbl AND x.sig = y.sig AND x.vec_id < y.vec_id
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b,
           round(list_dot_product(a.vv, b.vv)
                 / (sqrt(list_dot_product(a.vv, a.vv))
                    * sqrt(list_dot_product(b.vv, b.vv))), 6) AS score
    FROM cands
    JOIN v a ON a.vec_id = vec_a
    JOIN v b ON b.vec_id = vec_b
    WHERE round(list_dot_product(a.vv, b.vv)
                / (sqrt(list_dot_product(a.vv, a.vv))
                   * sqrt(list_dot_product(b.vv, b.vv))), 6) >= 0.4
    """,
    tags=("dedup-embedding", "similarity-lsh", "oracle-twin"),
)
def embedding_near_dup_lsh_md5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH embedding near-dup with md5-derived planes
    (4 tables × 8 sign bits, exact-cosine verification at 0.4): the
    oracle-checked twin of the random-plane LSH path — the plane
    matrix itself, the 1e-6-grid sign bits, the bucket candidates and
    the verification scores all hash-match SQL."""
    from .operators.similarity import embedding_near_dup_lsh_md5

    embeddings = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_lsh_md5(embeddings, threshold=0.4)


@query(
    "dedup_best_representative",
    oracle="""
    WITH RECURSIVE edges AS (
      WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
      ), sh AS (
        SELECT doc_id, lang,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              FOR i IN range(1, greatest(len(w) - 1, 1))]) AS shingles
        FROM t
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.8
    ), sym AS (
      SELECT doc_a AS a, doc_b AS b FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ), reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), memb AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
    ), scored AS (
      SELECT m.cluster_id, m.doc_id, length(d.text) AS n_chars
      FROM memb m JOIN documents d USING (doc_id)
    )
    SELECT cluster_id, n_members, doc_id AS kept_doc_id, n_chars AS kept_n_chars
    FROM (
      SELECT cluster_id, doc_id, n_chars,
             CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
             ROW_NUMBER() OVER (
               PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
             ) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
    tags=("dedup-clusters", "representative-selection"),
)
def dedup_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection over near-duplicate clusters: instead
    of the min-id canonical member, keep the LONGEST document per
    cluster (ties: min id) — the curation heuristic production dedup
    actually ships (the near-dup copies differ, so 'best copy' is a
    real choice). One grouped max_by over the cluster assignment; no
    window over the corpus."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.graph import dedup_clusters

    documents = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        documents, "text", "doc_id", block_cols=["lang"], n=3, threshold=0.8
    )
    clusters = dedup_clusters(pairs)
    qual = documents.select("doc_id", F.length("text").alias("n_chars"))
    joined = clusters.join(qual, "doc_id")
    return joined.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_ni"))
        ).alias("kept_doc_id"),
        F.max("n_chars").alias("kept_n_chars"),
    ).select("cluster_id", "n_members", "kept_doc_id", "kept_n_chars")


@query(
    "mlm_mask_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), m AS (
      SELECT doc_id, w,
             [CAST(('0x' || substr(md5(doc_id || '_' || (i - 1)), 1, 8)) AS BIGINT)
              % 100 < 15
              FOR i IN range(1, len(w) + 1)] AS msk
      FROM t
    )
    SELECT doc_id,
           array_to_string(
             [CASE WHEN msk[i] THEN '[MASK]' ELSE w[i] END
              FOR i IN range(1, len(w) + 1)], ' ') AS masked_text,
           COALESCE(array_to_string(
             list_filter(
               [CASE WHEN msk[i] THEN (i - 1) || ':' || w[i] ELSE NULL END
                FOR i IN range(1, len(w) + 1)],
               x -> x IS NOT NULL), ' '), '') AS targets,
           CAST(len(list_filter(msk, x -> x)) AS INT) AS n_masked
    FROM m
    """,
    tags=("pretraining-objective",),
)
def mlm_mask_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-LM objective data prep (BERT-style): mask ~15% of tokens
    chosen by a position-keyed md5 hash (fully deterministic →
    reproducible across reruns AND engines — no RNG state to ship),
    emitting the masked text plus `pos:token` recovery targets.
    Row-local array transforms only: one scan, no shuffle, no Python —
    the shape that holds at any corpus size."""
    documents = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    d = documents.select("doc_id", w.alias("w"))
    mask_of = lambda i: (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_"), i.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
        < 15
    )
    m = d.select(
        "doc_id",
        "w",
        F.transform("w", lambda tok, i: mask_of(i)).alias("msk"),
    )
    tok_i = lambda arr, i: F.element_at(arr, i + 1)
    idx = F.sequence(F.lit(0), F.size("w") - 1)
    masked_text = F.array_join(
        F.transform(
            idx,
            lambda i: F.when(tok_i(F.col("msk"), i), F.lit("[MASK]")).otherwise(
                tok_i(F.col("w"), i)
            ),
        ),
        " ",
    )
    targets = F.array_join(
        F.filter(
            F.transform(
                idx,
                lambda i: F.when(
                    tok_i(F.col("msk"), i),
                    F.concat(i.cast("string"), F.lit(":"), tok_i(F.col("w"), i)),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    return m.select(
        "doc_id",
        masked_text.alias("masked_text"),
        targets.alias("targets"),
        F.size(F.filter("msk", lambda x: x)).alias("n_masked"),
    )


@query(
    "span_corruption_t5",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sp AS (
      SELECT doc_id, w,
             CAST(ceil(len(w) / 3.0) AS INT) AS nspans
      FROM t
    ), m AS (
      SELECT doc_id, w, nspans,
             [CAST(('0x' || substr(md5(doc_id || '#' || s), 1, 8)) AS BIGINT)
              % 100 < 15
              FOR s IN range(0, nspans)] AS corr
      FROM sp
    ), pre AS (
      SELECT doc_id, w, nspans, corr,
             [len(list_filter(corr[1:s], x -> x)) FOR s IN range(0, nspans)] AS sent,
             len(list_filter(corr, x -> x)) AS total
      FROM m
    )
    SELECT doc_id,
           array_to_string(
             list_filter(
               [CASE WHEN NOT corr[(i - 1) // 3 + 1] THEN w[i]
                     WHEN (i - 1) % 3 = 0
                       THEN '<extra_id_' || sent[(i - 1) // 3 + 1] || '>'
                     ELSE NULL END
                FOR i IN range(1, len(w) + 1)],
               x -> x IS NOT NULL), ' ') AS input_text,
           CASE WHEN total = 0 THEN '<extra_id_0>'
                ELSE array_to_string(
                       list_filter(
                         [CASE WHEN corr[s + 1]
                               THEN '<extra_id_' || sent[s + 1] || '> '
                                    || array_to_string(w[3*s + 1 : 3*s + 3], ' ')
                               ELSE NULL END
                          FOR s IN range(0, nspans)],
                         x -> x IS NOT NULL), ' ')
                     || ' <extra_id_' || total || '>'
           END AS target_text,
           CAST(total AS INT) AS n_corrupted
    FROM pre
    """,
    tags=("pretraining-objective",),
)
def span_corruption_t5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4): 3-token
    spans are dropped with ~15% probability chosen by a span-keyed md5
    hash, replaced by ordered `<extra_id_k>` sentinels in the input;
    the target interleaves each sentinel with its dropped tokens and
    ends with a terminal sentinel. Deterministic (reproducible across
    engines AND reruns) and entirely row-local array algebra — one
    scan, no shuffle, no Python."""
    documents = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    d = documents.select("doc_id", w.alias("w"))
    nspans = F.ceil(F.size("w") / F.lit(3.0)).cast("int")
    d = d.select("doc_id", "w", nspans.alias("nspans"))
    corr_of = lambda s: (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#"), s.cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
        < 15
    )
    d = d.select(
        "doc_id",
        "w",
        "nspans",
        F.transform(
            F.sequence(F.lit(0), F.col("nspans") - 1), lambda s: corr_of(s)
        ).alias("corr"),
    )
    d = d.select(
        "doc_id",
        "w",
        "nspans",
        "corr",
        F.transform(
            F.sequence(F.lit(0), F.col("nspans") - 1),
            lambda s: F.size(F.filter(F.slice("corr", 1, s), lambda x: x)),
        ).alias("sent"),
        F.size(F.filter("corr", lambda x: x)).alias("total"),
    )
    at = lambda arr, i: F.element_at(F.col(arr), i + 1)
    idx = F.sequence(F.lit(0), F.size("w") - 1)
    input_text = F.array_join(
        F.filter(
            F.transform(
                idx,
                lambda i: F.when(
                    ~at("corr", (i / 3).cast("int")), at("w", i)
                ).when(
                    i % 3 == 0,
                    F.concat(
                        F.lit("<extra_id_"),
                        at("sent", (i / 3).cast("int")).cast("string"),
                        F.lit(">"),
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    span_idx = F.sequence(F.lit(0), F.col("nspans") - 1)
    corrupted_spans = F.array_join(
        F.filter(
            F.transform(
                span_idx,
                lambda s: F.when(
                    at("corr", s),
                    F.concat(
                        F.lit("<extra_id_"),
                        at("sent", s).cast("string"),
                        F.lit("> "),
                        F.array_join(F.slice("w", s * 3 + 1, 3), " "),
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    target_text = F.when(
        F.col("total") == 0, F.lit("<extra_id_0>")
    ).otherwise(
        F.concat(
            corrupted_spans,
            F.lit(" <extra_id_"),
            F.col("total").cast("string"),
            F.lit(">"),
        )
    )
    return d.select(
        "doc_id",
        input_text.alias("input_text"),
        target_text.alias("target_text"),
        F.col("total").cast("int").alias("n_corrupted"),
    )


@query(
    "contrastive_negative_sample",
    oracle="""
    WITH anchors AS (
      SELECT doc_id AS anchor_id, lang AS anchor_lang
      FROM documents WHERE doc_id < 20
    ), cand AS (
      SELECT a.anchor_id, d.doc_id AS neg_id,
             md5(a.anchor_id || '~' || d.doc_id) AS rk
      FROM anchors a JOIN documents d
        ON d.lang <> a.anchor_lang
    )
    SELECT anchor_id, neg_id, rank FROM (
      SELECT anchor_id, neg_id,
             ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY rk, neg_id)
               AS rank
      FROM cand
    ) WHERE rank <= 4
    """,
    tags=("contrastive-sampling",),
)
def contrastive_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random negative sampling for contrastive training:
    per anchor, 4 negatives drawn from a different language, ordered by
    an (anchor, candidate)-keyed md5 — a seedless hash shuffle that is
    uniform, reproducible across engines/reruns, and collision-free
    via the id tie-break. Plan: broadcast the anchor set against the
    corpus (no corpus shuffle), rank window partitioned per anchor —
    the same shape as hard-negative mining with the model score
    replaced by the hash. Complements ``hard_negative_mining`` (random
    negatives for early training, hard negatives for curriculum)."""
    documents = load_table(spark, sf_dir, "documents")
    anchors = documents.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("anchor_id"), F.col("lang").alias("anchor_lang")
    )
    cand = documents.join(
        F.broadcast(anchors), F.col("lang") != F.col("anchor_lang")
    ).select(
        "anchor_id",
        F.col("doc_id").alias("neg_id"),
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("~"),
                F.col("doc_id").cast("string"),
            )
        ).alias("rk"),
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("anchor_id").orderBy("rk", "neg_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 4)
        .select("anchor_id", "neg_id", "rank")
    )


@query(
    "normalize_text_documents",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g')) AS norm_text,
           length(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g'))) AS norm_chars
    FROM documents
    """,
    tags=("text-normalization",),
)
def normalize_text_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pre-dedup curation stage):
    lowercase → strip non-alphanumerics → collapse whitespace → trim.
    Deliberately restricted to regex constructs whose semantics agree
    across Java and RE2-style engines (character classes and ' +'),
    so the normalization itself is oracle-checked; row-local, one
    scan, no shuffle."""
    documents = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return documents.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_chars")
    )


@query(
    "corpus_datacard",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, text,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), langs AS (
      SELECT COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources
      FROM t
    ), dups AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
      FROM t
    )
    SELECT d.n_docs,
           d.n_unique,
           round((d.n_docs - d.n_unique)::DOUBLE / d.n_docs, 4) AS dup_rate,
           (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM t) AS total_tokens,
           round((SELECT SUM(n_tokens) FROM t)::DOUBLE / d.n_docs, 4)
             AS mean_tokens_per_doc,
           l.n_langs,
           l.n_sources
    FROM dups d CROSS JOIN langs l
    """,
    tags=("corpus-stats",),
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datacard (the summary block of a dataset card):
    document/unique counts, exact-dup rate, token totals and means,
    language/source cardinalities — a single aggregate pass plus a
    distinct-hash count; the content hash (not the text) is what
    shuffles."""
    documents = load_table(spark, sf_dir, "documents")
    t = documents.select(
        "lang",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("h").cast("long").alias("n_unique"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    return agg.select(
        "n_docs",
        "n_unique",
        F.round(
            (F.col("n_docs") - F.col("n_unique")) / F.col("n_docs"), 4
        ).alias("dup_rate"),
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("n_docs"), 4).alias(
            "mean_tokens_per_doc"
        ),
        "n_langs",
        "n_sources",
    )


@query(
    "preference_pairs_by_quality",
    oracle="""
    WITH t AS (
      SELECT source, lang, doc_id, length(text) AS n_chars FROM documents
    ), r AS (
      SELECT source, lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source, lang ORDER BY n_chars DESC, doc_id
             ) AS rmax,
             ROW_NUMBER() OVER (
               PARTITION BY source, lang ORDER BY n_chars ASC, doc_id
             ) AS rmin,
             CAST(COUNT(*) OVER (PARTITION BY source, lang) AS BIGINT) AS n
      FROM t
    ), ch AS (
      SELECT source, lang, doc_id AS chosen_doc, n_chars AS c_chars, n
      FROM r WHERE rmax = 1 AND n >= 2
    ), rj AS (
      SELECT source, lang, doc_id AS rejected_doc, n_chars AS r_chars
      FROM r WHERE rmin = 1
    )
    SELECT ch.source, ch.lang, chosen_doc, rejected_doc,
           CAST(c_chars - r_chars AS BIGINT) AS margin, n AS group_size
    FROM ch JOIN rj USING (source, lang)
    """,
    tags=("preference-pairs", "alignment-data"),
)
def preference_pairs_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF reward-data shape):
    within each (source, lang) group, pair the best document against
    the worst by a quality signal (here length; any scored column
    drops in) with deterministic tie-breaks, emitting
    (chosen, rejected, margin). One grouped max_by/min_by pass — no
    self-join, no window over the corpus."""
    documents = load_table(spark, sf_dir, "documents")
    t = documents.select(
        "source", "lang", "doc_id", F.length("text").alias("n_chars")
    )
    g = t.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_n"))
        ).alias("chosen_doc"),
        F.max("n_chars").alias("_c_chars"),
        F.min_by("doc_id", F.struct(F.col("n_chars"), F.col("doc_id"))).alias(
            "rejected_doc"
        ),
        F.min("n_chars").alias("_r_chars"),
    )
    return (
        g.where(F.col("group_size") >= 2)
        .select(
            "source",
            "lang",
            "chosen_doc",
            "rejected_doc",
            (F.col("_c_chars") - F.col("_r_chars")).cast("long").alias("margin"),
            "group_size",
        )
    )


@query(
    "naive_bayes_language_classify",
    oracle="""
    WITH tk AS (
      SELECT doc_id, lang, tok FROM (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ), ctk AS (
      SELECT lang, tok, COUNT(*) AS c FROM tk GROUP BY 1, 2
    ), ct AS (
      SELECT lang, COUNT(*) AS tot FROM tk GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT tok) AS v FROM tk
    ), nd AS (
      SELECT COUNT(*) AS n FROM documents
    ), pri AS (
      SELECT lang,
             CAST(round(ln(COUNT(*)::DOUBLE / (SELECT n FROM nd)), 6)
                  AS DECIMAL(18,6)) AS log_prior
      FROM documents GROUP BY lang
    ), cond AS (
      SELECT ctk.lang, ctk.tok,
             CAST(round(ln((ctk.c + 1.0) / (ct.tot + 1.0 * v.v)), 6)
                  AS DECIMAL(18,6)) AS log_cond
      FROM ctk JOIN ct USING (lang) CROSS JOIN v
    ), unseen AS (
      SELECT ct.lang,
             CAST(round(ln(1.0 / (ct.tot + 1.0 * v.v)), 6)
                  AS DECIMAL(18,6)) AS log_unseen
      FROM ct CROSS JOIN v
    ), dt AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY 1, 2
    ), scored AS (
      SELECT dt.doc_id, u.lang,
             CAST(SUM(CAST(dt.c * coalesce(cond.log_cond, u.log_unseen)
                           AS DECIMAL(28,6))) + p.log_prior
                  AS DECIMAL(28,6)) AS s
      FROM dt
      CROSS JOIN unseen u
      LEFT JOIN cond ON cond.lang = u.lang AND cond.tok = dt.tok
      JOIN pri p ON p.lang = u.lang
      GROUP BY dt.doc_id, u.lang, p.log_prior
    ), top AS (
      SELECT doc_id, MAX(s) AS s FROM scored GROUP BY doc_id
    )
    SELECT scored.doc_id, MIN(scored.lang) AS predicted,
           CAST(scored.s AS DOUBLE) AS score
    FROM scored JOIN top ON scored.doc_id = top.doc_id AND scored.s = top.s
    GROUP BY scored.doc_id, scored.s
    """,
    tags=("model-training", "classifier"),
)
def naive_bayes_language_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained and scored in-engine (the
    classic fastText-precursor corpus classifier): class-conditional
    token log-likelihoods with Laplace smoothing over ``documents``
    (class = ``lang``), then every document scored against every class
    and the argmax kept. Training is two grouped counts; the model is
    a broadcastable vocab×classes table; scoring is one explode + a
    per-class fan-out join + exact-decimal grouped sums (order-
    independent, so the whole posterior is hash-checked against the
    DuckDB oracle). Tie-break: max score, then lexicographically
    smallest class."""
    from .operators.nbayes import nb_score, nb_train

    documents = load_table(spark, sf_dir, "documents")
    cond, priors = nb_train(documents, "text", "lang", alpha=1.0)
    return nb_score(documents, "text", "doc_id", cond, priors, "lang")


@query(
    "prefix_filter_jaccard_join",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            FOR i IN range(1, greatest(len(w) - 1, 1))]) AS s
      FROM t
    ), shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    ex AS (SELECT doc_id, unnest(s) AS tok, len(s) AS sz FROM shf),
    dfq AS (SELECT tok, COUNT(*) AS dfreq FROM ex GROUP BY tok),
    ranked AS (
      SELECT ex.doc_id, ex.tok, ex.sz, dfq.dfreq,
             row_number() OVER (PARTITION BY ex.doc_id
                                ORDER BY dfq.dfreq, ex.tok) AS rk
      FROM ex JOIN dfq USING (tok)
    ),
    pref AS (
      SELECT * FROM ranked
      WHERE rk <= sz - ((4 * sz + 4) // 5) + 1
    ),
    prefb AS (SELECT * FROM pref WHERE dfreq <= 64),
    cands_exact AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefb a JOIN prefb b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND 5 * b.sz >= 4 * a.sz AND 5 * a.sz >= 4 * b.sz
       AND 1 + least(a.sz - a.rk, b.sz - b.rk)
           >= (4 * (a.sz + b.sz) + 8) // 9
    ),
    over_docs AS (SELECT DISTINCT doc_id FROM pref WHERE dfreq > 64),
    osh AS (SELECT shf.doc_id, shf.s FROM shf JOIN over_docs USING (doc_id)),
    sig AS (
      SELECT doc_id,
             [list_min([CAST(('0x' || substr(md5(CAST(p // 2 AS VARCHAR)
                                             || '|' || tok),
                                      CASE WHEN p % 2 = 0 THEN 1 ELSE 17 END,
                                      15)) AS BIGINT)
                        FOR tok IN s])
              FOR p IN range(0, 16)] AS sg
      FROM osh
    ), bandrows AS (
      SELECT doc_id, b.b AS band,
             md5(array_to_string(sg[b.b*4 + 1 : b.b*4 + 4], ',')) AS bkey
      FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b
    ), salted AS (
      SELECT doc_id, band, bkey,
             CAST('0x' || substr(md5(CAST(band AS VARCHAR) || ':' || bkey
                                     || ':' || CAST(doc_id AS VARCHAR)),
                                 1, 8) AS BIGINT)
               % ((COUNT(*) OVER (PARTITION BY band, bkey) + 63) // 64) AS sub
      FROM bandrows
    ), cands_lsh AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM salted x JOIN salted y
        ON x.band = y.band AND x.bkey = y.bkey AND x.sub = y.sub
           AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    cands AS (
      SELECT doc_a, doc_b FROM cands_exact
      UNION
      SELECT doc_a, doc_b FROM cands_lsh
    )
    SELECT doc_a, doc_b,
           round(len(list_intersect(x.s, y.s))::DOUBLE
                 / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
    FROM cands
    JOIN shf x ON x.doc_id = doc_a
    JOIN shf y ON y.doc_id = doc_b
    WHERE round(len(list_intersect(x.s, y.s))::DOUBLE
          / len(list_distinct(list_concat(x.s, y.s))), 4) >= 0.8
    """,
    tags=("dedup-exact", "similarity-join", "hybrid"),
)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-threshold (0.8, trigram shingles) similarity self-join
    via the **bounded-df AllPairs/PPJoin hybrid** (VERDICT r10 #3):
    prefix-filter candidates (globally-rarest ``|s|-ceil(t|s|)+1``
    shingles + integer-exact size and positional filters) restricted
    to shingles with document frequency ≤ 64 — per-token fan-out is
    capped, so candidate volume is ≤ 64·Σdf = LINEAR in the corpus
    where the uncapped filter's Σdf² grew superlinearly (17.2×/decade
    at sf10) — while documents owning any overflow (df > 64) prefix
    shingle are additionally routed through the md5-MinHash-LSH leg
    (16 perms × 4 bands). Candidate sets union before shared
    exact-Jaccard verification. Pairs whose first common prefix
    shingle is bounded are found EXACTLY; pairs that only meet in
    overflow shingles get standard LSH recall. Every stage is
    deterministic md5/integer arithmetic → whole hybrid
    hash-checked. r13 (VERDICT r12 #2): the LSH leg applies the same
    hot-bucket salt split (bucket_cap=64, bucket-keyed salt) as the
    standalone md5-LSH query — the overflow docs own the hottest
    prefix shingles, so their band buckets are the likeliest to go
    hot; the oracle replays the split."""
    from .operators.dedup import prefix_filter_jaccard_pairs

    documents = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        documents, "text", "doc_id", n=3, threshold_num=4, threshold_den=5,
        df_cap=64,
    )


@query(
    "ann_ndcg_eval",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), cells AS (
      SELECT v.vec_id, a.centroid_id, v.vv FROM v JOIN assigned a USING (vec_id)
    ), approx AS (
      SELECT query_id, neighbor_id, rn AS pos FROM (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.vv, x.vv)
                                / (sqrt(list_dot_product(q.vv, q.vv))
                                   * sqrt(list_dot_product(x.vv, x.vv))), 6) DESC,
                          x.vec_id
               ) AS rn
        FROM cells q JOIN cells x
          ON q.centroid_id = x.centroid_id AND x.vec_id <> q.vec_id
        WHERE q.vec_id < 20
      ) WHERE rn <= 5
    ), exact AS (
      SELECT query_id, neighbor_id, rn AS erk FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.vv, e.vv)
                                / (sqrt(list_dot_product(q.vv, q.vv))
                                   * sqrt(list_dot_product(e.vv, e.vv))), 6) DESC,
                          e.vec_id
               ) AS rn
        FROM v q JOIN v e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < 20
      ) WHERE rn <= 5
    ), dcg AS (
      SELECT a.query_id,
             SUM(CAST(round(COALESCE(6 - e.erk, 0) / log2(a.pos + 1), 6)
                      AS DECIMAL(18,6))) AS dcg
      FROM approx a LEFT JOIN exact e USING (query_id, neighbor_id)
      GROUP BY a.query_id
    ), idcg AS (
      SELECT query_id,
             SUM(CAST(round((6 - erk) / log2(erk + 1), 6)
                      AS DECIMAL(18,6))) AS idcg
      FROM exact GROUP BY query_id
    )
    SELECT i.query_id,
           CAST(COALESCE(d.dcg, 0) AS DOUBLE) AS dcg,
           CAST(i.idcg AS DOUBLE) AS idcg,
           round(CAST(COALESCE(d.dcg, 0) AS DOUBLE)
                 / CAST(i.idcg AS DOUBLE), 4) AS ndcg_at_k
    FROM idcg i LEFT JOIN dcg d USING (query_id)
    """,
    tags=("similarity-eval",),
)
def ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking-quality eval: per-query NDCG@5 of the IVF index
    against brute-force cosine ground truth (relevance = 6−exact_rank,
    the standard graded protocol) — recall@k's order-sensitive
    sibling: an ANN index that finds the right 5 neighbors in the
    wrong order scores recall 1.0 but NDCG < 1. Each discounted-gain
    term is rounded to the 1e-6 grid and summed in exact decimal, so
    the whole eval hash-matches the oracle; IDCG comes from the exact
    leg itself (no closed-form constant smuggled in from the driver).
    Scale: identical legs to ann_recall_eval plus two tiny grouped
    decimal sums."""
    from .operators.similarity import cosine_topk, ivf_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    queries = embeddings.where(F.col("vec_id") < 20)
    exact = cosine_topk(queries, embeddings, k=5).select(
        "query_id", "neighbor_id", F.col("rank").alias("_erk")
    )
    approx = ivf_topk(
        embeddings, query_ids=range(20), k=5, arrow=oracle_arrow()
    ).select("query_id", "neighbor_id", F.col("rank").alias("_pos"))
    term = F.round(
        F.coalesce(F.lit(6) - F.col("_erk"), F.lit(0))
        / F.log2(F.col("_pos") + 1),
        6,
    ).cast("decimal(18,6)")
    dcg = (
        approx.join(exact, ["query_id", "neighbor_id"], "left")
        .select("query_id", term.alias("_t"))
        .groupBy("query_id")
        .agg(F.sum("_t").alias("_dcg"))
    )
    iterm = F.round(
        (F.lit(6) - F.col("_erk")) / F.log2(F.col("_erk") + 1), 6
    ).cast("decimal(18,6)")
    idcg = (
        exact.select("query_id", iterm.alias("_t"))
        .groupBy("query_id")
        .agg(F.sum("_t").alias("_idcg"))
    )
    return (
        idcg.join(dcg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("_dcg"), F.lit(0)).cast("double").alias("dcg"),
            F.col("_idcg").cast("double").alias("idcg"),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0)).cast("double")
                / F.col("_idcg").cast("double"),
                4,
            ).alias("ndcg_at_k"),
        )
    )


def _mmr_oracle(n_queries: int = 8, kc: int = 20, ks: int = 5, lam: float = 0.7) -> str:
    """Unrolled MMR oracle: shortlist + pairwise-sim CTEs, then one
    (exclude → score → argmax) CTE block per greedy round, mirroring
    ``operators.similarity.mmr_rerank`` exactly."""

    def cos(x: str, y: str) -> str:
        return (
            f"round(list_dot_product({x}, {y}) / "
            f"(sqrt(list_dot_product({x}, {x})) * sqrt(list_dot_product({y}, {y}))), 6)"
        )

    mu = repr(float(lam))
    nu = repr(round(1.0 - float(lam), 10))
    parts = [
        f"""WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), cand AS (
      SELECT query_id, cand_id, s FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
               {cos('q.vv', 'e.vv')} AS s,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos('q.vv', 'e.vv')} DESC, e.vec_id
               ) AS rn
        FROM v q JOIN v e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {n_queries}
      ) WHERE rn <= {kc}
    ), ps AS (
      SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
             {cos('va.vv', 'vb.vv')} AS sim
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
      JOIN v va ON va.vec_id = a.cand_id
      JOIN v vb ON vb.vec_id = b.cand_id
    ), s1 AS (
      SELECT query_id, cand_id, 1 AS pick_rank, round({mu} * s, 7) AS mmr_score
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY round({mu} * s, 7) DESC, cand_id
        ) AS rn FROM cand
      ) WHERE rn = 1
    )"""
    ]
    for i in range(2, ks + 1):
        parts.append(
            f""", p{i} AS (
      SELECT query_id, cand_id, {i} AS pick_rank, sc AS mmr_score FROM (
        SELECT t.query_id, t.cand_id, t.sc,
               ROW_NUMBER() OVER (
                 PARTITION BY t.query_id ORDER BY t.sc DESC, t.cand_id
               ) AS rn
        FROM (
          SELECT c.query_id, c.cand_id,
                 round({mu} * c.s - {nu} * MAX(p.sim), 7) AS sc
          FROM cand c
          JOIN ps p ON p.query_id = c.query_id AND p.ca = c.cand_id
          JOIN s{i - 1} sel
            ON sel.query_id = p.query_id AND sel.cand_id = p.cb
          LEFT JOIN s{i - 1} ex
            ON ex.query_id = c.query_id AND ex.cand_id = c.cand_id
          WHERE ex.cand_id IS NULL
          GROUP BY c.query_id, c.cand_id, c.s
        ) t
      ) WHERE rn = 1
    ), s{i} AS (
      SELECT * FROM s{i - 1} UNION ALL SELECT * FROM p{i}
    )"""
        )
    parts.append(
        f"""
    SELECT query_id, cand_id AS selected_id, pick_rank, mmr_score
    FROM s{ks}"""
    )
    return "".join(parts)


@query(
    "mmr_diverse_rerank",
    oracle=_mmr_oracle(n_queries=8, kc=20, ks=5, lam=0.7),
    tags=("similarity-serving", "diversification"),
)
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversification (Carbonell &
    Goldstein 1998) of each query's exact top-20 cosine shortlist:
    greedily pick 5 results trading relevance against redundancy
    (λ=0.7) — the serving-side diversity pass and the diverse-exemplar
    sampler for curation. The whole greedy trajectory (shortlist,
    pairwise sims, per-round argmax with id tie-breaks) runs on the
    1e-6 grid and hash-matches an unrolled per-round CTE oracle. The
    quadratic stage is shortlist-sized (k², never corpus²)."""
    from .operators.similarity import mmr_rerank

    embeddings = load_table(spark, sf_dir, "embeddings")
    out = mmr_rerank(
        embeddings, query_ids=range(8), k_candidates=20, k_select=5, lam=0.7
    )
    return out.select(
        "query_id",
        F.col("cand_id").alias("selected_id"),
        "pick_rank",
        "mmr_score",
    )


@query(
    "hybrid_search_rrf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), tokf AS (
      SELECT doc_id, token FROM tok WHERE token <> ''
    ), dl AS (
      SELECT doc_id, COUNT(*)::BIGINT AS dlen FROM tokf GROUP BY doc_id
    ), corpus AS (
      SELECT COUNT(*)::BIGINT AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, token, COUNT(*)::BIGINT AS tf
      FROM tokf WHERE token IN ('spark', 'query', 'join')
      GROUP BY doc_id, token
    ), dfq AS (
      SELECT token, COUNT(*)::BIGINT AS dfreq FROM tf GROUP BY token
    ), bscored AS (
      SELECT tf.doc_id,
             round(
               ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dlen / corpus.avgdl)),
               6) AS term_score
      FROM tf
      JOIN dfq USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN corpus
    ), btotals AS (
      SELECT doc_id,
             CAST(SUM(CAST(term_score AS DECIMAL(28,6))) AS DOUBLE) AS bm25
      FROM bscored GROUP BY doc_id
    ), lex AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM btotals
      ) WHERE rank <= 20
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), q AS (
      SELECT vv AS qv FROM v WHERE vec_id = 0
    ), dense AS (
      SELECT doc_id, rank FROM (
        SELECT e.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 ORDER BY round(list_dot_product(q.qv, e.vv)
                                / (sqrt(list_dot_product(q.qv, q.qv))
                                   * sqrt(list_dot_product(e.vv, e.vv))), 6) DESC,
                          e.vec_id
               ) AS rank
        FROM v e CROSS JOIN q WHERE e.vec_id <> 0
      ) WHERE rank <= 20
    ), fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             l.rank AS lex_rank, d.rank AS dense_rank,
             CAST(COALESCE(CAST(round(1.0 / (60 + l.rank), 6) AS DECIMAL(18,6)),
                           0)
                  + COALESCE(CAST(round(1.0 / (60 + d.rank), 6) AS DECIMAL(18,6)),
                             0) AS DOUBLE) AS rrf
      FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, CAST(lex_rank AS INT) AS lex_rank,
           CAST(dense_rank AS INT) AS dense_rank, rrf, fused_rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= 10
    """,
    tags=("ir", "ranking", "hybrid-search"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
    2009, k=60): fuse the BM25 lexical top-20 (3-term query, same
    scoring as bm25_rank_documents) with the dense cosine top-20
    (query = embedding 0) by ``Σ 1/(60+rank)`` — the standard
    score-free fusion every RAG serving stack runs, robust to the two
    legs' incomparable score scales. Fusion terms are grid-rounded and
    decimal-summed; the full outer join keeps docs found by only one
    leg. Scale: both legs are existing top-k shapes; fusion touches 40
    rows."""
    from pyspark.sql import Window as W

    terms = ("spark", "query", "join")
    documents = load_table(spark, sf_dir, "documents")
    tokf = (
        documents.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
        )
        .where(F.col("token") != "")
    )
    dl = tokf.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tokf.where(F.col("token").isin(list(terms)))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
    )
    term_score = F.round(
        idf
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + 1.2 * (1 - 0.75 + 0.75 * F.col("dlen") / F.col("avgdl"))
        ),
        6,
    )
    btotals = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("term_score").cast("decimal(28,6)"))
            .cast("double")
            .alias("bm25")
        )
    )
    wl = W.partitionBy().orderBy(F.col("bm25").desc(), "doc_id")
    lex = (
        btotals.withColumn("rank", F.row_number().over(wl))
        .where(F.col("rank") <= 20)
        .select("doc_id", F.col("rank").alias("lex_rank"))
    )

    from .operators.similarity import cosine_topk

    embeddings = load_table(spark, sf_dir, "embeddings")
    dense = (
        cosine_topk(
            embeddings.where(F.col("vec_id") == 0), embeddings, k=20
        )
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("dense_rank"),
        )
    )
    rrf_term = lambda c: F.coalesce(  # noqa: E731
        F.round(F.lit(1.0) / (F.lit(60) + F.col(c)), 6).cast("decimal(18,6)"),
        F.lit(0).cast("decimal(18,6)"),
    )
    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("dense_rank").cast("int").alias("dense_rank"),
            (rrf_term("lex_rank") + rrf_term("dense_rank"))
            .cast("double")
            .alias("rrf"),
        )
    )
    wf = W.partitionBy().orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .where(F.col("fused_rank") <= 10)
    )


@query(
    "late_interaction_maxsim",
    oracle="""
    WITH v AS (
      SELECT vec_id, vec_id // 8 AS doc, embedding::DOUBLE[] AS vv
      FROM embeddings
    ), q AS (
      SELECT vec_id AS q_idx, vv AS qv FROM v WHERE doc = 0
    ), pairs AS (
      SELECT c.doc, q.q_idx,
             round(list_dot_product(q.qv, c.vv)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.vv, c.vv))), 6) AS sim
      FROM v c CROSS JOIN q WHERE c.doc <> 0
    ), per_qd AS (
      SELECT doc, q_idx, CAST(MAX(sim) AS DECIMAL(18,6)) AS msim
      FROM pairs GROUP BY doc, q_idx
    ), scores AS (
      SELECT doc, CAST(SUM(msim) AS DOUBLE) AS maxsim
      FROM per_qd GROUP BY doc
    )
    SELECT doc, maxsim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY maxsim DESC, doc) AS rank
      FROM scores
    ) WHERE rank <= 5
    """,
    tags=("similarity-serving", "late-interaction"),
)
def late_interaction_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia
    2020): documents are MULTI-vector (8 token-level vectors each —
    here pseudo-docs of 8 consecutive embeddings), and relevance is
    MaxSim — for each query vector take the max cosine over the doc's
    vectors, then sum over query vectors. Query vectors broadcast; the
    corpus is scored in one pass then reduced by two grouped
    aggregates (max per (query-vec, doc), decimal sum per doc) — no
    corpus×corpus stage, and the shuffle carries (doc, q_idx, sim)
    triples, not vectors. Per-pair sims grid-rounded, the final score
    an exact decimal sum → fully hash-checked."""
    from pyspark.sql import Window as W

    from .operators.similarity import _dot, norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("vec_id") / 8).cast("long").alias("doc"),
        F.col("embedding").cast("array<double>").alias("_v"),
    )
    q = emb.where(F.col("doc") == 0).select(
        F.col("vec_id").alias("q_idx"), F.col("_v").alias("_q")
    )
    c = emb.where(F.col("doc") != 0)
    sim = F.round(
        _dot(F.col("_q"), F.col("_v"))
        / (norm(F.col("_q")) * norm(F.col("_v"))),
        6,
    )
    per_qd = (
        c.crossJoin(F.broadcast(q))
        .select("doc", "q_idx", sim.alias("sim"))
        .groupBy("doc", "q_idx")
        .agg(F.max("sim").cast("decimal(18,6)").alias("msim"))
    )
    scores = per_qd.groupBy("doc").agg(
        F.sum("msim").cast("double").alias("maxsim")
    )
    # Top-5 via sort+limit (TakeOrderedAndProject) — the doc-score
    # frame is corpus-sized; the rank window now sees 5 rows (r11).
    top = scores.orderBy(F.col("maxsim").desc(), "doc").limit(5)
    w = W.partitionBy().orderBy(F.col("maxsim").desc(), "doc")
    return top.withColumn("rank", F.row_number().over(w))


@query(
    "matryoshka_truncation_audit",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS pa, b.vec_id AS pb, a.vv AS va, b.vv AS vb
      FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0
    ), sims AS (
      SELECT pa,
             round(list_dot_product(va, vb)
                   / (sqrt(list_dot_product(va, va))
                      * sqrt(list_dot_product(vb, vb))), 6) AS full_sim,
             round(list_dot_product(va[1:16], vb[1:16])
                   / (sqrt(list_dot_product(va[1:16], va[1:16]))
                      * sqrt(list_dot_product(vb[1:16], vb[1:16]))), 6)
               AS trunc_sim
      FROM pairs
    ), sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(abs(full_sim - trunc_sim) AS DECIMAL(18,6)))
                  AS DOUBLE) AS sae,
             CAST(SUM(CAST(full_sim AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(trunc_sim AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(full_sim * trunc_sim AS DECIMAL(38,12)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(full_sim * full_sim AS DECIMAL(38,12)))
                  AS DOUBLE) AS sx2,
             CAST(SUM(CAST(trunc_sim * trunc_sim AS DECIMAL(38,12)))
                  AS DOUBLE) AS sy2
      FROM sims
    )
    SELECT n AS n_pairs,
           round(sae / n, 6) AS mean_abs_err,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)),
                 6) AS pearson_r
    FROM sums
    """,
    tags=("similarity-eval", "quantization"),
)
def matryoshka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit (Kusupati et al. 2022): before
    serving truncated embeddings (16 of 64 dims = 4× memory/IO
    savings), measure how well truncated cosine tracks full cosine
    over a deterministic pair sample — mean absolute error plus
    Pearson r. Rounded sims sit on the 1e-6 grid, their products on
    the exact 1e-12 decimal grid, so every moment feeding the
    correlation is an order-independent exact sum and the audit
    hash-matches. One pair join + one aggregate; no corpus quadratics
    (the pair sample is id-adjacent by construction)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v")
    )
    from .operators.similarity import _dot, norm

    a = emb.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("pa"), F.col("_v").alias("va")
    )
    b = emb.select((F.col("vec_id") - 1).alias("pa"), F.col("_v").alias("vb"))
    pairs = a.join(b, "pa").select(
        "pa",
        F.col("va"),
        F.col("vb"),
        F.slice(F.col("va"), 1, 16).alias("ta"),
        F.slice(F.col("vb"), 1, 16).alias("tb"),
    )

    def cos(x, y):
        return F.round(
            _dot(F.col(x), F.col(y)) / (norm(F.col(x)) * norm(F.col(y))), 6
        )

    sims = pairs.select(
        "pa", cos("va", "vb").alias("full_sim"), cos("ta", "tb").alias("trunc_sim")
    )
    sums = sims.agg(
        F.count("*").alias("n"),
        F.sum(
            F.abs(F.col("full_sim") - F.col("trunc_sim")).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("sae"),
        F.sum(F.col("full_sim").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.col("trunc_sim").cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum((F.col("full_sim") * F.col("trunc_sim")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("full_sim") * F.col("full_sim")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sx2"),
        F.sum((F.col("trunc_sim") * F.col("trunc_sim")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sy2"),
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sx2") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("sy2") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        F.col("n").alias("n_pairs"),
        F.round(F.col("sae") / n, 6).alias("mean_abs_err"),
        F.round(r, 6).alias("pearson_r"),
    )


@query(
    "calibration_bins_logreg",
    oracle=f"""
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS mean_predicted,
           round(CAST(SUM(label_bin) AS DOUBLE) / COUNT(*), 6)
             AS frac_positive
    FROM (
      SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin, p, label_bin
      FROM ({_logreg_oracle(nf=4, lr=2.0, iters=5)}) t
    ) GROUP BY bin
    """,
    tags=("model-training", "classifier", "eval"),
)
def calibration_bins_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram audit of the in-engine logistic-regression
    classifier: decile-bin its predicted probabilities and compare
    mean prediction vs observed positive rate per bin — the
    calibration check a learned quality filter needs before its scores
    gate corpus admission. Reuses the full logreg training trajectory
    (the oracle embeds the same unrolled 5-iteration CTE program as a
    subquery); binning and both rates are exact (grid p, decimal sums,
    integer counts)."""
    from .operators.logreg import logreg_fit, logreg_score, standardize

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(base, [f"f{i}" for i in range(4)])
    weights = logreg_fit(feats, zcols, "label_bin", lr=2.0, iters=5)
    scored = logreg_score(feats, zcols, weights).select(
        F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("int").alias("bin"),
        "p",
        "label_bin",
    )
    return scored.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("p").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_predicted"),
        F.round(
            F.sum("label_bin").cast("double") / F.count("*"), 6
        ).alias("frac_positive"),
    )


@query(
    "info_gain_token_features",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, unnest(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
      FROM documents
    ), nn AS (SELECT COUNT(*) AS n FROM documents),
    nl AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
    nt AS (SELECT tok, COUNT(*) AS n_t FROM d GROUP BY tok),
    ntl AS (SELECT tok, lang, COUNT(*) AS n_tl FROM d GROUP BY tok, lang),
    grid AS (
      SELECT nt.tok, nt.n_t, nl.lang, nl.n_l, COALESCE(ntl.n_tl, 0) AS n_tl
      FROM nt CROSS JOIN nl
      LEFT JOIN ntl ON ntl.tok = nt.tok AND ntl.lang = nl.lang
    ), base AS (
      SELECT CAST(SUM(CAST(round(
               -(CAST(n_l AS DOUBLE) / n) * ln(CAST(n_l AS DOUBLE) / n), 6)
             AS DECIMAL(18,6))) AS DOUBLE) AS h_base
      FROM nl CROSS JOIN nn
    ), parts AS (
      SELECT g.tok, g.n_t, nn.n,
             CAST(SUM(CAST(CASE WHEN g.n_tl > 0 THEN round(
               -(CAST(g.n_tl AS DOUBLE) / g.n_t)
               * ln(CAST(g.n_tl AS DOUBLE) / g.n_t), 6) ELSE 0 END
             AS DECIMAL(18,6))) AS DOUBLE) AS h_present,
             CAST(SUM(CAST(CASE WHEN g.n_l - g.n_tl > 0 AND nn.n - g.n_t > 0
               THEN round(
                 -(CAST(g.n_l - g.n_tl AS DOUBLE) / (nn.n - g.n_t))
                 * ln(CAST(g.n_l - g.n_tl AS DOUBLE) / (nn.n - g.n_t)), 6)
               ELSE 0 END
             AS DECIMAL(18,6))) AS DOUBLE) AS h_absent
      FROM grid g CROSS JOIN nn
      GROUP BY g.tok, g.n_t, nn.n
    )
    SELECT p.tok AS token, p.n_t AS n_docs_with,
           round(b.h_base
                 - ((CAST(p.n_t AS DOUBLE) / p.n) * p.h_present
                    + (CAST(p.n - p.n_t AS DOUBLE) / p.n) * p.h_absent),
                 6) AS info_gain
    FROM parts p CROSS JOIN base b
    """,
    tags=("feature-selection", "classifier", "statistics"),
)
def info_gain_token_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain feature ranking for the corpus classifiers:
    for every vocabulary token, IG(lang; token-presence) = H(lang) −
    [P(t)·H(lang|t) + P(¬t)·H(lang|¬t)] from exact document counts —
    the filter-method feature selection that decides which token
    features feed the NB/logreg quality classifiers. Per-(token,class)
    entropy terms are grid-rounded and decimal-summed (order-
    independent); the final combination is one fixed double
    expression. Shuffles are token-keyed; the class grid is
    vocab×langs (broadcast-scale)."""
    documents = load_table(spark, sf_dir, "documents")
    d = documents.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col("text"), " "), lambda x: x != "")
            )
        ).alias("tok"),
    )
    nn = documents.agg(F.count("*").alias("n"))
    nl = documents.groupBy("lang").agg(F.count("*").alias("n_l"))
    nt = d.groupBy("tok").agg(F.count("*").alias("n_t"))
    ntl = d.groupBy("tok", "lang").agg(F.count("*").alias("n_tl"))
    grid = (
        nt.crossJoin(F.broadcast(nl))
        .join(ntl, ["tok", "lang"], "left")
        .withColumn("n_tl", F.coalesce(F.col("n_tl"), F.lit(0)))
        .crossJoin(F.broadcast(nn))
    )
    base = (
        nl.crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                F.round(
                    -(F.col("n_l").cast("double") / F.col("n"))
                    * F.log(F.col("n_l").cast("double") / F.col("n")),
                    6,
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("h_base")
        )
    )
    p_pres = F.col("n_tl").cast("double") / F.col("n_t")
    term_pres = F.when(
        F.col("n_tl") > 0,
        F.round(-p_pres * F.log(p_pres), 6),
    ).otherwise(F.lit(0.0))
    m_tl = F.col("n_l") - F.col("n_tl")
    m_t = F.col("n") - F.col("n_t")
    p_abs = m_tl.cast("double") / m_t
    term_abs = F.when(
        (m_tl > 0) & (m_t > 0), F.round(-p_abs * F.log(p_abs), 6)
    ).otherwise(F.lit(0.0))
    parts = grid.groupBy("tok", "n_t", "n").agg(
        F.sum(term_pres.cast("decimal(18,6)")).cast("double").alias("h_present"),
        F.sum(term_abs.cast("decimal(18,6)")).cast("double").alias("h_absent"),
    )
    return parts.crossJoin(F.broadcast(base)).select(
        F.col("tok").alias("token"),
        F.col("n_t").alias("n_docs_with"),
        F.round(
            F.col("h_base")
            - (
                (F.col("n_t").cast("double") / F.col("n")) * F.col("h_present")
                + ((F.col("n") - F.col("n_t")).cast("double") / F.col("n"))
                * F.col("h_absent")
            ),
            6,
        ).alias("info_gain"),
    )


@query(
    "heldout_perplexity_eval",
    oracle="""
    WITH tr AS (
      SELECT tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        WHERE doc_id % 5 <> 0
      ) WHERE tok <> ''
    ), lm AS (
      SELECT tok, COUNT(*) AS c FROM tr GROUP BY tok
    ), tot AS (
      SELECT (SELECT COUNT(*) FROM tr) AS t,
             (SELECT COUNT(DISTINCT tok) FROM tr) AS v
    ), te AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        WHERE doc_id % 5 = 0
      ) WHERE tok <> '' GROUP BY doc_id, tok
    ), scored AS (
      SELECT te.doc_id,
             CAST(SUM(te.c) AS BIGINT) AS n_tokens,
             SUM(CAST(te.c * CAST(round(
               -ln((coalesce(lm.c, 0) + 1.0) / (tot.t + tot.v)), 6)
             AS DECIMAL(18,6)) AS DECIMAL(28,6))) AS nll
      FROM te CROSS JOIN tot LEFT JOIN lm USING (tok)
      GROUP BY te.doc_id
    )
    SELECT doc_id, n_tokens,
           round(CAST(nll AS DOUBLE) / n_tokens, 6) AS avg_nll,
           round(exp(round(CAST(nll AS DOUBLE) / n_tokens, 6)), 4) AS ppl
    FROM scored
    """,
    tags=("lm-eval", "text-corpus"),
)
def heldout_perplexity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out language-model evaluation: fit the Laplace-smoothed
    unigram LM on the 80% train split (doc_id % 5 ≠ 0), score the 20%
    held-out docs with per-token negative log-likelihood and
    perplexity — the eval loop that decides whether a cheaper corpus
    mix degraded the LM signal. Per-token NLLs are grid-rounded and
    decimal-summed; OOV tokens hit the smoothing floor through the
    same left-join/coalesce shape as the NB scorer. The LM is a
    vocab-sized broadcast; shuffles are token- and doc-keyed only."""
    documents = load_table(spark, sf_dir, "documents")
    train = documents.where(F.col("doc_id") % 5 != 0)
    test = documents.where(F.col("doc_id") % 5 == 0)
    tr = train.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    lm = tr.groupBy("tok").agg(F.count("*").alias("c"))
    tot = tr.agg(
        F.count("*").alias("t"), F.countDistinct("tok").alias("v")
    )
    te = (
        test.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    nll_term = F.round(
        -F.log(
            (F.coalesce(F.col("lm_c"), F.lit(0)) + F.lit(1.0))
            / (F.col("t") + F.col("v"))
        ),
        6,
    ).cast("decimal(18,6)")
    scored = (
        te.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(lm.select("tok", F.col("c").alias("lm_c"))),
            "tok",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum((F.col("c") * nll_term).cast("decimal(28,6)")).alias("nll"),
        )
    )
    avg_nll = F.round(F.col("nll").cast("double") / F.col("n_tokens"), 6)
    return scored.select(
        "doc_id",
        "n_tokens",
        avg_nll.alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"),
    )


def _hash_embed_oracle(dim: int = 8) -> str:
    """Generated hash-embedding oracle: md5-derived token vectors on
    the exact 1e-3 grid, tf·idf decimal weights, exact component sums."""
    comps = ",\n             ".join(
        f"(CAST(('0x' || substr(md5('he_{j}_' || tok), 1, 12)) AS BIGINT) "
        f"% 2001 - 1000) / 1000.0 AS v{j}"
        for j in range(dim)
    )
    sums = ",\n           ".join(
        f"round(CAST(SUM(CAST(w * v{j} AS DECIMAL(38,9))) AS DOUBLE) "
        f"/ CAST(tw AS DOUBLE), 6) AS e{j}"
        for j in range(dim)
    )
    return f"""
    WITH dt AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY doc_id, tok
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok
    ), nn AS (SELECT COUNT(*) AS n FROM documents),
    tv AS (
      SELECT tok,
             {comps}
      FROM dfreq
    ), weighted AS (
      SELECT dt.doc_id, dt.tok,
             CAST(dt.c * CAST(round(ln(CAST(nn.n AS DOUBLE) / dfreq.df) + 1.0,
                                    6) AS DECIMAL(18,6))
                  AS DECIMAL(28,6)) AS w
      FROM dt JOIN dfreq USING (tok) CROSS JOIN nn
    ), tot AS (
      SELECT doc_id, SUM(w) AS tw FROM weighted GROUP BY doc_id
    )
    SELECT w.doc_id,
           {sums}
    FROM weighted w JOIN tv USING (tok) JOIN tot USING (doc_id)
    GROUP BY w.doc_id, tot.tw
    """


@query(
    "hash_embed_documents",
    oracle=_hash_embed_oracle(8),
    tags=("embeddings", "feature-engineering", "random-indexing"),
)
def hash_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-free document embeddings by random indexing / hash
    embeddings (Kanerva 2000; Svenstrup 2017): every vocabulary token
    gets a deterministic md5-derived vector on the exact 1e-3 grid,
    and a document embeds as its tf·(idf+1)-weighted token-vector
    mean — the zero-model fallback embedder (cold-start similarity,
    drift monitoring, blocking keys) that needs no GPU and reproduces
    bit-for-bit on any engine. Token vectors are computed once per
    VOCABULARY row and broadcast; per-doc sums are exact decimals;
    the only corpus-sized shuffles are token-keyed."""
    dim = 8
    documents = load_table(spark, sf_dir, "documents")
    dt = (
        documents.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    dfreq = dt.groupBy("tok").agg(F.count("*").alias("df"))
    nn = documents.agg(F.count("*").alias("n"))
    tv = dfreq.select(
        "tok",
        *[
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"he_{j}_"), F.col("tok"))),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2001
                    - 1000
                )
                / 1000.0
            ).alias(f"v{j}")
            for j in range(dim)
        ],
    )
    w = (
        dt.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "tok",
            (
                F.col("c")
                * F.round(
                    F.log(F.col("n").cast("double") / F.col("df")) + 1.0, 6
                ).cast("decimal(18,6)")
            )
            .cast("decimal(28,6)")
            .alias("w"),
        )
    )
    tot = w.groupBy("doc_id").agg(F.sum("w").alias("tw"))
    return (
        w.join(F.broadcast(tv), "tok")
        .join(tot, "doc_id")
        .groupBy("doc_id", "tw")
        .agg(
            *[
                F.round(
                    F.sum(
                        (F.col("w") * F.col(f"v{j}")).cast("decimal(38,9)")
                    ).cast("double")
                    / F.col("tw").cast("double"),
                    6,
                ).alias(f"e{j}")
                for j in range(dim)
            ]
        )
        .drop("tw")
    )


@query(
    "curation_ensemble_gate",
    oracle=f"""
    WITH lr AS (
      SELECT vec_id, predicted FROM ({_logreg_oracle(nf=4, lr=2.0, iters=5)}) t
    ), txt AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_words,
             len(list_distinct(list_filter(string_split(text, ' '),
                                           x -> x <> ''))) AS n_distinct
      FROM documents
    )
    SELECT d.doc_id,
           CAST(lr.predicted AS INT) AS s_classifier,
           CAST(txt.n_words >= 20 AS INT) AS s_length,
           CAST(txt.n_distinct * 2 >= txt.n_words AS INT) AS s_diversity,
           CAST((lr.predicted
                 + CAST(txt.n_words >= 20 AS INT)
                 + CAST(txt.n_distinct * 2 >= txt.n_words AS INT)) >= 2
                AS INT) AS admitted
    FROM documents d
    JOIN lr ON lr.vec_id = d.doc_id
    JOIN txt ON txt.doc_id = d.doc_id
    """,
    tags=("curation-policy", "ensemble", "classifier"),
)
def curation_ensemble_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus admission as an ENSEMBLE policy gate — the shape real
    curation stacks converge on (no single filter is trusted alone):
    per document, vote three independent signals — the trained logreg
    classifier's prediction (embeddings leg, full 5-iteration training
    trajectory), a length floor, and a lexical-diversity floor
    (distinct/total ≥ 0.5, the repetition heuristic) — and admit on
    majority. Each signal is itself oracle-checked elsewhere; here the
    COMPOSITION is hash-checked end-to-end (the logreg CTE program
    embeds as a subquery). One join per signal, all on the document
    key; signals evaluate independently, so the gate parallelises as
    three scans + a 3-way key join."""
    from .operators.logreg import logreg_fit, logreg_score, standardize

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(base, [f"f{i}" for i in range(4)])
    weights = logreg_fit(feats, zcols, "label_bin", lr=2.0, iters=5)
    lr = logreg_score(feats, zcols, weights).select(
        F.col("vec_id").alias("doc_id"),
        F.col("predicted").cast("int").alias("s_classifier"),
    )
    documents = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    txt = documents.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    gated = lr.join(txt, "doc_id").select(
        "doc_id",
        "s_classifier",
        (F.col("n_words") >= 20).cast("int").alias("s_length"),
        (F.col("n_distinct") * 2 >= F.col("n_words"))
        .cast("int")
        .alias("s_diversity"),
    )
    votes = (
        F.col("s_classifier") + F.col("s_length") + F.col("s_diversity")
    )
    return gated.select(
        "doc_id",
        "s_classifier",
        "s_length",
        "s_diversity",
        (votes >= 2).cast("int").alias("admitted"),
    )


def _rag_oracle(dim: int = 8, chunk: int = 32, stride: int = 24) -> str:
    """Generated end-to-end RAG retrieval oracle: overlap-chunking →
    md5 token vectors → tf-weighted chunk/query embeddings → cosine
    top-5, all from the same closed-form pieces as the standalone
    chunking and hash-embedding oracles."""
    tv = ",\n             ".join(
        f"(CAST(('0x' || substr(md5('he_{j}_' || tok), 1, 12)) AS BIGINT) "
        f"% 2001 - 1000) / 1000.0 AS v{j}"
        for j in range(dim)
    )
    emb = ",\n             ".join(
        f"round(CAST(SUM(CAST(c * CAST(v{j} AS DECIMAL(6,3)) AS DECIMAL(38,3)))"
        f" AS DOUBLE) / SUM(c), 6) AS e{j}"
        for j in range(dim)
    )
    qemb = ",\n             ".join(
        f"round(CAST(SUM(CAST(c * CAST(v{j} AS DECIMAL(6,3)) AS DECIMAL(38,3)))"
        f" AS DOUBLE) / SUM(c), 6) AS q{j}"
        for j in range(dim)
    )
    dot = " + ".join(f"e{j} * q{j}" for j in range(dim))
    ne = " + ".join(f"e{j} * e{j}" for j in range(dim))
    nq = " + ".join(f"q{j} * q{j}" for j in range(dim))
    return f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), chunks AS (
      SELECT doc_id, chunk_id,
             w[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk}] AS cw
      FROM (
        SELECT doc_id, w,
               unnest(range(0, CAST(greatest(ceil((n - {chunk}) / {stride}.0),
                                             0) AS BIGINT) + 1)) AS chunk_id
        FROM w
      )
    ), ct AS (
      SELECT doc_id, chunk_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, chunk_id, unnest(cw) AS tok FROM chunks)
      WHERE tok <> '' GROUP BY 1, 2, 3
    ), vocab AS (
      SELECT DISTINCT tok FROM ct
      UNION
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id = 0
    ), tv AS (
      SELECT tok,
             {tv}
      FROM vocab WHERE tok <> ''
    ), cemb AS (
      SELECT ct.doc_id, ct.chunk_id,
             {emb}
      FROM ct JOIN tv USING (tok)
      GROUP BY ct.doc_id, ct.chunk_id
    ), qt AS (
      SELECT tok, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id = 0
      ) WHERE tok <> '' GROUP BY tok
    ), qemb AS (
      SELECT {qemb}
      FROM qt JOIN tv USING (tok)
    )
    SELECT doc_id, chunk_id, score, rank FROM (
      SELECT c.doc_id, c.chunk_id,
             round(({dot}) / (sqrt({ne}) * sqrt({nq})), 6) AS score,
             ROW_NUMBER() OVER (
               ORDER BY round(({dot}) / (sqrt({ne}) * sqrt({nq})), 6) DESC,
                        c.doc_id, c.chunk_id
             ) AS rank
      FROM cemb c CROSS JOIN qemb
      WHERE c.doc_id <> 0
    ) WHERE rank <= 5
    """


@query(
    "rag_chunk_retrieval",
    oracle=_rag_oracle(8, 32, 24),
    tags=("rag", "chunking", "embeddings", "similarity-serving"),
)
def rag_chunk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG indexing-and-retrieval pipeline END-TO-END in one lazy
    plan: overlap-chunk the corpus (32-word windows, stride 24) →
    embed every chunk with the training-free md5 hash embedder
    (tf-weighted token vectors, exact decimal sums) → retrieve the
    top-5 chunks for a query (document 0's full-text embedding,
    self-chunks excluded) by cosine. Each stage is the already-
    verified standalone operator; the composition is hash-checked as
    one program. Chunking is a row-local generate; token vectors are
    vocabulary-sized and broadcast; the only corpus-sized shuffles
    are (chunk, token)-keyed; the final rank is over chunk count."""
    from .operators.textstats import chunk_with_overlap

    dim = 8
    documents = load_table(spark, sf_dir, "documents")
    # r15 negative result: scale_out before the chunk generate was
    # A/B'd and REVERTED — the chunk/token explode's 1-task stages are
    # only ~0.5 s and overlap the broadcast builds, so the added
    # exchange bought nothing (interleaved A/B best 2.85 old vs 3.26
    # new, new ahead 2/4). The query's residual is plan/AQE latency.
    chunks = chunk_with_overlap(
        documents, "text", "doc_id", chunk_size=32, stride=24
    )
    ct = (
        chunks.select(
            "doc_id",
            "chunk_id",
            F.explode(F.split(F.col("chunk_text"), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "chunk_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    qt = (
        documents.where(F.col("doc_id") == 0)
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    vocab = ct.select("tok").union(qt.select("tok")).distinct()
    tv = vocab.select(
        "tok",
        *[
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"he_{j}_"), F.col("tok"))),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % 2001
                    - 1000
                )
                / 1000.0
            ).alias(f"v{j}")
            for j in range(dim)
        ],
    )

    def embed(counts, keys):
        return counts.join(F.broadcast(tv), "tok").groupBy(*keys).agg(
            *[
                F.round(
                    F.sum(
                        (
                            F.col("c")
                            * F.col(f"v{j}").cast("decimal(6,3)")
                        ).cast("decimal(38,3)")
                    ).cast("double")
                    / F.sum("c"),
                    6,
                ).alias(f"e{j}")
                for j in range(dim)
            ]
        )

    cemb = embed(ct, ["doc_id", "chunk_id"])
    qemb = embed(qt, []).select(
        *[F.col(f"e{j}").alias(f"q{j}") for j in range(dim)]
    )
    dot = sum(F.col(f"e{j}") * F.col(f"q{j}") for j in range(dim))
    ne = sum(F.col(f"e{j}") * F.col(f"e{j}") for j in range(dim))
    nq = sum(F.col(f"q{j}") * F.col(f"q{j}") for j in range(dim))
    from pyspark.sql import Window as W

    score = F.round(dot / (F.sqrt(ne) * F.sqrt(nq)), 6)
    wr = W.partitionBy().orderBy(
        F.col("score").desc(), "doc_id", "chunk_id"
    )
    scored = (
        cemb.where(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(qemb))
        .select("doc_id", "chunk_id", score.alias("score"))
    )
    # Top-5 via sort+limit (TakeOrderedAndProject) — the chunk-score
    # frame is corpus-sized; the rank window now sees 5 rows (r11).
    top = scored.orderBy(F.col("score").desc(), "doc_id", "chunk_id").limit(5)
    return top.withColumn("rank", F.row_number().over(wr))


def _logreg_holdout_oracle(
    nf: int = 4, lr: float = 2.0, iters: int = 5, k: int = 5,
    final: str | None = None, heldout: int = 0,
) -> str:
    """Hold-out twin of ``_logreg_oracle``: standardization stats and
    every gradient come from the train folds only (vec_id % k ≠ 0);
    the final confusion matrix scores ONLY the held-out fold."""
    xs = [f"x{j + 1}" for j in range(nf)]
    zexpr = "w0 + " + " + ".join(f"w{j + 1}*{x}" for j, x in enumerate(xs))
    sig = f"1.0/(1.0+exp(-({zexpr})))"
    feat_cols = ",\n             ".join(
        f"list_extract(embedding::DOUBLE[], {i + 1}) AS f{i}" for i in range(nf)
    )
    stat_cols = ", ".join(
        f"round(avg(f{i}), 6) AS m{i}, round(stddev_samp(f{i}), 6) AS s{i}"
        for i in range(nf)
    )
    z_cols = ",\n             ".join(
        f"round((f{i} - m{i})/s{i}, 4) AS x{i + 1}" for i in range(nf)
    )
    parts = [
        f"""WITH e AS (
      SELECT vec_id, vec_id % {k} AS fold, CAST(label = 3 AS INT) AS label_bin,
             {feat_cols}
      FROM embeddings
    ), s AS (
      SELECT {stat_cols} FROM e WHERE fold <> {heldout}
    ), z AS (
      SELECT vec_id, fold, label_bin, CAST(label_bin AS DOUBLE) AS y,
             {z_cols}
      FROM e CROSS JOIN s
    ), ztr AS (
      SELECT * FROM z WHERE fold <> {heldout}
    ), w0_ AS (
      SELECT {', '.join(f'0.0 AS w{j}' for j in range(nf + 1))}
    )"""
    ]
    for it in range(1, iters + 1):
        grads = [f"round(avg(({sig} - y)), 6) AS g0"] + [
            f"round(avg(({sig} - y) * {x}), 6) AS g{j + 1}"
            for j, x in enumerate(xs)
        ]
        ups = ", ".join(
            f"round(w{j} - {lr!r}*g{j}, 6) AS w{j}" for j in range(nf + 1)
        )
        parts.append(
            f", g{it}_ AS (\n      SELECT {', '.join(grads)} "
            f"FROM ztr CROSS JOIN w{it - 1}_\n    )"
            f", w{it}_ AS (\n      SELECT {ups} FROM w{it - 1}_ "
            f"CROSS JOIN g{it}_\n    )"
        )
    if final is None:
        final = f"""
    SELECT label_bin, CAST(round({sig}, 6) >= 0.5 AS INT) AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM z CROSS JOIN w{iters}_
    WHERE fold = 0
    GROUP BY label_bin, predicted"""
    parts.append(
        final.replace("__SIG__", sig)
        .replace("__WN__", f"w{iters}_")
        .replace("fold = 0", f"fold = {heldout}")
    )
    return "".join(parts)


@query(
    "logreg_holdout_confusion",
    oracle=_logreg_holdout_oracle(nf=4, lr=2.0, iters=5, k=5),
    tags=("model-training", "classifier", "eval"),
)
def logreg_holdout_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hold-out evaluation of the in-engine logreg trainer — the
    no-leakage contract end to end: standardization statistics AND
    every gradient come only from the train folds (vec_id % 5 ≠ 0),
    then the untouched fold 0 is scored and reduced to a confusion
    matrix. Completes the eval-loop family (held-out perplexity for
    the LM, backtest for the Markov predictor, calibration bins for
    the classifier's probabilities). Whole trajectory hash-checked
    against the unrolled train-only CTE program."""
    from .operators.logreg import logreg_fit, logreg_score, standardize

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("vec_id") % 5).alias("fold"),
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(
        base,
        [f"f{i}" for i in range(4)],
        stats_from=base.where(F.col("fold") != 0),
    )
    train = feats.where(F.col("fold") != 0)
    weights = logreg_fit(train, zcols, "label_bin", lr=2.0, iters=5)
    ev = logreg_score(feats.where(F.col("fold") == 0), zcols, weights)
    return ev.groupBy("label_bin", "predicted").agg(
        F.count("*").alias("n")
    )


_LIFT_FINAL = """
    , scored AS (
      SELECT vec_id, label_bin, round(__SIG__, 6) AS p
      FROM z CROSS JOIN __WN__
      WHERE fold = 0
    ), ranked AS (
      SELECT label_bin,
             row_number() OVER (ORDER BY p DESC, vec_id) AS rn,
             COUNT(*) OVER () AS nr,
             SUM(label_bin) OVER () AS tp
      FROM scored
    ), dec AS (
      SELECT ((rn - 1) * 10) // nr + 1 AS decile, label_bin, nr, tp
      FROM ranked
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(label_bin) AS BIGINT) AS n_positive,
           round(SUM(label_bin) / CAST(MAX(tp) AS DOUBLE), 6)
             AS capture_rate,
           round((SUM(label_bin) / CAST(MAX(tp) AS DOUBLE))
                 / (COUNT(*) / CAST(MAX(nr) AS DOUBLE)), 6) AS lift
    FROM dec GROUP BY decile"""


@query(
    "logreg_decile_lift",
    oracle=_logreg_holdout_oracle(nf=4, lr=2.0, iters=5, k=5, final=_LIFT_FINAL),
    tags=("model-training", "classifier", "eval"),
)
def logreg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table for the hold-out-scored logreg model —
    the targeting-eval artifact (\"the top decile captures X% of all
    positives at Y× random\") that turns a probability score into a
    budget decision. Rides the exact no-leakage hold-out trajectory of
    logreg_holdout_confusion; ranking is fully tie-broken (p DESC,
    id), deciles use the integer rank-bucket formula, rates are
    integer-count ratios. The rank window covers only the HOLD-OUT
    fold (eval-sample-sized, never the corpus)."""
    from pyspark.sql import Window as W

    from .operators.logreg import logreg_fit, logreg_score, standardize

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("vec_id") % 5).alias("fold"),
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(
        base,
        [f"f{i}" for i in range(4)],
        stats_from=base.where(F.col("fold") != 0),
    )
    train = feats.where(F.col("fold") != 0)
    weights = logreg_fit(train, zcols, "label_bin", lr=2.0, iters=5)
    scored = logreg_score(
        feats.where(F.col("fold") == 0), zcols, weights
    ).select("vec_id", "label_bin", "p")
    w = W.orderBy(F.col("p").desc(), "vec_id")
    ranked = scored.select(
        "label_bin",
        F.row_number().over(w).alias("rn"),
    )
    tot = scored.agg(
        F.count("*").alias("nr"), F.sum("label_bin").alias("tp")
    )
    dec = ranked.crossJoin(F.broadcast(tot)).select(
        (F.floor(((F.col("rn") - 1) * 10) / F.col("nr")) + 1)
        .cast("int")
        .alias("decile"),
        "label_bin",
        "nr",
        "tp",
    )
    return dec.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.sum("label_bin").alias("n_positive"),
        F.round(
            F.sum("label_bin") / F.max("tp").cast("double"), 6
        ).alias("capture_rate"),
        F.round(
            (F.sum("label_bin") / F.max("tp").cast("double"))
            / (F.count("*") / F.max("nr").cast("double")),
            6,
        ).alias("lift"),
    )


@query(
    "cluster_purity_nmi",
    oracle="""
    WITH st AS (
      SELECT CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS s
      FROM embeddings
    ), c AS (
      SELECT vec_id // st.s AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings, st WHERE vec_id % st.s = 0
    ), v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, label, centroid_id FROM (
        SELECT v.vec_id, v.label, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), joint AS (
      SELECT centroid_id, label, COUNT(*) AS n_cl FROM assigned GROUP BY 1, 2
    ), nc AS (
      SELECT centroid_id, SUM(n_cl) AS n_c FROM joint GROUP BY 1
    ), nl AS (
      SELECT label, SUM(n_cl) AS n_l FROM joint GROUP BY 1
    ), nn AS (SELECT SUM(n_cl) AS n FROM joint),
    mi AS (
      SELECT CAST(SUM(CAST(round(
               (CAST(n_cl AS DOUBLE) / n)
               * ln((CAST(n AS DOUBLE) * n_cl) / (CAST(n_c AS DOUBLE) * n_l)),
               6) AS DECIMAL(18,6))) AS DOUBLE) AS i
      FROM joint JOIN nc USING (centroid_id) JOIN nl USING (label)
      CROSS JOIN nn
    ), hc AS (
      SELECT CAST(SUM(CAST(round(
               -(CAST(n_c AS DOUBLE) / n) * ln(CAST(n_c AS DOUBLE) / n),
               6) AS DECIMAL(18,6))) AS DOUBLE) AS h
      FROM nc CROSS JOIN nn
    ), hl AS (
      SELECT CAST(SUM(CAST(round(
               -(CAST(n_l AS DOUBLE) / n) * ln(CAST(n_l AS DOUBLE) / n),
               6) AS DECIMAL(18,6))) AS DOUBLE) AS h
      FROM nl CROSS JOIN nn
    ), pur AS (
      SELECT CAST(SUM(mx) AS BIGINT) AS hits FROM (
        SELECT centroid_id, MAX(n_cl) AS mx FROM joint GROUP BY centroid_id
      )
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nc) AS n_clusters,
           (SELECT CAST(n AS BIGINT) FROM nn) AS n_points,
           round((SELECT hits FROM pur) / (SELECT CAST(n AS DOUBLE) FROM nn), 6)
             AS purity,
           round((SELECT i FROM mi)
                 / sqrt((SELECT h FROM hc) * (SELECT h FROM hl)), 6) AS nmi
    """,
    tags=("clustering-eval", "statistics"),
)
def cluster_purity_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering evaluation — purity and normalized mutual
    information of the IVF cell assignment against the embeddings'
    ground-truth labels: the missing eval for the unsupervised
    trainers (k-means/IVF now get the same train→eval closure as
    logreg, the LM, and the Markov predictor). All probabilities are
    integer-count ratios; every entropy/MI term is grid-rounded and
    decimal-summed; NMI uses the sqrt normalization. One joint
    contingency aggregate (clusters×labels rows) drives everything."""
    from .operators.similarity import adaptive_stride, ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    stride = adaptive_stride(emb)
    centroids = (
        emb.where((F.col("vec_id") % stride) == 0)
        .select(
            (F.col("vec_id") / stride).cast("long").alias("centroid_id"),
            F.col("embedding"),
        )
    )
    assigned = ivf_assign(emb, centroids, arrow=oracle_arrow()).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    joint = assigned.groupBy("centroid_id", "label").agg(
        F.count("*").alias("n_cl")
    )
    nc = joint.groupBy("centroid_id").agg(F.sum("n_cl").alias("n_c"))
    nl = joint.groupBy("label").agg(F.sum("n_cl").alias("n_l"))
    nn = joint.agg(F.sum("n_cl").alias("n"))
    mi = (
        joint.join(F.broadcast(nc), "centroid_id")
        .join(F.broadcast(nl), "label")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                F.round(
                    (F.col("n_cl").cast("double") / F.col("n"))
                    * F.log(
                        (F.col("n").cast("double") * F.col("n_cl"))
                        / (F.col("n_c").cast("double") * F.col("n_l"))
                    ),
                    6,
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("i")
        )
    )

    def entropy(df, cnt):
        p = F.col(cnt).cast("double") / F.col("n")
        return (
            df.crossJoin(F.broadcast(nn))
            .agg(
                F.sum(F.round(-p * F.log(p), 6).cast("decimal(18,6)"))
                .cast("double")
                .alias("h")
            )
        )

    hc = entropy(nc, "n_c").select(F.col("h").alias("hc"))
    hl = entropy(nl, "n_l").select(F.col("h").alias("hl"))
    pur = (
        joint.groupBy("centroid_id")
        .agg(F.max("n_cl").alias("mx"))
        .agg(F.sum("mx").alias("hits"))
    )
    ncl = nc.agg(F.count("*").alias("n_clusters"))
    return (
        ncl.crossJoin(nn)
        .crossJoin(pur)
        .crossJoin(mi)
        .crossJoin(hc)
        .crossJoin(hl)
        .select(
            "n_clusters",
            F.col("n").alias("n_points"),
            F.round(
                F.col("hits") / F.col("n").cast("double"), 6
            ).alias("purity"),
            F.round(
                F.col("i") / F.sqrt(F.col("hc") * F.col("hl")), 6
            ).alias("nmi"),
        )
    )


_AUC_FINAL = """
    , scored AS (
      SELECT vec_id, label_bin, round(__SIG__, 6) AS p
      FROM z CROSS JOIN __WN__
      WHERE fold = 0
    ), perp AS (
      SELECT p, COUNT(*) AS cnt, SUM(label_bin) AS pos
      FROM scored GROUP BY p
    ), ranked AS (
      SELECT p, cnt, pos,
             COALESCE(SUM(cnt) OVER (ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
      FROM perp
    ), sums AS (
      SELECT CAST(SUM(CAST(pos * (cum_before + (cnt + 1) / 2.0)
                           AS DECIMAL(38,1))) AS DOUBLE) AS rank_sum,
             CAST(SUM(pos) AS BIGINT) AS np,
             CAST(SUM(cnt - pos) AS BIGINT) AS nn
      FROM ranked
    )
    SELECT np AS n_positive, nn AS n_negative,
           round((rank_sum - np * (np + 1) / 2.0)
                 / (CAST(np AS DOUBLE) * nn), 6) AS auc
    FROM sums"""


@query(
    "logreg_holdout_auc",
    oracle=_logreg_holdout_oracle(nf=4, lr=2.0, iters=5, k=5, final=_AUC_FINAL),
    tags=("model-training", "classifier", "eval"),
)
def logreg_holdout_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the hold-out-scored logreg model via the
    Mann-Whitney rank-sum identity — threshold-free discrimination,
    completing the classifier eval set (confusion, calibration, lift,
    now AUC). Ties on the 1e-6 probability grid get exact MIDRANKS
    (cum_before + (cnt+1)/2 over the DISTINCT-score frame), the rank
    sum accumulates in exact decimal halves, and the final AUC is one
    fixed double expression over integer counts. The cumulative count
    uses ``range_cumsum`` (r11): the score grid bounds the frame at
    1e6+1 rows, but that is still a million-row single-partition sort
    as a global window — 0.01-wide score buckets rank it in parallel
    instead, hash-identical."""
    from .operators.logreg import logreg_fit, logreg_score, standardize
    from .operators.sampling import range_cumsum

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("vec_id") % 5).alias("fold"),
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(
        base,
        [f"f{i}" for i in range(4)],
        stats_from=base.where(F.col("fold") != 0),
    )
    train = feats.where(F.col("fold") != 0)
    weights = logreg_fit(train, zcols, "label_bin", lr=2.0, iters=5)
    scored = logreg_score(
        feats.where(F.col("fold") == 0), zcols, weights
    ).select("label_bin", "p")
    perp = scored.groupBy("p").agg(
        F.count("*").alias("cnt"), F.sum("label_bin").alias("pos")
    )
    ranked = range_cumsum(
        perp, "p", "cnt",
        bucket_expr=F.floor(F.col("p") * 100), out_col="cum_before",
    ).select("p", "cnt", "pos", "cum_before")
    sums = ranked.agg(
        F.sum(
            (
                F.col("pos")
                * (F.col("cum_before") + (F.col("cnt") + 1) / 2.0)
            ).cast("decimal(38,1)")
        )
        .cast("double")
        .alias("rank_sum"),
        F.sum("pos").alias("np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nn"),
    )
    return sums.select(
        F.col("np").alias("n_positive"),
        F.col("nn").alias("n_negative"),
        F.round(
            (F.col("rank_sum") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * F.col("nn")),
            6,
        ).alias("auc"),
    )


@query(
    "embedding_near_dup_ivf_stride50",
    oracle="""
    WITH c AS (
      SELECT vec_id // 50 AS centroid_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id % 50 = 0
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings
    ), assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_dot_product(vv, vv) + list_dot_product(cv, cv)
                                - 2 * list_dot_product(vv, cv), 6),
                          c.centroid_id
               ) AS rn
        FROM v, c
      ) WHERE rn = 1
    ), cells AS (
      SELECT v.vec_id, a.centroid_id, v.vv FROM v JOIN assigned a USING (vec_id)
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.vv, b.vv)
                 / (sqrt(list_dot_product(a.vv, a.vv))
                    * sqrt(list_dot_product(b.vv, b.vv))), 6) AS score
    FROM cells a JOIN cells b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.vv, b.vv)
                / (sqrt(list_dot_product(a.vv, a.vv))
                   * sqrt(list_dot_product(b.vv, b.vv))), 6) >= 0.4
    """,
    tags=("dedup-embedding", "similarity-ivf", "pinned-stride"),
)
def embedding_near_dup_ivf_stride50(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The IVF family's pinned-stride regression twin. Since r8 the
    main `embedding_near_dup_ivf` (and every other IVF/PQ query)
    sizes its index adaptively — stride = ceil(sqrt(N)), derived
    identically by the oracle from COUNT(*) (a fixed stride makes the
    assignment scan N²/stride: 41–59× wall-clock at 10× data,
    SCALE.md). This twin pins centroid_stride=50 against a
    fully-literal unrolled CTE so a regression in the quantizer
    contract itself (dot-identity rounding, centroid tie-break) can't
    hide behind the adaptive-sizing arithmetic. Small-SF only by
    construction."""
    from .operators.similarity import embedding_near_dup_ivf as _near_dup_ivf

    embeddings = load_table(spark, sf_dir, "embeddings")
    return _near_dup_ivf(
        embeddings, threshold=0.4, centroid_stride=50, arrow=oracle_arrow()
    )


@query("embedding_near_dup_arrow", oracle=None, tags=("dedup-embedding", "arrow-matmul"))
def embedding_near_dup_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF near-dup with the Arrow-matmul assignment twin
    (`ivf_assign_arrow`): one BLAS matmul per Arrow batch replaces the
    interpreted per-(vector, centroid) fold — measured 68× faster at
    sf1 with 1.000 assignment agreement (SCALE.md r7). Rows-only by
    design, like the xxhash64 minhash twin: numpy's pairwise/SIMD
    summation order can differ from the sequential fold by an ulp at a
    1e-6 rounding boundary, so the fold-based `embedding_near_dup_ivf`
    stays the hash-exact oracle query and this records the throughput
    path; agreement floor asserted in tests/test_llm_ops.py."""
    from .operators.similarity import (
        adaptive_stride,
        embedding_near_dup_pairs,
        ivf_assign_arrow,
    )

    embeddings = load_table(spark, sf_dir, "embeddings")
    stride = adaptive_stride(embeddings)
    centroids = embeddings.where((F.col("vec_id") % stride) == 0).select(
        (F.col("vec_id") / stride).cast("long").alias("centroid_id"),
        F.col("embedding"),
    )
    assigned = ivf_assign_arrow(embeddings, centroids)
    blocked = embeddings.join(assigned, on="vec_id").select(
        "vec_id", "centroid_id", "embedding"
    )
    return embedding_near_dup_pairs(
        blocked, block_col="centroid_id", threshold=0.4
    )


@query(
    "gopher_repetition_gates",
    oracle="""
    WITH words AS (
      SELECT doc_id, len(text) AS n_chars, string_split(text, ' ') AS w
      FROM documents
    ), g AS (
      SELECT doc_id, n_chars, ns.n AS n,
             unnest(list_transform(
               range(1, len(w) - ns.n + 2),
               i -> array_to_string(w[i:i+ns.n-1], ' '))) AS gram
      FROM words, (SELECT unnest([2, 3, 4, 5, 10]) AS n) ns
      WHERE len(w) >= ns.n
    ), c AS (
      SELECT doc_id, n_chars, n, gram, count(*) AS cnt
      FROM g GROUP BY ALL
    ), r AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id, n ORDER BY cnt DESC, gram) AS rk
      FROM c
    ), pn AS (
      SELECT doc_id, n_chars, n,
             max(CASE WHEN rk = 1 THEN cnt * len(gram) END) AS top_chars,
             sum(CASE WHEN cnt > 1 THEN (cnt - 1) * len(gram)
                      ELSE 0 END) AS dup_chars
      FROM r GROUP BY doc_id, n_chars, n
    ), o AS (
      SELECT doc_id,
             CAST(max(n_chars) AS INT) AS n_chars,
             round(coalesce(max(CASE WHEN n = 2 THEN top_chars END), 0)
                   / greatest(max(n_chars), 1), 6) AS top_2gram_char_frac,
             round(coalesce(max(CASE WHEN n = 3 THEN top_chars END), 0)
                   / greatest(max(n_chars), 1), 6) AS top_3gram_char_frac,
             round(coalesce(max(CASE WHEN n = 4 THEN top_chars END), 0)
                   / greatest(max(n_chars), 1), 6) AS top_4gram_char_frac,
             round(coalesce(max(CASE WHEN n = 5 THEN dup_chars END), 0)
                   / greatest(max(n_chars), 1), 6) AS dup_5gram_char_frac,
             round(coalesce(max(CASE WHEN n = 10 THEN dup_chars END), 0)
                   / greatest(max(n_chars), 1), 6) AS dup_10gram_char_frac
      FROM pn GROUP BY doc_id
    )
    SELECT *,
           (top_2gram_char_frac <= 0.20 AND top_3gram_char_frac <= 0.18
            AND top_4gram_char_frac <= 0.16 AND dup_5gram_char_frac <= 0.15
            AND dup_10gram_char_frac <= 0.10) AS keep
    FROM o
    """,
    tags=("llm", "quality", "gopher", "repetition", "curation"),
)
def gopher_repetition_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher repetition filter battery (Rae et al. 2021
    A1.1) per document: fraction of characters in the most frequent
    2/3/4-gram, fraction of characters in duplicate occurrences of
    5/10-grams, and the composite keep flag at the published
    thresholds — the standard pre-training curation gates beyond the
    single duplicate-share `repetition_ratio_documents` already
    computes. One (n, gram) explode covers all five n values; the
    shuffle carries fixed-width gram counts; every ratio divides
    exact integers, so the battery hash-matches its SQL oracle."""
    from .operators.textstats import gopher_repetition_gates

    documents = load_table(spark, sf_dir, "documents")
    out = gopher_repetition_gates(documents, "text", "doc_id")
    return out.select(
        "doc_id",
        F.col("n_chars").cast("int").alias("n_chars"),
        "top_2gram_char_frac",
        "top_3gram_char_frac",
        "top_4gram_char_frac",
        "dup_5gram_char_frac",
        "dup_10gram_char_frac",
        "keep",
    )


_HTML_PREFIX = (
    "<html><head><title>doc</title><style>p {color: #111}</style></head>"
    "<body><nav>Home | About | <a href=\"/c\">Contact</a></nav><h1>"
)
_HTML_MID = "</h1><p>Tom &amp; Jerry &lt;3 wrote:</p><p>"
_HTML_SUFFIX = (
    "</p><aside>SUBSCRIBE NOW</aside>"
    "<footer>(c) Example &amp; Co. All rights reserved.</footer></body></html>"
)


@query(
    "html_strip_boilerplate",
    oracle=f"""
    WITH pages AS (
      SELECT doc_id,
             '{_HTML_PREFIX}' || source || '{_HTML_MID}' || text || '{_HTML_SUFFIX}'
               AS page
      FROM documents
    ),
    cleaned AS (
      SELECT doc_id, length(page) AS page_len,
             trim(regexp_replace(replace(replace(replace(replace(replace(replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(page, '<script[^>]*>.*?</script>', ' ', 'g'), '<style[^>]*>.*?</style>', ' ', 'g'), '<nav[^>]*>.*?</nav>', ' ', 'g'), '<footer[^>]*>.*?</footer>', ' ', 'g'), '<aside[^>]*>.*?</aside>', ' ', 'g'), '<[^>]*>', ' ', 'g'), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'), '  *', ' ', 'g')) AS clean
      FROM pages
    )
    SELECT doc_id, page_len,
           CAST(length(clean) AS BIGINT) AS clean_len,
           round(length(clean) / CAST(page_len AS DOUBLE), 6) AS kept_ratio,
           substr(clean, 1, 60) AS clean_prefix,
           md5(clean) AS clean_md5
    FROM cleaned
    ORDER BY doc_id
    """,
    tags=("llm-pipeline", "cleaning", "html", "boilerplate"),
)
def html_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style web-corpus cleaning, closed-loop: each document is
    deterministically wrapped into an HTML page (chrome nav, style
    block, entity-escaped lead-in, aside/footer boilerplate) and the
    REAL cleaning operator (``operators/textstats.py:strip_html``)
    extracts the training text back out — boilerplate blocks dropped
    wholesale, tags stripped, entities unescaped in a fixed order,
    whitespace collapsed. The same synthesize-then-operate trick the
    multimodal codecs use: the operator under test is real, the input
    is reproducible in both engines, so the cleaned text hash-checks
    end to end. Row-local JVM regexp work - zero shuffle, scales with
    input bytes.
    """
    from .operators.textstats import strip_html

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    page = F.concat(
        F.lit(_HTML_PREFIX),
        F.col("source"),
        F.lit(_HTML_MID),
        F.col("text"),
        F.lit(_HTML_SUFFIX),
    )
    staged = docs.select(
        "doc_id", F.length(page).alias("page_len"), strip_html(page).alias("s")
    )
    return staged.select(
        "doc_id",
        "page_len",
        F.length("s.clean").cast("long").alias("clean_len"),
        F.col("s.kept_ratio").alias("kept_ratio"),
        F.substring("s.clean", 1, 60).alias("clean_prefix"),
        F.md5(F.col("s.clean")).alias("clean_md5"),
    ).orderBy("doc_id")


_SFT_SYSTEM = "<|system|>Be concise and helpful.<|end|>"


@query(
    "sft_chat_template_render",
    oracle=f"""
    WITH turns AS (
      SELECT source, text,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
      FROM documents
    ),
    capped AS (
      SELECT source, rnk,
             CASE WHEN rnk % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
             '<|' || CASE WHEN rnk % 2 = 1 THEN 'user' ELSE 'assistant' END
                  || '|>' || text || '<|end|>' AS rendered
      FROM turns WHERE rnk <= 8
    ),
    offs AS (
      SELECT source, rnk, role, rendered,
             length('{_SFT_SYSTEM}')
               + COALESCE(SUM(length(rendered)) OVER (PARTITION BY source
                   ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS char_start
      FROM capped
    ),
    conv AS (
      SELECT source,
             md5('{_SFT_SYSTEM}' || string_agg(rendered, '' ORDER BY rnk)) AS conv_md5,
             CAST(length('{_SFT_SYSTEM}') + sum(length(rendered)) AS BIGINT) AS conv_len
      FROM offs GROUP BY source
    )
    SELECT o.source, CAST(o.rnk AS BIGINT) AS turn_idx, o.role,
           CAST(o.char_start AS BIGINT) AS char_start,
           CAST(o.char_start + length(o.rendered) AS BIGINT) AS char_end,
           CAST(o.role = 'assistant' AS BOOLEAN) AS loss_mask,
           c.conv_md5, c.conv_len
    FROM offs o JOIN conv c ON o.source = c.source
    ORDER BY o.source, turn_idx
    """,
    tags=("llm-pipeline", "sft", "chat-template", "loss-mask"),
)
def sft_chat_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-tuning data prep: documents grouped by source become
    alternating user/assistant turns (capped at 8), rendered into a
    chat template with a system preamble, with per-turn CHARACTER SPAN
    OFFSETS into the rendered conversation and the loss mask
    (assistant turns train, user/system turns do not) - exactly the
    metadata an SFT tokenizer needs to build labels without re-parsing
    the template. The conversation hash and total length ride along so
    the full rendering (an ordered string aggregation) is hash-checked,
    not just the offsets. Offsets come from a running window sum of
    rendered turn lengths - one shuffle on the conversation key; the
    per-turn frame is ROWS UNBOUNDED PRECEDING TO 1 PRECEDING (linear,
    not the quadratic re-scan shape plan_doctor flags).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w_rnk = Window.partitionBy("source").orderBy("doc_id")
    role = F.when(F.col("rnk") % 2 == 1, F.lit("user")).otherwise(F.lit("assistant"))
    capped = (
        docs.withColumn("rnk", F.row_number().over(w_rnk))
        .where(F.col("rnk") <= 8)
        .select(
            "source",
            "rnk",
            role.alias("role"),
            F.concat(
                F.lit("<|"), role, F.lit("|>"), F.col("text"), F.lit("<|end|>")
            ).alias("rendered"),
        )
    )
    w_run = (
        Window.partitionBy("source")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sys_len = F.length(F.lit(_SFT_SYSTEM))
    offs = capped.withColumn(
        "char_start",
        sys_len + F.coalesce(F.sum(F.length("rendered")).over(w_run), F.lit(0)),
    )
    conv = (
        offs.groupBy("source")
        .agg(
            F.md5(
                F.concat(
                    F.lit(_SFT_SYSTEM),
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("rnk", "rendered"))
                            ),
                            lambda s: s.rendered,
                        ),
                        "",
                    ),
                )
            ).alias("conv_md5"),
            (sys_len + F.sum(F.length("rendered"))).cast("long").alias("conv_len"),
        )
    )
    return (
        offs.join(conv, "source")
        .select(
            "source",
            F.col("rnk").cast("long").alias("turn_idx"),
            "role",
            F.col("char_start").cast("long").alias("char_start"),
            (F.col("char_start") + F.length("rendered")).cast("long").alias("char_end"),
            (F.col("role") == "assistant").alias("loss_mask"),
            "conv_md5",
            "conv_len",
        )
        .orderBy("source", "turn_idx")
    )


@query(
    "zipf_rank_fit_tokens",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok
      WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM counts
    ),
    xy AS (
      SELECT CAST(round(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(28,6)) AS x,
             CAST(round(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(28,6)) AS y
      FROM ranked WHERE rnk <= 500
    ),
    sums AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_tokens_fit,
           CAST(floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000.0)
                AS BIGINT) AS zipf_slope_e6,
           CAST(floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                      * 1000000.0) AS BIGINT) AS zipf_intercept_e6,
           CAST(floor(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1000000.0)
                AS BIGINT) AS r2_e6
    FROM sums
    """,
    tags=("llm-pipeline", "corpus-stats", "zipf", "regression"),
)
def zipf_rank_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: log-log OLS of token
    frequency against frequency rank (top 500 types) - the standard
    corpus-health diagnostic (natural text slopes near -1; synthetic
    or templated corpora flatten). The OLS moments are summed in EXACT
    DECIMAL over logs rounded to the 1e-6 grid - the repo's
    addition-order-free pattern (``queries.dec_sum``) - because
    built-in regr_slope accumulates raw doubles whose partial-
    aggregation order differs between engines. Slope, intercept and
    R^2 derive from those exact moments in identical IEEE op order and
    ship as floor-scaled e6 integers: floor() of a bit-identical double
    is engine-independent, where round()'s half-way tie handling is not
    (observed live on the intercept at sf0.01).
    Scale: token counting is the map-side-combinable wordcount; the
    global rank window runs over the VOCABULARY (types, not tokens),
    which is log-scale in corpus size.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token")).where(
        F.col("token") != ""
    )
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    ranked = counts.select(
        "cnt",
        F.row_number().over(Window.orderBy(F.desc("cnt"), "token")).alias("rnk"),
    ).where(F.col("rnk") <= 500)
    x = F.round(F.log(F.col("rnk").cast("double")), 6).cast("decimal(28,6)")
    y = F.round(F.log(F.col("cnt").cast("double")), 6).cast("decimal(28,6)")
    xy = ranked.select(x.alias("x"), y.alias("y"))
    sums = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    e6 = F.lit(1_000_000.0)
    return sums.select(
        n.cast("long").alias("n_tokens_fit"),
        F.floor(slope * e6).cast("long").alias("zipf_slope_e6"),
        F.floor((sy - slope * sx) / n * e6).cast("long").alias("zipf_intercept_e6"),
        F.floor(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            * e6
        )
        .cast("long")
        .alias("r2_e6"),
    )


@query(
    "compression_ratio_quality",
    oracle=None,  # zlib has no SQL twin; ordering floors in pytest
    tags=("llm-pipeline", "quality", "compression", "rows-only"),
)
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality filter (``operators/textstats.py:
    compression_quality``): flag documents whose zlib ratio is below
    the repetitive-text threshold — the one classic corpus-quality
    heuristic that is genuinely non-SQL (DuckDB has no deflate), so
    this entry is rows-only by design; the signal's monotonicity
    (repeated text compresses strictly better than shuffled text) is
    floor-asserted in tests/test_llm_ops.py. Arrow-batched; one
    narrow-output pass.
    """
    from .operators.textstats import compression_quality

    docs = load_table(spark, sf_dir, "documents")
    scored = compression_quality(docs, "text", "doc_id")
    return scored.select(
        "doc_id",
        "raw_len",
        "compressed_len",
        F.round("ratio", 6).alias("ratio"),
        (F.col("ratio") < 0.45).alias("too_repetitive"),
    ).orderBy("doc_id")


_TAU = 6.283185307179586
_DFT_N = 128  # samples per synthetic clip
_DFT_BINS = (3, 4, 5, 6, 7)  # probe bins; truth lands inside


@query(
    "audio_tone_detect_dft",
    oracle=f"""
    WITH clips AS (
      SELECT doc_id, 3 + doc_id % 5 AS true_bin FROM documents
    ),
    samples AS (
      SELECT c.doc_id, c.true_bin, b.bin, n.n,
             CAST(floor(1000.0 * sin({_TAU!r} * (c.true_bin / {float(_DFT_N)!r}) * n.n))
                  AS BIGINT) AS x
      FROM clips c
      CROSS JOIN (SELECT unnest(ARRAY[3,4,5,6,7]) AS bin) b
      CROSS JOIN (SELECT unnest(generate_series(0, {_DFT_N - 1})) AS n) n
    ),
    bins AS (
      SELECT doc_id, true_bin, bin,
             CAST(sum(CAST(round(x * cos({_TAU!r} * (bin / {float(_DFT_N)!r}) * n), 6)
                           AS DECIMAL(28,6))) AS DOUBLE) AS ck,
             CAST(sum(CAST(round(x * sin({_TAU!r} * (bin / {float(_DFT_N)!r}) * n), 6)
                           AS DECIMAL(28,6))) AS DOUBLE) AS sk
      FROM samples GROUP BY 1, 2, 3
    ),
    powered AS (
      SELECT doc_id, true_bin, bin,
             CAST(floor((ck * ck + sk * sk) / 1000.0) AS BIGINT) AS power_k,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY CAST(floor((ck * ck + sk * sk) / 1000.0)
                                              AS BIGINT) DESC, bin) AS rnk
      FROM bins
    )
    SELECT doc_id, CAST(true_bin AS BIGINT) AS true_bin,
           CAST(bin AS BIGINT) AS detected_bin, power_k AS peak_power,
           CAST(bin = true_bin AS BOOLEAN) AS detected_ok
    FROM powered WHERE rnk = 1
    ORDER BY doc_id
    """,
    tags=("multimodal", "audio", "dft", "frequency-domain"),
)
def audio_tone_detect_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain audio analysis - the DFT-bin companion to the
    time-domain ``multimodal_audio_energy`` (RMS/peak windows): each
    document gets a deterministic 128-sample tone clip (bin 3-7 by
    doc_id), and the query measures spectral energy at five probe bins
    via the closed-form single-bin DFT - power_k = (sum x_n cos(w_k n))^2
    + (sum x_n sin(w_k n))^2, the same quantity Goertzel's recurrence
    computes, expressed as two weighted sums so it stays declarative
    (the recurrence itself is sequential and would need a UDF). The
    detected bin (argmax with low-bin tiebreak) must equal the
    synthesized bin - a real tone detector, oracle-checked end to end.
    Determinism: samples floor-quantize identical doubles; DFT terms
    round to the 1e-6 grid and sum in exact decimal
    (addition-order-free); powers floor-scale.
    Scale (r14 optimization): the synthetic clip is a pure function of
    ``true_bin`` alone, so every DFT sum is grouped by its true
    functional key - the spectra are computed ONCE per distinct
    (true_bin, probe bin) pair on a <=25-row grid (identical decimal
    term sets, so ck/sk/power and the per-doc argmax are bit-exact
    against the per-doc formulation the oracle replays) and re-attached
    to the corpus with one broadcast join. Work drops from
    docs x 5 bins x 128 trig rows to O(docs) + a constant-size grid;
    with real (non-degenerate) audio the per-clip expansion returns,
    which is what the oracle's per-doc formulation documents.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.lit(3) + F.col("doc_id") % 5).alias("true_bin")
    )
    grid = docs.select("true_bin").distinct()
    samples = (
        grid.withColumn("bin", F.explode(F.array(*[F.lit(b) for b in _DFT_BINS])))
        .withColumn("n", F.explode(F.sequence(F.lit(0), F.lit(_DFT_N - 1))))
        .withColumn(
            "x",
            F.floor(
                F.lit(1000.0)
                * F.sin(
                    F.lit(_TAU)
                    * (F.col("true_bin") / F.lit(float(_DFT_N)))
                    * F.col("n")
                )
            ).cast("long"),
        )
    )
    w = F.lit(_TAU) * (F.col("bin") / F.lit(float(_DFT_N))) * F.col("n")
    bins = samples.groupBy("true_bin", "bin").agg(
        F.sum(F.round(F.col("x") * F.cos(w), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("ck"),
        F.sum(F.round(F.col("x") * F.sin(w), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sk"),
    )
    power = F.floor(
        (F.col("ck") * F.col("ck") + F.col("sk") * F.col("sk")) / F.lit(1000.0)
    ).cast("long")
    # Per-true_bin argmax == the per-doc argmax of the original
    # formulation (all of a doc's probe rows share its true_bin).
    ranked = bins.withColumn("power_k", power).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("true_bin").orderBy(F.desc("power_k"), "bin")
        ),
    )
    peaks = ranked.where(F.col("rnk") == 1).select(
        "true_bin",
        F.col("bin").alias("_det_bin"),
        F.col("power_k").alias("peak_power"),
    )
    return (
        docs.join(F.broadcast(peaks), "true_bin")
        .select(
            "doc_id",
            F.col("true_bin").cast("long").alias("true_bin"),
            F.col("_det_bin").cast("long").alias("detected_bin"),
            "peak_power",
            (F.col("_det_bin") == F.col("true_bin")).alias("detected_ok"),
        )
        .orderBy("doc_id")
    )


@query(
    "weighted_sample_without_replacement",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars AS weight,
             ln((CAST('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)
                      AS BIGINT) + 0.5) / 4294967296.0) / n_chars AS es_logkey
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, weight, es_logkey,
             CAST(row_number() OVER (ORDER BY es_logkey DESC, doc_id) AS BIGINT)
               AS sample_rank
      FROM keyed
    )
    SELECT sample_rank, doc_id, weight,
           CAST(floor(es_logkey * 1000000000.0) AS BIGINT) AS es_logkey_e9
    FROM ranked WHERE sample_rank <= 50
    ORDER BY sample_rank
    """,
    tags=("llm-pipeline", "sampling", "weighted", "efraimidis-spirakis"),
)
def weighted_sample_without_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis A-Res weighted sampling WITHOUT replacement:
    every document draws key u^(1/w) (here in log space, ln(u)/w, a
    monotone transform) from a deterministic md5-uniform, and the
    global top-k by key IS an exact weighted sample - the one-pass,
    shuffle-light distributed algorithm for "sample 50 docs
    proportional to length" (the existing samplers cover hash splits,
    quotas and temperature MIXTURES; this adds exact
    without-replacement draws). Longer documents win proportionally
    more often, yet no document repeats. Determinism: the uniform
    sits on the exact 2^-33 grid, ln is the round/floor-masked libm
    class, the key ships floor-scaled at 1e-9. Scale: per-row key
    computation + one TakeOrderedAndProject - no full sort, no
    replacement bookkeeping, mergeable across partitions by
    construction (the top-k of partition top-k's is the global
    top-k).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").where(
        F.col("n_chars") > 0
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").alias("weight"),
        (F.log(u) / F.col("n_chars")).alias("es_logkey"),
    )
    # Top-50 via sort+limit → TakeOrderedAndProject (per-partition
    # partial top-k, merged): the r11 fix that makes the docstring's
    # "no full sort" claim true — the previous partition-less
    # row_number window sorted the whole corpus on one task before the
    # rank<=50 filter. The rank window now sees only the 50 survivors.
    top = keyed.orderBy(F.desc("es_logkey"), "doc_id").limit(50)
    ranked = top.withColumn(
        "sample_rank",
        F.row_number()
        .over(Window.orderBy(F.desc("es_logkey"), "doc_id"))
        .cast("long"),
    )
    return ranked.select(
        "sample_rank",
        "doc_id",
        "weight",
        F.floor(F.col("es_logkey") * F.lit(1_000_000_000.0)).cast("long").alias(
            "es_logkey_e9"
        ),
    ).orderBy("sample_rank")


@query(
    "inverted_index_postings",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    occs AS (
      SELECT term, CAST(count(*) AS BIGINT) AS cf FROM tok
      WHERE term <> '' GROUP BY term
    ),
    posting AS (
      SELECT term, doc_id FROM tok WHERE term <> '' GROUP BY term, doc_id
    ),
    numbered AS (
      SELECT term, doc_id,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rnk,
             doc_id - lag(doc_id, 1, 0) OVER (PARTITION BY term ORDER BY doc_id)
               AS gap
      FROM posting
    ),
    lists AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS df,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rnk)
               FILTER (rnk <= 16) AS postings_head,
             string_agg(CAST(gap AS VARCHAR), ',' ORDER BY rnk)
               FILTER (rnk <= 16) AS gaps_head
      FROM numbered GROUP BY term
    )
    SELECT l.term, l.df, o.cf, l.postings_head, l.gaps_head
    FROM lists l JOIN occs o ON l.term = o.term
    ORDER BY l.df DESC, l.term
    LIMIT 200
    """,
    tags=("llm-pipeline", "retrieval", "inverted-index", "postings"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction - the serving-side artifact behind
    the BM25/RAG retrieval queries (``bm25_rank_documents`` SCORES
    with term stats; this BUILDS the index): per term, document
    frequency, collection frequency, and the sorted posting list with
    DELTA-ENCODED gaps (the compression transform real posting lists
    ship with - gaps are small and varint-friendly where absolute ids
    are not). Heads are emitted as joined strings (16 entries) so the
    result is engine-canonical; df/cf cover the full list. Scale: the
    posting sort is a per-term window over DISTINCT (term, doc) pairs
    - hash-partitioned by term, the classic build; top-200-by-df
    bounds the driver. At 100 TB posting lists shard by (term,
    doc-range) exactly as this plan partitions them.
    """
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
    )
    occs = tok.groupBy("term").agg(F.count("*").alias("cf"))
    posting = tok.groupBy("term", "doc_id").agg(F.lit(1).alias("_one")).drop("_one")
    w = Window.partitionBy("term").orderBy("doc_id")
    numbered = posting.select(
        "term",
        "doc_id",
        F.row_number().over(w).alias("rnk"),
        (F.col("doc_id") - F.lag("doc_id", 1, 0).over(w)).alias("gap"),
    )
    # collect_list drops nulls, so the when() caps per-term aggregate
    # state at 16 structs BEFORE the shuffle - a posting list with
    # millions of entries never materializes as one array
    head = F.array_sort(
        F.collect_list(
            F.when(
                F.col("rnk") <= 16,
                F.struct("rnk", F.col("doc_id").alias("v"), "gap"),
            )
        )
    )
    lists = numbered.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_join(
            F.transform(head, lambda s: s.v.cast("string")), ","
        ).alias("postings_head"),
        F.array_join(
            F.transform(head, lambda s: s.gap.cast("string")), ","
        ).alias("gaps_head"),
    )
    return (
        lists.join(occs, "term")
        .select("term", "df", "cf", "postings_head", "gaps_head")
        .orderBy(F.desc("df"), "term")
        .limit(200)
    )


@query(
    "collation_case_insensitive_vocab",
    oracle="""
    WITH tok AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(t) ELSE t END AS term
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE t <> ''
    ),
    grouped AS (
      SELECT lower(term) AS folded,
             min(term) AS canonical,
             CAST(count(DISTINCT term) AS BIGINT) AS n_variants,
             CAST(count(*) AS BIGINT) AS n_total
      FROM tok GROUP BY 1
    )
    SELECT canonical, n_variants, n_total
    FROM grouped
    ORDER BY n_total DESC, canonical
    LIMIT 100
    """,
    tags=("sql-surface", "collation", "spark4", "vocabulary"),
)
def collation_case_insensitive_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATED STRINGS through the engine surface: vocabulary
    counting over case-noised tokens (even docs shout in upper case)
    grouped under the UTF8_LCASE collation - the engine feature that
    makes case-insensitive grouping/joining a COLUMN PROPERTY instead
    of a scattering of lower() calls (and at scale, lets the optimizer
    keep statistics and shuffle partitioning on the collated key).
    The group key a collated groupBy surfaces is an arbitrary variant,
    so the output canonicalizes deterministically: the binary-collation
    MIN of the variants (upper sorts before lower in ASCII). DuckDB
    has no collation DDL, so the oracle folds with lower() - for the
    ASCII corpus the two semantics provably coincide, which is exactly
    the equivalence being hash-checked.
    """
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .select(
            F.when(F.col("doc_id") % 2 == 0, F.upper("t"))
            .otherwise(F.col("t"))
            .alias("term")
        )
    )
    grouped = tok.groupBy(
        F.collate(F.col("term"), "UTF8_LCASE").alias("folded")
    ).agg(
        F.min(F.collate(F.col("term"), "UTF8_BINARY")).alias("canonical"),
        F.count_distinct(F.collate(F.col("term"), "UTF8_BINARY")).alias("n_variants"),
        F.count("*").alias("n_total"),
    )
    return (
        grouped.select(
            F.collate(F.col("canonical"), "UTF8_BINARY").alias("canonical"),
            "n_variants",
            "n_total",
        )
        .orderBy(F.desc("n_total"), "canonical")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing (multimodal near-dup)
# ---------------------------------------------------------------------------

# Shared closed-form image synthesis for the perceptual-hash queries:
# every doc gets a deterministic grayscale gradient whose class
# (doc_id % 40) fixes dims + gradient direction and whose variant
# ((doc_id // 40) % 4) toggles a sparse pixel mask by +128 — so docs
# of one class are near-identical images (small Hamming distance)
# while classes differ. The SQL oracle recomputes every pixel from the
# same formula; the Spark path round-trips REAL bytes (encode BMP →
# sniffed decode → hash).
_IMG_PX_CTE = """
    d AS (
      SELECT doc_id, doc_id % 40 AS cls, (doc_id // 40) % 4 AS var
      FROM documents WHERE doc_id < {max_doc}
    ), dims AS (
      SELECT doc_id, cls, var,
             8 + (cls % 5) * 2 AS h, 8 + ((cls * 3) % 5) * 2 AS w,
             3 + cls % 5 AS ga, 5 + cls % 7 AS gb
      FROM d
    ), flat AS (
      SELECT doc_id, cls, var, h, w, ga, gb,
             unnest(range(0, h * w)) AS i
      FROM dims
    ), px AS (
      SELECT doc_id, h, w, i // w AS r, i % w AS c,
             CASE WHEN i % 17 = var * 3
                  THEN ((cls * 37 + (i // w) * ga * 7 + (i % w) * gb * 3)
                        % 256 + 128) % 256
                  ELSE (cls * 37 + (i // w) * ga * 7 + (i % w) * gb * 3) % 256
             END AS g
      FROM flat
    ), tot AS (
      SELECT doc_id, SUM(g) AS st, COUNT(*) AS nt FROM px GROUP BY doc_id
    ), ab AS (
      SELECT doc_id, (r * 8) // h AS br, (c * 8) // w AS bc,
             SUM(g) AS sb, COUNT(*) AS nb
      FROM px GROUP BY 1, 2, 3
    ), abits AS (
      SELECT ab.doc_id, br * 8 + bc AS k,
             CASE WHEN sb * nt > st * nb THEN 1 ELSE 0 END AS bit
      FROM ab JOIN tot USING (doc_id)
    ), apack AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN k < 32 THEN CAST(bit AS BIGINT) << (31 - k)
                 ELSE 0 END) AS BIGINT) AS ahi,
        CAST(SUM(CASE WHEN k >= 32 THEN CAST(bit AS BIGINT) << (63 - k)
                 ELSE 0 END) AS BIGINT) AS alo
      FROM abits GROUP BY doc_id
    ), dgrid AS (
      SELECT doc_id, unnest(range(0, 72)) AS k9 FROM dims
    ), d9 AS (
      SELECT doc_id, (r * 8) // h AS br, (c * 9) // w AS bc,
             SUM(g) AS sb, COUNT(*) AS nb
      FROM px GROUP BY 1, 2, 3
    ), d9f AS (
      SELECT g.doc_id, g.k9 // 9 AS br, g.k9 % 9 AS bc,
             COALESCE(d9.sb, 0) AS sb, COALESCE(d9.nb, 0) AS nb
      FROM dgrid g LEFT JOIN d9
        ON d9.doc_id = g.doc_id AND d9.br = g.k9 // 9 AND d9.bc = g.k9 % 9
    ), dbits AS (
      SELECT a.doc_id, a.br * 8 + a.bc AS k,
             CASE WHEN a.sb * b.nb > b.sb * a.nb THEN 1 ELSE 0 END AS bit
      FROM d9f a JOIN d9f b
        ON a.doc_id = b.doc_id AND a.br = b.br AND b.bc = a.bc + 1
      WHERE a.bc < 8
    ), dpack AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN k < 32 THEN CAST(bit AS BIGINT) << (31 - k)
                 ELSE 0 END) AS BIGINT) AS dhi,
        CAST(SUM(CASE WHEN k >= 32 THEN CAST(bit AS BIGINT) << (63 - k)
                 ELSE 0 END) AS BIGINT) AS dlo
      FROM dbits GROUP BY doc_id
    )
"""


def _synth_image_hash_frame(spark: SparkSession, sf_dir: str, max_doc: int):
    """doc_id < max_doc → REAL BMP round-trip → perceptual hashes.

    Synthesizes the deterministic gradient image per doc, encodes it
    as actual BMP bytes, decodes through the format-sniffed codec and
    hashes the decoded pixels (operators.multimodal.image_hash_bits) —
    the full production path, just with a generated payload."""

    def build(batches):
        import numpy as np

        from .operators.multimodal import (
            decode_image_pixels,
            encode_bmp,
            image_hash_bits,
        )

        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [],
                "ahash_hi": [], "ahash_lo": [], "dhash_hi": [], "dhash_lo": [],
            }
            for i in pdf["doc_id"]:
                i = int(i)
                cls, var = i % 40, (i // 40) % 4
                h, w = 8 + (cls % 5) * 2, 8 + ((cls * 3) % 5) * 2
                ga, gb = 3 + cls % 5, 5 + cls % 7
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                g0 = (cls * 37 + r * ga * 7 + c * gb * 3) % 256
                mask = (r * w + c) % 17 == var * 3
                g = np.where(mask, (g0 + 128) % 256, g0).astype(np.uint8)
                px = decode_image_pixels(encode_bmp(np.stack([g, g, g], axis=2)))
                ahi, alo, dhi, dlo = image_hash_bits(px)
                rows["doc_id"].append(i)
                rows["width"].append(int(px.shape[1]))
                rows["height"].append(int(px.shape[0]))
                rows["ahash_hi"].append(ahi)
                rows["ahash_lo"].append(alo)
                rows["dhash_hi"].append(dhi)
                rows["dhash_lo"].append(dlo)
            import pandas as pd

            yield pd.DataFrame(rows)

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < max_doc)
    )
    return docs.mapInPandas(
        build,
        "doc_id long, width int, height int, ahash_hi long, ahash_lo long,"
        " dhash_hi long, dhash_lo long",
    )


@query(
    "image_perceptual_hashes",
    oracle="WITH " + _IMG_PX_CTE.format(max_doc=2000) + """
    SELECT a.doc_id,
           CAST(dims.w AS INT) AS width, CAST(dims.h AS INT) AS height,
           printf('%08x%08x', ahi, alo) AS ahash,
           printf('%08x%08x', dhi, dlo) AS dhash
    FROM apack a JOIN dpack USING (doc_id) JOIN dims USING (doc_id)
    """,
    tags=("multimodal", "perceptual-hash", "dedup"),
)
def image_perceptual_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aHash + dHash per image over the REAL codec round-trip
    (encode BMP → sniffed decode → all-integer hash), hash-verified
    bit-for-bit against an oracle that recomputes every pixel, block
    sum and comparison in SQL. O(pixels) per row, zero shuffle — the
    hash rides the scan, which is what makes image near-dup feasible
    inside a 100 TB multimodal curation pass."""
    frame = _synth_image_hash_frame(spark, sf_dir, 2000)
    return frame.select(
        "doc_id",
        "width",
        "height",
        F.format_string("%08x%08x", "ahash_hi", "ahash_lo").alias("ahash"),
        F.format_string("%08x%08x", "dhash_hi", "dhash_lo").alias("dhash"),
    )


@query(
    "image_ahash_neardup",
    oracle="WITH " + _IMG_PX_CTE.format(max_doc=400) + """
    , bands AS (
      SELECT doc_id, ahi, alo, unnest(range(0, 4)) AS j FROM apack
    ), keyed AS (
      SELECT doc_id, ahi, alo, j,
             CASE j WHEN 0 THEN (ahi >> 16) & 65535
                    WHEN 1 THEN ahi & 65535
                    WHEN 2 THEN (alo >> 16) & 65535
                    ELSE alo & 65535 END AS v
      FROM bands
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.ahi AS ahi_a, a.alo AS alo_a, b.ahi AS ahi_b, b.alo AS alo_b
      FROM keyed a JOIN keyed b
        ON a.j = b.j AND a.v = b.v AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ahi_a, ahi_b))
                + bit_count(xor(alo_a, alo_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(ahi_a, ahi_b)) + bit_count(xor(alo_a, alo_b)) <= 6
    """,
    tags=("multimodal", "perceptual-hash", "dedup", "lsh"),
)
def image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs by banded aHash: split each 64-bit aHash
    into four 16-bit bands, block candidate pairs on any equal band
    (the standard LSH shuffle — O(rows) per band, never all-pairs),
    then keep pairs within Hamming distance 6 (JVM bit_count over
    xor'd halves). Banding guarantees recall for Hamming <= 3 (four
    bands, pigeonhole) and the oracle applies the identical banding,
    so the output is hash-exact, not just statistically close."""
    frame = _synth_image_hash_frame(spark, sf_dir, 400)
    # posexplode gives the band index j alongside the value
    keyed = frame.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.posexplode(
            F.array(
                F.shiftright("ahash_hi", 16).bitwiseAND(65535),
                F.col("ahash_hi").bitwiseAND(65535),
                F.shiftright("ahash_lo", 16).bitwiseAND(65535),
                F.col("ahash_lo").bitwiseAND(65535),
            )
        ).alias("j", "v"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash_hi").alias("ahi_a"),
            F.col("a.ahash_lo").alias("alo_a"),
            F.col("b.ahash_hi").alias("ahi_b"),
            F.col("b.ahash_lo").alias("alo_b"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("ahi_a").bitwiseXOR(F.col("ahi_b"))
    ) + F.bit_count(F.col("alo_a").bitwiseXOR(F.col("alo_b")))
    return cand.select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    ).where(F.col("hamming") <= 6)


@query(
    "isotonic_calibration_orders",
    oracle="""
    WITH bins AS (
      SELECT CAST(floor(o_totalprice / 30000) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos
      FROM orders GROUP BY 1
    ), pref AS (
      SELECT bin, n, pos,
             SUM(n) OVER (ORDER BY bin) AS cw,
             SUM(pos) OVER (ORDER BY bin) AS cp
      FROM bins
    ), pairs AS (
      SELECT a.bin AS j, b.bin AS k,
             CAST(b.cp - (a.cp - a.pos) AS DOUBLE)
               / (b.cw - (a.cw - a.n)) AS seg_avg
      FROM pref a JOIN pref b ON a.bin <= b.bin
    ), m1 AS (
      SELECT i.bin, p.j, MIN(p.seg_avg) AS mn
      FROM pairs p JOIN bins i ON p.j <= i.bin AND p.k >= i.bin
      GROUP BY i.bin, p.j
    ), fit AS (
      SELECT bin, MAX(mn) AS iso FROM m1 GROUP BY bin
    )
    SELECT b.bin, b.n,
           round(CAST(b.pos AS DOUBLE) / b.n, 6) AS raw_rate,
           round(f.iso, 6) AS iso_rate,
           CAST(f.iso <> CAST(b.pos AS DOUBLE) / b.n AS BOOLEAN) AS pooled
    FROM bins b JOIN fit f ON b.bin = f.bin
    ORDER BY b.bin
    """,
    tags=("model-training", "calibration", "isotonic"),
)
def isotonic_calibration_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration, hash-exact across engines: fit the
    best monotone nondecreasing rate of F-status orders as a function
    of the order-value bin — the calibration step that turns any
    ranking score into usable probabilities (and the nonparametric
    alternative to the Platt-style logreg calibration already in the
    registry). Instead of the sequential pool-adjacent-violators loop,
    both engines evaluate the closed-form minimax characterization
    ``iso(i) = max_{j<=i} min_{k>=i} avg(y[j..k])`` over the
    aggregated bins: prefix sums make every segment average one
    division of exact integers, and min/max over identical IEEE
    doubles is order-independent, so the fit is deterministic without
    a single float sum. One shuffle aggregates ~20 bins from the fact
    scan; the O(B^3) minimax runs on a bin-count-sized frame that
    never touches the cluster's data path."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") / 30000).cast("long").alias("bin"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    bins = orders.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pref = bins.select(
        "bin", "n", "pos",
        F.sum("n").over(w).alias("cw"),
        F.sum("pos").over(w).alias("cp"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    pairs = a.join(b, F.col("a.bin") <= F.col("b.bin")).select(
        F.col("a.bin").alias("j"),
        F.col("b.bin").alias("k"),
        (
            (F.col("b.cp") - (F.col("a.cp") - F.col("a.pos"))).cast("double")
            / (F.col("b.cw") - (F.col("a.cw") - F.col("a.n")))
        ).alias("seg_avg"),
    )
    i = bins.select(F.col("bin").alias("ibin"))
    m1 = (
        pairs.join(
            i, (F.col("j") <= F.col("ibin")) & (F.col("k") >= F.col("ibin"))
        )
        .groupBy("ibin", "j")
        .agg(F.min("seg_avg").alias("mn"))
    )
    fit = m1.groupBy("ibin").agg(F.max("mn").alias("iso"))
    raw = F.col("pos").cast("double") / F.col("n")
    return (
        bins.join(fit, bins.bin == fit.ibin)
        .select(
            "bin",
            "n",
            F.round(raw, 6).alias("raw_rate"),
            F.round(F.col("iso"), 6).alias("iso_rate"),
            (F.col("iso") != raw).alias("pooled"),
        )
        .orderBy("bin")
    )


_FP_N = 64  # samples per frame
_FP_FRAMES = 6
_FP_BINS = tuple(range(2, 14))


@query(
    "audio_fingerprint_match",
    oracle=f"""
    WITH clips AS (
      SELECT doc_id, doc_id % 30 AS song, (doc_id // 30) % 2 AS off
      FROM documents WHERE doc_id < 600
    ),
    frames AS (
      SELECT c.doc_id, c.song, t.t,
             2 + (c.song * 7 + (t.t + c.off) * (c.song % 5 + 2)
                  + (t.t + c.off) * (t.t + c.off)) % 12 AS true_bin
      FROM clips c
      CROSS JOIN (SELECT unnest(range(0, {_FP_FRAMES})) AS t) t
    ),
    samples AS (
      SELECT f.doc_id, f.t, f.true_bin, b.bin, n.n,
             CAST(floor(1000.0 * sin({_TAU!r} * (f.true_bin / {float(_FP_N)!r}) * n.n))
                  AS BIGINT) AS x
      FROM frames f
      CROSS JOIN (SELECT unnest(range(2, 14)) AS bin) b
      CROSS JOIN (SELECT unnest(generate_series(0, {_FP_N - 1})) AS n) n
    ),
    bins AS (
      SELECT doc_id, t, bin,
             CAST(sum(CAST(round(x * cos({_TAU!r} * (bin / {float(_FP_N)!r}) * n), 6)
                           AS DECIMAL(28,6))) AS DOUBLE) AS ck,
             CAST(sum(CAST(round(x * sin({_TAU!r} * (bin / {float(_FP_N)!r}) * n), 6)
                           AS DECIMAL(28,6))) AS DOUBLE) AS sk
      FROM samples GROUP BY 1, 2, 3
    ),
    peaks AS (
      SELECT doc_id, t, bin,
             row_number() OVER (
               PARTITION BY doc_id, t
               ORDER BY CAST(floor((ck * ck + sk * sk) / 1000.0) AS BIGINT) DESC,
                        bin) AS rnk
      FROM bins
    ),
    melody AS (
      SELECT doc_id, t, bin AS peak FROM peaks WHERE rnk = 1
    ),
    hashes AS (
      SELECT DISTINCT a.doc_id, a.peak * 16 + b.peak AS landmark
      FROM melody a JOIN melody b ON a.doc_id = b.doc_id AND b.t = a.t + 1
    ),
    matches AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM hashes a JOIN hashes b
        ON a.landmark = b.landmark AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared,
           CAST(doc_a % 30 = doc_b % 30 AS BOOLEAN) AS same_song
    FROM matches WHERE n_shared >= 4
    ORDER BY doc_a, doc_b
    """,
    tags=("multimodal", "audio", "fingerprint", "dedup"),
)
def audio_fingerprint_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint matching, Shazam-style constellation hashing
    made oracle-exact: each capped doc is a 6-frame clip whose
    per-frame dominant tone follows a song-specific melody (docs of
    one song are the same melody at different clip offsets — the
    'same recording, clipped differently' case audio dedup exists
    for). The REAL pipeline runs declaratively: per-frame single-bin
    DFT energies (the tone-detect machinery — decimal-summed rounded
    terms, floor-scaled powers, so bit-exact), argmax peak per frame,
    then landmark hashes over consecutive peak transitions
    (peak_t*8 + peak_t+1), dedup'd per doc, and a hash-keyed
    self-join counts shared landmarks per doc pair — pairs sharing
    >= 4 of their 5 landmarks match. Offset-shifted clips of one song
    share 4 transitions, so they match WITHOUT any alignment search —
    the property landmark hashing buys at scale (O(rows) hash
    shuffle, never pairwise audio comparison).
    Scale: sample expansion is capped-docs x 6 frames x 6 probe bins
    x 64 samples, one map-side-combinable aggregate; the match join
    keys on landmark values whose per-key fan-out is bounded by docs
    per song."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 600)
        .select(
            "doc_id",
            (F.col("doc_id") % 30).alias("song"),
            ((F.col("doc_id") / 30).cast("long") % 2).alias("off"),
        )
    )
    frames = docs.withColumn(
        "t", F.explode(F.sequence(F.lit(0), F.lit(_FP_FRAMES - 1)))
    ).select(
        "doc_id",
        "t",
        (
            F.lit(2)
            + (
                F.col("song") * 7
                + (F.col("t") + F.col("off")) * (F.col("song") % 5 + 2)
                + (F.col("t") + F.col("off")) * (F.col("t") + F.col("off"))
            )
            % 12
        ).alias("true_bin"),
    )
    # r14 optimization: the synthetic frame is a pure function of its
    # true_bin, so the per-frame DFT argmax is computed ONCE per
    # distinct true_bin (a <=12-row grid; identical decimal term sets,
    # so powers and the argmax are bit-exact vs the per-frame
    # formulation the oracle replays) and re-attached to the frames
    # with one broadcast join — docs x frames x bins x samples trig
    # rows collapse to a constant-size grid.
    grid = frames.select("true_bin").distinct()
    samples = (
        grid.withColumn(
            "bin", F.explode(F.array(*[F.lit(b) for b in _FP_BINS]))
        )
        .withColumn("n", F.explode(F.sequence(F.lit(0), F.lit(_FP_N - 1))))
        .withColumn(
            "x",
            F.floor(
                F.lit(1000.0)
                * F.sin(
                    F.lit(_TAU)
                    * (F.col("true_bin") / F.lit(float(_FP_N)))
                    * F.col("n")
                )
            ).cast("long"),
        )
    )
    w = F.lit(_TAU) * (F.col("bin") / F.lit(float(_FP_N))) * F.col("n")
    bins = samples.groupBy("true_bin", "bin").agg(
        F.sum(F.round(F.col("x") * F.cos(w), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("ck"),
        F.sum(F.round(F.col("x") * F.sin(w), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sk"),
    )
    power = F.floor(
        (F.col("ck") * F.col("ck") + F.col("sk") * F.col("sk")) / F.lit(1000.0)
    ).cast("long")
    peak_by_bin = (
        bins.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("true_bin").orderBy(power.desc(), "bin")
            ),
        )
        .where(F.col("rnk") == 1)
        .select("true_bin", F.col("bin").alias("peak"))
    )
    melody = frames.join(F.broadcast(peak_by_bin), "true_bin").select(
        "doc_id", "t", "peak"
    )
    nxt = melody.select(
        "doc_id", (F.col("t") - 1).alias("t"), F.col("peak").alias("peak_next")
    )
    hashes = (
        melody.join(nxt, ["doc_id", "t"])
        .select(
            "doc_id",
            (F.col("peak") * 16 + F.col("peak_next")).alias("landmark"),
        )
        .distinct()
    )
    a, b = hashes.alias("a"), hashes.alias("b")
    matches = (
        a.join(
            b,
            (F.col("a.landmark") == F.col("b.landmark"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 4)
    )
    return matches.select(
        "doc_a",
        "doc_b",
        "n_shared",
        (F.col("doc_a") % 30 == F.col("doc_b") % 30).alias("same_song"),
    ).orderBy("doc_a", "doc_b")


_GRID_LRS = (1.0, 2.0, 4.0)


@query(
    "logreg_grid_search",
    oracle="\nUNION ALL\n".join(
        f"""SELECT {lr!r} AS lr, n_positive, n_negative, auc FROM (
        {_logreg_holdout_oracle(nf=4, lr=lr, iters=5, k=5, final=_AUC_FINAL)}
        ) t_{i}"""
        for i, lr in enumerate(_GRID_LRS)
    )
    + "\nORDER BY lr",
    tags=("model-training", "classifier", "hyperparameter-search"),
)
def logreg_grid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed hyperparameter search — the model-selection loop a
    learned quality filter actually ships through: three logistic-
    regression trials (learning rates 1/2/4, five epochs each) train
    against the same leak-proof fold split and score hold-out ROC AUC,
    all composed as one union'd lazy plan (trials are embarrassingly
    parallel — on a cluster each trial's aggregates pipeline
    independently; the driver holds only 3x5 weight scalars). The
    oracle is three unrolled GD+AUC programs UNION'd — trial
    isolation is part of the check (any cross-trial contamination
    breaks the hash). Scale: 3x the single-trial cost, zero extra
    scans of anything but the embeddings table already cached per
    trial; adding trials widens the union, never deepens a shuffle."""
    from pyspark.sql import Window as W

    from .operators.logreg import (
        apply_standardize,
        logreg_fit_many,
        logreg_score,
    )

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("vec_id") % 5).alias("fold"),
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    # one aggregate job per stage trains ALL trials (r14 — the
    # conditional-aggregate trainer is bit-identical per trial to the
    # old standardize+logreg_fit per-trial spelling)
    fitted = logreg_fit_many(
        base,
        [f"f{i}" for i in range(4)],
        "label_bin",
        [(lr, F.col("fold") != 0, lr) for lr in _GRID_LRS],
        iters=5,
    )
    # the three per-trial AUC chains fuse into ONE lr-keyed chain (r14,
    # same reformulation as logreg_cv_kfold's fold-keyed fusion): the
    # per-trial groups, window frames, and decimal sums are identical,
    # and the formerly-global score window becomes lr-partitioned
    scored_parts = []
    for lr in _GRID_LRS:
        weights, stats = fitted[lr]
        held, zcols = apply_standardize(
            base.where(F.col("fold") == 0), stats
        )
        scored_parts.append(
            logreg_score(held, zcols, weights).select(
                F.lit(lr).alias("_tag"), "label_bin", "p"
            )
        )
    scored = scored_parts[0]
    for t in scored_parts[1:]:
        scored = scored.unionByName(t)
    perp = scored.groupBy("_tag", "p").agg(
        F.count("*").alias("cnt"), F.sum("label_bin").alias("pos")
    )
    w = (
        W.partitionBy("_tag")
        .orderBy("p")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = perp.select(
        "_tag",
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    )
    sums = ranked.groupBy("_tag").agg(
        F.sum(
            (
                F.col("pos")
                * (F.col("cum_before") + (F.col("cnt") + 1) / 2.0)
            ).cast("decimal(38,1)")
        )
        .cast("double")
        .alias("rank_sum"),
        F.sum("pos").alias("np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nn"),
    )
    return sums.select(
        F.col("_tag").alias("lr"),
        F.col("np").alias("n_positive"),
        F.col("nn").alias("n_negative"),
        F.round(
            (F.col("rank_sum") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * F.col("nn")),
            6,
        ).alias("auc"),
    ).orderBy("lr")


@query(
    "bleu_corpus_self_eval",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '')[1:64] AS l
      FROM documents
    ), ref AS (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM toks
    ), cand AS (
      SELECT doc_id, pos,
             CASE WHEN (pos - 1) % 5 = 4 THEN reverse(tok) ELSE tok END AS tok
      FROM ref WHERE (pos - 1) % 11 <> 10
    ), ref2 AS (
      SELECT doc_id, tok || ' ' ||
             LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
      FROM ref
    ), cand2 AS (
      SELECT doc_id, tok || ' ' ||
             LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
      FROM cand
    ), rc1 AS (
      SELECT doc_id, tok, COUNT(*) AS rc FROM ref GROUP BY doc_id, tok
    ), cc1 AS (
      SELECT doc_id, tok, COUNT(*) AS cc FROM cand GROUP BY doc_id, tok
    ), rc2 AS (
      SELECT doc_id, bg, COUNT(*) AS rc FROM ref2 WHERE bg IS NOT NULL
      GROUP BY doc_id, bg
    ), cc2 AS (
      SELECT doc_id, bg, COUNT(*) AS cc FROM cand2 WHERE bg IS NOT NULL
      GROUP BY doc_id, bg
    ), uni AS (
      SELECT SUM(LEAST(c.cc, COALESCE(r.rc, 0))) AS m1,
             SUM(c.cc) AS c1
      FROM cc1 c LEFT JOIN rc1 r ON r.doc_id = c.doc_id AND r.tok = c.tok
    ), bi AS (
      SELECT SUM(LEAST(c.cc, COALESCE(r.rc, 0))) AS m2,
             SUM(c.cc) AS c2
      FROM cc2 c LEFT JOIN rc2 r ON r.doc_id = c.doc_id AND r.bg = c.bg
    ), rlen AS (
      SELECT COUNT(*) AS r1 FROM ref
    )
    SELECT CAST(c1 AS BIGINT) AS cand_tokens,
           CAST(r1 AS BIGINT) AS ref_tokens,
           CAST(m1 AS BIGINT) AS clipped_1gram,
           CAST(c2 AS BIGINT) AS cand_bigrams,
           CAST(m2 AS BIGINT) AS clipped_2gram,
           round(CAST(m1 AS DOUBLE) / c1, 6) AS p1,
           round(CAST(m2 AS DOUBLE) / c2, 6) AS p2,
           round(CASE WHEN c1 < r1 THEN exp(1 - CAST(r1 AS DOUBLE) / c1)
                      ELSE 1 END
                 * exp(0.5 * (ln(CAST(m1 AS DOUBLE) / c1)
                              + ln(CAST(m2 AS DOUBLE) / c2))), 6) AS bleu2
    FROM uni CROSS JOIN bi CROSS JOIN rlen
    """,
    tags=("llm", "evaluation", "text"),
)
def bleu_corpus_self_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 (Papineni et al. 2002): clipped n-gram
    precision with brevity penalty — the generation-eval metric an LLM
    pipeline runs over (candidate, reference) pairs at scale. The
    harness is self-contained and deterministic: the reference is each
    document's first 64 tokens; the candidate is the same stream with
    every 11th token dropped (exercising the brevity penalty, c < r)
    and every 5th reversed (exercising clipping — a reversed token only
    counts if the reference really contains that string elsewhere).
    Modified precision is the classic two-sided count join: per-doc
    n-gram counts for both streams, LEAST(cand, ref) summed — integer
    counts end to end, map-side combinable, with per-doc keys so the
    shuffle is (doc_id, gram)-wide, never corpus-wide. Bigrams come
    from a per-doc LEAD window (partitioned — no global sort). The only
    doubles are the final fixed p1/p2/BP/exp-mean expression → hash-
    exact. At 100 TB the plan is the same: tokenise → two grouped
    counts → broadcast-sized scalar assembly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.slice(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            ),
            1,
            64,
        ).alias("l"),
    )
    ref = toks.select(
        "doc_id", F.posexplode("l").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    cand = ref.where((F.col("pos") - 1) % 11 != 10).select(
        "doc_id",
        "pos",
        F.when((F.col("pos") - 1) % 5 == 4, F.reverse("tok"))
        .otherwise(F.col("tok"))
        .alias("tok"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")

    def bigrams(df: DataFrame) -> DataFrame:
        nx = F.lead("tok").over(wdoc)
        return (
            df.select("doc_id", "tok", nx.alias("nx"))
            .where(F.col("nx").isNotNull())
            .select("doc_id", F.concat_ws(" ", "tok", "nx").alias("bg"))
        )

    rc1 = ref.groupBy("doc_id", "tok").agg(F.count("*").alias("rc"))
    cc1 = cand.groupBy("doc_id", "tok").agg(F.count("*").alias("cc"))
    uni = cc1.join(rc1, ["doc_id", "tok"], "left").agg(
        F.sum(F.least("cc", F.coalesce("rc", F.lit(0)))).alias("m1"),
        F.sum("cc").alias("c1"),
    )
    rc2 = bigrams(ref).groupBy("doc_id", "bg").agg(F.count("*").alias("rc"))
    cc2 = bigrams(cand).groupBy("doc_id", "bg").agg(F.count("*").alias("cc"))
    bi = cc2.join(rc2, ["doc_id", "bg"], "left").agg(
        F.sum(F.least("cc", F.coalesce("rc", F.lit(0)))).alias("m2"),
        F.sum("cc").alias("c2"),
    )
    rlen = ref.agg(F.count("*").alias("r1"))
    row = uni.crossJoin(bi).crossJoin(rlen)
    m1, c1 = F.col("m1"), F.col("c1")
    m2, c2 = F.col("m2"), F.col("c2")
    r1 = F.col("r1")
    bp = F.when(
        c1 < r1, F.exp(F.lit(1) - r1.cast("double") / c1)
    ).otherwise(F.lit(1.0))
    bleu = bp * F.exp(
        0.5
        * (
            F.log(m1.cast("double") / c1)
            + F.log(m2.cast("double") / c2)
        )
    )
    return row.select(
        c1.cast("long").alias("cand_tokens"),
        r1.cast("long").alias("ref_tokens"),
        m1.cast("long").alias("clipped_1gram"),
        c2.cast("long").alias("cand_bigrams"),
        m2.cast("long").alias("clipped_2gram"),
        F.round(m1.cast("double") / c1, 6).alias("p1"),
        F.round(m2.cast("double") / c2, 6).alias("p2"),
        F.round(bleu, 6).alias("bleu2"),
    )


_CV_FOLDS = (0, 1, 2)


@query(
    "logreg_cv_kfold",
    oracle="\nUNION ALL\n".join(
        f"""SELECT {f} AS fold, n_positive, n_negative, auc FROM (
        {_logreg_holdout_oracle(nf=4, lr=2.0, iters=5, k=5,
                                final=_AUC_FINAL, heldout=f)}
        ) cv_{f}"""
        for f in _CV_FOLDS
    )
    + "\nORDER BY fold",
    tags=("model-training", "classifier", "cross-validation"),
)
def logreg_cv_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-fold cross-validation of the in-engine logreg trainer: three
    rotations of the 5-way vec_id hash split, each retraining from
    scratch — standardization statistics AND every gradient from the
    four train folds only — and scoring hold-out ROC AUC on its own
    untouched fold. The no-leakage contract is checked PER ROTATION:
    the oracle is three unrolled train-only GD+AUC programs UNION'd,
    so any statistic leaking across folds breaks the hash. Rotations
    are embarrassingly parallel (one union'd lazy plan, the driver
    holds 3×5 weight scalars); each fold's AUC uses the grouped-
    midrank Mann-Whitney reduction — no global sort of scores.
    Scale: 3× the single-trial aggregates, same shuffle depth; adding
    folds widens the union, never deepens it."""
    from pyspark.sql import Window as W

    from .operators.logreg import (
        apply_standardize,
        logreg_fit_many,
        logreg_score,
    )

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("vec_id") % 5).alias("fold"),
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    # all rotations train in one aggregate job per stage (r14): each
    # rotation's stats AND gradients are fold-masked conditional
    # aggregates, bit-identical to the per-rotation spelling — the
    # no-leakage contract is unchanged (eval rows never enter their
    # rotation's mask)
    fitted = logreg_fit_many(
        base,
        [f"f{i}" for i in range(4)],
        "label_bin",
        [(f, F.col("fold") != f, 2.0) for f in _CV_FOLDS],
        iters=5,
    )
    # the three per-rotation AUC chains fuse into ONE fold-keyed chain
    # (r14): union the tagged scored frames, group by (fold, p), and
    # run the midrank cumulative as a fold-PARTITIONED window — the
    # per-fold groups, window frames, and decimal sums are identical
    # to the per-rotation spelling, and the formerly-global (sanctioned
    # bounded-frame) score window becomes a plainly partitioned one
    scored_parts = []
    for f in _CV_FOLDS:
        weights, stats = fitted[f]
        held, zcols = apply_standardize(base.where(F.col("fold") == f), stats)
        scored_parts.append(
            logreg_score(held, zcols, weights).select(
                F.lit(f).cast("int").alias("_tag"), "label_bin", "p"
            )
        )
    scored = scored_parts[0]
    for t in scored_parts[1:]:
        scored = scored.unionByName(t)
    perp = scored.groupBy("_tag", "p").agg(
        F.count("*").alias("cnt"), F.sum("label_bin").alias("pos")
    )
    w = (
        W.partitionBy("_tag")
        .orderBy("p")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = perp.select(
        "_tag",
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
    )
    sums = ranked.groupBy("_tag").agg(
        F.sum(
            (
                F.col("pos")
                * (F.col("cum_before") + (F.col("cnt") + 1) / 2.0)
            ).cast("decimal(38,1)")
        )
        .cast("double")
        .alias("rank_sum"),
        F.sum("pos").alias("np"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nn"),
    )
    return sums.select(
        F.col("_tag").alias("fold"),
        F.col("np").cast("long").alias("n_positive"),
        F.col("nn").cast("long").alias("n_negative"),
        F.round(
            (F.col("rank_sum") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * F.col("nn")),
            6,
        ).alias("auc"),
    ).orderBy("fold")


@query(
    "phrase_search_positional",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS l
      FROM documents
    ), post AS (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM toks
    ), bg AS (
      SELECT doc_id, tok,
             LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM post
    ), top_bigram AS (
      SELECT tok AS w1, nxt AS w2
      FROM bg WHERE nxt IS NOT NULL
      GROUP BY tok, nxt
      ORDER BY COUNT(*) DESC, tok, nxt LIMIT 1
    ), hits AS (
      SELECT a.doc_id
      FROM post a
      JOIN top_bigram t ON a.tok = t.w1
      JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                 AND b.tok = t.w2
    )
    SELECT (SELECT w1 || ' ' || w2 FROM top_bigram) AS phrase,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_matched,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM hits
    """,
    tags=("search", "inverted-index", "phrase", "text"),
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search — the inverted-index operation BM25
    and bag-of-words retrieval cannot do: find exact multi-word
    phrases by intersecting POSITIONAL postings (doc_id, token, pos)
    on pos_b = pos_a + 1, the way Lucene executes quoted queries. The
    probe phrase is self-contained and deterministic: the corpus's
    most frequent bigram (count-then-lexicographic tiebreak) selected
    from a per-doc LEAD window, broadcast as a 1-row frame into the
    postings join. Postings are built once and shuffled by
    (doc_id)-keyed joins; occurrence and doc counts are exact
    integers. Scale: postings ∝ corpus tokens (the inverted-index
    build every search engine pays), the phrase join touches only the
    two tokens' posting lists, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    post = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("pos0", "tok"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    from pyspark.sql.window import Window as W

    bg = post.select(
        "doc_id",
        "tok",
        F.lead("tok").over(W.partitionBy("doc_id").orderBy("pos")).alias(
            "nxt"
        ),
    ).where(F.col("nxt").isNotNull())
    top_bigram = (
        bg.groupBy("tok", "nxt")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "tok", "nxt")
        .limit(1)
        .select(F.col("tok").alias("w1"), F.col("nxt").alias("w2"))
    )
    a = post.join(
        F.broadcast(top_bigram), F.col("tok") == F.col("w1")
    ).select("doc_id", "pos", "w1", "w2")
    b = post.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("tok").alias("tok_b"),
    )
    hits = a.join(
        b,
        (F.col("doc_b") == F.col("doc_id"))
        & (F.col("pos_b") == F.col("pos") + 1)
        & (F.col("tok_b") == F.col("w2")),
    )
    return hits.agg(
        F.max(F.concat_ws(" ", "w1", "w2")).alias("phrase"),
        F.countDistinct("doc_id").cast("long").alias("n_docs_matched"),
        F.count("*").cast("long").alias("n_occurrences"),
    )


def _perm_importance_oracle(
    nf: int = 4, lr: float = 2.0, iters: int = 5, k: int = 5, nbkt: int = 64
) -> str:
    """Permutation-importance program: the trained-weights prefix from
    ``_logreg_holdout_oracle``, then a bucket-partitioned md5-rank
    permutation of the held-out fold and one grouped-midrank AUC block
    per scored variant (base + each feature permuted)."""
    xs = [f"x{j + 1}" for j in range(nf)]

    def sig(cols: list[str]) -> str:
        zexpr = "w0 + " + " + ".join(
            f"w{j + 1}*{c}" for j, c in enumerate(cols)
        )
        return f"1.0/(1.0+exp(-({zexpr})))"

    variants = [("base", xs)] + [
        (xs[j], [f"d{j + 1}" if i == j else xs[i] for i in range(nf)])
        for j in range(nf)
    ]
    blocks = []
    for name, cols in variants:
        blocks.append(f""", scored_{name} AS (
      SELECT label_bin, round({sig(cols)}, 6) AS p
      FROM paired CROSS JOIN __WN__
    ), perp_{name} AS (
      SELECT p, COUNT(*) AS cnt, SUM(label_bin) AS pos
      FROM scored_{name} GROUP BY p
    ), ranked_{name} AS (
      SELECT cnt, pos,
             COALESCE(SUM(cnt) OVER (ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
      FROM perp_{name}
    ), auc_{name} AS (
      SELECT round((CAST(SUM(CAST(pos * (cum_before + (cnt + 1) / 2.0)
                                  AS DECIMAL(38,1))) AS DOUBLE)
                    - SUM(pos) * (SUM(pos) + 1) / 2.0)
                   / (CAST(SUM(pos) AS DOUBLE) * SUM(cnt - pos)), 6) AS auc
      FROM ranked_{name}
    )""")
    xlist = ", ".join(xs)
    dsel = ", ".join(f"x{j + 1} AS d{j + 1}" for j in range(nf))
    union = "\n      UNION ALL\n".join(
        f"SELECT '{xs[j]}' AS feature, auc FROM auc_{xs[j]}"
        for j in range(nf)
    )
    final = f"""
    , held AS (
      SELECT vec_id, label_bin, {xlist},
             CAST('0x' || substr(md5('pib:' || CAST(vec_id AS VARCHAR)),
                                 1, 8) AS BIGINT) % {nbkt} AS bkt
      FROM z WHERE fold = 0
    ), ra AS (
      SELECT label_bin, {xlist}, bkt,
             ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY vec_id) AS rn
      FROM held
    ), rb AS (
      SELECT {dsel}, bkt,
             ROW_NUMBER() OVER (PARTITION BY bkt
               ORDER BY md5('pi:' || CAST(vec_id AS VARCHAR))) AS rn
      FROM held
    ), paired AS (
      SELECT a.label_bin, {", ".join("a." + x for x in xs)},
             {", ".join(f"b.d{j + 1}" for j in range(nf))}
      FROM ra a JOIN rb b ON a.bkt = b.bkt AND a.rn = b.rn
    ){"".join(blocks)}
    SELECT v.feature, b.auc AS base_auc, v.auc AS permuted_auc,
           round(b.auc - v.auc, 6) AS auc_drop
    FROM ({union}) v CROSS JOIN auc_base b
    ORDER BY feature"""
    return _logreg_holdout_oracle(nf=nf, lr=lr, iters=iters, k=k, final=final)


@query(
    "permutation_importance_logreg",
    oracle=_perm_importance_oracle(),
    tags=("ml", "feature-importance", "eval"),
)
def permutation_importance_logreg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Permutation feature importance (Breiman 2001): retrain nothing —
    score the held-out fold once per feature with THAT feature's
    column permuted, and report the AUC drop. The permutation is
    deterministic and cluster-shaped: held-out rows hash into 64
    buckets and are re-paired WITHIN each bucket by md5 rank (a true
    permutation per bucket, windows partitioned by bucket — no global
    N-sized sort, unlike the textbook single shuffle), so both engines
    permute identically and every variant's grouped-midrank AUC is
    hash-exact. Importance ranks features by what the model actually
    uses, interactions included — the model-agnostic eval a curation
    pipeline runs before trusting a learned filter.
    Scale: one trained-weights prefix (shared), then 5 stateless
    scoring projections + tiny grouped AUC reductions; the pairing
    shuffle is bucket-local."""
    from pyspark.sql import Window as W

    from .operators.logreg import _sigmoid, _z, logreg_fit, standardize

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("vec_id") % 5).alias("fold"),
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(
        base,
        [f"f{i}" for i in range(4)],
        stats_from=base.where(F.col("fold") != 0),
    )
    train = feats.where(F.col("fold") != 0)
    weights = logreg_fit(train, zcols, "label_bin", lr=2.0, iters=5)
    held = feats.where(F.col("fold") == 0).select(
        "vec_id",
        "label_bin",
        *zcols,
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("pib:"), F.col("vec_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 64
        ).alias("bkt"),
    )
    ra = held.select(
        "label_bin",
        *zcols,
        "bkt",
        F.row_number()
        .over(W.partitionBy("bkt").orderBy("vec_id"))
        .alias("rn"),
    )
    rb = held.select(
        *[F.col(c).alias(f"d{j + 1}") for j, c in enumerate(zcols)],
        "bkt",
        F.row_number()
        .over(
            W.partitionBy("bkt").orderBy(
                F.md5(F.concat(F.lit("pi:"), F.col("vec_id").cast("string")))
            )
        )
        .alias("rn"),
    )
    paired = ra.join(rb, ["bkt", "rn"]).localCheckpoint(eager=False)

    def auc_of(cols: list[str], name: str) -> DataFrame:
        scored = paired.select(
            "label_bin",
            F.round(_sigmoid(_z(cols, weights)), 6).alias("p"),
        )
        perp = scored.groupBy("p").agg(
            F.count("*").alias("cnt"), F.sum("label_bin").alias("pos")
        )
        w = W.orderBy("p").rowsBetween(W.unboundedPreceding, -1)
        ranked = perp.select(
            "cnt",
            "pos",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
        )
        return ranked.agg(
            F.round(
                (
                    F.sum(
                        (
                            F.col("pos")
                            * (F.col("cum_before") + (F.col("cnt") + 1) / 2.0)
                        ).cast("decimal(38,1)")
                    ).cast("double")
                    - F.sum("pos") * (F.sum("pos") + 1) / 2.0
                )
                / (
                    F.sum("pos").cast("double")
                    * F.sum(F.col("cnt") - F.col("pos"))
                ),
                6,
            ).alias(name)
        )

    base_auc = auc_of(zcols, "base_auc")
    rows = []
    for j, c in enumerate(zcols):
        cols = [f"d{j + 1}" if i == j else zcols[i] for i in range(len(zcols))]
        rows.append(
            auc_of(cols, "permuted_auc").select(
                F.lit(f"x{j + 1}").alias("feature"), "permuted_auc"
            )
        )
    out = rows[0]
    for t in rows[1:]:
        out = out.unionByName(t)
    return (
        out.crossJoin(F.broadcast(base_auc))
        .select(
            "feature",
            "base_auc",
            "permuted_auc",
            F.round(F.col("base_auc") - F.col("permuted_auc"), 6).alias(
                "auc_drop"
            ),
        )
        .orderBy("feature")
    )


@query(
    "binary_quantize_hamming_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), flat AS (
      SELECT vec_id, unnest(emb) AS v, generate_subscripts(emb, 1) AS i
      FROM e
    ), bits AS (
      SELECT vec_id,
             SUM(CASE WHEN i <= 32 AND v > 0
                      THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END) AS w0,
             SUM(CASE WHEN i > 32 AND v > 0
                      THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END) AS w1
      FROM flat GROUP BY vec_id
    ), probe AS (
      SELECT vec_id AS pid, w0 AS p0, w1 AS p1 FROM bits
      ORDER BY vec_id LIMIT 1
    )
    SELECT b.vec_id AS neighbor_id,
           CAST(bit_count(xor(b.w0, p.p0))
                + bit_count(xor(b.w1, p.p1)) AS INT) AS hamming
    FROM bits b CROSS JOIN probe p
    WHERE b.vec_id <> p.pid
    ORDER BY hamming, b.vec_id
    LIMIT 10
    """,
    tags=("embedding", "quantization", "similarity", "hamming"),
)
def binary_quantize_hamming_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary (sign) embedding quantization with Hamming retrieval —
    the 32× compression every billion-vector store reaches for before
    PQ: each 64-dim float vector collapses to 64 sign bits packed into
    two BIGINT words (32 bits per word — no sign-bit edge cases), and
    nearest neighbors are ranked by popcount of XOR, a register-width
    instruction instead of 64 multiplies. Packing is an integer
    conditional sum of disjoint powers of two (exact in both engines);
    Hamming distances are integers; the (distance, id)-tiebroken
    top-10 for the smallest-id probe is engine-identical. Completes
    the quantization ladder: int8 scalar → PQ/IVFPQ → binary.
    Scale: quantization is one grouped pass (or a stateless projection
    at 64 fixed terms); retrieval scans two BIGINTs per candidate —
    bandwidth-bound at 16 bytes/vector vs 256 for floats — and the
    probe ships as a 1-row broadcast."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "i0", "v"
        ),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "v")
    bits = e.groupBy("vec_id").agg(
        F.sum(
            F.when(
                (F.col("i") <= 32) & (F.col("v") > 0),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT) - 1)"),
            ).otherwise(F.lit(0))
        ).alias("w0"),
        F.sum(
            F.when(
                (F.col("i") > 32) & (F.col("v") > 0),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT) - 33)"),
            ).otherwise(F.lit(0))
        ).alias("w1"),
    )
    probe = (
        bits.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("pid"),
            F.col("w0").alias("p0"),
            F.col("w1").alias("p1"),
        )
    )
    ham = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("p0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("p1")))
    ).cast("int")
    return (
        bits.crossJoin(F.broadcast(probe))
        .where(F.col("vec_id") != F.col("pid"))
        .select(F.col("vec_id").alias("neighbor_id"), ham.alias("hamming"))
        .orderBy("hamming", "neighbor_id")
        .limit(10)
    )


_RAKE_STOP = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "with", "is", "are", "was", "be", "as", "at", "by", "it", "that",
)


@query(
    "rake_keyword_extraction",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text),
                                                   '[^a-z0-9]+'),
                                t -> t <> '')) AS tok,
             generate_subscripts(list_filter(string_split_regex(lower(text),
                                                                '[^a-z0-9]+'),
                                             t -> t <> ''), 1) AS pos
      FROM documents
    ), cand AS (
      SELECT doc_id, tok, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM toks
      WHERE tok NOT IN ({", ".join(f"'{w}'" for w in _RAKE_STOP)})
    ), phr AS (
      SELECT doc_id, grp,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS nwords
      FROM cand GROUP BY doc_id, grp
      HAVING COUNT(*) <= 4
    ), member AS (
      SELECT c.doc_id, c.grp, c.tok, p.nwords
      FROM cand c JOIN phr p ON p.doc_id = c.doc_id AND p.grp = c.grp
    ), wstat AS (
      SELECT tok, SUM(nwords) AS deg FROM member GROUP BY tok
    ), scored AS (
      SELECT m.doc_id, m.grp, SUM(w.deg) AS score
      FROM member m JOIN wstat w ON w.tok = m.tok
      GROUP BY m.doc_id, m.grp
    )
    SELECT p.phrase, CAST(MAX(s.score) AS BIGINT) AS score,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM phr p JOIN scored s ON s.doc_id = p.doc_id AND s.grp = p.grp
    GROUP BY p.phrase
    ORDER BY score DESC, support DESC, phrase
    LIMIT 15
    """,
    tags=("text", "keywords", "rake"),
)
def rake_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.) in its integer degree-sum
    form: candidate phrases are the maximal stopword-free token runs
    (the gaps-and-islands pos − row_number trick, windows partitioned
    per doc), each word's degree is the total length of every phrase
    it appears in (co-occurrence degree, counting itself), and a
    phrase scores the SUM of its members' degrees — multi-word domain
    terms outscore frequent single words, which is the whole point of
    RAKE. Degrees, scores and supports are exact integer counts (the
    float deg/freq ratio of the original is deliberately replaced by
    the documented degree-sum variant so the ranking is
    addition-order-free); identical phrase texts share identical
    member stats, so MAX(score) per phrase is exact dedup, not
    approximation. Phrases cap at 4 words.
    Scale: tokenize → per-doc windows → three grouped joins keyed by
    (doc, phrase-island) and word — map-side combinable throughout,
    vocabulary-sized aggregates at the end."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # r15 negative result: scale_out before the posexplode was A/B'd
    # and REVERTED (old best 1.49 s vs new 2.02, old ahead 4/4) — the
    # warm regex tokenize of this corpus is cheaper than the added
    # exchange paid once per consumer branch; the cold-profile 1.5 s
    # 1-task readings were drift-inflated.
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    cand = toks.where(~F.col("tok").isin(*_RAKE_STOP)).withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(W.partitionBy("doc_id").orderBy("pos")),
    )
    phr = (
        cand.groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("nwords"),
        )
        .where(F.col("nwords") <= 4)
    )
    member = cand.join(phr, ["doc_id", "grp"]).select(
        "doc_id", "grp", "tok", "nwords"
    )
    wstat = member.groupBy("tok").agg(F.sum("nwords").alias("deg"))
    scored = (
        member.join(wstat, "tok")
        .groupBy("doc_id", "grp")
        .agg(F.sum("deg").alias("score"))
    )
    return (
        phr.join(scored, ["doc_id", "grp"])
        .groupBy("phrase")
        .agg(
            F.max("score").cast("long").alias("score"),
            F.count("*").cast("long").alias("support"),
        )
        .orderBy(F.col("score").desc(), F.col("support").desc(), "phrase")
        .limit(15)
    )


_AP_FINAL = """
    , scored AS (
      SELECT vec_id, label_bin, round(__SIG__, 6) AS p
      FROM z CROSS JOIN __WN__
      WHERE fold = 0
    ), perp AS (
      SELECT p, COUNT(*) AS cnt, SUM(label_bin) AS pos
      FROM scored GROUP BY p
    ), blocks AS (
      SELECT p, cnt, pos,
             SUM(cnt) OVER (ORDER BY p DESC) AS cum_cnt,
             SUM(pos) OVER (ORDER BY p DESC) AS cum_pos,
             SUM(pos) OVER () AS np
      FROM perp
    ), terms AS (
      SELECT CAST(round(CAST(pos AS DOUBLE) / np
                        * CAST(cum_pos AS DOUBLE) / cum_cnt, 9)
                  AS DECIMAL(28,9)) AS t,
             pos, np, cum_cnt, cum_pos
      FROM blocks WHERE pos > 0
    )
    SELECT CAST(MAX(np) AS BIGINT) AS n_positive,
           CAST((SELECT SUM(cnt) FROM perp) - MAX(np) AS BIGINT)
             AS n_negative,
           round(CAST(SUM(t) AS DOUBLE), 6) AS average_precision,
           round(CAST(MAX(np) AS DOUBLE)
                 / (SELECT SUM(cnt) FROM perp), 6) AS baseline_prevalence
    FROM terms"""


@query(
    "logreg_holdout_prauc",
    oracle=_logreg_holdout_oracle(nf=4, lr=2.0, iters=5, k=5, final=_AP_FINAL),
    tags=("model-training", "classifier", "eval"),
)
def logreg_holdout_prauc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the PR-AUC) of the in-engine logreg on its
    untouched hold-out fold — the imbalance-honest companion to the
    ROC AUC already in the registry: under heavy class skew ROC can
    look great while precision is garbage, and AP's baseline is the
    prevalence, not 0.5. Tie handling is the block-wise protocol:
    distinct scores form blocks in descending order, each contributes
    (block positives / total positives) × (cumulative precision at
    the block) — every factor a ratio of integer counts, each term
    rounded to the 1e-9 grid and decimal-summed (addition-order-free,
    block count is score-grid-bounded). The prevalence baseline is
    reported alongside.
    Scale: one grouped-by-score reduction (scores on the 1e-6 sigmoid
    grid); the two descending cumulative sums run on ``range_cumsum``
    (r11, 0.01-wide buckets over the negated score — parallel instead
    of a million-row single-partition window), and the np/ntot scalars
    broadcast from an aggregate rather than a whole-frame window."""
    from .operators.logreg import logreg_fit, logreg_score, standardize
    from .operators.sampling import range_cumsum

    embeddings = load_table(spark, sf_dir, "embeddings")
    base = embeddings.select(
        "vec_id",
        (F.col("vec_id") % 5).alias("fold"),
        (F.col("label") == 3).cast("int").alias("label_bin"),
        *[
            F.col("embedding").cast("array<double>")[i].alias(f"f{i}")
            for i in range(4)
        ],
    )
    feats, zcols = standardize(
        base,
        [f"f{i}" for i in range(4)],
        stats_from=base.where(F.col("fold") != 0),
    )
    weights = logreg_fit(
        feats.where(F.col("fold") != 0), zcols, "label_bin", lr=2.0, iters=5
    )
    scored = logreg_score(
        feats.where(F.col("fold") == 0), zcols, weights
    ).select("label_bin", "p")
    perp = scored.groupBy("p").agg(
        F.count("*").alias("cnt"), F.sum("label_bin").alias("pos")
    )
    # Descending cumulative sums = ascending over the negated score
    # (the bucket key stays monotone); inclusive frame matches the old
    # ROWS UNBOUNDED PRECEDING AND CURRENT ROW over p DESC.
    neg = perp.withColumn("_negp", -F.col("p"))
    neg_bucket = F.floor(F.col("_negp") * 100)
    # Both running sums in ONE range_cumsum pass (r12): shared bucket
    # counts/offsets/window instead of the second call's offsets
    # branch re-executing the first (VERDICT r11 #3).
    cum = range_cumsum(
        neg, "_negp", ["cnt", "pos"],
        bucket_expr=neg_bucket, out_col=["cum_cnt", "cum_pos"],
        inclusive=True,
    )
    tot = perp.agg(
        F.sum("pos").alias("np"), F.sum("cnt").alias("ntot")
    )
    blocks = cum.crossJoin(F.broadcast(tot)).select(
        "cnt", "pos", "cum_cnt", "cum_pos", "np", "ntot"
    )
    terms = blocks.where(F.col("pos") > 0).select(
        F.round(
            F.col("pos").cast("double")
            / F.col("np")
            * F.col("cum_pos").cast("double")
            / F.col("cum_cnt"),
            9,
        )
        .cast("decimal(28,9)")
        .alias("t"),
        "np",
        "ntot",
    )
    return terms.agg(
        F.max("np").cast("long").alias("n_positive"),
        (F.max("ntot") - F.max("np")).cast("long").alias("n_negative"),
        F.round(F.sum("t").cast("double"), 6).alias("average_precision"),
        F.round(
            F.max("np").cast("double") / F.max("ntot"), 6
        ).alias("baseline_prevalence"),
    )


@query(
    "nsw_graph_ann_topk",
    oracle=None,
    tags=("similarity-graph", "nsw", "rows-only"),
)
def nsw_graph_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph ANN (single-layer NSW, `operators/similarity.py` module
    note): cell-blocked k-NN edges + md5 long links, then a 3-hop beam
    search from a √N entry set — the graph-traversal ANN paradigm
    (HNSW family) beside IVF/PQ/LSH. Rows-only by design, like
    hyperplane LSH: the traversal is approximate and its value is the
    paradigm's cost shape (per hop one broadcast-frontier join against
    the adjacency + one corpus stream; the corpus never shuffles).
    Recall floor (>=0.7 @ k=3 vs brute force on the smoke corpus —
    an adversarially hard unclustered uniform cloud) and determinism
    (run-to-run hash equality) are asserted in tests/test_llm_ops.py."""
    from .operators.similarity import nsw_build, nsw_search

    embeddings = load_table(spark, sf_dir, "embeddings")
    adj = nsw_build(embeddings, m=12)
    return nsw_search(
        adj, embeddings, query_ids=range(10), k=3, beam=16, hops=3
    )
