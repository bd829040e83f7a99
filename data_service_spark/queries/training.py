"""§2.K round-2 extensions — training-data curation operators.

The operators a large-scale pretraining-data pipeline runs between raw
ingest and tokenization: deterministic sampling / train-test splitting,
PII redaction, repetition-based quality signals (the Gopher rules family),
table profiling, and embedding-based dedup. Every key is pure DataFrame
algebra with a DuckDB oracle twin.

Determinism conventions (both engines must agree bit-for-bit):
- all "random" decisions are md5-hash buckets of a salted key string —
  Spark ``conv(substr(md5(s),1,8),16,10)``, DuckDB
  ``('0x'||substr(md5(s),1,8))::BIGINT`` (verified equal in llm_text.py);
  sampling by hash (not ``rand()``/``TABLESAMPLE``) is also what a real
  100 TB pipeline wants — reruns and backfills select the same rows;
- ratios round to 4dp.

Scale notes: every operator here is one scan + (at most) one hash
shuffle; nothing collects to the driver. The embedding-dedup pair join is
the exactness baseline whose scale twin is LSH bucketing (k_sim_ann_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_service_spark.io import load, load_parallel
from data_service_spark.registry import register

# ------------------------------------------------------------ sampling ----

# hash-bucket in [0, 100) from a salted key; identical text spliced into
# the Spark expression and the DuckDB oracle keeps the two in lockstep.
_SPARK_BUCKET = (
    "CAST(conv(substr(md5(concat('{salt}', CAST({key} AS STRING))), 1, 8),"
    " 16, 10) AS BIGINT) % 100"
)
_DUCK_BUCKET = (
    "('0x' || substr(md5(concat('{salt}', {key}::VARCHAR)), 1, 8))::BIGINT"
    " % 100"
)


@register(
    "k_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang,
           {_DUCK_BUCKET.format(salt="strat:", key="doc_id")} AS bucket
    FROM documents
    WHERE {_DUCK_BUCKET.format(salt="strat:", key="doc_id")}
          < CASE lang WHEN 'en' THEN 20 ELSE 50 END
    """,
)
def k_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) downsampling by deterministic hash bucket:
    keep 20% of 'en' (the majority stratum) and 50% of every other lang —
    the domain-rebalancing step of a training-data mix.

    Hash-bucket sampling instead of ``sampleBy``: same statistical effect,
    but reproducible across reruns/engines and push-down-able (the bucket
    predicate evaluates in the scan stage, no sampler state). One scan,
    zero shuffles.
    """
    d = load(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET.format(salt="strat:", key="doc_id"))
    rate = F.when(F.col("lang") == "en", 20).otherwise(50)
    return d.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") < rate
    )


@register(
    "k_split_train_test",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang,
             {_DUCK_BUCKET.format(salt="split:", key="doc_id")} AS bucket
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'valid'
                ELSE 'test' END AS split
    FROM b
    """,
)
def k_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/valid/test assignment by salted hash of
    the document key. Unlike ``randomSplit`` this is stable under reruns,
    re-partitioning, and engine changes — the property an eval-contamination
    audit needs. One scan, zero shuffles; the split column is a plain
    projection so downstream filters push into the parquet scan.
    """
    d = load(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET.format(salt="split:", key="doc_id"))
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "valid")
        .otherwise("test")
        .alias("split"),
    )


# ------------------------------------------------------ PII / redaction ----


@register(
    "k_text_pii_redact",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             concat('reach user', doc_id::VARCHAR, '@mail.example or 555-',
                    lpad((doc_id % 10000)::VARCHAR, 4, '0'), ' re: ',
                    substr(text, 1, 120)) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                            '[EMAIL]', 'g'),
             '\\b\\d{3}-\\d{4}\\b', '[PHONE]', 'g') AS redacted
    FROM synth
    """,
)
def k_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex-redact emails and phone-like tokens to typed
    placeholders — the compliance pass every training corpus runs.

    The corpus has no real PII, so each row first gets a deterministic
    synthetic contact line prepended (email + 555 phone built from doc_id);
    the redaction regexes then run over synthetic + real text, proving both
    the hit and the no-op path. Patterns are kept in the RE2 ∩ Java-regex
    common subset so Spark and DuckDB behave identically; DuckDB needs the
    explicit 'g' flag to match Spark's replace-all semantics. All JVM-side
    (`regexp_replace`), no UDF.
    """
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "),
        F.substring("text", 1, 120),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            raw, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"
        ),
        r"\b\d{3}-\d{4}\b",
        "[PHONE]",
    )
    return d.select("doc_id", redacted.alias("redacted"))


# ------------------------------------------- repetition quality signal ----


@register(
    "k_text_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), bi AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(words) - 1),
                            i -> array_to_string(words[i:i+1], ' ')) AS bigrams
      FROM w
    )
    SELECT doc_id,
           len(bigrams) AS n_bigrams,
           len(list_distinct(bigrams)) AS n_unique,
           round(1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams), 4)
             AS dup_bigram_ratio
    FROM bi
    """,
)
def k_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: fraction of duplicate word-bigrams per
    document (the Gopher-rules family of repetition filters — high values
    flag boilerplate/spam for removal before training).

    Bigrams are built JVM-side with higher-order functions
    (`transform(sequence(...))` + `slice`), the same shingle algebra as
    k_dedup_near at width 2 — no UDF, no explode/re-group shuffle: the
    whole signal is a per-row projection, so it composes with any scan at
    zero extra cost.
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    words = F.split(F.col("text"), " ")
    d = d.select("doc_id", words.alias("words")).filter(F.size("words") >= 2)
    bigrams = F.expr(
        "transform(sequence(1, size(words) - 1),"
        " i -> concat_ws(' ', slice(words, i, 2)))"
    )
    d = d.select("doc_id", bigrams.alias("bigrams"))
    n = F.size("bigrams")
    u = F.size(F.array_distinct("bigrams"))
    return d.select(
        "doc_id",
        n.alias("n_bigrams"),
        u.alias("n_unique"),
        F.round(F.lit(1.0) - u * F.lit(1.0) / n, 4).alias("dup_bigram_ratio"),
    )


# ----------------------------------------------------------- profiling ----


@register(
    "k_profile_table",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderstatus) AS n_statuses,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(avg(o_totalprice), 2) AS avg_price,
           CAST(min(o_orderdate) AS DATE) AS first_date,
           CAST(max(o_orderdate) AS DATE) AS last_date,
           count(*) - count(o_orderpriority) AS null_priorities
    FROM orders
    """,
)
def k_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (the data-quality summary a pipeline records
    per ingest batch): row count, key cardinalities, numeric min/max/avg,
    date range, null counts. All aggregates fuse into a single partial→final
    hash-aggregate pass over one scan — at 100 TB this is the cheapest
    full-table statement there is, and the stats feed skew/broadcast
    planning decisions.
    """
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
        (F.count(F.lit(1)) - F.count("o_orderpriority")).alias("null_priorities"),
    )


# ------------------------------------------------- embedding-space dedup ----


@register(
    "k_dedup_embedding",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_inner_product(a.v, b.v) >= 0.4
    )
    SELECT emb.vec_id, emb.label
    FROM embeddings emb
    WHERE emb.vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
)
def k_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal: drop every vector that has a
    smaller-id neighbor with cosine >= 0.4 (corpus max off-diagonal is
    ~0.51, so 0.4 exercises real drops); survivors remain. The one-pass
    min-id rule — not greedy sequential clustering — so the result is
    order-independent and both engines agree exactly.

    Reuses k_sim_threshold's blocked-GEMM pair finder (one BLAS multiply
    per block pair, O(n) Arrow traffic) and finishes with a broadcast
    left-anti join of the dropped-id set — no quadratic driver-side work.
    The scale twin bucket-prunes candidates with LSH first (k_sim_ann_sql);
    the threshold rule is unchanged.
    """
    from data_service_spark.queries.llm import k_sim_threshold

    pairs = k_sim_threshold(spark, sf_dir)
    dropped = pairs.select(F.col("vec_id_2").alias("vec_id")).distinct()
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return emb.join(F.broadcast(dropped), "vec_id", "left_anti")
