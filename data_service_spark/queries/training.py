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
    per block pair, O(n) Arrow traffic) and finishes with a left-anti
    join of the dropped-id set — no quadratic driver-side work. The
    dropped set grows with the dup mass, so no broadcast hint: AQE
    broadcasts it while small, shuffle-anti-joins when not. The scale
    twin bucket-prunes candidates with LSH first (k_sim_ann_sql); the
    threshold rule is unchanged.
    """
    from data_service_spark.queries.llm import k_sim_threshold

    pairs = k_sim_threshold(spark, sf_dir)
    dropped = pairs.select(F.col("vec_id_2").alias("vec_id")).distinct()
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return emb.join(dropped, "vec_id", "left_anti")


# -------------------------------------------------- sequence packing ----


@register(
    "k_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id,
           CAST(cum - n_tokens - floor((cum - n_tokens) / 512) * 512 AS BIGINT)
             AS pack_offset
    FROM c
    """,
)
def k_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): documents are laid out in
    doc_id order into a contiguous token stream and cut into 512-token
    training sequences; each doc gets the pack it STARTS in plus its offset
    there — the GPT-style packing manifest a dataloader consumes.

    One running-sum window over a global order is the only non-projection
    step. At 100 TB the global window is the known bottleneck (single sort
    task); the registered production twin is k_pack_sequences_sharded
    (`partitionBy(shard)` window, shard = md5 hash-bucket of doc_id) —
    identical algebra, embarrassingly parallel. The global form here is
    kept as the exact single-stream anchor.
    """
    d = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    t = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.select(
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start"),
    )
    return c.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("start") / 512).cast("long").alias("pack_id"),
        (F.col("start") - F.floor(F.col("start") / 512) * 512)
        .cast("long")
        .alias("pack_offset"),
    )


@register(
    "k_pack_sequences_sharded",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             ('0x' || substr(md5(concat('pack:', doc_id::VARCHAR)), 1, 8))
               ::BIGINT % 16 AS shard
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id,
           CAST(cum - n_tokens - floor((cum - n_tokens) / 512) * 512 AS BIGINT)
             AS pack_offset
    FROM c
    """,
)
def k_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, PRODUCTION SHAPE: documents are hash-bucketed
    into 16 shards (deterministic md5 bucket of doc_id) and each shard is
    packed independently into 512-token sequences — `(shard, pack_id,
    pack_offset)` is the manifest a sharded dataloader consumes.

    This is the scale twin of k_pack_sequences: the running-sum window is
    `partitionBy(shard)`, so the sort is per-shard and the whole operator
    is embarrassingly parallel (shard count scales with the cluster; at
    100 TB you'd use e.g. 2^14 shards, here 16 keeps the oracle readable).
    Cost vs the exact global form: one ragged tail per shard instead of
    one total — the standard trade every GPT-style dataloader makes. No
    global Sort appears in the plan (pinned in tests/test_plans.py).
    """
    d = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(
            "CAST(conv(substr(md5(concat('pack:', CAST(doc_id AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT) % 16"
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start"),
    )
    return c.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        F.floor(F.col("start") / 512).cast("long").alias("pack_id"),
        (F.col("start") - F.floor(F.col("start") / 512) * 512)
        .cast("long")
        .alias("pack_offset"),
    )


# ---------------------------------------------- contamination check ----


@register(
    "k_text_contamination",
    oracle="""
    WITH bench AS (
      SELECT DISTINCT unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 7),
               i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')))
               AS g
      FROM documents WHERE doc_id < 10
    ), cand AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 7),
               i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')))
               AS grams
      FROM documents WHERE doc_id >= 10 AND len(string_split(text, ' ')) >= 8
    ), ex AS (SELECT doc_id, unnest(grams) AS g FROM cand),
    hits AS (
      SELECT ex.doc_id, count(*) AS n_hit
      FROM ex JOIN bench ON ex.g = bench.g GROUP BY 1
    )
    SELECT c.doc_id, len(c.grams) AS n_grams,
           coalesce(h.n_hit, 0) AS n_hit,
           round(coalesce(h.n_hit, 0) * 1.0 / len(c.grams), 4) AS contam_ratio
    FROM cand c LEFT JOIN hits h ON c.doc_id = h.doc_id
    """,
)
def k_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: fraction of each candidate document's
    distinct 8-gram shingles that appear in a benchmark set (docs 0-9 stand
    in for an eval suite) — the decontamination gate run before training.

    The benchmark gram set is tiny relative to the corpus, so the membership
    probe is a BROADCAST left join against the exploded candidate grams: the
    100 TB side streams once, never shuffles, and ONE doc_id aggregate
    counts grams and hits together (a size(words) >= 8 doc always has ≥ 1
    gram, so no candidate is lost to the explode). Grams join as xxhash64
    ints (same trick as the dedup miners). The single-explode shape also
    evaluates the interpreted shingle lambda exactly once per candidate —
    the previous two-branch form (hits from the explode, n_grams from the
    grams array) recomputed it for the final join (2.3 → 1.0 s at sf0.1).
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    grams8 = (
        "array_distinct(transform(sequence(1, size(words) - 7),"
        " i -> xxhash64(concat_ws(' ', slice(words, i, 8)))))"
    )
    with_grams = d.withColumn("words", F.split("text", " "))
    bench = (
        with_grams.filter(F.col("doc_id") < 10)
        .select(F.explode(F.expr(grams8)).alias("g"))
        .distinct()
    )
    ex = (
        with_grams.filter((F.col("doc_id") >= 10) & (F.size("words") >= 8))
        .select("doc_id", F.explode(F.expr(grams8)).alias("g"))
    )
    marked = ex.join(
        F.broadcast(bench.withColumn("hit", F.lit(1))), "g", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(
                F.col("n_hit") * F.lit(1.0) / F.col("n_grams"), 4
            ).alias("contam_ratio"),
        )
    )


# ------------------------------------------- unigram-logprob quality ----


@register(
    "k_text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT term, count(*) AS n FROM tok GROUP BY 1
    ), tot AS (SELECT sum(n) AS total FROM tf)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(ln(tf.n * 1.0 / tot.total)), 4) AS avg_logprob
    FROM tok JOIN tf USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def k_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log-probability of each
    document under the corpus's own term distribution (low = rare-token
    gibberish, high = repetitive boilerplate — both tails get filtered).

    The term-frequency model is the session-memoized ``_unigram_counts``
    dictionary (r10: shared with collocations and the bigram LM — the
    corpus token stream reduces once per session); the per-doc token
    stream still explodes here and joins it back. At corpus scale the tf
    table is Zipf-compact (vocab ≪ tokens) so AQE broadcasts it; the
    one-row total is a literal cross join both engines fold away. No
    UDFs, pure log algebra.
    """
    from data_service_spark.queries.corpus_stats import _unigram_counts

    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = _unigram_counts(spark, sf_dir)
    total = tf.agg(F.sum("n").alias("total"))
    return (
        tok.join(tf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("n") * F.lit(1.0) / F.col("total"))), 4
            ).alias("avg_logprob"),
        )
    )


# ------------------------------------------- embedding quantization ----


@register(
    "k_embed_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS amax
      FROM e
    )
    SELECT vec_id, round(amax, 6) AS scale_max,
           CAST(list_sum(list_transform(v,
                  x -> CAST(floor(x / amax * 127) AS BIGINT))) AS BIGINT)
             AS q_sum,
           round(list_sum(list_transform(v,
                  x -> abs(x - floor(x / amax * 127) * amax / 127))), 6)
             AS recon_err
    FROM s
    """,
)
def k_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column: per-vector absmax
    scale, `floor(x/scale*127)` codes, plus the L1 reconstruction error —
    the 4× storage/bandwidth compression a 100 TB vector store applies
    before ANN indexing. `floor` (not `round`) keeps the code assignment
    free of half-way tie-break divergence between engines.

    All higher-order-function algebra on the array column — one projection,
    no explode, no shuffle; the checked outputs are scalar reductions
    (code sum, error sum) so the driver hash stays portable.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    amax = F.expr("array_max(transform(v, x -> abs(x)))")
    s = emb.select("vec_id", "v", amax.alias("amax"))
    q_sum = F.expr(
        "aggregate(transform(v, x -> cast(floor(x / amax * 127) AS bigint)),"
        " 0L, (a, x) -> a + x)"
    )
    err = F.expr(
        "aggregate(transform(v, x -> abs(x - floor(x / amax * 127) * amax / 127)),"
        " 0D, (a, x) -> a + x)"
    )
    return s.select(
        "vec_id",
        F.round("amax", 6).alias("scale_max"),
        q_sum.cast("long").alias("q_sum"),
        F.round(err, 6).alias("recon_err"),
    )


# -------------------------------------------- edit-distance near-dup ----


@register(
    "k_dedup_levenshtein",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             array_to_string((string_split(text, ' '))[1:6], ' ') AS pfx
      FROM documents
    )
    SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           levenshtein(a.pfx, b.pfx) AS edit_dist
    FROM p a JOIN p b ON a.doc_id < b.doc_id
    WHERE abs(length(a.pfx) - length(b.pfx)) <= 3
      AND levenshtein(a.pfx, b.pfx) <= 3
    """,
)
def k_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs on the 6-word document prefix
    (levenshtein <= 3) — the fuzzy-match complement to token-set Jaccard:
    catches character-level noise (OCR errors, typos) that word shingles
    miss.

    Levenshtein is quadratic per pair, so the Spark side prunes candidates
    FIRST with the edit-distance length bound |len1-len2| <= 3, realized as
    an equi-join on length bands (each right row fans to its 3 adjacent
    bands, so every qualifying pair meets exactly once — no theta join, no
    docs² nested loop). The oracle states the same predicate declaratively;
    both engines implement standard Levenshtein so distances agree ON
    ASCII — DuckDB's counts UTF-8 bytes where Spark counts codepoints
    ('café'→'cafe': 2 vs 1, r10 probe), a latent twin divergence bounded
    by the corpus audit (documents.text is ASCII at every shipped SF;
    re-audit on corpus regeneration). At 100 TB the band join is the
    difference between a shuffle-bounded candidate set and an impossible
    cross join.
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    p = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 6)).alias("pfx"),
    ).withColumn("l", F.length("pfx"))
    a = p.select(
        F.col("doc_id").alias("doc_id_1"),
        F.col("pfx").alias("pfx1"),
        F.col("l").alias("l1"),
        F.floor(F.col("l") / 4).alias("band"),
    )
    b = p.select(
        F.col("doc_id").alias("doc_id_2"),
        F.col("pfx").alias("pfx2"),
        F.col("l").alias("l2"),
        F.explode(
            F.array(
                F.floor(F.col("l") / 4) - 1,
                F.floor(F.col("l") / 4),
                F.floor(F.col("l") / 4) + 1,
            )
        ).alias("band"),
    )
    # Thresholded levenshtein (Spark 3.5+ third arg): banded DP that
    # early-exits above the bound — O(len·k) per pair instead of O(len²),
    # returns -1 when the distance exceeds 3. Also evaluates the distance
    # ONCE (the filter+select pair re-computed it). A/B at sf0.1:
    # 3.45 s → 0.66 s steady.
    return (
        a.join(b, ["band"])
        .filter(
            (F.col("doc_id_1") < F.col("doc_id_2"))
            & (F.abs(F.col("l1") - F.col("l2")) <= 3)
        )
        .withColumn("edit_dist", F.levenshtein("pfx1", "pfx2", 3))
        .filter(F.col("edit_dist") >= 0)
        .select("doc_id_1", "doc_id_2", "edit_dist")
    )


# --------------------------------------------------- domain mix report ----


@register(
    "k_mix_report",
    oracle="""
    WITH t AS (
      SELECT source, lang, len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), tot AS (SELECT sum(n_tok) AS total FROM t)
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           round(sum(n_tok) * 100.0 / tot.total, 4) AS pct_tokens
    FROM t, tot
    GROUP BY source, lang, tot.total
    """,
)
def k_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix report: documents and tokens by (source, lang) with each
    cell's share of the total token budget — the table a pretraining-mix
    decision is made from (and the input k_sample_stratified's rates come
    back to). One hash aggregate + a one-row broadcast total; at 100 TB
    this is a footnote-cost query that every curation iteration reruns."""
    d = load(spark, sf_dir, "documents")
    t = d.select("source", "lang", F.size(F.split("text", " ")).alias("n_tok"))
    tot = t.agg(F.sum("n_tok").alias("total"))
    return (
        t.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") * 100.0 / F.col("total"), 4).alias(
                "pct_tokens"
            ),
        )
    )


# ------------------------------------------ boilerplate segment dedup ----


@register(
    "k_dedup_segments",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ), segs AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(words) - 7, 8),
                    i -> array_to_string(words[i:i+7], ' '))) AS seg
      FROM w
    ), seg_docs AS (
      SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY 1
    )
    SELECT s.doc_id,
           count(*) AS n_segments,
           count(*) FILTER (WHERE d.nd > 1) AS n_shared,
           round(count(*) FILTER (WHERE d.nd > 1) * 1.0 / count(*), 4)
             AS boilerplate_ratio
    FROM segs s JOIN seg_docs d ON s.seg = d.seg
    GROUP BY 1
    """,
)
def k_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level boilerplate detection (the CCNet/RefinedWeb line-dedup
    family): documents are cut into consecutive non-overlapping 8-word
    segments; a segment appearing in more than one document is boilerplate
    (headers, footers, templates), and each doc reports its shared-segment
    ratio — the removal criterion runs downstream.

    Unlike the shingle miners this keeps WITHIN-doc duplicates and uses
    stride-8 chunking, so the exploded volume is tokens/8, not tokens — at
    100 TB the segment-frequency table is the only shuffle (hash agg with
    map-side partials over int64 xxhash64 keys) and the per-doc rollup
    re-aggregates on the already-partitioned doc_id.
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    segs = (
        d.withColumn("words", F.split("text", " "))
        .filter(F.size("words") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(words) - 7, 8),"
                    " i -> xxhash64(concat_ws(' ', slice(words, i, 8))))"
                )
            ).alias("seg"),
        )
    )
    # r14 (census; the k_text_dup_ngram_frac identity): "segment appears
    # in >1 distinct doc" is min(doc_id) != max(doc_id) over the segment
    # window — the countDistinct table and its join-back (which re-derived
    # the whole explode subtree as the second join side) collapse into ONE
    # exchange on seg. Within-doc duplicate occurrences keep their flag
    # per occurrence exactly as the row-preserving inner join did.
    from pyspark.sql.window import Window

    wseg = Window.partitionBy("seg")
    shared = F.min("doc_id").over(wseg) != F.max("doc_id").over(wseg)
    return (
        segs.withColumn("is_shared", shared)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.count(F.when(F.col("is_shared"), 1)).alias("n_shared"),
            F.round(
                F.count(F.when(F.col("is_shared"), 1))
                * F.lit(1.0) / F.count(F.lit(1)), 4
            ).alias("boilerplate_ratio"),
        )
    )


# -------------------------------------------------- curriculum buckets ----


@register(
    "k_curriculum",
    oracle="""
    WITH q AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tok,
             round(length(text) * 1.0 / len(string_split(text, ' ')), 4)
               AS mean_tok_len
      FROM documents
    )
    SELECT doc_id, lang, n_tok,
           ntile(5) OVER (PARTITION BY lang
                          ORDER BY mean_tok_len, doc_id) AS difficulty_band
    FROM q
    """,
)
def k_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: per-language difficulty bands (quintiles of a
    mean-token-length proxy, unique tiebreak) — the ordering signal a
    curriculum-learning schedule consumes (short-token 'easy' docs first).
    One window per language partition; at 100 TB the proxy column computes
    in the scan and ntile parallelizes across languages. Swap the proxy for
    a model-based difficulty score and the plumbing is unchanged."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.round(
            F.length("text") * F.lit(1.0) / F.size(F.split("text", " ")), 4
        ).alias("mean_tok_len"),
    )
    w = Window.partitionBy("lang").orderBy("mean_tok_len", "doc_id")
    return q.select(
        "doc_id", "lang", "n_tok", F.ntile(5).over(w).alias("difficulty_band")
    )


# ------------------------------------------------- SFT record assembly ----


@register(
    "k_sft_records",
    oracle="""
    WITH split_doc AS (
      SELECT doc_id,
             array_to_string((string_split(text, ' '))[1:10], ' ') AS prompt,
             array_to_string((string_split(text, ' '))[11:], ' ') AS completion
      FROM documents
      WHERE len(string_split(text, ' ')) > 10
    )
    SELECT doc_id,
           to_json(list_value(
             struct_pack(role := 'user', content := prompt),
             struct_pack(role := 'assistant', content := completion)
           ))::VARCHAR AS messages_json
    FROM split_doc
    """,
)
def k_sft_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT training-record assembly: each document becomes a chat-format
    JSONL record ([{role:user,...},{role:assistant,...}] — the fine-tuning
    wire format) with the first 10 words as the prompt and the remainder as
    the completion. String-only nested JSON serializes byte-identically in
    both engines (verified; raw doubles would not). Pure projection —
    composes with the sampling/split/dedup stages at zero extra cost, and
    the output column IS the shard line a trainer reads."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sd = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(words, 1, 10)).alias("prompt"),
        F.concat_ws(
            " ", F.expr("slice(split(text, ' '), 11, size(split(text, ' ')))")
        ).alias("completion"),
    ).filter(F.size(words) > 10)
    return sd.select(
        "doc_id",
        F.to_json(
            F.array(
                F.struct(
                    F.lit("user").alias("role"), F.col("prompt").alias("content")
                ),
                F.struct(
                    F.lit("assistant").alias("role"),
                    F.col("completion").alias("content"),
                ),
            )
        ).alias("messages_json"),
    )


# ------------------------------------------------ RAG chunking / DPO ----


@register(
    "k_chunk_rag",
    oracle="""
    SELECT doc_id,
           CAST(s / 150 AS BIGINT) AS chunk_idx,
           CAST(s AS BIGINT) AS chunk_start,
           substr(text, CAST(s + 1 AS INT), 200) AS chunk_text,
           CAST(length(substr(text, CAST(s + 1 AS INT), 200)) AS BIGINT)
             AS chunk_len
    FROM documents,
         LATERAL unnest(generate_series(0, n_chars - 1, 150)) AS t(s)
    """,
)
def k_chunk_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: fixed 200-char windows on a 150-char
    stride (50-char overlap so no retrieval-relevant span straddles a cut
    unseen), each chunk carrying (doc_id, chunk_idx, chunk_start)
    provenance back to its source row.

    ``explode(sequence(...))`` is a narrow generator — no shuffle at all;
    the chunk table inherits the scan's partitioning, which is exactly how
    a 100 TB corpus fans out to an embedding/indexing stage. Offsets are
    computed from ``n_chars`` (never a Python loop over text), so the 1.3×
    row fan-out is the only cost.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(150))
            ).alias("s"),
        )
        .select(
            "doc_id",
            (F.col("s") / 150).cast("long").alias("chunk_idx"),
            F.col("s").cast("long").alias("chunk_start"),
            F.expr("substr(text, s + 1, 200)").alias("chunk_text"),
            F.length(F.expr("substr(text, s + 1, 200)"))
            .cast("long")
            .alias("chunk_len"),
        )
    )


@register(
    "k_dpo_pairs",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY n_chars DESC, doc_id) AS rb,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY n_chars ASC, doc_id DESC) AS rw
      FROM documents
    )
    SELECT lang, source,
           max(CASE WHEN rb = 1 THEN doc_id END) AS chosen_doc,
           max(CASE WHEN rw = 1 THEN doc_id END) AS rejected_doc,
           CAST(max(CASE WHEN rb = 1 THEN n_chars END)
                - max(CASE WHEN rw = 1 THEN n_chars END) AS BIGINT)
             AS score_margin
    FROM ranked
    GROUP BY lang, source
    HAVING count(*) >= 2
    """,
)
def k_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair assembly: within each candidate group
    (lang, source) — the stand-in for "responses to one prompt" — emit one
    (chosen, rejected) pair: the highest- vs lowest-scoring member by the
    quality proxy ``n_chars``, with deterministic doc_id tiebreaks chosen
    OPPOSITE ways (asc for best, desc for worst) so a fully-tied group
    still yields two distinct docs; 1-member groups drop.

    One shuffle on the group key serves both window ranks and the final
    aggregation (same partitioning, Catalyst reuses the exchange). At
    100 TB the group key is a real prompt_id — high-cardinality, so the
    window partitions stay small and skew-free.
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    wb = Window.partitionBy("lang", "source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ww = Window.partitionBy("lang", "source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").desc()
    )
    ranked = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    return (
        ranked.groupBy("lang", "source")
        .agg(
            F.max(F.when(F.col("rb") == 1, F.col("doc_id"))).alias(
                "chosen_doc"
            ),
            F.max(F.when(F.col("rw") == 1, F.col("doc_id"))).alias(
                "rejected_doc"
            ),
            (
                F.max(F.when(F.col("rb") == 1, F.col("n_chars")))
                - F.max(F.when(F.col("rw") == 1, F.col("n_chars")))
            )
            .cast("long")
            .alias("score_margin"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 2)
        .drop("_n")
    )


@register(
    "k_winsorize_embed",
    oracle="""
    WITH vals AS (SELECT unnest(embedding)::DOUBLE AS x FROM embeddings),
    b AS (SELECT floor(quantile_cont(x, 0.05) * 10000) / 10000 AS lo,
                 floor(quantile_cont(x, 0.95) * 10000) / 10000 AS hi
          FROM vals)
    SELECT vec_id,
           CAST(len(list_filter(embedding,
                    v -> v::DOUBLE < lo OR v::DOUBLE > hi)) AS BIGINT)
             AS n_clipped,
           round(sqrt(list_sum(list_transform(embedding, v ->
             (CASE WHEN v::DOUBLE < lo THEN lo
                   WHEN v::DOUBLE > hi THEN hi
                   ELSE v::DOUBLE END)
             * (CASE WHEN v::DOUBLE < lo THEN lo
                     WHEN v::DOUBLE > hi THEN hi
                     ELSE v::DOUBLE END)))), 4) AS w_norm
    FROM embeddings, b
    """,
)
def k_winsorize_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust feature scaling (winsorization): clamp every embedding
    component to the corpus-global [p05, p95] band, reporting per vector
    how many components were clipped and the post-clip L2 norm — the
    outlier-taming pass run before quantization/indexing.

    The percentile bounds are a 2-value aggregate broadcast back over the
    table (explode→agg is map-side-combinable; the clip itself is a narrow
    higher-order ``transform``, JVM-side codegen, no Python). Bounds are
    floor-quantized to 4dp before clamping so both engines compare against
    bit-identical constants (floor, not round — Spark HALF_UP vs DuckDB
    HALF_EVEN, SURVEY.md §7.4).
    """
    emb = load(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.explode("embedding").alias("xf")
    ).select(F.col("xf").cast("double").alias("x"))
    b = vals.agg(
        (F.floor(F.percentile("x", F.lit(0.05)) * 10000) / 10000).alias("lo"),
        (F.floor(F.percentile("x", F.lit(0.95)) * 10000) / 10000).alias("hi"),
    )
    return emb.crossJoin(F.broadcast(b)).select(
        "vec_id",
        F.expr(
            "size(filter(embedding,"
            " v -> CAST(v AS DOUBLE) < lo OR CAST(v AS DOUBLE) > hi))"
        )
        .cast("long")
        .alias("n_clipped"),
        F.round(
            F.expr(
                "sqrt(aggregate(embedding, 0.0D, (a, v) -> a +"
                " (CASE WHEN CAST(v AS DOUBLE) < lo THEN lo"
                "       WHEN CAST(v AS DOUBLE) > hi THEN hi"
                "       ELSE CAST(v AS DOUBLE) END)"
                " * (CASE WHEN CAST(v AS DOUBLE) < lo THEN lo"
                "         WHEN CAST(v AS DOUBLE) > hi THEN hi"
                "         ELSE CAST(v AS DOUBLE) END)))"
            ),
            4,
        ).alias("w_norm"),
    )


# ------------------------------------------------- weighted sampling ----


@register(
    "k_sample_weighted",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln((('0x' || substr(md5(concat('wsamp:', doc_id::VARCHAR)), 1, 8))::BIGINT
                  + 0.5) / 4294967296.0) / n_chars AS k
      FROM documents
    )
    SELECT doc_id, n_chars, CAST(floor(k * 1e12) AS BIGINT) AS key_q
    FROM keyed ORDER BY k LIMIT 20
    """,
)
def k_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirtes exponential
    race): each doc draws a deterministic uniform u from a salted md5 hash
    and races with key ``-ln(u) / w``; the 20 smallest keys are the sample,
    with inclusion probability proportional to weight ``w = n_chars``.
    The importance-sampling primitive behind mix re-weighting ("sample
    long documents more") — reproducible across reruns and engines, unlike
    ``rand()``-based samplers.

    Scale: the race key is a zero-shuffle projection; top-20 runs as
    TakeOrderedAndProject (per-partition heads → driver merge of 20-row
    heaps), so a 100 TB corpus never sorts globally. Keys are emitted
    floor-quantized at 1e-12 so the hash compare is float-repr-safe.
    """
    d = load(spark, sf_dir, "documents")
    u = (
        "(CAST(conv(substr(md5(concat('wsamp:', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) + 0.5) / 4294967296.0"
    )
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.expr(f"-ln({u}) / n_chars").alias("k"),
    )
    return (
        keyed.orderBy("k")
        .limit(20)
        .select(
            "doc_id",
            "n_chars",
            F.floor(F.col("k") * F.lit(1e12)).cast("long").alias("key_q"),
        )
    )


# ------------------------------------------- quality-classifier score ----


@register(
    "k_quality_logreg",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             ln(1 + n_chars) AS f_len,
             len(string_split(text, ' ')) AS n_words,
             (n_chars - len(string_split(text, ' ')) + 1)
               * 1.0 / len(string_split(text, ' ')) AS mean_wlen,
             (n_chars - length(regexp_replace(text, '[0-9]', '', 'g')))
               * 1.0 / n_chars AS digit_ratio
      FROM documents
    )
    SELECT doc_id,
           CAST(floor(1.0 / (1.0 + exp(-(-8.0 + 1.6 * f_len + 0.5 * mean_wlen
                                         - 4.0 * digit_ratio))) * 1e6) AS BIGINT)
             AS score_q,
           CASE WHEN 1.0 / (1.0 + exp(-(-8.0 + 1.6 * f_len + 0.5 * mean_wlen
                                        - 4.0 * digit_ratio))) >= 0.5
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM f
    """,
)
def k_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a logistic-regression scorer over
    cheap text features (log length, mean word length, digit ratio) with
    FIXED published-style weights — the fasttext/classifier quality-filter
    shape with the learned weights swapped for deterministic constants so
    both engines agree bit-for-bit (a real pipeline broadcasts its trained
    coefficients through the identical plan).

    Scale: pure zero-shuffle projection; features and sigmoid are JVM
    codegen expressions evaluated in the scan stage, so the filter runs at
    read speed on 100 TB. Scores floor-quantized at 1e-6 for the hash.
    """
    return quality_scored(
        spark,
        sf_dir,
        F.expr(
            f"CASE WHEN {_QL_SCORE} >= 0.5 THEN 'keep' ELSE 'drop' END"
        ).alias("verdict"),
    )


_QL_NWORDS = "size(split(text, ' '))"
_QL_Z = (
    f"-8.0 + 1.6 * ln(1 + n_chars)"
    f" + 0.5 * ((n_chars - {_QL_NWORDS} + 1) * 1.0 / {_QL_NWORDS})"
    f" - 4.0 * ((n_chars - length(regexp_replace(text, '[0-9]', '')))"
    f"          * 1.0 / n_chars)"
)
_QL_SCORE = f"1.0 / (1.0 + exp(-({_QL_Z})))"
_QL_SCORE_Q = f"CAST(floor({_QL_SCORE} * 1e6) AS BIGINT)"


def quality_scored(spark: SparkSession, sf_dir: str, *extra) -> DataFrame:
    """One-scan scorer spine: ``(doc_id, score_q, *extra)`` with the extra
    columns taken from the SAME documents row as the score.

    Scorer consumers (AUC/Brier/calibration/threshold family) need label
    or length columns next to ``score_q`` and historically joined the
    registered scorer's projection back to documents ``USING (doc_id)`` —
    a self-join of each row with itself (doc_id is the corpus PK; every
    oracle keeps the explicit join, and selfcheck adjudicates the
    identity). Computing both sides in one select turns each consumer's
    2 scans + 1 join into 1 scan, zero joins (guide §2.4).
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.expr(_QL_SCORE_Q).alias("score_q"), *extra
    )


# -------------------------------------- DSIR importance resampling ----


@register(
    "k_dsir_weights",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), raw AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS r_cnt FROM tok GROUP BY term
    ), tgt AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS t_cnt
      FROM tok WHERE lang = 'en' GROUP BY term
    ), consts AS (
      SELECT (SELECT sum(r_cnt) FROM raw) AS r_tot,
             (SELECT coalesce(sum(t_cnt), 0) FROM tgt) AS t_tot,
             (SELECT count(*) FROM raw) AS v
    ), ratio AS (
      SELECT raw.term,
             ln(((coalesce(tgt.t_cnt, 0) + 1) / (c.t_tot + c.v))
                / ((raw.r_cnt + 1) / (c.r_tot + c.v))) AS lr
      FROM raw LEFT JOIN tgt USING (term) CROSS JOIN consts c
    )
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ratio.lr), 4) + 0.0 AS dsir_weight
    FROM tok JOIN ratio USING (term)
    GROUP BY tok.doc_id
    """,
)
def k_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    importance weights: score every raw document by how much its unigram
    profile looks like a target domain (here: the English sub-corpus)
    versus the raw pool — ``sum over tokens of ln(p_target / p_raw)`` with
    add-one smoothing over the shared vocabulary. Docs with high weight get
    upsampled into the training mix; pairs with `k_sample_weighted` as the
    selector.

    Scale: two Zipf-compact term-frequency aggregations (map-side partial),
    the per-term log-ratio table AQE-broadcasts back onto the token stream
    (vocab ≪ tokens), one final per-doc agg — the same three-shuffle shape
    as TF-IDF, no UDFs, no driver state.
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    # r13: raw and tgt are the SAME term-keyed reduce (tgt adds an en
    # filter) — one conditional aggregate computes both counts in a single
    # tokenize+explode pass (guide §2.2; the raw LEFT JOIN tgt disappears:
    # a term absent from the en slice simply counts 0, which coalesce
    # mapped to 0 anyway). NOT pinned: runtime exchange reuse already
    # executes the shared reduce once, and an A/B'd localCheckpoint only
    # added a materialization barrier (1.19s → 4.5s at sf0.1).
    cnt = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("r_cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("t_cnt"),
    )
    consts = cnt.agg(
        F.sum("r_cnt").alias("r_tot"),
        F.count(F.lit(1)).cast("double").alias("v"),
        F.coalesce(F.sum("t_cnt"), F.lit(0.0)).alias("t_tot"),
    )
    ratio = cnt.crossJoin(F.broadcast(consts)).select(
        "term",
        F.expr(
            "ln(((coalesce(t_cnt, 0) + 1) / (t_tot + v))"
            " / ((r_cnt + 1) / (r_tot + v)))"
        ).alias("lr"),
    )
    return (
        tok.join(ratio, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.round(F.sum("lr"), 4) + F.lit(0.0)).alias("dsir_weight"),
        )
    )


@register(
    "k_shard_balance",
    oracle="""
    WITH assign AS (
      SELECT doc_id,
             ('0x' || substr(md5(concat('shard:', doc_id::VARCHAR)), 1, 8))::BIGINT
               % 8 AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens
      FROM assign GROUP BY shard
    )
    SELECT shard, n_docs, tokens,
           round(tokens / (sum(tokens) OVER () / 8.0), 4) AS load_ratio
    FROM per
    """,
)
def k_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard assignment + balance audit: docs land on 8 shards by
    salted hash (deterministic, rerun-stable, no sampler state — the same
    convention as k_split_train_test), and the audit reports each shard's
    token mass against the ideal 1/8 share.

    This is the write-side planning op for a tokenized corpus: shard files
    feed data loaders round-robin, so token-mass imbalance becomes straggler
    time at training. Hash assignment keeps the pipeline one scan + one
    groupBy; if the audit's load_ratio drifts from 1.0 (pathological doc-
    length skew), the fix is salting the hash with a length band — same
    plan shape. The final OVER () window runs on 8 rows (shard count, not
    data size)."""
    d = load(spark, sf_dir, "documents")
    shard = F.expr(
        "CAST(conv(substr(md5(concat('shard:', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) % 8"
    )
    per = (
        d.select(
            shard.alias("shard"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
    )
    from pyspark.sql.window import Window

    total = F.sum("tokens").over(Window.partitionBy())
    return per.select(
        "shard",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / (total / F.lit(8.0)), 4).alias("load_ratio"),
    )


@register(
    "k_text_bigram_logprob",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), bgx AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(words) - 1),
               i -> {'w1': words[i],
                     'bigram': array_to_string(words[i:i+1], ' ')})) AS b
      FROM w
    ), bg AS (SELECT doc_id, b.w1 AS w1, b.bigram AS bigram FROM bgx),
    bgc AS (SELECT bigram, count(*) AS c_bg FROM bg GROUP BY 1),
    ctx AS (SELECT w1, count(*) AS c_w1 FROM bg GROUP BY 1),
    v AS (
      SELECT count(DISTINCT term) AS vocab
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(ln((c_bg + 1.0) / (c_w1 + vocab))), 4) AS avg_logprob
    FROM bg JOIN bgc USING (bigram) JOIN ctx USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def k_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity proxy: per-doc mean log P(w2|w1) under the
    corpus's own add-one-smoothed bigram model — the conditional upgrade
    of k_text_unigram_logprob (catches incoherent *sequences* that a
    unigram model scores as normal, e.g. shuffled text).

    Three corpus model tables — bigram counts, context counts, vocab
    size — then one join back to the per-doc bigram stream. r10: the
    model tables are dictionary-sized algebra over the session-memoized
    ``_bigram_counts`` / ``_unigram_counts`` reduces (shared with the
    collocation and Kneser–Ney keys), so only the per-doc stream
    explodes here; it joins the bigram table on (w1, w2) — equivalent
    to the oracle's "w1 w2" string key since whitespace tokens cannot
    contain the separator. Same plan family at 100 TB: posting-style
    joins keyed by n-gram, no UDFs.
    """
    from data_service_spark.queries.corpus_stats import (
        _bigram_counts,
        _unigram_counts,
    )

    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    w = d.select("doc_id", F.split("text", " ").alias("words")).filter(
        F.size("words") >= 2
    )
    bg = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1),"
                " i -> struct(element_at(words, i) AS w1,"
                "             element_at(words, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    bgm = _bigram_counts(spark, sf_dir)
    bgc = bgm.select("w1", "w2", F.col("c").alias("c_bg"))
    ctx = bgm.groupBy("w1").agg(F.sum("c").alias("c_w1"))
    v = _unigram_counts(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("vocab")
    )
    return (
        bg.join(bgc, ["w1", "w2"])
        # ctx is vocab-sized (per-w1 counts) — no broadcast hint, AQE
        # decides; v is a 1-row scalar and stays broadcast
        .join(ctx, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(
                        (F.col("c_bg") + 1.0) / (F.col("c_w1") + F.col("vocab"))
                    )
                ),
                4,
            ).alias("avg_logprob"),
        )
    )


@register(
    "k_source_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ), cs AS (
      SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2
    ), ts AS (SELECT source, sum(n) AS t_s FROM cs GROUP BY 1),
    c AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
    t AS (SELECT sum(n) AS total FROM c),
    grid AS (
      SELECT ts.source, c.term, ts.t_s, c.n AS cn, t.total
      FROM ts CROSS JOIN c CROSS JOIN t
    ), parts AS (
      SELECT g.source,
             COALESCE(cs.n, 0) * 1.0 / g.t_s AS p,
             g.cn * 1.0 / g.total AS q
      FROM grid g LEFT JOIN cs ON g.source = cs.source AND g.term = cs.term
    )
    SELECT source,
           round(0.5 * sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2))
                                ELSE 0 END)
               + 0.5 * sum(q * ln(q / ((p + q) / 2))), 6) AS js_divergence
    FROM parts GROUP BY source
    """,
)
def k_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's unigram distribution
    and the corpus-wide distribution — the drift/outlier audit a data-mix
    owner runs per ingest batch (a source whose JS jumps is a scrape gone
    wrong or a domain shift; JS is symmetric and bounded in [0, ln 2], so
    thresholds transfer across corpora).

    Everything after tokenization is vocab-sized, not corpus-sized: term
    counts are Zipf-compact aggregates, the source×term grid is a cross
    join of two tiny broadcast relations, and the final sum is one
    per-source fold. Missing-term cells (p=0) contribute only the q-side
    term, exactly as the closed form requires — no smoothing needed
    because the mixture m = (p+q)/2 is positive wherever q > 0."""
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    # r13: every downstream table re-aggregates from the ONE Zipf-compact
    # (source, term) count table — the corpus-wide term counts previously
    # re-ran the whole tokenize+explode as a second corpus pass (Catalyst
    # does not share the explode subtree across aggregation branches),
    # and the table feeds three branches (ts, c, the grid join), so it is
    # pinned with localCheckpoint: vocab-sized, never corpus-sized.
    # Interleaved A/B at sf0.1: 2.49 s (two passes) -> 1.99 s (derived c)
    # -> 1.46 s (derived c + checkpoint).
    cs = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint()
    ts = cs.groupBy("source").agg(F.sum("n").alias("t_s"))
    c = cs.groupBy("term").agg(F.sum("n").alias("cn"))
    t = c.agg(F.sum("cn").alias("total"))
    # the cross join replicates the SOURCE spine (a handful of rows) over
    # the vocab-sized term counts — broadcasting the tiny side keeps the
    # vocab partition-parallel (broadcasting c would ship the whole
    # vocabulary to every task and cap the grid at ts's parallelism)
    grid = c.crossJoin(F.broadcast(ts)).crossJoin(F.broadcast(t))
    parts = grid.join(cs, ["source", "term"], "left").select(
        "source",
        (F.coalesce(F.col("n"), F.lit(0)) * 1.0 / F.col("t_s")).alias("p"),
        (F.col("cn") * 1.0 / F.col("total")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    p_side = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
    q_side = F.col("q") * F.log(F.col("q") / m)
    return parts.groupBy("source").agg(
        F.round(0.5 * F.sum(p_side) + 0.5 * F.sum(q_side), 6).alias(
            "js_divergence"
        )
    )


@register(
    "k_retention_cohorts",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ), sizes AS (
      SELECT cohort_day, count(*) AS cohort_n FROM first GROUP BY 1
    ), active AS (
      SELECT f.cohort_day,
             datediff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
               AS day_offset,
             count(DISTINCT e.user_id) AS n_active
      FROM events e JOIN first f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT a.cohort_day, a.day_offset, s.cohort_n, a.n_active,
           round(a.n_active * 1.0 / s.cohort_n, 4) AS retention
    FROM active a JOIN sizes s USING (cohort_day)
    """,
)
def k_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, then
    the fraction of each cohort active again N days later — the engagement
    rollup every event pipeline serves, and (for training-data work) the
    freshness decay curve of a feedback/interaction stream.

    Two shuffles total: the per-user min (first touch) and the
    (cohort, offset) distinct-count; the cohort-size side is dimension-
    sized and broadcasts back. At 100 TB the distinct-count is the hot
    aggregate — it partial-aggregates per partition, and the mergeable-
    sketch variant (approx_count_distinct / d_agg_hll_sketch's two-level
    rollup) swaps in when exactness isn't required."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("DAY", F.col("ts"))
    first = e.groupBy("user_id").agg(
        F.min(day).cast("date").alias("cohort_day")
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    active = (
        e.join(first, "user_id")
        .select(
            "cohort_day",
            F.datediff(day.cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return active.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "cohort_n",
        "n_active",
        F.round(F.col("n_active") * 1.0 / F.col("cohort_n"), 4).alias(
            "retention"
        ),
    )


@register(
    "k_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
      FROM daily GROUP BY 1
    )
    SELECT day, event_type, n,
           round(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0 END, 4) AS z,
           CASE WHEN sd > 0 AND abs((n - mu) / sd) >= 2 THEN TRUE
                ELSE FALSE END AS is_anomaly
    FROM daily JOIN stats USING (event_type)
    """,
)
def k_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly screen: per-(day, event_type) counts scored
    against that type's own daily mean/stddev; |z| ≥ 2 flags the day — the
    monitor that catches a broken scraper (collapse) or a bot flood
    (spike) before the batch joins the corpus.

    The daily rollup is the only data-sized aggregate; the per-type stats
    table is dimension-sized and broadcasts back. The same two-level shape
    incrementalizes: k_incremental_agg maintains the daily counts, so the
    monitor's marginal cost per new day is one partial aggregate."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = F.when(
        F.col("sd") > 0, (F.col("n") - F.col("mu")) / F.col("sd")
    ).otherwise(0.0)
    return daily.join(F.broadcast(stats), "event_type").select(
        "day",
        "event_type",
        "n",
        F.round(z, 4).alias("z"),
        (F.when(F.col("sd") > 0, F.abs((F.col("n") - F.col("mu")) / F.col("sd")))
         .otherwise(0.0) >= 2).alias("is_anomaly"),
    )


@register(
    "k_sample_temperature",
    oracle="""
    WITH s AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    w AS (SELECT source, n, pow(n, 0.5) AS wt FROM s)
    SELECT source, n,
           round(n * 1.0 / sum(n) OVER (), 6) AS p_natural,
           round(wt / sum(wt) OVER (), 6) AS p_temp,
           round((wt / sum(wt) OVER ()) / (n * 1.0 / sum(n) OVER ()), 4)
             AS boost
    FROM w
    """,
)
def k_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/multi-domain
    sampling rule from mBERT/XLM-R and T5's mixture: p_i ∝ n_i^alpha with
    alpha=0.5): per-source natural share, temperature share, and the
    upsampling boost low-resource sources receive. This is the table a
    data-mix controller feeds to the sampler.

    One scan + one groupBy; the unpartitioned windows run over the
    POST-AGGREGATE frame (one row per source — bounded by source
    cardinality, not corpus size), the same deliberate tiny-global-window
    exception documented for f_sort_verify.
    """
    from pyspark.sql.window import Window

    s = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("wt", F.pow(F.col("n"), 0.5))
    )
    w = Window.partitionBy()
    p_nat = F.col("n") * 1.0 / F.sum("n").over(w)
    p_temp = F.col("wt") / F.sum("wt").over(w)
    return s.select(
        "source",
        "n",
        F.round(p_nat, 6).alias("p_natural"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / p_nat, 4).alias("boost"),
    )


@register(
    "k_eval_heldout_ppl",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text,
             {_DUCK_BUCKET.format(salt="ppl:", key="doc_id")} < 80 AS is_train
      FROM documents
    ), w AS (
      SELECT doc_id, is_train, string_split(text, ' ') AS words FROM split
      WHERE len(string_split(text, ' ')) >= 2
    ), bgx AS (
      SELECT doc_id, is_train,
             unnest(list_transform(generate_series(1, len(words) - 1),
               i -> {{'w1': words[i],
                      'bigram': array_to_string(words[i:i+1], ' ')}})) AS b
      FROM w
    ), bg AS (SELECT doc_id, is_train, b.w1 AS w1, b.bigram AS bigram
              FROM bgx),
    bgc AS (SELECT bigram, count(*) AS c_bg FROM bg WHERE is_train
            GROUP BY 1),
    ctx AS (SELECT w1, count(*) AS c_w1 FROM bg WHERE is_train GROUP BY 1),
    v AS (
      SELECT count(DISTINCT term) AS vocab
      FROM (SELECT unnest(string_split(text, ' ')) AS term
            FROM split WHERE is_train)
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(ln((coalesce(c_bg, 0) + 1.0)
                        / (coalesce(c_w1, 0) + vocab))), 4) AS avg_logprob
    FROM bg
    LEFT JOIN bgc USING (bigram) LEFT JOIN ctx USING (w1) CROSS JOIN v
    WHERE NOT is_train
    GROUP BY doc_id
    """,
)
def k_eval_heldout_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity proxy: fit the add-one-smoothed bigram model on
    the hash-bucket TRAIN split (80%) only, score the HELD-OUT docs' mean
    log P(w2|w1). Unlike k_text_bigram_logprob (which scores the corpus
    under its own statistics), this is the honest generalization
    measurement — unseen held-out bigrams fall back to the smoothing
    floor — i.e. the eval loop a data-curation pipeline runs to compare
    corpus variants.

    Same posting-list plan family: ONE train-side bigram-count aggregate
    (one hash shuffle, Zipf-compact result); the context-count table is
    DERIVED from it — c_w1 = Σ c_bg over bigrams sharing the first token,
    an exact integer identity (every train bigram row contributes 1 to
    its w1's count), so the r13 rewrite folds what was a second
    corpus-sized explode+shuffle into a vocabulary-sized re-aggregate of
    the count table (the "derive from the count table" pattern shared
    with k_source_divergence). A broadcast scalar vocab, then LEFT joins
    back to the held-out bigram stream (left: held-out bigrams may be
    unseen in train). The split predicate is the deterministic md5
    bucket, so train/test membership is reproducible across engines and
    reruns; the oracle keeps the two-aggregate text (it is not the hot
    path) and hashes identically.
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id").withColumn(
        "is_train",
        F.expr(_SPARK_BUCKET.format(salt="ppl:", key="doc_id")) < 80,
    )
    w = d.select("doc_id", "is_train", F.split("text", " ").alias("words")).filter(
        F.size("words") >= 2
    )
    bg = w.select(
        "doc_id",
        "is_train",
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1),"
                " i -> struct(element_at(words, i) AS w1,"
                "             concat_ws(' ', slice(words, i, 2)) AS bigram))"
            )
        ).alias("b"),
    ).select("doc_id", "is_train", F.col("b.w1").alias("w1"), F.col("b.bigram").alias("bigram"))
    train = bg.filter("is_train")
    # The bigram count table is Zipf-compact (vocabulary-sized, not
    # corpus-sized) — pin it so the derived context table below reads the
    # materialized counts instead of re-deriving the whole explode+agg
    # subtree (DataFrame reuse does not dedupe plan subtrees).
    bgc = (
        train.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .localCheckpoint()
    )
    # c_w1 = Σ c_bg over the first token: tokens are space-split (w1 has
    # no spaces), so the first space-delimited field of `bigram` IS w1 —
    # the context table re-aggregates the compact count table instead of
    # re-exploding the corpus.
    ctx = (
        bgc.groupBy(
            F.substring_index("bigram", " ", 1).alias("w1")
        ).agg(F.sum("c_bg").alias("c_w1"))
    )
    v = (
        d.filter("is_train")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .agg(F.countDistinct("term").alias("vocab"))
    )
    lp = F.log(
        (F.coalesce(F.col("c_bg"), F.lit(0)) + 1.0)
        / (F.coalesce(F.col("c_w1"), F.lit(0)) + F.col("vocab"))
    )
    return (
        bg.filter(~F.col("is_train"))
        .join(bgc, "bigram", "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(lp), 4).alias("avg_logprob"),
        )
    )


from data_service_spark.registry import ORACLES as _REG_ORACLES  # noqa: E402


@register(
    "k_filter_gate",
    # Composes the three registered signal pipelines verbatim as CTEs and
    # applies the gate on top — the oracle checks signals AND decision.
    oracle=f"""
    WITH q AS ({_REG_ORACLES["k_text_quality"]}),
         r AS ({_REG_ORACLES["k_text_repetition"]}),
         l AS ({_REG_ORACLES["k_text_langid"]})
    SELECT q.doc_id,
           concat_ws('|',
             CASE WHEN q.quality = 'low' THEN 'low_quality' END,
             CASE WHEN q.n_tokens < 20 THEN 'too_short' END,
             CASE WHEN r.dup_bigram_ratio > 0.08 THEN 'repetitive' END,
             CASE WHEN l.marker_ratio < 0.005 THEN 'lang_uncertain' END
           ) AS reasons,
           (q.quality <> 'low' AND q.n_tokens >= 20
            AND coalesce(r.dup_bigram_ratio, 0) <= 0.08
            AND l.marker_ratio >= 0.005) AS keep
    FROM q
    LEFT JOIN r ON q.doc_id = r.doc_id
    JOIN l ON q.doc_id = l.doc_id
    """,
)
def k_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation DECISION layer: fold the registered quality signals —
    heuristic quality tier (k_text_quality), bigram repetition
    (k_text_repetition, Gopher rules family), language-marker confidence
    (k_text_langid) — into one keep/drop verdict per document with a
    pipe-joined reason trail (the audit column a data lineage system
    stores next to every drop). LEFT join on the repetition side: docs
    with < 2 tokens carry no bigrams and must not be lost by the gate.

    One join tree over three already-single-scan pipelines, all keyed by
    doc_id. The three signal subtrees each scan the source once (Catalyst
    does not fuse independent subtrees); at 100 TB a production run
    materializes the per-doc signal table once per ingest batch and the
    gate becomes a metadata-only re-filter — the decision logic here is
    that artifact's defining query.
    """
    from data_service_spark.queries.llm_text import k_text_langid, k_text_quality

    q = k_text_quality(spark, sf_dir).select("doc_id", "quality", "n_tokens")
    r = k_text_repetition(spark, sf_dir).select("doc_id", "dup_bigram_ratio")
    l = k_text_langid(spark, sf_dir).select("doc_id", "marker_ratio")
    j = q.join(r, "doc_id", "left").join(l, "doc_id")
    reasons = F.concat_ws(
        "|",
        F.when(F.col("quality") == "low", "low_quality"),
        F.when(F.col("n_tokens") < 20, "too_short"),
        F.when(F.col("dup_bigram_ratio") > 0.08, "repetitive"),
        F.when(F.col("marker_ratio") < 0.005, "lang_uncertain"),
    )
    keep = (
        (F.col("quality") != "low")
        & (F.col("n_tokens") >= 20)
        & (F.coalesce(F.col("dup_bigram_ratio"), F.lit(0.0)) <= 0.08)
        & (F.col("marker_ratio") >= 0.005)
    )
    return j.select("doc_id", reasons.alias("reasons"), keep.alias("keep"))


@register(
    "k_mix_epochs",
    oracle="""
    WITH tok AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY 1
    ), w AS (SELECT source, avail, pow(avail, 0.5) AS wt FROM tok),
    tot AS (SELECT sum(avail) AS total_avail, sum(wt) AS total_wt FROM w)
    SELECT source, avail,
           round(3.0 * total_avail * wt / total_wt, 1) AS target_tokens,
           round(3.0 * total_avail * wt / total_wt / avail, 4) AS epochs_raw,
           round(least(3.0 * total_avail * wt / total_wt / avail, 4.0), 4)
             AS epochs_capped,
           round(least(3.0 * total_avail * wt / total_wt, 4.0 * avail), 1)
             AS sampled_tokens
    FROM w CROSS JOIN tot
    """,
)
def k_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped mixing schedule for a data-constrained run
    (Muennighoff et al. 2023, arXiv:2305.16264: repeating data up to ~4
    epochs is nearly as good as fresh data; beyond that, returns decay):
    token budget = 3x the corpus, split by temperature weights (alpha=0.5
    on token mass), each source's implied epoch count capped at 4 — the
    allocation table that decides how often each source repeats in the
    final shuffle.

    One scan for per-source token mass, a one-row broadcast of the
    (total, total-weight) pair, pure codegen arithmetic after that — the
    same bounded-by-source-cardinality shape as k_sample_temperature, so
    the 100 TB cost is the token-count scan alone.
    """
    tok = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("avail"))
        .withColumn("wt", F.pow(F.col("avail"), 0.5))
    )
    tot = tok.agg(
        F.sum("avail").alias("total_avail"), F.sum("wt").alias("total_wt")
    )
    target = F.lit(3.0) * F.col("total_avail") * F.col("wt") / F.col("total_wt")
    return tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail",
        F.round(target, 1).alias("target_tokens"),
        F.round(target / F.col("avail"), 4).alias("epochs_raw"),
        F.round(F.least(target / F.col("avail"), F.lit(4.0)), 4).alias(
            "epochs_capped"
        ),
        F.round(
            F.least(target, F.lit(4.0) * F.col("avail")), 1
        ).alias("sampled_tokens"),
    )


@register(
    "k_drift_psi",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             CASE WHEN {_DUCK_BUCKET.format(salt="split:", key="doc_id")} < 90
                  THEN 'train' ELSE 'heldout' END AS split,
             least(len(string_split(text, ' ')) // 20, 5) AS bucket
      FROM documents
    ), counts AS (
      SELECT bucket,
             count(*) FILTER (split = 'train') AS n_a,
             count(*) FILTER (split = 'heldout') AS n_b
      FROM b GROUP BY bucket
    ), tot AS (
      SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS nb FROM counts
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           round((n_a + 0.5) / (ta + 0.5 * nb), 6) AS p_train,
           round((n_b + 0.5) / (tb + 0.5 * nb), 6) AS p_heldout,
           round(((n_a + 0.5) / (ta + 0.5 * nb)
                  - (n_b + 0.5) / (tb + 0.5 * nb))
                 * ln(((n_a + 0.5) / (ta + 0.5 * nb))
                      / ((n_b + 0.5) / (tb + 0.5 * nb))), 6) AS psi_contrib
    FROM counts CROSS JOIN tot
    """,
)
def k_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index over document-length buckets between the
    registered train split and its held-out complement — the distribution-
    drift monitor (PSI > 0.2 = population shifted, retrain/re-curate).
    Laplace-smoothed (+0.5 per bucket) so empty buckets contribute finite
    terms; each bucket's signed contribution is reported (the total is
    their sum, and per-bucket attribution is what the monitor alerts on).

    One scan + one 6-bucket aggregate + a broadcast one-row total — the
    same bounded-post-agg shape as k_mix_epochs; at 100 TB PSI is computed
    per ingest batch against the frozen reference histogram, and the
    reference side here (the train split) stands in for that stored
    profile."""
    d = load(spark, sf_dir, "documents")
    bucket_hash = F.expr(_SPARK_BUCKET.format(salt="split:", key="doc_id"))
    b = d.select(
        F.when(bucket_hash < 90, "train").otherwise("heldout").alias("split"),
        F.least(
            F.floor(F.size(F.split("text", " ")) / 20), F.lit(5)
        ).alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("n_a"),
        F.count(F.when(F.col("split") == "heldout", 1)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("ta"),
        F.sum("n_b").alias("tb"),
        F.count(F.lit(1)).alias("nb"),
    )
    pa = (F.col("n_a") + 0.5) / (F.col("ta") + 0.5 * F.col("nb"))
    pb = (F.col("n_b") + 0.5) / (F.col("tb") + 0.5 * F.col("nb"))
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.round(pa, 6).alias("p_train"),
        F.round(pb, 6).alias("p_heldout"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_contrib"),
    )


@register(
    "k_ab_ztest",
    oracle="""
    WITH cohorts AS (
      SELECT user_id % 2 AS cohort,
             count(DISTINCT user_id) AS n_users,
             count(DISTINCT CASE WHEN event_type = 'purchase'
                                      AND value > 200
                                 THEN user_id END) AS n_converted
      FROM events GROUP BY 1
    ), wide AS (
      SELECT
        max(CASE WHEN cohort = 0 THEN n_users END) AS n0,
        max(CASE WHEN cohort = 0 THEN n_converted END) AS c0,
        max(CASE WHEN cohort = 1 THEN n_users END) AS n1,
        max(CASE WHEN cohort = 1 THEN n_converted END) AS c1
      FROM cohorts
    )
    SELECT n0, c0, n1, c1,
           round(c0 * 1.0 / n0, 6) AS rate_a,
           round(c1 * 1.0 / n1, 6) AS rate_b,
           round((c0 * 1.0 / n0 - c1 * 1.0 / n1)
                 / sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                        * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 4) AS z_stat,
           abs((c0 * 1.0 / n0 - c1 * 1.0 / n1)
               / sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                      * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1))) > 1.96 AS significant_95
    FROM wide
    """,
)
def k_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test in the engine: purchase conversion of the
    even-user cohort vs the odd-user cohort (the deterministic stand-in
    for an experiment assignment column), pooled-variance z statistic and
    the 95% verdict — the A/B readout an event pipeline serves without
    exporting to a stats package.

    One distinct-aggregate over (cohort, user) then pure scalar algebra on
    a two-row frame. At 100 TB the distinct-user counts are the only real
    work (hash agg keyed by user); everything after is driver-free
    arithmetic on a broadcast row."""
    e = load(spark, sf_dir, "events")
    cohorts = (
        e.select(
            (F.col("user_id") % 2).alias("cohort"),
            "user_id",
            "event_type",
            "value",
        )
        .groupBy("cohort")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 200),
                    F.col("user_id"),
                )
            ).alias("n_converted"),
        )
    )
    wide = cohorts.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("cohort") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_converted"))).alias("c1"),
    )
    ra = F.col("c0") * 1.0 / F.col("n0")
    rb = F.col("c1") * 1.0 / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = (ra - rb) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        "n0", "c0", "n1", "c1",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


@register(
    "k_pipeline_e2e",
    # The whole curation pipeline as ONE declarative plan: the oracle
    # chains the registered gate / exact-dedup / near-dup-cluster oracles
    # verbatim and reads the ledger off a single conditional aggregate.
    oracle=f"""
    WITH gate AS ({_REG_ORACLES["k_filter_gate"]}),
    exact AS ({_REG_ORACLES["k_dedup_exact"]}),
    clusters AS ({_REG_ORACLES["k_dedup_clusters"]}),
    flags AS (
      SELECT d.doc_id, len(string_split(d.text, ' ')) AS nt,
             g.keep AS gated,
             d.doc_id IN (SELECT keep_id FROM exact) AS exact_keep,
             c.cluster_id = d.doc_id AS near_keep,
             {_DUCK_BUCKET.format(salt="split:", key="d.doc_id")} < 90
               AS is_train
      FROM documents d
      JOIN gate g ON d.doc_id = g.doc_id
      JOIN clusters c ON d.doc_id = c.doc_id
    ), agg AS (
      SELECT
        count(*) AS n1, sum(nt) AS t1,
        count(*) FILTER (gated) AS n2, sum(nt) FILTER (gated) AS t2,
        count(*) FILTER (gated AND exact_keep) AS n3,
        sum(nt) FILTER (gated AND exact_keep) AS t3,
        count(*) FILTER (gated AND exact_keep AND near_keep) AS n4,
        sum(nt) FILTER (gated AND exact_keep AND near_keep) AS t4,
        count(*) FILTER (gated AND exact_keep AND near_keep AND is_train)
          AS n5,
        sum(nt) FILTER (gated AND exact_keep AND near_keep AND is_train)
          AS t5
      FROM flags
    )
    SELECT 'raw' AS stage, 1 AS stage_ord, n1 AS n_docs,
           CAST(t1 AS BIGINT) AS n_tokens FROM agg
    UNION ALL SELECT 'gated', 2, n2, CAST(t2 AS BIGINT) FROM agg
    UNION ALL SELECT 'exact_dedup', 3, n3, CAST(t3 AS BIGINT) FROM agg
    UNION ALL SELECT 'near_dedup', 4, n4, CAST(t4 AS BIGINT) FROM agg
    UNION ALL SELECT 'train_split', 5, n5, CAST(t5 AS BIGINT) FROM agg
    """,
)
def k_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation funnel in one plan: raw corpus → quality
    gate (k_filter_gate) → exact-dedup survivors (k_dedup_exact) →
    near-dup cluster representatives (k_dedup_clusters) → train split —
    reported as the stage ledger (docs + tokens surviving each stage),
    i.e. the headline table of a curation run report. Masks are computed
    corpus-wide and applied jointly (the standard practice: each stage's
    verdict is independent of the others' filtering, so stages can be
    audited and re-ordered without recomputation).

    Everything composes as DataFrame algebra: the three pipelines join on
    doc_id, the five ledger rows come from ONE conditional aggregate over
    the flag table plus a stack — no extra scan per stage. At 100 TB this
    is the plan a daily curation job materializes; its cost is the
    underlying pipelines, the ledger itself is free.
    """
    from data_service_spark.queries.llm import k_dedup_clusters, k_dedup_exact

    d = load_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.size(F.split("text", " ")).alias("nt")
    )
    gate = k_filter_gate(spark, sf_dir).select("doc_id", F.col("keep").alias("gated"))
    exact = k_dedup_exact(spark, sf_dir).select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("exact_keep")
    )
    clusters = k_dedup_clusters(spark, sf_dir).select(
        "doc_id", (F.col("cluster_id") == F.col("doc_id")).alias("near_keep")
    )
    is_train = F.expr(_SPARK_BUCKET.format(salt="split:", key="doc_id")) < 90
    flags = (
        d.join(gate, "doc_id")
        .join(exact, "doc_id", "left")
        .join(clusters, "doc_id")
        .select(
            "nt",
            "gated",
            F.coalesce(F.col("exact_keep"), F.lit(False)).alias("exact_keep"),
            "near_keep",
            is_train.alias("is_train"),
        )
    )
    g = F.col("gated")
    ge = g & F.col("exact_keep")
    gen_ = ge & F.col("near_keep")
    gent = gen_ & F.col("is_train")
    agg = flags.agg(
        F.count(F.lit(1)).alias("n1"), F.sum("nt").alias("t1"),
        F.count(F.when(g, 1)).alias("n2"), F.sum(F.when(g, F.col("nt"))).alias("t2"),
        F.count(F.when(ge, 1)).alias("n3"), F.sum(F.when(ge, F.col("nt"))).alias("t3"),
        F.count(F.when(gen_, 1)).alias("n4"), F.sum(F.when(gen_, F.col("nt"))).alias("t4"),
        F.count(F.when(gent, 1)).alias("n5"), F.sum(F.when(gent, F.col("nt"))).alias("t5"),
    )
    return agg.selectExpr(
        "stack(5,"
        " 'raw', 1, n1, CAST(t1 AS BIGINT),"
        " 'gated', 2, n2, CAST(t2 AS BIGINT),"
        " 'exact_dedup', 3, n3, CAST(t3 AS BIGINT),"
        " 'near_dedup', 4, n4, CAST(t4 AS BIGINT),"
        " 'train_split', 5, n5, CAST(t5 AS BIGINT)"
        ") AS (stage, stage_ord, n_docs, n_tokens)"
    )


@register(
    "k_batch_padding_waste",
    oracle="""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ), b AS (
      SELECT doc_id, n_tok,
             CAST(ceil(n_tok / 16.0) * 16 AS BIGINT) AS bucket_len
      FROM d
    )
    SELECT bucket_len, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(sum(bucket_len - n_tok) AS BIGINT) AS pad_tokens,
           round(sum(bucket_len - n_tok) * 1.0 / sum(bucket_len), 4)
             AS waste_ratio
    FROM b GROUP BY bucket_len
    """,
)
def k_batch_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents rounded up to 16-token
    bucket lengths, with per-bucket padding waste — the efficiency report
    that justifies dynamic batching / sequence packing (k_pack_sequences
    is the remedy; this measures the disease). waste_ratio is the share
    of FLOPs a fixed-shape batcher would burn on pad tokens.

    One map-side-combined groupBy on a small integer key; exact integer
    token arithmetic end to end.
    """
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    b = d.select(
        n_tok.alias("n_tok"),
        (F.ceil(n_tok / 16.0) * 16).cast("long").alias("bucket_len"),
    )
    return b.groupBy("bucket_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("real_tokens"),
        F.sum(F.col("bucket_len") - F.col("n_tok")).cast("long").alias(
            "pad_tokens"
        ),
        F.round(
            F.sum(F.col("bucket_len") - F.col("n_tok"))
            * 1.0
            / F.sum("bucket_len"),
            4,
        ).alias("waste_ratio"),
    )


@register(
    "k_active_margin",
    oracle="""
    WITH scored AS (
    WITH f AS (
      SELECT doc_id,
             ln(1 + n_chars) AS f_len,
             len(string_split(text, ' ')) AS n_words,
             (n_chars - len(string_split(text, ' ')) + 1)
               * 1.0 / len(string_split(text, ' ')) AS mean_wlen,
             (n_chars - length(regexp_replace(text, '[0-9]', '', 'g')))
               * 1.0 / n_chars AS digit_ratio
      FROM documents
    )
    SELECT doc_id,
           CAST(floor(1.0 / (1.0 + exp(-(-8.0 + 1.6 * f_len + 0.5 * mean_wlen
                                         - 4.0 * digit_ratio))) * 1e6) AS BIGINT)
             AS score_q,
           CASE WHEN 1.0 / (1.0 + exp(-(-8.0 + 1.6 * f_len + 0.5 * mean_wlen
                                        - 4.0 * digit_ratio))) >= 0.5
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM f
    )
    SELECT doc_id, score_q,
           CAST(abs(score_q - 500000) AS BIGINT) AS margin_q
    FROM scored
    ORDER BY abs(score_q - 500000), doc_id
    LIMIT 20
    """,
)
def k_active_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling for active learning: the 20 documents whose
    quality-classifier probability sits closest to the 0.5 decision
    boundary — the rows a labeling budget buys the most from (margin
    sampling, Lewis & Gale 1994). Composes the registered logreg scorer;
    the margin is exact integer arithmetic on the quantized score.

    Zero-shuffle projection + TakeOrderedAndProject: per-partition top-20
    heaps merge on the driver, no global sort at any corpus size.
    """
    from data_service_spark.registry import QUERIES

    scored = QUERIES["k_quality_logreg"](spark, sf_dir).select(
        "doc_id", "score_q"
    )
    margin = F.abs(F.col("score_q") - 500000).cast("long")
    return (
        scored.select("doc_id", "score_q", margin.alias("margin_q"))
        .orderBy("margin_q", "doc_id")
        .limit(20)
    )


@register(
    "k_embed_drift",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             CASE WHEN vec_id < (SELECT quantile_cont(vec_id, 0.5)
                                 FROM embeddings) THEN 0 ELSE 1 END AS half,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ), cent AS (
      SELECT label, half, dim, avg(x) AS c
      FROM e GROUP BY 1, 2, 3
    )
    SELECT a.label, round(sqrt(sum((a.c - b.c) * (a.c - b.c))), 4)
             AS centroid_shift
    FROM cent a JOIN cent b
      ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
    GROUP BY a.label
    """,
)
def k_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per ground-truth label, the L2
    distance between the class centroid of the FIRST corpus half and the
    SECOND (vec_id median split standing in for time) — the
    representation-shift check run when an embedding model is upgraded or
    a new crawl lands (k_drift_psi's geometric twin).

    Centroids are per-(label, half, dim) averages after a dimension
    explode: the shuffle carries labels × 2 × 64 rows of partial sums, not
    vectors. The split threshold is the exact vec_id median, broadcast as
    a scalar subquery in both engines.
    """
    emb = load(spark, sf_dir, "embeddings")
    med = emb.agg(F.expr("percentile(vec_id, 0.5)").alias("m"))
    e = (
        emb.crossJoin(F.broadcast(med))
        .select(
            "label",
            F.when(F.col("vec_id") < F.col("m"), 0).otherwise(1).alias("half"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            ),
        )
        .select("label", "half", (F.col("pos") + 1).alias("dim"), "x")
    )
    cent = e.groupBy("label", "half", "dim").agg(F.avg("x").alias("c"))
    a = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("c0")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("c1")
    )
    return (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("c0") - F.col("c1")) ** 2)), 4
            ).alias("centroid_shift")
        )
    )


@register(
    "k_group_kfold",
    oracle="""
    WITH folds AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(concat('gkf:', source)), 1, 8))::BIGINT % 5
               AS fold
      FROM documents
    )
    SELECT fold, count(*) AS n_docs, count(DISTINCT source) AS n_sources
    FROM folds GROUP BY fold
    """,
)
def k_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP k-fold assignment: the fold is a salted hash of the SOURCE,
    so every document from one crawl/domain lands in the same fold —
    the leakage-proof cross-validation split (near-duplicates within a
    source can never straddle train and validation, which doc-level
    splitting like k_split_train_test permits).

    The fold is a scan-stage projection (no fitting pass, reproducible
    across engines/reruns); the report is one small-key groupBy. At
    100 TB the same hash routes shards at write time — fold extraction
    becomes partition pruning.
    """
    d = load(spark, sf_dir, "documents")
    fold = F.expr(_SPARK_BUCKET.format(salt="gkf:", key="source")) % 5
    return (
        d.select("doc_id", "source", (fold % 5).alias("fold"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@register(
    "k_learning_curve",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang,
             ln(1 + n_chars) AS f_len,
             (n_chars - len(string_split(text, ' ')) + 1)
               * 1.0 / len(string_split(text, ' ')) AS mean_wlen,
             (n_chars - length(regexp_replace(text, '[0-9]', '', 'g')))
               * 1.0 / n_chars AS digit_ratio,
             ('0x' || substr(md5(concat('lc:', doc_id::VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket
      FROM documents
    ), scored AS (
      SELECT bucket,
             CASE WHEN 1.0 / (1.0 + exp(-(-8.0 + 1.6 * f_len + 0.5 * mean_wlen
                                          - 4.0 * digit_ratio))) >= 0.5
                  THEN 1 ELSE 0 END AS pred,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM f
    )
    SELECT frac,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CASE WHEN pred = y THEN 1.0 ELSE 0.0 END), 4) AS acc
    FROM scored
    CROSS JOIN (SELECT unnest([10, 25, 50, 100]) AS frac)
    WHERE bucket < frac
    GROUP BY frac
    """,
)
def k_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning-curve audit: the quality classifier's agreement with the
    lang='en' label evaluated on NESTED hash-bucket subsets (10% ⊂ 25% ⊂
    50% ⊂ 100% of the corpus) — the data-scaling readout that answers
    "does the metric move if we double the data?" before anyone pays for
    the doubling. Nesting (not disjoint folds) is what makes the curve
    monotone-comparable.

    The subset membership is the same salted-hash bucket as the samplers
    (deterministic, scan-stage); the 4-point curve is ONE scan with the
    subset sizes unrolled as a 4-row broadcast cross join — not four
    passes.
    """
    # One-scan scorer spine; bucket and label from the same row
    # (guide §2.4 — the historical join was a doc_id PK self-join).
    bucket = F.expr(_SPARK_BUCKET.format(salt="lc:", key="doc_id"))
    lab = quality_scored(
        spark,
        sf_dir,
        bucket.alias("bucket"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    ).select(
        "doc_id",
        "bucket",
        "y",
        (F.col("score_q") >= 500000).cast("int").alias("pred"),
    )
    fracs = spark.createDataFrame([(10,), (25,), (50,), (100,)], "frac int")
    return (
        lab.crossJoin(F.broadcast(fracs))
        .filter(F.col("bucket") < F.col("frac"))
        .groupBy("frac")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.avg(
                    F.when(F.col("pred") == F.col("y"), 1.0).otherwise(0.0)
                ),
                4,
            ).alias("acc"),
        )
    )


@register(
    "k_dataset_diff",
    oracle="""
    WITH yesterday AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 400
    ), today AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 100
    )
    SELECT
      CAST((SELECT count(*) FROM today t LEFT JOIN yesterday y USING (doc_id)
            WHERE y.doc_id IS NULL) AS BIGINT) AS added,
      CAST((SELECT count(*) FROM yesterday y LEFT JOIN today t USING (doc_id)
            WHERE t.doc_id IS NULL) AS BIGINT) AS removed,
      CAST((SELECT count(*) FROM yesterday y JOIN today t USING (doc_id)
            WHERE y.h <> t.h) AS BIGINT) AS changed,
      CAST((SELECT count(*) FROM yesterday y JOIN today t USING (doc_id)
            WHERE y.h = t.h) AS BIGINT) AS unchanged
    """,
)
def k_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff ledger between two dataset versions (stand-ins:
    doc_id < 400 as yesterday, ≥ 100 as today): added / removed /
    changed / unchanged row counts by key, with 'changed' detected via
    content hash — the audit a data-versioning layer (Delta/LakeFS-style)
    prints per commit, and the input to incremental downstream refresh
    (only 'added'+'changed' need reprocessing).

    One full-outer-shaped comparison implemented as key-partitioned
    joins of (key, hash) projections — at 100 TB both snapshots bucket
    by key and the diff never moves document bodies, only 16-byte
    hashes.
    """
    d = load(spark, sf_dir, "documents")
    y = d.filter(F.col("doc_id") < 400).select(
        "doc_id", F.md5("text").alias("hy")
    )
    t = d.filter(F.col("doc_id") >= 100).select(
        "doc_id", F.md5("text").alias("ht")
    )
    j = y.join(t, "doc_id", "full")
    return j.agg(
        F.count(F.when(F.col("hy").isNull(), 1)).cast("long").alias("added"),
        F.count(F.when(F.col("ht").isNull(), 1)).cast("long").alias("removed"),
        F.count(
            F.when(
                F.col("hy").isNotNull()
                & F.col("ht").isNotNull()
                & (F.col("hy") != F.col("ht")),
                1,
            )
        ).cast("long").alias("changed"),
        F.count(F.when(F.col("hy") == F.col("ht"), 1)).cast("long").alias(
            "unchanged"
        ),
    )


@register(
    "k_shard_plan",
    oracle="""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ), cum AS (
      SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id) AS cum_tok
      FROM d
    ), planned AS (
      SELECT doc_id, n_tok,
             CAST(floor((cum_tok - n_tok) / 2000.0) AS BIGINT) AS shard
      FROM cum
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM planned GROUP BY shard
    """,
)
def k_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard PLANNING: assign documents (in stable doc_id
    order) to contiguous output shards of ~2000 tokens each via a
    cumulative-token prefix sum — the write plan that gives a training
    loader near-equal shard sizes AND preserves corpus order (unlike the
    hash sharding k_shard_balance audits, which balances but scatters).
    A doc starts a new shard when the budget would otherwise overflow —
    the streaming-fill rule floor(prefix_before/budget) encodes exactly.

    Local-mode caveat: the global prefix sum is one ordered pass here; at
    100 TB the same plan computes per-partition token subtotals first (a
    tiny driver-side scan) and offsets each partition's prefix sums —
    two linear passes, no global sort of documents.
    """
    d = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    cumw = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    ).select(
        "doc_id",
        "n_tok",
        (F.sum("n_tok").over(cumw) - F.col("n_tok")).alias("before"),
    )
    planned = cum.select(
        "doc_id",
        "n_tok",
        F.floor(F.col("before") / 2000.0).cast("long").alias("shard"),
    )
    return planned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("shard_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


@register(
    "k_sample_balanced",
    oracle="""
    WITH sized AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY 1
    ), target AS (
      SELECT min(n) AS n_min FROM sized
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(concat('bal:',
                          doc_id::VARCHAR)), 1, 8))::BIGINT, doc_id) AS rn
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
    FROM ranked CROSS JOIN target
    WHERE rn <= n_min
    GROUP BY lang
    """,
)
def k_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-BALANCED downsampling: every language keeps exactly
    min-class-size documents, chosen by salted-hash rank (deterministic
    "random" order, stable across reruns/engines) — the equal-class
    training set k_class_weights' loss-reweighting is the alternative
    to; this one trades data for exact balance.

    Per-class ranks are one keyed window; the target size is a 1-row
    broadcast. At 100 TB the same hash-rank is a per-class
    TakeOrdered(n_min) — no global sort. Output is the per-class ledger
    proving exact balance.
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    target = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).agg(
        F.min("n").alias("n_min")
    )
    h = F.expr(
        "CAST(conv(substr(md5(concat('bal:', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT)"
    )
    wr = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
    ranked = d.select("doc_id", "lang", F.row_number().over(wr).alias("rn"))
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("n_min"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )


@register(
    "k_fk_orphans",
    oracle="""
    SELECT 'orders.o_custkey -> customer' AS relationship,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'events.user_id -> customer',
           CAST((SELECT count(*) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = e.user_id))
                AS BIGINT),
           CAST((SELECT count(*) FROM events) AS BIGINT)
    """,
)
def k_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for the corpus's three
    foreign-key relationships via LEFT ANTI joins — the data-quality
    check (k_expectations' relational sibling) that catches broken
    upstream joins before they silently drop or duplicate rows
    downstream.

    Each anti join probes the key projection of its referenced side —
    customer and orders keys, both SF-proportional, so no broadcast
    hint: AQE broadcasts a key set that is runtime-small and
    shuffle-anti-joins once it outgrows the bound (or swap in a bloom
    pre-filter — c_join_bloom's machinery — when even the shuffle is too
    dear). Counts are 1-row aggregates.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")
    e = load(spark, sf_dir, "events")

    def audit(name, fact, dim_keys, cond):
        orphans = fact.join(dim_keys, cond, "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        total = fact.agg(F.count(F.lit(1)).alias("n_rows"))
        return (
            orphans.crossJoin(total)
            .select(
                F.lit(name).alias("relationship"),
                F.col("n_orphans").cast("long"),
                F.col("n_rows").cast("long"),
            )
        )

    ck = c.select("c_custkey")
    ok = o.select("o_orderkey")
    r1 = audit(
        "orders.o_custkey -> customer", o, ck,
        F.col("o_custkey") == F.col("c_custkey"),
    )
    r2 = audit(
        "lineitem.l_orderkey -> orders", li, ok,
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    r3 = audit(
        "events.user_id -> customer", e, ck,
        F.col("user_id") == F.col("c_custkey"),
    )
    return r1.unionAll(r2).unionAll(r3)


@register(
    "k_target_encoding",
    oracle="""
    WITH lab AS (
      SELECT source, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    ), prior AS (SELECT avg(y) AS p FROM lab)
    SELECT source, CAST(count(*) AS BIGINT) AS n,
           round(avg(y), 4) AS raw_rate,
           round((count(*) * avg(y) + 20 * max(prior.p))
                 / (count(*) + 20), 4) AS encoded
    FROM lab CROSS JOIN prior
    GROUP BY source
    """,
)
def k_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of the `source` categorical
    against the lang='en' label: encoded = (n·rate + m·prior)/(n + m)
    with m=20 pseudo-observations (Micci-Barreca 2001) — the
    high-cardinality categorical featurizer that raw one-hot can't
    scale to, with the shrinkage that stops rare categories from
    memorizing the label.

    One grouped aggregate plus a broadcast 1-row prior; exact integer
    counts drive the shrinkage blend. (Leakage-correct training uses the
    k_group_kfold folds to encode each fold from the others — same
    aggregate per fold.)
    """
    d = load(spark, sf_dir, "documents")
    lab = d.select(
        "source",
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )
    prior = lab.agg(F.avg("y").alias("p"))
    return (
        lab.crossJoin(F.broadcast(prior))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("y"), 4).alias("raw_rate"),
            F.round(
                (F.count(F.lit(1)) * F.avg("y") + 20 * F.max("p"))
                / (F.count(F.lit(1)) + 20),
                4,
            ).alias("encoded"),
        )
    )


@register(
    "k_budget_select",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             ('0x' || substr(md5(concat('bsel:', doc_id::VARCHAR)), 1, 8))
               ::BIGINT AS pri
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM scored
    )
    SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= 20000
    """,
)
def k_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: per source, admit documents in a
    deterministic hash-priority order until a 20k-token budget fills —
    the per-domain cap step of a training-mix builder (every source
    contributes, none dominates; reruns admit the same docs because the
    priority is an md5 hash, not rand()).

    One running-sum window per source partition + a filter; the shuffle
    key is the source (the mix dimension), so at 100 TB the parallelism
    is #sources × AQE skew splits and each partition streams once. The
    greedy prefix rule (admit while cum ≤ budget) is the standard
    practical relaxation of the knapsack this problem really is.
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(
            "CAST(conv(substr(md5(concat('bsel:', CAST(doc_id AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("pri"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.select(
            "doc_id",
            "source",
            "n_tokens",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= 20000)
    )


@register(
    "k_chat_template_render",
    oracle="""
    WITH split_doc AS (
      SELECT doc_id,
             array_to_string((string_split(text, ' '))[1:10], ' ') AS prompt,
             array_to_string((string_split(text, ' '))[11:], ' ')
               AS completion
      FROM documents
      WHERE len(string_split(text, ' ')) > 10
    )
    SELECT doc_id,
           '<|user|>' || chr(10) || prompt || '<|end|>' || chr(10)
             || '<|assistant|>' || chr(10) || completion || '<|end|>'
             AS rendered,
           CAST(length('<|user|>' || chr(10) || prompt || '<|end|>'
                || chr(10) || '<|assistant|>' || chr(10) || completion
                || '<|end|>') AS BIGINT) AS n_chars
    FROM split_doc
    """,
)
def k_chat_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering: the same prompt/completion split as
    k_sft_records, flattened into the single training STRING the tokenizer
    actually sees (role sentinels + turn terminators — the template step
    every SFT pipeline runs between the JSONL record and the token ids).
    Keeping it in-engine means template changes re-render 100 TB as a
    zero-shuffle projection instead of a reprocessing job.
    """
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sd = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(words, 1, 10)).alias("prompt"),
        F.concat_ws(
            " ", F.expr("slice(split(text, ' '), 11, size(split(text, ' ')))")
        ).alias("completion"),
    ).filter(F.size(words) > 10)
    rendered = F.concat(
        F.lit("<|user|>\n"),
        F.col("prompt"),
        F.lit("<|end|>\n<|assistant|>\n"),
        F.col("completion"),
        F.lit("<|end|>"),
    )
    return sd.select(
        "doc_id",
        rendered.alias("rendered"),
        F.length(rendered).cast("long").alias("n_chars"),
    )


@register(
    "k_span_mask_mlm",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    m AS (
      SELECT doc_id, w,
             list_transform(generate_series(1, len(w)), i ->
               ('0x' || substr(md5('mask:' || doc_id::VARCHAR || ':'
                               || (i - 1)::VARCHAR), 1, 8))::BIGINT % 100
                 < 15) AS is_masked
      FROM t
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(generate_series(1, len(w)),
                                i -> is_masked[i])) AS BIGINT) AS n_masked,
           array_to_string(list_transform(generate_series(1, len(w)),
             i -> CASE WHEN is_masked[i] THEN '<mask>' ELSE w[i] END), ' ')
             AS masked_text,
           coalesce(array_to_string(list_transform(
             list_filter(generate_series(1, len(w)), i -> is_masked[i]),
             i -> w[i]), ' '), '') AS targets
    FROM m
    """,
)
def k_span_mask_mlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MLM/denoising corruption: ~15% of each document's
    tokens are replaced with ``<mask>``, chosen by an md5 hash bucket of
    (doc_id, position) — BERT/T5-style masking that is REPRODUCIBLE
    across reruns and engines (no rand()), so the same example always
    corrupts the same way (the property that makes loss curves comparable
    between pipeline versions). Emits the corrupted text plus the
    in-order target tokens.

    Pure per-row array algebra (transform/filter with index lambdas) —
    zero shuffle, composes at scan rate; the hash is the same salted-md5
    bucket convention as the split/sampling keys.
    """
    d = load(spark, sf_dir, "documents")
    bucket = (
        "CAST(conv(substr(md5(concat('mask:', CAST(doc_id AS STRING), ':',"
        " CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 < 15"
    )
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    m = w.withColumn(
        "is_masked",
        F.expr(
            f"transform(w, (x, i) -> {bucket})"
        ),
    )
    return m.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.expr("size(filter(is_masked, x -> x))").cast("long").alias(
            "n_masked"
        ),
        F.expr(
            "concat_ws(' ', transform(w, (x, i) ->"
            " IF(is_masked[i], '<mask>', x)))"
        ).alias("masked_text"),
        F.expr(
            "concat_ws(' ', transform("
            " filter(sequence(0, size(w) - 1), i -> is_masked[i]),"
            " i -> w[i]))"
        ).alias("targets"),
    )


@register(
    "k_prompt_dedup_sft",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             array_to_string((string_split(text, ' '))[1:10], ' ') AS prompt,
             array_to_string((string_split(text, ' '))[11:], ' ')
               AS completion
      FROM documents WHERE len(string_split(text, ' ')) > 10
    )
    SELECT md5(prompt) AS prompt_hash,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(count(DISTINCT md5(completion)) AS BIGINT) AS n_completions,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(DISTINCT md5(completion)) > 1 AS conflicting
    FROM p GROUP BY md5(prompt) HAVING count(*) > 1
    """,
)
def k_prompt_dedup_sft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT prompt-level dedup audit: groups of training records sharing an
    identical PROMPT (k_sft_records' first-10-words split), with the count
    of distinct completions — same-prompt-same-completion is plain
    duplication (keep min id), same-prompt-DIFFERENT-completion is a
    CONFLICT that teaches the model inconsistency (the instruction-data
    failure mode prompt-dedup exists to catch; it also prevents
    train/eval prompt leakage when splits are prompt-keyed).

    One 16-byte-hash groupBy with map-side partials; the distinct-
    completion count is Spark's standard two-level distinct expansion.
    """
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    p = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(words, 1, 10))).alias("prompt_hash"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr("slice(split(text, ' '), 11, size(split(text, ' ')))"),
            )
        ).alias("completion_hash"),
    ).filter(F.size(words) > 10)
    return (
        p.groupBy("prompt_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.countDistinct("completion_hash")
            .cast("long")
            .alias("n_completions"),
            F.min("doc_id").cast("long").alias("keep_id"),
        )
        .filter(F.col("n_records") > 1)
        .withColumn("conflicting", F.col("n_completions") > 1)
        .select(
            "prompt_hash", "n_records", "n_completions", "keep_id",
            "conflicting",
        )
    )


# -------------------------------------------------- mix water-filling ----


@register(
    "k_mix_waterfill",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(sum(len(string_split(text, chr(32)))) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ), budget AS (
      SELECT CAST(floor(sum(avail) * 0.9) AS BIGINT) AS t FROM src
    ), sorted AS (
      SELECT source, avail,
             row_number() OVER (ORDER BY avail, source) AS i,
             sum(avail) OVER (ORDER BY avail, source) AS cum,
             count(*) OVER () AS n
      FROM src
    ), sat AS (
      SELECT coalesce(max(CASE WHEN avail * (n - i + 1) <= t - (cum - avail)
                          THEN i END), 0) AS m
      FROM sorted CROSS JOIN budget
    ), lvl AS (
      SELECT m,
             CAST(floor((t - coalesce((SELECT cum FROM sorted WHERE i = m), 0))
                        * 1.0 / (n - m)) AS BIGINT) AS level
      FROM sat CROSS JOIN budget
      CROSS JOIN (SELECT max(n) AS n FROM sorted) nn
    )
    SELECT s.source, s.avail AS avail_tokens,
           CAST(CASE WHEN s.i <= l.m THEN s.avail ELSE l.level END AS BIGINT)
             AS alloc_tokens,
           (s.i <= l.m) AS saturated,
           l.level AS water_level
    FROM sorted s CROSS JOIN lvl l
    """,
)
def k_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix WATER-FILLING: allocate a token budget (90% of the
    corpus here) across sources targeting EQUAL per-source token counts —
    sources smaller than the water level contribute everything they have
    (saturated), the rest are capped at the common level
    L = (T − Σ_saturated avail)/(n − m). The exact waterfill is solved in
    ONE pass of window functions over the sorted source spine (m = max i
    with availᵢ·(n−i+1) ≤ T − cum_{i−1}, the standard sorted-prefix
    characterization) instead of the iterative redistribute loop — the
    allocation step between `k_mix_report` (what the mix is) and
    `k_budget_select` (which docs make the cut).

    Scale shape: the corpus reduces map-side to one row per source; the
    waterfill itself is window algebra over that dimension table.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("avail")
    )
    budget = src.agg(
        F.floor(F.sum("avail") * 0.9).cast("long").alias("t")
    )
    w = Window.orderBy("avail", "source")
    sorted_ = src.select(
        "source",
        "avail",
        F.row_number().over(w).alias("i"),
        F.sum("avail").over(w).alias("cum"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).crossJoin(F.broadcast(budget))
    sat = sorted_.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("avail") * (F.col("n") - F.col("i") + 1)
                    <= F.col("t") - (F.col("cum") - F.col("avail")),
                    F.col("i"),
                )
            ),
            F.lit(0),
        ).alias("m"),
        F.max("n").alias("n"),
        F.max("t").alias("t"),
    )
    cum_m = sorted_.select("i", F.col("cum").alias("cum_m"))
    lvl = (
        sat.join(cum_m, sat.m == cum_m.i, "left")
        .select(
            "m",
            F.floor(
                (F.col("t") - F.coalesce(F.col("cum_m"), F.lit(0)))
                * 1.0
                / (F.col("n") - F.col("m"))
            )
            .cast("long")
            .alias("level"),
        )
    )
    return sorted_.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("avail").alias("avail_tokens"),
        F.when(F.col("i") <= F.col("m"), F.col("avail"))
        .otherwise(F.col("level"))
        .cast("long")
        .alias("alloc_tokens"),
        (F.col("i") <= F.col("m")).alias("saturated"),
        F.col("level").alias("water_level"),
    )


# ------------------------------------- importance-weight ESS audit ----


def _body_importance_ess() -> str:
    return """
    WITH cell AS (
      SELECT source, lang, count(*) AS c_sl FROM documents GROUP BY 1, 2
    ), lang_tot AS (
      SELECT lang, sum(c_sl) AS c_l FROM cell GROUP BY 1
    ), n AS (SELECT sum(c_sl) AS n FROM cell),
    src_tot AS (
      SELECT source, sum(c_sl) AS n_s FROM cell GROUP BY 1
    ), w AS (
      SELECT c.source, c.c_sl,
             least(CAST(floor(CAST(l.c_l AS DOUBLE) * s.n_s * 100
                              / (CAST(n.n AS DOUBLE) * c.c_sl))
                        AS BIGINT), 1000) AS w_c
      FROM cell c
      JOIN lang_tot l ON c.lang = l.lang
      JOIN src_tot s ON c.source = s.source
      CROSS JOIN n
    ), agg AS (
      SELECT source, sum(c_sl) AS n_docs,
             sum(c_sl * w_c) AS sw, sum(c_sl * w_c * w_c) AS sq
      FROM w GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(round(CAST(sw AS DOUBLE) / 100, 2) + 0.0 AS DOUBLE)
             AS sum_w,
           CAST(round(CAST(sw AS DOUBLE) * sw / sq, 4) + 0.0
             AS DOUBLE) AS ess,
           CAST(round(CAST(sw AS DOUBLE) * sw / sq / n_docs, 6) + 0.0
             AS DOUBLE) AS ess_ratio
    FROM agg
    """


@register("k_importance_ess", oracle=_body_importance_ess())
def k_importance_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-sample-size audit of importance reweighting: give every
    doc the weight that re-balances its source's language mix to the
    global mix (clipped at 10, the standard variance guard), then report
    Kish ESS = (Σw)²/Σw² per source — the number that says how many
    EFFECTIVE documents survive the reweighting (ess_ratio ≪ 1 means the
    weights are dominated by a few heavy docs and the resample will be
    noisy; the companion of ``k_dsir_weights``' weight computation and
    ``k_design_effect``'s cluster-side deff). Weights floor-quantize to
    integer centi-units, the two power sums are exact BIGINTs, and every
    output is a deterministic function of those integers — identical
    doubles cross-engine by construction.

    Scale shape: the corpus reduces map-side to the (source × lang) grid;
    everything downstream runs on that spine. Per-doc weights never
    materialize — the cell counts carry them analytically."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_importance_ess())


# ----------------------------------------------- raking / IPF weights ----


def _body_raking() -> str:
    # Integer-exact IPF: weights live in ppm; every rescale is one BIGINT
    # multiply followed by exact integer division (Spark `DIV`; the oracle
    # swaps in DuckDB's `//`). Positive operands throughout, so both
    # operators agree (floor division).
    return """
    WITH cell AS (
      SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2
    ), tot AS (
      SELECT sum(c) AS n, count(DISTINCT source) AS n_src FROM cell
    ), col_t AS (
      SELECT lang, sum(c) AS c_l FROM cell GROUP BY 1
    ), w0 AS (
      SELECT source, lang, c, CAST(1000000 AS BIGINT) AS w FROM cell
    ), r1 AS (
      SELECT w0.source, w0.lang, w0.c,
             (w0.w * t.n * 1000000)
               DIV (sum(w0.c * w0.w) OVER (PARTITION BY w0.source)
                    * t.n_src) AS w
      FROM w0 CROSS JOIN tot t
    ), c1 AS (
      SELECT r1.source, r1.lang, r1.c,
             (r1.w * ct.c_l * 1000000)
               DIV (sum(r1.c * r1.w) OVER (PARTITION BY r1.lang)) AS w
      FROM r1 JOIN col_t ct ON r1.lang = ct.lang
    ), r2 AS (
      SELECT c1.source, c1.lang, c1.c,
             (c1.w * t.n * 1000000)
               DIV (sum(c1.c * c1.w) OVER (PARTITION BY c1.source)
                    * t.n_src) AS w
      FROM c1 CROSS JOIN tot t
    ), c2 AS (
      SELECT r2.source, r2.lang, r2.c,
             (r2.w * ct.c_l * 1000000)
               DIV (sum(r2.c * r2.w) OVER (PARTITION BY r2.lang)) AS w
      FROM r2 JOIN col_t ct ON r2.lang = ct.lang
    )
    SELECT c2.source, c2.lang, CAST(c2.c AS BIGINT) AS n_docs,
           CAST(c2.w AS BIGINT) AS w_ppm,
           CAST((sum(c2.c * c2.w) OVER (PARTITION BY c2.source) * t.n_src)
                DIV t.n DIV 10000 AS BIGINT) AS row_mass_vs_target_pct
    FROM c2 CROSS JOIN tot t
    """


@register(
    "k_raking_ipf",
    oracle=_body_raking().replace(" DIV ", " // "),
)
def k_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking (iterative proportional fitting) of per-(source,lang) sample
    weights to two simultaneous margins: uniform SOURCE shares (every
    crawl contributes equally) while PRESERVING the global language mix —
    the survey-statistics workhorse (Deming–Stephan) that a data mixer
    uses when two marginal targets must hold at once and per-cell targets
    don't exist. Two full row→column rounds unrolled; weights live in
    integer ppm and every rescale is BIGINT multiply + exact integer
    floor-division, so the entire fixed-point prefix is bit-identical
    cross-engine (the ``k_graph_hits`` determinism pattern applied to
    IPF). ``row_mass_vs_target_pct`` exposes convergence (→100).

    Scale shape: the corpus reduces map-side to the (source×lang) grid;
    each IPF half-round is one partitioned window over that spine —
    shuffle size independent of N."""
    # r13: cell transitively feeds tot/col_t/w0 (6 scan nodes in the
    # plan text), but runtime exchange reuse executes the corpus reduce
    # once — a localCheckpoint pin of the grid was A/B'd and LOST
    # (0.72s → 1.03s at sf0.1, barrier cost). Examined, left alone.
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_raking())


# ------------------------------------------- Kneser-Ney bigram LM ----

_KN_TAIL = """
    ctx AS (SELECT w1, sum(c_vw) AS c_v, count(*) AS n1_fwd
            FROM bgc GROUP BY 1),
    cont AS (SELECT w2, count(*) AS n1_back FROM bgc GROUP BY 1),
    btypes AS (SELECT count(*) AS b FROM bgc),
    scored AS (
      SELECT bgc.w1, bgc.w2, bgc.c_vw,
             greatest(bgc.c_vw - 0.75, 0) / ctx.c_v
             + (0.75 * ctx.n1_fwd / ctx.c_v)
               * (CAST(cont.n1_back AS DOUBLE) / bt.b) AS pkn
      FROM bgc JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN btypes bt
    )
    SELECT w1, w2, CAST(c_vw AS BIGINT) AS c_vw,
           CAST(round(pkn, 6) + 0.0 AS DOUBLE) AS p_kn
    FROM scored
    ORDER BY c_vw DESC, w1, w2 LIMIT 20
"""


@register(
    "k_text_kn_bigram",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), bgx AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(words) - 1),
               i -> {{'w1': words[i], 'w2': words[i + 1]}})) AS p
      FROM w
    ), bg AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM bgx),
    bgc AS (SELECT w1, w2, count(*) AS c_vw FROM bg GROUP BY 1, 2),
    {_KN_TAIL}
    """,
)
def k_text_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (single discount
    d=0.75): P(w|v) = max(c(vw)−d,0)/c(v) + d·N₁₊(v·)/c(v) · N₁₊(·w)/B —
    the smoothing that made n-gram LMs competitive (Kneser & Ney 1995;
    Chen & Goodman's winner), and the upgrade over this module's add-one
    baseline (``k_text_bigram_logprob``): continuation counts model how
    PROMISCUOUS a word's contexts are, so "Francisco" (frequent, one
    context) stops leaking probability into novel bigrams. d = 3/4 is
    dyadic, every count is an exact integer, and both engines evaluate the
    identical three-term expression — deterministic without quantization.
    Top-20 bigrams by count, total-ordered.

    Scale shape: every model table (bigram, context, continuation, type
    count) derives from the session-memoized ``_bigram_counts``
    dictionary (r10: the corpus bigram stream explodes ONCE per session
    for the whole n-gram family — this key's aggregates are
    dictionary-sized algebra over the pinned reduce); the scored join
    is keyed by bigram parts, continuation/type tables broadcast."""
    from data_service_spark.queries.corpus_stats import _bigram_counts

    _bigram_counts(spark, sf_dir).createOrReplaceTempView("dss_bgc_memo")
    return spark.sql(
        f"""
    WITH bgc AS (SELECT w1, w2, c AS c_vw FROM dss_bgc_memo),
    {_KN_TAIL}
    """
    )


# --------------------------------------- temporal split leakage audit ----


def _body_temporal_split() -> str:
    return """
    WITH lim AS (
      SELECT min(CAST(date_trunc('day', ts) AS DATE)) + 21 AS cut
      FROM events
    ), tagged AS (
      SELECT user_id, event_id,
             CASE WHEN CAST(date_trunc('day', ts) AS DATE) < l.cut
                  THEN 0 ELSE 1 END AS is_test
      FROM events CROSS JOIN lim l
    ), per_user AS (
      SELECT user_id,
             sum(CASE WHEN is_test = 0 THEN 1 ELSE 0 END) AS n_train,
             sum(CASE WHEN is_test = 1 THEN 1 ELSE 0 END) AS n_test
      FROM tagged GROUP BY user_id
    )
    SELECT CAST(sum(n_train) AS BIGINT) AS train_events,
           CAST(sum(n_test) AS BIGINT) AS test_events,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN n_train > 0 AND n_test > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS warm_users,
           CAST(sum(CASE WHEN n_train = 0 AND n_test > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS cold_users,
           CAST(floor(sum(CASE WHEN n_train = 0 AND n_test > 0
                          THEN 1 ELSE 0 END) * 10000.0
                      / nullif(sum(CASE WHEN n_test > 0
                                   THEN 1 ELSE 0 END), 0)) AS BIGINT)
             AS cold_user_bp
    FROM per_user
    """


@register("k_temporal_split_audit", oracle=_body_temporal_split())
def k_temporal_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split audit (cut = first day + 21): event and
    user counts per side, warm vs COLD-START test users (no training
    history — the rows where a behavioral model silently degrades to a
    prior), and the cold rate in basis points. Temporal splits are the
    only honest evaluation for forecasting/recommendation — a random
    split leaks the future into training — and this audit is the
    accompanying leakage/coverage readout: by construction no event
    crosses the cut, so the leakage channel left is user overlap, which
    is exactly what warm/cold decomposes. All counts exact integers.

    Scale shape: one per-user conditional reduce; the cut is a broadcast
    scalar."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_temporal_split())


# ------------------------------------------ consistent-hash sharding ----


def _body_consistent_ring(hash_to_long: str, n_a: int, n_b: int) -> str:
    # Rendezvous (highest-random-weight) hashing: doc d goes to the shard
    # maximizing h(shard, d). Adding a shard moves ONLY the keys whose new
    # shard wins — expected 1/(n+1) of them, the elastic-resharding
    # guarantee a modulo scheme lacks (mod N reshuffles ~everything).
    h = hash_to_long.format(
        h="'ring:' || CAST(s.shard AS STRING) || ':' || CAST(d.doc_id AS STRING)"
    )
    return f"""
    WITH docs AS (SELECT doc_id FROM documents),
    ring_a AS (
      SELECT d.doc_id, s.shard,
             row_number() OVER (PARTITION BY d.doc_id
                                ORDER BY {h} DESC, s.shard) AS rn
      FROM docs d CROSS JOIN (SELECT explode(sequence(0, {n_a - 1})) AS shard) s
    ), ring_b AS (
      SELECT d.doc_id, s.shard,
             row_number() OVER (PARTITION BY d.doc_id
                                ORDER BY {h} DESC, s.shard) AS rn
      FROM docs d CROSS JOIN (SELECT explode(sequence(0, {n_b - 1})) AS shard) s
    ), a AS (SELECT doc_id, shard FROM ring_a WHERE rn = 1),
    b AS (SELECT doc_id, shard FROM ring_b WHERE rn = 1),
    moved AS (
      SELECT count(*) AS n_docs,
             sum(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END) AS n_moved
      FROM a JOIN b USING (doc_id)
    ), loads AS (
      SELECT shard, count(*) AS load FROM a GROUP BY shard
    )
    SELECT CAST(l.shard AS INT) AS shard, CAST(l.load AS BIGINT) AS load,
           CAST(m.n_docs AS BIGINT) AS n_docs,
           CAST(m.n_moved AS BIGINT) AS moved_on_grow,
           CAST(floor(CAST(m.n_moved AS DOUBLE) * 10000 / m.n_docs)
             AS BIGINT) AS churn_bp
    FROM loads l CROSS JOIN moved m
    """


@register(
    "k_consistent_hash_ring",
    oracle=_body_consistent_ring(
        "('0x' || substr(md5({h}), 1, 8))::BIGINT", 8, 9
    ).replace(
        "(SELECT explode(sequence(0, 7)) AS shard)",
        "(SELECT CAST(b AS INT) AS shard FROM range(8) t(b))",
    ).replace(
        "(SELECT explode(sequence(0, 8)) AS shard)",
        "(SELECT CAST(b AS INT) AS shard FROM range(9) t(b))",
    ),
)
def k_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) consistent sharding of the
    corpus across 8 shards, with the elastic-resharding churn audit: when
    a 9th shard joins, ONLY the keys whose new shard wins the rendezvous
    move — expected 1/9 (~1111 bp) of the corpus, vs ~8/9 for modulo
    sharding. This is how a 100 TB embedding/doc store grows capacity
    without a full reshuffle (the Cassandra/Dynamo trick expressed
    relationally). All weights are deterministic md5 integers; the argmax
    per doc is a row_number with a total-order tiebreak.

    Scale shape: the ring evaluation is a scan-side 8× (9×) fan-out +
    per-doc argmax window partitioned by doc_id (map-local after the
    fan-out, no data-sized shuffle beyond the window's own key exchange);
    loads and churn are spine reduces."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _body_consistent_ring(
            "CAST(conv(substr(md5({h}), 1, 8), 16, 10) AS BIGINT)", 8, 9
        )
    )


@register(
    "k_tokenizer_vocab_export",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), nonempty AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    counts AS (
      SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
      FROM nonempty GROUP BY token
    ), total AS (SELECT sum(freq) AS tot FROM counts),
    ranked AS (
      SELECT token, freq, doc_freq,
             row_number() OVER (ORDER BY freq DESC, token) AS rk,
             sum(freq) OVER (ORDER BY freq DESC, token
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM counts WHERE freq >= 2
    ), vocab AS (
      SELECT CAST(rk + 3 AS BIGINT) AS token_id, token,
             CAST(freq AS BIGINT) AS freq,
             CAST(doc_freq AS BIGINT) AS doc_freq,
             CAST(floor(cum * 1000000 / t.tot) AS BIGINT) AS cum_ppm
      FROM ranked CROSS JOIN total t WHERE rk <= 200
    ), specials AS (
      SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), '[PAD]', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT)),
        (CAST(1 AS BIGINT), '[UNK]', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT)),
        (CAST(2 AS BIGINT), '[BOS]', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT)),
        (CAST(3 AS BIGINT), '[EOS]', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT))
      ) v(token_id, token, freq, doc_freq, cum_ppm)
    )
    SELECT * FROM specials UNION ALL SELECT * FROM vocab
    """,
)
def k_tokenizer_vocab_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-vocab artifact a curation run exports for the trainer:
    4 special tokens ([PAD]/[UNK]/[BOS]/[EOS] at ids 0–3) followed by the
    top-200 corpus tokens (lowercased whitespace tokens, min_count 2) with
    contiguous ids assigned by the deterministic (freq DESC, token) total
    order — the id assignment every run must reproduce bit-identically or
    checkpoints stop being comparable. Each row carries freq, doc_freq and
    the cumulative corpus coverage in ppm (integer floor over exact BIGINT
    running sums, so the coverage column is order-proof cross-engine); the
    coverage tail is what decides whether 200 ids are enough
    (``k_vocab_coverage`` is the evaluation-side twin).

    Scale shape: one corpus-sized explode feeds a partial-aggregated
    (token) reduce; everything after runs on the ≤|vocab| dictionary
    spine — the ranking window is dictionary-sized, never corpus-sized.
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    total = counts.agg(F.sum("freq").alias("tot"))
    # r13 (guide F/§2): the rk ≤ 200 cut rode a row_number + running-sum
    # window over the FULL vocabulary on one partition (the running sum
    # blocks Spark's WindowGroupLimit rewrite, so the plan carried a
    # full-vocab single-partition Sort). Select the top-200 first via
    # orderBy+limit — TakeOrderedAndProject, per-partition heaps — and
    # run the window on 200 rows. Same (freq DESC, token) total order,
    # so rk and the running sum are bit-identical.
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    top = (
        counts.filter(F.col("freq") >= 2)
        .orderBy(F.col("freq").desc(), "token")
        .limit(200)
    )
    ranked = (
        top.withColumn("rk", F.row_number().over(w))
        .withColumn("cum", F.sum("freq").over(w.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
    )
    vocab = ranked.crossJoin(F.broadcast(total)).select(
        (F.col("rk") + 3).cast("long").alias("token_id"),
        "token",
        F.col("freq").cast("long").alias("freq"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        F.floor(F.col("cum") * 1000000 / F.col("tot"))
        .cast("long").alias("cum_ppm"),
    )
    specials = spark.createDataFrame(
        [(0, "[PAD]", 0, 0, 0), (1, "[UNK]", 0, 0, 0),
         (2, "[BOS]", 0, 0, 0), (3, "[EOS]", 0, 0, 0)],
        "token_id long, token string, freq long, doc_freq long, cum_ppm long",
    )
    return specials.unionByName(vocab)


def _body_entropy_rate() -> str:
    return """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), pairs AS (
      SELECT unnest(ws[1:len(ws) - 1]) AS w1,
             unnest(ws[2:len(ws)]) AS w2
      FROM toks WHERE len(ws) >= 2
    ), bi AS (SELECT w1, w2 FROM pairs WHERE w1 <> '' AND w2 <> ''),
    c12 AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY w1),
    terms AS (
      SELECT CAST(floor(c12.c
               * ln(CAST(c1.c1 AS DOUBLE) / c12.c) * 1000000000)
               AS BIGINT) AS t_q,
             c12.c
      FROM c12 JOIN c1 USING (w1)
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_bigrams,
           (SELECT CAST(count(*) AS BIGINT) FROM c12) AS n_distinct_bigrams,
           CAST(floor(sum(t_q) / (sum(c) * 1000.0)) AS BIGINT)
             AS h_cond_micro_nats,
           CAST(round(exp(CAST(floor(sum(t_q) / (sum(c) * 1000.0))
                               AS DOUBLE) / 1000000), 4) + 0.0 AS DOUBLE)
             AS branching_ppl
    FROM terms
    """


@register("k_ngram_entropy_rate", oracle=_body_entropy_rate())
def k_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus conditional-entropy rate H(w₂|w₁) = Σ (c₁₂/N)·ln(c₁/c₁₂)
    and its perplexity exp(H) — the information-theoretic branching
    factor of the corpus at bigram order, the scaling-law-panel number
    that sits between unigram entropy (``k_text_entropy``'s content
    side, ``k_text_unigram_logprob``) and the smoothed LM keys
    (``k_text_kn_bigram``): low H means templated/repetitive text
    (cheap to model, low information per token), H near the unigram
    entropy means bigram context buys nothing. The MLE estimate over
    the observed bigram dictionary, stated as such.

    Each bigram's c₁₂·ln(c₁/c₁₂) term floor-quantizes to an exact 1e-9
    integer before the BIGINT sum (order-proof); the perplexity exps
    the already-quantized H so both engines exponentiate the same
    double. Scale shape: one adjacent-pair fan-out at scan site, two
    dictionary-sized reduces — the same shape as every n-gram key."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    # r14 (census, the dsir fold): the context count c1 is a per-w1 SUM OF
    # c12 joined straight back to c12 — a window sum over c12 partitioned
    # by w1 is the same exact BIGINT per row and deletes both the c1
    # aggregation and the join (2 exchanges + SMJ -> 1 exchange);
    # n_distinct_bigrams = count(*) over terms because the c12⋈c1 inner
    # join was row-preserving (c1 is keyed by w1 and built FROM c12), so
    # the scalar-subquery re-derivation of the whole bigram subtree goes
    # too. 3 documents scans -> 1. DuckDB oracle keeps the join text.
    return spark.sql(
        """
    WITH toks AS (
      SELECT doc_id, split(lower(text), ' ') AS ws FROM documents
    ), bi AS (
      SELECT ws[i - 1] AS w1, ws[i] AS w2
      FROM toks
      LATERAL VIEW explode(sequence(1, size(ws) - 1)) t AS i
      WHERE ws[i - 1] <> '' AND ws[i] <> ''
    ), c12 AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    terms AS (
      SELECT CAST(floor(c
               * ln(CAST(sum(c) OVER (PARTITION BY w1) AS DOUBLE) / c)
               * 1000000000) AS BIGINT) AS t_q,
             c
      FROM c12
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(floor(sum(t_q) / (sum(c) * 1000.0)) AS BIGINT)
             AS h_cond_micro_nats,
           CAST(round(exp(CAST(floor(sum(t_q) / (sum(c) * 1000.0))
                               AS DOUBLE) / 1000000), 4) + 0.0 AS DOUBLE)
             AS branching_ppl
    FROM terms
    """
    )


@register(
    "k_pref_length_bias",
    oracle=f"""
    WITH scored AS ({{LOGREG}}),
    j AS (
      SELECT d.doc_id, d.lang, d.source, d.n_chars, s.score_q
      FROM documents d JOIN scored s USING (doc_id)
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY score_q DESC, doc_id) AS rb,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY score_q ASC, doc_id DESC) AS rw
      FROM j
    ), pairs AS (
      SELECT lang, source,
             max(CASE WHEN rb = 1 THEN n_chars END) AS len_chosen,
             max(CASE WHEN rw = 1 THEN n_chars END) AS len_rejected
      FROM ranked GROUP BY lang, source HAVING count(*) >= 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN len_chosen > len_rejected THEN 1 ELSE 0 END)
             AS BIGINT) AS n_chosen_longer,
           CAST(floor(sum(CASE WHEN len_chosen > len_rejected
                          THEN 1 ELSE 0 END) * 1000000 / count(*))
             AS BIGINT) AS chosen_longer_ppm,
           CAST(sum(len_chosen - len_rejected) AS BIGINT)
             AS total_len_gap,
           CAST(floor(CAST(sum(len_chosen - len_rejected) AS DOUBLE)
                      / count(*)) AS BIGINT) AS mean_len_gap
    FROM pairs
    """.replace("{LOGREG}", _REG_ORACLES["k_quality_logreg"]),
)
def k_pref_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbosity-bias audit for preference data: build (chosen, rejected)
    pairs per candidate group using the QUALITY-CLASSIFIER score (not
    length), then measure how often the chosen member is ALSO the longer
    one and the mean length gap — the confound check every RLHF/DPO
    dataset needs before training, because a judge (human or model) that
    systematically prefers longer responses teaches the policy verbosity,
    not quality (the Saito et al./AlpacaEval length-bias finding made
    into a pipeline gate; chosen_longer_ppm ≈ 500000 means unconfounded).
    ``k_dpo_pairs`` assembles pairs BY length-proxy; this key audits a
    score-based assembly AGAINST length.

    Counts and length gaps are exact integers; the two windows share one
    group-key exchange. Scale shape: the scorer is the registered
    zero-shuffle projection; everything after runs on the group spine."""
    # One-scan scorer spine; group keys and length from the same row
    # (guide §2.4 — the historical join was a doc_id PK self-join).
    j = quality_scored(spark, sf_dir, "lang", "source", "n_chars")
    from pyspark.sql.window import Window as W

    wb = W.partitionBy("lang", "source").orderBy(
        F.col("score_q").desc(), F.col("doc_id")
    )
    ww = W.partitionBy("lang", "source").orderBy(
        F.col("score_q").asc(), F.col("doc_id").desc()
    )
    ranked = j.select(
        "lang", "source", "n_chars",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
        F.count(F.lit(1)).over(W.partitionBy("lang", "source")).alias("gn"),
    )
    pairs = (
        ranked.filter(F.col("gn") >= 2)
        .groupBy("lang", "source")
        .agg(
            F.max(F.when(F.col("rb") == 1, F.col("n_chars"))).alias(
                "len_chosen"
            ),
            F.max(F.when(F.col("rw") == 1, F.col("n_chars"))).alias(
                "len_rejected"
            ),
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(F.col("len_chosen") > F.col("len_rejected"), 1).otherwise(0)
        ).cast("long").alias("n_chosen_longer"),
        F.floor(
            F.sum(
                F.when(
                    F.col("len_chosen") > F.col("len_rejected"), 1
                ).otherwise(0)
            )
            * 1000000
            / F.count(F.lit(1))
        ).cast("long").alias("chosen_longer_ppm"),
        F.sum(F.col("len_chosen") - F.col("len_rejected"))
        .cast("long")
        .alias("total_len_gap"),
        F.floor(
            F.sum(F.col("len_chosen") - F.col("len_rejected")).cast("double")
            / F.count(F.lit(1))
        ).cast("long").alias("mean_len_gap"),
    )


def _body_shuffle_quality(hash_expr: str) -> str:
    return f"""
    WITH docs AS (
      SELECT doc_id, source, {hash_expr} AS shuf_key FROM documents
    ), shuffled AS (
      SELECT source,
             lag(source) OVER (ORDER BY shuf_key, doc_id) AS prev_source
      FROM docs
    ), by_source AS (
      SELECT source,
             lag(source) OVER (ORDER BY source, doc_id) AS prev_source
      FROM docs
    ), src_sizes AS (
      SELECT source, count(*) AS n_s FROM docs GROUP BY source
    ), tot AS (SELECT count(*) AS n FROM docs),
    expected AS (
      SELECT CAST(sum(n_s * (n_s - 1)) AS DOUBLE)
             / (max(t.n) * (max(t.n) - 1)) AS p_same
      FROM src_sizes CROSS JOIN tot t
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_docs,
           CAST((SELECT sum(CASE WHEN source = prev_source THEN 1 ELSE 0 END)
                 FROM shuffled WHERE prev_source IS NOT NULL) AS BIGINT)
             AS shuffled_adj_same,
           CAST(floor((SELECT sum(CASE WHEN source = prev_source
                                  THEN 1 ELSE 0 END)
                       FROM shuffled WHERE prev_source IS NOT NULL)
                      * 1000000.0
                      / ((SELECT n FROM tot) - 1)) AS BIGINT)
             AS shuffled_adj_same_ppm,
           CAST(floor((SELECT sum(CASE WHEN source = prev_source
                                  THEN 1 ELSE 0 END)
                       FROM by_source WHERE prev_source IS NOT NULL)
                      * 1000000.0
                      / ((SELECT n FROM tot) - 1)) AS BIGINT)
             AS sorted_adj_same_ppm,
           CAST(floor((SELECT p_same FROM expected) * 1000000) AS BIGINT)
             AS expected_random_ppm
    """


@register(
    "k_shuffle_quality",
    oracle=_body_shuffle_quality(
        "md5('ep1:' || CAST(doc_id AS VARCHAR))"
    ),
)
def k_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-shuffle quality audit: order the corpus by a deterministic
    salted-hash permutation (the rerun-stable shuffle a training run
    uses) and measure the adjacent-pair same-source rate against (a) the
    pathological source-sorted order (≈ 1) and (b) the exact
    random-permutation expectation Σ n_s(n_s−1)/(N(N−1)) — a shuffled
    rate near (b) means batches mix sources as intended; a rate drifting
    toward (a) means the shuffle key correlates with source and training
    sees source-homogeneous batches (the gradient-noise pathology shard
    shuffling exists to prevent). The hash-permutation trick is the same
    rerun-stable machinery as ``k_sample_weighted``/``k_mix_epochs``;
    this key is its QUALITY CONTROL.

    Counts are exact integers over two total-order lag windows; the
    expectation is one exact rational floored at ppm. Scale shape: the
    two global sorts are the audit's honest cost (run at shard
    granularity in production — same statistic over shard-local
    windows); everything else is spine arithmetic."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _body_shuffle_quality("md5(concat('ep1:', CAST(doc_id AS STRING)))")
    )


# ------------------------------------------------------- schema drift ----


def _body_schema_drift() -> str:
    """Shared ANSI body (Spark temp-view `orders` / DuckDB view)."""
    halves = """
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-04-15 00:00:00'
                  THEN 'early' ELSE 'late' END AS half, *
      FROM orders
    """
    return f"""
    WITH h AS ({halves}),
    m AS (
      SELECT half, 'o_totalprice' AS column_name, 'mean' AS metric,
             avg(o_totalprice) AS v
      FROM h GROUP BY half
      UNION ALL
      SELECT half, 'o_totalprice', 'null_frac',
             avg(CASE WHEN o_totalprice IS NULL THEN 1.0 ELSE 0.0 END)
      FROM h GROUP BY half
      UNION ALL
      SELECT half, 'o_orderstatus', 'n_distinct',
             CAST(count(DISTINCT o_orderstatus) AS DOUBLE)
      FROM h GROUP BY half
      UNION ALL
      SELECT half, 'o_orderpriority', 'n_distinct',
             CAST(count(DISTINCT o_orderpriority) AS DOUBLE)
      FROM h GROUP BY half
      UNION ALL
      SELECT half, 'o_custkey', 'n_distinct',
             CAST(count(DISTINCT o_custkey) AS DOUBLE)
      FROM h GROUP BY half
      UNION ALL
      SELECT half, 'rows', 'count', CAST(count(*) AS DOUBLE)
      FROM h GROUP BY half
    )
    SELECT column_name, metric,
           round(max(CASE WHEN half = 'early' THEN v END), 4) AS early_val,
           round(max(CASE WHEN half = 'late' THEN v END), 4) AS late_val,
           round(max(CASE WHEN half = 'late' THEN v END)
                 / nullif(max(CASE WHEN half = 'early' THEN v END), 0.0)
                 - 1.0, 4) AS rel_change
    FROM m GROUP BY column_name, metric
    """


@register("k_schema_drift", oracle=_body_schema_drift())
def k_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot profile drift on the orders table, split at
    1998-04-15 (the corpus date midpoint) into early/late halves: per (column, metric) — mean and
    null fraction for the money column, distinct counts for the two enum
    columns and the FK, row count — side by side with the relative
    change. The ingest-contract check a scheduled pipeline runs BEFORE
    retraining: a jump in null_frac or a collapsed n_distinct is an
    upstream schema/extraction break that no row-level validator
    (k_expectations) sees, because every row is individually fine.

    One shared ANSI body (the k_ab_ztest precedent) — each UNION arm is
    a 2-row grouped aggregate over the same scan (Catalyst fuses the
    scan; distinct-count arms each reduce map-side), pivoted to
    early/late columns by conditional max. All six arms emit DOUBLE so
    the union is type-stable in both engines.

    Scale: a handful of full-scan aggregates over a date-partitioned
    table — at 100 TB each arm prunes to its half's partitions and the
    distinct counts swap to approx_count_distinct behind the same
    contract.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_body_schema_drift())


# -------------------------------------------------- freshness weights ----


@register(
    "k_freshness_weights",
    oracle="""
    WITH mx AS (
      SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS d0 FROM events
    ), w AS (
      SELECT event_type,
             exp(-0.1 * date_diff('day', CAST(date_trunc('day', ts) AS DATE),
                                  (SELECT d0 FROM mx))) AS wt
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(wt), 4) AS sum_weight,
           round(sum(wt) * sum(wt) / sum(wt * wt), 4) AS ess,
           round(sum(wt) * sum(wt) / sum(wt * wt) / count(*), 4)
             AS ess_ratio
    FROM w GROUP BY event_type
    """,
)
def k_freshness_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decay sampling weights per event type: w = exp(−0.1 · age)
    with age in whole days behind the corpus max day, rolled up to the
    per-type weight mass and Kish effective sample size (Σw)²/Σw² — the
    planning numbers for a freshness-weighted training draw (how much
    does recency weighting SHRINK each type's effective data?).

    Age is an integer day difference between DATE-truncated stamps (the
    NTZ-safe surface), so exp sees identical integer arguments in both
    engines; both libms round exp to ≤1 ulp and the corpus-sized sums
    drown that far below the 4dp rounding. The Σw² power sum accumulates
    in DOUBLE (weights are exp() doubles in (0, 1]) — no int64 wrap
    surface. The max-day scalar attaches via a broadcast 1-row cross
    join (the accepted scalar-attach shape).

    Scale: one scalar reduce + one grouped map-side-combinable pass.
    """
    e = load(spark, sf_dir, "events")
    mx = e.agg(
        F.max(F.date_trunc("DAY", F.col("ts")).cast("date")).alias("d0")
    )
    w = e.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.exp(
            -0.1
            * F.datediff(
                F.col("d0"), F.date_trunc("DAY", F.col("ts")).cast("date")
            )
        ).alias("wt"),
    )
    sw = F.sum("wt")
    sww = F.sum(F.col("wt") * F.col("wt"))
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(sw, 4).alias("sum_weight"),
        F.round(sw * sw / sww, 4).alias("ess"),
        F.round(sw * sw / sww / F.count(F.lit(1)), 4).alias("ess_ratio"),
    )


# ------------------------------------------- length-bucketed batching ----


@register(
    "k_bucket_batching_gain",
    oracle="""
    WITH lens AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ), gb AS (
      SELECT n, (row_number() OVER (ORDER BY doc_id) - 1) // 8 AS b
      FROM lens
    ), bb AS (
      SELECT n, (row_number() OVER (ORDER BY n, doc_id) - 1) // 8 AS b
      FROM lens
    ), gw AS (
      SELECT sum(mx * cnt - s) AS waste FROM (
        SELECT max(n) AS mx, count(*) AS cnt, sum(n) AS s
        FROM gb GROUP BY b) x
    ), bw AS (
      SELECT sum(mx * cnt - s) AS waste FROM (
        SELECT max(n) AS mx, count(*) AS cnt, sum(n) AS s
        FROM bb GROUP BY b) x
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM lens) AS n_docs,
           (SELECT CAST(waste AS BIGINT) FROM gw) AS arrival_pad_tokens,
           (SELECT CAST(waste AS BIGINT) FROM bw) AS bucketed_pad_tokens,
           round(1.0 - (SELECT waste FROM bw) * 1.0
                     / nullif((SELECT waste FROM gw), 0), 4) AS pad_gain
    """,
)
def k_bucket_batching_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste gain from length-bucketed batching: batch documents
    8 at a time in ARRIVAL order (doc_id) vs LENGTH-SORTED order, pad
    every batch to its max token count, and compare the wasted-token
    totals — the one number that justifies a bucketing stage in a
    training dataloader (k_batch_padding_waste measures the waste of one
    fixed policy; this measures the GAIN of switching).

    Batch assignment is floor((row_number − 1)/8) over a deterministic
    key (doc_id, or (length, doc_id)) so both engines build identical
    batches; all quantities are exact integer token counts until the
    final 4dp ratio. Scale note: the length-sorted row_number is a
    global sort ORDER — at 100 TB the same policy runs per shard
    (k_pack_sequences_sharded precedent: range-partition by length, then
    window within shards) with identical arithmetic; the global spec
    here keeps the oracle exact.
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    gb = lens.select(
        "n",
        F.floor(
            (F.row_number().over(Window.orderBy("doc_id")) - 1) / 8
        ).alias("b"),
    )
    bb = lens.select(
        "n",
        F.floor(
            (F.row_number().over(Window.orderBy("n", "doc_id")) - 1) / 8
        ).alias("b"),
    )

    def waste(batched: DataFrame) -> DataFrame:
        return (
            batched.groupBy("b")
            .agg(
                F.max("n").alias("mx"),
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n").alias("s"),
            )
            .agg(
                F.sum(
                    F.col("mx") * F.col("cnt") - F.col("s")
                ).alias("waste")
            )
        )

    n_docs = lens.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    gw = waste(gb).select(F.col("waste").alias("arrival_pad_tokens"))
    bw = waste(bb).select(F.col("waste").alias("bucketed_pad_tokens"))
    return (
        n_docs.crossJoin(F.broadcast(gw))
        .crossJoin(F.broadcast(bw))
        .select(
            "n_docs",
            F.col("arrival_pad_tokens").cast("long").alias(
                "arrival_pad_tokens"
            ),
            F.col("bucketed_pad_tokens").cast("long").alias(
                "bucketed_pad_tokens"
            ),
            F.round(
                1.0
                - F.col("bucketed_pad_tokens")
                / F.nullif(
                    F.col("arrival_pad_tokens").cast("double"), F.lit(0.0)
                ),
                4,
            ).alias("pad_gain"),
        )
    )


# ------------------------------------------ exact-k deterministic sample ----


@register(
    "k_sample_fixed_k",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('rsv:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS sample_rank
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(sample_rank AS BIGINT) AS sample_rank
    FROM ranked WHERE sample_rank <= 5
    """,
)
def k_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample (k = 5 per source) by
    salted-md5 rank — the reproducible reservoir-sampling equivalent: a
    uniform draw (hash order is independent of every attribute) that,
    unlike the hash-BUCKET predicate of k_sample_stratified, guarantees
    the exact per-group count a fixed-size eval set needs, and unlike
    `sampleBy` is stable across runs, partitionings, and engines.

    Per-group top-k over the hash ranking: Spark's window TopK pushes
    the rank filter into a partial sort per partition (no global sort of
    the corpus); the salt prefix ('rsv:') decorrelates this draw from
    every other salted-hash consumer in the registry. Deterministic
    bit-for-bit in both engines (md5 of identical strings, doc_id
    tiebreak).
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= 5)
    )
