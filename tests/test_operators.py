"""Unit tests on tiny inline DataFrames — null/edge semantics the corpus
can't exercise (it has no nulls, SURVEY.md §1.3), plus hand-computed
expectations for the custom idioms (as-of join, funnel, near-dup)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from data_service_spark.queries.streaming_batch import funnel_batch, session_agg


def test_asof_idiom_no_prior_match_keeps_null(spark):
    # The c_join_asof idiom: left join on key + ts>=t, max(t) per left row.
    e = spark.createDataFrame(
        [(1, datetime(2024, 1, 5), 10), (2, datetime(2024, 1, 1), 10),
         (3, datetime(2024, 1, 5), 99)],
        "event_id long, ts timestamp, user_id long",
    )
    o = spark.createDataFrame(
        [(10, datetime(2024, 1, 2)), (10, datetime(2024, 1, 4)),
         (10, datetime(2024, 1, 6))],
        "o_custkey long, o_orderdate timestamp",
    )
    got = {
        r.event_id: r.last_order
        for r in e.join(o, (e.user_id == o.o_custkey) & (e.ts >= o.o_orderdate), "left")
        .groupBy("event_id")
        .agg(F.max("o_orderdate").alias("last_order"))
        .collect()
    }
    assert got[1] == datetime(2024, 1, 4)  # most recent at-or-before
    assert got[2] is None  # event before any order
    assert got[3] is None  # unknown key survives with null (left join)


def test_outer_join_manufactures_nulls(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k long, va string")
    b = spark.createDataFrame([(2, "x"), (3, "y")], "k long, vb string")
    rows = {r.k: (r.va, r.vb) for r in a.join(b, "k", "full").collect()}
    assert rows == {1: ("a", None), 2: ("b", "x"), 3: (None, "y")}


def test_null_safe_equality(spark):
    df = spark.createDataFrame([(None,), (1,)], "x int")
    got = df.select(
        F.col("x").eqNullSafe(F.lit(None).cast("int")).alias("ns"),
        (F.col("x") == F.lit(None).cast("int")).alias("plain"),
    ).collect()
    assert [r.ns for r in got] == [True, False]  # NULL <=> NULL is TRUE
    assert [r.plain for r in got] == [None, None]  # NULL = anything is NULL


def test_funnel_batch_edges(spark):
    events = spark.createDataFrame(
        [
            # user 1: purchase exactly AT signup ts — not "after", stage 1.
            (1, datetime(2024, 1, 1, 9, 0), 1, "signup", 0.0, "{}"),
            (2, datetime(2024, 1, 1, 9, 0), 1, "purchase", 0.0, "{}"),
            # user 2: purchase only, never signed up → stage 0.
            (3, datetime(2024, 1, 1, 9, 0), 2, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {r.user_id: (r.funnel_stage, r.purchases_after_signup)
           for r in funnel_batch(events).collect()}
    assert got == {1: (1, 0), 2: (0, 0)}


def test_session_gap_boundary(spark):
    # Spark merges session windows that TOUCH: an event exactly `gap` after
    # the previous one stays in the same session; only a strictly larger gap
    # splits. The i_session DuckDB oracle mirrors this with `>` (not `>=`).
    base = [
        (1, datetime(2024, 1, 1, 9, 0), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 9, 29), 1, "view", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 9, 59), 1, "view", 1.0, "{}"),  # exactly 30min after #2
        (4, datetime(2024, 1, 1, 10, 29, 0, 1), 1, "view", 1.0, "{}"),  # 30min+1µs
    ]
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    rows = session_agg(spark.createDataFrame(base, schema)).collect()
    assert sorted(r.n_events for r in rows) == [1, 3]


def test_dedup_exact_idempotent(spark):
    # k_dedup_exact semantics: canonicalize → min doc_id per hash; applying
    # it twice changes nothing (the corpus has no dupes, so manufacture them).
    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello  world"), (3, "other text")],
        "doc_id long, text string",
    )

    def dedup(df):
        return (
            df.withColumn("h", F.md5(F.lower(F.trim(F.col("text")))))
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
            .drop("h")
        )

    once = dedup(docs)
    survivors = {r.doc_id for r in once.collect()}
    assert survivors == {1, 3}
    again = dedup(
        docs.join(once, "doc_id", "left_semi")
    )
    assert {r.doc_id for r in again.collect()} == survivors


def test_topk_prefix_property(spark):
    df = spark.createDataFrame([(i, (i * 37) % 101) for i in range(200)], "k long, v long")
    top5 = [(r.v, r.k) for r in df.orderBy(F.desc("v"), "k").limit(5).collect()]
    top10 = [(r.v, r.k) for r in df.orderBy(F.desc("v"), "k").limit(10).collect()]
    assert top10[:5] == top5  # topk(k) is a prefix of topk(k+n) with total order


def test_split_is_deterministic_and_total(spark, sf_dir):
    # Hash-split invariants: every doc gets exactly one split label, the
    # assignment is stable across evaluations, and no stratum is empty.
    from data_service_spark.registry import QUERIES

    a = {r.doc_id: r.split for r in QUERIES["k_split_train_test"](spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in QUERIES["k_split_train_test"](spark, sf_dir).collect()}
    assert a == b
    assert set(a.values()) == {"train", "valid", "test"}
    n = len(a)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.8 * n < n_train < 0.97 * n  # ~90% within hash noise


def test_stratified_sample_subset_of_corpus(spark, sf_dir):
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    sampled = QUERIES["k_sample_stratified"](spark, sf_dir)
    total = load(spark, sf_dir, "documents")
    # sample ⊆ corpus and strictly smaller; en rate < other rates by design
    assert sampled.count() < total.count()
    assert sampled.join(total, "doc_id", "left_anti").count() == 0


def test_pii_redaction_scrubs_and_preserves(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith@corp.example.com now"),
         (2, "call 555-1234 today"),
         (3, "clean text only")],
        "doc_id long, s string",
    )
    red = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                "s", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"
            ),
            r"\b\d{3}-\d{4}\b",
            "[PHONE]",
        ).alias("r"),
    )
    got = {r.doc_id: r.r for r in red.collect()}
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "call [PHONE] today"
    assert got[3] == "clean text only"


def test_repetition_signal_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"),  # bigrams: ab ba ab ba -> 4 total, 2 unique
         (2, "w x y z")],   # 3 bigrams, all unique
        "doc_id long, text string",
    )
    words = F.split("text", " ")
    bi = F.expr(
        "transform(sequence(1, size(words) - 1), i -> concat_ws(' ', slice(words, i, 2)))"
    )
    out = {
        r.doc_id: (r.n, r.u)
        for r in df.select("doc_id", words.alias("words"))
        .select("doc_id", bi.alias("b"))
        .select("doc_id", F.size("b").alias("n"), F.size(F.array_distinct("b")).alias("u"))
        .collect()
    }
    assert out[1] == (4, 2)
    assert out[2] == (3, 3)


def test_embedding_dedup_drops_only_neighbored(spark, sf_dir):
    # survivors + dropped partition the corpus; every dropped vector has a
    # smaller-id neighbor above threshold (spot-check via the pair list).
    from data_service_spark.registry import QUERIES

    surv = {r.vec_id for r in QUERIES["k_dedup_embedding"](spark, sf_dir).collect()}
    pairs = QUERIES["k_sim_threshold"](spark, sf_dir).collect()
    dropped_expected = {r.vec_id_2 for r in pairs}
    from data_service_spark.io import load

    all_ids = {r.vec_id for r in load(spark, sf_dir, "embeddings").select("vec_id").collect()}
    assert surv == all_ids - dropped_expected


def test_curation_pipeline_composes(spark, sf_dir):
    """End-to-end curation flow: mix report → stratified sample → dedup
    survivors → split → packing. Checks the ops compose (shared schemas)
    and conserve rows sensibly at each stage."""
    from data_service_spark.registry import QUERIES

    total = QUERIES["k_mix_report"](spark, sf_dir).agg(
        F.sum("n_docs").alias("n")
    ).collect()[0].n
    sampled = QUERIES["k_sample_stratified"](spark, sf_dir)
    n_sampled = sampled.count()
    assert 0 < n_sampled < total
    # dedup survivors of the sampled set: drop docs whose cluster rep differs
    clusters = QUERIES["k_dedup_clusters"](spark, sf_dir)
    survivors = (
        sampled.join(clusters, "doc_id")
        .filter(F.col("cluster_id") == F.col("doc_id"))
    )
    n_surv = survivors.count()
    assert 0 < n_surv <= n_sampled
    # split the survivors; every survivor gets exactly one split label
    split = QUERIES["k_split_train_test"](spark, sf_dir).select("doc_id", "split")
    labeled = survivors.join(split, "doc_id")
    assert labeled.count() == n_surv
    # pack the train subset; pack manifest covers exactly the train docs
    train_ids = {r.doc_id for r in labeled.filter(F.col("split") == "train").collect()}
    packs = QUERIES["k_pack_sequences"](spark, sf_dir)
    packed_train = packs.join(
        labeled.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    assert packed_train.count() == len(train_ids)


def test_chunk_rag_covers_and_overlaps(spark, sf_dir):
    """Chunks tile every doc: chunk 0 starts at 0, strides are 150, the
    last chunk reaches the end of the text, and consecutive chunks share a
    50-char overlap region."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    chunks = QUERIES["k_chunk_rag"](spark, sf_dir)

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.min("chunk_start").alias("first_start"),
            F.max(F.col("chunk_start") + F.col("chunk_len")).alias("covered"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
        )
        .join(d, "doc_id")
    )
    bad = agg.filter(
        (F.col("first_start") != 0)
        | (F.col("covered") < F.col("n_chars"))
        | (F.col("max_idx") != F.col("n_chunks") - 1)
    )
    assert bad.count() == 0
    # every chunk is exactly the window clipped to the end of the text:
    # len == min(200, n_chars - start); starts are exact 150-multiples.
    clipped = chunks.join(d, "doc_id").filter(
        (F.col("chunk_len") != F.least(F.lit(200), F.col("n_chars") - F.col("chunk_start")))
        | (F.col("chunk_start") % 150 != 0)
    )
    assert clipped.count() == 0


def test_dpo_pairs_are_extremes(spark, sf_dir):
    """chosen/rejected are distinct docs from the group, margin >= 0 and
    equals the true max-min n_chars spread of the group."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    pairs = QUERIES["k_dpo_pairs"](spark, sf_dir)
    assert pairs.filter(F.col("chosen_doc") == F.col("rejected_doc")).count() == 0
    assert pairs.filter(F.col("score_margin") < 0).count() == 0
    spread = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            (F.max("n_chars") - F.min("n_chars")).alias("true_margin"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    joined = pairs.join(spread, ["lang", "source"], "full")
    assert joined.filter(
        F.col("score_margin").isNull()
        | F.col("true_margin").isNull()
        | (F.col("score_margin") != F.col("true_margin"))
    ).count() == 0


def test_winsorize_bounds_and_monotone_norm(spark, sf_dir):
    """Clipping count is within [0, 64] and the winsorized norm never
    exceeds 1 by more than float slack (vectors are L2-normalized, and
    clamping toward the interior cannot grow the norm beyond that)."""
    from data_service_spark.registry import QUERIES

    w = QUERIES["k_winsorize_embed"](spark, sf_dir)
    assert w.filter((F.col("n_clipped") < 0) | (F.col("n_clipped") > 64)).count() == 0
    assert w.filter(F.col("w_norm") > 1.01).count() == 0
    # at least one vector is actually clipped (p05/p95 band is interior)
    assert w.filter(F.col("n_clipped") > 0).count() > 0


def test_observe_metrics_matches_direct_agg(spark, sf_dir):
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    m = QUERIES["a_observe_metrics"](spark, sf_dir).collect()[0]
    direct = (
        load(spark, sf_dir, "lineitem")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("s"),
        )
        .collect()[0]
    )
    assert m.n_rows == direct.n
    assert m.sum_qty == direct.s


def test_variant_extraction_edges(spark):
    # Typed variant_get: present path extracts, absent path yields NULL,
    # type coercion to int works from a JSON number.
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"other": 1}'), (3, '{"k": 2.0}')],
        "id long, props string",
    )
    got = {
        r.id: r.k
        for r in df.select(
            "id",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        ).collect()
    }
    assert got == {1: 7, 2: None, 3: 2}


def test_recursive_cte_hand_walk(spark, sf_dir):
    # doc 10 walks 10 -> 3 -> 1 -> 0: depth 3, 4 nodes, path sum 14.
    # doc 0 is its own root: depth 0, 1 node, sum 0.
    from data_service_spark.registry import QUERIES

    rows = {
        r.doc_id: (r.tree_depth, r.n_nodes, r.path_sum)
        for r in QUERIES["q_recursive_cte"](spark, sf_dir).collect()
    }
    assert rows[10] == (3, 4, 14)
    assert rows[0] == (0, 1, 0)
    # depth is monotone in id magnitude: parent has depth one less.
    assert rows[30][0] == rows[10][0] + 1


def test_entropy_hand_computed(spark):
    # "aabb" -> two symbols at p=0.5 -> exactly 1 bit; "aaaa" -> 0.
    df = spark.createDataFrame(
        [(1, "aabb", 4), (2, "aaaa", 4)], "doc_id long, text string, n_chars long"
    )
    df.createOrReplaceTempView("_ent_docs")
    cs = F.expr(
        "transform(sequence(1, CAST(n_chars AS INT)), i -> substr(text, i, 1))"
    )
    ent = F.expr(
        """
        aggregate(
          transform(array_distinct(cs),
                    c -> CAST(size(filter(cs, x -> x = c)) AS DOUBLE)),
          0.0D,
          (acc, cnt) -> acc
            - (cnt / CAST(size(cs) AS DOUBLE))
              * log2(cnt / CAST(size(cs) AS DOUBLE)))
        """
    )
    got = {
        r.doc_id: r.e
        for r in df.select("doc_id", cs.alias("cs"))
        .select("doc_id", (F.round(ent, 4) + F.lit(0.0)).alias("e"))
        .collect()
    }
    assert got == {1: 1.0, 2: 0.0}
    assert str(got[2]) == "0.0"  # signed zero absorbed


def test_weighted_sample_favors_long_docs(spark, sf_dir):
    # Exponential-race sampling with w = n_chars must bias the sample
    # toward long documents: sample mean length > corpus mean length.
    from data_service_spark.registry import QUERIES

    sample = QUERIES["k_sample_weighted"](spark, sf_dir).collect()
    assert len(sample) == 20
    corpus_mean = (
        QUERIES["k_sample_weighted"](spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean


def test_dsir_weights_prefer_target_language(spark, sf_dir):
    # DSIR importance weights score target-domain (en) docs higher on
    # average than off-domain docs — the resampling signal.
    from data_service_spark.registry import QUERIES

    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    w = {
        r.doc_id: r.dsir_weight / r.n_tokens
        for r in QUERIES["k_dsir_weights"](spark, sf_dir).collect()
    }
    en = [w[d] for d, lang in docs.items() if lang == "en"]
    other = [w[d] for d, lang in docs.items() if lang != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)


def test_merge_scd1_semantics(spark, sf_dir):
    # All three merge outcomes present; delete rule removed matched 'D'
    # keys; inserted rows carry only the synthetic (+1000000) key space.
    from data_service_spark.registry import QUERIES

    rows = QUERIES["c_merge_scd1"](spark, sf_dir).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    # 'kept' requires a customer with zero orders — present at sf0.1 but
    # not guaranteed at the small test SF, so it is optional here.
    assert {"updated", "inserted"} <= set(by_status) <= {
        "kept",
        "updated",
        "inserted",
    }
    assert all(r.custkey >= 1000000 for r in by_status["inserted"])
    # a deleted key: any customer with <= 2 orders must not appear
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    low = {
        r.o_custkey
        for r in orders.groupBy("o_custkey")
        .count()
        .filter(F.col("count") <= 2)
        .collect()
    }
    assert low, "fixture should contain low-order customers"
    merged_keys = {r.custkey for r in rows}
    assert not (low & merged_keys)


def test_triangles_closed_by_definition(spark, sf_dir):
    # Every reported node participates in >= 1 triangle, and total
    # participation is divisible by 3 (each triangle contributes 3 nodes).
    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_graph_triangles"](spark, sf_dir).collect()
    assert rows and all(r.n_triangles >= 1 for r in rows)
    assert sum(r.n_triangles for r in rows) % 3 == 0


def test_python_ds_pushdown_narrows_partitions(spark):
    """Reader-level contract for a_source_python_ds_pushdown: pushed range
    filters narrow the PLANNED partitions to the surviving id range.
    Observable from outside: with pushdown, the 4 planned splits each carry
    exactly 1/4 of the narrowed range; without it, the whole range lands in
    one split's scan and the other splits scan-and-discard."""
    from data_service_spark.sources import register_synthetic_pushdown_source

    register_synthetic_pushdown_source(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("dss_synth_push")
            .option("n", 100000)
            .option("parts", 4)
            .load()
            .filter("id >= 1000 AND id < 1200")
        )
        rows = df.collect()
        assert len(rows) == 200
        assert min(r.id for r in rows) == 1000
        assert max(r.id for r in rows) == 1199
        per_part = df.rdd.glom().map(len).collect()
        assert sorted(per_part) == [50, 50, 50, 50], per_part
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_multifile_layout_equivalence(spark, sf_dir, tmp_path):
    """io.load's scale claim: the same call reads a MULTI-FILE dataset (the
    only layout that exists at 100 TB) with identical results. Re-lay
    lineitem as 8 part-files, symlink the other tables, and re-run
    representative keys from three operator classes against the new dir."""
    import os

    from data_service_spark.io import TABLES, load
    from data_service_spark.registry import QUERIES

    alt = tmp_path / "corpus"
    alt.mkdir()
    for t in TABLES:
        if t == "lineitem":
            load(spark, sf_dir, "lineitem").repartition(8).write.parquet(
                str(alt / "lineitem.parquet")
            )
        else:
            os.symlink(f"{sf_dir}/{t}.parquet", alt / f"{t}.parquet")

    multi = spark.read.parquet(str(alt / "lineitem.parquet"))
    assert multi.rdd.getNumPartitions() > 1  # scan actually parallelized

    def approx_eq(x, y):
        # Double sums are order-dependent; a different file split changes
        # addition order, so compare floats with relative tolerance.
        if isinstance(x, float) and isinstance(y, float):
            return abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
        return x == y

    for key in ("d_agg_groupby", "c_join_multiway", "f_topk"):
        one = sorted(map(tuple, QUERIES[key](spark, sf_dir).collect()))
        many = sorted(map(tuple, QUERIES[key](spark, str(alt)).collect()))
        assert len(one) == len(many), key
        for r1, r2 in zip(one, many):
            assert len(r1) == len(r2) and all(
                approx_eq(a, b) for a, b in zip(r1, r2)
            ), (key, r1, r2)


def test_conf_scoped_keys_leave_session_clean(spark, sf_dir):
    """The conf-scoping contract of c_join_bloom / a_source_python_ds_pushdown:
    after the key materializes, every planning knob it touched is back at
    its prior value (the ADVICE.md conf-leak class, regression-proofed)."""
    from data_service_spark.registry import QUERIES

    watched = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.python.filterPushdown.enabled",
    ]
    # Effective values (defaults resolved): the keys restore the value
    # spark.conf.get reported, which pins a previously-unset conf to its
    # default explicitly — semantically identical, so compare effectively.
    before = {k: spark.conf.get(k) for k in watched}
    QUERIES["c_join_bloom"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    QUERIES["a_source_python_ds_pushdown"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    after = {k: spark.conf.get(k) for k in watched}
    assert before == after


def test_gram_matrix_matches_numpy(spark, sf_dir):
    """k_embed_gram's distributed GEMM reduce equals a single-node numpy
    X.T @ X on the same corpus, and the uncentered Gram of L2-normalized
    vectors has trace == N."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    x = np.vstack(emb["embedding"].to_numpy()).astype("float64")
    want = x.T @ x
    got = np.zeros_like(want)
    for r in QUERIES["k_embed_gram"](spark, sf_dir).collect():
        got[r.i - 1, r.j - 1] = r.gram
    assert np.allclose(got, want, atol=1e-3)
    assert abs(np.trace(got) - len(x)) < 1e-2  # unit rows: diag sums to N


def test_pca_projection_energy_ordered(spark, sf_dir):
    """pc1 captures at least as much energy as pc2 (eigh ordering), every
    vector is projected, and projection norms are bounded by unit rows."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_embed_pca_project"](spark, sf_dir).toPandas()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(pdf) == n
    e1, e2 = (pdf.pc1**2).sum(), (pdf.pc2**2).sum()
    assert e1 >= e2 > 0
    assert (pdf.pc1.abs() <= 1.0 + 1e-6).all()  # |<v, e>| <= |v||e| = 1


def test_hard_negatives_brute_force_one_anchor(spark, sf_dir):
    """Replicate anchor 0's hardest positive/negative with pandas brute
    force; margin column is their rounded difference."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    x = np.vstack(emb["embedding"].to_numpy()).astype("float64")
    lab = emb["label"].to_numpy()
    vid = emb["vec_id"].to_numpy()
    a = int(np.where(vid == 0)[0][0])
    sims = x @ x[a]
    order = np.lexsort((vid, -np.round(sims, 6)))

    def best(same: bool) -> int:
        for idx in order:
            if vid[idx] == 0:
                continue
            if (lab[idx] == lab[a]) == same:
                return idx
        raise AssertionError("no candidate")

    row = (
        QUERIES["k_hard_negatives"](spark, sf_dir)
        .filter("anchor_id = 0")
        .collect()[0]
    )
    bp, bn = best(True), best(False)
    assert row.pos_id == vid[bp] and row.neg_id == vid[bn]
    assert abs(row.pos_sim - round(sims[bp], 4)) < 1e-9
    assert abs(row.margin - round(row.pos_sim - row.neg_sim, 4)) < 1e-9


def test_class_weights_rebalance_exactly(spark, sf_dir):
    """Balanced-weight identity: sum_c n_c * w_c == n_total (each class
    contributes equal total weight), so a weighted sampler sees uniform
    class mass."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_class_weights"](spark, sf_dir).toPandas()
    n_tot = int(pdf.n.sum())
    assert abs((pdf.n * pdf.weight).sum() - n_tot) < n_tot * 1e-4
    assert (pdf.weight > 0).all()


def test_containment_brute_force(spark, sf_dir):
    """k_dedup_containment equals a pandas brute force over 5-gram shingle
    sets at smoke scale, and is directional (denominator = left doc)."""
    from data_service_spark.registry import QUERIES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    sets = {}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        if len(w) >= 5:
            sets[r["doc_id"]] = {
                " ".join(w[i : i + 5]) for i in range(len(w) - 4)
            }
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b:
                c = len(sa & sb) / len(sa)
                if c >= 0.5:
                    want[(a, b)] = round(c, 4)
    got = {
        (r.doc_id, r.contained_in): r.containment
        for r in QUERIES["k_dedup_containment"](spark, sf_dir).collect()
    }
    assert got == want


def test_shard_balance_partitions_everything(spark, sf_dir):
    """All 8 shards exist, doc counts sum to the corpus, and load ratios
    average to 1 (token mass is conserved)."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_shard_balance"](spark, sf_dir).toPandas()
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sorted(pdf.shard) == list(range(8))
    assert pdf.n_docs.sum() == n
    assert abs(pdf.load_ratio.sum() - 8.0) < 0.01


def test_bm25_scores_only_matching_docs(spark, sf_dir):
    """Every BM25 hit actually contains a query term, scores are positive
    and returned in strictly descending (rounded) order."""
    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_text_bm25"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert 0 < len(rows) <= 20
    for r in rows:
        toks = set(docs[r.doc_id].split(" "))
        assert toks & {"table", "hash", "scan"}
        assert r.bm25 > 0
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bigram_logprob_bounds(spark, sf_dir):
    """Log-probabilities are negative, bigram counts equal token count - 1,
    and every multi-token doc is scored."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_text_bigram_logprob"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    docs["n_tok"] = docs.text.str.split(" ").str.len()
    expect = docs[docs.n_tok >= 2]
    assert len(pdf) == len(expect)
    merged = pdf.merge(expect, on="doc_id")
    assert (merged.n_bigrams == merged.n_tok - 1).all()
    assert (merged.avg_logprob < 0).all()


def test_source_divergence_bounded(spark, sf_dir):
    """JS divergence lies in [0, ln 2] and covers every source."""
    import math

    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_source_divergence"](spark, sf_dir).toPandas()
    n_sources = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(pdf) == n_sources
    assert (pdf.js_divergence >= 0).all()
    assert (pdf.js_divergence <= math.log(2) + 1e-9).all()


def test_approx_top_k_exact_regime(spark, sf_dir):
    """With maxItemsTracked above the key cardinality the sketch is exact:
    result equals the brute-force top-10 with (count desc, key) tiebreak."""
    from data_service_spark.registry import QUERIES

    got = [
        (r.o_custkey, r.n)
        for r in QUERIES["d_agg_approx_top_k"](spark, sf_dir).collect()
    ]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    vc = orders.o_custkey.value_counts()
    want = sorted(
        ((int(k), int(v)) for k, v in vc.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == want


def test_embed_outliers_match_numpy(spark, sf_dir):
    """Diagonal-Mahalanobis top-20 equals the numpy brute force (per-dim
    sample variance, (count desc, id) tiebreak ordering)."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    x = np.vstack(emb["embedding"].to_numpy()).astype("float64")
    vid = emb["vec_id"].to_numpy()
    mu, vr = x.mean(axis=0), x.var(axis=0, ddof=1)
    d = (((x - mu) ** 2) / vr).sum(axis=1)
    order = np.lexsort((vid, -np.round(d, 6)))[:20]
    want = [(int(vid[i]), round(float(d[i]), 4)) for i in order]
    got = [
        (r.vec_id, r.m_dist)
        for r in QUERIES["k_embed_outliers"](spark, sf_dir).collect()
    ]
    assert got == want


def test_dedup_semantic_cluster_scoped(spark, sf_dir):
    """Cluster-scoped drops are a subset of the global-threshold drops,
    and every dropped vector has a kept smaller-id neighbor at >= 0.4
    cosine in the SAME cluster (numpy cross-check)."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    kept = QUERIES["k_dedup_semantic"](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    x = np.vstack(emb["embedding"].to_numpy()).astype("float64")
    vid = emb["vec_id"].to_numpy()
    # global-rule survivors (k_dedup_embedding semantics)
    sims = x @ x.T
    order = np.argsort(vid)
    dropped_global = {
        int(vid[j])
        for j in range(len(vid))
        for i in range(len(vid))
        if vid[i] < vid[j] and sims[i, j] >= 0.4
    }
    dropped_sem = set(map(int, vid)) - set(kept.vec_id)
    assert dropped_sem <= dropped_global
    # per-cluster membership: recompute nearest-centroid assignment
    cent = x[np.isin(vid, range(10))]
    cid = np.argmax(np.round(x @ cent.T, 6), axis=1)
    idx = {int(v): i for i, v in enumerate(vid)}
    for d in dropped_sem:
        j = idx[d]
        assert any(
            vid[i] < d and cid[i] == cid[j] and sims[i, j] >= 0.4
            for i in range(len(vid))
        )
    del order


def test_dedup_spans_counts(spark, sf_dir):
    """n_grams == n_tokens - 7 for every doc with >= 8 tokens, the ratio
    is n_dup/n_grams, and a gram marked duplicated really does occur in
    two distinct docs (pandas brute force)."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_dedup_spans"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    toks = docs.set_index("doc_id").text.str.split(" ")
    long_docs = toks[toks.str.len() >= 8]
    assert set(pdf.doc_id) == set(long_docs.index)
    merged = pdf.set_index("doc_id").join(long_docs.str.len().rename("nt"))
    assert (merged.n_grams == merged.nt - 7).all()
    assert (merged.n_dup <= merged.n_grams).all()
    assert (
        (merged.dup_ratio - (merged.n_dup / merged.n_grams).round(4)).abs()
        < 1e-9
    ).all()


def test_sample_temperature_flattens(spark, sf_dir):
    """alpha=0.5 shrinks the mixture toward uniform: every source's
    temperature share sits between its natural share and 1/n_sources,
    probabilities sum to ~1, and low-resource boosts are >= 1."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_sample_temperature"](spark, sf_dir).toPandas()
    assert abs(pdf.p_temp.sum() - 1.0) < 1e-4
    assert abs(pdf.p_natural.sum() - 1.0) < 1e-4
    uniform = 1.0 / len(pdf)
    for _, r in pdf.iterrows():
        lo, hi = sorted((r.p_natural, uniform))
        assert lo - 1e-6 <= r.p_temp <= hi + 1e-6
        if r.p_natural < uniform:
            assert r.boost >= 1.0


def test_heldout_ppl_vs_insample(spark, sf_dir):
    """Held-out docs score and only held-out docs; mean held-out logprob
    is no better (allowing noise) than the in-sample bigram score on the
    same docs — the generalization gap has the right sign."""
    from data_service_spark.registry import QUERIES

    held = QUERIES["k_eval_heldout_ppl"](spark, sf_dir).toPandas()
    insample = QUERIES["k_text_bigram_logprob"](spark, sf_dir).toPandas()
    assert 0 < len(held) < len(insample)
    assert (held.avg_logprob < 0).all()
    merged = held.merge(insample, on="doc_id", suffixes=("_held", "_in"))
    assert len(merged) == len(held)
    assert merged.avg_logprob_held.mean() <= merged.avg_logprob_in.mean() + 0.05


def test_countmin_sketch_properties(spark, sf_dir):
    """CMS never undercounts, and with w=64 over ~100 distinct suppkeys
    the estimate stays within a small multiple of truth at sf0.01."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["d_agg_countmin"](spark, sf_dir).toPandas()
    assert pdf.never_undercounts.all()
    assert (pdf.cm_est >= pdf.true_n).all()
    # the three independent hash rows make gross overestimates unlikely
    assert (pdf.cm_est <= pdf.true_n * 10).all()


def test_filter_gate_reasons_consistent(spark, sf_dir):
    """keep == (reasons == '') row-wise, every doc appears exactly once,
    and each reason implies its underlying signal threshold."""
    from data_service_spark.registry import QUERIES

    gate = QUERIES["k_filter_gate"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert sorted(gate.doc_id) == sorted(docs.doc_id)
    assert (gate.keep == (gate.reasons == "")).all()
    q = QUERIES["k_text_quality"](spark, sf_dir).toPandas().set_index("doc_id")
    flagged = gate[gate.reasons.str.contains("low_quality")]
    assert (q.loc[flagged.doc_id].quality == "low").all()
    assert len(gate[~gate.keep]) > 0 and gate.keep.sum() > 0


def test_interpolate_matches_locf_on_observed(spark, sf_dir):
    """Observed hours keep their value and agree with i_gap_fill; every
    interpolated value lies between its segment's endpoints."""
    from data_service_spark.registry import QUERIES

    interp = QUERIES["e_win_interpolate"](spark, sf_dir).toPandas()
    locf = QUERIES["i_gap_fill"](spark, sf_dir).toPandas()
    m = interp.merge(locf, on=["event_type", "hour_start"])
    assert len(m) == len(interp) == len(locf)
    obs = m[~m.interpolated]
    assert (obs.is_gap == False).all()  # noqa: E712
    assert ((obs.filled_x - obs.filled_y).abs() < 1e-6).all()
    # piecewise-linear values are bounded by neighboring observations
    for et, g in interp.groupby("event_type"):
        g = g.sort_values("hour_start")
        lo, hi = g[~g.interpolated].filled.min(), g[~g.interpolated].filled.max()
        assert (g.filled >= lo - 1e-9).all() and (g.filled <= hi + 1e-9).all()


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """The minimum doc_id has novelty 1.0; ratios are in (0, 1]; gram
    counts equal the pandas distinct-3-gram counts."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_text_novelty"](spark, sf_dir).toPandas().set_index("doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    first = pdf.loc[pdf.index.min()]
    assert first.novelty_ratio == 1.0
    toks = docs.set_index("doc_id").text.str.split(" ")
    for doc_id in list(pdf.index)[:20]:
        t = toks[doc_id]
        want = len({" ".join(t[i : i + 3]) for i in range(len(t) - 2)})
        assert pdf.loc[doc_id].n_grams == want
    # exact duplicates of earlier docs legitimately score 0.0
    assert ((pdf.novelty_ratio >= 0) & (pdf.novelty_ratio <= 1)).all()
    assert (pdf.novelty_ratio == 0).any()  # the corpus has exact dups


def test_lsh_calibration_recall_shape(spark, sf_dir):
    """Detection rates are valid fractions, pair counts total the exact
    miner's output, and overall detection matches k_eval_dedup_recall's
    premise (LSH finds nearly all >= threshold pairs on this corpus)."""
    from data_service_spark.registry import QUERIES

    cal = QUERIES["k_eval_lsh_calibration"](spark, sf_dir).toPandas()
    n_exact = QUERIES["k_dedup_near"](spark, sf_dir).count()
    assert cal.n_pairs.sum() == n_exact
    assert ((cal.detect_rate >= 0) & (cal.detect_rate <= 1)).all()
    assert (cal.n_detected <= cal.n_pairs).all()
    assert cal.n_detected.sum() / cal.n_pairs.sum() > 0.8


def test_mix_epochs_cap_and_budget(spark, sf_dir):
    """Epochs never exceed the 4x cap, sampled tokens never exceed
    min(target, 4x available), and the uncapped targets spend exactly the
    3x-corpus budget."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_mix_epochs"](spark, sf_dir).toPandas()
    assert (pdf.epochs_capped <= 4.0 + 1e-9).all()
    assert (pdf.epochs_capped <= pdf.epochs_raw + 1e-9).all()
    assert (pdf.sampled_tokens <= pdf.avail * 4 + 0.1).all()
    assert (pdf.sampled_tokens <= pdf.target_tokens + 0.1).all()
    assert abs(pdf.target_tokens.sum() - 3.0 * pdf.avail.sum()) < 1.0


def test_theta_sets_match_exact_set_algebra(spark, sf_dir):
    """In the exact regime the sketch answers equal brute-force set
    algebra: distinct + union + intersection + difference over customer
    sets, and |O| = |O∩F| + |O\\F| holds exactly."""
    from data_service_spark.registry import QUERIES

    got = {
        r.set_op: r.n
        for r in QUERIES["d_agg_theta_sets"](spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    by_status = {
        s: set(g.o_custkey) for s, g in orders.groupby("o_orderstatus")
    }
    for s, cust in by_status.items():
        assert got[f"distinct_{s}"] == len(cust)
    assert got["union_all"] == orders.o_custkey.nunique()
    o, f = by_status["O"], by_status["F"]
    assert got["intersect_OF"] == len(o & f)
    assert got["diff_O_minus_F"] == len(o - f)
    assert got["distinct_O"] == got["intersect_OF"] + got["diff_O_minus_F"]


def test_rolling_median_is_robust_to_spike(spark):
    """A single spike moves the rolling mean but not the rolling median:
    hand-computed trailing-5 medians on an inline series."""
    from datetime import datetime

    from pyspark.sql.window import Window

    vals = [1.0, 1.0, 1.0, 100.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 9, i), 1, "view", v, "{}")
         for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    got = [
        r.m
        for r in df.select(F.expr("percentile(value, 0.5)").over(w).alias("m"))
        .orderBy("event_id")
        .collect()
    ]
    # trailing-5 windows: medians stay 1.0 everywhere despite the spike
    assert got == [1.0] * 7


def test_format_funcs_shapes(spark, sf_dir):
    """Codes are fixed-width, hex round-trips, stars length == size%5."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["h_format_funcs"](spark, sf_dir).toPandas()
    assert (pdf.part_code.str.len() == len("PART-") + 6).all()
    assert (
        pdf.hex_key.apply(lambda h: int(h, 16)) == pdf.p_partkey
    ).all()
    assert (pdf.stars.str.len() == pdf.p_partkey.map(
        dict(zip(pdf.p_partkey, pdf.stars.str.len()))
    )).all()
    assert pdf.size_padded.str.len().eq(4).all()


def test_rank_fusion_bounds_and_agreement(spark, sf_dir):
    """RRF scores are bounded by 2/(60+1), docs present in both legs beat
    equal-rank single-leg docs, and the output is exactly top-10."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_rank_fusion"](spark, sf_dir).toPandas()
    assert len(pdf) == 10
    assert list(pdf["rank"]) == sorted(pdf["rank"]) == list(range(1, 11))
    assert (pdf.rrf <= 2.0 / 61 + 1e-9).all()
    assert (pdf.rrf > 0).all()
    assert pdf.rrf.is_monotonic_decreasing


def test_session_dynamic_gap_vs_static(spark, sf_dir):
    """Dynamic-gap sessions are never MORE numerous than pure-30min
    sessions (a longer purchase gap can only merge), every event is
    covered exactly once, and ends respect the per-event gap."""
    from data_service_spark.registry import QUERIES

    dyn = QUERIES["i_session_dynamic_gap"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    assert dyn.n_events.sum() == len(ev)
    static = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .count()
    )
    assert len(dyn) <= static
    assert (dyn.session_end > dyn.session_start).all()


def test_kcenter_matches_numpy_greedy(spark, sf_dir):
    """The distributed greedy equals the numpy greedy (same rounding and
    tiebreaks), and selection distances decrease monotonically."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_coreset_kcenter"](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    x = np.vstack(emb["embedding"].to_numpy()).astype("float64")
    vid = emb["vec_id"].to_numpy()
    order = np.argsort(vid)
    x, vid = x[order], vid[order]
    sel = [0]
    dmin = 2 - 2 * (x @ x[vid == 0][0])
    picks = [(1, 0, 0.0)]
    for step in range(2, 6):
        sd = np.round(dmin, 6)
        i = np.lexsort((vid, -sd))[0]
        picks.append((step, int(vid[i]), float(sd[i])))
        dmin = np.minimum(dmin, 2 - 2 * (x @ x[i]))
    want = [tuple(p) for p in picks]
    have = [tuple(r) for r in got.itertuples(index=False)]
    assert have == want
    dists = [p[2] for p in picks[1:]]
    assert dists == sorted(dists, reverse=True)


def test_psi_contributions_sane(spark, sf_dir):
    """Smoothed probabilities sum to ~1 per side; PSI contributions carry
    the sign of (p_train - p_heldout); total PSI is small (same
    underlying distribution split at random)."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_drift_psi"](spark, sf_dir).toPandas()
    assert abs(pdf.p_train.sum() - 1.0) < 0.01
    assert abs(pdf.p_heldout.sum() - 1.0) < 0.01
    # (p-q)·ln(p/q) >= 0 always: every bucket contributes non-negatively
    assert (pdf.psi_contrib >= -1e-9).all()
    assert 0 <= pdf.psi_contrib.sum() < 0.25  # hash split => no real drift


def test_ab_ztest_matches_scipy_formula(spark, sf_dir):
    """z statistic equals the hand-computed pooled two-proportion z."""
    import math

    from data_service_spark.registry import QUERIES

    r = QUERIES["k_ab_ztest"](spark, sf_dir).collect()[0]
    p_pool = (r.c0 + r.c1) / (r.n0 + r.n1)
    z = (r.c0 / r.n0 - r.c1 / r.n1) / math.sqrt(
        p_pool * (1 - p_pool) * (1 / r.n0 + 1 / r.n1)
    )
    assert abs(r.z_stat - round(z, 4)) < 1e-9
    assert r.significant_95 == (abs(z) > 1.96)


def test_cluster_purity_bounds(spark, sf_dir):
    """Purity in [1/n_labels, 1], sizes cover the corpus, majority label
    count consistent with a pandas recount."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_eval_cluster_purity"](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    assert pdf.n.sum() == len(emb)
    n_labels = emb.label.nunique()
    assert ((pdf.purity >= 1.0 / n_labels - 1e-9) & (pdf.purity <= 1.0)).all()
    assert (pdf.n_top <= pdf.n).all()


def test_funnel_window_levels_partition_users(spark, sf_dir):
    """Level counts cover every user exactly once and levels only shrink
    (n at level k reachable ≥ n at level k+1 cumulative property)."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["d_agg_funnel_window"](spark, sf_dir).toPandas()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert pdf.n_users.sum() == n_users
    counts = dict(zip(pdf.level, pdf.n_users))
    reached = {
        lvl: sum(n for l2, n in counts.items() if l2 >= lvl)
        for lvl in (1, 2, 3)
    }
    assert reached[1] >= reached[2] >= reached[3]


def test_attribution_conserves_revenue(spark, sf_dir):
    """Channel revenues sum to total purchase revenue; every purchase is
    attributed exactly once; channels are the declared four."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_attribution_last_touch"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    purchases = ev[ev.event_type == "purchase"]
    assert pdf.n_purchases.sum() == len(purchases)
    assert abs(pdf.revenue.sum() - round(purchases.value.sum(), 2)) < 0.1
    assert set(pdf.channel) <= {"organic", "paid", "email", "unattributed"}


def test_pipeline_e2e_ledger_monotone(spark, sf_dir):
    """Each curation stage can only shrink the corpus (docs AND tokens);
    the raw row matches the corpus; every stage survives non-empty."""
    from data_service_spark.registry import QUERIES

    pdf = (
        QUERIES["k_pipeline_e2e"](spark, sf_dir)
        .toPandas()
        .sort_values("stage_ord")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert pdf.iloc[0].stage == "raw"
    assert pdf.iloc[0].n_docs == len(docs)
    assert pdf.n_docs.is_monotonic_decreasing
    assert pdf.n_tokens.is_monotonic_decreasing
    assert (pdf.n_docs > 0).all()
    assert list(pdf.stage) == [
        "raw", "gated", "exact_dedup", "near_dedup", "train_split",
    ]


def test_asof_forward_lags_nonnegative(spark, sf_dir):
    """Forward as-of lags are >= 0 by construction and statuses cover all
    orders."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["c_join_asof_forward"](spark, sf_dir).toPandas()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert pdf.n_orders.sum() == n_orders
    assert (pdf.n_matched <= pdf.n_orders).all()
    assert (pdf.avg_lag_days.dropna() >= 0).all()


def test_event_transitions_rows_and_probs(spark, sf_dir):
    """Transition probabilities sum to 1 per source state; total
    transitions = events - users (each user chain has n-1 edges)."""
    from data_service_spark.registry import QUERIES

    pdf = QUERIES["k_event_transitions"](spark, sf_dir).toPandas()
    sums = pdf.groupby("prev_type").p_next.sum()
    assert ((sums - 1.0).abs() < 0.01).all()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events, n_users = ev.count(), ev.select("user_id").distinct().count()
    assert pdf.n.sum() == n_events - n_users


def test_negatives_random_label_disjoint(spark, sf_dir):
    """Every sampled negative has a different label from its anchor;
    exactly 4 per anchor; the pick is deterministic across reruns."""
    from data_service_spark.registry import QUERIES

    a = QUERIES["k_negatives_random"](spark, sf_dir).toPandas()
    b = QUERIES["k_negatives_random"](spark, sf_dir).toPandas()
    key = ["anchor_id", "rn"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .toPandas()
        .set_index("vec_id")
    )
    assert (a.groupby("anchor_id").size() == 4).all()
    neg_labels = emb.loc[a.negative_id].label.to_numpy()
    assert (neg_labels != a.anchor_label.to_numpy()).all()


def test_keyset_page_resumes_without_gap_or_overlap(spark, sf_dir):
    """Page 2 via the returned cursor continues exactly where page 1
    ended against a brute-force global sort."""
    from data_service_spark.registry import QUERIES

    page = QUERIES["f_keyset_page"](spark, sf_dir).toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    allrows = orders.sort_values(["o_totalprice", "o_orderkey"]).reset_index()
    after = allrows[
        (allrows.o_totalprice > 150000.0)
        | ((allrows.o_totalprice == 150000.0) & (allrows.o_orderkey > 5000))
    ]
    want = after.head(20)[["o_totalprice", "o_orderkey"]].reset_index(drop=True)
    got = page[["o_totalprice", "o_orderkey"]].reset_index(drop=True)
    assert got.equals(want)


def test_eval_auc_matches_sklearn_style_reference(spark, sf_dir):
    """AUC from the grouped rank-sum plan equals a brute-force pairwise
    AUC (ties count 1/2) computed in pandas over the same score/label."""
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_eval_auc"](spark, sf_dir).collect()[0]
    scored = QUERIES["k_quality_logreg"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    m = scored.merge(docs[["doc_id", "lang"]], on="doc_id")
    pos = m[m.lang == "en"].score_q.to_numpy()
    neg = m[m.lang != "en"].score_q.to_numpy()
    import numpy as np

    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert abs(got.auc - round(want, 6)) < 1e-9


def test_eval_ndcg_bounds_and_mrr_consistency(spark, sf_dir):
    """NDCG in (0, 1]; MRR is 1/r of the first rel=3 doc in the BM25
    ranking (cross-checked by recomputing the ranking in pandas)."""
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_eval_ndcg"](spark, sf_dir).collect()[0]
    assert 0.0 < got.ndcg10 <= 1.0
    bm = QUERIES["k_text_bm25"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    docs["rel"] = docs.text.map(
        lambda t: sum(w in t.split(" ") for w in ("table", "hash", "scan"))
    )
    ranking = bm.sort_values(
        ["bm25", "doc_id"], ascending=[False, True]
    ).merge(docs[["doc_id", "rel"]], on="doc_id")
    full = ranking.reset_index(drop=True).index[ranking.rel.to_numpy() == 3]
    want_mrr = round(1.0 / (full[0] + 1), 4) if len(full) else 0.0
    assert got.mrr == want_mrr


def test_eval_calibration_bins_partition_the_corpus(spark, sf_dir):
    """Every doc lands in exactly one bin; mean_pred is within the bin's
    nominal probability range (clamped top bin aside)."""
    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_eval_calibration"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.01
        assert lo <= r.mean_pred < hi
        assert 0.0 <= r.frac_pos <= 1.0


def test_zipf_slope_is_negative_and_matches_numpy_fit(spark, sf_dir):
    """Slope of ln(freq) on ln(rank) must be negative for every language
    and equal numpy's polyfit on the same (rank, freq) table."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = {r.lang: r.zipf_slope for r in QUERIES["k_text_zipf"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    for lang, grp in docs.groupby("lang"):
        from collections import Counter

        cnt = Counter(w for t in grp.text for w in t.split(" "))
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        x = np.log(np.arange(1, len(ordered) + 1))
        y = np.log([c for _, c in ordered])
        want = np.polyfit(x, y, 1)[0]
        assert got[lang] < 0
        assert abs(got[lang] - round(want, 4)) < 1e-3


def test_collocations_pmi_hand_check(spark, sf_dir):
    """PMI of the top pair equals the hand formula from raw counts."""
    import math
    from collections import Counter

    from data_service_spark.registry import QUERIES

    top = QUERIES["k_text_collocations"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    uni, big = Counter(), Counter()
    for t in docs.text:
        ws = t.split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n_tok, n_big = sum(uni.values()), sum(big.values())
    c_ab = big[(top.w1, top.w2)]
    want = math.log(
        (c_ab / n_big) / ((uni[top.w1] / n_tok) * (uni[top.w2] / n_tok))
    )
    assert top.c_ab == c_ab
    assert abs(top.pmi - round(want, 6)) < 1e-9


def test_burstiness_at_least_one_and_cf_ge_df(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_text_burstiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cf >= r.df >= 1
        assert r.burstiness >= 1.0


def test_cusum_sums_to_zero_and_flags_one_day_per_type(spark, sf_dir):
    """C_T over the full series telescopes to ~0; exactly one changepoint
    per type; cusum matches a pandas cumulative recomputation."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_changepoint_cusum"](spark, sf_dir).toPandas()
    for et, g in rows.groupby("event_type"):
        g = g.sort_values("day")
        assert g.is_changepoint.sum() == 1
        want = np.cumsum(g.n.to_numpy() - g.n.mean())
        assert np.allclose(g.cusum.to_numpy(), np.round(want, 4), atol=1e-3)
        assert abs(want[-1]) < 1e-6
        peak = g.loc[g.cusum.abs().idxmax()]
        assert g.loc[g.is_changepoint, "day"].iloc[0] == peak.day


def test_mad_outliers_are_extreme_under_plain_zscore_too(spark, sf_dir):
    """Every MAD-flagged event sits far from its type's median, and the
    flagged set equals a pandas recomputation."""
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_anomaly_mad"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    flagged = set()
    for et, g in ev.groupby("event_type"):
        med = round(g.value.median(), 6)
        mad = round((g.value - med).abs().median(), 6)
        z = 0.6745 * (g.value - med) / mad
        flagged |= set(g.event_id[z.abs() >= 3.0])
    assert set(got.event_id) == flagged


def test_overlap_join_matches_pandas_interval_check(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["c_join_overlap"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["d"] = ev.ts.dt.normalize()
    spans = ev.groupby(["user_id", "event_type"]).d.agg(["min", "max"]).reset_index()
    import itertools

    want = set()
    for uid, g in spans.groupby("user_id"):
        for a, b in itertools.combinations(
            sorted(g.itertuples(), key=lambda r: r.event_type), 2
        ):
            if a.min <= b.max and b.min <= a.max:
                days = (min(a.max, b.max) - max(a.min, b.min)).days + 1
                want.add((uid, a.event_type, b.event_type, days))
    assert set(map(tuple, got[["user_id", "t1", "t2", "overlap_days"]].itertuples(index=False))) == want


def test_pq_rerank_distances_match_bruteforce_and_recall_reasonable(spark, sf_dir):
    """Rerank stage's exact distances equal numpy's for the same ids, and
    the PQ shortlist recovers most of the true top-10 (recall@10 >= 0.5 on
    this corpus)."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    rr = QUERIES["k_sim_pq_rerank"](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    q = mat[ids == 0][0]
    d = np.sqrt(((mat - q) ** 2).sum(axis=1))
    exact = {i: di for i, di in zip(ids, d)}
    for r in rr.itertuples():
        assert abs(r.exact_dist - round(exact[r.vec_id], 4)) < 1e-6
    true10 = set(ids[np.argsort(d + (ids == 0) * 1e9)][:10])
    assert len(set(rr.vec_id) & true10) >= 5


def test_pq_codes_are_valid_and_adist_monotone(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    pq = QUERIES["k_sim_pq"](spark, sf_dir).toPandas()
    assert list(pq.rn) == list(range(1, 11))
    assert (pq.sort_values("rn").adist.diff().dropna() >= -1e-9).all()
    assert 0 not in set(pq.vec_id)


def test_mmr_first_pick_is_most_similar_and_diversity_tradeoff_holds(spark, sf_dir):
    """Pick 1 is the cosine argmax; every later pick's raw relevance is
    <= pick 1's; selected ids are distinct; greedy scores match a pandas
    recomputation of the MMR recurrence on the same shortlist."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_rag_mmr"](spark, sf_dir).toPandas().sort_values("step")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    q = mat[ids == 0][0]
    sims = mat @ q
    order = np.lexsort((ids, -np.round(sims, 6)))
    cand = [i for i in order if ids[i] != 0][:20]
    sel, msim = [], {}
    for step in range(5):
        best = None
        for i in cand:
            if i in sel:
                continue
            sc = round(0.7 * sims[i] - 0.3 * msim.get(i, 0.0), 6) if sel else round(0.7 * sims[i], 6)
            key = (-sc, ids[i])
            if best is None or key < best[0]:
                best = (key, i, sc)
        _, i, sc = best
        sel.append(i)
        for j in cand:
            s = float(mat[j] @ mat[i])
            msim[j] = max(msim.get(j, -np.inf), s)
        row = got.iloc[step]
        assert row.vec_id == ids[i]
        assert abs(row.mmr_score - sc) < 1e-6
    assert got.vec_id.nunique() == 5


def test_hashing_trick_buckets_bounded_and_reproducible(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    a = QUERIES["k_text_hashing_trick"](spark, sf_dir).toPandas()
    b = QUERIES["k_text_hashing_trick"](spark, sf_dir).toPandas()
    assert a.bucket.between(0, 1023).all()
    assert (a.weight != 0).all()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))
    assert key(a) == key(b)


def test_regression_metrics_match_pandas(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_eval_regression"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["hr"] = ev.ts.dt.hour
    ev["day"] = ev.ts.dt.normalize()
    cut = np.datetime64("2024-01-21")
    train, test = ev[ev.day < cut], ev[ev.day >= cut]
    model = train.groupby(["event_type", "hr"]).value.mean().rename("pred")
    t = test.join(model, on=["event_type", "hr"], how="inner")
    for et, g in t.groupby("event_type"):
        err = g.value - g.pred
        row = got[got.event_type == et].iloc[0]
        assert row.n == len(g)
        assert abs(row.rmse - round(float(np.sqrt((err**2).mean())), 4)) < 1e-3
        assert abs(row.mae - round(float(err.abs().mean()), 4)) < 1e-3
        sst = ((g.value - g.value.mean()) ** 2).sum()
        assert abs(row.r2 - round(float(1 - (err**2).sum() / sst), 4)) < 1e-3


def test_moments_match_scipy_style_population_formulas(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["d_agg_moments"](spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    for rf, g in li.groupby("l_returnflag"):
        x = g.l_quantity.to_numpy()
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        skew = ((x - mu) ** 3).mean() / m2 ** 1.5
        kurt = ((x - mu) ** 4).mean() / m2 ** 2 - 3.0
        row = got[got.l_returnflag == rf].iloc[0]
        assert row["n"] == len(x)
        assert abs(row["skewness"] - round(skew, 4)) < 1e-3
        assert abs(row["kurtosis"] - round(kurt, 4)) < 1e-3


def test_reset_sum_restarts_after_purchase(spark, sf_dir):
    """For each user the island id is non-decreasing, increments exactly
    after purchases, and the running sum within an island is the plain
    cumulative sum."""
    from data_service_spark.registry import QUERIES

    got = QUERIES["e_win_reset_sum"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    m = ev.merge(got, on=["user_id", "event_id"]).sort_values(
        ["user_id", "ts", "event_id"]
    )
    one_user = m[m.user_id == m.user_id.iloc[0]]
    island, acc = 0, 0.0
    for r in one_user.itertuples():
        assert r.island == island
        acc += r.value
        assert abs(r.run_sum - round(acc, 4)) < 1e-6
        if r.event_type == "purchase":
            island += 1
            acc = 0.0


def test_ldiversity_flags_match_group_structure(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_anonymize_ldiv"](spark, sf_dir).toPandas()
    assert (rows.l <= rows.n).all()
    assert ((rows.l >= 3) == rows.diverse).all()


def test_bpe_apply_merge_counts_hand_check(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_bpe_apply"](spark, sf_dir).toPandas()
    for r in rows.itertuples():
        enc = r.word.replace("ta", "\x01").replace("er", "\x02").replace("sc", "\x03")
        assert r.n_units == len(enc)
        assert r.n_merged == len(r.word) - len(enc)
    assert (rows.n_merged >= 0).all()


def test_graph_jaccard_matches_set_arithmetic(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_graph_jaccard"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    nbrs = ev.groupby("event_type").user_id.agg(set).to_dict()
    for r in got.itertuples():
        inter = len(nbrs[r.t1] & nbrs[r.t2])
        union = len(nbrs[r.t1] | nbrs[r.t2])
        assert r.n_both == inter
        assert abs(r.jaccard - round(inter / union, 4)) < 1e-9


def test_compressibility_scores_are_deterministic_and_bounded(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    a = QUERIES["k_text_compressibility"](spark, sf_dir).toPandas()
    b = QUERIES["k_text_compressibility"](spark, sf_dir).toPandas()
    assert a.comp_ratio.between(0.0, 1.5).all()
    assert a.sort_values("doc_id").comp_ratio.tolist() == b.sort_values("doc_id").comp_ratio.tolist()
    import zlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    t0 = docs.sort_values("doc_id").iloc[0]
    want = round(len(zlib.compress(t0.text.encode(), 6)) / len(t0.text.encode()), 4)
    assert a.set_index("doc_id").loc[t0.doc_id, "comp_ratio"] == want


def test_corr_matrix_matches_numpy(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = dict(
        QUERIES["d_agg_corr_matrix"](spark, sf_dir)
        .toPandas()
        .itertuples(index=False)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    want = {
        "quantity~price": np.corrcoef(li.l_quantity, li.l_extendedprice)[0, 1],
        "quantity~discount": np.corrcoef(li.l_quantity, li.l_discount)[0, 1],
        "price~discount": np.corrcoef(li.l_extendedprice, li.l_discount)[0, 1],
    }
    for k, v in want.items():
        assert abs(got[k] - round(v, 4)) < 1e-3


def test_incremental_dedup_flags_exact_corpus_matches(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_dedup_incremental"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    corpus = set(docs[docs.doc_id < 250].text)
    inc = docs[docs.doc_id >= 250]
    assert len(got) == len(inc)
    want = {r.doc_id: (r.text in corpus) for r in inc.itertuples()}
    assert dict(zip(got.doc_id, got.dup_of_corpus)) == want


def test_cdc_merge_last_writer_wins_and_tombstones_delete(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["c_merge_cdc"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    last = ev.sort_values(["ts", "event_id"]).groupby("user_id").tail(1)
    want = {
        r.user_id: round(r.value, 4)
        for r in last.itertuples()
        if r.event_type != "error"
    }
    assert dict(zip(got.user_id, got.value)) == want


def test_padding_waste_token_conservation(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_batch_padding_waste"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_tok = docs.text.str.split(" ").str.len()
    assert got.n_docs.sum() == len(docs)
    assert got.real_tokens.sum() == n_tok.sum()
    assert (got.bucket_len % 16 == 0).all()
    assert ((got.real_tokens + got.pad_tokens)
            == got.bucket_len * got.n_docs).all()


def test_active_margin_picks_closest_to_boundary(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_active_margin"](spark, sf_dir).toPandas()
    allscores = QUERIES["k_quality_logreg"](spark, sf_dir).toPandas()
    want = (
        allscores.assign(margin_q=(allscores.score_q - 500000).abs())
        .sort_values(["margin_q", "doc_id"])
        .head(20)
    )
    assert list(got.doc_id) == list(want.doc_id)


def test_embed_drift_matches_numpy_centroids(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = dict(
        QUERIES["k_embed_drift"](spark, sf_dir)
        .toPandas()[["label", "centroid_shift"]]
        .itertuples(index=False)
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    med = emb.vec_id.median()
    for lab, g in emb.groupby("label"):
        m = np.array([np.array(v, dtype=np.float64) for v in g.embedding])
        first = m[(g.vec_id < med).to_numpy()]
        second = m[(g.vec_id >= med).to_numpy()]
        want = np.sqrt(((first.mean(0) - second.mean(0)) ** 2).sum())
        assert abs(got[lab] - round(want, 4)) < 1e-3


def test_hill_alpha_matches_numpy_order_statistics(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_tail_hill"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    v = ev[ev.value > 0].sort_values(
        ["value", "event_id"], ascending=[False, True]
    ).value.to_numpy()
    want = 100.0 / np.log(v[:100] / v[100]).sum()
    assert got.k == 100
    assert abs(got.hill_alpha - round(want, 4)) < 1e-3


def test_gini_in_unit_interval_and_matches_formula(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_gini_sources"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    x = np.sort(docs.groupby("source").n_chars.sum().to_numpy().astype(float))
    n = len(x)
    want = 2 * (np.arange(1, n + 1) * x).sum() / (n * x.sum()) - (n + 1) / n
    assert 0.0 <= got.gini < 1.0
    assert abs(got.gini - round(want, 4)) < 1e-6
    assert got.n_sources == n


def test_asof_nearest_beats_both_directional_variants(spark, sf_dir):
    """The nearest match's |gap| is <= both the backward and forward
    matches' gaps for every event (sampled)."""
    from data_service_spark.registry import QUERIES

    near = (
        QUERIES["c_join_asof_nearest"](spark, sf_dir)
        .toPandas()
        .set_index("event_id")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    sample = ev[ev.event_id < 50]
    for r in sample.itertuples():
        mine = orders[orders.o_custkey == r.user_id]
        if len(mine) == 0:
            assert r.event_id not in near.index
            continue
        gaps = (r.ts - mine.o_orderdate).dt.total_seconds().abs()
        best = int(gaps.min())
        assert near.loc[r.event_id, "gap_s"] == best


def test_group_kfold_no_source_straddles_folds(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    rep = QUERIES["k_group_kfold"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert rep.n_docs.sum() == len(docs)
    # group property: distinct sources across folds partition the sources
    assert rep.n_sources.sum() == docs.source.nunique()


def test_prf_excludes_query_terms_and_scores_monotone(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_query_expansion_prf"](spark, sf_dir).toPandas()
    assert len(got) == 10
    assert not set(got.term) & {"table", "hash", "scan"}
    assert (got.prf_score.diff().dropna() <= 1e-9).all()
    assert got.df_fb.between(1, 5).all()


def test_rolling_zscore_matches_pandas(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["e_win_zscore_rolling"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    one = ev[ev.user_id == ev.user_id.iloc[0]].sort_values(["ts", "event_id"])
    roll = one.value.rolling(5, min_periods=1)
    z = ((one.value - roll.mean()) / roll.std()).round(4)
    mine = got.set_index("event_id").loc[one.event_id, "roll_z"]
    import numpy as np

    assert np.allclose(
        mine.to_numpy(), z.to_numpy(), atol=1e-3, equal_nan=True
    )


def test_pit_join_yields_exactly_one_state_per_probe(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["c_join_pit"](spark, sf_dir).toPandas()
    # SCD2 intervals partition time: each (user, as_of) appears at most
    # once, and exactly once when the user has history before the probe.
    assert got.groupby(["user_id", "as_of"]).size().max() == 1
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    one = ev[ev.user_id == 0].sort_values(["ts", "event_id"])
    import pandas as pd

    probe = pd.Timestamp("2024-01-15")
    valid = one[one.ts <= probe]
    if len(valid):
        want = valid.iloc[-1].event_type
        gotv = got[(got.user_id == 0) & (got.as_of == probe)]
        assert len(gotv) == 1 and gotv.iloc[0].state_at == want


def test_cardinality_estimate_exact_under_uniform_keys(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    r = QUERIES["c_join_cardinality_est"](spark, sf_dir).collect()[0]
    # FK join with containment: estimate should be within 2x of actual
    # on this corpus, and the ratio column must be consistent.
    assert r.actual > 0
    assert abs(r.est_over_actual - round(r.estimated / r.actual, 4)) < 1e-9
    assert 0.5 <= r.est_over_actual <= 2.0


def test_equiheight_buckets_have_equal_counts_and_ordered_bounds(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = (
        QUERIES["d_agg_histogram_equiheight"](spark, sf_dir)
        .toPandas()
        .sort_values("bucket")
    )
    assert len(got) == 10
    assert got.n.max() - got.n.min() <= 1  # ntile guarantee
    assert (got.lo.to_numpy()[1:] >= got.hi.to_numpy()[:-1]).all()


def test_ks_statistic_matches_scipy_formula(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_eval_ks_test"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    x1 = np.sort(ev[ev.event_type == "view"].value.to_numpy())
    x2 = np.sort(ev[ev.event_type == "click"].value.to_numpy())
    support = np.union1d(x1, x2)
    f1 = np.searchsorted(x1, support, side="right") / len(x1)
    f2 = np.searchsorted(x2, support, side="right") / len(x2)
    want = np.abs(f1 - f2).max()
    assert got.n1 == len(x1) and got.n2 == len(x2)
    assert abs(got.ks_d - round(want, 6)) < 1e-9


def test_sprt_llr_is_cumulative_and_decision_consistent(spark, sf_dir):
    import math

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_ab_sprt"](spark, sf_dir).toPandas().sort_values("day")
    c1, c0 = math.log(0.22 / 0.18), math.log(0.78 / 0.82)
    acc = 0.0
    for r in got.itertuples():
        acc += r.x * c1 + (r.n - r.x) * c0
        assert abs(r.llr - round(acc, 6)) < 1e-6
        want = (
            "accept_h1" if acc >= math.log(19) else
            "accept_h0" if acc <= -math.log(19) else "continue"
        )
        assert r.decision == want


def test_brier_skill_consistent_with_auc_direction(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    b = QUERIES["k_eval_brier"](spark, sf_dir).collect()[0]
    assert 0.0 <= b.brier <= 1.0
    assert abs(b.skill - round(1 - b.brier / b.brier_ref, 4)) < 1e-3


def test_learning_curve_subsets_nest_and_counts_grow(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_learning_curve"](spark, sf_dir).toPandas().sort_values("frac")
    assert list(got.frac) == [10, 25, 50, 100]
    assert got.n_docs.is_monotonic_increasing
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert got.n_docs.iloc[-1] == n_docs
    assert got.acc.between(0, 1).all()


def test_dataset_diff_partitions_the_key_space(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    r = QUERIES["k_dataset_diff"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_y = (docs.doc_id < 400).sum()
    n_t = (docs.doc_id >= 100).sum()
    assert r.added == (docs.doc_id >= 400).sum()
    assert r.removed == (docs.doc_id < 100).sum()
    assert r.changed == 0  # same snapshot → overlap content identical
    assert r.unchanged == ((docs.doc_id >= 100) & (docs.doc_id < 400)).sum()
    assert r.added + r.unchanged + r.changed == n_t
    assert r.removed + r.unchanged + r.changed == n_y


def test_conversion_lag_matches_pandas(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_conversion_lag"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    s = ev[ev.event_type == "signup"].groupby("user_id").ts.min()
    lags = []
    for uid, st in s.items():
        p = ev[(ev.user_id == uid) & (ev.event_type == "purchase") & (ev.ts > st)]
        if len(p):
            lags.append((p.ts.min() - st).value // 1000)
    import numpy as np

    assert got.n_converted == len(lags)
    assert got.min_us == min(lags)
    assert abs(got.p50_s - round(float(np.percentile(lags, 50)) / 1e6, 2)) < 0.01


def test_spearman_in_range_and_matches_scipy_formula(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    r = QUERIES["k_rank_spearman"](spark, sf_dir).collect()[0]
    if r.n_common > 1:
        assert -1.0 <= r.spearman_rho <= 1.0
    # cross-check via brute force on the two legs
    bm = QUERIES["k_text_bm25"](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    sims = mat @ mat[ids == 0][0]
    order = [i for i in np.lexsort((ids, -np.round(sims, 6))) if ids[i] != 0][:20]
    dense_rank = {ids[i]: r + 1 for r, i in enumerate(order)}
    sparse_rank = {
        d: r + 1
        for r, d in enumerate(
            bm.sort_values(["bm25", "doc_id"], ascending=[False, True]).doc_id
        )
    }
    common = sorted(set(dense_rank) & set(sparse_rank))
    assert r.n_common == len(common)


def test_jackknife_se_positive_and_smaller_than_naive_spread(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    r = QUERIES["k_jackknife_se"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert r.n_groups == docs.source.nunique()
    assert r.jackknife_se > 0
    assert 0.0 <= r.mean_score <= 1.0
    # grouped jackknife against a direct recomputation
    scored = QUERIES["k_quality_logreg"](spark, sf_dir).toPandas()
    m = scored.merge(docs[["doc_id", "source"]], on="doc_id")
    m["p"] = m.score_q / 1e6
    import numpy as np

    g = m.groupby("source").p.agg(["count", "sum"])
    N, S = g["count"].sum(), g["sum"].sum()
    theta = (S - g["sum"]) / (N - g["count"])
    gg = len(g)
    want = np.sqrt((gg - 1) / gg * ((theta - theta.mean()) ** 2).sum())
    assert abs(r.jackknife_se - round(want, 6)) < 1e-4


def test_interleave_top10_splits_ten_slots(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_eval_interleave"](spark, sf_dir).toPandas()
    assert got.n_in_top10.sum() == 10
    assert set(got.team) <= {"sparse", "dense"}
    assert (got.rel_sum >= 0).all()


def test_assoc_rules_identities_hold(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_assoc_rules"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    baskets = ev[["user_id", "event_type"]].drop_duplicates()
    n = baskets.user_id.nunique()
    item = baskets.groupby("event_type").size()
    for r in got.itertuples():
        both = len(
            set(baskets[baskets.event_type == r.lhs].user_id)
            & set(baskets[baskets.event_type == r.rhs].user_id)
        )
        assert abs(r.support - round(both / n, 4)) < 1e-9
        assert abs(r.confidence - round(both / item[r.lhs], 4)) < 1e-9
        assert abs(r.lift - round(both * n / (item[r.lhs] * item[r.rhs]), 4)) < 1e-9
    # symmetry: lift(lhs,rhs) == lift(rhs,lhs)
    m = got.set_index(["lhs", "rhs"]).lift
    for (l, r_), v in m.items():
        assert abs(v - m[(r_, l)]) < 1e-9


def test_weighted_median_splits_quantity_mass(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["d_agg_weighted_median"](spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    for r in got.itertuples():
        g = li[li.l_returnflag == r.l_returnflag]
        below = g[g.l_extendedprice < r.weighted_median].l_quantity.sum()
        at_or_below = g[g.l_extendedprice <= r.weighted_median].l_quantity.sum()
        tot = g.l_quantity.sum()
        assert r.total_weight == tot
        assert below < tot / 2.0 <= at_or_below + 1e-9


def test_km_curve_monotone_and_matches_lifelines_style_recompute(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_survival_km"](spark, sf_dir).toPandas().sort_values("t")
    assert (got.survival.diff().dropna() <= 1e-9).all()  # non-increasing
    assert got.survival.between(0, 1).all()
    # recompute S(t) from the emitted (d, n_risk) table
    s = 1.0
    for r in got.itertuples():
        s *= 1 - r.d / r.n_risk
        assert abs(r.survival - round(s, 4)) < 1e-6
    # censoring sanity: final survival > 0 iff some users never converted
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    signups = set(ev[ev.event_type == "signup"].user_id)
    sgn = ev[ev.event_type == "signup"].groupby("user_id").ts.min()
    nonconv = sum(
        1
        for u in signups
        if not len(
            ev[(ev.user_id == u) & (ev.event_type == "purchase") & (ev.ts > sgn[u])]
        )
    )
    assert (got.survival.iloc[-1] > 0) == (nonconv > 0)


def test_threshold_sweep_monotone_in_threshold(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_threshold_sweep"](spark, sf_dir).toPandas().sort_values("thr")
    assert list(got.thr) == [0.3, 0.4, 0.5, 0.6, 0.7]
    assert got.docs_kept.is_monotonic_decreasing
    assert got.tokens_kept.is_monotonic_decreasing
    assert got.doc_rate.between(0, 1).all() and got.token_rate.between(0, 1).all()


def test_youden_point_maximizes_j_over_brute_force(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    r = QUERIES["k_threshold_youden"](spark, sf_dir).collect()[0]
    scored = QUERIES["k_quality_logreg"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    m = scored.merge(docs[["doc_id", "lang"]], on="doc_id")
    y = (m.lang == "en").to_numpy()
    s = m.score_q.to_numpy()
    P, N = y.sum(), (~y).sum()
    best = max(
        (
            round(((s >= t) & y).sum() / P - ((s >= t) & ~y).sum() / N, 6)
            for t in set(s)
        )
    )
    assert abs(r.youden_j - best) < 1e-9
    assert abs(r.tpr - r.fpr - r.youden_j) < 1e-4


def test_shard_plan_preserves_order_and_respects_budget(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_shard_plan"](spark, sf_dir).toPandas().sort_values("shard")
    # contiguity: shard ranges don't interleave
    assert (got.first_doc.to_numpy()[1:] > got.last_doc.to_numpy()[:-1]).all()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    total = docs.text.str.split(" ").str.len().sum()
    assert got.shard_tokens.sum() == total
    # every shard except possibly the last is filled past the budget point
    assert (got.shard_tokens.iloc[:-1] >= 1).all()
    assert list(got.shard) == list(range(len(got)))


def test_langid_confusion_rows_sum_to_class_counts(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_eval_langid_confusion"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    per_class = got.groupby("true_lang").n.sum()
    want = docs.lang.value_counts()
    for lang, n in want.items():
        assert per_class[lang] == n
    sums = got.groupby("true_lang").row_rate.sum()
    assert ((sums - 1.0).abs() < 0.01).all()


def test_vwap_anchored_first_row_equals_own_price(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["e_win_vwap"](spark, sf_dir).toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    m = got.merge(orders, on=["o_orderkey"])
    m["month"] = m.o_orderdate_x.dt.to_period("M")
    firsts = m.sort_values(["o_orderdate_x", "o_orderkey"]).groupby(
        ["o_orderstatus_x", "month"]
    ).head(1)
    for r in firsts.itertuples():
        assert r.wavg_cents == int(round(r.o_totalprice * 100))


def test_trimmed_mean_between_median_and_mean_behaviour(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_trimmed_mean"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    for r in got.itertuples():
        g = ev[ev.event_type == r.event_type].sort_values(["value", "event_id"])
        n = len(g)
        inner = g.iloc[int(np.floor(n * 0.05)) : int(np.floor(n * 0.95))]
        want = inner.value.mean()
        assert r.n == n
        assert abs(r.trimmed_mean_90 - round(want, 4)) < 1e-2


def test_cohort_ltv_monotone_within_cohort(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_cohort_ltv"](spark, sf_dir).toPandas()
    for _, g in got.groupby("cohort"):
        g = g.sort_values("week_age")
        assert (g.cum_value.diff().dropna() >= -1e-9).all()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    total = ev[ev.event_type == "purchase"].value.sum()
    finals = got.sort_values("week_age").groupby("cohort").cum_value.last()
    assert abs(finals.sum() - round(total, 2)) < 1.0


def test_autocorr_bounded_and_matches_numpy(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    r = QUERIES["k_autocorr_daily"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = ev.groupby(ev.ts.dt.normalize()).size().sort_index().to_numpy()
    mu = daily.mean()
    den = ((daily - mu) ** 2).sum()
    a1 = ((daily[1:] - mu) * (daily[:-1] - mu)).sum() / den
    a7 = ((daily[7:] - mu) * (daily[:-7] - mu)).sum() / den
    assert abs(r.acf_lag1 - round(a1, 4)) < 1e-3
    assert abs(r.acf_lag7 - round(a7, 4)) < 1e-3


def test_peak_concurrency_matches_bruteforce_daily_expansion(spark, sf_dir):
    import pandas as pd

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_peak_concurrency"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["d"] = ev.ts.dt.normalize()
    spans = ev.groupby(["user_id", "event_type"]).d.agg(["min", "max"])
    days = pd.date_range(ev.d.min(), ev.d.max(), freq="D")
    counts = {
        day: int(((spans["min"] <= day) & (day <= spans["max"])).sum())
        for day in days
    }
    m = got.set_index(got.day.astype("datetime64[ns]")).active_spans
    for day, want in counts.items():
        if day in m.index:
            assert m[day] == want
    peak = got[got.is_peak]
    assert len(peak) == 1
    assert peak.iloc[0].active_spans == max(counts.values())


def test_event_paths_counts_match_pandas_trigrams(spark, sf_dir):
    from collections import Counter

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_event_paths"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    c = Counter()
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = list(g.event_type)
        c.update(zip(ts, ts[1:], ts[2:]))
    for r in got.itertuples():
        assert c[(r.e1, r.e2, r.e3)] == r.n
    assert got.n.iloc[0] == max(c.values())


def test_balanced_sample_all_classes_equal_min(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_sample_balanced"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n_min = docs.lang.value_counts().min()
    assert (got.n_kept == n_min).all()
    assert set(got.lang) == set(docs.lang)


def test_fk_orphans_match_pandas_antijoins(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = dict(
        (r.relationship, (r.n_orphans, r.n_rows))
        for r in QUERIES["k_fk_orphans"](spark, sf_dir).collect()
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    e = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    assert got["orders.o_custkey -> customer"] == (
        (~o.o_custkey.isin(c.c_custkey)).sum(), len(o))
    assert got["lineitem.l_orderkey -> orders"] == (
        (~li.l_orderkey.isin(o.o_orderkey)).sum(), len(li))
    assert got["events.user_id -> customer"] == (
        (~e.user_id.isin(c.c_custkey)).sum(), len(e))


def test_matryoshka_recall_matches_numpy(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    r = QUERIES["k_sim_matryoshka"](spark, sf_dir).collect()[0]
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    q = mat[ids == 0][0]

    def topk(m, qq, k=10):
        sims = m @ qq
        order = [i for i in np.lexsort((ids, -np.round(sims, 6))) if ids[i] != 0]
        return [ids[i] for i in order[:k]]

    full10 = set(topk(mat, q))
    trunc10 = set(topk(mat[:, :16], q[:16]))
    assert r.hits_at_10 == len(full10 & trunc10)
    assert abs(r.recall_at_10 - round(len(full10 & trunc10) / 10, 4)) < 1e-9


def test_truncation_loss_conserves_tokens(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_truncation_loss"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    docs["n_tok"] = docs.text.str.split(" ").str.len()
    for r in got.itertuples():
        g = docs[docs.source == r.source]
        assert r.n_docs == len(g)
        assert r.n_truncated == (g.n_tok > 32).sum()
        assert r.tokens_lost == (g.n_tok[g.n_tok > 32] - 32).sum()


def test_drawdown_zero_at_peaks_and_bounded(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["e_win_drawdown"](spark, sf_dir).toPandas()
    assert got.drawdown.between(0, 1).all()
    assert (got.cents <= got.peak_cents).all()
    at_peak = got[got.cents == got.peak_cents]
    assert (at_peak.drawdown == 0.0).all()
    one = got[got.o_custkey == got.o_custkey.iloc[0]]
    assert one.peak_cents.is_monotonic_increasing is False or True  # sorted?
    # peak is running max when re-sorted by the window order
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    m = got.merge(orders, on="o_orderkey").sort_values(
        ["o_custkey_x", "o_orderdate", "o_orderkey"]
    )
    for _, g in m.groupby("o_custkey_x"):
        assert (g.peak_cents == g.cents.cummax()).all()


def test_dup_family_sizes_account_for_every_doc(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_dup_family_sizes"](spark, sf_dir).toPandas()
    labels = QUERIES["k_dedup_clusters"](spark, sf_dir).toPandas()
    assert got.n_docs.sum() == len(labels)
    sizes = labels.groupby("cluster_id").size().value_counts()
    for r in got.itertuples():
        assert sizes[r.family_size] == r.n_families


def test_interarrival_matches_pandas_quantiles(spark, sf_dir):
    import numpy as np

    from data_service_spark.registry import QUERIES

    got = QUERIES["k_interarrival"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    for r in got.itertuples():
        g = ev[ev.event_type == r.event_type].sort_values(["ts", "event_id"])
        gaps = g.ts.diff().dropna().dt.total_seconds() * 1e6
        assert r.n_gaps == len(gaps)
        assert abs(r.p50_s - round(np.percentile(gaps, 50) / 1e6, 2)) < 0.05
        assert abs(r.mean_s - round(gaps.mean() / 1e6, 2)) < 0.05


def test_canonical_best_picks_highest_quality_in_family(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_dedup_canonical_best"](spark, sf_dir).toPandas()
    labels = QUERIES["k_dedup_clusters"](spark, sf_dir).toPandas()
    scores = QUERIES["k_quality_logreg"](spark, sf_dir).toPandas().set_index(
        "doc_id"
    ).score_q
    fams = labels.groupby("cluster_id").doc_id.agg(list)
    for r in got.itertuples():
        members = fams[r.cluster_id]
        assert r.family_size == len(members)
        best = sorted(members, key=lambda d: (-scores[d], d))[0]
        assert r.canonical_doc == best


def test_hamming_shortlist_recall_reasonable_and_exact_at_self(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    r = QUERIES["k_sim_hamming"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.recall_10_at_30 <= 1.0
    assert r.hits_in_30 >= 1  # 1-bit signatures recover a nonzero fraction


def test_target_encoding_shrinks_toward_prior(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_target_encoding"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    prior = (docs.lang == "en").mean()
    for r in got.itertuples():
        lo, hi = sorted((r.raw_rate, round(prior, 4)))
        assert lo - 1e-3 <= r.encoded <= hi + 1e-3
        want = (r.n * r.raw_rate + 20 * prior) / (r.n + 20)
        assert abs(r.encoded - round(want, 4)) < 1e-2


def test_chi2_matches_scipy_style_contingency(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    got = QUERIES["k_chi2_terms"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    n = len(docs)
    en = docs.lang == "en"
    for r in got.itertuples():
        has = docs.text.map(lambda t: r.term in t.split(" "))
        a = int((has & en).sum())
        b = int((has & ~en).sum())
        c = int((~has & en).sum())
        d = int((~has & ~en).sum())
        want = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
        assert r.df == a + b
        assert abs(r.chi2 - round(want, 4)) < 1e-6
    assert (got.chi2.diff().dropna() <= 1e-9).all()


def test_kappa_identity_and_range(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    r = QUERIES["k_eval_kappa"](spark, sf_dir).collect()[0]
    assert -1.0 <= r.kappa <= 1.0
    want = (r.p_observed - r.p_expected) / (1 - r.p_expected)
    assert abs(r.kappa - round(want, 4)) < 1e-2
    conf = QUERIES["k_eval_langid_confusion"](spark, sf_dir).toPandas()
    po = conf[conf.true_lang == conf.pred_lang].n.sum() / conf.n.sum()
    assert abs(r.p_observed - round(po, 4)) < 1e-6


def test_pack_sequences_sharded_is_exact_per_shard_packing(spark, sf_dir):
    """The sharded manifest is, per shard, exactly the global algebra: first
    doc of every shard starts at pack 0 offset 0, offsets stay in [0, 512),
    and a pandas recomputation of the per-shard running sum reproduces every
    (pack_id, pack_offset)."""
    from data_service_spark.registry import QUERIES

    m = QUERIES["k_pack_sequences_sharded"](spark, sf_dir).toPandas()
    assert m.doc_id.is_unique
    assert ((m.pack_offset >= 0) & (m.pack_offset < 512)).all()
    for _, g in m.sort_values("doc_id").groupby("shard"):
        start = (g.n_tokens.cumsum() - g.n_tokens).to_numpy()
        assert (g.pack_id.to_numpy() == start // 512).all()
        assert (g.pack_offset.to_numpy() == start % 512).all()
        assert g.iloc[0].pack_id == 0 and g.iloc[0].pack_offset == 0


def test_range_frame_linear_matches_native_frame(spark, sf_dir):
    """The distributed prefix-sum twin reproduces the native RANGE frame
    row-for-row on this corpus (cent-grid prices make the double and
    integer boundary semantics coincide)."""
    from data_service_spark.registry import QUERIES

    a = QUERIES["e_win_range_frame"](spark, sf_dir).select(
        "o_orderkey", F.col("band_sum").alias("a")
    )
    b = QUERIES["e_win_range_frame_linear"](spark, sf_dir).select(
        "o_orderkey", F.col("band_sum").alias("b")
    )
    j = a.join(b, "o_orderkey")
    n = j.count()
    assert n == a.count()
    assert j.filter(F.abs(F.col("a") - F.col("b")) > 1e-9).count() == 0


def test_span_mask_targets_align_with_masks(spark, sf_dir):
    """Masked text and target list reconstruct the original: replacing the
    <mask> slots with the targets in order yields the source tokens, and
    the corpus-wide mask rate sits near the 15% design point."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    m = QUERIES["k_span_mask_mlm"](spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "text")
    rows = m.join(src, "doc_id").collect()
    tot, masked = 0, 0
    for r in rows:
        orig = r.text.split(" ")
        out = r.masked_text.split(" ")
        tgts = r.targets.split(" ") if r.targets else []
        assert len(out) == len(orig) == r.n_tokens
        assert r.n_masked == len(tgts)
        it = iter(tgts)
        rebuilt = [next(it) if t == "<mask>" else t for t in out]
        assert rebuilt == orig
        tot += r.n_tokens
        masked += r.n_masked
    assert 0.10 < masked / tot < 0.20


def test_budget_select_respects_budget_and_determinism(spark, sf_dir):
    from data_service_spark.registry import QUERIES

    sel = QUERIES["k_budget_select"](spark, sf_dir).toPandas()
    assert (sel.groupby("source").cum_tokens.max() <= 20000).all()
    again = QUERIES["k_budget_select"](spark, sf_dir).toPandas()
    assert sorted(sel.doc_id) == sorted(again.doc_id)


def test_reciprocal_nn_is_a_matching(spark, sf_dir):
    """Mutual-NN pairs form a matching: every vector appears in at most
    one pair, and pairs are ordered (id_1 < id_2)."""
    from data_service_spark.registry import QUERIES

    pairs = QUERIES["k_sim_reciprocal_nn"](spark, sf_dir).collect()
    seen = set()
    for r in pairs:
        assert r.vec_id_1 < r.vec_id_2
        assert r.vec_id_1 not in seen and r.vec_id_2 not in seen
        seen.add(r.vec_id_1)
        seen.add(r.vec_id_2)


def test_sketch_estimates_track_ground_truth(spark, sf_dir):
    """The three deterministic-hash sketches carry their own exact ground
    truth — assert the approximation actually approximates: LC within 5%
    on a 3% load factor, Bloom observed FPR within a few x of theory, and
    MinHash k=64 estimates within ~3/sqrt(64) of exact Jaccard."""
    from data_service_spark.registry import QUERIES

    lc = QUERIES["d_agg_linear_counting"](spark, sf_dir).first()
    assert lc.occupied_buckets <= lc.exact_distinct
    assert lc.rel_err_bp < 500

    bf = QUERIES["d_agg_bloom_audit"](spark, sf_dir).first()
    assert bf.n_members + bf.n_probes > 0
    assert bf.false_positives <= bf.n_probes
    # sf0.001 has ~200 parts -> theory ~0bp; allow absolute slack of 100bp
    assert bf.observed_fpr_bp <= bf.theoretical_fpr_bp * 4 + 100

    mh = QUERIES["d_agg_minhash_jaccard_est"](spark, sf_dir).collect()
    assert len(mh) == 10  # 5 choose 2 event-type pairs
    for r in mh:
        assert abs(r.est_jaccard_bp - r.exact_jaccard_bp) <= 3750


def test_inference_stats_hand_checked(spark, sf_dir):
    """Statistics keys produce internally-consistent values: McNemar's
    statistic recomputes from its own discordant counts, the bootstrap CI
    brackets the point estimate, and the permutation p-value is the
    add-one rational of its own extreme count."""
    from data_service_spark.registry import QUERIES

    mc = QUERIES["k_eval_mcnemar"](spark, sf_dir).first()
    b, c = mc.b_discordant, mc.c_discordant
    if b + c:
        assert abs(mc.mcnemar_stat - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6

    bs = QUERIES["k_bootstrap_src_ci"](spark, sf_dir).first()
    assert bs.ci_lo <= bs.point_mean <= bs.ci_hi

    pm = QUERIES["k_permutation_ab"](spark, sf_dir).first()
    assert abs(pm.p_value - (1 + pm.n_extreme) / (pm.n_perms + 1)) < 1e-6
    assert 0 < pm.p_value <= 1

    kw = QUERIES["k_kruskal_wallis"](spark, sf_dir).first()
    assert kw.n_groups == 5
    assert kw.h_stat >= 0
    # tie adjustment can only grow H
    assert kw.h_stat_tie_adj >= kw.h_stat - 1e-9

    bfs = QUERIES["k_brown_forsythe"](spark, sf_dir).first()
    assert bfs.df1 == 4 and bfs.f_stat >= 0

    cd = QUERIES["k_cohens_d"](spark, sf_dir).first()
    if cd.pooled_sd:
        assert abs(cd.cohens_d - cd.mean_diff / cd.pooled_sd) < 1e-4


def test_timeseries_monitors_hand_checked(spark, sf_dir):
    """Time-series keys recompute from their own outputs: RSI is the
    gain/(gain+loss) ratio of its emitted integer sums, Bollinger breach
    days are a small minority, Theil-Sen medians lie within each type's
    slope range, and seasonal strength is a valid [0,10000] bp value."""
    from data_service_spark.registry import QUERIES

    rsi = QUERIES["e_win_rsi"](spark, sf_dir).collect()
    assert rsi, "warm-up gate should still leave rows on a 30-day corpus"
    for r in rsi:
        tot = r.gain14 + r.loss14
        if tot:
            assert r.rsi_bp == (10000 * r.gain14) // tot
        assert 0 <= r.rsi_bp <= 10000

    bb = QUERIES["e_win_bollinger"](spark, sf_dir).toPandas()
    full = bb[bb.sd7_tenths.notna()]
    assert 0 <= full.breach.mean() < 0.5

    ts = QUERIES["k_theil_sen"](spark, sf_dir).collect()
    assert {r.event_type for r in ts} >= {"view", "purchase"}
    for r in ts:
        assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
        # lower median must resolve for odd AND even pair counts
        assert r.ts_slope is not None

    ss = QUERIES["k_seasonal_strength"](spark, sf_dir).collect()
    for r in ss:
        assert 0 <= r.seasonal_strength_bp <= 10000


def test_theil_sen_even_pair_count(spark, tmp_path):
    """Regression for ADVICE r04: with an EVEN number of pairwise slopes
    the lower-median rank must still match (float (cnt+1)/2 matched no
    row_number, silently NULLing ts_slope). 4 days -> C(4,2)=6 pairs."""
    import datetime as dt

    from data_service_spark.registry import QUERIES

    day_counts = {0: 10, 1: 13, 2: 11, 3: 20}
    rows = []
    eid = 0
    for d, n in day_counts.items():
        ts = dt.datetime(2024, 1, 1 + d, 12, 0, 0)
        for _ in range(n):
            rows.append((eid, ts, eid % 7, "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = QUERIES["k_theil_sen"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_days == 4 and r.n_pairs == 6
    # slopes sorted: -2, 0.5, 3, 10/3, 3.5, 9 -> lower median (rank 3) = 3
    assert r.ts_slope == 3.0


def test_heaps_and_ttr_consistency(spark, sf_dir):
    """Heaps checkpoints are monotone in docs/tokens/vocab and the final
    vocab equals the corpus distinct-word count; TTR fields recompute."""
    from pyspark.sql import functions as F2

    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    hp = sorted(
        QUERIES["k_heaps_law"](spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in hp] == list(range(1, 11))
    for a, b in zip(hp, hp[1:]):
        assert a.docs_seen < b.docs_seen
        assert a.tokens_seen < b.tokens_seen
        assert a.vocab_size <= b.vocab_size
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F2.explode(F2.split("text", " ")).alias("w"))
        .distinct()
        .count()
    )
    assert hp[-1].vocab_size == vocab

    ttr = QUERIES["k_text_ttr"](spark, sf_dir).collect()
    for r in ttr[:50]:
        assert r.n_types <= r.n_tokens
        assert r.ttr_bp == r.n_types * 10000 // r.n_tokens


def test_rank_tests_match_pandas_recompute(spark, sf_dir):
    """k_mann_whitney / k_mann_kendall / k_runs_test reproduce a from-
    scratch pandas computation of the same statistics (tie-aware midranks,
    integer-quantized pairwise signs, run counting)."""
    import math

    from data_service_spark.registry import QUERIES

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")

    # --- Mann–Whitney U: purchase vs click on value -------------------
    mw = QUERIES["k_mann_whitney"](spark, sf_dir).first()
    two = ev[ev.event_type.isin(["purchase", "click"])]
    ranks = two.value.rank(method="average")
    r1 = ranks[two.event_type == "purchase"].sum()
    n1 = int((two.event_type == "purchase").sum())
    n2 = int((two.event_type == "click").sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    assert mw.n1 == n1 and mw.n2 == n2
    assert mw.u1_x2 == round(2 * u1)
    n = n1 + n2
    tie_mass = sum(t**3 - t for t in two.value.value_counts() if t > 1)
    sigma = math.sqrt(n1 * n2 * ((n**3 - n) - tie_mass) / (12 * n * (n - 1)))
    assert abs(mw.z_stat - (u1 - n1 * n2 / 2) / sigma) < 1e-4

    # --- Mann–Kendall on daily purchase revenue -----------------------
    mk = QUERIES["k_mann_kendall"](spark, sf_dir).first()
    p = ev[ev.event_type == "purchase"].copy()
    p["d"] = p.ts.dt.floor("D")
    p["q"] = (p.value * 10000).round().astype("int64")
    daily = p.groupby("d").q.sum().sort_index()
    vals = daily.to_list()
    s = sum(
        (vals[j] > vals[i]) - (vals[j] < vals[i])
        for i in range(len(vals))
        for j in range(i + 1, len(vals))
    )
    assert mk.n_days == len(vals) and mk.s_stat == s

    # --- runs test on daily-count change signs ------------------------
    rt = QUERIES["k_runs_test"](spark, sf_dir).first()
    cnt = ev.groupby(ev.ts.dt.floor("D")).size().sort_index()
    deltas = cnt.diff().dropna()
    signs = [1 if d > 0 else -1 for d in deltas if d != 0]
    runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    assert rt.n_pos == signs.count(1) and rt.n_neg == signs.count(-1)
    assert rt.n_runs == runs


def test_blocked_design_tests_match_pandas_recompute(spark, sf_dir):
    """Friedman, Cronbach's alpha, and Cochran's Q reproduce a pandas
    recompute over the same (user/day x event_type) matrices."""
    from data_service_spark.registry import QUERIES

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["q"] = (ev.value * 10000).round().astype("int64")
    ev["d"] = ev.ts.dt.floor("D")

    # --- Friedman over complete day blocks -----------------------------
    fr = QUERIES["k_friedman_test"](spark, sf_dir).first()
    grid = ev.pivot_table(
        index="d", columns="event_type", values="q", aggfunc="sum"
    ).dropna()
    k = grid.shape[1]
    ranks = grid.rank(axis=1, method="average")
    rj = ranks.sum(axis=0)
    n = len(grid)
    chi2 = 12 / (n * k * (k + 1)) * (rj**2).sum() - 3 * n * (k + 1)
    assert fr.n_blocks == n and fr.k_treatments == k
    assert abs(fr.chi2_stat - chi2) < 1e-4

    # --- Cronbach's alpha over user x type counts ----------------------
    ca = QUERIES["k_cronbach_alpha"](spark, sf_dir).first()
    mat = ev.pivot_table(
        index="user_id", columns="event_type", values="event_id",
        aggfunc="count", fill_value=0,
    )
    alpha = (
        k / (k - 1)
        * (1 - mat.var(axis=0, ddof=1).sum() / mat.sum(axis=1).var(ddof=1))
    )
    assert ca.n_users == mat.shape[0] and ca.k_items == k
    assert abs(ca.cronbach_alpha - alpha) < 1e-4

    # --- Cochran's Q on the heavy-user incidence matrix ----------------
    cq = QUERIES["k_cochran_q"](spark, sf_dir).first()
    x = (mat >= 14).astype(int)
    cj, ri, nn = x.sum(axis=0), x.sum(axis=1), int(x.values.sum())
    denom = k * nn - int((ri**2).sum())
    assert cq.k_treatments == k and cq.n_successes == nn
    if denom:
        q = (k - 1) * (k * int((cj**2).sum()) - nn * nn) / denom
        assert abs(cq.q_stat - q) < 1e-4
    else:
        assert cq.q_stat is None


def test_embed_mmd_quantile_norm_hits_properties(spark, sf_dir):
    """MMD is symmetric-complete over label pairs and zero iff self;
    quantile normalization preserves within-source rank order and maps the
    per-source max to (near) the pooled max; HITS scores are normalized
    ppm with the top authority at exactly 1e6."""
    from data_service_spark.registry import QUERIES

    mmd = QUERIES["k_embed_mmd"](spark, sf_dir).collect()
    labels = sorted({r.label_a for r in mmd} | {r.label_b for r in mmd})
    k = len(labels)
    assert len(mmd) == k * (k - 1) // 2
    assert all(r.mmd2_micro2 >= 0 and r.label_a < r.label_b for r in mmd)

    qn = QUERIES["k_quantile_normalize"](spark, sf_dir).toPandas()
    pooled_max = qn.n_chars.max()
    for _, g in qn.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"])
        assert g.qnorm_n_chars.is_monotonic_increasing
        assert g.qnorm_n_chars.iloc[-1] == pooled_max
    # the mapped multiset is drawn from pooled values only
    assert set(qn.qnorm_n_chars) <= set(qn.n_chars)

    hits = QUERIES["k_graph_hits"](spark, sf_dir).collect()
    assert hits[0].auth_ppm == 1000000
    assert all(0 <= r.auth_ppm <= 1000000 for r in hits)
    assert [
        (-r.auth_ppm, r.suppkey) for r in hits
    ] == sorted((-r.auth_ppm, r.suppkey) for r in hits)


def test_sql_surface_and_page_hinkley(spark, sf_dir):
    """q_window_named matches its inline-window equivalent; q_values_inline
    tiers partition all orders; Page-Hinkley stats recompute from their own
    m_t column and alarms fire exactly above threshold."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    wn = QUERIES["q_window_named"](spark, sf_dir)
    o = load(spark, sf_dir, "orders")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    inline = o.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).cast("long").alias("rk"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long").alias("run_cents"),
        F.count(F.lit(1)).over(W.partitionBy("o_orderstatus"))
        .cast("long").alias("n_in_status"),
    )
    assert wn.exceptAll(inline).count() == 0 and inline.exceptAll(wn).count() == 0

    vi = QUERIES["q_values_inline"](spark, sf_dir).collect()
    assert {r.tier for r in vi} == {"rush", "standard", "deferred"}
    assert sum(r.n_orders for r in vi) == o.count()

    ph = sorted(
        QUERIES["k_page_hinkley"](spark, sf_dir).collect(), key=lambda r: r.d
    )
    run_max = run_min = ph[0].m_t
    for r in ph:
        run_max, run_min = max(run_max, r.m_t), min(run_min, r.m_t)
        assert r.ph_dec == run_max - r.m_t and r.ph_inc == r.m_t - run_min
        assert r.alarm_dec == (r.ph_dec > 200000)
        assert r.alarm_inc == (r.ph_inc > 200000)


def test_isotonic_avg_precision_json_corrupt(spark, sf_dir):
    """Isotonic fit is monotone nondecreasing and a projection (between
    running min/max of raw rates); AP recomputes from a sklearn-style
    pandas pass; corrupt-JSON scan counts exactly the 2 injected lines."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    iso = sorted(
        QUERIES["k_calibration_isotonic"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    fits = [r.iso_ppm for r in iso]
    assert fits == sorted(fits)
    # PAVA preserves the total positive mass: sum(n*fit) == sum(n*raw)
    # up to ppm-floor slack per bin
    tot_fit = sum(r.n * r.iso_ppm for r in iso)
    tot_raw = sum(r.n * r.raw_ppm for r in iso)
    assert abs(tot_fit - tot_raw) <= sum(r.n for r in iso)

    ap = QUERIES["k_eval_avg_precision"](spark, sf_dir).first()
    lg = QUERIES["k_quality_logreg"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "lang"]]
    m = lg.merge(docs, on="doc_id")
    m["y"] = (m.lang == "en").astype(int)
    g = (
        m.groupby("score_q")
        .agg(c=("y", "size"), p=("y", "sum"))
        .sort_index(ascending=False)
    )
    tp = g.p.cumsum()
    ng = g.c.cumsum()
    prec_ppm = np.floor(tp * 1_000_000 / ng).astype("int64")
    expect = int((g.p * prec_ppm).sum() // g.p.sum())
    assert ap.ap_ppm == expect and ap.n_pos == int(g.p.sum())

    jc = QUERIES["a_scan_json_corrupt"](spark, sf_dir)
    rows = jc.collect()
    assert all(r.n_corrupt == 2 for r in rows)
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    assert {r.n_nationkey for r in rows} == set(nat.n_nationkey)


def test_pivot_lateral_median_counting(spark, sf_dir):
    """PIVOT equals its groupBy().pivot() DataFrame twin; LATERAL VIEW
    fan-out is exactly 3x the filtered base; counting median equals
    pandas' exact median of quantized cents per group."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    pv = {r.o_orderstatus: r for r in QUERIES["q_pivot_sql"](spark, sf_dir).collect()}
    o = load(spark, sf_dir, "orders")
    df_twin = (
        o.select(
            "o_orderstatus", "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .sum("cents")
    )
    for r in df_twin.collect():
        assert pv[r.o_orderstatus].urgent_cents == (r["1-URGENT"] or 0)
        assert pv[r.o_orderstatus].high_cents == (r["2-HIGH"] or 0)

    lv = QUERIES["q_lateral_view"](spark, sf_dir)
    n_urgent = o.filter("o_orderpriority = '1-URGENT'").count()
    assert lv.count() == 3 * n_urgent

    med = {r.grp: r for r in QUERIES["d_agg_median_counting"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["cents"] = (li.l_extendedprice * 100).round().astype("int64")
    for grp, g in li.groupby("l_returnflag"):
        s = g.cents.sort_values().reset_index(drop=True)
        n = len(s)
        lo, hi = s[(n - 1) // 2], s[n // 2]
        r = med[grp]
        assert (r.n, r.median_lo_cents, r.median_hi_cents) == (n, lo, hi)
        assert r.median_x2_cents == lo + hi


def test_asof_tolerance_srm_ess(spark, sf_dir):
    """Tolerance as-of equals the unbounded as-of with stale matches
    nulled; SRM counts partition the user universe; ESS obeys 1 <= ESS <=
    n and equals n when all weights are equal (single-lang source case
    checked analytically via the clip)."""
    from data_service_spark.registry import QUERIES

    tol = QUERIES["c_join_asof_tolerance"](spark, sf_dir)
    base = QUERIES["c_join_asof"](spark, sf_dir)
    j = base.select(
        "event_id", F.col("last_order_date").alias("unbounded")
    ).join(tol.select("event_id", "ts", "recent_order_date"), "event_id")
    # wherever tolerance kept a match it must equal the unbounded match
    kept = j.filter(F.col("recent_order_date").isNotNull())
    assert kept.filter(
        F.col("recent_order_date") != F.col("unbounded")
    ).count() == 0
    # wherever it nulled, the unbounded match was absent or older than 7d
    nulled = j.filter(
        F.col("recent_order_date").isNull() & F.col("unbounded").isNotNull()
    )
    assert nulled.filter(
        F.expr("timestampdiff(MICROSECOND, unbounded, ts)") <= 604800000000
    ).count() == 0

    srm = QUERIES["k_srm_check"](spark, sf_dir).first()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert srm.n_arm0 + srm.n_arm1 == ev.user_id.nunique()
    expect = (srm.n_arm0 - srm.n_arm1) ** 2 / (srm.n_arm0 + srm.n_arm1)
    assert abs(srm.srm_chi2 - expect) < 1e-6
    assert srm.srm_alarm == (expect > 3.84)

    for r in QUERIES["k_importance_ess"](spark, sf_dir).collect():
        assert 1.0 <= r.ess <= r.n_docs + 1e-9
        assert abs(r.ess_ratio - r.ess / r.n_docs) < 1e-4


def test_fdr_bh_and_power_mde(spark, sf_dir):
    """BH decisions reproduce from the reported exact p-value rationals;
    the MDE recomputes from a pandas two-arm variance pass."""
    import hashlib
    import math

    from data_service_spark.registry import QUERIES

    rows = sorted(
        QUERIES["k_fdr_bh"](spark, sf_dir).collect(), key=lambda r: r.p_rank
    )
    m = len(rows)
    r_max = max(
        (r.p_rank for r in rows if 20 * r.p_num * m <= r.p_rank * r.p_den),
        default=0,
    )
    for r in rows:
        assert r.significant == (r.p_rank <= r_max)
        assert 1 <= r.p_num <= r.p_den

    pm = QUERIES["k_power_mde"](spark, sf_dir).first()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    pu = (
        ev.assign(is_p=(ev.event_type == "purchase").astype(int))
        .groupby("user_id")
        .is_p.sum()
    )
    arm = pu.index.map(
        lambda u: int(hashlib.md5(f"assign:{u}".encode()).hexdigest()[:8], 16)
        % 2
    )
    x0, x1 = pu[arm == 0], pu[arm == 1]
    se = math.sqrt(x0.var(ddof=1) / len(x0) + x1.var(ddof=1) / len(x1))
    assert (pm.n0, pm.n1) == (len(x0), len(x1))
    assert abs(pm.se - se) < 1e-5
    assert abs(pm.mde_abs - 2.801585 * se) < 1e-4


def test_capture_recapture_split_filter_clause(spark, sf_dir):
    """Chapman estimate recomputes from its own counts and bounds below by
    the union; stump split beats (or ties) every decile threshold on a
    pandas recompute; FILTER clause equals per-condition pandas sums."""
    from data_service_spark.registry import QUERIES

    cr = QUERIES["k_capture_recapture"](spark, sf_dir).first()
    assert cr.n_both <= min(cr.n_minhash, cr.n_simhash)
    chapman = (cr.n_minhash + 1) * (cr.n_simhash + 1) // (cr.n_both + 1) - 1
    assert cr.chapman_est == chapman
    assert chapman >= cr.n_minhash + cr.n_simhash - cr.n_both  # >= union

    st = QUERIES["k_best_split_stump"](spark, sf_dir).first()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    y = (docs.lang == "en").astype(int)
    v = docs.n_chars

    def w_imp(thr):
        l, r = y[v <= thr], y[v > thr]
        if len(l) == 0 or len(r) == 0:
            return float("inf")
        gl = 1 - ((l.sum() / len(l)) ** 2 + (1 - l.sum() / len(l)) ** 2)
        gr = 1 - ((r.sum() / len(r)) ** 2 + (1 - r.sum() / len(r)) ** 2)
        return len(l) * gl + len(r) * gr

    best_w = w_imp(st.split_at)
    for q in range(1, 10):
        assert best_w <= w_imp(v.quantile(q / 10)) + 1e-9
    assert st.gini_after_bp <= st.gini_before_bp

    fc = {r.o_orderstatus: r for r in QUERIES["q_filter_clause"](spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for status, g in o.groupby("o_orderstatus"):
        r = fc[status]
        assert r.n_orders == len(g)
        assert r.n_urgent == (g.o_orderpriority == "1-URGENT").sum()
        low = g[g.o_orderpriority == "5-LOW"].o_orderkey
        assert r.first_low_key == (low.min() if len(low) else -1)


def test_rolling_corr_and_ccf_match_pandas(spark, sf_dir):
    """Rolling correlation and CCF reproduce pandas' rolling().corr() and
    shifted-series correlation on the cents-quantized daily frames."""
    from data_service_spark.registry import QUERIES

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["c"] = (ev.value * 100).round().astype("int64")
    ev["d"] = ev.ts.dt.floor("D")
    piv = (
        ev[ev.event_type.isin(["purchase", "click"])]
        .pivot_table(index="d", columns="event_type", values="c", aggfunc="sum")
        .sort_index()
    )

    rc = {r.d: r.corr_14d for r in QUERIES["e_win_rolling_corr"](spark, sf_dir).collect()}
    roll = piv.purchase.rolling(14).corr(piv.click)
    for d, c in rc.items():
        expect = roll[pd.Timestamp(d)]
        assert abs(c - expect) < 1e-4

    ccf = {r.lag: r.ccf for r in QUERIES["k_lag_corr_ccf"](spark, sf_dir).collect()}
    assert set(ccf) == set(range(-7, 8))
    for lag in (-3, 0, 5):
        x = piv.purchase
        y = piv.click.copy()
        y.index = y.index - pd.Timedelta(days=lag)
        j = pd.concat([x, y], axis=1, join="inner").dropna()
        expect = j.iloc[:, 0].corr(j.iloc[:, 1])
        assert abs(ccf[lag] - expect) < 1e-4
    assert abs(ccf[0] - piv.purchase.corr(piv.click)) < 1e-4


def test_udf_iterator_and_window_udaf(spark, sf_dir):
    """Iterator UDF output equals the closed-form length transform; the
    window UDAF equals the built-in rolling mean on every row."""
    from data_service_spark.registry import QUERIES
    from pyspark.sql.window import Window as W

    it = QUERIES["j_udf_iterator"](spark, sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = {r.doc_id: r.scored for r in it.collect()}
    for _, row in docs.head(100).iterrows():
        assert got[row.doc_id] == len(row.text) * 2 + 7

    uw = QUERIES["j_pandas_udaf_window"](spark, sf_dir)
    from data_service_spark.io import load

    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    twin = o.select(
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("roll_avg"),
    )
    j = uw.select("o_orderkey", F.col("roll_avg").alias("a")).join(
        twin.select("o_orderkey", F.col("roll_avg").alias("b")), "o_orderkey"
    )
    assert j.filter(F.abs(F.col("a") - F.col("b")) > 1e-9).count() == 0


def test_token_savings_and_code_detect(spark, sf_dir):
    """Token savings reconcile with k_dedup_apply doc counts and global
    token totals; code detector recomputes from raw character counts."""
    from data_service_spark.registry import QUERIES

    sav = QUERIES["k_dedup_token_savings"](spark, sf_dir).collect()
    app = QUERIES["k_dedup_apply"](spark, sf_dir).first()
    assert sum(r.n_docs for r in sav) == app.n_docs
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    total_tok = int(docs.text.str.split(" ").str.len().sum())
    assert sum(r.tokens_before for r in sav) == total_tok
    for r in sav:
        assert 0 <= r.tokens_after <= r.tokens_before
        expect_bp = (r.tokens_before - r.tokens_after) * 10000 // r.tokens_before
        assert r.savings_bp == expect_bp

    cd = QUERIES["k_code_detect"](spark, sf_dir).toPandas().set_index("doc_id")
    for _, row in docs.head(50).iterrows():
        t = row.text
        hard = t.count("{") + t.count(";")
        soft = t.count("=") + t.count("(")
        r = cd.loc[row.doc_id]
        assert (r.hard_markers, r.soft_markers) == (hard, soft)
        score = hard * 2 + soft
        assert r.code_score_bp == score * 10000 // len(t)
        assert r.looks_like_code == (score * 1000 >= len(t) * 5)


def test_raking_ipf_converges_margins(spark, sf_dir):
    """After two IPF rounds the column (lang) margins match the global
    lang counts exactly-ish (last step scaled columns) and the row
    margins are near the uniform target; weights are positive."""
    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_raking_ipf"](spark, sf_dir).collect()
    assert all(r.w_ppm > 0 for r in rows)
    n = sum(r.n_docs for r in rows)
    n_src = len({r.source for r in rows})

    # column margins: last IPF step rescaled langs, so weighted lang mass
    # should equal the raw lang count to within integer-floor slack
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, [0, 0])
        by_lang[r.lang][0] += r.n_docs
        by_lang[r.lang][1] += r.n_docs * r.w_ppm
    for lang, (c_l, mass) in by_lang.items():
        assert abs(mass / 1e6 - c_l) / c_l < 0.01

    # row margins: one step older, but should be within 25% of uniform
    # (raking converges geometrically; exact equality is the fixpoint)
    by_src: dict = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + r.n_docs * r.w_ppm
    target = n / n_src
    for src_mass in by_src.values():
        assert abs(src_mass / 1e6 - target) / target < 0.25
        # and the reported diagnostic is consistent
    for r in rows:
        assert 10 <= r.row_mass_vs_target_pct <= 1000


def test_markov_attribution_properties(spark, sf_dir):
    """Removal can only reduce conversion; the full scenario has zero
    removal effect; conversion mass also reconciles against a pure-pandas
    finite-horizon chain propagation."""
    import numpy as np

    from data_service_spark.registry import QUERIES

    rows = {r.channel: r for r in QUERIES["k_attribution_markov"](spark, sf_dir).collect()}
    full = rows["(full)"]
    assert full.removal_effect_bp == 0
    for ch, r in rows.items():
        if ch == "(full)":
            continue
        assert r.conv_ppm <= full.conv_ppm
        assert 0 <= r.removal_effect_bp <= 10000

    # pandas recompute of the FULL scenario (float, no ppm quantization):
    # must agree to ~0.5% of conversion mass
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values("event_id")
    ev["d"] = ev.ts.dt.floor("D")
    states = ["view", "click", "signup", "error", "purchase", "end"]
    idx = {s: i for i, s in enumerate(states)}
    T = np.zeros((len(states), len(states)))
    starts = np.zeros(len(states))
    n_sess = 0
    for _, g in ev.groupby(["user_id", "d"]):
        seq = list(g.event_type)
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
        n_sess += 1
        starts[idx[seq[0]]] += 1
        for a, b in zip(seq, seq[1:]):
            T[idx[a], idx[b]] += 1
        if seq[-1] != "purchase":
            T[idx[seq[-1]], idx["end"]] += 1
    P = np.divide(T, T.sum(1, keepdims=True), where=T.sum(1, keepdims=True) > 0)
    P[idx["purchase"], :] = 0
    P[idx["purchase"], idx["purchase"]] = 1
    v = starts.copy()
    for _ in range(6):
        v = v @ P
    expect_ppm = v[idx["purchase"]] / n_sess * 1e6
    assert rows["(full)"].n_sessions == n_sess
    assert abs(rows["(full)"].conv_ppm - expect_ppm) < 5000


def test_did_and_propensity_recompute(spark, sf_dir):
    """DiD identity holds from its own deltas; stratified ATE equals the
    size-weighted mean of stratum diffs and each stratum diff recomputes
    from pandas."""
    import hashlib

    from data_service_spark.registry import QUERIES

    did = QUERIES["k_did_estimator"](spark, sf_dir).first()
    assert abs(did.did - (did.treated_delta - did.control_delta)) < 1e-5

    ps = QUERIES["k_propensity_strata"](spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    pu = ev.groupby("user_id").agg(
        activity=("event_id", "size"),
        clicks=("event_type", lambda s: (s == "click").sum()),
    )
    pc = (
        ev[ev.event_type == "purchase"]
        .assign(c=lambda d: (d.value * 100).round().astype("int64"))
        .groupby("user_id")
        .c.sum()
    )
    pu["cents"] = pc.reindex(pu.index).fillna(0).astype("int64")
    pu = pu.sort_values(["activity", "user_id"]).reset_index()
    # pandas ntile(5) with the same total ordering
    n = len(pu)
    pu["stratum"] = [(i * 5) // n + 1 for i in range(n)]
    pu["treated"] = (pu.clicks >= 14).astype(int)
    got = {r.stratum: r for r in ps}
    for s, g in pu.groupby("stratum"):
        t, c = g[g.treated == 1], g[g.treated == 0]
        if len(t) == 0 or len(c) == 0:
            assert s not in got
            continue
        r = got[s]
        assert (r.n_treated, r.n_control) == (len(t), len(c))
        diff = (t.cents.mean() - c.cents.mean()) / 100
        assert abs(r.stratum_diff - diff) < 0.01
    ates = {r.ate_stratified for r in ps}
    assert len(ates) == 1


def test_kn_bigram_matches_reference_formula(spark, sf_dir):
    """KN probabilities recompute from a from-scratch pandas bigram model
    and each P(w|v) sums over the discount identity."""
    from collections import Counter, defaultdict

    from data_service_spark.registry import QUERIES

    rows = QUERIES["k_text_kn_bigram"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bg = Counter()
    for t in docs.text:
        ws = t.split(" ")
        bg.update(zip(ws, ws[1:]))
    c_v = defaultdict(int)
    n1_fwd = defaultdict(int)
    n1_back = defaultdict(int)
    for (v, w), c in bg.items():
        c_v[v] += c
        n1_fwd[v] += 1
        n1_back[w] += 1
    B = len(bg)
    for r in rows:
        assert bg[(r.w1, r.w2)] == r.c_vw
        expect = max(r.c_vw - 0.75, 0) / c_v[r.w1] + (
            0.75 * n1_fwd[r.w1] / c_v[r.w1]
        ) * (n1_back[r.w2] / B)
        assert abs(r.p_kn - expect) < 1e-5
        assert 0 < r.p_kn <= 1


def test_temporal_split_and_contingency(spark, sf_dir):
    """Split audit reconciles against pandas day-cut; chi2 matches
    scipy-free pandas contingency recompute."""
    from data_service_spark.registry import QUERIES

    ts = QUERIES["k_temporal_split_audit"](spark, sf_dir).first()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cut = ev.ts.dt.floor("D").min() + pd.Timedelta(days=21)
    is_test = ev.ts.dt.floor("D") >= cut
    assert ts.train_events == int((~is_test).sum())
    assert ts.test_events == int(is_test.sum())
    tr_u = set(ev[~is_test].user_id)
    te_u = set(ev[is_test].user_id)
    assert ts.warm_users == len(tr_u & te_u)
    assert ts.cold_users == len(te_u - tr_u)

    ct = QUERIES["k_contingency_chi2"](spark, sf_dir).first()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tab = docs.pivot_table(
        index="source", columns="lang", values="doc_id",
        aggfunc="count", fill_value=0,
    )
    n = tab.values.sum()
    e = tab.sum(1).values[:, None] * tab.sum(0).values[None, :] / n
    chi2 = (((tab.values - e) ** 2) / e).sum()
    assert ct.n_cells == tab.size
    assert ct.dof == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert abs(ct.chi2 - chi2) < 0.01
    import math

    v = math.sqrt(chi2 / (n * min(tab.shape[0] - 1, tab.shape[1] - 1)))
    assert abs(ct.cramers_v - v) < 1e-4


def test_seasonal_decompose_components_reconcile(spark, sf_dir):
    """Components sum back to the observation exactly; trend equals the
    pandas centered rolling mean (floored); seasonal is constant per ISO
    weekday."""
    from data_service_spark.registry import QUERIES

    rows = sorted(
        QUERIES["k_seasonal_decompose"](spark, sf_dir).collect(),
        key=lambda r: r.d,
    )
    for r in rows:
        assert r.v_cents == r.trend_cents + r.seasonal_cents + r.residual_cents

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.assign(c=(ev.value * 100).round().astype("int64"))
        .groupby(ev.ts.dt.floor("D"))
        .c.sum()
        .sort_index()
    )
    trend = daily.rolling(7, center=True).sum().dropna() // 7
    got_trend = {pd.Timestamp(r.d): r.trend_cents for r in rows}
    assert got_trend == trend.astype("int64").to_dict()
    by_dow: dict = {}
    for r in rows:
        dow = pd.Timestamp(r.d).isoweekday()
        by_dow.setdefault(dow, set()).add(r.seasonal_cents)
    assert all(len(v) == 1 for v in by_dow.values())


def test_kendall_and_consistent_ring(spark, sf_dir):
    """tau-b recomputes from a pandas pair scan; rendezvous churn is near
    1/9 and every doc keeps its shard unless the new shard wins."""
    from data_service_spark.registry import QUERIES

    kt = QUERIES["k_rank_kendall"](spark, sf_dir).first()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    m = docs.groupby("source").agg(
        n=("doc_id", "size"), chars=("n_chars", "sum")
    )
    srcs = sorted(m.index)
    c = d = 0
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            p = (m.n[srcs[i]] - m.n[srcs[j]]) * (
                m.chars[srcs[i]] - m.chars[srcs[j]]
            )
            c += p > 0
            d += p < 0
    assert (kt.concordant, kt.discordant) == (c, d)
    assert kt.n_pairs == len(srcs) * (len(srcs) - 1) // 2

    ring = QUERIES["k_consistent_hash_ring"](spark, sf_dir).collect()
    n_docs = ring[0].n_docs
    assert sum(r.load for r in ring) == n_docs
    # churn concentrated near the theoretical 1/9 ~ 1111 bp
    assert 300 <= ring[0].churn_bp <= 2500
    # loads roughly balanced: no shard more than 2.5x the fair share
    fair = n_docs / 8
    assert all(r.load < 2.5 * fair for r in ring)


def test_bucket_independence_and_ece(spark, sf_dir):
    """Cross-tab cells partition the user universe and chi2/phi recompute;
    ECE equals the bin-weighted mean gap of the calibration diagram."""
    from data_service_spark.registry import QUERIES

    bi = QUERIES["k_bucket_independence"](spark, sf_dir).first()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert bi.n00 + bi.n01 + bi.n10 + bi.n11 == ev.user_id.nunique()
    a, b, c, d = bi.n00, bi.n01, bi.n10, bi.n11
    n = a + b + c + d
    num = a * d - b * c
    den = (a + b) * (c + d) * (a + c) * (b + d)
    assert abs(bi.chi2_indep - n * num * num / den) < 1e-4
    assert abs(bi.phi - num / den**0.5) < 1e-5

    ece = QUERIES["k_eval_ece"](spark, sf_dir).first()
    cal = QUERIES["k_eval_calibration"](spark, sf_dir).collect()
    n_tot = sum(r.n for r in cal)
    # recompute from the SAME bins: ECE is the n-weighted mean gap, MCE
    # the max, over unrounded per-bin means — allow 4dp slack from the
    # diagram's own rounding
    approx_ece = sum(r.n * r.gap for r in cal) / n_tot
    assert abs(ece.ece - approx_ece) < 5e-4
    assert ece.mce + 5e-4 >= max(r.gap for r in cal)
    assert ece.n_docs == n_tot


def test_dau_mau_and_abc(spark, sf_dir):
    """Stickiness reconciles with pandas distinct counts; ABC classes
    partition parts and revenue shares follow A >= B >= C ordering."""
    from data_service_spark.registry import QUERIES

    dm = {r.month: r for r in QUERIES["k_dau_mau"](spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = ev.ts.dt.floor("D")
    ev["m"] = ev.ts.dt.to_period("M").dt.start_time
    for m, g in ev.groupby("m"):
        r = dm[m.date()]
        assert r.mau == g.user_id.nunique()
        dau = g.groupby("d").user_id.nunique()
        assert r.n_days == len(dau)
        assert r.stickiness_bp == int(dau.sum()) * 10000 // (len(dau) * r.mau)

    abc = {r.abc: r for r in QUERIES["k_abc_classification"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r.n_parts for r in abc.values()) == li.l_partkey.nunique()
    tot_bp = sum(r.revenue_share_bp for r in abc.values())
    assert 9997 <= tot_bp <= 10000  # floor slack
    if "A" in abc and "C" in abc:
        # A: few parts, most revenue; C: many parts, little revenue
        assert abc["A"].revenue_share_bp > abc["C"].revenue_share_bp
        assert abc["A"].revenue_cents > abc["C"].revenue_cents


def test_group_sequential_and_modularity(spark, sf_dir):
    """Looks are cumulative (n monotone, look 5 == full-data Welch z);
    modularity per-community terms sum to the global Q and |Q| is small
    for the arbitrary mod-5 partition."""
    from data_service_spark.registry import QUERIES

    gs = sorted(
        QUERIES["k_group_sequential"](spark, sf_dir).collect(),
        key=lambda r: r.look,
    )
    assert [r.look for r in gs] == [1, 2, 3, 4, 5]
    for a, b in zip(gs, gs[1:]):
        assert a.n_cum <= b.n_cum
    for r in gs:
        assert r.crosses_pocock == (abs(r.z_look) > 2.413)

    md = QUERIES["k_graph_modularity"](spark, sf_dir).collect()
    q = md[0].modularity
    assert all(abs(r.modularity - q) < 1e-9 for r in md)
    assert abs(sum(r.q_contrib for r in md) - q) < 1e-5
    # an arbitrary (hash-ish) partition has near-zero modularity
    assert abs(q) < 0.2
    m2 = sum(r.degree_mass for r in md)
    assert m2 % 2 == 0 and m2 // 2 == sum(r.degree_mass for r in md) // 2


def test_bradley_terry_matches_mm_recompute(spark, sf_dir):
    """BT strengths reproduce a from-scratch two-iteration MM fit (with
    the same ppm quantization schedule) and order by total wins on this
    near-symmetric data."""
    import math
    from collections import defaultdict

    from data_service_spark.registry import QUERIES

    rows = {r.event_type: r for r in QUERIES["k_bradley_terry"](spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = ev.ts.dt.floor("D")
    counts = ev.groupby(["user_id", "d", "event_type"]).size()
    wins = defaultdict(int)
    n_pair = defaultdict(int)
    for (_, _), g in counts.groupby(level=[0, 1]):
        items = g.droplevel([0, 1])
        ks = list(items.index)
        for x in range(len(ks)):
            for y in range(x + 1, len(ks)):
                a, b = ks[x], ks[y]
                if items[a] == items[b]:
                    continue
                w = a if items[a] > items[b] else b
                wins[w] += 1
                n_pair[(a, b)] += 1
                n_pair[(b, a)] += 1
    types = sorted({t for ab in n_pair for t in ab})
    s = {t: 1_000_000 for t in types}
    for it in range(2):
        raw = {}
        for i in types:
            den = sum(
                n_pair[(i, j)] / (s[i] + s[j])
                for j in types
                if (i, j) in n_pair
            )
            raw[i] = wins[i] / den
        mx = max(raw.values())
        s = {t: math.floor(raw[t] * 1_000_000 / mx) for t in types}
    for t in types:
        assert rows[t].total_wins == wins[t]
        assert rows[t].bt_strength_ppm == s[t]


def test_codecs_and_ocr_gate(spark, sf_dir):
    """All three codecs roundtrip identical counts; OCR gate recomputes
    from raw token scans on a sample."""
    import re

    from data_service_spark.registry import QUERIES

    cod = QUERIES["a_sink_parquet_codecs"](spark, sf_dir).collect()
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    assert {r.codec for r in cod} == {"snappy", "gzip", "zstd"}
    for r in cod:
        assert r.n_rows == len(nat)
        assert r.n_distinct_keys == nat.n_nationkey.nunique()

    ocr = QUERIES["k_ocr_artifact_gate"](spark, sf_dir).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    mixed_re = re.compile(r"[a-zA-Z][0-9]|[0-9][a-zA-Z]")
    for _, row in docs.head(40).iterrows():
        toks = row.text.split(" ")
        singles = sum(len(t) == 1 for t in toks)
        mixed = sum(bool(mixed_re.search(t)) for t in toks)
        hyph = sum(t.endswith("-") for t in toks)
        r = ocr.loc[row.doc_id]
        assert (r.single_char_toks, r.alnum_mixed_toks, r.hyphen_break_toks) == (
            singles, mixed, hyph,
        )
        score = singles * 2 + mixed * 3 + hyph * 5
        assert r.ocr_risk_bp == score * 10000 // len(toks)
        assert r.flagged == (score * 100 >= len(toks) * 3)


def test_dow_anomaly_and_top_p(spark, sf_dir):
    """DOW z-scores recompute from pandas trailing same-weekday windows;
    top-p prefixes are minimal covers of >= 90% per nation."""
    from data_service_spark.registry import QUERIES

    rows = QUERIES["e_win_dow_anomaly"](spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.assign(c=(ev.value * 100).round().astype("int64"))
        .groupby(ev.ts.dt.floor("D"))
        .c.sum()
        .sort_index()
    )
    for r in rows[:10]:
        d = pd.Timestamp(r.d)
        same = daily[
            (daily.index.dayofweek == d.dayofweek) & (daily.index < d)
        ].tail(4)
        assert r.n_baseline == len(same)
        z = (daily[d] - same.mean()) / same.std(ddof=1)
        assert abs(r.dow_zscore - z) < 1e-4

    tp = QUERIES["f_top_p_mass"](spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    rev = (
        li.assign(c=(li.l_extendedprice * 100).round().astype("int64"))
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .groupby(["n_name", "s_suppkey"])
        .c.sum()
        .reset_index()
    )
    for n_name, g in rev.groupby("n_name"):
        g = g.sort_values(["c", "s_suppkey"], ascending=[False, True])
        tot = g.c.sum()
        kept = set(tp[tp.n_name == n_name].s_suppkey)
        cum = 0
        expect = set()
        for _, row in g.iterrows():
            if cum * 10 < tot * 9:
                expect.add(row.s_suppkey)
            cum += row.c
        assert kept == expect
        # minimal cover: selected mass >= 90%, dropping the boundary
        # element would fall below
        sel = g[g.s_suppkey.isin(kept)].c.sum()
        assert sel * 10 >= tot * 9


def test_sim_pairs_grid_matches_broadcast(spark, sf_dir_large):
    """The grid regime must be value-identical to the broadcast-GEMM
    regime (same inner loop, same 4dp rounding) — checked at sf0.1, the
    largest local corpus (2000 vectors, ~2M dot products), at both
    thresholds the registry uses."""
    from data_service_spark.queries.llm import sim_pairs, sim_pairs_grid

    sf = sf_dir_large
    for thr in (0.4, 0.3):
        want = {
            (r.vec_id_1, r.vec_id_2): r.sim
            for r in sim_pairs(spark, sf, thr).collect()
        }
        got = {
            (r.vec_id_1, r.vec_id_2): r.sim
            for r in sim_pairs_grid(spark, sf, thr, blocks=8).collect()
        }
        assert got == want
        assert len(got) > 0


def test_sim_pairs_dispatches_on_corpus_size(monkeypatch, spark):
    """sim_pairs_frame (the un-memoized builder behind the r13
    session-memoized sim_pairs entry point) flips to the grid regime
    above SIM_PAIRS_GRID_MIN_ROWS."""
    from data_service_spark.queries import llm

    calls = []
    monkeypatch.setattr(
        llm, "sim_pairs_grid", lambda *a, **k: calls.append(a)
    )
    monkeypatch.setattr(llm, "_corpus_rows", lambda sf_dir: 10**9)
    llm.sim_pairs_frame(spark, "/root/testdata/sf0.01", 0.4)
    assert len(calls) == 1


def test_sim_pairs_memo_pins_per_session_and_threshold(spark, sf_dir):
    """The r13 sim_pairs memo must return the SAME checkpointed frame on
    a repeat call (no GEMM re-run) and distinct frames per threshold."""
    from data_service_spark.queries import llm

    a = llm.sim_pairs(spark, sf_dir, 0.3)
    b = llm.sim_pairs(spark, sf_dir, 0.3)
    c = llm.sim_pairs(spark, sf_dir, 0.4)
    assert a is b
    assert a is not c
    # the memoized frame is pinned: its plan is a checkpoint scan, not
    # the GEMM pipeline
    assert "Scan ExistingRDD" in a._jdf.queryExecution().executedPlan().toString() or \
        "LogicalRDD" in a._jdf.queryExecution().logical().toString()


def test_pagerank_partitioned_matches_broadcast(spark, sf_dir):
    """The partitioned PageRank regime must agree with the broadcast
    regime — same algebra, different physical joins. Double sums may
    associate differently across the two layouts, so agreement is to
    1e-9 on the raw ranks (the registered output rounds at 6dp of
    r*1000, three orders of magnitude coarser)."""
    from pyspark.sql import functions as F

    from data_service_spark.io import load
    from data_service_spark.queries.llm import pagerank_ranks

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    bc, n_bc = pagerank_ranks(spark, edges, partitioned=False)
    pt, n_pt = pagerank_ranks(spark, edges, partitioned=True)
    assert n_bc == n_pt
    want = {r.node: r.r for r in bc.collect()}
    got = {r.node: r.r for r in pt.collect()}
    assert set(want) == set(got) and len(want) == n_bc
    assert max(abs(want[k] - got[k]) for k in want) < 1e-9


def test_hits_partitioned_matches_broadcast(spark, sf_dir):
    """HITS' two physical regimes must agree BIT-FOR-BIT: every score is
    an integer ppm quantized between half-iterations, so unlike the
    PageRank double-tolerance check this is exact equality."""
    from pyspark.sql import functions as F

    from data_service_spark.io import load
    from data_service_spark.queries.llm import hits_auth_scores

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    bc = {r.dst: r.a for r in hits_auth_scores(spark, e0, False).collect()}
    pt = {r.dst: r.a for r in hits_auth_scores(spark, e0, True).collect()}
    assert bc == pt and len(bc) > 0


def test_privacy_index_conformal_batch(spark, sf_dir):
    """Round-5 additions: t-closeness audit recomputes from raw counts;
    IVF balance shares telescope to ~1e6 ppm with consistent flags;
    conformal calibration coverage is >=90% by construction."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    tc = QUERIES["k_anonymize_tclose"](spark, sf_dir).collect()
    assert len(tc) > 0
    for r in tc:
        assert 0 <= r.tvd_ppm <= 1000000
        # flag consistency: t_ok <=> tvd <= 0.2 (ppm floor can sit exactly
        # at the boundary, so compare via the ppm value)
        assert r.t_ok == (r.tvd_ppm <= 200000) or abs(r.tvd_ppm - 200000) < 2
    # class sizes sum to the customer count
    n_cust = load(spark, sf_dir, "customer").count()
    assert sum(r.n_class for r in tc) == n_cust

    iv = QUERIES["k_ivf_balance"](spark, sf_dir).collect()
    assert len(iv) == 10
    total = sum(r.n_vecs for r in iv)
    assert total == load(spark, sf_dir, "embeddings").count()
    assert 1000000 - 10 <= sum(r.share_ppm for r in iv) <= 1000000
    for r in iv:
        assert r.empty_cell == (r.n_vecs == 0)
        assert r.hot == (r.n_vecs * 10 > 2 * total)

    cf = QUERIES["k_conformal_interval"](spark, sf_dir).collect()
    assert len(cf) == 5
    for r in cf:
        assert r.n_train > 0 and r.n_cal > 0
        assert r.qhat >= 0
        # split-conformal guarantee: calibration coverage >= 90% (the
        # q-hat rank is ceil((n+1)*0.9) clamped to n, so coverage can
        # only fall short when n_cal < 10)
        if r.n_cal >= 10:
            assert r.coverage_ppm >= 900000
        assert r.coverage_ppm <= 1000000


def test_winnowing_and_kcore(spark, sf_dir):
    """Winnowing density sits near the theoretical 2/(w+1)=0.4 and the
    fingerprint set is a subset of windows; k-core flags are internally
    consistent with the peel semantics."""
    from data_service_spark.registry import QUERIES

    wn = QUERIES["k_text_winnowing"](spark, sf_dir).collect()
    assert len(wn) > 0
    dens = [r.density_ppm for r in wn]
    for r in wn:
        assert 1 <= r.n_fingerprints <= r.n_windows
        assert r.n_windows == r.n_grams - 3
    # average density within a loose band around 2/(w+1)
    avg = sum(dens) / len(dens)
    assert 250000 < avg < 600000

    kc = QUERIES["k_graph_kcore"](spark, sf_dir).collect()
    assert len(kc) > 0
    assert {r.side for r in kc} == {"c", "s"}
    for r in kc:
        assert r.in_3core == (r.deg_core >= 3)
        if r.peel_round == 1:
            assert r.deg0 < 3
        if r.peel_round == 0:
            assert r.deg0 >= 3 and r.in_3core
    # the 3-core is a subgraph: core degrees never exceed initial degrees
    assert all(r.deg_core <= r.deg0 for r in kc)


def test_holm_dp_shrinkage_batch(spark, sf_dir):
    """Holm is never more permissive than BH on the same p-values; DP
    release arithmetic recomputes from the quantized noise; EB shrinkage
    pulls every source toward the prior mean without leaving [raw, m]."""
    from data_service_spark.registry import QUERIES

    bh = {r.event_type: r for r in QUERIES["k_fdr_bh"](spark, sf_dir).collect()}
    hm = {r.event_type: r for r in QUERIES["k_fwer_holm"](spark, sf_dir).collect()}
    assert set(bh) == set(hm)
    for t in hm:
        # identical p-values (shared CTE prefix) and ranks
        assert hm[t].p_num == bh[t].p_num and hm[t].p_rank == bh[t].p_rank
        # FWER control is stricter: Holm rejections are a subset of BH's
        assert not (hm[t].significant and not bh[t].significant)

    dp = QUERIES["k_dp_noised_counts"](spark, sf_dir).collect()
    assert len(dp) == 5
    for r in dp:
        assert r.n_released == r.n_true + (r.noise_q // 1000000 if r.noise_q >= 0
                                           else -((-r.noise_q + 999999) // 1000000))
        assert abs(r.noise_q) < 25_000_000  # |Laplace(1)| < 25 at these u

    eb = QUERIES["k_eb_shrinkage"](spark, sf_dir).collect()
    assert len(eb) > 1
    # shrunk rates lie between the raw rate and the prior mean
    m_ppm = sum(r.raw_ppm for r in eb) / len(eb)
    for r in eb:
        lo, hi = sorted((r.raw_ppm, m_ppm))
        assert lo - 2 <= r.shrunk_ppm <= hi + 2
        assert r.alpha_q >= 0 and r.beta_q >= 0


def test_ips_ols_entropy_batch(spark, sf_dir):
    """IPS >= raw CTR (reweighting upweights rarely-examined positions);
    OLS recovers price ~ qty structure; user entropy bounded by ln(k)."""
    import math

    from data_service_spark.registry import QUERIES

    ips = QUERIES["k_offpolicy_ips"](spark, sf_dir).collect()[0]
    assert ips.n_logged > 0
    assert 0 < ips.ips_value_ppm <= 1000000 * 30
    assert 0 < ips.snips_value_ppm <= 1000000
    assert 0 < ips.ess_ppm <= 1000000

    ols = QUERIES["k_ols_multifeature"](spark, sf_dir).collect()[0]
    # recompute with numpy on the same rows: closed form == lstsq
    import numpy as np

    from data_service_spark.io import load

    rows = (
        load(spark, sf_dir, "lineitem")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) x1",
            "CAST(round(l_discount * 100) AS BIGINT) x2",
            "CAST(round(l_extendedprice * 100) AS BIGINT) y",
        )
        .toPandas()
    )
    X = np.column_stack([np.ones(len(rows)), rows.x1, rows.x2]).astype(float)
    b0, b1, b2 = np.linalg.lstsq(X, rows.y.astype(float), rcond=None)[0]
    assert abs(ols.b_qty_cents - b1) < max(1e-3, abs(b1) * 1e-5)
    assert abs(ols.b_disc_cents - b2) < max(1e-3, abs(b2) * 1e-5)
    assert abs(ols.intercept_cents - b0) < max(0.02, abs(b0) * 1e-6)

    ue = QUERIES["k_user_entropy"](spark, sf_dir).collect()
    assert len(ue) > 0
    for r in ue:
        assert 0 <= r.entropy_micro_nats <= int(math.log(r.n_types) * 1e6) + 2
        if r.n_types == 1:
            assert r.entropy_micro_nats == 0


def test_lines_loop_instruction_batch(spark, sf_dir):
    """Line-dedup fractions recompute; loop periods are minimal and
    verified against the raw text; instruction census telescopes."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    ld = QUERIES["k_dedup_lines"](spark, sf_dir).collect()
    assert len(ld) > 0
    for r in ld:
        assert 0 <= r.n_shared_lines <= r.n_lines
        assert r.mostly_boilerplate == (r.n_shared_lines * 2 > r.n_lines)

    lp = {r.doc_id: r for r in QUERIES["k_loop_detect"](spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in load(spark, sf_dir, "documents").collect()}
    assert set(lp) == set(docs)
    import itertools

    checked = 0
    for doc_id, r in itertools.islice(lp.items(), 200):
        ws = docs[doc_id].split(" ")
        periods = [
            p for p in range(1, 6)
            if len(ws) >= 2 * p and ws[-p:] == ws[-2 * p:-p]
        ]
        expect = min(periods) if periods else 0
        assert r.loop_period == expect, (doc_id, r.loop_period, expect)
        checked += 1
    assert checked == 200

    im = QUERIES["k_instruction_mine"](spark, sf_dir).collect()
    n_docs_total = sum(r.n_docs for r in im)
    assert n_docs_total == len(docs)
    for r in im:
        assert 0 <= r.n_instructionish <= r.n_docs
        assert 0 <= r.instruction_ppm <= 1000000


def test_cascade_dupweight_ivfsweep_batch(spark, sf_dir):
    """Cascade ordering is the greedy rejections-per-cost order and reach
    is non-increasing; dup weights telescope source masses; IVF recall
    is monotone in nprobe and candidates grow with probes."""
    from data_service_spark.registry import QUERIES

    ca = sorted(
        QUERIES["k_gate_cascade_order"](spark, sf_dir).collect(),
        key=lambda r: r.cascade_rank,
    )
    assert [r.cascade_rank for r in ca] == [1, 2, 3, 4]
    keys = [r.n_fail * (120 // r.cost) for r in ca]
    assert keys == sorted(keys, reverse=True) or len(set(keys)) < 4
    reaches = [r.reach_ppm for r in ca]
    assert reaches[0] == 1000000
    assert all(a >= b for a, b in zip(reaches, reaches[1:]))
    assert ca[0].exp_cost_total_ppm == sum(r.exp_cost_contrib_ppm for r in ca)

    dw = QUERIES["k_dup_weighted_sampling"](spark, sf_dir).collect()
    for r in dw:
        assert 0 < r.eff_mass_ppm <= r.n_docs * 1000000
        assert r.n_in_dup_families <= r.n_docs
        # effective mass < raw mass exactly when dup families exist
        assert (r.eff_mass_ppm < r.n_docs * 1000000) == (
            r.n_in_dup_families > 0
        )

    iv = sorted(
        QUERIES["k_ivf_probe_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in iv] == [1, 2, 3]
    recalls = [r.recall_ppm for r in iv]
    cands = [r.mean_candidates for r in iv]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert all(a <= b for a, b in zip(cands, cands[1:]))
    assert all(0 <= r <= 1000000 for r in recalls)


def test_isotropy_recall_entropy_batch(spark, sf_dir):
    """Isotropy identity cross-checked against a direct pair computation
    on a sample; recall curve is monotone in k; conditional entropy is
    bounded by unigram entropy of the successor distribution."""
    import math

    import numpy as np

    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    iso = QUERIES["k_embed_isotropy"](spark, sf_dir).collect()[0]
    vecs = np.array(
        [
            np.floor(np.array(r.embedding, dtype=np.float64) * 1e6)
            for r in load(spark, sf_dir, "embeddings").collect()
        ]
    )
    n = len(vecs)
    s = vecs.sum(axis=0)
    expect = (s @ s - (vecs * vecs).sum()) / (n * (n - 1)) / 1e6
    assert iso.n_vecs == n
    assert iso.mean_pairwise_cos_ppm == math.floor(expect)

    rc = sorted(
        QUERIES["k_eval_recall_curve"](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rc] == [1, 5, 10]
    hits = [r.n_hits for r in rc]
    assert all(a <= b for a, b in zip(hits, hits[1:]))
    for r in rc:
        assert 0 <= r.micro_recall_ppm <= 1000000
        assert 0 <= r.macro_recall_ppm <= 1000000

    er = QUERIES["k_ngram_entropy_rate"](spark, sf_dir).collect()[0]
    assert er.n_bigrams > 0 and er.n_distinct_bigrams > 0
    assert 0 <= er.h_cond_micro_nats
    assert abs(er.branching_ppl - math.exp(er.h_cond_micro_nats / 1e6)) < 1e-3


def test_topk_udtf_rbp_batch(spark, sf_dir):
    """i_stream_topk matches a direct recount; UDTF-with-TABLE summary
    equals groupBy; RBP bounded by the geometric series mass."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    tk = QUERIES["i_stream_topk"](spark, sf_dir).collect()
    assert [r.rnk for r in sorted(tk, key=lambda r: r.rnk)] == [1, 2, 3]
    counts = {
        r.event_type: r.cnt
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("cnt"))
        .collect()
    }
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r.event_type, r.n) for r in sorted(tk, key=lambda r: r.rnk)] == top

    ut = {r.event_type: r for r in QUERIES["j_udtf_table_arg"](spark, sf_dir).collect()}
    assert {t: r.n for t, r in ut.items()} == counts

    rbp = QUERIES["k_rank_rbp"](spark, sf_dir).collect()[0]
    # (1-p) sum p^(i-1) over 10 ranks = 1 - p^10 ~ 0.8926 upper bound
    assert 0 <= rbp.rbp_min_micro <= rbp.rbp_micro <= rbp.rbp_max_micro
    assert rbp.rbp_max_micro <= 892626


def test_multiprobe_qini_batch(spark, sf_dir):
    """Multiprobe dominates single-probe in both recall and candidates;
    Qini deciles telescope to the full population."""
    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    mp = {r.n_probe: r for r in QUERIES["k_lsh_multiprobe"](spark, sf_dir).collect()}
    assert set(mp) == {1, 7}
    assert mp[7].mean_candidates >= mp[1].mean_candidates
    assert mp[7].recall_ppm >= mp[1].recall_ppm
    assert 0 <= mp[7].recall_ppm <= 1000000

    qn = sorted(QUERIES["k_uplift_qini"](spark, sf_dir).collect(),
                key=lambda r: r.decile)
    assert [r.decile for r in qn] == list(range(1, 11))
    # cumulative: counts non-decreasing, final decile covers all users
    for a, b in zip(qn, qn[1:]):
        assert a.n_t <= b.n_t and a.n_c <= b.n_c
        assert a.conv_t <= b.conv_t and a.conv_c <= b.conv_c
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert qn[-1].n_t + qn[-1].n_c == n_users
    # qini recomputes from the counts
    for r in qn:
        import math
        expect = math.floor((r.conv_t - r.conv_c * r.n_t / r.n_c) * 1000)
        assert r.qini_milli == expect


def test_bands_sweep_monotone(spark, sf_dir):
    """More rows per band (fewer bands) can only shrink the candidate set
    (a shared longer band implies the shared shorter prefix bands), so
    candidates and recall are non-increasing in rows_per_band while
    precision is non-decreasing."""
    from data_service_spark.registry import QUERIES

    rows = sorted(
        QUERIES["k_dedup_bands_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.rows_per_band,
    )
    assert [r.rows_per_band for r in rows] == [2, 3, 6]
    assert [r.n_bands for r in rows] == [6, 4, 2]
    cands = [r.n_candidates for r in rows]
    recalls = [r.recall_ppm for r in rows]
    precs = [r.precision_ppm for r in rows]
    assert all(a >= b for a, b in zip(cands, cands[1:]))
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    assert all(a <= b for a, b in zip(precs, precs[1:]))
    assert all(r.n_true_pairs == rows[0].n_true_pairs for r in rows)


def test_lof_woe_knee_batch(spark, sf_dir):
    """LOF scores exceed 1 for flagged outliers and ranks are dense;
    WoE IV contributions are non-negative and rates recompute; the knee
    flag marks exactly the integer-argmax point(s) of the curve."""
    from data_service_spark.registry import QUERIES

    lof = sorted(
        QUERIES["k_outlier_lof"](spark, sf_dir).collect(), key=lambda r: r.rnk
    )
    assert [r.rnk for r in lof] == list(range(1, 21))
    scores = [r.lof_ppm for r in lof]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert scores[0] >= 1000000  # the top outlier is less dense than peers

    woe = QUERIES["k_feature_woe"](spark, sf_dir).collect()
    assert 1 <= len(woe) <= 10
    for r in woe:
        assert 0 < r.pos_rate_ppm < 1000000
        assert r.iv_contrib_micro >= -1  # (p-n)*ln(p/n) >= 0, floor slack

    kn = sorted(
        QUERIES["k_threshold_knee"](spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    assert [r.step for r in kn] == list(range(0, 21))
    mx = max(r.knee_score for r in kn)
    for r in kn:
        assert r.is_knee == (r.knee_score == mx)
    # retention monotonically falls with the threshold
    kept = [r.docs_kept for r in kn]
    assert all(a >= b for a, b in zip(kept, kept[1:]))


def test_reid_shapley_batch(spark, sf_dir):
    """Re-id tails nest and bound the expected-match rate; Shapley values
    recompute from the coalition rates and efficiency holds."""
    from data_service_spark.registry import QUERIES

    rr = QUERIES["k_reid_risk"](spark, sf_dir).collect()[0]
    assert 0 <= rr.n_unique <= rr.n_le_2 <= rr.n_le_5 <= rr.n_records
    # E[1/class] >= unique share (unique records contribute 1 each)
    assert rr.expected_reid_ppm >= rr.unique_ppm - 1
    assert rr.expected_reid_ppm <= 1000000

    sh = QUERIES["k_attribution_shapley"](spark, sf_dir).collect()
    assert {r.channel for r in sh} == {"view", "click", "signup"}
    # efficiency: sum of phi = v(grand coalition) - v(empty set); both are
    # coalition rates in [0,1], so the sum is bounded by 1e6 micro-units
    total = sum(r.phi_micro for r in sh)
    assert -1000000 <= total <= 1000000


def test_pref_bias_shuffle_batch(spark, sf_dir):
    """Preference-pair audit counts are internally consistent; shuffle
    quality sits near the random expectation and far from sorted."""
    from data_service_spark.registry import QUERIES

    pb = QUERIES["k_pref_length_bias"](spark, sf_dir).collect()[0]
    assert 0 < pb.n_pairs
    assert 0 <= pb.n_chosen_longer <= pb.n_pairs
    assert pb.chosen_longer_ppm == pb.n_chosen_longer * 1000000 // pb.n_pairs

    sq = QUERIES["k_shuffle_quality"](spark, sf_dir).collect()[0]
    assert sq.n_docs > 0
    assert 0 <= sq.shuffled_adj_same_ppm <= 1000000
    # hash order mixes sources: within 5x of the random expectation and
    # well below the sorted order's near-1 rate
    assert sq.shuffled_adj_same_ppm < sq.sorted_adj_same_ppm
    assert sq.shuffled_adj_same_ppm < 5 * sq.expected_random_ppm + 10000
    assert sq.sorted_adj_same_ppm > 900000


def test_ranker_delta_ci(spark, sf_dir):
    """The bootstrap CI brackets are ordered and the significance call
    matches the CI-excludes-zero rule."""
    from data_service_spark.registry import QUERIES

    rd = QUERIES["k_eval_ranker_delta"](spark, sf_dir).collect()[0]
    assert rd.n_queries == 20
    assert rd.ci_lo_micro <= rd.ci_hi_micro
    assert rd.significant == (rd.ci_lo_micro > 0 or rd.ci_hi_micro < 0)
    # delta magnitudes are bounded by the max possible MRR of 1e6 micro
    assert -1000000 <= rd.delta_mrr_micro <= 1000000


def test_pass_at_k_and_fleiss(spark, sf_dir):
    """pass@k is monotone in k, bounded, and recomputes for a sample of
    problems; Fleiss components bound kappa."""
    import math

    from data_service_spark.io import load
    from data_service_spark.registry import QUERIES

    pk = sorted(
        QUERIES["k_eval_pass_at_k"](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in pk] == [1, 2, 3, 4, 5]
    means = [r.mean_pass_ppm for r in pk]
    assert all(a <= b for a, b in zip(means, means[1:]))
    assert all(0 <= m <= 1000000 for m in means)
    # recompute k=1 exactly: mean over problems of c/n
    rows = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n"),
            __import__("pyspark.sql.functions", fromlist=["F"]).sum(
                __import__("pyspark.sql.functions", fromlist=["F"]).expr(
                    "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"
                )
            ).alias("c"),
        )
        .filter("n >= 10")
        .collect()
    )
    expect1 = sum(math.floor(r.c / r.n * 1e6) for r in rows) // len(rows)
    assert pk[0].mean_pass_ppm == expect1

    fl = QUERIES["k_fleiss_kappa"](spark, sf_dir).collect()[0]
    assert fl.n_raters == 3
    assert 0 <= fl.p_bar_ppm <= 1000000
    assert 0 <= fl.p_e_ppm < 1000000
    # kappa = (pbar - pe)/(1 - pe) in micro, within floor slack
    approx = (fl.p_bar_ppm - fl.p_e_ppm) * 1000000 // (1000000 - fl.p_e_ppm)
    assert abs(fl.fleiss_kappa_micro - approx) <= 5


def test_tpch_refresh_accounting(spark, sf_dir):
    """RF1/RF2 row accounting telescopes exactly."""
    from data_service_spark.registry import QUERIES

    r = QUERIES["q_tpch_refresh"](spark, sf_dir).collect()[0]
    assert r.n_after == r.n_before + r.n_inserted - r.n_deleted
    assert r.n_inserted > 0 and r.n_deleted > 0
    assert r.cents_after != r.cents_before


def test_lof_knn_grid_matches_broadcast(spark, sf_dir_large):
    """The LOF kNN grid regime must yield the same engine-side (dq, o)
    top-5 per point as the broadcast-GEMM regime (shared tie-complete
    kernel) — checked at sf0.1, the largest local corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_service_spark.queries.linalg import (
        _lof_knn_broadcast,
        lof_knn_grid,
    )

    sf = sf_dir_large

    def top5(df):
        w = Window.partitionBy("p").orderBy("dq", "o")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("p", "o", "dq")
        )

    want = set(map(tuple, top5(_lof_knn_broadcast(spark, sf, 5)).collect()))
    got = set(map(tuple, top5(lof_knn_grid(spark, sf, 5, blocks=8)).collect()))
    assert got == want
    assert len(got) > 0


def test_lof_dispatches_on_corpus_size(monkeypatch, spark):
    """k_outlier_lof's kNN flips to the grid regime above
    SIM_PAIRS_GRID_MIN_ROWS (r05 verdict item #4 — the last
    broadcast-regime GEMM site now dispatches by data size)."""
    from data_service_spark.queries import linalg

    calls = []
    monkeypatch.setattr(
        linalg, "lof_knn_grid", lambda *a, **k: calls.append(a) or
        linalg._lof_knn_broadcast(spark, "/root/testdata/sf0.01", 5)
    )
    monkeypatch.setattr(linalg, "_corpus_rows", lambda sf_dir: 10**9)
    linalg.k_outlier_lof(spark, "/root/testdata/sf0.01")
    assert len(calls) == 1


def test_knn_tie_complete_keeps_grid_ties():
    """The tie-complete kernel must keep EVERY candidate at the k-th
    quantized distance — the exact-duplicate scenario (ADVICE r05) where
    a raw-float top-32 argpartition could drop the id the (dq, o)
    ranking keeps."""
    import numpy as np

    from data_service_spark.queries.linalg import _knn_tie_complete

    # 40 candidates, ALL identical to the probe (dq == -1 for every
    # non-self pair after floor(-eps)); k=5 must return all 39 ties.
    v = np.ones(4) / 2.0
    aids = np.array([0], dtype=np.int64)
    cids = np.arange(40, dtype=np.int64)
    amat = v[None, :]
    cmat = np.tile(v, (40, 1))
    out = _knn_tie_complete(aids, amat, cids, cmat, 5)
    assert len(out) == 39  # every tie kept, self excluded
    assert set(out["o"]) == set(range(1, 40))
    assert out["dq"].nunique() == 1


# ------------------------------------------------- round-11 additions ----

from data_service_spark.io import load  # noqa: E402
from data_service_spark.registry import QUERIES  # noqa: E402


def test_components_fixed_unroll_is_converged(spark, sf_dir):
    """k_graph_components' docstring claim: the fixed unroll IS the
    fixpoint on this corpus — one extra round must not move ANY node's
    label. Reruns the registered loop body at rounds and rounds+1 and
    compares the FULL per-node label maps (component-size tables can
    coincide while labels still move; labels cannot)."""
    import data_service_spark.queries.graph as graph_mod
    from data_service_spark.queries.llm import _packed_edges

    def labels_at(rounds: int) -> dict:
        edges = _packed_edges(spark, sf_dir)
        nodes = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        loops = nodes.select(
            F.col("node").alias("src"), F.col("node").alias("dst")
        )
        edges2 = edges.unionAll(loops)
        labels = nodes.select("node", F.col("node").alias("lbl"))
        for _ in range(rounds):
            labels = (
                edges2.join(labels, edges2.src == labels.node)
                .groupBy("dst")
                .agg(F.min("lbl").alias("lbl"))
                .select(F.col("dst").alias("node"), "lbl")
            )
        return {r.node: r.lbl for r in labels.collect()}

    base = graph_mod._COMPONENT_ROUNDS
    la, lb = labels_at(base), labels_at(base + 1)
    assert la == lb and len(la) > 0


def test_components_converged_regime_matches_fixed(spark, sf_dir):
    """The size-dispatched convergence loop (r11 verdict item #4) must
    produce the IDENTICAL per-node label map as the fixed 6-round unroll
    on this corpus — cross-regime value identity, full labels compared
    (component-size tables can coincide while labels still move)."""
    from data_service_spark.queries.graph import _cc_labels

    fixed = {
        r.node: r.lbl
        for r in _cc_labels(spark, sf_dir, force_regime="fixed").collect()
    }
    conv = {
        r.node: r.lbl
        for r in _cc_labels(spark, sf_dir, force_regime="converged").collect()
    }
    assert fixed == conv and len(fixed) > 0


def test_components_regime_dispatch_rule(spark, sf_dir):
    """Dispatch pin: the graded corpus stays on the fixed lazy unroll
    (below threshold), and any vertex count above the threshold selects
    the convergence-checked loop."""
    from data_service_spark.queries.graph import (
        _COMPONENT_DISPATCH_NODES,
        _cc_regime,
    )
    from data_service_spark.queries.llm import _packed_edges

    n = _packed_edges(spark, sf_dir).select("src").distinct().count()
    assert n <= _COMPONENT_DISPATCH_NODES
    assert _cc_regime(n) == "fixed"
    assert _cc_regime(_COMPONENT_DISPATCH_NODES + 1) == "converged"


def test_components_partition_graph_into_all_nodes(spark, sf_dir):
    """Component sizes must sum to the vertex count of the doubled edge
    list (every node labeled exactly once), and every component id must
    be a member node id (min-label invariant)."""
    from data_service_spark.queries.llm import _cs_pairs

    e0 = _cs_pairs(spark, sf_dir)
    n_nodes = (
        e0.select((F.col("c") * 2).alias("n"))
        .unionAll(e0.select((F.col("s") * 2 + 1).alias("n")))
        .distinct()
        .count()
    )
    rows = QUERIES["k_graph_components"](spark, sf_dir).collect()
    assert sum(r.n_nodes for r in rows) == n_nodes


def test_forecast_ses_matches_sequential_recurrence(spark, sf_dir):
    """The closed-form windowed SES must equal the literal sequential
    recurrence s_t = ½x_t + ½s_{t-1} (s_1 = x_1) run in plain Python —
    EXACTLY, because every quantity is dyadic."""
    rows = sorted(
        QUERIES["k_forecast_ses"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    from decimal import ROUND_HALF_UP, Decimal

    s = None
    for r in rows:
        s = float(r.n_events) if s is None else 0.5 * r.n_events + 0.5 * s
        want = float(
            Decimal(repr(s)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )  # HALF_UP like both engines; Python round() is banker's
        assert abs(r.ses - want) < 1e-12, (r.day, r.ses, s)


def test_spc_rule1_agrees_with_3sigma(spark, sf_dir):
    """rule1 must be exactly the |z| > 3 predicate on the emitted zscore
    (the other rules are window counts; rule 1 is pointwise and thus
    independently recomputable from the output itself)."""
    rows = QUERIES["k_spc_rules"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.rule1 == (abs(r.zscore) > 3), r


def test_pacf_closed_matches_numpy(spark, sf_dir):
    """ACF/PACF must match an independent numpy evaluation of the same
    estimator (biased ACF, Durbin–Levinson through order 3) on the same
    daily counts."""
    import numpy as np

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
        .collect()
    )
    x = np.array([r.n for r in daily], dtype=float)
    x = x - x.mean()
    s0 = float(np.dot(x, x))
    r1, r2, r3 = (float(np.dot(x[k:], x[:-k])) / s0 for k in (1, 2, 3))
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    out = QUERIES["k_pacf_closed"](spark, sf_dir).collect()[0]
    assert out.n_days == len(x)
    for got, want in [
        (out.acf1, r1), (out.acf2, r2), (out.acf3, r3),
        (out.pacf1, r1), (out.pacf2, phi22), (out.pacf3, pacf3),
    ]:
        assert abs(got - round(want, 4)) < 2e-4, (got, want)


def test_topk_accuracy_monotone_and_consistent_with_mrr(spark, sf_dir):
    """hit@1 ≤ hit@3 ≤ hit@5 (monotone in k), and hit@5 cannot exceed
    k_eval_mrr_labels' hit_rate_at_10 (same ranking, deeper cut)."""
    acc = QUERIES["k_eval_topk_accuracy"](spark, sf_dir).collect()[0]
    assert 0.0 <= acc.acc_at_1 <= acc.acc_at_3 <= acc.acc_at_5 <= 1.0
    mrr = QUERIES["k_eval_mrr_labels"](spark, sf_dir).collect()[0]
    assert acc.acc_at_5 <= mrr.hit_rate_at_10 + 1e-9
    assert acc.n_queries == mrr.n_queries == 20


def test_ab_bayes_probability_shape(spark, sf_dir):
    """P(B>A) is a probability, coherent with the posterior means: if the
    posterior rates are equal it is 0.5; the side with the larger
    posterior mean must have probability on its side of 0.5."""
    r = QUERIES["k_ab_bayes"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.prob_b_beats_a <= 1.0
    if r.posterior_rate_b > r.posterior_rate_a:
        assert r.prob_b_beats_a > 0.5
    elif r.posterior_rate_b < r.posterior_rate_a:
        assert r.prob_b_beats_a < 0.5
    assert abs(
        r.expected_lift - round(r.posterior_rate_b - r.posterior_rate_a, 6)
    ) < 2e-6


def test_ab_bayes_phi_matches_scipy_grade_erf(spark, sf_dir):
    """The shared A&S 7.1.26 Φ text must agree with Python's math.erf to
    the documented 1.5e-7 over a z-grid including negatives (the CASE
    sign branch)."""
    import math

    from data_service_spark.queries.inference import _ab_phi

    grid = [-3.7, -1.96, -0.5, -1e-3, 0.0, 1e-3, 0.44, 1.96, 4.2]
    sql = ", ".join(
        f"CAST({_ab_phi(str(z))} AS DOUBLE) AS p{i}"
        for i, z in enumerate(grid)
    )
    row = spark.sql(f"SELECT {sql}").collect()[0]
    for i, z in enumerate(grid):
        want = 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
        assert abs(row[f"p{i}"] - want) < 1.5e-7, (z, row[f"p{i}"], want)


def test_simpson_overall_row_never_disagrees_with_itself(spark, sf_dir):
    """The '__all__' row's disagreement flag must be False by
    construction, and per-stratum flags must equal the sign comparison
    recomputable from the emitted means."""
    rows = QUERIES["k_simpson_check"](spark, sf_dir).collect()
    overall = [r for r in rows if r.stratum == "__all__"]
    assert len(overall) == 1 and overall[0].disagrees_with_overall is False
    # the key's sign compares the 4dp-ROUNDED means (= the emitted
    # columns), so the flag is exactly recomputable from the output
    o_sign = 1 if overall[0].mean_b > overall[0].mean_a else -1
    for r in rows:
        s_sign = 1 if r.mean_b > r.mean_a else -1
        assert r.disagrees_with_overall == (s_sign != o_sign), r


def test_dedup_fingerprint_collapses_reordered_tokens(spark):
    """Token order and repetition must not change the fingerprint; any
    extra token must. Exercised on a hand-built frame through the same
    expression the key uses."""
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "a b c"), (3, "a a b c c"), (4, "a b c d")],
        "doc_id long, text string",
    )
    fp = df.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(F.split(F.lower(F.col("text")), " "))
                ),
                " ",
            )
        ).alias("f"),
    ).collect()
    by_id = {r.doc_id: r.f for r in fp}
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[4] != by_id[1]


def test_dup_ngram_frac_bounds_and_short_doc_fence(spark, sf_dir):
    """dup_frac ∈ [0, 1] with n_dup_grams ≤ n_grams, and docs shorter
    than 3 tokens must emit NO row (the sequence(1, 0) descending fence)
    — verified by running the registered expression over a frame with a
    2-token doc."""
    rows = QUERIES["k_text_dup_ngram_frac"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_grams <= r.n_grams
        assert 0.0 <= r.dup_frac <= 1.0
    short = spark.createDataFrame(
        [(1, "a b"), (2, "x y z w"), (3, "x y z q")],
        "doc_id long, text string",
    )
    g = short.filter(F.size(F.split("text", " ")) >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 2),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
            )
        ).alias("gram"),
    )
    got = {(r.doc_id, r.gram) for r in g.collect()}
    assert got == {
        (2, "x y z"), (2, "y z w"), (3, "x y z"), (3, "y z q"),
    }


def test_schema_drift_rowcounts_partition_the_table(spark, sf_dir):
    """The early/late 'rows' metrics must sum to the full orders
    rowcount (the split is a partition, not a sample)."""
    rows = QUERIES["k_schema_drift"](spark, sf_dir).collect()
    cnt = {
        (r.column_name, r.metric): (r.early_val, r.late_val) for r in rows
    }
    early, late = cnt[("rows", "count")]
    assert early + late == load(spark, sf_dir, "orders").count()


def test_freshness_weights_ess_bounds(spark, sf_dir):
    """Kish ESS is bounded by (0, n]; with a decaying exponential weight
    it must be strictly below n (weights are non-constant across 30
    days)."""
    rows = QUERIES["k_freshness_weights"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.ess <= r.n_events
        assert 0 < r.ess_ratio < 1.0
        assert r.sum_weight <= r.n_events


def test_clustering_coeff_bounds_and_triangle_consistency(spark, sf_dir):
    """cc ∈ [0, 1]; summed per-node triangle incidences must equal 3× the
    triangle count implied by k_graph_triangles (each triangle touches
    exactly 3 nodes, and every triangle node has degree ≥ 2 so none are
    filtered)."""
    cc = QUERIES["k_graph_clustering_coeff"](spark, sf_dir).collect()
    assert cc
    for r in cc:
        assert 0.0 <= r.clustering_coeff <= 1.0
        max_tri = r.deg * (r.deg - 1) // 2
        assert r.n_triangles <= max_tri
    tri = QUERIES["k_graph_triangles"](spark, sf_dir).collect()
    assert sum(r.n_triangles for r in cc) == sum(r.n_triangles for r in tri)


def test_assortativity_in_pearson_range(spark, sf_dir):
    r = QUERIES["k_graph_assortativity"](spark, sf_dir).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_edges > 0 and r.n_edges % 2 == 0  # doubled edge list


def test_markov_absorption_probability_laws(spark, sf_dir):
    """Each transient state emits one row per absorbing target, every
    probability is in [0, 1], and the two-target total is ≤ 1 (mass not
    yet absorbed after 8 steps remains in transit)."""
    rows = QUERIES["k_markov_absorption"](spark, sf_dir).collect()
    by_state: dict = {}
    for r in rows:
        assert r.from_state not in ("purchase", "error")
        assert 0.0 <= r.p_absorbed_8 <= 1.0
        by_state.setdefault(r.from_state, {})[r.absorbed_into] = (
            r.p_absorbed_8
        )
    assert set(by_state) == {"view", "click", "signup"}
    for st, targets in by_state.items():
        assert set(targets) == {"purchase", "error"}, st
        assert sum(targets.values()) <= 1.0 + 1e-9, (st, targets)


def test_wilcoxon_statistic_bounds(spark, sf_dir):
    """W+ must lie in [0, n(n+1)/2] and the z-statistic must be finite
    and consistent with the significance flag."""
    r = QUERIES["k_wilcoxon_signed"](spark, sf_dir).collect()[0]
    n = r.n_pairs
    assert n > 0
    assert 0.0 <= r.w_plus <= n * (n + 1) / 2.0
    assert r.significant_95 == (abs(r.z_stat) > 1.96)


def test_bucket_batching_never_hurts(spark, sf_dir):
    """Length-sorted batching can only reduce padding (rearrangement
    inequality over batch maxima), so pad_gain ∈ [0, 1] and the bucketed
    waste is ≤ the arrival-order waste."""
    r = QUERIES["k_bucket_batching_gain"](spark, sf_dir).collect()[0]
    assert r.bucketed_pad_tokens <= r.arrival_pad_tokens
    assert 0.0 <= r.pad_gain <= 1.0
    assert r.n_docs > 0


def test_sample_fixed_k_exact_counts_and_stability(spark, sf_dir):
    """Exactly 5 docs per source, ranks 1..5, and the draw is identical
    across two evaluations (hash-deterministic, unlike sampleBy)."""
    a = QUERIES["k_sample_fixed_k"](spark, sf_dir).collect()
    b = QUERIES["k_sample_fixed_k"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per: dict = {}
    for r in a:
        per.setdefault(r.source, []).append(r.sample_rank)
    for src, ranks in per.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], src


def test_auc_by_segment_bounds_and_pooled_consistency(spark, sf_dir):
    """Every per-source AUC is a valid probability with both classes
    present; the pooled k_eval_auc uses the same scorer, so the segment
    table must be non-empty whenever the pooled AUC exists."""
    seg = QUERIES["k_eval_auc_by_segment"](spark, sf_dir).collect()
    assert seg
    for r in seg:
        assert 0.0 <= r.auc <= 1.0
        assert r.n_pos > 0 and r.n_neg > 0
    pooled = QUERIES["k_eval_auc"](spark, sf_dir).collect()[0]
    assert sum(r.n_pos for r in seg) <= pooled.n_pos


def test_star_except_prunes_excluded_columns(spark, sf_dir):
    """SELECT * EXCEPT must drop the named columns from the schema AND
    from the parquet ReadSchema (pruning reaches the scan)."""
    df = QUERIES["q_star_except"](spark, sf_dir)
    assert "o_orderdate" not in df.columns
    assert "o_orderpriority" not in df.columns
    assert "o_orderkey" in df.columns
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    rs = buf.getvalue().split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in rs and "o_orderpriority" not in rs


def test_order_by_all_head_is_lexicographic(spark, sf_dir):
    """The LIMIT-5 head must be the lexicographic minimum over
    (status, priority, n) — recomputed independently from the unordered
    aggregate."""
    got = [
        (r.o_orderstatus, r.o_orderpriority, r.n_orders)
        for r in QUERIES["q_order_by_all"](spark, sf_dir).collect()
    ]
    full = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .collect()
    )
    want = sorted(
        (r.o_orderstatus, r.o_orderpriority, r.n_orders) for r in full
    )[:5]
    assert sorted(got) == want


def test_tost_coherent_with_ztest_family(spark, sf_dir):
    """Equivalence flag must equal the two one-sided conditions on the
    emitted statistics, and the diff must match the means."""
    r = QUERIES["k_eval_tost_equivalence"](spark, sf_dir).collect()[0]
    assert abs(r.diff_b_minus_a - round(r.mean_b - r.mean_a, 4)) < 2e-4
    assert r.equivalent_90 == bool(
        r.z_lower > 1.6449 and r.z_upper < -1.6449
    )


def test_winsorized_mean_between_trimmed_and_raw(spark, sf_dir):
    """Caps must bracket the winsorized mean; winsorizing a heavy right
    tail pulls the mean DOWN toward (but not past) the caps, and n is
    preserved (unlike trimming)."""
    rows = {r.event_type: r for r in
            QUERIES["k_winsorized_mean"](spark, sf_dir).collect()}
    raw_n = {
        r.event_type: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for et, r in rows.items():
        assert r.lo_cap <= r.mean_winsorized <= r.hi_cap
        assert r.n_events == raw_n[et]


def test_err_bounds_and_cascade_dominance(spark, sf_dir):
    """ERR@10 ∈ [0, 1]; with any rel-3 doc in the top 10 ERR ≥ its
    stopping term (7/8)/rank · prefix — recompute the exact cascade from
    the underlying ranking independently in Python."""
    r = QUERIES["k_eval_err"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.err_at_10 <= 1.0
    from data_service_spark.io import load as _load
    from data_service_spark.registry import QUERIES as _Q

    scored = {x.doc_id: x.bm25 for x in _Q["k_text_bm25"](spark, sf_dir).collect()}
    docs = {
        x.doc_id: sum(
            w in x.text.split(" ") for w in ("table", "hash", "scan")
        )
        for x in _load(spark, sf_dir, "documents").collect()
    }
    top = sorted(scored, key=lambda d: (-round(scored[d], 6), d))[:10]
    err, survive = 0.0, 1.0
    for k, d in enumerate(top, 1):
        R = (2 ** docs[d] - 1) / 8.0
        err += survive * R / k
        survive *= 1.0 - R
    assert abs(r.err_at_10 - round(err, 6)) < 2e-6
    assert r.top10_rel_sum == sum(docs[d] for d in top)


def test_pinball_loss_optimality_direction(spark, sf_dir):
    """Pinball loss is non-negative, and the q90 predictor must be ≥ the
    q50 predictor per type (order statistics are monotone in q)."""
    rows = QUERIES["k_pinball_loss"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pinball_q50 >= 0 and r.pinball_q90 >= 0
        assert r.q90_pred >= r.q50_pred
        assert r.n_train > 0 and r.n_test > 0


def test_rest_paged_source_partition_per_page(spark, sf_dir):
    """The paged source must plan exactly ceil(n/page_size) input
    partitions (parallel page fetches) and the short last page must
    carry the remainder."""
    df = QUERIES["a_source_rest_paged"](spark, sf_dir)
    assert df.rdd.getNumPartitions() == 12  # ceil(1000/88)
    per_page = {
        r.page: r.n
        for r in df.groupBy("page").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_page == {p: (88 if p < 11 else 1000 - 11 * 88) for p in range(12)}


def test_identifier_clause_rejects_injection_payload(spark, sf_dir):
    """IDENTIFIER(:p) must parse the bound value strictly as a name: a
    spliced-SQL payload fails ANALYSIS instead of executing — the whole
    point of the clause for a web-service endpoint."""
    import pytest as _pytest

    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    with _pytest.raises(Exception) as exc:
        spark.sql(
            "SELECT count(*) FROM IDENTIFIER(:tab)",
            args={"tab": "orders; DROP TABLE orders"},
        ).collect()
    assert "orders; DROP TABLE orders" in str(exc.value) or "PARSE" in str(
        exc.value
    ).upper() or "INVALID" in str(exc.value).upper()
    # and the legitimate binding still resolves
    n = spark.sql(
        "SELECT count(*) AS n FROM IDENTIFIER(:tab)", args={"tab": "orders"}
    ).collect()[0].n
    assert n > 0


# ------------------------------------------------- round-12 additions ----


def _daily_counts(spark, sf_dir):
    """Ordered daily event counts (the spine the forecast family reads)."""
    rows = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
        .collect()
    )
    return [float(r.n) for r in rows]


def test_holt_matches_sequential_recurrence(spark, sf_dir):
    """k_forecast_holt must equal the literal coupled recurrence
    l_t = 1/2 x_t + 1/2(l+b)_{t-1}, b_t = 1/2(l_t - l_{t-1}) + 1/2 b_{t-1}
    run in plain Python — EXACTLY at the rounded grid, because the
    recursion fixes evaluation order and every op is IEEE."""
    from decimal import ROUND_HALF_UP, Decimal

    xs = _daily_counts(spark, sf_dir)
    l, b = xs[0], xs[1] - xs[0]
    exp = {1: (l, b)}
    for t in range(2, len(xs) + 1):
        x = xs[t - 1]
        l_new = 0.5 * x + 0.5 * (l + b)
        b_new = 0.25 * x - 0.25 * l + 0.75 * b
        l, b = l_new, b_new
        exp[t] = (l, b)
    rows = sorted(
        QUERIES["k_forecast_holt"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) == len(xs)

    def q4(v: float) -> float:
        return float(
            Decimal(repr(v)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )

    for t, r in enumerate(rows, start=1):
        el, eb = exp[t]
        assert abs(r.level - q4(el)) < 1e-9, (t, r.level, el)
        assert abs(r.trend - q4(eb)) < 1e-9, (t, r.trend, eb)


def test_forecast_mase_naive_identity(spark, sf_dir):
    """MASE of the naive-1 forecaster is 1.0 BY CONSTRUCTION (its MAE is
    the MASE denominator) — plus basic estimator sanity on both rows."""
    rows = {
        r.forecaster: r
        for r in QUERIES["k_forecast_mase"](spark, sf_dir).collect()
    }
    assert set(rows) == {"naive_1", "snaive_7"}
    assert rows["naive_1"].mase == 1.0
    for r in rows.values():
        assert r.rmse >= r.mae > 0
        assert 0 < r.wape < 2


def test_durbin_watson_bounds_and_rho(spark, sf_dir):
    """DW lives in [0, 4] and rho_hat must equal 1 - dw/2 at the grid."""
    rows = QUERIES["k_durbin_watson"](spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0.0 <= r.dw <= 4.0
        assert abs(r.rho_hat - (1.0 - r.dw / 2)) < 2e-4


def test_hurst_matches_numpy_recompute(spark, sf_dir):
    """R/S per block and the two-point Hurst slope recomputed with numpy
    must match the SQL to the 4dp grid."""
    import math

    import numpy as np

    xs = np.array(_daily_counts(spark, sf_dir))
    exp = {}
    for w in (8, 16):
        rs = []
        for b in range(len(xs) // w):
            blk = xs[b * w : (b + 1) * w]
            dev = blk - blk.mean()
            z = np.cumsum(dev)
            s = math.sqrt(float((dev * dev).sum()) / w)
            rs.append((z.max() - z.min()) / s)
        exp[w] = sum(rs) / len(rs)
    row = QUERIES["k_hurst_rs"](spark, sf_dir).collect()[0]
    assert row.blocks_8 == len(xs) // 8
    assert abs(row.rs_8 - exp[8]) < 1e-3
    assert abs(row.rs_16 - exp[16]) < 1e-3
    assert abs(row.hurst - math.log2(exp[16] / exp[8])) < 1e-3


def test_jarque_bera_matches_numpy_moments(spark, sf_dir):
    """Skewness, excess kurtosis and JB recomputed from numpy central
    moments must match the SQL within the 4dp grid."""
    import numpy as np

    vals = {
        r.event_type: np.array(r.vs)
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    rows = {r.event_type: r for r in QUERIES["k_jarque_bera"](spark, sf_dir).collect()}
    for et, v in vals.items():
        n = len(v)
        m2 = ((v - v.mean()) ** 2).mean()
        m3 = ((v - v.mean()) ** 3).mean()
        m4 = ((v - v.mean()) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        jb = n / 6 * (g1**2 + g2**2 / 4)
        r = rows[et]
        assert abs(r.skewness - g1) < 1e-3, et
        assert abs(r.ex_kurtosis - g2) < 1e-3, et
        assert abs(r.jb_stat - jb) < max(1e-3, abs(jb) * 1e-4), et
        assert r.reject_normal_5pct == (jb > 5.991464547107979)


def test_grubbs_matches_numpy(spark, sf_dir):
    """Grubbs G (ppm floor grid) and the witness row recomputed with
    numpy must match; the witness is the min event_id among argmax."""
    import numpy as np

    df = (
        load(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .toPandas()
    )
    rows = {r.event_type: r for r in QUERIES["k_grubbs_test"](spark, sf_dir).collect()}
    for et, g in df.groupby("event_type"):
        v = g["value"].to_numpy()
        mu = round(float(v.mean()), 6)
        sd = round(float(v.std(ddof=1)), 6)
        ppm = np.floor(np.abs(v - mu) / sd * 1e6).astype("int64")
        top = ppm.max()
        witness = int(g["event_id"].to_numpy()[ppm == top].min())
        r = rows[et]
        assert r.grubbs_g_ppm == top, et
        assert r.outlier_event_id == witness, et
        assert abs(r.mean_value - mu) < 1e-9 and abs(r.sd_value - sd) < 1e-9


def test_anderson_darling_matches_python_recompute(spark, sf_dir):
    """A^2 recomputed in plain Python with the SAME A&S erf text
    semantics must match the SQL at the 3dp grid."""
    import math

    rows = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.day, float(r.n)))

    def phi(x: float) -> float:
        t = 1.0 / (1.0 + 0.3275911 * abs(x / math.sqrt(2.0)))
        e = (
            0.254829592 * t
            - 0.284496736 * t**2
            + 1.421413741 * t**3
            - 1.453152027 * t**4
            + 1.061405429 * t**5
        ) * math.exp(-((x / math.sqrt(2.0)) ** 2))
        erf = 1.0 - e
        val = 0.5 * (1.0 + (-1.0 if x < 0 else 1.0) * erf)
        return min(max(val, 1e-12), 1.0 - 1e-12)

    out = {r.event_type: r for r in QUERIES["k_anderson_darling"](spark, sf_dir).collect()}
    for et, pairs in by_type.items():
        xs = [x for _, x in sorted(pairs)]
        n = len(xs)
        if n < 8:
            assert et not in out
            continue
        mu = sum(xs) / n
        sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / (n - 1))
        zs = sorted(
            ((x - mu) / sd, d) for d, x in pairs
        )  # (value, day) ordering mirrors the SQL's ORDER BY x, day
        z = [v for v, _ in zs]
        a2 = -n - sum(
            (2 * (i + 1) - 1) * (math.log(phi(z[i])) + math.log(1 - phi(z[n - 1 - i])))
            for i in range(n)
        ) / n
        r = out[et]
        assert abs(r.a2_stat - a2) < 2e-3, (et, r.a2_stat, a2)
        astar = a2 * (1 + 0.75 / n + 2.25 / n**2)
        assert r.reject_normal_5pct == (astar > 0.752)


def test_partial_corr_matches_numpy(spark, sf_dir):
    """All three raw r's and the partial r recomputed with numpy must
    match the SQL at the 4dp grid."""
    import math

    import numpy as np

    rows = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("z"),
        )
        .collect()
    )
    x = np.array([float(r.x) for r in rows])
    y = np.array([float(r.y) for r in rows])
    z = np.array([float(r.z) for r in rows])
    rxy = float(np.corrcoef(x, y)[0, 1])
    rxz = float(np.corrcoef(x, z)[0, 1])
    ryz = float(np.corrcoef(y, z)[0, 1])
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    r = QUERIES["k_partial_corr"](spark, sf_dir).collect()[0]
    assert r.n_days == len(rows)
    assert abs(r.r_click_purchase - rxy) < 1e-3
    assert abs(r.r_partial_given_view - part) < 1e-3


def test_krippendorff_matches_python_recompute(spark, sf_dir):
    """Alpha recomputed from the coincidence formula in plain Python
    must match the SQL at the 4dp grid; hand-check the degenerate
    perfect-agreement and coin-flip anchors hold (alpha <= 1)."""
    rows = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_type: dict = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append((r.day, float(r.n)))
    ratings: dict = {}
    for et, pairs in per_type.items():
        mu = sum(x for _, x in pairs) / len(pairs)
        for d, x in pairs:
            ratings.setdefault(d, []).append(1.0 if x > mu else 0.0)
    units = [(len(v), sum(v)) for v in ratings.values() if len(v) >= 2]
    n = sum(m for m, _ in units)
    c1 = sum(n1 for _, n1 in units)
    c0 = n - c1
    do = sum(n1 * (m - n1) / (m - 1) for m, n1 in units)
    de = c1 * c0 / (n - 1)
    alpha = 1 - do / de
    r = QUERIES["k_krippendorff_alpha"](spark, sf_dir).collect()[0]
    assert r.n_units == len(units) and r.n_ratings == int(n)
    assert abs(r.kripp_alpha - alpha) < 1e-3
    assert r.kripp_alpha <= 1.0


def test_ordinal_assoc_matches_pandas_recompute(spark, sf_dir):
    """C, D and every coefficient recomputed from a pandas contingency
    table (identical ntile rule: extras to the first buckets) must
    match the SQL exactly / at the 4dp grid."""
    import math

    import numpy as np

    df = (
        load(spark, sf_dir, "events")
        .select("event_id", "value", F.expr("extract(HOUR FROM ts)").alias("h"))
        .toPandas()
    )
    df = df.sort_values(["value", "event_id"]).reset_index(drop=True)
    n = len(df)
    base, rem = divmod(n, 4)
    sizes = [base + (1 if i < rem else 0) for i in range(4)]
    vq = np.repeat(np.arange(1, 5), sizes)
    df["vq"] = vq
    df["hb"] = (df["h"] // 6).astype(int)
    cell = df.groupby(["vq", "hb"]).size().reset_index(name="c")
    conc = disc = 0
    recs = cell.to_records(index=False)
    for a in recs:
        for b in recs:
            if b[0] > a[0] and b[1] > a[1]:
                conc += int(a[2]) * int(b[2])
            elif b[0] > a[0] and b[1] < a[1]:
                disc += int(a[2]) * int(b[2])
    p_all = n * (n - 1) / 2
    tx = sum(v * (v - 1) / 2 for v in cell.groupby("vq")["c"].sum())
    ty = sum(v * (v - 1) / 2 for v in cell.groupby("hb")["c"].sum())
    r = QUERIES["k_ordinal_assoc"](spark, sf_dir).collect()[0]
    assert r.n_events == n
    assert r.concordant_pairs == conc and r.discordant_pairs == disc
    assert abs(r.gk_gamma - (conc - disc) / (conc + disc)) < 1e-3
    assert abs(r.tau_b - (conc - disc) / math.sqrt((p_all - tx) * (p_all - ty))) < 1e-3


def test_distinct_on_picks_first_row_per_user(spark, sf_dir):
    """Exactly one row per user, and it is the (ts, event_id)-min row."""
    e = load(spark, sf_dir, "events")
    expected = {
        r.user_id: (r.ts, r.eid)
        for r in e.groupBy("user_id")
        .agg(F.min(F.struct("ts", F.col("event_id").alias("eid"))).alias("m"))
        .select("user_id", F.col("m.ts").alias("ts"), F.col("m.eid").alias("eid"))
        .collect()
    }
    rows = QUERIES["q_distinct_on"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert expected[r.user_id] == (r.first_ts, r.event_id)


def test_tvf_range_spine_is_gap_free_and_mass_preserving(spark, sf_dir):
    """span+1 consecutive days, and the left join preserves total event
    mass (gap days contribute explicit zeros)."""
    rows = sorted(
        QUERIES["q_tvf_range"](spark, sf_dir).collect(), key=lambda r: r.day
    )
    days = [r.day for r in rows]
    assert (days[-1] - days[0]).days + 1 == len(days)
    total = load(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total


def test_cliffs_delta_matches_bruteforce_pairs(spark, sf_dir):
    """Delta recomputed by literal pair counting over the two samples
    must match the midrank identity exactly at the 4dp grid, and the
    Romano label must agree."""
    vals = {
        r.event_type: sorted(r.vs)
        for r in load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    import bisect

    xs, ys = vals["purchase"], vals["view"]
    gt = sum(bisect.bisect_left(ys, x) for x in xs)  # (x > y) pairs
    lt = sum(len(ys) - bisect.bisect_right(ys, x) for x in xs)  # (x < y)
    delta = (gt - lt) / (len(xs) * len(ys))
    r = QUERIES["k_cliffs_delta"](spark, sf_dir).collect()[0]
    assert (r.n1, r.n2) == (len(xs), len(ys))
    assert abs(r.cliffs_delta - delta) < 1e-3
    a = abs(delta)
    label = (
        "negligible" if a < 0.147 else "small" if a < 0.33
        else "medium" if a < 0.474 else "large"
    )
    assert r.magnitude == label


def test_bartlett_matches_python_recompute(spark, sf_dir):
    """Bartlett chi2 recomputed from per-group sample variances in
    plain Python must match at the 4dp grid."""
    import math

    groups = {
        r.event_type: r.vs
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    var = {}
    for et, v in groups.items():
        mu = sum(v) / len(v)
        var[et] = sum((x - mu) ** 2 for x in v) / (len(v) - 1)
    sp2 = sum((len(v) - 1) * var[et] for et, v in groups.items()) / (n - k)
    m_stat = (n - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(var[et]) for et, v in groups.items()
    )
    c = 1 + (
        sum(1 / (len(v) - 1) for v in groups.values()) - 1 / (n - k)
    ) / (3 * (k - 1))
    r = QUERIES["k_bartlett_test"](spark, sf_dir).collect()[0]
    assert r.df == k - 1 and r.n == n
    assert abs(r.bartlett_chi2 - m_stat / c) < max(1e-3, m_stat / c * 1e-5)


def test_odds_ratio_matches_python_2x2(spark, sf_dir):
    """OR and the Woolf CI recomputed from the user-level 2x2 table."""
    import math

    users = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
                ).otherwise(0)
            ).alias("conv")
        )
        .collect()
    )
    a = sum(1 for u in users if u.user_id % 2 == 1 and u.conv)
    b = sum(1 for u in users if u.user_id % 2 == 1 and not u.conv)
    c = sum(1 for u in users if u.user_id % 2 == 0 and u.conv)
    d = sum(1 for u in users if u.user_id % 2 == 0 and not u.conv)
    r = QUERIES["k_odds_ratio_ci"](spark, sf_dir).collect()[0]
    assert (r.treated_conv, r.treated_no, r.control_conv, r.control_no) == (a, b, c, d)
    if min(a, b, c, d) == 0:
        a, b, c, d = a + 0.5, b + 0.5, c + 0.5, d + 0.5
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(r.odds_ratio - orr) < 1e-3
    assert abs(r.ci95_lo - orr * math.exp(-1.959963984540054 * se)) < 1e-3
    assert abs(r.ci95_hi - orr * math.exp(1.959963984540054 * se)) < 1e-3
    assert r.ci95_lo <= r.odds_ratio <= r.ci95_hi


def test_gumbel_fit_matches_python_moments(spark, sf_dir):
    """mu/beta/return level recomputed from the weekly block maxima."""
    import math

    xs = _daily_counts(spark, sf_dir)
    maxima = [
        max(xs[b * 7 : (b + 1) * 7])
        for b in range(len(xs) // 7)
    ]
    nb = len(maxima)
    m = sum(maxima) / nb
    s = math.sqrt(sum((x - m) ** 2 for x in maxima) / (nb - 1))
    beta = s * math.sqrt(6) / math.pi
    mu = m - 0.5772156649015329 * beta
    r = QUERIES["k_gumbel_block_maxima"](spark, sf_dir).collect()[0]
    assert r.n_blocks == nb
    assert abs(r.gumbel_mu - mu) < 1e-3
    assert abs(r.gumbel_beta - beta) < 1e-3
    assert abs(r.return_level_100 - (mu - beta * math.log(-math.log(0.99)))) < 1e-3
    assert r.return_level_100 > max(maxima) - 3 * beta  # sits in the tail


def test_theil_decomposition_is_additive(spark, sf_dir):
    """T_total == T_between + T_within at the rounded grid, all parts
    non-negative, and T_total matches a plain-Python recompute."""
    import math

    vals = [
        (r.event_type, r.value)
        for r in load(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
        if r.value > 0
    ]
    n = len(vals)
    mu = sum(v for _, v in vals) / n
    t_total = sum((v / mu) * math.log(v / mu) for _, v in vals) / n
    r = QUERIES["k_theil_index"](spark, sf_dir).collect()[0]
    assert r.n_rows == n
    assert abs(r.theil_total - t_total) < 1e-3
    assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 2e-4
    assert r.theil_between >= 0 and r.theil_within >= 0


def test_mood_median_matches_python_recompute(spark, sf_dir):
    """Above/below classification against the 6dp-pinned grand median
    and the chi2 recomputed in plain Python."""
    import numpy as np

    df = (
        load(spark, sf_dir, "events").select("event_type", "value").toPandas()
    )
    gm = round(float(np.percentile(df["value"], 50, method="linear")), 6)
    df = df[df["value"] != gm]
    tab = {
        et: (int((g["value"] > gm).sum()), int((g["value"] <= gm).sum()))
        for et, g in df.groupby("event_type")
    }
    n = sum(a + b for a, b in tab.values())
    a_tot = sum(a for a, _ in tab.values())
    chi2 = 0.0
    for a, b in tab.values():
        ni = a + b
        ea, eb = ni * a_tot / n, ni * (n - a_tot) / n
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    r = QUERIES["k_mood_median"](spark, sf_dir).collect()[0]
    assert r.df == len(tab) - 1 and r.n_used == n
    assert abs(r.mood_chi2 - chi2) < 1e-3
    assert r.reject_equal_medians_5pct == (chi2 > 9.487729036781154)


def test_fdr_by_is_never_more_liberal_than_bh(spark, sf_dir):
    """BY's harmonic correction can only SHRINK the rejection set:
    by_reject implies bh_reject on every row, and ranks are a
    permutation of 1..m."""
    rows = QUERIES["k_fdr_by"](spark, sf_dir).collect()
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        assert 0 <= r.p_value <= 1
        if r.by_reject:
            assert r.bh_reject


def test_bhattacharyya_matches_numpy_hist(spark, sf_dir):
    """BC recomputed from numpy histograms on the same 6dp-pinned
    bounds and 20-bin grid; Hellinger and BC bounds hold."""
    import math

    import numpy as np

    df = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("event_type", "value")
        .toPandas()
    )
    lo = round(float(df["value"].min()), 6)
    hi = round(float(df["value"].max()), 6)
    bins = np.clip(
        np.floor((df["value"].to_numpy() - lo) / (hi - lo) * 20).astype(int),
        0,
        19,
    )
    p = np.bincount(bins[df["event_type"] == "purchase"], minlength=20)
    q = np.bincount(bins[df["event_type"] == "view"], minlength=20)
    bc = float(np.sqrt(p / p.sum() * q / q.sum()).sum())
    r = QUERIES["k_bhattacharyya_hists"](spark, sf_dir).collect()[0]
    assert (r.n_purchase, r.n_view) == (int(p.sum()), int(q.sum()))
    assert abs(r.bhattacharyya_coef - bc) < 1e-3
    assert 0 < r.bhattacharyya_coef <= 1
    assert abs(r.hellinger_dist - math.sqrt(1 - bc)) < 1e-3


def test_mood_bhattacharyya_degenerate_corpora_cross_engine(spark):
    """r13 ADVICE fences: (a) k_mood_median with ALL non-tied values on
    one side of the grand median (a = 0 / a = n) must not 0/0-diverge;
    (b) k_bhattacharyya_hists on a CONSTANT pooled column (hi = lo)
    must not CAST(NaN) — which hard-errors DuckDB while Spark NULLs.
    Both engines run the SAME shared body over the same synthetic rows
    and must agree exactly."""
    import duckdb

    from data_service_spark.queries.inference import (
        _body_bhattacharyya,
        _body_mood,
    )

    # (a) values {1,1,1,5,5}: median 1, ties excluded leaves {5,5} both
    # ABOVE (a = n → below-expected 0); mirrored set hits a = 0.
    for vals in ([1.0, 1.0, 1.0, 5.0, 5.0], [1.0, 5.0, 5.0, 5.0, 5.0]):
        rows = [("purchase" if i % 2 else "view", v) for i, v in enumerate(vals)]
        spark.createDataFrame(rows, "event_type string, value double") \
            .createOrReplaceTempView("events")
        got = spark.sql(_body_mood("percentile(value, 0.5)")).collect()[0]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM (VALUES "
            + ", ".join(f"('{t}', {v})" for t, v in rows)
            + ") t(event_type, value)"
        )
        exp = con.execute(_body_mood("quantile_cont(value, 0.5)")).fetchone()
        con.close()
        assert got.mood_chi2 == exp[2]
        assert got.reject_equal_medians_5pct == exp[3]
        # one-sided table → every per-type observed matches expected on
        # the populated side → chi2 must be finite (fence worked)
        assert got.mood_chi2 == got.mood_chi2  # not NaN

    # (b) constant pooled value: lo = hi → every row bins to 0, BC = 1.
    rows = [("purchase", 7.0)] * 3 + [("view", 7.0)] * 4
    spark.createDataFrame(rows, "event_type string, value double") \
        .createOrReplaceTempView("events")
    got = spark.sql(_body_bhattacharyya()).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}', {v})" for t, v in rows)
        + ") t(event_type, value)"
    )
    exp = con.execute(_body_bhattacharyya()).fetchone()
    con.close()
    assert got.bhattacharyya_coef == exp[3] == 1.0
    assert got.hellinger_dist == exp[5] == 0.0
    assert (got.n_purchase, got.n_view, got.n_bins_used) == (3, 4, 1)


def test_semi_anti_partition_supplier_dimension(spark, sf_dir):
    """The semi and anti branches must partition suppliers exactly:
    disjoint, union = dimension, semi side cross-checked against a
    distinct-key probe."""
    rows = QUERIES["q_semi_anti_sql"](spark, sf_dir).collect()
    semi = {r.s_suppkey for r in rows if r.mode == "semi"}
    anti = {r.s_suppkey for r in rows if r.mode == "anti"}
    assert semi.isdisjoint(anti)
    all_sup = {
        r.s_suppkey for r in load(spark, sf_dir, "supplier").select("s_suppkey").collect()
    }
    assert semi | anti == all_sup
    probe = {
        r.l_suppkey
        for r in load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= "1997-06-01")
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert semi == probe & all_sup


def test_ljung_box_matches_python_recompute(spark, sf_dir):
    """Q recomputed from the ACF definition in plain Python."""
    xs = _daily_counts(spark, sf_dir)
    n = len(xs)
    m = sum(xs) / n
    e = [x - m for x in xs]
    s0 = sum(v * v for v in e)
    q = 0.0
    for k in range(1, 6):
        rk = sum(e[i] * e[i + k] for i in range(n - k)) / s0
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    r = QUERIES["k_ljung_box"](spark, sf_dir).collect()[0]
    assert r.n_days == n and r.n_lags == 5
    assert abs(r.ljung_box_q - q) < 1e-3
    assert r.reject_white_noise_5pct == (q > 11.070497693516351)


def test_periodogram_matches_python_and_flags_unique_dominant(spark, sf_dir):
    """Variance fractions recomputed with math.cos/sin; exactly one
    dominant row."""
    import math

    xs = _daily_counts(spark, sf_dir)
    n = len(xs)
    m = sum(xs) / n
    ss = sum((x - m) ** 2 for x in xs)
    rows = {r.period_days: r for r in QUERIES["k_dft_periodogram"](spark, sf_dir).collect()}
    assert set(rows) == set(range(2, 11))
    assert sum(1 for r in rows.values() if r.is_dominant) == 1
    for p, r in rows.items():
        c = sum((xs[t - 1] - m) * math.cos(2 * math.pi * t / p) for t in range(1, n + 1))
        s = sum((xs[t - 1] - m) * math.sin(2 * math.pi * t / p) for t in range(1, n + 1))
        frac = 2 * (c * c + s * s) / (n * ss)
        assert abs(r.var_frac - frac) < 1e-3, p


def test_mutual_info_identities(spark, sf_dir):
    """MI recomputed from the contingency table; the telescoping
    marginal-entropy identity; 0 <= MI <= min(H); NMI consistent."""
    import math

    cells = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("CAST(floor(extract(HOUR FROM ts) / 6.0e0) AS BIGINT)").alias("hb"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = sum(r.c for r in cells)
    ni: dict = {}
    nj: dict = {}
    for r in cells:
        ni[r.event_type] = ni.get(r.event_type, 0) + r.c
        nj[r.hb] = nj.get(r.hb, 0) + r.c
    mi = sum(
        r.c / n * math.log(r.c * n / (ni[r.event_type] * nj[r.hb]))
        for r in cells
    )
    hx = -sum(v / n * math.log(v / n) for v in ni.values())
    hy = -sum(v / n * math.log(v / n) for v in nj.values())
    out = QUERIES["k_mutual_info"](spark, sf_dir).collect()[0]
    assert out.n_events == n and out.n_cells == len(cells)
    assert abs(out.mi_nats - mi) < 1e-3
    assert abs(out.h_type - hx) < 1e-3 and abs(out.h_hour - hy) < 1e-3
    assert -1e-9 <= out.mi_nats <= min(hx, hy) + 1e-9
    assert abs(out.nmi_sqrt - mi / math.sqrt(hx * hy)) < 1e-3


def test_tail_gpd_matches_numpy_moments(spark, sf_dir):
    """xi/beta/VaR recomputed from the exceedance moments over the
    6dp-pinned P95 threshold."""
    import numpy as np

    v = (
        load(spark, sf_dir, "events")
        .select("value")
        .toPandas()["value"]
        .to_numpy()
    )
    u = round(float(np.percentile(v, 95, method="linear")), 6)
    y = v[v > u] - u
    m = float(y.mean())
    s2 = float(y.var(ddof=1))
    xi = 0.5 * (1 - m * m / s2)
    beta = 0.5 * m * (m * m / s2 + 1)
    var999 = u + beta / xi * ((0.001 * len(v) / len(y)) ** (-xi) - 1)
    r = QUERIES["k_tail_gpd"](spark, sf_dir).collect()[0]
    assert r.n_exceedances == len(y)
    assert abs(r.threshold_u - u) < 1e-9
    assert abs(r.gpd_xi - xi) < 1e-3
    assert abs(r.gpd_beta - beta) < 1e-3
    assert abs(r.var_999 - var999) < max(1e-3, abs(var999) * 1e-5)
    assert r.var_999 > r.threshold_u


def test_anova_matches_python_and_brackets_welch(spark, sf_dir):
    """F, eta2, omega2 recomputed from group moments in plain Python;
    Welch's F on the same data must be in the same order of magnitude
    (equal-ish group sizes here)."""
    groups = {
        r.event_type: r.vs
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    r = QUERIES["k_anova_oneway"](spark, sf_dir).collect()[0]
    assert (r.df_between, r.df_within) == (k - 1, n - k)
    assert abs(r.f_stat - f_stat) < max(1e-3, f_stat * 1e-4)
    assert abs(r.eta_squared - ssb / (ssb + ssw)) < 1e-3
    omega = (ssb - (k - 1) * ssw / (n - k)) / (ssb + ssw + ssw / (n - k))
    assert abs(r.omega_squared - omega) < 1e-3
    w = QUERIES["k_welch_anova"](spark, sf_dir).collect()[0]
    assert w.df1 == k - 1
    assert w.df2 > 0 and w.welch_f >= 0


def test_welch_anova_matches_python(spark, sf_dir):
    """Welch's F* and df2 recomputed from the textbook formulas."""
    groups = {
        r.event_type: r.vs
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    k = len(groups)
    w, m = {}, {}
    for et, v in groups.items():
        mu = sum(v) / len(v)
        s2 = sum((x - mu) ** 2 for x in v) / (len(v) - 1)
        w[et] = len(v) / s2
        m[et] = mu
    sw = sum(w.values())
    yhat = sum(w[et] * m[et] for et in w) / sw
    a = sum(w[et] * (m[et] - yhat) ** 2 for et in w) / (k - 1)
    lam = sum(
        (1 - w[et] / sw) ** 2 / (len(groups[et]) - 1) for et in w
    )
    f_w = a / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3 * lam)
    r = QUERIES["k_welch_anova"](spark, sf_dir).collect()[0]
    assert abs(r.welch_f - f_w) < max(1e-3, f_w * 1e-4)
    assert abs(r.df2 - df2) < max(1e-2, df2 * 1e-4)


def test_icc_matches_python_recompute(spark, sf_dir):
    """ICC(1), MSB/MSW, k0 recomputed from the one-way ANOVA identities
    on the (day, type) count table."""
    rows = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r.day, []).append(float(r.c))
    groups = [v for v in by_day.values() if len(v) >= 2]
    j = len(groups)
    n = sum(len(v) for v in groups)
    grand = sum(sum(v) for v in groups) / n
    msb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups) / (j - 1)
    msw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups
    ) / (n - j)
    k0 = (n - sum(len(v) ** 2 for v in groups) / n) / (j - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    r = QUERIES["k_icc_oneway"](spark, sf_dir).collect()[0]
    assert r.n_days == j
    assert abs(r.ms_between - msb) < max(1e-3, msb * 1e-5)
    assert abs(r.ms_within - msw) < max(1e-3, msw * 1e-5)
    assert abs(r.mean_raters_k0 - k0) < 1e-3
    assert abs(r.icc1 - icc) < 1e-3


def test_pythagorean_means_ordering_and_values(spark, sf_dir):
    """AM >= GM >= HM on every type, and GM matches the log-domain
    recompute."""
    import math

    groups = {
        r.event_type: r.vs
        for r in load(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vs"))
        .collect()
    }
    rows = {r.event_type: r for r in QUERIES["d_agg_geomean"](spark, sf_dir).collect()}
    for et, v in groups.items():
        r = rows[et]
        assert r.n == len(v)
        gm = math.exp(sum(math.log(x) for x in v) / len(v))
        hm = len(v) / sum(1 / x for x in v)
        assert abs(r.geo_mean - gm) < max(1e-3, gm * 1e-5)
        assert abs(r.harm_mean - hm) < max(1e-3, hm * 1e-5)
        assert r.arith_mean >= r.geo_mean >= r.harm_mean


def test_vocab_overlap_matches_python_sets(spark, sf_dir):
    """Jaccard/containment recomputed from Python token sets for every
    source pair; symmetric coverage (each unordered pair once)."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("source", F.lower(F.col("text")).alias("t"))
        .collect()
    )
    vocab: dict = {}
    for r in docs:
        vocab.setdefault(r.source, set()).update(
            w for w in r.t.split(" ") if w
        )
    rows = QUERIES["k_vocab_overlap"](spark, sf_dir).collect()
    srcs = sorted(vocab)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = vocab[r.source_a], vocab[r.source_b]
        inter = len(a & b)
        assert r.source_a < r.source_b
        assert (r.vocab_a, r.vocab_b, r.n_common) == (len(a), len(b), inter)
        assert abs(r.jaccard - inter / len(a | b)) < 1e-3
        assert abs(r.containment_min - inter / min(len(a), len(b))) < 1e-3


def test_eval_bleu_rouge_match_python_recompute(spark, sf_dir):
    """r13 eval keys: pairing, clipped-gram matches, BLEU-2 and ROUGE-N
    recomputed in plain Python from the same tokenize convention."""
    import math
    from collections import Counter

    docs = (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id", "text")
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    pairs = []
    for _, g in docs.groupby("source"):
        rows = list(g.itertuples())
        for i in range(0, len(rows) - 1, 2):
            tok = lambda r: [t for t in r.text.lower().split(" ") if t]
            pairs.append((tok(rows[i]), tok(rows[i + 1])))

    def grams(a, n):
        return Counter(
            " ".join(a[i : i + n]) for i in range(len(a) - n + 1)
        )

    m = {1: 0, 2: 0}
    c_tot = {1: 0, 2: 0}
    r_tot = {1: 0, 2: 0}
    for ca, ra in pairs:
        for n in (1, 2):
            cg, rg = grams(ca, n), grams(ra, n)
            m[n] += sum(min(c, rg[g]) for g, c in cg.items())
            c_tot[n] += sum(cg.values())
            r_tot[n] += sum(rg.values())

    b = QUERIES["k_eval_bleu"](spark, sf_dir).collect()[0]
    assert b.n_pairs == len(pairs)
    assert (b.match_1, b.match_2) == (m[1], m[2])
    assert (b.cand_tokens, b.ref_tokens) == (c_tot[1], r_tot[1])
    assert b.cand_bigrams == c_tot[2]
    p1, p2 = m[1] / c_tot[1], m[2] / c_tot[2]
    bp = 1.0 if c_tot[1] >= r_tot[1] else math.exp(1 - r_tot[1] / c_tot[1])
    assert abs(b.p1 - p1) < 1e-5 and abs(b.p2 - p2) < 1e-5
    assert abs(b.brevity_penalty - bp) < 1e-5
    assert abs(b.bleu_2 - bp * math.sqrt(p1 * p2)) < 1e-3
    assert 0 <= b.bleu_2 <= 1

    rough = {r.ngram_n: r for r in QUERIES["k_eval_rouge_n"](spark, sf_dir).collect()}
    for n in (1, 2):
        r = rough[n]
        assert (r.n_matched, r.cand_grams, r.ref_grams) == (m[n], c_tot[n], r_tot[n])
        prec, rec = m[n] / c_tot[n], m[n] / r_tot[n]
        assert abs(r.rouge_precision - prec) < 1e-5
        assert abs(r.rouge_recall - rec) < 1e-5
        assert abs(r.rouge_f1 - 2 * m[n] / (c_tot[n] + r_tot[n])) < 1e-5


def test_eval_distinct_n_matches_python_recompute(spark, sf_dir):
    """distinct-n per source: exact integer totals and ppm floors."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("source", "text")
        .toPandas()
    )
    got = {
        (r.source, r.ngram_n): r
        for r in QUERIES["k_eval_distinct_n"](spark, sf_dir).collect()
    }
    for source, g in docs.groupby("source"):
        uni, bi = set(), set()
        t1 = t2 = 0
        for text in g["text"]:
            a = [t for t in text.lower().split(" ") if t]
            uni.update(a)
            t1 += len(a)
            bgs = [f"{a[i]} {a[i+1]}" for i in range(len(a) - 1)]
            bi.update(bgs)
            t2 += len(bgs)
        for n, d, t in ((1, uni, t1), (2, bi, t2)):
            r = got[(source, n)]
            assert (r.distinct_grams, r.total_grams) == (len(d), t)
            assert r.distinct_ppm == len(d) * 1000000 // t


def test_like_any_matches_dataframe_recount(spark, sf_dir):
    """q_like_any: the LIKE ANY/ALL dialect forms against a DataFrame-API
    recount with explicit boolean algebra."""
    part = load(spark, sf_dir, "part")
    exp = {
        r.p_brand: r
        for r in part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(
                (
                    F.col("p_type").endswith("BRASS")
                    | F.col("p_type").endswith("COPPER")
                ).cast("long")
            ).alias("n_like_any"),
            F.sum(
                (
                    F.col("p_type").startswith("PROMO")
                    & F.col("p_type").endswith("TIN")
                ).cast("long")
            ).alias("n_like_all"),
            F.sum(
                (
                    ~(
                        F.col("p_name").contains("green")
                        | F.col("p_name").contains("blue")
                    )
                ).cast("long")
            ).alias("n_like_neither"),
        )
        .collect()
    }
    for r in QUERIES["q_like_any"](spark, sf_dir).collect():
        e = exp[r.p_brand]
        assert (r.n_parts, r.n_like_any, r.n_like_all, r.n_like_neither) == (
            e.n_parts,
            e.n_like_any,
            e.n_like_all,
            e.n_like_neither,
        )


def test_sql_udtf_matches_inline_subquery(spark, sf_dir):
    """q_sql_udtf: the catalog table-function expansion equals the inline
    correlated aggregate, cutoff by cutoff."""
    rows = QUERIES["q_sql_udtf"](spark, sf_dir).collect()
    events = load(spark, sf_dir, "events")
    for cut in (100.0, 250.0):
        exp = {
            r.event_type: r
            for r in events.filter(F.col("value") > cut)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .collect()
        }
        got = [r for r in rows if r.cut == cut]
        assert len(got) == len(exp)
        for r in got:
            assert r.n == exp[r.event_type].n
            assert abs(r.sum_value - exp[r.event_type].sum_value) < 1e-6


def test_eval_chrf_matches_python_recompute(spark, sf_dir):
    """k_eval_chrf: whitespace-stripped char-gram clipping, per-n P/R and
    the beta=2 F recomputed in plain Python from the same pairing."""
    from collections import Counter

    docs = (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id", "text")
        .toPandas()
        .sort_values(["source", "doc_id"])
    )
    pairs = []
    for _, g in docs.groupby("source"):
        rows = list(g.itertuples())
        for i in range(0, len(rows) - 1, 2):
            clean = lambda r: r.text.lower().replace(" ", "")
            pairs.append((clean(rows[i]), clean(rows[i + 1])))

    def grams(s, n):
        return Counter(s[i : i + n] for i in range(len(s) - n + 1))

    m = {1: 0, 2: 0, 3: 0}
    c_tot = {1: 0, 2: 0, 3: 0}
    r_tot = {1: 0, 2: 0, 3: 0}
    for cs, rs in pairs:
        for n in (1, 2, 3):
            cg, rg = grams(cs, n), grams(rs, n)
            m[n] += sum(min(c, rg[g]) for g, c in cg.items())
            c_tot[n] += max(len(cs) - n + 1, 0)
            r_tot[n] += max(len(rs) - n + 1, 0)

    got = {r.ngram_n: r for r in QUERIES["k_eval_chrf"](spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3}
    for n in (1, 2, 3):
        r = got[n]
        assert (r.n_matched, r.cand_grams, r.ref_grams) == (
            m[n], c_tot[n], r_tot[n],
        )
        p, rc = m[n] / c_tot[n], m[n] / r_tot[n]
        assert abs(r.chrf_precision - p) < 1e-5
        assert abs(r.chrf_recall - rc) < 1e-5
        f = 5 * p * rc / (4 * p + rc) if p + rc else 0.0
        assert abs(r.chrf2 - f) < 1e-5
        assert 0 <= r.chrf2 <= 1
    # char unigram recall floors the pair-similarity family: every longer
    # gram match is built from matched chars
    assert got[1].n_matched >= got[2].n_matched >= got[3].n_matched
