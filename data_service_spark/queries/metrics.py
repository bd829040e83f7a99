"""Model/retrieval evaluation metrics (SURVEY.md §2.O continuation).

A curation stack is steered by offline metrics: a classifier gate needs its
ROC AUC and calibration audited before its threshold is trusted; a retrieval
leg (BM25, dense) needs ranking quality (NDCG, MRR) tracked per release.
These operators compute those metrics ENGINE-SIDE over the registered
pipelines they evaluate (composed as plans, not re-derived), so the same
audit runs unchanged on a 100 TB corpus.

Determinism contract: every metric reduces through exact integer counts and
rank sums wherever possible (AUC via the Mann-Whitney tie-averaged rank-sum
identity over the logreg's integer-quantized scores); floats appear only in
final single-division steps, rounded per SURVEY.md §7.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.io import load
from data_service_spark.registry import ORACLES as _REG_ORACLES
from data_service_spark.registry import register

# --------------------------------------------------- ROC AUC (rank-sum) ----


@register(
    "k_eval_auc",
    oracle=f"""
    WITH scored AS ({_REG_ORACLES.get("k_quality_logreg", "SELECT 1")}),
    lab AS (
      SELECT s.doc_id, s.score_q,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
      FROM scored s JOIN documents d USING (doc_id)
    ), grp AS (
      SELECT score_q, count(*) AS n_tot, sum(y) AS n_pos
      FROM lab GROUP BY score_q
    ), ranked AS (
      SELECT score_q, n_tot, n_pos,
             coalesce(sum(n_tot) OVER (ORDER BY score_q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (n_tot + 1) / 2.0 AS avg_rank
      FROM grp
    )
    SELECT round((sum(n_pos * avg_rank)
                  - sum(n_pos) * (sum(n_pos) + 1) / 2.0)
                 / (sum(n_pos) * (sum(n_tot) - sum(n_pos))), 6) AS auc,
           CAST(sum(n_pos) AS BIGINT) AS n_pos,
           CAST(sum(n_tot) - sum(n_pos) AS BIGINT) AS n_neg
    FROM ranked
    """,
)
def k_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the k_quality_logreg score as a predictor of the
    ``lang = 'en'`` label, via the Mann-Whitney rank-sum identity with
    midrank tie handling:

        AUC = (sum of positives' average ranks - P(P+1)/2) / (P * N)

    Computed group-wise over DISTINCT scores: per-score (count, positives),
    one ordered prefix-sum window over the distinct-score table, then a
    1-row reduce. No per-row global sort — the only ordered pass touches
    |distinct scores| rows (≤ 1e6+1 by construction of the integer-quantized
    score), so a 100 TB corpus pays two shuffles (score groupBy, 1-row agg)
    and a bounded window. Exact integer rank sums; the single division
    rounds at 6dp.
    """
    d = load(spark, sf_dir, "documents")
    # Recompute the registered scorer's plan (same fixed weights) and label.
    from data_service_spark.registry import QUERIES

    scored = QUERIES["k_quality_logreg"](spark, sf_dir).select("doc_id", "score_q")
    lab = scored.join(d.select("doc_id", "lang"), "doc_id").select(
        "score_q", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    grp = lab.groupBy("score_q").agg(
        F.count(F.lit(1)).alias("n_tot"), F.sum("y").alias("n_pos")
    )
    w = (
        Window.orderBy("score_q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = grp.select(
        "n_tot",
        "n_pos",
        (
            F.coalesce(F.sum("n_tot").over(w), F.lit(0))
            + (F.col("n_tot") + 1) / 2.0
        ).alias("avg_rank"),
    )
    return ranked.agg(
        F.round(
            (
                F.sum(F.col("n_pos") * F.col("avg_rank"))
                - F.sum("n_pos") * (F.sum("n_pos") + 1) / 2.0
            )
            / (F.sum("n_pos") * (F.sum("n_tot") - F.sum("n_pos"))),
            6,
        ).alias("auc"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        (F.sum("n_tot") - F.sum("n_pos")).cast("long").alias("n_neg"),
    )


# ------------------------------------------------- NDCG@10 + MRR (BM25) ----


@register(
    "k_eval_ndcg",
    oracle=f"""
    WITH scored AS ({_REG_ORACLES.get("k_text_bm25", "SELECT 1")}),
    ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id) AS r
      FROM scored
    ), rel AS (
      SELECT doc_id,
             CAST(list_contains(string_split(text, ' '), 'table') AS INT)
             + CAST(list_contains(string_split(text, ' '), 'hash') AS INT)
             + CAST(list_contains(string_split(text, ' '), 'scan') AS INT) AS rel
      FROM documents
    ), dcg AS (
      SELECT sum(rel / log2(r + 1.0)) AS dcg10
      FROM ranked JOIN rel USING (doc_id) WHERE r <= 10
    ), ideal AS (
      SELECT sum(rel / log2(ir + 1.0)) AS idcg10
      FROM (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS ir
            FROM rel) WHERE ir <= 10
    ), first_full AS (
      SELECT min(r) AS fr FROM ranked JOIN rel USING (doc_id) WHERE rel = 3
    )
    SELECT round(dcg10 / idcg10, 4) AS ndcg10,
           round(coalesce(1.0 / fr, 0.0), 4) AS mrr,
           (SELECT count(*) FROM rel WHERE rel = 3) AS n_full_rel
    FROM dcg CROSS JOIN ideal CROSS JOIN first_full
    """,
)
def k_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking quality of the BM25 leg for its fixed 3-term query: NDCG@10
    against graded relevance rel(doc) = number of distinct query terms the
    document contains (0-3), plus MRR of the first fully-relevant (rel=3)
    document within the scored ranking.

    The evaluated ranking IS the registered ``k_text_bm25`` plan (composed,
    not re-derived); relevance is a zero-shuffle projection over the corpus.
    The ideal-DCG pass needs only the global top-10 by rel — at scale that is
    a TakeOrderedAndProject (per-partition heads), never a full sort. DCG
    sums 10 terms; rounded at 4dp.
    """
    from data_service_spark.registry import QUERIES

    scored = QUERIES["k_text_bm25"](spark, sf_dir)
    wr = Window.orderBy(F.round("bm25", 6).desc(), F.col("doc_id"))
    ranked = scored.select("doc_id", F.row_number().over(wr).alias("r"))

    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    rel = d.select(
        "doc_id",
        (
            F.array_contains(toks, "table").cast("int")
            + F.array_contains(toks, "hash").cast("int")
            + F.array_contains(toks, "scan").cast("int")
        ).alias("rel"),
    )
    dcg = (
        ranked.join(rel, "doc_id")
        .filter(F.col("r") <= 10)
        .agg(F.sum(F.col("rel") / F.log2(F.col("r") + 1.0)).alias("dcg10"))
    )
    wi = Window.orderBy(F.col("rel").desc(), F.col("doc_id"))
    ideal = (
        rel.select("rel", F.row_number().over(wi).alias("ir"))
        .filter(F.col("ir") <= 10)
        .agg(F.sum(F.col("rel") / F.log2(F.col("ir") + 1.0)).alias("idcg10"))
    )
    first_full = (
        ranked.join(rel, "doc_id")
        .filter(F.col("rel") == 3)
        .agg(F.min("r").alias("fr"))
    )
    n_full = rel.filter(F.col("rel") == 3).agg(
        F.count(F.lit(1)).alias("n_full_rel")
    )
    return (
        dcg.crossJoin(ideal)
        .crossJoin(first_full)
        .crossJoin(n_full)
        .select(
            F.round(F.col("dcg10") / F.col("idcg10"), 4).alias("ndcg10"),
            F.round(F.coalesce(1.0 / F.col("fr"), F.lit(0.0)), 4).alias("mrr"),
            "n_full_rel",
        )
    )


# ----------------------------------------------- calibration reliability ----


@register(
    "k_eval_calibration",
    oracle=f"""
    WITH scored AS ({_REG_ORACLES.get("k_quality_logreg", "SELECT 1")}),
    lab AS (
      SELECT least(CAST(floor(s.score_q / 100000.0) AS BIGINT), 9) AS bin,
             s.score_q / 1e6 AS p,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
      FROM scored s JOIN documents d USING (doc_id)
    )
    SELECT bin, count(*) AS n,
           round(avg(p), 6) AS mean_pred,
           round(avg(y * 1.0), 6) AS frac_pos,
           round(abs(avg(p) - avg(y * 1.0)), 6) AS gap
    FROM lab GROUP BY bin
    """,
)
def k_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the quality classifier: decile bins of the
    predicted probability vs. the observed positive rate of the
    ``lang = 'en'`` label, with the per-bin |gap| that a weighted sum turns
    into ECE. The audit that decides whether a gate threshold (0.5) means
    what it claims.

    One groupBy on a 10-value key computed in the scan stage — map-side
    partial aggregation carries ten rows per partition regardless of corpus
    size.
    """
    d = load(spark, sf_dir, "documents")
    from data_service_spark.registry import QUERIES

    scored = QUERIES["k_quality_logreg"](spark, sf_dir).select("doc_id", "score_q")
    lab = scored.join(d.select("doc_id", "lang"), "doc_id").select(
        F.least(F.floor(F.col("score_q") / 100000.0).cast("long"), F.lit(9)).alias(
            "bin"
        ),
        (F.col("score_q") / 1e6).alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    return lab.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("p"), 6).alias("mean_pred"),
        F.round(F.avg(F.col("y") * 1.0), 6).alias("frac_pos"),
        F.round(F.abs(F.avg("p") - F.avg(F.col("y") * 1.0)), 6).alias("gap"),
    )


# ------------------------------------------- regression-metric audit ----


@register(
    "k_eval_regression",
    oracle="""
    WITH base AS (
      SELECT event_type, extract(hour FROM ts) AS hr,
             CAST(date_trunc('day', ts) AS DATE) AS day, value
      FROM events
    ), model AS (
      SELECT event_type, hr, avg(value) AS pred
      FROM base WHERE day < DATE '2024-01-21' GROUP BY 1, 2
    ), test AS (
      SELECT b.event_type, b.value, m.pred
      FROM base b JOIN model m USING (event_type, hr)
      WHERE b.day >= DATE '2024-01-21'
    ), stats AS (
      SELECT event_type, count(*) AS n,
             sum((value - pred) * (value - pred)) AS sse,
             sum(abs(value - pred)) AS sae,
             sum(value) AS sv, sum(value * value) AS svv
      FROM test GROUP BY 1
    )
    SELECT event_type, n,
           round(sqrt(sse / n), 4) AS rmse,
           round(sae / n, 4) AS mae,
           round(1.0 - sse / (svv - sv * sv / n), 4) AS r2
    FROM stats
    """,
)
def k_eval_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-metric audit (RMSE / MAE / R²) of a seasonal-baseline
    predictor: per (event type, hour-of-day) mean value fitted on days
    1-20, scored on days 21+ — the train/test temporal split every
    forecasting or value-model deployment reports before shipping.

    The model is a dimension-sized aggregate (type × 24 rows) broadcast
    back onto the test scan; metrics are one groupBy over sum-of-squares
    partials, so the corpus crosses exactly one shuffle each for fit and
    score. R² is computed from the same Σv/Σv² partials — no second pass
    for the mean.
    """
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
        "value",
    )
    cut = F.lit("2024-01-21").cast("date")
    model = (
        base.filter(F.col("day") < cut)
        .groupBy("event_type", "hr")
        .agg(F.avg("value").alias("pred"))
    )
    test = base.filter(F.col("day") >= cut).join(
        F.broadcast(model), ["event_type", "hr"]
    )
    err = F.col("value") - F.col("pred")
    stats = test.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(err * err).alias("sse"),
        F.sum(F.abs(err)).alias("sae"),
        F.sum("value").alias("sv"),
        F.sum(F.col("value") * F.col("value")).alias("svv"),
    )
    return stats.select(
        "event_type",
        "n",
        F.round(F.sqrt(F.col("sse") / F.col("n")), 4).alias("rmse"),
        F.round(F.col("sae") / F.col("n"), 4).alias("mae"),
        F.round(
            1.0
            - F.col("sse")
            / (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")),
            4,
        ).alias("r2"),
    )
