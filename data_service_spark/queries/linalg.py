"""§2.K extensions — distributed linear algebra over the embeddings table.

The matrix workloads an embedding-curation pipeline runs that aren't
per-pair similarity (llm.py already covers those): the d×d Gram matrix
(the reduce step behind PCA / whitening / covariance shift detection),
the PCA projection itself, contrastive triplet mining (hardest positive /
hardest negative per anchor), and inverse-frequency class weights.

Scale design (100 TB): the Gram matrix is the canonical "big N, tiny d"
reduction — each task folds its partition of row-vectors into a d×d
partial with one BLAS GEMM (numpy, Arrow-batched), so the shuffle moves
O(parts · d²) doubles, independent of N. The eigendecomposition that
follows is O(d³) on a d×d matrix — driver-side by design (d=64 here;
even d=4096 is a laptop job), NOT a distributed bottleneck. Projection
back onto the top components is a broadcast of 2·d literals folded in
Catalyst. Nothing here collects O(N) data to the driver.

Reference provenance: `/root/reference` was empty at survey time
(SURVEY.md §0); the operator set follows the public embedding-pipeline
canon (truncated SVD whitening, triplet mining, class-balanced weighting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.queries.llm import (
    SIM_PAIRS_GRID_MIN_ROWS,
    _corpus_rows,
    _emb,
    dot,
)
from data_service_spark.registry import register

# ------------------------------------------------------------ gram / PCA ----


def _gram_partials(emb: DataFrame) -> DataFrame:
    """(i, j, partial) rows: one d×d partial XᵀX per Arrow batch, computed
    as a single numpy GEMM. 1-indexed (i, j) so the oracle's DuckDB list
    indexing lines up. The input is repartitioned to a fixed small count —
    the corpus ships as one row group (io.load_parallel notes), and the
    explicit count pins fan-out so the GEMM runs in parallel while the
    reduce stays O(parts · d²)."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["v"].to_numpy())  # (n, d) float64
            g = x.T @ x  # one GEMM per batch
            d = g.shape[0]
            idx = np.arange(1, d + 1)
            yield pd.DataFrame(
                {
                    "i": np.repeat(idx, d),
                    "j": np.tile(idx, d),
                    "partial": g.ravel(),
                }
            )

    # r13 (guide §2.5): spread ONLY when the scan is narrower than the
    # GEMM fan-out. Locally the corpus ships as one row group, so the
    # repartition(16) always fires (unchanged batch boundaries → same
    # 4dp-rounded sums); at scale the parquet scan already yields many
    # splits and the blind repartition would be a full-corpus shuffle of
    # the vectors — the costliest node in the whole query — for nothing.
    src = emb.select("v")
    if src.rdd.getNumPartitions() < 16:
        src = src.repartition(16)
    return src.mapInPandas(
        partials, schema="i int, j int, partial double"
    )


_GRAM_ORACLE = """
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT i.i AS i, j.j AS j, round(sum(v[i.i] * v[j.j]), 4) AS gram
    FROM e, range(1, 65) i(i), range(1, 65) j(j)
    GROUP BY 1, 2
"""


@register("k_embed_gram", oracle=_GRAM_ORACLE)
def k_embed_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix XᵀX of the embedding corpus.

    Map side: one BLAS GEMM per Arrow batch → d² partials; reduce side:
    groupBy (i, j) sum — O(parts · d²) shuffled bytes regardless of N.
    The oracle unnests the same products pairwise; double accumulation
    keeps the 4dp rounding stable across summation orders."""
    g = _gram_partials(_emb(spark, sf_dir))
    return g.groupBy("i", "j").agg(
        F.round(F.sum("partial"), 4).alias("gram")
    )


@register("k_embed_pca_project")  # rows-only: eigenvectors aren't SQL
def k_embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-2 principal axes (truncated
    SVD on the uncentered Gram — the sphere-PCA variant appropriate for
    L2-normalized vectors, FIXTURES.md).

    The Gram reduce is distributed (k_embed_gram); only the d×d matrix
    (64×64 = 4 096 rows, O(1) in N) comes to the driver for the O(d³)
    eigh. Components re-enter the plan as broadcast literals; the
    projection is a Catalyst fold per row — no Python in the per-row path.
    Sign convention: each component's largest-|coordinate| entry is made
    positive, so the output is deterministic across eigh implementations
    up to that canonical form."""
    import numpy as np

    emb = _emb(spark, sf_dir)
    rows = (
        _gram_partials(emb)
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("g"))
        .collect()
    )  # d² = 4096 scalars — O(1) w.r.t. corpus size
    d = max(r["i"] for r in rows)
    g = np.zeros((d, d))
    for r in rows:
        g[r["i"] - 1, r["j"] - 1] = r["g"]
    vals, vecs = np.linalg.eigh(g)
    comps = []
    for k in (d - 1, d - 2):  # top-2 by eigenvalue (eigh sorts ascending)
        c = vecs[:, k]
        if c[np.argmax(np.abs(c))] < 0:
            c = -c
        comps.append(c)

    def lit_vec(c) -> F.Column:
        return F.array(*[F.lit(float(x)) for x in c])

    return emb.select(
        "vec_id",
        "label",
        F.round(dot(F.col("v"), lit_vec(comps[0])), 4).alias("pc1"),
        F.round(dot(F.col("v"), lit_vec(comps[1])), 4).alias("pc2"),
    )


# ------------------------------------------------------- triplet mining ----


@register(
    "k_hard_negatives",
    oracle="""
    WITH a AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS av,
                      label AS alabel
               FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label
               FROM embeddings),
         sims AS (
           SELECT anchor_id, alabel, vec_id, label,
                  list_inner_product(av, cv) AS sim
           FROM a CROSS JOIN c WHERE vec_id <> anchor_id
         ),
         pos AS (
           SELECT anchor_id, vec_id AS pos_id, round(sim, 4) AS pos_sim,
                  row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY round(sim, 6) DESC, vec_id) AS rn
           FROM sims WHERE label = alabel
         ),
         neg AS (
           SELECT anchor_id, vec_id AS neg_id, round(sim, 4) AS neg_sim,
                  row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY round(sim, 6) DESC, vec_id) AS rn
           FROM sims WHERE label <> alabel
         )
    SELECT p.anchor_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim,
           round(p.pos_sim - n.neg_sim, 4) AS margin
    FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
    WHERE p.rn = 1 AND n.rn = 1
    """,
)
def k_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining: per anchor, the hardest positive (most
    similar, same label) and hardest negative (most similar, different
    label), plus the triplet margin.

    Plan shape = k_sim_topk's broadcast-probe scan: the corpus streams
    once past the (broadcast) anchor set, then two per-anchor windows rank
    same-label and cross-label candidates. At 100 TB with all-vectors-as-
    anchors, the cross join becomes the blocked GEMM of sim_pairs or an
    LSH pre-bucket (k_sim_ann); the ranking windows are unchanged."""
    emb = _emb(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("v").alias("av"),
        F.col("label").alias("alabel"),
    )
    sims = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "alabel",
            "vec_id",
            "label",
            dot(F.col("av"), F.col("v")).alias("sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.round("sim", 6).desc(), F.col("vec_id")
    )
    pos = (
        sims.filter(F.col("label") == F.col("alabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("vec_id").alias("pos_id"),
            F.round("sim", 4).alias("pos_sim"),
        )
    )
    neg = (
        sims.filter(F.col("label") != F.col("alabel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            F.round("sim", 4).alias("neg_sim"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "pos_id",
        "pos_sim",
        "neg_id",
        "neg_sim",
        F.round(F.col("pos_sim") - F.col("neg_sim"), 4).alias("margin"),
    )


# -------------------------------------------------------- class weights ----


@register(
    "k_class_weights",
    oracle="""
    WITH tot AS (SELECT count(*) AS n_tot,
                        count(DISTINCT label) AS n_cls
                 FROM embeddings)
    SELECT label, count(*) AS n,
           round(n_tot / (n_cls * CAST(count(*) AS DOUBLE)), 6) AS weight
    FROM embeddings, tot
    GROUP BY label, n_tot, n_cls
    """,
)
def k_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced' convention:
    n_tot / (n_classes · n_c)) — the lookup table a class-balanced sampler
    or weighted loss joins against. One groupBy plus a broadcast of the
    single-row totals; at 100 TB the per-class counts are the only shuffle
    and the weight table stays dimension-sized."""
    e = _emb(spark, sf_dir)
    tot = e.agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.countDistinct("label").alias("n_cls"),
    )
    return (
        e.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            F.round(
                F.col("n_tot") / (F.col("n_cls") * F.col("n").cast("double")),
                6,
            ).alias("weight"),
        )
    )


# ------------------------------------------------------ outlier scoring ----


@register(
    "k_embed_outliers",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    dims AS (SELECT vec_id, i.i AS i, v[i.i] AS x FROM e, range(1, 65) i(i)),
    stats AS (SELECT i, avg(x) AS mu, var_samp(x) AS vr FROM dims GROUP BY 1),
    dist AS (
      SELECT vec_id, sum((x - mu) * (x - mu) / vr) AS d
      FROM dims JOIN stats USING (i) GROUP BY 1
    ), ranked AS (
      SELECT e.vec_id, e.label, dist.d,
             row_number() OVER (ORDER BY round(dist.d, 6) DESC, e.vec_id) AS rn
      FROM dist JOIN e USING (vec_id)
    )
    SELECT vec_id, label, round(d, 4) AS m_dist
    FROM ranked WHERE rn <= 20
    """,
)
def k_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier detection: top-20 vectors by diagonal-Mahalanobis
    distance (per-dimension standardized Euclidean) from the corpus
    centroid — the cheap anomaly screen a pipeline runs on a new embedding
    batch before it pollutes dedup/clustering state (full-covariance
    Mahalanobis plugs in the k_embed_gram matrix when dimensions correlate).

    Per-dim mean/variance come from one posexplode + groupBy(i) — a
    64-group aggregate that partial-aggregates map-side. The stats then
    COLLAPSE back to two broadcast array literals (one row), so the
    distance is a zip_with/aggregate fold per vector in codegen — the
    corpus is scanned exactly twice (stats pass, score pass) and the
    explode never feeds a per-row shuffle."""
    emb = _emb(spark, sf_dir)
    dims = emb.select(
        "vec_id", F.posexplode("v").alias("i0", "x")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    stats = dims.groupBy("i").agg(
        F.avg("x").alias("mu"), F.var_samp("x").alias("vr")
    )
    arrs = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "mu"))),
            lambda s: s["mu"],
        ).alias("mu_arr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "vr"))),
            lambda s: s["vr"],
        ).alias("vr_arr"),
    )
    diff2 = F.zip_with(
        F.col("v"), F.col("mu_arr"), lambda x, m: (x - m) * (x - m)
    )
    d = F.aggregate(
        F.zip_with(diff2, F.col("vr_arr"), lambda a, b: a / b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = emb.crossJoin(F.broadcast(arrs)).select(
        "vec_id", "label", d.alias("d")
    )
    w = Window.orderBy(F.round("d", 6).desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("vec_id", "label", F.round("d", 4).alias("m_dist"))
    )


# ----------------------------------------------------- label-noise audit ----


@register(
    "k_label_noise_knn",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    sims AS (
      SELECT a.vec_id, a.label,
             b.label AS nlabel,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_inner_product(a.v, b.v), 6) DESC, b.vec_id
             ) AS rn
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, label,
           CAST(sum(CASE WHEN nlabel <> label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_diff,
           round(sum(CASE WHEN nlabel <> label THEN 1 ELSE 0 END) / 5.0, 4)
             AS noise_frac
    FROM sims WHERE rn <= 5
    GROUP BY vec_id, label
    """,
)
def k_label_noise_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: for every vector, the fraction of its 5 nearest
    neighbors (cosine) carrying a DIFFERENT label — the confident-learning
    screen that flags probable mislabels before supervised training
    (noise_frac 1.0 = every neighbor disagrees).

    This is the all-rows kNN join, done the way it scales: row blocks ×
    (broadcast) corpus matrix, one BLAS GEMM per block, and — unlike the
    thresholded sim_pairs — each block emits only its rows' top-5
    (O(N·k) Arrow traffic, never the N² similarity matrix). Neighbor
    ranking uses round(sim, 6) desc + vec_id asc, the registry-wide
    convention that keeps float last-ulp noise from flipping ranks
    against the oracle. At 100 TB the corpus side shards into column
    blocks with a per-shard top-k merge (same GEMM inner loop)."""
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    vec = F.struct("vec_id", "v", "label")
    # Flat primitive payloads across Arrow (ids/labels + flattened
    # matrix, all split from ONE collect_list so orders agree) — r13,
    # same rationale as _lof_knn_broadcast (guide §4).
    a_blocks = (
        emb.withColumn("blk", F.pmod("vec_id", F.lit(32)))
        .groupBy("blk")
        .agg(F.collect_list(vec).alias("al"))
        .select(
            F.expr("transform(al, x -> x.vec_id)").alias("aids"),
            F.expr("transform(al, x -> x.label)").alias("alab"),
            F.expr("flatten(transform(al, x -> x.v))").alias("aflat"),
        )
    )
    corpus = emb.agg(F.collect_list(vec).alias("cl")).select(
        F.expr("transform(cl, x -> x.vec_id)").alias("cids"),
        F.expr("transform(cl, x -> x.label)").alias("clab"),
        F.expr("flatten(transform(cl, x -> x.v))").alias("cflat"),
    )

    def knn(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                aids = np.asarray(row["aids"], dtype=np.int64)
                alab = np.asarray(row["alab"], dtype=np.int64)
                amat = np.asarray(row["aflat"], dtype=np.float64).reshape(
                    len(aids), -1
                )
                cids = np.asarray(row["cids"], dtype=np.int64)
                clab = np.asarray(row["clab"], dtype=np.int64)
                cmat = np.asarray(row["cflat"], dtype=np.float64).reshape(
                    len(cids), -1
                )
                sims = amat @ cmat.T
                out_id, out_lab, out_n = [], [], []
                for r_i in range(len(aids)):
                    s = sims[r_i]
                    mask = cids != aids[r_i]
                    order = np.lexsort(
                        (cids[mask], -np.round(s[mask], 6))
                    )[:5]
                    n_diff = int((clab[mask][order] != alab[r_i]).sum())
                    out_id.append(aids[r_i])
                    out_lab.append(alab[r_i])
                    out_n.append(n_diff)
                yield pd.DataFrame(
                    {"vec_id": out_id, "label": out_lab, "n_diff": out_n}
                )

    scored = a_blocks.crossJoin(F.broadcast(corpus)).mapInPandas(
        knn, "vec_id long, label int, n_diff long"
    )
    return scored.select(
        "vec_id",
        "label",
        "n_diff",
        F.round(F.col("n_diff") / 5.0, 4).alias("noise_frac"),
    )


@register(
    "k_embed_norm_audit",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))) AS nrm
      FROM embeddings
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm,
           round(avg(nrm), 4) AS avg_norm,
           CAST(count(*) FILTER (WHERE abs(nrm - 1.0) > 0.01) AS BIGINT)
             AS n_off_unit
    FROM e
    """,
)
def k_embed_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm hygiene audit: L2-norm distribution plus the count
    of vectors off the unit sphere by >1% — the first check before any
    cosine retrieval (un-normalized rows silently turn cosine ranking into
    magnitude ranking; a mixed-norm table means two encoder versions got
    interleaved). One zero-shuffle projection and a 1-row aggregate —
    scan-rate at any corpus size.
    """
    emb = _emb(spark, sf_dir)
    nrm = F.sqrt(
        F.aggregate(
            F.col("v"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    e = emb.select(nrm.alias("nrm"))
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
        F.sum(
            F.when(F.abs(F.col("nrm") - 1.0) > 0.01, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_off_unit"),
    )


# ------------------------------------------------- whitening audit ----


@register(
    "k_embed_standardize",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cell AS (
      SELECT d.dim, CAST(round(e.v[d.dim] * 1000000) AS BIGINT) AS x
      FROM e CROSS JOIN range(1, 65) d(dim)
    ), mom AS (
      SELECT dim, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2,
             max(abs(x)) AS mx
      FROM cell GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
           CAST(floor(s1 * 1.0 / n) AS BIGINT) AS mean_micro,
           CAST(floor(sqrt((s2 - s1 * 1.0 * s1 / n) / (n - 1))) AS BIGINT)
             AS sd_micro,
           CAST(floor(abs(mx - s1 * 1.0 / n)
                      / sqrt((s2 - s1 * 1.0 * s1 / n) / (n - 1)) * 100)
             AS BIGINT) AS max_absz_centi
    FROM mom
    """,
)
def k_embed_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION whitening audit of the embedding matrix: mean, SD and
    the worst standardized deviation per coordinate — the diagnostic run
    before cosine/L2 retrieval to catch un-centered or scale-skewed
    dimensions (one hot dimension dominates every distance; the fix is
    (x−μ)/σ per column, whose parameters are exactly these two numbers).
    Per-vector norms are ``k_embed_norm_audit``'s view; this is the
    transposed, per-column one. Cell values quantize to integer micros
    before the power sums, so the moments are accumulation-order-proof —
    and x² ≤ 10¹² per cell keeps Σx² inside int64 to ~9×10⁶ vectors per
    dimension (the ``k_embed_isotropy`` overflow class; past that,
    re-quantize cells to 1e-3, which reaches ~9×10¹² vectors).

    Scale shape: the explode is 64 rows per vector but aggregates
    map-side to 64 groups — the shuffle carries 64×partials, independent
    of N (same contract as the Gram reduce above).
    """
    emb = _emb(spark, sf_dir)
    dims = F.explode(F.sequence(F.lit(1), F.lit(64))).alias("dim")
    cell = emb.select("v", dims).select(
        "dim",
        F.round(F.element_at("v", F.col("dim")) * 1000000)
        .cast("long")
        .alias("x"),
    )
    mom = cell.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.max(F.abs("x")).alias("mx"),
    )
    mean = F.col("s1") * 1.0 / F.col("n")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return mom.select(
        F.col("dim").cast("long"),
        F.col("n").cast("long"),
        F.floor(mean).cast("long").alias("mean_micro"),
        F.floor(sd).cast("long").alias("sd_micro"),
        F.floor(F.abs(F.col("mx") - mean) / sd * 100)
        .cast("long")
        .alias("max_absz_centi"),
    )


# ------------------------------------------------- group MMD audit ----


@register(
    "k_embed_mmd",
    oracle="""
    WITH e AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cell AS (
      SELECT label, d.dim, CAST(round(e.v[d.dim] * 1000000) AS BIGINT) AS x
      FROM e CROSS JOIN range(1, 65) d(dim)
    ), g AS (
      SELECT label, dim, count(*) AS n, sum(x) AS s FROM cell GROUP BY 1, 2
    ), md AS (
      SELECT a.label AS label_a, b.label AS label_b,
             a.n AS n_a, b.n AS n_b,
             CAST(floor(a.s * 1.0 / a.n - b.s * 1.0 / b.n) AS BIGINT) AS md
      FROM g a JOIN g b ON a.dim = b.dim AND a.label < b.label
    )
    SELECT CAST(label_a AS BIGINT) AS label_a,
           CAST(label_b AS BIGINT) AS label_b,
           CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(sum(md * md) AS BIGINT) AS mmd2_micro2
    FROM md GROUP BY label_a, label_b
    """,
)
def k_embed_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel maximum-mean-discrepancy audit between every pair of
    embedding label groups: MMD² = ‖μ_a − μ_b‖², the two-sample test
    statistic for "do these two slices live in the same region of
    embedding space" — the distribution-shift check run before mixing a
    new source into training or trusting a classifier across domains
    (near-zero → indistinguishable means; large → covariate shift).
    Coordinates quantize to integer micros, per-dim mean differences
    floor-quantize to integer micros, and MMD² is an exact BIGINT sum of
    their squares — order-proof under any partial-aggregation schedule.
    int64 overflow bound: |md| ≤ 2e6 micros for unit-normish vectors →
    md² ≤ 4e12, and the sum spans d = 64 dims, ≤ 2.6e14 ≪ 2^63 — the
    bound is dimension-, not corpus-, sized, so it never tightens with
    data growth (coarsen the micro grid only if d·max(md)² nears 9.2e18).

    Scale shape: the 64×|labels| moment table is a map-side reduce
    (shuffle independent of N, the ``k_embed_standardize`` contract);
    the pair join runs over that tiny spine, never the vectors.
    """
    emb = _emb(spark, sf_dir)
    dims = F.explode(F.sequence(F.lit(1), F.lit(64))).alias("dim")
    g = (
        emb.select("label", "v", dims)
        .select(
            "label",
            "dim",
            F.round(F.element_at("v", F.col("dim")) * 1000000)
            .cast("long")
            .alias("x"),
        )
        .groupBy("label", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    )
    a = g.select(
        F.col("label").alias("label_a"), "dim",
        F.col("n").alias("n_a"), F.col("s").alias("s_a"),
    )
    b = g.select(
        F.col("label").alias("label_b"), F.col("dim").alias("dim_b"),
        F.col("n").alias("n_b"), F.col("s").alias("s_b"),
    )
    md = (
        a.join(b, (a.dim == b.dim_b) & (a.label_a < b.label_b))
        .select(
            "label_a", "label_b", "n_a", "n_b",
            F.floor(
                F.col("s_a") * 1.0 / F.col("n_a")
                - F.col("s_b") * 1.0 / F.col("n_b")
            ).cast("long").alias("md"),
        )
    )
    return md.groupBy("label_a", "label_b").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum(F.col("md") * F.col("md")).cast("long").alias("mmd2_micro2"),
    ).select(
        F.col("label_a").cast("long"),
        F.col("label_b").cast("long"),
        "n_a", "n_b", "mmd2_micro2",
    )


@register(
    "k_embed_isotropy",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
      FROM embeddings
    ), dims AS (
      SELECT i,
             CAST(floor(CAST(sum(q[i]) AS DOUBLE) / 1000) AS BIGINT) AS s3_i
      FROM e CROSS JOIN generate_series(1, 64) t(i)
      GROUP BY i
    ), ssq AS (SELECT sum(s3_i * s3_i) AS norm2_sum3 FROM dims),
    vn AS (
      SELECT sum(list_sum(list_transform(q, x -> x * x))) AS sum_norm2,
             count(*) AS n
      FROM e
    )
    SELECT CAST(vn.n AS BIGINT) AS n_vecs, CAST(64 AS INT) AS dim,
           CAST(floor((CAST(ssq.norm2_sum3 AS DOUBLE) * 1000000
                       - CAST(vn.sum_norm2 AS DOUBLE))
                      / (CAST(vn.n AS DOUBLE) * (vn.n - 1)) / 1000000)
             AS BIGINT) AS mean_pairwise_cos_ppm,
           CAST(floor(sqrt(CAST(ssq.norm2_sum3 AS DOUBLE)) * 1000 / vn.n)
             AS BIGINT) AS mean_vector_norm_micro
    FROM ssq CROSS JOIN vn
    """,
)
def k_embed_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy audit (Mu & Viswanath 2018 "All-but-the-top"):
    the mean pairwise cosine across ALL vector pairs and the norm of the
    mean vector — computed WITHOUT a pair join via the telescoping
    identity Σ_{i≠j} vᵢ·vⱼ = ‖Σv‖² − Σ‖v‖², so the O(n²) statistic costs
    one pass. A large mean cosine / mean-vector norm means the space has
    a dominant common direction: cosine similarities are inflated
    everywhere, and ANN/dedup thresholds tuned on it drift — the audit
    to run BEFORE ``k_sim_*`` thresholds are trusted, and the signal
    that the mean-centering step of ``k_embed_standardize`` is needed.

    Components floor-quantize to exact 1e-6 integers, so the per-dim
    sums and both norm aggregates are BIGINT (order-proof); only the
    two final ratios are floating (ONE scalar expression on identical
    BIGINT inputs — no accumulation, so bit-identical cross-engine).
    Overflow bound: the per-dim sums re-quantize to a 1e-3 grid BEFORE
    squaring (s3_i = floor(s_i/1000)), so Σ s3_i² ≤ 64·(n·1000)² stays
    inside int64 for corpora to ~380k vectors even in the worst case of
    a fully-aligned corpus (mean cos = 1.0) — squaring the raw 1e-6
    sums would wrap silently past ~10-20k vectors (non-ANSI Spark)
    while DuckDB errors. ``sum_norm2`` (Σ‖v‖² at 1e-12, = n·1e12 for
    unit vectors) bounds at ~9M vectors; beyond that, drop its
    accumulation to a 1e-4 component grid.
    Scale shape: one explode over the 64-dim spine (map-side partial
    sums) + one per-vector array fold — no pair join, no shuffle
    beyond the 64-row reduce."""
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr(
            "transform(v, x -> CAST(floor(x * 1000000) AS BIGINT))"
        ).alias("q"),
    )
    dims = (
        e.select(
            F.explode(F.sequence(F.lit(1), F.lit(64))).alias("i"), "q"
        )
        .select("i", F.expr("q[i - 1]").alias("qi"))
        .groupBy("i")
        .agg(
            F.floor(F.sum("qi").cast("double") / 1000)
            .cast("long")
            .alias("s3_i")
        )
    )
    ssq = dims.agg(F.sum(F.col("s3_i") * F.col("s3_i")).alias("norm2_sum3"))
    vn = e.agg(
        F.sum(
            F.expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x * x)")
        ).alias("sum_norm2"),
        F.count(F.lit(1)).alias("n"),
    )
    return ssq.crossJoin(vn).select(
        F.col("n").cast("long").alias("n_vecs"),
        F.lit(64).cast("int").alias("dim"),
        F.floor(
            (
                F.col("norm2_sum3").cast("double") * 1000000
                - F.col("sum_norm2").cast("double")
            )
            / (F.col("n").cast("double") * (F.col("n") - 1))
            / 1000000
        )
        .cast("long")
        .alias("mean_pairwise_cos_ppm"),
        F.floor(
            F.sqrt(F.col("norm2_sum3").cast("double")) * 1000 / F.col("n")
        )
        .cast("long")
        .alias("mean_vector_norm_micro"),
    )


def _knn_tie_complete(aids, amat, cids, cmat, k):
    """One GEMM block of the LOF kNN: cosine distances quantized to the
    1e-6 grid IN the kernel, returning (p, o, dq) for every candidate
    with dq ≤ the k-th smallest dq of its row — tie-COMPLETE on the
    quantized grid, so the engine-side (dq, o) ranking can never lose a
    true top-k member to arbitrary float tie-breaking (ADVICE r05). Self
    pairs are excluded outright."""
    import numpy as np
    import pandas as pd

    d = 1.0 - amat @ cmat.T
    self_mask = aids[:, None] == cids[None, :]
    dq = np.floor(d * 1e6).astype(np.int64)
    dq[self_mask] = np.int64(2) ** 62  # never selected, never emitted
    kk = min(k - 1, dq.shape[1] - 1)
    kth = np.partition(dq, kk, axis=1)[:, kk]
    mask = (dq <= kth[:, None]) & ~self_mask
    i, j = np.where(mask)
    return pd.DataFrame({"p": aids[i], "o": cids[j], "dq": dq[i, j]})


def _lof_knn_broadcast(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Broadcast-corpus regime of the LOF kNN (the sim_pairs physical
    strategy): one BLAS GEMM per row-block against the broadcast corpus,
    emitting the tie-complete per-point candidate superset.

    The block and corpus payloads cross the Arrow boundary as FLAT
    primitive arrays (ids + flattened matrix, split from one
    collect_list so the orders cannot diverge) — r13: the former
    struct-list rows cost every task a Python loop over 2000 dicts to
    rebuild the matrices (guide §4: pass only what the kernel needs, in
    the shape Arrow moves for free); np.asarray on a primitive list is
    one memcpy."""
    import numpy as np
    import pandas as pd  # noqa: F401 — Arrow batch schema

    emb = _emb(spark, sf_dir).select("vec_id", "v")
    vec = F.struct("vec_id", "v")
    blocks = (
        emb.withColumn("blk", F.pmod("vec_id", F.lit(32)))
        .groupBy("blk")
        .agg(F.collect_list(vec).alias("al"))
        .select(
            F.expr("transform(al, x -> x.vec_id)").alias("aids"),
            F.expr("flatten(transform(al, x -> x.v))").alias("aflat"),
        )
    )
    corpus = emb.agg(F.collect_list(vec).alias("cl")).select(
        F.expr("transform(cl, x -> x.vec_id)").alias("cids"),
        F.expr("flatten(transform(cl, x -> x.v))").alias("cflat"),
    )

    def knn_gemm(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                aids = np.asarray(row["aids"], dtype=np.int64)
                cids = np.asarray(row["cids"], dtype=np.int64)
                amat = np.asarray(row["aflat"], dtype=np.float64).reshape(
                    len(aids), -1
                )
                cmat = np.asarray(row["cflat"], dtype=np.float64).reshape(
                    len(cids), -1
                )
                yield _knn_tie_complete(aids, amat, cids, cmat, k)

    return blocks.crossJoin(F.broadcast(corpus)).mapInPandas(
        knn_gemm, "p long, o long, dq long"
    )


def lof_knn_grid(
    spark: SparkSession, sf_dir: str, k: int, blocks: int = 8
) -> DataFrame:
    """The 100 TB regime of the LOF kNN: a FULL B×B block grid (kNN needs
    every point to see the whole corpus, so unlike ``sim_pairs_grid``
    there is no triangular halving) where NEITHER side is broadcast,
    collected, or aggregated to a single row. A-role rows of block b
    replicate across the cell row (b, 0..B-1); C-role rows across the
    cell column (0..B-1, b); each cell runs the same tie-complete GEMM
    kernel on ~2n/B vectors. The union of per-cell tie-complete top-k
    supersets contains the global (dq, o) top-k — per-task memory is
    O(n/B·d) regardless of corpus size, and the only shuffle is the grid
    partitioning."""
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir).select("vec_id", "v")
    blocked = emb.withColumn("blk", F.pmod("vec_id", F.lit(blocks)))
    a_rep = blocked.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("bj"),
        F.lit("a").alias("role"),
        "vec_id",
        "v",
    )
    c_rep = blocked.select(
        F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit("c").alias("role"),
        "vec_id",
        "v",
    )

    def knn_cell(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["role"] == "a"]
        c = pdf[pdf["role"] == "c"]
        if a.empty or c.empty:
            return pd.DataFrame(
                {
                    "p": pd.Series(dtype="int64"),
                    "o": pd.Series(dtype="int64"),
                    "dq": pd.Series(dtype="int64"),
                }
            )
        aids = a["vec_id"].to_numpy(dtype=np.int64)
        cids = c["vec_id"].to_numpy(dtype=np.int64)
        amat = np.vstack([np.asarray(x) for x in a["v"]])
        cmat = np.vstack([np.asarray(x) for x in c["v"]])
        return _knn_tie_complete(aids, amat, cids, cmat, k)

    return (
        a_rep.unionByName(c_rep)
        .groupBy("bi", "bj")
        .applyInPandas(knn_cell, "p long, o long, dq long")
    )


@register(
    "k_outlier_lof",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS p, b.vec_id AS o,
             CAST(floor((1.0 - list_inner_product(a.v, b.v))
                        * 1000000) AS BIGINT) AS dq
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT p, o, dq,
             row_number() OVER (PARTITION BY p ORDER BY dq, o) AS rn
      FROM pairs
    ),
    kdist AS (SELECT p AS node, max(dq) AS kd FROM knn
              WHERE rn <= 5 GROUP BY p),
    reach AS (
      SELECT k.p, k.o, greatest(kd_o.kd, k.dq) AS rdist
      FROM knn k JOIN kdist kd_o ON kd_o.node = k.o
      WHERE k.rn <= 5
    ),
    sreach AS (SELECT p, sum(rdist) AS sr FROM reach GROUP BY p),
    lof AS (
      SELECT r.p,
             sum(CAST(sp.sr AS DOUBLE) / so.sr) / 5 AS lof_raw
      FROM reach r
      JOIN sreach sp ON sp.p = r.p
      JOIN sreach so ON so.p = r.o
      GROUP BY r.p
    ),
    ranked AS (
      SELECT p AS vec_id,
             CAST(floor(lof_raw * 1000000) AS BIGINT) AS lof_ppm,
             row_number() OVER (ORDER BY round(lof_raw, 6) DESC, p) AS rnk
      FROM lof
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, lof_ppm,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 20
    """,
)
def k_outlier_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000) at k=5 over cosine
    distance — the DENSITY-RELATIVE outlier score that catches points
    isolated from their local neighborhood even when global statistics
    look normal (``k_embed_outliers``' centroid distance misses outliers
    near a dense cluster's edge; LOF ≈ 1 means "as dense as my
    neighbors", ≫ 1 means isolated). Top-20 by score — the triage queue
    an embedding-QA pass reviews.

    Determinism: GEMM distances floor-quantize to 1e-6 integers INSIDE
    the kernel, and each block emits the TIE-COMPLETE candidate set —
    every neighbor whose quantized distance dq ≤ the k-th smallest dq
    (not a fixed top-32 by raw float, whose arbitrary tie selection at
    the 1e-6 boundary could drop the candidate the (dq, id) ranking
    keeps — e.g. exact-duplicate vectors). The engine-side (dq, o)
    row_number is therefore provably the oracle's top-5. k-distances,
    reachability distances and their sums are exact BIGINT; only the
    final lrd ratios are doubles over identical expression trees,
    output floor-ppm with 6dp+id rank tiebreaks.

    Scale shape: like ``sim_pairs``, the kNN extraction dispatches on
    corpus size (parquet-footer row count): below
    ``SIM_PAIRS_GRID_MIN_ROWS`` one BLAS GEMM per row-block with the
    corpus broadcast (a per-pair interpreted dot() was 36.7 s at sf0.1;
    this runs ~4 s); above it, ``lof_knn_grid`` — a full B×B block grid
    where NEITHER side is broadcast or collected, per-task memory
    O(n/B·d), per-cell tie-complete top-k supersets unioned across the
    row of cells (plan-pinned by
    tests/test_plans.py::test_lof_grid_no_broadcast_no_collect). At
    even larger scale the kNN comes from the registered ANN family
    (IVF cells / LSH buckets); the LOF algebra downstream is unchanged
    — it only ever touches the |n|×k reach table."""
    if _corpus_rows(sf_dir) > SIM_PAIRS_GRID_MIN_ROWS:
        pairs = lof_knn_grid(spark, sf_dir, k=5)
    else:
        pairs = _lof_knn_broadcast(spark, sf_dir, k=5)
    w = Window.partitionBy("p").orderBy("dq", "o")
    knn = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .localCheckpoint()
    )
    kdist = knn.groupBy("p").agg(F.max("dq").alias("kd")).select(
        F.col("p").alias("node"), "kd"
    )
    reach = knn.join(
        kdist, knn.o == kdist.node
    ).select("p", "o", F.greatest("kd", "dq").alias("rdist"))
    sreach = reach.groupBy("p").agg(F.sum("rdist").alias("sr"))
    sp = sreach.select(F.col("p").alias("pp"), F.col("sr").alias("sr_p"))
    so = sreach.select(F.col("p").alias("oo"), F.col("sr").alias("sr_o"))
    lof = (
        reach.join(sp, reach.p == sp.pp)
        .join(so, reach.o == so.oo)
        .groupBy("p")
        .agg(
            (F.sum(F.col("sr_p").cast("double") / F.col("sr_o")) / 5).alias(
                "lof_raw"
            )
        )
    )
    rw = Window.orderBy(F.round(F.col("lof_raw"), 6).desc(), F.col("p"))
    return (
        lof.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= 20)
        .select(
            F.col("p").cast("long").alias("vec_id"),
            F.floor(F.col("lof_raw") * 1000000).cast("long").alias("lof_ppm"),
            F.col("rnk").cast("int"),
        )
    )
