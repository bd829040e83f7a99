"""§2.D extensions — deterministic-hash sketches with FULL value oracles.

Engine-private sketches (HLL, KLL, theta) are only rows-only checkable;
these three classics rebuilt over a DETERMINISTIC md5 hash are exactly
reproducible in any engine, so each approximate structure carries a full
DuckDB value oracle next to its exact ground truth — the same pattern as
``d_agg_kmv_sketch`` (aggregates.py).

- linear counting (Whang et al. 1990): bucket-occupancy distinct estimate,
  the small-range sketch HLL replaces only past ~10⁹ distincts;
- Bloom-filter audit (Bloom 1970): measured vs theoretical false-positive
  rate for a salted k=3 filter — the structure behind join pre-filters
  (``c_join_bloom``) and blocklist gates, here with its accuracy proven;
- MinHash signature accuracy (Broder 1997): component-match Jaccard
  estimates vs exact Jaccard per set pair — the calibration audit for the
  banded-LSH dedup stack (``k_dedup_minhash``, ``k_eval_lsh_calibration``).

Portability: hash = first 8 hex chars of md5 parsed as int (Spark
``conv(hex,16,10)``, DuckDB ``('0x'||hex)::BIGINT``); every ratio leaves as
floor-quantized basis points (integer), never a rounded float.

Scale shape: each sketch is one hash projection plus one bounded
aggregation (distinct buckets / bit positions / 64·|types| signature rows)
— partial aggregation does the heavy lifting map-side, and the merged
state is O(m) or O(k), independent of row count, exactly why these
structures exist at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_service_spark.io import load
from data_service_spark.registry import register

_LC_M = 65536  # linear-counting buckets: load factor 0.03 @sf0.01, 0.3 @sf0.1
_BF_M = 16384  # bloom bits
_BF_K = 3  # bloom hash count
_MH_K = 64  # minhash signature length


def _spark_h(expr: str, salt: str) -> str:
    return (
        f"CAST(conv(substr(md5(concat('{salt}', {expr})), 1, 8), 16, 10) "
        "AS BIGINT)"
    )


def _duck_h(expr: str, salt: str) -> str:
    return f"('0x' || substr(md5('{salt}' || {expr}), 1, 8))::BIGINT"


@register(
    "d_agg_linear_counting",
    oracle=f"""
    WITH occ AS (
      SELECT count(DISTINCT {_duck_h("l_partkey::VARCHAR", "lc:")} % {_LC_M})
               AS w,
             count(DISTINCT l_partkey) AS exact_nd
      FROM lineitem
    )
    SELECT CAST(exact_nd AS BIGINT) AS exact_distinct,
           CAST(w AS BIGINT) AS occupied_buckets,
           CAST(floor({_LC_M} * ln({_LC_M} * 1.0 / ({_LC_M} - w)))
             AS BIGINT) AS lc_estimate,
           CAST(floor(abs({_LC_M} * ln({_LC_M} * 1.0 / ({_LC_M} - w))
                          - exact_nd) * 10000.0 / exact_nd)
             AS BIGINT) AS rel_err_bp
    FROM occ
    """,
)
def d_agg_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct estimate (Whang et al. 1990) of
    ``l_partkey``: hash every value into m=65536 buckets, count occupied
    buckets w, estimate n̂ = m·ln(m/(m−w)) — exact occupancy is an integer
    both engines agree on, and the estimate is reported floor-quantized
    next to the exact count and the error in basis points.

    Scale shape: one hash projection → count(DISTINCT bucket) — partial
    distinct aggregation map-side, merged state ≤ m values regardless of
    input rows. m scales with the expected range (LC wants load < 1);
    beyond that the rows-only HLL (``d_agg_hll_sketch``) takes over.
    """
    li = load(spark, sf_dir, "lineitem")
    occ = li.agg(
        F.countDistinct(
            F.expr(f"{_spark_h('CAST(l_partkey AS STRING)', 'lc:')} % {_LC_M}")
        ).alias("w"),
        F.countDistinct("l_partkey").alias("exact_nd"),
    )
    est = _LC_M * F.log(_LC_M * 1.0 / (_LC_M - F.col("w")))
    return occ.select(
        F.col("exact_nd").cast("long").alias("exact_distinct"),
        F.col("w").cast("long").alias("occupied_buckets"),
        F.floor(est).cast("long").alias("lc_estimate"),
        F.floor(F.abs(est - F.col("exact_nd")) * 10000.0 / F.col("exact_nd"))
        .cast("long")
        .alias("rel_err_bp"),
    )


_BF_SALTS = list(range(_BF_K))


@register(
    "d_agg_bloom_audit",
    oracle=f"""
    WITH member_pos AS (
      SELECT DISTINCT
             {_duck_h("s.salt::VARCHAR || ':' || p.p_partkey::VARCHAR", "bf")}
               % {_BF_M} AS pos
      FROM part p, range({_BF_K}) s(salt)
      WHERE p.p_size <= 25
    ), probe_hits AS (
      SELECT p.p_partkey,
             min(CASE WHEN m.pos IS NOT NULL THEN 1 ELSE 0 END) AS all_set
      FROM part p
      CROSS JOIN range({_BF_K}) s(salt)
      LEFT JOIN member_pos m
        ON {_duck_h("s.salt::VARCHAR || ':' || p.p_partkey::VARCHAR", "bf")}
             % {_BF_M} = m.pos
      WHERE p.p_size > 25
      GROUP BY p.p_partkey
    ), agg AS (
      SELECT (SELECT count(*) FROM part WHERE p_size <= 25) AS n_members,
             count(*) AS n_probes,
             CAST(sum(all_set) AS BIGINT) AS false_positives
      FROM probe_hits
    )
    SELECT CAST(n_members AS BIGINT) AS n_members,
           CAST(n_probes AS BIGINT) AS n_probes,
           false_positives,
           CAST(floor(false_positives * 10000.0 / n_probes) AS BIGINT)
             AS observed_fpr_bp,
           CAST(floor(pow(1.0 - exp(-{_BF_K}.0 * n_members / {_BF_M}),
                          {_BF_K}) * 10000.0) AS BIGINT)
             AS theoretical_fpr_bp
    FROM agg
    """,
)
def d_agg_bloom_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter accuracy audit: build a k=3, m=16384-bit filter over the
    member set (parts with p_size ≤ 25) using salted deterministic hashes,
    probe it with the DISJOINT complement, and report observed vs
    theoretical (1−e^{−kn/m})^k false-positive rate — every probe that
    reads positive is by construction a false positive, so the observed
    rate is an exact integer count.

    Scale shape: member side reduces to ≤ m distinct bit positions
    (broadcastable); probes fan out k rows each and LEFT-join the
    positions — at 100 TB the filter itself stays O(m) while the probe
    pass is embarrassingly parallel (this is the audit twin of the real
    pre-filter in ``c_join_bloom``).
    """
    part = load(spark, sf_dir, "part")
    salts = F.explode(F.array(*[F.lit(i) for i in _BF_SALTS])).alias("salt")
    h_sql = _spark_h(
        "CAST(salt AS STRING), ':', CAST(p_partkey AS STRING)", "bf"
    )
    h = F.expr(f"{h_sql} % {_BF_M}").alias("pos")
    member_pos = (
        part.filter("p_size <= 25").select("p_partkey", salts).select(h).distinct()
    )
    probe_pos = (
        part.filter("p_size > 25")
        .select("p_partkey", salts)
        .select("p_partkey", h)
    )
    hits = (
        probe_pos.join(
            F.broadcast(member_pos.withColumn("hit", F.lit(1))), "pos", "left"
        )
        .groupBy("p_partkey")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("all_set"))
    )
    members = part.filter("p_size <= 25").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    agg = hits.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("all_set").cast("long").alias("false_positives"),
    ).crossJoin(F.broadcast(members))
    theo = F.pow(
        F.lit(1.0) - F.exp(F.lit(-float(_BF_K)) * F.col("n_members") / _BF_M),
        float(_BF_K),
    )
    return agg.select(
        F.col("n_members").cast("long"),
        F.col("n_probes").cast("long"),
        "false_positives",
        F.floor(F.col("false_positives") * 10000.0 / F.col("n_probes"))
        .cast("long")
        .alias("observed_fpr_bp"),
        F.floor(theo * 10000.0).cast("long").alias("theoretical_fpr_bp"),
    )


@register(
    "d_agg_minhash_jaccard_est",
    oracle=f"""
    WITH sig AS (
      SELECT e.event_type, s.salt,
             min({_duck_h("s.salt::VARCHAR || ':' || e.user_id::VARCHAR",
                          "mh")}) AS mh
      FROM (SELECT DISTINCT event_type, user_id FROM events) e,
           range({_MH_K}) s(salt)
      GROUP BY e.event_type, s.salt
    ), matches AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT)
               AS sig_matches
      FROM sig a JOIN sig b
        ON a.salt = b.salt AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    ), sets AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS inter
      FROM sets a JOIN sets b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    ), sizes AS (
      SELECT event_type, count(*) AS n FROM sets GROUP BY event_type
    )
    SELECT m.type_a, m.type_b, m.sig_matches,
           CAST(floor(m.sig_matches * 10000.0 / {_MH_K}) AS BIGINT)
             AS est_jaccard_bp,
           CAST(floor(e.inter * 10000.0 / (sa.n + sb.n - e.inter))
             AS BIGINT) AS exact_jaccard_bp
    FROM matches m
    JOIN exact e ON m.type_a = e.type_a AND m.type_b = e.type_b
    JOIN sizes sa ON sa.event_type = m.type_a
    JOIN sizes sb ON sb.event_type = m.type_b
    """,
)
def d_agg_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature accuracy (Broder 1997): per event-type pair, the
    k=64 component-match Jaccard estimate next to the exact Jaccard of the
    two user sets, both floor-quantized to basis points — the calibration
    audit that justifies the banded-LSH thresholds the dedup stack
    (``k_dedup_minhash``, ``k_eval_lsh_calibration``) runs on.

    Scale shape: signatures aggregate map-side to |types|·k rows (a
    constant), so the pairwise comparison is a self-join of a tiny table;
    the exact-Jaccard ground truth is the only input-sized join and exists
    purely as the audit's reference. The distinct (type, user) set feeds
    FOUR subtrees (signatures, both exact-join sides, sizes) and the
    signature table feeds its own self-join twice — both are pinned with
    localCheckpoint (r13: Spark re-ran the events scan + distinct per
    reference — 6 scans, 32 exchanges in the before-plan; after: 1 scan,
    the set-sized pin is exactly what a production audit materializes).
    """
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .localCheckpoint()
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(_MH_K)])
    ).alias("salt")
    sig = (
        ev.select("event_type", "user_id", salts)
        .select(
            "event_type",
            "salt",
            F.expr(
                _spark_h(
                    "CAST(salt AS STRING), ':', CAST(user_id AS STRING)", "mh"
                )
            ).alias("hv"),
        )
        .groupBy("event_type", "salt")
        .agg(F.min("hv").alias("mh"))
        .localCheckpoint()  # |types|·k rows; self-joined below
    )
    a, b = sig.alias("a"), sig.alias("b")
    matches = (
        a.join(
            b,
            (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum((F.col("a.mh") == F.col("b.mh")).cast("long")).alias(
                "sig_matches"
            )
        )
    )
    sa, sb = ev.alias("sa"), ev.alias("sb")
    exact = (
        sa.join(
            sb,
            (F.col("sa.user_id") == F.col("sb.user_id"))
            & (F.col("sa.event_type") < F.col("sb.event_type")),
        )
        .groupBy(
            F.col("sa.event_type").alias("type_a"),
            F.col("sb.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        matches.join(exact, ["type_a", "type_b"])
        .join(
            sizes.withColumnRenamed("event_type", "type_a").withColumnRenamed(
                "n", "n_a"
            ),
            "type_a",
        )
        .join(
            sizes.withColumnRenamed("event_type", "type_b").withColumnRenamed(
                "n", "n_b"
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "sig_matches",
            F.floor(F.col("sig_matches") * 10000.0 / _MH_K)
            .cast("long")
            .alias("est_jaccard_bp"),
            F.floor(
                F.col("inter")
                * 10000.0
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            )
            .cast("long")
            .alias("exact_jaccard_bp"),
        )
    )
