"""§2.H — scalar function surface (string / regex / date / math / conditional
/ cast / array / map+json / explode / struct).

All built-in pyspark.sql.functions — JVM-side inside whole-stage codegen, no
Python in the hot path. Oracle twins encode the DuckDB dialect deltas
(SURVEY.md §7.4.7): dayofweek is 0-based there, ceil/floor return DOUBLE,
sign returns TINYINT, list functions are `list_*`/`len`, JSON extraction is
`json_extract_string`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_service_spark.io import load, load_parallel
from data_service_spark.registry import register

# Spark-SQL string-literal form (backslashes doubled for the SQL parser) of
# the EXACT string->int grammar try_cast accepts on 4.1.2: both ends trim
# precisely [\x00-\x20\x7f] (ASCII control, space, DEL — probed: C1
# \x80-\x9f and unicode whitespace are neither trimmed nor accepted), then
# [+-]?digits with no decimal point. h_cast's perf guard and the
# guard≡try_cast property test share this constant so they cannot drift.
TRY_INT_GUARD_SQL = "'^[\\\\x00-\\\\x20\\\\x7f]*[+-]?[0-9]+[\\\\x00-\\\\x20\\\\x7f]*$'"


@register(
    "h_str_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           length(p_name) AS nlen,
           trim('  ' || p_name || ' ') AS trimmed,
           substring(p_name, 2, 5) AS sub,
           concat_ws('|', p_name, p_brand, p_type) AS joined,
           replace(p_name, ' ', '_') AS repl,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           reverse(p_brand) AS rev,
           left(p_name, 3) AS l3, right(p_name, 3) AS r3
    FROM part
    """,
)
def h_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("long").alias("nlen"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.concat_ws("|", "p_name", "p_brand", "p_type").alias("joined"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.reverse("p_brand").alias("rev"),
        F.expr("left(p_name, 3)").alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
    )


@register(
    "h_str_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '(\\d+)$', 1) AS id_digits,
           regexp_replace(c_name, '\\d', 'x', 'g') AS masked,
           starts_with(c_name, 'Customer#0000001') AS sw,
           ends_with(c_name, '7') AS ew,
           contains(c_name, '99') AS has99
    FROM customer
    """,
)
def h_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark regexp_replace is global by default; DuckDB needs the 'g' flag.
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("id_digits"),
        F.regexp_replace("c_name", r"\d", "x").alias("masked"),
        F.col("c_name").startswith("Customer#0000001").alias("sw"),
        F.col("c_name").endswith("7").alias("ew"),
        F.col("c_name").contains("99").alias("has99"),
    )


@register(
    "h_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           day(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1 AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           last_day(o_orderdate) AS month_end,
           CAST(o_orderdate AS DATE) AS as_date
    FROM orders
    """,
)
def h_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # o_orderdate is a midnight TIMESTAMP, not DATE (FIXTURES.md) — casts are
    # explicit. Spark dayofweek is 1-based (Sunday=1), DuckDB 0-based.
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.quarter(d).cast("long").alias("qtr"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("long").alias(
            "days_since_95"
        ),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.last_day(d).alias("month_end"),
        d.cast("date").alias("as_date"),
    )


@register(
    "h_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 2) AS dist30k,
           CAST(ceil(l_quantity) AS BIGINT) AS qceil,
           CAST(floor(l_quantity) AS BIGINT) AS qfloor,
           round(l_extendedprice, 1) AS r1,
           round(pow(l_quantity, 2), 4) AS qsq,
           round(sqrt(l_extendedprice), 6) AS sq,
           round(exp(l_discount), 6) AS e_disc,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log_price,
           mod(l_linenumber, 3) AS lmod,
           CAST(sign(l_extendedprice - 30000) AS INTEGER) AS sgn,
           greatest(l_quantity, l_tax * 100) AS gr,
           least(l_quantity, l_discount * 100) AS le
    FROM lineitem
    """,
)
def h_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # libm last-ulp differences across engines → transcendentals rounded 6dp.
    # load_parallel: 15 transcendental projections × every lineitem row is
    # compute-dense enough that the one repartition beats the 3-partition
    # single-row-group ceiling 2.4× (A/B r08: 1.45 → 0.61 s at sf0.1); at
    # cluster scale a multi-file table already arrives parallel and the
    # pass is no-op-sized.
    li = load_parallel(spark, sf_dir, "lineitem", "l_orderkey")
    q, ep = F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.abs(ep - 30000), 2).alias("dist30k"),
        F.ceil(q).alias("qceil"),
        F.floor(q).alias("qfloor"),
        F.round(ep, 1).alias("r1"),
        F.round(F.pow(q, 2), 4).alias("qsq"),
        F.round(F.sqrt(ep), 6).alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("e_disc"),
        F.round(F.log(ep), 6).alias("ln_price"),
        F.round(F.log10(ep), 6).alias("log_price"),
        F.pmod(F.col("l_linenumber"), F.lit(3)).alias("lmod"),
        F.signum(ep - 30000).cast("int").alias("sgn"),
        F.greatest(q, F.col("l_tax") * 100).alias("gr"),
        F.least(q, F.col("l_discount") * 100).alias("le"),
    )


@register(
    "h_cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                WHEN o_totalprice < 400000 THEN 'large'
                ELSE 'jumbo' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN nullif(o_orderstatus, 'F') IS NOT NULL
                THEN 'has-status' ELSE 'finished' END AS nvl2_status
    FROM orders
    """,
)
def h_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(p < 50000, "small")
        .when(p < 200000, "medium")
        .when(p < 400000, "large")
        .otherwise("jumbo")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.nvl2(
            F.nullif(F.col("o_orderstatus"), F.lit("F")),
            F.lit("has-status"),
            F.lit("finished"),
        ).alias("nvl2_status"),
    )


@register(
    "h_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderdate AS DATE) AS od_date,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
    FROM orders
    """,
)
def h_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both engines round HALF_UP on the decimal cast; try_cast of
    # non-numeric text yields NULL in both. The failing-path try_cast is
    # regex-guarded: Spark's TRY-mode string->int builds a full ANSI error
    # object per failing row before swallowing it (~5x the whole key's cost
    # on an all-failing column), so rows that cannot parse short-circuit to
    # the NULL try_cast would return and try_cast only evaluates on
    # plausible numerics (still exercised: prio_num's succeeding cast, and
    # any genuinely numeric text that would overflow INT). The guard is
    # ALIGNED with cast's accepted string->int grammar so it cannot
    # diverge from an unguarded try_cast on any input: Spark trims
    # exactly [\x00-\x20\x7f] from both ends (probed on 4.1.2: ASCII
    # control/space/DEL trimmed; C1 \x80-\x9f and unicode whitespace like
    # NBSP/EM-SPACE are NOT trimmed and NOT accepted), then parses
    # [+-]?digits with no decimal point.
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias(
            "price_dec_str"
        ),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").alias("od_date"),
        F.expr(
            f"CASE WHEN o_orderpriority RLIKE {TRY_INT_GUARD_SQL} "
            "THEN try_cast(o_orderpriority AS INT) END"
        ).alias("bad_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
    )


@register(
    "h_array_funcs",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           CAST(len(words) AS INTEGER) AS n_words,
           list_contains(words, 'join') AS has_join,
           words[3] AS third_word,
           CAST(len(list_distinct(words)) AS INTEGER) AS n_unique,
           array_to_string(words[2:4], ' ') AS mid3,
           CAST(list_position(words, 'scan') AS INTEGER) AS scan_pos
    FROM w
    """,
)
def h_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark array_position and DuckDB list_position are both 1-based and
    # both return 0 when absent (probed).
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.array_contains(w, "join").alias("has_join"),
        F.element_at(w, 3).alias("third_word"),
        F.size(F.array_distinct(w)).alias("n_unique"),
        F.array_join(F.slice(w, 2, 3), " ").alias("mid3"),
        F.array_position(w, "scan").cast("int").alias("scan_pos"),
    )


@register(
    "h_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_json,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_schema,
           event_type AS et_from_map
    FROM events
    """,
)
def h_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Three routes to the same value: path extraction, schema-ful from_json,
    # and a map literal read back — the oracle inlines the identities.
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_json"),
        F.from_json(F.col("props"), "k INT").getField("k").alias("k_schema"),
        F.create_map(F.lit("et"), F.col("event_type"))
        .getItem("et")
        .alias("et_from_map"),
    )


@register(
    "h_explode",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           unnest(generate_series(0, CAST(len(words) AS INTEGER) - 1)) AS pos,
           unnest(words) AS word
    FROM w
    """,
)
def h_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # posexplode is 0-based; DuckDB zips parallel unnests positionally
    # (probed), giving the same (pos, word) pairs.
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


@register(
    "h_struct",
    oracle="""
    SELECT o_orderkey, o_orderkey AS sk, round(o_totalprice, 2) AS sp,
           'order' AS tag
    FROM orders
    """,
)
def h_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build a struct, then flatten fields back out (the hash needs flat
    # scalar columns; struct columns don't hash portably across engines).
    o = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice"), 2).alias("p"),
    )
    named = F.named_struct(F.lit("tag"), F.lit("order"))
    return o.select(
        "o_orderkey",
        s.getField("k").alias("sk"),
        s.getField("p").alias("sp"),
        named.getField("tag").alias("tag"),
    )


@register(
    "h_array_higher_order",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT vec_id,
           round(CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE), 4)
             AS sum_sq,
           len(list_filter(v, x -> x > 0)) AS n_pos,
           round(CAST(list_aggregate(v, 'max') AS DOUBLE), 4) AS vmax,
           round(CAST(list_sum(list_transform(
                   list_zip(v, list_reverse(v)),
                   p -> p[1] * p[2])) AS DOUBLE), 4) AS rev_dot
    FROM e
    """,
)
def h_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform/filter/aggregate/zip_with
    lambdas over the embedding vectors. These are the JVM-side primitives the
    K-category ops compose (no Python boundary); sum-of-squares ≈ 1.0
    doubles as a check that vectors are L2-normalized."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sum_sq = F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    rev_dot = F.aggregate(
        F.zip_with("v", F.reverse("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return e.select(
        "vec_id",
        F.round(sum_sq, 4).alias("sum_sq"),
        F.size(F.filter("v", lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max("v"), 4).alias("vmax"),
        F.round(rev_dot, 4).alias("rev_dot"),
    )


@register(
    "h_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS b_and,
           l_orderkey | 15 AS b_or,
           xor(l_orderkey, l_linenumber) AS b_xor,
           (l_orderkey << 2) AS b_shl,
           (l_orderkey >> 3) AS b_shr,
           bit_count(l_orderkey) AS b_pop
    FROM lineitem
    """,
)
def h_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (&, |, xor, shifts, popcount) — the
    primitives behind the simhash/banding operators, pinned directly."""
    li = load(spark, sf_dir, "lineitem")
    k, ln = F.col("l_orderkey"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(15)).alias("b_or"),
        k.bitwiseXOR(ln).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
        F.bit_count(k).alias("b_pop"),
    )


@register(
    "h_trig_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_quantity), 6) AS t_sin,
           round(cos(l_quantity), 6) AS t_cos,
           round(atan2(l_quantity, l_linenumber + 1), 6) AS t_atan2,
           round(degrees(atan(l_quantity / 50.0)), 6) AS t_deg,
           round(radians(l_quantity), 6) AS t_rad
    FROM lineitem
    """,
)
def h_trig_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric scalar surface (libm on both engines; 6dp rounding
    absorbs the last-ulp differences between implementations).
    load_parallel for the same reason as ``h_math_funcs``: compute-dense
    per-row projections beat the single-row-group 3-partition ceiling
    (A/B r08: 1.2 → ~0.5 s at sf0.1)."""
    li = load_parallel(spark, sf_dir, "lineitem", "l_orderkey")
    q, ln = F.col("l_quantity"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(q), 6).alias("t_sin"),
        F.round(F.cos(q), 6).alias("t_cos"),
        F.round(F.atan2(q, ln + 1), 6).alias("t_atan2"),
        F.round(F.degrees(F.atan(q / 50.0)), 6).alias("t_deg"),
        F.round(F.radians(q), 6).alias("t_rad"),
    )


@register(
    "h_url_funcs",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/docs/',
                    doc_id::VARCHAR, '?lang=', lang, '&v=2') AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)
def h_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (`parse_url`): host / path / query-parameter
    extraction — the web-corpus provenance columns (domain-level filtering,
    per-site rate stats) every crawl pipeline derives first. URLs are
    synthesized from document metadata (corpus has no URL column); DuckDB
    lacks parse_url so the oracle cross-validates with anchored regexes —
    two independent parsers, one answer."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "h_nested_struct_array",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             list_transform(
               list_sort(list(o_orderkey ORDER BY o_orderkey)),
               k -> k * 2) AS doubled,
             count(*) AS n_orders
      FROM orders WHERE o_custkey < 100 GROUP BY 1
    )
    SELECT o_custkey, n_orders,
           doubled[1] AS first_doubled,
           len(list_filter(doubled, x -> x % 4 = 0)) AS n_div4
    FROM g
    """,
)
def h_nested_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-collection algebra: per-customer order lists built with
    collect_list, lambda-transformed and filtered entirely JVM-side —
    the array-of-values form of a nested document column. `sort_array`
    canonicalizes collect_list's nondeterministic order BEFORE any
    element access so results are engine-portable; flattened scalars
    (first element, filtered count) keep the driver hash stable."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    g = o.groupBy("o_custkey").agg(
        F.expr("transform(sort_array(collect_list(o_orderkey)), k -> k * 2)").alias(
            "doubled"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return g.select(
        "o_custkey",
        "n_orders",
        F.element_at("doubled", 1).alias("first_doubled"),
        F.size(F.expr("filter(doubled, x -> x % 4 = 0)")).alias("n_div4"),
    )


@register(
    "h_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / nullif(l_discount, 0.0), 4) AS safe_ratio,
           TRY_CAST(l_comment_free AS DOUBLE) AS bad_number,
           TRY_CAST('123.5' AS DOUBLE) AS good_number
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
                 'n/a' AS l_comment_free
          FROM lineitem) t
    """,
)
def h_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: `try_divide` nulls division-by-zero instead
    of raising under ANSI mode, `try_cast` nulls unparseable input — the
    functions that keep a 100 TB batch from aborting on one bad cell while
    staying ANSI-compliant. Oracle expresses the same semantics with
    nullif-guarded division and TRY_CAST."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 4).alias("safe_ratio"),
        F.lit("n/a").cast("string").try_cast("double").alias("bad_number"),
        F.lit("123.5").try_cast("double").alias("good_number"),
    )


@register(
    "h_hash_funcs",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS h_md5,
           sha256(p_name) AS h_sha256,
           ('0x' || substr(md5(p_name), 1, 15))::BIGINT AS h_bucket
    FROM part
    """,
)
def h_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-function family every pipeline layer leans on (dedup keys,
    salts, bucket routing, cache keys): md5 / sha256 (DuckDB 1.0 ships no sha1) plus the
    hex→int64 bucket idiom used throughout the K operators. All JVM-side
    codegen; identical digests across engines because the input bytes are
    the same UTF-8."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
        F.expr(
            "cast(conv(substr(md5(p_name), 1, 15), 16, 10) AS bigint)"
        ).alias("h_bucket"),
    )


@register(
    "h_json_build",
    oracle="""
    SELECT o_orderkey,
           to_json(struct_pack(
             k := o_orderkey,
             status := o_orderstatus,
             pri := o_orderpriority,
             price := CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
           ))::VARCHAR AS row_json
    FROM orders
    """,
)
def h_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row→JSON serialization (`to_json(struct(...))`) — the exact shape the
    REST layer emits per row and the export format of JSONL training
    shards. Field set is integers + strings: both engines emit identical
    compact JSON for those, while raw doubles diverge (Spark shortest-
    round-trip vs DuckDB %.15g) — so money is pre-formatted through a
    DECIMAL(12,2)→string cast, which also pins the 2dp wire format."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("pri"),
                F.col("o_totalprice")
                .cast("decimal(12,2)")
                .cast("string")
                .alias("price"),
            )
        ).alias("row_json"),
    )


@register(
    "h_variant",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
           CAST(max(json_extract(props, '$.k')::INT) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def h_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` path extraction — the schema-on-read shape for event
    property bags where per-event keys differ. Versus re-parsing JSON text
    per field, the variant parse happens once and field access is a binary
    probe; at 100 TB the parse cost dominates, so this halves-or-better
    multi-field extraction. Oracle reads the same path with DuckDB's JSON
    extractor.
    """
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
    )


@register(
    "h_xml_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_id,
           round(sum(value), 2) + 0.0 AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def h_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML serialize/parse roundtrip (Spark 4 ``to_xml``/``from_xml``) —
    the enterprise-feed ingest surface: each event renders to an XML
    fragment and is parsed back through an explicit schema; the aggregate
    over PARSED fields must equal the oracle's aggregate over the source
    columns, proving the roundtrip is lossless (shortest-repr doubles
    reparse bit-exact). Zero shuffles before the final agg; both XML
    functions are JVM expressions, no Python worker.
    """
    e = load(spark, sf_dir, "events")
    xml = e.select(
        F.to_xml(F.struct("event_id", "event_type", "value")).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            "x", "event_id bigint, event_type string, value double"
        ).alias("p")
    ).select("p.event_id", "p.event_type", "p.value")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("long").alias("sum_id"),
        (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
    )


@register(
    "h_collation",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                  ELSE upper(substr(c_mktsegment, 1, 1))
                       || lower(substr(c_mktsegment, 2)) END AS seg_mixed
      FROM customer
    )
    SELECT CAST(count(DISTINCT seg_mixed) AS BIGINT) AS n_binary,
           CAST(count(DISTINCT lower(seg_mixed)) AS BIGINT) AS n_lcase
    FROM m
    """,
)
def h_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): the same column counted distinct under
    binary semantics vs ``COLLATE UTF8_LCASE`` — case-insensitive
    comparison as a TYPE property, so every operator downstream (group,
    join, distinct) inherits it without lower() wrappers mangling the
    stored values. The fixture mixes the case of half the rows; binary
    sees 2× the segments, the collated count restores the true 5. The
    oracle states the lcase semantics explicitly with lower() — and MUST:
    the r10 collation fuzz core proved DuckDB IGNORES a COLLATE clause
    inside count(DISTINCT ...), so a naive COLLATE-based twin would
    count the binary classes.

    Scale: collation-aware distinct is the same hash aggregate with a
    collation-keyed hash — no extra pass, unlike the lower()-projection
    workaround which doubles the string bytes through the shuffle.
    """
    c = load(spark, sf_dir, "customer")
    mixed = F.expr(
        "CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment"
        " ELSE concat(upper(substr(c_mktsegment, 1, 1)),"
        "             lower(substr(c_mktsegment, 2))) END"
    )
    return c.select(mixed.alias("seg_mixed")).agg(
        F.countDistinct("seg_mixed").cast("long").alias("n_binary"),
        F.countDistinct(F.expr("seg_mixed COLLATE UTF8_LCASE"))
        .cast("long")
        .alias("n_lcase"),
    )


@register(
    "h_mask_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(
             lpad(cast(c_custkey AS VARCHAR), 9, '0'),
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', '9', 'g')
             AS masked_phone
    FROM customer
    """,
)
def h_mask_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mask()`` — the built-in character-class redaction (upper→X,
    lower→x, digit→n, custom replacements per class): structure-preserving
    PII masking for display/export, one codegen pass per string instead of
    the regex chain the oracle spells out. Complements
    ``k_text_pii_redact`` (pattern-level redaction) with character-level
    masking. Zero-shuffle projection, evaluated in the scan stage. The
    corpus carries no phone column, so a 9-digit account id stands in for
    the digits-only PII case.
    """
    c = load(spark, sf_dir, "customer")
    phone = F.lpad(F.col("c_custkey").cast("string"), 9, "0")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            phone, F.lit("X"), F.lit("x"), F.lit("9"), F.lit(None)
        ).alias("masked_phone"),
    )


@register(
    "h_explode_outer",
    oracle="""
    WITH longw AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> len(w) > 9) AS ws
      FROM documents
    )
    SELECT doc_id,
           unnest(CASE WHEN len(ws) = 0 THEN [NULL] ELSE ws END) AS long_word
    FROM longw
    """,
)
def h_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: the null-preserving fan-out — a row whose array
    is empty (or null) SURVIVES with a NULL element instead of vanishing.
    The semantics that matter for join-like denormalization (every parent
    must appear downstream exactly once even with no children); plain
    explode silently drops them, the classic row-loss bug. DuckDB has no
    outer unnest, so the oracle pads empty lists with [NULL] — same
    algebra spelled out.
    """
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.filter(
            F.split("text", " "), lambda w: F.length(w) > 9
        ).alias("ws"),
    )
    return words.select(
        "doc_id", F.explode_outer("ws").alias("long_word")
    )


@register(
    "h_aes_roundtrip",
    oracle="""
    SELECT c_custkey, c_name AS decrypted, length(c_name) AS n_chars
    FROM customer
    """,
)
def h_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: ``aes_encrypt``/``aes_decrypt``
    roundtrip (AES-128-ECB for determinism; production uses GCM whose
    random IV makes ciphertexts non-reproducible — the right property for
    storage, the wrong one for a hash-checked test). The oracle is the
    identity projection: decrypt∘encrypt must be lossless. Both sides of
    the roundtrip run JVM-side in one codegen stage — encrypt-at-rest for
    a PII column costs one projection, no Python, no extra pass.
    """
    c = load(spark, sf_dir, "customer")
    dec = F.expr(
        "CAST(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', 'ECB'),"
        " '0123456789abcdef', 'ECB') AS STRING)"
    )
    return c.select(
        "c_custkey",
        dec.alias("decrypted"),
        F.length(dec).cast("long").alias("n_chars"),
    )


@register(
    "h_str_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS INTEGER) AS lev,
           CAST(levenshtein(p_brand, 'Brand#13') AS INTEGER) AS lev_brand
    FROM part
    """,
)
def h_str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in edit distance (``levenshtein``) — the fuzzy-match scalar
    both engines share, JVM-side (contrast k_dedup_levenshtein, which
    BANDS the quadratic all-pairs search; this is the per-pair scalar it
    verifies candidates with).

    Oracle-parity bound (r10 probe): DuckDB's levenshtein counts UTF-8
    BYTES where Spark counts codepoints ('café'→'cafe' is 2 vs 1), so
    the twin holds only on ASCII inputs — satisfied here (TPC-H part
    columns are ASCII by spec) and corpus-audited for the documents
    keys.
    """
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("lev"),
        F.levenshtein("p_brand", F.lit("Brand#13")).alias("lev_brand"),
    )


@register(
    "h_map_higher_order",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
      FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS INTEGER) AS n_entries,
           CAST(len(list_filter(words, x -> len(x) > 5)) AS INTEGER)
             AS n_long,
           CAST(list_sum(list_transform(words, x -> len(x) + 1)) AS BIGINT)
             AS sum_bumped
    FROM w
    """,
)
def h_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (`map_from_entries` / `map_filter` /
    `transform_values` / `map_values`): a word→length map built per row,
    filtered and value-transformed entirely inside whole-stage codegen.
    Output is scalars (cardinalities, a value sum) so the oracle — DuckDB
    has no map HOFs — proves the same algebra via list operations on the
    identical distinct-word set.
    """
    d = load(spark, sf_dir, "documents")
    m = F.expr(
        "map_from_entries(transform(array_distinct(split(text, ' ')),"
        " w -> struct(w, length(w))))"
    )
    return d.select(
        "doc_id",
        F.size(m).alias("n_entries"),
        F.size(F.expr(
            "map_filter(map_from_entries(transform(array_distinct("
            "split(text, ' ')), w -> struct(w, length(w)))),"
            " (k, v) -> v > 5)"
        )).alias("n_long"),
        F.aggregate(
            F.map_values(F.expr(
                "transform_values(map_from_entries(transform(array_distinct("
                "split(text, ' ')), w -> struct(w, length(w)))),"
                " (k, v) -> v + 1)"
            )),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("sum_bumped"),
    )


@register(
    "h_interval_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus_3mo,
           CAST(o_orderdate AS DATE) + INTERVAL 10 DAY AS plus_10d,
           CAST(o_orderdate AS DATE) - INTERVAL 1 YEAR AS minus_1y
    FROM orders
    """,
)
def h_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: month/day/year offsets with the
    month-end clamping both engines share (Jan 31 + 1 month = Feb 28/29).
    `add_months` and interval literals are the two Spark spellings; the
    oracle uses DuckDB's interval addition on the same dates. All codegen
    projection — date math never justifies a UDF.
    """
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        F.date_add(d, 10).cast("timestamp").alias("plus_10d"),
        F.add_months(d, -12).cast("timestamp").alias("minus_1y"),
    )


@register(
    "h_format_funcs",
    oracle="""
    SELECT p_partkey,
           printf('PART-%06d', p_partkey) AS part_code,
           printf('%,d units @ %.2f', CAST(p_size AS BIGINT), p_retailprice)
             AS label,
           printf('%x', p_partkey) AS hex_key,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           translate(p_brand, '#', '-') AS brand_slug,
           repeat('*', p_size % 5) AS stars
    FROM part WHERE p_partkey <= 50
    """,
)
def h_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style report formatting in the engine: zero-padded codes,
    thousands grouping, hex rendering, pad/translate/repeat — the
    display-layer functions an export or labeling pass runs at scan speed
    (Spark `format_string` and DuckDB `printf` share the C format-spec
    dialect, which is what makes the twin exact). All codegen'd
    projections over a pruned, pushed-down scan — no shuffle at any
    scale."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return p.select(
        "p_partkey",
        F.format_string("PART-%06d", "p_partkey").alias("part_code"),
        F.format_string(
            "%,d units @ %.2f", F.col("p_size").cast("bigint"), "p_retailprice"
        ).alias("label"),
        F.format_string("%x", "p_partkey").alias("hex_key"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.translate("p_brand", "#", "-").alias("brand_slug"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
    )


@register(
    "h_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members,
           string_agg(DISTINCT substr(n_name, 1, 1), ''
                      ORDER BY substr(n_name, 1, 1)) AS initials
    FROM nation GROUP BY n_regionkey
    """,
)
def h_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — SQL:2023 ``LISTAGG ... WITHIN GROUP``
    (Spark 4) against DuckDB's ``string_agg(... ORDER BY ...)``: the
    report-friendly "concatenate group members deterministically" surface,
    including the DISTINCT form. The explicit WITHIN GROUP order is what
    makes the result reproducible across partitionings — an unordered
    listagg is nondeterministic on any real cluster.
    """
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                 AS members,
               listagg(DISTINCT substr(n_name, 1, 1), '')
                 WITHIN GROUP (ORDER BY substr(n_name, 1, 1)) AS initials
        FROM nation GROUP BY n_regionkey
        """
    )
