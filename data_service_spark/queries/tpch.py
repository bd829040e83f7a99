"""TPC-H-shaped query suite over the corpus — the end-to-end SQL surface.

Round 1 covered TPC-H Q1/Q3/Q5/Q6/Q10/Q14 shapes as DataFrame plans
(``d_agg_groupby``, ``c_join_tpch_*``, ``c_join_multiway``). This module
completes the suite with the remaining shapes expressible on the corpus
schema (FIXTURES.md) — the corpus is TPC-H-*ish*: there is no ``partsupp``
table and no ``l_shipmode``/``l_commitdate``/``l_receiptdate``/``c_phone``
columns, so Q2/Q4/Q9/Q12/Q16/Q20/Q21/Q22 are *adapted*: the join/subquery
SHAPE (the thing that stresses an optimizer) is preserved, the missing
column is substituted with a semantically-similar one that exists. Each
docstring states the substitution.

Execution model: every query here runs through ``spark.sql`` over temp
views — the exact path the HTTP service (service.py) executes, so this
suite doubles as the service's query-surface regression pack. The DuckDB
oracle runs the *identical* ANSI text, making each check a pure
engine-vs-engine comparison of one SQL plan.

Scale notes (100 TB): every query below is a declarative plan — Catalyst
chooses broadcast for the dimension sides (region/nation/supplier/part at
real TPC-H scale factors stay ≪ the 10 MB autoBroadcast threshold times a
few orders), AQE re-plans shuffle partition counts at runtime, and all
date/column predicates reach the parquet scans as pushed filters
(tests/test_plans.py asserts pushdown on representative keys).

Dialect constraints honored so one text runs on both engines:
- ``EXTRACT(YEAR FROM ts)`` (not ``year()``: identical in both, returns int)
- ``TIMESTAMP '...'`` literals (o_orderdate/l_shipdate are timestamps, not
  dates — FIXTURES.md)
- integer-CASE sums wrapped in ``CAST(... AS BIGINT)`` (DuckDB widens int
  sums to HUGEINT, which its pandas bridge hands back as float)
- money aggregates rounded to 2dp, ratios to 6dp (SURVEY.md §7.4)
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from data_service_spark.io import fresh_tables, load
from data_service_spark.registry import register

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def _sql(spark: "SparkSession", sf_dir: str, tables: list[str], text: str) -> "DataFrame":
    """Register the needed corpus tables as temp views and run one SQL text
    — the service-path entry point (service.py SqlEngine.sql runs the same
    ``spark.sql``)."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(text)


def _suite(key: str, tables: list[str], text: str, doc: str) -> None:
    """Register one suite member: Spark side and DuckDB oracle share TEXT."""

    @register(key, oracle=text)
    def q(spark: "SparkSession", sf_dir: str, _tables=tables, _text=text) -> "DataFrame":
        return _sql(spark, sf_dir, _tables, _text)

    q.__doc__ = doc
    q.__name__ = key


_suite(
    "q_tpch_q01",
    ["lineitem"],
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "Q1 (pricing summary report) verbatim on the corpus schema — the "
    "canonical scan→filter→wide-agg plan: one parquet pass, map-side "
    "partial aggregation, 6-group final. Round 1 carried the shape as "
    "d_agg_groupby; this is the exact suite member so the named 22-query "
    "set is complete.",
)

_suite(
    "q_tpch_q02",
    ["part", "supplier", "lineitem"],
    """
    SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name,
           round(s_acctbal, 2) AS s_acctbal_r
    FROM part JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 5
      AND s_acctbal = (SELECT min(s2.s_acctbal)
                       FROM supplier s2
                            JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                       WHERE l2.l_partkey = p_partkey)
    """,
    "Q2 shape (minimum-cost supplier): correlated scalar-min subquery per "
    "part. Adapted: no partsupp table, so 'supplies part' is derived from "
    "lineitem and min ps_supplycost becomes min s_acctbal. The equality "
    "compares stored doubles (no arithmetic), so cross-engine parity is "
    "exact.",
)

_suite(
    "q_tpch_q04",
    ["orders", "lineitem"],
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 48)
    GROUP BY o_orderpriority
    """,
    "Q4 shape (order-priority checking): EXISTS decorrelated to a left-semi "
    "join by both engines. Adapted: no l_commitdate/l_receiptdate, so the "
    "late-delivery predicate becomes a quantity predicate with similar "
    "selectivity.",
)

_suite(
    "q_tpch_q05",
    ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
                      AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    "Q5 (local supplier volume) verbatim: the 6-way snowflake join with the "
    "same-nation equi-condition folded into the supplier join. Catalyst "
    "broadcasts region/nation/supplier; only customer⋈orders⋈lineitem "
    "shuffle. Round 1 carried the shape as c_join_multiway (the entry() "
    "flagship); this is the exact suite member.",
)

_suite(
    "q_tpch_q07",
    ["supplier", "lineitem", "orders", "customer", "nation"],
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "Q7 (volume shipping): 6-way join with a disjunctive nation-pair "
    "filter; nation joined twice under aliases. Both nation sides broadcast "
    "at any scale (25 rows).",
)

_suite(
    "q_tpch_q08",
    ["part", "lineitem", "orders", "customer", "supplier", "nation", "region"],
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region ON n1.n_regionkey = r_regionkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
    "Q8 (national market share): 8-way join, conditional-sum ratio. The "
    "deepest join tree in the suite — the case Catalyst join reordering "
    "plus dimension broadcast exists for.",
)

_suite(
    "q_tpch_q09",
    ["part", "lineitem", "supplier", "orders", "nation"],
    """
    -- Exact-summation form: amounts quantize to BIGINT ten-thousandths per
    -- row (inputs carry <=4dp of decimal content, so the per-row rounding
    -- is never near a .5 tie), the SUM is integer-exact and
    -- order-independent, and the output is the unrounded quotient — the
    -- same integer divided by the same literal is bit-identical in both
    -- engines. A final round(...,2) is a landmine: the exact sum can be a
    -- true decimal .xx5, which Spark (shortest-repr HALF_UP) and DuckDB
    -- (HALF_EVEN) round to DIFFERENT cents — hit at sf0.001.
    -- The quotient MUST be cast to DOUBLE: Spark types `/ 10000.0` as
    -- decimal(28,7) while DuckDB returns DOUBLE, and the driver's
    -- value-hash distinguishes Decimal('x.0328000') from x.0328 even when
    -- numerically equal (the one r03 driver failure, CORRECTNESS_r03).
    SELECT nation, o_year,
           CAST(CAST(sum(CAST(round(amount * 10000, 0) AS BIGINT)) AS BIGINT)
             / 10000.0 AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * l_quantity AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    """,
    "Q9 shape (product-type profit): LIKE-filtered part drives a 5-way "
    "join, profit grouped by supplier nation × order year. Adapted: no "
    "partsupp, so ps_supplycost is substituted with p_retailprice.",
)

_suite(
    "q_tpch_q12",
    ["orders", "lineitem"],
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    "Q12 shape (shipping modes / priority): fact-fact join with "
    "conditional counts. Adapted: no l_shipmode column, l_returnflag "
    "plays the mode role.",
)

_suite(
    "q_tpch_q13",
    ["customer", "orders"],
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    "Q13 (customer order distribution): outer join with an extra ON "
    "predicate, two stacked aggregations. count(col) ignores the "
    "manufactured nulls of order-less customers — the null-semantics "
    "trap the shape exists to test.",
)

_suite(
    "q_tpch_q15",
    ["supplier", "lineitem"],
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "Q15 (top supplier): CTE reused twice — once joined, once under a "
    "scalar-max subquery. Revenue is rounded to 2dp INSIDE the CTE so the "
    "max-equality compares identical values on both engines.",
)

_suite(
    "q_tpch_q16",
    ["part", "lineitem", "supplier"],
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'STANDARD')
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%#00000000%')
    GROUP BY p_brand, p_type, p_size
    """,
    "Q16 shape (parts/supplier relationship): NOT-IN anti-subquery plus "
    "count(DISTINCT). Adapted: no partsupp, lineitem provides the "
    "part-supplier pairs; the complaints filter becomes a name-pattern "
    "filter (suppkey < 10 have eight leading zeros).",
)

_suite(
    "q_tpch_q17",
    ["lineitem", "part"],
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (SELECT 0.4 * avg(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
    "Q17 (small-quantity-order revenue): correlated average subquery "
    "against the same fact table. l_quantity is integral-valued doubles, "
    "so the per-part sums are exact and the 0.4×avg threshold is "
    "bit-identical across engines.",
)

_suite(
    "q_tpch_q18",
    ["customer", "orders", "lineitem"],
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    "Q18 (large-volume customers): IN over a grouped-HAVING subquery on "
    "the same fact, top-10 with a unique tiebreak. Threshold 150 fits the "
    "corpus's ~4 lines/order × qty ≤ 50.",
)

_suite(
    "q_tpch_q19",
    ["lineitem", "part"],
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    "Q19 (discounted revenue): disjunction of conjunctive band predicates "
    "across both join sides — the shape that tests OR-predicate handling "
    "after join (can't be pushed wholesale to either scan).",
)

_suite(
    "q_tpch_q21",
    ["supplier", "lineitem", "orders"],
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    "Q21 shape (suppliers who kept waiting): EXISTS + NOT-EXISTS "
    "self-correlations on the fact table — decorrelates to one semi- and "
    "one anti-join. Adapted: receipt-vs-commit lateness becomes "
    "sole-returner semantics on l_returnflag.",
)

_suite(
    "q_tpch_q22",
    ["customer", "orders"],
    """
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c_custkey % 7 AS INT) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_custkey % 7 IN (0, 2, 4)
        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_totalprice > 300000)
    ) custsale
    GROUP BY cntrycode
    """,
    "Q22 shape (global sales opportunity): scalar-avg subquery + anti-join "
    "against orders, grouped by a derived code. Adapted twice: no c_phone "
    "column, so country code derives from c_custkey modulo 7; and every "
    "corpus customer has ≥1 order (dense FK, verified), so the no-orders "
    "anti-join becomes no-big-ticket-orders (> 300000) to keep the result "
    "non-degenerate.",
)


_suite(
    "q_tpch_q11",
    ["supplier", "nation"],
    """
    SELECT s_nationkey, round(sum(s_acctbal), 2) AS value
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey < 3
    GROUP BY s_nationkey
    HAVING sum(s_acctbal) > (
      SELECT sum(s_acctbal) * 0.05
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey < 3
    )
    ORDER BY value DESC
    """,
    "Q11 shape (important stock): grouped value share filtered by a scalar "
    "subquery over the SAME joined base — the HAVING-vs-global-fraction "
    "pattern. Adapted: no partsupp, supplier account balances play the "
    "stock-value role.",
)

_suite(
    "q_tpch_q20",
    ["supplier", "nation", "lineitem", "part"],
    """
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal_r
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_5')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'part_1%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50
      )
    ORDER BY s_name
    """,
    "Q20 shape (excess-stock suppliers): nested IN-subqueries — a "
    "part-name filter feeding a grouped HAVING feeding a semi-join. "
    "Adapted: no partsupp/ps_availqty, shipped-quantity sums play the "
    "stock role.",
)


_RCTE_TEXT = """
    WITH RECURSIVE walk(doc_id, anc, depth) AS (
      SELECT doc_id, doc_id AS anc, 0 AS depth FROM documents
      UNION ALL
      SELECT doc_id, CAST(floor(anc / 3.0) AS BIGINT) AS anc, depth + 1
      FROM walk WHERE anc > 0
    )
    SELECT doc_id,
           CAST(max(depth) AS BIGINT) AS tree_depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(anc) AS BIGINT) AS path_sum
    FROM walk
    GROUP BY doc_id
"""


@register("q_recursive_cte", oracle=_RCTE_TEXT)
def q_recursive_cte(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): walk every doc up a
    synthetic parent chain (parent = floor(id/3) — a ternary-tree
    hierarchy) to the root, then aggregate per-doc depth / node count /
    ancestor-id sum. The iterate-until-fixpoint SQL surface (org charts,
    BOM explosions, graph reachability) that previously required a driver
    loop (cf. k_dedup_clusters); identical text runs on both engines.

    Scale: each iteration is one narrow self-union batch; Spark executes
    the recursion as iterative unions with the anchor partitioning
    preserved — depth is log3(max_id) (~11 levels at 100 TB ids), so the
    plan stays shallow even at full scale.
    """
    return _sql(spark, sf_dir, ["documents"], _RCTE_TEXT)


@register(
    "q_param_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 150000
    GROUP BY o_orderpriority
    """,
)
def q_param_sql(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Parameterized SQL (Spark 4 named parameter markers): the service
    boundary shape — SQL text with ``:status`` / ``:cutoff`` markers plus a
    typed args dict, so user input binds as VALUES, never string-splices
    into the query (injection-proof by construction, and the plan cache
    can reuse the parsed tree across bindings). The oracle inlines the
    same literals; money flows as integer cents.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :cutoff
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "cutoff": 150000},
    )


@register(
    "q_pipe_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_quantity >= 10
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pipe_sql(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SQL pipe syntax (Spark 4 ``|>`` operators): the same logical plan as
    the ANSI text, written as a linear dataflow — scan |> filter |>
    aggregate — the composable form query generators and notebooks emit.
    Catalyst parses both to identical plans; the oracle runs the classic
    formulation, proving the two syntaxes agree.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity >= 10
        |> AGGREGATE count(*) AS n,
                     round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, revenue
        """
    )


@register(
    "q_execute_immediate",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM customer WHERE c_acctbal > 1000 GROUP BY c_mktsegment
    """,
)
def q_execute_immediate(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``EXECUTE IMMEDIATE`` with a bound parameter: SQL-from-SQL dynamic
    execution (stored query text, dashboards, migration runners) with the
    binding kept OUT of the string — same injection-proof property as
    parameterized SQL, exercised through the SQL-native entry point.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT c_mktsegment, count(*) AS n,
                  round(avg(c_acctbal), 2) AS avg_bal
           FROM customer WHERE c_acctbal > ? GROUP BY c_mktsegment'
          USING 1000
        """
    )


@register(
    "q_sql_script",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_big
    FROM orders WHERE o_totalprice >= 300000 GROUP BY o_orderstatus
    """,
)
def q_sql_script(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SQL scripting (Spark 4 BEGIN…END): a session variable declared and
    consumed inside one multi-statement script — the procedural glue for
    SQL-only deployments (parameter sweep, guarded DDL). The script's last
    statement is the result relation.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        BEGIN
          DECLARE big_cutoff DOUBLE DEFAULT 300000.0;
          SELECT o_orderstatus, count(*) AS n_big
          FROM orders WHERE o_totalprice >= big_cutoff
          GROUP BY o_orderstatus;
        END
        """
    )


@register(
    "q_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def q_group_by_all(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (Spark 4 and DuckDB share the
    shorthand): group on every non-aggregate select item, order on every
    output column — the analyst-ergonomics surface a SQL service exposes.
    Same physical plan as the explicit form (one partial+final hash
    aggregate); money flows as integer cents for cross-engine exactness.
    The ORDER BY ALL is presentation-only on a 12-row result — no
    data-sized sort.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "q_ctas_insert",
    effects="catalog-write: dss_ctas_nation_*",
    oracle="""
    SELECT n_regionkey,
           CAST(2 * count(*) AS BIGINT) AS n_nations,
           CAST(2 * sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation GROUP BY n_regionkey
    """,
)
def q_ctas_insert(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """The SQL WRITE path a service exposes: CREATE TABLE AS SELECT into
    the session catalog, then INSERT INTO appending a second copy, then an
    aggregate read-back through ``spark.table`` — DDL + DML + catalog
    resolution in one roundtrip (the doubled key_sum proves the INSERT
    appended rather than replaced). On a cluster the same statements hit
    the persistent catalog (a_sink_hive_table's territory); the oracle
    states the doubled aggregate directly. Concurrency-safe via
    uuid-suffixed names (``io.fresh_tables``); the temp view is suffixed
    too so two threads cannot swap each other's source view.
    """
    (tbl,) = fresh_tables(spark, "q_ctas_insert", "dss_ctas_nation")
    src = f"nation_src_{tbl.rsplit('_', 1)[1]}"
    load(spark, sf_dir, "nation").createOrReplaceTempView(src)
    try:
        spark.sql(
            f"CREATE TABLE {tbl} USING parquet AS "
            f"SELECT n_nationkey, n_regionkey FROM {src}"
        )
        spark.sql(
            f"INSERT INTO {tbl} SELECT n_nationkey, n_regionkey FROM {src}"
        )
        return spark.sql(
            f"""
            SELECT n_regionkey, count(*) AS n_nations,
                   sum(n_nationkey) AS key_sum
            FROM {tbl} GROUP BY n_regionkey
            """
        )
    finally:
        # the view resolved at analysis time; dropping it keeps repeated
        # invocations from accumulating per-uuid views in the catalog
        spark.catalog.dropTempView(src)


@register(
    "q_sql_hints",
    oracle="""
    SELECT n_name, count(*) AS n_customers, CAST(sum(CAST(round(
             c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_sql_hints(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SQL optimizer hints through the service path: ``/*+ BROADCAST(n) */``
    pins the dimension build side the way a production query hand-tunes a
    stubborn plan (REPARTITION / MERGE / SHUFFLE_HASH ride the same
    syntax). The hint must not change RESULTS — the oracle is the plain
    join — and tests/test_plans.py pins that the hinted plan actually
    broadcasts. At 100 TB hints are the escape hatch when stats mislead
    the CBO; results staying hint-invariant is the correctness contract.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("dss_hint_c")
    load(spark, sf_dir, "nation").createOrReplaceTempView("dss_hint_n")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n_name, count(*) AS n_customers,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                 AS bal_cents
        FROM dss_hint_c c JOIN dss_hint_n n ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@register(
    "q_distribute_by",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
    FROM lineitem WHERE l_quantity >= 48
    """,
)
def q_distribute_by(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``DISTRIBUTE BY`` + ``SORT BY`` through SQL — the physical-layout
    clause ETL writers use to control file clustering (co-locate rows by
    key per partition, sort within): the result SET is identical to the
    plain filter (the oracle), only the row placement changes; a
    partition-local sort never triggers the global-sort shuffle ORDER BY
    would. The write-side twin is ``a_sink_sorted_layout``.
    """
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("dss_dist_li")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        FROM dss_dist_li WHERE l_quantity >= 48
        DISTRIBUTE BY l_returnflag SORT BY l_returnflag, l_orderkey
        """
    )


def _body_window_named() -> str:
    return """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rk,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER wrun
             AS BIGINT) AS run_cents,
           CAST(count(*) OVER w2 AS BIGINT) AS n_in_status
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wrun AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY o_orderstatus)
    """


@register("q_window_named", oracle=_body_window_named())
def q_window_named(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Named ``WINDOW`` clause (SQL:2003 feature both dialects share):
    window definitions declared once and referenced by name from several
    functions — the define-once surface a SQL service exposes so analysts
    don't repeat (and typo-fork) frame specs. (Spark 4 parses multiple
    named windows but not DuckDB's ``OVER (w ROWS ...)`` frame-refinement
    shorthand — probed; the frame lives in the named definition instead.)
    The optimizer collapses same-spec functions into one Window physical
    node — identical plan to the inline form.

    Scale shape: two window specs → two exchanges, each on a real key
    (o_custkey / o_orderstatus); money runs as integer cents."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_body_window_named())


def _body_values_inline() -> str:
    return """
    SELECT t.tier, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    JOIN (VALUES ('1-URGENT', 'rush'), ('2-HIGH', 'rush'),
                 ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'standard'),
                 ('5-LOW', 'deferred')) AS t(pri, tier)
      ON o_orderpriority = t.pri
    GROUP BY t.tier
    """


@register("q_values_inline", oracle=_body_values_inline())
def q_values_inline(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Inline ``VALUES`` derived table as a join dimension — the literal
    lookup-table surface (priority → tier rollup here) analysts reach for
    before anyone materializes a dim table. The VALUES relation is a
    LocalRelation: Catalyst broadcast-joins it (or constant-folds it to a
    CASE) with zero scans — the plan cost is one pass over orders.

    Scale shape: broadcast hash join against a 5-row local relation +
    one 3-row hash aggregate; integer-cents money."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_body_values_inline())


@register(
    "q_pivot_sql",
    oracle="""
    SELECT o_orderstatus,
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0)
             AS BIGINT) AS urgent_cents,
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '2-HIGH'
                 THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0)
             AS BIGINT) AS high_cents,
           CAST(coalesce(sum(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0)
             AS BIGINT) AS low_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot_sql(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SQL ``PIVOT`` clause (Spark's FROM-clause pivot syntax): revenue by
    order status × priority rotated into columns — the report-shaping
    surface analysts use instead of hand-writing CASE aggregates. The
    DuckDB oracle IS the hand-written CASE form (DuckDB's PIVOT grammar
    differs), which also documents the rewrite Catalyst performs: a pivot
    is exactly one hash aggregate with conditional partials — same plan,
    same single shuffle, no row explosion. ``d_agg_pivot`` is the
    DataFrame-API twin; this pins the SQL-text surface.

    Scale shape: one partial+final hash aggregate on o_orderstatus."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, coalesce(urgent_cents, 0) AS urgent_cents,
               coalesce(high_cents, 0) AS high_cents,
               coalesce(low_cents, 0) AS low_cents
        FROM (SELECT o_orderstatus, o_orderpriority,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders)
        PIVOT (sum(cents) FOR o_orderpriority
               IN ('1-URGENT' AS urgent_cents, '2-HIGH' AS high_cents,
                   '5-LOW' AS low_cents))
        """
    )


@register(
    "q_lateral_view",
    oracle="""
    WITH ex AS (
      SELECT o_orderkey, unnest([
        CAST(round(o_totalprice * 100) AS BIGINT),
        CAST(round(o_totalprice * 100) AS BIGINT) / 2,
        CAST(round(o_totalprice * 100) AS BIGINT) / 4
      ]) AS installment_cents,
      unnest([1, 2, 3]) AS installment_no
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT o_orderkey, CAST(installment_no AS INT) AS installment_no,
           CAST(floor(installment_cents) AS BIGINT) AS installment_cents
    FROM ex
    """,
)
def q_lateral_view(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``LATERAL VIEW posexplode`` (the HiveQL-compatible explode surface
    Spark keeps alongside ANSI ``, LATERAL``): each urgent order fans out
    into a 3-row installment schedule computed from a generated array —
    the SQL-text twin of ``h_explode``'s DataFrame generator. The DuckDB
    oracle uses parallel ``unnest`` columns (its positional-explode
    idiom) — two grammars, one generator semantics, and in both engines
    the generator runs scan-side with no shuffle at all.

    Scale shape: narrow map-side fan-out (3× on a filtered slice),
    pipelined into the scan — zero exchanges."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(pos + 1 AS INT) AS installment_no,
               CAST(floor(part) AS BIGINT) AS installment_cents
        FROM (SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders WHERE o_orderpriority = '1-URGENT') o
        LATERAL VIEW posexplode(array(
          CAST(cents AS DOUBLE), cents / 2, cents / 4)) ex AS pos, part
        """
    )


def _body_filter_clause() -> str:
    return """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderdate >= TIMESTAMP '1996-01-01'), 0)
             AS BIGINT) AS cents_since_96,
           CAST(coalesce(min(o_orderkey)
                FILTER (WHERE o_orderpriority = '5-LOW'), -1) AS BIGINT)
             AS first_low_key
    FROM orders GROUP BY o_orderstatus
    """


@register("q_filter_clause", oracle=_body_filter_clause())
def q_filter_clause(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """ANSI aggregate ``FILTER (WHERE ...)`` clause (both dialects parse
    it natively): several differently-filtered aggregates in ONE pass over
    the fact table — the surface that replaces self-join-per-condition
    anti-patterns. Catalyst rewrites each FILTER into a conditional
    partial, so the plan stays one partial+final hash aggregate; absent
    groups coalesce to explicit sentinels.

    Scale shape: single aggregate, map-side partials, no extra scans."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_body_filter_clause())


@register(
    "q_tpch_refresh",
    effects="catalog-write: dss_rf_orders*",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
    mx AS (SELECT max(o_orderkey) AS mk FROM base),
    rf1 AS (
      SELECT b.o_orderkey + mx.mk AS o_orderkey,
             b.o_orderdate,
             b.o_totalprice
      FROM base b CROSS JOIN mx
      WHERE b.o_orderkey % 1000 < 1
    ),
    rf2_keys AS (
      SELECT o_orderkey FROM (
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM base
      ) t WHERE rn * 1000 <= n
    ),
    refreshed AS (
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM rf2_keys)
      UNION ALL
      SELECT * FROM rf1
    ),
    a AS (
      SELECT count(*) AS n0,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents0
      FROM base
    ), b2 AS (
      SELECT count(*) AS n1,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents1
      FROM refreshed
    )
    SELECT CAST(a.n0 AS BIGINT) AS n_before,
           CAST(b2.n1 AS BIGINT) AS n_after,
           CAST((SELECT count(*) FROM rf1) AS BIGINT) AS n_inserted,
           CAST((SELECT count(*) FROM rf2_keys) AS BIGINT) AS n_deleted,
           CAST(a.cents0 AS BIGINT) AS cents_before,
           CAST(b2.cents1 AS BIGINT) AS cents_after
    FROM a CROSS JOIN b2
    """,
)
def q_tpch_refresh(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """TPC-H refresh-function pair (RF1/RF2) against a managed catalog
    copy of ``orders`` — the ACID-ish maintenance surface the 22 SELECT
    queries leave untested: RF1 INSERTs a deterministic 0.1% batch of
    new orders (re-keyed past max(o_orderkey) — the sequential-key
    append pattern), RF2 DELETEs the 0.1% oldest orders (rewritten as
    an anti-join rewrite into a v2 table + swap — how an
    immutable-file lakehouse expresses row deletes without Delta/Iceberg
    row-level ops; plain parquet cannot INSERT OVERWRITE from itself). Returns the before/after row and exact-cents
    totals plus both batch sizes, so the driver hash proves BOTH
    mutations landed with no collateral rows.

    Scale shape: RF1 is a filtered scan append; RF2's delete compiles to
    one broadcast anti-join rewrite of the partition files — at 100 TB
    the same statements run against a Delta/Iceberg table and become
    metadata-only ops; the audit query is spine arithmetic.

    Concurrency-safe: every catalog object is suffixed with a
    per-invocation uuid (two simultaneous /query or bench invocations
    cannot race on shared table names), the 1-row audit result is
    localCheckpointed so the managed tables can be dropped before
    returning — DROP TABLE on the managed parquet tables is the only
    filesystem cleanup (no rmtree on config-derived paths)."""
    import uuid as _uuid

    from data_service_spark.io import sweep_orphans_once

    sweep_orphans_once(spark)  # reclaim a crashed predecessor's dss_rf_* dirs
    sfx = _uuid.uuid4().hex[:12]
    src = f"dss_rf_src_{sfx}"
    t1 = f"dss_rf_orders_{sfx}"
    t2 = f"dss_rf_orders_v2_{sfx}"
    rf2 = f"dss_rf2_keys_{sfx}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(src)
    try:
        spark.sql(
            f"CREATE TABLE {t1} USING parquet AS "
            f"SELECT o_orderkey, o_orderdate, o_totalprice FROM {src}"
        )
        before = spark.sql(
            "SELECT count(*) AS n0, sum(CAST(round(o_totalprice * 100) AS"
            f" BIGINT)) AS cents0 FROM {t1}"
        ).collect()[0]
        # RF1: deterministic 0.1% insert batch, re-keyed past max(o_orderkey)
        spark.sql(
            f"""
            INSERT INTO {t1}
            SELECT o_orderkey + (SELECT max(o_orderkey) FROM {src}),
                   o_orderdate, o_totalprice
            FROM {src} WHERE o_orderkey % 1000 < 1
            """
        )
        # RF2: delete the 0.1% oldest via anti-join overwrite (no row-level
        # delete on plain parquet) — re-derive delete keys from the SOURCE so
        # the RF1 rows cannot be selected
        spark.sql(
            f"""
            CREATE OR REPLACE TEMPORARY VIEW {rf2} AS
            SELECT o_orderkey FROM (
              SELECT o_orderkey,
                     row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn,
                     count(*) OVER () AS n
              FROM {src}
            ) t WHERE rn * 1000 <= n
            """
        )
        # parquet tables cannot INSERT OVERWRITE from themselves (Spark reads
        # and writes the same files); the lakehouse pattern is write-new +
        # swap — materialize survivors as the v2 table and audit from it.
        spark.sql(
            f"""
            CREATE TABLE {t2} USING parquet AS
            SELECT * FROM {t1}
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM {rf2})
            """
        )
        n_ins = spark.sql(
            f"SELECT count(*) AS c FROM {src} WHERE o_orderkey % 1000 < 1"
        ).collect()[0].c
        n_del = spark.sql(f"SELECT count(*) AS c FROM {rf2}").collect()[0].c
        return spark.sql(
            f"""
            SELECT CAST({before.n0} AS BIGINT) AS n_before,
                   CAST(count(*) AS BIGINT) AS n_after,
                   CAST({n_ins} AS BIGINT) AS n_inserted,
                   CAST({n_del} AS BIGINT) AS n_deleted,
                   CAST({before.cents0} AS BIGINT) AS cents_before,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents_after
            FROM {t2}
            """
        ).localCheckpoint()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t2}")
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.catalog.dropTempView(rf2)
        spark.catalog.dropTempView(src)


@register(
    "q_star_except",
    oracle="""
    SELECT * EXCLUDE (o_orderdate, o_orderpriority)
    FROM orders WHERE o_totalprice > 400000
    """,
)
def q_star_except(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``SELECT * EXCEPT (cols)`` — the wide-table projection idiom
    (Spark 3.4+/BigQuery spelling; DuckDB spells it ``EXCLUDE``): keep
    everything but the named columns without enumerating a 100-column
    schema. The dialect point is that column PRUNING still applies — the
    excluded columns never reach the scan (ReadSchema drops them), so
    the idiom is free at 100 TB, not sugar over a full-width read.

    The only dialect divergence is the keyword itself; both engines
    resolve the star against the view schema in declaration order, so
    the output schemas align positionally and by name.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT * EXCEPT (o_orderdate, o_orderpriority)
        FROM orders WHERE o_totalprice > 400000
        """
    )


@register(
    "q_order_by_all",
    oracle="""
    SELECT * FROM (
      SELECT o_orderstatus, o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY ALL
      ORDER BY ALL
      LIMIT 5
    ) t
    """,
)
def q_order_by_all(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``ORDER BY ALL`` (Spark 3.4+/DuckDB): lexicographic ordering over
    every select-list column left to right — the exploratory-SQL idiom
    that replaces hand-typing a full ORDER BY. The LIMIT 5 head makes
    the ordering semantically OBSERVABLE through the driver's
    order-insensitive hash: only if both engines agree on the total
    order (including that ALL means select-list order, not table order)
    do they keep the same 5 rows.

    Group-aggregate first (dimension-sized), then the ordered head —
    TakeOrdered over ~15 rows, no global sort of anything corpus-sized.
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderstatus, o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY ALL
          ORDER BY ALL
          LIMIT 5
        ) t
        """
    )


@register(
    "q_identifier_clause",
    oracle="""
    SELECT o_orderstatus AS grp,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_identifier_clause(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``IDENTIFIER(:param)`` (Spark 3.4+): table and column names bound
    as named PARAMETERS instead of string-spliced into the SQL text —
    the injection-safe dynamic-identifier pattern a SQL web service
    (the reference's surface) must use for "group by <user-chosen
    column> of <user-chosen table>" endpoints. A spliced name can smuggle
    `'t; DROP TABLE'`; IDENTIFIER() parses the value strictly as one
    multi-part name, so a payload fails resolution instead of executing.

    The oracle is the RESOLVED query (DuckDB has no IDENTIFIER clause —
    the clause is pure name-binding sugar with zero effect on the plan,
    which is the dialect point: same scan, same aggregate, bound names).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(IDENTIFIER(:val_col)), 2) AS revenue
        FROM IDENTIFIER(:tab) GROUP BY IDENTIFIER(:grp_col)
        """,
        args={
            "grp_col": "o_orderstatus",
            "val_col": "o_totalprice",
            "tab": "orders",
        },
    )


@register(
    "q_distinct_on",
    oracle="""
    SELECT DISTINCT ON (user_id)
           user_id, event_id, event_type, ts AS first_ts
    FROM events
    ORDER BY user_id, ts, event_id
    """,
)
def q_distinct_on(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """DISTINCT ON dialect translation: DuckDB/Postgres `SELECT DISTINCT
    ON (key) ... ORDER BY key, ord` (first row per key) has no Spark SQL
    spelling — the idiomatic Spark form is the row_number()-over-window
    filter, which Catalyst can execute as a partial top-1 per key
    (no full sort of the corpus when the window is rank-limited). Each
    user's FIRST event by (ts, event_id) — event_id breaks timestamp
    ties so both engines pick the identical row.

    Scale: one hash shuffle on user_id; the rank filter is applied
    streaming per key group. The dialect lesson IS the key: engines
    disagree on the spelling, the plan shape (shuffle + per-key top-1)
    is the same.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
        SELECT user_id, event_id, event_type, first_ts FROM (
          SELECT user_id, event_id, event_type, ts AS first_ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        ) q WHERE rn = 1
    """)


@register(
    "q_tvf_range",
    oracle="""
    WITH b AS (
      SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
             datediff('day', CAST(min(date_trunc('day', ts)) AS DATE),
                      CAST(max(date_trunc('day', ts)) AS DATE)) AS span
      FROM events
    ), spine AS (
      SELECT b.d0 + CAST(r.range AS INTEGER) AS day
      FROM b JOIN range(0, 366000) r ON r.range <= b.span
    ), daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def q_tvf_range(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """range() table-valued function as a GAP-FREE calendar spine: both
    engines ship the TVF (Spark `range(0, n)` emits `id`, DuckDB emits
    `range`), bounded by the corpus min/max day and LEFT-joined with the
    daily rollup so silent zero-volume days surface as explicit 0 rows —
    the spine-generation idiom every gap-sensitive monitor upstream
    (k_spc_rules, i_gap_fill's batch twin) depends on. The TVF bound
    (366000 rows, ~1000 years) is a fence, not a horizon — no real
    corpus reaches it, so the spine can never silently truncate (the
    'no silent caps' rule), and the TVF is lazily-planned metadata the
    join predicate prunes to the actual span.

    Scale: the TVF is driver-synthesized metadata (no scan), the
    1-row bounds aggregate broadcasts into it, and the LEFT JOIN is
    calendar-sized against the day rollup — corpus rows cross exactly
    one shuffle.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
        WITH b AS (
          SELECT CAST(min(date_trunc('DAY', ts)) AS DATE) AS d0,
                 datediff(CAST(max(date_trunc('DAY', ts)) AS DATE),
                          CAST(min(date_trunc('DAY', ts)) AS DATE)) AS span
          FROM events
        ), spine AS (
          SELECT date_add(b.d0, CAST(r.id AS INT)) AS day
          FROM b JOIN range(0, 366000) r ON r.id <= b.span
        ), daily AS (
          SELECT CAST(date_trunc('DAY', ts) AS DATE) AS day,
                 count(*) AS n
          FROM events GROUP BY 1
        )
        SELECT s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
        FROM spine s LEFT JOIN daily d USING (day)
    """)


@register(
    "q_semi_anti_sql",
    oracle="""
    SELECT 'semi' AS mode, s_suppkey, s_name
    FROM supplier SEMI JOIN lineitem
      ON s_suppkey = l_suppkey AND l_shipdate >= TIMESTAMP '1997-06-01'
    UNION ALL
    SELECT 'anti' AS mode, s_suppkey, s_name
    FROM supplier ANTI JOIN lineitem
      ON s_suppkey = l_suppkey AND l_shipdate >= TIMESTAMP '1997-06-01'
    """,
)
def q_semi_anti_sql(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SEMI / ANTI join SQL dialect surface: Spark spells them LEFT
    SEMI JOIN / LEFT ANTI JOIN, DuckDB SEMI JOIN / ANTI JOIN — the
    existence-join syntax pair next to the DataFrame-API twins
    (c_join_semi / c_join_anti, which go through ``.join(how=...)``).
    Suppliers with (semi) and without (anti) a shipment since mid-1997,
    tagged and unioned so one result table witnesses both planners'
    existence-join paths; the two branches partition the supplier
    dimension exactly (pinned by test).

    Scale: both branches are one broadcast/hash semi-join each — the
    probe side never fans out (no row multiplication by match count),
    which is the entire point of semi joins at 100 TB.
    """
    return _sql(
        spark,
        sf_dir,
        ["supplier", "lineitem"],
        """
        SELECT 'semi' AS mode, s_suppkey, s_name
        FROM supplier LEFT SEMI JOIN lineitem
          ON s_suppkey = l_suppkey AND l_shipdate >= TIMESTAMP '1997-06-01'
        UNION ALL
        SELECT 'anti' AS mode, s_suppkey, s_name
        FROM supplier LEFT ANTI JOIN lineitem
          ON s_suppkey = l_suppkey AND l_shipdate >= TIMESTAMP '1997-06-01'
        """,
    )


@register(
    "q_sql_udtf",
    oracle="""
    SELECT c.cut, t.event_type, t.n, t.sum_value
    FROM (VALUES (100.0e0), (250.0e0)) c(cut)
    CROSS JOIN LATERAL (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS sum_value
      FROM events WHERE value > c.cut GROUP BY event_type
    ) t
    """,
)
def q_sql_udtf(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """SQL UDTF (Spark 4 ``CREATE FUNCTION … RETURNS TABLE``) invoked
    LATERALLY with a correlated argument — the catalog-resident table
    function a SQL web service exposes so users name a parameterized
    subquery instead of pasting it (the SQL-native sibling of the
    Python UDTF surface ``j_udtf`` / ``j_udtf_table_arg``). The oracle
    inlines the function body as a correlated LATERAL subquery —
    definitionally the same relation, so the hash-match proves Spark's
    UDTF expansion equals the inline plan.

    Cutoffs are spelled ``100.0e0`` (DOUBLE, not DECIMAL) in both
    texts — the standing decimal-literal fence.

    Scale: each lateral invocation is one grouped aggregate with the
    correlated predicate pushed into the scan; the spine is 2 rows, so
    the plan is a bounded union of pushed-down scans, not a row-wise
    loop.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION dss_evt_above(cut DOUBLE)
        RETURNS TABLE (event_type STRING, n BIGINT, sum_value DOUBLE)
        RETURN SELECT event_type, count(*), round(sum(value), 2)
               FROM events WHERE value > cut GROUP BY event_type
        """
    )
    return spark.sql(
        """
        SELECT c.cut, t.event_type, t.n, t.sum_value
        FROM (VALUES (100.0e0), (250.0e0)) c(cut),
             LATERAL dss_evt_above(c.cut) t
        """
    )


@register(
    "q_like_any",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN p_type LIKE '%BRASS' OR p_type LIKE '%COPPER'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_like_any,
           CAST(sum(CASE WHEN p_type LIKE 'PROMO%' AND p_type LIKE '%TIN'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_like_all,
           CAST(sum(CASE WHEN NOT (p_name LIKE '%green%'
                                   OR p_name LIKE '%blue%')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_like_neither
    FROM part GROUP BY p_brand
    """,
)
def q_like_any(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """``LIKE ANY`` / ``LIKE ALL`` multi-pattern predicates (Spark
    dialect) against their portable OR/AND expansion (the oracle text) —
    a translation-pair key like ``q_distinct_on``: the service accepts
    the concise dialect form, and the hash-match proves it equals the
    ANSI expansion DuckDB runs. Covers the negated form too —
    ``NOT LIKE ALL`` ("matches neither") ≡ NOT (… OR …); note the
    dialect trap that ``NOT LIKE ANY`` instead means "fails at least
    one pattern" (probed, not assumed). Corpus strings are non-NULL;
    null semantics of the expansion are pinned separately by the
    b_filter_null_semantics family.

    Scale: all three predicates are scan-stage row filters folded into
    one aggregate pass over ``part`` — no shuffle beyond the
    5-row-group hash aggregate; StartsWith/EndsWith patterns stay
    codegen string ops (no regex compilation).
    """
    return _sql(
        spark,
        sf_dir,
        ["part"],
        """
        SELECT p_brand,
               count(*) AS n_parts,
               CAST(sum(CASE WHEN p_type LIKE ANY ('%BRASS', '%COPPER')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_like_any,
               CAST(sum(CASE WHEN p_type LIKE ALL ('PROMO%', '%TIN')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_like_all,
               CAST(sum(CASE WHEN p_name NOT LIKE ALL ('%green%', '%blue%')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_like_neither
        FROM part GROUP BY p_brand
        """,
    )
