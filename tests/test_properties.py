"""Property-based tests (SURVEY.md §5.4) — algebraic invariants the oracle
harness can't express, over Hypothesis-generated inputs. Example counts are
kept small: each example is a real Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

docs = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)
keysets = st.lists(st.integers(0, 20), min_size=0, max_size=12)


@given(texts=docs)
@settings(**SETTINGS)
def test_dedup_idempotent(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def dedup(d):
        return (
            d.withColumn("h", F.md5(F.lower(F.trim("text"))))
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
            .drop("h")
        )

    once = {r.doc_id for r in dedup(df).collect()}
    kept = df.filter(F.col("doc_id").isin(once) if once else F.lit(False))
    twice = {r.doc_id for r in dedup(kept).collect()}
    assert once == twice


@given(a=keysets, b=keysets)
@settings(**SETTINGS)
def test_set_algebra(spark, a, b):
    da = spark.createDataFrame([(x,) for x in a] or [(None,)], "k int").filter(
        "k IS NOT NULL"
    )
    db = spark.createDataFrame([(x,) for x in b] or [(None,)], "k int").filter(
        "k IS NOT NULL"
    )
    union = {r.k for r in da.union(db).distinct().collect()}
    inter = {r.k for r in da.intersect(db).collect()}
    exc = {r.k for r in da.exceptAll(db).distinct().collect()}
    sa, sb = set(a), set(b)
    assert union == sa | sb
    assert inter == sa & sb
    # exceptAll keeps multiplicity; distinct() of it still contains every
    # element with count(a) > count(b), which is a superset of sa - sb.
    assert exc >= sa - sb and exc <= sa


@given(vals=st.lists(st.integers(-100, 100), min_size=1, max_size=15))
@settings(**SETTINGS)
def test_running_sum_totals(spark, vals):
    # Last value of an unbounded-preceding running sum == groupBy sum.
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v long"
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    last_running = (
        df.withColumn("rs", F.sum("v").over(w)).orderBy(F.desc("i")).first().rs
    )
    assert last_running == sum(vals)
