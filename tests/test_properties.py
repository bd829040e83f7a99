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


token_lists = st.lists(st.integers(1, 200), min_size=1, max_size=20)


@given(sizes=token_lists)
@settings(**SETTINGS)
def test_packing_invariants(spark, sizes):
    # Concat-and-chunk packing: offsets stay in [0, 512), pack_ids are
    # non-decreasing in doc order, and start positions reconstruct the
    # running sum exactly.
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = df.select(
        "doc_id", "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start"),
    ).select(
        "doc_id", "n_tokens", "start",
        F.floor(F.col("start") / 512).alias("pack_id"),
        (F.col("start") - F.floor(F.col("start") / 512) * 512).alias("off"),
    )
    rows = c.orderBy("doc_id").collect()
    run = 0
    prev_pack = 0
    for r in rows:
        assert r.start == run
        assert 0 <= r.off < 512
        assert r.pack_id >= prev_pack
        prev_pack = r.pack_id
        run += r.n_tokens


vecs = st.lists(
    st.lists(st.floats(-1, 1, width=32, allow_nan=False), min_size=4, max_size=4).filter(
        lambda v: max(abs(x) for x in v) > 1e-6
    ),
    min_size=1,
    max_size=6,
)


@given(vs=vecs)
@settings(**SETTINGS)
def test_quantization_error_bound(spark, vs):
    # absmax-int8: per-element reconstruction error < scale/127 + eps, so the
    # L1 error over dim d is bounded by d*amax/127.
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, v array<double>",
    )
    amax = F.expr("array_max(transform(v, x -> abs(x)))")
    err = F.expr(
        "aggregate(transform(v, x -> abs(x - floor(x / amax * 127) * amax / 127)),"
        " 0D, (a, x) -> a + x)"
    )
    for r in df.select(amax.alias("amax"), err.alias("err"), F.size("v").alias("d")).collect():
        assert r.err <= r.d * r.amax / 127 + 1e-9


@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True))
@settings(**SETTINGS)
def test_hash_split_stable_under_permutation(spark, ids):
    # The split label depends only on the key, never on row order or
    # partitioning — the reproducibility contract of hash-based splitting.
    expr = (
        "CASE WHEN CAST(conv(substr(md5(concat('split:', CAST(doc_id AS STRING))), 1, 8),"
        " 16, 10) AS BIGINT) % 100 < 90 THEN 'train' ELSE 'other' END"
    )
    a = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    b = spark.createDataFrame([(i,) for i in reversed(ids)], "doc_id long").repartition(5)
    ga = {r.doc_id: r.s for r in a.select("doc_id", F.expr(expr).alias("s")).collect()}
    gb = {r.doc_id: r.s for r in b.select("doc_id", F.expr(expr).alias("s")).collect()}
    assert ga == gb


words_st = st.lists(st.sampled_from(["aa", "ab", "ba", "bb", "cc"]), min_size=1, max_size=8)


@given(docs=st.lists(words_st, min_size=2, max_size=6))
@settings(**SETTINGS)
def test_levenshtein_banding_is_complete(spark, docs):
    # The length-band fan-out join must find EXACTLY the pairs the brute
    # force predicate defines (|Δlen| <= 3 AND lev <= 3) — banding is a
    # pure optimization, never a filter.
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, pfx string")
    p = df.withColumn("l", F.length("pfx"))
    a = p.select(F.col("doc_id").alias("d1"), F.col("pfx").alias("p1"),
                 F.col("l").alias("l1"), F.floor(F.col("l") / 4).alias("band"))
    b = p.select(F.col("doc_id").alias("d2"), F.col("pfx").alias("p2"),
                 F.col("l").alias("l2"),
                 F.explode(F.array(F.floor(F.col("l") / 4) - 1,
                                   F.floor(F.col("l") / 4),
                                   F.floor(F.col("l") / 4) + 1)).alias("band"))
    banded = {
        (r.d1, r.d2)
        for r in a.join(b, ["band"])
        .filter((F.col("d1") < F.col("d2"))
                & (F.abs(F.col("l1") - F.col("l2")) <= 3)
                & (F.levenshtein("p1", "p2") <= 3))
        .collect()
    }
    import itertools

    def lev(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy)))
            prev = cur
        return prev[-1]

    brute = {
        (i, j)
        for (i, x), (j, y) in itertools.combinations(rows, 2)
        if abs(len(x) - len(y)) <= 3 and lev(x, y) <= 3
    }
    assert banded == brute


@given(bals=st.lists(st.integers(-999, 999), min_size=2, max_size=10, unique=True))
@settings(**SETTINGS)
def test_band_bucket_join_is_complete(spark, bals):
    # Width-100 bucketing with 3-bucket fan-out finds exactly the
    # |Δbal| < 100 pairs — including across negative/positive bucket edges.
    rows = [(i, float(b)) for i, b in enumerate(bals)]
    df = spark.createDataFrame(rows, "k long, bal double")
    a = df.select(F.col("k").alias("k1"), F.col("bal").alias("b1"),
                  F.floor(F.col("bal") / 100).alias("bkt"))
    b = df.select(F.col("k").alias("k2"), F.col("bal").alias("b2"),
                  F.explode(F.array(F.floor(F.col("bal") / 100) - 1,
                                    F.floor(F.col("bal") / 100),
                                    F.floor(F.col("bal") / 100) + 1)).alias("bkt"))
    got = {
        (r.k1, r.k2)
        for r in a.join(b, ["bkt"])
        .filter((F.col("k1") < F.col("k2")) & (F.abs(F.col("b1") - F.col("b2")) < 100))
        .collect()
    }
    import itertools

    brute = {
        (i, j)
        for (i, x), (j, y) in itertools.combinations(rows, 2)
        if abs(x - y) < 100
    }
    assert got == brute


@given(ids=st.lists(st.integers(0, 100000), min_size=0, max_size=30))
@settings(**SETTINGS)
def test_bitmap_distinct_equals_exact(spark, ids):
    """d_agg_bitmap's algebra: bucketed bitmap_construct_agg + bitmap_count
    equals COUNT(DISTINCT) on arbitrary non-negative keys — including the
    bucket-boundary and empty-input cases the corpus never hits."""
    if not ids:
        return
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    via_bitmap = (
        df.select(
            F.expr("bitmap_bucket_number(k)").alias("b"),
            F.expr("bitmap_bit_position(k)").alias("p"),
        )
        .groupBy("b")
        .agg(F.expr("bitmap_construct_agg(p)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        .collect()[0]["n"]
    )
    assert via_bitmap == len(set(ids))


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=0,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_bag_setops_multiplicity(spark, vals):
    """exceptAll/intersectAll multiset laws vs Python Counter arithmetic:
    |A ∖ B| + |A ∩ B| = |A| element-wise, on arbitrary multiplicities."""
    from collections import Counter

    a = [(k,) for k, tag in vals if tag >= 0]
    b = [(k,) for k, tag in vals if tag < 0]
    dfa = spark.createDataFrame(a or [(None,)], "k int").filter("k IS NOT NULL")
    dfb = spark.createDataFrame(b or [(None,)], "k int").filter("k IS NOT NULL")
    ca, cb = Counter(k for (k,) in a), Counter(k for (k,) in b)
    got_minus = Counter(r.k for r in dfa.exceptAll(dfb).collect())
    got_inter = Counter(r.k for r in dfa.intersectAll(dfb).collect())
    assert got_minus == ca - cb
    assert got_inter == ca & cb


@given(
    prices=st.lists(
        st.integers(1, 2000).map(lambda c: c / 100.0 + 900.0),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_linear_prefix_band_sum_equals_direct(spark, prices):
    """The distributed integer-cent prefix-sum decomposition of a ±δ band
    sum (e_win_range_frame_linear's algebra, δ=$5 here) must equal the
    direct per-row band sum on arbitrary 2dp price lists."""
    rows = [(i, p) for i, p in enumerate(prices)]
    df = spark.createDataFrame(rows, "id long, price double")
    pc = F.round(F.col("price") * 100).cast("long")
    cents = df.select("id", pc.alias("pc"))
    # direct quadratic reference, computed in pandas
    import pandas as pd

    ref = cents.toPandas()
    expect = {
        r.id: int(ref.pc[(ref.pc >= r.pc - 500) & (ref.pc <= r.pc + 500)].sum())
        for r in ref.itertuples()
    }
    # prefix-sum decomposition: mass table + two probes per row
    mass = cents.groupBy("pc").agg(F.sum("pc").alias("mass")).select(
        F.col("pc").alias("val"), "mass", F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("id"), F.lit(None).cast("string").alias("kind"),
    )
    lo = cents.select((F.col("pc") - 501).alias("val"), F.lit(0).cast("long").alias("mass"),
                      F.lit(1).alias("is_probe"), "id", F.lit("lo").alias("kind"))
    hi = cents.select((F.col("pc") + 500).alias("val"), F.lit(0).cast("long").alias("mass"),
                      F.lit(1).alias("is_probe"), "id", F.lit("hi").alias("kind"))
    from pyspark.sql.window import Window

    u = mass.unionByName(lo).unionByName(hi).withColumn(
        "chunk", F.floor(F.col("val") / 2000).cast("long")
    )
    wloc = (Window.partitionBy("chunk").orderBy("val", "is_probe")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = u.withColumn("loc", F.sum("mass").over(wloc))
    totals = u.groupBy("chunk").agg(F.sum("mass").alias("cm"))
    wc = Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select("chunk", F.coalesce(F.sum("cm").over(wc), F.lit(0)).alias("off"))
    probes = (local.filter(F.col("is_probe") == 1)
              .join(offs, "chunk")
              .select("id", "kind", (F.col("loc") + F.col("off")).alias("prefix")))
    got = (probes.groupBy("id")
           .agg((F.max(F.when(F.col("kind") == "hi", F.col("prefix")))
                 - F.max(F.when(F.col("kind") == "lo", F.col("prefix")))).alias("band")))
    for r in got.collect():
        assert r.band == expect[r.id], (r.id, r.band, expect[r.id])


@given(
    sizes=st.lists(st.integers(1, 700), min_size=1, max_size=30),
    shards=st.integers(2, 5),
)
@settings(**SETTINGS)
def test_sharded_packing_matches_per_shard_global(spark, sizes, shards):
    """Sharded packing must equal running the global packing algebra
    independently inside each shard, for ANY shard assignment."""
    rows = [(i, n, i % shards) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, shard long")
    from pyspark.sql.window import Window

    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    got = df.select(
        "doc_id", "shard",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512).cast("long").alias("pack_id"),
    ).collect()
    # reference: python per shard
    import collections

    cum = collections.defaultdict(int)
    expect = {}
    for i, n, s in rows:  # doc_id order == insertion order here
        expect[i] = cum[s] // 512
        cum[s] += n
    for r in got:
        assert r.pack_id == expect[r.doc_id]


from data_service_spark.queries.scalars import TRY_INT_GUARD_SQL

_CAST_GUARD = (
    f"CASE WHEN s RLIKE {TRY_INT_GUARD_SQL} THEN try_cast(s AS INT) END"
)
# Stress chars: digits/signs, ASCII control + space + DEL (trimmed by
# Spark's string->int cast), C1 and unicode whitespace (NOT trimmed),
# letters, dots — the domains where a guard/cast mismatch would hide.
_cast_strings = st.lists(
    st.text(
        alphabet="0189+-. aZ\t\n\x01\x1f\x7f\x80  ",
        min_size=0,
        max_size=10,
    ),
    min_size=1,
    max_size=25,
)


@given(strings=_cast_strings)
@settings(**SETTINGS)
def test_cast_guard_equals_unguarded_try_cast(spark, strings):
    """h_cast's RLIKE plausibility guard (a perf short-circuit around
    TRY-mode ANSI error construction) must be SEMANTICALLY invisible:
    guarded CASE ≡ bare try_cast on any string, including control-char
    trim zones, unicode whitespace, and sign/dot edge cases."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "i long, s string"
    )
    rows = df.select(
        "i",
        F.expr("try_cast(s AS INT)").alias("bare"),
        F.expr(_CAST_GUARD).alias("guarded"),
    ).collect()
    for r in rows:
        assert r.bare == r.guarded, (strings[r.i], r.bare, r.guarded)
