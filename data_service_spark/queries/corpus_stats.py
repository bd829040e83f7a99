"""Corpus-level statistical profiles (SURVEY.md §2.O continuation).

Language-model corpora are audited through distributional statistics before
training: Zipf rank-frequency slope (is the source natural-language-like or
boilerplate?), PMI collocations (which token pairs are glued — template
detection), and term burstiness (cf/df — topical terms repeat within few
docs, function words spread thin). Each is a two-shuffle aggregate over the
token stream, so the same audit runs at 100 TB: the shuffles carry VOCABULARY
rows (bounded), never corpus rows.

Determinism: every statistic reduces to ratios/logs of EXACT integer counts,
so both engines derive identical doubles before the final rounding; the Zipf
regression is written as the explicit least-squares ratio (same formula text
in both dialects) rather than each engine's regr_slope internals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_service_spark.io import corpus_memo, load
from data_service_spark.registry import register

# ------------------------------------------------------- Zipf slope ----


@register(
    "k_text_zipf",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT lang, term, count(*) AS cnt FROM tok GROUP BY lang, term
    ), ranked AS (
      SELECT lang,
             ln(CAST(row_number() OVER (
                  PARTITION BY lang ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y
      FROM tf
    )
    SELECT lang, count(*) AS n_terms,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x)), 4) AS zipf_slope
    FROM ranked GROUP BY lang
    """,
)
def k_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf slope: least-squares slope of ln(freq) on ln(rank)
    over the language's term-frequency table. Natural text sits near -1;
    flat slopes flag templated/boilerplate sources — a standard corpus
    health probe (Piantadosi 2014).

    Scale: token explode → (lang, term) count (map-side combine shrinks the
    shuffle to vocabulary size), per-lang rank window over vocabulary rows
    only, then a 5-row reduce. The slope is the explicit Σ-formula so both
    engines evaluate the same arithmetic tree; the (ln rank, ln freq)
    power sums accumulate in DOUBLE, so no int64 wrap governor applies —
    the 4dp rounding absorbs partial-order ulp drift.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("term"))
    ranked = tf.select(
        "lang",
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1))
    return ranked.groupBy("lang").agg(
        n.alias("n_terms"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            4,
        ).alias("zipf_slope"),
    )


# ------------------------------------------------- PMI collocations ----


@corpus_memo
def _unigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, n) — corpus term frequencies over raw whitespace tokens,
    memoized per (session, corpus dir): the ONE vocabulary-sized reduce
    the n-gram statistics family shares (collocations' unigram side and
    token total, the bigram LM's vocabulary size, the unigram-logprob
    model). A production corpus pipeline materializes the term
    dictionary once per snapshot and every statistic reads it. Same
    tokenization as the consumers' oracles: split(text, ' '), no
    casefold, no empty-token filter."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@corpus_memo
def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, c) — corpus adjacent-bigram counts over raw whitespace
    tokens, memoized per (session, corpus dir): the dictionary-sized
    reduce shared by the collocation miner, the Kneser–Ney LM, and the
    bigram-logprob scorer (whose doc-level stream still explodes at its
    own scan — only the CORPUS MODEL tables derive from here). The
    1-token-doc guard mirrors the oracles: docs with <2 tokens
    contribute no bigrams (the sequence(1,0) auto-step fence, ADVICE
    r2). Keys with a different tokenization (k_ngram_entropy_rate:
    lower + empty filter) deliberately do NOT consume this memo."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t"))
    big = toks.select(
        F.explode(
            F.expr(
                "transform(filter(sequence(1, size(t) - 1),"
                " i -> i >= 1 AND i < size(t)),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    return big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))


@register(
    "k_text_collocations",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), big AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) AS r(i)
    ), bc AS (
      SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY w1, w2
    ), uni AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), uc AS (
      SELECT w, count(*) AS c FROM uni GROUP BY w
    ), consts AS (
      SELECT (SELECT count(*) FROM big) AS n_big,
             (SELECT count(*) FROM uni) AS n_tok
    )
    SELECT w1, w2, c_ab,
           round(ln((c_ab * 1.0 / n_big)
                    / ((u1.c * 1.0 / n_tok) * (u2.c * 1.0 / n_tok))), 6)
             AS pmi
    FROM bc JOIN uc u1 ON bc.w1 = u1.w
            JOIN uc u2 ON bc.w2 = u2.w
            CROSS JOIN consts
    WHERE c_ab >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def k_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-bigram collocations by pointwise mutual information,
    min count 5 — the template/boilerplate detector (word pairs glued far
    beyond their unigram rates are markup, legal footers, generated text).

    PMI = ln(p(ab) / (p(a)·p(b))) from exact integer counts: the bigram and
    unigram count tables come from the session-memoized corpus reduces
    (``_bigram_counts`` / ``_unigram_counts`` — shared with the bigram-LM
    keys; totals are sums over the pinned dictionaries, so the corpus is
    never re-exploded here), the unigram side joins per AQE, and the
    final top-20 sorts only the |V|²-bounded collocation table. Nothing
    proportional to corpus size crosses a shuffle after tokenization.
    """
    bc = _bigram_counts(spark, sf_dir).select(
        "w1", "w2", F.col("c").alias("c_ab")
    )
    uc = _unigram_counts(spark, sf_dir).select(
        F.col("term").alias("w"), F.col("n").alias("c")
    )
    consts = bc.agg(F.sum("c_ab").alias("n_big")).crossJoin(
        uc.agg(F.sum("c").alias("n_tok"))
    )
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("c_ab") * 1.0 / F.col("n_big"))
            / (
                (F.col("c1") * 1.0 / F.col("n_tok"))
                * (F.col("c2") * 1.0 / F.col("n_tok"))
            )
        ),
        6,
    )
    return (
        bc.filter(F.col("c_ab") >= 5)
        # u1/u2 are vocab-sized (Heaps-law growth) — no broadcast hint,
        # AQE decides; consts is a 1-row scalar and stays broadcast
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(consts))
        .select("w1", "w2", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


# --------------------------------------------------- term burstiness ----


@register(
    "k_text_burstiness",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT term,
           count(*) AS cf,
           count(DISTINCT doc_id) AS df,
           round(count(*) * 1.0 / count(DISTINCT doc_id), 4) AS burstiness
    FROM tok GROUP BY term
    """,
)
def k_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term burstiness cf/df (collection frequency over document
    frequency): topical terms cluster inside few documents (high), function
    words spread thin (≈1) — the Church/Gale signal used to pick keyword
    candidates and spot machine-generated repetition.

    One exploded groupBy; the distinct-doc count rewrites to a two-level
    partial aggregate (Spark's count(DISTINCT) expansion), both levels
    keyed on vocabulary-sized groups.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
        F.round(
            F.count(F.lit(1)) * 1.0 / F.countDistinct("doc_id"), 4
        ).alias("burstiness"),
    )


# ---------------------------------------------------- feature hashing ----


@register(
    "k_text_hashing_trick",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), h AS (
      SELECT doc_id,
             ('0x' || substr(md5(concat('fh:', term)), 1, 8))::BIGINT % 1024
               AS bucket,
             CASE WHEN ('0x' || substr(md5(concat('fh:', term)), 9, 1))::BIGINT
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok
    )
    SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS weight
    FROM h GROUP BY doc_id, bucket
    HAVING sum(sgn) <> 0
    """,
)
def k_text_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009, the Vowpal-Wabbit trick):
    terms map to a FIXED 1024-bucket space via a salted hash, with an
    alternate-sign bit so collisions cancel in expectation — the
    vocabulary-free featurization that needs no dictionary build, no
    fitting pass, and no vocabulary shuffle at 100 TB.

    One exploded projection (hash + sign are scan-stage codegen) and one
    (doc, bucket) groupBy whose map-side combine bounds every partial at
    1024 entries per doc. Pure integer arithmetic end to end — the hash
    splice keeps both engines bit-identical.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    bucket = F.expr(
        "CAST(conv(substr(md5(concat('fh:', term)), 1, 8), 16, 10) AS BIGINT)"
        " % 1024"
    )
    sgn = F.expr(
        "CASE WHEN CAST(conv(substr(md5(concat('fh:', term)), 9, 1), 16, 10)"
        " AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("weight"))
        .filter(F.col("weight") != 0)
    )


# ------------------------------------------ co-occurrence Jaccard graph ----


@register(
    "k_graph_jaccard",
    oracle="""
    WITH adj AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), deg AS (
      SELECT event_type, count(*) AS deg FROM adj GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
      FROM adj a JOIN adj b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.t1, i.t2, i.n_both,
           round(i.n_both * 1.0 / (d1.deg + d2.deg - i.n_both), 4)
             AS jaccard
    FROM inter i JOIN deg d1 ON i.t1 = d1.event_type
                 JOIN deg d2 ON i.t2 = d2.event_type
    """,
)
def k_graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard node similarity on the bipartite
    (event_type, user) graph: J(a,b) = |users(a) ∩ users(b)| / |∪| — the
    co-occurrence similarity behind item-item recommenders and graph-based
    dedup candidate generation.

    Intersections come from ONE self-join of the deduplicated adjacency
    list keyed on user (each user contributes its type-pair combinations —
    at scale, per-user combination fan-out bounded by per-user degree);
    degrees are a dimension-sized aggregate broadcast into the final
    projection. Pure integer counts — no float surface beyond the final
    ratio.
    """
    e = load(spark, sf_dir, "events")
    adj = e.select("event_type", "user_id").distinct()
    deg = adj.groupBy("event_type").agg(F.count(F.lit(1)).alias("deg"))
    a = adj.select(F.col("event_type").alias("t1"), "user_id")
    b = adj.select(F.col("event_type").alias("t2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    d1 = deg.select(F.col("event_type").alias("t1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("event_type").alias("t2"), F.col("deg").alias("deg2"))
    return (
        inter.join(F.broadcast(d1), "t1")
        .join(F.broadcast(d2), "t2")
        .select(
            "t1",
            "t2",
            "n_both",
            F.round(
                F.col("n_both")
                * 1.0
                / (F.col("deg1") + F.col("deg2") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
    )


# ----------------------------------------------- heavy-tail diagnostics ----


@register(
    "k_tail_hill",
    oracle="""
    WITH ranked AS (
      SELECT value,
             row_number() OVER (ORDER BY round(value, 6) DESC, event_id) AS r
      FROM events WHERE value > 0
    ), topk AS (
      SELECT value, r FROM ranked WHERE r <= 101
    ), xk AS (
      SELECT value AS xmin FROM topk WHERE r = 101
    )
    SELECT CAST(100 AS BIGINT) AS k,
           round((SELECT xmin FROM xk), 4) AS x_k,
           round(100.0 / sum(ln(t.value / (SELECT xmin FROM xk))), 4)
             AS hill_alpha
    FROM topk t WHERE t.r <= 100
    """,
)
def k_tail_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the heavy-tail exponent over the event-value
    distribution (k=100 upper order statistics): α̂ = k / Σ ln(x_i / x_k).
    Small α means a fat tail — the diagnostic that decides whether mean-
    based monitors (z-score) are even valid or the MAD/quantile family is
    required, and how aggressively winsorization must clip.

    The ONLY ordered work is a top-101 TakeOrderedAndProject (per-partition
    heaps, no global sort); the log-sum is a 100-row reduce. Ranks pin on
    6dp-rounded values with event_id tiebreaks.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = Window.orderBy(F.round("value", 6).desc(), F.col("event_id"))
    ranked = e.select("value", F.row_number().over(w).alias("r")).filter(
        F.col("r") <= 101
    )
    xk = ranked.filter(F.col("r") == 101).select(F.col("value").alias("xmin"))
    top = ranked.filter(F.col("r") <= 100)
    return (
        top.crossJoin(F.broadcast(xk))
        .agg(
            F.lit(100).cast("long").alias("k"),
            F.round(F.first("xmin"), 4).alias("x_k"),
            F.round(
                100.0 / F.sum(F.log(F.col("value") / F.col("xmin"))), 4
            ).alias("hill_alpha"),
        )
    )


@register(
    "k_gini_sources",
    oracle="""
    WITH src AS (
      SELECT source, CAST(sum(n_chars) AS DOUBLE) AS x
      FROM documents GROUP BY 1
    ), ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, source) AS i,
             count(*) OVER () AS n, sum(x) OVER () AS tot
      FROM src
    )
    SELECT CAST(max(n) AS BIGINT) AS n_sources,
           CAST(max(tot) AS BIGINT) AS total_chars,
           round(2.0 * sum(i * x) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 4) AS gini
    FROM ranked
    """,
)
def k_gini_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-source character mass — the concentration
    number a data-mix report leads with (0 = every source contributes
    equally, →1 = one crawl dominates). Computed by the sorted-rank
    identity G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n.

    The sort runs over the SOURCE-level aggregate (dimension-sized — 20
    rows here, maybe thousands at 100 TB), never over documents; the
    corpus-sized work is one map-side-combined groupBy. Integer char
    counts make the rank products exact.
    """
    d = load(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("x")
    )
    w = Window.orderBy("x", "source")
    wall = Window.partitionBy()
    ranked = src.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("tot"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_sources"),
        F.max("tot").cast("long").alias("total_chars"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            4,
        ).alias("gini"),
    )


# ---------------------------------------------------- association rules ----


@register(
    "k_assoc_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n_users AS (
      SELECT count(DISTINCT user_id) AS n FROM baskets
    ), item AS (
      SELECT event_type, count(*) AS c FROM baskets GROUP BY 1
    ), pair AS (
      SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS c_ab
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY 1, 2
    )
    SELECT p.lhs, p.rhs,
           round(p.c_ab * 1.0 / n.n, 4) AS support,
           round(p.c_ab * 1.0 / ia.c, 4) AS confidence,
           round(p.c_ab * 1.0 * n.n / (ia.c * ib.c), 4) AS lift
    FROM pair p JOIN item ia ON p.lhs = ia.event_type
                JOIN item ib ON p.rhs = ib.event_type
                CROSS JOIN n_users n
    """,
)
def k_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over user event baskets: for every directed
    event-type pair lhs→rhs, support P(lhs∧rhs), confidence P(rhs|lhs),
    and lift P(lhs∧rhs)/(P(lhs)P(rhs)) — the market-basket triple
    (Agrawal & Srikant 1994) behind "users who X also Y" and feature
    co-occurrence audits; lift>1 is genuine association, ≈1 independence
    (k_graph_jaccard's probabilistic sibling).

    The basket dedup is the only corpus-sized shuffle; pair counts come
    from a user-keyed self-join whose fan-out is bounded by per-user
    distinct-item degree. Pure integer counts into three final ratios.
    """
    e = load(spark, sf_dir, "events")
    baskets = e.select("user_id", "event_type").distinct()
    n_users = baskets.agg(F.countDistinct("user_id").alias("n"))
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select(F.col("event_type").alias("lhs"), "user_id")
    b = baskets.select(F.col("event_type").alias("rhs"), "user_id")
    pair = (
        a.join(b, "user_id")
        .filter(F.col("lhs") != F.col("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ia = item.select(F.col("event_type").alias("lhs"), F.col("c").alias("ca"))
    ib = item.select(F.col("event_type").alias("rhs"), F.col("c").alias("cb"))
    return (
        pair.join(F.broadcast(ia), "lhs")
        .join(F.broadcast(ib), "rhs")
        .crossJoin(F.broadcast(n_users))
        .select(
            "lhs",
            "rhs",
            F.round(F.col("c_ab") * 1.0 / F.col("n"), 4).alias("support"),
            F.round(F.col("c_ab") * 1.0 / F.col("ca"), 4).alias("confidence"),
            F.round(
                F.col("c_ab") * 1.0 * F.col("n") / (F.col("ca") * F.col("cb")),
                4,
            ).alias("lift"),
        )
    )


# ------------------------------------------- chi-square feature select ----


@register(
    "k_chi2_terms",
    oracle="""
    WITH pres AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), lab AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ), tot AS (
      SELECT count(*) AS n, sum(y) AS n_pos FROM lab
    ), cell AS (
      SELECT p.term,
             count(*) AS df,
             sum(l.y) AS a
      FROM pres p JOIN lab l USING (doc_id)
      GROUP BY p.term
    )
    SELECT term, CAST(df AS BIGINT) AS df,
           round(t.n * 1.0
                 * pow(a * (t.n - df - (t.n_pos - a)) 
                       - (df - a) * (t.n_pos - a), 2)
                 / (df * (t.n - df) * t.n_pos * (t.n - t.n_pos)), 4)
             AS chi2
    FROM cell CROSS JOIN tot t
    ORDER BY round(t.n * 1.0
                 * pow(a * (t.n - df - (t.n_pos - a))
                       - (df - a) * (t.n_pos - a), 2)
                 / (df * (t.n - df) * t.n_pos * (t.n - t.n_pos)), 4) DESC,
             term
    LIMIT 20
    """,
)
def k_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² feature selection: the 20 terms whose document presence is most
    dependent on the lang='en' label, by the 2×2 chi-square statistic
    χ² = n(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) — the classic pre-neural
    discriminative-vocabulary selector (Yang & Pedersen 1997), and in a
    curation stack the "which tokens leak the label" audit run before
    training a fairness-sensitive classifier.

    Presence dedup → one vocabulary-keyed aggregate carrying two integer
    cells per term (the other two derive from the broadcast totals); the
    statistic is exact-integer arithmetic into one division, ranked on
    the 4dp round with term tiebreaks.
    """
    d = load(spark, sf_dir, "documents")
    pres = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    lab = d.select(
        "doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    tot = lab.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos"))
    cell = (
        pres.join(lab, "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("y").alias("a"))
    )
    n, np_, df_, a = (F.col(c) for c in ["n", "n_pos", "df", "a"])
    b = df_ - a
    c = np_ - a
    dd = n - df_ - c
    chi2 = F.round(
        n * 1.0 * F.pow(a * dd - b * c, 2)
        / (df_ * (n - df_) * np_ * (n - np_)),
        4,
    )
    return (
        cell.crossJoin(F.broadcast(tot))
        .select("term", df_.cast("long").alias("df"), chi2.alias("chi2"))
        .orderBy(F.col("chi2").desc(), "term")
        .limit(20)
    )


# --------------------------------------------------- head-gram coverage ----


@register(
    "k_text_ngram_coverage",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT array_to_string(w[i:i+3], ' ') AS gram
      FROM t, unnest(list_transform(generate_series(1, len(w) - 3),
                                    i -> i)) AS u(i)
    ), c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram),
    top AS (
      SELECT n FROM c ORDER BY n DESC, gram LIMIT 1000
    ), s AS (
      SELECT (SELECT count(*) FROM c) AS n_distinct,
             (SELECT sum(n) FROM c) AS n_total,
             (SELECT sum(n) FROM top) AS n_top
    )
    SELECT CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(n_top AS BIGINT) AS n_top,
           CAST(floor(n_top * 1000000.0 / nullif(n_total, 0)) AS BIGINT)
             AS coverage_ppm
    FROM s
    """,
)
def k_text_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-heaviness audit: what fraction of all 4-gram OCCURRENCES the
    1000 most frequent distinct 4-grams cover (parts-per-million, exact
    integer arithmetic). High coverage = templated/boilerplate corpus
    (nav chrome, legal footers, generated text); low = diverse prose —
    the one-number diversity complement to k_text_zipf's slope.

    Count table is vocabulary-sized after a map-side-combined groupBy;
    the top-1000 selection is orderBy+limit = TakeOrderedAndProject
    (per-partition heaps, never a full sort of the gram table); the
    final row is pure integer division floored on both engines (no
    round-half ambiguity by construction).
    """
    d = load(spark, sf_dir, "documents")
    grams = d.select(F.split("text", " ").alias("w")).select(
        F.explode(
            # guarded like k_text_collocations: docs under 4 tokens emit
            # zero grams (sequence(1, n<=0) would auto-step -1 in Spark)
            F.expr(
                "transform(filter(sequence(1, greatest(size(w) - 3, 1)),"
                " i -> i <= size(w) - 3),"
                " i -> concat_ws(' ', slice(w, i, 4)))"
            )
        ).alias("gram")
    )
    c = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    top = (
        c.orderBy(F.col("n").desc(), "gram")
        .limit(1000)
        .agg(F.sum("n").alias("n_top"))
    )
    tot = c.agg(
        F.count(F.lit(1)).alias("n_distinct"), F.sum("n").alias("n_total")
    )
    return tot.crossJoin(F.broadcast(top)).select(
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_total").cast("long").alias("n_total"),
        F.col("n_top").cast("long").alias("n_top"),
        F.floor(
            F.col("n_top") * 1000000.0 / F.nullif("n_total", F.lit(0))
        )
        .cast("long")
        .alias("coverage_ppm"),
    )


# ----------------------------------------------------- readability score ----


@register(
    "k_text_readability",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             greatest(len(string_split(text, '. ')), 1) AS n_sent,
             greatest(len(string_split(text, ' ')), 1) AS n_words,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      FROM documents
    )
    SELECT doc_id, CAST(n_sent AS BIGINT) AS n_sent,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_syll AS BIGINT) AS n_syll,
           round(0.39 * (n_words * 1.0 / n_sent)
                 + 11.8 * (n_syll * 1.0 / n_words) - 15.59, 4) AS fk_grade
    FROM m
    """,
)
def k_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade-level per document, from deterministic
    proxies: sentences = '. '-splits, words = whitespace tokens,
    syllables = vowel-group runs ('[aeiouy]+' — the classic cheap
    approximation). Readability is a standard quality-mix feature
    (too-low = listicles/spam, too-high = OCR garbage/legalese), cheap
    enough to run on every document at 100 TB: a zero-shuffle projection
    — splits and one regexp scan per row, no aggregation at all.

    The identical regex runs on both engines (character-class + '+' is
    dialect-free between Java regex and RE2).
    """
    d = load(spark, sf_dir, "documents")
    n_sent = F.greatest(F.size(F.split("text", "\\. ")), F.lit(1))
    n_words = F.greatest(F.size(F.split("text", " ")), F.lit(1))
    n_syll = F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    m = d.select(
        "doc_id",
        n_sent.alias("n_sent"),
        n_words.alias("n_words"),
        n_syll.alias("n_syll"),
    )
    return m.select(
        "doc_id",
        F.col("n_sent").cast("long").alias("n_sent"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_syll").cast("long").alias("n_syll"),
        F.round(
            0.39 * (F.col("n_words") * 1.0 / F.col("n_sent"))
            + 11.8 * (F.col("n_syll") * 1.0 / F.col("n_words"))
            - 15.59,
            4,
        ).alias("fk_grade"),
    )


# ------------------------------------- contingency independence chi2 ----


_CONTINGENCY_CELL_SQL = (
    "SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2"
)


def _contingency_final_sql(cell_src: str) -> str:
    return f"""
    WITH cell AS ({cell_src}),
    rowm AS (SELECT source, sum(o) AS r FROM cell GROUP BY 1),
    colm AS (SELECT lang, sum(o) AS c FROM cell GROUP BY 1),
    n AS (SELECT sum(o) AS n FROM cell),
    full_grid AS (
      SELECT rm.source, cm.lang, rm.r, cm.c,
             coalesce(ce.o, 0) AS o
      FROM rowm rm CROSS JOIN colm cm
      LEFT JOIN cell ce ON rm.source = ce.source AND cm.lang = ce.lang
    ), parts AS (
      SELECT source, lang, o, r, c,
             (CAST(o AS DOUBLE) * n.n - CAST(r AS DOUBLE) * c)
               * (CAST(o AS DOUBLE) * n.n - CAST(r AS DOUBLE) * c)
               / (CAST(r AS DOUBLE) * c * n.n) AS term
      FROM full_grid CROSS JOIN n
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((SELECT count(*) FROM rowm) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM colm) - 1 AS BIGINT) AS dof,
           CAST(round(sum(round(term, 8)), 4) + 0.0 AS DOUBLE) AS chi2,
           CAST(round(sqrt(sum(round(term, 8))
                 / ((SELECT n FROM n)
                    * least((SELECT count(*) FROM rowm) - 1,
                            (SELECT count(*) FROM colm) - 1))), 6) + 0.0
             AS DOUBLE) AS cramers_v
    FROM parts
    """


def _body_contingency_chi2() -> str:
    return _contingency_final_sql(_CONTINGENCY_CELL_SQL)


@register("k_contingency_chi2", oracle=_body_contingency_chi2())
def k_contingency_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full source × language contingency-table independence test: χ² =
    ΣΣ(o−e)²/e over the complete grid (zero-filled absent cells — they
    still carry expectation mass) with Cramér's V as the effect size —
    the corpus-heterogeneity summary that says whether sources differ in
    language mix AT ALL before per-term drilldowns (``k_chi2_terms``) or
    reweighting (``k_raking_ipf``) are worth running. Terms compute as
    the integer-exact cross-product form (oN−rc)²/(rcN) and pin at 8dp
    before the sum so partial-aggregation order cannot shift the 4dp
    output.

    Scale shape: map-side reduce to the grid, margins broadcast, one
    grid-sized reduce. The Spark side pins the grid (localCheckpoint +
    view, the k_bradley_terry pattern): `cell` is referenced by rowm/
    colm/n/full_grid and the margins again by the dof/Cramér scalar
    subqueries, which Spark's per-reference CTE inlining blew up into 9
    parquet scans of documents (r13 census); the DuckDB oracle keeps the
    flat chain because it materializes multi-referenced CTEs."""
    import uuid

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    view = f"dss_chi2_cell_{uuid.uuid4().hex[:12]}"
    spark.sql(_CONTINGENCY_CELL_SQL).localCheckpoint() \
        .createOrReplaceTempView(view)
    try:
        return spark.sql(_contingency_final_sql(f"SELECT * FROM {view}"))
    finally:
        spark.catalog.dropTempView(view)


# --------------------------------------------- Kendall rank stability ----


def _body_kendall() -> str:
    return """
    WITH m AS (
      SELECT source, count(*) AS n_docs,
             sum(n_chars) AS tot_chars
      FROM documents GROUP BY source
    ), pairs AS (
      SELECT CASE WHEN (a.n_docs - b.n_docs) * (a.tot_chars - b.tot_chars) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.n_docs - b.n_docs) * (a.tot_chars - b.tot_chars) < 0
                  THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.n_docs = b.n_docs THEN 1 ELSE 0 END AS tie_x,
             CASE WHEN a.tot_chars = b.tot_chars THEN 1 ELSE 0 END AS tie_y
      FROM m a JOIN m b ON a.source < b.source
    ), s AS (
      SELECT sum(conc) AS c, sum(disc) AS d,
             sum(tie_x) AS tx, sum(tie_y) AS ty, count(*) AS n_pairs
      FROM pairs
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
           CAST(round(
             (c - d) / nullif(sqrt(CAST(n_pairs - tx AS DOUBLE))
                              * sqrt(CAST(n_pairs - ty AS DOUBLE)), 0),
             6) + 0.0 AS DOUBLE) AS kendall_tau_b
    FROM s
    """


@register("k_rank_kendall", oracle=_body_kendall())
def k_rank_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between two source rankings — by document count vs by
    total character mass: do "many docs" and "much text" order the
    sources the same way? τ-b is the tie-corrected concordant-discordant
    statistic (the companion of ``k_rank_spearman``'s rho and
    ``k_rank_rbo``'s top-weighted overlap; τ is the one with the clean
    probabilistic reading P(agree)−P(disagree)). Pure integer pair
    counts over the source spine, one final division.

    Scale shape: map-side reduce to the source spine; the O(sources²)
    pair join runs on that dimension, never on documents."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_kendall())


# ----------------------------------------------- DAU/MAU stickiness ----


def _body_dau_mau() -> str:
    return """
    WITH dau AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(date_trunc('month', ts) AS DATE) AS m,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ), mau AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS m,
             count(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT d.m AS month, CAST(count(*) AS BIGINT) AS n_days,
           CAST(mau.mau AS BIGINT) AS mau,
           CAST(floor(avg(d.dau * 1.0)) AS BIGINT) AS avg_dau,
           CAST(floor(sum(d.dau) * 10000.0 / (count(*) * mau.mau))
             AS BIGINT) AS stickiness_bp
    FROM dau d JOIN mau ON d.m = mau.m
    GROUP BY d.m, mau.mau
    """


@register("k_dau_mau", oracle=_body_dau_mau())
def k_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month: mean daily active users over monthly
    active users — the engagement-frequency ratio every product dashboard
    leads with (stickiness 100% = every monthly user active every day).
    Distinct counts are exact; the ratio floor-quantizes to basis points
    from pure integer sums (Σdau·10⁴/(days·mau)).

    Scale shape: two distinct aggregates (the honest cost of exact
    distincts — the sketch path is ``d_agg_hll_sketch``), then a
    month-spine reduce."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_body_dau_mau())


# ------------------------------------------- ABC revenue classes ----


def _body_abc() -> str:
    return """
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey) AS cum,
             sum(cents) OVER () AS tot
      FROM rev
    ), classed AS (
      SELECT l_partkey, cents,
             CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                  WHEN cum * 100 <= tot * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(floor(count(*) * 10000.0
                      / sum(count(*)) OVER ()) AS BIGINT) AS part_share_bp,
           CAST(floor(sum(cents) * 10000.0
                      / sum(sum(cents)) OVER ()) AS BIGINT)
             AS revenue_share_bp
    FROM classed GROUP BY abc
    """


@register("k_abc_classification", oracle=_body_abc())
def k_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: A = parts covering
    the first 80% of cumulative revenue, B = next 15%, C = tail — the
    inventory-control cut (and, in a data pipeline, the "which entities
    deserve expensive treatment" triage; ``e_win_pareto``'s top-80 flag is
    the per-row view, this is the partitioned ledger). Class boundaries
    are integer cross-products (cum·100 ≤ tot·80 — no division), revenue
    is exact cents, ordering is total (cents DESC, partkey).

    Scale shape: one part-keyed reduce, one ordered window over the part
    spine (range-partitioned sort of dimension-sized data), 3-row
    output."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_body_abc())


def _body_eb_shrinkage() -> str:
    return """
    WITH per_source AS (
      SELECT source, count(*) AS n_s,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS k_s
      FROM documents GROUP BY source
    ), q AS (
      SELECT source, n_s, k_s,
             CAST(floor(k_s * 1000000 / n_s) AS BIGINT) AS raw_ppm
      FROM per_source
    ), mom AS (
      SELECT count(*) AS g, sum(raw_ppm) AS s1,
             sum(raw_ppm * raw_ppm) AS s2
      FROM q
    ), ab AS (
      SELECT g, s1, s2,
             CAST(s1 AS DOUBLE) / g / 1000000 AS m,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / g)
               / (g - 1) / 1000000.0 / 1000000.0 AS v
      FROM mom
    ), prior AS (
      SELECT m, v,
             CASE WHEN v > 0 AND m * (1.0 - m) / v - 1.0 > 0
                  THEN m * (1.0 - m) / v - 1.0 ELSE 0.0 END AS prior_n
      FROM ab
    )
    SELECT q.source, CAST(q.n_s AS BIGINT) AS n_docs,
           CAST(q.k_s AS BIGINT) AS k_en, q.raw_ppm,
           CAST(floor(p.prior_n * p.m * 1000000) AS BIGINT) AS alpha_q,
           CAST(floor(p.prior_n * (1.0 - p.m) * 1000000) AS BIGINT)
             AS beta_q,
           CAST(floor((q.k_s + p.prior_n * p.m)
                      / (q.n_s + p.prior_n) * 1000000) AS BIGINT)
             AS shrunk_ppm
    FROM q CROSS JOIN prior p
    """


@register("k_eb_shrinkage", oracle=_body_eb_shrinkage())
def k_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-source English rates
    (method-of-moments prior: α+β = m(1−m)/v − 1 over the source-level
    rates, then posterior-mean (k_s+α)/(n_s+α+β)) — the estimator that
    stops a 30-doc source's noisy 40% rate from outranking a 3000-doc
    source's solid 35% in any per-source league table or mixing decision
    (the James–Stein fix every per-segment dashboard needs). Degenerate
    guard: when between-source variance is at or below binomial noise
    (prior_n ≤ 0) the prior collapses to flat and shrunk = raw.

    Determinism: raw rates floor-quantize to exact ppm integers FIRST,
    the moment sums are BIGINT power sums over those integers (r04
    order-proof-moment convention), and only the final prior/posterior
    arithmetic is floating, emitted floor-ppm. int64 overflow governor:
    raw_ppm ≤ 1e6 → raw_ppm² ≤ 1e12, so Σppm² wraps only past ~9e6
    SOURCES (the sum spans the source spine, not the corpus; DuckDB
    widens to HUGEINT, Spark wraps silently). Scale shape: one
    source-keyed reduce, then all arithmetic on the source spine."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_eb_shrinkage())


def _body_woe() -> str:
    return """
    WITH base AS (
      SELECT doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER () AS n
      FROM base
    ), binned AS (
      SELECT CAST(floor((rn - 1) * 10 / n) AS INT) + 1 AS bin, pos
      FROM ranked
    ), tot AS (
      SELECT sum(pos) AS n_pos_all,
             count(*) - sum(pos) AS n_neg_all
      FROM binned
    ), agg AS (
      SELECT bin, count(*) AS n_bin, sum(pos) AS n_pos,
             count(*) - sum(pos) AS n_neg
      FROM binned GROUP BY bin
    )
    SELECT a.bin, CAST(a.n_bin AS BIGINT) AS n_bin,
           CAST(a.n_pos AS BIGINT) AS n_pos,
           CAST(floor(a.n_pos * 1000000 / a.n_bin) AS BIGINT)
             AS pos_rate_ppm,
           CAST(floor(ln((CAST(a.n_pos AS DOUBLE) * t.n_neg_all)
                         / (CAST(a.n_neg AS DOUBLE) * t.n_pos_all))
                      * 1000000) AS BIGINT) AS woe_micro,
           CAST(floor((CAST(a.n_pos AS DOUBLE) / t.n_pos_all
                       - CAST(a.n_neg AS DOUBLE) / t.n_neg_all)
                      * ln((CAST(a.n_pos AS DOUBLE) * t.n_neg_all)
                           / (CAST(a.n_neg AS DOUBLE) * t.n_pos_all))
                      * 1000000) AS BIGINT) AS iv_contrib_micro
    FROM agg a CROSS JOIN tot t
    WHERE a.n_pos > 0 AND a.n_neg > 0
    """


@register("k_feature_woe", oracle=_body_woe())
def k_feature_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning of document length against the en/non-en
    target: rank-exact deciles (floor((rn−1)·10/n), no interpolation),
    per-bin WoE = ln(pos-share/neg-share) and its Information-Value
    contribution — the credit-scoring-standard monotone-feature audit
    that says whether length carries target signal at all (Σ IV < 0.02:
    useless; > 0.3: strong) and HOW it bends, before anyone fits the
    logistic gate (``k_quality_logreg``) on it. Bins with a zero class
    are excluded (WoE undefined there), stated in the contract.

    Counts and shares are exact integers/rationals; the two ln terms
    are identical expression trees both engines floor-quantize at 1e-6.
    Scale shape: one rank window over the doc spine, a 10-bin reduce,
    spine arithmetic."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_woe())
