"""A/B: k_text_dup_ngram_frac gram-keyed join on STRING grams vs
xxhash64(gram) INT64 keys (r11 verdict item #6; protocol per r09 —
interleaved runs on one warm session, min-of-N per variant).

Run: python tools/ab_ngram_hash.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_service_spark.io import load
from data_service_spark.registry import QUERIES, load_all
from data_service_spark.session import get_spark

GRAM_EXPR = (
    "transform(sequence(1, size(split(text, ' ')) - 2),"
    " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
)


def variant_string(spark, sf_dir):
    return QUERIES["k_text_dup_ngram_frac"](spark, sf_dir)


def variant_hashed(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    g = (
        d.filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", F.explode(F.expr(GRAM_EXPR)).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gram_h"))
    )
    df_model = g.groupBy("gram_h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        g.join(df_model, "gram_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_grams"),
            F.round(
                F.sum(F.when(F.col("n_docs") >= 2, 1.0).otherwise(0.0))
                / F.count(F.lit(1)),
                4,
            ).alias("dup_frac"),
        )
    )


def main() -> None:
    load_all()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-ngram")
    spark.sparkContext.setLogLevel("ERROR")
    # value-identity check first (tiny scale collisions impossible)
    a = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
         for r in variant_string(spark, sf_dir).collect()}
    b = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
         for r in variant_hashed(spark, sf_dir).collect()}
    print("value_identical:", a == b, "docs:", len(a))

    times: dict[str, list[float]] = {"string": [], "hashed": []}
    for _ in range(rounds):
        for name, fn in (("string", variant_string), ("hashed", variant_hashed)):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: runs={ts} min={min(ts)}")
    print(f"speedup_min: {min(times['string']) / min(times['hashed']):.3f}x")


if __name__ == "__main__":
    main()
