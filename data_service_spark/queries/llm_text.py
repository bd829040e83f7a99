"""§2.K extensions — training-data-pipeline text operators.

Beyond the original SURVEY.md §2.K inventory: SimHash near-dup detection,
language-ID heuristic, quality scoring, document fingerprinting, BPE-ish
token counting, and multimodal binary-column plumbing. Every key has a
DuckDB oracle over the same ``documents`` table.

Portability conventions (both engines must compute bit-identical values):
- token hash = leading hex chars of md5 parsed as int — Spark
  ``conv(hex,16,10)``, DuckDB ``('0x'||hex)::BIGINT`` (verified equal);
- tokenization is ``split(text, ' ')`` / ``string_split`` (the corpus is
  single-space delimited);
- every ratio rounds to 4dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_service_spark.io import corpus_memo, load, load_parallel
from data_service_spark.registry import register

# ------------------------------------------------------------- simhash ----

# 60-bit SimHash: per-bit majority vote over token hashes (15 hex chars of
# md5 → 60 bits; stays well inside signed-64 range in both engines). The
# bit algebra is generated once and spliced into BOTH dialects (identical
# text). 60 bits (not 32) so the 4 LSH bands below are 15 bits wide —
# narrow bands collide constantly on a small vocabulary and each collision
# is a candidate pair.
_SIMHASH_BITS = 60
_BIT_VOTES = " + ".join(
    f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
    f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for i in range(_SIMHASH_BITS)
)

_SPARK_TOKEN_HASH = (
    "CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"
)
_DUCK_TOKEN_HASH = "('0x' || substr(md5(tok), 1, 15))::BIGINT"


@corpus_memo
def _simhash_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → 60-bit simhash, computed fully in SQL expressions (stays in
    codegen; one explode + one hash-agg shuffle — linear at 100 TB).
    Memoized per (session, corpus dir) as a localCheckpoint: the banded
    self-join otherwise evaluates the token-hash explode on BOTH join
    sides (measured 1.2 → 0.35 s at sf0.1 once pinned) — a production
    index stores the fingerprint column, it does not re-hash the corpus
    per probe side."""
    load_parallel(spark, sf_dir, "documents", "doc_id").createOrReplaceTempView(
        "dss_docs_sh"
    )
    return spark.sql(
        f"""
        WITH tok AS (
          SELECT doc_id, explode(split(text, ' ')) AS tok FROM dss_docs_sh
        ), hashed AS (
          SELECT doc_id, {_SPARK_TOKEN_HASH} AS h FROM tok
        )
        SELECT doc_id, {_BIT_VOTES} AS simhash FROM hashed GROUP BY doc_id
        """
    )


@register(
    "k_dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), hashed AS (
      SELECT doc_id, {_DUCK_TOKEN_HASH} AS h FROM tok
    ), fp AS (
      SELECT doc_id, {_BIT_VOTES} AS simhash FROM hashed GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM fp a JOIN fp b
      ON a.doc_id < b.doc_id
     AND bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def k_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance <= 3.

    Candidate generation uses 4-band LSH (15 bits per band): by pigeonhole,
    any pair within distance 3 agrees exactly on >=1 band, so the banded
    equi-join finds EVERY qualifying pair — the oracle's brute-force O(n²)
    join cross-validates completeness. The band join is the 100 TB path:
    one shuffle on (band_idx, band_value) instead of an all-pairs product.
    """
    fp = _simhash_fp(spark, sf_dir)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * 15)
                    .bitwiseAND(F.lit((1 << 15) - 1))
                    .alias("val"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a = bands.select(
        F.col("doc_id").alias("doc_id_1"), F.col("simhash").alias("sh1"), "band", "val"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_id_2"), F.col("simhash").alias("sh2"), "band", "val"
    )
    ham = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2", ham.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .distinct()  # a pair can collide in several bands
    )


# -------------------------------------------------------------- langid ----

_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "los", "las", "y"),
    "fr": ("le", "les", "des", "et"),
    "zh": ("的", "了", "是", "在"),
}


def _hits(col_words: str, words: tuple[str, ...], filter_fn: str,
          len_fn: str = "len") -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"{len_fn}({filter_fn}({col_words}, w -> w IN ({lst})))"


@register(
    "k_text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS lang_meta,
             {_hits('string_split(text, chr(32))', _LANG_MARKERS['en'], 'list_filter')} AS h_en,
             {_hits('string_split(text, chr(32))', _LANG_MARKERS['de'], 'list_filter')} AS h_de,
             {_hits('string_split(text, chr(32))', _LANG_MARKERS['es'], 'list_filter')} AS h_es,
             {_hits('string_split(text, chr(32))', _LANG_MARKERS['fr'], 'list_filter')} AS h_fr,
             {_hits('string_split(text, chr(32))', _LANG_MARKERS['zh'], 'list_filter')} AS h_zh,
             len(string_split(text, chr(32))) AS n_tok
      FROM documents
    )
    SELECT doc_id, lang_meta,
           CASE WHEN h_en + h_de + h_es + h_fr + h_zh = 0 THEN 'unknown'
                WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                WHEN h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
                WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
                WHEN h_fr >= h_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang,
           CAST(round((h_en + h_de + h_es + h_fr + h_zh) * 1.0 / n_tok, 4)
             AS DOUBLE) AS marker_ratio
    FROM scored
    """,
)
def k_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (stopword-hit argmax with a fixed tie-break
    ladder). One projection — no shuffle; the CASE ladder is identical text
    in both dialects so ties resolve identically."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("dss_docs_lid")
    selects = ",\n".join(
        f"{_hits('split(text, chr(32))', ws, 'filter', 'size')} AS h_{lang}"
        for lang, ws in _LANG_MARKERS.items()
    )
    return spark.sql(
        f"""
        WITH scored AS (
          SELECT doc_id, lang AS lang_meta, {selects},
                 size(split(text, chr(32))) AS n_tok
          FROM dss_docs_lid
        )
        SELECT doc_id, lang_meta,
               CASE WHEN h_en + h_de + h_es + h_fr + h_zh = 0 THEN 'unknown'
                    WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                    WHEN h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
                    WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
                    WHEN h_fr >= h_zh THEN 'fr'
                    ELSE 'zh' END AS pred_lang,
               CAST(round((h_en + h_de + h_es + h_fr + h_zh) * 1.0 / n_tok, 4)
                 AS DOUBLE) AS marker_ratio
        FROM scored
        """
    )


# ------------------------------------------------------------- quality ----


@register(
    "k_text_quality",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars_m,
             len(string_split(text, chr(32))) AS n_tokens,
             length(replace(text, chr(32), '')) AS n_nonspace,
             len(list_filter(string_split(text, chr(32)),
                             w -> w IN ('a', 'the', 'of', 'and'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_m, n_tokens,
           round(n_nonspace * 1.0 / n_tokens, 4) AS avg_token_len,
           round(n_stop * 1.0 / n_tokens, 4) AS stop_ratio,
           CASE WHEN n_tokens >= 50 AND n_stop * 1.0 / n_tokens BETWEEN 0.01 AND 0.5
                THEN 'high'
                WHEN n_tokens >= 20 THEN 'mid' ELSE 'low' END AS quality
    FROM m
    """,
)
def k_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: token count, mean token length, stopword
    ratio → high/mid/low tier. Pure projection (codegen, no shuffle) — the
    shape of a 100 TB corpus-filter pass."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_tokens = F.size(words)
    n_stop = F.size(
        F.filter(words, lambda w: w.isin("a", "the", "of", "and"))
    )
    n_nonspace = F.length(F.regexp_replace("text", " ", ""))
    stop_ratio = n_stop * F.lit(1.0) / n_tokens
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(n_nonspace * 1.0 / n_tokens, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.when(
            (n_tokens >= 50) & (stop_ratio >= 0.01) & (stop_ratio <= 0.5), "high"
        )
        .when(n_tokens >= 20, "mid")
        .otherwise("low")
        .alias("quality"),
    )


# --------------------------------------------------------- fingerprint ----


@register(
    "k_text_fingerprint",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, chr(32)) AS words FROM documents
      WHERE len(string_split(text, chr(32))) >= 4
    ), sh AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(words) - 3),
                            i -> md5(array_to_string(words[i:i+3], chr(32)))) AS hashes
      FROM w
    )
    SELECT doc_id,
           list_aggregate(hashes, 'min') AS fp_min,
           list_aggregate(hashes, 'max') AS fp_max,
           len(list_distinct(hashes)) AS n_distinct
    FROM sh
    """,
)
def k_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: md5 over every 4-word window;
    keep the min/max hash (winnowing-style representatives) + distinct
    window count. Map-only — each doc's fingerprint is computed where the
    doc lives, the 100 TB-friendly shape (contrast with shingle JOINS,
    which k_dedup_near covers).

    The md5-window array is materialized ONCE in its own aliased
    projection and the three reductions read the staged column —
    higher-order array lambdas run interpreted (no codegen CSE), so
    referencing the transform() in min/max/distinct inline re-hashed
    every document three times (the ``k_text_winnowing`` lesson,
    SCALING.md round-5; measured 2.1 s → ~0.7 s steady at sf0.1).
    load_parallel: the single-row-group corpus file otherwise leaves
    the whole interpreted-lambda scan on one core."""
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    words = F.split("text", " ")
    # words[i:i+3] in DuckDB is INCLUSIVE of both ends → a 4-word window.
    staged = d.filter(F.size(words) >= 4).select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 3), "
            "i -> md5(concat_ws(' ', slice(split(text, ' '), i, 4))))"
        ).alias("hashes"),
    )
    return staged.select(
        "doc_id",
        F.array_min("hashes").alias("fp_min"),
        F.array_max("hashes").alias("fp_max"),
        F.size(F.array_distinct("hashes")).alias("n_distinct"),
    )


# --------------------------------------------------------- token count ----

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "k_text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, chr(32))) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars_m
    FROM documents
    """,
)
def k_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish lexer regex
    (letter runs | digit runs | single punctuation). Projection-only."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars_m"),
    )


# ---------------------------------------------------------- multimodal ----


@register(
    "k_multimodal_decode",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           (octet_length(encode(text)) % 640) + 1 AS width,
           (octet_length(encode(text)) % 480) + 1 AS height,
           3 AS channels
    FROM documents
    """,
)
def k_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing: an opaque ``binary`` payload column
    decoded to typed metadata by an Arrow-batched ``mapInPandas`` stage.

    The decode itself is a STUB (no image libs in this container): a
    deterministic fake derives width/height from the byte length, standing
    in for PIL/ffmpeg. Everything Spark-side is real and is what matters at
    100 TB: binary column through Arrow, iterator-of-batches UDF (bounded
    memory however large the blobs), typed output schema. Swap the body for
    a real decoder and nothing else changes.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def decode(batches):
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": (n % 640) + 1,
                    "height": (n % 480) + 1,
                    "channels": 3,
                }
            )

    return d.mapInPandas(
        decode, "doc_id long, n_bytes long, width int, height int, channels int"
    )


@register(
    "k_multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) % 256 AS f_len,
           ascii(substr(text, 1, 1)) AS f_first,
           ascii(substr(text, length(text), 1)) AS f_last,
           CAST(list_aggregate(list_transform(generate_series(1, length(text)),
                          i -> ascii(substr(text, i, 1))), 'sum') AS INTEGER) % 997
             AS f_checksum
    FROM documents
    """,
)
def k_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over an opaque binary column — the second
    multimodal plumbing op (after k_multimodal_decode): payload bytes →
    fixed-width numeric features via Arrow ``mapInPandas``.

    The "model" is a deterministic stand-in (length mod, first/last byte,
    byte-sum checksum) for an image/audio embedding net; the Spark shape is
    exactly what batch inference needs at 100 TB — binary through Arrow,
    iterator of bounded batches, numeric feature schema out. The DuckDB
    oracle recomputes the same features from the (ASCII) text, pinning the
    byte math end-to-end.
    """
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def featurize(batches):
        for pdf in batches:
            raw = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "f_len": raw.map(len) % 256,
                    "f_first": raw.map(lambda b: b[0]),
                    "f_last": raw.map(lambda b: b[-1]),
                    "f_checksum": raw.map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) % 997
                    ),
                }
            )

    return d.mapInPandas(
        featurize, "doc_id long, f_len int, f_first int, f_last int, f_checksum int"
    )


@register(
    "k_multimodal_framesample",
    oracle="""
    WITH frames AS (
      SELECT doc_id, unnest(generate_series(0,
               CAST(floor((length(text) - 1) / 64) AS INTEGER))) AS frame_idx,
             text
      FROM documents
    )
    SELECT doc_id, frame_idx,
           length(substr(text, frame_idx * 64 + 1, 64)) AS frame_bytes,
           ascii(substr(text, frame_idx * 64 + 1, 1)) AS first_byte
    FROM frames
    WHERE frame_idx % 4 = 0
    """,
)
def k_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque binary payload: treat the blob as a
    sequence of fixed 64-byte frames (standing in for video frames), keep
    every 4th, emit one metadata row per kept frame via ``mapInPandas``.

    One input row → many output rows through the Arrow iterator — the
    batch shape of real video sampling (ffmpeg would replace the slicing;
    schema, fan-out, and partitioning stay identical). The oracle recomputes
    frame boundaries with substr arithmetic on the ASCII text.
    """
    import pandas as pd

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    FRAME, STRIDE = 64, 4

    def sample(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "first_byte": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) - 1) // FRAME + 1
                for idx in range(0, n_frames, STRIDE):
                    frame = payload[idx * FRAME:(idx + 1) * FRAME]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["first_byte"].append(frame[0])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        sample, "doc_id long, frame_idx int, frame_bytes int, first_byte int"
    )


@register(
    "k_multimodal_resize",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS orig_bytes,
           CAST(ceil(octet_length(encode(text)) / 4.0) AS INTEGER)
             AS resized_bytes,
           CAST(list_aggregate(list_transform(
                  generate_series(1, length(text), 4),
                  i -> ascii(substr(text, i, 1))), 'sum') AS BIGINT) % 997
             AS resized_checksum
    FROM documents
    """,
)
def k_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample an opaque payload: stride-4 byte decimation as the
    deterministic stand-in for image resampling (PIL.thumbnail would slot
    into the same ``mapInPandas`` body). Output pins source size, resized
    size, and a checksum of the kept bytes so the oracle verifies the
    exact byte selection, not just the shape."""
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def resize(batches):
        for pdf in batches:
            raw = pdf["payload"]
            kept = raw.map(lambda b: np.frombuffer(b, dtype=np.uint8)[::4])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": raw.map(len),
                    "resized_bytes": kept.map(len),
                    "resized_checksum": kept.map(lambda a: int(a.sum()) % 997),
                }
            )

    return d.mapInPandas(
        resize,
        "doc_id long, orig_bytes long, resized_bytes int, resized_checksum long",
    )


@register(
    "k_text_ngram_chars",
    oracle="""
    WITH tri AS (
      SELECT lang,
             unnest(list_transform(generate_series(1, length(text) - 2),
                                   i -> substr(text, i, 3))) AS g
      FROM documents
    ), counts AS (
      SELECT lang, g, count(*) AS n FROM tri GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, g, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rn
      FROM counts
    )
    SELECT lang, g AS trigram, n, rn FROM ranked WHERE rn <= 10
    """,
)
def k_text_ngram_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram profile per language: top-10 trigrams with counts —
    the feature table a statistical language-ID model trains on (the
    heuristic in k_text_langid consumes exactly this kind of profile).

    Trigram fan-out is a higher-order `transform(sequence)` + explode (one
    Generate, no UDF); counting is one hash aggregate on (lang, trigram)
    and the top-10 cut is a per-lang window over the already-tiny count
    table. At 100 TB the explode dominates — it pipelines inside the scan
    stage, and the aggregate's map-side partials collapse the stream before
    the only shuffle.
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    tri = d.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substr(text, i, 3))")
        ).alias("g"),
    )
    counts = tri.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "g")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", F.col("g").alias("trigram"), "n", "rn")
    )


@register(
    "k_multimodal_dedup",
    oracle="""
    -- DuckDB 1.0 md5() binds VARCHAR only; the slice's UTF-8 bytes are what
    -- Spark hashes, so hashing the VARCHAR here is byte-identical.
    WITH p AS (
      SELECT doc_id, substr(text, 1, 64) AS payload FROM documents
    )
    SELECT md5(payload) AS payload_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies,
           CAST(min(octet_length(encode(payload))) AS BIGINT) AS n_bytes
    FROM p GROUP BY 1
    """,
)
def k_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload dedup — content-hash dedup on an opaque media column
    (the first pass every image/audio corpus runs; identical bytes from
    re-crawls collapse before any expensive perceptual hashing). Payloads
    are the first-64-byte slices of the synthetic media column, so
    collisions actually occur and the keep-min rule exercises. One hash
    aggregate on md5(binary) — at 100 TB the shuffle carries 16-byte
    digests, not blobs, because md5 computes map-side."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.substring("text", 1, 64), "UTF-8").alias("payload")
    )
    return d.groupBy(F.md5("payload").alias("payload_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.octet_length("payload")).cast("long").alias("n_bytes"),
    )


@register(
    "k_bpe_first_merge",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                                   i -> substr(word, i, 2))) AS pair
      FROM w WHERE length(word) >= 2
    ), counts AS (
      SELECT pair, count(*) AS n FROM pairs GROUP BY 1
    ), ranked AS (
      SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rn
      FROM counts
    )
    SELECT pair, n, rn FROM ranked WHERE rn <= 20
    """,
)
def k_bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training primitive: the first BPE merge iteration —
    corpus-wide adjacent-character-pair frequencies within words, top-20
    merge candidates (deterministic tiebreak). A full BPE trainer is this
    step iterated with the merge applied (the iterative shape of
    k_cluster_iterate / k_graph_pagerank); each iteration is one explode +
    one hash aggregate, so vocabulary induction over 100 TB is a sequence
    of linear scans, not a driver-side loop over the corpus."""
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    w = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))"
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    rnk = Window.orderBy(F.col("n").desc(), "pair")
    return (
        counts.withColumn("rn", F.row_number().over(rnk))
        .filter(F.col("rn") <= 20)
        .select("pair", "n", "rn")
    )


@register(
    "k_text_normalize",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS norm_hash,
           length(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
             AS norm_len
    FROM documents
    """,
)
def k_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text canonicalization: lowercase → collapse whitespace runs → trim,
    reported as (hash, length) — the normalization pass that runs before
    exact dedup so trivially-different copies (case, spacing) collapse.
    Pure projection, composes with the scan at line rate; the regex is in
    the RE2 ∩ Java common subset and DuckDB takes the explicit 'g' flag to
    match Spark's replace-all."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@register(
    "k_text_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, n_chars),
                                   i -> substr(text, CAST(i AS INT), 1))) AS c
      FROM documents
    ), counts AS (
      SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS cnt
      FROM chars GROUP BY doc_id, c
    ), tot AS (
      SELECT doc_id, sum(cnt) AS n FROM counts GROUP BY doc_id
    )
    SELECT doc_id,
           round(-sum((cnt / n) * log2(cnt / n)), 4) + 0.0 AS char_entropy
    FROM counts JOIN tot USING (doc_id)
    GROUP BY doc_id
    """,
)
def k_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the gibberish /
    encoding-noise quality filter (low entropy = repeated filler, high =
    random bytes; natural text sits in a narrow band).

    The computation adds NO shuffle of its own: chars → distinct chars →
    per-char counts → entropy fold, all inside one higher-order expression
    chain (O(distinct·len) per row) — at 100 TB this runs at scan speed
    with no fan-out. Higher-order lambdas are interpreted (not codegen'd),
    so the per-row cost is real CPU: the read goes through
    ``load_parallel`` to spread it across cores (the corpus'
    single-row-group file otherwise serializes the fold onto one task —
    measured 3.5 s → 0.5 s at sf0.1). The oracle states the same math in
    the explode→groupBy shape DuckDB prefers; the two sums meet at 4dp
    (`+ 0.0` absorbs the signed-zero divergence, SURVEY.md §7.4).
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
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
    return (
        d.select("doc_id", cs.alias("cs"))
        .select(
            "doc_id", (F.round(ent, 4) + F.lit(0.0)).alias("char_entropy")
        )
    )


@register(
    "k_text_bm25",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('table', 'hash', 'scan') GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok
      WHERE term IN ('table', 'hash', 'scan') GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf * 2.2
                 / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))) AS score
      FROM tf JOIN df USING (term)
           JOIN dl ON tf.doc_id = dl.doc_id
           CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 4) AS bm25
    FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 20
    """,
)
@corpus_memo
def k_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed 3-term query —
    the lexical-search ranker a corpus-curation stack runs for targeted
    subset extraction ("pull the docs about X").

    All corpus statistics stay distributed: df and (N, avgdl) are 1-row/
    3-row aggregates broadcast back into the per-doc score join; the term
    filter lands BEFORE the tf groupBy so the shuffle carries only
    query-term postings (at 100 TB: the posting lists, not the corpus).
    Final top-20 ranks on round(score, 6) with doc_id tiebreak so float
    last-ulp noise can't flip ranks across engines; the unpartitioned
    window sees only the scored postings' doc set, already reduced by the
    query-term filter (per-shard pre-top-k is the production variant at
    web scale).

    The 20-row scored table is memoized per (session, corpus dir): five
    downstream keys re-rank or attribute against this exact lexical leg
    (hybrid RRF, NDCG, Brier, interleave, RBO) — a search stack scores
    the query once and every evaluator reads the result list."""
    return _bm25_frame(spark, sf_dir)


def _bm25_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-checkpointed BM25 builder DAG — split out so plan tests
    can pin the posting-filter-below-aggregate shape (the memo's
    checkpoint would otherwise hide it behind a Scan ExistingRDD)."""
    d = load(spark, sf_dir, "documents")
    terms = ["table", "hash", "scan"]
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    qtok = tok.filter(F.col("term").isin(terms))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(F.split("text", " ")).cast("double")).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score_term = idf * F.col("tf") * 2.2 / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(score_term).alias("score"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.round("score", 6).desc(), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", F.round("score", 4).alias("bm25"))
    )


@register(
    "k_dedup_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ), pos AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i FROM t
    ), grams AS (
      SELECT doc_id, array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
      FROM pos
    ), dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT g.doc_id, count(*) AS n_grams, count(d.gram) AS n_dup,
           round(count(d.gram) * 1.0 / count(*), 4) AS dup_ratio
    FROM grams g LEFT JOIN dup d USING (gram)
    GROUP BY g.doc_id
    """,
)
def k_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span detection at 8-token-gram granularity — the
    distributed approximation of suffix-array ExactSubstr dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better"):
    a position's 8-gram is "duplicated" when the identical gram occurs in
    >= 2 distinct documents; the output is each document's duplicated-span
    coverage (the signal used to cut boilerplate/templated spans before
    training). Docs shorter than the gram width carry no spans and drop
    out on both engines.

    Spark shape (r13): split once, explode positions via
    sequence+transform (all Catalyst higher-order functions, no Python),
    then ONE gram-keyed exchange whose window computes min/max(doc_id)
    per gram — "spans >= 2 distinct docs" is exactly min != max, so the
    former countDistinct aggregate + join-back (which re-derived the
    explode on the probe side) collapses into the single shuffle the
    posting list needs anyway. At 100 TB you'd additionally xxhash64 the
    gram to an int64 shuffle key to cut bytes (proven equivalent in
    k_dedup_minhash's hashed-shingle path).
    """
    from pyspark.sql.window import Window

    t = (
        load_parallel(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 8)
    )
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 7),"
                " i -> concat_ws(' ', slice(toks, i, 8)))"
            )
        ).alias("gram"),
    )
    # r13: "occurs in >= 2 distinct docs" is exactly min(doc_id) !=
    # max(doc_id) over the gram partition — one window over ONE
    # gram-keyed exchange replaces the countDistinct aggregate + join-back
    # (which re-derived the whole explode on the probe side: two corpus
    # passes and three exchanges; A/B 0.80 -> 0.55 s at sf0.1, values
    # identical). Same posting-list layout at 100 TB: the exchange is the
    # same gram-keyed shuffle the aggregate needed anyway.
    gw = Window.partitionBy("gram")
    flagged = grams.select(
        "doc_id",
        F.when(
            F.min("doc_id").over(gw) != F.max("doc_id").over(gw), 1
        ).alias("is_dup"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_dup").alias("n_dup"),
            F.round(F.count("is_dup") * 1.0 / F.count(F.lit(1)), 4).alias(
                "dup_ratio"
            ),
        )
    )


@register(
    "k_text_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ), pos AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM t
    ), grams AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(toks, i, i + 2), ' ') AS gram
      FROM pos
    ), firsts AS (
      SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
    )
    SELECT g.doc_id, count(*) AS n_grams,
           count(*) FILTER (f.first_doc = g.doc_id) AS n_novel,
           round(count(*) FILTER (f.first_doc = g.doc_id) * 1.0 / count(*), 4)
             AS novelty_ratio
    FROM grams g JOIN firsts f USING (gram)
    GROUP BY g.doc_id
    """,
)
def k_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order novelty: the fraction of a document's distinct 3-grams
    whose FIRST corpus occurrence (min doc_id — the deterministic stand-in
    for ingest order) is this document. Low novelty late in the corpus =
    the incoming batch mostly restates what's already collected — the
    diminishing-returns curve a data-acquisition loop watches (and the
    document-level dual of k_dedup_spans' span view).

    Same posting-list plan family (r13): distinct (doc, gram) pairs,
    then ONE gram-keyed window — "first corpus occurrence is this doc"
    is exactly doc_id == min(doc_id) over the gram partition, so the
    former min-aggregate + join-back (which re-derived the whole
    explode+distinct on the probe side: two corpus passes, two extra
    exchanges) collapses into the single gram shuffle. Nothing
    broadcasts the gram table — it scales with the corpus.
    """
    from pyspark.sql.window import Window

    t = (
        load_parallel(spark, sf_dir, "documents", "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 3)
    )
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', slice(toks, i, 3)))"
            )
        ).alias("gram"),
    ).distinct()
    gw = Window.partitionBy("gram")
    novel = F.when(F.min("doc_id").over(gw) == F.col("doc_id"), 1)
    return (
        grams.select("doc_id", novel.alias("is_novel"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("is_novel").alias("n_novel"),
            F.round(F.count("is_novel") * 1.0 / F.count(F.lit(1)), 4).alias(
                "novelty_ratio"
            ),
        )
    )


from data_service_spark.registry import ORACLES as _REG_ORACLES  # noqa: E402


@register(
    "k_rank_fusion",
    oracle=f"""
    WITH sparse AS ({_REG_ORACLES["k_text_bm25"]}),
    sr AS (
      SELECT doc_id, row_number() OVER (ORDER BY round(bm25, 6) DESC, doc_id)
               AS r
      FROM sparse
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    dense AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY
               round(list_inner_product(v, qv), 6) DESC, vec_id) AS r
      FROM e CROSS JOIN q WHERE vec_id <> 0
    ),
    dr AS (SELECT doc_id, r FROM dense WHERE r <= 20),
    fused AS (
      SELECT coalesce(sr.doc_id, dr.doc_id) AS doc_id,
             round(coalesce(1.0 / (60 + sr.r), 0)
                   + coalesce(1.0 / (60 + dr.r), 0), 6) AS rrf
      FROM sr FULL JOIN dr ON sr.doc_id = dr.doc_id
    )
    SELECT doc_id, rrf, rank FROM (
      SELECT doc_id, rrf,
             row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= 10
    """,
)
def k_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009,
    k=60): the lexical leg is the registered BM25 top-20 (k_text_bm25),
    the dense leg ranks embeddings by cosine against a fixed probe vector,
    and each document scores sum(1/(60+rank)) over the lists it appears in
    — the standard RAG-stack combiner of sparse and dense retrieval,
    robust to the two scorers' incomparable scales because only RANKS
    enter the fusion. FULL join: a doc found by one leg only still fuses.

    Each leg is itself bounded (top-20), so the fusion join and the final
    rank window run on tens of rows regardless of corpus size — the
    global windows here order POST-RETRIEVAL candidate lists, not data
    (same documented exception as f_sort_verify). At 100 TB the legs are
    the cost, and both are already index-shaped (posting join / GEMM-LSH).
    """
    from pyspark.sql.window import Window as W

    from data_service_spark.queries.llm import _emb, dot

    sparse = k_text_bm25(spark, sf_dir)
    sr = sparse.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.round("bm25", 6).desc(), "doc_id"))
        .alias("r_sparse"),
    )
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number()
            .over(W.orderBy(F.round(dot(F.col("v"), F.col("qv")), 6).desc(), "vec_id"))
            .alias("r_dense"),
        )
        .filter(F.col("r_dense") <= 20)
    )
    fused = (
        sr.join(dense, "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("r_sparse")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("r_dense")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return (
        fused.withColumn(
            "rank", F.row_number().over(W.orderBy(F.col("rrf").desc(), "doc_id"))
        )
        .filter(F.col("rank") <= 10)
        .select("doc_id", "rrf", "rank")
    )


@register(
    "k_bpe_apply",
    oracle="""
    WITH w AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents
    ), enc AS (
      SELECT word,
             replace(replace(replace(word, 'ta', chr(1)), 'er', chr(2)),
                     'sc', chr(3)) AS encoded
      FROM w
    )
    SELECT word, length(word) AS n_chars,
           CAST(length(encoded) AS BIGINT) AS n_units,
           CAST(length(word) - length(encoded) AS BIGINT) AS n_merged
    FROM enc
    """,
)
def k_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY path: rewrite each distinct word with a fixed
    3-entry BPE merge table ('ta', 'er', 'sc' → one symbol each, the
    inverse of k_bpe_first_merge's training step). Each merge is one
    left-to-right non-overlapping `replace` — the same rewrite a BPE
    encoder performs per learned merge, and both engines share replace()'s
    scan semantics, so unit counts agree exactly.

    Runs on the DISTINCT-word table (the standard tokenizer-cache trick:
    encode each type once, not each token): one dedup shuffle of
    vocabulary-sized data, then a zero-shuffle projection. At 100 TB the
    vocabulary table is millions of rows while the corpus is trillions —
    the apply cost collapses to a broadcast-joinable dictionary.
    """
    d = load(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split("text", " ")).alias("word")).distinct()
    enc = F.expr(
        "replace(replace(replace(word, 'ta', char(1)), 'er', char(2)),"
        " 'sc', char(3))"
    )
    return w.select(
        "word",
        F.length("word").alias("n_chars"),
        F.length(enc).cast("long").alias("n_units"),
        (F.length("word") - F.length(enc)).cast("long").alias("n_merged"),
    )


@register("k_text_compressibility")  # rows-only: no zlib in DuckDB SQL
def k_text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (deflate bytes / raw bytes) — the
    Gopher/FineWeb-style repetition detector: highly compressible text is
    templated or looping, incompressible text is noise; both tails get
    gated. No SQL oracle (DuckDB has no deflate surface), so the driver
    records the weaker rows-only check; determinism inside the engine is
    still exact (zlib level 6 is a pure function of the bytes).

    Arrow-batched pandas UDF (one zlib call per row, no Python-row
    overhead); zero shuffles — the score is a scan-stage projection, and
    the flag thresholds are plain codegen comparisons on top.
    """
    from pyspark.sql.functions import pandas_udf

    def _ratios(texts):
        import zlib

        def ratio(t: str) -> float:
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return texts.map(ratio)

    # Series->Series scalar pandas UDF; eval type passed positionally (the
    # from-__future__ string annotations defeat hint inference here).
    comp_ratio = pandas_udf(_ratios, "double")

    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    scored = d.select(
        "doc_id", comp_ratio(F.col("text")).alias("comp_ratio")
    )
    return scored.select(
        "doc_id",
        "comp_ratio",
        (F.col("comp_ratio") < 0.25).alias("too_repetitive"),
        (F.col("comp_ratio") > 0.9).alias("incompressible"),
    )


@register(
    "k_query_expansion_prf",
    oracle="""
    WITH scored AS (
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('table', 'hash', 'scan') GROUP BY 1, 2
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok
      WHERE term IN ('table', 'hash', 'scan') GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf * 2.2
                 / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))) AS score
      FROM tf JOIN df USING (term)
           JOIN dl ON tf.doc_id = dl.doc_id
           CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 4) AS bm25
    FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 20
    ),
    top5 AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (ORDER BY round(bm25, 6) DESC,
                                          doc_id) AS rn
        FROM scored) WHERE rn <= 5
    ), fb_terms AS (
      SELECT term, count(DISTINCT d.doc_id) AS df_fb
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents) d
      JOIN top5 USING (doc_id)
      WHERE term NOT IN ('table', 'hash', 'scan')
      GROUP BY term
    ), corpus_df AS (
      SELECT term, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT f.term, f.df_fb,
           round(f.df_fb * ln((n_docs + 1.0) / (c.df + 1.0)), 6) AS prf_score
    FROM fb_terms f JOIN corpus_df c USING (term) CROSS JOIN n
    ORDER BY round(f.df_fb * ln((n_docs + 1.0) / (c.df + 1.0)), 6) DESC, term
    LIMIT 10
    """,
)
def k_query_expansion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-style): assume
    the BM25 top-5 are relevant, then rank their terms (minus the query's
    own) by feedback-frequency × smoothed idf — the top-10 become the
    expanded query. The classic recall lever when the seed query is
    underspecified ("pull the docs about X … and things X co-occurs
    with").

    Composes the registered BM25 plan for the feedback set (5-row
    broadcast into the posting join); both term tables are vocabulary-
    sized map-side-combined aggregates. Scores are integer-count ratios
    through one ln — ranked on 6dp rounds with term tiebreaks.
    """
    from pyspark.sql.window import Window

    from data_service_spark.registry import QUERIES

    d = load(spark, sf_dir, "documents")
    scored = QUERIES["k_text_bm25"](spark, sf_dir)
    wr = Window.orderBy(F.round("bm25", 6).desc(), F.col("doc_id"))
    top5 = (
        scored.select("doc_id", F.row_number().over(wr).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id")
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # r14 (census): the feedback-df and corpus-df branches were two
    # separate tokenize passes (no shared exchange — the broadcast join
    # sat between scan and aggregate on one side), each paying its own
    # two-phase countDistinct. ONE distinct (term, doc_id) pass with a
    # broadcast top-5 flag yields both counts: df = pairs per term,
    # df_fb = flagged pairs per term; the fb-term selection (in ≥1
    # feedback doc, not a query term) is the filter the old inner join
    # expressed. Exact countDistinct identity — pairs are deduped first.
    pairs = tok.distinct()
    flagged = pairs.join(
        F.broadcast(top5.withColumn("is_fb", F.lit(1))), "doc_id", "left"
    )
    per_term = flagged.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.count("is_fb").alias("df_fb"),
    )
    fbsel = per_term.filter(
        (F.col("df_fb") > 0)
        & ~F.col("term").isin("table", "hash", "scan")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("df_fb") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        6,
    )
    return (
        fbsel.crossJoin(F.broadcast(n))
        .select("term", "df_fb", score.alias("prf_score"))
        .orderBy(F.col("prf_score").desc(), "term")
        .limit(10)
    )


@register(
    "k_truncation_loss",
    oracle="""
    WITH d AS (
      SELECT source, len(string_split(text, ' ')) AS n_tok FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE n_tok > 32) AS BIGINT) AS n_truncated,
           CAST(sum(CASE WHEN n_tok > 32 THEN n_tok - 32 ELSE 0 END)
                AS BIGINT) AS tokens_lost,
           round(sum(CASE WHEN n_tok > 32 THEN n_tok - 32 ELSE 0 END)
                 * 1.0 / sum(n_tok), 4) AS loss_ratio
    FROM d GROUP BY source
    """,
)
def k_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-loss audit at a 32-token context limit, per source: how
    many documents overflow and what fraction of their token mass a
    hard-truncating loader would silently discard — the number that
    decides between truncation, chunking (k_chunk_rag), and packing
    (k_pack_sequences) per source. Sources with high loss_ratio need the
    chunker; low-loss sources can truncate for free.

    One map-side-combined groupBy over a scan-stage token count; exact
    integer token arithmetic.
    """
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    b = d.select("source", n_tok.alias("n_tok"))
    lost = F.when(F.col("n_tok") > 32, F.col("n_tok") - 32).otherwise(0)
    return b.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("n_tok") > 32, 1)).cast("long").alias(
            "n_truncated"
        ),
        F.sum(lost).cast("long").alias("tokens_lost"),
        F.round(F.sum(lost) * 1.0 / F.sum("n_tok"), 4).alias("loss_ratio"),
    )


@register(
    "k_tokenizer_fertility",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), dict AS (
      SELECT word, length(word) AS n_chars,
             length(replace(replace(replace(word, 'ta', chr(1)),
                                    'er', chr(2)), 'sc', chr(3)))
               AS n_units
      FROM (SELECT DISTINCT word FROM tok)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(d.n_units) AS BIGINT) AS n_units,
           CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
           CAST(floor(sum(d.n_units) * 1000000.0 / count(*)) AS BIGINT)
             AS fertility_ppm,
           CAST(floor(sum(d.n_chars) * 1000000.0
                      / nullif(sum(d.n_units), 0)) AS BIGINT)
             AS chars_per_unit_ppm
    FROM tok JOIN dict d USING (word)
    GROUP BY lang
    """,
)
def k_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE units per whitespace word and
    chars per unit under the fixed 3-merge table of k_bpe_apply — the
    number that decides whether a tokenizer is fair to a language (high
    fertility = more units per word = more compute per character; the
    standard multilingual-tokenizer audit). Reported as exact integer
    parts-per-million (floored on both engines — the int/int ratio can
    land exactly on a rounding half-grid).

    The type-level dictionary trick keeps this 100 TB-safe: merges run
    once per DISTINCT word (vocabulary-sized), then a broadcast join
    prices every token occurrence; per-lang rollup is map-side combined.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("word"))
    enc = F.length(
        F.replace(
            F.replace(
                F.replace(F.col("word"), F.lit("ta"), F.lit("\x01")),
                F.lit("er"),
                F.lit("\x02"),
            ),
            F.lit("sc"),
            F.lit("\x03"),
        )
    )
    dic = (
        tok.select("word")
        .distinct()
        .select("word", F.length("word").alias("n_chars"), enc.alias("n_units"))
    )
    j = tok.join(dic, "word")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("n_units").cast("long").alias("n_units"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.floor(F.sum("n_units") * 1000000.0 / F.count(F.lit(1)))
        .cast("long")
        .alias("fertility_ppm"),
        F.floor(
            F.sum("n_chars") * 1000000.0 / F.nullif(F.sum("n_units"), F.lit(0))
        )
        .cast("long")
        .alias("chars_per_unit_ppm"),
    )


@register(
    "k_boilerplate_phrases",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    p AS (
      SELECT doc_id, array_to_string(w[i:i+4], ' ') AS phrase
      FROM t, unnest(list_transform(generate_series(1, len(w) - 4),
                                    x -> x)) AS u(i)
    ), c AS (
      SELECT phrase, count(*) AS n_occur,
             count(DISTINCT doc_id) AS n_docs
      FROM p GROUP BY phrase
    )
    SELECT phrase, CAST(n_occur AS BIGINT) AS n_occur,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM c WHERE n_docs >= 3
    ORDER BY n_docs DESC, n_occur DESC, phrase LIMIT 50
    """,
)
def k_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate miner at PHRASE granularity: 5-word sliding
    phrases recurring across >= 3 distinct documents, top-50 by spread —
    the removal list for nav chrome, cookie banners and template frames
    (Raffel et al. 2020 dropped any line seen 3+ times corpus-wide; this
    is that census on the unit that actually recurs in prose). Sits
    between k_dedup_prefix (doc heads) and k_dedup_spans (8-gram hashes):
    human-readable phrases an editor can allowlist.

    Phrase explode -> vocabulary-sized count table (map-side combined;
    distinct-doc count is Spark's two-level partial expansion) -> the
    top-50 is TakeOrderedAndProject over the already-filtered recurring
    set. At 100 TB phrases hash to int64 first and strings surface only
    for the 50 winners (the k_dedup_minhash_sql trick); strings stay
    inline here for oracle readability.
    """
    d = load(spark, sf_dir, "documents")
    p = d.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(filter(sequence(1, greatest(size(w) - 4, 1)),"
                " i -> i <= size(w) - 4),"
                " i -> concat_ws(' ', slice(w, i, 5)))"
            )
        ).alias("phrase"),
    )
    # r13 interleaved A/B: a manual (phrase, doc_id) pre-aggregate +
    # re-aggregate read 1.30 s vs 1.08 s for this form — countDistinct's
    # partial distinct is already map-side and pays ONE exchange where
    # the manual two-level pays two. Kept as-is (null result recorded).
    c = p.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occur"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    return (
        c.filter(F.col("n_docs") >= 3)
        .orderBy(F.col("n_docs").desc(), F.col("n_occur").desc(), "phrase")
        .limit(50)
    )


@register(
    "k_blocklist_gate",
    oracle="""
    WITH hits AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                 w -> list_contains(['spark', 'vector', 'gpu'], w)))
               AS n_hits,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(n_hits * 10000.0 / n_tokens) AS BIGINT) AS hit_bp,
           CAST(floor(n_hits * 10000.0 / n_tokens) AS BIGINT) >= 100
             AS blocked
    FROM hits
    """,
)
def k_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist keyword gate: per-document hit count against a fixed
    term blocklist (stand-in terms here; NSFW/spam lists in production),
    hit density in exact integer basis points, and the block verdict at
    the 1% density threshold — the first, cheapest content-safety filter
    every corpus pipeline runs (wordlists catch the bulk; model-based
    gates like k_quality_logreg handle the rest). Zero-shuffle projection:
    one tokenize + one list_filter per row, integer division both sides.

    At 100 TB the blocklist (thousands of terms) broadcasts as a set and
    the same filter-fold runs at scan rate.
    """
    d = load(spark, sf_dir, "documents")
    hits = d.select(
        "doc_id",
        F.expr(
            "size(filter(split(lower(text), ' '),"
            " w -> array_contains(array('spark', 'vector', 'gpu'), w)))"
        ).alias("n_hits"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    bp = F.floor(F.col("n_hits") * 10000.0 / F.col("n_tokens")).cast("long")
    return hits.select(
        "doc_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        bp.alias("hit_bp"),
        (bp >= 100).alias("blocked"),
    )


# ------------------------------------------------------- Heaps' law ----


@register(
    "k_heaps_law",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, chr(32))) AS w
      FROM documents
    ), doc_toks AS (
      SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id
    ), firsts AS (
      SELECT w, min(doc_id) AS first_doc FROM toks GROUP BY w
    ), per_doc AS (
      SELECT d.doc_id, d.n_toks,
             coalesce(f.n_new, 0) AS n_new
      FROM doc_toks d
      LEFT JOIN (SELECT first_doc, count(*) AS n_new
                 FROM firsts GROUP BY first_doc) f
        ON f.first_doc = d.doc_id
    ), cum AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) AS docs_seen,
             sum(n_toks) OVER (ORDER BY doc_id) AS tokens_seen,
             sum(n_new) OVER (ORDER BY doc_id) AS vocab_size,
             ntile(10) OVER (ORDER BY doc_id) AS decile
      FROM per_doc
    ), checkpoints AS (
      SELECT decile, max(docs_seen) AS docs_seen
      FROM cum GROUP BY decile
    )
    SELECT CAST(c.decile AS BIGINT) AS decile,
           CAST(c.docs_seen AS BIGINT) AS docs_seen,
           CAST(u.tokens_seen AS BIGINT) AS tokens_seen,
           CAST(u.vocab_size AS BIGINT) AS vocab_size,
           CAST(round(ln(u.vocab_size) / ln(u.tokens_seen), 6) + 0.0
             AS DOUBLE) AS beta_local
    FROM checkpoints c JOIN cum u ON u.docs_seen = c.docs_seen
    """,
)
def k_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct-word count
    vs cumulative token count at ten corpus-order checkpoints, with the
    local Heaps exponent β = ln V / ln N (≈0.4–0.6 for natural text; a β
    collapsing toward 0 means the crawl has stopped finding new language —
    the acquisition-loop stop signal, the corpus-level integral of
    ``k_text_novelty``'s per-doc derivative). First occurrences are
    attributed by min doc_id, the deterministic ingest-order stand-in.

    Scale shape: one token explode → two grouped counts (both map-side
    combinable) → windows over the |docs| spine; no quadratic anything.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    doc_toks = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    news = (
        toks.groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    per_doc = doc_toks.join(
        news, doc_toks.doc_id == news.first_doc, "left"
    ).select(
        "doc_id", "n_toks", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    w = Window.orderBy("doc_id")
    cum = per_doc.select(
        F.row_number().over(w).alias("docs_seen"),
        F.sum("n_toks").over(w).alias("tokens_seen"),
        F.sum("n_new").over(w).alias("vocab_size"),
        F.ntile(10).over(w).alias("decile"),
    )
    checkpoints = cum.groupBy(F.col("decile").alias("ckpt_decile")).agg(
        F.max("docs_seen").alias("docs_seen")
    )
    return checkpoints.join(cum, "docs_seen").select(
        F.col("ckpt_decile").cast("long").alias("decile"),
        F.col("docs_seen").cast("long"),
        F.col("tokens_seen").cast("long"),
        F.col("vocab_size").cast("long"),
        (
            F.round(F.log(F.col("vocab_size")) / F.log(F.col("tokens_seen")), 6)
            + 0.0
        ).cast("double").alias("beta_local"),
    )


# --------------------------------------------------- type-token ratio ----


@register(
    "k_text_ttr",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, chr(32))) AS n_tokens,
             len(list_distinct(string_split(text, chr(32)))) AS n_types
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(floor(n_types * 10000.0 / n_tokens) AS BIGINT) AS ttr_bp,
           CAST(floor(n_types * 1000.0 / sqrt(n_tokens)) AS BIGINT)
             AS guiraud_milli
    FROM t
    """,
)
def k_text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity gate inputs per document: type-token ratio (bp)
    and Guiraud's root-TTR (types/√tokens, the length-corrected variant —
    plain TTR shrinks mechanically with length, so a fixed TTR cut would
    systematically kill long documents). Low diversity = templated or
    looping text, the lexical cousin of the compression-ratio gate
    (``k_text_compressibility``) but exactly oracle-checkable.

    Scale shape: pure per-row projection over array functions — no
    shuffle, whole-stage codegen end to end.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
        F.floor(
            F.size(F.array_distinct(toks)) * 10000.0 / F.size(toks)
        )
        .cast("long")
        .alias("ttr_bp"),
        F.floor(
            F.size(F.array_distinct(toks)) * 1000.0 / F.sqrt(F.size(toks))
        )
        .cast("long")
        .alias("guiraud_milli"),
    )


# ------------------------------------------------------ filter funnel ----


_FF_GATES = """
      SELECT doc_id,
             (n_tok BETWEEN 10 AND 1000) AS g_len,
             (h_mark > 0) AS g_lang,
             (n_typ * 10 >= n_tok * 3) AS g_ttr,
             (top_tok * 5 <= n_tok) AS g_repeat
"""


def _ff_body(split_fn: str, filter_fn: str, len_fn: str, aggfn: str) -> str:
    # per-doc gate inputs computed with engine-local array functions; the
    # gate predicates above are pure integer comparisons shared verbatim.
    return f"""
    WITH feats AS (
      SELECT doc_id,
             {len_fn}({split_fn}) AS n_tok,
             {len_fn}({aggfn}({split_fn})) AS n_typ,
             {len_fn}({filter_fn}({split_fn},
               w -> w IN ('the','a','of','and','der','die','das','und',
                          'el','los','las','y','le','les','des','et')))
               AS h_mark,
             (SELECT max(c) FROM (
                SELECT count(*) AS c FROM (
                  SELECT unnest({split_fn}) AS w2) GROUP BY w2) t)
               AS top_tok
      FROM documents
    ), gates AS (
      {_FF_GATES}
      FROM feats
    ), per_gate AS (
      SELECT 'len' AS gate,
             sum(CASE WHEN NOT g_len THEN 1 ELSE 0 END) AS n_fail,
             sum(CASE WHEN NOT g_len AND g_lang AND g_ttr AND g_repeat
                 THEN 1 ELSE 0 END) AS n_fail_unique FROM gates
      UNION ALL
      SELECT 'lang',
             sum(CASE WHEN NOT g_lang THEN 1 ELSE 0 END),
             sum(CASE WHEN NOT g_lang AND g_len AND g_ttr AND g_repeat
                 THEN 1 ELSE 0 END) FROM gates
      UNION ALL
      SELECT 'ttr',
             sum(CASE WHEN NOT g_ttr THEN 1 ELSE 0 END),
             sum(CASE WHEN NOT g_ttr AND g_len AND g_lang AND g_repeat
                 THEN 1 ELSE 0 END) FROM gates
      UNION ALL
      SELECT 'repeat',
             sum(CASE WHEN NOT g_repeat THEN 1 ELSE 0 END),
             sum(CASE WHEN NOT g_repeat AND g_len AND g_lang AND g_ttr
                 THEN 1 ELSE 0 END) FROM gates
    ), tot AS (
      SELECT count(*) AS n_docs,
             sum(CASE WHEN g_len AND g_lang AND g_ttr AND g_repeat
                 THEN 1 ELSE 0 END) AS n_keep
      FROM gates
    )
    SELECT p.gate, CAST(p.n_fail AS BIGINT) AS n_fail,
           CAST(p.n_fail_unique AS BIGINT) AS n_fail_unique,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(t.n_keep AS BIGINT) AS n_keep
    FROM per_gate p CROSS JOIN tot t
    """


@register(
    "k_filter_funnel",
    oracle=_ff_body(
        "string_split(text, chr(32))", "list_filter", "len", "list_distinct"
    ),
)
def k_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate FUNNEL report: a FineWeb-style filter stack (length,
    language-marker, lexical-diversity, repetition gates) audited per
    gate with total attrition AND unique attrition — docs only THIS gate
    kills. Unique attrition is the number that matters when tuning: a
    gate whose failures are all caught elsewhere is free to tighten; one
    with large unique attrition is the binding constraint. Gate
    predicates are pure integer comparisons (n_typ·10 ≥ n_tok·3, not a
    float ratio), so the counts are exact in any engine.

    Scale shape: one projection computes all gate features in a single
    pass; the funnel is a 4-row aggregate — no per-gate rescans.
    """
    feats = _ff_feats_df(spark, sf_dir)
    feats.createOrReplaceTempView("dss_ff_feats")
    return spark.sql(
        _FF_SPARK_TAIL
    )


@corpus_memo
def _ff_feats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-doc gate features (token count, type count,
    language-marker hits, top-token count) — shared by the funnel audit
    (``k_filter_funnel``) and the cascade scheduler
    (``k_gate_cascade_order``), memoized per (session, corpus dir) as a
    localCheckpoint so the gate stack measures the corpus once per
    session, not once per consumer key.

    top_tok (the max repetition count of any single token) folds over
    the SORTED token array counting consecutive-run lengths — O(n log n)
    per doc and a constant-size struct accumulator, where the naive
    per-token map rebuild (map_filter + map_concat per element) is
    O(n·k) with k live map keys, all interpreted."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    out = docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_typ"),
        F.size(
            F.filter(
                toks,
                lambda w: w.isin(
                    "the", "a", "of", "and", "der", "die", "das", "und",
                    "el", "los", "las", "y", "le", "les", "des", "et",
                ),
            )
        ).alias("h_mark"),
        F.expr(
            "aggregate(array_sort(split(text, ' ')),"
            " struct(CAST(0 AS INT) AS run, CAST(0 AS INT) AS best,"
            "        CAST(NULL AS STRING) AS prev),"
            " (acc, w) -> struct("
            "   CASE WHEN acc.prev <=> w THEN acc.run + 1 ELSE 1 END AS run,"
            "   greatest(acc.best,"
            "     CASE WHEN acc.prev <=> w THEN acc.run + 1 ELSE 1 END)"
            "     AS best,"
            "   w AS prev),"
            " acc -> acc.best)"
        ).alias("top_tok"),
    )
    return out


_FF_SPARK_TAIL = f"""
    WITH gates AS (
      {_FF_GATES}
      FROM dss_ff_feats
    ), agg AS (
      SELECT count(*) AS n_docs,
             sum(CASE WHEN g_len AND g_lang AND g_ttr AND g_repeat
                 THEN 1 ELSE 0 END) AS n_keep,
             sum(CASE WHEN NOT g_len THEN 1 ELSE 0 END) AS f_len,
             sum(CASE WHEN NOT g_lang THEN 1 ELSE 0 END) AS f_lang,
             sum(CASE WHEN NOT g_ttr THEN 1 ELSE 0 END) AS f_ttr,
             sum(CASE WHEN NOT g_repeat THEN 1 ELSE 0 END) AS f_repeat,
             sum(CASE WHEN NOT g_len AND g_lang AND g_ttr AND g_repeat
                 THEN 1 ELSE 0 END) AS u_len,
             sum(CASE WHEN NOT g_lang AND g_len AND g_ttr AND g_repeat
                 THEN 1 ELSE 0 END) AS u_lang,
             sum(CASE WHEN NOT g_ttr AND g_len AND g_lang AND g_repeat
                 THEN 1 ELSE 0 END) AS u_ttr,
             sum(CASE WHEN NOT g_repeat AND g_len AND g_lang AND g_ttr
                 THEN 1 ELSE 0 END) AS u_repeat
      FROM gates
    )
    SELECT gate, CAST(n_fail AS BIGINT) AS n_fail,
           CAST(n_fail_unique AS BIGINT) AS n_fail_unique,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_keep AS BIGINT) AS n_keep
    FROM (
      SELECT stack(4, 'len', f_len, u_len,
                      'lang', f_lang, u_lang,
                      'ttr', f_ttr, u_ttr,
                      'repeat', f_repeat, u_repeat)
               AS (gate, n_fail, n_fail_unique),
             n_docs, n_keep
      FROM agg
    )
    """


def _body_quantile_normalize() -> str:
    return """
    WITH src AS (
      SELECT doc_id, source, n_chars,
             rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1
               AS rk,
             count(*) OVER (PARTITION BY source) - 1 AS den,
             count(*) OVER () AS n
      FROM documents
    ), pooled AS (
      SELECT n_chars AS v,
             row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS pos
      FROM documents
    ), tgt AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN den = 0 THEN 0
                  ELSE CAST(floor(CAST(rk AS DOUBLE) * (n - 1) / den)
                            AS BIGINT) END AS pos
      FROM src
    )
    SELECT t.doc_id, t.source, CAST(t.n_chars AS BIGINT) AS n_chars,
           CAST(p.v AS BIGINT) AS qnorm_n_chars
    FROM tgt t JOIN pooled p ON t.pos = p.pos
    """


@register("k_quantile_normalize", oracle=_body_quantile_normalize())
def k_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the per-source document-length
    distributions onto the pooled corpus distribution: each doc's length
    is replaced by the pooled value at the same quantile position — the
    cross-source calibration step that makes a length-based quality gate
    mean the same thing for a source of tweets and a source of books
    (same trick expression-array normalization uses). Position mapping is
    pure integer arithmetic (rank·(N−1)/den floor-quantized), so the
    mapped values are exact and the operator is an equi-join, not an
    interpolation.

    Scale shape: per-source rank windows shard on the source key; the
    pooled reference is ONE global row_number (a range-partitioned sort —
    the honest cost of building the reference distribution, done once and
    reusable); the mapping itself is an equi-join on position.
    """
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_quantile_normalize())


def _body_code_detect() -> str:
    return """
    WITH feat AS (
      SELECT doc_id, source,
             length(text) AS n,
             length(text) - length(replace(text, '{', '')) AS braces,
             length(text) - length(replace(text, ';', '')) AS semis,
             length(text) - length(replace(text, '=', '')) AS eqs,
             length(text) - length(replace(text, '(', '')) AS parens
      FROM documents
    ), scored AS (
      SELECT doc_id, source, n,
             CAST(braces + semis AS BIGINT) AS hard_markers,
             CAST(eqs + parens AS BIGINT) AS soft_markers,
             (braces + semis) * 2 + (eqs + parens) AS score_num
      FROM feat
    )
    SELECT doc_id, source,
           hard_markers, soft_markers,
           CAST(floor(score_num * 10000.0 / n) AS BIGINT) AS code_score_bp,
           (score_num * 1000 >= n * 5) AS looks_like_code
    FROM scored
    """


@register("k_code_detect", oracle=_body_code_detect())
def k_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic gate: marker-character densities (braces +
    semicolons weighted 2×, equals + parens 1×) per character, the
    integer-exact cousin of linguistic heuristics like ``k_text_langid``
    — a training-data mixer routes code and prose to different pipelines
    (different dedup thresholds, different quality gates), and this is
    the routing predicate when no file extension exists. The decision
    threshold (score ≥ 0.5% of characters) is evaluated as the pure
    integer cross-product score·1000 ≥ n·5 — no division anywhere near
    the boolean.

    Scale shape: pure scan-side projection (length/replace stay in
    codegen), zero shuffles."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_code_detect())


def _body_ocr_gate(tok_src: str, regex_fn: str) -> str:
    # tok_src: engine-specific token stream CTE; regex_fn('x', 'pat')
    return f"""
    WITH toks AS ({tok_src}),
    feat AS (
      SELECT doc_id, source, count(*) AS n_tok,
             sum(CASE WHEN length(tok) = 1 THEN 1 ELSE 0 END) AS singles,
             sum(CASE WHEN {regex_fn.format(col="tok", pat="'[a-zA-Z][0-9]|[0-9][a-zA-Z]'")}
                 THEN 1 ELSE 0 END) AS alnum_mixed,
             sum(CASE WHEN {regex_fn.format(col="tok", pat="'-$'")}
                 THEN 1 ELSE 0 END) AS hyphen_breaks
      FROM toks GROUP BY doc_id, source
    )
    SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(singles AS BIGINT) AS single_char_toks,
           CAST(alnum_mixed AS BIGINT) AS alnum_mixed_toks,
           CAST(hyphen_breaks AS BIGINT) AS hyphen_break_toks,
           CAST(floor((singles * 2 + alnum_mixed * 3 + hyphen_breaks * 5)
                      * 10000.0 / n_tok) AS BIGINT) AS ocr_risk_bp,
           ((singles * 2 + alnum_mixed * 3 + hyphen_breaks * 5) * 100
             >= n_tok * 3) AS flagged
    FROM feat
    """


@register(
    "k_ocr_artifact_gate",
    oracle=_body_ocr_gate(
        "SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok"
        " FROM documents",
        "regexp_matches({col}, {pat})",
    ),
)
def k_ocr_artifact_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR-artifact gate: token-level symptoms of scanned-document text —
    single-character tokens (broken kerning), letter/digit-mixed tokens
    (l→1, O→0 confusions), and trailing-hyphen tokens (un-rejoined line
    breaks) — weighted into a risk score, the gate a book/PDF corpus runs
    BEFORE the generic quality score (``k_text_quality``), because OCR
    noise degrades dedup shingles and tokenizer fertility before it shows
    up as low quality. The flag threshold (weighted score ≥ 3% of tokens)
    is an integer cross-product, division-free.

    Scale shape: scan-side explode + per-doc reduce (map-side partials);
    regexes stay in codegen — no UDFs."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _body_ocr_gate(
            "SELECT doc_id, source, explode(split(text, ' ')) AS tok"
            " FROM documents",
            "{col} RLIKE {pat}",
        )
    )


@register(
    "k_text_winnowing",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, chr(32)) AS words FROM documents
      WHERE len(string_split(text, chr(32))) >= 7
    ), sh AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(words) - 3),
                            i -> md5(array_to_string(words[i:i+3], chr(32))))
               AS hs
      FROM w
    ), fp AS (
      SELECT doc_id, len(hs) AS n_grams,
             len(hs) - 3 AS n_windows,
             list_distinct(
               list_transform(generate_series(1, len(hs) - 3),
                              i -> list_aggregate(hs[i:i+3], 'min'))
             ) AS fps
      FROM sh
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(floor(len(fps) * 1000000 / n_windows) AS BIGINT)
             AS density_ppm,
           list_aggregate(fps, 'min') AS fp_head
    FROM fp
    """,
)
def k_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003
    — the MOSS algorithm): md5 over every 4-word k-gram, then keep the
    MINIMUM hash of every sliding window of w=4 consecutive k-gram hashes
    and dedup — the guarantee is that any shared substring of length
    ≥ k+w−1 words between two documents shares at least one selected
    fingerprint, which is what makes fingerprint-bucket joins a complete
    plagiarism/reuse detector (``k_text_fingerprint`` keeps only the
    global min/max; this key keeps the winnowed SET). Expected density is
    2/(w+1) ≈ 0.4 of windows; emitted as exact floor-ppm per doc.

    Scale shape: map-only — all selection happens inside per-doc array
    algebra at scan site (no explode, no shuffle); the downstream reuse
    join would bucket on the fingerprint value exactly like the
    shingle-hash dedup family. The k-gram hash array and the winnowed
    set are each materialized ONCE per row in their own projection —
    higher-order array lambdas run interpreted (no codegen CSE), so
    inlining them per output column re-hashes the document five times
    (measured 85 s → 8 s at sf0.1); staged aliases referenced more than
    once stay un-collapsed by Catalyst's cheap-expression rule.
    load_parallel: the single-row-group corpus file otherwise leaves the
    whole interpreted-lambda scan on one core."""
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    words = F.split("text", " ")
    # words slice is 1-based, length-4 → the same 4-word window as
    # DuckDB's inclusive l[i:i+3]
    grams = d.filter(F.size(words) >= 7).select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 3), "
            "i -> md5(concat_ws(' ', slice(split(text, ' '), i, 4))))"
        ).alias("hs"),
    )
    winnowed = grams.select(
        "doc_id",
        "hs",
        F.expr(
            "array_distinct(transform(sequence(1, size(hs) - 3), "
            "i -> array_min(slice(hs, i, 4))))"
        ).alias("fps"),
    )
    return winnowed.select(
        "doc_id",
        F.size("hs").cast("long").alias("n_grams"),
        (F.size("hs") - 3).cast("long").alias("n_windows"),
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.floor(F.size("fps") * 1000000 / (F.size("hs") - 3))
        .cast("long")
        .alias("density_ppm"),
        F.array_min("fps").alias("fp_head"),
    )


@register(
    "k_dedup_lines",
    oracle="""
    WITH lines AS (
      SELECT doc_id, trim(l) AS line
      FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS l
            FROM documents) t
      WHERE trim(l) <> ''
    ), hashed AS (
      SELECT doc_id, md5(lower(line)) AS h FROM lines
    ), df AS (
      SELECT h, count(DISTINCT doc_id) AS n_docs_with FROM hashed GROUP BY h
    ), per_doc AS (
      SELECT ha.doc_id, count(*) AS n_lines,
             sum(CASE WHEN df.n_docs_with > 1 THEN 1 ELSE 0 END)
               AS n_shared_lines
      FROM hashed ha JOIN df USING (h)
      GROUP BY ha.doc_id
    )
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_shared_lines AS BIGINT) AS n_shared_lines,
           CAST(floor(n_shared_lines * 1000000 / n_lines) AS BIGINT)
             AS shared_ppm,
           (n_shared_lines * 2 > n_lines) AS mostly_boilerplate
    FROM per_doc
    """,
)
def k_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup census — the C4 cleaning op (Raffel et al. 2020
    deduplicated at the three-sentence/line granularity, not the
    document): split on sentence boundaries, hash each normalized line,
    and per document count how many of its lines also occur in OTHER
    documents — the boilerplate fraction (navbars, footers, license
    headers) that document-level dedup (``k_dedup_exact``) and span
    dedup (``k_dedup_spans``, char-shingle) both miss at this
    granularity. Docs whose shared fraction exceeds ½ get the
    ``mostly_boilerplate`` drop flag; ``k_boilerplate_phrases`` is the
    editor-facing census of WHICH phrases, this is the per-doc decision.

    Scale shape: one explode → (hash) reduce for the cross-doc line
    index (the partial-agg dictionary shuffle), one hash-keyed join
    back, one doc-spine reduce. At 100 TB the line index is exactly the
    persisted bucketed hash index the incremental dedup key documents.
    """
    d = load_parallel(spark, sf_dir, "documents", "doc_id")
    lines = (
        d.select(
            "doc_id",
            F.explode(F.split("text", "\\. ")).alias("l"),
        )
        .select("doc_id", F.trim("l").alias("line"))
        .filter(F.col("line") != "")
    )
    hashed = lines.select("doc_id", F.md5(F.lower("line")).alias("h"))
    df_ = hashed.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    per_doc = (
        hashed.join(df_, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("n_docs_with") > 1, 1).otherwise(0)
            ).alias("n_shared_lines"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_lines").cast("long"),
        F.col("n_shared_lines").cast("long"),
        F.floor(F.col("n_shared_lines") * 1000000 / F.col("n_lines"))
        .cast("long")
        .alias("shared_ppm"),
        (F.col("n_shared_lines") * 2 > F.col("n_lines")).alias(
            "mostly_boilerplate"
        ),
    )


@register(
    "k_loop_detect",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), per AS (
      SELECT doc_id, n,
             CASE
               WHEN n >= 2 AND ws[n:n] = ws[n-1:n-1] THEN 1
               WHEN n >= 4 AND ws[n-1:n] = ws[n-3:n-2] THEN 2
               WHEN n >= 6 AND ws[n-2:n] = ws[n-5:n-3] THEN 3
               WHEN n >= 8 AND ws[n-3:n] = ws[n-7:n-4] THEN 4
               WHEN n >= 10 AND ws[n-4:n] = ws[n-9:n-5] THEN 5
               ELSE 0
             END AS loop_period
      FROM w
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_words,
           CAST(loop_period AS INT) AS loop_period,
           (loop_period > 0) AS tail_looped
    FROM per
    """,
)
def k_loop_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-loop detector: does the document END in an immediately
    repeated block — the degenerate-decoding signature ("the the", "of
    the of the") that plagues greedy/low-temperature model output and
    poisons training data with probability mass on repetition. Checks
    tail periods 1–5: period p fires when the last p words equal the p
    words before them; the SMALLEST period is reported (a p-periodic
    tail also matches 2p — first-match order makes the answer the
    minimal period). ``k_text_repetition`` scores global n-gram
    repetitiveness; this is the targeted tail-loop gate an output
    filter runs first because it's O(1) per doc.

    Scale shape: pure map-side array-slice compares at scan site — no
    explode, no shuffle, no UDF; the whole gate is a CASE expression.
    """
    d = load(spark, sf_dir, "documents")
    # Spark slice(ws, start, len) is 1-based; DuckDB ws[a:b] inclusive.
    per = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n"),
        F.expr(
            """
            CASE
              WHEN size(split(text, ' ')) >= 2
                   AND slice(split(text, ' '), size(split(text, ' ')), 1)
                     = slice(split(text, ' '), size(split(text, ' ')) - 1, 1)
              THEN 1
              WHEN size(split(text, ' ')) >= 4
                   AND slice(split(text, ' '), size(split(text, ' ')) - 1, 2)
                     = slice(split(text, ' '), size(split(text, ' ')) - 3, 2)
              THEN 2
              WHEN size(split(text, ' ')) >= 6
                   AND slice(split(text, ' '), size(split(text, ' ')) - 2, 3)
                     = slice(split(text, ' '), size(split(text, ' ')) - 5, 3)
              THEN 3
              WHEN size(split(text, ' ')) >= 8
                   AND slice(split(text, ' '), size(split(text, ' ')) - 3, 4)
                     = slice(split(text, ' '), size(split(text, ' ')) - 7, 4)
              THEN 4
              WHEN size(split(text, ' ')) >= 10
                   AND slice(split(text, ' '), size(split(text, ' ')) - 4, 5)
                     = slice(split(text, ' '), size(split(text, ' ')) - 9, 5)
              THEN 5
              ELSE 0
            END
            """
        ).cast("int").alias("loop_period"),
    )
    return per.select(
        "doc_id",
        F.col("n").cast("long").alias("n_words"),
        "loop_period",
        (F.col("loop_period") > 0).alias("tail_looped"),
    )


_IMPERATIVES = (
    "write explain describe list summarize give create make find show"
).split()


@register(
    "k_instruction_mine",
    oracle=f"""
    WITH sig AS (
      SELECT source,
             CASE WHEN list_contains({list(_IMPERATIVES)!r},
                    lower(string_split(trim(text), ' ')[1]))
                  THEN 1 ELSE 0 END AS s_imperative,
             CASE WHEN text LIKE '%?%' THEN 1 ELSE 0 END AS s_question,
             CASE WHEN regexp_matches(text, '[0-9]+\\.')
                  THEN 1 ELSE 0 END AS s_numbered,
             CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 200
                  THEN 1 ELSE 0 END AS s_length
      FROM documents
    ), scored AS (
      SELECT source,
             s_imperative + s_question + s_numbered + s_length AS score
      FROM sig
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_instructionish,
           CAST(floor(sum(CASE WHEN score >= 2 THEN 1 ELSE 0 END)
                      * 1000000 / count(*)) AS BIGINT) AS instruction_ppm,
           CAST(sum(score) AS BIGINT) AS score_mass
    FROM scored GROUP BY source
    """,
)
def k_instruction_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-likeness census per source — the cheap first-pass miner
    an SFT-data pipeline runs over a web corpus before paying for a
    classifier: stack of scan-side signals (imperative first word,
    question mark, numbered-list pattern, instruction-typical length
    5–200 words), score ≥ 2 of 4 flags a doc as instruction-shaped.
    Per-source yield in floor-ppm tells WHERE to aim the expensive
    classifier (``k_quality_logreg`` is the trained sibling;
    ``k_sft_records``/``k_chat_template_render`` consume what this
    finds). Signals are deliberately high-recall/low-precision — the
    census is a routing decision, not a label.

    Scale shape: pure scan-side boolean projections (regex + first-token
    compare in codegen, no UDF) into one source-keyed reduce."""
    d = load(spark, sf_dir, "documents")
    first_word = F.lower(
        F.element_at(F.split(F.trim(F.col("text")), " "), 1)
    )
    score = (
        F.when(first_word.isin(*_IMPERATIVES), 1).otherwise(0)
        + F.when(F.col("text").contains("?"), 1).otherwise(0)
        + F.when(F.col("text").rlike("[0-9]+\\."), 1).otherwise(0)
        + F.when(
            F.size(F.split("text", " ")).between(5, 200), 1
        ).otherwise(0)
    )
    scored = d.select("source", score.alias("score"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("score") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_instructionish"),
        F.floor(
            F.sum(F.when(F.col("score") >= 2, 1).otherwise(0))
            * 1000000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("instruction_ppm"),
        F.sum("score").cast("long").alias("score_mass"),
    )


_CASCADE_COSTS = "('len', 1), ('lang', 3), ('ttr', 5), ('repeat', 8)"


_CASCADE_STACK_SPARK = """SELECT gate, n_fail, n
      FROM (SELECT stack(4, 'len', f_len, 'lang', f_lang,
                            'ttr', f_ttr, 'repeat', f_repeat)
                     AS (gate, n_fail), n FROM agg)"""

# DuckDB unpivots the SAME one-row aggregate with UNION branches — each
# branch reads the 1-row agg, not the corpus (and DuckDB materializes
# multiply-referenced CTEs anyway; Spark would inline them per branch,
# which is why its side uses stack()).
_CASCADE_STACK_DUCK = """SELECT 'len' AS gate, f_len AS n_fail, n FROM agg
      UNION ALL SELECT 'lang', f_lang, n FROM agg
      UNION ALL SELECT 'ttr', f_ttr, n FROM agg
      UNION ALL SELECT 'repeat', f_repeat, n FROM agg"""


def _cascade_pergate(with_prefix: str, feats_src: str,
                     per_gate_unroll: str) -> str:
    """Gate rejection counts as a 4-row (gate, n_fail, n) table from ONE
    corpus aggregate — Spark unpivots with stack(), DuckDB with UNION
    branches over the 1-row agg."""
    return f"""
    {with_prefix} gates AS (
      {_FF_GATES}
      FROM {feats_src}
    ), agg AS (
      SELECT count(*) AS n,
             sum(CASE WHEN NOT g_len THEN 1 ELSE 0 END) AS f_len,
             sum(CASE WHEN NOT g_lang THEN 1 ELSE 0 END) AS f_lang,
             sum(CASE WHEN NOT g_ttr THEN 1 ELSE 0 END) AS f_ttr,
             sum(CASE WHEN NOT g_repeat THEN 1 ELSE 0 END) AS f_repeat
      FROM gates
    )
    {per_gate_unroll}
    """


def _cascade_sched(per_gate_src: str) -> str:
    """Scheduling SQL over the 4-row per-gate table — shared verbatim by
    the Spark side (per-gate table localCheckpointed, so the corpus is
    scanned exactly once regardless of how many times the scheduler
    references the spine) and the DuckDB oracle (per-gate as a CTE)."""
    return f"""
    WITH tot AS (SELECT max(n) AS n FROM {per_gate_src}),
    costed AS (
      SELECT p.gate, c.cost, p.n_fail
      FROM {per_gate_src} p
      JOIN (SELECT * FROM (VALUES {_CASCADE_COSTS}) v(gate, cost)) c
        ON c.gate = p.gate
    ), ranked AS (
      SELECT gate, cost, n_fail,
             row_number() OVER (
               ORDER BY n_fail * (120 / cost) DESC, gate) AS cascade_rank
      FROM costed
    ), piv AS (
      SELECT max(CASE WHEN cascade_rank = 1 THEN n_fail END) AS f1,
             max(CASE WHEN cascade_rank = 2 THEN n_fail END) AS f2,
             max(CASE WHEN cascade_rank = 3 THEN n_fail END) AS f3
      FROM ranked
    ), reach AS (
      SELECT r.gate, r.cost, r.n_fail, r.cascade_rank,
             CAST(floor(CASE r.cascade_rank
               WHEN 1 THEN 1000000.0
               WHEN 2 THEN (CAST(t.n - p.f1 AS DOUBLE) / t.n) * 1000000
               WHEN 3 THEN (CAST(t.n - p.f1 AS DOUBLE) / t.n)
                         * (CAST(t.n - p.f2 AS DOUBLE) / t.n) * 1000000
               ELSE (CAST(t.n - p.f1 AS DOUBLE) / t.n)
                  * (CAST(t.n - p.f2 AS DOUBLE) / t.n)
                  * (CAST(t.n - p.f3 AS DOUBLE) / t.n) * 1000000
             END) AS BIGINT) AS reach_ppm
      FROM ranked r CROSS JOIN piv p CROSS JOIN tot t
    )
    SELECT gate, CAST(cost AS INT) AS cost,
           CAST(n_fail AS BIGINT) AS n_fail,
           CAST(cascade_rank AS INT) AS cascade_rank,
           reach_ppm,
           CAST(cost * reach_ppm AS BIGINT) AS exp_cost_contrib_ppm,
           CAST(sum(cost * reach_ppm) OVER () AS BIGINT)
             AS exp_cost_total_ppm
    FROM reach
    """


def _duck_ff_feats() -> str:
    split_fn = "string_split(text, chr(32))"
    return f"""feats AS (
      SELECT doc_id,
             len({split_fn}) AS n_tok,
             len(list_distinct({split_fn})) AS n_typ,
             len(list_filter({split_fn},
               w -> w IN ('the','a','of','and','der','die','das','und',
                          'el','los','las','y','le','les','des','et')))
               AS h_mark,
             (SELECT max(c) FROM (
                SELECT count(*) AS c FROM (
                  SELECT unnest({split_fn}) AS w2) GROUP BY w2) t)
               AS top_tok
      FROM documents
    ),"""


@register(
    "k_gate_cascade_order",
    oracle=_cascade_pergate("WITH " + _duck_ff_feats(), "feats",
                            ", per_gate AS (" + _CASCADE_STACK_DUCK + ")")
    .rstrip()
    + _cascade_sched("per_gate").replace("WITH tot", ", tot", 1),
)
def k_gate_cascade_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-aware ordering of the quality-gate cascade (the Viola-Jones
    cascade principle applied to a FineWeb-style filter stack): given
    each gate's empirical rejection count and its evaluation cost
    (documented feature-cost units: length 1, language-marker 3,
    lexical-diversity 5, repetition 8), greedily order by
    rejections-per-cost -- exact integer sort key n_fail*(120/cost),
    120 = lcm of the costs -- and report each stage's reach probability
    (independence approximation over the measured marginal rates) and
    expected per-doc cost contribution. The total is the number a
    100 TB curation run minimizes: running the 8-unit repetition gate
    first wastes 8 units on every doc the 1-unit length gate would have
    killed. ``k_filter_funnel`` measures the gates; this key schedules
    them. Reuses the funnel's feats projection verbatim (shared
    ``_ff_feats_df``).

    Scale shape: same single-pass gate features as the funnel, then all
    scheduling arithmetic on the 4-row gate spine."""
    _ff_feats_df(spark, sf_dir).createOrReplaceTempView("dss_cascade_feats")
    per_gate = spark.sql(
        _cascade_pergate("WITH", "dss_cascade_feats", _CASCADE_STACK_SPARK)
    ).localCheckpoint()
    per_gate.createOrReplaceTempView("dss_cascade_pergate")
    return spark.sql(_cascade_sched("dss_cascade_pergate"))


# -------------------------------------------- sorted-token fingerprint ----


@register(
    "k_dedup_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS fingerprint
      FROM documents
    )
    SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
    FROM fp GROUP BY fingerprint HAVING count(*) > 1
    """,
)
def k_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-collision (fingerprint) clustering, the OpenRefine/record-
    linkage normalization: lowercase, tokenize, DEDUPLICATE and SORT the
    token set, md5 the rejoined string. Documents that differ only in
    token ORDER or token REPETITION collapse to one fingerprint —
    the bag-of-words dedup tier between exact-hash (k_dedup_exact,
    byte-identical only) and MinHash (k_dedup_minhash_sql, lossy
    similarity). Emits multi-document fingerprint groups with the min
    doc_id as canonical.

    Both engines sort the distinct ASCII tokens under binary collation
    and md5 the identical string, so fingerprints are bit-for-bit equal.
    Scale: the shuffle carries 16-byte digests + doc ids (the
    k_dedup_exact shape) — never document text; the sort is per-row over
    a doc's own vocabulary, not a global sort.
    """
    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.array_sort(
                    F.array_distinct(F.split(F.lower(F.col("text")), " "))
                ),
                " ",
            )
        ).alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------- cross-doc duplicate trigrams ----


@register(
    "k_text_dup_ngram_frac",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
      FROM t, unnest(list_transform(generate_series(1, len(w) - 2),
                                    i -> i)) AS u(i)
    ), df AS (
      SELECT gram, count(DISTINCT doc_id) AS n_docs
      FROM g GROUP BY gram
    )
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_grams,
           round(sum(CASE WHEN df.n_docs >= 2 THEN 1.0 ELSE 0.0 END)
                 / count(*), 4) AS dup_frac
    FROM g JOIN df USING (gram)
    GROUP BY g.doc_id
    """,
)
def k_text_dup_ngram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-trigram fraction per document: the share
    of a doc's word-trigram OCCURRENCES that also appear in at least one
    OTHER document — the RefinedWeb/Gopher-style "duplicated n-gram"
    quality signal that catches boilerplate a within-doc repetition score
    (k_text_repetition) cannot (the repeated text lives in the corpus,
    not the doc).

    Two shuffles at scale (r13): trigram stream → ONE gram-keyed window
    ("appears in >= 2 distinct docs" is exactly min(doc_id) !=
    max(doc_id) over the gram partition — the k_dedup_spans identity) →
    doc-keyed count reduce. The r13 rewrite also hoists split(text) into
    a column BEFORE the position lambda: the old form re-ran split per
    lambda element (O(len²) string work per doc inside the interpreted
    evaluator) and re-derived the whole explode on the join-back probe
    side. Interleaved A/B at sf0.1: 4.10 s → 1.83 s (hoist alone) →
    1.11 s (hoist + window). Counts are exact integers; the only float
    is the final 4dp ratio with a doc-local denominator.
    """
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    # size >= 3 fence: sequence(1, size-2) auto-steps DOWN for 1-2-token
    # docs ([1, 0] — the ADVICE-r2 trap class); the oracle's
    # generate_series(1, len-2) is empty there, so filter first.
    t = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    g = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', slice(toks, i, 3)))"
            )
        ).alias("gram"),
    )
    gw = Window.partitionBy("gram")
    flagged = g.select(
        "doc_id",
        (F.min("doc_id").over(gw) != F.max("doc_id").over(gw)).alias(
            "is_dup"
        ),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_grams"),
            F.round(
                F.sum(F.when(F.col("is_dup"), 1.0).otherwise(0.0))
                / F.count(F.lit(1)),
                4,
            ).alias("dup_frac"),
        )
    )


# ------------------------------------------------ source vocab overlap ----

# Distinct (source, token) vocabulary — referenced three times by the
# pair fit (both self-join sides + the per-source sizes), so the Spark
# side localCheckpoints it first (the k_bradley_terry pattern: Spark
# inlines multi-referenced CTEs and would re-tokenize the corpus per
# reference); the DuckDB oracle keeps the single WITH-chain because it
# materializes multi-referenced CTEs.
_VOCAB_TOK_SQL = """
      SELECT DISTINCT source, token
      FROM (
        SELECT source, explode(split(lower(text), ' ')) AS token
        FROM documents
      ) t WHERE token <> ''
"""


def _vocab_fit_sql(tok_sql: str) -> str:
    return f"""
    WITH tok AS ({tok_sql}), sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS v FROM tok GROUP BY 1
    ), pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM tok a JOIN tok b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b,
           va.v AS vocab_a, vb.v AS vocab_b, p.n_common,
           round(p.n_common
                 / (va.v + vb.v - p.n_common * 1.0e0), 4) + 0.0
             AS jaccard,
           round(p.n_common / (CASE WHEN va.v < vb.v THEN va.v
                                    ELSE vb.v END * 1.0e0), 4) + 0.0
             AS containment_min
    FROM pairs p
    JOIN sizes va ON p.source_a = va.source
    JOIN sizes vb ON p.source_b = vb.source
    """


@register(
    "k_vocab_overlap",
    oracle=_vocab_fit_sql(
        _VOCAB_TOK_SQL.replace(
            "explode(split(lower(text), ' '))",
            "unnest(string_split(lower(text), ' '))",
        )
    ),
)
def k_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair VOCABULARY overlap: token-set Jaccard and
    min-containment for every source pair — the lexical-register view
    of corpus mix next to ``k_source_overlap_matrix``'s document-level
    syndication graph (two feeds can share zero documents yet be the
    same register, or syndicate heavily while one adds its own jargon;
    these two matrices separate the cases). High containment with low
    Jaccard flags a sub-register — the smaller source's vocabulary
    lives inside the bigger one's.

    The pair join runs on the DISTINCT (source, token) table — Zipf-
    compact vocabulary rows, never corpus text; counts are exact
    integers and the only floats are the two final ratios. Spark side
    localCheckpoints the vocabulary before the triple-referenced fit
    (see `_VOCAB_TOK_SQL`); output is |sources|^2-bounded.

    Scale: one tokenize + distinct shuffle to vocabulary rows, then a
    token-keyed equi-join on the compressed table.
    """
    import uuid

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    view = f"dss_vocab_tok_{uuid.uuid4().hex[:12]}"
    spark.sql(_VOCAB_TOK_SQL).localCheckpoint().createOrReplaceTempView(view)
    try:
        return spark.sql(_vocab_fit_sql(f"SELECT * FROM {view}"))
    finally:
        spark.catalog.dropTempView(view)


# ------------------------------ generation-eval overlap metrics (r13) ----

# BLEU / ROUGE-N / distinct-n share one clipped-n-gram machine over
# deterministic within-source (candidate, reference) document pairs:
# rn-adjacent docs by doc_id, each doc used in at most one pair. The
# engine-split surfaces are array/lambda spellings only; counts are
# exact integers and every ratio is a correctly-rounded division of
# exact integers (identical cross-engine), rounded via the bit-identical
# floor form. The one libm exposure is BLEU's brevity-penalty exp(),
# documented on the key.
_EVAL_SPARK = {
    "TOK": "filter(split(lower(text), ' '), t -> t <> '')",
    "SIZE": "size",
    "EXPLODE": "explode",
    "ARRCAT": "concat",
    "EMPTY": "array()",
    # sequence() is guarded by the CASE: Spark auto-steps DOWN for
    # sequence(2, 1) (the standing trap), so size >= 2 must gate it
    "BIGRAMS": (
        "CASE WHEN size({a}) >= 2 THEN transform(sequence(2, size({a})),"
        " i -> concat(element_at({a}, i - 1), ' ', element_at({a}, i))) END"
    ),
}
_EVAL_DUCK = {
    "TOK": "list_filter(string_split(lower(text), ' '), t -> t <> '')",
    "SIZE": "len",
    "EXPLODE": "unnest",
    "ARRCAT": "list_concat",
    "EMPTY": "[]",
    "BIGRAMS": (
        "CASE WHEN len({a}) >= 2 THEN list_transform(generate_series(2,"
        " len({a})), i -> {a}[i - 1] || ' ' || {a}[i]) END"
    ),
}


def _eval_pairs_sql(d: dict) -> str:
    """(source, cand_id, ca, ra) — rn-odd doc paired with its rn+1
    neighbor within source via lead() (single corpus pass, no self-join:
    Spark inlines multi-referenced CTEs)."""
    return f"""
      SELECT source, doc_id AS cand_id, ca, ra
      FROM (
        SELECT source, doc_id, a AS ca,
               lead(a) OVER (PARTITION BY source ORDER BY doc_id) AS ra,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM (SELECT source, doc_id, {d['TOK']} AS a FROM documents) t
      ) p
      WHERE rn % 2 = 1 AND ra IS NOT NULL
    """


def _eval_overlap_prefix(d: dict, pairs_src: str,
                         lens_src: str = "pairs") -> str:
    """CTE chain pairs -> per-pair clipped gram matches + exact totals.

    Uni- and bigrams ride ONE explode per side (bigrams contain a space,
    so n derives from the gram itself); both sides carry a side flag
    through ONE union, so the clipped match min(cand_count, ref_count)
    per (pair, gram) falls out of a SINGLE (pair, gram)-keyed
    aggregation — no per-side count tables and no re-keyed join (the
    ``k_eval_chrf`` r13 rewrite, here with word grams: the join design
    paid two count-table exchanges plus an SMJ; this pays one exchange).
    `pairs` stays the only multi-referenced CTE (DuckDB materializes
    CTEs). Totals come from array sizes, not a gram re-scan.

    ``lens_src`` (r14): the lens totals are a GLOBAL aggregate that does
    not need the cand_id hash spread the gram machine wants, but Spark
    cannot reuse the repartition exchange across the two references
    (ExistingRDD defeats canonical equality), so routing each reference
    through `pairs` paid the pair-row exchange TWICE. The Spark callers
    pass the bare checkpoint view here so lens aggregates straight off
    the pinned rows; DuckDB keeps the default (both read the one CTE)."""
    big_c = d["BIGRAMS"].format(a="ca")
    big_r = d["BIGRAMS"].format(a="ra")
    if d is _EVAL_SPARK:
        # r14: single-scan side explode instead of UNION ALL — UnionExec
        # reports UnknownPartitioning, which forced a corpus-sized
        # (cand_id, gram) exchange into pg. Generate preserves the pair
        # spine's hash partitioning on cand_id (the caller repartitions
        # by cand_id), so pg aggregates exchange-free; same (cand_id,
        # gram, is_c) row multiset as the union (explode of a NULL/empty
        # side array yields no rows either way). DuckDB keeps the union
        # text — vectorized native, and the oracle is not the hot path.
        ug = f"""
      SELECT cand_id, gram, sd.is_c AS is_c
      FROM pairs
      LATERAL VIEW explode(array(
          named_struct('g', {d['ARRCAT']}(ca, coalesce({big_c}, {d['EMPTY']})),
                       'is_c', 1),
          named_struct('g', {d['ARRCAT']}(ra, coalesce({big_r}, {d['EMPTY']})),
                       'is_c', 0))) sides AS sd
      LATERAL VIEW explode(sd.g) g0 AS gram"""
    else:
        ug = f"""
      SELECT cand_id,
             {d['EXPLODE']}({d['ARRCAT']}(ca, coalesce({big_c}, {d['EMPTY']})))
               AS gram, 1 AS is_c
      FROM pairs
      UNION ALL
      SELECT cand_id,
             {d['EXPLODE']}({d['ARRCAT']}(ra, coalesce({big_r}, {d['EMPTY']})))
               AS gram, 0 AS is_c
      FROM pairs"""
    return f"""
    WITH pairs AS ({pairs_src}),
    ug AS ({ug}
    ), pg AS (
      SELECT cand_id, gram, sum(is_c) AS cc, sum(1 - is_c) AS rc
      FROM ug GROUP BY 1, 2
    ), m AS (
      -- a word gram's own shape IS its n: bigrams contain a space
      SELECT CASE WHEN gram LIKE '% %' THEN 2 ELSE 1 END AS n,
             sum(CASE WHEN cc < rc THEN cc ELSE rc END) AS matched
      FROM pg GROUP BY 1
    ), mm AS (
      SELECT coalesce(sum(CASE WHEN n = 1 THEN matched END), 0) AS m1,
             coalesce(sum(CASE WHEN n = 2 THEN matched END), 0) AS m2
      FROM m
    ), lens AS (
      SELECT count(*) AS n_pairs,
             sum({d['SIZE']}(ca)) AS c_tok, sum({d['SIZE']}(ra)) AS r_tok,
             sum(greatest({d['SIZE']}(ca) - 1, 0)) AS c_bi,
             sum(greatest({d['SIZE']}(ra) - 1, 0)) AS r_bi
      FROM {lens_src}
    )
    """


def _body_bleu(d: dict, pairs_src: str, lens_src: str = "pairs") -> str:
    return _eval_overlap_prefix(d, pairs_src, lens_src) + """
    SELECT CAST(l.n_pairs AS BIGINT) AS n_pairs,
           CAST(l.c_tok AS BIGINT) AS cand_tokens,
           CAST(l.r_tok AS BIGINT) AS ref_tokens,
           CAST(mm.m1 AS BIGINT) AS match_1,
           CAST(mm.m2 AS BIGINT) AS match_2,
           CAST(l.c_bi AS BIGINT) AS cand_bigrams,
           floor(mm.m1 * 1.0e0 / nullif(l.c_tok, 0) * 1000000.0e0 + 0.5)
             / 1000000.0e0 AS p1,
           floor(mm.m2 * 1.0e0 / nullif(l.c_bi, 0) * 1000000.0e0 + 0.5)
             / 1000000.0e0 AS p2,
           floor(CASE WHEN l.c_tok >= l.r_tok THEN 1.0e0
                      ELSE exp(1.0e0 - l.r_tok * 1.0e0 / nullif(l.c_tok, 0))
                 END * 1000000.0e0 + 0.5) / 1000000.0e0 AS brevity_penalty,
           floor(CASE WHEN l.c_tok >= l.r_tok THEN 1.0e0
                      ELSE exp(1.0e0 - l.r_tok * 1.0e0 / nullif(l.c_tok, 0))
                 END
                 * sqrt((mm.m1 * 1.0e0 / nullif(l.c_tok, 0))
                        * (mm.m2 * 1.0e0 / nullif(l.c_bi, 0)))
                 * 10000.0e0 + 0.5) / 10000.0e0 AS bleu_2
    FROM lens l CROSS JOIN mm
    """


def _body_rouge(d: dict, pairs_src: str, lens_src: str = "pairs") -> str:
    return _eval_overlap_prefix(d, pairs_src, lens_src) + """
    , spine AS (SELECT 1 AS n UNION ALL SELECT 2)
    SELECT CAST(s.n AS INT) AS ngram_n,
           CAST(CASE WHEN s.n = 1 THEN mm.m1 ELSE mm.m2 END AS BIGINT)
             AS n_matched,
           CAST(CASE WHEN s.n = 1 THEN l.c_tok ELSE l.c_bi END AS BIGINT)
             AS cand_grams,
           CAST(CASE WHEN s.n = 1 THEN l.r_tok ELSE l.r_bi END AS BIGINT)
             AS ref_grams,
           floor(CASE WHEN s.n = 1 THEN mm.m1 ELSE mm.m2 END * 1.0e0
                 / nullif(CASE WHEN s.n = 1 THEN l.c_tok ELSE l.c_bi END, 0)
                 * 1000000.0e0 + 0.5) / 1000000.0e0 AS rouge_precision,
           floor(CASE WHEN s.n = 1 THEN mm.m1 ELSE mm.m2 END * 1.0e0
                 / nullif(CASE WHEN s.n = 1 THEN l.r_tok ELSE l.r_bi END, 0)
                 * 1000000.0e0 + 0.5) / 1000000.0e0 AS rouge_recall,
           floor(coalesce(
                 2.0e0 * (CASE WHEN s.n = 1 THEN mm.m1 ELSE mm.m2 END * 1.0e0)
                 / nullif((CASE WHEN s.n = 1 THEN l.c_tok ELSE l.c_bi END)
                          + (CASE WHEN s.n = 1 THEN l.r_tok ELSE l.r_bi END),
                          0), 0.0e0)
                 * 1000000.0e0 + 0.5) / 1000000.0e0 AS rouge_f1
    FROM spine s CROSS JOIN lens l CROSS JOIN mm
    """


@register(
    "k_eval_bleu",
    oracle=_body_bleu(_EVAL_DUCK, _eval_pairs_sql(_EVAL_DUCK)),
)
def k_eval_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-2 (Papineni 2002) over deterministic within-source
    document pairs: clipped uni/bigram precision with brevity penalty —
    BLEU = BP * sqrt(p1 * p2). The reference-overlap eval a generation
    pipeline runs between model outputs and references; here the pair
    spine is rn-adjacent docs per source, so the metric doubles as a
    neighbor-similarity floor for the corpus itself. Clipping
    (min(cand_count, ref_count) per gram) is the part naive precision
    gets wrong — a candidate repeating one common token scores ~0, not 1.

    Exactness: matches/totals are exact integers; p1/p2 are single
    correctly-rounded divisions (identical cross-engine); the ONE libm
    surface is the brevity-penalty exp() under 4dp rounding (the
    documented ln/exp exposure class). BP is also emitted separately so
    the exp surface is auditable. F1-style denominators carry nullif
    fences for empty-token corpora.

    Scale: one tokenize pass to the pair spine (lead(), no self-join),
    one explode per side with uni+bigrams riding the same explode, one
    (pair, gram)-keyed join of Zipf-compact count tables. The Spark
    side localCheckpoints the 3-times-referenced pair table (Spark
    inlines multi-referenced CTEs — the k_bradley_terry pattern).
    """
    import uuid

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    view = f"dss_eval_pairs_{uuid.uuid4().hex[:12]}"
    ck_view = f"{view}_ck"
    # r14: checkpoint the spine once (as before), then hash-spread the
    # CHECKPOINT by cand_id — the pair-row exchange is cheap (|pairs|
    # rows), and downstream the single-scan side-explode preserves that
    # partitioning so pg's corpus-sized (cand_id, gram) exchange
    # disappears (see k_eval_chrf). The lens totals read the BARE
    # checkpoint view: they are a global aggregate that gains nothing
    # from the spread, and ExistingRDD defeats exchange reuse, so
    # routing them through the spread view paid the pair exchange twice.
    ck = spark.sql(_eval_pairs_sql(_EVAL_SPARK)).localCheckpoint()
    ck.createOrReplaceTempView(ck_view)
    ck.repartition(
        spark.sparkContext.defaultParallelism, F.col("cand_id")
    ).createOrReplaceTempView(view)
    try:
        return spark.sql(
            _body_bleu(_EVAL_SPARK, f"SELECT * FROM {view}", ck_view)
        )
    finally:
        spark.catalog.dropTempView(view)
        spark.catalog.dropTempView(ck_view)


@register(
    "k_eval_rouge_n",
    oracle=_body_rouge(_EVAL_DUCK, _eval_pairs_sql(_EVAL_DUCK)),
)
def k_eval_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ROUGE-1 / ROUGE-2 (Lin 2004) precision, recall and F1 over
    the same deterministic pair spine as ``k_eval_bleu`` — the
    recall-oriented complement (summarization eval weights what the
    REFERENCE contains, BLEU what the CANDIDATE asserts). One row per
    n ∈ {1, 2} with the exact integer match/total counts beside each
    ratio, so downstream re-aggregation needs no re-scan.

    Pure-rational surface: every emitted float is one correctly-rounded
    division of exact integers (identical cross-engine, no libm
    anywhere), rounded via the bit-identical floor form; nullif fences
    empty gram totals, coalesce pins F1 of a zero-overlap corpus to 0.

    Scale: identical machine to ``k_eval_bleu`` (shared CTE builder) —
    single tokenize, single explode per side, gram-keyed compact join;
    pair table localCheckpointed on the Spark side.
    """
    import uuid

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    view = f"dss_eval_pairs_{uuid.uuid4().hex[:12]}"
    ck_view = f"{view}_ck"
    # r14: checkpoint, hash-spread by cand_id for the gram machine, bare
    # checkpoint for the lens totals — see k_eval_bleu.
    ck = spark.sql(_eval_pairs_sql(_EVAL_SPARK)).localCheckpoint()
    ck.createOrReplaceTempView(ck_view)
    ck.repartition(
        spark.sparkContext.defaultParallelism, F.col("cand_id")
    ).createOrReplaceTempView(view)
    try:
        return spark.sql(
            _body_rouge(_EVAL_SPARK, f"SELECT * FROM {view}", ck_view)
        )
    finally:
        spark.catalog.dropTempView(view)
        spark.catalog.dropTempView(ck_view)


def _body_distinct_n(d: dict) -> str:
    big = d["BIGRAMS"].format(a="a")
    return f"""
    WITH toks AS (
      SELECT source, {d['TOK']} AS a FROM documents
    ), g0 AS (
      SELECT source,
             {d['EXPLODE']}({d['ARRCAT']}(a, coalesce({big}, {d['EMPTY']})))
               AS gram
      FROM toks
    ), agg AS (
      SELECT source, CASE WHEN gram LIKE '% %' THEN 2 ELSE 1 END AS n,
             count(*) AS total_grams, count(DISTINCT gram) AS distinct_grams
      FROM g0 GROUP BY 1, 2
    )
    SELECT source, CAST(n AS INT) AS ngram_n,
           CAST(total_grams AS BIGINT) AS total_grams,
           CAST(distinct_grams AS BIGINT) AS distinct_grams,
           CAST(floor(distinct_grams * 1000000.0e0 / nullif(total_grams, 0))
                AS BIGINT) AS distinct_ppm
    FROM agg
    """


@register("k_eval_distinct_n", oracle=_body_distinct_n(_EVAL_DUCK))
def k_eval_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1 / distinct-2 diversity (Li 2016) per source: the share
    of n-grams that are unique — THE degeneracy alarm for generated or
    templated text (mode-collapsed generations and boilerplate feeds
    crater distinct-2 long before perplexity moves). Complements
    ``k_text_ttr`` (type-token is per-doc; this is the per-source pool
    where cross-doc repetition shows) and ``k_text_dup_ngram_frac``
    (which asks how much of one doc is corpus-duplicated; this asks how
    varied the source's gram pool is).

    Uni- and bigrams ride ONE explode (bigrams contain a space, so n
    derives from the gram), keeping the token CTE single-referenced —
    no checkpoint needed. distinct_ppm is an exact BIGINT floor: the
    scaled numerator stays under 2^53 so the division is correctly
    rounded identically in both engines.

    Scale: one tokenize+explode pass, one (source, n, gram) distinct
    aggregate — the same Zipf-compact shuffle class as the vocabulary
    keys; output is |sources| x 2 rows.
    """
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_body_distinct_n(_EVAL_SPARK))

# chrF character-n-gram templates (one per engine): all three sizes ride
# ONE explode per side — a char gram's own length() IS its n, the
# character twin of the space-in-gram trick above. Every size is CASE-
# guarded (Spark sequence(n, len) auto-steps DOWN for len < n — the
# standing sequence trap — and n=1 needs the guard too: an empty string
# makes sequence(1, 0) descend).
_EVAL_SPARK["CHRGRAMS"] = (
    "concat("
    "CASE WHEN length({s}) >= 1 THEN transform(sequence(1, length({s})),"
    " i -> substring({s}, i, 1)) ELSE array() END, "
    "CASE WHEN length({s}) >= 2 THEN transform(sequence(2, length({s})),"
    " i -> substring({s}, i - 1, 2)) ELSE array() END, "
    "CASE WHEN length({s}) >= 3 THEN transform(sequence(3, length({s})),"
    " i -> substring({s}, i - 2, 3)) ELSE array() END)"
)
_EVAL_DUCK["CHRGRAMS"] = (
    "list_concat(list_concat("
    "CASE WHEN length({s}) >= 1 THEN list_transform(generate_series(1,"
    " length({s})), i -> substring({s}, i, 1)) ELSE [] END, "
    "CASE WHEN length({s}) >= 2 THEN list_transform(generate_series(2,"
    " length({s})), i -> substring({s}, i - 1, 2)) ELSE [] END), "
    "CASE WHEN length({s}) >= 3 THEN list_transform(generate_series(3,"
    " length({s})), i -> substring({s}, i - 2, 3)) ELSE [] END)"
)


def _chrf_pairs_sql() -> str:
    """(source, cand_id, cs, rs) — the SAME rn-adjacent within-source
    pairing as ``_eval_pairs_sql`` (so chrF is comparable pair-for-pair
    with BLEU/ROUGE), but carrying the whitespace-stripped lowercase
    character string per side (chrF operates on characters with spaces
    removed, Popović 2015 §2). Portable ANSI — ONE text for both
    engines."""
    return """
      SELECT source, doc_id AS cand_id, cs, rs
      FROM (
        SELECT source, doc_id, s AS cs,
               lead(s) OVER (PARTITION BY source ORDER BY doc_id) AS rs,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM (SELECT source, doc_id, replace(lower(text), ' ', '') AS s
              FROM documents) t
      ) p
      WHERE rn % 2 = 1 AND rs IS NOT NULL
    """


def _body_chrf(d: dict, pairs_src: str) -> str:
    gr_c = d["CHRGRAMS"].format(s="cs")
    gr_r = d["CHRGRAMS"].format(s="rs")
    if d is _EVAL_SPARK:
        # r13 codegen form: grams via position explode + plain substr —
        # same (cand_id, gram, is_c) row set as the lambda-array build
        # below (i ranges over gram END positions; n <= i), but the whole
        # stage stays in WholeStageCodegen instead of the interpreted
        # higher-order-lambda evaluator, and no per-doc ~3·len string
        # array is ever materialized (A/B at sf0.1: explode-only 0.43 s
        # lambda vs 0.24 s codegen; DuckDB keeps the lambda text — its
        # list_transform is vectorized native, and the oracle is not the
        # hot path). Empty-string CASE guards the descending-sequence
        # trap (sequence(1, 0) steps DOWN); the n explode is a 3-row
        # inline array filtered to n <= i.
        # r14: the two sides ride ONE scan via a 2-struct side explode
        # instead of UNION ALL — UnionExec reports UnknownPartitioning,
        # which forced a full corpus-sized (cand_id, gram) exchange into
        # pg. Generate/Project preserve the pair spine's hash
        # partitioning on cand_id (set by the caller's repartition before
        # the checkpoint), so pg's aggregation is exchange-free: grams
        # never cross the wire at all.
        ug = """
      SELECT cand_id, substr(sd.s, i - n + 1, n) AS gram, sd.is_c AS is_c
      FROM pairs
      LATERAL VIEW explode(array(named_struct('s', cs, 'is_c', 1),
                                 named_struct('s', rs, 'is_c', 0)))
                   sides AS sd
      LATERAL VIEW explode(CASE WHEN length(sd.s) >= 1
                                THEN sequence(1, length(sd.s))
                                ELSE array() END) pos AS i
      LATERAL VIEW explode(array(1, 2, 3)) ns AS n
      WHERE i >= n"""
    else:
        ug = f"""
      SELECT cand_id, {d['EXPLODE']}({gr_c}) AS gram, 1 AS is_c FROM pairs
      UNION ALL
      SELECT cand_id, {d['EXPLODE']}({gr_r}) AS gram, 0 AS is_c FROM pairs"""
    if d is _EVAL_SPARK:
        # r14: totals derive from pg itself — Σ of a side's per-gram
        # counts over grams of length n IS that side's total n-gram
        # instances (Σ greatest(len - n + 1, 0), exact integer identity),
        # so the second pair-table pass and its 3x cross-join explode
        # disappear. The 3-row spine LEFT JOIN keeps the always-3-rows
        # contract: a size with zero grams emits (n, 0, 0, 0) with NULL
        # ratios exactly as the totals-pass form did (nullif(0) and a
        # missing m row both yield NULL division). DuckDB keeps the
        # totals-pass text — the oracle is not the hot path.
        tail = """
    ), m AS (
      -- a char gram's own length() IS its n
      SELECT length(gram) AS n,
             sum(CASE WHEN c < r THEN c ELSE r END) AS matched,
             sum(c) AS c_g, sum(r) AS r_g
      FROM pg GROUP BY 1
    ), spine AS (SELECT 1 AS n UNION ALL SELECT 2 UNION ALL SELECT 3)
    SELECT CAST(s.n AS INT) AS ngram_n,
           CAST(coalesce(m.matched, 0) AS BIGINT) AS n_matched,
           CAST(coalesce(m.c_g, 0) AS BIGINT) AS cand_grams,
           CAST(coalesce(m.r_g, 0) AS BIGINT) AS ref_grams,
           floor(coalesce(m.matched, 0) * 1.0e0
                 / nullif(coalesce(m.c_g, 0), 0)
                 * 1000000.0e0 + 0.5) / 1000000.0e0 AS chrf_precision,
           floor(coalesce(m.matched, 0) * 1.0e0
                 / nullif(coalesce(m.r_g, 0), 0)
                 * 1000000.0e0 + 0.5) / 1000000.0e0 AS chrf_recall,
           floor(coalesce(
                 5.0e0 * (coalesce(m.matched, 0) * 1.0e0
                          / nullif(coalesce(m.c_g, 0), 0))
                       * (coalesce(m.matched, 0) * 1.0e0
                          / nullif(coalesce(m.r_g, 0), 0))
                 / nullif(4.0e0 * (coalesce(m.matched, 0) * 1.0e0
                                   / nullif(coalesce(m.c_g, 0), 0))
                          + (coalesce(m.matched, 0) * 1.0e0
                             / nullif(coalesce(m.r_g, 0), 0)), 0)
                 , 0.0e0) * 1000000.0e0 + 0.5) / 1000000.0e0 AS chrf2
    FROM spine s LEFT JOIN m ON m.n = s.n
    """
    else:
        tail = """
    ), m AS (
      -- a char gram's own length() IS its n
      SELECT length(gram) AS n,
             sum(CASE WHEN c < r THEN c ELSE r END) AS matched
      FROM pg GROUP BY 1
    ), spine AS (SELECT 1 AS n UNION ALL SELECT 2 UNION ALL SELECT 3),
    tot AS (
      -- totals ride the 3-row spine over the (checkpointed) pair table:
      -- (len - n + 1) grams per side per pair, floored at 0
      SELECT s.n,
             sum(greatest(length(p.cs) - s.n + 1, 0)) AS c_g,
             sum(greatest(length(p.rs) - s.n + 1, 0)) AS r_g
      FROM spine s CROSS JOIN pairs p GROUP BY s.n
    )
    SELECT CAST(t.n AS INT) AS ngram_n,
           CAST(coalesce(m.matched, 0) AS BIGINT) AS n_matched,
           CAST(t.c_g AS BIGINT) AS cand_grams,
           CAST(t.r_g AS BIGINT) AS ref_grams,
           floor(coalesce(m.matched, 0) * 1.0e0 / nullif(t.c_g, 0)
                 * 1000000.0e0 + 0.5) / 1000000.0e0 AS chrf_precision,
           floor(coalesce(m.matched, 0) * 1.0e0 / nullif(t.r_g, 0)
                 * 1000000.0e0 + 0.5) / 1000000.0e0 AS chrf_recall,
           floor(coalesce(
                 5.0e0 * (coalesce(m.matched, 0) * 1.0e0 / nullif(t.c_g, 0))
                       * (coalesce(m.matched, 0) * 1.0e0 / nullif(t.r_g, 0))
                 / nullif(4.0e0 * (coalesce(m.matched, 0) * 1.0e0
                                   / nullif(t.c_g, 0))
                          + (coalesce(m.matched, 0) * 1.0e0
                             / nullif(t.r_g, 0)), 0)
                 , 0.0e0) * 1000000.0e0 + 0.5) / 1000000.0e0 AS chrf2
    FROM tot t LEFT JOIN m ON m.n = t.n
    """
    return f"""
    WITH pairs AS ({pairs_src}),
    -- both sides ride ONE union with a side flag, so the clipped match
    -- min(cand_count, ref_count) per (pair, gram) falls out of a SINGLE
    -- (pair, gram)-keyed aggregation — no per-side count tables and no
    -- re-keyed join (the join design costs ~5 corpus-sized exchanges;
    -- this is 1, and grams are <=3 chars wide on the wire)
    ug AS ({ug}
    ), pg AS (
      SELECT cand_id, gram,
             sum(is_c) AS c, sum(1 - is_c) AS r
      FROM ug GROUP BY 1, 2
    {tail}"""


@register("k_eval_chrf", oracle=_body_chrf(_EVAL_DUCK, _chrf_pairs_sql()))
def k_eval_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus chrF2 (Popović 2015) per character-n-gram size over the
    same deterministic pair spine as ``k_eval_bleu``: clipped char-gram
    precision/recall and the β=2 F-score (recall weighted 2×) — the
    tokenization-free generation eval that tracks human judgment where
    word-level BLEU breaks (morphology, compounding, no-whitespace
    scripts). n ∈ {1,2,3} here vs the tool default 1..6 — the formula
    is unchanged and the explode cost stays ≤3 grams/char; exact
    integer counts ride beside every ratio so a 1..6 re-aggregation
    needs only wider templates.

    Pure-rational surface: matched/total counts are exact BIGINT sums;
    P and R are single correctly-rounded divisions of exact integers
    (identical cross-engine), chrF2 = 5PR/(4P+R) is the same IEEE op
    sequence in both engines — no libm anywhere; floor-form 6dp
    rounds, nullif fences for empty sides, coalesce pins zero-overlap
    F to 0.

    Scale: one string-clean pass to the pair spine (lead(), no
    self-join), ONE explode per side carrying all three sizes (a char
    gram's length() is its n), then ONE side-flagged union whose
    single (pair, gram)-keyed aggregation yields the clipped min
    directly — no per-side count tables, no re-keyed join, exactly one
    corpus-sized exchange carrying <=3-char grams (the join-design
    alternative costs ~5 and measured 4x slower at sf0.1) — and a
    3-row-spine total pass; the Spark side localCheckpoints the
    3-times-referenced pair table (Spark inlines multi-referenced
    CTEs; the ``k_eval_bleu`` pattern).
    """
    import uuid

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    view = f"dss_chrf_pairs_{uuid.uuid4().hex[:12]}"
    # r13: AQE coalesces the tiny post-window spine to ONE partition and
    # localCheckpoint pins that layout — the ~1500x char-gram explode
    # downstream then ran on one core (measured 4.6 s steady; whole key
    # ~1.1 s after spreading). Repartition to the session's parallelism
    # BEFORE the checkpoint: cores-derived, not a local constant — on a
    # cluster this is one spine partition per core, which is the layout
    # the explode stage wants regardless of spine size.
    # r14: HASH-partition by cand_id AFTER the checkpoint instead of the
    # round-robin spread before it. The checkpoint's LogicalRDD reports
    # UnknownPartitioning (verified in plans/r14/), so partitioning must
    # be established above it; the pair-row exchange is cheap (|pairs|
    # rows), Generate/Project preserve its HashPartitioning through the
    # gram explode, and the (cand_id, gram) aggregation then satisfies
    # its ClusteredDistribution with NO exchange (cand_id is a subset of
    # the grouping key). The corpus-sized gram shuffle disappears; only
    # the 3-row total spine moves. (A no-checkpoint variant relying on
    # AQE exchange reuse was A/B'd and lost for BLEU/ROUGE — the spine
    # re-derivation costs more than the checkpoint saves.)
    spark.sql(_chrf_pairs_sql()) \
        .localCheckpoint() \
        .repartition(spark.sparkContext.defaultParallelism, F.col("cand_id")) \
        .createOrReplaceTempView(view)
    try:
        return spark.sql(_body_chrf(_EVAL_SPARK, f"SELECT * FROM {view}"))
    finally:
        spark.catalog.dropTempView(view)
