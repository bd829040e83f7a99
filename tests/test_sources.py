"""Connector / format tests: Avro OCF codec + pyavro DataSource, the
Hive-metastore cross-process persistence proof, and the kafka-shaped
file-twin wrapper."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_avro_codec_binary_roundtrip(tmp_path):
    """Pure-codec check: every supported primitive + null-union survives a
    write/read cycle byte-exactly, including negative zigzag longs and
    non-ASCII strings."""
    from data_service_spark.formats.avro_ocf import (
        read_ocf,
        read_ocf_schema,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": "double"},
            {"name": "d", "type": "boolean"},
            {"name": "e", "type": ["null", "bytes"]},
        ],
    }
    recs = [
        (1, "x", 1.5, True, b"\x00\xff"),
        (-3, None, -0.25, False, None),
        (2**40, "Ωé", 3.0, True, b""),
        (-(2**40) - 1, "", float("inf"), False, b"z"),
    ]
    p = str(tmp_path / "t.avro")
    assert write_ocf(p, schema, recs) == len(recs)
    assert list(read_ocf(p)) == recs
    assert read_ocf_schema(p) == schema


def test_pyavro_datasource_roundtrip(spark, sf_dir):
    """region → pyavro sink (per-task OCF files + commit manifest) →
    pyavro source (schema from OCF header, one partition per file) matches
    the original row-for-row."""
    import json

    from data_service_spark.formats.avro_ocf import register_avro_source
    from data_service_spark.io import load

    register_avro_source(spark)
    path = str("/tmp/dss_test_avro_rt")
    shutil.rmtree(path, ignore_errors=True)
    region = load(spark, sf_dir, "region")
    region.write.format("pyavro").mode("overwrite").option(
        "path", path
    ).save()
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["rows"] == region.count()
    back = spark.read.format("pyavro").option("path", path).load()
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in region.collect()
    }


def test_pyavro_overwrite_removes_stale_parts(spark, sf_dir):
    """mode('overwrite') to a non-empty path must replace, not append:
    stale part-*.avro files from a previous write are removed at commit so
    a re-read and the manifest row count see only the new data."""
    import json

    from data_service_spark.formats.avro_ocf import register_avro_source
    from data_service_spark.io import load

    register_avro_source(spark)
    path = "/tmp/dss_test_avro_ow"
    shutil.rmtree(path, ignore_errors=True)
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation.write.format("pyavro").mode("overwrite").option("path", path).save()
    first = set(os.listdir(path))
    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    region.write.format("pyavro").mode("overwrite").option("path", path).save()
    assert not (set(os.listdir(path)) & first - {"_manifest.json"})
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["rows"] == region.count()
    back = spark.read.format("pyavro").option("path", path).load()
    assert back.count() == region.count()


def test_avro_negative_block_count_and_empty_dir(tmp_path):
    """Spec's negative map-block counts (abs(count) entries + a byte-size
    long) parse in the header; an empty directory raises a descriptive
    error instead of IndexError; a negative data-block count reports an
    unsupported encoding instead of a sync mismatch."""
    import io as _io

    from data_service_spark.formats.avro_ocf import (
        MAGIC,
        _read_header,
        _write_long,
        write_ocf,
    )

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    p = str(tmp_path / "neg.avro")
    write_ocf(p, schema, [(1,), (2,)])
    raw = open(p, "rb").read()
    # Rebuild the header map with the negative-count form and confirm the
    # parse matches the positive-count original.
    pos = _io.BytesIO(raw)
    schema_pos, meta, sync = _read_header(pos)
    body = _io.BytesIO()
    body.write(MAGIC)
    _write_long(body, -len(meta))
    entries = _io.BytesIO()
    for k, v in meta.items():
        kb = k.encode()
        _write_long(entries, len(kb))
        entries.write(kb)
        _write_long(entries, len(v))
        entries.write(v)
    _write_long(body, len(entries.getvalue()))
    body.write(entries.getvalue())
    _write_long(body, 0)
    body.write(sync)
    body.seek(0)
    schema_neg, meta_neg, sync_neg = _read_header(body)
    assert (schema_neg, meta_neg, sync_neg) == (schema_pos, meta, sync)


def test_pyavro_empty_dir_schema_error(spark, tmp_path):
    from data_service_spark.formats.avro_ocf import register_avro_source

    register_avro_source(spark)
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(Exception, match="no .avro files"):
        spark.read.format("pyavro").option("path", empty).load()


def test_hive_metastore_persists_across_processes(spark, sf_dir, tmp_path):
    """Phase 1 is ``a_sink_hive_table``'s own child-JVM roundtrip
    (saveAsTable + ANALYZE into a Derby metastore under the operator's
    scratch dir — session-memoized, so a suite run shares the one child
    bring-up with the registry-wide audit instead of paying a second
    ~25 s JVM here); phase 2 is a FRESH process that only does
    spark.table against that SAME metastore — it can succeed only if
    Derby persisted the catalog entry and its stats across processes
    (--read-only re-asserts DESCRIBE EXTENDED Statistics)."""
    from data_service_spark.queries.scans import _tmpdir
    from data_service_spark.registry import QUERIES

    QUERIES["a_sink_hive_table"](spark, sf_dir).count()  # phase 1 (memoized)
    base_dir = _tmpdir("hive_roundtrip")
    wh = os.path.join(base_dir, "warehouse")
    ms = os.path.join(base_dir, "metastore_db")
    h2 = str(tmp_path / "h2")
    src = os.path.join(sf_dir, "region.parquet")
    subprocess.run(
        [sys.executable, "-m", "data_service_spark.hive_roundtrip",
         wh, ms, src, h2, "--read-only"],
        check=True, cwd=REPO, timeout=300, capture_output=True)
    import pyarrow.parquet as pq

    t1 = pq.read_table(os.path.join(base_dir, "handoff")).to_pandas() \
        .sort_values("r_regionkey")
    t2 = pq.read_table(h2).to_pandas().sort_values("r_regionkey")
    assert t1.reset_index(drop=True).equals(t2.reset_index(drop=True))
    assert len(t1) == pq.read_table(src).num_rows


def test_kafka_shaped_wrapper_contract(spark, sf_dir):
    """The file twin honors the format("kafka") contract: exact column
    set/types, one Spark partition per source partition, offsets dense and
    monotone from 0 within each partition, JSON-decodable binary values."""
    import json

    from data_service_spark.sources import register_kafka_shaped_source

    register_kafka_shaped_source(spark)
    raw = (
        spark.read.format("kafka_shaped")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("topic", "t_events")
        .load()
    )
    assert [(f.name, f.dataType.simpleString()) for f in raw.schema.fields] == [
        ("key", "binary"), ("value", "binary"), ("topic", "string"),
        ("partition", "int"), ("offset", "bigint"),
        ("timestamp", "timestamp"), ("timestampType", "int"),
    ]
    rows = raw.collect()
    assert rows and all(r.topic == "t_events" for r in rows)
    by_part = {}
    for r in rows:
        by_part.setdefault(r.partition, []).append(r.offset)
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))
    payload = json.loads(bytes(rows[0].value).decode())
    assert {"event_id", "event_type", "user_id", "ts_us"} <= set(payload)


def test_fresh_tables_gc_ring(spark):
    """io.fresh_tables: uuid-suffixed per-invocation names, and batches
    older than the keep-window are dropped from the catalog (no warehouse
    leak) while the newest batches stay live for in-flight consumers."""
    from data_service_spark.io import _TABLE_GC, _TABLE_GC_KEEP, fresh_tables

    _TABLE_GC.pop("gc_probe", None)
    created = []
    for _ in range(_TABLE_GC_KEEP + 2):
        (tbl,) = fresh_tables(spark, "gc_probe", "dss_gc_probe")
        spark.sql(f"CREATE TABLE {tbl} USING parquet AS SELECT 1 AS x")
        created.append(tbl)
    assert len(set(created)) == len(created)  # never a name collision
    live = {t.name for t in spark.catalog.listTables()
            if t.name.startswith("dss_gc_probe")}
    assert live == set(created[-_TABLE_GC_KEEP:])
    # cleanup
    for t in live:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    _TABLE_GC.pop("gc_probe", None)


def test_fresh_tables_orphan_sweep_and_exit_drop(spark, tmp_path):
    """The cross-process leak controls around fresh_tables: (1) the
    age-gated orphan sweep removes ONLY hour-old uuid-pattern dirs that
    are not in the catalog — fresh dirs, non-matching names, and live
    tables survive; (2) the atexit hook drops every ring-resident table
    so a cleanly-exiting process strands nothing."""
    import os
    import time

    from data_service_spark import io as dio

    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    old = os.path.join(wh, "dss_orphan_probe_abcdef012345")
    young = os.path.join(wh, "dss_orphan_probe_fedcba543210")
    unmatched = os.path.join(wh, "keepme_not_a_uuid_table")
    for d in (old, young, unmatched):
        os.makedirs(d, exist_ok=True)
    hour_ago = time.time() - dio._ORPHAN_MIN_AGE_S - 60
    os.utime(old, (hour_ago, hour_ago))
    dio._sweep_orphan_tables(spark)
    assert not os.path.exists(old), "hour-old orphan must be swept"
    assert os.path.exists(young), "young dir may be a live concurrent table"
    assert os.path.exists(unmatched), "non-uuid names are never touched"

    dio._TABLE_GC.pop("exit_probe", None)
    (tbl,) = dio.fresh_tables(spark, "exit_probe", "dss_exit_probe")
    spark.sql(f"CREATE TABLE {tbl} USING parquet AS SELECT 1 AS x")
    assert spark.catalog.tableExists(tbl)
    dio._drop_gc_tables_at_exit()
    assert not spark.catalog.tableExists(tbl)
    assert not os.path.exists(os.path.join(wh, tbl))

    # cleanup
    for d in (young, unmatched):
        os.rmdir(d)
    dio._TABLE_GC.pop("exit_probe", None)


def test_kafka_shaped_exact_serialization(spark, tmp_path):
    """The vectorized reader's payloads stay EXACT on the edges the r08
    review called out: null ints emit JSON null (never 7.0 / whole-struct
    null-out via float64), null timestamps emit null (never the int64 NaT
    sentinel), and doubles round-trip at full 17-digit precision (to_json
    would cap at 15)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_service_spark.sources import register_kafka_shaped_source

    src = str(tmp_path / "edge.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, None, 3], pa.int64()),
                "event_type": pa.array(["a", None, "c\n\"x"], pa.string()),
                "user_id": pa.array([7, 8, None], pa.int64()),
                "value": pa.array(
                    [0.30000000000000004, float("nan"), 1e-17], pa.float64()
                ),
                "ts": pa.array(
                    [1_700_000_000_000_000, None, 1_700_000_000_000_001],
                    pa.timestamp("us"),
                ),
            }
        ),
        src,
    )
    register_kafka_shaped_source(spark)
    rows = (
        spark.read.format("kafka_shaped")
        .option("path", src)
        .option("topic", "edge")
        .load()
        .collect()
    )
    payloads = [json.loads(bytes(r.value).decode()) for r in rows]
    by_uid = {p["user_id"]: p for p in payloads}
    assert by_uid[7]["event_id"] == 1 and isinstance(by_uid[7]["event_id"], int)
    assert by_uid[8]["event_id"] is None          # null int -> null
    assert by_uid[8]["ts_us"] is None             # null ts -> null, no NaT
    assert by_uid[None]["user_id"] is None
    assert by_uid[7]["value"] == 0.30000000000000004  # 17-digit roundtrip
    assert by_uid[None]["value"] == 1e-17
    nanv = by_uid[8]["value"]
    assert nanv != nanv  # NaN serialized as the JSON-extension token
    assert by_uid[None]["event_type"] == 'c\n"x'  # escaping intact
    # null user_id -> literal "None" key (the legacy per-row behavior)
    keys = {bytes(r.key).decode() for r in rows}
    assert keys == {"7", "8", "None"}


def test_kafka_shaped_key_escaping_and_ns_truncation(spark, tmp_path):
    """r08 ADVICE closures: (1) JSON object KEYS are escaped via json.dumps
    (a column named with a quote/backslash/non-ASCII char must produce
    valid JSON, like the legacy sort_keys serializer); (2) a timestamp[ns]
    source column truncates to µs (legacy to_pylist behavior) instead of
    raising ArrowInvalid on sub-µs values."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_service_spark.sources import register_kafka_shaped_source

    src = str(tmp_path / "edge_keys.parquet")
    pq.write_table(
        pa.table(
            {
                'we"ird\\né': pa.array([1, 2], pa.int64()),
                "user_id": pa.array([7, 8], pa.int64()),
                # 1_500 ns past an exact second: sub-µs → must truncate
                "ts": pa.array(
                    [1_700_000_000_000_000_500, 1_700_000_000_000_001_500],
                    pa.timestamp("ns"),
                ),
            }
        ),
        src,
    )
    register_kafka_shaped_source(spark)
    rows = (
        spark.read.format("kafka_shaped")
        .option("path", src)
        .option("topic", "edge_keys")
        .load()
        .collect()
    )
    payloads = [json.loads(bytes(r.value).decode()) for r in rows]
    by_uid = {p["user_id"]: p for p in payloads}
    assert by_uid[7]['we"ird\\né'] == 1
    assert by_uid[8]['we"ird\\né'] == 2
    # ns → µs truncation, not ArrowInvalid and not rounding
    assert by_uid[7]["ts_us"] == 1_700_000_000_000_000
    assert by_uid[8]["ts_us"] == 1_700_000_000_000_001


def test_kafka_shaped_us_rename_collision_raises(spark, tmp_path):
    """A source column literally named '<ts>_us' alongside timestamp column
    '<ts>' must fail loudly instead of silently clobbering one of the two
    payload fields (r08 ADVICE #4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from data_service_spark.sources import register_kafka_shaped_source

    src = str(tmp_path / "collide.parquet")
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
                "ts_us": pa.array([42], pa.int64()),
                "user_id": pa.array([1], pa.int64()),
            }
        ),
        src,
    )
    register_kafka_shaped_source(spark)
    with pytest.raises(Exception, match="collision"):
        (
            spark.read.format("kafka_shaped")
            .option("path", src)
            .option("topic", "collide")
            .load()
            .collect()
        )
    # negative: a 'ts_us' column that is ITSELF a timestamp renames to
    # 'ts_us_us' and must NOT trip the guard (reviewed r09: the first
    # guard draft over-fired on this legal schema)
    src_ok = str(tmp_path / "no_collide.parquet")
    pq.write_table(
        pa.table(
            {
                "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
                "ts_us": pa.array(
                    [1_600_000_000_000_000], pa.timestamp("us")
                ),
                "user_id": pa.array([1], pa.int64()),
            }
        ),
        src_ok,
    )
    import json

    rows = (
        spark.read.format("kafka_shaped")
        .option("path", src_ok)
        .option("topic", "no_collide")
        .load()
        .collect()
    )
    payload = json.loads(bytes(rows[0].value).decode())
    assert payload["ts_us"] == 1_700_000_000_000_000
    assert payload["ts_us_us"] == 1_600_000_000_000_000


def test_kafka_shaped_payload_roundtrip_property(spark, tmp_path):
    """Property (Hypothesis): for ARBITRARY small tables — ints, doubles,
    unicode strings and timestamps, each with NULLs — every value in the
    kafka_shaped JSON payload round-trips EXACTLY to the parquet source
    (the r08 serializer rewrite's contract: Arrow int→string casts, repr
    doubles, JSON-extension non-finite tokens, escaped strings, µs
    timestamps). Each example is a real write+scan, so the budget is
    small."""
    import json
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_service_spark.sources import register_kafka_shaped_source

    register_kafka_shaped_source(spark)
    counter = {"n": 0}

    text = st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=20,
        ),
    )
    ints = st.one_of(
        st.none(), st.integers(-(2**62), 2**62)
    )
    floats = st.one_of(
        st.none(),
        st.floats(allow_nan=True, allow_infinity=True, width=64),
    )
    ts_us = st.one_of(
        st.none(),
        st.integers(-(2**52), 2**52),  # µs, well inside arrow's range
    )
    rows = st.lists(
        st.tuples(ints, text, floats, ts_us), min_size=1, max_size=8
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=rows)
    def check(data):
        counter["n"] += 1
        src = str(tmp_path / f"prop_{counter['n']}.parquet")
        uid, txt, val, ts = (list(c) for c in zip(*data))
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(uid, pa.int64()),
                    "props": pa.array(txt, pa.string()),
                    "value": pa.array(val, pa.float64()),
                    "ts": pa.array(ts, pa.timestamp("us")),
                }
            ),
            src,
        )
        got = (
            spark.read.format("kafka_shaped")
            .option("path", src)
            .option("topic", "prop")
            .option("sliceRows", "3")
            .load()
            .collect()
        )
        assert len(got) == len(data)
        def tup(u, t, v, s):
            # NaN compares unequal to itself; normalize for pairing
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            return (u, t, v, s)

        payloads = sorted(
            (
                tup(d["user_id"], d["props"], d["value"], d["ts_us"])
                for d in (json.loads(bytes(r.value).decode()) for r in got)
            ),
            key=repr,
        )
        want = sorted((tup(*row) for row in data), key=repr)
        # exact equality, incl. 17-digit doubles, ±inf, unicode, NULLs
        assert payloads == want

    check()
