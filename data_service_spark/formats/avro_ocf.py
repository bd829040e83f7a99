"""Minimal Apache Avro Object Container File codec + Spark Python DataSource.

The sandbox's Spark distribution ships the Avro core jars but NOT the
``spark-avro`` connector (and no Python avro package), so ``format("avro")``
is unavailable. This module implements the public Avro 1.x specification
(binary encoding + Object Container File framing) in pure Python and mounts
it behind Spark 4's Python DataSource V2 API as format ``"pyavro"`` — the
write path is the standard two-phase task-file + driver-commit contract, the
read path decodes one OCF file per input partition executor-side.

Scope: the primitive types a relational roundtrip needs — null, boolean,
int, long, double, string, bytes — plus 2-branch ``["null", T]`` unions for
nullable columns. Codec ``null`` (uncompressed). At 100 TB you would use the
JVM ``spark-avro`` reader (vectorized, predicate-aware); this keeps the
byte-level format honest and the Spark plumbing (schema mapping, per-task
files, commit manifest) production-shaped.

Spec: https://avro.apache.org/docs/current/specification/ (public).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

MAGIC = b"Obj\x01"
SYNC = b"data_service_sp1"  # any 16 bytes are a valid sync marker
assert len(SYNC) == 16

# ---------------------------------------------------------------- binary --


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_value(buf: io.BytesIO, typ, v) -> None:
    if isinstance(typ, list):  # ["null", T] union
        if v is None:
            _write_long(buf, typ.index("null"))
            return
        branch = 1 - typ.index("null")
        _write_long(buf, branch)
        _write_value(buf, typ[branch], v)
        return
    if typ == "null":
        return
    if typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif typ in ("int", "long"):
        _write_long(buf, int(v))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "float":
        buf.write(struct.pack("<f", float(v)))
    elif typ == "string":
        raw = v.encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
    elif typ == "bytes":
        raw = bytes(v)
        _write_long(buf, len(raw))
        buf.write(raw)
    else:
        raise ValueError(f"unsupported avro type: {typ!r}")


def _read_value(buf: io.BytesIO, typ):
    if isinstance(typ, list):
        branch = typ[_read_long(buf)]
        return _read_value(buf, branch)
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _read_long(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if typ == "bytes":
        return buf.read(_read_long(buf))
    raise ValueError(f"unsupported avro type: {typ!r}")


# ------------------------------------------------------------- container --


def write_ocf(path: str, schema: dict, records) -> int:
    """Write records (sequences ordered like schema['fields']) as one OCF."""
    field_types = [f["type"] for f in schema["fields"]]
    body = io.BytesIO()
    n = 0
    for rec in records:
        for typ, v in zip(field_types, rec):
            _write_value(body, typ, v)
        n += 1
    with open(path, "wb") as f:
        head = io.BytesIO()
        head.write(MAGIC)
        _write_long(head, 2)  # metadata map: one block, two entries
        for k, v in (
            ("avro.schema", json.dumps(schema).encode()),
            ("avro.codec", b"null"),
        ):
            _write_value(head, "string", k)
            _write_value(head, "bytes", v)
        _write_long(head, 0)  # map terminator
        head.write(SYNC)
        f.write(head.getvalue())
        if n:
            blk = io.BytesIO()
            _write_long(blk, n)
            _write_long(blk, len(body.getvalue()))
            f.write(blk.getvalue())
            f.write(body.getvalue())
            f.write(SYNC)
    return n


def read_ocf_schema(path: str) -> dict:
    with open(path, "rb") as f:
        return _read_header(io.BytesIO(f.read()))[0]


def _read_header(buf: io.BytesIO):
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:
            # Spec: a negative block count means abs(count) entries preceded
            # by a long giving the block's size in bytes — consume the size
            # so files from other writers parse.
            _read_long(buf)
            count = -count
        for _ in range(count):
            k = _read_value(buf, "string")
            meta[k] = _read_value(buf, "bytes")
    sync = buf.read(16)
    return json.loads(meta["avro.schema"]), meta, sync


def read_ocf(path: str):
    """Yield records (tuples, schema field order) from one OCF file."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    schema, meta, sync = _read_header(buf)
    if meta.get("avro.codec", b"null") not in (b"null", b""):
        raise ValueError("only codec=null is supported")
    field_types = [fld["type"] for fld in schema["fields"]]
    while buf.tell() < len(buf.getbuffer()):
        n = _read_long(buf)
        if n < 0:
            # OCF data-block counts are non-negative per spec; a negative
            # here means an encoding we don't implement — say so instead of
            # surfacing a sync-marker mismatch downstream.
            raise ValueError(f"unsupported OCF block count {n} in {path}")
        _read_long(buf)  # block byte size (unused: codec null)
        for _ in range(n):
            yield tuple(_read_value(buf, t) for t in field_types)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")


# ------------------------------------------------------- schema mapping --

_SPARK_TO_AVRO = {
    "integer": "int",
    "long": "long",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}
_AVRO_TO_DDL = {
    "int": "INT",
    "long": "BIGINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "STRING",
    "boolean": "BOOLEAN",
    "bytes": "BINARY",
}


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        t = _SPARK_TO_AVRO.get(f.dataType.typeName())
        if t is None:
            raise ValueError(f"unsupported spark type: {f.dataType}")
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_schema_to_ddl(schema: dict) -> str:
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = next(x for x in t if x != "null")
        cols.append(f"{f['name']} {_AVRO_TO_DDL[t]}")
    return ", ".join(cols)


# --------------------------------------------------------- spark source --


def register_avro_source(spark) -> None:
    """Register format 'pyavro' (read + write) on this session."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    @dataclass
    class AvroCommit(WriterCommitMessage):
        file: str
        n: int

    class AvroWriter(DataSourceWriter):
        def __init__(self, options, schema, overwrite):
            self.path = options["path"]
            self.avro_schema = spark_schema_to_avro(schema)
            self.overwrite = overwrite

        def write(self, rows):
            os.makedirs(self.path, exist_ok=True)
            fn = os.path.join(
                self.path, f"part-{uuid.uuid4().hex}.avro"
            )
            n = write_ocf(fn, self.avro_schema, (tuple(r) for r in rows))
            return AvroCommit(fn, n)

        def commit(self, messages):
            new = {os.path.basename(m.file) for m in messages}
            if self.overwrite:
                # Honor mode('overwrite'): tasks write uniquely-named files,
                # so the single driver-side commit removes any stale .avro
                # parts a previous write left behind — otherwise a re-read
                # (and the manifest row count) would mix old and new data.
                for f in os.listdir(self.path):
                    if f.endswith(".avro") and f not in new:
                        os.remove(os.path.join(self.path, f))
            manifest = {
                "files": sorted(new),
                "rows": sum(m.n for m in messages),
            }
            with open(os.path.join(self.path, "_manifest.json"), "w") as f:
                json.dump(manifest, f)

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.file):
                    os.remove(m.file)

    class AvroFilePartition(InputPartition):
        def __init__(self, path):
            self.path = path

    class AvroReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]

        def _files(self):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".avro")
            )

        def partitions(self):
            return [AvroFilePartition(f) for f in self._files()]

        def read(self, partition):
            yield from read_ocf(partition.path)

    class AvroSource(DataSource):
        @classmethod
        def name(cls):
            return "pyavro"

        def schema(self):
            path = self.options["path"]
            files = sorted(
                f for f in os.listdir(path) if f.endswith(".avro")
            )
            if not files:
                raise ValueError(f"no .avro files under {path}")
            return avro_schema_to_ddl(
                read_ocf_schema(os.path.join(path, files[0]))
            )

        def reader(self, schema):
            return AvroReader(self.options)

        def writer(self, schema, overwrite: bool):
            return AvroWriter(self.options, schema, overwrite)

    spark.dataSource.register(AvroSource)
