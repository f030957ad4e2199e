"""Apache Avro Object Container File codec, stdlib-only, from the public
Avro 1.11 specification.

Avro is the dominant schema'd record format on streaming buses — Kinesis
and Kafka payloads are routinely Avro, and data-lake hand-offs ship as
``.avro`` container files. Spark's own avro support lives in an external
jar this container cannot install, so the engine implements the format
itself and bridges it through the same scan seam as every other binary
source:

- Binary encoding (spec ``binary_encoding``): zigzag varints for
  int/long, little-endian IEEE float/double, length-prefixed
  bytes/string, block-encoded arrays and maps (negative block counts
  with byte sizes are accepted on read), union branch indices, enum
  ordinals, fixed.
- Object Container Files (spec ``object_container_files``): ``Obj\\x01``
  magic, file-metadata map carrying ``avro.schema`` + ``avro.codec``,
  16-byte sync marker, data blocks of (record count, byte length,
  payload, sync). Codecs: ``null`` and ``deflate`` (raw zlib, the two
  codecs the spec requires/recommends without external libraries).
- Schema ↔ Spark type mapping: records→struct, array→array, map→map,
  nullable unions→nullable field, enum/string→string, fixed/bytes→
  binary, int/long/float/double/boolean as themselves, logical types
  timestamp-micros→timestamp and date→date.

``read_avro`` peeks one file header driver-side to learn the writer
schema (a metadata-sized read, the same thing ``spark.read`` does for
parquet footers), then unpacks all files partition-locally via
``binaryFile`` + ``mapInPandas`` — one task per file, zero shuffle.
``write_avro`` derives the Avro schema from the DataFrame schema and has
each task write one container file per partition, returning a manifest
(path, record count, sha256) like the tar-shard writer.

Tests (tests/test_avro_codec.py) pin the varint/zigzag encoding and a
whole minimal container file against HAND-DERIVED spec bytes — not just
self-roundtrip — plus deflate blocks, nullable/nested/logical types, and
the Spark seam end-to-end.

Scale notes (100 TB): container files are splittable at block boundaries
in principle, but one-task-per-file parallelism (the binaryFile model)
matches how streaming dumps are laid out — many files of bounded size;
the writer's file-per-partition layout produces exactly that shape.
Bare-session safe: worker closures are nested functions (CLAUDE.md
invariant 1).
"""

from __future__ import annotations

import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"
SYNC_SIZE = 16


# --------------------------------------------------------------------------
# Primitive binary encoding (Avro spec: zigzag varint et al).
# --------------------------------------------------------------------------


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(out: bytearray, n: int) -> None:
    u = zigzag_encode(n)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(u), pos
        shift += 7


def write_bytes(out: bytearray, b: bytes) -> None:
    write_long(out, len(b))
    out += b


def read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = read_long(buf, pos)
    return buf[pos : pos + n], pos + n


# --------------------------------------------------------------------------
# Schema-driven datum encode/decode. Schemas are the parsed-JSON forms the
# spec defines (strings for primitives, dicts for named/complex types,
# lists for unions).
# --------------------------------------------------------------------------


def _is_nullable_union(schema) -> bool:
    return (
        isinstance(schema, list)
        and len(schema) == 2
        and "null" in schema
    )


def _union_value_branch(schema: list):
    return schema[0] if schema[1] == "null" else schema[1]


def write_datum(out: bytearray, schema, value) -> None:
    if isinstance(schema, list):  # union
        if value is None:
            if "null" not in schema:
                raise ValueError("avro: null for non-nullable union")
            write_long(out, schema.index("null"))
            return
        branch = _union_value_branch(schema) if _is_nullable_union(schema) else None
        if branch is None:
            raise ValueError("avro: only 2-branch nullable unions supported on write")
        write_long(out, schema.index(branch))
        write_datum(out, branch, value)
        return
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return
    if stype == "boolean":
        out.append(1 if value else 0)
    elif stype in ("int", "long"):
        write_long(out, int(value))
    elif stype == "float":
        out += struct.pack("<f", float(value))
    elif stype == "double":
        out += struct.pack("<d", float(value))
    elif stype == "bytes":
        write_bytes(out, bytes(value))
    elif stype == "string":
        write_bytes(out, str(value).encode("utf-8"))
    elif stype == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        out += b
    elif stype == "enum":
        out_idx = schema["symbols"].index(value)
        write_long(out, out_idx)
    elif stype == "record":
        for field in schema["fields"]:
            write_datum(out, field["type"], value[field["name"]])
    elif stype == "array":
        items = list(value)
        if items:
            write_long(out, len(items))
            for item in items:
                write_datum(out, schema["items"], item)
        write_long(out, 0)
    elif stype == "map":
        entries = dict(value)
        if entries:
            write_long(out, len(entries))
            for k in sorted(entries):  # sorted: byte-deterministic output
                write_bytes(out, str(k).encode("utf-8"))
                write_datum(out, schema["values"], entries[k])
        write_long(out, 0)
    else:
        raise ValueError(f"avro: unsupported schema type {stype!r}")


def read_datum(buf: bytes, pos: int, schema):
    if isinstance(schema, list):  # union
        idx, pos = read_long(buf, pos)
        return read_datum(buf, pos, schema[idx])
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return None, pos
    if stype == "boolean":
        return buf[pos] != 0, pos + 1
    if stype in ("int", "long"):
        return read_long(buf, pos)
    if stype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if stype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if stype == "bytes":
        return read_bytes(buf, pos)
    if stype == "string":
        b, pos = read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if stype == "fixed":
        n = schema["size"]
        return buf[pos : pos + n], pos + n
    if stype == "enum":
        idx, pos = read_long(buf, pos)
        return schema["symbols"][idx], pos
    if stype == "record":
        rec = {}
        for field in schema["fields"]:
            rec[field["name"]], pos = read_datum(buf, pos, field["type"])
        return rec, pos
    if stype == "array":
        items = []
        while True:
            count, pos = read_long(buf, pos)
            if count == 0:
                break
            if count < 0:  # spec: negative count precedes a byte size
                _, pos = read_long(buf, pos)
                count = -count
            for _ in range(count):
                item, pos = read_datum(buf, pos, schema["items"])
                items.append(item)
        return items, pos
    if stype == "map":
        entries = {}
        while True:
            count, pos = read_long(buf, pos)
            if count == 0:
                break
            if count < 0:
                _, pos = read_long(buf, pos)
                count = -count
            for _ in range(count):
                kb, pos = read_bytes(buf, pos)
                entries[kb.decode("utf-8")], pos = read_datum(
                    buf, pos, schema["values"]
                )
        return entries, pos
    raise ValueError(f"avro: unsupported schema type {stype!r}")


# --------------------------------------------------------------------------
# Object Container Files.
# --------------------------------------------------------------------------


def write_container(
    records,
    schema,
    codec: str = "null",
    sync: bytes | None = None,
    block_records: int = 1000,
) -> bytes:
    """Records (dicts per the schema) -> ``.avro`` container file bytes.

    ``sync`` may be pinned for byte-deterministic output (defaults to a
    content hash of the schema — deterministic, not random, by design)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    if sync is None:
        import hashlib

        sync = hashlib.md5(schema_json.encode()).digest()
    if len(sync) != SYNC_SIZE:
        raise ValueError("avro: sync marker must be 16 bytes")
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    write_long(out, len(meta))
    for k in sorted(meta):
        write_bytes(out, k.encode())
        write_bytes(out, meta[k])
    write_long(out, 0)
    out += sync

    block: list = []

    def flush(block):
        if not block:
            return
        body = bytearray()
        for rec in block:
            write_datum(body, schema, rec)
        payload = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        write_long(out, len(block))
        write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)

    for rec in records:
        block.append(rec)
        if len(block) >= block_records:
            flush(block)
            block = []
    flush(block)
    return bytes(out)


def read_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Container bytes -> (schema, codec, sync marker, first-block offset)."""
    if data[:4] != MAGIC:
        raise ValueError("avro: bad container magic")
    pos = 4
    meta = {}
    while True:
        count, pos = read_long(data, pos)
        if count == 0:
            break
        if count < 0:
            _, pos = read_long(data, pos)
            count = -count
        for _ in range(count):
            kb, pos = read_bytes(data, pos)
            vb, pos = read_bytes(data, pos)
            meta[kb.decode("utf-8")] = vb
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("ascii")
    sync = data[pos : pos + SYNC_SIZE]
    return schema, codec, sync, pos + SYNC_SIZE


def read_container(data: bytes):
    """Container file bytes -> yields record dicts."""
    schema, codec, sync, pos = read_header(data)
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    n = len(data)
    while pos < n:
        count, pos = read_long(data, pos)
        size, pos = read_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if data[pos : pos + SYNC_SIZE] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += SYNC_SIZE
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        rp = 0
        for _ in range(count):
            rec, rp = read_datum(payload, rp, schema)
            yield rec


# --------------------------------------------------------------------------
# Avro schema <-> Spark schema mapping.
# --------------------------------------------------------------------------


def avro_to_spark_type(schema) -> str:
    if isinstance(schema, list):
        return avro_to_spark_type(_union_value_branch(schema))
    stype = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(schema, dict):
        logical = schema.get("logicalType")
        if logical == "timestamp-micros":
            return "timestamp"
        if logical == "date":
            return "date"
    mapping = {
        "boolean": "boolean",
        "int": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "string": "string",
        "bytes": "binary",
        "fixed": "binary",
        "enum": "string",
        "null": "void",
    }
    if stype in mapping:
        return mapping[stype]
    if stype == "record":
        fields = ", ".join(
            f"{f['name']}: {avro_to_spark_type(f['type'])}"
            for f in schema["fields"]
        )
        return f"struct<{fields}>"
    if stype == "array":
        return f"array<{avro_to_spark_type(schema['items'])}>"
    if stype == "map":
        return f"map<string,{avro_to_spark_type(schema['values'])}>"
    raise ValueError(f"avro: unsupported schema type {stype!r}")


def spark_to_avro_schema(spark_schema, name: str = "row") -> dict:
    """Spark StructType -> Avro record schema (all fields nullable)."""
    from pyspark.sql import types as T

    def convert(dt, path):
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": path,  # path-derived: schema bytes stay deterministic
                "fields": [
                    {
                        "name": f.name,
                        "type": ["null", convert(f.dataType, f"{path}_{f.name}")],
                    }
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {
                "type": "array",
                "items": ["null", convert(dt.elementType, f"{path}_item")],
            }
        if isinstance(dt, T.MapType):
            return {
                "type": "map",
                "values": ["null", convert(dt.valueType, f"{path}_value")],
            }
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        simple = {
            T.BooleanType: "boolean",
            T.IntegerType: "int",
            T.ShortType: "int",
            T.ByteType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.StringType: "string",
            T.BinaryType: "bytes",
        }
        for cls, avro_name in simple.items():
            if isinstance(dt, cls):
                return avro_name
        raise ValueError(f"avro: unsupported Spark type {dt}")

    return convert(spark_schema, name)


# --------------------------------------------------------------------------
# Spark bridges.
# --------------------------------------------------------------------------


def _logical_fixups(schema):
    """Collect field -> logicalType for top-level record fields."""
    fixups = {}
    for f in schema.get("fields", []):
        ft = f["type"]
        if isinstance(ft, list):
            ft = _union_value_branch(ft)
        if isinstance(ft, dict) and ft.get("logicalType") in (
            "timestamp-micros",
            "date",
        ):
            fixups[f["name"]] = ft["logicalType"]
    return fixups


# Spec schema-resolution promotions (writer type -> allowed reader types).
_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


def _base_type(schema):
    if isinstance(schema, list):
        schema = _union_value_branch(schema)
    return schema["type"] if isinstance(schema, dict) else schema


def _promote(value, wt: str, rt: str):
    if value is None or wt == rt:
        return value
    if rt == "long" and wt == "int":
        return int(value)
    if rt in ("float", "double"):
        return float(value)
    if rt == "bytes" and wt == "string":
        return value.encode("utf-8")
    if rt == "string" and wt == "bytes":
        return bytes(value).decode("utf-8")
    return value


def resolve_record(rec: dict, writer_schema: dict, reader_schema: dict) -> dict:
    """Adapt one decoded record to the reader schema (spec 'Schema
    Resolution'): reader-only fields take their declared default,
    writer-only fields are dropped, matching fields apply the numeric /
    string-bytes promotions. Complex-typed fields must match exactly
    (top-level resolution is what mixed-generation dumps need)."""
    wtypes = {f["name"]: f["type"] for f in writer_schema["fields"]}
    out = {}
    for f in reader_schema["fields"]:
        name = f["name"]
        if name in wtypes:
            wt, rt = _base_type(wtypes[name]), _base_type(f["type"])
            if wt != rt and rt not in _PROMOTIONS.get(wt, ()):
                raise ValueError(
                    f"avro: cannot resolve field {name!r}: {wt} -> {rt}"
                )
            out[name] = _promote(rec.get(name), wt, rt)
        elif "default" in f:
            out[name] = f["default"]
        else:
            raise ValueError(
                f"avro: reader field {name!r} absent from writer schema "
                "and has no default"
            )
    return out


def read_avro(
    spark: SparkSession, avro_glob: str, reader_schema: dict | None = None
) -> DataFrame:
    """Avro container files -> DataFrame.

    Without ``reader_schema``, the writer schema is taken from the
    lexicographically first matching file's header (one driver-side
    metadata read) and files whose schema disagrees fail their task with
    a clear error. With ``reader_schema``, each file is decoded under its
    OWN writer schema and resolved to the reader schema per the spec's
    evolution rules — mixed-generation dumps read as one table."""
    import glob as _glob

    paths = sorted(_glob.glob(avro_glob))
    if not paths:
        raise ValueError(f"avro: no files match {avro_glob}")
    with open(paths[0], "rb") as f:
        head = f.read(1 << 20)
    if reader_schema is None:
        schema, _, _, _ = read_header(head)
    else:
        schema = reader_schema
    if (schema.get("type") if isinstance(schema, dict) else None) != "record":
        raise ValueError("avro: top-level schema must be a record")
    spark_schema = avro_to_spark_type(schema)[len("struct<") : -1]
    fixups = _logical_fixups(schema)
    schema_json = json.dumps(schema, sort_keys=True)
    resolving = reader_schema is not None

    import python_kinesis_streaming_spark.sources.avro_codec as _self
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_self)
    parse_container = _self.read_container
    parse_header = _self.read_header
    resolve = _self.resolve_record

    files = spark.read.format("binaryFile").load(avro_glob)

    def unpack(batches):
        import datetime

        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for content in pdf["content"]:
                data = bytes(content)
                fschema, _, _, _ = parse_header(data)
                same = json.dumps(fschema, sort_keys=True) == schema_json
                if not same and not resolving:
                    raise ValueError("avro: file schema differs from the first file")
                for rec in parse_container(data):
                    if resolving and not same:
                        rec = resolve(rec, fschema, schema)
                    for col, logical in fixups.items():
                        v = rec.get(col)
                        if v is None:
                            continue
                        if logical == "timestamp-micros":
                            rec[col] = datetime.datetime.fromtimestamp(
                                v / 1e6, tz=datetime.timezone.utc
                            ).replace(tzinfo=None)
                        else:  # date
                            rec[col] = datetime.date(1970, 1, 1) + datetime.timedelta(
                                days=v
                            )
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f["name"] for f in schema["fields"]]
            )

    return files.select("content").mapInPandas(unpack, schema=spark_schema)


def write_avro(
    df: DataFrame, out_dir: str, codec: str = "deflate", name: str = "row"
) -> DataFrame:
    """DataFrame -> one ``.avro`` container file per partition.

    Returns a manifest DataFrame (path, n_records, sha256). Idempotent:
    clears previous ``part-*.avro`` outputs first."""
    os.makedirs(out_dir, exist_ok=True)
    for fname in os.listdir(out_dir):
        if fname.startswith("part-") and fname.endswith(".avro"):
            os.remove(os.path.join(out_dir, fname))

    avro_schema = spark_to_avro_schema(df.schema, name=name)
    field_logical = _logical_fixups(avro_schema)
    out_dir_b = out_dir

    import python_kinesis_streaming_spark.sources.avro_codec as _self
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_self)
    build_container = _self.write_container

    def pack(batches):
        import datetime
        import hashlib

        import pandas as pd
        from pyspark import TaskContext

        import numpy as np

        def scrub(v):
            # pandas/numpy containers and sentinels -> plain Python values
            if isinstance(v, np.ndarray):
                return [scrub(x) for x in v.tolist()]
            if isinstance(v, list):
                return [scrub(x) for x in v]
            if isinstance(v, dict):
                return {k: scrub(x) for k, x in v.items()}
            if isinstance(v, np.generic):
                v = v.item()
            if isinstance(v, float) and v != v:
                return None  # pandas collapses null/NaN; map both to Avro null
            if v is not None and not isinstance(
                v, (bool, int, float, str, bytes, bytearray, list, dict)
            ):
                if pd.isna(v):
                    return None
            return v

        pid = TaskContext.get().partitionId()
        records = []
        for pdf in batches:
            for row in pdf.to_dict("records"):
                for col, logical in field_logical.items():
                    v = row.get(col)
                    if v is None or pd.isna(v):
                        row[col] = None
                    elif logical == "timestamp-micros":
                        row[col] = int(pd.Timestamp(v).value // 1000)
                    else:  # date
                        d = v.date() if hasattr(v, "date") else v
                        row[col] = (d - datetime.date(1970, 1, 1)).days
                for k, v in list(row.items()):
                    row[k] = scrub(v)
                records.append(row)
        if not records:
            yield pd.DataFrame(
                [], columns=["path", "n_records", "sha256"]
            ).astype({"n_records": "int64"})
            return
        data = build_container(records, avro_schema, codec=codec)
        path = os.path.join(out_dir_b, f"part-{pid:05d}.avro")
        with open(path, "wb") as f:
            f.write(data)
        yield pd.DataFrame(
            [
                {
                    "path": path,
                    "n_records": len(records),
                    "sha256": hashlib.sha256(data).hexdigest(),
                }
            ]
        )

    return df.mapInPandas(pack, schema="path string, n_records long, sha256 string")
