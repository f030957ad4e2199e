"""WebDataset-style tar shard packaging for multimodal training corpora.

The public WebDataset convention (one ``.tar`` per shard; each sample is a
group of members sharing a key stem — ``<key>.txt``, ``<key>.jpg``,
``<key>.json`` — read sequentially by data loaders) is the de-facto
packaging for image/text training data at 100 TB scale. This module gives
the engine a distributed writer and reader for that layout using only
stdlib ``tarfile``:

- ``write_tar_shards`` — deterministic hash(key) % n_shards assignment,
  one ``applyInPandas`` group per shard, each task builds its tar
  in-memory and writes ``shard-NNNNN.tar``; returns a manifest DataFrame
  (shard path, sample count, byte size, sha256). Tar members are
  key-sorted with zeroed mtime/uid/gid, so a shard's BYTES are a pure
  function of its content — re-running the writer reproduces identical
  checksums, which is what makes manifests diffable across pipeline runs.
- ``read_tar_shards`` — ``spark.read.format("binaryFile")`` over the
  shard files (one file per input split: Spark's binary source gives
  shard-level parallelism for free), then an Arrow-batched
  ``mapInPandas`` unpacks samples to (shard, key, parts map<ext,binary>)
  rows. No shuffle: unpack is partition-local, exactly like the media
  decode seam.

Scale notes (100 TB): shard size is the unit of parallelism AND of
object-store request amortization — the writer's ``n_shards`` should be
chosen so shards land in the 100 MB–1 GB band (the public WebDataset
guidance); the reader inherits one-task-per-shard from binaryFile.
Writing via local paths here maps directly onto a Hadoop-FS path on a
real cluster (the tar bytes are built in memory per shard either way).
Bare-session safe: all worker-side closures are nested functions,
serialized by value (CLAUDE.md invariant 1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    members: dict[str, str],
    n_shards: int,
) -> DataFrame:
    """Pack ``df`` into ``n_shards`` WebDataset-style tar files.

    ``members`` maps member extension -> source column (binary or string
    payloads; strings are UTF-8 encoded). Returns the manifest DataFrame:
    ``shard string, path string, n_samples long, n_bytes long,
    sha256 string`` — one row per non-empty shard, computed by the task
    that wrote the shard (no second read pass).
    """
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    # Idempotent re-invocation: a previous run's shards must not survive
    # a re-run with fewer shards (stale shard-00007.tar would corrupt the
    # read-back), so clear our own outputs first.
    for name in os.listdir(out_dir):
        if name.startswith("shard-") and name.endswith(".tar"):
            os.remove(os.path.join(out_dir, name))

    member_items = sorted(members.items())
    cols = [key_col] + [c for _, c in member_items]
    keyed = (
        df.select(*cols)
        .withColumn("_key", F.col(key_col).cast("string"))
        # crc32 over xxhash: value-stable across Spark versions AND
        # reproducible in plain Python (zlib.crc32) for the oracle side.
        .withColumn("_shard", F.crc32(F.col("_key")) % F.lit(n_shards))
    )

    out_dir_b = out_dir
    exts = [e for e, _ in member_items]
    src_cols = [c for _, c in member_items]

    def pack_shard(pdf):
        import hashlib
        import io
        import tarfile

        import pandas as pd

        shard_id = int(pdf["_shard"].iloc[0])
        buf = io.BytesIO()
        rows = pdf.sort_values("_key")
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in rows.iterrows():
                key = row["_key"]
                for ext, col in zip(exts, src_cols):
                    payload = row[col]
                    if payload is None:
                        continue
                    blob = (
                        payload.encode("utf-8")
                        if isinstance(payload, str)
                        else bytes(payload)
                    )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(blob)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(blob))
                n += 1
        data = buf.getvalue()
        path = os.path.join(out_dir_b, f"shard-{shard_id:05d}.tar")
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            [
                {
                    "shard": f"shard-{shard_id:05d}",
                    "path": path,
                    "n_samples": n,
                    "n_bytes": len(data),
                    "sha256": hashlib.sha256(data).hexdigest(),
                }
            ]
        )

    manifest = keyed.groupBy("_shard").applyInPandas(
        pack_shard,
        schema="shard string, path string, n_samples long, n_bytes long, "
        "sha256 string",
    )
    return manifest


_SAMPLE_SCHEMA = "shard string, key string, parts map<string,binary>"


def _make_unpack():
    """Build the Arrow-batched tar-unpack task (nested fn: cloudpickle
    ships it by value, bare-session safe)."""

    def unpack(batches):
        import io
        import os as _os
        import tarfile

        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = _os.path.splitext(_os.path.basename(path))[0]
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    samples: dict[str, dict[str, bytes]] = {}
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        if not dot:
                            stem, ext = m.name, ""
                        payload = tar.extractfile(m).read()
                        samples.setdefault(stem, {})[ext] = payload
                    for key in sorted(samples):
                        rows.append(
                            {"shard": shard, "key": key, "parts": samples[key]}
                        )
            yield pd.DataFrame(rows)

    return unpack


def read_tar_shards(spark: SparkSession, shard_glob: str) -> DataFrame:
    """Unpack WebDataset-style tar shards into sample rows.

    Returns ``shard string, key string, parts map<string,binary>`` — one
    row per sample key, ``parts`` keyed by member extension. Shard-level
    parallelism comes from the binaryFile source (one task per file);
    unpacking is partition-local with zero shuffle.
    """
    files = spark.read.format("binaryFile").load(shard_glob)
    return files.select("path", "content").mapInPandas(
        _make_unpack(), schema=_SAMPLE_SCHEMA
    )


def stream_tar_shards(
    spark: SparkSession, shard_dir: str, path_glob: str = "shard-*.tar"
) -> DataFrame:
    """Structured-Streaming variant: watch a directory for new shards and
    emit their samples incrementally.

    The binaryFile file-stream source tracks seen files in the
    checkpoint, so each shard's samples are delivered EXACTLY ONCE
    across restarts — the natural continuous-ingestion shape for a
    corpus that lands as shard files (the same unpack kernel as the
    batch reader; one task per newly-arrived file, zero shuffle)."""
    files = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is
        # fixed by the format
        .schema(
            "path string, modificationTime timestamp, length long, "
            "content binary"
        )
        .option("pathGlobFilter", path_glob)
        .load(shard_dir)
    )
    return files.select("path", "content").mapInPandas(
        _make_unpack(), schema=_SAMPLE_SCHEMA
    )


def write_zip_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    members: dict[str, str],
    n_shards: int,
    compress: bool = True,
) -> DataFrame:
    """ZIP variant of ``write_tar_shards`` — same sharding (crc32 of the
    key), same manifest schema, byte-deterministic output (fixed
    1980-01-01 timestamps, sorted member order, fixed deflate level).
    ZIP adds what tar lacks: a central directory, so a reader can list
    and random-access single members without scanning the archive —
    the right container when consumers fetch individual samples.
    """
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):
        if name.startswith("shard-") and name.endswith(".zip"):
            os.remove(os.path.join(out_dir, name))

    member_items = sorted(members.items())
    cols = [key_col] + [c for _, c in member_items]
    keyed = (
        df.select(*cols)
        .withColumn("_key", F.col(key_col).cast("string"))
        .withColumn("_shard", F.crc32(F.col("_key")) % F.lit(n_shards))
    )
    out_dir_b = out_dir
    exts = [e for e, _ in member_items]
    src_cols = [c for _, c in member_items]
    method_deflated = compress

    def pack_shard(pdf):
        import hashlib
        import io
        import zipfile

        import pandas as pd

        shard_id = int(pdf["_shard"].iloc[0])
        buf = io.BytesIO()
        rows = pdf.sort_values("_key")
        method = (
            zipfile.ZIP_DEFLATED if method_deflated else zipfile.ZIP_STORED
        )
        n = 0
        with zipfile.ZipFile(buf, "w", compression=method,
                             compresslevel=6) as zf:
            for _, row in rows.iterrows():
                key = row["_key"]
                for ext, col in zip(exts, src_cols):
                    payload = row[col]
                    if payload is None:
                        continue
                    blob = (
                        payload.encode("utf-8")
                        if isinstance(payload, str)
                        else bytes(payload)
                    )
                    info = zipfile.ZipInfo(
                        f"{key}.{ext}", date_time=(1980, 1, 1, 0, 0, 0)
                    )
                    info.compress_type = method
                    info.external_attr = 0
                    zf.writestr(info, blob, compresslevel=6)
                n += 1
        data = buf.getvalue()
        path = os.path.join(out_dir_b, f"shard-{shard_id:05d}.zip")
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            [
                {
                    "shard": f"shard-{shard_id:05d}",
                    "path": path,
                    "n_samples": n,
                    "n_bytes": len(data),
                    "sha256": hashlib.sha256(data).hexdigest(),
                }
            ]
        )

    return keyed.groupBy("_shard").applyInPandas(
        pack_shard,
        schema="shard string, path string, n_samples long, n_bytes long, "
        "sha256 string",
    )


def read_zip_shards(spark: SparkSession, shard_glob: str) -> DataFrame:
    """Unpack ZIP shards into the same (shard, key, parts) rows as
    ``read_tar_shards`` — one task per file, zero shuffle."""

    def unpack(batches):
        import io
        import os as _os
        import zipfile

        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = _os.path.splitext(_os.path.basename(path))[0]
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    samples: dict[str, dict[str, bytes]] = {}
                    for name in zf.namelist():
                        stem, dot, ext = name.rpartition(".")
                        if not dot:
                            stem, ext = name, ""
                        samples.setdefault(stem, {})[ext] = zf.read(name)
                    for key in sorted(samples):
                        rows.append(
                            {"shard": shard, "key": key,
                             "parts": samples[key]}
                        )
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(shard_glob)
    return files.select("path", "content").mapInPandas(
        unpack, schema=_SAMPLE_SCHEMA
    )
