"""Schema evolution (sources/table_schema.py): add/drop without rewrites.

The contract under test: defaults back-fill exactly the rows written
before the column existed; later mutations (DELETE rewrite, MERGE,
zorder) must MATERIALIZE pending fills, never lose them; time travel
restores dropped columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_kinesis_streaming_spark.sources.lakehouse import (
    cluster_zorder,
    delete_where,
    merge_upsert,
    read_table,
)
from python_kinesis_streaming_spark.sources.lakehouse import (
    checkpoint as lh_checkpoint,
)
from python_kinesis_streaming_spark.sources.snapshots import (
    current_version,
    read_snapshot,
    write_snapshot,
)
from python_kinesis_streaming_spark.sources.table_schema import (
    add_column,
    conform,
    drop_column,
    set_schema,
    table_schema,
)
from python_kinesis_streaming_spark.sources.txn import append_batch


def _rows(spark, t, *cols):
    df = read_table(spark, t)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_add_column_default_fills_only_old_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 3).selectExpr("id", "id * 10 as v"), t)
    add_column(t, "lang", "string", default="en")
    # new rows carry explicit values INCLUDING a genuine NULL
    append_batch(
        spark.createDataFrame(
            [(100, 1000, "fr"), (101, 1010, None)], "id bigint, v bigint, lang string"
        ),
        t,
        "app",
        0,
    )
    got = _rows(spark, t, "id", "lang")
    assert got == [
        (0, "en"),
        (1, "en"),
        (2, "en"),
        (100, "fr"),
        (101, None),  # a real NULL written after evolution STAYS NULL
    ]


def test_add_column_without_default_reads_null(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 2), t)
    add_column(t, "score", "double")
    assert _rows(spark, t, "id", "score") == [(0, None), (1, None)]
    # no defaults => read_snapshot stays usable and schema-projected
    assert read_snapshot(spark, t).columns == ["id", "score"]


def test_drop_column_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 2).selectExpr("id", "id + 5 as v"), t)
    v_before = current_version(t)
    drop_column(t, "v")
    assert read_table(spark, t).columns == ["id"]
    # time travel to the pre-drop version restores the column
    assert read_table(spark, t, v_before).columns == ["id", "v"]
    assert _rows(spark, t, "id") == [(0,), (1,)]


def test_add_and_drop_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 2), t)
    add_column(t, "x", "int")
    with pytest.raises(ValueError):
        add_column(t, "x", "int")
    with pytest.raises(ValueError):
        drop_column(t, "nope")
    with pytest.raises(ValueError):
        add_column(t, "y", "not_a_type")


def test_conform_fills_casts_and_rejects(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 1).selectExpr("id", "'a' as s"), t)
    add_column(t, "n", "bigint", default=7)
    out = conform(spark.createDataFrame([(5, "b")], "id int, s string"), t)
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint",  # cast int -> recorded bigint
        "s:string",
        "n:bigint",  # filled from default
    ]
    assert out.collect()[0]["n"] == 7
    with pytest.raises(ValueError):
        conform(
            spark.createDataFrame([(1, "x", 2.0)], "id int, s string, zz double"),
            t,
        )


def test_read_snapshot_refuses_pending_defaults(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 2), t)
    add_column(t, "lang", "string", default="en")
    with pytest.raises(ValueError, match="read_table"):
        read_snapshot(spark, t)


def test_delete_rewrite_materializes_fills(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10).repartition(1), t)
    add_column(t, "lang", "string", default="en")
    # predicate on the evolved column must see the fill
    delete_where(spark, t, "lang = 'en' AND id >= 8", mode="rewrite")
    got = _rows(spark, t, "id", "lang")
    assert got == [(i, "en") for i in range(8)]
    # and the rewritten file physically carries the value now: drop the
    # default by re-recording the schema, the data must survive
    struct, _ = table_schema(t)
    set_schema(t, struct)
    assert _rows(spark, t, "id", "lang") == [(i, "en") for i in range(8)]


def test_dv_delete_then_default_fill_compose(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 10).repartition(1), t)
    delete_where(spark, t, "id < 2", mode="dv")
    add_column(t, "lang", "string", default="en")
    got = _rows(spark, t, "id", "lang")
    assert got == [(i, "en") for i in range(2, 10)]


def test_merge_on_evolved_table(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 6).selectExpr("id", "id * 10 as v").repartition(2), t
    )
    add_column(t, "lang", "string", default="en")
    # source omits the evolved column entirely: conform fills it
    src = spark.createDataFrame(
        [(2, 999), (100, 1000)], "id bigint, v bigint"
    )
    merge_upsert(spark, t, src, ["id"])
    got = dict(
        (r["id"], (r["v"], r["lang"]))
        for r in read_table(spark, t).collect()
    )
    assert got[2] == (999, "en")
    assert got[100] == (1000, "en")
    assert got[0] == (0, "en")
    assert len(got) == 7


def test_zorder_materializes_fills(spark, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 100).selectExpr("id", "id % 7 as k"), t)
    add_column(t, "w", "bigint", default=3)
    cluster_zorder(spark, t, ["id", "k"], target_files=2)
    df = read_table(spark, t)
    assert df.where(F.col("w") != 3).count() == 0
    assert df.count() == 100


def test_schema_survives_log_checkpoint(spark, tmp_path):
    import os

    t = str(tmp_path / "t")
    write_snapshot(spark.range(0, 4), t)
    add_column(t, "lang", "string", default="en")
    v = lh_checkpoint(t)
    for old in range(v):
        os.remove(os.path.join(t, "_log", f"{old:08d}.json"))
    assert _rows(spark, t, "id", "lang") == [(i, "en") for i in range(4)]
    struct, defaults = table_schema(t)
    assert struct.fieldNames() == ["id", "lang"]
    assert defaults["lang"]["value"] == "en"
