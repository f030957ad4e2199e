"""Streaming semantics tests (SURVEY §5.3) — for the ops whose driver check
is rows-only (late-data dropping, output-mode contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_kinesis_streaming_spark.registry import all_queries
from python_kinesis_streaming_spark.sources.tables import load_table

Q = all_queries()


def test_watermark_drops_late_rows(spark, sf_dir):
    """The late-variant replay withholds old rows until after the watermark
    has advanced past them; the append-mode result must (a) never exceed the
    batch count for any window and (b) be missing rows overall."""
    streamed = Q["stream_watermark_late"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = ev.groupBy(
        F.date_trunc("hour", "ts").alias("w_start"), "event_type"
    ).agg(F.count("*").alias("n_batch"))

    j = streamed.join(batch, ["w_start", "event_type"], "left")
    over = j.where(F.col("n") > F.col("n_batch")).count()
    assert over == 0, "streamed window count exceeded batch count"

    total_streamed = streamed.agg(F.sum("n")).collect()[0][0]
    total_batch = ev.count()
    assert total_streamed < total_batch, (
        "late rows were not dropped (or final windows leaked): "
        f"streamed={total_streamed} batch={total_batch}"
    )
    assert total_streamed > 0, "append mode emitted nothing"


def test_output_mode_contracts(spark, sf_dir):
    """complete == full result; append ⊆ complete (finalized windows only);
    update ≥ complete rows (changelog re-emits updated windows)."""
    rows = {r.output_mode: r for r in Q["stream_output_modes"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    n_final = (
        ev.groupBy(F.date_trunc("hour", "ts"), "event_type").count().count()
    )
    assert rows["complete"].rows_emitted == n_final
    assert rows["append"].rows_emitted <= n_final
    assert rows["append"].rows_emitted > 0
    assert rows["update"].rows_emitted >= n_final


def test_replay_is_really_chunked(spark, sf_dir):
    """The replay source must produce multiple micro-batches (one per chunk),
    not one big batch — otherwise nothing streaming-specific is tested."""
    import os

    from python_kinesis_streaming_spark.streaming.replay import ensure_chunks

    d = ensure_chunks(spark, sf_dir, "plain", 4)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 4
    # chunks partition the table exactly
    n = spark.read.parquet(d).count()
    assert n == load_table(spark, sf_dir, "events").count()
