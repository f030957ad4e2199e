"""CBO statistics wiring (SURVEY §4; VERDICT-r4 'missing' item 5).

Catalyst's cost-based optimizer (join reordering, better broadcast
decisions on Q5-shape star joins) only engages when catalog tables carry
``ANALYZE TABLE`` statistics. The fixture loader reads bare parquet paths
— no catalog entry, no stats — so this module provides the missing rung:
register each fixture parquet as an external catalog table and compute
table + column statistics for it.

At 100 TB this is the standard nightly step after ingest: stats are
metadata-sized (per-column NDV/min/max/null counts via HLL, no data
rewrite), and `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`
then let the optimizer order an N-way star join by estimated cardinality
instead of syntax order. AQE still covers the runtime residual (its
post-shuffle re-planning is independent of CBO).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from python_kinesis_streaming_spark.sources.tables import (
    TABLE_NAMES,
    ensure_runtime_confs,
    sf_tag,
)

#: Session confs that make Catalyst consume the computed stats.
CBO_CONFS: dict[str, str] = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.statistics.histogram.enabled": "true",
}


def register_catalog_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register fixture parquet files as external catalog tables.

    Returns the catalog table names (``pkss_<sf_tag>_<table>`` — unique per
    fixture root so two SF dirs can coexist in one catalog). Idempotent:
    CREATE TABLE IF NOT EXISTS against the same LOCATION.

    Runtime confs are normalized first (UTC session tz + the
    ``legacy.parquet.nanosAsLong`` knob) so ANALYZE/SELECT over
    nanosecond-timestamp fixtures works on a bare session. Caveat: catalog
    tables expose the RAW parquet types — TIMESTAMP_NTZ columns are NOT
    cast to TIMESTAMP the way ``load_table`` does — so ops must keep going
    through ``load_table`` for data access and use these catalog entries
    only as CBO stats carriers (CLAUDE.md invariant 1).
    """
    import os

    ensure_runtime_confs(spark)
    tag = sf_tag(sf_dir)
    out: list[str] = []
    for t in names or TABLE_NAMES:
        cat_name = f"pkss_{tag}_{t}"
        path = os.path.join(os.path.abspath(sf_dir), f"{t}.parquet")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {cat_name} USING parquet "
            f"LOCATION '{path}'"
        )
        out.append(cat_name)
    return out


def analyze_tables(
    spark: SparkSession,
    table_names: list[str],
    columns: dict[str, list[str]] | None = None,
) -> None:
    """Run ANALYZE TABLE ... COMPUTE STATISTICS (+ column stats).

    ``columns`` maps catalog table name -> column subset; default is ALL
    COLUMNS (fine for the narrow fixture schema; at 100 TB restrict to
    join/filter keys to bound the NDV-sketch pass).
    """
    for t in table_names:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        cols = (columns or {}).get(t)
        target = f"COLUMNS {', '.join(cols)}" if cols else "ALL COLUMNS"
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR {target}")


def enable_cbo(spark: SparkSession) -> None:
    for k, v in CBO_CONFS.items():
        spark.conf.set(k, v)


def table_stats(spark: SparkSession, table_name: str) -> dict[str, str]:
    """Read back the stats the catalog holds for ``table_name``
    (DESCRIBE EXTENDED 'Statistics' row → e.g. '123456 bytes, 6005 rows')."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    return {
        r.col_name: r.data_type
        for r in rows
        if r.col_name in ("Statistics", "Location", "Provider")
    }
