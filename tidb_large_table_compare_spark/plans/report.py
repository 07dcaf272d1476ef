"""Report aggregation — operators A16-A25 (SURVEY.md §2.A).

Input: a ``summaries`` DataFrame of per-table, per-run results
``(run_ts, table, structure_ok, upcount, downcount)`` — the structured analog
of the parsed ``summary.txt`` fields (``step3_run_syncdiff.sh:204-229``).

The pipeline reproduces the reference's final report exactly:
- keep only rows from the latest run timestamp (A16, ``step3:169-172``)
- guarded casts: non-numeric counts drop out of sums (A20, ``step3:223-226``)
- structure-ok vs structure-diff tallies (A21, ``step3:206-209``)
- TOTAL_UPCOUNT / TOTAL_DOWNCOUNT sums (A22, ``step3:224-227``)
- scaled "N M 行" volume formatting (A23, ``step3:241``)
- fixed-width rendered table (A24, ``step3:190-234``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import window as W

EQUIVALENT_MARKER = (
    "The table structure and data in following tables are equivalent"
)  # step3_run_syncdiff.sh:204

REPORT_BORDER = "+-------------------+-----------+---------+-----------+"
REPORT_HEADER = "| TABLE             | STRUCTURE | UPCOUNT | DOWNCOUNT |"
REPORT_ROW_FMT = "| %-17s | %-9s | %7d | %9d |"


def latest_run(summaries: DataFrame) -> DataFrame:
    """A16: rows whose run_ts equals the global max run_ts.

    The window has no partition key on purpose — it reduces to a scalar max
    broadcast by Spark, mirroring ``sort -r | head -1`` then filter.
    """
    w = W.Window.partitionBy()
    return summaries.withColumn("__max_ts", F.max("run_ts").over(w)).filter(
        F.col("run_ts") == F.col("__max_ts")
    ).drop("__max_ts")


def report_totals(summaries: DataFrame) -> DataFrame:
    """A20-A23: one-row totals over the latest run."""
    latest = latest_run(summaries)
    up = F.col("upcount").cast("string").try_cast("long")
    down = F.col("downcount").cast("string").try_cast("long")
    return latest.agg(
        F.count(F.lit(1)).alias("tables_checked"),
        F.sum(F.when(F.col("structure_ok"), 1).otherwise(0)).alias("structure_ok_cnt"),
        F.sum(F.when(F.col("structure_ok"), 0).otherwise(1)).alias("structure_diff_cnt"),
        F.coalesce(F.sum(up), F.lit(0)).alias("total_upcount"),
        F.coalesce(F.sum(down), F.lit(0)).alias("total_downcount"),
    ).withColumn(
        "volume_label",
        F.format_string(
            "%dM", F.floor((F.col("total_upcount") + F.col("total_downcount")) / 1_000_000)
        ),
    )


def render_report(summaries: DataFrame) -> DataFrame:
    """A24/A25: fixed-width ASCII table lines, one row per table, sorted.

    Returns a single-column ``line`` DataFrame (text-sink ready) shaped like
    the reference's final report (``step3_run_syncdiff.sh:190-234``).
    """
    latest = latest_run(summaries)
    border = REPORT_BORDER
    header = REPORT_HEADER
    body = latest.select(
        F.format_string(
            REPORT_ROW_FMT,
            F.col("table"),
            F.when(F.col("structure_ok"), F.lit("OK")).otherwise(F.lit("DIFF")),
            F.col("upcount"),
            F.col("downcount"),
        ).alias("line"),
        # explicit ordering key: union does not preserve row order, and a
        # rendered report is meaningless if its lines can interleave
        F.concat(F.lit("1_"), F.col("table")).alias("__ord"),
    )
    spark = summaries.sparkSession
    frame = spark.createDataFrame(
        [(border, "0_0"), (header, "0_1"), (border, "0_2")], "line string, __ord string"
    )
    tail = spark.createDataFrame([(border, "2_0")], "line string, __ord string")
    return frame.unionByName(body).unionByName(tail).orderBy("__ord").select("line")
