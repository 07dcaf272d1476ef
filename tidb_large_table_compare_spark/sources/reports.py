"""summary.txt text-report parser — operators A4, A14-A20 (SURVEY.md §2.A).

The reference aggregates its final report by re-parsing every per-table
``summary.txt`` produced by the comparison tool:

- A14 recursive glob scan (``find $OUT -name summary.txt``, ``step3:157``)
- A15 run timestamp from the parent dir name ``{schema}_{table}_{ts}``
  (``awk -F'_' '{print $NF}'``, ``step3:158-165``)
- A4  skip ``mysql:``-prefixed client-noise lines (``step1:143-145`` — an
  artifact of merged stderr, reproduced here for parser parity)
- A17 equivalence-marker flag via line containment (``step3:204-209``)
- A18 first backticked data row, excluding ``+`` borders and the header
  (``step3:212``)
- A19 split on ``|``, take fields 2/3/4, trim (``step3:215-218``)
- A20 guarded numeric casts — unparseable counts become NULL and drop out
  of downstream sums (``step3:223-226``)

Everything is DataFrame-native: ``spark.read.text`` + ``input_file_name`` +
string/window functions. No driver-side file iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.plans.report import EQUIVALENT_MARKER


def read_summary_lines(spark: SparkSession, glob: str) -> DataFrame:
    """A14: scan all summary files under a glob, tagged with their path."""
    return spark.read.text(glob).select(
        F.input_file_name().alias("path"), F.col("value").alias("line")
    )


def parse_summaries(spark: SparkSession, glob: str) -> DataFrame:
    """Full A14-A20 pipeline: text reports → structured summaries DataFrame
    ``(run_ts, table, structure_ok, upcount, downcount)`` (FIXTURES.md §6).
    """
    lines = read_summary_lines(spark, glob)
    # A4: drop client-warning noise merged into the text stream.
    lines = lines.filter(~F.col("line").startswith("mysql:"))
    # A15: run_ts from the parent directory name '{schema}_{table}_{YYYYMMDD_HHMMSS}'.
    parent = F.element_at(F.split(F.col("path"), "/"), -2)
    run_ts = F.regexp_extract(parent, r"(\d{8}_\d{6})$", 1)
    lines = lines.withColumn("run_ts", run_ts)

    # A17: per-file marker flag (grouped max of a containment predicate).
    flags = lines.groupBy("path", "run_ts").agg(
        F.max(F.col("line").contains(EQUIVALENT_MARKER)).alias("equivalent_marker")
    )

    # A18: the first backticked data row, excluding borders and the header.
    data_rows = (
        lines.filter(
            F.col("line").contains("`")
            & ~F.col("line").startswith("+")
            & ~F.col("line").contains("TABLE")
        )
        # materialize the read order before aggregating: non-deterministic
        # expressions are not allowed inside aggregate arguments
        .withColumn("__line_no", F.monotonically_increasing_id())
        .groupBy("path")
        .agg(F.min_by("line", F.col("__line_no")).alias("line"))
    )
    # A19/A20: fields 2/3/4 of the '|'-delimited row, trimmed, guarded casts.
    # try_element_at, not element_at: under ANSI mode (the Spark 4 default)
    # element_at RAISES past the array end, so one backticked prose line
    # with no '|' delimiters would kill the whole aggregation instead of
    # degrading to the NULL counts the try_cast contract promises.
    split = F.split(F.col("line"), r"\|")
    parsed = data_rows.select(
        "path",
        F.trim(F.try_element_at(split, F.lit(2))).alias("table"),
        F.trim(F.try_element_at(split, F.lit(3))).try_cast("long").alias("upcount"),
        F.trim(F.try_element_at(split, F.lit(4))).try_cast("long").alias("downcount"),
    )

    # LEFT join from the per-file flags: a report whose run died before
    # printing any backticked data row still has a verdict worth reporting —
    # an inner join would silently drop the file, the opposite of the A20
    # "unparseable fields become NULL" degradation.
    return flags.join(parsed, "path", "left").select(
        "run_ts",
        "table",
        F.col("equivalent_marker").alias("structure_ok"),
        "upcount",
        "downcount",
    )
