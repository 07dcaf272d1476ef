"""Incremental comparison via persisted bucket digests.

The reference re-runs the full comparison every time (``run_all.sh`` →
serial sync-diff per table). At 1e9+ rows the nightly reality is that most
chunks did not change — so persist the per-bucket digests of a verified
snapshot, and on the next run compare *digests* first: only buckets whose
(count, xor, sum) triple drifted need the expensive cross-side work. This
is the CDC-shaped complement of :mod:`.compare`:

- ``write_digests``: one narrow aggregation of the table → a tiny parquet
  artifact (O(n_buckets) rows, ~40 bytes each — ~8 MB for 1e9 rows at the
  reference's 5000-row chunks);
- ``changed_buckets``: recompute current digests (one linear scan, zero
  joins against the other side) and anti-diff them against the stored ones;
- ``incremental_compare``: a full row-level :class:`TableCompare` scoped to
  the changed buckets only — the drill-down never touches clean chunks.

The digest artifact pins ``n_buckets`` (bucket ids are only comparable at
the same bucketing), and the scoped compare re-checks that pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_large_table_compare_spark.operators.compare import (
    CompareOptions,
    TableCompare,
    compare_tables,
)

__all__ = [
    "write_digests",
    "read_digests",
    "changed_buckets",
    "incremental_compare",
    "apply_changes_to_digests",
]

# Every artifact carries a tiny `_n_buckets` sidecar (hidden from Spark's
# parquet scans by the underscore prefix) so the pinned bucket count
# survives an EMPTY digest set — a change feed that deletes every remaining
# row (truncate-and-reload) legitimately drives all bucket counts to 0, and
# a zero-row parquet loses the in-data pin (read_digests' first() returns
# None). A union'd sentinel row was measured at ~0.3 s per CDC fold (it
# reshapes the write job); the sidecar costs one metadata-sized FS write.
# Written AFTER the parquet (a crash between leaves an artifact whose
# in-data pin still works unless it is also empty — then read_digests
# raises a named error); read through the Hadoop FS API so remote
# filesystems work like the artifacts themselves.
_PIN_SIDECAR = "_n_buckets"


def _pin_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{_PIN_SIDECAR}")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _write_pin(spark: SparkSession, path: str, n_buckets: int) -> None:
    fs, jpath = _pin_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(str(int(n_buckets)).encode()))
    finally:
        out.close()


def _read_pin(spark: SparkSession, path: str) -> int | None:
    fs, jpath = _pin_path(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        data = stream.read()
        buf = []
        while data != -1:
            buf.append(data)
            data = stream.read()
        return int(bytes(buf).decode())
    finally:
        stream.close()


def write_digests(
    spark: SparkSession,
    df: DataFrame,
    pk: list[str],
    path: str,
    options: CompareOptions = CompareOptions(),
) -> int:
    """Persist the per-bucket digest of ``df`` to ``path``; returns the
    pinned bucket count. Columns: (__bucket, cnt, xor_digest, sum_digest,
    n_buckets), plus the pin-preserving ``_n_buckets`` sidecar."""
    cmp = TableCompare(spark, df, df, pk, options)
    n_buckets = cmp._n_buckets()
    (
        cmp.bucket_digests("left")
        .withColumn("n_buckets", F.lit(n_buckets))
        .write.mode("overwrite")
        .parquet(path)
    )
    _write_pin(spark, path, n_buckets)
    return n_buckets


def read_digests(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """Load a digest artifact; returns (digests, pinned n_buckets)."""
    df = spark.read.parquet(path)
    row = df.select("n_buckets").first()
    if row is not None:
        n_buckets = row["n_buckets"]
    else:
        # empty digest set (a feed deleted every remaining row): the pin
        # survives in the sidecar
        n_buckets = _read_pin(spark, path)
        if n_buckets is None:
            raise ValueError(
                f"digest artifact at {path} is empty and has no "
                f"{_PIN_SIDECAR} sidecar — the n_buckets pin is "
                f"unrecoverable; re-snapshot with write_digests"
            )
    return df.drop("n_buckets"), n_buckets


def changed_buckets(
    spark: SparkSession,
    digests_path: str,
    current: DataFrame,
    pk: list[str],
    options: CompareOptions = CompareOptions(),
) -> DataFrame:
    """Bucket ids whose digests drifted since the stored snapshot.

    One linear scan of ``current`` (map-side combine → O(n_buckets) shuffle)
    plus a join against the tiny stored artifact. New and vanished buckets
    both count as changed (full-outer semantics).
    """
    stored, n_buckets = read_digests(spark, digests_path)
    opts = CompareOptions(**{**options.__dict__, "n_buckets": n_buckets})
    cur = TableCompare(spark, current, current, pk, opts).bucket_digests("left")
    l = stored.withColumnsRenamed(
        {"cnt": "l_cnt", "xor_digest": "l_xor", "sum_digest": "l_sum"}
    )
    r = cur.withColumnsRenamed(
        {"cnt": "r_cnt", "xor_digest": "r_xor", "sum_digest": "r_sum"}
    )
    joined = l.join(r, "__bucket", "full_outer")
    drifted = (
        ~F.col("l_cnt").eqNullSafe(F.col("r_cnt"))
        | ~F.col("l_xor").eqNullSafe(F.col("r_xor"))
        | ~F.col("l_sum").eqNullSafe(F.col("r_sum"))
    )
    return joined.filter(drifted).select("__bucket")


def incremental_compare(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    pk: list[str],
    digests_path: str,
    options: CompareOptions = CompareOptions(),
    table_name: str = "table",
) -> TableCompare:
    """Row-level compare scoped to buckets that drifted since the snapshot.

    Sound when the snapshot was taken from a verified-equivalent state of
    ``left``: clean buckets digest-match the snapshot on both sides, so
    every differing row lives in a drifted bucket. The returned compare
    pins the snapshot's bucket count so bucket ids line up.
    """
    _, n_buckets = read_digests(spark, digests_path)
    changed = changed_buckets(spark, digests_path, right, pk, options)
    opts = CompareOptions(**{**options.__dict__, "n_buckets": n_buckets})
    cmp = compare_tables(spark, left, right, pk, opts, table_name)
    from tidb_large_table_compare_spark.functions.hashing import bucket_id, in_list

    # Bounded driver collect (mirrors TableCompare.diff_rows): small drift
    # becomes an IN-list evaluated at the scan; wide drift — millions of
    # bucket ids at 100× scale — switches to a broadcast semi-join per side,
    # which avoids embedding a multi-MB IN-list literal in the plan (the
    # broadcast build still stages the bucket set through the driver, but as
    # compact exchange payload, not as a plan-tree literal Catalyst must
    # re-analyze).
    cap = TableCompare._MAX_INLIST
    skip_above = TableCompare._RESTRICT_SKIP_FRACTION * n_buckets
    # persist BEFORE the first action: the changed-bucket frame sits above
    # the full digest aggregation of `right`, and the branches below take
    # up to two actions over it — unpersisted, each action re-ran that
    # whole linear scan (the count() in the frame branch literally doubled
    # the digest pass). count() first materializes every partition, so the
    # later collect is a pure cache read.
    changed = changed.persist()
    n_changed = changed.count()
    # scope cmp.left/right (post-range_sql) rather than the raw inputs so a
    # configured range predicate stays in force
    if n_changed == 0:
        cmp.left = cmp.left.limit(0)
        cmp.right = cmp.right.limit(0)
        changed.unpersist()
    elif n_changed > skip_above:
        # most buckets drifted since the snapshot: the scope would keep
        # most rows while every job re-pays the predicate — run the plain
        # full compare (same skip rule as TableCompare._bad_bucket_state)
        changed.unpersist()
    elif n_changed <= cap:
        # in_list, not Column.isin — same per-element py4j cost note as
        # TableCompare._restrict_to_bad_buckets (hashing.in_list); the
        # predicate needs a named column, so stage the bucket id
        ids = [r["__bucket"] for r in changed.collect()]
        changed.unpersist()
        # per-side bucket columns: the sides may carry different integral
        # widths and bucket_id widens by the given frame's schema
        cmp.left = (
            cmp.left.withColumn("__bucket", bucket_id(pk, n_buckets, cmp.left))
            .filter(in_list("__bucket", ids))
            .drop("__bucket")
        )
        cmp.right = (
            cmp.right.withColumn("__bucket", bucket_id(pk, n_buckets, cmp.right))
            .filter(in_list("__bucket", ids))
            .drop("__bucket")
        )
    else:
        # deliberate session-lifetime cache, same contract as the compare
        # drill-down's bucket set: embedded in the returned lazy plan and
        # bounded by the bucket cap (one long per changed bucket)
        cmp.left = (
            cmp.left.withColumn("__bucket", bucket_id(pk, n_buckets, cmp.left))
            .join(F.broadcast(changed), "__bucket", "left_semi")
            .drop("__bucket")
        )
        cmp.right = (
            cmp.right.withColumn("__bucket", bucket_id(pk, n_buckets, cmp.right))
            .join(F.broadcast(changed), "__bucket", "left_semi")
            .drop("__bucket")
        )
    return cmp


def apply_changes_to_digests(
    spark: SparkSession,
    digests_path: str,
    out_path: str,
    pk: list[str],
    inserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    options: CompareOptions = CompareOptions(),
) -> int:
    """Maintain a digest snapshot from a change feed — no master rescan.

    The per-bucket digest triple is an abelian group: ``cnt``/``sum_digest``
    add, ``xor_digest`` is its own inverse. So a CDC batch folds in exactly:
    inserted rows add their digests, deleted rows subtract (xor again, count
    down), and an update is delete-old + insert-new. Cost is one narrow
    aggregation over the *change batch* plus a join against the tiny stored
    artifact — O(changes + n_buckets), independent of table size. This is
    the continuous-verification shape at 100 TB: the nightly full scan
    becomes a per-batch fold, and :func:`changed_buckets` /
    :func:`incremental_compare` consume the maintained snapshot unchanged.

    Writes the updated artifact to ``out_path`` (a fresh path — parquet
    cannot be overwritten while being read) and returns the pinned bucket
    count. Buckets whose count reaches zero are dropped, matching what a
    fresh :func:`write_digests` of the changed table would produce.
    """
    stored, n_buckets = read_digests(spark, digests_path)
    opts = CompareOptions(**{**options.__dict__, "n_buckets": n_buckets})

    def _delta(df: DataFrame, sign: int) -> DataFrame:
        d = TableCompare(spark, df, df, pk, opts).bucket_digests("left")
        return d.select(
            "__bucket",
            (F.col("cnt") * sign).alias("d_cnt"),
            F.col("xor_digest").alias("d_xor"),  # xor is its own inverse
            (F.col("sum_digest") * sign).alias("d_sum"),
        )

    parts = []
    if inserts is not None:
        parts.append(_delta(inserts, 1))
    if deletes is not None:
        parts.append(_delta(deletes, -1))
    if not parts:
        stored.withColumn("n_buckets", F.lit(n_buckets)).write.mode(
            "overwrite"
        ).parquet(out_path)
        _write_pin(spark, out_path, n_buckets)
        return n_buckets
    delta = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    delta = delta.groupBy("__bucket").agg(
        F.sum("d_cnt").alias("d_cnt"),
        F.bit_xor("d_xor").alias("d_xor"),
        F.sum("d_sum").alias("d_sum"),
    )

    merged = stored.join(delta, "__bucket", "full_outer").select(
        "__bucket",
        (F.coalesce("cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0))).alias("cnt"),
        F.coalesce("xor_digest", F.lit(0))
        .bitwiseXOR(F.coalesce("d_xor", F.lit(0)))
        .alias("xor_digest"),
        (
            F.coalesce(F.col("sum_digest"), F.lit(0).cast("decimal(38,0)"))
            + F.coalesce(F.col("d_sum"), F.lit(0).cast("decimal(38,0)"))
        ).alias("sum_digest"),
    )
    (
        merged.filter(F.col("cnt") > 0)
        .withColumn("n_buckets", F.lit(n_buckets))
        .write.mode("overwrite")
        .parquet(out_path)
    )
    _write_pin(spark, out_path, n_buckets)
    return n_buckets
