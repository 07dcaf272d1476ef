"""Versioned snapshot store — the engine's snapshot-consistent read (B2).

The reference pins both sides of a comparison to a consistent snapshot
(``snapshot = "auto"``, ``my_database_users.toml:20``) so a live-updating
table cannot smear the diff. Without Delta/Iceberg jars (not in this
environment), the same guarantee comes from an immutable version-stamped
parquet layout::

    {base}/v=00000001/...parquet
    {base}/v=00000002/...parquet

Writers only ever create a NEW version directory (write-once); readers pin a
version at plan time. ``compare(read_snapshot(a, v1), read_snapshot(b, v2))``
is therefore stable no matter what lands afterwards — the engine convention
SURVEY.md §4 calls "snapshot isolation by immutability".
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^v=(\d{8})$")


def snapshot_versions(base: str, spark: SparkSession | None = None) -> list[int]:
    """Existing version numbers under ``base``, ascending.

    With ``spark`` the listing goes through the Hadoop FileSystem API, so
    remote bases (hdfs://, s3a://) that Spark itself reads and writes work
    too — driver-local pathlib sees such a base as empty, which made every
    write_snapshot recompute version 1 and die on errorifexists. Without a
    session the local-path fallback remains.

    Under Spark Connect (no py4j gateway) the listing degrades to the
    driver-local fallback ONLY for an explicitly ``file:``-schemed base
    (which proves the base is the driver's disk) and REFUSES everything
    else with the engine's named seam error: a remote scheme obviously,
    but also a scheme-LESS base, which under Connect resolves against
    the SERVER's default filesystem — probing it with the client's
    pathlib would return [] for an existing remote base and resurrect
    the recompute-version-1 bug this function's Hadoop path exists to
    fix. Use ``file:///...`` for a genuinely driver-local base under
    Connect.
    """
    if spark is not None:
        from tidb_large_table_compare_spark.functions.fsutil import (
            ClassicSessionRequired,
            classic_jvm,
            explicit_local_path,
        )

        jvm = classic_jvm(spark)
        if jvm is not None:
            jpath = jvm.org.apache.hadoop.fs.Path(base)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jpath):
                return []
            out = []
            for status in fs.listStatus(jpath):
                m = _V_RE.match(status.getPath().getName())
                if m:
                    out.append(int(m.group(1)))
            return sorted(out)
        lp = explicit_local_path(base, spark)
        if lp is None:
            raise ClassicSessionRequired(
                f"snapshot version listing on base {base!r} under Spark "
                f"Connect (a client-side listing is sound only for an "
                f"explicit file: scheme AND an asserted shared "
                f"filesystem — set spark.graft.connect.colocatedFs=true "
                f"when this client really shares the server's disk)"
            )
        base = str(lp)  # strips the file: scheme pathlib can't walk
    p = Path(base)
    if not p.exists():
        return []
    out = []
    for child in p.iterdir():
        m = _V_RE.match(child.name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def write_snapshot(df: DataFrame, base: str) -> int:
    """Write the next snapshot version (write-once; never overwrites)."""
    version = (snapshot_versions(base, df.sparkSession) or [0])[-1] + 1
    df.write.mode("errorifexists").parquet(f"{base}/v={version:08d}")
    return version


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read a pinned snapshot version (default: latest at call time).

    The version resolves eagerly so later writes cannot change what this
    DataFrame reads — the B2 guarantee.
    """
    versions = snapshot_versions(base, spark)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {base}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(f"snapshot v={version} not in {versions}")
    return spark.read.parquet(f"{base}/v={version:08d}")
