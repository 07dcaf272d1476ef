"""Hadoop-FileSystem access and the classic-session seam.

The maintenance/lake operators (compaction swap/heal/inventory, near-dup
index compaction, snapshot versioning, digest-artifact sidecars) reach the
Hadoop FileSystem through ``spark._jvm`` — a py4j gateway that only exists
on a CLASSIC session. Under Spark Connect the attribute access raises a
raw ``PySparkAttributeError`` from deep inside the operator, which
violates the engine's documented-seam discipline (every environment gap —
missing spark-avro jar, missing Pillow — fails with a NAMED error naming
the seam, see ``sources/files.py``).

Two postures, chosen per call site to match round-8's stats-probe guards:

- **require** (:func:`hadoop_fs`): destructive or FS-mutating maintenance
  (swap, heal, index compaction, inventory walks feeding a swap) REFUSES
  under Connect with :class:`ClassicSessionRequired` — degrading a
  destructive protocol is worse than refusing it.
- **degrade** (:func:`classic_jvm` returning ``None`` + a driver-local
  fallback): read-side conveniences (snapshot-version listing, the
  digest-artifact ``_n_buckets`` sidecar) fall back to ``pathlib`` when
  the path is driver-local, and to their pre-sidecar behavior otherwise —
  the degrade-don't-crash posture ``functions/partitioning.py`` set.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

__all__ = [
    "ClassicSessionRequired",
    "classic_jvm",
    "explicit_local_path",
    "hadoop_fs",
    "local_path",
]


class ClassicSessionRequired(RuntimeError):
    """A py4j-backed operation was invoked on a non-classic session."""

    def __init__(self, op: str) -> None:
        super().__init__(
            f"{op} requires a classic (py4j) Spark session: the Hadoop "
            f"FileSystem API is reached through spark._jvm, which does not "
            f"exist under Spark Connect. Run this maintenance step from a "
            f"classic session (spark-submit / local master) against the "
            f"same storage."
        )
        self.op = op


def classic_jvm(spark: SparkSession):
    """The session's py4j JVM gateway, or ``None`` under Spark Connect.

    Connect sessions raise ``PySparkAttributeError`` on ``_jvm`` access;
    anything else unexpected is treated the same way — the callers all
    have a documented driver-local fallback, and guessing at py4j
    internals' stability is exactly what this probe exists to avoid.
    """
    try:
        return spark._jvm
    except Exception:
        return None


def hadoop_fs(spark: SparkSession, path: str, op: str):
    """(FileSystem, Path) for ``path`` — or raise :class:`ClassicSessionRequired`.

    ``op`` names the refusing operation in the error (e.g. ``"compaction
    maintenance (swap_compacted)"``) so a Connect user knows which seam
    they hit, not just which attribute was missing.
    """
    jvm = classic_jvm(spark)
    if jvm is None:
        raise ClassicSessionRequired(op)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def local_path(path: str) -> Path | None:
    """Driver-local ``Path`` form of ``path``, or ``None`` if it names a
    remote filesystem (hdfs://, s3a://, ...) that only the JVM can reach.

    Handles both slash forms of the local scheme: ``file:///x`` (URI) and
    ``file:/x`` (how Hadoop's ``Path.toString`` renders qualified local
    paths)."""
    if path.startswith("file://"):
        return Path(path[len("file://"):] or "/")
    if path.startswith("file:"):
        return Path(path[len("file:"):])
    if "://" in path:
        return None
    return Path(path)


def explicit_local_path(path: str) -> Path | None:
    """:func:`local_path`, but ONLY for explicitly ``file:``-schemed
    paths. Under Spark Connect a scheme-LESS path resolves against the
    SERVER's default filesystem — the client machine may not even have
    the directory — so a driver-local fallback for it would crash after
    the Spark-side write succeeded, or silently act on the wrong
    machine (round-9 review finding). A ``file:`` scheme is the caller
    saying "this really is the driver's disk"."""
    if path.startswith("file:"):
        return local_path(path)
    return None
