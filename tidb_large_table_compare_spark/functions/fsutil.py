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
  the path is provably this client's disk, and to their pre-sidecar
  behavior otherwise — the degrade-don't-crash posture
  ``functions/partitioning.py`` set. "Provably" means an explicit
  ``file:`` scheme AND the ``spark.graft.connect.colocatedFs=true``
  opt-in (:func:`colocated_fs_opt_in`): under REMOTE Connect a ``file:``
  path resolves on the SERVER, so a client-side fallback without
  evidence of co-location would act on the wrong machine.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

__all__ = [
    "ClassicSessionRequired",
    "classic_jvm",
    "colocated_fs_opt_in",
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
    paths). The AUTHORITY form ``file://host/path`` is local only for an
    empty or ``localhost`` authority — naively stripping ``file://``
    would leave ``host/path``, a RELATIVE path the driver-local
    fallbacks could then probe or write cwd-relative (round-9 ADVICE);
    any other authority is some other machine's disk and returns
    ``None`` like a remote scheme."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        if rest.startswith("/"):
            return Path(rest)  # empty authority: file:///x
        authority, _, tail = rest.partition("/")
        if authority == "" or authority.lower() == "localhost":
            return Path("/" + tail)
        return None  # file://othernode/x is NOT this machine's disk
    if path.startswith("file:"):
        return Path(path[len("file:"):])
    if "://" in path:
        return None
    return Path(path)


def colocated_fs_opt_in(spark: SparkSession) -> bool:
    """True when the user has asserted that this (Connect) client shares
    a filesystem with the Spark server — the one condition under which a
    client-side pathlib fallback for a ``file:``-schemed path acts on
    the machine the server wrote to. Read from the session conf so it
    travels with the connection, not the codebase; any failure to read
    counts as not-asserted."""
    try:
        v = spark.conf.get("spark.graft.connect.colocatedFs", "false")
    except Exception:
        return False
    return str(v).lower() == "true"


def explicit_local_path(
    path: str, spark: SparkSession | None = None
) -> Path | None:
    """:func:`local_path`, but ONLY for explicitly ``file:``-schemed
    paths — and, when ``spark`` (the Connect session the caller already
    probed with :func:`classic_jvm`) is supplied, ONLY with co-location
    asserted via :func:`colocated_fs_opt_in`.

    Under Spark Connect a scheme-LESS path resolves against the
    SERVER's default filesystem — the client machine may not even have
    the directory — so a driver-local fallback for it would crash after
    the Spark-side write succeeded, or silently act on the wrong
    machine (round-9 review finding). And a ``file:`` scheme under
    REMOTE Connect names the SERVER's disk too: without evidence of
    co-location the client-side fallback would probe the wrong machine
    — e.g. listing [] snapshot versions for an existing server-side
    base and resurrecting the recompute-version-1 bug — so it now
    requires the explicit ``spark.graft.connect.colocatedFs=true``
    opt-in (round-10 ADVICE)."""
    if not path.startswith("file:"):
        return None
    if spark is not None and not colocated_fs_opt_in(spark):
        return None
    return local_path(path)
