"""The classic-session seam (functions/fsutil).

Every ``spark._jvm``-backed path must either DEGRADE to a documented
driver-local fallback (read-side conveniences) or REFUSE with the named
:class:`ClassicSessionRequired` error (destructive maintenance) when the
py4j gateway is absent — never leak a raw ``AttributeError`` from inside
an operator. A Connect-like session is faked with a stub whose ``_jvm``
raises, mirroring ``PySparkAttributeError``'s behavior; none of these
tests need a real SparkSession.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tidb_large_table_compare_spark.functions.fsutil import (
    ClassicSessionRequired,
    classic_jvm,
    hadoop_fs,
    local_path,
)


class _ConnectLike:
    """Mimics a Spark Connect session: `_jvm` access raises (PySpark's
    Connect session raises PySparkAttributeError, an AttributeError);
    `conf.get` serves the runtime conf the co-location opt-in reads."""

    def __init__(self, confs: dict | None = None) -> None:
        self._confs = dict(confs or {})

    @property
    def _jvm(self):
        raise AttributeError(
            "[JVM_ATTRIBUTE_NOT_SUPPORTED] Attribute `_jvm` is not "
            "supported in Spark Connect."
        )

    @property
    def conf(self):
        confs = self._confs

        class _Conf:
            @staticmethod
            def get(key, default=None):
                return confs.get(key, default)

        return _Conf()


CONNECT = _ConnectLike()
# a Connect client whose user has ASSERTED a filesystem shared with the
# server — the only state where file:-schemed client-side fallbacks act
# on the right machine
CONNECT_COLOCATED = _ConnectLike({"spark.graft.connect.colocatedFs": "true"})


def test_classic_jvm_probe_degrades_to_none():
    assert classic_jvm(CONNECT) is None


def test_hadoop_fs_raises_named_seam_error():
    with pytest.raises(ClassicSessionRequired, match="swap_compacted"):
        hadoop_fs(CONNECT, "/tmp/x", "compaction maintenance (swap_compacted)")


def test_local_path_classifies_schemes():
    assert local_path("/a/b") == Path("/a/b")
    assert local_path("file:///a/b") == Path("/a/b")
    assert local_path("file:/a/b") == Path("/a/b")  # Hadoop's rendering
    assert local_path("s3a://bucket/key") is None
    assert local_path("hdfs://nn/a") is None


def test_corrupt_pin_sidecar_degrades_not_crashes(tmp_path):
    """A crash between fs.create and the payload write leaves an EMPTY
    sidecar; since the version stamp made the pin read unconditional,
    that must degrade (version unknown: reads tolerate, the fold
    refuses) instead of breaking reads of a healthy artifact."""
    from tidb_large_table_compare_spark.operators.incremental import _read_pin

    base = f"file://{tmp_path}"
    (tmp_path / "_n_buckets").write_text("")
    assert _read_pin(CONNECT_COLOCATED, base) == (None, None)
    (tmp_path / "_n_buckets").write_text("not-a-number\n")
    assert _read_pin(CONNECT_COLOCATED, base) == (None, None)
    (tmp_path / "_n_buckets").write_bytes(b"\xff\xfe garbage \x00")
    assert _read_pin(CONNECT_COLOCATED, base) == (None, None)  # non-UTF-8: degrade
    # field-independent degrade: readable pin + garbled version keeps
    # the pin with version UNKNOWN
    (tmp_path / "_n_buckets").write_text("64\ngarbage\n")
    assert _read_pin(CONNECT_COLOCATED, base) == (64, None)


# --- maintenance entry points REFUSE (destructive protocols) ---------------


def test_file_inventory_refuses_under_connect(tmp_path):
    from tidb_large_table_compare_spark.operators.compaction import file_inventory

    with pytest.raises(ClassicSessionRequired, match="file inventory"):
        file_inventory(CONNECT, str(tmp_path))
    with pytest.raises(ClassicSessionRequired, match="file inventory"):
        file_inventory(CONNECT, str(tmp_path), distributed=True)


def test_heal_tree_refuses_under_connect(tmp_path):
    from tidb_large_table_compare_spark.operators.compaction import heal_tree

    with pytest.raises(ClassicSessionRequired, match="heal_tree"):
        heal_tree(CONNECT, str(tmp_path))


def test_swap_compacted_refuses_before_any_work(tmp_path):
    """The gate fires BEFORE plan.collect() — a Connect caller must not
    even start materializing the plan of a destructive protocol."""
    from tidb_large_table_compare_spark.operators.compaction import swap_compacted

    class _PoisonPlan:
        def collect(self):
            raise AssertionError("plan.collect() ran before the seam gate")

    with pytest.raises(ClassicSessionRequired, match="swap_compacted"):
        swap_compacted(CONNECT, _PoisonPlan(), str(tmp_path))


def test_dedup_index_maintenance_refuses_under_connect():
    from tidb_large_table_compare_spark.operators.dedup_index import _hadoop_fs

    with pytest.raises(ClassicSessionRequired, match="near-dup index"):
        _hadoop_fs(CONNECT, "/tmp/index")


# --- read-side paths DEGRADE (driver-local fallbacks) -----------------------


def test_snapshot_versions_degrades_to_local_listing(tmp_path):
    """Only an EXPLICIT file: scheme PLUS the colocatedFs opt-in takes
    the driver-local fallback under Connect — a scheme-less base
    resolves against the SERVER's default FS, and even file: names the
    server's disk when client and server aren't co-located."""
    from tidb_large_table_compare_spark.sources.snapshots import snapshot_versions

    (tmp_path / "v=00000001").mkdir()
    (tmp_path / "v=00000003").mkdir()
    (tmp_path / "not-a-version").mkdir()
    assert snapshot_versions(f"file://{tmp_path}", CONNECT_COLOCATED) == [1, 3]


def test_snapshot_versions_refuses_ambiguous_bases_under_connect(tmp_path):
    from tidb_large_table_compare_spark.sources.snapshots import snapshot_versions

    # [] for a remote base would resurrect the recompute-version-1 bug
    with pytest.raises(ClassicSessionRequired, match="snapshot"):
        snapshot_versions("s3a://lake/snaps", CONNECT)
    # scheme-LESS is ambiguous under Connect (server-side default FS):
    # probing the client's disk silently answers for the wrong machine
    with pytest.raises(ClassicSessionRequired, match="file:"):
        snapshot_versions(str(tmp_path), CONNECT)
    # file:-schemed WITHOUT the co-location opt-in: under remote Connect
    # file: resolves on the SERVER, so the client-side listing would
    # answer for the wrong machine — refuse, naming the opt-in
    with pytest.raises(ClassicSessionRequired, match="colocatedFs"):
        snapshot_versions(f"file://{tmp_path}", CONNECT)


def test_digest_pin_degrades_to_local_file(tmp_path):
    from tidb_large_table_compare_spark.functions.hashing import BUCKETING_VERSION
    from tidb_large_table_compare_spark.operators.incremental import (
        _read_pin,
        _write_pin,
    )

    _write_pin(CONNECT_COLOCATED, f"file://{tmp_path}", 128)
    assert (tmp_path / "_n_buckets").exists()
    assert _read_pin(CONNECT_COLOCATED, f"file://{tmp_path}") == (
        128,
        BUCKETING_VERSION,
    )

    # remote AND scheme-less paths under Connect: documented skip,
    # never a crash or a wrong-machine write (the scheme-less form
    # resolves against the server's default FS) — scheme-driven, so the
    # opt-in cannot widen it
    _write_pin(CONNECT_COLOCATED, "s3a://lake/digests", 128)
    assert _read_pin(CONNECT_COLOCATED, "s3a://lake/digests") == (None, None)
    _write_pin(CONNECT_COLOCATED, str(tmp_path / "elsewhere"), 128)
    assert not (tmp_path / "elsewhere").exists()  # nothing written locally
    assert _read_pin(CONNECT_COLOCATED, str(tmp_path / "elsewhere")) == (
        None,
        None,
    )
    # a file:-schemed path whose directory is missing degrades too
    # (never crash after the Spark-side digest write succeeded)
    _write_pin(CONNECT_COLOCATED, f"file://{tmp_path}/missing/dir", 128)


def test_digest_pin_skips_file_scheme_without_colocation(tmp_path):
    """Under Connect WITHOUT the colocatedFs opt-in even a file: path is
    the SERVER's disk, not necessarily this client's — the pin write
    must skip (the in-data pin covers the artifact) and the read must
    degrade to (None, None), never touch the client's filesystem."""
    from tidb_large_table_compare_spark.operators.incremental import (
        _read_pin,
        _write_pin,
    )

    _write_pin(CONNECT, f"file://{tmp_path}", 128)
    assert not (tmp_path / "_n_buckets").exists()  # nothing written locally
    (tmp_path / "_n_buckets").write_text("128\n3\n")  # even if present...
    assert _read_pin(CONNECT, f"file://{tmp_path}") == (None, None)


def test_local_path_authority_forms():
    """file://host/path carries an AUTHORITY: only empty/localhost is
    this machine — stripping 'file://' naively left 'host/path', a
    RELATIVE path the fallbacks could probe cwd-relative (ADVICE r9)."""
    assert local_path("file:///a/b") == Path("/a/b")
    assert local_path("file://localhost/a/b") == Path("/a/b")
    assert local_path("file://LOCALHOST/a/b") == Path("/a/b")
    assert local_path("file://datanode7/a/b") is None
    assert local_path("file://datanode7") is None
    assert local_path("file://") == Path("/")


def test_cdc_fold_names_classic_seam_for_unreadable_sidecar(tmp_path):
    """Under Connect with a client-unreadable digests path the version
    sidecar is UNKNOWABLE, not absent — the fold must name the
    classic-session seam (the artifact may be perfectly valid) instead
    of reaching the legacy-artifact refusal whose advice (re-snapshot)
    is destructive. Fires BEFORE any read."""
    from tidb_large_table_compare_spark.operators.incremental import (
        apply_changes_to_digests,
    )

    for path in ("s3a://lake/digests", str(tmp_path), f"file://{tmp_path}"):
        with pytest.raises(ClassicSessionRequired, match="do[ ]*NOT re-snapshot"):
            apply_changes_to_digests(
                CONNECT, path, str(tmp_path / "out"), ["pk"]
            )


def test_streaming_layout_probe_degrades(tmp_path):
    from tidb_large_table_compare_spark.streaming.events import _is_directory

    f = tmp_path / "one.json"
    f.write_text("{}")
    assert _is_directory(CONNECT, str(tmp_path)) is True
    assert _is_directory(CONNECT, str(f)) is False
    assert _is_directory(CONNECT, str(tmp_path / "missing")) is False


class _ConnectLikeFrame:
    """Mimics a Spark Connect DataFrame for derive_max_cells: `_jdf`
    raises (as PySparkAttributeError does), `count()` records the
    fallback job and returns a fixed row count."""

    def __init__(self, n_rows: int) -> None:
        self._n = n_rows
        self.count_calls = 0

    @property
    def _jdf(self):
        raise AttributeError(
            "[JVM_ATTRIBUTE_NOT_SUPPORTED] Attribute `_jdf` is not "
            "supported in Spark Connect."
        )

    def count(self) -> int:
        self.count_calls += 1
        return self._n


def test_derive_max_cells_connect_fallback_counts_once():
    """similarity.derive_max_cells reads plan stats via py4j internals
    (`_jdf.queryExecution()`), absent under Connect — the documented
    degrade is exactly ONE narrow count job, and the √N sizing must
    still apply to its result (ADVICE/VERDICT r11 #6)."""
    from tidb_large_table_compare_spark.operators.similarity import (
        derive_max_cells,
    )

    big = _ConnectLikeFrame(5_000_000)
    assert derive_max_cells(big) == 2236  # isqrt(5e6) > the 1024 floor
    assert big.count_calls == 1

    small = _ConnectLikeFrame(10_000)
    assert derive_max_cells(small) == 1024  # floor binds below floor² rows
    assert small.count_calls == 1
