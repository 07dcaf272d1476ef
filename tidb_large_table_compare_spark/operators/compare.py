"""Digest-first large-table comparison — the engine's core operator.

Re-implements natively what the reference delegates to sync-diff-inspector and
pins via its per-table TOML template (SURVEY.md §2.B):

- B1  structure compare            → :mod:`..operators.schema_diff`
- B4  ``range`` row predicate       → ``CompareOptions.range_sql`` via ``F.expr``
  (reference ``syncdiff_config2/my_database_users.toml:46``)
- B5  chunk split (``chunk-size``)  → hash buckets ``pmod(xxhash64(pk), n)``
  (reference ``my_database_users.toml:45``, ``config.toml:21``)
- B6  per-chunk checksum + count    → ``groupBy(bucket).agg(count, bit_xor(hash), sum(hash))``
- B8  row-level drill-down          → PK full-outer join *restricted to
  mismatched buckets* via a broadcast semi-join
- B9  UPCOUNT/DOWNCOUNT classification (reference report columns,
  ``step3_run_syncdiff.sh:191-192, 216-218``)
- B11 equivalence verdict (``step3_run_syncdiff.sh:204``)

100 TB design: the digest pass shuffles only ``n_buckets`` partial aggregates
per map task (map-side combine makes bytes-shuffled ∝ n_buckets, not rows);
the drill-down pass re-scans both sides but discards all rows outside the
mismatched buckets at the scan operator via a broadcast hash semi-join, so the
PK join shuffles bytes ∝ diff size, not table size. Two narrow scans beat one
full-table shuffle by orders of magnitude when tables mostly agree — which is
the reference's entire reason to exist (1e9-row tables, ``config.toml:16``).

Duplicate/NULL PKs degrade a PK join (SURVEY.md §7 hard parts): the multiset
path (``pk=None`` or ``force_multiset``) instead compares whole-row-hash
multiplicities — an ``exceptAll``-style diff that needs no key at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidb_large_table_compare_spark.functions.hashing import (
    bucket_id,
    canonical_value,
    in_list,
    row_hash,
)
from tidb_large_table_compare_spark.operators.schema_diff import schema_diff

__all__ = ["CompareOptions", "TableCompare", "compare_tables"]

DEFAULT_CHUNK_SIZE = 5000  # reference chunk-size (config.toml:21)


@dataclass(frozen=True)
class CompareOptions:
    """Knobs mirroring the reference's comparison-job template."""

    chunk_size: int = DEFAULT_CHUNK_SIZE  # rows per bucket (B5)
    n_buckets: int | None = None  # override; else estimated from left count
    range_sql: str | None = None  # B4 arbitrary SQL predicate, e.g. "1 = 1"
    float_round: int | None = None  # declared double tolerance (SURVEY.md §7)
    check_struct_only: bool = False  # template check-struct-only
    force_multiset: bool = False  # keyless/duplicate-PK fallback
    min_buckets: int = 32
    max_buckets: int = 1 << 20
    # Caller/catalog-supplied row count for bucket sizing — the analog of the
    # reference reading TABLE_ROWS from information_schema
    # (step1_query_tables.sh:115-117). Takes precedence over the plan-stats
    # probe and the count() fallback, so Connect-style sessions (where the
    # py4j stats probe throws) run zero sizing jobs when stats are known.
    row_count_hint: int | None = None
    # Count-only drift pre-probe (see TableCompare._count_drift_is_heavy):
    # OFF unless explicitly enabled. Measured round 13 (sf0.1 + sf10 A/Bs
    # in OPTIMIZATION_r13.md): on this 6-column fixture the probe's
    # pk-only scan costs ~0.63× the digest pass it might save (scan/decode
    # dominates, not hashing), which makes it a net loss both when cores
    # are saturated (the overlap is additive) and when drift is count-
    # balanced (the probe learns nothing). Enable it (True) for WIDE
    # tables where row_hash over many columns dwarfs a pk-only scan AND
    # count-visible drift (inserts/deletes) is the expected failure mode —
    # there a heavy verdict cancels the digest pass early and saves most
    # of a full-width canonicalize+hash of both sides.
    drift_probe: bool | None = None


def _narrow(df: DataFrame, pk: list[str], compare_cols: list[str], n_buckets: int,
            float_round: int | None) -> DataFrame:
    """Project to (pk..., __bucket, __row_hash) — the only columns the compare
    plan ever shuffles. Catalyst prunes the parquet scan to pk+compare cols."""
    return df.select(
        *[F.col(c) for c in pk],
        bucket_id(pk, n_buckets, df).alias("__bucket"),
        row_hash(df, compare_cols, float_round).alias("__row_hash"),
    )


class TableCompare:
    """A lazily-planned comparison of two DataFrames.

    All result accessors return DataFrames; nothing is executed until the
    caller acts on them.
    """

    def __init__(
        self,
        spark: SparkSession,
        left: DataFrame,
        right: DataFrame,
        pk: list[str] | None,
        options: CompareOptions = CompareOptions(),
        table_name: str = "table",
    ) -> None:
        self.spark = spark
        self.options = options
        self.table_name = table_name
        self.pk = list(pk) if pk else []
        if options.range_sql:  # B4
            left = left.filter(F.expr(options.range_sql))
            right = right.filter(F.expr(options.range_sql))
        self.left = left
        self.right = right
        # Data diff runs over the columns both sides share; structure diff
        # reports the rest (sync-diff compares data only when structure allows).
        self.compare_cols = sorted(set(left.columns) & set(right.columns))
        self._schema_diff: DataFrame | None = None
        self._structure_ok: bool | None = None
        self._diff_rows: DataFrame | None = None
        # memoized narrow (pk, __bucket, __row_hash) projections: the digest
        # pass and the drill-down each rebuilt them (~94 ms of py4j per
        # build, round-12 micro-profile); the projection is a pure function
        # of (side, pk, compare_cols, n_buckets, float_round), all fixed per
        # instance
        self._narrows: dict[str, DataFrame] = {}
        self._n_buckets_memo: int | None = None
        self._est_rows_memo: int | None = None
        # (n_buckets, in-list ids | None, persisted bad-bucket frame | None)
        self._bad_state: tuple[int, list | None, DataFrame | None] | None = None

    # -- structure (B1) ----------------------------------------------------
    def schema_diff(self) -> DataFrame:
        if self._schema_diff is None:
            self._schema_diff = schema_diff(self.spark, self.left, self.right)
        return self._schema_diff

    def structure_ok(self) -> bool:
        # Pure driver-side check: both schemas are already local StructTypes,
        # so no Spark job is needed (schema_diff() stays available as the
        # DataFrame-shaped report of *what* differs).
        if self._structure_ok is None:
            lf = [(f.name, f.dataType.simpleString()) for f in self.left.schema.fields]
            rf = [(f.name, f.dataType.simpleString()) for f in self.right.schema.fields]
            self._structure_ok = lf == rf
        return self._structure_ok

    # -- sizing ------------------------------------------------------------
    def _n_buckets(self) -> int:
        opt = self.options
        if opt.n_buckets is not None:
            return opt.n_buckets
        if self._n_buckets_memo is None:
            # the plan-stats probe triggers a Catalyst optimize of the left
            # plan (~85 ms driver time, round-12 micro-profile) — cache the
            # result; inputs are fixed per instance
            self._n_buckets_memo = self._n_buckets_uncached()
        return self._n_buckets_memo

    def _n_buckets_uncached(self) -> int:
        opt = self.options
        # Size the bucket count from optimizer plan statistics (file sizes for
        # parquet scans) — zero Spark jobs. On a real deployment this comes
        # from catalog statistics (the reference reads TABLE_ROWS from
        # information_schema, step1_query_tables.sh:115-117). Bucket count
        # only tunes drill-down granularity; results are invariant to it
        # (test_bucket_count_invariance), so a coarse estimate is fine.
        rows = self._estimate_rows()
        n = max(opt.min_buckets, rows // max(opt.chunk_size, 1) + 1)
        return min(n, opt.max_buckets)

    _BYTES_PER_ROW_GUESS = 64
    _MAX_INLIST = 50_000  # bad-bucket count above which we broadcast instead
    # bad-bucket FRACTION above which restriction is skipped outright —
    # the filter would discard under half the rows while every downstream
    # job re-pays the big-IN/semi-join plan cost (see _bad_bucket_state)
    _RESTRICT_SKIP_FRACTION = 0.5
    # estimated-row floor for the count-only drift pre-probe: below it the
    # full digest pass costs less than the probe's own fixed job overhead
    # (one scheduling round trip + a pk-columns scan), so probing cannot
    # pay; above it the avoidable work — a full-width canonicalize+hash
    # pass over BOTH sides — grows linearly while the probe reads only the
    # pk columns. Same fixed-cost-vs-work-saved shape as _MAX_INLIST.
    _PROBE_MIN_EST_ROWS = 20_000

    def _estimate_rows(self) -> int:
        # memoized: inputs are fixed per instance, and the plan-stats probe
        # costs a Catalyst optimize (~85 ms) per call
        if self._est_rows_memo is None:
            self._est_rows_memo = self._estimate_rows_uncached()
        return self._est_rows_memo

    def _estimate_rows_uncached(self) -> int:
        if self.options.row_count_hint is not None:  # catalog stats (TABLE_ROWS)
            return max(1, self.options.row_count_hint)
        try:  # plan statistics via py4j internals — absent under Spark Connect
            stats = self.left._jdf.queryExecution().optimizedPlan().stats()
            if stats.rowCount().isDefined():
                return int(str(stats.rowCount().get()))
            size = int(str(stats.sizeInBytes()))
            if 0 < size < (1 << 50):  # unknown sources report Long.Max-ish sizes
                return max(1, size // self._BYTES_PER_ROW_GUESS)
        except Exception:
            pass
        return self.left.count()  # last resort: one narrow count job

    # -- digest phase (B5/B6) ----------------------------------------------
    def _narrow_side(self, side: str) -> DataFrame:
        nf = self._narrows.get(side)
        if nf is None:
            df = self.left if side == "left" else self.right
            nf = _narrow(df, self.pk, self.compare_cols, self._n_buckets(),
                         self.options.float_round)
            self._narrows[side] = nf
        return nf

    def bucket_digests(self, side: str = "left") -> DataFrame:
        narrow = self._narrow_side(side)
        # bit_xor is order-independent but cancels duplicate rows pairwise;
        # count + sum(hash) are the independent second/third digests (B6).
        # The sum accumulates in decimal(38,0): a bigint sum of 64-bit hashes
        # overflows (ANSI mode raises), and wrap-around would weaken the digest.
        return narrow.groupBy("__bucket").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.bit_xor("__row_hash").alias("xor_digest"),
            F.sum(F.col("__row_hash").cast("decimal(38,0)")).alias("sum_digest"),
        )

    def mismatched_buckets(self) -> DataFrame:
        # ONE shuffle, no join: both sides' narrow (bucket, hash) rows are
        # unioned under a side tag and digested by a single per-bucket
        # aggregation with side-conditional count/xor/sum. The former
        # per-side groupBy + full-outer join shape shuffled the same bytes
        # (2 × n_buckets partial aggregates) but planned two exchanges plus
        # a join stage — with AQE that is three query-stage rounds of
        # scheduling per digest pass, pure fixed cost at any scale and the
        # dominant term at bench SFs (guide §2.4: two operations keyed the
        # same way share one exchange). Verdict-equivalence with the join
        # form: a bucket absent from one side previously read NULL on that
        # side's columns; here its conditional count is 0 and its xor/sum
        # stay NULL (no non-null inputs) — either way eqNullSafe against a
        # populated side fails and the bucket is flagged. Buckets absent
        # from both sides appear in neither formulation.
        tagged = [
            self._narrow_side(side_name).select(
                "__bucket", "__row_hash", F.lit(side).alias("__side")
            )
            for side_name, side in (("left", 0), ("right", 1))
        ]
        u = tagged[0].unionByName(tagged[1])
        lrow = F.when(F.col("__side") == 0, F.col("__row_hash"))
        rrow = F.when(F.col("__side") == 1, F.col("__row_hash"))
        agg = u.groupBy("__bucket").agg(
            F.count(lrow).alias("l_cnt"),
            F.count(rrow).alias("r_cnt"),
            F.bit_xor(lrow).alias("l_xor"),
            F.bit_xor(rrow).alias("r_xor"),
            F.sum(lrow.cast("decimal(38,0)")).alias("l_sum"),
            F.sum(rrow.cast("decimal(38,0)")).alias("r_sum"),
        )
        bad = (
            (F.col("l_cnt") != F.col("r_cnt"))
            | ~F.col("l_xor").eqNullSafe(F.col("r_xor"))
            | ~F.col("l_sum").eqNullSafe(F.col("r_sum"))
        )
        return agg.filter(bad).select("__bucket")

    # -- drift pre-probe -----------------------------------------------------
    def _probe_enabled(self) -> bool:
        if not self.options.drift_probe:
            return False  # default OFF — see CompareOptions.drift_probe
        try:  # the concurrent probe needs job groups/cancellation (py4j)
            self.spark.sparkContext
        except Exception:
            return False  # Spark Connect: keep the plain digest pass
        return True  # explicit opt-in overrides

    def _probed_digest_collect(self, collect_fn):
        """Run the digest-pass collect CONCURRENTLY with the count-only
        probe (guide §2.6: overlap independent jobs).

        Sequenced probe-then-digest was measured to REGRESS mixed-drift
        compares whose count drift lands under the skip threshold while
        their digest drift lands over it (the sf0.1 reconcile entry at
        4096 buckets: probe False → full digest anyway → the probe scan
        was pure waste, +0.3 s). Overlapped, the False verdict costs ~zero
        wall clock — the digest was already running on idle cores — and a
        heavy verdict cancels the digest mid-flight (its only yield would
        have been "skip restriction"). Returns the collected bad-bucket
        ids, or None when the probe's heavy verdict made them moot.

        Thread-safety: pinned-thread mode (default since Spark 3.2) maps
        this Python thread to its own JVM thread, so the job group set
        inside it cannot leak to the caller's jobs; the caller's job
        description is forwarded so UI/event-log attribution survives.
        """
        import threading
        import uuid

        sc = self.spark.sparkContext
        group = f"graft-digest-{uuid.uuid4().hex[:8]}"
        desc = sc.getLocalProperty("spark.job.description")
        box: dict = {}

        def _run() -> None:
            sc.setJobGroup(group, desc or "compare digest pass",
                           interruptOnCancel=True)
            try:
                box["ids"] = collect_fn()
            except BaseException as exc:  # surfaced on the main thread
                box["err"] = exc

        t = threading.Thread(target=_run, daemon=True)
        t.start()
        try:
            heavy = self._count_drift_is_heavy()
        except BaseException:
            sc.cancelJobGroup(group)
            t.join()
            raise
        if heavy:
            sc.cancelJobGroup(group)
            t.join()
            return None
        t.join()
        if "err" in box:
            raise box["err"]
        return box["ids"]

    def _count_drift_is_heavy(self) -> bool:
        """Deterministic count-only drift probe: True when MORE than
        ``_RESTRICT_SKIP_FRACTION`` of buckets differ in per-bucket ROW
        COUNT between the sides.

        A count mismatch implies a digest mismatch, so a heavy verdict
        here is a *sufficient* condition for the decision the full digest
        pass would reach — ``_bad_bucket_state`` can skip restriction
        without running it, saving a full-width canonicalize+hash pass
        over both sides whose only yield would have been "don't restrict"
        (round-12 verdict item 2: at 100 TB that is two full table scans
        spent on a decision). The probe reads ONLY the pk columns (column
        pruning reaches the parquet scan — no compare-column pages, no
        row_hash), shuffles ∝ n_buckets with map-side combine, and is one
        job. It cannot flip a verdict: False (count-balanced drift, e.g.
        update-only feeds, or light drift) just falls through to the full
        digest pass, which remains the decision of record.
        """
        n_buckets = self._n_buckets()
        skip_above = self._RESTRICT_SKIP_FRACTION * n_buckets
        tagged = [
            df.select(
                bucket_id(self.pk, n_buckets, df).alias("__bucket"),
                F.lit(side).alias("__side"),
            )
            for df, side in ((self.left, 0), (self.right, 1))
        ]
        u = tagged[0].unionByName(tagged[1])
        agg = u.groupBy("__bucket").agg(
            F.count(F.when(F.col("__side") == 0, 1)).alias("l_cnt"),
            F.count(F.when(F.col("__side") == 1, 1)).alias("r_cnt"),
        )
        bad = agg.filter(F.col("l_cnt") != F.col("r_cnt"))
        limit_n = int(skip_above) + 1
        return bad.limit(limit_n).count() > skip_above

    # -- drill-down (B8/B9) --------------------------------------------------
    def _bad_bucket_state(self) -> tuple[int, list | None, DataFrame | None]:
        """Materialize the mismatched-bucket set once, for every consumer.

        The set is tiny when tables mostly agree. Left as a lazy subtree it
        would be *recomputed* per consumer (the digest pass re-scans both
        tables), so it is materialized exactly once per TableCompare: small
        sets become an IN-list evaluated at the scan (no join at all);
        unexpectedly large sets fall back to one persisted broadcast
        semi-join frame. Either way downstream joins see only bad-bucket
        rows — bytes ∝ diff size, not table size — and the materialized
        form is BOUNDED (one long per bucket, few MB at the 2^20 cap),
        never ∝ diff rows.

        When the bad set covers MOST buckets (heavy drift), restriction
        would discard almost nothing while embedding a thousands-element
        IN predicate that every downstream job re-pays in analysis and
        optimizer time (INSET conversion is per-action; measured ~0.2-0.4 s
        per job at 2-10k elements, PERFORMANCE.md round-8) — so above
        ``_RESTRICT_SKIP_FRACTION`` the state records "no restriction"
        and the drill-down simply compares everything: sound because
        clean-bucket rows hash-equal and drop out of the diff join, and
        cheaper because the join reads at most 1/fraction more rows than
        the restricted plan would.

        Returns ``(n_buckets, ids | None, persisted_frame | None)``: at
        most one of ids/frame is non-None; both None (with a non-empty
        diff) means restriction is a deliberate no-op. The persisted
        frame is a deliberate session-lifetime cache — it is embedded in
        returned lazy diff plans that callers re-consume (fix-SQL,
        reconcile); releasing it here would re-run the digest compare per
        consumer.
        """
        if self._bad_state is None:
            n_buckets = self._n_buckets()
            skip_above = self._RESTRICT_SKIP_FRACTION * n_buckets
            bad = self.mismatched_buckets()

            def _collect_ids() -> list:
                return [
                    r["__bucket"]
                    for r in bad.limit(self._MAX_INLIST + 1).collect()
                ]

            if self._probe_enabled():
                # regime-aware shortcut: the count-only probe runs
                # CONCURRENTLY with the digest collect — a heavy verdict
                # proves "skip restriction" and cancels the digest (whose
                # only yield that was); a False verdict costs ~zero wall
                # clock. Size-gated, so small compares run zero extra jobs,
                # and the decision of record is unchanged either way.
                bad_ids = self._probed_digest_collect(_collect_ids)
                if bad_ids is None:
                    self._bad_state = (n_buckets, None, None)
                    return self._bad_state
            else:
                bad_ids = _collect_ids()
            if len(bad_ids) <= self._MAX_INLIST:
                if bad_ids and len(bad_ids) > skip_above:
                    self._bad_state = (n_buckets, None, None)
                else:
                    self._bad_state = (n_buckets, bad_ids, None)
            else:
                bad = bad.persist()
                if bad.count() > skip_above:
                    bad.unpersist()
                    self._bad_state = (n_buckets, None, None)
                else:
                    self._bad_state = (n_buckets, None, bad)
        return self._bad_state

    def _restrict_to_bad_buckets(self, df: DataFrame) -> DataFrame:
        """``df`` (a full-width side of this compare) filtered to rows whose
        PK hashes into a mismatched bucket — the scan-level discard that
        keeps drill-down cost ∝ drift (skipped when drift covers most
        buckets; see _bad_bucket_state)."""
        n_buckets, bad_ids, bad = self._bad_bucket_state()
        if bad_ids is None and bad is None:
            return df
        withb = df.withColumn("__bucket", bucket_id(self.pk, n_buckets, df))
        if bad_ids is not None:
            # in_list, not Column.isin: the py4j per-element literal cost of
            # isin is ~30 s of driver time at the 50k cap (hashing.in_list)
            restricted = withb.filter(in_list("__bucket", bad_ids))
        else:
            restricted = withb.join(F.broadcast(bad), "__bucket", "left_semi")
        return restricted.drop("__bucket")

    def _bounded_pushdown_keys(self, frame: DataFrame, col: str) -> list | None:
        """``col``'s values from ``frame`` when they qualify for the pk-IN
        scan pushdown: at most ``_MAX_INLIST`` of them and every one in
        ``hashing.render_sql_id``'s safe-rendering domain (ints, Decimals
        — the TiDB unsigned-BIGINT mapping — identifier-charset strings
        like UUID keys, dates, binary, and — dtype-declared — both
        timestamp flavors). Returns None when oversized or unrenderable —
        the one eligibility rule shared by fix_sql's master retrieval and
        column_drift's pair retrieval, defined by the same predicate as
        in_list's fast path, so the cap and the type gate cannot drift
        apart. Callers must pass ``frame``'s own dtype for ``col`` into
        the ``in_list`` that consumes the returned ids."""
        from tidb_large_table_compare_spark.functions.hashing import (
            render_sql_id,
        )

        dtype = frame.schema[col].dataType
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            # a timestamp rendering is flavor-specific (instant vs wall
            # clock): when the two sides disagree on the flavor the one
            # predicate cannot be sound against both scans — keep the
            # semi-join/bucket shape, which pairs rows through the join's
            # own coercion instead of a literal's
            sides = {
                s.schema[col].dataType
                for s in (self.left, self.right)
                if col in s.columns
            }
            if sides != {dtype}:
                return None
        ids = [
            r[0]
            for r in frame.select(col).limit(self._MAX_INLIST + 1).collect()
        ]
        if len(ids) <= self._MAX_INLIST and all(
            render_sql_id(i, dtype) is not None for i in ids
        ):
            return ids
        return None

    def diff_rows(self) -> DataFrame:
        """(pk..., diff_type) for every differing row.

        diff_type ∈ {'missing_in_right', 'extra_in_right', 'modified'}:
        missing+modified rows need INSERT/REPLACE on the target (UPCOUNT),
        extra+modified need DELETE/REPLACE (DOWNCOUNT) — matching the
        reference report's semantics (B9).
        """
        if self._diff_rows is not None:
            return self._diff_rows
        if self.options.force_multiset or not self.pk:
            self._diff_rows = self._diff_rows_multiset()
            return self._diff_rows
        n_buckets, bad_ids, bad = self._bad_bucket_state()
        lh = self._narrow_side("left")
        rh = self._narrow_side("right")
        if bad_ids is not None:
            if not bad_ids:
                # equal-tables fast path; cached so repeat calls don't re-run
                # the digest comparison
                self._diff_rows = lh.select(*self.pk).limit(0).withColumn(
                    "diff_type", F.lit(None).cast("string")
                )
                return self._diff_rows
            lh = lh.filter(in_list("__bucket", bad_ids))
            rh = rh.filter(in_list("__bucket", bad_ids))
        elif bad is not None:
            lh = lh.join(F.broadcast(bad), "__bucket", "left_semi")
            rh = rh.join(F.broadcast(bad), "__bucket", "left_semi")
        # else: heavy drift — restriction skipped, clean rows hash-equal
        # and drop out of the diff join below (see _bad_bucket_state)
        lh = lh.select(*self.pk, F.col("__row_hash").alias("l_hash"))
        rh = rh.select(*self.pk, F.col("__row_hash").alias("r_hash"))
        joined = lh.join(rh, self.pk, "full_outer")
        diff_type = (
            F.when(F.col("r_hash").isNull(), F.lit("missing_in_right"))
            .when(F.col("l_hash").isNull(), F.lit("extra_in_right"))
            .when(F.col("l_hash") != F.col("r_hash"), F.lit("modified"))
        )
        self._diff_rows = (
            joined.withColumn("diff_type", diff_type)
            .filter(F.col("diff_type").isNotNull())
            .select(*self.pk, "diff_type")
        )
        if bad_ids is not None:
            # bounded drift (IN-list form): the narrow (pk, diff_type) frame
            # is drift-sized, and every consumer fan-out (summary, fix-SQL,
            # reconcile, column_drift's key collect, CLI's composed flags)
            # otherwise re-executes the drill-down join per action — persist
            # it with the same session-lifetime contract as the bad-bucket
            # state. Heavy-drift forms (frame / restriction-skip) stay lazy:
            # their diff is not size-bounded.
            self._diff_rows = self._diff_rows.persist()
        return self._diff_rows

    def _diff_rows_multiset(self) -> DataFrame:
        """exceptAll-style multiset diff keyed by whole-row hash.

        Returns (__row_hash, diff_type, __n) where __n is the multiplicity
        delta; used when PKs are absent or duplicated (SURVEY.md §7 hard
        parts). The reserved ``__n`` name keeps the weight column from ever
        colliding with a user PK column in :meth:`summary`.
        """
        fr = self.options.float_round
        l = (
            self.left.select(row_hash(self.left, self.compare_cols, fr).alias("__row_hash"))
            .groupBy("__row_hash")
            .agg(F.count(F.lit(1)).alias("l_cnt"))
        )
        r = (
            self.right.select(row_hash(self.right, self.compare_cols, fr).alias("__row_hash"))
            .groupBy("__row_hash")
            .agg(F.count(F.lit(1)).alias("r_cnt"))
        )
        joined = l.join(r, "__row_hash", "full_outer").select(
            "__row_hash",
            F.coalesce("l_cnt", F.lit(0)).alias("l_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
        missing = joined.filter(F.col("l_cnt") > F.col("r_cnt")).select(
            "__row_hash",
            F.lit("missing_in_right").alias("diff_type"),
            (F.col("l_cnt") - F.col("r_cnt")).alias("__n"),
        )
        extra = joined.filter(F.col("r_cnt") > F.col("l_cnt")).select(
            "__row_hash",
            F.lit("extra_in_right").alias("diff_type"),
            (F.col("r_cnt") - F.col("l_cnt")).alias("__n"),
        )
        return missing.unionByName(extra)

    # -- column-level drill-down (B8 refinement) ---------------------------
    def column_drift(self) -> DataFrame:
        """Per-column mismatch counts among 'modified' rows: which columns
        drive the drift.

        The reference's drill-down (and :meth:`diff_rows`) says *which rows*
        disagree; when diagnosing replication drift the next question is
        *which columns* — a type-mapping bug drifts one column everywhere, a
        lost-update race drifts many columns on few rows. Returns
        ``(column_name string, mismatch_rows bigint)``, one row per non-PK
        compare column.

        Inequality is evaluated on :func:`canonical_value` forms — exactly
        the normalization ``row_hash`` applies (integral widening, -0.0
        folding, declared ``float_round``) — so these counts always
        reconcile with the row-level verdicts: every 'modified' row has ≥1
        mismatching column here, and no unmodified row is counted.

        Scale: with a single integer PK and a bounded diff, both sides are
        retrieved by ``pk IN (modified pks)`` pushed into the parquet scan
        — row-group pruning on pk-clustered files, and the join input is
        exactly the modified rows rather than the chunk_size-amplified
        bad-bucket rows (a hash bucket drags in ~chunk_size rows per
        drifted one). Otherwise both sides fall back to the mismatched-
        bucket restriction (the same bounded bad-bucket set the row
        drill-down uses — never a broadcast ∝ diff rows), then inner-join
        on PK. Agreeing pairs contribute 0 to every count and unpaired
        rows (missing/extra) drop out of the inner join, so neither form
        changes the counts: the restriction is purely a cost bound.
        Shuffled bytes ∝ drift, never table size.
        """
        if not self.pk or self.options.force_multiset:
            # a duplicated PK would cross-product in the pairing join and
            # inflate every count — the exact hazard multiset mode declares
            raise ValueError(
                "column_drift requires a unique primary key "
                "(multiset diffs do not pair rows)"
            )
        pk = set(self.pk)
        cols = [c for c in self.compare_cols if c not in pk]
        if not cols:
            return self.spark.createDataFrame(
                [], "column_name string, mismatch_rows bigint"
            )
        fr = self.options.float_round
        ltypes = {f.name: f.dataType for f in self.left.schema.fields}
        rtypes = {f.name: f.dataType for f in self.right.schema.fields}
        lsrc = rsrc = None
        # pk-IN retrieval only when (a) the bad state is the bounded
        # IN-list form — there the diff frame is persisted (drift-sized;
        # see diff_rows) so collecting the modified keys is a cache read —
        # AND (b) some consumer already computed the diff (the CLI's
        # composed flow runs the summary first; sharing its materialized
        # frame makes this retrieval strictly cheaper than the bucket
        # join). A standalone column_drift keeps the bucket-restriction
        # shape: materializing the drill-down solely to learn the keys
        # measured SLOWER than the restriction it would replace (sf1
        # in-regime: 1.45 s vs 1.22 s, PERFORMANCE.md round-8).
        _, bad_ids, _ = self._bad_bucket_state()
        if len(self.pk) == 1 and bad_ids and self._diff_rows is not None:
            mod = self.diff_rows().filter(F.col("diff_type") == "modified")
            ids = self._bounded_pushdown_keys(mod, self.pk[0])
            if ids is not None:
                pred = in_list(
                    self.pk[0], ids, mod.schema[self.pk[0]].dataType
                )
                lsrc, rsrc = self.left.filter(pred), self.right.filter(pred)
        if lsrc is None:
            lsrc = self._restrict_to_bad_buckets(self.left)
            rsrc = self._restrict_to_bad_buckets(self.right)
        lrows = lsrc.select(
            *self.pk,
            *[
                canonical_value(F.col(c), ltypes[c], fr).alias(f"__l_{c}")
                for c in cols
            ],
        )
        rrows = rsrc.select(
            *self.pk,
            *[
                canonical_value(F.col(c), rtypes[c], fr).alias(f"__r_{c}")
                for c in cols
            ],
        )
        paired = lrows.join(rrows, self.pk)
        counts = paired.agg(
            *[
                F.coalesce(
                    F.sum(
                        F.when(
                            ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(c)
                for c in cols
            ]
        )
        stack_args = ", ".join(f"'{c}', `{c}`" for c in cols)
        return counts.select(
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS (column_name, mismatch_rows)"
            )
        )

    # -- verdict (B9/B11) ----------------------------------------------------
    def summary(self) -> DataFrame:
        """One-row summary: (table, structure_ok, upcount, downcount, equivalent).

        Mirrors the per-table ``summary.txt`` fields the reference report
        extracts (``step3_run_syncdiff.sh:204-229``).
        """
        struct_ok = self.structure_ok()
        if self.options.check_struct_only:
            return self.spark.createDataFrame(
                [(self.table_name, struct_ok, 0, 0, struct_ok)],
                "table string, structure_ok boolean, upcount bigint, "
                "downcount bigint, equivalent boolean",
            )
        diff = self.diff_rows()
        # Weight by multiplicity exactly when the multiset path produced the
        # diff — same predicate diff_rows() branches on. Never sniff column
        # names: a keyed compare whose PK happens to be called "n"/"__n"
        # must not have its key values summed as weights.
        is_multiset = self.options.force_multiset or not self.pk
        n = F.col("__n") if is_multiset else F.lit(1)
        agg = diff.agg(
            F.coalesce(
                F.sum(F.when(F.col("diff_type") != "extra_in_right", n)), F.lit(0)
            ).alias("upcount"),
            F.coalesce(
                F.sum(F.when(F.col("diff_type") != "missing_in_right", n)), F.lit(0)
            ).alias("downcount"),
        )
        return agg.select(
            F.lit(self.table_name).alias("table"),
            F.lit(struct_ok).alias("structure_ok"),
            F.col("upcount").cast("bigint").alias("upcount"),
            F.col("downcount").cast("bigint").alias("downcount"),
            (
                F.lit(struct_ok) & (F.col("upcount") == 0) & (F.col("downcount") == 0)
            ).alias("equivalent"),
        )


def compare_tables(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    pk: list[str] | None,
    options: CompareOptions = CompareOptions(),
    table_name: str = "table",
) -> TableCompare:
    """Entry point: plan a comparison of two DataFrames.

    Null PK values (impossible against TiDB, whose PKs are NOT NULL, but
    possible on arbitrary parquet) have defined semantics: identical
    null-key rows cancel in the algebraic digest and compare equivalent; a
    modified null-key row cannot pair with itself in the drill-down's
    full-outer join and is reported as missing_in_right + extra_in_right —
    a delete+insert repair, which is what an update means in UPCOUNT/
    DOWNCOUNT terms (pinned by
    tests/test_edge_cases.py::test_null_pk_rows_have_defined_semantics).
    """
    return TableCompare(spark, left, right, pk, options, table_name)
