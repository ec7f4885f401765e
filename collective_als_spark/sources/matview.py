"""Incremental materialized views over the snapshot table's change
feed.

The 100 TB problem: a rollup (`SELECT keys, sum(..), count(..) GROUP
BY keys`) over a fact table that receives appends / upserts / deletes
all day. Recomputing it per refresh costs a full table scan; the
incremental-view-maintenance result (classic delta rules for
SUM/COUNT aggregates: Gupta & Mumick, "Maintenance of Materialized
Views: Problems, Techniques, and Applications", IEEE DE Bulletin
1995 — public literature) is that the NEW view state is a pure
function of the OLD state and the row-level delta:

    state' = groupBy(keys)( state  ∪  signed_delta )

where each change-feed row contributes ``+measure`` on insert and
``-measure`` on delete (an upsert is its delete+insert pair, which is
exactly what :meth:`SnapshotTable.changes` emits). Cost per refresh:
O(|view| + |delta|) — the fact table is NEVER rescanned, and the
change feed itself only opens files added/removed/DV-changed between
the two versions.

MIN/MAX are NOT self-maintainable under deletes (retracting the
current minimum says nothing about the runner-up), so they use the
standard two-tier rule: inserts fold for free
(``least(old_min, inserted_min)``), and only groups the delta
DELETED FROM are recomputed — one fact scan restricted by a
broadcast semi-join on the dirty keys, so filter pushdown (and
group-key clustering) bounds it to the touched groups' files, not
the table. Insert-only refreshes never touch the fact table.

Consistency comes from two pins:

- the refresh reads the source at an explicit VERSION (no torn view
  of a table being committed to), and
- the "which source version this view reflects" watermark is stored
  as a batch marker INSIDE the view table's own manifest, committed
  in the SAME atomic manifest write as the refreshed state — a crash
  can never land between "state visible" and "watermark advanced",
  so a replayed refresh is a no-op, never a double-apply; a RACING
  refresher fails its expected-marker check and conflicts instead of
  double-applying.

Float sums accumulate in a different order than a recompute would —
views that must be bit-identical to a recompute should aggregate
integers or decimals (the tests do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collective_als_spark.sources.layout import SnapshotTable

_WATERMARK = "mv:src_version"
_COUNT_COL = "n_rows"


class IncrementalAggView:
    """A SUM/COUNT/MIN/MAX group-by over a :class:`SnapshotTable`,
    maintained incrementally from its change feed.

    ``sums`` / ``mins`` / ``maxs`` map output column -> source SQL
    expression (any expression over the fact columns). The view
    always carries ``n_rows`` (the group's live row count); a group
    whose count reaches zero is dropped, so the view's key set always
    equals the recompute's.

    The view state is itself a :class:`SnapshotTable` (under
    ``root``), so refreshes are atomic versioned commits, readers pin
    a snapshot, and the view's own history is time-travelable.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        root: str,
        group_by: list[str],
        sums: dict[str, str] | None = None,
        mins: dict[str, str] | None = None,
        maxs: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.source = source
        self.group_by = list(group_by)
        self.sums = dict(sums or {})
        self.mins = dict(mins or {})
        self.maxs = dict(maxs or {})
        if not (self.sums or self.mins or self.maxs):
            raise ValueError("view needs at least one measure")
        out_cols = [*self.sums, *self.mins, *self.maxs]
        if len(set(out_cols)) != len(out_cols):
            raise ValueError("duplicate output column across measures")
        if _COUNT_COL in out_cols or _COUNT_COL in group_by:
            raise ValueError(f"{_COUNT_COL!r} is reserved for the view's count")
        self.table = SnapshotTable(spark, root)

    # -- internals

    @property
    def _measure_cols(self) -> list[str]:
        return [*self.sums, *self.mins, *self.maxs, _COUNT_COL]

    def _full_agg(self, df: DataFrame) -> DataFrame:
        """The defining query: plain aggregate of live rows."""
        aggs = [F.sum(F.expr(e)).alias(o) for o, e in self.sums.items()]
        aggs += [F.min(F.expr(e)).alias(o) for o, e in self.mins.items()]
        aggs += [F.max(F.expr(e)).alias(o) for o, e in self.maxs.items()]
        aggs.append(F.count(F.lit(1)).alias(_COUNT_COL))
        return df.groupBy(*self.group_by).agg(*aggs)

    def last_source_version(self) -> int:
        """The source version the current view state reflects
        (0 = never materialized)."""
        return self.table._current_markers().get(_WATERMARK, 0)

    def _dirty_fact_scan(self, src_v: int, dirty: DataFrame) -> DataFrame:
        """The fact rows the MIN/MAX partial recompute reads. For a
        single group key that is one of the source's ``stats_columns``,
        the scan is a MANIFEST-PRUNED banded read over the dirty keys'
        [min, max] (plus the IS NULL file set when a NULL-keyed group
        is dirty, via the per-file null counts) — so with the fact
        table clustered on the group key, only the dirty groups' FILES
        are opened, which is the claim r05 verdict #8 asked to pin.
        Composite keys / unindexed keys fall back to the full snapshot
        scan. Exactness never depends on this: the caller's null-safe
        semi join restricts rows either way, and the banded read is a
        superset of the dirty groups' rows by construction. An empty
        dirty set short-circuits to a zero-file empty frame."""
        if (
            len(self.group_by) == 1
            and self.group_by[0] in self.source.stats_columns
        ):
            key = self.group_by[0]
            b = dirty.agg(
                F.min(key).alias("lo"),
                F.max(key).alias("hi"),
                F.sum(F.col(key).isNull().cast("int")).alias("n_null"),
            ).first()
            has_null = (b["n_null"] or 0) > 0
            if b["lo"] is not None:
                fact = self.source.read(
                    version=src_v, where=(key, b["lo"], b["hi"])
                )
                if has_null:
                    fact = fact.unionByName(
                        self.source.read(version=src_v, where_null=(key, True))
                    )
                return fact
            if has_null:  # every dirty group is the NULL-keyed one
                return self.source.read(version=src_v, where_null=(key, True))
            # dirty set empty: no group lost an extremum — read nothing
            # (the FALSE filter folds to an empty relation, no files)
            return self.source.read(version=src_v).filter(F.lit(False))
        return self.source.read(version=src_v)

    # -- public API

    def refresh(self) -> int:
        """Advance the view to the source's current version.

        First call materializes from a full (version-pinned) scan;
        every later call reads ONLY ``source.changes(last, now)``:
        SUM/COUNT fold as signed contributions, MIN/MAX fold inserts
        and partially recompute just the delete-touched groups.
        Returns the source version the view now reflects. No source
        commits since the last refresh -> pure no-op (no view
        commit)."""
        src_v = self.source.current_version()
        last = self.last_source_version()
        if src_v == last:
            return last
        if last == 0:
            state = self._full_agg(self.source.read(version=src_v))
        else:
            delta = self.source.changes(last, src_v)
            sign = F.when(
                F.col("_change_type") == "insert", F.lit(1)
            ).otherwise(F.lit(-1))
            ins = F.col("_change_type") == "insert"
            aggs = [
                F.sum(F.expr(e) * sign).alias(o) for o, e in self.sums.items()
            ]
            # inserts fold into min/max; delete rows contribute NULL
            # here and mark their group dirty below
            aggs += [
                F.min(F.when(ins, F.expr(e))).alias(o)
                for o, e in self.mins.items()
            ]
            aggs += [
                F.max(F.when(ins, F.expr(e))).alias(o)
                for o, e in self.maxs.items()
            ]
            aggs.append(F.sum(sign).alias(_COUNT_COL))
            signed = delta.groupBy(*self.group_by).agg(*aggs)
            # old state re-enters the same fold as a +1 contribution;
            # one shuffle of |view| + |delta-groups| rows, fact table
            # untouched (for SUM/COUNT; MIN/MAX inserts too)
            merged = (
                self.table.read()
                .unionByName(signed)
                .groupBy(*self.group_by)
                .agg(
                    *[F.sum(o).alias(o) for o in self.sums],
                    *[F.min(o).alias(o) for o in self.mins],
                    *[F.max(o).alias(o) for o in self.maxs],
                    F.sum(_COUNT_COL).alias(_COUNT_COL),
                )
                .filter(F.col(_COUNT_COL) > 0)
            )
            if self.mins or self.maxs:
                # partial recompute: ONLY groups the window deleted
                # from can have lost their extremum. Broadcast
                # semi-join restricts the fact scan to those keys —
                # at scale the pushed filter (+ clustering on the
                # group key) prunes to the touched groups' files.
                # Both joins use NULL-SAFE key equality (<=>): groupBy
                # treats NULL as a real group, so a NULL-keyed group
                # that loses its extremum must be restricted to and
                # fixed like any other — plain `=` would never match
                # it and the view would keep the stale MIN/MAX.
                dirty = (
                    delta.filter(~ins).select(*self.group_by).distinct()
                )

                def _ns_cond(left, right):
                    cond = F.lit(True)
                    for k in self.group_by:
                        cond = cond & left[k].eqNullSafe(right[k])
                    return cond

                fact = self._dirty_fact_scan(src_v, dirty).alias("__mv_f")
                dirty_b = F.broadcast(dirty.alias("__mv_d"))
                fixes = self._full_agg(
                    fact.join(dirty_b, _ns_cond(fact, dirty_b), "left_semi")
                ).select(
                    *self.group_by,
                    *[
                        F.col(o).alias(f"__fix_{o}")
                        for o in [*self.mins, *self.maxs]
                    ],
                    F.lit(True).alias("__dirty"),
                )
                m = merged.alias("__mv_m")
                fixes_b = F.broadcast(fixes.alias("__mv_x"))
                merged = m.join(fixes_b, _ns_cond(m, fixes_b), "left").select(
                    *[m[k] for k in self.group_by],
                    *[m[o] for o in self.sums],
                    *[
                        F.when(
                            F.col("__dirty").isNotNull(),
                            F.col(f"__fix_{o}"),
                        )
                        .otherwise(m[o])
                        .alias(o)
                        for o in [*self.mins, *self.maxs]
                    ],
                    m[_COUNT_COL],
                )
            state = merged
        # conditional commit: if another refresher advanced the
        # watermark after we read state/delta, our fold is stale —
        # lose the race (CommitConflict) instead of double-applying
        self.table.overwrite(
            state.select(*self.group_by, *self._measure_cols),
            _markers={_WATERMARK: src_v},
            _expect_markers={_WATERMARK: last},
        )
        return src_v

    def read(self) -> DataFrame:
        """Current view state: group keys, measure columns, ``n_rows``."""
        return self.table.read()

    def recompute(self, version: int | None = None) -> DataFrame:
        """The view's defining query run from scratch against the
        source (at ``version`` or current) — the correctness oracle
        the incremental path must equal."""
        return self._full_agg(self.source.read(version=version)).select(
            *self.group_by, *self._measure_cols
        )
