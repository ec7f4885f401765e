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

Consistency comes from two pins:

- the refresh reads the source at an explicit VERSION (no torn view
  of a table being committed to), and
- the "which source version this view reflects" watermark is stored
  as a batch marker INSIDE the view table's own manifest, committed
  in the SAME atomic manifest write as the refreshed state — a crash
  can never land between "state visible" and "watermark advanced",
  so a replayed refresh is a no-op, never a double-apply.

SUM/COUNT (and AVG = SUM/COUNT at read) are the self-maintainable
aggregates; MIN/MAX are not under deletes (a deleted minimum forces a
rescan of its group) and are intentionally not offered here. Float
sums accumulate in a different order than a recompute would — views
that must be bit-identical to a recompute should aggregate integers
or decimals (the tests do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collective_als_spark.sources.layout import SnapshotTable

_WATERMARK = "mv:src_version"
_COUNT_COL = "n_rows"


class IncrementalAggView:
    """A SUM/COUNT group-by over a :class:`SnapshotTable`, maintained
    incrementally from its change feed.

    ``sums`` maps output column -> source SQL expression (any
    expression over the fact columns — it is evaluated per change row
    and signed). The view always carries ``n_rows`` (the group's live
    row count); a group whose count reaches zero is dropped, so the
    view's key set always equals the recompute's.

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
        sums: dict[str, str],
    ):
        if _COUNT_COL in sums or _COUNT_COL in group_by:
            raise ValueError(f"{_COUNT_COL!r} is reserved for the view's count")
        self.spark = spark
        self.source = source
        self.group_by = list(group_by)
        self.sums = dict(sums)
        self.table = SnapshotTable(spark, root)

    # -- internals

    def _signed_agg(self, df: DataFrame, sign) -> DataFrame:
        """Group the (change) rows with each measure multiplied by the
        per-row sign: +1 contributes, -1 retracts."""
        aggs = [
            F.sum(F.expr(expr) * sign).alias(out)
            for out, expr in self.sums.items()
        ]
        aggs.append(F.sum(sign).alias(_COUNT_COL))
        return df.groupBy(*self.group_by).agg(*aggs)

    def last_source_version(self) -> int:
        """The source version the current view state reflects
        (0 = never materialized)."""
        return self.table._current_markers().get(_WATERMARK, 0)

    # -- public API

    def refresh(self) -> int:
        """Advance the view to the source's current version.

        First call materializes from a full (version-pinned) scan;
        every later call reads ONLY ``source.changes(last, now)`` and
        folds the signed delta into the existing state with one
        view-sized aggregate. Returns the source version the view now
        reflects. No source commits since the last refresh -> pure
        no-op (no view commit)."""
        src_v = self.source.current_version()
        last = self.last_source_version()
        if src_v == last:
            return last
        if last == 0:
            state = self._signed_agg(
                self.source.read(version=src_v), F.lit(1)
            ).filter(F.col(_COUNT_COL) > 0)
        else:
            delta = self.source.changes(last, src_v)
            sign = F.when(
                F.col("_change_type") == "insert", F.lit(1)
            ).otherwise(F.lit(-1))
            signed = self._signed_agg(delta, sign)
            # old state re-enters the same fold as a +1 contribution;
            # one shuffle of |view| + |delta-groups| rows, fact table
            # untouched
            merged = (
                self.table.read()
                .unionByName(signed)
                .groupBy(*self.group_by)
                .agg(
                    *[F.sum(out).alias(out) for out in self.sums],
                    F.sum(_COUNT_COL).alias(_COUNT_COL),
                )
                .filter(F.col(_COUNT_COL) > 0)
            )
            state = merged
        # conditional commit: if another refresher advanced the
        # watermark after we read state/delta, our fold is stale —
        # lose the race (CommitConflict) instead of double-applying
        self.table.overwrite(
            state,
            _markers={_WATERMARK: src_v},
            _expect_markers={_WATERMARK: last},
        )
        return src_v

    def read(self) -> DataFrame:
        """Current view state: group keys, sum columns, ``n_rows``."""
        return self.table.read()

    def recompute(self, version: int | None = None) -> DataFrame:
        """The view's defining query run from scratch against the
        source (at ``version`` or current) — the correctness oracle
        the incremental path must equal."""
        df = self.source.read(version=version)
        return self._signed_agg(df, F.lit(1)).filter(F.col(_COUNT_COL) > 0)
