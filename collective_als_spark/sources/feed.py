"""Durable incremental consumption of a snapshot table's change feed.

The pipeline shape at 100 TB: a fact table receives commits all day;
N independent downstream jobs (feature builders, index maintainers,
replicators) each want "every row-level change exactly once, in
commit order, resumable after a crash" — without the source table
knowing or caring who consumes it (Delta CDF + a streaming
checkpoint, Kafka's consumer-group offset, same idea).

:class:`ChangeFeedReader` is that cursor: ``poll()`` returns the net
changes between the last COMMITTED position and the source's current
version, ``commit()`` durably advances the position. The position
lives in a tiny JSON the consumer owns (written atomically through
the same LogStore abstraction the table's manifests use, so it can
sit on HDFS/S3 next to the consumer's output), NOT in the source
table — consumers never write to the table they read, and any number
of them proceed independently at their own pace.

Delivery semantics: at-least-once by construction — a crash between
processing and ``commit()`` replays the same delta, and the delta for
a (from, to] window is deterministic (manifest file diff + deletion-
vector diff), so replays are identical, making downstream idempotence
easy. A consumer that lands its output in another
:class:`SnapshotTable` upgrades to exactly-once by committing the
position as a batch marker INSIDE its own output commit instead
(the pattern ``IncrementalAggView`` uses); this reader is the
loosely-coupled variant for outputs without transactional markers.

Retention contract: ``poll()`` needs the FROM version's manifest to
still exist. ``expire`` on the source must keep at least the window
the slowest consumer may lag (same rule as Delta CDF / Kafka
retention); a consumer that falls behind retention gets a clear
error rather than silently skipping changes.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.logstore import logstore_for


class FeedLagError(RuntimeError):
    """The consumer's position predates the source's retained history."""


class FeedCursorError(RuntimeError):
    """The cursor state file exists but is unreadable. Both LogStores
    write the cursor atomically (tmp + replace/rename), so this means
    external corruption, not a crash window. Recoverable: delete the
    state file to replay from genesis (at-least-once semantics make
    that safe for idempotent consumers), or rewrite it with a known
    position."""


class ChangeFeedReader:
    """A named, durable cursor over ``table.changes``.

    ``state_path`` is the consumer's position file (any LogStore
    scheme). One reader instance per consumer; multiple consumers =
    multiple state paths.
    """

    def __init__(self, table: SnapshotTable, state_path: str):
        self.table = table
        self.state_path = state_path
        self.log = logstore_for(table.spark, state_path)

    def position(self) -> int:
        """Last committed source version (0 = consume from genesis)."""
        try:
            raw = self.log.read_text(self.state_path)
        except FileNotFoundError:
            return 0
        try:
            return int(json.loads(raw)["version"])
        except (ValueError, KeyError, TypeError) as e:
            raise FeedCursorError(
                f"cursor state at {self.state_path} is unreadable ({e}); "
                f"delete it to replay from genesis or rewrite it with a "
                f"known position"
            ) from e

    def poll(self, per_commit: bool = False) -> tuple[DataFrame, int] | None:
        """(changes, to_version) since the committed position, or None
        when the consumer is caught up. The changes frame is the net
        row-level delta with ``_change_type`` (insert/delete) — an
        upsert arrives as its delete+insert pair; deletion-vector
        deletes surface as deletes. Process it, land the output, then
        ``commit(to_version)``; crash before commit -> the identical
        delta is returned again.

        ``per_commit=True`` returns the per-commit form instead
        (``changes_by_version``): every change carries its
        ``_commit_version``, and intra-window churn is NOT netted —
        for consumers that replay commit-by-commit."""
        frm = self.position()
        to = self.table.current_version()
        if to <= frm:
            return None
        if frm > 0 and not self.table.log.exists(
            self.table._manifest_path(frm)
        ):
            raise FeedLagError(
                f"position v{frm} was expired from {self.table.root}; "
                f"changes since then are unrecoverable — re-seed the "
                f"consumer from a full snapshot read"
            )
        if per_commit:
            # the per-commit form opens EVERY manifest in the window
            # (the netted form only needs the endpoints) — a missing
            # intermediate means the attribution is unrecoverable, so
            # fail with the same clear lag error, not FileNotFoundError
            missing = [
                v
                for v in range(max(frm, 1), to + 1)
                if not self.table.log.exists(self.table._manifest_path(v))
            ]
            if missing:
                raise FeedLagError(
                    f"per-commit replay needs manifest v{missing[0]} "
                    f"which was expired from {self.table.root}; use the "
                    f"netted poll() or re-seed from a snapshot read"
                )
            return self.table.changes_by_version(frm, to), to
        return self.table.changes(frm, to), to

    def commit(self, version: int) -> None:
        """Durably advance the cursor. Monotonic: rewinding would
        replay deltas downstream already acknowledged. Bounded above by
        the table's current version: committing a position the table
        has not reached would silently skip every change between the
        real position and the bogus one once the table catches up."""
        cur = self.position()
        if version < cur:
            raise ValueError(
                f"cursor moves forward only (committed v{cur}, got v{version})"
            )
        head = self.table.current_version()
        if version > head:
            raise ValueError(
                f"cannot commit v{version}: {self.table.root} is at "
                f"v{head} — commit only the to_version poll() returned"
            )
        self.log.write_text(self.state_path, json.dumps({"version": version}))
