"""Cross-batch sequence tracking for apply_changes (r09 verdict #2):
``track_seq=True`` persists each key's APPLIED sequence — live rows in
a reserved ``__seq`` payload column, deleted keys as retention-bounded
tombstones in a manifest-referenced ``_cdc_state/`` side file — and
ignores changes at or below it, so out-of-order CDC feeds converge
(DLT's APPLY CHANGES semantics).

Invariants driven here:
- a late-arriving batch with stale lower-seq rows cannot regress a
  live row through apply_changes (MOR and COW) or the apply_key sink;
- a stale upsert cannot resurrect a deleted key within the tombstone
  retention window; past the window the re-apply is documented;
- replaying an already-applied batch is a version-preserving no-op
  independent of the streaming markers;
- randomized model: batches applied in SHUFFLED order converge to the
  per-key greatest-sequence winner;
- expire() collects state dirs only when no retained manifest
  references them.
"""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, w long, _op string, seq long")


def _table(spark, path, **kw):
    return SnapshotTable(spark, str(path), stats_columns=["k"], **kw)


@pytest.mark.parametrize("mor", [True, False])
def test_stale_update_does_not_regress_row(spark, tmp_path, mor):
    t = _table(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(1, 100, "U", 10), (2, 200, "U", 10)]),
        "k", seq_col="seq", track_seq=True, mor=mor,
    )
    v = t.apply_changes(
        _batch(spark, [(1, 999, "U", 5)]),  # late batch, lower seq
        "k", seq_col="seq", track_seq=True, mor=mor,
    )
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == {1: 100, 2: 200}
    assert v == t.current_version()  # all-stale batch: clean no-op
    # a genuinely newer change still applies
    t.apply_changes(
        _batch(spark, [(1, 111, "U", 11)]),
        "k", seq_col="seq", track_seq=True, mor=mor,
    )
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got[1] == 111
    # the applied sequence rides the reserved __seq payload column
    seqs = {r["k"]: r["__seq"] for r in t.read().select("k", "__seq").collect()}
    assert seqs == {1: 11, 2: 10}


@pytest.mark.parametrize("mor", [True, False])
def test_stale_upsert_cannot_resurrect_deleted_key(spark, tmp_path, mor):
    t = _table(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(1, 100, "U", 1), (2, 200, "U", 1)]),
        "k", seq_col="seq", track_seq=True, mor=mor,
    )
    t.apply_changes(
        _batch(spark, [(1, None, "D", 10)]),
        "k", seq_col="seq", track_seq=True, mor=mor,
    )
    assert sorted(r["k"] for r in t.read().collect()) == [2]
    # tombstone recorded in the manifest-referenced state dir
    m = t._manifest(t.current_version())
    assert m.get("seq_state")
    # late upsert below the delete's sequence: ignored
    t.apply_changes(
        _batch(spark, [(1, 999, "U", 5)]),
        "k", seq_col="seq", track_seq=True, mor=mor,
    )
    assert sorted(r["k"] for r in t.read().collect()) == [2]
    # a NEWER upsert resurrects the key and retires its tombstone
    t.apply_changes(
        _batch(spark, [(1, 111, "U", 11)]),
        "k", seq_col="seq", track_seq=True, mor=mor,
    )
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == {1: 111, 2: 200}
    assert t._manifest(t.current_version()).get("seq_state") is None


def test_replay_of_applied_batch_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    batch = _batch(spark, [(1, 100, "U", 1), (2, None, "D", 1), (3, 300, "U", 2)])
    t.apply_changes(batch, "k", seq_col="seq", track_seq=True)
    v = t.current_version()
    # replay (crash-recovery shape): every change is at its applied
    # sequence -> stale -> no commit, no duplicate rows
    assert t.apply_changes(batch, "k", seq_col="seq", track_seq=True) == v
    assert t.current_version() == v
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == {1: 100, 3: 300}


def test_tombstone_retention_window(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(1, 100, "U", 1)]),
        "k", seq_col="seq", track_seq=True,
    )
    # retention 0: the delete's tombstone ages out immediately
    t.apply_changes(
        _batch(spark, [(1, None, "D", 10)]),
        "k", seq_col="seq", track_seq=True,
    )
    import time

    time.sleep(0.05)
    # beyond the window a stale upsert re-applies — the documented
    # trade (size the window past the feed's max disorder)
    t.apply_changes(
        _batch(spark, [(1, 999, "U", 5)]),
        "k", seq_col="seq", track_seq=True, tombstone_retention_sec=0.0,
    )
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == {1: 999}


def test_track_seq_validation(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="requires seq_col"):
        t.apply_changes(
            _batch(spark, [(1, 1, "U", 1)]), "k", track_seq=True
        )
    with pytest.raises(ValueError, match="NULL 'seq'"):
        t.apply_changes(
            _batch(spark, [(1, 1, "U", None)]),
            "k", seq_col="seq", track_seq=True,
        )
    reserved = spark.createDataFrame(
        [(1, 1, "U", 1, 9)], "k long, w long, _op string, seq long, __seq long"
    )
    with pytest.raises(ValueError, match="reserved"):
        t.apply_changes(reserved, "k", seq_col="seq", track_seq=True)


def test_untracked_rows_accept_any_sequenced_change(spark, tmp_path):
    """Rows written by non-tracked paths have NULL __seq and never
    block a sequenced change."""
    t = _table(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(1, 100), (2, 200)], "k long, w long"))
    t.apply_changes(
        _batch(spark, [(1, 111, "U", 1)]),
        "k", seq_col="seq", track_seq=True,
    )
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == {1: 111, 2: 200}


def test_randomized_shuffled_batches_converge(spark, tmp_path):
    """Batches applied in SHUFFLED order converge to the per-key
    greatest-sequence winner — the property untracked apply_changes
    cannot give (its cross-batch ordering is the caller's contract)."""
    import random

    rng = random.Random(9)
    t = _table(spark, tmp_path / "t")
    t.append(
        spark.createDataFrame([(k, k * 10) for k in range(20)], "k long, w long")
    )
    seq = 0
    batches = []
    changes = []  # (k, w, op, seq) global log
    for _ in range(5):
        rows = []
        for k in rng.sample(range(30), rng.randint(3, 8)):
            seq += 1
            if rng.random() < 0.3:
                rows.append((k, None, "D", seq))
            else:
                rows.append((k, k * 1000 + seq, "U", seq))
        changes.extend(rows)
        batches.append(rows)
    rng.shuffle(batches)  # out-of-order DELIVERY across batches
    for rows in batches:
        t.apply_changes(
            _batch(spark, rows), "k", seq_col="seq", track_seq=True
        )
    model = {k: k * 10 for k in range(20)}
    for k, w, op, _s in sorted(changes, key=lambda c: c[3]):
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = w
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == model


def test_expire_collects_unreferenced_seq_state(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(1, 100, "U", 1)]), "k", seq_col="seq", track_seq=True
    )
    t.apply_changes(
        _batch(spark, [(1, None, "D", 2)]), "k", seq_col="seq", track_seq=True
    )
    t.apply_changes(
        _batch(spark, [(2, None, "D", 3)]), "k", seq_col="seq", track_seq=True
    )
    import os

    state_root = tmp_path / "t" / "_cdc_state"
    assert len(os.listdir(state_root)) == 2  # one consolidated dir per delete
    live = t._manifest(t.current_version())["seq_state"]
    t.expire(keep_last=1, orphan_grace_seconds=0)
    left = {f"{t.root}/_cdc_state/{n}" for n in os.listdir(state_root)}
    assert left == {live}  # released dir collected, referenced kept
    # the surviving state still gates a stale change
    t.apply_changes(
        _batch(spark, [(1, 999, "U", 1)]), "k", seq_col="seq", track_seq=True
    )
    assert t.read().count() == 0


def test_streaming_apply_sink_track_seq(spark, tmp_path):
    """The apply_key streaming sink with track_seq: a foreachBatch
    delivery that replays (same batch id) AND a stale lower-seq change
    in a later batch both leave the table at the winner state."""
    t = _table(spark, tmp_path / "t")
    sink = t.streaming_sink(
        str(tmp_path / "ckpt"), apply_key="k", seq_col="seq", track_seq=True
    )
    sink(_batch(spark, [(1, 100, "U", 10), (2, 200, "U", 10)]), 0)
    sink(_batch(spark, [(1, 100, "U", 10), (2, 200, "U", 10)]), 0)  # replay
    sink(_batch(spark, [(1, 999, "U", 5), (2, None, "D", 11)]), 1)
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == {1: 100}


def test_concurrent_tracked_applies_serialize(spark, tmp_path):
    """Two racing tracked applies over DISJOINT keys: the tombstone
    side file is swapped in the same CAS commit, so the loser's
    consolidation (computed against the old state) must NOT silently
    overwrite the winner's — it conflicts and re-runs cleanly, and
    both batches' tombstones survive in the final state."""
    import threading

    from collective_als_spark.sources.logstore import CommitConflict

    t = _table(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(1, 100, "U", 1), (2, 200, "U", 1)]),
        "k", seq_col="seq", track_seq=True,
    )
    barrier = threading.Barrier(2)
    errs = []

    def applier(rows):
        try:
            barrier.wait()
            try:
                t.apply_changes(
                    _batch(spark, rows), "k", seq_col="seq", track_seq=True
                )
            except CommitConflict:
                # documented contract: a seq-state race re-runs the apply
                t.apply_changes(
                    _batch(spark, rows), "k", seq_col="seq", track_seq=True
                )
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    a = [(1, None, "D", 5)]
    b = [(2, None, "D", 5)]
    threads = [threading.Thread(target=applier, args=(r,)) for r in (a, b)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert t.read().count() == 0  # both deletes landed
    # BOTH tombstones gate their stale upserts (neither was lost)
    t.apply_changes(
        _batch(spark, [(1, 999, "U", 3), (2, 999, "U", 3)]),
        "k", seq_col="seq", track_seq=True,
    )
    assert t.read().count() == 0


def test_restore_reverts_seq_state_with_data(spark, tmp_path):
    """RESTORE rolls the tombstone state back WITH the data (both are
    snapshot state): after restoring to the pre-delete version the key
    is live again and gated by its own restored __seq, not by the
    rolled-back delete's tombstone."""
    t = _table(spark, tmp_path / "t")
    t.apply_changes(
        _batch(spark, [(1, 100, "U", 3)]), "k", seq_col="seq", track_seq=True
    )
    v_live = t.current_version()
    t.apply_changes(
        _batch(spark, [(1, None, "D", 10)]), "k", seq_col="seq", track_seq=True
    )
    assert t._manifest(t.current_version()).get("seq_state")
    t.restore(v_live)
    assert t._manifest(t.current_version()).get("seq_state") is None
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == {1: 100}
    # the restored row's own applied seq still gates (seq 3), the
    # rolled-back delete's seq 10 does not
    t.apply_changes(
        _batch(spark, [(1, 111, "U", 2)]), "k", seq_col="seq", track_seq=True
    )
    assert {r["k"]: r["w"] for r in t.read().collect()} == {1: 100}
    t.apply_changes(
        _batch(spark, [(1, 222, "U", 4)]), "k", seq_col="seq", track_seq=True
    )
    assert {r["k"]: r["w"] for r in t.read().collect()} == {1: 222}


def test_applied_keys_broadcast_gate_is_byte_aware(spark, tmp_path):
    """r10 ADVICE: the tracked-apply applied-keys relations must use
    the merge paths' BYTE-aware broadcast gate, not row count alone —
    a small number of very wide string keys can exceed the byte budget
    and must not be force-broadcast."""
    t = SnapshotTable(
        spark,
        str(tmp_path / "t"),
        stats_columns=["k"],
        merge_broadcast_max_keys=1000,
        merge_broadcast_max_bytes=2_000,
    )
    narrow = spark.createDataFrame([(i,) for i in range(50)], "k long")
    assert t._key_broadcast_ok(narrow, ["k"], 50) is True
    # 50 keys x ~1KB strings ≈ 50KB >> 2KB budget: refused despite
    # passing the count gate
    wide = spark.createDataFrame(
        [("x" * 1000 + str(i),) for i in range(50)], "k string"
    )
    assert t._key_broadcast_ok(wide, ["k"], 50) is False
    # count gate still applies on its own
    assert t._key_broadcast_ok(narrow, ["k"], 5000) is False


def test_tracked_apply_wide_keys_converge_without_broadcast(spark, tmp_path):
    """End-to-end: wide string keys past the byte budget still gate
    stale batches correctly — the plan just uses a shuffle join
    instead of a forced broadcast."""
    t = SnapshotTable(
        spark,
        str(tmp_path / "t"),
        stats_columns=["w"],
        merge_broadcast_max_bytes=100,
    )
    key = lambda i: "k" * 200 + str(i)
    t.append(
        spark.createDataFrame([(key(i), i) for i in range(8)], "k string, w long")
    )

    def batch(rows):
        return spark.createDataFrame(rows, "k string, w long, _op string, seq long")

    t.apply_changes(
        batch([(key(0), 999, "U", 10), (key(1), None, "D", 10)]),
        "k", seq_col="seq", track_seq=True,
    )
    # stale low-seq batch: regression + resurrection both gate out
    t.apply_changes(
        batch([(key(0), 111, "U", 5), (key(1), 222, "U", 5)]),
        "k", seq_col="seq", track_seq=True,
    )
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got[key(0)] == 999 and key(1) not in got
    assert len(got) == 7
