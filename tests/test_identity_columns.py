"""GENERATED ALWAYS AS IDENTITY columns (r13, the counter half of the
r12-verdict generated-column surface): the TABLE assigns monotonic
unique values from a manifest-carried high-water mark; explicit values
are refused; concurrent assigning writers conflict cleanly on the
claimed range; the counter survives RESTORE and never rewinds.

Reference parity: Delta Lake identity columns, including Delta's own
documented MERGE restriction (matched rows would need target-id
carry), which this engine ships as guided refusals."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.logstore import CommitConflict
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def _batch(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )


def test_identity_assign_and_continue(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    assert t.add_identity_column("rid") == 1
    t.append(_batch(spark, 0, 10).repartition(4))
    ids = sorted(r["rid"] for r in t.read().collect())
    # a single batch consumes exactly [1, 10] (contiguous range, any
    # row order); the column is a real long column
    assert ids == list(range(1, 11))
    assert dict(t.read().dtypes)["rid"] == "bigint"
    # the next batch CONTINUES from the high-water mark
    t.append(_batch(spark, 100, 5))
    ids2 = sorted(r["rid"] for r in t.read().collect())
    assert ids2 == list(range(1, 16))
    # custom start/step
    s = SnapshotTable(spark, str(tmp_path / "s"), stats_columns=["k"])
    s.add_identity_column("rid", start=100, step=5)
    s.append(_batch(spark, 0, 4))
    assert sorted(r["rid"] for r in s.read().collect()) == [
        100, 105, 110, 115,
    ]
    # negative step counts down
    d = SnapshotTable(spark, str(tmp_path / "d"), stats_columns=["k"])
    d.add_identity_column("rid", start=0, step=-2)
    d.append(_batch(spark, 0, 3))
    assert sorted(r["rid"] for r in d.read().collect()) == [-4, -2, 0]


def test_identity_refusals(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.add_identity_column("rid")
    t.append(_batch(spark, 0, 3))
    # explicit values refused (the GENERATED ALWAYS form)
    with pytest.raises(ValueError, match="IDENTITY"):
        t.append(_batch(spark, 10, 2).withColumn("rid", F.lit(99)))
    # SET on identity refused
    with pytest.raises(ValueError, match="IDENTITY"):
        t.update_where("k = 1", set={"rid": "99"})
    # merge-family refused with guidance (Delta's own restriction)
    src = _batch(spark, 1, 2)
    with pytest.raises(NotImplementedError, match="IDENTITY"):
        t.merge(src, "k")
    with pytest.raises(NotImplementedError, match="IDENTITY"):
        t.merge_mor(src, "k")
    with pytest.raises(NotImplementedError, match="IDENTITY"):
        t.merge_when(src, "k", matched=[(None, "update_all", None)])
    with pytest.raises(NotImplementedError, match="IDENTITY"):
        t.apply_changes(src.withColumn("_op", F.lit("U")), "k")
    # ...but INSERT-only merges route through append and WORK
    t.merge_insert_only(_batch(spark, 2, 3), "k")  # k=2 exists; 3,4 new
    rows = {r["k"]: r["rid"] for r in t.read().collect()}
    assert len(rows) == 5 and len(set(rows.values())) == 5
    assert rows[0] in (1, 2, 3)  # original ids kept
    # conditional insert-only merge_when takes the probe+append path
    t.merge_when(
        _batch(spark, 3, 3), "k", not_matched=[("s.v >= 0", None)]
    )
    rows = {r["k"]: r["rid"] for r in t.read().collect()}
    assert len(rows) == 6 and len(set(rows.values())) == 6
    # update/delete of OTHER columns still work (rows keep their ids)
    before = dict(rows)
    t.update_where("k = 0", set={"v": "-1"})
    after = {r["k"]: r["rid"] for r in t.read().collect()}
    assert after == before
    # declare-time refusals
    with pytest.raises(ValueError, match="non-zero"):
        t.add_identity_column("rid2", step=0)
    with pytest.raises(ValueError, match="already exists"):
        t.add_identity_column("rid")
    with pytest.raises(ValueError, match="without the column"):
        t.add_identity_column("brand_new")
    g = SnapshotTable(spark, str(tmp_path / "g"), stats_columns=["k"])
    g.add_generated_column("y", "k + 1")
    with pytest.raises(ValueError, match="GENERATED expression"):
        g.add_identity_column("y")


def test_identity_concurrent_claim_conflicts(spark, tmp_path):
    """A writer that assigned ids from a stale high-water mark must
    LOSE its commit (CommitConflict), never land colliding ids."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.add_identity_column("rid")
    t.append(_batch(spark, 0, 5))  # consumes [1, 5], next = 6
    stale = {"rid": {"start": 1, "step": 1, "next": 1}}
    real = t._table_identity
    t._table_identity = lambda: stale  # the writer's stale read
    try:
        with pytest.raises(CommitConflict, match="identity"):
            t.append(_batch(spark, 100, 3))
    finally:
        t._table_identity = real
    # nothing landed; a clean retry assigns from the fresh mark
    assert t.read().count() == 5
    t.append(_batch(spark, 100, 3))
    assert sorted(r["rid"] for r in t.read().collect()) == list(range(1, 9))


def test_identity_survives_restore_and_never_rewinds(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.add_identity_column("rid")
    t.append(_batch(spark, 0, 3))   # v2: ids 1..3
    v2 = t.current_version()
    t.append(_batch(spark, 10, 3))  # v3: ids 4..6
    t.restore(v2)
    # the counter did NOT rewind: new rows never reuse 4..6
    t.append(_batch(spark, 20, 2))
    ids = sorted(r["rid"] for r in t.read().collect())
    assert ids == [1, 2, 3, 7, 8]
    # late declaration on a non-empty table syncs past the max
    u = SnapshotTable(spark, str(tmp_path / "u"), stats_columns=["k"])
    u.append(
        spark.createDataFrame([(1, 40), (2, 17)], "k long, rid long")
    )
    u.add_identity_column("rid")
    u.append(_batch(spark, 5, 2).drop("v"))
    ids = sorted(r["rid"] for r in u.read().collect())
    assert ids == [17, 40, 41, 42]


def test_identity_sql_surface(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    snapshot_sql(
        spark,
        f"ALTER TABLE '{t.root}' ADD COLUMN rid GENERATED ALWAYS AS "
        f"IDENTITY (START WITH 1000 INCREMENT BY 10)",
    )
    _batch(spark, 0, 3).createOrReplaceTempView("sql_ident_src")
    snapshot_sql(
        spark, f"INSERT INTO '{t.root}' SELECT * FROM sql_ident_src"
    )
    assert sorted(r["rid"] for r in t.read().collect()) == [
        1000, 1010, 1020,
    ]
    detail = SnapshotTable(spark, t.root).detail().first()
    assert detail["identity_columns"] == "rid (start 1000 step 10 next 1030)"
    snapshot_sql(spark, f"ALTER TABLE '{t.root}' DROP IDENTITY COLUMN rid")
    assert SnapshotTable(spark, t.root)._table_identity() == {}
    # post-drop writes stop assigning (and must carry the column now)
    t2 = SnapshotTable(spark, t.root, stats_columns=["k"])
    t2.append(_batch(spark, 10, 1).withColumn("rid", F.lit(0)))
    assert t2.read().count() == 4
