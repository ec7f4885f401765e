"""GENERATED ALWAYS AS columns (r12 verdict #5): declared as a table
property, COMPUTED when a write omits them, explicit conflicting
values REJECTED at the staging audit, recomputed on UPDATE paths, and
— for supported monotone transforms — implied pruning conjuncts on
reads and predicate DML (Delta's generated-column partition pruning).

Reference parity: Delta Lake generated columns (delta.io docs) —
the reference Scala repo has no lake tier; parity target is the
public Delta behavior, like the rest of sources/layout.py."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def _events(spark, lo, n, month):
    return spark.createDataFrame(
        [(lo + i, f"2021-{month:02d}-{(i % 27) + 1:02d} 10:00:00")
         for i in range(n)],
        "k long, ts_s string",
    ).select(
        "k", F.to_timestamp("ts_s").alias("ts")
    )


def test_generated_compute_and_enforce(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    # declare BEFORE the first write (Delta's create-time rule)
    v = t.add_generated_column("y", "year(ts)")
    assert v == 1
    t.append(_events(spark, 0, 5, 1))  # batch omits y -> computed
    assert {r["y"] for r in t.read().collect()} == {2021}
    # explicit MATCHING values pass
    t.append(_events(spark, 10, 3, 2).withColumn("y", F.year("ts")))
    assert t.read().count() == 8
    # explicit CONFLICTING values are rejected; version unchanged
    before = t.current_version()
    with pytest.raises(ValueError, match="__generated_y"):
        t.append(_events(spark, 20, 2, 3).withColumn("y", F.lit(1999)))
    assert t.current_version() == before
    # duplicate declaration / unknown drops refused
    with pytest.raises(ValueError, match="already exists"):
        t.add_generated_column("y", "year(ts)")
    with pytest.raises(ValueError, match="no such generated"):
        t.drop_generated_column("nope")
    # late declaration on a non-empty table: self-reference refused at
    # declare (r14 finding #1 — before any scan), violating definition
    # refused, absent column refused; a SATISFIED existing column
    # round-trips through drop + re-add
    with pytest.raises(ValueError, match="may reference only non-generated"):
        t.add_generated_column("k", "k + 1")
    with pytest.raises(ValueError, match="violate"):
        t.add_generated_column("k", "CAST(-1 AS BIGINT)")
    with pytest.raises(ValueError, match="without the column"):
        t.add_generated_column("brand_new", "k * 2")
    t.drop_generated_column("y")
    assert t.add_generated_column("y", "year(ts)") > before
    # drop: future writes stop computing/validating
    t.drop_generated_column("y")
    v2 = t.append(_events(spark, 30, 1, 4).withColumn("y", F.lit(1999)))
    assert t.current_version() == v2


def test_generated_recompute_on_update_paths(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.add_generated_column("d", "to_date(ts)")
    t.append(_events(spark, 0, 4, 1))
    # SET on a generated column is refused (Delta's rule)
    with pytest.raises(ValueError, match="GENERATED"):
        t.update_where("k = 1", set={"d": "DATE '1999-01-01'"})
    # updating the BASE column recomputes the derivation
    t.update_where("k = 1", set={"ts": "timestamp'2022-06-05 00:00:00'"})
    got = {r["k"]: str(r["d"]) for r in t.read().collect()}
    assert got[1] == "2022-06-05" and got[0].startswith("2021-01")
    # merge with a source omitting the generated column computes it
    src = _events(spark, 100, 2, 7)
    t.merge(src, "k")
    got = {r["k"]: str(r["d"]) for r in t.read().collect()}
    assert got[100].startswith("2021-07")
    # merge_when: SET on generated refused; update recomputes
    with pytest.raises(ValueError, match="GENERATED"):
        t.merge_when(
            src, "k",
            matched=[(None, "update", {"d": "DATE '1999-01-01'"})],
        )
    t.merge_when(
        spark.createDataFrame(
            [(100, "2023-02-03 00:00:00")], "k long, ts_s string"
        ).select("k", F.to_timestamp("ts_s").alias("ts")),
        "k",
        matched=[(None, "update", {"ts": "s.ts"})],
        not_matched=[None],
    )
    got = {r["k"]: str(r["d"]) for r in t.read().collect()}
    assert got[100] == "2023-02-03"
    # conditional INSERT column lists must omit generated columns
    with pytest.raises(ValueError, match="INSERT column list"):
        t.merge_when(
            src, "k",
            not_matched=[(None, {"k": "s.k", "d": "DATE '1999-01-01'"})],
        )


def test_generated_column_implied_pruning(spark, tmp_path):
    """The hidden-partition-suite mirror: stats live ONLY on the
    generated date column, yet a band predicate on the raw TIMESTAMP
    prunes files — the monotone transform implies d in [T(lo), T(hi)]
    (lossy conjunct, prove-out only)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["d"])
    t.add_generated_column("d", "to_date(ts)")
    for month in (1, 2, 3):
        t.append(_events(spark, month * 100, 10, month).coalesce(1))
    files = t._manifest(t.current_version())["files"]
    assert len(files) == 3
    # read with a band on ts: only March's file is opened
    march = t.read(
        where="ts >= '2021-03-01' AND ts < '2021-04-01'"
    )
    assert len(march.inputFiles()) == 1
    assert march.count() == 10
    # exact equality with the full scan's filter (pruning is prove-out)
    full = t.read().filter(
        (F.col("ts") >= "2021-03-01") & (F.col("ts") < "2021-04-01")
    )
    assert march.count() == full.count()
    # predicate DML: only January's file is rewritten (the bound is
    # mid-month — a boundary-day bound keeps the next file as a
    # conservative candidate, since T(lo/hi) endpoints are non-strict)
    before = set(t._manifest(t.current_version())["files"])
    t.delete_where("ts < '2021-01-20'")
    after = set(t._manifest(t.current_version())["files"])
    assert len(before & after) == 2  # Feb + Mar untouched by path
    assert t.read().count() == 20
    # a NON-monotone definition implies nothing (month extraction):
    # pruning silently degrades to full-candidate, results stay exact
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), stats_columns=["m"])
    t2.add_generated_column("m", "month(ts)")
    for month in (1, 2):
        t2.append(_events(spark, month * 100, 5, month).coalesce(1))
    got = t2.read(where="ts >= '2021-02-01'")
    assert got.count() == 5
    assert len(got.inputFiles()) == 2  # no unsound month-proof


def test_generated_sql_surface(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    snapshot_sql(
        spark,
        f"ALTER TABLE '{t.root}' ADD COLUMN y GENERATED ALWAYS AS "
        f"(year(ts))",
    )
    t.append(_events(spark, 0, 3, 5))
    assert {r["y"] for r in t.read().collect()} == {2021}
    detail = SnapshotTable(spark, t.root).detail().first()
    assert detail["generated_columns"] == "y AS (year(ts))"
    snapshot_sql(spark, f"ALTER TABLE '{t.root}' DROP GENERATED COLUMN y")
    assert SnapshotTable(spark, t.root)._table_generated() == {}
    # the definition survives RESTORE (governance follows the table)
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), stats_columns=["k"])
    t2.add_generated_column("y", "year(ts)")
    t2.append(_events(spark, 0, 2, 1))
    t2.append(_events(spark, 10, 2, 2))
    t2.restore(2)
    assert SnapshotTable(spark, t2.root)._table_generated() == {
        "y": "year(ts)"
    }
    t2.append(_events(spark, 20, 1, 3))  # still computed post-restore
    assert {r["y"] for r in t2.read().collect()} == {2021}


def test_generated_cross_reference_guards(spark, tmp_path):
    """r14 verdict finding #1, the Python-API layer: declare-time
    refusal of generated-on-generated in BOTH directions, of
    self-reference, and of generated-on-identity — before any write
    can hit the order-dependent fill."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([], "a int, g1 int, g2 int, rid bigint")
    )
    t.add_generated_column("g1", "a + 1")
    # forward: new expression references an existing generated column
    with pytest.raises(
        ValueError, match="may reference only non-generated"
    ):
        t.add_generated_column("g2", "g1 * 2")
    # self-reference
    with pytest.raises(
        ValueError, match="may reference only non-generated"
    ):
        t.add_generated_column("g2", "g2 + 1")
    # new expression references an identity column
    t.add_identity_column("rid")
    with pytest.raises(
        ValueError, match="may reference only non-generated"
    ):
        t.add_generated_column("g2", "rid + 1")
    # reverse: making a column generated/identity when an EXISTING
    # generated expression references it
    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([], "a int, b int, g int"))
    t2.add_generated_column("g", "b * 2")
    with pytest.raises(ValueError, match="drop 'g'"):
        t2.add_generated_column("b", "a + 1")
    with pytest.raises(ValueError, match="drop 'g'"):
        t2.add_identity_column("b")
    # the referenced plain column still writes and g still computes
    t2.append(spark.createDataFrame([(1, 5)], "a int, b int"))
    assert t2.read().select("g").first()["g"] == 10
