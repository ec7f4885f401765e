"""Column DEFAULT values (r13 verdict missing #2): a table property
filled at write time for columns the batch OMITS on the INSERT-family
writers (append / INSERT INTO / CTAS / overwrite / WAP); explicit
values — including explicit NULLs — always win (the difference from
GENERATED ALWAYS AS). MERGE/apply_changes inserts keep Delta's MERGE
rule (unassigned columns are NULL), and survivor/compaction rewrites
never backfill.

Reference parity: Delta Lake default column values
(``delta.feature.allowColumnDefaults``) — the reference Scala repo has
no lake tier; parity target is the public Delta behavior."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def _rows(spark, lo, n, with_status=True):
    if with_status:
        return spark.createDataFrame(
            [(lo + i, f"s{i}") for i in range(n)], "k long, status string"
        )
    return spark.createDataFrame([(lo + i,) for i in range(n)], "k long")


def test_default_fills_omitted_column_only(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 3))
    v = t.set_column_default("status", "'pending'")
    assert v == 2
    # a batch OMITTING the column gets the default, not NULL
    t.append(_rows(spark, 10, 2, with_status=False))
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[10] == "pending" and got[11] == "pending"
    # existing rows are untouched
    assert got[0] == "s0"
    # a batch CARRYING the column wins — even explicit NULLs
    t.append(
        spark.createDataFrame(
            [(20, None)], "k long, status string"
        )
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[20] is None
    # drop: future omitting writes go back to NULL-padding
    t.drop_column_default("status")
    t.append(_rows(spark, 30, 1, with_status=False))
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[30] is None
    # the dropped-default write and the defaulted write coexist in
    # history: time travel preserves both
    assert {
        r["k"]: r["status"] for r in t.read(version=3).collect()
    }[10] == "pending"


def test_default_cast_to_declared_type_and_expression_defaults(
    spark, tmp_path
):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(
        spark.createDataFrame([(1, 5.0)], "k long, amount double")
    )
    # an int literal casts to the declared double at fill time
    t.set_column_default("amount", "42")
    t.append(spark.createDataFrame([(2,)], "k long"))
    got = dict(t.read().collect())
    assert got[2] == 42.0 and isinstance(got[2], float)
    # a foldable EXPRESSION default works (Delta allows these)
    t.drop_column_default("amount")
    t.set_column_default("amount", "cast(6 AS double) * 7")
    t.append(spark.createDataFrame([(3,)], "k long"))
    assert dict(t.read().collect())[3] == 42.0


def test_default_error_shapes(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 2))
    # column references are refused (defaults must be self-contained)
    with pytest.raises(ValueError, match="self-contained"):
        t.set_column_default("status", "k + 1")
    with pytest.raises(ValueError, match="self-contained"):
        t.set_column_default("status", "not ) sql")
    # unknown column refused on a schema-carrying table
    with pytest.raises(ValueError, match="not a table column"):
        t.set_column_default("nope", "'x'")
    with pytest.raises(ValueError, match="no default on column"):
        t.drop_column_default("status")
    # generated / identity columns cannot also carry a default,
    # and vice versa
    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.add_generated_column("y", "k * 2")
    with pytest.raises(ValueError, match="GENERATED"):
        t2.set_column_default("y", "1")
    t3 = SnapshotTable(spark, str(tmp_path / "t3"))
    t3.add_identity_column("rid")
    with pytest.raises(ValueError, match="IDENTITY"):
        t3.set_column_default("rid", "1")
    t4 = SnapshotTable(spark, str(tmp_path / "t4"))
    t4.set_column_default("d", "'x'")
    with pytest.raises(ValueError, match="DEFAULT"):
        t4.add_generated_column("d", "k * 2")
    with pytest.raises(ValueError, match="DEFAULT"):
        t4.add_identity_column("d")


def test_default_rides_every_insert_family_writer(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 4))
    t.set_column_default("status", "'filled'")
    narrow = _rows(spark, 100, 4, with_status=False)
    t.append_clustered(narrow, cluster_by=["k"], n_files=2)
    t.append_bucketed(_rows(spark, 200, 4, with_status=False), "k", 2)
    t.append_transformed(
        _rows(spark, 300, 4, with_status=False), "k", "truncate", 100
    )
    t.wap_commit(
        _rows(spark, 400, 2, with_status=False),
        checks=[{"kind": "not_null", "column": "k"}],
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    for k in (100, 200, 300, 400):
        assert got[k] == "filled", k
    # overwrite: the replacing batch fills too, and the default
    # SURVIVES the overwrite (governance, like checks)
    t.overwrite(_rows(spark, 500, 2, with_status=False))
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got == {500: "filled", 501: "filled"}
    t.append(_rows(spark, 600, 1, with_status=False))
    assert {r["k"]: r["status"] for r in t.read().collect()}[600] == "filled"


def test_default_merge_inserts_fill_survivors_never_backfill(
    spark, tmp_path
):
    """The contract is PRUNING-INVARIANT: merge INSERTs omitting a
    default column fill it (whether the planner routes them through
    append or the candidate-rewrite stage), while rewrites of EXISTING
    narrow rows (merge survivors, update, compaction) never
    backfill."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 4, with_status=False))  # narrow history
    t.append(_rows(spark, 10, 2))                    # wide batch
    t.set_column_default("status", "'filled'")
    # key 50 is outside every file's band -> the no-candidate APPEND
    # route; key 0 matches -> the candidate-rewrite route. Two clauses:
    # INSERT (k) omits status (fills), INSERT (k, status) is explicit.
    src = spark.createDataFrame(
        [(50, "z"), (60, "z"), (0, "z")], "k long, status string"
    )
    src.createOrReplaceTempView("defaults_src")
    snapshot_sql(
        spark,
        f"MERGE INTO '{t.root}' AS tg USING defaults_src AS s "
        f"ON tg.k = s.k "
        f"WHEN MATCHED THEN UPDATE SET status = s.status "
        f"WHEN NOT MATCHED AND s.k = 60 THEN "
        f"INSERT (k, status) VALUES (s.k, 'explicit') "
        f"WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[50] == "filled"
    assert got[60] == "explicit"
    assert got[0] == "z"  # matched update took the source value
    # the narrow survivors were rewritten by the merge commit where
    # they shared candidate files — still NULL, never backfilled
    for k in (1, 2, 3):
        assert got[k] is None, k
    # plain upsert merge: a source omitting the column fills on its
    # NEW row versions (it replaces matched rows wholesale, SET *)
    t.merge(spark.createDataFrame([(70,)], "k long"), "k")
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[70] == "filled"
    # UPDATE of a narrow row leaves the omitted column NULL
    t.update_where("k = 1", set={"k": "k + 1000"})
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[1001] is None
    # compaction rewrites preserve NULLs (no backfill)
    t.compact(target_rows_per_file=1000)
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[1001] is None and got[2] is None


def test_default_sql_surface_and_detail(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 2))
    snapshot_sql(
        spark,
        f"ALTER TABLE '{t.root}' ALTER COLUMN status SET DEFAULT "
        f"'via_sql'",
    )
    snapshot_sql(
        spark,
        f"INSERT INTO '{t.root}' SELECT CAST(9 AS LONG) AS k",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[9] == "via_sql"
    detail = snapshot_sql(spark, f"DESCRIBE DETAIL '{t.root}'").first()
    assert detail["column_defaults"] == "status DEFAULT 'via_sql'"
    snapshot_sql(
        spark, f"ALTER TABLE '{t.root}' ALTER COLUMN status DROP DEFAULT"
    )
    snapshot_sql(
        spark,
        f"INSERT INTO '{t.root}' SELECT CAST(10 AS LONG) AS k",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[10] is None


def test_default_survives_restore(spark, tmp_path):
    """Governance follows the table, not the snapshot: RESTORE to a
    pre-default version keeps the CURRENT default contract."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 2))                      # v1
    t.set_column_default("status", "'kept'")          # v2
    t.append(_rows(spark, 10, 1, with_status=False))  # v3
    t.restore(1)                                      # v4: data of v1
    assert t.read().count() == 2
    t.append(_rows(spark, 20, 1, with_status=False))
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[20] == "kept"


def test_default_keyword_in_update_and_merge(spark, tmp_path):
    """The explicit DEFAULT keyword (r14): ``SET c = DEFAULT`` and
    ``INSERT ... VALUES (..., DEFAULT)`` resolve to the stored
    default (SQL-standard NULL when none is declared)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 3))
    t.set_column_default("status", "'dflt'")
    snapshot_sql(
        spark,
        f"UPDATE '{t.root}' SET status = DEFAULT WHERE k = 0",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[0] == "dflt" and got[1] == "s1"
    # no declared default -> SQL-standard NULL
    t.drop_column_default("status")
    snapshot_sql(
        spark,
        f"UPDATE '{t.root}' SET status = DEFAULT WHERE k = 1",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[1] is None
    # MERGE: matched SET ... = DEFAULT and INSERT VALUES (..., DEFAULT)
    t.set_column_default("status", "'dflt2'")
    spark.createDataFrame(
        [(2,), (50,)], "k long"
    ).createOrReplaceTempView("dflt_kw_src")
    snapshot_sql(
        spark,
        f"MERGE INTO '{t.root}' AS tg USING dflt_kw_src AS s "
        f"ON tg.k = s.k "
        f"WHEN MATCHED THEN UPDATE SET status = DEFAULT "
        f"WHEN NOT MATCHED THEN INSERT (k, status) "
        f"VALUES (s.k, DEFAULT)",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[2] == "dflt2" and got[50] == "dflt2"
