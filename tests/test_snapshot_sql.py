"""SQL DML dispatcher (r10 verdict #6): ``snapshot_sql(spark, "DELETE
FROM '<root>' WHERE ...")`` parses verb + clauses and delegates to the
SnapshotTable verbs — every statement must round-trip to the exact
Python-API result, including the mixed-precedence predicates the
analyzer now handles and the NULL discipline the verbs own."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def _orders(spark):
    rows = [
        (1, "cancelled", "EU", 10.0),
        (2, "cancelled", "US", 20.0),
        (3, "cancelled", "JP", 30.0),
        (4, "open", "EU", 40.0),
        (5, None, "EU", 50.0),
        (6, "cancelled", None, 60.0),
        (7, "open", None, 70.0),
    ]
    return spark.createDataFrame(
        rows, "id long, status string, region string, amount double"
    )


def _pair(spark, tmp_path):
    a = SnapshotTable(spark, str(tmp_path / "sql"), stats_columns=["id"])
    b = SnapshotTable(spark, str(tmp_path / "api"), stats_columns=["id"])
    a.append(_orders(spark))
    b.append(_orders(spark))
    return a, b


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_sql_delete_matches_api_with_nulls_and_precedence(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    pred = "status = 'cancelled' AND region IN ('EU', 'US') OR id = 7"
    v = snapshot_sql(spark, f"DELETE FROM '{a.root}' WHERE {pred}")
    b.delete_where(pred)
    assert _rows(a) == _rows(b)
    assert v == a.current_version()
    # alias-qualified columns delegate cleanly
    a2 = SnapshotTable(spark, str(tmp_path / "sql2"), stats_columns=["id"])
    a2.append(_orders(spark))
    snapshot_sql(spark, f"DELETE FROM '{a2.root}' AS t WHERE t.id >= 6")
    assert sorted(r["id"] for r in a2.read().collect()) == [1, 2, 3, 4, 5]


def test_sql_delete_without_where_empties_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    snapshot_sql(spark, f"DELETE FROM '{t.root}'")
    assert t.read().count() == 0
    assert t.read(version=1).count() == 7  # time travel intact


def test_sql_update_matches_api(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    snapshot_sql(
        spark,
        f"UPDATE '{a.root}' SET amount = amount * 10, region = 'XX' "
        f"WHERE status = 'cancelled' AND amount < 25",
    )
    b.update_where(
        "status = 'cancelled' AND amount < 25",
        set={"amount": "amount * 10", "region": "'XX'"},
    )
    assert _rows(a) == _rows(b)
    # NULL-predicate rows carried unchanged (3VL owned by the verb)
    got = {r["id"]: r["amount"] for r in a.read().collect()}
    assert got[1] == 100.0 and got[5] == 50.0


def test_sql_merge_upsert_matches_api(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "reopened", "US", 99.0), (8, "new", "EU", 80.0)],
        "id long, status string, region string, amount double",
    )
    src.createOrReplaceTempView("sqldml_updates")
    snapshot_sql(
        spark,
        f"MERGE INTO '{a.root}' AS t USING sqldml_updates AS s "
        f"ON t.id = s.id "
        f"WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    b.merge(src, "id")
    assert _rows(a) == _rows(b)
    assert a.read().count() == 8


def test_sql_merge_subquery_source_and_insert_only(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "dup", "EU", 0.0), (9, "new", "JP", 90.0)],
        "id long, status string, region string, amount double",
    )
    src.createOrReplaceTempView("sqldml_feed")
    snapshot_sql(
        spark,
        f"MERGE INTO '{a.root}' t "
        f"USING (SELECT * FROM sqldml_feed WHERE amount >= 0) s "
        f"ON (t.id = s.id) WHEN NOT MATCHED THEN INSERT *",
    )
    # id=1 already exists: insert-only must NOT replace it
    got = {r["id"]: r["status"] for r in a.read().collect()}
    assert got[1] == "cancelled" and got[9] == "new"
    assert a.read().count() == 8
    assert _rows(b) != _rows(a)  # sanity: b untouched


def test_sql_merge_matched_delete(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    src = spark.createDataFrame([(2,), (5,), (99,)], "id long")
    src.createOrReplaceTempView("sqldml_dels")
    snapshot_sql(
        spark,
        f"MERGE INTO '{a.root}' t USING sqldml_dels s ON t.id = s.id "
        f"WHEN MATCHED THEN DELETE",
    )
    assert sorted(r["id"] for r in a.read().collect()) == [1, 3, 4, 6, 7]


def test_sql_insert_into_select(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    _orders(spark).createOrReplaceTempView("sqldml_ins")
    snapshot_sql(
        spark,
        f"INSERT INTO '{t.root}' SELECT id + 100 AS id, status, region, "
        f"amount FROM sqldml_ins WHERE id <= 2",
    )
    assert sorted(r["id"] for r in t.read().collect()) == [
        1, 2, 3, 4, 5, 6, 7, 101, 102,
    ]


def test_sql_error_shapes(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    with pytest.raises(ValueError, match="quoted string"):
        snapshot_sql(spark, "DELETE FROM sometable WHERE id = 1")
    with pytest.raises(NotImplementedError, match="unsupported MERGE"):
        _orders(spark).createOrReplaceTempView("sqldml_bad")
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' t USING sqldml_bad s ON t.id = s.id "
            f"WHEN MATCHED THEN UPDATE SET amount = 0",
        )
    with pytest.raises(NotImplementedError, match="same-named"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' t USING sqldml_bad s ON t.id = s.region "
            f"WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="SET"):
        snapshot_sql(spark, f"UPDATE '{t.root}' WHERE id = 1")
    # the table is untouched by every refused statement
    assert t.read().count() == 7 and t.current_version() == 1


def test_sql_utility_statements(spark, tmp_path):
    """VACUUM / OPTIMIZE / RESTORE / ALTER TABLE / DESCRIBE round-trip
    to the maintenance verbs."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    snapshot_sql(spark, f"DELETE FROM '{t.root}' WHERE id <= 2")
    # ALTER: rename + check constraint lifecycle
    snapshot_sql(spark, f"ALTER TABLE '{t.root}' RENAME COLUMN amount TO amt")
    assert "amt" in t.read().columns
    snapshot_sql(
        spark, f"ALTER TABLE '{t.root}' ADD CONSTRAINT amt_pos CHECK (amt > 0)"
    )
    with pytest.raises(Exception, match="amt_pos"):
        t.append(
            spark.createDataFrame(
                [(99, "x", "EU", -5.0)],
                "id long, status string, region string, amt double",
            )
        )
    snapshot_sql(spark, f"ALTER TABLE '{t.root}' DROP CONSTRAINT amt_pos")
    # OPTIMIZE partial folds the small commits; FULL rewrites
    v = snapshot_sql(spark, f"OPTIMIZE '{t.root}' TARGET 1000 ROWS FULL")
    assert v == t.current_version()
    m = t._manifest(v)
    assert len(m["files"]) == 1
    # RESTORE back to v1 (pre-delete), auditable as a new commit
    snapshot_sql(spark, f"RESTORE '{t.root}' TO VERSION AS OF 1")
    assert t.read().count() == 7
    assert "amount" in t.read().columns  # names travel with manifests
    # DESCRIBE surfaces the verbs' frames
    hist = snapshot_sql(spark, f"DESCRIBE HISTORY '{t.root}'")
    assert hist.count() == t.current_version()
    detail = snapshot_sql(spark, f"DESCRIBE DETAIL '{t.root}'")
    assert detail.count() == 1
    # VACUUM: DRY RUN deletes nothing; RETAIN 0 HOURS collects the
    # pre-restore versions' unreferenced files
    n_dry = snapshot_sql(spark, f"VACUUM '{t.root}' RETAIN 0 HOURS DRY RUN")
    assert n_dry > 0
    assert t.read().count() == 7
    n = snapshot_sql(spark, f"VACUUM '{t.root}' RETAIN 0 HOURS")
    assert n == n_dry
    assert t.read().count() == 7  # head untouched
    with pytest.raises(Exception):
        t.read(version=2)  # expired
    with pytest.raises(ValueError, match="OPTIMIZE needs"):
        snapshot_sql(spark, f"OPTIMIZE '{t.root}'")
    with pytest.raises(NotImplementedError, match="ALTER TABLE"):
        snapshot_sql(spark, f"ALTER TABLE '{t.root}' ADD COLUMN x INT")


def test_sql_select_over_snapshot_roots(spark, tmp_path):
    """SELECT/WITH statements: quoted roots after FROM/JOIN resolve
    through the batch DataSource — joins, CTEs, time travel, and
    untouched string literals."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    snapshot_sql(spark, f"DELETE FROM '{t.root}' WHERE id >= 6")
    dim = SnapshotTable(spark, str(tmp_path / "dim"), stats_columns=["region"])
    dim.append(
        spark.createDataFrame(
            [("EU", "europe"), ("US", "america"), ("JP", "asia")],
            "region string, continent string",
        )
    )
    got = snapshot_sql(
        spark,
        f"SELECT o.id, d.continent FROM '{t.root}' o "
        f"JOIN '{dim.root}' d ON o.region = d.region "
        f"WHERE o.status = 'cancelled' ORDER BY o.id",
    )
    assert [(r["id"], r["continent"]) for r in got.collect()] == [
        (1, "europe"), (2, "america"), (3, "asia"),
    ]
    # time travel reads the pre-delete version
    tt = snapshot_sql(
        spark,
        f"SELECT count(*) AS n FROM '{t.root}' VERSION AS OF 1",
    )
    assert tt.first()["n"] == 7
    # CTE + string literal containing FROM stays a literal
    cte = snapshot_sql(
        spark,
        f"WITH c AS (SELECT id, 'FROM' AS tag FROM '{t.root}') "
        f"SELECT count(*) AS n FROM c WHERE tag = 'FROM'",
    )
    assert cte.first()["n"] == 5


def test_sql_ctas_and_insert_overwrite(spark, tmp_path):
    _orders(spark).createOrReplaceTempView("sqldml_ctas_src")
    root = str(tmp_path / "ctas")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' AS SELECT id, amount FROM sqldml_ctas_src "
        f"WHERE id <= 3",
        stats_columns=["id"],
    )
    t = SnapshotTable(spark, root, stats_columns=["id"])
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]
    # CTAS refuses an existing table
    with pytest.raises(ValueError, match="already holds"):
        snapshot_sql(
            spark, f"CREATE TABLE '{root}' AS SELECT 1 AS id, 2.0 AS amount"
        )
    # INSERT OVERWRITE resets data (and may reshape schema); time
    # travel still shows the CTAS version
    snapshot_sql(
        spark,
        f"INSERT OVERWRITE '{root}' SELECT id AS k FROM sqldml_ctas_src "
        f"WHERE id >= 6",
    )
    assert t.read().columns == ["k"]
    assert sorted(r["k"] for r in t.read().collect()) == [6, 7]
    assert t.read(version=1).columns == ["id", "amount"]
