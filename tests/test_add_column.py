"""Metadata-only ALTER TABLE ADD COLUMN (r14) + INSERT INTO column
lists: the field appends to the manifest schema with NO data rewrite
(existing rows read NULL), a retired name re-adds under a FRESH
physical slot via column mapping (stale values can never resurface),
and ``INSERT INTO t (cols) <query>`` maps the query positionally onto
the listed columns with omitted columns flowing through the
default/identity/generated write-time choke points.

Reference parity: Delta Lake ALTER TABLE ADD COLUMN(S) and SQL
INSERT column lists."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def _rows(spark, lo, n):
    return spark.createDataFrame(
        [(lo + i, f"s{i}") for i in range(n)], "k long, status string"
    )


def test_add_column_metadata_only(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 3))                        # v1
    files_before = t._manifest(1)["files"]
    v = t.add_column("score", "double")                 # v2
    assert v == 2
    # no data file was rewritten
    assert t._manifest(2)["files"] == files_before
    # existing rows read NULL; the schema carries the field
    got = t.read()
    assert dict(got.dtypes)["score"] == "double"
    assert all(r["score"] is None for r in got.collect())
    # new writes carry it
    t.append(
        spark.createDataFrame(
            [(10, "x", 1.5)], "k long, status string, score double"
        )
    )
    vals = {r["k"]: r["score"] for r in t.read().collect()}
    assert vals[10] == 1.5 and vals[0] is None
    # time travel: v1 has no such column
    assert "score" not in t.read(version=1).columns
    # errors
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("score", "double")
    with pytest.raises(ValueError, match="bad type"):
        t.add_column("z", "NOTATYPE")
    with pytest.raises(ValueError, match="nested type"):
        t.add_column("z", "array<int>")
    e = SnapshotTable(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="empty table"):
        e.add_column("z", "int")


def test_add_column_with_default(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 2))
    t.add_column("tier", "string", default="'basic'")
    # existing rows stay NULL (Delta's rule: defaults fill FUTURE
    # writes, never backfill)
    got = {r["k"]: r["tier"] for r in t.read().collect()}
    assert got == {0: None, 1: None}
    t.append(_rows(spark, 10, 1))
    got = {r["k"]: r["tier"] for r in t.read().collect()}
    assert got[10] == "basic" and got[0] is None


def test_add_column_reuses_dropped_name_via_fresh_slot(spark, tmp_path):
    """A dropped column's physical slot still holds data in old files;
    re-adding the NAME maps it to a fresh physical slot, so the stale
    values never resurface — Delta's column-mapping-id discipline."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 3))          # status holds s0..s2
    t.drop_column("status")
    v = t.add_column("status", "string")
    m = t._manifest(v)
    # mapped to a fresh physical slot, the retired one stays retired
    assert m["column_mapping"]["status"] == "status__c0"
    assert "status" in m["retired"]
    # old values do NOT resurface
    assert all(r["status"] is None for r in t.read().collect())
    # writes under the new name land in the fresh slot and read back
    t.append(
        spark.createDataFrame([(10, "new")], "k long, status string")
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[10] == "new" and got[0] is None
    # rename still composes on top of the fresh slot
    t.rename_column("status", "state")
    got = {r["k"]: r["state"] for r in t.read().collect()}
    assert got[10] == "new"


def test_add_column_sql_surface(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 2))
    snapshot_sql(spark, f"ALTER TABLE '{t.root}' ADD COLUMN score INT")
    assert dict(t.read().dtypes)["score"] == "int"
    snapshot_sql(
        spark,
        f"ALTER TABLE '{t.root}' ADD COLUMN tier STRING DEFAULT 'low'",
    )
    snapshot_sql(
        spark,
        f"INSERT INTO '{t.root}' SELECT CAST(9 AS LONG) AS k, "
        f"'x' AS status, CAST(5 AS INT) AS score",
    )
    got = {r["k"]: (r["score"], r["tier"]) for r in t.read().collect()}
    assert got[9] == (5, "low") and got[0] == (None, None)
    # parameterized type parses
    snapshot_sql(
        spark, f"ALTER TABLE '{t.root}' ADD COLUMN amt DECIMAL(10, 2)"
    )
    assert dict(t.read().dtypes)["amt"] == "decimal(10,2)"


def test_insert_into_column_list(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 2))
    t.set_column_default("status", "'dflt'")
    # positional mapping: the query's output names don't matter
    snapshot_sql(
        spark,
        f"INSERT INTO '{t.root}' (k) SELECT id + 100 FROM range(2)",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[100] == "dflt" and got[101] == "dflt"
    # VALUES form
    snapshot_sql(
        spark,
        f"INSERT INTO '{t.root}' (status, k) "
        f"VALUES ('v', CAST(200 AS LONG))",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[200] == "v"
    # width mismatch is a guided refusal
    with pytest.raises(ValueError, match="lists 1 columns but"):
        snapshot_sql(
            spark,
            f"INSERT INTO '{t.root}' (k) SELECT id, id FROM range(2)",
        )
    with pytest.raises(ValueError, match="duplicate column"):
        snapshot_sql(
            spark,
            f"INSERT INTO '{t.root}' (k, k) SELECT id, id FROM range(2)",
        )
    # a parenthesized QUERY is not mistaken for a column list
    snapshot_sql(
        spark,
        f"INSERT INTO '{t.root}' (SELECT CAST(300 AS LONG) AS k, "
        f"'q' AS status)",
    )
    got = {r["k"]: r["status"] for r in t.read().collect()}
    assert got[300] == "q"
    # identity composes: the omitted identity column assigns
    root2 = str(tmp_path / "t2")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root2}' (k BIGINT, "
        f"rid BIGINT GENERATED ALWAYS AS IDENTITY)",
    )
    snapshot_sql(
        spark,
        f"INSERT INTO '{root2}' (k) SELECT id FROM range(3)",
    )
    t2 = SnapshotTable(spark, root2)
    assert sorted(r["rid"] for r in t2.read().collect()) == [1, 2, 3]


def test_add_columns_plural_sql(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 2))
    snapshot_sql(
        spark,
        f"ALTER TABLE '{t.root}' ADD COLUMNS "
        f"(a INT, b STRING DEFAULT 'bee', c DECIMAL(6, 3))",
    )
    assert dict(t.read().dtypes)["a"] == "int"
    assert dict(t.read().dtypes)["c"] == "decimal(6,3)"
    t.append(spark.createDataFrame([(9, "x")], "k long, status string"))
    got = {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}
    assert got[9] == (None, "bee") and got[0] == (None, None)
    with pytest.raises(ValueError, match="malformed ADD COLUMNS entry"):
        snapshot_sql(
            spark, f"ALTER TABLE '{t.root}' ADD COLUMNS (x INT, !!)"
        )


def test_table_changes_under_column_mapping(spark, tmp_path):
    """The CDF TVF exposes LOGICAL names across a metadata-only
    rename (column mapping)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(_rows(spark, 0, 4))                                  # v1
    snapshot_sql(
        spark, f"ALTER TABLE '{t.root}' RENAME COLUMN status TO state"
    )                                                             # v2
    snapshot_sql(spark, f"DELETE FROM '{t.root}' WHERE k <= 1")   # v3
    df = snapshot_sql(
        spark,
        f"SELECT _change_type, k, state FROM "
        f"table_changes('{t.root}', 3)",
    )
    rows = sorted((r["_change_type"], r["k"], r["state"]) for r in df.collect())
    assert rows == [("delete", 0, "s0"), ("delete", 1, "s1")]
