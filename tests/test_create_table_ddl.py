"""CREATE TABLE column DDL (r13 verdict #2): ``CREATE TABLE '<root>'
(col TYPE [GENERATED ALWAYS AS (..) | GENERATED ALWAYS AS IDENTITY
[(START WITH n [INCREMENT BY k])] | CHECK (..) | DEFAULT <expr>]
[NOT NULL], ..., [CONSTRAINT name CHECK (..)]) [AS <query>]`` — the
surface where Delta users actually declare generated/identity/default
columns and constraints. The declaration routes through the existing
add_* machinery before the first data write.

Reference parity: Delta Lake CREATE TABLE column specifications
(delta.io docs)."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def test_create_table_full_column_ddl(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' ("
        f"  k BIGINT NOT NULL,"
        f"  d DATE,"
        f"  y INT GENERATED ALWAYS AS (year(d)),"
        f"  rid BIGINT GENERATED ALWAYS AS IDENTITY "
        f"      (START WITH 100 INCREMENT BY 3),"
        f"  status STRING DEFAULT 'pending',"
        f"  amount DECIMAL(10, 2) CHECK (amount >= 0),"
        f"  CONSTRAINT k_small CHECK (k < 1000)"
        f")",
    )
    t = SnapshotTable(spark, root)
    # the declared schema is committed, zero rows
    assert t.read().count() == 0
    assert dict(t.read().dtypes) == {
        "k": "bigint", "d": "date", "y": "int", "rid": "bigint",
        "status": "string", "amount": "decimal(10,2)",
    }
    # every property landed in the manifest
    assert t._table_generated() == {"y": "year(d)"}
    assert t._table_identity() == {
        "rid": {"start": 100, "step": 3, "next": 100}
    }
    assert t._table_defaults() == {"status": "'pending'"}
    assert set(t._table_checks()) == {
        "k_not_null", "amount_check", "k_small"
    }
    # a write omitting y/rid/status computes, assigns, and fills
    t.append(
        spark.createDataFrame(
            [(1, "2021-03-04", 5.50), (2, "2022-05-06", 7.25)],
            "k long, d string, amount string",
        ).select(
            "k",
            F.col("d").cast("date").alias("d"),
            F.col("amount").cast("decimal(10,2)").alias("amount"),
        )
    )
    got = {r["k"]: r for r in t.read().collect()}
    assert got[1]["y"] == 2021 and got[2]["y"] == 2022
    assert sorted(r["rid"] for r in got.values()) == [100, 103]
    assert got[1]["status"] == "pending"
    # the declared CHECKs enforce: NOT NULL, column CHECK, table
    # CONSTRAINT each refuse a violating batch
    def _batch(k, d, amount):
        return spark.createDataFrame(
            [(k, d, amount)], "k long, d string, amount string"
        ).select(
            "k",
            F.col("d").cast("date").alias("d"),
            F.col("amount").cast("decimal(10,2)").alias("amount"),
        )

    with pytest.raises(ValueError, match="k_not_null"):
        t.append(_batch(None, "2021-01-01", "1.00"))
    with pytest.raises(ValueError, match="amount_check"):
        t.append(_batch(3, "2021-01-01", "-1.00"))
    with pytest.raises(ValueError, match="k_small"):
        t.append(_batch(5000, "2021-01-01", "1.00"))
    assert t.read().count() == 2


def test_create_table_columns_with_as_query(spark, tmp_path):
    """The AS-query rows land through the same write-time choke
    points: generated computed, identity assigned, defaults filled."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' ("
        f"  k BIGINT,"
        f"  k2 BIGINT GENERATED ALWAYS AS (k * 2),"
        f"  rid BIGINT GENERATED ALWAYS AS IDENTITY,"
        f"  tag STRING DEFAULT 'ctas'"
        f") AS SELECT id AS k FROM range(5)",
    )
    t = SnapshotTable(spark, root)
    rows = {r["k"]: r for r in t.read().collect()}
    assert len(rows) == 5
    assert all(r["k2"] == k * 2 for k, r in rows.items())
    assert sorted(r["rid"] for r in rows.values()) == [1, 2, 3, 4, 5]
    assert all(r["tag"] == "ctas" for r in rows.values())
    # identity continues from the high-water mark on the next write
    t.append(spark.createDataFrame([(99,)], "k long"))
    assert max(r["rid"] for r in t.read().collect()) == 6


def test_create_table_ddl_error_shapes(spark, tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(ValueError, match="duplicate column"):
        snapshot_sql(
            spark, f"CREATE TABLE '{root}' (k BIGINT, k INT)"
        )
    with pytest.raises(NotImplementedError, match="nested types"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}' (k BIGINT, xs ARRAY<INT>)",
        )
    with pytest.raises(ValueError, match="unsupported column modifier"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}' (k BIGINT SPARKLY)",
        )
    with pytest.raises(ValueError, match="trailing text"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}' (k BIGINT) WITH NONSENSE",
        )
    with pytest.raises(ValueError, match="bad CREATE TABLE column types"):
        snapshot_sql(
            spark, f"CREATE TABLE '{root}' (k NOTATYPE)"
        )
    # none of the refusals committed anything
    assert SnapshotTable(spark, root).current_version() == 0
    # an existing table refuses CREATE (with or without columns)
    snapshot_sql(spark, f"CREATE TABLE '{root}' (k BIGINT)")
    with pytest.raises(ValueError, match="already holds"):
        snapshot_sql(spark, f"CREATE TABLE '{root}' (k BIGINT)")
    with pytest.raises(ValueError, match="already holds"):
        snapshot_sql(spark, f"CREATE TABLE '{root}' AS SELECT 1 AS k")


def test_create_table_plain_ctas_unchanged(spark, tmp_path):
    root = str(tmp_path / "t")
    v = snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' AS SELECT id AS k, id * 2 AS v "
        f"FROM range(4)",
    )
    t = SnapshotTable(spark, root)
    assert v == 1 and t.read().count() == 4


def test_create_or_replace_and_if_not_exists(spark, tmp_path):
    """OR REPLACE replaces data AND governance (Delta's semantics)
    while history stays time-travelable; IF NOT EXISTS is a no-op on
    an existing table."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' ("
        f"  k BIGINT CHECK (k > 0),"
        f"  rid BIGINT GENERATED ALWAYS AS IDENTITY,"
        f"  tag STRING DEFAULT 'old'"
        f") AS SELECT id + 1 AS k FROM range(3)",
    )
    t = SnapshotTable(spark, root)
    v_old = t.current_version()
    assert t.read().count() == 3
    # IF NOT EXISTS: no-op, same version
    v = snapshot_sql(
        spark, f"CREATE TABLE IF NOT EXISTS '{root}' (z INT)"
    )
    assert v == v_old and "z" not in t.read().columns
    # OR REPLACE: new schema + data; the OLD checks/identity/defaults
    # are GONE (a k <= 0 row now passes; no rid assignment; no fill)
    snapshot_sql(
        spark,
        f"CREATE OR REPLACE TABLE '{root}' (k BIGINT, note STRING) "
        f"AS SELECT CAST(-5 AS LONG) AS k, 'fresh' AS note",
    )
    t2 = SnapshotTable(spark, root)
    assert t2._table_checks() == {}
    assert t2._table_identity() == {}
    assert t2._table_defaults() == {}
    rows = t2.read().collect()
    assert [(r["k"], r["note"]) for r in rows] == [(-5, "fresh")]
    t2.append(spark.createDataFrame([(0,)], "k long"))  # old CHECK gone
    assert t2.read().count() == 2
    # history is still time-travelable across the replace
    assert t2.read(version=v_old).count() == 3
    # OR REPLACE with a fresh declaration installs NEW governance
    snapshot_sql(
        spark,
        f"CREATE OR REPLACE TABLE '{root}' "
        f"(k BIGINT, tag STRING DEFAULT 'new')",
    )
    t3 = SnapshotTable(spark, root)
    assert t3._table_defaults() == {"tag": "'new'"}
    t3.append(spark.createDataFrame([(1,)], "k long"))
    assert t3.read().first()["tag"] == "new"
    # plain CTAS OR REPLACE on a fresh root also just works
    root2 = str(tmp_path / "u")
    snapshot_sql(
        spark,
        f"CREATE OR REPLACE TABLE '{root2}' AS SELECT 1 AS k",
    )
    assert SnapshotTable(spark, root2).read().count() == 1


def test_create_generated_type_mismatch_refused(spark, tmp_path):
    """A generated expression whose type doesn't match the declared
    column type is refused AT CREATE (Delta's rule) — not at some
    later write's schema-evolution error."""
    root = str(tmp_path / "t")
    with pytest.raises(ValueError, match="declared int but"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}' (k BIGINT, "
            f"k2 INT GENERATED ALWAYS AS (k * 2))",
        )
    with pytest.raises(ValueError, match="does not analyze"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}' (k BIGINT, "
            f"z BIGINT GENERATED ALWAYS AS (missing_col + 1))",
        )
    assert SnapshotTable(spark, root).current_version() == 0
    # the matching declaration (or an explicit CAST) passes
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, "
        f"k2 INT GENERATED ALWAYS AS (CAST(k * 2 AS INT)))",
    )
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(4,)], "k long"))
    assert t.read().first()["k2"] == 8


def test_column_comments(spark, tmp_path):
    """Column COMMENTs (r14): declared in the CREATE list (last
    modifier) or via ALTER COLUMN c COMMENT; surfaced by DESCRIBE
    TABLE; survive RESTORE; cleared by empty text."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' ("
        f"  k BIGINT NOT NULL COMMENT 'primary key',"
        f"  tag STRING DEFAULT 'x' COMMENT 'it''s a tag',"
        f"  v DOUBLE"
        f")",
    )
    t = SnapshotTable(spark, root)
    rows = {
        r["col_name"]: r["comment"]
        for r in snapshot_sql(spark, f"DESCRIBE TABLE '{root}'").collect()
    }
    assert rows == {"k": "primary key", "tag": "it's a tag", "v": None}
    # the co-declared modifiers still landed
    assert t._table_defaults() == {"tag": "'x'"}
    assert "k_not_null" in t._table_checks()
    # ALTER sets and clears
    snapshot_sql(
        spark, f"ALTER TABLE '{root}' ALTER COLUMN v COMMENT 'volume'"
    )
    snapshot_sql(
        spark, f"ALTER TABLE '{root}' ALTER COLUMN k COMMENT ''"
    )
    rows = {
        r["col_name"]: r["comment"]
        for r in snapshot_sql(spark, f"DESCRIBE TABLE '{root}'").collect()
    }
    assert rows == {"k": None, "tag": "it's a tag", "v": "volume"}
    # survives restore (governance follows the table)
    t.append(spark.createDataFrame([(1, 2.0)], "k long, v double"))
    t.restore(t.current_version() - 1)
    rows = {
        r["col_name"]: r["comment"]
        for r in t.describe_table().collect()
    }
    assert rows["v"] == "volume"
    # a DEFAULT literal containing the word COMMENT is not a comment
    root2 = str(tmp_path / "t2")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root2}' (k BIGINT, "
        f"note STRING DEFAULT 'see COMMENT below')",
    )
    t2 = SnapshotTable(spark, root2)
    assert t2._table_defaults() == {"note": "'see COMMENT below'"}
    with pytest.raises(ValueError, match="COMMENT must be the last"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{tmp_path / 't3'}' "
            f"(k BIGINT COMMENT 'x' NOT NULL)",
        )


def test_create_generated_on_generated_refused_both_orders(spark, tmp_path):
    """r14 verdict finding #1: generated expressions may reference only
    non-generated columns (Delta's rule). BOTH declaration orders must
    refuse at CREATE — the forward order used to break the first write
    with a raw UNRESOLVED_COLUMN, the reverse order used to silently
    'work' with order-dependent chained values."""
    orders = [
        # referenced-after (the order that used to break the first write)
        "a INT, g2 INT GENERATED ALWAYS AS (g1 * 2), "
        "g1 INT GENERATED ALWAYS AS (a + 1)",
        # referenced-before (the order that used to silently 'work')
        "a INT, g1 INT GENERATED ALWAYS AS (a + 1), "
        "g2 INT GENERATED ALWAYS AS (g1 * 2)",
    ]
    for i, cols in enumerate(orders):
        with pytest.raises(
            ValueError, match="references another GENERATED"
        ):
            snapshot_sql(
                spark, f"CREATE TABLE '{tmp_path / f'gg{i}'}' ({cols})"
            )
    # an IDENTITY column referenced by a generated expression is the
    # same refusal (identity values are table-assigned, i.e. computed)
    with pytest.raises(ValueError, match="references another GENERATED"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{tmp_path / 'ggid'}' (a INT, "
            f"rid BIGINT GENERATED ALWAYS AS IDENTITY, "
            f"g BIGINT GENERATED ALWAYS AS (rid + 1))",
        )
    # plain bad SQL keeps the plain-analysis error shape
    with pytest.raises(ValueError, match="does not analyze"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{tmp_path / 'ggbad'}' (a INT, "
            f"g INT GENERATED ALWAYS AS (nosuch + 1))",
        )
    # a refused CREATE leaves NO committed table behind (the probe
    # runs before the v1 empty-schema commit)
    assert not SnapshotTable(spark, str(tmp_path / "gg0")).current_version()
