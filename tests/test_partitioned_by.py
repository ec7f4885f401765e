"""PARTITIONED BY in CREATE TABLE (r14 verdict missing #1): declaring
the table's layout at CREATE — identity columns (range-clustered,
band-stat pruning), bucket(n, col), days/months(col), truncate(col, n)
— wired to the existing hidden-partition transform machinery so every
append-family write (plain appends, SQL INSERT, CTAS rows, streaming
batches) is PLACED automatically and its files carry the pruning
metadata.

Reference parity: Iceberg PARTITIONED BY transform spellings + Delta
partition-column declaration (public docs) — the reference Scala repo
has no lake tier."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def _day_rows(spark, lo, n, month):
    return spark.createDataFrame(
        [(lo + i, f"2024-{month:02d}-{(i % 27) + 1:02d} 10:00:00")
         for i in range(n)],
        "k long, ts_s string",
    ).select("k", F.to_timestamp("ts_s").alias("ts"))


def test_create_partitioned_by_days_prunes(spark, tmp_path):
    """Declared days(ts): INSERTs are placed through the transform
    verb without the writer asking, files record day value sets, and a
    banded read opens ONLY the matching period's files."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, ts TIMESTAMP) "
        f"PARTITIONED BY (days(ts))",
    )
    t = SnapshotTable(spark, root)
    assert t._table_layout() == [
        {"transform": "day", "key": "ts", "param": None}
    ]
    # two plain appends — no transform verb in sight
    t.append(_day_rows(spark, 0, 10, 1))
    t.append(_day_rows(spark, 100, 10, 2))
    m = t._manifest(t.current_version())
    tmeta = [
        s["__transform"]
        for s in m.get("stats", {}).values()
        if "__transform" in s
    ]
    # every DATA file carries the day value set (the empty v1 schema
    # file has no rows and no meta — a conservative candidate)
    assert len(tmeta) >= 2
    assert all(meta[0] == "ts" and meta[1] == "day" for meta in tmeta)
    probe = ("ts", "2024-02-01 00:00:00", "2024-02-28 23:59:59")
    pruned = t.read(where=probe)
    assert pruned.count() == 10
    jan_files = {
        f for f, s in m.get("stats", {}).items()
        if "__transform" in s
        and all(v.startswith("2024-01") for v in s["__transform"][3])
    }
    opened = {f.rsplit("/", 1)[-1] for f in pruned.inputFiles()}
    assert not any(f.rsplit("/", 1)[-1] in opened for f in jan_files)
    assert t.detail().first()["partitioned_by"] == "day(ts)"


def test_create_partitioned_by_identity_prunes(spark, tmp_path):
    """Declared identity column: the CREATE commit persists the column
    into the table's stats config, every INSERT is range-clustered,
    and a banded read/DML prunes by the band stats."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT) PARTITIONED BY (k)",
    )
    t = SnapshotTable(spark, root)
    cfg = t._raw_manifest(t.current_version()).get("config") or {}
    assert "k" in cfg.get("stats_columns", [])
    for lo in (0, 1000, 2000):
        snapshot_sql(
            spark,
            f"INSERT INTO '{root}' "
            f"SELECT id AS k, id * 2 AS v FROM range({lo}, {lo + 10})",
        )
    before = set(t._manifest(t.current_version())["files"])
    # predicate DML shares the pruning: only the 1000-band file is a
    # rewrite candidate (the test_in_subquery_prunes pattern)
    t.delete_where("k >= 1000 AND k < 1005")
    after = set(t._manifest(t.current_version())["files"])
    assert len(before & after) >= 2
    assert t.read().count() == 25
    pruned = t.read(where=("k", 2000, 2009))
    assert pruned.count() == 10
    assert t.detail().first()["partitioned_by"] == "k"


def test_create_partitioned_by_bucket_and_ctas(spark, tmp_path):
    """bucket(4, k) declared at CREATE with AS-query rows: the CTAS
    rows are placed through append_bucketed and carry bucket-id sets;
    so do later INSERTs."""
    root = str(tmp_path / "t")
    spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).createOrReplaceTempView("pb_ctas_src")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT) "
        f"PARTITIONED BY (bucket(4, k)) AS SELECT * FROM pb_ctas_src",
    )
    t = SnapshotTable(spark, root)
    assert t.read().count() == 50
    m = t._manifest(t.current_version())
    bmeta = [
        s["__buckets"]
        for s in m.get("stats", {}).values()
        if "__buckets" in s
    ]
    assert bmeta and all(b[0] == "k" and b[1] == 4 for b in bmeta)
    snapshot_sql(spark, f"INSERT INTO '{root}' VALUES (1000, 1)")
    m2 = t._manifest(t.current_version())
    assert len(
        [s for s in m2.get("stats", {}).values() if "__buckets" in s]
    ) > len(bmeta)
    assert t.detail().first()["partitioned_by"] == "bucket(k, 4)"


def test_partitioned_by_on_generated_column(spark, tmp_path):
    """Identity layout on a GENERATED column (Delta's partition-on-
    generated idiom): placement runs AFTER the write-time fill, so a
    write omitting the column still clusters by its computed values,
    and the declared column joins the stats config for pruning."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, ts TIMESTAMP, "
        f"y INT GENERATED ALWAYS AS (year(ts))) PARTITIONED BY (y)",
    )
    t = SnapshotTable(spark, root)
    t.append(_day_rows(spark, 0, 6, 1))  # omits y entirely
    assert {r["y"] for r in t.read().collect()} == {2024}
    m = t._manifest(t.current_version())
    ybands = [
        s["y"] for s in m.get("stats", {}).values() if s.get("y")
    ]
    assert ybands and all(b[0] == 2024 and b[1] == 2024 for b in ybands)


def test_partitioned_by_governance_lifecycle(spark, tmp_path):
    """The layout is governance: it survives RESTORE, clears on CREATE
    OR REPLACE, and explicit per-append verbs win over it."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT) PARTITIONED BY (k)",
    )
    t = SnapshotTable(spark, root)
    t.append(spark.range(0, 5).select(F.col("id").alias("k"),
                                      F.col("id").alias("v")))
    t.append(spark.range(5, 9).select(F.col("id").alias("k"),
                                      F.col("id").alias("v")))
    t.restore(t.current_version() - 1)
    assert SnapshotTable(spark, root)._table_layout() == [
        {"transform": "identity", "key": "k", "param": None}
    ]
    # explicit clustering choice is respected, not re-routed
    t.append_clustered(
        spark.range(9, 12).select(F.col("id").alias("k"),
                                  F.col("id").alias("v")),
        ["v"],
    )
    # OR REPLACE clears the layout with the rest of the governance
    snapshot_sql(
        spark,
        f"CREATE OR REPLACE TABLE '{root}' AS "
        f"SELECT 1 AS a",
    )
    assert SnapshotTable(spark, root)._table_layout() == []
    # clearing via the Python API is an O(metadata) commit
    root2 = str(tmp_path / "t2")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root2}' (k BIGINT) PARTITIONED BY (k)",
    )
    t2 = SnapshotTable(spark, root2)
    t2.set_table_layout(None)
    assert t2._table_layout() == []


def test_partitioned_by_error_shapes(spark, tmp_path):
    def create(n, clause):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{tmp_path / n}' (k BIGINT, v BIGINT, "
            f"ts TIMESTAMP, g INT GENERATED ALWAYS AS (year(ts))) "
            f"PARTITIONED BY ({clause})",
        )

    # mixing a transform with other entries is refused with guidance
    with pytest.raises(NotImplementedError, match="compose"):
        create("e1", "k, days(ts)")
    with pytest.raises(NotImplementedError, match="compose"):
        create("e2", "bucket(4, k), days(ts)")
    # transform on a computed column: partition on the base instead
    with pytest.raises(NotImplementedError, match="BASE column"):
        create("e3", "bucket(4, g)")
    # unknown transform / malformed entries / unknown column
    with pytest.raises(ValueError, match="unknown PARTITIONED BY"):
        create("e4", "hours(ts)")
    with pytest.raises(ValueError, match="one integer and one column"):
        create("e5", "bucket(4, 5)")
    with pytest.raises(ValueError, match="not in the table schema"):
        create("e6", "nosuch")
    # identity layout ON a generated column is fine (the idiom)
    create("ok1", "g")
    # truncate accepts both argument orders (Iceberg writes both)
    snapshot_sql(
        spark,
        f"CREATE TABLE '{tmp_path / 'ok2'}' (s STRING) "
        f"PARTITIONED BY (truncate(s, 2))",
    )
    snapshot_sql(
        spark,
        f"CREATE TABLE '{tmp_path / 'ok3'}' (s STRING) "
        f"PARTITIONED BY (truncate(2, s))",
    )
    for n in ("ok2", "ok3"):
        assert SnapshotTable(spark, str(tmp_path / n))._table_layout() == [
            {"transform": "truncate", "key": "s", "param": 2}
        ]


def test_partitioned_by_markers_ride_routed_appends(spark, tmp_path):
    """Batch markers and CDC seq state must survive the layout
    routing: a streaming writer's append lands in append_bucketed /
    append_transformed, which now thread both through."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT) "
        f"PARTITIONED BY (bucket(2, k))",
    )
    t = SnapshotTable(spark, root)
    df = spark.range(0, 4).select(F.col("id").alias("k"),
                                  F.col("id").alias("v"))
    t.append(df, _markers={"qx": 7})
    m = t._manifest(t.current_version())
    assert m.get("batch_markers", {}).get("qx") == 7
    # and the rows still carry bucket metadata
    assert any(
        "__buckets" in s for s in m.get("stats", {}).values()
    )


def test_wap_commit_places_identity_layout(spark, tmp_path):
    """WAP batches are placed by a declared identity layout too (post-
    fill, like append): each published file carries a narrow band for
    the declared column; a failing audit still publishes nothing."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT) PARTITIONED BY (k)",
    )
    t = SnapshotTable(spark, root)
    t.wap_commit(
        spark.range(0, 2000).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("v")),
        checks=[{"name": "k_nonneg", "kind": "range",
                 "column": "k", "lo": 0, "hi": 10 ** 9}],
    )
    m = t._manifest(t.current_version())
    bands = [
        s["k"] for s in m.get("stats", {}).values()
        if s.get("k") and s.get("__rows")
    ]
    # range-clustered: at least one file covers a PROPER sub-band
    assert bands
    assert any(b[0] > 0 or b[1] < 1999 for b in bands) or len(bands) == 1
    v = t.current_version()
    with pytest.raises(ValueError, match="k_nonneg"):
        t.wap_commit(
            spark.createDataFrame([(-5, 0)], "k long, v long"),
            checks=[{"name": "k_nonneg", "kind": "range",
                     "column": "k", "lo": 0, "hi": 10 ** 9}],
        )
    assert t.current_version() == v
