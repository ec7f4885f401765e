"""Metadata-only column RENAME / DROP (r09 verdict #5 — Delta's
column mapping): data files keep their PHYSICAL names forever; the
manifest's column_mapping presents logical names, retired slots block
unsafe re-adds, and every surface (read, DML, merge, CDF, the batch
DataSource, pruning) resolves through the map.

Invariants driven here:
- rename/drop are O(metadata) commits: the file list is unchanged
  by path;
- reads at the new version show new names; TIME TRAVEL to older
  versions shows the old ones;
- writes/DML/merge address the table by logical names and keep
  pruning (stats are physical underneath);
- dropped names cannot be re-added while old files hold their slot;
- restore/clone/CDF carry the mapping; overwrite resets it.
"""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable


def _tbl(spark, path, **kw):
    t = SnapshotTable(spark, str(path), stats_columns=["v"], **kw)
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 100)
            .select(F.col("id").alias("v"), (F.col("id") * 2).alias("w"))
            .coalesce(1)
        )
    return t


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    before = set(t._manifest(t.current_version())["files"])
    v = t.rename_column("w", "weight")
    after = set(t._manifest(v)["files"])
    assert after == before  # zero data files moved
    got = t.read()
    assert got.columns == ["v", "weight"]
    assert got.filter(F.col("weight") == 10).count() == 1
    # time travel shows the OLD name (names ride the manifest)
    assert t.read(version=v - 1).columns == ["v", "w"]
    # rename again, and back to the original physical name
    t.rename_column("weight", "w2")
    assert t.read().columns == ["v", "w2"]
    t.rename_column("w2", "w")
    assert t.read().columns == ["v", "w"]
    assert t._manifest(t.current_version()).get("column_mapping") in (None, {})


def test_rename_validation(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("w", "v")
    with pytest.raises(ValueError, match="equal"):
        t.rename_column("w", "w")
    t.add_check_constraint("w_pos", "w >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("w", "weight")
    t.drop_check_constraint("w_pos")
    t.rename_column("w", "weight")


def test_writes_and_pruning_after_rename(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.rename_column("v", "val")
    # appends address the table by the NEW name; stats stay physical
    t.append(
        spark.range(3000, 3100)
        .select(F.col("id").alias("val"), (F.col("id") * 2).alias("w"))
        .coalesce(1)
    )
    assert t.read().count() == 400
    # banded read prunes across old AND new files (physical stats)
    pruned = t.read(where=("val", 3000, 3099))
    assert len(pruned.inputFiles()) == 1
    assert pruned.count() == 100
    pruned2 = t.read(where="val BETWEEN 1000 AND 1099")
    assert len(pruned2.inputFiles()) == 1 and pruned2.count() == 100


def test_dml_after_rename(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.rename_column("v", "val")
    before = set(t._manifest(t.current_version())["files"])
    t.delete_where("val BETWEEN 1000 AND 1049")
    after = set(t._manifest(t.current_version())["files"])
    assert len(before & after) == 2  # pruning intact through the map
    assert t.read().count() == 250
    t.update_where("val >= 2050", set={"w": "w + 1"})
    rows = {r["val"]: r["w"] for r in t.read().collect()}
    assert rows[2050] == 4101 and rows[2049] == 4098
    t.delete_where_mor("val", 0, 9)
    assert t.read().count() == 240
    # merge by the new key name
    t.merge(
        spark.createDataFrame([(2099, -1), (9999, -2)], "val long, w long"),
        "val",
    )
    rows = {r["val"]: r["w"] for r in t.read().collect()}
    assert rows[2099] == -1 and rows[9999] == -2


def test_drop_column_metadata_only(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    before = set(t._manifest(t.current_version())["files"])
    v = t.drop_column("w")
    assert set(t._manifest(v)["files"]) == before
    assert t.read().columns == ["v"]
    assert t.read(version=v - 1).columns == ["v", "w"]  # time travel
    # re-adding the dropped name is refused (old files hold the slot)
    with pytest.raises(ValueError, match="dropped"):
        t.append(
            spark.range(5).select(
                F.col("id").alias("v"), (F.col("id") * 9).alias("w")
            )
        )
    with pytest.raises(ValueError, match="last column"):
        t.drop_column("v")
    # overwrite resets the physical layout; the name is free again
    t.overwrite(
        spark.range(5).select(F.col("id").alias("v"), F.lit(1).alias("w"))
    )
    assert t.read().columns == ["v", "w"]


def test_drop_renamed_column_and_rename_dropped_slot(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.rename_column("w", "weight")
    t.drop_column("weight")  # retires physical slot 'w'
    assert t.read().columns == ["v"]
    with pytest.raises(ValueError, match="dropped"):
        t.append(spark.range(1).select(F.col("id").alias("v"), F.lit(2).alias("w")))
    # the LOGICAL name 'weight' is free (only physical 'w' is retired)
    t.append(
        spark.range(5000, 5001).select(
            F.col("id").alias("v"), F.lit(7).cast("long").alias("weight")
        )
    )
    got = t.read()
    assert got.columns == ["v", "weight"]
    assert got.filter(F.col("weight") == 7).count() == 1
    # old rows read the re-added column as NULL (additive evolution)
    assert got.filter(F.col("weight").isNull()).count() == 300


def test_cdf_and_restore_carry_mapping(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    v1 = t.current_version()
    t.rename_column("v", "val")
    t.delete_where("val", 0, 4)
    feed = t.changes(v1, t.current_version())
    assert "val" in feed.columns and "v" not in feed.columns
    assert feed.filter(F.col("_change_type") == "delete").count() == 5
    # restore to the pre-rename version restores the old names
    t.restore(v1)
    assert t.read().columns == ["v", "w"]
    assert t.read().count() == 300


def test_clone_carries_mapping(spark, tmp_path):
    t = _tbl(spark, tmp_path / "t")
    t.rename_column("w", "weight")
    shallow = t.clone_to(str(tmp_path / "shallow"))
    assert shallow.read().columns == ["v", "weight"]
    deep = t.clone_to(str(tmp_path / "deep"), deep=True)
    assert deep.read().columns == ["v", "weight"]
    # the deep clone's layout is fresh: the old name is usable again
    deep.rename_column("weight", "w")
    assert deep.read().columns == ["v", "w"]


def test_snapshot_sources_present_logical_names(spark, tmp_path):
    from collective_als_spark.sources.snapshot_source import (
        SnapshotBatchReader,
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = _tbl(spark, tmp_path / "t")
    t.rename_column("v", "val")
    got = (
        spark.read.format("snapshot").option("path", t.root).load()
    )
    assert got.columns == ["val", "w"]
    assert got.filter("val = 1005").count() == 1
    # pushed filters still prune through the map (stats physical)
    r = SnapshotBatchReader(got.schema, {"path": t.root})
    from pyspark.sql.datasource import EqualTo

    r.pushFilters([EqualTo(("val",), 1005)])
    assert len(r.partitions()) == 1


def test_cdf_stream_presents_logical_names(spark, tmp_path):
    from collective_als_spark.streaming.cdf_source import (
        register_snapshot_cdf,
    )

    register_snapshot_cdf(spark)
    t = _tbl(spark, tmp_path / "t")
    t.rename_column("v", "val")
    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", t.root)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert "val" in got.columns and "v" not in got.columns
    assert got.count() == 300
