"""Type widening via commit-time schema evolution (r10 verdict #8):
a commit may widen a numeric column along the lossless ladder
(int->long, float->double, byte/short up) — metadata-only, Delta's
``enableTypeWidening``: the manifest records the wider type and old
narrow parquet files are promoted on scan (Spark 4's parquet widening
reads; pyarrow cast in the pure-python DataSource), no rewrite.

Invariants driven here:
- widen-by-append: values exact across mixed-width files, the table
  schema is the wider type, TIME TRAVEL still shows each version
  under its own type;
- stats pruning keeps working across mixed-width files (JSON stats
  compare numerically regardless of width);
- a NARROWER write into a widened table needs no schema change (both
  the engine path and the pure-python writer);
- non-widening type changes stay rejected; hash-BUCKETED columns
  refuse widening (int and long hash differently — bucket pruning on
  old files would become unsound).
"""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable


def _ints(spark, lo, n=100):
    return spark.range(lo, lo + n).select(
        F.col("id").cast("int").alias("v"),
        F.col("id").cast("float").alias("w"),
    ).coalesce(1)


def _longs(spark, lo, n=100):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("v"),
        F.col("id").cast("double").alias("w"),
    ).coalesce(1)


def test_widen_append_values_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(_ints(spark, 0))
    assert dict(t.read().dtypes) == {"v": "int", "w": "float"}
    t.append(_longs(spark, 5_000_000_000))  # values past int range
    got = t.read()
    assert dict(got.dtypes) == {"v": "bigint", "w": "double"}
    assert got.count() == 200
    assert got.agg(F.sum("v")).first()[0] == sum(range(100)) + sum(
        range(5_000_000_000, 5_000_000_100)
    )
    # old narrow file's values exact through the widened schema
    assert got.filter(F.col("v") < 100).agg(F.sum("w")).first()[0] == float(
        sum(range(100))
    )
    # time travel: v1 still reads under ITS manifest's narrow type
    tt = t.read(version=1)
    assert dict(tt.dtypes) == {"v": "int", "w": "float"}
    assert tt.count() == 100


def test_widen_keeps_stats_pruning_exact(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(_ints(spark, 0))
    t.append(_longs(spark, 5_000_000_000))
    pruned = t.read(where="v BETWEEN 5000000000 AND 5000000049")
    assert len(pruned.inputFiles()) == 1
    assert pruned.count() == 50
    # band DELETE against the old narrow file leaves the wide file
    # untouched by path
    before = set(t._manifest(t.current_version())["files"])
    t.delete_where("v", 0, 49)
    after = set(t._manifest(t.current_version())["files"])
    assert len(before & after) == 1  # wide file carried over
    assert t.read().count() == 150


def test_narrower_write_needs_no_schema_change(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(_longs(spark, 0))
    v_before = dict(t.read().dtypes)
    t.append(_ints(spark, 1000))
    assert dict(t.read().dtypes) == v_before == {"v": "bigint", "w": "double"}
    assert t.read().count() == 200
    assert (
        t.read().filter(F.col("v").between(1000, 1099)).count() == 100
    )


def test_non_widening_changes_still_rejected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(_ints(spark, 0))
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t.append(
            spark.createDataFrame([("x", 1.0)], "v string, w float")
        )
    # long -> double is NOT lossless: rejected
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t2 = SnapshotTable(spark, str(tmp_path / "t2"), stats_columns=["v"])
        t2.append(spark.range(5).select(F.col("id").alias("v")))
        t2.append(
            spark.range(5).select(F.col("id").cast("double").alias("v"))
        )


def test_bucketed_column_refuses_widening(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append_bucketed(
        spark.range(0, 1000).select(
            F.col("id").cast("int").alias("k"), (F.col("id") * 2).alias("p")
        ),
        "k",
        4,
    )
    with pytest.raises(ValueError, match="hash-bucketed"):
        t.append(
            spark.range(0, 10).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("p")
            )
        )
    # a non-bucket column CAN still evolve additively
    t.append(
        spark.range(0, 10).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 2).alias("p"),
            F.lit("z").alias("tag"),
        )
    )
    assert "tag" in t.read().columns


def test_widen_through_merge(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(_ints(spark, 0))
    src = spark.createDataFrame(
        [(5, 6_000_000_000.0)], "v long, w double"
    ).select(F.col("v"), F.col("w"))
    t.merge(src, "v")
    got = t.read()
    assert dict(got.dtypes) == {"v": "bigint", "w": "double"}
    assert got.filter(F.col("v") == 5).first()["w"] == 6_000_000_000.0
    assert got.count() == 100


def test_widened_table_through_batch_datasource_and_writer(
    spark, tmp_path
):
    from collective_als_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    t.append(_ints(spark, 0))
    t.append(_longs(spark, 5_000_000_000))
    got = spark.read.format("snapshot").option("path", t.root).load()
    assert dict(got.dtypes) == {"v": "bigint", "w": "double"}
    assert got.count() == 200
    assert (
        got.filter(F.col("v") >= 5_000_000_000).count() == 100
    )
    # pure-python writer: NARROWER write into the widened table is
    # accepted (manifest stays wide) ...
    (
        _ints(spark, 2000)
        .write.format("snapshot")
        .option("path", t.root)
        .mode("append")
        .save()
    )
    assert dict(t.read().dtypes) == {"v": "bigint", "w": "double"}
    assert t.read().count() == 300
    # ... but WIDENING through the writer is refused with guidance
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), stats_columns=["v"])
    t2.append(_ints(spark, 0))
    with pytest.raises(Exception, match="SnapshotTable first"):
        (
            _longs(spark, 0)
            .write.format("snapshot")
            .option("path", t2.root)
            .mode("append")
            .save()
        )


def test_evolution_lattice_randomized():
    """Seeded randomized schema pairs through _evolved_schema: prev
    columns keep their order, common columns resolve to the WIDER of
    the pair exactly when the pair sits on the lossless ladder (else
    raise), additions append, and a bucket-carrying manifest vetoes
    widening. Pure python, no Spark."""
    import random

    from collective_als_spark.sources.layout import SnapshotTable

    rng = random.Random(411)
    ladder = ["byte", "short", "integer", "long"]
    types = ladder + [
        "float", "double", "string", "boolean",
        "date", "timestamp_ntz",
        "decimal(10,2)", "decimal(14,4)", "decimal(12,0)", "decimal(20,0)",
    ]
    digits = {"byte": 3, "short": 5, "integer": 10, "long": 19}

    def dec(t):
        import re as _re

        m = _re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
        return (int(m.group(1)), int(m.group(2))) if m else None

    def wider(a, b):
        # independent mirror of the FULL Delta widening table
        if a == b:
            return a
        if a in ladder and b in ladder:
            return a if ladder.index(a) >= ladder.index(b) else b
        if {a, b} == {"float", "double"}:
            return "double"
        if "double" in (a, b):
            o = b if a == "double" else a
            if o in ("byte", "short", "integer"):
                return "double"
        if {a, b} == {"date", "timestamp_ntz"}:
            return "timestamp_ntz"
        da, db = dec(a), dec(b)
        if da and db:
            if db[1] >= da[1] and db[0] - db[1] >= da[0] - da[1]:
                return b
            if da[1] >= db[1] and da[0] - da[1] >= db[0] - db[1]:
                return a
            return None
        for d, o in ((da, b), (db, a)):
            if d and o in digits and d[0] - d[1] >= digits[o]:
                return a if d is da else b
        return None

    ev = SnapshotTable._evolved_schema

    class T:  # uses only the _evolved_schema/_wider_type statics
        _wider_type = staticmethod(SnapshotTable._wider_type)

    for _trial in range(500):
        prev_cols = [(f"c{i}", rng.choice(types)) for i in range(rng.randint(1, 5))]
        new_cols = []
        for name, t in prev_cols:
            if rng.random() < 0.6:
                new_cols.append((name, rng.choice(types)))
        for j in range(rng.randint(0, 2)):
            new_cols.append((f"n{j}", rng.choice(types)))
        rng.shuffle(new_cols)
        prev = {"type": "struct",
                "fields": [{"name": n, "type": t, "nullable": True,
                            "metadata": {}} for n, t in prev_cols]}
        new = {"type": "struct",
               "fields": [{"name": n, "type": t, "nullable": True,
                           "metadata": {}} for n, t in new_cols]}
        prev_t = dict(prev_cols)
        should_raise = any(
            n in prev_t and wider(prev_t[n], t) is None
            for n, t in new_cols
        )
        try:
            got = ev(T(), prev, new, manifest={"stats": {}})
        except ValueError:
            assert should_raise, (prev_cols, new_cols)
            continue
        assert not should_raise, (prev_cols, new_cols)
        names = [f["name"] for f in got["fields"]]
        assert names[: len(prev_cols)] == [n for n, _ in prev_cols]
        assert set(names) == {n for n, _ in prev_cols} | {
            n for n, _ in new_cols
        }
        by_name = {f["name"]: f["type"] for f in got["fields"]}
        for n, t in prev_cols:
            want = t
            for nn, nt in new_cols:
                if nn == n:
                    want = wider(t, nt)
            assert by_name[n] == want, (n, t, new_cols, by_name)
        # bucket veto: any genuinely-widened column under __buckets
        widened = [
            n for n, t in prev_cols
            if by_name[n] != t
        ]
        if widened:
            mani = {"stats": {"f0": {"__buckets": [widened[0], 4, [0]]}}}
            import pytest as _pytest

            with _pytest.raises(ValueError, match="hash-bucketed"):
                ev(T(), prev, new, manifest=mani)


def test_widen_decimal_int_and_date_rungs(spark, tmp_path):
    """r11 verdict missing #3 — the rest of Delta's widening table:
    decimal precision/scale growth, int->decimal, small-int->double,
    and date->timestamp_ntz, each metadata-only with old files
    promoted on scan; the lossy classics stay rejected."""
    # decimal(10,2) -> decimal(14,4), values exact across widths
    t = SnapshotTable(spark, str(tmp_path / "d"), stats_columns=["v"])
    t.append(
        spark.range(3).select(
            F.col("id").cast("decimal(10,2)").alias("v")
        ).coalesce(1)
    )
    t.append(
        spark.range(3).select(
            (F.col("id") + F.lit(0.25)).cast("decimal(14,4)").alias("v")
        ).coalesce(1)
    )
    assert dict(t.read().dtypes) == {"v": "decimal(14,4)"}
    import decimal as _dec

    got = sorted(r["v"] for r in t.read().collect())
    assert got[0] == _dec.Decimal("0.0000") and got[-1] == _dec.Decimal(
        "2.2500"
    )
    # time travel shows v1 under its own narrow type
    assert dict(t.read(version=1).dtypes) == {"v": "decimal(10,2)"}
    # int -> decimal(12,2); stats pruning still exact across widths
    t2 = SnapshotTable(spark, str(tmp_path / "i"), stats_columns=["v"])
    t2.append(
        spark.range(0, 100).select(F.col("id").cast("int").alias("v"))
        .coalesce(1)
    )
    t2.append(
        spark.range(1000, 1100).select(
            F.col("id").cast("decimal(12,2)").alias("v")
        ).coalesce(1)
    )
    assert dict(t2.read().dtypes) == {"v": "decimal(12,2)"}
    pruned = t2.read(where=("v", 1000, 1050))
    assert len(pruned.inputFiles()) == 1 and pruned.count() == 51
    assert t2.read().count() == 200
    # a decimal too narrow for every int32 (p-s < 10): rejected
    t2b = SnapshotTable(spark, str(tmp_path / "i2"))
    t2b.append(spark.range(3).select(F.col("id").cast("int").alias("v")))
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t2b.append(
            spark.range(1).select(F.col("id").cast("decimal(4,0)").alias("v"))
        )
    # ...while a narrower decimal INTO a wider decimal table is just a
    # narrower write (no schema change)
    t2.append(
        spark.range(1).select(F.col("id").cast("decimal(4,0)").alias("v"))
    )
    assert dict(t2.read().dtypes) == {"v": "decimal(12,2)"}
    # small-int -> double is float64-exact; long -> double is NOT
    t3 = SnapshotTable(spark, str(tmp_path / "s"), stats_columns=["v"])
    t3.append(spark.range(5).select(F.col("id").cast("int").alias("v")))
    t3.append(spark.range(5).select(F.col("id").cast("double").alias("v")))
    assert dict(t3.read().dtypes) == {"v": "double"}
    t4 = SnapshotTable(spark, str(tmp_path / "l"))
    t4.append(spark.range(5).select(F.col("id").alias("v")))
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t4.append(spark.range(5).select(F.col("id").cast("double").alias("v")))
    # decimal shrink in EITHER dimension rejected ((12,0) vs (10,4))
    t5 = SnapshotTable(spark, str(tmp_path / "ds"))
    t5.append(
        spark.range(3).select(F.col("id").cast("decimal(12,0)").alias("v"))
    )
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t5.append(
            spark.range(3).select(F.col("id").cast("decimal(10,4)").alias("v"))
        )
    # float -> decimal stays rejected (binary fractions are lossy)
    t6 = SnapshotTable(spark, str(tmp_path / "f"))
    t6.append(spark.range(3).select(F.col("id").cast("float").alias("v")))
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t6.append(
            spark.range(3).select(F.col("id").cast("decimal(20,2)").alias("v"))
        )


def test_widen_date_to_timestamp_ntz_and_stats_guard(spark, tmp_path):
    """date -> timestamp_ntz widens (midnight promotion, reader-native)
    UNLESS the column carries per-file date stats: old min/max are date
    strings, lexically incomparable with timestamp probes at the
    boundary day, so the widen is refused with guidance instead of
    silently breaking pruning soundness."""
    t = SnapshotTable(spark, str(tmp_path / "nostats"))
    t.append(spark.sql("SELECT DATE'2021-03-04' AS d, 1 AS v"))
    t.append(
        spark.sql("SELECT TIMESTAMP_NTZ'2021-03-05 13:30:00' AS d, 2 AS v")
    )
    got = t.read()
    assert dict(got.dtypes)["d"] == "timestamp_ntz"
    import datetime as _dt

    vals = sorted(r["d"] for r in got.collect())
    assert vals[0] == _dt.datetime(2021, 3, 4, 0, 0)  # midnight promotion
    assert vals[1] == _dt.datetime(2021, 3, 5, 13, 30)
    # date -> timestamp (zoned) is NOT on the ladder
    t2 = SnapshotTable(spark, str(tmp_path / "zoned"))
    t2.append(spark.sql("SELECT DATE'2021-03-04' AS d"))
    with pytest.raises(ValueError, match="schema evolution rejected"):
        t2.append(spark.sql("SELECT TIMESTAMP'2021-03-05 13:30:00' AS d"))
    # a stats-tracked date column refuses the widen with guidance
    t3 = SnapshotTable(spark, str(tmp_path / "stats"), stats_columns=["d"])
    t3.append(spark.sql("SELECT DATE'2021-03-04' AS d"))
    with pytest.raises(ValueError, match="date min/max stats"):
        t3.append(
            spark.sql("SELECT TIMESTAMP_NTZ'2021-03-05 13:30:00' AS d")
        )
