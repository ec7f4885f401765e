"""Column RENAME/DROP x governance interactions (r15): governance
keyed by LOGICAL column name must FOLLOW a rename (generated/identity
definitions, defaults, comments, the declared layout, the pruning
config) and VANISH with a drop — a stale key broke the next write
with a raw UNRESOLVED_COLUMN / COLUMN_ALREADY_EXISTS, silently
disabled the explicit-identity refusal, or silently stopped the
declared layout's placement. SQL-text references (CHECK constraints,
generated expressions reading the column) are refused with guidance —
expression text cannot be rewritten safely (Delta's rule).

Reference parity: Delta Lake column mapping — governance references
survive renames by column id there; here the logical-name keys are
rewritten in the SAME rename commit."""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.snapshot_sql import snapshot_sql


def test_rename_rekeys_default_and_comment(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "k long, status string"))
    t.set_column_default("status", "'web'")
    t.set_column_comment("status", "source channel")
    t.rename_column("status", "state")
    assert t._table_defaults() == {"state": "'web'"}
    # the fill works against the new name and DESCRIBE shows it
    t.append(spark.createDataFrame([(1,)], "k long"))
    assert t.read().first()["state"] == "web"
    rows = {
        r["col_name"]: (r["properties"], r["comment"])
        for r in t.describe_table().collect()
    }
    assert rows["state"] == ("DEFAULT 'web'", "source channel")
    assert "status" not in rows


def test_rename_generated_base_refused(spark, tmp_path):
    """Renaming a column a GENERATED expression reads is refused
    (expression text cannot be rewritten safely) — previously the
    rename 'worked' and the NEXT write died with a raw
    UNRESOLVED_COLUMN AnalysisException."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "a int, g int"))
    t.add_generated_column("g", "a + 1")
    with pytest.raises(ValueError, match="computed from"):
        t.rename_column("a", "b")
    with pytest.raises(ValueError, match="computed from"):
        t.drop_column("a")
    # dropping the DEFINITION first unblocks both
    t.drop_generated_column("g")
    t.rename_column("a", "b")
    t.append(spark.createDataFrame([(5, 6)], "b int, g int"))
    assert t.read().first()["b"] == 5


def test_rename_generated_column_itself_rekeys(spark, tmp_path):
    """Renaming the generated column ITSELF is a pure key rewrite (the
    expression doesn't reference it) — previously the next write died
    with COLUMN_ALREADY_EXISTS (fill computed the old name beside the
    renamed schema)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "a int, g int"))
    t.add_generated_column("g", "a + 1")
    t.rename_column("g", "derived")
    assert t._table_generated() == {"derived": "a + 1"}
    t.append(spark.createDataFrame([(5,)], "a int"))
    assert t.read().first()["derived"] == 6
    # explicit conflicting values still audited under the new name
    with pytest.raises(ValueError, match="__generated_derived"):
        t.append(
            spark.createDataFrame([(1, 99)], "a int, derived int")
        )


def test_rename_identity_column_rekeys(spark, tmp_path):
    """Renaming an identity column keeps the counter AND the explicit-
    value refusal — previously the spec stayed keyed by the old name,
    so explicit values written to the new name were silently
    OVERWRITTEN instead of refused."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "k long, rid long"))
    t.add_identity_column("rid", start=10, step=2)
    t.append(spark.createDataFrame([(1,)], "k long"))
    t.rename_column("rid", "row_id")
    assert t._table_identity() == {
        "row_id": {"start": 10, "step": 2, "next": 12}
    }
    # assignment continues under the new name
    t.append(spark.createDataFrame([(2,)], "k long"))
    assert sorted(r["row_id"] for r in t.read().collect()) == [10, 12]
    # explicit values to the RENAMED column are refused, not clobbered
    with pytest.raises(ValueError, match="IDENTITY"):
        t.append(
            spark.createDataFrame([(3, 99)], "k long, row_id long")
        )
    assert t._table_identity()["row_id"]["next"] == 14


def test_rename_layout_and_stats_config_follow(spark, tmp_path):
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT) PARTITIONED BY (k)",
    )
    t = SnapshotTable(spark, root)
    t.rename_column("k", "kk")
    assert t._table_layout() == [
        {"transform": "identity", "key": "kk", "param": None}
    ]
    cfg = t._raw_manifest(t.current_version()).get("config") or {}
    assert "kk" in cfg.get("stats_columns", [])
    assert "k" not in cfg.get("stats_columns", [])
    # placement still routes: the new append carries band stats for
    # the renamed column's physical slot
    t.append(
        spark.range(0, 10).select(F.col("id").alias("kk"),
                                  F.col("id").alias("v"))
    )
    m = t._manifest(t.current_version())
    assert any("k" in s for s in m.get("stats", {}).values())
    assert t.detail().first()["partitioned_by"] == "kk"


def test_drop_column_cleans_its_governance(spark, tmp_path):
    # defaulted column: the fill must NOT re-create the dropped column
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "k long, status string"))
    t.set_column_default("status", "'web'")
    t.set_column_comment("status", "x")
    t.drop_column("status")
    assert t._table_defaults() == {}
    t.append(spark.createDataFrame([(1,)], "k long"))
    assert t.read().columns == ["k"]
    # identity column: assignment stops with the drop
    u = SnapshotTable(spark, str(tmp_path / "u"))
    u.append(spark.createDataFrame([], "k long, rid long"))
    u.add_identity_column("rid")
    u.append(spark.createDataFrame([(1,)], "k long"))
    u.drop_column("rid")
    assert u._table_identity() == {}
    u.append(spark.createDataFrame([(2,)], "k long"))
    assert u.read().columns == ["k"]
    # generated column: dropping the COLUMN takes the definition along
    g = SnapshotTable(spark, str(tmp_path / "g"))
    g.append(spark.createDataFrame([], "a int, y int"))
    g.add_generated_column("y", "a + 1")
    g.drop_column("y")
    assert g._table_generated() == {}
    g.append(spark.createDataFrame([(5,)], "a int"))
    assert g.read().columns == ["a"]
    # declared layout column: refused with guidance (Delta's rule)
    p = SnapshotTable(spark, str(tmp_path / "p"))
    p.append(spark.createDataFrame([], "k long, v long"))
    p.set_table_layout([{"transform": "identity", "key": "k",
                         "param": None}])
    with pytest.raises(ValueError, match="PARTITIONED BY"):
        p.drop_column("k")
    p.set_table_layout(None)
    p.drop_column("k")
    assert p.read().columns == ["v"]


def test_clone_carries_full_governance(spark, tmp_path):
    """r15: a clone (shallow AND deep, head AND version-pinned)
    carries the FULL governance set — identity (with the pinned
    counter), generated, defaults, comments, layout, properties,
    checks. Previously only checks rode the shallow clone, so a clone
    of an identity table silently wrote NULL ids on its next append."""
    src = SnapshotTable(spark, str(tmp_path / "src"))
    src.append(
        spark.createDataFrame([], "k long, rid long, y long, s string")
    )
    src.add_identity_column("rid")
    src.add_generated_column("y", "k + 1")
    src.set_column_default("s", "'web'")
    src.set_column_comment("s", "source")
    src.set_table_properties({"team": "x"})
    src.add_check_constraint("k_pos", "k >= 0")
    src.append(spark.createDataFrame([(1,)], "k long"))   # rid 1
    v_pin = src.current_version()
    src.append(spark.createDataFrame([(2,)], "k long"))   # rid 2
    for deep in (False, True):
        c = src.clone_to(str(tmp_path / f"dst_{deep}"), deep=deep)
        assert c._table_identity()["rid"]["next"] == 3
        assert c._table_generated() == {"y": "k + 1"}
        assert c._table_defaults() == {"s": "'web'"}
        assert c._table_properties() == {"team": "x"}
        assert "k_pos" in c._table_checks()
        # the clone ASSIGNS/COMPUTES/FILLS like the source
        c.append(spark.createDataFrame([(5,)], "k long"))
        rows = {r["k"]: r for r in c.read().collect()}
        assert rows[5]["rid"] == 3 and rows[5]["y"] == 6
        assert rows[5]["s"] == "web"
        # and ENFORCES
        with pytest.raises(ValueError, match="k_pos"):
            c.append(spark.createDataFrame([(-1,)], "k long"))
        # source untouched by clone writes
        assert src._table_identity()["rid"]["next"] == 3
    # a version-pinned clone carries the PINNED counter: it covers
    # exactly the cloned rows, continuing without reuse
    p = src.clone_to(str(tmp_path / "dst_pin"), version=v_pin)
    assert p.read().count() == 1
    assert p._table_identity()["rid"]["next"] == 2
    p.append(spark.createDataFrame([(9,)], "k long"))
    assert sorted(r["rid"] for r in p.read().collect()) == [1, 2]


def test_identity_declare_on_governance_only_root(spark, tmp_path):
    """Review finding (r15): the cross-reference guard must not crash
    the declare-before-first-write chain on a schema-less
    governance-only root (two identity declares, or identity after a
    default/check, before any data)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.add_identity_column("a")
    t.add_identity_column("b", start=100)
    u = SnapshotTable(spark, str(tmp_path / "u"))
    u.add_check_constraint("pos", "k >= 0")
    u.add_identity_column("rid")
    # the declared governance all bites on the first write
    u.append(spark.createDataFrame([(5,)], "k long"))
    assert u.read().first()["rid"] == 1
    with pytest.raises(ValueError, match="pos"):
        u.append(spark.createDataFrame([(-1,)], "k long"))


def test_carry_only_merge_claims_nothing(spark, tmp_path):
    """Review finding (r15): an all-matched merge_mor stages ZERO
    fresh ids and must commit WITHOUT an identity claim — a (base, 0)
    claim would spuriously CommitConflict against a concurrent
    assigning writer. Simulated via a stale counter: the carry-only
    merge must succeed where a claiming write would conflict."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.add_identity_column("rid")
    t.append(
        spark.range(0, 4).select(F.col("id").alias("k"),
                                 (F.col("id") * 2.0).alias("v"))
    )
    before = {r["k"]: r["rid"] for r in t.read().collect()}
    # a stale handle view of the counter: claiming writers conflict...
    stale = {"rid": {"start": 1, "step": 1, "next": 1}}
    real = type(t)._table_identity
    t._table_identity = lambda: stale
    try:
        # ...but the ALL-MATCHED upsert claims nothing and commits
        v = t.merge_mor(
            spark.range(0, 4).select(F.col("id").alias("k"),
                                     F.lit(-1.0).alias("v")),
            "k",
        )
    finally:
        del t._table_identity
    assert v == t.current_version()
    after = {r["k"]: r["rid"] for r in t.read().collect()}
    assert after == before  # every id carried
    assert t._table_identity()["rid"]["next"] == 5  # untouched
