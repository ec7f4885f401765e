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


def test_sql_merge_insert_only_probes_only_candidate_files(
    spark, tmp_path
):
    """r11-verdict #2: insert-only MERGE must not pay a full-table key
    sweep — matched-key detection reads ONLY the merge planner's
    stats-pruned candidate files, and no existing file is rewritten."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
    files_before = set(t._manifest(t.current_version())["files"])
    src = spark.createDataFrame([(1001, -1), (1500, -2)], "k long, v long")
    src.createOrReplaceTempView("sqldml_ins_only")
    probed = []
    real_scan = t._scan_live

    def spy_scan(manifest, files, keep_pos=False):
        probed.append(list(files))
        return real_scan(manifest, files, keep_pos)

    t._scan_live = spy_scan
    try:
        v = snapshot_sql_on(
            spark,
            t,
            f"MERGE INTO '{t.root}' t USING sqldml_ins_only s ON t.k = s.k "
            f"WHEN NOT MATCHED THEN INSERT *",
        )
    finally:
        t._scan_live = real_scan
    # the matched-key probe opened ONLY the 1000-band candidate file
    assert len(probed) == 1 and len(probed[0]) == 1
    assert "1000" in str(
        spark.read.parquet(*probed[0]).agg(F.min("k")).first()[0]
    ) or spark.read.parquet(*probed[0]).agg(F.min("k")).first()[0] == 1000
    # existing key kept, new key inserted, NO existing file rewritten
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[1001] == 2002 and got[1500] == -2
    assert t.read().count() == 31
    files_after = set(t._manifest(v)["files"])
    assert files_before <= files_after  # append-only commit
    # empty source: clean no-op
    assert t.merge_insert_only(src.limit(0), "k") == v
    # insert-only into an EMPTY table appends everything
    e = SnapshotTable(spark, str(tmp_path / "e"), stats_columns=["k"])
    e.merge_insert_only(src, "k")
    assert e.read().count() == 2
    # duplicate source keys rejected by the shared planner
    dup = spark.createDataFrame([(7, 1), (7, 2)], "k long, v long")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        t.merge_insert_only(dup, "k")


def test_sql_merge_renamed_key_on_predicate(spark, tmp_path):
    """r12 verdict #1a: differently-named equi keys — ``ON t.id =
    s.customer_id`` rename-projects the source (clause text follows
    the rename) and the result equals a join-built expected."""
    t = SnapshotTable(spark, str(tmp_path / "ren"), stats_columns=["id"])
    t.append(_orders(spark))
    src = spark.createDataFrame(
        [(2, "renamed", "US", 99.0), (8, "new", "EU", 80.0)],
        "customer_id long, status string, region string, amount double",
    )
    src.createOrReplaceTempView("sqldml_renkey")
    snapshot_sql(
        spark,
        f"MERGE INTO '{t.root}' AS t USING sqldml_renkey AS s "
        f"ON t.id = s.customer_id "
        f"WHEN MATCHED AND s.customer_id > 0 THEN UPDATE SET "
        f"status = s.status, amount = s.amount "
        f"WHEN NOT MATCHED THEN INSERT "
        f"(id, status, amount) VALUES (s.customer_id, s.status, s.amount)",
    )
    # join-built expected over the same inputs
    base = _orders(spark).alias("b")
    s2 = src.alias("s")
    upd = base.join(s2, F.expr("b.id = s.customer_id"), "left").select(
        F.col("b.id").alias("id"),
        F.coalesce(F.col("s.status"), F.col("b.status")).alias("status"),
        F.col("b.region").alias("region"),
        F.coalesce(F.col("s.amount"), F.col("b.amount")).alias("amount"),
    )
    ins = s2.join(base, F.expr("b.id = s.customer_id"), "left_anti").select(
        F.col("customer_id").alias("id"),
        F.col("status"),
        F.lit(None).cast("string").alias("region"),
        F.col("amount"),
    )
    expected = sorted(tuple(r) for r in upd.unionByName(ins).collect())
    assert _rows(t) == expected
    # no source alias -> rename refused with guidance
    t2 = SnapshotTable(spark, str(tmp_path / "ren2"), stats_columns=["id"])
    t2.append(_orders(spark))
    with pytest.raises(NotImplementedError, match="source alias"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t2.root}' AS t USING sqldml_renkey "
            f"ON t.id = customer_id WHEN MATCHED THEN DELETE",
        )
    # rename colliding with an existing source column refused
    src.withColumn("id", F.lit(0)).createOrReplaceTempView("sqldml_rencol")
    with pytest.raises(NotImplementedError, match="collides"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t2.root}' AS t USING sqldml_rencol AS s "
            f"ON t.id = s.customer_id WHEN MATCHED THEN DELETE",
        )
    # genuinely non-equi ON still refused with guidance
    with pytest.raises(NotImplementedError, match="equality conjunct"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t2.root}' AS t USING sqldml_renkey AS s "
            f"ON t.id > s.customer_id WHEN MATCHED THEN DELETE",
        )


def test_sql_merge_residual_on_predicate(spark, tmp_path):
    """r12 verdict #1b: residual non-equi ON conjuncts gate matching
    ROW-granularly (Delta): a key-equal pair failing the residual is
    NOT matched — its source row INSERTS and its target row becomes
    by-source-eligible — never a silently-matched-unfired pair."""
    a, b = _pair(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "hit", "EU", 1.0), (2, "miss", "US", 2.0),
         (8, "new", "JP", 8.0)],
        "id long, status string, region string, amount double",
    )
    src.createOrReplaceTempView("sqldml_resid")
    snapshot_sql(
        spark,
        f"MERGE INTO '{a.root}' AS t USING sqldml_resid AS s "
        f"ON t.id = s.id AND t.region = 'EU' "
        f"WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *",
    )
    # API twin through merge_when(on_residual=...)
    b.merge_when(
        src, "id",
        matched=[(None, "update_all", None)],
        not_matched=[None],
        on_residual="t.region = 'EU'",
    )
    assert _rows(a) == _rows(b)
    rows = sorted(
        (r["id"], r["status"]) for r in a.read().collect()
    )
    # id=1: region EU -> matched, updated; id=2: key-equal but region
    # US -> NOT matched -> source row inserted NEXT TO the target row;
    # id=8: plain insert
    assert rows.count((1, "hit")) == 1 and (1, "cancelled") not in rows
    assert (2, "cancelled") in rows and (2, "miss") in rows
    assert (8, "new") in rows
    assert a.read().count() == 9
    # residual + by-source: a key-equal target row failing the
    # residual IS not-matched-by-source (row-granular)
    c = SnapshotTable(spark, str(tmp_path / "bysr"), stats_columns=["id"])
    c.append(_orders(spark))
    spark.createDataFrame(
        [(4, "x", "EU", 4.0)],
        "id long, status string, region string, amount double",
    ).createOrReplaceTempView("sqldml_resid_bys")
    snapshot_sql(
        spark,
        f"MERGE INTO '{c.root}' AS t USING sqldml_resid_bys AS s "
        f"ON t.id = s.id AND s.amount > 100 "
        f"WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN "
        f"UPDATE SET status = 'bys'",
    )
    got = {r["id"]: r["status"] for r in c.read().collect()}
    # the (4,4) pair fails the residual -> target row 4 is NOT matched
    # -> the by-source clause fires on it; nothing else changes
    assert got[4] == "bys"
    assert got[1] == "cancelled" and c.read().count() == 7


def test_merge_when_conditional_insert_only_appends(spark, tmp_path):
    """r12 ADVICE medium: a CONDITIONAL insert-only MERGE (only WHEN
    NOT MATCHED clauses routed through merge_when) must take the same
    probe+append path as the unconditional form — no candidate file
    rewritten, only the pruned candidates opened for the key probe —
    not the candidate-rewrite branch that rewrites every candidate
    unchanged just to add the inserts."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
    files_before = set(t._manifest(t.current_version())["files"])
    src = spark.createDataFrame(
        [(1001, -1), (1500, -2), (1600, 0)], "k long, v long"
    )
    src.createOrReplaceTempView("sqldml_cins")
    probed = []
    real_scan = t._scan_live

    def spy_scan(manifest, files, keep_pos=False):
        probed.append(list(files))
        return real_scan(manifest, files, keep_pos)

    t._scan_live = spy_scan
    try:
        v = snapshot_sql_on(
            spark,
            t,
            f"MERGE INTO '{t.root}' t USING sqldml_cins s ON t.k = s.k "
            f"WHEN NOT MATCHED AND s.v < 0 THEN INSERT *",
        )
    finally:
        t._scan_live = real_scan
    # the probe opened ONLY the 1000-band candidate file
    assert len(probed) == 1 and len(probed[0]) == 1
    # 1001 matched -> kept; 1500 unmatched + condition fires -> insert;
    # 1600 unmatched but v=0 fails the clause condition -> dropped
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[1001] == 2002 and got[1500] == -2 and 1600 not in got
    assert t.read().count() == 31
    files_after = set(t._manifest(v)["files"])
    assert files_before <= files_after  # append-only commit
    assert t._manifest(v).get("op") == "append"


def snapshot_sql_on(spark, t, stmt):
    """Run a statement but reuse the instrumented table handle (the
    dispatcher normally constructs its own)."""
    from collective_als_spark.sources import snapshot_sql as mod

    real_ctor = mod.SnapshotTable
    mod.SnapshotTable = lambda _spark, root, **kw: t
    try:
        return snapshot_sql(spark, stmt)
    finally:
        mod.SnapshotTable = real_ctor


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
    # column-level UPDATE SET and INSERT lists are SUPPORTED since
    # r12 (merge_when); a not-matched UPDATE stays refused
    _orders(spark).createOrReplaceTempView("sqldml_bad")
    with pytest.raises(NotImplementedError, match="INSERT"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' t USING sqldml_bad s ON t.id = s.id "
            f"WHEN NOT MATCHED THEN UPDATE SET amount = 0",
        )
    # differently-named keys are SUPPORTED since r13 (rename
    # projection) — but a rename landing on an existing source column
    # is refused with guidance
    with pytest.raises(NotImplementedError, match="collides"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' t USING sqldml_bad s ON t.id = s.region "
            f"WHEN MATCHED THEN DELETE",
        )
    # two DIFFERENT source columns keying ONE target column (r13
    # verdict finding #1) is a guided refusal, not a duplicate-column
    # analysis error downstream
    with pytest.raises(NotImplementedError, match="two different source"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' t USING sqldml_bad s "
            f"ON t.id = s.id AND t.id = s.amount "
            f"WHEN MATCHED THEN DELETE",
        )
    # an exact repeat of the same key conjunct is harmless (deduped)
    v = snapshot_sql(
        spark,
        f"MERGE INTO '{t.root}' t USING "
        f"(SELECT CAST(999 AS LONG) AS id, 'x' AS status, 'EU' AS region, "
        f"CAST(1.0 AS DOUBLE) AS amount) s "
        f"ON t.id = s.id AND t.id = s.id "
        f"WHEN NOT MATCHED THEN INSERT *",
    )
    assert v == 2 and t.read().count() == 8
    snapshot_sql(spark, f"DELETE FROM '{t.root}' WHERE id = 999")
    with pytest.raises(ValueError, match="SET"):
        snapshot_sql(spark, f"UPDATE '{t.root}' WHERE id = 1")
    # the table is untouched by every refused statement
    assert t.read().count() == 7


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
        snapshot_sql(spark, f"ALTER TABLE '{t.root}' SPARKLE HARDER")


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


def test_sql_merge_conditional_clauses(spark, tmp_path):
    """r11-verdict #4: the full Delta MERGE clause matrix — WHEN
    MATCHED [AND cond] THEN UPDATE SET col = expr / DELETE, WHEN NOT
    MATCHED [AND cond] THEN INSERT *, first-matching-clause-wins."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    src = spark.createDataFrame(
        [
            (1, "cancel-me", "EU", 5.0),     # matched, cond1 -> DELETE
            (2, "boost", "US", 500.0),       # matched, cond2 -> UPDATE
            (3, "small", "JP", 1.0),         # matched, no clause: kept
            (8, "new", "EU", 80.0),          # unmatched, amount>0 -> INSERT
            (9, "reject", "US", -1.0),       # unmatched, cond fails
        ],
        "id long, status string, region string, amount double",
    )
    src.createOrReplaceTempView("sqldml_cond")
    v = snapshot_sql(
        spark,
        f"MERGE INTO '{t.root}' AS tgt USING sqldml_cond AS src "
        f"ON tgt.id = src.id "
        f"WHEN MATCHED AND src.status = 'cancel-me' THEN DELETE "
        f"WHEN MATCHED AND src.amount > tgt.amount THEN UPDATE SET "
        f"amount = src.amount + tgt.amount, status = 'boosted' "
        f"WHEN NOT MATCHED AND src.amount > 0 THEN INSERT *",
    )
    rows = {r["id"]: (r["status"], r["region"], r["amount"])
            for r in t.read().collect()}
    assert 1 not in rows                       # deleted
    assert rows[2] == ("boosted", "US", 520.0)  # conditional update
    assert rows[3] == ("cancelled", "JP", 30.0)  # no clause fired: kept
    assert rows[8] == ("new", "EU", 80.0)      # conditional insert
    assert 9 not in rows                       # insert cond failed
    assert len(rows) == 7  # 7 - 1 deleted + 1 inserted
    assert v == t.current_version()
    # clause ORDER decides: first matching clause wins
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), stats_columns=["id"])
    t2.append(_orders(spark))
    src2 = spark.createDataFrame(
        [(1, "x", "EU", 999.0)],
        "id long, status string, region string, amount double",
    )
    src2.createOrReplaceTempView("sqldml_cond2")
    snapshot_sql(
        spark,
        f"MERGE INTO '{t2.root}' t USING sqldml_cond2 s ON t.id = s.id "
        f"WHEN MATCHED AND s.amount > 0 THEN UPDATE SET status = 'first' "
        f"WHEN MATCHED THEN DELETE",
    )
    got2 = {r["id"]: r["status"] for r in t2.read().collect()}
    assert got2[1] == "first" and len(got2) == 7
    # ...and flipping the order makes DELETE win
    t3 = SnapshotTable(spark, str(tmp_path / "t3"), stats_columns=["id"])
    t3.append(_orders(spark))
    snapshot_sql(
        spark,
        f"MERGE INTO '{t3.root}' t USING sqldml_cond2 s ON t.id = s.id "
        f"WHEN MATCHED THEN DELETE "
        f"WHEN MATCHED AND s.amount > 0 THEN UPDATE SET status = 'first'",
    )
    assert 1 not in {r["id"] for r in t3.read().collect()}
    # conditional UPDATE SET * (matched upsert only over a band)
    t4 = SnapshotTable(spark, str(tmp_path / "t4"), stats_columns=["id"])
    t4.append(_orders(spark))
    snapshot_sql(
        spark,
        f"MERGE INTO '{t4.root}' t USING sqldml_cond2 s ON t.id = s.id "
        f"WHEN MATCHED AND t.status = 'cancelled' THEN UPDATE SET *",
    )
    got4 = {r["id"]: r["amount"] for r in t4.read().collect()}
    assert got4[1] == 999.0 and len(got4) == 7
    # refusal: a not-matched UPDATE action is not a MERGE shape
    with pytest.raises(NotImplementedError, match="INSERT"):
        snapshot_sql(
            spark,
            f"MERGE INTO '{t4.root}' t USING sqldml_cond2 s ON t.id = s.id "
            f"WHEN NOT MATCHED THEN UPDATE SET amount = 0",
        )
    # string literal containing ' THEN ' survives clause parsing
    t5 = SnapshotTable(spark, str(tmp_path / "t5"), stats_columns=["id"])
    t5.append(_orders(spark))
    snapshot_sql(
        spark,
        f"MERGE INTO '{t5.root}' t USING sqldml_cond2 s ON t.id = s.id "
        f"WHEN MATCHED THEN UPDATE SET status = "
        f"CASE WHEN s.amount > 0 THEN 'pos' ELSE 'neg' END",
    )
    assert {r["id"]: r["status"] for r in t5.read().collect()}[1] == "pos"


def test_sql_merge_by_source_and_insert_lists(spark, tmp_path):
    """The rest of Delta's MERGE matrix: WHEN NOT MATCHED BY SOURCE
    (DELETE / UPDATE SET over target rows no source key touches, with
    the clause condition doubling as a pruning predicate) and
    column-level INSERT (cols) VALUES (exprs)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    src = spark.createDataFrame(
        [(1, "seen", "EU", 11.0), (8, "new", "JP", 80.0)],
        "id long, status string, region string, amount double",
    )
    src.createOrReplaceTempView("sqldml_bys")
    snapshot_sql(
        spark,
        f"MERGE INTO '{t.root}' AS tgt USING sqldml_bys AS src "
        f"ON tgt.id = src.id "
        f"WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED AND src.amount > 0 THEN "
        f"INSERT (id, status, amount) VALUES (src.id, "
        f"concat(src.status, '-ins'), src.amount / 2) "
        f"WHEN NOT MATCHED BY SOURCE AND tgt.amount > 45 THEN DELETE "
        f"WHEN NOT MATCHED BY SOURCE AND tgt.status = 'open' THEN "
        f"UPDATE SET status = 'stale'",
    )
    rows = {r["id"]: (r["status"], r["region"], r["amount"])
            for r in t.read().collect()}
    # by-source rows are 2..7: amount>45 deletes 5,6,7; status='open'
    # then updates 4 (7 is open too but the DELETE clause fired first)
    assert rows[1] == ("seen", "EU", 11.0)        # matched update
    assert rows[8] == ("new-ins", None, 40.0)     # column-level insert
    assert not {5, 6, 7} & set(rows)              # by-source deletes
    assert rows[4] == ("stale", "EU", 40.0)       # by-source update
    assert rows[2] == ("cancelled", "US", 20.0)   # untouched
    assert set(rows) == {1, 2, 3, 4, 8}


def test_merge_when_by_source_prunes_files(spark, tmp_path):
    """By-source clause conditions drive file pruning: a banded table
    where no clause can fire keeps its out-of-band files untouched
    (never opened for the by-source rewrite)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
    before = set(t._manifest(t.current_version())["files"])
    src = spark.createDataFrame([(1001, -1)], "k long, v long")
    t.merge_when(
        src,
        "k",
        matched=[(None, "update_all", None)],
        not_matched_by_source=[("k BETWEEN 1000 AND 1100", "update",
                                {"v": "v + 1"})],
    )
    after = set(t._manifest(t.current_version())["files"])
    # 0-band and 2000-band files untouched by path: neither the
    # source key rectangle nor the by-source condition reaches them
    assert len(before & after) == 2
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[1001] == -1          # matched update_all
    assert got[1002] == 2005        # by-source +1
    assert got[0] == 0 and got[2005] == 4010  # untouched bands
    # CDF tables image by-source effects (r12 verdict #4): a by-source
    # delete appears as a delete row in the commit's change files
    c = SnapshotTable(
        spark, str(tmp_path / "cdf"), stats_columns=["k"],
        change_data_feed=True,
    )
    c.append(spark.range(3).select(F.col("id").alias("k")))
    v2 = c.merge_when(
        spark.range(1).select(F.col("id").alias("k")),
        "k",
        not_matched_by_source=[("k >= 2", "delete", None)],
    )
    assert sorted(r["k"] for r in c.read().collect()) == [0, 1]
    cdc_dir = c._manifest(v2)["cdc"]
    images = [
        (r["_change_type"], r["k"])
        for r in spark.read.parquet(cdc_dir).collect()
    ]
    assert images == [("delete", 2)]  # row-level: k=0/1 never imaged
    # empty source + by-source refused with guidance
    with pytest.raises(ValueError, match="delete_where"):
        t.merge_when(
            src.limit(0), "k",
            not_matched_by_source=[(None, "delete", None)],
        )


def test_merge_when_matched_unfired_rows_escape_by_source(spark, tmp_path):
    """A target row whose key IS in the source but whose matched
    clauses all fail is MATCHED — the by-source clause group must
    never touch it, even when its values satisfy a by-source
    condition (clause groups partition by match status, not effect)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(
        spark.createDataFrame(
            [(1, 99.0), (2, 99.0), (3, 1.0)], "k long, v double"
        )
    )
    src = spark.createDataFrame([(1, 0.0)], "k long, v double")
    t.merge_when(
        src,
        "k",
        # matched clause never fires (0.0 > 99.0 is false)
        matched=[("s.v > t.v", "update_all", None)],
        # by-source condition that row k=1 WOULD satisfy
        not_matched_by_source=[("v > 50", "delete", None)],
    )
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    # k=1 is matched (unfired) -> kept; k=2 is unmatched and fires ->
    # deleted; k=3 unmatched, condition false -> kept
    assert rows == {1: 99.0, 3: 1.0}


def test_sql_restore_timestamp_as_of(spark, tmp_path):
    """RESTORE TO TIMESTAMP AS OF resolves through version_at (newest
    commit at or before the instant) and errors on future instants."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    ts1 = t._raw_manifest(1)["committed_at"]
    snapshot_sql(spark, f"DELETE FROM '{t.root}' WHERE id <= 3")
    assert t.read().count() == 4
    v = snapshot_sql(
        spark, f"RESTORE '{t.root}' TO TIMESTAMP AS OF {ts1}"
    )
    assert v == t.current_version() and t.read().count() == 7
    with pytest.raises(ValueError, match="after the newest commit"):
        snapshot_sql(
            spark, f"RESTORE '{t.root}' TO TIMESTAMP AS OF {ts1 + 1e9}"
        )
    with pytest.raises(ValueError, match="RESTORE needs"):
        snapshot_sql(spark, f"RESTORE '{t.root}' TO YESTERDAY")


def test_sql_optimize_zorder(spark, tmp_path):
    """OPTIMIZE .. ZORDER BY (x, y): after the Morton relayout, box
    predicates on EITHER dimension prune files — the property linear
    clustering on one key cannot give the trailing dimension."""
    import random

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["x", "y"])
    rng = random.Random(7)
    rows = [
        (rng.randint(0, 9999), rng.randint(0, 9999)) for _ in range(20000)
    ]
    t.append(
        spark.createDataFrame(rows, "x long, y long").repartition(8)
    )
    v = snapshot_sql(
        spark, f"OPTIMIZE '{t.root}' TARGET 1250 ROWS ZORDER BY (x, y)"
    )
    assert v == t.current_version()
    total = len(t._manifest(v)["files"])
    assert total >= 8
    x_scan = t.read(where="x BETWEEN 100 AND 600")
    y_scan = t.read(where="y BETWEEN 100 AND 600")
    assert len(x_scan.inputFiles()) < total
    assert len(y_scan.inputFiles()) < total
    # content unchanged by the relayout
    assert t.read().count() == 20000
    assert x_scan.count() == sum(1 for x, _ in rows if 100 <= x <= 600)
    assert y_scan.count() == sum(1 for _, y in rows if 100 <= y <= 600)
    # shape errors
    with pytest.raises(ValueError, match="exactly two"):
        t.compact(target_rows_per_file=1000, zorder_by=["x"])
    with pytest.raises(ValueError, match="cluster_by OR zorder_by"):
        t.compact(
            target_rows_per_file=1000, cluster_by=["x"], zorder_by=["x", "y"]
        )
    # an empty ZORDER column list must not silently degrade to a
    # round-robin rewrite that destroys the clustering
    with pytest.raises(ValueError, match="non-empty"):
        snapshot_sql(
            spark, f"OPTIMIZE '{t.root}' TARGET 1000 ROWS ZORDER BY ()"
        )


def test_sql_parser_quote_and_function_context(spark, tmp_path):
    """r11-ADVICE parser edges: (1) alias stripping must not rewrite
    matching text inside string literals; (2) an intra-function FROM
    (EXTRACT / TRIM) must not hijack the following quoted literal as a
    table root."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    # literal 't. x' survives alias stripping; t.status is stripped
    snapshot_sql(
        spark,
        f"UPDATE '{t.root}' AS t SET status = 't. x' WHERE t.id = 1",
    )
    got = {r["id"]: r["status"] for r in t.read().collect()}
    assert got[1] == "t. x" and got[2] == "cancelled"
    # EXTRACT(... FROM '<date literal>') keeps its literal while the
    # real FROM still resolves the snapshot root
    y = snapshot_sql(
        spark,
        f"SELECT EXTRACT(YEAR FROM DATE '2021-03-04') AS y, count(*) AS n "
        f"FROM '{t.root}' GROUP BY 1",
    )
    assert (y.first()["y"], y.first()["n"]) == (2021, 7)
    # TRIM(BOTH 'x' FROM col) — quoted literal directly after FROM
    # inside a function region
    tr = snapshot_sql(
        spark,
        f"SELECT TRIM(BOTH 'c' FROM status) AS s FROM '{t.root}' "
        f"WHERE id = 2",
    )
    assert tr.first()["s"] == "ancelled"
    # and a SUBQUERY region still rewrites its own FROM
    sub = snapshot_sql(
        spark,
        f"SELECT max(n) AS m FROM (SELECT count(*) AS n FROM '{t.root}')",
    )
    assert sub.first()["m"] == 7
    # a scalar subquery nested inside a FUNCTION paren is relation
    # context again (innermost frame decides)
    sc = snapshot_sql(
        spark,
        f"SELECT coalesce((SELECT max(id) FROM '{t.root}'), 0) AS m",
    )
    assert sc.first()["m"] == 7


def test_sql_apply_changes_into_scd2_and_read_current(spark, tmp_path):
    """r11-verdict #7: the DLT APPLY CHANGES INTO statement shape over
    apply_changes, STORED AS SCD TYPE 2, equal to the Python-API
    result; read_current() is the open-interval view."""
    seed = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1), (3, 30, 1)], "k long, v long, ts long"
    )
    changes = spark.createDataFrame(
        [(1, 99, 5, "upsert"), (2, 0, 5, "del"), (4, 40, 5, "upsert")],
        "k long, v long, ts long, op string",
    )
    changes.createOrReplaceTempView("sqldml_cdc")
    # seed via the API, apply the CDC batch via the STATEMENT
    b = SnapshotTable(spark, str(tmp_path / "b"), stats_columns=["k"])
    b.apply_changes(
        seed.withColumn("_op", F.lit("U")), "k", seq_col="ts", scd_type=2
    )
    snapshot_sql(
        spark,
        f"APPLY CHANGES INTO '{b.root}' FROM sqldml_cdc KEYS (k) "
        f"APPLY AS DELETE WHEN op = 'del' "
        f"SEQUENCE BY ts STORED AS SCD TYPE 2",
    )
    hist = {
        (r["k"], r["__START_AT"], r["__END_AT"]): r["v"]
        for r in b.read().collect()
    }
    # k=1: closed (1,5) + open 99@5; k=2: closed; k=3 open; k=4 open
    assert hist[(1, 1, 5)] == 10 and hist[(1, 5, None)] == 99
    assert (2, 1, 5) in hist and (2, 5, None) not in hist
    assert hist[(3, 1, None)] == 30 and hist[(4, 5, None)] == 40
    cur = {r["k"]: r["v"] for r in b.read_current().collect()}
    assert cur == {1: 99, 3: 30, 4: 40}
    # read_current refuses a non-SCD2 table with guidance
    plain = SnapshotTable(spark, str(tmp_path / "p"))
    plain.append(seed)
    with pytest.raises(ValueError, match="not an SCD TYPE 2"):
        plain.read_current()
    # SCD TYPE 1 statement: op synthesis deletes / upserts in place
    c = SnapshotTable(spark, str(tmp_path / "c"), stats_columns=["k"])
    c.append(seed.select("k", "v"))
    snapshot_sql(
        spark,
        f"APPLY CHANGES INTO '{c.root}' FROM "
        f"(SELECT k, v, op FROM sqldml_cdc) KEYS (k) "
        f"APPLY AS DELETE WHEN op = 'del'",
    )
    got = {r["k"]: r["v"] for r in c.read().collect()}
    assert got == {1: 99, 3: 30, 4: 40}
    # a source column named like a clause keyword inside the delete
    # condition must not clobber the real clause spans
    d2 = SnapshotTable(spark, str(tmp_path / "d2"), stats_columns=["k"])
    d2.append(
        spark.createDataFrame(
            [(1, 10, "keep"), (2, 20, "keep")], "k long, v long, stored string"
        )
    )
    spark.createDataFrame(
        [(1, 99, "del"), (3, 30, "keep")], "k long, v long, stored string"
    ).createOrReplaceTempView("sqldml_cdc_kw")
    snapshot_sql(
        spark,
        f"APPLY CHANGES INTO '{d2.root}' FROM sqldml_cdc_kw KEYS (k) "
        f"APPLY AS DELETE WHEN stored = 'del'",
    )
    assert {r["k"]: r["v"] for r in d2.read().collect()} == {2: 20, 3: 30}
    # r12 ADVICE low: a FUNCTION CALL spelled like a clause keyword
    # inside the delete condition (keys(v)) must not truncate the
    # APPLY span at its mark — already-bound clause words are ignored
    # when computing span ENDS, not just starts
    spark.udf.register("keys", lambda x: x, "long")
    d3 = SnapshotTable(spark, str(tmp_path / "d3"), stats_columns=["k"])
    d3.append(seed.select("k", "v"))
    snapshot_sql(
        spark,
        f"APPLY CHANGES INTO '{d3.root}' FROM "
        f"(SELECT k, v, op FROM sqldml_cdc) KEYS (k) "
        f"APPLY AS DELETE WHEN op = 'del' AND keys(v) >= 0",
    )
    assert {r["k"]: r["v"] for r in d3.read().collect()} == {
        1: 99, 3: 30, 4: 40
    }
    # error shapes
    with pytest.raises(ValueError, match="KEYS"):
        snapshot_sql(
            spark, f"APPLY CHANGES INTO '{c.root}' FROM sqldml_cdc"
        )
    with pytest.raises(ValueError, match="SCD TYPE"):
        snapshot_sql(
            spark,
            f"APPLY CHANGES INTO '{c.root}' FROM sqldml_cdc KEYS (k) "
            f"STORED AS SCD TYPE 3",
        )


def test_sql_table_changes_function(spark, tmp_path):
    """Delta's CDF table-valued function: ``SELECT ... FROM
    table_changes('<root>', start[, end])`` — inclusive version window,
    per-commit attribution, _commit_timestamp from the manifest."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(spark.range(1, 6).select(F.col("id").alias("k")))   # v1
    snapshot_sql(spark, f"DELETE FROM '{t.root}' WHERE k <= 2")  # v2
    t.append(spark.createDataFrame([(10,)], "k long"))           # v3
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in snapshot_sql(
            spark,
            f"SELECT _commit_version, _change_type, k FROM "
            f"table_changes('{t.root}', 2)",
        ).collect()
    )
    assert rows == [
        (2, "delete", 1), (2, "delete", 2), (3, "insert", 10),
    ]
    # explicit inclusive end bounds the window
    rows = sorted(
        (r["_change_type"], r["k"])
        for r in snapshot_sql(
            spark,
            f"SELECT * FROM table_changes('{t.root}', 2, 2)",
        ).collect()
    )
    assert rows == [("delete", 1), ("delete", 2)]
    # timestamps ride along as a real TIMESTAMP column (r13 verdict
    # missing #3: previously a raw double), non-null for every
    # timestamped commit
    ts_df = snapshot_sql(
        spark,
        f"SELECT min(_commit_timestamp) AS m FROM "
        f"table_changes('{t.root}', 1)",
    )
    assert dict(ts_df.dtypes)["m"] == "timestamp"
    import datetime

    ts = ts_df.first()["m"]
    assert isinstance(ts, datetime.datetime)
    # timestamp BOUNDS (r14): quoted literals disambiguate from
    # integer versions, Delta's convention. Start = earliest commit
    # at-or-after; end = newest at-or-before (the RESTORE comparator).
    ts2 = float(t._raw_manifest(2)["committed_at"])
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["k"])
        for r in snapshot_sql(
            spark,
            f"SELECT _commit_version, _change_type, k FROM "
            f"table_changes('{t.root}', '{ts2}')",
        ).collect()
    )
    assert rows == [
        (2, "delete", 1), (2, "delete", 2), (3, "insert", 10),
    ]
    # end as a timestamp pins the window to [v1, v2]
    n = snapshot_sql(
        spark,
        f"SELECT count(*) AS n FROM "
        f"table_changes('{t.root}', 1, '{ts2}')",
    ).first()["n"]
    assert n == 7  # 5 v1 inserts + 2 v2 deletes
    # an instant strictly between v2 and v3 starts at v3; one before
    # every commit starts at v1; ISO form parses (UTC)
    ts3 = float(t._raw_manifest(3)["committed_at"])
    mid = (ts2 + ts3) / 2
    got = {
        r["_commit_version"]
        for r in snapshot_sql(
            spark,
            f"SELECT _commit_version FROM "
            f"table_changes('{t.root}', '{mid}')",
        ).collect()
    }
    assert got == {3}
    n_all = snapshot_sql(
        spark,
        f"SELECT count(*) AS n FROM "
        f"table_changes('{t.root}', '1970-01-01')",
    ).first()["n"]
    assert n_all == 8
    # a start instant after the newest commit is out of range
    with pytest.raises(ValueError, match="after the newest commit"):
        snapshot_sql(
            spark,
            f"SELECT * FROM table_changes('{t.root}', '{ts3 + 9999}')",
        )
    with pytest.raises(ValueError, match="bad timestamp literal"):
        snapshot_sql(
            spark,
            f"SELECT * FROM table_changes('{t.root}', 'not-a-time')",
        )
    # composes with ordinary SQL (aggregation + alias)
    agg = {
        (r["_commit_version"], r["n"])
        for r in snapshot_sql(
            spark,
            f"SELECT ch._commit_version, count(*) AS n FROM "
            f"table_changes('{t.root}', 1) ch GROUP BY ch._commit_version",
        ).collect()
    }
    assert agg == {(1, 5), (2, 2), (3, 1)}
    # error shapes
    with pytest.raises(ValueError, match="start must be >= 1"):
        snapshot_sql(
            spark, f"SELECT * FROM table_changes('{t.root}', 0)"
        )
    with pytest.raises(ValueError, match="quoted path"):
        snapshot_sql(spark, "SELECT * FROM table_changes(nope, 1)")
    # a string literal naming table_changes is untouched
    lit = snapshot_sql(
        spark, "SELECT 'table_changes(''x'', 1)' AS s"
    ).first()["s"]
    assert lit == "table_changes('x', 1)"


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


def test_sql_describe_table(spark, tmp_path):
    """DESCRIBE TABLE (r14): one row per logical column with its
    declared properties (generated / identity / default)."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' ("
        f"  k BIGINT,"
        f"  y INT GENERATED ALWAYS AS (CAST(k % 7 AS INT)),"
        f"  rid BIGINT GENERATED ALWAYS AS IDENTITY "
        f"      (START WITH 5 INCREMENT BY 5),"
        f"  tag STRING DEFAULT 'x'"
        f")",
    )
    rows = snapshot_sql(spark, f"DESCRIBE TABLE '{root}'").collect()
    by_name = {r["col_name"]: r for r in rows}
    assert [r["col_name"] for r in rows] == ["k", "y", "rid", "tag"]
    assert by_name["k"]["data_type"] == "bigint"
    assert by_name["k"]["properties"] is None
    assert by_name["y"]["properties"] == (
        "GENERATED ALWAYS AS (CAST(k % 7 AS INT))"
    )
    assert by_name["rid"]["properties"] == (
        "GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 5)"
    )
    assert by_name["tag"]["properties"] == "DEFAULT 'x'"
    # logical names ride a rename (k is refused — the generated
    # column y reads it, the r15 guard; tag is free to move)
    with pytest.raises(ValueError, match="computed from"):
        snapshot_sql(spark, f"ALTER TABLE '{root}' RENAME COLUMN k TO kk")
    snapshot_sql(spark, f"ALTER TABLE '{root}' RENAME COLUMN tag TO label")
    rows = snapshot_sql(spark, f"DESCRIBE TABLE '{root}'").collect()
    assert [r["col_name"] for r in rows] == ["k", "y", "rid", "label"]
    by_name = {r["col_name"]: r for r in rows}
    # the DEFAULT followed the rename (r15 governance rekey)
    assert by_name["label"]["properties"] == "DEFAULT 'x'"


def test_sql_insert_values_maps_positionally(spark, tmp_path):
    """``INSERT INTO t VALUES (..)`` with no column list: the VALUES
    columns surface as col1/col2/... — when NO query column names the
    table, the mapping is POSITIONAL (ANSI / Delta). Previously this
    silently schema-evolved colN columns and NULL-padded the real
    ones — a wrong answer, not a write."""
    root = str(tmp_path / "t")
    snapshot_sql(spark, f"CREATE TABLE '{root}' (k BIGINT, v BIGINT)")
    snapshot_sql(spark, f"INSERT INTO '{root}' VALUES (1000, 1), (2000, 2)")
    t = SnapshotTable(spark, root)
    assert t.read().columns == ["k", "v"]
    assert sorted(tuple(r) for r in t.read().collect()) == [
        (1000, 1), (2000, 2),
    ]
    # computed columns don't count toward the positional arity: a
    # 1-wide VALUES fits the 1 writable column (rid is identity)
    root2 = str(tmp_path / "t2")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root2}' (k BIGINT, "
        f"rid BIGINT GENERATED ALWAYS AS IDENTITY)",
    )
    snapshot_sql(spark, f"INSERT INTO '{root2}' VALUES (7)")
    t2 = SnapshotTable(spark, root2)
    assert {tuple(r) for r in t2.read().collect()} == {(7, 1)}
    # arity that fits neither all columns nor the writable ones is a
    # guided refusal, never a silent evolution
    with pytest.raises(ValueError, match="list the target columns"):
        snapshot_sql(spark, f"INSERT INTO '{root}' VALUES (1, 2, 3)")
    # named queries keep the name-matching path (any order)
    snapshot_sql(
        spark, f"INSERT INTO '{root}' SELECT 9 AS v, 3000 AS k"
    )
    assert (3000, 9) in {tuple(r) for r in t.read().collect()}


def test_sql_shallow_clone(spark, tmp_path):
    """``CREATE TABLE '<dst>' SHALLOW CLONE '<src>' [VERSION AS OF v |
    TIMESTAMP AS OF ts]`` (r14 verdict missing #2): one metadata
    commit referencing the source files; version pin via the RESTORE
    temporal comparator; full clone independence (writes to the clone
    never touch the source)."""
    src_root = str(tmp_path / "src")
    t = SnapshotTable(spark, src_root, stats_columns=["k"])
    t.append(spark.range(0, 10).select(F.col("id").alias("k"),
                                       (F.col("id") * 2).alias("v")))
    v1_files = set(t._manifest(1)["files"])
    t.append(spark.range(10, 20).select(F.col("id").alias("k"),
                                        (F.col("id") * 2).alias("v")))
    # pinned shallow clone of v1
    dst1 = str(tmp_path / "dst1")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{dst1}' SHALLOW CLONE '{src_root}' "
        f"VERSION AS OF 1",
    )
    c1 = SnapshotTable(spark, dst1)
    assert c1.read().count() == 10
    # shallow: the clone's v1 REFERENCES the source's files by path
    assert set(c1._manifest(1)["files"]) == v1_files
    # head clone (no pin) sees all 20 rows
    dst2 = str(tmp_path / "dst2")
    snapshot_sql(spark, f"CREATE TABLE '{dst2}' SHALLOW CLONE '{src_root}'")
    c2 = SnapshotTable(spark, dst2)
    assert c2.read().count() == 20
    # independence: clone writes stage under the clone's root and the
    # source never changes
    src_head = t.current_version()
    c2.append(spark.range(100, 103).select(F.col("id").alias("k"),
                                           (F.col("id") * 2).alias("v")))
    assert t.current_version() == src_head
    assert t.read().count() == 20
    assert c2.read().count() == 23
    new_files = set(c2._manifest(2)["files"]) - set(c2._manifest(1)["files"])
    assert all(f.startswith(dst2) for f in new_files)
    # TIMESTAMP AS OF resolves via newest-commit-at-or-before
    ts1 = t._raw_manifest(1)["committed_at"]
    dst3 = str(tmp_path / "dst3")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{dst3}' SHALLOW CLONE '{src_root}' "
        f"TIMESTAMP AS OF {ts1}",
    )
    assert SnapshotTable(spark, dst3).read().count() == 10
    # DEEP clone materializes its own files
    dst4 = str(tmp_path / "dst4")
    snapshot_sql(spark, f"CREATE TABLE '{dst4}' DEEP CLONE '{src_root}'")
    c4 = SnapshotTable(spark, dst4)
    assert c4.read().count() == 20
    assert all(f.startswith(dst4) for f in c4._manifest(1)["files"])
    # error shapes: non-empty target, OR REPLACE, trailing junk
    with pytest.raises(ValueError, match="already holds"):
        snapshot_sql(
            spark, f"CREATE TABLE '{dst1}' SHALLOW CLONE '{src_root}'"
        )
    with pytest.raises(NotImplementedError, match="fresh root"):
        snapshot_sql(
            spark,
            f"CREATE OR REPLACE TABLE '{dst1}' SHALLOW CLONE "
            f"'{src_root}'",
        )
    with pytest.raises(ValueError, match="CLONE takes"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{tmp_path / 'dst5'}' SHALLOW CLONE "
            f"'{src_root}' AS OF 3",
        )


def test_sql_table_properties_and_comment(spark, tmp_path):
    """Table-level properties surface (r14 verdict missing #4):
    COMMENT ON TABLE, SET/UNSET TBLPROPERTIES, SHOW TBLPROPERTIES
    (user props + the manifest's engine config under engine.*), the
    CREATE-suffix TBLPROPERTIES/COMMENT clauses, DESCRIBE DETAIL
    parity, and the governance lifecycle (carry, RESTORE survival,
    OR REPLACE clear)."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT) "
        f"PARTITIONED BY (k) "
        f"TBLPROPERTIES ('team' = 'data-eng', quality.tier = 'gold') "
        f"COMMENT 'it''s the orders table'",
        stats_columns=["k"],
    )
    t = SnapshotTable(spark, root)
    props = {r["key"]: r["value"]
             for r in snapshot_sql(spark, f"SHOW TBLPROPERTIES '{root}'")
             .collect()}
    assert props["team"] == "data-eng"
    assert props["quality.tier"] == "gold"
    assert props["comment"] == "it's the orders table"
    assert props["engine.stats_columns"] == "k"
    assert props["engine.partitioned_by"] == "k"
    # DESCRIBE DETAIL parity
    d = t.detail().first()
    assert d["table_comment"] == "it's the orders table"
    assert d["partitioned_by"] == "k"
    # SET merges, UNSET deletes, COMMENT ON TABLE updates/clears
    snapshot_sql(
        spark,
        f"ALTER TABLE '{root}' SET TBLPROPERTIES "
        f"(team = 'ml', 'retention.days' = 30)",
    )
    snapshot_sql(
        spark,
        f"ALTER TABLE '{root}' UNSET TBLPROPERTIES ('quality.tier')",
    )
    snapshot_sql(spark, f"COMMENT ON TABLE '{root}' IS 'new comment'")
    props = {r["key"]: r["value"] for r in t.show_tblproperties().collect()}
    assert props["team"] == "ml"
    assert props["retention.days"] == "30"
    assert "quality.tier" not in props
    assert props["comment"] == "new comment"
    # properties CARRY across data commits and survive RESTORE
    t.append(spark.createDataFrame([(1, 2)], "k long, v long"))
    t.restore(t.current_version() - 1)
    props = {r["key"]: r["value"] for r in t.show_tblproperties().collect()}
    assert props["team"] == "ml" and props["comment"] == "new comment"
    # IS NULL clears the comment
    snapshot_sql(spark, f"COMMENT ON TABLE '{root}' IS NULL")
    props = {r["key"]: r["value"] for r in t.show_tblproperties().collect()}
    assert "comment" not in props
    assert t.detail().first()["table_comment"] is None
    # OR REPLACE clears properties with the rest of the governance
    snapshot_sql(
        spark, f"CREATE OR REPLACE TABLE '{root}' AS SELECT 1 AS a"
    )
    props = {r["key"]: r["value"]
             for r in SnapshotTable(spark, root)
             .show_tblproperties().collect()}
    assert "team" not in props
    # plain-CTAS suffix clauses work too (any order)
    root2 = str(tmp_path / "t2")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root2}' COMMENT 'ctas table' "
        f"TBLPROPERTIES (x = '1') AS SELECT 1 AS a",
    )
    props = {r["key"]: r["value"]
             for r in SnapshotTable(spark, root2)
             .show_tblproperties().collect()}
    assert props == {"comment": "ctas table", "x": "1"}
    # error shapes
    with pytest.raises(ValueError, match="key = value"):
        snapshot_sql(
            spark, f"ALTER TABLE '{root2}' SET TBLPROPERTIES (oops)"
        )
    with pytest.raises(ValueError, match="COMMENT ON TABLE needs"):
        snapshot_sql(spark, f"COMMENT ON TABLE '{root2}' IS 42")


def test_sql_quoted_timestamp_literals_everywhere(spark, tmp_path):
    """r15 consistency: SELECT ... TIMESTAMP AS OF and RESTORE ... TO
    TIMESTAMP AS OF accept quoted epoch/ISO literals through the SAME
    UTC comparator as table_changes()/CLONE — a user who learned one
    spelling must not get a parse error from the next statement."""
    import datetime as _dt

    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root, stats_columns=["k"])
    t.append(spark.range(0, 5).select(F.col("id").alias("k")))   # v1
    t.append(spark.range(5, 9).select(F.col("id").alias("k")))   # v2
    ts1 = t._raw_manifest(1)["committed_at"]
    # quoted numeric epoch
    rows = snapshot_sql(
        spark,
        f"SELECT count(*) AS n FROM '{root}' TIMESTAMP AS OF '{ts1}'",
    ).first()
    assert rows["n"] == 5
    # quoted ISO datetime (UTC)
    iso = _dt.datetime.fromtimestamp(
        ts1, _dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")
    # the ISO second floor may predate the commit's sub-second stamp —
    # nudge to the next full second, which is still before v2 unless
    # the two commits landed in the same second (then skip the check)
    ts_next = _dt.datetime.fromtimestamp(
        ts1, _dt.timezone.utc
    ).replace(microsecond=0) + _dt.timedelta(seconds=1)
    if ts_next.timestamp() < t._raw_manifest(2)["committed_at"]:
        iso2 = ts_next.strftime("%Y-%m-%d %H:%M:%S")
        rows = snapshot_sql(
            spark,
            f"SELECT count(*) AS n FROM '{root}' "
            f"TIMESTAMP AS OF '{iso2}'",
        ).first()
        assert rows["n"] == 5
    # RESTORE with a quoted literal resolves the same way
    snapshot_sql(
        spark, f"RESTORE '{root}' TO TIMESTAMP AS OF '{ts1}'"
    )
    assert t.read().count() == 5


def test_sql_alter_column_not_null(spark, tmp_path):
    """``ALTER COLUMN c SET NOT NULL`` is the auto-named CHECK the
    CREATE-list suffix declares; declaring it over existing NULLs is
    refused (Delta's rule); DROP NOT NULL removes it."""
    root = str(tmp_path / "t")
    snapshot_sql(spark, f"CREATE TABLE '{root}' (k BIGINT, v STRING)")
    t = SnapshotTable(spark, root)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    snapshot_sql(spark, f"ALTER TABLE '{root}' ALTER COLUMN v SET NOT NULL")
    assert "v_not_null" in t._table_checks()
    with pytest.raises(ValueError, match="v_not_null"):
        t.append(spark.createDataFrame([(3, None)], "k long, v string"))
    assert t.read().count() == 2  # the violating batch never landed
    snapshot_sql(spark, f"ALTER TABLE '{root}' ALTER COLUMN v DROP NOT NULL")
    assert "v_not_null" not in t._table_checks()
    t.append(spark.createDataFrame([(3, None)], "k long, v string"))
    assert t.read().count() == 3
    # declaring over existing NULLs is refused (add_check validates)
    with pytest.raises(ValueError, match="violate"):
        snapshot_sql(
            spark, f"ALTER TABLE '{root}' ALTER COLUMN v SET NOT NULL"
        )
    # dropping an undeclared NOT NULL is a guided error
    with pytest.raises(ValueError, match="no NOT NULL"):
        snapshot_sql(
            spark, f"ALTER TABLE '{root}' ALTER COLUMN k DROP NOT NULL"
        )


def test_sql_create_table_like(spark, tmp_path):
    """``CREATE TABLE '<dst>' LIKE '<src>'``: schema + governance on a
    fresh EMPTY table — checks, generated/identity (counter restarts
    at START), defaults, comments, declared layout, user properties —
    and NO data (that is CLONE's job)."""
    src_root = str(tmp_path / "src")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{src_root}' ("
        f"  k BIGINT NOT NULL,"
        f"  d DATE,"
        f"  y INT GENERATED ALWAYS AS (year(d)),"
        f"  rid BIGINT GENERATED ALWAYS AS IDENTITY "
        f"      (START WITH 100 INCREMENT BY 3),"
        f"  status STRING DEFAULT 'pending' COMMENT 'state'"
        f") PARTITIONED BY (k) "
        f"TBLPROPERTIES (team = 'x') COMMENT 'the source'",
    )
    src = SnapshotTable(spark, src_root)
    src.append(
        spark.createDataFrame([(1, "2021-03-04")], "k long, d string")
        .select("k", F.col("d").cast("date").alias("d"))
    )  # consumes rid 100
    dst_root = str(tmp_path / "dst")
    snapshot_sql(spark, f"CREATE TABLE '{dst_root}' LIKE '{src_root}'")
    dst = SnapshotTable(spark, dst_root)
    assert dst.read().count() == 0  # no data copied
    assert dict(dst.read().dtypes) == dict(src.read().dtypes)
    assert dst._table_generated() == {"y": "year(d)"}
    # the counter RESTARTS (no data came over)
    assert dst._table_identity() == {
        "rid": {"start": 100, "step": 3, "next": 100}
    }
    assert dst._table_defaults() == {"status": "'pending'"}
    assert "k_not_null" in dst._table_checks()
    assert dst._table_layout() == [
        {"transform": "identity", "key": "k", "param": None}
    ]
    props = dst._table_properties()
    assert props["team"] == "x" and props["comment"] == "the source"
    rows = {
        r["col_name"]: r["comment"]
        for r in dst.describe_table().collect()
    }
    assert rows["status"] == "state"
    # the new table enforces and assigns like the source's declaration
    dst.append(
        spark.createDataFrame([(7, "2022-01-01")], "k long, d string")
        .select("k", F.col("d").cast("date").alias("d"))
    )
    row = dst.read().first()
    assert row["rid"] == 100 and row["y"] == 2022
    assert row["status"] == "pending"
    # LIKE follows a RENAME: logical names come over, not physical
    # (the NOT NULL check references k, so it drops first — renames of
    # constraint-referenced columns are refused by design)
    snapshot_sql(spark, f"ALTER TABLE '{src_root}' DROP CONSTRAINT k_not_null")
    snapshot_sql(spark, f"ALTER TABLE '{src_root}' RENAME COLUMN k TO kk")
    dst2_root = str(tmp_path / "dst2")
    snapshot_sql(spark, f"CREATE TABLE '{dst2_root}' LIKE '{src_root}'")
    assert "kk" in SnapshotTable(spark, dst2_root).read().columns
    # error shapes
    with pytest.raises(ValueError, match="no committed snapshot"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{tmp_path / 'dst3'}' LIKE "
            f"'{tmp_path / 'nosuch'}'",
        )
    with pytest.raises(ValueError, match="trailing text"):
        snapshot_sql(
            spark,
            f"CREATE TABLE '{tmp_path / 'dst4'}' LIKE '{src_root}' "
            f"VERSION AS OF 1",
        )


def test_sql_optimize_where_scopes_selection(spark, tmp_path):
    """``OPTIMIZE ... WHERE <pred>`` (r15): the partial compaction's
    selection is SCOPED to files the predicate cannot prove out — a
    maintenance job targets one band of the table and every
    out-of-scope small file survives byte-identical; results are
    unchanged (the predicate is metadata-only, never a row filter)."""
    root = str(tmp_path / "t")
    t = SnapshotTable(spark, root, stats_columns=["k"])
    # three bands x three tiny files each: all 'small' by row count
    for lo in (0, 1000, 2000):
        for i in range(3):
            t.append(
                spark.range(lo + i * 10, lo + i * 10 + 10)
                .select(F.col("id").alias("k"),
                        (F.col("id") * 2).alias("v"))
                .coalesce(1)
            )
    before = set(t._manifest(t.current_version())["files"])
    assert len(before) == 9
    snapshot_sql(
        spark,
        f"OPTIMIZE '{root}' TARGET 1000 ROWS WHERE k >= 1000 AND "
        f"k < 2000",
    )
    after = set(t._manifest(t.current_version())["files"])
    # exactly the 1000-band's three files folded into one; the other
    # six survive by path
    assert len(before & after) == 6
    assert len(after) == 7
    assert t.read().count() == 90
    assert sorted(
        r["k"] for r in t.read(where=("k", 1000, 1025)).collect()
    ) == sorted(list(range(1000, 1020)) + [1020, 1021, 1022, 1023, 1024, 1025])
    # a scope that proves every file out folds nothing (no commit)
    v = t.current_version()
    snapshot_sql(
        spark, f"OPTIMIZE '{root}' TARGET 1000 ROWS WHERE k > 90000"
    )
    assert t.current_version() == v
    # WHERE composes with CLUSTER BY; refused with FULL / ZORDER
    snapshot_sql(
        spark,
        f"OPTIMIZE '{root}' TARGET 1000 ROWS WHERE k < 1000 "
        f"CLUSTER BY (k)",
    )
    assert t.read().count() == 90
    with pytest.raises(ValueError, match="whole-table"):
        snapshot_sql(
            spark,
            f"OPTIMIZE '{root}' TARGET 1000 ROWS FULL WHERE k < 10",
        )
    with pytest.raises(ValueError, match="whole-table"):
        snapshot_sql(
            spark,
            f"OPTIMIZE '{root}' TARGET 1000 ROWS WHERE k < 10 "
            f"ZORDER BY (k, v)",
        )


def test_sql_optimize_and_unset_strictness(spark, tmp_path):
    """Review findings (r15): OPTIMIZE with a WHERE keyword but an
    empty predicate must refuse (not silently run unscoped); UNSET
    TBLPROPERTIES without IF EXISTS refuses missing keys; LIKE carries
    the source's persisted pruning config."""
    root = str(tmp_path / "t")
    snapshot_sql(
        spark,
        f"CREATE TABLE '{root}' (k BIGINT, v BIGINT)",
        stats_columns=["k"],
    )
    with pytest.raises(ValueError, match="WHERE needs a predicate"):
        snapshot_sql(
            spark,
            f"OPTIMIZE '{root}' TARGET 1000 ROWS WHERE CLUSTER BY (k)",
        )
    t = SnapshotTable(spark, root)
    t.set_table_properties({"team": "x"})
    with pytest.raises(ValueError, match="no such propert"):
        snapshot_sql(
            spark, f"ALTER TABLE '{root}' UNSET TBLPROPERTIES (typo_key)"
        )
    # IF EXISTS ignores the missing key, and still removes present ones
    snapshot_sql(
        spark,
        f"ALTER TABLE '{root}' UNSET TBLPROPERTIES IF EXISTS "
        f"(typo_key, team)",
    )
    assert t._table_properties() == {}
    # LIKE carries the persisted stats config (the CLONE parity rule)
    dst = str(tmp_path / "d")
    snapshot_sql(spark, f"CREATE TABLE '{dst}' LIKE '{root}'")
    d = SnapshotTable(spark, dst)
    cfg = d._raw_manifest(d.current_version()).get("config") or {}
    assert cfg.get("stats_columns") == ["k"]
    # ...and its appends actually write band stats
    d.append(spark.range(0, 5).select(F.col("id").alias("k"),
                                      F.col("id").alias("v")))
    m = d._manifest(d.current_version())
    assert any("k" in s for s in m.get("stats", {}).values())
