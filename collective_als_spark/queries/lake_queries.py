"""Driver-visible lake-tier queries: the snapshot table's commit
protocol exercised END TO END under the DuckDB oracle.

The lifecycle query runs the real machinery (CAS commits, manifest
stats, copy-on-write merge/delete, time travel) against a scratch
table built from the driver's own ``orders`` parquet, measures the
row counts the protocol produces, and the ORACLE computes what those
counts MUST be directly from ``orders`` — so a correctness bug
anywhere in the commit core (lost commit, torn manifest, merge
dropping or duplicating rows, delete touching out-of-band rows,
time travel reading the wrong file set) flips the hash red.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collective_als_spark.registry import register
from collective_als_spark.sources.layout import _one_job
from collective_als_spark.sources.testdata import load_table


def _n(df: DataFrame) -> int:
    """One-job count for a measurement read (see layout._one_job:
    AQE turns each exchange of these small fixed-shape actions into
    its own job launch; the session partition count is kept because
    the read subtree can carry data-sized shuffles)."""
    return _one_job(df, "count", parts=None)


def _v1(df: DataFrame):
    """One-job first() for a fused measurement aggregate."""
    return _one_job(df, "first", parts=None)


@register(
    "lake_snapshot_lifecycle",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
               CAST(sum(CASE WHEN o_orderkey % 1000 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_upd
        FROM orders
    )
    SELECT 'v1_append_low' AS step, CAST(1 AS INTEGER) AS version, n_low AS n_rows FROM c
    UNION ALL SELECT 'v2_append_high', CAST(2 AS INTEGER), n_total FROM c
    UNION ALL SELECT 'v3_merge_mark', CAST(3 AS INTEGER), n_total FROM c
    UNION ALL SELECT 'v4_delete_marked', CAST(4 AS INTEGER), n_total - n_upd FROM c
    UNION ALL SELECT 'time_travel_v2', CAST(2 AS INTEGER), n_total FROM c
    """,
)
def lake_snapshot_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append -> append (schema'd commits with per-file stats) ->
    copy-on-write MERGE (mark rows by setting a sentinel price) ->
    copy-on-write DELETE of the marked band -> time travel back.

    Every count is measured THROUGH the snapshot reads (manifest file
    lists, not directory scans); the oracle derives the same numbers
    from the orders table algebraically. Protocol invariants this
    pins under the driver: appends accumulate exactly once (CAS, no
    lost/duplicated commit), merge replaces matched keys 1:1 (count
    invariant), delete removes exactly the in-band rows, and the v2
    manifest still reproduces the pre-merge table afterwards.

    The scratch table lives in a temp dir, built fresh per run (the
    work is a handful of commits over two orders columns); all counts
    are collected eagerly, so the dir is removed before returning."""
    from collective_als_spark.sources.layout import SnapshotTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="lake_lifecycle_")
    try:
        t = SnapshotTable(
            spark,
            f"{root}/tbl",
            stats_columns=["o_orderkey", "o_totalprice"],
            # the merge step goes through the bloom point-key pruning
            # path; pruning is a pure optimization, so the oracle's
            # algebraic counts pin that it stays one
            bloom_columns=["o_orderkey"],
        )
        t.append(orders.filter(F.col("o_totalprice") < 100000))
        n1 = _n(t.read())
        t.append(orders.filter(F.col("o_totalprice") >= 100000))
        n2 = _n(t.read())
        marks = orders.filter(F.col("o_orderkey") % 1000 == 0).withColumn(
            "o_totalprice", F.lit(-1.0)
        )
        t.merge(marks, "o_orderkey")
        n3 = _n(t.read())
        t.delete_where("o_totalprice", -10.0, -1.0)
        n4 = _n(t.read())
        n_tt = _n(t.read(version=2))
        rows = [
            ("v1_append_low", 1, n1),
            ("v2_append_high", 2, n2),
            ("v3_merge_mark", 3, n3),
            ("v4_delete_marked", 4, n4),
            ("time_travel_v2", 2, n_tt),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "step string, version int, n_rows bigint"
    )


@register(
    "lake_incremental_view",
    oracle="""
    WITH f AS (
        SELECT CASE WHEN o_orderkey % 500 = 0 THEN 'Z-SYNTH'
                    ELSE o_orderpriority END AS p,
               CASE WHEN o_orderkey % 500 = 0 THEN CAST(123456 AS BIGINT)
                    ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS c
        FROM orders
        WHERE o_orderkey % 500 = 0
           OR CAST(round(o_totalprice * 100) AS BIGINT) >= 5000000
    )
    SELECT p AS o_orderpriority,
           CAST(sum(c) AS BIGINT) AS sum_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM f GROUP BY p
    """,
)
def lake_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance over the full commit
    mix, hash-pinned by the oracle: two appends -> a MERGE-ON-READ
    (deletion-vector) delete -> a copy-on-write MERGE that re-keys a
    slice of rows, with the per-priority (sum, count) rollup refreshed
    from the CHANGE FEED after every commit — the fact table is never
    rescanned after the initial materialize.

    What a red hash would catch: a CDF that misses deletion-vector
    masking, a fold that double-applies or loses a delta, an upsert
    whose delete+insert pair doesn't retract the old group, a group
    that should vanish and doesn't, or a stale watermark replaying a
    refresh. The oracle computes the final rollup algebraically from
    ``orders`` (integer cents, so sums are order-independent):
    every orderkey divisible by 500 ends as one synthetic
    ('Z-SYNTH', 123456) row via the merge; every other order survives
    iff its cents are >= 5,000,000 (the MOR delete removes the rest).

    At 100 TB each refresh costs O(view + changed files): the change
    feed opens only files added/removed/DV-remapped between versions,
    and the fold is one view-sized aggregate (sources/matview.py)."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.matview import IncrementalAggView

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    fact_rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_orderpriority",
        cents.alias("c"),
    )
    root = tempfile.mkdtemp(prefix="lake_mv_")
    try:
        fact = SnapshotTable(spark, f"{root}/fact", stats_columns=["c", "k"])
        view = IncrementalAggView(
            spark,
            fact,
            f"{root}/mv",
            group_by=["o_orderpriority"],
            sums={"sum_cents": "c"},
        )
        fact.append(fact_rows.filter(F.col("k") % 2 == 0))
        view.refresh()  # initial materialize (the only full scan)
        fact.append(fact_rows.filter(F.col("k") % 2 == 1))
        view.refresh()  # fold: pure-insert delta
        fact.delete_where_mor("c", 0, 4_999_999)
        view.refresh()  # fold: deletion-vector retractions via CDF
        synth = fact_rows.filter(F.col("k") % 500 == 0).select(
            "k",
            F.lit("Z-SYNTH").alias("o_orderpriority"),
            F.lit(123456).cast("bigint").alias("c"),
        )
        fact.merge(synth, "k")
        view.refresh()  # fold: upsert delete+insert pairs
        out = [
            (r["o_orderpriority"], r["sum_cents"], r["n_rows"])
            for r in view.read().collect()
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        out, "o_orderpriority string, sum_cents bigint, n_rows bigint"
    )


@register(
    "lake_mor_upsert_nullstats",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN o_orderkey % 300 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
               CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_seven,
               CAST(sum(CASE WHEN o_orderkey % 2100 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
               CAST(sum(CASE WHEN o_orderkey % 300 = 0
                             THEN CAST(round(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents_upd_before,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_all
        FROM orders
    )
    SELECT 'n_total_after_upsert' AS step, n_total AS value FROM c
    UNION ALL SELECT 'n_band_null', n_seven - n_both FROM c
    UNION ALL SELECT 'n_band_notnull', n_total - (n_seven - n_both) FROM c
    UNION ALL SELECT 'tt_v1_band_null', n_seven FROM c
    UNION ALL SELECT 'cents_total', cents_all - cents_upd_before + 777 * n_upd FROM c
    """,
)
def lake_mor_upsert_nullstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 lake surface end-to-end under the oracle: a
    MERGE-ON-READ upsert (`merge_mor`: matched rows masked via
    deletion vectors, source appended — no candidate file rewritten)
    plus NULL-COUNT data skipping (`read(where_null=...)` prunes
    IS NULL / IS NOT NULL scans from the per-file null counts the
    manifests now record).

    The scratch table holds every order with a nullable `band`
    (NULL when o_orderkey % 7 = 0). The upsert replaces every
    orderkey divisible by 300 with a (band=5, cents=777) row. The
    oracle derives algebraically from ``orders`` what the protocol
    must then measure: total count invariant under upsert, the NULL
    band census after the upsert un-NULLs the %2100 overlap, the
    pre-upsert census via time travel (DV masking must NOT leak into
    v1), and the value-level cents total (catches a mask that drops
    the wrong positions or an append that duplicates).

    At 100 TB the point of this path: the upsert commit writes the
    batch + matched positions + metadata — candidate data files are
    untouched, so commit cost tracks the batch, not the table."""
    from collective_als_spark.sources.layout import SnapshotTable

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderkey") % 7
        ).cast("long").alias("band"),
        cents.alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="lake_mor_")
    try:
        t = SnapshotTable(
            spark,
            f"{root}/tbl",
            stats_columns=["k", "band"],
            bloom_columns=["k"],
        )
        t.append(rows)
        upserts = rows.filter(F.col("k") % 300 == 0).select(
            "k", F.lit(5).cast("long").alias("band"),
            F.lit(777).cast("bigint").alias("cents"),
        )
        t.merge_mor(upserts, "k")
        # count + cents fused into one action over the final snapshot;
        # the three where_null= reads stay separate on purpose — they
        # exercise the null-count data-skipping read path itself
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
        ))
        out = [
            ("n_total_after_upsert", a["n"]),
            ("n_band_null", _n(t.read(where_null=("band", True)))),
            ("n_band_notnull", _n(t.read(where_null=("band", False)))),
            ("tt_v1_band_null", _n(t.read(version=1, where_null=("band", True)))),
            ("cents_total", a["cents"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_cdf_stream",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c,
               o_totalprice AS p
        FROM orders
    ),
    ch AS (
        SELECT CASE WHEN p < 100000 THEN 1 ELSE 2 END AS version,
               'insert' AS change, c FROM o
        UNION ALL
        SELECT 3, 'delete', c FROM o WHERE k BETWEEN 1 AND 500
        UNION ALL
        SELECT 4, 'delete', c FROM o WHERE k % 1000 = 0
        UNION ALL
        SELECT 4, 'insert', CAST(-100 AS BIGINT) FROM o WHERE k % 1000 = 0
    )
    SELECT version, change,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(c) AS BIGINT) AS cents
    FROM ch GROUP BY version, change
    """,
)
def lake_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot table consumed as a STRUCTURED STREAM
    (`readStream.format("snapshot_cdf")`, streaming/cdf_source.py)
    with every change class exercised and the result hash-pinned:
    two appends (insert partitions), a merge-on-read DELETE (the
    stream reads the DV-position delta, opening only the affected
    file + its DV), and a copy-on-write MERGE on a
    change_data_feed=True table (the stream reads the writer's
    logical pre/post-image change files — NOT the rewrite churn).
    The drained feed is folded to per-(version, change_type)
    counts + cent sums, which the oracle derives algebraically from
    orders — a wrong offset, a replayed/lost commit, a DV delta
    misread, or carried-row churn in the COW commit all flip the
    hash.

    Scale shape: offsets are table versions (planning reads only
    manifest JSON); each micro-batch input partition is one changed
    file read as Arrow batches — the same per-file parallelism a
    native source gets, with maintenance commits (op=compact)
    skipped entirely."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.streaming.cdf_source import (
        register_snapshot_cdf,
    )

    register_snapshot_cdf(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="lake_cdf_")
    try:
        t = SnapshotTable(
            spark,
            f"{root}/tbl",
            stats_columns=["o_orderkey"],
            change_data_feed=True,
        )
        t.append(orders.filter(F.col("o_totalprice") < 100000))
        t.append(orders.filter(F.col("o_totalprice") >= 100000))
        t.delete_where_mor("o_orderkey", 1, 500)
        marks = orders.filter(F.col("o_orderkey") % 1000 == 0).withColumn(
            "o_totalprice", F.lit(-1.0)
        )
        t.merge(marks, "o_orderkey")
        stream = (
            spark.readStream.format("snapshot_cdf")
            .option("path", f"{root}/tbl")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = (
            spark.read.parquet(f"{root}/out")
            .groupBy(
                F.col("_commit_version").cast("int").alias("version"),
                F.col("_change_type").alias("change"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                ).alias("cents"),
            )
        )
        rows = [tuple(r) for r in got.collect()]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "version int, change string, n_rows bigint, cents bigint"
    )


@register(
    "lake_apply_changes",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN o_orderkey % 100 = 50 THEN 1 ELSE 0 END) AS BIGINT) AS n50,
               CAST(sum(CASE WHEN o_orderkey % 100 = 25 THEN 1 ELSE 0 END) AS BIGINT) AS n25,
               CAST(sum(CASE WHEN o_orderkey % 100 = 75 THEN 1 ELSE 0 END) AS BIGINT) AS n75,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_all,
               CAST(sum(CASE WHEN o_orderkey % 100 IN (0, 25, 50)
                             THEN CAST(round(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents_touched
        FROM orders
    )
    SELECT 'n_total_after' AS step, n_total - n0 + n75 AS value FROM c
    UNION ALL SELECT 'n_deleted_remaining', CAST(0 AS BIGINT) FROM c
    UNION ALL SELECT 'n_revived', n50 FROM c
    UNION ALL SELECT 'n_inserted', n75 FROM c
    UNION ALL SELECT 'cents_total',
        cents_all - cents_touched + 222 * n50 + 333 * n25 + 444 * n75 FROM c
    UNION ALL SELECT 'tt_v1_total', n_total FROM c
    """,
)
def lake_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES end-to-end under the oracle: one
    ``apply_changes`` commit carrying sequence-ordered upserts AND
    deletes (Delta's multi-clause MERGE / DLT APPLY CHANGES INTO),
    applied merge-on-read in a single atomic version.

    The batch exercises every CDC shape at once, derived from the
    orders key space (mod-100 classes, so the oracle knows each
    class's size algebraically):
    - %100==0: upsert@seq1 then delete@seq2 — the LATER delete wins,
      the key vanishes (out-of-order capture resolved by seq).
    - %100==50: delete@seq1 then upsert@seq2(cents=222) — the later
      upsert wins, the key survives updated.
    - %100==25: plain update to cents=333.
    - %100==75 shifted past max(k): fresh inserts (cents=444).
    - absent keys (shifted past 2*max): deletes that must no-op.

    Measured THROUGH the snapshot reads: final count, the deleted
    class is empty, revived/inserted class sizes, the value-level
    cents total (catches masking wrong positions or double-applying
    a seq-superseded row), and time travel to v1 (the apply must not
    leak into history). At 100 TB this is the streaming CDC-apply
    hot path: the commit writes the batch + matched DV positions,
    never rewriting candidate files."""
    from collective_als_spark.sources.layout import SnapshotTable

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), cents.alias("cents")
    )
    mx = _v1(rows.agg(F.max("k")))[0]
    k, c = F.col("k"), F.col("cents")

    def ch(df, cents_val, op, seq):
        cc = (
            F.lit(None).cast("bigint")
            if cents_val is None
            else F.lit(cents_val).cast("bigint")
        )
        return df.select(
            "k",
            cc.alias("cents"),
            F.lit(op).alias("_op"),
            F.lit(seq).cast("long").alias("seq"),
        )

    cls = lambda m: rows.filter(k % 100 == m)  # noqa: E731
    batch = (
        ch(cls(0), 111, "U", 1)
        .unionByName(ch(cls(0), None, "D", 2))
        .unionByName(ch(cls(50), None, "D", 1))
        .unionByName(ch(cls(50), 222, "U", 2))
        .unionByName(ch(cls(25), 333, "U", 1))
        .unionByName(ch(cls(75).select((k + mx).alias("k"), c), 444, "I", 1))
        .unionByName(
            ch(cls(10).select((k + 2 * mx).alias("k"), c), None, "D", 1)
        )
    )
    root = tempfile.mkdtemp(prefix="lake_cdc_")
    try:
        t = SnapshotTable(
            spark,
            f"{root}/tbl",
            stats_columns=["k"],
            bloom_columns=["k"],
        )
        t.append(rows)
        v = t.apply_changes(batch, "k", seq_col="seq")
        assert v == 2  # upserts + deletes land as ONE commit
        # one fused aggregate over the final snapshot instead of five
        # separate actions (each re-ran the DV-masked scan); a filtered
        # count IS a conditional sum — value-identical, oracle-pinned
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(((k % 100 == 0) & (k <= mx)).cast("long")).alias("nd"),
            F.sum(
                ((k % 100 == 50) & (c == 222)).cast("long")
            ).alias("nr"),
            F.sum((k > mx).cast("long")).alias("ni"),
            F.sum("cents").alias("cents"),
        ))
        out = [
            ("n_total_after", a["n"]),
            ("n_deleted_remaining", a["nd"]),
            ("n_revived", a["nr"]),
            ("n_inserted", a["ni"]),
            ("cents_total", a["cents"]),
            ("tt_v1_total", _n(t.read(version=1))),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_update_quality",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN o_orderkey % 50 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_band,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_all,
               CAST(sum(CASE WHEN o_orderkey % 50 = 0
                             THEN CAST(round(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents_band
        FROM orders
    )
    SELECT 'n_total' AS step, n_total AS value FROM c
    UNION ALL SELECT 'n_updated', n_band FROM c
    UNION ALL SELECT 'cents_total', cents_all - cents_band + 555 * n_band FROM c
    UNION ALL SELECT 'n_rejected_commits', CAST(2 AS BIGINT) FROM c
    UNION ALL SELECT 'n_quarantined', CAST(2 AS BIGINT) FROM c
    UNION ALL SELECT 'tt_v1_cents', cents_all FROM c
    """,
)
def lake_update_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 DML + governance surface end-to-end under the oracle:
    copy-on-write UPDATE (`update_where`: band-pruned candidate
    rewrite, SET as a SQL expression), a table CHECK constraint
    (`add_check_constraint`: enforced at the staging choke point on
    EVERY write path), and row-level expect-or-drop quarantine
    (`split_by_expectations`).

    The scratch table holds every order as (k, cents). A CHECK
    constraint `cents >= 0` is added (existing rows validated), then:
    an UPDATE sets cents=555 for every k divisible by 50 (the oracle
    derives the value-level cents total the rewrite must produce); a
    violating append AND a violating update are rejected (counted,
    table version unchanged — the constraint gate); a 4-row batch
    splits 2 good / 2 quarantined by the same rules as the
    constraint; time travel re-reads the pre-update cents total
    (the rewrite must not leak into v1). The good split rows are NOT
    appended, keeping the oracle's algebra closed over orders."""
    from collective_als_spark.operators.expectations import (
        split_by_expectations,
    )
    from collective_als_spark.sources.layout import SnapshotTable

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), cents.alias("cents")
    )
    root = tempfile.mkdtemp(prefix="lake_updq_")
    try:
        t = SnapshotTable(
            spark, f"{root}/tbl", stats_columns=["k", "cents"]
        )
        t.append(rows)
        t.add_check_constraint("cents_nonneg", "cents >= 0")
        mx = _v1(rows.agg(F.max("k")))[0]
        t.update_where("k", 0, mx, set={"cents": "CASE WHEN k % 50 = 0 THEN CAST(555 AS BIGINT) ELSE cents END"})
        rejected = 0
        try:
            t.append(spark.createDataFrame([(-1, -7)], "k long, cents long"))
        except ValueError:
            rejected += 1
        try:
            t.update_where("k", 50, 50, set={"cents": F.lit(-1).cast("bigint")})
        except ValueError:
            rejected += 1
        batch = spark.createDataFrame(
            [(10**9, 1), (10**9 + 1, -5), (10**9 + 2, 2), (None, 3)],
            "k long, cents long",
        )
        good, bad = split_by_expectations(
            batch,
            [
                {"kind": "not_null", "column": "k"},
                {"kind": "range", "column": "cents", "lo": 0, "hi": 10**12},
            ],
        )
        out = [
            ("n_total", _n(t.read())),
            (
                "n_updated",
                _n(
                    t.read()
                    .filter((F.col("k") % 50 == 0) & (F.col("cents") == 555))
                ),
            ),
            ("cents_total", _v1(t.read().agg(F.sum("cents")))[0]),
            ("n_rejected_commits", rejected),
            ("n_quarantined", _n(bad)),
            ("tt_v1_cents", _v1(t.read(version=1).agg(F.sum("cents")))[0]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_predicate_dml",
    oracle="""
    WITH m AS (
        SELECT
            o_totalprice,
            o_orderstatus = 'F'
              AND o_orderpriority IN ('1-URGENT', '2-HIGH') AS m1,
            -- written UNPARENthesized on purpose: DuckDB applies SQL
            -- precedence (AND before OR), so a precedence bug in the
            -- engine's own analyzer diverges from this oracle
            o_orderstatus = 'P' AND o_totalprice > 200000
              OR o_orderkey BETWEEN 1 AND 32 AS m2,
            o_orderstatus = 'O' AND o_totalprice > 100000 AS m3,
            -- the r11 negation shapes, verbatim: complement intervals
            -- and an exclusion, NOT applied over a parenthesized band
            o_totalprice NOT BETWEEN 1000 AND 400000
              AND o_orderstatus <> 'P' AS m4
        FROM orders
    ), c AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n_total,
            CAST(sum(CASE WHEN m1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
            CAST(sum(CASE WHEN m1 OR m2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d12,
            CAST(sum(CASE WHEN m3 AND NOT (m1 OR m2)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
            CAST(sum(CASE WHEN NOT (m1 OR m2)
                          THEN CAST(round(o_totalprice * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS cents_surv,
            CAST(sum(CASE WHEN NOT (m1 OR m2) AND NOT m4
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_fin,
            CAST(sum(CASE WHEN NOT (m1 OR m2) AND NOT m4
                          THEN CAST(round(o_totalprice * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS cents_fin
        FROM m
    )
    SELECT 'n_after_delete' AS step, n_total - n_d1 AS value FROM c
    UNION ALL SELECT 'n_after_mixed_delete', n_total - n_d12 FROM c
    UNION ALL SELECT 'n_flagged', n_updated FROM c
    UNION ALL SELECT 'cents_survivors', cents_surv FROM c
    UNION ALL SELECT 'n_matched_left', CAST(0 AS BIGINT) FROM c
    UNION ALL SELECT 'tt_v1_total', n_total FROM c
    UNION ALL SELECT 'n_after_not_delete', n_fin FROM c
    UNION ALL SELECT 'cents_final', cents_fin FROM c
    """,
)
def lake_predicate_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-predicate DML end-to-end under the oracle (r09): a
    compound ``DELETE WHERE status='F' AND priority IN (...)`` — the
    exact first-wall predicate the r08 verdict named — then a second
    DELETE with an UNPARENTHESIZED mixed-precedence predicate
    (``status='P' AND price>200000 OR key BETWEEN 1 AND 32`` — the
    r09/r10 AND-before-OR soundness class, both written verbatim in
    the DuckDB oracle so a precedence divergence hash-fails), then a
    compound predicate UPDATE, then an r11 NEGATION delete
    (``price NOT BETWEEN .. AND status <> 'P'`` — complement-interval
    pruning under the same hash), against a scratch snapshot table
    built from ``orders``. The oracle recomputes the surviving row counts,
    the updated-row count, and the value-level cents total of the
    SURVIVORS (catching a survivor predicate that isn't the exact
    complement of the matched predicate — the NULL-discipline bug
    class), plus time travel to the pre-DML version.

    Scale shape: conjunct extraction turns the equality/IN conjuncts
    into interval + bucket pruning proofs, so the rewrite opens only
    candidate files; the residual predicate is exact regardless.

    Reference parity: Delta's ``DELETE FROM t WHERE <expr>`` /
    ``UPDATE t SET ... WHERE <expr>``."""
    from collective_als_spark.sources.layout import SnapshotTable

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_totalprice").alias("price"),
    )
    pred = (
        "o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')"
    )
    # unparenthesized on purpose: must bind as (status AND price) OR band
    pred_mixed = (
        "o_orderstatus = 'P' AND price > 200000"
        " OR o_orderkey BETWEEN 1 AND 32"
    )
    root = tempfile.mkdtemp(prefix="lake_preddml_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["o_orderkey"])
        t.append(rows)
        t.delete_where(pred)
        n_after_delete = _n(t.read())
        t.delete_where(pred_mixed)
        t.update_where(
            "o_orderstatus = 'O' AND price > 100000",
            set={"o_orderpriority": "'FLAGGED'"},
        )
        # fused aggregate over the post-UPDATE snapshot (count, flagged
        # count and cents were three separate actions re-running the
        # same scan; a filtered count IS a conditional sum). The two
        # where= reads stay separate on purpose: they exercise the
        # data-skipping read path itself.
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("o_orderpriority") == "FLAGGED").cast("long")
            ).alias("nf"),
            F.sum("cents").alias("cents"),
        ))
        out = [
            ("n_after_delete", n_after_delete),
            ("n_after_mixed_delete", a["n"]),
            ("n_flagged", a["nf"]),
            ("cents_survivors", a["cents"]),
            (
                "n_matched_left",
                _n(t.read(where=pred)) + _n(t.read(where=pred_mixed)),
            ),
            ("tt_v1_total", _n(t.read(version=1))),
        ]
        # r11 negation shapes under the driver hash: NOT BETWEEN +
        # an exclusion, complement-interval pruned, exact residual
        t.delete_where(
            "price NOT BETWEEN 1000 AND 400000 AND o_orderstatus <> 'P'"
        )
        b = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
        ))
        out.append(("n_after_not_delete", b["n"]))
        out.append(("cents_final", b["cents"]))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_tracked_apply",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN o_orderkey % 10 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5
        FROM orders
    )
    SELECT 'n_after' AS step, n_total - n5 AS value FROM c
    UNION ALL SELECT 'n_winner_value', n0 FROM c
    UNION ALL SELECT 'n_stale_applied', CAST(0 AS BIGINT) FROM c
    UNION ALL SELECT 'n_resurrected', CAST(0 AS BIGINT) FROM c
    """,
)
def lake_tracked_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch sequence tracking end-to-end under the oracle
    (r09): three CDC batches delivered OUT OF ORDER through
    ``apply_changes(track_seq=True)`` — the high-seq update and delete
    land first, then the whole low-seq batch arrives late and must be
    ignored row-for-row (no value regression, no resurrected key).
    The oracle computes the converged state algebraically from the
    orders key classes.

    Scale shape: the stale gate is one band/bloom-pruned semi-scan
    per batch against the batch keys; tombstone state is a
    retention-bounded side file swapped atomically with the commit.

    Reference parity: DLT APPLY CHANGES INTO sequence semantics."""
    from collective_als_spark.sources.layout import SnapshotTable

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    k = F.col("k")

    def ch(df, cents_val, op, seq):
        cc = (
            F.lit(None).cast("bigint")
            if cents_val is None
            else F.lit(cents_val).cast("bigint")
        )
        return df.select(
            "k", cc.alias("cents"),
            F.lit(op).alias("_op"), F.lit(seq).cast("long").alias("seq"),
        )

    root = tempfile.mkdtemp(prefix="lake_seq_")
    try:
        t = SnapshotTable(
            spark, f"{root}/tbl", stats_columns=["k"], bloom_columns=["k"]
        )
        t.append(rows)
        # batch at seq 10: update class %10==0 to 999, delete class %10==5
        hi = ch(rows.filter(k % 10 == 0), 999, "U", 10).unionByName(
            ch(rows.filter(k % 10 == 5), None, "D", 10)
        )
        t.apply_changes(hi, "k", seq_col="seq", track_seq=True)
        # the LATE batch at seq 5: stale update of class 0 (to 111) and
        # stale resurrection of class 5 (to 222) — all must gate out
        late = ch(rows.filter(k % 10 == 0), 111, "U", 5).unionByName(
            ch(rows.filter(k % 10 == 5), 222, "U", 5)
        )
        t.apply_changes(late, "k", seq_col="seq", track_seq=True)
        # one fused aggregate instead of four actions over the same
        # DV-masked snapshot; filtered counts become conditional sums —
        # value-identical, oracle-pinned
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("cents") == 999).cast("long")).alias("nw"),
            F.sum((F.col("cents") == 111).cast("long")).alias("ns"),
            F.sum(
                ((k % 10 == 5) | (F.col("cents") == 222)).cast("long")
            ).alias("nr"),
        ))
        out = [
            ("n_after", a["n"]),
            ("n_winner_value", a["nw"]),
            ("n_stale_applied", a["ns"]),
            ("n_resurrected", a["nr"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_column_mapping",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN o_orderkey BETWEEN 1 AND 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_band,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_all
        FROM orders
    )
    SELECT 'n_total' AS step, n_total AS value FROM c
    UNION ALL SELECT 'n_band_newname', n_band FROM c
    UNION ALL SELECT 'cents_after_drop_readd',
        CAST(0 AS BIGINT) + 777 FROM c
    UNION ALL SELECT 'tt_v1_is_oldnames', CAST(1 AS BIGINT) FROM c
    UNION ALL SELECT 'cents_total_newname', cents_all FROM c
    """,
)
def lake_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column RENAME/DROP end-to-end under the oracle
    (r09, Delta column mapping): rename ``cents`` -> ``pennies`` (one
    manifest commit, zero files rewritten), read + band-prune through
    the new name, drop an auxiliary column and re-add the SAME logical
    name under a fresh physical slot after the old files were proven
    blocked, and time-travel to the pre-rename version under the OLD
    names. The oracle recomputes counts/sums from ``orders``.

    Reference parity: Delta ALTER TABLE RENAME/DROP COLUMN with
    columnMapping.mode=name."""
    from collective_als_spark.sources.layout import SnapshotTable

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.lit(1).cast("bigint").alias("aux"),
    )
    root = tempfile.mkdtemp(prefix="lake_colmap_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["k"])
        t.append(rows)
        v1 = t.current_version()
        t.rename_column("cents", "pennies")
        # the dropped name's physical slot is blocked; the LOGICAL
        # name becomes reusable once it maps to a fresh physical
        t.drop_column("aux")
        try:
            t.append(
                spark.createDataFrame([(0, 0, 1)], "k long, pennies long, aux long")
            )
            readd_blocked = 0
        except ValueError:
            readd_blocked = 1
        assert readd_blocked == 1
        t.append(
            spark.createDataFrame(
                [(10_000_000, 777, 777)], "k long, pennies long, aux2 long"
            )
        )
        got = t.read()
        out = [
            ("n_total", _n(got) - 1),  # minus the probe row
            ("n_band_newname", _n(t.read(where=("k", 1, 64)))),
            (
                "cents_after_drop_readd",
                _v1(got.agg(F.sum("aux2")))[0],
            ),
            (
                "tt_v1_is_oldnames",
                1 if t.read(version=v1).columns == ["k", "cents", "aux"] else 0,
            ),
            (
                "cents_total_newname",
                _v1(
                    got.filter(F.col("k") < 10_000_000)
                    .agg(F.sum("pennies"))
                )[0],
            ),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "snapshot_batch_read",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    WHERE o_orderkey BETWEEN 100 AND 199
    ORDER BY k
    """,
)
def snapshot_batch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch `snapshot` DataSource end-to-end under the oracle
    (r09): write orders into a clustered snapshot table, read it back
    through ``spark.read.format("snapshot")`` with a band filter —
    Catalyst pushes the filter, ``pushFilters`` prunes the planned
    file list against the manifest stats, and Spark re-applies the
    exact predicate. Result must equal the straight SQL over orders.

    NOTE the scratch table is deleted before return, so the RETURNED
    frame is materialized first — the driver's collect must not
    re-plan against removed files."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_source import (
        register_snapshot_source,
    )

    register_snapshot_source(spark)
    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="snap_batch_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["k"])
        t.append_clustered(rows, ["k"], n_files=8)
        got = (
            spark.read.format("snapshot")
            .option("path", t.root)
            .load()
            .filter("k BETWEEN 100 AND 199")
            .orderBy("k")
        )
        local = got.collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(local, got.schema)


@register(
    "lake_sql_dml",
    oracle="""
    WITH m AS (
        SELECT
            o_orderkey,
            o_totalprice,
            -- verbatim unparenthesized mix: DuckDB applies SQL
            -- precedence; the dispatcher must delegate to the same
            o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
              OR o_orderkey BETWEEN 1 AND 64 AS m1,
            o_orderstatus = 'O' AND o_totalprice > 150000 AS m2,
            o_orderkey % 97 = 0 AS mk,
            o_orderkey % 31 = 0 AS c31,
            o_orderkey % 2 = 1 AS odd
        FROM orders
    ), c AS (
        SELECT
            CAST(sum(CASE WHEN NOT m1 AND NOT mk THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_keep,
            CAST(sum(CASE WHEN NOT m1 AND NOT mk AND m2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_flag,
            CAST(sum(CASE WHEN NOT m1 AND NOT mk
                          THEN CAST(round(o_totalprice * 100) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS cents_keep,
            CAST(sum(CASE WHEN mk THEN 1 ELSE 0 END) AS BIGINT) AS n_merged,
            -- conditional-MERGE effects (first-match-wins): M rows
            -- with key%31==0 DELETE (clause 1 beats the always-true
            -- update clause 2); kept rows with key%31==0 gain 777
            -- cents; absent odd keys with key%31==0 insert at 777
            CAST(sum(CASE WHEN mk AND c31 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_mk_c31,
            CAST(sum(CASE WHEN NOT m1 AND NOT mk AND c31 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_cond_upd,
            CAST(sum(CASE WHEN m1 AND NOT mk AND c31 AND odd
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_cond_ins
        FROM m
    )
    SELECT 'n_final' AS step,
           n_keep + n_merged - n_mk_c31 + n_cond_ins AS value FROM c
    UNION ALL SELECT 'n_flagged', n_flag FROM c
    UNION ALL SELECT 'cents_final',
        cents_keep + 123 * (n_merged - n_mk_c31)
        + 777 * n_cond_upd + 777 * n_cond_ins FROM c
    UNION ALL SELECT 'n_merged', n_merged - n_mk_c31 FROM c
    UNION ALL SELECT 'n_cond_ins', n_cond_ins FROM c
    """,
)
def lake_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL DML dispatcher end-to-end under the oracle (r10 verdict
    #6): ``DELETE`` with an UNPARENTHESIZED mixed-precedence
    predicate, ``UPDATE .. SET .. WHERE``, a ``MERGE INTO .. USING
    <view> ON t.k = s.k`` upsert, and (r12, r11-verdict #4) a
    CONDITIONAL multi-clause MERGE — ``WHEN MATCHED AND <cond> THEN
    DELETE`` beating an always-true ``UPDATE SET col = t.col +
    s.col`` (first-match-wins order pinned by the hash) plus a
    conditional ``INSERT *`` — each statement delegating to the
    engine verbs, the DuckDB oracle recomputing the converged state
    algebraically from ``orders`` with the SAME predicate text (so a
    precedence, clause-split, or clause-order divergence hash-fails).

    Scale shape: identical to the underlying verbs — the dispatcher
    adds only driver-side string parsing on a bounded statement; the
    conditional MERGE evaluates its clauses in ONE pruned candidate
    join (``merge_when``).

    Reference parity: Delta's SQL DML over path tables
    (``DELETE FROM delta.`/p` WHERE ..``, ``MERGE INTO delta.`/p``)
    incl. the conditional clause matrix."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_totalprice").alias("price"),
    )
    src = rows.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit("M").alias("o_orderstatus"),
        F.lit("X").alias("o_orderpriority"),
        F.lit(123).cast("bigint").alias("cents"),
        F.lit(0.0).alias("price"),
    )
    src.createOrReplaceTempView("lake_sql_dml_src")
    root = tempfile.mkdtemp(prefix="lake_sqldml_")
    try:
        # r15: the table declares its layout at CREATE — every write
        # below range-clusters on o_orderkey automatically (and the
        # CREATE persists the column into the stats config), so the
        # DML statements prune by band stats without any per-append
        # placement call
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}/tbl' (o_orderkey BIGINT, "
            f"o_orderstatus STRING, o_orderpriority STRING, "
            f"cents BIGINT, price DOUBLE) PARTITIONED BY (o_orderkey)",
        )
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["o_orderkey"])
        t.append(rows)
        snapshot_sql(
            spark,
            f"DELETE FROM '{t.root}' WHERE o_orderstatus = 'F' AND "
            f"o_orderpriority = '1-URGENT' OR o_orderkey BETWEEN 1 AND 64",
        )
        snapshot_sql(
            spark,
            f"UPDATE '{t.root}' SET o_orderpriority = 'SQL-FLAG' "
            f"WHERE o_orderstatus = 'O' AND price > 150000",
        )
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' AS t USING lake_sql_dml_src AS s "
            f"ON t.o_orderkey = s.o_orderkey "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *",
        )
        # conditional multi-clause MERGE: clause ORDER is load-bearing
        # (M rows satisfy BOTH conds; DELETE is first and must win)
        src2 = rows.filter(F.col("o_orderkey") % 31 == 0).select(
            "o_orderkey",
            F.lit("C").alias("o_orderstatus"),
            F.lit("COND-INS").alias("o_orderpriority"),
            F.lit(777).cast("bigint").alias("cents"),
            F.lit(0.0).alias("price"),
        )
        src2.createOrReplaceTempView("lake_sql_dml_src2")
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' AS t USING lake_sql_dml_src2 AS s "
            f"ON t.o_orderkey = s.o_orderkey "
            f"WHEN MATCHED AND t.o_orderstatus = 'M' THEN DELETE "
            f"WHEN MATCHED AND s.cents = 777 THEN UPDATE SET "
            f"cents = t.cents + s.cents "
            f"WHEN NOT MATCHED AND s.o_orderkey % 2 = 1 THEN INSERT *",
        )
        # one fused aggregate instead of five actions over the same
        # snapshot; filtered counts become conditional sums —
        # value-identical, oracle-pinned
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("o_orderpriority") == "SQL-FLAG").cast("long")
            ).alias("nf"),
            F.sum("cents").alias("cents"),
            F.sum((F.col("o_orderstatus") == "M").cast("long")).alias("nm"),
            F.sum(
                (F.col("o_orderpriority") == "COND-INS").cast("long")
            ).alias("nci"),
        ))
        out = [
            ("n_final", a["n"]),
            ("n_flagged", a["nf"]),
            ("cents_final", a["cents"]),
            ("n_merged", a["nm"]),
            ("n_cond_ins", a["nci"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_scd2_history",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS key,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 10 = 0 AS upd,
               o_orderkey % 10 = 5 AS del
        FROM orders
    ), c AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN upd THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
               CAST(sum(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
               CAST(sum(CASE WHEN upd THEN 999
                             WHEN del THEN 0 ELSE cents END) AS BIGINT)
                 AS open_cents
        FROM k
    )
    SELECT 'n_history_rows' AS step, n_keys + n_upd AS value FROM c
    UNION ALL SELECT 'n_open', n_keys - n_del FROM c
    UNION ALL SELECT 'n_closed', n_upd + n_del FROM c
    UNION ALL SELECT 'open_cents', open_cents FROM c
    UNION ALL SELECT 'n_stale_applied', CAST(0 AS BIGINT) FROM c
    """,
)
def lake_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE 2 apply end-to-end under the oracle (r10 verdict #7):
    seed every orders key as an open interval at seq 1, apply a CDC
    batch at seq 10 (update keys %10==0 to cents 999, delete keys
    %10==5), then a STALE batch at seq 5 (regression + resurrection
    attempts) that the history-derived floor must gate out entirely.
    The oracle computes the converged history shape algebraically:
    one extra interval per updated key, one closed-without-reopen per
    deleted key, the open rows' cents total, and zero stale effects.

    Scale shape: each apply is one band/bloom-pruned history scan for
    the batch keys + a (batch + closed rows)-sized MOR merge on
    (key, __START_AT) — batch-proportional (SCALE_RAMP
    apply_changes_scd2_sec: 1.33x at a 10x table).

    Reference parity: DLT APPLY CHANGES INTO .. STORED AS SCD TYPE 2
    (__START_AT/__END_AT are its column names)."""
    from collective_als_spark.sources.layout import SnapshotTable

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    k = F.col("key")

    def ch(df, cents_val, op, seq):
        cc = (
            F.col("cents")
            if cents_val == "keep"
            else F.lit(cents_val).cast("bigint")
        )
        return df.select(
            "key", cc.alias("cents"),
            F.lit(op).alias("_op"), F.lit(seq).cast("long").alias("seq"),
        )

    root = tempfile.mkdtemp(prefix="lake_scd2_")
    try:
        t = SnapshotTable(
            spark, f"{root}/tbl", stats_columns=["key"], bloom_columns=["key"]
        )
        t.apply_changes(
            ch(rows, "keep", "U", 1), "key",
            seq_col="seq", scd_type=2, track_seq=True,
        )
        live = ch(rows.filter(k % 10 == 0), 999, "U", 10).unionByName(
            ch(rows.filter(k % 10 == 5), None, "D", 10)
        )
        t.apply_changes(
            live, "key", seq_col="seq", scd_type=2, track_seq=True
        )
        stale = ch(rows.filter(k % 10 == 0), 111, "U", 5).unionByName(
            ch(rows.filter(k % 10 == 5), 222, "U", 5)
        )
        t.apply_changes(
            stale, "key", seq_col="seq", scd_type=2, track_seq=True
        )
        got = t.read()
        is_open = F.col("__END_AT").isNull()
        # one fused aggregate instead of five separate actions over the
        # same snapshot (guide §1.2: each count re-ran the full history
        # scan; a filtered count IS a conditional sum, so the fusion is
        # value-identical and the oracle hash pins it)
        a = _v1(got.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_open.cast("long")).alias("n_open"),
            F.sum((~is_open).cast("long")).alias("n_closed"),
            F.sum(F.when(is_open, F.col("cents"))).alias("open_cents"),
            F.sum(
                F.col("cents").isin(111, 222).cast("long")
            ).alias("n_stale"),
        ))
        out = [
            ("n_history_rows", a["n"]),
            ("n_open", a["n_open"]),
            ("n_closed", a["n_closed"]),
            ("open_cents", a["open_cents"]),
            ("n_stale_applied", a["n_stale"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_type_widening",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
    )
    SELECT 'n_total' AS step, 2 * n AS value FROM c
    UNION ALL SELECT 'sum_all', cents + cents + 5000000000 * n FROM c
    UNION ALL SELECT 'n_wide_band', n FROM c
    UNION ALL SELECT 'tt_v1_rows', n FROM c
    UNION ALL SELECT 'dec_cents_x100', 2 * cents + 25 * n FROM c
    UNION ALL SELECT 'dec_n_band',
        CAST(sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                           >= 10000000 THEN 1 ELSE 0 END)
             + sum(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                             + 25 >= 10000000 THEN 1 ELSE 0 END)
             AS BIGINT)
        FROM orders
    """,
)
def lake_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless type widening end-to-end under the oracle (r10
    verdict #8): append orders cents as INT, then append the same
    rows shifted past the int32 range as LONG — the commit widens the
    manifest type metadata-only, old int32 files promote on scan, the
    band read proves stats pruning still bites across mixed-width
    files, and time travel shows v1 under its own narrow type. r12
    adds the DECIMAL rung (r11 verdict missing #3): a second table
    seeds cents as decimal(12,2) dollars, widens to decimal(16,4) by
    appending quarter-cent values, and the band read + exact sum
    (scaled x100 to integer cents for the hash) pin mixed-width
    decimal promotion and pruning.

    Reference parity: Delta's enableTypeWidening (3.x int ladder +
    4.x decimal precision/scale growth)."""
    from collective_als_spark.sources.layout import SnapshotTable

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    root = tempfile.mkdtemp(prefix="lake_widen_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["v"])
        t.append(base.select("k", F.col("v").cast("int").alias("v")))
        t.append(
            base.select("k", (F.col("v") + 5_000_000_000).alias("v"))
        )
        got = t.read()
        assert dict(got.dtypes)["v"] == "bigint"
        wide = t.read(where="v >= 5000000000")
        # decimal rung: dollars at (12,2), widened by quarter-cent
        # values at (16,4); sums are exact in decimal, hashed x100
        d = SnapshotTable(spark, f"{root}/dec", stats_columns=["d"])
        d.append(
            base.select(
                "k", (F.col("v") / 100).cast("decimal(12,2)").alias("d")
            )
        )
        d.append(
            base.select(
                "k",
                ((F.col("v") + 25) / 100).cast("decimal(16,4)").alias("d"),
            )
        )
        dgot = d.read()
        assert dict(dgot.dtypes)["d"] == "decimal(16,4)"
        dec_sum = _v1(dgot.agg(F.sum("d")))[0]
        dec_band = _n(d.read(where="d >= 100000"))
        out = [
            ("n_total", _n(got)),
            ("sum_all", _v1(got.agg(F.sum("v")))[0]),
            ("n_wide_band", _n(wide)),
            ("tt_v1_rows", _n(t.read(version=1))),
            ("dec_cents_x100", int(dec_sum * 100)),
            ("dec_n_band", dec_band),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_table_changes",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN cents < 10000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_del
        FROM k
    )
    SELECT 'v1_inserts' AS step, n AS value FROM c
    UNION ALL SELECT 'v2_deletes', n_del FROM c
    UNION ALL SELECT 'v3_inserts', CAST(3 AS BIGINT) FROM c
    UNION ALL SELECT 'window_2_2', n_del FROM c
    UNION ALL SELECT 'ts_nonnull', n + n_del + 3 FROM c
    UNION ALL SELECT 'ts_window', n_del + 3 FROM c
    """,
)
def lake_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta's ``table_changes()`` CDF table-valued function under the
    oracle (r13): three commits on a scratch table (bulk insert, a
    banded DELETE, a small append), then the per-commit change feed is
    consumed ENTIRELY through the SQL surface — inclusive version
    windows, per-commit attribution, non-null commit timestamps —
    and DuckDB recomputes every count algebraically from ``orders``.

    Scale shape: each window step opens only the files that commit
    added/removed (delta-proportional file diffs, lazy union) — never
    a table scan.

    Reference parity: Delta Lake ``table_changes`` /
    ``readChangeFeed``."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="lake_tc_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["cents"])
        t.append(rows)                                            # v1
        snapshot_sql(
            spark, f"DELETE FROM '{t.root}' WHERE cents < 10000000"
        )                                                         # v2
        t.append(
            spark.createDataFrame(
                [(-1, 1), (-2, 2), (-3, 3)], "k long, cents bigint"
            )
        )                                                         # v3
        per_commit = {
            (r["_commit_version"], r["_change_type"]): r["n"]
            for r in snapshot_sql(
                spark,
                f"SELECT _commit_version, _change_type, count(*) AS n "
                f"FROM table_changes('{t.root}', 1) "
                f"GROUP BY _commit_version, _change_type",
            ).collect()
        }
        window = _v1(snapshot_sql(
            spark,
            f"SELECT count(*) AS n FROM table_changes('{t.root}', 2, 2)",
        ))["n"]
        ts_nonnull = _v1(snapshot_sql(
            spark,
            f"SELECT count(_commit_timestamp) AS n FROM "
            f"table_changes('{t.root}', 1)",
        ))["n"]
        # timestamp bounds (r14): a quoted literal at v2's commit
        # instant starts the feed at v2 — earliest commit at-or-after,
        # Delta's CDF start-timestamp rule
        ts2 = float(t._raw_manifest(2)["committed_at"])
        ts_window = _v1(snapshot_sql(
            spark,
            f"SELECT count(*) AS n FROM "
            f"table_changes('{t.root}', '{ts2}')",
        ))["n"]
        out = [
            ("v1_inserts", per_commit.get((1, "insert"), 0)),
            ("v2_deletes", per_commit.get((2, "delete"), 0)),
            ("v3_inserts", per_commit.get((3, "insert"), 0)),
            ("window_2_2", window),
            ("ts_nonnull", ts_nonnull),
            ("ts_window", ts_window),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_identity_columns",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_orderkey % 3 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM orders
    )
    SELECT 'n_total' AS step, n + n2 AS value FROM c
    UNION ALL SELECT 'rid_min', CAST(10 AS BIGINT) FROM c
    UNION ALL SELECT 'rid_max', 10 + 2 * (n + n2 - 1) FROM c
    -- sum of 10 + 2j for j in 0..tot-1 = tot*(tot+9); kept
    -- division-free so DuckDB's `/`->DOUBLE does not coerce the whole
    -- UNION ALL value column to DOUBLE against Spark's BIGINT (the
    -- r15 driver hash_match failure: 20000.0 vs 20000 on every row)
    UNION ALL SELECT 'rid_sum', (n + n2) * (n + n2 + 9) FROM c
    UNION ALL SELECT 'rid_distinct', n + n2 FROM c
    """,
)
def lake_identity_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS IDENTITY under the oracle (r13; declared
    at CREATE since r14 — verdict #2's column-list DDL): declare
    ``rid (START WITH 10 INCREMENT BY 2)`` before the first write,
    append ``orders`` (the table assigns one contiguous claimed range
    — any row order), then a second filtered append CONTINUES from
    the high-water mark. The row→id mapping is partitioning-dependent
    but the assigned SET is deterministic: min/max/sum/distinct-count
    are exact closed forms DuckDB recomputes from ``orders``.

    Scale shape: assignment is batch-proportional — one
    localCheckpoint of the batch (about to be written anyway), a
    per-partition count agg, a broadcast offset join and a
    PER-PARTITION row_number; no global window, no driver collect
    beyond nPartitions rows.

    Reference parity: Delta Lake identity columns (incl. the
    documented MERGE restriction, shipped here as guided refusals)."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="lake_ident_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["rid"])
        snapshot_sql(
            spark,
            f"CREATE TABLE '{t.root}' (k BIGINT, cents BIGINT, "
            f"rid BIGINT GENERATED ALWAYS AS IDENTITY "
            f"(START WITH 10 INCREMENT BY 2))",
        )
        t2 = SnapshotTable(spark, t.root, stats_columns=["rid"])
        t2.append(rows)
        t2.append(rows.filter(F.col("k") % 3 == 0))
        got = t2.read()
        agg = _v1(got.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("rid").alias("mn"),
            F.max("rid").alias("mx"),
            F.sum("rid").alias("sm"),
            F.countDistinct("rid").alias("nd"),
        ))
        out = [
            ("n_total", agg["n"]),
            ("rid_min", agg["mn"]),
            ("rid_max", agg["mx"]),
            ("rid_sum", agg["sm"]),
            ("rid_distinct", agg["nd"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_generated_columns",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS d
        FROM orders
    )
    SELECT 'n_total' AS step, CAST(count(*) AS BIGINT) AS value FROM k
    UNION ALL SELECT 'y_sum',
        CAST(sum(EXTRACT(year FROM d)) AS BIGINT) FROM k
    UNION ALL SELECT 'n_1995',
        CAST(sum(CASE WHEN d >= DATE '1995-01-01'
                       AND d <  DATE '1996-01-01'
                      THEN 1 ELSE 0 END) AS BIGINT) FROM k
    """,
)
def lake_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS columns under the oracle (r12 verdict #5;
    declared at CREATE since r14 — verdict #2's column-list DDL):
    ``CREATE TABLE (.., y INT GENERATED ALWAYS AS (year(d)))`` before
    the first write, append a batch that OMITS it (write-time
    computation), and band-read on the RAW date — the monotone
    transform implies a pruning band on ``y``, whose stats are the
    only ones the table carries. DuckDB recomputes every number from
    ``orders``.

    Scale shape: the computed column is one projection at write; the
    implied conjunct costs two 1-row driver jobs per predicate —
    pruning economics identical to hidden-partition transforms.

    Reference parity: Delta Lake generated columns + partition-
    pruning-from-generated-expressions."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    root = tempfile.mkdtemp(prefix="lake_gen_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["y"])
        snapshot_sql(
            spark,
            f"CREATE TABLE '{t.root}' (k BIGINT, d DATE, "
            f"y INT GENERATED ALWAYS AS (year(d)))",
        )
        t2 = SnapshotTable(spark, t.root, stats_columns=["y"])
        t2.append_clustered(rows, cluster_by=["d"], n_files=8)
        # count + y_sum fused into one action; the band read stays a
        # separate action on purpose — it exercises the generated-
        # column implied-band pruning read path itself
        band = t2.read(where="d >= '1995-01-01' AND d < '1996-01-01'")
        a = _v1(t2.read().agg(
            F.count(F.lit(1)).alias("n"), F.sum("y").alias("ys")
        ))
        out = [
            ("n_total", a["n"]),
            ("y_sum", a["ys"]),
            ("n_1995", _n(band)),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_column_defaults",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k FROM orders
    ), c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN k % 4 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n4
        FROM k
    )
    SELECT 'n_total' AS step, n + n4 + 3 + 2 AS value FROM c
    UNION ALL SELECT 'n_seed', n FROM c
    UNION ALL SELECT 'n_web', n4 + 2 FROM c
    UNION ALL SELECT 'n_null', CAST(3 AS BIGINT) FROM c
    """,
)
def lake_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column DEFAULT values under the oracle (r13 verdict missing
    #2): ``ALTER COLUMN src SET DEFAULT 'web'`` through the SQL
    surface, then (a) an append OMITTING the column fills 'web', (b) a
    batch carrying explicit NULLs keeps them (explicit always wins —
    the difference from GENERATED), and (c) a MERGE INSERT column list
    omitting the column fills too (the contract is pruning-invariant
    across the append and candidate-rewrite routes). DuckDB recomputes
    every count from ``orders``.

    Scale shape: the fill is ONE projection on the staged batch —
    no scan of existing data, which is never backfilled.

    Reference parity: Delta Lake default column values
    (``delta.feature.allowColumnDefaults``)."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.lit("seed").alias("src"),
    )
    root = tempfile.mkdtemp(prefix="lake_dflt_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["k"])
        t.append(rows)                                            # v1
        snapshot_sql(
            spark,
            f"ALTER TABLE '{t.root}' ALTER COLUMN src SET DEFAULT 'web'",
        )                                                         # v2
        t.append(rows.filter(F.col("k") % 4 == 0).select("k"))   # v3 fill
        t.append(
            spark.createDataFrame(
                [(-1, None), (-2, None), (-3, None)],
                "k long, src string",
            )
        )                                                         # v4 nulls
        spark.createDataFrame(
            [(-10,), (-11,)], "k long"
        ).createOrReplaceTempView("lake_dflt_src")
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' AS t USING lake_dflt_src AS s "
            f"ON t.k = s.k "
            f"WHEN MATCHED THEN DELETE "
            f"WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)",
        )                                                         # v5 fill
        # one fused aggregate instead of four actions over the same
        # snapshot; filtered counts become conditional sums —
        # value-identical, oracle-pinned
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("src") == "seed").cast("long")).alias("ns"),
            F.sum((F.col("src") == "web").cast("long")).alias("nw"),
            F.sum(F.col("src").isNull().cast("long")).alias("nn"),
        ))
        out = [
            ("n_total", a["n"]),
            ("n_seed", a["ns"]),
            ("n_web", a["nw"]),
            ("n_null", a["nn"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_merge_on_predicates",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 5 = 0 AS insrc
        FROM orders
    ), c AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN insrc AND cents < 30000000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
            CAST(sum(CASE WHEN insrc AND cents >= 30000000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_res_ins,
            CAST(sum(CASE WHEN insrc AND cents < 30000000
                          THEN 0 ELSE cents END) AS BIGINT) AS keep_cents
        FROM k
    )
    SELECT 'n_final' AS step, n + n_res_ins + 2 AS value FROM c
    UNION ALL SELECT 'cents_final',
        keep_cents + 88888888888 * n_upd
                   + 88888888889 * (n_res_ins + 2) FROM c
    UNION ALL SELECT 'n_upd', n_upd FROM c
    UNION ALL SELECT 'n_res_ins', n_res_ins FROM c
    """,
)
def lake_merge_on_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary MERGE ON predicates under the oracle (r13 verdict
    task #1): a DIFFERENTLY-NAMED equi key (``ON t.k = s.ck`` —
    rename-projected source, clause text follows the rename) combined
    with a RESIDUAL non-equi conjunct (``AND t.cents < 30000000``)
    that gates matching row-granularly, Delta's semantics: a key-equal
    pair failing the residual is NOT matched, so its source row
    INSERTS (duplicate key next to the untouched target row) — DuckDB
    recomputes the outcome algebraically from ``orders``.

    Scale shape: the rename is a metadata projection; the residual
    rides the same single pruned candidate join as any conditional
    merge (key-rectangle pruning is unaffected — the residual only
    narrows matches).

    Reference parity: Delta MERGE arbitrary ON conditions
    (differently-named keys + extra conjuncts)."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    src = rows.filter(F.col("k") % 5 == 0).select(
        F.col("k").alias("ck"), F.lit(88888888888).alias("cents")
    )
    extra = spark.createDataFrame(
        [(-1, 88888888888), (-2, 88888888888)], "ck long, cents bigint"
    )
    src.unionByName(extra).createOrReplaceTempView("lake_merge_onpred_src")
    root = tempfile.mkdtemp(prefix="lake_onpred_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["k"])
        t.append(rows)
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' AS t USING lake_merge_onpred_src AS s "
            f"ON t.k = s.ck AND t.cents < 30000000 "
            f"WHEN MATCHED THEN UPDATE SET cents = s.cents "
            f"WHEN NOT MATCHED THEN INSERT (k, cents) "
            f"VALUES (s.ck, s.cents + 1)",
        )
        # one fused aggregate instead of four actions over the same
        # snapshot; filtered counts become conditional sums —
        # value-identical, oracle-pinned
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
            F.sum(
                (F.col("cents") == 88888888888).cast("long")
            ).alias("nu"),
            F.sum(
                ((F.col("cents") == 88888888889) & (F.col("k") > 0))
                .cast("long")
            ).alias("nri"),
        ))
        out = [
            ("n_final", a["n"]),
            ("cents_final", a["cents"]),
            ("n_upd", a["nu"]),
            ("n_res_ins", a["nri"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_merge_matrix",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 7 = 0 AS insrc
        FROM orders
    ), c AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN insrc AND cents < 20000000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
            CAST(sum(CASE WHEN insrc AND cents >= 20000000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_del_m,
            CAST(sum(CASE WHEN NOT insrc AND cents > 40000000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_del_bs,
            CAST(sum(CASE WHEN NOT insrc AND cents <= 40000000
                               AND cents < 2000000
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
            CAST(sum(CASE WHEN NOT insrc AND cents <= 40000000
                          THEN cents ELSE 0 END) AS BIGINT) AS keep_cents
        FROM k
    )
    SELECT 'n_final' AS step, n - n_del_m - n_del_bs + 2 AS value FROM c
    UNION ALL SELECT 'cents_final',
        keep_cents + 77777777777 * n_upd + 2 * 77777777778 FROM c
    UNION ALL SELECT 'n_upd', n_upd FROM c
    UNION ALL SELECT 'n_low', n_low FROM c
    UNION ALL SELECT 'n_ins', CAST(2 AS BIGINT) FROM c
    """,
)
def lake_merge_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Delta MERGE clause matrix in one statement, under the
    oracle (r12): conditional matched UPDATE vs DELETE (first-match-
    wins), column-level ``INSERT (cols) VALUES (exprs)`` with a
    condition, and both NOT MATCHED BY SOURCE forms (conditional
    DELETE + conditional UPDATE SET) — all delegated through
    ``snapshot_sql`` to ``merge_when`` and recomputed algebraically by
    DuckDB from ``orders``.

    Scale shape: one planner-pruned candidate join for the matched
    clauses; the by-source clauses' own conditions drive extra-file
    pruning (union-of-rowsets); everything commits in ONE pass through
    the merge machinery. The update sentinel (77,777,777,777 cents)
    exceeds any real order total, so the count is collision-free.

    Reference parity: Delta MERGE WHEN MATCHED / NOT MATCHED /
    NOT MATCHED BY SOURCE (Delta 2.3+)."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.lit("base").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    src = rows.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("src").alias("status"),
        F.lit(77777777777).alias("cents"),
    )
    extra = spark.createDataFrame(
        [(-1, "src", 77777777777), (-2, "src", 77777777777),
         (-3, "src", 77777777777)],
        "k long, status string, cents bigint",
    )
    src.unionByName(extra).createOrReplaceTempView("lake_merge_matrix_src")
    root = tempfile.mkdtemp(prefix="lake_matrix_")
    try:
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["k"])
        t.append(rows)
        snapshot_sql(
            spark,
            f"MERGE INTO '{t.root}' AS t USING lake_merge_matrix_src AS s "
            f"ON t.k = s.k "
            f"WHEN MATCHED AND t.cents < 20000000 THEN UPDATE SET "
            f"cents = s.cents "
            f"WHEN MATCHED THEN DELETE "
            f"WHEN NOT MATCHED AND s.k % 2 <> 0 THEN "
            f"INSERT (k, cents) VALUES (s.k, s.cents + 1) "
            f"WHEN NOT MATCHED BY SOURCE AND t.cents > 40000000 THEN "
            f"DELETE "
            f"WHEN NOT MATCHED BY SOURCE AND t.cents < 2000000 THEN "
            f"UPDATE SET status = 'low'",
        )
        # one fused aggregate instead of five actions over the same
        # snapshot; filtered counts become conditional sums —
        # value-identical, oracle-pinned
        a = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
            F.sum(
                (F.col("cents") == 77777777777).cast("long")
            ).alias("nu"),
            F.sum((F.col("status") == "low").cast("long")).alias("nl"),
            F.sum(F.col("status").isNull().cast("long")).alias("ni"),
        ))
        out = [
            ("n_final", a["n"]),
            ("cents_final", a["cents"]),
            ("n_upd", a["nu"]),
            ("n_low", a["nl"]),
            ("n_ins", a["ni"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_shallow_clone",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k FROM orders
    ), c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n3,
               CAST(sum(CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n5,
               CAST(sum(CASE WHEN k % 15 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n15
        FROM k
    )
    SELECT 'clone_v1_n' AS step, n AS value FROM c
    UNION ALL SELECT 'clone_head_n', n + n3 FROM c
    UNION ALL SELECT 'clone_after_delete', n + n3 - n5 - n15 FROM c
    UNION ALL SELECT 'src_untouched', n + n3 FROM c
    UNION ALL SELECT 'clone_props', CAST(2 AS BIGINT) FROM c
    """,
)
def lake_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CREATE TABLE '<dst>' SHALLOW CLONE '<src>' [VERSION AS OF
    v]`` under the oracle (r14 verdict missing #2, shipped r15): a
    version-pinned clone sees exactly the pinned snapshot, a head
    clone sees the head, DML on the clone rewrites under the CLONE's
    root while the source stays byte-untouched (full clone
    independence — the defining property), and the clone carries its
    own TBLPROPERTIES. DuckDB recomputes every count from ``orders``.

    Scale shape: a shallow clone is ONE metadata commit referencing
    the source snapshot's files by path — cloning a 100 TB table
    costs a manifest write (the scale-ramp ``shallow_clone_sec`` step
    measures the flat curve); the clone's later rewrites are ordinary
    pruned DML under its own root.

    Reference parity: Delta Lake CREATE TABLE ... SHALLOW CLONE
    (delta.io docs)."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="lake_clone_")
    try:
        src = SnapshotTable(spark, f"{root}/src", stats_columns=["k"])
        src.append(rows)                                        # v1
        src.append(rows.filter(F.col("k") % 3 == 0))            # v2
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}/pinned' SHALLOW CLONE "
            f"'{src.root}' VERSION AS OF 1",
        )
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}/head' SHALLOW CLONE '{src.root}'",
        )
        head = SnapshotTable(spark, f"{root}/head")
        out = [
            ("clone_v1_n",
             _n(SnapshotTable(spark, f"{root}/pinned").read())),
            ("clone_head_n", _n(head.read())),
        ]
        src_head_before = src.current_version()
        snapshot_sql(spark, f"DELETE FROM '{root}/head' WHERE k % 5 = 0")
        snapshot_sql(
            spark,
            f"ALTER TABLE '{root}/head' SET TBLPROPERTIES "
            f"(owner = 'clone-test', tier = 'scratch')",
        )
        out += [
            ("clone_after_delete", _n(head.read())),
            # clone independence: the source never advanced or changed
            ("src_untouched", _n(src.read())
             if src.current_version() == src_head_before else -1),
            ("clone_props",
             _n(head.show_tblproperties()
                .filter(~F.col("key").startswith("engine.")))),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")


@register(
    "lake_identity_cdc",
    oracle="""
    WITH c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_orderkey % 3 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN o_orderkey % 7 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n7,
               CAST(sum(CASE WHEN o_orderkey % 11 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n11,
               CAST(sum(CASE WHEN o_orderkey % 13 = 0
                             AND o_orderkey % 7 <> 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n13
        FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT 'mor_n' AS step, n AS value FROM c
    UNION ALL SELECT 'mor_bad_ids', CAST(0 AS BIGINT) FROM c
    UNION ALL SELECT 'mor_distinct', n FROM c
    UNION ALL SELECT 'apply_n', n - n13 + n11 FROM c
    UNION ALL SELECT 'apply_rid_max', 10 + 2 * (n + n2 + n11 - 1) FROM c
    UNION ALL SELECT 'apply_distinct', n - n13 + n11 FROM c
    UNION ALL SELECT 'apply_cents_777', n7 FROM c
    """,
)
def lake_identity_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTITY columns through the r15 CDC write paths under the
    oracle (r14 verdict missing #3): a full-key ``merge_mor``
    collapses duplicate keys while CARRYING target ids (no counter
    advance — every surviving id stays inside the already-claimed
    arithmetic progression), then an ``apply_changes`` batch updates
    (carry), deletes (retire, never reuse) and inserts (fresh ids
    advancing the counter by exactly the insert count). The row→id
    mapping is partitioning-dependent but the claimed SET is
    deterministic, so count/max/distinct/membership are exact closed
    forms DuckDB recomputes from ``orders`` (the even-key half — the
    steps run seven protocol commits/scans and the machinery is
    identical at any base size; the scale ramp's
    ``merge_mor_identity_sec`` step owns the growth curve).

    Scale shape: the carry is ONE pruned candidate scan with a
    map-side-combined per-key min, broadcast onto the stage join only
    under the merge nd gate; fresh assignment stays batch-proportional
    (per-partition row_number + broadcast offsets, no global window).

    Reference parity: Delta Lake identity columns through MERGE and
    DLT APPLY CHANGES (SCD TYPE 1) targets — current behavior; the
    originally-documented restrictions are lifted."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 2 == 0
    ).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="lake_idcdc_")
    try:
        snapshot_sql(
            spark,
            f"CREATE TABLE '{root}/tbl' (k BIGINT, cents BIGINT, "
            f"rid BIGINT GENERATED ALWAYS AS IDENTITY "
            f"(START WITH 10 INCREMENT BY 2))",
        )
        t = SnapshotTable(spark, f"{root}/tbl", stats_columns=["rid"])
        t.append(rows)                              # ids [10, 10+2(n-1)]
        t.append(rows.filter(F.col("k") % 3 == 0))  # continues the range
        hi_row = _v1(t.read().agg(F.max("rid").alias("mx")))
        hi = hi_row["mx"]  # top of the claimed range before the merge
        # MOR carry: a full-key upsert masks every row (incl. the
        # duplicate-key pairs) and appends one row per key CARRYING a
        # masked id — no fresh assignment, counter untouched
        t.merge_mor(
            rows.withColumn("cents", F.lit(0).cast("bigint")), "k"
        )
        in_claimed = (
            F.col("rid").between(10, hi) & (F.col("rid") % 2 == 0)
        )
        agg2 = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((~in_claimed).cast("long")).alias("bad"),
            F.countDistinct("rid").alias("nd"),
        ))
        out = [
            ("mor_n", agg2["n"]),
            ("mor_bad_ids", agg2["bad"]),
            ("mor_distinct", agg2["nd"]),
        ]
        # apply_changes: matched updates carry, deletes retire, fresh
        # inserts advance the counter by exactly their count
        changes = (
            rows.filter(F.col("k") % 7 == 0)
            .select("k", F.lit(777).cast("bigint").alias("cents"),
                    F.lit("U").alias("_op"))
            .unionByName(
                rows.filter(
                    (F.col("k") % 13 == 0) & (F.col("k") % 7 != 0)
                ).select("k", F.lit(0).cast("bigint").alias("cents"),
                         F.lit("D").alias("_op"))
            )
            .unionByName(
                rows.filter(F.col("k") % 11 == 0)
                .select(
                    (F.col("k") + F.lit(10 ** 12)).alias("k"),
                    F.lit(1).cast("bigint").alias("cents"),
                    F.lit("U").alias("_op"),
                )
            )
        )
        t.apply_changes(changes, "k")
        agg3 = _v1(t.read().agg(
            F.count(F.lit(1)).alias("n"),
            F.max("rid").alias("mx"),
            F.countDistinct("rid").alias("nd"),
            F.sum((F.col("cents") == 777).cast("long")).alias("c777"),
        ))
        out += [
            ("apply_n", agg3["n"]),
            ("apply_rid_max", agg3["mx"]),
            ("apply_distinct", agg3["nd"]),
            ("apply_cents_777", agg3["c777"]),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(out, "step string, value bigint")
