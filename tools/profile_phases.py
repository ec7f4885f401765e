"""Phase-level wall timing of the two heaviest lake rows: re-runs the
query body with a timer around each engine call, so seconds attribute
to protocol phases (append / merge_mor / apply_changes / measurement
reads) instead of whole queries. Relative shares are what matter.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_phases.py idcdc scd2
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


class T:
    def __init__(self):
        self.rows = []

    def __call__(self, label):
        self.label = label
        return self

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        self.rows.append((self.label, time.perf_counter() - self.t0))

    def report(self, name):
        total = sum(s for _, s in self.rows)
        print(f"--- {name} (total {total:.2f}s) ---")
        for label, s in self.rows:
            print(f"  {label:28s} {s:7.2f}  {100 * s / total:5.1f}%")
        self.rows = []


def run_idcdc(spark, sf_dir, t):
    from collective_als_spark.sources import load_table
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    rows = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 2 == 0
    ).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="prof_idcdc_")
    try:
        with t("create"):
            snapshot_sql(
                spark,
                f"CREATE TABLE '{root}/tbl' (k BIGINT, cents BIGINT, "
                f"rid BIGINT GENERATED ALWAYS AS IDENTITY "
                f"(START WITH 10 INCREMENT BY 2))",
            )
        tb = SnapshotTable(spark, f"{root}/tbl", stats_columns=["rid"])
        with t("append_1"):
            tb.append(rows)
        with t("append_2"):
            tb.append(rows.filter(F.col("k") % 3 == 0))
        with t("read_hi"):
            hi = tb.read().agg(F.max("rid").alias("mx")).first()["mx"]
        with t("merge_mor"):
            tb.merge_mor(
                rows.withColumn("cents", F.lit(0).cast("bigint")), "k"
            )
        in_claimed = F.col("rid").between(10, hi) & (F.col("rid") % 2 == 0)
        with t("agg_after_mor"):
            tb.read().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((~in_claimed).cast("long")).alias("bad"),
                F.countDistinct("rid").alias("nd"),
            ).first()
        changes = (
            rows.filter(F.col("k") % 7 == 0)
            .select("k", F.lit(777).cast("bigint").alias("cents"),
                    F.lit("U").alias("_op"))
            .unionByName(
                rows.filter((F.col("k") % 13 == 0) & (F.col("k") % 7 != 0))
                .select("k", F.lit(0).cast("bigint").alias("cents"),
                        F.lit("D").alias("_op"))
            )
            .unionByName(
                rows.filter(F.col("k") % 11 == 0)
                .select((F.col("k") + F.lit(10 ** 12)).alias("k"),
                        F.lit(1).cast("bigint").alias("cents"),
                        F.lit("U").alias("_op"))
            )
        )
        with t("apply_changes"):
            tb.apply_changes(changes, "k")
        with t("agg_after_apply"):
            tb.read().agg(
                F.count(F.lit(1)).alias("n"),
                F.max("rid").alias("mx"),
                F.countDistinct("rid").alias("nd"),
                F.sum((F.col("cents") == 777).cast("long")).alias("c777"),
            ).first()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    t.report("lake_identity_cdc")


def run_scd2(spark, sf_dir, t):
    from collective_als_spark.sources import load_table
    from collective_als_spark.sources.layout import SnapshotTable

    rows = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    k = F.col("key")

    def ch(df, cents_val, op, seq):
        cc = (
            F.col("cents") if cents_val == "keep"
            else F.lit(cents_val).cast("bigint")
        )
        return df.select(
            "key", cc.alias("cents"),
            F.lit(op).alias("_op"), F.lit(seq).cast("long").alias("seq"),
        )

    root = tempfile.mkdtemp(prefix="prof_scd2_")
    try:
        tb = SnapshotTable(
            spark, f"{root}/tbl", stats_columns=["key"], bloom_columns=["key"]
        )
        with t("apply_seed"):
            tb.apply_changes(ch(rows, "keep", "U", 1), "key",
                             seq_col="seq", scd_type=2, track_seq=True)
        live = ch(rows.filter(k % 10 == 0), 999, "U", 10).unionByName(
            ch(rows.filter(k % 10 == 5), None, "D", 10)
        )
        with t("apply_live"):
            tb.apply_changes(live, "key", seq_col="seq", scd_type=2,
                             track_seq=True)
        stale = ch(rows.filter(k % 10 == 0), 111, "U", 5).unionByName(
            ch(rows.filter(k % 10 == 5), 222, "U", 5)
        )
        with t("apply_stale"):
            tb.apply_changes(stale, "key", seq_col="seq", scd_type=2,
                             track_seq=True)
        is_open = F.col("__END_AT").isNull()
        with t("measure"):
            tb.read().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(is_open.cast("long")).alias("n_open"),
                F.sum((~is_open).cast("long")).alias("n_closed"),
                F.sum(F.when(is_open, F.col("cents"))).alias("open_cents"),
                F.sum(F.col("cents").isin(111, 222).cast("long")).alias("ns"),
            ).first()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    t.report("lake_scd2_history")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    which = sys.argv[1:] or ["idcdc", "scd2"]
    from collective_als_spark.registry import spark_queries
    from collective_als_spark.session import get_spark

    spark = get_spark("profile_phases")
    qs = spark_queries()
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t = T()
    for w in which:
        for _pass in range(2):  # second pass is codegen-warm
            if w == "idcdc":
                run_idcdc(spark, sf_dir, t)
            elif w == "scd2":
                run_scd2(spark, sf_dir, t)


if __name__ == "__main__":
    main()
