"""Declarative data-quality expectations (Deequ-style) evaluated in a
constant number of passes.

A constraint suite for a 100 TB table cannot run one scan per check —
the engine's job is to FUSE the suite: every row-level constraint
(completeness, range, set membership, uniqueness, row count) compiles
to an aggregate expression and the whole suite runs as ONE hash
aggregate over ONE scan; each referential-integrity constraint adds
one broadcast anti-join pass against its (small) referenced key set.
The result is one row per check: (check, kind, column, metric,
passed) — the audit artifact a pipeline gate consumes.

Checks are plain dicts so suites can live in config::

    {"kind": "not_null",      "column": "o_orderkey"}
    {"kind": "unique",        "column": "o_orderkey"}
    {"kind": "range",         "column": "o_totalprice", "lo": 0, "hi": 1e9}
    {"kind": "in_set",        "column": "o_orderstatus", "values": ["O","F","P"]}
    {"kind": "row_count_min", "n": 1000}
    {"kind": "ref_integrity", "column": "o_custkey", "ref": customer_df,
     "ref_column": "c_custkey"}
    {"kind": "mean_between",     "column": "o_totalprice", "lo": 1e4, "hi": 1e6}
    {"kind": "stddev_between",   "column": "o_totalprice", "lo": 0,   "hi": 1e6}
    {"kind": "quantile_between", "column": "o_totalprice", "q": 0.5,
     "lo": 1e4, "hi": 1e6}

An optional ``"name"`` overrides the auto-derived check name; repeated
kind+column pairs auto-suffix (_2, _3 …) to keep names unique.

`metric` is the count of VIOLATING rows (0 = clean) except
row_count_min, where it is the observed row count; uniqueness counts
rows in excess of their key's first occurrence (count - distinct).
The STATISTICAL kinds (Deequ's most-used drift checks) report the
observed statistic itself — mean, sample stddev, approx quantile
(percentile_approx, default accuracy) — and pass iff it lands inside
[lo, hi]. They compile into the SAME single hash aggregate as the
row-level checks (metric is therefore double for every kind). A batch
with no rows has no statistic: statistical checks FAIL on it (NULL
metric), by design — if empty batches are legal, gate emptiness
explicitly with row_count_min rather than letting a vacuous mean pass
a drift gate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# names end up interpolated into the stack() unpivot expression; a
# quote or backtick in a user-supplied name would be SQL-expression
# injection into the audit query, so only identifier characters pass
_SAFE_NAME = re.compile(r"^[A-Za-z0-9_]+$")

# statistic-in-band kinds: metric = the observed statistic, pass =
# lo <= metric <= hi (vs violation-count kinds where pass = metric 0)
_STAT_KINDS = ("mean_between", "stddev_between", "quantile_between")


def _check_name(c: dict) -> str:
    if "name" in c:
        return c["name"]
    if c["kind"] == "row_count_min":
        return f"row_count_min_{c['n']}"
    return f"{c['kind']}_{c['column']}"


def _unique_names(checks: list[dict]) -> list[str]:
    """One stable, UNIQUE name per check: duplicate kind+column pairs
    (e.g. two range bands on one column) get an ordinal suffix —
    without it the fused agg would alias two expressions identically
    and the stack() unpivot would raise AMBIGUOUS_REFERENCE."""
    seen: dict[str, int] = {}
    names = []
    for c in checks:
        base = _check_name(c)
        n = seen.get(base, 0)
        seen[base] = n + 1
        names.append(base if n == 0 else f"{base}_{n + 1}")
    return names


def _nullsafe(agg):
    """F.sum over zero rows is NULL; a constraint with no rows to
    violate is CLEAN (metric 0), and NULL would poison the passed
    column (NULL == 0 is NULL -> a WAP gate would fail an empty,
    vacuously clean micro-batch)."""
    return F.coalesce(agg, F.lit(0))


def run_checks(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate a constraint suite. One aggregate pass for all
    row-level checks + one broadcast anti-join per ref_integrity
    check; returns (check, kind, column, metric, passed)."""
    aggs: list = []
    rows_meta: list[tuple[str, str, str]] = []  # (name, kind, column)
    names = _unique_names(checks)
    for name in names:
        if not _SAFE_NAME.match(name):
            raise ValueError(
                f"unsafe check name {name!r}: names are interpolated into "
                f"the fused audit expression and must match [A-Za-z0-9_]+"
            )

    for c, name in zip(checks, names):
        kind = c["kind"]
        if kind == "not_null":
            aggs.append(
                _nullsafe(F.sum(F.when(F.col(c["column"]).isNull(), 1).otherwise(0)))
                .cast("double")
                .alias(name)
            )
        elif kind == "range":
            aggs.append(
                _nullsafe(
                    F.sum(
                        F.when(
                            ~F.col(c["column"]).between(
                                F.lit(c["lo"]), F.lit(c["hi"])
                            ),
                            1,
                        ).otherwise(0)
                    )
                )
                .cast("double")
                .alias(name)
            )
        elif kind == "in_set":
            aggs.append(
                _nullsafe(
                    F.sum(
                        F.when(~F.col(c["column"]).isin(*c["values"]), 1).otherwise(0)
                    )
                )
                .cast("double")
                .alias(name)
            )
        elif kind == "unique":
            # duplicates = non-null rows beyond each key's first
            # occurrence; exact distinct fuses into the same hash agg
            # (Spark plans it as a two-phase expand, still one scan)
            aggs.append(
                (
                    F.count(F.col(c["column"]))
                    - F.count_distinct(F.col(c["column"]))
                )
                .cast("double")
                .alias(name)
            )
        elif kind == "row_count_min":
            aggs.append(F.count(F.lit(1)).cast("double").alias(name))
        elif kind == "mean_between":
            aggs.append(F.avg(F.col(c["column"])).cast("double").alias(name))
        elif kind == "stddev_between":
            aggs.append(
                F.stddev_samp(F.col(c["column"])).cast("double").alias(name)
            )
        elif kind == "quantile_between":
            aggs.append(
                F.percentile_approx(F.col(c["column"]), float(c["q"]))
                .cast("double")
                .alias(name)
            )
        elif kind == "ref_integrity":
            continue  # separate pass below
        else:
            raise ValueError(f"unknown check kind {kind!r}")
        rows_meta.append((name, kind, c.get("column", "")))

    out = None
    if aggs:
        wide = df.agg(*aggs)
        # unpivot the single metrics row to one row per check
        stack_args = ", ".join(f"'{n}', `{n}`" for n, _, _ in rows_meta)
        meta_map = {n: (kind, col) for n, kind, col in rows_meta}
        long = wide.selectExpr(
            f"stack({len(rows_meta)}, {stack_args}) AS (check, metric)"
        )
        kind_expr = F.create_map(
            *[x for n, (kind, _) in meta_map.items() for x in (F.lit(n), F.lit(kind))]
        )
        col_expr = F.create_map(
            *[x for n, (_, col) in meta_map.items() for x in (F.lit(n), F.lit(col))]
        )
        min_rows = {
            name: int(c["n"])
            for c, name in zip(checks, names)
            if c["kind"] == "row_count_min"
        }
        passed = F.when(
            F.col("kind") == "row_count_min",
            F.col("metric")
            >= F.coalesce(
                F.create_map(
                    *[
                        x
                        for n, v in min_rows.items()
                        for x in (F.lit(n), F.lit(v))
                    ]
                )[F.col("check")]
                if min_rows
                else F.lit(None).cast("double"),
                F.lit(0),
            ),
        )
        stat_bounds = {
            name: (float(c["lo"]), float(c["hi"]))
            for c, name in zip(checks, names)
            if c["kind"] in _STAT_KINDS
        }
        if stat_bounds:
            lo_map = F.create_map(
                *[x for n, (lo, _) in stat_bounds.items() for x in (F.lit(n), F.lit(lo))]
            )
            hi_map = F.create_map(
                *[x for n, (_, hi) in stat_bounds.items() for x in (F.lit(n), F.lit(hi))]
            )
            # NULL statistic (empty batch) -> failed, never NULL passed
            passed = passed.when(
                F.col("kind").isin(*_STAT_KINDS),
                F.coalesce(
                    F.col("metric").between(
                        lo_map[F.col("check")], hi_map[F.col("check")]
                    ),
                    F.lit(False),
                ),
            )
        passed = passed.otherwise(F.col("metric") == 0)
        out = (
            long.withColumn("kind", kind_expr[F.col("check")])
            .withColumn("column", col_expr[F.col("check")])
            .withColumn("passed", passed)
            .select("check", "kind", "column", "metric", "passed")
        )

    for c, name in zip(checks, names):
        if c["kind"] != "ref_integrity":
            continue
        ref_keys = (
            c["ref"]
            .select(F.col(c["ref_column"]).alias("_rk"))
            .where(F.col(c["ref_column"]).isNotNull())
            .distinct()
        )
        orphans = (
            df.where(F.col(c["column"]).isNotNull())
            .join(
                F.broadcast(ref_keys),
                df[c["column"]] == F.col("_rk"),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("double").alias("metric"))
            .select(
                F.lit(name).alias("check"),
                F.lit("ref_integrity").alias("kind"),
                F.lit(c["column"]).alias("column"),
                F.col("metric"),
                (F.col("metric") == 0).alias("passed"),
            )
        )
        out = orphans if out is None else out.unionByName(orphans)

    if out is None:
        raise ValueError("empty check suite")
    return out
