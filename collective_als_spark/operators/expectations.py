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


_ROW_LEVEL_KINDS = ("not_null", "range", "in_set", "expr", "ref_integrity")


def split_by_expectations(
    df: DataFrame, checks: list[dict], violations_col: str = "_violations"
) -> tuple[DataFrame, DataFrame]:
    """Row-level expect-or-drop (the DLT ``expect_or_drop`` +
    quarantine pattern): evaluate every ROW-LEVEL check per row and
    split ``df`` into (good, bad) — bad rows carry a
    ``violations_col`` array<string> naming every check they failed,
    so a quarantine consumer can triage without re-deriving why.

    Only per-row kinds participate: ``not_null``, ``range``,
    ``in_set``, ``expr`` ({"kind": "expr", "expr": "<sql boolean>",
    "name": ...} — an arbitrary row predicate), and ``ref_integrity``
    (one broadcast lookup join per check against the distinct
    referenced keys; a NULL foreign key is NOT an orphan — pair with
    not_null to reject those). Suite-level kinds (unique,
    row_count_min, statistical bands) have no per-row meaning and are
    rejected — gate them with ``run_checks``/WAP instead.

    NULL semantics match ``run_checks``: a NULL evaluation PASSES
    range/in_set/expr (SQL three-valued logic; use not_null to catch
    NULLs explicitly), so a row is quarantined only for checks it
    provably violates.

    Both returned frames share one lineage ending in complementary
    filters; a caller writing BOTH should materialize the tagged
    input once (e.g. ``df.localCheckpoint()`` before the split, as
    ``SnapshotTable.streaming_sink`` does) to avoid scanning twice.
    """
    for c in checks:
        if c["kind"] == "expr" and "name" not in c:
            raise ValueError(
                "expr checks need an explicit 'name' (there is no "
                "column to derive one from)"
            )
    names = _unique_names(checks)
    for name in names:
        if not _SAFE_NAME.match(name):
            raise ValueError(f"unsafe check name {name!r}")
    work = df
    preds: list[tuple[str, object]] = []
    drop_cols: list[str] = []
    for i, (c, name) in enumerate(zip(checks, names)):
        kind = c["kind"]
        if kind == "not_null":
            ok = F.col(c["column"]).isNotNull()
        elif kind == "range":
            ok = F.coalesce(
                F.col(c["column"]).between(F.lit(c["lo"]), F.lit(c["hi"])),
                F.lit(True),
            )
        elif kind == "in_set":
            ok = F.coalesce(
                F.col(c["column"]).isin(*c["values"]), F.lit(True)
            )
        elif kind == "expr":
            ok = F.coalesce(F.expr(c["expr"]), F.lit(True))
        elif kind == "ref_integrity":
            rk = f"__refk_{i}"
            ref_keys = (
                c["ref"]
                .select(F.col(c["ref_column"]).alias(rk))
                .where(F.col(rk).isNotNull())
                .distinct()
            )
            work = work.join(
                F.broadcast(ref_keys),
                work[c["column"]] == F.col(rk),
                "left",
            )
            ok = F.col(rk).isNotNull() | F.col(c["column"]).isNull()
            drop_cols.append(rk)
        else:
            raise ValueError(
                f"check kind {kind!r} is suite-level (no per-row "
                f"meaning) — use run_checks/wap_commit for it"
            )
        preds.append((name, ok))
    viol = F.array_compact(
        F.array(*[F.when(~ok, F.lit(name)) for name, ok in preds])
    )
    tagged = work.withColumn(violations_col, viol).drop(*drop_cols)
    good = tagged.filter(F.size(violations_col) == 0).drop(violations_col)
    bad = tagged.filter(F.size(violations_col) > 0)
    return good, bad
