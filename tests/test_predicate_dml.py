"""Arbitrary-predicate DML (r09 verdict #1): delete_where /
delete_where_mor / update_where / replace_where / read accept any SQL
predicate (or Column), pruning proofs come from recognized
AND-conjuncts, and the exact predicate always carries correctness.

Invariants driven here:
- predicate DML == the equivalent full-scan filter, NULLs included
  (matched = pred IS TRUE, survivors = exact complement);
- band-shaped conjuncts still bound file opens (untouched files carry
  over by path, pruned reads open fewer files);
- unrecognized conjuncts degrade to full-candidate scans, never to
  wrong results;
- the CDF stream of a predicate delete equals the table delta.
"""

import pyspark.sql.functions as F
import pytest

from collective_als_spark.sources.layout import SnapshotTable
from collective_als_spark.sources.predicate import (
    OPAQUE,
    analyze_predicate,
)


# ---------------------------------------------------------------------------
# analyzer unit tests (no Spark)
# ---------------------------------------------------------------------------


def test_analyze_conjunct_shapes():
    c1, c2 = analyze_predicate("status = 'cancelled' AND region IN ('EU','US')")
    assert (c1.kind, c1.column, c1.lo, c1.hi) == ("band", "status", "cancelled", "cancelled")
    assert c1.values == frozenset(["cancelled"])
    assert c2.values == frozenset(["EU", "US"])
    assert (c2.lo, c2.hi) == ("EU", "US")

    (b,) = analyze_predicate("o_orderkey BETWEEN 5 AND 10")
    assert (b.column, b.lo, b.hi, b.lo_strict, b.hi_strict) == (
        "o_orderkey", 5, 10, False, False,
    )

    lo, hi = analyze_predicate("d >= DATE '2020-01-01' AND d < DATE '2021-01-01'")
    assert (lo.lo, lo.lo_strict) == ("2020-01-01", False)
    assert (hi.hi, hi.hi_strict) == ("2021-01-01", True)

    (n1, n2) = analyze_predicate("a IS NULL AND b IS NOT NULL")
    assert (n1.kind, n1.want_null) == ("null", True)
    assert (n2.kind, n2.want_null) == ("null", False)

    # flipped literal-first comparison
    (f_,) = analyze_predicate("5 <= x")
    assert (f_.column, f_.lo) == ("x", 5)

    # negative / float literals
    g, h = analyze_predicate("x > -5 AND y <= 3.5")
    assert (g.lo, g.lo_strict) == (-5, True)
    assert h.hi == 3.5


def test_analyze_or_becomes_disjunction_conjunct():
    # every branch provable -> an 'or' conjunct (union-of-rowsets
    # pruning: out only if every branch proves out)
    (d,) = analyze_predicate("x = 1 OR y = 2")
    assert d.kind == "or" and len(d.branches) == 2
    assert d.branches[0][0].column == "x" and d.branches[1][0].column == "y"
    (d2,) = analyze_predicate("(a = 1 AND b = 2) OR (a = 9 AND b = 8)")
    assert d2.kind == "or" and [len(b) for b in d2.branches] == [2, 2]
    # one unprovable branch poisons the whole disjunction
    (d3,) = analyze_predicate("x = 1 OR upper(y) = 'A'")
    assert d3 == OPAQUE


def test_analyze_mixed_precedence_regression():
    """r09 soundness bug / r10 fix lock-in: SQL binds AND tighter than
    OR, so an unparenthesized mix MUST parse as a disjunction of
    AND-chains. Reverting the gates at ``predicate.py`` (the
    ``_has_top_level_or`` checks in ``analyze_predicate`` and the
    paren-strip recursion) makes every assertion here fail."""
    (d,) = analyze_predicate("a = 1 AND b = 2 OR c = 3")
    assert d.kind == "or"
    assert [sorted(c.column for c in br) for br in d.branches] == [["a", "b"], ["c"]]
    (d2,) = analyze_predicate("x = 1 OR y = 2 AND z = 3")
    assert d2.kind == "or"
    assert [sorted(c.column for c in br) for br in d2.branches] == [["x"], ["y", "z"]]
    # paren-wrapped variant exercises the second fixed site (the
    # paren-strip recursion must NOT re-split the inner run on AND)
    (d3,) = analyze_predicate("(a = 1 AND b = 2 OR c = 3)")
    assert d3.kind == "or"
    assert [sorted(c.column for c in br) for br in d3.branches] == [["a", "b"], ["c"]]
    # IS NOT NULL inside a disjunction stays provable (context
    # tracking, not token matching)
    (d4,) = analyze_predicate("a = 99 OR b IS NOT NULL")
    assert d4.kind == "or"
    assert d4.branches[0][0].values == frozenset([99])
    assert (d4.branches[1][0].kind, d4.branches[1][0].want_null) == ("null", False)
    # an unprovable piece inside a branch only opaques that piece —
    # branch rows still satisfy a = 1, so pruning on it is sound
    (d5,) = analyze_predicate("a = 1 AND x LIKE '%y' OR c = 3")
    assert d5.kind == "or"
    assert [[c.column for c in br] for br in d5.branches] == [["a"], ["c"]]
    # a branch with ZERO provable conjuncts still poisons the OR
    (d6,) = analyze_predicate("NOT upper(a) = 'x' OR c = 3")
    assert d6 == OPAQUE
    # a provable NOT branch participates (complement-interval pruning)
    (d7,) = analyze_predicate("NOT a = 1 OR c = 3")
    assert d7.kind == "or" and len(d7.branches) == 2
    assert d7.branches[0][0].kind == "or"  # (a < 1) OR (a > 1)


def test_analyze_degrades_to_opaque_never_raises():
    # functions / LIKE / column-to-column / NOT-over-unprovable /
    # multi-value NOT IN: opaque
    for sql in (
        "NOT upper(x) = 'A'",
        "NOT x IN (1, 2)",
        "x NOT IN (1, 2)",
        "upper(s) = 'A'",
        "x LIKE '%a'",
        "x NOT LIKE '%a'",
        "a = b",
        "???",
        "",
    ):
        conj = analyze_predicate(sql)
        assert all(c.kind in ("opaque", "band", "null") for c in conj)
        assert any(c == OPAQUE for c in conj) or not sql
    # mixed: the opaque conjunct doesn't poison the recognized one
    conj = analyze_predicate("upper(s) = 'A' AND k = 7")
    kinds = sorted(c.kind for c in conj)
    assert kinds == ["band", "opaque"]
    # parenthesized AND group recurses
    conj = analyze_predicate("(x = 1 AND y = 2) AND z > 0")
    assert [c.kind for c in conj] == ["band", "band", "band"]


# ---------------------------------------------------------------------------
# DML over a table with NULLs (the r07 discipline, generalized)
# ---------------------------------------------------------------------------


def _orders(spark):
    rows = [
        (1, "cancelled", "EU", 10.0),
        (2, "cancelled", "US", 20.0),
        (3, "cancelled", "JP", 30.0),  # region not in set: survives
        (4, "open", "EU", 40.0),       # status mismatch: survives
        (5, None, "EU", 50.0),         # NULL status: pred NULL -> survives
        (6, "cancelled", None, 60.0),  # NULL region: pred NULL -> survives
        (7, "open", None, 70.0),
    ]
    return spark.createDataFrame(rows, "id long, status string, region string, amount double")


PRED = "status = 'cancelled' AND region IN ('EU', 'US')"


def test_delete_where_predicate_exact_complement_with_nulls(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id", "status", "region"])
    t.append(_orders(spark))
    v = t.delete_where(PRED)
    assert v == 2
    got = sorted(r["id"] for r in t.read().collect())
    assert got == [3, 4, 5, 6, 7]  # NULL-predicate rows survive


def test_delete_where_predicate_column_form(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    t.delete_where((F.col("status") == "cancelled") & F.col("region").isin("EU", "US"))
    assert sorted(r["id"] for r in t.read().collect()) == [3, 4, 5, 6, 7]


def test_delete_where_mor_predicate_matches_cow(spark, tmp_path):
    cow = SnapshotTable(spark, str(tmp_path / "cow"), stats_columns=["id"])
    mor = SnapshotTable(spark, str(tmp_path / "mor"), stats_columns=["id"])
    cow.append(_orders(spark))
    mor.append(_orders(spark))
    cow.delete_where(PRED)
    mor.delete_where_mor(PRED)
    a = sorted(tuple(r) for r in cow.read().collect())
    b = sorted(tuple(r) for r in mor.read().collect())
    assert a == b


def test_delete_where_predicate_is_null(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id", "status"])
    t.append(_orders(spark))
    t.delete_where("status IS NULL")
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3, 4, 6, 7]


def test_update_where_predicate_nulls_carried(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    t.update_where("status = 'cancelled' AND amount < 25", set={"amount": "amount * 10"})
    rows = {r["id"]: r["amount"] for r in t.read().collect()}
    assert rows[1] == 100.0 and rows[2] == 200.0
    assert rows[3] == 30.0 and rows[5] == 50.0 and rows[6] == 60.0


def test_replace_where_predicate_validates_and_swaps(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    good = spark.createDataFrame(
        [(10, "cancelled", "EU", 1.0)],
        "id long, status string, region string, amount double",
    )
    t.replace_where(predicate=PRED, df=good)
    got = sorted(r["id"] for r in t.read().collect())
    assert got == [3, 4, 5, 6, 7, 10]
    # out-of-region replacement rows rejected (incl. NULL-predicate rows)
    bad = spark.createDataFrame(
        [(11, "open", "EU", 1.0)],
        "id long, status string, region string, amount double",
    )
    with pytest.raises(ValueError, match="do NOT satisfy the predicate"):
        t.replace_where(predicate=PRED, df=bad)
    nullish = spark.createDataFrame(
        [(12, "cancelled", None, 1.0)],
        "id long, status string, region string, amount double",
    )
    with pytest.raises(ValueError, match="do NOT satisfy the predicate"):
        t.replace_where(predicate=PRED, df=nullish)


def test_delete_where_mixed_precedence_end_to_end(spark, tmp_path):
    """The r09 judge repro, pinned: an unparenthesized AND/OR mix
    must delete ``(a=1 AND b=2) OR c=3`` — the r09 bug deleted
    ``a=1 AND (b=2 OR c=3)`` instead (wrong rows gone, wrong rows
    kept)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["a", "b", "c"])
    rows = [
        (1, 2, 0),  # a=1 AND b=2        -> matched
        (1, 5, 0),  # a=1 only           -> survives (r09 bug: b=2 OR c=3 false, survived both ways)
        (9, 2, 0),  # b=2 only           -> survives
        (7, 7, 3),  # c=3 only           -> matched (r09 bug kept it: a!=1)
        (1, 2, 3),  # both sides         -> matched
        (1, 0, 3),  # a=1, c=3           -> matched (r09 bug: matched too — not a witness alone)
    ]
    t.append(spark.createDataFrame(rows, "a long, b long, c long"))
    pred = "a = 1 AND b = 2 OR c = 3"
    got = sorted(tuple(r) for r in t.read(where=pred).collect())
    assert got == [(1, 0, 3), (1, 2, 0), (1, 2, 3), (7, 7, 3)]
    t.delete_where(pred)
    left = sorted(tuple(r) for r in t.read().collect())
    assert left == [(1, 5, 0), (9, 2, 0)]


def test_delete_where_band_args_still_work(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.append(_orders(spark))
    t.delete_where("id", 2, 4)
    assert sorted(r["id"] for r in t.read().collect()) == [1, 5, 6, 7]
    with pytest.raises(ValueError, match="not both"):
        t.delete_where("id", 2, 4, predicate="id = 1")


# ---------------------------------------------------------------------------
# pruning: band-shaped conjuncts still bound file opens
# ---------------------------------------------------------------------------


def _banded(spark, t):
    """Three single-file commits covering v-bands 0-99 / 1000-1099 /
    2000-2099 with a side 'flag' column."""
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 100)
            .select(
                F.col("id").alias("v"),
                F.when(F.col("id") % 2 == 0, F.lit("x")).otherwise(F.lit("y")).alias("flag"),
            )
            .coalesce(1)
        )


def test_predicate_delete_prunes_candidate_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    _banded(spark, t)
    before = set(t._manifest(t.current_version())["files"])
    # band conjunct bounds the rewrite; the opaque-ish flag conjunct
    # (recognized = on a stats-less column) doesn't widen it
    t.delete_where("v BETWEEN 1000 AND 1099 AND flag = 'x'")
    after = set(t._manifest(t.current_version())["files"])
    # 0- and 2000-band files untouched (identical paths); only the
    # 1000-band file was rewritten
    assert len(before & after) == 2
    got = t.read().filter(F.col("v").between(1000, 1099)).collect()
    assert sorted(r["v"] for r in got) == [v for v in range(1000, 1100) if v % 2 == 1]


def test_predicate_mor_delete_dv_only_on_candidates(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    _banded(spark, t)
    t.delete_where_mor("v >= 2000 AND flag = 'y'")
    m = t._manifest(t.current_version())
    # only the 2000-band file got a DV entry
    assert len(m.get("dvs", {})) == 1
    assert t.read().count() == 250


def test_read_where_predicate_prunes_and_matches_filter(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    _banded(spark, t)
    pruned = t.read(where="v BETWEEN 1000 AND 1099 AND flag = 'x'")
    full = t.read().filter(F.col("v").between(1000, 1099) & (F.col("flag") == "x"))
    assert len(pruned.inputFiles()) == 1 < len(t.read().inputFiles())
    assert sorted(r["v"] for r in pruned.collect()) == sorted(
        r["v"] for r in full.collect()
    )
    # band-tuple list form: conjunction of bands
    both = t.read(where=[("v", 0, 99), ("v", 50, 2050)])
    assert len(both.inputFiles()) == 1
    assert sorted(r["v"] for r in both.collect()) == list(range(50, 100))
    # strict open range prunes the boundary file exactly
    strict = t.read(where="v > 1099 AND v < 2000")
    assert len(strict.inputFiles()) == 0 or strict.count() == 0
    assert strict.count() == 0


def test_read_where_opaque_predicate_full_scan_correct(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    _banded(spark, t)
    # provable OR: union-of-rowsets pruning (only the two banded
    # files open), still exact
    got = t.read(where="v = 5 OR v = 2005")
    assert sorted(r["v"] for r in got.collect()) == [5, 2005]
    assert len(got.inputFiles()) == 2
    # unprovable branch: conservative full candidates, still exact
    got2 = t.read(where="v = 5 OR upper(flag) = 'X'")
    assert len(got2.inputFiles()) == 3
    assert got2.count() == 151  # v=5 (odd flag y) plus 150 even-flag rows


def test_read_where_is_null_pruning(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["s"])
    t.append(
        spark.createDataFrame([("a",), ("b",)], "s string").coalesce(1)
    )
    t.append(
        spark.createDataFrame([(None,), ("c",)], "s string").coalesce(1)
    )
    got = t.read(where="s IS NULL")
    assert got.count() == 1
    assert len(got.inputFiles()) == 1  # no-NULL file pruned by null counts


def test_predicate_delete_cdf_feed_equals_table_delta(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stats_columns=["id"], change_data_feed=True
    )
    t.append(_orders(spark))
    v1 = t.current_version()
    v2 = t.delete_where(PRED)
    feed = t.changes(v1, v2)
    dels = sorted(
        r["id"] for r in feed.filter(F.col("_change_type") == "delete").collect()
    )
    assert dels == [1, 2]
    assert feed.filter(F.col("_change_type") == "insert").count() == 0


def test_predicate_delete_in_set_bucket_pruning(spark, tmp_path):
    """IN-set conjuncts reach the hidden-partition bucket proofs: a
    bucketed layout opens only the buckets the literal set maps to."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append_bucketed(
        spark.range(0, 4000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("p")),
        "k",
        8,
    )
    before = set(t._manifest(t.current_version())["files"])
    t.delete_where("k IN (5, 9)")
    after = set(t._manifest(t.current_version())["files"])
    rewritten = before - after
    # the two keys land in at most 2 buckets: at most 2 files rewritten
    assert 1 <= len(rewritten) <= 2
    assert t.read().count() == 3998
    assert t.read().filter(F.col("k").isin(5, 9)).count() == 0


# ---------------------------------------------------------------------------
# property: pruning is SOUND — a pruned file provably holds no match
# ---------------------------------------------------------------------------


def test_prune_soundness_randomized():
    """Seeded randomized predicates over synthetic file stats: a file
    that actually CONTAINS a matching row is never pruned (soundness —
    the one property that must hold for every analyzer/prune change);
    completeness is best-effort by design. Pure python, no Spark."""
    import random

    from collective_als_spark.sources.predicate import prune_files

    rng = random.Random(77)

    def eval_pred(parts, row):
        # parts: list of (col, op, payload) conjuncts; SQL 3VL
        out = True
        for col, op, payload in parts:
            v = row[col]
            if op == "isnull":
                ok = v is None
            elif op == "notnull":
                ok = v is not None
            elif v is None:
                ok = None
            elif op == "=":
                ok = v == payload
            elif op == "<>":
                ok = v != payload
            elif op == "in":
                ok = v in payload
            elif op == "between":
                ok = payload[0] <= v <= payload[1]
            elif op == "notbetween":
                ok = not (payload[0] <= v <= payload[1])
            elif op == ">":
                ok = v > payload
            elif op == "<":
                ok = v < payload
            elif op == ">=":
                ok = v >= payload
            else:
                ok = v <= payload
            if ok is None:
                out = None if out is not False else False
            elif not ok:
                out = False
        return out is True

    def to_sql(parts):
        frags = []
        for col, op, payload in parts:
            if op == "isnull":
                frags.append(f"{col} IS NULL")
            elif op == "notnull":
                frags.append(f"{col} IS NOT NULL")
            elif op == "in":
                frags.append(f"{col} IN ({', '.join(str(x) for x in payload)})")
            elif op == "between":
                frags.append(f"{col} BETWEEN {payload[0]} AND {payload[1]}")
            elif op == "notbetween":
                frags.append(
                    f"{col} NOT BETWEEN {payload[0]} AND {payload[1]}"
                )
            else:
                frags.append(f"{col} {op} {payload}")
        return " AND ".join(frags)

    cols = ["a", "b"]
    for _trial in range(300):
        # synthetic "files" of random rows (None = NULL)
        files = []
        for fi in range(4):
            rows = [
                {
                    c: (None if rng.random() < 0.15 else rng.randint(-20, 20))
                    for c in cols
                }
                for _ in range(rng.randint(1, 8))
            ]
            files.append((f"f{fi}", rows))
        # per-file stats exactly as _file_stats records them
        stats = {}
        for name, rows in files:
            ent = {"__rows": len(rows)}
            for c in cols:
                vals = [r[c] for r in rows if r[c] is not None]
                nulls = sum(1 for r in rows if r[c] is None)
                ent[c] = [min(vals) if vals else None,
                          max(vals) if vals else None, nulls]
            stats[name] = ent
        # random conjunction (1-3 conjuncts)
        parts = []
        for _ in range(rng.randint(1, 3)):
            col = rng.choice(cols)
            op = rng.choice(
                ["=", "<>", "in", "between", "notbetween",
                 ">", "<", ">=", "<=", "isnull", "notnull"]
            )
            if op == "in":
                payload = tuple(
                    rng.randint(-20, 20) for _ in range(rng.randint(1, 3))
                )
            elif op in ("between", "notbetween"):
                lo = rng.randint(-20, 20)
                payload = (lo, lo + rng.randint(0, 10))
            elif op in ("isnull", "notnull"):
                payload = None
            else:
                payload = rng.randint(-20, 20)
            parts.append((col, op, payload))
        sql = to_sql(parts)
        conjuncts = analyze_predicate(sql)
        kept, pruned = prune_files(
            [n for n, _ in files], stats, lambda f: f, conjuncts
        )
        by_name = dict(files)
        for name in pruned:
            matches = [r for r in by_name[name] if eval_pred(parts, r)]
            assert not matches, (
                f"UNSOUND prune: {sql!r} pruned {name} holding {matches} "
                f"(stats {stats[name]})"
            )


def test_prune_soundness_randomized_boolean_trees():
    """r10-verdict #1(b): the conjunction-only generator above cannot
    detect a revert of the AND/OR precedence fix. This generator emits
    random boolean TREES — AND / OR / NOT over the same leaf shapes —
    rendered to SQL with only the parentheses SQL precedence REQUIRES
    (an OR child of an AND gets parens; redundant parens are added at
    random), so unparenthesized ``a AND b OR c`` mixes are common.
    Ground truth is a 3VL tree evaluator; the invariant is unchanged:
    a file holding a row where the predicate IS TRUE is never pruned."""
    import random

    from collective_als_spark.sources.predicate import prune_files

    rng = random.Random(1311)
    cols = ["a", "b"]

    def rand_leaf():
        col = rng.choice(cols)
        op = rng.choice(
            ["=", "<>", "in", "between",
             ">", "<", ">=", "<=", "isnull", "notnull", "opaq"]
        )
        if op == "opaq":
            # 'col + col = k': exact semantics (2*col = k, NULL->NULL)
            # but unparseable by the analyzer -> opaque conjunct. An
            # OR branch that drops it is LOSSY; NOT over that OR must
            # degrade (r11-ADVICE high revert detector).
            payload = rng.randint(-20, 20)
        elif op == "in":
            payload = tuple(rng.randint(-20, 20) for _ in range(rng.randint(1, 3)))
        elif op == "between":
            lo = rng.randint(-20, 20)
            payload = (lo, lo + rng.randint(0, 10))
        elif op in ("isnull", "notnull"):
            payload = None
        else:
            payload = rng.randint(-20, 20)
        return ("leaf", (col, op, payload))

    def rand_tree(depth):
        r = rng.random()
        if depth <= 0 or r < 0.45:
            return rand_leaf()
        if r < 0.70:
            return ("and", [rand_tree(depth - 1) for _ in range(rng.randint(2, 3))])
        if r < 0.92:
            return ("or", [rand_tree(depth - 1) for _ in range(rng.randint(2, 3))])
        return ("not", rand_tree(depth - 1))

    def eval_leaf(part, row):
        col, op, payload = part
        v = row[col]
        if op == "isnull":
            return v is None
        if op == "notnull":
            return v is not None
        if v is None:
            return None  # SQL NULL comparison
        if op == "opaq":
            return v + v == payload
        if op == "=":
            return v == payload
        if op == "<>":
            return v != payload
        if op == "in":
            return v in payload
        if op == "between":
            return payload[0] <= v <= payload[1]
        if op == ">":
            return v > payload
        if op == "<":
            return v < payload
        if op == ">=":
            return v >= payload
        return v <= payload

    def eval_tree(node, row):
        kind = node[0]
        if kind == "leaf":
            return eval_leaf(node[1], row)
        if kind == "not":
            v = eval_tree(node[1], row)
            return None if v is None else (not v)
        vals = [eval_tree(ch, row) for ch in node[1]]
        if kind == "and":
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False

    def leaf_sql(part):
        col, op, payload = part
        if op == "opaq":
            return f"{col} + {col} = {payload}"
        if op == "isnull":
            return f"{col} IS NULL"
        if op == "notnull":
            return f"{col} IS NOT NULL"
        if op == "in":
            return f"{col} IN ({', '.join(str(x) for x in payload)})"
        if op == "between":
            return f"{col} BETWEEN {payload[0]} AND {payload[1]}"
        return f"{col} {op} {payload}"

    def to_sql(node, parent):
        # parens REQUIRED only for an OR under an AND (SQL binds AND
        # tighter) and for any NOT operand; added redundantly at random
        kind = node[0]
        if kind == "leaf":
            s = leaf_sql(node[1])
        elif kind == "not":
            s = f"NOT ({to_sql(node[1], 'not')})"
        else:
            sep = " AND " if kind == "and" else " OR "
            s = sep.join(to_sql(ch, kind) for ch in node[1])
        needs = kind == "or" and parent == "and"
        if needs or (kind != "leaf" and rng.random() < 0.25):
            return f"({s})"
        return s

    for _trial in range(400):
        files = []
        for fi in range(4):
            rows = [
                {
                    c: (None if rng.random() < 0.15 else rng.randint(-20, 20))
                    for c in cols
                }
                for _ in range(rng.randint(1, 8))
            ]
            files.append((f"f{fi}", rows))
        stats = {}
        for name, rows in files:
            ent = {"__rows": len(rows)}
            for c in cols:
                vals = [r[c] for r in rows if r[c] is not None]
                nulls = sum(1 for r in rows if r[c] is None)
                ent[c] = [min(vals) if vals else None,
                          max(vals) if vals else None, nulls]
            stats[name] = ent
        tree = rand_tree(2)
        sql = to_sql(tree, None)
        conjuncts = analyze_predicate(sql)
        kept, pruned = prune_files(
            [n for n, _ in files], stats, lambda f: f, conjuncts
        )
        by_name = dict(files)
        for name in pruned:
            matches = [r for r in by_name[name] if eval_tree(tree, r) is True]
            assert not matches, (
                f"UNSOUND prune: {sql!r} pruned {name} holding {matches} "
                f"(stats {stats[name]})"
            )


def test_subquery_predicates_in_dml(spark, tmp_path):
    """r11-verdict missing #4: IN (SELECT ...) / EXISTS predicates in
    DELETE/UPDATE. The analyzer keeps them opaque (no pruning proof),
    and the exact residual rides Spark's native subquery support in
    DataFrame filters — results must equal the join-built expected,
    through the engine verbs, the MOR path, and the SQL dispatcher."""
    from collective_als_spark.sources.layout import SnapshotTable
    from collective_als_spark.sources.snapshot_sql import snapshot_sql

    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    t.append(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("g")
        )
    )
    spark.createDataFrame([(3,), (7,), (15,)], "k long").createOrReplaceTempView(
        "pred_subq_keys"
    )
    # the conjunct is opaque: zero pruning, full-candidate scan
    conj = analyze_predicate("k IN (SELECT k FROM pred_subq_keys)")
    assert [c.kind for c in conj] == ["opaque"]
    t.delete_where("k IN (SELECT k FROM pred_subq_keys)")
    assert sorted(r["k"] for r in t.read().collect()) == [
        k for k in range(20) if k not in (3, 7, 15)
    ]
    # UPDATE with an IN-subquery predicate
    spark.createDataFrame([(1,), (2,)], "g long").createOrReplaceTempView(
        "pred_subq_g"
    )
    t.update_where(
        "g IN (SELECT g FROM pred_subq_g)", set={"g": "g + 100"}
    )
    got = {r["k"]: r["g"] for r in t.read().collect()}
    assert got[1] == 101 and got[2] == 102 and got[0] == 0
    # NOT IN with NULL-free subquery via the SQL dispatcher
    snapshot_sql(
        spark,
        f"DELETE FROM '{t.root}' WHERE "
        f"k IN (SELECT k + 1 FROM pred_subq_keys)",
    )
    left = sorted(r["k"] for r in t.read().collect())
    assert 4 not in left and 8 not in left and 16 not in left
    # MOR delete path evaluates the same residual through DVs
    m = SnapshotTable(
        spark, str(tmp_path / "m"), stats_columns=["k"]
    )
    m.append(
        spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    )
    m.delete_where_mor(predicate="k IN (SELECT k FROM pred_subq_keys)")
    assert sorted(r["k"] for r in m.read().collect()) == [
        k for k in range(10) if k not in (3, 7)
    ]


def test_timestamp_literal_canonicalized_for_stats_compare():
    """r12 soundness fix: manifest stats store temporal min/max as
    ``datetime.isoformat()`` ('T' separator), while SQL convention
    writes ``TIMESTAMP '2021-03-05 14:00:00'`` (space). Raw-payload
    lexical comparison made ``min > probe`` true for same-day values
    (0x20 < 0x54) and pruned files whose rows matched. Literals are
    now canonicalized through fromisoformat/isoformat; unparseable or
    tz-offset payloads degrade to opaque."""
    from collective_als_spark.sources.predicate import prune_files

    stats = {
        "f": {"__rows": 1,
              "ts": ["2021-03-05T13:00:00", "2021-03-05T13:00:00", 0]}
    }
    # space-form upper bound on the same day: must NOT prune
    conj = analyze_predicate("ts <= TIMESTAMP '2021-03-05 14:00:00'")
    _, pruned = prune_files(["f"], stats, lambda f: f, conj)
    assert pruned == []
    # pruning power retained across days
    _, p2 = prune_files(
        ["f"], stats, lambda f: f,
        analyze_predicate("ts <= TIMESTAMP '2021-03-04 23:00:00'"),
    )
    assert p2 == ["f"]
    # short form (no seconds) equality: canonical full form, no prune
    _, p3 = prune_files(
        ["f"], stats, lambda f: f,
        analyze_predicate("ts = TIMESTAMP '2021-03-05 13:00'"),
    )
    assert p3 == []
    # tz-offset / garbage payloads degrade to opaque (stats are naive)
    (tz,) = analyze_predicate("ts = TIMESTAMP '2021-03-05 13:00:00+02:00'")
    assert tz.kind == "opaque"
    (bad,) = analyze_predicate("ts = TIMESTAMP 'not-a-time'")
    assert bad.kind == "opaque"
    # DATE literals validate and stay canonical
    (d,) = analyze_predicate("d BETWEEN DATE '2021-01-01' AND DATE '2021-02-01'")
    assert (d.lo, d.hi) == ("2021-01-01", "2021-02-01")
    (bd,) = analyze_predicate("d = DATE '2021-13-99'")
    assert bd.kind == "opaque"
    # DATE literal against a TIMESTAMP column's stats: SQL coerces the
    # date to midnight, so 'ts <= DATE d' must keep a file whose min
    # is exactly dT00:00:00 (bare 'YYYY-MM-DD' sorts below it). The
    # hi bound is the CONSERVATIVE whole-day envelope ('d~'): a
    # same-day file is kept (a string column casting to DATE would
    # match the whole day), a next-day file still prunes
    ts_stats = {
        "f": {"__rows": 1,
              "ts": ["2021-03-05T00:00:00", "2021-03-05T12:00:00", 0]}
    }
    le_date = analyze_predicate("ts <= DATE '2021-03-05'")
    _, pd1 = prune_files(["f"], ts_stats, lambda f: f, le_date)
    assert pd1 == []
    after = {
        "g": {"__rows": 1,
              "ts": ["2021-03-06T00:00:01", "2021-03-06T12:00:00", 0]}
    }
    _, pd2 = prune_files(["g"], after, lambda f: f, le_date)
    assert pd2 == ["g"]
    # the REVERSE direction (r12 second review): a midnight TIMESTAMP
    # literal against a DATE column's stats must not prune the
    # boundary day (the date coerces to midnight and matches)
    d_ts_stats = {"b": {"__rows": 1, "d": ["2021-03-01", "2021-03-05", 0]}}
    ge_mid = analyze_predicate("d >= TIMESTAMP '2021-03-05 00:00:00'")
    _, pd5 = prune_files(["b"], d_ts_stats, lambda f: f, ge_mid)
    assert pd5 == []
    _, pd6 = prune_files(
        ["b"], d_ts_stats, lambda f: f,
        analyze_predicate("d >= TIMESTAMP '2021-03-06 00:00:00'"),
    )
    assert pd6 == ["b"]
    # ISO-like STRING stats (cast to DATE by Spark) are not over-pruned
    # by the whole-day envelope
    s_stats = {
        "s": {"__rows": 1,
              "v": ["2021-03-05T06:00:00", "2021-03-05T12:00:00", 0]}
    }
    _, pd7 = prune_files(
        ["s"], s_stats, lambda f: f,
        analyze_predicate("v <= DATE '2021-03-05'"),
    )
    assert pd7 == []
    # ...and DATE-vs-DATE-column pruning is unchanged
    d_stats = {"h": {"__rows": 1, "d": ["2021-03-06", "2021-03-07", 0]}}
    _, pd3 = prune_files(
        ["h"], d_stats, lambda f: f,
        analyze_predicate("d <= DATE '2021-03-05'"),
    )
    assert pd3 == ["h"]
    _, pd4 = prune_files(
        ["h"], d_stats, lambda f: f,
        analyze_predicate("d >= DATE '2021-03-06'"),
    )
    assert pd4 == []


def test_temporal_prune_soundness_randomized():
    """Randomized soundness for the temporal-literal comparator (r12):
    random timestamp files vs random DATE/TIMESTAMP literal predicates
    in both SQL spellings (space and 'T' separators; bare dates).
    Ground truth evaluates with SQL's coercion (DATE -> midnight when
    compared to a timestamp). Invariant: a file holding a row where
    the predicate IS TRUE is never pruned."""
    import datetime as dt
    import random

    from collective_als_spark.sources.predicate import prune_files

    rng = random.Random(1212)
    base = dt.datetime(2021, 3, 1)

    def rand_ts():
        return base + dt.timedelta(
            days=rng.randint(0, 6),
            seconds=rng.choice([0, 0, rng.randint(0, 86399)]),
            microseconds=rng.choice([0, 0, 0, rng.randint(0, 999999)]),
        )

    def rand_literal():
        if rng.random() < 0.4:
            d = (base + dt.timedelta(days=rng.randint(0, 6))).date()
            return f"DATE '{d.isoformat()}'", dt.datetime(
                d.year, d.month, d.day
            )
        ts = rand_ts()
        if rng.random() < 0.5:
            text = ts.isoformat(sep=" ")
        else:
            text = ts.isoformat()
        if ts.microsecond == 0 and ts.second == 0 and rng.random() < 0.5:
            text = text[:16]  # short form HH:MM
        return f"TIMESTAMP '{text}'", ts

    ops = ["=", "<", "<=", ">", ">="]
    for _trial in range(600):
        lit_sql, lit_val = rand_literal()
        op = rng.choice(ops)
        neg = rng.random() < 0.3
        # half the trials use a DATE column (stats are bare
        # 'YYYY-MM-DD' strings; values coerce to midnight against a
        # timestamp literal — the r12 second-review direction)
        date_col = rng.random() < 0.5
        sql = f"ts {op} {lit_sql}"
        if neg:
            sql = f"NOT ({sql})"

        def ev(v):
            import operator as O

            fn = {"=": O.eq, "<": O.lt, "<=": O.le,
                  ">": O.gt, ">=": O.ge}[op]
            r = fn(v, lit_val)
            return (not r) if neg else r

        files = []
        for fi in range(4):
            if date_col:
                vals = [
                    dt.datetime.combine(rand_ts().date(), dt.time())
                    for _ in range(rng.randint(1, 6))
                ]
            else:
                vals = [rand_ts() for _ in range(rng.randint(1, 6))]
            files.append((f"f{fi}", vals))
        stats = {
            name: {
                "__rows": len(vals),
                "ts": [
                    min(vals).date().isoformat()
                    if date_col
                    else min(vals).isoformat(),
                    max(vals).date().isoformat()
                    if date_col
                    else max(vals).isoformat(),
                    0,
                ],
            }
            for name, vals in files
        }
        conj = analyze_predicate(sql)
        _, pruned = prune_files(
            [n for n, _ in files], stats, lambda f: f, conj
        )
        by_name = dict(files)
        for name in pruned:
            matches = [v for v in by_name[name] if ev(v)]
            assert not matches, (
                f"UNSOUND temporal prune: {sql!r} pruned {name} holding "
                f"{matches} (stats {stats[name]})"
            )


def test_lossy_negation_soundness_randomized():
    """Focused generator for the r11-ADVICE-high shape: ``NOT (<AND
    mixing provable + opaque leaves> OR <branch> ...)``. The general
    tree generator hits this composition too rarely to be a reliable
    revert detector, so this one emits it every trial. Ground truth is
    the same 3VL evaluation; invariant: a file holding a row where the
    predicate IS TRUE is never pruned."""
    import random

    from collective_als_spark.sources.predicate import prune_files

    rng = random.Random(1202)
    cols = ["a", "b", "c"]

    def leaf():
        col = rng.choice(cols)
        if rng.random() < 0.35:  # opaque leaf: col + col = k
            k = rng.randint(-20, 20)
            return (f"{col} + {col} = {k}",
                    lambda r, c=col, k=k: None if r[c] is None
                    else r[c] + r[c] == k)
        k = rng.randint(-10, 10)
        op = rng.choice(["=", ">", "<", ">=", "<="])
        import operator as _op
        fn = {"=": _op.eq, ">": _op.gt, "<": _op.lt,
              ">=": _op.ge, "<=": _op.le}[op]
        return (f"{col} {op} {k}",
                lambda r, c=col, k=k, fn=fn: None if r[c] is None
                else fn(r[c], k))

    def branch():
        leaves = [leaf() for _ in range(rng.randint(1, 3))]
        sql = " AND ".join(s for s, _ in leaves)
        def ev(row, leaves=leaves):
            vals = [f(row) for _, f in leaves]
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        return sql, ev

    for _trial in range(300):
        branches = [branch() for _ in range(rng.randint(2, 3))]
        inner_sql = " OR ".join(s for s, _ in branches)
        sql = f"NOT ({inner_sql})"

        def ev_pred(row):
            vals = [f(row) for _, f in branches]
            if any(v is True for v in vals):
                return False  # NOT TRUE
            return None if any(v is None for v in vals) else True

        files = []
        for fi in range(4):
            rows = [
                {c: (None if rng.random() < 0.1 else rng.randint(-10, 10))
                 for c in cols}
                for _ in range(rng.randint(1, 6))
            ]
            files.append((f"f{fi}", rows))
        stats = {}
        for name, rows in files:
            ent = {"__rows": len(rows)}
            for c in cols:
                vals = [r[c] for r in rows if r[c] is not None]
                nulls = sum(1 for r in rows if r[c] is None)
                ent[c] = [min(vals) if vals else None,
                          max(vals) if vals else None, nulls]
            stats[name] = ent
        conjuncts = analyze_predicate(sql)
        _, pruned = prune_files(
            [n for n, _ in files], stats, lambda f: f, conjuncts
        )
        by_name = dict(files)
        for name in pruned:
            matches = [r for r in by_name[name] if ev_pred(r) is True]
            assert not matches, (
                f"UNSOUND prune: {sql!r} pruned {name} holding "
                f"{matches} (stats {stats[name]})"
            )


def test_lossy_or_negation_degrades_to_opaque():
    """r11-ADVICE high: an OR whose branch dropped an opaque conjunct
    over-approximates its predicate; negating it as if exact prunes
    files whose rows DO satisfy the NOT — e.g. NOT (a = 1 AND f(b) OR
    c = 2) must not prune on a<>1 AND c<>2 (rows with a=1, f(b) FALSE,
    c<>2 satisfy the predicate). Lossy ORs must refuse negation."""
    from collective_als_spark.sources.predicate import prune_files

    # the exact ADVICE repro shape: a+a=99 stands in for opaque f(b)
    conj = analyze_predicate("NOT (a = 1 AND a + a = 99 OR c = 2)")
    assert [c.kind for c in conj] == ["opaque"]
    stats = {"f": {"__rows": 1, "a": [1, 1, 0], "c": [5, 5, 0]}}
    kept, pruned = prune_files(["f"], stats, lambda f: f, conj)
    assert pruned == [] and kept == ["f"]
    # the positive (un-negated) lossy OR still prunes soundly
    pos = analyze_predicate("a = 1 AND a + a = 99 OR c = 2")
    (d,) = pos
    assert d.kind == "or" and d.lossy
    _, p2 = prune_files(
        ["g"], {"g": {"__rows": 1, "a": [9, 9, 0], "c": [7, 7, 0]}},
        lambda f: f, pos,
    )
    assert p2 == ["g"]
    # an exact OR (no dropped conjuncts) still negates
    exact = analyze_predicate("NOT (a = 1 OR c = 2)")
    assert all(c.kind == "or" for c in exact) and len(exact) == 2
    # lossiness propagates through nesting: a lossy OR inside a
    # branch of an outer OR makes the outer OR lossy too
    (outer,) = analyze_predicate(
        "(a = 1 AND (b = 2 AND b + b = 99 OR c = 3)) OR d = 4"
    )
    assert outer.kind == "or" and outer.lossy
    neg = analyze_predicate(
        "NOT ((a = 1 AND (b = 2 AND b + b = 99 OR c = 3)) OR d = 4)"
    )
    assert [c.kind for c in neg] == ["opaque"]


def test_like_prefix_max_codepoint_band_is_lossy():
    """r11-ADVICE low: 'LIKE p%' with the prefix ending at U+10FFFF
    can't increment — the one-sided band [p, +inf) over-approximates
    (strings >= p need not start with p). Positive prove-out stays;
    negation (SQL NOT LIKE or pushed Not(StringStartsWith)) must
    degrade instead of pruning rows that satisfy the predicate."""
    from pyspark.sql.datasource import Not, StringStartsWith

    from collective_als_spark.sources.predicate import (
        conjuncts_from_push_filters,
        prune_files,
    )

    pat = "a\U0010FFFF%"
    (band,) = analyze_predicate(f"s LIKE '{pat}'")
    assert band.kind == "band" and band.lossy and band.hi is None
    # positive: a file whose max < prefix is provably out
    _, pruned = prune_files(
        ["h"], {"h": {"__rows": 1, "s": ["A", "Z", 0]}},
        lambda f: f, [band],
    )
    assert pruned == ["h"]
    # negation degrades: file holding only 'b' (satisfies NOT LIKE)
    (negc,) = analyze_predicate(f"s NOT LIKE '{pat}'")
    assert negc.kind == "opaque"
    # same through the DSv2 push-filter path
    pushed = conjuncts_from_push_filters(
        [Not(StringStartsWith(("s",), pat[:-1]))]
    )
    assert pushed == []  # skipped entirely: Spark re-applies the filter


def test_analyze_not_negation_shapes():
    """Leading NOT over provable structure prunes via complement
    intervals (De Morgan, 3VL-exact); unprovable negations degrade."""
    (d,) = analyze_predicate("NOT x BETWEEN 5 AND 10")
    assert d.kind == "or" and len(d.branches) == 2
    lo_b, hi_b = d.branches[0][0], d.branches[1][0]
    assert (lo_b.hi, lo_b.hi_strict) == (5, True)
    assert (hi_b.lo, hi_b.lo_strict) == (10, True)
    # strictness flips: NOT(x > 5) == x <= 5
    (e,) = analyze_predicate("NOT (x > 5)")
    assert (e.kind, e.hi, e.hi_strict) == ("band", 5, False)
    (e2,) = analyze_predicate("NOT (x >= 5)")
    assert (e2.kind, e2.hi, e2.hi_strict) == ("band", 5, True)
    # IS NULL flips
    (n,) = analyze_predicate("NOT (a IS NULL)")
    assert (n.kind, n.want_null) == ("null", False)
    # De Morgan over AND: NOT(a=1 AND b=2) == (a!=1) OR (b!=2)
    (m,) = analyze_predicate("NOT (a = 1 AND b = 2)")
    assert m.kind == "or" and len(m.branches) == 2
    # De Morgan over OR: NOT(a=1 OR b=2) == two AND-conjuncts
    conj = analyze_predicate("NOT (a = 1 OR b = 2)")
    assert len(conj) == 2 and all(c.kind == "or" for c in conj)
    # infix exclusions are the same complements: <> / != / NOT BETWEEN
    for sql in ("x <> 3", "x != 3", "3 <> x"):
        (x,) = analyze_predicate(sql)
        assert x.kind == "or" and len(x.branches) == 2, sql
        assert (x.branches[0][0].hi, x.branches[0][0].hi_strict) == (3, True)
        assert (x.branches[1][0].lo, x.branches[1][0].lo_strict) == (3, True)
    (nb,) = analyze_predicate("x NOT BETWEEN 5 AND 10")
    assert nb.kind == "or"
    assert (nb.branches[0][0].hi, nb.branches[1][0].lo) == (5, 10)
    # single-value NOT IN proves; multi-value stays opaque
    (ni,) = analyze_predicate("x NOT IN (7)")
    assert ni.kind == "or" and len(ni.branches) == 2


def test_read_where_not_predicate_prunes_and_matches(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["v"])
    _banded(spark, t)
    # NOT BETWEEN covering the middle band: that band's file is
    # provably out; results equal the full-scan filter exactly
    got = t.read(where="NOT v BETWEEN 1000 AND 1099")
    full = t.read().filter(~F.col("v").between(1000, 1099))
    assert len(got.inputFiles()) == 2
    assert sorted(r["v"] for r in got.collect()) == sorted(
        r["v"] for r in full.collect()
    )
    # NOT over a one-sided comparison prunes the upper bands
    got2 = t.read(where="NOT (v >= 1000)")
    assert len(got2.inputFiles()) == 1
    assert got2.count() == 100
    # delete with a NOT predicate: exact complement survives
    t.delete_where("NOT (v < 2000)")
    assert t.read().count() == 200
    assert t.read().filter(F.col("v") >= 2000).count() == 0


def test_analyze_like_prefix_band():
    """``LIKE 'abc%'`` prunes as the half-open interval
    ['abc', 'abd'); non-prefix patterns stay opaque; NOT LIKE takes
    the complement."""
    (b,) = analyze_predicate("x LIKE 'abc%'")
    assert (b.kind, b.lo, b.hi, b.hi_strict) == ("band", "abc", "abd", True)
    for sql in ("x LIKE 'a%b'", "x LIKE '%abc'", "x LIKE 'a_c%'",
                "x LIKE '%'", "x LIKE 'a\\\\%c%'"):
        assert analyze_predicate(sql) == [OPAQUE], sql
    (n,) = analyze_predicate("x NOT LIKE 'abc%'")
    assert n.kind == "or"
    assert (n.branches[0][0].hi, n.branches[0][0].hi_strict) == ("abc", True)
    assert (n.branches[1][0].lo, n.branches[1][0].lo_strict) == ("abd", False)
    # escaped quote inside the prefix
    (q,) = analyze_predicate("s LIKE 'ab''c%'")
    assert (q.lo, q.hi) == ("ab'c", "ab'd")


def test_read_where_like_prefix_prunes_and_matches(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["s"])
    for prefix in ("apple", "mango", "zebra"):
        t.append(
            spark.createDataFrame(
                [(f"{prefix}{i:02d}",) for i in range(50)], "s string"
            ).coalesce(1)
        )
    got = t.read(where="s LIKE 'mango%'")
    assert len(got.inputFiles()) == 1
    assert got.count() == 50
    full = t.read().filter(F.col("s").like("mango%"))
    assert sorted(r["s"] for r in got.collect()) == sorted(
        r["s"] for r in full.collect()
    )
    # NOT LIKE complement prunes the matching band's file... it can't
    # (the file holds only mango rows, complement proves it out)
    got2 = t.read(where="s NOT LIKE 'mango%'")
    assert len(got2.inputFiles()) == 2
    assert got2.count() == 100
    # delete through a LIKE predicate: exact complement survives
    t.delete_where("s LIKE 'apple%'")
    assert t.read().count() == 100
    assert t.read().filter(F.col("s").like("apple%")).count() == 0


def test_like_prefix_prune_soundness_randomized():
    """Seeded random string files vs random prefix LIKE / NOT LIKE
    predicates: a file holding a matching row is never pruned."""
    import random

    from collective_als_spark.sources.predicate import prune_files

    rng = random.Random(1109)
    alphabet = "abcz"  # narrow alphabet makes boundary hits common

    def rand_s():
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 4))
        )

    for _trial in range(400):
        files = []
        for fi in range(4):
            rows = [
                (None if rng.random() < 0.1 else rand_s())
                for _ in range(rng.randint(1, 6))
            ]
            files.append((f"f{fi}", rows))
        stats = {}
        for name, rows in files:
            vals = [v for v in rows if v is not None]
            stats[name] = {
                "__rows": len(rows),
                "s": [min(vals) if vals else None,
                      max(vals) if vals else None,
                      sum(1 for v in rows if v is None)],
            }
        prefix = rand_s() or "a"
        neg = rng.random() < 0.5
        sql = (
            f"s NOT LIKE '{prefix}%'" if neg else f"s LIKE '{prefix}%'"
        )
        conjuncts = analyze_predicate(sql)
        kept, pruned = prune_files(
            [n for n, _ in files], stats, lambda f: f, conjuncts
        )
        by_name = dict(files)
        for name in pruned:
            matches = [
                v for v in by_name[name]
                if v is not None and (
                    (not v.startswith(prefix)) if neg
                    else v.startswith(prefix)
                )
            ]
            assert not matches, (
                f"UNSOUND prune: {sql!r} pruned {name} holding {matches} "
                f"(stats {stats[name]})"
            )


def test_in_subquery_prunes_when_bounded(spark, tmp_path):
    """r12 verdict #7: an uncorrelated ``col IN (SELECT ...)`` whose
    result passes the broadcast byte gate materializes into an in-set
    pruning conjunct — only the files that can hold those keys are
    opened for the rewrite; past the gate the predicate stays opaque
    (full-candidate scan, identical results)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    for lo in (0, 1000, 2000):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
    spark.createDataFrame(
        [(1001,), (1003,)], "sel long"
    ).createOrReplaceTempView("pdml_subq_small")
    before = set(t._manifest(t.current_version())["files"])
    t.delete_where("k IN (SELECT sel FROM pdml_subq_small)")
    after = set(t._manifest(t.current_version())["files"])
    # only the 1000-band file was a candidate: the other two carried
    # over by path (bounded subquery -> in-set conjunct -> pruned)
    assert len(before & after) == 2
    assert t.read().count() == 28
    assert sorted(
        r["k"] for r in t.read(where=("k", 1000, 1010)).collect()
    ) == [1000, 1002, 1004, 1005, 1006, 1007, 1008, 1009]
    # past the gate (tiny key budget): opaque -> every file is a
    # candidate, results identical
    g = SnapshotTable(
        spark, str(tmp_path / "g"), stats_columns=["k"],
        merge_broadcast_max_keys=1,
    )
    for lo in (0, 1000):
        g.append(
            spark.range(lo, lo + 5)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
    spark.createDataFrame(
        [(1001,), (1002,)], "sel long"
    ).createOrReplaceTempView("pdml_subq_big")
    gb = set(g._manifest(g.current_version())["files"])
    g.delete_where("k IN (SELECT sel FROM pdml_subq_big)")
    ga = set(g._manifest(g.current_version())["files"])
    assert len(gb & ga) == 0  # opaque: both files rewritten
    assert sorted(r["k"] for r in g.read().collect()) == [
        0, 1, 2, 3, 4, 1000, 1003, 1004,
    ]
    # under OR the subquery must NOT become a conjunct (unsound):
    # full-candidate scan, exact result
    h = SnapshotTable(spark, str(tmp_path / "h"), stats_columns=["k"])
    for lo in (0, 1000):
        h.append(
            spark.range(lo, lo + 5)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1)
        )
    h.delete_where("k IN (SELECT sel FROM pdml_subq_big) OR k = 0")
    assert sorted(r["k"] for r in h.read().collect()) == [
        1, 2, 3, 4, 1000, 1003, 1004,
    ]
