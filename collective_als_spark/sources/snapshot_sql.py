"""SQL DML statements over snapshot tables — ``snapshot_sql(spark,
"DELETE FROM '<root>' WHERE ...")`` — the statement-level surface
Delta exposes as ``spark.sql("DELETE FROM delta.`/path` ...")``.

This is a thin DISPATCHER, not an engine: it parses the statement's
verb and clause boundaries (quote- and paren-aware, driver-side, on a
bounded string), then delegates every clause VERBATIM to the existing
``SnapshotTable`` verbs — ``delete_where`` / ``update_where`` /
``merge`` / ``apply_changes`` / ``append`` — which already own
predicate analysis (``sources/predicate.py``), data-skipping proofs,
exact residual application, SQL three-valued NULL discipline, CDF
imaging, and the commit protocol. Nothing here re-implements
semantics; a statement shape the verbs can't express raises
``NotImplementedError`` with guidance instead of guessing.

Supported statements (case-insensitive keywords):

- ``DELETE FROM <tbl> [WHERE <pred>]`` — no WHERE deletes every row.
- ``UPDATE <tbl> SET col = expr[, ...] [WHERE <pred>]``
- ``MERGE INTO <tbl> [AS] [t] USING <source> [AS] [s] ON <equi-cond>
  WHEN ...`` — the classic upsert (``UPDATE SET * / INSERT *``,
  engine ``merge``), ``WHEN MATCHED THEN DELETE`` alone (keyed delete
  via ``apply_changes``), insert-only (pruned ``merge_insert_only``),
  and the FULL conditional clause matrix (``WHEN MATCHED [AND <cond>]
  THEN UPDATE SET col = expr, ... | UPDATE SET * | DELETE``, ``WHEN
  NOT MATCHED [AND <cond>] THEN INSERT * | INSERT (c, ..) VALUES
  (e, ..)``, ``WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE |
  UPDATE SET ..``, first-match-wins) via engine ``merge_when``.
- ``INSERT INTO <tbl> <query>`` — ``append(spark.sql(query))``;
  ``INSERT OVERWRITE <tbl> <query>`` — ``overwrite(...)``;
  ``CREATE TABLE <tbl> [(col TYPE ..., ...)] [PARTITIONED BY (col |
  bucket(n, col) | days(col) | months(col) | truncate(col, n))]
  [AS <query>]`` — first commit on a fresh root; the declared layout
  places every later append-family write.
- ``CREATE TABLE '<dst>' SHALLOW|DEEP CLONE '<src>' [VERSION AS OF n
  | TIMESTAMP AS OF <ts>]`` — ``clone_to`` (shallow: one metadata
  commit referencing the source snapshot's files; deep: materialized
  copy), with the RESTORE temporal comparator for the pin.
- ``CREATE TABLE '<dst>' LIKE '<src>'`` — the source's schema and
  governance (checks, generated/identity/defaults/comments, layout,
  properties) on a fresh EMPTY table; identity counters restart.
- ``VACUUM <tbl> [RETAIN <n> HOURS] [DRY RUN]`` — ``expire`` with
  time-based retention (default 168 hours, Delta's).
- ``OPTIMIZE <tbl> TARGET <n> ROWS [FULL] [WHERE <pred>] [CLUSTER BY
  (a, b) | ZORDER BY (a, b)]`` — ``compact_partial`` (bin-pack
  small/DV files; ``WHERE`` scopes the selection to files the
  predicate cannot prove out, metadata-only), full ``compact``, or
  the Morton-interleaved 2-D relayout.
- ``RESTORE <tbl> TO VERSION AS OF <n>`` / ``TO TIMESTAMP AS OF
  <epoch>`` (newest commit at or before the instant, Delta's rule)
- ``ALTER TABLE <tbl> RENAME COLUMN a TO b / DROP COLUMN a /
  ADD CONSTRAINT n CHECK (expr) / DROP CONSTRAINT n``
- ``DESCRIBE HISTORY <tbl>`` / ``DESCRIBE DETAIL <tbl>`` — return
  the ``history()`` / ``detail()`` DataFrames.
- ``APPLY CHANGES INTO <tbl> FROM <source> KEYS (k[, ...]) [APPLY AS
  DELETE WHEN <expr>] [SEQUENCE BY <col>] [STORED AS SCD TYPE {1|2}]
  [TRACK SEQUENCE]`` — DLT's CDC statement over ``apply_changes``
  (the op column is synthesized from the delete condition).
- ``SELECT / WITH ...`` — quoted table-root refs after FROM/JOIN
  (optionally ``VERSION AS OF n`` / ``TIMESTAMP AS OF epoch``) are
  swapped for temp views over the batch ``snapshot`` DataSource and
  the rewritten text runs through ``spark.sql`` (joins, CTEs,
  subqueries, filter pushdown, DV masking all ride along).

``<tbl>`` is the table ROOT path as a ``'...'`` / ``"..."`` string or
backtick-quoted identifier. ``<source>`` is a registered view/table
name or a parenthesized query. The MERGE condition must be an
equality conjunction on SAME-NAMED columns (``t.k = s.k AND ...``) —
the key-tuple shape the engine merge is defined over.

Reference parity: Delta Lake's SQL DML over path tables
(``DELETE FROM delta.`/p```, ``MERGE INTO delta.`/p`` ...``).
"""

from __future__ import annotations

import re

from .layout import SnapshotTable

_VERB_RE = re.compile(
    r"^\s*(DELETE\s+FROM|UPDATE|MERGE\s+INTO|INSERT\s+INTO"
    r"|INSERT\s+OVERWRITE|CREATE\s+OR\s+REPLACE\s+TABLE"
    r"|CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS|CREATE\s+TABLE|VACUUM"
    r"|OPTIMIZE|RESTORE|ALTER\s+TABLE|DESCRIBE\s+HISTORY"
    r"|DESCRIBE\s+DETAIL|DESCRIBE\s+TABLE|APPLY\s+CHANGES\s+INTO"
    r"|COMMENT\s+ON\s+TABLE|SHOW\s+TBLPROPERTIES)\s+",
    re.IGNORECASE,
)


def _scan_clauses(s: str, words: set[str]) -> list[tuple[str, int, int]]:
    """Positions of top-level keywords (outside quotes/backticks/
    parens): [(WORD_UPPER, start, end)]."""
    out = []
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'" or c == '"':
            q = c
            i += 1
            while i < n:
                if s[i] == q:
                    if i + 1 < n and s[i + 1] == q:
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            continue
        if c == "`":
            j = s.find("`", i + 1)
            i = n if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0 and (c.isalpha() or c == "_"):
            j = i
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            w = s[i:j].upper()
            if w in words:
                out.append((w, i, j))
            i = j
            continue
        i += 1
    return out


def _split_top_commas(s: str) -> list[str]:
    """Split on commas outside quotes/backticks/parens."""
    parts = []
    cur = []
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'" or c == '"':
            q = c
            j = i + 1
            while j < n:
                if s[j] == q:
                    if j + 1 < n and s[j + 1] == q:
                        j += 2
                        continue
                    break
                j += 1
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "`":
            j = s.find("`", i + 1)
            j = n - 1 if j < 0 else j
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def _parse_table_ref(
    s: str, allow_alias: bool = True
) -> tuple[str, str | None, str]:
    """Leading table ref -> (root_path, alias_or_None, rest). The ref
    is a quoted/backticked ROOT PATH, optionally ``[AS] alias``."""
    s = s.lstrip()
    if not s:
        raise ValueError("snapshot_sql: missing table reference")
    q = s[0]
    if q in ("'", '"', "`"):
        end = s.find(q, 1)
        if end < 0:
            raise ValueError(f"snapshot_sql: unterminated {q} in table ref")
        root = s[1:end]
        rest = s[end + 1 :]
    else:
        raise ValueError(
            "snapshot_sql: the table must be the snapshot ROOT PATH as a "
            "quoted string or backtick identifier, e.g. DELETE FROM "
            "'/data/events' WHERE ... (registered catalog names are not "
            "resolved here)"
        )
    if not allow_alias:
        return root, None, rest
    m = re.match(r"\s+(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)", rest, re.IGNORECASE)
    alias = None
    if m and m.group(1).upper() not in (
        "SET", "WHERE", "USING", "ON", "WHEN", "SELECT", "VALUES",
    ):
        alias = m.group(1)
        rest = rest[m.end() :]
    return root, alias, rest


def _rewrite_alias_prefix(expr: str, mapping: dict[str, str]) -> str:
    """Rewrite ``alias.`` qualifiers per ``mapping`` (upper-cased alias
    -> replacement alias, ``""`` = drop the qualifier entirely).

    QUOTE-AWARE (r11-ADVICE): the replacement walks the text and skips
    ``'...'`` / ``"..."`` / backtick regions entirely — a regex sub
    would also rewrite matching text INSIDE string literals (``SET
    note = 't. x'`` must keep its literal)."""
    if not mapping:
        return expr
    out = []
    i = 0
    n = len(expr)
    while i < n:
        c = expr[i]
        if c in ("'", '"'):
            q = c
            j = i + 1
            while j < n:
                if expr[j] == q:
                    if j + 1 < n and expr[j + 1] == q:
                        j += 2
                        continue
                    break
                j += 1
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        if c == "`":
            j = expr.find("`", i + 1)
            j = n - 1 if j < 0 else j
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (expr[j].isalnum() or expr[j] == "_"):
                j += 1
            word = expr[i:j]
            # 'alias . ' -> replacement (or dropped with its dot)
            k = j
            while k < n and expr[k].isspace():
                k += 1
            if word.upper() in mapping and k < n and expr[k] == ".":
                k += 1
                while k < n and expr[k].isspace():
                    k += 1
                repl = mapping[word.upper()]
                if repl:
                    out.append(repl + ".")
                i = k
                continue
            out.append(word)
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _strip_alias_prefix(expr: str, aliases: list[str | None]) -> str:
    """Remove ``alias.`` qualifiers for the statement's own aliases so
    clause text delegates cleanly to single-relation verbs."""
    return _rewrite_alias_prefix(expr, {a.upper(): "" for a in aliases if a})


def snapshot_sql(spark, statement: str, **table_kwargs):
    """Execute one SQL DML statement against a snapshot table root.
    Returns the committed version (int). ``table_kwargs`` pass through
    to the ``SnapshotTable`` constructor (``stats_columns`` etc.)."""
    m = _VERB_RE.match(statement)
    if not m:
        head = statement.strip().split(None, 1)[:1]
        if head and head[0].upper() in ("SELECT", "WITH"):
            return _select(spark, statement)
        raise ValueError(
            f"snapshot_sql: unrecognized statement (expected SELECT / "
            f"DELETE FROM / UPDATE / MERGE INTO / INSERT INTO / VACUUM / "
            f"OPTIMIZE / RESTORE / ALTER TABLE / DESCRIBE): "
            f"{statement[:80]!r}"
        )
    verb = re.sub(r"\s+", " ", m.group(1).upper())
    rest = statement[m.end() :]
    if verb == "DELETE FROM":
        return _delete(spark, rest, table_kwargs)
    if verb == "UPDATE":
        return _update(spark, rest, table_kwargs)
    if verb == "MERGE INTO":
        return _merge(spark, rest, table_kwargs)
    if verb == "INSERT INTO":
        return _insert(spark, rest, table_kwargs)
    if verb == "INSERT OVERWRITE":
        return _insert(spark, rest, table_kwargs, overwrite=True)
    if verb == "CREATE TABLE":
        return _create(spark, rest, table_kwargs)
    if verb == "CREATE OR REPLACE TABLE":
        return _create(spark, rest, table_kwargs, replace=True)
    if verb == "CREATE TABLE IF NOT EXISTS":
        return _create(spark, rest, table_kwargs, if_not_exists=True)
    if verb == "VACUUM":
        return _vacuum(spark, rest, table_kwargs)
    if verb == "OPTIMIZE":
        return _optimize(spark, rest, table_kwargs)
    if verb == "RESTORE":
        return _restore(spark, rest, table_kwargs)
    if verb == "ALTER TABLE":
        return _alter(spark, rest, table_kwargs)
    if verb == "APPLY CHANGES INTO":
        return _apply_changes_stmt(spark, rest, table_kwargs)
    if verb == "COMMENT ON TABLE":
        return _comment_on_table(spark, rest, table_kwargs)
    root, _a, tail = _parse_table_ref(rest, allow_alias=False)
    if tail.strip():
        raise ValueError(f"snapshot_sql: trailing text {tail.strip()!r}")
    t = SnapshotTable(spark, root, **table_kwargs)
    if verb == "DESCRIBE HISTORY":
        return t.history()
    if verb == "DESCRIBE TABLE":
        return t.describe_table()
    if verb == "SHOW TBLPROPERTIES":
        return t.show_tblproperties()
    return t.detail()


def _delete(spark, rest: str, kw) -> int:
    root, alias, tail = _parse_table_ref(rest)
    t = SnapshotTable(spark, root, **kw)
    clauses = _scan_clauses(tail, {"WHERE"})
    if not clauses:
        if tail.strip():
            raise ValueError(f"snapshot_sql: trailing text {tail.strip()!r}")
        return t.delete_where("TRUE")
    w, start, end = clauses[0]
    pred = tail[end:].strip()
    if tail[:start].strip() or not pred:
        raise ValueError("snapshot_sql: malformed DELETE WHERE clause")
    return t.delete_where(_strip_alias_prefix(pred, [alias]))


def _update(spark, rest: str, kw) -> int:
    root, alias, tail = _parse_table_ref(rest)
    t = SnapshotTable(spark, root, **kw)
    clauses = _scan_clauses(tail, {"SET", "WHERE"})
    if not clauses or clauses[0][0] != "SET":
        raise ValueError("snapshot_sql: UPDATE needs a SET clause")
    set_start = clauses[0][2]
    where_pos = [(s, e) for w, s, e in clauses if w == "WHERE"]
    if where_pos:
        set_text = tail[set_start : where_pos[0][0]]
        pred = tail[where_pos[0][1] :].strip()
    else:
        set_text = tail[set_start:]
        pred = "TRUE"
    assignments = {}
    for part in _split_top_commas(set_text):
        if not part.strip():
            continue
        eq = _scan_eq(part)
        if eq < 0:
            raise ValueError(
                f"snapshot_sql: malformed SET assignment {part.strip()!r}"
            )
        col = _strip_alias_prefix(part[:eq].strip(), [alias]).strip("`")
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col):
            raise ValueError(f"snapshot_sql: bad SET target {col!r}")
        assignments[col] = _strip_alias_prefix(part[eq + 1 :].strip(), [alias])
    if not assignments:
        raise ValueError("snapshot_sql: empty SET clause")
    assignments = _resolve_default_keyword(t, assignments)
    return t.update_where(
        predicate=_strip_alias_prefix(pred, [alias]), set=assignments
    )


def _resolve_default_keyword(t, assigns: dict) -> dict:
    """``SET c = DEFAULT`` / ``VALUES (..., DEFAULT, ...)`` (r14):
    the bare DEFAULT keyword resolves to the column's stored DEFAULT
    expression, or the SQL-standard NULL when none is declared —
    Delta's explicit-DEFAULT surface for UPDATE/MERGE."""
    if not any(
        v is not None and v.strip().upper() == "DEFAULT"
        for v in assigns.values()
    ):
        return assigns
    defaults = t._table_defaults()
    return {
        c: (
            defaults.get(c, "NULL")
            if v is not None and v.strip().upper() == "DEFAULT"
            else v
        )
        for c, v in assigns.items()
    }


def _scan_eq(s: str) -> int:
    """Index of the FIRST top-level ``=`` (outside quotes/parens)."""
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in ("'", '"'):
            q = c
            i += 1
            while i < n and s[i] != q:
                i += 1
            i += 1
            continue
        if c == "`":
            j = s.find("`", i + 1)
            i = n if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "=" and depth == 0:
            return i
        i += 1
    return -1


def _matching_paren(s: str) -> int:
    """Index of the ``)`` matching ``s[0] == '('`` (quote-aware)."""
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in ("'", '"'):
            q = c
            i += 1
            while i < n:
                if s[i] == q:
                    if i + 1 < n and s[i + 1] == q:
                        i += 2
                        continue
                    break
                i += 1
        elif c == "`":
            j = s.find("`", i + 1)
            i = n if j < 0 else j
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _resolve_source(spark, text: str):
    """MERGE USING source -> (DataFrame, alias_or_None). The source is
    a parenthesized query or a registered view/table name, each with
    an optional ``[AS] alias``."""
    text = text.strip()
    alias = None
    if text.startswith("("):
        close = _matching_paren(text)
        if close < 0:
            raise ValueError(f"snapshot_sql: malformed USING source {text!r}")
        body = text[1:close]
        trail = text[close + 1 :].strip()
        if trail:
            am = re.fullmatch(
                r"(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)", trail, re.IGNORECASE
            )
            if not am:
                raise ValueError(
                    f"snapshot_sql: trailing text after USING source: "
                    f"{trail!r}"
                )
            alias = am.group(1)
        return spark.sql(body), alias
    parts = text.split()
    if not parts or not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", parts[0]):
        raise ValueError(
            f"snapshot_sql: USING source must be a view/table name or a "
            f"parenthesized query, got {text!r}"
        )
    if len(parts) == 2:
        alias = parts[1]
    elif len(parts) == 3 and parts[1].upper() == "AS":
        alias = parts[2]
    elif len(parts) > 1:
        raise ValueError(f"snapshot_sql: malformed USING source {text!r}")
    return spark.table(parts[0]), alias


def _merge(spark, rest: str, kw) -> int:
    import pyspark.sql.functions as F

    root, t_alias, tail = _parse_table_ref(rest)
    clauses = _scan_clauses(tail, {"USING", "ON", "WHEN"})
    by_word = {}
    for w, s, e in clauses:
        by_word.setdefault(w, []).append((s, e))
    if "USING" not in by_word or "ON" not in by_word or "WHEN" not in by_word:
        raise ValueError(
            "snapshot_sql: MERGE needs USING <source> ON <cond> WHEN ..."
        )
    _u_s, u_e = by_word["USING"][0]
    on_s, on_e = by_word["ON"][0]
    first_when = by_word["WHEN"][0][0]
    source, s_alias = _resolve_source(spark, tail[u_e:on_s].strip())
    cond = tail[on_e:first_when].strip()
    while cond.startswith("(") and _matching_paren(cond) == len(cond) - 1:
        cond = cond[1:-1].strip()
    keys, renames, residual = _parse_merge_on(cond, t_alias, s_alias)
    actions = tail[first_when:]
    if renames:
        # differently-named equi keys (ON t.id = s.customer_id): the
        # engine merge keys on same-named columns, so the SOURCE
        # column is renamed to the target name and every source-
        # qualified reference in the clause text (and the residual)
        # follows the rename (r12 verdict #1)
        if not s_alias:
            raise NotImplementedError(
                "snapshot_sql: differently-named MERGE keys need a "
                "source alias (USING src AS s ... ON t.id = "
                "s.customer_id) so clause text can be rewritten"
            )
        for sc, tc in renames.items():
            if sc not in source.columns:
                raise ValueError(
                    f"snapshot_sql: MERGE ON references source column "
                    f"{sc!r}, not in the USING source"
                )
            if tc in source.columns:
                raise NotImplementedError(
                    f"snapshot_sql: MERGE key rename {sc!r} -> {tc!r} "
                    f"collides with an existing source column {tc!r} "
                    f"— project it away or alias it in the USING query"
                )
        for sc, tc in renames.items():
            source = source.withColumnRenamed(sc, tc)
        actions = _rename_qualified(actions, {s_alias.upper()}, renames)
        if residual:
            residual = _rename_qualified(
                residual, {s_alias.upper()}, renames
            )
    if residual:
        # requalify the residual to the engine's canonical t/s aliases
        amap = {}
        if t_alias:
            amap[t_alias.upper()] = "t"
        if s_alias:
            amap[s_alias.upper()] = "s"
        residual = _rewrite_alias_prefix(residual, amap)
    norm = re.sub(r"\s+", " ", actions).strip().upper()
    t = SnapshotTable(spark, root, **kw)
    if residual is None:
        # residual-free fast paths (a residual changes MATCH status
        # row-granularly, which only merge_when models)
        if norm in (
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
            "WHEN NOT MATCHED THEN INSERT * WHEN MATCHED THEN UPDATE SET *",
        ):
            return t.merge(source, keys)
        if norm == "WHEN NOT MATCHED THEN INSERT *":
            # insert-only: matched-key detection over only the
            # planner's stats/bloom/bucket-pruned candidate files
            # (r11-verdict #2)
            return t.merge_insert_only(source, keys)
        if norm == "WHEN MATCHED THEN DELETE":
            changes = source.select(*keys).distinct().withColumn(
                "_op", F.lit("D")
            )
            return t.apply_changes(
                changes, keys if len(keys) > 1 else keys[0]
            )
    # general conditional / column-level clause list -> merge_when
    matched_c, not_matched_c, by_source_c = _parse_when_clauses(
        actions, t_alias, s_alias
    )
    # the explicit DEFAULT keyword in SET / INSERT VALUES (r14)
    matched_c = [
        (c, a, _resolve_default_keyword(t, s) if s else s)
        for c, a, s in matched_c
    ]
    not_matched_c = [
        (c, _resolve_default_keyword(t, s) if s else s)
        for c, s in not_matched_c
    ]
    by_source_c = [
        (c, a, _resolve_default_keyword(t, s) if s else s)
        for c, a, s in by_source_c
    ]
    return t.merge_when(
        source,
        keys,
        matched=matched_c,
        not_matched=not_matched_c,
        not_matched_by_source=by_source_c,
        on_residual=residual,
    )


def _parse_when_clauses(
    actions: str, t_alias: str | None, s_alias: str | None
) -> tuple[list[tuple], list[tuple], list[tuple]]:
    """The full Delta clause matrix -> ``merge_when`` arguments:

    ``WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr, ... | SET *
    | DELETE``, ``WHEN NOT MATCHED [AND <cond>] THEN INSERT * |
    INSERT (c, ..) VALUES (e, ..)``, and ``WHEN NOT MATCHED BY SOURCE
    [AND <cond>] THEN DELETE | UPDATE SET col = expr, ...``.
    Conditions/exprs are requalified from the statement's own aliases
    to the engine's canonical ``t`` (target) / ``s`` (source) —
    by-source conditions reference only the target, so their alias is
    STRIPPED to bare column names (they double as pruning predicates);
    clause ORDER is preserved (first matching clause wins, Delta
    semantics)."""
    amap = {}
    if t_alias:
        amap[t_alias.upper()] = "t"
    if s_alias:
        amap[s_alias.upper()] = "s"

    def requal(text: str) -> str:
        return _rewrite_alias_prefix(text, amap)

    def requal_bare_target(text: str) -> str:
        return _strip_alias_prefix(text, [t_alias, "t"])

    # clause boundaries: WHEN directly followed by [NOT] MATCHED
    # [BY SOURCE] (a CASE WHEN inside a condition or SET expr is not
    # followed by MATCHED, so it cannot split a clause)
    marks = []
    for _w, s, e in _scan_clauses(actions, {"WHEN"}):
        m = re.match(
            r"\s*(NOT\s+)?MATCHED(\s+BY\s+SOURCE)?\b", actions[e:],
            re.IGNORECASE,
        )
        if m:
            if m.group(2) and not m.group(1):
                raise ValueError(
                    "snapshot_sql: MATCHED BY SOURCE is not a clause — "
                    "did you mean WHEN NOT MATCHED BY SOURCE?"
                )
            marks.append(
                (s, e + m.end(), bool(m.group(1)), bool(m.group(2)))
            )
    if not marks or actions[: marks[0][0]].strip():
        raise ValueError(
            f"snapshot_sql: malformed MERGE WHEN clauses "
            f"{actions.strip()[:80]!r}"
        )
    matched: list[tuple] = []
    not_matched: list[tuple] = []
    by_source: list[tuple] = []
    for idx, (start, body_s, is_not, is_by_source) in enumerate(marks):
        end = marks[idx + 1][0] if idx + 1 < len(marks) else len(actions)
        body = actions[body_s:end]
        # the structural THEN: first top-level THEN followed by an
        # action keyword (CASE ... THEN inside a condition never is)
        t_pos = None
        for _w, ts, te in _scan_clauses(body, {"THEN"}):
            if re.match(
                r"\s*(UPDATE|DELETE|INSERT)\b", body[te:], re.IGNORECASE
            ):
                t_pos = (ts, te)
                break
        if t_pos is None:
            raise ValueError(
                f"snapshot_sql: MERGE clause missing THEN <action>: "
                f"{body.strip()[:80]!r}"
            )
        requal_cond = requal_bare_target if is_by_source else requal
        cond_text = body[: t_pos[0]].strip()
        cond = None
        if cond_text:
            am = re.match(r"AND\b", cond_text, re.IGNORECASE)
            if not am:
                raise ValueError(
                    f"snapshot_sql: expected AND <condition> before THEN, "
                    f"got {cond_text[:60]!r}"
                )
            cond = requal_cond(cond_text[am.end() :].strip())
        action_text = body[t_pos[1] :].strip()
        au = re.sub(r"\s+", " ", action_text).upper()

        def parse_set(text: str, value_requal) -> dict:
            assigns = {}
            for part in _split_top_commas(text):
                if not part.strip():
                    continue
                eq = _scan_eq(part)
                if eq < 0:
                    raise ValueError(
                        f"snapshot_sql: malformed SET assignment "
                        f"{part.strip()!r}"
                    )
                col = _strip_alias_prefix(
                    part[:eq].strip(), [t_alias, "t"]
                ).strip("`")
                if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col):
                    raise ValueError(
                        f"snapshot_sql: bad SET target {col!r}"
                    )
                assigns[col] = value_requal(part[eq + 1 :].strip())
            if not assigns:
                raise ValueError("snapshot_sql: empty SET clause")
            return assigns

        if is_not and not is_by_source:
            if au == "INSERT *":
                not_matched.append((cond, None))
                continue
            m = re.match(r"INSERT\s*\(", action_text, re.IGNORECASE)
            if not m:
                raise NotImplementedError(
                    f"snapshot_sql: WHEN NOT MATCHED supports INSERT * "
                    f"and INSERT (cols) VALUES (exprs) — got "
                    f"{action_text[:60]!r}"
                )
            cols_open = action_text.index("(")
            cols_close = cols_open + _matching_paren(action_text[cols_open:])
            cols = [
                c.strip().strip("`")
                for c in _split_top_commas(
                    action_text[cols_open + 1 : cols_close]
                )
            ]
            rest2 = action_text[cols_close + 1 :].strip()
            vm = re.match(r"VALUES\s*\(", rest2, re.IGNORECASE)
            if not vm:
                raise ValueError(
                    f"snapshot_sql: INSERT column list needs VALUES "
                    f"(exprs), got {rest2[:60]!r}"
                )
            v_open = rest2.index("(")
            v_close = v_open + _matching_paren(rest2[v_open:])
            vals = _split_top_commas(rest2[v_open + 1 : v_close])
            if rest2[v_close + 1 :].strip():
                raise ValueError(
                    f"snapshot_sql: trailing text after VALUES: "
                    f"{rest2[v_close + 1:].strip()!r}"
                )
            if len(cols) != len(vals):
                raise ValueError(
                    f"snapshot_sql: INSERT lists {len(cols)} columns but "
                    f"{len(vals)} values"
                )
            not_matched.append(
                (cond, {c: requal(v.strip()) for c, v in zip(cols, vals)})
            )
            continue
        if is_by_source:
            if au == "DELETE":
                by_source.append((cond, "delete", None))
                continue
            m = re.match(r"UPDATE\s+SET\s+", action_text, re.IGNORECASE)
            if not m:
                raise NotImplementedError(
                    f"snapshot_sql: WHEN NOT MATCHED BY SOURCE supports "
                    f"DELETE and UPDATE SET col = expr — got "
                    f"{action_text[:60]!r}"
                )
            by_source.append(
                (
                    cond,
                    "update",
                    parse_set(action_text[m.end() :], requal_bare_target),
                )
            )
            continue
        if au == "DELETE":
            matched.append((cond, "delete", None))
        elif au == "UPDATE SET *":
            matched.append((cond, "update_all", None))
        elif au.startswith("UPDATE"):
            m = re.match(r"UPDATE\s+SET\s+", action_text, re.IGNORECASE)
            if not m:
                raise ValueError(
                    f"snapshot_sql: malformed UPDATE action "
                    f"{action_text[:60]!r}"
                )
            matched.append(
                (cond, "update", parse_set(action_text[m.end() :], requal))
            )
        else:
            raise NotImplementedError(
                f"snapshot_sql: unsupported MERGE action "
                f"{action_text[:60]!r} — matched clauses support UPDATE "
                f"SET col = expr / UPDATE SET * / DELETE"
            )
    return matched, not_matched, by_source


_ON_EQ_RE = re.compile(
    r"\s*(?:([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*)?`?([A-Za-z_][A-Za-z0-9_]*)`?"
    r"\s*=\s*(?:([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*)?"
    r"`?([A-Za-z_][A-Za-z0-9_]*)`?\s*$"
)


def _parse_merge_on(
    cond: str, t_alias: str | None, s_alias: str | None
) -> tuple[list[str], dict[str, str], str | None]:
    """MERGE ON condition -> ``(keys, renames, residual)`` — Delta's
    full ON-predicate surface (r12 verdict #1):

    - same-named column equalities (``t.k = s.k`` / bare ``k = k``)
      are the merge KEYS;
    - DIFFERENTLY-named equi conjuncts (``ON t.id = s.customer_id``)
      key on the TARGET name, recording ``renames[source_col] =
      target_col`` — the caller renames the source column (and
      rewrites source-qualified clause text) before planning;
    - every other conjunct (column-vs-literal, non-equality,
      same-side comparisons) is RESIDUAL: the caller requalifies it
      to the canonical ``t``/``s`` aliases and passes it as
      ``merge_when(on_residual=...)``, where it gates matching
      row-granularly (a key-equal pair failing it is NOT matched).

    At least one target-vs-source equality conjunct is required — a
    genuinely non-equi ON is refused with guidance, as before."""
    t_up = t_alias.upper() if t_alias else None
    s_up = s_alias.upper() if s_alias else None

    def side(alias: str | None) -> str | None:
        if alias is None:
            return None
        a = alias.upper()
        if a == t_up:
            return "t"
        if a == s_up:
            return "s"
        return "?"  # unknown qualifier: leave to Spark's resolution

    keys: list[str] = []
    renames: dict[str, str] = {}
    key_src: dict[str, str] = {}  # target key -> the source column keying it
    residual: list[str] = []
    parts = []
    prev = 0
    for _w, s, e in _scan_clauses(cond, {"AND"}):
        parts.append(cond[prev:s])
        prev = e
    parts.append(cond[prev:])
    for part in parts:
        if not part.strip():
            raise ValueError(
                f"snapshot_sql: empty MERGE ON conjunct in {cond!r}"
            )
        m = _ON_EQ_RE.fullmatch(part)
        if not m:
            residual.append(part.strip())
            continue
        a1, c1, a2, c2 = m.groups()
        d1, d2 = side(a1), side(a2)
        if d1 == "?" or d2 == "?" or (d1 is not None and d1 == d2):
            # unknown qualifier or same-side comparison: residual
            residual.append(part.strip())
            continue
        if d1 == "t" and d2 in (None, "s"):
            tc, sc = c1, c2
        elif d1 == "s" and d2 in (None, "t"):
            tc, sc = c2, c1
        elif d1 is None and d2 == "s":
            tc, sc = c1, c2
        elif d1 is None and d2 == "t":
            tc, sc = c2, c1
        else:  # both unqualified
            if c1 != c2:
                raise NotImplementedError(
                    f"snapshot_sql: qualify differently-named MERGE "
                    f"keys with the statement aliases "
                    f"(t.{c1} = s.{c2}), got {part.strip()!r}"
                )
            tc = sc = c1
        if tc in key_src:
            # r13 verdict finding #1: two conjuncts keying the SAME
            # target column from DIFFERENT source columns (ON t.k = s.a
            # AND t.k = s.b) would rename both sources to one target
            # name and surface as a confusing duplicate-column analysis
            # error downstream — refuse with guidance instead. An exact
            # repeat of the same pair is harmless: dedupe it.
            if key_src[tc] != sc:
                raise NotImplementedError(
                    f"snapshot_sql: target column {tc!r} is keyed "
                    f"against two different source columns "
                    f"({key_src[tc]!r}, {sc!r}) — MERGE keys map one "
                    f"source column per target key; move one conjunct "
                    f"into the residual by comparing source columns "
                    f"(s.{key_src[tc]} = s.{sc}) or project the source"
                )
            continue
        if tc != sc:
            if renames.get(sc, tc) != tc:
                raise ValueError(
                    f"snapshot_sql: source column {sc!r} keyed against "
                    f"two target columns ({renames[sc]!r}, {tc!r})"
                )
            renames[sc] = tc
        key_src[tc] = sc
        keys.append(tc)
    if not keys:
        raise NotImplementedError(
            f"snapshot_sql: MERGE ON needs at least one target-vs-"
            f"source equality conjunct (t.k = s.k); non-equi "
            f"conditions ride along as residual conjuncts only — got "
            f"{cond.strip()[:80]!r}"
        )
    res = " AND ".join(f"({r})" for r in residual) if residual else None
    return keys, renames, res


def _rename_qualified(
    expr: str, aliases: set[str], colmap: dict[str, str]
) -> str:
    """Rewrite ``alias.old`` -> ``alias.new`` per ``colmap`` for the
    given (upper-cased) aliases — quote-aware like
    ``_rewrite_alias_prefix``. Used when differently-named MERGE ON
    keys rename a source column before planning: clause text written
    against the old source name must follow the rename."""
    if not colmap:
        return expr
    out = []
    i = 0
    n = len(expr)
    while i < n:
        c = expr[i]
        if c in ("'", '"'):
            q = c
            j = i + 1
            while j < n:
                if expr[j] == q:
                    if j + 1 < n and expr[j + 1] == q:
                        j += 2
                        continue
                    break
                j += 1
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        if c == "`":
            j = expr.find("`", i + 1)
            j = n - 1 if j < 0 else j
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (expr[j].isalnum() or expr[j] == "_"):
                j += 1
            word = expr[i:j]
            k = j
            while k < n and expr[k].isspace():
                k += 1
            if word.upper() in aliases and k < n and expr[k] == ".":
                k += 1
                while k < n and expr[k].isspace():
                    k += 1
                col = None
                if k < n and expr[k] == "`":
                    e2 = expr.find("`", k + 1)
                    if e2 > 0:
                        col, endpos = expr[k + 1 : e2], e2 + 1
                elif k < n and (expr[k].isalpha() or expr[k] == "_"):
                    e2 = k
                    while e2 < n and (expr[e2].isalnum() or expr[e2] == "_"):
                        e2 += 1
                    col, endpos = expr[k:e2], e2
                if col is not None:
                    out.append(f"{word}.{colmap.get(col, col)}")
                    i = endpos
                    continue
            out.append(word)
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _apply_changes_stmt(spark, rest: str, kw) -> int:
    """``APPLY CHANGES INTO '<root>' FROM <source> KEYS (k[, ...])
    [APPLY AS DELETE WHEN <expr>] [SEQUENCE BY <col>]
    [STORED AS SCD TYPE {1|2}] [TRACK SEQUENCE]`` — DLT's CDC
    statement over the engine's :meth:`SnapshotTable.apply_changes`.
    ``APPLY AS DELETE WHEN`` synthesizes the op column from the
    delete condition (rows where it is TRUE delete, everything else
    upserts); without it every change row upserts. ``TRACK SEQUENCE``
    (requires ``SEQUENCE BY``) turns on cross-batch applied-sequence
    gating."""
    import pyspark.sql.functions as F

    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    # a top-level word only STARTS a clause when the right shape
    # follows — a bare column named keys/stored/sequence/from/track
    # inside the APPLY AS DELETE WHEN expression must not clobber the
    # real clause span (first occurrence of each real clause wins)
    shapes = {
        "FROM": r"\S",
        "KEYS": r"\(",
        "SEQUENCE": r"BY\b",
        "APPLY": r"AS\s+DELETE\s+WHEN\b",
        "STORED": r"AS\s+SCD\s+TYPE\b",
        "TRACK": r"SEQUENCE\b",
    }
    marks = [
        (w, s, e)
        for w, s, e in _scan_clauses(
            tail, {"FROM", "KEYS", "SEQUENCE", "APPLY", "STORED", "TRACK"}
        )
        if re.match(r"\s*" + shapes[w], tail[e:], re.IGNORECASE)
        # TRACK SEQUENCE's SEQUENCE must not also start a clause: a
        # SEQUENCE mark directly following a TRACK mark is its operand
    ]
    filtered = []
    for i, (w, s, e) in enumerate(marks):
        if (
            w == "SEQUENCE"
            and filtered
            and filtered[-1][0] == "TRACK"
            and not tail[filtered[-1][2] : s].strip()
        ):
            continue
        filtered.append((w, s, e))
    # first occurrence of each clause word wins — for the span END
    # too (r12 ADVICE): a later shape-matching identifier for an
    # ALREADY-BOUND word (`... WHEN flag AND keys(x) > 0` after the
    # real KEYS clause) must not truncate the preceding clause's span
    bound: set[str] = set()
    dedup: list[tuple[str, int, int]] = []
    for w, s, e in filtered:
        if w in bound:
            continue
        bound.add(w)
        dedup.append((w, s, e))
    spans: dict[str, str] = {}
    for i, (w, s, e) in enumerate(dedup):
        end = dedup[i + 1][1] if i + 1 < len(dedup) else len(tail)
        spans[w] = tail[e:end].strip()
    if "FROM" not in spans or "KEYS" not in spans:
        raise ValueError(
            "snapshot_sql: APPLY CHANGES INTO needs FROM <source> and "
            "KEYS (k[, ...])"
        )
    source, _s_alias = _resolve_source(spark, spans["FROM"])
    km = re.fullmatch(r"\((.*)\)", spans["KEYS"].strip(), re.DOTALL)
    if not km:
        raise ValueError(
            f"snapshot_sql: KEYS needs a parenthesized column list, got "
            f"{spans['KEYS']!r}"
        )
    keys = [c.strip().strip("`") for c in km.group(1).split(",") if c.strip()]
    if not keys:
        raise ValueError("snapshot_sql: empty KEYS list")
    seq_col = None
    if "SEQUENCE" in spans:
        sm = re.fullmatch(
            r"BY\s+`?([A-Za-z_][A-Za-z0-9_]*)`?", spans["SEQUENCE"],
            re.IGNORECASE,
        )
        if not sm:
            raise ValueError(
                f"snapshot_sql: SEQUENCE BY needs one column, got "
                f"{spans['SEQUENCE']!r}"
            )
        seq_col = sm.group(1)
    scd_type = 1
    if "STORED" in spans:
        tm = re.fullmatch(
            r"AS\s+SCD\s+TYPE\s+([12])", spans["STORED"], re.IGNORECASE
        )
        if not tm:
            raise ValueError(
                f"snapshot_sql: STORED AS SCD TYPE must be 1 or 2, got "
                f"{spans['STORED']!r}"
            )
        scd_type = int(tm.group(1))
    track_seq = False
    if "TRACK" in spans:
        if not re.fullmatch(r"SEQUENCE", spans["TRACK"], re.IGNORECASE):
            raise ValueError(
                f"snapshot_sql: trailing text after TRACK "
                f"{spans['TRACK']!r}"
            )
        track_seq = True
    # synthesize the op column from the delete condition (TRUE ->
    # delete, FALSE/NULL -> upsert); reserved name checked
    if "__sql_op" in source.columns:
        raise ValueError(
            "snapshot_sql: '__sql_op' is reserved for APPLY CHANGES "
            "op synthesis — rename the source column"
        )
    if "APPLY" in spans:
        am = re.match(
            r"AS\s+DELETE\s+WHEN\s+(.+)$", spans["APPLY"],
            re.IGNORECASE | re.DOTALL,
        )
        if not am:
            raise ValueError(
                f"snapshot_sql: malformed APPLY AS DELETE WHEN clause "
                f"{spans['APPLY']!r}"
            )
        op = F.when(F.expr(am.group(1).strip()), F.lit("D")).otherwise(
            F.lit("U")
        )
    else:
        op = F.lit("U")
    t = SnapshotTable(spark, root, **kw)
    return t.apply_changes(
        source.withColumn("__sql_op", op),
        keys if len(keys) > 1 else keys[0],
        op_col="__sql_op",
        seq_col=seq_col,
        delete_ops=("D",),
        scd_type=scd_type,
        track_seq=track_seq,
    )


def _vacuum(spark, rest: str, kw) -> int:
    """``VACUUM <tbl> [RETAIN <n> HOURS] [DRY RUN]`` -> ``expire``
    with time-based retention (Delta's default 168 hours). Returns
    the count of data files deleted (or that WOULD be, under DRY
    RUN)."""
    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    tail = tail.strip()
    hours = 168.0
    dry = False
    m = re.match(
        r"^(?:RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?)?\s*(DRY\s+RUN)?\s*$",
        tail,
        re.IGNORECASE,
    )
    if not m:
        raise ValueError(f"snapshot_sql: malformed VACUUM clause {tail!r}")
    if m.group(1):
        hours = float(m.group(1))
    dry = bool(m.group(2))
    t = SnapshotTable(spark, root, **kw)
    return t.expire(keep_last=1, older_than=hours * 3600, dry_run=dry)


def _optimize(spark, rest: str, kw) -> int:
    """``OPTIMIZE <tbl> TARGET <n> ROWS [FULL] [WHERE <pred>]
    [CLUSTER BY (a, b) | ZORDER BY (a, b)]`` -> ``compact_partial``
    (bin-pack only the small / DV-carrying files, Delta's OPTIMIZE
    shape) or ``compact`` under ``FULL``; ``ZORDER BY`` implies the
    full rewrite (Delta's rule — interleaving is a whole-table
    layout). ``WHERE`` scopes the partial selection to files the
    predicate cannot prove out (Delta's ``OPTIMIZE ... WHERE`` —
    metadata-only, never a row filter) and is refused with FULL /
    ZORDER (they are whole-table by definition). The explicit row
    target replaces Delta's byte-size target — the manifest accounts
    rows, not encoded bytes."""
    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    m = re.match(
        r"^TARGET\s+(\d+)\s+ROWS\s*(FULL)?\s*"
        r"(?:WHERE\s+(.*?))??\s*"
        r"(?:(CLUSTER|ZORDER)\s+BY\s*\(([^)]*)\))?\s*$",
        tail.strip(),
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(
            f"snapshot_sql: OPTIMIZE needs 'TARGET <n> ROWS [FULL] "
            f"[WHERE <pred>] [CLUSTER BY (..) | ZORDER BY (..)]', "
            f"got {tail.strip()!r}"
        )
    target = int(m.group(1))
    pred = m.group(3).strip() if m.group(3) else None
    if pred is None and re.search(r"\bWHERE\b", tail, re.IGNORECASE):
        # a WHERE keyword whose predicate parsed empty must not
        # silently degrade to an unscoped compaction (the empty
        # ZORDER BY () list is refused for the same reason)
        raise ValueError(
            "snapshot_sql: OPTIMIZE WHERE needs a predicate"
        )
    cols = (
        [
            c.strip().strip("`")
            for c in m.group(5).split(",")
            if c.strip()
        ]
        if m.group(5)
        else None
    ) or None
    zorder = bool(m.group(4)) and m.group(4).upper() == "ZORDER"
    if pred is not None and (m.group(2) or zorder):
        raise ValueError(
            "snapshot_sql: OPTIMIZE WHERE scopes the PARTIAL "
            "selection — FULL and ZORDER BY are whole-table rewrites "
            "by definition; drop WHERE or the FULL/ZORDER clause"
        )
    if m.group(4) and not cols:
        # an empty column list must not silently degrade to a
        # round-robin rewrite that destroys existing clustering
        raise ValueError(
            f"snapshot_sql: {m.group(4).upper()} BY needs a non-empty "
            f"column list"
        )
    t = SnapshotTable(spark, root, **kw)
    if zorder:
        return t.compact(target_rows_per_file=target, zorder_by=cols)
    if m.group(2):
        return t.compact(target_rows_per_file=target, cluster_by=cols)
    return t.compact_partial(
        target_rows_per_file=target, cluster_by=cols, where=pred
    )


def _restore(spark, rest: str, kw) -> int:
    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    m = re.match(
        r"^TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*$", tail.strip(), re.IGNORECASE
    )
    if m:
        return SnapshotTable(spark, root, **kw).restore(int(m.group(1)))
    m = re.match(
        r"^TO\s+TIMESTAMP\s+AS\s+OF\s+(?:(\d+(?:\.\d+)?)"
        r"|'((?:[^']|'')*)')\s*$",
        tail.strip(),
        re.IGNORECASE,
    )
    if m:
        # Delta's RESTORE TO TIMESTAMP AS OF: resolve through the same
        # newest-commit-at-or-before rule reads use (version_at raises
        # on future or pre-retention instants); quoted ISO literals go
        # through the shared UTC comparator, like table_changes/CLONE
        t = SnapshotTable(spark, root, **kw)
        ts = (
            float(m.group(1))
            if m.group(1) is not None
            else _parse_ts_literal(m.group(2).replace("''", "'"))
        )
        return t.restore(t.version_at(ts))
    raise ValueError(
        f"snapshot_sql: RESTORE needs 'TO VERSION AS OF <n>' or "
        f"'TO TIMESTAMP AS OF <epoch | ''iso''>', got {tail.strip()!r}"
    )


def _comment_on_table(spark, rest: str, kw) -> int:
    """``COMMENT ON TABLE '<root>' IS '<text>'`` — the table comment
    is the ``comment`` property (``IS NULL`` clears, Delta's form)."""
    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    t = SnapshotTable(spark, root, **kw)
    s = tail.strip()
    m = re.match(
        r"^IS\s+(?:'((?:[^']|'')*)'|(NULL))\s*$", s, re.IGNORECASE | re.DOTALL
    )
    if not m:
        raise ValueError(
            f"snapshot_sql: COMMENT ON TABLE needs IS '<text>' or IS "
            f"NULL, got {s[:60]!r}"
        )
    text = None if m.group(2) else m.group(1).replace("''", "'")
    return t.set_table_comment(text)


_TBLPROP_KEY_RE = re.compile(
    r"^(?:'((?:[^']|'')*)'|([A-Za-z_][A-Za-z0-9_.]*))$"
)


def _parse_tblproperties(body: str) -> dict[str, str]:
    """``TBLPROPERTIES`` entry list -> {key: value}. Keys are quoted
    strings or dotted identifiers; values are quoted strings or bare
    numbers/words (stored as strings, Delta's model)."""
    props: dict[str, str] = {}
    for item in _split_top_commas(body):
        item = item.strip()
        # '=' is not a word — find the first top-level '=' manually
        pos = -1
        depth = 0
        i = 0
        while i < len(item):
            c = item[i]
            if c == "'":
                i += 1
                while i < len(item):
                    if item[i] == "'":
                        if i + 1 < len(item) and item[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "=" and depth == 0:
                pos = i
                break
            i += 1
        if pos < 0:
            raise ValueError(
                f"snapshot_sql: malformed TBLPROPERTIES entry {item!r} — "
                f"expected key = value"
            )
        rawk, rawv = item[:pos].strip(), item[pos + 1 :].strip()
        km = _TBLPROP_KEY_RE.match(rawk)
        if not km:
            raise ValueError(
                f"snapshot_sql: bad TBLPROPERTIES key {rawk!r}"
            )
        key = (
            km.group(1).replace("''", "'")
            if km.group(1) is not None
            else km.group(2)
        )
        vm = re.fullmatch(r"'((?:[^']|'')*)'", rawv, re.DOTALL)
        if vm:
            val = vm.group(1).replace("''", "'")
        elif re.fullmatch(r"[A-Za-z0-9_.+-]+", rawv):
            val = rawv
        else:
            raise ValueError(
                f"snapshot_sql: bad TBLPROPERTIES value {rawv!r} for "
                f"key {key!r}"
            )
        if key in props:
            raise ValueError(f"snapshot_sql: duplicate property {key!r}")
        props[key] = val
    if not props:
        raise ValueError("snapshot_sql: TBLPROPERTIES list is empty")
    return props


def _alter(spark, rest: str, kw) -> int:
    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    t = SnapshotTable(spark, root, **kw)
    s = tail.strip()
    m = re.match(
        r"^SET\s+TBLPROPERTIES\s*\((.*)\)\s*$", s, re.IGNORECASE | re.DOTALL
    )
    if m:
        return t.set_table_properties(_parse_tblproperties(m.group(1)))
    m = re.match(
        r"^UNSET\s+TBLPROPERTIES\s*(IF\s+EXISTS\s*)?\((.*)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        keys = []
        for item in _split_top_commas(m.group(2)):
            km = _TBLPROP_KEY_RE.match(item.strip())
            if not km:
                raise ValueError(
                    f"snapshot_sql: bad TBLPROPERTIES key {item.strip()!r}"
                )
            keys.append(
                km.group(1).replace("''", "'")
                if km.group(1) is not None
                else km.group(2)
            )
        if not m.group(1):
            # Delta's rule: without IF EXISTS a missing key is an
            # error — a typo'd unset must not succeed silently
            missing = sorted(
                k for k in keys if k not in t._table_properties()
            )
            if missing:
                raise ValueError(
                    f"snapshot_sql: UNSET TBLPROPERTIES: no such "
                    f"propert{'y' if len(missing) == 1 else 'ies'} "
                    f"{missing} — use UNSET TBLPROPERTIES IF EXISTS "
                    f"to ignore missing keys"
                )
        return t.set_table_properties({k: None for k in keys})
    m = re.match(
        r"^RENAME\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+TO\s+"
        r"`?([A-Za-z_][A-Za-z0-9_]*)`?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return t.rename_column(m.group(1), m.group(2))
    m = re.match(
        r"^DROP\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s*$", s, re.IGNORECASE
    )
    if m:
        return t.drop_column(m.group(1))
    m = re.match(
        r"^ADD\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\((.*)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        return t.add_check_constraint(m.group(1), m.group(2).strip())
    m = re.match(
        r"^DROP\s+CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", s, re.IGNORECASE
    )
    if m:
        return t.drop_check_constraint(m.group(1))
    m = re.match(
        r"^ADD\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+GENERATED\s+"
        r"ALWAYS\s+AS\s+IDENTITY"
        r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)"
        r"(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return t.add_identity_column(
            m.group(1),
            start=int(m.group(2)) if m.group(2) else 1,
            step=int(m.group(3)) if m.group(3) else 1,
        )
    m = re.match(
        r"^DROP\s+IDENTITY\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return t.drop_identity_column(m.group(1))
    m = re.match(
        r"^ADD\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+GENERATED\s+"
        r"ALWAYS\s+AS\s*\((.*)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        # Delta declares these in CREATE TABLE column lists; the
        # engine's CTAS dispatcher has no column-DDL grammar, so the
        # declaration rides ALTER (before the first write, or on data
        # that already satisfies it — layout.add_generated_column)
        return t.add_generated_column(m.group(1), m.group(2).strip())
    m = re.match(
        r"^DROP\s+GENERATED\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return t.drop_generated_column(m.group(1))
    m = re.match(
        r"^ADD\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+"
        r"([A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
        r"(?:\s+DEFAULT\s+(.+?))?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        # plain metadata-only ADD COLUMN (r14): existing rows read
        # NULL; a retired name re-adds under a fresh physical slot
        return t.add_column(
            m.group(1), m.group(2),
            default=m.group(3).strip() if m.group(3) else None,
        )
    m = re.match(r"^ADD\s+COLUMNS\s*\(", s, re.IGNORECASE)
    if m:
        # Delta's plural form: ADD COLUMNS (a INT, b STRING DEFAULT 'x')
        open_p = s.index("(", m.end() - 1)
        close_p = open_p + _matching_paren(s[open_p:])
        if close_p <= open_p or s[close_p + 1 :].strip():
            raise ValueError(
                f"snapshot_sql: malformed ADD COLUMNS list {s!r}"
            )
        v = None
        for item in _split_top_commas(s[open_p + 1 : close_p]):
            cm = re.fullmatch(
                r"\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s+"
                r"([A-Za-z_][A-Za-z0-9_]*"
                r"(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
                r"(?:\s+DEFAULT\s+(.+?))?\s*",
                item,
                re.IGNORECASE | re.DOTALL,
            )
            if not cm:
                raise ValueError(
                    f"snapshot_sql: malformed ADD COLUMNS entry "
                    f"{item.strip()!r} — expected 'name TYPE "
                    f"[DEFAULT expr]'"
                )
            v = t.add_column(
                cm.group(1), cm.group(2),
                default=cm.group(3).strip() if cm.group(3) else None,
            )
        if v is None:
            raise ValueError("snapshot_sql: empty ADD COLUMNS list")
        return v
    m = re.match(
        r"^ALTER\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+SET\s+DEFAULT"
        r"\s+(.+)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        # Delta's default column values (r13 verdict missing #2):
        # write-time fill for OMITTED columns on the INSERT-family
        # writers; explicit values always win
        return t.set_column_default(m.group(1), m.group(2).strip())
    m = re.match(
        r"^ALTER\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+DROP\s+"
        r"DEFAULT\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        return t.drop_column_default(m.group(1))
    m = re.match(
        r"^ALTER\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+COMMENT\s+"
        r"'((?:[^']|'')*)'\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        return t.set_column_comment(
            m.group(1), m.group(2).replace("''", "'") or None
        )
    m = re.match(
        r"^ALTER\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+SET\s+"
        r"NOT\s+NULL\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        # Delta's ALTER COLUMN SET NOT NULL: the same auto-named CHECK
        # the CREATE-list NOT NULL suffix declares (SQL 3VL makes
        # `c IS NOT NULL` enforce exactly); add_check_constraint
        # validates the existing rows first — declaring NOT NULL on a
        # column that already holds NULLs is refused, Delta's rule
        c = m.group(1)
        return t.add_check_constraint(f"{c}_not_null", f"`{c}` IS NOT NULL")
    m = re.match(
        r"^ALTER\s+COLUMN\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s+DROP\s+"
        r"NOT\s+NULL\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        c = m.group(1)
        name = f"{c}_not_null"
        if name not in t._table_checks():
            raise ValueError(
                f"snapshot_sql: column {c!r} carries no NOT NULL "
                f"constraint (auto-named {name!r}); DESCRIBE DETAIL "
                f"lists the active checks"
            )
        return t.drop_check_constraint(name)
    raise NotImplementedError(
        f"snapshot_sql: unsupported ALTER TABLE clause {s!r} — supported: "
        f"RENAME COLUMN a TO b, DROP COLUMN a, ADD COLUMN c TYPE "
        f"[DEFAULT expr], ADD CONSTRAINT n CHECK "
        f"(expr), DROP CONSTRAINT n, ADD COLUMN g GENERATED ALWAYS AS "
        f"(expr), DROP GENERATED COLUMN g, ADD COLUMN i GENERATED ALWAYS "
        f"AS IDENTITY [(START WITH n [INCREMENT BY k])], DROP IDENTITY "
        f"COLUMN i, ALTER COLUMN c SET DEFAULT <expr> | DROP DEFAULT | "
        f"COMMENT '<text>' | SET NOT NULL | DROP NOT NULL, SET/UNSET "
        f"TBLPROPERTIES (...)"
    )


_TT_RE = re.compile(
    r"^\s*(?:(VERSION)\s+AS\s+OF\s+(\d+)"
    r"|(TIMESTAMP)\s+AS\s+OF\s+(?:(\d+(?:\.\d+)?)|'((?:[^']|'')*)'))",
    re.IGNORECASE,
)


def _select(spark, statement: str):
    """``SELECT ... FROM '<root>' [VERSION AS OF n | TIMESTAMP AS OF
    epoch] ...`` — every quoted table-root reference in the statement
    is swapped for a temp view over the batch ``snapshot`` DataSource
    (filter pushdown + DV masking + time travel ride along), then the
    rewritten text runs through ``spark.sql``. Joins, CTEs and
    subqueries work because only the quoted path tokens are touched —
    string literals inside the query survive: a path is rewritten
    ONLY when it directly follows a FROM/JOIN keyword in RELATION
    context — each paren region is classified as a subquery (first
    word SELECT/WITH; FROM inside it is a real clause) or an
    expression (function arguments; ``EXTRACT(YEAR FROM
    '2021-01-01')`` / ``TRIM(BOTH 'x' FROM y)`` must keep their
    literals — r11-ADVICE). The INNERMOST frame decides: a scalar
    subquery nested inside a function call (``coalesce((SELECT ..
    FROM '<root>'), 0)``) is relation context again. Delta parity:
    ``SELECT .. FROM delta.`/p` VERSION AS OF 3``.

    ``FROM table_changes('<root>', start [, end])`` (r13) is Delta's
    CDF table-valued function: the call is swapped for a temp view of
    the per-commit change feed (inclusive version window,
    ``_change_type`` / ``_commit_version`` / ``_commit_timestamp``) —
    see :func:`_table_changes_view`."""
    from .snapshot_source import register_snapshot_source

    register_snapshot_source(spark)
    out = []
    views: dict[tuple, str] = {}
    i = 0
    n = len(statement)
    prev_word = ""
    # one entry per open paren: True = subquery region (relation
    # context preserved), False = expression region (no rewrites)
    ctx: list[bool] = []
    while i < n:
        c = statement[i]
        if c == "(":
            j = i + 1
            while j < n and statement[j].isspace():
                j += 1
            k = j
            while k < n and (statement[k].isalnum() or statement[k] == "_"):
                k += 1
            ctx.append(statement[j:k].upper() in ("SELECT", "WITH"))
            out.append(c)
            prev_word = ""
            i += 1
            continue
        if c == ")":
            if ctx:
                ctx.pop()
            out.append(c)
            prev_word = ""
            i += 1
            continue
        if c == "'" or c == '"' or c == "`":
            q = c
            j = i + 1
            while j < n:
                if statement[j] == q:
                    if q != "`" and j + 1 < n and statement[j + 1] == q:
                        j += 2
                        continue
                    break
                j += 1
            if prev_word in ("FROM", "JOIN") and (not ctx or ctx[-1]):
                root = statement[i + 1 : j].replace(q + q, q)
                rest = statement[j + 1 :]
                tt = _TT_RE.match(rest)
                key: tuple = (root, None, None)
                consumed = j + 1
                if tt:
                    if tt.group(1):
                        key = (root, int(tt.group(2)), None)
                    elif tt.group(4) is not None:
                        key = (root, None, float(tt.group(4)))
                    else:
                        # quoted ISO/epoch literal, same comparator as
                        # table_changes/CLONE/RESTORE (UTC calendar)
                        key = (
                            root,
                            None,
                            _parse_ts_literal(
                                tt.group(5).replace("''", "'")
                            ),
                        )
                    consumed = j + 1 + tt.end()
                if key not in views:
                    r = spark.read.format("snapshot").option("path", root)
                    if key[1] is not None:
                        r = r.option("versionAsOf", str(key[1]))
                    if key[2] is not None:
                        r = r.option("timestampAsOf", str(key[2]))
                    name = f"snapshot_sql_v{len(views)}_{abs(hash(key)) % 10**8}"
                    r.load().createOrReplaceTempView(name)
                    views[key] = name
                out.append(views[key])
                i = consumed
                prev_word = ""
                continue
            out.append(statement[i : j + 1])
            i = j + 1
            prev_word = ""
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (statement[j].isalnum() or statement[j] == "_"):
                j += 1
            w = statement[i:j].upper()
            if (
                w == "TABLE_CHANGES"
                and prev_word in ("FROM", "JOIN")
                and (not ctx or ctx[-1])
            ):
                # Delta's CDF table-valued function: the whole call is
                # swapped for a temp view over changes_by_version
                k = j
                while k < n and statement[k].isspace():
                    k += 1
                if k < n and statement[k] == "(":
                    close = k + _matching_paren(statement[k:])
                    if close <= k:
                        raise ValueError(
                            "snapshot_sql: malformed table_changes(...)"
                        )
                    out.append(
                        _table_changes_view(
                            spark, statement[k + 1 : close], views
                        )
                    )
                    i = close + 1
                    prev_word = ""
                    continue
            prev_word = w
            out.append(statement[i:j])
            i = j
            continue
        if not c.isspace():
            prev_word = ""
        out.append(c)
        i += 1
    return spark.sql("".join(out))


def _parse_ts_literal(text: str) -> float:
    """A quoted timestamp bound -> epoch seconds. Accepts a numeric
    epoch string (``'1755350000.5'``) or an ISO date/datetime
    (``'2026-08-16'``, ``'2026-08-16 12:00:00'``) interpreted as UTC
    — commit instants are recorded as ``time.time()`` epochs."""
    try:
        return float(text)
    except ValueError:
        pass
    import datetime as _dt

    try:
        d = _dt.datetime.fromisoformat(text)
    except ValueError:
        raise ValueError(
            f"snapshot_sql: bad timestamp literal {text!r} — use an "
            f"epoch number or ISO 'YYYY-MM-DD[ HH:MM:SS]' (UTC)"
        ) from None
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d.timestamp()


def _table_changes_view(spark, args: str, views: dict) -> str:
    """``table_changes('<root>', start [, end])`` -> a temp view of
    the per-commit change feed — Delta's CDF table-valued function.
    Each bound is an INTEGER commit version or a QUOTED TIMESTAMP
    literal (Delta disambiguates by type the same way): a start
    timestamp resolves to the EARLIEST commit at-or-after it, an end
    timestamp to the NEWEST commit at-or-before it (the RESTORE
    TO TIMESTAMP comparator); a start timestamp after the newest
    commit raises, Delta's out-of-range rule. Versions are INCLUSIVE
    (Delta's convention); ``end`` defaults to the current head. Rows
    carry ``_change_type`` (an update is its delete+insert pair),
    ``_commit_version`` and ``_commit_timestamp`` (a TIMESTAMP from
    the commit's manifest instant; NULL for pre-timestamp legacy
    commits). Cost is the sum of per-commit file diffs —
    delta-proportional, never a table scan."""
    import pyspark.sql.functions as F

    parts = [p.strip() for p in _split_top_commas(args)]
    if len(parts) not in (2, 3):
        raise ValueError(
            "snapshot_sql: table_changes needs ('<root>', start"
            "[, end]) — integer versions or quoted timestamps"
        )
    rm = re.fullmatch(r"'((?:[^']|'')*)'|`([^`]*)`", parts[0])
    if not rm:
        raise ValueError(
            f"snapshot_sql: table_changes root must be a quoted path, "
            f"got {parts[0]!r}"
        )
    root = (rm.group(1) or rm.group(2) or "").replace("''", "'")

    def bound(text: str) -> tuple[str, float | int]:
        sm = re.fullmatch(r"'((?:[^']|'')*)'", text)
        if sm:
            return "ts", _parse_ts_literal(sm.group(1).replace("''", "'"))
        try:
            return "version", int(text)
        except ValueError:
            raise ValueError(
                f"snapshot_sql: table_changes bounds must be integer "
                f"versions or quoted timestamp literals, got {text!r}"
            ) from None

    bounds = [bound(p) for p in parts[1:]]
    key = ("__table_changes__", root, tuple(bounds))
    if key not in views:
        t = SnapshotTable(spark, root)
        kind, val = bounds[0]
        if kind == "ts":
            # earliest commit at-or-after the instant (Delta's CDF
            # start-timestamp rule; version_at raises on a future
            # instant — same out-of-range contract)
            try:
                v = t.version_at(float(val))
                at = t._raw_manifest(v).get("committed_at")
                start = v if at is not None and float(at) >= float(val) \
                    else v + 1
            except ValueError as e:
                if "after the newest commit" in str(e):
                    raise
                start = 1  # instant predates every commit: full feed
        else:
            start = int(val)
        if start < 1:
            raise ValueError(
                "snapshot_sql: table_changes start must be >= 1"
            )
        end = None
        if len(bounds) == 2:
            kind, val = bounds[1]
            # newest commit at-or-before: the RESTORE TO TIMESTAMP
            # comparator (snapshot_sql._restore)
            end = t.version_at(float(val)) if kind == "ts" else int(val)
        v_end = t.current_version() if end is None else end
        df = t.changes_by_version(start - 1, v_end)
        ts_rows = []
        for v in range(start, v_end + 1):
            try:
                ts = t._raw_manifest(v).get("committed_at")
            except FileNotFoundError:
                ts = None
            ts_rows.append((v, float(ts) if ts is not None else None))
        ts_df = spark.createDataFrame(
            ts_rows, "_commit_version int, __epoch double"
        ).select(
            "_commit_version",
            F.timestamp_seconds(F.col("__epoch")).alias(
                "_commit_timestamp"
            ),
        )
        df = df.join(F.broadcast(ts_df), "_commit_version", "left")
        name = f"snapshot_sql_tc{len(views)}_{abs(hash(key)) % 10**8}"
        df.createOrReplaceTempView(name)
        views[key] = name
    return views[key]


def _insert(spark, rest: str, kw, overwrite: bool = False) -> int:
    """``INSERT INTO/OVERWRITE '<root>' [(col, ...)] <query>`` — with
    a COLUMN LIST (r14) the query's output maps POSITIONALLY onto the
    listed columns (standard SQL); columns the list omits flow through
    the write-time choke points (DEFAULT fill, IDENTITY assignment,
    GENERATED compute, NULL-pad on read otherwise).

    Without a column list, the mapping rule is BY NAME when any query
    column names a table column — this engine's documented
    schema-evolution INSERT (query columns the table lacks evolve the
    schema additively, like Delta's autoMerge; name your outputs or
    use a column list for exact control) — and POSITIONAL when NO
    query column names the table (the ``VALUES (..)`` col1/col2
    shape, ANSI's rule; arity mismatches are refused)."""
    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    q = tail.strip()
    cols: list[str] | None = None
    if q.startswith("("):
        # a paren region is a column list only when it holds bare
        # identifiers — otherwise it is a parenthesized query
        close = _matching_paren(q)
        if close < 0:
            raise ValueError("snapshot_sql: unbalanced ( in INSERT")
        inner = [c.strip() for c in _split_top_commas(q[1:close])]
        if inner and all(
            re.fullmatch(r"`?[A-Za-z_][A-Za-z0-9_]*`?", c) for c in inner
        ) and inner[0].strip("`").upper() not in ("SELECT", "WITH"):
            cols = [c.strip("`") for c in inner]
            if len(cols) != len(set(cols)):
                raise ValueError(
                    f"snapshot_sql: duplicate column in INSERT list "
                    f"{cols!r}"
                )
            q = q[close + 1 :].strip()
    if not q:
        raise ValueError("snapshot_sql: INSERT needs a query")
    if q.startswith("(") and q.endswith(")"):
        q = q[1:-1]
    df = spark.sql(q)
    if cols is not None:
        if len(df.columns) != len(cols):
            raise ValueError(
                f"snapshot_sql: INSERT lists {len(cols)} columns but "
                f"the query produces {len(df.columns)}"
            )
        df = df.toDF(*cols)
    t = SnapshotTable(spark, root, **kw)
    if cols is None and not overwrite:
        # INSERT INTO with no column list and NO query column naming
        # the table — a fully positional source (``VALUES (..)``
        # surfaces col1/col2/...): map positionally onto the table
        # columns (ANSI / Delta rule). Without this, VALUES silently
        # schema-evolved colN columns and NULL-padded the real ones —
        # a wrong answer, not a write. INSERT OVERWRITE keeps its
        # documented reshape semantics (the query DEFINES the shape).
        cur = t.current_version()
        logical = (
            [l for l, _p in t._logical_fields(t._base_manifest(cur))]
            if cur
            else []
        )
        if logical and not (set(df.columns) & set(logical)):
            computed = set(t._table_generated()) | set(t._table_identity())
            writable = [c for c in logical if c not in computed]
            if len(df.columns) == len(logical):
                df = df.toDF(*logical)
            elif len(df.columns) == len(writable):
                df = df.toDF(*writable)
            else:
                raise ValueError(
                    f"snapshot_sql: INSERT query produces "
                    f"{len(df.columns)} columns but the table has "
                    f"{len(logical)} ({len(writable)} writable) — list "
                    f"the target columns explicitly: INSERT INTO "
                    f"'<root>' (col, ...) <query>"
                )
    return t.overwrite(df) if overwrite else t.append(df)


_PARTITION_ENTRY_RE = re.compile(
    r"^([A-Za-z_][A-Za-z0-9_]*)\s*(?:\((.*)\))?$", re.DOTALL
)


def _parse_partitioned_by(body: str) -> list[dict]:
    """``PARTITIONED BY`` entry list -> layout specs for
    ``SnapshotTable.set_table_layout``. Entries: a bare column
    (identity — range-clustered), ``bucket(n, col)``,
    ``days(col)``/``months(col)`` (``day``/``month`` accepted), or
    ``truncate(col, n)`` (Iceberg also writes ``truncate(n, col)`` —
    both orders accepted, the integer is the width)."""
    specs: list[dict] = []
    for item in _split_top_commas(body):
        item = item.strip()
        m = _PARTITION_ENTRY_RE.match(item)
        if not m:
            raise ValueError(
                f"snapshot_sql: malformed PARTITIONED BY entry {item!r} — "
                f"expected col | bucket(n, col) | days(col) | "
                f"months(col) | truncate(col, n)"
            )
        word, args = m.group(1), m.group(2)
        if args is None:
            specs.append({"transform": "identity", "key": word, "param": None})
            continue
        fn = word.lower()
        fn = {"days": "day", "months": "month"}.get(fn, fn)
        parts = [a.strip() for a in _split_top_commas(args)]
        if fn in ("day", "month"):
            if len(parts) != 1 or not parts[0].isidentifier():
                raise ValueError(
                    f"snapshot_sql: {word} takes exactly one column "
                    f"({item!r})"
                )
            specs.append({"transform": fn, "key": parts[0], "param": None})
        elif fn in ("bucket", "truncate"):
            if len(parts) != 2:
                raise ValueError(
                    f"snapshot_sql: {word} takes (n, col) or (col, n) "
                    f"({item!r})"
                )
            ints = [p for p in parts if re.fullmatch(r"\d+", p)]
            cols = [p for p in parts if p.isidentifier() and not p.isdigit()]
            if len(ints) != 1 or len(cols) != 1:
                raise ValueError(
                    f"snapshot_sql: {word} needs one integer and one "
                    f"column ({item!r})"
                )
            specs.append(
                {"transform": fn, "key": cols[0], "param": int(ints[0])}
            )
        else:
            raise ValueError(
                f"snapshot_sql: unknown PARTITIONED BY transform "
                f"{word!r} — expected bucket | days | months | truncate"
            )
    if not specs:
        raise ValueError("snapshot_sql: PARTITIONED BY list is empty")
    return specs


def _strip_partitioned_by(text: str) -> tuple[list[dict] | None, str]:
    """If ``text`` starts with ``PARTITIONED BY (...)``, parse it and
    return (specs, remainder); else (None, text)."""
    m = re.match(r"^PARTITIONED\s+BY\s*\(", text, re.IGNORECASE)
    if not m:
        return None, text
    open_p = text.index("(", m.end() - 1)
    close_p = open_p + _matching_paren(text[open_p:])
    if close_p <= open_p:
        raise ValueError("snapshot_sql: unterminated PARTITIONED BY list")
    specs = _parse_partitioned_by(text[open_p + 1 : close_p])
    return specs, text[close_p + 1 :].strip()


def _strip_create_clauses(
    text: str,
) -> tuple[list[dict] | None, dict | None, str | None, str]:
    """Strip the CREATE TABLE suffix clauses — ``PARTITIONED BY
    (...)``, ``TBLPROPERTIES (...)``, ``COMMENT '<text>'`` — in ANY
    order (Spark accepts them reordered) and return (layout, props,
    comment, remainder). ``AS <query>`` is left in the remainder."""
    layout = props = comment = None
    while True:
        if layout is None:
            layout, text2 = _strip_partitioned_by(text)
            if layout is not None:
                text = text2
                continue
        m = re.match(r"^TBLPROPERTIES\s*\(", text, re.IGNORECASE)
        if m and props is None:
            open_p = text.index("(", m.end() - 1)
            close_p = open_p + _matching_paren(text[open_p:])
            if close_p <= open_p:
                raise ValueError(
                    "snapshot_sql: unterminated TBLPROPERTIES list"
                )
            props = _parse_tblproperties(text[open_p + 1 : close_p])
            text = text[close_p + 1 :].strip()
            continue
        m = re.match(
            r"^COMMENT\s+'((?:[^']|'')*)'", text, re.IGNORECASE | re.DOTALL
        )
        if m and comment is None:
            comment = m.group(1).replace("''", "'")
            text = text[m.end():].strip()
            continue
        return layout, props, comment, text


def _create(
    spark, rest: str, kw, replace: bool = False, if_not_exists: bool = False
) -> int:
    """``CREATE TABLE '<root>' AS <query>`` or — with a COLUMN LIST
    (r13 verdict #2) — ``CREATE TABLE '<root>' (col TYPE [GENERATED
    ALWAYS AS (expr) | GENERATED ALWAYS AS IDENTITY [(START WITH n
    [INCREMENT BY k])] | CHECK (expr) | DEFAULT <expr> [NOT NULL] |
    NOT NULL], ..., [CONSTRAINT name CHECK (expr)]) [AS <query>]`` —
    where Delta users actually declare generated/identity/default/
    check columns. The declaration commits the empty schema first,
    routes each column property through the existing add_* machinery
    (declare-before-first-write is exactly what they support), then
    appends the AS-query rows if given (computing/assigning/filling
    through the same write-time choke points as any append). The root
    must not hold a committed snapshot yet (Delta's rule) — unless
    ``IF NOT EXISTS`` (existing table: no-op returning the current
    version) or ``OR REPLACE`` (r14: the new definition REPLACES data
    AND governance — checks/generated/identity/defaults clear, the
    physical layout resets — while table HISTORY stays time-travelable,
    Delta's CREATE OR REPLACE semantics)."""
    root, _alias, tail = _parse_table_ref(rest, allow_alias=False)
    tail = tail.strip()
    t = SnapshotTable(spark, root, **kw)
    exists = bool(t.current_version())
    if exists and if_not_exists:
        return t.current_version()
    if exists and not replace:
        raise ValueError(
            f"snapshot_sql: CREATE TABLE target {root!r} already holds a "
            f"committed snapshot — use INSERT INTO / INSERT OVERWRITE, "
            f"CREATE OR REPLACE TABLE, or CREATE TABLE IF NOT EXISTS"
        )
    replacing = exists and replace
    cm = re.match(r"^(SHALLOW|DEEP)\s+CLONE\s+", tail, re.IGNORECASE)
    if cm:
        # ``CREATE TABLE '<dst>' SHALLOW|DEEP CLONE '<src>'
        # [VERSION AS OF n | TIMESTAMP AS OF <ts>]`` (r14 verdict
        # missing #2) — Delta's SQL clone surface, routed to
        # ``clone_to``. The source handle is config-less (it inherits
        # the source table's persisted stats/bloom config, which the
        # clone carries over); the temporal pin resolves through the
        # same newest-commit-at-or-before rule as RESTORE / reads.
        if replacing:
            raise NotImplementedError(
                "snapshot_sql: CREATE OR REPLACE ... CLONE is not "
                "supported — clone to a fresh root (the clone commit "
                "must be the target's v1 so its expire/GC can never "
                "touch pre-clone files)"
            )
        deep = cm.group(1).upper() == "DEEP"
        src_root, _a, ctail = _parse_table_ref(
            tail[cm.end():], allow_alias=False
        )
        ctail = ctail.strip()
        src = SnapshotTable(spark, src_root)
        version = None
        if ctail:
            vm = re.match(
                r"^VERSION\s+AS\s+OF\s+(\d+)\s*$", ctail, re.IGNORECASE
            )
            tm = re.match(
                r"^TIMESTAMP\s+AS\s+OF\s+(?:'((?:[^']|'')*)'"
                r"|(\d+(?:\.\d+)?))\s*$",
                ctail,
                re.IGNORECASE,
            )
            if vm:
                version = int(vm.group(1))
            elif tm:
                ts = (
                    _parse_ts_literal(tm.group(1).replace("''", "'"))
                    if tm.group(1) is not None
                    else float(tm.group(2))
                )
                version = src.version_at(ts)
            else:
                raise ValueError(
                    f"snapshot_sql: CLONE takes an optional 'VERSION AS "
                    f"OF <n>' or 'TIMESTAMP AS OF <ts>' pin, got "
                    f"{ctail[:60]!r}"
                )
        dest = src.clone_to(root, version=version, deep=deep)
        return dest.current_version()
    lm = re.match(r"^LIKE\s+", tail, re.IGNORECASE)
    if lm:
        # ``CREATE TABLE '<dst>' LIKE '<src>'`` — the source's SCHEMA
        # and governance (checks incl. NOT NULL, generated/identity
        # definitions, defaults, comments, declared layout, user
        # properties) on a fresh EMPTY table; identity counters
        # restart at their declared START (no data is copied — that is
        # CLONE's job). Spark/Delta's CREATE TABLE LIKE semantics.
        from pyspark.sql.types import StructType

        src_root, _a, ltail = _parse_table_ref(
            tail[lm.end():], allow_alias=False
        )
        if ltail.strip():
            raise ValueError(
                f"snapshot_sql: trailing text after CREATE TABLE LIKE: "
                f"{ltail.strip()[:60]!r}"
            )
        src = SnapshotTable(spark, src_root)
        cur = src.current_version()
        if not cur:
            raise ValueError(
                f"snapshot_sql: LIKE source {src_root!r} has no "
                f"committed snapshot"
            )
        # the persisted pruning config travels with LIKE too (the
        # CLONE branch carries it via the handle) — without it the new
        # table silently writes stat-less files; explicit kwargs win
        scfg = src._raw_manifest(cur).get("config") or {}
        if not getattr(t, "_explicit_config", False) and (
            scfg.get("stats_columns") or scfg.get("bloom_columns")
        ):
            t.stats_columns = list(scfg.get("stats_columns", []))
            t.bloom_columns = list(scfg.get("bloom_columns", []))
            t._explicit_config = True
        sm = src._manifest(cur)
        if not sm.get("schema"):
            raise ValueError(
                f"snapshot_sql: LIKE source {src_root!r} carries no "
                f"schema"
            )
        # the source schema stores PHYSICAL names; the new table gets
        # the LOGICAL view (it has no rename history of its own)
        phys = StructType.fromJson(sm["schema"])
        inv = {p: l for l, p in src._col_mapping(sm).items()}
        fields = [
            (inv.get(f.name, f.name), f.dataType) for f in phys.fields
        ]
        logical_schema = StructType()
        for lname, dtype in fields:
            logical_schema.add(lname, dtype)
        empty = spark.createDataFrame([], logical_schema)
        v = (
            t.overwrite(empty, _reset_properties=True)
            if replacing
            else t.append(empty)
        )
        for name, spec in sorted(src._table_identity().items()):
            v = t.add_identity_column(
                name, start=int(spec["start"]), step=int(spec["step"])
            )
        for name, expr in sorted(src._table_generated().items()):
            v = t.add_generated_column(name, expr)
        for name, expr in sorted(src._table_defaults().items()):
            v = t.set_column_default(name, expr)
        for name, expr in sorted(src._table_checks().items()):
            v = t.add_check_constraint(name, expr)
        cmts = src._raw_manifest(cur).get("comments", {})
        for name, text in sorted(cmts.items()):
            v = t.set_column_comment(name, text)
        layout = src._table_layout()
        if layout:
            v = t.set_table_layout(layout)
        props = src._table_properties()
        if props:
            v = t.set_table_properties(props)
        return v
    if tail.startswith("("):
        close = _matching_paren(tail)
        if close < 0:
            raise ValueError(
                "snapshot_sql: unterminated CREATE TABLE column list"
            )
        after = tail[close + 1 :].strip()
        layout, props, tcomment, after = _strip_create_clauses(after)
        query = None
        if after:
            m = re.match(r"^AS\s+", after, re.IGNORECASE)
            if not m:
                raise ValueError(
                    f"snapshot_sql: trailing text after the CREATE "
                    f"TABLE column list: {after[:60]!r}"
                )
            query = after[m.end() :]
        return _create_with_columns(
            spark, t, tail[1:close], query, replacing=replacing,
            layout=layout, props=props, tcomment=tcomment,
        )
    layout, props, tcomment, tail = _strip_create_clauses(tail)
    m = re.match(r"^AS\s+", tail, re.IGNORECASE)
    if not m:
        raise ValueError(
            "snapshot_sql: CREATE TABLE needs AS <query> or a "
            "(col TYPE ..., ...) column list"
        )
    df = spark.sql(tail[m.end() :])
    if layout:
        # mirror the column-list flow: commit the empty schema first,
        # declare the layout (validating keys against the schema),
        # then append the query rows PLACED by the declared layout
        empty = spark.createDataFrame([], df.schema)
        (
            t.overwrite(empty, _reset_properties=True)
            if replacing
            else t.append(empty)
        )
        t.set_table_layout(layout)
        v = t.append(df)
    elif replacing:
        v = t.overwrite(df, _reset_properties=True)
    else:
        v = t.append(df)
    if tcomment is not None:
        props = {**(props or {}), "comment": tcomment}
    if props:
        v = t.set_table_properties(props)
    return v


_COL_DEF_RE = re.compile(
    r"^\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s+"
    r"([A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*(.*)$",
    re.DOTALL,
)
_IDENTITY_RE = re.compile(
    r"^GENERATED\s+ALWAYS\s+AS\s+IDENTITY"
    r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)"
    r"(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?\s*$",
    re.IGNORECASE,
)


def _create_with_columns(
    spark,
    t: SnapshotTable,
    col_list: str,
    query: str | None,
    replacing: bool = False,
    layout: list[dict] | None = None,
    props: dict | None = None,
    tcomment: str | None = None,
) -> int:
    """Column-list CREATE TABLE: commit the declared schema as an
    empty v1, apply column properties via the add_* verbs, then append
    the optional AS-query rows. Each step is its own commit — the
    add_* verbs already own declare-before-first-write validation and
    CAS discipline; a mid-stream failure leaves a properties-only
    table with zero data rows (re-runnable by CREATE on a fresh root).
    Supported types are primitive (optionally parameterized, e.g.
    DECIMAL(10,2)); nested ARRAY/MAP/STRUCT declarations are refused
    with guidance (use plain CTAS — schemas come from the query)."""
    from pyspark.sql.types import StructType

    fields: list[str] = []
    seen: set[str] = set()
    generated: list[tuple[str, str]] = []
    identity: list[tuple[str, int, int]] = []
    checks: list[tuple[str, str]] = []
    defaults: list[tuple[str, str]] = []
    comments: list[tuple[str, str]] = []
    for item in _split_top_commas(col_list):
        item = item.strip()
        if not item:
            raise ValueError(
                "snapshot_sql: empty entry in CREATE TABLE column list"
            )
        cm = re.match(
            r"^CONSTRAINT\s+([A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\(",
            item,
            re.IGNORECASE,
        )
        if cm:
            open_p = item.index("(", cm.end() - 1)
            close_p = open_p + _matching_paren(item[open_p:])
            if close_p <= open_p or item[close_p + 1 :].strip():
                raise ValueError(
                    f"snapshot_sql: malformed CONSTRAINT entry {item!r}"
                )
            checks.append((cm.group(1), item[open_p + 1 : close_p].strip()))
            continue
        if "<" in item.split("(")[0]:
            raise NotImplementedError(
                f"snapshot_sql: nested types in CREATE TABLE column "
                f"lists are not supported ({item[:40]!r}) — use CREATE "
                f"TABLE '<root>' AS <query> (schemas come from the query)"
            )
        m = _COL_DEF_RE.match(item)
        if not m:
            raise ValueError(
                f"snapshot_sql: malformed column definition {item!r} — "
                f"expected 'name TYPE [GENERATED ALWAYS AS (..) | "
                f"GENERATED ALWAYS AS IDENTITY [(START WITH n "
                f"[INCREMENT BY k])] | CHECK (..) | DEFAULT <expr>] "
                f"[NOT NULL]'"
            )
        name, dtype, mods = m.group(1), m.group(2), m.group(3).strip()
        if name in seen:
            raise ValueError(
                f"snapshot_sql: duplicate column {name!r} in CREATE "
                f"TABLE list"
            )
        seen.add(name)
        fields.append(f"{name} {dtype}")
        # trailing COMMENT '<text>' suffix — LAST modifier by contract;
        # located with the quote-aware scanner so a DEFAULT literal
        # containing the word COMMENT can never be mistaken for it
        cpos = _scan_clauses(mods, {"COMMENT"})
        if cpos:
            _w, s0, e0 = cpos[-1]
            lm = re.fullmatch(
                r"\s*'((?:[^']|'')*)'\s*", mods[e0:], re.DOTALL
            )
            if not lm:
                raise ValueError(
                    f"snapshot_sql: COMMENT must be the last modifier "
                    f"of column {name!r} and take one quoted string, "
                    f"got {mods[s0:][:60]!r}"
                )
            comments.append((name, lm.group(1).replace("''", "'")))
            mods = mods[:s0].strip()
        # NOT NULL suffix -> an auto-named CHECK (SQL 3VL: `c IS NOT
        # NULL` is FALSE for NULL, so the staging audit enforces it)
        nn = re.search(r"\bNOT\s+NULL\s*$", mods, re.IGNORECASE)
        if nn:
            checks.append((f"{name}_not_null", f"`{name}` IS NOT NULL"))
            mods = mods[: nn.start()].strip()
        if not mods:
            continue
        im = _IDENTITY_RE.match(mods)
        if im:
            identity.append(
                (
                    name,
                    int(im.group(1)) if im.group(1) else 1,
                    int(im.group(2)) if im.group(2) else 1,
                )
            )
            continue
        gm = re.match(
            r"^GENERATED\s+ALWAYS\s+AS\s*\(", mods, re.IGNORECASE
        )
        if gm:
            open_p = mods.index("(", gm.end() - 1)
            close_p = open_p + _matching_paren(mods[open_p:])
            if close_p <= open_p or mods[close_p + 1 :].strip():
                raise ValueError(
                    f"snapshot_sql: malformed GENERATED ALWAYS AS "
                    f"entry for column {name!r}: {mods!r}"
                )
            generated.append((name, mods[open_p + 1 : close_p].strip()))
            continue
        km = re.match(r"^CHECK\s*\(", mods, re.IGNORECASE)
        if km:
            open_p = mods.index("(", km.end() - 1)
            close_p = open_p + _matching_paren(mods[open_p:])
            if close_p <= open_p or mods[close_p + 1 :].strip():
                raise ValueError(
                    f"snapshot_sql: malformed CHECK entry for column "
                    f"{name!r}: {mods!r}"
                )
            checks.append(
                (f"{name}_check", mods[open_p + 1 : close_p].strip())
            )
            continue
        dm = re.match(r"^DEFAULT\s+(.+)$", mods, re.IGNORECASE | re.DOTALL)
        if dm:
            defaults.append((name, dm.group(1).strip()))
            continue
        raise ValueError(
            f"snapshot_sql: unsupported column modifier for {name!r}: "
            f"{mods[:60]!r}"
        )
    if not fields:
        raise ValueError("snapshot_sql: CREATE TABLE column list is empty")
    try:
        schema = StructType.fromDDL(", ".join(fields))
    except Exception as e:
        raise ValueError(
            f"snapshot_sql: bad CREATE TABLE column types "
            f"({', '.join(fields)!r}): {e}"
        ) from None
    # a generated expression must ANALYZE against the NON-generated
    # declared columns only (Delta's rule: generated expressions may
    # reference only non-generated, non-identity columns — a
    # cross-reference would make the write-time fill order-dependent,
    # the r14 verdict finding #1) and produce the declared type
    # (Delta refuses the mismatch at declare — failing here beats a
    # confusing schema-evolution error at the first write)
    computed_names = {n for n, _ in generated} | {n for n, _s, _k in identity}
    for name, expr in generated:
        base_cols = [
            f.name for f in schema.fields if f.name not in computed_names
        ]
        try:
            probe = spark.createDataFrame([], schema).select(
                *base_cols,
            ).selectExpr(f"({expr}) AS __gen_probe")
        except Exception as e:
            # distinguish the refusal shapes: an expression that DOES
            # analyze once the other computed columns are visible is a
            # generated-on-generated cross-reference (refused with
            # guidance); anything else is plain bad SQL
            try:
                spark.createDataFrame([], schema).select(
                    *[f.name for f in schema.fields if f.name != name],
                ).selectExpr(f"({expr}) AS __gen_probe")
            except Exception:
                raise ValueError(
                    f"snapshot_sql: GENERATED expression for {name!r} "
                    f"does not analyze against the declared columns: {e}"
                ) from None
            raise ValueError(
                f"snapshot_sql: GENERATED column {name!r} references "
                f"another GENERATED/IDENTITY column — generated "
                f"expressions may reference only non-generated columns "
                f"(inline the referenced definition instead)"
            ) from None
        got = probe.schema[0].dataType
        want = schema[name].dataType
        if got != want:
            raise ValueError(
                f"snapshot_sql: GENERATED column {name!r} is declared "
                f"{want.simpleString()} but the expression produces "
                f"{got.simpleString()} — declare the matching type or "
                f"CAST inside the expression"
            )
    # v1: the declared schema, zero rows (the staging path keeps one
    # schema-carrying empty file) — the add_* verbs then see every
    # declared column and validate against zero rows, the
    # declare-before-first-write shape they are built for. OR REPLACE
    # overwrites instead: the empty-schema commit also CLEARS the
    # previous definition's governance (checks/generated/identity/
    # defaults) before the new declarations land.
    empty = spark.createDataFrame([], schema)
    v = (
        t.overwrite(empty, _reset_properties=True)
        if replacing
        else t.append(empty)
    )
    for name, expr in generated:
        v = t.add_generated_column(name, expr)
    for name, start, step in identity:
        v = t.add_identity_column(name, start=start, step=step)
    for name, expr in checks:
        v = t.add_check_constraint(name, expr)
    for name, expr in defaults:
        v = t.set_column_default(name, expr)
    for name, text in comments:
        v = t.set_column_comment(name, text)
    if layout:
        # declared AFTER governance (set_table_layout validates
        # transform keys against generated/identity definitions) and
        # BEFORE the AS-query rows, which it places
        v = t.set_table_layout(layout)
    if tcomment is not None:
        props = {**(props or {}), "comment": tcomment}
    if props:
        v = t.set_table_properties(props)
    if query is not None:
        v = t.append(spark.sql(query))
    return v
