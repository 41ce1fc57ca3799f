"""SQL DML front for versioned tables (round 13).

The reference's entire execution surface is per-table ``UPDATE "table"
SET "col" = expr`` statements (``src/executor/query-builder.ts:58-61``
builds them, ``src/executor/executor.ts:45-85`` runs them inside one
transaction).  Round 12's ``--sql`` mode ran SELECTs, but Spark's
analyzer refuses ``UPDATE`` / ``DELETE`` / ``MERGE INTO`` against temp
views — so the one statement class the reference exists for could not
run through the SQL face.  This module closes that gap: a small quote-
and paren-aware statement front that maps the three DML shapes onto the
versioned table's NATIVE ops —

    ``UPDATE v SET c = e, ... [WHERE p]``  → :meth:`VersionedTable.update_where`
    ``DELETE FROM v [WHERE p]``            → :meth:`VersionedTable.delete_where`
    ``INSERT INTO v [(cols)] VALUES|query``→ :meth:`VersionedTable.append`
    ``MERGE INTO v USING s ON ... WHEN``   → :meth:`VersionedTable.merge`

so the statement lands as ONE commit in the table's log — CDF-visible,
OCC-rebased, constraint-checked, file-skipped — with time travel below
it intact.  Expressions (SET values, WHERE predicates, merge clause
conditions) pass through to Spark SQL verbatim; only the statement
SKELETON is parsed here, so the full Spark expression language works
inside every slot.

Scope contract — refusals are loud, never silent:

- the target must be a ``--versionedTable`` view registered WITHOUT a
  version/timestamp pin (writing "into the past" is refused, exactly as
  Delta refuses DML on a time-travel read);
- DML against a plain ``--data`` parquet view is refused with a hint
  (parquet files are immutable; the commit log is what makes DML atomic
  and auditable);
- MERGE's ON condition must CONTAIN the key-equality conjunction of
  the target's declared key (the native merge joins on the key).
  Additional conjuncts — Delta's residual-ON shape, ``ON t.id = s.id
  AND t.region = 'EU'`` — are honored by threading them into the
  clause conditions (round 14): matched clauses fire only where the
  residual holds, and a key-matched pair FAILING the residual is "not
  matched by source" under full-ON semantics (the target key is
  unique, so no other source row can match it) — the BY SOURCE clauses
  apply to it.  One documented deviation: ``WHEN NOT MATCHED ... THEN
  INSERT`` stays keyed on the KEY equality alone — a source row whose
  key exists in the target never inserts, because the table's
  key-uniqueness contract forbids the duplicate key Delta would write
  there.  An ON that does not contain the full key equality is still
  refused with the expected shape in the message;
- statement-boundary keywords (``WHEN [NOT] MATCHED``, ``THEN UPDATE/
  DELETE/INSERT``) are matched outside quotes and parens, so CASE WHEN
  expressions inside SET values or conditions parse through unharmed.

Parsing is deliberately a scanner, not a SQL grammar: the four statement
shapes are fixed, everything inside an expression slot is Spark's
problem, and a malformed skeleton raises :class:`SqlDmlError` with the
supported grammar in the message.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["SqlDmlError", "classify_dml", "execute_dml"]


class SqlDmlError(ValueError):
    """A DML statement we refuse to run — malformed skeleton, wrong
    target class, or semantics the native ops cannot honor."""


# --------------------------------------------------------------------------
# scanner: quote- and paren-aware masks over the raw statement text
# --------------------------------------------------------------------------

def _mask(s: str) -> list[tuple[int, bool]]:
    """Per-character ``(paren_depth, is_code)`` — ``is_code`` False inside
    ``'...'`` (with ``''`` escape), ``"..."`` and backtick literals.  The
    mask is what lets every keyword search below mean *top-level
    keyword*, so a comma inside ``concat(a, b)`` or a WHERE inside a
    string never splits the skeleton."""
    out: list[tuple[int, bool]] = [None] * len(s)  # type: ignore[list-item]
    depth = 0
    quote: str | None = None
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if quote is not None:
            out[i] = (depth, False)
            if c == quote:
                if quote == "'" and i + 1 < n and s[i + 1] == "'":
                    out[i + 1] = (depth, False)
                    i += 2
                    continue
                quote = None
            i += 1
            continue
        if c in "'\"`":
            quote = c
            out[i] = (depth, False)
        elif c == "(":
            out[i] = (depth, True)
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
            out[i] = (depth, True)
        else:
            out[i] = (depth, True)
        i += 1
    return out


def _find(s: str, mask, pattern: str, start: int = 0) -> "re.Match | None":
    """First top-level (depth-0, outside-string) match of ``pattern``."""
    for m in re.compile(pattern, re.I).finditer(s, start):
        d, code = mask[m.start()]
        if d == 0 and code:
            return m
    return None


def _find_all(s: str, mask, pattern: str) -> list["re.Match"]:
    return [
        m
        for m in re.compile(pattern, re.I).finditer(s)
        if mask[m.start()] == (0, True)
    ]


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on top-level ``sep`` characters (never inside quotes/parens)."""
    mask = _mask(s)
    parts, last = [], 0
    for i, c in enumerate(s):
        if c == sep and mask[i] == (0, True):
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return parts


_IDENT = r'(?:[A-Za-z_][\w$]*|`[^`]+`|"[^"]+")'


def _unquote(ident: str) -> str:
    ident = ident.strip()
    if len(ident) >= 2 and ident[0] == ident[-1] and ident[0] in '`"':
        return ident[1:-1]
    return ident


def _requalify(expr: str, mapping: dict[str, str]) -> str:
    """Rewrite ``alias.`` qualifiers to canonical ones (``t.`` / ``s.`` for
    merge clauses, ``''`` to strip the target's self-qualifier) — single
    simultaneous pass, word-bounded, never inside string literals."""
    if not mapping:
        return expr
    mask = _mask(expr)
    lower = {k.lower(): v for k, v in mapping.items()}
    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in mapping) + r")\s*\.\s*",
        re.I,
    )

    def sub(m: "re.Match") -> str:
        if not mask[m.start()][1]:  # inside a string literal: keep
            return m.group(0)
        repl = lower[m.group(1).lower()]
        return repl + "." if repl else ""

    return pat.sub(sub, expr)


# --------------------------------------------------------------------------
# statement skeletons
# --------------------------------------------------------------------------

@dataclass
class _Update:
    table: str
    assignments: dict[str, str] = field(default_factory=dict)
    predicate: str | None = None


@dataclass
class _Delete:
    table: str
    predicate: str | None = None


@dataclass
class _Insert:
    table: str
    columns: "list[str] | None"          # None = positional full schema
    values: "list[list[str]] | None"     # VALUES rows of exprs, or
    query: "str | None"                  # ... a SELECT/WITH source
    overwrite: bool = False              # INSERT OVERWRITE (round 14)


@dataclass
class _Merge:
    target: str
    target_alias: str
    source_sql: str          # "TABLE name" or a full subquery SELECT
    source_is_query: bool
    source_alias: str
    on: str
    matched: list[tuple] = field(default_factory=list)
    not_matched: list[tuple] = field(default_factory=list)
    by_source: list[tuple] = field(default_factory=list)


def classify_dml(stmt: str) -> str | None:
    """'update' | 'delete' | 'merge' | 'insert' when the statement is one
    of the DML shapes, else None (caller falls through to ``spark.sql``)."""
    head = re.match(r"\s*(UPDATE|DELETE|MERGE|INSERT)\b", stmt, re.I)
    return head.group(1).lower() if head else None


def _strip_stmt(stmt: str) -> str:
    stmt = stmt.strip()
    if stmt.endswith(";"):
        stmt = stmt[:-1].rstrip()
    return stmt


_GRAMMAR = (
    "supported DML grammar:\n"
    "  UPDATE <view> SET col = expr [, ...] [WHERE <pred>]\n"
    "  DELETE FROM <view> [WHERE <pred>]\n"
    "  INSERT INTO <view> [(cols)] VALUES (exprs) [, ...] | <query>\n"
    "  INSERT OVERWRITE [TABLE] <view> [(cols)] VALUES ... | <query>\n"
    "  MERGE INTO <view> [AS] t USING (<query>|<view>) [AS] s ON <key equality [AND residual]>\n"
    "    WHEN MATCHED [AND c] THEN UPDATE SET ...|SET *|DELETE\n"
    "    WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT (cols) VALUES (exprs)|INSERT *\n"
    "    WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ...|DELETE"
)


def _parse_assignments(seg: str, strip_quals: tuple[str, ...]) -> dict[str, str]:
    """``col = expr, ...`` — column names may carry the target qualifier
    (``t.col``); expressions pass through verbatim."""
    out: dict[str, str] = {}
    for item in _split_top(seg):
        m = re.match(
            r"\s*(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")\s*=\s*(.+)$",
            item,
            re.S,
        )
        if not m:
            raise SqlDmlError(
                f"malformed SET assignment {item.strip()!r}; expected "
                f"col = expr\n{_GRAMMAR}"
            )
        qual, col, expr = m.groups()
        if qual is not None and _unquote(qual).lower() not in strip_quals:
            raise SqlDmlError(
                f"SET column {item.strip()!r} is qualified by "
                f"{_unquote(qual)!r}, which is not the target table/alias"
            )
        col_name = _unquote(col)
        if col_name in out:
            raise SqlDmlError(f"column {col_name!r} assigned twice in SET")
        out[col_name] = expr.strip()
    if not out:
        raise SqlDmlError("SET list is empty")
    return out


def _parse_update(stmt: str) -> _Update:
    stmt = _strip_stmt(stmt)
    mask = _mask(stmt)
    m = re.match(r"\s*UPDATE\s+(" + _IDENT + r")\s+SET\b", stmt, re.I)
    if not m:
        raise SqlDmlError(
            "unsupported UPDATE shape (aliases and multi-table UPDATE are "
            f"out of scope)\n{_GRAMMAR}"
        )
    table = _unquote(m.group(1))
    rest_at = m.end()
    w = _find(stmt, mask, r"\bWHERE\b", rest_at)
    set_seg = stmt[rest_at : w.start()] if w else stmt[rest_at:]
    pred = stmt[w.end() :].strip() if w else None
    if w and not pred:
        raise SqlDmlError("WHERE with an empty predicate")
    quals = (table.lower(),)
    assigns = {
        c: _requalify(e, {table: ""})
        for c, e in _parse_assignments(set_seg, quals).items()
    }
    return _Update(table, assigns, _requalify(pred, {table: ""}) if pred else None)


def _parse_delete(stmt: str) -> _Delete:
    stmt = _strip_stmt(stmt)
    mask = _mask(stmt)
    m = re.match(r"\s*DELETE\s+FROM\s+(" + _IDENT + r")\s*", stmt, re.I)
    if not m:
        raise SqlDmlError(f"unsupported DELETE shape\n{_GRAMMAR}")
    table = _unquote(m.group(1))
    rest = stmt[m.end() :].strip()
    if not rest:
        return _Delete(table, None)
    w = _find(stmt, mask, r"\bWHERE\b", m.end())
    if not w or stmt[m.end() : w.start()].strip():
        raise SqlDmlError(
            "unsupported DELETE shape (aliases are out of scope)\n" + _GRAMMAR
        )
    pred = stmt[w.end() :].strip()
    if not pred:
        raise SqlDmlError("WHERE with an empty predicate")
    return _Delete(table, _requalify(pred, {table: ""}))


def _parse_insert(stmt: str) -> _Insert:
    stmt = _strip_stmt(stmt)
    m = re.match(
        r"\s*INSERT\s+(INTO|OVERWRITE(?:\s+TABLE)?)\s+(" + _IDENT + r")\s*",
        stmt, re.I,
    )
    if not m:
        raise SqlDmlError(f"unsupported INSERT shape\n{_GRAMMAR}")
    overwrite = m.group(1).upper() != "INTO"
    table = _unquote(m.group(2))
    rest = stmt[m.end() :].lstrip()
    columns: list[str] | None = None
    if rest.startswith("("):
        rmask = _mask(rest)
        close = next(
            (i for i, c in enumerate(rest) if c == ")" and rmask[i] == (0, True)),
            -1,
        )
        if close < 0:
            raise SqlDmlError(f"unbalanced parens in INSERT column list")
        inner = rest[1:close]
        head = rest[close + 1 :].lstrip()
        # "(cols) VALUES/SELECT ..." vs a bare "(SELECT ...)" source: a
        # column list is a plain comma list of identifiers
        if re.fullmatch(
            r"\s*" + _IDENT + r"(\s*,\s*" + _IDENT + r")*\s*", inner
        ) and re.match(r"(VALUES|SELECT|WITH|TABLE)\b", head, re.I):
            columns = [_unquote(c) for c in _split_top(inner)]
            if len(set(columns)) != len(columns):
                raise SqlDmlError("duplicate column in INSERT list")
            rest = head
    vm = re.match(r"VALUES\b", rest, re.I)
    if not vm:
        if not rest:
            raise SqlDmlError(f"INSERT needs VALUES or a query\n{_GRAMMAR}")
        return _Insert(table, columns, None, rest, overwrite)
    body = rest[vm.end() :]
    rows: list[list[str]] = []
    for grp in _split_top(body):
        g = grp.strip()
        if not (g.startswith("(") and g.endswith(")")):
            raise SqlDmlError(
                f"malformed VALUES row {g!r}; expected (expr, ...)"
            )
        row = [e.strip() for e in _split_top(g[1:-1])]
        if rows and len(row) != len(rows[0]):
            raise SqlDmlError("VALUES rows have inconsistent arity")
        rows.append(row)
    if not rows or not rows[0]:
        raise SqlDmlError("empty VALUES list")
    if columns is not None and len(columns) != len(rows[0]):
        raise SqlDmlError(
            f"INSERT arity mismatch: {len(columns)} columns, "
            f"{len(rows[0])} values per row"
        )
    return _Insert(table, columns, rows, None, overwrite)


def _parse_name_alias(seg: str, what: str) -> tuple[str, str]:
    """``name [[AS] alias]`` → (name, qualifier); qualifier defaults to
    the name itself (SQL's rule when no alias is given)."""
    toks = seg.split()
    if len(toks) == 3 and toks[1].upper() == "AS":
        toks = [toks[0], toks[2]]
    if len(toks) == 1:
        name = _unquote(toks[0])
        return name, name
    if len(toks) == 2:
        return _unquote(toks[0]), _unquote(toks[1])
    raise SqlDmlError(f"malformed {what} spec {seg.strip()!r}\n{_GRAMMAR}")


_CLAUSE_BOUNDARY = (
    r"\bWHEN\s+(?:(NOT)\s+)?MATCHED(?:\s+BY\s+(TARGET|SOURCE))?\b"
)


def _parse_merge_action(body: str, requal: dict[str, str],
                        set_quals: tuple[str, ...]):
    """``[AND cond] THEN action`` → (cond|None, action_kind, payload)."""
    mask = _mask(body)
    t = _find(body, mask, r"\bTHEN\s+(UPDATE|DELETE|INSERT)\b")
    if not t:
        raise SqlDmlError(
            f"merge clause missing THEN UPDATE/DELETE/INSERT: "
            f"{body.strip()!r}\n{_GRAMMAR}"
        )
    cond_seg = body[: t.start()].strip()
    cond: str | None = None
    if cond_seg:
        am = re.match(r"AND\b(.*)$", cond_seg, re.I | re.S)
        if not am or not am.group(1).strip():
            raise SqlDmlError(
                f"expected [AND <condition>] THEN, got {cond_seg!r}"
            )
        cond = _requalify(am.group(1).strip(), requal)
    kind = t.group(1).upper()
    action = body[t.end() :].strip()
    if kind == "DELETE":
        if action:
            raise SqlDmlError(f"DELETE takes no arguments, got {action!r}")
        return cond, "delete", None
    if kind == "UPDATE":
        um = re.match(r"SET\b(.*)$", action, re.I | re.S)
        if not um:
            raise SqlDmlError(f"expected UPDATE SET ..., got {action!r}")
        seg = um.group(1).strip()
        if seg == "*":
            return cond, "update", None  # updateAll
        assigns = {
            c: _requalify(e, requal)
            for c, e in _parse_assignments(seg, set_quals).items()
        }
        return cond, "update", assigns
    # INSERT
    if action == "*":
        return cond, "insert", None  # insertAll
    im = re.match(r"\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)\s*$",
                  action, re.I | re.S)
    if not im:
        raise SqlDmlError(
            f"expected INSERT * or INSERT (cols) VALUES (exprs), got "
            f"{action!r}"
        )
    cols = [_unquote(c) for c in _split_top(im.group("cols"))]
    vals = [v.strip() for v in _split_top(im.group("vals"))]
    if len(cols) != len(vals) or not cols or any(not c.strip() for c in cols):
        raise SqlDmlError(
            f"INSERT column/value arity mismatch: {len(cols)} cols, "
            f"{len(vals)} values"
        )
    values = {c: _requalify(v, requal) for c, v in zip(cols, vals)}
    if len(values) != len(cols):
        raise SqlDmlError("duplicate column in INSERT list")
    return cond, "insert", values


def _parse_merge(stmt: str) -> _Merge:
    stmt = _strip_stmt(stmt)
    mask = _mask(stmt)
    head = re.match(r"\s*MERGE\s+INTO\b", stmt, re.I)
    if not head:
        raise SqlDmlError(f"unsupported MERGE shape\n{_GRAMMAR}")
    using = _find(stmt, mask, r"\bUSING\b", head.end())
    on = _find(stmt, mask, r"\bON\b", using.end()) if using else None
    first_when = _find(stmt, mask, _CLAUSE_BOUNDARY, on.end()) if on else None
    if not (using and on and first_when):
        raise SqlDmlError(
            "MERGE must carry USING ... ON ... and at least one WHEN "
            f"clause\n{_GRAMMAR}"
        )
    target, talias = _parse_name_alias(stmt[head.end() : using.start()], "target")
    src_seg = stmt[using.end() : on.start()].strip()
    if src_seg.startswith("("):
        # subquery source: find its matching close paren, then the alias
        smask = _mask(src_seg)
        close = next(
            (i for i, c in enumerate(src_seg)
             if c == ")" and smask[i] == (0, True)),
            -1,
        )
        if close < 0:
            raise SqlDmlError(f"unbalanced parens in USING {src_seg!r}")
        inner = src_seg[1:close].strip()
        tail = src_seg[close + 1 :].strip()
        am = re.match(r"(?:AS\s+)?(" + _IDENT + r")\s*$", tail, re.I)
        if not am:
            raise SqlDmlError(
                "a subquery source needs an alias: USING (<query>) [AS] s"
            )
        source_sql, src_is_query, salias = inner, True, _unquote(am.group(1))
    else:
        name, salias = _parse_name_alias(src_seg, "source")
        source_sql, src_is_query = name, False
    on_cond = stmt[on.end() : first_when.start()].strip()
    if talias.lower() == salias.lower():
        raise SqlDmlError(
            f"target and source qualifiers collide ({talias!r}); alias one"
        )

    requal = {talias: "t", salias: "s"}
    # a SET column names a TARGET column: bare or target-qualified only
    set_quals = (talias.lower(), "t")
    merge = _Merge(
        target, talias, source_sql, src_is_query, salias, on_cond
    )
    bounds = _find_all(stmt, mask, _CLAUSE_BOUNDARY)
    bounds = [b for b in bounds if b.start() >= first_when.start()]
    for i, b in enumerate(bounds):
        end = bounds[i + 1].start() if i + 1 < len(bounds) else len(stmt)
        body = stmt[b.end() : end]
        is_not = b.group(1) is not None
        by = (b.group(2) or "").upper()
        if not is_not and by:
            raise SqlDmlError("WHEN MATCHED takes no BY qualifier")
        cond, kind, payload = _parse_merge_action(body, requal, set_quals)
        if not is_not:  # WHEN MATCHED
            if kind == "insert":
                raise SqlDmlError("WHEN MATCHED cannot INSERT")
            merge.matched.append(
                (kind, cond, payload) if kind == "update" else (kind, cond)
            )
        elif by == "SOURCE":  # WHEN NOT MATCHED BY SOURCE
            if kind == "insert":
                raise SqlDmlError("WHEN NOT MATCHED BY SOURCE cannot INSERT")
            merge.by_source.append(
                (kind, cond, payload) if kind == "update" else (kind, cond)
            )
        else:  # WHEN NOT MATCHED [BY TARGET]
            if kind != "insert":
                raise SqlDmlError("WHEN NOT MATCHED can only INSERT")
            merge.not_matched.append((kind, cond, payload))
    return merge


def _parse_on_keys(
    on: str, talias: str, salias: str, key_cols: tuple
) -> tuple[dict[str, str], list[str]]:
    """Split the ON condition into the key-equality conjunction and the
    residual (round 14 — Delta accepts arbitrary ON; the native merge
    joins on the declared key, so the residual is threaded into clause
    conditions by the caller).  Returns ``({target_key_col: source_col},
    [residual conjuncts requalified to t./s.])``.  An ON that does not
    CONTAIN the full key equality is refused — without it, "matched"
    would silently mean something other than what the key-joined native
    merge computes."""
    expected = " AND ".join(f"{talias}.{k} = {salias}.{k}" for k in key_cols)
    requal = {talias: "t", salias: "s"}
    pairs: dict[str, str] = {}
    residual: list[str] = []
    key_set = {str(k) for k in key_cols}
    for conj in _split_top_and(on):
        m = re.match(
            r"\s*\(?\s*(" + _IDENT + r")\s*\.\s*(" + _IDENT + r")\s*=\s*("
            + _IDENT + r")\s*\.\s*(" + _IDENT + r")\s*\)?\s*$",
            conj,
        )
        if m:
            q1, c1, q2, c2 = (_unquote(g) for g in m.groups())
            side = {talias.lower(): "t", salias.lower(): "s"}
            s1, s2 = side.get(q1.lower()), side.get(q2.lower())
            if s1 is not None and s2 is not None and s1 != s2:
                tcol, scol = (c1, c2) if s1 == "t" else (c2, c1)
                if tcol in key_set and tcol not in pairs:
                    pairs[tcol] = scol
                    continue
                # a qualified equality on a non-key column (or a repeat
                # of a key column) is an ordinary residual conjunct
        residual.append(_requalify(conj.strip(), requal))
    if set(pairs) != key_set:
        raise SqlDmlError(
            f"merge ON must contain the key-equality conjunction for the "
            f"table key {list(key_cols)}; got target key columns "
            f"{sorted(pairs)}. Expected: ON {expected} [AND <residual>]"
        )
    return pairs, residual


#: SQL single-quoted literal with standard '' escaping — the
#: TBLPROPERTIES key/value grammar (round 14)
_SQ_LIT = r"'((?:[^']|'')*)'"


def _sq_quote(s: str) -> str:
    """Render a string as a SQL single-quoted literal ('' escaping)."""
    return "'" + str(s).replace("'", "''") + "'"


def _sq_unquote(body: str) -> str:
    """Inverse of :func:`_sq_quote` for the regex GROUP (quotes already
    stripped by the match)."""
    return body.replace("''", "'")


def _split_top_and(s: str) -> list[str]:
    mask = _mask(s)
    cuts = [m for m in re.compile(r"\bAND\b", re.I).finditer(s)
            if mask[m.start()] == (0, True)]
    # a top-level AND that pairs with a preceding top-level BETWEEN is
    # the BETWEEN's own connective, not a conjunction boundary
    betweens = [m.start() for m in re.compile(r"\bBETWEEN\b", re.I).finditer(s)
                if mask[m.start()] == (0, True)]
    real_cuts, bi = [], 0
    for m in cuts:
        if bi < len(betweens) and betweens[bi] < m.start():
            bi += 1  # this AND closes that BETWEEN
            continue
        real_cuts.append(m)
    parts, last = [], 0
    for m in real_cuts:
        parts.append(s[last : m.start()])
        last = m.end()
    parts.append(s[last:])
    return parts


_NUM_LIT = r"-?\d+(?:\.\d+)?"
_STR_LIT = r"'(?:[^']|'')*'"
_LIT = rf"(?:{_NUM_LIT}|{_STR_LIT})"


def _lit_value(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    return float(tok) if "." in tok else int(tok)


def derive_prune(pred: str) -> dict:
    """Derive ``{col: (lo, hi) | "isnull" | "notnull"}`` file-skipping
    hints IMPLIED by a SQL predicate — what Delta does when it compiles
    data skipping from the WHERE clause, rendered for the native ops'
    ``prune=`` vocabulary (round 13: a scoped SQL UPDATE/DELETE must
    cost O(files containing matches), not O(table)).

    One-sided by construction: only top-level AND conjuncts of the
    shapes ``col <op> literal``, ``literal <op> col``, ``col BETWEEN a
    AND b``, ``col IN (literals)``, ``col IS [NOT] NULL`` contribute;
    anything else (ORs, functions, subqueries, column-to-column) is
    simply not pruned on. A top-level OR disables derivation entirely
    (the statement is a disjunction — no conjunct is implied). The
    native ops additionally conjoin the prune into the row predicate
    (their documented self-consistency contract), so a derived hint can
    narrow a read but never split semantics."""
    mask = _mask(pred)
    if any(
        mask[m.start()] == (0, True)
        for m in re.compile(r"\bOR\b", re.I).finditer(pred)
    ):
        return {}
    out: dict = {}
    unprunable: set = set()

    def _narrow(col: str, lo, hi):
        if col in unprunable:
            return
        cur = out.get(col)
        if isinstance(cur, str):
            cur = (None, None)
        clo, chi = cur if cur else (None, None)
        try:
            if lo is not None:
                clo = lo if clo is None else max(clo, lo)
            if hi is not None:
                chi = hi if chi is None else min(chi, hi)
        except TypeError:
            # mixed-literal-type bounds on one column (e.g. "c <= 5 AND
            # c <= 'x'") are not orderable here — drop the column from
            # pruning entirely (conservative, round-14 advice fix: an
            # uncaught TypeError escaped execute_dml past the CLI's
            # except clause and skipped the rollback path)
            unprunable.add(col)
            out.pop(col, None)
            return
        out[col] = (clo, chi)

    ident = r"(?:[A-Za-z_][\w$]*|`[^`]+`|\"[^\"]+\")"
    for raw in _split_top_and(pred):
        c = raw.strip()
        while c.startswith("(") and c.endswith(")") and _mask(c)[len(c) - 1] == (0, True):
            inner = c[1:-1].strip()
            if not inner:
                break
            c = inner
        m = re.fullmatch(
            rf"({ident})\s*(=|==|<=|>=|<|>)\s*({_LIT})", c
        ) or re.fullmatch(
            rf"({_LIT})\s*(=|==|<=|>=|<|>)\s*({ident})", c
        )
        if m:
            a, op, b = m.groups()
            col_first = re.fullmatch(ident, a) is not None
            col = _unquote(a if col_first else b)
            val = _lit_value(b if col_first else a)
            if not col_first:  # 5 < col  ≡  col > 5
                op = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op, op)
            if op in ("=", "=="):
                _narrow(col, val, val)
            elif op in ("<", "<="):
                _narrow(col, None, val)
            else:
                _narrow(col, val, None)
            continue
        m = re.fullmatch(
            rf"({ident})\s+BETWEEN\s+({_LIT})\s+AND\s+({_LIT})", c, re.I
        )
        if m:
            col, lo, hi = m.groups()
            _narrow(_unquote(col), _lit_value(lo), _lit_value(hi))
            continue
        m = re.fullmatch(
            rf"({ident})\s+IN\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)", c, re.I
        )
        if m:
            vals = [_lit_value(v) for v in _split_top(m.group(2))]
            try:
                _narrow(_unquote(m.group(1)), min(vals), max(vals))
            except TypeError:
                pass  # mixed-type literal list: not prunable
            continue
        m = re.fullmatch(
            rf"({ident})\s+LIKE\s+'(?P<pat>(?:[^'%_]|'')*)%'", c, re.I
        )
        if m:
            # plain-prefix LIKE: 'abc%' implies 'abc' <= col < 'abd'
            # (Delta-style truncation-increment: bump the last
            # incrementable char; EVERY string with prefix 'abc' sorts
            # strictly below 'abd', so the inclusive hi is one-sided-
            # sound). Round-14 advice fix: the old prefix+U+10FFFF upper
            # bound was NOT implied by the predicate — a value
            # 'abc\U0010FFFFx' matches LIKE 'abc%' but sorts above it,
            # and since prune ranges conjoin into the row predicate that
            # silently skipped matching rows. (No _ or interior % in the
            # prefix — anything else is not a pure prefix test and
            # contributes nothing.)
            prefix = m.group("pat").replace("''", "'")
            if prefix:
                hi = None
                for k in range(len(prefix) - 1, -1, -1):
                    if ord(prefix[k]) < 0x10FFFF:
                        hi = prefix[:k] + chr(ord(prefix[k]) + 1)
                        break
                _narrow(_unquote(m.group(1)), prefix, hi)
            continue
        m = re.fullmatch(rf"({ident})\s+IS\s+(NOT\s+)?NULL", c, re.I)
        if m and _unquote(m.group(1)) not in out:
            out[_unquote(m.group(1))] = (
                "notnull" if m.group(2) else "isnull"
            )
    return out


# --------------------------------------------------------------------------
# execution
# --------------------------------------------------------------------------

#: bounded-driver-collect cap for IN (SELECT ...) materialization —
#: the same order as versioned.ISIN_LITERAL_CAP's philosophy. Round 14:
#: beyond the cap the statement no longer refuses — a conjunct-level
#: ``col [NOT] IN (SELECT ...)`` runs as a DISTRIBUTED semi-join through
#: the native ops' ``membership`` parameter instead (never collected).
IN_SUBQUERY_CAP = 10_000


class _OversizedInSubquery(Exception):
    """Internal signal: an IN-subquery exceeded IN_SUBQUERY_CAP.
    Carries what :func:`_resolve_in_subqueries` needs to decide whether
    the term can run as a membership semi-join."""

    def __init__(self, span: tuple[int, int], operand: str, sub: str,
                 negated: bool):
        super().__init__("oversized IN-subquery")
        self.span = span          # [start, end) of operand..close-paren
        self.operand = operand    # text of the left operand
        self.sub = sub            # the subquery SQL
        self.negated = negated


def _materialize_in_subqueries(spark, pred: str) -> str:
    """Rewrite every ``[NOT] IN (SELECT ...)`` inside ``pred`` into a
    LITERAL value list by running the subquery (round 13) — the GDPR
    shape ``UPDATE t SET ... WHERE id IN (SELECT id FROM revoked)``
    cannot ride ``F.expr`` (no subquery resolution outside spark.sql),
    so the statement front evaluates the one-column subquery and splices
    the values back as SQL literals. Semantics are EXACT, including SQL
    three-valued logic: collected NULLs are rendered as literal NULL
    (``x NOT IN (1, NULL)`` keeps its UNKNOWN behavior). Bounded: more
    than :data:`IN_SUBQUERY_CAP` values is refused with guidance to use
    MERGE (a join, not a literal). An empty result renders the standard
    empty-IN identities (``IN`` → FALSE, ``NOT IN`` → TRUE)."""
    mask = _mask(pred)
    out, i = [], 0
    pat = re.compile(r"\b(NOT\s+)?IN\s*\(\s*(?:SELECT|WITH)\b", re.I)
    while True:
        m = pat.search(pred, i)
        if not m:
            out.append(pred[i:])
            break
        if not mask[m.start()][1]:  # inside a string literal
            out.append(pred[i : m.end()])
            i = m.end()
            continue
        negated = m.group(1) is not None
        open_idx = pred.index("(", m.start())
        depth_at_open = mask[open_idx][0]
        close = next(
            (
                j
                for j in range(open_idx + 1, len(pred))
                if pred[j] == ")" and mask[j] == (depth_at_open, True)
            ),
            -1,
        )
        if close < 0:
            raise SqlDmlError(f"unbalanced parens in IN-subquery: {pred!r}")
        sub = pred[open_idx + 1 : close].strip()
        rows = spark.sql(sub).limit(IN_SUBQUERY_CAP + 1).collect()
        if len(rows) > IN_SUBQUERY_CAP:
            op_start = _operand_start(pred, mask, m.start())
            raise _OversizedInSubquery(
                (op_start, close + 1),
                pred[op_start : m.start()].strip(),
                sub,
                negated,
            )
        if rows and len(rows[0]) != 1:
            raise SqlDmlError("IN-subquery must select exactly one column")
        lits = []
        for r in rows:
            v = r[0]
            if v is None:
                lits.append("NULL")
            elif isinstance(v, bool):
                lits.append("TRUE" if v else "FALSE")
            elif isinstance(v, (int, float)):
                lits.append(repr(v))
            else:
                lits.append("'" + str(v).replace("'", "''") + "'")
        if lits:
            out.append(pred[i : m.start()])
            out.append(
                ("NOT " if negated else "") + "IN (" + ", ".join(lits) + ")"
            )
        else:
            # empty result set: SQL defines `x IN (empty)` as FALSE and
            # `x NOT IN (empty)` as TRUE for EVERY x, including NULL —
            # operand-independent, so the exact rewrite replaces the
            # WHOLE comparison (operand included; it is side-effect
            # free) with the constant. The operand's left boundary is
            # found by a quote/paren-aware backward scan; a mis-cut can
            # only yield text F.expr refuses loudly, never silently
            # wrong semantics.
            op_start = _operand_start(pred, mask, m.start())
            out.append(pred[i:op_start])
            out.append("(TRUE)" if negated else "(FALSE)")
        i = close + 1
    return "".join(out)


def _operand_start(pred: str, mask, end: int) -> int:
    """Left boundary of the expression immediately before position
    ``end`` — an identifier (possibly qualified/quoted), a function
    call, or a parenthesized expression."""
    j = end - 1
    while j >= 0 and pred[j].isspace():
        j -= 1
    if j < 0:
        raise SqlDmlError("IN-subquery has no left operand")
    if pred[j] == ")":
        depth = mask[j][0]
        k = j - 1
        while k >= 0 and not (pred[k] == "(" and mask[k] == (depth, True)):
            k -= 1
        if k < 0:
            raise SqlDmlError("unbalanced operand parens before IN")
        j = k - 1  # optional function name continues below
    elif pred[j] in "`\"":
        quote, k = pred[j], j - 1
        while k >= 0 and pred[k] != quote:
            k -= 1
        j = k - 1
    while j >= 0 and (pred[j].isalnum() or pred[j] in "_$."):
        j -= 1
    return j + 1


def _resolve_in_subqueries(spark, pred: str):
    """Round 14 — the full ``[NOT] IN (SELECT ...)`` resolution policy:
    returns ``(pred_without_membership_term, membership | None)`` where
    ``membership`` is the ``(col, subjects_df, negated)`` spec the native
    ops' semi-join path takes.

    Below :data:`IN_SUBQUERY_CAP` the subquery materializes to literals
    (unchanged round-13 behavior — exact 3VL, and the literal list feeds
    ``derive_prune``'s IN-list file skipping). Above the cap, the term
    runs as a DISTRIBUTED semi-join instead of refusing — provided it is

    - an ENTIRE top-level conjunct of the WHERE (under an OR/NOT the
      term's truth value can't be factored out of the row predicate, so
      those shapes still refuse with guidance), and
    - a plain column operand (an expression operand would need the whole
      expression evaluated per row on both sides of the join key).

    At most one oversized term per statement (two independent subject
    sets would need two joins; refused with guidance to MERGE)."""
    try:
        return _materialize_in_subqueries(spark, pred), None
    except _OversizedInSubquery as e:
        term = pred[e.span[0] : e.span[1]].strip()
        opm = re.fullmatch(r"(" + _IDENT + r")", e.operand)
        if not opm:
            raise SqlDmlError(
                f"IN-subquery returns more than {IN_SUBQUERY_CAP} values "
                f"and its operand {e.operand!r} is not a plain column — "
                "only `col [NOT] IN (SELECT ...)` can run as a "
                "distributed semi-join; use MERGE INTO for join-shaped "
                "updates"
            )
        kept: list[str] = []
        hit = False
        for c in _split_top_and(pred):
            cs = c.strip()
            core = cs
            if cs.startswith("(") and cs.endswith(")"):
                cmask = _mask(cs)
                close0 = next(
                    (i for i, ch in enumerate(cs)
                     if ch == ")" and cmask[i] == (0, True)),
                    -1,
                )
                # strip the outer pair only if it closes at the very end
                if close0 == len(cs) - 1:
                    core = cs[1:-1].strip()
            if not hit and (cs == term or core == term):
                hit = True
                continue
            kept.append(cs)
        if not hit:
            raise SqlDmlError(
                f"IN-subquery returns more than {IN_SUBQUERY_CAP} values "
                "and is not a whole top-level conjunct of the WHERE — "
                "its truth value cannot be factored into a semi-join "
                "there; rewrite the predicate or use MERGE INTO"
            )
        remaining = " AND ".join(kept) if kept else None
        if remaining is not None:
            try:
                # NOTE: small IN-subqueries that already materialized in
                # the aborted first pass re-run here — bounded (only
                # statements that ALSO carry an oversized term pay it,
                # and each small list is ≤ the cap), and sources are
                # static within a statement (temp views / snapshots)
                remaining = _materialize_in_subqueries(spark, remaining)
            except _OversizedInSubquery:
                raise SqlDmlError(
                    "at most one oversized IN (SELECT ...) membership "
                    "test per statement; use MERGE INTO for multi-set "
                    "join updates"
                )
        membership = (_unquote(e.operand), spark.sql(e.sub), e.negated)
        return remaining, membership


def _membership_filter(vt, df, membership):
    """Apply a membership spec to a DataFrame as the exact TRUE-rows
    filter — the dryrun counting path DELEGATES to the same
    ``_membership_plan`` / ``_with_membership`` the real operation runs
    (round-14 review: a hand-rolled twin here could drift from the
    execution semantics, which is exactly what a dryrun must never
    do)."""
    from pyspark.sql import functions as F

    from database_anonymiser_spark.sources.versioned import _MEMBER_MARK

    col, vals, negated, fate, _prune = vt._membership_plan(
        membership, df.schema
    )
    if fate == "never":
        return df.where(F.lit(False))
    if fate == "always":
        return df
    joined, member = vt._with_membership(df, col, vals, negated)
    return joined.where(member).drop(_MEMBER_MARK)


def classify_utility(stmt: str) -> str | None:
    """'optimize' | 'vacuum' | 'restore' | 'describe' | 'alter' | ...
    when the statement STARTS like one of the table-maintenance shapes
    (Delta's SQL surface for the same ops), else None. Keyword-level
    only — the router must use :func:`claim_utility`, which also checks
    the SHAPE and the target, because DESCRIBE/ALTER/CREATE are valid
    plain Spark SQL too (round-14 advice fix: round 13 claimed every
    DESCRIBE/ALTER and broke e.g. ``DESCRIBE customer``)."""
    head = re.match(
        r"\s*(OPTIMIZE|VACUUM|RESTORE|DESCRIBE|ALTER|ERASE|CREATE|COPY|"
        r"CONVERT|TRUNCATE|SHOW|REFRESH|DROP|EXPLAIN|ANALYZE)\b",
        stmt, re.I,
    )
    return head.group(1).lower() if head else None


def claim_utility(stmt: str, versioned_views: dict[str, dict]) -> str | None:
    """The router's claim check: the utility kind when
    :func:`execute_utility` will actually handle this statement, else
    None (the caller falls through to ``spark.sql``).

    OPTIMIZE / VACUUM / RESTORE / ERASE / COPY INTO / CONVERT are not
    Spark SQL statements at all, so the keyword alone claims them (a
    malformed shape then errors with OUR grammar, which beats Spark's
    parse error). DESCRIBE / ALTER / CREATE exist in plain Spark SQL,
    so only the engine's own shapes are claimed:

    - ``DESCRIBE HISTORY|DETAIL <versioned view>``
    - ``ALTER TABLE <versioned view> ...`` (any sub-shape: if it is not
      one the utility face supports, refusing with the grammar is the
      right outcome for a versioned target)
    - ``CREATE TABLE ... USING VERSIONED ...`` (the explicit format
      marker, like Spark's ``USING delta``)
    """
    kind = classify_utility(stmt)
    if kind is None:
        return None
    if kind == "explain":
        # EXPLAIN is valid Spark SQL too — claim only when the INNER
        # statement is ours (a claimed DML/utility shape, or a
        # single-table SELECT on a registered versioned view, whose
        # pushdown plan the engine can explain); every other EXPLAIN
        # falls through to Spark's own (round 15)
        inner = re.sub(r"^\s*EXPLAIN\s+", "", _strip_stmt(stmt), flags=re.I)
        dk = classify_dml(inner)
        if dk:
            t = statement_target(inner)
            return kind if t and t.lower() in versioned_views else None
        if claim_utility(inner, versioned_views):
            return kind
        m = re.match(
            rf"SELECT\s+.+?\s+FROM\s+({_IDENT})\s*(?:WHERE\b.+)?$",
            inner, re.I | re.S,
        )
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    if kind == "analyze":
        # ANALYZE TABLE is valid Spark SQL on catalog tables — claim
        # only a registered versioned view's (round 15)
        m = re.match(
            rf"\s*ANALYZE\s+TABLE\s+({_IDENT})\b", stmt, re.I
        )
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    if kind not in (
        "describe", "alter", "create", "truncate", "show", "refresh",
        "drop",
    ):
        return kind
    s = _strip_stmt(stmt)
    if kind == "describe":
        m = re.match(
            rf"DESCRIBE\s+(?:HISTORY|DETAIL)\s+({_IDENT})\s*$", s, re.I
        )
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    if kind == "alter":
        m = re.match(rf"ALTER\s+TABLE\s+({_IDENT})\b", s, re.I)
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    if kind == "truncate":
        # TRUNCATE TABLE is valid Spark SQL on catalog tables — claim
        # only a versioned-view target (round 14)
        m = re.match(rf"TRUNCATE\s+TABLE\s+({_IDENT})\s*$", s, re.I)
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    if kind == "show":
        # only SHOW CREATE TABLE / SHOW TBLPROPERTIES on a registered
        # versioned view; every other SHOW is plain Spark SQL
        m = re.match(
            rf"SHOW\s+(?:CREATE\s+TABLE|TBLPROPERTIES)\s+({_IDENT})\s*$",
            s, re.I,
        )
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    if kind == "refresh":
        # REFRESH TABLE is plain Spark SQL; only the MATERIALIZED VIEW
        # form on a registered versioned view is ours (round 14)
        m = re.match(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})"
            rf"(?:\s+TO\s+VERSION\s+\d+)?\s*$",
            s, re.I,
        )
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    if kind == "drop":
        # DROP TABLE/VIEW are plain Spark SQL on catalog objects; only
        # a registered versioned view's drop is ours (round 14)
        m = re.match(
            rf"DROP\s+(?:TABLE|MATERIALIZED\s+VIEW)\s+(?:IF\s+EXISTS\s+)?"
            rf"({_IDENT})\s*$",
            s, re.I,
        )
        return (
            kind
            if m and _unquote(m.group(1)).lower() in versioned_views
            else None
        )
    # CREATE: claimed with the explicit USING VERSIONED marker, or the
    # clone form whose SOURCE is a versioned view (round 14)
    mask = _mask(s)
    if _find(s, mask, r"\bUSING\s+VERSIONED\b"):
        return kind
    m = re.match(
        rf"CREATE\s+TABLE\s+{_IDENT}\s+(?:SHALLOW|DEEP)\s+CLONE\s+"
        rf"({_IDENT})\b",
        s, re.I,
    )
    return (
        kind
        if m and _unquote(m.group(1)).lower() in versioned_views
        else None
    )


def created_view_name(stmt: str) -> str | None:
    """The view a ``CREATE TABLE ... USING VERSIONED`` or ``CONVERT ...
    AS <name>`` statement WILL register, for the script router's
    speculative pre-scan (round 14): later statements in the same script
    target tables that exist only once the earlier ones run, so the
    all-routed check must see the names before execution."""
    s = _strip_stmt(stmt)
    m = re.match(
        rf"CREATE\s+(?:TABLE|MATERIALIZED\s+VIEW)\s+({_IDENT})\b", s, re.I
    )
    if m and (
        _find(s, _mask(s), r"\bUSING\s+VERSIONED\b")
        or re.match(
            r"\s*(?:SHALLOW|DEEP)\s+CLONE\b", s[m.end():], re.I
        )
    ):
        return _unquote(m.group(1))
    m = re.match(
        rf"CONVERT\s+TO\s+VERSIONED\s+'[^']+'\s+KEY\s*\([^)]*\)\s+"
        rf"AS\s+({_IDENT})\s*$",
        s, re.I,
    )
    return _unquote(m.group(1)) if m else None


def statement_target(stmt: str) -> str | None:
    """The UNQUOTED table a DML or mutating-maintenance statement
    touches, for the CLI's rollback bookkeeping — parsed with the same
    identifier grammar as the statement fronts, so quoted targets
    (``UPDATE `cust` SET ...``) are tracked too (round-14 advice fix:
    the CLI's ad-hoc bare-identifier regex silently skipped quoted
    views, leaving them un-restored on --sqlRollbackOnError). Returns
    None for non-mutating statements (DESCRIBE) and shapes without a
    view target (CONVERT — it creates the table it names)."""
    s = _strip_stmt(stmt)
    m = re.match(
        rf"(?:UPDATE|DELETE\s+FROM|MERGE\s+INTO|"
        rf"INSERT\s+(?:INTO|OVERWRITE(?:\s+TABLE)?)|"
        rf"OPTIMIZE|VACUUM|RESTORE(?:\s+TABLE)?|ERASE\s+FROM|"
        rf"ALTER\s+TABLE|COPY\s+INTO|TRUNCATE\s+TABLE|"
        rf"ANALYZE\s+TABLE)\s+({_IDENT})",
        s, re.I,
    )
    return _unquote(m.group(1)) if m else None


_UTILITY_GRAMMAR = (
    "supported maintenance grammar (Delta's SQL surface on the native ops):\n"
    "  OPTIMIZE <view> [ZORDER BY (cols) [WHERE <pred>] | MERGE RUNS <k>]\n"
    "      -- WHERE (scoped OPTIMIZE): recluster only stats-overlapping files\n"
    "  VACUUM <view> [RETAIN <n> VERSIONS | RETAIN <h> HOURS] [DRY RUN]\n"
    "  RESTORE [TABLE] <view> TO VERSION AS OF <n> | TO TIMESTAMP AS OF '<ts>'\n"
    "  DESCRIBE HISTORY|DETAIL <view>\n"
    "  ALTER TABLE <view> CLUSTER BY (cols)\n"
    "  ALTER TABLE <view> ADD COLUMN <col> <type>\n"
    "  ALTER TABLE <view> RENAME COLUMN <col> TO <col>\n"
    "  ALTER TABLE <view> DROP COLUMN <col>\n"
    "  ALTER TABLE <view> ALTER COLUMN <col> TYPE <type>   -- lossless widening\n"
    "  ALTER TABLE <view> ADD CONSTRAINT <name> CHECK (<pred>)\n"
    "  ALTER TABLE <view> DROP CONSTRAINT <name>\n"
    "  ALTER TABLE <view> SET TBLPROPERTIES ('k' = 'v', ...)\n"
    "  ALTER TABLE <view> UNSET TBLPROPERTIES ('k', ...)\n"
    "  CREATE TABLE <view> [(col type [GENERATED ALWAYS AS IDENTITY\n"
    "      [(START WITH n STEP m)] | GENERATED ALWAYS AS (<expr>)], ...)]\n"
    "      USING VERSIONED LOCATION '<dir>' [KEY (cols)] [CLUSTER BY (cols)]\n"
    "      [AS <select>]\n"
    "  CREATE TABLE <view> SHALLOW|DEEP CLONE <src> [VERSION AS OF <n>] LOCATION '<dir>'\n"
    "  CREATE MATERIALIZED VIEW <view> USING VERSIONED LOCATION '<dir>'\n"
    "      AS SELECT <keys, count/sum/avg/min/max/approx_count_distinct aggs>\n"
    "      FROM <versioned view> [WHERE <row-local pred>] GROUP BY <keys>\n"
    "  REFRESH MATERIALIZED VIEW <view> [TO VERSION <n>]   -- incremental: O(source changes)\n"
    "  ANALYZE TABLE <view> COMPUTE STATISTICS FOR [COLUMNS a, b]\n"
    "      [BLOOM COLUMNS c, d]         -- footer-only skipping-stats harvest;\n"
    "      bloom sidecars for point lookups (tuple blooms: native analyze())\n"
    "  TRUNCATE TABLE <view>            -- metadata-only: dereference all live files\n"
    "  DROP TABLE [IF EXISTS] <view> | DROP MATERIALIZED VIEW <view>\n"
    "      -- deregister only (external-location semantics: data stays)\n"
    "  SHOW CREATE TABLE <view>         -- executable round-trip DDL\n"
    "  SHOW TBLPROPERTIES <view>        -- the versioned property map as rows\n"
    "  COPY INTO <view> FROM '<parquet dir or file>'   -- idempotent by file\n"
    "  CONVERT TO VERSIONED '<dir>' KEY (col) [AS <view>]\n"
    "  ERASE FROM <view> WHERE <pred>   -- engine extension: GDPR Art. 17\n"
    "      verified hard delete (delete + vacuum + log-stat scrub +\n"
    "      re-scan verification; time travel below the erase is GONE)\n"
    "  EXPLAIN <statement>              -- plan only, zero execution:\n"
    "      classification, target, derived prune ranges + file-count effect,\n"
    "      membership plan (literal vs semi-join), the native op that would run"
)


def _register_versioned_view(spark, name: str, root: str,
                             versioned_views: dict) -> None:
    """Make a table CREATE/CONVERT just produced addressable by the rest
    of the session/script: register the DataSource read face as a temp
    view under ``name`` and add it to ``versioned_views`` (un-pinned) so
    subsequent DML/maintenance statements can target it."""
    from database_anonymiser_spark.sources.spark_datasource import (
        VersionedDataSource,
    )

    try:
        spark.dataSource.register(VersionedDataSource)
    except Exception:
        pass  # already registered
    reader = spark.read.format("versioned").option("path", str(root))
    # match the session's SELECT face (round-14 review): when the CLI
    # enabled pushdown (the default) it set this conf — a mid-script
    # CREATE must not register a slower, inconsistent plain-scan view
    if (
        str(
            spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        ).lower()
        == "true"
    ):
        reader = reader.option("pushdown", "true")
    reader.load().createOrReplaceTempView(name)
    versioned_views[name.lower()] = {"root": str(root), "pinned": False}


def show_create_table(t, name: str, versioned_views: dict | None = None) -> str:
    """Delta's ``SHOW CREATE TABLE``: render the table's CURRENT shape
    as the engine's own executable SQL (the round-14 CREATE grammar),
    followed by ALTER statements for constraints and user properties —
    so the output, pointed at a fresh LOCATION, recreates the table
    shape through the same face that prints it (round-trip pinned in
    pytest). Pure metadata: logged schema + key + clustering +
    constraint/property maps, zero data reads.

    A MATERIALIZED VIEW renders as its ``CREATE MATERIALIZED VIEW ...
    AS SELECT`` definition (round 15 — the plain-CREATE rendering would
    have recreated a table that LOOKS like an MV, ivm.* properties and
    all, without its content contract). The FROM name resolves by
    reverse-looking the recorded source root up in the session's
    registrations; an unregistered source renders a placeholder the
    caller must substitute."""
    props0 = t._raw_properties() or {}
    if "'" in str(t.root):
        # the CREATE grammar's LOCATION literal cannot express a quote
        raise SqlDmlError(
            f"SHOW CREATE TABLE cannot render location {str(t.root)!r}: "
            "a single quote in the path is not expressible in the "
            "LOCATION literal"
        )

    def _alter_tail(extra_skip: tuple = ()) -> list:
        out = []
        for cname, pred in sorted((t.constraints() or {}).items()):
            out.append(
                f"ALTER TABLE {name} ADD CONSTRAINT {cname} CHECK ({pred})"
            )
        up = {
            k: v for k, v in props0.items()
            # engine-managed slots are rendered structurally (CLUSTER
            # BY, the MV definition) or not re-creatable
            # (protocol/identity/generated)
            if not k.startswith(
                ("protocol.", "identity.", "generated.", "clustering.")
                + extra_skip
            )
        }
        if up:
            kv = ", ".join(
                f"{_sq_quote(k)} = {_sq_quote(v)}"
                for k, v in sorted(up.items())
            )
            out.append(f"ALTER TABLE {name} SET TBLPROPERTIES ({kv})")
        return out

    if all(k in props0 for k in ("ivm.source", "ivm.keys", "ivm.aggs")):
        # a COMPLETE ivm contract renders as the MV definition; a table
        # merely carrying a hand-set ivm.source property falls through
        # to the plain rendering (round-15 review fix: KeyError)
        import json as _json

        keys = _json.loads(props0["ivm.keys"])
        aggs = _json.loads(props0["ivm.aggs"])
        src_root = props0["ivm.source"]
        src_name = next(
            (n for n, m in (versioned_views or {}).items()
             if str(m.get("root")) == src_root),
            None,
        )
        items = list(keys)
        for col, (kind, expr) in aggs.items():
            fn = {
                "approx_distinct": "approx_count_distinct",
            }.get(kind, kind)
            arg = "*" if (kind == "count" and expr is None) else expr
            items.append(f"{fn}({arg}) AS {col}")
        q = f"SELECT {', '.join(items)} FROM {src_name or '<source_view>'}"
        if props0.get("ivm.filter"):
            q += f" WHERE {props0['ivm.filter']}"
        q += f" GROUP BY {', '.join(keys)}"
        lines = []
        if src_name is None:
            lines.append(
                f"-- source root: {src_root} — register it as a "
                "--versionedTable view and substitute its name for "
                "<source_view>"
            )
        head_mv = (
            f"CREATE MATERIALIZED VIEW {name} USING VERSIONED "
            f"LOCATION '{t.root}' AS {q}"
        )
        # user properties / constraints / clustering survive the
        # round-trip on MVs too (round-15 review fix: they were
        # silently dropped); the ivm.* contract itself is the CREATE
        parts = [head_mv]
        clus = tuple(t.clustering_cols() or ())
        if clus:
            parts.append(
                f"ALTER TABLE {name} CLUSTER BY ({', '.join(clus)})"
            )
        parts.extend(_alter_tail(extra_skip=("ivm.",)))
        return "\n".join(lines + [";\n".join(parts) + ";"])
    sch = t._log_schema() or t.snapshot().schema
    ident = t.identity_column()
    gens = {
        k[len("generated."):]: v
        for k, v in props0.items()
        if k.startswith("generated.")
    }
    rendered = []
    for f in sch.fields:
        item = f"{f.name} {f.dataType.simpleString()}"
        if ident is not None and f.name == ident[0]:
            # START WITH the CURRENT high-water: a round-tripped shape
            # allocates above every id the source ever issued
            item += (
                f" GENERATED ALWAYS AS IDENTITY "
                f"(START WITH {ident[2]} STEP {ident[1]})"
            )
        elif f.name in gens:
            item += f" GENERATED ALWAYS AS ({gens[f.name]})"
        rendered.append(item)
    cols = ", ".join(rendered)
    head = f"CREATE TABLE {name} ({cols}) USING VERSIONED LOCATION '{t.root}'"
    key = tuple(t.key_cols() or ())
    if key:
        head += f" KEY ({', '.join(key)})"
    clus = tuple(t.clustering_cols() or ())
    if clus:
        head += f" CLUSTER BY ({', '.join(clus)})"
    parts = [head]
    parts.extend(_alter_tail())
    return ";\n".join(parts) + ";"


def _execute_create_materialized(spark, m, stmt: str,
                                 versioned_views: dict) -> dict:
    """``CREATE MATERIALIZED VIEW mv USING VERSIONED LOCATION '<dir>'
    AS SELECT <keys, count/sum/avg aggs> FROM <versioned view> GROUP BY
    <keys>`` (round 14) — the incremental-view face: the full aggregate
    materializes once, and ``REFRESH MATERIALIZED VIEW`` thereafter
    advances it by the source's change feed at O(changes) cost
    (sources/materialized.py). The source must be a versioned view (a
    plain --data parquet view has no change feed to refresh from)."""
    from database_anonymiser_spark.sources.materialized import (
        create_materialized,
        parse_mv_query,
    )

    name = _unquote(m.group(1))
    if name.lower() in versioned_views:
        raise SqlDmlError(
            f"CREATE MATERIALIZED VIEW {name!r}: the view is already "
            "registered; refusing to shadow it"
        )
    try:
        src_view, keys, aggs, filt = parse_mv_query(m.group("q").strip())
    except ValueError as e:
        raise SqlDmlError(str(e)) from e
    src_meta = versioned_views.get(src_view.lower())
    if src_meta is None:
        raise SqlDmlError(
            f"materialized-view source {src_view!r} is not a versioned "
            "view — incremental refresh needs the source's change feed "
            "(--versionedTable registers one)"
        )
    if src_meta["pinned"]:
        raise SqlDmlError(
            f"materialized-view source {src_view!r} is pinned; a frozen "
            "source never changes — materialize a plain CTAS instead"
        )
    try:
        mv = create_materialized(
            spark, m.group("loc"), src_meta["root"], keys, aggs,
            filter_sql=filt,
        )
    except OSError as e:
        raise SqlDmlError(f"CREATE refused: {e}") from e
    _register_versioned_view(spark, name, m.group("loc"), versioned_views)
    # re-register the temp view over the VISIBLE columns only (the
    # hidden avg companions are maintenance state, not user surface)
    (
        spark.read.format("versioned").option("path", m.group("loc")).load()
        .select(*keys, *aggs.keys())
        .createOrReplaceTempView(name)
    )
    return {
        "mode": "sql_utility", "op": "create_materialized_view",
        "table": name, "root": m.group("loc"), "source": src_view,
        "num_rows": int(mv.row_count(mv.latest_version())),
        "statement": stmt,
    }


def _execute_create(spark, s: str, stmt: str, versioned_views: dict) -> dict:
    """``CREATE TABLE ... USING VERSIONED`` — empty-schema or CTAS form,
    into a fresh versioned root (``VersionedTable.create``); the new
    table registers into the session and ``versioned_views`` so the rest
    of the script can write to it. The column list and AS-select are
    mutually exclusive (one schema authority). Native filesystem
    refusals (existing table at the location, missing clone source)
    re-raise as :class:`SqlDmlError` so a script aborts the STATEMENT
    cleanly instead of crashing the runner (round 14)."""
    from database_anonymiser_spark.sources.versioned import VersionedTable

    mvm = re.match(
        rf"CREATE\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+USING\s+VERSIONED\s+"
        rf"LOCATION\s+'(?P<loc>[^']+)'\s+AS\s+(?P<q>.+)$",
        s, re.I | re.S,
    )
    if mvm:
        return _execute_create_materialized(
            spark, mvm, stmt, versioned_views
        )
    head = re.match(rf"CREATE\s+TABLE\s+({_IDENT})\s*", s, re.I)
    if not head:
        raise SqlDmlError(f"unsupported CREATE shape\n{_UTILITY_GRAMMAR}")
    name = _unquote(head.group(1))
    if name.lower() in versioned_views:
        raise SqlDmlError(
            f"CREATE TABLE {name!r}: the view is already registered; "
            "refusing to shadow it"
        )
    # clone form (round 14): CREATE TABLE dst SHALLOW|DEEP CLONE src
    #   [VERSION AS OF n] LOCATION '<dir>'
    cm = re.match(
        rf"(SHALLOW|DEEP)\s+CLONE\s+({_IDENT})"
        rf"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?"
        rf"\s+LOCATION\s+'(?P<loc>[^']+)'\s*$",
        s[head.end():], re.I,
    )
    if cm:
        src_meta = versioned_views.get(_unquote(cm.group(2)).lower())
        if src_meta is None:
            raise SqlDmlError(
                f"CLONE source {cm.group(2)!r} is not a versioned view"
            )
        try:
            t = VersionedTable.clone(
                spark, src_meta["root"], cm.group("loc"),
                version=int(cm.group("v")) if cm.group("v") else None,
                deep=cm.group(1).upper() == "DEEP",
            )
        except OSError as e:
            raise SqlDmlError(f"CLONE refused: {e}") from e
        _register_versioned_view(spark, name, cm.group("loc"), versioned_views)
        return {
            "mode": "sql_utility", "op": "clone", "table": name,
            "source": _unquote(cm.group(2)), "root": cm.group("loc"),
            "deep": cm.group(1).upper() == "DEEP",
            "num_rows": int(t.row_count(t.latest_version())),
            "statement": stmt,
        }
    i = head.end()
    mask = _mask(s)
    schema_ddl = None
    if i < len(s) and s[i] == "(":
        depth = mask[i][0]
        close = next(
            (j for j in range(i + 1, len(s))
             if s[j] == ")" and mask[j] == (depth, True)),
            -1,
        )
        if close < 0:
            raise SqlDmlError(f"unbalanced column list in CREATE\n{_UTILITY_GRAMMAR}")
        schema_ddl = s[i + 1 : close].strip()
        i = close + 1
    m = re.match(
        r"\s*USING\s+VERSIONED\s+LOCATION\s+'(?P<loc>[^']+)'", s[i:], re.I
    )
    if not m:
        raise SqlDmlError(
            f"CREATE TABLE needs USING VERSIONED LOCATION '<dir>'\n"
            f"{_UTILITY_GRAMMAR}"
        )
    root = m.group("loc")
    i += m.end()
    key_cols: tuple = ()
    km = re.match(r"\s*KEY\s*\((?P<k>[^)]*)\)", s[i:], re.I)
    if km:
        key_cols = tuple(
            _unquote(c) for c in _split_top(km.group("k")) if c.strip()
        )
        i += km.end()
    cluster: tuple = ()
    cm = re.match(r"\s*CLUSTER\s+BY\s*\((?P<c>[^)]*)\)", s[i:], re.I)
    if cm:
        cluster = tuple(
            _unquote(c) for c in _split_top(cm.group("c")) if c.strip()
        )
        i += cm.end()
    rest = s[i:].strip()
    gen_map: dict[str, str] = {}
    ident_col: str | None = None
    ident_start, ident_step = 1, 1
    if rest:
        am = re.match(r"AS\b(.*)$", rest, re.I | re.S)
        if not am or not am.group(1).strip():
            raise SqlDmlError(
                f"unexpected trailing text in CREATE: {rest[:60]!r}\n"
                f"{_UTILITY_GRAMMAR}"
            )
        if schema_ddl is not None:
            raise SqlDmlError(
                "CREATE TABLE takes a column list OR AS <select>, not both"
            )
        df = spark.sql(am.group(1).strip())
    elif schema_ddl is not None:
        # column items may carry GENERATED ALWAYS AS IDENTITY
        # [(START WITH n STEP m)] or GENERATED ALWAYS AS (<expr>) —
        # the natives' creation-time-only column classes (round 14)
        plain_items: list[str] = []
        for item in _split_top(schema_ddl):
            im = re.match(
                rf"\s*({_IDENT})\s+(?P<rest>.+)$", item, re.S
            )
            if not im:
                raise SqlDmlError(
                    f"malformed column item {item.strip()!r} in CREATE"
                )
            cname = _unquote(im.group(1))
            body = im.group("rest").strip()
            gm = re.search(
                r"\bGENERATED\s+ALWAYS\s+AS\s+", body, re.I
            )
            if gm:
                dtype = body[: gm.start()].strip()
                tail = body[gm.end():].strip()
                idm = re.match(
                    r"IDENTITY(?:\s*\(\s*START\s+WITH\s+(?P<st>-?\d+)"
                    r"\s+STEP\s+(?P<sp>-?\d+)\s*\))?\s*$",
                    tail, re.I,
                )
                if idm:
                    if ident_col is not None:
                        raise SqlDmlError(
                            "at most one IDENTITY column per table"
                        )
                    ident_col = cname
                    if idm.group("st") is not None:
                        ident_start = int(idm.group("st"))
                        ident_step = int(idm.group("sp"))
                    # the identity column is allocated by the engine —
                    # it is not part of the created frame's schema
                    continue
                if not (tail.startswith("(") and tail.endswith(")")):
                    raise SqlDmlError(
                        f"GENERATED ALWAYS AS needs IDENTITY or "
                        f"(<expr>), got {tail[:40]!r}"
                    )
                gen_map[cname] = tail[1:-1].strip()
                plain_items.append(f"{cname} {dtype}")
            else:
                plain_items.append(f"{cname} {body}")
        if not plain_items:
            raise SqlDmlError("CREATE TABLE needs at least one column")
        df = spark.createDataFrame([], ", ".join(plain_items))
    else:
        raise SqlDmlError(
            f"CREATE TABLE needs a column list or AS <select>\n"
            f"{_UTILITY_GRAMMAR}"
        )
    key_arg = (
        None if not key_cols
        else (key_cols[0] if len(key_cols) == 1 else list(key_cols))
    )
    try:
        t = VersionedTable.create(
            spark, root, df, key_col=key_arg,
            generated=gen_map or None,
            identity_col=ident_col,
            identity_start=ident_start,
            identity_step=ident_step,
        )
    except OSError as e:
        raise SqlDmlError(f"CREATE refused: {e}") from e
    if cluster:
        t.set_clustering(cluster)
    _register_versioned_view(spark, name, root, versioned_views)
    return {
        "mode": "sql_utility", "op": "create_table", "table": name,
        "root": str(root), "new_version": int(t.latest_version()),
        "num_rows": int(t.row_count(t.latest_version())), "statement": stmt,
    }


def _execute_explain(spark, s: str, stmt: str, versioned_views: dict) -> dict:
    """``EXPLAIN <statement>`` (round 15): the statement front's OWN
    plan with ZERO mutation — classification, target, the derived
    file-skipping ranges (:func:`derive_prune`), their file-count
    effect probed against the live commit-log stats (driver metadata
    arithmetic, no data scan), the membership plan an ``IN (SELECT
    ...)`` term resolves to (literal inline vs distributed semi-join —
    the subquery runs read-only, the identical decision procedure the
    real statement uses), and the native operation that would commit.
    Reference parity: the closest reference surface is the BEGIN …
    ROLLBACK dryrun (``executor.ts:98-136``), which counts rows;
    EXPLAIN stays at the metadata level and never reads table data."""
    from database_anonymiser_spark.sources.versioned import VersionedTable

    inner = re.sub(r"^EXPLAIN\s+", "", s, flags=re.I)
    out: dict = {"mode": "sql_explain", "op": "explain", "statement": stmt}

    def _vt(name: str) -> "VersionedTable":
        meta = versioned_views.get(_unquote(name).lower())
        if meta is None:
            raise SqlDmlError(
                f"EXPLAIN target {name!r} is not a versioned view"
            )
        out["table"] = _unquote(name)
        out["pinned"] = bool(meta["pinned"])
        return VersionedTable(spark, meta["root"])

    def _scan_effect(vt, prune: dict):
        total = len(vt.files_matching({}))
        out["prune"] = {
            c: (list(b) if isinstance(b, tuple) else b)
            for c, b in (prune or {}).items()
        }
        out["files_total"] = total
        out["files_would_read"] = (
            len(vt.files_matching(prune)) if prune else total
        )

    def _membership_report(pred):
        """Resolve [NOT] IN (SELECT ...) exactly as execution would and
        report which plan the term takes; returns the residual pred."""
        if pred is None:
            return None
        new_pred, membership = _resolve_in_subqueries(spark, pred)
        if membership is not None:
            col, subjects, negated = membership
            out["membership"] = {
                "plan": "semi_join", "column": col, "negated": bool(negated),
                "reason": f"subquery exceeds IN_SUBQUERY_CAP="
                          f"{IN_SUBQUERY_CAP}: subjects join distributed, "
                          "never collected",
            }
        elif new_pred != pred:
            out["membership"] = {
                "plan": "literal_inline",
                "reason": f"subquery materialized to ≤{IN_SUBQUERY_CAP} "
                          "literals (feeds IN-list file skipping)",
            }
        return new_pred

    dk = classify_dml(inner)
    if dk == "update":
        u = _parse_update(inner)
        vt = _vt(u.table)
        out["class"] = "update"
        out["native_op"] = "update_where"
        pred = _membership_report(u.predicate)
        _scan_effect(vt, derive_prune(pred) if pred else {})
        out["set_columns"] = sorted(u.assignments)
        return out
    if dk == "delete":
        d = _parse_delete(inner)
        vt = _vt(d.table)
        out["class"] = "delete"
        out["native_op"] = "delete_where"
        pred = _membership_report(d.predicate)
        _scan_effect(vt, derive_prune(pred) if pred else {})
        return out
    if dk == "insert":
        ins = _parse_insert(inner)
        _vt(ins.table)
        out["class"] = "insert"
        out["native_op"] = "overwrite" if ins.overwrite else "append"
        out["source"] = "values" if ins.values is not None else "query"
        return out
    if dk == "merge":
        mg = _parse_merge(inner)
        vt = _vt(mg.target)
        out["class"] = "merge"
        out["native_op"] = "merge"
        key_cols = vt.key_cols()
        pairs, residual = _parse_on_keys(
            mg.on, mg.target_alias, mg.source_alias, key_cols
        )
        out["on_keys"] = dict(pairs)
        out["residual_on"] = (
            " AND ".join(f"({c})" for c in residual) if residual else None
        )
        out["clauses"] = {
            "matched": len(mg.matched),
            "not_matched": len(mg.not_matched),
            "not_matched_by_source": len(mg.by_source),
        }
        out["skipping"] = (
            "source key-bounds range prune (per-column conjunction)"
        )
        return out
    uk = classify_utility(inner)
    if uk == "erase":
        m = re.fullmatch(
            rf"ERASE\s+FROM\s+({_IDENT})\s+WHERE\s+(?P<p>.+)", inner,
            re.I | re.S,
        )
        if not m:
            raise SqlDmlError(f"unsupported ERASE shape\n{_UTILITY_GRAMMAR}")
        vt = _vt(m.group(1))
        out["class"] = "erase"
        out["native_op"] = "erase"
        pred = _membership_report(m.group("p").strip())
        _scan_effect(vt, derive_prune(pred) if pred else {})
        return out
    if uk == "optimize":
        m = re.fullmatch(
            rf"OPTIMIZE\s+({_IDENT})"
            r"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]*)\)"
            r"|\s+MERGE\s+RUNS\s+(?P<mr>\d+))?"
            r"(?:\s+WHERE\s+(?P<w>.+))?",
            inner, re.I | re.S,
        )
        if not m:
            raise SqlDmlError(f"unsupported OPTIMIZE shape\n{_UTILITY_GRAMMAR}")
        vt = _vt(m.group(1))
        out["class"] = "optimize"
        # EXPLAIN is the rehearsal of what WILL run, so this branch must
        # mirror execute_utility's dispatch EXACTLY — including its
        # refusals: explaining a statement that would refuse must refuse
        # with the same message (round-15 review fix)
        if m.group("w") is not None:
            if not m.group("z"):
                raise SqlDmlError(
                    "OPTIMIZE ... WHERE needs ZORDER BY (<cols>): the "
                    "scoped rewrite is a scoped z-order; incremental "
                    "clustering (OPTIMIZE on a CLUSTER BY table) is "
                    "already scoped to unclustered files"
                )
            rng = derive_prune(m.group("w").strip())
            if not rng:
                raise SqlDmlError(
                    "OPTIMIZE ... WHERE derives no file-skipping range "
                    "from the predicate (top-level AND of col-vs-literal "
                    "conjuncts required) — an unscoped WHERE would "
                    "silently rewrite the whole table; drop the WHERE "
                    "to do that explicitly"
                )
            out["native_op"] = "optimize_zorder"
            _scan_effect(vt, rng)
            out["scoped"] = True
        elif m.group("z"):
            out["native_op"] = "optimize_zorder"
            _scan_effect(vt, {})
        elif vt.clustering_cols():
            out["native_op"] = "optimize_cluster"
            out["clustering_cols"] = list(vt.clustering_cols())
            if m.group("mr") is not None:
                out["merge_runs"] = int(m.group("mr"))
        elif m.group("mr") is not None:
            raise SqlDmlError(
                "OPTIMIZE ... MERGE RUNS needs a declared clustering key "
                "(ALTER TABLE ... CLUSTER BY first)"
            )
        else:
            out["native_op"] = "compact"
        return out
    if uk == "refresh":
        m = re.fullmatch(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})"
            rf"(?:\s+TO\s+VERSION\s+(?P<v>\d+))?",
            inner, re.I,
        )
        if m:
            from database_anonymiser_spark.sources.materialized import (
                _LOSS_KINDS,
                materialized_info,
            )

            vt = _vt(m.group(1))
            if out.get("pinned"):
                # mirror execution: the real REFRESH refuses pinned
                # registrations (round-15 review fix)
                raise SqlDmlError(
                    f"REFRESH target {m.group(1)!r} is pinned to a "
                    "historical version/timestamp; maintenance runs at "
                    "the head only"
                )
            try:
                info = materialized_info(vt)
            except ValueError as e:
                raise SqlDmlError(str(e)) from e
            src = VersionedTable(spark, info["source"])
            head = src.latest_version()
            to = int(m.group("v")) if m.group("v") else head
            if m.group("v") and not info["last_version"] <= to <= head:
                # the same range refusal refresh_materialized raises —
                # EXPLAIN must not describe a statement that will refuse
                raise SqlDmlError(
                    f"refresh to_version {to} is outside "
                    f"[watermark {info['last_version']}, source head "
                    f"{head}]"
                )
            out["class"] = "refresh_materialized_view"
            out["native_op"] = "ivm_delta_merge"
            out["source"] = info["source"]
            out["watermark"] = info["last_version"]
            out["source_head"] = head
            out["to_version"] = to
            out["would_noop"] = to <= info["last_version"]
            out["loss_aggs"] = sorted(
                c for c, (k, e) in info["aggs"].items() if k in _LOSS_KINDS
            )
            return out
    if uk:
        # any other claimed maintenance statement: class + target only
        out["class"] = uk
        t = statement_target(inner)
        if t and t.lower() in versioned_views:
            _vt(t)
        return out
    m = re.match(
        rf"SELECT\s+.+?\s+FROM\s+({_IDENT})\s*(?:WHERE\s+(?P<w>.+))?$",
        inner, re.I | re.S,
    )
    if m:
        vt = _vt(m.group(1))
        out["class"] = "select"
        out["native_op"] = "pushdown_scan"
        _scan_effect(
            vt, derive_prune(m.group("w").strip()) if m.group("w") else {}
        )
        return out
    raise SqlDmlError(
        "EXPLAIN supports the engine's own statement shapes "
        "(UPDATE/DELETE/INSERT/MERGE/ERASE/OPTIMIZE and single-table "
        "SELECT on a versioned view); other statements take Spark's "
        "own EXPLAIN"
    )


def execute_utility(
    spark, stmt: str, versioned_views: dict[str, dict],
    dryrun: bool = False,
) -> dict:
    """Run one maintenance statement against its ``--versionedTable``
    target: OPTIMIZE → incremental clustering (or bin-pack compaction
    when no clustering key is declared) / OPTIMIZE ZORDER BY → full
    z-order rewrite; VACUUM → orphan or retention reclaim; RESTORE →
    forward rollback commit; DESCRIBE HISTORY/DETAIL → the log's own
    metadata as rows; ALTER TABLE ... CLUSTER BY → declare the
    clustering key. Mutating statements require an UN-pinned view;
    DESCRIBE works on pinned registrations too (it reads the log, not
    a snapshot)."""
    from database_anonymiser_spark.sources.versioned import VersionedTable

    kind = classify_utility(stmt)
    s = _strip_stmt(stmt)
    if kind == "explain":
        return _execute_explain(spark, s, stmt, versioned_views)

    def _table(name: str, mutating: bool = True) -> "VersionedTable":
        meta = versioned_views.get(_unquote(name).lower())
        if meta is None:
            raise SqlDmlError(
                f"{kind.upper()} target {name!r} is not a versioned view "
                "(--versionedTable registers one)"
            )
        if mutating and meta["pinned"]:
            raise SqlDmlError(
                f"{kind.upper()} target {name!r} is pinned to a historical "
                "version/timestamp; maintenance runs at the head only"
            )
        t = VersionedTable(spark, meta["root"])
        # content-rewriting maintenance on a MATERIALIZED VIEW would
        # diverge it from its definition while the recorded watermark
        # masks the divergence (round 14); layout ops (OPTIMIZE, VACUUM,
        # CLUSTER BY) and reads stay allowed — they preserve the rows
        if kind in ("restore", "truncate", "erase") and "ivm.source" in (
            t._raw_properties() or {}
        ):
            raise SqlDmlError(
                f"{kind.upper()} target {name!r} is a MATERIALIZED VIEW "
                "— its contents are derived; mutate the source and "
                "REFRESH MATERIALIZED VIEW (or drop and re-create the "
                "view) instead"
            )
        return t

    def _cols(seg: str) -> tuple:
        return tuple(
            _unquote(c) for c in _split_top(seg) if c.strip()
        )

    if kind == "optimize":
        m = re.fullmatch(
            rf"OPTIMIZE\s+({_IDENT})"
            r"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]*)\)"
            r"|\s+MERGE\s+RUNS\s+(?P<mr>\d+))?"
            r"(?:\s+WHERE\s+(?P<w>.+))?",
            s, re.I | re.S,
        )
        if not m:
            raise SqlDmlError(f"unsupported OPTIMIZE shape\n{_UTILITY_GRAMMAR}")
        t = _table(m.group(1))
        if m.group("w") is not None:
            # OPTIMIZE ... WHERE (round 15 — Delta's scoped OPTIMIZE):
            # recluster ONLY the files whose stats overlap the
            # predicate's derived range, rewritten whole (the row set
            # must not change), everything else untouched — the
            # epoch-by-epoch maintenance loop a 100 TB table actually
            # runs. Routes to optimize_zorder(where=) (round 9), the
            # range dict coming from the same derive_prune that scopes
            # SQL UPDATE/DELETE.
            if not m.group("z"):
                raise SqlDmlError(
                    "OPTIMIZE ... WHERE needs ZORDER BY (<cols>): the "
                    "scoped rewrite is a scoped z-order; incremental "
                    "clustering (OPTIMIZE on a CLUSTER BY table) is "
                    "already scoped to unclustered files"
                )
            rng = derive_prune(m.group("w").strip())
            if not rng:
                raise SqlDmlError(
                    "OPTIMIZE ... WHERE derives no file-skipping range "
                    "from the predicate (top-level AND of col-vs-literal "
                    "conjuncts required) — an unscoped WHERE would "
                    "silently rewrite the whole table; drop the WHERE "
                    "to do that explicitly"
                )
            v = t.optimize_zorder(_cols(m.group("z")), where=rng)
            return {
                "mode": "sql_utility", "op": "optimize_zorder",
                "table": _unquote(m.group(1)), "new_version": int(v),
                "scope": {c: list(b) if isinstance(b, tuple) else b
                          for c, b in rng.items()},
                "statement": stmt,
            }
        if m.group("z"):
            v = t.optimize_zorder(_cols(m.group("z")))
            op = "optimize_zorder"
        elif t.clustering_cols():
            # MERGE RUNS k = the round-13 bounded cross-generation merge
            mr = m.group("mr")
            v = t.optimize_cluster(
                merge_runs=int(mr) if mr is not None else None
            )
            op = "optimize_cluster"
        elif m.group("mr") is not None:
            raise SqlDmlError(
                "OPTIMIZE ... MERGE RUNS needs a declared clustering key "
                "(ALTER TABLE ... CLUSTER BY first)"
            )
        else:
            v = t.compact()
            op = "compact"
        return {"mode": "sql_utility", "op": op, "table": _unquote(m.group(1)),
                "new_version": int(v), "statement": stmt}
    if kind == "vacuum":
        m = re.fullmatch(
            rf"VACUUM\s+({_IDENT})"
            r"(?:\s+RETAIN\s+(?P<n>\d+(?:\.\d+)?)\s+(?P<unit>VERSIONS|HOURS))?"
            r"(?:\s+(?P<dry>DRY\s+RUN))?",
            s, re.I,
        )
        if not m:
            raise SqlDmlError(f"unsupported VACUUM shape\n{_UTILITY_GRAMMAR}")
        # DRY RUN only lists candidates — pinned views may preflight too
        dry = m.group("dry") is not None
        t = _table(m.group(1), mutating=not dry)
        if m.group("unit") and m.group("unit").upper() == "VERSIONS":
            reclaimed = t.vacuum(
                retain_versions=int(float(m.group("n"))), dry_run=dry
            )
        elif m.group("unit"):
            reclaimed = t.vacuum(retain_hours=float(m.group("n")), dry_run=dry)
        else:
            reclaimed = t.vacuum(dry_run=dry)
        frag = {"mode": "sql_utility", "op": "vacuum",
                "table": _unquote(m.group(1)),
                "files_reclaimed": len(reclaimed), "statement": stmt}
        if dry:
            # Delta's VACUUM ... DRY RUN: the candidate list IS the
            # result — nothing was unlinked ("reclaimed" would lie)
            frag["op"] = "vacuum_dry_run"
            frag["files_would_reclaim"] = frag.pop("files_reclaimed")
            frag["candidates"] = sorted(reclaimed)[:100]
        return frag
    if kind == "restore":
        m = re.fullmatch(
            rf"RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+"
            r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
            r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')",
            s, re.I,
        )
        if not m:
            raise SqlDmlError(f"unsupported RESTORE shape\n{_UTILITY_GRAMMAR}")
        t = _table(m.group(1))
        v = (
            t.restore(int(m.group("v")))
            if m.group("v") is not None
            else t.restore_to_timestamp(m.group("ts"))
        )
        return {"mode": "sql_utility", "op": "restore",
                "table": _unquote(m.group(1)),
                "new_version": int(v), "statement": stmt}
    if kind == "describe":
        m = re.fullmatch(
            rf"DESCRIBE\s+(HISTORY|DETAIL)\s+({_IDENT})", s, re.I
        )
        if not m:
            raise SqlDmlError(f"unsupported DESCRIBE shape\n{_UTILITY_GRAMMAR}")
        t = _table(m.group(2), mutating=False)
        if m.group(1).upper() == "HISTORY":
            rows = [
                {"version": h["version"], "op": h["op"], "ts": h.get("ts"),
                 "adds": len(h.get("adds", [])),
                 "removes": len(h.get("removes", []))}
                for h in t.history()
            ]
        else:
            rows = [t.detail()]
        return {"mode": "sql_utility", "op": f"describe_{m.group(1).lower()}",
                "table": _unquote(m.group(2)), "rows": rows,
                "statement": stmt}
    if kind == "analyze":
        # ANALYZE TABLE (round 15 — Delta's dataSkippingStatsColumns
        # reconfiguration + stats recompute as SQL): footer-only [min,
        # max] harvest for new skipping columns and/or per-file BLOOM
        # sidecars, routed to the r9 native — metadata commit, zero
        # rewrite; tuple blooms (co-occurrence sidecars) stay native
        # (analyze(bloom_cols=[(a, b)])), the SQL face takes single
        # columns
        clist = rf"{_IDENT}(?:\s*,\s*{_IDENT})*"
        m = re.fullmatch(
            rf"ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+STATISTICS\s+FOR"
            rf"(?:\s+COLUMNS\s+(?P<sc>{clist}))?"
            rf"(?:\s+BLOOM\s+COLUMNS\s+(?P<bc>{clist}))?",
            s, re.I,
        )
        if not m or (m.group("sc") is None and m.group("bc") is None):
            raise SqlDmlError(
                "ANALYZE needs: ANALYZE TABLE <view> COMPUTE STATISTICS "
                "FOR [COLUMNS a, b] [BLOOM COLUMNS c, d]\n"
                f"{_UTILITY_GRAMMAR}"
            )
        t = _table(m.group(1))
        sc = _cols(m.group("sc")) if m.group("sc") else ()
        bc = _cols(m.group("bc")) if m.group("bc") else ()
        try:
            v = t.analyze(stats_cols=sc, bloom_cols=bc)
        except ValueError as e:
            raise SqlDmlError(f"ANALYZE refused: {e}") from e
        return {"mode": "sql_utility", "op": "analyze",
                "table": _unquote(m.group(1)), "new_version": int(v),
                "stats_cols": list(sc), "bloom_cols": list(bc),
                "statement": stmt}
    if kind == "truncate":
        m = re.fullmatch(rf"TRUNCATE\s+TABLE\s+({_IDENT})", s, re.I)
        if not m:
            raise SqlDmlError(f"unsupported TRUNCATE shape\n{_UTILITY_GRAMMAR}")
        t = _table(m.group(1))
        if dryrun:
            # transactional since round 15, so previewable like DML —
            # the would-dereference count is the log's footer total
            # (metadata only, no data read)
            return {"mode": "sql_dml_dryrun", "op": "truncate",
                    "table": _unquote(m.group(1)),
                    "rows_would_change": int(t.row_count()),
                    "statement": stmt}
        v = t.truncate()
        return {"mode": "sql_utility", "op": "truncate",
                "table": _unquote(m.group(1)), "new_version": int(v),
                "metrics": (t.commit_meta(v) or {}).get("metrics", {}),
                "statement": stmt}
    if kind == "show":
        m = re.fullmatch(rf"SHOW\s+TBLPROPERTIES\s+({_IDENT})", s, re.I)
        if m:
            # round 15 — Delta's SHOW TBLPROPERTIES: the versioned
            # property map as (key, value) rows, engine-managed slots
            # (ivm.*, identity.*, clustering.*, generated.*) included;
            # readable on pinned registrations (log metadata, no
            # snapshot)
            t = _table(m.group(1), mutating=False)
            props = t.table_properties()
            return {"mode": "sql_utility", "op": "show_tblproperties",
                    "table": _unquote(m.group(1)),
                    "rows": [{"key": k, "value": v}
                             for k, v in sorted(props.items())],
                    "statement": stmt}
        m = re.fullmatch(rf"SHOW\s+CREATE\s+TABLE\s+({_IDENT})", s, re.I)
        if not m:
            raise SqlDmlError(f"unsupported SHOW shape\n{_UTILITY_GRAMMAR}")
        t = _table(m.group(1), mutating=False)
        ddl = show_create_table(t, _unquote(m.group(1)), versioned_views)
        return {"mode": "sql_utility", "op": "show_create_table",
                "table": _unquote(m.group(1)),
                "rows": [{"createtab_stmt": ddl}], "statement": stmt}
    if kind == "drop":
        m = re.fullmatch(
            rf"DROP\s+(?:TABLE|MATERIALIZED\s+VIEW)\s+(?:IF\s+EXISTS\s+)?"
            rf"({_IDENT})",
            s, re.I,
        )
        if not m:
            raise SqlDmlError(f"unsupported DROP shape\n{_UTILITY_GRAMMAR}")
        name = _unquote(m.group(1))
        meta = versioned_views.pop(name.lower())
        # Delta's EXTERNAL-table DROP semantics: deregister only — the
        # commit log and data stay on disk (every table here lives at a
        # user-supplied LOCATION, exactly the class Delta never deletes
        # on DROP); re-register with --versionedTable or CONVERT is the
        # undo, VACUUM/filesystem removal is the explicit data-deletion
        # path. A DROP that silently deleted 100 TB would be a landmine.
        spark.catalog.dropTempView(name)
        return {"mode": "sql_utility", "op": "drop_table", "table": name,
                "root": meta["root"], "data_retained": True,
                "statement": stmt}
    if kind == "refresh":
        m = re.fullmatch(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})"
            rf"(?:\s+TO\s+VERSION\s+(?P<v>\d+))?",
            s, re.I,
        )
        if not m:
            raise SqlDmlError(f"unsupported REFRESH shape\n{_UTILITY_GRAMMAR}")
        t = _table(m.group(1))
        from database_anonymiser_spark.sources.materialized import (
            refresh_materialized,
        )

        try:
            r = refresh_materialized(
                spark, t.root,
                to_version=int(m.group("v")) if m.group("v") else None,
            )
        except ValueError as e:
            raise SqlDmlError(str(e)) from e
        return {"mode": "sql_utility", "op": "refresh_materialized_view",
                "table": _unquote(m.group(1)),
                "new_version": int(t.latest_version()), **r,
                "statement": stmt}
    if kind == "create":
        return _execute_create(spark, s, stmt, versioned_views)
    if kind == "copy":
        m = re.fullmatch(
            rf"COPY\s+INTO\s+({_IDENT})\s+FROM\s+'(?P<p>[^']+)'", s, re.I
        )
        if not m:
            raise SqlDmlError(f"unsupported COPY shape\n{_UTILITY_GRAMMAR}")
        t = _table(m.group(1))
        src = m.group("p")
        from pathlib import Path as _P

        p = _P(src)
        if p.is_dir():
            # regular files only: a Spark output DIRECTORY named
            # x.parquet would otherwise match alongside its part files
            # and double-load every row
            files = sorted(
                str(f) for f in p.rglob("*.parquet") if f.is_file()
            )
        elif p.is_file():
            files = [str(p)]
        else:
            raise SqlDmlError(f"COPY INTO source not found: {src!r}")
        if not files:
            raise SqlDmlError(f"no parquet files under {src!r}")
        # Delta's COPY INTO idempotency: files already loaded FROM THIS
        # SOURCE are skipped on re-run (retry-safe ingest) — the load
        # history is the commit log itself (copy_files witness on each
        # append), so there is no side state to lose. O(commits) tiny
        # JSON reads, same class as every other log walk.
        loaded: set = set()
        for h in t.history():
            hm = h.get("meta") or {}
            if h.get("op") == "append" and hm.get("copy_source") == src:
                loaded.update(hm.get("copy_files") or ())
        new = [f for f in files if f not in loaded]
        if not new:
            return {
                "mode": "sql_utility", "op": "copy_into",
                "table": _unquote(m.group(1)), "files_loaded": 0,
                "files_skipped": len(files),
                "new_version": int(t.latest_version()), "statement": stmt,
            }
        v = t.append(
            spark.read.parquet(*new),
            meta={"copy_source": src, "copy_files": new},
        )
        return {
            "mode": "sql_utility", "op": "copy_into",
            "table": _unquote(m.group(1)), "files_loaded": len(new),
            "files_skipped": len(files) - len(new),
            "new_version": int(v), "statement": stmt,
        }
    if kind == "convert":
        m = re.fullmatch(
            rf"CONVERT\s+TO\s+VERSIONED\s+'(?P<p>[^']+)'\s+"
            rf"KEY\s*\((?P<k>[^)]*)\)(?:\s+AS\s+(?P<n>{_IDENT}))?",
            s, re.I,
        )
        if not m:
            raise SqlDmlError(f"unsupported CONVERT shape\n{_UTILITY_GRAMMAR}")
        from database_anonymiser_spark.sources.versioned import VersionedTable

        kcols = _cols(m.group("k"))
        if len(kcols) != 1:
            raise SqlDmlError(
                "CONVERT takes exactly one KEY column (the footer-stats "
                "adoption harvests single-column bounds)"
            )
        try:
            t = VersionedTable.convert(spark, m.group("p"), key_col=kcols[0])
        except OSError as e:
            raise SqlDmlError(f"CONVERT refused: {e}") from e
        frag = {
            "mode": "sql_utility", "op": "convert",
            "root": m.group("p"),
            "new_version": int(t.latest_version()),
            "files_adopted": int(t.detail()["num_files"]),
            "statement": stmt,
        }
        if m.group("n"):
            name = _unquote(m.group("n"))
            _register_versioned_view(spark, name, m.group("p"), versioned_views)
            frag["table"] = name
        return frag
    if kind == "erase":
        m = re.fullmatch(
            rf"ERASE\s+FROM\s+({_IDENT})\s+WHERE\s+(?P<p>.+)", s, re.I | re.S
        )
        if not m:
            raise SqlDmlError(
                f"ERASE needs FROM <view> WHERE <pred> (an unscoped erase "
                f"would be DELETE-the-table; write it explicitly)\n"
                f"{_UTILITY_GRAMMAR}"
            )
        t = _table(m.group(1))
        pred = _requalify(
            m.group("p").strip(), {_unquote(m.group(1)): ""}
        )
        pred, membership = _resolve_in_subqueries(spark, pred)
        if dryrun:
            # the one dryrun-able maintenance statement (round 15): a
            # GDPR erasure script MUST be previewable before it runs —
            # erase is deliberately not rollbackable, so the row count
            # preview is the only safe rehearsal. Same count path as
            # the DML dryruns (exact membership semantics included).
            from pyspark.sql import functions as F

            would = t.snapshot().where(F.expr(pred or "true"))
            if membership is not None:
                would = _membership_filter(t, would, membership)
            return {"mode": "sql_dml_dryrun", "op": "erase",
                    "table": _unquote(m.group(1)),
                    "rows_would_change": int(would.count()),
                    "statement": stmt}
        result = t.erase(
            pred or "true",
            prune=(derive_prune(pred) or None) if pred else None,
            membership=membership,
        )
        return {"mode": "sql_utility", "op": "erase",
                "table": _unquote(m.group(1)), **result, "statement": stmt}
    # ALTER — the DDL family (round 14): every sub-shape is a
    # metadata-only commit on an existing native (zero data reads or
    # rewrites; the docstrings on add_column/rename_column/drop_column/
    # widen_column pin the 100 TB contracts — NULL-fill at scan,
    # column-mapping physical names, lossless widening matrix)
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMNS?\s*"
        rf"(?:\(\s*({_IDENT})\s+(?P<t1>[^)]+?)\s*\)|({_IDENT})\s+(?P<t2>.+))",
        s, re.I | re.S,
    )
    if m:
        t = _table(m.group(1))
        col = _unquote(m.group(2) or m.group(4))
        dtype = (m.group("t1") or m.group("t2")).strip()
        v = t.add_column(col, dtype)
        return {"mode": "sql_utility", "op": "add_column",
                "table": _unquote(m.group(1)), "column": col,
                "type": dtype, "new_version": int(v), "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+({_IDENT})\s+"
        rf"TO\s+({_IDENT})",
        s, re.I,
    )
    if m:
        t = _table(m.group(1))
        v = t.rename_column(_unquote(m.group(2)), _unquote(m.group(3)))
        return {"mode": "sql_utility", "op": "rename_column",
                "table": _unquote(m.group(1)),
                "from": _unquote(m.group(2)), "to": _unquote(m.group(3)),
                "new_version": int(v), "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMNS?\s*"
        rf"(?:\(\s*({_IDENT})\s*\)|({_IDENT}))",
        s, re.I,
    )
    if m:
        t = _table(m.group(1))
        col = _unquote(m.group(2) or m.group(3))
        v = t.drop_column(col)
        return {"mode": "sql_utility", "op": "drop_column",
                "table": _unquote(m.group(1)), "column": col,
                "new_version": int(v), "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+({_IDENT})\s+"
        rf"TYPE\s+(?P<t>.+)",
        s, re.I | re.S,
    )
    if m:
        t = _table(m.group(1))
        col = _unquote(m.group(2))
        v = t.widen_column(col, m.group("t").strip())
        return {"mode": "sql_utility", "op": "widen_column",
                "table": _unquote(m.group(1)), "column": col,
                "type": m.group("t").strip(), "new_version": int(v),
                "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+({_IDENT})\s+"
        rf"CHECK\s*\((?P<p>.+)\)",
        s, re.I | re.S,
    )
    if m:
        t = _table(m.group(1))
        v = t.add_constraint(_unquote(m.group(2)), m.group("p").strip())
        return {"mode": "sql_utility", "op": "add_constraint",
                "table": _unquote(m.group(1)),
                "constraint": _unquote(m.group(2)),
                "new_version": int(v), "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+({_IDENT})",
        s, re.I,
    )
    if m:
        t = _table(m.group(1))
        v = t.drop_constraint(_unquote(m.group(2)))
        return {"mode": "sql_utility", "op": "drop_constraint",
                "table": _unquote(m.group(1)),
                "constraint": _unquote(m.group(2)),
                "new_version": int(v), "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+SET\s+TBLPROPERTIES\s*"
        rf"\((?P<kv>.+)\)",
        s, re.I | re.S,
    )
    if m:
        t = _table(m.group(1))
        props: dict[str, str] = {}
        for item in _split_top(m.group("kv")):
            # SQL-standard quote escaping: '' inside a literal is one '
            pm = re.fullmatch(
                rf"\s*{_SQ_LIT}\s*=\s*{_SQ_LIT}\s*", item
            )
            if not pm or not pm.group(1):
                raise SqlDmlError(
                    f"malformed TBLPROPERTIES item {item.strip()!r}; "
                    "expected 'key' = 'value'"
                )
            props[_sq_unquote(pm.group(1))] = _sq_unquote(pm.group(2))
        v = t.set_properties(props)
        return {"mode": "sql_utility", "op": "set_properties",
                "table": _unquote(m.group(1)), "properties": props,
                "new_version": int(v), "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+UNSET\s+TBLPROPERTIES\s*"
        rf"\((?P<k>.+)\)",
        s, re.I | re.S,
    )
    if m:
        t = _table(m.group(1))
        keys = []
        for item in _split_top(m.group("k")):
            km = re.fullmatch(rf"\s*{_SQ_LIT}\s*", item)
            if not km or not km.group(1):
                raise SqlDmlError(
                    f"malformed UNSET TBLPROPERTIES item {item.strip()!r}; "
                    "expected 'key'"
                )
            keys.append(_sq_unquote(km.group(1)))
        v = t.unset_properties(keys)
        return {"mode": "sql_utility", "op": "unset_properties",
                "table": _unquote(m.group(1)), "keys": keys,
                "new_version": int(v), "statement": stmt}
    m = re.fullmatch(
        rf"ALTER\s+TABLE\s+({_IDENT})\s+CLUSTER\s+BY\s*\((?P<c>[^)]*)\)",
        s, re.I,
    )
    if not m:
        raise SqlDmlError(
            f"unsupported ALTER TABLE shape\n{_UTILITY_GRAMMAR}"
        )
    t = _table(m.group(1))
    v = t.set_clustering(_cols(m.group("c")))
    return {"mode": "sql_utility", "op": "set_clustering",
            "table": _unquote(m.group(1)), "new_version": int(v),
            "statement": stmt}


def _strip_line_comments(s: str) -> str:
    """Remove ``-- ...`` line comments (outside string literals) — an
    emitted/reviewed script carries them; the statement parsers don't.

    Round-14 fix: this must be ONE linear scan tracking its own string
    state, not a pass over :func:`_mask` — the mask knows nothing about
    comments, so an odd number of quotes INSIDE a comment (``-- the
    user's note``) poisoned its string state and every later comment
    survived stripping, mis-splitting the rest of the script. Here a
    comment's characters never touch the quote state."""
    out: list[str] = []
    i, n = 0, len(s)
    quote: str | None = None
    while i < n:
        c = s[i]
        if quote is not None:
            out.append(c)
            if c == quote:
                quote = None  # '' escapes read as close+reopen: harmless
            i += 1
            continue
        if c in "'\"`":
            quote = c
            out.append(c)
            i += 1
            continue
        if c == "-" and i + 1 < n and s[i + 1] == "-":
            j = s.find("\n", i)
            i = n if j < 0 else j  # the newline survives
            continue
        out.append(c)
        i += 1
    return "".join(out)


def split_statements(script: str) -> list[str]:
    """Split a SQL script on top-level semicolons (quote- and
    comment-aware) — the reference's execution unit is a SCRIPT of
    per-table UPDATE statements (``executor.ts:104-132`` loops tables
    inside one run), so --sqlFile accepts the same shape, including
    ``--`` comment lines."""
    return [
        s.strip()
        for s in _split_top(_strip_line_comments(script), ";")
        if s.strip()
    ]


def execute_dml(
    spark, stmt: str, versioned_views: dict[str, dict], dryrun: bool = False
) -> dict:
    """Run one DML statement against its ``--versionedTable`` target and
    return the report fragment.  ``versioned_views`` maps LOWERCASED view
    name → ``{"root": str, "pinned": bool}`` (pinned = registered with a
    version/timestamp pin → DML refused).  Raises :class:`SqlDmlError`
    for anything out of contract; the caller classifies first with
    :func:`classify_dml`.

    ``dryrun=True`` is the reference's BEGIN … ROLLBACK transaction
    (``executor.ts:98-136``) rendered on an immutable log: the statement
    is fully parsed and validated (target class, pin, MERGE key check,
    column existence via the same native-op preconditions) and the rows
    it WOULD touch are counted — but nothing commits and the table's
    version does not move."""
    from pyspark.sql import functions as F

    from database_anonymiser_spark.sources.versioned import VersionedTable

    kind = classify_dml(stmt)
    if kind is None:  # defensive; the caller classified already
        raise SqlDmlError("not a DML statement")

    def _target_table(name: str) -> "VersionedTable":
        meta = versioned_views.get(name.lower())
        if meta is None:
            raise SqlDmlError(
                f"{kind.upper()} target {name!r} is not a versioned view — "
                "DML runs only against --versionedTable tables (plain "
                "--data parquet views are immutable; the commit log is "
                "what makes DML atomic, CDF-visible and time-travelable)"
            )
        if meta["pinned"]:
            raise SqlDmlError(
                f"{kind.upper()} target {name!r} is pinned to a historical "
                "version/timestamp; DML against a time-travel read is "
                "refused (register the view without @PIN to write at the "
                "head)"
            )
        t = VersionedTable(spark, meta["root"])
        # round 14: a MATERIALIZED VIEW's contents are derived state —
        # direct DML would silently diverge it from its definition and
        # the recorded source watermark would mask the divergence on the
        # next refresh (DBSQL refuses the same)
        props = t._raw_properties() or {}
        if "ivm.source" in props:
            raise SqlDmlError(
                f"{kind.upper()} target {name!r} is a MATERIALIZED VIEW "
                f"— its contents are derived from {props['ivm.source']!r}; "
                "write to the source and REFRESH MATERIALIZED VIEW instead"
            )
        return t

    if kind == "update":
        u = _parse_update(stmt)
        table_name = u.table
        vt = _target_table(u.table)
        membership = None
        if u.predicate:
            # [NOT] IN (SELECT ...) → literal list below the cap (also
            # unlocks derive_prune's IN-list skipping); above it, a
            # conjunct-level term becomes a distributed semi-join spec
            u.predicate, membership = _resolve_in_subqueries(
                spark, u.predicate
            )
        if dryrun:
            would = vt.snapshot().where(F.expr(u.predicate or "true"))
            if membership is not None:
                would = _membership_filter(vt, would, membership)
            n = would.count()
            # the assignment columns go through the same existence check
            # the real op would apply (a typo'd column must fail the
            # dry run too, not just the apply)
            sch = vt.snapshot().schema
            unknown = sorted(set(u.assignments) - {f.name for f in sch.fields})
            if unknown:
                raise SqlDmlError(
                    f"UPDATE assigns columns absent from {u.table!r}: {unknown}"
                )
            return {
                "mode": "sql_dml_dryrun", "op": kind, "table": u.table,
                "rows_would_change": int(n), "statement": stmt,
            }
        new_v = vt.update_where(
            u.assignments,
            u.predicate or "true",
            # file-skipping hints implied by the WHERE (Delta compiles
            # data skipping from the predicate; here the statement front
            # does): a scoped SQL UPDATE reads O(matching files)
            prune=(derive_prune(u.predicate) or None) if u.predicate else None,
            membership=membership,
        )
    elif kind == "delete":
        d = _parse_delete(stmt)
        table_name = d.table
        vt = _target_table(d.table)
        membership = None
        if d.predicate:
            d.predicate, membership = _resolve_in_subqueries(
                spark, d.predicate
            )
        if dryrun:
            would = vt.snapshot().where(F.expr(d.predicate or "true"))
            if membership is not None:
                would = _membership_filter(vt, would, membership)
            n = would.count()
            return {
                "mode": "sql_dml_dryrun", "op": kind, "table": d.table,
                "rows_would_change": int(n), "statement": stmt,
            }
        new_v = vt.delete_where(
            d.predicate or "true",
            prune=(derive_prune(d.predicate) or None) if d.predicate else None,
            membership=membership,
        )
    elif kind == "insert":
        ins = _parse_insert(stmt)
        table_name = ins.table
        vt = _target_table(ins.table)
        sch = vt.snapshot().schema
        ident = vt.identity_column()
        gen_cols = set(vt.generated_columns() or ())
        target_cols = ins.columns or [f.name for f in sch.fields]
        unknown = sorted(set(target_cols) - {f.name for f in sch.fields})
        if unknown:
            raise SqlDmlError(
                f"INSERT names columns absent from {ins.table!r}: {unknown}"
            )
        if ident is not None and ident[0] in target_cols:
            raise SqlDmlError(
                f"identity column {ident[0]!r} is GENERATED ALWAYS; use a "
                "column list that omits it (values are allocated)"
            )
        if ins.values is not None:
            rows_sql = ", ".join("(" + ", ".join(r) + ")" for r in ins.values)
            src = spark.sql(f"VALUES {rows_sql}")
        else:
            src = spark.sql(ins.query)
        if len(src.columns) != len(target_cols):
            raise SqlDmlError(
                f"INSERT arity mismatch: {len(target_cols)} target "
                f"column(s), source has {len(src.columns)}"
            )
        # positional mapping (SQL INSERT semantics), cast to the target
        # types; unnamed columns NULL-fill — except identity (allocated
        # by append) and generated columns (recomputed by append)
        by_type = {f.name: f.dataType for f in sch.fields}
        named = {
            t: F.col(c).cast(by_type[t]).alias(t)
            for c, t in zip(src.columns, target_cols)
        }
        for f in sch.fields:
            if f.name in named or f.name in gen_cols or (
                ident is not None and f.name == ident[0]
            ):
                continue
            named[f.name] = F.lit(None).cast(f.dataType).alias(f.name)
        # schema field order — append's alignment is name-based but a
        # schema-ordered frame is what a reader of the report expects
        df = src.select(*[named[f.name] for f in sch.fields if f.name in named])
        if dryrun:
            return {
                "mode": "sql_dml_dryrun",
                "op": "insert_overwrite" if ins.overwrite else kind,
                "table": ins.table,
                "rows_would_change": int(df.count()), "statement": stmt,
            }
        if ins.overwrite:
            # INSERT OVERWRITE (round 14): atomically replace contents —
            # one commit adds the new files and removes every live one
            new_v = vt.overwrite(df)
            kind = "insert_overwrite"
        else:
            new_v = vt.append(df)
    else:
        mg = _parse_merge(stmt)
        table_name = mg.target
        vt = _target_table(mg.target)
        key_cols = vt.key_cols()
        if not key_cols:
            raise SqlDmlError(
                f"MERGE target {mg.target!r} has no declared key; the "
                "native merge joins on the table key"
            )
        pairs, residual = _parse_on_keys(
            mg.on, mg.target_alias, mg.source_alias, key_cols
        )
        src = (
            spark.sql(mg.source_sql)
            if mg.source_is_query
            else spark.table(mg.source_sql)
        )
        res_sql = " AND ".join(f"({c})" for c in residual) if residual else None
        if res_sql:
            # Delta's residual-ON semantics over the key-joined native
            # merge: matched clauses require the residual; a key-matched
            # pair FAILING it is "not matched by source" under full-ON
            # semantics (target keys are unique — no other source row can
            # match), so the BY SOURCE clauses apply there, gated on NOT
            # residual. WHEN NOT MATCHED inserts stay key-equality-keyed
            # (module docstring: the key-uniqueness deviation).
            mg.matched = [
                (cl[0],
                 res_sql if cl[1] is None else f"({res_sql}) AND ({cl[1]})",
                 *cl[2:])
                for cl in mg.matched
            ]
            not_res = f"NOT coalesce({res_sql}, false)"
            mg.matched.extend(
                (cl[0],
                 not_res if cl[1] is None else f"({not_res}) AND ({cl[1]})",
                 *cl[2:])
                for cl in mg.by_source
            )
            # with neither matched nor by-source clauses the residual has
            # no observable effect (inserts are key-equality-keyed) — the
            # empty matched list already keeps every matched pair
        # the native merge expects the source to carry the TARGET's key
        # column names; rename the ON-mapped source columns over
        for tcol, scol in pairs.items():
            if scol != tcol:
                if tcol in src.columns:
                    raise SqlDmlError(
                        f"cannot rename source key {scol!r} to {tcol!r}: "
                        f"the source already has a {tcol!r} column"
                    )
                src = src.withColumnRenamed(scol, tcol)
        if dryrun:
            key_list = list(key_cols)
            if res_sql:
                # full-ON matched count: key equality AND the residual
                t = vt.snapshot().alias("t")
                s = src.alias("s")
                cond = F.expr(
                    " AND ".join(f"t.{k} = s.{k}" for k in key_list)
                    + f" AND ({res_sql})"
                )
                matched = t.join(s, cond, "inner").count()
            else:
                snap = vt.snapshot().select(*key_list)
                matched = snap.join(
                    src.select(*key_list), key_list, "inner"
                ).count()
            # insert candidates are key-unmatched source rows (module
            # docstring: inserts stay keyed on the key equality)
            unmatched = (
                src.select(*key_list)
                .join(vt.snapshot().select(*key_list), key_list, "left_anti")
                .count()
            )
            return {
                "mode": "sql_dml_dryrun", "op": kind, "table": mg.target,
                "matched_rows": int(matched),
                "unmatched_source_rows": int(unmatched),
                "statement": stmt,
            }
        new_v = vt.merge(
            src,
            matched=mg.matched,
            not_matched=mg.not_matched,
            not_matched_by_source=mg.by_source or None,
        )
    # the one new commit record only (never the whole history — the log
    # can be long; this is the report's operationMetrics slot)
    import json as _json

    from database_anonymiser_spark.sources.versioned import _log_path

    rec = _json.loads(_log_path(vt.root, new_v).read_text())
    return {
        "mode": "sql_dml",
        "op": kind,
        "table": table_name,
        "root": versioned_views[table_name.lower()]["root"],
        "new_version": int(new_v),
        "metrics": (rec.get("meta") or {}).get("metrics", {}),
        "statement": stmt,
    }
