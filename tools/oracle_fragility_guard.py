#!/usr/bin/env python3
"""Oracle VALUE-portability linter (round-7 gate).

The r6 round demonstrated the class the r5 type guard cannot see:
oracle SQL whose *values* depend on the DuckDB release, passing every
local gate (bit-equal under DuckDB 1.0.0) and still hash-failing at the
driver. Two mechanisms were root-caused:

  - q_holt: a recursive-CTE smoothing walk quantized each step with
    ``CAST(... AS DECIMAL(18,9))``. DuckDB 1.0.0 TRUNCATES on
    scale-narrowing decimal casts; DuckDB >= 1.1 ROUNDS. Every step
    drifted in the 9th decimal on newer engines.
  - q_acf: ``DECIMAL(19,0) x DECIMAL(19,0)`` products land exactly on
    the width-38 decimal ceiling, where DuckDB's multiply-width and
    overflow-promotion rules have shifted across releases.

This linter statically scans oracle_sql.json for those constructs so
the class cannot recur. Rules:

  R1 (narrowing decimal cast on decimal arithmetic): a
     ``CAST(expr AS DECIMAL(p,s))`` where ``expr`` itself contains a
     nested ``DECIMAL(p2,s2)`` operand combined with arithmetic whose
     exact result scale exceeds ``s`` (for ``*`` the scales add; for
     ``+``/``-`` the max operand scale carries) — the cast must then
     drop fractional digits, and WHICH WAY it drops is a DuckDB
     release note. Fix: run the recurrence in scaled-BIGINT fixed
     point with the explicit trunc-div idiom ``(x - x % d) / d``.

  R2 (width-38 product headroom): any ``DECIMAL(p,s)`` declaration
     with 19 <= p <= 37 — a product of two such values has width
     >= 38, the engine ceiling where promotion semantics moved.
     Declared sums ARE allowed to accumulate into DECIMAL(38,s) (the
     repo's established wider-lattice idiom); what must stay narrow is
     every MULTIPLICAND. Fix: keep multiplicands at p <= 18 so
     products stay at width <= 37.

  R3 (decimal arithmetic inside a recursive CTE): any CTE body that
     references its own name (i.e. is actually recursive) and mentions
     ``DECIMAL`` — per-step decimal rounding compounds across the
     recursion, so even one release-sensitive digit diverges the whole
     walk. Fix: integer/trunc-div space inside recursions, decimal
     casts only in the final projection.

  R4 (recursive self-reference inside a subquery): a recursive CTE
     whose self-reference sits inside a nested parenthesized scope
     (derived table / subquery) — engines differ in how liberally they
     accept that placement, so SQL that parses on the local DuckDB can
     be a hard parse/bind ERROR on the driver's newer one. Fix: keep
     the recursive term a single flat SELECT; inline step expressions
     instead of wrapping the self-join in a derived table (the r7
     q_holt flattening).

  R2b (width-38 multiplicand): a ``CAST(... AS DECIMAL(38,s))`` whose
     result is directly an operand of ``*`` — the product of two
     width-38 decimals can only be resolved AT the engine ceiling,
     exactly where promotion semantics moved (the r6 q_acf mechanism,
     reachable without any 19..37 declaration that R2 would see).
     DECIMAL(38,s) stays allowed as a sum ACCUMULATOR.

  R5 (decimal-TYPED hashed output column — the r7 blind spot): the r7
     q_acf fix narrowed multiplicands to DECIMAL(18,0) so products sit
     at width <= 37, off the R2 ceiling — and the driver STILL
     hash-failed it (rows + schema green, hash red). The evidence now
     isolates the class precisely: across 433 driver-green queries and
     7 rounds, decimal ARITHMETIC finalized through a non-decimal cast
     (``CAST(sum(...) AS DOUBLE)`` — the whole TPC-H family) has never
     drifted, while the ONLY query whose final select list emitted a
     decimal-TYPED column (q_acf: DECIMAL(38,0) sums of magnitude
     > 2^53) failed under two different width regimes. A decimal-typed
     result column is a bet on the engine's decimal surface — width
     promotion AND how the release materializes wide decimals into the
     comparator (e.g. arrow/pandas conversion) — neither of which the
     row/schema checks can see. R5 therefore traces column types
     through the CTE chain (a ``CAST(... AS DECIMAL) AS name`` or a
     fractional literal makes an expression decimal; SUM/MIN/MAX/AVG/
     ROUND/ABS/arithmetic propagate it; CAST to DOUBLE/BIGINT/...
     clears it; ``/`` always yields DOUBLE) and flags any FINAL select
     expression that is still decimal-typed. No width is exempt — the
     r7 verdict's DECIMAL(38,0)-pure-accumulator allowance is dropped
     deliberately: it is exercised by ZERO green queries, so allowing
     it buys nothing and keeps a driver coin flip alive.
     Fix: finalize every decimal expression with a non-decimal cast,
     or better, restate exact wide arithmetic as BIGINT limb sums
     (``c = c_hi*10^6 + c_lo`` — the r8 q_acf rewrite).

Usage:  python3 tools/oracle_fragility_guard.py <verifyOutDir>
        python3 tools/oracle_fragility_guard.py --selftest
Exit 0 = no fragile constructs (or self-test passed); nonzero
otherwise. Purely static — no DuckDB connection, no data needed.
"""
import json
import os
import re
import sys

DEC = re.compile(r"DECIMAL\((\d+)\s*,\s*(\d+)\)", re.IGNORECASE)
# numeric literal with a fractional part, e.g. 0.3 / 100.0
FRACLIT = re.compile(r"(?<![\w.])\d+\.(\d+)(?![\w.])")


def _strip_strings(sql: str) -> str:
    return re.sub(r"'[^']*'", "''", sql)


def _balanced(sql: str, start: int) -> str:
    """Return the text inside the paren opening at sql[start] == '('."""
    depth = 0
    for i in range(start, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return sql[start + 1:i]
    return sql[start + 1:]


def _casts(sql: str):
    """Yield (inner_expr, precision, scale) for each CAST(... AS DECIMAL)."""
    for m in re.finditer(r"CAST\s*\(", sql, re.IGNORECASE):
        inner_full = _balanced(sql, m.end() - 1)
        tm = re.search(r"\bAS\s+DECIMAL\((\d+)\s*,\s*(\d+)\)\s*$",
                       inner_full, re.IGNORECASE)
        if tm:
            yield inner_full[:tm.start()], int(tm.group(1)), int(tm.group(2))


def _rule1(sql: str):
    """Narrowing decimal cast over decimal arithmetic."""
    hits = []
    for inner, p, s in _casts(sql):
        nested = [int(sc) for _, sc in DEC.findall(inner)]
        if not nested:
            continue
        lits = [len(d) for d in FRACLIT.findall(inner)]
        if "*" in inner:
            two = sorted(nested, reverse=True)[:2]
            exact = two[0] + (two[1] if len(two) > 1 else max(lits, default=0))
        elif "/" in inner:
            # division result scale is engine-defined; any nested decimal
            # operand under a narrowing cast is fragile
            exact = max(nested) + 1
        elif "+" in inner or "-" in inner:
            exact = max(nested + lits)
        else:
            continue
        if s < exact:
            hits.append(f"CAST(...{p},{s}) narrows decimal arithmetic "
                        f"of exact scale >= {exact}")
    return hits


def _rule2(sql: str):
    hits = []
    for p, s in {(int(a), int(b)) for a, b in DEC.findall(sql)}:
        if 19 <= p <= 37:
            hits.append(f"DECIMAL({p},{s}) multiplicand width: a product "
                        f"of two reaches >= 38 (engine ceiling)")
    return hits


def _rule3(sql: str):
    hits = []
    for m in re.finditer(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", sql,
                         re.IGNORECASE):
        name, body = m.group(1), _balanced(sql, m.end() - 1)
        if name.upper() in ("CAST", "SUM", "MIN", "MAX", "AVG", "COUNT"):
            continue
        selfref = re.search(rf"\b(?:FROM|JOIN)\s+{re.escape(name)}\b", body,
                            re.IGNORECASE)
        if selfref and re.search(r"\bDECIMAL\b", body, re.IGNORECASE):
            hits.append(f"recursive CTE '{name}' carries DECIMAL "
                        f"arithmetic across steps")
    return hits


def _rule4(sql: str):
    hits = []
    for m in re.finditer(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", sql,
                         re.IGNORECASE):
        name, body = m.group(1), _balanced(sql, m.end() - 1)
        selfref = rf"\b(?:FROM|JOIN)\s+{re.escape(name)}\b"
        if not re.search(selfref, body, re.IGNORECASE):
            continue
        for sm in re.finditer(r"\(", body):
            if re.search(selfref, _balanced(body, sm.start()),
                         re.IGNORECASE):
                hits.append(f"recursive CTE '{name}' self-reference "
                            f"inside a subquery/derived table")
                break
    return hits


def _rule2b(sql: str):
    """Width-38 decimal cast used directly as a multiplicand."""
    hits = []
    for m in re.finditer(r"CAST\s*\(", sql, re.IGNORECASE):
        inner = _balanced(sql, m.end() - 1)
        if not re.search(r"\bAS\s+DECIMAL\(38\s*,\s*\d+\)\s*$", inner,
                         re.IGNORECASE):
            continue
        end = m.end() + len(inner) + 1  # index just past the closing ')'
        before = sql[:m.start()].rstrip()
        after = sql[end:].lstrip()
        if after.startswith("*") or before.endswith("*"):
            hits.append("DECIMAL(38,s) cast as a multiplicand: the "
                        "product can only resolve at the width-38 "
                        "engine ceiling")
    return hits


# ---- R5: a minimal decimal-type tracer over the SQL's column flow ----

# functions that return DOUBLE regardless of argument type
_DOUBLE_FNS = {"ln", "log", "log2", "log10", "sqrt", "exp", "sin", "cos",
               "tan", "atan", "atan2", "pow", "power", "random", "pi",
               "degrees", "radians", "epoch_us", "epoch_ms", "epoch"}
# functions whose result is decimal iff any argument is decimal
_PROPAGATE_FNS = {"sum", "min", "max", "avg", "round", "abs", "floor",
                  "ceil", "ceiling", "coalesce", "ifnull", "greatest",
                  "least", "if", "trunc", "truncate", "median", "mode",
                  "first", "last", "any_value", "lead", "lag",
                  "first_value", "last_value", "nth_value"}
_IDENT = re.compile(r"^(?:\w+\.)?(\w+)$")


def _split_top(s: str, seps=(",",)):
    """Split on top-level separators (not inside parens or strings)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and ch in seps:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _top_keyword_spans(s: str, word: str):
    """Offsets of top-level (paren-depth-0) occurrences of ``word``."""
    out, depth = [], 0
    for m in re.finditer(r"[()]|\b" + word + r"\b", s, re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            out.append(m.start())
    return out


def _parse_ctes(sql: str):
    """Return ([(name, body), ...], main_query_text)."""
    m = re.match(r"\s*WITH\s+(?:RECURSIVE\s+)?", sql, re.IGNORECASE)
    if not m:
        return [], sql
    ctes, pos = [], m.end()
    while True:
        hm = re.match(r"\s*(\w+)\s*(?:\([^)]*\))?\s*AS\s*\(", sql[pos:],
                      re.IGNORECASE)
        if not hm:
            break
        body = _balanced(sql, pos + hm.end() - 1)
        ctes.append((hm.group(1).lower(), body))
        pos += hm.end() + len(body) + 1
        cm = re.match(r"\s*,", sql[pos:])
        if not cm:
            break
        pos += cm.end()
    return ctes, sql[pos:]


def _select_list(query: str):
    """Top-level select-list expressions of ``query``'s first SELECT."""
    sels = _top_keyword_spans(query, "SELECT")
    if not sels:
        return []
    start = sels[0] + len("SELECT")
    rest = query[start:]
    rest = re.sub(r"^\s*(DISTINCT|ALL)\b", "", rest, flags=re.IGNORECASE)
    froms = _top_keyword_spans(rest, "FROM")
    unions = _top_keyword_spans(rest, "UNION")
    end = min(froms + unions + [len(rest)])
    return [e.strip() for e in _split_top(rest[:end]) if e.strip()]


def _alias_of(expr: str):
    """Split a trailing top-level ``AS name`` / bare-name alias."""
    spans = _top_keyword_spans(expr, "AS")
    if spans:
        tail = expr[spans[-1] + 2:].strip()
        if re.fullmatch(r"\w+", tail):
            return expr[:spans[-1]].strip(), tail.lower()
    return expr.strip(), None


def _is_decimal(expr: str, dec_cols) -> bool:
    """Heuristic: does ``expr`` evaluate to a DECIMAL-typed value?"""
    e = expr.strip()
    while e.startswith("(") and _balanced(e, 0) == e[1:-1]:
        e = e[1:-1].strip()
    if not e:
        return False
    cm = re.match(r"CAST\s*\(", e, re.IGNORECASE)
    if cm and e.endswith(")") and len(_balanced(e, cm.end() - 1)) \
            == len(e) - cm.end() - 1:
        inner = _balanced(e, cm.end() - 1)
        tm = re.search(r"\bAS\s+(\w+)\s*(\(\s*\d+\s*(?:,\s*\d+\s*)?\))?\s*$",
                       inner, re.IGNORECASE)
        if tm:
            return tm.group(1).upper() in ("DECIMAL", "NUMERIC")
    # CASE is decimal iff any THEN/ELSE arm is decimal (DuckDB unifies
    # a decimal arm with integer/NULL arms INTO decimal) — checked
    # before the '/'-split below so a division inside a WHEN condition
    # cannot short-circuit the arm scan. Regex-level arm extraction is
    # deliberate: nested CASEs degrade to extra candidate arms, which
    # only errs toward flagging.
    if re.match(r"CASE\b", e, re.IGNORECASE) and \
            re.search(r"\bEND\s*$", e, re.IGNORECASE):
        arms = re.findall(r"\bTHEN\b(.*?)(?=\bWHEN\b|\bELSE\b|\bEND\b)", e,
                          re.IGNORECASE | re.DOTALL)
        em = re.search(r"\bELSE\b(.*?)\bEND\s*$", e,
                       re.IGNORECASE | re.DOTALL)
        if em:
            arms.append(em.group(1))
        return any(_is_decimal(a.strip(), dec_cols)
                   for a in arms if a.strip())
    # top-level division always lands in DOUBLE on DuckDB
    if len(_split_top(e, seps=("/",))) > 1:
        return False
    for part in (p for sep in ("+", "-", "*")
                 for p in (_split_top(e, seps=(sep,))
                           if len(_split_top(e, seps=(sep,))) > 1 else [])):
        if part.strip() and _is_decimal(part, dec_cols):
            return True
    if len(_split_top(e, seps=("+",))) > 1 or \
            len(_split_top(e, seps=("-",))) > 1 or \
            len(_split_top(e, seps=("*",))) > 1:
        return False
    fm = re.match(r"(\w+)\s*\(", e)
    if fm and e.endswith(")"):
        fn = fm.group(1).lower()
        args = _balanced(e, fm.end() - 1)
        if fn in _DOUBLE_FNS:
            return False
        if fn in _PROPAGATE_FNS:
            return any(_is_decimal(a, dec_cols)
                       for a in _split_top(args) if a.strip())
        return False
    im = _IDENT.match(e)
    if im:
        return im.group(1).lower() in dec_cols
    # a bare fractional literal IS a DECIMAL on DuckDB
    return bool(re.fullmatch(r"-?\d+\.\d*", e))


def _referenced_ctes(query: str, known) -> set:
    """Names from ``known`` that ``query`` reads via FROM/JOIN (any
    nesting depth — the finditer walks subqueries too, a conservative
    union)."""
    return {m.group(1).lower()
            for m in re.finditer(r"\b(?:FROM|JOIN)\s+(\w+)", query,
                                 re.IGNORECASE)
            if m.group(1).lower() in known}


def _rule5(sql: str):
    """Decimal-TYPED final output column — the r7 blind spot.

    Decimal marks are tracked PER CTE SCOPE (r10, r9 advisor finding):
    the old single flat set let any later CTE that rebound a name
    non-decimally clear the mark globally, so a main query still
    reading the EARLIER cte's decimal column false-negatived — the
    unsafe direction for this lint. Each CTE now resolves its column
    references against only the CTEs it actually reads, and the main
    SELECT likewise; a name bound decimal in one branch and clean in
    another stays flagged wherever the decimal branch is read.
    (The house ``CAST(rev AS DOUBLE) AS rev`` finalize still clears
    the mark for everything reading the finalizing CTE.)
    """
    ctes, main = _parse_ctes(sql)
    scopes = {}  # cte name -> decimal-typed output aliases of that cte
    for name, body in ctes:
        visible = set()
        for ref in _referenced_ctes(body, scopes.keys()):
            visible |= scopes[ref]
        out = set()
        for raw in _select_list(body):
            e, alias = _alias_of(raw)
            if not alias:
                continue
            if _is_decimal(e, visible):
                out.add(alias)
        scopes[name] = out
    visible = set()
    for ref in _referenced_ctes(main, scopes.keys()):
        visible |= scopes[ref]
    hits = []
    for raw in _select_list(main):
        e, alias = _alias_of(raw)
        if _is_decimal(e, visible):
            hits.append(f"final output column '{alias or e[:40]}' is "
                        f"decimal-TYPED: a hashed decimal surface is "
                        f"release-sensitive at ANY width — finalize "
                        f"with a non-decimal cast or BIGINT limbs")
    return hits


RULES = (_rule1, _rule2, _rule2b, _rule3, _rule4, _rule5)


def lint(oracles: dict) -> int:
    bad = 0
    for name in sorted(oracles):
        sql = _strip_strings(oracles[name])
        for rule in RULES:
            for msg in rule(sql):
                print(f"FRAGILE {name}: {msg}")
                bad += 1
    print(f"FRAGILITY-CHECKED: {len(oracles)}  VIOLATIONS: {bad}")
    return 1 if bad else 0


# The two r6 driver-failed constructs, verbatim shape (abridged data
# flow), proving the linter would have caught them before the r7 fix.
SELFTEST = {
    # r10 scoped-shadowing pin (r9 advisor finding): CTE g rebinds
    # `rev` non-decimally, but the main query reads CTE m — the DECIMAL
    # binding. The flat-set shadowing let g's rebind clear m's mark
    # globally (false NEGATIVE); per-CTE scopes must still flag it.
    "prefix_scope_shadow": """WITH m AS (
  SELECT y, sum(CAST(price AS DECIMAL(18,2))) AS rev FROM t GROUP BY y),
g AS (SELECT y, CAST(rev AS DOUBLE) AS rev FROM m)
SELECT y, rev FROM m ORDER BY y""",
    "prefix_q_holt": """WITH RECURSIVE series AS (
  SELECT user_id, CAST(x AS DECIMAL(18,9)) AS x,
    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM daily),
walk AS (
  SELECT user_id, rn, x AS l, CAST(0 AS DECIMAL(18,9)) AS b
  FROM series WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn,
    CAST(0.3 * s.x + (1 - 0.3) * (w.l + w.b) AS DECIMAL(18,9)),
    CAST(0.2 * (CAST(0.3 * s.x + (1 - 0.3) * (w.l + w.b) AS DECIMAL(18,9)) - w.l)
         + (1 - 0.2) * w.b AS DECIMAL(18,9))
  FROM walk w JOIN series s ON s.user_id = w.user_id AND s.rn = w.rn + 1)
SELECT user_id, l AS level, b AS trend FROM walk""",
    "prefix_q_acf": """WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY 1)
SELECT l.lag, CAST(sum(a.c * b.c) AS DECIMAL(38,0)) AS sxy
FROM lags l JOIN daily a ON true JOIN daily b ON b.d = a.d + 1
GROUP BY l.lag""",
    # the r7 q_acf shape that STILL failed at the driver: multiplicands
    # narrowed to DECIMAL(18,0) (products <= width 37, off the R2
    # ceiling) — only R5 sees the decimal product inside the SUM
    "prefix_q_acf_r7": """WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DECIMAL(18,0)) AS c
  FROM orders GROUP BY 1)
SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(a.c * b.c) AS DECIMAL(38,0)) AS sxy,
  CAST(sum(a.c) AS DECIMAL(38,0)) AS sx
FROM lags l JOIN daily a ON true JOIN daily b ON b.d = a.d + 1
GROUP BY l.lag""",
    # the r7 q_holt shape BEFORE flattening: the recursive self-
    # reference rode a derived table (rule R4)
    "prefix_q_holt_subquery": """WITH RECURSIVE walk AS (
  SELECT user_id, rn, x AS l9 FROM series WHERE rn = 1
  UNION ALL
  SELECT user_id, rn, lnew9 AS l9
  FROM (
    SELECT s.user_id, s.rn, w.l9 + s.x AS lnew9
    FROM walk w JOIN series s ON s.user_id = w.user_id AND s.rn = w.rn + 1))
SELECT user_id, l9 FROM walk""",
    # the r8 advisor's R5 blind spot: a CASE whose THEN arm carries the
    # decimal column — engines unify the arms INTO decimal, so the
    # hashed surface is decimal-typed even though no arm-free branch
    # of _is_decimal would see it
    "prefix_case_arm_decimal": """WITH m AS (
  SELECT k, sum(CAST(price AS DECIMAL(18,2))) AS rev FROM t GROUP BY k)
SELECT k, CASE WHEN k > 0 THEN rev ELSE 0.0 END AS rev FROM m""",
}

# Shapes the linter must NOT flag — each is a confirmed r8 false
# positive (or a house idiom) that a too-eager rule would ban.
SELFTEST_CLEAN = {
    # q_mom_growth's r8 shape: CTE m accumulates in DECIMAL(18,2), CTE
    # g SHADOWS the same column name with a DOUBLE finalize — the final
    # hashed surface is DOUBLE. Without per-name shadowing, R5
    # false-positives on the finalized name (r8 advisor finding).
    "clean_shadowed_double": """WITH m AS (
  SELECT y, sum(CAST(price AS DECIMAL(18,2))) AS rev FROM t GROUP BY y),
g AS (SELECT y, CAST(rev AS DOUBLE) AS rev,
        CAST(lag(rev) OVER (ORDER BY y) AS DOUBLE) AS prev FROM m)
SELECT y, rev,
  CASE WHEN prev IS NULL THEN NULL
       ELSE (rev - prev) / prev * 100.0 END AS pct
FROM g ORDER BY y""",
    # the house finalize idiom itself: decimal accumulator, DOUBLE cast
    # in the final projection
    "clean_double_finalize": """WITH m AS (
  SELECT k, sum(CAST(price AS DECIMAL(18,2))) AS rev FROM t GROUP BY k)
SELECT k, CAST(rev AS DOUBLE) AS rev FROM m""",
    # pure BIGINT limb arithmetic with the trunc-div idiom (the q_acf /
    # q_zscore_outliers recipe) — integer-only, must stay clean
    "clean_bigint_limbs": """WITH s AS (
  SELECT k, CAST(sum(c) AS BIGINT) AS sx FROM t GROUP BY k)
SELECT k, CAST((sx - sx % 1000000) / 1000000 AS BIGINT) AS hi,
  CAST(sx % 1000000 AS BIGINT) AS lo
FROM s""",
}


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        flagged = set()
        for name, sql in {**SELFTEST, **SELFTEST_CLEAN}.items():
            s = _strip_strings(sql)
            if any(rule(s) for rule in RULES):
                flagged.add(name)
        ok = flagged == set(SELFTEST)
        print(f"SELFTEST {'PASS' if ok else 'FAIL'}: flagged {sorted(flagged)}"
              f" (must-not-flag misfires: "
              f"{sorted(flagged & set(SELFTEST_CLEAN))})")
        return 0 if ok else 1
    if len(sys.argv) < 2:
        print("usage: oracle_fragility_guard.py <verifyOutDir> | --selftest",
              file=sys.stderr)
        return 2
    outdir = sys.argv[1]
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    return lint(oracles)


if __name__ == "__main__":
    sys.exit(main())
