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


RULES = (_rule1, _rule2, _rule3, _rule4)


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
}


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        flagged = set()
        for name, sql in SELFTEST.items():
            s = _strip_strings(sql)
            if any(rule(s) for rule in RULES):
                flagged.add(name)
        ok = flagged == set(SELFTEST)
        print(f"SELFTEST {'PASS' if ok else 'FAIL'}: flagged {sorted(flagged)}")
        return 0 if ok else 1
    outdir = sys.argv[1]
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    return lint(oracles)


if __name__ == "__main__":
    sys.exit(main())
