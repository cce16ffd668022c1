#!/usr/bin/env python3
"""Oracle result-type portability guard (round-6 gate).

The grading driver hash-compares Spark parquet output against DuckDB
running oracle_sql.json, and its hasher distinguishes result TYPES even
when values are bit-equal (round 5: five un-cast integer ``sum(BIGINT)``
columns came back HUGEINT and failed the hash despite identical values).

This guard makes the class unrepresentable going forward. For every
oracle it asserts two things:

1. **Engine-stable output types.** Every oracle result column's DuckDB
   type must be in the allowed portable set (no HUGEINT, no UTINYINT,
   no engine-version-dependent surprises).
2. **Exact Spark/oracle type parity.** The DuckDB type of each oracle
   column must equal the DuckDB-read type of the same column in the
   Spark parquet output (modulo documented equivalences) — if the two
   sides agree column-for-column, no stricter hasher can disagree.

Usage:  python3 tools/oracle_type_guard.py <sfDir> <verifyOutDir>
Exit 0 = all oracles pass; nonzero = violations printed.

Run after `sbt "runMain graft.Verify <sfDir> <outDir>"`, which writes
both the per-query parquet and oracle_sql.json.
"""
import duckdb, glob, json, os, re, sys

ALLOWED = re.compile(
    r"^(BIGINT|INTEGER|DOUBLE|VARCHAR|DATE|BOOLEAN"
    r"|TIMESTAMP(_NS| WITH TIME ZONE)?"
    r"|DECIMAL\(\d+,\d+\))$")

# DuckDB types considered interchangeable for the parity check: the
# driver reads Spark TimestampType parquet as TIMESTAMP regardless of
# physical unit, and treats INTEGER/BIGINT promotion identically on
# both sides only when explicit — so the parity check is EXACT except
# for timestamp physical-unit spellings.
EQUIV = [{"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"}]


def compatible(a: str, b: str) -> bool:
    if a == b:
        return True
    return any(a in g and b in g for g in EQUIV)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    sql = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    bad = []
    checked = 0
    for name in sorted(sql):
        try:
            rel = con.sql(sql[name])
            otypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
            bad.append((name, f"oracle error: {str(e)[:140]}"))
            continue
        for c, t in otypes.items():
            if not ALLOWED.match(t):
                bad.append((name, f"column {c}: non-portable oracle type {t}"))
        d = os.path.join(outdir, name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if files:
            srel = con.sql(f"SELECT * FROM read_parquet({files})")
            stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
            if sorted(stypes) != sorted(otypes):
                bad.append((name, f"columns differ: spark {sorted(stypes)}"
                                  f" vs oracle {sorted(otypes)}"))
            else:
                for c in stypes:
                    if not compatible(stypes[c], otypes[c]):
                        bad.append((name, f"column {c}: spark {stypes[c]}"
                                          f" vs oracle {otypes[c]}"))
        checked += 1
    for name, msg in bad:
        print(f"TYPE-FAIL {name}: {msg}")
    print(f"TYPE-CHECKED: {checked}  VIOLATIONS: {len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
