#!/usr/bin/env python3
"""Oracle-dtype gate (round-8 verdict task #2).

DuckDB's sum(BIGINT) returns DECIMAL(38,0) (and sum over HUGEINT returns
HUGEINT); the driver's content hash is dtype-sensitive, so any oracle
output column that leaks one of these types hash-mismatches a Spark int64
column even when every value is identical — exactly what went red on
q295/q298 in round 8. This lint DESCRIBEs every oracle SQL in DuckDB
(types only, zero rows executed) and fails on any output column whose
type is DECIMAL*/HUGEINT/UHUGEINT.

Usage:
  sbt "runMain graft.OracleDump target/oracle_sql.json"
  python3 tools/oracle_types.py /root/testdata/sf0.001 target/oracle_sql.json
"""
import sys, json, re
from collections import Counter
import duckdb

sf, oracle_file = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(oracle_file))
BANNED = re.compile(r"^(DECIMAL|HUGEINT|UHUGEINT)", re.IGNORECASE)

census, bad, errs = Counter(), [], []
for name, sql in sorted(oracle.items()):
    try:
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        errs.append((name, str(e).splitlines()[0][:200]))
        continue
    for col, typ, *_ in cols:
        census[typ] += 1
        if BANNED.match(typ):
            bad.append((name, col, typ))

print(f"described {len(oracle) - len(errs)}/{len(oracle)} oracles; "
      f"output-column type census:")
for typ, n in census.most_common():
    print(f"  {n:5d}  {typ}")

rc = 0
if errs:
    print(f"\nDESCRIBE ERRORS ({len(errs)}):")
    for n, m in errs:
        print(f"  ERR  {n}: {m}")
    rc = 1
if bad:
    print(f"\nBANNED TYPES ({len(bad)}) — uncast sum()? wrap in "
          f"CAST(... AS BIGINT):")
    for n, c, t in bad:
        print(f"  FAIL {n}.{c}: {t}")
    rc = 1
if rc == 0:
    print("\noracle-type gate: GREEN (no DECIMAL/HUGEINT output columns)")
sys.exit(rc)
