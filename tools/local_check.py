#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate: run each
oracle SQL in DuckDB against the sf parquet tables and diff against the
Verify.scala parquet dumps. Dev-only — the engine itself is pure Scala/Spark.

Usage: python3 tools/local_check.py <sfDir> <verifyOutDir> [--json <out.json>]

--json writes a driver-artifact-shaped record per query
({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}) —
the sf1 sweep (tools/sf1_sweep.sh) uses it to emit CORRECTNESS_SF1.json.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (ScaleGen output)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    record = {}

    def rec(name, rows=False, schema=False, values=False,
            spark_rows=None, oracle_rows=None, err=None):
        record[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": values, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            rec(name, err="no spark output")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(name, err=f"oracle error: {e}")
            n_bad += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            rec(name, rows=len(exp) == len(got), spark_rows=len(got),
                oracle_rows=len(exp), err="column mismatch")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            rec(name, schema=True, spark_rows=len(got), oracle_rows=len(exp))
            n_bad += 1
            continue
        # dtype-strict first: the driver's hash is dtype-sensitive, so a
        # value-for-value match with differing dtypes (e.g. DuckDB HUGEINT ->
        # float64 vs Spark int64) is still a driver FAIL. Compare str(dtype)
        # per column before any value comparison — never coerce.
        dtype_diffs = [f"col {c} dtype exp={exp[c].dtype} got={got[c].dtype}"
                       for c in exp.columns if str(exp[c].dtype) != str(got[c].dtype)]
        if dtype_diffs:
            print(f"FAIL {name}: " + "; ".join(dtype_diffs))
            rec(name, rows=True, spark_rows=len(got), oracle_rows=len(exp),
                err="; ".join(dtype_diffs))
            n_bad += 1
            continue
        # order-insensitive value compare (driver sorts cols by name then hashes)
        ev = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        gv = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        diffs = []
        for c in ev.columns:
            a, b = ev[c], gv[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"col {c} ({neq.sum()} diffs, first@{i}: exp={a[i]!r} got={b[i]!r})")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs))
            rec(name, rows=True, schema=True, spark_rows=len(got),
                oracle_rows=len(exp), err="; ".join(diffs))
            n_bad += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
            rec(name, rows=True, schema=True, values=True,
                spark_rows=len(got), oracle_rows=len(exp))
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    json_out = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: local_check.py <sfDir> <verifyOutDir> [--json <out.json>]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) != 2:
        sys.exit("usage: local_check.py <sfDir> <verifyOutDir> [--json <out.json>]")
    sys.exit(main(args[0], args[1], json_out))
