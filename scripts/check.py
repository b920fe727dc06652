#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only — the engine
itself is pure Scala/Spark). Usage:

    python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet produced by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same fixture tables, and
compares: column set (sorted by name), row count, and values (rows sorted).
Floats are compared exactly first; on mismatch the max abs diff is reported so
near-misses (fp ordering) are distinguishable from real bugs.
"""
import duckdb, glob, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    only_rows = []
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf() if files else None
        if name not in oracle:
            only_rows.append((name, 0 if got is None else len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows differ spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        g = sorted([tuple(canon(v) for v in row)
                    for row in got[gc].itertuples(index=False)])
        e = sorted([tuple(canon(v) for v in row)
                    for row in exp[ec].itertuples(index=False)])
        if g == e:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            bad = sum(1 for a, b in zip(g, e) if a != b)
            print(f"FAIL {name}: {bad}/{len(g)} rows differ")
            for a, b in list(zip(g, e))[:200]:
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}")
                    break
            n_fail += 1
    for name, n in only_rows:
        print(f"ROWS-ONLY {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(only_rows)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
