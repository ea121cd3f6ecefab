import duckdb, json, sys, glob, os, decimal, datetime, math
outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
def norm(v):
    return str(v)
fails = 0
names = [n for n in sorted(oracle) if only is None or n in only]
for name in names:
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchall()
        gcols = [d[0] for d in con.description]
        exp_tbl = con.execute(oracle[name]).fetch_arrow_table()
        exp = [tuple(r.values()) for r in exp_tbl.to_pylist()]
        ecols = exp_tbl.schema.names
        # type tripwire: the driver's hasher compares Arrow types strictly,
        # while norm() below string-normalizes them away. A DECIMAL column
        # (e.g. DuckDB SUM(int) -> HUGEINT -> decimal128) passes here but
        # hash-fails the driver -- pin the oracle with CAST(... AS BIGINT)
        # or cast the final output to DOUBLE on both sides.
        for f in exp_tbl.schema:
            if 'decimal' in str(f.type):
                print(f"TYPEWARN {name}: oracle column {f.name} is {f.type} "
                      f"(driver hash will mismatch vs Spark's physical type)")
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: cols {sorted(gcols)} vs {sorted(ecols)}"); fails += 1; continue
    gi = [gcols.index(c) for c in sorted(gcols)]
    ei = [ecols.index(c) for c in sorted(ecols)]
    g = sorted(tuple(norm(r[i]) for i in gi) for r in got)
    e = sorted(tuple(norm(r[i]) for i in ei) for r in exp)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    if g != e:
        diffs = [(a,b) for a,b in zip(g,e) if a != b]
        print(f"FAIL {name}: {len(diffs)} differing rows; cols={sorted(gcols)}")
        for a,b in diffs[:2]:
            print(f"   spark:  {a}")
            print(f"   oracle: {b}")
        fails += 1; continue
    print(f"OK   {name} ({len(g)} rows)")
print(f"{'='*30}\n{len(names)-fails}/{len(names)} passed")
