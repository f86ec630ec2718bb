#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables and compare against the Verify
parquet dumps (columns sorted by name, rows sorted, exact equality)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []

# --expect-all (full runs): a query that FAILED TO DUMP must read as a
# failure, not as silence — this loop otherwise only sees dirs that
# exist (a SPARK_GRAFT_VERIFY_ONLY run legitimately dumps a subset,
# so the check is opt-in)
if "--expect-all" in sys.argv:
    dumped = {n for n in os.listdir(out_dir)
              if os.path.isdir(f"{out_dir}/{n}")}
    for name in sorted(set(oracle) - dumped):
        print(f"{name}: MISSING DUMP (query failed in Verify?)")
        fails.append(name)
for name in sorted(os.listdir(out_dir)):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"{name}: NO PARQUET"); fails.append(name); continue
    got = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows)",
              "OK" if len(got) > 0 else "EMPTY!")
        if len(got) == 0: fails.append(name)
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails.append(name); continue
    ok = True
    if sorted(got.columns) != sorted(exp.columns):
        print(f"{name}: COLUMN MISMATCH {sorted(got.columns)} vs {sorted(exp.columns)}")
        ok = False
    elif len(got) != len(exp):
        print(f"{name}: ROWCOUNT {len(got)} vs {len(exp)}")
        ok = False
    else:
        g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
        e = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
        for c in sorted(got.columns):
            gc, ec = g[c], e[c]
            if str(gc.dtype) != str(ec.dtype):
                # driver-faithful (round 6): a dtype mismatch FAILS —
                # the driver's hash distinguishes representations that
                # pandas == silently coerces
                print(f"{name}: DTYPE DIFF col {c}: {gc.dtype} vs {ec.dtype}")
                ok = False
            neq = ~((gc == ec) | (gc.isna() & ec.isna()))
            if neq.any():
                i = neq.idxmax()
                print(f"{name}: VALUE DIFF col {c} at row {i}: got={gc[i]!r} exp={ec[i]!r} ({int(neq.sum())} diffs)")
                ok = False
            # driver-faithful (round 6): pandas == treats -0.0 == 0.0,
            # but the driver hashes bit patterns — fail on any signbit
            # asymmetry between value-equal float zeros (this exact
            # class shipped red driver rows in rounds 4 and 5)
            if str(gc.dtype).startswith("float"):
                import numpy as np
                sb = (np.signbit(gc.to_numpy()) ^ np.signbit(ec.to_numpy())) \
                    & ~(gc.isna() | ec.isna()).to_numpy()
                if sb.any():
                    i = int(np.argmax(sb))
                    print(f"{name}: SIGNBIT DIFF col {c} at row {i}: "
                          f"got={gc[i]!r} exp={ec[i]!r} "
                          f"({int(sb.sum())} rows)")
                    ok = False
    print(f"{name}: {'OK' if ok else 'FAIL'} ({len(got)} rows)")
    if not ok: fails.append(name)

print("\n=== SUMMARY:", "ALL OK" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
