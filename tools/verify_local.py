#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
sfDir tables, sorts rows and columns by name, and compares values exactly.
Dev-only tool (driver-side python env); not part of the engine.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"  X {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            print(f"  X {name}: COLUMNS differ spark={gc} duck={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"  X {name}: ROWS differ (spark={len(gr)} duck={len(er)})")
            for a, b in diff:
                print(f"      spark={a}\n      duck ={b}")
            if len(gr) != len(er):
                sg, se = set(gr), set(er)
                only_g = list(sg - se)[:2]
                only_d = list(se - sg)[:2]
                print(f"      only_spark={only_g}\n      only_duck={only_d}")
        else:
            n_pass += 1
            print(f"  ok {name} ({len(gr)} rows)")
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
