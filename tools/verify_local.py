#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
sfDir tables, sorts rows and columns by name, and compares values exactly.

Two comparison layers:
  1. raw values via repr (value-exact, representation-tolerant);
  2. the PANDAS path the driver actually uses — both sides loaded as
     pandas DataFrames, rows sorted, per-cell hash. This is the layer
     that caught round 1's HUGEINT/DECIMAL→float64 dtype mismatches the
     repr layer was blind to (CORRECTNESS_r01 vs verify_local disagreed).

Dev-only tool (driver-side python env); not part of the engine.
"""
import json, math, re, sys
from pathlib import Path

import duckdb
import pandas as pd


def _family(series):
    """Dtype family as the driver's hash effectively sees it. Calibrated
    against CORRECTNESS_r01: int32 vs int64, datetime64[ns] vs [us], and
    date-object vs datetime64 all hash EQUAL there; float64 vs int64,
    float64 vs Decimal-object, and ndarray cells all hash DIFFERENT."""
    import datetime, decimal
    import numpy as np
    d = str(series.dtype)
    if d.startswith(("int", "uint")):
        return "int"
    if d.startswith("float"):
        return "float"
    if d.startswith("datetime64"):
        return "time"
    if d == "bool":
        return "bool"
    sample = next((v for v in series if v is not None
                   and not (isinstance(v, float) and math.isnan(v))), None)
    if isinstance(sample, decimal.Decimal):
        return "decimal"
    if isinstance(sample, (datetime.date, datetime.datetime)):
        return "time"
    if isinstance(sample, (np.ndarray, list, tuple)):
        return "array"
    if isinstance(sample, bool):
        return "bool"
    if isinstance(sample, (int, np.integer)):
        return "int"
    if isinstance(sample, (float, np.floating)):
        return "float"
    return "str"


def _canon_cell(v, fam):
    import numpy as np
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<null>"
    if fam == "time":
        return pd.Timestamp(v).isoformat()
    if fam == "int":
        return int(v)
    if fam == "float":
        return float(v)
    return repr(v)


def pandas_mismatch(con, qdir, oracle_sql):
    """Replicate the driver's compare: pandas frames, columns sorted by
    name, rows sorted, per-column dtype-FAMILY equality plus exact value
    equality within the family. Returns an error string or None."""
    try:
        got = pd.read_parquet(qdir)
        exp = con.execute(oracle_sql).df()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            return f"pandas columns {list(got.columns)} vs {list(exp.columns)}"
        if got.shape != exp.shape:
            return f"pandas shape {got.shape} vs {exp.shape}"
        fams = {}
        for c in got.columns:
            fa, fb = _family(got[c]), _family(exp[c])
            if fa == "array" or fb == "array":
                return f"array-typed column [{c}] — driver comparator crashes"
            if fa != fb:
                return f"dtype family[{c}] spark={fa}({got[c].dtype}) duck={fb}({exp[c].dtype})"
            fams[c] = fa
        ga = sorted(tuple(_canon_cell(r[c], fams[c]) for c in got.columns)
                    for r in got.to_dict("records"))
        ea = sorted(tuple(_canon_cell(r[c], fams[c]) for c in exp.columns)
                    for r in exp.to_dict("records"))
        if ga != ea:
            bad = next((a, b) for a, b in zip(ga, ea) if a != b)
            return f"values differ: spark={bad[0]} duck={bad[1]}"
        return None
    except Exception as e:
        return f"pandas compare crashed: {type(e).__name__}: {e}"

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
    # optional: write a CORRECTNESS_SF*-style JSON artifact (round >= 4)
    json_out = None
    for a in sys.argv[3:]:
        if a.startswith("--json="):
            json_out = a[len("--json="):]
    results = {}
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
            results[name] = {"pass": False, "rows": len(got),
                             "note": f"oracle sql error: {e}"}
            n_fail += 1
            continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        results[name] = {"pass": True, "rows": len(gr), "note": None}
        if gc != ec:
            print(f"  X {name}: COLUMNS differ spark={gc} duck={ec}")
            results[name] = {"pass": False, "rows": len(gr),
                             "note": "columns differ"}
            n_fail += 1
        elif gr != er:
            results[name] = {"pass": False, "rows": len(gr),
                             "note": "rows differ"}
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
            pm = pandas_mismatch(con, qdir, oracle[name])
            if pm is not None:
                n_fail += 1
                results[name] = {"pass": False, "rows": len(gr),
                                 "note": f"driver-path: {pm}"}
                print(f"  X {name}: values ok but DRIVER-PATH fails: {pm}")
            else:
                n_pass += 1
                print(f"  ok {name} ({len(gr)} rows)")
    print(f"PASS {n_pass} FAIL {n_fail}")
    if json_out:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        # MERGE into an existing round artifact, never overwrite: a
        # targeted subset re-run must not clobber the full gate (round 7
        # committed a 3-query file over a 182-query one — the evidence
        # hole ADVICE r7 flags). New results replace same-name entries;
        # totals recompute over the merged set.
        merged = results
        out_p = Path(json_out)
        if out_p.exists():
            try:
                prev = json.loads(out_p.read_text())
                if prev.get("sf") == sf and isinstance(
                        prev.get("queries"), dict):
                    merged = {**prev["queries"], **results}
            except Exception:
                pass
        t_pass = sum(1 for r in merged.values() if r.get("pass"))
        t_fail = len(merged) - t_pass
        # round label derives from the artifact filename (…_rNN.json) —
        # a hardcoded value mislabeled the r9 artifact as round 8
        m = re.search(r"_r(\d+)\.json$", out_p.name)
        rnd = int(m.group(1)) if m else None
        out_p.write_text(json.dumps({
            "sf": sf, "round": rnd,
            "gate": "tools/verify_local.py (local replica of the driver "
                    "DuckDB hash-compare, incl. the pandas driver-path layer)",
            "pass": t_pass, "fail": t_fail, "queries": merged}, indent=1))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
