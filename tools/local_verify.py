#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage:
  python3 tools/local_verify.py [sfDir] [outDir] [--skip-run] [names...]

Runs `sbt runMain graft.Verify <sfDir> <outDir>` (unless --skip-run), then for
each query output parquet, runs the matching oracle SQL in DuckDB against the
same fixture tables, sorts columns by name and rows by all columns, and
compares values exactly (with a tiny FP tolerance report to distinguish
"formula wrong" from "last-ulp drift").
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def dtype_family(s: pd.Series) -> str:
    """Coarse dtype family for gate parity with the driver's TYPED hash.

    The driver hashes values together with their dtype, so an oracle that
    drifts to HUGEINT/DECIMAL (pandas float64/object) against Spark's int64
    fails there even when every value is numerically equal. Timestamps are
    exempt: the driver normalizes us-vs-ns resolution differences.
    """
    t = s.dtype
    if pd.api.types.is_datetime64_any_dtype(t):
        return "datetime"
    if pd.api.types.is_bool_dtype(t):
        return "bool"
    if pd.api.types.is_integer_dtype(t):
        return "int"
    if pd.api.types.is_float_dtype(t):
        return "float"
    if t == object and len(s):
        v = s.dropna()
        if len(v):
            import decimal
            if isinstance(v.iloc[0], decimal.Decimal):
                return "decimal"
    return "other"


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        return [f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"]
    if len(got) != len(exp):
        return [f"row count differs: spark={len(got)} oracle={len(exp)}"]
    for c in got.columns:
        gf, ef = dtype_family(got[c]), dtype_family(exp[c])
        if gf != ef and "datetime" not in (gf, ef):
            # int-vs-float (e.g. DuckDB HUGEINT sum) or int-vs-decimal drift:
            # values may compare equal below, but the driver's typed hash
            # will NOT match. Fail loudly here so it never ships.
            errs.append(f"col {c}: dtype family mismatch spark={gf}({got[c].dtype}) "
                        f"oracle={ef}({exp[c].dtype}) — driver's typed hash will fail")
    if errs:
        return errs
    for c in got.columns:
        g, e = got[c], exp[c]
        for i in range(len(g)):
            gv, ev = g.iloc[i], e.iloc[i]
            if pd.isna(gv) and pd.isna(ev):
                continue
            if isinstance(gv, float) or isinstance(ev, float):
                if gv == ev or (isinstance(gv, float) and isinstance(ev, float)
                                and math.isclose(gv, ev, rel_tol=0, abs_tol=0)):
                    continue
                close = math.isclose(float(gv), float(ev), rel_tol=1e-9)
                errs.append(f"col {c} row {i}: spark={gv!r} oracle={ev!r}"
                            + (" (close — FP drift)" if close else " (NOT close)"))
            elif gv != ev:
                errs.append(f"col {c} row {i}: spark={gv!r} oracle={ev!r}")
            if len(errs) >= 5:
                return errs
    return errs


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])

    if "--skip-run" not in flags:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            return 1
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)

    oracle_sql = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        pq = Path(f"{out_dir}/{name}")
        if not pq.exists():
            print(f"FAIL {name}: no spark output written")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(pq)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errs = compare(name, got, exp)
        if errs:
            print(f"FAIL {name}:")
            for e in errs:
                print(f"   {e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
