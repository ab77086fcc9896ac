#!/usr/bin/env python3
"""Scale-twin of verify_local.py: replay the DuckDB compare at a LARGER
scale factor, with a per-oracle wall-clock budget so the intentionally
quadratic verification oracles (exact all-pairs Jaccard, recursive-CTE
closures) don't stall the run — the Spark side is the linear one; the
oracle is allowed to be the slow formulation.

Usage: python3 scripts/verify_scale.py [sfdir] [outdir] [budget_s] [--run]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or pass
--run). Oracles that exceed the budget are reported SKIPPED (not failed).
This is NOT the driver gate (that is sf0.01 via verify_local.py); it is
the belt-and-braces check that scale-dependent mismatches — tie-break
instability, overflow, sampling drift — don't lurk above the gate's SF.
"""
import json, os, subprocess, sys, threading

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_scale"
    budget = float(args[2]) if len(args) > 2 else 90.0
    if "--run" in sys.argv:
        # resolve the repo root from this script's location (see the
        # matching note in verify_local.py — the clean-checkout gate
        # depends on it)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            cwd=repo, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    declared = sorted(d for d in os.listdir(outdir)
                      if os.path.isdir(os.path.join(outdir, d)))
    n_ok = n_bad = n_skip = 0
    for name in sorted(set(oracle) - set(declared)):
        print(f"✗ {name}: declared in oracleSql but query produced no output")
        n_bad += 1
    def run_budgeted(sql):
        """Run one oracle under the watchdog; returns (df, err). The timer
        can fire in the window between a successful fetch and cancel(),
        leaving a pending interrupt that would abort the NEXT query as a
        spurious SKIPPED — drain it with a trivial probe after every
        attempt."""
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchdf(), None
        except Exception as e:
            return None, e
        finally:
            timer.cancel()
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass  # drained the late interrupt

    for name in declared:
        if name not in oracle:
            print(f"  {name}: NO-ORACLE (spec-verified)")
            continue
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        exp, err = run_budgeted(oracle[name])
        if err is not None:
            if "INTERRUPT" in str(err).upper():
                print(f"  {name}: SKIPPED (oracle > {budget:.0f}s)")
                n_skip += 1
            else:
                print(f"✗ {name}: oracle SQL error: {err}")
                n_bad += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"✗ {name}: columns differ spark={list(got.columns)} "
                  f"duck={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"✗ {name}: rows {len(got)} vs oracle {len(exp)}")
            n_bad += 1
            continue
        import pandas as pd
        try:
            pd.testing.assert_frame_equal(
                got.reset_index(drop=True), exp.reset_index(drop=True),
                check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            n_ok += 1
        except AssertionError as e:
            print(f"✗ {name}: values differ: {str(e).splitlines()[-1]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_skip} skipped (budget {budget:.0f}s), "
          f"{len(declared)} declared")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
