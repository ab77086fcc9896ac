#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/verify_local.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or run
with --run to invoke it). For each query result parquet in <outdir>, runs
the matching oracle SQL from oracle_sql.json in DuckDB against views named
by table basename, sorts columns by name, and compares values exactly
(row order as produced — both sides carry a total ORDER BY per SURVEY §7.4).
"""
import json, os, struct, subprocess, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--run" in sys.argv:
        # run sbt in THIS script's repo root, not a hardcoded path — the
        # clean-checkout gate (scripts/gate_clean.sh) invokes the copy
        # inside a git-archive extraction, and a hardcoded /root/repo
        # would silently verify the working tree instead of HEAD
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
    n_ok = n_bad = 0
    if "--only-declared" in sys.argv and not declared:
        # SPARK_GRAFT_ONLY filtered everything out (Verify also fails fast
        # on unknown names) — a spot-check over zero queries must not
        # report success
        print("✗ --only-declared set but no result dirs found in", outdir)
        sys.exit(1)
    # an oracle key with no result dir means the Spark query itself threw
    # (Verify catches per-query exceptions) — that is a hard failure, not
    # a silently-skipped query. --only-declared skips this check for
    # spot-check runs where Verify ran under a SPARK_GRAFT_ONLY filter.
    if "--only-declared" not in sys.argv:
        for name in sorted(set(oracle) - set(declared)):
            print(f"✗ {name}: declared in oracleSql but query produced no output")
            n_bad += 1
    for name in declared:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"✗ {name}: columns differ spark={list(got.columns)} duck={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"✗ {name}: rowcount spark={len(got)} duck={len(exp)}")
            n_bad += 1
            continue
        # dtype parity: the driver hashes raw column values, so an oracle
        # returning HUGEINT/DECIMAL (surfacing as float64/object) against a
        # Spark BIGINT hashes differently even when values are identical
        # (SURVEY §7.4: cast in the oracle). Mirror that strictness here.
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if got[c].dtype != exp[c].dtype]
        if dt_bad:
            c, g, e = dt_bad[0]
            print(f"✗ {name}: dtype mismatch col={c} spark={g} duck={e}"
                  + (f" (+{len(dt_bad)-1} more)" if len(dt_bad) > 1 else ""))
            n_bad += 1
            continue
        # exact value compare, cell by cell (mirrors a hash compare).
        # Floats compare BIT-exactly (struct-pack): the driver hashes raw
        # values, so +0.0 vs -0.0 (r8's win_moving_slope) and NaN-payload
        # drift must fail here too, even though they compare ==.
        def cells_equal(g, e):
            # array-valued cells (numpy arrays from parquet lists) break
            # scalar `!=`; normalize to python lists first
            if hasattr(g, "tolist"):
                g = g.tolist()
            if hasattr(e, "tolist"):
                e = e.tolist()
            if g is None and e is None:
                return True
            if isinstance(g, float) and isinstance(e, float):
                return struct.pack("<d", g) == struct.pack("<d", e)
            if isinstance(g, list) and isinstance(e, list):
                return len(g) == len(e) and \
                    all(cells_equal(a, b) for a, b in zip(g, e))
            return g == e or str(g) == str(e)

        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not cells_equal(g, e):
                    bad = (c, i, g, e)
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"✗ {name}: first diff col={c} row={i} spark={g!r} duck={e!r}")
            n_bad += 1
        else:
            print(f"✓ {name}: rows={len(got)}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(declared)} declared")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
