#!/usr/bin/env bash
# End-of-round invariant (the r9 lesson): HEAD must compile and pass the
# gates from a CLEAN CHECKOUT — uncommitted fixes in the working tree
# must never mask a broken snapshot (r9 shipped a HEAD calling a
# never-committed helper; every driver gate came back empty).
#
# Extracts HEAD (git archive — not the working tree, so untracked files
# can't leak in), then runs compile + the full sf0.01 DuckDB oracle gate
# + the ScalaTest suite inside the extraction.
#
# Usage: bash scripts/gate_clean.sh [sfdir]   (default /root/testdata/sf0.01)
set -euo pipefail
sfdir="${1:-/root/testdata/sf0.01}"
tmp=$(mktemp -d /tmp/graft_clean.XXXXXX)
trap 'rm -rf "$tmp"' EXIT
echo "== extracting HEAD ($(git -C /root/repo rev-parse --short HEAD)) to $tmp"
git -C /root/repo archive HEAD | tar -x -C "$tmp"
cd "$tmp"
echo "== sbt compile (clean checkout)"
sbt -batch compile
echo "== full oracle gate at $sfdir"
python3 scripts/verify_local.py "$sfdir" "$tmp/verify_out" --run
echo "== sbt test"
sbt -batch test
echo "CLEAN-CHECKOUT GATES GREEN at $(git -C /root/repo rev-parse --short HEAD)"
