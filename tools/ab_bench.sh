#!/bin/bash
# Interleaved A/B bench (VERDICT r15 #8): measure a code change against a
# baseline git ref with INTERLEAVED alternating passes on the same box, so
# host-load smear (documented ±10-25% between back-to-back sessions in
# SCALE.md) decorrelates from the code version. Reports the per-query MIN
# across passes for each side — the same estimator graft.Bench uses.
#
# Usage: tools/ab_bench.sh <baselineRef> <passes> <queryPrefix...>
#   A = <baselineRef> checked out into a git worktree (built once)
#   B = the CURRENT working tree (built once)
# Each pass runs graft.Bench with SPARK_GRAFT_BENCH_REPEATS=1 restricted to
# the query prefixes, alternating A,B,A,B,... Results land in
# /tmp/ab_bench/{A,B}_pass<i>.json and a merged comparison prints at the end.
set -euo pipefail
REF="$1"; PASSES="$2"; shift 2
PREFIXES="$*"
REPO="$(git rev-parse --show-toplevel)"
WT=/tmp/ab_bench_wt
OUT=/tmp/ab_bench
mkdir -p "$OUT"
if ! git -C "$REPO" worktree list | grep -q "$WT"; then
  git -C "$REPO" worktree add --detach "$WT" "$REF"
else
  git -C "$WT" checkout --detach "$REF"
fi
echo "== building A ($REF) and B (working tree) =="
(cd "$WT" && sbt -batch compile >/dev/null)
(cd "$REPO" && sbt -batch compile >/dev/null)
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
export SPARK_GRAFT_BENCH_REPEATS=1
for i in $(seq 1 "$PASSES"); do
  echo "== pass $i/A =="
  (cd "$WT" && SPARK_GRAFT_BENCH_OUT="$OUT/A_pass$i.json" \
    sbt -batch "runMain graft.Bench $PREFIXES" >/dev/null 2>&1)
  echo "== pass $i/B =="
  (cd "$REPO" && SPARK_GRAFT_BENCH_OUT="$OUT/B_pass$i.json" \
    sbt -batch "runMain graft.Bench $PREFIXES" >/dev/null 2>&1)
done
python3 - "$OUT" "$PASSES" <<'EOF'
import json, sys
out, passes = sys.argv[1], int(sys.argv[2])
def mins(side):
    acc = {}
    for i in range(1, passes + 1):
        qs = json.load(open(f"{out}/{side}_pass{i}.json"))["queries"]
        for k, v in qs.items():
            if v >= 0:
                acc[k] = min(acc.get(k, float("inf")), v)
    return acc
a, b = mins("A"), mins("B")
ta = tb = 0.0
for k in sorted(set(a) | set(b)):
    va, vb = a.get(k, float("nan")), b.get(k, float("nan"))
    ta += va; tb += vb
    print(f"{k:42s} A={va:6.2f}  B={vb:6.2f}  ({vb/va:5.2f}x)")
print(f"{'TOTAL':42s} A={ta:6.2f}  B={tb:6.2f}  ({tb/ta:5.2f}x)")
EOF
