#!/bin/bash
# Round close-out ritual (VERDICT r13 #8 / r15 #6), codified so no round
# forgets a gate. Runs everything EXCEPT the bench capture, which needs
# a cold box (anything run just before — tests, check.py — inflates
# slots even when every witness reads quiet): this script finishes with
# the exact capture command to run after a >= 3 min cooldown.
#
# Usage: scripts/close.sh <round-number> [prev-round-number]
#   e.g. scripts/close.sh 16 15
# Produces PLANS_r<N>.json and diffs it against PLANS_r<prev>.json.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: scripts/close.sh <round> [prev-round]}"
PREV="${2:-$((N - 1))}"

echo "== 1/4 compile (gate on exit status — a failed compile silently"
echo "   runs the stale previous build via run.sh otherwise)"
sbt -batch compile

echo "== 2/4 full test suite"
sbt -batch test

echo "== 3/4 correctness gate at ALL THREE scale factors"
for sf in 0.001 0.01 0.1; do
  out="/tmp/close_r${N}_sf${sf}"
  log="/tmp/close_r${N}_sf${sf}.log"
  # capture check.py's own exit status BEFORE any pipe can mask it: a
  # FAIL at any SF must fail the close (the whole point of the gate)
  rc=0
  # 2>&1: check.py prints its diagnostics on stderr, and a failure log
  # holding only PASS lines loses the one thing the gate exists to show
  python3 scripts/check.py "/root/testdata/sf${sf}" "$out" > "$log" 2>&1 || rc=$?
  n_pass=$(grep -c '^PASS' "$log" || true)
  echo "sf${sf}: ${n_pass} PASS (check.py rc=${rc})"
  if [ "$rc" -ne 0 ]; then
    # || true: under pipefail an all-PASS log makes grep exit 1 and
    # set -e would abort BEFORE the failure message below (ADVICE r16)
    grep -v '^PASS' "$log" | tail -20 || true
    echo "CLOSE FAILED: correctness gate at sf${sf} (see $log)"
    exit 1
  fi
done

echo "== 4/4 plan census + cross-round diff (zero unexplained exchange"
echo "   growth / codegen-span loss / broadcast loss, or adjudicate each"
echo "   flagged query in SURVEY §10)"
scripts/run.sh graft.ExplainQ /root/testdata/sf0.001 -json "PLANS_r${N}.json"
diff_rc=0
python3 scripts/plans_diff.py "PLANS_r${PREV}.json" "PLANS_r${N}.json" \
  > "/tmp/plans_diff_r${N}.txt" || diff_rc=$?
cat "/tmp/plans_diff_r${N}.txt"
# exit 2 = usage/input error (missing/corrupt census) — nothing to
# adjudicate, and falling through as success would un-enforce the gate
[ "$diff_rc" -eq 2 ] && { echo "CLOSE FAILED: plans_diff input error"; exit 2; }
if [ "$diff_rc" -ne 0 ]; then
  # The census carries one benign nondeterminism: the AQE exchange-
  # reuse race (two identical subtrees submitted concurrently can both
  # materialize before either lands in the stage cache, so the
  # executed plan sometimes prints the duplicate subtree instead of a
  # ReusedExchange — r16 observed q89 flicker 19/11 <-> 21/13 ex/wscg
  # SOLO on identical code, and q123 62-vs-61 across full runs).
  # Adjudicate: re-census each flagged query solo THREE times and keep
  # the WHOLE-PLAN minimum — the single observed rep with the fewest
  # exchanges (ties: fewest wscg, then bhj; see the embedded Python
  # below). The race only ever ADDS plan nodes, so the most-elided
  # observed plan is the canonical deduplicated one; never take
  # per-key minima across reps, which can splice counts from
  # different plans into one no run executed (ADVICE r16). A real
  # regression (code adding a shuffle) reproduces in every solo run
  # and stays flagged.
  flagged=$(sed -n 's/^REGRESS \([^:]*\):.*/\1/p' "/tmp/plans_diff_r${N}.txt")
  # a nonzero diff with no REGRESS line means REMOVED queries: nothing
  # to re-census, and the removal itself must fail the close
  if [ -z "$flagged" ]; then
    echo "CLOSE FAILED: plans_diff flagged removals (see above)"
    exit 1
  fi
  if [ -n "$flagged" ]; then
    echo "== re-censusing flagged queries solo x3 (reuse-race adjudication):"
    echo "$flagged"
    for rep in 1 2 3; do
      # the race outcome is PHASE-LOCKED to ambient machine state
      # (r16: q89 read 21 in three back-to-back runs, 19 in the next
      # four) — space the reps so they don't all sample one phase
      [ "$rep" -gt 1 ] && sleep 45
      # shellcheck disable=SC2086
      scripts/run.sh graft.ExplainQ /root/testdata/sf0.001 \
        -json "/tmp/plans_solo_r${N}_${rep}.json" $flagged
    done
    python3 - "PLANS_r${N}.json" "/tmp/plans_solo_r${N}"_{1,2,3}.json <<'PYEOF'
import json, sys
full = json.load(open(sys.argv[1]))
# Whole-plan minimum, NOT per-key minima (ADVICE r16): component-wise
# mins can splice counts from different observed plans into a plan that
# never existed (min ex from one rep, min wscg from another), biasing
# the re-diff toward passing. Instead collect every observed entry per
# query and keep the single entry with the fewest exchanges (tie-broken
# by fewest wscg then bhj — the race only ADDS nodes, so fewest = the
# canonical deduplicated plan), so the recorded counts always
# correspond to a plan some run actually executed.
cands = {}
for path in sys.argv[2:]:
    solo = json.load(open(path))
    for name, counts in solo.items():
        cands.setdefault(name, []).append(counts)
for name, reps in cands.items():
    cur = full.get(name)
    # an err never silently disappears: if ANY rep (or the full census)
    # saw the query fail to plan, the err entry survives the merge
    errs = [c for c in reps + ([cur] if cur else []) if "err" in c]
    if errs:
        full[name] = errs[0]
        continue
    pool = reps + ([cur] if cur else [])
    full[name] = min(pool, key=lambda c: (c["ex"], c["wscg"], c["bhj"]))
with open(sys.argv[1], "w") as f:
    json.dump(full, f, indent=1)
    f.write("\n")
PYEOF
    echo "== re-diff after adjudication (a surviving REGRESS is real):"
    python3 scripts/plans_diff.py "PLANS_r${PREV}.json" "PLANS_r${N}.json"
  fi
fi

cat <<EOF

Close-out checks done. Remaining, BY HAND:
  1. Cool down >= 3 min (nothing concurrent — a capture right after
     this script reads 1.3-2x on the tail with every witness quiet).
  2. Capture:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \\
                 scripts/run.sh graft.Bench 2>capture.err >capture.json
     On a QUIET capture, add SPARK_GRAFT_BASELINE_WRITE=1 so the
     per-query self-baseline (scripts/bench_baseline_sf0.1.json)
     min-merges the run's untainted slots — the vector the over_band
     adjudication reads. Commit the refreshed baseline with the round.
  3. Sync docs: SURVEY §8/§10 (closing numbers + next-round outlook),
     README test count, USAGE if env vars / record keys changed.
  4. Commit everything, including PLANS_r${N}.json.
EOF
