#!/usr/bin/env bash
# Ship gate (r08 verdict item 1, same escape two rounds running): new gate
# queries MUST NOT ship without the per-round gate artifacts covering them.
# r07 shipped PLANS/SCALEBENCH missing q90/q91; r08 shipped them missing
# q94/q95/q96 — the coverage check existed both times but nothing forced
# it to run after the last commit. This script IS that forcing function:
#
#   tools/ship_check.sh --fast   consistency check only (the pre-commit
#                                hook runs this; <1s, no sbt)
#   tools/ship_check.sh          full regen: canonical bench, plan dump,
#                                scale gate, quality probe, store bench,
#                                then round_report (which hard-fails on
#                                coverage) -> ROUND_rNN.md
#
# The pre-commit hook (tools/hooks/pre-commit, installed via
# `git config core.hooksPath tools/hooks`) runs the fast mode on EVERY
# commit, so a commit that adds a query without regenerated artifacts is
# refused at commit time, not discovered by the judge. Dev-only bypass
# for intermediate work-in-progress commits: GRAFT_SKIP_SHIPCHECK=1.
set -euo pipefail
cd "$(dirname "$0")/.."

registry_check() {
python3 - <<'EOF'
import glob, json, re, sys

# Registry ground truth: every "qNN_name" -> entry registered in a
# Queries object's map. (The bench artifact is a live iteration of the
# same maps; greping source keeps this check sbt-free and <1s.)
src = ""
for f in glob.glob("src/main/scala/graft/queries/*.scala"):
    src += open(f).read()
reg = {m.split("_")[0] for m in
       re.findall(r'"(q\d+_[a-z0-9_]+)"\s*->', src)}
if not reg:
    sys.exit(0)  # tool error, never block on it

errs = []

plans = sorted(glob.glob("PLANS_r*.txt"))
if plans:
    pq = {m.split("_")[0] for m in
          re.findall(r"^==== (\S+) ====$", open(plans[-1]).read(), re.M)}
    if pq != reg:
        errs.append(f"{plans[-1]} covers {len(pq)} queries, registry has "
                    f"{len(reg)} (missing: {sorted(reg - pq) or '-'}, "
                    f"extra: {sorted(pq - reg) or '-'})")
else:
    errs.append("no PLANS_r*.txt — the plan gate never ran")

try:
    sb = json.load(open("SCALEBENCH.json"))
    sq = {r["query"].split("_")[0] for r in sb["queries"]}
    if sq != reg:
        errs.append(f"SCALEBENCH.json covers {len(sq)} queries, registry "
                    f"has {len(reg)} (missing: {sorted(reg - sq) or '-'}, "
                    f"extra: {sorted(sq - reg) or '-'})")
except (OSError, json.JSONDecodeError, KeyError) as e:
    errs.append(f"SCALEBENCH.json missing/unparsable ({e})")

try:
    bl = json.load(open("BENCH_LOCAL.json"))
    bq = {k.split("_")[0] for k in bl["queries"]}
    if bq != reg:
        errs.append(f"BENCH_LOCAL.json covers {len(bq)} queries, registry "
                    f"has {len(reg)} (missing: {sorted(reg - bq) or '-'}, "
                    f"extra: {sorted(bq - reg) or '-'})")
except (OSError, json.JSONDecodeError, KeyError) as e:
    errs.append(f"BENCH_LOCAL.json missing/unparsable ({e})")

# BENCH_SERIAL.json (r17 verdict item 1): the serial per-query basis
# that drives the cross-round regression table must cover the registry
# too, or new queries silently drop out of the only readable table.
try:
    bs = json.load(open("BENCH_SERIAL.json"))
    sq = {k.split("_")[0] for k in bs["queries"]}
    if sq != reg:
        errs.append(f"BENCH_SERIAL.json covers {len(sq)} queries, "
                    f"registry has {len(reg)} "
                    f"(missing: {sorted(reg - sq) or '-'}, "
                    f"extra: {sorted(sq - reg) or '-'})")
except (OSError, json.JSONDecodeError, KeyError) as e:
    errs.append(f"BENCH_SERIAL.json missing/unparsable ({e})")

# COVERAGE.md (split out of SURVEY §8 in r15) must mention every
# registry gate query — the map the judge reads line by line cannot
# silently go stale (r14 verdict item 8).
try:
    # \bq\d+ without a trailing \b: the map may cite bare ids ("q22")
    # or full gate names ("q200_dispersion"), where "_" would defeat a
    # trailing word boundary
    cq = set(re.findall(r"\bq\d+", open("COVERAGE.md").read()))
    if not reg <= cq:
        errs.append(f"COVERAGE.md is missing registry queries: "
                    f"{sorted(reg - cq)}")
except OSError as e:
    errs.append(f"COVERAGE.md missing ({e})")

if errs:
    for e in errs:
        print(f"COVERAGE FAILURE: {e}", file=sys.stderr)
    print("gate artifacts are stale relative to the query registry; "
          "run tools/ship_check.sh (full) to regenerate, or "
          "GRAFT_SKIP_SHIPCHECK=1 for a dev-only WIP commit",
          file=sys.stderr)
    sys.exit(2)
print(f"ship_check: artifacts cover all {len(reg)} registry queries")
EOF
}

if [[ "${1:-}" == "--fast" ]]; then
    registry_check
    # r13 verdict item 1: the scale harness's integrity rules (crashed
    # bench fails the gate; implausibly-low isolated reruns never clear
    # a flag) are pinned by injection tests, <1s, no sbt.
    python3 tools/test_scale_bench.py
    # r13 verdict item 3: every pinned quality floor (incl. pq_rotated)
    # fails the round report when injected below it.
    python3 tools/test_round_report.py
    exit 0
fi

# ---- full regen -----------------------------------------------------
# Round number = newest driver CORRECTNESS round + 1.
last=$(ls CORRECTNESS_r*.json 2>/dev/null | sed 's/.*_r0*//; s/\.json//' |
       sort -n | tail -1)
cur=$((last + 1))
new_plans=$(printf 'PLANS_r%02d.txt' "$cur")
# previous round's dump for the diff — NOT this round's, which exists
# already when ship_check is re-run after a late fix
prev_plans=$(ls PLANS_r*.txt | grep -v "^$new_plans$" | sort | tail -1)
[ -z "$prev_plans" ] && prev_plans=$new_plans
prev_bench=$(printf 'BENCH_r%02d.json' "$last")
round_md=$(printf 'ROUND_r%02d.md' "$cur")

echo "== ship_check full: round r0$cur (plans $prev_plans -> $new_plans) =="
echo "== canonical bench @ sf0.1 (writes BENCH_LOCAL.json) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" | tail -2
echo "== serial bench @ sf0.1 (writes BENCH_SERIAL.json; r17 item 1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_SERIAL=1 \
    sbt -batch "runMain graft.Bench" | tail -2
echo "== plan dump =="
sbt -batch "runMain graft.Plans /root/testdata/sf0.1 $new_plans" | tail -1
echo "== scale gate (sf0.1 -> synthetic sf1) =="
python3 tools/scale_bench.py
echo "== quality probe =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt -batch \
    "runMain graft.QualityProbe" | tail -1
echo "== store bench =="
sbt -batch "runMain graft.StoreBench" | tail -1
echo "== round report (hard-fails on coverage) =="
# Old-bench baseline = the PREVIOUS round's committed BENCH_LOCAL.json
# (r14 verdict item 1: the driver's BENCH_rNN.json carries only the
# slowest-5 per-query entries, so diffing against it compared a
# hand-picked handful; the full-fidelity canonical artifact is in git
# as of the pre-regen HEAD — ship_check full runs BEFORE the artifact
# commit by documented flow). Falls back to the driver artifact when
# the git read fails (fresh clone without history).
prev_local=$(mktemp /tmp/prev-bench-local-XXXXXX.json)
if git show HEAD:BENCH_LOCAL.json > "$prev_local" 2>/dev/null \
        && [ -s "$prev_local" ]; then
    old_bench="$prev_local"
    echo "(old bench baseline: HEAD:BENCH_LOCAL.json)"
else
    old_bench="$prev_bench"
    echo "(old bench baseline: $prev_bench — no committed BENCH_LOCAL)"
fi
# Serial baseline = previous round's committed BENCH_SERIAL.json; the
# per-query regression table reads ONLY the serial basis (r17 item 1) —
# the concurrent artifacts keep the suite-throughput headline.
prev_serial=$(mktemp /tmp/prev-bench-serial-XXXXXX.json)
if ! git show HEAD:BENCH_SERIAL.json > "$prev_serial" 2>/dev/null \
        || [ ! -s "$prev_serial" ]; then
    echo "(no committed BENCH_SERIAL.json baseline — first serial round)"
    prev_serial=/dev/null
fi
python3 tools/round_report.py "$prev_plans" "$new_plans" \
    "$old_bench" BENCH_LOCAL.json "$round_md" \
    "$prev_serial" BENCH_SERIAL.json
registry_check
echo "ship_check full: PASS — $round_md, $new_plans, SCALEBENCH.json, "\
     "BENCH_LOCAL.json, QUALITY.json, BENCH_STORE.json are consistent"
