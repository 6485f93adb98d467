#!/usr/bin/env python3
"""Scale-up bench harness: run graft.Bench at sf0.1 and at the synthetic
sf1 (10x replicated, key-remapped — see graft.ScaleUp), then compare
per-query wall times normalized by the replication factor. A query whose
sf1 time exceeds factor * sf0.1 time by more than the threshold has
super-linear behavior the fixtures couldn't see (shuffle blowup, skew,
driver bottleneck).

Usage: python3 tools/scale_bench.py [factor] [threshold]
Writes SCALEBENCH.json next to the repo root.
"""
import json
import os
import subprocess
import sys

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
THRESHOLD = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/graft-sf1"
# r06: empty — q37 (the one O(n^2)-by-design exclusion) now runs the
# LSH-candidates + rerank plan and is gated like everything else.
EXCLUDE = set()

def run(cmd, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, shell=True, capture_output=True, text=True,
                          env=e)

def bench(sf_dir, only=None):
    env = {"SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": "32"}
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    r = run('sbt -batch "runMain graft.Bench"', env)
    for line in (r.stdout + r.stderr).splitlines():
        if '"metric"' in line:
            start = line.index("{")
            return json.loads(line[start:])
    raise SystemExit(f"no bench line for {sf_dir}:\n{r.stdout[-2000:]}\n"
                     f"{r.stderr[-2000:]}")

def bench_only(sf_dir, query):
    return bench(sf_dir, only=query)["queries"][query]

def main():
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        print(f"generating {SF1} (factor {FACTOR}) ...")
        r = run(f'sbt -batch "runMain graft.ScaleUp {SF01} {SF1} {FACTOR}"')
        if r.returncode != 0:
            raise SystemExit(f"ScaleUp failed:\n{r.stderr[-3000:]}")
    print("bench @ sf0.1 ...")
    b01 = bench(SF01)
    print("bench @ sf1 ...")
    b1 = bench(SF1)
    rows = []
    flagged = []
    for q, t01 in sorted(b01["queries"].items()):
        t1 = b1["queries"].get(q)
        if t1 is None or t01 <= 0:
            continue
        # per-row ratio: sf1 has FACTOR x rows, so linear scaling = FACTOR x
        ratio = t1 / (t01 * FACTOR)
        rows.append({"query": q, "sf0.1_s": round(t01, 3),
                     "sf1_s": round(t1, 3),
                     "per_row_ratio": round(ratio, 3),
                     "gated": q not in EXCLUDE})
        if q not in EXCLUDE and ratio > THRESHOLD:
            flagged.append(q)
    # Factor-100 extrapolation (r05: q37 hid a quadratic under the
    # factor-10 gate at per-row 1.856 < 2.0). Fit t = a*n + b*n^2 from
    # the two measured points: b*n^2 = (t10 - FACTOR*t1) / (FACTOR^2 -
    # FACTOR); a 100x per-row ratio of a*100n + b*(100n)^2 over 100*t1
    # then exposes any quadratic term long before it wins at factor 10.
    # Fixed per-query overhead deflates b (conservative), so apply it
    # only to queries heavy enough (>= 1s at sf1) that overhead noise
    # doesn't dominate the fit.
    for r_ in rows:
        q, t1, t10 = r_["query"], r_["sf0.1_s"], r_["sf1_s"]
        if t10 < 1.0 or t1 <= 0:
            continue
        bn2 = max(0.0, (t10 - FACTOR * t1) / (FACTOR * FACTOR - FACTOR))
        an = max(0.0, t1 - bn2)
        t100 = 100 * an + 100 * 100 * bn2
        ratio100 = t100 / (100 * t1)
        r_["extrapolated_100x_per_row_ratio"] = round(ratio100, 3)
        if q not in EXCLUDE and ratio100 > THRESHOLD and q not in flagged:
            flagged.append(q)
    # Concurrent-suite per-query times are noisy for sub-second queries
    # (driver planning overlap), so re-measure every flagged query
    # ISOLATED at both SFs and keep the flag only if it reproduces.
    confirmed = []
    for q in flagged:
        print(f"re-measuring {q} isolated ...")
        t01 = bench_only(SF01, q)
        t1 = bench_only(SF1, q)
        ratio = t1 / (t01 * FACTOR) if t01 > 0 else 0.0
        # recompute the extrapolation from the isolated numbers too, so
        # a query flagged by the 100x fit isn't auto-cleared by a clean
        # factor-10 ratio (that's exactly how q37 hid)
        bn2 = max(0.0, (t1 - FACTOR * t01) / (FACTOR * FACTOR - FACTOR))
        an = max(0.0, t01 - bn2)
        ratio100 = ((100 * an + 10000 * bn2) / (100 * t01)
                    if t01 > 0 else 0.0)
        for r_ in rows:
            if r_["query"] == q:
                r_["isolated_sf0.1_s"] = round(t01, 3)
                r_["isolated_sf1_s"] = round(t1, 3)
                r_["isolated_per_row_ratio"] = round(ratio, 3)
                r_["isolated_100x_per_row_ratio"] = round(ratio100, 3)
        if ratio > THRESHOLD or (t1 >= 1.0 and ratio100 > THRESHOLD):
            confirmed.append(q)
        else:
            print(f"  {q}: isolated per-row ratio {ratio:.2f} "
                  f"(100x fit {ratio100:.2f}) — noise, flag cleared")
    flagged = confirmed
    out = {"factor": FACTOR, "threshold": THRESHOLD,
           "total_sf0.1_s": round(b01["value"], 2),
           "total_sf1_s": round(b1["value"], 2),
           "flagged_superlinear": flagged, "queries": rows}
    with open("SCALEBENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'per-row':>8s}")
    for r_ in rows:
        mark = " <-- SUPERLINEAR" if r_["query"] in flagged else (
            "  (ungated)" if not r_["gated"] else "")
        print(f"{r_['query']:28s} {r_['sf0.1_s']:8.2f} {r_['sf1_s']:8.2f} "
              f"{r_['per_row_ratio']:8.2f}{mark}")
    print(f"\ntotals: sf0.1 {out['total_sf0.1_s']}s, sf1 {out['total_sf1_s']}s"
          f"; flagged: {flagged or 'none'}")

if __name__ == "__main__":
    main()
