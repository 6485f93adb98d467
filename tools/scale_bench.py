#!/usr/bin/env python3
"""Scale-up bench harness: run graft.Bench at sf0.1 and at the synthetic
sf1 (FACTOR x replicated, key-remapped — see graft.ScaleUp), then compare
per-query wall times normalized by the replication factor. A query whose
sf1 time exceeds factor * sf0.1 time by more than the threshold has
super-linear behavior the fixtures couldn't see (shuffle blowup, skew,
driver bottleneck).

The heaviest queries get a THIRD measured point at a mid scale
(FMID ~ sqrt(FACTOR)), so the t = a*n + b*n^2 fit is least-squares over
three points instead of exactly determined from two — noise in either
endpoint no longer lands entirely in the quadratic term (r06 verdict
item 4).

Usage: python3 tools/scale_bench.py [factor] [threshold]
Writes SCALEBENCH.json next to the repo root.
"""
import json
import os
import subprocess
import sys

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
THRESHOLD = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
if FACTOR < 2:
    raise SystemExit("factor must be >= 2: the a*n + b*n^2 fit needs two "
                     "distinct scales (and FACTOR=1 would divide by zero)")
# Mid-scale third point for the heaviest queries (3 when FACTOR=10).
FMID = max(2, round(FACTOR ** 0.5)) if FACTOR > 3 else None
# Extrapolation scale derived from FACTOR, not a literal: one factor
# beyond the measured range (100x when FACTOR=10).
EXTRAP = FACTOR * FACTOR
# Top-N heaviest gated queries get the third (mid-scale) measured
# point. 20, not 10 (r10 verdict item 8): at 172 queries the 10-cut
# left q124/q158/q106-tier multi-second queries on 2-point fits, where
# noise in either endpoint lands entirely in the quadratic term.
N_HEAVY = 20
# r13 verdict item 7: the r12/r13 heavy additions always get the third
# point (when they clear the >=1s fit threshold), even in rounds where
# they fall outside the top-N cut — a 2-point fit on a freshly-added
# multi-second query is exactly where endpoint noise hides a quadratic.
FORCE_MID = {"q192_kn_fluency", "q198_kn3_fluency", "q208_attribution",
             "q211_ks_drift", "q213_ks_by_lang",
             "q197_margin_mining", "q216_margin_mining_lsh",
             # r15 verdict item 3: the graph family's node count now
             # scales with the corpus (modulus greatest(101, n//50)),
             # so give every graph-rank/triad/distance gate the third
             # measured point — graph growth is exactly where 2-point
             # fits hide superlinear wedge/frontier behavior.
             "q115_host_pagerank", "q125_trustrank", "q144_rank_refresh",
             "q152_hits", "q156_label_propagation",
             "q238_host_triangles", "q239_crawl_depth",
             "q241_host_butterflies"}
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/graft-sf1"
SFMID = "/tmp/graft-sfmid"
# Duplicate-heavy skew corpora for substring dedup (r07 verdict item 5):
# the uniform replicas suffix every token per replica, so repeated-gram
# document frequency stays FLAT as data grows — the opposite of the
# 100 TB regime where boilerplate grams appear in millions of docs.
# These dirs repeat every SKEW_DUP_EVERY-th doc verbatim per replica,
# so hot-gram df grows xfactor; only the documents table is generated
# (substring dedup reads nothing else).
SF1_SKEW = "/tmp/graft-sf1-skew"
SFMID_SKEW = "/tmp/graft-sfmid-skew"
SKEW_DUP_EVERY = 10
# FULL registry names: the r11 switch from stdout scraping to the
# SPARK_GRAFT_BENCH_OUT file channel changed the artifact's "queries"
# keys from short to full names, and short-name lookups here raised
# KeyError the first time the skew fit ran after it (r12). The output
# rows keep the short form for artifact continuity.
SKEW_QUERIES = ["q90_repeated_spans", "q91_span_scrub",
                # r14 verdict item 4: the two slowest suite queries are
                # exactly where duplicate-heavy prefix-token / gram
                # posting lists would hide a quadratic
                "q145_ppjoin_pairs", "q146_sparse_cosine"]
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
    # The stdout metric line is bounded by design (total + slowest-5;
    # r10: the full per-query map outgrew the driver's tail capture),
    # so tooling reads the full-fidelity artifact through the
    # SPARK_GRAFT_BENCH_OUT file channel instead of scraping stdout.
    out = f"/tmp/graft-bench-out-{os.getpid()}.json"
    if os.path.exists(out):
        os.remove(out)
    env = {"SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": "32",
           "SPARK_GRAFT_BENCH_OUT": out}
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    r = run('sbt -batch "runMain graft.Bench"', env)
    if not os.path.exists(out):
        raise SystemExit(f"no bench artifact for {sf_dir}:\n"
                         f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    with open(out) as f:
        art = json.load(f)
    # r13 verdict item 1: Bench deliberately writes the artifact even
    # when a query crashed (errors collected, exit nonzero), so a run
    # that only checks for the file records a crashed query's
    # time-to-failure as its measurement — that is how q197's genuine
    # superlinear flag got auto-cleared by an impossible 0.01s isolated
    # "measurement". A failed run must fail the gate.
    if r.returncode != 0 or art.get("errors"):
        raise SystemExit(
            f"bench FAILED for {sf_dir} (exit {r.returncode}, errors: "
            f"{sorted(art.get('errors', {})) or 'none reported'}) — a "
            "crashed query must fail the scale gate, not record its "
            f"time-to-failure\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return art


def discrepant(isolated_t, batch_t):
    """True when an isolated re-measurement is implausibly BELOW the
    batch measurement at the same SF. Concurrency noise only inflates
    times — it cannot deflate one 3x — so such a rerun is evidence of a
    short-circuit (crash, cached result, wrong dir), and must never
    clear a superlinear flag (r13 verdict item 1: q197's 81s batch
    measurement was "cleared" by a 0.01s isolated rerun)."""
    return batch_t is not None and batch_t > 0 and isolated_t < batch_t / 3.0

def bench_only(sf_dir, query):
    return bench(sf_dir, only=query)["queries"][query]

def gen_scaled(path, factor):
    if os.path.exists(os.path.join(path, "lineitem.parquet")):
        return
    print(f"generating {path} (factor {factor}) ...")
    r = run(f'sbt -batch "runMain graft.ScaleUp {SF01} {path} {factor}"')
    if r.returncode != 0:
        raise SystemExit(f"ScaleUp failed:\n{r.stderr[-3000:]}")

def gen_skewed(path, factor):
    if os.path.exists(os.path.join(path, "documents.parquet")):
        return
    print(f"generating {path} (factor {factor}, "
          f"dup_every {SKEW_DUP_EVERY}, documents only) ...")
    r = run(f'sbt -batch "runMain graft.ScaleUp {SF01} {path} {factor} '
            f'{SKEW_DUP_EVERY} documents"')
    if r.returncode != 0:
        raise SystemExit(f"ScaleUp (skew) failed:\n{r.stderr[-3000:]}")

def quad_fit(pts):
    """Least-squares fit of t = a*n + b*n^2 (through the origin) over
    (n, t) points, clamped to a, b >= 0. Exactly determined for two
    points, overdetermined least-squares for three or more."""
    s2 = sum(n * n for n, _ in pts)
    s3 = sum(n ** 3 for n, _ in pts)
    s4 = sum(n ** 4 for n, _ in pts)
    st1 = sum(n * t for n, t in pts)
    st2 = sum(n * n * t for n, t in pts)
    det = s2 * s4 - s3 * s3
    if det <= 0:
        return (st1 / s2 if s2 else 0.0), 0.0
    a = (st1 * s4 - st2 * s3) / det
    b = (s2 * st2 - s3 * st1) / det
    if b < 0:
        b, a = 0.0, st1 / s2
    elif a < 0:
        a, b = 0.0, st2 / s4
    return a, b

def extrap_ratio(pts):
    """Per-row ratio of the fitted curve at scale EXTRAP vs linear
    scaling of the n=1 measurement."""
    t1 = dict(pts).get(1)
    if not t1 or t1 <= 0:
        return 0.0
    a, b = quad_fit(pts)
    return (a * EXTRAP + b * EXTRAP * EXTRAP) / (EXTRAP * t1)

def main():
    gen_scaled(SF1, FACTOR)
    print("bench @ sf0.1 ...")
    b01 = bench(SF01)
    print(f"bench @ sf1 (factor {FACTOR}) ...")
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
    # Third measured point for the heaviest gated queries: one bench run
    # at the mid scale, so their a*n + b*n^2 fit is least-squares over
    # three points (noise in one measurement no longer lands entirely in
    # the quadratic term).
    mid_times = {}
    if FMID:
        eligible = [r_ for r_ in rows
                    if r_["gated"] and r_["sf1_s"] >= 1.0]
        heavy = sorted(eligible, key=lambda r_: -r_["sf1_s"])[:N_HEAVY]
        heavy += [r_ for r_ in eligible
                  if r_["query"] in FORCE_MID and r_ not in heavy]
        if heavy:
            gen_scaled(SFMID, FMID)
            names = ",".join(r_["query"] for r_ in heavy)
            print(f"bench @ sfmid (factor {FMID}) for heaviest "
                  f"{len(heavy)}: {names} ...")
            mid_times = bench(SFMID, only=names)["queries"]
    # Extrapolation one factor beyond the measured range (r05: q37 hid a
    # quadratic under the factor-10 gate at per-row 1.856 < 2.0). Fixed
    # per-query overhead deflates b (conservative), so apply it only to
    # queries heavy enough (>= 1s at sf1) that overhead noise doesn't
    # dominate the fit.
    for r_ in rows:
        q, t01, t1 = r_["query"], r_["sf0.1_s"], r_["sf1_s"]
        if t1 < 1.0 or t01 <= 0:
            continue
        pts = [(1, t01), (FACTOR, t1)]
        if q in mid_times:
            r_["sfmid_s"] = round(mid_times[q], 3)
            pts.append((FMID, mid_times[q]))
        ratio_x = extrap_ratio(pts)
        r_["extrapolated_100x_per_row_ratio"] = round(ratio_x, 3)
        r_["fit_points"] = len(pts)
        if q not in EXCLUDE and ratio_x > THRESHOLD and q not in flagged:
            flagged.append(q)
    # Concurrent-suite per-query times are noisy for sub-second queries
    # (driver planning overlap), so re-measure every flagged query
    # ISOLATED at each SF and keep the flag only if it reproduces.
    confirmed = []
    for q in flagged:
        print(f"re-measuring {q} isolated ...")
        t01 = bench_only(SF01, q)
        t1 = bench_only(SF1, q)
        batch_t1 = b1["queries"].get(q)
        if discrepant(t1, batch_t1):
            # an isolated time <1/3 of the batch time is a measurement
            # integrity problem, not noise: re-measure once, and if the
            # discrepancy reproduces, KEEP the flag (r13 verdict item 1)
            print(f"  {q}: isolated sf1 {t1:.2f}s vs batch "
                  f"{batch_t1:.2f}s — implausible, re-measuring ...")
            t1 = max(t1, bench_only(SF1, q))
        if discrepant(t1, batch_t1):
            print(f"  {q}: isolated sf1 {t1:.2f}s still <1/3 of batch "
                  f"{batch_t1:.2f}s — keeping flag (suspect measurement)")
            for r_ in rows:
                if r_["query"] == q:
                    r_["isolated_sf1_s"] = round(t1, 3)
                    r_["isolated_suspect"] = True
            confirmed.append(q)
            continue
        ratio = t1 / (t01 * FACTOR) if t01 > 0 else 0.0
        # recompute the extrapolation from the isolated numbers too, so
        # a query flagged by the fit isn't auto-cleared by a clean
        # factor-10 ratio (that's exactly how q37 hid); give the
        # isolated fit the mid point as well when the dir exists
        pts = [(1, t01), (FACTOR, t1)]
        if FMID and os.path.exists(os.path.join(SFMID, "lineitem.parquet")):
            pts.append((FMID, bench_only(SFMID, q)))
        ratio_x = extrap_ratio(pts)
        for r_ in rows:
            if r_["query"] == q:
                r_["isolated_sf0.1_s"] = round(t01, 3)
                r_["isolated_sf1_s"] = round(t1, 3)
                r_["isolated_per_row_ratio"] = round(ratio, 3)
                r_["isolated_100x_per_row_ratio"] = round(ratio_x, 3)
        if ratio > THRESHOLD or (t1 >= 1.0 and ratio_x > THRESHOLD):
            confirmed.append(q)
        else:
            print(f"  {q}: isolated per-row ratio {ratio:.2f} "
                  f"({EXTRAP}x fit {ratio_x:.2f}) — noise, flag cleared")
    flagged = confirmed
    # Skewed duplicate-heavy fit for substring dedup: 3 points
    # (sf0.1 = skew factor 1 exactly, since replica 0 is verbatim;
    # skew-mid; skew-sf1), isolated runs so concurrency noise from the
    # full suite doesn't land in the fit.
    skew_rows = []
    names = ",".join(SKEW_QUERIES)
    gen_skewed(SFMID_SKEW, FMID or 3)
    gen_skewed(SF1_SKEW, FACTOR)
    print(f"bench @ skew-mid + skew-sf1 for {names} ...")
    t_mid = bench(SFMID_SKEW, only=names)["queries"]
    t_one = bench(SF1_SKEW, only=names)["queries"]
    for q in SKEW_QUERIES:
        t01 = bench_only(SF01, q)
        if q not in t_one or t01 <= 0:
            continue
        ratio = t_one[q] / (t01 * FACTOR)
        pts = [(1, t01), (FMID or 3, t_mid[q]), (FACTOR, t_one[q])]
        ratio_x = extrap_ratio(pts)
        skew_rows.append({
            "query": q.split("_")[0], "sf0.1_s": round(t01, 3),
            "skew_mid_s": round(t_mid[q], 3),
            "skew_sf1_s": round(t_one[q], 3),
            "per_row_ratio": round(ratio, 3),
            "extrapolated_100x_per_row_ratio": round(ratio_x, 3),
            "fit_points": len(pts)})
        if ratio > THRESHOLD or ratio_x > THRESHOLD:
            flagged.append(f"{q}[skew]")
    out = {"factor": FACTOR, "mid_factor": FMID, "extrap_factor": EXTRAP,
           "threshold": THRESHOLD,
           "total_sf0.1_s": round(b01["value"], 2),
           "total_sf1_s": round(b1["value"], 2),
           "flagged_superlinear": flagged, "queries": rows,
           "skew": {"dup_every": SKEW_DUP_EVERY,
                    "note": "duplicate-heavy corpus: every Nth doc "
                            "verbatim per replica, hot-gram df grows "
                            "x factor", "queries": skew_rows}}
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
