#!/usr/bin/env python3
"""One per-round artifact folding the bench delta and the plan diff
(VERDICT r3 item 7): round_report.py <old_plans> <new_plans>
<old_bench> <new_bench> [out_md] [old_serial] [new_serial].

When [new_serial] (BENCH_SERIAL.json — per-query times at concurrency
1, sentinel-gated min-of-quiet-passes; r17 verdict item 1) is given
and readable, the cross-round per-query table reads ONLY that basis;
the concurrent artifacts keep the suite-throughput headline.

Bench inputs accept either graft's own BENCH_LOCAL.json (one clean JSON
line, full query names) or the driver's BENCH_r0N.json wrapper (tail
capture with escaped quotes, possibly head-truncated) — per-query times
are regex-scraped so a truncated artifact still contributes its tail.
"""
import json
import os
import re
import subprocess
import sys

# Pinned ANN quality floor: recall@20 of the budgeted multi-probe LSH at
# the standard 64-tables x 12-planes, 16-probes budget (QualityProbe).
# r09 measured 0.775; the floor leaves headroom for fixture noise but
# fails the report (exit 3) on a real probe-ordering regression.
RECALL_FLOOR = 0.75
# Same treatment for the other approximate-search quality points (r10
# verdict item 6): a codebook/probe regression must FAIL the report,
# not just trend in QUALITY.json. Floors sit under the measured values
# (ivf 0.694, ivfpq@16-of-64 0.544, flat pq 0.413) with fixture-noise
# headroom. Keys absent from QUALITY.json are skipped (older artifacts).
QUALITY_FLOORS = {
    "recall_at_20": RECALL_FLOOR,
    "ivf_recall_at_20": 0.6,
    "ivfpq_recall_at_20": 0.45,
    "pq_recall_at_20": 0.3,
    # rotated/learned/fitted sit at 0.375-0.381 vs flat PQ's 0.4125 on
    # the gate fixture: the fixture is near-isotropic (rotation's null
    # case — OPQ's wins come from anisotropy, PqSpec's anisotropic
    # fixture measures flat 0.21 vs fitted 0.775), so parity-with-noise
    # is the expected reading; the floors below catch a rotation BUG
    # (query rotated with a different matrix than the corpus), not a
    # missing win (r13 verdict item 3).
    "pq_rotated_recall_at_20": 0.3,  # Hadamard; measured 0.3813
    "pq_learned_recall_at_20": 0.3,
    "pq_fitted_recall_at_20": 0.3,  # data-fitted R; measured 0.375
    "sq8_recall_at_20": 0.9,  # rounding-only error; measured 0.9875
    # q216's gated 16x4 margin-mining budget vs exact all-pairs mining;
    # measured 0.9333 (the curve in QUALITY.json shows 4x6 at 0.17 —
    # margin normalization needs wider neighborhoods than plain
    # near-dup detection, so the OR-construction carries the budget)
    "margin_recall_at_30": 0.6,
    # the ANISOTROPIC-fixture OPQ numbers (r14 verdict item 3: the
    # headline used to carry only the isotropic null). QualityProbe
    # replays PqSpec's deterministic fixture: flat 0.2125, PCA-fitted
    # 0.775 — the fitted floor guards the regression that MATTERS
    # (a broken rotation fit), which the isotropic floors cannot see.
    "pq_fitted_recall_anisotropic": 0.5,
}
# Error CEILINGS (lower is better — the mirror of QUALITY_FLOORS) for
# the theta-sketch intersection bands vs the q225 exact twin: k=512
# measured mean 0.130 / max 0.41; ~2x headroom. QualityProbe enforces
# the same ceilings at generation time; this re-check makes a
# hand-edited or stale QUALITY.json fail the report too.
QUALITY_CEILINGS = {
    "theta_inter_mean_rel_err": 0.25,
    "theta_inter_max_rel_err": 0.7,
    # HDR quantile brackets (q230 vs the q231 exact twin): the b=5
    # bucketing bounds the lower-edge relative error by 2^-5 as a
    # THEOREM, so the ceiling is the exact theoretical bound with zero
    # headroom — any excess is a bucketing bug, not noise. QualityProbe
    # additionally hard-fails if any bracket fails to CONTAIN its
    # exact order statistic.
    "hdr_max_rel_err": 0.03125,
}
# Keys that MUST be present in QUALITY.json from r15 on (r14 verdict
# item 3: "round report fails if absent") — the absent-key skip above
# exists for pre-floor artifacts, and these are too load-bearing to
# silently drop out of the artifact.
REQUIRED_QUALITY_KEYS = ("pq_fitted_recall_anisotropic",
                         "theta_inter_mean_rel_err",
                         "hdr_max_rel_err")
# Driver-artifact noise honesty (r10 verdict item 7): when the bench
# run's wall passes disagree by more than this, per-query deltas are
# queue/noise-inflated — label them inconclusive, don't rank movers.
NOISE_LIMIT = 1.5


def check_quality_floors(quality):
    """Every floored metric present in the QUALITY dict must clear its
    floor or the round report fails (exit 3). Factored out so the
    injection test (tools/test_round_report.py) can pin the rule."""
    for metric, floor in QUALITY_FLOORS.items():
        if metric in quality and float(quality[metric]) < floor:
            print(f"QUALITY FAILURE: {metric}={quality[metric]} below "
                  f"pinned floor {floor} — approximate-search "
                  f"quality regressed", file=sys.stderr)
            sys.exit(3)
    for metric, ceiling in QUALITY_CEILINGS.items():
        if metric in quality and float(quality[metric]) > ceiling:
            print(f"QUALITY FAILURE: {metric}={quality[metric]} above "
                  f"pinned ceiling {ceiling} — sketch error band "
                  f"regressed", file=sys.stderr)
            sys.exit(3)
    for metric in REQUIRED_QUALITY_KEYS:
        if metric not in quality:
            print(f"QUALITY FAILURE: required metric {metric} absent "
                  f"from QUALITY.json — the probe or artifact is stale",
                  file=sys.stderr)
            sys.exit(3)


def has_medians(path):
    """True when the artifact carries per-query medians
    ("queries_median", written by Bench since r16) — including inside
    a driver wrapper's escaped tail (ADVICE r16: returning False for
    escaped artifacts while the regex scrape still picked medians up
    produced exactly the mixed-basis comparison this guards against).
    """
    try:
        text = open(path).read()
    except OSError:
        return False
    try:
        if json.loads(text).get("queries_median"):
            return True
    except json.JSONDecodeError:
        pass
    # driver wrapper: the local line rides escaped inside "tail", and
    # the wrapper itself is valid JSON without a top-level median map
    return '\\"queries_median\\":' in text


def _map_span(text, marker):
    """The brace-balanced {...} span immediately following `marker`
    (e.g. '\\"queries\\":'), or None. The per-query maps hold only
    simple keys and numbers, so brace counting is exact there."""
    i = text.find(marker)
    if i < 0:
        return None
    # the '{' must IMMEDIATELY follow the marker (whitespace only):
    # on a metric line where "queries" holds a scalar count, a free
    # find("{") would bind this span to the NEXT map ("slowest"),
    # bypassing the dedicated slowest-span precedence (ADVICE r17)
    start = i + len(marker)
    while start < len(text) and text[start] in " \t\r\n":
        start += 1
    if start >= len(text) or text[start] != "{":
        return None
    depth = 0
    for j in range(start, len(text)):
        if text[j] == "{":
            depth += 1
        elif text[j] == "}":
            depth -= 1
            if depth == 0:
                return text[start:j + 1]
    return None


def _scrape(text, use_median, esc):
    """Regex-scrape per-query times from a (possibly escaped) artifact,
    SCOPED to the right map (ADVICE r16: the old whole-text findall
    matched both "queries" and "queries_median" entries and kept the
    LAST, so medians silently overwrote min-of-passes regardless of
    use_median). Precedence: the requested map's span; else the
    min-of-passes "queries" span; else "slowest" spans (driver tails),
    keeping the FIRST occurrence per key."""
    q = '\\"' if esc else '"'
    # q is a LITERAL for the find()-based span markers; re.escape it
    # for the pattern (a bare \" in a regex is just ")
    qe = re.escape(q)
    pair = re.compile(qe + r'(q\d+[a-z_0-9]*)' + qe + r':\s*([0-9.]+)')
    span = _map_span(text, q + "queries_median" + q + ":") \
        if use_median else None
    if span is None:
        span = _map_span(text, q + "queries" + q + ":")
    if span is not None:
        return {k: float(v) for k, v in pair.findall(span)}
    times = {}
    rest = text
    while True:
        span = _map_span(rest, q + "slowest" + q + ":")
        if span is None:
            break
        for k, v in pair.findall(span):
            times.setdefault(k, float(v))
        rest = rest[rest.find(span) + len(span):]
    return times


def parse_bench(path, use_median=False):
    text = open(path).read()
    # driver wrapper: escaped quotes inside a "tail" string
    times = _scrape(text, use_median, esc=True)
    if not times:  # clean JSON line (BENCH_LOCAL.json)
        try:
            doc = json.loads(text)
            # r15 verdict item 8: cross-round deltas compare per-query
            # MEDIANS across the wall passes when BOTH artifacts carry
            # them (main() decides — comparing old min vs new median
            # would manufacture movers) — one burst window inflating a
            # single pass stops reading as a 2x regression.
            times = (doc.get("queries_median") if use_median else None) \
                or doc["queries"]
        except (json.JSONDecodeError, KeyError):
            times = _scrape(text, use_median, esc=False)
    # normalize to the short q-number key so rounds with different
    # name forms still line up
    return {k.split("_")[0]: (v, k) for k, v in times.items()}


def parse_noise(path):
    """noise_ratio from a bench artifact (either the clean JSON line or
    the driver wrapper's escaped tail); wall_runs max/min as fallback;
    1.0 when neither is present."""
    text = open(path).read()
    m = re.search(r'\\?"noise_ratio\\?":\s*([0-9.]+)', text)
    if m:
        return float(m.group(1))
    m = re.search(r'\\?"wall_runs\\?":\s*\[([0-9.,\s]+)\]', text)
    if m:
        walls = [float(x) for x in m.group(1).split(",") if x.strip()]
        if walls and min(walls) > 0:
            return max(walls) / min(walls)
    return 1.0


def parse_plan_names(path):
    return {m.split("_")[0] for m in
            re.findall(r"^==== (\S+) ====$", open(path).read(), re.M)}


def check_coverage(new_plans, nb):
    """Fail loudly when a gate artifact covers fewer queries than the
    live registry (r07: q90/q91 landed after the artifact refresh, so
    the two heaviest queries in the suite went ungated for plan shape
    and scaling). The fresh bench artifact is a live iteration of
    SparkEntry.queries, so it is the registry ground truth here; the
    plan dump and SCALEBENCH must match it exactly."""
    bench_qs = set(nb)
    plan_qs = parse_plan_names(new_plans)
    errs = []
    if plan_qs != bench_qs:
        errs.append(f"plan artifact {new_plans} covers {len(plan_qs)} "
                    f"queries but the bench registry has {len(bench_qs)} "
                    f"(missing: {sorted(bench_qs - plan_qs) or '-'}, "
                    f"extra: {sorted(plan_qs - bench_qs) or '-'})")
    try:
        sb = json.load(open("SCALEBENCH.json"))
        sb_qs = {r["query"].split("_")[0] for r in sb["queries"]}
        if sb_qs != bench_qs:
            errs.append(f"SCALEBENCH.json covers {len(sb_qs)} queries but "
                        f"the bench registry has {len(bench_qs)} "
                        f"(missing: {sorted(bench_qs - sb_qs) or '-'}, "
                        f"extra: {sorted(sb_qs - bench_qs) or '-'})")
    except (OSError, json.JSONDecodeError, KeyError):
        errs.append("SCALEBENCH.json missing or unparsable — the scale "
                    "gate never ran for this round")
    if errs:
        for e in errs:
            print("COVERAGE FAILURE:", e, file=sys.stderr)
        sys.exit(2)


def main():
    old_plans, new_plans, old_bench, new_bench = sys.argv[1:5]
    out = sys.argv[5] if len(sys.argv) > 5 else "ROUND_REPORT.md"
    # Optional serial-basis artifacts (r17 verdict item 1): argv[6/7] =
    # old/new BENCH_SERIAL.json — per-query times measured at
    # concurrency 1 in a sentinel-gated window (min-of-quiet-passes).
    # When the NEW serial artifact exists, the cross-round per-query
    # table reads ONLY that basis; the 8-way concurrent artifact keeps
    # the throughput headline (suite wall) but its per-query entries —
    # which attribute queue share to the query (77 of 269 r17 flags
    # were such artifacts) — no longer drive the regression table.
    old_serial = sys.argv[6] if len(sys.argv) > 6 else None
    new_serial = sys.argv[7] if len(sys.argv) > 7 else None
    use_median = has_medians(old_bench) and has_medians(new_bench)
    ob = parse_bench(old_bench, use_median)
    nb = parse_bench(new_bench, use_median)
    check_coverage(new_plans, nb)
    sb_new = {}
    if new_serial and os.path.exists(new_serial):
        try:
            sb_new = parse_bench(new_serial, use_median=False)
        except OSError:
            sb_new = {}
    sb_old = {}
    if sb_new and old_serial and os.path.exists(old_serial):
        try:
            sb_old = parse_bench(old_serial, use_median=False)
        except OSError:
            sb_old = {}
    if sb_new and sb_old:
        tb_old, tb_new = sb_old, sb_new
        basis_file = new_serial
        basis_note = ("per-query SERIAL basis on BOTH sides "
                      "(concurrency 1, sentinel-gated "
                      "min-of-quiet-passes)")
    elif sb_new:
        # first serial round: no committed serial baseline yet — fall
        # back to the old CONCURRENT min-of-passes (the closest thing
        # to an isolated cost that artifact carries; medians would
        # embed queue share and manufacture phantom recoveries)
        tb_old = parse_bench(old_bench, use_median=False)
        tb_new = sb_new
        basis_file = new_serial
        basis_note = ("NEW side SERIAL (concurrency 1) vs OLD "
                      "concurrent min-of-passes — first serial round; "
                      "ratios read optimistic by the old basis's "
                      "residual queue share; next round compares "
                      "serial vs serial")
    else:
        tb_old, tb_new = ob, nb
        basis_file = new_bench
        basis_note = ("per-query MEDIANS across wall passes"
                      if use_median else
                      "min-of-passes: an artifact predates medians")
    common = sorted(set(tb_old) & set(tb_new))
    lines = ["# Round report", "",
             f"Bench: {old_bench} -> {new_bench}"
             + (f"; per-query table: {old_serial or old_bench} -> "
                f"{new_serial}" if sb_new else ""),
             f"Basis: {basis_note}",
             ""]
    if re.search(r'\\?"burst\\?":\s*true', open(basis_file).read()):
        lines += ["**WARNING: per-query basis artifact is burst-suspect "
                  "(pass walls disagree >2x) — timings unreliable**", ""]
    noise = parse_noise(basis_file)
    noisy = noise > NOISE_LIMIT
    if noisy:
        lines += [f"**NOTE: bench run is noisy (wall disagreement "
                  f"{noise:.2f}x > {NOISE_LIMIT}x) — per-query deltas "
                  "below are INCONCLUSIVE (queue/co-tenant inflation), "
                  "not regressions**", ""]
    # r16 verdict item 1: a sustained co-tenant steal window covering
    # ALL passes reads clean on every RELATIVE check (noise_ratio
    # 1.245 in BENCH_r16 while everything was ~8x inflated) — the
    # absolute calibration sentinel is the only signal, and a
    # contended artifact's deltas are inconclusive exactly like burst.
    contended = bool(re.search(r'\\?"contended\\?":\s*true',
                               open(basis_file).read()))
    if contended and not noisy:
        noisy = True
        lines += ["**NOTE: bench artifact is CONTENDED (calibration "
                  "sentinel above its quiet band in every pass — "
                  "sustained co-tenant steal) — per-query deltas below "
                  "are INCONCLUSIVE, not regressions**", ""]
    elif contended:
        lines += ["**NOTE: bench artifact is also CONTENDED (sentinel "
                  "above band in every pass)**", ""]
    # Publish the absolute calibration sentinels next to the relative
    # health checks (r16 verdict item 1): a contended flag means NO
    # quiet window existed; sentinels ABOVE the ~0.55-0.72s quiet cost
    # but below the 2.0s band mean mild uniform co-tenant inflation —
    # cross-round ratios read high by that factor even when noise_ratio
    # looks clean, and the reader needs the number to judge.
    ms = re.search(r'\\?"sentinel_s\\?":\s*\[([0-9.,\s]+)\]',
                   open(basis_file).read())
    if ms:
        sent = [float(x) for x in ms.group(1).split(",") if x.strip()]
        if sent:
            lines += ["calibration sentinels (per-query basis): "
                      + ", ".join(f"{s:.2f}s" for s in sent)
                      + " (quiet cost ~0.6s, contended band 2.0s"
                      + (", CONTENDED)" if contended else ")"), ""]
    # Publish every wall pass next to the median headline (r14 verdict
    # item 1: the acceptance gate needs a wall number whose run-to-run
    # spread is visible, not a min-of-2 sample). The CONCURRENT
    # artifact's wall stays the throughput headline even when the
    # per-query table reads the serial basis — the two measure
    # different things (suite throughput vs per-query cost).
    mw = re.search(r'\\?"wall_runs\\?":\s*\[([0-9.,\s]+)\]',
                   open(new_bench).read())
    if mw:
        walls = [float(x) for x in mw.group(1).split(",") if x.strip()]
        if walls:
            spread = max(walls) / max(min(walls), 1e-9)
            lines += [f"throughput wall runs (8-way concurrent): "
                      f"{', '.join(f'{w:.1f}s' for w in walls)}"
                      f" — median headline, spread {spread:.2f}x"
                      + (" (< 1.5x: clean)" if spread < NOISE_LIMIT
                         else " (>= 1.5x: see noise note)"), ""]
    if sb_new:
        mw2 = re.search(r'"wall_runs":\s*\[([0-9.,\s]+)\]',
                        open(new_serial).read())
        if mw2:
            walls = [float(x) for x in mw2.group(1).split(",")
                     if x.strip()]
            if walls:
                lines += ["serial pass walls (concurrency 1): "
                          + ", ".join(f"{w:.1f}s" for w in walls), ""]
    if common:
        osum = sum(tb_old[q][0] for q in common)
        nsum = sum(tb_new[q][0] for q in common)
        # FULL per-query delta table (r14 verdict item 1: a hand-picked
        # 5-query comparison cannot prove "no regression" — every common
        # query is listed, sorted by ratio, and any >1.3x is flagged;
        # sub-0.3s absolute deltas are annotated as inside the
        # documented concurrent jitter rather than hidden).
        flagged = [q for q in common
                   if tb_old[q][0] > 0 and tb_new[q][0] / tb_old[q][0] > 1.3
                   and tb_new[q][0] - tb_old[q][0] >= 0.3]
        lines += [f"{len(common)} common queries, summed per-query "
                  f"{osum:.1f}s -> {nsum:.1f}s "
                  f"({(nsum - osum) / osum * 100:+.0f}%); "
                  f"{len(flagged)} queries over the 1.3x flag threshold"
                  + (": " + ", ".join(tb_new[q][1] for q in flagged)
                     if flagged else ""), "",
                  "| query | old s | new s | delta | ratio |",
                  "|---|---|---|---|---|"]
        by_ratio = sorted(
            common,
            key=lambda q: (tb_new[q][0] / tb_old[q][0] if tb_old[q][0] > 0
                           else float("inf")),
            reverse=True)
        for q in by_ratio:
            o, n = tb_old[q][0], tb_new[q][0]
            ratio = n / o if o > 0 else float("inf")
            tags = []
            if ratio > 1.3 and n - o >= 0.3:
                tags.append("**>1.3x**")
                if noisy:
                    tags.append("(inconclusive: noisy run)")
            elif ratio > 1.3:
                tags.append("(sub-noise delta)")
            lines.append(f"| {tb_new[q][1]} | {o:.2f} | {n:.2f} "
                         f"| {n - o:+.2f} | {ratio:.2f}"
                         f"{' ' + ' '.join(tags) if tags else ''} |")
    new_only = sorted(set(tb_new) - set(tb_old))
    if new_only:
        lines += ["", "New queries: " + ", ".join(
            f"{tb_new[q][1]} ({tb_new[q][0]:.2f}s)" for q in new_only)]
    lines += ["", f"Plan diff: {old_plans} -> {new_plans}", "", "```"]
    plan_diff = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plan_diff.py")
    diff = subprocess.run(
        [sys.executable, plan_diff, old_plans, new_plans],
        capture_output=True, text=True)
    # plan_diff exits 1 when it REPORTS regressions (its stdout is the
    # report we want in the artifact); only other codes are tool errors
    if diff.returncode not in (0, 1):
        sys.exit(f"plan_diff failed ({diff.returncode}): {diff.stderr}")
    lines += [diff.stdout.strip(), "```", ""]
    # approximation-quality + store-latency trends, when the per-round
    # artifacts exist (QualityProbe / StoreBench)
    try:
        d = json.load(open("QUALITY.json"))
        lines += [f"QUALITY.json: recall_at_20={d['recall_at_20']}, "
                  f"hll_max_rel_err={d['hll_max_rel_err']}", ""]
        # Hard floors (r09 verdict item 5; widened to the PQ/IVF-PQ
        # points in r11 per the r10 verdict item 6; pq_rotated added in
        # r14 per the r13 verdict item 3): the quality numbers used to
        # be diff-only — a probe-ordering or codebook regression would
        # print a delta and still ship. Every floored metric present in
        # QUALITY.json must clear its floor or the round report itself
        # fails (exit 3).
        check_quality_floors(d)
        # recall-vs-budget curve, diffed against the last committed
        # QUALITY.json (r08 verdict item 6: a probe-ordering regression
        # must show up as a number, and the low-budget end of the curve
        # bends first)
        curve = d.get("recall_curve")
        if curve:
            try:
                old = json.loads(subprocess.run(
                    ["git", "show", "HEAD:QUALITY.json"],
                    capture_output=True, text=True).stdout
                ).get("recall_curve", {})
            except (json.JSONDecodeError, OSError):
                old = {}
            pts = []
            for p in sorted(curve, key=int):
                delta = (f" ({curve[p] - old[p]:+.3f})"
                         if p in old and abs(curve[p] - old[p]) >= 0.005
                         else "")
                pts.append(f"p={p}: {curve[p]}{delta}")
            lines += ["recall_curve (64 tables x 12 planes, recall@20 "
                      "by probes/table): " + ", ".join(pts), ""]
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    try:
        d = json.load(open("BENCH_STORE.json"))
        lines += [f"BENCH_STORE.json: append_p95_ms="
                  f"{d['append']['p95_ms']}, "
                  f"read_p95_ms={d['read']['p95_ms']}", ""]
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
