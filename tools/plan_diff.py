#!/usr/bin/env python3
"""Diff two Plans.scala dumps (PLANS_rNN.txt) and flag plan regressions
that wall-clock noise can hide:

  - exchange count increased (new shuffle / broadcast)
  - PushedFilters lines decreased (lost pushdown)
  - WholeStageCodegen span count decreased (codegen break)
  - a query's plan started failing, or a query disappeared

Usage: tools/plan_diff.py PLANS_r02.txt PLANS_r03.txt
Exit 1 if any regression is found (new queries are reported, not fatal).

A plan change that is the REQUIRED price of a semantics fix (e.g. q183's
counts scan losing its inferred IsNotNull(lang) pushdown because null
became a stratum) is waived via tools/plan_waivers.txt: one exact
regression string per line, '#' comments allowed. Waived hits downgrade
to notes so a real future regression on the same query still fails.
"""
import os
import re
import sys


def parse(path):
    plans = {}
    name = None
    buf = []
    with open(path) as f:
        for line in f:
            m = re.match(r"^==== (\S+) ====$", line)
            if m:
                if name:
                    plans[name] = "".join(buf)
                name, buf = m.group(1), []
            else:
                buf.append(line)
    if name:
        plans[name] = "".join(buf)
    return plans


def stats(plan):
    return {
        # formatted-mode tree nodes: "Exchange (4)" is a shuffle,
        # "BroadcastExchange (15)" is not
        "shuffles": len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange \(\d+\)", plan)),
        "pushed_filters": len([l for l in plan.splitlines()
                               if "PushedFilters: [" in l and "PushedFilters: []" not in l]),
        "codegen_spans": len(re.findall(r"WholeStageCodegen", plan)),
        "failed": "PLAN FAILED" in plan,
    }


def main():
    if len(sys.argv) != 3:
        sys.exit("usage: plan_diff.py OLD_PLANS.txt NEW_PLANS.txt")
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, new = parse(old_path), parse(new_path)
    regressions, notes = [], []
    for q in sorted(old):
        if q not in new:
            regressions.append(f"{q}: query disappeared")
            continue
        so, sn = stats(old[q]), stats(new[q])
        if sn["failed"] and not so["failed"]:
            regressions.append(f"{q}: plan now FAILS")
            continue
        if sn["shuffles"] > so["shuffles"]:
            regressions.append(
                f"{q}: shuffles {so['shuffles']} -> {sn['shuffles']}")
        if sn["pushed_filters"] < so["pushed_filters"]:
            regressions.append(
                f"{q}: PushedFilters scans {so['pushed_filters']} -> {sn['pushed_filters']}")
        if sn["codegen_spans"] < so["codegen_spans"]:
            notes.append(
                f"{q}: codegen spans {so['codegen_spans']} -> {sn['codegen_spans']} (check: fewer can also mean a simpler plan)")
    for q in sorted(set(new) - set(old)):
        s = stats(new[q])
        notes.append(
            f"{q}: NEW (shuffles={s['shuffles']}, pushed={s['pushed_filters']}, codegen={s['codegen_spans']})")

    waiver_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "plan_waivers.txt")
    waivers = set()
    if os.path.exists(waiver_path):
        with open(waiver_path) as f:
            waivers = {l.strip() for l in f
                       if l.strip() and not l.lstrip().startswith("#")}
    waived = [r for r in regressions if r in waivers]
    regressions = [r for r in regressions if r not in waivers]
    notes.extend(f"{r} [waived: plan_waivers.txt]" for r in waived)

    for n in notes:
        print("note:", n)
    if regressions:
        for r in regressions:
            print("REGRESSION:", r)
        print(f"\n{len(regressions)} regression(s) vs {old_path}")
        sys.exit(1)
    print(f"no plan regressions vs {old_path} ({len(old)} queries compared)")


if __name__ == "__main__":
    main()
