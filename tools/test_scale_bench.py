#!/usr/bin/env python3
"""Regression tests for the scale harness's integrity rules (r13 verdict
item 1). The r13 escape: graft.Bench writes its artifact even when a
query crashes (errors collected, nonzero exit), and scale_bench.bench()
only checked for the file — so a query that died in the isolated rerun
recorded its time-to-failure (0.01s at sf1 for q197, an 8000x
discrepancy against the 81s batch measurement) and the superlinear flag
was auto-cleared as "noise". These tests inject exactly that failure and
assert the gate now fails instead, plus pin the <1/3 discrepancy rule.

Runs in <1s with no sbt; wired into tools/ship_check.sh --fast (the
pre-commit hook) so the integrity rules cannot regress silently.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scale_bench as sb


class FakeResult:
    def __init__(self, returncode):
        self.returncode = returncode
        self.stdout = "fake stdout"
        self.stderr = "fake stderr"


def fake_run(artifact, returncode):
    """A stand-in for scale_bench.run that writes `artifact` to the
    SPARK_GRAFT_BENCH_OUT path (like graft.Bench does even on crash)
    and exits with `returncode`."""
    def _run(cmd, env=None):
        out = (env or {}).get("SPARK_GRAFT_BENCH_OUT")
        if out:
            with open(out, "w") as f:
                json.dump(artifact, f)
        return FakeResult(returncode)
    return _run


def expect_exit(fn, what):
    try:
        fn()
    except SystemExit as e:
        print(f"PASS {what}: SystemExit({str(e)[:90]}...)")
        return
    raise AssertionError(f"FAIL {what}: no SystemExit raised")


def main():
    real_run = sb.run
    try:
        # 1. injected crash: nonzero exit, artifact present (graft.Bench's
        #    actual crash behavior) -> the gate must die, not measure
        sb.run = fake_run({"value": 0.01, "queries": {"q197_margin_mining":
                           0.01}, "errors": {"q197_margin_mining": "boom"}},
                          returncode=1)
        expect_exit(lambda: sb.bench("/fake/sf1"),
                    "crashed bench (exit 1 + errors) fails the gate")

        # 2. nonzero exit alone (no errors map in the artifact)
        sb.run = fake_run({"value": 1.0, "queries": {"q1": 1.0}},
                          returncode=137)
        expect_exit(lambda: sb.bench("/fake/sf1"),
                    "nonzero bench exit alone fails the gate")

        # 3. errors map alone (exit 0 somehow) -> still fails
        sb.run = fake_run({"value": 1.0, "queries": {"q1": 1.0},
                           "errors": {"q1": "boom"}}, returncode=0)
        expect_exit(lambda: sb.bench("/fake/sf1"),
                    "non-empty errors map alone fails the gate")

        # 4. clean run returns the artifact
        sb.run = fake_run({"value": 2.5, "queries": {"q1": 2.5}},
                          returncode=0)
        art = sb.bench("/fake/sf1")
        assert art["queries"]["q1"] == 2.5, art
        print("PASS clean bench run returns the artifact")
    finally:
        sb.run = real_run

    # 5. the discrepancy rule: an isolated time <1/3 of the batch time
    #    must be treated as a suspect measurement (never clears a flag)
    assert sb.discrepant(0.01, 80.97), \
        "FAIL: q197's 0.01s-vs-81s isolated rerun not marked discrepant"
    assert sb.discrepant(26.0, 81.0), "FAIL: <1/3 boundary (26 vs 81)"
    assert not sb.discrepant(28.0, 81.0), "FAIL: >1/3 is a valid rerun"
    assert not sb.discrepant(5.0, None), "FAIL: no batch time -> no rule"
    assert not sb.discrepant(5.0, 0.0), "FAIL: zero batch time -> no rule"
    print("PASS discrepancy rule (<1/3 of batch keeps the flag)")

    print("\nall scale_bench integrity tests pass")


if __name__ == "__main__":
    main()
