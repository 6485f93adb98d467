#!/usr/bin/env python3
"""Injection test for the round report's pinned quality floors (r13
verdict item 3: pq_rotated_recall_at_20 had no floor, so the one family
member whose quality was anomalous was the one that could regress
silently). Asserts every floored metric — including the rotated point —
fails the report (exit 3) when injected below its floor, and that
at-floor values pass. <1s, no sbt; wired into ship_check --fast."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import round_report as rr


def expect_exit3(quality, what):
    try:
        rr.check_quality_floors(quality)
    except SystemExit as e:
        assert e.code == 3, f"FAIL {what}: exit {e.code}, wanted 3"
        print(f"PASS {what}")
        return
    raise AssertionError(f"FAIL {what}: no exit on a breached floor")


def main():
    healthy = {m: f + 0.01 for m, f in rr.QUALITY_FLOORS.items()}
    rr.check_quality_floors(healthy)  # must not exit
    rr.check_quality_floors(dict(healthy, unrelated_metric=0.0))
    rr.check_quality_floors({})  # absent metrics are skipped
    print("PASS healthy values clear every floor")

    assert "pq_rotated_recall_at_20" in rr.QUALITY_FLOORS, \
        "FAIL: the rotated-PQ point lost its floor (r13 item 3)"
    for metric, floor in rr.QUALITY_FLOORS.items():
        expect_exit3(dict(healthy, **{metric: floor - 0.001}),
                     f"injected {metric} below floor {floor} fails")

    # exactly at the floor passes (floor is a >= bar)
    rr.check_quality_floors(
        dict(healthy, pq_rotated_recall_at_20=
             rr.QUALITY_FLOORS["pq_rotated_recall_at_20"]))
    print("PASS at-floor value passes")
    print("\nall round_report floor tests pass")


if __name__ == "__main__":
    main()
