#!/usr/bin/env python3
"""Injection test for the round report's pinned quality gates (r13
verdict item 3: pq_rotated_recall_at_20 had no floor, so the one family
member whose quality was anomalous was the one that could regress
silently; widened r15 with error CEILINGS for the theta-sketch bands
and REQUIRED keys — r14 verdict item 3: the report must fail when the
anisotropic PQ number is absent, not just when it is low). Asserts
every floored metric fails the report (exit 3) when injected below its
floor, every ceilinged metric fails when injected above its ceiling,
required keys fail when absent, and healthy values pass. <1s, no sbt;
wired into ship_check --fast."""
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
    raise AssertionError(f"FAIL {what}: no exit on a breached gate")


def main():
    healthy = {m: f + 0.01 for m, f in rr.QUALITY_FLOORS.items()}
    healthy.update({m: c - 0.01 for m, c in rr.QUALITY_CEILINGS.items()})
    for k in rr.REQUIRED_QUALITY_KEYS:
        assert k in healthy, \
            f"FAIL: required key {k} has neither floor nor ceiling — " \
            "add it to one so a regression is actually gated"
    rr.check_quality_floors(healthy)  # must not exit
    rr.check_quality_floors(dict(healthy, unrelated_metric=0.0))
    print("PASS healthy values clear every floor and ceiling")

    assert "pq_rotated_recall_at_20" in rr.QUALITY_FLOORS, \
        "FAIL: the rotated-PQ point lost its floor (r13 item 3)"
    assert "pq_fitted_recall_anisotropic" in rr.QUALITY_FLOORS, \
        "FAIL: the anisotropic fitted-PQ point lost its floor (r14 item 3)"
    for metric, floor in rr.QUALITY_FLOORS.items():
        expect_exit3(dict(healthy, **{metric: floor - 0.001}),
                     f"injected {metric} below floor {floor} fails")
    for metric, ceiling in rr.QUALITY_CEILINGS.items():
        expect_exit3(dict(healthy, **{metric: ceiling + 0.001}),
                     f"injected {metric} above ceiling {ceiling} fails")
    for metric in rr.REQUIRED_QUALITY_KEYS:
        gone = dict(healthy)
        del gone[metric]
        expect_exit3(gone, f"absent required key {metric} fails")

    # exactly at the floor/ceiling passes (>= / <= bars)
    rr.check_quality_floors(
        dict(healthy,
             pq_rotated_recall_at_20=
             rr.QUALITY_FLOORS["pq_rotated_recall_at_20"],
             theta_inter_mean_rel_err=
             rr.QUALITY_CEILINGS["theta_inter_mean_rel_err"]))
    print("PASS at-floor/at-ceiling values pass")

    # r15 verdict item 8: medians drive deltas only when BOTH
    # artifacts carry them; a min-vs-median comparison would
    # manufacture movers.
    import json as _json
    import tempfile
    with_med = {"queries": {"q1_x": 1.0}, "queries_median": {"q1_x": 2.0}}
    without = {"queries": {"q1_x": 1.0}}
    def _tmp(doc):
        f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        f.write(_json.dumps(doc)); f.close(); return f.name
    pm, po = _tmp(with_med), _tmp(without)
    assert rr.has_medians(pm) and not rr.has_medians(po)
    assert rr.parse_bench(pm, use_median=True)["q1"][0] == 2.0
    assert rr.parse_bench(pm, use_median=False)["q1"][0] == 1.0
    assert rr.parse_bench(po, use_median=True)["q1"][0] == 1.0, \
        "median-less artifact must fall back to queries"
    print("PASS median selection is like-for-like only")

    # ADVICE r16: in the ESCAPED driver-tail path the old whole-text
    # regex matched both "queries" and "queries_median" pairs and kept
    # the LAST, so medians silently overwrote min-of-passes regardless
    # of use_median, while has_medians read False for the escaped
    # artifact — the exact mixed-basis comparison the median gate
    # guards against. The scrape is now scoped to one map span and
    # has_medians sees escaped artifacts.
    local_line = _json.dumps(with_med)
    escaped = _tmp({"n": 1, "rc": 0,
                    "tail": "noise\n" + local_line + "\n"})
    assert rr.has_medians(escaped), \
        "escaped artifact with queries_median must report has_medians"
    assert rr.parse_bench(escaped, use_median=False)["q1"][0] == 1.0, \
        "min-of-passes request must read the queries map, not medians"
    assert rr.parse_bench(escaped, use_median=True)["q1"][0] == 2.0
    # driver metric-line tails carry only "slowest" — still scraped,
    # first occurrence per key wins across multiple spans
    slow_tail = _tmp({"tail": '{"slowest":{"q9_a":5.0}}\n'
                              '{"slowest":{"q9_a":7.0}}'})
    assert rr.parse_bench(slow_tail)["q9"][0] == 5.0
    print("PASS escaped-tail scrape is span-scoped and median-honest")

    # ADVICE r17: on a metric line where "queries" holds a SCALAR count
    # (driver tails), _map_span must not bind the 'queries' span to the
    # NEXT map ("slowest") — the '{' has to immediately follow the
    # marker, so metric lines fall through to the slowest-span path.
    metric = '{"n_queries":5,"queries":5,"slowest":{"q7_a":3.0}}'
    assert rr._map_span(metric, '"queries":') is None, \
        "scalar queries value must not bind to the following map"
    assert rr.parse_bench(_tmp({"tail": metric}))["q7"][0] == 3.0, \
        "metric line must fall through to the slowest-span path"
    assert rr._map_span('{"queries": {"q1_a":1.0}}', '"queries":') \
        == '{"q1_a":1.0}', "whitespace before the brace stays allowed"
    print("PASS scalar-queries metric lines fall through to slowest")

    # r16 verdict item 1: a contended artifact (absolute sentinel above
    # band in every pass) must be detected by the same regex the report
    # uses, escaped or clean.
    pat = r'\\?"contended\\?":\s*true'
    import re as _re
    assert _re.search(pat, '{"contended":true,"x":1}')
    assert _re.search(pat, '{"tail":"{\\"contended\\":true}"}')
    assert not _re.search(pat, '{"queries":{"q1_x":1.0}}')
    print("PASS contended flag detection (clean and escaped)")
    print("\nall round_report gate tests pass")


if __name__ == "__main__":
    main()
