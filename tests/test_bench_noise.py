"""Bench harness noise guard (r8 verdict item 5): min-of-N combination
and the third-sweep trigger rule, forced with synthetic sweep data."""

from __future__ import annotations

import bench


def test_combine_sweeps_min_of_two_and_noise():
    sel = ["a", "b", "c"]
    m1 = {"a": 1.0, "b": 2.0, "c": None}
    m2 = {"a": 4.0, "b": 2.2, "c": 3.0}
    times, noise = bench.combine_sweeps(sel, [m1, m2])
    assert times == {"a": 1.0, "b": 2.0, "c": 3.0}
    # per-query deltas: a = 3/1 = 3.0, b = 0.2/2 = 0.1; c has one run
    # only (no delta).  median of [0.1, 3.0] (upper-middle) = 3.0
    assert noise == 3.0


def test_third_sweep_trigger_rule():
    assert bench.needs_third_sweep(0.16)
    assert bench.needs_third_sweep(3.0)
    # the r12 artifact's 0.201 noise now triggers (round-13 lowering)
    assert bench.needs_third_sweep(0.201)
    assert not bench.needs_third_sweep(0.15)  # at threshold: no trigger
    assert not bench.needs_third_sweep(0.12)
    assert not bench.needs_third_sweep(None)  # single-sweep runs


def test_third_sweep_lowers_minima_but_not_trigger_metric():
    """The noise figure stays the run1-vs-run2 delta (the trigger
    metric must be stable under re-combination); the third sweep only
    improves per-query minima."""
    sel = ["a", "b"]
    m1 = {"a": 1.0, "b": 2.0}
    m2 = {"a": 4.0, "b": 8.0}  # degraded run
    _, noise2 = bench.combine_sweeps(sel, [m1, m2])
    assert bench.needs_third_sweep(noise2)
    m3 = {"a": 0.9, "b": 1.9}
    times3, noise3 = bench.combine_sweeps(sel, [m1, m2, m3])
    assert times3 == {"a": 0.9, "b": 1.9}
    assert noise3 == noise2


def test_quiet_runs_do_not_trigger():
    sel = ["a", "b"]
    m1 = {"a": 1.0, "b": 2.0}
    m2 = {"a": 1.1, "b": 2.1}
    _, noise = bench.combine_sweeps(sel, [m1, m2])
    assert not bench.needs_third_sweep(noise)


def test_single_sweep_has_no_noise_figure():
    times, noise = bench.combine_sweeps(["a"], [{"a": 1.5}])
    assert times == {"a": 1.5}
    assert noise is None


def test_all_failed_query_stays_none():
    times, noise = bench.combine_sweeps(["a"], [{"a": None}, {"a": None}])
    assert times == {"a": None}
    assert noise is None
