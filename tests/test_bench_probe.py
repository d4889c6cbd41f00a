"""Simulated-outage tests for bench.py's TPU probe retry loop.

Round-3 postmortem: BENCH_r03.json recorded nothing because the probe
gave up after ~6 minutes during a transient axon-tunnel outage, while
CLAUDE.md documents outages lasting hours.  These tests pin the new
policy: exponential backoff, ~an-hour default budget, success mid-outage
is honored, and the hard abort still fires when the budget runs out.
"""

import importlib.util
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def monotonic(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def _run(probe_results, budget_s, probe_cost_s=90.0):
    """Drive probe_with_retry against a scripted probe outcome sequence.

    probe_results: list of bools consumed per attempt; the last value
    repeats if attempts continue past the list.
    """
    clock = FakeClock()
    calls = {"n": 0}
    logs = []

    def probe_once():
        i = min(calls["n"], len(probe_results) - 1)
        calls["n"] += 1
        clock.t += probe_cost_s  # each probe burns its timeout when down
        return probe_results[i]

    ok = bench.probe_with_retry(
        probe_once, budget_s, sleep=clock.sleep,
        monotonic=clock.monotonic, log=logs.append,
    )
    return ok, calls["n"], clock, logs


def test_immediate_success_no_sleep():
    ok, attempts, clock, _ = _run([True], budget_s=3300)
    assert ok and attempts == 1 and clock.sleeps == []


def test_transient_outage_recovers_within_budget():
    # down for 5 probes (~7.5 min wall including backoff), then up —
    # the round-3 failure mode; must now succeed
    ok, attempts, clock, logs = _run([False] * 5 + [True], budget_s=3300)
    assert ok and attempts == 6
    # backoff doubled: 15, 30, 60, 120, 240
    assert clock.sleeps == [15.0, 30.0, 60.0, 120.0, 240.0]
    assert any("succeeded on attempt 6" in l for l in logs)


def test_budget_exhaustion_gives_up():
    ok, attempts, clock, logs = _run([False], budget_s=3300)
    assert not ok
    assert clock.t <= 3300 + 90 + 300  # never sleeps past the budget
    assert attempts >= 8               # kept trying for most of an hour
    assert any("gave up" in l for l in logs)


def test_backoff_caps_at_max():
    _, _, clock, _ = _run([False], budget_s=3300)
    assert max(clock.sleeps) == 300.0


def test_default_budget_env_override(monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_BUDGET_S", "1")
    monkeypatch.setattr(bench, "probe_with_retry",
                        lambda probe, budget, **kw: budget == 1.0)
    bench._probe_tpu()  # does not exit when probe_with_retry returns True


def test_probe_exits_2_when_budget_exhausted(monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_BUDGET_S", "0")
    monkeypatch.setattr(bench, "probe_with_retry",
                        lambda probe, budget, **kw: False)
    try:
        bench._probe_tpu()
    except SystemExit as e:
        assert e.code == 2
    else:
        raise AssertionError("expected SystemExit(2)")
