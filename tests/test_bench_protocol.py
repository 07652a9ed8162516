"""Spark-free tests of the bench measurement protocol (bench.py
measure_pair): the corroborated-minimum stopping rule and the round-5
gate-aware extension (keep spending rounds while the running
minima-ratio efficiency is below target), driven by a faked worker."""

from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


@pytest.fixture
def fake_worker(monkeypatch):
    """Install a scripted run_worker; returns a FRESH call log per
    install (each install starts its own count)."""

    def install(script):
        calls: list[int] = []

        def run_worker(cpus, data, reps=2):
            calls.append(cpus)
            t = script(cpus, calls.count(cpus))
            return {"elapsed": [t, t], "points": 1000, "turns": 100}

        monkeypatch.setattr(bench, "run_worker", run_worker)
        return calls

    return install


def test_stops_when_corroborated_and_above_target(fake_worker):
    calls = fake_worker(lambda cpus, n: 80.0 if cpus == 2 else 23.0)
    r = bench.measure_pair(2, 8, "x", extra_rounds=6, target_eff=0.84)
    # eff = 80/23/4 = 0.8696 >= 0.84, corroborated in base rounds -> stop
    assert r["eff"] == pytest.approx(80.0 / 23.0 / 4, abs=1e-3)
    assert calls.count(8) == bench.ROUNDS


def test_keeps_spending_rounds_below_target(fake_worker):
    # hi level dirty for 3 rounds (30 s), clean afterwards (23 s):
    # the gate-aware rule must keep going past corroboration and catch it
    calls = fake_worker(
        lambda cpus, n: 80.0 if cpus == 2 else (30.0 if n <= 3 else 23.0)
    )
    r = bench.measure_pair(2, 8, "x", extra_rounds=6, target_eff=0.84)
    assert r["elapsed_hi"] == 23.0
    assert r["eff"] == pytest.approx(80.0 / 23.0 / 4, abs=1e-3)
    assert calls.count(8) >= 4
    # without the target, the old rule would have stopped at ROUNDS
    calls2 = fake_worker(
        lambda cpus, n: 80.0 if cpus == 2 else (30.0 if n <= 3 else 23.0)
    )
    r2 = bench.measure_pair(2, 8, "x", extra_rounds=6)
    assert calls2.count(8) == bench.ROUNDS
    assert r2["elapsed_hi"] == 30.0


def test_cap_respected_when_never_reaching_target(fake_worker):
    calls = fake_worker(lambda cpus, n: 80.0 if cpus == 2 else 30.0)
    r = bench.measure_pair(2, 8, "x", extra_rounds=6, target_eff=0.84)
    # eff 80/30/4 = 0.667 never reaches target -> run to the cap, report
    assert calls.count(8) == bench.ROUNDS + 6
    assert r["eff"] == pytest.approx(80.0 / 30.0 / 4, abs=1e-3)
