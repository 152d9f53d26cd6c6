"""Unit tests for bench.py's artifact-survival machinery.

The bench's one-JSON-line contract must hold through stalled links
(jax.device_put blocking forever), transport exceptions, and budget
exhaustion — these pin the primitives that implement it.
"""

import importlib.util
import pathlib
import sys
import time

import pytest

_BENCH = pathlib.Path(__file__).resolve().parents[1] / "bench.py"


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_deadline_returns_value(bench):
    val, ok = bench._deadline(lambda: 42, 5.0, "t")
    assert ok and val == 42


def test_deadline_abandons_stalled_call(bench):
    t0 = time.perf_counter()
    val, ok = bench._deadline(lambda: time.sleep(60), 0.3, "t")
    assert not ok and val is None
    assert time.perf_counter() - t0 < 5


def test_deadline_reraises_exceptions(bench):
    with pytest.raises(ValueError):
        bench._deadline(lambda: (_ for _ in ()).throw(ValueError("x")),
                        5.0, "t")


def test_safe_probe_maps_stall_and_error_to_dead_link(bench, monkeypatch):
    monkeypatch.setattr(bench, "relay_probe",
                        lambda: (_ for _ in ()).throw(RuntimeError("drop")))
    assert bench.safe_probe() == (float("inf"), 0.0)
    monkeypatch.setattr(bench, "relay_probe", lambda: time.sleep(60))
    t0 = time.perf_counter()
    assert bench.safe_probe(timeout_s=0.3) == (float("inf"), 0.0)
    assert time.perf_counter() - t0 < 5
    # sub-5s timeouts skip probing entirely (can't classify, assume dead)
    assert bench.safe_probe(timeout_s=1.0) == (float("inf"), 0.0)


def test_wait_for_relay_respects_budget(bench, monkeypatch):
    calls = []

    def slow_dead_probe():
        calls.append(time.time())
        time.sleep(0.1)
        return 9.9, 0.0

    monkeypatch.setattr(bench, "relay_probe", slow_dead_probe)
    t0 = time.perf_counter()
    rtt, mbps = bench.wait_for_relay(0.0)  # zero budget: one probe, out
    assert mbps == 0.0 and len(calls) == 1
    assert time.perf_counter() - t0 < 30


def test_healthy_probe_short_circuits(bench, monkeypatch):
    monkeypatch.setattr(bench, "relay_probe",
                        lambda: (0.05, bench.HEALTHY_MBPS + 5))
    rtt, mbps = bench.wait_for_relay(300.0)
    assert mbps >= bench.HEALTHY_MBPS
