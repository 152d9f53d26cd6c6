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


def test_emit_artifact_is_idempotent(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "_ARTIFACT", None)
    monkeypatch.setattr(bench, "_EMITTED", False)
    bench.emit_artifact()  # nothing set yet: no output
    assert capsys.readouterr().out == ""
    bench.set_artifact({"metric": "m", "value": 1})
    bench.emit_artifact()
    bench.emit_artifact()  # second call must not print a second line
    out = capsys.readouterr().out
    assert out.count("\n") == 1 and '"value": 1' in out


def test_sigterm_flushes_artifact(tmp_path):
    """An external killer (the round-3 loss mode: driver timeout →
    SIGTERM, rc=124, no number) must flush the secured artifact: exactly
    one JSON line on stdout, exit 0."""
    import json
    import os
    import signal
    import subprocess

    script = tmp_path / "guarded.py"
    script.write_text(
        "import importlib.util, sys, time\n"
        f"spec = importlib.util.spec_from_file_location('b', {str(_BENCH)!r})\n"
        "b = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(b)\n"
        "b._install_artifact_guard()\n"
        "b.set_artifact({'metric': 'm', 'value': 7})\n"
        "print('READY', file=sys.stderr, flush=True)\n"
        "time.sleep(120)\n"  # simulates a stalled phase-2
    )
    proc = subprocess.Popen(
        [sys.executable, str(script)], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)
    assert proc.stderr.readline().strip() == "READY"
    os.kill(proc.pid, signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1 and json.loads(lines[0])["value"] == 7


def test_device_phase_upgrades_artifact(bench, monkeypatch, tmp_path):
    """Drive _device_phase end-to-end with a faked healthy TPU: the
    secured host artifact must be upgraded in place — device headline,
    corpus shootout fields, per-geometry table, parity sweep — without
    a second JSON line. (The real device phase has only ever run against
    stalled relays; this pins the full upgrade path.)"""
    import types

    import jax

    import libacm_tpu.parallel as par
    from libacm_tpu.ops import synth_pallas
    from libacm_tpu.parallel import corpus as corpus_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(bench, "wait_for_relay", lambda budget: (0.01, 500.0))
    ref_times = iter([1.0] * 50)
    monkeypatch.setattr(bench, "time_reference_once",
                        lambda ref, files: next(ref_times))
    monkeypatch.setattr(bench, "pallas_parity_sweep", lambda t: "PASS")

    class FakeCorpus:
        def checksum(self):
            return 1234

    calls = []

    def fake_device(paths, backend="auto"):
        calls.append(backend)
        time.sleep(0.01)
        return FakeCorpus()

    monkeypatch.setattr(par, "decode_corpus_device", fake_device)
    monkeypatch.setattr(corpus_mod, "measure_backend",
                        lambda lv, rw: ("pallas", {"jax": 100.0,
                                                   "pallas": 150.0}))
    monkeypatch.setattr(synth_pallas, "pallas_supported",
                        lambda lv, rw: lv == 7)

    total = 100_000_000
    artifact = {
        "metric": "corpus_decode_Msamples_per_s", "value": 300.0,
        "unit": "Msamples/s", "vs_baseline": 3.0, "headline_path": "host",
        "device_resident_Msamples_per_s": None, "device_vs_baseline": None,
        "host_path_Msamples_per_s": 300.0, "host_vs_baseline": 3.0,
        "scan_Msamples_per_s": None,
        "backend_jax_Msamples_per_s": None,
        "backend_pallas_Msamples_per_s": None,
        "pallas_shootout": None, "pallas_parity_sweep": None,
        "relay_probe_s": None, "link_MBps": None, "bench_wall_s": 0.0,
    }
    bench._device_phase(artifact, ref=object(), files=["f"],
                        total_samples=total,
                        geoms={(7, 16): 90_000_000, (0, 2048): 10_000_000},
                        ref_t=[1.0], deadline=time.time() + 3600)

    assert artifact["headline_path"] == "device"
    assert artifact["device_resident_Msamples_per_s"] is not None
    # device beat the fake 1.0 s reference (100 Ms/s): vs_baseline > 1
    assert artifact["device_vs_baseline"] > 1
    assert artifact["value"] == artifact["device_resident_Msamples_per_s"]
    assert artifact["backend_jax_Msamples_per_s"] is not None
    assert artifact["backend_pallas_Msamples_per_s"] is not None
    assert artifact["pallas_shootout"] == {
        "7/16": {"winner": "pallas", "jax": 100.0, "pallas": 150.0}}
    assert artifact["pallas_parity_sweep"] == "PASS"
    # pure-compute summary: only (7,16) measured -> the winner's speed
    assert artifact["device_compute_Msamples_per_s"] == 150.0
    assert artifact["link_MBps"] == 500.0
    assert "auto" in calls and "jax" in calls and "pallas" in calls


def test_device_phase_linkbound_keeps_host_headline(bench, monkeypatch):
    """A degraded link with a slow device must keep the host headline
    and record the device numbers + telemetry. The wire-heavy corpus
    backend shootout is skipped, but the pure-compute evidence (the
    per-geometry shootout + parity sweep sync only scalars/KBs) still
    lands on the record — a bulk-degraded round must not null them."""
    import jax

    import libacm_tpu.parallel as par
    from libacm_tpu.ops import synth_pallas
    from libacm_tpu.parallel import corpus as corpus_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(bench, "wait_for_relay", lambda budget: (0.5, 5.0))
    monkeypatch.setattr(bench, "time_reference_once",
                        lambda ref, files: 0.05)
    monkeypatch.setattr(bench, "pallas_parity_sweep", lambda t: "PASS")
    monkeypatch.setattr(corpus_mod, "measure_backend",
                        lambda lv, rw: ("pallas", {"jax": 100.0,
                                                   "pallas": 150.0}))
    monkeypatch.setattr(synth_pallas, "pallas_supported",
                        lambda lv, rw: True)

    class FakeCorpus:
        def checksum(self):
            return 7

    def slow_device(paths, backend="auto"):
        time.sleep(0.2)  # slower than the 0.05 s "reference"
        return FakeCorpus()

    monkeypatch.setattr(par, "decode_corpus_device", slow_device)

    artifact = {
        "metric": "corpus_decode_Msamples_per_s", "value": 300.0,
        "unit": "Msamples/s", "vs_baseline": 3.0, "headline_path": "host",
        "device_resident_Msamples_per_s": None, "device_vs_baseline": None,
        "host_path_Msamples_per_s": 300.0, "host_vs_baseline": 3.0,
        "scan_Msamples_per_s": None, "backend_jax_Msamples_per_s": None,
        "backend_pallas_Msamples_per_s": None, "pallas_shootout": None,
        "pallas_parity_sweep": None, "relay_probe_s": None,
        "link_MBps": None, "bench_wall_s": 0.0,
    }
    # deadline close enough that the healthy-window retry is skipped
    bench._device_phase(artifact, ref=object(), files=["f"],
                        total_samples=1_000_000, geoms={(7, 16): 1_000_000},
                        ref_t=[0.05], deadline=time.time() + 300)

    assert artifact["headline_path"] == "host-linkbound"
    assert artifact["value"] == 300.0
    assert artifact["device_resident_Msamples_per_s"] is not None
    assert artifact["device_vs_baseline"] < 1
    assert artifact["link_MBps"] == 5.0
    # wire-heavy corpus backend rounds: skipped in this window
    assert artifact["backend_jax_Msamples_per_s"] is None
    # pure-compute evidence: still recorded
    assert artifact["pallas_shootout"] == {
        "7/16": {"winner": "pallas", "jax": 100.0, "pallas": 150.0}}
    assert artifact["device_compute_Msamples_per_s"] == 150.0
    assert artifact["pallas_parity_sweep"] == "PASS"


def _blank_artifact() -> dict:
    return {
        "metric": "corpus_decode_Msamples_per_s", "value": 300.0,
        "unit": "Msamples/s", "vs_baseline": 3.0, "headline_path": "host",
        "device_resident_Msamples_per_s": None, "device_vs_baseline": None,
        "host_path_Msamples_per_s": 300.0, "host_vs_baseline": 3.0,
        "scan_Msamples_per_s": None, "backend_jax_Msamples_per_s": None,
        "backend_pallas_Msamples_per_s": None, "pallas_shootout": None,
        "device_compute_Msamples_per_s": None, "pallas_parity_sweep": None,
        "relay_probe_s": None, "link_MBps": None, "bench_wall_s": 0.0,
    }


def test_healthy_but_slower_device_keeps_host_headline(bench, monkeypatch):
    """A verified-healthy window where the device path is honest but
    SLOWER than the host path (the standing regime: the relay link taxes
    every wire round) must keep the host number as the headline — the
    faster of two honest product paths — with device numbers alongside."""
    import jax

    import libacm_tpu.parallel as par
    from libacm_tpu.ops import synth_pallas
    from libacm_tpu.parallel import corpus as corpus_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(bench, "wait_for_relay", lambda budget: (0.01, 500.0))
    monkeypatch.setattr(bench, "time_reference_once",
                        lambda ref, files: 0.1)  # ref: 10 Ms/s
    monkeypatch.setattr(bench, "pallas_parity_sweep", lambda t: "PASS")
    monkeypatch.setattr(corpus_mod, "measure_backend",
                        lambda lv, rw: ("pallas", {"jax": 100.0,
                                                   "pallas": 150.0}))
    monkeypatch.setattr(synth_pallas, "pallas_supported",
                        lambda lv, rw: True)

    class FakeCorpus:
        def checksum(self):
            return 7

    def device(paths, backend="auto"):
        time.sleep(0.05)  # 20 Ms/s: beats ref (10), loses to host (300)
        return FakeCorpus()

    monkeypatch.setattr(par, "decode_corpus_device", device)

    artifact = _blank_artifact()
    bench._device_phase(artifact, ref=object(), files=["f"],
                        total_samples=1_000_000, geoms={(7, 16): 1_000_000},
                        ref_t=[0.1], deadline=time.time() + 3600)
    assert artifact["headline_path"] == "host"
    assert artifact["value"] == 300.0  # phase-1 host number untouched
    assert artifact["vs_baseline"] == artifact["host_vs_baseline"]
    assert artifact["device_resident_Msamples_per_s"] is not None
    assert artifact["device_vs_baseline"] > 1  # device DID beat the ref
    assert artifact["pallas_shootout"] is not None


def test_device_rounds_skipped_still_records_compute_evidence(
        bench, monkeypatch):
    """Below 1 MB/s the ~28 MiB corpus wire rounds are skipped outright,
    but the responsive-RTT compute phase must still record the shootout,
    device_compute summary, and parity sweep (the round-4 relay windows
    were exactly this shape)."""
    import jax

    import libacm_tpu.parallel as par
    from libacm_tpu.ops import synth_pallas
    from libacm_tpu.parallel import corpus as corpus_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(bench, "wait_for_relay", lambda budget: (0.3, 0.5))
    monkeypatch.setattr(bench, "pallas_parity_sweep", lambda t: "PASS")
    monkeypatch.setattr(corpus_mod, "measure_backend",
                        lambda lv, rw: ("pallas", {"jax": 90.0,
                                                   "pallas": 140.0}))
    monkeypatch.setattr(synth_pallas, "pallas_supported",
                        lambda lv, rw: True)

    def never(*a, **k):
        raise AssertionError("corpus wire round must not run below 1 MB/s")

    monkeypatch.setattr(par, "decode_corpus_device", never)

    artifact = _blank_artifact()
    bench._device_phase(artifact, ref=object(), files=["f"],
                        total_samples=1_000_000, geoms={(7, 16): 1_000_000},
                        ref_t=[0.05], deadline=time.time() + 3600)
    assert artifact["headline_path"] == "host"  # untouched
    assert artifact["device_resident_Msamples_per_s"] is None
    assert artifact["pallas_shootout"] == {
        "7/16": {"winner": "pallas", "jax": 90.0, "pallas": 140.0}}
    assert artifact["device_compute_Msamples_per_s"] == 140.0
    assert artifact["pallas_parity_sweep"] == "PASS"


def test_stalled_relay_skips_compute_phase(bench, monkeypatch):
    """A STALLED relay (probe rtt=inf) must not burn the budget on
    compute-phase deadlines: the rtt gate skips it and says so."""
    import jax

    from libacm_tpu.parallel import corpus as corpus_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(bench, "wait_for_relay",
                        lambda budget: (float("inf"), 0.0))

    def never(*a, **k):
        raise AssertionError("stalled relay must not be measured")

    monkeypatch.setattr(corpus_mod, "measure_backend", never)

    artifact = _blank_artifact()
    bench._device_phase(artifact, ref=object(), files=["f"],
                        total_samples=1_000_000, geoms={(7, 16): 1_000_000},
                        ref_t=[0.05], deadline=time.time() + 3600)
    assert artifact["pallas_shootout"] is None
    assert artifact["pallas_parity_sweep"] == "skipped (relay unresponsive)"


def test_recovery_loop_noop_when_evidence_complete(bench, monkeypatch):
    """A complete artifact must not probe at all (zero relay cost)."""
    def never(*a, **k):
        raise AssertionError("complete artifact must not probe")

    monkeypatch.setattr(bench, "safe_probe", never)
    artifact = _blank_artifact()
    artifact.update(pallas_shootout={"7/16": {"winner": "jax", "jax": 1.0,
                                              "pallas": 0.5}},
                    device_compute_Msamples_per_s=1.0,
                    pallas_parity_sweep="PASS",
                    device_resident_Msamples_per_s=100.0)
    t0 = time.time()
    bench._recovery_loop(artifact, ref=None, files=[], total_samples=1,
                         geoms={}, ref_t=[], t_start=t0,
                         probe_deadline=t0 + 3600, deadline=t0 + 3600)
    assert "recovery_probes" not in artifact


def test_recovery_loop_captures_evidence_after_relay_recovers(
        bench, monkeypatch):
    """The round-4 loss mode, fixed: the first probes are stalled, a later
    one answers — the loop must then land the compute evidence AND late
    device rounds in the artifact, and upgrade the headline if the device
    path won the window."""
    import jax

    import libacm_tpu.parallel as par
    from libacm_tpu.ops import synth_pallas
    from libacm_tpu.parallel import corpus as corpus_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(time, "sleep", lambda s: None)
    probes = iter([(float("inf"), 0.0), (float("inf"), 0.0), (0.1, 200.0)])
    monkeypatch.setattr(bench, "safe_probe",
                        lambda *a, **k: next(probes, (0.1, 200.0)))
    monkeypatch.setattr(bench, "pallas_parity_sweep", lambda t: "PASS")
    monkeypatch.setattr(corpus_mod, "measure_backend",
                        lambda lv, rw: ("pallas", {"jax": 100.0,
                                                   "pallas": 150.0}))
    monkeypatch.setattr(synth_pallas, "pallas_supported",
                        lambda lv, rw: True)
    monkeypatch.setattr(bench, "time_reference_once", lambda ref, files: 1.0)

    class FakeCorpus:
        def checksum(self):
            return 7

    monkeypatch.setattr(par, "decode_corpus_device",
                        lambda paths, backend="auto": FakeCorpus())

    artifact = _blank_artifact()
    artifact["device_compute_Msamples_per_s"] = None
    t0 = time.time()
    bench._recovery_loop(artifact, ref=object(), files=["f"],
                         total_samples=100_000_000,
                         geoms={(7, 16): 100_000_000}, ref_t=[1.0],
                         t_start=t0, probe_deadline=t0 + 3600,
                         deadline=t0 + 3600)
    assert len(artifact["recovery_probes"]) == 3
    assert artifact["recovery_probes"][0]["rtt_s"] is None  # stalled probe
    assert artifact["pallas_shootout"] == {
        "7/16": {"winner": "pallas", "jax": 100.0, "pallas": 150.0}}
    assert artifact["device_compute_Msamples_per_s"] == 150.0
    assert artifact["pallas_parity_sweep"] == "PASS"
    # device rounds: near-instant fake vs 1.0 s ref -> device headline
    assert artifact["device_resident_Msamples_per_s"] is not None
    assert artifact["headline_path"] == "device"
    assert artifact["value"] == artifact["device_resident_Msamples_per_s"]


def test_recovery_loop_records_probe_trail_on_dead_relay(bench, monkeypatch):
    """If the relay never answers, the artifact must still carry the
    probe trail (the proof the bench kept trying) and stop issuing new
    probes at probe_deadline."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "safe_probe",
                        lambda *a, **k: (float("inf"), 0.0))

    def never(*a, **k):
        raise AssertionError("dead relay must not reach the compute phase")

    monkeypatch.setattr(bench, "_compute_phase", never)
    monkeypatch.setattr(bench, "_recovery_device_rounds", never)

    artifact = _blank_artifact()
    artifact["device_compute_Msamples_per_s"] = None
    t0 = time.time()
    bench._recovery_loop(artifact, ref=None, files=[], total_samples=1,
                         geoms={}, ref_t=[], t_start=t0,
                         probe_deadline=t0 + 70.2, deadline=t0 + 700)
    assert artifact["pallas_shootout"] is None
    trail = artifact["recovery_probes"]
    assert trail and all(p["rtt_s"] is None and p["MBps"] == 0.0
                         for p in trail)


def test_compute_phase_resumes_without_remeasuring(bench, monkeypatch):
    """Re-entering _compute_phase must skip geometries already measured
    and keep a PASS sweep verdict — resume, not repeat."""
    from libacm_tpu.ops import synth_pallas
    from libacm_tpu.parallel import corpus as corpus_mod

    measured = []

    def measure(lv, rw):
        measured.append((lv, rw))
        return "pallas", {"jax": 50.0, "pallas": 80.0}

    monkeypatch.setattr(corpus_mod, "measure_backend", measure)
    monkeypatch.setattr(synth_pallas, "pallas_supported", lambda lv, rw: True)

    def never(t):
        raise AssertionError("PASS verdict must not re-run the sweep")

    monkeypatch.setattr(bench, "pallas_parity_sweep", never)

    artifact = _blank_artifact()
    artifact["pallas_shootout"] = {
        "7/16": {"winner": "pallas", "jax": 100.0, "pallas": 150.0}}
    artifact["pallas_parity_sweep"] = "PASS"
    artifact["device_compute_Msamples_per_s"] = None
    bench._compute_phase(artifact,
                         geoms={(7, 16): 3_000_000, (4, 40): 1_000_000},
                         deadline=time.time() + 3600, rtt_s=0.1)
    assert measured == [(4, 40)]  # only the missing geometry ran
    assert artifact["pallas_shootout"]["7/16"]["pallas"] == 150.0  # kept
    assert artifact["pallas_shootout"]["4/40"] == {
        "winner": "pallas", "jax": 50.0, "pallas": 80.0}
    # corpus-share-weighted harmonic mean over BOTH geometries' winners
    want = 4_000_000 / (3_000_000 / 150.0 + 1_000_000 / 80.0)
    assert abs(artifact["device_compute_Msamples_per_s"] - want) < 0.1
    assert artifact["pallas_parity_sweep"] == "PASS"


def test_main_crash_fallback_emits_one_line(bench, monkeypatch, capsys):
    """An exception BEFORE the phase-1 artifact is secured must still
    produce exactly one JSON line (the CLAUDE.md bench contract)."""
    import json

    monkeypatch.setattr(bench, "_ARTIFACT", None)
    monkeypatch.setattr(bench, "_EMITTED", False)
    monkeypatch.setattr(bench, "_install_artifact_guard", lambda: None)

    def boom(*a, **k):
        raise RuntimeError("corpus dir exploded")

    monkeypatch.setattr(bench, "_main", boom)
    monkeypatch.setattr(bench, "ensure_corpus", boom)  # fallback fails too
    rc = bench.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert rc == 0 and len(lines) == 1
    d = json.loads(lines[0])
    assert d["headline_path"] == "host-crashfallback"
    assert d["metric"] == "corpus_decode_Msamples_per_s"


def test_parity_sweep_salvages_partial_output_on_timeout(bench, monkeypatch):
    """A hard subprocess timeout mid-level must salvage the per-level
    lines already flushed to the pipe into a PARTIAL verdict, not drop a
    13-level sweep to 'timed out' (the r04 rehearsal failure mode)."""
    import subprocess as sp

    partial = ("level  1: rows  128 OK [tpu]\n"
               "level  2: rows   96 OK [tpu]\n")

    def fake_run(argv, timeout, capture_output, text):
        assert any(a.startswith("--deadline-s=") for a in argv)
        raise sp.TimeoutExpired(argv, timeout, output=partial)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    got = bench.pallas_parity_sweep(300.0)
    assert got == "PARTIAL: levels 1,2 OK (timed out mid-level)"


def test_parity_sweep_parses_result_lines(bench, monkeypatch):
    """The tool's flushed SWEEP RESULT line is authoritative: PASS,
    clean-deadline PARTIAL, and any MISMATCH -> FAIL."""
    import subprocess as sp

    cases = [
        ("level  1: rows  128 OK [tpu]\nSWEEP RESULT: PASS ok=13 levels\n",
         0, "PASS"),
        ("level  1: rows  128 OK [tpu]\nDEADLINE: stopping before level 2\n"
         "SWEEP RESULT: PARTIAL ok=1\n", 0,
         "PARTIAL: levels 1 OK (deadline)"),
        ("level  1: rows  128 MISMATCH [tpu]\n"
         "SWEEP RESULT: FAIL mismatch=1\n", 1, "FAIL"),
    ]
    for out, rc, want in cases:
        monkeypatch.setattr(
            bench.subprocess, "run",
            lambda argv, timeout, capture_output, text, _o=out, _r=rc:
            sp.CompletedProcess(argv, _r, stdout=_o, stderr=""))
        assert bench.pallas_parity_sweep(300.0) == want


def test_compute_phase_never_downgrades_partial_sweep(bench, monkeypatch):
    """Re-entering the compute phase with an existing PARTIAL verdict
    must keep it unless the retry proves MORE (more levels, PASS, or a
    FAIL — which always surfaces)."""
    artifact = _blank_artifact()
    artifact["pallas_shootout"] = {}
    artifact["pallas_parity_sweep"] = "PARTIAL: levels 1,2,3 OK (deadline)"

    monkeypatch.setattr(
        bench, "pallas_parity_sweep",
        lambda t: "sweep timed out (remote compile service)")
    bench._compute_phase(artifact, geoms={}, deadline=time.time() + 3600,
                         rtt_s=0.1)
    assert artifact["pallas_parity_sweep"] == \
        "PARTIAL: levels 1,2,3 OK (deadline)"

    monkeypatch.setattr(bench, "pallas_parity_sweep", lambda t: "PASS")
    bench._compute_phase(artifact, geoms={}, deadline=time.time() + 3600,
                         rtt_s=0.1)
    assert artifact["pallas_parity_sweep"] == "PASS"


def test_recovery_loop_runs_device_rounds_before_sweep(bench, monkeypatch):
    """In a recovered window with usable bulk, the bulk-hungry
    device-resident rounds must run BEFORE the compile-heavy compute
    phase — good-bulk windows are the rare resource, and a 900 s sweep
    first can eat the whole window."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "safe_probe", lambda *a, **k: (0.1, 2.0))
    order = []

    def fake_rounds(artifact, *a, **k):
        order.append("device")
        artifact["device_resident_Msamples_per_s"] = 50.0

    def fake_compute(artifact, geoms, deadline, rtt):
        order.append("compute")
        artifact["pallas_shootout"] = {}
        artifact["device_compute_Msamples_per_s"] = 1.0
        artifact["pallas_parity_sweep"] = "PASS"

    monkeypatch.setattr(bench, "_recovery_device_rounds", fake_rounds)
    monkeypatch.setattr(bench, "_compute_phase", fake_compute)

    artifact = _blank_artifact()
    t0 = time.time()
    bench._recovery_loop(artifact, ref=object(), files=["f"],
                         total_samples=1, geoms={}, ref_t=[1.0],
                         t_start=t0, probe_deadline=t0 + 3600,
                         deadline=t0 + 3600)
    assert order == ["device", "compute"]


def test_parity_sweep_crash_is_not_a_fail_verdict(bench, monkeypatch):
    """rc != 0 with no mismatch evidence in the output is a subprocess
    crash (segfault, import error, TPU init dying) — it must NOT be
    recorded as the terminal parity FAIL, which outranks and destroys
    earned PARTIAL evidence."""
    import subprocess as sp

    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda argv, timeout, capture_output, text:
        sp.CompletedProcess(argv, -11, stdout="", stderr="Segmentation"))
    got = bench.pallas_parity_sweep(300.0)
    assert got.startswith("error (sweep subprocess crashed")
    assert bench._sweep_rank(got) < bench._sweep_rank("PARTIAL: levels 1 OK")
