"""Driver entry points, tested the way the driver invokes them.

Round 3's only regression lived in the *parent* path of
``__graft_entry__.dryrun_multichip`` (a jax device query before the CPU
subprocess spawn initialised the real TPU backend and hung on a wedged
tunnel).  These tests pin the wedge-proofing contract:

* the parent performs NO jax backend work — a poisoned jax module must not
  be touched before the subprocess spawn;
* the spawned child is hermetic: ``PYTHONPATH`` stripped (no axon plugin on
  the import path), platform forced to CPU, portable-ISA compile cache;
* the whole file works end-to-end as ``python __graft_entry__.py`` (tiny
  model family, 2 virtual devices);
* ``bench.py`` under a simulated wedge (``ATSM_SIMULATE_WEDGE=1``) still
  emits ONE parseable JSON line — never a bare abort with no evidence.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import jax
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import __graft_entry__  # noqa: E402


def test_entry_returns_jittable_fn_and_args():
    fn, args = __graft_entry__.entry()
    assert callable(fn) and isinstance(args, tuple)
    # Trace without compiling: the contract is "jittable on these args".
    out = jax.eval_shape(fn, *args)
    leaves = jax.tree.leaves(out)
    assert leaves, "entry() fn must return arrays"
    wav = args[1]
    assert any(leaf.shape[-1] == wav.shape[-1] for leaf in leaves), (
        "forward must produce stem audio at input length")


class _Poisoned:
    """Any attribute access = the parent touched a jax backend API."""

    def __getattr__(self, name):  # pragma: no cover - failure path
        raise AssertionError(
            f"dryrun_multichip parent touched jax.{name} — the parent must "
            "do no jax work (a wedged tunnel blocks backend init forever)")


def test_dryrun_parent_spawns_without_any_jax_call(monkeypatch):
    recorded = {}

    def fake_run(cmd, cwd=None, env=None, **kw):
        recorded["cmd"], recorded["env"] = cmd, env

        class P:
            returncode = 0

        return P()

    monkeypatch.delenv("ATSM_DRYRUN_INPROC", raising=False)
    monkeypatch.setattr(__graft_entry__.subprocess, "run", fake_run)
    # Poison every jax lookup the parent could make; the module-level
    # namespace has no jax import, and this guards against reintroducing one
    # inside the function body.
    monkeypatch.setitem(sys.modules, "jax", _Poisoned())
    try:
        __graft_entry__.dryrun_multichip(8)
    finally:
        monkeypatch.undo()

    env = recorded["env"]
    assert "PYTHONPATH" not in env, "child must not see the axon plugin path"
    assert env["JAX_PLATFORMS"] == "cpu"
    code = recorded["cmd"][-1]
    assert "xla_force_host_platform_device_count=8" in code
    assert "xla_cpu_max_isa=AVX2" in code, "portable compile-cache ISA pin"
    assert "_dryrun_impl(8)" in code


def test_dryrun_parent_propagates_child_failure(monkeypatch):
    def fake_run(cmd, cwd=None, env=None, **kw):
        class P:
            returncode = 7

        return P()

    monkeypatch.delenv("ATSM_DRYRUN_INPROC", raising=False)
    monkeypatch.setattr(__graft_entry__.subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="rc=7"):
        __graft_entry__.dryrun_multichip(4)


def test_dryrun_end_to_end_subprocess():
    """``python __graft_entry__.py`` exactly as the driver runs it (tiny
    family member + 2 devices keep the one-core compile affordable)."""
    env = dict(os.environ)
    env["ATSM_TINY_MODEL"] = "1"
    env["ATSM_DRYRUN_DEVICES"] = "2"
    # Reuse the suite's local (gitignored) cache, NOT the committed dryrun
    # cache — tiny-model test entries must not bloat the repo, but repeat
    # suite runs should skip the compile.
    env["ATSM_DRYRUN_CACHE"] = str(REPO / ".jax_cache_cpu")
    env.pop("ATSM_DRYRUN_INPROC", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "spawning forced-CPU subprocess" in proc.stdout
    assert "dp_delta=" in proc.stdout, proc.stdout
    assert "ok, loss=" in proc.stdout, proc.stdout


def test_bench_simulated_wedge_emits_parseable_json():
    """VERDICT r3 #1(b): a wedge must yield a diagnosable JSON line, not a
    bare exit — ``BENCH_r*.json.parsed`` must never be null again."""
    env = dict(os.environ)
    env["ATSM_SIMULATE_WEDGE"] = "1"
    env["ATSM_BENCH_INIT_BUDGET"] = "8"
    env["ATSM_BENCH_INIT_TIMEOUT"] = "2"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "4stem_separation_throughput"
    assert payload["value"] is None and payload["vs_baseline"] is None
    assert payload["error"] == "device_init_timeout"
    assert payload["init_attempts"] >= 1
    assert payload["init_waited_sec"] >= 7


def test_bench_deadline_watchdog_emits_parseable_json():
    """A mid-run wedge (after init) is bounded by the total-budget watchdog,
    which also leaves a parseable line behind."""
    env = dict(os.environ)
    env["ATSM_SIMULATE_WEDGE"] = "1"
    env["ATSM_BENCH_INIT_BUDGET"] = "3600"   # init retries would spin...
    env["ATSM_BENCH_INIT_TIMEOUT"] = "3600"
    env["ATSM_BENCH_TOTAL_BUDGET"] = "6"     # ...but the deadline fires first
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["value"] is None
    assert payload["error"] == "bench_deadline_exceeded"


def test_bench_sigterm_emits_parseable_json():
    """An external driver deadline (`timeout` sends SIGTERM first) is not a
    Python exception — bench converts it to the diagnostic line instead of
    dying silently mid-init-retry (the remaining r3 `parsed: null` path)."""
    import signal
    import time

    env = dict(os.environ)
    env["ATSM_SIMULATE_WEDGE"] = "1"
    env["ATSM_BENCH_INIT_BUDGET"] = "3600"
    env["ATSM_BENCH_INIT_TIMEOUT"] = "3600"
    env["ATSM_BENCH_TOTAL_BUDGET"] = "0"     # watchdog off: signal path only
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    try:
        # wait for the first probe heartbeat so the handler is installed
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stderr.readline()
            if "device-init probe" in line:
                break
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        proc.kill()
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["value"] is None
    assert payload["error"] == "terminated_by_signal_15"
