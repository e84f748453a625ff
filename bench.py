"""Headline benchmark: full-song 4-stem separation throughput per chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Protocol (mirrors the reference eval path, `benchmark.py:155-204`): a 60 s
stereo mixture is separated into the 4 canonical stems with free-text
prompts, 6 s chunks, 1.5 s linear-crossfade overlap-add, bf16 compute,
producing 16-bit PCM stems (``separate_all_pcm`` — the production serving
format; device-side quantisation, zero host-side sample passes).
Metric: audio-seconds separated per wall-second per chip, counting the song
once per stem (a 4-stem pass over a 60 s song = 240 audio-sec of work).

``vs_baseline``: the reference never measured throughput (BASELINE.md), so
the comparison anchor is the north-star target of 50x realtime full-song
4-stem separation per chip (BASELINE.json): ``vs_baseline = value / 50``.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import threading
import time

import jax
import numpy as np

# Persistent XLA compile cache: bench reruns (and any CLI using the same
# shapes) skip the multi-minute sweep compile.
_CACHE = pathlib.Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

SONG_SECONDS = 60
SAMPLE_RATE = 44100
TARGET_REALTIME = 50.0  # BASELINE.json north star, 4-stem realtime per chip

# Partial evidence gathered as the run progresses; emitted with the final
# JSON line either way, so even an aborted run leaves machine-readable
# diagnostics (round-3 lesson: a bare os._exit produced `parsed: null`).
_DIAG: dict = {}
_LIVE_PROBES: list = []   # in-flight init probes, killed by the watchdog
_EMITTED = False          # once the line is out, late signals must not
                          # print a second (null) line over it


def _emit(value, error: str | None = None, **extra) -> None:
    """Print the ONE JSON line.  ``value=None`` + ``error`` = diagnosed
    failure — still parseable, never a silent abort."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    payload = {
        "metric": "4stem_separation_throughput",
        "value": value,
        "unit": "audio-sec/sec/chip",
        "vs_baseline": (round(value / TARGET_REALTIME, 3)
                        if value is not None else None),
    }
    if error is not None:
        payload["error"] = error
    payload.update(_DIAG)
    payload.update(extra)
    print(json.dumps(payload), flush=True)


def _probe_device_init(timeout_s: float) -> bool:
    """Try backend init in a killable subprocess.

    A wedged TPU tunnel blocks ``jax.devices()`` *in-process* with no way to
    cancel (observed >80 min in round 3); a subprocess probe turns the wedge
    into a bounded, retryable attempt.  ``ATSM_SIMULATE_WEDGE=1`` makes the
    probe block forever — the failure-path test hook.
    """
    code = (
        "import os,time;"
        "time.sleep(3600) if os.environ.get('ATSM_SIMULATE_WEDGE') else None;"
        "import jax; jax.devices(); print('probe-ok')"
    )
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)
    _LIVE_PROBES.append(proc)
    try:
        out, _ = proc.communicate(timeout=timeout_s)
        return proc.returncode == 0 and b"probe-ok" in out
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        return False
    finally:
        _LIVE_PROBES.remove(proc)


def _device_init_with_retry() -> bool:
    """Retry device init until it succeeds or the budget runs out.

    Budget via ``ATSM_BENCH_INIT_BUDGET`` (seconds, default 1800 — the
    round-3 wedge spanned >80 min, so we wait long and heartbeat rather
    than fail fast).  Per-attempt timeout via ``ATSM_BENCH_INIT_TIMEOUT``.
    """
    budget = float(os.environ.get("ATSM_BENCH_INIT_BUDGET", "1800"))
    attempt_timeout = float(os.environ.get("ATSM_BENCH_INIT_TIMEOUT", "180"))
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        remaining = budget - (time.monotonic() - t0)
        if remaining <= 0:
            break
        print(f"bench: device-init probe {attempt} "
              f"(budget left {remaining:.0f}s)", file=sys.stderr, flush=True)
        if _probe_device_init(min(attempt_timeout, max(remaining, 10.0))):
            _DIAG["init_attempts"] = attempt
            _DIAG["init_waited_sec"] = round(time.monotonic() - t0, 1)
            return True
        print(f"bench: probe {attempt} failed/timed out — tunnel busy or "
              "wedged, retrying", file=sys.stderr, flush=True)
        time.sleep(min(20.0, max(budget - (time.monotonic() - t0), 0)))
    _DIAG["init_attempts"] = attempt
    _DIAG["init_waited_sec"] = round(time.monotonic() - t0, 1)
    return False


def _deadline_watchdog(seconds: float):
    """Emit the diagnostic JSON line and exit if the WHOLE bench exceeds
    its deadline (a wedge can also strike mid-run, during D2H).  Returns a
    cancel() callable; tune with ``ATSM_BENCH_TOTAL_BUDGET`` (0 off)."""
    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(f"bench: total runtime exceeded {seconds:.0f}s — emitting "
                  "diagnostic and aborting", file=sys.stderr, flush=True)
            for p in list(_LIVE_PROBES):   # no orphaned probe processes
                p.kill()
            _emit(None, error="bench_deadline_exceeded")
            os._exit(0)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def _install_term_handler() -> None:
    """An external ``timeout``/driver sends SIGTERM before SIGKILL; that is
    not a Python exception, so without a handler the run dies with NO JSON
    line (the round-3 ``parsed: null`` failure mode, reachable again if the
    caller's deadline is shorter than the init-retry budget).  Convert the
    signal into the diagnostic emit + clean exit."""
    import signal

    def on_term(signum, frame):  # noqa: ARG001 - signal API
        for p in list(_LIVE_PROBES):
            p.kill()
        _emit(None, error=f"terminated_by_signal_{signum}")
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, on_term)
        except (ValueError, OSError):  # non-main thread / unsupported
            pass


def main() -> None:
    from audio_to_sheet_music_tpu.infer import Separator
    from audio_to_sheet_music_tpu.models import atht
    from audio_to_sheet_music_tpu.ops import kernel_gate
    from audio_to_sheet_music_tpu.text.prompts import STEM_NAMES

    _install_term_handler()

    total_budget = float(os.environ.get("ATSM_BENCH_TOTAL_BUDGET", "3000"))
    cancel = (_deadline_watchdog(total_budget) if total_budget > 0
              else (lambda: None))
    if not _device_init_with_retry():
        _emit(None, error="device_init_timeout")
        return
    t0 = time.perf_counter()
    jax.devices()   # probe succeeded; in-process init, under the deadline
    _DIAG["init_inprocess_sec"] = round(time.perf_counter() - t0, 1)
    params = atht.init(jax.random.PRNGKey(0))
    # Separator construction runs the on-hardware Pallas parity gate
    # (ops/kernel_gate.py): per-op vs fused-layer forward on THIS chip at
    # the active ATSM_PALLAS_QT.  Recorded in the JSON; on failure the
    # kernel is vetoed and the bench measures the per-op fallback.
    sep = Separator(params)
    gate = kernel_gate.last_result()
    if gate is not None:
        _DIAG["pallas_parity_rms"] = round(gate["rms"], 8)
        _DIAG["pallas_parity_ok"] = gate["ok"]
        _DIAG["pallas_qt"] = gate["qt"]

    rng = np.random.default_rng(0)
    t = SONG_SECONDS * SAMPLE_RATE
    # 16-bit PCM mixture, as a WAV source delivers it; conversion happens
    # on device (the host core is far slower than the TPU).
    song = np.clip(0.1 * rng.standard_normal((2, t)) * 32767, -32768,
                   32767).astype(np.int16)

    # Warmup: compile text encode + the multi-stem chunk forward for this grid.
    t0 = time.perf_counter()
    for stem in STEM_NAMES:
        sep.text_embedding(stem)
    _ = sep.separate_all_pcm(song)
    _DIAG["warmup_sec"] = round(time.perf_counter() - t0, 1)
    print(f"warmup (incl. compile): {_DIAG['warmup_sec']}s", file=sys.stderr)

    # Diagnostic: measured D2H bandwidth of the tunnel this session — single
    # stream and 4-stream aggregate (the tunnel is per-stream limited; the
    # serving path fetches over concurrent row-slice streams).  The 4-stem
    # PCM payload is ~42 MB, so throughput tracks the aggregate number.
    # Adaptive stream count: good weather is per-stream limited (4 streams
    # ~3x one), but a congested tunnel serialises anyway and the extra
    # streams only add overhead (observed: 14.4 MB/s aggregate < 16.4
    # single).  The separator reads ATSM_FETCH_STREAMS at fetch time, so
    # choosing here applies to the timed runs.  User-set env wins.
    tune = Separator.autotune_fetch_streams(nsplit=4, size_mb=42.0)
    _DIAG["d2h_single_MBps"] = tune["single_MBps"]
    _DIAG["d2h_multi_MBps"] = tune["multi_MBps"]
    _DIAG["fetch_streams"] = tune["streams"]
    print(f"tunnel D2H: {tune['single_MBps']:.0f} MB/s single-stream, "
          f"{tune['multi_MBps']:.0f} MB/s 4-stream aggregate -> "
          f"{tune['streams']} fetch stream(s)", file=sys.stderr)

    # 5 timed runs: the TPU tunnel's device<->host throughput is noisy.
    # The median is the headline (robust comparison anchor); the best run
    # is kept as the device-capability ceiling.
    times = []
    for _ in range(5):
        start = time.perf_counter()
        pcm, scales = sep.separate_all_pcm(song)
        assert pcm.dtype == np.int16 and pcm.shape[0] == len(STEM_NAMES)
        times.append(time.perf_counter() - start)
        _DIAG["runs_sec"] = [round(t, 3) for t in times]
    print(f"runs: {[round(t, 2) for t in times]}s", file=sys.stderr)
    # Headline = MEDIAN of 5 (the robust comparison anchor across rounds);
    # best-of-5 is disclosed alongside as the device-capability ceiling —
    # the spread is tunnel D2H weather (README "variance model").
    elapsed = float(np.median(times))

    # MFU diagnostic (VERDICT r2 #1): XLA cost-analysis FLOPs of the full
    # dispatched schedule vs wall-clock.  End-to-end MFU includes the D2H
    # transfer term; the compute-bound ceiling lives in
    # scripts/profile_forward.py / docs/PERFORMANCE.md.
    try:
        from audio_to_sheet_music_tpu.utils.profiling import peak_tflops

        fl = sep.sweep_flops(t)
        tfs = fl / elapsed / 1e12
        print(f"sweep flops: {fl/1e9:.1f} GFLOP -> {tfs:.2f} TFLOP/s "
              f"end-to-end ({100.0 * tfs / peak_tflops():.2f}% of "
              f"{peak_tflops():.0f} TFLOP/s peak)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - diagnostic only
        print(f"sweep flops unavailable: {e}", file=sys.stderr)

    audio_sec = SONG_SECONDS * len(STEM_NAMES)
    value = audio_sec / elapsed
    cancel()
    # value/vs_baseline = median-of-5; "best" is the capability ceiling.
    _emit(round(value, 2),
          best=round(audio_sec / min(times), 2))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - the one JSON line must exist
        import traceback

        traceback.print_exc()
        _emit(None, error=f"{type(e).__name__}: {e}"[:300])
        raise SystemExit(1)
