"""Profiler-trace top-op table for a pipeline stage.

    python scripts/trace_topops.py [--stage encode|head|forward|train]
                                   [--chunks 12] [--top 25]

Runs the stage twice under ``jax.profiler.trace`` (first run excluded:
compile) and aggregates device-op wall time from the generated perfetto
``*.trace.json.gz``, printing the top ops by total duration plus each op's
share of the stage.  This is the targeting tool for kernel work: attack
the top row, re-run, repeat (VERDICT r2 #1 methodology).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.utils.profiling import _sync


def build_stage(stage: str, chunks: int):
    params = atht.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(0.1 * rng.standard_normal((chunks, 2, 264600)),
                      jnp.float32)
    embs4 = jnp.zeros((4, 512), jnp.float32)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    if stage == "encode":
        @jax.jit
        def fn(params, wav, embs):
            enc = atht.encode_mixture(params, wav, dtype)
            return enc["x_enc"].sum().astype(jnp.float32)
    elif stage == "head":
        # Canonical encode/head jit split (atht.encode_mixture_jit): arrays
        # through jit, static Python-int plan re-attached from the closure.
        arrays, plan = atht.encode_mixture_jit(params, wav, dtype)
        enc = {**arrays, **plan}

        @jax.jit
        def fn(params, _wav, embs, enc=enc):
            return atht.apply_head_multi(params, enc, embs)[0].sum().astype(
                jnp.float32)
    elif stage == "forward":
        @jax.jit
        def fn(params, wav, embs):
            enc = atht.encode_mixture(params, wav, dtype)
            return atht.apply_head_multi(params, enc, embs)[0].sum().astype(
                jnp.float32)
    elif stage == "train":
        from audio_to_sheet_music_tpu.train import (TrainState, make_optimizer,
                                                    make_train_step)

        frozen = {"htdemucs": params["htdemucs"], "clap": params["clap"]}
        opt = make_optimizer(total_steps=100)
        step = make_train_step(opt)
        state = TrainState.create(params["head"], opt)
        rng2 = np.random.default_rng(1)
        batch = {
            "mixture": jnp.asarray(
                rng2.standard_normal((8, 2, 264600)), jnp.float32),
            "target": jnp.asarray(
                rng2.standard_normal((8, 2, 264600)), jnp.float32),
            "input_ids": jnp.asarray(np.tile([0, 100, 2], (8, 1)), jnp.int32),
            "attention_mask": jnp.ones((8, 3), jnp.int32),
        }

        def fn(params, wav, embs):
            new_state, metrics = step(state, frozen, batch)
            return metrics["loss/total"]
    else:
        raise SystemExit(f"unknown stage {stage}")
    return fn, (params, wav, embs4)


def collect_topops(trace_dir: str,
                   top: int) -> tuple[list[tuple[str, float, int]], float]:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    # device-op events live on TensorCore PID tracks; host threads carry
    # python/runtime noise.  Keep complete events with an op-like name.
    device_pids = set()
    for ev in trace.get("traceEvents", []):
        if (ev.get("ph") == "M" and ev.get("name") == "process_name"
                and "TensorCore" in str(ev.get("args", {}).get("name", ""))):
            device_pids.add(ev.get("pid"))
    agg = defaultdict(lambda: [0.0, 0])
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or not ev.get("dur"):
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        agg[name][0] += float(ev["dur"])     # microseconds
        agg[name][1] += 1
    rows = sorted(((n, d / 1e3, c) for n, (d, c) in agg.items()),
                  key=lambda r: -r[1])
    total = sum(r[1] for r in rows)       # ALL ops, not just the top-N —
    return rows[:top], total              # shares must not overstate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="encode",
                    choices=("encode", "head", "forward", "train"))
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep", action="store_true",
                    help="print the trace dir instead of deleting it")
    args = ap.parse_args()

    fn, fnargs = build_stage(args.stage, args.chunks)
    _sync(fn(*fnargs))                        # compile outside the trace
    tmp = tempfile.mkdtemp(prefix=f"trace_{args.stage}_")
    with jax.profiler.trace(tmp):
        _sync(fn(*fnargs))
    rows, total = collect_topops(tmp, args.top)
    covered = sum(r[1] for r in rows)
    print(f"stage={args.stage} chunks={args.chunks} "
          f"(top-{args.top} device ops cover {100 * covered / max(total, 1e-9):.0f}% "
          f"of {total:.1f} ms total; ms summed over calls)")
    for name, ms, count in rows:
        print(f"{ms:9.3f} ms  x{count:<4d} {100 * ms / max(total, 1e-9):5.1f}%"
              f"  {name[:110]}")
    if args.keep:
        print(f"trace dir: {tmp}")
    else:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
