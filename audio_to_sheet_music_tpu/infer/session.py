"""Separator — the high-level inference session all entry points share.

Owns: model params (optionally mesh-replicated), a prompt->embedding cache
(the text tower runs once per distinct prompt, SURVEY §7 step 4), and a cache
of **fully-fused jitted song sweeps** keyed by chunk grid: framing, the
shared frozen encoder pass, every per-stem head, and the weighted overlap-add
all run as ONE XLA program per song (or per chunk group on the pipelined PCM
path, where each group's host transfer overlaps later groups' compute) — no
eager op-by-op traffic (which dominates wall-clock over the TPU tunnel).
Replaces the reference's three separate host-side loops
(`benchmark.py:122-215`, `app.py:129-178`, `test_inference.py:96-142`).
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import atht
from ..parallel import mesh as meshlib
from ..text.prompts import STEM_NAMES
from ..text.tokenizer import default_tokenizer
from . import chunked

SAMPLE_RATE = 44100


@jax.jit
def _requant_absolute(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Shared-scale wire PCM -> absolute-level int16 (``pcm/32767`` decodes
    to the float stem, clipped at ±1) in one device elementwise pass."""
    return jnp.clip(jnp.round(q.astype(jnp.float32) * scale),
                    -32767, 32767).astype(jnp.int16)


@jax.jit
def _quant_absolute(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x.astype(jnp.float32) * 32767.0),
                    -32767, 32767).astype(jnp.int16)


class Separator:
    """Text-conditioned full-song stem separation."""

    def __init__(
        self,
        params,
        segment_seconds: float = chunked.DEFAULT_SEGMENT_SECONDS,
        overlap_seconds: float = chunked.DEFAULT_OVERLAP_SECONDS,
        compute_dtype=None,
        mesh=None,
        tokenizer=None,
        normalize_text: bool = False,
        sample_rate: int = SAMPLE_RATE,
        wire_dtype="pcm16",
        pretrained: bool = False,
    ):
        """``wire_dtype``: format for the device->host stem transfer, which
        dominates serving latency over this environment's ~30 MB/s tunnel.

        - ``"pcm16"`` (default): int16 samples + one f32 peak scale per stem
          — ~90 dB quantisation SNR (a peak-normalised 16-bit master), half
          the bytes of f32 and zero host-side conversion on the serving path
          (``separate_all_pcm``).
        - ``np.float16``: ~66 dB SNR, 2x fewer bytes.
        - ``np.float32``: exact.
        All sit far above any separation SDR (clamped at 30 dB).

        ``pretrained=True`` marks ``params`` as real converted weights
        (e.g. ``convert.import_atht_checkpoint``): the tokenizer then
        REFUSES the hash fallback (meaningless ids for a pretrained text
        tower) instead of silently degrading."""
        self.sample_rate = sample_rate
        self.segment = int(segment_seconds * sample_rate)
        self.overlap = int(overlap_seconds * sample_rate)
        if compute_dtype is None:
            # bf16 is native on TPU but *emulated* (pathologically slow) on
            # CPU backends — pick per backend.
            compute_dtype = (jnp.float32 if jax.default_backend() == "cpu"
                             else jnp.bfloat16)
        self.compute_dtype = compute_dtype
        self.normalize_text = normalize_text
        self.pretrained = pretrained
        self.mesh = mesh
        self.tokenizer = tokenizer or default_tokenizer(
            require_real=pretrained)
        if mesh is not None:
            params = meshlib.replicate(params, mesh)
            # mesh sharding needs the chunk axis divisible by device count
            self.bucket = meshlib.pad_to_multiple(8, mesh.devices.size)
        else:
            self.bucket = "auto"
        self.params = params
        # On-hardware parity gate for the default-on fused Pallas layer
        # kernel (ops/kernel_gate.py): runs ONCE per process before any
        # production sweep traces; on divergence it vetoes the kernel so
        # this session serves correct (slower) stems instead of corrupt
        # ones.  No-ops on CPU / tiny towers / ATSM_SKIP_PARITY_GATE=1.
        from ..ops import kernel_gate

        kernel_gate.ensure_layer_parity(params,
                                        compute_dtype=self.compute_dtype)
        self.wire_pcm16 = wire_dtype == "pcm16"
        self.wire_dtype = (np.dtype(np.int16) if self.wire_pcm16
                           else np.dtype(wire_dtype))
        self._emb_cache: Dict[str, jnp.ndarray] = {}
        self._sweep_cache: Dict[Tuple, callable] = {}

        @jax.jit
        def _encode_text(params, ids, mask):
            return atht.encode_text(params, ids, mask, self.normalize_text)

        self._encode_text = _encode_text

    # -- text ---------------------------------------------------------------

    def text_embedding(self, prompt: str) -> jnp.ndarray:
        """(512,) CLAP embedding, cached per distinct prompt string."""
        if prompt not in self._emb_cache:
            ids, mask = self.tokenizer([prompt])
            emb = self._encode_text(self.params, jnp.asarray(ids),
                                    jnp.asarray(mask))[0]
            self._emb_cache[prompt] = emb
        return self._emb_cache[prompt]

    # -- fused song sweep -----------------------------------------------------

    def _get_sweep(self, grid: chunked.ChunkGrid, n_stems: int):
        """One jitted XLA program per (grid, #stems): frame -> encode once ->
        n_stems heads -> weighted OLA."""
        key = (grid.n_chunks, grid.segment, grid.hop, n_stems)
        if key in self._sweep_cache:
            return self._sweep_cache[key]

        dtype = self.compute_dtype
        overlap = self.overlap

        def sweep(params, song_padded, stem_embs, length):
            chunks = chunked.frame_song(song_padded, grid, padded=True)
            if self.mesh is not None:
                chunks = jax.lax.with_sharding_constraint(
                    chunks, meshlib.NamedSharding(
                        self.mesh, meshlib.P(meshlib.DATA_AXIS)))
            enc = atht.encode_mixture(params, chunks, dtype)
            # one batched (S*B) head pass (better MXU utilisation than an
            # unrolled per-stem loop; see atht.apply_head_multi)
            stacked = atht.apply_head_multi(params, enc, stem_embs)
            s_, b_, c_, l_ = stacked.shape
            flat = stacked.transpose(1, 0, 2, 3).reshape(b_, s_ * c_, l_)
            valid = (jnp.arange(grid.n_chunks) * grid.hop) < length
            out = chunked.overlap_add_weighted(flat, grid, overlap, valid)
            if self.wire_pcm16:
                # ONE shared scale per song (max over every stem/channel):
                # the PCM then preserves inter-stem AND inter-channel levels,
                # so WAVs written from these bytes keep the mix balance
                # (reference behaviour, `test_inference.py:157-175`)
                shared = jnp.maximum(jnp.max(jnp.abs(out)), 1e-8)
                scale = jnp.full((n_stems,), shared)              # (S,)
                q = jnp.clip(jnp.round(out / shared * 32767.0),
                             -32768, 32767).astype(jnp.int16)
                return q, scale
            return out.astype(jnp.dtype(self.wire_dtype))

        fn = jax.jit(sweep)
        self._sweep_cache[key] = fn
        return fn

    def _get_stream_block_fn(self, block_chunks: int, hop: int,
                             overlap: int, n_stems: int):
        """The streaming block program (``infer.StreamingSeparator``),
        cached HERE so every stream of the same geometry reuses one
        compiled program (a per-instance ``jax.jit`` would re-trace —
        and cold-compile — per request) and so the chunk axis gets the
        same mesh sharding constraint as the offline sweeps."""
        key = ("stream", block_chunks, self.segment, hop, n_stems)
        if key in self._sweep_cache:
            return self._sweep_cache[key]
        span = (block_chunks - 1) * hop + self.segment
        grid = chunked.ChunkGrid(segment=self.segment, hop=hop,
                                 n_chunks=block_chunks, length=span)
        dtype = self.compute_dtype

        def block(params, song, embs):
            chunks = chunked.frame_song(song, grid, padded=True)
            if self.mesh is not None:
                chunks = jax.lax.with_sharding_constraint(
                    chunks, meshlib.NamedSharding(
                        self.mesh, meshlib.P(meshlib.DATA_AXIS)))
            enc = atht.encode_mixture(params, chunks, dtype)
            stacked = atht.apply_head_multi(params, enc, embs)
            s_, b_, c_, l_ = stacked.shape
            flat = stacked.transpose(1, 0, 2, 3).reshape(b_, s_ * c_, l_)
            return chunked.overlap_add_weighted(flat, grid, overlap,
                                                normalize=False)

        fn = jax.jit(block)
        self._sweep_cache[key] = fn
        return fn

    def _run_sweep_raw(self, mixture, embs: jnp.ndarray, n_stems: int):
        """-> device result: (q int16 (S*2,T), scale) for pcm16 wire, else a
        (S*2, T) array.  Host never touches full-size arrays (this host's
        single core moves ~7 M elements/s — any full pass costs seconds)."""
        length = int(np.shape(mixture)[-1])
        grid = chunked.plan_chunks(length, self.segment, self.overlap,
                                   self.bucket)
        dev = jnp.asarray(np.ascontiguousarray(mixture))
        if dev.dtype == jnp.int16:
            # 16-bit PCM input (what WAV sources deliver): convert on device
            dev = dev.astype(jnp.float32) * (1.0 / 32768.0)
        elif dev.dtype != jnp.float32:
            dev = dev.astype(jnp.float32)
        padded = jnp.pad(dev, ((0, 0), (0, grid.padded_length - length)))
        sweep = self._get_sweep(grid, n_stems)
        out = sweep(self.params, padded, embs, jnp.asarray(length, jnp.int32))
        if self.wire_pcm16:
            q, scale = out
            return q[:, :length], scale          # crop on device
        return out[:, :length]

    def _run_sweep(self, mixture: np.ndarray, embs: jnp.ndarray,
                   n_stems: int) -> np.ndarray:
        out = self._run_sweep_raw(mixture, embs, n_stems)
        if self.wire_pcm16:
            q, scale = out
            q = self._fetch_array(q)
            row_scale = np.repeat(np.asarray(scale), 2)[:, None]
            return q.astype(np.float32) * (row_scale / 32767.0)
        return self._fetch_array(out).astype(np.float32)        # (S*2, T)

    @classmethod
    def _fetch_array(cls, src, nsplit: int | None = None) -> np.ndarray:
        """Device -> host fetch over concurrent row-slice streams
        (the tunnel's D2H bandwidth is per-stream limited; see
        ``_submit_fetch`` — ``ATSM_FETCH_STREAMS`` tunes every fetch
        path, this one included)."""
        import concurrent.futures as _cf

        if nsplit is None:
            nsplit = int(os.environ.get("ATSM_FETCH_STREAMS", "4"))
        rows = int(src.shape[0])
        if rows < 2:
            return np.asarray(src)
        out = np.empty(src.shape, np.dtype(src.dtype))
        with _cf.ThreadPoolExecutor(max_workers=nsplit) as ex:
            for f in cls._submit_fetch(ex, out, 0, src, nsplit):
                f.result()
        return out

    @classmethod
    def autotune_fetch_streams(cls, nsplit: int = 4,
                               size_mb: float = 16.0) -> dict:
        """Probe single- vs multi-stream D2H and pick the fetch width.

        In good weather the tunnel is per-stream limited and ``nsplit``
        concurrent row-slice transfers aggregate ~3x one stream; a
        congested tunnel serialises anyway and the extra streams only add
        overhead (measured: 24.9 MB/s aggregate vs 39.8 single on one
        congested session).  When multi-stream shows no gain this sets
        ``ATSM_FETCH_STREAMS=1`` for the process (every fetch path reads
        it per call, so the choice applies immediately).  A user-set env
        always wins.  Returns the measured bandwidths and the choice.
        """
        import time as _time

        import jax.numpy as _jnp

        rows = max(nsplit, 4)
        cols = max(1, int(size_mb * 1e6 / 4 / rows))
        buf = _jnp.ones((rows, cols), _jnp.float32)
        np.asarray(buf[:1, :4])                       # sync materialise
        t0 = _time.perf_counter()
        np.asarray(buf)
        bw1 = buf.nbytes / (_time.perf_counter() - t0) / 1e6
        buf = buf + 1                                 # fresh buffer
        t0 = _time.perf_counter()
        cls._fetch_array(buf, nsplit=nsplit)
        bwn = buf.nbytes / (_time.perf_counter() - t0) / 1e6
        user_set = "ATSM_FETCH_STREAMS" in os.environ
        if not user_set and bwn < 1.15 * bw1:
            os.environ["ATSM_FETCH_STREAMS"] = "1"
        streams = int(os.environ.get("ATSM_FETCH_STREAMS", str(nsplit)))
        return {"single_MBps": round(bw1, 1), "multi_MBps": round(bwn, 1),
                "streams": streams, "user_set": user_set}

    # -- separation ---------------------------------------------------------

    def separate(self, mixture: np.ndarray, prompt: str) -> np.ndarray:
        """(2, T) mixture + free-text prompt -> (2, T) stem.

        Matches the reference protocol: 6 s chunks, linear cross-fade
        overlap-add, weight renormalisation (`benchmark.py:155-204`).
        """
        embs = self.text_embedding(prompt)[None]
        return self._run_sweep(mixture, embs, 1)

    def separate_pcm(self, mixture: np.ndarray, prompt: str) -> np.ndarray:
        """``separate`` delivered as ABSOLUTE-level int16 PCM ``(2, T)``
        (``sample = pcm / 32767``, clipped at ±1 like any int16 WAV write):
        the quantisation runs on device and the bytes can be written into a
        WAV verbatim — zero host-side sample passes (the serving host's
        single core moves ~7 M elements/s; a float round trip costs
        seconds per song)."""
        embs = self.text_embedding(prompt)[None]
        out = self._run_sweep_raw(mixture, embs, 1)
        if self.wire_pcm16:
            q, scale = out
            q = _requant_absolute(q, scale[0])
        else:
            q = _quant_absolute(out)
        return self._fetch_array(q)

    def separate_all(self, mixture: np.ndarray,
                     stems: Sequence[str] = STEM_NAMES
                     ) -> Mapping[str, np.ndarray]:
        """All stems for one mixture; the frozen encoder runs ONCE per chunk
        (the reference re-runs the full model per stem, `benchmark.py:139-153`)."""
        embs = jnp.stack([self.text_embedding(s) for s in stems])
        flat = self._run_sweep(mixture, embs, len(stems))
        out = flat.reshape(len(stems), 2, -1)
        return {stem: out[i] for i, stem in enumerate(stems)}

    def separate_all_pcm(self, mixture: np.ndarray,
                         stems: Sequence[str] = STEM_NAMES,
                         group_chunks: int = 4, absolute: bool = False):
        """All stems as 16-bit PCM: ``(pcm int16 (S, 2, T), scales (S,))``.

        ``absolute=True`` quantises at absolute level (``scale = 1``:
        ``pcm/32767`` decodes to the float stem, clipped at ±1 exactly like
        a float->int16 WAV write) so the bytes match the reference's
        soundfile outputs verbatim; the default shared ``2x peak`` scale
        keeps one bit of inter-stem headroom instead.

        The zero-copy serving path: quantisation happens on device
        (``sample_value = pcm * scale / 32767``); the host only receives PCM
        bytes — what a WAV writer or playback API consumes directly
        (``utils.audio_io.write_wav_pcm``).  Requires ``wire_dtype='pcm16'``
        (the default).

        Group-pipelined: the chunk grid is processed in groups of
        ``group_chunks`` chunks.  Each group runs ONE program — upload ->
        encode -> every stem head -> unnormalised overlap-add with a carry
        from the previous group (the streaming-API recurrence, device-side)
        -> int16 quantisation — and emits the ``group_chunks * hop`` samples
        whose OLA weights are final.  Groups chain through the carry, so the
        device works through them back-to-back while each finished group's
        PCM rides the host link concurrently with later groups' compute and
        uploads: end-to-end time approaches ``max(compute, transfer)``
        instead of their sum (the host link is the serving bottleneck: the
        4-stem payload of a 60 s song is ~42 MB).

        All stems quantise against ONE shared scale known up-front —
        ``2 x peak(|mixture|)`` — so the PCM bytes preserve inter-stem
        loudness (WAVs written verbatim keep the mix balance, reference
        `test_inference.py:157-175`) without serialising the pipeline on a
        cross-stem peak reduction.  The 2x headroom costs one SNR bit
        (~84 dB left) and clips only if a stem peaks above twice the
        mixture's peak (not a thing for a bounded-mask separator; and WAV
        output clips there anyway).
        """
        assert self.wire_pcm16, "separate_all_pcm requires wire_dtype='pcm16'"
        import concurrent.futures as _cf

        n_stems = len(stems)
        song = np.ascontiguousarray(mixture)
        length = int(song.shape[-1])
        if absolute:
            scale = 1.0
            if song.dtype != np.int16:
                song = song.astype(np.float32, copy=False)
        else:
            # Shared scale, host-side (one vectorised pass over the raw
            # samples is cheap; everything per-sample AFTER separation
            # stays on device).
            if song.dtype == np.int16:
                peak = max(int(song.max(initial=0)),
                           -int(song.min(initial=0)))
                peak = peak / 32768.0
            else:
                song = song.astype(np.float32, copy=False)
                peak = max(float(song.max(initial=0.0)),
                           -float(song.min(initial=0.0)))
            scale = max(2.0 * peak, 1e-8)

        grid = chunked.plan_chunks(length, self.segment, self.overlap,
                                   self.bucket)
        schedule = self._group_schedule(grid, group_chunks)
        hop, seg = grid.hop, grid.segment
        total_advance = sum(schedule) * hop

        embs = jnp.stack([self.text_embedding(s) for s in stems])
        scale_arr = jnp.asarray(scale, jnp.float32)
        length_arr = jnp.asarray(length, jnp.int32)
        carry_acc = jnp.zeros((n_stems * 2, seg - hop), jnp.float32)
        carry_w = jnp.zeros((seg - hop,), jnp.float32)

        pcm = np.empty((n_stems * 2, total_advance), np.int16)
        futures = []
        start = 0
        n_streams = int(os.environ.get("ATSM_FETCH_STREAMS", "4"))
        with _cf.ThreadPoolExecutor(max_workers=max(8, 2 * n_streams)) as ex:
            for gi in schedule:
                span = (gi - 1) * hop + seg
                advance = gi * hop
                fn = self._get_group_fn(gi, seg, hop, n_stems)
                take = min(advance, length - start)
                if take <= 0:    # schedule over-covers: nothing left to emit
                    break
                piece = song[:, start : start + span]
                if piece.shape[-1] < span:   # zero-pad the last group(s)
                    piece = np.pad(piece,
                                   ((0, 0), (0, span - piece.shape[-1])))
                q, carry_acc, carry_w = fn(
                    self.params, jnp.asarray(piece), embs, scale_arr,
                    jnp.asarray(start, jnp.int32), length_arr,
                    carry_acc, carry_w)
                # fetch in workers so transfers overlap later groups' compute
                # and uploads — split into row-slice streams: the tunnel's
                # D2H is per-stream limited (~13-21 MB/s single stream vs
                # ~48 MB/s aggregate over 2-4 concurrent streams, measured),
                # so even a lone group's fetch must ride several streams.
                # Crop the last group on device.
                src = q if take == advance else q[:, :take]
                futures += self._submit_fetch(ex, pcm, start, src)
                start += advance
            for f in futures:
                f.result()
        scales = np.full((n_stems,), scale, np.float32)
        return pcm.reshape(n_stems, 2, -1)[:, :, :length], scales

    def _group_schedule(self, grid: chunked.ChunkGrid,
                        group_chunks: int) -> list[int]:
        """Group sizes for the pipelined PCM sweep.

        A half-size first group cuts the pipeline-fill latency (the host
        link idles until the first group's PCM is ready), then full groups.
        The carry shape (overlap samples) is group-size independent, so
        differently-sized group programs chain freely.  On a mesh the group
        is the sharded chunk axis, so it rounds up to the device count.
        """
        g = max(1, min(group_chunks, grid.n_chunks))
        if self.mesh is not None:
            d = self.mesh.devices.size
            g = -(-g // d) * d
        schedule = []
        if self.mesh is None and grid.n_chunks > g and g >= 2:
            schedule.append(g // 2)
        left = grid.n_chunks - sum(schedule)
        schedule += [g] * max(0, -(-left // g))
        return schedule

    @staticmethod
    def _fetch_into(out: np.ndarray, row: int, start: int, src) -> None:
        arr = np.asarray(src)
        out[row : row + arr.shape[0], start : start + arr.shape[-1]] = arr

    @classmethod
    def _submit_fetch(cls, ex, out: np.ndarray, start: int, src,
                      nsplit: int | None = None):
        """Submit ``src (R, T)`` as ``nsplit`` concurrent row-slice
        transfers into ``out[:, start:...]`` (aggregate tunnel bandwidth
        scales with concurrent streams up to ~4; override the default with
        ``ATSM_FETCH_STREAMS`` to re-probe on other links)."""
        if nsplit is None:
            nsplit = int(os.environ.get("ATSM_FETCH_STREAMS", "4"))
        rows = src.shape[0]
        step = max(1, -(-rows // nsplit))
        return [ex.submit(cls._fetch_into, out, r0, start, src[r0:r0 + step])
                for r0 in range(0, rows, step)]

    def _get_group_fn(self, g: int, seg: int, hop: int, n_stems: int):
        """The per-group program of the pipelined PCM path, cached per
        (group size, segment, hop, #stems).

        ``(params, song (2, span) [int16 or f32], embs (S, 512), scale,
        global_start, length, carry_acc (S*2, tail), carry_w (tail,))
        -> (pcm int16 (S*2, g*hop), carry_acc', carry_w')``

        One XLA program per group: framing, the shared frozen encoder over
        the group's chunks, every stem head as one batched (S*g) pass
        (``atht.apply_head_multi``), unnormalised OLA + carry-in,
        normalisation and quantisation of the finalised region, carry-out.
        Chunks whose global start falls past ``length`` carry zero weight,
        so bucket padding never contaminates real samples.
        """
        key = ("group", g, seg, hop, n_stems)
        if key in self._sweep_cache:
            return self._sweep_cache[key]
        dtype = self.compute_dtype
        overlap = self.overlap
        mesh = self.mesh
        grid = chunked.ChunkGrid(segment=seg, hop=hop, n_chunks=g,
                                 length=(g - 1) * hop + seg)
        advance = g * hop

        def group_fn(params, song, embs, scale, global_start, length,
                     carry_acc, carry_w):
            if song.dtype == jnp.int16:
                song = song.astype(jnp.float32) * (1.0 / 32768.0)
            chunks = chunked.frame_song(song, grid, padded=True)
            if mesh is not None:
                chunks = jax.lax.with_sharding_constraint(
                    chunks, meshlib.NamedSharding(
                        mesh, meshlib.P(meshlib.DATA_AXIS)))
            enc = atht.encode_mixture(params, chunks, dtype)
            stacked = atht.apply_head_multi(params, enc, embs)  # (S, g, 2, seg)
            s_, b_, c_, l_ = stacked.shape
            flat = stacked.transpose(1, 0, 2, 3).reshape(b_, s_ * c_, l_)
            valid = (global_start + jnp.arange(g) * hop) < length
            acc, wsum = chunked.overlap_add_weighted(flat, grid, overlap,
                                                     valid, normalize=False)
            acc = acc.at[:, : carry_acc.shape[-1]].add(carry_acc)
            wsum = wsum.at[: carry_w.shape[-1]].add(carry_w)
            emit = acc[:, :advance] / jnp.maximum(wsum[:advance], 1e-8)
            q = jnp.clip(jnp.round(emit / scale * 32767.0),
                         -32768, 32767).astype(jnp.int16)
            return q, acc[:, advance:], wsum[advance:]

        fn = jax.jit(group_fn)
        self._sweep_cache[key] = fn
        return fn

    def sweep_flops(self, length: int, n_stems: int = len(STEM_NAMES),
                    group_chunks: int = 4,
                    song_dtype=np.int16) -> float:
        """XLA cost-analysis FLOPs of the full ``separate_all_pcm`` schedule
        for an ``length``-sample song (sum over the group programs actually
        dispatched).  Used by ``bench.py``/profilers for MFU reporting."""
        grid = chunked.plan_chunks(length, self.segment, self.overlap,
                                   self.bucket)
        schedule = self._group_schedule(grid, group_chunks)
        hop, seg = grid.hop, grid.segment

        total, start = 0.0, 0
        for gi in schedule:
            if length - start <= 0:
                break
            span = (gi - 1) * hop + seg
            fn = self._get_group_fn(gi, seg, hop, n_stems)
            s = jax.ShapeDtypeStruct
            args = (jax.tree.map(
                        lambda a: s(np.shape(a), a.dtype), self.params),
                    s((2, span), np.dtype(song_dtype)),
                    s((n_stems, 512), np.float32),
                    s((), np.float32), s((), np.int32), s((), np.int32),
                    s((n_stems * 2, seg - hop), np.float32),
                    s((seg - hop,), np.float32))
            analysis = fn.lower(*args).compile().cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            total += float(analysis.get("flops", 0.0)) if analysis else 0.0
            start += gi * hop
        return total
