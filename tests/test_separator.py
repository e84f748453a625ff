"""End-to-end Separator tests: fused multi-stem path == per-stem path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.infer import Separator
from audio_to_sheet_music_tpu.models import atht


@pytest.fixture(scope="module")
def separator():
    params = atht.init_tiny(jax.random.PRNGKey(0))
    return Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                     compute_dtype=jnp.float32, wire_dtype=np.float32)


class TestSeparator:
    def test_separate_shapes_and_cache(self, separator):
        rng = np.random.default_rng(0)
        song = rng.standard_normal((2, 22050)).astype(np.float32) * 0.1
        out = separator.separate(song, "vocals")
        assert out.shape == song.shape
        assert np.isfinite(out).all()
        assert "vocals" in separator._emb_cache

    def test_fused_multi_stem_matches_per_stem(self, separator):
        """separate_all (1 encoder pass) == separate x4 (4 encoder passes)."""
        rng = np.random.default_rng(1)
        song = rng.standard_normal((2, 22050)).astype(np.float32) * 0.1
        fused = separator.separate_all(song, stems=("drums", "vocals"))
        for stem in ("drums", "vocals"):
            single = separator.separate(song, stem)
            np.testing.assert_allclose(fused[stem], single, atol=1e-4)

    def test_distinct_prompts_give_distinct_stems(self, separator):
        rng = np.random.default_rng(2)
        song = rng.standard_normal((2, 22050)).astype(np.float32) * 0.1
        outs = separator.separate_all(song, stems=("drums", "bass"))
        assert np.abs(outs["drums"] - outs["bass"]).max() > 1e-6


class TestWireFormats:
    def test_pcm16_wire_matches_f32(self):
        params = atht.init_tiny(jax.random.PRNGKey(1))
        kw = dict(segment_seconds=0.25, overlap_seconds=0.05,
                  compute_dtype=jnp.float32)
        exact = Separator(params, wire_dtype=np.float32, **kw)
        pcm = Separator(params, wire_dtype="pcm16", **kw)
        rng = np.random.default_rng(5)
        song = (0.1 * rng.standard_normal((2, 22050))).astype(np.float32)
        a = exact.separate(song, "drums")
        b = pcm.separate(song, "drums")
        peak = np.abs(a).max()
        # 16-bit quantisation: error bounded by peak / 32767
        np.testing.assert_allclose(b, a, atol=1.5 * peak / 32767)

    def test_pcm16_pipeline(self):
        params = atht.init_tiny(jax.random.PRNGKey(2))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        rng = np.random.default_rng(6)
        song = (0.1 * rng.standard_normal((2, 22050))).astype(np.float32)
        pcm, scales = sep.separate_all_pcm(song, stems=("drums", "vocals"))
        assert pcm.dtype == np.int16 and pcm.shape == (2, 2, 22050)
        assert scales.shape == (2,)
        dq = pcm.astype(np.float32) * (scales[:, None, None] / 32767.0)
        ref = sep.separate_all(song, stems=("drums", "vocals"))
        # pipelined-PCM and fused-float are different XLA programs; they
        # agree to the quantisation resolution of the shared scale
        atol = 1.5 * scales.max() / 32767
        np.testing.assert_allclose(dq[0], ref["drums"], atol=atol)
        np.testing.assert_allclose(dq[1], ref["vocals"], atol=atol)

    def test_int16_input_matches_f32(self):
        params = atht.init_tiny(jax.random.PRNGKey(3))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32, wire_dtype=np.float32)
        rng = np.random.default_rng(7)
        f32 = (0.1 * rng.standard_normal((2, 22050))).astype(np.float32)
        i16 = np.clip(f32 * 32768, -32768, 32767).astype(np.int16)
        a = sep.separate(i16.astype(np.float32) / 32768.0, "bass")
        b = sep.separate(i16, "bass")
        np.testing.assert_allclose(b, a, atol=1e-5)

    def test_static_plan_matches_encode(self):
        params = atht.init_tiny(jax.random.PRNGKey(4))
        for t in (11025, 12000, 22050):
            wav = jnp.zeros((1, 2, t), jnp.float32)
            enc = atht.encode_mixture(params, wav)
            plan = atht.static_plan(t)
            assert plan["lengths"] == enc["lengths"], t
            assert plan["lengths_t"] == enc["lengths_t"], t
            assert plan["original_length"] == enc["original_length"]

    def test_pipelined_pcm_matches_fused(self):
        params = atht.init_tiny(jax.random.PRNGKey(5))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        rng = np.random.default_rng(8)
        song = (0.1 * rng.standard_normal((2, 22050))).astype(np.float32)
        pcm, scales = sep.separate_all_pcm(song, stems=("drums", "vocals"))
        dq = pcm.astype(np.float32) * (scales[:, None, None] / 32767.0)
        ref = sep.separate_all(song, stems=("drums", "vocals"))
        atol = 1.5 * scales.max() / 32767
        np.testing.assert_allclose(dq[0], ref["drums"], atol=atol)
        np.testing.assert_allclose(dq[1], ref["vocals"], atol=atol)

    def test_pipelined_pcm_mixed_group_schedule(self):
        """A song long enough for the half-size-first-group schedule
        ([g//2, g, ...]): the carry must chain across group-size seams and
        the over-covering last group must crop (schedule covers more chunks
        than the grid needs)."""
        params = atht.init_tiny(jax.random.PRNGKey(5))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        rng = np.random.default_rng(9)
        song = (0.1 * rng.standard_normal((2, 60000))).astype(np.float32)
        # hop=8820 -> n_chunks=ceil(60000/8820)=7 -> bucket 2 -> 8 > g=4,
        # so schedule = [2, 4, 4] (10 chunks >= 8: over-coverage crops)
        pcm, scales = sep.separate_all_pcm(song, stems=("drums", "vocals"))
        assert pcm.shape == (2, 2, 60000)
        dq = pcm.astype(np.float32) * (scales[:, None, None] / 32767.0)
        ref = sep.separate_all(song, stems=("drums", "vocals"))
        atol = 1.5 * scales.max() / 32767
        np.testing.assert_allclose(dq[0], ref["drums"], atol=atol)
        np.testing.assert_allclose(dq[1], ref["vocals"], atol=atol)


class TestServingContracts:
    def test_pcm_wavs_preserve_inter_stem_levels(self, tmp_path):
        """WAVs written straight from separate_all_pcm bytes must reproduce
        separate_all's RELATIVE stem energies (reference behaviour,
        `test_inference.py:157-175`): all stems share one song scale."""
        from audio_to_sheet_music_tpu.utils import audio_io

        params = atht.init_tiny(jax.random.PRNGKey(7))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        rng = np.random.default_rng(10)
        song = (0.1 * rng.standard_normal((2, 22050))).astype(np.float32)
        stems = ("drums", "vocals")
        pcm, scales = sep.separate_all_pcm(song, stems=stems)
        assert np.allclose(scales, scales[0])       # one shared song scale

        ref = sep.separate_all(song, stems=stems)
        read = {}
        for i, s in enumerate(stems):
            path = tmp_path / f"{s}.wav"
            audio_io.write_wav_pcm(path, pcm[i], float(scales[i]))
            _, wav = audio_io.read_wav(path)
            read[s] = wav
        # energy RATIO between stems survives the PCM wire + WAV roundtrip
        def ratio(d):
            e = {s: float(np.sqrt((d[s] ** 2).mean())) for s in stems}
            return e["drums"] / max(e["vocals"], 1e-12)
        assert ratio(read) == pytest.approx(ratio(ref), rel=2e-3)

    def test_pretrained_refuses_hash_tokenizer(self, monkeypatch):
        monkeypatch.delenv("ATSM_TOKENIZER_DIR", raising=False)
        params = atht.init_tiny(jax.random.PRNGKey(8))
        with pytest.raises(RuntimeError, match="ATSM_TOKENIZER_DIR"):
            Separator(params, pretrained=True)
        Separator(params)  # random-init path keeps the silent fallback


class TestProtocolParity:
    def test_fused_sweep_matches_naive_host_loop(self):
        """The device sweep == an independent host-side implementation of the
        reference protocol (chunk loop, linear fades, weight renorm —
        `benchmark.py:155-204`), run with the same model."""
        params = atht.init_tiny(jax.random.PRNGKey(6))
        segment, overlap = 11025, 2205
        sep = Separator(params, segment_seconds=segment / 44100,
                        overlap_seconds=overlap / 44100,
                        compute_dtype=jnp.float32, wire_dtype=np.float32)
        rng = np.random.default_rng(9)
        song = (0.1 * rng.standard_normal((2, 30000))).astype(np.float32)
        emb = np.asarray(sep.text_embedding("vocals"))

        # naive host loop (independent of infer/chunked.py)
        hop = segment - overlap
        w = np.ones(segment, np.float32)
        ramp = np.linspace(0, 1, overlap, dtype=np.float32)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
        t = song.shape[-1]
        acc = np.zeros((2, t + segment), np.float32)
        wsum = np.zeros(t + segment, np.float32)
        fwd = jax.jit(lambda p, c, e: atht.forward_with_text_emb(p, c, e))
        start = 0
        while start < t:
            chunk = song[:, start : start + segment]
            if chunk.shape[-1] < segment:
                chunk = np.pad(chunk, ((0, 0), (0, segment - chunk.shape[-1])))
            out = np.asarray(fwd(params, jnp.asarray(chunk)[None],
                                 jnp.asarray(emb)[None]))[0]
            acc[:, start : start + segment] += out * w
            wsum[start : start + segment] += w
            start += hop
        naive = (acc / np.maximum(wsum, 1e-8))[:, :t]

        ours = sep.separate(song, "vocals")
        np.testing.assert_allclose(ours[:, 1:-1], naive[:, 1:-1], atol=2e-4)


class TestSweepFlops:
    """`Separator.sweep_flops` feeds the MFU numbers bench.py and the
    profilers report (VERDICT r2 #1) — pin its basic contract."""

    def test_positive_and_monotonic_in_length(self):
        params = atht.init_tiny(jax.random.PRNGKey(3))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        short = sep.sweep_flops(22050)
        long = sep.sweep_flops(44100)
        assert short > 0
        # twice the song -> strictly more dispatched FLOPs
        assert long > short

    def test_scales_with_stem_count(self):
        params = atht.init_tiny(jax.random.PRNGKey(3))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        fl2 = sep.sweep_flops(22050, n_stems=2)
        fl4 = sep.sweep_flops(22050, n_stems=4)
        # 4 stems reuse the shared encoder, so < 2x but > 1x the head work
        assert fl2 < fl4 < 2.0 * fl2


class TestSeparatePcm:
    """`separate_pcm` (absolute-level device-side int16, the HTTP wav-mode
    hot path) must agree with `separate` up to int16 quantisation."""

    def test_matches_float_separate(self):
        params = atht.init_tiny(jax.random.PRNGKey(4))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        rng = np.random.default_rng(9)
        song = (0.1 * rng.standard_normal((2, 22050))).astype(np.float32)
        ref = np.clip(sep.separate(song, "vocals"), -1.0, 1.0)
        pcm = sep.separate_pcm(song, "vocals")
        assert pcm.dtype == np.int16 and pcm.shape == ref.shape
        # shared-scale wire + device requant: two roundings, <= 2 LSB
        np.testing.assert_allclose(pcm.astype(np.float32) / 32767.0, ref,
                                   atol=2.5 / 32767)

    def test_int16_input_fast_path(self):
        params = atht.init_tiny(jax.random.PRNGKey(4))
        sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                        compute_dtype=jnp.float32)
        rng = np.random.default_rng(10)
        song_f = (0.1 * rng.standard_normal((2, 22050))).astype(np.float32)
        song_i = (song_f * 32768.0).astype(np.int16)
        a = sep.separate_pcm(song_i, "drums")
        b = sep.separate_pcm(song_i.astype(np.float32) / 32768.0, "drums")
        np.testing.assert_array_equal(a, b)


class TestAutotuneFetchStreams:
    def test_user_env_wins(self, monkeypatch):
        monkeypatch.setenv("ATSM_FETCH_STREAMS", "2")
        tune = Separator.autotune_fetch_streams(size_mb=0.01)
        assert tune["user_set"] is True
        assert tune["streams"] == 2
        import os
        assert os.environ["ATSM_FETCH_STREAMS"] == "2"

    def test_congested_link_drops_to_one_stream(self, monkeypatch):
        import os
        import time as _t

        monkeypatch.delenv("ATSM_FETCH_STREAMS", raising=False)
        real = Separator._fetch_array.__func__

        def slow_fetch(cls, src, nsplit=None):
            _t.sleep(0.05)                 # multi-stream shows no gain
            return real(cls, src, nsplit)

        monkeypatch.setattr(Separator, "_fetch_array",
                            classmethod(slow_fetch))
        tune = Separator.autotune_fetch_streams(size_mb=0.01)
        assert tune["streams"] == 1
        assert os.environ.get("ATSM_FETCH_STREAMS") == "1"
        assert tune["multi_MBps"] < tune["single_MBps"]

    def test_returns_measurements(self, monkeypatch):
        monkeypatch.delenv("ATSM_FETCH_STREAMS", raising=False)
        tune = Separator.autotune_fetch_streams(size_mb=0.01)
        assert set(tune) == {"single_MBps", "multi_MBps", "streams",
                             "user_set"}
        assert tune["single_MBps"] > 0 and tune["multi_MBps"] > 0
