"""Live end-to-end tests of the stdlib HTTP serving UI (apps/serve_http.py).

The reference demo (`app.py:205-393`) is a gradio Blocks app; gradio is not
installable offline, so the framework ships a dependency-free fallback with
the same workflow.  These tests exercise a REAL server: bind an ephemeral
port, run it on a thread, and drive the full request cycle over TCP —
health, WAV-in/WAV-out separation, the JSON mode the page consumes
(stem + both spectrogram PNGs), and error paths.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import urllib.error
import urllib.parse
import urllib.request

import jax
import numpy as np
import pytest

from audio_to_sheet_music_tpu.apps import serve_http
from audio_to_sheet_music_tpu.infer import Separator
from audio_to_sheet_music_tpu.models import atht

SR = 44100


def _make_wav_bytes(t: int = SR, channels: int = 2, sr: int = SR,
                    dtype=np.float32) -> bytes:
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal((channels, t))).astype(np.float32)
    if dtype == np.int16:
        wav = (wav * 32767).astype(np.int16)
    return serve_http.encode_wav_bytes(wav, sr) if dtype == np.float32 else (
        _pcm_wav_bytes(wav, sr))


def _pcm_wav_bytes(pcm: np.ndarray, sr: int) -> bytes:
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sr, pcm.T)
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    params = atht.init_tiny(jax.random.PRNGKey(0))
    sep = Separator(params, segment_seconds=0.25, overlap_seconds=0.05)
    service = serve_http.SeparationService(sep, pretrained=False)
    httpd = serve_http.make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()
    httpd.server_close()
    thread.join(timeout=5)


class TestHttpServer:
    def test_health(self, server):
        url, service = server
        with urllib.request.urlopen(f"{url}/api/health", timeout=30) as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"
        assert body["pretrained"] is False
        assert body["segment_seconds"] == pytest.approx(0.25)

    def test_index_page(self, server):
        url, _ = server
        with urllib.request.urlopen(f"{url}/", timeout=30) as r:
            page = r.read().decode()
        assert "Separate" in page and "/api/separate" in page

    def test_separate_wav_roundtrip(self, server):
        url, service = server
        before = service.requests_served
        wav_bytes = _make_wav_bytes(t=SR // 2)
        req = urllib.request.Request(
            f"{url}/api/separate?prompt=vocals", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            out = r.read()
        from scipy.io import wavfile

        sr, stem = wavfile.read(io.BytesIO(out))
        assert sr == SR
        assert stem.dtype == np.int16
        assert stem.shape == (SR // 2, 2)     # same length, stereo
        assert service.requests_served == before + 1

    def test_separate_json_mode_carries_spectrograms(self, server):
        url, _ = server
        wav_bytes = _make_wav_bytes(t=SR // 4)
        req = urllib.request.Request(
            f"{url}/api/separate?prompt=drums&format=json", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "application/json"
            out = json.loads(r.read())
        assert "drums" in out["status"]
        stem = base64.b64decode(out["stem_wav_b64"])
        assert stem[:4] == b"RIFF"
        for key in ("spec_in_png_b64", "spec_out_png_b64"):
            png = base64.b64decode(out[key])
            assert png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_mono_low_rate_upload_is_normalised(self, server):
        """Mono 22.05 kHz int16 upload -> stereo 44.1 kHz stem (the
        resample/to_stereo path of the gradio `_load_input`)."""
        url, _ = server
        rng = np.random.default_rng(1)
        pcm = (3000 * rng.standard_normal((1, 11025))).astype(np.int16)
        req = urllib.request.Request(
            f"{url}/api/separate", data=_pcm_wav_bytes(pcm, SR // 2),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = r.read()
        from scipy.io import wavfile

        sr, stem = wavfile.read(io.BytesIO(out))
        assert sr == SR and stem.shape == (22050, 2)

    def test_streaming_endpoint_matches_offline(self, server):
        """`/api/separate/stream` delivers the same stem as `/api/separate`
        (streaming == offline is the StreamingSeparator contract), with an
        exact Content-Length and a progressively written body."""
        url, _ = server
        wav_bytes = _make_wav_bytes(t=SR // 2)
        off_req = urllib.request.Request(
            f"{url}/api/separate?prompt=vocals", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(off_req, timeout=120) as r:
            offline = r.read()
        st_req = urllib.request.Request(
            f"{url}/api/separate/stream?prompt=vocals", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(st_req, timeout=120) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            promised = int(r.headers["Content-Length"])
            first = r.read(4096)          # header+first piece arrive early
            rest = r.read()
        streamed = first + rest
        assert len(streamed) == promised == 44 + 4 * (SR // 2)
        from scipy.io import wavfile

        sr_o, stem_o = wavfile.read(io.BytesIO(offline))
        sr_s, stem_s = wavfile.read(io.BytesIO(streamed))
        assert sr_s == sr_o and stem_s.shape == stem_o.shape
        # both paths quantise the same float stem; allow 1 LSB of
        # round-trip slack
        np.testing.assert_allclose(stem_s.astype(np.int32),
                                   stem_o.astype(np.int32), atol=1)

    def test_streaming_block_param(self, server):
        """`?block=N` tunes chunks-per-step without changing the output
        (offline-equality holds for every block size; the knob is the
        latency/dispatch trade measured in scripts/stream_latency.py)."""
        url, _ = server
        wav_bytes = _make_wav_bytes(t=SR // 2)
        outs = []
        for block in ("1", "3", "not-a-number"):   # bad value -> default 8
            req = urllib.request.Request(
                f"{url}/api/separate/stream?prompt=vocals&block={block}",
                data=wav_bytes, headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(req, timeout=120) as r:
                body = r.read()
            assert len(body) == 44 + 4 * (SR // 2)
            outs.append(np.frombuffer(body[44:], np.int16))
        np.testing.assert_allclose(outs[0].astype(np.int32),
                                   outs[1].astype(np.int32), atol=1)
        np.testing.assert_allclose(outs[0].astype(np.int32),
                                   outs[2].astype(np.int32), atol=1)

    def test_metrics_endpoint(self, server):
        """/api/metrics: Prometheus text + JSON snapshot reflect served
        requests, audio seconds, and device-lock occupancy (the signals a
        production deployment scrapes to decide when to scale)."""
        url, service = server
        wav_bytes = _make_wav_bytes(t=SR // 4)
        req = urllib.request.Request(
            f"{url}/api/separate?prompt=vocals", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=120) as r:
            n_bytes = len(r.read())

        with urllib.request.urlopen(f"{url}/api/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE atsm_requests_total counter" in text
        assert 'atsm_requests_total{endpoint="separate"}' in text
        assert "atsm_device_busy_seconds_total" in text

        with urllib.request.urlopen(f"{url}/api/metrics?format=json",
                                    timeout=30) as r:
            snap = json.loads(r.read())
        ep = snap["endpoints"]["separate"]
        assert ep["requests"] >= 1
        assert ep["audio_seconds"] >= 0.25 - 1e-6   # this test's request
        assert ep["bytes"] >= n_bytes
        assert ep["seconds"] > 0
        assert snap["device_busy_seconds"] > 0
        assert snap["uptime_seconds"] > 0
        # counters are monotonic and the text view agrees with JSON
        line = next(ln for ln in text.splitlines()
                    if ln.startswith('atsm_requests_total{endpoint="separate"}'))
        assert int(line.rsplit(" ", 1)[1]) <= ep["requests"]

    def test_separate_all_zip(self, server):
        """`/api/separate_all` returns the CLI's file layout (one
        extracted_<stem>.wav per stem) via the pipelined PCM path."""
        import zipfile

        url, _ = server
        wav_bytes = _make_wav_bytes(t=SR // 4)
        req = urllib.request.Request(
            f"{url}/api/separate_all?stems=vocals,drums", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=180) as r:
            assert r.headers["Content-Type"] == "application/zip"
            payload = r.read()
        from scipy.io import wavfile

        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            assert sorted(zf.namelist()) == ["extracted_drums.wav",
                                             "extracted_vocals.wav",
                                             "scales.json"]
            for name in zf.namelist():
                if name == "scales.json":
                    scales = json.loads(zf.read(name))
                    assert set(scales) == {"extracted_drums.wav",
                                           "extracted_vocals.wav"}
                    assert all(s > 0 for s in scales.values())
                    continue
                sr, stem = wavfile.read(io.BytesIO(zf.read(name)))
                assert sr == SR and stem.dtype == np.int16
                assert stem.shape == (SR // 4, 2)

    def test_separate_all_zip_sanitises_entry_names(self, server):
        """Free-text prompts must not become traversal-capable zip entry
        names."""
        import zipfile

        url, _ = server
        req = urllib.request.Request(
            f"{url}/api/separate_all?stems=" +
            urllib.parse.quote("../../evil,a/b\\c"),
            data=_make_wav_bytes(t=SR // 4))
        with urllib.request.urlopen(req, timeout=180) as r:
            payload = r.read()
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for name in zf.namelist():
                assert ".." not in name and "/" not in name and "\\" not in name

    def test_oversize_upload_is_413(self, server, monkeypatch):
        url, _ = server
        monkeypatch.setenv("ATSM_MAX_UPLOAD_MB", "1")
        body = b"\x00" * (2 * 1024 * 1024)
        req = urllib.request.Request(f"{url}/api/separate", data=body)
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 413

    def test_separate_all_no_stems_is_400(self, server):
        url, _ = server
        req = urllib.request.Request(
            f"{url}/api/separate_all?stems=%20", data=_make_wav_bytes(t=SR // 4))
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_streaming_endpoint_bad_wav_is_400(self, server):
        url, _ = server
        req = urllib.request.Request(f"{url}/api/separate/stream",
                                     data=b"definitely not wav")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_empty_body_is_400(self, server):
        url, _ = server
        req = urllib.request.Request(f"{url}/api/separate", data=b"")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_garbage_body_is_400(self, server):
        url, _ = server
        req = urllib.request.Request(f"{url}/api/separate",
                                     data=b"not a wav file at all")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_concurrent_requests_serialise_cleanly(self, server):
        """Four simultaneous requests (two plain, one JSON-with-PNGs, one
        streaming) against the single-flight device lock: all succeed, no
        deadlock, counter consistent."""
        import concurrent.futures as cf

        url, service = server
        before = service.requests_served
        wav_bytes = _make_wav_bytes(t=SR // 4)

        def plain():
            req = urllib.request.Request(f"{url}/api/separate?prompt=bass",
                                         data=wav_bytes)
            with urllib.request.urlopen(req, timeout=180) as r:
                return len(r.read())

        def jsonmode():
            req = urllib.request.Request(
                f"{url}/api/separate?prompt=drums&format=json",
                data=wav_bytes)
            with urllib.request.urlopen(req, timeout=180) as r:
                return len(json.loads(r.read())["stem_wav_b64"])

        def stream():
            req = urllib.request.Request(
                f"{url}/api/separate/stream?prompt=vocals", data=wav_bytes)
            with urllib.request.urlopen(req, timeout=180) as r:
                return len(r.read())

        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(f) for f in (plain, plain, jsonmode, stream)]
            sizes = [f.result() for f in futs]
        assert all(s > 0 for s in sizes)
        assert service.requests_served == before + 4

    def test_unknown_path_is_404(self, server):
        url, _ = server
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{url}/api/nope", timeout=30)
        assert exc.value.code == 404


class TestCodecs:
    def test_decode_wav_bytes_int16_and_float(self):
        rng = np.random.default_rng(2)
        wav = (0.25 * rng.standard_normal((2, 4410))).astype(np.float32)
        out_f = serve_http.decode_wav_bytes(serve_http.encode_wav_bytes(wav))
        # encode quantises to int16; decode divides by 32767
        np.testing.assert_allclose(out_f, wav, atol=2.0 / 32767)

    def test_decode_resamples_and_stereoises(self):
        rng = np.random.default_rng(3)
        mono = (1000 * rng.standard_normal((1, 11025))).astype(np.int16)
        out = serve_http.decode_wav_bytes(_pcm_wav_bytes(mono, 22050))
        assert out.shape == (2, 22050)
        np.testing.assert_allclose(out[0], out[1])


class TestStreamBlockAuto:
    """Auto-tuned streaming block size (round-4 verdict #8): the default
    comes from a warmup-measured dispatch model; ``?block=N`` overrides."""

    def test_policy_latency_budget_picks_largest_under_budget(self):
        # floor 65 ms + 150 ms/chunk, hop 4.5 s: largest b with
        # 0.065 + 0.15b <= 1.5 is 9, and 9*4.5/1.415 = 28.6x >= 8x.
        assert serve_http.pick_stream_block(0.065, 0.15, 4.5) == 9

    def test_policy_compute_bound_stays_small(self):
        # per-chunk dominates (throughput is flat in b): no reason to
        # grow the block past the latency budget.
        assert serve_http.pick_stream_block(0.0, 2.0, 4.5) == 1

    def test_policy_throughput_floor_escalates_past_budget(self):
        # enormous dispatch floor, tiny hop: the largest block inside the
        # 1.5 s budget cannot keep 8x realtime, so latency yields and the
        # block grows as long as throughput keeps improving.
        b = serve_http.pick_stream_block(1.4, 0.01, 0.1)
        assert b > 10          # escalated beyond the budget choice
        assert b <= 64

    def test_policy_respects_max_block(self):
        assert serve_http.pick_stream_block(0.0, 1e-6, 4.5,
                                            max_block=16) == 16

    def test_static_default_without_autotune(self, server):
        _, service = server
        svc = serve_http.SeparationService(service.separator,
                                           pretrained=False)
        assert svc.stream_block_default() == svc.STATIC_STREAM_BLOCK

    def test_autotune_measures_and_fixes_default(self, server):
        _, service = server
        tune = service.autotune_stream_block(candidates=(1, 2))
        assert set(tune) >= {"block", "floor_s", "per_chunk_s",
                             "first_audio_s", "measured_s"}
        assert tune["block"] >= 1 and tune["per_chunk_s"] > 0
        assert len(tune["measured_s"]) == 2
        assert service.stream_block_default() == tune["block"]
        # health surfaces the measured choice
        assert service.health()["stream_block"] == tune["block"]
        service._stream_auto = None     # restore for other module tests

    def test_autotune_warms_the_chosen_block(self, server, monkeypatch):
        # The chosen block may differ from both measured candidates; the
        # autotune must pre-compile IT too, or the first streaming client
        # pays the full sweep compile (~100 s cold on the TPU tunnel).
        _, service = server
        from audio_to_sheet_music_tpu.infer import streaming as streaming_mod

        built = []
        orig_cls = streaming_mod.StreamingSeparator

        class Spy(orig_cls):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                built.append(self.block_chunks)

        monkeypatch.setattr(streaming_mod, "StreamingSeparator", Spy)
        monkeypatch.setattr(serve_http, "pick_stream_block",
                            lambda *a, **kw: 5)
        try:
            tune = service.autotune_stream_block(candidates=(1, 2))
            assert tune["block"] == 5
            assert 5 in built, "chosen block was not pre-compiled"
        finally:
            service._stream_auto = None

    def test_block_auto_resolves_via_service_default(self, server):
        url, service = server
        calls = []
        orig = service.stream_block_default

        def spy():
            calls.append(1)
            return orig()

        service.stream_block_default = spy
        try:
            wav_bytes = _make_wav_bytes(t=SR // 4)
            # no block param -> auto -> service default consulted
            req = urllib.request.Request(
                f"{url}/api/separate/stream?prompt=vocals",
                data=wav_bytes, headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(req, timeout=120) as r:
                assert len(r.read()) == 44 + 4 * (SR // 4)
            assert calls, "auto default was not consulted"
            # explicit block -> override, default NOT consulted
            calls.clear()
            req = urllib.request.Request(
                f"{url}/api/separate/stream?prompt=vocals&block=2",
                data=wav_bytes, headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(req, timeout=120) as r:
                assert len(r.read()) == 44 + 4 * (SR // 4)
            assert not calls
        finally:
            service.stream_block_default = orig
