"""End-to-end CLI tests (tiny model via ATSM_TINY_MODEL=1).

The benchmark CLI is exercised on the real TPU (results/synthetic artifact);
its harness internals are covered in test_eval_apps."""

import json
import sys

import numpy as np
import pytest

from audio_to_sheet_music_tpu.data import synthetic_tracks


@pytest.fixture(autouse=True)
def tiny_model_env(monkeypatch):
    monkeypatch.setenv("ATSM_TINY_MODEL", "1")


@pytest.fixture(scope="module")
def track(tmp_path_factory):
    return synthetic_tracks(1, seconds=1.0,
                            cache_dir=tmp_path_factory.mktemp("cli_synth"))[0]


class TestSeparateCLI:
    def test_separate_with_ground_truth(self, track, tmp_path, monkeypatch):
        from audio_to_sheet_music_tpu.apps import separate

        out = tmp_path / "out"
        monkeypatch.setattr(sys, "argv", [
            "separate", "--track", str(track.path),
            "--stems", "drums", "vocals", "piano",
            "--output-dir", str(out),
            "--segment-seconds", "0.25", "--overlap-seconds", "0.05"])
        separate.main()
        assert (out / "mixture.wav").exists()
        for stem in ("drums", "vocals", "piano"):   # incl. zero-shot
            assert (out / f"extracted_{stem}.wav").stat().st_size > 1000
        report = json.loads((out / "sdr_report.json").read_text())
        assert "drums" in report and "piano" not in report  # no GT for piano

    def test_separate_wav_pcm_fast_path(self, track, tmp_path, monkeypatch):
        from audio_to_sheet_music_tpu.apps import separate
        from audio_to_sheet_music_tpu.utils import audio_io

        wav_path = tmp_path / "mix.wav"
        arr = track.load(mmap=False)
        audio_io.write_wav(wav_path, arr[0])
        out = tmp_path / "out2"
        monkeypatch.setattr(sys, "argv", [
            "separate", "--track", str(wav_path), "--stems", "vocals",
            "--output-dir", str(out),
            "--segment-seconds", "0.25", "--overlap-seconds", "0.05"])
        separate.main()
        sr, back = audio_io.read_wav(out / "extracted_vocals.wav")
        assert sr == 44100 and back.shape[0] == 2
        assert np.isfinite(back).all()


class TestConsoleEntryPoints:
    """The pyproject console scripts resolve to cli.py and run end-to-end
    (the repo-root main.py/benchmark.py are thin delegates to these)."""

    def test_benchmark_main_synthetic(self, tmp_path, monkeypatch):
        from audio_to_sheet_music_tpu.cli import benchmark_main

        monkeypatch.setattr(sys, "argv", [
            "atsm-benchmark", "--synthetic", "--synthetic-tracks", "1",
            "--models", "ours", "--output-dir", str(tmp_path)])
        benchmark_main()
        out = json.loads((tmp_path / "evaluation_results.json").read_text())
        model = out["AudioTextHTDemucs (Ours)"]
        assert len(model["per_track"]) == 1
        assert set(model["aggregate"]["sdr"]) >= {"drums", "bass", "other",
                                                  "vocals", "average"}

    def test_benchmark_main_ours_random_row(self, tmp_path, monkeypatch):
        """The 'ours-random' ablation row evaluates alongside 'ours' (the
        trained-vs-random learning evidence in the committed artifact)."""
        from audio_to_sheet_music_tpu.cli import benchmark_main

        monkeypatch.setattr(sys, "argv", [
            "atsm-benchmark", "--synthetic", "--synthetic-tracks", "1",
            "--models", "ours", "ours-random", "--output-dir", str(tmp_path)])
        benchmark_main()
        out = json.loads((tmp_path / "evaluation_results.json").read_text())
        assert "AudioTextHTDemucs (Ours)" in out
        assert "AudioTextHTDemucs (Ours, random head)" in out
        rnd = out["AudioTextHTDemucs (Ours, random head)"]
        assert len(rnd["per_track"]) == 1

    def test_root_delegates_point_at_cli(self):
        import importlib.util as iu
        from pathlib import Path

        root = Path(__file__).resolve().parent.parent
        for fname, target in [("main.py", "train_main"),
                              ("benchmark.py", "benchmark_main")]:
            spec = iu.spec_from_file_location(fname[:-3] + "_root",
                                              root / fname)
            mod = iu.module_from_spec(spec)
            spec.loader.exec_module(mod)
            from audio_to_sheet_music_tpu import cli

            assert mod.main is getattr(cli, target)
