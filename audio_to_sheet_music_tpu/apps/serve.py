"""Gradio serving app (reference `app.py:205-393`).

    python -m audio_to_sheet_music_tpu.apps.serve [--checkpoint ...] [--port 7860]

Upload audio (or point at a local file path), type a free-text prompt
("drums", "the vocals", "piano sound"), get the separated stem plus input/
output spectrograms.  Uses the shared ``Separator`` session with the app
protocol's 0.1 s overlap (reference `app.py:139`).

``gradio`` is an optional dependency (the reference pins gradio 5.17); when
missing this module degrades to a clear error.  The reference's YouTube
download path (yt-dlp) is likewise optional and gated.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

SAMPLE_RATE = 44100


def build_separator(checkpoint: str | None, config: str | None = None):
    """App-protocol separator (reference `app.py:33,49-67`): segment/overlap
    come from the config's ``data`` section (0.1 s overlap default,
    app.py:133-139), the checkpoint defaults to ``training.resume_from``,
    and CLAP text features are normalised (ClapModel path, app.py:53)."""
    import jax

    from ..infer import Separator
    from ..models import atht

    segment_s, overlap_s = 6.0, 0.1
    if config and Path(config).exists():
        from ..config import Config

        cfg = Config.from_yaml(config)
        segment_s = cfg.data.segment_seconds
        overlap_s = cfg.data.overlap
        if checkpoint is None and cfg.training.resume_from:
            if Path(cfg.training.resume_from).exists():
                checkpoint = cfg.training.resume_from
            else:
                import warnings

                warnings.warn(
                    f"training.resume_from={cfg.training.resume_from!r} "
                    "does not exist; serving with random-init head")
    params, pretrained = atht.load_params(checkpoint, jax.random.PRNGKey(0))
    return Separator(params, segment_seconds=segment_s,
                     overlap_seconds=overlap_s,
                     normalize_text=True, pretrained=pretrained)


def download_youtube_audio(url: str, out_dir: str = "temp") -> Path:
    """YouTube -> local audio file via yt-dlp (reference `app.py:180-198`).

    Optional dependency: raises with a clear message when yt-dlp is missing
    (it is not installed in offline environments).
    """
    try:
        import yt_dlp
    except ImportError as e:
        raise RuntimeError("yt-dlp is not installed; paste a local .wav "
                           "path instead") from e
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # bestaudio is practically never .wav, and _load_input only reads .wav
    # without ffmpeg — so post-process the download to wav (needs ffmpeg,
    # which yt-dlp reports clearly when missing).
    opts = {"format": "bestaudio/best",
            "outtmpl": str(out / "yt_audio.%(ext)s"), "quiet": True,
            "postprocessors": [{"key": "FFmpegExtractAudio",
                                "preferredcodec": "wav"}]}
    with yt_dlp.YoutubeDL(opts) as ydl:
        info = ydl.extract_info(url, download=True)
        return Path(ydl.prepare_filename(info)).with_suffix(".wav")


def _load_input(audio, path_text):
    from ..utils import audio_io

    if path_text and str(path_text).startswith(("http://", "https://")):
        path_text = str(download_youtube_audio(path_text))
    if audio is not None:
        sr, data = audio                       # gradio numpy audio
        data = audio_io.payload_to_float(np.asarray(data))
        wav = data.T if data.ndim == 2 else data[None]
        if np.abs(wav).max() > 1.5:            # float payload in int range
            wav = wav / 32768.0
    elif path_text:
        p = Path(path_text)
        if p.suffix == ".wav":
            sr, wav = audio_io.read_wav(p)
        else:
            raise ValueError("only .wav paths supported without ffmpeg")
    else:
        raise ValueError("provide an upload or a file path")
    wav = audio_io.to_stereo(audio_io.resample(wav, sr, SAMPLE_RATE))
    return wav


def create_demo(separator):
    import gradio as gr

    from ..utils import plotting

    def process(audio, path_text, prompt):
        wav = _load_input(audio, path_text)
        out = separator.separate(wav, prompt or "vocals")
        fig_in = plotting.plot_spectrogram(wav, "input mixture")
        fig_out = plotting.plot_spectrogram(out, f"separated: {prompt}")
        return ((SAMPLE_RATE, wav.T), (SAMPLE_RATE, out.T), fig_in, fig_out,
                f"separated '{prompt}' from {wav.shape[-1] / SAMPLE_RATE:.1f} s of audio")

    with gr.Blocks(title="Audio-Text Stem Separation (TPU)") as demo:
        gr.Markdown("# Text-conditioned stem separation\n"
                    "Upload audio and describe the sound to extract.")
        with gr.Row():
            audio_in = gr.Audio(label="input audio", type="numpy")
            path_in = gr.Textbox(label="...or local .wav path")
        prompt = gr.Textbox(label="prompt", value="vocals")
        btn = gr.Button("Separate")
        with gr.Row():
            player_in = gr.Audio(label="mixture")
            player_out = gr.Audio(label="separated stem")
        with gr.Row():
            spec_in = gr.Plot(label="input spectrogram")
            spec_out = gr.Plot(label="output spectrogram")
        status = gr.Textbox(label="status")
        btn.click(process, [audio_in, path_in, prompt],
                  [player_in, player_out, spec_in, spec_out, status])
    return demo


def main() -> None:
    ap = argparse.ArgumentParser(description="Serve the separation demo")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--config", default="config.yaml",
                    help="YAML config for segment/overlap and the default "
                         "checkpoint (reference app.py loads the same keys)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--ui", choices=("auto", "gradio", "http"), default="auto",
                    help="auto = gradio when importable, else the stdlib "
                         "HTTP fallback UI (apps.serve_http) — same "
                         "workflow, zero extra dependencies")
    ap.add_argument("--warmup-seconds", type=float, default=60.0,
                    help="pre-compile the sweep for this song length's "
                         "chunk-grid bucket at startup (other buckets still "
                         "compile on first use, cached persistently; 0 "
                         "disables)")
    args = ap.parse_args()
    ui = args.ui
    if ui in ("auto", "gradio"):
        try:
            import gradio  # noqa: F401

            ui = "gradio"
        except ImportError as e:
            if ui == "gradio":
                raise SystemExit("gradio is not installed in this "
                                 "environment; use --ui http for the "
                                 "dependency-free fallback UI") from e
            print("gradio not installed -> stdlib HTTP fallback UI "
                  "(same workflow; install gradio for the Blocks demo)")
            ui = "http"
    sep = build_separator(args.checkpoint, args.config)
    if args.warmup_seconds > 0:
        t = int(args.warmup_seconds * SAMPLE_RATE)
        print(f"warming the sweep for <= {args.warmup_seconds:.0f} s songs "
              "(first compile can take minutes; cached afterwards)...")
        sep.separate(np.zeros((2, t), np.float32), "vocals")
        tune = type(sep).autotune_fetch_streams()
        print(f"warmup done; D2H {tune['single_MBps']:.0f} MB/s single vs "
              f"{tune['multi_MBps']:.0f} aggregate -> {tune['streams']} "
              "fetch stream(s)")
    if ui == "gradio":
        create_demo(sep).launch(server_name=args.host, server_port=args.port)
    else:
        from .serve_http import SeparationService, serve

        service = SeparationService(sep, pretrained=sep.pretrained)
        if args.warmup_seconds > 0:
            # fix the ?block=auto streaming default from the measured
            # per-dispatch floor (two short silence blocks, compile cached)
            tune = service.autotune_stream_block()
            print(f"stream block auto={tune['block']} "
                  f"(floor {tune['floor_s']*1e3:.0f} ms + "
                  f"{tune['per_chunk_s']*1e3:.0f} ms/chunk -> first audio "
                  f"~{tune['first_audio_s']:.2f} s)")
        serve(service, args.host, args.port)


if __name__ == "__main__":
    main()
