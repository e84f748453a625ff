"""Time-to-first-audio for the streaming endpoint (serving latency).

Measures, against a live ``apps/serve_http.py`` server on this machine:

* ``t_headers``  — request sent -> response headers received
* ``t_first_pcm`` — -> first PCM byte after the 44-byte WAV header
  (the moment a player can start buffering real audio)
* ``t_first_second`` — -> one audible second buffered (44100 frames,
  4 bytes/frame; the moment playback can safely start)
* ``t_total`` — -> last byte (equals the offline separation time)

    python scripts/stream_latency.py [--seconds 30] [--block-chunks 8]
                                     [--segment 6.0] [--tiny]

Run on the TPU for the recorded numbers (docs/PERFORMANCE.md "Streaming
latency"); ``--tiny`` exercises the measurement itself on CPU-class hosts.
"""
import argparse
import http.client
import io
import pathlib
import struct
import sys
import threading
import time
import wave

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from audio_to_sheet_music_tpu.apps.serve_http import (SeparationService,
                                                      make_server)
from audio_to_sheet_music_tpu.infer import Separator
from audio_to_sheet_music_tpu.models import atht

SR = 44100


def make_wav_bytes(seconds: float, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    pcm = (0.1 * rng.standard_normal((int(seconds * SR), 2)) * 32767)
    pcm = np.clip(pcm, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def measure(port: int, body: bytes, path: str = "/api/separate/stream",
            prompt: str = "vocals", block_chunks: int = 8) -> dict:
    conn = http.client.HTTPConnection("127.0.0.1", port)
    t0 = time.perf_counter()
    conn.request("POST", f"{path}?prompt={prompt}&block={block_chunks}",
                 body=body, headers={"Content-Type": "audio/wav"})
    resp = conn.getresponse()
    t_headers = time.perf_counter() - t0
    assert resp.status == 200, (resp.status, resp.read()[:200])

    got = 0
    t_first_pcm = t_first_second = None
    header = 44                      # WAV header precedes any audio
    first_second = header + SR * 4   # one second of 16-bit stereo frames
    while True:
        chunk = resp.read(65536)
        if not chunk:
            break
        got += len(chunk)
        if t_first_pcm is None and got > header:
            t_first_pcm = time.perf_counter() - t0
        if t_first_second is None and got >= first_second:
            t_first_second = time.perf_counter() - t0
    t_total = time.perf_counter() - t0
    conn.close()
    return {"t_headers": t_headers, "t_first_pcm": t_first_pcm,
            "t_first_second": t_first_second, "t_total": t_total,
            "bytes": got}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--block-chunks", type=int, default=8)
    ap.add_argument("--segment", type=float, default=6.0)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if args.tiny:
        import os

        os.environ["ATSM_TINY_MODEL"] = "1"
    params = atht.init_from_env(jax.random.PRNGKey(0))
    sep = Separator(params, segment_seconds=args.segment,
                    overlap_seconds=args.segment / 4)
    server = make_server(SeparationService(sep, spectrograms=False))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    body = make_wav_bytes(args.seconds)

    # Warmup: compile the text tower + streaming block program.
    warm = measure(port, make_wav_bytes(min(args.seconds, 12.0), seed=1),
                   block_chunks=args.block_chunks)
    print(f"warmup: total {warm['t_total']:.2f}s (incl. compile)")

    for run in range(3):
        m = measure(port, body, block_chunks=args.block_chunks)
        rt = args.seconds / m["t_total"]
        print(f"run {run}: headers {m['t_headers']*1e3:7.1f} ms | "
              f"first-pcm {m['t_first_pcm']*1e3:7.1f} ms | "
              f"first-audible-second {m['t_first_second']*1e3:7.1f} ms | "
              f"total {m['t_total']:.2f}s ({rt:.1f}x realtime, "
              f"{m['bytes']/1e6:.1f} MB)")
    server.shutdown()


if __name__ == "__main__":
    main()
