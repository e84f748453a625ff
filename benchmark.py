"""MusDB18 benchmark CLI (reference `benchmark.py:895-1016` counterpart).

    python benchmark.py --models ours htdemucs --test-dir <tracks> \
        --output-dir results [--max-tracks N] [--checkpoint best_model.pt]

Evaluates each model over the test tracks (SDR + SI-SDR per stem), prints the
aggregate tables and writes ``<output-dir>/evaluation_results.json`` in the
reference's exact schema.  With ``--synthetic`` it runs on the in-memory
fixture (no dataset needed) — useful as an end-to-end smoke benchmark.
Installed form: ``atsm-benchmark`` (see pyproject.toml); implementation
lives in ``audio_to_sheet_music_tpu.cli``.
"""

from audio_to_sheet_music_tpu.cli import benchmark_main as main

if __name__ == "__main__":
    main()
