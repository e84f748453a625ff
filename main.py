"""Training entry point: ``python main.py [--config config.yaml]``.

Reference counterpart: `main.py:327` -> `src/train.py:274`.  (The reference's
own ``main.py`` crashes on a stale import, SURVEY §2a "known defects" — this
one is tested.)  Installed form: ``atsm-train`` (see pyproject.toml);
implementation lives in ``audio_to_sheet_music_tpu.cli``.
"""

from audio_to_sheet_music_tpu.cli import train_main as main

if __name__ == "__main__":
    main()
