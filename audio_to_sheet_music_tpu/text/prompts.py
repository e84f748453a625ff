"""Stem prompt templates (reference `src/dataloader.py:15-34`).

Four canonical MusDB18 stems, each with a handful of free-text variants used
for prompt-augmented training; ``PROMPT_TO_STEM`` inverts the map so eval
code can bucket a prompt back to its canonical stem.
"""

from __future__ import annotations

import random
from typing import Dict, List

STEM_PROMPTS: Dict[str, List[str]] = {
    "drums": ["drums", "drum kit", "percussion", "the drums"],
    "bass": ["bass", "bass guitar", "the bass", "bass line"],
    "other": ["other instruments", "accompaniment", "instruments"],
    "vocals": ["vocals", "voice", "singing", "the vocals"],
}

PROMPT_TO_STEM: Dict[str, str] = {
    prompt: stem
    for stem, prompts in STEM_PROMPTS.items()
    for prompt in prompts
}

STEM_NAME_TO_INDEX = {"drums": 0, "bass": 1, "other": 2, "vocals": 3}

STEM_NAMES = ["drums", "bass", "other", "vocals"]


def get_random_prompt(stem_name: str, rng: random.Random | None = None) -> str:
    """Random text prompt for a stem (reference `src/dataloader.py:15-17`)."""
    r = rng if rng is not None else random
    return r.choice(STEM_PROMPTS[stem_name])
