"""Prompt templates + tokenisation."""

from . import prompts, tokenizer  # noqa: F401
