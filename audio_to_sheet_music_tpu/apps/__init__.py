"""User-facing entry points: CLI separation, serving, analysis tools."""
