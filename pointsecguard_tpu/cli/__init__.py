"""CLI entry points: prepare / train / eval / attack."""
