"""CLI entry points: prepare / train / eval / attack / benchmark /
cv6fold / import_ckpt / export."""
