"""Command-line entry points (hloc-compatible offline pipeline + train/eval)."""
