"""Loss-curve plotting helpers."""
