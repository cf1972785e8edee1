"""Numerical ops: Gram matrices (XLA + Pallas), blends, frame packing."""
