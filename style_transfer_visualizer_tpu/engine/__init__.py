"""Optimization engine: jitted update steps, runner, metrics plumbing."""
