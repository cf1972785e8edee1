"""Standalone developer utilities supporting the main pipeline."""
