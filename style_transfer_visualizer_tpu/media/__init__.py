"""Media pipeline: frame sinks, segments, encoders, async streaming."""
