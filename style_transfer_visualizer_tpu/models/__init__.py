"""Model definitions: pure-JAX VGG19 feature extractor and loss taps."""
