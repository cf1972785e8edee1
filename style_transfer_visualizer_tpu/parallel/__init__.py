"""Multi-device parallelism: meshes, multi-style DP, spatial sharding."""
