"""Multi-device distribution: domain decomposition over the TPU mesh."""
