"""Sources/sinks: pages input, stage checkpoints, run manifests."""
