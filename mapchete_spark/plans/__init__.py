"""Job planning: .mapchete-style YAML configs + the per-zoom runner."""
