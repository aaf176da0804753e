"""Structured Streaming layer: incremental tile processing."""
