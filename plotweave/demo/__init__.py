"""Procedural demo-stream generators."""
