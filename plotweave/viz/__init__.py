"""Visualization: stage previews and the stream simulator."""
