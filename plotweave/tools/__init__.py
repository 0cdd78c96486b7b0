"""Standalone analysis tools: color analysis, one-hot layer splitting."""
