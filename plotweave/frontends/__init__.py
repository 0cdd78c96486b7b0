"""Alternate input front-ends: G-code and SVG → plotter streams."""
