"""Visualization utilities: overlays, contours, and movie recording helpers."""
