"""Utilities: synthetic scenes, stats counters, timing, debug visualization."""
