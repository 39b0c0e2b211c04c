"""Timing, profiling and reporting utilities."""
