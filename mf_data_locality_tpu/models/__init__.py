"""Benchmark problem families (CEED bake-off problems)."""
