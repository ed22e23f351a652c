"""Shared utilities: config loading, profiling, trajectory evaluation."""
