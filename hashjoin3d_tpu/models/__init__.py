"""Benchmark models: the reference's experiment plans as device pipelines."""
