"""Benchmark harness — parity with the reference's results/ capture."""
