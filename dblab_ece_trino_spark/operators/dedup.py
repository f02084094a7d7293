"""Placeholder — filled in by the LLM-pipeline operators milestone."""
