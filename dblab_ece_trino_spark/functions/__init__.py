"""Scalar-function helpers (SURVEY §2.8)."""
