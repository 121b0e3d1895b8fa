"""Scalar/structural function helpers (SURVEY §2.9)."""
