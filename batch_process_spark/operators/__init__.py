"""Operator library — one module per SURVEY §2 family."""
