"""Scalar/vector function library (SURVEY.md §2.6-2.7)."""
