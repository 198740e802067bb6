"""Relational operators of the validation engine (SURVEY.md §2)."""
