"""Validation-run assembly: suite runner + checkpoint manifest."""
