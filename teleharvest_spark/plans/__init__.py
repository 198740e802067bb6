"""Validation-run assembly: suite runner + checkpoint manifest +
cross-run metric anomaly detection (history.py)."""
