"""Measurement, parity, and conversion tools (importable as a package so
bench.py can reuse their recipes instead of duplicating them)."""
