"""Utilities: frame/time conversions, timing harness."""
