"""Deterministic synthetic fixture corpora (no external data)."""
