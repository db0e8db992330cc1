"""Relational operators of the engine (each a DataFrame -> DataFrame fn)."""
