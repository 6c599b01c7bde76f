"""Vendored public data fixtures (zip-safe via importlib.resources)."""
