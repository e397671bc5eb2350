"""Streaming surface (§2.E) — filled in M4."""
