"""Operator families: staging (a), relational (b), windows (c), udfs (f), llmops (g)."""
