"""Operators: edge derivation, graph algorithms, dedup, similarity."""
