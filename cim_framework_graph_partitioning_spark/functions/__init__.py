"""Scalar/vector function library (built-in expressions + pandas UDFs)."""
