"""Structured Streaming surface (out of the reference's scope — it is a
batch compiler, SURVEY §2.2 — provided as the engine's streaming path
for the events table)."""
