"""Plans: iterative superstep runtime with checkpointing and lineage."""
