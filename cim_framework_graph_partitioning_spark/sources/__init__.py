"""Sources: synthetic corpus generation and testdata loading."""
