"""Console tools: dataset prep, alignment, stats, cache, export, demos."""
