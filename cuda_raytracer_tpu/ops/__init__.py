"""Device ops: intersection, traversal, compaction, shading, filters."""
