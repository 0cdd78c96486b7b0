"""Vector-geometry stages: tracing, scaling, ordering, dedup, planning."""
