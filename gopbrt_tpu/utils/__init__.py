"""Image IO, progress reporting, profiling helpers."""
