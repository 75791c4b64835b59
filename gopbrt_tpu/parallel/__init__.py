"""Device-mesh sharding: multi-chip render and gradient steps."""
