"""Reusable map_batches stages (stateless fns + actor-pool classes)."""
