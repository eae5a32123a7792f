"""Frontier service state: membership filters, politeness, robots,
sharded frontier actors, checkpointing."""
