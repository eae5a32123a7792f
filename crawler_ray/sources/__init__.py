"""Readers, writers, and deterministic synthetic-data generators."""
