"""Declared-query registry: every operator exposed for oracle checking."""
