"""Placeholder — implemented in a later batch."""
