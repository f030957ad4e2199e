"""Populated in a later milestone."""
