"""Placeholder — queries land in a later milestone."""
