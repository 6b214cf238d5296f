"""Shared column-level helpers (oracle-stable numerics, text, vectors)."""
