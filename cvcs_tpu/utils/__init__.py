"""Shared utilities: ASCII tables, torch weight/checkpoint importers,
parameter counting, structured run logging."""
