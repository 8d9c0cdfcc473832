"""Sinks: headered CSV, JSON (NDJSON + bug-compat single array), versioned
idempotent artifact layout with a ``latest`` pointer."""
