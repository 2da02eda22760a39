"""Event-time windowed operators (filled in M5)."""
