"""MLlib pipeline queries (filled in M4)."""
