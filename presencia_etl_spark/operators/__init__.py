"""DataFrame → DataFrame operators (SURVEY §2 + 100 TB extensions)."""
