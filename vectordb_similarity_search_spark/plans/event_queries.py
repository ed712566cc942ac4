"""event_queries — filled incrementally."""
