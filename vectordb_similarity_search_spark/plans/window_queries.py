"""window_queries — filled incrementally."""
