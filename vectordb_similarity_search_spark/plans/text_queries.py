"""text_queries — filled incrementally."""
