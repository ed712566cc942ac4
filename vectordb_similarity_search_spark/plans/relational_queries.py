"""relational_queries — filled incrementally."""
