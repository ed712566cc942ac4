"""nonsql_queries — filled incrementally."""
