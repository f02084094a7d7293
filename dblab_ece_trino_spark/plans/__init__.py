"""Plan introspection + runtime metrics capture."""
