"""Plan-level helpers: explain auditing, shuffle accounting."""
