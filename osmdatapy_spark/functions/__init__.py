"""Column-function library: text analysis, dedup, similarity (north-star ops)."""
