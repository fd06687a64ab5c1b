"""Data sources: the custom OSM PBF reader (reference pass-1/pass-2 scan)."""
