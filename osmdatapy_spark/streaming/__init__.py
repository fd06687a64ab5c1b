"""Structured Streaming face over the events table (beyond-reference scope —
the reference is strictly batch, SURVEY.md §2.9)."""
