"""Structured Streaming analogs of the reference's stream-shaped
semantics (SURVEY.md §2.12)."""
