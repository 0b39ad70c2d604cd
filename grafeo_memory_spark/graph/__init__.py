"""Iterative graph algorithms as DataFrame loops (SURVEY.md §2.10)."""
