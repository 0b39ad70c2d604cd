"""Composed query plans: the end-to-end pipelines of SURVEY.md §3."""
