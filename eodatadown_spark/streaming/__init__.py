"""Streaming-shaped operators (SURVEY.md §2.9)."""
