"""Structured Streaming surface (SURVEY.md §2.9 X07-X11)."""
