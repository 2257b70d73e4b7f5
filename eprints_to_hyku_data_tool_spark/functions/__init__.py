"""Reusable column functions: vector math, text metrics (SURVEY.md §2.10-2.11)."""
