"""Relational + extension operators (SURVEY.md §2)."""
