"""Structured Streaming analogues of the snapshot logic (SURVEY.md §2.9, §7 step 5)."""
