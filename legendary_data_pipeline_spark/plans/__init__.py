"""Pipeline parity jobs (SURVEY.md §3, §7 step 4)."""
