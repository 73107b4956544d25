"""Load-time inference materialization (SURVEY.md §2.8, M5)."""
