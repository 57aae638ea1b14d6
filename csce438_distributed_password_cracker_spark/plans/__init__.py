"""The declared query corpus (SURVEY.md §2) + DuckDB oracle SQL."""
