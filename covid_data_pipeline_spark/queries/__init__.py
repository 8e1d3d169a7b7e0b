"""Declared queries (SURVEY.md §2), one module per operator family."""
