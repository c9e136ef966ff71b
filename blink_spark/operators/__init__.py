"""Relational operators of the ER engine (SURVEY.md §2 inventory)."""
