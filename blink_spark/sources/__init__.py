"""Scans/sources for the reference's ingest formats (SURVEY.md §2.1)."""
