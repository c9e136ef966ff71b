"""Structured Streaming surface (batch-first engine; SURVEY.md §2.10 notes
the reference has no event-time semantics — the only streaming-shaped need
is incremental re-linking of new documents)."""
