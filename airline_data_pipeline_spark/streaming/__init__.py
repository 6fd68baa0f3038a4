"""Structured Streaming surface over the events table (SURVEY.md §2.8)."""
