"""Engine-level operators (SURVEY.md §2.2-§2.6, §2.10).

These are the operations that are *not* a single Catalyst expression —
data-dependent schemas, validation contracts, stable pagination,
dedup families, similarity search, as-of joins.
"""
