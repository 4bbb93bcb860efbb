"""Distributed operators: seen-set, frontier scheduling, path extension,
dedup, similarity — each a composition of DataFrame ops (SURVEY.md §2)."""
