"""Batch operators re-expressing the reference's pipelines (SURVEY.md 2)."""
