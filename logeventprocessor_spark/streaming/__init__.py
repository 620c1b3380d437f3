"""Structured-Streaming form of the engine (SURVEY.md 7.2 step 6)."""
