"""Dataflow operators of the engine (SURVEY.md section 2)."""
