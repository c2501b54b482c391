"""Scalar function library (SURVEY.md §2.8) — geo, time, json helpers."""
