"""CLI entry points: train / infer / bench (reference train.py / test.py
analogs — SURVEY.md §2.4)."""
