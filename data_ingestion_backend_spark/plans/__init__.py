"""Session factory, tuning configuration, and plan-audit helpers."""
