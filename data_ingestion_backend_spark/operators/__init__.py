"""Relational operators (parity query set) and extension operators."""
