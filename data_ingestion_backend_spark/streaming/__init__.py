"""Structured Streaming: landing-zone ingestion and event-time operators."""
