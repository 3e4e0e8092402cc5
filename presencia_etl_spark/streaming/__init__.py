"""Structured Streaming analogs of the reference's cron-driven batch CDC."""
