"""Shared utilities: comparison gates, timers."""
