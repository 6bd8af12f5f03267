"""Schedules, losses, metrics, misc helpers."""
