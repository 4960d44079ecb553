"""Utilities: read simulation, logging, profiling hooks."""
