"""Shared scalar/vector function library for the pipelines."""
