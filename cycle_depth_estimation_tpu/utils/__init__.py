"""Utilities: checkpoint import/export, image conversion, metrics, logging."""
