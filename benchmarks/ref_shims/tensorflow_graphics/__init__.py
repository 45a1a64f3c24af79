"""Stub package (reference import shim)."""
