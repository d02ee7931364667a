"""Batch twins of the streaming queries (streaming/ module).

The driver collects batch DataFrames, so the registry entries here are the
batch-mode equivalents of each streaming pipeline; pytest runs the actual
``readStream`` variants and asserts they produce the same rows.
"""
