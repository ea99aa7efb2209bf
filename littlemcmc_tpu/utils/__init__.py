"""Utilities: convergence diagnostics, checkpointing, progress."""

from .diagnostics import ess_bulk, split_rhat, summary

__all__ = ["ess_bulk", "split_rhat", "summary"]
