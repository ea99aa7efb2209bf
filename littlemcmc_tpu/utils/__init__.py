"""Utilities: convergence diagnostics, checkpointing, progress."""

from .diagnostics import bfmi, ess_bulk, split_rhat, summary, to_arviz

__all__ = ["bfmi", "ess_bulk", "split_rhat", "summary", "to_arviz"]
