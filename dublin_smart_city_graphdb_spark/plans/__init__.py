"""Plan-level utilities: checkpoint lifecycle management."""

from .ckpt import CheckpointTracker

__all__ = ["CheckpointTracker"]
