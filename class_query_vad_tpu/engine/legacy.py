"""Legacy AVA evaluation entry point.

The reference keeps an older eval loop in
utils/video_action_detection_utils.py:19 (superseded by
video_action_recognition.validate_ava but still importable).  This module
provides the equivalent compatibility surface: a bare ``evaluate`` that
delegates to the current engine loop and returns the metrics dict.
"""

from __future__ import annotations

from .evaluate import run_validation


def evaluate(cfg, model, params, postprocessor, data_loader,
             criterion=None, rank: int = 0, world_size: int = 1):
    """Legacy-compatible wrapper around
    :func:`..engine.evaluate.run_validation`."""
    return run_validation(
        cfg, model, params, postprocessor, data_loader, rank=rank,
        world_size=world_size, criterion=criterion,
    )
