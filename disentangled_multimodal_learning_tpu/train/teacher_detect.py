"""Tiny helper: detect teacher-family modules for input mapping."""

import inspect


def is_teacher_model(model) -> bool:
    """True when the module's forward consumes the two-scale omic inputs
    (teacher-family signature: x_path10/x_path20 + x_omic_tumor/immune).

    Signature-based instead of ``isinstance(model, TeachersNet)`` so that
    subclasses and independently defined teacher variants are detected by
    what they consume, not by their type lineage."""
    try:
        params = inspect.signature(type(model).__call__).parameters
    except (TypeError, ValueError):
        return False
    return "x_omic_tumor" in params and "x_path10" in params
