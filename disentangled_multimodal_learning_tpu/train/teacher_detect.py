"""Tiny helper: detect teacher-family modules for input mapping."""


def is_teacher_model(model) -> bool:
    from ..models.teacher_student import TeachersNet

    return isinstance(model, TeachersNet)
