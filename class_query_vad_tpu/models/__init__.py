from .detr import DETR, build_model  # noqa: F401
