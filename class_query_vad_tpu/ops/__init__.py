from .deform_attn import (
    ms_deform_attn_3d,
    ms_deform_attn_3d_xla,
    directional_offset_init,
)
from .selective_scan import selective_scan, selective_scan_sequential
from .lsap import linear_sum_assignment, batched_linear_sum_assignment

__all__ = [
    "ms_deform_attn_3d",
    "ms_deform_attn_3d_xla",
    "directional_offset_init",
    "selective_scan",
    "selective_scan_sequential",
    "linear_sum_assignment",
    "batched_linear_sum_assignment",
]
