from .color import adain_color_fix, apply_color_fix, wavelet_color_fix
from .pipeline import PipelineModules, VideoUpscalePipeline
from .tiling import needs_tiling, plan_tiles
from .windows import chunk_starts, window_blend_matrix, window_starts

__all__ = [
    "adain_color_fix",
    "apply_color_fix",
    "wavelet_color_fix",
    "PipelineModules",
    "VideoUpscalePipeline",
    "needs_tiling",
    "plan_tiles",
    "chunk_starts",
    "window_blend_matrix",
    "window_starts",
]
