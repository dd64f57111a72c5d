from .color import adain_color_fix, wavelet_color_fix

__all__ = ["adain_color_fix", "wavelet_color_fix"]
