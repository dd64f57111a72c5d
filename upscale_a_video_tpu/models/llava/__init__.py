from .llava import LlavaConfig, LlavaModel, LlavaCaptioner

__all__ = ["LlavaConfig", "LlavaModel", "LlavaCaptioner"]
