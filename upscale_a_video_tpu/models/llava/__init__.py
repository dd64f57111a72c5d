from .llava import LlavaConfig, LlavaModel, LlavaCaptioner
from .mpt import MPTConfig, MPTForCausalLM

__all__ = ["LlavaConfig", "LlavaModel", "LlavaCaptioner", "MPTConfig",
           "MPTForCausalLM"]
