from .embeddings import get_timestep_embedding
from .rope import rotary_frequencies, apply_rotary
from .relpos import relative_position_buckets

__all__ = [
    "get_timestep_embedding",
    "rotary_frequencies",
    "apply_rotary",
    "relative_position_buckets",
]
