class Attention:
    """Imported by the vendored diffusers_attention.py; never constructed in
    the VSR path (only its CrossAttention is used)."""

    def __init__(self, *a, **k):
        raise NotImplementedError("not used by the UAV inference path")
