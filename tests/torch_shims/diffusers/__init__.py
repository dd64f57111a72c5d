"""Minimal diffusers-0.16 shim: exactly the symbols
`/root/reference/models_video` imports, with 0.16.0 numerics, so the
reference's own torch modules can run for full-graph parity tests.

Test-support code only — not part of the shipped framework.
"""

from .configuration_utils import ConfigMixin, register_to_config  # noqa: F401
from .models.modeling_utils import ModelMixin  # noqa: F401
