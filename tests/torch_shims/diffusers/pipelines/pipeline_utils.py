"""diffusers.pipelines.pipeline_utils shim: just enough DiffusionPipeline
for VideoUpscalePipeline.__init__/__call__ (register_modules,
register_to_config via ConfigMixin, _execution_device, .to)."""

import torch

from ..configuration_utils import ConfigMixin


class DiffusionPipeline(ConfigMixin):
    def __init__(self):
        super().__init__()

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)

    @property
    def device(self):
        return torch.device("cpu")

    @property
    def _execution_device(self):
        return torch.device("cpu")

    def to(self, device):
        return self

    def progress_bar(self, iterable=None, total=None):
        return iterable if iterable is not None else range(total)
