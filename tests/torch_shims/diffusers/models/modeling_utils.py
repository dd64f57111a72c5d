import torch.nn as nn


class ModelMixin(nn.Module):
    """diffusers ModelMixin reduced to what the reference models touch at
    forward time: nn.Module + dtype/device properties + param counting."""

    _supports_gradient_checkpointing = False

    def __init__(self):
        super().__init__()

    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device

    def num_parameters(self, only_trainable: bool = False) -> int:
        return sum(p.numel() for p in self.parameters()
                   if p.requires_grad or not only_trainable)

    def enable_gradient_checkpointing(self):
        self.apply(lambda m: self._set_gradient_checkpointing(m, True)
                   if hasattr(self, "_set_gradient_checkpointing") else None)
