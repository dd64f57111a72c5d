import logging as _pylogging
from collections import OrderedDict


class BaseOutput(OrderedDict):
    """Dataclass-backed output container (attr + index access), as in
    diffusers.utils.BaseOutput."""

    def __post_init__(self):
        for field in getattr(self, "__dataclass_fields__", {}):
            value = getattr(self, field)
            if value is not None:
                self[field] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.values())[k]
        return super().__getitem__(k)


def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    import torch

    if isinstance(generator, list):
        generator = generator[0]
    return torch.randn(shape, generator=generator, device=device, dtype=dtype)


def apply_forward_hook(fn):
    return fn


def deprecate(*args, **kwargs):
    pass


def is_accelerate_available():
    return False


def is_accelerate_version(*args, **kwargs):
    return False


class logging:  # diffusers.utils.logging namespace
    @staticmethod
    def get_logger(name=None):
        return _pylogging.getLogger(name or "diffusers")
