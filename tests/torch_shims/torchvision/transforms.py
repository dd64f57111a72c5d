"""torchvision.transforms shim: color_correction.py imports ToTensor /
ToPILImage at module level but never calls them on the tensor path."""


class ToTensor:
    def __call__(self, *a, **k):
        raise NotImplementedError("shim: PIL path unused by the parity tests")


class ToPILImage(ToTensor):
    pass
