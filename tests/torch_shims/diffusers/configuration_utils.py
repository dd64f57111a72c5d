"""ConfigMixin / register_to_config with diffusers-0.16 call semantics
(enough for `Model(**json_config)`, `.config.attr`, `from_config`)."""

import functools
import inspect
import json


class FrozenDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


class ConfigMixin:
    config_name = "config.json"

    def register_to_config(self, **kwargs):
        internal = dict(getattr(self, "_internal_dict", {}))
        internal.update(kwargs)
        self._internal_dict = FrozenDict(internal)

    @property
    def config(self):
        return getattr(self, "_internal_dict", FrozenDict())

    @classmethod
    def from_config(cls, config, **kwargs):
        if isinstance(config, str):
            with open(config) as f:
                config = json.load(f)
        config = dict(config)
        config.update(kwargs)
        sig = inspect.signature(cls.__init__)
        accepted = set(sig.parameters) - {"self"}
        init_kwargs = {k: v for k, v in config.items() if k in accepted}
        return cls(**init_kwargs)


def register_to_config(init):
    """Decorator recording all __init__ args (with defaults applied) into the
    instance's config dict before running the body (0.16 behavior)."""

    @functools.wraps(init)
    def inner(self, *args, **kwargs):
        ignore = set(getattr(self, "_deprecated_kwargs", []))
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k != "self" and k not in ignore
               and sig.parameters[k].kind is not inspect.Parameter.VAR_KEYWORD}
        var_kw = [k for k, p in sig.parameters.items()
                  if p.kind is inspect.Parameter.VAR_KEYWORD]
        if var_kw and var_kw[0] in bound.arguments:
            cfg.update(bound.arguments[var_kw[0]])
        self.register_to_config(**cfg)
        init(self, *args, **kwargs)

    return inner
