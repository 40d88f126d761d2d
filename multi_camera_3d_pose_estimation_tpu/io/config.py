"""YAML-over-introspected-defaults config system.

Behaviour parity with reference utils.py:1376-1399: YAML values are merged
over a function's signature defaults; the string ".inf" becomes np.inf and
``betas`` lists become tuples (optax/torch both want tuples).
"""

from __future__ import annotations

import inspect

import numpy as np
import yaml

__all__ = ["load_config", "get_function_defaults", "prepare_kwargs"]


def load_config(config_path: str | None = None) -> dict:
    if config_path is None:
        return {}
    with open(config_path) as f:
        return yaml.safe_load(f) or {}


def get_function_defaults(func) -> dict:
    sig = inspect.signature(func)
    return {
        k: v.default
        for k, v in sig.parameters.items()
        if v.default is not inspect.Parameter.empty
    }


def prepare_kwargs(func, user_kwargs: dict | None) -> dict:
    kwargs = get_function_defaults(func)
    kwargs.update(user_kwargs or {})
    for k, v in kwargs.items():
        if v == ".inf":
            kwargs[k] = np.inf
        if k == "betas" and isinstance(v, list):
            kwargs[k] = tuple(v)
    return kwargs
