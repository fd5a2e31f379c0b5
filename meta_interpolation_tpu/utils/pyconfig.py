"""Python-file config loading (VoxelFlow's config subsystem).

Reference: ``/root/reference/voxelflow/core/utils/config.py:10-60`` — loads
a python module of UPPERCASE settings into an attr-dict and mirrors every
entry as an argparse flag. Here: load the module, merge into a Config,
letting explicit CLI flags win.
"""
from __future__ import annotations

import dataclasses
import importlib.util
from typing import Any, Dict

from ..config import Config


class AttrDict(dict):
    """EasyDict-style attribute access (reference uses easydict)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def load_pyconfig(path: str) -> AttrDict:
    spec = importlib.util.spec_from_file_location("user_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = AttrDict()
    # UPPERCASE module-level names only — the reference's loader contract
    # (voxelflow/core/utils/config.py); mirroring every lowercase name
    # would sweep imports and scratch variables into the config and let
    # them silently override Config fields in merge_into_config
    for name in dir(mod):
        if not name.startswith("_") and name.isupper():
            out[name.lower()] = getattr(mod, name)
    return out


def merge_into_config(cfg: Config, pycfg: Dict[str, Any]) -> Config:
    """Overlay python-file settings onto a Config (unknown keys ignored,
    reported)."""
    known = {f.name for f in dataclasses.fields(Config)}
    updates = {k: v for k, v in pycfg.items() if k in known}
    unknown = sorted(set(pycfg) - known)
    if unknown:
        print(f"[pyconfig] ignoring unknown keys: {unknown}")
    return dataclasses.replace(cfg, **updates)
