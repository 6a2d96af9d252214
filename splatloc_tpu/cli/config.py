"""YAML config system — same schema as the reference incl. recursive
``inherit_from`` merging (utils/config_utils.py:4-50), plus an attribute-dict
wrapper replacing munch and a ``tpu:`` section for mesh/sharding options.
"""
from __future__ import annotations

import os

import yaml


class AttrDict(dict):
    """dict with attribute access (munchify replacement)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) else v

    def __setattr__(self, k, v):
        self[k] = v


def update_recursive(dict1: dict, dict2: dict):
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = dict()
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: str | None = None) -> dict:
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f)

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        # inherit paths are repo-relative in the reference configs; resolve
        # relative to the including file as a fallback
        if not os.path.exists(inherit_from):
            alt = os.path.join(os.path.dirname(path), inherit_from)
            if os.path.exists(alt):
                inherit_from = alt
        cfg = load_config(inherit_from, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f)
    else:
        cfg = dict()

    update_recursive(cfg, cfg_special)
    return cfg


def save_dir_for(config: dict) -> str:
    """Reference save-dir layout (train_gaussians.py:370-380)."""
    path = config["Dataset"]["dataset_path"].rstrip("/").split("/")
    base = config["Results"]["save_dir"]
    if config["Dataset"]["type"] == "replica":
        return os.path.join(base, path[-2], path[-1])
    if config["Dataset"]["type"] == "12scenes":
        return os.path.join(base, path[-3], path[-2] + "_" + path[-1])
    raise ValueError("Dataset type should be replica or 12scenes")
