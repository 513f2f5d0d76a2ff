"""yacs-style YAML config loading for the CAD detector CLI.

Supports ``_BASE_`` inheritance and dotted CLI ``opts`` overrides so the
reference's published configs and run recipes
(``cad/model_zoo/configs/*.yaml``, ``script.sh:51-62``) work unchanged.
Unknown keys are kept (and reported) rather than rejected.
"""

from __future__ import annotations

import os

import yaml


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_yacs_config(path: str) -> dict:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    base_rel = cfg.pop("_BASE_", None)
    if base_rel:
        base = load_yacs_config(os.path.join(os.path.dirname(path), base_rel))
        cfg = _deep_merge(base, cfg)
    return cfg


def _parse_value(s: str):
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def apply_opts(cfg: dict, opts: list[str]) -> dict:
    """Apply ["MODEL.WEIGHTS", "x.pth", ...] dotted overrides."""
    assert len(opts) % 2 == 0, "opts must be KEY VALUE pairs"
    for key, value in zip(opts[0::2], opts[1::2]):
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return cfg


def get(cfg: dict, dotted: str, default=None):
    node = cfg
    for p in dotted.split("."):
        if not isinstance(node, dict) or p not in node:
            return default
        node = node[p]
    return node
