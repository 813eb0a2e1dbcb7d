"""Minimal YAML config system with hydra-style dotted overrides.

The reference uses three different flag systems (fire, argparse, hydra —
SURVEY.md section 5). This framework unifies on: argparse for the pipeline CLI
(same flag names as the reference's fire CLI) and YAML + `key=value` dotlist
overrides for the task drivers (same override syntax as the reference's hydra
commands, e.g. `python eval.py segments_dir=... matching=hungarian`).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence


class Config(dict):
    """dict with attribute access and dotted-path get/set."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def get_path(self, path: str, default=None):
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value):
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = Config()
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value


def _wrap(obj):
    if isinstance(obj, dict):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def _parse_value(s: str):
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none", "~"):
        return None
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s


def load_config(yaml_path: Optional[str | Path] = None,
                overrides: Sequence[str] = ()) -> Config:
    """Load a YAML file (optional) and apply `key.path=value` overrides."""
    import yaml
    cfg = Config()
    if yaml_path is not None:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _wrap(data)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, _, val = ov.partition("=")
        cfg.set_path(key.strip(), _parse_value(val.strip()))
    return cfg
