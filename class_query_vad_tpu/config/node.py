"""Minimal yacs-compatible configuration node.

The reference stack configures everything through a yacs ``CfgNode`` two-tree
schema (``DDP_CONFIG`` + ``CONFIG``) merged with YAML overlays
(see /root/reference/pipelines/video_action_recognition_config.py:8-202 and
/root/reference/train.py:199).  yacs is not available in this environment, so
this module provides the small subset of its API the framework needs:
attribute access, ``clone``, ``merge_from_file``, ``merge_from_list``,
``get`` with default, and ``new_allowed`` sub-trees.
"""

from __future__ import annotations

import copy
from typing import Any, List

import yaml


class CfgNode(dict):
    """A dict with attribute access and recursive YAML merging."""

    _NEW_ALLOWED = "__new_allowed__"

    def __init__(self, init_dict=None, new_allowed: bool = False):
        super().__init__()
        object.__setattr__(self, "_new_allowed", new_allowed)
        if init_dict:
            for k, v in init_dict.items():
                self[k] = self._convert(v, new_allowed)

    @staticmethod
    def _convert(value: Any, new_allowed: bool) -> Any:
        if isinstance(value, CfgNode):
            return value
        if isinstance(value, dict):
            return CfgNode(value, new_allowed=new_allowed)
        return value

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._convert(value, getattr(self, "_new_allowed", True))

    def __deepcopy__(self, memo):
        node = CfgNode(new_allowed=object.__getattribute__(self, "_new_allowed"))
        for k, v in self.items():
            node[k] = copy.deepcopy(v, memo)
        return node

    # -- yacs API -----------------------------------------------------------
    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def merge_from_file(self, cfg_filename: str) -> None:
        with open(cfg_filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        self._merge(loaded)

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge(other)

    def merge_from_list(self, cfg_list: List[Any]) -> None:
        assert len(cfg_list) % 2 == 0, "override list must be key/value pairs"
        for key, value in zip(cfg_list[0::2], cfg_list[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf in node and node[leaf] is not None:
                value = _coerce(value, type(node[leaf]))
            node[leaf] = self._convert(value, True)

    def _merge(self, other: dict) -> None:
        for k, v in other.items():
            if k in self and isinstance(self[k], CfgNode) and isinstance(v, dict):
                self[k]._merge(v)
            elif k in self or getattr(self, "_new_allowed", True):
                self[k] = self._convert(v, True)
            else:
                raise KeyError(f"Non-existent config key: {k}")

    def dump(self) -> str:
        return yaml.safe_dump(_to_plain(self), sort_keys=False)

    def freeze(self) -> None:  # compatibility no-op; configs stay mutable
        pass

    def defrost(self) -> None:
        pass


def _coerce(value: Any, target_type: type) -> Any:
    if isinstance(value, target_type):
        return value
    if target_type is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    try:
        return target_type(value)
    except (TypeError, ValueError):
        return value


def _to_plain(node: Any) -> Any:
    if isinstance(node, CfgNode):
        return {k: _to_plain(v) for k, v in node.items()}
    return node
