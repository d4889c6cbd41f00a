from .node import CfgNode
from .defaults import get_cfg_defaults, get_cfg_custom

__all__ = ["CfgNode", "get_cfg_defaults", "get_cfg_custom"]
