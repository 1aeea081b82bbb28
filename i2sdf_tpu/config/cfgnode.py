"""Hierarchical, YAML-backed configuration nodes.

Capability parity with the reference's yacs-style config system
(`/root/reference/utils/cfgnode.py:1-491`): attribute access over nested
dicts, type-checked merging from files / other configs / dotted-key
lists, freeze/defrost, YAML round-trip via ``dump()``, and loading.
Clean-room implementation.
"""

from __future__ import annotations

import copy
import io
from typing import Any

import yaml

# Leaf value types a config may hold (reference: cfgnode.py:25).
_VALID_TYPES = (tuple, list, str, int, float, bool, type(None))

_IMMUTABLE = "__immutable__"


class CfgNode(dict):
    """A nested dict with attribute access, freezing, and typed merge."""

    def __init__(self, init_dict: dict | None = None):
        init_dict = {} if init_dict is None else init_dict
        init_dict = self._create_tree(init_dict)
        super().__init__(init_dict)
        self.__dict__[_IMMUTABLE] = False

    @classmethod
    def _create_tree(cls, d: dict) -> dict:
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = cls(v)
            else:
                if not isinstance(v, _VALID_TYPES) and not isinstance(v, CfgNode):
                    raise ValueError(
                        f"Key {k} has invalid config value type {type(v)}"
                    )
                out[k] = copy.deepcopy(v)
        return out

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"Config has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        if self.__dict__.get(_IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set '{name}' on an immutable CfgNode"
            )
        if not isinstance(value, _VALID_TYPES + (CfgNode,)):
            if isinstance(value, dict):
                value = CfgNode(value)
            else:
                raise ValueError(
                    f"Invalid type {type(value)} for config key '{name}'"
                )
        self[name] = value

    def __setitem__(self, key, value):
        if self.__dict__.get(_IMMUTABLE, False):
            raise AttributeError(
                f"Attempted to set '{key}' on an immutable CfgNode"
            )
        super().__setitem__(key, value)

    def get(self, key, default=None):  # keep dict.get semantics
        return super().get(key, default)

    # -- freezing ---------------------------------------------------------
    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def is_frozen(self) -> bool:
        return self.__dict__[_IMMUTABLE]

    def _set_immutable(self, flag: bool) -> None:
        self.__dict__[_IMMUTABLE] = flag
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(flag)

    # -- deprecated / renamed keys (parity cfgnode.py:259-308) -------------
    def register_deprecated_key(self, key: str) -> None:
        self.__dict__.setdefault("__deprecated_keys__", set()).add(key)

    def register_renamed_key(self, old: str, new: str,
                             message: str | None = None) -> None:
        self.__dict__.setdefault("__renamed_keys__", {})[old] = (new, message)

    def key_is_deprecated(self, key: str) -> bool:
        return key in self.__dict__.get("__deprecated_keys__", set())

    def key_is_renamed(self, key: str) -> bool:
        return key in self.__dict__.get("__renamed_keys__", {})

    def raise_key_rename_error(self, key: str) -> None:
        new, message = self.__dict__["__renamed_keys__"][key]
        msg = f"Config key '{key}' was renamed to '{new}'"
        if message:
            msg += f"; {message}"
        raise KeyError(msg)

    # -- merging ----------------------------------------------------------
    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            other = load_cfg(f)
        self.merge_from_other_cfg(other)

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        _merge_a_into_b(other, self, full_key="")

    def merge_from_list(self, cfg_list: list) -> None:
        if len(cfg_list) % 2 != 0:
            raise ValueError("Override list must have even length (key value ...)")
        for key, value in zip(cfg_list[0::2], cfg_list[1::2]):
            if self.key_is_deprecated(key):
                continue
            if self.key_is_renamed(key):
                self.raise_key_rename_error(key)
            parts = key.split(".")
            node = self
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Non-existent config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            value = _decode_value(value)
            value = _check_type_coerce(value, node[leaf], key)
            node[leaf] = value

    # -- serialization ----------------------------------------------------
    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False)

    def clone(self) -> "CfgNode":
        return CfgNode(self.to_dict())

    def __repr__(self) -> str:
        return f"CfgNode({super().__repr__()})"


def _decode_value(value: Any) -> Any:
    """Decode a string override into a Python literal when possible."""
    if not isinstance(value, str):
        return value
    try:
        decoded = yaml.safe_load(value)
    except yaml.YAMLError:
        return value
    return decoded


def _check_type_coerce(new: Any, old: Any, key: str) -> Any:
    if old is None or new is None:
        return new
    if type(new) is type(old):
        return new
    # permissive numeric / sequence coercions
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, tuple) and isinstance(new, list):
        return tuple(new)
    if isinstance(old, list) and isinstance(new, tuple):
        return list(new)
    raise ValueError(
        f"Type mismatch for key '{key}': cannot replace {type(old).__name__} "
        f"with {type(new).__name__}"
    )


def _merge_a_into_b(a: CfgNode, b: CfgNode, full_key: str) -> None:
    for k, v in a.items():
        key = f"{full_key}.{k}" if full_key else k
        if k in b and isinstance(b[k], CfgNode) and isinstance(v, CfgNode):
            _merge_a_into_b(v, b[k], key)
        elif k in b and not isinstance(b[k], CfgNode):
            b[k] = _check_type_coerce(copy.deepcopy(v), b[k], key)
        else:
            b[k] = copy.deepcopy(v) if not isinstance(v, CfgNode) else v.clone()


def load_cfg(f) -> CfgNode:
    """Load a CfgNode from a YAML path/text/file object, or a .py module
    exporting `cfg` (parity with the reference's python-config support,
    cfgnode.py:356-371)."""
    if isinstance(f, str):
        if f.endswith(".py"):
            import importlib.util

            spec = importlib.util.spec_from_file_location("_user_cfg", f)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            cfg = getattr(mod, "cfg")
            return cfg if isinstance(cfg, CfgNode) else CfgNode(cfg)
        if "\n" in f or ":" in f and not f.endswith((".yml", ".yaml")):
            # raw YAML text
            try:
                return CfgNode(yaml.safe_load(io.StringIO(f)) or {})
            except yaml.YAMLError:
                pass
        with open(f, "r") as fh:
            return CfgNode(yaml.safe_load(fh) or {})
    return CfgNode(yaml.safe_load(f) or {})
