"""Checkpoint/restore for built tables and relations.

The reference has no persistence at all -- every run regenerates data from a
fixed seed (SURVEY.md 5.4).  A production engine wants to build once and
serve many probes; this module saves/loads the engine's dataclasses (tables,
group indices) to a single ``.npz`` plus a JSON manifest, with no extra
dependencies.  Serialization walks dataclass fields by name, so optional
fields (e.g. the dense-direct array) round-trip exactly.
"""

from __future__ import annotations

import dataclasses
import importlib
import json
from pathlib import Path

import jax
import numpy as np


def _encode(obj, path, arrays):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        spec = {"__dataclass__":
                type(obj).__module__ + ":" + type(obj).__qualname__}
        for f in dataclasses.fields(obj):
            spec[f.name] = _encode(getattr(obj, f.name), f"{path}.{f.name}",
                                   arrays)
        return spec
    if obj is None:
        return {"__none__": True}
    if isinstance(obj, (int, float, bool, str)):
        return {"__scalar__": obj}
    arr = np.asarray(obj)
    arrays[path] = arr
    return {"__array__": path}


def _decode(spec, arrays, device_put):
    if "__dataclass__" in spec:
        mod, _, qual = spec["__dataclass__"].partition(":")
        cls = getattr(importlib.import_module(mod), qual)
        kwargs = {k: _decode(v, arrays, device_put)
                  for k, v in spec.items() if k != "__dataclass__"}
        return cls(**kwargs)
    if spec.get("__none__"):
        return None
    if "__scalar__" in spec:
        return spec["__scalar__"]
    a = arrays[spec["__array__"]]
    return jax.device_put(a) if device_put else a


def save_table(path, table) -> None:
    """Persist any engine dataclass (ChainingTable, NestedTable, ...)."""
    path = Path(path)
    arrays = {}
    spec = _encode(table, "root", arrays)
    np.savez_compressed(path, **arrays)
    manifest_path = path if path.suffix == ".json" else Path(str(path) + ".json")
    manifest_path.write_text(json.dumps(spec))


def load_table(path, device_put: bool = True):
    """Restore an object saved by :func:`save_table`."""
    path = Path(path)
    npz = path if path.suffix == ".npz" else Path(str(path) + ".npz")
    if not npz.exists():
        npz = path
    spec = json.loads(Path(str(path) + ".json").read_text())
    arrays = np.load(npz)
    return _decode(spec, arrays, device_put)
