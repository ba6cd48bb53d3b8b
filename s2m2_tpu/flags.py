"""Central registry for measured-experiment toggles (env flags).

Round 4 grew eleven module-level flag globals across five modules, and a
cross-test flag leak (fixed in d93a70d) showed the pattern is a correctness
liability: several flags carry "must not change between calibration and
inference" contracts enforced only by docstring, and nothing could
snapshot/restore them wholesale. This module is now the ONE place flag
state lives:

  * every flag is `define_*`d here by its owning module at import time
    (env parsing happens in exactly one code path);
  * reads go through `get(name)` at TRACE time (the legacy `set_*`
    functions on each module remain as thin wrappers, so existing
    scripts/tests keep working);
  * `snapshot()` / `restore()` capture and roll back the WHOLE registry —
    tests/conftest.py wraps every test in them (autouse), making the
    d93a70d leak class structurally impossible;
  * `describe()` enumerates flags with their env var, default, and
    calibration-contract marking for tooling.

The reference has no flag system at all (SURVEY §5.6 — per-script argparse
only); this subsystem exists because the repo's convention is to keep every
measured losing experiment reachable behind a flag.
"""
from __future__ import annotations

import os
import threading

_lock = threading.Lock()
_DEFS = {}    # name -> {"env": str|None, "default": bool, "doc": str,
              #          "calib_contract": bool}
_VALUES = {}  # name -> bool


def define_env_bool(name, env, default="0", doc="", calib_contract=False):
    """Register a boolean flag parsed from `env` ("1" == True). Idempotent
    per name (re-imports keep the current value)."""
    with _lock:
        if name in _DEFS:
            return _VALUES[name]
        val = os.environ.get(env, default) == "1"
        _DEFS[name] = {"env": env, "default": default == "1", "doc": doc,
                       "calib_contract": calib_contract}
        _VALUES[name] = val
        return val


def define_value(name, value, env=None, doc="", calib_contract=False):
    """Register a flag whose initial value the owning module computed itself
    (e.g. the S2M2_PALLAS_ATTN enum feeding two booleans)."""
    with _lock:
        if name in _DEFS:
            return _VALUES[name]
        _DEFS[name] = {"env": env, "default": bool(value), "doc": doc,
                       "calib_contract": calib_contract}
        _VALUES[name] = bool(value)
        return bool(value)


def get(name) -> bool:
    return _VALUES[name]


def set_flag(name, value):
    if name not in _DEFS:
        raise KeyError(f"unknown flag {name!r} — define it in its owning "
                       f"module first (known: {sorted(_DEFS)})")
    _VALUES[name] = bool(value)


def names():
    return sorted(_DEFS)


def snapshot() -> dict:
    return dict(_VALUES)


def restore(snap: dict):
    """Restore a snapshot(); flags defined after the snapshot keep their
    current value (they did not exist to be captured)."""
    for k, v in snap.items():
        if k in _VALUES:
            _VALUES[k] = v


def describe():
    """[(name, env, value, default, calib_contract, doc)] for tooling."""
    return [(n, _DEFS[n]["env"], _VALUES[n], _DEFS[n]["default"],
             _DEFS[n]["calib_contract"], _DEFS[n]["doc"])
            for n in names()]
