"""Shared ADDITIVE module stubbing for the reference torch-oracle tests.

Several oracle test files stub overlapping third-party modules (timm,
fairscale, lavis.*, omegaconf) before loading reference sources read-only.
Because pytest runs every file in one process, the stubs must be additive:
a later file must be able to extend a module an earlier file registered
(e.g. add `drop_path` to a timm.models.layers stub that only carried
`trunc_normal_`), never be silently blocked by it.
"""

import importlib.machinery
import importlib.util
import sys
import types


def stub_module(name, **attrs):
    """Get-or-create the stub module and add any MISSING attributes."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    for key, value in attrs.items():
        if not hasattr(mod, key):
            setattr(mod, key, value)
    return mod


def load_by_path(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
