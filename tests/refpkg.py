"""Loader for the LITERAL reference package (/root/reference/package/whisper-at).

The differential tests (test_reference_differential.py) verify this framework
against the reference implementation itself — not against our re-derived
oracles. The reference is imported under the module name ``ref_whisper_at``
so it cannot collide with this repo's ``whisper_at`` compatibility shim, and
``numba`` (not installed here) is stubbed with a no-op ``jit`` — its only use
in the reference is the @numba.jit decorators on the pure-Python DTW
fallback (reference timing.py:57-105), which runs fine un-jitted at test
sizes.

This module only READS the reference tree; nothing is executed at import
time beyond the reference package's own module-level code.
"""

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference/package/whisper-at"
REF_PKG = os.path.join(REF_ROOT, "whisper_at")

_cached = None


def _stub_numba():
    if "numba" in sys.modules:
        return
    fake = types.ModuleType("numba")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(f):
            return f

        return deco

    fake.jit = jit
    sys.modules["numba"] = fake


def load_reference():
    """Import the reference package as ``ref_whisper_at`` (cached).

    Caches through ``sys.modules``, not only the module-global: this file
    gets loaded under more than one module name (``refpkg`` by the tests,
    a private spec by tools/validate_real_checkpoint.py), and each
    instance has its own ``_cached``. If a second instance re-executed the
    reference ``__init__`` while ``ref_whisper_at.*`` submodules were
    already in ``sys.modules``, the fresh parent module would never get
    its submodule attributes bound (``from .audio import ...`` falls back
    to the sys.modules entry without a setattr) — observed as
    ``ref_whisper_at has no attribute 'audio'`` in suite-order runs.
    """
    global _cached
    if _cached is not None:
        return _cached
    existing = sys.modules.get("ref_whisper_at")
    if existing is not None:
        try:
            same = os.path.samefile(
                os.path.dirname(existing.__file__), REF_PKG)
        except OSError:
            same = False
        if same:
            _cached = existing
            return existing
        # a different checkout was loaded: drop it (and its submodules) so
        # the re-exec below binds everything freshly
        for k in [k for k in sys.modules
                  if k == "ref_whisper_at" or k.startswith("ref_whisper_at.")]:
            del sys.modules[k]
    _stub_numba()
    spec = importlib.util.spec_from_file_location(
        "ref_whisper_at",
        os.path.join(REF_PKG, "__init__.py"),
        submodule_search_locations=[REF_PKG],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_whisper_at"] = mod
    spec.loader.exec_module(mod)
    _cached = mod
    return mod


def reference_available() -> bool:
    return os.path.isdir(REF_PKG)


def build_reference_model(dims_dict: dict, state_dict: dict,
                          at_low_compute: bool = False):
    """Construct the reference ``Whisper`` (fp32, CPU) and load our exported
    state dict strictly — the same merge contract as reference
    __init__.py:187-191."""
    import torch

    ref = load_reference()
    model_mod = sys.modules["ref_whisper_at.model"]
    dims = model_mod.ModelDimensions(**dims_dict)
    model = model_mod.Whisper(dims, at_low_compute=at_low_compute)
    tensors = {k: torch.as_tensor(v) for k, v in state_dict.items()}
    model.load_state_dict(tensors, strict=True)
    model.eval()
    return model
