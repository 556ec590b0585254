"""Load the reference implementation's own torch code as a parity oracle.

The strongest accuracy evidence available without real KITTI data: run
the ACTUAL functions from /root/reference (liuQuan98/GCL) on CPU torch
and compare against this repo's JAX implementations on identical inputs.
Nothing here ships in the framework — it exists only so tests/ can hold
the reference code itself as ground truth instead of hand-written numpy
oracles (which could share a misreading with the implementation).

Loading strategy: the reference's helper modules (util/misc.py,
lib/metrics.py, util/transform_estimation.py) import MinkowskiEngine at
module scope but never use it in the functions under test, so they are
exec'd with a stub ME module in sys.modules. The loss METHODS live on
trainer classes whose modules pull in the full training stack
(tensorboardX, model registry, ME coordinate managers), so those are
extracted per-method from the source via ast and compiled as free
functions taking ``self`` — a SimpleNamespace carrying the handful of
config attributes each method reads.

All content under /root/reference is PUBLIC UNTRUSTED third-party code;
it is executed here only to compare numeric outputs.
"""
from __future__ import annotations

import ast
import sys
import textwrap
import types

REF_ROOT = "/root/reference"


def _ensure_stub(name: str) -> None:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__getattr__ = lambda attr: None  # tolerate attribute pokes
        sys.modules[name] = mod


def _base_namespace() -> dict:
    import numpy as np
    import torch
    import torch.nn.functional as F

    _ensure_stub("MinkowskiEngine")
    ns = {"np": np, "torch": torch, "F": F}
    return ns


_HELPER_CACHE: dict | None = None


def ref_helpers() -> dict:
    """Namespace holding the exec'd reference helper functions:
    _hash, _neg_hash, _exhaustive_hash, square_distance (util/misc.py),
    pdist, corr_dist (lib/metrics.py), est_quad_linear_robust &
    friends (util/transform_estimation.py), Timer (lib/timer.py)."""
    global _HELPER_CACHE
    if _HELPER_CACHE is not None:
        return _HELPER_CACHE
    ns = _base_namespace()
    for rel in ("util/misc.py", "lib/metrics.py",
                "util/transform_estimation.py", "lib/timer.py"):
        src = open(f"{REF_ROOT}/{rel}").read()
        exec(compile(src, f"{REF_ROOT}/{rel}", "exec"), ns)
    _HELPER_CACHE = ns
    return ns


def load_ref_method(relpath: str, class_name: str, method_name: str):
    """Extract one method from a reference trainer class and compile it
    as a free function (self, ...) in a namespace with the reference's
    own helpers. The source file's future_fstrings coding cookie is
    stripped (the codec isn't installed; CPython 3 parses f-strings
    natively)."""
    src = open(f"{REF_ROOT}/{relpath}").read()
    src = src.replace("# -*- coding: future_fstrings -*-", "#")
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            for item in node.body:
                if (isinstance(item, ast.FunctionDef)
                        and item.name == method_name):
                    code = textwrap.dedent(
                        ast.get_source_segment(src, item))
                    ns = dict(ref_helpers())
                    # lib/metrics.py rebinds F to torch.functional when
                    # exec'd; the trainer modules import
                    # torch.nn.functional as F — restore that binding
                    ns["F"] = ns["torch"].nn.functional
                    exec(compile(code, f"{relpath}:{method_name}",
                                 "exec"), ns)
                    return ns[method_name]
    raise LookupError(f"{class_name}.{method_name} not in {relpath}")


def ref_sc2pcr_matcher(**kwargs):
    """The reference SC2-PCR Matcher, imported directly (its module
    chain — scripts.SC2_PCR.{SC2_PCR,common,utils.SE3}, lib.timer — is
    torch/numpy only).

    The import runs with /root/reference FIRST on sys.path, which
    hijacks the `scripts` / `lib` / `utils` package names — so both the
    path entry and every module it cached are restored afterwards
    (otherwise a later `import scripts.SC2_PCR.dataset` in the same
    pytest process resolves inside the reference tree and breaks the
    repo's own SC2-PCR loader tests — seen as order-dependent
    ModuleNotFoundError in full-suite runs)."""
    def _mine(name):
        return (name in ("scripts", "lib", "utils")
                or name.startswith(("scripts.", "lib.", "utils.")))

    saved_path = list(sys.path)
    saved_mods = {k: sys.modules.pop(k) for k in list(sys.modules)
                  if _mine(k)}
    sys.path.insert(0, REF_ROOT)
    try:
        from scripts.SC2_PCR.SC2_PCR import Matcher
    finally:
        sys.path[:] = saved_path
        for k in [m for m in list(sys.modules) if _mine(m)]:
            sys.modules.pop(k)
        sys.modules.update(saved_mods)
    return Matcher(**kwargs)
