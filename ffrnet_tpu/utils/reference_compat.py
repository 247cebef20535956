"""Import shims for the upstream PyTorch reference checkout.

The reference modules import torchvision at module scope but the code paths
we exercise (golden-value generation, baseline measurement) never touch it;
`install_reference_stubs()` satisfies those imports with empty modules and
puts the reference root on sys.path. Used by tests, bench.py and
tools/parity_check.py — keep the stub list in ONE place here.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUB_MODULES = (
    "torchvision",
    "torchvision.transforms",
    "torchvision.transforms.functional",
    # lfw/lfw_eval.py imports skimage.transform at module scope but only
    # uses it inside the dead LFWData class (SURVEY.md §2.2)
    "skimage",
    "skimage.transform",
)


def install_reference_stubs(reference_root: str = REFERENCE_ROOT) -> bool:
    """Stub optional deps + add the reference to sys.path.

    Returns False when the reference checkout is absent.
    """
    if not os.path.isdir(reference_root):
        return False
    for name in _STUB_MODULES:
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    return True
