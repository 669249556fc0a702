"""Shared sys.modules stubs for driving the reference's torch modules.

Several reference files import packages that are absent on this image
and unused on the code paths under test (torchvision via utils/utils.py,
the bare torchvision import in dsmil.py). Tests stub them through these
helpers so each parity/round-trip test passes in ANY collection order —
previously two copies of this logic lived in test_reference_parity.py
and test_import_roundtrip_zoo.py (code-review r5).
"""

import sys
import types


def stub_torchvision():
    """Provide ``torchvision`` plus the ``transforms``/``models``
    submodules reference files import (`utils/utils.py:9`,
    `architecture/attmil.py:4` — neither is used on tested paths).
    Submodules register in sys.modules too: a bare parent stub left by
    an earlier test would otherwise break ``import torchvision.models``
    (full-suite ordering, r5)."""
    tv = sys.modules.setdefault("torchvision",
                                types.ModuleType("torchvision"))
    for sub in ("transforms", "models"):
        name = f"torchvision.{sub}"
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        if not hasattr(tv, sub):
            setattr(tv, sub, mod)
    return tv
