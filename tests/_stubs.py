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
    """Provide ``torchvision`` and ``torchvision.transforms`` names."""
    tv = sys.modules.setdefault("torchvision",
                                types.ModuleType("torchvision"))
    if not hasattr(tv, "transforms"):
        tv.transforms = types.ModuleType("torchvision.transforms")
    return tv
