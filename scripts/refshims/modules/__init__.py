"""Path-bridge to the reference's modules/ directory (which has
no __init__.py, so an installed same-named package would shadow
it as a namespace package).

Two files the reference's own imports expect are MISSING upstream
(latent ImportErrors, SURVEY §2.3): `modules/transmil.py` (imported by
`Step3_WSI_classification_MHIM.py:16`) and `modules/topk/svm.py`
(imported by `modules/clam.py:5`). Seed raise-on-use stubs so the
feature-bag MHIM path — which never constructs either — imports
cleanly; anything that actually touches them fails loudly."""
import sys
import types

__path__ = ["/root/reference/modules"]


def _stub_module(name: str, cls_name: str, why: str):
    """Constructible (modules/clam.py evaluates ``SmoothTop1SVM(2)`` in a
    class-default argument at import time), raises on any actual use."""
    mod = types.ModuleType(name)

    def _raise(self, *a, **k):
        raise NotImplementedError(why)

    setattr(mod, cls_name, type(cls_name, (), {
        "__init__": lambda self, *a, **k: None,
        "cuda": lambda self, *a, **k: self,
        "to": lambda self, *a, **k: self,
        "__call__": _raise,
        "forward": _raise,
    }))
    sys.modules.setdefault(name, mod)


_stub_module("modules.transmil", "TransMIL",
             "modules/transmil.py is absent from the reference repo")
_stub_module("modules.topk.svm", "SmoothTop1SVM",
             "modules/topk/svm.py is absent from the reference repo")
