"""Auto-imported when scripts/refshims leads PYTHONPATH (the
head-to-head reference subprocess).

The reference hardcodes ``.cuda()`` on TransMIL's cls token
(`architecture/transMIL.py:71`) even when running on CPU; neutralize it
exactly the way tests/test_reference_parity.py does via monkeypatch."""
try:
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # noqa: E731
except Exception:  # torch missing/broken — irrelevant for non-torch runs
    pass
