"""Auto-imported when scripts/refshims leads PYTHONPATH (the
head-to-head reference subprocess).

The reference hardcodes ``.cuda()`` on TransMIL's cls token
(`architecture/transMIL.py:71`) even when running on CPU; neutralize it
exactly the way tests/test_reference_parity.py does via monkeypatch."""
try:
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # noqa: E731

    # The reference targets torch 2.0 (`requirements.txt:31`) where
    # torch.load defaulted to weights_only=False; torch>=2.6 flips the
    # default and then rejects the reference's OWN checkpoints (its
    # save_model pickles a utils.utils.Struct config,
    # `utils/utils.py:415-422`), breaking the MHIM teacher_init reload
    # (`Step3_MHIM:344`). Restore the reference-era default — these are
    # trusted files the head-to-head itself just wrote.
    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load
except Exception:  # torch missing/broken — irrelevant for non-torch runs
    pass
