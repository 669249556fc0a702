"""Shim: the reference imports the pip `nystrom_attention` package but
also VENDORS an identical copy at `architecture/nystrom_attention.py`
(used by tests/test_reference_parity.py the same way) — re-export it."""
from architecture.nystrom_attention import NystromAttention  # noqa: F401
