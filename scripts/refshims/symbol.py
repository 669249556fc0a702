"""`symbol` stdlib-module shim (removed in Python 3.10).

The reference's `IBMIL_clustering.py:3` carries a stray
``from symbol import testlist_star_expr`` (an auto-import artifact);
the name is never used. Provide it so the script imports on 3.12.
"""

testlist_star_expr = None
