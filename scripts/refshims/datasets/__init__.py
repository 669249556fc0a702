"""Path-bridge to the reference's datasets/ directory (which has
no __init__.py, so an installed same-named package would shadow
it as a namespace package)."""
__path__ = ["/root/reference/datasets"]
