"""wandb shim: offline no-op logger; run.dir comes from $WANDB_SHIM_DIR."""
import os
import tempfile
import types

run = None


def init(*args, **kwargs):
    global run
    d = os.environ.get("WANDB_SHIM_DIR") or tempfile.mkdtemp(prefix="wandb_shim_")
    os.makedirs(d, exist_ok=True)
    run = types.SimpleNamespace(dir=d)
    return run


def log(*args, **kwargs):
    pass


def finish(*args, **kwargs):
    pass
