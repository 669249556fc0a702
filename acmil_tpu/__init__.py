"""acmil_tpu — a TPU-native whole-slide-image classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of dazhangyu123/ACMIL
(reference layer map in /root/repo/SURVEY.md): the Step1-Step4 pathology
pipeline (WSI tiling, patch-encoder feature extraction, MIL-head training,
attention heatmaps) plus the full MIL aggregator zoo, redesigned TPU-first:

- padded, length-bucketed feature bags (static shapes for XLA),
- flax models with masked softmax / fixed-shape top-k formulations,
- fused Pallas attention-pooling kernels for the hot ops,
- data-parallel training over a ``jax.sharding.Mesh``,
- C++ slide-IO runtime (``csrc/slideio.cpp``) replacing the reference's
  native decoders.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: bag buckets mean a handful of distinct
# compiled programs per config; caching them makes every run after the first
# start instantly (compiles cost 25-70s each through remote-compile tunnels).
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        import jax as _jax

        # segregate by platform: CPU must not pick up AOT artifacts
        # compiled for another machine profile (SIGILL hazard). The CPU
        # cache key additionally fingerprints the host's CPU features —
        # XLA:CPU AOT results embed host code, and on VM fleets the host
        # profile can change between boots; loading a mismatched entry
        # SIGABRTs (cpu_aot_loader: "machine type ... doesn't match").
        # Every platform dir gets the fingerprint: tests start under
        # JAX_PLATFORMS=axon and switch to cpu post-import, so CPU AOT
        # entries can land in any platform's dir.
        _plat = (_os.environ.get("JAX_PLATFORMS") or "default").split(",")[0]
        _suffix = _plat
        import hashlib as _hashlib

        _id = ""
        try:
            # primary identity: CPUID executed in-process (csrc
            # sio_cpu_identity) — /proc/cpuinfo is a boot-time snapshot
            # that survives VM live-migrations unchanged while LLVM
            # re-detects features via CPUID, so cpuinfo alone cannot
            # segregate incompatible XLA:CPU AOT entries (SIGILL/SIGABRT
            # hazard, observed r4/r5). Load-only: never BUILDS the lib at
            # import (wsi.native owns rebuilds).
            import ctypes as _C
            _so = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                "csrc", "libslideio.so")
            if _os.path.exists(_so):
                _lib = _C.CDLL(_so)
                _buf = _C.create_string_buffer(512)
                if _lib.sio_cpu_identity(_buf, 512) > 0:
                    _id += _buf.value.decode("ascii", "ignore")
        except Exception:
            pass
        try:
            # plus the first cpuinfo stanza (minus per-boot noise) —
            # architecture-agnostic fallback (ARM has 'CPU part'/
            # 'Features' instead of x86's keys) and a second signal on
            # hosts where the .so is absent or stale
            _volatile = ("cpu mhz", "bogomips")
            with open("/proc/cpuinfo") as _f:
                for _l in _f:
                    if _l.strip() == "":
                        break  # first core only — all cores identical
                    if not _l.lower().startswith(_volatile):
                        _id += _l
        except OSError:
            pass
        if _id:
            _suffix += "-" + _hashlib.sha1(_id.encode()).hexdigest()[:8]
        _cache = _os.path.join(_os.path.expanduser("~"), ".cache",
                               "acmil_tpu", f"xla-{_suffix}")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # read-only FS or pre-initialised config: run without the cache
