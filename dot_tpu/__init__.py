"""dot_tpu — a TPU-native implicit elastodynamics framework.

Re-implements the capabilities of the DOT reference code (Decomposed
Optimization Time integration, SIGGRAPH 2019; reference C++ at
penn-graphics-research/DOT) as an idiomatic JAX/XLA/Pallas framework:

- per-element energy/gradient/Hessian as batched kernels over all tets
  (reference: TBB + AVX2, src/Energy/Energy.cpp),
- subdomain-decomposed quasi-Newton (DOT) with batched dense Cholesky
  initializers on the MXU (reference: CHOLMOD per subdomain,
  src/TimeStepper/DOTTimeStepper.cpp),
- the whole inner solve jitted with `lax.while_loop` (no host round trips).

float64 is enabled at import so CPU tests can run at reference precision;
simulation dtype is chosen per-run (f32 on TPU by default).
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: step programs take 30s+ to compile through
# the remote-compile service; cache them across processes. The directory
# is keyed by the host CPU's feature flags: XLA:CPU cache entries are AOT
# machine code, and loading an entry compiled on a host with different
# features (containers migrate across heterogeneous nodes) SIGILLs the
# process mid-suite — the cache key JAX uses does not include the machine
# type, so segregate by host instead.


def _host_fingerprint():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


_cache = _os.environ.get("DOT_TPU_JAX_CACHE",
                         _os.path.expanduser("~/.cache/dot_tpu_jax"))
_cache = _os.path.join(_cache, _host_fingerprint())
try:
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs
    pass


def _patch_atomic_cache_writes():
    """Make persistent-cache entry writes atomic (temp file + rename).

    jax's LRUCache.put is a bare Path.write_bytes with no lock when
    eviction is disabled: a concurrent process (or a reader racing a
    writer that later gets SIGKILLed) can observe a partially-written
    entry, and a garbage entry reaching deserialize_executable crashes
    the process outright. put() also early-returns when the path
    exists, so a truncated file left by a killed writer is never
    repaired. os.replace on the same filesystem makes publication
    atomic: readers see either nothing or the full entry.
    """
    try:
        from jax._src import lru_cache as _lru
    except Exception:
        return
    _orig_put = _lru.LRUCache.put

    def _put(self, key, val):
        if not key:
            raise ValueError("key cannot be empty")
        try:
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if getattr(self, "eviction_enabled", False):
                return _orig_put(self, key, val)  # locked path: safe
            if cache_path.exists():
                return
            tmp = cache_path.with_suffix(f".{_os.getpid()}.tmp")
            try:
                tmp.write_bytes(val)
                _os.replace(tmp, cache_path)
            except OSError:
                try:
                    tmp.unlink()
                except OSError:
                    pass
        except Exception:
            # private jax internals moved under us (renamed attribute,
            # changed layout): degrade to the stock behavior instead of
            # failing every compilation (ADVICE r4)
            return _orig_put(self, key, val)

    _lru.LRUCache.put = _put


_patch_atomic_cache_writes()

from . import materials  # noqa: E402,F401
from .config import Config  # noqa: E402,F401
from .mesh import Mesh  # noqa: E402,F401

__version__ = "0.1.0"
