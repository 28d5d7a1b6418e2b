"""Persistent XLA compilation cache setup, keyed by host CPU features.

First-compile dominates short CLI/bench runs (tens of seconds per program);
cached programs load in milliseconds on later runs.  But the cache directory
may be shared across heterogeneous machines (network home dirs, container
images reused on different hosts): XLA:CPU serializes ahead-of-time compiled
code specialized to the *compiling* host's SIMD features (AVX-512, AMX...),
and loading such an artifact on a host lacking those features logs
``cpu_aot_loader`` machine-mismatch errors and can SIGILL.  To make reuse
safe the cache directory name embeds a hash of this host's CPU feature set:
each distinct microarchitecture gets its own cache, eliminating
cross-machine AOT reuse while still amortizing compiles on any one host.

Replaces the unconditional shared-dir setup previously duplicated in
cli.py, bench.py and __graft_entry__.py.
"""
from __future__ import annotations

import hashlib
import os
import platform


def host_feature_tag() -> str:
    """Short stable tag for this host's CPU feature set.

    Hashes the flags/Features lines of /proc/cpuinfo (plus the machine
    architecture) so hosts that differ in SIMD capability map to different
    cache directories.  Falls back to the bare architecture string when
    /proc/cpuinfo is unavailable (e.g. non-Linux).
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip().lower()
                if key in ("flags", "features"):
                    feats = line.split(":", 1)[1].strip()
                    break  # identical for every core; first one suffices
    except OSError:
        pass
    digest = hashlib.sha256(
        (platform.machine() + "|" + feats).encode()
    ).hexdigest()[:12]
    return digest


def _repo_cache_dir(tag: str) -> str | None:
    """Committed in-repo cache for this host tag, if one exists.

    The benchmark host's HOME is wiped whenever its VM is recreated, but the
    repo checkout persists — so a cache primed into HOME never survives to
    the next cold start (round 4 paid ~18 min of first compiles for exactly
    this reason).  A cache directory committed into the repo does survive.
    Opt-in by existence: we only redirect when the tagged directory is
    already present, so ordinary checkouts keep using HOME and a
    foreign-host checkout (different CPU tag) safely ignores it.
    """
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cand = os.path.join(repo_root, ".xla_cache-" + tag)
    return cand if os.path.isdir(cand) else None


def enable_persistent_cache(logger=None) -> str | None:
    """Point JAX at a host-keyed persistent compilation cache directory.

    Honors ``V2E_COMPILATION_CACHE``: set to a directory to override the
    base location, or to the empty string to disable caching entirely.
    Returns the directory used (None when disabled or unsupported).
    """
    tag = host_feature_tag()
    base = os.environ.get(
        "V2E_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "v2e_tpu_xla"),
    )
    if not base:
        return None
    cache_dir = base + "-" + tag
    if "V2E_COMPILATION_CACHE" not in os.environ:
        cache_dir = _repo_cache_dir(tag) or cache_dir
    import jax

    if (
        jax.default_backend() == "cpu"
        and "V2E_COMPILATION_CACHE" not in os.environ
    ):
        # XLA:CPU persists ahead-of-time machine code, and its loader flags
        # a feature mismatch on EVERY reuse (the compile-side feature list
        # carries pseudo-features like +prefer-no-scatter that host
        # detection never reports), drowning stderr in spurious
        # could-SIGILL errors.  CPU runs (tests, dryruns) recompile cheaply;
        # the cache's real value is the TPU path, where executables are
        # device code and host ISA is irrelevant.  Opt back in explicitly
        # with V2E_COMPILATION_CACHE=<dir>.
        return None

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # unknown option on old jax: run uncached
        if logger is not None:
            logger.debug(f"compilation cache unavailable: {e}")
        return None
    return cache_dir
