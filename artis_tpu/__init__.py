"""artis_tpu — TPU-native Monte Carlo radiative transfer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the ARTIS
supernova/kilonova MCRT code (reference: /root/reference, sn3d.cc:686).

Design (see SURVEY.md §7): packet transport is a batched struct-of-arrays
wavefront advanced by masked event steps under ``lax.while_loop``; per-cell
plasma solves are ``vmap``-batched over all non-empty cells; estimators are
segment-sums ``psum``-reduced over a device mesh; RNG is counter-based
threefry (bitwise reproducible at any parallelism, improving on the
reference's thread-nondeterminism).

Float64 note: the reference uses double precision throughout its transport
and solver paths, and its checkpoint format stores hex-floats because results
are sensitive to rounding. We therefore enable JAX x64 at import. Hot kernels
may locally downcast where validated.
"""

import os

import jax

# x64 on by default (reference physics is double precision); set ARTIS_X64=0
# BEFORE importing artis_tpu for the all-float32 TPU fast path (TPUs have no
# native f64 — on some backends f64 transfers hang outright).
if os.environ.get("ARTIS_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the transport mega-program costs minutes to
# compile on TPU backends; cache executables across processes (measured:
# 0.43s compile -> 0.011s cache hit on the axon backend). ARTIS_JAX_CACHE=''
# disables; any other value overrides the location.
_cache_dir = os.environ.get(
    "ARTIS_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
# the XLA:CPU AOT cache records machine features that may not match at load
# time (SIGILL risk) — only cache for accelerator backends
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    _cache_dir = ""
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # axon-backend compiles cost ~0.36s even for trivial eager ops (the
    # compile happens server-side); cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from . import constants, options  # noqa: E402

__version__ = "0.1.0"
__all__ = ["constants", "options"]
