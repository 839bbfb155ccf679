"""Device-dtype utilities.

float64 is emulated (slowly) or unsupported on TPU backends, so the device
copies of all pytrees can be demoted to float32/int32 while setup math stays
float64 on the host (Options.transport_dtype == "float32").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exp_clipped(x):
    """exp with a dtype-aware overflow clip (float64: 709, float32: 87)."""
    limit = 709.0 if jnp.result_type(x) == jnp.float64 else 87.0
    return jnp.exp(jnp.minimum(x, limit))


def _demote_one(x):
    if x.dtype == jnp.float64:
        return x.astype(jnp.float32)
    return x.astype(jnp.int32)


@jax.jit
def _demote_batch(xs):
    return [_demote_one(x) for x in xs]


def demote_to_f32(tree):
    """Cast float64 -> float32 and int64 -> int32 across a pytree.

    Host (numpy) leaves cast with numpy; device leaves are batched into ONE
    jitted cast program. On backends where every eager op compiles slowly
    (~0.36s each on the axon tunnel), per-leaf eager astype turned setup into
    minutes — batching makes it one compile per tree structure.
    """
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = list(leaves)
    dev_idx = []
    for i, x in enumerate(leaves):
        if isinstance(x, (np.ndarray, np.generic)):
            if x.dtype == np.float64:
                out[i] = np.asarray(x, dtype=np.float32)
            elif x.dtype == np.int64:
                out[i] = np.asarray(x, dtype=np.int32)
        elif isinstance(x, jax.Array) and x.dtype in (jnp.float64, jnp.int64):
            dev_idx.append(i)
    if dev_idx:
        casted = _demote_batch([leaves[i] for i in dev_idx])
        for i, c in zip(dev_idx, casted):
            out[i] = c
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# Test-mode assertions (the reference's TESTMODE assert_testmodeonly,
# sn3d.h:145-152): zero-cost unless ARTIS_TESTMODE=1 is set at import, in
# which case physics invariants are checked inside jitted code via a host
# callback that raises (surfacing as an XlaRuntimeError at the next sync).
# ---------------------------------------------------------------------------
import os as _os

TESTMODE = _os.environ.get("ARTIS_TESTMODE", "0") == "1"


class TestmodeAssertionError(AssertionError):
    pass


def _raise_if_bad(ok, msg):
    import numpy as _np

    if not bool(_np.all(ok)):
        raise TestmodeAssertionError(
            f"testmode assert failed: {msg} "
            f"({int((~_np.asarray(ok, bool)).sum())} lanes)"
        )


def assert_testmodeonly(cond, msg: str, mask=None):
    """Check a (possibly batched) invariant inside traced code.

    ``cond`` is a boolean array/scalar; lanes where ``mask`` is False are
    exempt (dead/padded lanes). No-op (and fully traced away) unless
    ARTIS_TESTMODE=1 was set when artis_tpu was imported.
    """
    if not TESTMODE:
        return
    ok = cond if mask is None else jnp.logical_or(~mask, cond)
    jax.debug.callback(_raise_if_bad, ok, msg)
