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


def demote_to_f32(tree):
    """Cast float64 -> float32 and int64 -> int32 across a pytree."""

    def cast(x):
        if hasattr(x, "dtype"):
            if x.dtype == jnp.float64:
                return x.astype(jnp.float32)
            if x.dtype == jnp.int64:
                return x.astype(jnp.int32)
        return x

    return jax.tree_util.tree_map(cast, tree)
