"""Gradient capture for debugging.

The reference wires `save_grad` backward hooks into FlowNet2's forward to
inspect intermediate gradients (components/misc.py:81-86,
flownet2.py:110-147). JAX has no mutable hooks; `grad_tap` provides the
same capability functionally: wrap any intermediate value and its
cotangent is stored (by name) into the tap dictionary during the backward
pass via io_callback — usable under jit.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class GradTaps:
    """Collects named intermediate gradients from backward passes."""

    def __init__(self) -> None:
        self.grads: Dict[str, np.ndarray] = {}

    def tap(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        """Identity on the forward pass; stores the incoming cotangent under
        `name` on the backward pass."""

        @jax.custom_vjp
        def _identity(v):
            return v

        def _fwd(v):
            return v, None

        def _bwd(_, g):
            def _store(gv):
                self.grads[name] = np.asarray(gv)
                return np.zeros((), np.int32)

            # io_callback keeps the store ordered within the backward pass
            # and legal under jit.
            jax.experimental.io_callback(
                _store, jax.ShapeDtypeStruct((), jnp.int32), g, ordered=True
            )
            return (g,)

        _identity.defvjp(_fwd, _bwd)
        return _identity(x)
