"""Channel-parallel execution: run one receiver chain over a bank of
independent channels, sharded across a mesh axis.

The reference has no data parallelism at all (SURVEY §2.10 — its only
strategy is one OS process per block).  On TPU, a channel bank is the
natural first parallel axis: every kernel in luaradio_tpu broadcasts over
leading axes, so a bank of C channels is the same program on [C, T] arrays
with the C axis sharded over the mesh — XLA inserts zero collectives
(embarrassingly parallel), and per-channel carried state shards the same
way.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from luaradio_tpu.core.block import SignalBlock


def _broadcast_state(state, n_channels: int):
    """Replicate a block's scalar/vector state along a new channel axis."""
    def bc(leaf):
        leaf = jnp.asarray(leaf)
        return jnp.broadcast_to(leaf, (n_channels,) + leaf.shape)
    return jax.tree.map(bc, state)


class ChannelBank:
    """A chain of SignalBlocks applied to a [n_channels, T] batch.

    ``blocks`` must be differentiated+initialized (prepare via a Graph or
    tests.jig-style preparation).  ``step(states, x)`` is jittable; with a
    mesh, inputs/outputs/state are sharded over ``axis``.
    """

    def __init__(self, blocks: Sequence[SignalBlock], n_channels: int,
                 mesh: Mesh | None = None, axis: str = "channel"):
        self.blocks = list(blocks)
        self.n_channels = n_channels
        self.mesh = mesh
        self.axis = axis
        self.sharding = (NamedSharding(mesh, P(axis)) if mesh is not None
                         else None)

    def init_states(self):
        states = [_broadcast_state(b.init_state(), self.n_channels)
                  for b in self.blocks]
        if self.sharding is not None:
            states = jax.tree.map(
                lambda leaf: jax.device_put(leaf, self.sharding), states)
        return states

    def step(self, states, x):
        """One chunk through the chain: x [C, T] -> y [C, T']."""
        new_states = []
        for b, st in zip(self.blocks, states):
            st, x = jax.vmap(b.process)(st, x)
            new_states.append(st)
        return new_states, x

    def jit_step(self):
        fn = jax.jit(self.step, donate_argnums=(0,))
        if self.sharding is None:
            return fn
        sh = self.sharding

        def wrapped(states, x):
            return fn(states, jax.lax.with_sharding_constraint(x, sh))
        return wrapped


__all__ = ["ChannelBank"]
