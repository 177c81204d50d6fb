"""Golden-vector block test jig.

The analog of the reference's jig (/root/reference/tests/jigs.lua:55-256),
which runs every test vector two ways: one whole-vector process() call, and
sample-by-sample feeding with outputs concatenated — enforcing that carried
streaming state is correct across arbitrary chunk boundaries.

Here the chunk-boundary test feeds the block in uneven splits (aligned to the
block's chunk_multiple) and requires bitwise-consistent output with the
whole-vector run and with the golden vector within the type epsilon.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.core.block import HostBlock, SignalBlock, SignalSourceBlock
from luaradio_tpu.types import SampleType

#: LUARADIO_TPU_JIG_TIME_SHARD=N runs every device-block process() call in
#: the jig through process_sharded on an N-device virtual ("time",) mesh —
#: the acceleration-matrix lane's way of sweeping ALL golden vectors
#: through the time-sharding implementations (reference analog: the whole
#: busted suite under every backend combo, tests.yml:96-105).  Blocks or
#: vectors that cannot shard (unsupported block, length not divisible,
#: carried tail exceeding the shard) fall back to the plain path.
_JIG_TIME_SHARD = int(os.environ.get("LUARADIO_TPU_JIG_TIME_SHARD", "0")
                      or 0)


def _sharded_process(block, state, xs):
    """One chunk through block.process_sharded under a virtual time mesh."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    import inspect

    d = _JIG_TIME_SHARD
    mesh = Mesh(np.array(jax.devices()[:d]), ("t",))

    def fn(s, *xa):
        return block.process_sharded(s, *xa, axis_name="t")

    st_spec = jax.tree.map(lambda _: P(), state)
    x_specs = tuple(P(*([None] * (np.ndim(x) - 1)), "t") for x in xs)
    # output structure/shapes from the PLAIN process (identical tree);
    # fn itself cannot be shape-traced outside shard_map (unbound axis)
    st_sh, ys_sh = jax.eval_shape(block.process, state, *xs)
    out_specs = (jax.tree.map(lambda _: P(), st_sh),
                 jax.tree.map(lambda l: P(*([None] * (l.ndim - 1)), "t"),
                              ys_sh))
    kw = {}
    params = inspect.signature(shard_map).parameters
    if "check_rep" in params:
        kw["check_rep"] = False
    elif "check_vma" in params:
        kw["check_vma"] = False
    f = shard_map(fn, mesh=mesh, in_specs=(st_spec,) + x_specs,
                  out_specs=out_specs, **kw)
    return f(state, *xs)


def _dtype_to_type(arr):
    from luaradio_tpu import types as t
    d = np.asarray(arr).dtype
    if d == np.complex64 or d == np.complex128:
        return t.ComplexFloat32
    if d == np.float32 or d == np.float64:
        return t.Float32
    if d == np.uint8:
        return t.Byte
    raise ValueError(f"cannot infer SampleType for dtype {d}")


def prepare_block(block, input_types, rate: float = 2.0):
    """Differentiate + rate + initialize (reference jig does the same with a
    monkey-patched get_rate()=2.0, jigs.lua:69)."""
    block.differentiate(list(input_types))
    block.input_rate = rate
    if block.inputs == [] and getattr(block, "rate", None) is None:
        block.rate = rate
    block.initialize()
    return block


def run_block(block, inputs, splits=None):
    """Run a prepared block over input arrays, optionally split into chunks.

    Returns a list of per-port output numpy arrays (masked outputs are
    compacted; host-block outputs concatenated).
    """
    n_out = len(block.outputs)
    if isinstance(block, HostBlock):
        outs = [[] for _ in range(n_out)]
        arrs = [np.asarray(a) for a in inputs]
        n = len(arrs[0]) if arrs else 0
        bounds = _bounds(n, splits, 1)
        for a, b in bounds:
            ys = block.process(*[x[a:b] for x in arrs])
            if ys is None:
                continue
            if not isinstance(ys, tuple):
                ys = (ys,)
            for i, y in enumerate(ys):
                outs[i].append(np.asarray(y))
        return [np.concatenate(o) if o else np.zeros(0) for o in outs]

    state = block.init_state()
    arrs = [jnp.asarray(a) for a in inputs]
    n = arrs[0].shape[-1] if arrs else 0
    cm = block.chunk_multiple()
    d = _JIG_TIME_SHARD
    # Under the time-shard lane, split points are aligned so EVERY chunk
    # can run sharded — each per-shard slice must satisfy the block's
    # chunk-multiple (the graph planner provides the same guarantee:
    # composite.py multiplies every constraint by the shard count).  The
    # split passes then compose shard boundaries WITH uneven chunk
    # boundaries, the sharded analog of the reference's sample-by-sample
    # jig (/root/reference/tests/jigs.lua:213-250).
    bounds = _bounds(n, splits, cm * d if d > 1 else cm)
    outs = [[] for _ in range(n_out)]
    masks = [] if getattr(block, "masked_output", False) else None
    for a, b in bounds:
        chunk_xs = [x[..., a:b] for x in arrs]
        ln = b - a
        if d > 1 and ln % d == 0 and ln >= d and (ln // d) % cm == 0:
            try:
                state, ys = _sharded_process(block, state, chunk_xs)
            except (NotImplementedError, ValueError, AssertionError,
                    TypeError, ZeroDivisionError):
                state, ys = block.process(state, *chunk_xs)
        else:
            state, ys = block.process(state, *chunk_xs)
        if masks is not None:
            vals, mask = ys
            outs[0].append(np.asarray(vals))
            masks.append(np.asarray(mask))
            continue
        if n_out == 1 and not isinstance(ys, (tuple, list)):
            ys = (ys,)
        for i, y in enumerate(ys):
            outs[i].append(np.asarray(y))
    if masks is not None:
        if not masks:
            return [np.zeros(0)]
        vals = np.concatenate(outs[0], axis=-1)
        mask = np.concatenate(masks, axis=-1).astype(bool)
        return [vals[..., mask]]
    return [np.concatenate(o, axis=-1) if o else np.zeros(0) for o in outs]


def run_source(block, n: int, chunk: int = 1024):
    """Collect n samples from a device source (reference jig sources path,
    jigs.lua:151-187)."""
    state = block.init_state()
    outs = []
    got = 0
    while got < n:
        state, y = block.generate(state, chunk)
        outs.append(np.asarray(y))
        got += chunk
    return np.concatenate(outs, axis=-1)[..., :n]


def _bounds(n, splits, multiple):
    if splits is None:
        return [(0, n)]
    if isinstance(splits, int):
        # `splits` even-ish chunks aligned to `multiple`
        per = max(multiple, ((n // splits) // multiple) * multiple)
        pts = list(range(0, n, per))
    else:
        pts = [0] + [min(n, ((p + multiple - 1) // multiple) * multiple)
                     for p in splits]
        pts = sorted(set(p for p in pts if p < n))
    bounds = [(a, b) for a, b in zip(pts, pts[1:] + [n]) if b > a]
    return bounds


def assert_equal(out_type: SampleType, actual, expected,
                 epsilon: float | None = None, msg: str = ""):
    actual = np.asarray(actual)
    expected = np.asarray(expected)
    assert actual.shape == expected.shape, (
        f"{msg}: shape {actual.shape} != expected {expected.shape}")
    eps = out_type.epsilon if epsilon is None else epsilon
    if np.issubdtype(expected.dtype, np.integer):
        mismatches = np.flatnonzero(actual != expected)
        assert mismatches.size == 0, (
            f"{msg}: {mismatches.size} integer mismatches, first at "
            f"{mismatches[:5]}")
    else:
        err = np.abs(actual.astype(np.complex128)
                     - expected.astype(np.complex128))
        worst = float(err.max()) if err.size else 0.0
        assert worst <= eps, f"{msg}: max abs error {worst:.3e} > {eps:.3e}"


def check_block(block_factory, inputs, expected_outputs, input_types=None,
                rate: float = 2.0, epsilon: float | None = None,
                splits=(17, 64, 100, 1000)):
    """Full jig: whole-vector run and chunk-split run must both match the
    golden outputs within epsilon."""
    inputs = [np.asarray(a) for a in inputs]
    if input_types is None:
        input_types = [_dtype_to_type(a) for a in inputs]

    block = block_factory()
    prepare_block(block, input_types, rate)
    whole = run_block(block, inputs)
    for i, exp in enumerate(expected_outputs):
        assert_equal(block.output_types[i], whole[i], exp, epsilon,
                     msg=f"{block.name} whole-vector out[{i}]")

    block2 = block_factory()
    prepare_block(block2, input_types, rate)
    split = run_block(block2, inputs, splits=splits)
    for i, exp in enumerate(expected_outputs):
        assert_equal(block2.output_types[i], split[i], exp, epsilon,
                     msg=f"{block2.name} chunk-split out[{i}]")
