"""Block model.

The reference's block base class (/root/reference/radio/core/block.lua:238-485)
provides: multiple *type signatures* per block, differentiation (choosing the
signature that matches the connected input types and binding the matching
process/initialize variants), sample-rate propagation, and the
instantiate/initialize/process/cleanup lifecycle.

TPU-native redesign: a block is a *pure function over chunks*.  Device blocks
("SignalBlock") expose

    init_state() -> pytree
    process(state, *xs) -> (state', ys)

where xs/ys are JAX arrays whose **last axis is time** (leading axes are
broadcast batch/channel dims, which is how the channel-parallel sharding in
luaradio_tpu.parallel works).  The flow-graph compiler fuses consecutive
device blocks into one jitted XLA program, so "a block" costs nothing at
runtime — XLA fuses the elementwise ones away entirely.  Host blocks
(sources, sinks, protocol framers) run eagerly on numpy arrays / objects
between fused device segments.

There is no per-block process or socket: the reference's fork-per-block +
socketpair transport (/root/reference/radio/core/composite.lua:568-636,
/root/reference/radio/core/pipe.lua:59-65) is replaced by XLA program fusion
on-device and a host chunk pump at the graph boundary.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Any, Callable, Sequence

from luaradio_tpu.types import SampleType


class Input:
    """Input port descriptor.

    ``accepted`` is a SampleType, a tuple of SampleTypes, or a predicate
    ``f(SampleType) -> bool`` (the reference supports predicate signatures,
    e.g. JSONSink accepts any type with to_json —
    /root/reference/radio/blocks/sinks/json.lua).
    """

    def __init__(self, name: str, accepted):
        self.name = name
        self.accepted = accepted

    def matches(self, t: SampleType) -> bool:
        acc = self.accepted
        if callable(acc) and not isinstance(acc, SampleType):
            return bool(acc(t))
        if isinstance(acc, (tuple, list, set)):
            return t in acc
        return t == acc

    def __repr__(self):
        return f"Input({self.name!r})"


class Output:
    """Output port descriptor.

    ``type`` may be a SampleType or a function of the matched input types
    (for blocks whose output type depends on input type).
    """

    def __init__(self, name: str, type=None):
        self.name = name
        self.type = type

    def __repr__(self):
        return f"Output({self.name!r})"


class TypeSignature:
    def __init__(self, inputs: Sequence[Input], outputs: Sequence[Output],
                 process_name: str | None = None,
                 initialize_name: str | None = None):
        self.inputs = list(inputs)
        self.outputs = list(outputs)
        self.process_name = process_name
        self.initialize_name = initialize_name


class Block:
    """Base class for all blocks.

    Mirrors the reference block contract (add_type_signature / differentiate /
    get_input_type / get_output_type / get_rate —
    /root/reference/radio/core/block.lua:238-390) in TPU-native form.
    """

    #: "device" blocks run inside the fused jitted program; "host" blocks run
    #: eagerly on the host between device segments.
    domain = "host"
    #: device block producing a (values, mask) pair, compacted at the
    #: device->host boundary (data-dependent output counts).
    masked_output = False
    #: host block whose output length is data-dependent (framers, decoders).
    variable_output = False
    #: device block that can be demoted to host mode (process_host) when fed
    #: by a variable-rate host stage.
    dual = False

    def __init__(self):
        self.name = type(self).__name__
        self.signatures: list[TypeSignature] = []
        self.inputs: list[Input] = []
        self.outputs: list[Output] = []
        self.signature: TypeSignature | None = None
        self.input_types: list[SampleType] = []
        self.output_types: list[SampleType] = []
        self.input_rate: float | None = None
        self._differentiated = False

    # -- construction -----------------------------------------------------
    def add_type_signature(self, inputs: Sequence[Input], outputs: Sequence[Output],
                           process_name: str | None = None,
                           initialize_name: str | None = None):
        if self.signatures:
            if len(self.signatures[0].inputs) != len(inputs):
                raise ValueError(f"{self.name}: inconsistent input port count")
            if len(self.signatures[0].outputs) != len(outputs):
                raise ValueError(f"{self.name}: inconsistent output port count")
        self.signatures.append(TypeSignature(inputs, outputs, process_name,
                                             initialize_name))
        # Port lists come from the first signature (names must agree).
        if len(self.signatures) == 1:
            self.inputs = list(inputs)
            self.outputs = list(outputs)

    # -- differentiation (type propagation) -------------------------------
    def differentiate(self, input_types: Sequence[SampleType]):
        """Select the type signature matching the given input types and bind
        the per-signature process/initialize methods.
        (reference: /root/reference/radio/core/block.lua:296-345)"""
        input_types = list(input_types)
        for sig in self.signatures:
            if len(sig.inputs) != len(input_types):
                continue
            if all(p.matches(t) for p, t in zip(sig.inputs, input_types)):
                self.signature = sig
                self.input_types = input_types
                self.output_types = []
                for out in sig.outputs:
                    t = out.type
                    if callable(t) and not isinstance(t, SampleType):
                        t = t(input_types)
                    self.output_types.append(t)
                if sig.process_name is not None:
                    self.process = getattr(self, sig.process_name)
                if sig.initialize_name is not None:
                    self.initialize = getattr(self, sig.initialize_name)
                self._differentiated = True
                return
        raise ValueError(
            f"{self.name}: no type signature matches input types "
            f"{[t.name for t in input_types]}")

    def get_input_type(self, index: int = 0) -> SampleType:
        self._check_differentiated()
        return self.input_types[index]

    def get_output_type(self, index: int = 0) -> SampleType:
        self._check_differentiated()
        return self.output_types[index]

    def _check_differentiated(self):
        if not self._differentiated:
            raise RuntimeError(f"{self.name}: block not differentiated yet")

    # -- rates -------------------------------------------------------------
    def get_rate_ratio(self) -> Fraction:
        """Output rate / input rate as an exact rational.  Overridden by
        rate-changing blocks (Downsampler: 1/M, Upsampler: L/1 — reference
        overrides get_rate, /root/reference/radio/blocks/signal/downsampler.lua:36)."""
        return Fraction(1)

    def get_rate(self) -> float:
        if self.input_rate is None:
            raise RuntimeError(f"{self.name}: rate not set")
        return self.input_rate * self.get_rate_ratio()

    # -- batching ----------------------------------------------------------
    def out_batch_shape(self, in_batches: Sequence[tuple]) -> tuple:
        """Leading (batch/channel) axes of this block's outputs, given its
        inputs' batch shapes.  Device blocks broadcast over leading axes
        (last axis is time); batch-PRODUCING blocks (ChannelizerBlock)
        override this to add axes.  The graph propagates batch shapes so
        carried state is allocated per batch element (core/composite.py)."""
        batches = [tuple(b) for b in in_batches]
        if not batches:
            return ()
        return max(batches, key=len)

    # -- chunking ----------------------------------------------------------
    def chunk_multiple(self) -> int:
        """Required divisor of the per-call input chunk length.  The graph
        planner picks source chunk sizes so every block's constraint holds
        (e.g. FFT overlap-save FIR requires a multiple of its frame length)."""
        return 1

    def out_count(self, n_valid: int) -> int:
        """Number of valid output samples given n_valid valid input samples
        (used only for the final partial chunk at EOF)."""
        r = self.get_rate_ratio()
        return (n_valid * r.numerator) // r.denominator

    # -- lifecycle ---------------------------------------------------------
    def initialize(self):
        """Called once after differentiate + rate propagation; design filter
        taps, allocate constants, etc. (reference block.lua:471)."""

    def cleanup(self):
        """Called once when the flow graph stops (close files, etc.)."""

    def __repr__(self):
        return f"<{self.name}>"


class SignalBlock(Block):
    """A device block: pure jax function over chunks, fused into the XLA
    program. State is an explicit pytree threaded through process().

    Time-axis sharding contract (the generic runtime shards ANY graph of
    cooperating blocks over a mesh axis, exchanging carried state as ICI
    halos — the TPU analog of the reference's one-scheduler-for-every-
    graph property, composite.lua:514-950):

    * ``time_local = True``: the block has no cross-sample coupling along
      time (elementwise math, zero-stuffing, aligned decimation) — its
      ordinary process() is correct per shard.
    * ``tail_state = True``: the carried state is exactly the last
      ``state.shape[-1]`` INPUT samples (FIR family, delay lines).  The
      default process_sharded() then feeds each shard its left neighbor's
      input tail via ``ppermute`` (the true carry on shard 0) and takes
      the new global state from the last shard.
    * otherwise a block that can shard overrides process_sharded()
      directly (recurrences via distributed prefix scans, mixers via
      per-shard phase offsets); blocks that cannot (per-sample feedback
      loops, data-dependent output counts) leave the default, which
      raises with the block's name.
    """

    domain = "device"
    time_local = False
    tail_state = False

    def init_state(self) -> Any:
        return None

    def process(self, state, *xs):
        raise NotImplementedError

    def process_sharded(self, state, *xs, axis_name: str):
        """Run one chunk with the time (last) axis sharded over mesh axis
        ``axis_name``; called inside shard_map.

        State entering a chunk is the global carry and is READ ONLY ON
        SHARD 0 by tail-state blocks (interior shards take their halo from
        the left neighbor), so the state a block RETURNS need only be
        correct on shard 0.  The default tail path exploits this: one
        circular ppermute (parallel/time.py ring_halo) delivers both the
        intra-chunk halos and — on shard 0 — the global input tail that is
        the next chunk's carry.  Per-block collective cost: ONE ppermute,
        no end-of-chunk all_gather.  (Between chunks each device keeps its
        own copy of the nominally-replicated state output; shard 0's copy
        is the true carry, and shard 0 is the only reader.)

        Blocks whose state is read on every shard (distributed prefix
        recurrences) must return a genuinely replicated state — the prefix
        helpers' ``with_final`` forms provide it from the already-gathered
        summaries at zero extra collective cost."""
        if self.time_local:
            return self.process(state, *xs)
        if self.tail_state and len(xs) == 1:
            import jax.numpy as jnp
            from jax import lax
            from luaradio_tpu.parallel.time import ring_halo, shard0_state

            x = xs[0]
            k = state.shape[-1]
            if k > x.shape[-1]:
                raise NotImplementedError(
                    f"{self.name}: carried tail ({k}) exceeds the per-shard "
                    f"chunk ({x.shape[-1]}); increase chunk_size")
            recv = ring_halo(x.astype(state.dtype), k, axis_name)
            idx = lax.axis_index(axis_name)
            local = jnp.where(idx == 0, state, recv)
            _, y = self.process(local, x)
            return shard0_state(recv, axis_name), y
        raise NotImplementedError(
            f"{self.name} does not support time-axis sharding; use channel "
            f"banking (mesh with a 'channel' axis) for this graph")


class HostBlock(Block):
    """A host block: runs eagerly on numpy arrays / Python objects."""

    domain = "host"

    def process(self, *xs):
        raise NotImplementedError


class SourceBlock(Block):
    """Base for sources. Device sources (SignalSource, random, zero) subclass
    SignalSourceBlock; host sources (files, network) subclass HostSourceBlock.

    Sources must set ``self.rate`` (samples/sec) before initialize()."""

    rate: float | None = None

    def __init__(self):
        super().__init__()
        self.input_rate = None

    def get_rate(self) -> float:
        if self.rate is None:
            raise RuntimeError(f"{self.name}: source rate unknown")
        return float(self.rate)


class SignalSourceBlock(SourceBlock, SignalBlock):
    """Device-resident source: generates chunks in-graph.

    process(state, n) is not used; instead ``generate(state, length) ->
    (state, ys)`` produces a fixed-length chunk inside the fused program."""

    domain = "device"

    def generate(self, state, length: int):
        raise NotImplementedError

    def generate_sharded(self, state, length: int, axis_name: str):
        """Generate this shard's ``length`` samples of the chunk inside
        shard_map (global chunk = length * axis size).  Sources whose
        output depends on absolute sample position (oscillators, PRNGs)
        override this with per-shard offsets/keys."""
        if self.time_local:
            return self.generate(state, length)
        raise NotImplementedError(
            f"{self.name} does not support time-axis sharding")


class HostSourceBlock(SourceBlock, HostBlock):
    """Host source: read(n) returns up to n samples as a numpy array per
    output port, or None at EOF.

    Sources whose wire format converts to float exactly in float32 may also
    implement the *wire ingest* contract: ``wire_read(n)`` returns the raw
    integer wire samples ``(raw, n_valid)`` (or None at EOF) and
    ``device_ingest()`` returns a jax-traceable ``raw -> float32 payload``
    function.  The fused runtime then ships the 1-2 byte/sample wire bytes
    across the host->device link and converts on the VPU — the link, not
    the conversion, is the ingest bottleneck (reference converts on the
    host per sample, iqfile.lua:82-116)."""

    domain = "host"

    def read(self, n: int):
        raise NotImplementedError

    def wire_read(self, n: int):
        """Raw wire samples as (numpy integer array, n_valid) or None at
        EOF.  Only called when device_ingest() returned a converter."""
        raise NotImplementedError

    def device_ingest(self):
        """Return a jax-traceable function converting the wire_read array
        to the block's float32 boundary payload, or None when this source
        does not support device-side conversion (the default)."""
        return None


class SinkBlock(HostBlock):
    """Host sink. ``wants_data=False`` sinks (Nop, Benchmark) never force a
    device->host transfer of their input."""

    wants_data = True

    def process(self, *xs):
        raise NotImplementedError


__all__ = [
    "Input", "Output", "TypeSignature", "Block", "SignalBlock", "HostBlock",
    "SourceBlock", "SignalSourceBlock", "HostSourceBlock", "SinkBlock",
]
