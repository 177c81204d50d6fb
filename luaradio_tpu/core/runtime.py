"""Flow-graph execution.

The reference runs one OS process per block connected by UNIX socketpairs,
with a poll()-based hot loop of read -> deserialize -> process -> serialize ->
write (/root/reference/radio/core/composite.lua:568-636,
/root/reference/radio/core/block.lua:556-608).  A secondary single-process
round-robin scheduler exists for tests (composite.lua:647-707).

TPU-native redesign: each *stage* of device blocks compiles into ONE jitted
XLA program ``step(states, ext_inputs) -> (states, outputs)``; XLA fuses the
entire chain, so block boundaries cost nothing and intermediate samples never
round-trip through HBM unless a real data dependency demands it.  A host
"pump" drives chunks: it reads host sources, feeds the fused programs, and
hands boundary outputs to host blocks (protocol framers, file sinks).
Back-pressure is lockstep; the device work is dispatched asynchronously so
host I/O for chunk k+1 overlaps device compute for chunk k.

Modes:
  - "fused": jitted segments (production path).
  - "eager": identical dataflow, no jit (debugging; analog of the reference's
    single-process scheduler used by its test jig).
"""

from __future__ import annotations

import threading
from typing import Any

import numpy as np

from luaradio_tpu.core.block import (Block, HostBlock, HostSourceBlock,
                                     SignalBlock, SignalSourceBlock, SinkBlock)
from luaradio_tpu.core.composite import CompositeBlock, Graph, PortRef
from luaradio_tpu.core import trace as trace_mod
from luaradio_tpu.ops.complexutil import (host_to_payload, pack_complex,
                                          payload_to_host, unpack_complex)


def _fetch_local(value):
    """np.asarray, except that a multihost global array yields only THIS
    process's contiguous block.  Returns (ndarray, last_axis_offset): the
    global index the block's last axis starts at (0 for addressable
    arrays), for translating global valid-sample counts to local ones."""
    try:
        import jax
        if isinstance(value, jax.Array) and not value.is_fully_addressable:
            from luaradio_tpu.parallel import multihost
            return multihost.local_block(value)
    except ImportError:
        pass
    return np.asarray(value), 0


def _to_host(value, n_valid=None, masked=False, complex_=False):
    """Materialize an edge value on the host, compacting masked outputs.

    Device edges carry complex chunks as interleaved float32 (TPU backends
    reject complex64 at program boundaries — see ops.complexutil); they are
    re-viewed as complex64 here, zero-copy.  Time is the LAST axis; leading
    axes (channel banks) pass through.  Under multihost execution each
    process sees only its own block of every chunk (per-host egress).
    """
    if masked:
        values, mask = value
        raw, _ = _fetch_local(values)
        arr = payload_to_host(raw, complex_)
        mraw, moff = _fetch_local(mask)
        m = mraw.astype(bool)
        nv = None if n_valid is None else max(0, n_valid - moff)
        if nv is not None and nv < m.shape[-1]:
            m = m.copy()
            m[..., nv:] = False
        return arr[m]
    if isinstance(value, (list, tuple)):
        return value
    raw, off = _fetch_local(value)
    arr = payload_to_host(raw, complex_)
    # offsets of interleaved complex payloads are in float32 units
    nv = None if n_valid is None else max(0, n_valid - (off // 2 if complex_
                                                        else off))
    if nv is not None and nv < arr.shape[-1]:
        arr = arr[..., :nv]
    return arr


class _Banked(list):
    """Per-channel host values under channel banking: element c is channel
    c's output of a host block clone (variable length per channel).  A
    plain-list subclass so sinks that only measure length see the total."""

    def __len__(self):  # total samples across channels (BenchmarkSink)
        return sum(len(r) if hasattr(r, "__len__") else 1
                   for r in list.__iter__(self))

    @property
    def rows(self):
        return list(list.__iter__(self))


class Segment:
    """A maximal group of device blocks compiled as one XLA program.

    With ``mesh``/``channels``, the program is the vmap of the per-channel
    step over a leading channel axis, jitted with every input/output/state
    sharded ``P(channel_axis)`` — XLA SPMD runs the bank embarrassingly
    parallel over the mesh with zero collectives (the generic form of
    parallel/channel.py, applied to ANY graph)."""

    def __init__(self, graph: Graph, blocks: list[Block], bid: dict[int, str],
                 jit_compile: bool, mesh=None, channels: int | None = None,
                 channel_axis: str = "channel", time_axis: str | None = None,
                 wire_ingest: dict[str, Any] | None = None,
                 resident_ingest: dict[str, tuple] | None = None,
                 resident_decoded: set[str] | None = None):
        import jax

        self.blocks = blocks
        self.bid = bid
        self._fence = None
        self.mesh = mesh
        self.channels = channels
        self.time_axis = time_axis
        self.wire_ingest = wire_ingest or {}
        # key -> (window items per chunk, items per sample, ring period
        # items): the source's ring is device-resident (replicated over
        # any mesh); the step slices each chunk's window in-graph (per
        # shard under time sharding) from '<key>#buf' at the carried
        # '<key>#rs' start state, which advances in-graph.
        self.resident_ingest = resident_ingest or {}
        self.resident_decoded = resident_decoded or set()
        # Multihost: the mesh spans several processes; every process runs
        # this same program, supplies its local block of each ext chunk,
        # and fetches only its addressable output shards (DCN execution —
        # parallel/multihost.py).
        from luaradio_tpu.parallel import multihost as _mh
        self.multihost = _mh.is_multihost(mesh)
        self._ext_sharding: dict[str, Any] = {}
        in_seg = {id(b) for b in blocks}

        def _is_complex(block: Block, oi: int) -> bool:
            t = block.output_types[oi]
            return t is not None and t.dtype.kind == "c"

        # External input edges (values produced outside this segment).
        # Complex edges cross the jit boundary as interleaved float32
        # (ops.complexutil): self.ext_complex marks which need unpacking.
        self.ext_keys: list[str] = []
        self.ext_complex: dict[str, bool] = {}
        for b in blocks:
            for i in range(len(b.inputs)):
                src = graph.edges[PortRef(b, i)]
                if id(src.block) not in in_seg:
                    key = f"{bid[id(src.block)]}.{src.index}"
                    if key not in self.ext_keys:
                        self.ext_keys.append(key)
                        self.ext_complex[key] = _is_complex(src.block,
                                                            src.index)

        # Output edges consumed outside the segment.  Complex edges whose
        # only outside consumers never fetch the data (wants_data=False
        # sinks: Nop, Benchmark) skip the interleave repack — the array
        # stays a device-resident complex jit output.
        self.out_keys: list[str] = []
        self.out_complex: dict[str, bool] = {}
        for b in blocks:
            for oi in range(len(b.outputs)):
                consumers = graph.consumers(PortRef(b, oi))
                outside = [c for c in consumers if id(c.block) not in in_seg]
                if outside:
                    key = f"{bid[id(b)]}.{oi}"
                    self.out_keys.append(key)
                    lazy = all(isinstance(c.block, SinkBlock)
                               and not c.block.wants_data for c in outside)
                    self.out_complex[key] = _is_complex(b, oi) and not lazy

        gen_len = {bid[id(b)]: graph.out_chunk[id(b)] for b in blocks
                   if isinstance(b, SignalSourceBlock)}
        edges = graph.edges

        wire = self.wire_ingest
        res = self.resident_ingest
        tshards = int(mesh.shape[time_axis]) if (
            mesh is not None and time_axis is not None) else 1

        #: the ext entries _run_segment actually sends: resident keys are
        #: replaced by their ring array; the window START lives in the
        #: carried (donated) state and advances IN-GRAPH, so no host
        #: value crosses per chunk at all (a per-chunk numpy scalar
        #: argument measured ~0.5 ms of tunnel transfer per dispatch).
        #: Only resident sources THIS segment consumes — other segments
        #: of a multi-stage graph must not bind and slice rings they
        #: never read.
        res = {k: v for k, v in res.items() if k in self.ext_keys}
        self.resident_ingest = res
        self.ext_transfer_keys = (
            [k for k in self.ext_keys if k not in res]
            + [k + "#buf" for k in res])

        def step(states: dict, ext: dict):
            # wire-ingest edges arrive as raw integer wire samples and are
            # converted to float32 on-device (the host->device link is the
            # ingest bottleneck; the VPU conversion is free in comparison).
            # Under time sharding this body runs inside shard_map: blocks
            # go through their process_sharded/generate_sharded contract.
            from jax import lax

            vals = {}
            ext = dict(ext)
            new_states = dict(states)
            for k, (items, _kf, period) in res.items():
                # slice this chunk's window from the device-resident ring
                # (replicated over the mesh; each shard takes its own
                # part); the start index is carried state, advanced here
                buf = ext.pop(k + "#buf")
                start = states[k + "#rs"]
                new_states[k + "#rs"] = (start + items) % period
                if tshards > 1:
                    ll = items // tshards
                    idx = lax.axis_index(time_axis)
                    ext[k] = lax.dynamic_slice(buf, (start + idx * ll,),
                                               (ll,))
                else:
                    ext[k] = lax.dynamic_slice(buf, (start,), (items,))
            for k, v in ext.items():
                if k in self.resident_decoded:
                    vals[k] = v          # ring pre-decoded at setup
                    continue
                if k in wire:
                    v = wire[k](v)
                vals[k] = unpack_complex(v) if self.ext_complex[k] else v
            for b in blocks:
                k = bid[id(b)]
                if isinstance(b, SignalSourceBlock):
                    if tshards > 1:
                        st, outs = b.generate_sharded(
                            states[k], gen_len[k] // tshards, time_axis)
                    else:
                        st, outs = b.generate(states[k], gen_len[k])
                else:
                    ins = []
                    for i in range(len(b.inputs)):
                        src = edges[PortRef(b, i)]
                        ins.append(vals[f"{bid[id(src.block)]}.{src.index}"])
                    if tshards > 1:
                        st, outs = b.process_sharded(states[k], *ins,
                                                     axis_name=time_axis)
                    else:
                        st, outs = b.process(states[k], *ins)
                new_states[k] = st
                if len(b.outputs) == 1 and not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                elif getattr(b, "masked_output", False):
                    outs = (outs,)  # (values, mask) pair is one port
                for oi, y in enumerate(outs):
                    vals[f"{k}.{oi}"] = y

            def boundary(ok):
                v = vals[ok]
                if not self.out_complex[ok]:
                    return v
                if isinstance(v, tuple):  # masked: (values, mask)
                    return (pack_complex(v[0]), v[1])
                return pack_complex(v)

            return new_states, {ok: boundary(ok) for ok in self.out_keys}

        if tshards > 1:
            # Time-axis sharding: the step runs inside shard_map with every
            # boundary array split on its LAST axis; carried state is
            # replicated (each shard computes the identical global state
            # via the blocks' collectives).  With a channel axis too, the
            # leading axis banks over it — blocks broadcast leading axes.
            import inspect

            import jax.numpy as jnp
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            if not jit_compile:
                raise ValueError("mesh execution requires mode='fused'")
            chan = channel_axis if channel_axis in mesh.axis_names else None

            def vspec(rank):
                if chan:
                    return P(chan, *([None] * (rank - 2)), time_axis)
                return P(*([None] * (rank - 1)), time_axis)

            def _res_starts():
                return {k + "#rs": jnp.int32(0) for k in res}

            if chan:
                c = channels or int(mesh.shape[channel_axis])

                def init_states():
                    st = {bid[id(b)]: b.init_state() for b in blocks}
                    st = jax.tree.map(
                        lambda l: jnp.broadcast_to(jnp.asarray(l),
                                                   (c,) + jnp.shape(l)), st)
                    st.update(_res_starts())
                    return st
            else:
                def init_states():
                    st = {bid[id(b)]: b.init_state() for b in blocks}
                    st.update(_res_starts())
                    return st
            if self.multihost:
                # a no-input jit with global out_shardings runs as one SPMD
                # computation across all processes — the only way to create
                # the replicated global state arrays without a broadcast
                from jax.sharding import NamedSharding
                shapes = jax.eval_shape(init_states)
                out_sh = jax.tree.map(
                    lambda l: NamedSharding(mesh, P(chan) if chan else P()),
                    shapes)
                self.states = jax.jit(init_states, out_shardings=out_sh)()
            else:
                self.states = jax.jit(init_states)()

            state_specs = jax.tree.map(lambda l: P(chan) if chan else P(),
                                       self.states)
            ext_specs = {k: vspec(2 if chan else 1) for k in self.ext_keys
                         if k not in self.resident_ingest}
            for k in self.resident_ingest:  # the ring is replicated
                ext_specs[k + "#buf"] = P()
            if self.multihost:
                from jax.sharding import NamedSharding
                self._ext_sharding = {k: NamedSharding(mesh, s)
                                      for k, s in ext_specs.items()}
            # masked producers emit (values, mask) pairs: both shard on time
            masked_keys = {f"{bid[id(b)]}.{oi}" for b in blocks
                           if getattr(b, "masked_output", False)
                           for oi in range(len(b.outputs))}
            r = 2 if chan else 1
            out_val_specs = {k: ((vspec(r), vspec(r)) if k in masked_keys
                                 else vspec(r)) for k in self.out_keys}
            kw = {}
            params = inspect.signature(shard_map).parameters
            if "check_rep" in params:
                kw["check_rep"] = False      # states proven replicated by
            elif "check_vma" in params:      # construction (all_gather),
                kw["check_vma"] = False      # beyond the checker's reach
            sm = shard_map(step, mesh=mesh,
                           in_specs=(state_specs, ext_specs),
                           out_specs=(state_specs, out_val_specs), **kw)
            self.fn = jax.jit(sm, donate_argnums=(0,))
        elif mesh is not None:
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec as P

            if not jit_compile:
                raise ValueError("mesh execution requires mode='fused'")
            sh = NamedSharding(mesh, P(channel_axis))
            c = channels or mesh.shape[channel_axis]
            self.fn = jax.jit(jax.vmap(step), donate_argnums=(0,),
                              in_shardings=(sh, sh), out_shardings=(sh, sh))
            if self.multihost:
                self._ext_sharding = {k: sh for k in self.ext_keys}

            def init_banked():
                st = {bid[id(b)]: b.init_state() for b in blocks}
                return jax.tree.map(
                    lambda l: jnp.broadcast_to(jnp.asarray(l),
                                               (c,) + jnp.shape(l)), st)
            self.states = jax.jit(init_banked, out_shardings=sh)()
        else:
            if jit_compile:
                self.fn = jax.jit(step, donate_argnums=(0,))
            else:
                self.fn = step

            # Initial states are created inside a jitted thunk: complex
            # zeros cannot be created eagerly on TPU backends (boundary
            # constraint), but as jit outputs they are device-resident and
            # never transferred.  Blocks downstream of a batch-producing
            # block (ChannelizerBlock) get their state broadcast to their
            # batch shape (graph._propagate_batch).
            import jax.numpy as jnp

            def init_all():
                out = {}
                for b in blocks:
                    st = b.init_state()
                    batch = graph.in_batch.get(id(b), ())
                    if batch:
                        st = jax.tree.map(
                            lambda l: jnp.broadcast_to(
                                jnp.asarray(l), tuple(batch) + jnp.shape(l)),
                            st)
                    out[bid[id(b)]] = st
                for k in res:        # resident window starts (in-graph)
                    out[k + "#rs"] = jnp.int32(0)
                return out
            self.states = jax.jit(init_all)()

    def run(self, ext: dict):
        self.states, outs = self.fn(self.states, ext)
        return outs

    def drain(self):
        """Block until every dispatched step has executed.

        ``jax.block_until_ready`` does not synchronize on some tunneled TPU
        transports — only a host fetch proves completion — so the fence is a
        jitted float32 scalar derived from the carried states (complex leaves
        are realed in-graph: complex arrays cannot cross the boundary),
        fetched with a single ~RTT round trip per drain, not per chunk.
        """
        import jax
        import jax.numpy as jnp

        if self._fence is None:
            def fence(states):
                acc = jnp.float32(0)
                for leaf in jax.tree.leaves(states):
                    if leaf.size == 0:
                        continue
                    v = jnp.real(leaf.reshape(-1)[0])
                    acc = acc + v.astype(jnp.float32)
                return acc
            if self.multihost:
                # replicate the scalar over the global mesh so every
                # process can fetch it locally
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._fence = jax.jit(
                    fence, out_shardings=NamedSharding(self.mesh, P()))
            else:
                self._fence = jax.jit(fence)
        return float(self._fence(self.states))


class _Prefetcher:
    """Read-ahead pump stage: a background thread reads host sources,
    converts wire formats, and starts the host->device transfers, so file
    I/O, format conversion, and the link transfer of chunk k+1 all overlap
    the device compute of chunk k.  The reference gets the same overlap for
    free from its process-per-block pipes (composite.lua:568-636); here one
    thread + a small bounded queue replaces the socketpair transport.

    ``read_fn`` is Runner._read_sources; ``put_fn(key, arr)`` optionally
    moves a payload to the device (returns the value to enqueue).  Errors
    raised by either propagate out of :meth:`get` on the pump thread.

    NOTE: the reader runs up to ``depth`` chunks ahead of consumption, so
    source state (file positions, ring drains, throttle pacing) advances
    ahead of the consumed stream; ``budget`` (set from Runner.run's
    max_chunks) bounds the read-ahead so a bounded run never reads source
    chunks it will not consume.
    """

    def __init__(self, read_fn, put_fn, depth: int = 3,
                 budget: int | None = None):
        import queue

        self._read_fn = read_fn
        self._put_fn = put_fn
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._budget = budget
        self.error: BaseException | None = None
        self._thread = threading.Thread(target=self._main, daemon=True)
        self._thread.start()

    def _main(self):
        import queue

        try:
            n_read = 0
            while not self._stop.is_set():
                if self._budget is not None and n_read >= self._budget:
                    chunk = None
                else:
                    chunk = self._read_fn()
                    n_read += 1
                if chunk is not None:
                    values, nvalid, eof = chunk
                    values = {k: self._put_fn(k, v) for k, v in values.items()}
                    chunk = (values, nvalid, eof)
                while not self._stop.is_set():
                    try:
                        self._q.put(chunk, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if chunk is None or chunk[2]:
                    return
        except BaseException as exc:  # noqa: BLE001 — surfaced from get()
            self.error = exc
            while not self._stop.is_set():
                try:
                    self._q.put(None, timeout=0.1)
                    return
                except queue.Full:
                    continue

    def get(self):
        """Next (values, nvalid, eof) chunk, or None at EOF.  Re-raises any
        reader-thread exception."""
        import queue

        while True:
            if self.error is not None and self._q.empty():
                err, self.error = self.error, None
                raise err
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                if not self._thread.is_alive() and self.error is None:
                    return None
                continue
            if item is None and self.error is not None:
                err, self.error = self.error, None
                raise err
            return item

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5.0)


class Runner:
    def __init__(self, top: CompositeBlock, mode: str = "fused",
                 chunk_size: int | None = None, trace: bool | None = None,
                 optimize: bool | None = None, mesh=None,
                 channels: int | None = None,
                 channel_axis: str = "channel",
                 time_axis: str = "time",
                 ingest: str | None = None):
        # A mesh axis named ``time_axis`` shards every stream's time axis
        # across devices — the generic form of parallel/time.py, for ANY
        # graph of blocks that implement the SignalBlock time-sharding
        # contract (the analog of the reference's one-scheduler-for-every-
        # graph property, composite.lua:514-950).  A ``channel_axis``
        # banks a leading channel dimension; both may be present.
        self._time_sharded = (mesh is not None
                              and time_axis in mesh.axis_names)
        self.time_axis = time_axis if self._time_sharded else None
        tshards = int(mesh.shape[time_axis]) if self._time_sharded else 1
        self.graph = Graph(top, chunk_size=chunk_size, optimize=optimize,
                           shards=tshards, fuse_pallas=mesh is None)
        self.mode = mode
        self.mesh = mesh
        chan_banked = mesh is not None and channel_axis in mesh.axis_names
        if chan_banked and channels is None:
            channels = int(mesh.shape[channel_axis])
        self.channels = channels
        if trace is None:
            trace = trace_mod.enabled_by_env()
        self.tracer = trace_mod.Tracer() if trace else None
        g = self.graph
        self.bid = {id(b): f"b{i}" for i, b in enumerate(g.order)}

        if mesh is not None and not self._time_sharded \
                and not chan_banked:
            raise ValueError(
                f"mesh has neither a {channel_axis!r} nor a {time_axis!r} "
                f"axis: nothing to shard over (axes: {mesh.axis_names})")

        # Per-channel host fan-out under channel banking: mid-graph host
        # blocks (framers, decoders) run as one CLONE per channel, each
        # consuming its row of the banked device boundary arrays — the
        # host analog of the vmapped device bank.  Host outputs may not
        # re-enter device segments (variable-length per-channel streams
        # have no static banked shape).  Pure time sharding needs none of
        # this: boundary arrays stay logically global.
        self._multihost = False
        if mesh is not None:
            from luaradio_tpu.parallel import multihost as _mh
            self._multihost = _mh.is_multihost(mesh)

        has_mid_host = any(
            b.domain == "host" and b.outputs
            and not isinstance(b, HostSourceBlock) for b in g.order)
        if self._multihost and self._time_sharded and not chan_banked \
                and has_mid_host:
            raise NotImplementedError(
                "multihost time sharding: a mid-graph host block needs the "
                "global stream on one host; use a ('channel',) bank mesh "
                "(whole channels per host) for framer/decoder graphs")

        # Under multihost channel banking each process owns a contiguous
        # range of channels (the rows its devices hold); host fan-out runs
        # clones for LOCAL channels only, and sinks see local rows.
        self._chan_local = (0, channels) if channels else None
        if self._multihost and chan_banked:
            import jax
            ax = list(mesh.axis_names).index(channel_axis)
            devs = np.moveaxis(np.asarray(mesh.devices), ax, 0)
            devs = devs.reshape(devs.shape[0], -1)
            pid = jax.process_index()
            owned = [i for i in range(devs.shape[0])
                     if {d.process_index for d in devs[i]} == {pid}]
            part = [i for i in range(devs.shape[0])
                    if i not in owned
                    and pid in {d.process_index for d in devs[i]}]
            if part and has_mid_host:
                raise NotImplementedError(
                    "multihost channel bank: a channel's time axis spans "
                    "processes, so host blocks cannot see whole channels; "
                    "order the mesh so each process owns whole channels")
            if owned != list(range(min(owned, default=0),
                                   min(owned, default=0) + len(owned))):
                raise ValueError(
                    "multihost channel bank: this process's channels are "
                    "not contiguous; build the mesh from process-ordered "
                    "devices")
            rows_per = channels // devs.shape[0]
            if owned:
                self._chan_local = (owned[0] * rows_per,
                                    (owned[-1] + 1) * rows_per)

        self._bank_clones: dict[int, list[Block]] = {}
        self._chan_banked = chan_banked
        if chan_banked:
            import copy
            n_local = (self._chan_local[1] - self._chan_local[0]
                       if self._chan_local else channels)
            for b in g.order:
                if (b.domain != "host" or not b.outputs
                        or isinstance(b, HostSourceBlock)):
                    continue
                if any(c.block.domain == "device"
                       for oi in range(len(b.outputs))
                       for c in g.consumers(PortRef(b, oi))):
                    raise NotImplementedError(
                        f"mesh execution: host block {b.name} feeding a "
                        f"device block is not supported in a channel bank")
                self._bank_clones[id(b)] = [copy.deepcopy(b)
                                            for _ in range(n_local)]

        self.sources = [b for b in g.order if isinstance(b, HostSourceBlock)]

        # Wire-ingest plan: a host source whose outputs feed ONLY device
        # blocks ships raw integer wire samples (when it supports exact
        # device-side conversion) and lets the fused program convert; the
        # same all-device-consumers test decides which source payloads the
        # prefetcher may move to the device ahead of dispatch.
        # ``ingest`` forces the mode: None=auto, "stream" disables wire and
        # resident, "wire" requires device-side conversion, "resident"
        # requires the device-resident ring (each raises if unsupported).
        if ingest is None:
            import os
            ingest = os.environ.get("LUARADIO_TPU_INGEST") or None
        if ingest not in (None, "auto", "stream", "wire", "resident"):
            raise ValueError(f"unknown ingest mode {ingest!r}")
        force = None if ingest == "auto" else ingest
        self.wire_ingest: dict[str, Any] = {}
        self._wire_srcs: set[int] = set()
        self._resident_srcs: set[int] = set()
        self._resident_mesh_srcs: set[int] = set()
        self.resident_ingest: dict[str, tuple] = {}
        #: resident keys whose ring was pre-decoded to final samples at
        #: setup (serial path): the step slices and uses them directly
        self._resident_decoded: set[str] = set()
        self._transfer_keys: set[str] = set()
        # resident rings work serially and under a pure time mesh (the ring
        # replicates across shards — including process-spanning meshes,
        # where every host decodes its own copy of the file and commits a
        # replicated global ring — and each shard slices its own window);
        # channel banks read banked host sources instead.
        res_mesh_ok = self._time_sharded and not chan_banked
        for s in self.sources:
            keys = [f"{self.bid[id(s)]}.{oi}" for oi in range(len(s.outputs))]
            all_dev = all(
                c.block.domain == "device"
                for oi in range(len(s.outputs))
                for c in g.consumers(PortRef(s, oi)))
            if not all_dev:
                if force in ("wire", "resident"):
                    raise ValueError(
                        f"ingest={force!r}: source {s.name} feeds host "
                        f"blocks, which need host-side samples")
                continue
            if mesh is None and mode == "fused":
                self._transfer_keys.update(keys)
            ing = (s.device_ingest()
                   if mode == "fused" and force != "stream" else None)
            if ing is not None and len(s.outputs) == 1:
                self.wire_ingest[keys[0]] = ing
                self._wire_srcs.add(id(s))
            elif force == "wire":
                raise ValueError(
                    f"ingest='wire': source {s.name} has no exact "
                    f"device-side wire conversion (32-bit/float formats "
                    f"convert on the host)")
            if (mode == "fused" and (mesh is None or res_mesh_ok)
                    and force not in ("stream", "wire")
                    and len(s.outputs) == 1
                    and getattr(s, "repeat_on_eof", False)
                    and hasattr(s, "resident_setup")
                    and s.resident_setup(g.out_chunk[id(s)])):
                # Device-resident loop: the repeating file's decoded
                # payload streams from HBM with ZERO host link traffic.
                # The chunk window is sliced INSIDE the fused program
                # (ring + start scalar are jit arguments) on every path —
                # a separate slicing dispatch per chunk measured ~3x
                # slower end-to-end on the tunneled transport (round-5
                # pump-gap fix).
                self._resident_srcs.add(id(s))
                self._wire_srcs.discard(id(s))
                self._resident_mesh_srcs.add(id(s))
                if mesh is not None:
                    from luaradio_tpu.parallel import multihost as _mhm
                    # replicate the ring across the mesh once; each shard
                    # slices its own window inside the sharded step (on a
                    # process-spanning mesh every host decoded the same
                    # file, so the replicated global ring is committed
                    # from identical per-process copies)
                    s._res_buf = _mhm.replicate(mesh, s._res_buf)
                key = keys[0]
                self.resident_ingest[key] = (
                    g.out_chunk[id(s)] * s._res_k, s._res_k,
                    s._res_n * s._res_k)
                self.wire_ingest.pop(key, None)
                if mesh is None:
                    # Serial path: decode the ring ONCE on the device —
                    # wire conversion AND the complex deinterleave run at
                    # setup, so the steady-state program slices ready
                    # complex samples with no per-chunk conversion or
                    # MXU deint at all (device-resident complex arrays
                    # are fine between jit calls; only boundaries are
                    # constrained — ops/complexutil.py).
                    import jax

                    conv = (s.device_ingest() if force != "stream"
                            else None)
                    cplx = s.output_types[0].dtype.kind == "c"

                    def _decode(buf, conv=conv, cplx=cplx):
                        v = conv(buf) if conv is not None else buf
                        return unpack_complex(v) if cplx else v
                    s._res_buf = jax.jit(_decode)(s._res_buf)
                    self.resident_ingest[key] = (
                        g.out_chunk[id(s)], 1, s._res_n)
                    self._resident_decoded.add(key)
                elif s.device_ingest() is not None and force != "stream":
                    self.wire_ingest[key] = s.device_ingest()
            elif force == "resident":
                raise ValueError(
                    f"ingest='resident': source {s.name} is not an "
                    f"eligible repeating file source (needs repeat_on_eof,"
                    f" a payload within LUARADIO_TPU_RESIDENT_BUDGET, and "
                    f"no channel/multihost mesh)")

        # Build one segment per stage that contains device blocks.
        self.stage_plan: list[tuple[Segment | None, list[Block]]] = []
        for s in range(g.num_stages):
            dev = [b for b in g.order
                   if g.stage[id(b)] == s and b.domain == "device"]
            host = [b for b in g.order
                    if g.stage[id(b)] == s and b.domain == "host"
                    and not isinstance(b, HostSourceBlock)]
            seg = Segment(g, dev, self.bid, mode == "fused", mesh=mesh,
                          channels=channels, channel_axis=channel_axis,
                          time_axis=self.time_axis,
                          wire_ingest=self.wire_ingest,
                          resident_ingest=self.resident_ingest,
                          resident_decoded=self._resident_decoded) \
                if dev else None
            self.stage_plan.append((seg, host))

        # Pipelined pumping: when no device block consumes a host block's
        # output, all device segments for chunk k can be dispatched
        # (asynchronously) before the host tail of chunk k-1 is processed —
        # the host-side fetch of one chunk overlaps the device compute of
        # the next.  Mid-graph host stages feeding device blocks force
        # lockstep order.
        self.pipelined = all(
            c.block.domain != "device"
            for (_, hosts) in self.stage_plan for h in hosts
            for oi in range(len(h.outputs))
            for c in g.consumers(PortRef(h, oi)))

        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._chunk_budget: int | None = None
        self._prefetcher: _Prefetcher | None = None
        self._stripe_pool = None
        self._stripe_concat = None
        self.running = False
        self.chunks_processed = 0
        self.error: BaseException | None = None
        self._cleaned_up = False

    # ------------------------------------------------------------------
    #: payloads above this size transfer as parallel stripes: the tunneled
    #: transport's per-stream throttle is per-connection, so two
    #: concurrent transfers measure ~1.9x one (see bench notes)
    _STRIPE_BYTES = 8 << 20
    _STRIPES = 2

    @property
    def _stripes(self) -> int:
        """Transfer stripe count: LUARADIO_TPU_STRIPES (or --ingest-stripes)
        overrides the default of 2; tune against the measured link (two
        concurrent streams measured ~1.9x one on the tunneled transport)."""
        import os
        try:
            return max(1, int(os.environ.get("LUARADIO_TPU_STRIPES",
                                             self._STRIPES)))
        except ValueError:
            return self._STRIPES

    def _prefetch_put(self, key: str, value):
        """Prefetch-thread hook: start the host->device transfer of payloads
        that only device blocks consume (the transfer overlaps the previous
        chunk's device compute; jit then consumes the device-resident
        array without a second copy).  Large payloads go as parallel
        stripes reassembled by a (cached) on-device concatenate."""
        if key not in self._transfer_keys or not isinstance(value, np.ndarray):
            return value
        import jax

        payload = host_to_payload(value)
        if payload.nbytes < self._STRIPE_BYTES or payload.ndim != 1:
            return jax.device_put(payload)
        if self._stripe_pool is None:
            import concurrent.futures
            import jax.numpy as jnp
            self._stripe_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=self._stripes)
            self._stripe_concat = jax.jit(
                lambda parts: jnp.concatenate(parts, axis=-1))
        stripes = np.array_split(payload, self._stripes, axis=-1)
        futs = [self._stripe_pool.submit(jax.device_put, s) for s in stripes]
        return self._stripe_concat([f.result() for f in futs])

    def _next_chunk(self):
        """One chunk of source data, via the read-ahead thread in fused
        mode (lazily started) or synchronously in eager mode.  When every
        source is device-resident there is nothing to overlap (no file
        I/O, no host->device transfer — reads just hand back the ring
        handle), so the pump reads synchronously: the prefetcher's
        cross-thread queue handoff costs more than the read."""
        if self.mode != "fused" or not self.sources or all(
                id(s) in self._resident_mesh_srcs for s in self.sources):
            return self._traced("sources.read", self._read_sources)
        if self._prefetcher is None:
            # Complete one full put->execute->fetch round trip on THIS
            # thread before any secondary thread touches jax: backend
            # initialization racing a device_put from another thread
            # deadlocks the first fetch (observed on jax 0.9.0, CPU and
            # TPU plugins alike).
            import jax
            np.asarray(jax.jit(lambda x: x + 1)(
                jax.device_put(np.zeros(1, np.float32))))
            self._prefetcher = _Prefetcher(
                lambda: self._traced("sources.read", self._read_sources),
                self._prefetch_put, budget=self._chunk_budget)
        return self._traced("sources.wait", self._prefetcher.get)

    # ------------------------------------------------------------------
    def _read_sources(self):
        """Read one chunk from every host source.  Returns (values, nvalid,
        eof) or None when the stream ended before this chunk."""
        g = self.graph
        values: dict[str, Any] = {}
        nvalid: dict[str, int] = {}
        eof = False
        # padding keeps shapes static on the final partial chunk —
        # reference semantics end the stream at EOF
        for s in self.sources:
            want = g.out_chunk[id(s)]
            if id(s) in self._resident_mesh_srcs:
                # ring only: the window start is carried device state,
                # advanced inside the fused program
                key = f"{self.bid[id(s)]}.0"
                values[key + "#buf"] = s._res_buf
                nvalid[key] = want
                continue
            if id(s) in self._wire_srcs:
                wr = s.wire_read(want)
                if wr is None:
                    return None
                raw, nv = wr
                k = getattr(s, "_wire_factor", 1)
                if nv < want:
                    eof = True
                    pad = np.zeros(raw.shape[:-1] + (want * k - raw.shape[-1],),
                                   dtype=raw.dtype)
                    raw = np.concatenate([raw, pad], axis=-1)
                key = f"{self.bid[id(s)]}.0"
                values[key] = raw
                nvalid[key] = nv
                continue
            data = s.read(want)
            if data is None:
                return None
            if not isinstance(data, tuple):
                data = (data,)
            for oi, arr in enumerate(data):
                if isinstance(arr, list):
                    values[f"{self.bid[id(s)]}.{oi}"] = arr
                    nvalid[f"{self.bid[id(s)]}.{oi}"] = len(arr)
                    continue
                arr = np.asarray(arr)
                nv = arr.shape[-1]  # time is the last axis (banked sources
                # produce [C, n] — see BankSource)
                if nv < want:
                    eof = True
                    pad = np.zeros(arr.shape[:-1] + (want - nv,),
                                   dtype=arr.dtype)
                    arr = np.concatenate([arr, pad], axis=-1)
                values[f"{self.bid[id(s)]}.{oi}"] = arr
                nvalid[f"{self.bid[id(s)]}.{oi}"] = nv
        if any(nvalid.get(f"{self.bid[id(s)]}.0", 1) == 0
               for s in self.sources):
            return None
        return values, nvalid, eof

    def _run_segment(self, seg: Segment, values, nvalid):
        import jax.numpy as jnp

        g = self.graph
        # With a mesh, hand numpy payloads straight to the sharded jit (it
        # splits the host buffer across devices per in_shardings); a
        # jnp.asarray here would first land the whole chunk on one device.
        # Under multihost every process read the full chunk but commits
        # only the block its local devices own (replicated read, sharded
        # transfer — the standard pod ingest pattern).
        def to_ext(k):
            v = values[k]
            if not isinstance(v, np.ndarray):
                return v
            payload = host_to_payload(v)
            if payload.ndim == 0 and seg.mesh is None:
                # tiny scalar (resident window start): hand it to jit as
                # a plain argument — an eager device_put would cost a
                # tunnel round trip per chunk
                return payload
            if seg.mesh is None:
                return jnp.asarray(payload)
            if seg.multihost:
                from luaradio_tpu.parallel import multihost as _mh
                sh = seg._ext_sharding[k]
                if not any(sh.spec):
                    # fully-replicated input (resident window starts):
                    # identical per process, committed via the callback
                    # path — process-local-data semantics would stack it
                    return _mh.replicate(seg.mesh, payload)
                sls = _mh.local_slices(sh, payload.shape)
                return _mh.from_local(sh, payload[sls])
            return payload

        ext = {k: to_ext(k) for k in seg.ext_transfer_keys}
        outs = seg.run(ext)
        values.update(outs)
        for b in seg.blocks:
            k = self.bid[id(b)]
            nin = min((nvalid.get(f"{self.bid[id(g.edges[PortRef(b, i)].block)]}"
                                  f".{g.edges[PortRef(b, i)].index}",
                                  g.in_chunk[id(b)])
                       for i in range(len(b.inputs))),
                      default=g.out_chunk[id(b)])
            if b.inputs:
                nvalid[f"{k}.0"] = b.out_count(nin)
                for oi in range(1, len(b.outputs)):
                    nvalid[f"{k}.{oi}"] = nvalid[f"{k}.0"]

    def _run_host_banked(self, b, values, nvalid):
        """Run host block b once per channel (clones carry per-channel
        state); banked device inputs are fetched once and sliced row-wise,
        banked host inputs pass through per channel."""
        g = self.graph
        # under multihost this process fetches only its own channel rows
        nch = (self._chan_local[1] - self._chan_local[0]
               if self._chan_local else self.channels)
        clones = self._bank_clones.get(id(b))
        fetched = {}
        for i in range(len(b.inputs)):
            src = g.edges[PortRef(b, i)]
            sk = f"{self.bid[id(src.block)]}.{src.index}"
            v = values[sk]
            if isinstance(v, _Banked):
                fetched[i] = v
                continue
            masked = getattr(src.block, "masked_output", False)
            t = src.block.output_types[src.index]
            cplx = t is not None and t.dtype.kind == "c"
            nv = nvalid.get(sk)
            if masked:
                vals, mask = v
                raw, _ = _fetch_local(vals)
                arr = payload_to_host(raw, cplx)
                mraw, moff = _fetch_local(mask)
                m = mraw.astype(bool)
                nvl = None if nv is None else max(0, nv - moff)
                if nvl is not None and nvl < m.shape[-1]:
                    m = m.copy()
                    m[..., nvl:] = False
                fetched[i] = _Banked([arr[c][m[c]] for c in range(nch)])
            else:
                raw, off = _fetch_local(v)
                arr = payload_to_host(raw, cplx)
                nvl = None if nv is None else max(
                    0, nv - (off // 2 if cplx else off))
                if nvl is not None and nvl < arr.shape[-1]:
                    arr = arr[..., :nvl]
                fetched[i] = _Banked([arr[c] for c in range(nch)])

        outs_rows = []
        for c in range(nch):
            blk = clones[c] if clones is not None else b
            ins = [fetched[i].rows[c] for i in range(len(b.inputs))]
            outs_rows.append(blk.process(*ins))

        if b.outputs and clones is not None:
            k = self.bid[id(b)]
            for oi in range(len(b.outputs)):
                rows = []
                for o in outs_rows:
                    if isinstance(o, tuple):
                        o = o[oi]
                    rows.append(o if o is not None else [])
                values[f"{k}.{oi}"] = _Banked(rows)

    def _run_hosts(self, host_blocks, values, nvalid):
        g = self.graph
        for b in host_blocks:
            # Banked inputs go through the per-channel path; a banked MASKED
            # device output must too (compacting [C, T] with a [C, T] mask
            # in one arr[m] would concatenate the channels' samples).
            if id(b) in self._bank_clones or any(
                    isinstance(values.get(
                        f"{self.bid[id(g.edges[PortRef(b, i)].block)]}"
                        f".{g.edges[PortRef(b, i)].index}"), _Banked)
                    or (self._chan_banked
                        and g.edges[PortRef(b, i)].block.domain == "device"
                        and getattr(g.edges[PortRef(b, i)].block,
                                    "masked_output", False))
                    for i in range(len(b.inputs))):
                self._run_host_banked(b, values, nvalid)
                continue
            ins = []
            for i in range(len(b.inputs)):
                src = g.edges[PortRef(b, i)]
                sk = f"{self.bid[id(src.block)]}.{src.index}"
                if isinstance(b, SinkBlock) and not b.wants_data:
                    ins.append(values[sk])
                    continue
                masked = getattr(src.block, "masked_output", False)
                t = src.block.output_types[src.index]
                cplx = t is not None and t.dtype.kind == "c"
                ins.append(_to_host(values[sk], nvalid.get(sk), masked,
                                    cplx))
            outs = b.process(*ins)
            if outs is not None:
                if not isinstance(outs, tuple):
                    outs = (outs,)
                k = self.bid[id(b)]
                for oi, y in enumerate(outs):
                    values[f"{k}.{oi}"] = y
                    try:
                        nvalid[f"{k}.{oi}"] = len(y)
                    except TypeError:
                        pass

    def _pump_once(self) -> bool:
        """Lockstep: one chunk through the whole graph.  False at EOF."""
        chunk = self._next_chunk()
        if chunk is None:
            return False
        values, nvalid, eof = chunk
        for i, (seg, host_blocks) in enumerate(self.stage_plan):
            if seg is not None:
                self._traced(f"segment[{i}].dispatch", self._run_segment,
                             seg, values, nvalid)
            self._traced(f"host[{i}].process", self._run_hosts,
                         host_blocks, values, nvalid)
        self.chunks_processed += 1
        return not eof

    def _traced(self, name, fn, *args):
        if self.tracer is None:
            return fn(*args)
        with self.tracer.span(name):
            return fn(*args)

    def _dispatch_chunk(self):
        """Pipelined phase 1: sources + all device segments (async)."""
        chunk = self._next_chunk()
        if chunk is None:
            return None
        values, nvalid, eof = chunk
        for i, (seg, _) in enumerate(self.stage_plan):
            if seg is not None:
                self._traced(f"segment[{i}].dispatch", self._run_segment,
                             seg, values, nvalid)
        return values, nvalid, eof

    def _finish_chunk(self, values, nvalid):
        """Pipelined phase 2: the host tail (forces device fetches)."""
        for i, (_, host_blocks) in enumerate(self.stage_plan):
            self._traced(f"host[{i}].process", self._run_hosts,
                         host_blocks, values, nvalid)
        self.chunks_processed += 1

    def run(self, max_chunks: int | None = None):
        """Run to EOF (or error).  A block exception collapses the graph and
        propagates — the analog of the reference's child-crash supervision
        (/root/reference/radio/core/composite.lua:773-847): any block death
        tears the whole graph down and surfaces from run()/wait()."""
        import jax

        self.running = True
        self._chunk_budget = max_chunks
        try:
            if self.pipelined and self.mode == "fused":
                self._run_pipelined(max_chunks)
            else:
                n = 0
                while not self._stop.is_set():
                    if not self._pump_once():
                        break
                    n += 1
                    if max_chunks is not None and n >= max_chunks:
                        break
            # Drain the async dispatch queue before cleanup.
            for seg, _ in self.stage_plan:
                if seg is not None:
                    seg.drain()
        except BaseException as exc:
            self.error = exc
            raise
        finally:
            self.running = False
            self._cleanup_once()

    def _cleanup_once(self):
        """cleanup() every block exactly once, even if run() is re-entered or
        a cleanup itself raises mid-way (remaining blocks still cleaned)."""
        if self._cleaned_up:
            return
        self._cleaned_up = True
        if self._prefetcher is not None:
            self._prefetcher.shutdown()
            self._prefetcher = None
        if self._stripe_pool is not None:
            self._stripe_pool.shutdown(wait=False)
            self._stripe_pool = None
        first_err = None
        clones = [c for cl in self._bank_clones.values() for c in cl]
        for b in list(self.graph.order) + clones:
            try:
                b.cleanup()
            except BaseException as exc:  # noqa: BLE001 — keep cleaning
                if first_err is None:
                    first_err = exc
        if first_err is not None and self.error is None:
            raise first_err

    def _run_pipelined(self, max_chunks: int | None):
        pending = None
        n = 0
        while not self._stop.is_set():
            cur = self._dispatch_chunk()
            if pending is not None:
                self._finish_chunk(pending[0], pending[1])
            pending = cur
            if cur is None:
                break
            n += 1
            if cur[2] or (max_chunks is not None and n >= max_chunks):
                break
        if pending is not None:
            self._finish_chunk(pending[0], pending[1])

    # -- threaded start/wait/stop (reference composite.lua:534,886,913) ----
    def start(self):
        self._thread = threading.Thread(target=self._thread_main, daemon=True)
        self.running = True
        self._thread.start()

    def _thread_main(self):
        try:
            self.run()
        except BaseException:  # noqa: BLE001 — surfaced via wait()/status()
            pass  # self.error holds it; re-raised from wait()

    def stop(self):
        self._stop.set()
        self.wait()

    def wait(self):
        """Join the pump thread; re-raise any block exception here (the
        reference surfaces child crashes from wait() —
        /root/reference/tests/top_spec.lua:82-106)."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self.error is not None:
            err, self.error = self.error, None
            raise err


__all__ = ["Runner", "Segment"]
