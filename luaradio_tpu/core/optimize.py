"""Flow-graph optimizer: LTI fusion rewrites.

The reference executes every block as its own process at its own full
sample rate; a LuaRadio chain like ``LPF -> FMDeemphasis -> Downsampler(8)``
costs three pipe hops and computes 8x more FIR output than survives
(/root/reference/radio/blocks/signal/{firfilter,fmdeemphasisfilter,
downsampler}.lua).  XLA fusion already removes the hop cost here; this pass
removes the *algorithmic* waste, which XLA cannot:

* **FIR x FIR combining** — adjacent FIR stages collapse into one filter
  with convolved taps (one pass over HBM instead of two).
* **IIR -> FIR conversion** — short stable IIRs (deemphasis, single-pole
  filters) whose impulse response decays below 1e-10 are replaced by their
  truncated impulse response, eliminating the log-depth associative scan.
* **Decimation folding** — a trailing Downsampler(D) folds into the filter:
  only every D-th output is computed (ops.fir.fir_decimate), a D-fold FLOP
  reduction lowered as a banded-Toeplitz MXU matmul.

All rewrites are exact LTI algebra except IIR truncation, which is bounded
by 1e-10 of the impulse-response peak — beneath float32 arithmetic noise of
the scan it replaces.  Disable with LUARADIO_TPU_DISABLE_FUSION=1 or
``run(optimize=False)``; the acceleration-matrix tests run graphs both ways
against the same oracles (the analog of the reference's
LUARADIO_DISABLE_{VOLK,LIQUID,FFTW3F} CI matrix).
"""

from __future__ import annotations

import os

import numpy as np

from luaradio_tpu.core.block import Block, SignalBlock


def enabled_by_env() -> bool:
    return not os.environ.get("LUARADIO_TPU_DISABLE_FUSION")


def _fir_equiv(block: Block):
    fn = getattr(block, "fir_equivalent", None)
    if fn is None:
        return None
    return fn()


def _is_chain_candidate(graph, b: Block) -> bool:
    return (isinstance(b, SignalBlock) and b.domain == "device"
            and len(b.inputs) == 1 and len(b.outputs) == 1
            and not getattr(b, "masked_output", False))


def _decim_factor(b: Block) -> int | None:
    from luaradio_tpu.blocks.signal.sampling import DownsamplerBlock
    if isinstance(b, DownsamplerBlock):
        return b.factor
    return None


def optimize_graph(graph) -> int:
    """Apply LTI fusion rewrites in place.  Returns the number of rewrites.

    Runs after type differentiation and rate validation (so designed taps
    and rational ratios are known) and before chunk planning (so the fused
    blocks' chunk multiples drive the planner).
    """
    from luaradio_tpu.core.composite import PortRef
    from luaradio_tpu.blocks.signal.filtering import DecimatingFIRBlock
    from luaradio_tpu.ops.fir import combine_taps
    from luaradio_tpu.types import ComplexFloat32, Float32

    n_rewrites = 0
    changed = True
    while changed:
        changed = False
        for b in list(graph.order):
            if b not in graph.blocks:
                continue  # removed by an earlier rewrite this sweep
            if not _is_chain_candidate(graph, b):
                continue
            if _fir_equiv(b) is None and _decim_factor(b) is None:
                continue

            # Grow the longest chain of single-consumer LTI stages from b,
            # allowing trailing downsamplers to fold their factor in.
            chain = [b]
            cur = b
            while True:
                consumers = graph.consumers(PortRef(cur, 0))
                if len(consumers) != 1:
                    break
                nxt = consumers[0].block
                if (not _is_chain_candidate(graph, nxt)
                        or (_fir_equiv(nxt) is None
                            and _decim_factor(nxt) is None)):
                    break
                chain.append(nxt)
                cur = nxt

            # Trim trailing blocks so the chain ends at the last
            # downsampler or FIR (no dangling prefix-only case).
            while chain and _fir_equiv(chain[-1]) is None \
                    and _decim_factor(chain[-1]) is None:
                chain.pop()
            if len(chain) < 2 and _decim_factor(b) is None:
                # a lone IIR still benefits from FIR conversion (scan ->
                # matmul); a lone FIR/downsampler stays as-is
                from luaradio_tpu.blocks.signal.filtering import \
                    IIRFilterBlock
                if not (len(chain) == 1 and isinstance(b, IIRFilterBlock)
                        and _fir_equiv(b) is not None):
                    continue
            if len(chain) == 1 and _decim_factor(b) is not None:
                continue  # a lone downsampler is already one layout matmul

            # Combine: taps convolve at full rate until a downsampler is
            # hit; downsamplers only fold when no filter FOLLOWS them in
            # the chain at the decimated rate with taps needing the
            # pre-decimation rate — i.e. filters after a downsampler see a
            # different rate.  Keep it exact: stop the chain at the first
            # downsampler that is followed by more stages.
            taps = np.array([1.0])
            decim = 1
            used = []
            for i, blk in enumerate(chain):
                d = _decim_factor(blk)
                if d is not None:
                    decim *= d
                    used.append(blk)
                    # fold at most the trailing run of downsamplers
                    rest = chain[i + 1:]
                    if any(_decim_factor(r) is None for r in rest):
                        break
                    continue
                if decim != 1:
                    break  # filter after decimation: different rate domain
                h = _fir_equiv(blk)
                if h is None:
                    break
                taps = combine_taps(taps, h)
                used.append(blk)
            chain = used
            if len(chain) < 2:
                from luaradio_tpu.blocks.signal.filtering import \
                    IIRFilterBlock
                if not (len(chain) == 1 and isinstance(chain[0],
                                                       IIRFilterBlock)):
                    continue
            from luaradio_tpu.ops.fir import decim_block_size
            if decim == 1:
                if len(taps) > 4096:
                    continue  # DecimatingFIRBlock's FFT path caps here
            elif len(taps) > decim_block_size(decim) * decim + decim:
                continue  # too long for the framed matmul; leave as-is

            in_type = chain[0].get_input_type()
            taps_c = np.iscomplexobj(taps)
            out_type = (ComplexFloat32
                        if (in_type == ComplexFloat32 or taps_c)
                        else Float32)
            if out_type != chain[-1].get_output_type():
                continue  # unexpected type algebra; bail conservatively

            new = DecimatingFIRBlock.synth(
                taps, decim, in_type, chain[0].input_rate,
                name_hint="+".join(blk.name for blk in chain))
            new.initialize()

            # Rewire: input edge, output consumers, block lists.
            src = graph.edges.pop(PortRef(chain[0], 0))
            graph.edges[PortRef(new, 0)] = src
            last = PortRef(chain[-1], 0)
            for dref in list(graph.edges):
                if graph.edges[dref] == last:
                    graph.edges[dref] = PortRef(new, 0)
            for blk in chain[1:]:
                graph.edges.pop(PortRef(blk, 0), None)
            idx = graph.order.index(chain[0])
            for blk in chain:
                graph.blocks.remove(blk)
                graph.order.remove(blk)
            graph.blocks.append(new)
            graph.order.insert(idx, new)
            n_rewrites += 1
            changed = True
    n_rewrites += _fuse_disc_fir(graph)
    return n_rewrites


def _fuse_disc_fir(graph) -> int:
    """OPT-IN rewrite (LUARADIO_TPU_FORCE_WBFM_KERNEL=1):
    ``FrequencyDiscriminator -> DecimatingFIR`` pairs fuse into one
    Pallas block (blocks/signal/modem.py DiscriminatorDecimatingFIRBlock)
    — the discriminated stream never round-trips through HBM between the
    atan2 and the FIR matmul.

    NOT enabled by default, by measurement (round 5, v5e): a pallas_call
    is a fusion BARRIER — whatever produces the discriminator's input
    (source RNG, the tuner filter chain) must materialize its output to
    HBM for the custom call, which XLA would otherwise fuse straight
    into the consumer.  Mid-graph, that materialization (~16 B/sample)
    costs more than the saved discriminator round trip (~8 B/sample):
    the runner chain measured 7.8 GS/s fused vs 11.0 GS/s letting XLA
    fuse.  The substitution only pays where the input is already
    materialized — which is exactly the hand-fused flagship step
    (parallel/flagship.py) operating on boundary payloads.  The block
    itself remains available for explicit use.
    """
    if not os.environ.get("LUARADIO_TPU_FORCE_WBFM_KERNEL"):
        return 0
    if os.environ.get("LUARADIO_TPU_DISABLE_WBFM_KERNEL"):
        return 0
    if not getattr(graph, "fuse_pallas", False):
        return 0
    from luaradio_tpu.core.composite import PortRef
    from luaradio_tpu.blocks.signal.filtering import DecimatingFIRBlock
    from luaradio_tpu.blocks.signal.modem import (
        DiscriminatorDecimatingFIRBlock, FrequencyDiscriminatorBlock)

    n = 0
    for b in list(graph.order):
        if not isinstance(b, FrequencyDiscriminatorBlock) \
                or b not in graph.blocks:
            continue
        cons = graph.consumers(PortRef(b, 0))
        if len(cons) != 1:
            continue
        d = cons[0].block
        if not (isinstance(d, DecimatingFIRBlock)
                and not np.iscomplexobj(d.taps) and not d._use_fft()):
            continue
        k = -(-len(d.taps) // 128) * 128       # kernel pads taps to 128s
        if k - 1 > 128 * d.decimation:
            continue  # halo exceeds the kernel frame window
        new = DiscriminatorDecimatingFIRBlock.synth(
            np.asarray(d.taps, np.float32), d.decimation,
            b.gain / (2 * np.pi), b.input_rate,
            name_hint=f"{b.name}+{d.name}")
        new.initialize()
        src = graph.edges.pop(PortRef(b, 0))
        graph.edges[PortRef(new, 0)] = src
        last = PortRef(d, 0)
        for dref in list(graph.edges):
            if graph.edges[dref] == last:
                graph.edges[dref] = PortRef(new, 0)
        graph.edges.pop(PortRef(d, 0), None)
        idx = graph.order.index(b)
        for blk in (b, d):
            graph.blocks.remove(blk)
            graph.order.remove(blk)
        graph.blocks.append(new)
        graph.order.insert(idx, new)
        n += 1
    return n


__all__ = ["optimize_graph", "enabled_by_env"]
