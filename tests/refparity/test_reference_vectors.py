"""Replay the reference's CHECKED-IN golden vectors through the TPU blocks.

The reference ships literal expected outputs for nearly every block
(tests/blocks/**/*_spec.gen.lua, ~320 vectors, generated once by its
numpy/scipy oracles per tests/generate.py).  Earlier rounds rebuilt the
same oracles with scipy; this suite runs the reference's OWN shipped
vectors through the blocks — demonstrated parity against the exact bytes
the reference tests against, catching convention drift (normalization,
phase sign, delay alignment) that re-derived oracles could share with the
implementation.  Comparison uses each spec's own epsilon; every vector
also re-runs split into uneven chunks (the reference jig's
sample-by-sample streaming-state test, jigs.lua:213-250).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from tests.jig import check_block, prepare_block
from tests.refparity import adapters
from tests.refparity.luaspec import TypedVector, parse_file

REF = "/root/reference/tests/blocks"

#: specs that cannot replay 1:1, with the reason (documented in
#: docs/parity-deviations.md).  Empty since round 5: the
#: BinaryPhaseCorrector vectors replay within epsilon (the cumsum
#: windowed mean equals the reference's incremental estimate; the old
#: skip predated the round-4 estimator rework).
SKIP: dict[str, str] = {}

_spec_files = sorted(
    os.path.relpath(p, REF)
    for p in glob.glob(f"{REF}/*/*.gen.lua"))


def _load(relpath):
    spec = parse_file(os.path.join(REF, relpath))
    assert spec is not None, relpath
    return spec


def _expected_arrays(outputs):
    return [o.array for o in outputs]


def _is_source(block):
    return not block.inputs


def _run_source(block, n_ports, want_lens):
    """Collect a source's full output (reference jigs.lua:151-187)."""
    from luaradio_tpu.core.block import HostSourceBlock

    block.differentiate([])
    block.initialize()
    outs = [[] for _ in range(n_ports)]
    if isinstance(block, HostSourceBlock):
        while True:
            got = block.read(1024)
            if got is None:
                break
            if not isinstance(got, tuple):
                got = (got,)
            for i, g in enumerate(got):
                outs[i].append(np.asarray(g))
            if sum(len(a) for a in outs[0]) >= max(want_lens) * 4:
                break  # infinite source guard
        block.cleanup()
    else:
        state = block.init_state()
        need = max(want_lens)
        got = 0
        while got < need:
            state, ys = block.generate(state, 256)
            if n_ports == 1 and not isinstance(ys, (tuple, list)):
                ys = (ys,)
            for i, y in enumerate(ys):
                outs[i].append(np.asarray(y))
            got += 256
    return [np.concatenate(o, axis=-1) if o else np.zeros(0)
            for o in outs]


@pytest.mark.parametrize("relpath", [
    p for p in _spec_files
    if _load(p).block_name not in adapters.OBJECT_OUTPUT_BLOCKS])
def test_reference_vectors(relpath):
    if relpath in SKIP:
        pytest.skip(SKIP[relpath])
    spec = _load(relpath)
    ran = 0
    for vec in spec.vectors:
        blk_probe, meta = adapters.build_block(spec.block_name, vec.args)
        expected = _expected_arrays(vec.outputs)

        if _is_source(blk_probe):
            got = _run_source(blk_probe, len(blk_probe.outputs),
                              [len(e) for e in expected])
            for i, exp in enumerate(expected):
                g = got[i][:len(exp)]
                assert g.shape == exp.shape, (vec.desc, i, g.shape,
                                              exp.shape)
                err = np.max(np.abs(g.astype(np.complex128)
                                    - exp.astype(np.complex128))) \
                    if exp.size else 0.0
                assert err <= spec.epsilon, (vec.desc, i, err)
            ran += 1
            continue

        in_types = adapters.input_types(vec.inputs)
        inputs = [v.array for v in vec.inputs]

        # Blocks with a chunk-multiple constraint (PAM/QAM consume
        # symbol_bits per symbol): the reference carries leftover bits in
        # block state; the TPU planner aligns chunks instead.  Trim the
        # vector to the aligned prefix and the expected output to the
        # matching symbol count — same samples, same oracle.
        prepare_block(blk_probe, in_types)
        cm = blk_probe.chunk_multiple()
        if cm > 1 and any(a.shape[-1] % cm for a in inputs):
            n_al = (inputs[0].shape[-1] // cm) * cm
            inputs = [a[..., :n_al] for a in inputs]
            n_out = blk_probe.out_count(n_al)
            expected = [e[..., :n_out] for e in expected]

        if meta.get("prefix"):
            # shipped FFT vectors are truncated (reference's overlap-save
            # delays output); ours is the full stream — compare the prefix
            from tests.jig import run_block
            blk = prepare_block(
                adapters.build_block(spec.block_name, vec.args)[0],
                in_types)
            got = run_block(blk, inputs)
            for i, exp in enumerate(expected):
                g = np.asarray(got[i])[: len(exp)]
                assert g.shape == exp.shape, (vec.desc, i)
                err = np.max(np.abs(g.astype(np.complex128)
                                    - exp.astype(np.complex128)))
                assert err <= spec.epsilon, (vec.desc, i, err)
        else:
            check_block(
                lambda: adapters.build_block(spec.block_name, vec.args)[0],
                inputs, expected, input_types=in_types,
                epsilon=spec.epsilon)
        ran += 1
    assert ran == len(spec.vectors)
