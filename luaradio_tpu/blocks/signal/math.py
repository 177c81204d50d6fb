"""Elementwise math blocks.

TPU-native equivalents of the reference's elementwise family
(/root/reference/radio/blocks/signal/{add,subtract,multiply,multiplyconjugate,
multiplyconstant,addconstant,absolutevalue,complexconjugate,complexmagnitude,
complexphase,complextoreal,complextoimag,complextofloat,realtocomplex,
floattocomplex}.lua).  Each is a pure jnp expression; inside a fused segment
XLA fuses the whole family into neighboring kernels, so these blocks are
free at runtime.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.core.block import Input, Output, SignalBlock
from luaradio_tpu.types import Bit, Byte, ComplexFloat32, Float32


class _Binary(SignalBlock):
    types = (ComplexFloat32, Float32, Byte)

    def __init__(self):
        super().__init__()
        for t in self.types:
            self.add_type_signature([Input("in1", t), Input("in2", t)],
                                    [Output("out", t)])


class AddBlock(_Binary):
    def process(self, state, x, y):
        return state, x + y


class SubtractBlock(_Binary):
    def process(self, state, x, y):
        return state, x - y


class MultiplyBlock(_Binary):
    types = (ComplexFloat32, Float32)

    def process(self, state, x, y):
        return state, x * y


class MultiplyConjugateBlock(SignalBlock):
    """out = in1 * conj(in2) (reference multiplyconjugate.lua, VOLK kernel)."""

    def __init__(self):
        super().__init__()
        self.add_type_signature(
            [Input("in1", ComplexFloat32), Input("in2", ComplexFloat32)],
            [Output("out", ComplexFloat32)])

    def process(self, state, x, y):
        return state, x * jnp.conj(y)


class MultiplyConstantBlock(SignalBlock):
    def __init__(self, constant):
        super().__init__()
        self.constant = constant
        if isinstance(constant, complex):
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
        else:
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
            self.add_type_signature([Input("in", Float32)],
                                    [Output("out", Float32)])

    def process(self, state, x):
        if jnp.iscomplexobj(x):
            c = np.complex64(self.constant)
        else:
            c = np.float32(self.constant)
        return state, x * c


class AddConstantBlock(SignalBlock):
    def __init__(self, constant):
        super().__init__()
        self.constant = constant
        if isinstance(constant, complex):
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
        else:
            self.add_type_signature([Input("in", ComplexFloat32)],
                                    [Output("out", ComplexFloat32)])
            self.add_type_signature([Input("in", Float32)],
                                    [Output("out", Float32)])

    def process(self, state, x):
        if jnp.iscomplexobj(x):
            c = np.complex64(self.constant)
        else:
            c = np.float32(self.constant)
        return state, x + c


class AbsoluteValueBlock(SignalBlock):
    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", Float32)], [Output("out", Float32)])

    def process(self, state, x):
        return state, jnp.abs(x)


class ComplexConjugateBlock(SignalBlock):
    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", ComplexFloat32)])

    def process(self, state, x):
        return state, jnp.conj(x)


class ComplexMagnitudeBlock(SignalBlock):
    dual = True

    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", Float32)])

    def process(self, state, x):
        return state, jnp.abs(x)

    def process_host(self, x):
        return np.abs(np.asarray(x)).astype(np.float32)


class ComplexPhaseBlock(SignalBlock):
    dual = True

    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", Float32)])

    def process(self, state, x):
        return state, jnp.angle(x)

    def process_host(self, x):
        return np.angle(np.asarray(x)).astype(np.float32)


class ComplexToRealBlock(SignalBlock):
    """Dual-domain: also runs host-side when fed by a variable-rate stage
    (e.g. downstream of SamplerBlock in the RDS/BPSK31 chains)."""

    dual = True

    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", Float32)])

    def process(self, state, x):
        return state, jnp.real(x)

    def process_host(self, x):
        return np.real(np.asarray(x))


class ComplexToImagBlock(SignalBlock):
    dual = True

    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", Float32)])

    def process(self, state, x):
        return state, jnp.imag(x)

    def process_host(self, x):
        return np.imag(np.asarray(x))


class ComplexToFloatBlock(SignalBlock):
    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("real", Float32), Output("imag", Float32)])

    def process(self, state, x):
        return state, (jnp.real(x), jnp.imag(x))


class RealToComplexBlock(SignalBlock):
    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("in", Float32)],
                                [Output("out", ComplexFloat32)])

    def process(self, state, x):
        return state, x.astype(jnp.complex64)


class FloatToComplexBlock(SignalBlock):
    def __init__(self):
        super().__init__()
        self.add_type_signature([Input("real", Float32), Input("imag", Float32)],
                                [Output("out", ComplexFloat32)])

    def process(self, state, re, im):
        return state, re + 1j * im


__all__ = [
    "AddBlock", "SubtractBlock", "MultiplyBlock", "MultiplyConjugateBlock",
    "MultiplyConstantBlock", "AddConstantBlock", "AbsoluteValueBlock",
    "ComplexConjugateBlock", "ComplexMagnitudeBlock", "ComplexPhaseBlock",
    "ComplexToRealBlock", "ComplexToImagBlock", "ComplexToFloatBlock",
    "RealToComplexBlock", "FloatToComplexBlock",
]

# All elementwise blocks have no cross-sample coupling: their ordinary
# process() is correct per time shard (SignalBlock time-sharding contract).
for _cls in (AddBlock, SubtractBlock, MultiplyBlock, MultiplyConjugateBlock,
             MultiplyConstantBlock, AddConstantBlock, AbsoluteValueBlock,
             ComplexConjugateBlock, ComplexMagnitudeBlock, ComplexPhaseBlock,
             ComplexToRealBlock, ComplexToImagBlock, ComplexToFloatBlock,
             RealToComplexBlock, FloatToComplexBlock):
    _cls.time_local = True
del _cls
