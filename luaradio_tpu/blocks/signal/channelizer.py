"""Polyphase filter-bank channelizer: one wideband stream -> C channels.

No reference analog (LuaRadio tunes one channel at a time with
TunerBlock); this is the TPU-native front half of the channel-bank story:
a wideband capture splits into C critically-sampled channels in one shot,
and the resulting [C, time] batch feeds banked receiver chains (leading
axes broadcast through every device block, and `run(mesh=...)` shards
them across the TPU mesh).

Math (standard critically-sampled analysis PFB, e.g. arXiv:1411.3656):

    y_c[m] = sum_k h[k] x[mC - k] e^{+j 2 pi c k / C}
           = IDFT_p->c ( v_p[m] ),  v_p[m] = sum_q h[qC+p] x[(m-q)C - p]

C polyphase branch FIRs on decimated streams + a length-C FFT across
branches: ~2*taps_per_branch VPU flops/sample plus a tiny batched FFT,
independent of C — against 2*C*taps_per_branch for C separate tuners.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

import jax.numpy as jnp

from luaradio_tpu.core.block import Input, Output, SignalBlock
from luaradio_tpu.types import ComplexFloat32
from luaradio_tpu.utils import filter_design


class ChannelizerBlock(SignalBlock):
    """Split a complex stream into ``num_channels`` critically-sampled
    channels.  Output is one [num_channels, N/C] batch on a single port;
    channel c is centered at c * rate / C (FFT ordering: c > C/2 are the
    negative frequencies).

    ``taps_per_branch`` sets the prototype lowpass length
    (num_channels * taps_per_branch taps, cutoff at rate / (2C))."""

    def __init__(self, num_channels: int, taps_per_branch: int = 8,
                 window: str = "hamming"):
        super().__init__()
        if num_channels < 2:
            raise ValueError("num_channels must be >= 2")
        self.num_channels = int(num_channels)
        self.taps_per_branch = int(taps_per_branch)
        self.window = window
        self.add_type_signature([Input("in", ComplexFloat32)],
                                [Output("out", ComplexFloat32)])

    def get_rate_ratio(self):
        # per-channel rate; the [C] leading axis is a batch, not time
        return Fraction(1, self.num_channels)

    def out_batch_shape(self, in_batches):
        base = super().out_batch_shape(in_batches)
        return base + (self.num_channels,)

    def chunk_multiple(self):
        return self.num_channels

    def initialize(self):
        c = self.num_channels
        k = c * self.taps_per_branch
        # prototype lowpass at the channel Nyquist, unit DC gain
        self._proto = filter_design.firwin_lowpass(
            k, 1.0 / c, self.window).astype(np.float64)

    def init_state(self):
        k = self.num_channels * self.taps_per_branch
        return jnp.zeros((k,), dtype=jnp.complex64)

    def process(self, state, x):
        c = self.num_channels
        q = self.taps_per_branch
        k = c * q
        n = x.shape[-1]
        m = n // c
        lead = x.shape[:-1]

        # xin[k + t] = x[t]; output m' reads xin[k + m'C - k'], k' < K,
        # so indices span [1, k + (m-1)C] — all inside xin.
        xin = jnp.concatenate([state.astype(x.dtype), x], axis=-1)

        # One contiguous slice covers every branch window:
        # fr[u, j] = xin[1 + u*C + j], u in [0, m+q-1), j in [0, C)
        fr = xin[..., 1:1 + (m + q - 1) * c].reshape(lead + (m + q - 1, c))
        # branch p's decimated stream: brx[p, u] = xin[k + (u-(q-1))C - p]
        #                                        = fr[u, C-1-p]
        brx = jnp.moveaxis(jnp.flip(fr, axis=-1), -1, -2)  # [.., C, m+q-1]

        # per-branch causal FIR: v_p[m'] = sum_j hp[p, q-1-j] brx[p, m'+j]
        hp = self._proto.reshape(q, c).T.astype(np.float32)  # [C, q]
        v = jnp.zeros(lead + (c, m), dtype=x.dtype)
        for j in range(q):
            coef = jnp.asarray(hp[:, q - 1 - j])[:, None]
            v = v + coef * brx[..., j:j + m]

        # Inverse DFT across branches: y[c_out] = sum_p v_p e^{+j2pi co p/C},
        # which centers channel c at +c*rate/C (FFT ordering).
        y = (jnp.fft.ifft(v, axis=-2) * np.float32(c)).astype(jnp.complex64)

        new_state = xin[..., xin.shape[-1] - k:]
        return new_state, y


__all__ = ["ChannelizerBlock"]
