"""Host ingest path tests: read-ahead prefetcher, device-side wire-format
conversion, mmap wraparound, and the device-resident loop mode.

The reference reads and converts file samples on the host per chunk
(/root/reference/radio/blocks/sources/iqfile.lua:82-116); the TPU runtime
overlaps read/convert/transfer with device compute (core/runtime.py
_Prefetcher), ships integer wire formats raw for on-device conversion, and
keeps repeating files resident in device memory.  All of that must be
sample-exact against the host conversion path.
"""

import numpy as np
import pytest

import luaradio_tpu as lr
from luaradio_tpu.core.runtime import Runner
from luaradio_tpu.types import Float32
from luaradio_tpu.utils import format as format_utils

RNG = np.random.default_rng(99)


def _write_iq(path, x, fmt):
    with open(path, "wb") as f:
        f.write(format_utils.complex_to_bytes(
            x, format_utils.get_format(fmt)))


def _run_graph(src, out_path):
    top = lr.CompositeBlock()
    top.connect(src, lr.NopBlock(), lr.IQFileSink(str(out_path), "f32le"))
    return top


@pytest.mark.parametrize("fmt", ["u8", "s8", "s16le", "s16be", "u16le"])
def test_wire_ingest_matches_host_conversion(fmt, tmp_path):
    """Integer wire formats convert on-device bit-close to the host path."""
    n = 30000
    x = ((RNG.standard_normal(n) + 1j * RNG.standard_normal(n)) * 0.3
         ).astype(np.complex64)
    path = str(tmp_path / f"x.{fmt}.iq")
    _write_iq(path, x, fmt)
    wire_bytes = open(path, "rb").read()
    expect = format_utils.bytes_to_complex(
        wire_bytes, format_utils.get_format(fmt))

    out = tmp_path / "out.iq"
    src = lr.IQFileSource(path, fmt, 1e6)
    top = _run_graph(src, out)
    runner = Runner(top, mode="fused", chunk_size=8192)
    assert runner.wire_ingest, "device-side wire conversion not planned"
    runner.run()
    got = np.fromfile(out, dtype=np.complex64)
    assert got.shape == expect.shape
    assert np.max(np.abs(got - expect)) < 1e-6


def test_wire_ingest_disabled_for_host_consumers(tmp_path):
    """A source feeding a host block must deliver converted samples, not
    raw wire ints."""
    n = 4096
    x = (RNG.standard_normal(n) * 0.3).astype(np.float32)
    path = str(tmp_path / "x.u8.real")
    with open(path, "wb") as f:
        f.write(format_utils.real_to_bytes(
            x, format_utils.get_format("u8")))
    out = tmp_path / "out.f32"
    top = lr.CompositeBlock()
    # RealFileSink is a host block consuming the source directly
    top.connect(lr.RealFileSource(path, "u8", 1e6),
                lr.RealFileSink(str(out), "f32le"))
    runner = Runner(top, mode="fused", chunk_size=1024)
    assert not runner.wire_ingest
    runner.run()
    got = np.fromfile(out, dtype=np.float32)
    expect = format_utils.bytes_to_real(open(path, "rb").read(),
                                        format_utils.get_format("u8"))
    assert np.array_equal(got, expect)


def test_resident_loop_exact(tmp_path):
    """Device-resident repeat: chunk not a divisor of the file length, so
    windows wrap the ring; output must equal host-side tiling exactly."""
    n = 3000
    x = ((RNG.standard_normal(n) + 1j * RNG.standard_normal(n)) * 0.3
         ).astype(np.complex64)
    path = str(tmp_path / "loop.iq")
    _write_iq(path, x, "f32le")
    out = tmp_path / "out.iq"
    src = lr.IQFileSource(path, "f32le", 1e6, repeat_on_eof=True)
    top = _run_graph(src, out)
    runner = Runner(top, mode="fused", chunk_size=1024)
    assert runner._resident_srcs, "resident loop mode not enabled"
    runner.run(max_chunks=10)
    got = np.fromfile(out, dtype=np.complex64)
    expect = np.tile(x, 4)[:got.shape[0]]
    assert got.shape[0] >= 10 * 1024
    assert np.array_equal(got, expect)


def test_resident_loop_chunk_larger_than_file(tmp_path):
    """A chunk spanning multiple periods of the ring stays phase-exact."""
    n = 700
    x = (RNG.standard_normal(n) * 0.5).astype(np.float32)
    path = str(tmp_path / "loop.f32")
    with open(path, "wb") as f:
        f.write(x.tobytes())
    out = tmp_path / "out.f32"
    top = lr.CompositeBlock()
    top.connect(lr.RealFileSource(path, "f32le", 1e6, repeat_on_eof=True),
                lr.NopBlock(), lr.RealFileSink(str(out), "f32le"))
    runner = Runner(top, mode="fused", chunk_size=2048)
    assert runner._resident_srcs
    runner.run(max_chunks=5)
    got = np.fromfile(out, dtype=np.float32)
    expect = np.tile(x, 20)[:got.shape[0]]
    assert got.shape[0] >= 5 * 2048
    assert np.array_equal(got, expect)


def test_resident_opt_out_streams_with_mmap_wrap(tmp_path):
    """resident=False keeps host streaming; the mmap reader's wraparound
    (repeat_on_eof) must produce the same tiled stream."""
    n = 3000
    x = ((RNG.standard_normal(n) + 1j * RNG.standard_normal(n)) * 0.3
         ).astype(np.complex64)
    path = str(tmp_path / "loop.iq")
    _write_iq(path, x, "f32le")
    out = tmp_path / "out.iq"
    src = lr.IQFileSource(path, "f32le", 1e6, repeat_on_eof=True,
                          resident=False)
    top = _run_graph(src, out)
    runner = Runner(top, mode="fused", chunk_size=7168)
    assert not runner._resident_srcs
    runner.run(max_chunks=4)
    got = np.fromfile(out, dtype=np.complex64)
    expect = np.tile(x, 12)[:got.shape[0]]
    assert got.shape[0] >= 4 * 7168
    assert np.array_equal(got, expect)


def test_prefetcher_propagates_reader_errors(tmp_path):
    """An exception in the read-ahead thread surfaces from run() (the
    analog of the reference's child-crash supervision, composite.lua:773)."""
    from luaradio_tpu.core.block import HostSourceBlock, Output
    from luaradio_tpu.types import ComplexFloat32

    class Crashy(HostSourceBlock):
        def __init__(self):
            super().__init__()
            self.rate = 1e6
            self.n = 0
            self.add_type_signature([], [Output("out", ComplexFloat32)])

        def read(self, n):
            self.n += 1
            if self.n > 2:
                raise RuntimeError("boom in reader thread")
            return np.zeros(n, dtype=np.complex64)

    top = lr.CompositeBlock()
    top.connect(Crashy(), lr.NopBlock(), lr.NopSink())
    runner = Runner(top, mode="fused", chunk_size=1024)
    with pytest.raises(RuntimeError, match="boom in reader thread"):
        runner.run()


def test_eager_mode_bypasses_prefetch_and_wire(tmp_path):
    """Eager (debug) mode must keep the synchronous host-conversion path."""
    n = 5000
    x = ((RNG.standard_normal(n) + 1j * RNG.standard_normal(n)) * 0.3
         ).astype(np.complex64)
    path = str(tmp_path / "x.u8.iq")
    _write_iq(path, x, "u8")
    expect = format_utils.bytes_to_complex(
        open(path, "rb").read(), format_utils.get_format("u8"))
    out = tmp_path / "out.iq"
    src = lr.IQFileSource(path, "u8", 1e6)
    top = _run_graph(src, out)
    runner = Runner(top, mode="eager", chunk_size=1024)
    assert not runner.wire_ingest
    runner.run()
    got = np.fromfile(out, dtype=np.complex64)
    assert np.max(np.abs(got - expect)) < 1e-6


def test_resident_rejects_oversized_file_by_size_alone(tmp_path, monkeypatch):
    """A looping file bigger than the resident budget must be rejected from
    its SIZE, without decoding the whole file into host memory first."""
    n = 4096
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
         ).astype(np.complex64)
    path = str(tmp_path / "big.iq")
    _write_iq(path, x, "f32le")
    monkeypatch.setenv("LUARADIO_TPU_RESIDENT_BUDGET", str(1024))
    src = lr.IQFileSource(path, "f32le", 1e6, repeat_on_eof=True)

    def boom():
        raise AssertionError("_decode_all called for an oversized file")
    src._decode_all = boom
    assert src.resident_setup(1024) is False
    src.cleanup()


def test_prefetcher_bounded_by_max_chunks(tmp_path):
    """Runner.run(max_chunks=N) must not read source chunks it will never
    consume (the read-ahead thread is bounded by the chunk budget)."""
    from luaradio_tpu.core.block import HostSourceBlock, Output
    from luaradio_tpu.types import Float32

    class CountingSource(HostSourceBlock):
        def __init__(self):
            super().__init__()
            self.rate = 1e6
            self.reads = 0
            self.add_type_signature([], [Output("out", Float32)])

        def read(self, n):
            self.reads += 1
            return RNG.standard_normal(n).astype(np.float32)

    src = CountingSource()
    top = lr.CompositeBlock()
    top.connect(src, lr.MultiplyConstantBlock(2.0), lr.NopSink())
    r = Runner(top, mode="fused", chunk_size=1024)
    r.run(max_chunks=3)
    assert src.reads == 3


def test_resident_loop_under_time_mesh(tmp_path):
    """Device-resident ring under a ("time",) mesh: the ring replicates
    across shards and each shard slices its own window in-graph; output
    must equal the serial resident run exactly (incl. ring wraparound)."""
    import jax
    from jax.sharding import Mesh

    n = 3000
    x = ((RNG.standard_normal(n) + 1j * RNG.standard_normal(n)) * 0.3
         ).astype(np.complex64)
    path = str(tmp_path / "loop.iq")
    _write_iq(path, x, "f32le")

    def run(mesh, out):
        src = lr.IQFileSource(path, "f32le", 1e6, repeat_on_eof=True)
        top = _run_graph(src, out)
        r = Runner(top, mode="fused", chunk_size=1024, mesh=mesh,
                   ingest="resident")
        assert r._resident_srcs
        # the chunk window is sliced in-graph on every path (round 5:
        # a separate slicing dispatch cost ~3x end-to-end on the tunnel)
        assert r._resident_mesh_srcs == r._resident_srcs
        r.run(max_chunks=8)

    a, b = tmp_path / "serial.iq", tmp_path / "mesh.iq"
    run(None, a)
    run(Mesh(np.array(jax.devices("cpu")[:8]), ("time",)), b)
    xa = np.fromfile(str(a), dtype=np.complex64)
    xb = np.fromfile(str(b), dtype=np.complex64)
    assert xa.shape == xb.shape and np.array_equal(xa, xb)


def test_wire_ingest_under_time_mesh(tmp_path):
    """u8 wire samples convert on-device inside the sharded program; the
    stream equals the serial wire run bit-exactly."""
    import jax
    from jax.sharding import Mesh

    raw = RNG.integers(0, 256, 2 * 4096, dtype=np.uint8)
    path = str(tmp_path / "w.iq")
    raw.tofile(path)

    def run(mesh, out):
        src = lr.IQFileSource(path, "u8", 1e6)
        top = _run_graph(src, out)
        r = Runner(top, mode="fused", chunk_size=1024, mesh=mesh,
                   ingest="wire")
        assert r._wire_srcs
        r.run()

    a, b = tmp_path / "serial.iq", tmp_path / "mesh.iq"
    run(None, a)
    run(Mesh(np.array(jax.devices("cpu")[:4]), ("time",)), b)
    xa = np.fromfile(str(a), dtype=np.complex64)
    xb = np.fromfile(str(b), dtype=np.complex64)
    assert xa.shape == xb.shape and np.array_equal(xa, xb)


def test_ingest_mode_forcing_errors(tmp_path):
    """ingest='wire'/'resident' raise clear errors when unsupported;
    ingest='stream' disables both optimizations."""
    x = (RNG.standard_normal(256) + 1j * RNG.standard_normal(256)
         ).astype(np.complex64)
    path = str(tmp_path / "x.iq")
    _write_iq(path, x, "f32le")

    # f32 has no wire conversion
    top = _run_graph(lr.IQFileSource(path, "f32le", 1e6),
                     tmp_path / "o1.iq")
    with pytest.raises(ValueError, match="ingest='wire'"):
        Runner(top, mode="fused", chunk_size=128, ingest="wire")

    # non-repeating source cannot be resident
    top = _run_graph(lr.IQFileSource(path, "f32le", 1e6),
                     tmp_path / "o2.iq")
    with pytest.raises(ValueError, match="ingest='resident'"):
        Runner(top, mode="fused", chunk_size=128, ingest="resident")

    # stream disables the resident ring a repeating source would get
    top = _run_graph(lr.IQFileSource(path, "f32le", 1e6,
                                     repeat_on_eof=True), tmp_path / "o3.iq")
    r = Runner(top, mode="fused", chunk_size=128, ingest="stream")
    assert not r._resident_srcs and not r._wire_srcs


def test_ingest_wire_forced_wins_over_resident(tmp_path):
    """ingest='wire' must keep the wire path even for a repeating file the
    auto policy would promote to a device-resident ring (round-4 review:
    the forced-mode contract was silently overridden)."""
    raw = RNG.integers(0, 256, 2 * 2048, dtype=np.uint8)
    path = str(tmp_path / "loop.iq")
    raw.tofile(path)
    top = _run_graph(lr.IQFileSource(path, "u8", 1e6, repeat_on_eof=True),
                     tmp_path / "o.iq")
    r = Runner(top, mode="fused", chunk_size=512, ingest="wire")
    assert r._wire_srcs and not r._resident_srcs
    r.run(max_chunks=4)
