"""Multi-host (DCN) execution validation: N JAX processes on this machine
(each with its own virtual CPU devices) run ONE flow graph as a single
global SPMD program over a process-spanning mesh — the single-machine
analog of a TPU pod with DCN between hosts, runnable without pod hardware.

Scenarios (each compared against an in-process serial run):

* ``wbfm_time`` — the rx_wbfm mono chain with its TIME axis sharded over
  every device of every process: halo/prefix collectives cross process
  boundaries (Gloo/DCN), each host ingests the full file but commits only
  its local block, and each host's sink writes its contiguous per-chunk
  block (per-host output shards, reassembled here).

* ``wbfm_resident`` — the same chain with the repeating input file held
  as a DEVICE-RESIDENT ring replicated over the process-spanning mesh
  (every host decodes its own copy of the file once; zero steady-state
  host link traffic), each shard slicing its window in-graph.

* ``wbfm_wire`` — the same chain fed from a u8 IQ capture shipped as RAW
  wire bytes: every host reads the full wire chunk, commits only its
  local block, and the u8->float conversion runs on-device inside the
  sharded program.

* ``channel_bank`` — a banked clock-recovery/sampler/Manchester graph on a
  process-spanning ("channel",) mesh: each host owns whole channels, runs
  the mid-graph HOST blocks (decoders) only for its local channels, and
  keeps per-channel outputs host-local.

* ``rds_bank`` — the protocol capstone: the FULL RDSReceiver (pilot
  recovery -> 57 kHz coherent demod -> RRC -> clock recovery ->
  Manchester -> differential -> framer -> decoder) on a process-spanning
  ("channel",) mesh, every channel's decoded RDS groups bit-identical to
  its serial run (the DCN analog of the reference running one graph both
  multiprocess and single-process against one golden vector,
  /root/reference/tests/top_spec.lua:13-55).

* ``overhead`` — the wbfm chain, 4 time shards as 1 process x 4 devices
  vs 2 processes x 2 devices: the measured multihost (DCN) overhead
  relative to the same-shard-count single-process mesh.

Run as a script to produce MULTIHOST_r{N}.json; the pytest wrappers in
tests/parallel/test_multihost.py run the same scenarios at small sizes.

Reference analog: the reference's only distribution mechanism is one OS
process per block + socketpairs on one machine
(/root/reference/radio/core/composite.lua:568-636); this is its DCN-scale
replacement.
"""

from __future__ import annotations

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

CHUNK = 1 << 14
N_CHUNKS = 4
DECIM = 8


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# worker side (runs in each spawned process)

def _init_worker(pid: int, nproc: int, port: int, devs_per_proc: int):
    # force OUR device count even when the parent (e.g. pytest's conftest)
    # exported a different xla_force_host_platform_device_count
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={devs_per_proc}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from luaradio_tpu.parallel import multihost
    multihost.initialize(f"localhost:{port}", nproc, pid)
    return jax


def _wbfm_chain(lr, src, out_path):
    top = lr.CompositeBlock()
    top.connect(
        src,
        lr.FrequencyTranslatorBlock(-50e3),
        lr.LowpassFilterBlock(64, 100e3, use_fft=False),
        lr.FrequencyDiscriminatorBlock(1.25),
        lr.FMDeemphasisFilterBlock(75e-6),
        lr.DownsamplerBlock(DECIM),
        lr.RealFileSink(out_path, "f32le"))
    return top


def worker_wbfm_time(pid: int, nproc: int, port: int, tmpdir: str,
                     devs_per_proc: int):
    jax = _init_worker(pid, nproc, port, devs_per_proc)
    from jax.sharding import Mesh
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    mesh = Mesh(np.array(jax.devices()), ("time",))
    top = _wbfm_chain(
        lr, lr.IQFileSource(os.path.join(tmpdir, "x.iq"), "f32le", 256e3),
        os.path.join(tmpdir, f"out_p{pid}.f32"))
    Runner(top, mode="fused", chunk_size=CHUNK, mesh=mesh).run()


def worker_wbfm_resident(pid: int, nproc: int, port: int, tmpdir: str,
                         devs_per_proc: int):
    jax = _init_worker(pid, nproc, port, devs_per_proc)
    from jax.sharding import Mesh
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    mesh = Mesh(np.array(jax.devices()), ("time",))
    top = _wbfm_chain(
        lr, lr.IQFileSource(os.path.join(tmpdir, "x.iq"), "f32le", 256e3,
                            repeat_on_eof=True, resident=True),
        os.path.join(tmpdir, f"res_p{pid}.f32"))
    r = Runner(top, mode="fused", chunk_size=CHUNK, mesh=mesh,
               ingest="resident")
    assert r._resident_mesh_srcs, "resident ingest did not engage"
    r.run(max_chunks=N_CHUNKS)


def worker_wbfm_wire(pid: int, nproc: int, port: int, tmpdir: str,
                     devs_per_proc: int):
    jax = _init_worker(pid, nproc, port, devs_per_proc)
    from jax.sharding import Mesh
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    mesh = Mesh(np.array(jax.devices()), ("time",))
    top = _wbfm_chain(
        lr, lr.IQFileSource(os.path.join(tmpdir, "x_u8.iq"), "u8", 256e3),
        os.path.join(tmpdir, f"wire_p{pid}.f32"))
    r = Runner(top, mode="fused", chunk_size=CHUNK, mesh=mesh, ingest="wire")
    assert r._wire_srcs, "wire ingest did not engage"
    r.run()


def worker_wbfm_timed(pid: int, nproc: int, port: int, tmpdir: str,
                      devs_per_proc: int):
    """Timed steady-state pump for the overhead metric: one warmup chunk
    (compile), then K timed chunks + drain; seconds written per pid."""
    import time as _time
    jax = _init_worker(pid, nproc, port, devs_per_proc)
    from jax.sharding import Mesh
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    k = 16
    mesh = Mesh(np.array(jax.devices()), ("time",))
    top = lr.CompositeBlock()
    top.connect(
        lr.IQFileSource(os.path.join(tmpdir, "x.iq"), "f32le", 256e3,
                        repeat_on_eof=True),
        lr.FrequencyTranslatorBlock(-50e3),
        lr.LowpassFilterBlock(64, 100e3, use_fft=False),
        lr.FrequencyDiscriminatorBlock(1.25),
        lr.FMDeemphasisFilterBlock(75e-6),
        lr.DownsamplerBlock(DECIM),
        lr.BenchmarkSink())

    def drain():
        for seg, _ in r.stage_plan:
            if seg is not None:
                seg.drain()

    r = Runner(top, mode="fused", chunk_size=CHUNK, mesh=mesh)
    r._pump_once()                      # compile + first dispatch
    drain()
    t0 = _time.perf_counter()
    for _ in range(k):
        r._pump_once()
    drain()
    dt = _time.perf_counter() - t0
    r._cleanup_once()
    with open(os.path.join(tmpdir, f"timed_p{pid}_{nproc}.txt"), "w") as f:
        f.write(repr(dt))


def worker_rds_bank(pid: int, nproc: int, port: int, tmpdir: str,
                    devs_per_proc: int):
    jax = _init_worker(pid, nproc, port, devs_per_proc)
    from jax.sharding import Mesh
    import luaradio_tpu as lr
    from luaradio_tpu.core.block import Input
    from luaradio_tpu.core.runtime import Runner
    from luaradio_tpu.blocks.sources.bank import BankSource

    devices = jax.devices()
    channels = len(devices)
    mesh = Mesh(np.array(devices), ("channel",))

    class Collect(lr.SinkBlock):
        def __init__(self):
            super().__init__()
            self.rows = []
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            self.rows.append([p.to_json() for p in x])

    sink = Collect()
    src = BankSource([
        lr.IQFileSource(os.path.join(tmpdir, f"rds{c}.iq"), "f32le", 228e3)
        for c in range(channels)])
    top = lr.CompositeBlock()
    top.connect(src, lr.RDSReceiver(), sink)
    r = Runner(top, mode="fused", chunk_size=CHUNK, mesh=mesh,
               channels=channels)
    r.run()
    lo, hi = r._chan_local
    with open(os.path.join(tmpdir, f"rds_p{pid}.pkl"), "wb") as f:
        pickle.dump({"chan_lo": lo, "chan_hi": hi, "rows": sink.rows}, f)


class _PickleSink:
    """Created inside the worker (needs luaradio_tpu imported first)."""


def worker_channel_bank(pid: int, nproc: int, port: int, tmpdir: str,
                        devs_per_proc: int):
    jax = _init_worker(pid, nproc, port, devs_per_proc)
    from jax.sharding import Mesh
    import luaradio_tpu as lr
    from luaradio_tpu.core.block import Input
    from luaradio_tpu.core.runtime import Runner
    from luaradio_tpu.blocks.sources.bank import BankSource

    devices = jax.devices()
    channels = len(devices)
    mesh = Mesh(np.array(devices), ("channel",))

    class Collect(lr.SinkBlock):
        def __init__(self):
            super().__init__()
            self.rows = []
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            self.rows.append(np.asarray(x))

    sink = Collect()
    src = BankSource([
        lr.RealFileSource(os.path.join(tmpdir, f"c{c}.f32"), "f32le", 16.0)
        for c in range(channels)])
    top = lr.CompositeBlock()
    zccr = lr.ZeroCrossingClockRecoveryBlock(1.0)
    sampler = lr.SamplerBlock()
    top.connect(src, zccr)
    top.connect(src, "out", sampler, "data")
    top.connect(zccr, "out", sampler, "clock")
    top.connect(sampler, lr.SlicerBlock(), lr.ManchesterDecoderBlock(), sink)
    r = Runner(top, mode="fused", chunk_size=CHUNK, mesh=mesh,
               channels=channels)
    r.run()
    lo, hi = r._chan_local
    with open(os.path.join(tmpdir, f"bank_p{pid}.pkl"), "wb") as f:
        pickle.dump({"chan_lo": lo, "chan_hi": hi, "rows": sink.rows}, f)


# ---------------------------------------------------------------------------
# parent side

def _spawn(scenario: str, nproc: int, tmpdir: str, devs_per_proc: int,
           timeout: float = 600.0):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", scenario,
             str(pid), str(nproc), str(port), tmpdir, str(devs_per_proc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    rcs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
        rcs.append(p.returncode)
    if any(rc != 0 for rc in rcs):
        raise RuntimeError(
            f"multihost workers failed rc={rcs}:\n" +
            "\n".join(o[-2000:] for o in outs))
    return outs


def run_wbfm_time(tmpdir: str, nproc: int = 2, devs_per_proc: int = 2):
    """Returns a result dict; raises on worker failure."""
    import jax
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    n = CHUNK * N_CHUNKS
    rng = np.random.default_rng(11)
    x = (np.exp(1j * 0.3 * np.cumsum(rng.standard_normal(n)))
         ).astype(np.complex64)
    x.view(np.float32).tofile(os.path.join(tmpdir, "x.iq"))

    # serial reference (this process, no mesh)
    ref_path = os.path.join(tmpdir, "ref.f32")
    top = lr.CompositeBlock()
    top.connect(
        lr.IQFileSource(os.path.join(tmpdir, "x.iq"), "f32le", 256e3),
        lr.FrequencyTranslatorBlock(-50e3),
        lr.LowpassFilterBlock(64, 100e3, use_fft=False),
        lr.FrequencyDiscriminatorBlock(1.25),
        lr.FMDeemphasisFilterBlock(75e-6),
        lr.DownsamplerBlock(DECIM),
        lr.RealFileSink(ref_path, "f32le"))
    Runner(top, mode="fused", chunk_size=CHUNK).run()
    ref = np.fromfile(ref_path, dtype=np.float32)

    _spawn("wbfm_time", nproc, tmpdir, devs_per_proc)

    # reassemble: each host wrote its contiguous block of every chunk
    parts = [np.fromfile(os.path.join(tmpdir, f"out_p{p}.f32"),
                         dtype=np.float32) for p in range(nproc)]
    lchunk = CHUNK // DECIM // nproc
    got = np.concatenate([
        seg for i in range(N_CHUNKS)
        for seg in (parts[p][i * lchunk:(i + 1) * lchunk]
                    for p in range(nproc))])
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = float(np.max(np.abs(got - ref)))
    assert err < 1e-5, err
    return {"scenario": "wbfm_time", "n_processes": nproc,
            "devices_per_process": devs_per_proc,
            "time_shards": nproc * devs_per_proc,
            "samples": int(n), "max_abs_err_vs_serial": err, "ok": True}


def _write_fm_iq(path: str, n: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    x = (np.exp(1j * 0.3 * np.cumsum(rng.standard_normal(n)))
         ).astype(np.complex64)
    x.view(np.float32).tofile(path)
    return x


def _reassemble(tmpdir: str, stem: str, nproc: int, n_chunks: int):
    """Per-host per-chunk output blocks -> the global stream."""
    parts = [np.fromfile(os.path.join(tmpdir, f"{stem}_p{p}.f32"),
                         dtype=np.float32) for p in range(nproc)]
    lchunk = CHUNK // DECIM // nproc
    return np.concatenate([
        seg for i in range(n_chunks)
        for seg in (parts[p][i * lchunk:(i + 1) * lchunk]
                    for p in range(nproc))])


def run_wbfm_resident(tmpdir: str, nproc: int = 2, devs_per_proc: int = 2):
    """Device-resident ring ingest over a process-spanning mesh, vs the
    serial resident run (same repeating file, same chunk count)."""
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    _write_fm_iq(os.path.join(tmpdir, "x.iq"), CHUNK, seed=13)

    ref_path = os.path.join(tmpdir, "ref_res.f32")
    top = _wbfm_chain(
        lr, lr.IQFileSource(os.path.join(tmpdir, "x.iq"), "f32le", 256e3,
                            repeat_on_eof=True, resident=True),
        ref_path)
    r = Runner(top, mode="fused", chunk_size=CHUNK, ingest="resident")
    assert r._resident_srcs, "serial resident ingest did not engage"
    r.run(max_chunks=N_CHUNKS)
    ref = np.fromfile(ref_path, dtype=np.float32)
    assert len(ref) == N_CHUNKS * CHUNK // DECIM, len(ref)

    _spawn("wbfm_resident", nproc, tmpdir, devs_per_proc)
    got = _reassemble(tmpdir, "res", nproc, N_CHUNKS)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = float(np.max(np.abs(got - ref)))
    assert err < 1e-5, err
    return {"scenario": "wbfm_time_resident", "ingest": "resident",
            "n_processes": nproc, "devices_per_process": devs_per_proc,
            "time_shards": nproc * devs_per_proc,
            "samples": int(N_CHUNKS * CHUNK),
            "max_abs_err_vs_serial": err, "ok": True}


def run_wbfm_wire(tmpdir: str, nproc: int = 2, devs_per_proc: int = 2):
    """Raw u8 wire ingest (on-device conversion inside the sharded
    program) over a process-spanning mesh, vs the serial wire run."""
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    n = CHUNK * N_CHUNKS
    rng = np.random.default_rng(17)
    rng.integers(0, 256, 2 * n).astype(np.uint8).tofile(
        os.path.join(tmpdir, "x_u8.iq"))

    ref_path = os.path.join(tmpdir, "ref_wire.f32")
    top = _wbfm_chain(
        lr, lr.IQFileSource(os.path.join(tmpdir, "x_u8.iq"), "u8", 256e3),
        ref_path)
    r = Runner(top, mode="fused", chunk_size=CHUNK, ingest="wire")
    assert r._wire_srcs, "serial wire ingest did not engage"
    r.run()
    ref = np.fromfile(ref_path, dtype=np.float32)

    _spawn("wbfm_wire", nproc, tmpdir, devs_per_proc)
    got = _reassemble(tmpdir, "wire", nproc, N_CHUNKS)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = float(np.max(np.abs(got - ref)))
    assert err < 1e-5, err
    return {"scenario": "wbfm_time_wire", "ingest": "wire",
            "n_processes": nproc, "devices_per_process": devs_per_proc,
            "time_shards": nproc * devs_per_proc,
            "samples": int(n), "max_abs_err_vs_serial": err, "ok": True}


def run_rds_bank(tmpdir: str, nproc: int = 2, devs_per_proc: int = 2):
    """Protocol capstone: the full RDSReceiver on a process-spanning
    channel bank; every channel's decoded groups must equal its serial
    run exactly."""
    import luaradio_tpu as lr
    from luaradio_tpu.core.block import Input
    from luaradio_tpu.core.runtime import Runner
    from tests.parallel.test_rds_bank import make_rds_fm
    rng = np.random.default_rng(23)

    channels = nproc * devs_per_proc
    n = 6 * CHUNK
    per_chan_groups = []
    for c in range(channels):
        groups = [tuple(int(v) for v in rng.integers(0, 1 << 16, 4))
                  for _ in range(4)]
        per_chan_groups.append(groups)
        iq = make_rds_fm(n, groups).astype(np.complex64)
        iq.view(np.float32).tofile(os.path.join(tmpdir, f"rds{c}.iq"))

    class Collect(lr.SinkBlock):
        def __init__(self):
            super().__init__()
            self.rows = []
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            self.rows.append([p.to_json() for p in x])

    refs = []
    for c in range(channels):
        sink = Collect()
        top = lr.CompositeBlock()
        top.connect(lr.IQFileSource(os.path.join(tmpdir, f"rds{c}.iq"),
                                    "f32le", 228e3),
                    lr.RDSReceiver(), sink)
        Runner(top, mode="fused", chunk_size=CHUNK).run()
        refs.append([p for row in sink.rows for p in row])

    _spawn("rds_bank", nproc, tmpdir, devs_per_proc)

    checked = frames = 0
    for p in range(nproc):
        with open(os.path.join(tmpdir, f"rds_p{p}.pkl"), "rb") as f:
            d = pickle.load(f)
        lo, hi = d["chan_lo"], d["chan_hi"]
        nloc = hi - lo
        assert nloc == devs_per_proc, (lo, hi)
        for cl in range(nloc):
            got = [x for row in d["rows"][cl::nloc] for x in row]
            assert got == refs[lo + cl], (p, lo + cl)
            assert len(got) >= 3, (lo + cl, len(got))  # nonvacuous
            checked += 1
            frames += len(got)
    assert checked == channels
    return {"scenario": "rds_receiver_channel_bank",
            "n_processes": nproc, "devices_per_process": devs_per_proc,
            "channels": channels,
            "decoded_channels_matching_serial": checked,
            "total_rds_packets": frames, "ok": True}


def run_overhead(tmpdir: str, reps: int = 2):
    """Measured multihost overhead: the same 4-shard time mesh as
    1 process x 4 devices vs 2 processes x 2 devices (DCN collectives
    and per-process pumps vs in-process), steady-state pump time."""
    _write_fm_iq(os.path.join(tmpdir, "x.iq"), CHUNK, seed=29)

    def timed(nproc, dpp):
        best = float("inf")
        for _ in range(reps):
            _spawn("wbfm_timed", nproc, tmpdir, dpp)
            worst = 0.0
            for p in range(nproc):
                with open(os.path.join(tmpdir,
                                       f"timed_p{p}_{nproc}.txt")) as f:
                    worst = max(worst, float(f.read()))
            best = min(best, worst)
        return best

    t_single = timed(1, 4)
    t_multi = timed(2, 2)
    ovh = t_multi / t_single - 1.0
    return {"scenario": "overhead_vs_single_process",
            "time_shards": 4, "steady_state_chunks": 16,
            "chunk_size": CHUNK,
            "single_process_seconds": round(t_single, 3),
            "two_process_seconds": round(t_multi, 3),
            "overhead_vs_single": round(ovh, 3),
            "note": ("same 4-shard program, 1 process vs 2 processes over "
                     "Gloo on one machine (virtual CPU devices).  A "
                     "NEGATIVE value means the 2-process run was faster: "
                     "each process runs its own host pump (read, commit, "
                     "dispatch, fetch) for the same global program, so the "
                     "per-chunk host work parallelizes across processes "
                     "and more than pays for the cross-process collective "
                     "cost at this chunk size — the structural DCN "
                     "overhead is below measurement level here.  Not an "
                     "ICI/DCN bandwidth measurement."),
            "ok": True}


def run_channel_bank(tmpdir: str, nproc: int = 2, devs_per_proc: int = 2):
    import luaradio_tpu as lr
    from luaradio_tpu.core.block import Input
    from luaradio_tpu.core.runtime import Runner

    channels = nproc * devs_per_proc
    rng = np.random.default_rng(7)
    n = CHUNK * 2
    for c in range(channels):
        bits = rng.integers(0, 2, n // 16)
        data = (np.repeat(bits * 2.0 - 1.0, 16)
                + 0.01 * rng.standard_normal(n)).astype(np.float32)
        data.tofile(os.path.join(tmpdir, f"c{c}.f32"))

    # serial per-channel references
    class Collect(lr.SinkBlock):
        def __init__(self):
            super().__init__()
            self.rows = []
            self.add_type_signature([Input("in", lambda t: True)], [])

        def process(self, x):
            self.rows.append(np.asarray(x))

    refs = []
    for c in range(channels):
        sink = Collect()
        top = lr.CompositeBlock()
        src = lr.RealFileSource(os.path.join(tmpdir, f"c{c}.f32"), "f32le",
                                16.0)
        zccr = lr.ZeroCrossingClockRecoveryBlock(1.0)
        sampler = lr.SamplerBlock()
        top.connect(src, zccr)
        top.connect(src, "out", sampler, "data")
        top.connect(zccr, "out", sampler, "clock")
        top.connect(sampler, lr.SlicerBlock(), lr.ManchesterDecoderBlock(),
                    sink)
        Runner(top, mode="fused", chunk_size=CHUNK).run()
        refs.append(np.concatenate([r.reshape(-1) for r in sink.rows])
                    if sink.rows else np.zeros(0, np.uint8))

    _spawn("channel_bank", nproc, tmpdir, devs_per_proc)

    checked = 0
    for p in range(nproc):
        with open(os.path.join(tmpdir, f"bank_p{p}.pkl"), "rb") as f:
            d = pickle.load(f)
        lo, hi = d["chan_lo"], d["chan_hi"]
        nloc = hi - lo
        assert nloc == devs_per_proc, (lo, hi)
        # rows alternate local channels chunk by chunk
        for cl in range(nloc):
            got = np.concatenate([r.reshape(-1)
                                  for r in d["rows"][cl::nloc]])
            assert np.array_equal(got, refs[lo + cl]), (p, lo + cl)
            checked += 1
    assert checked == channels
    return {"scenario": "channel_bank", "n_processes": nproc,
            "devices_per_process": devs_per_proc, "channels": channels,
            "decoded_channels_matching_serial": checked, "ok": True}


def main():
    import tempfile
    results = []
    with tempfile.TemporaryDirectory() as td:
        results.append(run_wbfm_time(td, nproc=2, devs_per_proc=2))
    with tempfile.TemporaryDirectory() as td:
        results.append(run_wbfm_time(td, nproc=4, devs_per_proc=1))
    with tempfile.TemporaryDirectory() as td:
        results.append(run_wbfm_resident(td, nproc=2, devs_per_proc=2))
    with tempfile.TemporaryDirectory() as td:
        results.append(run_wbfm_wire(td, nproc=2, devs_per_proc=2))
    with tempfile.TemporaryDirectory() as td:
        results.append(run_channel_bank(td, nproc=2, devs_per_proc=2))
    with tempfile.TemporaryDirectory() as td:
        results.append(run_rds_bank(td, nproc=2, devs_per_proc=2))
    with tempfile.TemporaryDirectory() as td:
        results.append(run_overhead(td))
    out = {"ok": all(r["ok"] for r in results),
           "n_processes_max": max(r.get("n_processes", 1) for r in results),
           "transport": "gloo (DCN analog) between processes; virtual CPU "
                        "devices within each process",
           "results": results}
    print(json.dumps(out, indent=1))
    tag = os.environ.get("LUARADIO_TPU_ROUND", "r05")
    with open(os.path.join(REPO, f"MULTIHOST_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        scenario, pid, nproc, port, tmpdir, dpp = sys.argv[2:8]
        fn = {"wbfm_time": worker_wbfm_time,
              "wbfm_resident": worker_wbfm_resident,
              "wbfm_wire": worker_wbfm_wire,
              "wbfm_timed": worker_wbfm_timed,
              "rds_bank": worker_rds_bank,
              "channel_bank": worker_channel_bank}[scenario]
        fn(int(pid), int(nproc), int(port), tmpdir, int(dpp))
    else:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=2").strip()
        sys.path.insert(0, REPO)
        import jax
        jax.config.update("jax_platforms", "cpu")
        main()
