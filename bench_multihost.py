"""Multi-host (DCN) execution validation: N JAX processes on this machine
(each with its own virtual CPU devices) run ONE flow graph as a single
global SPMD program over a process-spanning mesh — the single-machine
analog of a TPU pod with DCN between hosts, runnable without pod hardware.

Two scenarios (both compared against an in-process serial run):

* ``wbfm_time`` — the rx_wbfm mono chain with its TIME axis sharded over
  every device of every process: halo/prefix collectives cross process
  boundaries (Gloo/DCN), each host ingests the full file but commits only
  its local block, and each host's sink writes its contiguous per-chunk
  block (per-host output shards, reassembled here).

* ``channel_bank`` — a banked clock-recovery/sampler/Manchester graph on a
  process-spanning ("channel",) mesh: each host owns whole channels, runs
  the mid-graph HOST blocks (decoders) only for its local channels, and
  keeps per-channel outputs host-local.

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


def worker_wbfm_time(pid: int, nproc: int, port: int, tmpdir: str,
                     devs_per_proc: int):
    jax = _init_worker(pid, nproc, port, devs_per_proc)
    from jax.sharding import Mesh
    import luaradio_tpu as lr
    from luaradio_tpu.core.runtime import Runner

    mesh = Mesh(np.array(jax.devices()), ("time",))
    top = lr.CompositeBlock()
    top.connect(
        lr.IQFileSource(os.path.join(tmpdir, "x.iq"), "f32le", 256e3),
        lr.FrequencyTranslatorBlock(-50e3),
        lr.LowpassFilterBlock(64, 100e3, use_fft=False),
        lr.FrequencyDiscriminatorBlock(1.25),
        lr.FMDeemphasisFilterBlock(75e-6),
        lr.DownsamplerBlock(DECIM),
        lr.RealFileSink(os.path.join(tmpdir, f"out_p{pid}.f32"), "f32le"))
    Runner(top, mode="fused", chunk_size=CHUNK, mesh=mesh).run()


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
        results.append(run_channel_bank(td, nproc=2, devs_per_proc=2))
    out = {"ok": all(r["ok"] for r in results),
           "n_processes_max": max(r["n_processes"] for r in results),
           "transport": "gloo (DCN analog) between processes; virtual CPU "
                        "devices within each process",
           "results": results}
    print(json.dumps(out, indent=1))
    tag = os.environ.get("LUARADIO_TPU_ROUND", "r04")
    with open(os.path.join(REPO, f"MULTIHOST_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        scenario, pid, nproc, port, tmpdir, dpp = sys.argv[2:8]
        fn = {"wbfm_time": worker_wbfm_time,
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
