"""Application + CLI tests: run rx_wbfm (mono) and iq_converter through the
application dispatcher end-to-end on synthetic captures."""

import numpy as np
import pytest

import luaradio_tpu as radio
from luaradio_tpu.applications import APPLICATIONS, make_input, parse_spec
from luaradio_tpu.cli import Args, main
from luaradio_tpu.utils import format as format_utils

RNG = np.random.default_rng(77)


def _make_fm_capture(path, rate=1102500.0, tone=1200.0, seconds=0.12):
    """Mono broadcast-FM capture at +250 kHz offset (the app tunes -250k)."""
    n = int(rate * seconds)
    t = np.arange(n) / rate
    audio = 0.8 * np.sin(2 * np.pi * tone * t)
    phi = 2 * np.pi * 75e3 * np.cumsum(audio) / rate
    baseband = np.exp(1j * phi)
    carrier = np.exp(1j * 2 * np.pi * 250e3 * t)  # station at +tune_offset
    iq = (baseband * carrier).astype(np.complex64)
    with open(path, "wb") as f:
        f.write(format_utils.complex_to_bytes(
            iq, format_utils.get_format("f32le")))
    return n


def test_rx_wbfm_mono_app(tmp_path):
    cap = str(tmp_path / "fm.iq")
    wav = str(tmp_path / "out.wav")
    _make_fm_capture(cap)
    rc = main(["-a", "rx_wbfm",
               "-i", f"iqfile:{cap},rate=1102500",
               "-o", f"wavfile:{wav}",
               "100e6", "--mono"])
    assert rc == 0
    import wave
    w = wave.open(wav)
    assert w.getframerate() == 44100
    assert w.getnchannels() == 1
    pcm = np.frombuffer(w.readframes(w.getnframes()),
                        dtype=np.int16) / 32767.5
    assert len(pcm) > 3000
    spec = np.abs(np.fft.rfft(pcm[1024:4096]))
    peak_hz = np.argmax(spec) * 44100 / (4096 - 1024)
    assert abs(peak_hz - 1200.0) < 40.0


def test_iq_converter_app(tmp_path):
    src = str(tmp_path / "in.iq")
    dst = str(tmp_path / "out.iq")
    x = (RNG.uniform(-0.9, 0.9, 3000) + 1j * RNG.uniform(-0.9, 0.9, 3000)
         ).astype(np.complex64)
    with open(src, "wb") as f:
        f.write(format_utils.complex_to_bytes(
            x, format_utils.get_format("f32le")))
    rc = main(["-a", "iq_converter",
               "-i", f"iqfile:{src},format=f32le,rate=1e6",
               "-o", f"iqfile:{dst},format=s16le"])
    assert rc == 0
    raw = np.fromfile(dst, dtype="<i2")
    back = (raw[0::2] + 1j * raw[1::2]) / 32767.5
    assert len(back) == len(x)
    assert np.max(np.abs(back - x)) < 1e-4


def test_spec_parsing():
    name, args, options = parse_spec("iqfile:cap.iq,f32le,rate=1e6,repeat=1")
    assert name == "iqfile"
    assert args == ["cap.iq", "f32le"]
    assert options == {"rate": "1e6", "repeat": "1"}


def test_all_applications_registered():
    assert sorted(APPLICATIONS) == [
        "iq_converter", "rx_am", "rx_ax25", "rx_ert", "rx_nbfm",
        "rx_pocsag", "rx_raw", "rx_rds", "rx_ssb", "rx_wbfm"]


def test_cli_version_and_errors(capsys):
    assert main(["--version"]) == 0
    assert "luaradio_tpu" in capsys.readouterr().out
    with pytest.raises(ValueError, match="unknown application"):
        main(["-a", "rx_nope", "-i", "iqfile:x", "-o", "print"])
    with pytest.raises(SystemExit):
        main(["-a", "rx_wbfm"])  # missing -i/-o
