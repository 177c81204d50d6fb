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
    """Mono broadcast-FM capture at baseband (iqfile tune offset is 0)."""
    n = int(rate * seconds)
    t = np.arange(n) / rate
    audio = 0.8 * np.sin(2 * np.pi * tone * t)
    phi = 2 * np.pi * 75e3 * np.cumsum(audio) / rate
    # the iqfile input's default tune offset is 0, so the station sits at
    # baseband in the capture
    iq = np.exp(1j * phi).astype(np.complex64)
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
    with pytest.raises(SystemExit):
        main(["--ingest-stripes", "0", "--version"])  # rejected, not ignored
    with pytest.raises(SystemExit):
        main(["--ingest-stripes", "-3", "--version"])


def test_rx_wbfm_stereo_app(tmp_path):
    """Stereo MPX: L=1 kHz tone, R=400 Hz tone, 19 kHz pilot; the stereo
    matrix must separate the channels."""
    rate = 1102500.0
    n = int(rate * 0.25)
    t = np.arange(n) / rate
    left = 0.4 * np.sin(2 * np.pi * 1000.0 * t)
    right = 0.4 * np.sin(2 * np.pi * 400.0 * t)
    # cosine-referenced pilot and 38 kHz subcarrier (broadcast convention:
    # the subcarrier is the doubled pilot in phase)
    pilot = 0.1 * np.cos(2 * np.pi * 19e3 * t)
    sub = (left - right) * np.cos(2 * np.pi * 38e3 * t)
    mpx = (left + right) + pilot + sub
    phi = 2 * np.pi * 75e3 * np.cumsum(mpx) / rate
    iq = np.exp(1j * phi).astype(np.complex64)  # station at baseband
    cap = str(tmp_path / "st.iq")
    wav = str(tmp_path / "st.wav")
    with open(cap, "wb") as f:
        f.write(format_utils.complex_to_bytes(
            iq, format_utils.get_format("f32le")))

    rc = main(["-a", "rx_wbfm", "-i", f"iqfile:{cap},rate={rate:.0f}",
               "-o", f"wavfile:{wav}", "100e6"])
    assert rc == 0
    import wave
    w = wave.open(wav)
    assert w.getnchannels() == 2
    pcm = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    pcm = pcm.reshape(-1, 2) / 32767.5
    assert len(pcm) > 8000
    seg = slice(4096, 4096 + 4096)

    def tone_power(ch, freq):
        spec = np.abs(np.fft.rfft(pcm[seg, ch] * np.hanning(4096)))
        idx = int(round(freq * 4096 / 44100))
        return spec[max(0, idx - 2):idx + 3].max()

    # left channel: 1 kHz dominant over 400 Hz; right channel: vice versa
    assert tone_power(0, 1000) > 3 * tone_power(0, 400)
    assert tone_power(1, 400) > 3 * tone_power(1, 1000)
