"""Visualizer artifacts: .dat peaks format, data-dir assembly, site install."""

import json

import numpy as np
import pytest

from multilingual_kws_tpu.api.visualizer import (
    assemble_visualizer_data,
    install_site,
    read_waveform_dat,
    waveform_peaks,
    write_waveform_dat,
)
from multilingual_kws_tpu.utils.wav import write_wav


def test_waveform_peaks_minmax():
    x = np.zeros(1024, np.float32)
    x[100] = 0.75
    x[300] = -0.5
    peaks = waveform_peaks(x, samples_per_pixel=256)
    assert peaks.shape == (4, 2)
    assert peaks[0, 1] == pytest.approx(0.75)
    assert peaks[1, 0] == pytest.approx(-0.5)


def test_dat_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.3, 48000).clip(-1, 1).astype(np.float32)
    wav = tmp_path / "a.wav"
    write_wav(wav, audio)
    dat = tmp_path / "a.dat"
    write_waveform_dat(wav, dat, bits=8)
    hdr, data = read_waveform_dat(dat)
    assert hdr["version"] == 1 and hdr["bits"] == 8
    assert hdr["sample_rate"] == 16000 and hdr["samples_per_pixel"] == 256
    assert data.shape == (int(np.ceil(48000 / 256)), 2)
    # peaks bracket zero and reflect the signal's amplitude scale
    assert data[:, 0].min() < -20 and data[:, 1].max() > 20

    write_waveform_dat(wav, tmp_path / "b.dat", bits=16)
    hdr16, data16 = read_waveform_dat(tmp_path / "b.dat")
    assert hdr16["bits"] == 16
    np.testing.assert_allclose(
        data16[:, 1] / 32767, data[:, 1] / 127, atol=2 / 127
    )


def test_assemble_and_install(tmp_path):
    audio = np.zeros(16000, np.float32)
    wav = tmp_path / "stream_src.wav"
    write_wav(wav, audio)
    detections = dict(
        keywords=["kw"],
        detections=[dict(keyword="kw", time_ms=500, confidence=0.93,
                         groundtruth="tp")],
        min_threshold=0.9,
    )
    viz = tmp_path / "viz"
    files = assemble_visualizer_data(viz / "data", wav, detections)
    names = {f.name for f in files}
    assert names == {"stream.dat", "stream.wav", "detections.json"}
    with open(viz / "data/detections.json") as fh:
        assert json.load(fh)["keywords"] == ["kw"]
    # overwrite guard (reference run.py:160-171 semantics)
    with pytest.raises(FileExistsError):
        assemble_visualizer_data(viz / "data", wav, detections)
    assemble_visualizer_data(viz / "data", wav, detections, overwrite=True)

    site = install_site(viz)
    text = site.read_text()
    assert "detections.json" in text and "stream.dat" in text
