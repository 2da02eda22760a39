"""The STFT spectrogram kernel must recover the ground-truth sinusoid
frequencies baked into the WAV fixture — end-to-end proof the RIFF parse +
Hann window + rfft chain is computing real DSP, not a stub."""

import collections

import numpy as np

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.wavcodec import (
    N_AUDIO,
    SAMPLE_RATE,
    click_position,
)

REG = load_all()
NFFT = 256
BIN_HZ = SAMPLE_RATE / NFFT  # 31.25 Hz resolution


def _ground_truth_f1(audio_id: int) -> float:
    return 200 + (audio_id % 10) * 40  # wavcodec.synth_audio's dominant tone


def test_dominant_frequency_matches_fixture_tone(spark, sf_dir):
    rows = REG["audio_spectrogram_peaks"].fn(spark, sf_dir).collect()
    assert rows
    by_clip = collections.defaultdict(list)
    for r in rows:
        aid = int(r["path"].rsplit("clip_", 1)[1][:3])
        by_clip[aid].append(r)
    assert len(by_clip) == N_AUDIO
    for aid, clip_rows in by_clip.items():
        # exclude the two windows around the broadband click impulse
        click_win = click_position(aid) // NFFT
        usable = [r for r in clip_rows if abs(r["window_idx"] - click_win) > 1]
        modal_hz = collections.Counter(r["dominant_hz"] for r in usable).most_common(1)[0][0]
        f1 = _ground_truth_f1(aid)
        assert abs(modal_hz - f1) <= BIN_HZ, (aid, modal_hz, f1)


def test_band_energies_follow_tone_placement(spark, sf_dir):
    # f1 in [200, 560] Hz -> e_low+e_mid dominates; f2 in [900, 1260] -> e_mid.
    # The high band holds only noise + click leakage, so summed over a clip
    # it must be the smallest of the three.
    rows = REG["audio_spectrogram_peaks"].fn(spark, sf_dir).collect()
    by_clip = collections.defaultdict(lambda: np.zeros(3))
    for r in rows:
        aid = int(r["path"].rsplit("clip_", 1)[1][:3])
        by_clip[aid] += np.array([r["e_low"], r["e_mid"], r["e_high"]])
    for aid, (lo, mid, hi) in by_clip.items():
        assert hi < lo + mid, (aid, lo, mid, hi)


def test_spectrogram_plan_is_shuffle_free(spark, sf_dir):
    df = REG["audio_spectrogram_peaks"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_resample_preserves_dominant_tone_and_energy(spark, sf_dir):
    """After anti-aliased 2x decimation the dominant frequency must still
    be the clip's ground-truth f1 (all tones sit below the new Nyquist),
    and the RMS must stay within a few percent (the moving-average filter
    only sheds high-frequency noise energy)."""
    rows = REG["audio_resample_decimate"].fn(spark, sf_dir).collect()
    assert len(rows) == N_AUDIO
    for r in rows:
        aid = int(r["path"].rsplit("clip_", 1)[1][:3])
        f1 = _ground_truth_f1(aid)
        bin_hz = r["rate_out"] / 512  # matches the kernel's nfft
        assert r["rate_out"] == SAMPLE_RATE // 2
        assert abs(r["dominant_hz_out"] - f1) <= bin_hz, (aid, r["dominant_hz_out"], f1)
        assert abs(r["rms_out"] - r["rms_in"]) / r["rms_in"] < 0.1, aid
