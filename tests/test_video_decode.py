"""PNGV video-container tests: byte-exact frame decode, header-only seek,
and the known motion trajectory recovered through the full Spark pipeline.
"""

import numpy as np
import pytest

from distributed_deep_learning_with_apache_spark_spark.sources.pngcodec import (
    encode_gray_png,
)
from distributed_deep_learning_with_apache_spark_spark.sources.videocodec import (
    FRAMES_PER_VIDEO,
    N_VIDEOS,
    decode_pngv_frame,
    encode_pngv,
    ensure_video_corpus,
    parse_pngv_index,
    synth_frame,
)


def test_container_roundtrip_every_frame():
    frames = [encode_gray_png(synth_frame(7, i)) for i in range(FRAMES_PER_VIDEO)]
    buf = encode_pngv(frames)
    idx = parse_pngv_index(buf)
    assert len(idx) == FRAMES_PER_VIDEO
    for i in range(FRAMES_PER_VIDEO):
        w, h, px = decode_pngv_frame(buf, i)
        assert (w, h) == (28, 28)
        assert np.array_equal(
            np.asarray(px), np.asarray(synth_frame(7, i)).ravel()
        ), f"frame {i} decode mismatch"


def test_index_is_header_only_seek():
    """The index must locate frame k without touching other frames: frame
    byte ranges are disjoint, contiguous, and cover the payload exactly."""
    frames = [encode_gray_png(synth_frame(1, i)) for i in range(FRAMES_PER_VIDEO)]
    buf = encode_pngv(frames)
    idx = parse_pngv_index(buf)
    pos = 0
    for (off, length), f in zip(idx, frames):
        assert off == pos
        assert length == len(f)
        pos += length
    base = 8 + 4 * (len(idx) + 1)
    assert base + pos == len(buf)


def test_rejects_non_container():
    with pytest.raises(ValueError):
        parse_pngv_index(b"PNG!" + b"\0" * 64)


def test_spark_keyframe_pipeline_recovers_motion(spark):
    """End-to-end: binaryFile scan -> index parse -> seek -> PNG decode.
    The synthetic glyph moves 1 px right per frame and 1 px down every 2
    frames; the decoded bright-centroid trajectory must match exactly,
    and per-frame pixel means must equal a direct decode."""
    from distributed_deep_learning_with_apache_spark_spark.sources.binary import (
        KEYFRAME_EVERY,
        video_keyframe_df,
    )

    root = ensure_video_corpus()
    rows = video_keyframe_df(spark, root).collect()
    per_video = {}
    for r in rows:
        per_video.setdefault(r.path, []).append(r)
    assert len(per_video) == N_VIDEOS

    expected_idx = list(range(0, FRAMES_PER_VIDEO, KEYFRAME_EVERY))
    checked_px = 0
    for path, frames in per_video.items():
        frames.sort(key=lambda r: r.frame_idx)
        assert [f.frame_idx for f in frames] == expected_idx
        assert all(f.n_frames == FRAMES_PER_VIDEO for f in frames)
        base_x, base_y = frames[0].bright_x, frames[0].bright_y
        for f in frames:
            assert f.bright_x - base_x == f.frame_idx, (path, f.frame_idx)
            assert f.bright_y - base_y == f.frame_idx // 2, (path, f.frame_idx)
        if checked_px < 5:
            vid = int(path.rstrip(".pngv").split("_")[-1])
            ref = np.asarray(synth_frame(vid, frames[1].frame_idx), dtype=np.float64)
            assert frames[1].mean_px == pytest.approx(float(ref.mean()), abs=0)
            checked_px += 1
    assert checked_px == 5


def test_pngv_custom_datasource_matches_pipeline(spark):
    """The Spark-4 Python Data Source connector must return the same
    decoded stats as the mapInPandas pipeline: one partition per video,
    keyframe pushdown at the source, bit-identical means."""
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all
    from distributed_deep_learning_with_apache_spark_spark.sources.binary import (
        video_keyframe_df,
    )

    reg = load_all()
    conn = reg["source_pngv_connector"].fn(spark, "/root/testdata/sf0.001").collect()
    pipe = video_keyframe_df(spark, ensure_video_corpus()).collect()
    # connector paths are bare fs paths; pipeline paths are file: URIs
    c = {(r.path.split("/")[-1], r.frame_idx): r for r in conn}
    p = {(r.path.split("/")[-1], r.frame_idx): r for r in pipe}
    assert set(c) == set(p)
    assert len(c) == N_VIDEOS * ((FRAMES_PER_VIDEO + 2) // 3)
    for k, rc in c.items():
        assert rc.mean_px == p[k].mean_px, k
        assert rc.n_frames == p[k].n_frames == FRAMES_PER_VIDEO
