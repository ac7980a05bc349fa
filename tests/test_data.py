"""Data pipeline tests (parity: test_dataloader.py:41-124)."""

import os

import numpy as np
import pytest

from video_vae_tpu.core.config import DataConfig
from video_vae_tpu.data.pipeline import create_dataloader
from video_vae_tpu.data.source import SyntheticVideoSource, list_video_files
from video_vae_tpu.data.video_io import HAVE_CV2, load_video, write_video


def test_synthetic_source_shapes_and_determinism():
    src = SyntheticVideoSource(num_clips=4, max_frames=6, resize=(16, 16), seed=0)
    rec1, rec2 = src[1], src[1]
    assert rec1["video"].shape == (6, 16, 16, 3)
    assert rec1["mask"].shape == (6,)
    np.testing.assert_array_equal(rec1["video"], rec2["video"])
    assert rec1["video"].min() >= 0 and rec1["video"].max() <= 1
    # mask is a valid prefix mask
    m = rec1["mask"]
    assert set(np.unique(m)).issubset({0.0, 1.0})
    first_zero = np.argmin(m) if (m == 0).any() else len(m)
    assert np.all(m[:first_zero] == 1) and np.all(m[first_zero:] == 0)


def test_threaded_loader_batches():
    cfg = DataConfig(
        synthetic=True, synthetic_num_clips=8, batch_size=2, max_frames=4,
        resize=(16, 16), backend="threaded", num_workers=0,
    )
    batches = list(create_dataloader(cfg, seed=0))
    assert len(batches) == 4
    assert batches[0]["video"].shape == (2, 4, 16, 16, 3)
    assert batches[0]["mask"].shape == (2, 4)


def test_loader_seeds_differ():
    cfg = DataConfig(
        synthetic=True, synthetic_num_clips=8, batch_size=2, max_frames=4,
        resize=(16, 16), backend="threaded",
    )
    b1 = next(iter(create_dataloader(cfg, seed=1)))
    b2 = next(iter(create_dataloader(cfg, seed=2)))
    assert not np.array_equal(b1["video"], b2["video"])


def test_process_sharding_disjoint():
    cfg = DataConfig(
        synthetic=True, synthetic_num_clips=8, batch_size=2, max_frames=4,
        resize=(16, 16), backend="threaded", shuffle=False,
    )
    p0 = [b["video"] for b in create_dataloader(cfg, seed=0, process_index=0, process_count=2)]
    p1 = [b["video"] for b in create_dataloader(cfg, seed=0, process_index=1, process_count=2)]
    assert len(p0) == len(p1) == 2
    assert not np.array_equal(p0[0], p1[0])


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV unavailable")
def test_video_roundtrip(tmp_path):
    """write_video → load_video round trip with padding mask."""
    t, h, w = 6, 32, 32
    video = np.random.default_rng(0).random((t, h, w, 3)).astype(np.float32)
    mask = np.ones(t, np.float32)
    path = os.path.join(tmp_path, "clip.mp4")
    write_video({"video": video, "mask": mask}, path)
    assert os.path.exists(path)

    loaded, lmask = load_video(
        path, max_frames=8, resize=(h, w), crop_size=h,
        rng=np.random.default_rng(0),
    )
    assert loaded.shape == (8, h, w, 3)
    assert lmask[:6].sum() == 6 and lmask[6:].sum() == 0
    assert loaded[6:].max() == 0.0  # zero padding


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV unavailable")
def test_file_source_and_error_policy(tmp_path):
    shard = os.path.join(tmp_path, "videos0")
    os.makedirs(shard)
    video = np.random.default_rng(0).random((4, 32, 32, 3)).astype(np.float32)
    write_video({"video": video}, os.path.join(shard, "a.mp4"))
    # corrupt file
    with open(os.path.join(shard, "b.mp4"), "wb") as f:
        f.write(b"not a video")

    assert len(list_video_files(str(tmp_path))) == 2

    from video_vae_tpu.data.source import VideoFileSource

    src = VideoFileSource(str(tmp_path), max_frames=4, resize=(16, 16), crop_size=16,
                          on_error="zeros")
    good = src[0]
    assert good["video"].shape == (4, 16, 16, 3)
    bad = src[1]  # poison-pill parity: zeros + all-ones mask
    assert bad["video"].max() == 0.0
    assert bad["mask"].min() == 1.0

    # "skip" = resample: the corrupt index transparently yields another clip
    src_skip = VideoFileSource(str(tmp_path), max_frames=4, resize=(16, 16),
                               crop_size=16, on_error="skip")
    resampled = src_skip[1]
    assert resampled["video"].max() > 0.0  # a real (decoded) clip, not zeros
    assert resampled["mask"].sum() == 4

    # "raise" propagates
    src_raise = VideoFileSource(str(tmp_path), max_frames=4, resize=(16, 16),
                                crop_size=16, on_error="raise")
    with pytest.raises(Exception):
        src_raise[1]


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV unavailable")
def test_skip_policy_exhaustion_and_producer_error(tmp_path):
    """All-corrupt dataset: 'skip' fails loudly, and the threaded loader
    surfaces the producer error instead of silently truncating the epoch."""
    shard = os.path.join(tmp_path, "videos0")
    os.makedirs(shard)
    for name in ("a", "b"):
        with open(os.path.join(shard, f"{name}.mp4"), "wb") as f:
            f.write(b"not a video")

    from video_vae_tpu.data.source import VideoFileSource

    src = VideoFileSource(str(tmp_path), max_frames=4, resize=(16, 16),
                          crop_size=16, on_error="skip")
    with pytest.raises(RuntimeError, match="consecutive decode failures"):
        src[0]

    cfg = DataConfig(base_dir=str(tmp_path), batch_size=2, max_frames=4,
                     resize=(16, 16), crop_size=16, backend="threaded",
                     on_error="skip", shuffle=False)
    with pytest.raises(RuntimeError, match="consecutive decode failures"):
        list(create_dataloader(cfg, seed=0))


def test_independent_shards_full_dataset_per_process():
    """Reference-parity sampling: each process sees the full dataset with its
    own seed (/root/reference/claude_distributed/dataloader.py:363)."""
    base = dict(
        synthetic=True, synthetic_num_clips=8, batch_size=2, max_frames=4,
        resize=(16, 16), backend="threaded",
    )
    cfg_ind = DataConfig(independent_shards=True, **base)
    p0 = list(create_dataloader(cfg_ind, seed=0, process_index=0, process_count=2))
    p1 = list(create_dataloader(cfg_ind, seed=0, process_index=1, process_count=2))
    # full dataset per process (4 batches of 2 from 8 clips), not a half split
    assert len(p0) == len(p1) == 4
    # different per-process seeds → different shuffles
    assert not np.array_equal(p0[0]["video"], p1[0]["video"])

    cfg_exact = DataConfig(**base)
    q0 = list(create_dataloader(cfg_exact, seed=0, process_index=0, process_count=2))
    assert len(q0) == 2  # exact partitioning halves the per-process epoch


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV unavailable")
def test_native_loader(tmp_path):
    """C++ decode core parity with the Python path (shapes, mask, error policy)."""
    from video_vae_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native library not built (make -C native)")
    shard = os.path.join(tmp_path, "videos0")
    os.makedirs(shard)
    video = np.random.default_rng(0).random((6, 64, 64, 3)).astype(np.float32)
    write_video({"video": video}, os.path.join(shard, "a.mp4"))
    with open(os.path.join(shard, "bad.mp4"), "wb") as f:
        f.write(b"nope")

    v, m, rc = native_loader.load_video_native(
        os.path.join(shard, "a.mp4"), 8, (32, 32), 48, seed=1
    )
    assert rc == 0
    assert v.shape == (8, 32, 32, 3)
    assert m[:6].sum() == 6 and m[6:].sum() == 0
    assert 0.0 <= v.min() and v.max() <= 1.0
    assert v[6:].max() == 0.0  # zero padding

    _, _, errors = native_loader.load_batch_native(
        [os.path.join(shard, "a.mp4"), os.path.join(shard, "bad.mp4")],
        8, (32, 32), 48, [1, 2], num_threads=2,
    )
    assert errors[0] == 0 and errors[1] != 0

    from video_vae_tpu.data.pipeline import create_dataloader

    cfg = DataConfig(base_dir=str(tmp_path), batch_size=2, max_frames=8,
                     resize=(32, 32), crop_size=48, backend="native",
                     num_workers=2, shuffle=False)
    batches = list(create_dataloader(cfg, seed=0))
    assert len(batches) == 1
    assert batches[0]["video"].shape == (2, 8, 32, 32, 3)
    # poison-pill parity for the corrupt clip: zeros + all-ones mask
    bad_idx = 1  # sorted order: a.mp4, bad.mp4
    assert batches[0]["video"][bad_idx].max() == 0.0
    assert batches[0]["mask"][bad_idx].min() == 1.0


@pytest.mark.skipif(not HAVE_CV2, reason="OpenCV unavailable")
def test_grain_backend(tmp_path):
    """The grain pipeline (in-process workers) yields correct batches."""
    pytest.importorskip("grain.python")
    shard = os.path.join(tmp_path, "videos0")
    os.makedirs(shard)
    rng = np.random.default_rng(0)
    for name in ("a", "b", "c", "d"):
        write_video(
            {"video": rng.random((5, 48, 48, 3)).astype(np.float32)},
            os.path.join(shard, f"{name}.mp4"),
        )
    cfg = DataConfig(base_dir=str(tmp_path), batch_size=2, max_frames=6,
                     resize=(32, 32), crop_size=40, backend="grain",
                     num_workers=0, shuffle=True)
    batches = list(create_dataloader(cfg, seed=3))
    assert len(batches) == 2
    assert batches[0]["video"].shape == (2, 6, 32, 32, 3)
    assert batches[0]["mask"].shape == (2, 6)
    # 5 real frames → mask sums to 5, last frame zero-padded
    assert set(np.asarray(batches[0]["mask"]).sum(axis=1)) == {5.0}
