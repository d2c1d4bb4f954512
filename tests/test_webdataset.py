"""Tar-shard streaming dataset tests (real tar files on disk)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from chronoedit_tpu.data.webdataset import (
    ShardDistributor, WebDataset, batched, shuffle_buffer, tar_samples,
)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    """Two tar shards with png+json+txt samples."""
    from PIL import Image

    root = tmp_path_factory.mktemp("shards")
    paths = []
    idx = 0
    for s in range(2):
        path = str(root / f"shard-{s:04d}.tar")
        with tarfile.open(path, "w") as tf:
            for _ in range(3):
                key = f"sample{idx:05d}"
                img = Image.fromarray(
                    np.full((8, 8, 3), idx * 10 % 255, np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                for ext, data in [
                    ("png", buf.getvalue()),
                    ("json", json.dumps({"idx": idx}).encode()),
                    ("txt", f"caption {idx}".encode()),
                ]:
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                idx += 1
        paths.append(path)
    return paths


def test_tar_samples_grouping(shards):
    stream = ShardDistributor(shards, shuffle=False)
    samples = []
    for s, _ in zip(tar_samples(iter(stream)), range(6)):
        samples = samples + [s]
        s = samples[-1]
        assert set(s) == {"__key__", "png", "json", "txt"}
    assert len({s["__key__"] for s in samples}) == 6


def test_webdataset_end_to_end(shards):
    ds = WebDataset(shards, shuffle_size=1)
    seen = []
    for s, _ in zip(iter(ds), range(6)):
        assert s["png"].shape == (3, 8, 8)
        assert -1 <= s["png"].min() and s["png"].max() <= 1
        assert s["txt"].startswith("caption")
        seen.append(s["json"]["idx"])
    assert sorted(seen) == list(range(6))


def test_webdataset_infinite_and_sharded(shards):
    # rank split: each of 2 ranks gets one shard per epoch
    ds0 = WebDataset(shards, world_size=2, rank=0, shuffle_size=1)
    ds1 = WebDataset(shards, world_size=2, rank=1, shuffle_size=1)
    k0 = {s["__key__"] for s, _ in zip(iter(ds0), range(3))}
    k1 = {s["__key__"] for s, _ in zip(iter(ds1), range(3))}
    assert not (k0 & k1)
    # infinite: more samples than exist still yields
    count = sum(1 for _ in zip(iter(ds0), range(10)))
    assert count == 10


def test_shuffle_buffer_permutes():
    out = list(shuffle_buffer(range(50), size=10, seed=1))
    assert sorted(out) == list(range(50))
    assert out != list(range(50))


def test_batched(shards):
    ds = WebDataset(shards, shuffle_size=1)
    b = next(iter(batched(iter(ds), 3, stack_keys=("png",))))
    assert b["png"].shape == (3, 3, 8, 8)
    assert len(b["txt"]) == 3


def _write_aspect_tar(path, n, h, w, with_video=False):
    import io as _io
    import tarfile

    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{path.stem}_{i:04d}"
            img = Image.fromarray(
                (np.random.rand(h, w, 3) * 255).astype(np.uint8))
            buf = _io.BytesIO()
            img.save(buf, format="JPEG")
            info = tarfile.TarInfo(f"{key}.jpg")
            info.size = len(buf.getvalue())
            tf.addfile(info, _io.BytesIO(buf.getvalue()))
            if with_video:
                frames = (np.random.rand(7, h // 4, w // 4, 3) * 255
                          ).astype(np.uint8)
                vbuf = _io.BytesIO()
                np.savez(vbuf, frames=frames)
                info = tarfile.TarInfo(f"{key}.frames.npz")
                info.size = len(vbuf.getvalue())
                tf.addfile(info, _io.BytesIO(vbuf.getvalue()))


def test_multi_aspect_distributor_lockstep(tmp_path):
    """Mixed-aspect shards: each rank sees exactly one aspect; allocation is
    proportional with >=1 rank per aspect; every assembled batch is
    shape-uniform (multi_aspect_ratio_v2.py:30-250 semantics)."""
    from chronoedit_tpu.data.webdataset import MultiAspectDistributor, WebDataset, batched

    shards = {}
    for i in range(4):
        p = tmp_path / f"wide_{i}.tar"
        _write_aspect_tar(p, 3, 32, 64)
        shards[str(p)] = "16:9"
    for i in range(2):
        p = tmp_path / f"tall_{i}.tar"
        _write_aspect_tar(p, 3, 64, 32)
        shards[str(p)] = "9:16"

    world = 4
    aspects = []
    allocs = None
    for rank in range(world):
        dist = MultiAspectDistributor(shards, world_size=world, rank=rank)
        aspects.append(dist.aspect)
        allocs = dist.allocation
    # 4:2 shard ratio over 4 ranks -> 3 wide ranks, 1 tall rank
    assert allocs == {"16:9": 3, "9:16": 1}
    assert aspects.count("16:9") == 3 and aspects.count("9:16") == 1

    # batches per rank are shape-uniform and match the rank's aspect
    for rank in range(world):
        ds = WebDataset(shards, world_size=world, rank=rank, shuffle_size=1)
        it = iter(batched(iter(ds), batch_size=3, stack_keys=("jpg",)))
        b = next(it)
        expected = (32, 64) if aspects[rank] == "16:9" else (64, 32)
        assert b["jpg"].shape == (3, 3) + expected, b["jpg"].shape


def test_multi_aspect_requires_enough_ranks(tmp_path):
    from chronoedit_tpu.data.webdataset import MultiAspectDistributor

    _write_aspect_tar(tmp_path / "a.tar", 1, 8, 16)
    _write_aspect_tar(tmp_path / "b.tar", 1, 16, 8)
    shards = {str(tmp_path / "a.tar"): "16:9", str(tmp_path / "b.tar"): "9:16"}
    with pytest.raises(ValueError):
        MultiAspectDistributor(shards, world_size=1, rank=0)


def test_video_members_decode(tmp_path):
    """Tar video members stream as (3, T, H, W) in [-1,1], frame count
    rounded to 4k+1 (unified_dataset LoadVideo; video_decoder.py)."""
    from chronoedit_tpu.data.webdataset import WebDataset

    p = tmp_path / "vid.tar"
    _write_aspect_tar(p, 2, 32, 32, with_video=True)
    s = next(iter(WebDataset([str(p)], shuffle_size=1)))
    v = s["frames.npz"]
    assert v.shape == (3, 5, 8, 8), v.shape  # 7 frames -> 4k+1 = 5
    assert v.min() >= -1.0 and v.max() <= 1.0


def test_gif_video_decode_roundtrip():
    import io as _io

    import imageio.v3 as iio

    from chronoedit_tpu.data.webdataset import decode_video

    frames = (np.random.rand(6, 16, 16, 3) * 255).astype(np.uint8)
    buf = _io.BytesIO()
    iio.imwrite(buf, frames, extension=".gif")
    v = decode_video(buf.getvalue(), "gif")
    assert v.shape == (3, 5, 16, 16)  # 6 -> 5 (4k+1)


def test_augmentor_pipeline(tmp_path):
    from chronoedit_tpu.data.augmentors import (
        CenterCrop, Compose, HorizontalFlip, Normalize, PadToMultiple,
        RandomCrop, ResizeSmallestSide, ResizeToBucket)

    img = np.random.rand(3, 100, 150).astype(np.float32)
    s = {"__key__": "k1", "jpg": img}

    out = ResizeSmallestSide(64)(dict(s))
    assert min(out["jpg"].shape[-2:]) == 64
    out = CenterCrop(48, 48)(out)
    assert out["jpg"].shape[-2:] == (48, 48)
    out = RandomCrop(32, 32)(out)
    assert out["jpg"].shape[-2:] == (32, 32)
    out = PadToMultiple(16)(out)
    assert out["jpg"].shape[-2:] == (32, 32)  # already mod-16

    # flip determinism per key and consistency across keys
    s2 = {"__key__": "k2", "jpg": img, "png": img.copy()}
    f = HorizontalFlip(p=0.5, keys=("jpg", "png"))
    o1, o2 = f(dict(s2)), f(dict(s2))
    np.testing.assert_array_equal(o1["jpg"], o2["jpg"])
    np.testing.assert_array_equal(o1["jpg"], o1["png"])

    # bucket resize hits a mod-16 bucket shape from res_buckets
    out = ResizeToBucket("480p")(dict(s))
    assert out["jpg"].shape[-2:] in ((480, 832), (512, 672), (576, 576))

    norm = Normalize(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))(dict(s))
    np.testing.assert_allclose(norm["jpg"], (img - 0.5) / 0.5, atol=1e-6)

    # video (3, T, H, W) passes through the same spatial ops
    vid = {"__key__": "v", "jpg": np.random.rand(3, 5, 64, 64).astype(np.float32)}
    out = Compose([ResizeSmallestSide(32), CenterCrop(32, 32)])(vid)
    assert out["jpg"].shape == (3, 5, 32, 32)
