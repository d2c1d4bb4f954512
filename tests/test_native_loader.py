"""Native C++ batch image decoder tests (built on demand; skipped without a
toolchain)."""

import numpy as np
import pytest

from chronoedit_tpu.data.native_loader import (
    build_native, decode_image_batch, native_available,
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    paths = []
    # smooth gradient images: accuracy-comparable across resize kernels
    g = np.linspace(0, 255, 320, dtype=np.uint8)
    for i in range(4):
        arr = np.stack([np.roll(np.tile(g, (241, 1)), i * 30, axis=1)] * 3, -1)
        p = str(root / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def native():
    if not native_available() and not build_native():
        pytest.skip("native loader not buildable in this environment")


def test_native_matches_pil(native, jpegs):
    a = decode_image_batch(jpegs, 128, 160, force_backend="native")
    b = decode_image_batch(jpegs, 128, 160, force_backend="pil")
    assert a.shape == b.shape == (4, 3, 128, 160)
    assert float(np.abs(a - b).mean()) < 0.02
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_native_bad_file_zero_filled(native, jpegs):
    out = decode_image_batch(["/nonexistent/x.jpg", jpegs[0]], 64, 64,
                             force_backend="native")
    assert float(np.abs(out[0]).max()) == 0.0
    assert float(np.abs(out[1]).max()) > 0.0


def test_auto_backend_falls_back_for_png(tmp_path, jpegs):
    from PIL import Image

    p = str(tmp_path / "x.png")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(p)
    out = decode_image_batch([p], 16, 16)  # png -> PIL path regardless
    assert out.shape == (1, 3, 16, 16)


def test_buffer_decode_matches_file_decode(native, jpegs):
    from chronoedit_tpu.data.native_loader import decode_jpeg_buffers

    buffers = [open(p, "rb").read() for p in jpegs]
    a = decode_jpeg_buffers(buffers, 128, 160, force_backend="native")
    b = decode_image_batch(jpegs, 128, 160, force_backend="native")
    np.testing.assert_allclose(a, b, atol=1e-6)
    # PIL fallback agrees within resize-kernel tolerance
    c = decode_jpeg_buffers(buffers, 128, 160, force_backend="pil")
    assert float(np.abs(a - c).mean()) < 0.02


def test_buffer_decode_bad_bytes_zero_filled(native, jpegs):
    from chronoedit_tpu.data.native_loader import decode_jpeg_buffers

    good = open(jpegs[0], "rb").read()
    out = decode_jpeg_buffers([b"not a jpeg", good], 64, 64,
                              force_backend="native")
    assert float(np.abs(out[0]).max()) == 0.0
    assert float(np.abs(out[1]).max()) > 0.0


def test_webdataset_native_decoder_slot(native, jpegs, tmp_path):
    import tarfile

    from chronoedit_tpu.data.webdataset import WebDataset, native_jpeg_decoder

    tar = tmp_path / "shard0.tar"
    with tarfile.open(tar, "w") as tf:
        for i, p in enumerate(jpegs):
            tf.add(p, arcname=f"s{i}.jpg")
    ds = WebDataset([str(tar)], shuffle_size=1,
                    decoders={"jpg": native_jpeg_decoder(96, 128)})
    sample = next(iter(ds))
    assert sample["jpg"].shape == (3, 96, 128)
    assert -1.0 <= float(sample["jpg"].min()) <= float(sample["jpg"].max()) <= 1.0
