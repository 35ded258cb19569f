"""Native IO runtime tests (native/vtx_io.cpp via ctypes).

Skipped when the shared library isn't built (`make -C native`).
"""
import io

import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _jpeg_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_jpeg_dims():
    img = np.zeros((120, 260, 3), np.uint8)
    w, h = native.jpeg_dims(_jpeg_bytes(img))
    assert (w, h) == (260, 120)


def test_decode_matches_pil_roughly():
    rng = np.random.default_rng(0)
    # smooth image so JPEG loss + bilinear-vs-PIL differences stay small
    base = rng.normal(size=(8, 8, 3))
    img = np.kron(base, np.ones((32, 32, 1)))
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)
    data = _jpeg_bytes(img)

    out = native.decode_jpeg_crop_resize(data, 224, mean=(0, 0, 0), std=(1, 1, 1))
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0

    from PIL import Image

    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                     .resize((224, 224)), np.float32) / 255.0
    assert np.abs(out - ref).mean() < 0.03


def test_decode_with_crop():
    img = np.zeros((200, 200, 3), np.uint8)
    img[:100, :100] = 255  # top-left quadrant white
    data = _jpeg_bytes(img)
    out = native.decode_jpeg_crop_resize(data, 64, crop=(0, 0, 100, 100),
                                         mean=(0, 0, 0), std=(1, 1, 1))
    assert out.mean() > 0.95  # all white
    out2 = native.decode_jpeg_crop_resize(data, 64, crop=(100, 100, 100, 100),
                                          mean=(0, 0, 0), std=(1, 1, 1))
    assert out2.mean() < 0.05  # all black


def test_decode_normalize():
    img = np.full((64, 64, 3), 255, np.uint8)
    data = _jpeg_bytes(img)
    out = native.decode_jpeg_crop_resize(data, 32)
    # (1.0 - mean)/std per channel
    expect = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out.reshape(-1, 3).mean(0), expect, atol=0.1)


def test_bad_jpeg_raises():
    with pytest.raises(ValueError):
        native.decode_jpeg_crop_resize(b"not a jpeg at all", 32)


def test_synth_batch():
    images, labels = native.synth_batch(4, 32, 100, seed=7)
    assert images.shape == (4, 32, 32, 3) and images.dtype == np.float32
    assert labels.shape == (4,) and labels.dtype == np.int32
    assert (labels >= 0).all() and (labels < 100).all()
    assert np.isfinite(images).all()
    # deterministic per seed
    images2, labels2 = native.synth_batch(4, 32, 100, seed=7)
    np.testing.assert_array_equal(labels, labels2)
    np.testing.assert_allclose(images, images2)
    # different seed differs
    _, labels3 = native.synth_batch(4, 32, 100, seed=8)
    assert not np.array_equal(labels, labels3)


def test_decode_pool():
    imgs = [np.full((96, 96, 3), v, np.uint8) for v in (0, 128, 255)]
    datas = [_jpeg_bytes(im) for im in imgs]
    pool = native.DecodePool(num_threads=2, mean=(0, 0, 0), std=(1, 1, 1))
    out = np.zeros((3, 48, 48, 3), np.float32)
    for i, d in enumerate(datas):
        pool.submit(d, out[i], 48)
    pool.wait()
    means = out.reshape(3, -1).mean(1)
    np.testing.assert_allclose(means, [0.0, 128 / 255, 1.0], atol=0.02)
    pool.close()


def test_decode_pool_reports_failed_tags():
    """Corrupt jobs zero-fill their slot and surface by tag (ADVICE r1)."""
    good = _jpeg_bytes(np.full((64, 64, 3), 200, np.uint8))
    pool = native.DecodePool(num_threads=2, mean=(0, 0, 0), std=(1, 1, 1))
    out = np.full((2, 32, 32, 3), -7.0, np.float32)
    pool.submit(good, out[0], 32, tag=0)
    pool.submit(b"\xff\xd8 definitely not a jpeg body", out[1], 32, tag=1)
    pool.wait()
    assert pool.take_failed() == [1]
    assert pool.take_failed() == []  # drained
    assert out[0].mean() > 0.5       # good slot decoded
    np.testing.assert_array_equal(out[1], 0.0)  # failed slot zero-filled
    pool.close()
