"""WebDataset pipeline tests (data/wds.py + tools/make_wds_shards.py)."""
import io
import subprocess
import sys
import tarfile

import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.data.wds import (
    WdsDataset,
    _central_crop_window,
    _sample_inception_crop,
    expand_shards,
)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    out = tmp_path_factory.mktemp("wds")
    r = subprocess.run(
        [sys.executable, "tools/make_wds_shards.py", "--out", str(out),
         "--synthetic", "24", "--classes", "5", "--samples-per-shard", "10"],
        capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr
    return str(out)


def test_expand_braces():
    got = expand_shards("/x/train-{0000..0003}.tar")
    assert got == [f"/x/train-{i:04d}.tar" for i in range(4)]


def test_crop_windows_in_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        w, h = int(rng.integers(50, 500)), int(rng.integers(50, 500))
        x0, y0, cw, ch = _sample_inception_crop(rng, w, h)
        assert 0 <= x0 and x0 + cw <= w and 0 <= y0 and y0 + ch <= h
    x0, y0, cw, ch = _central_crop_window(400, 300, 224)
    assert cw == ch == int(round(300 * 224 / 256))


def test_wds_iterates_batches(shards):
    ds = WdsDataset(shards + "/shard-*.tar", batch_size=8, image_size=64,
                    is_train=True, num_classes=5)
    assert ds.info.num_examples == 30  # 10/shard x 3 shards (extrapolated)
    images, labels = next(iter(ds))
    assert images.shape == (8, 64, 64, 3) and images.dtype == np.float32
    assert labels.shape == (8,) and (labels < 5).all()


def test_wds_eval_deterministic(shards):
    ds1 = WdsDataset(shards + "/shard-*.tar", batch_size=8, image_size=64,
                     is_train=False, num_classes=5)
    ds2 = WdsDataset(shards + "/shard-*.tar", batch_size=8, image_size=64,
                     is_train=False, num_classes=5)
    a = next(iter(ds1))
    b = next(iter(ds2))
    np.testing.assert_allclose(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_wds_epoch_reshuffles(shards):
    ds = WdsDataset(shards + "/shard-*.tar", batch_size=16, image_size=64,
                    is_train=True, num_classes=5)
    a = next(iter(ds))[1]
    b = next(iter(ds))[1]
    assert not np.array_equal(a, b)  # per-epoch shard order reseeded


def test_wds_drops_corrupt_bodies(shards, tmp_path, monkeypatch):
    """A JPEG whose header parses but body fails decode is dropped and its
    batch slot refilled from the stream — never trained on (ADVICE r1)."""
    from vision_transformers_torch_xla_tpu.data import native

    if not native.available():
        pytest.skip("native lib not built")
    corrupt = b"\xff\xd8corrupt-body"
    # pretend the header peek succeeds so the pooled decode path sees it
    real_dims = native.jpeg_dims
    monkeypatch.setattr(
        native, "jpeg_dims",
        lambda d: (40, 52) if d == corrupt else real_dims(d))

    src = expand_shards(shards + "/shard-*.tar")[0]
    bad_shard = tmp_path / "bad-0000.tar"
    with tarfile.open(src) as tin, tarfile.open(bad_shard, "w") as tout:
        for m in tin:
            tout.addfile(m, tin.extractfile(m))
        info = tarfile.TarInfo("zzz_corrupt.jpg")
        info.size = len(corrupt)
        tout.addfile(info, io.BytesIO(corrupt))
        info = tarfile.TarInfo("zzz_corrupt.cls")
        info.size = 1
        tout.addfile(info, io.BytesIO(b"4"))

    ds = WdsDataset(str(bad_shard), batch_size=5, image_size=32,
                    is_train=False, num_classes=5, num_examples=11)
    batches = list(ds)
    images = np.concatenate([b[0] for b in batches])
    assert len(batches) == 2  # 10 good samples / batch 5; corrupt dropped
    # no zero-filled (all-black) slot leaked through
    assert (np.abs(images).reshape(len(images), -1).max(1) > 0).all()
