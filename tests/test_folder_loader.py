"""FolderDataset (class-per-directory tree) tests."""
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.data.loader import FolderDataset


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for ci, cls in enumerate(["cat", "dog", "eel"]):
        d = root / cls
        d.mkdir()
        for i in range(6):
            arr = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(root)


def test_folder_train_batches(tree):
    ds = FolderDataset(tree, batch_size=4, image_size=32, is_train=True)
    assert ds.info.num_examples == 18
    assert ds.info.num_classes == 3
    images, labels = next(iter(ds))
    assert images.shape == (4, 32, 32, 3) and images.dtype == np.float32
    assert set(labels.tolist()) <= {0, 1, 2}


def test_folder_eval_deterministic_and_ordered(tree):
    a = next(iter(FolderDataset(tree, 6, 32, is_train=False)))
    b = next(iter(FolderDataset(tree, 6, 32, is_train=False)))
    np.testing.assert_allclose(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert (a[1] == 0).all()  # first class's files come first


def test_folder_covers_all_classes(tree):
    ds = FolderDataset(tree, batch_size=6, image_size=32, is_train=False)
    seen = set()
    for _, labels in iter(ds):
        seen.update(labels.tolist())
    assert seen == {0, 1, 2}
