"""Image benchmark dataset loaders (ares `dataset/` parity) — fixture-backed.

Fixtures are written in the real on-disk layouts: CIFAR-10 python-version
`test_batch` pickle + `target.npy` (`ares/dataset/cifar10.py:49-51`), and an
ImageNet `val.txt`/`target.txt` + image dir (`ares/dataset/imagenet.py:63-85`).
"""

import os
import pickle

import numpy as np
import pytest

from pointsecguard_tpu.data import (
    ImageClassifierSpec,
    as_batches,
    load_cifar10,
    load_for_classifier,
    load_imagenet_val,
)

N_CIFAR = 12


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar")
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (N_CIFAR, 32, 32, 3), dtype=np.uint8)
    data = imgs.transpose(0, 3, 1, 2).reshape(N_CIFAR, 3072)
    labels = list(rng.randint(0, 10, N_CIFAR))
    with open(root / "test_batch", "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)
    np.save(root / "target.npy", rng.randint(0, 10, N_CIFAR))
    return str(root), imgs, np.array(labels)


@pytest.fixture(scope="module")
def imagenet_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imagenet")
    img_dir = root / "ILSVRC2012_img_val"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    sizes = [(80, 60), (48, 48), (100, 40)]
    modes = ["RGB", "L", "RGB"]  # one grayscale file (imagenet.py:92-93)
    names, labels = [], []
    for i, (size, mode) in enumerate(zip(sizes, modes)):
        name = f"val_{i}.png"
        arr = rng.randint(0, 256, (size[1], size[0]), dtype=np.uint8)
        if mode == "RGB":
            arr = np.stack([arr] * 3, -1) + np.arange(3, dtype=np.uint8)
        Image.fromarray(arr, mode=mode).save(img_dir / name)
        names.append(name)
        labels.append(i % 3)
    with open(root / "val.txt", "w") as f:
        f.writelines(f"{n} {l}\n" for n, l in zip(names, labels))
    with open(root / "target.txt", "w") as f:
        f.writelines(f"{n} {(l + 1) % 3}\n" for n, l in zip(names, labels))
    return str(root), names, labels


class TestCifar10:
    def test_rows_and_layout(self, cifar_root):
        root, imgs, labels = cifar_root
        rows = list(load_cifar10(root))
        assert len(rows) == N_CIFAR
        idx, x, y = rows[3]
        assert idx == 3 and x.dtype == np.uint8 and x.shape == (32, 32, 3)
        # HWC round-trip through the channel-major on-disk rows
        np.testing.assert_array_equal(x, imgs[3])
        assert y == labels[3] and isinstance(y, np.int32)

    def test_offset_keeps_absolute_indices_and_targets(self, cifar_root):
        root, _, labels = cifar_root
        targets = np.load(os.path.join(root, "target.npy"))
        rows = list(load_cifar10(root, offset=5, load_target=True))
        assert [r[0] for r in rows] == list(range(5, N_CIFAR))
        assert [r[3] for r in rows] == list(targets[5:])

    def test_target_label_filters_on_true_label(self, cifar_root):
        root, _, labels = cifar_root
        lab = int(labels[0])
        rows = list(load_cifar10(root, target_label=lab))
        assert rows and all(r[2] == lab for r in rows)
        assert len(rows) == int((labels == lab).sum())

    def test_classifier_scaling(self, cifar_root):
        root, imgs, _ = cifar_root
        spec = ImageClassifierSpec(x_shape=(3072,), x_min=-1.0, x_max=1.0)
        rows = list(load_for_classifier(load_cifar10(root), spec))
        _, x, _ = rows[0]
        assert x.shape == (3072,) and x.dtype == np.float32
        expect = imgs[0].reshape(-1).astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(x, expect, rtol=0, atol=1e-6)

    def test_batching(self, cifar_root):
        root, _, _ = cifar_root
        batches = list(as_batches(load_cifar10(root), 5))
        assert [b[1].shape[0] for b in batches] == [5, 5, 2]
        assert batches[0][1].shape == (5, 32, 32, 3)
        assert not list(
            as_batches(load_cifar10(root, offset=10), 5, drop_remainder=True)
        )


class TestImagenetVal:
    def test_rows_resize_crop_grayscale(self, imagenet_root):
        root, names, labels = imagenet_root
        rows = list(load_imagenet_val(root, 32, 32))
        assert [r[0] for r in rows] == names
        for _, x, _ in rows:
            assert x.shape == (32, 32, 3) and x.dtype == np.uint8
        # the grayscale file is replicated to 3 identical channels
        g = rows[1][1]
        np.testing.assert_array_equal(g[..., 0], g[..., 1])
        assert [r[2] for r in rows] == labels

    def test_label_offset_and_targets(self, imagenet_root):
        root, names, labels = imagenet_root
        rows = list(
            load_imagenet_val(root, 16, 16, load_target=True, label_offset=1)
        )
        assert [r[2] for r in rows] == [l + 1 for l in labels]
        assert [r[3] for r in rows] == [(l + 1) % 3 + 1 for l in labels]

    def test_offset_and_filter(self, imagenet_root):
        root, names, labels = imagenet_root
        rows = list(load_imagenet_val(root, 16, 16, offset=1))
        assert [r[0] for r in rows] == names[1:]
        rows = list(load_imagenet_val(root, 16, 16, target_label=labels[2]))
        assert [r[0] for r in rows] == [names[2]]

    def test_noclip_still_resizes(self, imagenet_root):
        root, _, _ = imagenet_root
        rows = list(load_imagenet_val(root, 24, 20, clip=False))
        assert all(r[1].shape == (24, 20, 3) for r in rows)
