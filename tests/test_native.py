"""Native C++ loader: build, correctness vs the Python cv2 path, and
batcher integration."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from segmentation_training_pipeline_tpu.native import native_available


@pytest.fixture(scope="module")
def png_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pngs")
    (tmp / "images").mkdir()
    (tmp / "masks").mkdir()
    r = np.random.RandomState(0)
    for i in range(10):
        img = r.randint(0, 255, (48, 56, 3), dtype=np.uint8)
        mask = ((r.rand(48, 56) > 0.5) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp / "images" / f"x{i}.png"), img)
        cv2.imwrite(str(tmp / "masks" / f"x{i}.png"), mask)
    return tmp


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
class TestNativeLoader:
    def test_matches_python_path(self, png_dataset):
        from segmentation_training_pipeline_tpu.native import NativeLoader

        L = NativeLoader(4)
        paths = [str(png_dataset / "images" / f"x{i}.png") for i in range(10)]
        mpaths = [str(png_dataset / "masks" / f"x{i}.png") for i in range(10)]
        imgs, masks, fails = L.load_batch(paths, mpaths, 32, 32, 3)
        assert fails == 0
        ref = cv2.resize(
            cv2.cvtColor(cv2.imread(paths[3]), cv2.COLOR_BGR2RGB), (32, 32),
            interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(imgs[3], ref)
        refm = cv2.resize(cv2.imread(mpaths[3], 0), (32, 32),
                          interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(masks[3], refm)

    def test_missing_file_counts_failures(self, png_dataset):
        from segmentation_training_pipeline_tpu.native import NativeLoader

        L = NativeLoader(2)
        _, _, fails = L.load_batch([str(png_dataset / "images" / "x0.png"),
                                    "/definitely/not/here.png"], None, 16, 16, 3)
        assert fails == 1

    def test_grayscale_channel(self, png_dataset):
        from segmentation_training_pipeline_tpu.native import NativeLoader

        L = NativeLoader(2)
        imgs, _, fails = L.load_batch(
            [str(png_dataset / "images" / "x0.png")], None, 24, 24, 1)
        assert fails == 0 and imgs.shape == (1, 24, 24, 1)


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_batcher_native_equals_python(png_dataset):
    from segmentation_training_pipeline_tpu.data import batcher
    from segmentation_training_pipeline_tpu.data.datasets import (
        DirectoryDataSet)

    ds = DirectoryDataSet(str(png_dataset / "images"),
                          str(png_dataset / "masks"))
    idx = np.arange(len(ds))
    native = list(batcher.make_batches(ds, idx, (32, 32, 3), 1, "sigmoid", 4))

    # force the Python path by hiding the accessors
    class Wrapped:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            return ds[i]

    python = list(batcher.make_batches(Wrapped(), idx, (32, 32, 3), 1,
                                       "sigmoid", 4))
    assert len(native) == len(python)
    for nb, pb in zip(native, python):
        np.testing.assert_array_equal(nb["image"], pb["image"])
        np.testing.assert_array_equal(nb["mask"], pb["mask"])
        np.testing.assert_array_equal(nb["weight"], pb["weight"])
