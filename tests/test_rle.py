import numpy as np
import pytest

from segmentation_training_pipeline_tpu.utils.rle import rle_decode, rle_encode


def test_roundtrip_random():
    r = np.random.RandomState(0)
    for _ in range(10):
        m = (r.rand(13, 17) > 0.6).astype(np.uint8)
        assert np.array_equal(rle_decode(rle_encode(m), m.shape), m)


def test_known_value_column_major():
    m = np.zeros((3, 3), np.uint8)
    m[0, 0] = 1  # flat index 1 (column-major, 1-indexed)
    m[2, 1] = 1  # column 1 -> flat 3*1 + 2 + 1 = 6
    assert rle_encode(m) == "1 1 6 1"


def test_empty_and_full():
    assert rle_encode(np.zeros((4, 4))) == ""
    assert np.array_equal(rle_decode("", (4, 4)), np.zeros((4, 4)))
    full = np.ones((4, 4), np.uint8)
    assert np.array_equal(rle_decode(rle_encode(full), (4, 4)), full)


def test_decode_nan_like():
    assert rle_decode(None, (2, 2)).sum() == 0
    assert rle_decode("nan", (2, 2)).sum() == 0


class TestCSVRLEDataSet:
    """Read side of the Kaggle loop (SURVEY §2a RLE row): images dir +
    id/EncodedPixels CSV → PredictionItems."""

    def _mk(self, tmp_path, rows, header="ImageId,EncodedPixels",
            n_imgs=3):
        import cv2
        from segmentation_training_pipeline_tpu.data.datasets import (
            CSVRLEDataSet)

        imgs = tmp_path / "imgs"
        imgs.mkdir(exist_ok=True)
        for i in range(n_imgs):
            cv2.imwrite(str(imgs / f"im{i}.png"),
                        np.random.RandomState(i).randint(
                            0, 255, (8, 6, 3), np.uint8))
        csvp = tmp_path / "train.csv"
        csvp.write_text(header + "\n" + "\n".join(rows) + "\n")
        return CSVRLEDataSet(str(imgs), str(csvp))

    def test_roundtrip_and_union(self, tmp_path):
        m1 = np.zeros((8, 6), np.uint8)
        m1[2:5, 1:4] = 1
        m2 = np.zeros((8, 6), np.uint8)
        m2[6:8, 4:6] = 1
        ds = self._mk(tmp_path, [
            f"im0.png,{rle_encode(m1)}",
            f"im0.png,{rle_encode(m2)}",   # second instance row unions
            "im1.png,",                    # negative
        ])
        assert len(ds) == 2                # im2 absent from csv = test img
        it0 = ds[0]
        assert it0.id == "im0"
        np.testing.assert_array_equal(it0.y, (m1 | m2) * 255)
        assert ds[1].y.max() == 0          # empty mask, not None

    def test_column_autodetect_lowercase(self, tmp_path):
        m = np.zeros((8, 6), np.uint8)
        m[0, 0] = 1
        ds = self._mk(tmp_path, [f"im0,{rle_encode(m)}"],
                      header="id,rle_mask")
        np.testing.assert_array_equal(ds[0].y, m * 255)

    def test_missing_image_errors(self, tmp_path):
        with pytest.raises(ValueError, match="no image"):
            self._mk(tmp_path, ["ghost.png,1 3"])

    def test_bad_columns_error(self, tmp_path):
        with pytest.raises(ValueError, match="id/rle"):
            self._mk(tmp_path, ["im0.png,1 3"], header="foo,bar")


def test_csvrle_dotted_ids_survive(tmp_path):
    """r3 review: blind splitext mangled extensionless ids containing a
    dot ('scan.v2_001' → 'scan.v2')."""
    import cv2
    from segmentation_training_pipeline_tpu.data.datasets import (
        CSVRLEDataSet)

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    cv2.imwrite(str(imgs / "scan.v2_001.png"),
                np.zeros((8, 6, 3), np.uint8))
    m = np.zeros((8, 6), np.uint8)
    m[1, 1] = 1
    (tmp_path / "t.csv").write_text(
        f"ImageId,EncodedPixels\nscan.v2_001,{rle_encode(m)}\n")
    ds = CSVRLEDataSet(str(imgs), str(tmp_path / "t.csv"))
    assert ds[0].id == "scan.v2_001"
    np.testing.assert_array_equal(ds[0].y, m * 255)


def test_csvrle_negativity_without_decode(tmp_path):
    """r3 review: negatives/stratified scans must use the CSV's knowledge
    of emptiness, not decode every image."""
    import cv2
    from segmentation_training_pipeline_tpu.data.datasets import (
        CSVRLEDataSet, KFoldedDataSet)

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    m = np.zeros((8, 6), np.uint8)
    m[1:3, 1:3] = 1
    rows = ["ImageId,EncodedPixels"]
    for i in range(6):
        cv2.imwrite(str(imgs / f"im{i}.png"), np.zeros((8, 6, 3), np.uint8))
        rows.append(f"im{i}.png,{rle_encode(m) if i % 2 else ''}")
    (tmp_path / "t.csv").write_text("\n".join(rows) + "\n")
    ds = CSVRLEDataSet(str(imgs), str(tmp_path / "t.csv"))
    assert [ds.item_is_negative(i) for i in range(6)] == \
        [True, False, True, False, True, False]

    decodes = []
    orig = CSVRLEDataSet.__getitem__
    CSVRLEDataSet.__getitem__ = lambda self, i: (decodes.append(i),
                                                 orig(self, i))[1]
    try:
        kf = KFoldedDataSet(ds, folds_count=2, random_state=33)
        flags = kf._negativity()
    finally:
        CSVRLEDataSet.__getitem__ = orig
    assert decodes == []               # zero image decodes
    assert flags.sum() == 3


def test_rle_decode_rejects_out_of_range_runs():
    """r3 review: runs past H*W mean the RLE was encoded at a different
    resolution — silent clipping trains on corrupted labels."""
    with pytest.raises(ValueError, match="different resolution"):
        rle_decode("60 10", (8, 6))  # ends at 69 > 48


def test_csvrle_id_collision_rejected(tmp_path):
    import cv2
    from segmentation_training_pipeline_tpu.data.datasets import (
        CSVRLEDataSet)

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    cv2.imwrite(str(imgs / "im0.png"), np.zeros((8, 6, 3), np.uint8))
    (tmp_path / "t.csv").write_text(
        "ImageId,EncodedPixels\nim0,1 2\nim0.png,4 2\n")
    with pytest.raises(ValueError, match="silently union"):
        CSVRLEDataSet(str(imgs), str(tmp_path / "t.csv"))
