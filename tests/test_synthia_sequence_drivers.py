"""SYNTHIA sequence drivers on a miniature synthetic sequence tree —
the counterpart of the reference's own driver test
(xview/datasets/test_synthia.py:1-27, which checks preprocessing outputs
resized_rgb/000000.png + resized_labels/000000.npy and blob shapes):

  * Synthia._preprocessing end to end: bilinear RGB resize 1280x760 ->
    640x380 -> crop rows 6:374, nearest (upper-left pick) depth/label
    downsampling, crude-PNG first-channel decode, per-sequence 80/20
    train_test_split.json persistence,
  * Synthia._get_data: shapes/dtypes + the 15->13 label remap
    (reference synthia.py:207),
  * RawSynthia on the same tree: raw-resolution blobs, crop_multiple(16),
    and the training-format augmentation crop.
"""

import json
import os

import cv2
import numpy as np
import pytest

SEQ = "SYNTHIA-SEQS-04-TESTSEASON"
NAMES = [f"{i:06d}" for i in range(6)]


@pytest.fixture(scope="module")
def synthia_seq_tree(tmp_path_factory):
    """Six 1280x760 frames in the raw SYNTHIA sequence layout (RGB +
    crude one-channel-in-three depth/label PNGs, Stereo_Right/Omni_F)."""
    rng = np.random.RandomState(3)
    base = tmp_path_factory.mktemp("synthia_seqs")
    seq = base / SEQ
    for name in NAMES:
        rgb = rng.randint(0, 255, (760, 1280, 3)).astype(np.uint8)
        d = seq / "RGB/Stereo_Right/Omni_F"
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(str(d / f"{name}.png"), rgb)
        depth = rng.randint(0, 60000, (760, 1280)).astype(np.uint16)
        d = seq / "Depth/Stereo_Right/Omni_F"
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(str(d / f"{name}.png"), depth)
        # crude label format: value lives in the FIRST channel only
        # (one_channel_image_reader, reference synthia.py:215-227); class
        # 15 present to exercise the 15->13 remap
        labels = np.zeros((760, 1280, 3), np.uint8)
        labels[..., 0] = rng.randint(0, 14, (760, 1280))
        labels[:64, :64, 0] = 15
        labels[..., 1] = 200  # decoys in the other channels
        labels[..., 2] = 100
        d = seq / "GT/LABELS/Stereo_Right/Omni_F"
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(str(d / f"{name}.png"), labels)
    return str(base)


def test_synthia_preprocessing_and_blobs(synthia_seq_tree):
    from modular_semantic_segmentation_tpu.datasets.synthia import Synthia

    data = Synthia(seqs=[SEQ], base_path=synthia_seq_tree)
    seq_base = os.path.join(synthia_seq_tree, SEQ)

    # preprocessing artifacts (the reference test's own checks)
    rgb_out = os.path.join(seq_base, "resized_rgb_F", "000000.png")
    lab_out = os.path.join(seq_base, "resized_labels_F", "000000.npy")
    dep_out = os.path.join(seq_base, "resized_depth_F", "000000.png")
    for f in (rgb_out, lab_out, dep_out):
        assert os.path.exists(f), f
    assert cv2.imread(rgb_out).shape == (368, 640, 3)
    lab = np.load(lab_out)
    assert lab.shape == (368, 640)
    assert lab.max() <= 15  # decoy channels were NOT decoded
    depth = cv2.imread(dep_out, 2)
    assert depth.shape == (368, 640) and depth.dtype == np.uint16

    # split persistence: 80/20 over the 6 frames
    with open(os.path.join(seq_base, "train_test_split.json")) as f:
        split = json.load(f)
    assert len(split["trainset"]) == 4 and len(split["testset"]) == 2
    assert set(split["trainset"]) | set(split["testset"]) == set(NAMES)
    # the testset is further measure/test split 50/50 (seed 1)
    assert len(data.trainset) == 4
    assert len(data.measureset) == 1 and len(data.testset) == 1

    blob = data.get_testset().get_blob(0)
    assert blob["rgb"].shape == (368, 640, 3)
    assert blob["rgb"].dtype == np.float32
    assert blob["depth"].shape == (368, 640, 1)
    assert blob["labels"].shape == (368, 640)
    assert blob["labels"].dtype == np.int32
    assert not (blob["labels"] == 15).any()  # 15 -> 13 remap
    assert (blob["labels"] == 13).any()

    # a second construction reuses the persisted artifacts (no re-run)
    mtime = os.path.getmtime(rgb_out)
    again = Synthia(seqs=[SEQ], base_path=synthia_seq_tree)
    assert os.path.getmtime(rgb_out) == mtime
    assert [i["image_name"] for i in again.trainset] == \
        [i["image_name"] for i in data.trainset]


def test_raw_synthia_driver(synthia_seq_tree):
    from modular_semantic_segmentation_tpu.datasets.raw_synthia import \
        RawSynthia
    from modular_semantic_segmentation_tpu.datasets.synthia import Synthia

    # RawSynthia reads the split json the preprocessed driver persists
    Synthia(seqs=[SEQ], base_path=synthia_seq_tree)
    data = RawSynthia(seqs=[SEQ], base_path=synthia_seq_tree)
    assert data.num_classes == 14
    assert len(data.trainset) == 4
    assert len(data.measureset) == 1 and len(data.testset) == 1

    # test format: raw resolution cropped to multiples of 16
    blob = data.get_testset().get_blob(0)
    assert blob["rgb"].shape == (752, 1280, 3)  # 760 -> 47*16
    assert blob["depth"].shape == (752, 1280, 1)
    assert blob["depth"].dtype == np.float32
    assert blob["labels"].max() <= 13 and not (blob["labels"] == 15).any()

    # training format: the configured scale/crop/vflip/gamma augmentation
    # yields the 352-crop (reference raw_synthia preprocessing config)
    item = dict(data.trainset[0])
    tblob = data._get_data(training_format=True, **item)
    assert tblob["rgb"].shape == (352, 352, 3)
    assert tblob["labels"].shape == (352, 352)
