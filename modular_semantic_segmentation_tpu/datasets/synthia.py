"""SYNTHIA video-sequences driver (http://synthia-dataset.net/).

Reference: xview/datasets/synthia.py. Offline preprocessing resizes
1280x760 -> 640x368 (bilinear RGB / nearest depth+labels, then crop rows
6:374), decodes the crude label PNGs, persists npy files and a per-sequence
80/20 train/test split JSON. The reference class itself was stale against
the current baseclass (SURVEY.md §2.9); this driver implements the same
behavior on the current interface, adding the measure-set split the fusion
experiments need (50/50 of the testset, seed 1, the RAND convention).
"""

import itertools
import json
import shutil
from os import listdir, path, makedirs

import cv2
import numpy as np
from sklearn.model_selection import train_test_split

from modular_semantic_segmentation_tpu.settings import DATA_BASEPATH
from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
    DataBaseclass
from modular_semantic_segmentation_tpu.datasets.augmentation import augmentate

SYNTHIA_BASEPATH = path.join(DATA_BASEPATH, "synthia")

AVAILABLE_SEQUENCES = [
    "SYNTHIA-SEQS-04-DAWN", "SYNTHIA-SEQS-04-FALL", "SYNTHIA-SEQS-04-FOG",
    "SYNTHIA-SEQS-04-NIGHT", "SYNTHIA-SEQS-04-RAINNIGHT",
    "SYNTHIA-SEQS-04-SOFTRAIN", "SYNTHIA-SEQS-04-SPRING",
    "SYNTHIA-SEQS-04-SUMMER", "SYNTHIA-SEQS-04-SUNSET",
    "SYNTHIA-SEQS-04-WINTER", "SYNTHIA-SEQS-04-WINTERNIGHT"]

# label information according to the synthia README (reference synthia.py:32)
LABELINFO = {
    0: {"name": "void", "color": [0, 0, 0]},
    1: {"name": "sky", "color": [128, 128, 128]},
    2: {"name": "building", "color": [128, 0, 0]},
    3: {"name": "road", "color": [128, 64, 128]},
    4: {"name": "sidewalk", "color": [0, 0, 192]},
    5: {"name": "fence", "color": [64, 64, 128]},
    6: {"name": "vegetation", "color": [128, 128, 0]},
    7: {"name": "pole", "color": [192, 192, 128]},
    8: {"name": "car", "color": [64, 0, 128]},
    9: {"name": "traffic sign", "color": [192, 128, 128]},
    10: {"name": "pedestrian", "color": [64, 64, 0]},
    11: {"name": "bicycle", "color": [0, 128, 192]},
    12: {"name": "lanemarking", "color": [0, 192, 0]},
    13: {"name": "traffic light", "color": [0, 128, 128]},
}


def one_channel_image_reader(filepath, datatype, input_has_three_channels=True):
    """Decode the crude label/depth PNG format: only the first channel holds
    the value (reference synthia.py:215-227)."""
    array = cv2.imread(filepath, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
    if array is None:
        raise IOError(f"could not read {filepath}")
    if array.ndim == 3 and input_has_three_channels:
        array = array[:, :, 0]
    return array.astype(datatype)


def crop_resized_image(image):
    """Crop 640x380 -> 640x368 so dims divide by 16 (reference :230-235)."""
    return image[6:374]


class Synthia(DataBaseclass):
    """SYNTHIA sequences at 640x368 with a per-sequence 80/20 split."""

    _data_shape_description = {
        "rgb": (None, None, 3), "depth": (None, None, 1),
        "labels": (None, None)}
    _num_default_classes = 14

    def __init__(self, seqs=None, base_path=SYNTHIA_BASEPATH,
                 force_preprocessing=False, direction="F", num_classes=None,
                 augmentation=None, **config):
        seqs = seqs or AVAILABLE_SEQUENCES
        if not path.exists(base_path):
            message = "ERROR: Path to SYNTHIA dataset does not exist."
            print(message)
            raise IOError(1, message, base_path)
        if not len(seqs) > 0:
            raise UserWarning("ERROR: Need to specify at least one synthia "
                              "set")
        self.base_path = base_path
        self.direction = direction
        self.augmentation = augmentation or {}

        for sequence in seqs:
            if force_preprocessing or not path.exists(
                    path.join(base_path, sequence, "resized_rgb_F")):
                self._preprocessing(sequence)

        trainset, testset = [], []
        for sequence in seqs:
            with open(path.join(self.base_path, sequence,
                                "train_test_split.json")) as f:
                split = json.load(f)
            trainset.extend([{"sequence": sequence, "image_name": name}
                             for name in split["trainset"]])
            testset.extend([{"sequence": sequence, "image_name": name}
                            for name in split["testset"]])
        measureset, testset = train_test_split(testset, test_size=0.5,
                                               random_state=1)
        DataBaseclass.__init__(self, trainset, measureset, testset,
                               LABELINFO, num_classes=num_classes)

    def _preprocessing(self, sequence):
        """Resize + decode + split one sequence
        (reference synthia.py:103-188)."""
        print(f"INFO: Preprocessing started for {sequence}. This may take "
              "a while.")
        seq_base = path.join(self.base_path, sequence)
        for modality, direction in itertools.product(
                ["RGB", "Depth", "labels"], ["F", "B", "L", "R"]):
            out_dir = path.join(
                seq_base, f"resized_{modality.lower()}_{direction}")
            src_dir = (path.join(seq_base, modality, "Stereo_Right",
                                 f"Omni_{direction}")
                       if modality in ("RGB", "Depth") else
                       path.join(seq_base, "GT/LABELS/Stereo_Right",
                                 f"Omni_{direction}"))
            if not path.exists(src_dir):
                continue
            if path.exists(out_dir):
                shutil.rmtree(out_dir)
            makedirs(out_dir)
            for filename in listdir(src_dir):
                filepath = path.join(src_dir, filename)
                if modality == "RGB":
                    image = cv2.imread(filepath)
                    resized = cv2.resize(image, (640, 380),
                                         interpolation=cv2.INTER_LINEAR)
                    cv2.imwrite(path.join(out_dir, filename),
                                crop_resized_image(resized))
                elif modality == "Depth":
                    image = one_channel_image_reader(filepath, np.uint16)
                    resized = image[::2, ::2]  # nearest via upper-left pick
                    cv2.imwrite(path.join(out_dir, filename),
                                crop_resized_image(resized))
                else:
                    array = one_channel_image_reader(filepath, np.uint8)
                    resized = array[::2, ::2]
                    np.save(path.join(out_dir, filename.split(".")[0]),
                            crop_resized_image(resized))

        filenames = [f.split(".")[0] for f in
                     listdir(path.join(seq_base, "resized_rgb_F"))]
        trainset, testset = train_test_split(filenames, test_size=0.2)
        with open(path.join(seq_base, "train_test_split.json"), "w") as f:
            json.dump({"trainset": trainset, "testset": testset}, f)
        print("INFO: Preprocessing finished.")

    def _get_data(self, sequence, image_name, training_format=False):
        d = self.direction
        rgb = cv2.imread(path.join(
            self.base_path, sequence, f"resized_rgb_{d}", f"{image_name}.png"))
        depth = cv2.imread(path.join(
            self.base_path, sequence, f"resized_depth_{d}",
            f"{image_name}.png"), 2)
        labels = np.load(path.join(
            self.base_path, sequence, f"resized_labels_{d}",
            f"{image_name}.npy"))
        labels = labels.astype(np.int32)
        labels[labels == 15] = 13  # dirty fix for class 15 (synthia.py:207)
        blob = {"rgb": rgb, "depth": np.expand_dims(depth, -1),
                "labels": labels}
        if training_format and self.augmentation:
            blob = augmentate(blob, **self.augmentation)
        blob["rgb"] = blob["rgb"].astype(np.float32)
        blob["depth"] = blob["depth"].astype(np.float32)
        blob["labels"] = blob["labels"].astype(np.int32)
        return blob
