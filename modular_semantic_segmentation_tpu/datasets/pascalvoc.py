"""PascalVOC 2012 segmentation driver (reference
xview/datasets/pascalvoc.py): 21 classes, rgb + labels only; undefined
label colors map to -1 (ignore), matching the reference's NaN convention
under our integer-label scheme."""

import tarfile
from os import environ, path

import cv2
import numpy as np
from sklearn.model_selection import train_test_split

from modular_semantic_segmentation_tpu.settings import DATA_BASEPATH
from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
    DataBaseclass
from modular_semantic_segmentation_tpu.datasets.augmentation import augmentate

PASCALVOC_BASEPATH = path.join(DATA_BASEPATH, "pascalvoc")

LABELINFO = {
    0: {"name": "background", "color": [0, 0, 0]},
    1: {"name": "aeroplane", "color": [128, 0, 0]},
    2: {"name": "bicycle", "color": [0, 128, 0]},
    3: {"name": "bird", "color": [128, 128, 0]},
    4: {"name": "boat", "color": [0, 0, 128]},
    5: {"name": "bottle", "color": [128, 0, 128]},
    6: {"name": "bus", "color": [0, 128, 128]},
    7: {"name": "car", "color": [128, 128, 128]},
    8: {"name": "cat", "color": [64, 0, 0]},
    9: {"name": "chair", "color": [192, 0, 0]},
    10: {"name": "cow", "color": [64, 128, 0]},
    11: {"name": "diningtable", "color": [192, 128, 0]},
    12: {"name": "dog", "color": [64, 0, 128]},
    13: {"name": "horse", "color": [192, 0, 128]},
    14: {"name": "motorbike", "color": [64, 128, 128]},
    15: {"name": "person", "color": [192, 128, 128]},
    16: {"name": "pottedplant", "color": [0, 64, 0]},
    17: {"name": "sheep", "color": [128, 64, 0]},
    18: {"name": "sofa", "color": [0, 192, 0]},
    19: {"name": "train", "color": [128, 192, 0]},
    20: {"name": "tvmonitor", "color": [0, 64, 128]},
}


class PascalVOC(DataBaseclass):

    _data_shape_description = {"rgb": (None, None, 3),
                               "labels": (None, None)}
    _num_default_classes = 21

    def __init__(self, base_path=PASCALVOC_BASEPATH, in_memory=False,
                 num_classes=None, **data_config):
        config = {
            "augmentation": {
                "crop": [1, 240],
                "scale": [.4, 1, 1.5],
                "vflip": .3,
                "hflip": False,
                "gamma": [.4, 0.3, 1.2],
                "rotate": False,
                "shear": False,
                "contrast": [.3, 0.5, 1.5],
                "brightness": [.2, -40, 40],
            },
        }
        config.update(data_config)
        self.config = config

        if not path.exists(base_path):
            message = "ERROR: Path to PascalVOC dataset does not exist."
            print(message)
            raise IOError(1, message, base_path)
        self.base_path = base_path

        # color (BGR as read by cv2) -> class lookup; undefined -> -1
        self._color_lut = {}
        for key, info in LABELINFO.items():
            r, g, b = info["color"]
            self._color_lut[(b, g, r)] = key

        def get_filenames(fileset):
            listfile = path.join(self.base_path, "ImageSets/Segmentation",
                                 f"{fileset}.txt")
            with open(listfile) as f:
                return [{"image_name": line.strip()}
                        for line in f if line.strip()]

        if in_memory and "TMPDIR" in environ:
            print("INFO loading dataset into memory")
            with tarfile.open(path.join(base_path,
                                        "pascalvoc.tar.gz")) as tar:
                tar.extractall(path=environ["TMPDIR"])
            self.base_path = environ["TMPDIR"]
            trainset = [{"image": self._load_data(i["image_name"])}
                        for i in get_filenames("train")]
            testset = [{"image": self._load_data(i["image_name"])}
                       for i in get_filenames("val")]
        else:
            trainset = get_filenames("train")
            testset = get_filenames("val")

        trainset, measureset = train_test_split(trainset, test_size=0.05,
                                                random_state=4)
        DataBaseclass.__init__(self, trainset, measureset, testset,
                               LABELINFO, num_classes=num_classes)

    def _map_colors(self, label_img):
        """BGR color image -> class indices; unknown colors -> -1
        (the reference maps them to NaN, pascalvoc.py:112-126)."""
        flat = label_img.reshape(-1, 3)
        ids = (flat[:, 0].astype(np.int64) * 256 + flat[:, 1]) * 256 + \
            flat[:, 2]
        lut = np.full(256 ** 3, -1, np.int32)
        for (b, g, r), cls in self._color_lut.items():
            lut[(b * 256 + g) * 256 + r] = cls
        return lut[ids].reshape(label_img.shape[:2])

    def _load_data(self, image_name):
        blob = {}
        blob["rgb"] = cv2.imread(path.join(self.base_path, "JPEGImages",
                                           f"{image_name}.jpg"))
        labels = cv2.imread(path.join(self.base_path, "SegmentationClass",
                                      f"{image_name}.png"))
        blob["labels"] = self._map_colors(labels)
        return blob

    def _get_data(self, image_name=False, image=False,
                  training_format=False):
        if not image_name and image is False:
            raise AssertionError("need image_name or image")
        if image_name:
            blob = self._load_data(image_name)
        else:
            blob = {m: image[m].copy() for m in image}
        if training_format:
            blob = augmentate(blob, **self.config["augmentation"])
        blob["rgb"] = blob["rgb"].astype(np.float32)
        blob["labels"] = blob["labels"].astype(np.int32)
        return blob
