"""Out-of-distribution benchmark data: pastes random Amsterdam Object
Library objects onto Cityscapes frames; labels = in/out-of-distribution
mask (reference xview/datasets/not_cityscapes.py)."""

import tarfile
from os import environ, listdir, path

import cv2
import numpy as np

from modular_semantic_segmentation_tpu.settings import DATA_BASEPATH
from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
    DataBaseclass
from modular_semantic_segmentation_tpu.datasets.augmentation import augmentate


def _get_dataset(name):
    # local import to avoid registry import loop (reference :12-15)
    from modular_semantic_segmentation_tpu.datasets.cityscapes import \
        Cityscapes
    if name == "cityscapes":
        return Cityscapes
    # Generalization over the reference (which supports only cityscapes):
    # any registered dataset with an 'rgb' modality can serve as the
    # in-distribution base — used by the CI OOD-quality proof, which
    # pastes novel objects onto the synthetic unittest corpus
    # (tests/test_uncertainty_gain.py, docs/UNCERTAINTY.md).
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    return get_dataset(name)


class AddRandomObjects(DataBaseclass):

    _data_shape_description = {"rgb": (None, None, 3),
                               "labels": (None, None)}
    _num_default_classes = 2

    def __init__(self, add_to_dataset="cityscapes", halfsize=True,
                 augmentation=False, in_memory=False, **config):
        self.base_path = path.join(DATA_BASEPATH, "amsterdam_object_lib")
        if not path.exists(self.base_path):
            message = "ERROR: Path to object library does not exist."
            print(message)
            raise IOError(1, message, self.base_path)

        self.config = {"halfsize": halfsize, "augmentation": augmentation,
                       "in_memory": in_memory}
        print("INFO: Loading Base Dataset")
        self.base_dataset = _get_dataset(add_to_dataset)(
            in_memory=in_memory, **config)

        if in_memory and "TMPDIR" in environ:
            print("INFO loading dataset into memory")
            with tarfile.open(path.join(self.base_path,
                                        "amsterdam_lib.tar.gz")) as tar:
                tar.extractall(path=environ["TMPDIR"])
            self.base_path = environ["TMPDIR"]

        # Object pool: scan the library instead of hardcoding the
        # Amsterdam range. On the full library this lists 251..1000 and
        # _get_data excludes the LAST id — exactly reproducing the
        # reference's np.random.randint(251, 1000) (and its quirk of
        # preloading object 1000 it never samples, reference :52,:74);
        # partial/synthetic libraries (CI) work with the same code path.
        self._object_ids = sorted(
            int(d) for d in listdir(self.base_path)
            if d.isdigit() and path.exists(
                path.join(self.base_path, d, f"{d}_c.png")))
        if not self._object_ids:
            raise IOError(1, "object library is empty", self.base_path)
        if in_memory and "TMPDIR" in environ:
            self.objects = {num: self._load_object(num)
                            for num in self._object_ids}

        DataBaseclass.__init__(
            self, self.base_dataset.trainset, self.base_dataset.measureset,
            self.base_dataset.testset,
            {0: {"name": "in-distribution", "color": [0, 0, 0]},
             1: {"name": "out-of-distribution", "color": [255, 0, 0]}},
            validation_set=self.base_dataset.validation_set,
            num_classes=self.base_dataset._num_default_classes)

    def _load_object(self, object_name):
        obj = cv2.imread(path.join(self.base_path,
                                   f"{object_name}/{object_name}_c.png"))
        if self.config["halfsize"]:
            h, w, _ = obj.shape
            obj = cv2.resize(obj, (h // 2, w // 2))
        return obj

    def _get_data(self, training_format=False, **kwargs):
        img = self.base_dataset._get_data(training_format=False,
                                          **kwargs)["rgb"]
        pool = self._object_ids
        num = pool[np.random.randint(max(1, len(pool) - 1))]
        if self.config["in_memory"] and hasattr(self, "objects"):
            obj = self.objects[num].copy()
        else:
            obj = self._load_object(num)
        h, w, _ = obj.shape
        img_h, img_w = img.shape[:2]
        top = np.random.randint(img_h - h)
        left = np.random.randint(img_w - w)
        obj = cv2.copyMakeBorder(obj, top, img_h - top - h, left,
                                 img_w - left - w, cv2.BORDER_CONSTANT,
                                 value=(0, 0, 0))
        # everything darker than (30,30,30) counts as object background
        # (reference :90-95)
        background = np.all(obj < 30, axis=2)
        blob = {
            "rgb": np.where(background[..., None], img, obj),
            "labels": (1 - background).astype(np.int32),
        }
        if training_format and self.config["augmentation"]:
            blob = augmentate(blob, **self.config["augmentation"])
        blob["rgb"] = blob["rgb"].astype(np.float32)
        blob["labels"] = blob["labels"].astype(np.int32)
        return blob
