"""Cityscapes variant A (reference xview/datasets/cityscapesA.py):
measureset drawn from held-out TRAIN cities {ulm, bochum} instead of a
random train split. The reference file carries Python-2 idioms
(SURVEY.md §2.9); reimplemented on the current driver."""

from modular_semantic_segmentation_tpu.datasets.cityscapes import (
    Cityscapes, CITIES, CITYSCAPES_BASEPATH, LABELINFO)
from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
    DataBaseclass

MEASURE_CITIES = ["ulm", "bochum"]


class CityscapesA(Cityscapes):

    def __init__(self, base_path=CITYSCAPES_BASEPATH, num_classes=None,
                 **data_config):
        train_cities = [c for c in CITIES if c not in MEASURE_CITIES]
        Cityscapes.__init__(self, base_path=base_path, cities=train_cities,
                            num_classes=num_classes, **data_config)
        # replace the random measure split with the held-out cities
        trainset = self.trainset + self.measureset
        measureset = self._get_filenames("train", cities=MEASURE_CITIES)
        testset = self.testset
        DataBaseclass.__init__(self, trainset, measureset, testset,
                               LABELINFO, num_classes=num_classes)
