"""Cityscapes variant B (reference xview/datasets/cityscapesB.py):
optionally adds gtCoarse 'train_extra' data to the trainset; measureset =
val {munster}, testset = val {frankfurt, lindau}. Reimplemented on the
current driver (the reference file is Python-2 legacy, SURVEY.md §2.9)."""

from os import path

from modular_semantic_segmentation_tpu.datasets.cityscapes import (
    Cityscapes, CITYSCAPES_BASEPATH, LABELINFO)
from modular_semantic_segmentation_tpu.datasets.data_baseclass import \
    DataBaseclass


class CityscapesB(Cityscapes):

    def __init__(self, base_path=CITYSCAPES_BASEPATH, use_train_extra=False,
                 num_classes=None, **data_config):
        Cityscapes.__init__(self, base_path=base_path,
                            num_classes=num_classes, **data_config)
        trainset = self.trainset + self.measureset
        if use_train_extra and path.exists(
                path.join(self.base_path, self.modality_paths["rgb"],
                          "train_extra")):
            # coarse annotations live under gtCoarse
            self.modality_paths = dict(self.modality_paths)
            trainset = trainset + self._get_filenames("train_extra")
        measureset = self._get_filenames("val", cities=["munster"])
        testset = self._get_filenames("val",
                                      cities=["frankfurt", "lindau"])
        DataBaseclass.__init__(self, trainset, measureset, testset,
                               LABELINFO, num_classes=num_classes)
