"""Host-side image augmentation (NumPy/OpenCV), behavior-matched to the
reference pipeline (xview/datasets/augmentation.py:147-241) including its
quirks (hflip flips the vertical axis with a double coin-toss; scale/shear
only apply when a crop is scheduled).

The hot ops (resize, LUT, flips) dispatch to the native C++ library in
``native/`` when built (see datasets/native_backend.py); cv2/NumPy otherwise.
Augmentation was the reference's throughput bottleneck (SURVEY.md §7).
"""

import math
import random

import cv2
import numpy as np

from modular_semantic_segmentation_tpu.datasets import native_backend


def rotate_image(image, angle):
    """Rotate about the center by ``angle`` degrees, output large enough to
    hold the whole rotated image."""
    h, w = image.shape[:2]
    center = (w / 2, h / 2)
    rot = cv2.getRotationMatrix2D(center, angle, 1.0)
    cos, sin = abs(rot[0, 0]), abs(rot[0, 1])
    new_w = int(h * sin + w * cos)
    new_h = int(h * cos + w * sin)
    rot[0, 2] += new_w / 2 - center[0]
    rot[1, 2] += new_h / 2 - center[1]
    return cv2.warpAffine(image, rot, (new_w, new_h), flags=cv2.INTER_LINEAR)


def largest_rotated_rect(w, h, angle):
    """Width/height of the largest axis-aligned rectangle inside a w x h
    rectangle rotated by ``angle`` radians."""
    if w <= 0 or h <= 0:
        return 0, 0
    angle = abs(angle) % math.pi
    if angle > math.pi / 2:
        angle = math.pi - angle
    sin_a, cos_a = math.sin(angle), math.cos(angle)
    if sin_a == 0:
        return w, h
    side_long, side_short = max(w, h), min(w, h)
    if side_short <= 2.0 * sin_a * cos_a * side_long:
        x = 0.5 * side_short
        wr, hr = (x / sin_a, x / cos_a) if w >= h else (x / cos_a, x / sin_a)
    else:
        cos_2a = cos_a * cos_a - sin_a * sin_a
        wr = (w * cos_a - h * sin_a) / cos_2a
        hr = (h * cos_a - w * sin_a) / cos_2a
    return wr, hr


def crop_around_center(image, width, height):
    """Center crop to the given width/height."""
    h, w = image.shape[:2]
    width, height = min(int(width), w), min(int(height), h)
    x1 = int(w / 2 - width / 2)
    y1 = int(h / 2 - height / 2)
    return image[y1:y1 + height, x1:x1 + width]


def flip_labels(labels, c1, c2, prob=0.5):
    """Randomly map c1 onto c2 or the other way (label-ambiguity noise,
    reference augmentation.py:136-144)."""
    if np.random.rand() < prob:
        labels[labels == c1] = c2
    else:
        labels[labels == c2] = c1
    return labels


def _resize(img, fx, fy, interpolation):
    out = native_backend.resize(img, fx=fx, fy=fy,
                                interpolation=interpolation)
    if out is not None:
        return out
    return cv2.resize(img, None, fx=fx, fy=fy, interpolation=interpolation)


def augmentate(blob, scale=False, crop=False, hflip=False, vflip=False,
               gamma=False, contrast=False, brightness=False, rotate=False,
               shear=False, label_flip=False, label_merge=False):
    """Perform probability-gated augmentations on an image blob.

    Arg conventions follow the reference exactly
    (augmentation.py:147-241): each argument is prepended with its own
    probability, e.g. ``scale=(p, min, max)``, ``crop=(p, size)``.
    RGB resizes bilinear; every other modality nearest-neighbour.
    """
    modalities = list(blob.keys())

    do_crop = bool(crop) and crop[0] > random.random()

    if scale and do_crop and scale[0] > random.random():
        h, w = blob[modalities[0]].shape[:2]
        min_scale = crop[1] / float(min(h, w))
        k = random.uniform(max(min_scale, scale[1]), scale[2])
        if "rgb" in blob:
            blob["rgb"] = _resize(blob["rgb"], k, k, cv2.INTER_LINEAR)
        for m in (m for m in modalities if m != "rgb"):
            blob[m] = _resize(blob[m], k, k, cv2.INTER_NEAREST)

    if rotate and rotate[0] > random.random():
        h, w = blob[modalities[0]].shape[:2]
        deg = np.random.randint(rotate[1], rotate[2])
        rect = largest_rotated_rect(w, h, math.radians(deg))
        for m in modalities:
            blob[m] = crop_around_center(rotate_image(blob[m], deg), *rect)

    if shear and do_crop and shear[0] > random.random():
        h, w = blob[modalities[0]].shape[:2]
        shear_px = np.random.randint(int(shear[1] * w), int(shear[2] * w)) \
            * np.random.choice([-1, 1])
        mat = np.float32([[1, shear_px / h, 0], [0, 1, 0]])
        for m in modalities:
            interp = cv2.INTER_LINEAR if m == "rgb" else cv2.INTER_NEAREST
            blob[m] = cv2.warpAffine(blob[m], mat, (w, h), flags=interp)

    if do_crop:
        h, w = blob[modalities[0]].shape[:2]
        h_c = random.randint(0, h - crop[1])
        w_c = random.randint(0, w - crop[1])
        for m in modalities:
            blob[m] = blob[m][h_c:h_c + crop[1], w_c:w_c + crop[1], ...]

    # NOTE reference quirk kept: 'hflip' flips axis 0 (vertically) and
    # 'vflip' axis 1, each gated by prob AND an extra coin toss
    # (augmentation.py:210-216).
    if hflip and hflip > random.random() and np.random.choice([0, 1]):
        for m in modalities:
            blob[m] = np.flip(blob[m], axis=0)

    if vflip and vflip > random.random() and np.random.choice([0, 1]):
        for m in modalities:
            blob[m] = np.flip(blob[m], axis=1)

    if contrast and "rgb" in modalities and contrast[0] > random.random():
        alpha = random.uniform(contrast[1], contrast[2])
        rgb = blob["rgb"].astype(np.float32)
        blob["rgb"] = np.clip((rgb - 128.0) * alpha + 128.0, 0, 255).astype(
            blob["rgb"].dtype)

    if brightness and "rgb" in modalities and brightness[0] > random.random():
        add = random.uniform(brightness[1], brightness[2])
        rgb = blob["rgb"].astype(np.float32) + add
        blob["rgb"] = np.clip(rgb, 0, 255).astype(blob["rgb"].dtype)

    if gamma and "rgb" in modalities and gamma[0] > random.random():
        k = random.uniform(gamma[1], gamma[2])
        lut = np.array([((i / 255.0) ** (1 / k)) * 255
                        for i in np.arange(0, 256)]).astype("uint8")
        out = native_backend.apply_lut(blob["rgb"], lut)
        blob["rgb"] = out if out is not None else lut[
            blob["rgb"].astype(np.uint8)]

    if label_flip:
        blob["labels"] = flip_labels(blob["labels"], *label_flip)

    if label_merge:
        blob["labels"][blob["labels"] == label_merge[1]] = label_merge[0]

    return blob


def crop_multiple(data, multiple_of=16):
    """Crop the first 2 dims to a multiple of the given factor (VGG pooling
    alignment, reference augmentation.py:244-262)."""
    try:
        h, w = data.shape[0], data.shape[1]
    except (AttributeError, IndexError):
        return data
    if not hasattr(data, "ndim") or data.ndim < 2:
        return data
    h_c, w_c = [d - (d % multiple_of) for d in [h, w]]
    if h_c != h or w_c != w:
        return data[:h_c, :w_c, ...]
    return data
