"""On-device (jit-compatible) training augmentation.

The reference augments on the host with Python/OpenCV — its training
throughput bottleneck (SURVEY.md §7; reference
xview/datasets/augmentation.py:147-241). This module provides the same
probability-gated op set as :mod:`datasets.augmentation` but as pure JAX
ops with static shapes, so augmentation runs inside the jitted train step
on the TPU and the host only ships raw frames.

Semantics are matched to the host pipeline where the op is well-defined on
device:

* the crop gate, the scale/shear only-when-cropping quirk, and the
  hflip/vflip double coin toss (prob gate AND an extra fair coin) are
  preserved;
* contrast / brightness use the exact host formulas; gamma uses the
  continuous power curve instead of the host's uint8 LUT (within one
  uint8 step);
* geometry (scale, rotate + largest-inscribed-rect crop, shear, random
  crop, flips) composes into ONE inverse affine map sampled bilinearly for
  rgb and nearest for every other modality — a single resampling pass is
  the TPU-native form (the host path resamples up to three times), and
  crop offsets are continuous rather than integer;
* without a configured crop the output must keep the input's static shape,
  so rotation rescales the inscribed rectangle back to the input size
  instead of shrinking the canvas; with a crop configured but its gate not
  firing, the sample gets the deterministic top-left crop (the host would
  return the full frame, which a static-shape batch cannot hold);
* out-of-bounds samples clamp to the nearest edge pixel instead of cv2's
  zero fill (black shear borders would inject label-less pixels).

All randomness comes from the threaded ``jax.random`` key; every sample in
the batch draws independently (vmapped).
"""

import math

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def largest_rotated_rect(w, h, angle):
    """jnp port of the host helper (datasets/augmentation.py:34-53): the
    largest axis-aligned rectangle inside a w x h rectangle rotated by
    ``angle`` radians. Branchless; works on traced scalars."""
    angle = jnp.abs(angle) % math.pi
    angle = jnp.where(angle > math.pi / 2, math.pi - angle, angle)
    sin_a, cos_a = jnp.sin(angle), jnp.cos(angle)
    side_long = jnp.maximum(w, h)
    side_short = jnp.minimum(w, h)
    # f32 tolerance band: near 45 deg on near-squares the exact condition
    # (host computes it in float64) can flip while the wide-path formula is
    # 0/0-ill-conditioned; both formulas agree at the boundary, so lean thin
    thin = side_short <= (2.0 * sin_a * cos_a * side_long
                          + 1e-4 * side_short)
    x = 0.5 * side_short
    sin_safe = jnp.where(sin_a == 0, 1.0, sin_a)
    wr_thin = jnp.where(w >= h, x / sin_safe, x / cos_a)
    hr_thin = jnp.where(w >= h, x / cos_a, x / sin_safe)
    cos_2a = cos_a * cos_a - sin_a * sin_a
    cos_2a = jnp.where(jnp.abs(cos_2a) < 1e-8,
                       jnp.where(cos_2a < 0, -1e-8, 1e-8), cos_2a)
    wr_wide = (w * cos_a - h * sin_a) / cos_2a
    hr_wide = (h * cos_a - w * sin_a) / cos_2a
    wr = jnp.where(thin, wr_thin, wr_wide)
    hr = jnp.where(thin, hr_thin, hr_wide)
    identity = sin_a == 0
    return (jnp.where(identity, w, wr), jnp.where(identity, h, hr))


def _gate(key, prob):
    return jax.random.uniform(key) < prob


def _coin(key):
    return jax.random.bernoulli(key)


def _compose(a, b):
    """Compose two 3x3 homogeneous transforms (apply ``b`` after ``a`` in
    output->source order: sample source at a(b(p)))."""
    return a @ b


def _translation(ty, tx):
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                      [0.0, 0.0, 1.0]]).at[0, 2].set(ty).at[1, 2].set(tx)


def _sample_geometry(key, in_h, in_w, out_h, out_w, scale, crop, hflip,
                     vflip, rotate, shear):
    """Draw one sample's inverse affine map M (3x3, output (y,x,1) ->
    source (y,x,1)), mirroring the host pipeline's op order
    (datasets/augmentation.py:83-138)."""
    keys = jax.random.split(key, 14)
    in_h_f, in_w_f = float(in_h), float(in_w)

    crop_gate = _gate(keys[0], crop[0]) if crop else jnp.asarray(False)

    # --- scale (only when a crop is scheduled, host quirk)
    if scale and crop:
        min_scale = crop[1] / float(min(in_h, in_w))
        k = jax.random.uniform(keys[1], minval=max(min_scale, scale[1]),
                               maxval=scale[2])
        k = jnp.where(crop_gate & _gate(keys[2], scale[0]), k, 1.0)
    else:
        k = jnp.asarray(1.0)
    cur_h, cur_w = in_h_f * k, in_w_f * k
    # output->source: divide by k
    m = jnp.diag(jnp.array([1.0, 1.0, 1.0])) * 1.0
    m = m.at[0, 0].set(1.0 / k).at[1, 1].set(1.0 / k)

    # --- rotate about the center + largest-inscribed-rect crop
    if rotate:
        rot_gate = _gate(keys[3], rotate[0])
        deg = jax.random.uniform(keys[4], minval=float(rotate[1]),
                                 maxval=float(rotate[2]))
        rad = jnp.radians(jnp.where(rot_gate, deg, 0.0))
        wr, hr = largest_rotated_rect(cur_w, cur_h, rad)
        wr = jnp.where(rot_gate, wr, cur_w)
        hr = jnp.where(rot_gate, hr, cur_h)
        cos, sin = jnp.cos(-rad), jnp.sin(-rad)
        # rect coords -> center them -> rotate -> back to source center
        center_rect = _translation(-hr / 2.0, -wr / 2.0)
        rot = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        rot = rot.at[0, 0].set(cos).at[0, 1].set(-sin) \
                 .at[1, 0].set(sin).at[1, 1].set(cos)
        uncenter = _translation(cur_h / 2.0, cur_w / 2.0)
        m = _compose(m, _compose(uncenter, _compose(rot, center_rect)))
        cur_h, cur_w = hr, wr

    # --- shear (only when a crop is scheduled, host quirk)
    if shear and crop:
        sh_gate = crop_gate & _gate(keys[5], shear[0])
        mag = jax.random.uniform(keys[6], minval=float(shear[1]),
                                 maxval=float(shear[2])) * cur_w
        sign = jnp.where(_coin(keys[7]), 1.0, -1.0)
        sh = jnp.where(sh_gate, mag * sign / cur_h, 0.0)
        # cv2 forward map x' = x + sh*y  =>  inverse x = x' - sh*y
        shear_m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                             [0.0, 0.0, 1.0]]).at[1, 0].set(-sh)
        m = _compose(m, shear_m)

    # --- random crop to (out_h, out_w) (continuous offsets)
    if crop:
        max_y = jnp.maximum(cur_h - out_h, 0.0)
        max_x = jnp.maximum(cur_w - out_w, 0.0)
        off_y = jax.random.uniform(keys[8], minval=0.0, maxval=1.0) * max_y
        off_x = jax.random.uniform(keys[9], minval=0.0, maxval=1.0) * max_x
        off_y = jnp.where(crop_gate, off_y, 0.0)
        off_x = jnp.where(crop_gate, off_x, 0.0)
        m = _compose(m, _translation(off_y, off_x))
        # when the crop gate does NOT fire the output must still be
        # (out_h, out_w): fall back to a deterministic top-left crop of the
        # unscaled image (k is already gated to 1 in that case)
    else:
        # static output == input; rotation shrank the canvas to the
        # inscribed rect, so zoom it back to the full output size
        zoom = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
        zoom = zoom.at[0, 0].set(cur_h / out_h).at[1, 1].set(cur_w / out_w)
        m = _compose(m, zoom)

    # --- flips (each: prob gate AND an extra coin toss — host quirk).
    # 'hflip' flips the vertical axis, 'vflip' the horizontal one.
    if hflip:
        do = _gate(keys[10], hflip) & _coin(keys[11])
        flip = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
        flip = flip.at[0, 0].set(jnp.where(do, -1.0, 1.0)) \
                   .at[0, 2].set(jnp.where(do, out_h - 1.0, 0.0))
        m = _compose(m, flip)
    if vflip:
        do = _gate(keys[12], vflip) & _coin(keys[13])
        flip = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
        flip = flip.at[1, 1].set(jnp.where(do, -1.0, 1.0)) \
                   .at[1, 2].set(jnp.where(do, out_w - 1.0, 0.0))
        m = _compose(m, flip)
    return m


def _cast_back(out, dtype):
    """Round (not truncate) when casting interpolated floats back to an
    integer image dtype — matches cv2's rounded INTER_LINEAR instead of
    introducing a systematic -0.5 LSB bias on uint8 frames."""
    if jnp.issubdtype(dtype, jnp.integer):
        out = jnp.round(out)
    return out.astype(dtype)


def _sample_separable(image, src_y, src_x, order):
    """Sample an axis-aligned map (row coords depend only on y, column
    coords only on x) with whole-row/column ``jnp.take``s instead of the
    per-pixel gather ``map_coordinates`` lowers to — measured ~100x faster
    on the v5e (per-pixel gathers are scalar-ish on TPU). Same edge-clamp
    bilinear/nearest formulas as the general path."""
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.float32)
    src_y = jnp.clip(src_y, 0.0, h - 1.0)
    src_x = jnp.clip(src_x, 0.0, w - 1.0)
    if order == 0:
        out = jnp.take(jnp.take(img, jnp.round(src_y).astype(jnp.int32),
                                axis=0),
                       jnp.round(src_x).astype(jnp.int32), axis=1)
    else:
        y0f = jnp.floor(src_y)
        wy = src_y - y0f
        y0 = y0f.astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x0f = jnp.floor(src_x)
        wx = src_x - x0f
        x0 = x0f.astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = wy.reshape((-1,) + (1,) * (img.ndim - 1))
        rows = (jnp.take(img, y0, axis=0) * (1.0 - wy)
                + jnp.take(img, y1, axis=0) * wy)
        wx = wx.reshape((1, -1) + (1,) * (img.ndim - 2))
        out = (jnp.take(rows, x0, axis=1) * (1.0 - wx)
               + jnp.take(rows, x1, axis=1) * wx)
    return _cast_back(out, image.dtype)


def _warp(image, m, out_h, out_w, order, axis_aligned=False):
    """Resample one [H, W, C] (or [H, W]) image through the inverse affine
    map ``m``; ``order`` 1 = bilinear (rgb), 0 = nearest (labels/depth).

    ``axis_aligned`` (static: rotation and shear disabled in the config)
    takes the separable fast path; the general path pays the TPU gather
    cost of ``map_coordinates``.
    """
    if axis_aligned:
        src_y = m[0, 0] * jnp.arange(out_h, dtype=jnp.float32) + m[0, 2]
        src_x = m[1, 1] * jnp.arange(out_w, dtype=jnp.float32) + m[1, 2]
        return _sample_separable(image, src_y, src_x, order)

    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32),
                          indexing="ij")
    coords = jnp.stack([ys.ravel(), xs.ravel(),
                        jnp.ones(out_h * out_w, jnp.float32)])
    src = m.astype(jnp.float32) @ coords
    src_y, src_x = src[0], src[1]

    def sample_channel(channel):
        return map_coordinates(channel, [src_y, src_x], order=order,
                               mode="nearest")

    if image.ndim == 2:
        out = sample_channel(image.astype(jnp.float32))
        return _cast_back(out.reshape(out_h, out_w), image.dtype)
    out = jax.vmap(sample_channel, in_axes=-1, out_axes=-1)(
        image.astype(jnp.float32))
    return _cast_back(out.reshape(out_h, out_w, image.shape[-1]),
                      image.dtype)


def _photometric(key, rgb, gamma, contrast, brightness):
    """Host-formula photometric chain on [H, W, 3] rgb in [0, 255]."""
    keys = jax.random.split(key, 6)
    rgb = rgb.astype(jnp.float32)
    if contrast:
        alpha = jax.random.uniform(keys[0], minval=contrast[1],
                                   maxval=contrast[2])
        alpha = jnp.where(_gate(keys[1], contrast[0]), alpha, 1.0)
        rgb = jnp.clip((rgb - 128.0) * alpha + 128.0, 0.0, 255.0)
    if brightness:
        add = jax.random.uniform(keys[2], minval=brightness[1],
                                 maxval=brightness[2])
        add = jnp.where(_gate(keys[3], brightness[0]), add, 0.0)
        rgb = jnp.clip(rgb + add, 0.0, 255.0)
    if gamma:
        k = jax.random.uniform(keys[4], minval=gamma[1], maxval=gamma[2])
        k = jnp.where(_gate(keys[5], gamma[0]), k, 1.0)
        rgb = ((rgb / 255.0) ** (1.0 / k)) * 255.0
    return rgb


def augment_sample(key, blob, scale=False, crop=False, hflip=False,
                   vflip=False, gamma=False, contrast=False,
                   brightness=False, rotate=False, shear=False,
                   label_flip=False, label_merge=False):
    """Augment ONE sample blob {modality: [H, W, C] or [H, W]} on device.

    Arg conventions follow the host/reference pipeline exactly
    (datasets/augmentation.py:83-165): probability-first tuples, e.g.
    ``scale=(p, min, max)``, ``crop=(p, size)``, ``hflip=p``.
    """
    geometry_key, photo_key, label_key = jax.random.split(key, 3)
    modalities = list(blob.keys())
    ref = blob[modalities[0]]
    in_h, in_w = int(ref.shape[0]), int(ref.shape[1])
    out_h = out_w = int(crop[1]) if crop else None
    if out_h is None:
        out_h, out_w = in_h, in_w

    m = _sample_geometry(geometry_key, in_h, in_w, out_h, out_w, scale,
                         crop, hflip, vflip, rotate, shear)
    # without rotation/shear the map is axis-aligned (m's off-diagonals are
    # structurally zero): separable row/column sampling, ~100x cheaper
    axis_aligned = not rotate and not (shear and crop)
    out = {}
    for modality in modalities:
        order = 1 if modality == "rgb" else 0
        out[modality] = _warp(blob[modality], m, out_h, out_w, order,
                              axis_aligned=axis_aligned)

    if "rgb" in out and (gamma or contrast or brightness):
        out["rgb"] = _cast_back(
            _photometric(photo_key, out["rgb"], gamma, contrast, brightness),
            out["rgb"].dtype)

    if label_flip and "labels" in out:
        c1, c2 = int(label_flip[0]), int(label_flip[1])
        prob = float(label_flip[2]) if len(label_flip) > 2 else 0.5
        labels = out["labels"]
        flip_1_to_2 = _gate(label_key, prob)
        mapped_fwd = jnp.where(labels == c1, c2, labels)
        mapped_bwd = jnp.where(labels == c2, c1, labels)
        out["labels"] = jnp.where(flip_1_to_2, mapped_fwd, mapped_bwd)

    if label_merge and "labels" in out:
        labels = out["labels"]
        out["labels"] = jnp.where(labels == label_merge[1],
                                  jnp.asarray(label_merge[0], labels.dtype),
                                  labels)
    return out


def augment_batch(key, blob, **config):
    """Augment a batch blob {modality: [N, H, W, ...]}: each sample draws
    its own gates/parameters (vmapped over split keys)."""
    batch = {k: v for k, v in blob.items()}
    n = jax.tree_util.tree_leaves(batch)[0].shape[0]
    keys = jax.random.split(key, n)

    def one(sample_key, sample):
        return augment_sample(sample_key, sample, **config)

    return jax.vmap(one)(keys, batch)
