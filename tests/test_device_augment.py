"""On-device augmentation: semantics vs the host pipeline + jit safety."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from modular_semantic_segmentation_tpu.ops import device_augment as da
from modular_semantic_segmentation_tpu.datasets import augmentation as host


def _blob(h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "rgb": jnp.asarray(rng.rand(h, w, 3) * 255, jnp.float32),
        "depth": jnp.asarray(rng.rand(h, w, 1), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 5, (h, w)), jnp.int32),
    }


def test_no_config_is_identity():
    blob = _blob()
    out = da.augment_sample(jax.random.PRNGKey(0), blob)
    for key in blob:
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(blob[key]), err_msg=key)


def test_largest_rotated_rect_matches_host():
    for deg in (1, 10, 30, 45, 60, 89):
        for w, h in ((64, 48), (48, 64), (32, 32)):
            want = host.largest_rotated_rect(w, h, math.radians(deg))
            got = da.largest_rotated_rect(
                jnp.float32(w), jnp.float32(h), jnp.float32(math.radians(deg)))
            np.testing.assert_allclose(
                [float(got[0]), float(got[1])], want, rtol=1e-5,
                err_msg=f"deg={deg} w={w} h={h}")


def test_hflip_vflip_quirks():
    """'hflip' flips axis 0, 'vflip' axis 1, each prob-gated AND an extra
    coin toss (host quirk, datasets/augmentation.py:129-138) — so with
    p=1.0 roughly half the draws flip, and a flip is exact."""
    blob = _blob()
    flipped_h = flipped_none = 0
    for i in range(40):
        out = da.augment_sample(jax.random.PRNGKey(i), blob, hflip=1.0)
        got = np.asarray(out["labels"])
        if np.array_equal(got, np.asarray(blob["labels"])[::-1]):
            flipped_h += 1
        elif np.array_equal(got, np.asarray(blob["labels"])):
            flipped_none += 1
        # rgb flips identically (bilinear at integer coords is exact)
        want_rgb = (np.asarray(blob["rgb"])[::-1]
                    if np.array_equal(got, np.asarray(blob["labels"])[::-1])
                    else np.asarray(blob["rgb"]))
        np.testing.assert_allclose(np.asarray(out["rgb"]), want_rgb,
                                   atol=1e-4)
    assert flipped_h + flipped_none == 40  # nothing else happened
    assert 8 <= flipped_h <= 32  # the extra fair coin

    out = da.augment_sample(jax.random.PRNGKey(3), blob, vflip=1.0)
    got = np.asarray(out["labels"])
    assert (np.array_equal(got, np.asarray(blob["labels"])[:, ::-1])
            or np.array_equal(got, np.asarray(blob["labels"])))


def test_photometric_formulas_match_host():
    rng = np.random.RandomState(1)
    rgb = np.asarray(rng.randint(0, 256, (16, 16, 3)), np.float32)

    # deterministic parameter draws: min == max
    out = da.augment_sample(jax.random.PRNGKey(0), {"rgb": jnp.asarray(rgb)},
                            contrast=(1.0, 1.3, 1.3))
    want = np.clip((rgb - 128.0) * 1.3 + 128.0, 0, 255)
    np.testing.assert_allclose(np.asarray(out["rgb"]), want, atol=1e-3)

    out = da.augment_sample(jax.random.PRNGKey(0), {"rgb": jnp.asarray(rgb)},
                            brightness=(1.0, -20.0, -20.0))
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.clip(rgb - 20.0, 0, 255), atol=1e-3)

    # gamma: continuous power curve vs the host's uint8 LUT — within 1 step
    out = da.augment_sample(jax.random.PRNGKey(0), {"rgb": jnp.asarray(rgb)},
                            gamma=(1.0, 0.7, 0.7))
    lut = np.array([((i / 255.0) ** (1 / 0.7)) * 255
                    for i in np.arange(0, 256)])
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               lut[rgb.astype(np.uint8)], atol=1.0)


def test_crop_shapes_and_label_validity():
    blob = _blob(h=32, w=32)
    out = da.augment_sample(jax.random.PRNGKey(5), blob, crop=(1.0, 16),
                            scale=(1.0, 0.7, 1.5), shear=(1.0, 0.05, 0.1))
    assert out["rgb"].shape == (16, 16, 3)
    assert out["depth"].shape == (16, 16, 1)
    assert out["labels"].shape == (16, 16)
    # nearest-sampled labels stay in the original class set
    assert set(np.unique(np.asarray(out["labels"]))) <= set(
        np.unique(np.asarray(blob["labels"])))


def test_rotation_preserves_constant_images():
    const = {"rgb": jnp.full((24, 24, 3), 77.0),
             "labels": jnp.full((24, 24), 3, jnp.int32)}
    out = da.augment_sample(jax.random.PRNGKey(2), const,
                            rotate=(1.0, 20, 40))
    np.testing.assert_allclose(np.asarray(out["rgb"]), 77.0, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out["labels"]), 3)


def test_label_flip_and_merge():
    labels = jnp.asarray(np.tile([1, 2, 3], (6, 2)), jnp.int32)
    flipped = 0
    for i in range(20):
        out = da.augment_sample(jax.random.PRNGKey(i), {"labels": labels},
                                label_flip=(1, 2))
        got = np.asarray(out["labels"])
        assert not (set(np.unique(got)) >= {1, 2})  # one of them got mapped
        flipped += 2 not in got
    assert 3 <= flipped <= 17  # both directions occur

    out = da.augment_sample(jax.random.PRNGKey(0), {"labels": labels},
                            label_merge=(0, 3))
    assert 3 not in np.asarray(out["labels"])


def test_batch_samples_draw_independently_and_jit():
    blob = _blob()
    batch = {k: jnp.stack([v, v]) for k, v in blob.items()}

    @jax.jit
    def run(key, batch):
        return da.augment_batch(key, batch, crop=(1.0, 16), hflip=0.5,
                                gamma=(0.5, 0.4, 1.4))

    out = run(jax.random.PRNGKey(7), batch)
    assert out["rgb"].shape == (2, 16, 16, 3)
    # identical inputs, independent draws -> the two samples differ
    assert not np.array_equal(np.asarray(out["rgb"][0]),
                              np.asarray(out["rgb"][1]))
    # deterministic under the same key
    again = run(jax.random.PRNGKey(7), batch)
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(again["labels"]))


def test_train_step_with_device_augmentation():
    from modular_semantic_segmentation_tpu.datasets import get_dataset
    from modular_semantic_segmentation_tpu.models import get_model

    data = get_dataset("unittest")(height=32, width=32, num_train=4,
                                   num_measure=2, num_test=2)
    net = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4,
        data_description=data.get_data_description(), batchsize=2,
        device_augmentation=dict(crop=(1.0, 16), hflip=0.5,
                                 brightness=(0.3, -10, 10)))
    batch = next(data.get_trainset().batches(2))
    for step in range(2):
        net.variables, net.opt_state, loss = net._jit_train_step(
            net.variables, net.opt_state, batch, jax.random.PRNGKey(step))
        assert np.isfinite(float(loss))


def test_uint8_warp_rounds_instead_of_truncating():
    """Casting interpolated floats back to an integer image dtype must
    round (cv2's INTER_LINEAR semantics) — truncation would bias every
    uint8 frame by -0.5 LSB on average."""
    rng = np.random.RandomState(9)
    img_f = np.asarray(rng.randint(0, 256, (24, 20, 3)), np.float32)
    img_u8 = jnp.asarray(img_f, jnp.uint8)
    # non-integer scale so sampled values land between grid points
    m = jnp.array([[0.73, 0.0, 1.2], [0.0, 1.31, 0.4], [0.0, 0.0, 1.0]])
    for axis_aligned in (True, False):
        want = np.round(np.asarray(
            da._warp(jnp.asarray(img_f), m, 16, 16, 1,
                     axis_aligned=axis_aligned), np.float64))
        got = np.asarray(
            da._warp(img_u8, m, 16, 16, 1, axis_aligned=axis_aligned),
            np.float64)
        # identical sampling math; only the final cast differs (allow 1 LSB
        # for float draws landing exactly on .5)
        assert np.abs(got - want).max() <= 1.0
        assert np.abs(got - want).mean() < 0.05, \
            "systematic truncation bias detected"


def test_separable_fast_path_matches_general_warp():
    """The axis-aligned separable sampler is the same math as the gather
    path (bilinear and nearest, edge clamp) — bit-near-equal."""
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(24, 20, 3) * 255, jnp.float32)
    lab = jnp.asarray(rng.randint(0, 7, (24, 20)), jnp.int32)
    # scale + translation + a vertical flip: off-diagonals zero
    m = jnp.array([[-1.31, 0.0, 27.7], [0.0, 0.77, 1.3], [0.0, 0.0, 1.0]])
    for image, order in ((img, 1), (lab, 0)):
        fast = da._warp(image, m, 16, 16, order, axis_aligned=True)
        slow = da._warp(image, m, 16, 16, order, axis_aligned=False)
        np.testing.assert_allclose(np.asarray(fast, np.float32),
                                   np.asarray(slow, np.float32), atol=1e-3)
