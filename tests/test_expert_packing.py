"""Cross-expert block-diagonal stem packing (models/packed_experts.py).

The fusion eval path runs all FCN experts' conv1_1..conv2_1 stems as ONE
dense block-diagonal conv stack — the stems are the lane-starved part of
the forward (docs/TIMING.md roofline) and the packed stack measures
1.17x on the v5e (scripts/expert_pack_probe.py). These tests lock:

- packed == unpacked predictions and probabilities, with weights shared
  through the npz contract and eval-mode batch norm running on perturbed
  moving statistics (the BN affine is packed too);
- the packed init creates the IDENTICAL variable set (names, shapes) —
  weight import/export is untouched. Fresh-init VALUES can differ
  between the two builds (initializers consume a sequential rng split
  in creation order, and packed discovery creates variables in a
  different order), which is why the parity tests share weights through
  the npz contract instead of relying on seeds;
- E-ary packing with ragged per-expert input channel counts (3 experts:
  3, 1 and 1 channels).

Block-diagonal packing is mathematically exact (zero products add
exactly zero); the tolerances below only absorb contraction-order
differences of the wider MXU/conv tilings.
"""

import numpy as np

from modular_semantic_segmentation_tpu.models import get_model

NUM_CLASSES = 5


def _rgbd_description():
    return ({"labels": np.int32, "rgb": np.float32, "depth": np.float32},
            {"rgb": (None, None, 3), "depth": (None, None, 1),
             "labels": (None, None)}, NUM_CLASSES)


def _batch(rng, modal_channels, n=2, h=32, w=32):
    batch = {m: rng.rand(n, h, w, c).astype(np.float32) * (255 if c == 3
                                                           else 1)
             for m, c in modal_channels.items()}
    batch["labels"] = rng.randint(0, NUM_CLASSES, (n, h, w)).astype(np.int32)
    return batch


def _assert_outputs_match(net_packed, net_plain, batch, modalities):
    preds_p = np.asarray(net_packed.predict(batch))
    preds_u = np.asarray(net_plain.predict(batch))
    agreement = float(np.mean(preds_p == preds_u))
    assert agreement >= 0.999, f"packed/unpacked labels agree {agreement}"
    for m in modalities:
        prob_p = np.asarray(net_packed.predict(batch,
                                               output_attr=f"{m}_prob"))
        prob_u = np.asarray(net_plain.predict(batch,
                                              output_attr=f"{m}_prob"))
        np.testing.assert_allclose(prob_p, prob_u, rtol=1e-4, atol=1e-5)


def test_packed_stem_matches_unpacked_with_batchnorm(tmp_path):
    """2-expert Bayes fusion, eval-mode BN with perturbed moving stats:
    the packed path (default) and pack_experts=False produce the same
    probabilities and labels from the same npz weights."""
    dd = _rgbd_description()
    rng = np.random.RandomState(0)
    cms = {m: rng.rand(NUM_CLASSES, NUM_CLASSES) + np.eye(NUM_CLASSES) * 5
           for m in ("rgb", "depth")}
    config = dict(num_units=4, expert_model="fcn", batchsize=2,
                  prefixes={"rgb": "rgb", "depth": "depth"},
                  batch_normalization=True)
    batch = _batch(rng, {"rgb": 3, "depth": 1})

    net_packed = get_model("bayes_mix")(data_description=dd,
                                        confusion_matrices=cms, **config)
    # non-trivial BN statistics so the packed eval-mode affine is actually
    # exercised (fresh init gives mean 0 / var 1 on every channel)
    for k in list(net_packed.variables):
        if k.endswith("moving_mean"):
            shape = np.shape(net_packed.variables[k])
            net_packed.variables[k] = rng.randn(*shape).astype(np.float32)
        elif k.endswith("moving_variance"):
            shape = np.shape(net_packed.variables[k])
            net_packed.variables[k] = (
                0.5 + rng.rand(*shape).astype(np.float32))
    weights = net_packed.export_weights(save_dir=str(tmp_path))

    net_plain = get_model("bayes_mix")(data_description=dd,
                                       confusion_matrices=cms,
                                       pack_experts=False, **config)
    report = net_plain.import_weights(weights, warnings=False)
    # the packed init created the exact unpacked variable set
    assert set(net_packed.variables) == set(net_plain.variables)
    del report

    _assert_outputs_match(net_packed, net_plain, batch, ("rgb", "depth"))
    net_packed.close()
    net_plain.close()


def test_packed_stem_three_experts_ragged_channels(tmp_path):
    """3-expert Average fusion without BN: ragged input channels (3/1/1)
    pack into one 36-row im2col matmul + 3-block diagonal convs."""
    dd = ({"labels": np.int32, "rgb": np.float32, "depth": np.float32,
           "ir": np.float32},
          {"rgb": (None, None, 3), "depth": (None, None, 1),
           "ir": (None, None, 1), "labels": (None, None)}, NUM_CLASSES)
    rng = np.random.RandomState(1)
    config = dict(num_units=4, expert_model="fcn", batchsize=2,
                  prefixes={"rgb": "rgb", "depth": "depth", "ir": "ir"})
    batch = _batch(rng, {"rgb": 3, "depth": 1, "ir": 1})

    net_packed = get_model("average")(data_description=dd, **config)
    weights = net_packed.export_weights(save_dir=str(tmp_path))
    net_plain = get_model("average")(data_description=dd,
                                     pack_experts=False, **config)
    net_plain.import_weights(weights, warnings=False)
    assert set(net_packed.variables) == set(net_plain.variables)

    _assert_outputs_match(net_packed, net_plain, batch,
                          ("rgb", "depth", "ir"))
    # the fused average is still the mean of the (packed) expert probs
    fused = np.asarray(net_packed.predict(batch, output_attr="fused_score"))
    probs = [np.asarray(net_packed.predict(batch, output_attr=f"{m}_prob"))
             for m in ("rgb", "depth", "ir")]
    np.testing.assert_allclose(fused, np.mean(probs, axis=0), rtol=1e-4,
                               atol=1e-5)
    net_packed.close()
    net_plain.close()
