"""Measure the reference's TF-CPU baseline numbers (BASELINE.md north-star
denominator).

The reference's timing harness (experiments/timing.py:23-311) times
sess.run of a frozen TF1 graph on a constant 1x768x384 input on a GTX
1080 Ti; BASELINE.json specifies the TF-*CPU* single-expert/fused numbers
as the comparison base, which were never published. This script measures
them on this machine's CPU: the reference-shaped SimpleFCN (VGG16 FCN,
num_units=64, 14 classes, batchnorm in eval mode — the paper's Table V
config, experiments/example_config.yaml) built from raw tf.nn ops with
TF1 layer semantics (the same oracle construction validated against our
network in tests/test_golden_parity.py), compiled with tf.function (graph
mode, the closest TF2 equivalent of the reference's frozen-graph
sess.run), mean over repetitions.

Run: python scripts/measure_tf_cpu_baseline.py [repetitions]
"""

import json
import sys
import time

import numpy as np

import os
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import tensorflow as tf  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from modular_semantic_segmentation_tpu.ops.init import bilinear_filter  # noqa

NUM_UNITS = 64
NUM_CLASSES = 14


class Weights:
    def __init__(self, seed):
        self.rng = np.random.RandomState(seed)
        self.store = {}

    def get(self, name, shape, kind="normal"):
        if name not in self.store:
            if kind == "bilinear":
                value = bilinear_filter(shape)
            elif kind == "positive":
                value = (self.rng.rand(*shape) + 0.5).astype(np.float32)
            else:
                scale = (1.0 / np.sqrt(np.prod(shape[:-1]))
                         if len(shape) == 4 else 0.1)
                value = (self.rng.randn(*shape) * scale).astype(np.float32)
            self.store[name] = tf.constant(value)
        return self.store[name]


def conv(w, x, filters, ksize, name, relu=True):
    kernel = w.get(f"{name}/kernel", (ksize, ksize, int(x.shape[-1]), filters))
    out = tf.nn.conv2d(x, kernel, 1, "SAME") + w.get(f"{name}/bias",
                                                     (filters,))
    c = int(out.shape[-1])
    out = tf.nn.batch_normalization(
        out, w.get(f"{name}/mm", (c,)), w.get(f"{name}/mv", (c,), "positive"),
        w.get(f"{name}/beta", (c,)), w.get(f"{name}/gamma", (c,), "positive"),
        1e-3)
    return tf.nn.relu(out) if relu else out


def deconv(w, x, filters, ksize, stride, name, relu=True):
    n, h, wd, c = (int(s) for s in x.shape)
    kernel = w.get(f"{name}/kernel", (ksize, ksize, filters, c), "bilinear")
    out = tf.nn.conv2d_transpose(
        x, kernel, (n, h * stride, wd * stride, filters),
        [1, stride, stride, 1], "SAME")
    cc = int(out.shape[-1])
    out = tf.nn.batch_normalization(
        out, w.get(f"{name}/mm2", (cc,)),
        w.get(f"{name}/mv2", (cc,), "positive"),
        w.get(f"{name}/beta2", (cc,)), w.get(f"{name}/gamma2", (cc,),
                                             "positive"), 1e-3)
    return tf.nn.relu(out) if relu else out


def fcn(w, x, prefix):
    """Reference-shaped SimpleFCN score (xview/models/simple_fcn.py:10-170)."""
    l = {}
    last = x
    for block, (reps, width) in enumerate(
            [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)], start=1):
        for rep in range(1, reps + 1):
            name = f"{prefix}/conv{block}_{rep}"
            l[name] = last = conv(w, last, width, 3, name)
        if block < 5:
            last = tf.nn.max_pool2d(last, 2, 2, "VALID")
        if block == 3:
            l["c43_in"] = last
    score4 = conv(w, l[f"{prefix}/conv4_3"], NUM_UNITS, 1,
                  f"{prefix}/score_conv4")
    score5 = conv(w, l[f"{prefix}/conv5_3"], NUM_UNITS, 1,
                  f"{prefix}/score_conv5")
    fused = score4 + deconv(w, score5, NUM_UNITS, 4, 2,
                            f"{prefix}/upscore_conv5")
    up = deconv(w, fused, NUM_UNITS, 16, 8, f"{prefix}/upscore")
    return conv(w, up, NUM_CLASSES, 1, f"{prefix}/score", relu=False)


def build(kind, seed=0):
    w = Weights(seed)
    rng = np.random.RandomState(1)
    conds = {m: tf.constant(np.random.RandomState(2).rand(
        NUM_CLASSES, NUM_CLASSES).astype(np.float32))
        for m in ("rgb", "depth")}
    log_prior = tf.constant(np.log(np.full(NUM_CLASSES, 1 / 14,
                                           np.float32)))
    rgb = tf.constant(np.ones((1, 768, 384, 3), np.float32))
    depth = tf.constant(np.ones((1, 768, 384, 1), np.float32))

    if kind == "rgb_fcn":
        def fn():
            return tf.argmax(tf.nn.softmax(fcn(w, rgb, "rgb")), 3)
    elif kind == "bayes_fusion":
        # reference time_bayes_fcn (timing.py:49-83): both experts +
        # confusion-conditional gather + log prior + argmax in one graph
        def fn():
            rgb_cls = tf.argmax(tf.nn.softmax(fcn(w, rgb, "rgb")), 3)
            depth_cls = tf.argmax(tf.nn.softmax(fcn(w, depth, "depth")), 3)
            score = (tf.math.log(1e-20 + tf.gather(conds["rgb"], rgb_cls))
                     + tf.math.log(1e-20 + tf.gather(conds["depth"],
                                                     depth_cls))
                     + log_prior)
            return tf.argmax(score, 3)
    else:
        raise ValueError(kind)
    return tf.function(fn)


def measure(kind, repetitions):
    fn = build(kind)
    np.asarray(fn())  # compile + warmup
    times = []
    for _ in range(repetitions):
        start = time.time()
        np.asarray(fn())
        times.append(time.time() - start)
    return {"mean_s": float(np.mean(times)), "std_s": float(np.std(times)),
            "fps": float(1.0 / np.mean(times)), "repetitions": repetitions}


if __name__ == "__main__":
    repetitions = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    results = {}
    for kind in ("rgb_fcn", "bayes_fusion"):
        results[kind] = measure(kind, repetitions)
        print(kind, json.dumps(results[kind]))
    print(json.dumps({"tf_cpu_baseline": results}))
