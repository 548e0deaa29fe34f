"""Pipelined (unroll-4 serving-loop) sweep over the fusion model family.

The docs/TIMING.md headline table reports PER-CALL pipelined rates (the
reference's timing.py semantics), which on this tunneled host include
~0.9 ms/frame of per-dispatch cost that the production InferenceServer
path (bench.py; unroll=4, async groups) amortizes away. bench.py covers
Bayes only; this probe measures the same serving-loop discipline for the
rest of the family so every mode has a production number: device floor
(loop-difference timer) + interleaved scalar-bound wall windows.

Run exclusively: python scripts/pipelined_sweep_probe.py [--int8]
(--int8 quantizes each model for serving first — the int8 family table.)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import bench  # noqa: E402  (sets the persistent compile cache env)

HEIGHT, WIDTH, K, UNITS = 768, 384, 14, 64


def description():
    return ({"labels": np.int32, "rgb": np.float32, "depth": np.float32},
            {"rgb": (None, None, 3), "depth": (None, None, 1),
             "labels": (None, None)}, K)


def fusion_config(**extra):
    base = dict(data_description=description(), num_units=UNITS,
                expert_model="fcn", prefixes={"rgb": "rgb", "depth": "depth"},
                compute_dtype="bfloat16")
    base.update(extra)
    return base


def build_models():
    from modular_semantic_segmentation_tpu.models import get_model

    rng = np.random.RandomState(0)
    models = {}
    # single experts consume only their own modality from the shared
    # rgb+depth batch (inputs are device-resident, so the unused key
    # costs nothing per dispatch)
    models["rgb_fcn"] = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=UNITS,
        data_description=description(), compute_dtype="bfloat16",
        batch_normalization=False)
    models["adapnet"] = get_model("adapnet")(
        prefix="rgb", modality="rgb", num_units=UNITS,
        data_description=description(), compute_dtype="bfloat16")
    models["average"] = get_model("average")(**fusion_config())
    params = {m: rng.rand(K, K).astype("float32") + 1
              for m in ("rgb", "depth")}
    params["class_counts"] = np.ones(K, "float32")
    models["dirichlet"] = get_model("dirichlet_mix")(
        **fusion_config(dirichlet_params=params, sigma=0.2))
    models["fusion_fcn"] = get_model("fusion_fcn")(
        data_description=description(), num_units=UNITS,
        prefixes={"rgb": "rgb", "depth": "depth"},
        compute_dtype="bfloat16")
    models["variance"] = get_model("variance")(
        **fusion_config(num_samples=5, dropout_rate=0.2))
    return models


def main():
    import jax

    rng = jax.random.PRNGKey(0)
    batch = {"rgb": np.ones((1, HEIGHT, WIDTH, 3), np.float32),
             "depth": np.ones((1, HEIGHT, WIDTH, 1), np.float32)}
    models = build_models()

    int8 = "--int8" in sys.argv
    runs, floors = {}, {}
    for name, net in models.items():
        t0 = time.perf_counter()
        if int8:
            net.quantize_for_serving(batch, num_batches=1)
        floors[name] = bench.measure_device_floor(net, batch, rng)
        runs[name] = bench.prepare_serving(net, batch, rng)
        print(f"{name}: floor {floors[name]*1e3:.2f} ms/frame, prepared in "
              f"{time.perf_counter() - t0:.0f} s", flush=True)

    walls = bench.measure_walls(runs, floors, rounds=4, window_s=2.0,
                                spacing_s=6.0)
    print()
    for name in models:
        w = walls[name]
        fps = 1.0 / w["spf"]
        print(f"{name}: pipelined serving {w['spf']*1e3:.3f} ms/frame "
              f"({fps:.1f} fps), floor {floors[name]*1e3:.2f} ms, windows "
              f"{w['fps_windows']}, attempts {w['attempts']}, "
              f"gated {w['gated']}")


if __name__ == "__main__":
    main()
