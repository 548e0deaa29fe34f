"""Pipelined serving API: parity with predict(), tail + order handling."""

import os
import subprocess
import sys

import numpy as np

from modular_semantic_segmentation_tpu.datasets import get_dataset
from modular_semantic_segmentation_tpu.models import get_model
from modular_semantic_segmentation_tpu.serving import (InferenceServer,
                                                       serve_frames)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _net_and_frames(num_frames=7):
    data = get_dataset("unittest")(height=32, width=32, num_train=4,
                                   num_measure=2, num_test=num_frames)
    net = get_model("simple_fcn")(
        prefix="rgb", modality="rgb", num_units=4,
        data_description=data.get_data_description(), batchsize=1, seed=5)
    batch = next(data.get_testset().batches(num_frames))
    frames = [{"rgb": np.asarray(batch["rgb"][i])}
              for i in range(num_frames)]
    return net, frames, {"rgb": np.asarray(batch["rgb"])}


def test_serving_matches_predict_with_tail_group():
    """7 frames at unroll=4: one full group + a padded tail group, outputs
    equal to the per-batch predict() path, in input order."""
    net, frames, full = _net_and_frames(7)
    want = net.predict(full)
    got = InferenceServer(net, unroll=4, max_in_flight=2).predict(frames)
    np.testing.assert_array_equal(got, want)


def test_serving_prob_output_attr():
    net, frames, full = _net_and_frames(3)
    want = net.predict(full, output_attr="prob")
    got = serve_frames(net, frames, unroll=2, output_attr="prob")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_serving_single_frame_stream():
    net, frames, full = _net_and_frames(1)
    want = net.predict(full)
    outs = list(InferenceServer(net, unroll=4).predict_stream(frames))
    assert len(outs) == 1
    np.testing.assert_array_equal(outs[0], want[0])


def test_serving_compiles_once_across_groups():
    net, frames, _ = _net_and_frames(8)
    server = InferenceServer(net, unroll=4)
    server.predict(frames)
    # full group and padded tail share the one static-shape program
    assert server.group_program._cache_size() == 1


def test_export_serving_roundtrip(tmp_path):
    """AOT deployment artifact: export_serving writes program + weights +
    manifest; ExportedServing reproduces net.predict exactly without
    touching the model class."""
    from modular_semantic_segmentation_tpu.serving import (ExportedServing,
                                                           export_serving)

    net, _, full = _net_and_frames(2)
    want = net.predict(full)
    art = export_serving(net, str(tmp_path / "artifact"), full)
    served = ExportedServing(art)
    got = served.predict(full)
    np.testing.assert_array_equal(got, want)
    assert served.meta["output_attr"] == "prediction"
    # the artifact is re-pointable at same-shape weights: zeroing one
    # kernel through the sidecar npz changes the served outputs
    served._variables["rgb/score/kernel"] = np.zeros_like(
        served._variables["rgb/score/kernel"])
    assert not np.array_equal(served.predict(full), want) or want.std() == 0


def test_export_serving_int8_cross_process(tmp_path):
    """The composition promised at serving.py:34-35,140-141:
    quantize_for_serving BEFORE export_serving bakes the int8 path into
    the AOT artifact. Locks (a) the exported int8 program differs from
    the float export (the int8 branch is really in the program), (b) it
    bit-matches the in-process int8 predict, and (c) a FRESH PROCESS
    reloading only the artifact reproduces those outputs exactly."""
    from modular_semantic_segmentation_tpu.serving import (ExportedServing,
                                                           export_serving)

    net, _, full = _net_and_frames(2)
    data = get_dataset("unittest")(height=32, width=32, num_train=4,
                                   num_measure=2, num_test=2)
    float_art = export_serving(net, str(tmp_path / "float"), full,
                               output_attr="prob")

    scales = net.quantize_for_serving(data.get_measureset(), num_batches=1,
                                      min_channels=64, min_pixels=0)
    assert scales, "no convs were quantized"
    want_prob = net.predict(full, output_attr="prob")
    want_pred = net.predict(full)
    int8_art = export_serving(net, str(tmp_path / "int8"), full,
                              output_attr="prob")
    export_serving(net, str(tmp_path / "int8_pred"), full)
    net.dequantize_serving()

    got = ExportedServing(int8_art).predict(full)
    np.testing.assert_array_equal(got, np.asarray(want_prob))
    # the int8 program is NOT the float program
    assert not np.array_equal(ExportedServing(float_art).predict(full), got)

    # fresh-process reload: only the artifact + jax, no model build
    inputs_file = str(tmp_path / "inputs.npz")
    out_file = str(tmp_path / "out.npy")
    np.savez(inputs_file, **{k: np.asarray(v) for k, v in full.items()})
    code = (
        "import numpy as np\n"
        "from modular_semantic_segmentation_tpu.serving import "
        "ExportedServing\n"
        f"batch = dict(np.load({inputs_file!r}))\n"
        f"served = ExportedServing({str(tmp_path / 'int8_pred')!r})\n"
        f"np.save({out_file!r}, served.predict(batch))\n"
        "print('EXPORT_OK')\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    result = subprocess.run([sys.executable, "-c", code],
                            capture_output=True, text=True, cwd=REPO,
                            env=env, timeout=600)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "EXPORT_OK" in result.stdout
    np.testing.assert_array_equal(np.load(out_file), np.asarray(want_pred))


def test_export_serving_packed_fusion_roundtrip(tmp_path):
    """The cross-expert packed stem (models/packed_experts.py — in-graph
    block-diagonal kernel assembly, lane-aligned splits) exports through
    jax.export like any XLA program: a Bayes fusion AOT artifact
    reproduces net.predict without the model class."""
    from modular_semantic_segmentation_tpu.serving import (ExportedServing,
                                                           export_serving)

    data = get_dataset("unittest")(height=32, width=32, num_train=4,
                                   num_measure=2, num_test=2)
    rng = np.random.RandomState(0)
    K = data.get_data_description()[2]
    cms = {m: rng.rand(K, K) + np.eye(K) * 5 for m in ("rgb", "depth")}
    net = get_model("bayes_mix")(
        data_description=data.get_data_description(),
        confusion_matrices=cms, num_units=4, expert_model="fcn",
        prefixes={"rgb": "rgb", "depth": "depth"}, batchsize=2)
    batch = next(data.get_testset().batches(2))
    full = {"rgb": np.asarray(batch["rgb"]),
            "depth": np.asarray(batch["depth"])}
    want = net.predict(full)
    art = export_serving(net, str(tmp_path / "fusion"), full)
    got = ExportedServing(art).predict(full)
    np.testing.assert_array_equal(got, want)
    net.close()
