"""Pipelined single-frame inference serving.

The production serving pattern behind the headline numbers in
docs/TIMING.md / bench.py, packaged as an API: each frame runs the exact
batch-1 inference graph (the reference's Table V semantics,
reference experiments/timing.py:49-83), but ``unroll`` frames are
statically unrolled into ONE jitted group program — amortizing the
per-dispatch host/RPC cost (~0.9 ms/frame over this environment's device
tunnel) — and up to ``max_in_flight`` groups are kept dispatched before
the oldest is read back, so host readback latency overlaps device
compute instead of serializing with it.

Measured alternatives (bench.py, docs/TIMING.md): ``lax.map`` over
frames serializes without overlap (10.8 ms/frame) and true batch-8
degrades XLA's spatial tiling at 768x384 (14.8 ms/frame); unroll-4
async dispatch reaches 5.8 ms/frame on the same model. Unroll >= 8 buys
nothing further (dispatch amortization saturates at 4).
"""

from collections import deque

import jax
import numpy as np

from modular_semantic_segmentation_tpu.ops.variables import Ctx


class InferenceServer:
    """Streaming frame-at-a-time inference over an Estimator.

    Args:
        estimator: any fitted Estimator (expert or fusion model). The
            current serving mode is captured — call
            ``quantize_for_serving`` BEFORE constructing the server to
            serve the int8 path.
        unroll: frames per jitted group program.
        max_in_flight: dispatched groups held before blocking on the
            oldest readback (2 = classic double buffering).
        output_attr: which ``_test_outputs`` entry to return per frame
            (``prediction``, ``prob``, model-specific diagnostics, ...).
    """

    def __init__(self, estimator, unroll=4, max_in_flight=2,
                 output_attr="prediction"):
        if unroll < 1 or max_in_flight < 1:
            raise ValueError("unroll and max_in_flight must be >= 1")
        self._net = estimator
        self.unroll = unroll
        self.max_in_flight = max_in_flight
        self._attr = output_attr

        net = estimator

        def group_forward(variables, frame_batches, rng):
            outs = []
            for batch in frame_batches:
                ctx = Ctx(variables, train=False, rng=rng,
                          compute_dtype=net.compute_dtype,
                          act_scales=net.act_scales)
                out = net._test_outputs(ctx, net._preprocess(batch))
                outs.append(out[self._attr])
            return outs

        # variables stay a runtime argument: closing over device arrays
        # would bake them into the HLO as constants (docs/ROADMAP.md
        # environment notes — the remote compiler rejects such bodies)
        self.group_program = jax.jit(group_forward)

    def _dispatch(self, frames):
        """Dispatch one (possibly short) group; returns (outputs, valid)."""
        valid = len(frames)
        # pad the tail group by repeating the last frame: the group
        # program has a static frame count, and a second compile for the
        # tail shape would cost more than the wasted forwards
        padded = frames + [frames[-1]] * (self.unroll - valid)
        batches = [{k: v[None] if hasattr(v, "ndim") else np.asarray(v)[None]
                    for k, v in frame.items()} for frame in padded]
        outs = self.group_program(self._net.variables, batches,
                                  self._net._next_rng())
        return outs, valid

    def predict_stream(self, frames):
        """Yield one output per input frame, in order, pipelined.

        Args:
            frames: iterable of blob dicts with UNBATCHED arrays
                (e.g. ``{"rgb": [H, W, 3], "depth": [H, W, 1]}``).
        """
        in_flight = deque()
        group = []

        def drain(limit):
            while len(in_flight) > limit:
                outs, valid = in_flight.popleft()
                for out in outs[:valid]:
                    yield np.asarray(out)[0]

        for frame in frames:
            group.append(frame)
            if len(group) == self.unroll:
                in_flight.append(self._dispatch(group))
                group = []
                yield from drain(self.max_in_flight - 1)
        if group:
            in_flight.append(self._dispatch(group))
        yield from drain(0)

    def predict(self, frames):
        """Stacked array of outputs for a finite frame iterable."""
        return np.stack(list(self.predict_stream(frames)))


def serve_frames(estimator, frames, **kwargs):
    """One-shot convenience: ``InferenceServer(estimator, **kwargs)
    .predict(frames)``."""
    return InferenceServer(estimator, **kwargs).predict(frames)


# --------------------------------------------------------- AOT deployment

def export_serving(estimator, directory, example_batch,
                   output_attr="prediction", platforms=None):
    """AOT-export the inference program for deployment without model code.

    Serializes the jitted forward (StableHLO via ``jax.export``) together
    with the weights and an input-signature manifest; ``load_serving``
    runs it on a host that has jax but NOT this package's model classes —
    the deployment analogue of the reference's frozen inference graphs
    (reference experiments/timing.py:23-46 builds those in-process; here
    the frozen program is a portable artifact).

    Weights stay a runtime input (shipped as a sidecar npz) rather than
    baked-in constants: programs stay small (multi-MB weight constants
    upset compile pipelines — docs/ROADMAP.md environment notes) and the
    same artifact can be re-pointed at retrained weights of identical
    shapes.

    Args:
        estimator: fitted Estimator (expert or fusion model). The CURRENT
            serving mode is captured — quantize_for_serving first to
            export the int8 path.
        directory: output dir; writes program.jaxexport, weights.npz,
            meta.json.
        example_batch: blob dict with BATCHED arrays fixing the exported
            input shapes/dtypes (static shapes — one artifact per served
            shape, like any AOT compile).
        output_attr: which test output the program returns.
        platforms: lowering platforms tuple (e.g. ``("tpu",)`` or
            ``("cpu", "tpu")``); None = the current default backend.
    """
    import json
    import os

    from jax import export as jax_export

    net = estimator

    def forward(variables, rng, batch):
        ctx = Ctx(variables, train=False, rng=rng,
                  compute_dtype=net.compute_dtype,
                  act_scales=net.act_scales)
        return net._test_outputs(ctx, net._preprocess(batch))[output_attr]

    spec = lambda v: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)  # noqa: E731
    var_specs = {k: spec(v) for k, v in net.variables.items()}
    batch_specs = {k: spec(v) for k, v in example_batch.items()}
    rng_example = net._next_rng()
    exported = jax_export.export(jax.jit(forward), platforms=platforms)(
        var_specs, spec(rng_example), batch_specs)

    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "program.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(directory, "weights.npz"),
             **{k: np.asarray(v) for k, v in net.variables.items()})
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump({
            "output_attr": output_attr,
            "platforms": list(exported.platforms),
            "rng_dtype": str(np.asarray(rng_example).dtype),
            "rng_shape": list(np.shape(rng_example)),
            "inputs": {k: {"shape": list(s.shape), "dtype": str(s.dtype)}
                       for k, s in batch_specs.items()},
        }, f, indent=2)
    return directory


class ExportedServing:
    """Runs an ``export_serving`` artifact; needs jax, not the model code.

    >>> served = ExportedServing("/path/to/artifact")
    >>> prediction = served.predict({"rgb": rgb, "depth": depth})

    ``predict`` re-seeds per call so MC-dropout programs sample freshly;
    pass ``seed`` for reproducible streams.
    """

    def __init__(self, directory, seed=0):
        import json
        import os

        from jax import export as jax_export

        with open(os.path.join(directory, "program.jaxexport"), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        self._variables = dict(np.load(os.path.join(directory,
                                                    "weights.npz")))
        with open(os.path.join(directory, "meta.json")) as f:
            self.meta = json.load(f)
        self._rng = jax.random.PRNGKey(seed)

    def predict(self, batch):
        self._rng, sub = jax.random.split(self._rng)
        return np.asarray(self._exported.call(self._variables, sub,
                                              dict(batch)))
