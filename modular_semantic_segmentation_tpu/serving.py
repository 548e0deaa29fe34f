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
