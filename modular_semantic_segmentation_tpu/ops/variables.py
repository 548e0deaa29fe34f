"""Flat, name-addressed variable store for functional network definitions.

The reference framework (xview) relies on TF1 variable scopes so that (a) npz
weight files are keyed by human-readable names like ``rgb/conv1_1/kernel``
(reference: xview/models/base_model.py:361-393) and (b) fusion models can
instantiate expert networks purely by name prefix
(reference: xview/models/basic_fusion_model.py:9-23).

We keep that *contract* but implement it the JAX way: all variables live in one
flat ``dict[str, jax.Array]`` — a perfectly ordinary pytree that can be passed
through ``jax.jit`` / ``pjit``, differentiated, and sharded. Network
architectures are pure functions that read/create entries in a :class:`Ctx`.

Two modes:
    * init:  layer calls create missing entries with their initializers.
    * apply: layer calls read entries; batch-norm in training mode records
      moving-stat updates in ``ctx.updates`` (merged functionally by the
      caller — no mutable state, no tf.GraphKeys.UPDATE_OPS).
"""

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np


class Ctx:
    """Variable context threaded through functional layer calls.

    Args:
        variables: flat dict name -> array. In init mode, missing entries are
            created (into ``self.created``).
        train: training mode flag (batch-norm batch stats, dropout active).
        rng: optional ``jax.random.PRNGKey`` for stochastic layers/inits.
        init: if True, create missing variables with their initializers.
        compute_dtype: dtype used inside convolutions (e.g. ``jnp.bfloat16``
            to hit the MXU at full rate); variables are always stored float32.
        act_scales: optional dict full-scope-name -> float activation scale
            enabling the int8 post-training-quantized serving path in
            eligible convs (models/quantize.py). None = float serving.
        calibrate: when True, convs record the absolute max of their input
            into ``self.amax`` (keyed by scope) for PTQ calibration.
    """

    def __init__(self, variables=None, train=False, rng=None, init=False,
                 compute_dtype=jnp.float32, abstract=False,
                 spatial_axis=None, act_scales=None, calibrate=False,
                 calibrate_percentile=100.0):
        self.variables = variables if variables is not None else {}
        # mesh axis name when running height-sharded under shard_map
        # (parallel/spatial.py): convs/deconvs exchange row halos
        self.spatial_axis = spatial_axis
        self.created = {}
        self.trainable = {}
        self.specs = {}
        self.train = train
        self.init = init
        self.abstract = abstract
        self.updates = {}
        self.compute_dtype = compute_dtype
        self.act_scales = act_scales
        self.calibrate = calibrate
        # percentile of |input| recorded during calibration; 100 = max-abs
        # (the standard PTQ recipe), lower values clip outliers
        self.calibrate_percentile = calibrate_percentile
        self.amax = {}
        self._rng = rng
        self._scope = []

    # ---------------------------------------------------------------- scoping
    @contextmanager
    def scope(self, name):
        if name:
            self._scope.append(str(name))
        try:
            yield self
        finally:
            if name:
                self._scope.pop()

    def full_name(self, name):
        return "/".join(self._scope + [name])

    # ------------------------------------------------------------------- rngs
    def next_rng(self):
        if self._rng is None:
            raise ValueError(
                "This computation needs an rng (stochastic layer or random "
                "initializer) but Ctx was constructed with rng=None.")
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -------------------------------------------------------------- variables
    def get(self, name, shape, initializer, trainable=True):
        """Fetch (or, in init mode, create) a variable."""
        full = self.full_name(name)
        if full in self.variables:
            return self.variables[full]
        if not self.init:
            raise KeyError(
                f"Variable '{full}' not found (available: "
                f"{len(self.variables)} vars). Did you run init first?")
        shape = tuple(int(s) for s in shape)
        if self.abstract:
            # shape-discovery pass: record the spec, return a placeholder
            if full not in self.specs:
                self.specs[full] = (shape, initializer)
                self.trainable[full] = bool(trainable)
            return jnp.zeros(shape, jnp.float32)
        if full not in self.created:
            value = initializer(self, shape)
            self.created[full] = jnp.asarray(value, jnp.float32)
            self.trainable[full] = bool(trainable)
        return self.created[full]

    def record_update(self, name, value):
        """Record a functional state update (e.g. BN moving stats)."""
        self.updates[self.full_name(name)] = value


def init_variables(net_fn, rng, *example_args, compute_dtype=jnp.float32,
                   **example_kwargs):
    """Run ``net_fn(ctx, *example_args)`` in init mode and collect variables.

    Returns (variables, trainable) — two flat dicts, in two phases:

    1. shape discovery under ``jax.eval_shape`` (no FLOPs, no compile):
       the network runs on placeholders, recording every variable's
       (shape, initializer);
    2. one small jitted program evaluating just the initializers — a
       single dispatch instead of compiling the full forward pass or
       making thousands of eager round trips to a remote accelerator.
    """
    discover_ctx = Ctx(variables={}, train=False, rng=jax.random.PRNGKey(0),
                       init=True, compute_dtype=compute_dtype, abstract=True)

    def discover(_):
        net_fn(discover_ctx, *example_args, **example_kwargs)
        return ()

    jax.eval_shape(discover, 0)
    specs = dict(discover_ctx.specs)
    trainable = dict(discover_ctx.trainable)

    def create(rng):
        ctx = Ctx(variables={}, train=False, rng=rng, init=True,
                  compute_dtype=compute_dtype)
        return {name: jnp.asarray(initializer(ctx, shape), jnp.float32)
                for name, (shape, initializer) in specs.items()}

    created = jax.jit(create)(rng)
    # variables stay DEVICE-resident: pulling them to host costs a full
    # weight download over the (possibly remote) device link, and every
    # consumer is a jitted step anyway. Export paths pull on demand.
    return dict(created), trainable


def split_trainable(variables, trainable):
    """Partition a flat variable dict into (trainable, frozen) dicts."""
    train_vars = {k: v for k, v in variables.items() if trainable.get(k, False)}
    frozen_vars = {k: v for k, v in variables.items()
                   if not trainable.get(k, False)}
    return train_vars, frozen_vars
