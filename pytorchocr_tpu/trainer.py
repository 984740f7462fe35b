"""TPU train/eval step factories.

One jitted graph per task (SURVEY.md §7): the train step fuses
forward + loss + backward + optimizer update + BN-stat update; the eval
step is the forward in eval mode.  Batches are sharded over the mesh's
"data" axis; state is replicated; buffers are donated.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .parallel.mesh import batch_sharding, replicated_sharding


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def create_train_state(model, tx, rng, example_batch, input_transform=None):
    """Initialize params/batch_stats from an example batch (host numpy).
    input_transform (Global.device_normalize) maps the raw uint8 image
    tensor to the normalized floats the model actually sees."""
    images = jnp.asarray(example_batch[0])
    if input_transform is not None:
        images = input_transform(images)
    # heads receive the FULL positional batch as `data` (same contract as
    # make_train_step; e.g. SLAHead reads targets[1] = structure tokens)
    data = tuple(
        jnp.asarray(x) if isinstance(x, np.ndarray) or np.isscalar(x) else x
        for x in example_batch
    )
    # jit the init: eager flax init dispatches each lax op separately,
    # which costs ~100s of per-op RTTs through the TPU tunnel; one traced
    # call compiles once (and lands in the persistent compile cache).
    # Falls back to eager init when the batch holds non-array leaves
    # (jit pytrees must be arrays).
    try:
        variables = jax.jit(
            lambda r, im, d: model.init(r, im, data=d, train=True)
        )(rng, images, data)
    except TypeError:
        variables = model.init(rng, images, data=data, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def build_input_transform(spec):
    """Compile a recorded host-normalize chain into a jit-traceable image
    transform (uint8 NHWC wire -> normalized float32).

    `spec` is the list of {op, params} entries that program.preprocess()
    strips from the data pipeline under ``Global.device_normalize`` —
    the training-side analogue of the deploy JitRunner's fused on-device
    normalize (and of the reference's CUDA NormMeanStd kernel,
    deploy/trt_utils.py:33-60): images cross the tunnel as uint8 (4x
    fewer bytes than f32) and the scale/mean/std arithmetic fuses into
    the first conv's input read on device.  Returns None for an empty
    spec.
    """
    if not spec:
        return None
    steps = []
    for entry in spec:
        name, params = entry["op"], entry.get("params") or {}
        if name == "ToTensor":
            steps.append(lambda x: x / 255.0)
        elif name == "Normalize":
            mean = jnp.asarray(params["mean"], jnp.float32).reshape(1, 1, 1, -1)
            std = jnp.asarray(params["std"], jnp.float32).reshape(1, 1, 1, -1)
            steps.append(lambda x, m=mean, s=std: (x - m) / s)
        elif name == "NormalizeImage":
            scale = params.get("scale", 1.0 / 255.0)
            scale = eval(scale) if isinstance(scale, str) else scale
            mean = jnp.asarray(
                params.get("mean", [0.485, 0.456, 0.406]), jnp.float32
            ).reshape(1, 1, 1, -1)
            std = jnp.asarray(
                params.get("std", [0.229, 0.224, 0.225]), jnp.float32
            ).reshape(1, 1, 1, -1)
            steps.append(lambda x, sc=scale, m=mean, s=std: (x * sc - m) / s)
        else:  # pragma: no cover — preprocess() only records the above
            raise ValueError("unsupported device_normalize op: %s" % name)

    def transform(images):
        x = images.astype(jnp.float32)
        if x.ndim == 3:  # HW C-less gray from some chains
            x = x[..., None]
        for s in steps:
            x = s(x)
        return x

    return transform


def _mask_frozen_updates(updates, step, frozen):
    """Zero a gradient/update pytree for top-level param subtrees that are
    frozen at `step`.  frozen: iterable of (prefix, until_step) — the
    subtree receives no updates while step < until_step (until_step huge
    => whole run).  Used for STAR-Net's TPS warm-start: under all-blank
    CTC gradients an unfrozen localization net warps inputs into
    illegibility before the CTC can align (measured r4: corr-with-source
    0.15-0.3 by step 1600, loss pinned at 3.8).

    Applied to GRADS (before tx.update) so Adam moments / global-norm
    clipping never accumulate the frozen subtree's gradients during the
    freeze — at unfreeze the subtree starts from clean optimizer state
    rather than a stale-momentum first step — AND to the resulting
    updates (after tx.update) so transforms that emit param-dependent
    terms with zero grads (additive weight decay) cannot move frozen
    params either."""
    for prefix, until in frozen:
        if prefix not in updates:
            continue
        gate = (step >= until)
        updates = dict(updates)
        updates[prefix] = jax.tree.map(
            lambda u: u * gate.astype(u.dtype), updates[prefix]
        )
    return updates


def make_train_step(model, loss_fn, tx, mesh, donate=True, remat=False,
                    input_transform=None, compiler_options=None, frozen=()):
    """Build the jitted train step.

    batch is a tuple of arrays; batch[0] is the NHWC image tensor; the loss
    consumes (preds, batch) with the reference's positional contract.
    remat=True rematerializes the forward during backward (jax.checkpoint)
    — trades ~30% step FLOPs for activation memory, enabling larger
    batches/resolutions per chip.  input_transform (optional) normalizes
    the raw uint8 image tensor on device (Global.device_normalize).
    compiler_options (optional dict) forwards per-computation XLA options
    (e.g. {"xla_tpu_scoped_vmem_limit_kib": "65536"}) — used by
    benchmarks/bench_train.py's backward-pass flag sweep.
    """

    def step_fn(state: TrainState, batch):
        images = batch[0]
        if input_transform is not None:
            images = input_transform(images)
        # per-step rng for stochastic train-time model behavior (SLAHead
        # scheduled sampling); unused rngs are ignored by flax, so this is
        # free for every other architecture
        rngs = {"sample": jax.random.fold_in(jax.random.PRNGKey(17), state.step)}

        def forward(params, images, batch):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                return model.apply(
                    variables, images, data=batch, train=True,
                    mutable=["batch_stats"], rngs=rngs,
                )
            return model.apply(
                variables, images, data=batch, train=True, rngs=rngs
            ), None

        fwd = jax.checkpoint(forward) if remat else forward

        def loss_inner(params):
            preds, mutated = fwd(params, images, batch)
            new_bs = (
                mutated["batch_stats"] if mutated is not None else state.batch_stats
            )
            losses = loss_fn(preds, batch)
            return losses["loss"], (losses, new_bs)

        (loss_val, (losses, new_bs)), grads = jax.value_and_grad(
            loss_inner, has_aux=True
        )(state.params)
        if frozen:
            grads = _mask_frozen_updates(grads, state.step, frozen)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        if frozen:
            updates = _mask_frozen_updates(updates, state.step, frozen)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )


def make_multi_train_step(model, loss_fn, tx, mesh, donate=True,
                          input_transform=None, frozen=()):
    """Train step over STACKED batches: batch leaves have a leading
    `steps` axis and the step runs as one on-device lax.scan.

    Amortizes per-dispatch overhead — essential when the host reaches the
    TPU through a proxy/tunnel that round-trips buffers per call, and good
    practice on real pods too (fewer dispatches, better pipelining).
    input_transform must match make_train_step's (Global.device_normalize
    applies to EVERY step of the scan, same as the per-step path).
    Returns (new_state, losses_of_last_step).
    """

    def one_step(state, batch):
        images = batch[0]
        if input_transform is not None:
            images = input_transform(images)
        # same per-step rng contract as make_train_step: without it,
        # SLAHead scheduled sampling silently degrades to teacher forcing
        # whenever Global.steps_per_dispatch > 1
        rngs = {"sample": jax.random.fold_in(jax.random.PRNGKey(17), state.step)}

        def loss_inner(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                preds, mutated = model.apply(
                    variables, images, data=batch, train=True,
                    mutable=["batch_stats"], rngs=rngs,
                )
                new_bs = mutated["batch_stats"]
            else:
                preds = model.apply(
                    variables, images, data=batch, train=True, rngs=rngs
                )
                new_bs = state.batch_stats
            losses = loss_fn(preds, batch)
            return losses["loss"], (losses, new_bs)

        (_, (losses, new_bs)), grads = jax.value_and_grad(
            loss_inner, has_aux=True
        )(state.params)
        if frozen:
            grads = _mask_frozen_updates(grads, state.step, frozen)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        if frozen:
            updates = _mask_frozen_updates(updates, state.step, frozen)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt_state,
                step=state.step + 1,
            ),
            losses,
        )

    def multi_step(state, stacked_batch):
        def body(carry, batch):
            new_state, losses = one_step(carry, batch)
            return new_state, losses

        state, losses_seq = jax.lax.scan(body, state, stacked_batch)
        last = jax.tree.map(lambda x: x[-1], losses_seq)
        return state, last

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    # stacked batches are sharded on axis 1 (the per-step batch axis)
    stacked_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data")
    )
    return jax.jit(
        multi_step,
        in_shardings=(repl, stacked_sharding),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def stack_batches(batches):
    """List of positional numpy batches -> one stacked batch with a leading
    steps axis per leaf (for make_multi_train_step)."""
    n_fields = len(batches[0])
    return tuple(
        np.stack([b[i] for b in batches], axis=0) for i in range(n_fields)
    )


def make_eval_step(model, mesh, input_transform=None):
    """Jitted eval forward.  Recompiles per input shape; DetResizeForTest
    buckets keep the shape set small."""

    def eval_fn(params, batch_stats, images):
        if input_transform is not None:
            images = input_transform(images)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, images, train=False)

    # images sharding is left to the caller: det eval runs batch-1 (can't
    # shard over data), rec/cls eval shards when divisible — see
    # shard_or_replicate().
    return jax.jit(eval_fn)

