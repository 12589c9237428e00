"""Jitted SPMD train / eval steps.

Reference hot loop: ``main/train.py:~40-80`` (forward -> JointLocationLoss
-> backward -> Adam step under nn.DataParallel) and ``main/test.py:~30-70``
(no-grad forward + flip-test averaging).

Here ONE jitted function per step covers: on-device augmentation + warp
(augment.make_patch_batch), model forward (bf16-capable), fused Pallas
integral, masked L1, backward, optax update — with the batch sharded over
the ``data`` mesh axis and parameters replicated. XLA inserts the gradient
all-reduce (ICI); BatchNorm statistics are computed over the GLOBAL batch
(sync-BN — stricter than the reference's per-GPU stats).

Eval implements the reference flip-test: average coords with the
x-mirrored, pair-swapped coords of the flipped patch (``main/test.py``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ihpr_tpu.config import Config
from ihpr_tpu.data import skeletons
from ihpr_tpu.data.augment import PatchBatch, finalize_patch, make_patch_batch
from ihpr_tpu.models.pose_net import PoseNet
from ihpr_tpu.ops import joint_location_loss
from ihpr_tpu.ops.loss import joint_location_loss_components
from ihpr_tpu.ops.integral_pallas import soft_argmax_from_heatmap
from ihpr_tpu.parallel.mesh import batch_sharding, image_sharding, replicated_sharding


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """Step decay x(1/lr_dec_factor) at lr_dec_epoch boundaries
    (reference ``common/base.py:set_lr``)."""
    return optax.piecewise_constant_schedule(
        cfg.optim.lr,
        {
            int(e * steps_per_epoch): 1.0 / cfg.optim.lr_dec_factor
            for e in cfg.optim.lr_dec_epoch
        },
    )


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.adam(sched)  # reference: Adam, default betas
    if cfg.optim.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.optim.grad_clip_norm), tx)
    if cfg.optim.weight_decay:
        tx = optax.chain(tx, optax.add_decayed_weights(-cfg.optim.weight_decay))
    return tx


def state_shardings(state: TrainState, mesh, shard_opt_state: bool = False):
    """TrainState-shaped pytree of NamedShardings.

    Default: everything replicated (pure DP). ``shard_opt_state`` is the
    ZeRO-1 analog — each Adam-moment leaf splits over the data axis along
    its largest divisible dimension (scalars/indivisible leaves stay
    replicated); params/batch_stats remain replicated and GSPMD derives
    the grad reduce-scatter + param all-gather from the layout."""
    rep = replicated_sharding(mesh)
    if not shard_opt_state:
        return jax.tree.map(lambda _: rep, state)
    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]

    def opt_leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        size = int(np.prod(shape)) if shape else 1
        cands = [d for d, s in enumerate(shape) if s % n == 0 and s >= n]
        if not cands or size < 1024:  # tiny leaves: collectives > savings
            return rep
        d = max(cands, key=lambda i: shape[i])
        spec = [None] * len(shape)
        spec[d] = axis
        return NamedSharding(mesh, PartitionSpec(*spec))

    return TrainState(
        step=rep,
        params=jax.tree.map(lambda _: rep, state.params),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree.map(opt_leaf, state.opt_state),
    )


def _init_state(
    model: PoseNet,
    cfg: Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    params: Any = None,
    batch_stats: Any = None,
) -> TrainState:
    """The ONE place the TrainState tree is built — create_train_state
    materializes it; make_train_step eval_shapes it for the ZeRO layout
    (the two must agree leaf-for-leaf or the first step recompiles)."""
    if params is None:
        dummy = jnp.zeros((1, *cfg.data.input_shape, 3), jnp.float32)
        variables = model.init(rng, dummy, train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def create_train_state(
    model: PoseNet,
    cfg: Config,
    rng: jax.Array,
    steps_per_epoch: int,
    params: Any = None,
    batch_stats: Any = None,
    mesh=None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg, steps_per_epoch)
    state = _init_state(model, cfg, tx, rng, params, batch_stats)
    if mesh is not None:
        # Land the state in the exact layout the jitted step emits;
        # otherwise the second step sees different input shardings and
        # triggers a full recompile (~30s on this model).
        state = jax.device_put(
            state, state_shardings(state, mesh, cfg.parallel.shard_opt_state)
        )
    return state, tx


def _pick_coords_method(model: PoseNet, mesh):
    """(spatial, coords_method) for a step jitted over ``mesh``.

    2-axis mesh = spatial partitioning: each sample's image rows shard
    over the minor axis (GSPMD halo exchanges through every conv), so the
    step must take the plain-composition integral — pallas_call has no
    GSPMD partitioning rule. Under a 1-axis (data) mesh, model.coords
    launches the fused kernel per-shard via shard_map, but ONLY if the
    model was built with the same mesh (ops/fused_head_integral.
    _sharded_fused); a model built without it would put a bare
    pallas_call inside the sharded jit and trip GSPMD's missing
    partitioning rule (all-gather or compile failure on real multi-chip),
    so that case also falls back to the plain partitionable path. BN
    statistics stay global-batch either way (jit semantics are global;
    XLA partitions the reduces)."""
    spatial = mesh is not None and len(mesh.axis_names) > 1
    if spatial or (
        mesh is not None
        and mesh.size > 1
        and getattr(model, "mesh", None) != mesh
    ):
        return spatial, model.coords_plain
    return spatial, model.coords


def make_train_step(
    model: PoseNet,
    tx: optax.GradientTransformation,
    cfg: Config,
    mesh=None,
    donate: bool = True,
    debug_grads: bool = False,
    lean: bool = False,
) -> Callable:
    """Returns step(state, batch_dict, rng) -> (state, metrics).

    batch_dict: device arrays from pipeline.prefetch_to_device —
    canvas/canvas_origin/canvas_scale/bbox/joints/joint_vis/joints_have_depth.

    ``lean=True`` emits only the loss metric: grad_norm re-reads every
    gradient from HBM and the per-axis error terms re-touch coords — dead
    weight on the 49-of-50 steps whose metrics nobody reads. The Trainer
    runs the lean step between log points (identical state math; only the
    metrics dict differs).
    """
    flip_perm = skeletons.get_skeleton(cfg.data.trainset[0]).flip_permutation()
    joint_num = len(flip_perm)
    depth_dim = cfg.data.depth_dim
    spatial, coords_method = _pick_coords_method(model, mesh)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        if "patch" in batch:  # native host-warp fast path (pipeline.py)
            patch = PatchBatch(
                image=finalize_patch(batch["patch"], batch["color_scale"], cfg.data),
                joint_img=batch["joint_img"],
                joint_vis=batch["joint_vis"],
                joints_have_depth=batch["joints_have_depth"],
            )
        else:  # all-on-device warp path
            aug_rng = jax.random.fold_in(rng, state.step)
            patch = make_patch_batch(
                batch["canvas"],
                batch["canvas_origin"],
                batch["canvas_scale"],
                batch["bbox"],
                batch["joints"],
                batch["joint_vis"],
                batch["joints_have_depth"],
                flip_perm,
                cfg.data,
                rng=aug_rng,
                train=True,
            )

        image = patch.image
        if spatial:
            image = jax.lax.with_sharding_constraint(image, image_sharding(mesh))

        def loss_fn(params):
            # model.coords = fused final-conv + integral kernel: the logits
            # volume never materializes in HBM (ops/fused_head_integral.py).
            coords, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image,
                train=True,
                mutable=["batch_stats"],
                method=coords_method,
            )
            loss = joint_location_loss(
                coords, patch.joint_img, patch.joint_vis, patch.joints_have_depth
            )
            return loss, (updates["batch_stats"], coords)

        (loss, (new_stats, coords)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if lean:
            metrics = {"loss": loss}
        else:
            err_xy, err_z = joint_location_loss_components(
                coords, patch.joint_img, patch.joint_vis, patch.joints_have_depth
            )
            metrics = {
                "loss": loss,
                "grad_norm": optax.global_norm(grads),
                "err_xy_voxels": err_xy,
                "err_z_voxels": err_z,
            }
        if debug_grads:  # test-only: raw grads for DP-equivalence checks
            metrics["grads"] = grads
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    st = rep
    if cfg.parallel.shard_opt_state:
        # ZeRO layout from an eval_shape of the SAME tree-builder
        # create_train_state uses (trace only, nothing materializes).
        template = jax.eval_shape(
            functools.partial(_init_state, model, cfg, tx), jax.random.key(0)
        )
        st = state_shardings(template, mesh, True)
    return jax.jit(
        step,
        in_shardings=(st, bsh, rep),
        out_shardings=(st, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model: PoseNet, cfg: Config, mesh=None) -> Callable:
    """Returns eval_step(params, batch_stats, batch_dict) -> (B, J, 3) voxel
    coords, with the reference's flip-test averaging when cfg.eval.flip_test."""
    skel = skeletons.get_skeleton(cfg.data.testset)
    flip_perm = skel.flip_permutation()
    joint_num = len(flip_perm)
    depth_dim = cfg.data.depth_dim
    out_w = cfg.data.output_shape[1]
    spatial, coords_method = _pick_coords_method(model, mesh)

    def infer(params, batch_stats, image):
        if spatial:
            image = jax.lax.with_sharding_constraint(image, image_sharding(mesh))
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            image,
            train=False,
            method=coords_method,
        )

    def eval_step(params, batch_stats, batch: dict):
        if "patch" in batch:  # native host-warp fast path
            patch = PatchBatch(
                image=finalize_patch(batch["patch"], batch["color_scale"], cfg.data),
                joint_img=batch["joint_img"],
                joint_vis=batch["joint_vis"],
                joints_have_depth=batch["joints_have_depth"],
            )
        else:
            patch = make_patch_batch(
                batch["canvas"],
                batch["canvas_origin"],
                batch["canvas_scale"],
                batch["bbox"],
                batch["joints"],
                batch["joint_vis"],
                batch["joints_have_depth"],
                flip_perm,
                cfg.data,
                rng=None,
                train=False,
            )
        if cfg.eval.flip_test:
            # ONE 2B-batch dispatch for (image, x-mirrored image): on a
            # tunneled platform two sequential forwards pay dispatch latency
            # twice; interleaving on a new axis (not concat) keeps each
            # device's rows local under the data-axis sharding.
            img = patch.image
            both = jnp.stack([img, img[:, :, ::-1, :]], axis=1)
            both = both.reshape((-1,) + img.shape[1:])
            c = infer(params, batch_stats, both)
            c = c.reshape(img.shape[0], 2, joint_num, 3)
            coords, cf = c[:, 0], c[:, 1]
            x = out_w - 1.0 - cf[..., 0]
            cf = jnp.concatenate([x[..., None], cf[..., 1:]], axis=-1)
            cf = cf[:, flip_perm, :]
            coords = (coords + cf) * 0.5
        else:
            coords = infer(params, batch_stats, patch.image)
        return coords, patch.joint_img, patch.joint_vis

    if mesh is None:
        return jax.jit(eval_step)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(rep, rep, bsh),
        out_shardings=(bsh, bsh, bsh),
    )
