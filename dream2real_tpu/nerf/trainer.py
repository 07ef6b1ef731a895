"""NGP training loop: jitted step-chunks + the reference's convergence governor.

Replaces the pyngp training driver (reference reconstruction/train_ngp.py:42-162):
- ``while testbed.frame()`` -> a lax.scan of training steps compiled once and
  invoked in chunks (TPU stays busy; the host only polls loss between chunks);
- ``optimize_extrinsics`` (train_ngp.py:66) -> learnable per-image se(3)
  deltas composed onto the initial camera poses;
- ``random_bg_color`` alpha supervision (train_ngp.py:75, needed for the
  RGBA-masked fg/bg task NeRFs, ngp_visual_model.py:39-46) -> per-ray random
  background compositing of both target and prediction;
- ``near_distance`` (train_ngp.py:77) -> marching near plane;
- the dynamic-time-extension governor (train_ngp.py:98-143) -> same
  stable-steps / relax-thresholds / extend-steps logic, polled per step-chunk
  instead of per 0.1 s wall-clock tick.

Multi-chip: rays are embarrassingly parallel; `train_chunk` accepts an
optional jax.sharding.Sharding for the ray batch and replicates parameters.
Two lowerings, picked automatically:

- XLA fallback path: `with_sharding_constraint` on the sampled rays; GSPMD
  partitions the render and reduces the loss. Bitwise-equal to the
  single-device program modulo f32 reduction order (tested on the 8-dev CPU
  mesh, tests/test_parallel_imagine.py).
- fused pallas-kernel path: GSPMD cannot partition a tpu custom_call, so the
  whole step chunk runs under `jax.shard_map` — every device samples the SAME
  global ray batch (replicated RNG), takes its axis_index slice, runs the
  fused kernel on local rays, and grads/loss are `pmean`ed before the
  (replicated) optimizer update. The per-ray sampling jitter key is folded
  with the device index, so numerics match single-device statistically, not
  bitwise.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
from dream2real_tpu.nerf.render import RenderSettings, render_rays
from dream2real_tpu.ops.image import linear_to_srgb, srgb_to_linear
from dream2real_tpu.ops.se3 import make_pose, so3_exp


@dataclasses.dataclass
class TrainConfig:
    n_steps: int = 2000
    batch_rays: int = 4096
    lr: float = 1e-2
    ext_lr: float = 3e-4
    ext_start_step: int = 256
    weight_decay: float = 1e-6
    optimize_extrinsics: bool = False
    # RGB-D depth supervision weight (TPU-build extension: the reference's
    # scans are RGB-D, data_loader.py:58, but pyngp ignores depth; supervising
    # expected ray depth recovers NGP-class convergence speed for the pure-MLP
    # field). 0 disables.
    depth_weight: float = 0.1
    # Free-space carving (RGB-D): the depth camera saw THROUGH every point
    # strictly in front of the observed surface, so density there must be
    # ~zero for any field trained on the scan. Plain RGB + expected-depth
    # supervision tolerates a near-camera "billboard" minimum (the huber
    # depth gradient is magnitude-capped): observed on the combined
    # noise+distortion rehearsal, where the movable fg field collapsed to
    # per-camera shells at t~0.16 (gt ~0.75) and rendered empty inside the
    # crop march box. Role parity: instant-ngp prunes its occupancy grid
    # against depth when fed RGB-D; this is the sampling-based equivalent
    # for the TPU marcher. Applied ONLY to masked task fields (fg_pixels
    # given): that alpha-masked supervision is what underconstrains
    # geometry; on the fully-supervised scene field the term just slows
    # fitting (governor-visible: 600-step loss ratio 0.55 vs 0.45 on the
    # synthetic tabletop) with no failure mode to prevent. 0 disables.
    freespace_weight: float = 0.1
    freespace_samples: int = 8
    # Convergence governor (train_ngp.py:95-97).
    stable_polls_thresh: int = 50
    stable_loss_thresh: float = 2e-4
    max_infinity_steps: int = 40000
    poll_steps: int = 100  # steps per jitted chunk == one governor poll
    dynamic_time_extension: bool = True
    seed: int = 0


def _use_train_kernel(cfg: NGPConfig) -> bool:
    """Fused training kernels: default on for TPU backends (interpret-mode
    emulation is too slow for CPU test meshes — set D2R_PALLAS_TRAIN=1 to
    force there, 0 to disable everywhere)."""
    import os

    flag = os.environ.get("D2R_PALLAS_TRAIN")
    if flag == "0":
        return False
    from dream2real_tpu.nerf.train_kernel import supports_training

    if not supports_training(cfg):
        return False
    return flag == "1" or jax.default_backend() == "tpu"


def init_train_state(
    cfg: NGPConfig, tc: TrainConfig, n_images: int
) -> dict[str, Any]:
    key = jax.random.PRNGKey(tc.seed)
    params = {
        "field": init_ngp_params(key, cfg),
        "ext_rot": jnp.zeros((n_images, 3), jnp.float32),
        "ext_trans": jnp.zeros((n_images, 3), jnp.float32),
    }
    tx = _make_optimizer(tc)
    return {
        "params": params,
        "opt": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "key": key,
    }


def _make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    def label_fn(params):
        return {
            "field": jax.tree.map(lambda _: "field", params["field"]),
            "ext_rot": "ext",
            "ext_trans": "ext",
        }

    # NOTE: instant-ngp's adam eps=1e-15 suits sparse hash-table updates; for
    # a dense MLP it degenerates to sign-SGD at lr, which oscillates when
    # fine-tuning a warm-started field with mixed losses. Standard eps +
    # cosine decay is stable for both cold and warm starts.
    schedule = optax.cosine_decay_schedule(
        tc.lr, decay_steps=max(tc.n_steps, 1), alpha=0.01
    )
    field_tx = optax.chain(
        optax.add_decayed_weights(tc.weight_decay),
        optax.adam(schedule, b1=0.9, b2=0.99, eps=1e-8),
    )
    # NOTE: extrinsics need a *gentler* optimizer than the field. With adam
    # eps=1e-15 every step moves each pose by ~ext_lr radians/metres no matter
    # how small the gradient (sign-sgd regime) and joint pose+field training
    # diverges; eps=1e-8 keeps updates proportional near convergence.
    ext_tx = optax.adam(tc.ext_lr, b1=0.9, b2=0.99, eps=1e-8)
    return optax.multi_transform({"field": field_tx, "ext": ext_tx}, label_fn)


def optimized_poses(params, init_poses: jnp.ndarray) -> jnp.ndarray:
    """Compose learned se(3) deltas onto initial camera-to-world poses.

    init_poses (N, 4, 4) accio convention. Returns (N, 4, 4).
    Replaces pyngp's get_camera_extrinsics export (train_ngp.py:220-226).
    """
    R_delta = so3_exp(params["ext_rot"])
    delta = make_pose(R_delta, params["ext_trans"])
    return jnp.matmul(init_poses, delta, precision=jax.lax.Precision.HIGHEST)


def make_train_chunk(
    cfg: NGPConfig,
    tc: TrainConfig,
    settings: RenderSettings,
    images_rgba: jnp.ndarray,  # (N, H, W, 4) uint8, sRGB + alpha
    init_poses: jnp.ndarray,  # (N, 4, 4) accio camera-to-world
    dirs_cam: jnp.ndarray,  # (H, W, 3) z-normalized camera-frame pixel dirs
    depths: jnp.ndarray | None = None,  # (N, H, W) float32 z-depth metres, 0=invalid
    ray_sharding=None,
    fg_pixels: jnp.ndarray | None = None,  # (M, 3) int32 [img, y, x] opaque px
):
    """Build the jitted train_chunk(state) -> (state, mean_loss) function.

    fg_pixels: for alpha-masked task NeRFs (fg/bg training images where only
    a few % of pixels are opaque, ngp_visual_model.py:39-46) uniform ray
    sampling starves the object and the field collapses to empty; when given,
    half of each ray batch is drawn from these opaque pixels.
    """
    n_img, h, w = images_rgba.shape[:3]

    use_kernel = _use_train_kernel(cfg)
    # Pallas custom_calls are opaque to GSPMD: when the fused kernel is on
    # and a ray sharding is requested, run the whole chunk under shard_map
    # (see module docstring). The XLA path keeps the sharding-constraint
    # lowering, whose numerics are bitwise-testable against single-device.
    mesh = getattr(ray_sharding, "mesh", None) if ray_sharding is not None else None
    shard_train = mesh is not None and use_kernel
    if shard_train:
        from jax.sharding import PartitionSpec as P

        from dream2real_tpu.parallel.mesh import DATA_AXIS

        n_dev = mesh.size
        assert tc.batch_rays % n_dev == 0, (tc.batch_rays, n_dev)
        n_local = tc.batch_rays // n_dev

    if tc.optimize_extrinsics and use_kernel:
        # The fused kernel's VJP returns only the dominant gradient term wrt
        # origins/dirs (drops the |d| scale, SH-basis and ray-aabb-ts paths —
        # see train_kernel.py module docstring). Pose refinement still
        # converges in practice, but flag it once so real-scan runs know the
        # extrinsics gradients are approximate (exact: D2R_PALLAS_TRAIN=0).
        import warnings

        warnings.warn(
            "optimize_extrinsics with the fused pallas training kernel uses "
            "approximate ray-origin/direction gradients; set "
            "D2R_PALLAS_TRAIN=0 for exact autodiff extrinsics gradients.",
            stacklevel=2,
        )

    def sample_batch(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        img_idx = jax.random.randint(k1, (tc.batch_rays,), 0, n_img)
        py = jax.random.randint(k2, (tc.batch_rays,), 0, h)
        px = jax.random.randint(k3, (tc.batch_rays,), 0, w)
        if fg_pixels is not None:
            n_fg = tc.batch_rays // 2
            sel = jax.random.randint(k5, (n_fg,), 0, fg_pixels.shape[0])
            chosen = fg_pixels[sel]
            img_idx = img_idx.at[:n_fg].set(chosen[:, 0])
            py = py.at[:n_fg].set(chosen[:, 1])
            px = px.at[:n_fg].set(chosen[:, 2])
        bg = jax.random.uniform(k4, (tc.batch_rays, 3))
        return img_idx, py, px, bg

    def loss_fn(params, key, step):
        k_batch, k_render = jax.random.split(key)
        img_idx, py, px, bg = sample_batch(k_batch)
        if shard_train:
            # Replicated sampling (same key everywhere) -> each device takes
            # its slice of the SAME global batch; local mean + pmean below
            # reproduces the single-device global-mean loss/grads.
            idx = jax.lax.axis_index(DATA_AXIS)
            off = idx * n_local

            def _sl(a):
                return jax.lax.dynamic_slice_in_dim(a, off, n_local, 0)

            img_idx, py, px, bg = _sl(img_idx), _sl(py), _sl(px), _sl(bg)
            k_render = jax.random.fold_in(k_render, idx)
        target = images_rgba[img_idx, py, px].astype(jnp.float32) / 255.0
        target_rgb = srgb_to_linear(target[:, :3])
        target_a = target[:, 3]

        if tc.optimize_extrinsics:
            # Freeze extrinsics updates before ext_start_step by gating the
            # delta (gradient flows but is zeroed by the gate -> no update).
            gate = (step >= tc.ext_start_step).astype(jnp.float32)
            poses = optimized_poses(
                {
                    "ext_rot": params["ext_rot"] * gate,
                    "ext_trans": params["ext_trans"] * gate,
                },
                init_poses,
            )
        else:
            poses = init_poses
        if tc.optimize_extrinsics:
            # Differentiable pose pick as a one-hot matmul: the VJP of a
            # gather is a scatter-add (measured ~1.5 ms/step on v5e); the
            # one-hot contraction makes both directions MXU matmuls.
            # n_img is small (10-40 cameras), so the (B, n_img) selector
            # is cheap.
            sel = jax.nn.one_hot(img_idx, n_img, dtype=jnp.float32)
            T = jnp.einsum(
                "bn,nij->bij", sel, poses,
                precision=jax.lax.Precision.HIGHEST,
            )  # (B, 4, 4)
        else:
            T = poses[img_idx]  # (B, 4, 4) — gather fwd only, no grads
        d_cam = dirs_cam[py, px]  # (B, 3)
        dirs = jnp.einsum("bij,bj->bi", T[:, :3, :3], d_cam)
        origins = T[:, :3, 3]
        if ray_sharding is not None and not shard_train:
            origins = jax.lax.with_sharding_constraint(origins, ray_sharding)
            dirs = jax.lax.with_sharding_constraint(dirs, ray_sharding)

        if use_kernel:
            # Fused pallas forward+backward (train_kernel.py): the XLA
            # lowering is HBM-bound at ~21% MFU; the kernel keeps per-sample
            # activations in VMEM (recompute-in-backward).
            from dream2real_tpu.nerf.train_kernel import render_rays_train

            out = render_rays_train(
                params["field"], cfg, origins, dirs, settings, k_render,
                # Extrinsics frozen -> dL/d(origins,dirs) is discarded;
                # skip its chain in the backward kernel (ray-grad-only
                # matmul + sin/cos re-evaluation).
                need_ray_grads=tc.optimize_extrinsics,
            )
        else:
            out = render_rays(
                params["field"], cfg, origins, dirs, settings, k_render
            )
        # Random-background alpha supervision (train_ngp.py:75).
        pred = out["rgb"] + bg * (1.0 - out["alpha"][:, None])
        tgt = target_rgb * target_a[:, None] + bg * (1.0 - target_a[:, None])
        err = linear_to_srgb(jnp.clip(pred, 0.0, 1.0)) - linear_to_srgb(tgt)
        loss = jnp.mean(optax.huber_loss(err, delta=0.1)) * 2.0
        if depths is not None and tc.depth_weight > 0:
            gt_d = depths[img_idx, py, px]
            # Supervise only solid (alpha-masked-in) pixels with valid depth.
            mask = (gt_d > 0) & (target_a > 0.5)
            d_err = jnp.where(mask, out["depth"] - gt_d, 0.0)
            loss = loss + tc.depth_weight * jnp.mean(
                optax.huber_loss(d_err, delta=0.05)
            )
        # The governor (and the reference's train_ngp.py:95-97 semantics it
        # mirrors) tracks FITTING progress; the free-space regularizer below
        # carries a slowly-decaying residual near surfaces that would blunt
        # the relative-delta convergence test, so it contributes to the
        # GRADIENT only and the task loss is what gets reported.
        task_loss = loss
        if depths is not None and fg_pixels is not None and tc.freespace_weight > 0:
            # Free-space carving (see TrainConfig.freespace_weight): sample
            # uniformly in [near, 0.9*gt_d] along every valid-depth ray and
            # penalise expected opacity there. Density-only trunk evals
            # (~freespace_samples / (n_coarse + n_fine) extra field FLOPs);
            # applies to BOTH the fused-kernel and XLA paths as a separate
            # autodiffed term.
            from dream2real_tpu.nerf.model import density_fn

            # Carving shapes the FIELD only: stop_gradient the ray geometry,
            # or the term backprops into ext_rot/ext_trans with a perverse
            # incentive — shifting a camera slides its rays off density and
            # lowers the penalty without fixing anything. Measured on the
            # combined noise+distortion rehearsal: with this path live,
            # extrinsics opt DIVERGED from 5.8 mm / 0.66 deg jitter to
            # 20.9 mm / 1.38 deg vs truth.
            o_sg = jax.lax.stop_gradient(origins)
            d_sg = jax.lax.stop_gradient(dirs)
            gt_free = depths[img_idx, py, px]
            S = tc.freespace_samples
            t_hi = jnp.maximum(gt_free * 0.9, settings.near)
            u = jax.random.uniform(
                jax.random.fold_in(k_render, 7), (gt_free.shape[0], S)
            )
            t_free = settings.near + u * (t_hi - settings.near)[:, None]
            pos_f = o_sg[:, None, :] + d_sg[:, None, :] * t_free[..., None]
            sigma_f, _ = density_fn(
                params["field"], pos_f, cfg, settings.compute_dtype
            )
            # Expected opacity of one sampled step (metric length via |d|).
            d_norm = jnp.linalg.norm(d_sg, axis=-1)
            dt = (t_hi - settings.near) / S * d_norm
            occ = 1.0 - jnp.exp(-sigma_f * dt[:, None])
            fmask = (gt_free > 0).astype(jnp.float32)[:, None]
            loss = loss + tc.freespace_weight * jnp.mean(occ * fmask)
        return loss, task_loss

    tx = _make_optimizer(tc)

    def one_step(carry, _):
        params, opt, step, key = carry
        key, sub = jax.random.split(key)
        (_, loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, sub, step
        )
        if shard_train:
            # Combine the per-device slices' grads; the optimizer update then
            # runs replicated (identical on every device).
            loss = jax.lax.pmean(loss, DATA_AXIS)
            grads = jax.lax.pmean(grads, DATA_AXIS)
        if not tc.optimize_extrinsics:
            grads["ext_rot"] = jnp.zeros_like(grads["ext_rot"])
            grads["ext_trans"] = jnp.zeros_like(grads["ext_trans"])
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt, step + 1, key), loss

    def chunk_body(state):
        carry = (state["params"], state["opt"], state["step"], state["key"])
        carry, losses = jax.lax.scan(one_step, carry, None, length=tc.poll_steps)
        params, opt, step, key = carry
        return (
            {"params": params, "opt": opt, "step": step, "key": key},
            losses.mean(),
        )

    if shard_train:
        train_chunk = jax.jit(
            jax.shard_map(
                chunk_body, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
                check_vma=False,
            )
        )
    else:
        train_chunk = jax.jit(chunk_body)
    return train_chunk


def train_with_governor(
    train_chunk,
    state,
    tc: TrainConfig,
    log_fn=None,
) -> tuple[dict, list[float]]:
    """Run chunks under the dynamic-time-extension convergence governor.

    Mirrors reconstruction/train_ngp.py:98-143: stop when `stable_polls`
    consecutive polls see loss < stable_loss_thresh, or past the hard cap;
    at n_steps, if not converged and dynamic extension is on, relax the
    thresholds (x1.5 loss, /1.5 polls) and extend n_steps x1.3 up to 40k.
    """
    n_steps = tc.n_steps
    stable_polls_thresh = tc.stable_polls_thresh
    stable_loss_thresh = tc.stable_loss_thresh
    stable_polls = 0
    losses: list[float] = []

    while True:
        state, loss = train_chunk(state)
        loss = float(loss)
        step = int(state["step"])
        losses.append(loss)
        if log_fn is not None:
            log_fn(step, loss)

        if loss < stable_loss_thresh:
            stable_polls += 1
        else:
            stable_polls = 0

        if stable_polls > stable_polls_thresh or step > tc.max_infinity_steps:
            break
        if step >= n_steps:
            if (
                stable_polls > stable_polls_thresh and loss < stable_loss_thresh
            ) or not tc.dynamic_time_extension:
                break
            stable_loss_thresh *= 1.5
            stable_polls_thresh = int(stable_polls_thresh / 1.5)
            n_steps = int(n_steps * 1.3)
            if n_steps > tc.max_infinity_steps:
                break
    return state, losses
