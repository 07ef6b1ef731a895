"""Attribute the extrinsics-on training-step overhead (real TPU).

PERF.md's round-2 table compared 'full (extr on) 6.76 ms' against
'fg/bg (extr off) 4.75 ms' — different datasets AND different ray-sampling
(fg/bg uses the opaque-pixel importance sampler), so the 2 ms delta was
never cleanly attributed to extrinsics. This bench holds the dataset and
sampler fixed and toggles one thing at a time:

  1. extr-off                    (baseline)
  2. extr-on                     (the production joint-refinement path)
  3. extr-on, gated off          (ext_start_step > n_steps: same compute
                                  graph, zero pose motion — separates graph
                                  cost from convergence effects)
  4. glue-only                   (so3_exp + pose compose + one-hot selector
                                  + dirs einsum fwd+bwd, no field/kernel —
                                  the extrinsics-specific XLA glue in
                                  isolation, trainer.py:189-217)

Usage: python experiments/bench_train_extr.py [chunks]
Timing per CLAUDE.md: D2H of an on-device reduction; warm-up chunk first.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.data import synth
from dream2real_tpu.nerf.model import NGPConfig
from dream2real_tpu.nerf.render import RenderSettings
from dream2real_tpu.nerf.trainer import (
    TrainConfig,
    init_train_state,
    make_train_chunk,
    optimized_poses,
)
from dream2real_tpu.ops import cameras

POLL = 50  # steps per jitted chunk


def _dataset(res=128, n_views=24):
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(scene.centre, n_views, radius=0.5, height=0.4)
    rgba, depths = [], []
    for i in range(n_views):
        rgb, depth, inst = synth.render_scene(scene, cams[i], K, res, res)
        a = np.where(inst > 0, 255, 0).astype(np.uint8)
        rgba.append(np.concatenate([rgb, a[..., None]], -1))
        depths.append(depth)
    dirs = cameras.pixel_dirs(res, res, jnp.asarray(K))
    return (jnp.asarray(np.stack(rgba)), jnp.asarray(cams.astype(np.float32)),
            dirs, jnp.asarray(np.stack(depths)))


def _time_chunk(chunk, state, reps):
    state, _ = chunk(state)  # warm-up/compile
    t0 = time.time()
    for _ in range(reps):
        state, loss = chunk(state)
    float(loss)  # D2H sync
    dt = (time.time() - t0) / (reps * POLL)
    return dt, state


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(jax.devices(), flush=True)
    rgba, cams, dirs, depths = _dataset()
    ncfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)

    rows = []
    for name, extr, start in [
        ("extr-off", False, 0),
        ("extr-on", True, 256),
        ("extr-on-gated", True, 10**9),
    ]:
        tc = TrainConfig(
            n_steps=POLL * (reps + 1), batch_rays=4096, poll_steps=POLL,
            optimize_extrinsics=extr, ext_start_step=start,
            dynamic_time_extension=False,
        )
        state = init_train_state(ncfg, tc, n_images=rgba.shape[0])
        chunk = make_train_chunk(ncfg, tc, settings, rgba, cams, dirs,
                                 depths=depths)
        dt, _ = _time_chunk(chunk, state, reps)
        rows.append((name, dt))
        print(f"{name:16s}: {dt*1e3:6.2f} ms/step ({1/dt:5.0f} steps/s)",
              flush=True)

    # 4. glue-only: the extrinsics-specific math with a scalar stand-in for
    # the renderer, fwd+bwd, scanned like a training chunk.
    B, n_img = 4096, rgba.shape[0]
    d_cam = dirs[: B // 128, : 128].reshape(B, 3)

    def glue_loss(params, key):
        img_idx = jax.random.randint(key, (B,), 0, n_img)
        poses = optimized_poses(params, cams)
        sel = jax.nn.one_hot(img_idx, n_img, dtype=jnp.float32)
        T = jnp.einsum("bn,nij->bij", sel, poses,
                       precision=jax.lax.Precision.HIGHEST)
        d = jnp.einsum("bij,bj->bi", T[:, :3, :3], d_cam)
        o = T[:, :3, 3]
        return jnp.sum(d * d) + jnp.sum(o)

    def glue_step(carry, _):
        params, key = carry
        key, sub = jax.random.split(key)
        loss, g = jax.value_and_grad(glue_loss)(params, sub)
        params = jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
        return (params, key), loss

    @jax.jit
    def glue_chunk(carry):
        carry, losses = jax.lax.scan(glue_step, carry, None, length=POLL)
        return carry, losses.mean()

    params = {"ext_rot": jnp.zeros((n_img, 3)), "ext_trans": jnp.zeros((n_img, 3))}
    carry = (params, jax.random.PRNGKey(0))
    carry, _ = glue_chunk(carry)  # compile
    t0 = time.time()
    for _ in range(reps):
        carry, loss = glue_chunk(carry)
    float(loss)
    dt = (time.time() - t0) / (reps * POLL)
    print(f"{'glue-only':16s}: {dt*1e3:6.2f} ms/step", flush=True)

    off = dict(rows)["extr-off"]
    on = dict(rows)["extr-on"]
    print(f"extr-on overhead: {(on-off)*1e3:.2f} ms/step "
          f"({(on/off-1)*100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
