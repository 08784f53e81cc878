"""Component-level TPU timing of the SCFlow inference path."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scflow_tpu.utils.platform import check_remote_backend_reachable

check_remote_backend_reachable()

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    """Force a host fetch: on the remote-TPU (axon) backend
    jax.block_until_ready does not reliably wait — only a value fetch
    drains the dispatch queue."""
    leaves = jax.tree_util.tree_leaves(out)
    # fetch a scalar touching EVERY leaf — fetching only the first could
    # return while other outputs of a multi-output fn are still in flight
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from scflow_tpu.models import RAFTEncoder, SCFlowDecoder
    from scflow_tpu.ops.corr import corr_lookup, correlation_pyramid
    from scflow_tpu.refiners.system import RenderAssets
    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.render.renderer import render_batch

    batch, img = 16, 256
    h = w = img // 8
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # --- renderer ---
    bank = make_synthetic_bank(21, kind="cube", size=80.0)
    ra = RenderAssets.from_bank(bank)
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    K = jnp.asarray(np.tile(np.array([[[572.0, 0, 128], [0, 572.0, 128], [0, 0, 1]]], np.float32), (batch, 1, 1)))
    labels = jnp.asarray(rng.integers(0, 21, batch).astype(np.int32))

    def render(R, t, K, labels):
        return render_batch(ra.verts, ra.faces, ra.face_valid, ra.colors,
                            ra.normals, ra.vert_valid, R, t, K, labels,
                            img, img, chunk=64)["depths"]

    print(f"render_batch:      {timeit(jax.jit(render), R, t, K, labels) * 1e3:8.2f} ms")

    # --- encoder ---
    enc = RAFTEncoder(norm="IN")
    x = jnp.asarray(rng.normal(size=(batch, img, img, 3)).astype(np.float32))
    vars_enc = enc.init(key, x)
    enc_apply = jax.jit(lambda v, x: enc.apply(v, x))
    print(f"encoder 1 pass:    {timeit(enc_apply, vars_enc, x) * 1e3:8.2f} ms")

    # --- correlation pyramid ---
    f1 = jnp.asarray(rng.normal(size=(batch, h, w, 256)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(batch, h, w, 256)).astype(np.float32))
    pyr_fn = jax.jit(lambda a, b: correlation_pyramid(a, b, 4))
    print(f"corr pyramid:      {timeit(pyr_fn, f1, f2) * 1e3:8.2f} ms")

    # --- corr lookup (single) ---
    pyr = pyr_fn(f1, f2)
    flow = jnp.asarray(rng.normal(size=(batch, h, w, 2)).astype(np.float32))
    look_fn = jax.jit(lambda p, fl: corr_lookup(p, fl, 4))
    print(f"corr lookup x1:    {timeit(look_fn, pyr, flow) * 1e3:8.2f} ms")

    # --- full decoder (8 iters) ---
    dec = SCFlowDecoder(iters=8, pose_head_cfg=dict(type="MultiClassPoseHead", num_class=21, in_channels=224))
    depth = np.zeros((batch, img, img), np.float32)
    depth[:, 64:192, 64:192] = 700.0
    depth = jnp.asarray(depth)
    hf = jnp.zeros((batch, h, w, 128))
    cx = jnp.zeros((batch, h, w, 128))
    vars_dec = dec.init(key, f1, f2, hf, cx, R, t, depth, K, labels)
    dec_apply = jax.jit(lambda v: dec.apply(v, f1, f2, hf, cx, R, t, depth, K, labels))
    print(f"decoder 8 iters:   {timeit(dec_apply, vars_dec) * 1e3:8.2f} ms")


def profile_full():
    """Time the exact bench inference path and its halves.

    PROFILE_BATCH env overrides the batch (default 16) — used to check the
    stage split at the batch-64 headline configuration."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scflow_tpu.refiners import SCFlowRefiner
    from scflow_tpu.refiners.system import RenderAssets, make_scflow_infer_fn, render_and_normalize
    from scflow_tpu.render.meshbank import make_synthetic_bank
    import functools

    batch, img, iters, nclass = 16, 256, 8, 21
    batch = int(os.environ.get("PROFILE_BATCH", batch))
    print(f"[profile_full] batch={batch}")
    bank = make_synthetic_bank(nclass, kind="cube", size=80.0)
    ra = RenderAssets.from_bank(bank)
    model = SCFlowRefiner(iters=iters, detach_depth_for_xy=True,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass, in_channels=224))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    real = jnp.asarray(rng.normal(size=(batch, img, img, 3)).astype(np.float32) * 0.2)
    K = jnp.asarray(np.tile(np.array([[[572.4, 0, 128], [0, 573.5, 128], [0, 0, 1]]], np.float32), (batch, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32)[None], (batch, 1, 1)))
    t = jnp.asarray(np.tile(np.array([[0, 0, 700.0]], np.float32), (batch, 1)))
    labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
    variables = model.init(key, real, real, R, t, jnp.zeros((batch, img, img)), K, labels)

    rn = jax.jit(functools.partial(render_and_normalize, ra, image_size=(img, img),
                                   norm_mean=(0.,0.,0.), norm_std=(255.,)*3))
    print(f"render+norm:        {timeit(lambda: rn(R, t, K, labels)) * 1e3:8.2f} ms")
    imgs, depths, masks = rn(R, t, K, labels)

    apply_fn = jax.jit(lambda v, ri: model.apply(v, ri, real, R, t, depths, K, labels))
    print(f"model.apply (full): {timeit(apply_fn, variables, imgs) * 1e3:8.2f} ms")

    infer = make_scflow_infer_fn(model, ra, image_size=(img, img))
    bd = {"real_images": real, "ref_rotations": R, "ref_translations": t, "k": K, "labels": labels}
    print(f"infer end-to-end:   {timeit(infer, variables, bd) * 1e3:8.2f} ms")


if __name__ == "__main__":
    if os.environ.get("PROFILE_FULL"):
        profile_full()
    else:
        main()
