"""TPU-only check: the fused Pallas raster+shade path must match the XLA
reference path (render/rasterizer.py + render/shading.py) on both large and
tiny meshes.  Run on a real TPU (the Pallas kernels don't run on CPU):

    python tools/check_pallas_parity.py
"""

import sys
from os import path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from scflow_tpu.render.meshbank import make_synthetic_bank
    from scflow_tpu.render.renderer import render_batch

    assert jax.default_backend() == "tpu", "run this on a TPU"

    rng = np.random.default_rng(0)
    failures = 0
    for kind, subdiv, nclass in (("sphere", 4, 8), ("cube", 0, 4)):
        bank = make_synthetic_bank(nclass, kind=kind, size=80.0,
                                   subdivisions=subdiv)
        batch, img = 8, 256
        labels = jnp.asarray(rng.integers(0, nclass, batch).astype(np.int32))
        K = jnp.asarray(
            np.tile(
                np.array([[[572.4, 0, 128], [0, 573.5, 128], [0, 0, 1]]],
                         np.float32),
                (batch, 1, 1),
            )
        )
        from scipy.spatial.transform import Rotation

        R = jnp.asarray(
            np.stack([Rotation.random(random_state=i).as_matrix()
                      for i in range(batch)]).astype(np.float32)
        )
        t = jnp.asarray(
            np.concatenate(
                [rng.uniform(-30, 30, (batch, 2)),
                 rng.uniform(500, 900, (batch, 1))],
                axis=1,
            ).astype(np.float32)
        )
        args = (
            jnp.asarray(bank.verts), jnp.asarray(bank.faces),
            jnp.asarray(bank.face_valid), jnp.asarray(bank.colors),
            jnp.asarray(bank.normals), jnp.asarray(bank.vert_valid),
            R, t, K, labels, img, img,
        )
        ref = render_batch(*args, backend="xla")
        out = render_batch(*args, backend="pallas")
        for key, atol in (("depths", 0.05), ("masks", 0.0), ("images", 0.02)):
            a = np.asarray(ref[key])
            b = np.asarray(out[key])
            # the two backends may pick different faces on exact z-ties at
            # silhouette pixels; compare away from the mask boundary
            mismatch = np.abs(a - b) > atol
            frac = mismatch.mean()
            ok = frac < 2e-3
            print(f"{kind}: {key:7s} mismatch frac {frac:.2e} "
                  f"max |d| {np.abs(a - b).max():.4f} -> "
                  f"{'OK' if ok else 'FAIL'}")
            failures += 0 if ok else 1
    if failures:
        sys.exit(f"{failures} parity check(s) failed")
    print("pallas/xla parity OK")


if __name__ == "__main__":
    main()
