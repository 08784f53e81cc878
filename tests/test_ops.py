"""Op numerics vs. torch oracles (grid_sample, interpolate, unfold-based
convex upsample, correlation pyramid + lookup)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from scflow_tpu.ops import (
    avg_pool2,
    backward_warp,
    convex_upsample,
    corr_lookup,
    correlation_pyramid,
    grid_sample,
    interpolate_bilinear,
    nn_points,
    resize_align_corners,
    sample_at_pixels,
)


def to_torch_nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def from_torch_nchw(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


class TestGridSample:
    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_vs_torch(self, rng, align_corners, mode):
        n, h, w, c = 2, 9, 13, 3
        feat = rng.normal(size=(n, h, w, c)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, size=(n, 7, 5, 2)).astype(np.float32)
        expect = from_torch_nchw(
            F.grid_sample(
                to_torch_nchw(feat), torch.from_numpy(grid),
                mode=mode, padding_mode="zeros", align_corners=align_corners,
            )
        )
        got = np.asarray(
            grid_sample(jnp.asarray(feat), jnp.asarray(grid), mode=mode,
                        padding_mode="zeros", align_corners=align_corners)
        )
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_gradients_flow(self, rng):
        feat = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
        grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 4, 4, 2)).astype(np.float32))
        g = jax.grad(lambda gr: grid_sample(feat, gr, align_corners=True).sum())(grid)
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


class TestResize:
    @pytest.mark.parametrize("scale", [0.125, 8.0, 0.5, 2.0])
    def test_vs_torch_align_corners(self, rng, scale):
        n, h, w, c = 2, 16, 16, 3
        x = rng.normal(size=(n, h, w, c)).astype(np.float32)
        expect = from_torch_nchw(
            F.interpolate(to_torch_nchw(x), scale_factor=scale, mode="bilinear",
                          align_corners=True)
        )
        got = np.asarray(interpolate_bilinear(jnp.asarray(x), scale))
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_avg_pool(self, rng):
        x = rng.normal(size=(2, 8, 12, 4)).astype(np.float32)
        expect = from_torch_nchw(F.avg_pool2d(to_torch_nchw(x), 2, 2))
        np.testing.assert_allclose(np.asarray(avg_pool2(jnp.asarray(x))), expect, atol=1e-6)


class TestCorrelation:
    def test_pyramid_vs_torch(self, rng):
        n, h, w, c = 2, 8, 8, 16
        f1 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        f2 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        t1, t2 = to_torch_nchw(f1), to_torch_nchw(f2)
        corr = torch.matmul(
            t1.view(n, c, -1).permute(0, 2, 1), t2.view(n, c, -1)
        ).view(n * h * w, 1, h, w) / np.sqrt(c)
        pyr_t = [corr]
        for _ in range(3):
            pyr_t.append(F.avg_pool2d(pyr_t[-1], 2, 2))
        pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 4)
        for a, b in zip(pyr, pyr_t):
            np.testing.assert_allclose(
                np.asarray(a)[..., 0], b[:, 0].numpy(), atol=1e-4
            )

    def test_lookup_vs_torch_reference_semantics(self, rng):
        """Oracle re-derives corr_lookup.py:102-136 (incl. its (dy,dx)-to-(x,y)
        tap-order quirk)."""
        n, h, w, c, r = 1, 8, 8, 8, 2
        f1 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        f2 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        flow = rng.normal(size=(n, h, w, 2)).astype(np.float32) * 2

        pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 2)
        got = np.asarray(corr_lookup(pyr, jnp.asarray(flow), radius=r))

        # torch oracle
        t1, t2 = to_torch_nchw(f1), to_torch_nchw(f2)
        corr = torch.matmul(t1.view(n, c, -1).permute(0, 2, 1), t2.view(n, c, -1))
        corr = corr.view(n * h * w, 1, h, w) / np.sqrt(c)
        pyr_t = [corr, F.avg_pool2d(corr, 2, 2)]
        tflow = torch.from_numpy(flow.transpose(0, 3, 1, 2))
        xx = torch.arange(w); yy = torch.arange(h)
        g = torch.stack(torch.meshgrid(yy, xx, indexing="ij")[::-1], 0).float()
        grid = (g[None] + tflow).permute(0, 2, 3, 1)
        d = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(d, d, indexing="ij"), -1)  # (k,k,2)=(dy,dx)
        out_levels = []
        for i, corr_l in enumerate(pyr_t):
            centroid = grid.reshape(n * h * w, 1, 1, 2) / 2**i
            coords = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
            hh, ww = corr_l.shape[-2:]
            cg = coords.clone()
            cg[..., 0] = cg[..., 0] * 2 / max(ww - 1, 1) - 1
            cg[..., 1] = cg[..., 1] * 2 / max(hh - 1, 1) - 1
            s = F.grid_sample(corr_l, cg, mode="bilinear", padding_mode="zeros",
                              align_corners=True)
            out_levels.append(s.view(n, h, w, -1))
        expect = torch.cat(out_levels, dim=-1).numpy()
        np.testing.assert_allclose(got, expect, atol=1e-4)

    @pytest.mark.parametrize("variant", ["tent", "shift", "bdiag"])
    @pytest.mark.parametrize("n,h,w", [(2, 8, 8), (1, 8, 8), (3, 4, 4)])
    def test_pallas_lookup_matches_xla(self, rng, n, h, w, variant):
        """Fused Pallas lookup kernel (interpret mode on CPU) == the XLA
        tent-matmul path, including B % block != 0 row padding.  All
        kernel variants (dense tent-multiply, one-hot shifted-row blend,
        block-diagonal cross-level) must agree with the XLA formulation."""
        from scflow_tpu.ops.pallas.corr_lookup import corr_lookup_pallas

        c = 16
        f1 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        f2 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        flow = rng.normal(size=(n, h, w, 2)).astype(np.float32) * 2
        pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 2)
        want = np.asarray(corr_lookup(pyr, jnp.asarray(flow), radius=2))
        got = np.asarray(
            corr_lookup_pallas(pyr, jnp.asarray(flow), radius=2,
                               interpret=True, variant=variant)
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_shift_variant_edge_and_integer_coords(self, rng):
        """The shifted-row kernel's zeros-padding and integer-coordinate
        paths (fy == 0) match the XLA tent path exactly where it matters:
        windows straddling the map border and exactly-integer flows."""
        from scflow_tpu.ops.pallas.corr_lookup import corr_lookup_pallas

        n, h, w, c = 2, 8, 8, 8
        f1 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        f2 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        # integer flows (fy = fx = 0) and a large shift pushing most of the
        # window off the map
        flow = np.round(
            rng.normal(size=(n, h, w, 2)).astype(np.float32) * 5)
        pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 2)
        want = np.asarray(corr_lookup(pyr, jnp.asarray(flow), radius=2))
        got = np.asarray(
            corr_lookup_pallas(pyr, jnp.asarray(flow), radius=2,
                               interpret=True, variant="shift"))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_flat_pyramid_matches_4d(self, rng):
        """correlation_pyramid_flat (lane-dense levels, matmul pooling)
        numerically matches the (B, S, S, 1) pyramid, and the Pallas lookup
        consumes the flat levels directly."""
        from scflow_tpu.ops.corr import correlation_pyramid_flat
        from scflow_tpu.ops.pallas.corr_lookup import corr_lookup_pallas

        n, h, w, c = 2, 8, 8, 16
        f1 = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        flow = jnp.asarray(rng.normal(size=(n, h, w, 2)).astype(np.float32) * 2)
        pyr4 = correlation_pyramid(f1, f2, 3)
        pyrf = correlation_pyramid_flat(f1, f2, 3)
        for a, b in zip(pyr4, pyrf):
            np.testing.assert_allclose(
                np.asarray(a).reshape(b.shape), np.asarray(b), atol=1e-4
            )
        want = np.asarray(
            corr_lookup_pallas(pyr4, flow, radius=2, interpret=True)
        )
        got = np.asarray(
            corr_lookup_pallas(pyrf, flow, radius=2, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_dispatch_xla_accepts_flat_pyramid(self, rng):
        """corr_lookup_dispatch is layout-agnostic: a flat (B, S*S) pyramid
        routed to the 'xla' branch is reshaped back to 4-D, matching the
        4-D pyramid result exactly."""
        from scflow_tpu.ops.corr import (
            correlation_pyramid_flat,
            corr_lookup_dispatch,
        )

        n, h, w, c = 2, 8, 8, 16
        f1 = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        flow = jnp.asarray(rng.normal(size=(n, h, w, 2)).astype(np.float32) * 2)
        pyr4 = correlation_pyramid(f1, f2, 3)
        pyrf = correlation_pyramid_flat(f1, f2, 3)
        want = np.asarray(corr_lookup_dispatch(pyr4, flow, 2, backend="xla"))
        got = np.asarray(corr_lookup_dispatch(pyrf, flow, 2, backend="xla"))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_dispatch_flat_nonsquare(self, rng):
        """NON-square flat levels must fold back via the flow geometry, not
        a sqrt guess (h=8, w=32 gives h*w=256 — a perfect square that a
        sqrt-based reshape would silently mis-fold to 16x16); the explicit
        'pallas' backend must also fall back to xla for them (the fused
        kernel's index math assumes square maps)."""
        from scflow_tpu.ops.corr import (
            correlation_pyramid_flat,
            corr_lookup_dispatch,
        )

        n, h, w, c = 2, 8, 32, 16
        f1 = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        flow = jnp.asarray(rng.normal(size=(n, h, w, 2)).astype(np.float32) * 2)
        pyr4 = correlation_pyramid(f1, f2, 3)
        pyrf = correlation_pyramid_flat(f1, f2, 3)
        want = np.asarray(corr_lookup_dispatch(pyr4, flow, 2, backend="xla"))
        got = np.asarray(corr_lookup_dispatch(pyrf, flow, 2, backend="xla"))
        np.testing.assert_allclose(got, want, atol=1e-4)
        got_p = np.asarray(corr_lookup_dispatch(pyrf, flow, 2, backend="pallas"))
        np.testing.assert_allclose(got_p, want, atol=1e-4)

    def test_pallas_lookup_gradients_match_xla(self, rng):
        """The custom VJP (XLA tent-formulation backward) matches autodiff
        of the XLA lookup for both the correlation maps and the flow."""
        from scflow_tpu.ops.pallas.corr_lookup import corr_lookup_pallas_diff

        n, h, w, c = 2, 8, 8, 16
        f1 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        f2 = rng.normal(size=(n, h, w, c)).astype(np.float32)
        flow = rng.normal(size=(n, h, w, 2)).astype(np.float32) * 2
        pyr = tuple(correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), 2))
        wgt = jnp.asarray(rng.normal(size=(n, h, w, 2 * 25)).astype(np.float32))

        def loss_xla(pyr, fl):
            return jnp.sum(corr_lookup(list(pyr), fl, 2) * wgt)

        def loss_pls(pyr, fl):
            return jnp.sum(
                corr_lookup_pallas_diff(pyr, fl, 2, 256, True) * wgt
            )

        gp_x, gf_x = jax.grad(loss_xla, argnums=(0, 1))(pyr, jnp.asarray(flow))
        gp_p, gf_p = jax.grad(loss_pls, argnums=(0, 1))(pyr, jnp.asarray(flow))
        for a, b in zip(gp_x, gp_p):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x),
                                   atol=1e-3, rtol=1e-4)


class TestConvexUpsample:
    def test_vs_torch_unfold(self, rng):
        """Oracle re-derives raft_decoder.py:381-416."""
        n, h, w, scale = 2, 4, 4, 8
        flow = rng.normal(size=(n, h, w, 2)).astype(np.float32)
        mask = rng.normal(size=(n, h, w, 9 * scale * scale)).astype(np.float32)

        tflow = to_torch_nchw(flow)
        tmask = to_torch_nchw(mask)
        m = tmask.view(n, 1, 9, scale, scale, h, w)
        m = torch.softmax(m, dim=2)
        up = F.unfold(scale * tflow, [3, 3], padding=1).view(n, 2, 9, 1, 1, h, w)
        up = torch.sum(m * up, dim=2).permute(0, 1, 4, 2, 5, 3)
        expect = up.reshape(n, 2, scale * h, scale * w).numpy().transpose(0, 2, 3, 1)

        got = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask), scale))
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestKnnWarp:
    def test_nn_points_vs_bruteforce(self, rng):
        q = rng.normal(size=(2, 50, 3)).astype(np.float32)
        r = rng.normal(size=(2, 70, 3)).astype(np.float32)
        idx, d2 = nn_points(jnp.asarray(q), jnp.asarray(r))
        d = ((q[:, :, None] - r[:, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))

    def test_nn_points_respects_validity(self, rng):
        q = rng.normal(size=(1, 10, 3)).astype(np.float32)
        r = rng.normal(size=(1, 20, 3)).astype(np.float32)
        valid = np.zeros((1, 20), bool)
        valid[:, :5] = True
        idx, _ = nn_points(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid))
        assert np.asarray(idx).max() < 5

    def test_backward_warp_identity(self, rng):
        feat = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        flow = np.zeros((1, 8, 8, 2), np.float32)
        out = np.asarray(backward_warp(jnp.asarray(feat), jnp.asarray(flow),
                                       align_corners=True))
        np.testing.assert_allclose(out, feat, atol=1e-5)
