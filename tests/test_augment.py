"""On-device render augmentations (models/augment.py) — value tests of each
transform against a host-numpy transcription of the torchvision/kornia
semantics, plus config round-trip and train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scflow_tpu.models.augment import (
    AUGMENTATIONS,
    _hsv_to_rgb,
    _rgb_to_hsv,
    build_render_augmentation,
    color_jiggle,
    random_gaussian_blur,
    random_gaussian_noise,
    random_grayscale,
)

W = np.array([0.299, 0.587, 0.114], np.float32)


@pytest.fixture()
def imgs():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((4, 16, 16, 3)).astype(np.float32))


class TestColorJiggle:
    def test_brightness_is_per_sample_multiplicative(self, imgs):
        fn = color_jiggle(brightness=0.4, p=1.0)
        out = np.asarray(fn(jax.random.PRNGKey(1), imgs))
        x = np.asarray(imgs)
        # recover each sample's factor from an unclipped pixel and check
        # the whole sample uses the same factor
        for i in range(x.shape[0]):
            sel = (x[i] > 0.1) & (out[i] < 0.999)
            f = out[i][sel] / x[i][sel]
            assert f.std() < 1e-5
            assert 0.6 - 1e-5 <= f.mean() <= 1.4 + 1e-5

    def test_contrast_blends_with_gray_mean(self, imgs):
        fn = color_jiggle(contrast=0.5, p=1.0)
        key = jax.random.PRNGKey(2)
        out = np.asarray(fn(key, imgs))
        x = np.asarray(imgs)
        # replicate: factor unknown, but out = f*x + (1-f)*mean must make
        # (out - mean) proportional to (x - mean) with one scalar per sample
        for i in range(x.shape[0]):
            mean = (x[i] @ W).mean()
            num = (out[i] - mean).ravel()
            den = (x[i] - mean).ravel()
            # exclude pixels the final [0,1] clip saturated
            unclipped = (out[i].ravel() > 1e-3) & (out[i].ravel() < 1 - 1e-3)
            sel = (np.abs(den) > 0.1) & unclipped
            f = num[sel] / den[sel]
            assert f.std() < 1e-4

    def test_saturation_zero_factor_is_grayscale_limit(self, imgs):
        # saturation=1.0 draws factors in [0, 2]; check the blend identity
        fn = color_jiggle(saturation=1.0, p=1.0)
        out = np.asarray(fn(jax.random.PRNGKey(3), imgs))
        x = np.asarray(imgs)
        for i in range(x.shape[0]):
            gray = np.repeat((x[i] @ W)[..., None], 3, axis=-1)
            den = (x[i] - gray).ravel()
            unclipped = (out[i].ravel() > 1e-3) & (out[i].ravel() < 1 - 1e-3)
            sel = (np.abs(den) > 0.1) & unclipped
            f = ((out[i] - gray).ravel()[sel]) / den[sel]
            assert f.std() < 2e-4

    def test_hue_roundtrip_and_shift(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
        h, s, v = _rgb_to_hsv(x)
        back = _hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                   atol=1e-5)
        # full-cycle shift is identity
        np.testing.assert_allclose(
            np.asarray(_hsv_to_rgb((h + 1.0) % 1.0, s, v)),
            np.asarray(x), atol=1e-5)

    def test_p_zero_is_identity(self, imgs):
        fn = color_jiggle(brightness=0.5, contrast=0.5, saturation=0.5,
                          hue=0.2, p=0.0)
        out = fn(jax.random.PRNGKey(0), imgs)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


class TestNoiseBlurGray:
    def test_noise_statistics(self, imgs):
        fn = random_gaussian_noise(mean=0.0, std=0.1, p=1.0)
        big = jnp.tile(imgs, (8, 1, 1, 1)) * 0.0 + 0.5
        out = np.asarray(fn(jax.random.PRNGKey(0), big)) - 0.5
        assert abs(out.mean()) < 0.005
        assert abs(out.std() - 0.1) < 0.01

    def test_blur_matches_numpy_reference(self):
        rng = np.random.default_rng(7)
        x = rng.random((1, 12, 12, 3)).astype(np.float32)
        fn = random_gaussian_blur(kernel_size=5, sigma=(1.3, 1.3), p=1.0)
        out = np.asarray(fn(jax.random.PRNGKey(0), jnp.asarray(x)))

        # host reference: separable gaussian, reflect padding
        off = np.arange(-2, 3)
        w = np.exp(-0.5 * (off / 1.3) ** 2)
        w /= w.sum()
        pad = np.pad(x, [(0, 0), (2, 2), (2, 2), (0, 0)], mode="reflect")
        rows = sum(w[i] * pad[:, i:i + 12] for i in range(5))
        want = sum(w[i] * rows[:, :, i:i + 12] for i in range(5))
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_blur_preserves_constant_image(self):
        x = jnp.full((2, 16, 16, 3), 0.25)
        fn = random_gaussian_blur(kernel_size=7, sigma=(0.5, 2.0), p=1.0)
        out = np.asarray(fn(jax.random.PRNGKey(3), x))
        np.testing.assert_allclose(out, 0.25, atol=1e-6)

    def test_grayscale_values(self, imgs):
        fn = random_grayscale(p=1.0)
        out = np.asarray(fn(jax.random.PRNGKey(0), imgs))
        want = np.repeat(np.asarray(imgs) @ W[:, None], 3, axis=-1)
        np.testing.assert_allclose(out, want, atol=1e-6)


class TestBuildAndIntegration:
    def test_registry_names_match_kornia(self):
        for name in ("ColorJiggle", "RandomGaussianNoise",
                     "RandomGaussianBlur", "RandomGrayscale"):
            assert name in AUGMENTATIONS

    def test_build_compose_and_determinism(self, imgs):
        fn = build_render_augmentation([
            dict(type="ColorJiggle", brightness=0.3, contrast=0.3, p=1.0),
            dict(type="RandomGaussianNoise", std=0.02, p=0.5),
        ])
        a = np.asarray(fn(jax.random.PRNGKey(9), imgs))
        b = np.asarray(fn(jax.random.PRNGKey(9), imgs))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(fn(jax.random.PRNGKey(10), imgs))
        assert np.abs(a - c).max() > 1e-4
        assert build_render_augmentation(None) is None
        assert build_render_augmentation([]) is None

    def test_train_step_with_augmentations_runs_and_is_jittable(self):
        from scflow_tpu.refiners import SCFlowRefiner
        from scflow_tpu.refiners.system import (
            LossAssets, RenderAssets, make_scflow_train_step)
        from scflow_tpu.render.meshbank import make_synthetic_bank
        import optax

        from scflow_tpu.runtime.train_state import TrainState

        nclass, img, batch = 2, 64, 2
        bank = make_synthetic_bank(nclass, kind="cube", size=60.0)
        ra = RenderAssets.from_bank(bank)
        la = LossAssets(
            points=jnp.asarray(bank.verts), valid=jnp.asarray(bank.vert_valid),
            sym=jnp.zeros((nclass,), bool), diameters=jnp.full((nclass,), 100.0),
        )
        model = SCFlowRefiner(
            iters=1,
            pose_head_cfg=dict(type="MultiClassPoseHead", num_class=nclass,
                               in_channels=224, feat_size=(img // 8, img // 8)),
        )
        rng = np.random.default_rng(0)
        real = jnp.asarray(rng.random((batch, img, img, 3)).astype(np.float32))
        R = jnp.tile(jnp.eye(3)[None], (batch, 1, 1))
        t = jnp.tile(jnp.asarray([[0.0, 0.0, 400.0]]), (batch, 1))
        K = jnp.tile(jnp.asarray(
            [[[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]]]), (batch, 1, 1))
        labels = jnp.zeros((batch,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), real, real, R, t,
                               jnp.zeros((batch, img, img)), K, labels)
        state = TrainState.create(variables["params"], optax.adamw(1e-4),
                                  variables.get("batch_stats"))
        step = make_scflow_train_step(
            model, ra, la, image_size=(img, img),
            render_augmentations=[
                dict(type="ColorJiggle", brightness=0.2, contrast=0.2,
                     p=1.0),
                dict(type="RandomGrayscale", p=0.2),
            ],
        )
        batch_d = dict(real_images=real, ref_rotations=R, ref_translations=t,
                       gt_rotations=R, gt_translations=t, labels=labels, k=K,
                       gt_masks=jnp.ones((batch, img, img)))
        state2, logs = step(state, batch_d)
        assert np.isfinite(float(logs["loss"]))
        assert int(state2.step) == 1
