"""On-device render augmentations — jittable photometric transforms applied
to the rendered images INSIDE the train step, between rendering and
normalization.

Reference surface: `BaseRefiner(render_augmentations=[...])` builds a kornia
`AugmentationSequential(..., same_on_batch=False)` and applies it to the
rendered batch in `format_data_train_sup` (base_refiner.py:52-62, :159-160).
Note the reference's own path is BROKEN in the release — it calls an
undefined `build_augmentation` (NameError on first use; grep-verified absent
from the repo) and no shipped config sets the key.  This rebuild implements
the intended behavior: the same config key, per-sample random parameters,
applied pre-normalization on [0, 1] RGB images.

TPU-first: each augmentation is a pure function (key, images (N,H,W,3)) ->
images traced into the train step jit; randomness is folded from the train
step counter so runs are deterministic and resume-exact.  Semantics follow
the torchvision/kornia conventions and are unit-tested against a host-numpy
transcription (tests/test_augment.py).
"""

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from scflow_tpu.registry import Registry

AUGMENTATIONS = Registry("augmentations")

_RGB_WEIGHTS = (0.299, 0.587, 0.114)  # ITU-R BT.601, torchvision grayscale


def _per_sample(key, n, lo, hi):
    return jax.random.uniform(key, (n, 1, 1, 1), minval=lo, maxval=hi)


def _blend(img, other, factor):
    return factor * img + (1.0 - factor) * other


def _grayscale(img):
    w = jnp.asarray(_RGB_WEIGHTS, img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    rng = maxc - minc
    s = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.where(rng > 0, rng, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _apply_p(key, p, img, aug_img):
    """Per-sample keep/apply gate (kornia same_on_batch=False)."""
    n = img.shape[0]
    gate = jax.random.uniform(key, (n, 1, 1, 1)) < p
    return jnp.where(gate, aug_img, img)


@AUGMENTATIONS.register_module("ColorJiggle")
def color_jiggle(brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0, p: float = 1.0):
    """kornia ColorJiggle / torchvision ColorJitter: per-sample
    multiplicative brightness/contrast/saturation factors in
    [max(0, 1-a), 1+a] and an additive hue shift in [-hue, hue] (fraction
    of the hue cycle, |hue| <= 0.5)."""
    assert 0.0 <= hue <= 0.5, "hue is a cycle fraction in [0, 0.5]"

    def fn(key, img):
        n = img.shape[0]
        kb, kc, ks, kh, kp = jax.random.split(key, 5)
        out = img
        if brightness:
            f = _per_sample(kb, n, max(0.0, 1 - brightness), 1 + brightness)
            out = out * f
        if contrast:
            f = _per_sample(kc, n, max(0.0, 1 - contrast), 1 + contrast)
            mean = jnp.mean(_grayscale(out), axis=(1, 2, 3), keepdims=True)
            out = _blend(out, mean, f)
        if saturation:
            f = _per_sample(ks, n, max(0.0, 1 - saturation), 1 + saturation)
            out = _blend(out, _grayscale(out), f)
        if hue:
            shift = jax.random.uniform(kh, (n, 1, 1), minval=-hue,
                                       maxval=hue)
            h, s, v = _rgb_to_hsv(jnp.clip(out, 0.0, 1.0))
            out = _hsv_to_rgb((h + shift) % 1.0, s, v)
        out = jnp.clip(out, 0.0, 1.0)
        return _apply_p(kp, p, img, out)

    return fn


@AUGMENTATIONS.register_module("RandomGaussianNoise")
def random_gaussian_noise(mean: float = 0.0, std: float = 0.05,
                          p: float = 0.5):
    def fn(key, img):
        kn, kp = jax.random.split(key)
        noise = mean + std * jax.random.normal(kn, img.shape, img.dtype)
        return _apply_p(kp, p, img, jnp.clip(img + noise, 0.0, 1.0))

    return fn


@AUGMENTATIONS.register_module("RandomGaussianBlur")
def random_gaussian_blur(kernel_size: int = 5,
                         sigma: Tuple[float, float] = (0.1, 2.0),
                         p: float = 0.5):
    """Separable Gaussian blur with a per-sample sigma drawn from `sigma`;
    reflect padding (kornia default border_type='reflect')."""
    assert kernel_size % 2 == 1
    half = kernel_size // 2
    offsets = jnp.arange(-half, half + 1, dtype=jnp.float32)

    def fn(key, img):
        ks, kp = jax.random.split(key)
        n = img.shape[0]
        sig = jax.random.uniform(ks, (n, 1), minval=sigma[0],
                                 maxval=sigma[1])
        w = jnp.exp(-0.5 * (offsets[None, :] / sig) ** 2)
        w = w / jnp.sum(w, axis=-1, keepdims=True)  # (N, K)
        pad = [(0, 0), (half, half), (half, half), (0, 0)]
        padded = jnp.pad(img, pad, mode="reflect")
        # separable: gather K shifted slices, weight, and sum (no conv —
        # the per-sample kernel makes lax.conv batching awkward)
        h, wd = img.shape[1:3]
        rows = sum(
            w[:, i, None, None, None]
            * jax.lax.dynamic_slice_in_dim(padded, i, h, axis=1)
            for i in range(kernel_size)
        )
        out = sum(
            w[:, i, None, None, None]
            * jax.lax.dynamic_slice_in_dim(rows, i, wd, axis=2)
            for i in range(kernel_size)
        )
        out = out[:, :, half:half + wd] if out.shape[2] != wd else out
        return _apply_p(kp, p, img, out)

    return fn


@AUGMENTATIONS.register_module("RandomGrayscale")
def random_grayscale(p: float = 0.1):
    def fn(key, img):
        gray = jnp.broadcast_to(_grayscale(img), img.shape)
        return _apply_p(key, p, img, gray)

    return fn


def build_render_augmentation(
    cfgs: Optional[Sequence[dict]],
) -> Optional[Callable]:
    """Compose the configured augmentations into one (key, images) ->
    images function (reference AugmentationSequential, same_on_batch=False,
    base_refiner.py:52-62)."""
    if not cfgs:
        return None
    fns = []
    for cfg in cfgs:
        cfg = dict(cfg)
        fns.append(AUGMENTATIONS.get(cfg.pop("type"))(**cfg))

    def apply(key, images):
        for i, fn in enumerate(fns):
            images = fn(jax.random.fold_in(key, i), images)
        return images

    return apply
