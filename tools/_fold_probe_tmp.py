"""Probe: channel-folded grouped-conv encoder vs doubled-batch encoder.

Folding the (render, real) pair into channels (C=128 tensors, groups=2
convs with tiled weights) removes the 64->128 lane padding that makes the
IN-normed feature encoder bandwidth-bound.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

def sync(x):
    return float(jnp.sum(x))

def bench(f, *args, n=20):
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3

rng = np.random.default_rng(0)
N, H, W = 16, 256, 256
x2 = jnp.asarray(rng.normal(size=(2 * N, H, W, 3)).astype(np.float32))   # doubled batch
xf = jnp.asarray(np.concatenate([np.asarray(x2[:N]), np.asarray(x2[N:])], axis=-1))  # (N,H,W,6)

def conv(x, w, b, stride=1, groups=1):
    out = lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + b

def instnorm(x):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + 1e-5)

def make_weights(cin, cout, k):
    w = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.05
    b = rng.normal(size=(cout,)).astype(np.float32) * 0.05
    return jnp.asarray(w), jnp.asarray(b)

# stem + layer1 (2 basic blocks, 64ch @128^2) -- the bandwidth-bound portion
stem_w, stem_b = make_weights(3, 64, 7)
ws = [make_weights(64, 64, 3) for _ in range(4)]

def encoder_batch(x):
    y = jax.nn.relu(instnorm(conv(x, stem_w, stem_b, 2)))
    for i in range(2):
        idn = y
        y = jax.nn.relu(instnorm(conv(y, *ws[2 * i])))
        y = instnorm(conv(y, *ws[2 * i + 1]))
        y = jax.nn.relu(y + idn)
    return y

stem_wf = jnp.concatenate([stem_w, stem_w], axis=-1)  # (7,7,3,128) groups=2
stem_bf = jnp.concatenate([stem_b, stem_b])
wsf = [(jnp.concatenate([w, w], -1), jnp.concatenate([b, b])) for w, b in ws]

def encoder_folded(x):
    y = jax.nn.relu(instnorm(conv(x, stem_wf, stem_bf, 2, groups=2)))
    for i in range(2):
        idn = y
        y = jax.nn.relu(instnorm(conv(y, *wsf[2 * i], groups=2)))
        y = instnorm(conv(y, *wsf[2 * i + 1], groups=2))
        y = jax.nn.relu(y + idn)
    return y

fb = jax.jit(encoder_batch)
ff = jax.jit(encoder_folded)
ob = fb(x2)
of = ff(xf)
# parity: folded group 0 == batch first half
d = float(jnp.max(jnp.abs(of[..., :64] - ob[:N])) )
print("parity max abs diff:", d)
print(f"doubled batch (2N={2*N}, C=64):  {bench(fb, x2):7.2f} ms")
print(f"channel-folded (N={N}, C=128):   {bench(ff, xf):7.2f} ms")

# also: norm-free lower bound for both
def encoder_batch_nonorm(x):
    y = jax.nn.relu(conv(x, stem_w, stem_b, 2))
    for i in range(2):
        idn = y
        y = jax.nn.relu(conv(y, *ws[2 * i]))
        y = conv(y, *ws[2 * i + 1])
        y = jax.nn.relu(y + idn)
    return y
def encoder_folded_nonorm(x):
    y = jax.nn.relu(conv(x, stem_wf, stem_bf, 2, groups=2))
    for i in range(2):
        idn = y
        y = jax.nn.relu(conv(y, *wsf[2 * i], groups=2))
        y = conv(y, *wsf[2 * i + 1], groups=2)
        y = jax.nn.relu(y + idn)
    return y
print(f"doubled no-norm:                 {bench(jax.jit(encoder_batch_nonorm), x2):7.2f} ms")
print(f"folded  no-norm:                 {bench(jax.jit(encoder_folded_nonorm), xf):7.2f} ms")
