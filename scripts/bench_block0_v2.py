"""Block0 redesign experiments: conv1a as a 16-tap im2col matmul emitting P1.

NOTES.md round-2 attribution (b8, 480x640, bf16): conv1a(s2d)+relu 2.05 ms,
+conv1b 3.84, full block0 5.33. conv1a's (B,240,320,4) C=4 minor-dim input is
the pathology (~0.3 TF/s). Candidate fix: materialize the 4x4 input patch of
every P1 cell (16 channels) and run ONE (BHpWp,16)@(16,256) matmul producing
conv1a's P1 output directly — K=16 lane-pads 8x on the input read (~158 MB)
but the output layout (256 ch) is clean and the op is a plain MXU matmul.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models.extractors.superpoint_open import (
    _space_to_depth,
    _s2d_kernel,
    _mask_p1,
    s2d_conv,
)

B, H, W = 8, 480, 640
DT = jnp.bfloat16


def timed(fn, *args, iters=20, warmup=2, label=""):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {ms:7.3f} ms", flush=True)
    return ms


def im2col16_tap_matrix() -> np.ndarray:
    """(16, 3,3) one-hot: W16[p*4+q, (d*2+e)*C+c] = K[p-d, q-e, 0, c].

    P1 cell (Y,X) output pixel (d,e) = original (2Y-1+d, 2X-1+e); its 3x3 tap
    (ky,kx) reads patch row p = d+ky, col q = e+kx of the 4x4 input patch
    rows 2Y-2..2Y+1 / cols 2X-2..2X+1."""
    T = np.zeros((16, 2, 2, 3, 3), np.float32)  # (pq, d, e, ky, kx)
    for p in range(4):
        for q in range(4):
            for d in range(2):
                for e in range(2):
                    ky, kx = p - d, q - e
                    if 0 <= ky <= 2 and 0 <= kx <= 2:
                        T[p * 4 + q, d, e, ky, kx] = 1.0
    return T


_T16 = im2col16_tap_matrix()


def conv1a_w16(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,1,C) -> (16, 4C) in (d,e,c) output group order."""
    c = kernel.shape[-1]
    w = jnp.einsum("kdeyx,yxoc->kdec", jnp.asarray(_T16, kernel.dtype), kernel)
    return w.reshape(16, 4 * c)


def patches16(img: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,1) -> (B,H/2+1,W/2+1,16) 4x4 patches anchored at (2Y-2, 2X-2)."""
    b, h, w, _ = img.shape
    ip = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)))
    e = _space_to_depth(ip)  # (B, h/2+2, w/2+2, 4)
    hp, wp = h // 2 + 1, w // 2 + 1
    return jnp.concatenate(
        [
            e[:, :hp, :wp],
            e[:, :hp, 1:],
            e[:, 1:, :wp],
            e[:, 1:, 1:],
        ],
        axis=-1,
    )  # groups (row-pair, col-pair): (p01,q01),(p01,q23),(p23,q01),(p23,q23)


def patch_perm() -> np.ndarray:
    """patches16 concat order -> (p*4+q) order permutation."""
    # concat group g in {0..3} = (rowhalf, colhalf); within: s2d (dy,dx)
    perm = np.zeros(16, np.int64)
    for g in range(4):
        rh, ch = g // 2, g % 2
        for dy in range(2):
            for dx in range(2):
                p, q = rh * 2 + dy, ch * 2 + dx
                perm[g * 4 + dy * 2 + dx] = p * 4 + q
    return perm


_PERM = patch_perm()


def conv1a_im2col(img, kernel, bias, dt=DT):
    w16 = conv1a_w16(kernel)[_PERM].astype(dt)
    p = patches16(img).astype(dt)
    y = jnp.einsum("bhwk,kn->bhwn", p, w16)
    return y + jnp.tile(bias, 4).astype(dt)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 1), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 1, 64) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    # ---- numerics check (fp32, vs s2d path)
    def ref_conv1a(img):
        x = _space_to_depth(img)
        return s2d_conv(x, k1, b1, "p0_to_p1", dtype=jnp.float32)

    y_ref = jax.jit(ref_conv1a)(img)
    y_new = jax.jit(lambda i: conv1a_im2col(i, k1, b1, jnp.float32))(img)
    # compare only interior (boundary slots are garbage in both, masked later)
    m = _mask_p1(jnp.ones_like(y_ref))
    err = float(jnp.abs((y_ref - y_new) * m).max())
    print(f"conv1a im2col vs s2d max abs err (masked): {err:.2e}", flush=True)
    assert err < 1e-4, err

    # ---- timings
    def cur_conv1a(i):
        x = _space_to_depth(i)
        y = jax.nn.relu(s2d_conv(x, k1, b1, "p0_to_p1", dtype=DT))
        return y.astype(jnp.float32).sum()

    def new_conv1a(i):
        y = jax.nn.relu(conv1a_im2col(i, k1, b1))
        return y.astype(jnp.float32).sum()

    def cur_block0(i):
        x = _space_to_depth(i)
        y = jax.nn.relu(s2d_conv(x, k1, b1, "p0_to_p1", dtype=DT))
        z = jax.nn.relu(s2d_conv(y, k2, b2, "p1_to_p0", dtype=DT))
        bb, hh, ww, _ = z.shape
        pooled = z.reshape(bb, hh, ww, 2, 2, 64).max(axis=(3, 4))
        return pooled.astype(jnp.float32).sum()

    def new_block0(i):
        y = jax.nn.relu(conv1a_im2col(i, k1, b1))
        z = jax.nn.relu(s2d_conv(y, k2, b2, "p1_to_p0", dtype=DT))
        bb, hh, ww, _ = z.shape
        pooled = z.reshape(bb, hh, ww, 2, 2, 64).max(axis=(3, 4))
        return pooled.astype(jnp.float32).sum()

    timed(cur_conv1a, img, label="conv1a s2d (current) + relu")
    timed(new_conv1a, img, label="conv1a im2col16 + relu")
    timed(cur_block0, img, label="block0 current (conv1a+conv1b+pool)")
    timed(new_block0, img, label="block0 new    (im2col+conv1b+pool)")

    # ---- is the standalone BN affine pass free (fused) or a full HBM pass?
    mul = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    add = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    def block0_bn(i):
        y = jax.nn.relu(conv1a_im2col(i, k1, b1))
        y = y * jnp.tile(mul, 4).astype(DT) + jnp.tile(add, 4).astype(DT)
        z = jax.nn.relu(s2d_conv(y, k2, b2, "p1_to_p0", dtype=DT))
        z = z * jnp.tile(mul, 4).astype(DT) + jnp.tile(add, 4).astype(DT)
        bb, hh, ww, _ = z.shape
        pooled = z.reshape(bb, hh, ww, 2, 2, 64).max(axis=(3, 4))
        return pooled.astype(jnp.float32).sum()

    timed(block0_bn, img, label="block0 new + 2 BN affine passes")


if __name__ == "__main__":
    main()


def variants():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 1), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 1, 64) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    # conv1a as a native 4x4 stride-2 conv on the (2,2)-padded image
    def w44(kernel, dt):
        # (16, 4C) in (p*4+q, (d,e,c)) order -> (4,4,1,4C)
        w16 = conv1a_w16(kernel)
        return w16.reshape(4, 4, 1, 4 * 64).astype(dt)

    def conv44(i, dt=DT):
        ip = jnp.pad(i, ((0, 0), (2, 2), (2, 2), (0, 0))).astype(dt)
        y = jax.lax.conv_general_dilated(
            ip, w44(k1, dt), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jnp.tile(b1, 4).astype(dt)

    # numerics
    y_ref = jax.jit(lambda i: conv1a_im2col(i, k1, b1, jnp.float32))(img)
    y_new = jax.jit(lambda i: conv44(i, jnp.float32))(img)
    print(f"conv44 vs im2col err: {float(jnp.abs(y_ref - y_new).max()):.2e}", flush=True)

    def t_conv44(i):
        return jax.nn.relu(conv44(i)).astype(jnp.float32).sum()

    # plain full-res 3x3 conv 1->64 (what does XLA do with C_in=1?)
    def t_plain(i):
        y = jax.lax.conv_general_dilated(
            i.astype(DT), k1.astype(DT), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + b1.astype(DT)).astype(jnp.float32).sum()

    # pre-materialized patches, matmul only (isolate patch cost)
    p16 = jax.jit(lambda i: patches16(i).astype(DT))(img)
    p16 = jax.device_put(p16)
    w16d = jax.jit(lambda k: conv1a_w16(k)[_PERM].astype(DT))(k1)

    def t_mm(p, w):
        y = jax.nn.relu(jnp.einsum("bhwk,kn->bhwn", p, w) + jnp.tile(b1, 4).astype(DT))
        return y.astype(jnp.float32).sum()

    def t_patches(i):
        return patches16(i).astype(DT).astype(jnp.float32).sum()

    iters = 40
    timed(t_conv44, img, iters=iters, label="conv1a 4x4s2 native conv + relu")
    timed(t_plain, img, iters=iters, label="conv1a plain 3x3 fullres (C=1) + relu")
    timed(t_mm, p16, w16d, iters=iters, label="matmul-only on pre-built patches")
    timed(t_patches, img, iters=iters, label="patches16 build only")

    def blk(conv1a_fn):
        def f(i):
            y = jax.nn.relu(conv1a_fn(i))
            z = jax.nn.relu(s2d_conv(y, k2, b2, "p1_to_p0", dtype=DT))
            bb, hh, ww, _ = z.shape
            pooled = z.reshape(bb, hh, ww, 2, 2, 64).max(axis=(3, 4))
            return pooled.astype(jnp.float32).sum()
        return f

    timed(blk(lambda i: conv44(i)), img, iters=iters, label="block0 conv44 variant")
    timed(blk(lambda i: s2d_conv(_space_to_depth(i), k1, b1, "p0_to_p1", dtype=DT)), img, iters=iters, label="block0 current (40 iters)")

    # dispatch overhead floor
    def noop(i):
        return (i[0, 0, 0, 0] + 1.0)
    timed(noop, img, iters=iters, label="jitted near-noop")


if __name__ == "__main__":
    main() if len(sys.argv) < 2 else variants()


def variants2():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 1), jnp.float32)
    k1 = jnp.asarray(rng.randn(3, 3, 1, 64) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    def conv1a_barrier(i, dt=DT):
        w16 = conv1a_w16(k1)[_PERM].astype(dt)
        p = patches16(i).astype(dt)
        p = jax.lax.optimization_barrier(p)
        y = jnp.einsum("bhwk,kn->bhwn", p, w16)
        return y + jnp.tile(b1, 4).astype(dt)

    def cur_conv1a(i):
        x = _space_to_depth(i)
        y = jax.nn.relu(s2d_conv(x, k1, b1, "p0_to_p1", dtype=DT))
        return y.astype(jnp.float32).sum()

    def bar_conv1a(i):
        return jax.nn.relu(conv1a_barrier(i)).astype(jnp.float32).sum()

    def blk(conv1a_fn):
        def f(i):
            y = jax.nn.relu(conv1a_fn(i))
            z = jax.nn.relu(s2d_conv(y, k2, b2, "p1_to_p0", dtype=DT))
            bb, hh, ww, _ = z.shape
            pooled = z.reshape(bb, hh, ww, 2, 2, 64).max(axis=(3, 4))
            return pooled.astype(jnp.float32).sum()
        return f

    b_cur = blk(lambda i: s2d_conv(_space_to_depth(i), k1, b1, "p0_to_p1", dtype=DT))
    b_bar = blk(conv1a_barrier)

    for rep in range(3):
        timed(cur_conv1a, img, iters=40, label=f"[{rep}] conv1a s2d current")
        timed(bar_conv1a, img, iters=40, label=f"[{rep}] conv1a im2col+BARRIER")
        timed(b_cur, img, iters=40, label=f"[{rep}] block0 current")
        timed(b_bar, img, iters=40, label=f"[{rep}] block0 im2col+BARRIER")


if len(sys.argv) > 1 and sys.argv[1] == "v2":
    variants2()
