#!/usr/bin/env python
"""Micro-bench every conv in the flagship s2d U-Net stack (isolated K-loop
per conv; composition effects excluded — cross-check with
profile_pipeline.py). Shapes for start_neurons=32, pools=4, s2d_levels=2,
512x1024 batch 8.

Usage: python tools/profile_convs.py [f32|bf16]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 8
K = 100

# (name, (H, W, Cin), (kh, kw, Cin, Cout), out_hw_pad_or_None)
# out shape odd => shifted-alignment conv (output H+1, W+1 via padding)
CONVS = [
    ("encL0c0 U-S", (256, 512, 16), (2, 2, 16, 128), (257, 513)),
    ("encL0c1 S-U", (257, 513, 128), (2, 2, 128, 128), (256, 512)),
    ("encL1c0 U-S", (128, 256, 128), (2, 2, 128, 256), (129, 257)),
    ("encL1c1 S-U", (129, 257, 256), (2, 2, 256, 256), (128, 256)),
    ("encL2c0 3x3", (128, 256, 64), (3, 3, 64, 128), None),
    ("encL2c1 3x3", (128, 256, 128), (3, 3, 128, 128), None),
    ("encL3c0 3x3", (64, 128, 128), (3, 3, 128, 256), None),
    ("encL3c1 3x3", (64, 128, 256), (3, 3, 256, 256), None),
    ("botc0 3x3", (32, 64, 256), (3, 3, 256, 512), None),
    ("botc1 3x3", (32, 64, 512), (3, 3, 512, 512), None),
    ("dec3up 2x2", (64, 128, 512), (2, 2, 512, 256), None),
    ("dec3c0 3x3", (64, 128, 512), (3, 3, 512, 256), None),
    ("dec3c1 3x3", (64, 128, 256), (3, 3, 256, 256), None),
    ("dec2up 2x2", (128, 256, 256), (2, 2, 256, 128), None),
    ("dec2c0 3x3", (128, 256, 256), (3, 3, 256, 128), None),
    ("dec2c1 3x3", (128, 256, 128), (3, 3, 128, 128), None),
    ("dec1up psum", (128, 256, 128), (2, 2, 128, 256), None),
    ("dec1c0 U-S", (128, 256, 512), (2, 2, 512, 256), (129, 257)),
    ("dec1c1 S-U", (129, 257, 256), (2, 2, 256, 256), (128, 256)),
    ("dec0up psum", (256, 512, 64), (2, 2, 64, 128), None),
    ("dec0c0 U-S", (256, 512, 256), (2, 2, 256, 128), (257, 513)),
    ("dec0c1 S-U", (257, 513, 128), (2, 2, 128, 128), (256, 512)),
    ("head 1x1", (256, 512, 128), (1, 1, 128, 16), None),
]


def pad_for(in_hw, out_hw, k):
    """SAME-like padding producing out_hw from in_hw with kernel k."""
    ph = out_hw[0] - in_hw[0] + k[0] - 1
    pw = out_hw[1] - in_hw[1] + k[1] - 1
    return ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))


def bench(name, in_shape, kshape, out_hw, dtype):
    h, w, cin = in_shape
    kh, kw, _, cout = kshape
    pad = "SAME" if out_hw is None else pad_for((h, w), out_hw, (kh, kw))

    @jax.jit
    def loop(x, wt):
        def body(c, _):
            # fold the carry into the (tiny) weights so iterations can't
            # be CSE'd without an extra full-activation memory pass
            y = jax.lax.conv_general_dilated(
                x, wt + c, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jnp.maximum(y, 0)
            return c + 1, y.mean(dtype=jnp.float32)

        return jax.lax.scan(body, jnp.asarray(0, dtype), None, length=K)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, h, w, cin)), dtype)
    wt = jnp.asarray(rng.normal(size=kshape) * 0.01, dtype)
    out = loop(x, wt)
    np.asarray(out[0])  # block_until_ready is a no-op over the tunnel
    t0 = time.perf_counter()
    out = loop(x, wt)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / K
    oh, ow = out_hw if out_hw else (h, w)
    gflop = 2 * B * oh * ow * kh * kw * cin * cout / 1e9
    print(
        f"{name:14s} {dt * 1e3:7.3f} ms  {gflop:7.1f} GF  "
        f"{gflop / dt / 1e3:6.1f} TF/s"
    )
    return dt, gflop


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    only = [a for a in sys.argv[1:] if a not in ("bf16", "f32")]
    tot_t = tot_f = 0.0
    for name, in_shape, kshape, out_hw in CONVS:
        if only and not any(o in name for o in only):
            continue
        dt, gf = bench(name, in_shape, kshape, out_hw, dtype)
        tot_t += dt
        tot_f += gf
    print(f"{'TOTAL':14s} {tot_t * 1e3:7.3f} ms  {tot_f:7.1f} GF  "
          f"{tot_f / tot_t / 1e3:6.1f} TF/s")


if __name__ == "__main__":
    main()
