#!/usr/bin/env python
"""Probe: does an s8 x s8 -> s32 conv hit the v5e MXU int8 path (2x bf16
peak)? Times one flagship-shaped conv in f32, bf16, and int8 with the
K-in-one-jit methodology (lax.scan, data-dependent carry)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 30


def time_conv(x, w, dims, prec=None, acc=None):
    @jax.jit
    def loop(x, w):
        def body(carry, _):
            xi = x + carry.astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                xi,
                w,
                (1, 1),
                "SAME",
                dimension_numbers=dims,
                precision=prec,
                preferred_element_type=acc,
            )
            return (carry + 1) % 2, y.sum(dtype=jnp.float32)

        carry, s = jax.lax.scan(body, jnp.int32(0), None, length=K)
        return carry, s

    out = loop(x, w)
    np.asarray(out[0])
    t0 = time.perf_counter()
    out = loop(x, w)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / K
    return dt


def main():
    rng = np.random.default_rng(0)
    dims = ("NHWC", "HWIO", "NHWC")
    # s2d L1-ish shape: (8, 256, 512, 128) x (3,3,128,128)
    for n, h, w_, cin, cout, kh, kw in [
        (8, 256, 512, 128, 128, 3, 3),
        (8, 128, 256, 128, 128, 3, 3),
    ]:
        x_f = rng.standard_normal((n, h, w_, cin), np.float32)
        w_f = (rng.standard_normal((kh, kw, cin, cout), np.float32) * 0.1)
        x8 = rng.integers(-127, 128, (n, h, w_, cin), np.int8)
        w8 = rng.integers(-127, 128, (kh, kw, cin, cout), np.int8)
        flops = 2 * n * h * w_ * cin * cout * kh * kw

        t32 = time_conv(jnp.asarray(x_f), jnp.asarray(w_f), dims)
        tb = time_conv(
            jnp.asarray(x_f, jnp.bfloat16), jnp.asarray(w_f, jnp.bfloat16),
            dims,
        )
        try:
            t8 = time_conv(
                jnp.asarray(x8), jnp.asarray(w8), dims, acc=jnp.int32
            )
        except Exception as e:  # pragma: no cover
            t8 = None
            print(f"int8 conv failed: {type(e).__name__}: {e}")
        print(
            f"({n},{h},{w_},{cin})x({kh}{kw}{cin}{cout}): "
            f"f32 {t32 * 1e3:6.2f} ms ({flops / t32 / 1e12:5.1f} TF/s)  "
            f"bf16 {tb * 1e3:6.2f} ms ({flops / tb / 1e12:5.1f} TF/s)  "
            + (
                f"int8 {t8 * 1e3:6.2f} ms ({flops / t8 / 1e12:5.1f} TOP/s)"
                if t8
                else "int8 n/a"
            )
        )


if __name__ == "__main__":
    main()
