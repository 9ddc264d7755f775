#!/usr/bin/env python
"""Micro-benchmark: the ResNet tail's small-spatial 3x3 convs — XLA conv vs
explicit im2col GEMM.

The b16 step trace (docs/DESIGN.md round-2b) attributed the remaining MFU
gap to the trunk's tail: 3x3 convs over 6x6 and 3x3 feature maps underfill
the 128x128 MXU when lowered as spatial convolutions.  Hypothesis: with the
time-folded batch (2B*T = 7,680 frames at b32) the same math as ONE im2col
GEMM — rows = N*H*W, K = 9*C_in — tiles the MXU fully and wins.

Measures fwd and fwd+bwd (input+weight grads, the training cost) for each
tail shape, both lowerings, bf16, chained-iteration timing (data dependence
+ final readback — see DESIGN.md section 7: block_until_ready is not a
barrier on the tunneled backend).  Writes benchmarks/conv_tail_micro.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 7680  # 2 speakers x batch 32 x 120 frames
# (H, W, C_in, C_out, stride) — the trunk's stage-3/4 shapes (visual.py):
# stage3: 12->6 transition + 6x6 body; stage4: 6->3 transition + 3x3 body.
SHAPES = (
    (12, 12, 128, 256, 2),
    (6, 6, 256, 256, 1),
    (6, 6, 256, 512, 2),
    (3, 3, 512, 512, 1),
)
WARMUP = 3
STEPS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    def conv_xla(x, w, stride):
        return lax.conv_general_dilated(
            x, w, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_im2col(x, w, stride):
        # Same math as conv_xla: zero-pad by 1, gather the 9 taps as
        # channel groups, one GEMM against the [9*Cin, Cout] kernel.
        n, h, wd, c = x.shape
        kh, kw, _, cout = w.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        oh = (h + 2 - kh) // stride + 1
        ow = (wd + 2 - kw) // stride + 1
        cols = [
            lax.slice(xp, (0, di, dj, 0),
                      (n, di + (oh - 1) * stride + 1, dj + (ow - 1) * stride + 1, c),
                      (1, stride, stride, 1))
            for di in range(kh) for dj in range(kw)
        ]
        patches = jnp.concatenate(cols, axis=-1)          # [N, oh, ow, 9C]
        flat = patches.reshape(n * oh * ow, kh * kw * c)
        out = flat @ w.reshape(kh * kw * c, cout)
        return out.reshape(n, oh, ow, cout)

    def time_fn(fn, *args):
        """Chained timing: each iteration consumes the previous output."""
        jitted = jax.jit(fn)
        x = args[0]
        out = x
        for _ in range(WARMUP):
            out = jitted(out, *args[1:])
        float(jnp.sum(out[..., 0, 0, 0] if out.ndim > 1 else out))
        out = x
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = jitted(out, *args[1:])
        float(jnp.sum(out[..., 0, 0, 0] if out.ndim > 1 else out))
        return (time.perf_counter() - t0) / STEPS

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0]), "n_frames": N, "results": {}}
    for (h, w_, cin, cout, stride) in SHAPES:
        x = jnp.asarray(rng.standard_normal((N, h, w_, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        row = {}
        for name, conv in (("xla_conv", conv_xla), ("im2col_gemm", conv_im2col)):
            # Forward: chain via a residual-style feedback so shapes match.
            if stride == 1 and cin == cout:
                fwd = lambda x, k: conv(x, k, stride)
            else:
                # Shape-changing convs: chain through a scalar tail instead.
                def fwd(x, k, _conv=conv):
                    y = _conv(x, k, stride)
                    return x + jnp.mean(y).astype(x.dtype)

            # Training cost: grads wrt input and weights, chained on input.
            def train(x, k, _conv=conv):
                def loss(xi, ki):
                    return jnp.sum(_conv(xi, ki, stride).astype(jnp.float32) ** 2)
                gx, gk = jax.grad(loss, argnums=(0, 1))(x, k)
                return x + 1e-6 * gx + jnp.sum(gk).astype(x.dtype) * 0

            row[name] = {
                "fwd_ms": round(time_fn(fwd, x, k) * 1e3, 3),
                "train_ms": round(time_fn(train, x, k) * 1e3, 3),
            }
        row["train_speedup_im2col"] = round(
            row["xla_conv"]["train_ms"] / row["im2col_gemm"]["train_ms"], 3)
        key = f"{h}x{w_}x{cin}->{cout}s{stride}"
        out["results"][key] = row
        print(key, json.dumps(row), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conv_tail_micro.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
