"""Calibrate int8 vs bf16 matmul throughput through this stack (one jitted
scan per dtype, chained data dependence, scalar readback).

Usage: PYTHONPATH=/root/repo python benchmarks/exp_int8_matmul.py [M] [K] [N] [REPS]

v5e peak: ~197 bf16 TFLOPS / ~394 int8 TOPS.  If XLA lowers int8
dot_general to the MXU's int8 mode, the quantized frozen-encode path
(W8A8 dynamic) is worth building; if it emulates via upcast, it isn't.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

M = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
K = int(sys.argv[2]) if len(sys.argv) > 2 else 768
N = int(sys.argv[3]) if len(sys.argv) > 3 else 2304
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 200

rng = np.random.default_rng(0)
w8 = jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8))
x8 = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
wb = jnp.asarray(rng.normal(0, 0.02, (K, N)).astype(np.float32)).astype(jnp.bfloat16)
xb = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32)).astype(jnp.bfloat16)


@jax.jit
def run_int8(x):
    def body(x, _):
        y = lax.dot_general(
            x, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # fold back to int8 (cheap VPU): shift-scale the int32 accumulator
        x = (y[:, :K] >> 8).astype(jnp.int8)
        return x, y.sum()

    x, s = lax.scan(body, x, None, length=REPS)
    return x.sum().astype(jnp.float32) + s.sum().astype(jnp.float32)


@jax.jit
def run_bf16(x):
    def body(x, _):
        y = lax.dot_general(
            x, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return y[:, :K].astype(jnp.bfloat16), y.sum()

    x, s = lax.scan(body, x, None, length=REPS)
    return x.sum().astype(jnp.float32) + s.sum().astype(jnp.float32)


def time_one(fn, x, label):
    t0 = time.perf_counter()
    float(fn(x))
    tc = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / REPS
    ops = 2 * M * K * N
    print(f"RESULT {label}: {dt*1e6:.0f} us/matmul  {ops/dt/1e12:.1f} T(FL)OPS  (compile {tc:.1f}s)")


if __name__ == "__main__":
    time_one(run_int8, x8, f"int8 {M}x{K}x{N}")
    time_one(run_bf16, xb, f"bf16 {M}x{K}x{N}")
