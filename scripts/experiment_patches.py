"""Dev experiment: column-selection strategies for patch extraction.

Times 3 ways of turning (K, P, W0) gathered rows into (K, P, P) patches
on the current backend:
  a) one-hot matmul over all W0 columns (shipping implementation)
  b) vmapped dynamic_slice per keypoint
  c) gather via jnp.take_along_axis on explicit column indices
Run: PYTHONPATH=. python scripts/experiment_patches.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

K, P, W0 = 1024, 37, 640
N = 100


def bench(name, fn, *args):
    @jax.jit
    def run():
        def body(i, c):
            out = fn(*args, c)
            return c + jnp.sum(out) * 1e-30
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
    np.asarray(run())
    t0 = time.perf_counter(); np.asarray(run())
    print(f"{name:28s} {(time.perf_counter()-t0)/N*1e3:7.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(0, 1, (K, P, W0)).astype(np.float32))
    xs0 = jnp.asarray(rng.integers(0, W0 - P, K).astype(np.int32))

    def onehot(rows, xs0, c):
        xs = xs0[:, None] + jnp.arange(P)
        cols = jax.lax.broadcasted_iota(jnp.int32, (K, W0, P), 1)
        oh = (cols == xs[:, None, :]).astype(rows.dtype)
        return jax.lax.dot_general(
            rows + c, oh, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def dslice(rows, xs0, c):
        return jax.vmap(
            lambda r, x: jax.lax.dynamic_slice(r, (0, x), (P, P)))(
            rows + c, xs0)

    def takealong(rows, xs0, c):
        idx = (xs0[:, None, None]
               + jnp.arange(P)[None, None, :]).repeat(P, 1)   # (K, P, P)
        return jnp.take_along_axis(rows + c, idx, axis=2)

    bench("onehot matmul (current)", onehot, rows, xs0)
    bench("vmap dynamic_slice", dslice, rows, xs0)
    bench("take_along_axis", takealong, rows, xs0)

    # sanity: all equal
    a = onehot(rows, xs0, 0.0)
    b = dslice(rows, xs0, 0.0)
    cc = takealong(rows, xs0, 0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(cc), atol=0)
    print("all variants agree")


if __name__ == "__main__":
    main()
