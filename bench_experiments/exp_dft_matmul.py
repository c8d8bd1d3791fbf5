"""DFT-by-matmul vs XLA FFT on TPU, 256^3 f32.

XLA's TPU FFT is a generic radix implementation that doesn't use the MXU;
a dense DFT matrix contraction (one matmul per axis, complex arithmetic as
paired real matmuls) puts the transform on the systolic array. At n=256
the matmul does n/log2(n) = 32x more flops but the MXU has ~100x the VPU's
throughput, so it should win ~3-5x. This experiment measures:
  - jnp.fft.rfftn / irfftn at 256^3 f32
  - matmul DFT forward/inverse at HIGHEST and DEFAULT precision
  - accuracy of a full Poisson solve round-trip vs the f64 CPU answer
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 256
KEY = jax.random.PRNGKey(0)


def _sync(r):
    # host readback: on the axon backend block_until_ready returns before
    # execution finishes; a scalar device->host transfer truly syncs
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.real(leaf.ravel()[0]))


def timeit(f, *args, n=20):
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def dft_mats(n, dtype=jnp.float32):
    j = np.arange(n)
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, j) / n
    return (jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype))


def rdft_mats(n, dtype=jnp.float32):
    j = np.arange(n)
    k = np.arange(n // 2 + 1)
    ang = -2.0 * np.pi * np.outer(k, j) / n
    return (jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype))


def rfftn_mm(x, prec):
    """rfftn of a 3D real array via 3 matmul stages. Returns (re, im)."""
    n0, n1, n2 = x.shape
    cr, ci = rdft_mats(n2, x.dtype)
    c1r, c1i = dft_mats(n1, x.dtype)
    c0r, c0i = dft_mats(n0, x.dtype)
    # last axis: real -> complex
    xr = jnp.einsum("abj,kj->abk", x, cr, precision=prec)
    xi = jnp.einsum("abj,kj->abk", x, ci, precision=prec)
    # axis 1: complex
    yr = jnp.einsum("ajc,kj->akc", xr, c1r, precision=prec) - jnp.einsum(
        "ajc,kj->akc", xi, c1i, precision=prec)
    yi = jnp.einsum("ajc,kj->akc", xr, c1i, precision=prec) + jnp.einsum(
        "ajc,kj->akc", xi, c1r, precision=prec)
    # axis 0
    zr = jnp.einsum("jbc,kj->kbc", yr, c0r, precision=prec) - jnp.einsum(
        "jbc,kj->kbc", yi, c0i, precision=prec)
    zi = jnp.einsum("jbc,kj->kbc", yr, c0i, precision=prec) + jnp.einsum(
        "jbc,kj->kbc", yi, c0r, precision=prec)
    return zr, zi


def irfftn_mm(zr, zi, n2, prec):
    """Inverse of rfftn_mm (full 3D irfftn) via matmuls.

    Forward used C = exp(-2*pi*i*k*j/n) = cr + i*ci (ci = sin of the
    NEGATIVE angle); the inverse applies conj(C)/n = (cr - i*ci)/n, so
    yr = (cr zr + ci zi)/n and yi = (cr zi - ci zr)/n."""
    n0, n1, nh = zr.shape
    c0r, c0i = dft_mats(n0, zr.dtype)
    c1r, c1i = dft_mats(n1, zr.dtype)
    yr = (jnp.einsum("kbc,kj->jbc", zr, c0r, precision=prec)
          + jnp.einsum("kbc,kj->jbc", zi, c0i, precision=prec)) / n0
    yi = (jnp.einsum("kbc,kj->jbc", zi, c0r, precision=prec)
          - jnp.einsum("kbc,kj->jbc", zr, c0i, precision=prec)) / n0
    xr = (jnp.einsum("akc,kj->ajc", yr, c1r, precision=prec)
          + jnp.einsum("akc,kj->ajc", yi, c1i, precision=prec)) / n1
    xi = (jnp.einsum("akc,kj->ajc", yi, c1r, precision=prec)
          - jnp.einsum("akc,kj->ajc", yr, c1i, precision=prec)) / n1
    # last axis: hermitian synthesis x_j = (1/n) sum_k w_k
    # (xr_k cos(2pi jk/n) - xi_k sin(2pi jk/n)), w = 2 except DC/Nyquist
    j = np.arange(n2)
    k = np.arange(nh)
    ang = 2.0 * np.pi * np.outer(j, k) / n2
    w = np.ones(nh)
    w[1:] = 2.0
    if n2 % 2 == 0:
        w[-1] = 1.0
    sr = jnp.asarray(np.cos(ang) * w / n2, zr.dtype)
    si = jnp.asarray(np.sin(ang) * w / n2, zr.dtype)
    return (jnp.einsum("abk,jk->abj", xr, sr, precision=prec)
            - jnp.einsum("abk,jk->abj", xi, si, precision=prec))


def main():
    x = jax.random.normal(KEY, (N, N, N), jnp.float32)

    f_fft = jax.jit(lambda a: jnp.fft.rfftn(a))
    t_fft = timeit(f_fft, x)
    z = f_fft(x)
    f_ifft = jax.jit(lambda a: jnp.fft.irfftn(a, s=(N, N, N)))
    t_ifft = timeit(f_ifft, z)
    print(f"rfftn {t_fft:.2f} ms   irfftn {t_ifft:.2f} ms")

    # fft roundtrip error (on device: the axon tunnel cannot transfer
    # full 256^3 arrays to host)
    rt_fft = jax.jit(lambda a: jnp.max(jnp.abs(
        jnp.fft.irfftn(jnp.fft.rfftn(a), s=a.shape) - a)) / jnp.max(jnp.abs(a)))
    print(f"fft[f32] roundtrip_err {float(rt_fft(x)):.2e}")

    for prec in ("highest", "default"):
        f_mm = jax.jit(lambda a: rfftn_mm(a, prec))
        t_mm = timeit(f_mm, x)
        zr, zi = f_mm(x)
        f_imm = jax.jit(lambda r, i: irfftn_mm(r, i, N, prec))
        t_imm = timeit(f_imm, zr, zi)
        # forward accuracy vs the XLA FFT (on device), roundtrip vs x
        z = f_fft(x)
        err_f = float(jax.jit(lambda zr, zi, z: jnp.maximum(
            jnp.max(jnp.abs(zr - jnp.real(z))),
            jnp.max(jnp.abs(zi - jnp.imag(z)))) / jnp.max(jnp.abs(z)))(
                zr, zi, z))
        err_rt = float(jax.jit(lambda r, i, a: jnp.max(jnp.abs(
            irfftn_mm(r, i, N, prec) - a)) / jnp.max(jnp.abs(a)))(zr, zi, x))
        print(f"mm[{prec}]  fwd {t_mm:.2f} ms  inv {t_imm:.2f} ms  "
              f"fwd_err_vs_fft {err_f:.2e}  roundtrip_err {err_rt:.2e}")


if __name__ == "__main__":
    main()
