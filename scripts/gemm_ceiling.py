"""Practical MXU ceiling probe: chained GEMMs at the UNet projection shapes."""
import time
import jax
import jax.numpy as jnp

dtype = jnp.bfloat16
N_ITER = 100


def bench(m, k, n, label):
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype) * 0.02

    @jax.jit
    def chain(x, w):
        def body(x, _):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return y.astype(dtype)[:, :k] if n != k else y.astype(dtype), None
        x, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return jnp.sum(x.astype(jnp.float32))

    float(chain(x, w))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(chain(x, w))
        ts.append(time.time() - t0)
    flops = 2 * m * k * n * N_ITER
    print(f"{label} ({m}x{k}x{n}): {min(ts)*1000:.1f} ms, "
          f"{flops/min(ts)/1e12:.1f} TF/s", flush=True)


bench(3072, 1280, 1280, "L2 projection")
bench(12288, 640, 640, "L1 projection")
bench(3072, 1280, 10240, "L2 ff_in")
bench(8192, 8192, 8192, "big square")


def bench_conv(s_h, s_w, c, label):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, s_h, s_w, c), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), dtype) * 0.02

    @jax.jit
    def chain(x, w):
        def body(x, _):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return y.astype(dtype), None
        x, _ = jax.lax.scan(body, x, None, length=N_ITER)
        return jnp.sum(x.astype(jnp.float32))

    float(chain(x, w))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(chain(x, w))
        ts.append(time.time() - t0)
    flops = 2 * 4 * s_h * s_w * 9 * c * c * N_ITER
    print(f"{label} conv3x3 (4x{s_h}x{s_w}x{c}): {min(ts)*1000:.1f} ms, "
          f"{flops/min(ts)/1e12:.1f} TF/s", flush=True)


bench_conv(128, 96, 320, "L0 resnet")
bench_conv(64, 48, 640, "L1 resnet")
bench_conv(32, 24, 1280, "L2 resnet")
