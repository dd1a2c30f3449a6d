"""Scratch probe: decoder transposed-conv lowering — lax lhs-dilation vs
polyphase (fastconv) at decoder stage sizes, serving dtype."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t_med(fn, iters=12):
    out = fn()
    float(jnp.sum(jnp.ravel(out)[:1].astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(jnp.ravel(out)[:1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from nsc_tpu.ops import conv as C
    from nsc_tpu.ops import fastconv as FC
    from nsc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    # decoder up-conv shapes for the base config (stage i: Cin -> Cin/2, x S)
    shapes = [
        ("up4 (64->32, S=2, T=80k)", 64, 32, 2, 80000),
        ("up3 (128->64, S=4, T=20k)", 128, 64, 4, 20000),
        ("up2 (256->128, S=5, T=4k)", 256, 128, 5, 4000),
    ]
    for tag, cin, cout, s, t in shapes:
        p = C.init_conv(jax.random.PRNGKey(0), 2 * s, cin, cout)
        x = jnp.asarray(rng.randn(64, t, cin).astype(np.float32) * 0.3).astype(
            jnp.bfloat16
        )
        ref = jax.jit(lambda x: C.conv_transpose1d(x, p, stride=s, causal=True))
        poly = jax.jit(lambda x: FC.polyphase_conv_transpose1d(x, p, stride=s))
        a, b = ref(x), poly(x)
        diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"{tag}: ref {t_med(lambda: ref(x)):6.1f} ms   poly {t_med(lambda: poly(x)):6.1f} ms   maxdiff {diff:.2e}", flush=True)


if __name__ == "__main__":
    main()
