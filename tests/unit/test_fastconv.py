import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsc_tpu.ops import conv as C
from nsc_tpu.ops import fastconv as FC


@pytest.mark.parametrize(
    "k,stride,dilation,stack",
    [
        (3, 1, 1, 8),
        (3, 1, 3, 8),
        (3, 1, 9, 4),
        (1, 1, 1, 8),
        (7, 1, 1, 8),
        (4, 2, 1, 4),
        (8, 4, 1, 2),
        (10, 5, 1, 2),
        (16, 8, 1, 2),
        (3, 1, 1, 5),  # stack not dividing T/stride exercises shrink
    ],
)
def test_stacked_conv_exact_vs_reference(k, stride, dilation, stack):
    key = jax.random.PRNGKey(0)
    cin, cout, t = 6, 10, 720  # 720 divisible by 2,4,5,8,9...
    p = C.init_conv(key, k, cin, cout)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, cin))
    ref = C.conv1d(x, p, stride=stride, dilation=dilation, padding="causal")
    got = FC.stacked_conv1d(x, p, stride=stride, dilation=dilation, stack=stack)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,stride", [(4, 2), (8, 4), (10, 5), (16, 8), (5, 2), (3, 3)])
def test_polyphase_transpose_exact_vs_reference(k, stride):
    key = jax.random.PRNGKey(2)
    cin, cout, f = 6, 4, 33
    p = C.init_conv(key, k, cin, cout)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, f, cin))
    ref = C.conv_transpose1d(x, p, stride=stride, causal=True)
    got = FC.polyphase_conv_transpose1d(x, p, stride=stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    p = C.init_conv(jax.random.PRNGKey(4), 3, 4, 4)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 70, 4))  # 70 % 3 != 0
    # exercises the right-pad-to-phase-multiple path under grad too

    def loss_ref(pp):
        return jnp.sum(C.conv1d(x, pp, dilation=3, padding="causal") ** 2)

    def loss_fast(pp):
        return jnp.sum(FC.stacked_conv1d(x, pp, dilation=3) ** 2)

    g1 = jax.grad(loss_ref)(p)
    g2 = jax.grad(loss_fast)(p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
