"""Adversarial + feature-matching losses (SURVEY.md §3 #14; BASELINE.json:10).

Least-squares GAN objective (HiFi-GAN convention [INFERRED]):
  D: mean((1 - D(x))^2) + mean(D(x_hat)^2)
  G: mean((1 - D(x_hat))^2)
Feature matching: L1 between real/fake intermediate discriminator features,
normalized per layer by the real feature magnitude's mean (scale-free).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

DiscOut = List[Tuple[jax.Array, List[jax.Array]]]


def discriminator_loss(real: DiscOut, fake: DiscOut) -> jax.Array:
    loss = jnp.asarray(0.0, jnp.float32)
    for (lr, _), (lf, _) in zip(real, fake):
        loss = loss + jnp.mean(jnp.square(1.0 - lr)) + jnp.mean(jnp.square(lf))
    return loss / len(real)


def generator_adversarial_loss(fake: DiscOut) -> jax.Array:
    loss = jnp.asarray(0.0, jnp.float32)
    for lf, _ in fake:
        loss = loss + jnp.mean(jnp.square(1.0 - lf))
    return loss / len(fake)


def feature_matching_loss(real: DiscOut, fake: DiscOut) -> jax.Array:
    loss = jnp.asarray(0.0, jnp.float32)
    n = 0
    for (_, fr), (_, ff) in zip(real, fake):
        for r, f in zip(fr[:-1], ff[:-1]):  # skip the logit layer
            r = jax.lax.stop_gradient(r)
            loss = loss + jnp.mean(jnp.abs(r - f)) / (jnp.mean(jnp.abs(r)) + 1e-6)
            n += 1
    return loss / max(n, 1)
