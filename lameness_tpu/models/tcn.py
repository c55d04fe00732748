"""Temporal Convolutional Network lameness head in flax.

Capability-parity rebuild of the reference TCN
(``services/tcn-pipeline/app/main.py:22-195``): 4 temporal blocks of two
weight-normalised causal dilated conv1ds (64 ch, k=3, dilation 2^i) with
residuals, average-pool classifier, sigmoid probability.  Receptive field
1 + Σ 2(k−1)·2^i = 61 timesteps over the 125-frame clip.

The TPU-native difference: MC-dropout uncertainty is ONE batched forward —
``predict_with_uncertainty`` vmaps the forward over `n` dropout rngs instead
of looping 10 sequential passes (reference tcn:169-195), and the whole head
vmaps over tracked cows.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class CausalConv1d(nn.Module):
    """Weight-normalised causal conv over (B, T, C) with left padding."""
    features: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        v = self.param("v", nn.initializers.he_normal(),
                       (self.kernel_size, in_ch, self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        # weight norm over (k, in) per output channel
        norm = jnp.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True) + 1e-12)
        w = v / norm * g
        pad = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC")) + b


class TemporalBlock(nn.Module):
    features: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = CausalConv1d(self.features, self.kernel_size, self.dilation,
                         name="conv1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = CausalConv1d(self.features, self.kernel_size, self.dilation,
                         name="conv2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, name="residual")(x)
        return nn.relu(h + x)


class TCN(nn.Module):
    input_dim: int = 44
    channels: Sequence[int] = (64, 64, 64, 64)
    kernel_size: int = 3
    dropout: float = 0.2

    @property
    def receptive_field(self) -> int:
        rf = 1
        for i in range(len(self.channels)):
            rf += 2 * (self.kernel_size - 1) * (2 ** i)
        return rf

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, F) -> probability (B, 1)."""
        for i, ch in enumerate(self.channels):
            x = TemporalBlock(ch, self.kernel_size, 2 ** i, self.dropout,
                              name=f"block{i}")(x, deterministic)
        x = x.mean(axis=1)                       # adaptive avg pool over time
        x = nn.relu(nn.Dense(32, name="fc1")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.sigmoid(nn.Dense(1, name="fc2")(x))


def mc_dropout(fn, rng: jax.Array, n_samples: int = 10
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MC-dropout as ONE vmapped batched forward (not a host loop).

    ``fn(key) -> (B, 1)`` runs the model with dropout rng ``key``.
    Returns (mean, std); std uses ddof=1 to match ``torch.std``'s default
    unbiased estimator (reference tcn:192).
    """
    keys = jax.random.split(rng, n_samples)
    preds = jax.vmap(fn)(keys)                   # (n, B, 1)
    return preds.mean(axis=0), preds.std(axis=0, ddof=1)


def predict_with_uncertainty(model: nn.Module, params, x: jnp.ndarray,
                             rng: jax.Array, n_samples: int = 10,
                             **apply_kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MC-dropout wrapper for heads whose apply returns the probability."""
    return mc_dropout(
        lambda k: model.apply(params, x, deterministic=False,
                              rngs={"dropout": k}, **apply_kwargs),
        rng, n_samples)
