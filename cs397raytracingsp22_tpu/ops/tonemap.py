"""Post-processing: AA averaging, overbright channel-bleed, gamma, quantize.

Vectorized replication of the reference's per-pixel epilogue
(tracing.rs:241-256):

1. average the spp samples;
2. "channel bleed": any channel's excess over 1.0 is added to the OTHER
   two channels (a hand-rolled saturate-to-white; the excesses are read
   from the pre-bleed color, so the three adds are order-independent);
3. clamp to [0,1], gamma-correct with pow(c, 1/gamma), scale by 255.9999
   and truncate to u8.
"""

from __future__ import annotations

import jax.numpy as jnp


def channel_bleed(color: jnp.ndarray) -> jnp.ndarray:
    """Apply the overbright bleed (tracing.rs:243-251) to (..., 3) colors.

    final[i] = color[i] + sum_{j != i} max(color[j] - 1, 0).
    """
    excess = jnp.maximum(color - 1.0, 0.0)
    total = jnp.sum(excess, axis=-1, keepdims=True)
    return color + (total - excess)


def tonemap(color: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Full epilogue: bleed → clamp → gamma → u8 (tracing.rs:243-256).

    Args:
      color: (..., 3) linear radiance, already averaged over samples.
      gamma: camera gamma (reference uses pow(c, 1/gamma)).

    Returns:
      (..., 3) uint8.
    """
    c = channel_bleed(color)
    c = jnp.clip(c, 0.0, 1.0)
    c = jnp.power(c, 1.0 / gamma) * 255.9999
    return c.astype(jnp.uint8)
