"""Per-ray counter-based RNG.

Every random draw in a render is addressed by (seed, ray_uid, site, lane):
`ray_uid = pixel_id * spp + sample_id` identifies the ray's pixel/sample
globally, `site` identifies the draw site (camera jitter, bounce 0, bounce
1, ...). Because keys are derived from *content* (ray uid), not buffer
position, a render is bit-identical no matter how the ray megabatch is
tiled, chunked, or sharded across devices — the determinism property the
multi-device tests assert (replacing the reference's ambient thread_rng,
tracing.rs:72).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Draw-site tags. Bounces use SITE_BOUNCE0 + bounce index.
SITE_CAMERA = 0
SITE_BOUNCE0 = 1


def ray_keys(base_key: jax.Array, ray_uids: jnp.ndarray) -> jax.Array:
    """Derive one PRNG key per ray from its global uid. Shape (N,) keys."""
    return jax.vmap(lambda u: jax.random.fold_in(base_key, u))(ray_uids)


def site_keys(keys: jax.Array, site: int) -> jax.Array:
    """Derive per-site subkeys from per-ray keys."""
    return jax.vmap(lambda k: jax.random.fold_in(k, site))(keys)


def uniform(keys: jax.Array, n: int) -> jnp.ndarray:
    """n uniforms in [0,1) per key → (N, n)."""
    return jax.vmap(lambda k: jax.random.uniform(k, (n,)))(keys)


def randint(keys: jax.Array, n: int, maxval: int) -> jnp.ndarray:
    """n uniform ints in [0, maxval) per key → (N, n) int32."""
    return jax.vmap(lambda k: jax.random.randint(k, (n,), 0, maxval))(keys)
