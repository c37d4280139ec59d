"""Host-side random init: jax.random evaluated on the CPU backend.

Threefry is backend-invariant, so the values are bit-identical to
device-side generation — but a large init table (e.g. 624k x 40 item
factors at KDD-Cup scale) no longer round-trips through the axon TPU
tunnel, where a ~100MB device->host fetch takes minutes. The arrays
upload to the TPU lazily when the first jitted epoch consumes them —
a transfer that training needs anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normal(key, shape, dtype=jnp.float32):
    """jax.random.normal on the host CPU backend (identical bits)."""
    with jax.default_device(jax.devices("cpu")[0]):
        return jax.random.normal(key, shape, dtype=dtype)
