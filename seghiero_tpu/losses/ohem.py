"""OHEM (online hard example mining) pixel selection for the per-level CE.

Beyond-reference capability (the reference has no pixel sampler; this is
the standard segmentation-training tool its mmseg-derived loss wrappers
pair with — mmseg ``OHEMPixelSampler`` semantics, rebuilt TPU-static):

  * keep every valid pixel whose true-class probability is below
    ``thresh``;
  * but always keep at least ``batch_kept`` pixels (the hardest ones by
    true-class probability), so early training — where most pixels are
    "hard" — still sees a floor of gradient signal.

mmseg computes the probability threshold by sorting the valid pixels'
true-class probabilities and reading the element at index
``min(batch_kept, n_valid - 1)``; pixels with probability STRICTLY below
``max(that, thresh)`` are kept. Data-dependent sorting of a dynamic
subset does not jit, so here the invalid pixels are mapped to a sentinel
probability of 2.0 (sorting after every real one) and the k-th smallest
is taken with a static-k ``lax.top_k``. Equivalence with the
mmseg/NumPy oracle whenever ``batch_kept < n_valid`` is asserted in
tests/test_ohem.py; when ``batch_kept >= n_valid`` the sentinel makes
the threshold 2.0, i.e. ALL valid pixels are kept (mmseg would drop the
single easiest pixel in that corner — keeping it is the saner behavior
and is documented here as the one deliberate divergence).

The selection itself is wrapped in ``stop_gradient``: like mmseg's
``with torch.no_grad()`` sampler, the 0/1 keep-mask is a constant of the
backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = 2.0  # sorts after every real probability in [0, 1]


def ohem_pixel_weight(
    p_true: jax.Array,
    valid: jax.Array,
    thresh: float,
    batch_kept: int,
) -> jax.Array:
    """0/1 keep-weight per pixel (mmseg OHEMPixelSampler.sample).

    Args:
      p_true: [...] predicted probability of the TRUE class per pixel.
      valid: [...] bool, False at ignore-index pixels.
      thresh: probability threshold — easy pixels (p >= thresh) are
        dropped unless needed to reach ``batch_kept``.
      batch_kept: minimum number of kept pixels over the whole batch
        (mmseg's ``min_kept * batch_size``), static.

    Returns:
      float32 mask, same shape as ``p_true``.
    """
    p_true = jax.lax.stop_gradient(p_true.astype(jnp.float32))
    n = int(p_true.size)
    p_flat = jnp.where(valid, p_true, _SENTINEL).reshape(-1)
    # mmseg threshold element: sorted_valid[min(batch_kept, n_valid-1)].
    # k-th smallest with k = min(batch_kept, n-1) + 1 (static).
    k = min(int(batch_kept), n - 1) + 1
    if k > 0:
        kth = -jax.lax.top_k(-p_flat, k)[0][k - 1]
        threshold = jnp.maximum(kth, jnp.float32(thresh))
    else:
        threshold = jnp.float32(thresh)
    return (valid & (p_true < threshold)).astype(jnp.float32)
