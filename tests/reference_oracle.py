"""Import the PyTorch reference losses as golden oracles.

The reference at /root/reference is torch-only (no torchvision needed for
the loss modules), so we import it *as-is* — never copying code — and
compare our JAX implementations against it on random inputs.

Two CPU-compat shims are needed:
  * both triplet losses hardcode ``.cuda()`` (tree_triplet_loss.py:48-65,
    rmi_tree_triplet_loss.py:53-70) — redirected to identity;
  * ``torch.cholesky`` is long-deprecated (rmi_hiera_triplet_loss.py:315)
    but still present in torch 2.13.
"""

import sys

import numpy as np
import torch

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

# CPU shim: make .cuda() a no-op before importing reference modules
if not getattr(torch.Tensor, "_seghiero_cuda_shim", False):
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]
    torch.Tensor._seghiero_cuda_shim = True  # type: ignore[attr-defined]

from models.loss.cross_entropy_loss import CrossEntropyLoss as RefCrossEntropyLoss  # noqa: E402
from models.loss.hiera_triplet_loss import (  # noqa: E402
    HieraTripletLoss as RefHieraTripletLoss,
    _losses_hiera_two_level as ref_losses_hiera_two_level,
    _prepare_targets_two_level as ref_prepare_targets_two_level,
)
from models.loss.tree_triplet_loss import TreeTripletLoss as RefTreeTripletLossRange  # noqa: E402
from models.loss.rmi_tree_triplet_loss import (  # noqa: E402
    TreeTripletLoss as RefTreeTripletLossGroups,
)
from models.loss.rmi_hiera_triplet_loss import (  # noqa: E402
    RMIHieraTripletLoss as RefRMIHieraTripletLoss,
)


def load_dead_hiera_loss_module():
    """Execute the reference's dead models/loss/hiera_loss.py as an
    oracle namespace.

    The module cannot be imported as-is: it decorates a class with an
    undefined mmseg leftover ``@LOSSES.register_module()``
    (hiera_loss.py:118). Executing the file's own source with a no-op
    ``LOSSES`` registry injected makes its functions
    (``prepare_targets``, ``losses_hiera``, ``losses_hiera_focal``)
    callable without copying any code.
    """
    path = "/root/reference/models/loss/hiera_loss.py"
    with open(path) as f:
        src = f.read()

    class _Registry:
        def register_module(self):
            return lambda cls: cls

    ns = {"LOSSES": _Registry()}
    exec(compile(src, path, "exec"), ns)
    return ns


def to_torch_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    """Our layout is NHWC; the reference is NCHW."""
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def random_logits(rng, b, h, w, c, scale=3.0):
    return (rng.standard_normal((b, h, w, c)) * scale).astype(np.float32)


def random_labels(rng, b, h, w, n_fine, p_ignore=0.1):
    lbl = rng.integers(0, n_fine, size=(b, h, w))
    ignore = rng.random((b, h, w)) < p_ignore
    return np.where(ignore, 255, lbl).astype(np.int32)


def random_unit_embedding(rng, b, h, w, d):
    e = rng.standard_normal((b, h, w, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)
