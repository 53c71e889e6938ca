from seghiero_tpu.ops.pallas.hiera2_fused import (
    fused_hiera2_loss_sums,
    fused_hiera2_available,
)

__all__ = ["fused_hiera2_loss_sums", "fused_hiera2_available"]
