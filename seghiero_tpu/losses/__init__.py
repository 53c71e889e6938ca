from seghiero_tpu.losses.cross_entropy import softmax_cross_entropy
from seghiero_tpu.losses.hiera import (
    hiera_bce_two_level,
    hiera_bce_three_level,
    prepare_targets_two_level,
    prepare_targets_three_level,
    HieraTripletLoss,
)
from seghiero_tpu.losses.tree_triplet import (
    tree_triplet_loss_range,
    tree_triplet_loss_groups,
    triplet_schedule_factor,
)
from seghiero_tpu.losses.rmi import rmi_lower_bound, RMIHieraTripletLoss
from seghiero_tpu.losses.focal import hiera_focal_loss, hiera_focal_three_level
from seghiero_tpu.losses.fast import FastHieraTripletLoss, FastRMIHieraTripletLoss
from seghiero_tpu.losses.extra import dice_loss, lovasz_softmax

__all__ = [
    "softmax_cross_entropy",
    "hiera_bce_two_level",
    "hiera_bce_three_level",
    "prepare_targets_two_level",
    "prepare_targets_three_level",
    "HieraTripletLoss",
    "tree_triplet_loss_range",
    "tree_triplet_loss_groups",
    "triplet_schedule_factor",
    "rmi_lower_bound",
    "RMIHieraTripletLoss",
    "hiera_focal_loss",
    "dice_loss",
    "lovasz_softmax",
    "hiera_focal_three_level",
    "FastHieraTripletLoss",
    "FastRMIHieraTripletLoss",
]
