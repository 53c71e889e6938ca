import numpy as np
import pytest

from seghiero_tpu.hierarchy import (
    Hierarchy,
    build_fine_to_level_map,
    build_fine_to_super_map_reference,
    build_hiera_index,
)

pytestmark = pytest.mark.fast


def test_build_fine_to_level_map_ranges_and_singletons():
    lut = build_fine_to_level_map([[0, 3], [4, 6], [7], [8]], 9)
    assert lut.tolist() == [0, 0, 0, 0, 1, 1, 1, 2, 3]


def test_build_fine_to_level_map_gap_raises():
    with pytest.raises(ValueError, match="not mapped"):
        build_fine_to_level_map([[0, 3], [5, 8]], 9)


def test_build_fine_to_level_map_out_of_range_raises():
    with pytest.raises(ValueError):
        build_fine_to_level_map([[0, 9]], 9)
    with pytest.raises(ValueError):
        build_fine_to_level_map([[9]], 9)


def test_build_fine_to_level_map_bad_entry_raises():
    with pytest.raises(ValueError, match="start,end"):
        build_fine_to_level_map([[0, 1, 2]], 3)


def test_build_hiera_index():
    # mirrors train.py:69-83 semantics: [x] -> [x, x+1]; [s,e] -> [s, e+1]
    assert build_hiera_index([[0, 3], [4, 6], [7], [8]]) == (
        (0, 4),
        (4, 7),
        (7, 8),
        (8, 9),
    )


def test_hierarchy_2level(classes_2level):
    h = Hierarchy.from_class_config(classes_2level)
    assert (h.n_fine, h.n_coarse, h.n_super) == (9, 4, 0)
    assert not h.has_super
    assert h.total_classes == 13
    assert h.fine_by_coarse == ((0, 1, 2, 3), (4, 5, 6), (7,), (8,))
    assert h.coarse_ranges == ((0, 4), (4, 7), (7, 8), (8, 9))
    assert h.level_slices == ((0, 9), (9, 13))


def test_hierarchy_3level(classes_3level):
    h = Hierarchy.from_class_config(classes_3level)
    assert (h.n_fine, h.n_coarse, h.n_super) == (9, 4, 2)
    assert h.total_classes == 15
    assert h.coarse_to_super.tolist() == [0, 0, 0, 1]
    # fixed semantics: fine→super goes through the coarse level
    # (reference bug #3: train.py:86-99 writes coarse ids into a fine LUT)
    assert h.fine_to_super.tolist() == [0, 0, 0, 0, 0, 0, 0, 0, 1]
    assert h.coarse_by_super == ((0, 1, 2), (3,))


def test_reference_super_map_is_buggy(classes_3level):
    """Documents the reference bug we fixed: its fine→super LUT only fills
    coarse-id slots (train.py:86-99)."""
    ref = build_fine_to_super_map_reference(
        classes_3level["super_coarse_to_coarse_map"], 9
    )
    assert ref.tolist() == [0, 0, 0, 1, -1, -1, -1, -1, -1]  # garbage past idx 3


def test_map_fine_labels_255_safe(classes_3level):
    h = Hierarchy.from_class_config(classes_3level)
    fine = np.array([[0, 4, 8], [255, 7, 255]], dtype=np.int32)
    coarse = h.map_fine_labels(fine, "coarse")
    sup = h.map_fine_labels(fine, "super")
    assert coarse.tolist() == [[0, 1, 3], [255, 2, 255]]
    assert sup.tolist() == [[0, 0, 1], [255, 0, 255]]


def test_split_upper_lower(classes_3level):
    h = Hierarchy.from_class_config(classes_3level)
    upper, lower = h.split_upper_lower()
    # non-background fine ids grouped by super bucket: super0 = fine 1..7
    assert upper == (1, 2, 3, 4, 5, 6, 7)
    assert lower == (8,)


def test_names_mismatch_raises(classes_2level):
    bad = dict(classes_2level)
    bad["coarse_names"] = {0: "only-one"}
    with pytest.raises(ValueError, match="coarse_names"):
        Hierarchy.from_class_config(bad)
