import textwrap

import pytest

from seghiero_tpu.config import SegHieroConfig, load_config


REFERENCE_YAML = textwrap.dedent(
    """
    dataset:
        root: '/data/root'
        train:
          image_subdir: '/img'
          mask_subdir: '/msk'
        val:
          image_subdir: '/img'
          mask_subdir: '/msk'
    classes:
        super_coarse_to_coarse_map: [[0, 2], [3]]
        super_coarse_names:
          0: Plant
          1: Fungus
        coarse_to_fine_map: [[0,3], [4,6], [7], [8]]
        coarse_names:
          0: Flower
          1: Tree
          2: Grass
          3: Mushroom
        fine_names:
          0: Sunflower
          1: Lily
          2: Rose
          3: Tulip
          4: Juniper
          5: Oak
          6: Palm
          7: Bermuda
          8: Lions Mane
    model:
      pretrained_model: resnet-101
    training:
      epochs: 50
      batch_size: 8
      lr: 0.001
      device: "cuda"
      fine_weight: 1.0
      coarse_weight: 1.0
      super_weight:   1.0
      num_workers:  1
      gpus: [0]
    transform:
      resize: [150, 150]
      hflip_prob: 0.5
    output:
      checkpoint_dir: "./"
      project_name: "fun"
    """
)

pytestmark = pytest.mark.fast


def test_reference_yaml_loads_verbatim(tmp_path):
    """The reference example-config.yaml schema must parse unchanged
    (capability contract, example-config.yaml:1-51)."""
    p = tmp_path / "cfg.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = load_config(str(p))
    assert cfg.hierarchy.has_super
    assert cfg.hierarchy.total_classes == 15
    assert cfg.model.depth == 101
    assert cfg.training.epochs == 50
    assert cfg.training.batch_size == 8
    assert cfg.training.lr == 0.001
    assert cfg.training.device == "cuda"  # accepted & ignored
    assert cfg.transform.resize == (150, 150)
    assert cfg.output.project_name == "fun"
    assert cfg.dataset.image_dir("train") == "/data/root/img"
    assert cfg.fine_names[8] == "Lions Mane"
    assert cfg.super_names == {0: "Plant", 1: "Fungus"}


def test_depth_from_pretrained_model_name(classes_2level):
    cfg = SegHieroConfig.from_dict(
        {"classes": classes_2level, "model": {"pretrained_model": "resnet-50"}}
    )
    assert cfg.model.depth == 50
    assert cfg.model.in_channels == 2048


def test_small_depth_channel_defaults(classes_2level):
    cfg = SegHieroConfig.from_dict({"classes": classes_2level, "model": {"depth": 18}})
    assert cfg.model.in_channels == 512
    assert cfg.model.c1_in_channels == 64


def test_bad_depth_raises(classes_2level):
    with pytest.raises(ValueError, match="depth"):
        SegHieroConfig.from_dict({"classes": classes_2level, "model": {"depth": 77}})


def test_rmi_pool_mismatch_raises(classes_2level):
    with pytest.raises(ValueError, match="rmi_pool"):
        SegHieroConfig.from_dict(
            {
                "classes": classes_2level,
                "training": {"rmi_pool_size": 3, "rmi_pool_stride": 2},
            }
        )


def test_unknown_section_warns(classes_2level):
    with pytest.warns(UserWarning, match="unknown config sections"):
        SegHieroConfig.from_dict({"classes": classes_2level, "bogus": {}})


def test_compiler_options_validation(classes_2level):
    cfg = SegHieroConfig.from_dict(
        {
            "classes": classes_2level,
            "training": {
                "compiler_options": {"xla_tpu_scoped_vmem_limit_kib": "65536"}
            },
        }
    )
    assert cfg.training.compiler_options == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"
    }
    with pytest.raises(ValueError, match="compiler_options"):
        SegHieroConfig.from_dict(
            {
                "classes": classes_2level,
                "training": {"compiler_options": "not-a-mapping"},
            }
        )
