import glob

import pytest

from class_query_vad_tpu.config import get_cfg_defaults

REFERENCE_YAMLS = sorted(glob.glob("/root/reference/configuration/*.yaml"))


def test_defaults_roundtrip():
    cfg = get_cfg_defaults()
    assert cfg.CONFIG.MODEL.D_MODEL == 256
    assert cfg.DDP_CONFIG.WORLD_SIZE == 1
    clone = cfg.clone()
    clone.CONFIG.MODEL.D_MODEL = 512
    assert cfg.CONFIG.MODEL.D_MODEL == 256


@pytest.mark.parametrize("yaml_path", REFERENCE_YAMLS)
def test_loads_reference_yaml(yaml_path):
    """Every shipped reference YAML overlay must merge cleanly."""
    cfg = get_cfg_defaults()
    cfg.merge_from_file(yaml_path)
    assert cfg.CONFIG.DATA.NUM_CLASSES in (21, 24, 80)
    assert cfg.CONFIG.MODEL.D_MODEL == 256
    # keys the model builder consumes
    _ = cfg.CONFIG.MODEL.QUERY_NUM
    _ = cfg.CONFIG.DATA.TEMP_LEN
    _ = cfg.CONFIG.MODEL.get("ENCODER_TYPE", "attention")


def test_merge_from_list():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["CONFIG.MODEL.QUERY_NUM", "7", "CONFIG.AMP", "true"])
    assert cfg.CONFIG.MODEL.QUERY_NUM == 7
    assert cfg.CONFIG.AMP is True
