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


def test_sci_notation_lr_string_coerced(tmp_path):
    """YAML 1.1 parses the reference yamls' bare ``LR : 1e-4`` as a STRING
    (exponent without a decimal point).  The reference casts at the
    consumer (`float(cfg.CONFIG.TRAIN.LR)`, /root/reference/train.py:83);
    our optimizer/scheduler builders must do the same — a string LR
    otherwise detonates inside optax's scale step (found when the VSS
    train config first ran on the chip, round 5)."""
    import yaml as _yaml

    p = tmp_path / "lr.yaml"
    p.write_text("CONFIG:\n  TRAIN:\n    LR : 1e-4\n")
    assert isinstance(_yaml.safe_load(p.read_text())["CONFIG"]["TRAIN"]["LR"],
                      str)  # the YAML-1.1 trap this test pins
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(p))

    from class_query_vad_tpu.utils.lr_scheduler import build_scheduler

    cfg.CONFIG.TRAIN.LR_POLICY = "cosine"
    sched = build_scheduler(cfg, steps_per_epoch=10)
    assert abs(float(sched(0)) - 1e-4) < 1e-10   # fp32 schedule output
