import pytest
import yaml

from i2sdf_tpu.config import CfgNode, load_cfg


def test_attr_access_nested():
    cfg = CfgNode({"train": {"lr": 5e-4, "steps": 200}, "name": "x"})
    assert cfg.train.lr == 5e-4
    assert cfg.train.steps == 200
    assert cfg.name == "x"
    cfg.train.lr = 1e-3
    assert cfg["train"]["lr"] == 1e-3


def test_freeze_blocks_mutation():
    cfg = CfgNode({"a": {"b": 1}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a.b = 2
    cfg.defrost()
    cfg.a.b = 2
    assert cfg.a.b == 2


def test_merge_from_list_types():
    cfg = CfgNode({"train": {"lr": 5e-4, "steps": 200, "name": "a"}})
    cfg.merge_from_list(["train.lr", "0.001", "train.steps", "300"])
    assert cfg.train.lr == 0.001
    assert cfg.train.steps == 300
    with pytest.raises(KeyError):
        cfg.merge_from_list(["train.nope", "1"])
    with pytest.raises(ValueError):
        cfg.merge_from_list(["train.name", "[1,2]"])


def test_dump_roundtrip(tmp_path):
    cfg = CfgNode({"model": {"dims": [256, 256], "flag": True}})
    text = cfg.dump()
    loaded = CfgNode(yaml.safe_load(text))
    assert loaded.model.dims == [256, 256]
    assert loaded.model.flag is True

    p = tmp_path / "c.yml"
    p.write_text(text)
    cfg2 = load_cfg(str(p))
    assert cfg2.model.dims == [256, 256]


def test_merge_from_file(tmp_path):
    base = CfgNode({"train": {"lr": 1.0, "bs": 4}})
    p = tmp_path / "o.yml"
    p.write_text("train:\n  lr: 2.0\nextra:\n  z: 1\n")
    base.merge_from_file(str(p))
    assert base.train.lr == 2.0
    assert base.train.bs == 4
    assert base.extra.z == 1


def test_deprecated_and_renamed_keys():
    cfg = CfgNode({"train": {"lr": 1.0}})
    cfg.register_deprecated_key("train.old_thing")
    cfg.register_renamed_key("train.learn_rate", "train.lr")
    assert cfg.key_is_deprecated("train.old_thing")
    # deprecated keys are silently skipped on merge
    cfg.merge_from_list(["train.old_thing", "5", "train.lr", "2.0"])
    assert cfg.train.lr == 2.0
    with pytest.raises(KeyError, match="renamed"):
        cfg.merge_from_list(["train.learn_rate", "3.0"])
