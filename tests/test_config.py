"""Config tests — mirror of the reference's ``sc/tests/test_parameters.py``
plus validation the reference lacks (SURVEY.md §5 config row)."""
import dataclasses

import pytest

from rankaae_tpu.utils.config import Parameters, TrainConfig


def test_parameters_attribute_access():
    p = Parameters({"nstyle": 6, "lr_base": 1e-3})
    assert p.nstyle == 6
    assert p.lr_base == 1e-3


def test_parameters_get_default():
    p = Parameters({"a": 1})
    assert p.get("a", 99) == 1
    assert p.get("missing", 99) == 99


def test_parameters_immutable():
    p = Parameters({"a": 1})
    with pytest.raises(TypeError):
        p.a = 2


def test_parameters_update_appends_and_overwrites():
    p = Parameters({"a": 1})
    p.update({"a": 2, "b": 3})
    assert p.a == 2 and p.b == 3
    assert p.to_dict() == {"a": 2, "b": 3}


def test_reference_yaml_loads_unmodified():
    cfg = TrainConfig.from_yaml("/root/reference/example/fix_config.yaml")
    assert cfg.nstyle == 6
    assert cfg.n_aux == 5
    assert cfg.ae_form == "FC"
    assert cfg.batch_size == 1024
    assert cfg.optimizer_name == "AdamW"
    assert cfg.use_flex_spec_target is True
    assert cfg.epoch_stop_smooth == 1500
    assert cfg.decoder_activation == "Softplus"


def test_unknown_key_rejected():
    p = Parameters({"ae_form": "FC", "bogus_key": 1})
    with pytest.raises(KeyError):
        TrainConfig.from_parameters(p)


def test_invalid_values_rejected():
    with pytest.raises(ValueError):
        TrainConfig(ae_form="nope").validate()
    with pytest.raises(ValueError):
        TrainConfig(decoder_activation="gelu").validate()
    with pytest.raises(ValueError):
        TrainConfig(nstyle=3, n_aux=5).validate()


def test_frozen_dataclass():
    cfg = TrainConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.nstyle = 7
