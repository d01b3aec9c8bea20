import textwrap

from vsr_tpu.config import Config, load_config, save_config


def test_attribute_access_nested():
    cfg = Config({"a": {"b": {"c": 1}}, "lst": [{"name": "X"}]})
    assert cfg.a.b.c == 1
    assert cfg.lst[0].name == "X"
    cfg.a.b.c = 2
    assert cfg["a"]["b"]["c"] == 2


def test_get_and_missing():
    cfg = Config({"x": 1})
    assert cfg.get("lr_scheduler") is None
    assert getattr(cfg, "x") == 1
    try:
        cfg.missing
        raise AssertionError("expected AttributeError")
    except AttributeError:
        pass


def test_update_wraps():
    cfg = Config()
    cfg.update(net={"name": "EDSRNet", "kwargs": {"num_blocks": 4}})
    assert cfg.net.kwargs.num_blocks == 4


def test_yaml_roundtrip(tmp_path):
    src = tmp_path / "cfg.yaml"
    src.write_text(
        textwrap.dedent(
            """
            main:
                random_seed: 'vsr'
                saved_dir: '/tmp/exp'
            losses:
                - name: 'L1Loss'
                  weight: 1.0
            """
        )
    )
    cfg = load_config(src)
    assert cfg.main.random_seed == "vsr"
    assert cfg.losses[0].weight == 1.0
    dst = tmp_path / "copy.yaml"
    save_config(cfg, dst)
    cfg2 = load_config(dst)
    assert cfg2.to_dict() == cfg.to_dict()


def test_to_dict_plain():
    cfg = Config({"a": {"b": [1, {"c": 2}]}})
    d = cfg.to_dict()
    assert isinstance(d["a"], dict) and not isinstance(d["a"], Config)
    assert d["a"]["b"][1] == {"c": 2}
