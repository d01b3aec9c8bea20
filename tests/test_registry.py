import pytest

from vsr_tpu.registry import build, get_class, names, register


@register("net", "TestToyNet")
class ToyNet:
    def __init__(self, width=8, depth=2):
        self.width = width
        self.depth = depth


def test_register_and_get():
    assert get_class("net", "TestToyNet") is ToyNet
    assert "TestToyNet" in names("net")


def test_build_with_kwargs():
    net = build("net", {"name": "TestToyNet", "kwargs": {"width": 16}})
    assert net.width == 16 and net.depth == 2


def test_build_without_kwargs():
    net = build("net", {"name": "TestToyNet"})
    assert net.width == 8


def test_build_extra_kwargs_win():
    net = build("net", {"name": "TestToyNet", "kwargs": {"width": 16}}, width=32)
    assert net.width == 32


def test_unknown_name():
    with pytest.raises(KeyError):
        get_class("net", "NopeNet")
