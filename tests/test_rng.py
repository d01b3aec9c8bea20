import numpy as np

from vsr_tpu.utils.rng import RngTree, seed_to_int


def test_string_seed_stable():
    assert seed_to_int("vsr") == seed_to_int("vsr")
    assert seed_to_int("vsr") != seed_to_int("vsr2")
    assert seed_to_int(7) == 7


def test_streams_independent_and_reproducible():
    tree = RngTree("vsr")
    a1 = tree.numpy_generator("data", 0, 3).random(4)
    a2 = tree.numpy_generator("data", 0, 3).random(4)
    b = tree.numpy_generator("data", 1, 3).random(4)
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1, b)


def test_jax_keys_deterministic():
    import jax

    tree = RngTree(123)
    k1 = tree.jax_key("init")
    k2 = tree.jax_key("init")
    assert (jax.random.key_data(k1) == jax.random.key_data(k2)).all()
    k3 = tree.jax_key("train", 5)
    assert not (jax.random.key_data(k1) == jax.random.key_data(k3)).all()
