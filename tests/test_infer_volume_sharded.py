"""'seq'-sharded VOLUME serving (VERDICT round-3 item #5): a volume too
deep for one chip's HBM shards its depth at inference exactly like
training — depth over 'seq', time-batch over 'data' (3d), H over
'spatial'. Runs on the 8-virtual-device CPU mesh from conftest; the same
code path partitions over real chips via
``python -m vsr_tpu.infer --mesh seq=4 --net Volume3DSRNet ...``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.infer import make_pipeline, make_prep, resolve_volume
from vsr_tpu.models import Volume3DSRNet
from vsr_tpu.models.vol4d import Volume4DSRNet
from vsr_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _build(mode, d, t, hr, rng):
    frames = jnp.asarray(
        np.round(rng.random((d * t, hr, hr)) * 255), jnp.float32)
    cls = Volume3DSRNet if mode == "3d" else Volume4DSRNet
    net = cls(in_channels=1, out_channels=1, num_resblocks=1,
              num_features=4, upscale_factor=2)
    _, z = jax.jit(make_prep(2, "acdc", volume=(mode, t)))(frames)
    params = net.init(jax.random.PRNGKey(0), z)
    return net, params, frames


@pytest.mark.parametrize("mode,mesh_axes", [
    ("3d", {"seq": 4}),
    ("3d", {"data": 2, "seq": 2, "spatial": 2}),
    ("4d", {"seq": 4}),
    ("4d", {"seq": 2, "spatial": 2}),
])
def test_seq_sharded_volume_matches_unsharded(mode, mesh_axes, rng):
    d, t, hr = 4, 4, 24
    net, params, frames = _build(mode, d, t, hr, rng)
    ref_lr, ref_sr = jax.tree_util.tree_map(
        np.asarray, make_pipeline(net, params, 2, "acdc",
                                  volume=(mode, t))(frames))
    mesh = make_mesh(mesh_axes)
    sh_lr, sh_sr = jax.tree_util.tree_map(
        np.asarray, make_pipeline(net, params, 2, "acdc", volume=(mode, t),
                                  mesh=mesh)(frames))
    np.testing.assert_array_equal(sh_lr, ref_lr)
    # GSPMD halo exchange reproduces the unsharded 3D convs; outputs are
    # rounded uint8 grey levels, so demand bitwise equality like the
    # training-side seq tests.
    np.testing.assert_array_equal(sh_sr, ref_sr)


def test_volume_depth_must_divide_seq(rng):
    d, t, hr = 3, 4, 24
    net, params, frames = _build("3d", d, t, hr, rng)
    pipe = make_pipeline(net, params, 2, "acdc", volume=("3d", t),
                         mesh=make_mesh({"seq": 2}))
    with pytest.raises(ValueError, match="depth"):
        pipe(frames)


def test_volume_mesh_guards():
    mesh = make_mesh({"data": 2, "model": 2})
    with pytest.raises(ValueError, match="model"):
        resolve_volume("Volume3DSRNet", seq_t=4, mesh=mesh)
    with pytest.raises(ValueError, match="data"):
        resolve_volume("Volume4DSRNet", seq_t=4,
                       mesh=make_mesh({"data": 2}))
    with pytest.raises(ValueError, match="chunk"):
        resolve_volume("Volume3DSRNet", seq_t=4, chunk=2,
                       mesh=make_mesh({"seq": 2}))
    # 'seq' on a NON-volume pipeline would silently replicate — refused.
    from vsr_tpu.models import EDSRNet

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 1)))
    with pytest.raises(ValueError, match="seq"):
        make_pipeline(net, params, 2, "acdc", mesh=make_mesh({"seq": 2}))


def test_3d_data_axis_must_divide_t(rng):
    net, params, frames = _build("3d", 4, 3, 24, rng)
    with pytest.raises(ValueError, match="'data' mesh axis"):
        make_pipeline(net, params, 2, "acdc", volume=("3d", 3),
                      mesh=make_mesh({"data": 2, "seq": 2}))
