import math

import numpy as np
import pytest

from vsr_tpu.losses import CharbonnierLoss, FlowLoss, HuberLoss, L1Loss, MSELoss, SmoothL1Loss
from vsr_tpu.metrics import PSNR, SSIM, CardiacPSNR, CardiacSSIM, _reference_gaussian_kernel
from vsr_tpu.registry import build


@pytest.fixture
def pair(rng):
    out = (rng.random((2, 16, 16, 1)) * 255).astype(np.float32)
    tgt = (rng.random((2, 16, 16, 1)) * 255).astype(np.float32)
    return out, tgt


def test_l1_mse(pair):
    out, tgt = pair
    assert float(L1Loss()(out, tgt)) == pytest.approx(np.abs(out - tgt).mean(), rel=1e-6)
    assert float(MSELoss()(out, tgt)) == pytest.approx(((out - tgt) ** 2).mean(), rel=1e-6)


def test_huber_matches_definition(pair):
    out, tgt = pair
    delta = 10.0
    e = np.abs(out - tgt)
    q = np.minimum(e, delta)
    golden = (0.5 * q**2 + delta * (e - q)).mean()
    assert float(HuberLoss(delta)(out, tgt)) == pytest.approx(golden, rel=1e-6)


def test_charbonnier_epsilon_not_squared(pair):
    out, tgt = pair
    eps = 1e-3
    golden = np.sqrt((out - tgt) ** 2 + eps).mean()  # eps, not eps^2
    assert float(CharbonnierLoss(eps)(out, tgt)) == pytest.approx(golden, rel=1e-6)


def test_flow_is_mse(pair):
    out, tgt = pair
    assert float(FlowLoss()(out, tgt)) == pytest.approx(float(MSELoss()(out, tgt)))


def test_smooth_l1_matches_torch(pair):
    import torch
    import torch.nn.functional as F

    out, tgt = pair
    golden = F.smooth_l1_loss(torch.from_numpy(out), torch.from_numpy(tgt)).item()
    assert float(SmoothL1Loss()(out, tgt)) == pytest.approx(golden, rel=1e-5)


def test_psnr_known_value():
    out = np.zeros((1, 4, 4, 1), np.float32)
    tgt = np.full((1, 4, 4, 1), 10.0, np.float32)
    golden = 10 * math.log10(255**2 / (100 + 1e-10))
    assert float(PSNR()(out, tgt)) == pytest.approx(golden, rel=1e-5)


def test_psnr_per_sample(pair):
    out, tgt = pair
    per = PSNR(size_average=False)(out, tgt)
    assert per.shape == (2,)
    assert float(PSNR()(out, tgt)) == pytest.approx(float(np.mean(np.asarray(per))), rel=1e-6)


def test_psnr_identical_images_capped_by_eps(pair):
    out, _ = pair
    val = float(PSNR()(out, out))
    assert val == pytest.approx(10 * math.log10(255**2 / 1e-10), rel=1e-6)


def _torch_reference_ssim(out, tgt, dim=2, channels=1):
    """The reference SSIM (metrics.py:39-113) restated with torch, as a
    golden: depthwise valid conv with the quirky Gaussian."""
    import torch
    import torch.nn.functional as F

    kernel = torch.from_numpy(_reference_gaussian_kernel(dim).astype(np.float64))
    kernel = kernel.view(1, 1, *kernel.shape)
    kernel = kernel.repeat(channels, *[1] * (kernel.dim() - 1))
    conv = F.conv2d if dim == 2 else F.conv3d
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    o, t = torch.from_numpy(out).double(), torch.from_numpy(tgt).double()
    mu1, mu2 = conv(o, kernel, groups=channels), conv(t, kernel, groups=channels)
    s1 = conv(o * o, kernel, groups=channels) - mu1**2
    s2 = conv(t * t, kernel, groups=channels) - mu2**2
    s12 = conv(o * t, kernel, groups=channels) - mu1 * mu2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    return ssim_map.mean().item()


def test_ssim_2d_matches_torch_reference(rng):
    out = (rng.random((2, 1, 24, 24)) * 255).astype(np.float32)
    tgt = np.clip(out + rng.normal(0, 10, out.shape), 0, 255).astype(np.float32)
    golden = _torch_reference_ssim(out, tgt)
    # channels-last for ours
    ours = float(SSIM(dim=2)(out.transpose(0, 2, 3, 1), tgt.transpose(0, 2, 3, 1)))
    assert ours == pytest.approx(golden, abs=1e-4)


def test_ssim_3d_matches_torch_reference(rng):
    out = (rng.random((1, 1, 11, 12, 12)) * 255).astype(np.float32)
    tgt = np.clip(out + rng.normal(0, 20, out.shape), 0, 255).astype(np.float32)
    golden = _torch_reference_ssim(out, tgt, dim=3)
    ours = float(SSIM(dim=3)(out.transpose(0, 2, 3, 4, 1), tgt.transpose(0, 2, 3, 4, 1)))
    assert ours == pytest.approx(golden, abs=1e-4)


def test_ssim_identity_is_one(rng):
    img = (rng.random((1, 16, 16, 1)) * 255).astype(np.float32)
    assert float(SSIM()(img, img)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_per_sample(rng):
    out = (rng.random((3, 16, 16, 1)) * 255).astype(np.float32)
    tgt = (rng.random((3, 16, 16, 1)) * 255).astype(np.float32)
    per = SSIM(size_average=False)(out, tgt)
    assert np.asarray(per).shape == (3,)


def test_cardiac_metrics(tmp_path, rng):
    import pickle

    coords = {"patient001": (2, 14, 3, 15)}
    path = tmp_path / "coordinates.pkl"
    with open(path, "wb") as f:
        pickle.dump(coords, f)
    out = (rng.random((1, 24, 24, 1)) * 255).astype(np.float32)
    tgt = (rng.random((1, 24, 24, 1)) * 255).astype(np.float32)
    cp = CardiacPSNR(str(path))
    golden = PSNR()(out[:, 2:14, 3:15], tgt[:, 2:14, 3:15])
    assert float(cp(out, tgt, "patient001")) == pytest.approx(float(golden), rel=1e-6)
    cs = CardiacSSIM(str(path))
    golden_s = SSIM()(out[:, 2:14, 3:15], tgt[:, 2:14, 3:15])
    assert float(cs(out, tgt, "patient001")) == pytest.approx(float(golden_s), rel=1e-6)


def test_registry_build():
    psnr = build("metric", {"name": "PSNR"})
    assert isinstance(psnr, PSNR)
    loss = build("loss", {"name": "CharbonnierLoss", "kwargs": {"epsilon": 1e-3}})
    assert isinstance(loss, CharbonnierLoss)


def test_slice_ssim_matches_mean_of_2d(rng):
    from vsr_tpu.metrics import SliceSSIM

    out = (rng.random((1, 4, 16, 16, 1)) * 255).astype(np.float32)
    tgt = np.clip(out + rng.normal(0, 10, out.shape), 0, 255).astype(np.float32)
    ours = float(SliceSSIM()(out, tgt))
    golden = np.mean([float(SSIM()(out[:, d], tgt[:, d])) for d in range(4)])
    assert ours == pytest.approx(golden, abs=1e-5)


def test_torch_builtin_loss_family_matches_torch(rng):
    """Every torch.nn *Loss name a reference config could use resolves and
    matches torch's value (reference accepts any, /root/reference/src/main.py:60-65)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tn

    o = rng.random((4, 6, 6, 1)).astype(np.float32)
    t = rng.random((4, 6, 6, 1)).astype(np.float32)
    logits = rng.standard_normal((4, 6, 6, 1)).astype(np.float32)
    sign = np.where(rng.random((4, 6, 6, 1)) > 0.5, 1.0, -1.0).astype(np.float32)
    to = lambda a: torch.from_numpy(a)

    cases = [
        ("BCELoss", {}, (o, t), tn.BCELoss(), (to(o), to(t))),
        ("BCEWithLogitsLoss", {}, (logits, t), tn.BCEWithLogitsLoss(), (to(logits), to(t))),
        ("KLDivLoss", {}, (np.log(o + 0.1), t), tn.KLDivLoss(), (to(np.log(o + 0.1)), to(t))),
        ("PoissonNLLLoss", {}, (logits, t), tn.PoissonNLLLoss(), (to(logits), to(t))),
        ("SoftMarginLoss", {}, (logits, sign), tn.SoftMarginLoss(), (to(logits), to(sign))),
        ("HingeEmbeddingLoss", {}, (logits, sign), tn.HingeEmbeddingLoss(), (to(logits), to(sign))),
    ]
    for name, kwargs, args, tfn, targs in cases:
        ours = float(build("loss", {"name": name, "kwargs": kwargs})(*args))
        with torch.no_grad():
            golden = float(tfn(*targs))
        np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6, err_msg=name)

    # Classification pair (channels-last logits, integer target).
    cls_logits = rng.standard_normal((8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (8,))
    ours = float(build("loss", {"name": "CrossEntropyLoss", "kwargs": {}})(
        cls_logits, labels))
    with torch.no_grad():
        golden = float(tn.CrossEntropyLoss()(to(cls_logits), torch.from_numpy(labels)))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, err_msg="CrossEntropyLoss")

    logp = np.log(np.exp(cls_logits) / np.exp(cls_logits).sum(-1, keepdims=True))
    ours = float(build("loss", {"name": "NLLLoss", "kwargs": {}})(logp, labels))
    with torch.no_grad():
        golden = float(tn.NLLLoss()(to(logp), torch.from_numpy(labels)))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, err_msg="NLLLoss")


def test_multi_margin_loss_family_matches_torch(rng):
    """The last three torch.nn *Loss names (VERDICT r2 item #7): MultiMargin,
    MultiLabelMargin, MultiLabelSoftMargin — all (output, target) callable."""
    torch = pytest.importorskip("torch")
    import torch.nn as tn

    to = torch.from_numpy
    scores = rng.standard_normal((8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (8,))

    for p in (1, 2):
        ours = float(build("loss", {"name": "MultiMarginLoss",
                                    "kwargs": {"p": p}})(scores, labels))
        with torch.no_grad():
            golden = float(tn.MultiMarginLoss(p=p)(to(scores),
                                                   torch.from_numpy(labels)))
        np.testing.assert_allclose(ours, golden, rtol=1e-5,
                                   err_msg=f"MultiMarginLoss p={p}")

    # MultiLabelMargin: per-row label prefixes of varying length, -1 padded
    # (incl. one empty row — torch gives it zero loss).
    ml_target = np.full((8, 5), -1, dtype=np.int64)
    for b in range(8):
        k = int(rng.integers(0, 4))  # 0..3 labels
        ml_target[b, :k] = rng.choice(5, size=k, replace=False)
    ours = float(build("loss", {"name": "MultiLabelMarginLoss",
                                "kwargs": {}})(scores, ml_target))
    with torch.no_grad():
        golden = float(tn.MultiLabelMarginLoss()(to(scores), to(ml_target)))
    np.testing.assert_allclose(ours, golden, rtol=1e-5,
                               err_msg="MultiLabelMarginLoss")

    binary = (rng.random((8, 5)) > 0.5).astype(np.float32)
    ours = float(build("loss", {"name": "MultiLabelSoftMarginLoss",
                                "kwargs": {}})(scores, binary))
    with torch.no_grad():
        golden = float(tn.MultiLabelSoftMarginLoss()(to(scores), to(binary)))
    np.testing.assert_allclose(ours, golden, rtol=1e-5,
                               err_msg="MultiLabelSoftMarginLoss")
