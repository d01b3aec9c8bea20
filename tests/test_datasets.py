import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.data.datasets import (
    AcdcMISRDataset,
    AcdcSISRDataset,
    AcdcVSRDataset,
    Dsb15VSRDataset,
    extract_window,
    misr_target_index,
)
from vsr_tpu.data.loader import Dataloader
from vsr_tpu.utils.rng import RngTree

TRANSFORMS = [{"name": "ToTensor"}]
AUGMENTS = [{"name": "RandomHorizontalFlip"}]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("processed")
    return make_processed_tree(root, frames=6, slices=2, patients_per_type=2)


def test_window_wraparound():
    seq = np.arange(10).reshape(1, 1, 1, 10)
    win = extract_window(seq, 0, 5, "last")  # {-4..0} wraps
    np.testing.assert_array_equal(win.ravel(), [6, 7, 8, 9, 0])
    win = extract_window(seq, 9, 5, "middle")  # {7,8,9,0,1}
    np.testing.assert_array_equal(win.ravel(), [7, 8, 9, 0, 1])
    win = extract_window(seq, 4, 5, "middle")
    np.testing.assert_array_equal(win.ravel(), [2, 3, 4, 5, 6])


def test_misr_target_index():
    assert misr_target_index(5) == 2
    assert misr_target_index(4) == 1


def test_sisr_dataset(data_root):
    ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=AUGMENTS,
    )
    assert len(ds) == 2 * 2 * 6  # patients * slices * frames
    sample = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert sample["lr_img"].shape == (12, 12, 1)
    assert sample["hr_img"].shape == (24, 24, 1)
    patient, slice_id, frame = ds.sample_name(0)
    assert patient == "patient001" and slice_id == "01" and frame == "01"


def test_misr_dataset(data_root):
    ds = AcdcMISRDataset(
        data_dir=data_root / "videos", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=AUGMENTS, num_frames=5,
    )
    assert len(ds) == 2 * 2 * 6
    s = ds.__getitem__(3, rng=np.random.default_rng(0))
    assert s["lr_imgs"].shape == (5, 12, 12, 1)
    assert s["hr_img"].shape == (24, 24, 1)


def test_vsr_dataset_train_and_valid(data_root):
    train = AcdcVSRDataset(
        data_dir=data_root / "videos", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=AUGMENTS, num_frames=5,
    )
    s = train.__getitem__(0, rng=np.random.default_rng(0))
    assert s["lr_imgs"].shape == (5, 12, 12, 1)
    assert s["hr_imgs"].shape == (5, 24, 24, 1)

    valid = AcdcVSRDataset(
        data_dir=data_root / "videos", type="valid", downscale_factor=2,
        transforms=TRANSFORMS, num_frames=5,
    )
    assert len(valid) == 4  # whole sequences
    s = valid.__getitem__(0)
    assert s["lr_imgs"].shape == (6, 12, 12, 1)
    assert s["hr_imgs"].shape == (6, 24, 24, 1)


def test_dsb15_alias(data_root):
    ds = Dsb15VSRDataset(
        data_dir=data_root / "videos", type="valid", downscale_factor=2,
        transforms=TRANSFORMS,
    )
    assert len(ds) == 4


def test_vsr_consistency_lr_matches_hr(data_root):
    # Synthetic LR is a strided subsample of HR; windows must stay aligned.
    ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="train", downscale_factor=2,
        transforms=TRANSFORMS, num_frames=3,
    )
    s = ds.__getitem__(5, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(s["lr_imgs"], s["hr_imgs"][:, ::2, ::2])


def test_loader_batching(data_root):
    ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=AUGMENTS,
    )
    loader = Dataloader(ds, batch_size=4, shuffle=True, num_workers=2)
    tree = RngTree("vsr")
    batches = list(loader.epoch(tree, epoch=0))
    assert len(batches) == len(loader) == 6
    assert batches[0]["lr_img"].shape == (4, 12, 12, 1)
    assert batches[0]["hr_img"].shape == (4, 24, 24, 1)
    assert batches[0]["index"].shape == (4,)


def test_loader_deterministic_across_runs(data_root):
    ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=AUGMENTS,
    )
    tree = RngTree("vsr")
    for workers in (0, 3):
        loader = Dataloader(ds, batch_size=4, shuffle=True, num_workers=workers)
        run1 = [b["lr_img"] for b in loader.epoch(tree, epoch=1)]
        run2 = [b["lr_img"] for b in loader.epoch(tree, epoch=1)]
        for a, b in zip(run1, run2):
            np.testing.assert_array_equal(a, b)
    # Worker count must not change results either.
    l0 = Dataloader(ds, batch_size=4, shuffle=True, num_workers=0)
    l3 = Dataloader(ds, batch_size=4, shuffle=True, num_workers=3)
    for a, b in zip(l0.epoch(tree, 2), l3.epoch(tree, 2)):
        np.testing.assert_array_equal(a["lr_img"], b["lr_img"])


def test_loader_epochs_differ(data_root):
    ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=AUGMENTS,
    )
    tree = RngTree("vsr")
    loader = Dataloader(ds, batch_size=24, shuffle=True)
    b0 = next(loader.epoch(tree, 0))
    b1 = next(loader.epoch(tree, 1))
    assert not np.array_equal(b0["index"], b1["index"])


def test_loader_plain_iter(data_root):
    ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="valid", downscale_factor=2,
        transforms=TRANSFORMS,
    )
    loader = Dataloader(ds, batch_size=1)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["lr_imgs"].shape == (1, 6, 12, 12, 1)


def test_cache_decoded_same_results(data_root):
    kw = dict(data_dir=data_root / "videos", type="train", downscale_factor=2,
              transforms=TRANSFORMS, num_frames=3)
    plain = AcdcVSRDataset(**kw)
    cached = AcdcVSRDataset(cache_decoded=True, **kw)
    for i in (0, 5, 5, 11):  # repeated index exercises the cache
        a = plain.__getitem__(i)
        b = cached.__getitem__(i)
        np.testing.assert_array_equal(a["lr_imgs"], b["lr_imgs"])
        np.testing.assert_array_equal(a["hr_imgs"], b["hr_imgs"])
