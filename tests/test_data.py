"""Data pipeline tests: mask conventions, serial/ordered assignment,
procedural generation, loader semantics."""
import numpy as np
import pytest
from PIL import Image

from fidm_tpu.data import (
    DataLoader,
    InpaintingDataset,
    create_inference_dataloader,
    create_inpainting_dataloaders,
    load_mask,
    mask_from_array,
    random_mask,
)


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "images"
    mask_dir = root / "masks"
    img_dir.mkdir()
    for split in ("train", "val", "test"):
        (mask_dir / split).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(7):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i:02d}.png")
    # 3 masks per split: black square = inpaint region
    for split in ("train", "val", "test"):
        for j in range(3):
            m = np.full((32, 32), 255, np.uint8)
            m[4 + j : 16 + j, 4 : 16] = 0  # black = inpaint
            Image.fromarray(m).save(mask_dir / split / f"mask_{j}.png")
    return img_dir, mask_dir


def test_mask_convention_black_is_inpaint(data_tree):
    _, mask_dir = data_tree
    m = load_mask(str(mask_dir / "train" / "mask_0.png"), 32)
    assert m.shape == (32, 32, 1)
    # black square -> 1 (inpaint), white -> 0 (keep)
    assert m[10, 10, 0] == 1.0
    assert m[0, 0, 0] == 0.0


def test_dataset_item_contract(data_tree):
    img_dir, mask_dir = data_tree
    ds = InpaintingDataset(img_dir, mask_dir, "train", img_size=32)
    item = ds[0]
    assert set(item) == {"image", "masked_image", "mask", "image_path",
                         "mask_path"}
    assert item["image"].shape == (32, 32, 3)
    assert item["mask"].shape == (32, 32, 1)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
    # masked image zeroed exactly in the hole
    hole = item["mask"][..., 0] > 0.5
    np.testing.assert_array_equal(item["masked_image"][hole], 0.0)
    np.testing.assert_array_equal(
        item["masked_image"][~hole], item["image"][~hole]
    )


def test_serial_mask_sequence_repeats_in_order(data_tree):
    img_dir, mask_dir = data_tree
    ds = InpaintingDataset(img_dir, mask_dir, "train", img_size=32,
                           mask_mode="serial")
    names = [p.name for p in ds.mask_sequence]
    assert names == ["mask_0.png", "mask_1.png", "mask_2.png"] * 2 + ["mask_0.png"]


def test_ordered_mask_cycling(data_tree):
    img_dir, mask_dir = data_tree
    ds = InpaintingDataset(img_dir, mask_dir, "test", img_size=32,
                           mask_mode="ordered")
    names = [p.name for p in ds.mask_sequence]
    assert names[3] == names[0] and names[4] == names[1]


def test_procedural_masks_coverage_range():
    rng = np.random.default_rng(0)
    for kind in ("box", "brush"):
        coverages = [
            random_mask(rng, 64, coverage=(0.05, 0.60), kind=kind).mean()
            for _ in range(10)
        ]
        assert all(0.01 <= c <= 0.75 for c in coverages), (kind, coverages)
        assert np.std(coverages) > 0.01  # actually varied


def test_procedural_dataset_deterministic(data_tree):
    img_dir, _ = data_tree
    ds = InpaintingDataset(img_dir, None, img_size=32, mask_mode="procedural",
                           seed=7)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["mask"], b["mask"])
    assert not np.array_equal(ds[2]["mask"], ds[3]["mask"])


def test_dataloader_batching_and_drop_last(data_tree):
    img_dir, mask_dir = data_tree
    ds = InpaintingDataset(img_dir, mask_dir, "train", img_size=32)
    dl = DataLoader(ds, batch_size=3, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == 2  # 7 images -> 2 full batches of 3
    assert batches[0]["image"].shape == (3, 32, 32, 3)
    # shuffling differs between epochs
    b2 = list(dl)
    assert batches[0]["image_path"] != b2[0]["image_path"]


def test_factory_functions(data_tree):
    img_dir, mask_dir = data_tree
    train, val = create_inpainting_dataloaders(
        img_dir, img_dir, mask_dir, batch_size=2, img_size=32
    )
    assert len(train) == 3  # drop_last: 7//2
    infer = create_inference_dataloader(img_dir, mask_dir, batch_size=2,
                                        img_size=32, num_samples=4)
    total = sum(b["image"].shape[0] for b in infer)
    assert total == 4


def test_mask_from_array_threshold():
    gray = np.array([[0.0, 0.4], [0.6, 1.0]], np.float32)
    m = mask_from_array(gray)
    np.testing.assert_array_equal(m[..., 0], [[1, 1], [0, 0]])


def test_threaded_loader_yields_all_items():
    from fidm_tpu.data import ThreadedLoader

    loader = ThreadedLoader(lambda: iter(range(20)), queue_size=3)
    assert list(loader) == list(range(20))
    # reusable
    assert list(loader) == list(range(20))


def test_device_prefetch_passthrough():
    import jax

    from fidm_tpu.data import device_prefetch

    batches = [{"image": np.ones((2, 4, 4, 3), np.float32) * i,
                "paths": [f"p{i}"]} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["image"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["image"]), batches[i]["image"])
        assert b["paths"] == [f"p{i}"]


def test_pack_and_packed_dataset_matches_pil_path(data_tree, tmp_path):
    """Packed-shard items are identical to the PIL-decode items (same
    bilinear resize, same normalize/compose kernel)."""
    from fidm_tpu.data import ShardReader, is_packed_dir, pack_dataset

    img_dir, mask_dir = data_tree
    packed = tmp_path / "packed"
    index = pack_dataset(img_dir, packed, img_size=32, shard_size=3)
    assert index["num_images"] == 7
    assert len(index["shards"]) == 3  # 3+3+1
    assert is_packed_dir(packed)

    reader = ShardReader(packed)
    assert len(reader) == 7 and reader.nbytes() > 0

    ds_pil = InpaintingDataset(img_dir, mask_dir, "train", 32, "serial")
    ds_pack = InpaintingDataset(packed, mask_dir, "train", 32, "serial")
    assert ds_pack.reader is not None and ds_pil.reader is None
    assert len(ds_pil) == len(ds_pack)
    for i in (0, 3, 6):
        a, b = ds_pil[i], ds_pack[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["masked_image"], b["masked_image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
        assert a["mask_path"] == b["mask_path"]


def test_packed_dataset_resizes_when_sizes_differ(data_tree, tmp_path):
    from fidm_tpu.data import pack_dataset

    img_dir, mask_dir = data_tree
    packed = tmp_path / "packed32"
    pack_dataset(img_dir, packed, img_size=32)
    ds16 = InpaintingDataset(packed, mask_dir, "train", 16, "serial")
    item = ds16[0]
    assert item["image"].shape == (16, 16, 3)
    assert np.isfinite(item["image"]).all()


def test_pack_data_cli(data_tree, tmp_path):
    from fidm_tpu.cli.pack_data import main

    img_dir, _ = data_tree
    out = str(tmp_path / "packed_cli")
    report = main(["--data_dir", str(img_dir), "--out", out,
                   "--image_size", "32", "--shard_size", "4"])
    assert report["num_images"] == 7
    assert report["num_shards"] == 2
    # loaders work straight off the packed dir
    loader = DataLoader(
        InpaintingDataset(out, mask_mode="procedural", img_size=32),
        batch_size=4,
    )
    batches = list(loader)
    assert batches[0]["image"].shape == (4, 32, 32, 3)


def test_threaded_loader_propagates_worker_errors():
    """A failing item must raise in the consumer, not silently truncate
    the epoch (regression: a corrupt file cut training data with no
    signal)."""
    from fidm_tpu.data.prefetch import ThreadedLoader

    def bad_iter():
        yield {"x": np.zeros(2)}
        raise OSError("corrupt file")

    loader = ThreadedLoader(lambda: bad_iter())
    it = iter(loader)
    next(it)
    with pytest.raises(OSError, match="corrupt"):
        next(it)


def test_threaded_loader_abandoned_iteration_releases_worker():
    """Breaking out mid-epoch must not leave the worker blocked on the
    bounded queue forever."""
    import threading
    import time

    from fidm_tpu.data.prefetch import ThreadedLoader

    n_before = threading.active_count()
    for _ in range(3):
        it = iter(ThreadedLoader(
            lambda: ({"x": np.zeros((64, 64))} for _ in range(100)),
            queue_size=1))
        next(it)
        it.close()  # abandon
    deadline = time.time() + 10
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_dataloader_stacks_label_and_extra_array_keys(data_tree):
    """Array-valued keys beyond image/masked_image/mask (e.g. 'label' for
    class-conditional training) must survive batching."""
    img_dir, mask_dir = data_tree

    class Labeled(InpaintingDataset):
        def __getitem__(self, idx):
            item = super().__getitem__(idx)
            item["label"] = idx % 3
            item["embedding"] = np.full((4,), float(idx), np.float32)
            return item

    ds = Labeled(img_dir, mask_dir, "train", img_size=32)
    batch = next(iter(DataLoader(ds, 4)))
    assert batch["label"].shape == (4,)
    np.testing.assert_array_equal(batch["label"], [0, 1, 2, 0])
    assert batch["embedding"].shape == (4, 4)
    assert isinstance(batch["image_path"], list)


def test_dataloader_epoch_counter_resumes_shuffle_order(data_tree):
    """Setting loader.epoch reproduces the same order a continuous run
    would have used (fit(start_epoch=N) relies on this after resume)."""
    img_dir, mask_dir = data_tree
    ds = InpaintingDataset(img_dir, mask_dir, "train", img_size=32)

    def orders(loader, n):
        out = []
        for _ in range(n):
            out.append([b["image_path"] for b in loader])
        return out

    cont = orders(DataLoader(ds, 2, shuffle=True, seed=7), 3)
    resumed = DataLoader(ds, 2, shuffle=True, seed=7)
    resumed.epoch = 2
    assert orders(resumed, 1)[0] == cont[2]


def test_mask_decode_cached_across_items(data_tree):
    """Serial masks repeat across many images; the decoded array must be
    reused, not re-decoded per item."""
    img_dir, mask_dir = data_tree
    ds = InpaintingDataset(img_dir, mask_dir, "train", img_size=32,
                           mask_mode="serial")
    m0 = ds[0]["mask"]
    m3 = ds[3]["mask"]  # 3 masks cycle: idx 3 reuses mask_0
    assert m0 is m3
    assert not m0.flags.writeable
